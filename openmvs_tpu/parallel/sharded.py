"""Multi-chip sharded dense estimation.

The distributed layer the reference never had (it scales by writing per-chunk
files and launching processes by hand, SURVEY.md 2.7): here depth-map work is
laid out on a 2D ``jax.sharding.Mesh``:

- ``views`` axis: each device owns a shard of reference views (the analogue
  of the reference's per-image event pipeline, SceneDensify.cpp:1883-1903);
  neighbor images are replicated, so estimation needs no communication.
- ``tile`` axis: image rows are sharded for very high resolutions; the
  PatchMatch state keeps a HALO of rows from adjacent tiles that is
  refreshed between sweeps via ``lax.ppermute`` over ICI (the analogue of
  the reference's cross-boundary pixel reads inside one zig-zag sweep).

Fusion-style reductions (valid-depth counts, statistics) ride ``psum`` over
both axes.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from openmvs_tpu.config import DenseOptions
from openmvs_tpu.ops import patchmatch

# halo must cover the propagation radius (5) plus the patch half-window (4)
HALO = 16

# PMData fields whose leading (per-view) layout is image rows and therefore
# get row-tiled over the ``tile`` mesh axis
ROW_TILED = {"ref", "X0", "sum_w", "norm_sq0", "lowres", "valid", "uv"}
ROW_TILED_T = {"w", "wtm"}  # (T, rows, W): rows on axis 1


def make_mesh(n_devices: int, n_views_axis: int | None = None) -> Mesh:
    try:
        devs = jax.devices("cpu")[:n_devices]   # the dryrun mesh is CPU-virtual
    except RuntimeError:
        devs = jax.devices()[:n_devices]
    if len(devs) < n_devices:
        devs = jax.devices()[:n_devices]
    if n_views_axis is None:
        n_views_axis = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    n_tile = n_devices // n_views_axis
    return Mesh(np.array(devs).reshape(n_views_axis, n_tile), ("views", "tile"))


def halo_exchange(state: patchmatch.PMState, axis: str) -> patchmatch.PMState:
    """Refresh the stale HALO rows of each tile's extended state block.

    Each block has layout [halo_top | core | halo_bot]; after a sweep only
    ``core`` is authoritative.  Send the edge rows of core to the adjacent
    tiles over ICI.
    """
    n = jax.lax.axis_size(axis)
    if n == 1:
        return state

    def refresh(x):
        rows = x.shape[0]
        core_top = jax.lax.slice_in_dim(x, HALO, 2 * HALO, axis=0)
        core_bot = jax.lax.slice_in_dim(x, rows - 2 * HALO, rows - HALO, axis=0)
        # tile i's TOP halo = tile (i-1)'s core BOTTOM rows: send core_bot
        # downward (i -> i+1); its BOTTOM halo = tile (i+1)'s core TOP rows:
        # send core_top upward (i -> i-1).  Un-permuted edges receive zeros
        # (ppermute semantics), which is the image-border behavior.
        from_above = jax.lax.ppermute(
            core_bot, axis, perm=[(i, i + 1) for i in range(n - 1)])
        from_below = jax.lax.ppermute(
            core_top, axis, perm=[(i, i - 1) for i in range(1, n)])
        mid = jax.lax.slice_in_dim(x, HALO, rows - HALO, axis=0)
        return jnp.concatenate([from_above, mid, from_below], axis=0)

    return patchmatch.PMState(
        depth=refresh(state.depth), normal=refresh(state.normal), conf=refresh(state.conf)
    )


def _make_stacked_problem(n_views_total: int, h: int, w: int, v: int, opts: DenseOptions):
    """Synthetic multi-view PMData stacked on a leading views axis."""
    from openmvs_tpu.geometry.camera import Camera
    from openmvs_tpu.densify import _build_pm_data

    rng = np.random.default_rng(0)
    f = 0.9 * w
    K = np.array([[f, 0, w / 2 - 0.5], [0, f, h / 2 - 0.5], [0, 0, 1.0]])
    datas = []
    for i in range(n_views_total):
        ref_cam = Camera(K, np.eye(3), np.array([0.1 * i, 0, 0]))
        nbr_cams = [
            Camera(K, np.eye(3), np.array([0.1 * i + 0.3 * (j + 1), 0, 0.0])) for j in range(v)
        ]
        ref = rng.uniform(0, 1, (h, w)).astype(np.float32)
        nbrs = [rng.uniform(0, 1, (h, w)).astype(np.float32) for _ in range(v)]
        datas.append(_build_pm_data(ref, ref_cam, nbrs, nbr_cams, opts, 2.0, 10.0, None, None))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *datas)


def _tile_rows(x: jnp.ndarray, n_tile: int, core_rows: int, rows_axis: int) -> jnp.ndarray:
    """(views, ..., H, ...) -> (views, n_tile, ..., core+2*HALO, ...) blocks."""
    pads = [(0, 0)] * x.ndim
    pads[rows_axis] = (HALO, HALO)
    xp = jnp.pad(x, pads)
    blocks = [
        jax.lax.slice_in_dim(xp, t * core_rows, t * core_rows + core_rows + 2 * HALO, axis=rows_axis)
        for t in range(n_tile)
    ]
    return jnp.stack(blocks, axis=1)


def _index_local_view(data_local: patchmatch.PMData, i: int) -> patchmatch.PMData:
    """Extract view i's PMData from the locally-sharded stacked pytree."""
    dd: Dict[str, object] = {}
    for name, x in data_local._asdict().items():
        if name == "views":
            dd[name] = jax.tree.map(lambda y: y[i], x)
        elif name in ROW_TILED or name in ROW_TILED_T:
            dd[name] = x[i, 0]  # drop the local (size-1) tile axis
        else:
            dd[name] = x[i]
    return patchmatch.PMData(**dd)


def dryrun(n_devices: int) -> None:
    """Jit + execute one fully sharded estimation step on an n-device mesh."""
    import os

    # the sharded step runs on the CPU-virtual mesh; the Pallas scoring
    # kernel is TPU-only, so route scoring through the XLA path here
    # (restored afterwards — a leaked flag would silently route real
    # estimation in the same process through the 20x-slower XLA path)
    prev_flag = os.environ.get("OMVS_NO_PALLAS")
    os.environ["OMVS_NO_PALLAS"] = "1"
    mesh = make_mesh(n_devices)
    n_views_axis, n_tile = mesh.devices.shape

    opts = DenseOptions(sub_resolution_levels=0, estimation_iters=1)
    total_views = n_views_axis * 2        # 2 reference views per device shard
    core_rows = 32
    h = n_tile * core_rows
    w = 128
    v = 2

    data = _make_stacked_problem(total_views, h, w, v, opts)

    data_dict = data._asdict()
    tiled = {}
    specs = {}
    for name, x in data_dict.items():
        if name in ROW_TILED:
            tiled[name] = _tile_rows(x, n_tile, core_rows, rows_axis=1)
            specs[name] = P("views", "tile")
        elif name in ROW_TILED_T:
            tiled[name] = _tile_rows(x, n_tile, core_rows, rows_axis=2)
            specs[name] = P("views", "tile")
        elif name == "views":
            tiled[name] = x
            specs[name] = jax.tree.map(lambda _: P("views"), x)
        else:
            tiled[name] = x
            specs[name] = P("views")
    data_tiled = patchmatch.PMData(**tiled)
    data_specs = patchmatch.PMData(**specs)

    ext_rows = core_rows + 2 * HALO
    seed_d = jnp.full((total_views, n_tile, ext_rows, w), 5.0, jnp.float32)
    seed_n = jnp.tile(
        jnp.asarray([0, 0, -1.0], jnp.float32), (total_views, n_tile, ext_rows, w, 1)
    )
    keys = jax.random.split(jax.random.PRNGKey(0), total_views)

    from jax import shard_map

    def per_shard(data_l, sd, sn, ks):
        n_local = sd.shape[0]
        states = []
        for i in range(n_local):
            d = _index_local_view(data_l, i)
            st = patchmatch.init_state(d, opts, ks[i], sd[i, 0], sn[i, 0], v, False)
            st = patchmatch.sweep(st, d, opts, ks[i], v, False)
            st = halo_exchange(st, "tile")
            states.append(st)
        state = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        core = jax.tree.map(
            lambda x: jax.lax.slice_in_dim(x, HALO, x.shape[1] - HALO, axis=1), state
        )
        n_valid = jax.lax.psum(jnp.sum(core.depth > 0), ("views", "tile"))
        # re-add the local tile axis so out sharding is (views, tile, ...)
        core = jax.tree.map(lambda x: x[:, None], core)
        return core, n_valid

    step = jax.jit(
        shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(data_specs, P("views", "tile"), P("views", "tile"), P("views")),
            out_specs=(P("views", "tile"), P()),
            check_vma=False,
        )
    )

    try:
        core, n_valid = step(data_tiled, seed_d, seed_n, keys)
        jax.block_until_ready(core)
        print(
            f"dryrun_multichip OK: mesh={tuple(mesh.devices.shape)} (views x tile), "
            f"core state shape={tuple(core.depth.shape)}, valid depths={int(n_valid)}"
        )

        dryrun_refine(mesh.devices.reshape(-1))
    finally:
        if prev_flag is None:
            os.environ.pop("OMVS_NO_PALLAS", None)
        else:
            os.environ["OMVS_NO_PALLAS"] = prev_flag


def dryrun_refine(devs) -> None:
    """Refine-pair sharding demo: pair axis over a flat device list (the
    production multi-chip path in refine.py — GSPMD all-reduces the vertex
    gradients)."""
    import numpy as _np

    from jax.sharding import Mesh as _JM, NamedSharding as _NS, PartitionSpec as _P
    from openmvs_tpu.refine import PairData, _device_steps

    devs = np.asarray(devs).reshape(-1)
    jm = _JM(devs, ("pairs",))
    sh = _NS(jm, _P("pairs"))
    rep = _NS(jm, _P())
    rng = _np.random.default_rng(0)
    nv, Hh, Ww, npair = 50, 24, 32, len(devs)
    verts = jax.device_put(
        jnp.asarray(rng.normal(size=(nv, 3)).astype(_np.float32) + [0, 0, 5.0]), rep)
    f32 = _np.float32
    K = _np.array([[40, 0, Ww / 2], [0, 40, Hh / 2], [0, 0, 1]], f32)
    faces_np = rng.integers(0, nv, (40, 3)).astype(_np.int32)
    # raster face ids consistent with faces_np: the production per-face
    # gradient scatter path (PairData.fid, round 5) must be what shards
    fid_np = rng.integers(0, len(faces_np), (npair, Hh, Ww)).astype(_np.int32)
    pds = PairData(
        imgA=rng.uniform(0, 1, (npair, Hh, Ww)).astype(f32),
        imgB=rng.uniform(0, 1, (npair, Hh, Ww)).astype(f32),
        face_vid=faces_np[fid_np],
        bary=_np.full((npair, Hh, Ww, 3), 1.0 / 3.0, f32),
        mask=_np.ones((npair, Hh, Ww), bool),
        KA_R=_np.tile(K, (npair, 1, 1)),
        KA_t=_np.zeros((npair, 3), f32),
        KB_R=_np.tile(K, (npair, 1, 1)),
        KB_t=_np.zeros((npair, 3), f32),
        sizeB=_np.tile(_np.asarray([Hh, Ww], f32), (npair, 1)),
        CA=_np.zeros((npair, 3), f32),
        reg_scale=_np.ones((npair,), f32),
        fid=fid_np,
    )
    pds = jax.device_put(pds, sh)
    adj = jax.device_put(jnp.zeros((nv, 12), jnp.int32) - 1, rep)
    deg = jax.device_put(jnp.zeros(nv, jnp.float32), rep)
    faces = jax.device_put(jnp.asarray(faces_np), rep)
    z = jax.device_put(jnp.zeros((nv, 3), jnp.float32), rep)
    v2, _, _, e = _device_steps(verts, z, z, jnp.int32(0), pds, adj, deg,
                                faces, jnp.float32(0.5), jnp.float32(0.1),
                                jnp.float32(0.2))
    jax.block_until_ready(v2)
    print(f"dryrun refine OK: {npair} pairs sharded over {len(devs)} devices, "
          f"E={float(e):.4f}")


# ===================================================================
# Production multi-chip estimation: the REAL estimate_depth_map chain
# (pyramid, candidate schedule, geometric passes) laid out on the
# (views, tile) mesh.  Views shard data-parallel (the reference's
# per-image event pipeline, SceneDensify.cpp:1883-1903); image rows
# shard over `tile` with a HALO refreshed by ppermute after every
# checkerboard half-step, so a shard boundary behaves exactly like the
# interior of a single-device sweep.  All candidate randomness is
# position-anchored (patchmatch._block_uniform hashes global pixel
# coordinates), making results bitwise-identical across shardings.
# ===================================================================


def _extend_rows(x, axis: str, rows_axis: int = 0):
    """Concat HALO rows fetched from the adjacent tile shards (zeros at the
    global image top/bottom, where ppermute has no source)."""
    n = jax.lax.axis_size(axis)
    if n == 1:
        pads = [(0, 0)] * x.ndim
        pads[rows_axis] = (HALO, HALO)
        return jnp.pad(x, pads)
    bot_edge = jax.lax.slice_in_dim(x, x.shape[rows_axis] - HALO, x.shape[rows_axis], axis=rows_axis)
    top_edge = jax.lax.slice_in_dim(x, 0, HALO, axis=rows_axis)
    # un-permuted destinations receive zeros (ppermute semantics)
    from_above = jax.lax.ppermute(bot_edge, axis, [(i, i + 1) for i in range(n - 1)])
    from_below = jax.lax.ppermute(top_edge, axis, [(i, i - 1) for i in range(1, n)])
    return jnp.concatenate([from_above, x, from_below], axis=rows_axis)


def _extend_pm_data(d: patchmatch.PMData, axis: str) -> patchmatch.PMData:
    dd = {}
    for name, x in d._asdict().items():
        if name in ROW_TILED:
            dd[name] = _extend_rows(x, axis, 0)
        elif name in ROW_TILED_T:
            dd[name] = _extend_rows(x, axis, 1)
        else:
            dd[name] = x
    return patchmatch.PMData(**dd)


def _extend_state(st: patchmatch.PMState, axis: str) -> patchmatch.PMState:
    return patchmatch.PMState(
        depth=_extend_rows(st.depth, axis),
        normal=_extend_rows(st.normal, axis),
        conf=_extend_rows(st.conf, axis),
    )


def _core(x, rows_axis: int = 0):
    return jax.lax.slice_in_dim(x, HALO, x.shape[rows_axis] - HALO, axis=rows_axis)


def _pm_specs(n_t_axis: bool = True):
    """PartitionSpec pytree for a views-stacked PMData."""
    specs = {}
    for name in patchmatch.PMData._fields:
        if name == "views":
            specs[name] = patchmatch.PMViews(
                *[P("views") for _ in patchmatch.PMViews._fields])
        elif name in ROW_TILED:
            specs[name] = P("views", "tile")
        elif name in ROW_TILED_T:
            specs[name] = P("views", None, "tile")
        else:
            specs[name] = P("views")
    return patchmatch.PMData(**specs)


def make_level_step(mesh: Mesh, opts, n_views: int, schedule, use_geom: bool,
                    init_mode: str | None = None):
    """Jitted (views, tile)-sharded estimation for one pyramid level.

    schedule: tuple of (mode, n_prop) per sweep iteration — identical to the
    serial estimate_depth_map schedule so results match bit for bit.
    init_mode overrides the incumbent's scoring mode (OMVS_INIT_EXACT
    parity with the serial first_mode); defaults to schedule[0][0].
    """
    from jax import shard_map

    data_specs = _pm_specs()
    state_spec = P("views", "tile")

    def body(data_l, sd, sn, keys):
        n_local = sd.shape[0]
        outs = []
        for i in range(n_local):
            d_i = jax.tree.map(lambda x: x[i], data_l)
            d_ext = _extend_pm_data(d_i, "tile")
            sd_e = _extend_rows(sd[i], "tile")
            sn_e = _extend_rows(sn[i], "tile")
            key = keys[i]
            # score the incumbent in the FIRST sweep's sampling mode, exactly
            # as the serial path does (densify.py first_mode) — otherwise
            # nn-mode candidates compete against exact-scored seeds
            st = patchmatch.init_state(d_ext, opts, key, sd_e, sn_e,
                                       n_views, use_geom,
                                       mode=init_mode or schedule[0][0])
            st = halo_exchange(st, "tile")
            prev_mode = None
            for it, (mode, n_prop) in enumerate(schedule):
                ik = jax.random.fold_in(key, it + 1)
                if prev_mode is not None and mode != prev_mode:
                    cur = patchmatch.score_hypotheses(
                        d_ext, opts, st, st.depth[None], st.normal[None],
                        n_views, use_geom, mode)[0]
                    st = patchmatch.PMState(
                        depth=st.depth, normal=st.normal,
                        conf=jnp.where(d_ext.valid, cur, 2.0))
                for parity in (0, 1):
                    st = patchmatch._sweep_parity(
                        st, d_ext, opts, ik, n_views, use_geom,
                        max(1, opts.random_iters // 2), mode, parity, n_prop)
                    st = halo_exchange(st, "tile")
                prev_mode = mode
            outs.append(jax.tree.map(_core, st))
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    step = shard_map(
        body,
        mesh=mesh,
        in_specs=(data_specs, state_spec, state_spec, P("views")),
        out_specs=patchmatch.PMState(depth=state_spec, normal=state_spec,
                                     conf=state_spec),
        check_vma=False,
    )
    return jax.jit(step)


def estimate_views_sharded(scene, opts, mesh: Mesh, prev_results=None,
                           geometric_iter: int = -1, rng_seed: int = 0,
                           skip_ids=()):
    """Sharded equivalent of densify.estimate_depth_map over ALL views.

    Returns {image_id: DepthMapResult}, matching the serial path's results
    (bitwise on CPU meshes; kernel-rounding-identical on TPU meshes).
    """
    import cv2

    from openmvs_tpu import densify as D
    from openmvs_tpu.io import images as imio
    from openmvs_tpu.ops import seed as seedmod
    from jax.sharding import NamedSharding

    n_views_axis, n_tile = mesh.devices.shape
    is_geometric = geometric_iter >= 0
    levels = 0 if is_geometric else opts.sub_resolution_levels
    n_iters = 1 if is_geometric else opts.estimation_iters

    id_to_idx = {im.meta.id: i for i, im in enumerate(scene.images)}

    # ---- host prep per view (identical to the serial path) ----
    views_info = []
    for ref_idx in range(scene.n_views):
        img = scene.images[ref_idx]
        if img.meta.id in skip_ids:
            continue
        neighbors = img.meta.view_scores
        if not neighbors:
            continue
        if is_geometric and (prev_results is None or
                             img.meta.id not in prev_results):
            continue
        num = opts.num_views if opts.num_views > 0 else len(neighbors)
        # filter-then-slice, matching the serial estimate_depth_map: absent
        # scored neighbors backfill with later valid ones, and a view with
        # ZERO present neighbors is skipped (not estimated against padding)
        nbr_ids = [vs.id for vs in neighbors if vs.id in id_to_idx][:num]
        if not nbr_ids:
            continue
        nbr_imgs = [scene.images[id_to_idx[i]] for i in nbr_ids]
        pts_sel, trusted = [], []
        for i, v in enumerate(scene.pointcloud.views):
            if img.meta.id in v:
                pts_sel.append(scene.pointcloud.points[i])
                trusted.append(len(v) >= opts.min_views_trust_point)
        pts_sel = np.asarray(pts_sel, np.float64).reshape(-1, 3)
        trusted = np.asarray(trusted, bool)
        cam = img.working_camera()
        H, W = img.gray.shape
        sd, sn, d_min, d_max = seedmod.seed_depth_normal(
            cam, W, H, pts_sel, trusted,
            interpolate=not opts.init_sparse, add_corners=opts.add_corners)
        if prev_results is not None and is_geometric:
            pr = prev_results[img.meta.id]
            d_min, d_max = pr.d_min, pr.d_max
            sd, sn = pr.depth, pr.normal
        if d_max <= d_min:
            continue
        views_info.append(dict(
            ref_idx=ref_idx, img=img, nbr_ids=nbr_ids, nbr_imgs=nbr_imgs,
            cam=cam, sd=sd, sn=sn, d_min=d_min, d_max=d_max))
    if not views_info:
        return {}

    V = max(len(vi["nbr_imgs"]) for vi in views_info)
    Vv = len(views_info)
    Vpad = -(-Vv // n_views_axis) * n_views_axis

    import jax as _jax

    results = {}
    state_g = None
    prev_log = None          # previous level's logical (h, w)
    prev_shapes = None       # previous level's per-view logical shapes
    for level in range(levels, -1, -1):
        s = 1.0 / (2 ** level)
        hosts, seeds_d, seeds_n, keys = [], [], [], []
        Hl_ = Wl_ = 0
        lvl_grays = []
        for vi in views_info:
            ref_gray = D._resize_gray(vi["img"].gray, s)
            lvl_grays.append(ref_gray)
            Hl_ = max(Hl_, ref_gray.shape[0])
            Wl_ = max(Wl_, ref_gray.shape[1])
        # pad rows so the tile axis divides them into 8-aligned cores
        h_log, w_log = Hl_, Wl_
        Hl_ = -(-Hl_ // (n_tile * 8)) * (n_tile * 8)
        # each tile core must hold at least the HALO rows halo_exchange and
        # _extend_rows slice (small images / deep pyramid levels on a wide
        # tile axis would otherwise slice negative starts / wrap)
        Hl_ = max(Hl_, n_tile * HALO)
        Wl_ = -(-Wl_ // 2) * 2
        Hp = Wp = 0
        lvl_nbrs = []
        for vi in views_info:
            nbr_grays = [D._resize_gray(n.gray, s) for n in vi["nbr_imgs"]]
            lvl_nbrs.append(nbr_grays)
            Hp = max([Hp] + [g.shape[0] for g in nbr_grays])
            Wp = max([Wp] + [g.shape[1] for g in nbr_grays])
        for k, vi in enumerate(views_info):
            ref_gray = lvl_grays[k]
            h, w = ref_gray.shape
            if (h, w) != (Hl_, Wl_):
                ref_gray = np.pad(ref_gray, ((0, Hl_ - h), (0, Wl_ - w)))
            ref_cam = vi["cam"].scaled(lvl_grays[k].shape[1] / vi["img"].gray.shape[1]) \
                if s != 1.0 else vi["cam"]
            nbr_cams = [
                n.working_camera().scaled(g.shape[1] / n.gray.shape[1])
                if s != 1.0 else n.working_camera()
                for n, g in zip(vi["nbr_imgs"], lvl_nbrs[k])
            ]
            nbr_depths = None
            if is_geometric and prev_results is not None:
                nbr_depths = []
                for i in vi["nbr_ids"]:
                    r = prev_results.get(i)
                    nbr_depths.append(r.depth if r is not None
                                      else np.zeros((8, 8), np.float32))
            # usable: the serial mask resized at the LOGICAL size, False in
            # the bottom/right padding rows (keeps validity identical to the
            # unpadded serial arrays)
            um = np.zeros((Hl_, Wl_), bool)
            um_src = vi["img"].usable_mask(opts.ignore_mask_label)
            b_ = opts.window_half
            if um_src is not None:
                if um_src.shape != (h, w):
                    um_src = cv2.resize(um_src.astype(np.uint8), (w, h),
                                        interpolation=cv2.INTER_NEAREST).astype(bool)
                um[:h, :w] = um_src
            else:
                um[:h, :w] = True
            # the padded canvas shifts the window-inside test at the image
            # bottom/right; clamp validity to the serial (unpadded) region
            um[max(h - b_, 0):, :] = False
            um[:, max(w - b_, 0):] = False
            hosts.append(D._assemble_pm_host(
                ref_gray, ref_cam, lvl_nbrs[k], nbr_cams, opts,
                vi["d_min"], vi["d_max"], nbr_depths,
                usable=um, pad_views=V, pad_hw=(Hp, Wp)))
            if state_g is None:
                # level seeds from the sparse cloud (or prev geometric state)
                sdf, snf = vi["sd"], vi["sn"]
                if s != 1.0:
                    sd = np.zeros((Hl_, Wl_), np.float32)
                    sn = np.zeros((Hl_, Wl_, 3), np.float32)
                    ys, xs = np.nonzero(sdf > 0)
                    yy = np.clip((ys * s).astype(int), 0, Hl_ - 1)
                    xx = np.clip((xs * s).astype(int), 0, Wl_ - 1)
                    sd[yy, xx] = sdf[ys, xs]
                    sn[yy, xx] = snf[ys, xs]
                else:
                    sd = np.zeros((Hl_, Wl_), np.float32)
                    sn = np.zeros((Hl_, Wl_, 3), np.float32)
                    sd[: sdf.shape[0], : sdf.shape[1]] = sdf
                    sn[: snf.shape[0], : snf.shape[1]] = snf
                seeds_d.append(sd)
                seeds_n.append(sn)
            keys.append(np.asarray(_jax.random.PRNGKey(
                rng_seed * 7919 + vi["ref_idx"] * 131 + level
                + 1000 * (geometric_iter + 1))))

        # stack + pad the views axis
        def stackpad(arrs):
            a = np.stack(arrs)
            if Vpad != Vv:
                a = np.concatenate(
                    [a, np.zeros((Vpad - Vv,) + a.shape[1:], a.dtype)])
            return a

        stacked = {k: stackpad([h[k] for h in hosts]) for k in hosts[0]}
        keys_a = stackpad(keys)
        if state_g is None:
            sd_g = stackpad(seeds_d)
            sn_g = stackpad(seeds_n)
        else:
            # upsample previous level's state on the global sharded arrays
            # over the LOGICAL extents (GSPMD inserts the boundary comms;
            # numerics match the serial jax.image.resize exactly), then pad
            ph, pw = prev_log
            same_sizes = (
                all(g.shape == lvl_grays[0].shape for g in lvl_grays)
                and prev_shapes is not None
                and all(sh == prev_shapes[0] for sh in prev_shapes))
            if same_sizes:

                @_jax.jit
                def _upsample(st):
                    dep = _jax.image.resize(st.depth[:, :ph, :pw],
                                            (Vpad, h_log, w_log), "linear")
                    nrm = _jax.image.resize(st.normal[:, :ph, :pw],
                                            (Vpad, h_log, w_log, 3), "nearest")
                    dep = jnp.pad(dep, ((0, 0), (0, Hl_ - h_log), (0, Wl_ - w_log)))
                    nrm = jnp.pad(nrm, ((0, 0), (0, Hl_ - h_log), (0, Wl_ - w_log), (0, 0)))
                    return dep, nrm

                sd_g, sn_g = _upsample(state_g)
            else:
                # mixed image sizes: a single global-box resize would blend
                # zero padding into the smaller views' content borders and
                # use the wrong per-view scale — resize each view over its
                # OWN logical box (host roundtrip; level transitions are
                # rare, mixed-size scenes rarer)
                dep_np = np.asarray(state_g.depth)
                nrm_np = np.asarray(state_g.normal)
                sd_np = np.zeros((Vpad, Hl_, Wl_), np.float32)
                sn_np = np.zeros((Vpad, Hl_, Wl_, 3), np.float32)
                for k in range(Vv):
                    pk = prev_shapes[k] if prev_shapes is not None else (ph, pw)
                    hk, wk = lvl_grays[k].shape
                    sd_np[k, :hk, :wk] = np.asarray(_jax.image.resize(
                        dep_np[k, :pk[0], :pk[1]], (hk, wk), "linear"))
                    sn_np[k, :hk, :wk] = np.asarray(_jax.image.resize(
                        nrm_np[k, :pk[0], :pk[1]], (hk, wk, 3), "nearest"))
                sd_g, sn_g = sd_np, sn_np
            stacked["lowres"] = sd_g
        if "lowres" not in stacked:
            stacked["lowres"] = np.zeros((Vpad, Hl_, Wl_), np.float32)

        sh_vt = NamedSharding(mesh, P("views", "tile"))
        sh_v = NamedSharding(mesh, P("views"))
        put = {}
        for k, x in stacked.items():
            if k in ("ref_gray", "usable", "lowres"):
                put[k] = _jax.device_put(x, sh_vt)
            else:
                put[k] = _jax.device_put(x, sh_v)
        sd_g = _jax.device_put(sd_g, sh_vt)
        sn_g = _jax.device_put(sn_g, sh_vt)
        keys_a = _jax.device_put(keys_a, sh_v)

        vpack = _jax.jit(_jax.vmap(
            functools.partial(patchmatch.pack_pm_data, opts)))
        data_g = vpack(
            put["ref_gray"], put["images"], put["sizes"], put["Hl"],
            put["Hm"], put["depths"], put["Tl"], put["Tm"], put["Tr"],
            put["Tn"], put["KinvT"], put["goff"], put["d_min"],
            put["d_max"], put["lowres"], put["usable"])

        # identical schedule to the serial estimate_depth_map (exact for
        # the last two sweeps, all 8 propagation offsets — see the comment
        # there for the measured reasons)
        all_exact = bool(__import__("os").environ.get("OMVS_ALL_EXACT"))
        n_exact = max(1, opts.exact_final_iters)
        schedule = []
        for it in range(n_iters):
            final_exact = it >= n_iters - n_exact
            mode = "exact" if (final_exact or all_exact) else "nn"
            schedule.append((mode, 8))
        init_mode = ("exact"
                     if __import__("os").environ.get("OMVS_INIT_EXACT")
                     else None)
        step = make_level_step(mesh, opts, V, tuple(schedule), is_geometric,
                               init_mode=init_mode)
        state_g = step(data_g, sd_g, sn_g, keys_a)
        prev_log = (h_log, w_log)
        prev_shapes = [g.shape for g in lvl_grays]

    geometric_follows = (not is_geometric) and opts.estimation_geometric_iters > 0
    vfin = _jax.jit(_jax.vmap(
        lambda st, d: patchmatch.pack_state(
            patchmatch.finalize(st, d, opts, geometric_follows))))
    packed = np.asarray(vfin(state_g, data_g))

    for k, vi in enumerate(views_info):
        Hf, Wf = vi["img"].gray.shape
        pk = packed[k][:Hf, :Wf]
        results[vi["img"].meta.id] = D.DepthMapResult(
            image_idx=vi["ref_idx"],
            depth=np.array(pk[..., 0], np.float32, copy=True, order="C"),
            normal=np.array(pk[..., 1:4], np.float32, copy=True, order="C"),
            conf=np.array(pk[..., 4], np.float32, copy=True, order="C"),
            d_min=vi["d_min"], d_max=vi["d_max"],
            neighbor_ids=vi["nbr_ids"],
            camera=vi["cam"],   # final level is full working resolution
        )
    return results


# ----------------------------------------------------------------- SGM pairs
def sgm_pairs_sharded(lefts: np.ndarray, rights_shifted: np.ndarray,
                      d_min: int, num_d: int, devs,
                      p1: float = 3.0, p2: float = 4.0, alpha: float = 14.0,
                      num_dirs: int = 8, beta: float = 38.0 / 255.0):
    """Disparity for a BATCH of rectified pairs with pairs sharded over
    devices — the multi-chip layout of the SGM stage (each chip owns a
    shard of stereo pairs, the analogue of the reference's per-pair
    EventThreadPool jobs, SemiGlobalMatcher.cpp:2042-2060).  Each shard
    runs WZNCC cost volume + 8-direction DP + winner-take-all locally; no
    cross-pair communication is needed (pairs are independent), so the
    shard_map is pure data parallelism over a "pairs" axis.

    lefts/rights_shifted: (P, H, W) float32; rights pre-shifted by d_min
    columns (wzncc_cost_volume's host-side layout).  Returns
    (disp int32 (P, H, W) absolute disparities, cost float32 (P, H, W))."""
    from jax import shard_map
    from openmvs_tpu.ops import sgm as sgmod

    n_dev = len(devs)
    P_n = lefts.shape[0]
    pad = (-P_n) % n_dev
    if pad:
        z = np.zeros((pad,) + lefts.shape[1:], lefts.dtype)
        lefts = np.concatenate([lefts, z])
        rights_shifted = np.concatenate([rights_shifted, z])
    mesh = Mesh(np.asarray(devs), ("pairs",))

    def one(l, r):
        vol = sgmod._wzncc_volume0(l, r, jnp.int32(d_min), num_d)
        agg = sgmod.aggregate8(vol, l, p1, p2, alpha, num_dirs, beta)
        return (jnp.argmin(agg, -1).astype(jnp.int32) + d_min,
                jnp.min(agg, -1).astype(jnp.float32))

    fn = shard_map(jax.vmap(one), mesh=mesh,
                   in_specs=(P("pairs"), P("pairs")),
                   out_specs=(P("pairs"), P("pairs")))
    disp, cost = fn(jnp.asarray(lefts), jnp.asarray(rights_shifted))
    return np.asarray(disp)[:P_n], np.asarray(cost)[:P_n]


# ------------------------------------------------------------ fusion reduce
def fusion_reduce_sharded(X: np.ndarray, Nw: np.ndarray, nb_stack: dict,
                          opts, devs):
    """The fusion reduction with neighbor VIEWS sharded over devices:
    every candidate point projects into each local neighbor shard, the
    agreement test (depth similarity + normal cone, FuseDepthMaps
    SceneDensify.cpp:1504-1603) accumulates confidence-weighted position
    evidence locally, and per-point totals ride one psum over the "views"
    axis — the multi-chip layout of the fusion stage (the sequential
    greedy CLAIMING stays host-side by design, as in the reference's
    best-connected-first loop; this kernel is its per-view inner scan).

    X (N,3) world candidates, Nw (N,3) world normals.
    nb_stack: dict of stacked neighbor data, each (V, ...):
      depth (V,H,W), normal (V,H,W,3), conf (V,H,W),
      K (V,3,3), R (V,3,3), C (V,3), valid (V,) 1.0 for real views.
    Returns (acc_X (N,3), acc_W (N,), n_agree (N,)) summed over views."""
    from jax import shard_map
    from openmvs_tpu.ops.fusion import conf2weight  # noqa: F401 (doc link)

    n_dev = len(devs)
    V = nb_stack["depth"].shape[0]
    pad = (-V) % n_dev
    st = {k: np.asarray(v, np.float32) for k, v in nb_stack.items()}
    if pad:
        for k, v in st.items():
            st[k] = np.concatenate([v, np.zeros((pad,) + v.shape[1:], v.dtype)])
    mesh = Mesh(np.asarray(devs), ("views",))
    cosn = float(np.cos(np.radians(opts.normal_diff_threshold)))
    ddt = float(opts.depth_diff_threshold)
    w_floor = float(getattr(opts, "fuse_conf_weight_floor", 0.09))

    def per_view(depth, normal, conf, K, R, C, valid, Xp, Nwp):
        Hb, Wb = depth.shape
        Xc = (R @ (Xp - C[None]).T).T                    # (N, 3) cam coords
        pb = Xc @ K.T
        zb = pb[:, 2]
        front = zb > 0
        iz = jnp.where(front, 1.0 / jnp.where(front, zb, 1.0), 0.0)
        ix = jnp.round(pb[:, 0] * iz).astype(jnp.int32)
        iy = jnp.round(pb[:, 1] * iz).astype(jnp.int32)
        inside = front & (ix >= 0) & (ix < Wb) & (iy >= 0) & (iy < Hb)
        ixc = jnp.clip(ix, 0, Wb - 1)
        iyc = jnp.clip(iy, 0, Hb - 1)
        db = depth[iyc, ixc]
        similar = inside & (db > 0) & (jnp.abs(zb - db) < ddt * zb)
        Nb = normal[iyc, ixc] @ R                        # world-frame normal
        agree = similar & (jnp.sum(Nwp * Nb, -1) > cosn) & (valid > 0)
        cb = conf[iyc, ixc]
        w = 1.0 / (jnp.maximum(1.0 - cb, w_floor) * db * db + 1e-30)
        w = jnp.where(agree, w, 0.0)
        # neighbor unprojection at the SAMPLED pixel (reference fuses the
        # neighbor's own unprojected point, not the candidate)
        uv1 = jnp.stack([ixc.astype(jnp.float32), iyc.astype(jnp.float32),
                         jnp.ones_like(db)], -1)
        Kinv = jnp.linalg.inv(K)
        Xb = (R.T @ (uv1 * db[:, None] @ Kinv.T).T).T + C[None]
        return (jnp.where(agree[:, None], Xb * w[:, None], 0.0),
                w, agree.astype(jnp.int32))

    def body(depth_l, normal_l, conf_l, K_l, R_l, C_l, valid_l, Xp, Nwp):
        accX, accW, nA = jax.vmap(
            per_view, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None)
        )(depth_l, normal_l, conf_l, K_l, R_l, C_l, valid_l, Xp, Nwp)
        return (jax.lax.psum(accX.sum(0), "views"),
                jax.lax.psum(accW.sum(0), "views"),
                jax.lax.psum(nA.sum(0), "views"))

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P("views"),) * 7 + (P(), P()),
                   out_specs=(P(), P(), P()))
    accX, accW, nA = fn(
        jnp.asarray(st["depth"]), jnp.asarray(st["normal"]),
        jnp.asarray(st["conf"]), jnp.asarray(st["K"]), jnp.asarray(st["R"]),
        jnp.asarray(st["C"]), jnp.asarray(st["valid"]),
        jnp.asarray(X, jnp.float32), jnp.asarray(Nw, jnp.float32))
    return np.asarray(accX), np.asarray(accW), np.asarray(nA)
