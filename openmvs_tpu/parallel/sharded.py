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
        up = [(i, (i - 1) % n) for i in range(n)]
        down = [(i, (i + 1) % n) for i in range(n)]
        from_below = jax.lax.ppermute(core_top, axis, perm=down)  # sent by tile i+1
        from_above = jax.lax.ppermute(core_bot, axis, perm=up)    # sent by tile i-1
        idx = jax.lax.axis_index(axis)
        top = jnp.where(idx > 0, from_above, jnp.zeros_like(from_above))
        bot = jnp.where(idx < n - 1, from_below, jnp.zeros_like(from_below))
        mid = jax.lax.slice_in_dim(x, HALO, rows - HALO, axis=0)
        return jnp.concatenate([top, mid, bot], axis=0)

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

    from jax.experimental.shard_map import shard_map

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
            check_rep=False,
        )
    )

    core, n_valid = step(data_tiled, seed_d, seed_n, keys)
    jax.block_until_ready(core)
    print(
        f"dryrun_multichip OK: mesh={tuple(mesh.devices.shape)} (views x tile), "
        f"core state shape={tuple(core.depth.shape)}, valid depths={int(n_valid)}"
    )

    # refine step: pair axis sharded over a flat device mesh (the production
    # multi-chip path in refine.py — GSPMD all-reduces the vertex gradients)
    import numpy as _np

    from jax.sharding import Mesh as _JM, NamedSharding as _NS, PartitionSpec as _P
    from openmvs_tpu.refine import PairData, _device_steps

    devs = mesh.devices.reshape(-1)
    jm = _JM(devs, ("pairs",))
    sh = _NS(jm, _P("pairs"))
    rep = _NS(jm, _P())
    rng = _np.random.default_rng(0)
    nv, Hh, Ww, npair = 50, 24, 32, len(devs)
    verts = jax.device_put(
        jnp.asarray(rng.normal(size=(nv, 3)).astype(_np.float32) + [0, 0, 5.0]), rep)
    f32 = _np.float32
    K = _np.array([[40, 0, Ww / 2], [0, 40, Hh / 2], [0, 0, 1]], f32)
    pds = PairData(
        imgA=rng.uniform(0, 1, (npair, Hh, Ww)).astype(f32),
        imgB=rng.uniform(0, 1, (npair, Hh, Ww)).astype(f32),
        face_vid=rng.integers(0, nv, (npair, Hh, Ww, 3)).astype(_np.int32),
        bary=_np.full((npair, Hh, Ww, 3), 1.0 / 3.0, f32),
        mask=_np.ones((npair, Hh, Ww), bool),
        KA_R=_np.tile(K, (npair, 1, 1)),
        KA_t=_np.zeros((npair, 3), f32),
        KB_R=_np.tile(K, (npair, 1, 1)),
        KB_t=_np.zeros((npair, 3), f32),
        sizeB=_np.tile(_np.asarray([Hh, Ww], f32), (npair, 1)),
    )
    pds = jax.device_put(pds, sh)
    adj = jax.device_put(jnp.zeros((nv, 12), jnp.int32) - 1, rep)
    deg = jax.device_put(jnp.zeros(nv, jnp.float32), rep)
    z = jax.device_put(jnp.zeros((nv, 3), jnp.float32), rep)
    v2, _, _, e = _device_steps(verts, z, z, jnp.int32(0), pds, adj, deg,
                                jnp.float32(0.01), jnp.float32(0.5),
                                jnp.float32(npair))
    jax.block_until_ready(v2)
    print(f"dryrun refine OK: {npair} pairs sharded over {len(devs)} devices, "
          f"E={float(e):.4f}")
