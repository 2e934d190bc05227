"""Dense reconstruction driver: Scene -> dense point cloud.

Equivalent of Scene::DenseReconstruction / DepthMapsData::ComputeDepthMaps
(libs/MVS/SceneDensify.cpp:1683-1980): per-view PatchMatch with a
sub-resolution pyramid, geometric-consistency re-estimation passes,
cross-view filtering, and fusion into one point cloud.

The reference pipelines images through an event state machine with worker
threads; here each stage is a pure function and per-view estimation is a
batched JAX computation (multi-chip: one view shard per device, see
openmvs_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openmvs_tpu.config import DenseOptions
from openmvs_tpu.geometry.camera import Camera
from openmvs_tpu.io import dmap as dmapio
from openmvs_tpu.io import images as imio
from openmvs_tpu.ops import filters, fusion, patchmatch, seed
from openmvs_tpu.scene import PointCloud, Scene, SceneImage
from openmvs_tpu.utils.log import get_logger, timed
from openmvs_tpu.view_selection import select_views_for_scene

log = get_logger("densify")


@dataclass
class DepthMapResult:
    image_idx: int
    depth: np.ndarray
    normal: np.ndarray
    conf: np.ndarray
    d_min: float
    d_max: float
    neighbor_ids: List[int]
    camera: Camera          # camera at depth-map resolution


def _resize_gray(gray: np.ndarray, scale: float) -> np.ndarray:
    if scale == 1.0:
        return gray
    h, w = gray.shape
    return imio.resize_area(gray, max(1, round(w * scale)), max(1, round(h * scale)))


def _build_pm_data(
    ref_gray: np.ndarray,
    ref_cam: Camera,
    nbr_grays: List[np.ndarray],
    nbr_cams: List[Camera],
    opts: DenseOptions,
    d_min: float,
    d_max: float,
    lowres_prior: Optional[np.ndarray],
    nbr_depths: Optional[List[np.ndarray]] = None,
    usable: Optional[np.ndarray] = None,
) -> patchmatch.PMData:
    """Assemble the static per-view arrays consumed by the PatchMatch sweep."""
    H, W = ref_gray.shape
    V = len(nbr_grays)
    Hp = max(g.shape[0] for g in nbr_grays)
    Wp = max(g.shape[1] for g in nbr_grays)

    images = np.zeros((V, Hp, Wp), np.float32)
    sizes = np.zeros((V, 2), np.float32)
    Hl = np.zeros((V, 3, 3), np.float32)
    Hm = np.zeros((V, 3), np.float32)
    depths = np.zeros((V, Hp, Wp), np.float32)
    Tl = np.zeros((V, 3, 3), np.float32)
    Tm = np.zeros((V, 3), np.float32)
    Tr = np.zeros((V, 3, 3), np.float32)
    Tn = np.zeros((V, 3), np.float32)

    Ri, Ci, Ki = ref_cam.R, ref_cam.C, ref_cam.K
    for j, (g, cam) in enumerate(zip(nbr_grays, nbr_cams)):
        h, w = g.shape
        images[j, :h, :w] = g
        sizes[j] = (h, w)
        # homography constants (DepthMap.h:175-185): Hl = Kj Rj Ri^T,
        # Hm = Kj Rj (Ci - Cj); Hr = Ki^-1 is folded into X0/goff.
        Hl[j] = cam.K @ cam.R @ Ri.T
        Hm[j] = cam.K @ cam.R @ (Ci - cam.C)
        if nbr_depths is not None:
            dmap = nbr_depths[j]
            depths[j, : dmap.shape[0], : dmap.shape[1]] = dmap
            # geometric-consistency constants (DepthMap.h:170-173)
            Tl[j] = cam.K @ cam.R @ Ri.T
            Tm[j] = cam.K @ cam.R @ (Ci - cam.C)
            Tr[j] = Ki @ Ri @ cam.R.T @ np.linalg.inv(cam.K)
            Tn[j] = Ki @ Ri @ (cam.C - Ci)

    # per-pixel back-projected rays
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    Kinv = ref_cam.Kinv
    ones = np.ones_like(uu)
    X0 = np.stack([uu, vv, ones], axis=-1) @ Kinv.T
    offs = patchmatch.texel_offsets(opts)
    goff = np.concatenate([offs, np.zeros((len(offs), 1), np.float32)], axis=-1) @ Kinv.T

    ref_j = jnp.asarray(ref_gray, jnp.float32)
    w_, wtm, sum_w, norm_sq0 = patchmatch.compute_patch_weights(ref_j, opts)

    # valid: full window inside + textured (or has a low-res prior)
    b = opts.window_half
    inside = np.zeros((H, W), bool)
    inside[b : H - b, b : W - b] = True
    th_mag_sq = opts.descriptor_min_magnitude ** 2 if opts.descriptor_min_magnitude > 0 else -1.0
    textured = norm_sq0 >= th_mag_sq  # on device: no host sync per level
    lowres = lowres_prior if lowres_prior is not None else np.zeros((H, W), np.float32)
    lowres = jnp.asarray(lowres, jnp.float32)
    valid = jnp.asarray(inside) & (textured | (lowres > 0))
    if usable is not None:
        um = usable
        if um.shape != (H, W):
            import cv2

            um = cv2.resize(um.astype(np.uint8), (W, H),
                            interpolation=cv2.INTER_NEAREST).astype(bool)
        valid = valid & jnp.asarray(um)

    views = patchmatch.PMViews(
        image=jnp.asarray(images),
        size=jnp.asarray(sizes),
        Hl=jnp.asarray(Hl),
        Hm=jnp.asarray(Hm),
        depth=jnp.asarray(depths),
        Tl=jnp.asarray(Tl),
        Tm=jnp.asarray(Tm),
        Tr=jnp.asarray(Tr),
        Tn=jnp.asarray(Tn),
    )
    uv_px = np.stack([uu, vv], axis=-1).astype(np.float32)
    return patchmatch.PMData(
        ref=ref_j,
        X0=jnp.asarray(X0, jnp.float32),
        goff=jnp.asarray(goff, jnp.float32),
        w=w_,
        wtm=wtm,
        sum_w=sum_w,
        norm_sq0=norm_sq0,
        views=views,
        d_min=jnp.float32(d_min),
        d_max=jnp.float32(d_max),
        lowres=lowres,
        valid=valid,
        uv=jnp.asarray(uv_px),
    )


def estimate_depth_map(
    scene: Scene,
    ref_idx: int,
    opts: DenseOptions,
    prev: Optional[DepthMapResult] = None,
    neighbor_results: Optional[Dict[int, DepthMapResult]] = None,
    geometric_iter: int = -1,
    rng_seed: int = 0,
) -> Optional[DepthMapResult]:
    """PatchMatch depth estimation for one reference view.

    geometric_iter < 0: photometric pass with the sub-resolution pyramid
    (EstimateDepthMap, SceneDensify.cpp:616-805); otherwise one
    geometric-consistency iteration at full resolution using the neighbors'
    current depth maps.
    """
    img = scene.images[ref_idx]
    neighbors = img.meta.view_scores
    if not neighbors:
        return None
    num = opts.num_views if opts.num_views > 0 else len(neighbors)
    nbr_ids = [vs.id for vs in neighbors[:num]]
    id_to_idx = {im.meta.id: i for i, im in enumerate(scene.images)}
    nbr_imgs = [scene.images[id_to_idx[i]] for i in nbr_ids if i in id_to_idx]

    # sparse seeds at full working resolution
    pts_sel = []
    trusted = []
    for i, v in enumerate(scene.pointcloud.views):
        if img.meta.id in v:
            pts_sel.append(scene.pointcloud.points[i])
            trusted.append(len(v) >= opts.min_views_trust_point)
    pts_sel = np.asarray(pts_sel, np.float64).reshape(-1, 3)
    trusted = np.asarray(trusted, bool)

    ref_cam_full = img.working_camera()
    H, W = img.gray.shape
    seed_depth_full, seed_normal_full, d_min, d_max = seed.seed_depth_normal(
        ref_cam_full, W, H, pts_sel, trusted
    )
    if prev is not None:
        d_min, d_max = prev.d_min, prev.d_max
    if d_max <= d_min:
        return None

    is_geometric = geometric_iter >= 0
    levels = 0 if is_geometric else opts.sub_resolution_levels
    n_iters = 1 if is_geometric else opts.estimation_iters

    state_np: Optional[Tuple[np.ndarray, np.ndarray]] = None
    lowres_prior = None
    result_state = None
    data = None
    for level in range(levels, -1, -1):
        s = 1.0 / (2 ** level)
        ref_gray = _resize_gray(img.gray, s)
        ref_cam = ref_cam_full.scaled(ref_gray.shape[1] / W) if s != 1.0 else ref_cam_full
        nbr_grays = [_resize_gray(n.gray, s) for n in nbr_imgs]
        nbr_cams = [
            n.working_camera().scaled(g.shape[1] / n.gray.shape[1]) if s != 1.0 else n.working_camera()
            for n, g in zip(nbr_imgs, nbr_grays)
        ]
        nbr_depths = None
        if is_geometric and neighbor_results:
            nbr_depths = []
            for i in nbr_ids:
                r = neighbor_results.get(i)
                nbr_depths.append(r.depth if r is not None else np.zeros((8, 8), np.float32))

        h, w = ref_gray.shape
        if state_np is None:
            if s != 1.0:
                sd = np.zeros((h, w), np.float32)
                sn = np.zeros((h, w, 3), np.float32)
                ys, xs = np.nonzero(seed_depth_full > 0)
                sd[np.clip((ys * s).astype(int), 0, h - 1), np.clip((xs * s).astype(int), 0, w - 1)] = (
                    seed_depth_full[ys, xs]
                )
                sn[np.clip((ys * s).astype(int), 0, h - 1), np.clip((xs * s).astype(int), 0, w - 1)] = (
                    seed_normal_full[ys, xs]
                )
            else:
                sd, sn = seed_depth_full, seed_normal_full
            if prev is not None and is_geometric:
                sd, sn = prev.depth, prev.normal
        else:
            # upscale previous level's estimate as seed + low-res prior —
            # on-device: avoids a device->host round-trip per pyramid level
            sd = jax.image.resize(state_np[0], (h, w), "linear")
            sn = jax.image.resize(state_np[1], (h, w, 3), "nearest")
            lowres_prior = sd

        data = _build_pm_data(
            ref_gray, ref_cam, nbr_grays, nbr_cams, opts, d_min, d_max, lowres_prior,
            nbr_depths, usable=img.usable_mask(opts.ignore_mask_label),
        )
        key = jax.random.PRNGKey(rng_seed * 7919 + ref_idx * 131 + level + 1000 * max(geometric_iter, 0))
        nV = len(nbr_grays)
        state = patchmatch.init_state(
            data, opts, key, jnp.asarray(sd), jnp.asarray(sn), nV, is_geometric
        )
        # exact scoring everywhere: on TPU it rides the Pallas kernel (fast
        # AND the only correct gather path on this backend); on CPU the XLA
        # scorer is exact by construction.  "nn"/"warp" modes remain for
        # experimentation via sweep() directly.
        prev_mode = None
        for it in range(n_iters):
            mode = "exact"
            state = patchmatch.sweep(
                state, data, opts, jax.random.fold_in(key, it + 1), nV, is_geometric,
                mode=mode, rescore_state=(prev_mode is not None and mode != prev_mode),
            )
            prev_mode = mode
        state_np = (state.depth, state.normal)  # stays on device
        result_state, result_cam = state, ref_cam

    geometric_follows = (not is_geometric) and opts.estimation_geometric_iters > 0
    final = patchmatch.finalize(result_state, data, opts, geometric_follows)
    depth = np.asarray(final.depth).copy()
    normal = np.asarray(final.normal).copy()
    conf = np.asarray(final.conf).copy()
    return DepthMapResult(
        image_idx=ref_idx,
        depth=depth,
        normal=normal,
        conf=conf,
        d_min=d_min,
        d_max=d_max,
        neighbor_ids=nbr_ids,
        camera=result_cam,
    )


def estimate_depth_map_sgm(
    scene: Scene,
    ref_idx: int,
    opts: DenseOptions,
    **_ignored,
) -> Optional[DepthMapResult]:
    """Depth from semi-global matching against the best-scored neighbor
    (the reference's SGM estimation path, SceneDensify.cpp:2045-2057 with
    SemiGlobalMatcher::Match/Fuse): rectify the pair, aggregate the cost
    volume, cross-check, convert disparity to depth, and un-rectify back to
    the reference view."""
    from openmvs_tpu.ops import sgm
    import cv2

    img = scene.images[ref_idx]
    neighbors = img.meta.view_scores
    if not neighbors:
        return None
    id_to_idx = {im.meta.id: i for i, im in enumerate(scene.images)}
    nb = None
    for vs in neighbors:
        j = id_to_idx.get(vs.id)
        if j is not None:
            nb = scene.images[j]
            break
    if nb is None:
        return None

    camA = img.working_camera()
    camB = nb.working_camera()
    rectA, rectB, info = sgm.rectify_pair(camA, camB, img.gray, nb.gray)
    disp, conf = sgm.match_rectified(
        rectA, rectB, d_min=0, num_d=opts.sgm_num_disparities,
        p1=opts.sgm_p1, p2=opts.sgm_p2,
    )
    z_rect = sgm.disparity_to_depth(disp, info)
    # un-rectify depth to the reference frame: depth is defined along the
    # rectified z-axis; map pixels back with the inverse homography and
    # convert to reference-camera depth
    H, W = img.gray.shape
    TAinv = np.linalg.inv(info["TA"])
    z_ref = cv2.warpPerspective(
        np.nan_to_num(z_rect, nan=0.0), TAinv.astype(np.float64), (W, H),
        flags=cv2.INTER_NEAREST,
    )
    conf_ref = cv2.warpPerspective(
        np.nan_to_num(conf, nan=0.0), TAinv.astype(np.float64), (W, H),
        flags=cv2.INTER_NEAREST,
    )
    # rectified depth is along the rectified optical axis Rn[2]; depth in the
    # reference camera = z_rect * (ray_ref . Rn2) adjustments are second
    # order for mild rectifying rotations; keep the direct mapping
    valid = z_ref > 0
    d_min = float(np.percentile(z_ref[valid], 2)) if valid.any() else 0.0
    d_max = float(np.percentile(z_ref[valid], 98)) if valid.any() else 0.0
    normal = np.zeros((H, W, 3), np.float32)
    normal[..., 2] = np.where(valid, -1.0, 0.0)
    conf_n = np.where(valid, np.clip(conf_ref / max(conf_ref.max(), 1e-6), 0.05, 1.0), 0.0)
    return DepthMapResult(
        image_idx=ref_idx,
        depth=z_ref.astype(np.float32),
        normal=normal,
        conf=conf_n.astype(np.float32),
        d_min=d_min,
        d_max=d_max,
        neighbor_ids=[nb.meta.id],
        camera=camA,
    )


def optimize_depth_map(res: DepthMapResult, opts: DenseOptions) -> None:
    """Speckle removal + gap interpolation (EVT_OPTIMIZEDEPTHMAP stage)."""
    if opts.optimize & 1:
        filters.remove_small_segments(res.depth, res.normal, res.conf, opts)
    if opts.optimize & 2:
        filters.gap_interpolation(res.depth, res.normal, res.conf, opts)


def _run_views_parallel(fn, view_indices, devices):
    """Run fn(view_idx) for each view, round-robined over local devices.

    The reference overlaps images with an event thread pool
    (SceneDensify.cpp:1883-1903); here each view's whole estimation chain is
    placed on one device via jax.default_device and views run concurrently
    from worker threads (dispatch is async; the GIL is released while
    blocking on device results)."""
    import concurrent.futures as cf

    results = {}
    if len(devices) <= 1:
        # measured: 2 threads sharing ONE device is 4x SLOWER here (the
        # interleaved programs serialize badly on the device queue) — overlap
        # only pays when each worker owns a device
        for i in view_indices:
            results[i] = fn(i)
        return results

    n_workers = len(devices)

    def worker(args):
        slot, i = args
        dev = devices[slot % len(devices)]
        with jax.default_device(dev):
            return i, fn(i)

    with cf.ThreadPoolExecutor(max_workers=n_workers) as ex:
        for i, r in ex.map(worker, enumerate(view_indices)):
            results[i] = r
    return results


def dense_reconstruction(
    scene: Scene,
    opts: DenseOptions = DenseOptions(),
    max_dim: Optional[int] = None,
    save_dmaps_to: Optional[str] = None,
    devices: Optional[list] = None,
) -> PointCloud:
    """Full dense pipeline: estimate all depth maps, filter, fuse.

    With multiple local devices (TPU chips), reference views are distributed
    across them (one view's estimation per chip, the analogue of the
    reference's per-image event pipeline across worker threads)."""
    if max_dim is None:
        w0 = max(im.width for im in scene.images)
        h0 = max(im.height for im in scene.images)
        max_dim = imio.compute_max_resolution(
            w0, h0, opts.resolution_level, opts.min_resolution, opts.max_resolution
        )

    with timed(log, "load images"):
        for img in scene.images:
            if img.gray is None:
                img.load(max_dim=max_dim)

    with timed(log, "select views"):
        select_views_for_scene(scene, opts)

    if devices is None:
        try:
            devices = jax.local_devices()
        except Exception:
            devices = []
    if len(devices) > 1:
        log.info("distributing views over %d devices", len(devices))

    # pass 1: photometric estimation
    results: Dict[int, DepthMapResult] = {}
    estimator = estimate_depth_map_sgm if opts.estimator == "sgm" else estimate_depth_map
    with timed(log, f"photometric pass ({scene.n_views} views)"):
        raw = _run_views_parallel(
            lambda i: estimator(scene, i, opts), range(scene.n_views), devices
        )
    for i, r in raw.items():
        if r is not None:
            results[scene.images[i].meta.id] = r

    # pass 2: geometric-consistency re-estimation
    for gi in range(opts.estimation_geometric_iters):
        have = [i for i in range(scene.n_views)
                if scene.images[i].meta.id in results]
        with timed(log, f"geometric pass {gi} ({len(have)} views)"):
            raw = _run_views_parallel(
                lambda i: estimate_depth_map(
                    scene, i, opts, prev=results[scene.images[i].meta.id],
                    neighbor_results=results, geometric_iter=gi,
                ),
                have, devices,
            )
        new_results: Dict[int, DepthMapResult] = {}
        for i, r in raw.items():
            if r is not None:
                new_results[scene.images[i].meta.id] = r
        results = new_results

    # optimize: speckle + gaps
    for r in results.values():
        optimize_depth_map(r, opts)

    # pass 3: cross-view filtering (adjust mode)
    if opts.optimize & 4:
        filtered: Dict[int, DepthMapResult] = {}
        for rid, r in results.items():
            projected = []
            for nb_id in r.neighbor_ids:
                nb = results.get(nb_id)
                if nb is None:
                    continue
                projected.append(
                    filters.project_depth_to_view(
                        nb.depth, nb.conf, nb.camera, r.camera, r.depth.shape
                    )
                )
            if len(projected) < opts.min_views_filter:
                filtered[rid] = r
                continue
            nd, nc = filters.filter_depth_adjust(
                r.depth, r.conf, projected, opts, r.d_min, r.d_max
            )
            filtered[rid] = dataclasses.replace(r, depth=nd, conf=nc)
        results = filtered

    if save_dmaps_to:
        os.makedirs(save_dmaps_to, exist_ok=True)
        for rid, r in results.items():
            dd = dmapio.DepthData(
                depth=r.depth,
                image_width=scene.images[r.image_idx].width,
                image_height=scene.images[r.image_idx].height,
                depth_min=r.d_min,
                depth_max=r.d_max,
                file_name=scene.images[r.image_idx].meta.name,
                view_ids=np.array([rid] + list(r.neighbor_ids), np.uint32),
                K=r.camera.K,
                R=r.camera.R,
                C=r.camera.C,
                normal=r.normal,
                conf=r.conf,
            )
            dmapio.save(dd, os.path.join(save_dmaps_to, f"depth{rid:04d}.dmap"))

    # fusion
    with timed(log, "fuse depth maps"):
        id_to_idx = {im.meta.id: i for i, im in enumerate(scene.images)}
        vdd = []
        for rid, r in results.items():
            img = scene.images[id_to_idx[rid]]
            color = img.color
            if color is not None and color.shape[:2] != r.depth.shape:
                color = imio.resize_area(color, r.depth.shape[1], r.depth.shape[0])
            vdd.append(
                fusion.ViewDepthData(
                    image_idx=r.image_idx,
                    image_id=rid,
                    camera=r.camera,
                    depth=r.depth,
                    normal=r.normal,
                    conf=r.conf,
                    color=color,
                    neighbor_ids=r.neighbor_ids,
                )
            )
        fuse_fn = (fusion.merge_depth_maps if opts.fuse_mode == "merge"
                   else fusion.fuse_depth_maps)
        pc = fuse_fn(
            vdd, opts, estimate_color=opts.estimate_colors > 0, estimate_normal=opts.estimate_normals > 0
        )
    log.info("dense point cloud: %d points", len(pc))
    return pc
