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
from openmvs_tpu.utils.log import (dump_depth_artifacts, get_logger,
                                   profile_trace, timed)
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


def _assemble_pm_host(
    ref_gray: np.ndarray,
    ref_cam: Camera,
    nbr_grays: List[np.ndarray],
    nbr_cams: List[Camera],
    opts: DenseOptions,
    d_min: float,
    d_max: float,
    nbr_depths: Optional[List[np.ndarray]] = None,
    usable: Optional[np.ndarray] = None,
    pad_views: int = 0,
    pad_hw: Optional[Tuple[int, int]] = None,
) -> dict:
    """Host-side (numpy) assembly of the per-view pack_pm_data operands.

    pad_views / pad_hw pad the neighbor-view axis and the neighbor-image
    extents to common sizes so multiple reference views can be stacked for
    the sharded multi-chip path (a padded view has size (0,0): every sample
    lands out of bounds, scores th_robust, and min-mean ignores it)."""
    H, W = ref_gray.shape
    V = max(len(nbr_grays), pad_views)
    Hp = max(g.shape[0] for g in nbr_grays)
    Wp = max(g.shape[1] for g in nbr_grays)
    if pad_hw is not None:
        Hp, Wp = max(Hp, pad_hw[0]), max(Wp, pad_hw[1])

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

    offs = patchmatch.texel_offsets(opts)
    Kinv = ref_cam.Kinv
    goff = np.concatenate([offs, np.zeros((len(offs), 1), np.float32)], axis=-1) @ Kinv.T

    um = np.ones((H, W), bool)
    if usable is not None:
        um = usable
        if um.shape != (H, W):
            import cv2

            um = cv2.resize(um.astype(np.uint8), (W, H),
                            interpolation=cv2.INTER_NEAREST).astype(bool)

    return dict(
        ref_gray=ref_gray.astype(np.float32), images=images, sizes=sizes,
        Hl=Hl, Hm=Hm, depths=depths, Tl=Tl, Tm=Tm, Tr=Tr, Tn=Tn,
        KinvT=np.ascontiguousarray(Kinv.T).astype(np.float32),
        goff=goff.astype(np.float32),
        d_min=np.float32(d_min), d_max=np.float32(d_max), usable=um,
    )


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
    """Assemble the static per-view arrays consumed by the PatchMatch sweep.

    One jit call = one host->device transfer for everything (X0/uv/valid are
    derived on-device from iota + Kinv)."""
    h = _assemble_pm_host(ref_gray, ref_cam, nbr_grays, nbr_cams, opts,
                          d_min, d_max, nbr_depths, usable)
    H, W = ref_gray.shape
    lowres = lowres_prior if lowres_prior is not None else np.zeros((H, W), np.float32)
    return patchmatch.pack_pm_data(
        opts, h["ref_gray"], h["images"], h["sizes"], h["Hl"], h["Hm"],
        h["depths"], h["Tl"], h["Tm"], h["Tr"], h["Tn"], h["KinvT"],
        h["goff"], h["d_min"], h["d_max"], lowres, h["usable"],
    )


class DeferredResult:
    """estimate_depth_map output with the packed (H, W, 5) result still on
    device: dispatch is async, so the CALLER can prepare the next view's
    host data while this one computes; resolve() downloads and finalizes."""

    def __init__(self, packed, template: DepthMapResult):
        self._packed = packed
        self._template = template

    def resolve(self) -> DepthMapResult:
        packed = np.asarray(self._packed)
        from openmvs_tpu.utils import safety

        safety.check_finite("estimate_depth_map", packed)
        r = self._template
        r.depth = np.array(packed[..., 0], np.float32, copy=True, order="C")
        r.normal = np.array(packed[..., 1:4], np.float32, copy=True, order="C")
        r.conf = np.array(packed[..., 4], np.float32, copy=True, order="C")
        return r


def estimate_depth_map(
    scene: Scene,
    ref_idx: int,
    opts: DenseOptions,
    prev: Optional[DepthMapResult] = None,
    neighbor_results: Optional[Dict[int, DepthMapResult]] = None,
    geometric_iter: int = -1,
    rng_seed: int = 0,
    defer_download: bool = False,
):
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
    id_to_idx = {im.meta.id: i for i, im in enumerate(scene.images)}
    # filter ids and images TOGETHER: a scored neighbor absent from the
    # scene (split scenes, external neighbor files) must not shift the
    # positional zip of depths vs cameras in _assemble_pm_host
    nbr_ids = [vs.id for vs in neighbors if vs.id in id_to_idx][:num]
    if not nbr_ids:
        return None
    nbr_imgs = [scene.images[id_to_idx[i]] for i in nbr_ids]

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
    if prev is not None and geometric_iter >= 0:
        # geometric re-estimation seeds from the previous pass's full-res
        # depth/normal (set below); the sparse-seed interpolation is host
        # Delaunay work that would be discarded — skip it
        seed_depth_full = seed_normal_full = None
        d_min, d_max = prev.d_min, prev.d_max
    else:
        seed_depth_full, seed_normal_full, d_min, d_max = seed.seed_depth_normal(
            ref_cam_full, W, H, pts_sel, trusted,
            interpolate=not opts.init_sparse, add_corners=opts.add_corners,
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
        key = jax.random.PRNGKey(rng_seed * 7919 + ref_idx * 131 + level + 1000 * (geometric_iter + 1))
        nV = len(nbr_grays)
        # first-sweep sampling mode (computed early so init_state scores the
        # incumbent in the same mode the first candidates compete in)
        _all_exact = bool(os.environ.get("OMVS_ALL_EXACT"))
        _n_exact = max(1, opts.exact_final_iters)
        first_mode = "exact" if (_all_exact or 0 >= n_iters - _n_exact) else "nn"
        if os.environ.get("OMVS_INIT_EXACT"):
            first_mode = "exact"
        state = patchmatch.init_state(
            data, opts, key, jnp.asarray(sd), jnp.asarray(sn), nV, is_geometric,
            mode=first_mode,
        )
        # Sweep schedule: candidate-SEARCH sweeps sample nearest-texel ("nn";
        # on TPU via the Pallas kernel's nearest mode, ~1.5x faster) with the
        # full 8-offset propagation early and 4 offsets once information has
        # travelled; the FINAL sweep is exact bilinear so the surviving
        # hypotheses and confidences match reference scoring semantics
        # (DepthMap.cpp:465-564).  The mode switch triggers an exact rescore
        # of the incumbent state so candidates compete on comparable scores.
        # Measured on the bundled scene (scripts/dev_gate_counts.py): the
        # far (+-5 px) propagation offsets are load-bearing for field
        # coherence in EVERY sweep — dropping them after sweep 2 keeps the
        # point count but doubles the raw mesh face count (noisier depth
        # shells).  Keep all 8 offsets; search with nearest sampling except
        # the final two sweeps (nearest-only search loses ~12% raw faces).
        all_exact = _all_exact
        n_exact = _n_exact
        n_pert = max(1, opts.random_iters // 2)
        prev_mode = None
        # Adaptive early exit — PRODUCTION DEFAULT since round 5: the nn
        # search sweeps run as ONE on-device adaptive block (lax.while_loop)
        # that stops when almost no pixel improves any more — the TPU form
        # of the reference's per-pixel convergence skipping
        # (DepthMap.cpp:630-799).  The exact final sweeps always run.
        # RNG/folds match the eager loop exactly, so a block that never
        # exits early is bit-identical to the eager path (the r5 battery
        # measured identical bundled-scene gate counts AND corpus F-scores
        # at 1.025 vs 0.888 dm/s — the win is skipped converged sweeps at
        # the upper pyramid levels).  Opt out with OMVS_EARLY_EXIT=0.
        n_nn = 0 if all_exact else max(0, n_iters - n_exact)
        it0 = 0
        if (os.environ.get("OMVS_EARLY_EXIT", "1") not in ("0", "")
                and n_nn >= 3):
            # (candidate annealing in the EE tail — fewer perturbations for
            # late sweeps — was DELETED in r5: it measurably fails the
            # bundled-scene gate, raw faces 72.6k < 75k window.)
            state, _ = patchmatch.sweep_block_adaptive(
                state, data, opts, key, nV, is_geometric,
                n_perturb=n_pert, mode="nn", n_prop=8,
                first_fold=1, n_sweeps=n_nn,
                min_sweeps=max(0, int(os.environ.get("OMVS_EE_MIN", "2"))),
                eps=float(os.environ.get("OMVS_EE_EPS", "5e-3")),
                min_frac=float(os.environ.get("OMVS_EE_FRAC", "0.01")),
            )
            prev_mode = "nn"
            it0 = n_nn
        # OMVS_ACTIVE=<eps>: per-tile convergence skipping — from sweep
        # OMVS_ACTIVE_FROM (default 2) on, 8-row tiles where no pixel
        # improved its confidence by more than eps during the previous
        # sweep are skipped inside the scoring kernel (work-skipping,
        # patchmatch._score_select; the reference's DepthMap.cpp:630-799
        # per-pixel skipping in TPU tile form).  Mode-switch sweeps rescore
        # all confidences, so they (and the sweep right after, whose churn
        # signal is the rescore artifact) run full.
        try:
            active_eps = float(os.environ.get("OMVS_ACTIVE", "0") or 0)
        except ValueError:
            active_eps = 0.0
        active_from = int(os.environ.get("OMVS_ACTIVE_FROM", "2"))
        prev_conf = None
        for it in range(it0, n_iters):
            final_exact = it >= n_iters - n_exact
            mode = "exact" if (final_exact or all_exact) else "nn"
            rescore = prev_mode is not None and mode != prev_mode
            eps_it = (active_eps
                      if (active_eps and it >= active_from and not rescore
                          and prev_conf is not None) else 0.0)
            this_conf = state.conf
            state = patchmatch.sweep(
                state, data, opts, key, nV, is_geometric,
                mode=mode, rescore_state=rescore,
                n_perturb=n_pert, n_prop=8, fold=it + 1,
                active_eps=eps_it, conf_prev=prev_conf,
            )
            prev_conf = None if rescore else this_conf
            prev_mode = mode
        state_np = (state.depth, state.normal)  # stays on device
        result_state, result_cam = state, ref_cam

    geometric_follows = (not is_geometric) and opts.estimation_geometric_iters > 0
    final = patchmatch.finalize(result_state, data, opts, geometric_follows)
    # single packed download: one transfer instead of three round-trips.
    # np.array(copy=True): the zero-copy view from the device buffer is
    # read-only, and depending on its layout a slice can alias it — the
    # results must be writable (optimize_depth_map mutates in place)
    template = DepthMapResult(
        image_idx=ref_idx,
        depth=None, normal=None, conf=None,
        d_min=d_min,
        d_max=d_max,
        neighbor_ids=nbr_ids,
        camera=result_cam,
    )
    packed_dev = patchmatch.pack_state(final)
    deferred = DeferredResult(packed_dev, template)
    if defer_download:
        return deferred
    return deferred.resolve()


def estimate_depth_map_sgm(
    scene: Scene,
    ref_idx: int,
    opts: DenseOptions,
    dimap_dir: Optional[str] = None,
    **_ignored,
) -> Optional[DepthMapResult]:
    """Depth from tSGM stereo FUSED over all scored neighbor pairs
    (SemiGlobalMatcher::Match + ::Fuse, SemiGlobalMatcher.cpp:530-737,739):
    per pair — rectify, coarse-to-fine SGM with per-pixel disparity windows,
    WZNCC costs, cross-check, sub-pixel refine; then cluster-fuse the
    per-pair depth maps in the reference frame (largest agreeing trust
    regions, min_views gate).  Pair disparities are cached as .dimap files
    when dimap_dir is given (per-pair resume, Match's File::isPresent skip).
    """
    from openmvs_tpu.ops import sgm
    from openmvs_tpu.io import dimap as dimapio

    img = scene.images[ref_idx]
    neighbors = img.meta.view_scores
    if not neighbors:
        return None
    num = opts.num_views if opts.num_views > 0 else len(neighbors)
    id_to_idx = {im.meta.id: i for i, im in enumerate(scene.images)}
    camA = img.working_camera()
    H, W = img.gray.shape

    # sparse points seen by the reference (for disparity-range seeding)
    pts_ref = np.asarray(
        [scene.pointcloud.points[i]
         for i, v in enumerate(scene.pointcloud.views) if img.meta.id in v],
        np.float64).reshape(-1, 3)

    pair_maps = []
    for vs in neighbors[:num]:
        j = id_to_idx.get(vs.id)
        if j is None:
            continue
        nb = scene.images[j]
        camB = nb.working_camera()
        try:
            rectA, rectB, info = sgm.rectify_pair(camA, camB, img.gray, nb.gray)
        except ValueError:
            continue

        cache = None
        if dimap_dir:
            cache = os.path.join(
                dimap_dir, f"{img.meta.id:04d}_{nb.meta.id:04d}.dimap")
        disp = cost = None
        if cache and os.path.exists(cache):
            dd = dimapio.load(cache)
            disp = dd.disparity.astype(np.float32)
            disp[~np.isfinite(disp)] = np.nan
            cost = (dd.cost.astype(np.float32)
                    if dd.cost is not None else np.zeros_like(disp))
        if disp is None:
            # global disparity range from the shared sparse points projected
            # into the rectified pair (reference seeds from the triangulated
            # sparse depth map, SemiGlobalMatcher.cpp:610-637)
            d_lo, d_hi = -opts.sgm_num_disparities, 0
            if len(pts_ref) >= 4:
                Kn, Rn = info["Kn"], info["Rn"]

                def rect_u(C):
                    Xc = (Rn @ (pts_ref - C).T)
                    z = Xc[2]
                    ok = z > 1e-9
                    return (Kn[0, 0] * Xc[0] / np.where(ok, z, 1)
                            + Kn[0, 2]), ok

                uA, okA = rect_u(camA.C)
                uB, okB = rect_u(camB.C)
                ok = okA & okB
                if ok.sum() >= 4:
                    d = (uB - uA)[ok]
                    d_lo = int(np.floor(np.percentile(d, 1))) - 4
                    d_hi = int(np.ceil(np.percentile(d, 99))) + 4
            disp, cost = sgm.match_pair_tsgm(
                rectA, rectB, d_lo, d_hi,
                p1=opts.sgm_p1, p2=opts.sgm_p2, alpha=opts.sgm_p2_alpha,
                beta=opts.sgm_p2_beta,
                subpixel_mode=opts.sgm_subpixel_mode,
                num_dirs=opts.sgm_num_dirs,
            )
            if cache:
                Q = np.eye(4)
                Q[:3, :3] = info["Rn"]
                Q[:3, 3] = info["C1"]
                Q[3, 0] = info["baseline"]
                dd = dimapio.DisparityData(
                    disparity=disp.astype(np.float32),
                    image_width=W, image_height=H,
                    H=info["TA"], Q=Q,
                    subpixel_steps=opts.sgm_subpixel_steps,
                    cost=np.clip(np.nan_to_num(cost), 0, 65535).astype(np.uint16),
                )
                os.makedirs(dimap_dir, exist_ok=True)
                dimapio.save(dd, cache)

        pm = sgm.project_disparity_to_depth(
            disp, np.nan_to_num(cost), info, camA, (H, W),
            subpixel_steps=float(opts.sgm_subpixel_steps))
        pair_maps.append(pm)

    if not pair_maps:
        return None
    depth, conf = sgm.fuse_pair_depths(pair_maps, max(1, opts.min_views - 1)
                                       if len(pair_maps) > 1 else 1)
    if depth is None or not (depth > 0).any():
        return None
    valid = depth > 0
    d_min = float(np.percentile(depth[valid], 2))
    d_max = float(np.percentile(depth[valid], 98))
    normal = np.zeros((H, W, 3), np.float32)
    normal[..., 2] = np.where(valid, -1.0, 0.0)
    conf_n = np.where(valid, np.clip(conf, 0.05, 1.0), 0.0)
    return DepthMapResult(
        image_idx=ref_idx,
        depth=depth.astype(np.float32),
        normal=normal,
        conf=conf_n.astype(np.float32),
        d_min=d_min,
        d_max=d_max,
        neighbor_ids=[vs.id for vs in neighbors[:num] if vs.id in id_to_idx],
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

    from openmvs_tpu.utils.log import Progress

    prog = Progress(log, "depth maps", len(view_indices))
    results = {}
    if len(devices) <= 1:
        # measured: 2 threads sharing ONE device is 4x SLOWER here (the
        # interleaved programs serialize badly on the device queue).  Instead
        # overlap HOST work with device compute via deferred downloads:
        # dispatch view i (async), prepare + dispatch view i+1 while i's
        # device chain runs, then resolve i (the reference's IO/estimation
        # event overlap, SceneDensify.cpp:54-64,1883-1903).
        from collections import deque

        pending = deque()
        for i in view_indices:
            r = fn(i)
            if isinstance(r, DeferredResult):
                pending.append((i, r))
                if len(pending) > 1:
                    j, rj = pending.popleft()
                    results[j] = rj.resolve()
                    prog.step()
            else:
                results[i] = r
                prog.step()
        while pending:
            j, rj = pending.popleft()
            results[j] = rj.resolve()
            prog.step()
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
            prog.step()
    return results


def dense_reconstruction(
    scene: Scene,
    opts: DenseOptions = DenseOptions(),
    max_dim: Optional[int] = None,
    save_dmaps_to: Optional[str] = None,
    devices: Optional[list] = None,
    mesh=None,
    fusion_mode: int = 0,
    respect_neighbors: bool = False,
) -> PointCloud:
    """Full dense pipeline: estimate all depth maps, filter, fuse.

    fusion_mode (DensifyPointCloud --fusion-mode, DensifyPointCloud.cpp:159):
    0 = estimate + fuse (default); 1 = export depth maps only (requires
    save_dmaps_to, returns an empty cloud); -1 = export SGM disparity maps
    only (forces estimator="sgm", per-pair .dimap files cached next to the
    dmaps); -2 = fuse from existing maps (estimation resumes off the
    .dmap/.dimap caches, so only missing views recompute).

    mesh: a jax.sharding.Mesh with ("views", "tile") axes routes estimation
    through the production multi-chip path (parallel.sharded — views
    data-parallel, rows halo-exchanged over ICI); results are identical to
    the serial path (position-anchored candidate RNG).

    With multiple local devices (TPU chips), reference views are distributed
    across them (one view's estimation per chip, the analogue of the
    reference's per-image event pipeline across worker threads)."""
    if abs(fusion_mode) == 1 and not save_dmaps_to:
        raise ValueError("fusion_mode +/-1 (map export only) requires "
                         "save_dmaps_to")
    if fusion_mode == -1 and opts.estimator != "sgm":
        log.info("fusion-mode -1: forcing estimator='sgm' (disparity export)")
        opts = dataclasses.replace(opts, estimator="sgm")
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

    _mesh = getattr(scene, "mesh", None)
    if len(scene.pointcloud) == 0 and _mesh is not None and len(
            getattr(_mesh, "faces", ())):
        # mesh-but-no-cloud scenes: sample the mesh WITH VISIBILITY to seed
        # estimation (SampleMeshWithVisibility, Scene.cpp:634-741, used by
        # ComputeDepthMaps at SceneDensify.cpp:1756-1766)
        with timed(log, "sample mesh with visibility"):
            scene.pointcloud = sample_mesh_with_visibility(scene)
        log.info("mesh visibility seeding: %d points", len(scene.pointcloud))

    with timed(log, "select views"):
        # respect_neighbors: keep neighbor lists already on the images (a
        # --view-neighbors-file load), selecting only for the rest
        select_views_for_scene(scene, opts, respect_existing=respect_neighbors)

    if devices is None:
        try:
            devices = jax.local_devices()
        except Exception:
            devices = []
    if len(devices) > 1:
        log.info("distributing views over %d devices", len(devices))

    # per-view resume: views whose final .dmap already exists skip
    # re-estimation entirely and serve as neighbor inputs (the reference
    # skips existing depthNNNN.dmap files on rerun, SceneDensify.cpp:2010-2029)
    results: Dict[int, DepthMapResult] = {}
    resumed: set = set()
    if save_dmaps_to:
        id_to_idx0 = {im.meta.id: i for i, im in enumerate(scene.images)}
        for img in scene.images:
            p = os.path.join(save_dmaps_to, f"depth{img.meta.id:04d}.dmap")
            if not os.path.exists(p):
                continue
            dd = dmapio.load(p)
            results[img.meta.id] = DepthMapResult(
                image_idx=id_to_idx0[img.meta.id],
                depth=dd.depth,
                normal=dd.normal if dd.normal is not None
                else np.zeros(dd.depth.shape + (3,), np.float32),
                conf=dd.conf if dd.conf is not None
                else (dd.depth > 0).astype(np.float32),
                d_min=dd.depth_min, d_max=dd.depth_max,
                neighbor_ids=[int(v) for v in dd.view_ids[1:]],
                camera=Camera(dd.K, dd.R, dd.C),
            )
            resumed.add(img.meta.id)
        if resumed:
            log.info("resume: %d views loaded from existing dmaps", len(resumed))

    _prof = profile_trace("densify")
    _prof.__enter__()
    # pass 1: photometric estimation
    use_sharded = (
        mesh is not None and int(np.prod(mesh.devices.shape)) > 1
        and opts.estimator != "sgm"
    )
    if use_sharded:
        from openmvs_tpu.parallel import sharded as shmod

        with timed(log, f"photometric pass sharded {tuple(mesh.devices.shape)}"):
            results.update(shmod.estimate_views_sharded(
                scene, opts, mesh, skip_ids=resumed))
        for gi in range(opts.estimation_geometric_iters):
            with timed(log, f"geometric pass {gi} sharded"):
                new = shmod.estimate_views_sharded(
                    scene, opts, mesh, prev_results=results, geometric_iter=gi,
                    skip_ids=resumed)
                new.update({rid: results[rid] for rid in resumed if rid in results})
                results = new
    estimator = estimate_depth_map_sgm if opts.estimator == "sgm" else estimate_depth_map
    if not use_sharded:
        todo = [i for i in range(scene.n_views)
                if scene.images[i].meta.id not in resumed]
        defer = len(devices) <= 1 and opts.estimator != "sgm"
        if opts.estimator == "sgm":
            est = lambda i: estimator(scene, i, opts, dimap_dir=save_dmaps_to)
        elif defer:
            est = lambda i: estimator(scene, i, opts, defer_download=True)
        else:
            est = lambda i: estimator(scene, i, opts)
        with timed(log, f"photometric pass ({len(todo)} views)"):
            raw = _run_views_parallel(est, todo, devices)
        for i, r in raw.items():
            if r is not None:
                results[scene.images[i].meta.id] = r

    # pass 2: geometric-consistency re-estimation
    # SGM results are fused across pairs by the SGM path itself; running
    # PatchMatch geometric re-estimation on top would re-estimate with
    # constant normals and nearest-warped seeds, degrading rather than
    # refining (the reference's SGM fusionMode skips PM re-estimation,
    # SceneDensify.cpp:2045-2057)
    n_geo = (0 if (use_sharded or opts.estimator == "sgm")
             else opts.estimation_geometric_iters)
    for gi in range(n_geo):
        have = [i for i in range(scene.n_views)
                if scene.images[i].meta.id in results
                and scene.images[i].meta.id not in resumed]
        with timed(log, f"geometric pass {gi} ({len(have)} views)"):
            raw = _run_views_parallel(
                lambda i: estimate_depth_map(
                    scene, i, opts, prev=results[scene.images[i].meta.id],
                    neighbor_results=results, geometric_iter=gi,
                    defer_download=len(devices) <= 1,
                ),
                have, devices,
            )
        # resumed-from-dmap views (and any view whose re-estimation failed)
        # must keep contributing as neighbor inputs and to fusion — mirror
        # the sharded branch's restore
        new_results: Dict[int, DepthMapResult] = dict(results)
        for i, r in raw.items():
            if r is not None:
                new_results[scene.images[i].meta.id] = r
        results = new_results

    _prof.__exit__(None, None, None)

    # optimize: speckle + gaps.  Resumed views were optimized+filtered
    # BEFORE being saved in the run that produced them — re-applying the
    # non-idempotent filters would compound across resume cycles
    for rid, r in results.items():
        if rid not in resumed:
            optimize_depth_map(r, opts)

    # pass 3: cross-view filtering (adjust mode)
    if opts.optimize & 4 and use_sharded and opts.filter_adjust:
        # device-sharded filter over the mesh (splat + adjust on-chip;
        # one all_gather over views, pmin/pmax over tile)
        from openmvs_tpu.parallel.sharded_filter import filter_views_sharded

        with timed(log, "cross-view filter sharded"):
            results = filter_views_sharded(results, opts, mesh,
                                           skip_ids=resumed)
    elif opts.optimize & 4:
        filtered: Dict[int, DepthMapResult] = {}
        for rid, r in results.items():
            if rid in resumed:
                filtered[rid] = r
                continue
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
            if opts.filter_adjust:
                nd, nc = filters.filter_depth_adjust(
                    r.depth, r.conf, projected, opts, r.d_min, r.d_max
                )
            else:
                nd, nc = filters.filter_depth_strict(
                    r.depth, r.conf, projected, opts
                )
            filtered[rid] = dataclasses.replace(r, depth=nd, conf=nc)
        results = filtered

    if save_dmaps_to:
        os.makedirs(save_dmaps_to, exist_ok=True)
        for rid, r in results.items():
            if rid in resumed:
                continue          # already on disk, unchanged this run
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
            dump_depth_artifacts(save_dmaps_to, rid, r.depth, r.normal, r.conf)

    if abs(fusion_mode) == 1:
        log.info("fusion-mode %d: %d maps exported to %s; skipping fusion",
                 fusion_mode, len(results), save_dmaps_to)
        return PointCloud()

    # fusion
    with timed(log, "fuse depth maps"):
        use_stream = (opts.fuse_mode != "merge" and save_dmaps_to
                      and len(results) > 16)
        if use_stream:
            # large scene: FREE the in-RAM maps and stream them back from
            # the .dmap files on demand — fusion peak memory is bounded by
            # the provider cache, not the view count (the reference's
            # ref-counted dmap unload, DepthMap.h:217-218)
            meta = [(rid, r.image_idx, list(r.neighbor_ids))
                    for rid, r in results.items()]
            max_nb = max((len(m[2]) for m in meta), default=2)
            for r in results.values():
                r.depth = r.normal = r.conf = None
            provider = fusion.ViewProvider(
                [m[0] for m in meta],
                _dmap_fusion_loader(scene, save_dmaps_to, meta),
                max_cached=max_nb + 2,
                neighbor_ids={m[0]: m[2] for m in meta},
            )
            pc = fusion.fuse_depth_maps(
                None, opts, estimate_color=opts.estimate_colors > 0,
                estimate_normal=opts.estimate_normals > 0, provider=provider)
        else:
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
                vdd, opts, estimate_color=opts.estimate_colors > 0,
                estimate_normal=opts.estimate_normals > 0
            )
    if save_dmaps_to and opts.remove_dmaps:
        # --remove-dmaps role (DensifyPointCloud.cpp): artifacts are only
        # intermediate, delete after fusion
        for rid in results:
            p = os.path.join(save_dmaps_to, f"depth{rid:04d}.dmap")
            if os.path.exists(p):
                os.remove(p)
    log.info("dense point cloud: %d points", len(pc))
    return pc


def sample_mesh_with_visibility(scene: Scene, n_samples: int = 60_000,
                                seed: int = 0) -> PointCloud:
    """Area-weighted mesh surface samples with per-view visibility from
    z-buffer renders (Scene::SampleMeshWithVisibility, Scene.cpp:634-741):
    a sample sees view V when its projected depth matches V's rasterized
    mesh depth within 1%.  Samples visible in <2 views are dropped."""
    from openmvs_tpu import mesh_ops, native

    pts, _ = mesh_ops.sample_points(scene.mesh, n_samples, seed=seed)
    P = pts.astype(np.float64)
    vis = []
    for img in scene.images:
        cam = img.camera if img.camera is not None else img.working_camera()
        W, H = img.width or 640, img.height or 480
        verts = scene.mesh.vertices.astype(np.float64)
        Xc = (verts - cam.C) @ cam.R.T
        z = np.maximum(Xc[:, 2], 1e-12)
        proj = np.stack([cam.K[0, 0] * Xc[:, 0] / z + cam.K[0, 2]
                         + cam.K[0, 1] * Xc[:, 1] / z,
                         cam.K[1, 1] * Xc[:, 1] / z + cam.K[1, 2],
                         Xc[:, 2]], -1)
        _, zmap, _ = native.rasterize(proj, scene.mesh.faces, H, W,
                                      want_bary=False)
        Xp = (P - cam.C) @ cam.R.T
        zp = Xp[:, 2]
        front = zp > 1e-9
        u = np.where(front, cam.K[0, 0] * Xp[:, 0] / np.where(front, zp, 1)
                     + cam.K[0, 2], -1)
        v = np.where(front, cam.K[1, 1] * Xp[:, 1] / np.where(front, zp, 1)
                     + cam.K[1, 2], -1)
        ui = np.round(u).astype(np.int64)
        vi = np.round(v).astype(np.int64)
        ok = front & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        zs = zmap[np.clip(vi, 0, H - 1), np.clip(ui, 0, W - 1)]
        vis.append(ok & (zs > 0) & (np.abs(zs - zp) < 0.01 * zp))
    vis = np.stack(vis, axis=1)                      # (N, n_views)
    ids = np.array([im.meta.id for im in scene.images], np.uint32)
    count = vis.sum(axis=1)
    keep = count >= 2
    pc = PointCloud()
    pc.points = pts[keep]
    pc.views = [ids[v] for v in vis[keep]]
    pc.weights = [np.ones(int(c), np.float32) for c in count[keep]]
    return pc


def _dmap_fusion_loader(scene, folder: str, meta_list):
    """ViewProvider loader reading final per-view .dmap files."""
    meta = {rid: (image_idx, nbr_ids) for rid, image_idx, nbr_ids in meta_list}

    def load(vid):
        path = os.path.join(folder, f"depth{vid:04d}.dmap")
        if vid not in meta or not os.path.exists(path):
            return None
        dd = dmapio.load(path)
        image_idx, nbr_ids = meta[vid]
        img = scene.images[image_idx]
        color = img.color
        if color is not None and color.shape[:2] != dd.depth.shape:
            color = imio.resize_area(color, dd.depth.shape[1], dd.depth.shape[0])
        return fusion.ViewDepthData(
            image_idx=image_idx, image_id=vid,
            camera=Camera(dd.K, dd.R, dd.C),
            depth=dd.depth,
            normal=dd.normal, conf=dd.conf, color=color,
            neighbor_ids=nbr_ids,
        )

    return load


def export_mesh_to_depth_maps(scene: Scene, base_name: str,
                              opts: DenseOptions = DenseOptions()) -> int:
    """Render the scene mesh into every view and save per-image depth maps
    (Scene::ExportMeshToDepthMaps, Scene.cpp:680-736).  Output format by
    extension: .dmap (full codec incl. interpolated camera-space normals),
    .pfm (raw float), anything else = normalized 8-bit visualization.
    Files are written as base0000.ext, base0001.ext, ... Returns the count."""
    import cv2

    from openmvs_tpu import mesh_ops, native
    from openmvs_tpu.texture import _project

    mesh = scene.mesh
    if mesh is None or not len(getattr(mesh, "faces", ())):
        raise ValueError("scene has no mesh to render")
    stem, ext = os.path.splitext(base_name)
    ext_l = ext.lower()
    vnorm = (mesh_ops.vertex_normals(mesh.vertices, mesh.faces)
             if ext_l == ".dmap" else None)

    w0 = max(im.width for im in scene.images)
    h0 = max(im.height for im in scene.images)
    max_dim = imio.compute_max_resolution(
        w0, h0, opts.resolution_level, opts.min_resolution, opts.max_resolution)
    n = 0
    for img in scene.images:
        if img.gray is None:
            img.load(max_dim=max_dim)
        cam = img.working_camera()
        H, W = img.gray.shape
        proj = _project(cam, mesh.vertices.astype(np.float64))
        fid, depth, bary = native.rasterize(proj, mesh.faces, H, W,
                                            want_bary=ext_l == ".dmap")
        depth = np.where(fid >= 0, depth, 0.0).astype(np.float32)
        out = f"{stem}{img.meta.id:04d}{ext}"
        if ext_l == ".dmap":
            # interpolate vertex normals, rotate into camera space (the
            # .dmap convention, ExportDepthDataRaw)
            nrm = np.zeros((H, W, 3), np.float32)
            sel = fid >= 0
            tri = mesh.faces[fid[sel]]
            nw = np.einsum("pk,pkc->pc", bary[sel], vnorm[tri])
            nc = nw @ cam.R.T
            nc /= np.maximum(np.linalg.norm(nc, axis=1, keepdims=True), 1e-12)
            nrm[sel] = nc.astype(np.float32)
            d_valid = depth[depth > 0]
            dd = dmapio.DepthData(
                depth=depth, image_width=W, image_height=H,
                depth_min=float(d_valid.min()) if len(d_valid) else 0.001,
                depth_max=float(d_valid.max()) if len(d_valid) else 1.0,
                file_name=img.meta.name,
                view_ids=np.array(
                    [img.meta.id] + [vs.id for vs in (img.meta.view_scores
                                                      or [])], np.uint32),
                K=cam.K, R=cam.R, C=cam.C, normal=nrm,
            )
            dmapio.save(dd, out)
        elif ext_l == ".pfm":
            imio.save_pfm(out, depth)
        else:
            v = depth[depth > 0]
            lo, hi = (v.min(), v.max()) if len(v) else (0.0, 1.0)
            vis = np.where(depth > 0,
                           255 - (depth - lo) / max(hi - lo, 1e-9) * 223, 0)
            cv2.imwrite(out, vis.astype(np.uint8))
        n += 1
    log.info("mesh rendered into %d depth maps (%s)", n, base_name)
    return n
