"""Dev: per-sweep convergence statistics on the bundled scene (VERDICT r3
next-step #4 groundwork).

The reference stops refining pixels once confident (DepthMap.cpp:781 +
shrinking scaleRanges), so late sweeps cost a fraction of early ones; our
dense sweeps score every pixel x candidate every iteration.  Before
building skipping machinery, measure how much is actually skippable:

  per (level, iteration): fraction of pixels whose depth changed (rel >
  1e-3), whose conf improved (> 1e-3), and the fraction of 8-row blocks
  containing ANY changed pixel (the row-block compaction upper bound).

Usage: python scripts/dev_converge_stats.py [view_idx]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    view = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    import jax
    import jax.numpy as jnp

    from openmvs_tpu.scene import Scene
    from openmvs_tpu.config import DenseOptions
    from openmvs_tpu import densify
    from openmvs_tpu.io import images as imio
    from openmvs_tpu.ops import patchmatch
    from openmvs_tpu.view_selection import select_views_for_scene

    scene = Scene.load("/root/reference/apps/Tests/data/scene.mvs")
    opts = DenseOptions()
    w0 = max(im.width for im in scene.images)
    h0 = max(im.height for im in scene.images)
    max_dim = imio.compute_max_resolution(
        w0, h0, opts.resolution_level, opts.min_resolution,
        opts.max_resolution)
    for img in scene.images:
        img.load(max_dim=max_dim)
    select_views_for_scene(scene, opts)

    # replicate estimate_depth_map's pyramid/sweep loop with stats taps
    # (densify.py:242-325) — photometric pass only
    img = scene.images[view]
    id_to_idx = {im.meta.id: i for i, im in enumerate(scene.images)}
    nbr_ids = [vs.id for vs in img.meta.view_scores if vs.id in id_to_idx]
    nbr_imgs = [scene.images[id_to_idx[i]] for i in nbr_ids]
    from openmvs_tpu.ops import seed

    pts_sel = np.asarray(
        [scene.pointcloud.points[i]
         for i, v in enumerate(scene.pointcloud.views) if img.meta.id in v],
        np.float64).reshape(-1, 3)
    trusted = np.ones(len(pts_sel), bool)
    cam_full = img.working_camera()
    H, W = img.gray.shape
    sd_full, sn_full, d_min, d_max = seed.seed_depth_normal(
        cam_full, W, H, pts_sel, trusted)

    state_np = None
    lowres = None
    for level in range(opts.sub_resolution_levels, -1, -1):
        s = 1.0 / (2 ** level)
        ref_gray = densify._resize_gray(img.gray, s)
        cam = cam_full.scaled(ref_gray.shape[1] / W) if s != 1.0 else cam_full
        nbr_grays = [densify._resize_gray(n.gray, s) for n in nbr_imgs]
        nbr_cams = [n.working_camera().scaled(g.shape[1] / n.gray.shape[1])
                    if s != 1.0 else n.working_camera()
                    for n, g in zip(nbr_imgs, nbr_grays)]
        h, w = ref_gray.shape
        if state_np is None:
            sdl = np.zeros((h, w), np.float32)
            snl = np.zeros((h, w, 3), np.float32)
            ys, xs = np.nonzero(sd_full > 0)
            sdl[np.clip((ys * s).astype(int), 0, h - 1),
                np.clip((xs * s).astype(int), 0, w - 1)] = sd_full[ys, xs]
            snl[np.clip((ys * s).astype(int), 0, h - 1),
                np.clip((xs * s).astype(int), 0, w - 1)] = sn_full[ys, xs]
        else:
            sdl = jax.image.resize(state_np[0], (h, w), "linear")
            snl = jax.image.resize(state_np[1], (h, w, 3), "nearest")
            lowres = sdl
        data = densify._build_pm_data(ref_gray, cam, nbr_grays, nbr_cams,
                                      opts, d_min, d_max, lowres, None)
        key = jax.random.PRNGKey(view * 131 + level)
        nV = len(nbr_grays)
        n_exact = max(1, opts.exact_final_iters)
        n_iters = opts.estimation_iters
        first_mode = "exact" if 0 >= n_iters - n_exact else "nn"
        state = patchmatch.init_state(
            data, opts, key, jnp.asarray(sdl), jnp.asarray(snl), nV, False,
            mode=first_mode)
        prev_mode = None
        for it in range(n_iters):
            mode = "exact" if it >= n_iters - n_exact else "nn"
            d_prev = np.asarray(state.depth)
            c_prev = np.asarray(state.conf)
            t0 = time.time()
            state = patchmatch.sweep(
                state, data, opts, key, nV, False, mode=mode,
                rescore_state=(prev_mode is not None and mode != prev_mode),
                n_perturb=max(1, opts.random_iters // 2), n_prop=8,
                fold=it + 1)
            d_new = np.asarray(state.depth)   # forces completion
            wall = time.time() - t0
            c_new = np.asarray(state.conf)
            prev_mode = mode
            valid = (d_prev > 0) | (d_new > 0)
            rel = np.abs(d_new - d_prev) / np.maximum(np.abs(d_prev), 1e-9)
            changed = valid & (rel > 1e-3)
            improved = valid & ((c_prev - c_new) > 1e-3)
            hb = -(-h // 8)
            blk_changed = changed[: hb * 8 - (8 - h % 8) % 8]
            blocks = np.add.reduceat(
                changed.astype(np.int32),
                np.arange(0, changed.shape[0], 8), axis=0) > 0
            active_rows = blocks.any(axis=1).mean()
            active_blocks = blocks.mean()
            print(f"L{level} it{it} [{mode}] wall={wall:6.3f}s "
                  f"changed={changed.mean():.4f} "
                  f"conf_improved={improved.mean():.4f} "
                  f"active_8rows={active_rows:.4f} "
                  f"active_8x1blocks={active_blocks:.4f}", flush=True)
        state_np = (state.depth, state.normal)


if __name__ == "__main__":
    main()
