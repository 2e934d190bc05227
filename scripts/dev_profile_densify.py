"""Dev: wall-time breakdown of estimate_depth_map on the current backend."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from openmvs_tpu.scene import Scene
from openmvs_tpu.config import DenseOptions
from openmvs_tpu import densify
from openmvs_tpu.io import images as imio
from openmvs_tpu.view_selection import select_views_for_scene
from openmvs_tpu.ops import patchmatch, seed


def main():
    scene = Scene.load("/root/reference/apps/Tests/data/scene.mvs")
    opts = DenseOptions()
    w0 = max(im.width for im in scene.images)
    h0 = max(im.height for im in scene.images)
    max_dim = imio.compute_max_resolution(
        w0, h0, opts.resolution_level, opts.min_resolution, opts.max_resolution)
    for img in scene.images:
        img.load(max_dim=max_dim)
    select_views_for_scene(scene, opts)

    # warm: compile everything
    t0 = time.time()
    r0 = densify.estimate_depth_map(scene, 0, opts)
    print(f"warmup photometric: {time.time()-t0:.2f}s")
    t0 = time.time()
    _ = densify.estimate_depth_map(scene, 0, opts, prev=r0,
                                   neighbor_results={scene.images[0].meta.id: r0},
                                   geometric_iter=0)
    print(f"warmup geometric: {time.time()-t0:.2f}s")

    # timed full maps
    t0 = time.time()
    r = densify.estimate_depth_map(scene, 1, opts)
    print(f"photometric map: {time.time()-t0:.2f}s")
    t0 = time.time()
    _ = densify.estimate_depth_map(scene, 1, opts, prev=r,
                                   neighbor_results={scene.images[1].meta.id: r,
                                                     scene.images[0].meta.id: r0},
                                   geometric_iter=0)
    print(f"geometric map: {time.time()-t0:.2f}s")

    # manual stage breakdown at full res
    img = scene.images[2]
    num = opts.num_views if opts.num_views > 0 else len(img.meta.view_scores)
    nbr_ids = [vs.id for vs in img.meta.view_scores[:num]]
    id_to_idx = {im.meta.id: i for i, im in enumerate(scene.images)}
    nbr_imgs = [scene.images[id_to_idx[i]] for i in nbr_ids]
    pts_sel, trusted = [], []
    for i, v in enumerate(scene.pointcloud.views):
        if img.meta.id in v:
            pts_sel.append(scene.pointcloud.points[i])
            trusted.append(len(v) >= opts.min_views_trust_point)
    pts_sel = np.asarray(pts_sel)
    trusted = np.asarray(trusted)
    cam = img.working_camera()
    H, W = img.gray.shape
    t0 = time.time()
    sd, sn, d_min, d_max = seed.seed_depth_normal(cam, W, H, pts_sel, trusted)
    print(f"seed_depth_normal: {time.time()-t0:.2f}s")
    t0 = time.time()
    data = densify._build_pm_data(
        img.gray, cam, [n.gray for n in nbr_imgs],
        [n.working_camera() for n in nbr_imgs], opts, d_min, d_max, None)
    jax.block_until_ready(data.w)
    print(f"_build_pm_data (full res): {time.time()-t0:.2f}s")
    key = jax.random.PRNGKey(0)
    nV = len(nbr_imgs)
    t0 = time.time()
    state = patchmatch.init_state(data, opts, key, jax.numpy.asarray(sd),
                                  jax.numpy.asarray(sn), nV, False)
    jax.block_until_ready(state.conf)
    print(f"init_state: {time.time()-t0:.2f}s")
    for it in range(3):
        t0 = time.time()
        state = patchmatch.sweep(state, data, opts, jax.random.fold_in(key, it),
                                 nV, False, mode="exact")
        jax.block_until_ready(state.conf)
        print(f"sweep[{it}] full-res exact: {time.time()-t0:.3f}s")
    t0 = time.time()
    fin = patchmatch.finalize(state, data, opts, True)
    jax.block_until_ready(fin.conf)
    print(f"finalize: {time.time()-t0:.2f}s")
    t0 = time.time()
    d = np.asarray(fin.depth); n = np.asarray(fin.normal); c = np.asarray(fin.conf)
    print(f"download: {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
