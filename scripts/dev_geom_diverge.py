"""Dev: capture REAL in-situ geometric-term inputs on the TPU and compare
  - geom_term_pallas (Mosaic-compiled kernel)
  - geom_term_pallas (interpret mode = kernel LOGIC on plain XLA)
  - _geom_xla_jit    (XLA term on the TPU)
  - _geom_xla_jit    (XLA term on the CPU device = ground truth)

on the first geometric-iteration call of the bundled scene at pipeline
resolution.  Reports per-pair stats + the value histogram of disagreeing
pixels (is the kernel stuck at the 2.0 window-miss neutral? wild? etc.)

Usage: python scripts/dev_geom_diverge.py [max_dim]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CAPTURE = {}


def main():
    max_dim = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    import jax
    import jax.numpy as jnp

    from openmvs_tpu.scene import Scene
    from openmvs_tpu.config import DenseOptions
    from openmvs_tpu import densify
    from openmvs_tpu.view_selection import select_views_for_scene
    from openmvs_tpu.ops import patchmatch as pm

    scene = Scene.load("/root/reference/apps/Tests/data/scene.mvs")
    opts = DenseOptions()
    for img in scene.images:
        img.load(max_dim=max_dim)
    select_views_for_scene(scene, opts)

    # photometric maps for view 0 + its neighbors
    results = {}
    for i in range(scene.n_views):
        t0 = time.time()
        r = densify.estimate_depth_map(scene, i, opts)
        if r is not None:
            results[scene.images[i].meta.id] = r
        print(f"photometric view {i}: {time.time()-t0:.1f}s", flush=True)

    # capture the first _geom_all_views call's inputs
    orig = pm._geom_all_views

    def capture(data, n_views, depth_c):
        if "data" not in CAPTURE:
            CAPTURE["data"] = data
            CAPTURE["n_views"] = n_views
            CAPTURE["depth_c"] = np.asarray(depth_c)
        return orig(data, n_views, depth_c)

    pm._geom_all_views = capture
    os.environ["OMVS_GEOM_SPLIT"] = "1"
    rid0 = scene.images[0].meta.id
    densify.estimate_depth_map(scene, 0, opts, prev=results[rid0],
                               neighbor_results=results, geometric_iter=0)
    pm._geom_all_views = orig
    os.environ.pop("OMVS_GEOM_SPLIT")
    assert "data" in CAPTURE, "no geometric call captured"

    data = CAPTURE["data"]
    n_views = CAPTURE["n_views"]
    depth_c = jnp.asarray(CAPTURE["depth_c"])
    v = data.views
    from openmvs_tpu.ops import pm_kernel
    from openmvs_tpu.ops.pm_kernel import geom_term_pallas

    cpu = jax.devices("cpu")[0]
    for j in range(n_views):
        args = (v.depth[j], v.size[j], v.Tl[j], v.Tm[j], v.Tr[j], v.Tn[j],
                depth_c, data.X0, data.uv)
        k_tpu = np.asarray(geom_term_pallas(*args))
        geom_term_pallas._clear_cache()
        pm_kernel.INTERPRET = True
        k_int = np.asarray(geom_term_pallas(*args))
        pm_kernel.INTERPRET = False
        geom_term_pallas._clear_cache()
        x_tpu = np.asarray(pm._geom_xla_jit(data, depth_c, v.depth[j],
                                            v.size[j], v.Tl[j], v.Tm[j],
                                            v.Tr[j], v.Tn[j]))
        with jax.default_device(cpu):
            args_c = jax.tree.map(
                lambda x: jax.device_put(np.asarray(x), cpu),
                (data, depth_c, v.depth[j], v.size[j], v.Tl[j], v.Tm[j],
                 v.Tr[j], v.Tn[j]))
            x_cpu = np.asarray(pm._geom_xla_jit(*args_c))

        def rep(tag, a, b):
            d = np.abs(a - b)
            bad = d > 0.1
            line = (f"  {tag}: frac>0.1={bad.mean():.4f} mean|d|={d.mean():.4f}")
            if bad.any():
                av, bv = a[bad], b[bad]
                line += (f" | A at miss-neutral 2.0: {(np.abs(av-2.0)<1e-3).mean():.3f}"
                         f" | A==4: {(av>3.999).mean():.3f}"
                         f" | B==4: {(bv>3.999).mean():.3f}")
            print(line, flush=True)

        print(f"view {j}:", flush=True)
        rep("kernelTPU vs cpuXLA  ", k_tpu, x_cpu)
        rep("kernelINT vs cpuXLA  ", k_int, x_cpu)
        rep("xlaTPU    vs cpuXLA  ", x_tpu, x_cpu)
        rep("kernelTPU vs kernelINT", k_tpu, k_int)


if __name__ == "__main__":
    main()
