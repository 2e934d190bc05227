"""Dev: split refine wall time into host rasterize / upload / device step.

Usage: python scripts/dev_refine_profile.py [W] [iters] [rr]
Runs the bench refine workload (18k-face noise-recovery, 5 views) with
instrumented timing, then prints a per-phase breakdown.  rr = host
re-rasterization cadence (OMVS_REFINE_RERASTER).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    rr = sys.argv[3] if len(sys.argv) > 3 else None
    if rr:
        os.environ["OMVS_REFINE_RERASTER"] = rr

    from quality_harness import build_gt_scene
    from openmvs_tpu.config import RefineOptions
    from openmvs_tpu import refine as R
    from openmvs_tpu.scene import Mesh

    # instrument build_pds_stacked + device_steps via monkeypatching the
    # module-level raster helper is invasive; time phases coarsely instead:
    # wrap native.rasterize (host raster) and _device_steps (device)
    from openmvs_tpu import native

    t_raster = [0.0]
    orig_rast = native.rasterize

    def timed_rast(*a, **k):
        t0 = time.time()
        out = orig_rast(*a, **k)
        t_raster[0] += time.time() - t0
        return out

    native.rasterize = timed_rast

    t_dev = [0.0]
    orig_steps = R._device_steps

    def timed_steps(*a, **k):
        t0 = time.time()
        out = orig_steps(*a, **k)
        # force completion for honest timing (axon block_until_ready no-op)
        _ = float(np.asarray(out[3]))
        t_dev[0] += time.time() - t0
        return out

    R._device_steps = timed_steps

    scene, gt_mesh, _ = build_gt_scene(shape="smooth", W=W, H=W * 3 // 4)
    rng = np.random.default_rng(11)
    nz = gt_mesh.vertices.copy()
    nz[:, 2] += rng.normal(0, 0.05, len(nz)).astype(np.float32)
    mesh = Mesh(vertices=nz, faces=gt_mesh.faces.copy())

    t0 = time.time()
    rm = R.refine_mesh(scene, mesh, RefineOptions(scales=2, iters=iters))
    wall = time.time() - t0
    err = float(np.abs(np.asarray(rm.vertices)[:, 2]
                       - gt_mesh.vertices[:, 2]).mean())
    other = wall - t_raster[0] - t_dev[0]
    print(f"RESULT refine W={W} iters={iters} rr={rr or 4}: wall={wall:.1f}s "
          f"raster={t_raster[0]:.1f}s device={t_dev[0]:.1f}s "
          f"other={other:.1f}s mean_z_err={err:.5f}", flush=True)


if __name__ == "__main__":
    main()
