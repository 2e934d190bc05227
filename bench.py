"""Benchmark: PatchMatch dense depth estimation throughput (depth-maps/s/chip).

Runs the flagship kernel path (full per-view PatchMatch estimation: pyramid,
photometric sweeps, geometric-consistency iterations) on the bundled 4-image
scene and reports depth-maps/s on this chip.

Baseline: the reference publishes no numbers (BASELINE.md) and cannot be
built in this image, so the anchor is MEASURED on this host via
bench_ref/ref_pm_workload.cpp — a faithful C++ implementation of the
reference estimator workload (same op counts as DepthMap.cpp:465-912,
3+2 iters, 3-level pyramid, 3 views): 0.17 depth-maps/s on this machine's
CPU (1 core; ~7.5M hypothesis-view scores/s/core — methodology and
multi-core scaling context in bench_ref/BASELINE_MEASURED.md).
vs_baseline = ours / 0.17.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# BENCH_ENV.json (written by scripts/tpu_validation.sh after its A/B gate
# checks pass on real hardware) holds battery-validated env config — e.g.
# {"OMVS_GEOM_SPLIT": "1"}.  Explicit env always wins.
_env_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_ENV.json")
if os.path.exists(_env_file):
    try:
        for _k, _v in json.load(open(_env_file)).items():
            if not _k.startswith("_"):
                os.environ.setdefault(_k, str(_v))
    except (ValueError, OSError):
        pass

BASELINE_DEPTH_MAPS_PER_S = 0.17


def main():
    from openmvs_tpu.scene import Scene
    from openmvs_tpu.config import DenseOptions
    from openmvs_tpu import densify

    scene_path = os.environ.get(
        "OMVS_BENCH_SCENE", "/root/reference/apps/Tests/data/scene.mvs"
    )
    scene = Scene.load(scene_path)
    opts = DenseOptions()

    from openmvs_tpu.io import images as imio
    from openmvs_tpu.view_selection import select_views_for_scene

    w0 = max(im.width for im in scene.images)
    h0 = max(im.height for im in scene.images)
    max_dim = imio.compute_max_resolution(
        w0, h0, opts.resolution_level, opts.min_resolution, opts.max_resolution
    )
    for img in scene.images:
        img.load(max_dim=max_dim)
    select_views_for_scene(scene, opts)

    # warmup: compile everything on view 0 (photometric + one geometric)
    r0 = densify.estimate_depth_map(scene, 0, opts)
    _ = densify.estimate_depth_map(
        scene, 0, opts, prev=r0,
        neighbor_results={scene.images[0].meta.id: r0}, geometric_iter=0,
    )

    # timed: all photometric depth maps + geometric iterations (the dense
    # estimation work of DenseReconstruction, excluding IO/fusion), with
    # the production 2-deep pipeline: view i+1's host prep + dispatch
    # overlaps view i's device chain + download (defer_download)
    t0 = time.time()
    results = {}
    n_maps = 0
    stage_t = {}

    def drain(pending, limit):
        nonlocal n_maps
        while len(pending) > limit:
            rid, dr = pending.pop(0)
            results[rid] = dr.resolve()
            n_maps += 1

    pending = []
    for i in range(scene.n_views):
        d = densify.estimate_depth_map(scene, i, opts, defer_download=True)
        if d is None:
            continue
        pending.append((scene.images[i].meta.id, d))
        drain(pending, 1)
    drain(pending, 0)
    stage_t["photometric"] = time.time() - t0
    for gi in range(opts.estimation_geometric_iters):
        tg = time.time()
        prev_results, results = results, {}
        pending = []
        for i in range(scene.n_views):
            rid = scene.images[i].meta.id
            if rid not in prev_results:
                continue
            d = densify.estimate_depth_map(
                scene, i, opts, prev=prev_results[rid],
                neighbor_results=prev_results, geometric_iter=gi,
                defer_download=True,
            )
            if d is None:
                continue
            pending.append((rid, d))
            drain(pending, 1)
        drain(pending, 0)
        stage_t[f"geometric_{gi}"] = time.time() - tg
    dt = time.time() - t0

    value = n_maps / dt

    # refine leg (regression-visible throughput for the OTHER major device
    # workload): photometric mesh refinement of a z-perturbed GT surface on
    # the synthetic harness scene — fixed shapes, no fusion/meshing needed.
    # OMVS_BENCH_REFINE=0 skips it (the battery A/Bs only compare the
    # depth-map metric and should stay short).
    refine = {}
    if os.environ.get("OMVS_BENCH_REFINE", "1") != "0":
        try:
            refine = _bench_refine()
            stage_t["refine_s"] = refine.get("refine_wall_s", 0.0)
        except Exception as e:  # never let the leg break the headline metric
            refine = {"refine_error": repr(e)[:200]}

    # SGM leg (the OTHER estimator, SemiGlobalMatcher.cpp:530-737 role):
    # per-view tSGM depth maps on the same bundled scene; reports maps/s so
    # SGM finally has a tracked perf number (VERDICT r4 weak #7).
    # OMVS_BENCH_SGM=0 skips it.
    if os.environ.get("OMVS_BENCH_SGM", "1") != "0":
        try:
            tg = time.time()
            n_sgm = 0
            for i in range(scene.n_views):
                r = densify.estimate_depth_map_sgm(scene, i, opts)
                if r is not None:
                    n_sgm += 1
            sgm_dt = time.time() - tg
            refine["sgm_maps_per_s"] = round(n_sgm / sgm_dt, 4)
            refine["sgm_wall_s"] = round(sgm_dt, 2)
            stage_t["sgm_s"] = sgm_dt
        except Exception as e:
            refine["sgm_error"] = repr(e)[:200]

    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_STAGES.json"), "w") as f:
            json.dump({"total_s": round(dt, 2), "n_maps": n_maps,
                       "stages_s": {k: round(v, 2) for k, v in stage_t.items()},
                       "refine": refine,
                       "geom_split": os.environ.get("OMVS_GEOM_SPLIT", "")},
                      f, indent=1)
    except OSError:
        pass

    out = {
        "metric": "patchmatch_depth_maps_per_s",
        "value": round(value, 4),
        "unit": "depth-maps/s/chip (640x480, 5+2 iters, pyramid)",
        "vs_baseline": round(value / BASELINE_DEPTH_MAPS_PER_S, 3),
    }
    out.update({k: v for k, v in refine.items()
                if k.startswith(("refine", "sgm"))})
    print(json.dumps(out))


def _bench_refine():
    """Fixed refine workload: 18k-face GT height-field mesh, z-noise 0.05,
    RefineOptions(scales=2, iters=24) over 5 synthetic 320x240 views.
    Matches the quality harness's noise-recovery leg so the number is
    comparable to QUALITY_r0N wall splits."""
    import numpy as np

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from quality_harness import build_gt_scene
    from openmvs_tpu.config import RefineOptions
    from openmvs_tpu.refine import refine_mesh
    from openmvs_tpu.scene import Mesh

    scene, gt_mesh, _ = build_gt_scene(shape="smooth")
    rng = np.random.default_rng(11)
    nz = gt_mesh.vertices.copy()
    nz[:, 2] += rng.normal(0, 0.05, len(nz)).astype(np.float32)
    mesh = Mesh(vertices=nz, faces=gt_mesh.faces.copy())
    t0 = time.time()
    rm = refine_mesh(scene, mesh, RefineOptions(scales=2, iters=24))
    wall = time.time() - t0
    moved = float(np.abs(np.asarray(rm.vertices)[:, 2]
                         - gt_mesh.vertices[:, 2]).mean())
    return {
        "refine_wall_s": round(wall, 2),
        "refine_faces_per_s": round(len(mesh.faces) * 1 / wall, 1),
        "refine_mean_z_err": round(moved, 5),
        # measured same-host reference anchor for the IDENTICAL workload:
        # bench_ref/ref_refine_workload.cpp (0.73 s wall, 1 core) — see
        # bench_ref/BASELINE_MEASURED.md "Refine anchor (round 4)"
        "refine_vs_ref": round(0.73 / wall, 4),
    }


if __name__ == "__main__":
    main()
