"""Quality harness: ground-truth reconstruction metrics -> QUALITY_r{N}.json.

The reference cannot be built in this image (no eigen/boost/CGAL), so
reference-relative ETH3D/DTU numbers are out of reach here; instead this
harness measures ABSOLUTE reconstruction quality against exact synthetic
ground truth (a textured height-field rendered through the real camera
model) plus the bundled-scene stage statistics:

  - per-view depth-map accuracy (MAE, rel-error, completeness) vs GT depth
    (CompareDepthMaps role, DepthMap.cpp:2042-2152)
  - fused-cloud accuracy/completeness/F-score vs GT surface samples
    (the DTU/ETH3D protocol from BASELINE.json)
  - both the PatchMatch and SGM estimators, same scene

Usage: python scripts/quality_harness.py [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_gt_scene(n_views=5, W=320, H=240, grid=96, seed=0, shape="smooth"):
    """Textured height-field + ring of cameras; returns (scene, gt_mesh,
    gt_depth_fn) where gt_depth_fn(view_idx) renders the GT depth map.

    shape="smooth": gentle bumps (the round-1 harness).
    shape="steps": adds two raised box plateaus (~0.9 and ~1.4 units tall,
    15-23% of the 6.0 viewing distance) with near-vertical walls — sharp
    depth discontinuities that OCCLUDE background differently per view,
    stressing occlusion handling, discontinuity preservation and the
    speckle/gap post-filters (the failure modes a smooth field never hits).
    shape="slant": a sawtooth of planes pitched ~63 deg from frontoparallel
    (|dz/dx| = 2) — grazing-angle geometry where frontoparallel matching
    fails and the slanted-plane hypothesis (normal estimation,
    DepthMap.cpp:555-561 plane-induced homography) must carry the match.
    shape="textureless": the smooth field, but the central third of the
    surface gets a CONSTANT albedo (no ZNCC signal) — exercises the
    low-confidence machinery: low-res prior seeding (pyramid upscale),
    neighbor propagation across the dead zone, and the confidence-gated
    post-filters (reference analogues DepthMap.cpp:535-561 low-res prior +
    SceneDensify.cpp:810-1035)."""
    import cv2

    from openmvs_tpu import native
    from openmvs_tpu.io import mvs as mvsio
    from openmvs_tpu.geometry.camera import Camera
    from openmvs_tpu.scene import Mesh, PointCloud, Scene, SceneImage

    rng = np.random.default_rng(seed)
    # height-field surface z = 6 + bumps over [-3,3]^2
    g = np.linspace(-3, 3, grid)
    xx, yy = np.meshgrid(g, g)
    zz = (6.0 + 0.6 * np.sin(xx * 1.3) * np.cos(yy * 1.7)
          + 0.3 * np.sin(2.9 * xx + 1.0) * np.sin(2.3 * yy))
    if shape == "steps":
        # raised plateaus with steep (sigmoid, ~1.5-cell-wide) walls toward
        # the cameras (−z); heights chosen to occlude several pixels of
        # background at the side views
        def plateau(cx, cy, hx, hy, height, sharp=8.0):
            sx = 1 / (1 + np.exp(-sharp * (hx - np.abs(xx - cx))))
            sy = 1 / (1 + np.exp(-sharp * (hy - np.abs(yy - cy))))
            return height * sx * sy
        zz = zz - plateau(-1.1, -0.7, 1.0, 0.9, 0.9) \
                - plateau(1.3, 1.0, 0.8, 1.1, 1.4)
    elif shape == "slant":
        # sawtooth of planes, |dz/dx| = 2 (~63 deg from frontoparallel for
        # the central camera): piecewise-linear in x with 1.5-unit period,
        # small y-ripple so the texture warp is 2-D
        period = 1.5
        tri = np.abs(((xx + 3.0) % period) - period / 2)   # 0..period/2
        zz = 6.0 + 2.0 * (tri - period / 4) + 0.05 * np.sin(3.1 * yy)
    verts = np.stack([xx, yy, zz], -1).reshape(-1, 3)
    faces = []
    for r in range(grid - 1):
        for c in range(grid - 1):
            i = r * grid + c
            faces.append((i, i + 1, i + grid))
            faces.append((i + 1, i + grid + 1, i + grid))
    faces = np.asarray(faces, np.int32)
    gt_mesh = Mesh(vertices=verts.astype(np.float32), faces=faces)

    def texture(x, y):
        # high-frequency smooth texture so ZNCC has signal everywhere
        t = (0.5 + 0.18 * np.sin(7.1 * x) * np.cos(6.3 * y)
             + 0.14 * np.sin(13.7 * x + 2.0) + 0.12 * np.cos(11.3 * y + 1.0)
             + 0.06 * np.sin(23.0 * x * y))
        t = np.clip(t, 0.02, 0.98)
        if shape == "textureless":
            # central third: constant albedo, zero ZNCC signal (smooth ramp
            # at the border so the transition itself is not a cue)
            w_dead = (1 / (1 + np.exp(-6.0 * (1.0 - np.abs(x))))
                      * 1 / (1 + np.exp(-6.0 * (2.0 - np.abs(y)))))
            t = t * (1 - w_dead) + 0.5 * w_dead
        return t

    K = np.array([[0.9 * W, 0, W / 2 - 0.5], [0, 0.9 * W, H / 2 - 0.5],
                  [0, 0, 1.0]])
    scene = Scene()
    cams = []
    for i in range(n_views):
        C = np.array([-1.6 + 0.8 * i, 0.15 * (i % 2), 0.0])
        cam = Camera(K, np.eye(3), C)
        cams.append(cam)
        meta = mvsio.ImageMeta()
        meta.id = i
        meta.name = f"gt{i}.png"
        meta.platform_id = i
        scene.platforms.append(mvsio.Platform(
            name=f"p{i}", cameras=[mvsio.CameraRig(K=K, width=W, height=H)],
            poses=[mvsio.Pose(R=np.eye(3), C=C)]))
        img = SceneImage(meta=meta, camera=cam, width=W, height=H)
        # render the GT image: rasterize, then evaluate the texture at the
        # barycentric surface point
        pr = project(cam, verts)
        fid, depth, bary = native.rasterize(pr, faces, H, W)
        hit = fid >= 0
        fv = faces[np.where(hit, fid, 0)]
        P = (verts[fv] * bary[..., None]).sum(axis=2)
        gray = np.where(hit, texture(P[..., 0], P[..., 1]), 0.0)
        img.gray = cv2.GaussianBlur(gray.astype(np.float32), (0, 0), 0.5)
        img.color = None
        scene.images.append(img)

    # sparse cloud: random surface samples seen by all views
    sel = rng.choice(len(verts), 600, replace=False)
    pts = verts[sel].astype(np.float32)
    views = [np.arange(n_views, dtype=np.uint32)] * len(pts)
    scene.pointcloud = PointCloud(
        points=pts, views=views,
        weights=[np.ones(n_views, np.float32)] * len(pts))

    def gt_depth(i):
        _, depth, _ = native.rasterize(project(cams[i], verts), faces, H, W)
        return depth

    return scene, gt_mesh, gt_depth


def project(cam, verts):
    Xc = (verts - cam.C) @ cam.R.T
    uv = Xc @ cam.K.T
    z = np.maximum(uv[:, 2], 1e-12)
    return np.stack([uv[:, 0] / z, uv[:, 1] / z, Xc[:, 2]], -1)


def run_estimator(scene, gt_depth, gt_mesh, estimator, tmpdir):
    from openmvs_tpu.config import DenseOptions
    from openmvs_tpu.densify import dense_reconstruction
    from openmvs_tpu.io import dmap as dmapio
    from openmvs_tpu import eval as ev

    W = max(im.width for im in scene.images)
    opts = DenseOptions(estimator=estimator, max_resolution=W,
                        min_resolution=W // 2, resolution_level=0)
    t0 = time.time()
    pc = dense_reconstruction(scene, opts, max_dim=W, save_dmaps_to=tmpdir)
    wall = time.time() - t0

    # depth-map stats vs GT
    stats = []
    for img in scene.images:
        p = os.path.join(tmpdir, f"depth{img.meta.id:04d}.dmap")
        if not os.path.exists(p):
            continue
        dd = dmapio.load(p)
        gt = gt_depth(img.meta.id)
        if gt.shape != dd.depth.shape:
            import cv2

            gt = cv2.resize(gt, dd.depth.shape[::-1], interpolation=cv2.INTER_NEAREST)
        s = ev.compare_depth_maps(dd.depth, gt)
        stats.append(s)
    # nanmean: a single failed view (empty depth/GT overlap -> NaN stats)
    # must read as a counted failure, not blank every aggregate
    n_failed = sum(1 for s in stats if not np.isfinite(s.mae))
    depth_metrics = {
        "mae": float(np.nanmean([s.mae for s in stats])) if stats else None,
        "rel_err_median": float(np.nanmean([s.rel_err_median for s in stats])) if stats else None,
        "completeness": float(np.nanmean([s.completeness for s in stats])) if stats else None,
        "frac_under_1pct": float(np.nanmean([s.frac_under_1pct for s in stats])) if stats else None,
        "failed_views": n_failed,
    }

    # cloud F-score vs dense GT surface samples at 1% of scene depth
    gv = gt_mesh.vertices
    fs = ev.point_cloud_fscore(np.asarray(pc.points), gv, threshold=0.06)
    # OBSERVABLE variant: GT vertices seen by >= 2 cameras (z within 1% of
    # the GT depth map at their projection).  The raw completeness counts
    # surface no camera ever sees (e.g. slant-scene back-slopes) against
    # the estimator; this variant is the true estimator metric.  The
    # battery keeps gating on the RAW key for round-over-round
    # comparability; both are recorded.
    cnt = np.zeros(len(gv), np.int32)
    for img in scene.images:
        pr = project(img.camera, gv.astype(np.float64))
        gt = gt_depth(img.meta.id)
        Hg, Wg = gt.shape
        x = np.round(pr[:, 0]).astype(np.int64)
        y = np.round(pr[:, 1]).astype(np.int64)
        z = pr[:, 2]
        inb = (z > 0) & (x >= 0) & (x < Wg) & (y >= 0) & (y < Hg)
        d = gt[np.clip(y, 0, Hg - 1), np.clip(x, 0, Wg - 1)]
        cnt += (inb & (d > 0) & (z <= d * 1.01 + 1e-6)).astype(np.int32)
    vis = cnt >= 2
    fs_obs = ev.point_cloud_fscore(np.asarray(pc.points), gv[vis],
                                   threshold=0.06)
    return {
        "points": len(pc),
        "wall_s": round(wall, 1),
        "depth_vs_gt": depth_metrics,
        "cloud_fscore@0.06": {k: round(float(v), 4) for k, v in fs.items()},
        "cloud_fscore_observable@0.06": {
            k: round(float(v), 4) for k, v in fs_obs.items()},
        "gt_observable_frac": round(float(vis.mean()), 4),
    }, pc


def run_mesh_refine(scene, gt_mesh, pc):
    """Mesh + photometric refine leg: does RefineMesh measurably move the
    reconstructed surface toward GT (SceneRefine.cpp role)?  Metric =
    vertical distance to the ANALYTIC GT height field (the GT surface is
    z = F(x, y) on a regular grid) — distance to GT *vertex samples* has a
    ~half-grid-spacing floor that buries sub-0.03 surface movement.
    Vertices outside the height-field domain (rim junk every real
    reconstruction carries) are excluded and counted separately."""
    from scipy.interpolate import RegularGridInterpolator

    from openmvs_tpu.config import MeshOptions, RefineOptions
    from openmvs_tpu.reconstruct import reconstruct_mesh
    from openmvs_tpu.refine import refine_mesh
    from openmvs_tpu import mesh_ops

    g = int(round(np.sqrt(len(gt_mesh.vertices))))
    gx = gt_mesh.vertices[:g, 0]
    gy = gt_mesh.vertices[::g, 1]
    gz = gt_mesh.vertices[:, 2].reshape(g, g)
    interp = RegularGridInterpolator((gy, gx), gz, bounds_error=False,
                                     fill_value=np.nan)
    # occlusion band = steep-slope region of the GT field (plateau walls on
    # the steps scene; ~empty on smooth), dilated by 2 grid cells — the
    # region where occlusion handling, not plain convergence, decides error
    gyv, gxv = np.gradient(gz, gy, gx)
    from scipy import ndimage as _ndi
    # threshold 2.5: the smooth field's bump slopes stay < 2 everywhere,
    # the steps plateaus' sigmoid walls exceed 2.5 (band ~11% of the grid)
    band = _ndi.binary_dilation(np.hypot(gxv, gyv) > 2.5, iterations=2)
    band_interp = RegularGridInterpolator((gy, gx), band.astype(np.float32),
                                          bounds_error=False, fill_value=0.0)

    def dist_stats(m):
        v = np.asarray(m.vertices)
        zgt = interp(v[:, [1, 0]])
        inside = np.isfinite(zgt)
        d = np.abs(v[inside, 2] - zgt[inside])
        out = {"mean": round(float(d.mean()), 5),
               "rms": round(float(np.sqrt((d ** 2).mean())), 5),
               "p90": round(float(np.percentile(d, 90)), 5),
               "outside_frac": round(float(1 - inside.mean()), 4)}
        occl = band_interp(v[inside][:, [1, 0]]) > 0.5
        if occl.any():
            do = d[occl]
            out["occl_band"] = {
                "frac": round(float(occl.mean()), 4),
                "mean": round(float(do.mean()), 5),
                "rms": round(float(np.sqrt((do ** 2).mean())), 5),
                "p90": round(float(np.percentile(do, 90)), 5)}
        return out

    sc = scene
    sc.pointcloud = pc
    t0 = time.time()
    mesh = reconstruct_mesh(sc, MeshOptions())
    mesh = mesh_ops.clean_mesh(mesh, decimate=0.7)
    before = dist_stats(mesh)
    rm = refine_mesh(sc, mesh, RefineOptions(scales=2, iters=16))
    after = dist_stats(rm)
    # noise-recovery leg: photometric refinement must pull a z-perturbed
    # surface back toward GT (the convergence-power signal; the leg above
    # only guards that an already-converged mesh is not damaged)
    from openmvs_tpu.scene import Mesh as _Mesh

    rng = np.random.default_rng(11)
    nz = mesh.vertices.copy()
    nz[:, 2] += rng.normal(0, 0.05, len(nz)).astype(np.float32)
    noisy_before = dist_stats(_Mesh(vertices=nz, faces=mesh.faces))
    rn = refine_mesh(sc, _Mesh(vertices=nz, faces=mesh.faces),
                     RefineOptions(scales=2, iters=24))
    noisy_after = dist_stats(rn)
    return {
        "faces": len(mesh.faces),
        "wall_s": round(time.time() - t0, 1),
        "vertex_to_gt_before": before,
        "vertex_to_gt_after": after,
        "improved": bool(after["rms"] <= before["rms"] * 1.02),
        "noise_recovery_before": noisy_before,
        "noise_recovery_after": noisy_after,
        "noise_recovered": bool(
            noisy_after["rms"] < noisy_before["rms"] * 0.8),
    }


CORPUS = ("smooth", "steps", "slant", "textureless")


def run_shape(shape, W, H, grid, with_refine=True):
    import copy
    import tempfile

    scene, gt_mesh, gt_depth = build_gt_scene(shape=shape, W=W, H=H,
                                              grid=grid)
    results = {"harness": f"synthetic textured height-field ({shape}), "
                          f"5 views, {W}x{H}, grid {grid}",
               "threshold_note": "F-score threshold 0.06 = ~1% of the 6.0 scene depth"}
    for est in ("patchmatch", "sgm"):
        with tempfile.TemporaryDirectory() as td:
            # fresh copies: dense_reconstruction mutates view selection state
            sc = copy.deepcopy(scene)
            try:
                results[est], pc = run_estimator(sc, gt_depth, gt_mesh, est, td)
                if est == "patchmatch" and with_refine:
                    results["mesh_refine"] = run_mesh_refine(sc, gt_mesh, pc)
                    print("mesh_refine ->",
                          json.dumps(results["mesh_refine"]), flush=True)
            except Exception as e:  # record failures honestly
                results[est] = {"error": repr(e)[:300]}
            print(shape, est, "->", json.dumps(results[est])[:240], flush=True)
    return results


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "QUALITY_r03.json"
    shape = sys.argv[2] if len(sys.argv) > 2 else "smooth"
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 320
    H = int(sys.argv[4]) if len(sys.argv) > 4 else (W * 3 // 4)
    grid = int(sys.argv[5]) if len(sys.argv) > 5 else max(96, 96 * W // 320)
    if shape == "corpus":
        # the hard-scene corpus (VERDICT r4 #3): per-scene records + the
        # corpus MINIMUM F-scores — the number batteries must gate on
        # (calibrating on the easy smooth scene alone hides regressions on
        # occlusions / grazing slants / textureless patches)
        results = {"corpus": {}}
        for sh in CORPUS:
            results["corpus"][sh] = run_shape(sh, W, H, grid,
                                              with_refine=(sh == "smooth"))
        summary = {}
        for est in ("patchmatch", "sgm"):
            fs = {sh: r[est]["cloud_fscore@0.06"]["fscore"]
                  for sh, r in results["corpus"].items()
                  if est in r and "cloud_fscore@0.06" in r[est]}
            summary[est] = {
                "per_scene_f": fs,
                "min_f": min(fs.values()) if fs else 0.0,
                "n_ok": len(fs), "n_scenes": len(CORPUS),
            }
        results["summary"] = summary
        print("corpus summary:", json.dumps(summary), flush=True)
    else:
        results = run_shape(shape, W, H, grid)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
