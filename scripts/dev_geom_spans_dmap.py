"""Dev: warp-span distribution per (8,128) tile for the geometric kernel at
FULL pipeline resolution, using the .dmap outputs of a previous pipeline run
as the photometric results (no CPU phase-1 rerun needed).

Usage: env -u PYTHONPATH JAX_PLATFORMS=cpu \
    python scripts/dev_geom_spans_dmap.py [workdir] [ref_idx]
"""
import os
import sys
import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = "/root/reference/apps/Tests/data/scene.mvs"


class _Captured(Exception):
    pass


def main(workdir="/tmp/omvs_work", ref_idx=0):
    import jax.numpy as jnp  # noqa: F401
    from openmvs_tpu.scene import Scene
    from openmvs_tpu.config import DenseOptions
    from openmvs_tpu.view_selection import select_views_for_scene
    from openmvs_tpu import densify
    from openmvs_tpu.io import dmap as dmap_io
    from openmvs_tpu.ops import patchmatch as pm

    scene = Scene.load(SCENE)
    opts = DenseOptions()
    for img in scene.images:
        img.load(max_dim=0 if opts.resolution_level == 0 else None)
    # match the pipeline's working resolution: the dmaps define it
    dmaps = sorted(glob.glob(f"{workdir}/depth*.dmap"))
    assert dmaps, f"no dmaps in {workdir}"
    dd0 = dmap_io.load(dmaps[0])
    max_dim = max(dd0.image_width, dd0.image_height)
    for img in scene.images:
        img.load(max_dim=max_dim)
    select_views_for_scene(scene, opts)

    neighbor_results = {}
    for i, p in enumerate(dmaps):
        dd = dmap_io.load(p)
        neighbor_results[scene.images[i].meta.id] = densify.DepthMapResult(
            image_idx=i, depth=dd.depth, normal=dd.normal, conf=dd.conf,
            d_min=dd.depth_min, d_max=dd.depth_max, neighbor_ids=[],
            camera=None,
        )
    print(f"working res from dmap: {dd0.depth.shape}", flush=True)
    prev = neighbor_results[scene.images[ref_idx].meta.id]

    orig_sweep = pm.sweep
    captures = []

    def spy_sweep(state, data, opts_, key, n_views, use_geom=False,
                  n_perturb=3, mode="nn", rescore_state=False,
                  n_prop=len(pm.PROP_OFFSETS), fold=0):
        if use_geom:
            cd, _, _ = pm._build_candidates(state, data, opts_, key, 0,
                                            n_perturb, mode, n_prop,
                                            fold=fold)
            captures.append((data, np.asarray(cd)))
            raise _Captured()
        return orig_sweep(state, data, opts_, key, n_views, use_geom,
                          n_perturb, mode, rescore_state, n_prop, fold)

    pm.sweep = spy_sweep
    try:
        densify.estimate_depth_map(scene, ref_idx, opts, prev=prev,
                                   neighbor_results=neighbor_results,
                                   geometric_iter=0)
    except _Captured:
        pass
    finally:
        pm.sweep = orig_sweep

    data, cd = captures[0]
    v = data.views
    n_views = int(v.image.shape[0])
    C, H, W = cd.shape
    col_spans = []
    row_spans = []
    for j in range(n_views):
        Tl = np.asarray(v.Tl[j]); Tm = np.asarray(v.Tm[j])
        h_j, w_j = np.asarray(v.size[j])
        X = np.asarray(data.X0)[None] * cd[..., None]
        X1 = X @ Tl.T + Tm
        z1 = X1[..., 2]
        zok = z1 > 1e-8
        with np.errstate(divide="ignore", invalid="ignore"):
            x1 = np.where(zok, X1[..., 0] / np.where(zok, z1, 1), 1e9)
            y1 = np.where(zok, X1[..., 1] / np.where(zok, z1, 1), 1e9)
        samp = zok & (cd > 0) & (x1 >= 1) & (x1 <= w_j - 2) \
            & (y1 >= 1) & (y1 <= h_j - 2)
        for c in range(C):
            for ti in range(H // 8):
                for tj in range((W + 127) // 128):
                    sl = (c, slice(ti*8, ti*8+8), slice(tj*128, (tj+1)*128))
                    s = samp[sl]
                    if not s.any():
                        continue
                    xs = x1[sl][s]; ys = y1[sl][s]
                    cw = xs.max() - (int(xs.min() - 8) & ~127)
                    rh = ys.max() - (int(ys.min() - 4) & ~7)
                    col_spans.append(cw)
                    row_spans.append(rh)
    col_spans = np.array(col_spans); row_spans = np.array(row_spans)
    pct = [50, 90, 95, 99, 99.9, 100]
    print(f"{len(col_spans)} (view,cand,tile) windows at {W}x{H}")
    print("col span percentiles:",
          {p: round(float(np.percentile(col_spans, p)), 1) for p in pct})
    print("row span percentiles:",
          {p: round(float(np.percentile(row_spans, p)), 1) for p in pct})
    for cols, rows in ((384, 24), (384, 48), (512, 56), (512, 64),
                      (640, 64), (640, 80), (768, 96)):
        fit = float(((col_spans < cols - 1) & (row_spans < rows - 1)).mean())
        print(f"frac fitting {cols}x{rows}: {fit:.5f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/omvs_work",
         int(sys.argv[2]) if len(sys.argv) > 2 else 0)
