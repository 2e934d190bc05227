"""Dev: warp-span distribution per (8,128) tile for the geometric kernel,
from the phase-1 cache of dev_geom_insitu.py — sizes the kernel's patch
window (cols x rows) needed to cover real candidate warps.

Usage: env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/dev_geom_spans.py [max_dim]
"""
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dev_geom_insitu import load_scene, CACHE  # noqa: E402


def main(max_dim=320, ref_idx=0):
    import jax.numpy as jnp
    from openmvs_tpu import densify
    from openmvs_tpu.ops import patchmatch as pm

    scene, opts = load_scene(max_dim)
    with open(f"{CACHE}/photo_{max_dim}.pkl", "rb") as f:
        neighbor_results = pickle.load(f)
    prev = neighbor_results[scene.images[ref_idx].meta.id]

    orig_sweep = pm.sweep
    captures = []

    def spy_sweep(state, data, opts_, key, n_views, use_geom=False,
                  n_perturb=3, mode="nn", rescore_state=False,
                  n_prop=len(pm.PROP_OFFSETS), fold=0):
        if use_geom and not captures:
            cd, _, _ = pm._build_candidates(state, data, opts_, key, 0,
                                            n_perturb, mode, n_prop,
                                            fold=fold)
            captures.append((data, np.asarray(cd)))
        return orig_sweep(state, data, opts_, key, n_views, use_geom,
                          n_perturb, mode, rescore_state, n_prop, fold)

    pm.sweep = spy_sweep
    try:
        densify.estimate_depth_map(scene, ref_idx, opts, prev=prev,
                                   neighbor_results=neighbor_results,
                                   geometric_iter=0)
    finally:
        pm.sweep = orig_sweep

    data, cd = captures[0]
    v = data.views
    n_views = int(v.image.shape[0])
    C, H, W = cd.shape
    col_spans = []
    row_spans = []
    col_by_cand = {c: [] for c in range(C)}
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
                    # effective needed width incl. the align-down-128 anchor
                    cw = xs.max() - (int(xs.min() - 8) & ~127)
                    rh = ys.max() - (int(ys.min() - 4) & ~7)
                    col_spans.append(cw)
                    row_spans.append(rh)
                    col_by_cand[c].append(cw)
    col_spans = np.array(col_spans); row_spans = np.array(row_spans)
    pct = [50, 90, 95, 99, 99.9, 100]
    print(f"{len(col_spans)} (view,cand,tile) windows at {W}x{H}")
    print("col span percentiles:", {p: round(float(np.percentile(col_spans, p)), 1) for p in pct})
    print("row span percentiles:", {p: round(float(np.percentile(row_spans, p)), 1) for p in pct})
    print("frac fitting 384x24:", float(((col_spans < 383) & (row_spans < 23)).mean()))
    print("frac fitting 640x40:", float(((col_spans < 639) & (row_spans < 39)).mean()))
    print("frac fitting 896x56:", float(((col_spans < 895) & (row_spans < 55)).mean()))
    for c in range(C):
        cs = np.array(col_by_cand[c])
        if len(cs):
            print(f"  cand {c}: n={len(cs)} col p95={np.percentile(cs,95):.0f} "
                  f"p99.9={np.percentile(cs,99.9):.0f} fit384={float((cs<383).mean()):.3f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 320)
