"""Dev: in-situ geometric-kernel parity on REAL bundled-scene data (CPU).

Reproduces the geom-split quality regression without TPU hardware:
  phase 1 (slow): photometric densify for all views at reduced resolution
      on the CPU XLA path; pickles DepthMapResults to /tmp/geom_insitu/.
  phase 2: builds the GEOMETRIC-pass PMData for one view, runs the fused
      XLA geometric sweep while capturing the candidate stacks of each
      half-step, and compares, for every (view, candidate):
        - XLA _geometric_term            (ground truth)
        - geom_term_pallas, interpret=1  (kernel LOGIC on plain XLA)
      Reports where they disagree and why (window span vs other).

Usage:
    env -u PYTHONPATH JAX_PLATFORMS=cpu OMVS_PALLAS_INTERPRET=1 \
        python scripts/dev_geom_insitu.py [phase1|phase2] [max_dim]
"""
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/geom_insitu"
SCENE = "/root/reference/apps/Tests/data/scene.mvs"


def load_scene(max_dim):
    from openmvs_tpu.scene import Scene
    from openmvs_tpu.config import DenseOptions
    from openmvs_tpu.view_selection import select_views_for_scene

    scene = Scene.load(SCENE)
    opts = DenseOptions()
    for img in scene.images:
        img.load(max_dim=max_dim)
    select_views_for_scene(scene, opts)
    return scene, opts


def phase1(max_dim):
    from openmvs_tpu import densify

    scene, opts = load_scene(max_dim)
    os.makedirs(CACHE, exist_ok=True)
    results = {}
    for i in range(scene.n_views):
        t0 = time.time()
        r = densify.estimate_depth_map(scene, i, opts)
        print(f"view {i}: {time.time()-t0:.1f}s "
              f"valid={(r.depth > 0).mean():.3f}", flush=True)
        results[scene.images[i].meta.id] = r
    with open(f"{CACHE}/photo_{max_dim}.pkl", "wb") as f:
        pickle.dump(results, f)


def phase2(max_dim, ref_idx=0):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from openmvs_tpu import densify
    from openmvs_tpu.ops import patchmatch as pm
    from openmvs_tpu.ops.pm_kernel import geom_term_pallas, PATCH_COLS

    scene, opts = load_scene(max_dim)
    with open(f"{CACHE}/photo_{max_dim}.pkl", "rb") as f:
        neighbor_results = pickle.load(f)
    prev = neighbor_results[scene.images[ref_idx].meta.id]

    # wrap sweep (NOT jitted) to capture parity-0 candidate stacks eagerly
    orig_sweep = pm.sweep
    captures = []

    def spy_sweep(state, data, opts_, key, n_views, use_geom=False,
                  n_perturb=3, mode="nn", rescore_state=False,
                  n_prop=len(pm.PROP_OFFSETS), fold=0):
        if use_geom:
            cd, cn, cok = pm._build_candidates(state, data, opts_, key, 0,
                                               n_perturb, mode, n_prop,
                                               fold=fold)
            captures.append((data, np.asarray(cd), 0))
        return orig_sweep(state, data, opts_, key, n_views, use_geom,
                          n_perturb, mode, rescore_state, n_prop, fold)

    pm.sweep = spy_sweep
    try:
        densify.estimate_depth_map(scene, ref_idx, opts, prev=prev,
                                   neighbor_results=neighbor_results,
                                   geometric_iter=0)
    finally:
        pm.sweep = orig_sweep

    print(f"captured {len(captures)} half-steps", flush=True)
    for step, (data, cd, parity) in enumerate(captures):
        v = data.views
        n_views = int(v.image.shape[0])
        cd_j = jnp.asarray(cd)
        for j in range(n_views):
            ref = np.asarray(pm._geom_xla_jit(
                data, cd_j, v.depth[j], v.size[j], v.Tl[j], v.Tm[j],
                v.Tr[j], v.Tn[j]))
            ker = np.asarray(geom_term_pallas(
                v.depth[j], v.size[j], v.Tl[j], v.Tm[j], v.Tr[j], v.Tn[j],
                cd_j, data.X0, data.uv))
            d = np.abs(ker - ref)
            bad = d > 0.1
            line = (f"step {step} parity {parity} view {j}: "
                    f"frac>0.1 {bad.mean():.4f} mean|d| {d.mean():.4f}")
            if bad.any():
                # where: per-candidate and per-tile breakdown
                per_c = bad.reshape(bad.shape[0], -1).mean(axis=1)
                worst_c = int(np.argmax(per_c))
                # direction: kernel more penal (ker>ref) vs less
                more = float((ker > ref + 0.1).mean())
                less = float((ker < ref - 0.1).mean())
                line += (f"  worst_cand {worst_c} ({per_c[worst_c]:.3f})"
                         f"  ker>ref {more:.4f} ker<ref {less:.4f}")
                # window-span diagnosis on the worst candidate:
                # recompute x1 span per (8,128) tile for that candidate
                depth_c = cd[worst_c]
                X = np.asarray(data.X0) * depth_c[..., None]
                Tl = np.asarray(v.Tl[j]); Tm = np.asarray(v.Tm[j])
                X1 = X @ Tl.T + Tm
                z1 = X1[..., 2]
                zok = z1 > 1e-8
                with np.errstate(divide="ignore", invalid="ignore"):
                    x1 = np.where(zok, X1[..., 0] / z1, 1e9)
                    y1 = np.where(zok, X1[..., 1] / z1, 1e9)
                h_j, w_j = np.asarray(v.size[j])
                samp = zok & (depth_c > 0) & (x1 >= 1) & (x1 <= w_j - 2) \
                    & (y1 >= 1) & (y1 <= h_j - 2)
                H, W = depth_c.shape
                Ht, Wt = H // 8, (W + 127) // 128
                span_exceed = 0
                n_tiles = 0
                bad_in_span_tiles = 0
                badc = bad[worst_c]
                for ti in range(Ht):
                    for tj in range(Wt):
                        sl = (slice(ti*8, ti*8+8), slice(tj*128, (tj+1)*128))
                        s = samp[sl]
                        if not s.any():
                            continue
                        n_tiles += 1
                        xs = x1[sl][s]
                        ys = y1[sl][s]
                        # kernel window: c0 = align128(min-8), width PATCH_COLS
                        if (xs.max() - (int(xs.min() - 8) & ~127)) >= PATCH_COLS - 1 \
                           or (ys.max() - (int(ys.min() - 4) & ~7)) >= 24 - 1:
                            span_exceed += 1
                            bad_in_span_tiles += int(badc[sl].sum())
                line += (f"  tiles span>win {span_exceed}/{n_tiles} "
                         f"(bad px in those: {bad_in_span_tiles}"
                         f"/{int(badc.sum())})")
            print(line, flush=True)


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "phase2"
    max_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    if phase == "phase1":
        phase1(max_dim)
    else:
        phase2(max_dim)
