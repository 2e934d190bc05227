"""Dev: fused vs split-structure geometric sweep A/B on real data (CPU).

Runs the SAME geometric-pass estimate_depth_map twice from the cached
photometric state (scripts/dev_geom_insitu.py phase1):
  A: default fused sweep (XLA geometric term inside the score jit)
  B: OMVS_GEOM_SPLIT=xla (three chained jits, XLA geometric term computed
     standalone and passed in as geom_terms)
and compares the resulting depth/conf maps.  If these match, the split
STRUCTURE is sound and any TPU geom-split quality regression must come
from the Mosaic-compiled kernel itself.

Usage:
    env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/dev_geom_ab.py [max_dim]
"""
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dev_geom_insitu import CACHE, load_scene  # noqa: E402


def run(scene, opts, neighbor_results, ref_idx):
    from openmvs_tpu import densify

    prev = neighbor_results[scene.images[ref_idx].meta.id]
    return densify.estimate_depth_map(scene, ref_idx, opts, prev=prev,
                                      neighbor_results=neighbor_results,
                                      geometric_iter=0)


def main():
    import numpy as np

    max_dim = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    scene, opts = load_scene(max_dim)
    with open(f"{CACHE}/photo_{max_dim}.pkl", "rb") as f:
        neighbor_results = pickle.load(f)

    for ref_idx in range(min(scene.n_views, 2)):
        os.environ.pop("OMVS_GEOM_SPLIT", None)
        a = run(scene, opts, neighbor_results, ref_idx)
        os.environ["OMVS_GEOM_SPLIT"] = "xla"
        b = run(scene, opts, neighbor_results, ref_idx)
        os.environ.pop("OMVS_GEOM_SPLIT", None)

        da, db = np.asarray(a.depth), np.asarray(b.depth)
        va, vb = da > 0, db > 0
        agree = (va == vb).mean()
        both = va & vb
        rel = np.abs(da[both] - db[both]) / np.maximum(da[both], 1e-9)
        print(f"view {ref_idx}: valid A {va.mean():.4f} B {vb.mean():.4f} "
              f"mask-agree {agree:.5f} rel-depth p99 "
              f"{np.percentile(rel, 99) if both.any() else 0:.2e} "
              f"max {rel.max() if both.any() else 0:.2e}", flush=True)


if __name__ == "__main__":
    main()
