"""Dev: fused point count + mesh face counts on the bundled scene (TPU).

Usage: python scripts/dev_gate_counts.py [exact|nn]
  nn    = current production schedule (nn search sweeps + exact final)
  exact = force exact scoring in every sweep (OMVS_ALL_EXACT=1)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "nn"
if "exact" in mode:
    os.environ["OMVS_ALL_EXACT"] = "1"
if "prop8" in mode:
    os.environ["OMVS_PROP8"] = "1"
if "oldrng" in mode:
    os.environ["OMVS_OLD_RNG"] = "1"

from openmvs_tpu.scene import Scene
from openmvs_tpu.config import DenseOptions, MeshOptions
from openmvs_tpu.densify import dense_reconstruction
from openmvs_tpu.reconstruct import reconstruct_mesh
from openmvs_tpu import mesh_ops


def main():
    scene = Scene.load("/root/reference/apps/Tests/data/scene.mvs")
    t0 = time.time()
    pc = dense_reconstruction(scene, DenseOptions())
    t1 = time.time()
    print(f"[{mode}] dense points: {len(pc)}  ({t1-t0:.1f}s)", flush=True)
    scene.pointcloud = pc
    mesh = reconstruct_mesh(scene, MeshOptions())
    print(f"[{mode}] raw faces: {len(mesh.faces)}", flush=True)
    clean = mesh_ops.clean_mesh(mesh, decimate=0.5)
    print(f"[{mode}] clean faces: {len(clean.faces)}", flush=True)
    sys.stderr.write(f"RESULT {mode}: points={len(pc)} raw={len(mesh.faces)} "
                     f"clean={len(clean.faces)} densify_s={t1-t0:.1f}\n")


if __name__ == "__main__":
    main()
