"""Dev: full densify on the bundled 4-image scene."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os, sys, time

if os.environ.get("FORCE_CPU", "1") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax
if os.environ.get("FORCE_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
from openmvs_tpu.scene import Scene
from openmvs_tpu.config import DenseOptions
from openmvs_tpu.densify import dense_reconstruction

t0 = time.time()
scene = Scene.load("/root/reference/apps/Tests/data/scene.mvs")
opts = DenseOptions()
pc = dense_reconstruction(scene, opts, save_dmaps_to="/tmp/omvs_work")
print(f"TOTAL {time.time()-t0:.1f}s  points={len(pc)}")
scene.pointcloud = pc
pc.save_ply("/tmp/omvs_work/dense.ply")
scene.save("/tmp/omvs_work/scene_dense.mvs")
