"""Dev harness: PatchMatch on a synthetic 2-view fronto-planar scene."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from openmvs_tpu.config import DenseOptions
from openmvs_tpu.geometry.camera import Camera
from openmvs_tpu.densify import _build_pm_data
from openmvs_tpu.ops import patchmatch

rng = np.random.default_rng(0)
H, W = 96, 128
f = 100.0
K = np.array([[f, 0, W / 2 - 0.5], [0, f, H / 2 - 0.5], [0, 0, 1.0]])

# plane z = 5 + 0.01x in cam0 space; textured
cam0 = Camera(K, np.eye(3), np.zeros(3))
baseline = 0.5
cam1 = Camera(K, np.eye(3), np.array([baseline, 0, 0.0]))

# build a random smooth texture on the plane, render both views by sampling
tex = rng.uniform(0, 1, (512, 512)).astype(np.float32)
import cv2
tex = cv2.GaussianBlur(tex, (0, 0), 1.5)
tex = (tex - tex.min()) / (tex.max() - tex.min())

def plane_depth(u, v):
    # plane: n . X = d0 with X = depth * K^-1 (u,v,1)
    # choose slanted plane n=(nx,0,nz), point (0,0,5)
    n = np.array([0.2, 0.1, -1.0]); n /= np.linalg.norm(n)
    d0 = n @ np.array([0, 0, 5.0])
    ray = np.stack([(u - K[0, 2]) / f, (v - K[1, 2]) / f, np.ones_like(u)], -1)
    return d0 / (ray @ n)

def render(cam):
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    # intersect rays of cam with the plane defined in world (=cam0) space
    n = np.array([0.2, 0.1, -1.0]); n /= np.linalg.norm(n)
    d0 = n @ np.array([0, 0, 5.0])
    rays = cam.image_to_cam(np.stack([uu, vv], -1))  # cam space rays
    rays_w = rays @ cam.R  # to world
    denom = rays_w @ n
    t = (d0 - cam.C @ n) / denom
    X = cam.C + rays_w * t[..., None]
    # texture lookup by world x,y
    tu = (X[..., 0] * 40 + 256) % 512
    tv = (X[..., 1] * 40 + 256) % 512
    return cv2.remap(tex, tu.astype(np.float32), tv.astype(np.float32), cv2.INTER_LINEAR), t

img0, gt_depth = render(cam0)
img1, _ = render(cam1)
gt = gt_depth  # for cam0, t = depth along ray... careful: t is distance along ray where ray has z=1 per unit => depth = t * rays.z
# rays z=1 in cam space so depth = t (cam0: rays_w=rays, C=0)

opts = DenseOptions(sub_resolution_levels=0, estimation_iters=6)
data = _build_pm_data(
    img0.astype(np.float32), cam0, [img1.astype(np.float32)], [cam1],
    opts, 3.0, 8.0, None, None,
)
key = jax.random.PRNGKey(0)
sd = np.zeros((H, W), np.float32)
sn = np.zeros((H, W, 3), np.float32)
# sparse seeds: 30 random ground-truth samples
ys = rng.integers(8, H - 8, 30); xs = rng.integers(8, W - 8, 30)
sd[ys, xs] = gt[ys, xs]
state = patchmatch.init_state(data, opts, key, jnp.asarray(sd), jnp.asarray(sn), 1, False)
print("init: conf mean", float(state.conf.mean()))
for it in range(opts.estimation_iters):
    state = patchmatch.sweep(state, data, opts, jax.random.fold_in(key, it), 1, False)
    d = np.asarray(state.depth)
    err = np.abs(d - gt) / gt
    inner = err[8:-8, 8:-8]
    print(f"iter {it}: conf mean {float(state.conf.mean()):.4f}  median rel err {np.median(inner):.5f}  frac<1% {(inner < 0.01).mean():.3f}")

final = patchmatch.finalize(state, data, opts, False)
d = np.asarray(final.depth)
valid = d > 0
err = np.abs(d - gt) / gt
print("valid frac:", valid.mean(), " median err (valid):", np.median(err[valid]))
