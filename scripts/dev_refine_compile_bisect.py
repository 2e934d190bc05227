"""Bisect the _device_steps_split compile-time blowup (round 5).

Measures jit compile (lower+compile, no execute) of progressively larger
pieces of the refine device step at the bench leg's exact shapes:
14 pairs, 240x320 rasters, nv=20480 (bucketed), nf=36864 (bucketed).
"""
import time
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from openmvs_tpu import refine as R

NP = 14
H, W = 240, 320
NV = 20480
NF = 36864
DEG = 12


def shapes(real=False):
    """real=True: plausible random data (REAL gather/scatter index
    distributions — all-zero indices hide the TPU's scattered-access cost
    entirely: measured 0.27 ms/iter on zeros vs the leg's ~160 ms)."""
    if not real:
        fv = jnp.zeros((NP, H, W, 3), jnp.int32)
        bary = jnp.zeros((NP, H, W, 3), jnp.float32)
        mask = jnp.zeros((NP, H, W), bool)
        imgs = jnp.zeros((NP, H, W), jnp.float32)
        v = jnp.zeros((NV, 3), jnp.float32)
        adj = jnp.zeros((NV, DEG), jnp.int32)
        faces = jnp.zeros((NF, 3), jnp.int32)
        Ks = jnp.zeros((NP, 3, 3), jnp.float32)
    else:
        rng = np.random.default_rng(0)
        fv = jnp.asarray(rng.integers(0, NV, (NP, H, W, 3)), jnp.int32)
        b = rng.random((NP, H, W, 3)).astype(np.float32)
        bary = jnp.asarray(b / b.sum(-1, keepdims=True))
        mask = jnp.asarray(rng.random((NP, H, W)) < 0.8)
        imgs = jnp.asarray(rng.random((NP, H, W)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (NV, 3)).astype(np.float32))
        adj = jnp.asarray(rng.integers(-1, NV, (NV, DEG)), jnp.int32)
        faces = jnp.asarray(rng.integers(0, NV, (NF, 3)), jnp.int32)
        K = np.array([[288.0, 0, 160], [0, 288, 120], [0, 0, 1]], np.float32)
        Ks = jnp.asarray(np.tile(K, (NP, 1, 1)))
    if real:
        fid = jnp.asarray(np.random.default_rng(2).integers(
            0, NF, (NP, H, W)), jnp.int32)
    else:
        fid = jnp.zeros((NP, H, W), jnp.int32)
    pds = R.PairData(
        imgA=imgs, imgB=imgs,
        face_vid=fv, bary=bary, mask=mask,
        KA_R=Ks, KA_t=jnp.zeros((NP, 3), jnp.float32),
        KB_R=Ks, KB_t=jnp.zeros((NP, 3), jnp.float32),
        sizeB=jnp.full((NP, 2), 240.0, jnp.float32),
        CA=jnp.zeros((NP, 3), jnp.float32),
        reg_scale=jnp.ones((NP,), jnp.float32),
        fid=fid,
    )
    deg = jnp.full((NV,), float(DEG), jnp.float32)
    bnd = jnp.zeros((NV,), bool)
    return v, pds, adj, deg, faces, bnd


def timeit(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    comp = lowered.compile()
    t2 = time.time()
    print(f"{name:32s} lower {t1-t0:7.2f}s  compile {t2-t1:7.2f}s")
    return comp


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    v, pds, adj, deg, faces, bnd = shapes(real=(which == "iter_real"))
    if which == "iter_real":
        which = "iter"
    pd1 = jax.tree.map(lambda x: x[0], pds)

    if which in ("all", "pair1"):
        timeit("pair_grad x1", lambda v, pd: R._pair_energy_grad_manual(v, pd), v, pd1)
    if which in ("all", "vmap"):
        timeit("pair_grad vmap14", lambda v, pds: jax.vmap(
            R._pair_energy_grad_manual, in_axes=(None, 0))(v, pds), v, pds)
    if which in ("all", "energy"):
        timeit("energy_grad (vmap+reg)", lambda v, pds: R._energy_grad(
            v, pds, adj, deg, faces, jnp.float32(0.5), jnp.float32(0.01),
            jnp.float32(1.0), bnd, jnp.float32(0.9)), v, pds)
    if which in ("all", "steps"):
        timeit("device_steps (fori 4)", lambda v, pds: R._device_steps(
            v, v, v, jnp.int32(0), pds, adj, deg, faces, jnp.float32(0.5),
            jnp.float32(0.01), jnp.float32(1.0), bnd, jnp.float32(0.9)), v, pds)
    if which in ("all", "iter"):
        t0 = time.time()
        vout, e = R._device_iter(v, jnp.int32(0), pds, adj, deg, faces,
                                 jnp.float32(0.5), jnp.float32(0.01),
                                 jnp.float32(1.0), bnd, jnp.float32(0.9))
        e.block_until_ready()
        t1 = time.time()
        vout, e = R._device_iter(vout, jnp.int32(1), pds, adj, deg, faces,
                                 jnp.float32(0.5), jnp.float32(0.01),
                                 jnp.float32(1.0), bnd, jnp.float32(0.9))
        e.block_until_ready()
        t2 = time.time()
        print(f"device_iter first-call {t1-t0:7.2f}s  second {t2-t1:7.3f}s")


if __name__ == "__main__":
    main()
