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


def shapes():
    pds = R.PairData(
        imgA=jnp.zeros((NP, H, W), jnp.float32),
        imgB=jnp.zeros((NP, H, W), jnp.float32),
        face_vid=jnp.zeros((NP, H, W, 3), jnp.int32),
        bary=jnp.zeros((NP, H, W, 3), jnp.float32),
        mask=jnp.zeros((NP, H, W), bool),
        KA_R=jnp.zeros((NP, 3, 3), jnp.float32),
        KA_t=jnp.zeros((NP, 3), jnp.float32),
        KB_R=jnp.zeros((NP, 3, 3), jnp.float32),
        KB_t=jnp.zeros((NP, 3), jnp.float32),
        sizeB=jnp.zeros((NP, 2), jnp.float32),
        CA=jnp.zeros((NP, 3), jnp.float32),
        reg_scale=jnp.zeros((NP,), jnp.float32),
    )
    v = jnp.zeros((NV, 3), jnp.float32)
    adj = jnp.zeros((NV, DEG), jnp.int32)
    deg = jnp.zeros((NV,), jnp.float32)
    faces = jnp.zeros((NF, 3), jnp.int32)
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
    v, pds, adj, deg, faces, bnd = shapes()
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
