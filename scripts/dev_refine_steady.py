"""Refine steady-state breakdown (round 5): which part of _device_iter
costs the ~0.16 s/iter observed in the bench leg?

Times chained executions with a trailing SCALAR FETCH (axon
block_until_ready is a no-op) of progressively smaller graphs at the bench
leg's realistic shapes/data, plus a two-stage scatter prototype:
per-pixel -> per-FACE accumulation (1 scatter index/pixel, wide contiguous
rows) then face -> vertex (tiny), vs the production per-vertex scatter
(3 indices/pixel).
"""
import sys
import os
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from dev_refine_compile_bisect import shapes
from openmvs_tpu import refine as R


def timed(name, fn, *args, n=10):
    out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # sync
    t0 = time.time()
    for _i in range(n):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.time() - t0) / n
    print(f"{name:42s} {dt*1000:9.2f} ms/iter", flush=True)
    return dt


@jax.jit
def full_iter(v, pds, adj, deg, faces, bnd):
    return R._device_iter(v, jnp.int32(3), pds, adj, deg, faces,
                          jnp.float32(0.5), jnp.float32(0.01),
                          jnp.float32(1.0), bnd, jnp.float32(0.9))[0]


@jax.jit
def pair_grads_only(v, pds):
    es, gs, sups, nv = jax.vmap(R._pair_energy_grad_manual,
                                in_axes=(None, 0))(v, pds)
    return gs.sum(0)


@jax.jit
def pair_no_scatter(v, pds):
    """_pair_energy_grad_manual minus the vertex scatters: per-pixel chain
    only (warp + bilinear grad + ZNCC AD + projective chain)."""
    def one(pd):
        xb, yb, izb, ok = R._warp_coords(v, pd)
        val, gx, gy = R._bilinear_g(pd.imgB, xb, yb)
        warped = jnp.where(ok, val, 0.0)
        A = jnp.where(pd.mask, pd.imgA, 0.0)
        M = ok.astype(jnp.float32)
        e, gB = jax.value_and_grad(R._box_zncc_energy, argnums=1)(A, warped, M, 3)
        gB = jnp.where(ok, gB, 0.0)
        dxb = gB * gx
        dyb = gB * gy
        Rm = pd.KB_R
        dX = (dxb[..., None] * (Rm[0][None, None] - xb[..., None] * Rm[2][None, None])
              + dyb[..., None] * (Rm[1][None, None] - yb[..., None] * Rm[2][None, None])
              ) * izb[..., None]
        contrib = pd.bary[..., None] * dX[..., None, :]
        return jnp.where(ok[..., None, None], contrib, 0.0).sum((0, 1))
    return jax.vmap(one)(pds).sum(0)


@jax.jit
def warp_zncc_only(v, pds):
    """warp + bilinear + ZNCC energy forward only (no AD, no scatter)."""
    def one(pd):
        xb, yb, izb, ok = R._warp_coords(v, pd)
        val = R._bilinear(pd.imgB, xb, yb)
        warped = jnp.where(ok, val, 0.0)
        A = jnp.where(pd.mask, pd.imgA, 0.0)
        return R._box_zncc_energy(A, warped, ok.astype(jnp.float32), 3)
    return jax.vmap(one)(pds).sum()


@jax.jit
def scatter_vertex_only(v, pds, faces):
    """Just the production per-vertex scatter on precomputed contribs."""
    def one(pd):
        contrib = pd.bary[..., None] * pd.bary[..., None, :]  # stand-in (H,W,3,3)
        g = jnp.zeros_like(v).at[pd.face_vid.reshape(-1)].add(
            contrib.reshape(-1, 3))
        return g
    return jax.vmap(one)(pds).sum(0)


@jax.jit
def scatter_face_then_vertex(v, pds, faces, fid):
    """Two-stage prototype: per-pixel -> per-face rows (1 index, 9 wide),
    then face -> vertex (nf*3 elements)."""
    nf = faces.shape[0]

    def one(pd, fidp):
        contrib = pd.bary[..., None] * pd.bary[..., None, :]  # (H,W,3,3)
        acc = jnp.zeros((nf, 9), v.dtype).at[fidp.reshape(-1)].add(
            contrib.reshape(-1, 9))
        return acc
    accs = jax.vmap(one)(pds, fid).sum(0).reshape(nf, 3, 3)
    g = jnp.zeros_like(v).at[faces.reshape(-1)].add(accs.reshape(-1, 3))
    return g


def main():
    v, pds, adj, deg, faces, bnd = shapes(real=True)
    rng = np.random.default_rng(1)
    NF = faces.shape[0]
    fid = jnp.asarray(rng.integers(0, NF, pds.mask.shape), jnp.int32)

    timed("full _device_iter", full_iter, v, pds, adj, deg, faces, bnd)
    timed("pair grads (with scatters)", pair_grads_only, v, pds)
    timed("pair chain, no scatter", pair_no_scatter, v, pds)
    timed("warp+zncc forward only", warp_zncc_only, v, pds)
    timed("scatter per-vertex (3 idx/px)", scatter_vertex_only, v, pds, faces)
    timed("scatter per-face 9-wide (1 idx/px)", scatter_face_then_vertex,
          v, pds, faces, fid)


if __name__ == "__main__":
    main()
