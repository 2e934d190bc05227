"""Dev: split the refine device-block cost into its stages on the real chip.

The r4 profile (OMVS_REFINE_PROF=1) showed the refine leg is DEVICE-bound:
~0.9 s per 4-iteration block at 14 pairs x 320x240 while host raster +
transfers are ~0.1-1 s per SCALE.  This script times, with warm caches:

  warp       _warp_coords only (verts gather + projective math)
  bilinear   + image sampling (the XLA gather suspected from PatchMatch r1)
  zncc       + box-ZNCC energy value (cumsum tail)
  zncc_vjp   + the full value_and_grad of the box tail
  scatter    + the vertex scatter-add (the full _pair_energy_grad_manual)
  block      the production 4-iteration _device_steps_split call

Each leg is jitted standalone, run twice (first run discarded), and timed
with a forced scalar fetch (block_until_ready is a no-op on this backend).

Usage: python scripts/dev_refine_device_split.py [n_pairs] [H] [W]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 240

    import jax
    import jax.numpy as jnp
    from openmvs_tpu import refine as R

    rng = np.random.default_rng(0)
    nv, nf = 9000, 18000
    verts = rng.uniform(-1, 1, (nv, 3)).astype(np.float32)
    verts[:, 2] += 5.0
    faces = rng.integers(0, nv, (nf, 3)).astype(np.int64)

    def mk_pair():
        fid = rng.integers(-1, nf, (H, W)).astype(np.int32)
        b = rng.uniform(0, 0.5, (H, W, 2)).astype(np.float32)
        bary = np.concatenate([b, (1 - b.sum(-1))[..., None]], -1)
        K_R = np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]],
                       np.float32)
        return R.PairData(
            imgA=rng.uniform(0, 1, (H, W)).astype(np.float32),
            imgB=rng.uniform(0, 1, (H, W)).astype(np.float32),
            face_vid=faces[np.maximum(fid, 0)],
            bary=bary.astype(np.float32),
            mask=fid >= 0,
            KA_R=K_R, KA_t=np.zeros(3, np.float32),
            KB_R=K_R, KB_t=np.zeros(3, np.float32),
            sizeB=np.array([H, W], np.float32),
            CA=np.zeros(3, np.float32),
            reg_scale=np.float32(1e-4),
        )

    pds = jax.tree.map(lambda *x: jnp.asarray(np.stack(x)),
                       *[mk_pair() for _ in range(n_pairs)])
    v = jnp.asarray(verts)

    def timeit(name, fn, *args):
        r = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        ts = []
        for _i in range(3):
            t0 = time.time()
            r = fn(*args)
            _ = float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
            ts.append(time.time() - t0)
        print(f"{name:10s} {min(ts)*1e3:9.1f} ms", flush=True)
        return min(ts)

    vm = jax.vmap

    @jax.jit
    def warp(v, pds):
        xb, yb, izb, ok = vm(R._warp_coords, in_axes=(None, 0))(v, pds)
        return jnp.sum(xb) + jnp.sum(ok)

    @jax.jit
    def bilin(v, pds):
        def one(v, pd):
            xb, yb, izb, ok = R._warp_coords(v, pd)
            s, gx, gy = R._bilinear_g(pd.imgB, xb, yb)
            return jnp.sum(s) + jnp.sum(gx)
        return jnp.sum(vm(one, in_axes=(None, 0))(v, pds))

    @jax.jit
    def zncc(v, pds):
        return jnp.sum(vm(R._pair_energy, in_axes=(None, 0))(v, pds))

    @jax.jit
    def zncc_vjp(v, pds):
        def one(v, pd):
            xb, yb, izb, ok = R._warp_coords(v, pd)
            s, gx, gy = R._bilinear_g(pd.imgB, xb, yb)
            warped = jnp.where(ok, s, 0.0)
            A = jnp.where(pd.mask, pd.imgA, 0.0)
            M = ok.astype(jnp.float32)
            e, gB = jax.value_and_grad(R._box_zncc_energy, argnums=1)(
                A, warped, M, 3)
            return e + jnp.sum(gB * gx)
        return jnp.sum(vm(one, in_axes=(None, 0))(v, pds))

    @jax.jit
    def full(v, pds):
        e, g, sup, nv_ = vm(R._pair_energy_grad_manual,
                            in_axes=(None, 0))(v, pds)
        return jnp.sum(e) + jnp.sum(g)

    timeit("warp", warp, v, pds)
    timeit("bilinear", bilin, v, pds)
    timeit("zncc", zncc, v, pds)
    timeit("zncc_vjp", zncc_vjp, v, pds)
    timeit("full", full, v, pds)


if __name__ == "__main__":
    main()
