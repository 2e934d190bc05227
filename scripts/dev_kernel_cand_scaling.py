"""Measure scorer-kernel time vs candidate count C (round-5 close).

If ms/candidate falls as C grows, the per-(tile, texel-chunk) fixed cost
(block bookkeeping, patch slice, band hoist) dominates and batching more
candidates per tile visit is the next kernel lever (ROADMAP post-r5 #1).
Forces a scalar fetch per timing (axon block_until_ready is a no-op).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import __graft_entry__ as ge
    from openmvs_tpu.ops.pm_kernel import score_view_pallas

    data, state, opts, v = ge._make_example(h=480, w=640, v=2)
    j = 0
    for C in (1, 2, 4, 8, 12, 16):
        cd = jnp.tile(state.depth[None], (C, 1, 1)) \
            * (1.0 + 0.01 * jnp.arange(C))[:, None, None]
        cn = jnp.tile(state.normal[None], (C, 1, 1, 1))
        den = jnp.einsum("chwk,hwk->chw", cn, data.X0) * cd
        safe = jnp.abs(den) > 1e-12
        inv_nd = jnp.where(safe, 1.0 / jnp.where(safe, den, 1.0), 0.0)
        args = (data.views.image[j], data.views.size[j], data.views.Hl[j],
                data.views.Hm[j], cd, cn, inv_nd, data.X0, data.goff,
                data.w, data.wtm, data.sum_w, data.norm_sq0)
        kw = dict(n_texels=int(data.goff.shape[0]),
                  th_robust=float(opts.th_robust), nearest=True)
        out = score_view_pallas(*args, **kw)
        _ = float(out[0, 0, 0])                     # compile + settle
        t0 = time.time()
        N = 10
        for _i in range(N):
            out = score_view_pallas(*args, **kw)
        _ = float(out[0, 0, 0])
        dt = (time.time() - t0) / N
        print(f"C={C:3d}  {dt*1000:8.2f} ms/call  {dt*1000/C:7.2f} ms/cand",
              flush=True)


if __name__ == "__main__":
    main()
