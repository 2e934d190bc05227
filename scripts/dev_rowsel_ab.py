"""Dev: A/B the scoring kernel's row-selection strategies on the TPU.

Times score_view_pallas (the production kernel) at bench-like shapes
(C=11 candidates, 480x640, 25 texels, bilinear + nearest) under:
  rowscan : default per-row broadcast/select scan (24 rows x 3 blocks)
  slab    : OMVS_SLAB static diagonal slabs (17 slabs)
  dynslab : OMVS_DYNSLAB dynamic band (BAND-7 slabs at runtime base, rolled
            right-sample gather)  [+ band-size sweep]

Parity is asserted against rowscan on the same inputs (uncovered pixels may
only invalidate, never change value).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from openmvs_tpu.ops import pm_kernel
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dev_kernel_variants import make_inputs

    dev = [d for d in jax.devices() if d.platform != "cpu"]
    if not dev:
        print("no TPU device; aborting")
        return 1
    dev = dev[0]

    C, H, W, T = 11, 480, 640, 25
    inp = make_inputs(C=C, H=H, W=W, T=T)
    kw = dict(n_texels=T, th_robust=1.2)
    args = (inp["img"], inp["size"], inp["Hl"], inp["Hm"], inp["depth"],
            inp["normal"], inp["inv_nd"], inp["X0"], inp["goff"], inp["w"],
            inp["wtm"], inp["sum_w"], inp["norm_sq0"])
    args = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), dev), args)

    def run(tag, nearest, reps=8):
        out = pm_kernel.score_view_pallas(*args, nearest=nearest, **kw)
        float(out[0, 0, 0])                       # force completion (axon)
        t0 = time.time()
        for _ in range(reps):
            out = pm_kernel.score_view_pallas(*args, nearest=nearest, **kw)
        float(out[0, 0, 0])
        dt = (time.time() - t0) / reps
        print(f"{tag:28s} nearest={int(nearest)}  {dt*1e3:8.2f} ms",
              flush=True)
        return np.asarray(out), dt

    def set_mode(slab=False, dynslab=False, band=16):
        pm_kernel.SLAB = slab
        pm_kernel.DYNSLAB = dynslab
        pm_kernel.DYNSLAB_BAND = band
        pm_kernel.score_view_pallas._clear_cache()

    results = {}
    for nearest in (False, True):
        set_mode()
        ref, t_ref = run("rowscan", nearest)
        results[("rowscan", nearest)] = t_ref
        set_mode(slab=True)
        s, t = run("slab", nearest)
        _parity("slab", s, ref)
        results[("slab", nearest)] = t
        for band in (12, 16, 24):
            set_mode(dynslab=True, band=band)
            s, t = run(f"dynslab band={band}", nearest)
            _parity(f"dynslab{band}", s, ref)
            results[(f"dynslab{band}", nearest)] = t
    set_mode()
    print("\nspeedups vs rowscan (bilinear):")
    base = results[("rowscan", False)]
    for (tag, nn), t in results.items():
        if not nn:
            print(f"  {tag:20s} {base / t:5.2f}x")
    return 0


def _parity(tag, s, ref):
    agree = np.isclose(s, ref, rtol=1e-4, atol=1e-5)
    worst = s >= ref - 1e-5
    ok = np.all(agree | worst)
    cov = agree.mean()
    print(f"    parity[{tag}]: covered={cov:.4f} monotone={bool(ok)}",
          flush=True)
    assert ok, f"{tag}: non-monotone disagreement"
    assert cov > 0.97, f"{tag}: coverage {cov}"


if __name__ == "__main__":
    sys.exit(main())
