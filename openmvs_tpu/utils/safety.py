"""NaN / numeric-fault safety hooks (SURVEY §5.2).

The reference's safety net is ASSERT + Breakpad crash minidumps
(libs/MVS/Common.cpp:49-52).  The JAX equivalent: functional purity removes
data races by construction; these env-gated hooks cover numeric faults:

* ``OMVS_DEBUG_NANS=1`` — enables ``jax_debug_nans`` (every primitive result
  is checked during execution; raises at the op that produced the NaN) plus
  host-side post-download finiteness guards at stage boundaries.
* ``OMVS_CHECKIFY=1`` — wraps the stage-level jitted entry points with
  ``jax.experimental.checkify`` float checks (NaN/Inf/div) so the fault is
  raised with the check location even inside fully fused compiled graphs,
  where ``jax_debug_nans``'s per-primitive re-execution is unavailable
  (e.g. under Pallas calls).

Both default OFF: they disable fusion benefits / add transfers and exist for
debugging, exactly like the reference's debug ASSERT builds.
"""

from __future__ import annotations

import os

import numpy as np

DEBUG_NANS = os.environ.get("OMVS_DEBUG_NANS", "") == "1"
CHECKIFY = os.environ.get("OMVS_CHECKIFY", "") == "1"

_installed = False


def install():
    """Apply process-wide debug configuration (called at package import)."""
    global _installed
    if _installed:
        return
    _installed = True
    if DEBUG_NANS:
        import jax

        jax.config.update("jax_debug_nans", True)


def check_finite(name: str, *arrays) -> None:
    """Host-side stage-boundary guard: raises FloatingPointError naming the
    stage if any downloaded array contains NaN/Inf.  No-op unless
    OMVS_DEBUG_NANS=1."""
    if not DEBUG_NANS:
        return
    for i, a in enumerate(arrays):
        if a is None:
            continue
        arr = np.asarray(a)
        if arr.dtype.kind != "f":
            continue
        if not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"non-finite values in '{name}' output #{i}: {n_bad}/{arr.size} "
                f"bad elements, shape {arr.shape} (OMVS_DEBUG_NANS tripped)")


def checked_jit(fn, **jit_kwargs):
    """jax.jit, optionally wrapped with checkify float checks.

    With OMVS_CHECKIFY=1 the returned callable raises
    ``jax.experimental.checkify.JaxRuntimeError`` at the first NaN/Inf/
    div-by-zero inside the compiled graph; otherwise it is a plain jit.
    """
    import jax

    if not CHECKIFY:
        return jax.jit(fn, **jit_kwargs)
    from jax.experimental import checkify

    cfn = checkify.checkify(fn, errors=checkify.float_checks)
    # checkify threads an error value through as the first output
    jfn = jax.jit(cfn, **jit_kwargs)

    def wrapper(*args, **kwargs):
        err, out = jfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    wrapper.__name__ = getattr(fn, "__name__", "checked")
    return wrapper
