"""NaN/checkify safety hooks (SURVEY §5.2): injected faults must trip."""

import subprocess
import sys

import numpy as np
import pytest

from openmvs_tpu.utils import safety


def test_check_finite_trips_on_injected_nan(monkeypatch):
    monkeypatch.setattr(safety, "DEBUG_NANS", True)
    bad = np.ones((4, 4, 5), np.float32)
    bad[2, 3, 0] = np.nan
    with pytest.raises(FloatingPointError, match="estimate_depth_map"):
        safety.check_finite("estimate_depth_map", bad)
    # clean data passes; non-float and None entries are ignored
    safety.check_finite("ok", np.ones(3, np.float32), np.arange(3), None)


def test_check_finite_disabled_by_default(monkeypatch):
    monkeypatch.setattr(safety, "DEBUG_NANS", False)
    bad = np.full((2, 2), np.nan, np.float32)
    safety.check_finite("ignored", bad)  # no raise


def test_checked_jit_trips_inside_compiled_graph(monkeypatch):
    monkeypatch.setattr(safety, "CHECKIFY", True)
    import jax.numpy as jnp
    from jax.experimental import checkify

    def f(x):
        return jnp.log(x) / (x - x[0])  # div-by-zero + log of nonpositive

    g = safety.checked_jit(f)
    with pytest.raises(checkify.JaxRuntimeError):
        np.asarray(g(jnp.array([0.0, 1.0, 2.0])))


def test_checked_jit_passthrough_when_disabled(monkeypatch):
    monkeypatch.setattr(safety, "CHECKIFY", False)
    import jax.numpy as jnp

    g = safety.checked_jit(lambda x: x * 2)
    np.testing.assert_allclose(np.asarray(g(jnp.arange(3.0))), [0, 2, 4])


def test_resolve_guard_trips_end_to_end(monkeypatch):
    """densify's DeferredResult.resolve applies the guard on download."""
    from openmvs_tpu import densify

    monkeypatch.setattr(safety, "DEBUG_NANS", True)
    packed = np.ones((6, 8, 5), np.float32)
    packed[0, 0, 4] = np.inf
    dr = densify.DeferredResult(packed, densify.DepthMapResult(
        image_idx=0, depth=None, normal=None, conf=None, d_min=0.1,
        d_max=10.0, neighbor_ids=[], camera=None))
    with pytest.raises(FloatingPointError):
        dr.resolve()


def test_debug_nans_config_installed():
    """OMVS_DEBUG_NANS=1 at import enables jax_debug_nans process-wide."""
    code = (
        "import os; os.environ['OMVS_DEBUG_NANS']='1';"
        "os.environ.setdefault('JAX_PLATFORMS','cpu');"
        "import openmvs_tpu, jax;"
        "assert jax.config.jax_debug_nans, 'hook not installed';"
        "print('installed')"
    )
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    assert p.returncode == 0, p.stderr
    assert "installed" in p.stdout
