"""Adaptive-convergence sweep block (the TPU form of the reference's
per-pixel convergence skipping, DepthMap.cpp:630-799).

Contract: a block that never exits early is BIT-IDENTICAL to the eager
per-iteration sweep loop (same fold_in RNG), and the early-exit predicate
stops the while_loop once (almost) no pixel improves.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _example():
    import __graft_entry__ as ge

    data, state, opts, v = ge._make_example(h=96, w=128, v=2)
    key = jax.random.PRNGKey(7)
    return data, state, opts, v, key


def test_block_matches_eager_loop_bitwise():
    from openmvs_tpu.ops import patchmatch as pm

    data, state, opts, nV, key = _example()
    n_sweeps = 3
    eager = state
    for it in range(n_sweeps):
        eager = pm.sweep(eager, data, opts, key, nV, False,
                         mode="nn", n_perturb=2, n_prop=8, fold=it + 1)
    # min_frac=0.0 -> cond is always true -> all n_sweeps run
    block, n_done = pm.sweep_block_adaptive(
        state, data, opts, key, nV, False, n_perturb=2, mode="nn",
        n_prop=8, first_fold=1, n_sweeps=n_sweeps, min_sweeps=1,
        eps=5e-3, min_frac=0.0)
    assert int(n_done) == n_sweeps
    np.testing.assert_array_equal(np.asarray(eager.depth), np.asarray(block.depth))
    np.testing.assert_array_equal(np.asarray(eager.conf), np.asarray(block.conf))
    np.testing.assert_array_equal(np.asarray(eager.normal), np.asarray(block.normal))


def test_block_exits_early_when_converged():
    from openmvs_tpu.ops import patchmatch as pm

    data, state, opts, nV, key = _example()
    # an impossible improvement bar (every pixel must improve) stops the
    # loop at min_sweeps
    block, n_done = pm.sweep_block_adaptive(
        state, data, opts, key, nV, False, n_perturb=2, mode="nn",
        n_prop=8, first_fold=1, n_sweeps=5, min_sweeps=2,
        eps=5e-3, min_frac=1.1)
    assert int(n_done) == 2
    # and the executed sweeps are still the real thing: scores only improve
    assert float(jnp.nanmax(block.conf - state.conf)) <= 1e-6


def test_densify_early_exit_default_matches_eager(monkeypatch):
    """The early-exit block (the r5 PRODUCTION DEFAULT) with an exit bar
    of 0 (never exits) must equal the eager per-sweep path
    (OMVS_EARLY_EXIT=0) exactly."""
    from test_sharded_mixed import _mixed_scene
    from openmvs_tpu import densify
    from openmvs_tpu.config import DenseOptions
    from openmvs_tpu.view_selection import select_views_for_scene

    opts = DenseOptions(sub_resolution_levels=0, estimation_iters=5,
                        estimation_geometric_iters=0)
    scene = _mixed_scene()
    select_views_for_scene(scene, opts)
    monkeypatch.setenv("OMVS_EARLY_EXIT", "0")
    r0 = densify.estimate_depth_map(scene, 0, opts)
    monkeypatch.setenv("OMVS_EARLY_EXIT", "1")
    monkeypatch.setenv("OMVS_EE_FRAC", "0.0")
    r1 = densify.estimate_depth_map(scene, 0, opts)
    np.testing.assert_array_equal(r0.depth, r1.depth)
    np.testing.assert_array_equal(r0.conf, r1.conf)
