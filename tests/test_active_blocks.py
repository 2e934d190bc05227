"""Active row-block compaction contract (patchmatch._score_select):
convergence work-skipping must be a pure work reduction — never a change in
what the scored blocks compute, and never an update outside the selected
blocks.  Reference analogue: DepthMap.cpp:630-799 per-pixel skipping."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _setup():
    import __graft_entry__ as ge
    from openmvs_tpu.ops import patchmatch as pm

    data, state, opts, v = ge._make_example(h=96, w=128, v=2)
    key = jnp.zeros(2, jnp.uint32)
    return pm, data, state, opts, key, v


def _run(pm, data, state, opts, key, v, fracs):
    """Three sweeps with the given per-sweep active fractions, threading
    conf_prev exactly like densify's loop."""
    prev_conf = None
    for it, frac in enumerate(fracs):
        this_conf = state.conf
        state = pm.sweep(
            state, data, opts, key, v, False, mode="nn", n_prop=8,
            fold=it + 1,
            active_frac=(frac if prev_conf is not None else 0.0),
            conf_prev=prev_conf)
        prev_conf = this_conf
    return state


def test_full_fraction_is_bit_identical(monkeypatch):
    monkeypatch.setenv("OMVS_COMPACT", "1")
    pm, data, state, opts, key, v = _setup()
    s_ref = _run(pm, data, state, opts, key, v, [0.0, 0.0, 0.0])
    s_one = _run(pm, data, state, opts, key, v, [0.0, 1.0, 1.0])
    np.testing.assert_array_equal(np.asarray(s_ref.depth),
                                  np.asarray(s_one.depth))
    np.testing.assert_array_equal(np.asarray(s_ref.conf),
                                  np.asarray(s_one.conf))


def test_half_fraction_updates_only_selected_blocks(monkeypatch):
    monkeypatch.setenv("OMVS_COMPACT", "1")
    pm, data, state, opts, key, v = _setup()
    # two full sweeps to get a churn signal, then one half-fraction sweep
    prev_conf = None
    for it in range(2):
        this_conf = state.conf
        state = pm.sweep(state, data, opts, key, v, False, mode="nn",
                         n_prop=8, fold=it + 1)
        prev_conf = this_conf
    before = state
    # ONE half-step: the selection contract is per half-step (each parity
    # picks its own top-churn block set)
    after = pm._sweep_parity(state, data, opts,
                             jax.random.fold_in(key, 3), v, False, 3, "nn",
                             0, 8, active_frac=0.5, conf_prev=prev_conf)
    d_changed = np.asarray(after.depth != before.depth)
    c_after = np.asarray(after.conf)
    c_before = np.asarray(before.conf)
    # conf is monotone non-increasing (selection keeps the better incumbent)
    assert (c_after <= c_before + 1e-7).all()
    # changed pixels must lie in at most ~frac of the 8-row compacted
    # blocks (one compacted block spans 16 image rows)
    H = d_changed.shape[0]
    blocks = d_changed.reshape(H // 16, 16, -1).any(axis=(1, 2))
    assert blocks.sum() <= int(np.ceil(0.5 * len(blocks))), (
        blocks.sum(), len(blocks))
    # and something was actually updated (the half-step did real work)
    assert d_changed.any()


def test_full_run_with_schedule_still_converges(monkeypatch):
    """End-to-end densify sanity with OMVS_ACTIVE=0.5: the depth field on
    this constant-seed example must still move toward a valid solution
    (same check the adaptive-EE tests use)."""
    monkeypatch.setenv("OMVS_COMPACT", "1")
    monkeypatch.setenv("OMVS_ACTIVE", "0.5")
    pm, data, state, opts, key, v = _setup()
    s_act = _run(pm, data, state, opts, key, v, [0.0, 0.0, 0.5])
    s_ref = _run(pm, data, state, opts, key, v, [0.0, 0.0, 0.0])
    va = np.asarray(data.valid)
    ca, cr = np.asarray(s_act.conf)[va], np.asarray(s_ref.conf)[va]
    # skipping quiescent blocks may only cost a little mean confidence
    assert ca.mean() <= cr.mean() + 0.01, (ca.mean(), cr.mean())
