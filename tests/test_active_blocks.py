"""Per-tile convergence skipping contract (patchmatch._score_select +
pm_kernel tile_act): skipping must be a pure work reduction — active tiles
compute exactly the default values, quiescent tiles keep their incumbents
verbatim.  Reference analogue: DepthMap.cpp:630-799 per-pixel skipping."""

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


def _run(pm, data, state, opts, key, v, eps_list):
    """Sweeps with per-sweep active_eps, threading conf_prev exactly like
    densify's loop."""
    prev_conf = None
    for it, eps in enumerate(eps_list):
        this_conf = state.conf
        state = pm.sweep(
            state, data, opts, key, v, False, mode="nn", n_prop=8,
            fold=it + 1,
            active_eps=(eps if prev_conf is not None else 0.0),
            conf_prev=prev_conf)
        prev_conf = this_conf
    return state


def test_always_active_is_bit_identical(monkeypatch):
    """eps=-1 keeps every tile active: the flag machinery must be a no-op
    (same kernel, all-ones flags -> identical results)."""
    monkeypatch.setenv("OMVS_COMPACT", "1")
    pm, data, state, opts, key, v = _setup()
    s_ref = _run(pm, data, state, opts, key, v, [0.0, 0.0, 0.0])
    s_one = _run(pm, data, state, opts, key, v, [0.0, -1.0, -1.0])
    np.testing.assert_array_equal(np.asarray(s_ref.depth),
                                  np.asarray(s_one.depth))
    np.testing.assert_array_equal(np.asarray(s_ref.conf),
                                  np.asarray(s_one.conf))


def test_skipped_tiles_keep_incumbents(monkeypatch):
    """One half-step with a realistic eps: changed pixels must lie only in
    tiles whose churn exceeded eps, conf stays monotone, quiescent tiles
    are bit-frozen."""
    monkeypatch.setenv("OMVS_COMPACT", "1")
    pm, data, state, opts, key, v = _setup()
    prev_conf = None
    for it in range(2):
        this_conf = state.conf
        state = pm.sweep(state, data, opts, key, v, False, mode="nn",
                         n_prop=8, fold=it + 1)
        prev_conf = this_conf
    before = state
    # pick eps at the median of per-tile churn so ~half the tiles quiesce
    _churn0 = np.where(np.asarray(data.valid),
                       np.asarray(prev_conf) - np.asarray(before.conf), 0.0)
    _cc = np.asarray(pm._compact_parity_rows(jnp.asarray(_churn0), 0))
    eps = float(np.median(_cc.reshape(-1, 8 * _cc.shape[1]).max(axis=1)))
    after = pm._sweep_parity(state, data, opts,
                             jax.random.fold_in(key, 3), v, False, 3, "nn",
                             0, 8, active_eps=eps, conf_prev=prev_conf)
    d_changed = np.asarray(after.depth != before.depth)
    c_after = np.asarray(after.conf)
    c_before = np.asarray(before.conf)
    assert (c_after <= c_before + 1e-7).all()
    assert d_changed.any()
    # recompute the expected tile flags exactly as _score_select does
    churn = np.where(np.asarray(data.valid),
                     np.asarray(prev_conf) - np.asarray(before.conf), 0.0)
    churn_c = np.asarray(pm._compact_parity_rows(jnp.asarray(churn), 0))
    Hc2 = churn_c.shape[0]
    nb = -(-Hc2 // 8)
    pad = nb * 8 - Hc2
    if pad:
        churn_c = np.concatenate(
            [churn_c, np.zeros((pad,) + churn_c.shape[1:])])
    act = churn_c.reshape(nb, -1).max(axis=1) > eps
    assert not act.all(), "test needs at least one quiescent tile"
    # compacted-lattice tile b covers image rows 16b..16b+15
    ch_blocks = d_changed.reshape(-1, 16, d_changed.shape[1]).any(axis=(1, 2))
    assert not np.any(ch_blocks & ~act[: len(ch_blocks)]), (
        np.nonzero(ch_blocks & ~act[: len(ch_blocks)]))


def test_kernel_tile_skip_interpret(monkeypatch):
    """The Pallas kernel itself (interpret mode): flagged-off tiles return
    the th_robust sentinel for every pixel/candidate; flagged-on tiles are
    bit-identical to the all-active call."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from openmvs_tpu.ops import pm_kernel
    import __graft_entry__ as ge
    from openmvs_tpu.ops import patchmatch as pm

    monkeypatch.setattr(pm_kernel, "INTERPRET", True)
    pm_kernel._score_view_pallas._clear_cache()
    try:
        data, state, opts, v = ge._make_example(h=48, w=128, v=2)
        cd = jnp.tile(state.depth[None], (2, 1, 1)) \
            * jnp.asarray([0.95, 1.05])[:, None, None]
        cn = jnp.tile(state.normal[None], (2, 1, 1, 1))
        den = jnp.einsum("chwk,hwk->chw", cn, data.X0) * cd
        safe = jnp.abs(den) > 1e-12
        inv_nd = jnp.where(safe, 1.0 / jnp.where(safe, den, 1.0), 0.0)
        j = 0
        args = (data.views.image[j], data.views.size[j], data.views.Hl[j],
                data.views.Hm[j], cd, cn, inv_nd, data.X0, data.goff,
                data.w, data.wtm, data.sum_w, data.norm_sq0)
        kw = dict(n_texels=int(data.goff.shape[0]),
                  th_robust=float(opts.th_robust))
        s_full = np.asarray(pm_kernel.score_view_pallas(*args, **kw))
        flags = jnp.asarray([1.0, 0.0, 1.0, 0.0, 1.0, 1.0])  # 48/8 tiles
        s_skip = np.asarray(pm_kernel.score_view_pallas(
            *args, tile_act=flags, **kw))
        th = float(opts.th_robust)
        fl = np.asarray(flags) > 0.5
        for t in range(6):
            rows = slice(8 * t, 8 * t + 8)
            if fl[t]:
                np.testing.assert_array_equal(s_skip[:, rows], s_full[:, rows])
            else:
                assert (s_skip[:, rows] == th).all(), t
    finally:
        pm_kernel._score_view_pallas._clear_cache()


def test_bf16_image_contract(monkeypatch):
    """bfloat16 neighbor-image storage (the r5 production default): score
    deviation vs f32 images stays at quantization level and NO pixel is
    extra-invalidated — the precision policy's own contract (the variant
    contract corpus pins f32 and does not cover this)."""
    import numpy as np
    from openmvs_tpu.ops import pm_kernel
    import __graft_entry__ as ge

    monkeypatch.setattr(pm_kernel, "INTERPRET", True)
    data, state, opts, v = ge._make_example(h=48, w=128, v=2)
    cd = jnp.tile(state.depth[None], (2, 1, 1)) \
        * jnp.asarray([0.97, 1.03])[:, None, None]
    cn = jnp.tile(state.normal[None], (2, 1, 1, 1))
    den = jnp.einsum("chwk,hwk->chw", cn, data.X0) * cd
    safe = jnp.abs(den) > 1e-12
    inv_nd = jnp.where(safe, 1.0 / jnp.where(safe, den, 1.0), 0.0)
    j = 0
    args = (data.views.image[j], data.views.size[j], data.views.Hl[j],
            data.views.Hm[j], cd, cn, inv_nd, data.X0, data.goff,
            data.w, data.wtm, data.sum_w, data.norm_sq0)
    kw = dict(n_texels=int(data.goff.shape[0]),
              th_robust=float(opts.th_robust))
    monkeypatch.setattr(pm_kernel, "BF16_IMG", False)
    s32 = np.asarray(pm_kernel.score_view_pallas(*args, **kw))
    monkeypatch.setattr(pm_kernel, "BF16_IMG", True)
    s16 = np.asarray(pm_kernel.score_view_pallas(*args, **kw))
    th = float(opts.th_robust)
    d = np.abs(s16 - s32)
    assert d.mean() < 5e-3, d.mean()
    inval32 = s32 == th
    inval16 = s16 == th
    assert (inval16 & ~inval32).mean() < 1e-3


def test_full_run_with_schedule_still_converges(monkeypatch):
    """End-to-end sanity with the production schedule knob: skipping
    quiescent tiles may only cost a little mean confidence."""
    monkeypatch.setenv("OMVS_COMPACT", "1")
    pm, data, state, opts, key, v = _setup()
    s_act = _run(pm, data, state, opts, key, v, [0.0, 0.0, 5e-3])
    s_ref = _run(pm, data, state, opts, key, v, [0.0, 0.0, 0.0])
    va = np.asarray(data.valid)
    ca, cr = np.asarray(s_act.conf)[va], np.asarray(s_ref.conf)[va]
    assert ca.mean() <= cr.mean() + 0.01, (ca.mean(), cr.mean())
