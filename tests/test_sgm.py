"""SGM tests on synthetic rectified pairs with known disparity."""

import numpy as np
import pytest


def _make_pair(H=96, W=160, d0=8.0, slope=0.05, seed=0):
    """Left/right pair generated from a known disparity plane d(x) = d0 + slope*x."""
    import cv2

    rng = np.random.default_rng(seed)
    tex = rng.uniform(0, 1, (H, W + 64)).astype(np.float32)
    tex = cv2.GaussianBlur(tex, (0, 0), 1.2)
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    disp = d0 + slope * xs
    left = tex[:, 32 : 32 + W]
    # R(x) = T(x + 32 + d(x)) => L(x) corresponds to R(x - delta) with the
    # fixed-point delta = d(x - delta), i.e. delta = d(x)/(1 + slope)
    right = cv2.remap(
        tex, (xs + 32 + disp).astype(np.float32), ys.astype(np.float32), cv2.INTER_LINEAR
    )
    delta = disp / (1.0 + slope)
    return left, right, delta


def test_sgm_recovers_plane():
    from openmvs_tpu.ops import sgm

    left, right, gt = _make_pair()
    disp, conf = sgm.match_rectified(left, right, d_min=0, num_d=24)
    valid = np.isfinite(disp)
    valid[:, :16] = False  # occluded/entering band
    err = np.abs(disp - gt)[valid]
    assert valid.mean() > 0.6
    assert np.median(err) < 0.5, np.median(err)


def test_sgm_census_cost():
    from openmvs_tpu.ops import sgm

    left, right, gt = _make_pair(seed=3)
    disp, conf = sgm.match_rectified(left, right, d_min=0, num_d=24,
                                     cost="census", p1=1.0, p2=8.0)
    valid = np.isfinite(disp)
    valid[:, :16] = False
    err = np.abs(disp - gt)[valid]
    assert np.median(err) < 1.0, np.median(err)


def test_dp_pass_monotone():
    """Aggregation must not change the argmin of an unambiguous volume."""
    import jax.numpy as jnp
    from openmvs_tpu.ops import sgm

    H, W, D = 16, 32, 8
    rng = np.random.default_rng(0)
    best = rng.integers(0, D, (H, W))
    cost = np.ones((H, W, D), np.float32)
    cost[np.arange(H)[:, None], np.arange(W)[None, :], best] = 0.0
    # strong unambiguous minimum + zero smoothness pressure
    agg = sgm.aggregate(jnp.asarray(cost * 10), jnp.zeros((H, W)), p1=0.01, p2=0.01)
    idx = np.asarray(jnp.argmin(agg, axis=-1))
    assert (idx == best).mean() > 0.95


def test_rectify_and_depth_roundtrip():
    """Rectify a lateral-motion pair (already rectified): identity-ish maps
    and correct depth recovery from disparity."""
    from openmvs_tpu.ops import sgm
    from openmvs_tpu.geometry.camera import Camera

    H, W = 96, 160
    f = 120.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    camA = Camera(K, np.eye(3), np.zeros(3))
    camB = Camera(K, np.eye(3), np.array([0.5, 0, 0.0]))
    z_true = 6.0
    # synthetic pair from a fronto-parallel plane at z_true
    left, right, gt_disp = _make_pair(H, W, d0=f * 0.5 / z_true, slope=0.0)
    rectA, rectB, info = sgm.rectify_pair(camA, camB, left, right)
    disp, _ = sgm.match_rectified(rectA, rectB, d_min=0, num_d=24)
    z = sgm.disparity_to_depth(disp, info)
    sel = np.isfinite(disp) & (z > 0)
    sel[:, :20] = False
    assert sel.mean() > 0.5
    assert abs(np.median(z[sel]) - z_true) / z_true < 0.05


def _shifted_pair(H=96, W=128, d_true=-6.5, seed=0):
    """Synthetic rectified pair with constant GT disparity d (xB = xA + d)."""
    rng = np.random.default_rng(seed)
    import cv2

    big = cv2.GaussianBlur(rng.uniform(0, 1, (H, W + 64)).astype(np.float32),
                           (0, 0), 1.5)
    x0 = 32
    left = big[:, x0 : x0 + W]
    # right(x) must satisfy right(x + d) == left(x) -> right(x) = big[x0 + x - d]
    M = np.float32([[1, 0, d_true - 0 ], [0, 1, 0]])
    right = cv2.warpAffine(big, np.float32([[1, 0, -(x0 - d_true)], [0, 1, 0]]),
                           (W, H))
    return left, right


def test_wzncc_volume_minimum_at_truth():
    from openmvs_tpu.ops import sgm

    left, right = _shifted_pair(d_true=-6.0)
    vol = np.asarray(sgm.wzncc_cost_volume(left, right, -12, 13))
    best = vol[8:-8, 20:-20].argmin(axis=-1) - 12
    assert np.median(best) == -6


def test_match_pair_tsgm_accuracy():
    """tSGM pyramid recovers a constant sub-pixel disparity within 0.5 px."""
    from openmvs_tpu.ops import sgm

    left, right = _shifted_pair(d_true=-6.5)
    disp, cost = sgm.match_pair_tsgm(left, right, d_lo=-16, d_hi=0,
                                     min_resolution=48)
    core = disp[10:-10, 20:-20]
    ok = np.isfinite(core)
    assert ok.mean() > 0.8
    err = np.abs(core[ok] - (-6.5))
    assert np.median(err) < 0.5, np.median(err)


def test_subpixel_modes():
    from openmvs_tpu.ops import sgm

    # V-shaped costs around the winner: symmetric -> offset 0
    agg = np.zeros((1, 1, 5), np.float32)
    agg[0, 0] = [9, 4, 1, 4, 9]
    for mode in ("linear", "poly4", "parabola", "sine", "cosine", "lc_blend"):
        d = sgm.refine_subpixel(agg, np.array([[2]]), 0, mode)
        assert abs(float(d[0, 0]) - 2.0) < 1e-5, mode
    # asymmetric: left neighbor lower -> negative offset
    agg[0, 0] = [9, 2, 1, 6, 9]
    for mode in ("linear", "parabola", "lc_blend"):
        d = sgm.refine_subpixel(agg, np.array([[2]]), 0, mode)
        assert -0.5 <= float(d[0, 0]) - 2.0 < 0.0, (mode, d)


def test_disparity_range_map():
    from openmvs_tpu.ops import sgm

    prior = np.full((20, 20), 5.0, np.float32)
    prior[5:8, 5:8] = np.nan
    lo, hi = sgm.disparity_range_map(prior, (40, 40))
    # valid areas search a tight window around 2*5
    assert lo[0, 0] <= 10 <= hi[0, 0]
    assert (hi[0, 0] - lo[0, 0]) <= 32
    # invalid areas get a wider window
    assert (hi[12, 12] - lo[12, 12]) >= (hi[0, 0] - lo[0, 0])


def test_fuse_pair_depths_clusters():
    from openmvs_tpu.ops import sgm

    H = W = 4
    mk = lambda z: (np.full((H, W), z, np.float32),
                    np.full((H, W), z - 0.1, np.float32),
                    np.full((H, W), z + 0.1, np.float32),
                    np.full((H, W), 0.5, np.float32))
    # three pairs agree at depth 5, one outlier at 9
    depth, conf = sgm.fuse_pair_depths([mk(5.0), mk(5.05), mk(5.02), mk(9.0)],
                                       min_views=2)
    assert np.allclose(depth, (5.0 + 5.05 + 5.02) / 3, atol=1e-5)
    # outlier cluster of one loses; min_views respected
    depth2, _ = sgm.fuse_pair_depths([mk(5.0), mk(9.0)], min_views=2)
    assert (depth2 == 0).all()


def test_speckle_filter_degenerate_layouts():
    """Regression: cv2.filterSpeckles rejects non-C-contiguous and 0-row
    arrays; _speckle_filter must handle an F-ordered disparity (a zero-copy
    view of a jax result — the real-world trigger on the bundled scene) and
    degenerate empty levels."""
    from openmvs_tpu.ops import sgm

    # F-ordered (transposed) input — the in-situ failure layout
    base = np.full((320, 240), np.nan, np.float32)
    base[:100, :80] = 3.0
    f_ordered = base.T
    assert not f_ordered.flags["C_CONTIGUOUS"]
    out = sgm._speckle_filter(f_ordered)
    assert out.shape == (240, 320)
    assert np.isfinite(out).sum() > 0

    # 0-row / 0-col inputs pass through
    for shape in [(0, 64), (64, 0), (0, 0)]:
        empty = np.full(shape, np.nan, np.float32)
        out = sgm._speckle_filter(empty)
        assert out.shape == shape

    # degenerate rectified pair: match_pair_tsgm returns an empty result
    disp, cost = sgm.match_pair_tsgm(
        np.zeros((0, 64), np.float32), np.zeros((0, 64), np.float32), -16, 0)
    assert disp.shape == (0, 64) and cost.shape == (0, 64)
