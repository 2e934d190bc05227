"""Semi-global matching — TPU-native cost-volume formulation.

Equivalent of the reference's SemiGlobalMatcher (libs/MVS/
SemiGlobalMatcher.{h,cpp}): rectified-pair stereo with WZNCC similarity,
multi-direction dynamic-programming aggregation with intensity-adaptive P2,
left-right consistency cross-check, and sub-pixel refinement.

TPU-native re-design: the reference compresses per-pixel disparity ranges
(PixelData{idx,range}, SemiGlobalMatcher.h:79-88) to fit CPU caches and runs
its own EventThreadPool; here the cost volume is a dense (H, W, D) array — a
static shape XLA tiles onto the VPU — and each DP direction is a `lax.scan`
along the image axis with an (H, D) carry implementing

    L(d) = C(d) + min(Lp(d), Lp(d-1)+P1, Lp(d+1)+P1, min_d Lp + P2) - min_d Lp
    (SemiGlobalMatcher.cpp:499-523)

with P2 scaled by the local intensity gradient (adaptive smoothness,
SemiGlobalMatcher.cpp:987-1043).  Coarse-to-fine range compression (tSGM) is
replaced by a resolution pyramid with a bounded disparity window around the
upsampled coarse disparity — same memory effect, static shapes.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- cost volume
def census_transform(img: jnp.ndarray, window: int = 5) -> jnp.ndarray:
    """Census bit-pattern per pixel, (2*r+1)^2-1 comparisons.

    Returns (H, W, n_words) uint32 — bits beyond 32 (window >= 7: up to 48
    comparisons) spill into additional words; a single-word shift-by->=32
    would silently drop the outer ring."""
    r = window // 2
    H, W = img.shape
    n_cmp = window * window - 1
    n_words = -(-n_cmp // 32)
    pad = jnp.pad(img, r, mode="edge")
    words = [jnp.zeros((H, W), jnp.uint32) for _ in range(n_words)]
    b = 0
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            nb = jax.lax.dynamic_slice(pad, (dy + r, dx + r), (H, W))
            words[b // 32] = words[b // 32] | (
                jnp.uint32(nb < img) << jnp.uint32(b % 32))
            b += 1
    return jnp.stack(words, axis=-1)


def _popcount32(x: jnp.ndarray) -> jnp.ndarray:
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def census_cost_volume(
    left: jnp.ndarray, right: jnp.ndarray, d_min: int, num_d: int, window: int = 5
) -> jnp.ndarray:
    """(H, W, D) hamming-distance cost volume; disparity d maps L(x) -> R(x-d)."""
    cl = census_transform(left, window)
    cr = census_transform(right, window)
    H, W = left.shape
    costs = []
    max_bits = window * window - 1
    for i in range(num_d):
        d = d_min + i
        if d >= 0:
            shifted = jnp.pad(cr, ((0, 0), (d, 0), (0, 0)))[:, :W]
            invalid_col = jnp.arange(W) < d
        else:
            shifted = jnp.pad(cr, ((0, 0), (0, -d), (0, 0)))[:, -d:]
            invalid_col = jnp.arange(W) >= W + d
        c = _popcount32((cl ^ shifted).astype(jnp.uint32)).sum(-1).astype(jnp.float32)
        c = jnp.where(invalid_col[None, :], float(max_bits), c)
        costs.append(c)
    return jnp.stack(costs, axis=-1)


def zncc_cost_volume(
    left: jnp.ndarray, right: jnp.ndarray, d_min: int, num_d: int, half: int = 3
) -> jnp.ndarray:
    """(H, W, D) 1 - ZNCC cost volume with box windows (WZNCC default of the
    reference, SemiGlobalMatcher.h:44-46, with uniform weights)."""
    H, W = left.shape

    def box(x):
        for axis in (0, 1):
            n = x.shape[axis]
            c = jnp.cumsum(x, axis=axis)
            zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=axis))
            S = jnp.concatenate([zero, c], axis=axis)
            hi = np.clip(np.arange(n) + half + 1, 0, n)
            lo = np.clip(np.arange(n) - half, 0, n)
            x = jnp.take(S, hi, axis=axis) - jnp.take(S, lo, axis=axis)
        return x

    n_box = box(jnp.ones_like(left))
    mL = box(left) / n_box
    vL = jnp.maximum(box(left * left) / n_box - mL * mL, 1e-8)
    costs = []
    for i in range(num_d):
        d = d_min + i
        if d >= 0:
            sh = jnp.pad(right, ((0, 0), (d, 0)))[:, :W]
            invalid = jnp.arange(W) < d
        else:
            sh = jnp.pad(right, ((0, 0), (0, -d)))[:, -d:]
            invalid = jnp.arange(W) >= W + d
        mR = box(sh) / n_box
        vR = jnp.maximum(box(sh * sh) / n_box - mR * mR, 1e-8)
        cov = box(left * sh) / n_box - mL * mR
        ncc = jnp.clip(cov * jax.lax.rsqrt(vL * vR), -1.0, 1.0)
        c = 1.0 - ncc
        costs.append(jnp.where(invalid[None, :], 2.0, c))
    return jnp.stack(costs, axis=-1)


# ------------------------------------------------------------- DP aggregation
def _dp_pass(cost: jnp.ndarray, grad: jnp.ndarray, p1: float, p2: float,
             alpha: float, axis: int, reverse: bool,
             beta: float = 0.1) -> jnp.ndarray:
    """One directional aggregation along `axis` (0=vertical, 1=horizontal).

    cost: (H, W, D); grad: (H, W) intensity gradient along the direction;
    P2_eff = p2 * (1 + alpha * exp(-grad^2 / (2 beta^2)))  — larger penalty in
    homogeneous areas (SemiGlobalMatcher.cpp:518-523).
    """
    D = cost.shape[-1]
    p2_eff = p2 * (1.0 + alpha * jnp.exp(-(grad * grad) / (2 * beta * beta)))

    xs = jnp.moveaxis(cost, axis, 0)          # (N, M, D)
    p2s = jnp.moveaxis(p2_eff, axis, 0)       # (N, M)
    if reverse:
        xs = xs[::-1]
        p2s = p2s[::-1]

    big = jnp.float32(1e9)

    def step(carry, x):
        Lp = carry                             # (M, D)
        c, p2row = x
        minLp = jnp.min(Lp, axis=-1, keepdims=True)
        shift_m = jnp.concatenate([jnp.full_like(Lp[:, :1], big), Lp[:, :-1]], axis=-1)
        shift_p = jnp.concatenate([Lp[:, 1:], jnp.full_like(Lp[:, :1], big)], axis=-1)
        best = jnp.minimum(
            jnp.minimum(Lp, minLp + p2row[:, None]),
            jnp.minimum(shift_m + p1, shift_p + p1),
        )
        L = c + best - minLp
        return L, L

    init = xs[0]
    _, out = jax.lax.scan(step, init, (xs[1:], p2s[1:]))
    out = jnp.concatenate([init[None], out], axis=0)
    if reverse:
        out = out[::-1]
    return jnp.moveaxis(out, 0, axis)


@functools.partial(jax.jit, static_argnames=("p1", "p2", "alpha", "num_dirs"))
def aggregate(cost: jnp.ndarray, image: jnp.ndarray, p1: float = 1.0,
              p2: float = 8.0, alpha: float = 2.0, num_dirs: int = 4) -> jnp.ndarray:
    """Sum of directional DP passes (4 axis-aligned directions; the
    reference's default is 4, optionally 8 with diagonals)."""
    gy, gx = jnp.gradient(image)
    total = _dp_pass(cost, jnp.abs(gx), p1, p2, alpha, axis=1, reverse=False)
    total = total + _dp_pass(cost, jnp.abs(gx), p1, p2, alpha, axis=1, reverse=True)
    total = total + _dp_pass(cost, jnp.abs(gy), p1, p2, alpha, axis=0, reverse=False)
    total = total + _dp_pass(cost, jnp.abs(gy), p1, p2, alpha, axis=0, reverse=True)
    return total


# --------------------------------------------------------------- extraction
def extract_disparity(agg: jnp.ndarray, d_min: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Winner-take-all + parabola sub-pixel (SemiGlobalMatcher.h:111-119)."""
    D = agg.shape[-1]
    idx = jnp.argmin(agg, axis=-1)
    c0 = jnp.take_along_axis(agg, idx[..., None], axis=-1)[..., 0]
    im = jnp.clip(idx - 1, 0, D - 1)
    ip = jnp.clip(idx + 1, 0, D - 1)
    cm = jnp.take_along_axis(agg, im[..., None], axis=-1)[..., 0]
    cp = jnp.take_along_axis(agg, ip[..., None], axis=-1)[..., 0]
    denom = cm + cp - 2 * c0
    frac = jnp.where(denom > 1e-6, 0.5 * (cm - cp) / jnp.maximum(denom, 1e-6), 0.0)
    frac = jnp.clip(frac, -0.5, 0.5)
    disp = idx.astype(jnp.float32) + frac + d_min
    conf = jnp.maximum(jnp.minimum(cm, cp) - c0, 0.0)  # margin-style confidence
    return disp, conf


def lr_consistency(disp_l: jnp.ndarray, disp_r: jnp.ndarray, max_diff: float = 1.0):
    """Cross-check: |dL(x) + dR(x - dL(x))| <= max_diff
    (SemiGlobalMatcher.h:175; the right-view disparity is negated by
    convention, so agreement means dL + dR ~ 0)."""
    H, W = disp_l.shape
    xs = jnp.arange(W)[None, :].astype(jnp.float32) - disp_l
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, W - 1)
    dr = jnp.take_along_axis(disp_r, xi, axis=1)
    ok = jnp.abs(disp_l + dr) <= max_diff
    ok = ok & (xs >= 0) & (xs <= W - 1)
    return jnp.where(ok, disp_l, jnp.nan)


def match_rectified(
    left: jnp.ndarray, right: jnp.ndarray,
    d_min: int, num_d: int,
    p1: float = 0.1, p2: float = 0.8, alpha: float = 2.0,
    cost: str = "zncc", cross_check: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full SGM on a rectified pair: returns (disparity with NaN invalid,
    confidence)."""
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    vol = (zncc_cost_volume if cost == "zncc" else census_cost_volume)(
        left, right, d_min, num_d
    )
    agg = aggregate(vol, left, p1=p1, p2=p2, alpha=alpha)
    disp_l, conf = extract_disparity(agg, d_min)
    if not cross_check:
        return np.asarray(disp_l), np.asarray(conf)
    # right-image disparity: match right against left with mirrored range
    vol_r = (zncc_cost_volume if cost == "zncc" else census_cost_volume)(
        right, left, -(d_min + num_d - 1), num_d
    )
    agg_r = aggregate(vol_r, right, p1=p1, p2=p2, alpha=alpha)
    disp_r, _ = extract_disparity(agg_r, -(d_min + num_d - 1))
    out = lr_consistency(disp_l, disp_r)
    return np.asarray(out), np.asarray(conf)


# ----------------------------------------------------- rectification helpers
def rectify_pair(camA, camB, grayA: np.ndarray, grayB: np.ndarray):
    """Fusiello-style rectification of an arbitrary calibrated pair
    (Image::StereoRectify role, libs/MVS/Image.h:94-101).

    Returns (rectA, rectB, Q-like info dict) where correspondence is a pure
    horizontal shift: the new camera shares a rotation whose x-axis is the
    baseline.
    """
    import cv2

    C1, C2 = camA.C, camB.C
    baseline = C2 - C1
    b = np.linalg.norm(baseline)
    if b < 1e-12:
        raise ValueError("degenerate baseline")
    vx = baseline / b
    oz = camA.R[2]
    vy = np.cross(oz, vx)
    vy /= np.linalg.norm(vy)
    vz = np.cross(vx, vy)
    Rn = np.stack([vx, vy, vz])          # new rotation (both cameras)
    Kn = (camA.K + camB.K) / 2
    Kn[0, 1] = 0
    H, W = grayA.shape
    TA = Kn @ Rn @ camA.R.T @ np.linalg.inv(camA.K)
    TB = Kn @ Rn @ camB.R.T @ np.linalg.inv(camB.K)
    rectA = cv2.warpPerspective(grayA, TA.astype(np.float64), (W, H))
    rectB = cv2.warpPerspective(grayB, TB.astype(np.float64), (W, H))
    info = {"Rn": Rn, "Kn": Kn, "baseline": b, "TA": TA, "TB": TB,
            "C1": camA.C}
    return rectA, rectB, info


def disparity_to_depth(disp: np.ndarray, info: dict) -> np.ndarray:
    """depth (in the rectified frame) = f * b / disparity."""
    f = info["Kn"][0, 0]
    b = info["baseline"]
    with np.errstate(divide="ignore", invalid="ignore"):
        z = f * b / disp
    z[~np.isfinite(z)] = 0
    z[z < 0] = 0
    return z


# ===================================================================
# tSGM parity extension (round 2)
#
# The reference compresses per-pixel disparity ranges into ragged
# arrays (PixelData{idx,range}, SemiGlobalMatcher.h:79-88) to bound
# CPU cache misses; the TPU-native analogue keeps a DENSE (H, W, D)
# volume over the level's global range and MASKS costs outside each
# pixel's [lo, hi) window to the invalid cost (255) — identical
# search-restriction semantics with static shapes (the memory the
# reference saves is cheap on HBM; the SEARCH restriction is what
# drives tSGM's quality/speed).
# ===================================================================

CMAX = np.uint8(255)          # invalid / worst cost (SemiGlobalMatcher.cpp)


def wzncc_weights(gray: jnp.ndarray, half_x: int = 3, half_y: int = 3):
    """Per-pixel bilateral patch weights for WZNCC (7x7 window), matching
    the reference's WeightedPatch precompute (SemiGlobalMatcher.cpp:900-947):
      weight = exp(colorDelta^2 * sigmaColor + spatialDist^2 * sigmaSpatial)
      sigmaColor = -1/(2 (0.3)^2) on [0,1] intensities (the reference uses
      the L1-squared COLOR distance at 255 scale; gray at unit scale is the
      single-channel equivalent), sigmaSpatial = -1/(2 (0.4*7)^2).

    Returns (w, tw, sum_w, norm_sq0) with w/tw stacked (T, H, W)."""
    offs = [(dy, dx) for dy in range(-half_y, half_y + 1)
            for dx in range(-half_x, half_x + 1)]
    sigma_color = -1.0 / (2.0 * 0.3 ** 2)
    wsz = 2 * max(half_x, half_y) + 1
    sigma_spatial = -1.0 / (2.0 * (0.4 * wsz) ** 2)
    H, W = gray.shape
    pad = max(half_x, half_y)
    gp = jnp.pad(gray, pad, mode="edge")
    texels = jnp.stack([
        jax.lax.dynamic_slice(gp, (dy + pad, dx + pad), (H, W))
        for dy, dx in offs
    ])
    dcol = texels - gray[None]
    dsp = jnp.asarray([float(dy * dy + dx * dx) for dy, dx in offs])
    w = jnp.exp(dcol * dcol * sigma_color + dsp[:, None, None] * sigma_spatial)
    sum_w = jnp.sum(w, axis=0)
    tm = jnp.sum(w * texels, axis=0) / sum_w
    t_centered = texels - tm[None]
    tw = w * t_centered
    norm_sq0 = jnp.sum(tw * t_centered, axis=0)
    return w, tw, sum_w, norm_sq0


@functools.partial(jax.jit, static_argnames=("num_d", "half_x", "half_y"))
def _wzncc_volume0(
    left: jnp.ndarray, right_shifted: jnp.ndarray, d_min: jnp.ndarray,
    num_d: int, half_x: int = 3, half_y: int = 3,
) -> jnp.ndarray:
    """wzncc_cost_volume body at a FIXED d_min=0 slice layout: the caller
    pre-shifts `right` by d_min columns, so the compile cache key depends
    only on shape and num_d (a static d_min recompiled the whole volume
    graph for every stereo pair's seeded range).  d_min rides along as a
    traced scalar purely for the out-of-image column test."""
    H, W = left.shape
    eps = 1e-3
    w, tw, sum_w, norm_sq0 = wzncc_weights(left, half_x, half_y)
    offs = [(dy, dx) for dy in range(-half_y, half_y + 1)
            for dx in range(-half_x, half_x + 1)]
    pad = max(half_x, half_y)

    # right texel stacks shifted per disparity: pad right along x by the
    # disparity range so each d is a pure static slice
    lo_pad = num_d - 1 + half_x + pad
    hi_pad = half_x + pad
    rp = jnp.pad(right_shifted, ((pad, pad), (hi_pad, lo_pad)))

    def cost_at(i):
        texr = jnp.stack([
            jax.lax.dynamic_slice(
                rp, (dy + pad, dx + i + hi_pad), (H, W))
            for dy, dx in offs
        ])
        s = jnp.sum(w * texr, axis=0)
        sq = jnp.sum(w * texr * texr, axis=0)
        nom = jnp.sum(tw * texr, axis=0)
        norm_sq1 = sq - s * s / sum_w
        ncc = nom * jax.lax.rsqrt(jnp.maximum(norm_sq0 * norm_sq1 + eps, 1e-12))
        c = jnp.where(ncc <= 0, 255.0,
                      jnp.round((1.0 - jnp.minimum(ncc, 1.0)) * 255.0))
        # out-of-image columns invalid (original right-image coordinates)
        xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) + i + d_min
        c = jnp.where((xs < 0) | (xs >= W), 255.0, c)
        return c.astype(jnp.uint8)

    vol = jnp.stack([cost_at(i) for i in range(num_d)], axis=-1)
    return vol


def wzncc_cost_volume(
    left, right, d_min: int, num_d: int, half_x: int = 3, half_y: int = 3,
) -> jnp.ndarray:
    """(H, W, D) uint8 bilateral-weighted ZNCC costs
    (SemiGlobalMatcher.cpp:948-975): cost = 255 for ncc <= 0 or
    out-of-image, else round((1 - min(ncc,1)) * 255)."""
    r = np.asarray(right, np.float32)
    W = r.shape[1]
    shifted = np.zeros_like(r)
    if d_min >= 0:
        if d_min < W:
            shifted[:, :W - d_min] = r[:, d_min:]
    else:
        if -d_min < W:
            shifted[:, -d_min:] = r[:, :W + d_min]
    return _wzncc_volume0(jnp.asarray(left), jnp.asarray(shifted),
                          jnp.int32(d_min), num_d, half_x, half_y)


def disparity_range_map(prior_disp: np.ndarray, out_shape,
                        min_num_disp: int = 3, min_num_disp_invalid: int = 16,
                        max_valid: int = 32, max_invalid: int = 64,
                        global_range=None):
    """Per-pixel disparity search windows from the previous (half-res)
    level's disparity (Disparity2RangeMap, SemiGlobalMatcher.cpp:1350-1445).

    prior_disp: (h, w) float with NaN invalid, at HALF the target
    resolution; returns (lo, hi) int16 maps at out_shape with disparities
    DOUBLED.  Valid pixels search min/max of a 7x7 window (span capped at
    max_valid); invalid pixels a 41x41 window (capped at max_invalid);
    windows with <3 samples fall back to +-min_num_disp_invalid (or the
    provided global_range)."""
    from scipy import ndimage

    d = np.asarray(prior_disp, np.float32)
    valid = np.isfinite(d)
    dfill_min = np.where(valid, d, np.inf)
    dfill_max = np.where(valid, d, -np.inf)

    def window_stats(size):
        mn = ndimage.minimum_filter(dfill_min, size=size, mode="nearest")
        mx = ndimage.maximum_filter(dfill_max, size=size, mode="nearest")
        cnt = ndimage.uniform_filter(valid.astype(np.float32), size=size,
                                     mode="nearest") * size * size
        return mn, mx, cnt

    mn7, mx7, c7 = window_stats(7)
    mn41, mx41, c41 = window_stats(41)
    # median approximated by the window midpoint (the reference takes the
    # exact median of the collected samples; the midpoint keeps the same
    # center-of-window semantics with separable filters)
    mn = np.where(valid, mn7, mn41)
    mx = np.where(valid, mx7, mx41)
    cnt = np.where(valid, c7, c41)
    cap = np.where(valid, max_valid, max_invalid).astype(np.int32)

    with np.errstate(invalid="ignore"):
        # empty windows are (+inf, -inf): their NaN center/span are masked
        # by `ok` below — silence the expected invalid-add warning
        center = (mn + mx)  # = median*2 in doubled units
        span = (mx - mn) * 2.0
    ok = np.isfinite(mn) & np.isfinite(mx) & (cnt >= 3)
    num = np.clip(span, min_num_disp, cap)
    lo = np.where(ok, center - num / 2, 0).astype(np.float32)
    hi = np.where(ok, center + (num + 1) / 2, 0).astype(np.float32)
    if global_range is None:
        g_lo, g_hi = -min_num_disp_invalid, min_num_disp_invalid
    else:
        g_lo, g_hi = global_range
    lo = np.where(ok, lo, g_lo)
    hi = np.where(ok, hi, g_hi)

    # upscale 2x to the target level
    H, W = out_shape
    lo2 = np.repeat(np.repeat(lo, 2, 0), 2, 1)[:H, :W]
    hi2 = np.repeat(np.repeat(hi, 2, 0), 2, 1)[:H, :W]
    if lo2.shape != (H, W):
        lo2 = np.pad(lo2, ((0, H - lo2.shape[0]), (0, W - lo2.shape[1])),
                     mode="edge")
        hi2 = np.pad(hi2, ((0, H - hi2.shape[0]), (0, W - hi2.shape[1])),
                     mode="edge")
    return lo2.astype(np.int16), hi2.astype(np.int16)


@jax.jit
def mask_volume(vol: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                d_min) -> jnp.ndarray:
    """Set costs outside each pixel's [lo, hi) window to CMAX — the dense
    equivalent of the reference's compressed per-pixel ranges.  d_min is
    traced (a static value would recompile per stereo pair)."""
    D = vol.shape[-1]
    ds = jnp.arange(D, dtype=jnp.int32) + jnp.int32(d_min)
    inwin = (ds[None, None, :] >= lo[..., None].astype(jnp.int32)) & (
        ds[None, None, :] < hi[..., None].astype(jnp.int32))
    return jnp.where(inwin, vol, jnp.uint8(255))


def _dp_pass_diag(cost, grad, p1, p2, alpha, dx: int, reverse: bool,
                  beta: float = 38.0 / 255.0):
    """Diagonal DP pass: scan over rows with the carry shifted one column
    per step (direction (dy=1, dx) forward, reversed for the opposite)."""
    p2_eff = p2 * (1.0 + alpha * jnp.exp(-(grad * grad) / (2 * beta * beta)))
    xs = cost
    p2s = p2_eff
    if reverse:
        xs = xs[::-1]
        p2s = p2s[::-1]
    big = jnp.float32(1e9)

    def shift_cols(L, s):
        if s == 0:
            return L
        if s > 0:
            return jnp.concatenate(
                [jnp.full_like(L[:s], big), L[:-s]], axis=0)
        return jnp.concatenate([L[-s:], jnp.full_like(L[:(-s)], big)], axis=0)

    def step(carry, x):
        Lp = shift_cols(carry, dx)             # (W, D) carry moved diagonally
        c, p2row = x
        minLp = jnp.min(Lp, axis=-1, keepdims=True)
        shift_m = jnp.concatenate([jnp.full_like(Lp[:, :1], big), Lp[:, :-1]], axis=-1)
        shift_p = jnp.concatenate([Lp[:, 1:], jnp.full_like(Lp[:, :1], big)], axis=-1)
        best = jnp.minimum(
            jnp.minimum(Lp, minLp + p2row[:, None]),
            jnp.minimum(shift_m + p1, shift_p + p1),
        )
        L = c + best - jnp.minimum(minLp, big * 0.5)
        L = jnp.minimum(L, big)
        return L, L

    init = xs[0]
    _, out = jax.lax.scan(step, init, (xs[1:], p2s[1:]))
    out = jnp.concatenate([init[None], out], axis=0)
    if reverse:
        out = out[::-1]
    return out


@functools.partial(jax.jit, static_argnames=("p1", "p2", "alpha", "num_dirs", "beta"))
def aggregate8(cost_u8: jnp.ndarray, image: jnp.ndarray, p1: float = 3.0,
               p2: float = 4.0, alpha: float = 14.0,
               num_dirs: int = 8, beta: float = 38.0 / 255.0) -> jnp.ndarray:
    """Sum of directional passes on a uint8 cost volume: 4 axis-aligned +
    (num_dirs == 8) 4 diagonals (the reference's numDirs=4 runs each of its
    4 directions forward AND backward = 8 passes,
    SemiGlobalMatcher.cpp:1203-1265)."""
    cost = cost_u8.astype(jnp.float32)
    gy, gx = jnp.gradient(image)
    total = _dp_pass(cost, jnp.abs(gx), p1, p2, alpha, 1, False, beta)
    total = total + _dp_pass(cost, jnp.abs(gx), p1, p2, alpha, 1, True, beta)
    total = total + _dp_pass(cost, jnp.abs(gy), p1, p2, alpha, 0, False, beta)
    total = total + _dp_pass(cost, jnp.abs(gy), p1, p2, alpha, 0, True, beta)
    if num_dirs >= 8:
        gd = 0.5 * (jnp.abs(gx) + jnp.abs(gy))
        for dx in (1, -1):
            total = total + _dp_pass_diag(cost, gd, p1, p2, alpha, dx, False, beta)
            total = total + _dp_pass_diag(cost, gd, p1, p2, alpha, dx, True, beta)
    return total


# ------------------------------------------------------------- sub-pixel
def _fit_linear(x):
    return x / 2.0


def _fit_poly4(x):
    return (x ** 4 + x) / 4.0


def _fit_parabola(x):
    return x / (x + 1.0)


def _fit_sine(x):
    return 0.5 * (np.sin((x - 1.0) * (np.pi / 2)) + 1.0)


def _fit_cosine(x):
    return 1.0 - np.cos(x * (np.pi / 3.0))


def _fit_lc_blend(x):
    factor = 1.195 - np.cos(x * (np.pi / 2.3))
    return _fit_cosine(x) * factor + _fit_linear(x) * (1.0 - factor)


_SUBPIXEL_FITS = {
    "linear": _fit_linear,
    "poly4": _fit_poly4,
    "parabola": _fit_parabola,
    "sine": _fit_sine,
    "cosine": _fit_cosine,
    "lc_blend": _fit_lc_blend,
}


def refine_subpixel(agg: np.ndarray, disp_int: np.ndarray, d_min: int,
                    mode: str = "lc_blend") -> np.ndarray:
    """Sub-pixel offset from the three accumulated costs around the winner
    (RefineDisparityMap, SemiGlobalMatcher.cpp:1693-1800): pick the
    interpolation direction from the smaller neighbor delta, map the delta
    ratio x through the chosen fit, offset = (fit(x) - 0.5) * sign."""
    if mode in ("na", None):
        return disp_int.astype(np.float32)
    fit = _SUBPIXEL_FITS[mode]
    D = agg.shape[-1]
    idx = np.clip((disp_int - d_min).astype(np.int64), 0, D - 1)
    take = lambda i: np.take_along_axis(agg, i[..., None], axis=-1)[..., 0]
    c0 = take(idx)
    cm = take(np.clip(idx - 1, 0, D - 1))
    cp = take(np.clip(idx + 1, 0, D - 1))
    ld = cm - c0
    rd = cp - c0
    with np.errstate(divide="ignore", invalid="ignore"):
        x_r = np.where(rd > 0, ld / np.maximum(rd, 1e-12), 0.0)
        x_l = np.where(ld > 0, rd / np.maximum(ld, 1e-12), 0.0)
    use_r = ld < rd
    x = np.clip(np.where(use_r, x_r, x_l), 0.0, 1.0)
    val = fit(x)
    off = (val - 0.5) * np.where(use_r, 1.0, -1.0)
    # two-value edge cases (semisubpixel): prev==center or center==next
    off = np.where((cm == c0) & (cp != c0), 0.5 * (c0 / np.maximum(cp, 1e-12)), off)
    off = np.where((cp == c0) & (cm != c0), -0.5 * (c0 / np.maximum(cm, 1e-12)), off)
    off = np.where((cm == c0) & (cp == c0), 0.0, off)
    return disp_int.astype(np.float32) + np.clip(off, -0.5, 0.5)


# ------------------------------------------------------- tSGM pair pipeline
def _flip_disparity(disp: np.ndarray) -> np.ndarray:
    """Left-reference disparity -> right-reference prior (FlipDirection,
    SemiGlobalMatcher.cpp: dR(x + dL) = -dL), NaN where nothing lands."""
    H, W = disp.shape
    out = np.full((H, W), np.nan, np.float32)
    ys, xs = np.nonzero(np.isfinite(disp))
    d = disp[ys, xs]
    xr = np.round(xs + d).astype(np.int64)
    ok = (xr >= 0) & (xr < W)
    out[ys[ok], xr[ok]] = -d[ok]
    return out


def _speckle_filter(disp: np.ndarray, max_size: int = 100,
                    max_diff: float = 5.0) -> np.ndarray:
    """cv2.filterSpeckles on a float disparity with NaN invalid.

    cv2 rejects non-C-contiguous output arrays ("layout incompatible") —
    np.asarray of a jax result can be a zero-copy F-ordered view whose
    order survives astype(order='K'), so force C order; degenerate 0-row/
    0-col levels (possible for extreme rectifications) are passed through
    unfiltered for the same reason."""
    import cv2

    if disp.shape[0] == 0 or disp.shape[1] == 0:
        return disp.astype(np.float32)
    d16 = np.ascontiguousarray(
        np.where(np.isfinite(disp), disp * 16.0, -32768).astype(np.int16))
    cv2.filterSpeckles(d16, -32768, max_size, int(max_diff * 16))
    out = d16.astype(np.float32) / 16.0
    out[d16 == -32768] = np.nan
    return out


def match_pair_tsgm(
    rectA: np.ndarray, rectB: np.ndarray,
    d_lo: int, d_hi: int,
    p1: float = 3.0, p2: float = 4.0, alpha: float = 14.0,
    beta: float = 38.0 / 255.0,
    min_resolution: int = 320,
    subpixel_mode: str = "lc_blend",
    num_dirs: int = 8,
    max_num_d: int = 256,
):
    """Coarse-to-fine tSGM on a rectified pair (SemiGlobalMatcher::Match,
    SemiGlobalMatcher.cpp:530-737): per-pixel disparity windows from the
    previous level restrict the search (range masking == the reference's
    range compression), both directions matched, cross-checked each level,
    speckle-filtered at the coarsest, sub-pixel refined at the finest.

    d_lo/d_hi: full-resolution global disparity bounds (e.g. from sparse
    matches).  Returns (disparity float32 with NaN invalid, accumulated
    winner cost float32)."""
    import cv2

    H, W = rectA.shape
    if H == 0 or W == 0:
        # degenerate rectified pair (extreme geometry can collapse a level):
        # nothing to match — the caller's cluster fusion drops empty maps
        return (np.full((H, W), np.nan, np.float32),
                np.zeros((H, W), np.float32))
    # pyramid scales: the coarsest level sits at 1/max(2, 2^l) with l from
    # computeMaxResolution(max_dim, 8, min_resolution) — i.e. tSGM ALWAYS
    # runs at least one half-resolution level (SemiGlobalMatcher.cpp:585-591:
    # scale = 1/MAXF(2, POWI(2, resolutionLevel))), which is what activates
    # the per-pixel range maps; a plain "halve while >= min_resolution" rule
    # silently degraded small images to single-level full-range SGM
    lvl = 0
    while (max(H, W) >> (lvl + 1)) >= min_resolution and lvl < 8:
        lvl += 1
    lvl = max(lvl, 1 if min(H, W) >= 32 else 0)
    scales = [1.0 / (1 << (lvl - i)) for i in range(lvl)] + [1.0]
    tsgm = len(scales) > 1
    debug = os.environ.get("OMVS_SGM_DEBUG") == "1"

    disp = None
    cost_map = None
    first_up = True
    for li, s in enumerate(scales):
        hs, ws = max(1, round(H * s)), max(1, round(W * s))
        A = cv2.resize(rectA, (ws, hs), interpolation=cv2.INTER_AREA) if s != 1 else rectA
        B = cv2.resize(rectB, (ws, hs), interpolation=cv2.INTER_AREA) if s != 1 else rectB
        glo, ghi = int(np.floor(d_lo * s)) - 8, int(np.ceil(d_hi * s)) + 8
        if disp is None:
            lo = np.full((hs, ws), glo, np.int16)
            hi = np.full((hs, ws), ghi, np.int16)
            loR = np.full((hs, ws), -ghi, np.int16)
            hiR = np.full((hs, ws), -glo, np.int16)
        else:
            mnd, mnd_i = (11, 33) if first_up else (5, 7)
            was_first_up = first_up
            first_up = False
            # fallback window for pixels with <3 neighborhood samples: a
            # min_num_disp_invalid-wide band at the GLOBAL MIDPOINT — the
            # role of the reference's +-minNumDispInvalid around 0
            # (SemiGlobalMatcher.cpp:1387-1390; its rectification centers
            # disparity near 0, ours does not), NOT the whole global range:
            # feeding (glo, ghi) into the fallback forced every level's
            # volume to the full global span and quadrupled num_d on
            # occlusion-heavy scenes (compile churn + wasted DP)
            mid = (glo + ghi) // 2
            fb = (max(glo, mid - mnd_i), min(ghi, mid + mnd_i))
            if was_first_up and os.environ.get("OMVS_SGM_FB") == "full":
                # completeness experiment (r5): pixels invalidated at the
                # coarsest level get ONE full-range chance at the first
                # upsample — the narrow midpoint band permanently loses
                # surfaces whose disparity sits outside it (occlusions,
                # disparity ranges not centered on the midpoint)
                fb = (glo, ghi)
            lo, hi = disparity_range_map(disp, (hs, ws), mnd, mnd_i,
                                         global_range=fb)
            dR = _flip_disparity(disp)
            loR, hiR = disparity_range_map(dR, (hs, ws), mnd, mnd_i,
                                           global_range=(-fb[1], -fb[0]))
        # level-global bounds HUG the per-pixel windows (level 0 covers the
        # global sparse-seed range by construction; finer levels only need
        # the union of per-pixel ranges — the tSGM compression effect)
        l_min = int(lo.min())
        l_max = int(hi.max())
        span = l_max - l_min
        if span > max_num_d:
            # the volume cannot cover the whole span: place the coverage
            # window where it keeps the most per-pixel ranges alive instead
            # of silently truncating the high (far-field) end
            cand = np.unique(np.linspace(
                l_min, l_max - max_num_d, 17).astype(int))
            covered = [int(((lo >= c) & (hi <= c + max_num_d)).sum())
                       for c in cand]
            l_min = int(cand[int(np.argmax(covered))])
            n_lost = lo.size - max(covered)
            if n_lost:
                from openmvs_tpu.utils.log import get_logger
                get_logger("sgm").warning(
                    "disparity span %d > max_num_d %d at level %d: "
                    "%d/%d pixels' ranges fall outside the coverage window",
                    span, max_num_d, li, n_lost, lo.size)
        num_d = min(l_max - l_min, max_num_d)
        if num_d <= 1:
            num_d = 2
        # bucket the volume depth to a SHORT ladder: every distinct num_d
        # recompiles the cost + 8-direction DP graphs (~30 s each on the
        # chip), and occlusion-heavy scenes hit 4+ multiple-of-16 buckets
        # (measured: the steps-scene "4x wall cliff" was compile churn).
        # The <=2x volume waste of a coarse ladder is cheaper than one
        # extra compile at every size it avoids.
        ladder = [int(x) for x in os.environ.get(
            "OMVS_SGM_ND_LADDER", "16,32,64,128,192,256").split(",")]
        num_d = min(next((b for b in ladder if b >= num_d), ladder[-1]),
                    max_num_d)

        if debug:
            t_lv = time.time()
        volL = mask_volume(
            wzncc_cost_volume(A, B, l_min, num_d),
            jnp.asarray(lo), jnp.asarray(hi), l_min)
        aggL = aggregate8(volL, jnp.asarray(A), p1, p2, alpha, num_dirs, beta)
        dintL = np.asarray(jnp.argmin(aggL, axis=-1)).astype(np.int32) + l_min
        costL = np.asarray(jnp.min(aggL, axis=-1))

        r_min = -(l_min + num_d - 1)
        volR = mask_volume(
            wzncc_cost_volume(B, A, r_min, num_d),
            jnp.asarray(loR), jnp.asarray(hiR), r_min)
        aggR = aggregate8(volR, jnp.asarray(B), p1, p2, alpha, num_dirs, beta)
        dintR = np.asarray(jnp.argmin(aggR, axis=-1)).astype(np.int32) + r_min

        if li == len(scales) - 1:
            dsub = refine_subpixel(np.asarray(aggL), dintL, l_min, subpixel_mode)
        else:
            dsub = dintL.astype(np.float32)
        # cross-check |dL(x) + dR(x + dL)| <= 1
        xs = np.arange(ws)[None, :] + dintL
        xi = np.clip(xs, 0, ws - 1)
        dr = np.take_along_axis(dintR, xi, axis=1)
        ok = (np.abs(dintL + dr) <= 1) & (xs >= 0) & (xs < ws)
        disp = np.where(ok, dsub, np.nan).astype(np.float32)
        if li == 0 and tsgm:
            disp = _speckle_filter(disp)
        cost_map = costL
        if debug:
            print(f"SGM_DEBUG level={li} hw=({hs},{ws}) num_d={num_d} "
                  f"lmin={l_min} lmax={l_max} span={span} "
                  f"glob=({glo},{ghi}) "
                  f"valid={np.isfinite(disp).mean():.3f} "
                  f"wall={time.time()-t_lv:.2f}s", flush=True)
    return disp, cost_map


def project_disparity_to_depth(
    disp: np.ndarray, cost: np.ndarray, info: dict, cam_ref,
    out_shape, subpixel_steps: float = 4.0,
):
    """Rectified disparity -> depth/conf/trust-range maps in the ORIGINAL
    reference camera (ProjectDisparity2DepthMap,
    SemiGlobalMatcher.cpp:1570-1650).

    Returns (depth, range_lo, range_hi, conf) at out_shape; 0 = invalid."""
    Kn, Rn, b = info["Kn"], info["Rn"], info["baseline"]
    f = Kn[0, 0]
    H, W = disp.shape
    ys, xs = np.nonzero(np.isfinite(disp) & (disp < -1e-3))
    out_d = np.zeros(out_shape, np.float32)
    out_lo = np.zeros(out_shape, np.float32)
    out_hi = np.zeros(out_shape, np.float32)
    out_c = np.zeros(out_shape, np.float32)
    if len(ys) == 0:
        return out_d, out_lo, out_hi, out_c
    d = disp[ys, xs].astype(np.float64)
    # z in the rectified frame: uA - uB = f b / z and d = uB - uA => z = -f b / d
    z = -f * b / d
    dd = 0.5 / subpixel_steps
    z_hi = -f * b / np.minimum(d + dd, -1e-6)
    z_lo = -f * b / (d - dd)
    good = (z > 0) & np.isfinite(z)
    ys, xs, d, z, z_lo, z_hi = ys[good], xs[good], d[good], z[good], z_lo[good], z_hi[good]
    uv1 = np.stack([xs, ys, np.ones_like(xs)], axis=0).astype(np.float64)
    Xc_rect = np.linalg.inv(Kn) @ uv1 * z
    C1 = info.get("C1")
    Xw = (Rn.T @ Xc_rect).T + C1
    # project into the original reference camera
    Xc = (cam_ref.R @ (Xw - cam_ref.C).T)
    zr = Xc[2]
    front = zr > 0
    u = cam_ref.K[0, 0] * Xc[0] / zr + cam_ref.K[0, 2] + cam_ref.K[0, 1] * Xc[1] / zr
    v = cam_ref.K[1, 1] * Xc[1] / zr + cam_ref.K[1, 2]
    ui = np.round(u).astype(np.int64)
    vi = np.round(v).astype(np.int64)
    Ho, Wo = out_shape
    ok = front & (ui >= 0) & (ui < Wo) & (vi >= 0) & (vi < Ho)
    ui, vi, zr = ui[ok], vi[ok], zr[ok]
    scale = zr / z[ok]           # rectified-z -> reference-z scale per point
    c = 1.0 / (1.0 + cost[ys[ok], xs[ok]] / 255.0)
    # z-buffer scatter: nearest depth wins
    lin = vi * Wo + ui
    order = np.argsort(zr, kind="stable")[::-1]    # far first, near overwrites
    out_d.reshape(-1)[lin[order]] = zr[order]
    out_lo.reshape(-1)[lin[order]] = (z_lo[ok] * scale)[order]
    out_hi.reshape(-1)[lin[order]] = (z_hi[ok] * scale)[order]
    out_c.reshape(-1)[lin[order]] = c[order]
    return out_d, out_lo, out_hi, out_c


def fuse_pair_depths(pair_maps, min_views: int):
    """Cluster-based per-pixel fusion across pair depth maps
    (SemiGlobalMatcher::Fuse, SemiGlobalMatcher.cpp:795-850): a pixel's
    depth = the average of the LARGEST cluster of pairwise depths whose
    trust regions overlap; clusters below min_views are dropped.

    pair_maps: list of (depth, lo, hi, conf) tuples at a common shape."""
    P = len(pair_maps)
    if P == 0:
        return None, None
    D = np.stack([m[0] for m in pair_maps])      # (P, H, W)
    LO = np.stack([m[1] for m in pair_maps])
    HI = np.stack([m[2] for m in pair_maps])
    C = np.stack([m[3] for m in pair_maps])
    valid = D > 0
    # member[s, q]: pair q's depth inside seed s's trust region
    member = (D[None] >= np.minimum(LO, HI)[:, None]) & (
        D[None] <= np.maximum(LO, HI)[:, None]) & valid[None] & valid[:, None]
    counts = member.sum(axis=1)                  # (P, H, W)
    best = np.argmax(counts, axis=0)             # (H, W)
    bm = np.take_along_axis(member, best[None, None], axis=0)[0]   # (P, H, W)
    n = np.take_along_axis(counts, best[None], axis=0)[0]
    wsum = (bm * valid).sum(axis=0)
    keep = (n >= min_views) & (wsum > 0)
    depth = np.where(keep, (D * bm).sum(axis=0) / np.maximum(wsum, 1), 0.0)
    conf = np.where(keep, (C * bm).sum(axis=0) / np.maximum(wsum, 1), 0.0)
    return depth.astype(np.float32), conf.astype(np.float32)
