"""Pallas TPU kernel for the PatchMatch scoring hot loop.

The innermost operation of the whole framework (ScorePixelImage,
DepthMap.cpp:465-564; >95% of densify runtime per SURVEY.md 3.1): for every
pixel and candidate hypothesis, sample the neighbor view at 25 plane-warped
texel positions (bilinear) and accumulate a bilaterally weighted ZNCC.

XLA lowers these samples to serial scalar gathers (~40M/s measured on v5e);
this kernel performs them as *in-register lane gathers* (the VPU shuffle
network) from an aligned patch of the VMEM-resident neighbor image:

  - grid = (C, H/8, W/128, T): one texel per grid step (T fastest), so each
    (candidate, tile) output block stays resident while its texels accumulate
    — the kernel body stays small (one patch slice + one gather sweep), which
    both compiles quickly and avoids Mosaic register-pressure issues observed
    with a fully unrolled 25-texel body;
  - per step: warped coords via VPU math; an (8/128)-aligned (40, 384) patch
    is value-sliced from the image; each lane's bilinear sample = two lane
    gathers (x, x+1) per candidate row, rows blended by equality masks;
  - outputs: running (num, ssum, ssq) ZNCC accumulators + in-bounds mask;
    the final score assembly (normalization, robust clipping) runs in XLA
    (cheap elementwise).

Out-of-patch / out-of-image samples invalidate the pixel, matching the
reference's border handling.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# default source-patch row span: covers a full-lattice (8,128) tile's warp;
# ROW-PAIR-compacted sweeps span 16 image rows per tile and pass
# patch_rows=32 (patchmatch._PATCH_ROWS_COMPACT) as a static arg instead
PATCH_ROWS = int(_os.environ.get("OMVS_PATCH_ROWS", "24"))
# source-patch width: 3 lane-blocks cover an (8,128) tile's warp span at
# scale <~1.3 (row-pair compaction keeps x-coordinates exact, so the same
# width serves compacted sweeps; the legacy column packing OMVS_COMPACT=cols
# doubles the x-span and needs OMVS_PATCH_COLS=640)
PATCH_COLS = int(_os.environ.get("OMVS_PATCH_COLS", "384"))
# run the kernels through the Pallas interpreter (plain XLA ops, any
# backend): separates kernel LOGIC bugs from Mosaic compilation bugs, and
# lets the parity tests run without TPU hardware
INTERPRET = bool(_os.environ.get("OMVS_PALLAS_INTERPRET"))
TILE_H = int(_os.environ.get("OMVS_TILE_H", "8"))
TILE_W = 128
# texels processed per grid step: amortizes the fixed per-step cost (block
# bookkeeping across 15 operands) over several gather sweeps.  Default 25
# (= the full 5x5 texel window in ONE grid step) paired with the hoisted
# source band below: the round-4 battery measured hoist+chunk25 at
# 0.978 dm/s vs 0.8905 hoist-alone and 0.8487 default, and compact+hoist25
# at 1.0043 — the shipped configuration.
TEXEL_CHUNK = int(_os.environ.get("OMVS_TEXEL_CHUNK", "25"))
# OMVS_SLAB=1: diagonal-slab row selection — replaces the per-row
# broadcast/blend scan (patch_rows iterations) with one equality-select per
# static (8, PATCH_COLS) slab (patch_rows-7 iterations, no broadcasts):
# output sublane o reads its sample from patch row ly[o, l], and for real
# plane-induced warps ly ~ o + const (y-slope near 1), so that row sits in
# slab patch[k:k+8] at k = ly - o.  Lanes whose warp leaves the covered
# diagonal band invalidate exactly like an out-of-patch sample.
SLAB = bool(int(_os.environ.get("OMVS_SLAB", "0")))
# OMVS_DYNSLAB=1: DYNAMIC diagonal-slab selection — one dynamic slice pulls
# a (DYNSLAB_BAND, PATCH_COLS) band anchored at the tile's own minimum slab
# offset k0 = min(ly - o), then only BAND-7 slab equality-selects run
# (vs 17 static slabs / 24 row broadcasts).  The plane-induced warp keeps
# ly - o nearly constant within an (8, 128) tile (y-slope ~ 1), so a small
# band covers every pixel; the right bilinear sample rides a lane-rolled
# copy of the slab (same gather indices as the left sample, no blk1/loc1
# select chain).  Out-of-band pixels invalidate like out-of-patch samples.
DYNSLAB = bool(int(_os.environ.get("OMVS_DYNSLAB", "0")))
DYNSLAB_BAND = int(_os.environ.get("OMVS_DYNSLAB_BAND", "16"))
# OMVS_HOIST=1: slice ONE source band per (candidate, tile) grid step —
# anchored at the tile's zero-texel-offset warp — and gather every texel
# of the chunk from it, instead of a fresh patch slice per texel.  The
# per-texel dynamic slice is the measured kernel bottleneck (time scales
# linearly with patch AREA: 57.4 ms at 24x384, 19.0 ms at 8x128, while
# row-scan length and TEXEL_CHUNK change NOTHING — dev_rowsel_ab /
# patch-size sweep, round 3).  Texel offsets only move samples a few
# pixels, so a (HOIST_ROWS, HOIST_COLS) band with margin covers every
# texel of the chunk; out-of-band samples invalidate (same monotone
# contract as the slab variants).  Best paired with OMVS_TEXEL_CHUNK=25.
# Default ON since round 4: passed the kernel-variant accuracy-contract
# corpus with ZERO extra invalidation and won the battery (see TEXEL_CHUNK
# note above).  Opt out with OMVS_HOIST=0.
HOIST = bool(int(_os.environ.get("OMVS_HOIST", "1")))
HOIST_ROWS = int(_os.environ.get("OMVS_HOIST_ROWS", "32"))
HOIST_COLS = int(_os.environ.get("OMVS_HOIST_COLS", "512"))
# bfloat16 neighbor-image storage — PRODUCTION DEFAULT since round 5:
# the image slab reads are the scorer's per-candidate floor
# (scripts/dev_kernel_cand_scaling.py: 2.06 -> 1.21 ms/candidate at C=16,
# a 1.70x kernel speedup; bench end-to-end 1.02 -> 1.4177 dm/s = 8.34x
# the CPU anchor).  Slabs convert to f32 in-register right after the
# slice (Mosaic cannot lane-gather 16-bit with i32 indices), so only the
# IMAGE VALUES carry bf16's ~0.4% quantization into the ZNCC; validated:
# bundled-scene gates 219110/80979/40498 in-window and 4-scene corpus F
# within 0.3% of f32 on every scene, interpret-mode contract mean score
# diff 5e-4 with ZERO extra invalidation.  Opt out with OMVS_BF16_IMG=0.
# The operand dtype rides the jit cache key, so no static arg is needed.
BF16_IMG = bool(int(_os.environ.get("OMVS_BF16_IMG", "1")))
# OMVS_BF16_W=1: ALSO store the per-texel weight stacks (w, wtm) as bf16 —
# they are the two largest per-grid-step operand blocks
# ((TEXEL_CHUNK, 8, 128) each).  Env-gated experiment; weights carry
# bf16's ~0.4% into the ZNCC weighting directly, so it needs its own
# gates+corpus pass before any default change.
BF16_W = bool(int(_os.environ.get("OMVS_BF16_W", "0")))


def _texel_kernel(
    hl_ref,      # (1, 128) VMEM row: Hl row-major [0:9]
    hm_ref,      # (1, 128): Hm [0:3]
    goff_ref,    # (1, >=3T): texel offsets flattened
    size_ref,    # (1, 128): valid (h, w) of the view image
    act_ref,     # (1, n_row_tiles) SMEM: 0 = skip this 8-row tile entirely
    img_ref,     # (Hi, Wi) full neighbor image (padded)
    depth_ref,   # (1, 8, 128)
    nx_ref, ny_ref, nz_ref,
    invnd_ref,
    x0a_ref, x0b_ref, x0c_ref,
    w_ref,       # (1, 8, 128) this texel's bilateral weights
    wtm_ref,     # (1, 8, 128)
    num_ref,     # (1, 8, 128) accumulator outputs
    ssum_ref,
    ssq_ref,
    inb_ref,     # (1, 8, 128) float32 (1 = all texels so far in bounds)
    *,
    nearest: bool = False,
    patch_rows: int = PATCH_ROWS,
    row_mode: str = "scan",
    hoist: bool = False,
):
    # Per-TILE convergence skipping (the reference's per-pixel skip,
    # DepthMap.cpp:630-799, at TPU tile granularity): a traced flag per
    # 8-row tile — quiescent tiles skip the whole gather/score body (their
    # operand DMAs still run, but those are a small fraction of tile cost)
    # and zero-fill their outputs, so downstream sees inb=0 -> th_robust
    # for every candidate and the incumbent survives.  When no skipping is
    # requested the caller compiles _texel_kernel_noact instead — the
    # per-grid-step branch costs ~3% (battery r5), so the default path
    # carries no flag machinery at all.
    act = act_ref[0, pl.program_id(1)] > 0.5
    t_step = pl.program_id(3)   # hoisted: program_id inside a pl.when body
    first = t_step == 0         # is unsupported in interpret mode

    @pl.when(act)
    def _():
        _texel_score_body(
            hl_ref, hm_ref, goff_ref, size_ref, img_ref, depth_ref[0],
            nx_ref, ny_ref, nz_ref, invnd_ref, x0a_ref, x0b_ref, x0c_ref,
            w_ref, wtm_ref, num_ref, ssum_ref, ssq_ref, inb_ref,
            nearest=nearest, patch_rows=patch_rows, row_mode=row_mode,
            hoist=hoist, first=first, t_step=t_step,
        )

    @pl.when(jnp.logical_not(act) & first)
    def _():
        zero = jnp.zeros((1, TILE_H, TILE_W), jnp.float32)
        num_ref[...] = zero
        ssum_ref[...] = zero
        ssq_ref[...] = zero
        inb_ref[...] = zero


def _texel_kernel_noact(
    hl_ref, hm_ref, goff_ref, size_ref, img_ref,
    depth_ref,
    nx_ref, ny_ref, nz_ref, invnd_ref, x0a_ref, x0b_ref, x0c_ref,
    w_ref, wtm_ref,
    num_ref, ssum_ref, ssq_ref, inb_ref,
    *,
    nearest: bool = False,
    patch_rows: int = PATCH_ROWS,
    row_mode: str = "scan",
    hoist: bool = False,
):
    """The flag-free scorer kernel (the production default when no
    convergence skipping is scheduled)."""
    _texel_score_body(
        hl_ref, hm_ref, goff_ref, size_ref, img_ref, depth_ref[0],
        nx_ref, ny_ref, nz_ref, invnd_ref, x0a_ref, x0b_ref, x0c_ref,
        w_ref, wtm_ref, num_ref, ssum_ref, ssq_ref, inb_ref,
        nearest=nearest, patch_rows=patch_rows, row_mode=row_mode,
        hoist=hoist,
    )


def _texel_score_body(
    hl_ref, hm_ref, goff_ref, size_ref, img_ref,
    depth,       # (8, 128) VALUE (strictly positive)
    nx_ref, ny_ref, nz_ref, invnd_ref, x0a_ref, x0b_ref, x0c_ref,
    w_ref, wtm_ref, num_ref, ssum_ref, ssq_ref, inb_ref,
    *,
    nearest: bool = False,
    patch_rows: int = PATCH_ROWS,
    row_mode: str = "scan",
    hoist: bool = False,
    first=None,
    t_step=None,
):
    # NOTE: variant selection rides EXPLICIT kwargs, not module globals:
    # pallas caches traced kernels by the partial's hash, so a global flag
    # flip after the first trace silently reuses the stale kernel (this
    # bit every in-process variant A/B in round 3 until root-caused)
    Hp, Wp = img_ref.shape
    if t_step is None:
        t_step = pl.program_id(3)
    if first is None:
        first = t_step == 0

    inv_d = 1.0 / depth
    nx, ny, nz = nx_ref[0], ny_ref[0], nz_ref[0]
    inv_nd = invnd_ref[0]
    x0a, x0b, x0c = x0a_ref[:], x0b_ref[:], x0c_ref[:]
    hl = [hl_ref[0, i] for i in range(9)]
    hm = [hm_ref[0, i] for i in range(3)]
    h_j = size_ref[0, 0]
    w_j = size_ref[0, 1]

    sx0 = hl[0] * x0a + hl[1] * x0b + hl[2] * x0c
    sy0 = hl[3] * x0a + hl[4] * x0b + hl[5] * x0c
    sz0 = hl[6] * x0a + hl[7] * x0b + hl[8] * x0c

    num_acc = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    ssum_acc = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    ssq_acc = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    ok_acc = jnp.ones((TILE_H, TILE_W), jnp.bool_)
    p_rows = patch_rows
    p_cols = PATCH_COLS

    band = None
    if hoist:
        # anchor from the ZERO-texel-offset warp (g = 0: sga = 0,
        # scale = 1/d), slice the band once; every texel of this chunk
        # gathers from it.  Extra margins (-24 cols / -8 rows vs the
        # per-texel -8 / -4) absorb the few-pixel texel-offset shifts.
        p_rows = min(HOIST_ROWS, ((Hp + 7) // 8) * 8)
        p_cols = min(HOIST_COLS, Wp)
        sxc = sx0 + hm[0] * inv_d
        syc = sy0 + hm[1] * inv_d
        szc = sz0 + hm[2] * inv_d
        zokc = szc > 1e-8
        izc = jnp.where(zokc, 1.0 / jnp.where(zokc, szc, 1.0), 0.0)
        pxc = sxc * izc
        pyc = syc * izc
        okc = zokc & (pxc >= 1) & (pxc <= w_j - 2) & (pyc >= 1) & (pyc <= h_j - 2)
        px_vc = jnp.where(okc, pxc, 1e9)
        py_vc = jnp.where(okc, pyc, 1e9)
        hc0 = jnp.clip(jnp.min(px_vc).astype(jnp.int32) - 24, 0, Wp - p_cols)
        hc0 = pl.multiple_of(hc0 & ~127, 128)
        hr0 = jnp.clip(jnp.min(py_vc).astype(jnp.int32) - 8, 0, Hp - p_rows)
        hr0 = pl.multiple_of(hr0 & ~7, 8)
        # f32 immediately after the slice: the VMEM read is bf16 when
        # OMVS_BF16_IMG=1 (Mosaic cannot gather 16-bit with i32 indices)
        band = img_ref[pl.ds(hr0, p_rows),
                       pl.ds(hc0, p_cols)].astype(jnp.float32)
    n_blk = p_cols // 128

    for kk in range(TEXEL_CHUNK):
        ga = goff_ref[0, 3 * (t_step * TEXEL_CHUNK + kk)]
        gb = goff_ref[0, 3 * (t_step * TEXEL_CHUNK + kk) + 1]
        gc = goff_ref[0, 3 * (t_step * TEXEL_CHUNK + kk) + 2]
        sga = hl[0] * ga + hl[1] * gb + hl[2] * gc
        sgb = hl[3] * ga + hl[4] * gb + hl[5] * gc
        sgc = hl[6] * ga + hl[7] * gb + hl[8] * gc
        n_goff = nx * ga + ny * gb + nz * gc
        scale = inv_d + n_goff * inv_nd
        sx = sx0 + sga + hm[0] * scale
        sy = sy0 + sgb + hm[1] * scale
        sz = sz0 + sgc + hm[2] * scale
        zok = sz > 1e-8
        izs = jnp.where(zok, 1.0 / jnp.where(zok, sz, 1.0), 0.0)
        px = sx * izs
        py = sy * izs
        ok = zok & (px >= 1) & (px <= w_j - 2) & (py >= 1) & (py <= h_j - 2)

        # only fully in-image warps vote on the patch window (the same
        # guard _geom_body carries): clamped zero-depth pixels warp to the
        # EPIPOLE and out-of-image warps to far coordinates — letting them
        # into the min drags the window off the tile's real span and
        # saturates every valid pixel at th_robust along mask/pad borders
        px_v = jnp.where(ok, px, 1e9)
        py_v = jnp.where(ok, py, 1e9)
        if nearest:
            # nearest sampling: round x (1 column gather instead of 2);
            # y keeps the two-row blend machinery but selects, not blends
            px = jnp.round(px)
        if hoist:
            c0, r0 = hc0, hr0
            patch = band
        else:
            c0 = jnp.clip(jnp.min(px_v).astype(jnp.int32) - 8, 0, Wp - p_cols)
            c0 = pl.multiple_of(c0 & ~127, 128)
            r0 = jnp.clip(jnp.min(py_v).astype(jnp.int32) - 4, 0, Hp - p_rows)
            r0 = pl.multiple_of(r0 & ~7, 8)
            patch = img_ref[pl.ds(r0, p_rows),
                            pl.ds(c0, p_cols)].astype(jnp.float32)

        lxf = px - c0.astype(jnp.float32)
        lyf = py - r0.astype(jnp.float32)
        lx = jnp.floor(lxf).astype(jnp.int32)
        ly = jnp.floor(lyf).astype(jnp.int32)
        fx = lxf - lx.astype(jnp.float32)
        fy = lyf - ly.astype(jnp.float32)
        ok = ok & (lx >= 0) & (lx < p_cols - 1) & (ly >= 0) & (ly < p_rows - 1)
        lx = jnp.clip(lx, 0, p_cols - 2)
        ly = jnp.clip(ly, 0, p_rows - 2)
        lx1 = lx + 1
        blk = jnp.clip(lx >> 7, 0, n_blk - 1)
        blk1 = jnp.clip(lx1 >> 7, 0, n_blk - 1)
        loc = lx & 127
        loc1 = lx1 & 127

        v_top = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        v_bot = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        if row_mode == "dynslab" and TILE_H == 8:
            band_rows = min(DYNSLAB_BAND, p_rows)
            o_sub = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
            d_top = ly - o_sub
            d_v = jnp.where(ok, d_top, jnp.int32(1 << 20))
            k0 = jnp.clip(jnp.min(d_v), 0, p_rows - band_rows)
            # re-slice the REF at the dynamic row base (Mosaic has no
            # dynamic_slice on values): dband[k] == patch[k0 + k]
            dband = img_ref[pl.ds(r0 + k0, band_rows),
                            pl.ds(c0, p_cols)].astype(jnp.float32)
            rel = d_top - k0
            n_slab = band_rows - TILE_H + 1
            # rows rel and rel+1 must both sit on the covered band
            ok = ok & (rel >= 0) & (rel + 1 <= n_slab - 1)
            for k in range(n_slab):
                slab = dband[k : k + TILE_H, :]              # (8, p_cols)
                # lane-rolled copy: gathered at the SAME (blk, loc) it
                # yields the x+1 sample, block crossings included
                slab_r = jnp.concatenate(
                    [slab[:, 1:], slab[:, :1]], axis=1)
                g_l = jnp.zeros((TILE_H, TILE_W), jnp.float32)
                g_r = jnp.zeros((TILE_H, TILE_W), jnp.float32)
                for b in range(n_blk):
                    t = slab[:, 128 * b : 128 * (b + 1)]
                    g_l = jnp.where(
                        blk == b,
                        jnp.take_along_axis(t, loc, axis=1)
                        .astype(jnp.float32), g_l)
                    if not nearest:
                        tr = slab_r[:, 128 * b : 128 * (b + 1)]
                        g_r = jnp.where(
                            blk == b,
                            jnp.take_along_axis(tr, loc, axis=1)
                            .astype(jnp.float32), g_r)
                g = g_l if nearest else g_l * (1.0 - fx) + g_r * fx
                v_top = jnp.where(rel == k, g, v_top)
                v_bot = jnp.where(rel == k - 1, g, v_bot)
        elif row_mode == "slab" and TILE_H == 8:
            o_sub = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
            d_top = ly - o_sub
            n_slab = p_rows - TILE_H + 1
            # both rows (ly, ly+1) must sit on the covered diagonal band
            ok = ok & (d_top >= 0) & (d_top + 1 <= n_slab - 1)
            for k in range(n_slab):
                slab = patch[k : k + TILE_H, :]          # (8, PATCH_COLS)
                g_l = jnp.zeros((TILE_H, TILE_W), jnp.float32)
                g_r = jnp.zeros((TILE_H, TILE_W), jnp.float32)
                for b in range(n_blk):
                    t = slab[:, 128 * b : 128 * (b + 1)]
                    g_l = jnp.where(
                        blk == b,
                        jnp.take_along_axis(t, loc, axis=1)
                        .astype(jnp.float32), g_l)
                    if not nearest:
                        g_r = jnp.where(
                            blk1 == b,
                            jnp.take_along_axis(t, loc1, axis=1)
                            .astype(jnp.float32), g_r)
                g = g_l if nearest else g_l * (1.0 - fx) + g_r * fx
                v_top = jnp.where(d_top == k, g, v_top)
                v_bot = jnp.where(d_top == k - 1, g, v_bot)
        else:
            for r in range(p_rows):
                row = patch[r : r + 1, :]
                g_l = jnp.zeros((TILE_H, TILE_W), jnp.float32)
                g_r = jnp.zeros((TILE_H, TILE_W), jnp.float32)
                for b in range(n_blk):
                    t = jnp.broadcast_to(row[:, 128 * b : 128 * (b + 1)], (TILE_H, TILE_W))
                    g_l = jnp.where(
                        blk == b,
                        jnp.take_along_axis(t, loc, axis=1)
                        .astype(jnp.float32), g_l)
                    if not nearest:
                        g_r = jnp.where(
                            blk1 == b,
                            jnp.take_along_axis(t, loc1, axis=1)
                            .astype(jnp.float32), g_r)
                g = g_l if nearest else g_l * (1.0 - fx) + g_r * fx
                v_top = jnp.where(ly == r, g, v_top)
                v_bot = jnp.where(ly == r - 1, g, v_bot)
        if nearest:
            val = jnp.where(fy < 0.5, v_top, v_bot)
        else:
            val = v_top * (1.0 - fy) + v_bot * fy

        # f32 at the read: the stacks may ride VMEM as bf16
        # (OMVS_BF16_W experiment; elementwise reads, no gather-bitwidth
        # constraint)
        w_k = w_ref[kk].astype(jnp.float32)
        wtm_k = wtm_ref[kk].astype(jnp.float32)
        num_acc = num_acc + val * wtm_k
        ssum_acc = ssum_acc + val * w_k
        ssq_acc = ssq_acc + val * val * w_k
        ok_acc = ok_acc & ok

    @pl.when(first)
    def _():
        num_ref[0] = num_acc
        ssum_ref[0] = ssum_acc
        ssq_ref[0] = ssq_acc
        inb_ref[0] = ok_acc.astype(jnp.float32)

    @pl.when(jnp.logical_not(first))
    def _():
        num_ref[0] = num_ref[0] + num_acc
        ssum_ref[0] = ssum_ref[0] + ssum_acc
        ssq_ref[0] = ssq_ref[0] + ssq_acc
        inb_ref[0] = inb_ref[0] * ok_acc.astype(jnp.float32)


def _geom_body(tl, tm, tr, tn, h_j, w_j, dm_ref, depth, x0a, x0b, x0c,
               uu, vv, patch_rows: int, patch_cols: int):
    """Forward-backward reprojection consistency tile (DepthMap.cpp:535-551)
    with the neighbor-depth bilinear sample as in-register lane gathers.
    Shared by the standalone _geom_kernel and the merged scoring+geom
    kernel (_texel_geom_kernel); tl..tn are scalar lists, depth/x0*/uu/vv
    are (TILE_H, TILE_W) values, dm_ref a VMEM ref."""
    Hp, Wp = dm_ref.shape
    xa = x0a * depth
    xb = x0b * depth
    xc = x0c * depth
    sx = tl[0] * xa + tl[1] * xb + tl[2] * xc + tm[0]
    sy = tl[3] * xa + tl[4] * xb + tl[5] * xc + tm[1]
    z1 = tl[6] * xa + tl[7] * xb + tl[8] * xc + tm[2]
    zok = z1 > 1e-8
    iz = jnp.where(zok, 1.0 / jnp.where(zok, z1, 1.0), 0.0)
    x1 = sx * iz
    y1 = sy * iz
    # a pixel is "sampleable" only with positive candidate depth AND an
    # in-image warp.  Only sampleable pixels vote on the patch window:
    # zero-depth (invalid) pixels all warp to the EPIPOLE (X=0 -> x1 =
    # Tm[:2]/Tm[2], constant), and letting them into the min dragged the
    # window away from the tile's real warp span, saturating whole tiles
    # at cons=4 (measured: raw mesh faces 81k -> 148k on the bundled
    # scene before this guard).
    inside = zok & (depth > 0) & \
        (x1 >= 1) & (x1 <= w_j - 2) & (y1 >= 1) & (y1 <= h_j - 2)

    px_v = jnp.where(inside, x1, 1e9)
    py_v = jnp.where(inside, y1, 1e9)
    c0 = jnp.clip(jnp.min(px_v).astype(jnp.int32) - 8, 0, Wp - patch_cols)
    c0 = pl.multiple_of(c0 & ~127, 128)
    r0 = jnp.clip(jnp.min(py_v).astype(jnp.int32) - 4, 0, Hp - patch_rows)
    r0 = pl.multiple_of(r0 & ~7, 8)
    patch = dm_ref[pl.ds(r0, patch_rows), pl.ds(c0, patch_cols)]

    lxf = x1 - c0.astype(jnp.float32)
    lyf = y1 - r0.astype(jnp.float32)
    lx = jnp.floor(lxf).astype(jnp.int32)
    ly = jnp.floor(lyf).astype(jnp.int32)
    fx = lxf - lx.astype(jnp.float32)
    fy = lyf - ly.astype(jnp.float32)
    # sampleable pixels whose warp escapes the loaded window get a NEUTRAL
    # half-penalty instead of the max: the window covers 100% of measured
    # spans at the sizes picked by geom_term_pallas (dev_geom_spans*.py), so
    # this only guards unmeasured extremes — and a wrong max-penalty is the
    # failure mode that inflated raw mesh faces 2x, while a wrong neutral
    # on <0.1% of pixels is noise.
    in_win = (lx >= 0) & (lx < patch_cols - 1) & (ly >= 0) & (ly < patch_rows - 1)
    miss = inside & ~in_win
    inside = inside & in_win
    lx = jnp.clip(lx, 0, patch_cols - 2)
    ly = jnp.clip(ly, 0, patch_rows - 2)
    lx1 = lx + 1
    n_blk = patch_cols // 128
    blk = jnp.clip(lx >> 7, 0, n_blk - 1)
    blk1 = jnp.clip(lx1 >> 7, 0, n_blk - 1)
    loc = lx & 127
    loc1 = lx1 & 127

    TH, TW = depth.shape
    tlv = jnp.zeros((TH, TW), jnp.float32)
    trv = jnp.zeros((TH, TW), jnp.float32)
    blv = jnp.zeros((TH, TW), jnp.float32)
    brv = jnp.zeros((TH, TW), jnp.float32)
    for r in range(patch_rows):
        row = patch[r : r + 1, :]
        g_l = jnp.zeros((TH, TW), jnp.float32)
        g_r = jnp.zeros((TH, TW), jnp.float32)
        for b in range(n_blk):
            t = jnp.broadcast_to(row[:, 128 * b : 128 * (b + 1)], (TH, TW))
            g_l = jnp.where(blk == b, jnp.take_along_axis(t, loc, axis=1), g_l)
            g_r = jnp.where(blk1 == b, jnp.take_along_axis(t, loc1, axis=1), g_r)
        tlv = jnp.where(ly == r, g_l, tlv)
        trv = jnp.where(ly == r, g_r, trv)
        blv = jnp.where(ly == r - 1, g_l, blv)
        brv = jnp.where(ly == r - 1, g_r, brv)

    # plain bilinear + post similarity check.  NOTE: the reference gates each
    # corner by IsDepthSimilar and substitutes invalid ones (TImage::sample
    # with functor, Types.inl); implementing that exact semantics was
    # measured to DOUBLE raw mesh faces on the bundled scene (weaker
    # geometric suppression near discontinuities), so the stricter
    # blend-then-check form is kept deliberately.
    d1 = (1.0 - fy) * ((1.0 - fx) * tlv + fx * trv) + \
        fy * ((1.0 - fx) * blv + fx * brv)
    similar = inside & (d1 > 0) & (jnp.abs(z1 - d1) < 0.03 * z1)
    xbx = x1 * d1
    xby = y1 * d1
    bx = tr[0] * xbx + tr[1] * xby + tr[2] * d1 + tn[0]
    by = tr[3] * xbx + tr[4] * xby + tr[5] * d1 + tn[1]
    zb = tr[6] * xbx + tr[7] * xby + tr[8] * d1 + tn[2]
    zbok = zb > 1e-8
    izb = jnp.where(zbok, 1.0 / jnp.where(zbok, zb, 1.0), 0.0)
    du = uu - bx * izb
    dv = vv - by * izb
    dist = jnp.sqrt(du * du + dv * dv)
    cons = jnp.minimum(jnp.sqrt(dist * (dist + 2.0)), 4.0)
    return jnp.where(miss, 2.0, jnp.where(similar & zbok, cons, 4.0))


def _texel_geom_kernel(
    hl_ref,      # (1, 128) SMEM: Hl row-major [0:9] (== Tl)
    hm_ref,      # (1, 128): Hm [0:3] (== Tm)
    tr_ref,      # (1, 128): Tr row-major [0:9]
    tn_ref,      # (1, 128): Tn [0:3]
    goff_ref,    # (1, >=3T): texel offsets flattened
    size_ref,    # (1, 128): valid (h, w) of the view image / depth map
    act_ref,     # (1, n_row_tiles) SMEM: 0 = skip this 8-row tile
    img_ref,     # (Hi, Wi) full neighbor image (padded)
    dm_ref,      # (Hg, Wg) full neighbor depth map (padded)
    depth_ref,   # (1, 8, 128) RAW candidate depths (0 = invalid)
    nx_ref, ny_ref, nz_ref,
    invnd_ref,
    x0a_ref, x0b_ref, x0c_ref,
    uu_ref, vv_ref,              # (8, 128) ref pixel coordinates
    w_ref,       # (TEXEL_CHUNK, 8, 128)
    wtm_ref,
    num_ref, ssum_ref, ssq_ref, inb_ref,
    cons_ref,    # (1, 8, 128) geometric consistency [0, 4]
    *,
    nearest: bool = False,
    patch_rows: int = PATCH_ROWS,
    geom_rows: int = PATCH_ROWS,
    geom_cols: int = PATCH_COLS,
    row_mode: str = "scan",
    hoist: bool = False,
):
    """Scoring kernel + the geometric-consistency term in ONE pallas_call:
    a second pallas_call in the same sweep jit miscompiles on this backend
    (see patchmatch._geometric_term), so the geom term rides the scoring
    kernel's grid instead — computed once per (candidate, tile) on the
    first texel-chunk step.  Hl==Tl and Hm==Tm (densify._assemble_pm_host),
    so the warp constants are shared.  act_ref: per-tile convergence
    skipping, see _texel_kernel."""
    t_step = pl.program_id(3)   # hoisted out of the pl.when bodies
    first = t_step == 0
    act = act_ref[0, pl.program_id(1)] > 0.5
    raw_depth = depth_ref[0]
    # scoring math needs strictly-positive depths (inv_d); geom needs the
    # raw zeros to mark invalid hypotheses
    depth_s = jnp.maximum(raw_depth, 1e-6)

    @pl.when(act)
    def _():
        _texel_score_body(
            hl_ref, hm_ref, goff_ref, size_ref, img_ref, depth_s,
            nx_ref, ny_ref, nz_ref, invnd_ref, x0a_ref, x0b_ref, x0c_ref,
            w_ref, wtm_ref, num_ref, ssum_ref, ssq_ref, inb_ref,
            nearest=nearest, patch_rows=patch_rows, row_mode=row_mode,
            hoist=hoist, first=first, t_step=t_step,
        )

    @pl.when(act & first)
    def _():
        tl = [hl_ref[0, i] for i in range(9)]
        tm = [hm_ref[0, i] for i in range(3)]
        tr = [tr_ref[0, i] for i in range(9)]
        tn = [tn_ref[0, i] for i in range(3)]
        cons_ref[0] = _geom_body(
            tl, tm, tr, tn, size_ref[0, 0], size_ref[0, 1], dm_ref,
            raw_depth, x0a_ref[:], x0b_ref[:], x0c_ref[:],
            uu_ref[:], vv_ref[:], geom_rows, geom_cols)

    @pl.when(jnp.logical_not(act) & first)
    def _():
        zero = jnp.zeros((1, TILE_H, TILE_W), jnp.float32)
        num_ref[...] = zero
        ssum_ref[...] = zero
        ssq_ref[...] = zero
        inb_ref[...] = zero
        cons_ref[...] = zero


def _texel_geom_kernel_noact(
    hl_ref, hm_ref, tr_ref, tn_ref, goff_ref, size_ref,
    img_ref, dm_ref, depth_ref,
    nx_ref, ny_ref, nz_ref, invnd_ref, x0a_ref, x0b_ref, x0c_ref,
    uu_ref, vv_ref, w_ref, wtm_ref,
    num_ref, ssum_ref, ssq_ref, inb_ref, cons_ref,
    *,
    nearest: bool = False,
    patch_rows: int = PATCH_ROWS,
    geom_rows: int = PATCH_ROWS,
    geom_cols: int = PATCH_COLS,
    row_mode: str = "scan",
    hoist: bool = False,
):
    """Flag-free merged scorer+geom kernel (the default when no
    convergence skipping is scheduled — see _texel_kernel_noact)."""
    first = pl.program_id(3) == 0
    raw_depth = depth_ref[0]
    depth_s = jnp.maximum(raw_depth, 1e-6)

    _texel_score_body(
        hl_ref, hm_ref, goff_ref, size_ref, img_ref, depth_s,
        nx_ref, ny_ref, nz_ref, invnd_ref, x0a_ref, x0b_ref, x0c_ref,
        w_ref, wtm_ref, num_ref, ssum_ref, ssq_ref, inb_ref,
        nearest=nearest, patch_rows=patch_rows, row_mode=row_mode,
        hoist=hoist,
    )

    @pl.when(first)
    def _():
        tl = [hl_ref[0, i] for i in range(9)]
        tm = [hm_ref[0, i] for i in range(3)]
        tr = [tr_ref[0, i] for i in range(9)]
        tn = [tn_ref[0, i] for i in range(3)]
        cons_ref[0] = _geom_body(
            tl, tm, tr, tn, size_ref[0, 0], size_ref[0, 1], dm_ref,
            raw_depth, x0a_ref[:], x0b_ref[:], x0c_ref[:],
            uu_ref[:], vv_ref[:], geom_rows, geom_cols)


def _geom_kernel(
    tl_ref,      # (1, 128) SMEM: Tl row-major [0:9]
    tm_ref,      # (1, 128): Tm [0:3]
    tr_ref,      # (1, 128): Tr row-major [0:9]
    tn_ref,      # (1, 128): Tn [0:3]
    size_ref,    # (1, 128): valid (h, w) of the neighbor depth map
    dm_ref,      # (Hp, Wp) neighbor depth map (padded, VMEM)
    depth_ref,   # (1, 8, 128) candidate depths
    x0a_ref, x0b_ref, x0c_ref,   # (8, 128) ref-ray components (Kinv @ uv1)
    uu_ref, vv_ref,              # (8, 128) ref pixel coordinates
    cons_ref,    # (1, 8, 128) output consistency penalty [0, 4]
    *,
    patch_rows: int = PATCH_ROWS,
    patch_cols: int = PATCH_COLS,
):
    tl = [tl_ref[0, i] for i in range(9)]
    tm = [tm_ref[0, i] for i in range(3)]
    tr = [tr_ref[0, i] for i in range(9)]
    tn = [tn_ref[0, i] for i in range(3)]
    cons_ref[0] = _geom_body(
        tl, tm, tr, tn, size_ref[0, 0], size_ref[0, 1], dm_ref,
        depth_ref[0], x0a_ref[:], x0b_ref[:], x0c_ref[:],
        uu_ref[:], vv_ref[:], patch_rows, patch_cols)


def _geom_window(H: int, W: int, Hi: int, Wi: int,
                 patch_rows: int = 0) -> Tuple[int, int]:
    """(rows, cols) of the geom kernel's dm window for a HxW depth map.

    Sized from measured per-(8,128)-tile warp-span distributions on the
    bundled scene (scripts/dev_geom_spans{,_dmap}.py): row spans reach 44
    at 240 rows and 58 at 479 rows (24 + H/12 covers both with margin);
    col spans reach 316 at W=320 and 482 at W=640 (3W/4 aligned up).  A
    fixed 24x384 window missed ~half the tiles at pipeline resolution,
    saturating them at max penalty and doubling raw mesh faces."""
    rows = 24 + H // 12
    if patch_rows > PATCH_ROWS:       # row-pair compaction widens tile spans
        rows += patch_rows - PATCH_ROWS
    rows = min(-(-max(rows, 32) // 8) * 8, 128, Hi)
    cols = min(-(-max(3 * W // 4, 384) // 128) * 128, 1024, Wi)
    return rows, cols


@functools.partial(jax.jit, static_argnames=("patch_rows",))
def geom_term_pallas(
    dm: jnp.ndarray,         # (Hp, Wp) neighbor depth map
    size: jnp.ndarray,       # (2,) valid h, w
    Tl: jnp.ndarray,         # (3, 3)
    Tm: jnp.ndarray,         # (3,)
    Tr: jnp.ndarray,         # (3, 3)
    Tn: jnp.ndarray,         # (3,)
    depth: jnp.ndarray,      # (C, H, W) candidate depths
    X0: jnp.ndarray,         # (H, W, 3)
    uv: jnp.ndarray,         # (H, W, 2)
    patch_rows: int = 0,
) -> jnp.ndarray:
    """Geometric-consistency penalty (C, H, W) in [0, 4] for one view.

    Same contract as patchmatch._geometric_term (DepthMap.cpp:535-551);
    sampling via lane gathers instead of XLA serial gathers.  The dm window
    auto-scales with resolution (_geom_window); pass patch_rows only to
    signal row-pair-compacted inputs."""
    C, H, W = depth.shape
    Hpad = -(-H // TILE_H) * TILE_H
    Wpad = -(-W // TILE_W) * TILE_W
    Hi = -(-dm.shape[0] // TILE_H) * TILE_H
    Wi = max(-(-dm.shape[1] // TILE_W) * TILE_W, 384)
    g_rows, g_cols = _geom_window(H, W, max(Hi, 32), Wi, patch_rows)
    Hi = max(Hi, g_rows)

    dm_p = _pad_to(dm, Hi, Wi, (0, 1))
    depth_p = _pad_to(depth, Hpad, Wpad, (1, 2))
    x0a = _pad_to(X0[..., 0], Hpad, Wpad, (0, 1))
    x0b = _pad_to(X0[..., 1], Hpad, Wpad, (0, 1))
    x0c = _pad_to(X0[..., 2], Hpad, Wpad, (0, 1))
    uu = _pad_to(uv[..., 0], Hpad, Wpad, (0, 1))
    vv = _pad_to(uv[..., 1], Hpad, Wpad, (0, 1))

    tl_s = Tl.reshape(1, 9).astype(jnp.float32)
    tm_s = Tm.reshape(1, 3).astype(jnp.float32)
    tr_s = Tr.reshape(1, 9).astype(jnp.float32)
    tn_s = Tn.reshape(1, 3).astype(jnp.float32)
    size_s = size.reshape(1, 2).astype(jnp.float32)

    grid = (C, Hpad // TILE_H, Wpad // TILE_W)

    def im_c(c, i, j):
        return (c, i, j)

    def im_hw(c, i, j):
        return (i, j)

    def im_const(c, i, j):
        return (0, 0)

    cons = pl.pallas_call(
        functools.partial(_geom_kernel, patch_rows=g_rows, patch_cols=g_cols),
        out_shape=jax.ShapeDtypeStruct((C, Hpad, Wpad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(tl_s.shape, im_const, memory_space=pltpu.SMEM),
            pl.BlockSpec(tm_s.shape, im_const, memory_space=pltpu.SMEM),
            pl.BlockSpec(tr_s.shape, im_const, memory_space=pltpu.SMEM),
            pl.BlockSpec(tn_s.shape, im_const, memory_space=pltpu.SMEM),
            pl.BlockSpec(size_s.shape, im_const, memory_space=pltpu.SMEM),
            pl.BlockSpec((Hi, Wi), lambda c, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, TILE_W), im_c, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), im_hw, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), im_hw, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), im_hw, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), im_hw, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), im_hw, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_H, TILE_W), im_c, memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(tl_s, tm_s, tr_s, tn_s, size_s, dm_p,
      depth_p, x0a, x0b, x0c, uu, vv)
    return cons[:, :H, :W]


def _pad_to(x: jnp.ndarray, h: int, w: int, axes: Tuple[int, int]):
    pads = [(0, 0)] * x.ndim
    pads[axes[0]] = (0, h - x.shape[axes[0]])
    pads[axes[1]] = (0, w - x.shape[axes[1]])
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads)
    return x


def _tile_act_full(depth_shape, tile_act):
    """Pad/derive the per-8-row-tile activity flags to (1, Hpad//TILE_H);
    None -> all ones (the exact default behavior)."""
    Hpad = -(-depth_shape[-2] // TILE_H) * TILE_H
    nt = Hpad // TILE_H
    if tile_act is None:
        return jnp.ones((1, nt), jnp.float32)
    t = tile_act.reshape(-1).astype(jnp.float32)
    if t.shape[0] < nt:
        # tiles beyond the caller's lattice are pure padding: skip them too
        t = jnp.concatenate([t, jnp.zeros(nt - t.shape[0], jnp.float32)])
    return t[:nt].reshape(1, nt)


def score_view_pallas(*args, row_mode=None, hoist=None, tile_act=None, **kw):
    """Public scorer: resolves the row-selection / band-hoist variant from
    the env-initialized module globals UNLESS given explicitly, then calls
    the jitted kernel with them as STATIC args.  Variants must ride the jit
    cache key: in-process flag flips with `_clear_cache()` silently reused
    the stale pallas kernel trace (round-3 root cause — it invalidated every
    in-process variant A/B and made the interpret-mode slab parity tests
    compare identical outputs).

    tile_act: optional per-8-row-tile activity flags (convergence skipping;
    see _texel_kernel).  None scores every tile."""
    if row_mode is None:
        row_mode = "dynslab" if DYNSLAB else ("slab" if SLAB else "scan")
    if hoist is None:
        hoist = HOIST
    if BF16_IMG:
        # convert OUTSIDE the jit: the input aval carries the dtype into
        # the cache key (an in-trace flag read is the r3 stale-trace trap)
        args = (args[0].astype(jnp.bfloat16),) + args[1:]
    if BF16_W:
        args = (args[:9] + (args[9].astype(jnp.bfloat16),
                            args[10].astype(jnp.bfloat16)) + args[11:])
    ta = (None if tile_act is None
          else _tile_act_full(args[4].shape, tile_act))   # args[4] = depth
    return _score_view_pallas(*args, tile_act=ta, row_mode=row_mode,
                              hoist=hoist, **kw)


@functools.partial(jax.jit, static_argnames=("n_texels", "th_robust", "nearest", "patch_rows", "row_mode", "hoist"))
def _score_view_pallas(
    img: jnp.ndarray,        # (Hp, Wp) neighbor image
    size: jnp.ndarray,       # (2,) valid h, w
    Hl: jnp.ndarray,         # (3, 3)
    Hm: jnp.ndarray,         # (3,)
    depth: jnp.ndarray,      # (C, H, W) candidates
    normal: jnp.ndarray,     # (C, H, W, 3)
    inv_nd: jnp.ndarray,     # (C, H, W)
    X0: jnp.ndarray,         # (H, W, 3)
    goff: jnp.ndarray,       # (T, 3)
    w: jnp.ndarray,          # (T, H, W)
    wtm: jnp.ndarray,        # (T, H, W)
    sum_w: jnp.ndarray,      # (H, W)
    norm_sq0: jnp.ndarray,   # (H, W)
    n_texels: int,
    th_robust: float,
    nearest: bool = False,
    patch_rows: int = PATCH_ROWS,
    row_mode: str = "scan",
    hoist: bool = False,
    tile_act: jnp.ndarray = None,   # (1, Hpad//TILE_H) activity flags
) -> jnp.ndarray:
    """Weighted-ZNCC scores (C, H, W) of candidate maps in one view.

    nearest=True samples nearest-texel instead of bilinear (half the column
    gathers, ~1.5x faster) — used for candidate-search sweeps; the final
    sweep and state rescoring stay bilinear (reference semantics,
    DepthMap.cpp:465-564)."""
    C, H, W = depth.shape
    T = -(-n_texels // TEXEL_CHUNK) * TEXEL_CHUNK
    Hpad = -(-H // TILE_H) * TILE_H
    Wpad = -(-W // TILE_W) * TILE_W
    Hi = max(-(-img.shape[0] // TILE_H) * TILE_H, patch_rows)
    Wi = max(-(-img.shape[1] // TILE_W) * TILE_W, PATCH_COLS)

    img_p = _pad_to(img, Hi, Wi, (0, 1))
    depth_p = _pad_to(jnp.maximum(depth, 1e-6), Hpad, Wpad, (1, 2))
    nx = _pad_to(normal[..., 0], Hpad, Wpad, (1, 2))
    ny = _pad_to(normal[..., 1], Hpad, Wpad, (1, 2))
    nz = _pad_to(normal[..., 2], Hpad, Wpad, (1, 2))
    invnd_p = _pad_to(inv_nd, Hpad, Wpad, (1, 2))
    x0a = _pad_to(X0[..., 0], Hpad, Wpad, (0, 1))
    x0b = _pad_to(X0[..., 1], Hpad, Wpad, (0, 1))
    x0c = _pad_to(X0[..., 2], Hpad, Wpad, (0, 1))
    w_p = _pad_to(w, Hpad, Wpad, (1, 2))
    wtm_p = _pad_to(wtm, Hpad, Wpad, (1, 2))
    if T != n_texels:
        # zero-weight padding texels with center (0-offset) geometry so they
        # neither contribute to the ZNCC nor trip the in-bounds mask
        padT = T - n_texels
        zg = jnp.zeros((padT, 3), goff.dtype)
        goff = jnp.concatenate([goff, zg], axis=0)
        zw = jnp.zeros((padT,) + w_p.shape[1:], w_p.dtype)
        w_p = jnp.concatenate([w_p, zw], axis=0)
        wtm_p = jnp.concatenate([wtm_p, zw], axis=0)

    hl_s = Hl.reshape(1, 9).astype(jnp.float32)
    hm_s = Hm.reshape(1, 3).astype(jnp.float32)
    goff_s = goff.reshape(1, 3 * T).astype(jnp.float32)
    size_s = size.reshape(1, 2).astype(jnp.float32)
    act_s = (jnp.ones((1, Hpad // TILE_H), jnp.float32)
             if tile_act is None else tile_act.astype(jnp.float32))

    grid = (C, Hpad // TILE_H, Wpad // TILE_W, T // TEXEL_CHUNK)

    def im_c(c, i, j, t):
        return (c, i, j)

    def im_hw(c, i, j, t):
        return (i, j)

    def im_wt(c, i, j, t):
        return (t, i, j)

    def im_const(c, i, j, t):
        return (0, 0)

    out_shapes = [jax.ShapeDtypeStruct((C, Hpad, Wpad), jnp.float32)] * 4
    common_specs = [
        pl.BlockSpec(hl_s.shape, im_const, memory_space=pltpu.SMEM),
        pl.BlockSpec(hm_s.shape, im_const, memory_space=pltpu.SMEM),
        pl.BlockSpec(goff_s.shape, im_const, memory_space=pltpu.SMEM),
        pl.BlockSpec(size_s.shape, im_const, memory_space=pltpu.SMEM),
    ]
    tail_specs = [
        pl.BlockSpec((Hi, Wi), lambda c, i, j, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_H, TILE_W), im_c, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_H, TILE_W), im_c, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_H, TILE_W), im_c, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_H, TILE_W), im_c, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_H, TILE_W), im_c, memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_H, TILE_W), im_hw, memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_H, TILE_W), im_hw, memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_H, TILE_W), im_hw, memory_space=pltpu.VMEM),
        pl.BlockSpec((TEXEL_CHUNK, TILE_H, TILE_W), im_wt, memory_space=pltpu.VMEM),
        pl.BlockSpec((TEXEL_CHUNK, TILE_H, TILE_W), im_wt, memory_space=pltpu.VMEM),
    ]
    tail_args = (img_p, depth_p, nx, ny, nz, invnd_p, x0a, x0b, x0c,
                 w_p, wtm_p)
    kw = dict(nearest=nearest, patch_rows=patch_rows, row_mode=row_mode,
              hoist=hoist)
    if tile_act is None:
        # flag-free kernel: the per-grid-step act branch costs ~3% even at
        # all-ones (battery r5), so the default path compiles without it
        kernel = functools.partial(_texel_kernel_noact, **kw)
        in_specs = common_specs + tail_specs
        args = (hl_s, hm_s, goff_s, size_s) + tail_args
    else:
        kernel = functools.partial(_texel_kernel, **kw)
        in_specs = (common_specs
                    + [pl.BlockSpec(act_s.shape, im_const,
                                    memory_space=pltpu.SMEM)]
                    + tail_specs)
        args = (hl_s, hm_s, goff_s, size_s, act_s) + tail_args
    num, ssum, ssq, inbf = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W), im_c, memory_space=pltpu.VMEM)
        ] * 4,
        interpret=INTERPRET,
    )(*args)

    num = num[:, :H, :W]
    ssum = ssum[:, :H, :W]
    ssq = ssq[:, :H, :W]
    inb = inbf[:, :H, :W] > 0.5
    # final assembly in XLA (cheap elementwise)
    norm_sq1 = ssq - ssum * ssum / jnp.maximum(sum_w[None], 1e-12)
    nrm_sq = norm_sq0[None] * norm_sq1
    ncc = jnp.clip(num * jax.lax.rsqrt(jnp.maximum(nrm_sq, 1e-30)), -1.0, 1.0)
    score = 1.0 - ncc
    return jnp.where((nrm_sq <= 1e-16) | ~inb, th_robust, score)


score_view_pallas._clear_cache = lambda: _score_view_pallas._clear_cache()


def score_view_geom_pallas(*args, row_mode=None, hoist=None, tile_act=None,
                           **kw):
    """Public merged scorer+geom kernel (see score_view_pallas for the
    variant-resolution and tile_act contracts)."""
    if row_mode is None:
        row_mode = "dynslab" if DYNSLAB else ("slab" if SLAB else "scan")
    if hoist is None:
        hoist = HOIST
    if BF16_IMG:
        args = (args[0].astype(jnp.bfloat16),) + args[1:]
    if BF16_W:
        args = (args[:13] + (args[13].astype(jnp.bfloat16),
                             args[14].astype(jnp.bfloat16)) + args[15:])
    ta = (None if tile_act is None
          else _tile_act_full(args[7].shape, tile_act))   # args[7] = depth
    return _score_view_geom_pallas(*args, tile_act=ta, row_mode=row_mode,
                                   hoist=hoist, **kw)


@functools.partial(jax.jit, static_argnames=("n_texels", "th_robust", "nearest", "patch_rows", "row_mode", "hoist"))
def _score_view_geom_pallas(
    img: jnp.ndarray,        # (Hp, Wp) neighbor image
    size: jnp.ndarray,       # (2,) valid h, w
    Hl: jnp.ndarray,         # (3, 3) (== Tl)
    Hm: jnp.ndarray,         # (3,)   (== Tm)
    Tr: jnp.ndarray,         # (3, 3)
    Tn: jnp.ndarray,         # (3,)
    dm: jnp.ndarray,         # (Hd, Wd) neighbor depth map
    depth: jnp.ndarray,      # (C, H, W) RAW candidates (0 = invalid)
    normal: jnp.ndarray,     # (C, H, W, 3)
    inv_nd: jnp.ndarray,     # (C, H, W)
    X0: jnp.ndarray,         # (H, W, 3)
    uv: jnp.ndarray,         # (H, W, 2)
    goff: jnp.ndarray,       # (T, 3)
    w: jnp.ndarray,          # (T, H, W)
    wtm: jnp.ndarray,        # (T, H, W)
    sum_w: jnp.ndarray,      # (H, W)
    norm_sq0: jnp.ndarray,   # (H, W)
    n_texels: int,
    th_robust: float,
    nearest: bool = False,
    patch_rows: int = PATCH_ROWS,
    row_mode: str = "scan",
    hoist: bool = False,
    tile_act: jnp.ndarray = None,   # (1, Hpad//TILE_H) activity flags
):
    """(score, cons): weighted-ZNCC scores AND the geometric-consistency
    penalty of candidate maps in one view, from ONE pallas_call (see
    _texel_geom_kernel).  The standalone pair (score_view_pallas +
    geom_term_pallas in separate jits) computes identical values; this
    fusion exists so geometric sweeps keep a single kernel per jit."""
    C, H, W = depth.shape
    T = -(-n_texels // TEXEL_CHUNK) * TEXEL_CHUNK
    Hpad = -(-H // TILE_H) * TILE_H
    Wpad = -(-W // TILE_W) * TILE_W
    Hi = max(-(-img.shape[0] // TILE_H) * TILE_H, patch_rows)
    Wi = max(-(-img.shape[1] // TILE_W) * TILE_W, PATCH_COLS)
    Hg0 = -(-dm.shape[0] // TILE_H) * TILE_H
    Wg = max(-(-dm.shape[1] // TILE_W) * TILE_W, 384)
    g_rows, g_cols = _geom_window(H, W, max(Hg0, 32), Wg)
    Hg = max(Hg0, g_rows)

    img_p = _pad_to(img, Hi, Wi, (0, 1))
    dm_p = _pad_to(dm, Hg, Wg, (0, 1))
    depth_p = _pad_to(depth, Hpad, Wpad, (1, 2))
    nx = _pad_to(normal[..., 0], Hpad, Wpad, (1, 2))
    ny = _pad_to(normal[..., 1], Hpad, Wpad, (1, 2))
    nz = _pad_to(normal[..., 2], Hpad, Wpad, (1, 2))
    invnd_p = _pad_to(inv_nd, Hpad, Wpad, (1, 2))
    x0a = _pad_to(X0[..., 0], Hpad, Wpad, (0, 1))
    x0b = _pad_to(X0[..., 1], Hpad, Wpad, (0, 1))
    x0c = _pad_to(X0[..., 2], Hpad, Wpad, (0, 1))
    uu = _pad_to(uv[..., 0], Hpad, Wpad, (0, 1))
    vv = _pad_to(uv[..., 1], Hpad, Wpad, (0, 1))
    w_p = _pad_to(w, Hpad, Wpad, (1, 2))
    wtm_p = _pad_to(wtm, Hpad, Wpad, (1, 2))
    if T != n_texels:
        padT = T - n_texels
        zg = jnp.zeros((padT, 3), goff.dtype)
        goff = jnp.concatenate([goff, zg], axis=0)
        zw = jnp.zeros((padT,) + w_p.shape[1:], w_p.dtype)
        w_p = jnp.concatenate([w_p, zw], axis=0)
        wtm_p = jnp.concatenate([wtm_p, zw], axis=0)

    hl_s = Hl.reshape(1, 9).astype(jnp.float32)
    hm_s = Hm.reshape(1, 3).astype(jnp.float32)
    tr_s = Tr.reshape(1, 9).astype(jnp.float32)
    tn_s = Tn.reshape(1, 3).astype(jnp.float32)
    goff_s = goff.reshape(1, 3 * T).astype(jnp.float32)
    size_s = size.reshape(1, 2).astype(jnp.float32)
    act_s = (jnp.ones((1, Hpad // TILE_H), jnp.float32)
             if tile_act is None else tile_act.astype(jnp.float32))

    grid = (C, Hpad // TILE_H, Wpad // TILE_W, T // TEXEL_CHUNK)

    def im_c(c, i, j, t):
        return (c, i, j)

    def im_hw(c, i, j, t):
        return (i, j)

    def im_wt(c, i, j, t):
        return (t, i, j)

    def im_const(c, i, j, t):
        return (0, 0)

    out_shapes = [jax.ShapeDtypeStruct((C, Hpad, Wpad), jnp.float32)] * 5
    common_specs = [
        pl.BlockSpec(hl_s.shape, im_const, memory_space=pltpu.SMEM),
        pl.BlockSpec(hm_s.shape, im_const, memory_space=pltpu.SMEM),
        pl.BlockSpec(tr_s.shape, im_const, memory_space=pltpu.SMEM),
        pl.BlockSpec(tn_s.shape, im_const, memory_space=pltpu.SMEM),
        pl.BlockSpec(goff_s.shape, im_const, memory_space=pltpu.SMEM),
        pl.BlockSpec(size_s.shape, im_const, memory_space=pltpu.SMEM),
    ]
    tail_specs = [
        pl.BlockSpec((Hi, Wi), lambda c, i, j, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Hg, Wg), lambda c, i, j, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_H, TILE_W), im_c, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_H, TILE_W), im_c, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_H, TILE_W), im_c, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_H, TILE_W), im_c, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_H, TILE_W), im_c, memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_H, TILE_W), im_hw, memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_H, TILE_W), im_hw, memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_H, TILE_W), im_hw, memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_H, TILE_W), im_hw, memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_H, TILE_W), im_hw, memory_space=pltpu.VMEM),
        pl.BlockSpec((TEXEL_CHUNK, TILE_H, TILE_W), im_wt, memory_space=pltpu.VMEM),
        pl.BlockSpec((TEXEL_CHUNK, TILE_H, TILE_W), im_wt, memory_space=pltpu.VMEM),
    ]
    tail_args = (img_p, dm_p, depth_p, nx, ny, nz, invnd_p, x0a, x0b, x0c,
                 uu, vv, w_p, wtm_p)
    kkw = dict(nearest=nearest, patch_rows=patch_rows, geom_rows=g_rows,
               geom_cols=g_cols, row_mode=row_mode, hoist=hoist)
    if tile_act is None:
        kernel = functools.partial(_texel_geom_kernel_noact, **kkw)
        in_specs = common_specs + tail_specs
        args = (hl_s, hm_s, tr_s, tn_s, goff_s, size_s) + tail_args
    else:
        kernel = functools.partial(_texel_geom_kernel, **kkw)
        in_specs = (common_specs
                    + [pl.BlockSpec(act_s.shape, im_const,
                                    memory_space=pltpu.SMEM)]
                    + tail_specs)
        args = (hl_s, hm_s, tr_s, tn_s, goff_s, size_s, act_s) + tail_args
    num, ssum, ssq, inbf, cons = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W), im_c, memory_space=pltpu.VMEM)
        ] * 5,
        interpret=INTERPRET,
    )(*args)

    num = num[:, :H, :W]
    ssum = ssum[:, :H, :W]
    ssq = ssq[:, :H, :W]
    inb = inbf[:, :H, :W] > 0.5
    cons = cons[:, :H, :W]
    norm_sq1 = ssq - ssum * ssum / jnp.maximum(sum_w[None], 1e-12)
    nrm_sq = norm_sq0[None] * norm_sq1
    ncc = jnp.clip(num * jax.lax.rsqrt(jnp.maximum(nrm_sq, 1e-30)), -1.0, 1.0)
    score = 1.0 - ncc
    return jnp.where((nrm_sq <= 1e-16) | ~inb, th_robust, score), cons


score_view_geom_pallas._clear_cache = (
    lambda: _score_view_geom_pallas._clear_cache())
