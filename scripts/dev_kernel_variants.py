"""Dev: time Pallas scoring-kernel variants on the TPU.

Variants:
  v1      : current pm_kernel (24 rows x 3 aligned col-blocks, bilinear)
  v2      : unaligned dynamic r0/c0 slices, N_ROWS x N_BLK col-blocks
  v2-nn   : v2 with nearest sampling (1 gather instead of 2 + no row pair)
Checks numerical agreement of v2 vs v1 where both are in-patch.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H, TILE_W = 8, 128  # v1 constants; v2 takes tile_h param
TEXEL_CHUNK = 5


def make_inputs(C=11, H=480, W=640, T=25, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.random((H, W), np.float32)
    size = np.array([H, W], np.float32)
    K = np.array([[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1]], np.float32)
    a = 0.03
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]], np.float32)
    Hl = (K @ R).astype(np.float32)          # pixel-space: px ~ Hl @ ray
    Hm = (K @ np.array([0.25, 0.03, 0.01], np.float32)).astype(np.float32)
    depth = (rng.random((C, H, W), np.float32) * 0.5 + 3.0)
    normal = np.zeros((C, H, W, 3), np.float32)
    normal[..., 2] = -1.0
    X0 = np.zeros((H, W, 3), np.float32)
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    X0[..., 0] = (uu - W / 2) / (0.8 * W)
    X0[..., 1] = (vv - H / 2) / (0.8 * W)
    X0[..., 2] = 1.0
    den = np.einsum("chwk,hwk->chw", normal, X0) * depth
    inv_nd = np.where(np.abs(den) > 1e-12, 1.0 / den, 0.0).astype(np.float32)
    offs = np.stack(np.meshgrid(np.arange(-4, 5, 2), np.arange(-4, 5, 2)), -1).reshape(-1, 2)
    goff = np.concatenate([offs, np.zeros((T, 1))], -1).astype(np.float32) / (0.8 * W)
    w = rng.random((T, H, W), np.float32) * 0.5 + 0.5
    wtm = rng.normal(0, 0.2, (T, H, W)).astype(np.float32)
    sum_w = w.sum(0)
    norm_sq0 = (wtm * rng.normal(0, 0.2, (T, H, W))).sum(0).astype(np.float32) ** 2 + 0.01
    return dict(img=img, size=size, Hl=Hl, Hm=Hm, depth=depth, normal=normal,
                inv_nd=inv_nd, X0=X0, goff=goff, w=w, wtm=wtm, sum_w=sum_w,
                norm_sq0=norm_sq0)


# ----------------------------------------------------------------- v2 kernel
def _texel_kernel_v2(hl_ref, hm_ref, goff_ref, size_ref, img_ref,
                     depth_ref, nx_ref, ny_ref, nz_ref, invnd_ref,
                     x0a_ref, x0b_ref, x0c_ref, w_ref, wtm_ref,
                     num_ref, ssum_ref, ssq_ref, inb_ref,
                     *, n_rows, n_cols, nearest, wide, rowgather, tile_h=8):
    Hp, Wp = img_ref.shape
    t_step = pl.program_id(3)
    first = t_step == 0
    depth = depth_ref[0]
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
    TH = tile_h
    num_acc = jnp.zeros((TH, TILE_W), jnp.float32)
    ssum_acc = jnp.zeros((TH, TILE_W), jnp.float32)
    ssq_acc = jnp.zeros((TH, TILE_W), jnp.float32)
    ok_acc = jnp.ones((TH, TILE_W), jnp.bool_)
    n_blk = n_cols // 128
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
        px_v = jnp.where(zok, px, 1e9)
        py_v = jnp.where(zok, py, 1e9)
        if nearest:
            px = jnp.round(px)
        c0 = jnp.clip(jnp.min(px_v).astype(jnp.int32) - 8, 0, Wp - n_cols)
        c0 = pl.multiple_of(c0 & ~127, 128)
        r0 = jnp.clip(jnp.min(py_v).astype(jnp.int32) - 4, 0, Hp - n_rows)
        r0 = pl.multiple_of(r0 & ~7, 8)
        patch = img_ref[pl.ds(r0, n_rows), pl.ds(c0, n_cols)]
        lxf = px - c0.astype(jnp.float32)
        lyf = py - r0.astype(jnp.float32)
        lx = jnp.floor(lxf).astype(jnp.int32)
        ly = jnp.floor(lyf).astype(jnp.int32)
        fx = lxf - lx.astype(jnp.float32)
        fy = lyf - ly.astype(jnp.float32)
        if nearest:
            # px pre-rounded; fy handled by row blend below (2 rows)
            ok = ok & (lx >= 0) & (lx < n_cols) & (ly >= 0) & (ly < n_rows - 1)
            lx = jnp.clip(lx, 0, n_cols - 1)
        else:
            ok = ok & (lx >= 0) & (lx < n_cols - 1) & (ly >= 0) & (ly < n_rows - 1)
            lx = jnp.clip(lx, 0, n_cols - 2)
        ly = jnp.clip(ly, 0, n_rows - 2)
        lx1 = jnp.minimum(lx + 1, n_cols - 1)

        if rowgather.startswith("rroll"):
            # roll ROWS only (sublane roll; lane rolls are expensive), then a
            # short static row loop over the standard aligned col-blocks
            win_r = int(rowgather.split("-")[1])
            ly_min = jnp.min(jnp.where(ok, ly, n_rows - 2))
            rolled = pltpu.roll(patch, -ly_min, 0)
            ly2 = ly - ly_min
            ok = ok & (ly2 >= 0) & (ly2 < win_r - 1)
            ly2 = jnp.clip(ly2, 0, win_r - 2)
            blk = jnp.clip(lx >> 7, 0, n_blk - 1)
            blk1 = jnp.clip(lx1 >> 7, 0, n_blk - 1)
            loc = lx & 127
            loc1 = lx1 & 127
            bmask = [blk == b for b in range(n_blk)]
            bmask1 = [blk1 == b for b in range(n_blk)]
            v_top = jnp.zeros((TH, TILE_W), jnp.float32)
            v_bot = jnp.zeros((TH, TILE_W), jnp.float32)
            for r in range(win_r):
                row = rolled[r : r + 1, :]
                g_l = jnp.zeros((TH, TILE_W), jnp.float32)
                g_r = jnp.zeros((TH, TILE_W), jnp.float32)
                for b in range(n_blk):
                    t = jnp.broadcast_to(row[:, 128 * b : 128 * (b + 1)], (TH, TILE_W))
                    g_l = jnp.where(bmask[b], jnp.take_along_axis(t, loc, axis=1), g_l)
                    if not nearest:
                        g_r = jnp.where(bmask1[b], jnp.take_along_axis(t, loc1, axis=1), g_r)
                g = g_l if nearest else g_l * (1.0 - fx) + g_r * fx
                v_top = jnp.where(ly2 == r, g, v_top)
                v_bot = jnp.where(ly2 == r - 1, g, v_bot)
            if nearest:
                val = jnp.where(fy < 0.5, v_top, v_bot)
            else:
                val = v_top * (1.0 - fy) + v_bot * fy
            w_k = w_ref[kk]
            wtm_k = wtm_ref[kk]
            num_acc = num_acc + val * wtm_k
            ssum_acc = ssum_acc + val * w_k
            ssq_acc = ssq_acc + val * val * w_k
            ok_acc = ok_acc & ok
            continue

        if rowgather.startswith("roll"):
            # roll the patch so the active row/col window starts at 0, then
            # run SHORT static loops (win_r rows, win_c cols)
            win_r = int(rowgather.split("-")[1])
            win_c = int(rowgather.split("-")[2])
            ly_min = jnp.min(jnp.where(ok, ly, n_rows - 1))
            lx_min = jnp.min(jnp.where(ok, lx, n_cols - 1))
            rolled = pltpu.roll(patch, -ly_min, 0)
            rolled = pltpu.roll(rolled, -lx_min, 1)
            ly2 = ly - ly_min
            lx2 = lx - lx_min
            lx21 = lx2 + 1
            ok = ok & (ly2 >= 0) & (ly2 < win_r - 1) & (lx2 >= 0) & (lx2 < win_c - 1)
            ly2 = jnp.clip(ly2, 0, win_r - 2)
            lx2 = jnp.clip(lx2, 0, win_c - 2)
            lx21 = jnp.clip(lx21, 0, win_c - 1)
            n_blk2 = win_c // 128
            blk = jnp.clip(lx2 >> 7, 0, n_blk2 - 1)
            blk1 = jnp.clip(lx21 >> 7, 0, n_blk2 - 1)
            loc = lx2 & 127
            loc1 = lx21 & 127
            v_top = jnp.zeros((TH, TILE_W), jnp.float32)
            v_bot = jnp.zeros((TH, TILE_W), jnp.float32)
            for r in range(win_r):
                row = rolled[r : r + 1, :win_c]
                g_l = jnp.zeros((TH, TILE_W), jnp.float32)
                g_r = jnp.zeros((TH, TILE_W), jnp.float32)
                for b in range(n_blk2):
                    t = jnp.broadcast_to(row[:, 128 * b : 128 * (b + 1)], (TH, TILE_W))
                    g_l = jnp.where(blk == b, jnp.take_along_axis(t, loc, axis=1), g_l)
                    if not nearest:
                        g_r = jnp.where(blk1 == b, jnp.take_along_axis(t, loc1, axis=1), g_r)
                g = g_l if nearest else g_l * (1.0 - fx) + g_r * fx
                v_top = jnp.where(ly2 == r, g, v_top)
                v_bot = jnp.where(ly2 == r - 1, g, v_bot)
            if nearest:
                val = jnp.where(fy < 0.5, v_top, v_bot)
            else:
                val = v_top * (1.0 - fy) + v_bot * fy
            w_k = w_ref[kk]
            wtm_k = wtm_ref[kk]
            num_acc = num_acc + val * wtm_k
            ssum_acc = ssum_acc + val * w_k
            ssq_acc = ssq_acc + val * val * w_k
            ok_acc = ok_acc & ok
            continue

        def colgather(row384, idx):
            if wide:
                t = jnp.broadcast_to(row384, (TH, n_cols))
                return jnp.take_along_axis(t, idx, axis=1)
            blk = jnp.clip(idx >> 7, 0, n_blk - 1)
            loc = idx & 127
            g = jnp.zeros((TH, TILE_W), jnp.float32)
            for b in range(n_blk):
                t = jnp.broadcast_to(row384[:, 128 * b : 128 * (b + 1)], (TH, TILE_W))
                g = jnp.where(blk == b, jnp.take_along_axis(t, loc, axis=1), g)
            return g

        if rowgather == "axis0":
            gs = []
            for r in range(n_rows):
                row = patch[r : r + 1, :]
                if nearest:
                    gs.append(colgather(row, lx))
                else:
                    g_l = colgather(row, lx)
                    g_r = colgather(row, lx1)
                    gs.append(g_l * (1.0 - fx) + g_r * fx)
            stack = jnp.stack(gs, axis=0)          # (n_rows, 8, 128)
            v_top = jnp.take_along_axis(stack, ly[None], axis=0)[0]
            v_bot = jnp.take_along_axis(stack, jnp.minimum(ly + 1, n_rows - 1)[None], axis=0)[0]
            if nearest:
                val = jnp.where(fy < 0.5, v_top, v_bot)
            else:
                val = v_top * (1.0 - fy) + v_bot * fy
        else:
            v_top = jnp.zeros((TH, TILE_W), jnp.float32)
            v_bot = jnp.zeros((TH, TILE_W), jnp.float32)
            for r in range(n_rows):
                row = patch[r : r + 1, :]
                if nearest:
                    g = colgather(row, lx)
                else:
                    g_l = colgather(row, lx)
                    g_r = colgather(row, lx1)
                    g = g_l * (1.0 - fx) + g_r * fx
                v_top = jnp.where(ly == r, g, v_top)
                v_bot = jnp.where(ly == r - 1, g, v_bot)
            if nearest:
                val = jnp.where(fy < 0.5, v_top, v_bot)
            else:
                val = v_top * (1.0 - fy) + v_bot * fy
        w_k = w_ref[kk]
        wtm_k = wtm_ref[kk]
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


@functools.partial(jax.jit, static_argnames=("n_texels", "th_robust", "n_rows", "n_cols", "nearest", "wide", "rowgather", "tile_h"))
def score_view_v2(img, size, Hl, Hm, depth, normal, inv_nd, X0, goff, w, wtm,
                  sum_w, norm_sq0, n_texels, th_robust, n_rows, n_cols, nearest,
                  wide, rowgather, tile_h=8):
    C, H, W = depth.shape
    T = -(-n_texels // TEXEL_CHUNK) * TEXEL_CHUNK
    Hpad = -(-H // tile_h) * tile_h
    Wpad = -(-W // TILE_W) * TILE_W
    Hi = max(-(-img.shape[0] // tile_h) * tile_h, n_rows)
    Wi = max(-(-img.shape[1] // TILE_W) * TILE_W, n_cols)

    def pad_to(x, h, ww, axes):
        pads = [(0, 0)] * x.ndim
        pads[axes[0]] = (0, h - x.shape[axes[0]])
        pads[axes[1]] = (0, ww - x.shape[axes[1]])
        if any(p != (0, 0) for p in pads):
            x = jnp.pad(x, pads)
        return x

    img_p = pad_to(img, Hi, Wi, (0, 1))
    depth_p = pad_to(jnp.maximum(depth, 1e-6), Hpad, Wpad, (1, 2))
    nx = pad_to(normal[..., 0], Hpad, Wpad, (1, 2))
    ny = pad_to(normal[..., 1], Hpad, Wpad, (1, 2))
    nz = pad_to(normal[..., 2], Hpad, Wpad, (1, 2))
    invnd_p = pad_to(inv_nd, Hpad, Wpad, (1, 2))
    x0a = pad_to(X0[..., 0], Hpad, Wpad, (0, 1))
    x0b = pad_to(X0[..., 1], Hpad, Wpad, (0, 1))
    x0c = pad_to(X0[..., 2], Hpad, Wpad, (0, 1))
    w_p = pad_to(w, Hpad, Wpad, (1, 2))
    wtm_p = pad_to(wtm, Hpad, Wpad, (1, 2))
    hl_s = Hl.reshape(1, 9).astype(jnp.float32)
    hm_s = Hm.reshape(1, 3).astype(jnp.float32)
    goff_s = goff.reshape(1, 3 * T).astype(jnp.float32)
    size_s = size.reshape(1, 2).astype(jnp.float32)
    grid = (C, Hpad // tile_h, Wpad // TILE_W, T // TEXEL_CHUNK)
    im_c = lambda c, i, j, t: (c, i, j)
    im_hw = lambda c, i, j, t: (i, j)
    im_wt = lambda c, i, j, t: (t, i, j)
    im_const = lambda c, i, j, t: (0, 0)
    out_shapes = [jax.ShapeDtypeStruct((C, Hpad, Wpad), jnp.float32)] * 4
    kern = functools.partial(_texel_kernel_v2, n_rows=n_rows, n_cols=n_cols,
                             nearest=nearest, wide=wide, rowgather=rowgather,
                             tile_h=tile_h)
    num, ssum, ssq, inbf = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            pl.BlockSpec(hl_s.shape, im_const, memory_space=pltpu.SMEM),
            pl.BlockSpec(hm_s.shape, im_const, memory_space=pltpu.SMEM),
            pl.BlockSpec(goff_s.shape, im_const, memory_space=pltpu.SMEM),
            pl.BlockSpec(size_s.shape, im_const, memory_space=pltpu.SMEM),
            pl.BlockSpec((Hi, Wi), lambda c, i, j, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, TILE_W), im_c, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, TILE_W), im_c, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, TILE_W), im_c, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, TILE_W), im_c, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, TILE_W), im_c, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, TILE_W), im_hw, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, TILE_W), im_hw, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, TILE_W), im_hw, memory_space=pltpu.VMEM),
            pl.BlockSpec((TEXEL_CHUNK, tile_h, TILE_W), im_wt, memory_space=pltpu.VMEM),
            pl.BlockSpec((TEXEL_CHUNK, tile_h, TILE_W), im_wt, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tile_h, TILE_W), im_c, memory_space=pltpu.VMEM)] * 4,
    )(hl_s, hm_s, goff_s, size_s, img_p, depth_p, nx, ny, nz, invnd_p,
      x0a, x0b, x0c, w_p, wtm_p)
    num = num[:, :H, :W]
    ssum = ssum[:, :H, :W]
    ssq = ssq[:, :H, :W]
    inb = inbf[:, :H, :W] > 0.5
    norm_sq1 = ssq - ssum * ssum / jnp.maximum(sum_w[None], 1e-12)
    nrm_sq = norm_sq0[None] * norm_sq1
    ncc = jnp.clip(num * jax.lax.rsqrt(jnp.maximum(nrm_sq, 1e-30)), -1.0, 1.0)
    score = 1.0 - ncc
    return jnp.where((nrm_sq <= 1e-16) | ~inb, th_robust, score), inb


def _sync(out):
    x = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(x[0, :1, :1])  # force full execution (block_until_ready no-ops)


def bench(fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
        _sync(out)
    return (time.time() - t0) / n, out


def main():
    tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
    ins = make_inputs()
    with jax.default_device(tpu):
        put = {k: jnp.asarray(v) for k, v in ins.items()}
        args = (put["img"], put["size"], put["Hl"], put["Hm"], put["depth"],
                put["normal"], put["inv_nd"], put["X0"], put["goff"], put["w"],
                put["wtm"], put["sum_w"], put["norm_sq0"])

        from openmvs_tpu.ops.pm_kernel import score_view_pallas
        t1, out1 = bench(score_view_pallas, *args, n_texels=25, th_robust=1.2)
        s1 = np.asarray(out1[0] if isinstance(out1, tuple) else out1)
        print(f"v1 (24x384 aligned blkloop bilinear): {t1*1e3:.1f} ms "
              f"scored={float((s1 < 1.19).mean()):.4f}", flush=True)

        variants = [
            (24, 384, False, "loop", 8),
            (32, 384, False, "loop", 16),
            (48, 384, False, "loop", 32),
            (48, 384, True,  "loop", 32),
            (80, 384, False, "loop", 64),
            (32, 384, True,  "loop", 16),
        ]
        for (nr, nc, nn_, rg, th_) in variants:
            try:
                t2, out2 = bench(score_view_v2, *args, n_texels=25, th_robust=1.2,
                                 n_rows=nr, n_cols=nc, nearest=nn_, wide=False,
                                 rowgather=rg, tile_h=th_)
            except Exception as e:
                print(f"v2 ({nr}x{nc} nn={nn_} rg={rg} th={th_}): FAILED {repr(e)[:200]}", flush=True)
                continue
            s2 = np.asarray(out2[0])
            both = (s1 < 1.19) & (s2 < 1.19)
            agree = np.abs(s1 - s2)[both]
            inp = float(np.asarray(out2[1]).mean())
            print(f"v2 ({nr}x{nc} nn={nn_} rg={rg} th={th_}): {t2*1e3:.1f} ms  "
                  f"in-patch={inp:.4f} max|d|={agree.max() if agree.size else 0:.2e}", flush=True)


if __name__ == "__main__":
    main()
