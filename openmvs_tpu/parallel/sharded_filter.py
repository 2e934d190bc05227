"""Sharded cross-view depth-map filtering (the "filter" stage on the mesh).

Device-side equivalent of the pass-3 cross-view filter in
``densify.dense_reconstruction`` (the bAdjust branch of FilterDepthMap,
reference SceneDensify.cpp:1050-1217): every reference view gets each
neighbor's depth map splatted into its frame (z-buffered, 4-texel splat,
SceneDensify.cpp:1066-1135) and then a confidence-weighted agree/disagree
reduction (Merrell'07 style).

Mesh layout (same ("views", "tile") mesh as ``parallel.sharded``):

- ``views`` axis: each device owns a shard of reference views (their
  projected buffers and the final adjust reduction).
- ``tile`` axis: SOURCE depth-map rows are sharded; each device splats its
  row-shard of every source view into full-size partial z-buffers, which
  combine with a single ``pmin`` all-reduce (depth) + ``pmax`` (winner
  confidence) over ICI.  This is the natural TPU shape of the reference's
  per-pixel z-buffer races (it serializes them under one mutex-free loop
  because it is single-threaded per view pair).

Neighbor maps are exchanged with ONE ``all_gather`` over the views axis per
filter call; everything after that is local math + the two tile reductions.

Numerics: device math is float32 (the host path projects in float64), so a
tiny fraction of pixels whose projection rounds across a pixel boundary or
whose agree test sits exactly at threshold may differ from the host filter;
the dryrun asserts >99% agreement.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from openmvs_tpu.config import DenseOptions

_INF = jnp.float32(jnp.inf)


def _splat_zbuf(d, px, py, z, ok, h_r, w_r, Wmax, HW):
    """Partial z-buffer (HW+1,) + splat records for the conf pass.

    Mirrors filters.project_depth_to_view: each source depth writes its
    reference-frame depth onto the 4 texels around its projection; nearest
    z wins.  Returns (zbuf, [(lin, zval, ok4), ...]).
    """
    fx = jnp.floor(px).astype(jnp.int32)
    fy = jnp.floor(py).astype(jnp.int32)
    zbuf = jnp.full((HW + 1,), _INF, jnp.float32)
    recs = []
    zf = z.astype(jnp.float32)
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        ax = fx + dx
        ay = fy + dy
        ok4 = ok & (ax >= 0) & (ax < w_r) & (ay >= 0) & (ay < h_r)
        lin = jnp.where(ok4, ay * Wmax + ax, HW).reshape(-1)
        zv = jnp.where(ok4, zf, _INF).reshape(-1)
        zbuf = zbuf.at[lin].min(zv)
        recs.append((lin, zv))
    return zbuf, recs


def _adjust_local(depth, conf, projs_d, projs_c, d_min, d_max, nb_present,
                  opts: DenseOptions):
    """Elementwise Merrell-style adjust (filters.filter_depth_adjust, f32)."""
    th = jnp.float32(opts.depth_diff_threshold * 1.2)
    valid = depth > 0
    pos_conf = jnp.where(valid, conf, 0.0)
    avg_depth = depth * pos_conf
    neg_conf = jnp.zeros_like(pos_conf)
    n_pos = jnp.zeros(depth.shape, jnp.int32)
    n_seen = jnp.zeros(depth.shape, jnp.int32)
    for d_proj, c_proj in zip(projs_d, projs_c):
        has = d_proj > 0
        agree = has & (jnp.abs(depth - d_proj) < th * depth)
        n_seen = n_seen + has.astype(jnp.int32)
        avg_depth = avg_depth + jnp.where(agree, d_proj * c_proj, 0.0)
        pos_conf = pos_conf + jnp.where(agree, c_proj, 0.0)
        n_pos = n_pos + agree.astype(jnp.int32)
        neg_conf = neg_conf + jnp.where(has & ~agree, c_proj, 0.0)
    avg = avg_depth / jnp.maximum(pos_conf, 1e-12)
    keep = (valid
            & (n_seen >= opts.min_views_filter)
            & (n_pos >= opts.min_views_filter_adjust)
            & (pos_conf > neg_conf)
            & (avg >= d_min) & (avg <= d_max))
    new_d = jnp.where(keep, avg, 0.0).astype(jnp.float32)
    new_c = jnp.where(keep, pos_conf - neg_conf, 0.0).astype(jnp.float32)
    # a view with too few neighbor maps is passed through unchanged
    # (densify pass-3: len(projected) < min_views_filter)
    enough = nb_present >= opts.min_views_filter
    return jnp.where(enough, new_d, depth), jnp.where(enough, new_c, conf)


def filter_views_sharded(results: Dict[int, "DepthMapResult"],
                         opts: DenseOptions, mesh: Mesh,
                         skip_ids=()) -> Dict[int, "DepthMapResult"]:
    """Cross-view adjust filter of ALL depth maps over the device mesh.

    ``results``: {image_id: DepthMapResult} as produced by estimation.
    Returns a new dict with filtered depth/conf (adjust mode only; the
    strict mode stays on the host path).  Views in ``skip_ids`` pass
    through untouched (resume semantics) but still contribute as
    projection SOURCES, exactly like the host pass-3 loop.
    """
    ids = sorted(results)
    if all(rid in skip_ids for rid in ids):
        return dict(results)
    n_views_axis, n_tile = mesh.devices.shape
    V = len(ids)
    Vpad = -(-V // n_views_axis) * n_views_axis
    idx_of = {rid: i for i, rid in enumerate(ids)}

    Hmax = max(results[rid].depth.shape[0] for rid in ids)
    Wmax = max(results[rid].depth.shape[1] for rid in ids)
    Hpad = -(-Hmax // n_tile) * n_tile
    NB = max(1, max(sum(1 for nb in results[rid].neighbor_ids
                        if nb in idx_of) for rid in ids))

    depth_s = np.zeros((Vpad, Hpad, Wmax), np.float32)
    conf_s = np.zeros((Vpad, Hpad, Wmax), np.float32)
    sizes = np.zeros((Vpad, 2), np.int32)
    dmm = np.zeros((Vpad, 2), np.float32)
    nbr = np.full((Vpad, NB), -1, np.int32)
    A = np.zeros((Vpad, NB, 3, 3), np.float32)
    B = np.zeros((Vpad, NB, 3), np.float32)
    for i, rid in enumerate(ids):
        r = results[rid]
        h, w = r.depth.shape
        depth_s[i, :h, :w] = r.depth
        conf_s[i, :h, :w] = (r.conf if r.conf is not None
                             else (r.depth > 0).astype(np.float32))
        sizes[i] = (h, w)
        dmm[i] = (r.d_min, r.d_max)
        KRr = r.camera.K @ r.camera.R           # float64 on host
        s = 0
        for nb_id in r.neighbor_ids:
            j = idx_of.get(nb_id)
            if j is None:
                continue
            cj = results[nb_id].camera
            nbr[i, s] = j
            A[i, s] = (KRr @ cj.R.T @ cj.Kinv).astype(np.float32)
            B[i, s] = (KRr @ (cj.C - r.camera.C)).astype(np.float32)
            s += 1

    HW = Hpad * Wmax
    Vloc = Vpad // n_views_axis
    hloc = Hpad // n_tile
    sizes_j = jnp.asarray(sizes)                # replicated

    def fn(depth_d, conf_d, sizes_loc, dmm_loc, nbr_loc, A_loc, B_loc):
        # gather every view's row-shard of depth+conf: (Vpad, hloc, Wmax)
        src_d = jax.lax.all_gather(depth_d, "views", axis=0, tiled=True)
        src_c = jax.lax.all_gather(conf_d, "views", axis=0, tiled=True)
        ti = jax.lax.axis_index("tile")
        row0 = (ti * hloc).astype(jnp.float32)
        yy = (jax.lax.broadcasted_iota(jnp.float32, (hloc, Wmax), 0) + row0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (hloc, Wmax), 1)

        zbufs, recs_all, cs_all = [], [], []
        for r in range(Vloc):
            h_r, w_r = sizes_loc[r, 0], sizes_loc[r, 1]
            for s in range(NB):
                j = nbr_loc[r, s]
                jj = jnp.maximum(j, 0)
                d = jnp.take(src_d, jj, axis=0)
                c = jnp.take(src_c, jj, axis=0)
                h_j = jnp.take(sizes_j[:, 0], jj)
                w_j = jnp.take(sizes_j[:, 1], jj)
                ok = ((j >= 0) & (d > 0)
                      & (yy < h_j.astype(jnp.float32))
                      & (xx < w_j.astype(jnp.float32)))
                a = A_loc[r, s]
                b = B_loc[r, s]
                p0 = b[0] + d * (a[0, 0] * xx + a[0, 1] * yy + a[0, 2])
                p1 = b[1] + d * (a[1, 0] * xx + a[1, 1] * yy + a[1, 2])
                p2 = b[2] + d * (a[2, 0] * xx + a[2, 1] * yy + a[2, 2])
                front = ok & (p2 > 0)
                zsafe = jnp.where(front, p2, 1.0)
                px = p0 / zsafe
                py = p1 / zsafe
                zbuf, recs = _splat_zbuf(d, px, py, p2, front, h_r, w_r,
                                         Wmax, HW)
                zbufs.append(zbuf)
                recs_all.append(recs)
                cs_all.append(c.reshape(-1))
        zb = jnp.stack(zbufs)                       # (Vloc*NB, HW+1)
        zb = jax.lax.pmin(zb, "tile")               # global z-buffers
        cb = jnp.zeros_like(zb)
        for k, recs in enumerate(recs_all):
            cbk = cb[k]
            for lin, zv in recs:
                win = zb[k][lin] == zv
                cbk = cbk.at[lin].max(jnp.where(win, cs_all[k], 0.0))
            cb = cb.at[k].set(cbk)
        cb = jax.lax.pmax(cb, "tile")

        # adjust reduce on this device's (view, row) shard
        lo = ti * hloc
        out_d = []
        out_c = []
        k = 0
        for r in range(Vloc):
            projs_d, projs_c = [], []
            nb_present = jnp.sum((nbr_loc[r] >= 0).astype(jnp.int32))
            for s in range(NB):
                zmap = zb[k][:HW].reshape(Hpad, Wmax)
                zmap = jnp.where(jnp.isfinite(zmap), zmap, 0.0)
                cmap = cb[k][:HW].reshape(Hpad, Wmax)
                projs_d.append(jax.lax.dynamic_slice(
                    zmap, (lo, 0), (hloc, Wmax)))
                projs_c.append(jax.lax.dynamic_slice(
                    cmap, (lo, 0), (hloc, Wmax)))
                k += 1
            nd, nc = _adjust_local(depth_d[r], conf_d[r], projs_d, projs_c,
                                   dmm_loc[r, 0], dmm_loc[r, 1],
                                   nb_present, opts)
            out_d.append(nd)
            out_c.append(nc)
        return jnp.stack(out_d), jnp.stack(out_c)

    spec_map = P("views", "tile", None)
    spec_v = P("views", None)
    fn_sh = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(spec_map, spec_map, spec_v, spec_v, spec_v,
                  P("views", None, None, None), P("views", None, None)),
        out_specs=(spec_map, spec_map),
        check_vma=False,
    )
    new_d, new_c = jax.jit(fn_sh)(
        jnp.asarray(depth_s), jnp.asarray(conf_s), jnp.asarray(sizes),
        jnp.asarray(dmm), jnp.asarray(nbr), jnp.asarray(A), jnp.asarray(B))
    new_d = np.asarray(new_d)
    new_c = np.asarray(new_c)

    out = dict(results)
    for i, rid in enumerate(ids):
        if rid in skip_ids:
            continue
        r = results[rid]
        h, w = r.depth.shape
        out[rid] = dataclasses.replace(
            r, depth=new_d[i, :h, :w], conf=new_c[i, :h, :w])
    return out
