"""Variational photometric mesh refinement.

Equivalent of Scene::RefineMesh (libs/MVS/SceneRefine.cpp:1279-1422,
Vu/Keriven'12): coarse-to-fine scales; per iteration the mesh is rasterized
into each view, neighbor images are warped through the surface into the
reference view, and the photo-consistency (ZNCC) energy plus Laplacian
rigidity drives vertex movement.

TPU-native design: gradients are hand-derived like the reference's
(ComputePhotometricGradient, SceneRefine.cpp:161-175) — autodiff is applied
only to the gather-free windowed-ZNCC tail; the bilinear derivative is the
exact interpolant gradient and the projective/barycentric chain rule is
explicit (_pair_energy_grad_manual, validated against jax.grad of the full
energy on CPU to 8e-6).  This keeps the whole step on the TPU: large fused
gather autodiff graphs miscompile on this backend.  Rasterization runs
natively per iteration and its (face id, barycentric) maps are constants
within the step — the reference's "fixed visibility per iteration"
assumption.  Stacked pairs are vmapped, and on multi-device systems the
pair axis shards over a 1-D jax Mesh (GSPMD inserts the gradient
all-reduce), replacing the reference's EventThreadPool pair queue; 4
plain-GD iterations (the reference update rule, SceneRefine.cpp:1385-1411,
with pair-averaged photometric gradients) run on device per host
re-rasterization round-trip.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openmvs_tpu import native
from openmvs_tpu.config import RefineOptions
from openmvs_tpu.scene import Mesh, Scene
from openmvs_tpu.utils.log import get_logger, timed

log = get_logger("refine")


# ------------------------------------------------------------------ geometry
def _project_np(cam, verts: np.ndarray) -> np.ndarray:
    Xc = (verts - cam.C) @ cam.R.T
    uv = Xc @ cam.K.T
    with np.errstate(divide="ignore", invalid="ignore"):
        u = uv[:, 0] / np.maximum(uv[:, 2], 1e-12)
        v = uv[:, 1] / np.maximum(uv[:, 2], 1e-12)
    return np.stack([u, v, Xc[:, 2]], axis=-1)


def subdivide_to_area(mesh: Mesh, scene: Scene, max_area: float, max_rounds: int = 4) -> Mesh:
    """Midpoint-subdivide faces whose max projected area exceeds max_area px
    (SubdivideMesh role, SceneRefine.cpp:1291-1307)."""
    v = mesh.vertices.astype(np.float64)
    f = mesh.faces.astype(np.int64)
    # geometric-outlier faces (edges far beyond the median, i.e. the junk
    # rim triangles every graph-cut reconstruction carries at the scene
    # border) are never subdivided: their midpoints would land far off the
    # surface and refinement cannot recover barely-observed geometry
    el = np.linalg.norm(v[f[:, 0]] - v[f[:, 1]], axis=1)
    med_el = float(np.median(el)) if len(el) else 0.0
    for _ in range(max_rounds):
        emax = np.maximum(
            np.linalg.norm(v[f[:, 0]] - v[f[:, 1]], axis=1),
            np.maximum(np.linalg.norm(v[f[:, 1]] - v[f[:, 2]], axis=1),
                       np.linalg.norm(v[f[:, 2]] - v[f[:, 0]], axis=1)))
        area = np.zeros(len(f))
        for img in scene.images:
            pr = _project_np(img.working_camera(), v)
            a = pr[f[:, 0], :2]
            b = pr[f[:, 1], :2]
            c = pr[f[:, 2], :2]
            ar = 0.5 * np.abs((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
                              - (c[:, 0] - a[:, 0]) * (b[:, 1] - a[:, 1]))
            z = pr[f].min(axis=1)[:, 2]
            ar[z <= 0] = 0
            area = np.maximum(area, ar)
        split = (area > max_area) & (emax <= 4.0 * med_el)
        if not split.any():
            break
        # CONFORMING midpoint subdivision (red-green): every edge of a
        # marked face gets a midpoint; unmarked faces sharing split edges
        # are bisected to match (1 split edge -> 2 faces, 2 -> 3), so no
        # T-vertices/cracks appear.  Cracks are not merely cosmetic here:
        # their half-edges are single-sided, so _vertex_boundary would flag
        # interior seam vertices as boundary and DISABLE smoothing exactly
        # where the photometric term is noisiest.
        edges: Dict[Tuple[int, int], int] = {}
        vlist: List[np.ndarray] = []
        nv0 = len(v)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in edges:
                edges[key] = nv0 + len(vlist)
                vlist.append(0.5 * (v[a] + v[b]))
            return edges[key]

        for fi in np.nonzero(split)[0]:
            a, b, c = f[fi]
            midpoint(a, b), midpoint(b, c), midpoint(c, a)
        new_faces = []
        for fi in range(len(f)):
            a, b, c = f[fi]
            if split[fi]:
                ab = edges[(min(a, b), max(a, b))]
                bc = edges[(min(b, c), max(b, c))]
                ca = edges[(min(c, a), max(c, a))]
                new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc),
                              (ab, bc, ca)]
                continue
            vs = (a, b, c)
            # ms[i] = midpoint of the edge OPPOSITE vs[i], if split
            ms = (edges.get((min(b, c), max(b, c))),
                  edges.get((min(c, a), max(c, a))),
                  edges.get((min(a, b), max(a, b))))
            k = sum(m is not None for m in ms)
            if k == 0:
                new_faces.append(vs)
            elif k == 3:
                new_faces += [(a, ms[2], ms[1]), (b, ms[0], ms[2]),
                              (c, ms[1], ms[0]), (ms[2], ms[0], ms[1])]
            elif k == 1:
                i = next(j for j in range(3) if ms[j] is not None)
                A, B, C = vs[i], vs[(i + 1) % 3], vs[(i + 2) % 3]
                m = ms[i]
                new_faces += [(A, B, m), (A, m, C)]
            else:  # k == 2: unsplit edge is opposite vs[i]
                i = next(j for j in range(3) if ms[j] is None)
                A, B, C = vs[i], vs[(i + 1) % 3], vs[(i + 2) % 3]
                mAB = ms[(i + 2) % 3]
                mCA = ms[(i + 1) % 3]
                new_faces += [(A, mAB, mCA), (mAB, B, C), (mAB, C, mCA)]
        if vlist:
            v = np.concatenate([v, np.asarray(vlist)], axis=0)
        f = np.asarray(new_faces, np.int64)
    return Mesh(vertices=v.astype(np.float32), faces=f.astype(np.int32))


def _vertex_adjacency(faces: np.ndarray, nv: int, max_deg: int = 12):
    """(nv, max_deg) padded one-ring vertex ids (-1 pad) + degree."""
    nbr = [[] for _ in range(nv)]
    for a, b, c in faces:
        for x, y in ((a, b), (b, c), (c, a)):
            if y not in nbr[x]:
                nbr[x].append(y)
            if x not in nbr[y]:
                nbr[y].append(x)
    out = np.full((nv, max_deg), -1, np.int32)
    deg = np.zeros(nv, np.int32)
    for i, ns in enumerate(nbr):
        m = min(len(ns), max_deg)
        out[i, :m] = ns[:m]
        deg[i] = m
    return out, deg


def _vertex_boundary(faces: np.ndarray, nv: int) -> np.ndarray:
    """(nv,) bool: vertices on an open mesh border (edges used by only one
    face) — excluded from smoothing like the reference's vertexBoundary
    (SceneRefine.cpp:968)."""
    from openmvs_tpu.mesh_ops import edges_of_faces

    boundary = np.zeros(nv, bool)
    if len(faces) == 0:
        return boundary
    _, uniq, inv = edges_of_faces(np.asarray(faces))
    border = uniq[np.bincount(inv) == 1]
    boundary[border.ravel()] = True
    return boundary


def _collapse_vertices(verts: np.ndarray, faces: np.ndarray,
                       adj: np.ndarray, deg: np.ndarray, kill: np.ndarray):
    """Remove `kill` vertices by collapsing each into its nearest surviving
    one-ring neighbor (Mesh::Decimate(vertexRemove) role).  Returns
    (new_faces reindexed, remap old->new with -1 removed) or (None, None)
    if nothing could be collapsed."""
    nv = len(verts)
    target = np.arange(nv)
    for v in np.nonzero(kill)[0]:
        ring = adj[v, : deg[v]]
        ring = ring[ring >= 0]
        ring = ring[~kill[ring]]
        if len(ring) == 0:
            continue
        d = np.linalg.norm(verts[ring] - verts[v], axis=1)
        target[v] = ring[np.argmin(d)]
    if (target == np.arange(nv)).all():
        return None, None
    f2 = target[faces]
    good = ((f2[:, 0] != f2[:, 1]) & (f2[:, 1] != f2[:, 2])
            & (f2[:, 0] != f2[:, 2]))
    f2 = f2[good]
    # multiple faces can collapse onto the same vertex triple; duplicated
    # faces would double-count half-edges and hide real open borders from
    # _vertex_boundary's single-use edge test — dedup on the sorted triple,
    # keeping the first occurrence (preserves orientation)
    key = np.sort(f2, axis=1)
    _, first = np.unique(key, axis=0, return_index=True)
    f2 = f2[np.sort(first)]
    used = np.zeros(nv, bool)
    used[f2.reshape(-1)] = True
    remap = np.full(nv, -1, np.int64)
    remap[used] = np.arange(int(used.sum()))
    return remap[f2].astype(faces.dtype), remap


# ------------------------------------------------------------------ energy
class PairData(NamedTuple):
    """Per (reference view A, neighbor B) constants for one scale."""

    imgA: jnp.ndarray      # (H, W)
    imgB: jnp.ndarray      # (Hb, Wb)
    face_vid: jnp.ndarray  # (H, W, 3) vertex ids of the face under each pixel
    bary: jnp.ndarray      # (H, W, 3)
    mask: jnp.ndarray      # (H, W) valid surface pixels
    KA_R: jnp.ndarray      # (3, 3) K_A R_A
    KA_t: jnp.ndarray      # (3,)
    KB_R: jnp.ndarray
    KB_t: jnp.ndarray
    sizeB: jnp.ndarray     # (2,) valid (Hb, Wb) of imgB (imgB may be padded)
    CA: jnp.ndarray        # (3,) camera-A center (world) for the grazing cull
    reg_scale: jnp.ndarray  # () avgDepthA*avgDepthB/(fA*fB): pixel-footprint
    #                         world area (the reference RegularizationScale,
    #                         SceneRefine.cpp:1169) converting per-pixel
    #                         gradient density into world units
    fid: Optional[jnp.ndarray] = None  # (H, W) int32 rasterized face id
    #                         (-1 = none).  When present, the gradient
    #                         scatter runs the 2-stage per-FACE path (1
    #                         scatter index/pixel, 10-wide contiguous rows)
    #                         measured 2.1x faster than the per-vertex
    #                         3-index scatter on this TPU
    #                         (scripts/dev_refine_steady.py, round 5)


class PairStatic(NamedTuple):
    """Per-pair constants that never change within one scale (images,
    cameras) — uploaded ONCE; the per-refresh upload is PairRaster only
    (a tunneled backend pays per-byte: re-sending the images with every
    re-rasterization was ~70% of refine's host->device traffic)."""

    imgA: jnp.ndarray      # (H, W)
    imgB: jnp.ndarray      # (Hb, Wb)
    KA_R: jnp.ndarray      # (3, 3)
    KA_t: jnp.ndarray      # (3,)
    KB_R: jnp.ndarray
    KB_t: jnp.ndarray
    sizeB: jnp.ndarray     # (2,)
    CA: jnp.ndarray        # (3,)


class PairRaster(NamedTuple):
    """Per-pair rasterization results (change when vertices move): the
    minimal wire format — face id + 2 barycentrics; the device
    reconstructs face_vid = faces[fid], mask = fid >= 0, b2 = 1-b0-b1."""

    fid: jnp.ndarray       # (H, W) int32, -1 = no surface
    bary2: jnp.ndarray     # (H, W, 2) float32
    reg_scale: jnp.ndarray  # ()


def _assemble_pair_data(statics: PairStatic, rasters: PairRaster,
                        faces: jnp.ndarray) -> PairData:
    """Rebuild the stacked PairData in-graph from the split upload."""
    fid = rasters.fid
    mask = fid >= 0
    face_vid = faces[jnp.maximum(fid, 0)]                  # (P, H, W, 3)
    b01 = rasters.bary2
    bary = jnp.concatenate(
        [b01, (1.0 - b01[..., 0] - b01[..., 1])[..., None]], axis=-1)
    return PairData(
        imgA=statics.imgA, imgB=statics.imgB, face_vid=face_vid, bary=bary,
        mask=mask, KA_R=statics.KA_R, KA_t=statics.KA_t, KB_R=statics.KB_R,
        KB_t=statics.KB_t, sizeB=statics.sizeB, CA=statics.CA,
        reg_scale=rasters.reg_scale, fid=fid)


def _bilinear(img, x, y):
    Hp, Wp = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    xi = jnp.clip(x0.astype(jnp.int32), 0, Wp - 2)
    yi = jnp.clip(y0.astype(jnp.int32), 0, Hp - 2)
    flat = img.reshape(-1)
    idx = yi * Wp + xi
    v00 = jnp.take(flat, idx, mode="clip")
    v01 = jnp.take(flat, idx + 1, mode="clip")
    v10 = jnp.take(flat, idx + Wp, mode="clip")
    v11 = jnp.take(flat, idx + Wp + 1, mode="clip")
    return (v00 * (1 - fx) + v01 * fx) * (1 - fy) + (v10 * (1 - fx) + v11 * fx) * fy


def _bilinear_g(img, x, y):
    """Bilinear sample + the EXACT spatial derivatives of the interpolant
    (same 4 taps).  Used by the hand-derived gradient path: matches what
    autodiff of _bilinear would produce, to float precision."""
    Hp, Wp = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    xi = jnp.clip(x0.astype(jnp.int32), 0, Wp - 2)
    yi = jnp.clip(y0.astype(jnp.int32), 0, Hp - 2)
    flat = img.reshape(-1)
    idx = yi * Wp + xi
    v00 = jnp.take(flat, idx, mode="clip")
    v01 = jnp.take(flat, idx + 1, mode="clip")
    v10 = jnp.take(flat, idx + Wp, mode="clip")
    v11 = jnp.take(flat, idx + Wp + 1, mode="clip")
    v = (v00 * (1 - fx) + v01 * fx) * (1 - fy) + (v10 * (1 - fx) + v11 * fx) * fy
    gx = (v01 - v00) * (1 - fy) + (v11 - v10) * fy
    gy = (v10 - v00) * (1 - fx) + (v11 - v01) * fx
    return v, gx, gy


def _warp_coords(verts: jnp.ndarray, pd: PairData):
    """A-pixel -> B-image coordinates through the surface, + validity.

    The 3-element contractions are unrolled to elementwise VPU math instead
    of einsum: XLA lowers tiny einsums onto the MXU at default (reduced)
    precision, which costs ~0.1 px of warp accuracy on TPU."""
    P = verts[pd.face_vid]                   # (H, W, 3, 3)
    X = (pd.bary[..., 0, None] * P[..., 0, :]
         + pd.bary[..., 1, None] * P[..., 1, :]
         + pd.bary[..., 2, None] * P[..., 2, :])
    R = pd.KB_R
    XB = jnp.stack(
        [R[a, 0] * X[..., 0] + R[a, 1] * X[..., 1] + R[a, 2] * X[..., 2]
         + pd.KB_t[a] for a in range(3)],
        axis=-1,
    )
    zb = XB[..., 2]
    ok = pd.mask & (zb > 1e-6)
    izb = jnp.where(ok, 1.0 / jnp.where(ok, zb, 1.0), 0.0)
    xb = XB[..., 0] * izb
    yb = XB[..., 1] * izb
    ok = ok & (xb >= 1) & (xb <= pd.sizeB[1] - 2) & (yb >= 1) & (yb <= pd.sizeB[0] - 2)
    # grazing-angle cull (SceneRefine.cpp:926-929, orientation-agnostic):
    # pixels whose face is nearly edge-on to the A-ray carry an unstable
    # projection Jacobian and mostly gradient noise
    e1 = P[..., 1, :] - P[..., 0, :]
    e2 = P[..., 2, :] - P[..., 0, :]
    N = jnp.cross(e1, e2)
    dA = X - pd.CA
    nd = jnp.abs(jnp.sum(N * dA, axis=-1))
    nrm = jnp.sqrt(jnp.sum(N * N, axis=-1) * jnp.sum(dA * dA, axis=-1)) + 1e-20
    ok = ok & (nd > 0.1 * nrm)
    return xb, yb, izb, ok


import os as _os_box

_BOX_MODE = _os_box.environ.get("OMVS_REFINE_BOX", "cumsum")


def _box_zncc_energy(A: jnp.ndarray, B: jnp.ndarray, M: jnp.ndarray,
                     half: int = 3) -> jnp.ndarray:
    """1 - windowed ZNCC(A, B), mean over valid pixels; (2*half+1)^2 box
    windows (ComputeLocalZNCC role, SceneRefine.cpp:161-164).

    Two gather-free, autodiff-safe box implementations (identical values:
    zero-padded shifted-slice sums == border-clipped prefix sums):
    "cumsum" (default) — prefix sums + static takes;
    "shift" (OMVS_REFINE_BOX=shift) — 2*(2*half+1) static slice adds.
    A/B on chip at the bench-leg shapes (round 5): cumsum 134.6 vs shift
    154.9 ms/iter — the log-pass cumsum beats the 14-slice add chain here,
    the opposite of the pre-measurement guess."""
    if _BOX_MODE == "shift":
        def box(x):
            for axis in (0, 1):
                n = x.shape[axis]
                pads = [(0, 0)] * x.ndim
                pads[axis] = (half, half)
                xp = jnp.pad(x, pads)
                x = sum(jax.lax.slice_in_dim(xp, k, k + n, axis=axis)
                        for k in range(2 * half + 1))
            return x
    else:
        def box(x):
            # out[i] = S[min(i+h+1, N)] - S[max(i-h, 0)] with S = [0, cumsum]
            for axis in (0, 1):
                n = x.shape[axis]
                c = jnp.cumsum(x, axis=axis)
                zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=axis))
                S = jnp.concatenate([zero, c], axis=axis)      # length n+1
                hi = jnp.clip(np.arange(n) + half + 1, 0, n)
                lo = jnp.clip(np.arange(n) - half, 0, n)
                x = jnp.take(S, hi, axis=axis) - jnp.take(S, lo, axis=axis)
            return x

    n = jnp.maximum(box(M), 1.0)
    mA = box(A * M) / n
    mB = box(B * M) / n
    cAB = box(A * B * M) / n - mA * mB
    vA = box(A * A * M) / n - mA * mA
    vB = box(B * B * M) / n - mB * mB
    ncc = cAB * jax.lax.rsqrt(jnp.maximum(vA * vB, 1e-12))
    # texture-reliability weight (SceneRefine.cpp:890-893): low-variance
    # (textureless) windows contribute ~zero score AND ~zero gradient,
    # instead of ZNCC noise; treated as a constant weight like the reference
    minv = jax.lax.stop_gradient(jnp.minimum(vA, vB))
    rf = minv / (minv + 0.0015)
    score = jnp.where(M > 0, rf * (1.0 - jnp.clip(ncc, -1.0, 1.0)), 0.0)
    return jnp.sum(score) / jnp.maximum(jnp.sum(M), 1.0)


def _pair_energy(verts: jnp.ndarray, pd: PairData, half: int = 3) -> jnp.ndarray:
    """1 - ZNCC(A, B warped through the surface), averaged over valid pixels.

    The surface point under each A-pixel is bary-interpolated from the
    (autodiff-tracked) vertex positions; B is sampled at its projection.
    Fully differentiable — the reference AD path (used for validation and on
    backends with trustworthy gather autodiff)."""
    xb, yb, _, ok = _warp_coords(verts, pd)
    warped = jnp.where(ok, _bilinear(pd.imgB, xb, yb), 0.0)
    A = jnp.where(pd.mask, pd.imgA, 0.0)
    return _box_zncc_energy(A, warped, ok.astype(jnp.float32), half)


def _pair_energy_grad_manual(verts: jnp.ndarray, pd: PairData, half: int = 3):
    """Hand-derived (energy, d energy/d vertices) for one pair.

    Mirrors the reference's explicit gradient chain
    (ComputePhotometricGradient, SceneRefine.cpp:161-175) instead of
    reverse-mode AD through the gathers: autodiff is applied only to the
    gather-free box-ZNCC tail; the bilinear-sampling derivative is the exact
    interpolant gradient from the same 4 taps; the projective chain rule and
    the barycentric scatter onto vertices are written out.  This keeps the
    whole step on the TPU (large fused gather autodiff graphs miscompile on
    this backend) and matches jax.grad of _pair_energy to float precision."""
    xb, yb, izb, ok = _warp_coords(verts, pd)
    v, gx, gy = _bilinear_g(pd.imgB, xb, yb)
    warped = jnp.where(ok, v, 0.0)
    A = jnp.where(pd.mask, pd.imgA, 0.0)
    M = ok.astype(jnp.float32)
    e, gB = jax.value_and_grad(_box_zncc_energy, argnums=1)(A, warped, M, half)
    gB = jnp.where(ok, gB, 0.0)
    # d(xb, yb)/dX for xb = (KB_R X + t)_x / z: (KB_R[0] - xb * KB_R[2]) / z
    dxb = gB * gx
    dyb = gB * gy
    R = pd.KB_R
    dX = (
        dxb[..., None] * (R[0][None, None] - xb[..., None] * R[2][None, None])
        + dyb[..., None] * (R[1][None, None] - yb[..., None] * R[2][None, None])
    ) * izb[..., None]                                     # (H, W, 3)
    # X = sum_k bary_k P_k  =>  dE/dP_k = bary_k * dE/dX, scattered by vid
    contrib = pd.bary[..., None] * dX[..., None, :]         # (H, W, 3, 3)
    contrib = jnp.where(ok[..., None, None], contrib, 0.0)
    g = jnp.zeros_like(verts).at[pd.face_vid.reshape(-1)].add(
        contrib.reshape(-1, 3)
    )
    # per-vertex observation support: did any valid pixel of this pair touch
    # the vertex?  (the reference's per-pair _photoGradNorm>0 test,
    # SceneRefine.cpp:1174-1188, used to average gradients over pairs)
    touched = jnp.zeros(verts.shape[0], jnp.float32).at[
        pd.face_vid.reshape(-1)
    ].add(jnp.broadcast_to(ok[..., None], pd.face_vid.shape)
          .reshape(-1).astype(jnp.float32))
    sup = (touched > 0).astype(jnp.float32)
    n_valid = jnp.sum(ok.astype(jnp.float32))
    return e, g, sup, n_valid


def _pair_face_acc(verts: jnp.ndarray, pd: PairData, half: int = 3):
    """Per-pair (energy, per-FACE gradient rows, per-face touch count,
    n_valid): the per-pixel chain of _pair_energy_grad_manual, but the
    barycentric contributions accumulate by RASTER FACE ID — one scatter
    index per pixel with a contiguous 10-wide row, measured 2.1x faster
    than the 3-index per-vertex scatter on this TPU
    (scripts/dev_refine_steady.py).  The face rows are pushed onto vertices
    once per iteration in _energy_grad (nf*3 elements, negligible)."""
    xb, yb, izb, ok = _warp_coords(verts, pd)
    v, gx, gy = _bilinear_g(pd.imgB, xb, yb)
    warped = jnp.where(ok, v, 0.0)
    A = jnp.where(pd.mask, pd.imgA, 0.0)
    M = ok.astype(jnp.float32)
    e, gB = jax.value_and_grad(_box_zncc_energy, argnums=1)(A, warped, M, half)
    gB = jnp.where(ok, gB, 0.0)
    dxb = gB * gx
    dyb = gB * gy
    R = pd.KB_R
    dX = (
        dxb[..., None] * (R[0][None, None] - xb[..., None] * R[2][None, None])
        + dyb[..., None] * (R[1][None, None] - yb[..., None] * R[2][None, None])
    ) * izb[..., None]                                      # (H, W, 3)
    contrib = pd.bary[..., None] * dX[..., None, :]         # (H, W, 3, 3)
    contrib = jnp.where(ok[..., None, None], contrib, 0.0)
    H, W = pd.fid.shape
    row = jnp.concatenate(
        [contrib.reshape(H, W, 9), M[..., None]], axis=-1)  # (H, W, 10)
    # fid == -1 pixels have ok False => zero rows; clamp their index to 0
    nf_axis = jnp.maximum(pd.fid, 0).reshape(-1)
    return e, row.reshape(-1, 10), nf_axis, jnp.sum(M)


def _pairs_grad_faces(verts, pds, faces):
    """All-pairs photometric (energies, per-vertex gradient sum in world
    units, per-vertex supporting-pair count) via the per-face scatter path.
    Matches the per-vertex path's math exactly up to float reduction order
    (parity test: tests/test_refine_grad.py)."""
    nf = faces.shape[0]
    nv = verts.shape[0]

    def one(pd):
        e, rows, idx, n_valid = _pair_face_acc(verts, pd)
        acc = jnp.zeros((nf, 10), verts.dtype).at[idx].add(rows)
        return e, acc, n_valid

    es, accs, n_valids = jax.vmap(one)(pds)                 # (P,), (P,nf,10)
    w_pair = (n_valids * pds.reg_scale)[:, None, None]      # (P,1,1)
    acc9 = jnp.sum(accs[..., :9] * w_pair, axis=0)          # (nf, 9)
    g = jnp.zeros((nv, 3), verts.dtype).at[faces.reshape(-1)].add(
        acc9.reshape(nf, 3, 3).reshape(-1, 3))
    # per-pair vertex support (photoGradNorm>0 role): a vertex is supported
    # by pair p iff any valid pixel rasterized one of its faces in p
    touched_f = (accs[..., 9] > 0).astype(jnp.float32)      # (P, nf)

    def push(tf):
        return jnp.zeros((nv,), jnp.float32).at[faces.reshape(-1)].add(
            jnp.repeat(tf, 3))

    sup = jax.vmap(push)(touched_f) > 0                     # (P, nv)
    n_sup = jnp.sum(sup.astype(jnp.float32), axis=0)        # (nv,)
    return es, g, n_sup


@jax.jit
def _device_iter(v, it, pds, adj, deg, faces, step0, med_edge,
                 reg_w, boundary=None, ratio=None):
    """ONE refinement iteration on device.

    A single iteration per dispatch is a deliberate compile-time decision:
    wrapping even 4 iterations in a `lax.fori_loop` blows this backend's
    XLA compile from ~25 s to >580 s (measured round 5,
    scripts/dev_refine_compile_bisect.py), while per-iteration dispatches
    enqueue asynchronously — the device never idles and the host loop in
    `_refine_at_scale` stays ahead of it.

    The update mirrors the reference's plain decayed gradient descent
    (SceneRefine.cpp:1385-1411), NOT Adam: per-coordinate normalization lets
    weakly-observed vertices take full-size steps from gradient noise while
    capping the smoothness restoring force at the same magnitude — measured
    on the synthetic quality harness as a random walk of the poorly-observed
    periphery (rms-to-GT 0.03 -> 0.12+).  Faithful structure instead:
      photo[v] = mean over supporting pairs (photoGrad/photoGradNorm,
                 SceneRefine.cpp:644-654) of the pair's exact energy gradient
                 in WORLD units: mean-energy grad * n_valid_pixels *
                 reg_scale (pixel-footprint world area, the reference
                 RegularizationScale) — so gradients VANISH as the surface
                 converges (no renormalization that would re-amplify noise);
      projected onto the vertex normal (the reference moves vertices along
                 normals only, N*sg, SceneRefine.cpp:944-951 — the ZNCC
                 aperture problem makes tangential components mostly noise);
      capped    per vertex at 0.3*med_edge/step0 so one iteration never
                 moves a vertex more than a fraction of the local edge
                 (trust region: caps, never amplifies);
      reg      = elasticity*g2 - rigidity*g1 with elasticity=ratio*w,
                 rigidity=(1-ratio)*w (SceneRefine.cpp:642-656);
      v       -= 0.98^it * step0 * (photo + reg)   with step0 = the
                 reference gstep (0.5 at the default gradient_step=45.05).
    boundary/ratio default to no-boundary / 0.9 when not given."""
    e, g = _energy_grad(v, pds, adj, deg, faces, step0, med_edge,
                        reg_w, boundary, ratio)
    v = v - (0.98 ** it.astype(jnp.float32)) * step0 * g
    return v, e


def _device_steps(v, m, vv2, it0, pds, adj, deg, faces, step0, med_edge,
                  reg_w, boundary=None, ratio=None):
    """4 refinement iterations between host re-rasterizations, dispatched as
    4 asynchronous `_device_iter` calls (see its docstring for why there is
    no on-device loop).  m/vv2 are unused legacy optimizer-state slots kept
    for caller compatibility."""
    del m, vv2
    e = jnp.float32(0.0)
    for i in range(4):
        v, e = _device_iter(v, it0 + i, pds, adj, deg, faces, step0,
                            med_edge, reg_w, boundary, ratio)
    return v, jnp.zeros_like(v), jnp.zeros_like(v), e


_assemble_pair_data_jit = jax.jit(_assemble_pair_data)


def _device_steps_split(v, m, vv2, it0, statics, rasters, adj, deg, faces,
                        step0, med_edge, reg_w, boundary=None, ratio=None):
    """_device_steps with the split upload (PairStatic uploaded once per
    scale, PairRaster per re-rasterization refresh).  The assembly runs as
    its own (cheap) jit so the per-iteration module stays small."""
    pds = _assemble_pair_data_jit(statics, rasters, faces)
    return _device_steps(v, m, vv2, it0, pds, adj, deg, faces, step0,
                         med_edge, reg_w, boundary, ratio)


def _energy_grad(v, pds, adj, deg, faces, step0, med_edge, reg_w,
                 boundary=None, ratio=None):
    """(energy, descent direction) for one refinement iteration — the
    computation described in _device_steps' docstring."""
    nv = v.shape[0]
    if pds.fid is not None:
        # 2-stage per-face scatter path (see _pair_face_acc): same math,
        # ~40% less per-iteration device time
        es, g_sum, n_sup = _pairs_grad_faces(v, pds, faces)
        photo = g_sum / jnp.maximum(n_sup, 1.0)[:, None]
    else:
        es, gs_pairs, sups, n_valids = jax.vmap(
            _pair_energy_grad_manual, in_axes=(None, 0))(v, pds)
        # world-unit per-pair gradients (mean-energy grad -> pixel sum ->
        # world area), then the reference's average over supporting pairs
        w_pair = (n_valids * pds.reg_scale)[:, None, None]
        n_sup = jnp.sum(sups, axis=0)                       # (nv,)
        photo = (jnp.sum(gs_pairs * w_pair, axis=0)
                 / jnp.maximum(n_sup, 1.0)[:, None])
    # area-weighted vertex normals; photometric movement along normals only
    fv = v[faces]                                           # (nf, 3, 3)
    fn = jnp.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    vn = jnp.zeros_like(v).at[faces.reshape(-1)].add(
        jnp.repeat(fn, 3, axis=0))
    vn = vn / (jnp.linalg.norm(vn, axis=-1, keepdims=True) + 1e-20)
    photo = jnp.sum(photo * vn, axis=-1, keepdims=True) * vn
    cap = 0.3 * med_edge / step0
    pn = jnp.linalg.norm(photo, axis=-1, keepdims=True)
    photo = photo * (cap / jnp.maximum(pn, cap))
    bnd = boundary if boundary is not None else jnp.zeros(nv, bool)
    g1, g2, score = _smooth_grads_tworing(v, adj, deg, bnd)
    r = 0.9 if ratio is None else ratio
    g_reg = jnp.where(r >= 1.0, reg_w * g2,
                      reg_w * (r * g2 - (1.0 - r) * g1))
    # normalize the smoothness score by the REAL vertex count (degree > 0)
    # so the logged energy is invariant to vertex-count bucketing
    nv_real = jnp.maximum(jnp.sum((deg > 0).astype(jnp.float32)), 1.0)
    e = jnp.sum(es) + reg_w * score / nv_real
    return e, photo + g_reg


def _smooth_energy_grad_manual(verts: jnp.ndarray, adj: jnp.ndarray,
                               deg: jnp.ndarray):
    """Hand-derived (energy, gradient) of _smooth_energy:
    E = mean_i ||(M v)_i - v_i||^2 with M the row-normalized one-ring
    average; dE/dv = 2/nv * (M^T r - r) with r = M v - v."""
    nv = verts.shape[0]
    w = (adj >= 0).astype(jnp.float32)
    nb = verts[jnp.maximum(adj, 0)]
    mean = jnp.sum(nb * w[..., None], axis=1) / jnp.maximum(deg[:, None], 1.0)
    r = mean - verts
    e = jnp.mean(jnp.sum(r * r, axis=-1))
    rw = r / jnp.maximum(deg[:, None], 1.0)                 # (nv, 3)
    contrib = jnp.broadcast_to(rw[:, None, :], adj.shape + (3,)) * w[..., None]
    Mt_r = jnp.zeros_like(verts).at[jnp.maximum(adj, 0).reshape(-1)].add(
        contrib.reshape(-1, 3)
    )
    g = (2.0 / nv) * (Mt_r - r)
    return e, g


def _smooth_grads_tworing(verts, adj, deg, boundary):
    """Reference two-ring smoothing gradients (ComputeSmoothnessGradient1/2,
    SceneRefine.cpp:958-1012):
      g1[v] = mean(one-ring) - v                (umbrella Laplacian)
      g2[v] = (sum g1[nb]/N - g1[v]) / (1 + mean(1/deg[nb]))
    both zero at boundary vertices; returns (g1, g2, score=sum|g1|)."""
    w = (adj >= 0).astype(jnp.float32)
    interior = (~boundary) & (deg > 0)
    safe_adj = jnp.maximum(adj, 0)
    nb = verts[safe_adj]
    degf = jnp.maximum(deg.astype(jnp.float32), 1.0)
    mean = jnp.sum(nb * w[..., None], axis=1) / degf[:, None]
    g1 = jnp.where(interior[:, None], mean - verts, 0.0)
    invdeg = jnp.where(deg > 0, 1.0 / degf, 0.0)
    wsum = jnp.sum(invdeg[safe_adj] * w, axis=1) / degf
    nrm = 1.0 / (1.0 + wsum)
    sum_g1 = jnp.sum(g1[safe_adj] * w[..., None], axis=1)
    g2 = (sum_g1 / degf[:, None] - g1) * nrm[:, None]
    g2 = jnp.where(interior[:, None], g2, 0.0)
    score = jnp.sum(jnp.linalg.norm(g1, axis=-1))
    return g1, g2, score


@functools.partial(jax.jit, static_argnames=())
def _smooth_energy(verts: jnp.ndarray, adj: jnp.ndarray, deg: jnp.ndarray) -> jnp.ndarray:
    """Uniform-Laplacian rigidity: || mean(one-ring) - v ||^2 (the reference's
    two-ring rigidity/elasticity pair, SceneRefine.cpp:170-175, collapsed to
    its dominant first-order term)."""
    nb = verts[jnp.maximum(adj, 0)]                         # (nv, D, 3)
    w = (adj >= 0).astype(jnp.float32)[..., None]
    lap = jnp.sum(nb * w, axis=1) / jnp.maximum(deg[:, None], 1.0) - verts
    return jnp.mean(jnp.sum(lap * lap, axis=-1))


def refine_mesh(
    scene: Scene,
    mesh: Optional[Mesh] = None,
    opts: RefineOptions = RefineOptions(),
) -> Mesh:
    """Coarse-to-fine photometric refinement (Scene::RefineMesh role)."""
    from openmvs_tpu.io import images as imio
    from openmvs_tpu.view_selection import select_views_for_scene
    from openmvs_tpu.config import DenseOptions

    mesh = mesh if mesh is not None else scene.mesh
    if len(mesh.faces) == 0:
        raise ValueError("no mesh to refine")

    w0 = max(im.width for im in scene.images)
    h0 = max(im.height for im in scene.images)
    max_dim_full = imio.compute_max_resolution(
        w0, h0, opts.resolution_level, opts.min_resolution, 1 << 30
    )
    for img in scene.images:
        if img.gray is None:
            img.load(max_dim=max_dim_full)
    if not scene.images[0].meta.view_scores:
        select_views_for_scene(scene, DenseOptions())

    # pre-refinement mesh conditioning (MeshRefine::SubdivideMesh,
    # SceneRefine.cpp:480-556): decimation + hole closing only when a
    # decimation was requested; ensure_edge_size follows the reference's
    # tri-state (0 disabled, 1 AUTO = only alongside a decimation, 2 force,
    # RefineMesh.cpp:126 + SceneRefine.cpp:552).  Running the remesher
    # unconditionally is actively harmful: it also densifies the junk
    # long-edge rim faces every real reconstruction carries, multiplying
    # off-surface vertices before refinement even starts.
    decimating = 0 < opts.decimate < 1
    if decimating:
        from openmvs_tpu import mesh_ops

        mesh = mesh_ops.clean_mesh(
            mesh, decimate=opts.decimate,
            close_holes_size=opts.close_holes,
            remove_spurious_percent=0.0, do_remove_spikes=False,
            smooth_iters=0, last_clean=False)
    if (opts.ensure_edge_size == 1 and decimating) or opts.ensure_edge_size >= 2:
        from openmvs_tpu import mesh_ops

        e = mesh.vertices[mesh.faces[:, 0]] - mesh.vertices[mesh.faces[:, 1]]
        med = float(np.median(np.linalg.norm(e, axis=1)))
        # cap edges at ~2x the median (EnsureEdgeSize default policy)
        mesh = mesh_ops.ensure_edge_size(mesh, 2.0 * med, max_rounds=2)

    # select pairs: each view with its best-scoring neighbor(s);
    # alternative_pair (nAlternatePair): 0 both directions, 1 alternate by
    # scale parity, 2 only (i, j), 3 only (j, i) (SceneRefine.cpp:198)
    pairs: List[Tuple[int, int]] = []
    id_to_idx = {im.meta.id: i for i, im in enumerate(scene.images)}
    for i, img in enumerate(scene.images):
        for vs in img.meta.view_scores[: max(1, opts.max_views // 4)]:
            j = id_to_idx.get(vs.id)
            if j is not None and (i, j) not in pairs:
                if opts.alternative_pair == 3:
                    if (j, i) not in pairs:
                        pairs.append((j, i))
                    continue
                pairs.append((i, j))
                if opts.alternative_pair == 0 and (j, i) not in pairs:
                    pairs.append((j, i))
    if not pairs:
        # no sparse points to score views: pair by camera distance
        Cs = np.stack([im.camera.C for im in scene.images])
        for i in range(len(scene.images)):
            d = np.linalg.norm(Cs - Cs[i], axis=1)
            d[i] = np.inf
            pairs.append((i, int(np.argmin(d))))
    log.info("refining with %d pairs", len(pairs))

    # pad every scale's pair rasters to the FULL-scale dimensions so the
    # compiled device step is shape-stable across scales (one compile per
    # refine instead of one per scale — compile time dominates refine wall
    # time on the TPU); the pad region is fully masked, so results are
    # identical up to float reduction order (OMVS_REFINE_NO_BUCKET=1
    # disables)
    import os as _os

    pad_hw = None
    if not _os.environ.get("OMVS_REFINE_NO_BUCKET"):
        pad_hw = (max(im.gray.shape[0] for im in scene.images),
                  max(im.gray.shape[1] for im in scene.images))
    cur = mesh
    for si in range(opts.scales):
        scale = opts.scale_step ** (opts.scales - 1 - si)
        # alternate mode (nAlternatePair=1, SceneRefine.cpp:597-600): the
        # pair direction flips with the outer iteration parity — here the
        # scale index plays the reference's iteration role
        sp = pairs
        if opts.alternative_pair == 1 and si % 2 == 1:
            sp = [(j, i) for (i, j) in pairs]
        with timed(log, f"scale {scale:.2f}"):
            cur = _refine_at_scale(scene, cur, sp, scale, opts,
                                   pad_hw=pad_hw)
    return cur


def _bucket(n: int, q: int) -> int:
    return ((max(n, 1) + q - 1) // q) * q


def _refine_at_scale(scene, mesh: Mesh, pairs, scale: float,
                     opts: RefineOptions, pad_hw=None) -> Mesh:
    import os as _os0
    import time as _time0
    _prof0 = _os0.environ.get("OMVS_REFINE_PROF")
    _tp0 = _time0.time()

    def _mark(what):
        nonlocal _tp0
        if _prof0:
            t = _time0.time()
            log.info("  setup %-12s %.2fs", what, t - _tp0)
            _tp0 = t

    from openmvs_tpu.io import images as imio

    # scaled images + cameras
    grays, cams = [], []
    for img in scene.images:
        g = img.gray
        if scale != 1.0:
            g = imio.resize_area(g, max(8, round(g.shape[1] * scale)),
                                 max(8, round(g.shape[0] * scale)))
        grays.append(np.asarray(g, np.float32))
        cams.append(img.working_camera().scaled(g.shape[1] / img.gray.shape[1])
                    if scale != 1.0 else img.working_camera())
    _mark("images")

    mesh = subdivide_to_area(mesh, scene, float(opts.max_face_area) / max(scale, 1e-3))
    _mark("subdivide")
    faces = mesh.faces
    nvr = len(mesh.vertices)
    adj, deg = _vertex_adjacency(faces, nvr)
    boundary_np = _vertex_boundary(faces, nvr)
    _mark("adjacency")

    # vertex/face-count bucketing (with pad_hw): device arrays padded to
    # coarse buckets so the compiled step's shapes coincide across scales
    # and runs; dummy vertices have no faces, no adjacency, boundary=True
    # and no pixel support, so they contribute exactly nothing
    import os as _os
    import time as _time

    if _os.environ.get("OMVS_REFINE_CPU_AD"):
        pad_hw = None   # the full-AD validation path stays unpadded
    nv_pad = _bucket(nvr, 2048) if pad_hw is not None else nvr
    nf_pad = _bucket(len(faces), 4096) if pad_hw is not None else len(faces)

    def dev_arrays(v_real, f_real, adj_real, deg_real, bnd_real):
        vp = np.zeros((nv_pad, 3), np.float32)
        vp[: len(v_real)] = v_real
        fp = np.zeros((nf_pad, 3), np.int32)
        fp[: len(f_real)] = f_real
        ap = np.full((nv_pad, adj_real.shape[1]), -1, np.int32)
        ap[: len(adj_real)] = adj_real
        dp = np.zeros(nv_pad, np.float32)
        dp[: len(deg_real)] = deg_real
        bp = np.ones(nv_pad, bool)
        bp[: len(bnd_real)] = bnd_real
        return (jnp.asarray(vp), jnp.asarray(fp), jnp.asarray(ap),
                jnp.asarray(dp), jnp.asarray(bp))

    verts_p, faces_j, adj_j, deg_j, bnd_j = dev_arrays(
        mesh.vertices.astype(np.float32), faces, adj, deg, boundary_np)
    verts = verts_p

    # median edge length: the trust-region unit (movement per iteration is
    # capped at a fraction of it, keeping the fixed rasterization valid)
    e = mesh.vertices[faces[:, 0]] - mesh.vertices[faces[:, 1]]
    med_edge = float(np.median(np.linalg.norm(e, axis=1)))
    # reference step parse (SceneRefine.cpp:1355-1358): the fractional part
    # of gradient_step scaled by 10 is the GD step (45.05 -> 0.5)
    gs = float(opts.gradient_step)
    step0 = (gs - int(gs)) * 10.0 if gs > 1 else (gs if gs > 0 else 0.5)
    if step0 == 0.0:
        # an integer gradient_step decodes to a zero GD step in the
        # reference too — but there it is a silent no-op; warn and use the
        # reference default step (SceneRefine.cpp:1355 gstep=0.4) instead
        log.warning(
            "gradient_step=%g has zero fractional part -> zero GD step; "
            "using default 0.4 (encode step in the fraction, e.g. 45.04)", gs)
        step0 = 0.4

    # gradients are hand-derived (see _pair_energy_grad_manual) so the whole
    # step runs on the TPU: autodiff only touches the gather-free ZNCC tail.
    # OMVS_REFINE_CPU_AD=1 restores the full-AD-on-CPU path (the fused
    # gather autodiff graph miscompiles on this TPU stack).
    _dev = None
    _use_cpu_ad = bool(_os.environ.get("OMVS_REFINE_CPU_AD"))
    if _use_cpu_ad:
        try:
            if jax.default_backend() not in ("cpu",):
                _dev = jax.devices("cpu")[0]
        except Exception:
            _dev = None
        energy_and_grad = jax.jit(
            jax.value_and_grad(
                lambda v, pds: sum(_pair_energy(v, pd) for pd in pds)
                + opts.regularity_weight * len(pds) * _smooth_energy(v, adj_j, deg_j)
            ),
            device=_dev,
        )
    if _dev is not None:
        adj_j = jax.device_put(adj_j, _dev)
        deg_j = jax.device_put(deg_j, _dev)

    Hm_ = max(g.shape[0] for g in grays)
    Wm_ = max(g.shape[1] for g in grays)
    if pad_hw is not None:
        Hm_, Wm_ = max(Hm_, pad_hw[0]), max(Wm_, pad_hw[1])

    def raster_pair_np(a, b, v_np):
        camA, camB = cams[a], cams[b]
        H, W = grays[a].shape
        prA = _project_np(camA, v_np.astype(np.float64))
        fid, _, bar = native.rasterize(prA, faces, H, W)
        mask = fid >= 0
        fv = faces[np.where(mask, fid, 0)]
        # RegularizationScale (SceneRefine.cpp:1169): mean viewing depth of
        # the surface in each view over the focal lengths — the world area
        # of one pixel footprint
        zA = prA[:, 2]
        avgA = float(zA[zA > 0].mean()) if (zA > 0).any() else 1.0
        zB = _project_np(camB, v_np.astype(np.float64))[:, 2]
        avgB = float(zB[zB > 0].mean()) if (zB > 0).any() else 1.0
        reg_scale = avgA * avgB / float(camA.K[0, 0] * camB.K[0, 0])
        def pad2(x, fill=0):
            if x.shape[0] == Hm_ and x.shape[1] == Wm_:
                return x
            out = np.full((Hm_, Wm_) + x.shape[2:], fill, x.dtype)
            out[: x.shape[0], : x.shape[1]] = x
            return out
        return (pad2(grays[a]), pad2(grays[b]), pad2(fv),
                pad2(bar.astype(np.float32)), pad2(mask, False),
                (camA.K @ camA.R).astype(np.float32),
                (-(camA.K @ camA.R) @ camA.C).astype(np.float32),
                (camB.K @ camB.R).astype(np.float32),
                (-(camB.K @ camB.R) @ camB.C).astype(np.float32),
                np.asarray(grays[b].shape, np.float32),
                camA.C.astype(np.float32),
                np.float32(reg_scale),
                pad2(fid.astype(np.int32), -1))

    def build_pds_stacked(v_np):
        # stays numpy: the jit call uploads the whole pytree in one transfer
        # (separate jnp.asarray calls each pay a tunnel round-trip)
        cols = [raster_pair_np(a, b, v_np) for (a, b) in pairs]
        return PairData(*[np.stack([c[k] for c in cols])
                          for k in range(len(PairData._fields))])

    def _pad2(x, fill=0):
        if x.shape[0] == Hm_ and x.shape[1] == Wm_:
            return x
        out = np.full((Hm_, Wm_) + x.shape[2:], fill, x.dtype)
        out[: x.shape[0], : x.shape[1]] = x
        return out

    def build_statics_stacked():
        cols = []
        for (a, b) in pairs:
            camA, camB = cams[a], cams[b]
            cols.append((
                _pad2(grays[a]), _pad2(grays[b]),
                (camA.K @ camA.R).astype(np.float32),
                (-(camA.K @ camA.R) @ camA.C).astype(np.float32),
                (camB.K @ camB.R).astype(np.float32),
                (-(camB.K @ camB.R) @ camB.C).astype(np.float32),
                np.asarray(grays[b].shape, np.float32),
                camA.C.astype(np.float32)))
        return PairStatic(*[np.stack([c[k] for c in cols])
                            for k in range(len(PairStatic._fields))])

    def build_rasters_stacked(v_np):
        cols = []
        v64 = v_np.astype(np.float64)
        for (a, b) in pairs:
            camA, camB = cams[a], cams[b]
            H, W = grays[a].shape
            prA = _project_np(camA, v64)
            fid, _, bar = native.rasterize(prA, faces, H, W)
            zA = prA[:, 2]
            avgA = float(zA[zA > 0].mean()) if (zA > 0).any() else 1.0
            zB = _project_np(camB, v64)[:, 2]
            avgB = float(zB[zB > 0].mean()) if (zB > 0).any() else 1.0
            cols.append((
                _pad2(fid.astype(np.int32), -1),
                _pad2(np.ascontiguousarray(bar[..., :2]).astype(np.float32)),
                np.float32(avgA * avgB / float(camA.K[0, 0] * camB.K[0, 0]))))
        return PairRaster(*[np.stack([c[k] for c in cols])
                            for k in range(len(PairRaster._fields))])

    v_np = np.asarray(verts)
    iters = max(4, int(opts.iters * (0.5 if scale < 1.0 else 1.0)))
    if not _use_cpu_ad:
        # TPU path: stacked pairs, 4 device iterations per host round-trip.
        # With multiple devices the pair axis is sharded over a 1-D mesh
        # (the reference's EventThreadPool pair queue, SceneRefine.cpp:303):
        # GSPMD turns the pair-sum of vertex gradients into an all-reduce.
        shard_pairs = None
        devs = jax.devices()
        n_sh = 1
        if len(devs) > 1 and len(pairs) > 1:
            from jax.sharding import Mesh as JMesh, NamedSharding, PartitionSpec

            n_sh = min(len(devs), len(pairs))
            jmesh = JMesh(np.array(devs[:n_sh]), ("pairs",))
            shard_pairs = NamedSharding(jmesh, PartitionSpec("pairs"))
            replicate = NamedSharding(jmesh, PartitionSpec())

        def put(pds, pad_fill=None):
            if shard_pairs is not None and pds[0].shape[0] % n_sh:
                # pad with all-masked-out dummy pairs (zero energy and grad;
                # PairRaster pads fid with -1 so every pixel is masked)
                padn = n_sh - pds[0].shape[0] % n_sh
                cls = type(pds)
                fills = pad_fill or {}
                pds = cls(*[
                    np.concatenate([x, np.full(
                        (padn,) + x.shape[1:],
                        fills.get(name, 0), x.dtype)])
                    for name, x in zip(cls._fields, pds)
                ])
            if shard_pairs is None:
                return pds
            return jax.device_put(pds, shard_pairs)

        v_d = jnp.asarray(v_np)
        if shard_pairs is not None:
            v_d, adj_j, deg_j, faces_j, bnd_j = jax.device_put(
                (v_d, adj_j, deg_j, faces_j, bnd_j), replicate)
        # iteration schedule (SceneRefine.cpp:1362-1370): the elastic-only
        # regularizer takes over after 70% of the iterations; planar-vertex
        # pruning runs periodically from 40% when planar_vertex_ratio > 0
        iter_stop = iters * 7 // 10
        iter_start = iters * 4 // 10 if opts.planar_vertex_ratio > 0 else 1 << 30
        # host re-rasterization cadence: every RR device iterations.  The
        # per-iteration trust-region cap (fraction of med_edge) is what
        # keeps a fixed rasterization valid between refreshes.  RR=8 is
        # the r5 default: the bench-leg A/B measured wall ~10 s -> 7.13 s
        # (refresh transfer+assemble halved) at mean-z-err 0.01233 ->
        # 0.01273 (+3%, still >96% of the injected noise recovered) —
        # the reference's own fixed-visibility assumption holds across 8
        # capped iterations as well as 4.  OMVS_REFINE_RERASTER overrides.
        rr = max(1, int(_os.environ.get("OMVS_REFINE_RERASTER", "8")))
        # images/cameras never change within a scale: upload ONCE; each
        # refresh ships only fid + 2 barycentrics (+ scalars) per pair
        _mark("pre-statics")
        statics = put(build_statics_stacked())
        if shard_pairs is None:
            statics = jax.device_put(statics)   # pin on device across calls
        _mark("statics")

        prof = _os.environ.get("OMVS_REFINE_PROF")
        tprof = {"down": 0.0, "raster": 0.0, "up": 0.0, "asm": 0.0,
                 "dev": 0.0}
        step0_j = jnp.float32(step0)
        med_j = jnp.float32(med_edge)
        regw_j = jnp.float32(opts.regularity_weight)
        for it in range(0, iters, rr):
            t0 = _time.time()
            v_prev = np.asarray(v_d)[:nvr]
            t1 = _time.time()
            rasters_np = build_rasters_stacked(v_prev)
            t2 = _time.time()
            rasters = put(rasters_np, pad_fill={"fid": -1})
            pds = _assemble_pair_data_jit(statics, rasters, faces_j)
            if prof == "2":   # fine mode: sync at the phase boundary
                jax.block_until_ready(pds)
            ratio_it = jnp.float32(opts.rigidity_elasticity_ratio
                                   if it <= iter_stop else 1.0)
            t3 = _time.time()
            # rr asynchronous single-iteration dispatches (no on-device
            # loop: see _device_iter on the fori_loop compile blowup); the
            # queue drains while the host prepares the next refresh
            for k in range(it, min(it + rr, iters)):
                v_d, e = _device_iter(
                    v_d, jnp.int32(k), pds, adj_j, deg_j, faces_j,
                    step0_j, med_j, regw_j, bnd_j, ratio_it)
            if prof:
                _ = float(e)   # force completion so 'dev' is the real time
                t4 = _time.time()
                tprof["down"] += t1 - t0
                tprof["raster"] += t2 - t1
                tprof["up"] += t3 - t2 if prof != "2" else 0.0
                tprof["asm"] += t3 - t2 if prof == "2" else 0.0
                tprof["dev"] += t4 - t3
            if it % 8 == 0:
                log.info("  iter %d: E=%.5f", it, float(e))
            if it >= iter_start and iters - it > 5:
                # planar-vertex pruning (SceneRefine.cpp:1377-1399): remove
                # interior vertices that barely moved AND sit on a flat
                # one-ring; threshold = viewing depth * planar_vertex_ratio.
                # Cadence deviation from the reference (documented): the
                # reference tests the single-iteration gradient norm every 3
                # iterations; we test once per refresh block, so the
                # accumulated displacement is normalized by the block length
                # to keep per-iteration units and comparable aggressiveness.
                v_now = np.asarray(v_d)[:nvr]
                blk = max(1, min(it + rr, iters) - it)
                move = np.linalg.norm(v_now - v_prev, axis=1) / blk
                # visibility guard (the reference's vertexDepth < FLT_MAX
                # test, SceneRefine.cpp:1389-1392): only vertices actually
                # rasterized by some scoring pair may be pruned — unseen or
                # occluded flat vertices keep their geometry
                seen = np.zeros(nvr, bool)
                for fidm in rasters_np.fid:
                    fids = np.unique(fidm[fidm >= 0])
                    seen[faces[fids].reshape(-1)] = True
                wmask = (adj >= 0)
                nbm = v_now[np.maximum(adj, 0)]
                mean_nb = (nbm * wmask[..., None]).sum(1) / np.maximum(
                    deg[:, None], 1)
                g1n = np.linalg.norm(mean_nb - v_now, axis=1)
                # running per-camera minimum: the broadcast form would
                # materialize an (n_cams, nv, 3) temporary — gigabytes on
                # large refines
                min_d = np.full(len(v_now), np.inf)
                for c in cams:
                    np.minimum(min_d, np.linalg.norm(v_now - c.C, axis=1),
                               out=min_d)
                th = min_d * opts.planar_vertex_ratio
                kill = ((~boundary_np) & seen & (move < th) & (g1n < th)
                        & (deg > 0))
                if kill.sum() > max(16, 0.002 * len(v_now)):
                    keep_faces, remap = _collapse_vertices(
                        v_now, faces, adj, deg, kill)
                    if keep_faces is not None:
                        log.info("  planar pruning: -%d vertices",
                                 int(kill.sum()))
                        v_now = v_now[remap >= 0]
                        faces = keep_faces
                        nvr = len(v_now)
                        adj, deg = _vertex_adjacency(faces, nvr)
                        boundary_np = _vertex_boundary(faces, nvr)
                        v_d, faces_j, adj_j, deg_j, bnd_j = dev_arrays(
                            v_now.astype(np.float32), faces, adj, deg,
                            boundary_np)
                        if shard_pairs is not None:
                            v_d, adj_j, deg_j, faces_j, bnd_j = \
                                jax.device_put((v_d, adj_j, deg_j, faces_j,
                                                bnd_j), replicate)
        if prof:
            log.info("  refine prof (scale %.2f): %s", scale,
                     {k: round(v, 3) for k, v in tprof.items()})
        v_np = np.asarray(v_d)[:nvr]
        return Mesh(vertices=v_np.astype(np.float32), faces=faces)

    # CPU full-AD fallback (OMVS_REFINE_CPU_AD=1)
    m = np.zeros_like(v_np)
    vv2 = np.zeros_like(v_np)
    b1, b2, eps = 0.9, 0.999, 1e-12
    for it in range(iters):
        # re-rasterize every few iterations (visibility fixed in between)
        if it % 4 == 0:
            pds = []
            for (a, b) in pairs:
                t = raster_pair_np(a, b, v_np)
                pds.append(PairData(*[jnp.asarray(x) for x in t]))
            pds = jax.tree.map(lambda x: jax.device_put(x, _dev), pds)
        e, g = energy_and_grad(jnp.asarray(v_np), pds)
        g = np.asarray(g)
        m = b1 * m + (1 - b1) * g
        vv2 = b2 * vv2 + (1 - b2) * g * g
        mh = m / (1 - b1 ** (it + 1))
        vh = vv2 / (1 - b2 ** (it + 1))
        v_np = v_np - step0 * (0.98 ** it) * mh / (np.sqrt(vh) + np.sqrt(vh).max() * 1e-3 + eps)
        if it % 8 == 0:
            log.info("  iter %d: E=%.5f", it, float(e))

    return Mesh(vertices=v_np.astype(np.float32), faces=faces)
