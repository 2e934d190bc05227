"""Native host-side kernels (C++ via ctypes).

The irreducibly pointer-chasing stages — s-t max-flow over the Delaunay
tetrahedralization and quadric edge-collapse decimation — run as native code,
mirroring where the reference shells out to IBFS/CGAL/VCG
(libs/MVS/SceneReconstruct.cpp:58-108, libs/MVS/Mesh.cpp:685-790).

The shared library is built on demand from ``src/*.cpp`` with g++ (no build
system dependency); rebuilt automatically when any source is newer than the
cached ``_omvs_native.so``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_omvs_native.so")
_SOURCES = ("maxflow.cpp", "delaunay_cut.cpp", "decimate.cpp", "rasterize.cpp",
            "project_emitter.cpp")

_lock = threading.Lock()
_lib = None


def _needs_build() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    for s in _SOURCES + ("maxflow.h",):
        p = os.path.join(_SRC_DIR, s)
        if os.path.exists(p) and os.path.getmtime(p) > lib_mtime:
            return True
    return False


def build(force: bool = False) -> str:
    """Compile the native library if missing/stale; returns its path."""
    with _lock:
        if force or _needs_build():
            srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
            cmd = [
                "g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
                "-fopenmp", "-o", _LIB_PATH + ".tmp", *srcs,
            ]
            proc = subprocess.run(cmd, capture_output=True, text=True)
            if proc.returncode != 0:
                raise RuntimeError(
                    f"native build failed ({' '.join(cmd)}):\n{proc.stderr}")
            os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    build()
    lib = ctypes.CDLL(_LIB_PATH)

    c_i64 = ctypes.c_int64
    p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.omvs_delaunay_graph_cut.restype = ctypes.c_int64
    lib.omvs_delaunay_graph_cut.argtypes = [
        p_f64, c_i64,            # verts, nv
        p_i32, p_i32, c_i64,     # tets, neigh, nt
        p_i32,                   # vert_tet
        p_f64, c_i64,            # cam_centers, ncam
        p_f64, p_i32,            # cam_P (ncam,3,4), cam_wh (ncam,2)
        p_i64, p_i32, p_f32,     # view_indptr, view_cam, view_weight
        ctypes.c_double, ctypes.c_double, ctypes.c_double,  # sigma, kqual, kinf
        ctypes.c_int32,          # use_free_space
        ctypes.c_double, ctypes.c_double,                   # kb, kf
        ctypes.c_double, ctypes.c_double, ctypes.c_double,  # kRel, kAbs, kOutl
        p_u8,                    # inside_out (nt + n_hull)
    ]

    lib.omvs_rasterize.restype = ctypes.c_int
    lib.omvs_rasterize.argtypes = [
        p_f64, c_i64, p_i32, c_i64,   # proj (nv,3), nv, faces, nf
        c_i64, c_i64,                 # H, W
        p_i32, p_f32, p_f32,          # face_id, depth, bary
    ]

    lib.omvs_decimate.restype = ctypes.c_int
    lib.omvs_decimate.argtypes = [
        p_f64, c_i64, p_i32, c_i64,   # verts_in, nv, faces_in, nf
        c_i64,                        # target_nf
        p_f64, p_i32,                 # out_verts, out_faces
        np.ctypeslib.ndpointer(np.int64, shape=(1,)),
        np.ctypeslib.ndpointer(np.int64, shape=(1,)),
    ]

    lib.omvs_emit_test_project.restype = ctypes.c_int
    lib.omvs_emit_test_project.argtypes = [ctypes.c_char_p]
    _lib = lib
    return lib


def emit_test_project(path: str) -> None:
    """Write the tiny golden 'MVS project' archive used to cross-validate
    io/boost_archive.py against an independent C++ emitter of the wire
    format (native/src/project_emitter.cpp)."""
    rc = _load().omvs_emit_test_project(path.encode())
    if rc != 0:
        raise RuntimeError(f"omvs_emit_test_project failed (rc={rc})")


def delaunay_graph_cut(
    verts: np.ndarray,
    tets: np.ndarray,
    neigh: np.ndarray,
    vert_tet: np.ndarray,
    cam_centers: np.ndarray,
    cam_P: np.ndarray,
    cam_wh: np.ndarray,
    view_indptr: np.ndarray,
    view_cam: np.ndarray,
    view_weight: np.ndarray,
    sigma: float,
    kqual: float,
    kinf: float,
    use_free_space: bool = False,
    kb: float = 4.0,
    kf: float = 3.0,
    k_rel: float = 0.1,
    k_abs: float = 1000.0,
    k_outl: float = 400.0,
) -> np.ndarray:
    """Returns per-cell free/full labels, length nt + n_hull: entry t < nt is
    tet t; entries nt.. are the per-hull-facet outside nodes in (t, j) scan
    order of neigh < 0.  0 = free/empty space (source side of the cut —
    camera rays tie hull-exit nodes to the source), 1 = full/interior matter
    (sink side).  The surface is the set of facets between a free and a full
    cell."""
    lib = _load()
    nv, nt = len(verts), len(tets)
    neigh = np.ascontiguousarray(neigh, np.int32)
    n_hull = int((neigh < 0).sum())
    inside = np.zeros(nt + n_hull, np.uint8)
    rc = lib.omvs_delaunay_graph_cut(
        np.ascontiguousarray(verts, np.float64), nv,
        np.ascontiguousarray(tets, np.int32),
        neigh, nt,
        np.ascontiguousarray(vert_tet, np.int32),
        np.ascontiguousarray(cam_centers, np.float64), len(cam_centers),
        np.ascontiguousarray(cam_P, np.float64),
        np.ascontiguousarray(cam_wh, np.int32),
        np.ascontiguousarray(view_indptr, np.int64),
        np.ascontiguousarray(view_cam, np.int32),
        np.ascontiguousarray(view_weight, np.float32),
        float(sigma), float(kqual), float(kinf),
        1 if use_free_space else 0,
        float(kb), float(kf), float(k_rel), float(k_abs), float(k_outl),
        inside,
    )
    if rc != n_hull:
        raise RuntimeError(f"omvs_delaunay_graph_cut failed (rc={rc}, expected {n_hull})")
    return inside


def decimate(verts: np.ndarray, faces: np.ndarray, target_nf: int):
    """Quadric edge-collapse decimation to <= target_nf faces."""
    lib = _load()
    nv, nf = len(verts), len(faces)
    out_v = np.zeros((nv, 3), np.float64)
    out_f = np.zeros((nf, 3), np.int32)
    out_nv = np.zeros(1, np.int64)
    out_nf = np.zeros(1, np.int64)
    rc = lib.omvs_decimate(
        np.ascontiguousarray(verts, np.float64), nv,
        np.ascontiguousarray(faces, np.int32), nf,
        int(target_nf), out_v, out_f, out_nv, out_nf,
    )
    if rc != 0:
        raise RuntimeError(f"omvs_decimate failed (rc={rc})")
    return out_v[: out_nv[0]].copy(), out_f[: out_nf[0]].copy()


def rasterize(proj: np.ndarray, faces: np.ndarray, H: int, W: int,
              want_bary: bool = True):
    """Z-buffer rasterization of projected vertices (u, v, camera-depth).

    Returns (face_id (H,W) int32 with -1 empty, depth (H,W) f32,
    bary (H,W,3) f32 perspective-correct or None)."""
    lib = _load()
    face_id = np.empty((H, W), np.int32)
    depth = np.empty((H, W), np.float32)
    bary = np.empty((H, W, 3), np.float32)
    rc = lib.omvs_rasterize(
        np.ascontiguousarray(proj, np.float64), len(proj),
        np.ascontiguousarray(faces, np.int32), len(faces),
        H, W, face_id, depth, bary,
    )
    if rc != 0:
        raise RuntimeError(f"omvs_rasterize failed (rc={rc})")
    return face_id, depth, (bary if want_bary else None)
