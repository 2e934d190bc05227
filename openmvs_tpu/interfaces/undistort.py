"""Image undistortion on SfM import.

The reference undistorts images before densification (VisualSFM path:
`MVS::UndistortImage`, apps/InterfaceVisualSFM/InterfaceVisualSFM.cpp:245,
457; COLMAP path expects `colmap image_undistorter` output).  Importers here
call `undistort_interface_images` so radially-distorted real-world models
reconstruct correctly instead of importing wrong geometry with a warning.

Supported models (coefficients in OpenCV's (k1, k2, p1, p2, k3) order):
  - COLMAP SIMPLE_RADIAL / RADIAL / OPENCV / FULL_OPENCV
  - VisualSFM NVM single-coefficient radial (x_d = x_u (1 + k1 r_u^2) in
    f-normalized coords — DistortPointR1, InterfaceVisualSFM.cpp:200-243 —
    which is exactly OpenCV's k1-only model)
  - Bundler (k1, k2)
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from openmvs_tpu.io import mvs as mvsio
from openmvs_tpu.utils.log import get_logger

log = get_logger("undistort")


def colmap_dist_coeffs(model: str, params) -> Optional[np.ndarray]:
    """OpenCV distortion vector for a COLMAP camera model (None = pinhole)."""
    p = np.asarray(params, np.float64)
    if model in ("PINHOLE", "SIMPLE_PINHOLE"):
        return None
    if model == "SIMPLE_RADIAL":          # f cx cy k
        return np.array([p[3], 0, 0, 0, 0])
    if model == "RADIAL":                 # f cx cy k1 k2
        return np.array([p[3], p[4], 0, 0, 0])
    if model == "OPENCV":                 # fx fy cx cy k1 k2 p1 p2
        return np.array([p[4], p[5], p[6], p[7], 0])
    if model == "FULL_OPENCV":            # fx fy cx cy k1 k2 p1 p2 k3 ...
        return np.array([p[4], p[5], p[6], p[7], p[8]])
    log.warning("unsupported camera model %s: importing without undistortion", model)
    return None


def undistort_image(img: np.ndarray, K: np.ndarray,
                    dist: np.ndarray) -> np.ndarray:
    import cv2

    return cv2.undistort(img, np.asarray(K, np.float64),
                         np.asarray(dist, np.float64))


def undistort_interface_images(
    itf: mvsio.Interface,
    dists: Dict[int, np.ndarray],     # platform_id -> OpenCV coeffs
    out_dir: str,
) -> int:
    """Undistort every image of a distorted platform and repoint its meta.

    Writes `<out_dir>/<basename>` undistorted copies; returns the number of
    images processed.  K is unchanged (OpenCV undistort maps to the same
    intrinsics)."""
    import cv2

    n = 0
    os.makedirs(out_dir, exist_ok=True)
    used_names: Dict[str, int] = {}
    for meta in itf.images:
        dist = dists.get(meta.platform_id)
        if dist is None or not np.any(np.abs(dist) > 1e-12):
            continue
        src = meta.name
        if not os.path.exists(src):
            log.warning("image %s missing; cannot undistort", src)
            continue
        img = cv2.imread(src, cv2.IMREAD_UNCHANGED)
        if img is None:
            log.warning("failed to read %s", src)
            continue
        rig = itf.platforms[meta.platform_id].cameras[meta.camera_id]
        K = np.asarray(rig.K, np.float64)
        if K[0, 0] <= 1.5:  # normalized K (reference convention): scale up
            s = max(rig.width, rig.height)
            K = K * np.array([[s, s, s], [s, s, s], [1, 1, 1]])
        und = undistort_image(img, K, dist)
        # same basename from different subfolders (rig layouts) must not
        # overwrite each other in the flat out_dir; the renamed candidate
        # must ALSO avoid genuine inputs like stem_1.ext
        base = os.path.basename(src)
        stem, ext = os.path.splitext(base)
        k = 0
        cand = base
        while cand in used_names:
            k += 1
            cand = f"{stem}_{k}{ext}"
        used_names[cand] = 1
        dst = os.path.join(out_dir, cand)
        cv2.imwrite(dst, und)
        meta.name = dst
        n += 1
    if n:
        log.info("undistorted %d images -> %s", n, out_dir)
    return n
