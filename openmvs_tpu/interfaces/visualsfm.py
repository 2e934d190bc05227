"""VisualSFM .nvm import (apps/InterfaceVisualSFM equivalent,
InterfaceVisualSFM.cpp:44,104).

NVM_V3 layout: per camera `name focal qw qx qy qz cx cy cz r 0`, then points
`x y z r g b n_meas (img_idx feat_idx u v)*`.  VisualSFM stores camera
CENTERS and a w-first quaternion; radial distortion r is ignored with a
warning (undistort first, as the reference's own import does before
densify).
"""

from __future__ import annotations

import os

import numpy as np

from openmvs_tpu.interfaces.colmap import qvec_to_R
from openmvs_tpu.io import mvs as mvsio
from openmvs_tpu.utils.log import get_logger

log = get_logger("visualsfm")


def import_nvm(path: str, images_folder: str = "") -> mvsio.Interface:
    with open(path) as f:
        tokens = f.read().split()
    it = iter(tokens)
    magic = next(it)
    if not magic.startswith("NVM_V3"):
        raise ValueError(f"unsupported NVM magic: {magic}")
    # optional 'FixedK' calibration line is not supported
    n_cams = int(next(it))
    folder = images_folder or os.path.dirname(os.path.abspath(path))
    itf = mvsio.Interface()
    from PIL import Image as PILImage

    for i in range(n_cams):
        name = next(it)
        focal = float(next(it))
        q = np.array([float(next(it)) for _ in range(4)])
        C = np.array([float(next(it)) for _ in range(3)])
        r = float(next(it))
        next(it)  # trailing 0
        if abs(r) > 1e-12:
            log.warning("camera %s has radial distortion %.2g (ignored)", name, r)
        img_path = name if os.path.isabs(name) else os.path.join(folder, name)
        w = h = 0
        if os.path.exists(img_path):
            with PILImage.open(img_path) as im:
                w, h = im.size
        K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1.0]])
        R = qvec_to_R(q)
        plat = mvsio.Platform(
            name=f"cam{i}",
            cameras=[mvsio.CameraRig(name=name, width=w, height=h, K=K)],
            poses=[mvsio.Pose(R=R, C=C)],
        )
        meta = mvsio.ImageMeta(name=img_path, platform_id=i, camera_id=0,
                               pose_id=0, id=i)
        itf.platforms.append(plat)
        itf.images.append(meta)

    n_pts = int(next(it))
    pts, views_list, colors = [], [], []
    for _ in range(n_pts):
        X = [float(next(it)) for _ in range(3)]
        rgb = [int(next(it)) for _ in range(3)]
        n_meas = int(next(it))
        vs = set()
        for _ in range(n_meas):
            img_idx = int(next(it))
            next(it); next(it); next(it)  # feat_idx, u, v
            vs.add(img_idx)
        vs = sorted(v for v in vs if v < n_cams)
        if len(vs) < 2:
            continue
        pts.append(X)
        views_list.append(np.asarray(vs, np.uint32))
        colors.append(rgb)
    itf.points = np.asarray(pts, np.float32).reshape(-1, 3)
    itf.point_views = views_list
    itf.colors = np.asarray(colors, np.uint8).reshape(-1, 3)
    log.info("NVM import: %d cameras, %d points", n_cams, len(itf.points))
    return itf
