"""OpenMVG sfm_data import (apps/InterfaceOpenMVG equivalent).

Reads OpenMVG's `sfm_data.json` (the JSON serialization of SfM_Data: views,
intrinsics, extrinsics/poses, structure) into the .mvs Interface — the same
mapping the reference performs by linking openMVG libs
(InterfaceOpenMVG.cpp:39-51,549).  Only pinhole intrinsic families are
supported (undistort first for radial models), matching the reference.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from openmvs_tpu.io import mvs as mvsio
from openmvs_tpu.utils.log import get_logger

log = get_logger("openmvg")


def import_openmvg(sfm_data_path: str, images_folder: str = "") -> mvsio.Interface:
    doc = json.load(open(sfm_data_path))
    root = doc.get("root_path", "")
    if images_folder:
        root = images_folder

    # intrinsics: id -> (K, w, h)
    intr: Dict[int, tuple] = {}
    for it in doc.get("intrinsics", []):
        key = it["key"]
        val = it["value"]
        data = val.get("ptr_wrapper", {}).get("data", {})
        w = data.get("width", 0)
        h = data.get("height", 0)
        f = data.get("focal_length", 0.0)
        pp = data.get("principal_point", [w / 2, h / 2])
        K = np.array([[f, 0, pp[0]], [0, f, pp[1]], [0, 0, 1.0]])
        poly = val.get("polymorphic_name", "pinhole")
        if "radial" in poly or "brown" in poly or "fisheye" in poly:
            log.warning("intrinsic %d is %s; using pinhole part "
                        "(undistort images first)", key, poly)
        intr[key] = (K, w, h)

    # poses: id -> (R, C)
    poses: Dict[int, tuple] = {}
    for it in doc.get("extrinsics", []):
        val = it["value"]
        R = np.array(val["rotation"], np.float64)
        C = np.array(val["center"], np.float64)
        poses[it["key"]] = (R, C)

    itf = mvsio.Interface()
    view_to_img: Dict[int, int] = {}
    intr_platform: Dict[int, int] = {}
    for it in doc.get("views", []):
        data = it["value"]["ptr_wrapper"]["data"]
        view_id = data.get("id_view", it["key"])
        intr_id = data.get("id_intrinsic", -1)
        pose_id = data.get("id_pose", -1)
        if intr_id not in intr or pose_id not in poses:
            continue  # unregistered view
        if intr_id not in intr_platform:
            K, w, h = intr[intr_id]
            plat = mvsio.Platform(
                name=f"intrinsic{intr_id}",
                cameras=[mvsio.CameraRig(name=f"cam{intr_id}", width=w, height=h, K=K)],
            )
            intr_platform[intr_id] = len(itf.platforms)
            itf.platforms.append(plat)
        pid = intr_platform[intr_id]
        plat = itf.platforms[pid]
        R, C = poses[pose_id]
        local_pose = len(plat.poses)
        plat.poses.append(mvsio.Pose(R=R, C=C))
        name = data.get("filename", f"view{view_id}")
        meta = mvsio.ImageMeta(
            name=os.path.join(root, name) if root else name,
            platform_id=pid, camera_id=0, pose_id=local_pose,
            id=len(itf.images),
        )
        view_to_img[view_id] = len(itf.images)
        itf.images.append(meta)

    pts, views_list, colors = [], [], []
    for it in doc.get("structure", []):
        val = it["value"]
        X = val["X"]
        obs = val.get("observations", [])
        vs = sorted({view_to_img[o["key"]] for o in obs if o["key"] in view_to_img})
        if len(vs) < 2:
            continue
        pts.append(X)
        views_list.append(np.asarray(vs, np.uint32))
        colors.append(val.get("rgb", [128, 128, 128]))
    itf.points = np.asarray(pts, np.float32).reshape(-1, 3)
    itf.point_views = views_list
    itf.colors = np.asarray(colors, np.uint8).reshape(-1, 3)
    log.info("OpenMVG import: %d views, %d points", len(itf.images), len(itf.points))
    return itf
