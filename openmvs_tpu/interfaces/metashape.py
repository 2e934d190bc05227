"""Agisoft Metashape / BlocksExchange XML import (apps/InterfaceMetashape
equivalent, InterfaceMetashape.cpp:83,228).

Supports the Metashape `doc.xml`/`cameras.xml` layout: <sensor> intrinsics
(fx/fy/cx/cy or f + principal point, resolution) and <camera> 4x4
camera-to-world transforms, plus the chunk-level component transform
(rotation/translation/scale).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict

import numpy as np

from openmvs_tpu.io import mvs as mvsio
from openmvs_tpu.utils.log import get_logger

log = get_logger("metashape")


def _parse_sensor(s) -> tuple:
    res = s.find("resolution")
    w = int(res.get("width")) if res is not None else 0
    h = int(res.get("height")) if res is not None else 0
    calib = None
    for c in s.findall("calibration"):
        if c.get("class", "adjusted") in ("adjusted", "initial"):
            calib = c
            if c.get("class", "adjusted") == "adjusted":
                break
    if calib is None:
        return None
    def val(tag, default=None):
        el = calib.find(tag)
        return float(el.text) if el is not None else default
    cres = calib.find("resolution")
    if cres is not None:
        w = int(cres.get("width"))
        h = int(cres.get("height"))
    f = val("f")
    fx = val("fx", f)
    fy = val("fy", f)
    cx = val("cx", 0.0)
    cy = val("cy", 0.0)
    # Metashape cx/cy are offsets from the image center
    K = np.array([[fx, 0, w / 2 + cx], [0, fy, h / 2 + cy], [0, 0, 1.0]])
    for tag in ("k1", "k2", "k3", "p1", "p2"):
        v = val(tag, 0.0)
        if v and abs(v) > 1e-12:
            log.warning("sensor %s has distortion %s=%.2g (ignored; undistort first)",
                        s.get("id"), tag, v)
            break
    return K, w, h


def import_metashape(xml_path: str, images_folder: str = "") -> mvsio.Interface:
    tree = ET.parse(xml_path)
    root = tree.getroot()
    found = root.find(".//chunk")
    chunk = found if found is not None else root

    # component/chunk transform (applied to camera poses)
    Tr = np.eye(4)
    tr = chunk.find(".//transform")
    if tr is not None and tr.find("rotation") is not None:
        R = np.array([float(x) for x in tr.find("rotation").text.split()]).reshape(3, 3)
        t = np.array([float(x) for x in tr.find("translation").text.split()]) \
            if tr.find("translation") is not None else np.zeros(3)
        s = float(tr.find("scale").text) if tr.find("scale") is not None else 1.0
        Tr[:3, :3] = s * R
        Tr[:3, 3] = t

    sensors: Dict[str, tuple] = {}
    for s in chunk.findall(".//sensor"):
        parsed = _parse_sensor(s)
        if parsed is not None:
            sensors[s.get("id")] = parsed

    itf = mvsio.Interface()
    sensor_platform: Dict[str, int] = {}
    for cam in chunk.findall(".//camera"):
        sid = cam.get("sensor_id")
        te = cam.find("transform")
        if sid not in sensors or te is None or cam.get("enabled", "true") in ("false", "0"):
            continue
        M = np.array([float(x) for x in te.text.split()]).reshape(4, 4)
        M = Tr @ M                      # to world
        Rc2w = M[:3, :3]
        sc = np.cbrt(max(np.linalg.det(Rc2w), 1e-30))
        Rc2w = Rc2w / sc
        C = M[:3, 3]
        R = Rc2w.T                      # world-to-camera
        if sid not in sensor_platform:
            K, w, h = sensors[sid]
            sensor_platform[sid] = len(itf.platforms)
            itf.platforms.append(mvsio.Platform(
                name=f"sensor{sid}",
                cameras=[mvsio.CameraRig(name=f"sensor{sid}", width=w, height=h, K=K)],
            ))
        pid = sensor_platform[sid]
        plat = itf.platforms[pid]
        pose_id = len(plat.poses)
        plat.poses.append(mvsio.Pose(R=R, C=C))
        label = cam.get("label") or f"camera{cam.get('id')}"
        name = label if os.path.splitext(label)[1] else label + ".jpg"
        meta = mvsio.ImageMeta(
            name=os.path.join(images_folder, name) if images_folder else name,
            platform_id=pid, camera_id=0, pose_id=pose_id, id=len(itf.images),
        )
        itf.images.append(meta)
    log.info("Metashape import: %d cameras, %d sensors", len(itf.images), len(sensors))
    return itf
