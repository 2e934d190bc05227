"""Image loading & resampling utilities (host side).

Replaces the reference's per-format codecs (libs/IO/Image*.cpp) with cv2/PIL;
behavioral contract: BGR->gray float in [0,1] as the reference's Image32F
(libs/MVS/Image.cpp ReloadImage + cvtColor/convertTo), area-resampled
downscaling, and the resolution policy of Image::RecomputeMaxResolution
(libs/MVS/Image.h:84-87).
"""

from __future__ import annotations

import os

import cv2
import numpy as np


def load_color(path: str) -> np.ndarray:
    """Load an image as RGB uint8 (h, w, 3)."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"cannot read image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def to_gray(img: np.ndarray) -> np.ndarray:
    """RGB uint8 -> float32 gray in [0,1]."""
    g = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    return g.astype(np.float32) / 255.0


def resize_area(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Downscale with area filtering (matches cv::INTER_AREA in the reference)."""
    return cv2.resize(img, (width, height), interpolation=cv2.INTER_AREA)


def compute_max_resolution(width: int, height: int, level: int, min_res: int, max_res: int) -> int:
    """Pick the working resolution for the larger image dimension.

    Mirrors Image::RecomputeMaxResolution: scale down `level` times, but never
    below min_res (if the image is at least that large) nor above max_res.
    """
    size = max(width, height)
    scaled = size >> level
    if scaled < min_res:
        scaled = min(size, min_res)
    if max_res > 0 and scaled > max_res:
        scaled = max_res
    return scaled


def scale_for_max_dim(width: int, height: int, target_max_dim: int) -> float:
    return float(target_max_dim) / float(max(width, height))


def save_pfm(path: str, data: np.ndarray) -> None:
    """Write a single-channel PFM (little-endian, bottom-up row order as the
    PFM spec mandates; the reference's DepthMap::Save uses the same format)."""
    data = np.asarray(data, np.float32)
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        f.write(b"-1.0\n")
        f.write(np.flipud(data).tobytes())


def load_pfm(path: str) -> np.ndarray:
    """Read a single-channel PFM written by save_pfm (or any scanline PFM)."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"Pf":
            raise ValueError("not a single-channel PFM")
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(w * h * 4),
                             "<f4" if scale < 0 else ">f4").reshape(h, w)
    return np.flipud(data).copy()
