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
    """Load an image as RGB uint8 (h, w, 3).

    cv2 covers JPG/PNG/TIFF/BMP/...; formats it lacks fall back to PIL
    (TGA — libs/IO/ImageTGA.cpp role — and DDS — ImageDDS.cpp role) or to
    the SCI raw codec (ImageSCI.cpp, the reference's internal format)."""
    if path.lower().endswith(".sci"):
        return load_sci(path)
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        try:
            from PIL import Image as _PImage

            pimg = _PImage.open(path)
            return np.asarray(pimg.convert("RGB"))
        except Exception:
            raise FileNotFoundError(f"cannot read image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


# SCI: the reference's internal raw image format (libs/IO/ImageSCI.cpp).
# 12-byte header: u32 magic "SCI"+version(1), u16 width, u16 height,
# u8 PIXELFORMAT, u8 mip levels, 2 reserved; then tightly-packed scanlines
# (level 0 first).  PIXELFORMAT enum values from libs/IO/Image.h:30-52.
_SCI_MAGIC = 0x01494353
_SCI_FORMATS = {  # value -> (bytes/px, converter to RGB)
    1: (1, lambda a: np.repeat(a, 3, axis=-1)),                    # PF_A8
    2: (1, lambda a: np.repeat(a, 3, axis=-1)),                    # PF_GRAY8
    4: (3, lambda a: a),                                           # PF_R8G8B8
    5: (4, lambda a: a[..., :3]),                                  # PF_R8G8B8A8
    6: (4, lambda a: a[..., 1:]),                                  # PF_A8R8G8B8
    7: (3, lambda a: a[..., ::-1]),                                # PF_B8G8R8
    8: (4, lambda a: a[..., 2::-1]),                               # PF_B8G8R8A8
    9: (4, lambda a: a[..., :0:-1]),                               # PF_A8B8G8R8
}


def load_sci(path: str) -> np.ndarray:
    """Read an uncompressed SCI image as RGB uint8 (h, w, 3)."""
    with open(path, "rb") as f:
        hdr = f.read(12)
        if len(hdr) < 12:
            raise ValueError(f"truncated SCI image: {path}")
        magic, w, h, fmt, _levels = (
            int.from_bytes(hdr[0:4], "little"),
            int.from_bytes(hdr[4:6], "little"),
            int.from_bytes(hdr[6:8], "little"),
            hdr[8], hdr[9],
        )
        if magic != _SCI_MAGIC:
            raise ValueError(f"invalid SCI image: {path}")
        if fmt not in _SCI_FORMATS:
            raise ValueError(f"unsupported SCI pixel format {fmt}: {path}")
        stride, conv = _SCI_FORMATS[fmt]
        data = np.frombuffer(f.read(w * h * stride), np.uint8)
        if data.size < w * h * stride:
            raise ValueError(f"truncated SCI image: {path}")
        img = data.reshape(h, w, stride)
    return np.ascontiguousarray(conv(img))


def save_sci(path: str, rgb: np.ndarray) -> None:
    """Write an RGB uint8 image as SCI PF_R8G8B8 (reference-loadable)."""
    rgb = np.asarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    with open(path, "wb") as f:
        f.write(_SCI_MAGIC.to_bytes(4, "little"))
        f.write(int(w).to_bytes(2, "little"))
        f.write(int(h).to_bytes(2, "little"))
        f.write(bytes([4, 1, 0, 0]))  # PF_R8G8B8, 1 level
        f.write(np.ascontiguousarray(rgb[..., :3]).tobytes())


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
