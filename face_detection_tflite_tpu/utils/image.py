"""Host-side image IO: decode encoded bytes / files to RGB arrays.

The reference decodes with OpenCV (`cv.imdecode`,
`face_detector.dart:1412-1430`) and converts BGR->RGB during tensor
conversion; here decode happens once on host and the array is RGB from the
start (PIL preferred, cv2 fallback).  Everything after decode runs on
device.
"""

from __future__ import annotations

import io

import numpy as np

__all__ = ["decode_image", "load_image", "rgb_from_yuv420"]


def decode_image(data: bytes) -> np.ndarray:
    """Decodes JPEG/PNG/... bytes to an RGB uint8 [H, W, 3] array."""
    try:
        from PIL import Image
        img = Image.open(io.BytesIO(data)).convert("RGB")
        return np.asarray(img)
    except ImportError:
        pass
    try:
        import cv2
        arr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if arr is None:
            raise ValueError("Failed to decode image bytes")
        return arr[..., ::-1].copy()
    except ImportError as e:
        raise RuntimeError("Neither PIL nor cv2 available for decode") from e


def load_image(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return decode_image(f.read())


def rgb_from_yuv420(y: np.ndarray, u: np.ndarray, v: np.ndarray
                    ) -> np.ndarray:
    """Planar YUV420 (BT.601 video range) -> RGB uint8.

    Camera-stream analog of the reference's `cameraFrameToBgrMat` YUV plans
    (`helpers.dart:479-560`, I420 path), vectorized in numpy.
    """
    h, w = y.shape
    u_full = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
    v_full = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
    yf = y.astype(np.float32) - 16.0
    uf = u_full.astype(np.float32) - 128.0
    vf = v_full.astype(np.float32) - 128.0
    r = 1.164 * yf + 1.596 * vf
    g = 1.164 * yf - 0.392 * uf - 0.813 * vf
    b = 1.164 * yf + 2.017 * uf
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
