"""Host-side image IO: decode encoded bytes / files to RGB arrays.

The reference decodes with OpenCV (`cv.imdecode`,
`face_detector.dart:1412-1430`) and converts BGR->RGB during tensor
conversion; here decode happens once on host and the array is RGB from the
start (native JPEG/PNG/WebP pool preferred, then PIL, then cv2).
Everything after decode runs on device.
"""

from __future__ import annotations

import io
import threading

import numpy as np

__all__ = ["decode_image", "decode_images", "load_image", "rgb_from_yuv420",
           "normalize_channels", "validate_batch_shape", "fit_max_dim"]


def validate_batch_shape(shape) -> None:
    """Raises the same ValueError :func:`normalize_channels` would, from
    the shape alone — for eager validation on hot paths where dispatching
    the (discarded) normalization device ops per batch is pure waste
    (ServingPipeline.submit)."""
    if len(shape) == 3:
        if shape[-1] in (1, 3, 4):  # see normalize_channels
            raise ValueError(
                f"ambiguous 3-D input {tuple(shape)}: looks like a single "
                "[H, W, C] image — add a batch axis (img[None])")
        return  # [B, H, W] grayscale
    if len(shape) != 4:
        raise ValueError(
            f"expected [B, H, W, C] image batch, got shape {tuple(shape)}")
    c = shape[-1]
    if c not in (1, 3, 4):
        raise ValueError(f"unsupported channel count {c} (want 1, 3 or 4)")


def fit_max_dim(image: np.ndarray, max_dim: int) -> np.ndarray:
    """Downscales so the longer side fits ``max_dim`` (INTER_LINEAR);
    returns the input unchanged when it already fits.

    The reference's ``maxDim`` knob (`helpers.dart:488-493`) — shared by
    the camera decode paths and the example scripts so the two copies of
    the scale math can't drift.  One program compiles per image-size
    bucket, so bounding 4K+ inputs also bounds first-call compile cost.
    """
    h, w = image.shape[:2]
    if max(h, w) <= max_dim:
        return image
    import cv2
    scale = max_dim / max(h, w)
    return cv2.resize(np.ascontiguousarray(image),
                      (int(w * scale), int(h * scale)),
                      interpolation=cv2.INTER_LINEAR)


def normalize_channels(images):
    """Accepts [B,H,W,{1,3,4}] or [B,H,W]; returns device [B,H,W,3].

    Mirrors the reference's input tolerance (`bgrMatToSignedFloat32`,
    helpers.dart:377-398: BGRA drops alpha, grayscale replicates).
    Shared by the detector and segmentation entry points so every public
    path tolerates the same channel layouts."""
    import jax
    import jax.numpy as jnp

    if not isinstance(images, jax.Array):
        images = jnp.asarray(np.asarray(images))
    if images.ndim == 3:
        if images.shape[-1] in (1, 3, 4):
            # Almost certainly a single [H, W, C] image missing its batch
            # axis; reading it as a [B, H, W] grayscale batch would
            # silently return H garbage face lists.  (detect_faces routes
            # channel-shaped 3-D inputs before ever reaching here.)
            raise ValueError(
                f"ambiguous 3-D input {images.shape}: looks like a single "
                "[H, W, C] image — add a batch axis (img[None]); a "
                f"genuinely {images.shape[-1]}-px-wide grayscale batch "
                "must be passed as [B, H, W, 1]")
        images = images[..., None]  # [B, H, W] grayscale
    if images.ndim != 4:
        raise ValueError(
            f"expected [B, H, W, C] image batch, got shape {images.shape}")
    c = images.shape[-1]
    if c == 3:
        return images
    if c == 4:
        return images[..., :3]
    if c == 1:
        return jnp.broadcast_to(images, images.shape[:-1] + (3,))
    raise ValueError(f"unsupported channel count {c} (want 1, 3 or 4)")

_pool = None
_pool_lock = threading.Lock()


def _native_pool():
    """Shared native decode pool (JPEG/PNG/WebP), or None when unavailable."""
    global _pool
    with _pool_lock:
        if _pool is None:
            try:
                from .native import ImageDecoderPool
                _pool = ImageDecoderPool()
            except Exception:
                _pool = False
        return _pool or None


def _native_format(data: bytes) -> bool:
    """True when the bytes carry a container the native pool handles
    (mirrors the magic sniff in runtime/decode.cc)."""
    return (data[:2] == b"\xff\xd8"
            or data[:8] == b"\x89PNG\r\n\x1a\n"
            or (data[:4] == b"RIFF" and data[8:12] == b"WEBP"))


def decode_image(data: bytes) -> np.ndarray:
    """Decodes JPEG/PNG/WebP/... bytes to an RGB uint8 [H, W, 3] array.

    JPEG/PNG/WebP go through the native libjpeg/libpng/libwebp pool when
    built; everything else (or when the native runtime is absent, or for
    edge cases the native layer rejects, e.g. 16-bit PNG and animated
    WebP) falls back to PIL, then cv2.  Raises ValueError on undecodable
    bytes (the reference raises FormatException,
    `face_detector.dart:497-499`).
    """
    pool = _native_pool()
    if pool is not None and _native_format(data):
        try:
            return pool.decode(data)
        except ValueError:
            pass  # e.g. progressive/16-bit edge cases — fall back below
    pil_error = None
    try:
        from PIL import Image
        try:
            return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        except Exception as e:
            pil_error = e  # fall through to cv2 (it decodes formats PIL lacks)
    except ImportError:
        pass
    try:
        import cv2
        arr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if arr is not None:
            return arr[..., ::-1].copy()
    except ImportError:
        if pil_error is None:
            raise RuntimeError(
                "Neither PIL nor cv2 available for decode") from None
    raise ValueError(f"Failed to decode image bytes"
                     + (f": {pil_error}" if pil_error else ""))


def decode_images(datas: list[bytes]) -> list[np.ndarray]:
    """Batch decode; JPEG/PNG/WebP batches (formats may be mixed) hit the
    threaded native pool."""
    pool = _native_pool()
    if pool is not None and all(_native_format(d) for d in datas):
        try:
            return pool.decode_batch(datas)
        except ValueError:
            pass
    return [decode_image(d) for d in datas]


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

    def upsample2(c):
        full = np.repeat(np.repeat(c, 2, axis=0), 2, axis=1)
        # Odd-dimension frames have ceil-half chroma coverage short by one
        # row/col after 2x repeat; extend with the edge sample.
        pad_h, pad_w = max(0, h - full.shape[0]), max(0, w - full.shape[1])
        if pad_h or pad_w:
            full = np.pad(full, ((0, pad_h), (0, pad_w)), mode="edge")
        return full[:h, :w]

    u_full = upsample2(u)
    v_full = upsample2(v)
    yf = y.astype(np.float32) - 16.0
    uf = u_full.astype(np.float32) - 128.0
    vf = v_full.astype(np.float32) - 128.0
    r = 1.164 * yf + 1.596 * vf
    g = 1.164 * yf - 0.392 * uf - 0.813 * vf
    b = 1.164 * yf + 2.017 * uf
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
