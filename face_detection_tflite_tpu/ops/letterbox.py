"""Letterbox preprocessing as a fused XLA computation.

The reference letterboxes on the host with OpenCV (`convertImageToTensor`,
`lib/src/util/helpers.dart:303-368`): aspect-preserving INTER_LINEAR resize,
black padding, then BGR->RGB + [-1, 1] normalization.  Here the same
transform is expressed as two interpolation matmuls (MXU-friendly separable
bilinear resize with cv2 INTER_LINEAR pixel-center semantics), a pad, and a
fused normalize — compiled into the same XLA program as the detector
backbone, so the raw uint8/float image batch is the only host->device
transfer.

All geometry (scale, new size, pad split) is static per (src, dst) shape
pair, mirroring `computeLetterboxParams` from flutter_litert.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = ["LetterboxParams", "letterbox_params", "resize_matrix",
           "letterbox_image", "normalize_image"]


@dataclasses.dataclass(frozen=True)
class LetterboxParams:
    """Static letterbox geometry for one (src, dst) shape pair."""

    src_h: int
    src_w: int
    dst_h: int
    dst_w: int
    new_h: int
    new_w: int
    pad_top: int
    pad_bottom: int
    pad_left: int
    pad_right: int

    @property
    def padding(self) -> tuple[float, float, float, float]:
        """Normalized (top, bottom, left, right), as `ImageTensor.padding`."""
        return (
            self.pad_top / self.dst_h,
            self.pad_bottom / self.dst_h,
            self.pad_left / self.dst_w,
            self.pad_right / self.dst_w,
        )


def letterbox_params(src_h: int, src_w: int, dst_h: int, dst_w: int
                     ) -> LetterboxParams:
    """Aspect-preserving fit of (src_h, src_w) into (dst_h, dst_w).

    Sizes round like Dart's ``.round()`` — half AWAY from zero (the
    reference's letterbox lives in Dart) — not Python's half-to-even;
    the two differ only at exact .5 products (e.g. 170x512 -> 128 gives
    42.5), but there they shift the resize and pad split by a pixel.
    """
    scale = min(dst_w / src_w, dst_h / src_h)

    def _dart_round(x: float) -> int:
        return int(np.floor(x + 0.5))

    new_w = min(dst_w, max(1, _dart_round(src_w * scale)))
    new_h = min(dst_h, max(1, _dart_round(src_h * scale)))
    pad_w = dst_w - new_w
    pad_h = dst_h - new_h
    pad_left = pad_w // 2
    pad_top = pad_h // 2
    return LetterboxParams(
        src_h=src_h, src_w=src_w, dst_h=dst_h, dst_w=dst_w,
        new_h=new_h, new_w=new_w,
        pad_top=pad_top, pad_bottom=pad_h - pad_top,
        pad_left=pad_left, pad_right=pad_w - pad_left,
    )


def resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] bilinear weights with cv2.INTER_LINEAR semantics.

    cv2 samples src((x + 0.5) * (in/out) - 0.5) and clamps to the border —
    identical to TFLite's half_pixel_centers=True.  The single-resample warp
    in the reference relies on exactly this alignment
    (`helpers.dart:604-612`).
    """
    m = np.zeros((out_size, in_size), np.float32)
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    for o in range(out_size):
        m[o, lo[o]] += 1.0 - frac[o]
        m[o, hi[o]] += frac[o]
    return m


def resize_taps(in_size: int, out_size: int
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lo, hi, frac) 2-tap bilinear sampling plan, cv2 semantics.

    The interpolation matrix of :func:`resize_matrix` has exactly two
    nonzeros per row; materializing it as a dense matmul wastes
    ``in_size/2`` times the FLOPs.  These static gather indices compute the
    identical result as two takes + one FMA per axis.
    """
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, in_size - 1).astype(np.int32)
    frac = (src - lo).astype(np.float32)
    return lo, hi, frac


def resize_bilinear_exact(x, out_h: int, out_w: int):
    """cv2.INTER_LINEAR-exact separable resize of [H, W, C] via static
    2-tap gathers (identical math to the dense-matrix path, ~in/2 x
    fewer FLOPs; see tests/test_ops.py::TestResizeMatrix).

    The first (vertical) pass gathers rows in the SOURCE dtype and casts
    after the take — exact for uint8 and 4x less gather traffic than
    pre-casting the whole image to float32."""
    h, w = x.shape[0], x.shape[1]
    if out_h != h:
        lo, hi, frac = resize_taps(h, out_h)
        f = jnp.asarray(frac)[:, None, None]
        x = jnp.take(x, jnp.asarray(lo), axis=0).astype(jnp.float32) * \
            (1.0 - f) + \
            jnp.take(x, jnp.asarray(hi), axis=0).astype(jnp.float32) * f
    else:
        x = x.astype(jnp.float32)
    if out_w != w:
        lo, hi, frac = resize_taps(w, out_w)
        f = jnp.asarray(frac)[None, :, None]
        x = jnp.take(x, jnp.asarray(lo), axis=1) * (1.0 - f) + \
            jnp.take(x, jnp.asarray(hi), axis=1) * f
    return x


def normalize_image(img):
    """uint8/float [0, 255] RGB -> float32 [-1, 1] (`helpers.dart:377-421`)."""
    return img.astype(jnp.float32) * (1.0 / 127.5) - 1.0


def letterbox_image(img, params: LetterboxParams):
    """Letterboxes one [H, W, 3] image to [dst_h, dst_w, 3] in [-1, 1].

    Resize-then-normalize (both linear, so the order is free); the resize
    is the cv2-exact 2-tap gather form, gathering in the source dtype
    (pass uint8 images as-is — casting first only wastes bandwidth).
    """
    x = resize_bilinear_exact(img, params.new_h, params.new_w)
    x = normalize_image(x)
    x = jnp.pad(
        x,
        ((params.pad_top, params.pad_bottom),
         (params.pad_left, params.pad_right),
         (0, 0)),
        constant_values=-1.0,  # black after [-1, 1] normalization
    )
    return x
