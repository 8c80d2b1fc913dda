"""Batched rotated-square ROI extraction (the on-device `warpAffine`).

The reference extracts every face/eye crop on the host with OpenCV
(`extractAlignedSquare`, `lib/src/util/helpers.dart:583-625`): a rotation
matrix about the ROI center plus a scale that resamples the `size`-px square
directly to the model input resolution in one pass, with pixel-center
alignment identical to crop-then-`cv.resize`.

Here the same transform is a shape-static bilinear gather: ROI parameters
(center, size, theta) are traced values, the output grid is fixed at the
model input size, so one vmapped call extracts every face crop of a batch
inside the compiled program — no host round-trips between pipeline stages.

Geometry (matching the reference exactly):
  * ``size`` is rounded to an integer pixel count first (`helpers.dart:592`);
  * ``scale = out_size / round(size)``;
  * the source center lands at ``out_size/2 + 0.5*(scale-1)``
    (`helpers.dart:604-612`), which makes the warp equivalent to cropping at
    `size` then cv2-resizing to `out_size`;
  * destination->source: ``src = c + R(theta)^T @ (dst - out_center)/scale``,
    the inverse of `transformMeshToAbsolute`
    (`lib/src/shared/face_geometry.dart:48-73`);
  * out-of-bounds samples are black (BORDER_CONSTANT).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["extract_aligned_square", "extract_rois"]


def _bilinear_sample(img, sx, sy, fill_value: float):
    """Samples [H, W, C] at float coords (sx, sy) [out, out] with bilinear
    interpolation and constant fill outside the image.

    Taps are gathered in the SOURCE dtype and cast to float32 afterwards:
    uint8->float32 conversion is exact, and gathering uint8 moves 4x fewer
    bytes than gathering a pre-cast float image (measured 32.4 -> 24.2 ms
    per 16-crop batch on the TPU relay; see docs/PERF.md).  Each tap
    gathers through a flattened [H*W, C] view with a single precomputed
    linear index — XLA lowers the 1-D start-index gather substantially
    better than 2-D advanced indexing on TPU (measured 24.0 -> 18.4 ms
    per 16-crop 192px batch, bit-exact; 2x2-patch lax.gather and packed
    u32-RGBA formulations both measured slower)."""
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(h * w, img.shape[2])
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        # flat-index gather in source dtype -> [out, out, C]
        val = flat[yc * w + xc].astype(jnp.float32)
        inside = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        return jnp.where(inside[..., None], val, fill_value)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    wx = fx[..., None]
    wy = fy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def extract_aligned_square(img, cx, cy, size, theta, *, out_size: int,
                           flip_x: bool = False, fill_value: float = 0.0):
    """Extracts one rotated square ROI from [H, W, C] to [out, out, C].

    Args:
      img: source image (uint8 or float; uint8 is preferred — taps gather
        in the source dtype and convert exactly, so keeping the image
        uint8 until the warp saves 4x gather bandwidth).
      cx, cy: ROI center in source pixels (traced scalars).
      size: ROI side length in source pixels (traced; rounded like the
        reference).
      theta: rotation in radians (positive rotates the ROI CCW in image
        coords, matching `computeFaceAlignment`).
      out_size: static output resolution (192 mesh / 64 iris / 112 embed).
      flip_x: horizontally mirror the crop (right-eye iris path,
        `face_detector_core.dart:567`).
      fill_value: border constant (0 = black; use -1.0 for pre-normalized
        [-1, 1] inputs).
    """
    # Dart's double.round() rounds half away from zero; for positive sizes
    # that is floor(x + 0.5) (jnp.round would round half to even).
    size_int = jnp.maximum(jnp.floor(size + 0.5), 1.0)
    scale = out_size / size_int
    out_center = out_size / 2.0 + 0.5 * (scale - 1.0)

    xs = jnp.arange(out_size, dtype=jnp.float32)
    if flip_x:
        xs = (out_size - 1) - xs
    ys = jnp.arange(out_size, dtype=jnp.float32)
    dx = (xs[None, :] - out_center) / scale  # [1, out]
    dy = (ys[:, None] - out_center) / scale  # [out, 1]

    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    sx = cx + ct * dx + st * dy
    sy = cy - st * dx + ct * dy
    return _bilinear_sample(img, sx, sy, fill_value)


def extract_rois(img, cxs, cys, sizes, thetas, *, out_size: int,
                 flip_x=None, fill_value: float = 0.0):
    """Extracts N ROIs from one image: returns [N, out, out, C].

    ``flip_x`` may be a [N] bool array (mixed left/right eye batches):
    each ROI warps unflipped and the output columns are reversed under a
    select (bit-equivalent to mirroring the sample grid — a traced flip
    can't reach `extract_aligned_square`'s static ``flip_x`` kwarg).
    """
    if flip_x is None:
        fn = lambda cx, cy, s, t: extract_aligned_square(
            img, cx, cy, s, t, out_size=out_size, fill_value=fill_value)
        return jax.vmap(fn)(cxs, cys, sizes, thetas)

    def one(cx, cy, s, t, flip):
        unflipped = extract_aligned_square(
            img, cx, cy, s, t, out_size=out_size, fill_value=fill_value)
        return jnp.where(flip, unflipped[:, ::-1, :], unflipped)

    return jax.vmap(one)(cxs, cys, sizes, thetas, flip_x)
