"""Detection/face gates — mask updates on the fixed-size detection slab.

Port of `lib/src/shared/face_gates.dart`.  The reference filters Dart lists;
on TPU the detections live in a fixed [MAX_FACES] slab, so gating is a
validity-mask AND (list filtering would be a dynamic shape).  The arithmetic
is kept identical: inclusive comparisons, pixel-space width clipping
(`boxVisibleWidthFraction`, face_gates.dart:115 — scale to pixels, clip,
divide; deliberately NOT normalized-space clipping).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["validate_face_gates", "box_visible_width_fraction",
           "apply_detection_gates_mask"]


def validate_face_gates(min_score: float, min_face_size: float,
                        min_face_presence_confidence: float = 0.0) -> None:
    """Fail-fast validation (`face_gates.dart:31-58`): values in [0, 1]."""
    for name, v in (("min_score", min_score),
                    ("min_face_size", min_face_size),
                    ("min_face_presence_confidence",
                     min_face_presence_confidence)):
        if math.isnan(v) or v < 0.0 or v > 1.0:
            raise ValueError(
                f"{name} must be in the inclusive range [0.0, 1.0], got {v}")


def box_visible_width_fraction(box, image_width):
    """Visible width of a normalized box as a fraction of image width.

    `face_gates.dart:115-128`; operates on [..., 4] boxes.
    """
    left = box[..., 0] * image_width
    right = box[..., 2] * image_width
    visible = jnp.minimum(right, image_width) - jnp.maximum(left, 0.0)
    frac = jnp.where(visible > 0, visible / image_width, 0.0)
    return jnp.where(image_width > 0, frac, 0.0)


def apply_detection_gates_mask(valid, scores, boxes, *, min_score: float,
                               min_face_size: float, image_width):
    """Early gate (`applyDetectionGates`, face_gates.dart:130-146) as a mask
    update: detections failing minScore/minFaceSize are invalidated before
    any per-face stage runs."""
    if min_score <= 0.0 and min_face_size <= 0.0:
        return valid
    keep = valid & (scores >= min_score)
    if min_face_size > 0.0:
        keep = keep & (box_visible_width_fraction(boxes, image_width)
                       >= min_face_size)
    return keep


# NOTE: the presence gate (`_passesPresence`, face_detector_core.dart:101)
# is applied on host in FaceDetector._materialize, where the reference's
# "null meshScore always passes" rule is expressible; there is no device
# mask variant to avoid two drifting implementations.
