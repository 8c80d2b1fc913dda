"""Result rendering: boxes, keypoints, mesh, contours, iris, masks.

Host-side analog of the reference's Flutter overlay painters
(`lib/src/ui/overlay_painters.dart`: DetectionsPainter, mesh/contour/iris
painters, segmentation mask rendering).  Draws onto numpy RGB images so
demos, notebooks, and golden-image tests share one implementation.
"""

from __future__ import annotations

import numpy as np

from ..pipeline.types import (EYE_LANDMARK_CONNECTIONS,
                              FACE_CONTOUR_MESH_INDICES, Face,
                              FaceContourType)

__all__ = ["draw_detections", "draw_mesh", "draw_contours", "draw_iris",
           "draw_segmentation", "annotate", "cover_fit_transform"]

BOX_COLOR = (0, 255, 0)
KP_COLOR = (255, 64, 64)
MESH_COLOR = (64, 160, 255)
CONTOUR_COLOR = (255, 220, 0)
IRIS_COLOR = (255, 0, 255)


def _clip(v, lo, hi):
    return int(min(max(v, lo), hi))


def _draw_line(img, x0, y0, x1, y1, color):
    h, w = img.shape[:2]
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1))
    xs = np.linspace(x0, x1, n + 1)
    ys = np.linspace(y0, y1, n + 1)
    xi = xs.round().astype(int)
    yi = ys.round().astype(int)
    # Clip (drop out-of-image samples) rather than clamping to the border,
    # which would smear off-screen geometry along the edges.
    inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    img[yi[inside], xi[inside]] = color


def _draw_rect(img, x0, y0, x1, y1, color):
    _draw_line(img, x0, y0, x1, y0, color)
    _draw_line(img, x1, y0, x1, y1, color)
    _draw_line(img, x1, y1, x0, y1, color)
    _draw_line(img, x0, y1, x0, y0, color)


def _draw_dot(img, x, y, color, r=2):
    h, w = img.shape[:2]
    x0, x1 = _clip(x - r, 0, w - 1), _clip(x + r, 0, w - 1)
    y0, y1 = _clip(y - r, 0, h - 1), _clip(y + r, 0, h - 1)
    img[y0:y1 + 1, x0:x1 + 1] = color


def draw_detections(img: np.ndarray, faces: list[Face],
                    color=BOX_COLOR, kp_color=KP_COLOR) -> np.ndarray:
    """Boxes + the 6 detector keypoints (DetectionsPainter analog)."""
    out = np.array(img, copy=True)
    h, w = out.shape[:2]
    for f in faces:
        x0, y0, x1, y1 = f.bounding_box_pixels
        _draw_rect(out, x0, y0, x1, y1, color)
        for t, p in [(t, f.landmarks[t]) for t in f.landmarks._points]:
            if p is not None:
                _draw_dot(out, p[0], p[1], kp_color)
    return out


def draw_mesh(img: np.ndarray, faces: list[Face],
              color=MESH_COLOR) -> np.ndarray:
    """All 468 mesh points as dots."""
    out = np.array(img, copy=True)
    for f in faces:
        if f.mesh is None:
            continue
        for x, y, _ in f.mesh.points:
            _draw_dot(out, x, y, color, r=1)
    return out


def draw_contours(img: np.ndarray, faces: list[Face],
                  color=CONTOUR_COLOR) -> np.ndarray:
    """Polyline contours (face oval, eyes, brows, lips, nose)."""
    out = np.array(img, copy=True)
    for f in faces:
        if f.mesh is None:
            continue
        for ctype in FACE_CONTOUR_MESH_INDICES:
            pts = f.mesh.contour(ctype)
            for a, b in zip(pts[:-1], pts[1:]):
                _draw_line(out, a[0], a[1], b[0], b[1], color)
            if ctype == FaceContourType.FACE and len(pts) > 2:
                _draw_line(out, pts[-1][0], pts[-1][1],
                           pts[0][0], pts[0][1], color)
    return out


def draw_iris(img: np.ndarray, faces: list[Face],
              color=IRIS_COLOR) -> np.ndarray:
    """Iris centers/contours and eyelid rings (iris painter analog)."""
    out = np.array(img, copy=True)
    for f in faces:
        eyes = f.eyes
        if eyes is None:
            continue
        for eye in (eyes.left_eye, eyes.right_eye):
            if eye is None:
                continue
            _draw_dot(out, eye.iris_center[0], eye.iris_center[1], color)
            for p in eye.iris_contour:
                _draw_dot(out, p[0], p[1], color, r=1)
            ring = eye.contour
            for a, b in EYE_LANDMARK_CONNECTIONS:
                if a < len(ring) and b < len(ring):
                    _draw_line(out, ring[a][0], ring[a][1],
                               ring[b][0], ring[b][1], color)
    return out


def draw_segmentation(img: np.ndarray, mask, color=(0, 128, 255),
                      alpha: float = 0.5, threshold: float = 0.5
                      ) -> np.ndarray:
    """Blends the person mask over the image (LiveSegmentationPainter
    analog).  ``mask`` is a SegmentationMask; it is upsampled to the image
    size first."""
    out = np.array(img, copy=True).astype(np.float32)
    up = mask.upsample(target_width=img.shape[1], target_height=img.shape[0],
                       max_size=0)
    m = (up.data >= threshold)[..., None] * alpha
    out = out * (1 - m) + np.asarray(color, np.float32) * m
    return out.astype(np.uint8)


def annotate(img: np.ndarray, faces: list[Face], mask=None) -> np.ndarray:
    """Everything at once — the demo-app overlay."""
    out = img
    if mask is not None:
        out = draw_segmentation(out, mask)
    out = draw_detections(out, faces)
    out = draw_contours(out, faces)
    out = draw_iris(out, faces)
    return out


def cover_fit_transform(src_w: int, src_h: int, dst_w: int, dst_h: int
                        ) -> tuple[float, float, float]:
    """(scale, dx, dy) mapping source-image pixels onto a cover-fit viewport.

    The reference's camera-overlay painters map detection coordinates onto
    a preview that fills the widget BoxFit.cover-style
    (`overlay_painters.dart:196` et al.): uniform scale = max(dstW/srcW,
    dstH/srcH), centered, edges cropped.  dst = src * scale + (dx, dy).
    """
    if min(src_w, src_h, dst_w, dst_h) <= 0:
        raise ValueError("cover_fit_transform requires positive dimensions")
    scale = max(dst_w / src_w, dst_h / src_h)
    dx = (dst_w - src_w * scale) * 0.5
    dy = (dst_h - src_h * scale) * 0.5
    return scale, dx, dy
