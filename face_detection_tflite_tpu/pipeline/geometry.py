"""Face geometry math, written on jax.numpy so it runs inside compiled
programs (vectorized over the face slab) and on host numpy arrays alike.

Port of the semantics of `lib/src/shared/face_geometry.dart` (cited per
function).  The reference applies these per face on the host; here they are
batched device ops between network stages.
"""

from __future__ import annotations

import jax.numpy as jnp

# Canonical mesh indices (`face_geometry.dart:155-168, 170-180`).
MESH_LEFT_EYE_CORNERS = (33, 133)
MESH_RIGHT_EYE_CORNERS = (362, 263)
MESH_FOREHEAD_TOP = 10
MESH_CHIN_BOTTOM = 152
MESH_LEFT_CHEEK = 234
MESH_RIGHT_CHEEK = 454


def compute_face_alignment(keypoints_xy, img_w, img_h):
    """ROI (theta, cx, cy, size) from detector eye/mouth keypoints.

    `face_geometry.dart:17-45`: theta = atan2 of the eye vector; size =
    max(3.6*mouthDist, 4.0*eyeDist); center = eyeMid + 0.1*mouthVec.

    Args:
      keypoints_xy: [..., 6, 2] normalized keypoints (leftEye, rightEye,
        noseTip, mouth, tragions).
    Returns:
      (theta, cx, cy, size) arrays with the leading batch shape; cx/cy/size
      in pixels.
    """
    lx = keypoints_xy[..., 0, 0] * img_w
    ly = keypoints_xy[..., 0, 1] * img_h
    rx = keypoints_xy[..., 1, 0] * img_w
    ry = keypoints_xy[..., 1, 1] * img_h
    mx = keypoints_xy[..., 3, 0] * img_w
    my = keypoints_xy[..., 3, 1] * img_h

    eye_cx = (lx + rx) * 0.5
    eye_cy = (ly + ry) * 0.5
    vex = rx - lx
    vey = ry - ly
    vmx = mx - eye_cx
    vmy = my - eye_cy

    theta = jnp.arctan2(vey, vex)
    eye_dist = jnp.sqrt(vex * vex + vey * vey)
    mouth_dist = jnp.sqrt(vmx * vmx + vmy * vmy)
    size = jnp.maximum(mouth_dist * 3.6, eye_dist * 4.0)
    cx = eye_cx + vmx * 0.1
    cy = eye_cy + vmy * 0.1
    return theta, cx, cy, size


def transform_mesh_to_absolute(lm_norm, cx, cy, size, theta):
    """Normalized mesh (crop space) -> absolute pixels.

    `face_geometry.dart:48-73`: abs = c + size * R(theta) @ (p - 0.5),
    z_out = z * size.

    Args:
      lm_norm: [..., N, 3]; cx/cy/size/theta: [...] scalars per face.
    """
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    px = lm_norm[..., 0] - 0.5
    py = lm_norm[..., 1] - 0.5
    s = size[..., None]
    x = cx[..., None] + s * (ct[..., None] * px - st[..., None] * py)
    y = cy[..., None] + s * (st[..., None] * px + ct[..., None] * py)
    z = lm_norm[..., 2] * s
    return jnp.stack([x, y, z], axis=-1)


def transform_mesh_flat_to_absolute(flat, cx, cy, size, theta):
    """Flat [..., N*3] crop-space landmarks -> flat absolute pixels.

    `face_geometry.dart:80-105` (the web path's allocation-free variant of
    :func:`transform_mesh_to_absolute`); same math, flat layout in/out.
    """
    pts = jnp.reshape(flat, flat.shape[:-1] + (-1, 3))
    out = transform_mesh_to_absolute(pts, cx, cy, size, theta)
    return jnp.reshape(out, flat.shape)


def transform_iris_norm_to_absolute(lm_norm, cx, cy, size, theta, is_right):
    """Iris-crop landmarks -> absolute pixels, undoing the right-eye flip.

    `face_geometry.dart:109-125`.  Note the reference rotates back with
    R(theta) (not R(theta)^T, which would be the exact inverse of the
    warp's sampling map); reproduced verbatim for output parity.  z passes
    through untouched (iris z is not used geometrically).
    """
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    px = jnp.where(is_right, 1.0 - lm_norm[..., 0], lm_norm[..., 0]) - 0.5
    py = lm_norm[..., 1] - 0.5
    s = size[..., None] if jnp.ndim(size) else size
    lx = px * s
    ly = py * s
    ctb = ct[..., None] if jnp.ndim(ct) else ct
    stb = st[..., None] if jnp.ndim(st) else st
    cxb = cx[..., None] if jnp.ndim(cx) else cx
    cyb = cy[..., None] if jnp.ndim(cy) else cy
    x = cxb + lx * ctb - ly * stb
    y = cyb + lx * stb + ly * ctb
    return jnp.stack([x, y, lm_norm[..., 2]], axis=-1)


def eye_rois_from_mesh(mesh_abs):
    """Eye ROIs from mesh corners 33/133 (left) and 362/263 (right).

    `face_geometry.dart:155-168`: center = corner midpoint, size =
    2.3 * eyeDist, theta = atan2 of the corner vector.

    Args:
      mesh_abs: [..., 468, 3].
    Returns:
      (cx, cy, size, theta), each [..., 2] with eye index last
      (0 = image-left, 1 = image-right).
    """
    def roi(a, b):
        p0 = mesh_abs[..., a, :2]
        p1 = mesh_abs[..., b, :2]
        c = (p0 + p1) * 0.5
        d = p1 - p0
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
        theta = jnp.arctan2(d[..., 1], d[..., 0])
        return c[..., 0], c[..., 1], dist * 2.3, theta

    lcx, lcy, ls, lt = roi(*MESH_LEFT_EYE_CORNERS)
    rcx, rcy, rs, rt = roi(*MESH_RIGHT_EYE_CORNERS)
    cx = jnp.stack([lcx, rcx], axis=-1)
    cy = jnp.stack([lcy, rcy], axis=-1)
    size = jnp.stack([ls, rs], axis=-1)
    theta = jnp.stack([lt, rt], axis=-1)
    return cx, cy, size, theta


def head_euler_angles_from_mesh(mesh_abs):
    """(pitch, yaw, roll) in degrees, ML Kit sign convention.

    `face_geometry.dart:175-247`: orthonormal head frame from forehead/chin/
    cheek landmarks via Gram-Schmidt, then aerospace ZYX extraction, signs
    flipped to ML Kit semantics.

    Args:
      mesh_abs: [..., 468, 3].
    Returns:
      [..., 3] angles (pitch, yaw, roll) in degrees.
    """
    f = mesh_abs[..., MESH_FOREHEAD_TOP, :]
    c = mesh_abs[..., MESH_CHIN_BOTTOM, :]
    l = mesh_abs[..., MESH_LEFT_CHEEK, :]
    r = mesh_abs[..., MESH_RIGHT_CHEEK, :]

    right = r - l
    down = c - f
    rlen = jnp.linalg.norm(right, axis=-1, keepdims=True)
    dlen = jnp.linalg.norm(down, axis=-1, keepdims=True)
    right = right / jnp.maximum(rlen, 1e-12)
    down = down / jnp.maximum(dlen, 1e-12)

    ddr = jnp.sum(down * right, axis=-1, keepdims=True)
    down = down - ddr * right
    dlen2 = jnp.linalg.norm(down, axis=-1, keepdims=True)
    down = down / jnp.maximum(dlen2, 1e-12)

    # back = right x down, z component only.
    bz = (right[..., 0] * down[..., 1] - right[..., 1] * down[..., 0])

    pitch = jnp.arctan2(down[..., 2], bz)
    yaw = jnp.arcsin(jnp.clip(-right[..., 2], -1.0, 1.0))
    roll = jnp.arctan2(right[..., 1], right[..., 0])
    deg = 180.0 / jnp.pi
    angles = jnp.stack([-pitch * deg, -yaw * deg, -roll * deg], axis=-1)
    # Degenerate frames (coincident landmarks / parallel axes) return NaN,
    # mirroring the reference's null (face_geometry.dart:215-229); the Face
    # getter then falls back to roll-from-eyes.
    degenerate = ((rlen < 1e-6) | (dlen < 1e-6) | (dlen2 < 1e-6))[..., 0]
    return jnp.where(degenerate[..., None], jnp.nan, angles)


def roll_from_eyes(left_eye_xy, right_eye_xy):
    """Fast-mode roll fallback from two eye points (`face_geometry.dart:252`)."""
    d = right_eye_xy - left_eye_xy
    return -jnp.arctan2(d[..., 1], d[..., 0]) * (180.0 / jnp.pi)


def face_detection_to_roi(box, expand_fraction=0.6):
    """Expanded square ROI from a normalized box (`face_geometry.dart:260`).

    Args:
      box: [..., 4] (xmin, ymin, xmax, ymax).
    """
    w = box[..., 2] - box[..., 0]
    h = box[..., 3] - box[..., 1]
    cx = (box[..., 0] + box[..., 2]) * 0.5
    cy = (box[..., 1] + box[..., 3]) * 0.5
    ew = w * (1.0 + expand_fraction)
    eh = h * (1.0 + expand_fraction)
    s = jnp.maximum(ew, eh) * 0.5
    return jnp.stack([cx - s, cy - s, cx + s, cy + s], axis=-1)


def iris_center_from_points(pts):
    """The iris point nearest the 5-point centroid (`face_types.dart:976`).

    Args:
      pts: [..., K, 3].
    Returns:
      [..., 3] — an actual input point, not the centroid.
    """
    centroid = jnp.mean(pts[..., :2], axis=-2, keepdims=True)
    d = jnp.sum((pts[..., :2] - centroid) ** 2, axis=-1)
    best = jnp.argmin(d, axis=-1)
    return jnp.take_along_axis(
        pts, best[..., None, None].astype(jnp.int32), axis=-2
    ).squeeze(-2)
