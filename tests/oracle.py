"""Reference-pipeline oracle: reproduces the Dart reference's full pipeline
in Python using the SAME native substrate it uses (OpenCV + TFLite
interpreter), for end-to-end parity testing of the TPU pipeline.

Each step mirrors a cited reference function; this file is the Python
analog of the reference's own integration-test ground truth.

Circularity note: the anchor generator and blendshape routing tables are
imported from the package under test; their CONTENT is independently
pinned to the reference by tests/test_reference_tables.py, which re-parses
the tables from the Dart source and re-derives the anchor grids from
scratch — so a transcription error cannot hide by reproducing on both
sides of the parity tests.
"""

from __future__ import annotations

import math

import cv2
import numpy as np

from face_detection_tflite_tpu.ops.anchors import (anchor_options_for,
                                                   generate_anchors)
from face_detection_tflite_tpu.pipeline.blendshape_input import (
    pack_indices)

_SRC, _IDX = pack_indices()


_ITP_CACHE: dict = {}


def tflite_run(path, x):
    import tensorflow as tf
    itp = _ITP_CACHE.get(path)
    if itp is None:
        # One interpreter per model path: construction + allocate cost
        # dominated the ~6-min parity suite when paid per inference
        # (set_tensor/invoke are reusable).
        itp = tf.lite.Interpreter(
            model_path=path,
            experimental_op_resolver_type=(
                tf.lite.experimental.OpResolverType
                .BUILTIN_WITHOUT_DEFAULT_DELEGATES))
        itp.allocate_tensors()
        _ITP_CACHE[path] = itp
    itp.set_tensor(itp.get_input_details()[0]["index"], x)
    itp.invoke()
    return [itp.get_tensor(od["index"]) for od in itp.get_output_details()]


def letterbox_uint8(img_rgb, out_size):
    """convertImageToTensor (helpers.dart:303-368): uint8 INTER_LINEAR
    resize, black pad, [-1, 1] normalize.  Returns (tensor, padding)."""
    h, w = img_rgb.shape[:2]
    scale = min(out_size / w, out_size / h)
    # Dart .round() (half away from zero), NOT Python half-to-even — they
    # differ at exact .5 products and the reference letterbox is Dart.
    new_w = min(out_size, max(1, int(np.floor(w * scale + 0.5))))
    new_h = min(out_size, max(1, int(np.floor(h * scale + 0.5))))
    resized = cv2.resize(img_rgb, (new_w, new_h),
                         interpolation=cv2.INTER_LINEAR)
    pad_w, pad_h = out_size - new_w, out_size - new_h
    pl, pt = pad_w // 2, pad_h // 2
    padded = cv2.copyMakeBorder(resized, pt, pad_h - pt, pl, pad_w - pl,
                                cv2.BORDER_CONSTANT, value=(0, 0, 0))
    tensor = padded.astype(np.float32) / 127.5 - 1.0
    padding = (pt / out_size, (pad_h - pt) / out_size,
               pl / out_size, (pad_w - pl) / out_size)
    return tensor, padding


def _dart_round(x):
    """Dart double.round(): half away from zero (Python round is
    half-to-even)."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def extract_aligned_square(img, cx, cy, size, theta, out_size):
    """helpers.dart:583-625 verbatim via cv2."""
    size_int = _dart_round(size)
    if size_int <= 0:
        return None
    scale = out_size / size_int
    rot = cv2.getRotationMatrix2D((cx, cy), -math.degrees(theta), scale)
    oc = out_size / 2.0 + 0.5 * (scale - 1.0)
    rot[0, 2] += oc - cx
    rot[1, 2] += oc - cy
    return cv2.warpAffine(img, rot, (out_size, out_size),
                          borderMode=cv2.BORDER_CONSTANT)


def weighted_nms(dets, iou_thresh=0.3, score_thresh=0.5, max_det=100):
    """helpers.dart:183-221 semantics (blended box, leader score/kps)."""
    filtered = sorted([d for d in dets if d["score"] >= score_thresh],
                      key=lambda d: -d["score"])
    out, remaining = [], filtered

    def iou(a, b):
        ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
        iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
        inter = ix * iy
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / ua if ua > 0 else 0.0

    while remaining and len(out) < max_det:
        lead = remaining[0]
        cluster = [d for d in remaining if iou(d["box"], lead["box"])
                   > iou_thresh]
        remaining = [d for d in remaining if iou(d["box"], lead["box"])
                     <= iou_thresh]
        ws = sum(d["score"] for d in cluster)
        blend = sum(np.asarray(d["box"]) * d["score"] for d in cluster) / ws
        out.append({"box": blend, "score": lead["score"], "kp": lead["kp"]})
    return out


def detect(img_rgb, model_path, variant):
    """Fast-mode reference path: letterbox + BlazeFace + decode + NMS +
    letterbox removal.  Boxes/keypoints normalized to the image."""
    opts = anchor_options_for(variant)
    anchors = generate_anchors(opts)
    in_size = opts.input_size_width
    tensor, padding = letterbox_uint8(img_rgb, in_size)
    outs = tflite_run(model_path, tensor[None])
    # Bind deterministically: the box tensor is the one whose last dim is 16
    # (the score tensor is [1, A] or [1, A, 1]).
    raw_boxes = next(o for o in outs if o.shape[-1] == 16).reshape(-1, 16)
    raw_scores = next(o for o in outs if o.shape[-1] != 16).reshape(-1)

    dets = []
    for i in range(len(anchors)):
        s = 1.0 / (1.0 + math.exp(-float(np.clip(raw_scores[i], -100, 100))))
        if not s >= 0.5:
            continue
        t = raw_boxes[i] / in_size
        xc, yc = t[0] + anchors[i, 0], t[1] + anchors[i, 1]
        w, h = t[2], t[3]
        if w <= 0 or h <= 0:
            continue
        kp = t[4:16].reshape(6, 2) + anchors[i]
        dets.append({"box": [xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2],
                     "score": s, "kp": kp})
    dets = weighted_nms(dets)
    pt, pb, pl, pr = padding
    sx, sy = 1.0 - (pl + pr), 1.0 - (pt + pb)
    for d in dets:
        b = d["box"]
        d["box"] = [(b[0] - pl) / sx, (b[1] - pt) / sy,
                    (b[2] - pl) / sx, (b[3] - pt) / sy]
        d["kp"] = np.stack([(d["kp"][:, 0] - pl) / sx,
                            (d["kp"][:, 1] - pt) / sy], axis=1)
    return dets


def full_pipeline(img_rgb, models_dir, variant="back"):
    """Reference full mode on one image.  Returns list of per-face dicts:
    box, kp, score, mesh_abs [468,3], mesh_score, iris [152,3],
    blendshapes [52]."""
    h, w = img_rgb.shape[:2]
    fname = {"short": "face_detection_short_range.tflite",
             "front": "face_detection_front.tflite",
             "back": "face_detection_back.tflite",
             "full": "face_detection_full_range.tflite",
             "full_sparse": "face_detection_full_range_sparse.tflite"}[variant]
    dets = detect(img_rgb, f"{models_dir}/{fname}", variant)
    faces = []
    for det in dets:
        kp = det["kp"]
        # computeFaceAlignment (face_geometry.dart:17-45)
        lx, ly = kp[0, 0] * w, kp[0, 1] * h
        rx, ry = kp[1, 0] * w, kp[1, 1] * h
        mx, my = kp[3, 0] * w, kp[3, 1] * h
        ecx, ecy = (lx + rx) / 2, (ly + ry) / 2
        vex, vey = rx - lx, ry - ly
        vmx, vmy = mx - ecx, my - ecy
        theta = math.atan2(vey, vex)
        size = max(math.hypot(vmx, vmy) * 3.6, math.hypot(vex, vey) * 4.0)
        cx, cy = ecx + vmx * 0.1, ecy + vmy * 0.1
        if _dart_round(size) <= 0:
            continue
        # warp with NEGATED theta (face_detector_core.dart:489)
        crop = extract_aligned_square(img_rgb, cx, cy, size, -theta, 192)
        mesh_in = crop.astype(np.float32) / 127.5 - 1.0
        mouts = tflite_run(f"{models_dir}/face_landmark.tflite", mesh_in[None])
        lm = next(o for o in mouts if o.size % 3 == 0 and o.size > 3)
        score_raw = next(o for o in mouts if o.size == 1)
        mesh_score = 1.0 / (1.0 + math.exp(-float(
            np.clip(score_raw.reshape(()), -100, 100))))
        pts = lm.reshape(468, 3).astype(np.float64)
        # unpack (helpers.dart:138-172, clamp + normalizeZ) then
        # transformMeshToAbsolute (face_geometry.dart:48-73)
        xn = np.clip(pts[:, 0] / 192, 0, 1)
        yn = np.clip(pts[:, 1] / 192, 0, 1)
        zn = pts[:, 2] / 192
        ct, st = math.cos(theta), math.sin(theta)
        px, py = xn - 0.5, yn - 0.5
        mesh_abs = np.stack([
            cx + size * (ct * px - st * py),
            cy + size * (st * px + ct * py),
            zn * size], axis=1)
        # Face-presence gate BEFORE the iris/blendshape stages, like the
        # reference (face_detector_core.dart:306-331): identical outputs,
        # but 3 fewer interpreter inferences per rejected face.
        if mesh_score < 0.5:
            continue
        # eye ROIs (face_geometry.dart:155-168)
        iris_all = []
        for (a, b), is_right in (((33, 133), False), ((362, 263), True)):
            p0, p1 = mesh_abs[a], mesh_abs[b]
            rcx, rcy = (p0[0] + p1[0]) / 2, (p0[1] + p1[1]) / 2
            dx, dy = p1[0] - p0[0], p1[1] - p0[1]
            rsize = math.hypot(dx, dy) * 2.3
            rtheta = math.atan2(dy, dx)
            eye = extract_aligned_square(img_rgb, rcx, rcy, rsize, rtheta, 64)
            if eye is None:
                # Degenerate eye ROI (coincident corner landmarks): the
                # reference catches the failure and keeps the face with
                # no iris (face_detector_core.dart:313-315).
                iris_all = []
                break
            if is_right:
                eye = cv2.flip(eye, 1)
            eye_in = eye.astype(np.float32) / 127.5 - 1.0
            iouts = tflite_run(f"{models_dir}/iris_landmark.tflite",
                               eye_in[None])
            flat = np.concatenate([o.reshape(-1) for o in iouts])
            ipts = flat.reshape(76, 3).astype(np.float64)
            xn2, yn2 = ipts[:, 0] / 64, ipts[:, 1] / 64
            # transformIrisNormToAbsolute (face_geometry.dart:109-125)
            ct2, st2 = math.cos(rtheta), math.sin(rtheta)
            pxn = (1.0 - xn2) if is_right else xn2
            lx2 = (pxn - 0.5) * rsize
            ly2 = (yn2 - 0.5) * rsize
            iris_all.append(np.stack([
                rcx + lx2 * ct2 - ly2 * st2,
                rcy + lx2 * st2 + ly2 * ct2,
                ipts[:, 2]], axis=1))
        if not iris_all:
            # Iris stage failed/degenerate: emit the face with mesh only,
            # like the reference's try/catch does.
            faces.append({
                "box": np.asarray(det["box"]), "kp": kp,
                "kp_refined": kp.copy(), "score": det["score"],
                "mesh_abs": mesh_abs, "mesh_score": mesh_score,
                "iris": np.zeros((0, 3)), "blendshapes": None,
            })
            continue
        iris = np.concatenate(iris_all)  # [152, 3]
        # blendshape pack + model (blendshape_input.dart:272-284)
        pts146 = np.where(_SRC[:, None].astype(bool),
                          iris[np.clip(_IDX, 0, 151), :2],
                          mesh_abs[np.clip(_IDX, 0, 467), :2])
        bouts = tflite_run(f"{models_dir}/face_blendshapes.tflite",
                           pts146[None].astype(np.float32))
        raw52 = bouts[0].reshape(52)
        # NaN output -> no blendshapes for the face (face_blendshapes.dart:189)
        coeffs = None if np.isnan(raw52).any() else np.clip(raw52, 0, 1)
        # Full-mode iris-refined eye keypoints (face_detector_core.dart:
        # 356-373): eye keypoints replaced by the iris center nearest the
        # 5-point centroid, normalized by the image size.
        kp_refined = kp.copy()
        for eye_i, (s0, s1) in enumerate(((71, 76), (147, 152))):
            pts5 = iris[s0:s1, :2]
            c = pts5.mean(axis=0)
            best = pts5[np.argmin(((pts5 - c) ** 2).sum(axis=1))]
            kp_refined[eye_i] = [best[0] / w, best[1] / h]
        faces.append({
            "box": np.asarray(det["box"]), "kp": kp,
            "kp_refined": kp_refined, "score": det["score"],
            "mesh_abs": mesh_abs, "mesh_score": mesh_score, "iris": iris,
            "blendshapes": coeffs,
        })
    return faces
