"""The compiled pipeline program family: fast / standard / full.

This is the architectural inversion of the reference (SURVEY §7): where the
reference runs ~7 host-orchestrated interpreter dispatches per face
(`_FaceDetectorCore.detectFacesDirect`,
`lib/src/isolate/face_detector_core.dart:215-394`), here each mode is ONE
XLA program over a fixed-size face slab, batched across images with vmap:

    letterbox -> BlazeFace -> decode -> weighted NMS        (all modes)
    -> alignment -> batched ROI warp -> vmapped FaceMesh    (standard+)
    -> eye ROIs -> 2F iris crops -> vmapped Iris
    -> blendshape pack -> Blendshape MLP -> head pose       (full)

Dynamic face count is handled with MAX_FACES slabs + validity masks
(gates are mask updates, never list filters).  All shapes static; one
compile per (image bucket, mode, max_faces).

Stage math is parity-exact with the reference; see the per-op modules for
file:line citations.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..convert.executor import ConvertedModel
from ..ops import warp
from ..ops.anchors import anchor_options_for, generate_anchors
from ..ops.detections import (decode_detections, remove_letterbox,
                              weighted_nms)
from ..ops.letterbox import (letterbox_image, letterbox_params,
                             normalize_image)
from . import geometry
from .blendshape_input import pack_blendshape_input
from .config import (IRIS_INPUT_SIZE, MESH_INPUT_SIZE, RAW_SCORE_LIMIT,
                     FaceDetectionMode)
from .gates import apply_detection_gates_mask

__all__ = ["PipelineModels", "build_pipeline_program"]


class PipelineModels:
    """Bundles the converted networks and their merged params pytree."""

    def __init__(self, detector: ConvertedModel, variant: str,
                 mesh: Optional[ConvertedModel] = None,
                 iris: Optional[ConvertedModel] = None,
                 blendshapes: Optional[ConvertedModel] = None,
                 embedding: Optional[ConvertedModel] = None):
        self.detector = detector
        self.variant = variant
        self.mesh = mesh
        self.iris = iris
        self.blendshapes = blendshapes
        self.embedding = embedding
        self.detector_input_size = detector.input_shapes[0][1]
        self.anchors = generate_anchors(anchor_options_for(variant))

    @property
    def params(self) -> dict[str, Any]:
        p = {"detector": self.detector.params}
        if self.mesh is not None:
            p["mesh"] = self.mesh.params
        if self.iris is not None:
            p["iris"] = self.iris.params
        if self.blendshapes is not None:
            p["blendshapes"] = self.blendshapes.params
        if self.embedding is not None:
            p["embedding"] = self.embedding.params
        return p


def _identify_detector_outputs(outs):
    """Returns (raw_boxes [A,16], raw_scores [A]) regardless of graph output
    order (the reference identifies outputs by element count too,
    `face_detection_model.dart:198-267`)."""
    a, b = outs
    if a.size > b.size:
        boxes, scores = a, b
    else:
        boxes, scores = b, a
    return boxes.reshape(-1, 16), scores.reshape(-1)


def _identify_landmark_outputs(outs):
    """(landmarks [1404], raw score scalar): largest %3 output is landmarks,
    single-element output is the presence logit (`face_landmark.dart:154-167`)."""
    flat = [o.reshape(-1) for o in outs]
    lm = max((o for o in flat if o.size % 3 == 0), key=lambda o: o.size)
    score = next((o for o in flat if o.size == 1), None)
    return lm, score


def _unpack_landmarks(flat, in_size, *, clamp, normalize_z):
    """`helpers.dart:138-172` with zero padding (crops are warped straight
    to the model input, so letterbox padding is always 0 here)."""
    pts = flat.reshape(flat.shape[:-1] + (flat.shape[-1] // 3, 3))
    x = pts[..., 0] / in_size
    y = pts[..., 1] / in_size
    z = jnp.where(normalize_z, pts[..., 2] / in_size, pts[..., 2])
    if clamp:
        x = jnp.clip(x, 0.0, 1.0)
        y = jnp.clip(y, 0.0, 1.0)
    return jnp.stack([x, y, z], axis=-1)


def _sigmoid_clipped(x):
    return jax.nn.sigmoid(jnp.clip(x, -RAW_SCORE_LIMIT, RAW_SCORE_LIMIT))


def build_pipeline_program(models: PipelineModels, img_h: int, img_w: int,
                           mode: FaceDetectionMode = FaceDetectionMode.FULL,
                           *, max_faces: int = 16,
                           num_candidates: Optional[int] = None,
                           min_score: float = 0.0, min_face_size: float = 0.0,
                           batched: bool = True, from_detections: bool = False,
                           use_pallas_nms: bool = False,
                           face_slab: Optional[int] = None,
                           with_embeddings: bool = False):
    """Builds the single-program pipeline for one image bucket.

    Returns a traceable fn(params, images) -> dict of slab arrays.  With
    ``batched`` the images argument is [B, H, W, 3] (uint8 or float, RGB,
    0..255) and every output gains a leading B axis.  Keep uint8 inputs
    uint8: the letterbox and ROI warps gather in the source dtype.

    Output slab (D = face_slab, default max_faces):
      boxes [D,4], raw_keypoints [D,6,2], scores [D], valid [D];
      mode >= standard adds mesh [D,468,3] (absolute px), mesh_scores [D];
      full adds keypoints [D,6,2] (iris-refined; absent otherwise — the
      host defaults it to raw_keypoints), iris [D,152,3],
      blendshapes [D,52], blendshapes_valid [D], head_angles [D,3]
      (pitch, yaw, roll degrees).

    ``face_slab`` < max_faces is the SPECULATIVE form: NMS still emits the
    full max_faces detection slab (returned as det_boxes [max_faces,4],
    det_raw_keypoints, det_scores, det_valid, plus the scalar valid count
    det_count), but the per-face stages (warp/mesh/iris/blendshapes — the
    cost that scales with slab size) run only on the top-``face_slab``
    score-ordered prefix.  The caller reads det_count for overflow (the
    det_* slab itself never leaves the device on the common path) and
    re-runs the face stages (from_detections program) on a bigger prefix
    only when an image actually has more faces — the single-call fast
    path for typical streams (docs/PERF.md).
    """
    size = models.detector_input_size
    lbp = letterbox_params(img_h, img_w, size, size)
    anchors_c = jnp.asarray(models.anchors)

    compute_mesh = mode in (FaceDetectionMode.STANDARD, FaceDetectionMode.FULL)
    compute_iris = mode == FaceDetectionMode.FULL
    if compute_mesh and models.mesh is None:
        raise ValueError(f"mode {mode} requires the face mesh model")
    if compute_iris and (models.iris is None or models.blendshapes is None):
        raise ValueError(f"mode {mode} requires iris and blendshape models")
    if with_embeddings and not compute_iris:
        raise ValueError("with_embeddings requires FULL mode (embeddings "
                         "align from iris-refined eye centers, "
                         "face_detector_core.dart:419-451)")
    if with_embeddings and models.embedding is None:
        raise ValueError("with_embeddings requires the embedding model")

    def detect_stage(params, img):
        x = letterbox_image(img, lbp)
        raw_boxes, raw_scores = _identify_detector_outputs(
            models.detector.fn(params["detector"], x[None]))
        boxes, kp, scores, valid = decode_detections(
            raw_boxes, raw_scores, anchors_c, float(size))
        if use_pallas_nms:
            from ..ops.nms_pallas import weighted_nms_pallas
            boxes, kp, scores, valid = weighted_nms_pallas(
                boxes, kp, scores, valid, max_detections=max_faces,
                num_candidates=num_candidates)
        else:
            boxes, kp, scores, valid = weighted_nms(
                boxes, kp, scores, valid, max_detections=max_faces,
                num_candidates=num_candidates)
        boxes, kp = remove_letterbox(boxes, kp, lbp.padding)
        # Early gate (face_detector_core.dart:234-244): invalidate before any
        # per-face stage.
        valid = apply_detection_gates_mask(
            valid, scores, boxes, min_score=min_score,
            min_face_size=min_face_size, image_width=float(img_w))
        return boxes, kp, scores, valid

    def mesh_stage(params, img, kp, valid):
        theta, cx, cy, fsize = geometry.compute_face_alignment(
            kp, float(img_w), float(img_h))
        # Degenerate-size drop (face_detector_core.dart:258-263).
        # Dart round() == floor(x+0.5) for positive x (half away from zero).
        valid = valid & (jnp.floor(fsize + 0.5) > 0)
        # The core warps with the NEGATED alignment angle
        # (face_detector_core.dart:489, `-theta`), then maps results back
        # with +theta in transformMeshToAbsolute.
        crops = warp.extract_rois(
            img, cx, cy, fsize, -theta, out_size=MESH_INPUT_SIZE)
        crops = normalize_image(crops)

        def one(crop):
            outs = models.mesh.fn(params["mesh"], crop[None])
            lm, score = _identify_landmark_outputs(outs)
            return lm, (score if score is not None
                        else jnp.zeros((1,), jnp.float32))

        lm_flat, score_raw = jax.vmap(one)(crops)
        lm_norm = _unpack_landmarks(lm_flat, MESH_INPUT_SIZE,
                                    clamp=True, normalize_z=True)
        mesh_abs = geometry.transform_mesh_to_absolute(
            lm_norm, cx, cy, fsize, theta)
        mesh_scores = _sigmoid_clipped(score_raw.reshape(-1))
        return mesh_abs, mesh_scores, valid

    def iris_stage(params, img, mesh_abs):
        f = mesh_abs.shape[0]
        ecx, ecy, esize, etheta = geometry.eye_rois_from_mesh(mesh_abs)
        # Flatten [F, 2] -> [2F] with right-eye flip flags; iris crops use
        # the UN-negated ROI angle (face_detector_core.dart:544-556).
        flip = jnp.tile(jnp.asarray([False, True]), (f,))
        crops = warp.extract_rois(
            img, ecx.reshape(-1), ecy.reshape(-1), esize.reshape(-1),
            etheta.reshape(-1), out_size=IRIS_INPUT_SIZE, flip_x=flip)
        crops = normalize_image(crops)

        def one(crop):
            outs = models.iris.fn(params["iris"], crop[None])
            # concat all outputs in graph order: 71*3 contour + 5*3 iris
            return jnp.concatenate([o.reshape(-1) for o in outs])

        pts_flat = jax.vmap(one)(crops)  # [2F, 228]
        pts = _unpack_landmarks(pts_flat, IRIS_INPUT_SIZE,
                                clamp=False, normalize_z=False)  # [2F,76,3]
        is_right = flip[:, None]
        abs_pts = geometry.transform_iris_norm_to_absolute(
            pts, ecx.reshape(-1), ecy.reshape(-1), esize.reshape(-1),
            etheta.reshape(-1), is_right)
        return abs_pts.reshape(f, 152, 3)

    def blendshape_stage(params, mesh_abs, iris_abs):
        packed = pack_blendshape_input(mesh_abs, iris_abs)  # [F,146,2]

        def one(x):
            (coeffs,) = models.blendshapes.fn(params["blendshapes"], x[None])
            return coeffs.reshape(-1)

        raw = jax.vmap(one)(packed)  # [F,52]
        ok = ~jnp.any(jnp.isnan(raw), axis=-1)
        # NaN-sanitize + clamp (face_blendshapes.dart:191-200).
        return jnp.clip(jnp.nan_to_num(raw), 0.0, 1.0), ok

    def embedding_stage(params, img, refined_kp):
        """MobileFaceNet embeddings as a fused FULL-mode stage (optional).

        Alignment is `computeEmbeddingAlignment`
        (`face_embedding.dart:362-384`) on the IRIS-REFINED eye centers
        (the reference's getFaceEmbedding path uses the refined eyes too,
        face_detector.dart:703-711); warp+net+L2 is the module-level
        `embed_rois` shared with `FaceEmbedding`, so the two paths cannot
        drift.  One extra vmapped network in the single program instead
        of a separate dispatch + 3.3 MB re-upload.
        """
        from ..models.embedding import alignment_from_eyes, embed_rois
        cx, cy, esize, theta = alignment_from_eyes(
            refined_kp[:, 0, 0] * img_w, refined_kp[:, 0, 1] * img_h,
            refined_kp[:, 1, 0] * img_w, refined_kp[:, 1, 1] * img_h)
        return embed_rois(models.embedding.fn, params["embedding"], img,
                          cx, cy, esize, theta)

    def refine_keypoints(kp, iris_abs):
        """Iris-refined eye keypoints (face_detector_core.dart:356-373)."""
        left = geometry.iris_center_from_points(iris_abs[:, 71:76])
        right = geometry.iris_center_from_points(iris_abs[:, 147:152])
        kp = kp.at[:, 0, 0].set(left[:, 0] / img_w)
        kp = kp.at[:, 0, 1].set(left[:, 1] / img_h)
        kp = kp.at[:, 1, 0].set(right[:, 0] / img_w)
        kp = kp.at[:, 1, 1].set(right[:, 1] / img_h)
        return kp

    def face_stages(params, img, boxes, kp, scores, valid):
        # "keypoints" (iris-refined) is emitted only in full mode; in
        # fast/standard it would be an exact duplicate of raw_keypoints,
        # and the host readback is the measured bottleneck (BENCH_r02:
        # 51.4 of ~61 ms/batch) — the host materializer defaults
        # keypoints to raw_keypoints when the key is absent.
        out = {"boxes": boxes, "raw_keypoints": kp,
               "scores": scores, "valid": valid}
        if not compute_mesh:
            # Fast mode still applies the degenerate-alignment drop (the
            # reference computes the alignment size and rejects round()==0
            # without paying for the warp, face_detector_core.dart:258-266).
            _, _, _, fsize = geometry.compute_face_alignment(
                kp, float(img_w), float(img_h))
            out["valid"] = valid & (jnp.floor(fsize + 0.5) > 0)
            return out
        mesh_abs, mesh_scores, valid = mesh_stage(params, img, kp, valid)
        out.update(mesh=mesh_abs, mesh_scores=mesh_scores, valid=valid)
        if not compute_iris:
            return out
        iris_abs = iris_stage(params, img, mesh_abs)
        coeffs, bs_ok = blendshape_stage(params, mesh_abs, iris_abs)
        out.update(
            iris=iris_abs,
            blendshapes=coeffs,
            blendshapes_valid=bs_ok & valid,
            head_angles=geometry.head_euler_angles_from_mesh(mesh_abs),
            keypoints=refine_keypoints(kp, iris_abs),
        )
        if with_embeddings:
            out["embeddings"] = embedding_stage(params, img,
                                                out["keypoints"])
        return out

    if from_detections:
        # Two-phase path: detections come from a prior detect-only program
        # (possibly sliced to a smaller face bucket — see
        # FaceDetector._detect_adaptive).  This is the TPU analog of the
        # reference's early-gating win (CHANGELOG 6.6.x: 4-face slab gated
        # to 1 face cut full mode 18 -> 7 ms).
        if not batched:
            return face_stages
        return jax.vmap(face_stages, in_axes=(None, 0, 0, 0, 0, 0))

    slab = max_faces if face_slab is None else min(face_slab, max_faces)
    if mode == FaceDetectionMode.FAST:
        slab = max_faces  # fast mode has no per-face stage cost to bound

    def one_image(params, img):
        boxes, kp, scores, valid = detect_stage(params, img)
        if slab < max_faces:
            # The gates can invalidate a HIGHER-scored slab entry while a
            # lower-scored one stays valid (min_face_size is not monotone
            # in score), so the NMS's score order may interleave invalid
            # entries.  Compact valid detections to the front (stable, so
            # score order is kept within the valid group) before slicing
            # the speculative prefix — otherwise a valid face past the
            # prefix index would be silently dropped even when the valid
            # COUNT fits the bucket.
            order = jnp.argsort(jnp.where(valid, 0, 1), stable=True)
            boxes, kp, scores, valid = (boxes[order], kp[order],
                                        scores[order], valid[order])
        out = face_stages(params, img, boxes[:slab], kp[:slab],
                          scores[:slab], valid[:slab])
        if slab < max_faces:
            # Speculative form: expose the full (compacted) detection slab
            # so the host can detect overflow and re-run face stages
            # without paying the detector again; compaction guarantees
            # valid entries form a prefix, so count-vs-bucket overflow
            # checks and [:n] reruns are exact.  The slab arrays stay
            # DEVICE-resident on the no-overflow path — only det_count
            # (one int per image) joins the host readback; the overflow
            # re-run consumes det_* straight from the device handle
            # (detector.py _finish_speculative).
            out.update(det_boxes=boxes, det_raw_keypoints=kp,
                       det_scores=scores, det_valid=valid,
                       det_count=jnp.sum(valid.astype(jnp.int32)))
        return out

    if not batched:
        return one_image
    return jax.vmap(one_image, in_axes=(None, 0))
