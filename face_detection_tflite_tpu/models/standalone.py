"""Standalone model classes — the reference's per-model public API.

The reference exposes each network as an independently usable class
(`FaceDetection`, `FaceLandmark`, `IrisLandmark`, `FaceBlendshapesModel`,
`FaceEmbedding` — `lib/src/models/*`), besides the orchestrating
`FaceDetector`.  These wrappers provide the same standalone surface on the
compiled JAX graphs: each owns one converted model plus its pre/post
processing.  The crop models (mesh/iris/blendshapes) have fixed input
sizes; `FaceDetection` compiles one program per exact image size — bound
that with its ``max_dim`` knob (or pre-size inputs) for mixed-resolution
streams, or use `FaceDetector`, whose ``bucket_images`` ladder exists for
exactly this.

`FaceEmbedding` lives in `models/embedding.py`; `SelfieSegmentation` in
`models/segmentation.py`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..convert.executor import convert_file
from ..ops.anchors import anchor_options_for, generate_anchors
from ..ops.detections import (decode_detections, remove_letterbox,
                              weighted_nms)
from ..ops.letterbox import letterbox_image, letterbox_params
from ..pipeline.config import (IRIS_INPUT_SIZE, MESH_INPUT_SIZE, MODEL_FILES,
                               FaceDetectionModel as Variant)
from ..pipeline.programs import (_identify_detector_outputs,
                                 _identify_landmark_outputs,
                                 _sigmoid_clipped, _unpack_landmarks)
from ..pipeline.types import Detection, RectF

__all__ = ["FaceDetection", "FaceLandmark", "IrisLandmark",
           "FaceBlendshapesModel"]


class _Disposable:
    """`dispose()` semantics shared by the standalone model classes.

    The reference frees its interpreters and makes later calls throw
    (`face_detection_model.dart:525` et al.); here dispose drops the
    compiled programs/weights and poisons further use.
    """

    _disposed = False

    def dispose(self) -> None:
        self._disposed = True
        for attr in ("_programs", "_run", "model"):
            if hasattr(self, attr):
                setattr(self, attr, None)

    def _check_disposed(self) -> None:
        if self._disposed:
            raise RuntimeError(
                f"{type(self).__name__} has been disposed")


def _resolve(path_or_variantfile: str, model_dir: Optional[str]) -> str:
    if os.path.isabs(path_or_variantfile):
        return path_or_variantfile
    from ..pipeline.detector import resolve_model_dir
    return os.path.join(resolve_model_dir(model_dir), path_or_variantfile)


class FaceDetection(_Disposable):
    """Standalone BlazeFace: image -> list[Detection].

    Equivalent of `lib/src/models/face_detection_model.dart`: letterbox,
    backbone, decode, weighted NMS and letterbox removal in one jitted
    program per image size.
    """

    def __init__(self, variant: Variant = Variant.BACK_CAMERA,
                 model_dir: Optional[str] = None, max_detections: int = 16,
                 precision: str = "highest",
                 max_dim: Optional[int] = None):
        #: Optional cap on the longer input side (host INTER_LINEAR
        #: downscale before detection — boxes/keypoints are normalized, so
        #: coordinates are unaffected).  One program compiles per exact
        #: image size; without a cap a mixed-resolution stream pays a full
        #: XLA compile per unique size.
        self.max_dim = max_dim
        self.variant = variant
        self.model = convert_file(
            _resolve(MODEL_FILES[variant.value], model_dir),
            precision=precision)
        self.input_size = self.model.input_shapes[0][1]
        self.anchors = jnp.asarray(
            generate_anchors(anchor_options_for(variant.value)))
        self.max_detections = max_detections
        self._programs: dict[tuple, object] = {}

    def _program(self, h: int, w: int):
        key = (h, w)
        if key not in self._programs:
            lbp = letterbox_params(h, w, self.input_size, self.input_size)

            def run(params, img):
                x = letterbox_image(img, lbp)
                rb, rs = _identify_detector_outputs(
                    self.model.fn(params, x[None]))
                boxes, kp, scores, valid = decode_detections(
                    rb, rs, self.anchors, float(self.input_size))
                boxes, kp, scores, valid = weighted_nms(
                    boxes, kp, scores, valid,
                    max_detections=self.max_detections)
                boxes, kp = remove_letterbox(boxes, kp, lbp.padding)
                # Pack into ONE buffer: per-array device->host pulls cost
                # a full round trip each over remote-attached TPUs.
                d = boxes.shape[0]
                return jnp.concatenate(
                    [boxes, kp.reshape(d, 12), scores[:, None],
                     valid.astype(jnp.float32)[:, None]], axis=1)  # [D, 18]

            self._programs[key] = jax.jit(run)
        return self._programs[key]

    def __call__(self, image: np.ndarray) -> list[Detection]:
        self._check_disposed()
        image = np.asarray(image)
        # Same channel tolerance as every other public entry point
        # (grayscale replicates, RGBA drops alpha — normalize_channels'
        # documented contract).
        if image.ndim == 2:
            image = image[..., None]
        if image.ndim != 3 or image.shape[-1] not in (1, 3, 4):
            raise ValueError(
                f"expected [H, W, {{1,3,4}}] image, got {image.shape}")
        if self.max_dim is not None:
            from ..utils.image import fit_max_dim
            image = fit_max_dim(image, self.max_dim)
        from ..utils.image import normalize_channels
        dev = normalize_channels(jnp.asarray(image)[None])[0]
        h, w = image.shape[:2]
        packed = np.asarray(self._program(h, w)(
            self.model.params, dev))  # one transfer
        boxes, kp = packed[:, :4], packed[:, 4:16].reshape(-1, 6, 2)
        scores, valid = packed[:, 16], packed[:, 17] > 0.5
        return [Detection(RectF(*map(float, boxes[i])), float(scores[i]),
                          kp[i])
                for i in range(len(valid)) if valid[i]]


class FaceLandmark(_Disposable):
    """Standalone FaceMesh: 192x192 face crop -> (landmarks, score).

    Equivalent of `lib/src/models/face_landmark.dart`: landmarks come back
    normalized to the crop ([468, 3], x/y in [0,1], z normalized like the
    reference), score is the sigmoid presence confidence.
    """

    def __init__(self, model_dir: Optional[str] = None,
                 precision: str = "highest"):
        self.model = convert_file(
            _resolve(MODEL_FILES["face_landmark"], model_dir),
            precision=precision)
        self.input_size = MESH_INPUT_SIZE

        def run(params, crop):
            x = crop.astype(jnp.float32) * (1.0 / 127.5) - 1.0
            lm, score = _identify_landmark_outputs(
                self.model.fn(params, x[None]))
            lm_norm = _unpack_landmarks(lm.reshape(1, -1), self.input_size,
                                        clamp=True, normalize_z=True)[0]
            # Some landmark variants omit the presence output; report -1
            # as the "no score" sentinel (call_with_score maps it to None).
            s = (_sigmoid_clipped(score.reshape(()))
                 if score is not None else jnp.float32(-1.0))
            # One packed buffer -> one device->host transfer.
            return jnp.concatenate([lm_norm.reshape(-1), s.reshape(1)])

        self._run = jax.jit(run)

    def call_with_score(self, face_crop: np.ndarray
                        ) -> tuple[np.ndarray, float]:
        self._check_disposed()
        if face_crop.shape[:2] != (self.input_size, self.input_size):
            # ValueError, not assert: asserts vanish under python -O and
            # the wrong shape would then burn a fresh XLA compile before
            # dying in an opaque trace error.
            raise ValueError(
                f"expects a {self.input_size}x{self.input_size} crop, "
                f"got {face_crop.shape[:2]}")
        packed = np.asarray(self._run(self.model.params,
                                      jnp.asarray(face_crop)))
        lm, s = packed[:-1].reshape(-1, 3), float(packed[-1])
        return lm, (s if s >= 0.0 else None)

    def __call__(self, face_crop: np.ndarray) -> np.ndarray:
        return self.call_with_score(face_crop)[0]


class IrisLandmark(_Disposable):
    """Standalone iris model: 64x64 eye crop -> [76, 3] points.

    Equivalent of `lib/src/models/iris_landmark.dart`: 71 eye-contour
    points followed by 5 iris points, x/y normalized to the crop, z raw.
    """

    def __init__(self, model_dir: Optional[str] = None,
                 precision: str = "highest"):
        self.model = convert_file(
            _resolve(MODEL_FILES["iris_landmark"], model_dir),
            precision=precision)
        self.input_size = IRIS_INPUT_SIZE

        def run(params, crop):
            x = crop.astype(jnp.float32) * (1.0 / 127.5) - 1.0
            outs = self.model.fn(params, x[None])
            flat = jnp.concatenate([o.reshape(-1) for o in outs])
            return _unpack_landmarks(flat.reshape(1, -1), self.input_size,
                                     clamp=False, normalize_z=False)[0]

        self._run = jax.jit(run)

    def __call__(self, eye_crop: np.ndarray) -> np.ndarray:
        self._check_disposed()
        if eye_crop.shape[:2] != (self.input_size, self.input_size):
            raise ValueError(
                f"expects a {self.input_size}x{self.input_size} crop, "
                f"got {eye_crop.shape[:2]}")
        return np.asarray(self._run(self.model.params, jnp.asarray(eye_crop)))


class FaceBlendshapesModel(_Disposable):
    """Standalone Blendshape V2: [146, 2] landmarks (pixels) -> 52 coeffs.

    Equivalent of `lib/src/models/face_blendshapes.dart` including the
    NaN-sanitize + clamp (`:191-200`) and input-shape validation.
    """

    def __init__(self, model_dir: Optional[str] = None,
                 precision: str = "highest"):
        self.model = convert_file(
            _resolve(MODEL_FILES["face_blendshapes"], model_dir),
            precision=precision)

        def run(params, pts):
            (coeffs,) = self.model.fn(params, pts[None])
            raw = coeffs.reshape(52)
            ok = ~jnp.any(jnp.isnan(raw))
            # One packed buffer -> one device->host transfer.
            return jnp.concatenate(
                [jnp.clip(jnp.nan_to_num(raw), 0.0, 1.0),
                 ok.astype(jnp.float32).reshape(1)])

        self._run = jax.jit(run)

    def __call__(self, landmarks_146: np.ndarray):
        """[146, 2] pixels -> [52] coefficients, or None when the model
        emits NaN (the reference nulls the whole result,
        face_blendshapes.dart:189-196)."""
        self._check_disposed()
        pts = np.asarray(landmarks_146, np.float32)
        if pts.shape != (146, 2):
            raise ValueError(
                f"blendshape input must be [146, 2] pixels, got {pts.shape}")
        packed = np.asarray(self._run(self.model.params, jnp.asarray(pts)))
        return packed[:52] if packed[52] > 0.5 else None
