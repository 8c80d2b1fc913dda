"""Standalone model classes (the reference's per-model public API)."""

import math
import os

import numpy as np
import pytest

from PIL import Image

from face_detection_tflite_tpu.models.standalone import (
    FaceBlendshapesModel, FaceDetection, FaceLandmark, IrisLandmark)
from face_detection_tflite_tpu.pipeline.config import (
    FaceDetectionModel as Variant)

from .asset_paths import MODELS_DIR, SAMPLES

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MODELS_DIR), reason="reference assets not present")


def _img(name):
    return np.asarray(Image.open(os.path.join(SAMPLES, name)).convert("RGB"))


class TestStandalone:
    def test_face_detection(self):
        det = FaceDetection(Variant.BACK_CAMERA, model_dir=MODELS_DIR)
        dets = det(_img("group-shot-bounding-box-ex1.jpeg"))
        assert len(dets) == 4
        assert all(d.score >= 0.5 for d in dets)
        assert dets[0].keypoints_xy.shape == (6, 2)

    def test_face_landmark_on_crop(self):
        """Chain: standalone detector -> manual crop -> standalone mesh."""
        import cv2
        img = _img("landmark-ex1.jpg")
        h, w = img.shape[:2]
        det = FaceDetection(Variant.BACK_CAMERA, model_dir=MODELS_DIR)
        (d,) = det(img)
        kp = d.keypoints_xy
        lx, ly = kp[0] * [w, h]
        rx, ry = kp[1] * [w, h]
        mx, my = kp[3] * [w, h]
        ecx, ecy = (lx + rx) / 2, (ly + ry) / 2
        theta = math.atan2(ry - ly, rx - lx)
        size = max(math.hypot(mx - ecx, my - ecy) * 3.6,
                   math.hypot(rx - lx, ry - ly) * 4.0)
        cx, cy = ecx + (mx - ecx) * 0.1, ecy + (my - ecy) * 0.1
        scale = 192 / round(size)
        rot = cv2.getRotationMatrix2D((cx, cy), math.degrees(theta), scale)
        oc = 96 + 0.5 * (scale - 1)
        rot[0, 2] += oc - cx
        rot[1, 2] += oc - cy
        crop = cv2.warpAffine(img, rot, (192, 192))

        mesh_model = FaceLandmark(model_dir=MODELS_DIR)
        lm, score = mesh_model.call_with_score(crop)
        assert lm.shape == (468, 3)
        assert score > 0.9
        assert (lm[:, :2] >= 0).all() and (lm[:, :2] <= 1).all()

    def test_iris_landmark_shape(self):
        iris = IrisLandmark(model_dir=MODELS_DIR)
        out = iris(np.zeros((64, 64, 3), np.uint8))
        assert out.shape == (76, 3)
        with pytest.raises(ValueError, match="64x64"):
            iris(np.zeros((32, 32, 3), np.uint8))

    def test_blendshapes_shape_and_sanitize(self):
        bs = FaceBlendshapesModel(model_dir=MODELS_DIR)
        out = bs(np.random.default_rng(0).uniform(0, 500, (146, 2)))
        assert out.shape == (52,)
        assert (out >= 0).all() and (out <= 1).all()
        with pytest.raises(ValueError, match="146, 2"):
            bs(np.zeros((100, 2)))


class TestDispose:
    def test_standalone_dispose_poisons(self):
        from face_detection_tflite_tpu.models.standalone import (
            FaceBlendshapesModel)
        m = FaceBlendshapesModel(model_dir=MODELS_DIR)
        m.dispose()
        with pytest.raises(RuntimeError, match="disposed"):
            m(np.zeros((146, 2), np.float32))

    def test_segmentation_dispose(self):
        import os
        from face_detection_tflite_tpu.convert.executor import convert_file
        from face_detection_tflite_tpu.models.segmentation import (
            SelfieSegmentation)
        seg = SelfieSegmentation(convert_file(
            os.path.join(MODELS_DIR, "selfie_segmenter.tflite")))
        seg.dispose_async()
        with pytest.raises(RuntimeError, match="disposed"):
            seg(np.zeros((1, 64, 64, 3), np.uint8))

    def test_embedding_dispose(self):
        from face_detection_tflite_tpu.models.embedding import FaceEmbedding
        emb = FaceEmbedding.load(None)
        emb.dispose()
        with pytest.raises(RuntimeError, match="disposed"):
            emb.embed(np.zeros((64, 64, 3), np.uint8), (10, 10), (20, 10))


class TestStandaloneInputContracts:
    def test_detection_channel_tolerance_and_max_dim(self):
        """Standalone FaceDetection accepts grayscale/RGBA like every
        other public entry point, and max_dim bounds per-size compiles
        (normalized outputs are scale-invariant)."""
        img = _img("landmark-ex1.jpg")
        det = FaceDetection(Variant.BACK_CAMERA, model_dir=MODELS_DIR,
                            max_dim=640)
        rgba = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
        (d_rgba,) = det(rgba)
        (d_rgb,) = det(img)
        assert abs(d_rgba.bounding_box.xmin - d_rgb.bounding_box.xmin) < 0.01
        gray = img.mean(axis=-1).astype(np.uint8)
        dets_gray = det(gray)          # [H, W] tolerated
        assert len(dets_gray) >= 0     # decodes without error
        with pytest.raises(ValueError, match="expected"):
            det(np.zeros((64, 64, 7), np.uint8))
        # max_dim=640 on a 1280-wide input -> one 426x640 program only.
        assert list(det._programs) == [(426, 640)]
        det.dispose()

    def test_crop_shape_errors_are_valueerrors(self):
        """Wrong crop sizes raise ValueError (asserts would vanish under
        python -O and burn an XLA compile before failing opaquely)."""
        lm = FaceLandmark(model_dir=MODELS_DIR)
        with pytest.raises(ValueError, match="192x192"):
            lm.call_with_score(np.zeros((100, 100, 3), np.uint8))
        lm.dispose()
        ir = IrisLandmark(model_dir=MODELS_DIR)
        with pytest.raises(ValueError, match="64x64"):
            ir(np.zeros((100, 100, 3), np.uint8))
        ir.dispose()
