"""Edge cases and error recovery (reference `edge_cases_test.dart` /
`error_recovery_test.dart` analog): extreme inputs must degrade to empty
results or clear errors, never crash or corrupt state.
"""

import os

import numpy as np
import pytest

from face_detection_tflite_tpu import (FaceDetectionMode, FaceDetectionModel,
                                       FaceDetector)

MODELS_DIR = "/root/reference/assets/models"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MODELS_DIR), reason="reference assets not present")


@pytest.fixture(scope="module")
def det():
    return FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                        model_dir=MODELS_DIR)


class TestEdgeCases:
    def test_all_black_all_white_noise(self, det):
        for img in (np.zeros((96, 96, 3), np.uint8),
                    np.full((96, 96, 3), 255, np.uint8),
                    np.random.default_rng(0).integers(
                        0, 255, (96, 96, 3), dtype=np.uint8)):
            assert det.detect_faces(img, FaceDetectionMode.FULL) == []

    def test_extreme_aspect_ratios(self, det):
        wide = np.zeros((16, 512, 3), np.uint8)
        tall = np.zeros((512, 16, 3), np.uint8)
        assert det.detect_faces(wide, FaceDetectionMode.FAST) == []
        assert det.detect_faces(tall, FaceDetectionMode.FAST) == []

    def test_tiny_image(self, det):
        assert det.detect_faces(np.zeros((8, 8, 3), np.uint8),
                                FaceDetectionMode.FAST) == []

    def test_float_input_matches_uint8(self, det):
        from PIL import Image
        img = np.asarray(Image.open(
            "/root/reference/assets/samples/landmark-ex1.jpg").convert("RGB"))
        fu = det.detect_faces(img, FaceDetectionMode.FAST)
        ff = det.detect_faces(img.astype(np.float32), FaceDetectionMode.FAST)
        assert len(fu) == len(ff) == 1
        assert fu[0].bounding_box == ff[0].bounding_box

    def test_state_clean_after_garbage(self, det):
        """A failed call must not poison subsequent calls."""
        from PIL import Image
        with pytest.raises(Exception):
            det.detect_faces_from_bytes(b"garbage")
        img = np.asarray(Image.open(
            "/root/reference/assets/samples/landmark-ex1.jpg").convert("RGB"))
        assert len(det.detect_faces(img, FaceDetectionMode.FAST)) == 1

    def test_missing_model_dir(self, monkeypatch):
        import face_detection_tflite_tpu.pipeline.detector as dmod
        monkeypatch.setattr(dmod, "_DEFAULT_MODEL_DIRS", ("/nonexistent_a",))
        monkeypatch.delenv("FDT_TPU_MODEL_DIR", raising=False)
        with pytest.raises(FileNotFoundError, match="model directory"):
            dmod.resolve_model_dir("/also_nonexistent")

    def test_max_faces_one(self):
        from PIL import Image
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, max_faces=1)
        img = np.asarray(Image.open(
            "/root/reference/assets/samples/"
            "group-shot-bounding-box-ex1.jpeg").convert("RGB"))
        faces = d.detect_faces(img, FaceDetectionMode.FAST)
        assert len(faces) == 1
        assert faces[0].score == pytest.approx(0.918, abs=1e-3)  # top face
