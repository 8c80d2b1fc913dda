"""Edge cases and error recovery (reference `edge_cases_test.dart` /
`error_recovery_test.dart` analog): extreme inputs must degrade to empty
results or clear errors, never crash or corrupt state.
"""

import os

import numpy as np
import pytest

from face_detection_tflite_tpu import (FaceDetectionMode, FaceDetectionModel,
                                       FaceDetector)

from .asset_paths import MODELS_DIR, SAMPLES

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
            os.path.join(SAMPLES, "landmark-ex1.jpg")).convert("RGB"))
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
            os.path.join(SAMPLES, "landmark-ex1.jpg")).convert("RGB"))
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
            SAMPLES + "/"
            "group-shot-bounding-box-ex1.jpeg").convert("RGB"))
        faces = d.detect_faces(img, FaceDetectionMode.FAST)
        assert len(faces) == 1
        assert faces[0].score == pytest.approx(0.918, abs=1e-3)  # top face


class TestChannelTolerance:
    def test_rgba_and_grayscale_inputs(self, det):
        from PIL import Image
        img = np.asarray(Image.open(
            os.path.join(SAMPLES, "landmark-ex1.jpg")).convert("RGB"))
        rgba = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
        f_rgb = det.detect_faces(img, FaceDetectionMode.FAST)
        f_rgba = det.detect_faces(rgba, FaceDetectionMode.FAST)
        assert len(f_rgba) == len(f_rgb) == 1
        assert f_rgba[0].bounding_box == f_rgb[0].bounding_box
        gray = img.mean(axis=2).astype(np.uint8)
        f_gray = det.detect_faces(gray[..., None], FaceDetectionMode.FAST)
        assert len(f_gray) == 1  # detector still finds the face on gray

    def test_bad_channel_count(self, det):
        with pytest.raises(ValueError, match="channel count"):
            det.detect_faces(np.zeros((64, 64, 2), np.uint8))

    def test_not_an_image_batch(self, det):
        with pytest.raises(ValueError, match="image batch"):
            det.detect_faces_batch(np.zeros((4, 4), np.uint8))


class TestVariantConsistency:
    def test_variants_agree_on_box(self):
        """All detector variants localize the same face within ~tolerance —
        a cross-check of per-variant anchor configurations against each
        other (they share no anchor code path parameters)."""
        from PIL import Image
        img = np.asarray(Image.open(
            os.path.join(SAMPLES, "landmark-ex1.jpg")).convert("RGB"))
        h, w = img.shape[:2]
        boxes = {}
        for variant in (FaceDetectionModel.SHORT_RANGE,
                        FaceDetectionModel.BACK_CAMERA,
                        FaceDetectionModel.FULL):
            d = FaceDetector(model=variant, model_dir=MODELS_DIR)
            (f,) = d.detect_faces(img, FaceDetectionMode.FAST)
            b = f.bounding_box
            boxes[variant] = np.asarray([(b.xmin + b.xmax) / 2 * w,
                                         (b.ymin + b.ymax) / 2 * h])
        centers = np.stack(list(boxes.values()))
        spread = np.linalg.norm(centers - centers.mean(0), axis=1).max()
        assert spread < 40, f"variant box centers disagree by {spread:.0f}px"
