"""Camera-frame decode plans and concurrency/error-recovery stress.

Mirrors the reference's camera decode coverage and
`concurrency_stress_test.dart` (concurrent calls, multiple detectors,
rapid create/dispose) at the scale that makes sense for compiled
programs.
"""

import os
import threading

import numpy as np
import pytest

from face_detection_tflite_tpu.utils.camera import (CameraFormat,
                                                    CameraFrame,
                                                    CameraRotation,
                                                    decode_camera_frame)

from .asset_paths import MODELS_DIR, SAMPLES


def _rgb_to_i420(rgb):
    """BT.601 video-range RGB->YUV420 for synthesizing camera frames."""
    r = rgb[..., 0].astype(np.float32)
    g = rgb[..., 1].astype(np.float32)
    b = rgb[..., 2].astype(np.float32)
    y = 16 + 0.257 * r + 0.504 * g + 0.098 * b
    u = 128 - 0.148 * r - 0.291 * g + 0.439 * b
    v = 128 + 0.439 * r - 0.368 * g - 0.071 * b
    y = np.clip(y, 0, 255).astype(np.uint8)
    u = np.clip(u[::2, ::2], 0, 255).astype(np.uint8)
    v = np.clip(v[::2, ::2], 0, 255).astype(np.uint8)
    return y, u, v


class TestCameraDecode:
    def _pattern(self, h=64, w=96):
        # smooth pattern: chroma subsampling keeps roundtrip error small
        x = np.broadcast_to(np.linspace(0, 1, w)[None, :], (h, w))
        y = np.broadcast_to(np.linspace(0, 1, h)[:, None], (h, w))
        img = np.stack([x, y, 1 - x], axis=2) * 200 + 20
        return img.astype(np.uint8)

    @pytest.mark.parametrize("fmt", [CameraFormat.I420, CameraFormat.NV12,
                                     CameraFormat.NV21])
    def test_yuv_roundtrip(self, fmt):
        img = self._pattern()
        h, w = img.shape[:2]
        y, u, v = _rgb_to_i420(img)
        if fmt == CameraFormat.I420:
            data = y.tobytes() + u.tobytes() + v.tobytes()
        elif fmt == CameraFormat.NV12:
            data = y.tobytes() + np.stack([u, v], -1).tobytes()
        else:
            data = y.tobytes() + np.stack([v, u], -1).tobytes()
        out = decode_camera_frame(CameraFrame(data, w, h, fmt))
        assert out.shape == (h, w, 3)
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 6.0

    @pytest.mark.parametrize("fmt,order", [(CameraFormat.RGBA, (0, 1, 2)),
                                           (CameraFormat.BGRA, (2, 1, 0))])
    def test_rgba_bgra(self, fmt, order):
        img = self._pattern()
        h, w = img.shape[:2]
        px = np.dstack([img[..., order[0]], img[..., order[1]],
                        img[..., order[2]],
                        np.full((h, w), 255, np.uint8)])
        out = decode_camera_frame(CameraFrame(px.tobytes(), w, h, fmt))
        assert np.array_equal(out, img)

    def test_rotation(self):
        img = self._pattern()
        h, w = img.shape[:2]
        px = np.dstack([img, np.full((h, w), 255, np.uint8)])
        out = decode_camera_frame(CameraFrame(
            px.tobytes(), w, h, CameraFormat.RGBA, CameraRotation.CW90))
        assert out.shape == (w, h, 3)
        assert np.array_equal(out, np.rot90(img, 3))

    def test_row_stride_padding(self):
        img = self._pattern(32, 30)
        h, w = img.shape[:2]
        stride = 32 * 4  # padded RGBA rows
        rows = np.zeros((h, 32, 4), np.uint8)
        rows[:, :w, :3] = img
        out = decode_camera_frame(CameraFrame(
            rows.tobytes(), w, h, CameraFormat.RGBA, row_stride=stride))
        assert np.array_equal(out, img)


@pytest.mark.skipif(not os.path.isdir(MODELS_DIR),
                    reason="reference assets not present")
class TestStress:
    def test_concurrent_detect_calls(self):
        from PIL import Image
        from face_detection_tflite_tpu import (FaceDetectionMode,
                                               FaceDetectionModel,
                                               FaceDetector)
        det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                           enable_tracking=True, model_dir=MODELS_DIR)
        img = np.asarray(Image.open(
            os.path.join(SAMPLES, "landmark-ex1.jpg")).convert("RGB"))
        det.detect_faces(img, FaceDetectionMode.FAST)  # compile once

        results = []
        errors = []

        def worker():
            try:
                results.append(len(det.detect_faces(
                    img, FaceDetectionMode.FAST)))
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert results == [1] * 8

    def test_rapid_create_dispose(self):
        from face_detection_tflite_tpu import (FaceDetectionModel,
                                               FaceDetector)
        for _ in range(3):
            d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                             model_dir=MODELS_DIR)
            d.dispose()
            with pytest.raises(RuntimeError):
                d.detect_faces(np.zeros((64, 64, 3), np.uint8))

    def test_two_detectors_coexist(self):
        from PIL import Image
        from face_detection_tflite_tpu import (FaceDetectionMode,
                                               FaceDetectionModel,
                                               FaceDetector)
        img = np.asarray(Image.open(
            os.path.join(SAMPLES, "landmark-ex1.jpg")).convert("RGB"))
        d1 = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                          model_dir=MODELS_DIR)
        d2 = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                          model_dir=MODELS_DIR)
        f1 = d1.detect_faces(img, FaceDetectionMode.FAST)
        f2 = d2.detect_faces(img, FaceDetectionMode.FAST)
        assert len(f1) == len(f2) == 1
        d1.dispose()
        # d2 keeps working after d1 is gone
        assert len(d2.detect_faces(img, FaceDetectionMode.FAST)) == 1


class TestOddDimsAndStride:
    def test_yuv_odd_dimensions(self):
        from face_detection_tflite_tpu.utils.image import rgb_from_yuv420
        h, w = 11, 9
        y = np.full((h, w), 128, np.uint8)
        u = np.full(((h + 1) // 2, (w + 1) // 2), 128, np.uint8)
        v = np.full(((h + 1) // 2, (w + 1) // 2), 128, np.uint8)
        rgb = rgb_from_yuv420(y, u, v)
        assert rgb.shape == (h, w, 3)

    def test_nv12_chroma_stride(self):
        """Chroma rows padded to the Y stride must decode correctly."""
        h, w, stride = 8, 6, 16
        y = np.full((h, stride), 77, np.uint8)
        ch, cw = h // 2, w // 2
        uv_rows = np.zeros((ch, stride), np.uint8)
        uv_rows[:, :2 * cw] = 128  # valid UV pairs; padding stays 0
        data = y.tobytes() + uv_rows.tobytes()
        frame = CameraFrame(data, w, h, CameraFormat.NV12, row_stride=stride)
        rgb = decode_camera_frame(frame)
        assert rgb.shape == (h, w, 3)
        # neutral chroma -> gray everywhere (no color corruption from pad)
        assert (np.abs(rgb.astype(int) - rgb[0, 0].astype(int)) < 3).all()


def test_camera_frame_from_image_roundtrip():
    from face_detection_tflite_tpu import camera_frame_from_image
    from face_detection_tflite_tpu.utils.camera import decode_camera_frame
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (31, 47, 3), dtype=np.uint8)
    frame = camera_frame_from_image(img)
    assert np.array_equal(decode_camera_frame(frame), img)
    # RGBA passes through; bad rank rejected
    rgba = np.dstack([img, np.full((31, 47), 7, np.uint8)])
    assert camera_frame_from_image(rgba).data == rgba.tobytes()
    with pytest.raises(ValueError, match="expected"):
        camera_frame_from_image(np.zeros((4, 4), np.uint8))
