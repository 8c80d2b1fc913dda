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


    def test_nv12_odd_width_with_row_stride(self):
        """Odd-width NV12 with an unpadded Y stride: interleaved UV rows
        are 2*ceil(w/2) bytes, which EXCEEDS y_stride — the default
        chroma stride must floor at 2*cw (the NV analog of the I420
        ceil-half fix) instead of crashing the reshape."""
        h, w = 10, 31
        cw, ch = (w + 1) // 2, (h + 1) // 2
        y = np.full((h, w), 90, np.uint8)
        uv = np.full((ch, 2 * cw), 128, np.uint8)
        frame = CameraFrame(y.tobytes() + uv.tobytes(), w, h,
                            CameraFormat.NV12, row_stride=w)
        rgb = decode_camera_frame(frame)
        assert rgb.shape == (h, w, 3)
        assert (np.abs(rgb.astype(int) - rgb[0, 0].astype(int)) < 3).all()

    def test_pixel_stride2_null_bytes_per_row(self):
        """A present-but-null bytesPerRow (deserialized CameraImage JSON)
        must fall back to the full interleaved pitch, not the meaningful
        span — off by one byte, every chroma row shifts."""
        from face_detection_tflite_tpu import camera_frame_from_planes
        img = TestCameraDecode._pattern(TestCameraDecode)
        y, u, v = _rgb_to_i420(img)
        h, w = img.shape[:2]
        ch, cw = u.shape
        inter = np.empty((ch, 2 * cw), np.uint8)
        inter[:, 0::2], inter[:, 1::2] = u, v
        inter_v = np.empty((ch, 2 * cw), np.uint8)
        inter_v[:, 0::2], inter_v[:, 1::2] = v, u
        planes = [{"bytes": y.tobytes(), "bytes_per_row": None},
                  {"bytes": inter.reshape(-1)[:-1].tobytes(),
                   "bytes_per_row": None, "bytes_per_pixel": 2},
                  {"bytes": inter_v.reshape(-1)[:-1].tobytes(),
                   "bytes_per_row": None, "bytes_per_pixel": 2}]
        frame = camera_frame_from_planes(w, h, planes)
        assert frame is not None
        ref = decode_camera_frame(CameraFrame(
            data=y.tobytes() + u.tobytes() + v.tobytes(), width=w, height=h,
            format=CameraFormat.I420))
        assert np.array_equal(decode_camera_frame(frame), ref)


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


class _Plane:
    """Duck-typed CameraImage plane (Flutter shape, snake/camel agnostic)."""

    def __init__(self, data, bytes_per_row=None, bytes_per_pixel=None):
        self.bytes = data
        if bytes_per_row is not None:
            self.bytesPerRow = bytes_per_row
        if bytes_per_pixel is not None:
            self.bytesPerPixel = bytes_per_pixel


class _CameraImage:
    def __init__(self, width, height, planes):
        self.width = width
        self.height = height
        self.planes = planes


class TestCameraFrameFromPlanes:
    """`prepareCameraFrameFromImage` analog: duck-typed CameraImage planes
    (face_detector.dart:651-666)."""

    def _pattern(self, h=64, w=96):
        x = np.broadcast_to(np.linspace(0, 1, w)[None, :], (h, w))
        y = np.broadcast_to(np.linspace(0, 1, h)[:, None], (h, w))
        img = np.stack([x, y, 1 - x], axis=2) * 200 + 20
        return img.astype(np.uint8)

    def test_three_planes_i420(self):
        from face_detection_tflite_tpu import camera_frame_from_planes
        img = self._pattern()
        y, u, v = _rgb_to_i420(img)
        h, w = img.shape[:2]
        frame = camera_frame_from_planes(
            w, h, [_Plane(y.tobytes()), _Plane(u.tobytes(), bytes_per_pixel=1),
                   _Plane(v.tobytes(), bytes_per_pixel=1)])
        assert frame is not None and frame.format == CameraFormat.I420
        ref = decode_camera_frame(CameraFrame(
            data=y.tobytes() + u.tobytes() + v.tobytes(), width=w, height=h,
            format=CameraFormat.I420))
        assert np.array_equal(decode_camera_frame(frame), ref)

    def test_three_planes_pixel_stride2_android(self):
        """Android's interleaved U/V views (pixel stride 2, short tail)."""
        from face_detection_tflite_tpu import camera_frame_from_planes
        img = self._pattern()
        y, u, v = _rgb_to_i420(img)
        h, w = img.shape[:2]
        ch, cw = u.shape
        # UVUV... view starting at U and VUVU... starting at V; the final
        # interleaved byte of the last row is absent (the classic HAL tail).
        inter = np.empty((ch, 2 * cw), np.uint8)
        inter[:, 0::2], inter[:, 1::2] = u, v
        u_view = inter.reshape(-1)[:-1].tobytes()
        inter_v = np.empty((ch, 2 * cw), np.uint8)
        inter_v[:, 0::2], inter_v[:, 1::2] = v, u
        v_view = inter_v.reshape(-1)[:-1].tobytes()
        frame = camera_frame_from_planes(
            w, h, [_Plane(y.tobytes()),
                   _Plane(u_view, bytes_per_row=2 * cw, bytes_per_pixel=2),
                   _Plane(v_view, bytes_per_row=2 * cw, bytes_per_pixel=2)])
        assert frame is not None
        ref = decode_camera_frame(CameraFrame(
            data=y.tobytes() + u.tobytes() + v.tobytes(), width=w, height=h,
            format=CameraFormat.I420))
        assert np.array_equal(decode_camera_frame(frame), ref)
        # Omitting the optional bytes_per_row must assume the full
        # interleaved row pitch (cw*bpp), not the meaningful-span width —
        # a 2*cw-1 default would shift every chroma row by one byte.
        no_stride = camera_frame_from_planes(
            w, h, [_Plane(y.tobytes()),
                   _Plane(u_view, bytes_per_pixel=2),
                   _Plane(v_view, bytes_per_pixel=2)])
        assert no_stride is not None
        assert np.array_equal(decode_camera_frame(no_stride), ref)

    def test_two_planes_nv12(self):
        from face_detection_tflite_tpu import camera_frame_from_planes
        img = self._pattern()
        y, u, v = _rgb_to_i420(img)
        h, w = img.shape[:2]
        ch, cw = u.shape
        uv = np.empty((ch, 2 * cw), np.uint8)
        uv[:, 0::2], uv[:, 1::2] = u, v
        frame = camera_frame_from_planes(
            w, h, [_Plane(y.tobytes()), _Plane(uv.tobytes())])
        assert frame is not None and frame.format == CameraFormat.NV12
        ref = decode_camera_frame(CameraFrame(
            data=y.tobytes() + uv.tobytes(), width=w, height=h,
            format=CameraFormat.NV12))
        assert np.array_equal(decode_camera_frame(frame), ref)

    def test_single_plane_rgba_and_bgra(self):
        from face_detection_tflite_tpu import camera_frame_from_planes
        img = self._pattern()
        h, w = img.shape[:2]
        rgba = np.dstack([img, np.full((h, w), 255, np.uint8)])
        for is_bgra in (False, True):
            px = rgba[..., [2, 1, 0, 3]] if is_bgra else rgba
            # Strided rows (8 bytes of padding per row), dict-shaped plane.
            stride = w * 4 + 8
            padded = np.zeros((h, stride), np.uint8)
            padded[:, :w * 4] = px.reshape(h, w * 4)
            frame = camera_frame_from_planes(
                w, h, [{"bytes": padded.tobytes(), "bytes_per_row": stride,
                        "bytes_per_pixel": 4}], is_bgra=is_bgra)
            assert frame is not None
            assert np.array_equal(decode_camera_frame(frame), img)

    def test_undecodable_shapes_return_none(self):
        from face_detection_tflite_tpu import camera_frame_from_planes
        y = np.zeros((8, 8), np.uint8)
        assert camera_frame_from_planes(8, 8, []) is None
        assert camera_frame_from_planes(0, 8, [_Plane(b"")]) is None
        assert camera_frame_from_planes(  # 4 planes: unknown layout
            8, 8, [_Plane(y.tobytes())] * 4) is None
        assert camera_frame_from_planes(  # truncated Y buffer
            8, 8, [_Plane(y.tobytes()[:-9]), _Plane(b"\0" * 32),
                   _Plane(b"\0" * 32)]) is None
        assert camera_frame_from_planes(  # bad chroma pixel stride
            8, 8, [_Plane(y.tobytes()),
                   _Plane(b"\0" * 16, bytes_per_pixel=3),
                   _Plane(b"\0" * 16, bytes_per_pixel=3)]) is None
        assert camera_frame_from_planes(8, 8, None) is None


def test_decode_camera_frame_max_dim():
    """maxDim downscale: INTER_LINEAR to fit the longer side, applied
    before rotation (helpers.dart:488-493)."""
    import cv2
    from face_detection_tflite_tpu import camera_frame_from_image
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (60, 90, 3), dtype=np.uint8)
    frame = camera_frame_from_image(img)
    out = decode_camera_frame(frame, max_dim=45)
    ref = cv2.resize(img, (45, 30), interpolation=cv2.INTER_LINEAR)
    assert np.array_equal(out, ref)
    # No-op when the frame already fits.
    assert np.array_equal(decode_camera_frame(frame, max_dim=90), img)
    # Pre-rotation: CW90 swaps dims after the downscale.
    rot = camera_frame_from_image(img, rotation=CameraRotation.CW90)
    assert decode_camera_frame(rot, max_dim=45).shape == (45, 30, 3)


@pytest.mark.skipif(not os.path.isdir(MODELS_DIR),
                    reason="model assets not fetched")
def test_detect_faces_from_camera_image():
    """One-call CameraImage wrapper: duck-typed planes in, faces out;
    undecodable shapes yield an empty list (face_detector.dart:651-666)."""
    from PIL import Image
    from face_detection_tflite_tpu import (FaceDetectionMode,
                                           FaceDetectionModel, FaceDetector)
    det = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                       model_dir=MODELS_DIR)
    img = np.asarray(Image.open(
        os.path.join(SAMPLES, "landmark-ex1.jpg")).convert("RGB"))
    h, w = img.shape[:2]
    rgba = np.dstack([img, np.full((h, w), 255, np.uint8)])
    cam = _CameraImage(w, h, [_Plane(rgba.tobytes(), bytes_per_row=w * 4,
                                     bytes_per_pixel=4)])
    faces = det.detect_faces_from_camera_image(cam,
                                               FaceDetectionMode.FAST)
    ref = det.detect_faces(img, FaceDetectionMode.FAST)
    assert len(faces) == len(ref) == 1
    bb, rb = faces[0].bounding_box, ref[0].bounding_box
    np.testing.assert_allclose(
        [bb.xmin, bb.ymin, bb.xmax, bb.ymax],
        [rb.xmin, rb.ymin, rb.xmax, rb.ymax], atol=1e-5)
    # max_dim halves the coordinate space (results live in the downscaled
    # frame, as in the reference).
    small = det.detect_faces_from_camera_image(
        cam, FaceDetectionMode.FAST, max_dim=w // 2)
    assert len(small) == 1
    assert small[0].original_size == (w // 2, int(h * (w // 2) / w))
    # Undecodable plane LAYOUT -> empty list; an object that doesn't
    # expose the CameraImage shape at all raises (the reference's split
    # contract, face_detector.dart:641-643).
    assert det.detect_faces_from_camera_image(
        _CameraImage(w, h, [_Plane(b"short")])) == []
    with pytest.raises(TypeError, match="width"):
        det.detect_faces_from_camera_image(object())
    det.dispose()
