"""Tests for the native runtime (JPEG pool), image IO, video and throttle."""

import io
import os
import threading
import time

import numpy as np
import pytest

from PIL import Image

from face_detection_tflite_tpu.pipeline.video import FrameThrottle
from face_detection_tflite_tpu.utils.image import (decode_image,
                                                   decode_images,
                                                   rgb_from_yuv420)

from .asset_paths import MODELS_DIR, SAMPLES
SAMPLE = os.path.join(SAMPLES, "landmark-ex1.jpg")


@pytest.mark.skipif(not os.path.exists(SAMPLE), reason="no sample assets")
class TestNativeDecode:
    def test_native_matches_pil(self):
        pytest.importorskip("ctypes")
        from face_detection_tflite_tpu.utils.native import (
            JpegDecoderPool, native_available)
        if not native_available():
            pytest.skip("native runtime not built (no toolchain)")
        pool = JpegDecoderPool(threads=2)
        data = open(SAMPLE, "rb").read()
        img = pool.decode(data)
        ref = np.asarray(Image.open(SAMPLE).convert("RGB"))
        assert np.array_equal(img, ref)
        pool.close()

    def test_batch_decode(self):
        from face_detection_tflite_tpu.utils.native import (
            JpegDecoderPool, native_available)
        if not native_available():
            pytest.skip("native runtime not built")
        pool = JpegDecoderPool(threads=4)
        data = open(SAMPLE, "rb").read()
        outs = pool.decode_batch([data] * 8)
        assert len(outs) == 8
        assert all(np.array_equal(o, outs[0]) for o in outs)
        pool.close()

    def test_probe(self):
        from face_detection_tflite_tpu.utils.native import (
            JpegDecoderPool, native_available)
        if not native_available():
            pytest.skip("native runtime not built")
        pool = JpegDecoderPool()
        w, h = pool.probe(open(SAMPLE, "rb").read())
        assert (w, h) == (1280, 853)
        with pytest.raises(ValueError):
            pool.probe(b"garbage")
        pool.close()

    def test_decode_image_dispatch(self):
        data = open(SAMPLE, "rb").read()
        img = decode_image(data)
        assert img.shape == (853, 1280, 3)
        with pytest.raises(ValueError):
            decode_image(b"definitely not an image")

    def test_decode_images_batch(self):
        data = open(SAMPLE, "rb").read()
        outs = decode_images([data, data])
        assert len(outs) == 2 and outs[0].shape == (853, 1280, 3)

    def test_png_decodes(self):
        buf = io.BytesIO()
        Image.fromarray(np.full((10, 12, 3), 99, np.uint8)).save(buf, "PNG")
        img = decode_image(buf.getvalue())
        assert img.shape == (10, 12, 3) and (img == 99).all()


def _require_pool():
    from face_detection_tflite_tpu.utils.native import (ImageDecoderPool,
                                                        native_available)
    if not native_available():
        pytest.skip("native runtime not built (no toolchain)")
    return ImageDecoderPool(threads=2)


def _png_bytes(img: Image.Image) -> bytes:
    buf = io.BytesIO()
    img.save(buf, "PNG")
    return buf.getvalue()


class TestNativeMultiFormat:
    """The native pool covers the reference `imdecode`'s common containers
    (JPEG/PNG/WebP) and must match the PIL fallback bit-for-bit so the two
    decode paths can't disagree (`face_detector.dart:1412-1430`)."""

    def test_png_modes_match_pil(self):
        pool = _require_pool()
        rng = np.random.default_rng(7)
        rgb = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
        rgba = np.dstack([rgb, rng.integers(0, 256, (37, 53), np.uint8)])
        cases = [
            Image.fromarray(rgb),                          # RGB8
            Image.fromarray(rgba, "RGBA"),                 # alpha -> dropped
            Image.fromarray(rgb[..., 0], "L"),             # grayscale
            Image.fromarray(rgb).convert("P"),             # palette
        ]
        try:
            for im in cases:
                data = _png_bytes(im)
                ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
                out = pool.decode(data)
                assert np.array_equal(out, ref), im.mode
                assert pool.probe(data) == (im.width, im.height)
        finally:
            pool.close()

    def test_16bit_png_routes_to_fallback(self):
        pool = _require_pool()
        arr = (np.arange(20 * 30) * 97 % 65536).astype(np.uint16)
        data = _png_bytes(Image.fromarray(arr.reshape(20, 30), "I;16"))
        try:
            with pytest.raises(ValueError):  # status -5: unsupported
                pool.probe(data)
        finally:
            pool.close()
        img = decode_image(data)  # PIL fallback still serves it
        assert img.shape == (20, 30, 3)

    def test_webp_matches_pil(self):
        pool = _require_pool()
        rng = np.random.default_rng(3)
        rgb = rng.integers(0, 256, (41, 29, 3), dtype=np.uint8)
        buf = io.BytesIO()
        try:
            Image.fromarray(rgb).save(buf, "WEBP", lossless=True)
        except Exception:
            pool.close()
            pytest.skip("PIL lacks WebP support")
        data = buf.getvalue()
        try:
            out = pool.decode(data)
            ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
            assert np.array_equal(out, ref)
            assert np.array_equal(out, rgb)  # lossless round trip
        finally:
            pool.close()

    @pytest.mark.skipif(not os.path.exists(SAMPLE),
                        reason="no sample assets")
    def test_mixed_format_batch(self):
        pool = _require_pool()
        jpeg = open(SAMPLE, "rb").read()
        rgb = np.full((10, 12, 3), 42, np.uint8)
        png = _png_bytes(Image.fromarray(rgb))
        try:
            outs = pool.decode_batch([jpeg, png, jpeg, png])
        finally:
            pool.close()
        assert outs[0].shape == (853, 1280, 3)
        assert np.array_equal(outs[1], rgb)
        assert np.array_equal(outs[0], outs[2])
        assert np.array_equal(outs[1], outs[3])

    def test_decode_images_mixed_routing(self):
        """decode_images routes a mixed JPEG+PNG batch through the pool
        (or the per-image fallback when unbuilt) with equal results."""
        rgb = np.full((8, 9, 3), 77, np.uint8)
        png = _png_bytes(Image.fromarray(rgb))
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, "JPEG", quality=95)
        outs = decode_images([png, buf.getvalue()])
        assert np.array_equal(outs[0], rgb)
        assert outs[1].shape == (8, 9, 3)


class TestYuv:
    def test_yuv420_roundtrip_gray(self):
        """A flat gray plane converts to (approximately) the same gray."""
        y = np.full((64, 64), 128, np.uint8)
        u = np.full((32, 32), 128, np.uint8)
        v = np.full((32, 32), 128, np.uint8)
        rgb = rgb_from_yuv420(y, u, v)
        assert rgb.shape == (64, 64, 3)
        assert np.all(np.abs(rgb.astype(int) - 130) < 4)  # 1.164*(128-16)

    def test_yuv420_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(0)
        h, w = 64, 64
        y = rng.integers(16, 236, (h, w), dtype=np.uint8)
        u = rng.integers(16, 240, (h // 2, w // 2), dtype=np.uint8)
        v = rng.integers(16, 240, (h // 2, w // 2), dtype=np.uint8)
        ours = rgb_from_yuv420(y, u, v)
        i420 = np.concatenate([y.reshape(-1), u.reshape(-1),
                               v.reshape(-1)]).reshape(h * 3 // 2, w)
        ref = cv2.cvtColor(i420, cv2.COLOR_YUV2RGB_I420)
        # cv2 uses the same BT.601 video-range coefficients.
        assert np.abs(ours.astype(int) - ref.astype(int)).mean() < 3.0


class TestFrameThrottle:
    def test_drop_oldest(self):
        t = FrameThrottle(maxlen=1)
        t.submit("a")
        t.submit("b")
        t.submit("c")
        assert t.take() == "c"
        assert t.dropped == 2
        assert t.submitted == 3

    def test_take_blocks_until_submit(self):
        import threading
        t = FrameThrottle()
        got = []

        def consumer():
            got.append(t.take(timeout=5))

        th = threading.Thread(target=consumer)
        th.start()
        t.submit("x")
        th.join(timeout=5)
        assert got == ["x"]

    def test_close_unblocks(self):
        t = FrameThrottle()
        t.close()
        assert t.take(timeout=0.1) is None
        with pytest.raises(RuntimeError):
            t.submit("y")


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="no sample assets")
class TestVideo:
    @pytest.fixture(scope="class")
    def video_path(self, tmp_path_factory):
        """Synthesizes a tiny video by panning a sample photo."""
        cv2 = pytest.importorskip("cv2")
        img = np.asarray(Image.open(SAMPLE).convert("RGB"))[..., ::-1]
        img = cv2.resize(img, (320, 213))
        path = str(tmp_path_factory.mktemp("video") / "test.mp4")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (320, 213))
        assert vw.isOpened()
        for i in range(6):
            vw.write(np.roll(img, i * 2, axis=1))
        vw.release()
        return path

    def test_process_video_tracks_across_frames(self, video_path):
        from face_detection_tflite_tpu import (FaceDetectionMode,
                                               FaceDetectionModel,
                                               FaceDetector)
        det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                           enable_tracking=True,
                           model_dir=MODELS_DIR)
        results = list(det.detect_faces_from_video(
            video_path, FaceDetectionMode.FAST, batch_size=4))
        assert len(results) == 6
        assert [r.frame_index for r in results] == list(range(6))
        ids = [f.tracking_id for r in results for f in r.faces]
        assert ids and all(i == ids[0] for i in ids)  # one face, stable ID

    def test_frame_stride_and_max_frames(self, video_path):
        from face_detection_tflite_tpu import (FaceDetectionMode,
                                               FaceDetectionModel,
                                               FaceDetector)
        det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                           model_dir=MODELS_DIR)
        results = list(det.detect_faces_from_video(
            video_path, FaceDetectionMode.FAST, frame_stride=2,
            max_frames=2))
        assert [r.frame_index for r in results] == [0, 2]

    def test_max_dim_downscales_frames(self, video_path):
        """The camera paths' maxDim knob extended to video: detections
        land in the downscaled coordinate space and still find the face."""
        from face_detection_tflite_tpu import (FaceDetectionMode,
                                               FaceDetectionModel,
                                               FaceDetector)
        det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                           model_dir=MODELS_DIR)
        results = list(det.detect_faces_from_video(
            video_path, FaceDetectionMode.FAST, max_frames=2, max_dim=160))
        assert len(results) == 2
        for r in results:
            assert len(r.faces) == 1
            # original_size reflects the 320x213 -> 160x107 downscale
            assert r.faces[0].original_size == (160, 106)

    def test_multichip_replicas_match_single_device(self, video_path):
        """devices= spreads frame batches over per-chip replicas with
        results (and tracking IDs) still in frame order — identical to
        the single-device run."""
        import jax

        from face_detection_tflite_tpu import (FaceDetectionMode,
                                               FaceDetectionModel,
                                               FaceDetector)
        det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                           enable_tracking=True, model_dir=MODELS_DIR)
        ref = list(det.detect_faces_from_video(
            video_path, FaceDetectionMode.STANDARD, batch_size=2))
        det.reset_tracking()
        got = list(det.detect_faces_from_video(
            video_path, FaceDetectionMode.STANDARD, batch_size=2,
            devices=jax.devices()[:3]))
        assert [r.frame_index for r in got] == [r.frame_index for r in ref]
        assert set(jax.devices()[:3]) <= set(det._replica_params_cache)
        for r, g in zip(ref, got):
            assert len(r.faces) == len(g.faces) == 1
            np.testing.assert_allclose(g.faces[0].mesh.points,
                                       r.faces[0].mesh.points, atol=1e-3)
        ids = [f.tracking_id for r in got for f in r.faces]
        assert ids and all(i == ids[0] for i in ids)
        det.dispose()


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="no sample assets")
class TestMultiFaceVideo:
    def test_two_faces_tracked_through_video(self, tmp_path):
        """Two faces panning together keep two distinct stable IDs."""
        cv2 = pytest.importorskip("cv2")
        from face_detection_tflite_tpu import (FaceDetectionMode,
                                               FaceDetectionModel,
                                               FaceDetector)
        group = np.asarray(Image.open(os.path.join(
            SAMPLES, "group-shot-bounding-box-ex1.jpeg")).convert("RGB"))
        # crop a region containing the two front faces, downscale
        crop = group[900:1600, 1100:2100]
        crop = cv2.resize(crop[..., ::-1], (500, 350))
        path = str(tmp_path / "two.mp4")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (500, 350))
        for i in range(5):
            vw.write(np.roll(crop, i * 3, axis=1))
        vw.release()

        det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                           enable_tracking=True,
                           model_dir=MODELS_DIR)
        results = list(det.detect_faces_from_video(
            path, FaceDetectionMode.FAST, batch_size=3))
        assert len(results) == 5
        per_frame_ids = [sorted(f.tracking_id for f in r.faces)
                         for r in results]
        assert all(len(ids) == 2 for ids in per_frame_ids), per_frame_ids
        assert all(ids == per_frame_ids[0] for ids in per_frame_ids)


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="no sample assets")
class TestVideoPrefetch:
    """The prefetch-thread rewrite of process_video must preserve stream
    semantics: ordered results, early-abandon cleanup, error surfacing."""

    def test_early_abandon_stops_reader(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from face_detection_tflite_tpu import (FaceDetectionMode,
                                               FaceDetectionModel,
                                               FaceDetector)
        img = np.asarray(Image.open(SAMPLE).convert("RGB"))[..., ::-1]
        img = cv2.resize(img, (320, 213))
        path = str(tmp_path / "long.mp4")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (320, 213))
        for i in range(40):
            vw.write(np.roll(img, i, axis=1))
        vw.release()
        det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                           model_dir=MODELS_DIR)
        it = det.detect_faces_from_video(path, FaceDetectionMode.FAST,
                                         batch_size=2)
        first = next(it)
        assert first.frame_index == 0
        it.close()  # abandon mid-stream; prefetch thread must wind down
        before = threading.active_count()
        time.sleep(0.3)
        assert threading.active_count() <= before

    def test_open_error_still_raises(self):
        from face_detection_tflite_tpu import (FaceDetectionMode,
                                               FaceDetectionModel,
                                               FaceDetector)
        det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                           model_dir=MODELS_DIR)
        with pytest.raises(ValueError, match="cannot open video"):
            list(det.detect_faces_from_video("/nonexistent/clip.mp4",
                                             FaceDetectionMode.FAST))
