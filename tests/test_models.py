"""Tests for the segmentation and embedding model wrappers."""

import os

import numpy as np
import pytest

from PIL import Image

from face_detection_tflite_tpu.convert.executor import convert_file
from face_detection_tflite_tpu.models.embedding import (
    FaceEmbedding, build_mobilefacenet, compute_embedding_alignment,
    cosine_similarity, euclidean_distance)
from face_detection_tflite_tpu.models.segmentation import (
    SegmentationMask, SelfieSegmentation)

from .asset_paths import MODELS_DIR, SAMPLES


def _img(name):
    return np.asarray(Image.open(os.path.join(SAMPLES, name)).convert("RGB"))


@pytest.mark.skipif(not os.path.isdir(MODELS_DIR),
                    reason="reference assets not present")
class TestSegmentation:
    @pytest.fixture(scope="class")
    def seg(self):
        return SelfieSegmentation(convert_file(
            os.path.join(MODELS_DIR, "selfie_segmenter.tflite")))

    def test_portrait_mask_is_sensible(self, seg):
        """Person probability high on the face, low at image corners."""
        img = _img("landmark-ex1.jpg")
        (mask,) = seg(img[None])
        assert mask.data.shape == (256, 256)
        assert (mask.data >= 0).all() and (mask.data <= 1).all()
        # Face box center (from the detection test): ~(0.48, 0.52).
        assert mask.confidence_at(0.48, 0.52) > 0.9
        assert mask.confidence_at(0.02, 0.05) < 0.3

    def test_upsample_crops_padding(self, seg):
        img = _img("landmark-ex1.jpg")
        (mask,) = seg(img[None])
        up = mask.upsample()
        assert up.shape == (img.shape[0], img.shape[1]) if hasattr(up, "shape") \
            else up.data.shape == (img.shape[0], img.shape[1])
        assert up.padding == (0.0, 0.0, 0.0, 0.0)

    def test_upsample_max_size_cap(self, seg):
        img = _img("landmark-ex1.jpg")
        (mask,) = seg(img[None])
        up = mask.upsample(max_size=512)
        assert max(up.data.shape) == 512

    def test_upsample_matches_reference_resampler(self):
        """Pixel-exact vs a direct port of the reference's Dart upsample
        loop (`face_types.dart:344-414`): crop the rounded valid region,
        then bilinear with CORNER-anchored sampling (src = i * scale,
        floor + clamped neighbor) — NOT cv2 half-pixel semantics (a
        round-2 review caught the half-pixel variant shifting masks ~0.4
        source px vs the reference)."""
        from face_detection_tflite_tpu.models.segmentation import (
            SegmentationMask)
        rng = np.random.default_rng(3)
        data = rng.uniform(0, 1, (64, 48)).astype(np.float32)
        padding = (0.1, 0.15, 0.05, 0.0)
        up = SegmentationMask(data, 200, 150, padding).upsample().data

        # -- direct port of the Dart loops --------------------------------
        h, w = data.shape
        pt, pb, pl, pr = padding
        x0, y0 = round(pl * w), round(pt * h)
        x1, y1 = round((1.0 - pr) * w), round((1.0 - pb) * h)
        src = data[y0:y1, x0:x1]
        sh, sw = src.shape
        fw, fh = 200, 150
        expected = np.zeros((fh, fw), np.float32)
        for y in range(fh):
            src_y = y * (sh / fh)
            yy0 = min(max(int(np.floor(src_y)), 0), sh - 1)
            yy1 = min(yy0 + 1, sh - 1)
            fy = src_y - yy0
            for x in range(fw):
                src_x = x * (sw / fw)
                xx0 = min(max(int(np.floor(src_x)), 0), sw - 1)
                xx1 = min(xx0 + 1, sw - 1)
                fx = src_x - xx0
                v0 = src[yy0, xx0] * (1 - fx) + src[yy0, xx1] * fx
                v1 = src[yy1, xx0] * (1 - fx) + src[yy1, xx1] * fx
                expected[y, x] = v0 * (1 - fy) + v1 * fy
        np.testing.assert_allclose(up, expected, atol=1e-5)

    def test_landscape_model(self):
        seg = SelfieSegmentation(convert_file(
            os.path.join(MODELS_DIR, "selfie_segmenter_landscape.tflite")))
        img = _img("landmark-ex1.jpg")
        (mask,) = seg(img[None])
        assert mask.data.shape == (144, 256)

    def test_upsample_rounds_half_away_from_zero(self, seg):
        """Dart .round() rounds half AWAY FROM ZERO; Python's banker's
        round would make (1500.5).round() land on 1500 instead of the
        reference's 1501 (`face_types.dart:355-356`)."""
        from face_detection_tflite_tpu.models.segmentation import (
            SegmentationMask, mask_valid_region)
        mask = SegmentationMask(np.zeros((256, 256), np.float32),
                                original_width=4096, original_height=3001,
                                padding=(0.0, 0.0, 0.0, 0.0))
        up = mask.upsample(max_size=2048)  # scale 0.5 -> 3001*0.5 = 1500.5
        assert up.data.shape == (1501, 2048)
        # Valid-region crop rounding too: 0.123046875 * 256 = 31.5 ->
        # Dart 32 (Python's round() gives 32 here but 30 for 30.5; pin
        # the odd case that diverges).
        region = mask_valid_region(256, 256, (30.5 / 256, 0.0, 0.0, 0.0))
        assert region[1] == 31  # floor(30.5 + 0.5); banker's gives 30

    def test_grayscale_batch_dispatch(self, seg):
        """[B, H, W] grayscale batches segment like their RGB-replicated
        form (normalize_channels' documented input; a 3-D array is a
        single image only when its last dim is channel-shaped)."""
        img = _img("landmark-ex1.jpg")
        gray = img.mean(axis=-1).astype(np.uint8)
        (m_gray,) = seg(gray[None])  # [1, H, W] batch
        (m_rgb,) = seg(np.repeat(gray[None, ..., None], 3, axis=-1))
        np.testing.assert_allclose(m_gray.data, m_rgb.data, atol=1e-6)

    def test_program_survives_concurrent_dispose(self, seg):
        """The compiled program closes over a model SNAPSHOT: tracing
        after a dispose() must not hit self.model=None (the dispatch
        dispose-race guard's actual failure mode)."""
        from face_detection_tflite_tpu.models.segmentation import (
            SelfieSegmentation)
        from face_detection_tflite_tpu.convert.executor import convert_file
        s = SelfieSegmentation(convert_file(
            os.path.join(MODELS_DIR, "selfie_segmenter.tflite")))
        model = s.model
        prog, lbp = s._program(model, 64, 64)  # built, not yet traced
        s.dispose()  # concurrent dispose between dispatch() and tracing
        import jax.numpy as jnp
        out = prog(model.params, jnp.zeros((1, 64, 64, 3), jnp.float32))
        assert np.asarray(out).shape == (1, 256, 256, 1)
        with pytest.raises(RuntimeError, match="disposed"):
            s.dispatch(np.zeros((64, 64, 3), np.uint8))

    def test_too_small_image_rejected(self, seg):
        # kMinSegmentationInputSize = 16 (selfie_segmentation.dart:4);
        # 16x16 itself is accepted, below is rejected.
        with pytest.raises(ValueError, match="smaller than minimum"):
            seg(np.zeros((15, 15, 3), np.uint8)[None])

    def test_batch(self, seg):
        img = _img("landmark-ex1.jpg")
        masks = seg(np.stack([img, img]))
        assert len(masks) == 2
        assert np.allclose(masks[0].data, masks[1].data)


class TestEmbedding:
    @pytest.fixture(scope="class")
    def emb(self):
        # Use the trained model when present, the random-init fallback
        # otherwise (explicit-but-missing paths raise by design).
        path = os.path.join(MODELS_DIR, "mobilefacenet.tflite")
        return FaceEmbedding.load(path if os.path.exists(path) else None)

    def test_alignment_math(self):
        # eyes horizontal, 40 px apart at (80,100)/(120,100)
        cx, cy, size, theta = compute_embedding_alignment((80, 100),
                                                          (120, 100))
        assert size == pytest.approx(100.0)  # 2.5 * 40
        assert theta == pytest.approx(0.0)
        assert cx == pytest.approx(100.0)
        assert cy == pytest.approx(100.0 + 15.0)  # 0.15 * size below

    def test_alignment_rotated(self):
        cx, cy, size, theta = compute_embedding_alignment((0, 0), (0, 40))
        assert theta == pytest.approx(np.pi / 2)
        # offset is perpendicular to the eye axis
        assert cx == pytest.approx(0.0 - 100 * 0.15)
        assert cy == pytest.approx(20.0)

    def test_embedding_shape_and_norm(self, emb):
        img = _img("landmark-ex1.jpg")
        v = emb.embed(img, (504, 352), (698, 326))
        assert v.shape == (192,)
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)

    def test_embedding_deterministic(self, emb):
        img = _img("landmark-ex1.jpg")
        v1 = emb.embed(img, (504, 352), (698, 326))
        v2 = emb.embed(img, (504, 352), (698, 326))
        assert np.allclose(v1, v2)

    def test_similarity_helpers(self):
        a = np.asarray([1.0, 0.0, 0.0])
        b = np.asarray([0.0, 1.0, 0.0])
        assert cosine_similarity(a, a) == pytest.approx(1.0)
        assert cosine_similarity(a, b) == pytest.approx(0.0)
        assert euclidean_distance(a, b) == pytest.approx(np.sqrt(2))
        with pytest.raises(ValueError, match="dimensions must match"):
            cosine_similarity(a, np.zeros(5))

    def test_random_init_fallback_flagged(self):
        emb = FaceEmbedding.load(None)
        assert not emb.is_pretrained

    def test_explicit_missing_path_raises(self):
        """An explicit path that does not exist must raise, not silently
        fall back to meaningless random-init weights."""
        with pytest.raises(FileNotFoundError):
            FaceEmbedding.load("/nonexistent/mobilefacenet.tflite")

    def test_mobilefacenet_architecture(self):
        import jax.numpy as jnp
        m = build_mobilefacenet()
        (out,) = m(jnp.zeros((1, 112, 112, 3)))
        assert out.shape == (1, 192)
        # ~1M params like the real MobileFaceNet
        assert 0.5e6 < m.num_params < 3e6


class TestMulticlassPath:
    def test_multiclass_program_with_synthetic_model(self):
        """The multiclass softmax/person-mask path, exercised with a
        synthetic 6-channel 'model' (real weights ship out-of-repo,
        pubspec.yaml:46)."""
        import jax.numpy as jnp
        from face_detection_tflite_tpu.convert.executor import ConvertedModel
        from face_detection_tflite_tpu.models.segmentation import (
            MulticlassSegmentationMask, SegmentationClass)

        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(1, 64, 64, 6)), jnp.float32)

        def fn(params, x):
            return (logits,)

        fake = ConvertedModel({}, fn, [(1, 64, 64, 3)], [(1, 64, 64, 6)],
                              name="synthetic-multiclass")
        seg = SelfieSegmentation(fake, multiclass=True)
        img = np.zeros((64, 64, 3), np.uint8)
        (mask,) = seg(img[None])
        assert isinstance(mask, MulticlassSegmentationMask)
        assert mask.class_data.shape == (64, 64, 6)
        # softmax sums to 1 per pixel
        assert np.allclose(mask.class_data.sum(-1), 1.0, atol=1e-5)
        # person = 1 - background
        assert np.allclose(
            mask.data,
            1.0 - mask.class_mask(SegmentationClass.BACKGROUND), atol=1e-6)
        # all six class masks accessible
        for cls in SegmentationClass:
            assert mask.class_mask(cls).shape == (64, 64)


class TestBatchedEmbedding:
    def test_embed_batch_matches_loop(self):
        emb = FaceEmbedding.load(None)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
        pairs = [((100.0, 100.0), (140.0, 102.0)),
                 ((200.0, 120.0), (240.0, 118.0))]
        batch = emb.embed_batch(img, pairs)
        assert batch.shape == (2, 192)
        for i, (le, re) in enumerate(pairs):
            single = emb.embed(img, le, re)
            assert np.allclose(batch[i], single, atol=1e-5)

    def test_degenerate_eyes_raise(self):
        """Coincident (or sub-pixel-apart) eye points make the aligned
        crop round to 0 px: the reference's extractAlignedSquare returns
        null and getFaceEmbedding throws (face_detector_core.dart:433-440)
        — silently embedding a 1-px clamp would feed compare_faces
        garbage."""
        from face_detection_tflite_tpu.models.embedding import FaceEmbedding
        emb = FaceEmbedding.load(allow_untrained=True)
        img = np.zeros((64, 64, 3), np.uint8)
        with pytest.raises(ValueError, match="aligned face crop"):
            emb.embed(img, (32.0, 32.0), (32.0, 32.0))
        with pytest.raises(ValueError, match="aligned face crop"):
            emb.embed_batch(img, [((10.0, 10.0), (40.0, 10.0)),
                                  ((32.0, 32.0), (32.1, 32.0))])

    def test_plural_embeddings_null_per_face(self):
        """FaceDetector.get_face_embeddings mirrors the reference's
        per-face failure contract (getFaceEmbeddings returns
        List<Float32List?>, face_detector.dart:786-816): a degenerate
        face yields None, the rest still embed in one batch."""
        import dataclasses
        from face_detection_tflite_tpu import (FaceDetectionMode,
                                               FaceDetectionModel,
                                               FaceDetector)
        from face_detection_tflite_tpu.pipeline.types import Face
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR,
                         allow_untrained_embeddings=True)
        img = _img("landmark-ex1.jpg")
        (good,) = d.detect_faces(img, FaceDetectionMode.STANDARD)
        # A caller-constructed Face with coincident eyes (the reference's
        # malformed-Face case).
        kp = np.full((6, 2), 0.5, np.float32)
        bad = Face(dataclasses.replace(good.detection_data,
                                       keypoints_xy=kp),
                   good.mesh, np.zeros((0, 3)), good.original_size)
        out = d.get_face_embeddings([good, bad, good], img)
        assert out[1] is None
        assert out[0] is not None and out[2] is not None
        np.testing.assert_allclose(out[0], out[2], atol=1e-6)
        single = d.get_face_embedding(good, img)
        np.testing.assert_allclose(out[0], single, atol=1e-6)
        d.dispose()

    def test_embed_batch_empty(self):
        emb = FaceEmbedding.load(None)
        out = emb.embed_batch(np.zeros((64, 64, 3), np.uint8), [])
        assert out.shape == (0, 192)
