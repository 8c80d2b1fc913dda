"""Round-3 behavior: readback payload reduction (device-resident det_*
slab + det_count scalar, deduped keypoints, int16 landmark quantization)
— VERDICT round 2 "Next" #1.
"""

import os

import numpy as np
import pytest
from PIL import Image

from face_detection_tflite_tpu import (FaceDetectionMode, FaceDetectionModel,
                                       FaceDetector)

from .asset_paths import MODELS_DIR, SAMPLES

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MODELS_DIR), reason="reference assets not present")


def _img(name):
    return np.asarray(Image.open(os.path.join(SAMPLES, name)).convert("RGB"))


@pytest.fixture(scope="module")
def portrait():
    return _img("landmark-ex1.jpg")


@pytest.fixture(scope="module")
def group_img():
    return _img("group-shot-bounding-box-ex1.jpeg")


class TestQuantizedReadback:
    """int16 landmark readback: error bounded by half a quantization step."""

    def test_quantized_matches_fp32_within_half_step(self, portrait):
        kw = dict(model=FaceDetectionModel.BACK_CAMERA, model_dir=MODELS_DIR)
        dq = FaceDetector(quantized_readback=True, **kw)
        df = FaceDetector(quantized_readback=False, **kw)
        h, w = portrait.shape[:2]
        scale = dq._readback_scale(h, w)
        assert scale is not None and scale > 4.0
        fq = dq.detect_faces(portrait, FaceDetectionMode.FULL)
        ff = df.detect_faces(portrait, FaceDetectionMode.FULL)
        assert len(fq) == len(ff) == 1
        step = 1.0 / scale
        mesh_err = np.abs(fq[0].mesh.points - ff[0].mesh.points)
        assert mesh_err.max() <= 0.55 * step  # round() error <= step/2
        iris_err = np.abs(fq[0].iris_points - ff[0].iris_points)
        assert iris_err.max() <= 0.55 * step
        # Non-landmark outputs are byte-exact (fp32 bitcast, not quantized).
        assert fq[0].score == ff[0].score
        assert fq[0].bounding_box_pixels == ff[0].bounding_box_pixels
        assert fq[0].blendshapes.as_dict() == ff[0].blendshapes.as_dict()

    def test_huge_images_fall_back_to_fp32(self):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        assert d._readback_scale(853, 1280) == pytest.approx(12.5)
        assert d._readback_scale(2160, 3840) == pytest.approx(32000 / 7680)
        assert d._readback_scale(4000, 6000) is None  # < 0.25 px resolution

    def test_quantization_off_knob(self, portrait):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, quantized_readback=False)
        assert d._readback_scale(*portrait.shape[:2]) is None


class TestReadbackPayload:
    """The det_* overflow slab and duplicate keypoints stay on device."""

    def test_speculative_fetch_ships_only_det_count(self, portrait):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, max_faces=16)
        import jax.numpy as jnp
        images = jnp.asarray(portrait[None])
        bucket, det, fetch, _params, _real_b = d._dispatch_speculative(
            images, FaceDetectionMode.STANDARD)
        buf, names, metas, scale = fetch
        # Device dict has the full overflow slab...
        assert {"det_boxes", "det_raw_keypoints", "det_scores",
                "det_valid", "det_count"} <= set(det)
        # ...but only the scalar count joins the host readback.
        assert "det_count" in names
        assert not any(n.startswith("det_") and n != "det_count"
                       for n in names)
        # keypoints is emitted only in full mode (duplicate of
        # raw_keypoints until iris refinement).
        assert "keypoints" not in names and "raw_keypoints" in names
        out = d._finish_speculative(
            images, (bucket, det, fetch, _params, _real_b),
            FaceDetectionMode.STANDARD)
        assert "det_count" not in out

    def test_standard_payload_budget(self, portrait):
        """Slab-1 standard readback fits a small per-image byte budget
        (the r2 payload was ~6.9 KB/img; quantized r3 is ~3 KB)."""
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, max_faces=16)
        import jax.numpy as jnp
        images = jnp.asarray(portrait[None])
        _, _, (buf, _, _, _), _params, _rb = d._dispatch_speculative(
            images, FaceDetectionMode.STANDARD)
        per_image = buf.shape[1]
        assert per_image < 3200, per_image

    def test_full_mode_keypoints_are_refined_and_standard_aliased(
            self, portrait):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        full = d.detect_faces(portrait, FaceDetectionMode.FULL)[0]
        std = d.detect_faces(portrait, FaceDetectionMode.STANDARD)[0]
        # Full-mode eye keypoints are iris-refined (differ from the raw
        # detector keypoints that standard mode aliases).
        diff = np.abs(full.detection_data.keypoints_xy[:2]
                      - std.detection_data.keypoints_xy[:2])
        assert diff.max() > 0

    def test_overflow_rerun_still_exact_with_quantization_off(
            self, group_img):
        """det_count-driven overflow: the 4-face group overflows slab 1 and
        the rerun consumes the device-resident det_* slab."""
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, max_faces=8,
                         quantized_readback=False)
        h, w = group_img.shape[:2]
        faces = d.detect_faces(group_img, FaceDetectionMode.STANDARD)
        assert len(faces) == 4
        stages = set(d.timings.report())
        assert any(s.startswith("face_stages") for s in stages), stages


class TestEmbeddingSlab:
    """embed_batch pads N to power-of-two slabs: one compile per
    (h, w, slab) instead of per face count (VERDICT r2 weak #6)."""

    def test_slab_keys_and_parity(self):
        from face_detection_tflite_tpu.models.embedding import FaceEmbedding
        import warnings as _w
        emb = FaceEmbedding.load(None, allow_untrained=True)
        img = (np.random.default_rng(3)
               .uniform(0, 255, (96, 128, 3)).astype(np.uint8))
        pairs = [((20 + 9 * i, 30), (50 + 9 * i, 32)) for i in range(5)]
        with _w.catch_warnings():
            _w.simplefilter("ignore")
            for n in (1, 2, 3, 5):
                out = emb.embed_batch(img, pairs[:n])
                assert out.shape == (n, 192)
                for i in range(n):
                    single = emb.embed(img, *pairs[i])
                    assert np.allclose(out[i], single, atol=1e-5)
        # n=1,2,3,5 -> slabs 1,2,4,8 (3 shares 4's trace; 4 would reuse
        # it too).  ONE jitted program now serves every slab: jax re-traces
        # per padded shape, so its trace-cache size IS the compile count.
        many = emb._programs["many"]
        assert many._cache_size() == 4
        with _w.catch_warnings():
            _w.simplefilter("ignore")
            out4 = emb.embed_batch(img, pairs[:4])  # reuses slab 4
        assert out4.shape == (4, 192)
        assert many._cache_size() == 4  # no new trace for n=4


class TestSegmentationConfig:
    """SegmentationConfig presets + mask byte/filepath entry points
    (VERDICT r2 missing #3 / next #9; face_types.dart:236-279)."""

    def test_presets(self):
        from face_detection_tflite_tpu import (SegmentationConfig,
                                               SegmentationModel)
        safe = SegmentationConfig.safe()
        assert safe.precision == "highest" and safe.max_output_size == 1024
        perf = SegmentationConfig.performance()
        assert perf.mask_dtype == "float32" and perf.max_output_size == 2048
        fast = SegmentationConfig.fast()
        assert fast.mask_dtype == "uint8"
        assert perf.model is SegmentationModel.GENERAL
        with pytest.raises(ValueError):
            SegmentationConfig(mask_dtype="int4")
        with pytest.raises(ValueError):
            SegmentationConfig(max_output_size=0)

    def test_uint8_mask_within_half_step(self, portrait):
        from face_detection_tflite_tpu import SegmentationConfig
        kw = dict(model=FaceDetectionModel.BACK_CAMERA, model_dir=MODELS_DIR)
        d8 = FaceDetector(segmentation_config=SegmentationConfig.fast(), **kw)
        df = FaceDetector(with_segmentation=True, **kw)
        m8 = d8.get_segmentation_mask(portrait)
        mf = df.get_segmentation_mask(portrait)
        assert m8.data.shape == mf.data.shape
        assert np.abs(m8.data - mf.data).max() <= 0.5 / 255 + 1e-6
        # IoU of the thresholded masks is essentially unchanged.
        a, b = m8.data >= 0.5, mf.data >= 0.5
        assert (a & b).sum() / max((a | b).sum(), 1) > 0.995

    def test_max_output_size_caps_upsample(self, portrait):
        from face_detection_tflite_tpu import SegmentationConfig
        cfg = SegmentationConfig(max_output_size=256)
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, segmentation_config=cfg)
        mask = d.get_segmentation_mask(portrait)
        up = mask.upsample()
        assert max(up.data.shape) == 256  # capped, not original 1280
        # Explicit max_size still overrides the config default.
        up2 = mask.upsample(max_size=128)
        assert max(up2.data.shape) == 128

    def test_mask_from_bytes_shares_decode_cache(self, portrait):
        import io
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, with_segmentation=True)
        buf = io.BytesIO()
        Image.fromarray(portrait).save(buf, format="PNG")
        data = buf.getvalue()
        faces = d.detect_faces_from_bytes(data,
                                          FaceDetectionMode.STANDARD)
        assert len(faces) == 1
        cached = d._decode_cache[1]
        mask = d.get_segmentation_mask_from_bytes(data)
        assert d._decode_cache[1] is cached  # decoded once, reused
        assert mask.original_width == portrait.shape[1]

    def test_mask_from_filepath(self):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, with_segmentation=True)
        mask = d.get_segmentation_mask_from_filepath(
            os.path.join(SAMPLES, "landmark-ex1.jpg"))
        assert mask.data.ndim == 2 and 0.0 <= mask.data.min()

    def test_validate_model_channel_mismatch(self):
        from face_detection_tflite_tpu import (SegmentationConfig,
                                               SegmentationModel)
        # The binary segmenter file under a multiclass config must be
        # rejected by load-time validation (selfie_segmentation.dart:424).
        cfg = SegmentationConfig(model=SegmentationModel.MULTICLASS)
        with pytest.raises((ValueError, FileNotFoundError)):
            FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, segmentation_config=cfg)


class TestTimingStageSplit:
    """The compute_wait/readback split is opt-in (`detailed_timings`,
    the reference's `debugTimings` analog): the extra block_until_ready
    sync it needs costs a full host-device round trip per batch
    (measured: pipelined stream 445 -> 263 img/s on the relay), so the
    default path times one combined `compute_readback` stage."""

    def test_default_single_stage_no_extra_sync(self, portrait):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        d.detect_faces(portrait, FaceDetectionMode.STANDARD)
        stages = d.timings.report()
        assert any(s.startswith("compute_readback") for s in stages), stages
        assert not any(s.startswith("compute_wait") for s in stages)

    def test_detailed_timings_splits(self, portrait):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, detailed_timings=True)
        d.detect_faces(portrait, FaceDetectionMode.STANDARD)
        stages = d.timings.report()
        assert any(s.startswith("compute_wait") for s in stages), stages
        assert any(s == "readback" for s in stages), stages


class TestMaskMaxSizePropagation:
    """SegmentationConfig.max_output_size survives upsample chains and
    serialize round trips (code-review r3 finding #1)."""

    def test_upsample_chain_keeps_cap(self):
        from face_detection_tflite_tpu.models.segmentation import (
            SegmentationMask)
        m = SegmentationMask(np.zeros((64, 64), np.float32), 1280, 853,
                             (0.0, 0.0, 0.0, 0.0), default_max_size=256)
        up = m.upsample()
        assert up.default_max_size == 256
        assert max(up.data.shape) == 256
        up2 = up.upsample()  # second hop still capped
        assert max(up2.data.shape) == 256

    def test_serialize_roundtrip_keeps_cap(self):
        from face_detection_tflite_tpu.models.segmentation import (
            SegmentationMask)
        m = SegmentationMask(np.zeros((32, 32), np.float32), 640, 480,
                             (0.0, 0.0, 0.0, 0.0), default_max_size=128)
        r = SegmentationMask.deserialize(m.serialize())
        assert r.default_max_size == 128
        assert max(r.upsample().data.shape) == 128
        # Legacy payloads without the field default to 2048.
        d = m.serialize(); d.pop("default_max_size")
        assert SegmentationMask.deserialize(d).default_max_size == 2048


class TestDevicePutCache:
    """detect -> embed/segment on the same frame uploads it ONCE (the TPU
    analog of the reference's decode-reuse cache,
    face_detector.dart:1390-1430; one 1280x853 upload costs ~76 ms on
    relay-attached devices)."""

    def test_same_frame_reuses_device_copy(self, portrait):
        import jax.numpy as jnp
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        d.detect_faces(portrait, FaceDetectionMode.FAST)
        assert d._devput_cache is not None
        dev1 = d._devput_cache[2]
        dev2 = d._device_put_cached(portrait)
        assert dev2 is dev1  # cache hit: no second upload

    def test_mutated_frame_reuploads(self, portrait):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        a = portrait.copy()
        dev1 = d._device_put_cached(a)
        a[0, 0, 0] ^= 0xFF  # in-place mutation (camera ring buffer)
        dev2 = d._device_put_cached(a)
        assert dev2 is not dev1  # checksum guard caught the new content
        np.testing.assert_array_equal(np.asarray(dev2), a)

    def test_device_arrays_pass_through(self, portrait):
        import jax.numpy as jnp
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        dev = jnp.asarray(portrait)
        assert d._device_put_cached(dev) is dev


class TestEmbedInFull:
    """Fused MobileFaceNet stage in the FULL program (VERDICT r2 next #4):
    every FULL-mode face carries a 192-dim embedding from the SAME device
    call, matching the separate getFaceEmbedding path."""

    def test_full_mode_faces_carry_matching_embeddings(self, portrait):
        import warnings as _w
        with _w.catch_warnings():
            _w.simplefilter("ignore")
            d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                             model_dir=MODELS_DIR, embed_in_full=True,
                             allow_untrained_embeddings=True)
            faces = d.detect_faces(portrait, FaceDetectionMode.FULL)
            assert len(faces) == 1
            emb = faces[0].embedding
            assert emb is not None and emb.shape == (192,)
            assert abs(np.linalg.norm(emb) - 1.0) < 1e-4
            # Parity with the separate embedding call (same refined eye
            # centers, same weights; different XLA programs -> float noise).
            sep = d.get_face_embedding(faces[0], portrait)
            assert np.abs(emb - sep).max() < 1e-3
            # Tracking preserves the embedding.
            assert faces[0].with_tracking_id(7).embedding is emb

    def test_standard_mode_has_no_embedding(self, portrait):
        import warnings as _w
        with _w.catch_warnings():
            _w.simplefilter("ignore")
            d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                             model_dir=MODELS_DIR, embed_in_full=True,
                             allow_untrained_embeddings=True)
            faces = d.detect_faces(portrait, FaceDetectionMode.STANDARD)
        assert faces[0].embedding is None

    def test_default_detector_has_no_embedding(self, portrait):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        faces = d.detect_faces(portrait, FaceDetectionMode.FULL)
        assert faces[0].embedding is None

    def test_with_embeddings_requires_full_mode(self):
        from face_detection_tflite_tpu.models.embedding import (
            build_mobilefacenet)
        from face_detection_tflite_tpu.convert.executor import convert_file
        from face_detection_tflite_tpu.pipeline.programs import (
            PipelineModels, build_pipeline_program)
        models = PipelineModels(
            detector=convert_file(os.path.join(
                MODELS_DIR, "face_detection_short_range.tflite")),
            variant="short", embedding=build_mobilefacenet())
        with pytest.raises(ValueError, match="FULL|mesh"):
            build_pipeline_program(models, 64, 64,
                                   FaceDetectionMode.STANDARD,
                                   with_embeddings=True)

    def test_untrained_warns_at_construction(self):
        from face_detection_tflite_tpu.models.embedding import (
            UntrainedEmbeddingWarning)
        with pytest.warns(UntrainedEmbeddingWarning):
            FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, embed_in_full=True)


class TestRound3ReviewFixes:
    """Regression pins for the round-3 self-review findings."""

    def test_dispose_frees_fused_embedding_and_upload_cache(self, portrait):
        import warnings as _w
        with _w.catch_warnings():
            _w.simplefilter("ignore")
            d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                             model_dir=MODELS_DIR, embed_in_full=True,
                             allow_untrained_embeddings=True)
            d.detect_faces(portrait, FaceDetectionMode.FULL)
        assert d._devput_cache is not None
        emb_model = d.models.embedding
        assert emb_model is not None and emb_model.params
        d.dispose()
        # The fused embedding weights and the cached device frame are the
        # two references dispose() previously leaked.
        assert d._devput_cache is None
        assert emb_model.params == {}
        assert d.models.embedding is None

    def test_reference_model_dir_env_is_read_per_call(self, tmp_path,
                                                      monkeypatch):
        from face_detection_tflite_tpu.pipeline import detector as det_mod
        # Simulate "package imported before the env knob was set": the
        # default assets dir is hidden, then the knob is set post-import.
        monkeypatch.setattr(det_mod, "_DEFAULT_MODEL_DIRS", ())
        monkeypatch.delenv("FDT_TPU_MODEL_DIR", raising=False)
        monkeypatch.delenv("FDT_REFERENCE_MODEL_DIR", raising=False)
        with pytest.raises(FileNotFoundError):
            det_mod.resolve_model_dir()
        monkeypatch.setenv("FDT_REFERENCE_MODEL_DIR", str(tmp_path))
        assert det_mod.resolve_model_dir() == str(tmp_path)

    def test_imported_npz_reaches_face_detector(self, tmp_path):
        from .test_import_weights import _synthetic_state_dict
        from import_weights import import_mobilefacenet_state_dict
        model_dir = tmp_path / "models"
        model_dir.mkdir()
        for name in os.listdir(MODELS_DIR):
            if name.endswith(".tflite"):
                os.symlink(os.path.join(MODELS_DIR, name),
                           model_dir / name)
        params = import_mobilefacenet_state_dict(_synthetic_state_dict())
        np.savez_compressed(model_dir / "mobilefacenet.npz", **params)
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=str(model_dir))
        # The imported checkpoint is picked up with zero code: embeddings
        # count as trained (no UntrainedEmbeddingWarning path).
        assert d.embedding_model.is_pretrained
        d.dispose()

    def test_segmentation_device_input_passes_through(self, portrait):
        import jax.numpy as jnp
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        dev = jnp.asarray(portrait)
        mask = d.get_segmentation_mask(dev)
        assert mask.width and mask.height
        # A device-resident frame must not round-trip through the host
        # (np.asarray D2H + re-upload): the upload cache stays empty.
        assert d._devput_cache is None
        d.dispose()

    def test_mixed_precision_small_frac_demotes_nothing(self):
        from face_detection_tflite_tpu.convert.executor import (
            mixed_precision)

        class _Op:
            def __init__(self, name):
                self.name = name

        # frac*n_convs < 1 must NOT demote the stem conv to bf16.
        ops = [_Op("CONV_2D"), _Op("RESHAPE")]
        assert mixed_precision(ops, frac=0.4) == "high"
        assert mixed_precision([_Op("RESHAPE")], frac=0.5) == "high"
        spec = mixed_precision(ops, frac=1.0)
        assert spec(0, "CONV_2D") == "default"

    def test_convert_model_does_not_consume_ir(self):
        """convert_model must not mutate its ModelIR: converting the same
        parsed IR at several precisions (mixed_frac_sweep) must work."""
        import jax.numpy as jnp
        from face_detection_tflite_tpu.convert.executor import convert_model
        from face_detection_tflite_tpu.convert.tflite import parse_tflite
        with open(os.path.join(MODELS_DIR,
                               "face_detection_short_range.tflite"),
                  "rb") as f:
            ir = parse_tflite(f.read())
        m1 = convert_model(ir, precision="highest")
        m2 = convert_model(ir, precision="default")  # was KeyError
        x = jnp.zeros(m1.input_shapes[0], jnp.float32)
        a = np.asarray(m1.fn(m1.params, x)[0])
        b = np.asarray(m2.fn(m2.params, x)[0])
        assert np.isfinite(a).all() and np.isfinite(b).all()
        assert a.shape == b.shape

    def test_smoother_preserves_embeddings(self):
        from face_detection_tflite_tpu.pipeline.smoothing import FaceSmoother
        from face_detection_tflite_tpu.pipeline.types import (Detection, Face,
                                                              FaceMesh, RectF)
        emb = np.random.default_rng(0).normal(size=192).astype(np.float32)
        face = Face(
            detection=Detection(RectF(0.1, 0.1, 0.5, 0.5), 0.9,
                                np.zeros((6, 2), np.float32)),
            mesh=FaceMesh(np.zeros((468, 3), np.float32), score=0.9),
            irises=np.zeros((0, 3)), original_size=(100.0, 100.0),
            embedding=emb)
        for method in ("ema", "one_euro"):
            sm = FaceSmoother(method=method)
            out = sm.smooth([face], t_sec=0.0)
            assert out[0].embedding is emb, method

    def test_converted_fn_does_not_capture_ir(self):
        """fn closing over the ModelIR would pin the flatbuffer blob
        (every tensor .data is a view into it) for the model's life."""
        import gc
        import weakref
        from face_detection_tflite_tpu.convert.executor import convert_model
        from face_detection_tflite_tpu.convert.tflite import parse_tflite
        with open(os.path.join(MODELS_DIR,
                               "face_detection_short_range.tflite"),
                  "rb") as f:
            ir = parse_tflite(f.read())
        cm = convert_model(ir)
        assert "ir" not in cm.fn.__code__.co_freevars
        wr = weakref.ref(ir)
        del ir
        gc.collect()
        assert wr() is None, "ConvertedModel retains the parsed IR"

    def test_combined_call_accepts_device_frame(self, portrait):
        import jax.numpy as jnp
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        faces, mask = d.detect_faces_with_segmentation(jnp.asarray(portrait))
        assert len(faces) == 1 and mask.width
        assert d._devput_cache is None  # no host round trip happened
        d.dispose()
