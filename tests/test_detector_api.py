"""FaceDetector public-API behavior: gates, tracking, lifecycle, combined
detect+segment.  Mirrors `test/face_detector_test.dart` /
`face_tracking_test.dart` surfaces that don't need isolates.
"""

import os
import warnings

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
def group_img():
    return _img("group-shot-bounding-box-ex1.jpeg")


class TestGatesIntegration:
    def test_min_score_gate_drops_faces(self, group_img):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         min_score=0.9, model_dir=MODELS_DIR)
        faces = d.detect_faces(group_img, FaceDetectionMode.FAST)
        # only the 0.918/0.908 faces survive a 0.9 floor
        assert len(faces) == 2
        assert all(f.score >= 0.9 for f in faces)

    def test_min_face_size_gate(self, group_img):
        # group shot faces are ~7-8% of width; a 20% floor drops all
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         min_face_size=0.2, model_dir=MODELS_DIR)
        assert d.detect_faces(group_img, FaceDetectionMode.FAST) == []

    def test_invalid_gates_fail_fast(self):
        with pytest.raises(ValueError):
            FaceDetector(min_score=1.5, model_dir=MODELS_DIR)
        with pytest.raises(ValueError):
            FaceDetector(max_missed_frames=-1, model_dir=MODELS_DIR)

    def test_presence_gate_disable(self):
        img = _img("landmark-ex1.jpg")
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         min_face_presence_confidence=0.0,
                         model_dir=MODELS_DIR)
        faces = d.detect_faces(img, FaceDetectionMode.STANDARD)
        assert len(faces) == 1


class TestTrackingIntegration:
    def test_ids_stable_across_frames(self, group_img):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         enable_tracking=True, model_dir=MODELS_DIR)
        f1 = d.detect_faces(group_img, FaceDetectionMode.FAST)
        f2 = d.detect_faces(group_img, FaceDetectionMode.FAST)
        assert [f.tracking_id for f in f1] == [f.tracking_id for f in f2]
        assert all(f.tracking_id is not None for f in f1)

    def test_reset_tracking_restarts_ids(self, group_img):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         enable_tracking=True, model_dir=MODELS_DIR)
        d.detect_faces(group_img, FaceDetectionMode.FAST)
        d.reset_tracking()
        f = d.detect_faces(group_img, FaceDetectionMode.FAST)
        assert sorted(x.tracking_id for x in f) == [1, 2, 3, 4]

    def test_tracking_disabled_means_no_ids(self, group_img):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        faces = d.detect_faces(group_img, FaceDetectionMode.FAST)
        assert all(f.tracking_id is None for f in faces)

    def test_tracking_config_getters(self):
        """`isTrackingEnabled`/`maxMissedFrames` analogs
        (face_detector.dart:170,177) — read-only properties."""
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         enable_tracking=True, max_missed_frames=7,
                         model_dir=MODELS_DIR)
        assert d.is_tracking_enabled is True
        assert d.max_missed_frames == 7
        d2 = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                          model_dir=MODELS_DIR)
        assert d2.is_tracking_enabled is False
        assert d2.max_missed_frames == 3  # kDefaultMaxMissedFrames
        with pytest.raises(AttributeError):
            d.is_tracking_enabled = False
        with pytest.raises(AttributeError):
            d.max_missed_frames = 9


class TestLifecycle:
    def test_dispose_blocks_use(self):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        d.dispose()
        with pytest.raises(RuntimeError, match="dispose"):
            d.detect_faces(np.zeros((64, 64, 3), np.uint8))

    def test_context_manager(self):
        with FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                          model_dir=MODELS_DIR) as d:
            assert d.is_ready
        assert not d.is_ready

    def test_from_filepath_and_bytes(self):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        path = os.path.join(SAMPLES, "landmark-ex1.jpg")
        f1 = d.detect_faces_from_filepath(path, FaceDetectionMode.FAST)
        with open(path, "rb") as fh:
            f2 = d.detect_faces_from_bytes(fh.read(), FaceDetectionMode.FAST)
        assert len(f1) == len(f2) == 1
        assert f1[0].bounding_box == f2[0].bounding_box


class TestVariants:
    @pytest.mark.parametrize("variant", [FaceDetectionModel.SHORT_RANGE,
                                         FaceDetectionModel.FRONT_CAMERA,
                                         FaceDetectionModel.FULL,
                                         FaceDetectionModel.FULL_SPARSE])
    def test_all_variants_detect_portrait(self, variant):
        d = FaceDetector(model=variant, model_dir=MODELS_DIR)
        faces = d.detect_faces(_img("landmark-ex1.jpg"),
                               FaceDetectionMode.FAST)
        assert len(faces) == 1


class TestCombined:
    def test_detect_with_segmentation(self):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         with_segmentation=True, model_dir=MODELS_DIR)
        img = _img("landmark-ex1.jpg")
        faces, mask = d.detect_faces_with_segmentation(img)
        assert len(faces) == 1
        assert mask.data.shape == (256, 256)
        # Face center must be person
        bb = faces[0].bounding_box
        assert mask.confidence_at((bb.xmin + bb.xmax) / 2,
                                  (bb.ymin + bb.ymax) / 2) > 0.9

    def test_embedding_through_detector(self):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        img = _img("landmark-ex1.jpg")
        (face,) = d.detect_faces(img)
        emb = d.get_face_embedding(face, img)
        assert emb.shape == (192,)
        assert np.linalg.norm(emb) == pytest.approx(1.0, abs=1e-5)
        assert d.compare_faces(emb, emb) == pytest.approx(1.0)
        assert d.face_distance(emb, emb) == pytest.approx(0.0)


class TestServingPipeline:
    def test_depth_must_be_positive(self):
        """depth=0 would make queue.Queue UNBOUNDED (maxsize=0 means
        infinite), silently voiding the documented 2*depth+1 memory
        bound; validated like detect_faces_batch_stream's depth."""
        from face_detection_tflite_tpu.pipeline.serving import ServingPipeline
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR)
        for bad in (0, -1):
            with pytest.raises(ValueError, match="depth"):
                ServingPipeline(d, FaceDetectionMode.FAST, depth=bad)
        d.dispose()

    def test_submit_shape_validation_is_eager(self):
        """Malformed batches raise in submit(), not in the worker; good
        shapes pass the shape-only validator (no device ops on submit)."""
        from face_detection_tflite_tpu.utils.image import validate_batch_shape
        for ok in ((2, 8, 8, 3), (2, 8, 8, 4), (2, 8, 8, 1), (2, 8, 8)):
            validate_batch_shape(ok)
        with pytest.raises(ValueError, match="channel count"):
            validate_batch_shape((2, 8, 8, 7))
        with pytest.raises(ValueError, match="batch"):
            validate_batch_shape((8, 8))
        from face_detection_tflite_tpu.pipeline.serving import ServingPipeline
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR)
        with ServingPipeline(d, FaceDetectionMode.FAST, depth=1) as pipe:
            with pytest.raises(ValueError, match="channel count"):
                pipe.submit(np.zeros((1, 64, 64, 7), np.uint8))
        d.dispose()

    def test_pipelined_batches_match_direct(self):
        from face_detection_tflite_tpu.pipeline.serving import ServingPipeline
        from PIL import Image
        img = np.asarray(Image.open(
            os.path.join(SAMPLES, "landmark-ex1.jpg")).convert("RGB"))
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        direct = d.detect_faces_batch(img[None], FaceDetectionMode.FAST)
        with ServingPipeline(d, FaceDetectionMode.FAST, depth=2) as pipe:
            futs = [pipe.submit(img[None]) for _ in range(4)]
            results = [f.result(timeout=300) for f in futs]
        for r in results:
            assert len(r[0]) == len(direct[0]) == 1
            assert r[0][0].bounding_box == direct[0][0].bounding_box

    def test_with_segmentation_stream(self):
        """Segmentation rides the pipelined serving stream (VERDICT r2
        next #3): each Future resolves to (faces, mask) pairs that match
        the direct combined call."""
        from face_detection_tflite_tpu.pipeline.serving import ServingPipeline
        from PIL import Image
        img = np.asarray(Image.open(
            os.path.join(SAMPLES, "landmark-ex1.jpg")).convert("RGB"))
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, with_segmentation=True)
        direct_faces, direct_mask = d.detect_faces_with_segmentation(
            img, FaceDetectionMode.FAST)
        with ServingPipeline(d, FaceDetectionMode.FAST, depth=2,
                             with_segmentation=True) as pipe:
            futs = [pipe.submit(img[None]) for _ in range(3)]
            results = [f.result(timeout=300) for f in futs]
        for r in results:
            assert len(r) == 1
            faces, mask = r[0]
            assert len(faces) == len(direct_faces) == 1
            assert faces[0].bounding_box == direct_faces[0].bounding_box
            np.testing.assert_allclose(mask.data, direct_mask.data,
                                       atol=1e-6)

    def test_with_segmentation_lazy_loads(self):
        from face_detection_tflite_tpu.pipeline.serving import ServingPipeline
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        assert d._segmentation is None
        pipe = ServingPipeline(d, with_segmentation=True)
        assert d._segmentation is not None
        pipe.close()

    def test_submit_encoded_bytes(self):
        from face_detection_tflite_tpu.pipeline.serving import ServingPipeline
        data = open(os.path.join(SAMPLES, "landmark-ex1.jpg"), "rb").read()
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        with ServingPipeline(d, FaceDetectionMode.FAST) as pipe:
            faces = pipe.submit([data, data]).result(timeout=300)
        assert len(faces) == 2 and all(len(f) == 1 for f in faces)

    def test_closed_pipeline_rejects(self):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        from face_detection_tflite_tpu.pipeline.serving import ServingPipeline
        pipe = ServingPipeline(d)
        pipe.close()
        with pytest.raises(RuntimeError):
            pipe.submit(np.zeros((1, 64, 64, 3), np.uint8))

    def test_bad_batch_raises_at_submit_not_worker(self):
        """Malformed shapes must fail the submit() call itself, never
        poison the worker's pipelined stream (later batches still work)."""
        from face_detection_tflite_tpu.pipeline.serving import ServingPipeline
        from PIL import Image
        img = np.asarray(Image.open(
            os.path.join(SAMPLES, "landmark-ex1.jpg")).convert("RGB"))
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        with ServingPipeline(d, FaceDetectionMode.FAST) as pipe:
            with pytest.raises(ValueError):
                pipe.submit(np.zeros((1, 2, 3, 4, 5), np.uint8))
            faces = pipe.submit(img[None]).result(timeout=300)
        assert len(faces[0]) == 1

    def test_cancelled_future_does_not_wedge_worker(self):
        """A Future cancelled while queued must be skipped, and the worker
        must keep serving later submissions (round-2 review: set_result on
        a CANCELLED future raised InvalidStateError and killed the worker,
        wedging every subsequent submit)."""
        import time as _time
        from face_detection_tflite_tpu.pipeline.serving import ServingPipeline
        from PIL import Image
        img = np.asarray(Image.open(
            os.path.join(SAMPLES, "landmark-ex1.jpg")).convert("RGB"))
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        with ServingPipeline(d, FaceDetectionMode.FAST, depth=2) as pipe:
            futs = [pipe.submit(img[None]) for _ in range(6)]
            cancelled = [f.cancel() for f in futs[2:5]]
            # Regardless of which cancels won their races, every
            # non-cancelled future must still resolve...
            for f in futs:
                if not f.cancelled():
                    assert len(f.result(timeout=300)[0]) == 1
            # ...and the pipeline must accept and serve new work.
            late = pipe.submit(img[None])
            assert len(late.result(timeout=300)[0]) == 1
        assert any(cancelled) or all(f.done() for f in futs)

    def test_interleaved_submit_result(self):
        """result() on an early future while later submissions continue
        (exercises the in-flight deque ordering)."""
        from face_detection_tflite_tpu.pipeline.serving import ServingPipeline
        from PIL import Image
        img = np.asarray(Image.open(
            os.path.join(SAMPLES, "landmark-ex1.jpg")).convert("RGB"))
        small = img[::2, ::2]
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        with ServingPipeline(d, FaceDetectionMode.FAST, depth=2) as pipe:
            f1 = pipe.submit(img[None])
            f2 = pipe.submit(small[None])
            r1 = f1.result(timeout=300)
            f3 = pipe.submit(np.stack([img, img]))
            r2, r3 = f2.result(timeout=300), f3.result(timeout=300)
        assert [len(x) for x in r1 + r2 + r3] == [1, 1, 1, 1]


class TestImageBucketing:
    def test_bucketed_matches_exact_counts_and_boxes(self):
        """bucket_images pads to the 256 ladder; results must agree with
        exact-size processing to sub-pixel box accuracy."""
        img = _img("landmark-ex1.jpg")  # 853x1280 -> pads to 1024x1280
        h, w = img.shape[:2]
        exact = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                             model_dir=MODELS_DIR)
        bucketed = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                                model_dir=MODELS_DIR, bucket_images=True)
        fe = exact.detect_faces(img, FaceDetectionMode.STANDARD)
        fb = bucketed.detect_faces(img, FaceDetectionMode.STANDARD)
        assert len(fe) == len(fb) == 1
        be, bb = fe[0].bounding_box, fb[0].bounding_box
        err = np.abs(np.asarray([be.xmin, be.ymin, be.xmax, be.ymax])
                     - [bb.xmin, bb.ymin, bb.xmax, bb.ymax]) * [w, h, w, h]
        # The padded frame shifts the detector's letterbox by a different
        # vertical padding; ~1 detector-pixel of translation variance is
        # inherent (1 detector px ~= 5 image px here).
        assert err.max() < 8.0, err
        # pixel-space mesh agrees closely
        mesh_err = np.linalg.norm(
            fe[0].mesh.points[:, :2] - fb[0].mesh.points[:, :2], axis=1)
        assert mesh_err.mean() < 8.0

    def test_bucketed_sizes_share_programs(self):
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR, bucket_images=True)
        rng = np.random.default_rng(0)
        for h, w in [(200, 300), (250, 290), (256, 256), (130, 280)]:
            d.detect_faces(rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
                           FaceDetectionMode.FAST)
        # all four sizes map onto the single (256, 512-) bucket programs
        prog_keys = [k for k in d._programs
                     if isinstance(k, tuple) and len(k) == 3]
        assert len(set(prog_keys)) <= 2  # (256,512) and (256,256) buckets

    def test_width_gate_applies_on_original_size(self):
        img = _img("group-shot-bounding-box-ex1.jpeg")
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, bucket_images=True,
                         min_face_size=0.2)
        assert d.detect_faces(img, FaceDetectionMode.FAST) == []


class TestBatchBucketing:
    def test_padded_batches_match_unbucketed(self):
        """bucket_batches pads the batch dim with zero rows (trimmed on
        device): per-image results must be IDENTICAL to the unbucketed
        run, and odd drain sizes must share one compiled program."""
        img = np.asarray(Image.fromarray(
            _img("landmark-ex1.jpg")).resize((320, 214)))
        on = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                          model_dir=MODELS_DIR, max_faces=8)
        off = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                           model_dir=MODELS_DIR, max_faces=8,
                           bucket_batches=False)
        assert on.bucket_batches and not off.bucket_batches
        for b in (3, 5):
            batch = np.stack([img] * b)
            fa = on.detect_faces_batch(batch, FaceDetectionMode.STANDARD)
            fb = off.detect_faces_batch(batch, FaceDetectionMode.STANDARD)
            assert len(fa) == len(fb) == b
            for la, lb in zip(fa, fb):
                assert len(la) == len(lb) > 0
                for a, c in zip(la, lb):
                    np.testing.assert_array_equal(a.mesh.points,
                                                  c.mesh.points)
        # 3 -> 4 and 5 -> 8: two buckets; unbucketed compiles per size too,
        # but a 4th distinct drain size would add a program only there.
        fa = on.detect_faces_batch(np.stack([img] * 4),
                                   FaceDetectionMode.STANDARD)
        assert len(fa) == 4
        on.dispose(), off.dispose()

    def test_bucket_ladder(self):
        bb = FaceDetector._batch_bucket
        assert [bb(b) for b in (1, 2, 3, 5, 9, 16, 17, 33)] == \
            [1, 2, 4, 8, 16, 16, 32, 48]

    def test_frozen_post_init(self):
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR)
        with pytest.raises(AttributeError):
            d.bucket_batches = False
        d.dispose()


class TestMemoryReport:
    def test_weight_footprint_and_dispose(self):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, with_segmentation=True)
        assert "embedding" not in d.memory_report()  # lazy until used
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            d.embedding_model
        r = d.memory_report()
        # Every loaded network reports a real footprint; the five face
        # models sum to the same ballpark as the reference's documented
        # ~26-40 MB pipeline (README.md:1273) minus interpreter overhead.
        for name in ("detector", "mesh", "iris", "blendshapes",
                     "embedding", "segmentation"):
            assert r[name] > 10_000, name
        assert r["total_weights"] == sum(
            v for k, v in r.items()
            if k not in ("total_weights", "compiled_programs"))
        assert 4_000_000 < r["total_weights"] < 100_000_000
        img = _img("landmark-ex1.jpg")
        d.detect_faces(img, FaceDetectionMode.FAST)
        assert d.memory_report()["compiled_programs"] >= 1
        d.dispose()
        with pytest.raises(RuntimeError):
            d.memory_report()


class TestPrecisionPresets:
    def test_serving_preset_detects(self):
        img = _img("landmark-ex1.jpg")
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, precision="serving")
        faces = d.detect_faces(img, FaceDetectionMode.STANDARD)
        assert len(faces) == 1
        assert "mixed" in d.accelerator_report["precision"]

    def test_per_model_dict(self):
        img = _img("landmark-ex1.jpg")
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR,
                         precision={"detector": "highest"})
        assert len(d.detect_faces(img, FaceDetectionMode.FAST)) == 1


class TestBytesBatch:
    def test_detect_from_bytes_batch_mixed_sizes(self):
        from PIL import Image
        import io
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        data1 = open(os.path.join(SAMPLES, "landmark-ex1.jpg"), "rb").read()
        # second image at a different size -> exercises per-size sub-batching
        img2 = Image.open(io.BytesIO(data1)).resize((640, 427))
        buf = io.BytesIO()
        img2.save(buf, "JPEG", quality=90)
        results = d.detect_faces_from_bytes_batch(
            [data1, buf.getvalue(), data1], FaceDetectionMode.FAST)
        assert [len(r) for r in results] == [1, 1, 1]
        # same-size entries batched together must agree exactly
        assert results[0][0].bounding_box == results[2][0].bounding_box


def test_warmup_precompiles():
    d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                     model_dir=MODELS_DIR)
    d.warmup((96, 128), modes=[FaceDetectionMode.FAST])
    keys = [k for k in d._programs if isinstance(k, tuple) and len(k) == 4]
    assert any(k[:2] == (96, 128) for k in keys)


class TestReviewRegressions:
    def test_empty_batch_adaptive(self):
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR)
        assert d.detect_faces_batch(
            np.zeros((0, 64, 64, 3), np.uint8), FaceDetectionMode.FULL) == []

    def test_combined_call_is_tracked(self):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         enable_tracking=True, with_segmentation=True,
                         model_dir=MODELS_DIR)
        img = _img("landmark-ex1.jpg")
        f1, _ = d.detect_faces_with_segmentation(img)
        f2, _ = d.detect_faces_with_segmentation(img)
        assert f1[0].tracking_id == f2[0].tracking_id == 1

    def test_combined_call_accepts_rgba(self):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         with_segmentation=True, model_dir=MODELS_DIR)
        img = _img("landmark-ex1.jpg")
        rgba = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
        faces, mask = d.detect_faces_with_segmentation(rgba)
        assert len(faces) == 1 and mask.data.shape == (256, 256)

    def test_reset_tracking_discards_inflight_update(self):
        """A frame whose detection started before reset_tracking() must
        not register tracks in the new generation."""
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         enable_tracking=True, model_dir=MODELS_DIR)
        img = _img("landmark-ex1.jpg")
        d.detect_faces(img, FaceDetectionMode.FAST)  # gen 0, track 1
        gen_before = d._tracking_generation
        faces = d.detect_faces_batch(img[None], FaceDetectionMode.FAST)[0]
        d.reset_tracking()
        stale = d._attach_tracking(faces, gen_before)
        assert all(f.tracking_id is None for f in stale)
        assert d._tracker.active_track_count == 0  # tracker untouched

    def test_warmup_compiles_face_stage_adaptive(self):
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR)
        d.warmup((96, 128), modes=[FaceDetectionMode.STANDARD])
        stage_keys = [k for k in d._programs
                      if isinstance(k, tuple) and len(k) == 4
                      and k[-1] == "stage"]
        assert any(k[:2] == (96, 128) for k in stage_keys)

    def test_bytes_batch_bucketed_single_call(self):
        """Mixed sizes sharing a bucket dispatch as one device batch."""
        from PIL import Image
        import io
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR, bucket_images=True)
        base = Image.open(os.path.join(SAMPLES, "landmark-ex1.jpg"))
        datas = []
        for size in ((500, 333), (480, 320)):  # both bucket to (512, 512)
            buf = io.BytesIO()
            base.resize(size).save(buf, "JPEG", quality=90)
            datas.append(buf.getvalue())
        results = d.detect_faces_from_bytes_batch(datas,
                                                  FaceDetectionMode.FAST)
        assert [len(r) for r in results] == [1, 1]
        # boxes are normalized to each ORIGINAL image -> roughly equal
        b0, b1 = results[0][0].bounding_box, results[1][0].bounding_box
        assert abs(b0.xmin - b1.xmin) < 0.03
        assert abs(b0.ymax - b1.ymax) < 0.03


class TestBytesBatchPredispatch:
    def test_mixed_buckets_match_per_image_calls(self):
        """Multi-bucket byte batches (predispatched detect) must produce
        the same faces as one-image-at-a-time calls."""
        from PIL import Image
        import io
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        data1 = open(os.path.join(SAMPLES, "landmark-ex1.jpg"), "rb").read()
        img2 = Image.open(io.BytesIO(data1)).resize((640, 427))
        buf = io.BytesIO()
        img2.save(buf, "JPEG", quality=90)
        datas = [data1, buf.getvalue()]
        batched = d.detect_faces_from_bytes_batch(datas,
                                                  FaceDetectionMode.FULL)
        singles = [d.detect_faces_from_bytes(b, FaceDetectionMode.FULL)
                   for b in datas]
        assert [len(r) for r in batched] == [len(r) for r in singles]
        for bf, sf in zip(batched, singles):
            np.testing.assert_allclose(bf[0].mesh.points, sf[0].mesh.points,
                                       atol=1e-3)
            assert bf[0].bounding_box == sf[0].bounding_box

    def test_mixed_sizes_offladder_overflow(self):
        """Regression (ADVICE r4 high): 3 multi-face JPEGs at one size +
        1 at another, adaptive + bucket_batches defaults, FULL mode.
        The off-ladder group of 3 batch-bucket-pads to 4; the
        speculative pre-dispatch must run on that SAME padded batch —
        it previously dispatched the raw group, so on face-count
        overflow _finish_speculative paired padded images (batch 4)
        with an unpadded det slab (batch 3) and jax.vmap raised
        'inconsistent sizes for array axes to be mapped'."""
        from PIL import Image
        import io
        group = Image.open(os.path.join(
            SAMPLES, "group-shot-bounding-box-ex1.jpeg")).convert("RGB")

        def jpg(im):
            b = io.BytesIO()
            im.save(b, "JPEG", quality=92)
            return b.getvalue()

        w, h = group.size
        small = jpg(group.resize((w // 4, h // 4)))
        other = jpg(group.resize((w // 5, h // 5)))
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        assert d.adaptive and d.bucket_batches  # the regression's defaults
        res = d.detect_faces_from_bytes_batch(
            [small, small, small, other], FaceDetectionMode.FULL)
        assert len(res) == 4
        # The group shot keeps several faces at quarter scale, so the
        # 1-slot speculative bucket genuinely overflowed (re-run path).
        assert all(len(r) >= 2 for r in res)
        # Same-size entries rode one padded batch -> identical results.
        assert res[0][0].bounding_box == res[1][0].bounding_box
        d.dispose()

    def test_speculative_pad_rows_trimmed_on_device(self):
        """ADVICE r4 low: with real_b, batch-bucket pad rows are sliced
        off ON DEVICE — they never enter the packed readback buffer."""
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        img = _img("landmark-ex1.jpg")
        images, b, _ = d._prepare_batch(np.stack([img] * 3))  # pads to 4
        assert images.shape[0] == 4 and b == 3
        _, _, (buf, _, _, _), _, rb = d._dispatch_speculative(
            images, FaceDetectionMode.STANDARD, real_b=b)
        assert rb == 3 and buf.shape[0] == 3
        d.dispose()

    def test_mixed_buckets_with_bucketing_enabled(self):
        """Predispatch composes with the bucket ladder: padded bucket
        batches still match per-image calls."""
        from PIL import Image
        import io
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, bucket_images=True)
        base = Image.open(os.path.join(SAMPLES, "landmark-ex1.jpg"))
        datas = []
        for size in ((500, 333), (900, 600)):  # buckets (512,512), (1024,768)
            buf = io.BytesIO()
            base.resize(size).save(buf, "JPEG", quality=90)
            datas.append(buf.getvalue())
        batched = d.detect_faces_from_bytes_batch(datas,
                                                  FaceDetectionMode.STANDARD)
        singles = [d.detect_faces_from_bytes(b, FaceDetectionMode.STANDARD)
                   for b in datas]
        assert [len(r) for r in batched] == [len(r) for r in singles] == [1, 1]
        for bf, sf in zip(batched, singles):
            np.testing.assert_allclose(bf[0].mesh.points, sf[0].mesh.points,
                                       atol=1e-3)


class TestMatBytesAndFrameMask:
    def test_packed_bytes_matches_array_path(self):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        img = _img("landmark-ex1.jpg")
        h, w, _ = img.shape
        bgr = img[..., ::-1].tobytes()
        via_bytes = d.detect_faces_from_packed_bytes(
            bgr, width=w, height=h, mode=FaceDetectionMode.FAST)
        via_array = d.detect_faces(img, FaceDetectionMode.FAST)
        assert len(via_bytes) == len(via_array) == 1
        assert via_bytes[0].bounding_box == via_array[0].bounding_box

    def test_packed_bytes_bgra(self):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        img = _img("landmark-ex1.jpg")
        h, w, _ = img.shape
        bgra = np.dstack([img[..., ::-1],
                          np.full((h, w), 255, np.uint8)]).tobytes()
        faces = d.detect_faces_from_packed_bytes(
            bgra, width=w, height=h, channels=4, channel_order="bgra",
            mode=FaceDetectionMode.FAST)
        assert len(faces) == 1

    def test_serving_lazy_load_honors_ctor_segmentation_model(self):
        """ServingPipeline(with_segmentation=True) must load the
        detector's configured model, not hard-code GENERAL."""
        from face_detection_tflite_tpu import (SegmentationModel,
                                               ServingPipeline)
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR,
                         segmentation_model=SegmentationModel.LANDSCAPE)
        with ServingPipeline(d, FaceDetectionMode.FAST,
                             with_segmentation=True):
            assert d._segmentation.in_h == 144
        d.dispose()

    def test_embed_in_full_is_constructor_only(self):
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR)
        assert d.embed_in_full is False
        with pytest.raises(AttributeError):
            d.embed_in_full = True
        d.dispose()

    def test_program_baked_attributes_frozen(self):
        """Attributes baked into compiled programs reject mutation — a
        post-construction flip would desync cached programs from new
        image sizes (the reference's equivalents are final fields)."""
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR, max_faces=4)
        for name, val in [("max_faces", 8), ("min_score", 0.1),
                          ("min_face_size", 0.2), ("num_candidates", 64),
                          ("use_pallas_nms", True),
                          ("bucket_images", True)]:
            with pytest.raises(AttributeError, match="fixed at"):
                setattr(d, name, val)
        d.detailed_timings = True  # host-only knobs stay mutable
        d.dispose()

    def test_lazy_load_honors_ctor_segmentation_model(self):
        """A detector built with segmentation_model=LANDSCAPE but
        with_segmentation=False must still load LANDSCAPE (not GENERAL)
        when the first mask call triggers the lazy load."""
        from face_detection_tflite_tpu import SegmentationModel
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR,
                         segmentation_model=SegmentationModel.LANDSCAPE)
        assert d._segmentation is None
        d.get_segmentation_mask(np.full((256, 256, 3), 128, np.uint8))
        assert d._segmentation.in_h == 144  # landscape model is 144x256
        d.dispose()

    def test_initialize_segmentation_eager_and_idempotent(self):
        """`initializeSegmentation` analog (face_detector.dart:434-462):
        eager post-create load, config honored, idempotent after load."""
        from face_detection_tflite_tpu import (SegmentationConfig,
                                               SegmentationModel)
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR)
        assert not d.is_segmentation_ready
        d.initialize_segmentation(
            SegmentationConfig(model=SegmentationModel.LANDSCAPE,
                               mask_dtype="uint8"))
        assert d.is_segmentation_ready
        assert d._segmentation.in_h == 144  # landscape model is 144x256
        first = d._segmentation
        # Second call is a no-op like the reference's
        # `if (_segmentationInitialized) return` — but a CONFLICTING
        # config warns instead of being silently ignored.
        with pytest.warns(UserWarning, match="already.*loaded"):
            d.initialize_segmentation(SegmentationConfig.safe())
        assert d._segmentation is first
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # same/absent config: no warning
            d.initialize_segmentation()
        d.dispose()
        assert not d.is_segmentation_ready

    def test_initialize_segmentation_failure_does_not_poison(self):
        """A failed eager load (missing multiclass file) must not commit
        its model choice: the next lazy load still uses the constructor's
        working model."""
        from face_detection_tflite_tpu import (SegmentationConfig,
                                               SegmentationModel)
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR)
        multiclass_path = os.path.join(MODELS_DIR,
                                       "selfie_multiclass.tflite")
        if os.path.exists(multiclass_path):
            pytest.skip("multiclass model present; failure path not "
                        "reproducible")
        with pytest.raises(FileNotFoundError):
            d.initialize_segmentation(
                SegmentationConfig(model=SegmentationModel.MULTICLASS))
        assert not d.is_segmentation_ready
        # Lazy load still works with the constructor's GENERAL model.
        m = d.get_segmentation_mask(np.full((256, 256, 3), 128, np.uint8))
        assert m.data.shape == (256, 256)
        d.dispose()

    def test_ready_properties(self):
        """isReady / isEmbeddingReady / isSegmentationReady
        (face_detector.dart:210-218)."""
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR, with_segmentation=True)
        assert d.is_ready and d.is_embedding_ready
        assert d.is_segmentation_ready
        d.dispose()
        assert not d.is_ready and not d.is_embedding_ready

    def test_embedding_from_packed_bytes(self):
        """getFaceEmbeddingFromMatBytes analog (face_detector.dart:735):
        same vector as the array path, same buffer validation."""
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        img = _img("landmark-ex1.jpg")
        h, w, _ = img.shape
        (face,) = d.detect_faces(img)
        via_bytes = d.get_face_embedding_from_packed_bytes(
            face, img[..., ::-1].tobytes(), width=w, height=h)
        via_array = d.get_face_embedding(face, img)
        np.testing.assert_allclose(via_bytes, via_array, atol=1e-6)
        with pytest.raises(ValueError, match="needs"):
            d.get_face_embedding_from_packed_bytes(
                face, b"\x00" * 10, width=w, height=h)

    def test_packed_bytes_size_mismatch(self):
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR)
        with pytest.raises(ValueError, match="needs"):
            d.detect_faces_from_packed_bytes(b"\x00" * 10, width=4, height=4)
        with pytest.raises(ValueError, match="channel_order"):
            d.detect_faces_from_packed_bytes(
                b"\x00" * 48, width=4, height=4, channel_order="bgra")

    def test_segmentation_from_camera_frame(self):
        from face_detection_tflite_tpu.utils.camera import (CameraFormat,
                                                            CameraFrame)
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR, with_segmentation=True)
        img = _img("landmark-ex1.jpg")[:64, :64]
        frame = CameraFrame(data=np.dstack(
            [img, np.full(img.shape[:2], 255, np.uint8)]).tobytes(),
            width=64, height=64, format=CameraFormat.RGBA)
        mask = d.get_segmentation_mask_from_camera_frame(frame)
        assert mask.data.shape == (256, 256)


def test_split_meshes_if_concatenated():
    from face_detection_tflite_tpu import split_meshes_if_concatenated
    assert split_meshes_if_concatenated(np.zeros((0, 3))) == []
    two = np.arange(2 * 468 * 3, dtype=np.float32).reshape(-1, 3)
    parts = split_meshes_if_concatenated(two)
    assert len(parts) == 2 and parts[0].shape == (468, 3)
    assert np.array_equal(parts[1], two[468:])
    odd = np.zeros((500, 3))
    assert [p.shape for p in split_meshes_if_concatenated(odd)] == [(500, 3)]


class TestBatchStream:
    def test_stream_matches_batch_calls(self):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        img = _img("landmark-ex1.jpg")
        batches = [img[None], np.stack([img, img]), img[None]]
        streamed = list(d.detect_faces_batch_stream(
            iter(batches), FaceDetectionMode.STANDARD, depth=2))
        direct = [d.detect_faces_batch(b, FaceDetectionMode.STANDARD)
                  for b in batches]
        assert [[len(f) for f in r] for r in streamed] == \
               [[len(f) for f in r] for r in direct] == [[1], [1, 1], [1]]
        for rs, rd in zip(streamed, direct):
            for fs, fd in zip(rs, rd):
                np.testing.assert_allclose(fs[0].mesh.points,
                                           fd[0].mesh.points, atol=1e-3)

    def test_stream_empty_and_mixed_shapes(self):
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR)
        img = _img("landmark-ex1.jpg")
        small = img[::4, ::4]
        batches = [np.zeros((0, 64, 64, 3), np.uint8), img[None],
                   small[None]]
        out = list(d.detect_faces_batch_stream(batches,
                                               FaceDetectionMode.FAST))
        assert out[0] == []
        assert len(out[1][0]) == 1 and len(out[2][0]) == 1

    def test_stream_empty_batch_keeps_order(self):
        """An empty batch mid-stream must yield [] at ITS position, not
        jump ahead of batches still in the pipeline (depth > 1)."""
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR)
        img = _img("landmark-ex1.jpg")
        batches = [img[None], np.stack([img, img]),
                   np.zeros((0, 32, 32, 3), np.uint8), img[None]]
        out = list(d.detect_faces_batch_stream(batches,
                                               FaceDetectionMode.FAST,
                                               depth=3))
        assert [[len(f) for f in r] for r in out] == [[1], [1, 1], [], [1]]

    def test_stream_depth_validation(self):
        d = FaceDetector(model=FaceDetectionModel.SHORT_RANGE,
                         model_dir=MODELS_DIR)
        with pytest.raises(ValueError, match="depth"):
            list(d.detect_faces_batch_stream([], depth=0))


class TestSplitMeshes:
    """`splitMeshesIfConcatenated` (face_detector.dart:1047-1056)."""

    def test_multiple_of_468_splits(self):
        pts = np.arange(936 * 3, dtype=np.float32).reshape(936, 3)
        out = FaceDetector.split_meshes_if_concatenated(pts)
        assert len(out) == 2
        np.testing.assert_array_equal(out[0], pts[:468])
        np.testing.assert_array_equal(out[1], pts[468:])

    def test_non_multiple_returns_wrapped(self):
        pts = np.zeros((469, 3), np.float32)
        out = FaceDetector.split_meshes_if_concatenated(pts)
        assert len(out) == 1 and out[0] is pts

    def test_empty_returns_empty(self):
        assert FaceDetector.split_meshes_if_concatenated([]) == []


class TestCostReport:
    """XLA cost analysis of the fused programs (SURVEY §5 observability:
    'jax.profiler traces + XLA cost analysis')."""

    def test_flops_scale_with_mode_and_batch(self):
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR)
        fast = d.cost_report((128, 128), FaceDetectionMode.FAST)
        std = d.cost_report((128, 128), FaceDetectionMode.STANDARD)
        full = d.cost_report((128, 128), FaceDetectionMode.FULL)
        # Deeper pipelines strictly cost more FLOPs.
        assert 0 < fast["flops"] < std["flops"] < full["flops"]
        # Static analysis is per-program: 2x batch ~ 2x flops (exactly,
        # for these batch-parallel programs).
        std2 = d.cost_report((128, 128), FaceDetectionMode.STANDARD,
                             batch_size=2)
        assert std2["flops"] == pytest.approx(2 * std["flops"], rel=0.01)
        assert std2["flops_per_image"] == pytest.approx(std["flops"],
                                                        rel=0.01)
        assert std["bytes_accessed"] > 0
        assert std["memory"] is None or std["memory"]["temp_bytes"] > 0
        d.dispose()
        with pytest.raises(RuntimeError):
            d.cost_report((128, 128))
