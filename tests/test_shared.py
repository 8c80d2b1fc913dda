"""Unit tests for the shared pure-math layer: geometry, gates, tracker,
blendshape packing, types.  Ports the reference's host unit-test tier
(`test/face_geometry_test.dart`, `face_gates_test.dart`,
`face_tracking_test.dart`, `blendshapes_input_test.dart`, ...).
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from face_detection_tflite_tpu.pipeline import geometry
from face_detection_tflite_tpu.pipeline.blendshape_input import (
    BLENDSHAPE_LANDMARK_SUBSET, BLENDSHAPE_NAMES, EYE_REFINE_OFFSETS,
    pack_blendshape_input, pack_indices)
from face_detection_tflite_tpu.pipeline.gates import (
    apply_detection_gates_mask, box_visible_width_fraction,
    validate_face_gates)
from face_detection_tflite_tpu.pipeline.tracker import (
    TemporalFaceTracker, validate_tracking_config)
from face_detection_tflite_tpu.pipeline.types import (
    FACE_CONTOUR_MESH_INDICES, Blendshape, Detection, Eye, Face,
    FaceContourType, FaceMesh, RectF)


class TestGeometry:
    def _kp(self, le, re, mouth):
        kp = np.zeros((6, 2), np.float32)
        kp[0], kp[1], kp[3] = le, re, mouth
        return jnp.asarray(kp)[None]

    def test_alignment_level_eyes(self):
        """Eyes level, mouth below center: theta 0, size from max rule."""
        kp = self._kp((0.4, 0.4), (0.6, 0.4), (0.5, 0.6))
        theta, cx, cy, size = geometry.compute_face_alignment(kp, 100, 100)
        assert float(theta[0]) == pytest.approx(0.0)
        eye_dist, mouth_dist = 20.0, 20.0
        assert float(size[0]) == pytest.approx(
            max(mouth_dist * 3.6, eye_dist * 4.0))
        assert float(cx[0]) == pytest.approx(50.0)
        assert float(cy[0]) == pytest.approx(40.0 + 20.0 * 0.1)

    def test_alignment_rotated(self):
        kp = self._kp((0.4, 0.5), (0.4 + 0.1, 0.5 + 0.1), (0.5, 0.7))
        theta, *_ = geometry.compute_face_alignment(kp, 100, 100)
        assert float(theta[0]) == pytest.approx(math.pi / 4)

    def test_mesh_transform_roundtrip(self):
        """transform(0.5, 0.5) == center; corners map via R(theta)."""
        lm = jnp.asarray([[[0.5, 0.5, 0.0], [1.0, 0.5, 0.1]]])
        out = np.asarray(geometry.transform_mesh_to_absolute(
            lm, jnp.asarray([10.0]), jnp.asarray([20.0]),
            jnp.asarray([100.0]), jnp.asarray([0.0])))[0]
        assert np.allclose(out[0], [10, 20, 0])
        assert np.allclose(out[1], [60, 20, 10])  # +0.5*size in x; z*size

    def test_head_pose_frontal(self):
        """A synthetic frontal face: all angles ~0."""
        mesh = np.zeros((468, 3), np.float32)
        mesh[geometry.MESH_FOREHEAD_TOP] = [50, 20, 0]
        mesh[geometry.MESH_CHIN_BOTTOM] = [50, 80, 0]
        mesh[geometry.MESH_LEFT_CHEEK] = [20, 50, 0]
        mesh[geometry.MESH_RIGHT_CHEEK] = [80, 50, 0]
        a = np.asarray(geometry.head_euler_angles_from_mesh(
            jnp.asarray(mesh)[None]))[0]
        assert np.allclose(a, 0.0, atol=1e-5)

    def test_head_pose_yaw(self):
        """Image-right cheek closer to camera (smaller z) = face turned
        toward image left -> negative yaw (ML Kit sign: positive is toward
        the image right)."""
        mesh = np.zeros((468, 3), np.float32)
        mesh[geometry.MESH_FOREHEAD_TOP] = [50, 20, 0]
        mesh[geometry.MESH_CHIN_BOTTOM] = [50, 80, 0]
        mesh[geometry.MESH_LEFT_CHEEK] = [20, 50, 10]
        mesh[geometry.MESH_RIGHT_CHEEK] = [80, 50, -10]
        a = np.asarray(geometry.head_euler_angles_from_mesh(
            jnp.asarray(mesh)[None]))[0]
        assert a[1] < -5.0
        assert abs(a[0]) < 1e-4 and abs(a[2]) < 1e-4

    @pytest.mark.parametrize("axis,angle,expected", [
        # head_pose_test.dart:75-113: rotX(-a)=looking up -> pitch +a;
        # rotY(-a)=toward image-right -> yaw +a; rotZ(-a)=CCW -> roll +a.
        ("x", -25, (25, 0, 0)), ("x", 25, (-25, 0, 0)),
        ("y", -25, (0, 25, 0)), ("y", 25, (0, -25, 0)),
        ("z", -25, (0, 0, 25)), ("z", 25, (0, 0, -25)),
        ("z", 0, (0, 0, 0)),
    ])
    def test_head_pose_rotations_match_reference(self, axis, angle, expected):
        """Port of the reference's rotation-matrix head-pose tests."""
        a = math.radians(angle)
        c, s = math.cos(a), math.sin(a)
        rot = {
            "x": np.asarray([[1, 0, 0], [0, c, -s], [0, s, c]]),
            "y": np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]]),
            "z": np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]]),
        }[axis]
        mesh = np.zeros((468, 3))
        mesh[10] = [0, -100, 0]
        mesh[152] = [0, 100, 0]
        mesh[234] = [-100, 0, 0]
        mesh[454] = [100, 0, 0]
        mesh = mesh @ rot.T + [320, 240, 0]
        out = np.asarray(geometry.head_euler_angles_from_mesh(
            jnp.asarray(mesh, jnp.float32)[None]))[0]
        assert np.allclose(out, expected, atol=0.5), (out, expected)

    def test_roll_from_eyes(self):
        r = float(geometry.roll_from_eyes(jnp.asarray([0.0, 10.0]),
                                          jnp.asarray([10.0, 0.0])))
        assert r == pytest.approx(45.0)  # CCW tilt positive

    def test_eye_rois_from_mesh(self):
        mesh = np.zeros((468, 3), np.float32)
        mesh[33] = [10, 50, 0]
        mesh[133] = [30, 50, 0]
        mesh[362] = [60, 50, 0]
        mesh[263] = [80, 50, 0]
        cx, cy, size, theta = geometry.eye_rois_from_mesh(
            jnp.asarray(mesh)[None])
        assert float(cx[0, 0]) == pytest.approx(20.0)
        assert float(size[0, 0]) == pytest.approx(20.0 * 2.3)
        assert float(theta[0, 0]) == pytest.approx(0.0)
        assert float(cx[0, 1]) == pytest.approx(70.0)

    def test_face_detection_to_roi(self):
        roi = np.asarray(geometry.face_detection_to_roi(
            jnp.asarray([0.4, 0.4, 0.6, 0.6])))
        # expand 0.6: w = 0.2*1.6 = 0.32 square
        assert roi[2] - roi[0] == pytest.approx(0.32, abs=1e-6)
        assert roi[3] - roi[1] == pytest.approx(0.32, abs=1e-6)

    def test_iris_center_from_points(self):
        pts = jnp.asarray([[[0, 0, 0], [10, 0, 0], [5, 4.9, 0],
                            [0, 10, 0], [10, 10, 0]]], jnp.float32)
        c = np.asarray(geometry.iris_center_from_points(pts))[0]
        assert np.allclose(c, [5, 4.9, 0])  # nearest to centroid (5,4.98)

    def test_iris_transform_right_eye_flip(self):
        lm = jnp.asarray([[[0.2, 0.5, 1.0]]])
        out_l = np.asarray(geometry.transform_iris_norm_to_absolute(
            lm, jnp.asarray([50.0]), jnp.asarray([50.0]),
            jnp.asarray([20.0]), jnp.asarray([0.0]), False))[0, 0]
        out_r = np.asarray(geometry.transform_iris_norm_to_absolute(
            lm, jnp.asarray([50.0]), jnp.asarray([50.0]),
            jnp.asarray([20.0]), jnp.asarray([0.0]), True))[0, 0]
        assert out_l[0] == pytest.approx(50 + (0.2 - 0.5) * 20)
        assert out_r[0] == pytest.approx(50 + (0.8 - 0.5) * 20)
        assert out_l[2] == 1.0  # z untouched


class TestGates:
    def test_validate_rejects_out_of_range(self):
        with pytest.raises(ValueError):
            validate_face_gates(-0.1, 0.0)
        with pytest.raises(ValueError):
            validate_face_gates(0.0, 1.5)
        with pytest.raises(ValueError):
            validate_face_gates(float("nan"), 0.0)
        validate_face_gates(0.0, 0.0, 1.0)  # boundaries ok

    def test_width_fraction_clipping(self):
        # box half outside: visible width clipped to image
        box = jnp.asarray([-0.25, 0.0, 0.25, 1.0])
        assert float(box_visible_width_fraction(box, 100.0)) == \
            pytest.approx(0.25)
        # fully outside
        box = jnp.asarray([1.2, 0.0, 1.5, 1.0])
        assert float(box_visible_width_fraction(box, 100.0)) == 0.0

    def test_detection_gates_mask(self):
        valid = jnp.asarray([True, True, True])
        scores = jnp.asarray([0.9, 0.4, 0.6])
        boxes = jnp.asarray([[0.1, 0.1, 0.5, 0.5],
                             [0.1, 0.1, 0.9, 0.9],
                             [0.1, 0.1, 0.12, 0.5]])
        out = np.asarray(apply_detection_gates_mask(
            valid, scores, boxes, min_score=0.5, min_face_size=0.1,
            image_width=100.0))
        assert list(out) == [True, False, False]

    def test_noop_gates_return_unchanged(self):
        valid = jnp.asarray([True, False])
        out = apply_detection_gates_mask(
            valid, jnp.asarray([0.1, 0.9]), jnp.zeros((2, 4)),
            min_score=0.0, min_face_size=0.0, image_width=100.0)
        assert out is valid


class TestTracker:
    def _box(self, x, y, s=0.2):
        return [x, y, x + s, y + s]

    def test_stable_ids_across_frames(self):
        t = TemporalFaceTracker()
        ids1 = t.update([self._box(0.1, 0.1), self._box(0.6, 0.6)])
        ids2 = t.update([self._box(0.11, 0.11), self._box(0.61, 0.61)])
        assert ids1 == ids2 == [1, 2]

    def test_retirement_after_missed_frames(self):
        t = TemporalFaceTracker(max_missed_frames=1)
        assert t.update([self._box(0.1, 0.1)]) == [1]
        t.update([])
        t.update([])  # missed twice > 1 -> retired
        assert t.update([self._box(0.1, 0.1)]) == [2]

    def test_reappearance_within_budget_keeps_id(self):
        t = TemporalFaceTracker(max_missed_frames=3)
        assert t.update([self._box(0.1, 0.1)]) == [1]
        t.update([])
        assert t.update([self._box(0.1, 0.1)]) == [1]

    def test_velocity_prediction(self):
        t = TemporalFaceTracker()
        t.update([self._box(0.1, 0.1)])
        t.update([self._box(0.15, 0.1)])
        t.update([self._box(0.2, 0.1)])
        # moving right; next frame at 0.25 should match the same track
        assert t.update([self._box(0.25, 0.1)]) == [1]

    def test_scale_dissimilarity_rejected(self):
        t = TemporalFaceTracker()
        t.update([[0.1, 0.1, 0.2, 0.2]])       # small box
        ids = t.update([[0.0, 0.0, 0.9, 0.9]])  # 81x the area
        assert ids == [2]

    def test_global_score_ordering(self):
        """Better IoU wins the track regardless of detection order."""
        t = TemporalFaceTracker()
        t.update([self._box(0.5, 0.5)])
        ids = t.update([self._box(0.8, 0.8), self._box(0.5, 0.5)])
        assert ids[1] == 1 and ids[0] == 2

    def test_reset(self):
        t = TemporalFaceTracker()
        t.update([self._box(0.1, 0.1)])
        t.reset()
        assert t.update([self._box(0.1, 0.1)]) == [1]
        assert t.active_track_count == 1

    def test_validate(self):
        with pytest.raises(ValueError):
            validate_tracking_config(-1)


class TestBlendshapePacking:
    def test_subset_is_strictly_increasing_unique(self):
        s = BLENDSHAPE_LANDMARK_SUBSET
        assert len(s) == 146
        assert (np.diff(s) > 0).all()
        assert list(s[-10:]) == list(range(468, 478))

    def test_names(self):
        assert BLENDSHAPE_NAMES[0] == "_neutral"
        assert len(BLENDSHAPE_NAMES) == 52
        assert "tongueOut" not in BLENDSHAPE_NAMES
        assert Blendshape.eyeBlinkLeft.value == 9

    def test_routing(self):
        src, idx = pack_indices()
        # iris slots route to iris stream offsets 71..75 / 147..151
        assert list(idx[-10:]) == [71, 72, 73, 74, 75, 147, 148, 149, 150, 151]
        assert src[-10:].all()
        # eyelid refinement: mesh index 33 (subset position 12) -> iris[0]
        pos33 = list(BLENDSHAPE_LANDMARK_SUBSET).index(33)
        assert src[pos33] == 1 and idx[pos33] == 0
        # mesh index 263 -> iris[76]
        pos263 = list(BLENDSHAPE_LANDMARK_SUBSET).index(263)
        assert src[pos263] == 1 and idx[pos263] == 76
        # a non-eye mesh point stays mesh-sourced
        pos0 = list(BLENDSHAPE_LANDMARK_SUBSET).index(0)
        assert src[pos0] == 0 and idx[pos0] == 0
        # exactly 30 eyelid reroutes + 10 iris slots come from iris
        assert src.sum() == 40
        assert len(EYE_REFINE_OFFSETS) == 30

    def test_pack_values(self):
        mesh = np.arange(468 * 3, dtype=np.float32).reshape(468, 3)
        iris = -np.arange(152 * 3, dtype=np.float32).reshape(152, 3)
        out = np.asarray(pack_blendshape_input(jnp.asarray(mesh)[None],
                                               jnp.asarray(iris)[None]))[0]
        assert out.shape == (146, 2)
        # slot for mesh point 1 (subset position 1)
        assert np.allclose(out[1], mesh[1, :2])
        # last slot = iris[151]
        assert np.allclose(out[145], iris[151, :2])
        # refined eyelid point 33 = iris[0]
        pos33 = list(BLENDSHAPE_LANDMARK_SUBSET).index(33)
        assert np.allclose(out[pos33], iris[0, :2])


class TestTypes:
    def test_contour_tables(self):
        assert len(FACE_CONTOUR_MESH_INDICES[FaceContourType.FACE]) == 36
        assert len(FACE_CONTOUR_MESH_INDICES[FaceContourType.LEFT_EYE]) == 16
        for idxs in FACE_CONTOUR_MESH_INDICES.values():
            assert all(0 <= i < 468 for i in idxs)

    def test_rectf(self):
        r = RectF(0.2, 0.3, 0.6, 0.5)
        assert r.w == pytest.approx(0.4)
        e = r.expand(0.5)
        assert e.w == pytest.approx(0.6)
        assert (e.xmin + e.xmax) / 2 == pytest.approx(0.4)

    def test_eye_from_points(self):
        pts = np.zeros((76, 3))
        pts[71:76, 0] = [0, 10, 5, 0, 10]
        pts[71:76, 1] = [0, 0, 5, 10, 10]
        eye = Eye.from_points(pts)
        assert eye.mesh.shape == (71, 3)
        assert np.allclose(eye.iris_center, [5, 5, 0])
        assert eye.iris_contour.shape == (4, 3)
        assert eye.contour.shape == (15, 3)

    def test_face_fast_mode_fallback_roll(self):
        kp = np.zeros((6, 2))
        kp[0] = [0.4, 0.5]
        kp[1] = [0.6, 0.4]  # right eye higher -> CCW tilt -> positive roll
        det = Detection(RectF(0.3, 0.3, 0.7, 0.7), 0.9, kp)
        face = Face(det, mesh=None, irises=np.zeros((0, 3)),
                    original_size=(100, 100))
        a = face.head_euler_angles
        assert a.x == 0.0 and a.y == 0.0 and a.z > 0
        assert face.eyes is None
        assert face.blendshapes is None
        assert face.smiling_probability is None

    def test_face_width_fraction(self):
        det = Detection(RectF(-0.25, 0.0, 0.25, 1.0), 0.9, np.zeros((6, 2)))
        face = Face(det, None, np.zeros((0, 3)), (100, 100))
        assert face.width_fraction == pytest.approx(0.25)

    def test_probability_getters(self):
        det = Detection(RectF(0.1, 0.1, 0.9, 0.9), 0.9, np.zeros((6, 2)))
        scores = np.zeros(52, np.float32)
        scores[Blendshape.mouthSmileLeft.value] = 0.8
        scores[Blendshape.mouthSmileRight.value] = 0.6
        scores[Blendshape.eyeBlinkLeft.value] = 0.3
        face = Face(det, None, np.zeros((0, 3)), (100, 100),
                    blendshape_scores=scores)
        assert face.smiling_probability == pytest.approx(0.7)
        assert face.left_eye_open_probability == pytest.approx(0.7)
        assert face.right_eye_open_probability == pytest.approx(1.0)

    def test_blendshape_string_indexing(self):
        """`face.blendshapes["jawOpen"]` — the docs/API.md-advertised string
        form must match enum and int indexing (regression: __getitem__ only
        handled enum/int)."""
        det = Detection(RectF(0.1, 0.1, 0.9, 0.9), 0.9, np.zeros((6, 2)))
        scores = np.zeros(52, np.float32)
        scores[Blendshape.jawOpen.value] = 0.42
        face = Face(det, None, np.zeros((0, 3)), (100, 100),
                    blendshape_scores=scores)
        bs = face.blendshapes
        assert bs["jawOpen"] == pytest.approx(0.42)
        assert bs[Blendshape.jawOpen] == bs["jawOpen"] == bs[
            Blendshape.jawOpen.value]
        with pytest.raises(ValueError):
            bs["notABlendshape"]

    def test_tracking_id_attach(self):
        det = Detection(RectF(0.1, 0.1, 0.9, 0.9), 0.9, np.zeros((6, 2)))
        face = Face(det, None, np.zeros((0, 3)), (100, 100))
        f2 = face.with_tracking_id(7)
        assert f2.tracking_id == 7 and face.tracking_id is None


class TestFastModeDegenerateDrop:
    def test_degenerate_alignment_dropped_in_fast_mode(self):
        """Coincident eye/mouth keypoints -> alignment size rounds to 0 ->
        detection dropped even in fast mode (face_detector_core.dart:258)."""
        import os
        from .asset_paths import MODELS_DIR
        if not os.path.isdir(MODELS_DIR):
            pytest.skip("no assets")
        from face_detection_tflite_tpu.convert.executor import convert_file
        from face_detection_tflite_tpu.pipeline.config import (
            FaceDetectionMode)
        from face_detection_tflite_tpu.pipeline.programs import (
            PipelineModels, build_pipeline_program)

        models = PipelineModels(
            detector=convert_file(os.path.join(
                MODELS_DIR, "face_detection_short_range.tflite")),
            variant="short")
        prog = build_pipeline_program(
            models, 64, 64, FaceDetectionMode.FAST, from_detections=True,
            batched=False)
        boxes = jnp.asarray([[0.4, 0.4, 0.6, 0.6]])
        kp_degenerate = jnp.full((1, 6, 2), 0.5)  # all points coincide
        scores = jnp.asarray([0.9])
        valid = jnp.asarray([True])
        out = prog(models.params, jnp.zeros((64, 64, 3)),
                   boxes, kp_degenerate, scores, valid)
        assert not bool(np.asarray(out["valid"])[0])


class TestFaceSmoother:
    def _face(self, x0, tid, with_mesh=True):
        from face_detection_tflite_tpu.pipeline.smoothing import FaceSmoother
        det = Detection(RectF(x0, 0.1, x0 + 0.2, 0.3), 0.9,
                        np.full((6, 2), x0))
        mesh = FaceMesh(np.full((468, 3), x0 * 100), 0.99) if with_mesh \
            else None
        return Face(det, mesh, np.zeros((0, 3)), (100, 100),
                    tracking_id=tid)

    def test_ema_converges(self):
        from face_detection_tflite_tpu.pipeline.smoothing import FaceSmoother
        s = FaceSmoother(alpha=0.5)
        (f1,) = s.smooth([self._face(0.0, 1)])
        assert f1.bounding_box.xmin == pytest.approx(0.0)
        (f2,) = s.smooth([self._face(0.4, 1)])
        assert f2.bounding_box.xmin == pytest.approx(0.2)  # halfway
        assert f2.mesh.points[0, 0] == pytest.approx(20.0)
        assert f2.tracking_id == 1

    def test_untracked_passthrough(self):
        from face_detection_tflite_tpu.pipeline.smoothing import FaceSmoother
        s = FaceSmoother(alpha=0.5)
        f = self._face(0.3, None)
        assert s.smooth([f])[0] is f

    def test_track_forgotten_after_misses(self):
        from face_detection_tflite_tpu.pipeline.smoothing import FaceSmoother
        s = FaceSmoother(alpha=0.5, max_missed_frames=1)
        s.smooth([self._face(0.0, 7)])
        s.smooth([])
        s.smooth([])
        (f,) = s.smooth([self._face(0.4, 7)])
        assert f.bounding_box.xmin == pytest.approx(0.4)  # fresh, no EMA

    def test_alpha_validation(self):
        from face_detection_tflite_tpu.pipeline.smoothing import FaceSmoother
        with pytest.raises(ValueError):
            FaceSmoother(alpha=0.0)
        with pytest.raises(ValueError):
            FaceSmoother(method="kalman")


class TestOneEuroFilter:
    """One-Euro filter (`example/lib/main.dart:3830` call-site params;
    Casiez et al. CHI 2012 algorithm)."""

    def test_first_sample_passes_through(self):
        from face_detection_tflite_tpu import OneEuroFilter
        f = OneEuroFilter()
        x = np.asarray([1.0, 2.0])
        assert np.array_equal(f.filter(x, 0.0), x)

    def test_constant_signal_stays_constant(self):
        from face_detection_tflite_tpu import OneEuroFilter
        f = OneEuroFilter()
        for i in range(10):
            out = f.filter(np.asarray([5.0]), i / 30.0)
        assert out[0] == pytest.approx(5.0)

    def test_adaptive_smoothing(self):
        """Small jitter is crushed; a fast ramp is followed closely —
        relative lag on the ramp is far smaller than jitter attenuation."""
        from face_detection_tflite_tpu import OneEuroFilter
        rng = np.random.default_rng(0)
        jitter_f, ramp_f = OneEuroFilter(), OneEuroFilter()
        jitter_dev = []
        for i in range(60):
            t = i / 30.0
            noisy = 10.0 + rng.normal(0, 1.0)
            jitter_dev.append(abs(jitter_f.filter(
                np.asarray([noisy]), t)[0] - 10.0))
            ramp_out = ramp_f.filter(np.asarray([100.0 * t]), t)
        # Jitter attenuated well below input sigma.
        assert np.mean(jitter_dev[10:]) < 0.5
        # Ramp (100 px/s) tracked within a few px at the end.
        assert abs(ramp_out[0] - 100.0 * (59 / 30.0)) < 6.0

    def test_non_monotonic_time_returns_previous(self):
        from face_detection_tflite_tpu import OneEuroFilter
        f = OneEuroFilter()
        f.filter(np.asarray([1.0]), 0.0)
        out = f.filter(np.asarray([9.0]), 0.0)
        assert out[0] == pytest.approx(1.0)

    def test_param_validation(self):
        from face_detection_tflite_tpu import OneEuroFilter
        with pytest.raises(ValueError):
            OneEuroFilter(min_cutoff=0.0)


class TestOneEuroSmoother:
    def _face(self, x0, mesh_val, with_mesh=True):
        det = Detection(RectF(x0, 0.1, x0 + 0.2, 0.3), 0.9,
                        np.full((6, 2), x0))
        mesh = FaceMesh(np.full((468, 3), mesh_val), 0.99) if with_mesh \
            else None
        return Face(det, mesh, np.full((10, 3), mesh_val), (100, 100))

    def test_iou_matching_without_tracker(self):
        """Same-place faces continue one track (no tracking IDs needed)."""
        from face_detection_tflite_tpu import FaceSmoother
        s = FaceSmoother(method="one_euro")
        (f1,) = s.smooth([self._face(0.4, 50.0)], t_sec=0.0)
        assert f1.mesh.points[0, 0] == pytest.approx(50.0)  # first sample
        (f2,) = s.smooth([self._face(0.4, 60.0)], t_sec=1 / 30)
        # Filtered: strictly between previous and new observation.
        assert 50.0 < f2.mesh.points[0, 0] < 60.0
        assert 50.0 < f2.iris_points[0, 0] < 60.0
        # z passes through unfiltered (main.dart smooths x/y only).
        assert f2.mesh.points[0, 2] == pytest.approx(60.0)

    def test_disjoint_face_starts_fresh_track(self):
        from face_detection_tflite_tpu import FaceSmoother
        s = FaceSmoother(method="one_euro")
        s.smooth([self._face(0.0, 50.0)], t_sec=0.0)
        (f,) = s.smooth([self._face(0.7, 90.0)], t_sec=1 / 30)
        assert f.mesh.points[0, 0] == pytest.approx(90.0)  # unfiltered

    def test_track_forgotten_after_misses(self):
        """Unmatched tracks age on NON-empty frames and retire
        (`main.dart:3812-3816`)."""
        from face_detection_tflite_tpu import FaceSmoother
        s = FaceSmoother(method="one_euro", max_missed_frames=1)
        s.smooth([self._face(0.2, 50.0)], t_sec=0.0)
        for i in range(3):  # disjoint face ages the unmatched track
            s.smooth([self._face(0.7, 10.0)], t_sec=(1 + i) / 30)
        f = s.smooth([self._face(0.2, 90.0), self._face(0.7, 10.0)],
                     t_sec=0.2)[0]
        assert f.mesh.points[0, 0] == pytest.approx(90.0)  # fresh track

    def test_empty_frames_do_not_age_tracks(self):
        """Reference early-return on empty frames (`main.dart:3768-3770`):
        a face occluded for many frames resumes its existing track."""
        from face_detection_tflite_tpu import FaceSmoother
        s = FaceSmoother(method="one_euro", max_missed_frames=1)
        s.smooth([self._face(0.4, 50.0)], t_sec=0.0)
        for i in range(10):
            assert s.smooth([], t_sec=(1 + i) / 30) == []
        (f,) = s.smooth([self._face(0.4, 90.0)], t_sec=0.5)
        # Matched the surviving track: filtered, not a fresh pass-through.
        assert 50.0 < f.mesh.points[0, 0] < 90.0

    def test_meshless_face_passes_through(self):
        from face_detection_tflite_tpu import FaceSmoother
        s = FaceSmoother(method="one_euro")
        f = self._face(0.4, 0.0, with_mesh=False)
        assert s.smooth([f], t_sec=0.0)[0] is f

    def test_scores_preserved(self):
        from face_detection_tflite_tpu import FaceSmoother
        s = FaceSmoother(method="one_euro")
        det = Detection(RectF(0.4, 0.1, 0.6, 0.3), 0.9, np.full((6, 2), 0.5))
        face = Face(det, FaceMesh(np.zeros((468, 3)), 0.77),
                    np.zeros((10, 3)), (100, 100),
                    blendshape_scores=np.full(52, 0.25))
        s.smooth([face], t_sec=0.0)
        (out,) = s.smooth([face], t_sec=1 / 30)
        assert out.mesh.score == pytest.approx(0.77)
        assert out.blendshapes is not None
        assert out.blendshapes[0] == pytest.approx(0.25)

    def test_reset_clears_tracks(self):
        from face_detection_tflite_tpu import FaceSmoother
        s = FaceSmoother(method="one_euro")
        s.smooth([self._face(0.4, 50.0)], t_sec=0.0)
        s.reset()
        (f,) = s.smooth([self._face(0.4, 90.0)], t_sec=1 / 30)
        assert f.mesh.points[0, 0] == pytest.approx(90.0)


class TestFifthReviewRegressions:
    def test_np_head_euler_matches_jnp(self):
        """Host numpy head-pose equals the device jnp implementation."""
        from face_detection_tflite_tpu.pipeline.types import _np_head_euler
        rng = np.random.default_rng(0)
        for _ in range(5):
            mesh = np.zeros((468, 3))
            mesh[geometry.MESH_FOREHEAD_TOP] = rng.normal(50, 20, 3)
            mesh[geometry.MESH_CHIN_BOTTOM] = rng.normal(60, 20, 3)
            mesh[geometry.MESH_LEFT_CHEEK] = rng.normal(30, 20, 3)
            mesh[geometry.MESH_RIGHT_CHEEK] = rng.normal(80, 20, 3)
            a_np = _np_head_euler(mesh)
            a_jnp = np.asarray(geometry.head_euler_angles_from_mesh(
                jnp.asarray(mesh, jnp.float32)[None]))[0]
            assert np.allclose(a_np, a_jnp, atol=1e-3)

    def test_degenerate_head_pose_falls_back_to_roll(self):
        """All-coincident landmarks -> jnp gives NaN, Face falls back."""
        mesh = np.full((468, 3), 5.0)
        a = np.asarray(geometry.head_euler_angles_from_mesh(
            jnp.asarray(mesh, jnp.float32)[None]))[0]
        assert np.isnan(a).all()
        kp = np.zeros((6, 2))
        kp[0], kp[1] = [0.4, 0.5], [0.6, 0.5]
        det = Detection(RectF(0.3, 0.3, 0.7, 0.7), 0.9, kp)
        face = Face(det, FaceMesh(mesh, 0.9), np.zeros((0, 3)), (100, 100))
        angles = face.head_euler_angles
        assert angles.x == 0.0 and angles.y == 0.0  # roll-only fallback

    def test_eyes_generic_stream_lengths(self):
        det = Detection(RectF(0.1, 0.1, 0.9, 0.9), 0.9, np.zeros((6, 2)))
        # even stream of 20 -> split in halves
        face = Face(det, None, np.arange(60).reshape(20, 3), (100, 100))
        eyes = face.eyes
        assert eyes.left_eye is not None and eyes.right_eye is not None
        assert len(eyes.left_eye.mesh) == 5  # 10 - 5 iris points
        # stream of 7 -> single left eye
        face2 = Face(det, None, np.arange(21).reshape(7, 3), (100, 100))
        assert face2.eyes.left_eye is not None
        assert face2.eyes.right_eye is None

    def test_eyes_76_point_stream_is_one_full_eye(self):
        """76 points = ONE per-eye stream (71 contour + 5 iris), matched
        BEFORE the even-split rule (`face_types.dart:1296-1298`) — the
        round-2 review caught it falling into the halves split, which
        fabricated two 38-point half-eyes with garbage iris centers."""
        det = Detection(RectF(0.1, 0.1, 0.9, 0.9), 0.9, np.zeros((6, 2)))
        iris = np.zeros((76, 3))
        iris[71:76] = [[10, 10, -3], [12, 10, -3], [11, 11, -3.5],
                       [10, 12, -3], [12, 12, -3]]
        face = Face(det, None, iris, (100, 100))
        eyes = face.eyes
        assert eyes.right_eye is None
        assert len(eyes.left_eye.mesh) == 71
        np.testing.assert_allclose(eyes.left_eye.iris_center,
                                   [11, 11, -3.5])

    def test_landmarks_eye_z_from_iris(self):
        det = Detection(RectF(0.1, 0.1, 0.9, 0.9), 0.9,
                        np.full((6, 2), 0.5))
        iris = np.zeros((152, 3))
        iris[71:76] = [[10, 10, -3], [12, 10, -3], [11, 11, -3.5],
                       [10, 12, -3], [12, 12, -3]]
        iris[147:152] = [[30, 10, -4], [32, 10, -4], [31, 11, -4.5],
                         [30, 12, -4], [32, 12, -4]]
        face = Face(det, None, iris, (100, 100))
        lm = face.landmarks
        assert lm.left_eye[2] == -3.5   # iris center z carried through
        assert lm.right_eye[2] == -4.5

    def test_smoother_resets_on_discontinuity(self):
        from face_detection_tflite_tpu.pipeline.smoothing import FaceSmoother
        s = FaceSmoother(alpha=0.5)

        def face_at(x0, tid):
            d = Detection(RectF(x0, 0.1, x0 + 0.1, 0.2), 0.9,
                          np.zeros((6, 2)))
            return Face(d, None, np.zeros((0, 3)), (100, 100),
                        tracking_id=tid)

        s.smooth([face_at(0.0, 1)])
        # same ID but a face on the other side of the frame (ID reuse
        # after reset_tracking): EMA restarts instead of blending
        (f,) = s.smooth([face_at(0.8, 1)])
        assert f.bounding_box.xmin == pytest.approx(0.8)


class TestAlignedRoiAndCoverFit:
    def test_aligned_roi_is_tuple_compatible(self):
        import face_detection_tflite_tpu as f
        r = f.AlignedRoi(10.0, 20.0, 30.0, 0.5)
        cx, cy, size, theta = r
        assert (cx, cy, size, theta) == (10.0, 20.0, 30.0, 0.5)
        assert r.size == 30.0

    def test_cover_fit_transform(self):
        from face_detection_tflite_tpu.utils.render import cover_fit_transform
        # Portrait viewport over a landscape source: height-limited.
        scale, dx, dy = cover_fit_transform(640, 480, 1080, 1920)
        assert scale == 4.0 and dy == 0.0 and dx == (1080 - 640 * 4.0) / 2
        # Same aspect: pure scale, no offsets.
        scale, dx, dy = cover_fit_transform(320, 240, 640, 480)
        assert (scale, dx, dy) == (2.0, 0.0, 0.0)
        # Center of source maps to center of viewport.
        scale, dx, dy = cover_fit_transform(101, 37, 777, 333)
        assert 101 / 2 * scale + dx == pytest.approx(777 / 2)
        assert 37 / 2 * scale + dy == pytest.approx(333 / 2)
        with pytest.raises(ValueError):
            cover_fit_transform(0, 480, 1080, 1920)

    def test_transform_mesh_flat_matches_packed(self):
        from face_detection_tflite_tpu.pipeline.geometry import (
            transform_mesh_flat_to_absolute, transform_mesh_to_absolute)
        rng = np.random.default_rng(7)
        pts = rng.random((468, 3)).astype(np.float32)
        args = (jnp.float32(100.0), jnp.float32(120.0),
                jnp.float32(80.0), jnp.float32(0.3))
        packed = transform_mesh_to_absolute(jnp.asarray(pts), *args)
        flat = transform_mesh_flat_to_absolute(
            jnp.asarray(pts.reshape(-1)), *args)
        assert np.array_equal(np.asarray(packed).reshape(-1),
                              np.asarray(flat))


class TestSmootherStateIsolation:
    """Smoother state must not alias caller arrays in either direction
    (an in-place edit on a returned mesh corrupted the EMA accumulator)."""

    def _face(self, x0, tid):
        det = Detection(RectF(x0, 0.1, x0 + 0.2, 0.3), 0.9,
                        np.full((6, 2), x0))
        mesh = FaceMesh(np.full((468, 3), x0 * 100, np.float64), 0.99)
        return Face(det, mesh, np.zeros((0, 3)), (100, 100), tracking_id=1)

    def test_ema_output_mutation_does_not_corrupt_state(self):
        from face_detection_tflite_tpu.pipeline.smoothing import FaceSmoother
        s = FaceSmoother(alpha=0.5)
        (out1,) = s.smooth([self._face(0.1, 1)])
        out1.mesh.points[:] = 9999.0  # caller mutates for rendering
        (out2,) = s.smooth([self._face(0.1, 1)])
        np.testing.assert_allclose(out2.mesh.points, 10.0)  # not 9999-tainted

    def test_ema_input_mutation_does_not_corrupt_state(self):
        from face_detection_tflite_tpu.pipeline.smoothing import FaceSmoother
        s = FaceSmoother(alpha=0.5)
        f = self._face(0.1, 1)
        s.smooth([f])
        f.mesh.points[:] = -5.0  # caller reuses its own buffer
        (out,) = s.smooth([self._face(0.1, 1)])
        np.testing.assert_allclose(out.mesh.points, 10.0)

    def test_ema_forgets_stale_mesh(self):
        """A mesh that disappears (FAST frames) and returns must restart
        its EMA, not blend with arbitrarily stale points."""
        from face_detection_tflite_tpu.pipeline.smoothing import FaceSmoother
        s = FaceSmoother(alpha=0.5)
        s.smooth([self._face(0.1, 1)])          # mesh at 10
        det = Detection(RectF(0.1, 0.1, 0.3, 0.3), 0.9, np.full((6, 2), 0.1))
        meshless = Face(det, None, np.zeros((0, 3)), (100, 100),
                        tracking_id=1)
        s.smooth([meshless])                    # mesh absent -> forget
        (out,) = s.smooth([self._face(0.5, 1)])  # mesh at 50 reappears
        np.testing.assert_allclose(out.mesh.points, 50.0)  # no 10-blend

    def test_one_euro_filter_copies(self):
        from face_detection_tflite_tpu.pipeline.smoothing import OneEuroFilter
        f = OneEuroFilter()
        x = np.zeros((4, 2), np.float64)
        out0 = f.filter(x, 0.0)
        x[:] = 100.0          # caller's array mutated after init
        out0[:] = -7.0        # returned array mutated
        out1 = f.filter(np.ones((4, 2)), 1.0)
        assert np.all(out1 >= 0.0) and np.all(out1 <= 1.0)  # state untainted


class TestSharedSurfaceComplete:
    """Closes the pure-math coverage gate (VERDICT r4 #6,
    tools/coverage_gate.py): direct unit tests for the shared-type
    surface the heavier integration suites exercised only indirectly —
    Face.to_dict, landmark getters, Eye edge shapes, precomputed head
    angles, split_meshes edges, tracker/smoother degenerate branches."""

    def _full_face(self):
        rng = np.random.default_rng(0)
        kp = rng.uniform(0.2, 0.8, (6, 2))
        det = Detection(RectF(0.2, 0.2, 0.8, 0.9), 0.93, kp)
        mesh = rng.uniform(0, 100, (468, 3))
        iris = rng.uniform(0, 100, (152, 3))
        scores = rng.uniform(0, 1, 52).astype(np.float32)
        emb = rng.normal(size=192).astype(np.float32)
        return Face(det, FaceMesh(mesh, 0.88), iris, (100, 120),
                    blendshape_scores=scores, embedding=emb,
                    head_angles=(5.0, -3.0, 1.5), tracking_id=4)

    def test_to_dict_full_payload_json_round_trip(self):
        import json
        f = self._full_face()
        d = f.to_dict(include_mesh=True, include_contours=True,
                      include_iris=True, include_embedding=True)
        j = json.loads(json.dumps(d))
        assert j["score"] == pytest.approx(0.93)
        assert j["tracking_id"] == 4
        assert len(j["mesh"]) == 468
        assert len(j["embedding"]) == 192
        assert set(j["contours"]) == {t.name
                                      for t in FACE_CONTOUR_MESH_INDICES}
        assert "left_eye" in j["eyes"]
        assert "iris_contour" in j["eyes"]["left_eye"]
        # head angles come from the program-solved values, not re-derived
        assert j["head_euler_angles"] == {"x": 5.0, "y": -3.0, "z": 1.5}
        assert j["blendshapes"]["jawOpen"] == pytest.approx(
            float(f.blendshapes[Blendshape.jawOpen]))
        assert 0.0 <= j["smiling_probability"] <= 1.0
        assert j["mesh_score"] == pytest.approx(0.88)
        # minimal payload drops the heavyweight opt-ins (embedding is
        # opt-OUT: include_embedding defaults True, 192 floats is small)
        d2 = f.to_dict()
        assert "mesh" not in d2 and "contours" not in d2
        assert "embedding" in d2
        assert "iris_contour" not in d2.get("eyes", {}).get("left_eye", {})
        assert repr(f).startswith("Face(")

    def test_landmark_getters_and_detection_keypoint(self):
        from face_detection_tflite_tpu.pipeline.types import (
            FaceLandmarkType)
        f = self._full_face()
        lm = f.landmarks
        for name in ("nose_tip", "mouth", "left_eye_tragion",
                     "right_eye_tragion", "left_eye", "right_eye"):
            assert getattr(lm, name) is not None, name
        assert np.allclose(lm[FaceLandmarkType.NOSE_TIP], lm.nose_tip)
        assert {t for t, _ in lm.items()} == set(FaceLandmarkType)
        x, y = f.detection_data.keypoint(FaceLandmarkType.NOSE_TIP)
        assert (x, y) == (pytest.approx(lm.nose_tip[0] / 100),
                          pytest.approx(lm.nose_tip[1] / 120))

    def test_mesh_contours_property_and_mesh_score(self):
        f = self._full_face()
        c = f.mesh.contours
        assert set(c) == set(FACE_CONTOUR_MESH_INDICES)
        assert c[FaceContourType.FACE].shape == (36, 3)
        assert f.mesh_score == pytest.approx(0.88)
        det = Detection(RectF(0.1, 0.1, 0.9, 0.9), 0.9, np.zeros((6, 2)))
        meshless = Face(det, None, np.zeros((0, 3)), (100, 100))
        assert meshless.mesh_score is None
        assert meshless.left_eye_open_probability is None
        assert meshless.right_eye_open_probability is None
        assert f.blendshapes.as_dict()["jawOpen"] == pytest.approx(
            float(f.blendshapes[Blendshape.jawOpen]))
        assert len(f.blendshapes.as_dict()) == 52

    def test_eye_from_points_edges(self):
        assert Eye.from_points(np.zeros((4, 3))) is None  # < 5 points
        eye = Eye.from_points(np.arange(15, dtype=float).reshape(5, 3))
        assert eye is not None and eye.mesh.shape == (0, 3)  # iris-only

    def test_eyes_from_ten_iris_points(self):
        det = Detection(RectF(0.1, 0.1, 0.9, 0.9), 0.9, np.zeros((6, 2)))
        face = Face(det, None, np.arange(30, dtype=float).reshape(10, 3),
                    (100, 100))
        eyes = face.eyes
        assert eyes.left_eye is not None and eyes.right_eye is not None

    def test_width_fraction_zero_width_image(self):
        det = Detection(RectF(0.1, 0.1, 0.9, 0.9), 0.9, np.zeros((6, 2)))
        assert Face(det, None, np.zeros((0, 3)),
                    (0, 100)).width_fraction == 0.0

    def test_degenerate_mesh_head_pose_falls_back_to_roll(self):
        """A mesh whose canonical frame is degenerate (all points
        coincident) must fall back to the roll-only estimate, not crash
        (types._np_head_euler returns None)."""
        kp = np.zeros((6, 2))
        kp[0], kp[1] = [0.4, 0.5], [0.6, 0.5]
        det = Detection(RectF(0.3, 0.3, 0.7, 0.7), 0.9, kp)
        face = Face(det, FaceMesh(np.zeros((468, 3))), np.zeros((0, 3)),
                    (100, 100))
        a = face.head_euler_angles
        assert a.x == 0.0 and a.y == 0.0

    def test_split_meshes_edges(self):
        from face_detection_tflite_tpu import split_meshes_if_concatenated
        assert split_meshes_if_concatenated(np.zeros((0, 3))) == []
        out = split_meshes_if_concatenated(np.zeros((7, 3)))
        assert len(out) == 1 and out[0].shape == (7, 3)  # non-multiple
        assert len(split_meshes_if_concatenated(np.zeros((936, 3)))) == 2

    def test_tracker_duplicate_candidate_and_degenerate_box(self):
        tr = TemporalFaceTracker(max_missed_frames=3)
        a = [0.2, 0.2, 0.6, 0.6]
        (id1,) = tr.update([a])
        # Two detections both scoring best against the SAME track: the
        # second candidate is skipped (greedy global matching) and gets a
        # fresh id.
        ids = tr.update([a, [0.21, 0.2, 0.61, 0.6]])
        assert ids[0] == id1 and ids[1] != id1
        # Degenerate (inverted) boxes never match (candidate -> None):
        # each frame assigns a fresh id.
        (d1,) = tr.update([[0.5, 0.5, 0.4, 0.4]])
        (d2,) = tr.update([[0.5, 0.5, 0.4, 0.4]])
        assert d1 != d2

    def test_one_euro_filter_reset(self):
        from face_detection_tflite_tpu import OneEuroFilter
        f = OneEuroFilter()
        f.filter(np.asarray([1.0]), 0.0)
        f.filter(np.asarray([2.0]), 0.1)
        f.reset()
        out = f.filter(np.asarray([5.0]), 0.2)
        assert out[0] == 5.0  # fresh state: first sample passes through

    def test_ema_smoother_preserves_blendshapes_and_embedding(self):
        from face_detection_tflite_tpu.pipeline.smoothing import FaceSmoother
        s = FaceSmoother(alpha=0.5)
        det = Detection(RectF(0.1, 0.1, 0.5, 0.5), 0.9, np.zeros((6, 2)))
        scores = np.full(52, 0.25, np.float32)
        f = Face(det, FaceMesh(np.zeros((468, 3)), 0.9), np.zeros((0, 3)),
                 (100, 100), blendshape_scores=scores,
                 embedding=np.ones(192, np.float32), tracking_id=3)
        (out,) = s.smooth([f])
        assert out.blendshapes is not None
        assert float(out.blendshapes[Blendshape.jawOpen]) == 0.25
        assert out.embedding is not None and out.tracking_id == 3

    def test_one_euro_smoother_reuses_track_on_overlap(self):
        from face_detection_tflite_tpu.pipeline.smoothing import FaceSmoother
        s = FaceSmoother(method="one_euro")
        det = Detection(RectF(0.1, 0.1, 0.5, 0.5), 0.9, np.zeros((6, 2)))

        def face(v):
            return Face(det, FaceMesh(np.full((468, 3), v), 0.9),
                        np.zeros((0, 3)), (100, 100))

        s.smooth([face(10.0)])
        (out,) = s.smooth([face(20.0)])  # same box -> matches the track
        assert 10.0 < out.mesh.points[0, 0] <= 20.0  # filtered, not fresh
