"""Unit tests for the image/detection ops.

Follows the reference's "equivalence tests for fast paths" strategy
(`doc/testing.md`, `preprocessing_equivalence_test.dart`): every fused XLA
op is checked against the OpenCV ground truth the reference uses on host.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from face_detection_tflite_tpu.ops.anchors import (
    SSD_BACK, SSD_FRONT, SSD_FULL, generate_anchors)
from face_detection_tflite_tpu.ops.detections import (
    decode_detections, remove_letterbox, weighted_nms)
from face_detection_tflite_tpu.ops.letterbox import (
    letterbox_image, letterbox_params, resize_matrix)
from face_detection_tflite_tpu.ops.warp import extract_aligned_square

cv2 = pytest.importorskip("cv2")


class TestAnchors:
    def test_front_count(self):
        # 16x16 grid x2 + 8x8 grid x6 = 896 (helpers_coverage_test.dart)
        a = generate_anchors(SSD_FRONT)
        assert a.shape == (896, 2)

    def test_back_count(self):
        a = generate_anchors(SSD_BACK)
        assert a.shape == (896, 2)

    def test_full_count(self):
        # 48x48x1 = 2304, interp=0 -> 1 anchor/cell
        a = generate_anchors(SSD_FULL)
        assert a.shape == (2304, 2)

    def test_range(self):
        for opts in (SSD_FRONT, SSD_BACK, SSD_FULL):
            a = generate_anchors(opts)
            assert (a > 0).all() and (a <= 1).all()

    def test_first_cell_center(self):
        a = generate_anchors(SSD_FRONT)
        # layer 0: stride 8 -> 16x16 grid, first cell center at 0.5/16
        assert np.allclose(a[0], [0.5 / 16, 0.5 / 16])
        assert np.allclose(a[1], [0.5 / 16, 0.5 / 16])  # 2 anchors per cell
        assert np.allclose(a[2], [1.5 / 16, 0.5 / 16])  # x-major within row


class TestLetterbox:
    @pytest.mark.parametrize("src_hw,dst", [((480, 640), 128),
                                            ((853, 1280), 256),
                                            ((640, 480), 192),
                                            ((128, 128), 128)])
    def test_matches_cv2(self, src_hw, dst):
        rng = np.random.default_rng(42)
        h, w = src_hw
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        p = letterbox_params(h, w, dst, dst)

        ours = np.asarray(letterbox_image(jnp.asarray(img), p))

        resized = cv2.resize(img, (p.new_w, p.new_h),
                             interpolation=cv2.INTER_LINEAR)
        padded = cv2.copyMakeBorder(resized, p.pad_top, p.pad_bottom,
                                    p.pad_left, p.pad_right,
                                    cv2.BORDER_CONSTANT, value=(0, 0, 0))
        ref = padded / 127.5 - 1.0
        assert ours.shape == ref.shape
        assert np.abs(ours - ref).max() < 1e-4

    def test_no_resize_fast_path(self):
        p = letterbox_params(128, 128, 128, 128)
        assert (p.new_h, p.new_w) == (128, 128)
        assert p.padding == (0.0, 0.0, 0.0, 0.0)

    def test_padding_normalized(self):
        p = letterbox_params(480, 640, 128, 128)
        pt, pb, pl, pr = p.padding
        assert pl == pr == 0.0
        assert pt + pb == pytest.approx((128 - p.new_h) / 128)


class TestWarp:
    @pytest.mark.parametrize("theta_deg,out_size,size", [
        (0.0, 192, 192.0), (15.0, 192, 240.7), (-30.0, 64, 81.3),
        (90.0, 112, 150.0),
    ])
    def test_matches_cv2_warpaffine(self, theta_deg, out_size, size):
        """Replicates extractAlignedSquare (helpers.dart:583-625) with cv2."""
        rng = np.random.default_rng(7)
        img = rng.uniform(0, 255, (300, 400, 3)).astype(np.float32)
        cx, cy = 170.3, 140.8
        theta = np.deg2rad(theta_deg)

        size_int = round(size)
        scale = out_size / size_int
        rot = cv2.getRotationMatrix2D((cx, cy), -np.rad2deg(theta), scale)
        out_center = out_size / 2.0 + 0.5 * (scale - 1.0)
        rot[0, 2] += out_center - cx
        rot[1, 2] += out_center - cy
        ref = cv2.warpAffine(img, rot, (out_size, out_size),
                             borderMode=cv2.BORDER_CONSTANT)

        ours = np.asarray(extract_aligned_square(
            jnp.asarray(img), cx, cy, size, theta, out_size=out_size))
        # cv2 float path agrees to float32 roundoff away from the border.
        assert np.abs(ours - ref).max() < 2e-2
        assert np.median(np.abs(ours - ref)) < 1e-3

    def test_flip_x(self):
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 255, (100, 100, 3)).astype(np.float32)
        a = extract_aligned_square(jnp.asarray(img), 50.0, 50.0, 40.0, 0.2,
                                   out_size=64)
        b = extract_aligned_square(jnp.asarray(img), 50.0, 50.0, 40.0, 0.2,
                                   out_size=64, flip_x=True)
        assert np.allclose(np.asarray(a)[:, ::-1, :], np.asarray(b),
                           atol=1e-5)

    def test_outside_is_black(self):
        img = jnp.ones((50, 50, 3), jnp.float32)
        out = np.asarray(extract_aligned_square(
            img, 0.0, 0.0, 80.0, 0.0, out_size=80))
        # bottom-right quadrant inside, rest mostly black
        assert out[0, 0, 0] == 0.0
        assert out[79, 79, 0] == 1.0


def _np_weighted_nms(dets, iou_thresh, score_thresh, max_det=100):
    """Reference-semantics NMS oracle — shared with the pipeline oracle
    (tests/oracle.py) so there is exactly one Python port to keep in sync
    with helpers.dart:183-221."""
    from .oracle import weighted_nms as _oracle_nms
    return _oracle_nms(dets, iou_thresh, score_thresh, max_det)


class TestWeightedNms:
    def _run(self, dets, iou=0.3, score=0.5, max_det=8):
        n = len(dets)
        boxes = jnp.asarray([d["box"] for d in dets], jnp.float32)
        kps = jnp.asarray([d["kp"] for d in dets], jnp.float32)
        scores = jnp.asarray([d["score"] for d in dets], jnp.float32)
        valid = scores >= score
        ob, ok, osc, ov = weighted_nms(
            boxes, kps, scores, valid, max_detections=max_det,
            num_candidates=min(n, 128), iou_threshold=iou)
        return (np.asarray(ob), np.asarray(ok), np.asarray(osc),
                np.asarray(ov))

    def _det(self, x0, y0, x1, y1, score):
        return {"box": [x0, y0, x1, y1], "score": score,
                "kp": np.full((6, 2), score)}

    def test_empty(self):
        dets = [self._det(0, 0, 0.5, 0.5, 0.3)]
        _, _, _, ov = self._run(dets)
        assert not ov.any()

    def test_fixed_slab_when_candidates_below_max_detections(self):
        """num_candidates < max_detections must still return the documented
        [D] slab (round-2 review: downstream prefix slices assume it)."""
        dets = [self._det(0, 0, 0.2, 0.2, 0.9),
                self._det(0.8, 0.8, 1.0, 1.0, 0.8)]
        boxes = jnp.asarray([d["box"] for d in dets], jnp.float32)
        kps = jnp.asarray([d["kp"] for d in dets], jnp.float32)
        scores = jnp.asarray([d["score"] for d in dets], jnp.float32)
        ob, ok, osc, ov = weighted_nms(
            boxes, kps, scores, scores >= 0.5, max_detections=8,
            num_candidates=2)
        assert ob.shape == (8, 4) and ok.shape == (8, 6, 2)
        assert osc.shape == (8,) and ov.shape == (8,)
        assert np.asarray(ov).sum() == 2 and not np.asarray(ov)[2:].any()

    def test_keep_non_overlapping(self):
        dets = [self._det(0, 0, 0.2, 0.2, 0.9),
                self._det(0.8, 0.8, 1.0, 1.0, 0.8)]
        _, _, _, ov = self._run(dets)
        assert ov.sum() == 2

    def test_suppress_identical(self):
        dets = [self._det(0, 0, 0.5, 0.5, 0.9),
                self._det(0, 0, 0.5, 0.5, 0.8)]
        ob, _, osc, ov = self._run(dets)
        assert ov.sum() == 1
        assert osc[0] == pytest.approx(0.9)

    def test_weighted_average(self):
        dets = [self._det(0.0, 0.0, 0.5, 0.5, 0.9),
                self._det(0.05, 0.05, 0.55, 0.55, 0.8)]
        ob, ok, osc, ov = self._run(dets)
        assert ov.sum() == 1
        assert ob[0, 0] > 0.0  # blended toward second box
        assert osc[0] == pytest.approx(0.9)
        # keypoints come from the max-score member, not blended
        assert ok[0, 0, 0] == pytest.approx(0.9)

    def test_matches_numpy_oracle_random(self):
        rng = np.random.default_rng(11)
        for trial in range(5):
            dets = []
            for _ in range(40):
                x0, y0 = rng.uniform(0, 0.7, 2)
                w, h = rng.uniform(0.05, 0.3, 2)
                dets.append(self._det(x0, y0, x0 + w, y0 + h,
                                      float(rng.uniform(0.3, 1.0))))
            ref = _np_weighted_nms(dets, 0.3, 0.5, max_det=8)
            ob, _, osc, ov = self._run(dets, max_det=8)
            n = int(ov.sum())
            assert n == len(ref)
            for i in range(n):
                assert osc[i] == pytest.approx(ref[i]["score"], abs=1e-6)
                assert np.allclose(ob[i], ref[i]["box"], atol=1e-5)


class TestDecode:
    def test_decode_matches_reference_formula(self):
        """detection_decode.dart:44-88 semantics on synthetic data."""
        rng = np.random.default_rng(5)
        a = 16
        anchors = rng.uniform(0.1, 0.9, (a, 2)).astype(np.float32)
        raw = rng.uniform(-20, 20, (a, 16)).astype(np.float32)
        logits = rng.uniform(-3, 3, (a,)).astype(np.float32)
        boxes, kp, scores, valid = decode_detections(
            jnp.asarray(raw), jnp.asarray(logits), jnp.asarray(anchors), 128.0)
        boxes, kp, scores = map(np.asarray, (boxes, kp, scores))
        for i in range(a):
            t = raw[i] / 128.0
            xc, yc = t[0] + anchors[i, 0], t[1] + anchors[i, 1]
            w, h = t[2], t[3]
            assert np.allclose(boxes[i], [xc - w / 2, yc - h / 2,
                                          xc + w / 2, yc + h / 2], atol=1e-6)
            s = 1.0 / (1.0 + np.exp(-np.clip(logits[i], -100, 100)))
            assert scores[i] == pytest.approx(s, abs=1e-6)
            assert np.allclose(kp[i, 0], t[4:6] + anchors[i], atol=1e-6)

    def test_letterbox_removal(self):
        # helpers_private_test.dart: padding [0.1,0.1,0.05,0.05]
        boxes = jnp.asarray([[0.2, 0.3, 0.6, 0.7]], jnp.float32)
        kp = jnp.asarray([[[0.2, 0.3]]], jnp.float32)
        b, k = remove_letterbox(boxes, kp, (0.1, 0.1, 0.05, 0.05))
        assert np.asarray(b)[0, 0] == pytest.approx((0.2 - 0.05) / 0.9)
        assert np.asarray(b)[0, 1] == pytest.approx((0.3 - 0.1) / 0.8)
        assert np.asarray(k)[0, 0, 0] == pytest.approx((0.2 - 0.05) / 0.9)


class TestResizeMatrix:
    @pytest.mark.parametrize("in_s,out_s", [(480, 128), (128, 480), (64, 64),
                                            (853, 256)])
    def test_matches_cv2_resize_1d(self, in_s, out_s):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 255, (in_s, 32, 3)).astype(np.float32)
        m = resize_matrix(in_s, out_s)
        ours = np.einsum("oh,hwc->owc", m, img)
        ref = cv2.resize(img, (32, out_s), interpolation=cv2.INTER_LINEAR)
        assert np.abs(ours - ref).max() < 1e-3


class TestOpsCoverageGate:
    """Direct exercises for op branches the pipeline-level suites reach
    only indirectly (tools/coverage_gate.py targets)."""

    def test_decode_accepts_2d_raw_scores(self):
        """The detector graph emits [A, 1] logits; decode must accept
        both that and the flat [A] form identically."""
        rng = np.random.default_rng(0)
        anchors = jnp.asarray(generate_anchors(SSD_FRONT))
        raw_boxes = jnp.asarray(rng.normal(0, 10, (896, 16)),
                                jnp.float32)
        flat = jnp.asarray(rng.normal(0, 2, (896,)), jnp.float32)
        a = decode_detections(raw_boxes, flat, anchors, 128.0)
        b = decode_detections(raw_boxes, flat[:, None], anchors, 128.0)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_detection_postprocess_composes_stages(self):
        """detection_postprocess == decode -> weighted NMS -> letterbox
        removal (the documented one-call form)."""
        from face_detection_tflite_tpu.ops.detections import (
            detection_postprocess)
        rng = np.random.default_rng(1)
        anchors = jnp.asarray(generate_anchors(SSD_FRONT))
        raw_boxes = jnp.asarray(rng.normal(0, 12, (896, 16)), jnp.float32)
        raw_scores = jnp.asarray(rng.normal(0, 2, (896,)), jnp.float32)
        padding = (0.1, 0.0, 0.1, 0.0)
        got = detection_postprocess(raw_boxes, raw_scores, anchors, 128.0,
                                    padding, max_detections=8)
        boxes, kp, scores, valid = decode_detections(
            raw_boxes, raw_scores, anchors, 128.0)
        boxes, kp, scores, valid = weighted_nms(boxes, kp, scores, valid,
                                                max_detections=8)
        boxes, kp = remove_letterbox(boxes, kp, padding)
        for x, y in zip(got, (boxes, kp, scores, valid)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_extract_rois_flip_x(self):
        """flip_x mirrors the crop exactly (the right-eye iris path)."""
        from face_detection_tflite_tpu.ops.warp import extract_rois
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.integers(0, 255, (64, 80, 3)), jnp.uint8)
        cxs = jnp.asarray([40.0, 40.0])
        cys = jnp.asarray([32.0, 32.0])
        sizes = jnp.asarray([30.0, 30.0])
        thetas = jnp.asarray([0.3, 0.3])
        both = extract_rois(img, cxs, cys, sizes, thetas, out_size=16,
                            flip_x=jnp.asarray([False, True]))
        plain = extract_rois(img, cxs, cys, sizes, thetas, out_size=16)
        np.testing.assert_array_equal(np.asarray(both[0]),
                                      np.asarray(plain[0]))
        np.testing.assert_array_equal(np.asarray(both[1]),
                                      np.asarray(plain[1][:, ::-1, :]))

    def test_segmentation_config_presets_and_validation(self):
        from face_detection_tflite_tpu import SegmentationConfig
        safe = SegmentationConfig.safe()
        assert safe.precision == "highest" and safe.max_output_size == 1024
        perf = SegmentationConfig.performance()
        assert perf == SegmentationConfig()
        fast = SegmentationConfig.fast()
        assert fast.mask_dtype == "uint8"
        with pytest.raises(ValueError, match="mask_dtype"):
            SegmentationConfig(mask_dtype="float16")
        with pytest.raises(ValueError, match="max_output_size"):
            SegmentationConfig(max_output_size=0)
