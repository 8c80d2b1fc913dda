"""Crowd-scale stress parity (VERDICT r2 next #8): >16-face images driving
the NMS/face slab into saturation, checked against the reference oracle's
unbounded clustering (`helpers.dart:183-221`).

The crowd images are built from the group shot's face strip (cropped so
faces stay large relative to the image, then tiled): detection is
scale-invariant through the 256px letterbox, so tiling N copies yields
N x 4 genuinely detectable faces.
"""

import os

import numpy as np
import pytest
from PIL import Image

from face_detection_tflite_tpu import (FaceDetectionMode, FaceDetectionModel,
                                       FaceDetector)

from .asset_paths import MODELS_DIR, SAMPLES
GROUP = os.path.join(SAMPLES, "group-shot-bounding-box-ex1.jpeg")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MODELS_DIR), reason="reference assets not present")


def _resize(a, w, h):
    return np.asarray(Image.fromarray(a).resize((w, h)))


@pytest.fixture(scope="module")
def strip():
    """The group shot cropped to its 4-face strip (faces large relative
    to the crop)."""
    img = np.asarray(Image.open(GROUP).convert("RGB"))
    # Union box of the 4 faces (stable across runs; computed once from
    # the detector and pinned here with generous margins).
    h, w = img.shape[:2]
    x0, x1 = int(0.28 * w), int(0.72 * w)
    y0, y1 = int(0.01 * h), int(0.91 * h)
    return img[y0:y1, x0:x1]


@pytest.fixture(scope="module")
def crowd24(strip):
    """24 detectable faces: 2x3 grid of third-scale strips, downscaled to
    ~965x540 for CPU speed (detection sees the same 256px letterbox)."""
    q = _resize(strip, strip.shape[1] // 3, strip.shape[0] // 3)
    t = np.concatenate([np.concatenate([q] * 2, 1)] * 3, 0)
    return _resize(t, t.shape[1] // 2, t.shape[0] // 2)


@pytest.fixture(scope="module")
def oracle24(crowd24):
    from .oracle import detect as oracle_detect
    dets = oracle_detect(
        crowd24, os.path.join(MODELS_DIR, "face_detection_back.tflite"),
        "back")
    return sorted(dets, key=lambda d: -d["score"])


@pytest.fixture(scope="module")
def detector():
    return FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                        model_dir=MODELS_DIR)


class TestSlabSaturation:
    def test_oracle_finds_more_than_max_faces(self, oracle24):
        # The construction genuinely exceeds the 16-slot slab.
        assert len(oracle24) >= 20

    def test_exactly_max_faces_emitted_highest_scores_kept(
            self, detector, crowd24, oracle24):
        faces = detector.detect_faces(crowd24, FaceDetectionMode.FAST)
        assert len(faces) == 16  # saturated: exactly max_faces
        ours = sorted(faces, key=lambda f: -f.score)
        for f, o in zip(ours, oracle24[:16]):
            assert f.score == pytest.approx(o["score"], abs=2e-2)
        # Box parity on the kept top-16 (normalized coords).
        for f, o in zip(ours, oracle24[:16]):
            bb = f.bounding_box
            np.testing.assert_allclose(
                [bb.xmin, bb.ymin, bb.xmax, bb.ymax], o["box"], atol=6e-3)

    def test_smaller_slab_keeps_its_top_k(self, crowd24, oracle24):
        d8 = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                          model_dir=MODELS_DIR, max_faces=8)
        faces = d8.detect_faces(crowd24, FaceDetectionMode.FAST)
        assert len(faces) == 8
        ours = sorted(f.score for f in faces)[::-1]
        want = [o["score"] for o in oracle24[:8]]
        np.testing.assert_allclose(ours, want, atol=2e-2)


class TestSpeculativeLadderSaturation:
    def test_ladder_grows_to_full_slab_and_meshes_all(self, detector,
                                                      crowd24):
        """STANDARD mode on a 24-face image: the speculative bucket must
        grow from 1 to the full 16 slab via the overflow re-run, every
        returned face carries a mesh, and the second call dispatches the
        slab-16 program directly."""
        h, w = crowd24.shape[:2]
        key = (h, w, FaceDetectionMode.STANDARD)
        assert detector._spec_state.get(key) is None  # cold
        faces = detector.detect_faces(crowd24, FaceDetectionMode.STANDARD)
        assert len(faces) == 16
        assert all(f.mesh is not None and f.mesh.points.shape == (468, 3)
                   for f in faces)
        assert detector._spec_state[key]["bucket"] == 16  # grown, sticky
        detector.timings.reset()
        faces2 = detector.detect_faces(crowd24, FaceDetectionMode.STANDARD)
        assert len(faces2) == 16
        stages = detector.timings.report()
        assert any(s.startswith("dispatch[slab16]") for s in stages), stages
        # No overflow re-run on the warm call.
        assert not any(s.startswith("face_stages") for s in stages), stages
        # Warm-path results are stable vs the cold (overflow) path.  The
        # two are DIFFERENT XLA programs (slab-16 face-stage re-run vs
        # fused slab-16 speculative), so allow fusion-level float32 noise
        # (measured 0.06 px worst) PLUS two independent int16 readback
        # quantizations (quantized_readback=True default; a coordinate
        # pair straddling a grid boundary can differ by 2 steps ≈ 0.12 px
        # at this image size) — 0.2 px stays 5x inside the 1 px budget.
        for a, b in zip(faces, faces2):
            assert a.score == pytest.approx(b.score, abs=1e-6)
            np.testing.assert_allclose(np.asarray(a.mesh.points),
                                       np.asarray(b.mesh.points), atol=0.2)
