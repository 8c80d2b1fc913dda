"""Pallas NMS kernel vs the XLA reference implementation.

Runs in interpreter mode on CPU (same kernel code path as the compiled
TPU kernel modulo Mosaic lowering); the TPU-compiled equivalence is
exercised by bench.py / the driver on hardware.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from face_detection_tflite_tpu.ops.detections import weighted_nms
from face_detection_tflite_tpu.ops.nms_pallas import weighted_nms_pallas


def _random_candidates(rng, n=64, overlap_prob=0.5):
    boxes, scores = [], []
    for _ in range(n):
        if boxes and rng.uniform() < overlap_prob:
            # jittered copy of an existing box -> clusters
            b = np.asarray(boxes[rng.integers(len(boxes))])
            b = b + rng.normal(0, 0.02, 4)
        else:
            x0, y0 = rng.uniform(0, 0.7, 2)
            w, h = rng.uniform(0.05, 0.3, 2)
            b = np.asarray([x0, y0, x0 + w, y0 + h])
        boxes.append(b.tolist())
        scores.append(float(rng.uniform(0.0, 1.0)))
    return (np.asarray(boxes, np.float32), np.asarray(scores, np.float32))


@pytest.mark.parametrize("seed", range(4))
def test_pallas_matches_xla(seed):
    rng = np.random.default_rng(seed)
    boxes, scores = _random_candidates(rng)
    kp = rng.normal(size=(len(boxes), 6, 2)).astype(np.float32)
    valid = scores >= 0.5

    args = (jnp.asarray(boxes), jnp.asarray(kp), jnp.asarray(scores),
            jnp.asarray(valid))
    ref = weighted_nms(*args, max_detections=8, num_candidates=64)
    out = weighted_nms_pallas(*args, max_detections=8, num_candidates=64,
                              interpret=True)
    for r, o, name in zip(ref, out, ("boxes", "kp", "scores", "valid")):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_pallas_empty_input():
    boxes = jnp.zeros((32, 4))
    kp = jnp.zeros((32, 6, 2))
    scores = jnp.zeros((32,))
    valid = jnp.zeros((32,), bool)
    ob, ok, osc, ov = weighted_nms_pallas(
        boxes, kp, scores, valid, max_detections=4, num_candidates=32,
        interpret=True)
    assert not np.asarray(ov).any()


def test_pallas_single_cluster_blend():
    boxes = jnp.asarray([[0.0, 0.0, 0.5, 0.5],
                         [0.05, 0.05, 0.55, 0.55]], jnp.float32)
    kp = jnp.full((2, 6, 2), 0.3)
    scores = jnp.asarray([0.9, 0.8])
    valid = jnp.asarray([True, True])
    ob, ok, osc, ov = weighted_nms_pallas(
        boxes, kp, scores, valid, max_detections=4, num_candidates=2,
        interpret=True)
    ob, osc, ov = map(np.asarray, (ob, osc, ov))
    assert ov.sum() == 1
    assert osc[0] == pytest.approx(0.9)
    expected = (0.9 * boxes[0] + 0.8 * boxes[1]) / 1.7
    np.testing.assert_allclose(ob[0], np.asarray(expected), atol=1e-6)


def test_pallas_large_k_falls_back_to_xla():
    """Above PALLAS_MAX_K (the kernel's [k,k] VMEM sizing) the wrapper
    routes to the XLA fixpoint with identical outputs — the parity
    default num_candidates=None at full-range scale (2304 anchors) must
    not blow VMEM."""
    from face_detection_tflite_tpu.ops.detections import weighted_nms
    from face_detection_tflite_tpu.ops.nms_pallas import PALLAS_MAX_K
    rng = np.random.default_rng(11)
    n = PALLAS_MAX_K + 64
    c = rng.uniform(0.1, 0.9, (n, 2)).astype(np.float32)
    wh = rng.uniform(0.02, 0.2, (n, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([c - wh / 2, c + wh / 2], axis=1))
    kp = jnp.asarray(rng.uniform(0, 1, (n, 6, 2)).astype(np.float32))
    scores = jnp.asarray(rng.uniform(0.3, 1.0, n).astype(np.float32))
    valid = jnp.asarray(rng.uniform(0, 1, n) > 0.3)
    a = weighted_nms_pallas(boxes, kp, scores, valid, max_detections=16,
                            interpret=True)  # k = n > PALLAS_MAX_K
    b = weighted_nms(boxes, kp, scores, valid, max_detections=16)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
