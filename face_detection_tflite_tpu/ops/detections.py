"""On-device BlazeFace postprocessing: decode + weighted NMS, fixed shapes.

The reference does this on the host per image (`_collectCandidateScores` /
`_decodeBoxesForIndices` in `lib/src/models/face_detection_model.dart:431-492`
and `_weightedNmsDetections` in `lib/src/util/helpers.dart:183-221`).  Here it
is a shape-static, batched XLA computation that fuses with the detector
backbone into a single program: no host round-trip between the conv net and
the final detection slab.

Semantics matched to the reference:

* score = sigmoid(clip(logit, ±100))  (`kRawScoreLimit`,
  `face_model_config.dart:49`); the candidate filter uses the logit-domain
  shortcut `logit >= log(p/(1-p))` (`face_detection_model.dart:473`).
* box decode: raw / input_size + anchor center; keypoints likewise
  (`lib/src/web/detection_decode.dart:60-77`); degenerate boxes (w<=0 or
  h<=0) are rejected.
* weighted NMS: score-sorted greedy clustering with STRICT IoU > threshold
  (`helpers.dart:178-180`), cluster box = score-weighted average over the
  cluster, output score and keypoints come from the cluster's max-score
  member (`helpers.dart:183-221`).
* letterbox removal: (v - pad) / (1 - pad_lo - pad_hi) per axis
  (`helpers.dart:101-136`).

Output is a fixed-size slab per image: (boxes [D,4], keypoints [D,K,2],
scores [D], valid [D]) with D = ``max_detections``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["decode_detections", "weighted_nms", "detection_postprocess"]

# Single source for the parity-critical thresholds is pipeline/config.py
# (cited there against face_model_config.dart:49,53,77); duplicating the
# literals here once let the device decode gate drift from the host gates.
from ..pipeline.config import (MIN_SCORE, MIN_SUPPRESSION_THRESHOLD,
                               RAW_SCORE_LIMIT)

NMS_IOU = MIN_SUPPRESSION_THRESHOLD


def decode_detections(raw_boxes, raw_scores, anchors, input_size):
    """Decodes raw detector outputs to normalized boxes/keypoints/scores.

    Args:
      raw_boxes: [A, 16] raw box tensor (cx, cy, w, h, 6 keypoint pairs).
      raw_scores: [A] or [A, 1] raw logits.
      anchors: [A, 2] anchor centers (constant).
      input_size: scalar float, the model input resolution (128/192/256).

    Returns:
      boxes [A, 4] (xmin, ymin, xmax, ymax), keypoints [A, 6, 2],
      scores [A] (sigmoid with ±RAW_SCORE_LIMIT clip), valid [A] bool
      (score >= MIN_SCORE and non-degenerate box).
    """
    raw_scores = raw_scores.reshape(raw_scores.shape[0] if raw_scores.ndim == 1
                                    else raw_scores.shape[-2])
    scaled = raw_boxes / input_size
    cxy = scaled[:, 0:2] + anchors
    wh = scaled[:, 2:4]
    kp = scaled[:, 4:16].reshape(-1, 6, 2) + anchors[:, None, :]
    half = wh * 0.5
    boxes = jnp.concatenate([cxy - half, cxy + half], axis=-1)

    clipped = jnp.clip(raw_scores, -RAW_SCORE_LIMIT, RAW_SCORE_LIMIT)
    scores = jax.nn.sigmoid(clipped)
    valid = (scores >= MIN_SCORE) & (wh[:, 0] > 0) & (wh[:, 1] > 0)
    return boxes, kp, scores, valid


def _iou_matrix(boxes):
    """Pairwise IoU for [K, 4] boxes in (xmin, ymin, xmax, ymax)."""
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    ix0 = jnp.maximum(x0[:, None], x0[None, :])
    iy0 = jnp.maximum(y0[:, None], y0[None, :])
    ix1 = jnp.minimum(x1[:, None], x1[None, :])
    iy1 = jnp.minimum(y1[:, None], y1[None, :])
    inter = jnp.maximum(ix1 - ix0, 0) * jnp.maximum(iy1 - iy0, 0)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _topk_candidates(boxes, keypoints, scores, valid, k: int):
    """Score-sorted top-k candidate prep shared by the XLA fixpoint NMS
    and the Pallas kernel (ops/nms_pallas.py) — one copy, so parity fixes
    land in both paths."""
    masked_scores = jnp.where(valid, scores, -1.0)
    top_scores, top_idx = jax.lax.top_k(masked_scores, k)
    return (boxes[top_idx], keypoints[top_idx], top_scores,
            top_scores > 0.0)


def _emit_slab(leader, blended, top_kp, top_scores, k: int, d: int):
    """Leader mask + blended boxes -> the fixed [D] output slab (first d
    leaders in score (=index) order, zero-padded).  Shared by both NMS
    paths."""
    idx = jnp.arange(k)
    order = jnp.argsort(jnp.where(leader, idx, k + idx))[:d]
    out_valid = leader[order]
    out_boxes = jnp.where(out_valid[:, None], blended[order], 0.0)
    out_kp = jnp.where(out_valid[:, None, None], top_kp[order], 0.0)
    out_scores = jnp.where(out_valid, top_scores[order], 0.0)
    if k < d:
        # Keep the documented fixed [D] slab even when num_candidates < D.
        pad = d - k
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_kp = jnp.pad(out_kp, ((0, pad), (0, 0), (0, 0)))
        out_scores = jnp.pad(out_scores, ((0, pad),))
        out_valid = jnp.pad(out_valid, ((0, pad),))
    return out_boxes, out_kp, out_scores, out_valid


def weighted_nms(boxes, keypoints, scores, valid, *, max_detections: int,
                 num_candidates: Optional[int] = None,
                 iou_threshold: float = NMS_IOU):
    """Fixed-shape weighted (blended) NMS.

    Candidates are processed in descending score order.  Each unsuppressed
    candidate leads a cluster of all remaining candidates with IoU strictly
    greater than ``iou_threshold``; the emitted box is the score-weighted
    average of the cluster, while score and keypoints come from the leader
    (the reference keeps the max-score member's keypoints,
    `helpers.dart:211-218`).

    ``num_candidates`` defaults to ALL anchors — the reference clusters
    every anchor above threshold (`helpers.dart:183-221`), so a smaller cap
    is a speed knob that can change blended boxes in dense crowds; pass it
    explicitly if you want the trade.

    Returns (boxes [D,4], keypoints [D,6,2], scores [D], valid [D]).
    """
    k = scores.shape[0] if num_candidates is None \
        else min(num_candidates, scores.shape[0])
    top_boxes, top_kp, top_scores, top_valid = _topk_candidates(
        boxes, keypoints, scores, valid, k)

    iou = _iou_matrix(top_boxes)  # [k, k]
    overlap = (iou > iou_threshold) & top_valid[None, :]  # strict >

    # Pass 1: which candidates lead a cluster.  Greedy semantics — a
    # candidate leads iff no earlier (higher-score) LEADER overlaps it —
    # computed as a fixpoint instead of a k-step sequential loop: iterate
    # l[j] = valid[j] & !any_{i<j}(l[i] & overlap[i,j]) from l = valid.
    # After t rounds every candidate whose suppression-chain depth is < t
    # is stable (induction over the index-ordered DAG), so the loop
    # converges in O(longest chain) dense [k,k] VPU rounds — 2-4 in
    # practice — instead of k scalar steps (the k=2304 full-range slab
    # would pay 2304 sequential steps; see docs/PERF.md).
    idx = jnp.arange(k)
    upper = overlap & (idx[:, None] < idx[None, :])  # i suppresses j>i

    def cond(state):
        _, changed, it = state
        return changed & (it < k)

    def body(state):
        l, _, it = state
        sup = jnp.any(l[:, None] & upper, axis=0)
        l2 = top_valid & ~sup
        return l2, jnp.any(l2 != l), it + 1

    leader, _, _ = jax.lax.while_loop(
        cond, body, (top_valid, jnp.bool_(True), jnp.int32(0)))

    # Ownership: candidate j belongs to the FIRST (lowest-index) leader
    # whose row overlaps it — exactly the greedy cluster assignment,
    # because greedy removes j at the first overlapping leader.
    owner_key = jnp.where(leader[:, None] & overlap, idx[:, None], k)
    owner = jnp.min(owner_key, axis=0)  # [k] first owning leader (k = none)

    # Blended boxes per leader: score-weighted average over owned members.
    member_w = jnp.where((owner[None, :] == idx[:, None]),
                         top_scores[None, :], 0.0)  # [leader, member]
    wsum = jnp.maximum(member_w.sum(axis=1, keepdims=True), 1e-12)
    # precision: a bare matmul is ALLOWED to run bf16 on the TPU MXU —
    # ~2^-9 relative on [0,1] coords would be ~1-2 px at 1280 px width,
    # past the <=0.5 px detection budget.  The measured 0.031 px worst
    # box at the "high" tier (docs/PERF.md frac sweep) implies XLA was
    # lowering this narrow-N dot in fp32 anyway, but that is an
    # implementation accident of one backend/shape; pin HIGHEST
    # explicitly like every other parity-critical dot in the repo (the
    # CPU-pinned suite cannot distinguish the two).
    blended = jnp.matmul(member_w, top_boxes,
                         precision=jax.lax.Precision.HIGHEST) / wsum  # [k,4]

    # Emit the first max_detections leaders in score (=index) order.
    return _emit_slab(leader, blended, top_kp, top_scores, k,
                      max_detections)


def remove_letterbox(boxes, keypoints, padding):
    """Undoes letterbox padding: (v - pad_lo) / (1 - pad_lo - pad_hi).

    ``padding`` is (top, bottom, left, right) in normalized units,
    matching `helpers.dart:101-136`.  Static per image bucket.
    """
    pt, pb, pl, pr = padding
    sx = 1.0 - (pl + pr)
    sy = 1.0 - (pt + pb)
    boxes = jnp.stack([
        (boxes[..., 0] - pl) / sx,
        (boxes[..., 1] - pt) / sy,
        (boxes[..., 2] - pl) / sx,
        (boxes[..., 3] - pt) / sy,
    ], axis=-1)
    keypoints = jnp.stack([
        (keypoints[..., 0] - pl) / sx,
        (keypoints[..., 1] - pt) / sy,
    ], axis=-1)
    return boxes, keypoints


def detection_postprocess(raw_boxes, raw_scores, anchors, input_size, padding,
                          *, max_detections: int = 16,
                          num_candidates: Optional[int] = None):
    """decode -> weighted NMS -> letterbox removal, for one image.

    vmap over the batch axis; all shapes static.
    """
    boxes, kp, scores, valid = decode_detections(
        raw_boxes, raw_scores, anchors, input_size)
    boxes, kp, scores, valid = weighted_nms(
        boxes, kp, scores, valid,
        max_detections=max_detections, num_candidates=num_candidates)
    boxes, kp = remove_letterbox(boxes, kp, padding)
    return boxes, kp, scores, valid
