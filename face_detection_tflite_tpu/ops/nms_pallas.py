"""Weighted NMS core as a single Pallas TPU kernel.

The XLA formulation in ``detections.weighted_nms`` runs the sequential
leader scan as a ``lax.fori_loop`` — k tiny HLO loop iterations with
per-step control overhead.  Here the entire NMS core (pairwise IoU,
leader scan, cluster ownership, score-weighted box blending) is ONE
kernel: the [k, k] IoU matrix lives in VMEM/registers, the scan runs
in-kernel with zero per-step dispatch, and the final blend is an MXU
matmul ([k, k] weights x [k, 4] boxes).

Semantics are identical to the XLA path (strict IoU >, leader keeps its
own score/keypoints, members blend into the leader's box — reference
`helpers.dart:183-221`); ``tests/test_nms_pallas.py`` pins kernel-vs-XLA
equality.  Candidate counts are padded to the fp32 sublane size (8) and
boxes to lane width where needed; k=128 uses ~80 KB VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .detections import NMS_IOU

__all__ = ["nms_core_pallas", "weighted_nms_pallas"]


def _nms_kernel(boxes_ref, scores_ref, valid_ref, iou_threshold_ref,
                leader_ref, blended_ref):
    boxes = boxes_ref[:]          # [k, 4] f32
    scores = scores_ref[:]        # [k, 1] f32
    valid = valid_ref[:] > 0.5    # [k, 1] f32 -> bool
    thr = iou_threshold_ref[0]

    k = boxes.shape[0]
    x0 = boxes[:, 0:1]
    y0 = boxes[:, 1:2]
    x1 = boxes[:, 2:3]
    y1 = boxes[:, 3:4]
    area = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)  # [k,1]

    ix0 = jnp.maximum(x0, x0.T)
    iy0 = jnp.maximum(y0, y0.T)
    ix1 = jnp.minimum(x1, x1.T)
    iy1 = jnp.minimum(y1, y1.T)
    inter = jnp.maximum(ix1 - ix0, 0.0) * jnp.maximum(iy1 - iy0, 0.0)
    union = area + area.T - inter
    iou = jnp.where(union > 0.0, inter / union, 0.0)     # [k, k]
    # Masks stay float 0/1 throughout — Mosaic cannot transpose or freely
    # relayout i1 vectors; AND becomes *, OR becomes max, ANY becomes max().
    validf = valid.astype(jnp.float32)                    # [k, 1]
    overlap = ((iou > thr).astype(jnp.float32)
               * validf.reshape(1, k))                    # [k, k]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    # Sequential greedy leader scan — in-register, no HLO loop overhead.
    # Mosaic has no value-level dynamic_slice; the i-th row is selected
    # with a masked max-reduction instead (k^2 VPU ops per step).
    def body(i, state):
        suppressed, leader = state  # [k, 1] f32 0/1
        at_i = (row_ids == i).astype(jnp.float32)  # [k, 1]
        sup_i = jnp.max(at_i * suppressed)
        val_i = jnp.max(at_i * validf)
        is_leader = (1.0 - sup_i) * val_i  # scalar 0/1
        # row i of overlap, already transposed to a column: [k, 1]
        row_col = jnp.max(overlap * at_i, axis=0).reshape(k, 1)
        suppressed = jnp.maximum(suppressed, is_leader * row_col)
        leader = jnp.maximum(leader, is_leader * at_i)
        return suppressed, leader

    init = (jnp.zeros((k, 1), jnp.float32), jnp.zeros((k, 1), jnp.float32))
    _, leader = jax.lax.fori_loop(0, k, body, init)

    # Ownership: member j belongs to the first (lowest-index) leader row
    # overlapping it; then blend member boxes into each leader on the MXU.
    lead_overlap = leader * overlap                       # [k, k] 0/1
    owner_key = jnp.where(lead_overlap > 0.5,
                          row_ids.astype(jnp.float32),
                          jnp.float32(k))                 # [k, k]
    owner = jnp.min(owner_key, axis=0, keepdims=True)     # [1, k]
    # member_w[i, j] = score_j if leader i owns member j.  The row index is
    # a broadcasted float iota (avoids any transpose of an int vector).
    li = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0).astype(jnp.float32)
    member_w = jnp.where(owner == li, scores.reshape(1, k), 0.0)
    wsum = jnp.maximum(jnp.sum(member_w, axis=1, keepdims=True), 1e-12)
    blended = jnp.dot(member_w, boxes,
                      preferred_element_type=jnp.float32) / wsum

    leader_ref[:] = leader
    blended_ref[:] = blended


@functools.partial(jax.jit, static_argnames=("interpret",))
def nms_core_pallas(boxes, scores, valid, iou_threshold=0.3,
                    interpret: bool = False):
    """(leader mask [k], blended boxes [k, 4]) for score-sorted candidates.

    Inputs must already be sorted by descending score (as produced by
    ``lax.top_k``).  ``interpret=True`` runs the kernel in interpreter mode
    (CPU-testable).
    """
    k = boxes.shape[0]
    leader, blended = pl.pallas_call(
        _nms_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
            jax.ShapeDtypeStruct((k, 4), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        boxes.astype(jnp.float32),
        scores.astype(jnp.float32).reshape(k, 1),
        valid.astype(jnp.float32).reshape(k, 1),
        jnp.asarray([iou_threshold], jnp.float32),
    )
    return leader.reshape(k) > 0.5, blended


def weighted_nms_pallas(boxes, keypoints, scores, valid, *,
                        max_detections: int, num_candidates=None,
                        iou_threshold: float = NMS_IOU,
                        interpret: bool = False):
    """Drop-in replacement for ``detections.weighted_nms`` using the
    Pallas core.  Same outputs: (boxes [D,4], kp [D,...], scores [D],
    valid [D]).  ``num_candidates=None`` considers all anchors (parity
    default, matching ``detections.weighted_nms``)."""
    k = scores.shape[0] if num_candidates is None \
        else min(num_candidates, scores.shape[0])
    masked_scores = jnp.where(valid, scores, -1.0)
    top_scores, top_idx = jax.lax.top_k(masked_scores, k)
    top_boxes = boxes[top_idx]
    top_kp = keypoints[top_idx]
    top_valid = top_scores > 0.0

    leader, blended = nms_core_pallas(top_boxes, top_scores, top_valid,
                                      iou_threshold, interpret=interpret)

    d = max_detections
    idx = jnp.arange(k)
    order = jnp.argsort(jnp.where(leader, idx, k + idx))[:d]
    out_valid = leader[order]
    out_boxes = jnp.where(out_valid[:, None], blended[order], 0.0)
    out_kp = jnp.where(out_valid[:, None, None], top_kp[order], 0.0)
    out_scores = jnp.where(out_valid, top_scores[order], 0.0)
    if k < d:
        # Fixed [D] slab even when num_candidates < D (see weighted_nms).
        pad = d - k
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_kp = jnp.pad(out_kp, ((0, pad), (0, 0), (0, 0)))
        out_scores = jnp.pad(out_scores, ((0, pad),))
        out_valid = jnp.pad(out_valid, ((0, pad),))
    return out_boxes, out_kp, out_scores, out_valid
