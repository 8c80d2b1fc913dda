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
equality.  Mosaic relayouts non-aligned shapes itself; k=128 uses
~80 KB VMEM.  The kernel holds several [k, k] f32 intermediates, so it is
sized for candidate caps around 128-512; above ``PALLAS_MAX_K`` the
wrapper falls back to the XLA fixpoint (identical outputs) rather than
blowing VMEM at full-range anchor counts (k=2304 -> ~21 MB per [k, k]).
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
    # precision: preferred_element_type only sets the OUTPUT dtype — a
    # bare dot MAY multiply bf16 on the MXU (~1-2 px on 1280 px frames
    # per blended cluster), the parity hazard detections.py pins HIGHEST
    # for.  Same guard here; the CPU interpret-mode equality test can't
    # see it (precision is a no-op off-device).
    blended = jnp.dot(member_w, boxes,
                      precision=jax.lax.Precision.HIGHEST,
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


#: Above this candidate count the kernel's [k, k] VMEM intermediates
#: (~k*k*4 bytes each, several live at once) stop fitting on-chip and the
#: in-kernel k-step scan dominates anyway; the wrapper falls back to the
#: XLA fixpoint, which handles full-range anchor counts (2304) fine.
PALLAS_MAX_K = 512


def weighted_nms_pallas(boxes, keypoints, scores, valid, *,
                        max_detections: int, num_candidates=None,
                        iou_threshold: float = NMS_IOU,
                        interpret: bool = False):
    """Drop-in replacement for ``detections.weighted_nms`` using the
    Pallas core.  Same outputs: (boxes [D,4], kp [D,...], scores [D],
    valid [D]).  ``num_candidates=None`` considers all anchors (parity
    default, matching ``detections.weighted_nms``) — but candidate counts
    above ``PALLAS_MAX_K`` route to the XLA path (identical outputs;
    the kernel's [k, k] VMEM working set is sized for latency-path caps,
    not the 2304-anchor full-range slab)."""
    from .detections import _emit_slab, _topk_candidates, weighted_nms
    k = scores.shape[0] if num_candidates is None \
        else min(num_candidates, scores.shape[0])
    if k > PALLAS_MAX_K:
        return weighted_nms(boxes, keypoints, scores, valid,
                            max_detections=max_detections,
                            num_candidates=num_candidates,
                            iou_threshold=iou_threshold)
    top_boxes, top_kp, top_scores, top_valid = _topk_candidates(
        boxes, keypoints, scores, valid, k)

    leader, blended = nms_core_pallas(top_boxes, top_scores, top_valid,
                                      iou_threshold, interpret=interpret)
    return _emit_slab(leader, blended, top_kp, top_scores, k,
                      max_detections)
