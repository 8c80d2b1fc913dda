"""Multi-chip replica serving: independent batches on independent chips.

Two multi-chip shapes exist, matching two deployment goals:

* ``parallel/sharding.py`` (``data_parallel=True``) shards ONE batch
  across the mesh with pjit — lower latency per batch, one program
  execution in flight.
* This module replicates the detector's weights per chip and runs a
  pinned :class:`~..pipeline.serving.ServingPipeline` on each — N
  independent program executions in flight, throughput ≈ N × one chip
  for independent request streams.  This is the production serving
  shape, and the TPU analog of the reference's isolate pool
  (`face_detector_core.dart:151-166` runs 3 FaceMesh interpreters for
  the same reason: independent work wants independent executors).

Weights are ~12 MB (`FaceDetector.memory_report`), so a per-chip copy
is trivial; no collectives are involved — each chip computes alone, the
zero-steady-state-communication design SURVEY §2.4 calls for.

    pool = ReplicaPool(detector)                # all visible devices
    futures = [pool.submit(batch) for batch in stream]   # round-robin
    results = [f.result() for f in futures]     # in submit order
    pool.close()
"""

from __future__ import annotations

import threading
from concurrent.futures import Future
from typing import Optional, Sequence

import jax
import numpy as np

from ..pipeline.config import FaceDetectionMode
from ..pipeline.serving import ServingPipeline

__all__ = ["ReplicaPool"]


class ReplicaPool:
    """Round-robin pool of device-pinned serving pipelines.

    Each visible device gets a replica copy of ``detector``'s weights
    (`FaceDetector._replica_params`) and its own pipelined executor;
    ``submit`` distributes batches round-robin.  Futures resolve
    independently (a slow chip delays only its own batches); per-caller
    submit order is preserved per device and overall order is restored
    by consuming futures in submit order, as with ServingPipeline.
    """

    def __init__(self, detector,
                 devices: Optional[Sequence] = None,
                 mode: FaceDetectionMode = FaceDetectionMode.STANDARD,
                 depth: int = 2):
        if getattr(detector, "_mesh", None) is not None:
            raise ValueError(
                "ReplicaPool replicates per chip; it cannot wrap a "
                "data_parallel detector (which shards each batch across "
                "the mesh instead — pick one shape)")
        devices = list(devices if devices is not None else jax.devices())
        if not devices:
            raise ValueError("no devices to replicate onto")
        self._devices = devices
        # Materialize every replica's weights BEFORE accepting traffic so
        # the first batch per chip doesn't pay the copy.
        for d in devices:
            detector._replica_params(d)
        self._pipes = [ServingPipeline(detector, mode, depth=depth,
                                       device=d) for d in devices]
        self._next = 0
        self._lock = threading.Lock()
        self._closed = False
        #: Per-replica dispatch counters (index-aligned with devices):
        #: accepted = batches enqueued on this chip; skipped = times its
        #: full queue made a submit fail over past it.
        self._accepted = [0] * len(devices)
        self._skipped = [0] * len(devices)

    @property
    def num_replicas(self) -> int:
        return len(self._devices)

    @property
    def stats(self) -> list:
        """Per-replica load counters, for balance/health visibility:
        ``[{"device", "accepted", "skipped_full"}, ...]``.  A replica
        whose ``skipped_full`` climbs while ``accepted`` stalls is slow
        or wedged (its queue stays full)."""
        with self._lock:
            return [{"device": str(d), "accepted": a, "skipped_full": s}
                    for d, a, s in zip(self._devices, self._accepted,
                                       self._skipped)]

    def submit(self, images, orig_sizes=None) -> Future:
        """Enqueues one batch on the next chip (round-robin); returns a
        Future of list[list[Face]].  Accepts what ServingPipeline.submit
        accepts (encoded bytes list / numpy / device array, plus
        ``orig_sizes`` for bucket-padded mixed-size batches).

        A replica whose bounded queue is full (slow — or wedged, which
        the TPU relay is documented to do) is SKIPPED in favor of the
        next chip, so one bad replica delays only batches already queued
        on it; a submit blocks only when every replica's queue is full
        (backpressure, preserving the pool-wide memory bound)."""
        if isinstance(images, (list, tuple)) and images and \
                isinstance(images[0], (bytes, bytearray)):
            # Decode ONCE on the caller thread; a full-queue failover
            # must not re-decode per attempted replica.
            from ..utils.image import decode_images
            images = np.stack(decode_images(list(images)))
        with self._lock:
            if self._closed:
                raise RuntimeError("ReplicaPool is closed")
            start = self._next
            self._next = (self._next + 1) % len(self._pipes)
        for i in range(len(self._pipes)):
            k = (start + i) % len(self._pipes)
            fut = self._pipes[k].try_submit(images, orig_sizes=orig_sizes)
            if fut is not None:
                with self._lock:
                    self._accepted[k] += 1
                return fut
            with self._lock:
                self._skipped[k] += 1
        fut = self._pipes[start].submit(images, orig_sizes=orig_sizes)
        with self._lock:
            self._accepted[start] += 1
        return fut

    def map_batches(self, batches) -> list:
        """Convenience: submits every batch, returns results in order."""
        futs = [self.submit(b) for b in batches]
        return [f.result() for f in futs]

    def close(self, wait: bool = True) -> None:
        with self._lock:
            if self._closed:
                return
            self._closed = True
        for p in self._pipes:
            p.close(wait=wait)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
