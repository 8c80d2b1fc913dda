"""Throughput serving executor: decode ∥ H2D ∥ compute pipelining.

The runtime layer around the compiled programs.  The reference hides stage
latency inside Dart isolates (`face_detector.dart:1327,1587`); the TPU
equivalent is a small pipelined executor: a host thread pool decodes
images (native JPEG/PNG/WebP pool), batches transfer to the device while the
previous batch computes (XLA dispatch is async), and results materialize
on a consumer thread.  Steady-state throughput is then
max(decode, H2D, compute) instead of their sum.

    pipe = ServingPipeline(detector, mode=FaceDetectionMode.STANDARD)
    futures = [pipe.submit(jpeg_bytes_batch) for batch in stream]
    faces = futures[0].result()     # list[list[Face]]
    pipe.close()
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Optional
import jax
import jax.numpy as jnp
import numpy as np

from .config import FaceDetectionMode

__all__ = ["ServingPipeline"]


class ServingPipeline:
    """Two-stage pipelined executor over a FaceDetector.

    Stage 1 (submit thread pool): decode + host batch assembly + H2D.
    Stage 2 (dispatch thread): program dispatch + readback + materialize.
    ``depth`` bounds BOTH queues: at most ``depth`` submitted batches wait
    undispatched (submission blocks beyond that) and at most ``depth``+1
    dispatched batches are in flight on the device — so total live
    batches <= 2*depth+1 (bounded memory, the FrameThrottle analog for
    offline streams).  Cancelling a still-queued Future works; once its
    batch is dispatched a Future can no longer be cancelled.
    """

    def __init__(self, detector, mode: FaceDetectionMode =
                 FaceDetectionMode.STANDARD, depth: int = 2,
                 with_segmentation: bool = False, device=None):
        self._det = detector
        self._mode = mode
        #: Optional chip pinning: all of this pipeline's compute runs on
        #: ``device`` with a replica weight copy (see ReplicaPool, the
        #: multi-chip throughput pool).  None = default device.
        self._device = device
        if device is not None and with_segmentation:
            raise ValueError(
                "device= pinning is detection-only; place segmentation "
                "with SelfieSegmentation.place_on / seg_device instead")
        if depth < 1:
            # queue.Queue(maxsize=0) would mean UNBOUNDED, silently
            # voiding the documented 2*depth+1 memory bound.
            raise ValueError(f"depth must be >= 1, got {depth}")
        self._depth = depth
        #: When set, each Future resolves to list[(faces, mask)] instead
        #: of list[faces]: the mask program dispatches before detection
        #: so both rides the same pipelined stream (the reference's
        #: combined detect∥segment, `face_detector.dart:1297-1324`,
        #: continuous-stream form).
        self._with_segmentation = with_segmentation
        if with_segmentation and detector._segmentation is None:
            # Honor the detector's configured model/preset, exactly like
            # its own lazy-load sites.
            detector._load_segmentation(detector._segmentation_model)
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._closed = False
        self._submit_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, images, orig_sizes=None) -> Future:
        """Enqueues a batch; returns a Future of list[list[Face]] (or
        list[(list[Face], SegmentationMask)] with ``with_segmentation``).

        ``images`` may be encoded JPEG bytes (list[bytes]), a numpy
        [B, H, W, 3] batch, or an already device-resident jax array.
        Decode and the H2D transfer happen on the caller thread so they
        overlap the device compute of earlier batches.
        ``orig_sizes`` (list of per-image (w, h)) marks a batch whose
        images were pre-padded into one shared size bucket — outputs
        rescale to each image's own dimensions (mixed-size serving).
        """
        return self._submit_impl(images, block=True,
                                 orig_sizes=orig_sizes)

    def try_submit(self, images, orig_sizes=None) -> Optional[Future]:
        """Like :meth:`submit`, but returns None instead of blocking when
        the bounded queue is full (ReplicaPool uses this to fail over to
        another chip's pipeline rather than stalling every stream behind
        one slow/wedged replica)."""
        return self._submit_impl(images, block=False,
                                 orig_sizes=orig_sizes)

    def _submit_impl(self, images, block: bool,
                     orig_sizes=None) -> Optional[Future]:
        if isinstance(images, (list, tuple)) and images and \
                isinstance(images[0], (bytes, bytearray)):
            from ..utils.image import decode_images
            images = np.stack(decode_images(list(images)))
        if self._device is not None:
            # H2D straight to the pinned chip (device_put on an array
            # already resident there is a no-op).  Stack list inputs
            # first: device_put would map over a list as a pytree.
            if not isinstance(images, jax.Array):
                images = np.asarray(images)
            images = jax.device_put(images, self._device)
        elif not isinstance(images, jax.Array):
            images = jnp.asarray(np.asarray(images))  # H2D now, async
        # Validate shape eagerly so a malformed batch raises HERE rather
        # than poisoning the worker's pipelined stream (shape-only: the
        # worker's _prepare_batch does the actual normalization; running
        # it here too would dispatch discarded device ops per batch).
        from ..utils.image import validate_batch_shape
        validate_batch_shape(images.shape)
        fut: Future = Future()
        # Tag which executor will run this batch: completion-time
        # consumers (the FaceServer adaptive cap's completion-gap
        # estimator) need a per-executor stream identity, and under
        # ReplicaPool the pool hands out ITS PIPES' futures — the tag
        # makes each chip its own stream without the pool's help.
        fut.fdt_stream = id(self)
        # The closed check and enqueue are atomic w.r.t. close(), so a
        # batch can never land behind the shutdown sentinel (which would
        # leave its Future unresolved forever).
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("ServingPipeline is closed")
            if block:
                self._q.put((images, orig_sizes, fut))
            else:
                try:
                    self._q.put_nowait((images, orig_sizes, fut))
                except queue.Full:
                    return None
        return fut

    def _run(self):
        # Two-phase pipelining UNDER LOAD: while more batches are queued,
        # the next batch's detect program dispatches before this batch's
        # face stages block; when the queue is empty, pending work
        # finishes immediately (a lone submission never waits for
        # company).  Futures resolve in submit order.
        import collections
        pending: collections.deque = collections.deque()

        def finish_one():
            fut, handle, seg_handle = pending.popleft()
            try:
                result = self._det._stream_finish(handle, self._mode)
                if seg_handle is not None:
                    masks = self._det._segmentation.materialize(seg_handle)
                    result = list(zip(result, masks))
            except Exception as e:
                if not fut.cancelled():
                    fut.set_exception(e)
                return
            if not fut.cancelled():
                fut.set_result(result)

        while True:
            try:
                item = self._q.get(block=not pending)
            except queue.Empty:
                finish_one()
                continue
            if item is None:
                break
            images, orig_sizes, fut = item
            # Transition QUEUED -> RUNNING; a Future the caller cancelled
            # while queued is skipped here.  Once RUNNING, cancel() can no
            # longer succeed, so the set_result/set_exception in
            # finish_one cannot race a cancellation (an InvalidStateError
            # there would kill this worker and wedge the pipeline).
            if not fut.set_running_or_notify_cancel():
                continue
            try:
                # Mask program first: it is in flight while the fused
                # detect program dispatches (host-stage overlap).
                seg_handle = (
                    self._det._segmentation.dispatch(images)
                    if self._with_segmentation and images.shape[0]
                    else None)
                pending.append(
                    (fut, self._det._stream_dispatch(
                        images, self._mode, device=self._device,
                        orig_sizes=orig_sizes),
                     seg_handle))
            except Exception as e:
                fut.set_exception(e)
            if len(pending) > self._depth:
                finish_one()
        while pending:
            finish_one()

    def close(self, wait: bool = True) -> None:
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)
        if wait:
            self._worker.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
