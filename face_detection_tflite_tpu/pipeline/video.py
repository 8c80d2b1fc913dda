"""Video-file and camera-stream processing.

Analog of the reference's `detectFacesFromVideo` (`face_detector.dart`) and
flutter_litert's `FrameThrottle` (README.md:734-761): video frames batch
through the compiled pipeline (the TPU win — the reference processes one
frame per isolate round-trip), while tracking is applied per frame in
stream order on the host.
"""

from __future__ import annotations

import collections
import dataclasses
import threading
import time
from typing import Iterator, Optional

import numpy as np

from .config import FaceDetectionMode
from .types import Face

__all__ = ["VideoFrameResult", "process_video", "FrameThrottle"]


@dataclasses.dataclass
class VideoFrameResult:
    frame_index: int
    timestamp_s: float
    faces: list[Face]


def _read_frames(path: str, frame_stride: int, max_frames: Optional[int],
                 max_dim: Optional[int] = None):
    import cv2
    if frame_stride < 1:
        raise ValueError(f"frame_stride must be >= 1, got {frame_stride}")
    if max_frames is not None and max_frames <= 0:
        return  # a zero/negative budget yields nothing (not one frame)
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise ValueError(f"cannot open video: {path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    idx = 0
    emitted = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if idx % frame_stride == 0:
                # BGR -> RGB as a view: cap.read() returns a fresh array
                # per frame, and every consumer (np.stack batching, H2D
                # jnp.asarray) copies anyway — an eager .copy() here just
                # doubled host memcpy traffic on the decode hot path.
                rgb = frame[..., ::-1]
                if max_dim is not None and max_dim > 0:
                    from ..utils.image import fit_max_dim
                    rgb = fit_max_dim(rgb, max_dim)
                yield idx, idx / fps, rgb
                emitted += 1
                if max_frames is not None and emitted >= max_frames:
                    break
            idx += 1
    finally:
        cap.release()


def process_video(detector, path: str,
                  mode: FaceDetectionMode = FaceDetectionMode.FULL,
                  *, frame_stride: int = 1, batch_size: int = 8,
                  max_frames: Optional[int] = None,
                  max_dim: Optional[int] = None,
                  devices: Optional[list] = None
                  ) -> Iterator[VideoFrameResult]:
    """Runs the detector over a video file, batching frames on device.

    Frames are grouped into device batches of ``batch_size``; temporal
    tracking (when enabled on the detector) is applied afterwards in frame
    order, preserving the reference's sequential-tracking semantics while
    the heavy compute stays batched.  ``max_dim`` downscales each frame
    so the longer side fits (the camera paths' ``maxDim`` knob,
    `helpers.dart:488-493`, extended to video: bounds the per-size
    program compile cost for 4K footage; face coordinates are then in
    the downscaled frame).

    Host decode runs on a prefetch thread one batch ahead of the device:
    cv2's decode and XLA's blocking wait both release the GIL, so frame
    N+1's decode overlaps frame N's compute instead of serializing with it.

    ``devices`` spreads consecutive frame batches round-robin over a
    per-chip replica pool (`parallel/replica.ReplicaPool`): up to
    ``len(devices)+1`` batches compute concurrently while results — and
    therefore tracking — still drain in frame order (detection is
    stateless; tracking is a host-side attach, so batch N+1 never needs
    batch N's tracker state before ITS attach runs).
    """
    import queue as _queue

    stop = threading.Event()
    q: _queue.Queue = _queue.Queue(maxsize=max(2 * batch_size, 2))
    reader_error: list[BaseException] = []

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except _queue.Full:
                continue
        return False

    def _reader():
        try:
            for item in _read_frames(path, frame_stride, max_frames,
                                     max_dim):
                if not _put(item):
                    return
        except BaseException as e:  # surfaced on the consumer thread
            reader_error.append(e)
        finally:
            _put(None)

    pool = None
    inflight: collections.deque = collections.deque()
    if devices:
        # BEFORE the prefetch thread starts: a pool-init failure (e.g. a
        # data_parallel detector) must not leave a reader thread spinning
        # against the bounded queue with an open VideoCapture.
        from ..parallel.replica import ReplicaPool
        pool = ReplicaPool(detector, devices=devices, mode=mode)
    max_inflight = (len(devices) + 1) if devices else 1

    thread = threading.Thread(target=_reader, daemon=True,
                              name="fdt-video-prefetch")
    thread.start()

    pending: list[tuple[int, float, np.ndarray]] = []

    def emit(metas, gen0, per_frame):
        for (fi, ts), faces in zip(metas, per_frame):
            faces = detector._attach_tracking(faces, gen0)
            yield VideoFrameResult(fi, ts, faces)

    def drain_oldest():
        metas, gen0, fut = inflight.popleft()
        yield from emit(metas, gen0, fut.result())

    def flush():
        if not pending:
            return
        gen0 = detector._tracking_generation  # snapshot before the batch
        batch = np.stack([f for _, _, f in pending])
        # Keep only (frame_index, timestamp) past this point: np.stack
        # already copied the pixels, and inflight entries would otherwise
        # pin every decoded frame of up to max_inflight batches.
        metas = [(fi, ts) for fi, ts, _ in pending]
        pending.clear()
        if pool is not None:
            inflight.append((metas, gen0, pool.submit(batch)))
            while len(inflight) > max_inflight:
                yield from drain_oldest()
            return
        per_frame = detector.detect_faces_batch(batch, mode)
        yield from emit(metas, gen0, per_frame)

    try:
        while True:
            item = q.get()
            if item is None:
                break
            pending.append(item)
            if len(pending) >= batch_size:
                yield from flush()
        if reader_error:
            raise reader_error[0]
        yield from flush()
        while inflight:
            yield from drain_oldest()
    finally:
        stop.set()
        if pool is not None:
            pool.close(wait=False)


class FrameThrottle:
    """Drop-oldest frame queue for live camera streams.

    Analog of flutter_litert's FrameThrottle: producers push frames at
    camera rate; the consumer always processes the freshest frame and
    stale frames are dropped rather than queued (bounded latency).
    """

    def __init__(self, maxlen: int = 1):
        self._dq: collections.deque = collections.deque(maxlen=maxlen)
        self._cv = threading.Condition()
        self._closed = False
        self.dropped = 0
        self.submitted = 0

    def submit(self, frame) -> None:
        with self._cv:
            if self._closed:
                raise RuntimeError("FrameThrottle is closed")
            if len(self._dq) == self._dq.maxlen:
                self.dropped += 1
            self._dq.append(frame)
            self.submitted += 1
            self._cv.notify()

    def take(self, timeout: Optional[float] = None):
        """Blocks for the freshest frame; returns None on close/timeout."""
        deadline = None if timeout is None else time.monotonic() + timeout
        with self._cv:
            while not self._dq and not self._closed:
                remaining = (None if deadline is None
                             else deadline - time.monotonic())
                if remaining is not None and remaining <= 0:
                    break
                if not self._cv.wait(remaining):
                    break  # timed out
            if not self._dq:
                return None
            frame = self._dq.pop()  # freshest
            self.dropped += len(self._dq)
            self._dq.clear()
            return frame

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify_all()
