#!/usr/bin/env python
"""Streaming demo: FrameThrottle + ServingPipeline + FpsCounter + tracking.

Simulates a camera producing frames faster than the pipeline consumes
them (the reference's live-camera scenario): stale frames drop, fresh
frames flow through the pipelined executor, tracked IDs stay stable.
"""

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from face_detection_tflite_tpu.utils.backend import ensure_backend
    ensure_backend()

    from face_detection_tflite_tpu import (FaceDetectionMode,
                                           FaceDetectionModel, FaceDetector,
                                           FpsCounter, FrameThrottle)
    from face_detection_tflite_tpu import resolve_model_dir
    from face_detection_tflite_tpu.utils.image import load_image

    src = (sys.argv[1] if len(sys.argv) > 1 else
           os.path.join(os.path.dirname(resolve_model_dir()),
                        "samples", "landmark-ex1.jpg"))
    base = load_image(src)
    det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                       enable_tracking=True)
    det.detect_faces(base, FaceDetectionMode.STANDARD)  # compile

    throttle = FrameThrottle(maxlen=1)
    n_produced = 40

    def camera():
        """Produces jittered frames at ~60 fps."""
        rng = np.random.default_rng(0)
        for i in range(n_produced):
            dx = int(rng.integers(-8, 8))
            frame = np.roll(base, dx, axis=1)
            try:
                throttle.submit((i, frame))
            except RuntimeError:
                return
            time.sleep(1 / 60)
        throttle.close()

    producer = threading.Thread(target=camera)
    producer.start()

    fps = FpsCounter()
    processed = 0
    ids = set()
    while True:
        item = throttle.take(timeout=2.0)
        if item is None:
            break
        idx, frame = item
        faces = det.detect_faces(frame, FaceDetectionMode.STANDARD)
        processed += 1
        rate = fps.tick()
        ids.update(f.tracking_id for f in faces)
        print(f"frame {idx:3d}: {len(faces)} face(s) "
              f"id={[f.tracking_id for f in faces]} fps={rate:.1f}",
              flush=True)
    producer.join()
    print(f"\nprocessed {processed}/{throttle.submitted} frames "
          f"({throttle.dropped} dropped by throttle), "
          f"stable tracking ids: {sorted(ids)}")
    print("stage timings:", det.timings.report())


if __name__ == "__main__":
    main()
