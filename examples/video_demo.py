#!/usr/bin/env python
"""Video-file pipeline demo: batched detection + tracking + smoothing.

Runs the full pipeline over a video file (decode prefetched on a host
thread, frames batched on device), applies temporal tracking and EMA
landmark smoothing, and writes an annotated copy.

    python examples/video_demo.py input.mp4 [output.mp4]

Analog of the reference example app's video flow (overlay painters +
FaceSmoother in `example/lib/main.dart`).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    src = sys.argv[1]
    dst = sys.argv[2] if len(sys.argv) > 2 else "annotated.mp4"

    # Backend init only after the usage check: a bare invocation should
    # print help instantly, not probe a (possibly wedged) TPU relay.
    from face_detection_tflite_tpu.utils.backend import ensure_backend
    ensure_backend()
    from face_detection_tflite_tpu import (FaceDetectionMode,
                                           FaceDetectionModel, FaceDetector,
                                           FaceSmoother)
    from face_detection_tflite_tpu.utils.render import annotate

    import cv2

    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        sys.exit(f"cannot open {src}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()

    det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                       enable_tracking=True)
    smoother = FaceSmoother(alpha=0.5)

    if w <= 0 or h <= 0:
        sys.exit(f"{src}: container reports {w}x{h} frames")
    writer = cv2.VideoWriter(dst, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
    if not writer.isOpened():
        sys.exit(f"cannot open video writer for {dst} (mp4v encoder "
                 "missing?) — every write would be a silent no-op")
    # Results arrive in strict frame order, so a second capture reads the
    # frames incrementally in step with the result stream — O(1) memory
    # (pre-decoding a whole video would hold gigabytes of frames).
    cap = cv2.VideoCapture(src)
    frame_idx = -1
    frame = None

    def frame_at(i):
        nonlocal frame_idx, frame
        while frame_idx < i:
            good, frame = cap.read()
            if not good:
                raise RuntimeError(f"frame {i} unreadable on second pass")
            frame_idx += 1
        return frame

    for result in det.detect_faces_from_video(
            src, FaceDetectionMode.FULL, batch_size=8):
        faces = smoother.smooth(result.faces)
        rgb = frame_at(result.frame_index)[..., ::-1]
        out = annotate(np.ascontiguousarray(rgb), faces)
        writer.write(np.ascontiguousarray(out[..., ::-1]))
        if result.frame_index % 24 == 0:
            print(f"frame {result.frame_index}: {len(faces)} faces, "
                  f"ids={[f.tracking_id for f in faces]}")
    cap.release()
    writer.release()
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
