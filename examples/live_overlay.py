#!/usr/bin/env python
"""Live camera overlay demo — the FaceDetectionCameraOverlay analog.

Simulates a camera stream (jittered frames of a sample photo), runs
detect+segment per frame, and composes the reference widget's layer stack
(`overlay_painters.dart:1045`): virtual background OR segmentation tint,
boxes/contours/irises, per-face info cards with pose + classification,
and a performance badge.  Writes an animated GIF.

    python examples/live_overlay.py [input.jpg [out.gif]] [--virtual-bg]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from face_detection_tflite_tpu.utils.backend import ensure_backend
    ensure_backend()

    from PIL import Image

    from face_detection_tflite_tpu import (FaceDetectionMode,
                                           FaceDetectionModel, FaceDetector)
    from face_detection_tflite_tpu import resolve_model_dir
    from face_detection_tflite_tpu.utils.image import load_image
    from face_detection_tflite_tpu.utils.render import compose_camera_overlay

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    virtual_bg = "--virtual-bg" in sys.argv
    src = (args[0] if args else
           os.path.join(os.path.dirname(resolve_model_dir()),
                        "samples", "landmark-ex1.jpg"))
    dst = args[1] if len(args) > 1 else "live_overlay_out.gif"

    base = load_image(src)
    det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                       with_segmentation=True, enable_tracking=True)
    det.detect_faces(base, FaceDetectionMode.FULL)  # compile

    background = None
    if virtual_bg:
        # Synthetic gradient "beach" background.
        h, w = base.shape[:2]
        yy = np.linspace(0, 1, h)[:, None, None]
        background = (np.asarray([80, 160, 230]) * (1 - yy)
                      + np.asarray([230, 200, 120]) * yy).astype(np.uint8)
        background = np.broadcast_to(background, (h, w, 3)).copy()

    rng = np.random.default_rng(0)
    frames = []
    for i in range(12):
        frame = np.roll(base, int(rng.integers(-10, 10)), axis=1)
        t0 = time.perf_counter()
        faces, mask = det.detect_faces_with_segmentation(
            frame, mode=FaceDetectionMode.FULL)
        ms = (time.perf_counter() - t0) * 1e3
        out = compose_camera_overlay(
            frame, faces, mask=mask, virtual_background=background,
            show_segmentation=True, show_pose_and_scores=True,
            show_classification=True, detect_ms=ms)
        frames.append(Image.fromarray(out))
        ids = [f.tracking_id for f in faces]
        print(f"frame {i:2d}: {len(faces)} face(s) ids={ids} {ms:6.1f} ms")

    frames[0].save(dst, save_all=True, append_images=frames[1:],
                   duration=120, loop=0)
    print(f"wrote {dst} ({len(frames)} frames)")
    det.dispose()


if __name__ == "__main__":
    main()
