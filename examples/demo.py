#!/usr/bin/env python
"""Demo: full face pipeline + segmentation on a photo, rendered to a file.

The TPU-side analog of the reference's example app still-image screen
(`example/lib/main.dart`): detect -> mesh -> iris -> blendshapes -> pose,
plus the person mask, drawn over the input.

    python examples/demo.py [input.jpg [output.png]]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from face_detection_tflite_tpu.utils.backend import ensure_backend
    ensure_backend()

    from face_detection_tflite_tpu import (FaceDetectionModel, FaceDetector)
    from face_detection_tflite_tpu import resolve_model_dir
    from face_detection_tflite_tpu.utils.image import fit_max_dim, load_image
    from face_detection_tflite_tpu.utils.render import annotate

    src = (sys.argv[1] if len(sys.argv) > 1 else
           os.path.join(os.path.dirname(resolve_model_dir()),
                        "samples", "group-shot-bounding-box-ex1.jpeg"))
    dst = sys.argv[2] if len(sys.argv) > 2 else "demo_out.png"

    det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                       with_segmentation=True)
    img = load_image(src)
    # Fit very large photos before detection, like the reference example
    # app (images are detected at display size there; the API analog is
    # the camera paths' maxDim knob).  Keeps the one-program-per-size
    # compile cost sane for 4K+ inputs: the bundled group shot is
    # 2160x3840, whose full-resolution fused program takes the relay's
    # compile service tens of minutes.
    max_dim = int(os.environ.get("FDT_DEMO_MAX_DIM", "1536"))
    h, w = img.shape[:2]
    img = fit_max_dim(img, max_dim)
    if img.shape[:2] != (h, w):
        print(f"downscaled {w}x{h} -> {img.shape[1]}x{img.shape[0]} "
              f"(FDT_DEMO_MAX_DIM={max_dim})")
    faces, mask = det.detect_faces_with_segmentation(img)

    print(f"{len(faces)} face(s) in {src} "
          f"[{det.accelerator_report['detector']}]")
    def fmt(v, spec=".2f"):
        return format(v, spec) if v is not None else "n/a"

    for i, f in enumerate(faces):
        a = f.head_euler_angles
        print(f"  face {i}: score={f.score:.3f} mesh={fmt(f.mesh_score, '.3f')} "
              f"smile={fmt(f.smiling_probability)} "
              f"eyes L{fmt(f.left_eye_open_probability)}"
              f"/R{fmt(f.right_eye_open_probability)} "
              f"pose=({a.x:.1f},{a.y:.1f},{a.z:.1f})deg")
    print("stage timings:", det.timings.report())

    out = annotate(img, faces, mask)
    from PIL import Image
    Image.fromarray(out).save(dst)
    print(f"annotated image -> {dst}")


if __name__ == "__main__":
    main()
