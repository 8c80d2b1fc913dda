#!/usr/bin/env python
"""Demo: AR lipstick overlay built from the named lip contours.

Analog of the reference example app's lipstick preview
(`example/lib/lipstick_painter.dart` + the makeup toggle in
`example/lib/main.dart`): FULL-mode mesh -> two lip rings (outer flesh,
mouth opening) -> winding-aware dilation -> Catmull-Rom smoothing ->
even-odd fill -> Skia `BlendMode.color` tint that keeps the skin's
luminance.

    python examples/lipstick_demo.py [input.jpg [output.png [RRGGBB]]]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from face_detection_tflite_tpu.utils.backend import ensure_backend
    ensure_backend()

    from face_detection_tflite_tpu import (FaceDetectionMode,
                                           FaceDetectionModel, FaceDetector,
                                           resolve_model_dir)
    from face_detection_tflite_tpu.utils.image import load_image
    from face_detection_tflite_tpu.utils.render import (LIPSTICK_COLOR,
                                                        draw_lipstick)

    src = (sys.argv[1] if len(sys.argv) > 1 else
           os.path.join(os.path.dirname(resolve_model_dir()),
                        "samples", "landmark-ex1.jpg"))
    dst = sys.argv[2] if len(sys.argv) > 2 else "lipstick_out.png"
    color = (tuple(int(sys.argv[3][i:i + 2], 16) for i in (0, 2, 4))
             if len(sys.argv) > 3 else LIPSTICK_COLOR)

    det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA)
    # Same display-size fit as demo.py (bounds per-size compile cost).
    from face_detection_tflite_tpu.utils.image import fit_max_dim
    img = fit_max_dim(load_image(src),
                      int(os.environ.get("FDT_DEMO_MAX_DIM", "1536")))
    faces = det.detect_faces(img, FaceDetectionMode.FULL)
    print(f"{len(faces)} face(s) in {src}; painting lips "
          f"#{color[0]:02X}{color[1]:02X}{color[2]:02X}")

    out = draw_lipstick(img, faces, color=color)

    from PIL import Image
    Image.fromarray(out).save(dst)
    print(f"wrote {dst}")
    det.dispose()


if __name__ == "__main__":
    main()
