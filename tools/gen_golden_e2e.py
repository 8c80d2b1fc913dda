#!/usr/bin/env python
"""Generates the committed end-to-end golden fixture
(`tests/golden_e2e.json`): full-pipeline outputs for every sample image
at the parity tier on CPU.

The per-stage parity tests (tests/oracle.py vs TFLite) pin each stage's
math; this fixture pins the WHOLE pipeline's outputs so any future
precision tier, warp change, or "optimization" that drifts end-to-end
results fails loudly (`tests/test_golden_e2e.py`) instead of relying on
per-stage coverage alone.  Reference analog: the golden-output pattern
of `blendshapes_golden_data.dart:1-9` (MediaPipe testdata reproduced as
an asserted fixture).

Regenerate ONLY after an intentional, parity-verified output change:

    python tools/gen_golden_e2e.py        # rewrites tests/golden_e2e.json
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Mesh vertex subsample for the fixture: contour corners, the head-pose
#: canonical points (10/152/234/454), eye corners (33/133/362/263), lips
#: (61/291), nose tip (4, 1), plus evenly spread interior points.
MESH_SAMPLE_IDX = [0, 1, 4, 10, 33, 61, 100, 133, 152, 199, 234, 263,
                   291, 300, 362, 400, 454, 467]


def detector_and_samples():
    import jax
    # BEFORE any device use: out-of-tree TPU plugins override the
    # JAX_PLATFORMS env var, and probing jax.devices() first would
    # initialize the accelerator backend — the fixture must be CPU fp32.
    jax.config.update("jax_platforms", "cpu")
    from face_detection_tflite_tpu import FaceDetectionModel, FaceDetector
    from face_detection_tflite_tpu.pipeline.detector import resolve_model_dir
    det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                       model_dir=resolve_model_dir(),
                       precision="highest", quantized_readback=False)
    samples_dir = os.path.join(os.path.dirname(resolve_model_dir()),
                               "samples")
    names = sorted(f for f in os.listdir(samples_dir)
                   if f.lower().endswith((".jpg", ".jpeg", ".png")))
    return det, samples_dir, names


def face_record(f) -> dict:
    r4 = lambda a: [round(float(v), 4) for v in np.asarray(a).reshape(-1)]
    b = f.bounding_box
    rec = {
        "box": r4([b.xmin, b.ymin, b.xmax, b.ymax]),
        "score": round(float(f.score), 4),
        "mesh_score": (round(float(f.mesh_score), 4)
                       if f.mesh_score is not None else None),
        "keypoints_px": r4(np.asarray(f.detection_data.keypoints_xy)
                           * [f.original_size[0], f.original_size[1]]),
        "mesh_sample_px": r4(f.mesh.points[MESH_SAMPLE_IDX]),
        "mesh_mean_px": r4(f.mesh.points.mean(axis=0)),
        "mesh_std_px": r4(f.mesh.points.std(axis=0)),
        "head_angles_deg": r4([f.head_euler_angles.x,
                               f.head_euler_angles.y,
                               f.head_euler_angles.z]),
        "blendshapes": r4(f._blendshape_scores)
        if f._blendshape_scores is not None else None,
    }
    return rec


def main() -> int:
    from face_detection_tflite_tpu import FaceDetectionMode
    from face_detection_tflite_tpu.utils.image import load_image
    det, samples_dir, names = detector_and_samples()
    fixture = {"config": {"model": "back", "mode": "full",
                          "precision": "highest",
                          "quantized_readback": False,
                          "backend": "cpu"},
               "mesh_sample_idx": MESH_SAMPLE_IDX,
               "images": {}}
    for name in names:
        img = load_image(os.path.join(samples_dir, name))
        faces = det.detect_faces(img, FaceDetectionMode.FULL)
        fixture["images"][name] = {
            "size": [img.shape[1], img.shape[0]],
            "faces": [face_record(f) for f in faces],
        }
        print(f"{name}: {len(faces)} face(s)")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden_e2e.json")
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(fixture, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
