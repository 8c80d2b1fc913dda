"""Validate the 'mixed' detector precision tier on every sample fixture."""
import os
import sys

import numpy as np

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
from PIL import Image


def main():
    from face_detection_tflite_tpu.convert.executor import convert_file
    from face_detection_tflite_tpu.ops.anchors import (anchor_options_for,
                                                       generate_anchors)
    from face_detection_tflite_tpu.ops.detections import (decode_detections,
                                                          weighted_nms)
    from face_detection_tflite_tpu.ops.letterbox import (letterbox_image,
                                                         letterbox_params)
    from face_detection_tflite_tpu.pipeline.detector import resolve_model_dir

    print("device:", jax.devices()[0].platform, flush=True)
    d = resolve_model_dir()
    samples = os.path.join(os.path.dirname(d), "samples")
    names = ["landmark-ex1.jpg", "group-shot-bounding-box-ex1.jpeg",
             "iris-detection-ex1.jpg", "iris-detection-ex2.jpg",
             "mesh-ex1.jpeg", "2008-04-21 Day 13.jpg",
             "2008-04-22 Day 14.jpg"]
    imgs = [np.asarray(Image.open(os.path.join(samples, n)).convert("RGB")
                       .resize((1280, 853))) for n in names]

    anchors = jnp.asarray(generate_anchors(anchor_options_for("back")))
    p = letterbox_params(853, 1280, 256, 256)

    def make(prec):
        cm = convert_file(os.path.join(d, "face_detection_back.tflite"),
                          precision=prec)

        @jax.jit
        def run(params, image):
            x = letterbox_image(image, p)
            a, b = cm.fn(params, x[None])
            rb = (a if a.size > b.size else b).reshape(-1, 16)
            rs = (b if a.size > b.size else a).reshape(-1)
            bx, kp, sc, va = decode_detections(rb, rs, anchors, 256.0)
            return weighted_nms(bx, kp, sc, va, max_detections=16)
        return cm, run

    cm_hi, run_hi = make("highest")
    cm_mx, run_mx = make("mixed")
    worst_box = worst_kp = 0.0
    for n, img in zip(names, imgs):
        j = jnp.asarray(img)
        bh, kh, sh, vh = (np.asarray(o) for o in run_hi(cm_hi.params, j))
        bm, km, sm, vm = (np.asarray(o) for o in run_mx(cm_mx.params, j))
        vh = vh.astype(bool); vm = vm.astype(bool)
        if vh.sum() != vm.sum():
            print(f"{n}: COUNT MISMATCH {vh.sum()} vs {vm.sum()}", flush=True)
            continue
        scale = np.asarray([1280, 853, 1280, 853])
        be = np.abs(bh[vh] * scale - bm[vm] * scale).max() if vh.any() else 0
        ke = np.abs((kh[vh] - km[vm]) * scale[:2]).max() if vh.any() else 0
        se = np.abs(sh[vh] - sm[vm]).max() if vh.any() else 0
        worst_box = max(worst_box, be); worst_kp = max(worst_kp, ke)
        print(f"{n:38s} faces {int(vh.sum()):2d}  box {be:6.3f} px  "
              f"kp {ke:6.3f} px  score {se:.4f}", flush=True)
    print(f"WORST: box {worst_box:.3f} px  kp {worst_kp:.3f} px", flush=True)


if __name__ == "__main__":
    main()
