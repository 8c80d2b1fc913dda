"""Mixed-precision detector experiment: which conv layers actually need
bf16x3 ("high") for the box parity budget, and what does relaxing the
rest to plain bf16 ("default") buy?

Context (docs/PERF.md): detector conv = 15.8 ms/batch at "high" vs 11.0
at "default", but all-default breaks box parity (~2-3 px).  If most of
the error comes from a few layers, a mixed assignment recovers most of
the speed inside the parity budget.

Error metric: post-NMS box corners + 6 keypoints in ABSOLUTE PIXELS vs
the precision="highest" (fp32-exact) pipeline on the real sample images.
Speed metric: chained-enqueue detect program ms/batch (docs/PERF.md
methodology).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp


def main():
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
    from face_detection_tflite_tpu.convert.executor import convert_file
    from face_detection_tflite_tpu.ops.anchors import (anchor_options_for,
                                                       generate_anchors)
    from face_detection_tflite_tpu.ops.detections import (decode_detections,
                                                          weighted_nms)
    from face_detection_tflite_tpu.ops.letterbox import (letterbox_image,
                                                         letterbox_params)
    from face_detection_tflite_tpu.pipeline.detector import resolve_model_dir

    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)
    d = resolve_model_dir()
    path = os.path.join(d, "face_detection_back.tflite")
    samples_dir = os.path.join(os.path.dirname(d), "samples")
    from PIL import Image as _Image
    # Both fixtures resampled to ONE shape (853x1280) so every config
    # compiles a single pipeline program (the relay charges 20-240 s per
    # unique shape); the group shot keeps its 4 faces.
    def _at_shape(name):
        im = _Image.open(os.path.join(samples_dir, name)).convert("RGB")
        return np.asarray(im.resize((1280, 853)))
    images = [_at_shape("landmark-ex1.jpg"),
              _at_shape("group-shot-bounding-box-ex1.jpeg")]

    # Count convs to define splits.
    conv_ids = []

    def census(oi, nm):
        if "CONV" in nm and oi not in conv_ids:
            conv_ids.append(oi)
        return "highest"
    cm0 = convert_file(path, precision=census)
    # The op loop runs at trace time — trace once to fill the census.
    cm0(jnp.zeros(tuple(cm0.input_shapes[0]), jnp.float32))
    conv_ids.sort()
    n_conv = len(conv_ids)
    print(f"{n_conv} conv ops, op-index range "
          f"{conv_ids[0]}..{conv_ids[-1]}", flush=True)

    def split(frac, early):
        """Layers in the early `frac` of conv ops run 'default' if
        ``early`` else the late frac does; the rest run 'high'."""
        cutoff = conv_ids[int(n_conv * frac) - 1] if frac > 0 else -1

        def f(oi, nm):
            if "CONV" not in nm:
                return "high"
            lo = oi <= cutoff
            return "default" if (lo == early) else "high"
        return f

    configs = {
        "all_high": lambda oi, nm: "high",
        "all_default": lambda oi, nm: "default",
        "early50_default": split(0.5, True),
        "early75_default": split(0.75, True),
        "late50_default": split(0.5, False),
        "dw_default": lambda oi, nm: (
            "default" if nm == "DEPTHWISE_CONV_2D" else "high"),
    }

    anchors = jnp.asarray(generate_anchors(anchor_options_for("back")))

    def pipeline(cm, img):
        h, w, _ = img.shape
        p = letterbox_params(h, w, 256, 256)

        @jax.jit
        def run(params, image):
            x = letterbox_image(image, p)
            a, b = cm.fn(params, x[None])
            rb = (a if a.size > b.size else b).reshape(-1, 16)
            rs = (b if a.size > b.size else a).reshape(-1)
            bx, kp, sc, va = decode_detections(rb, rs, anchors, 256.0)
            return weighted_nms(bx, kp, sc, va, max_detections=16)
        out = run(cm.params, jnp.asarray(img))
        bx, kp, sc, va = (np.asarray(o) for o in out)
        va = va.astype(bool)
        scale = np.asarray([img.shape[1], img.shape[0]] * 2)
        return (bx[va] * scale, kp[va] * scale[:2], sc[va])

    ref_model = convert_file(path, precision="highest")
    refs = [pipeline(ref_model, img) for img in images]

    # Speed: chained detect program on a 16-batch of the first image.
    B = 16
    img0 = images[0]
    h, w, _ = img0.shape
    p0 = letterbox_params(h, w, 256, 256)
    batch = jnp.asarray(np.broadcast_to(img0, (B, h, w, 3)).copy()
                        .astype(np.float32))

    def timed(cm):
        @jax.jit
        def prog(params, ims):
            def one(im):
                x = letterbox_image(im, p0)
                a, b = cm.fn(params, x[None])
                rb = (a if a.size > b.size else b).reshape(-1, 16)
                rs = (b if a.size > b.size else a).reshape(-1)
                bx, kp, sc, va = decode_detections(rb, rs, anchors, 256.0)
                return weighted_nms(bx, kp, sc, va, max_detections=16)
            return jax.vmap(one)(ims)
        out = prog(cm.params, batch)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        rounds = []
        for _r in range(3):
            t0 = time.perf_counter()
            ITERS = 12
            for i in range(1, ITERS + 1):
                out = prog(cm.params, batch + i * 1e-3)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
            rounds.append((time.perf_counter() - t0) / ITERS * 1e3)
        return float(np.median(rounds))

    for name, fn in configs.items():
        cm = convert_file(path, precision=fn)
        errs_box, errs_kp, count_mismatch = [], [], 0
        for img, (rb, rk, rsc) in zip(images, refs):
            b, k, sc = pipeline(cm, img)
            if len(sc) != len(rsc):
                count_mismatch += 1
                continue
            errs_box.append(np.abs(b - rb).max())
            errs_kp.append(np.abs(k - rk).max())
        ms = timed(cm)
        print(f"{name:18s} {ms:7.2f} ms/batch   "
              f"box_err_max {max(errs_box):6.3f} px   "
              f"kp_err_max {max(errs_kp):6.3f} px   "
              f"count_mismatch {count_mismatch}", flush=True)


if __name__ == "__main__":
    main()
