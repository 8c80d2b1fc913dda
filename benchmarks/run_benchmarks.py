#!/usr/bin/env python
"""Benchmark suite: per-mode latencies, segmentation, embedding, NMS micro.

Analog of the reference's nightly benchmark workflow (`runBenchmark.sh` +
`benchmarks.yml`: assertion-free measurement runs emitting JSON).  Writes
``benchmarks/results.json`` and prints it; `bench.py` at the repo root
remains the single-line headline metric for the driver.

    python benchmarks/run_benchmarks.py [--quick] [--out FILE]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench(fn, iters):
    """Mean seconds/call.  ``fn`` must block on its own result (the
    detector APIs materialize to host; raw-program callers wrap with
    block_until_ready)."""
    fn()  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results.json"))
    args = ap.parse_args()

    import jax
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from face_detection_tflite_tpu import (FaceDetectionMode,
                                           FaceDetectionModel, FaceDetector)
    from face_detection_tflite_tpu.pipeline.detector import resolve_model_dir
    from face_detection_tflite_tpu.utils.image import load_image

    iters = 3 if args.quick else 15
    batch = 4 if args.quick else 16
    d = resolve_model_dir()
    dev = jax.devices()[0]
    results = {
        "device": f"{dev.platform}:{dev.device_kind}",
        "batch": batch, "iters": iters,
        "precision": "high",
        "configs": {},
    }

    sample = os.path.join(os.path.dirname(d), "samples", "landmark-ex1.jpg")
    img = load_image(sample) if os.path.exists(sample) else \
        np.random.default_rng(0).uniform(0, 255, (853, 1280, 3)).astype(
            np.uint8)
    h, w, _ = img.shape
    images = jnp.asarray(np.broadcast_to(img, (batch, h, w, 3)).copy())

    det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                       model_dir=d, precision="high")

    for mode in (FaceDetectionMode.FAST, FaceDetectionMode.STANDARD,
                 FaceDetectionMode.FULL):
        dt = _bench(lambda m=mode: det.detect_faces_batch(images, m), iters)
        results["configs"][f"detect_{mode.value}"] = {
            "ms_per_image": round(dt / batch * 1e3, 3),
            "images_per_sec": round(batch / dt, 2),
        }

    # Segmentation
    try:
        mask_fn = lambda: det.get_segmentation_mask(img)
        dt = _bench(mask_fn, iters)
        results["configs"]["segmentation_general"] = {
            "ms_per_image": round(dt * 1e3, 3)}
    except FileNotFoundError:
        results["configs"]["segmentation_general"] = "model absent"

    # Embedding
    faces = det.detect_faces(img, FaceDetectionMode.FULL)
    if faces:
        emb_fn = lambda: det.get_face_embedding(faces[0], img)
        dt = _bench(emb_fn, iters)
        results["configs"]["embedding"] = {
            "ms_per_call": round(dt * 1e3, 3),
            "pretrained": det.embedding_model.is_pretrained,
        }

    # NMS micro (XLA vs Pallas)
    from face_detection_tflite_tpu.ops.detections import weighted_nms
    from face_detection_tflite_tpu.ops.nms_pallas import weighted_nms_pallas
    rng = np.random.default_rng(0)
    boxes = rng.uniform(0, 0.8, (896, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(0.05, 0.2, (896, 2))
    scores = rng.uniform(0, 1, 896).astype(np.float32)
    kp = rng.normal(size=(896, 6, 2)).astype(np.float32)
    a = (jnp.asarray(boxes), jnp.asarray(kp), jnp.asarray(scores),
         jnp.asarray(scores >= 0.5))
    for name, f in (("nms_xla", weighted_nms),
                    ("nms_pallas", weighted_nms_pallas)):
        try:
            jf = jax.jit(lambda *x, f=f: f(
                *x, max_detections=16, num_candidates=128))
            dt = _bench(lambda: jax.block_until_ready(jf(*a)), max(iters, 10))
            results["configs"][name] = {"ms": round(dt * 1e3, 4)}
        except Exception as e:  # pallas may not lower off-TPU
            results["configs"][name] = f"unavailable: {type(e).__name__}"

    # Pipelined batch stream (device-resident input): software-pipelined
    # two-phase dispatch vs sequential detect_faces_batch calls.
    n_stream = 3 if args.quick else 12
    det.detect_faces_batch(images, FaceDetectionMode.STANDARD)
    list(det.detect_faces_batch_stream([images],
                                       FaceDetectionMode.STANDARD))
    t0 = time.perf_counter()
    for _ in range(n_stream):
        det.detect_faces_batch(images, FaceDetectionMode.STANDARD)
    t_seq = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in det.detect_faces_batch_stream(
            (images for _ in range(n_stream)),
            FaceDetectionMode.STANDARD, depth=2):
        pass
    t_str = time.perf_counter() - t0
    results["configs"]["batch_stream"] = {
        "images_per_sec_sequential": round(n_stream * batch / t_seq, 2),
        "images_per_sec_pipelined": round(n_stream * batch / t_str, 2),
    }

    # Serving pipeline: JPEG-bytes stream through the pipelined executor
    # (decode on caller thread ∥ compute on worker) vs the same batches
    # called serially — shows the overlap win end to end.
    if os.path.exists(sample):
        import cv2
        from face_detection_tflite_tpu import ServingPipeline
        ok, enc = cv2.imencode(".jpg", np.asarray(img)[..., ::-1])
        assert ok
        jpeg = enc.tobytes()
        n_batches = 2 if args.quick else 6
        stream = [[jpeg] * batch for _ in range(n_batches)]
        with ServingPipeline(det, mode=FaceDetectionMode.STANDARD) as pipe:
            pipe.submit(stream[0]).result()  # warm decode+compile path
            t0 = time.perf_counter()
            futs = [pipe.submit(b) for b in stream]
            for f in futs:
                f.result()
            t_pipe = time.perf_counter() - t0
        det.detect_faces_from_bytes_batch(stream[0],
                                          FaceDetectionMode.STANDARD)
        t0 = time.perf_counter()
        for b in stream:
            det.detect_faces_from_bytes_batch(b, FaceDetectionMode.STANDARD)
        t_serial = time.perf_counter() - t0
        n_imgs = n_batches * batch
        results["configs"]["serving_pipeline_jpeg"] = {
            "images_per_sec_pipelined": round(n_imgs / t_pipe, 2),
            "images_per_sec_serial": round(n_imgs / t_serial, 2),
            "overlap_speedup": round(t_serial / t_pipe, 3),
        }

    # Steady-state stage attribution: drop everything recorded so far
    # (includes per-bucket compiles inside the warmup calls), then time a
    # few clean full-mode calls.
    det.timings.reset()
    for _ in range(3):
        det.detect_faces_batch(images, FaceDetectionMode.FULL)
    results["stage_timings_ms"] = det.timings.report()

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
