#!/usr/bin/env python
"""Pre-compiles the serving-critical programs into the persistent XLA
cache so later processes (benchmarks, the driver's round-end run, demos)
start warm.

One program compiles per (image bucket, mode, face slab); a cold compile
costs 20-240 s each on relay-attached TPUs, and interrupted compiles
write nothing — so warm once, from a stable process:

    nohup python tools/warm_tpu.py > /tmp/warm.log 2>&1 &

Covers: the benchmark workload (853x1280, BACK variant, fast/standard/
full + the speculative serving ladder), the driver's entry program
(256x256 FULL), and optionally the demo bucket (--demo: 864x1536 with
segmentation).  Re-running is cheap when everything is already cached.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--demo", action="store_true",
                    help="also warm the demo bucket (864x1536 + "
                         "segmentation; several extra compiles)")
    ap.add_argument("--batch", type=int,
                    default=int(os.environ.get("FDT_BENCH_BATCH", "16")))
    args = ap.parse_args()

    from face_detection_tflite_tpu.utils.backend import ensure_backend
    ensure_backend()
    import jax

    from face_detection_tflite_tpu import (FaceDetectionMode,
                                           FaceDetectionModel, FaceDetector)
    from face_detection_tflite_tpu.pipeline.detector import resolve_model_dir

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    t_all = time.time()

    d = resolve_model_dir()
    det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA, max_faces=16,
                       model_dir=d,
                       precision=os.environ.get("FDT_BENCH_PRECISION",
                                                "high"))
    # The bench workload image/bucket.
    img = np.zeros((853, 1280, 3), np.uint8)
    batch = np.broadcast_to(img, (args.batch,) + img.shape)
    for mode in (FaceDetectionMode.FAST, FaceDetectionMode.STANDARD,
                 FaceDetectionMode.FULL):
        t0 = time.time()
        det.detect_faces_batch(np.array(batch), mode)
        log(f"bench {mode.name:8s} b={args.batch}: {time.time()-t0:.1f}s")
    # The HTTP micro-batcher drains into the batch-bucket ladder; warm
    # the smaller STANDARD buckets so serve_http_bench / FaceServer cold
    # starts don't compile during traffic.
    for b in (1, 2, 4, 8):
        if b < args.batch:
            t0 = time.time()
            det.detect_faces_batch(
                np.array(np.broadcast_to(img, (b,) + img.shape)),
                FaceDetectionMode.STANDARD)
            log(f"bucket standard b={b}: {time.time()-t0:.1f}s")
    det.dispose()

    # Driver entry program (single-chip compile check shape).
    import __graft_entry__ as g
    t0 = time.time()
    fn, ex = g.entry()
    jax.block_until_ready(jax.jit(fn)(*ex))
    log(f"entry program: {time.time()-t0:.1f}s")

    if args.demo:
        t0 = time.time()
        demo_det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                                with_segmentation=True)
        demo_img = np.zeros((864, 1536, 3), np.uint8)
        demo_det.detect_faces_with_segmentation(demo_img)
        demo_det.dispose()
        log(f"demo bucket (864x1536 + seg): {time.time()-t0:.1f}s")

    log(f"warm done in {time.time()-t_all:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
