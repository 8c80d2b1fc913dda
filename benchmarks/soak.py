#!/usr/bin/env python
"""Serving soak: bounded-RSS long-run of the pipelined stream (VERDICT r3 #8).

Analog of the reference's memory-stability integration tests
(`concurrency_stress_test.dart`: repeated runs asserting no growth).  Runs
the ServingPipeline for ``--minutes`` with DEVICE-RESIDENT inputs — the
relay retains ~3 MB of host memory per H2D upload (CLAUDE.md), so a soak
that re-uploaded frames would measure that attachment artifact, not the
framework; a per-iteration on-device pixel bump keeps every input unique
(the relay memoizes identical calls) without new uploads.

Records into benchmarks/results.json as ``serving_soak``:
- per-minute faces/s (steady state = median), first-vs-last-half drift
- RSS start/end + least-squares slope (MB/min) — the leak check
- clean-shutdown flag

    python benchmarks/soak.py [--minutes 12] [--batch 16] [--out FILE]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=12.0)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--scale", type=int, default=1,
                    help="downscale the frame by this factor (CPU-control "
                         "runs need a high batch rate to resolve small "
                         "per-batch growth)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results.json"))
    args = ap.parse_args()

    from face_detection_tflite_tpu.utils.backend import ensure_backend
    ensure_backend()
    import jax
    import jax.numpy as jnp

    from face_detection_tflite_tpu import (FaceDetectionMode,
                                           FaceDetectionModel, FaceDetector,
                                           ServingPipeline)
    from face_detection_tflite_tpu.pipeline.detector import resolve_model_dir
    from face_detection_tflite_tpu.utils.image import load_image

    d = resolve_model_dir()
    img = load_image(os.path.join(os.path.dirname(d), "samples",
                                  "landmark-ex1.jpg"))
    if args.scale > 1:
        img = img[::args.scale, ::args.scale]
    h, w, _ = img.shape
    det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA, max_faces=16,
                       model_dir=d, precision="high")
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}; "
          f"soak {args.minutes} min, batch {args.batch}", file=sys.stderr)

    # ONE device-resident base batch; each iteration derives a unique
    # input by bumping two pixels on device (~2 ms relay dispatch).
    base = jnp.asarray(np.broadcast_to(img, (args.batch, h, w, 3)).copy())
    bump = jax.jit(lambda x, i: x.at[:, 0, 0, 0].set(i % 199)
                   .at[:, 0, 1, 0].set((i // 199) % 197))

    minutes: list = []
    rss_samples: list = []  # (minute, rss_mb)
    clean = False
    t_begin = time.monotonic()
    deadline = t_begin + args.minutes * 60.0
    i = 0
    with ServingPipeline(det, FaceDetectionMode.STANDARD,
                         depth=args.depth) as pipe:
        # warm (compile + relay settle) before the measured window
        for _ in range(3):
            i += 1
            pipe.submit(bump(base, i)).result()
        rss_samples.append((0.0, rss_mb()))
        inflight: list = []
        min_t0, min_faces = time.monotonic(), 0
        last_rss_t = min_t0
        while time.monotonic() < deadline:
            i += 1
            inflight.append(pipe.submit(bump(base, i)))
            while len(inflight) >= args.depth:
                res = inflight.pop(0).result(timeout=700)
                min_faces += sum(len(f) for f in res)
            now = time.monotonic()
            if now - last_rss_t >= 10.0:
                rss_samples.append(((now - t_begin) / 60.0, rss_mb()))
                last_rss_t = now
            if now - min_t0 >= 60.0:
                minutes.append(min_faces / (now - min_t0))
                print(f"minute {len(minutes)}: {minutes[-1]:.1f} faces/s, "
                      f"rss {rss_samples[-1][1]:.0f} MB", file=sys.stderr)
                min_t0, min_faces = now, 0
        for fu in inflight:
            res = fu.result(timeout=700)
            min_faces += sum(len(f) for f in res)
        if time.monotonic() - min_t0 >= 30.0:  # count a >=half-minute tail
            minutes.append(min_faces / (time.monotonic() - min_t0))
        clean = True
    rss_samples.append(((time.monotonic() - t_begin) / 60.0, rss_mb()))
    det.dispose()

    xs = np.asarray([s[0] for s in rss_samples])
    ys = np.asarray([s[1] for s in rss_samples])
    # Steady-state slope: drop the first 2 minutes (compile arenas and
    # allocator warmup dominate early growth) when the run is long enough.
    if xs[-1] > 4.0:
        keep = xs >= 2.0
        xs_f, ys_f = xs[keep], ys[keep]
    else:
        xs_f, ys_f = xs, ys
    slope = float(np.polyfit(xs_f, ys_f, 1)[0]) if len(xs_f) > 2 else 0.0
    half = max(1, len(minutes) // 2)
    entry = {
        "duration_min": round((time.monotonic() - t_begin) / 60.0, 1),
        "batch": args.batch,
        "frame": [h, w],
        "batches_done": i,
        "faces_per_sec_steady": round(float(np.median(minutes)), 1),
        "faces_per_sec_per_minute": [round(m, 1) for m in minutes],
        "drift_last_vs_first_half": round(
            float(np.median(minutes[half:]) / np.median(minutes[:half])), 3)
        if len(minutes) > 1 else 1.0,
        "rss_start_mb": round(ys[0], 1),
        "rss_end_mb": round(ys[-1], 1),
        "rss_slope_mb_per_min": round(slope, 2),
        "clean_shutdown": clean,
        "note": "device-resident inputs (on-device pixel bump per batch); "
                "re-uploading frames would measure the relay's documented "
                "per-H2D host retention, not the framework",
    }
    print(json.dumps({"serving_soak": entry}, indent=1), file=sys.stderr)

    merged = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
    merged.setdefault("configs", {})["serving_soak"] = entry
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
