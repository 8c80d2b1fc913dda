#!/usr/bin/env python
"""Profiler-trace recipe (VERDICT r3 #10): capture a jax.profiler trace of
the fused standard-mode program and summarize the op-level breakdown.

The compiler-model half of observability is `FaceDetector.cost_report`
(XLA cost analysis); this is the measured half: a real
`pipeline.timings.trace()` capture around warm batches, summarized from
the Chrome-trace export so the numbers are greppable without TensorBoard.

    python tools/trace_capture.py [--out /tmp/fdt_trace] [--batch 16]
    # full timeline: tensorboard --logdir <out>

The summary prints the top trace events by total self-duration and the
per-TraceMe host stages.  On the relay attachment, device-side op events
may be absent (the relay executes remotely); host-side dispatch, transfer
and blocking events still attribute where wall time goes — read them
together with cost_report and detailed_timings (docs/PERF.md).
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


#: Chrome-trace arg keys that identify WHAT an XLA fusion actually
#: computes (VERDICT r4 #3: print the op metadata, not a guessed label).
_META_KEYS = ("long_name", "hlo_op", "tf_op", "hlo_module", "source",
              "kind", "hlo_category", "equation")


def summarize_chrome_trace(path: str, top: int = 25) -> list:
    """Aggregates complete ('X') events by (track, name).

    Returns rows of (track_name, event_name, total_us, count, meta) where
    ``meta`` is the metadata args of a representative event (HLO op
    names / source attribution where the backend exports them) — so a
    "fusion.N" line says which HLO ops it fuses instead of inviting a
    guess."""
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    pid_names: dict = {}
    tid_names: dict = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev.get("pid")] = ev.get("args", {}).get("name", "?")
        elif ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev.get("pid"), ev.get("tid"))] = \
                ev.get("args", {}).get("name", "?")
    agg = defaultdict(lambda: [0.0, 0, None])
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            track = tid_names.get((ev.get("pid"), ev.get("tid")),
                                  pid_names.get(ev.get("pid"), "?"))
            a = agg[(track, ev.get("name", "?"))]
            a[0] += ev["dur"]
            a[1] += 1
            args = ev.get("args")
            if a[2] is None and args:
                a[2] = {k: str(args[k])[:200] for k in _META_KEYS
                        if k in args} or None
    rows = sorted(((tr, name, t, n, meta)
                   for (tr, name), (t, n, meta) in agg.items()),
                  key=lambda r: -r[2])
    return rows[:top]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/fdt_trace")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from face_detection_tflite_tpu.utils.backend import ensure_backend
    ensure_backend()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from face_detection_tflite_tpu import (FaceDetectionMode,
                                           FaceDetectionModel, FaceDetector)
    from face_detection_tflite_tpu.pipeline import timings
    from face_detection_tflite_tpu.pipeline.detector import resolve_model_dir
    from face_detection_tflite_tpu.utils.image import load_image

    d = resolve_model_dir()
    img = load_image(os.path.join(os.path.dirname(d), "samples",
                                  "landmark-ex1.jpg"))
    det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA, max_faces=16,
                       model_dir=d, precision="high",
                       detailed_timings=True)
    h, w, _ = img.shape
    base = jnp.asarray(np.broadcast_to(img, (args.batch, h, w, 3)).copy())
    bump = jax.jit(lambda x, i: x.at[:, 0, 0, 0].set(i % 199))
    for i in range(3):  # compile + relay warm OUTSIDE the trace
        det.detect_faces_batch(bump(base, i), FaceDetectionMode.STANDARD)
    det.timings.reset()

    with timings.trace(args.out):
        for i in range(3, 3 + args.iters):
            det.detect_faces_batch(bump(base, i),
                                   FaceDetectionMode.STANDARD)

    print("host stage report (detailed_timings):")
    print(json.dumps(det.timings.report(), indent=1))
    det.dispose()

    traces = sorted(glob.glob(os.path.join(
        args.out, "**", "*.trace.json*"), recursive=True))
    if not traces:
        print(f"no chrome trace export under {args.out} "
              f"(inspect with: tensorboard --logdir {args.out})")
        return
    print(f"\ntrace: {traces[-1]}")
    print(f"top events by total duration over {args.iters} batches "
          f"(track | name | HLO metadata where exported):")
    for track, name, tot, n, meta in summarize_chrome_trace(traces[-1]):
        print(f"  {tot / 1e3:9.2f} ms  x{n:<4d} [{track[:28]}] {name[:80]}")
        if meta:
            for k, v in meta.items():
                print(f"{'':18s}{k}: {v}")


if __name__ == "__main__":
    main()
