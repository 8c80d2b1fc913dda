#!/usr/bin/env python
"""Production HTTP serving entry point.

Starts a `FaceServer` (pipeline/server.py) over one FaceDetector:
micro-batched /v1/detect, /v1/segment, /v1/embed,
/v1/detect_with_segmentation, /healthz, /v1/info, and Prometheus
/metrics.

    python tools/serve.py --port 8080 --mode-warmup 1280x853 \
        --precision serving

`--mode-warmup WxH` pre-compiles the fast/standard/full programs for
that image bucket before the socket opens (cold compiles on a
relay-attached TPU cost 20-240 s; a warmed server answers its first
request at steady-state latency).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--model", default="back",
                    help="detector variant: back|front|short|full|"
                         "full_sparse")
    ap.add_argument("--precision", default="highest",
                    help="precision tier: highest (fp32-exact, detector "
                         "default) | high (bf16x3 parity) | mixed | "
                         "serving | default")
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--batch-window-ms", type=float, default=4.0)
    ap.add_argument("--mode-warmup", default=None, metavar="WxH",
                    help="pre-compile programs for a WxH image bucket")
    ap.add_argument("--model-dir", default=None)
    args = ap.parse_args()

    from face_detection_tflite_tpu.utils.backend import ensure_backend
    ensure_backend()

    from face_detection_tflite_tpu import (FaceDetectionModel, FaceDetector,
                                           FaceServer)
    variants = {"back": FaceDetectionModel.BACK_CAMERA,
                "front": FaceDetectionModel.FRONT_CAMERA,
                "short": FaceDetectionModel.SHORT_RANGE,
                "full": FaceDetectionModel.FULL,
                "full_sparse": FaceDetectionModel.FULL_SPARSE}
    if args.model not in variants:
        ap.error(f"unknown --model {args.model!r}")

    det = FaceDetector(model=variants[args.model],
                       precision=args.precision,
                       model_dir=args.model_dir)
    if args.mode_warmup:
        w, h = (int(v) for v in args.mode_warmup.lower().split("x"))
        print(f"warming fast/standard/full programs for {w}x{h}...",
              flush=True)
        det.warmup((h, w, 3), batch_size=1)

    server = FaceServer(det, host=args.host, port=args.port,
                        batch_window_ms=args.batch_window_ms,
                        max_batch=args.max_batch).start()
    print(f"serving on {server.address}  (endpoints: /healthz /v1/info "
          f"/metrics /v1/detect /v1/segment /v1/embed "
          f"/v1/detect_with_segmentation)", flush=True)
    try:
        server._serve_thread.join()
    except KeyboardInterrupt:
        print("shutting down")
        server.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
