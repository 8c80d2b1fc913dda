#!/usr/bin/env python
"""End-to-end HTTP serving benchmark on the attached chip (VERDICT r3 #2/#3).

Drives FaceServer with concurrent keep-alive clients posting real JPEG
bodies (853x1280 portrait), and records into benchmarks/results.json:

- ``serving_http``: req/s, client-side p50/p99 latency, the
  fdt_detect_batch_size histogram scraped from /metrics (proves the
  micro-batcher engages: mean/median batch > 1 under load), error count.
- ``serving_http_raw``: the same images through a raw ServingPipeline
  (host-numpy batches, same decode output) — the comparator that isolates
  the HTTP + batcher layer's overhead from decode/H2D/compute.
- ``serving_http_replica`` (--replica): the same load through
  ``FaceServer(devices=[chip0])`` — bounds the per-replica pool overhead
  on one chip (the N-chip speedup itself is unmeasurable here; this
  pins what each replica costs).

Unique inputs per request (pre-encoded JPEG variants with a pixel bump)
defeat the relay's identical-call memoizer.  The relay's ~40 MB/s H2D
link caps this path at ~12 img/s regardless of compute (see
results.json: serving_pipeline_jpeg) — the numbers are still the honest
end-to-end record for THIS attachment, and the batch histogram +
overhead decomposition transfer to real hosts.

    python benchmarks/serve_http_bench.py [--duration 40] [--clients 16]
                                          [--replica] [--out FILE]
"""

import argparse
import http.client
import io
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_jpeg_variants(img: np.ndarray, n: int) -> list:
    """Pre-encoded JPEG bodies differing by a pixel bump (unique device
    inputs per request without re-encoding in the hot loop)."""
    from PIL import Image
    out = []
    for i in range(n):
        a = img.copy()
        a[0, 0, 0] = i % 199
        a[0, 1, 0] = (i // 199) % 197
        buf = io.BytesIO()
        Image.fromarray(a).save(buf, format="JPEG", quality=92)
        out.append(buf.getvalue())
    return out


def parse_histogram(metrics_text: str, name: str) -> dict:
    """Cumulative-bucket Prometheus histogram -> per-bucket counts,
    count, sum."""
    import re
    buckets, count, total = {}, 0, 0.0
    for line in metrics_text.splitlines():
        m = re.match(rf'{name}_bucket{{.*le="([^"]+)".*}} (\d+)', line)
        if m:
            buckets[m.group(1)] = int(m.group(2))
        elif line.startswith(f"{name}_count"):
            count = int(float(line.split()[-1]))
        elif line.startswith(f"{name}_sum"):
            total = float(line.split()[-1])
    # de-cumulate in le order (numeric, +Inf last)
    keys = sorted((k for k in buckets if k != "+Inf"), key=float)
    keys += [k for k in ("+Inf",) if k in buckets]
    per, prev = {}, 0
    for k in keys:
        per[k] = buckets[k] - prev
        prev = buckets[k]
    return {"buckets": per, "count": count, "sum": total,
            "mean": (total / count) if count else 0.0}


def hist_median_bucket(per: dict) -> str:
    total = sum(per.values())
    acc = 0
    for k, v in per.items():
        acc += v
        if acc * 2 >= total:
            return k
    return "0"


def drive(address: str, bodies: list, clients: int, duration: float,
          path: str = "/v1/detect?mode=standard"):
    """Concurrent keep-alive clients for ``duration`` seconds.
    Returns (latencies_ms, n_errors, n_shed, elapsed_s); ``n_shed``
    counts 503 backpressure responses (bounded-queue load shedding —
    a correct overload answer, tallied separately from errors)."""
    host_port = address.split("//", 1)[1]
    lat, errors, shed = [], [0], [0]
    lock = threading.Lock()
    stop = time.monotonic() + duration

    def client(idx: int):
        conn = http.client.HTTPConnection(host_port, timeout=700)
        i = idx * 7  # per-client stride: stacked batches never repeat
        local = []
        while time.monotonic() < stop:
            body = bodies[i % len(bodies)]
            i += clients * 7
            t0 = time.monotonic()
            try:
                conn.request("POST", path, body=body,
                             headers={"Content-Type": "image/jpeg"})
                resp = conn.getresponse()
                data = resp.read()
                if resp.status == 503:  # shed: back off as advised
                    with lock:
                        shed[0] += 1
                    time.sleep(float(resp.headers.get("Retry-After",
                                                      "0.2")) / 5.0)
                    continue
                if resp.status != 200:
                    raise RuntimeError(f"{resp.status}: {data[:120]!r}")
                n_faces = len(json.loads(data)["faces"])
                if n_faces < 1:
                    raise RuntimeError("0 faces on the portrait fixture")
            except Exception:
                with lock:
                    errors[0] += 1
                conn.close()
                conn = http.client.HTTPConnection(host_port, timeout=700)
                continue
            local.append((time.monotonic() - t0) * 1000.0)
        conn.close()
        with lock:
            lat.extend(local)

    t_start = time.monotonic()
    threads = [threading.Thread(target=client, args=(c,), daemon=True)
               for c in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return lat, errors[0], shed[0], time.monotonic() - t_start


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=40.0)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--replica", action="store_true",
                    help="also measure FaceServer(devices=[chip0])")
    ap.add_argument("--skip-raw", action="store_true")
    ap.add_argument("--skip-http", action="store_true",
                    help="skip the default-server phase (re-measure only "
                         "raw/replica phases)")
    ap.add_argument("--curve", default=None, metavar="L1,L2,...",
                    help="saturation curve: drive each comma-separated "
                         "client level against one server and record "
                         "results.json: serving_http_curve (e.g. 1,4,16,48)")
    ap.add_argument("--curve-duration", type=float, default=30.0,
                    help="seconds per curve level")
    ap.add_argument("--curve-max-batches", default="16,4",
                    help="comma-separated micro-batch caps; the curve "
                         "sweep runs once per cap, back-to-back, so the "
                         "caps see the same relay phase; the literal "
                         "token 'adaptive' measures the default "
                         "attachment-aware cap (_AdaptiveCap) as an arm")
    ap.add_argument("--curve-key", default="serving_http_curve",
                    help="results.json key for the curve record — a "
                         "follow-up experiment (e.g. the adaptive-cap "
                         "A/B) records under its own key instead of "
                         "overwriting the baseline curve's arms")
    ap.add_argument("--max-batch", type=int, default=16,
                    help="FaceServer micro-batch cap. On an H2D-bound "
                         "attachment (this relay: ~40 MB/s) per-image "
                         "upload cost is constant, so batches past the "
                         "compute-amortization point add pure latency; "
                         "smaller caps keep several batches overlapping "
                         "in the pipelined executor instead of one "
                         "giant serial upload.")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results.json"))
    args = ap.parse_args()

    from face_detection_tflite_tpu.utils.backend import ensure_backend
    ensure_backend()
    import jax

    from face_detection_tflite_tpu import (FaceDetectionMode,
                                           FaceDetectionModel, FaceDetector,
                                           FaceServer, ServingPipeline)
    from face_detection_tflite_tpu.pipeline.detector import resolve_model_dir
    from face_detection_tflite_tpu.utils.image import load_image

    d = resolve_model_dir()
    img = load_image(os.path.join(os.path.dirname(d), "samples",
                                  "landmark-ex1.jpg"))
    bodies = make_jpeg_variants(img, 48)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}; "
          f"clients={args.clients} duration={args.duration}s",
          file=sys.stderr)

    det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA, max_faces=16,
                       model_dir=d, precision="high")
    # Warm every batch bucket the micro-batcher can drain into (compiles
    # once per ladder size; the persistent cache makes reruns instant).
    for b in (1, 2, 4, 8, 16):
        det.detect_faces_batch(np.stack([img] * b),
                               FaceDetectionMode.STANDARD)
        print(f"warmed batch bucket {b}", file=sys.stderr)

    results = {}

    if args.curve:
        # Saturation curve (VERDICT r4 #5): one server per micro-batch
        # cap, increasing client levels — shows where req/s plateaus and
        # how p50/p99 degrade, plus that the bounded queue sheds (503)
        # instead of growing latency without bound.  Queue-depth gauge is
        # scraped per level.  Each cap in --curve-max-batches gets its
        # own sweep back-to-back (same process, same relay phase) —
        # measured round 5: on this H2D-bound relay the default cap (16)
        # convoy-collapses at >=16 clients while cap 4 holds the
        # bandwidth ceiling, see docs/PERF.md "Serving saturation curve".
        levels = [int(x) for x in args.curve.split(",")]
        caps = [x.strip() for x in args.curve_max_batches.split(",")]
        by_cap = {}
        for cap in caps:
            # fixed caps pin adaptive_batch=False (controlled A/B);
            # the literal token "adaptive" measures the default
            # attachment-aware cap instead (upper bound max_batch=16)
            if cap == "adaptive":
                server_kw = dict(max_batch=16, adaptive_batch=True)
            else:
                server_kw = dict(max_batch=int(cap), adaptive_batch=False)
            curve = []
            with FaceServer(det, **server_kw) as server:
                drive(server.address, bodies, 1, 2.0)  # settle / warm
                for c in levels:
                    lat, errs, shed, elapsed = drive(
                        server.address, bodies, c, args.curve_duration)
                    conn = http.client.HTTPConnection(
                        server.address.split("//", 1)[1], timeout=60)
                    conn.request("GET", "/metrics")
                    metrics_text = conn.getresponse().read().decode()
                    conn.close()
                    import re as _re
                    qd = _re.search(
                        r"fdt_detect_queue_depth(?:{})? ([0-9.]+)",
                        metrics_text)
                    ac = _re.search(
                        r"fdt_adaptive_batch_cap(?:{})? ([0-9.]+)",
                        metrics_text)
                    lat_np = np.asarray(lat) if lat else np.asarray([0.0])
                    curve.append({
                        "clients": c,
                        "requests": len(lat),
                        "errors": errs,
                        "shed_503": shed,
                        "req_per_sec": round(len(lat) / elapsed, 2),
                        "latency_ms_p50": round(
                            float(np.percentile(lat_np, 50)), 1),
                        "latency_ms_p99": round(
                            float(np.percentile(lat_np, 99)), 1),
                        "queue_depth_last": (float(qd.group(1))
                                             if qd else None),
                        "adaptive_cap_last": (float(ac.group(1))
                                              if ac else None),
                    })
                    print(f"max_batch={cap} " + json.dumps(curve[-1]),
                          file=sys.stderr)
            by_cap[str(cap)] = curve
        results[args.curve_key] = {
            "duration_s_per_level": args.curve_duration,
            "max_queue": 128,
            "by_max_batch": by_cap,
            "note": "one FaceServer per micro-batch cap, increasing "
                    "concurrent keep-alive clients back-to-back in one "
                    "process; req/s plateaus at the attachment's H2D "
                    "ceiling (~12 img/s on this relay) when batches stay "
                    "near the compute-amortization point, while caps far "
                    "past it convoy-collapse (per-image upload cost is "
                    "constant on an H2D-bound link, so oversize batches "
                    "add pure latency and defeat the executor's "
                    "overlap); 503s (shed_503) appear only when the "
                    "bounded queue (max_queue) fills — backpressure, "
                    "not failure",
        }

    if not args.skip_http:
        with FaceServer(det, max_batch=args.max_batch) as server:
            # settle: two sequential requests through the full HTTP path
            drive(server.address, bodies, 1, 2.0)
            lat, errs, shed, elapsed = drive(server.address, bodies,
                                             args.clients, args.duration)
            conn = http.client.HTTPConnection(
                server.address.split("//", 1)[1], timeout=60)
            conn.request("GET", "/metrics")
            metrics_text = conn.getresponse().read().decode()
            conn.close()
            hist = parse_histogram(metrics_text, "fdt_detect_batch_size")
            lat_np = np.asarray(lat)
            results["serving_http"] = {
                "clients": args.clients,
                "duration_s": round(elapsed, 1),
                "requests": len(lat),
                "errors": errs,
                "req_per_sec": round(len(lat) / elapsed, 2),
                "latency_ms_p50": round(float(np.percentile(lat_np, 50)), 1),
                "latency_ms_p99": round(float(np.percentile(lat_np, 99)), 1),
                "batch_size_mean": round(hist["mean"], 2),
                "batch_size_median_bucket_le": hist_median_bucket(
                    hist["buckets"]),
                "batch_size_histogram": hist["buckets"],
                "note": "end-to-end on the relay-attached chip: JPEG decode + "
                        "micro-batch + H2D + fused standard program + JSON; "
                        "H2D link (~40 MB/s) is the cap (see "
                        "serving_pipeline_jpeg)",
            }
            print(json.dumps({"serving_http": results["serving_http"]},
                             indent=1), file=sys.stderr)


    if not args.skip_raw:
        # Raw comparator: same decoded pixels, host-numpy batches of the
        # measured mean batch size, through ServingPipeline (no HTTP, no
        # decode, no batcher).
        from face_detection_tflite_tpu.utils.image import decode_image
        decoded = [decode_image(b) for b in bodies]
        bsz = max(1, int(round(
            results["serving_http"]["batch_size_mean"]))) \
            if "serving_http" in results else 8
        batches = [np.stack([decoded[(i + j) % len(decoded)]
                             for j in range(bsz)])
                   for i in range(0, 4 * len(decoded), bsz)]
        with ServingPipeline(det, FaceDetectionMode.STANDARD,
                             depth=3) as pipe:
            pipe.submit(batches[0]).result()  # warm this batch size
            stop = time.monotonic() + args.duration
            done, i, inflight = 0, 0, []
            t0 = time.monotonic()
            while time.monotonic() < stop:
                inflight.append(pipe.submit(batches[i % len(batches)]))
                i += 1
                while len(inflight) >= 3:
                    inflight.pop(0).result()
                    done += bsz
            for fu in inflight:
                fu.result()
                done += bsz
            dt = time.monotonic() - t0
        results["serving_http_raw"] = {
            "batch_size": bsz,
            "images_per_sec": round(done / dt, 2),
            "note": "same decoded pixels via one raw ServingPipeline "
                    "submitter (host-numpy batches, no HTTP/decode/"
                    "batcher) — the overhead comparator; since r4 the "
                    "server itself runs groups through a pipelined "
                    "executor and can exceed this single-submitter "
                    "number",
        }
        print(json.dumps({"serving_http_raw": results["serving_http_raw"]},
                         indent=1), file=sys.stderr)

    if args.replica:
        with FaceServer(det, max_batch=16,
                        devices=[jax.devices()[0]]) as server:
            # Warm the replica path at every batch bucket IN-PROCESS:
            # device-committed inputs/params give the replica path its own
            # jit cache entries, so it compiles separately from the
            # default path (an unwarmed replica server spent its whole
            # first measurement window loading programs: 0.84 req/s).
            pool = server._executor_for_mode(FaceDetectionMode.STANDARD)
            for b in (1, 2, 4, 8, 16):
                pool.submit(np.stack([img] * b)).result()
                print(f"warmed replica batch bucket {b}", file=sys.stderr)
            drive(server.address, bodies, 1, 2.0)  # settle the HTTP path
            lat, errs, _shed, elapsed = drive(server.address, bodies,
                                              args.clients, args.duration)
            lat_np = np.asarray(lat)
            results["serving_http_replica"] = {
                "devices": 1,
                "requests": len(lat),
                "errors": errs,
                "req_per_sec": round(len(lat) / elapsed, 2),
                "latency_ms_p50": round(float(np.percentile(lat_np, 50)),
                                        1),
                "latency_ms_p99": round(float(np.percentile(lat_np, 99)),
                                        1),
                "note": "same load through a 1-chip ReplicaPool server — "
                        "req/s delta vs serving_http bounds the "
                        "per-replica pool overhead",
            }
            print(json.dumps(
                {"serving_http_replica": results["serving_http_replica"]},
                indent=1), file=sys.stderr)

    det.dispose()

    # merge into results.json
    merged = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
    cfgs = merged.setdefault("configs", {})
    # curve records merge per-cap: a later run adding one arm (e.g.
    # "adaptive") extends by_max_batch instead of dropping the
    # previously recorded fixed-cap sweeps under the same key.
    ck = args.curve_key
    if ck in results and ck in cfgs:
        prev = cfgs[ck].get("by_max_batch", {})
        new = results[ck]
        new["by_max_batch"] = {**prev, **new["by_max_batch"]}
    cfgs.update(results)
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {sorted(results)} into {args.out}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
