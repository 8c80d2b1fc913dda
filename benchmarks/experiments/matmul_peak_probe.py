#!/usr/bin/env python
"""Matmul peak probe: per-call sync vs chained enqueue, across dtypes.

Motivated by a round-4 review of the MFU denominator: the original
`bench.calibrate_peak_gflops` timed one matmul per `block_until_ready`,
which on this relay charges a full ~20 ms round trip per call — the sync
cost DOMINATES a ~3 ms 4096^2 matmul and understated the peak ~8x
(5.1-5.7 TFLOP/s recorded vs 43+ TFLOP/s chained), inflating every
recorded utilization figure by the same factor.

Measured on the TPU v5 lite relay (2026-08-19, this script, IDLE host,
best-of-2 chains; the recorded artifact is
benchmarks/results.json `configs.device_peaks` — cite that, single
chains jitter enough to reorder the bf16 tiers):

  per-call sync, f32 precision=high .....   ~5.5 TFLOP/s  (RTT-bound)
  chained f32 highest (fp32) ............   26.5 TFLOP/s  (5.18 ms/call)
  chained f32 high (bf16x3) .............   45.6 TFLOP/s  (3.01 ms/call)
  chained f32 default (bf16 passes) .....   81.8 TFLOP/s  (1.68 ms/call)
  chained bf16 native operands ..........   84.5 TFLOP/s  (1.63 ms/call)
  chained int8 x int8 -> int32 .........    101.2 TFLOP/s  (1.36 ms/call)

A proper precision ladder (fp32 : bf16x3 : bf16 ~ 1 : 1.7 : 3.1;
int8 fastest) — the MXU story one expects, delivered through the relay
at ~43% of real-v5e native-bf16 peak.  int8 at ~2.2x the "high" tier is
a real-silicon opportunity for an int8 detector tier, but remains
unshipped: the detector's conv block is overhead-bound on this relay
(high 18.5 -> default-bf16 12.4 ms/batch measured — nowhere near the
matmul ratio), and quantization breaks box parity beyond even the
documented "serving" tier's contract.

Two measurement-methodology lessons this script witnesses:

1. A bare `block_until_ready(f(a, b))` on freshly-bumped device inputs
   can return in ~30 us (4+ PFLOP/s "measured") — it does NOT reliably
   wait for relay execution; and even when it waits, a per-call sync
   charges a ~20 ms round trip that dominates a ~3 ms matmul (the
   original calibration recorded 5.1-5.7 TFLOP/s this way, ~8x low).
   Only a chained enqueue ending in one hard device->host fetch
   (np.asarray) times device compute honestly (docs/PERF.md
   "Measurement methodology").
2. Run probes on an IDLE host: the first version of these dtype probes
   ran concurrently with the CPU test suite and read bf16-native and
   int8 at ~2.2 TFLOP/s — a 40x host-contention artifact that briefly
   read as "pathological lowering" until re-measured cleanly.

Run: python benchmarks/experiments/matmul_peak_probe.py
     (--record merges the ladder into benchmarks/results.json as
     ``device_peaks`` so the docs' peak claims are artifact-checkable)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true",
                    help="merge the measured ladder into results.json "
                         "as 'device_peaks'")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "results.json"))
    args = ap.parse_args()

    from face_detection_tflite_tpu.utils.backend import ensure_backend
    ensure_backend()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}")
    ladder = {}
    n = 4096
    flops = 2.0 * n * n * n
    base = jnp.ones((n, n), jnp.float32)

    # -- per-call sync (the flawed form, kept as the comparator) ----------
    f_high = jax.jit(lambda x, y: jax.lax.dot(
        x, y, precision=jax.lax.Precision.HIGH))
    np.asarray(f_high(base, base)[:1, :1])
    best = 0.0
    for i in range(3):
        a = base.at[0, 0].set(float(i + 2))
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        jax.block_until_ready(f_high(a, base))
        best = max(best, flops / (time.perf_counter() - t0) / 1e9)
    print(f"per-call sync, f32 high        : {best:9.1f} GFLOP/s "
          "(RTT-polluted — and block_until_ready may return early)")

    # -- chained enqueue (honest form) ------------------------------------
    # Dependency-chained: each step consumes the previous output (the
    # device must serialize; only src + one y + one out are ever live —
    # a pool of staged 64 MB buffers at chain=32 would hold ~4 GB on the
    # device, which is documented to wedge this relay) and takes a host
    # scalar that differs every call (the relay cannot memoize).  One
    # hard fetch at the end syncs the whole chain.
    def chained(dot_fn, post, tag, dtype=jnp.float32, chain=32):
        src = base.astype(dtype)

        @jax.jit
        def step(i, y):
            x = src.at[0, 0].set(i.astype(dtype))
            return post(dot_fn(x, y))

        y = step(jnp.float32(1.0), src)
        np.asarray(y[:1, :1])  # compile + warm, hard sync
        # Best-of-2 chains: relay jitter on a single chain is large
        # enough to reorder adjacent tiers (observed: bf16-default and
        # bf16-native swapping between ~53 and ~84 TFLOP/s run-to-run).
        best_dt = float("inf")
        for r in range(2):
            t0 = time.perf_counter()
            for i in range(chain):
                y = step(jnp.float32(r * chain + i + 2), y)
            np.asarray(y[:1, :1])  # one hard fetch syncs the chain
            best_dt = min(best_dt, time.perf_counter() - t0)
        gflops = flops * chain / best_dt / 1e9
        ladder[tag.strip()] = round(gflops, 1)
        print(f"{tag:31s}: {gflops:9.1f} GFLOP/s "
              f"({best_dt / chain * 1e3:.2f} ms/call, chain={chain}, "
              f"best of 2)")

    inv_n = 1.0 / n  # keep chained values ~1 instead of overflowing
    for prec, tag in (
            (jax.lax.Precision.HIGHEST, "chained f32 highest (fp32)"),
            (jax.lax.Precision.HIGH, "chained f32 high (bf16x3)"),
            (jax.lax.Precision.DEFAULT, "chained f32 default (bf16)")):
        chained(lambda x, y, p=prec: jax.lax.dot(x, y, precision=p),
                lambda o: o * inv_n, tag)
    chained(jax.lax.dot, lambda o: o * jnp.bfloat16(inv_n),
            "chained bf16 native", dtype=jnp.bfloat16)
    chained(lambda x, y: jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32),
            lambda o: (o // n).astype(jnp.int8),
            "chained int8 -> int32", dtype=jnp.int8)

    # -- the shipped calibration (dependency-chained, bounded memory) -----
    from bench import calibrate_peak_gflops
    shipped = calibrate_peak_gflops("high")
    print(f"calibrate_peak_gflops('high')  : "
          f"{shipped:9.1f} GFLOP/s (shipped form)")

    if args.record:
        entry = {
            "matmul_4096_gflops": ladder,
            "shipped_calibration_high": round(shipped, 1),
            "note": "chained-enqueue dense 4096^2 matmul, one hard fetch "
                    "per 32-step chain, idle host; per-call-sync form is "
                    "RTT-polluted ~8x low (see this script's docstring)",
        }
        merged = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                merged = json.load(f)
        merged.setdefault("configs", {})["device_peaks"] = entry
        with open(args.out, "w") as f:
            json.dump(merged, f, indent=1)
        print(f"recorded device_peaks -> {args.out}")


if __name__ == "__main__":
    main()
