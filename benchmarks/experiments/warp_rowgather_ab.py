"""A/B: the warp's four tap gathers as row-wise take_along_axis.

The HLO trace pinned the fused pipeline's top cost on four ~3.9 ms/batch
u8 tap gathers (ops/warp.py flat fancy-indexing, 18.4 ms/batch total in
the standalone A/B).  An (initially memoizer-polluted, then re-verified)
probe suggested XLA lowers `take_along_axis(planes [R, H*W], idx
[R, NT], axis=1)` through a far faster path than the start-index gather
the flat fancy-index form emits.  This times, with the honest chained
discipline (per-iteration param bump to defeat the relay memoizer, one
hard fetch at the end — docs/PERF.md "Measurement methodology"):

  shipped_4tap : ops/warp.extract_aligned_square (control)
  barrier_4tap : same math, optimization_barrier between index
                 computation and the four tap gathers
  rowgather    : one take_along_axis per channel plane, all four taps in
                 one [B, 4*OUT*OUT] index row per image (bit-exact)
  rowgather_nb : rowgather without the barrier
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
from face_detection_tflite_tpu.ops import warp  # noqa: E402

B, H, W, C, OUT = 16, 853, 1280, 3, 192
ITERS, ROUNDS = 15, 4


def _grid(cx, cy, size, theta):
    size_int = jnp.maximum(jnp.floor(size + 0.5), 1.0)
    scale = OUT / size_int
    oc = OUT / 2.0 + 0.5 * (scale - 1.0)
    xs = jnp.arange(OUT, dtype=jnp.float32)
    ys = jnp.arange(OUT, dtype=jnp.float32)
    dx = (xs[None, :] - oc) / scale
    dy = (ys[:, None] - oc) / scale
    ct, st = jnp.cos(theta), jnp.sin(theta)
    sx = cx + ct * dx + st * dy
    sy = cy - st * dx + ct * dy
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    return (x0.astype(jnp.int32), y0.astype(jnp.int32),
            (sx - x0)[..., None], (sy - y0)[..., None])


def _indices(cx, cy, size, theta):
    x0i, y0i, fx, fy = _grid(cx, cy, size, theta)
    lins, masks = [], []
    for dy_ in (0, 1):
        for dx_ in (0, 1):
            yi = y0i + dy_
            xi = x0i + dx_
            yc = jnp.clip(yi, 0, H - 1)
            xc = jnp.clip(xi, 0, W - 1)
            lins.append(yc * W + xc)
            masks.append((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
    return jnp.stack(lins), jnp.stack(masks), fx, fy


def _blend(v00, v01, v10, v11, fx, fy):
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def barrier_4tap(imgs, cx, cy, s, t):
    lin4, mask4, fx, fy = jax.vmap(_indices)(cx, cy, s, t)
    lin4, mask4, fx, fy = jax.lax.optimization_barrier(
        (lin4, mask4, fx, fy))

    def one(im, l4, m4, fx_, fy_):
        flat = im.reshape(H * W, C)
        taps = [jnp.where(m4[i][..., None],
                          flat[l4[i]].astype(jnp.float32), 0.0)
                for i in range(4)]
        return _blend(*taps, fx_, fy_)

    return jax.vmap(one)(imgs, lin4, mask4, fx, fy)


def _rowgather(imgs, cx, cy, s, t, barrier):
    lin4, mask4, fx, fy = jax.vmap(_indices)(cx, cy, s, t)
    if barrier:
        lin4, mask4, fx, fy = jax.lax.optimization_barrier(
            (lin4, mask4, fx, fy))
    lin = lin4.reshape(B, 4 * OUT * OUT)
    planes = imgs.transpose(0, 3, 1, 2).reshape(B, C, H * W)
    taps = jnp.stack([jnp.take_along_axis(planes[:, c], lin, axis=1)
                      for c in range(C)], -1)        # [B, 4*T, C]
    taps = taps.reshape(B, 4, OUT, OUT, C).astype(jnp.float32)
    taps = jnp.where(mask4[..., None], taps, 0.0)
    return _blend(taps[:, 0], taps[:, 1], taps[:, 2], taps[:, 3], fx, fy)


def main():
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (B, H, W, 3)).astype(np.uint8))
    cxs = jnp.asarray(rng.uniform(300, 900, (B,)).astype(np.float32))
    cys = jnp.asarray(rng.uniform(200, 600, (B,)).astype(np.float32))
    cxs = cxs.at[0].set(30.0)       # OOB-straddling ROIs: border masking
    cys = cys.at[1].set(830.0)
    szs = jnp.asarray(rng.uniform(300, 420, (B,)).astype(np.float32))
    ths = jnp.asarray(rng.uniform(-0.3, 0.3, (B,)).astype(np.float32))
    jax.block_until_ready(images)

    def shipped(imgs, cx, cy, s, t):
        return jax.vmap(lambda im, a, b, c_, d_: warp.extract_aligned_square(
            im, a, b, c_, d_, out_size=OUT))(imgs, cx, cy, s, t)

    variants = {
        "shipped_4tap": jax.jit(shipped),
        "barrier_4tap": jax.jit(barrier_4tap),
        "rowgather": jax.jit(
            lambda i, a, b, c_, d_: _rowgather(i, a, b, c_, d_, True)),
        "rowgather_nb": jax.jit(
            lambda i, a, b, c_, d_: _rowgather(i, a, b, c_, d_, False)),
    }

    ref = np.asarray(variants["shipped_4tap"](images, cxs, cys, szs, ths))
    for name, fn in variants.items():
        out = np.asarray(fn(images, cxs, cys, szs, ths))
        exact = np.array_equal(out, ref)
        print(f"{name}: bit-exact vs shipped = {exact}"
              + ("" if exact else f"  max|d|={np.abs(out - ref).max()}"),
              flush=True)

    def chained(fn):
        out = fn(images, cxs + 1e-3, cys, szs, ths)
        _ = np.asarray(out.reshape(-1)[0])
        t0 = time.perf_counter()
        for i in range(1, ITERS + 1):
            out = fn(images, cxs + i * 1e-3, cys, szs, ths)
        _ = np.asarray(out.reshape(-1)[0])
        return (time.perf_counter() - t0) / ITERS * 1e3

    acc = {k: [] for k in variants}
    for r in range(ROUNDS):
        for name, fn in variants.items():
            acc[name].append(chained(fn))
        print(f"round {r}: " + "  ".join(
            f"{k} {acc[k][-1]:.2f}" for k in variants), flush=True)
    for name in variants:
        print(f"median {name:14s} {np.median(acc[name]):8.2f} ms/batch",
              flush=True)


if __name__ == "__main__":
    main()
