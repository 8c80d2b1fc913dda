"""A/B: shipped [H*W,3] u8 tap gather vs 4-channel-padded aligned gather."""
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from face_detection_tflite_tpu.ops import warp

ITERS = 15
ROUNDS = 4
B = 16
H, W = 853, 1280
OUT = 192


def grid(cx, cy, size, theta, out_size):
    size_int = jnp.maximum(jnp.floor(size + 0.5), 1.0)
    scale = out_size / size_int
    out_center = out_size / 2.0 + 0.5 * (scale - 1.0)
    xs = jnp.arange(out_size, dtype=jnp.float32)
    ys = jnp.arange(out_size, dtype=jnp.float32)
    dx = (xs[None, :] - out_center) / scale
    dy = (ys[:, None] - out_center) / scale
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    sx = cx + ct * dx + st * dy
    sy = cy - st * dx + ct * dy
    return sx, sy


def pad4_warp(img, cx, cy, size, theta, out_size):
    h, w, c = img.shape
    flat4 = jnp.pad(img, ((0, 0), (0, 0), (0, 1))).reshape(h * w, 4)
    sx, sy = grid(cx, cy, size, theta, out_size)
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    fx = sx - x0; fy = sy - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        val = flat4[yc * w + xc][..., :c].astype(jnp.float32)
        inside = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        return jnp.where(inside[..., None], val, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    wx = fx[..., None]; wy = fy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


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
    cxs = cxs.at[0].set(30.0)
    cys = cys.at[1].set(830.0)
    szs = jnp.asarray(rng.uniform(300, 420, (B,)).astype(np.float32))
    ths = jnp.asarray(rng.uniform(-0.3, 0.3, (B,)).astype(np.float32))
    jax.block_until_ready(images)

    def shipped(imgs, cx, cy, s, t):
        return jax.vmap(lambda im, a, b, c_, d_: warp.extract_aligned_square(
            im, a, b, c_, d_, out_size=OUT))(imgs, cx, cy, s, t)

    def pad4(imgs, cx, cy, s, t):
        return jax.vmap(lambda im, a, b, c_, d_: pad4_warp(
            im, a, b, c_, d_, OUT))(imgs, cx, cy, s, t)

    variants = {"shipped_3ch": jax.jit(shipped), "pad4_aligned": jax.jit(pad4)}
    ref = np.asarray(variants["shipped_3ch"](images, cxs, cys, szs, ths))
    for name, fn in variants.items():
        out = np.asarray(fn(images, cxs, cys, szs, ths))
        print(f"{name}: bit-exact = {np.array_equal(out, ref)}", flush=True)

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
