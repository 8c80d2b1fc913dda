"""A/B: shipped 4-gather flat-index warp vs pair-packed (2 gathers) and
quad-packed (1 gather) formulations.

Packing pre-concatenates x- (and y-) adjacent pixels into wider channel
vectors so each gather fetches 2 (or 4) bilinear taps at once, halving
(quartering) the gather count at the cost of building a 2x (4x) wider
image once per program (hoisted out of the per-ROI vmap).

Exactness: the packed taps are the same uint8 values; OOB taps are masked
by the same `inside` predicates, so results must be bit-identical.
"""
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


def pack_pairs(img):
    """[H, W, C] -> flattened [(H)(W+1), 2C]: row y, slot k holds
    (img[y, k-1], img[y, k]) with one zero pad column on each side."""
    h, w, c = img.shape
    padded = jnp.pad(img, ((0, 0), (1, 1), (0, 0)))          # cols -1..W
    q = jnp.concatenate([padded[:, :-1], padded[:, 1:]], axis=-1)
    return q.reshape(h * (w + 1), 2 * c)


def pair_warp(img, cx, cy, size, theta, out_size):
    h, w, c = img.shape
    flatq = pack_pairs(img)
    sx, sy = grid(cx, cy, size, theta, out_size)
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    fx = sx - x0; fy = sy - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    xq = jnp.clip(x0i, -1, w - 1) + 1        # 0..W slot in packed row

    def row(yi):
        yc = jnp.clip(yi, 0, h - 1)
        pair = flatq[yc * (w + 1) + xq].astype(jnp.float32)  # [o,o,2C]
        va = pair[..., :c]
        vb = pair[..., c:]
        ia = ((x0i >= 0) & (x0i < w) & (yi >= 0) & (yi < h))
        ib = ((x0i + 1 >= 0) & (x0i + 1 < w) & (yi >= 0) & (yi < h))
        return (jnp.where(ia[..., None], va, 0.0),
                jnp.where(ib[..., None], vb, 0.0))

    v00, v01 = row(y0i)
    v10, v11 = row(y0i + 1)
    wx = fx[..., None]; wy = fy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def pack_quads(img):
    """[H, W, C] -> flattened [(H+1)(W+1), 4C] of 2x2 patches."""
    h, w, c = img.shape
    padded = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))          # rows/cols -1..
    q = jnp.concatenate([padded[:-1, :-1], padded[:-1, 1:],
                         padded[1:, :-1], padded[1:, 1:]], axis=-1)
    return q.reshape((h + 1) * (w + 1), 4 * c)


def quad_warp(img, cx, cy, size, theta, out_size):
    h, w, c = img.shape
    flatq = pack_quads(img)
    sx, sy = grid(cx, cy, size, theta, out_size)
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    fx = sx - x0; fy = sy - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    xq = jnp.clip(x0i, -1, w - 1) + 1
    yq = jnp.clip(y0i, -1, h - 1) + 1
    quad = flatq[yq * (w + 1) + xq].astype(jnp.float32)      # [o,o,4C]
    vs = [quad[..., i * c:(i + 1) * c] for i in range(4)]
    ix0 = (x0i >= 0) & (x0i < w)
    ix1 = (x0i + 1 >= 0) & (x0i + 1 < w)
    iy0 = (y0i >= 0) & (y0i < h)
    iy1 = (y0i + 1 >= 0) & (y0i + 1 < h)
    v00 = jnp.where((ix0 & iy0)[..., None], vs[0], 0.0)
    v01 = jnp.where((ix1 & iy0)[..., None], vs[1], 0.0)
    v10 = jnp.where((ix0 & iy1)[..., None], vs[2], 0.0)
    v11 = jnp.where((ix1 & iy1)[..., None], vs[3], 0.0)
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
    img_np = rng.integers(0, 256, (B, H, W, 3)).astype(np.uint8)
    images = jnp.asarray(img_np)
    cxs = jnp.asarray(rng.uniform(300, 900, (B,)).astype(np.float32))
    cys = jnp.asarray(rng.uniform(200, 600, (B,)).astype(np.float32))
    # OOB-straddling ROIs to exercise border masking
    cxs = cxs.at[0].set(30.0)
    cys = cys.at[1].set(830.0)
    szs = jnp.asarray(rng.uniform(300, 420, (B,)).astype(np.float32))
    ths = jnp.asarray(rng.uniform(-0.3, 0.3, (B,)).astype(np.float32))
    jax.block_until_ready(images)

    def shipped(imgs, cx, cy, s, t):
        return jax.vmap(lambda im, a, b, c_, d_: warp.extract_aligned_square(
            im, a, b, c_, d_, out_size=OUT))(imgs, cx, cy, s, t)

    def pair(imgs, cx, cy, s, t):
        return jax.vmap(lambda im, a, b, c_, d_: pair_warp(
            im, a, b, c_, d_, OUT))(imgs, cx, cy, s, t)

    def quad(imgs, cx, cy, s, t):
        return jax.vmap(lambda im, a, b, c_, d_: quad_warp(
            im, a, b, c_, d_, OUT))(imgs, cx, cy, s, t)

    variants = {"shipped_4tap": jax.jit(shipped),
                "pair_2tap": jax.jit(pair),
                "quad_1tap": jax.jit(quad)}

    ref = np.asarray(variants["shipped_4tap"](images, cxs, cys, szs, ths))
    for name, fn in variants.items():
        out = np.asarray(fn(images, cxs, cys, szs, ths))
        exact = np.array_equal(out, ref)
        print(f"{name}: bit-exact vs shipped = {exact}"
              + ("" if exact else
                 f"  max|d|={np.abs(out - ref).max()}"), flush=True)

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
