"""Bisect WHY extract_rois costs ~18 ms/batch when a bare tap gather of
the same shape costs 0.03 ms.

V0: the real extract_aligned_square, vmapped over 16 images (control).
V1: same math split in two jits: index+weight computation materialized,
    then a gather+blend program (isolates fusion effects).
V2: one jit, but an optimization_barrier between index computation and
    the tap gathers (forces XLA to materialize indices instead of fusing
    the address arithmetic into the gather loop).
V3: one jit, barrier AND taps gathered via ONE [B, 4*OUT*OUT] row-wise
    gather instead of four [B*OUT*OUT] gathers.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from face_detection_tflite_tpu.ops.warp import extract_aligned_square

print("jax", jax.__version__, jax.devices()[0].platform, flush=True)
B, H, W, C, OUT = 16, 853, 1280, 3, 192
rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 255, (B, H, W, C)), jnp.uint8)
cx = jnp.asarray(rng.uniform(300, 900, (B,)), jnp.float32)
cy = jnp.asarray(rng.uniform(250, 600, (B,)), jnp.float32)
size = jnp.asarray(rng.uniform(220, 420, (B,)), jnp.float32)
theta = jnp.asarray(rng.uniform(-0.6, 0.6, (B,)), jnp.float32)

def timeit(name, f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(12)]
    jax.block_until_ready(outs)
    print(f"{name}: {(time.perf_counter()-t0)/12*1e3:.3f} ms/batch", flush=True)
    return out

# V0 control: shipped warp
@jax.jit
def v0(img, cx, cy, size, theta):
    f = lambda im, a, b, s, t: extract_aligned_square(
        im, a, b, s, t, out_size=OUT)
    return jax.vmap(f)(img, cx, cy, size, theta)

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
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]; fy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    return x0i, y0i, fx, fy

def _indices(cx, cy, size, theta):
    x0i, y0i, fx, fy = _grid(cx, cy, size, theta)
    lins, masks = [], []
    for dy_ in (0, 1):
        for dx_ in (0, 1):
            yi = y0i + dy_; xi = x0i + dx_
            yc = jnp.clip(yi, 0, H - 1); xc = jnp.clip(xi, 0, W - 1)
            lins.append(yc * W + xc)
            masks.append((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
    return (jnp.stack(lins), jnp.stack(masks), fx, fy)

def _blend(img, lin4, mask4, fx, fy):
    flat = img.reshape(H * W, C)
    taps = []
    for t in range(4):
        v = flat[lin4[t]].astype(jnp.float32)
        taps.append(jnp.where(mask4[t][..., None], v, 0.0))
    v00, v01, v10, v11 = taps
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy

idx_jit = jax.jit(jax.vmap(_indices))
blend_jit = jax.jit(jax.vmap(_blend))
def v1(img, cx, cy, size, theta):
    lin4, mask4, fx, fy = idx_jit(cx, cy, size, theta)
    return blend_jit(img, lin4, mask4, fx, fy)

@jax.jit
def v2(img, cx, cy, size, theta):
    lin4, mask4, fx, fy = jax.vmap(_indices)(cx, cy, size, theta)
    lin4, mask4, fx, fy = jax.lax.optimization_barrier(
        (lin4, mask4, fx, fy))
    return jax.vmap(_blend)(img, lin4, mask4, fx, fy)

@jax.jit
def v3(img, cx, cy, size, theta):
    lin4, mask4, fx, fy = jax.vmap(_indices)(cx, cy, size, theta)
    lin4, mask4, fx, fy = jax.lax.optimization_barrier(
        (lin4, mask4, fx, fy))
    # one row-wise gather for all four taps: [B, 4*OUT*OUT].
    # vmapped lin4/mask4 are [B, 4, OUT, OUT] (batch-major) — reshape
    # directly; an earlier transpose(1, 0, 2, 3) here scrambled images'
    # tap addresses into each other (B != 4) and invalidated this arm.
    lin = lin4.reshape(B, 4 * OUT * OUT)
    planes = img.transpose(0, 3, 1, 2).reshape(B, C, H * W)
    taps = jnp.stack([jnp.take_along_axis(planes[:, c], lin, axis=1)
                      for c in range(C)], -1)       # [B, 4*T, C]
    taps = taps.reshape(B, 4, OUT, OUT, C).astype(jnp.float32)
    taps = jnp.where(mask4[..., None], taps, 0.0)
    v00, v01, v10, v11 = taps[:, 0], taps[:, 1], taps[:, 2], taps[:, 3]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy

r0 = timeit("V0 shipped fused warp        ", v0, img, cx, cy, size, theta)
r1 = timeit("V1 two-program split         ", v1, img, cx, cy, size, theta)
r2 = timeit("V2 one jit + opt barrier     ", v2, img, cx, cy, size, theta)
r3 = timeit("V3 barrier + row-wise gather ", v3, img, cx, cy, size, theta)
print("V1==V0:", bool(np.array_equal(np.asarray(r0), np.asarray(r1))),
      "V2==V0:", bool(np.array_equal(np.asarray(r0), np.asarray(r2))),
      "V3==V0:", bool(np.array_equal(np.asarray(r0), np.asarray(r3))),
      flush=True)
