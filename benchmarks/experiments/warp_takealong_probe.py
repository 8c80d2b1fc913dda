"""Probe: the warp's tap gather as row-wise take_along_axis.

The shipped warp gathers taps via flat[lin] (1-D start-index gather on a
[H*W, C] view) — 18.4 ms per 16-crop batch, the program's top stage.
XLA lowers take_along_axis with per-row indices ~500x faster per
element (0.034 ms for 16x[512,512]).  Same linear indices, different
gather expression: src [B, H*W] with idx [B, n_taps] along axis=1 is
bit-identical data movement.  Times, per dtype/layout:

  A. current form: img.reshape(H*W, C)[lin] per image (vmapped)
  B. take_along_axis: planes [B*C, H*W], idx [B*C, 4*192*192]
  C. same but u8 source
  D. channels-last single gather: [B, H*W] x3 channel loop
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

print("jax", jax.__version__, jax.devices()[0].platform, flush=True)
B, H, W, C, OUT = 16, 853, 1280, 3, 192
NT = 4 * OUT * OUT  # four bilinear taps per output pixel
rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 255, (B, H, W, C)), jnp.uint8)
lin = jnp.asarray(rng.integers(0, H * W, (B, NT)), jnp.int32)

def timeit(name, f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(12)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 12 * 1e3
    print(f"{name}: {dt:.3f} ms/batch", flush=True)
    return out

# A: shipped formulation (per-image flat fancy-index, vmapped), u8 source
@jax.jit
def fA(img, lin):
    def one(im, li):
        flat = im.reshape(H * W, C)
        return flat[li]                      # [NT, C] gather
    return jax.vmap(one)(img, lin)

# B: row-wise take_along_axis over channel planes, u8
@jax.jit
def fB(img, lin):
    planes = img.transpose(0, 3, 1, 2).reshape(B * C, H * W)
    idx = jnp.repeat(lin, C, axis=0)         # [B*C, NT]
    return jnp.take_along_axis(planes, idx, axis=1)

# C: row-wise take_along_axis, f32 planes
imgf = img.astype(jnp.float32)
@jax.jit
def fC(imgf, lin):
    planes = imgf.transpose(0, 3, 1, 2).reshape(B * C, H * W)
    idx = jnp.repeat(lin, C, axis=0)
    return jnp.take_along_axis(planes, idx, axis=1)

# D: per-channel loop, u8 (no repeat of the index array)
@jax.jit
def fD(img, lin):
    planes = img.transpose(0, 3, 1, 2)       # [B, C, H, W]
    flat = planes.reshape(B, C, H * W)
    return jnp.stack([jnp.take_along_axis(flat[:, c], lin, axis=1)
                      for c in range(C)], axis=-1)

a = timeit("A shipped flat fancy-index u8", fA, img, lin)
b = timeit("B take_along planes u8       ", fB, img, lin)
c = timeit("C take_along planes f32      ", fC, imgf, lin)
d = timeit("D take_along per-channel u8  ", fD, img, lin)

# bit-equivalence A vs B/D
a_np = np.asarray(a)                          # [B, NT, C]
b_np = np.asarray(b).reshape(B, C, NT).transpose(0, 2, 1)
d_np = np.asarray(d)
print("B == A:", bool(np.array_equal(a_np, b_np)),
      " D == A:", bool(np.array_equal(a_np, d_np)), flush=True)
