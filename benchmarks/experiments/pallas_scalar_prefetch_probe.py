"""Probe: does scalar-prefetch unlock a Pallas ROI warp on this stack?

PERF.md's round-2/3 probes established that Mosaic cannot lower an
arbitrary vectorized gather (jnp.take / shape-mismatched take_along_axis)
— the access pattern a bilinear warp needs.  The one untried door was
`pltpu.PrefetchScalarGridSpec`: scalar-prefetched ROI geometry could drive
a *dynamic source-window DMA* per output tile (BlockSpec index_map reading
a prefetched scalar), shrinking the gather's address space from the whole
image to a VMEM window.  That only helps if a within-window arbitrary
gather lowers — which is exactly the Mosaic constraint.  This probe
answers both halves:

  A. scalar-prefetch-driven dynamic window DMA (no gather)   -> OK (exact)
  B. within-window arbitrary 2-D tap gather (the warp's need) -> FAIL
     ("Only 2D gather is supported")
  C. within-window flat take_along_axis, shape-mismatched     -> FAIL
     ("Shape mismatch in input, indices and output")
  D. direct 2-D advanced indexing win[yy, xx]                 -> FAIL
     (Mosaic gather rule asserts indices.shape == input.shape + (1,):
     only per-element single-axis selection lowers)

Conclusion (docs/PERF.md round 5): the window DMA works but nothing can
gather within the window, so a Pallas ROI warp stays inexpressible on
this stack.

Run on the TPU relay: PYTHONPATH=/root/repo:$PYTHONPATH python
benchmarks/experiments/pallas_scalar_prefetch_probe.py
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("jax", jax.__version__, jax.devices()[0].platform,
      jax.devices()[0].device_kind, flush=True)

H, W = 853, 1280          # source image rows/cols (sample shape)
TILE = 8                  # output rows per grid step
OUT = 192                 # crop resolution
K = 256                   # source window rows DMA'd per tile

rng = np.random.default_rng(0)
src = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))
# per-tile source window start row (what ROI geometry would produce),
# block-aligned: index_map returns BLOCK indices, so starts are in units
# of K rows.
n_tiles = OUT // TILE
starts = jnp.asarray(rng.integers(0, H // K, (n_tiles,)), jnp.int32)

# ---------------------------------------------------------------- probe A
# Dynamic window DMA: each grid step copies one row of a K-row window
# whose position is chosen by a prefetched scalar.  Pure DMA, no gather.
def kA(start_ref, win_ref, out_ref):
    out_ref[:] = win_ref[:TILE, :] * 2.0

try:
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((K, W), lambda i, s: (s[i], 0))],
        out_specs=pl.BlockSpec((TILE, W), lambda i, s: (i, 0)),
    )
    out = pl.pallas_call(
        kA,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, W), jnp.float32),
        grid_spec=grid_spec,
    )(starts, src)
    expect = np.concatenate(
        [np.asarray(src)[int(s) * K:int(s) * K + TILE] * 2.0
         for s in np.asarray(starts)])
    print("probe A (scalar-prefetch window DMA) OK, exact:",
          bool(np.allclose(np.asarray(out), expect)), flush=True)
except Exception as e:
    print("probe A FAIL:", str(e)[:400], flush=True)

# ---------------------------------------------------------------- probe B
# Within-window arbitrary 2-D taps: out[r, c] = win[yy[r,c], xx[r,c]].
# This is the access pattern one bilinear tap needs after the window DMA.
def kB(start_ref, win_ref, yy_ref, xx_ref, out_ref):
    win = win_ref[:]
    flat = win.reshape(K * W)
    lin = yy_ref[:] * W + xx_ref[:]
    out_ref[:] = jnp.take(flat, lin.reshape(-1), axis=0).reshape(TILE, OUT)

yy = jnp.asarray(rng.integers(0, K, (n_tiles * TILE, OUT)), jnp.int32)
xx = jnp.asarray(rng.integers(0, W, (n_tiles * TILE, OUT)), jnp.int32)
try:
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((K, W), lambda i, s: (s[i], 0)),
                  pl.BlockSpec((TILE, OUT), lambda i, s: (i, 0)),
                  pl.BlockSpec((TILE, OUT), lambda i, s: (i, 0))],
        out_specs=pl.BlockSpec((TILE, OUT), lambda i, s: (i, 0)),
    )
    out = pl.pallas_call(
        kB,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, OUT), jnp.float32),
        grid_spec=grid_spec,
    )(starts, src, yy, xx)
    s_np = np.asarray(src)
    ok = True
    for t in range(n_tiles):
        win = s_np[int(starts[t]) * K:int(starts[t]) * K + K]
        sl = slice(t * TILE, (t + 1) * TILE)
        expect = win[np.asarray(yy)[sl], np.asarray(xx)[sl]]
        ok &= bool(np.allclose(np.asarray(out)[sl], expect))
    print("probe B (within-window 2-D tap gather) OK, exact:", ok,
          flush=True)
except Exception as e:
    print("probe B FAIL:", str(e)[:400], flush=True)

# ---------------------------------------------------------------- probe C
# Same but via take_along_axis with mismatched shapes ([TILE, OUT] indices
# into a [1, K*W] flat window) — the form probe 2 of
# pallas_gather_probe.py showed only lowers shape-matched.
def kC(start_ref, win_ref, lin_ref, out_ref):
    flat = win_ref[:].reshape(1, K * W)
    lin = lin_ref[:].reshape(1, TILE * OUT)
    out_ref[:] = jnp.take_along_axis(flat, lin, axis=1).reshape(TILE, OUT)

lin = (yy * W + xx).astype(jnp.int32)
try:
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((K, W), lambda i, s: (s[i], 0)),
                  pl.BlockSpec((TILE, OUT), lambda i, s: (i, 0))],
        out_specs=pl.BlockSpec((TILE, OUT), lambda i, s: (i, 0)),
    )
    out = pl.pallas_call(
        kC,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, OUT), jnp.float32),
        grid_spec=grid_spec,
    )(starts, src, lin)
    print("probe C (flat take_along_axis, mismatched) OK", flush=True)
except Exception as e:
    print("probe C FAIL:", str(e)[:400], flush=True)

# ---------------------------------------------------------------- probe D
# Mosaic's probe-B error says "Only 2D gather is supported": try the
# literal 2-D form — advanced indexing win[yy, xx] (two index arrays,
# one output) instead of a flattened 1-D take.
def kD(start_ref, win_ref, yy_ref, xx_ref, out_ref):
    out_ref[:] = win_ref[:][yy_ref[:], xx_ref[:]]

try:
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((K, W), lambda i, s: (s[i], 0)),
                  pl.BlockSpec((TILE, OUT), lambda i, s: (i, 0)),
                  pl.BlockSpec((TILE, OUT), lambda i, s: (i, 0))],
        out_specs=pl.BlockSpec((TILE, OUT), lambda i, s: (i, 0)),
    )
    out = pl.pallas_call(
        kD,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, OUT), jnp.float32),
        grid_spec=grid_spec,
    )(starts, src, yy, xx)
    s_np = np.asarray(src)
    ok = True
    for t in range(n_tiles):
        win = s_np[int(starts[t]) * K:int(starts[t]) * K + K]
        sl = slice(t * TILE, (t + 1) * TILE)
        expect = win[np.asarray(yy)[sl], np.asarray(xx)[sl]]
        ok &= bool(np.allclose(np.asarray(out)[sl], expect))
    print("probe D (win[yy, xx] 2-D advanced indexing) OK, exact:", ok,
          flush=True)
except Exception as e:
    print("probe D FAIL:", str(e)[:400], flush=True)
