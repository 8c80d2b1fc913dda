"""Probe: flat big-N take_along_axis in Pallas vs XLA gather, on TPU."""
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 853, 1280
N = H * W               # 1,091,840
OUT = 192 * 192         # 36,864
rng = np.random.default_rng(0)
src = jnp.asarray(rng.uniform(0, 255, (1, N)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, N, (1, OUT)), jnp.int32)

def k(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)

try:
    fn = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((1, OUT), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = fn(src, idx)
    ref = np.asarray(src)[0][np.asarray(idx)[0]]
    print("flat big-N gather OK, exact:",
          bool(np.array_equal(np.asarray(out)[0], ref)), flush=True)

    # timing: chained enqueues, unique idx per call
    jit_fn = jax.jit(fn)
    xla_fn = jax.jit(lambda s, i: jnp.take_along_axis(s, i, axis=1))
    idxs = [jnp.asarray(rng.integers(0, N, (1, OUT)), jnp.int32) for _ in range(20)]
    for f, name in ((jit_fn, "pallas"), (xla_fn, "xla   ")):
        f(src, idxs[0]).block_until_ready()
        t0 = time.perf_counter()
        outs = [f(src, i) for i in idxs]
        np.asarray(outs[-1]); [o.block_until_ready() for o in outs]
        dt = (time.perf_counter() - t0) / len(idxs) * 1e3
        print(f"{name} 36864-gather: {dt:.3f} ms/call", flush=True)
except Exception as e:
    print("flat big-N FAIL:", str(e)[:500], flush=True)

# u8 source variant
try:
    src8 = src.astype(jnp.uint8)
    def k8(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)
    fn8 = pl.pallas_call(
        k8,
        out_shape=jax.ShapeDtypeStruct((1, OUT), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out8 = fn8(src8, idx)
    ref8 = np.asarray(src8)[0][np.asarray(idx)[0]]
    print("u8 gather OK, exact:", bool(np.array_equal(np.asarray(out8)[0], ref8)), flush=True)
except Exception as e:
    print("u8 FAIL:", str(e)[:300], flush=True)
