"""Probe: does Mosaic TPU support vectorized dynamic gathers in Pallas?"""
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("jax", jax.__version__, jax.devices()[0].platform, flush=True)

# Probe 1: jnp.take with a vector of indices from a flat VMEM buffer
def k1(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(src_ref[:], idx_ref[:], axis=0)

src = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
idx = jnp.asarray(np.random.default_rng(0).integers(0, 64, (8, 128)), jnp.int32)

try:
    out = pl.pallas_call(
        k1,
        out_shape=jax.ShapeDtypeStruct((8, 128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, idx)
    print("probe1 take-axis0 OK", out.shape, flush=True)
except Exception as e:
    print("probe1 FAIL:", str(e)[:300], flush=True)

# Probe 2: take_along_axis within rows (per-lane gather along last dim)
def k2(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)

try:
    out = pl.pallas_call(
        k2,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src[:8], idx[:8])
    ref = np.take_along_axis(np.asarray(src[:8]), np.asarray(idx[:8]), axis=1)
    print("probe2 take_along_axis(axis=1) OK, exact:",
          bool(np.array_equal(np.asarray(out), ref)), flush=True)
except Exception as e:
    print("probe2 FAIL:", str(e)[:300], flush=True)

# Probe 3: gather rows by per-row scalar (dynamic row select via one-hot dot)
def k3(src_ref, idx_ref, out_ref):
    sel = idx_ref[:]  # [8, 1] int32 row ids
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (8, 64), 1) == sel).astype(jnp.float32)
    out_ref[:] = jnp.dot(onehot, src_ref[:], preferred_element_type=jnp.float32)

try:
    out = pl.pallas_call(
        k3,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, idx[:8, :1])
    print("probe3 onehot-dot OK", flush=True)
except Exception as e:
    print("probe3 FAIL:", str(e)[:300], flush=True)
