"""Speed probe: Mosaic's shape-matched gathers vs the XLA warp taps.

OUTCOME (recorded in docs/PERF.md round 5): every Pallas variant here
FAILS — the axis-0 lax.gather form is "Unsupported gather", and both
shape-matched take_along forms crash the relay's compile helper
(HTTP 500, tpu_compile_helper exit 1).  The XLA comparator timings this
script prints are MEMOIZER-POLLUTED (identical calls; see PERF.md
"Measurement trap") — the honest A/B lives in warp_rowgather_ab.py,
which measured the take_along form 4.5x SLOWER than the shipped warp.
Kept as the record of the compile-crash finding.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

print("jax", jax.__version__, jax.devices()[0].platform, flush=True)
N, S = 16, 512
rng = np.random.default_rng(0)
src = jnp.asarray(rng.uniform(0, 255, (N * S, S)).astype(np.float32))
ridx = jnp.asarray(rng.integers(0, S, (N * S, S, 1)), jnp.int32)
cidx = jnp.asarray(rng.integers(0, S, (N * S, S)), jnp.int32)

def k_row(src_ref, idx_ref, out_ref):
    out_ref[:] = jax.lax.gather(
        src_ref[:], idx_ref[:],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(0,),
            start_index_map=(0,), operand_batching_dims=(1,),
            start_indices_batching_dims=(1,)),
        slice_sizes=(1, 1), mode="clip")

def k_row_tak(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:, :, 0], axis=0)

def k_col(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)

def run(name, kern, idx, idx_spec):
    try:
        fn = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N * S, S), jnp.float32),
            grid=(N,),
            in_specs=[pl.BlockSpec((S, S), lambda i: (i, 0)),
                      idx_spec],
            out_specs=pl.BlockSpec((S, S), lambda i: (i, 0)),
        )
        jfn = jax.jit(fn)
        out = jfn(src, idx)
        out.block_until_ready()
        # correctness vs numpy
        s_np, i_np = np.asarray(src), np.asarray(idx)
        blocks = []
        for t in range(N):
            w = s_np[t * S:(t + 1) * S]
            ii = i_np[t * S:(t + 1) * S]
            if ii.ndim == 3:
                blocks.append(np.take_along_axis(w, ii[:, :, 0], axis=0))
            else:
                blocks.append(np.take_along_axis(w, ii, axis=1))
        exact = bool(np.array_equal(np.asarray(out), np.concatenate(blocks)))
        t0 = time.perf_counter()
        outs = [jfn(src, idx) for _ in range(20)]
        [o.block_until_ready() for o in outs]
        dt = (time.perf_counter() - t0) / 20 * 1e3
        print(f"{name}: {dt:.3f} ms ({N}x[{S},{S}] = {N*S*S/1e6:.1f}M "
              f"elems), exact={exact}", flush=True)
    except Exception as e:
        print(f"{name} FAIL:", str(e)[:300], flush=True)

run("pallas axis0 lax.gather  ", k_row, ridx,
    pl.BlockSpec((S, S, 1), lambda i: (i, 0, 0)))
run("pallas axis0 take_along  ", k_row_tak, ridx,
    pl.BlockSpec((S, S, 1), lambda i: (i, 0, 0)))
run("pallas axis1 take_along  ", k_col, cidx,
    pl.BlockSpec((S, S), lambda i: (i, 0)))

# XLA comparators: same work, whole-array
xla_row = jax.jit(lambda s, i: jnp.take_along_axis(s, i[:, :, 0], axis=0))
xla_col = jax.jit(lambda s, i: jnp.take_along_axis(s, i, axis=1))
for name, f, idx in (("xla axis0 take_along (HBM)", xla_row, ridx),
                     ("xla axis1 take_along (HBM)", xla_col, cidx)):
    f(src, idx).block_until_ready()
    t0 = time.perf_counter()
    outs = [f(src, idx) for _ in range(20)]
    [o.block_until_ready() for o in outs]
    print(f"{name}: {(time.perf_counter()-t0)/20*1e3:.3f} ms", flush=True)
