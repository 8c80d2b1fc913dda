"""Multi-chip scaling: data-parallel batch sharding over a device mesh.

The models here are tiny (0.1-2.6 M params each) and latency per image is
dominated by batch throughput, so the correct TPU parallelism is pure data
parallelism: replicate the weights on every chip, shard the image batch
over the ``data`` mesh axis, and let XLA partition the whole fused pipeline
program (including decode/NMS/warps) with zero cross-chip collectives in
steady state.  TP/PP/EP are deliberately N/A at this model scale — there is
no dimension worth cutting (SURVEY §2.4, §5); the reference's analog of
"distribution" was OS isolates on one host.

Weights are replicated via ``NamedSharding(mesh, P())`` and batches via
``P("data")``; XLA inserts nothing but the initial transfers.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_params", "shard_batch", "data_parallel"]


def make_mesh(devices: Optional[list] = None, axis_name: str = "data"
              ) -> Mesh:
    """1-D device mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_params(params, mesh: Mesh):
    """Replicates a params pytree onto every device of the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.device_put(params, repl)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shards the leading (batch) axis of an array pytree over the mesh."""
    sh = NamedSharding(mesh, P(axis_name))
    return jax.device_put(batch, sh)


def data_parallel(program, mesh: Mesh, axis_name: str = "data",
                  n_batch_args: int = 1):
    """Compiles a batched pipeline program for data-parallel execution.

    ``program(params, *batch_args)`` must be the batched (vmapped)
    pipeline fn; the returned callable expects every batch argument's
    leading axis to be divisible by the mesh size.  ``n_batch_args`` is
    the number of batch-sharded arguments after params (1 for the fused
    image program; 5 for the from_detections face-stage program, whose
    images + detection slabs all shard on the batch axis).  Outputs stay
    sharded (one slab shard per chip) so host materialization pulls only
    what it reads.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))

    # A single sharding per argument broadcasts over that argument's pytree.
    return jax.jit(program, in_shardings=(repl,) + (shard,) * n_batch_args,
                   out_shardings=shard)
