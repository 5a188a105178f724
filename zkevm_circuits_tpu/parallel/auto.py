"""Automatic row-sharding for any circuit's constraint evaluation.

`parallel/sharded.py` hand-schedules ram_permutation with explicit halo
exchanges.  For the general case, every circuit's `eval_constraints` is
row-parallel by construction (elementwise checks + batched hash kernels +
`associative_scan`s), so XLA's SPMD partitioner can shard it automatically:
place every leading-axis-N array of the witness on a row-sharded
`NamedSharding` and jit — gathers at row boundaries (prev-row references)
become collective-permutes inserted by the partitioner.

This gives DP/SP-style multi-chip scaling for ALL circuit families with zero
per-circuit code; the hand-written path remains the template for kernels
where manual halos beat the partitioner.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_rows(witness, mesh: Mesh, num_rows: int, axis: str = "rows"):
    """device_put every witness leaf whose leading dim is divisible by the
    rows axis onto a row-sharded NamedSharding; everything else replicated."""
    n_shards = mesh.shape[axis]
    row_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    def place(leaf):
        shape = np.shape(leaf)
        if len(shape) >= 1 and shape[0] >= n_shards and shape[0] % n_shards == 0:
            return jax.device_put(leaf, row_sharding)
        return jax.device_put(leaf, replicated)

    return jax.tree_util.tree_map(place, witness)


def eval_sharded(eval_fn, witness, config, mesh: Mesh, num_rows: int):
    """Shard the witness rows over the mesh and run the circuit's
    (config-static) eval under jit — XLA partitions the row-parallel graph."""
    placed = shard_rows(witness, mesh, num_rows)
    jitted = jax.jit(eval_fn, static_argnums=(1,))
    return jitted(placed, config)
