"""Device mesh construction for multi-chip runs.

The reference has no distributed backend at all (SURVEY.md §2.4) — its
parallel seams are (1) row-parallel constraint evaluation within an instance
and (2) instance-level pipelining chained by FSM commitments.  We map those
onto a 2D mesh:

    axis "rows" — row (trace) sharding within circuit instances (SP/DP analog)
    axis "inst" — instance sharding across the continuation chain (PP analog)

Collectives ride ICI: ppermute halo exchanges for cross-row references,
all_gather for grand-product / counter prefix combines.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_rows: int = None, n_inst: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_rows is None:
        n_rows = n // n_inst
    assert n_rows * n_inst == n, (n_rows, n_inst, n)
    arr = np.asarray(devices).reshape(n_inst, n_rows)
    return Mesh(arr, ("inst", "rows"))


def row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("rows"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
