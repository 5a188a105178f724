"""Distributed STARK commit: column-sharded LDE + all-to-all reshard +
row-sharded Merkle over the device mesh (VERDICT r3 item 7 / BASELINE
north star "NTT/LDE with all-to-all between hosts").

The commit phase dominates prover bandwidth: every column is
intt -> coset-scale -> ntt (the LDE), then every LDE ROW is Poseidon2
leaf-hashed and Merkle-folded.  The natural mesh mapping:

  1. COLUMN sharding for the NTT stage — each device transforms m/D whole
     columns locally (an NTT needs its full length-n vector; sharding the
     butterflies themselves would put a collective in every stage, while
     column sharding needs none);
  2. ONE all-to-all to reshard (m/D, N)-per-device into (m, N/D) — the
     transpose that moves from "columns local" to "rows local" rides ICI;
  3. ROW sharding for leaf hashing + subtree building — device d owns the
     contiguous leaf block [d*N/D, (d+1)*N/D) so its Merkle subtree is
     self-contained up to level log2(N/D); the D subtree roots are
     all-gathered and the top levels are computed replicated.

The output is BIT-IDENTICAL to stark._commit_columns (same leaves, same
levels, same cap), so a proof produced with the sharded commit equals the
single-device proof byte for byte — `__graft_entry__.dryrun_multichip`
asserts exactly that on the 8-device mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import gf, merkle, ntt
from ..ops.gf import GF


def _pad_cols(cols: GF, D: int):
    """Zero-pad the column axis to a multiple of the mesh size (zero
    columns LDE to zero rows-lanes and drop out after the gather)."""
    m = int(cols.shape[0])
    pad = (-m) % D
    if pad:
        cols = gf.concat([cols, gf.zeros((pad, cols.shape[1]))], axis=0)
    return cols, m


def sharded_commit_columns(cols: GF, params, mesh: Mesh,
                           axis: str = "rows") -> dict:
    """Drop-in replacement for stark._commit_columns running the LDE,
    reshard, leaf hashing and subtree levels under shard_map on `mesh`."""
    D = mesh.shape[axis]
    cols_p, m_real = _pad_cols(cols, D)
    mp = int(cols_p.shape[0])
    n = int(cols_p.shape[1])
    N = n << params.log_blowup
    assert N % D == 0 and mp % D == 0
    sub = N // D
    cap_levels = int(N).bit_length() - 1 - params.cap_log2
    local_levels = min(int(sub).bit_length() - 1, cap_levels)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(None, axis),          # lde columns (m, N/D-local)
                   P(axis, None),          # leaf hashes (N/D, 4)
                   tuple(P(axis, None) for _ in range(local_levels))),
        check_rep=False,
    )
    def commit_local(cols_loc: GF):
        # 1. local LDE of my column block: (mp/D, N)
        lde_loc = ntt.lde(cols_loc, params.log_blowup, params.coset_shift)
        # 2. all-to-all: (mp/D, N) -> (mp, N/D); rows become local
        lde_rows = GF(
            jax.lax.all_to_all(lde_loc.lo, axis, split_axis=1,
                               concat_axis=0, tiled=True),
            jax.lax.all_to_all(lde_loc.hi, axis, split_axis=1,
                               concat_axis=0, tiled=True),
        )
        # 3. leaf hashing of my contiguous row block
        leaves = GF(lde_rows.lo.T, lde_rows.hi.T)          # (N/D, mp)
        lh = merkle.hash_leaves(leaves[..., :m_real] if m_real != mp
                                else leaves)
        # 4. my Merkle subtree levels (stop at the subtree root or the cap)
        levels = [lh]
        cur = lh
        for _ in range(local_levels):
            pairs = cur.reshape(cur.shape[0] // 2, 2, merkle.DIGEST)
            cur = merkle.compress(pairs[:, 0], pairs[:, 1])
            levels.append(cur)
        return lde_rows, lh, tuple(levels[1:])

    lde_cols_p, leaf_hashes, sub_levels = commit_local(cols_p)
    # global levels: the sharded outputs ARE the global bottom levels (row
    # blocks are contiguous); finish the top levels replicated
    levels = [leaf_hashes] + list(sub_levels)
    cur = levels[-1]
    for _ in range(cap_levels - local_levels):
        pairs = cur.reshape(cur.shape[0] // 2, 2, merkle.DIGEST)
        cur = merkle.compress(pairs[:, 0], pairs[:, 1])
        levels.append(cur)
    cap = levels[-1]
    # assemble the single-device-layout views the prover consumes
    # (device-resident, matching stark._commit_columns's dict):
    # lde_cols_p global is (mp, N) in column layout; leaves are its rows
    lde_cols = lde_cols_p[:m_real]                          # (m, N)
    leaves = GF(
        jnp.transpose(lde_cols_p.lo)[:, :m_real],           # (N, m)
        jnp.transpose(lde_cols_p.hi)[:, :m_real],
    )
    return dict(lde=lde_cols, cap=cap, leaves=leaves, levels=levels)


def make_sharded_commit(mesh: Mesh, axis: str = "rows"):
    """A commit_fn for stark.prove(..., commit_fn=...)."""

    def commit(cols: GF, params) -> dict:
        return sharded_commit_columns(cols, params, mesh, axis)

    return commit
