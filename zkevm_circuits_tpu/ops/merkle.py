"""Poseidon2 Merkle trees with caps — the prover's commitment layer.

The reference prover (boojum) commits to LDE'd witness columns with
Poseidon2 Merkle trees truncated at a cap (the top 2^cap_log2 nodes are the
commitment, saving cap_log2 levels on every opening).  TPU-native shape:
each level is ONE batched 2-to-1 compression over the whole level — the
12-lane permutation maps (pairs, 2, 4) -> (pairs, 4), so a 2^k-leaf tree is
k fused batch-permutation launches with no data-dependent control flow.

  leaf_hashes = hash_leaves(columns)        (n_leaves, LEAF) -> (n_leaves, 4)
  cap         = commit(leaf_hashes, cap_log2)
  path        = open_path(leaf_hashes, index, cap_log2)  (host, witness gen)
  ok          = verify_path(leaf_hash, index, path, cap) (batched, device)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import gf, poseidon2
from .gf import GF

DIGEST = 4


def compress(left: GF, right: GF) -> GF:
    """Batched 2-to-1: permute [left(4) | right(4) | zeros(4)] -> lanes 0..4."""
    batch = left.shape[:-1]
    st = gf.concat([left, right, gf.zeros(batch + (4,))], axis=-1)
    return poseidon2.permutation(st)[..., :DIGEST]


def hash_leaves(columns: GF) -> GF:
    """(n, L) leaf payloads -> (n, 4) leaf digests (zero-pad sponge)."""
    return poseidon2.hash_padded(columns, length_specialize=True)


import functools


@functools.lru_cache(maxsize=1)
def _level_fn():
    """One fused (reshape + compress) program per level size, shared by
    every tree in the framework (STARK commits, FRI layers) — eager
    per-level dispatch cost ~45 ms per 2^17 tree vs ~1 ms jitted."""

    @jax.jit
    def run(cur: GF) -> GF:
        pairs = cur.reshape(cur.shape[0] // 2, 2, DIGEST)
        return compress(pairs[:, 0], pairs[:, 1])

    return run


def tree_levels(leaf_hashes: GF, cap_log2: int):
    """All levels from leaves up to the cap. levels[0] = leaves,
    levels[-1] = (2^cap_log2, 4).  Eager calls use the shared per-size
    jitted level program; traced calls inline."""
    n = leaf_hashes.shape[0]
    log_n = int(n).bit_length() - 1
    assert 1 << log_n == n and cap_log2 <= log_n
    eager = not isinstance(leaf_hashes.lo, jax.core.Tracer)
    levels = [leaf_hashes]
    cur = leaf_hashes
    for _ in range(log_n - cap_log2):
        if eager:
            cur = _level_fn()(cur)
        else:
            pairs = cur.reshape(cur.shape[0] // 2, 2, DIGEST)
            cur = compress(pairs[:, 0], pairs[:, 1])
        levels.append(cur)
    return levels


def commit(leaf_hashes: GF, cap_log2: int) -> GF:
    """(n, 4) leaf digests -> (2^cap_log2, 4) cap."""
    return tree_levels(leaf_hashes, cap_log2)[-1]


def open_path(levels, index: int):
    """Sibling digests for one leaf, bottom-up (host-side witness gen).
    Returns (depth, 4) GF."""
    sibs = []
    idx = index
    for lvl in levels[:-1]:
        sibs.append(lvl[idx ^ 1])
        idx >>= 1
    return gf.stack(sibs, axis=0)


def verify_path(leaf_hash: GF, index, path: GF, cap: GF):
    """Recompute the root-cap entry from a leaf + sibling path; returns a
    boolean.  Batched over leading dims of leaf_hash/index/path."""
    depth = path.shape[-2]
    idx = jnp.asarray(index, jnp.uint32)
    cur = leaf_hash
    for d in range(depth):
        sib = path[..., d, :]
        bit = ((idx >> d) & 1).astype(bool)
        left = gf.select(jnp.expand_dims(bit, -1), sib, cur)
        right = gf.select(jnp.expand_dims(bit, -1), cur, sib)
        cur = compress(left, right)
    cap_idx = (idx >> depth).astype(jnp.int32)
    expected = cap[cap_idx]
    return jnp.all(gf.equal(cur, expected), axis=-1)
