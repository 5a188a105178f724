"""Poseidon2 Merkle tree with caps (ops/merkle.py)."""

import numpy as np
import jax.numpy as jnp

from zkevm_circuits_tpu.ops import gf, merkle


def _leaves(n, width=8, seed=5):
    rng = np.random.default_rng(seed)
    return gf.from_u64(rng.integers(0, gf.MODULUS, size=(n, width), dtype=np.uint64))


def test_commit_and_verify_all_leaves():
    n, cap_log2 = 64, 2
    lh = merkle.hash_leaves(_leaves(n))
    levels = merkle.tree_levels(lh, cap_log2)
    cap = levels[-1]
    assert cap.shape == (1 << cap_log2, 4)
    idx = jnp.arange(n, dtype=jnp.uint32)
    paths = gf.stack([merkle.open_path(levels, i) for i in range(n)], axis=0)
    ok = merkle.verify_path(lh, idx, paths, cap)
    assert bool(np.asarray(ok).all())


def test_tampered_leaf_or_path_rejected():
    n, cap_log2 = 32, 1
    lh = merkle.hash_leaves(_leaves(n))
    levels = merkle.tree_levels(lh, cap_log2)
    cap = levels[-1]
    path = merkle.open_path(levels, 7)
    # wrong leaf digest
    bad_leaf = gf.from_u64(np.arange(4, dtype=np.uint64))
    assert not bool(np.asarray(merkle.verify_path(bad_leaf, 7, path, cap)))
    # wrong sibling
    bad_path = gf.GF(
        path.lo.at[0, 0].add(jnp.uint32(1)), path.hi
    )
    assert not bool(np.asarray(merkle.verify_path(lh[7], 7, bad_path, cap)))
    # wrong index
    assert not bool(np.asarray(merkle.verify_path(lh[7], 6, path, cap)))


def test_cap_is_top_level():
    n = 16
    lh = merkle.hash_leaves(_leaves(n))
    # cap_log2=0: single root; consistency with pairwise fold
    root = merkle.commit(lh, 0)
    cur = lh
    while cur.shape[0] > 1:
        pairs = cur.reshape(cur.shape[0] // 2, 2, 4)
        cur = merkle.compress(pairs[:, 0], pairs[:, 1])
    np.testing.assert_array_equal(
        np.asarray(root.astype_u64()), np.asarray(cur.astype_u64())
    )
