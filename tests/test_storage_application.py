"""storage_application circuit tests (depth-256 blake2s Merkle tree)."""

import numpy as np

from zkevm_circuits_tpu.models import storage_application as sa
from zkevm_circuits_tpu.ops.keccak import keccak256_ref


def sq(addr, key, rv, wv, rw):
    return dict(
        address=addr, key=key, read_value=rv, written_value=wv, aux_byte=0,
        rw_flag=rw, rollback=False, is_service=False, shard_id=0,
        tx_number_in_block=0, timestamp=0,
    )


CFG = sa.StorageApplicationConfig(max_rows=6)


def test_write_then_read():
    tree = sa.SparseStorageTree()
    root0 = tree.root()
    queries = [
        sq(0xAAAA, 0x01, 0, 42, True),   # fresh write
        sq(0xAAAA, 0x01, 42, 42, False),  # protective read of same slot
    ]
    w = sa.generate_witness(queries, tree, initial_counter=1, config=CFG)
    res = sa.eval_constraints_jit(w, CFG)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    # 3 stage rows: write (2) + read (1)
    assert int(np.asarray(w.row_execute).sum()) == 3
    # the root changed after the write and the tree oracle agrees
    final_root = bytes(
        int(b) for wd in np.asarray(w.roots)[3] for b in wd.tobytes()[:4]
    )
    assert tree.root() != root0
    # counter advanced once (fresh index assigned)
    assert np.asarray(w.counters)[3].tolist() == [2, 0]
    # the diffs digest equals host keccak of the padded record
    rec = sa.state_diff_bytes_ref(
        0xAAAA, 0x01, sa.derive_key_ref(0xAAAA, 0x01), 0, 0, 42
    )
    ext = rec + b"\x00" * (2 * sa.RATE - len(rec))
    digest = bytes(int(x) for x in np.asarray(w.diffs_digest))
    assert digest == keccak256_ref(ext)


def test_overwrite_keeps_index():
    tree = sa.SparseStorageTree()
    q1 = sq(0xB, 0x2, 0, 7, True)
    w1 = sa.generate_witness([q1], tree, initial_counter=5, config=CFG)
    assert sa.all_ok(sa.eval_constraints_jit(w1, CFG))
    # overwrite the same slot: index reused, counter unchanged
    q2 = sq(0xB, 0x2, 7, 9, True)
    w2 = sa.generate_witness([q2], tree, initial_counter=6, config=CFG)
    res = sa.eval_constraints_jit(w2, CFG)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    assert np.asarray(w2.counters)[-1].tolist() == [6, 0]
    assert np.asarray(w2.row_leaf_index)[1].tolist() == [5, 0]


def test_wrong_read_root_rejected():
    import dataclasses as dc
    import jax.numpy as jnp

    tree = sa.SparseStorageTree()
    q = sq(0xC, 0x3, 0, 0, False)  # read of empty slot (value 0)
    w = sa.generate_witness([q], tree, initial_counter=1, config=CFG)
    bad = np.asarray(w.roots).copy()
    bad[0, 0] ^= 1  # claim a different starting root
    wb = dc.replace(w, roots=jnp.asarray(bad))
    res = sa.eval_constraints_jit(wb, CFG)
    assert not bool(np.asarray(res["read_root_match"]).all())


def test_corrupted_path_rejected():
    import dataclasses as dc
    import jax.numpy as jnp

    tree = sa.SparseStorageTree()
    q = sq(0xD, 0x4, 0, 11, True)
    w = sa.generate_witness([q], tree, initial_counter=1, config=CFG)
    bad = np.asarray(w.row_nodes).copy()
    bad[0, 100, 3] ^= 1
    wb = dc.replace(w, row_nodes=jnp.asarray(bad))
    res = sa.eval_constraints_jit(wb, CFG)
    assert not bool(np.asarray(res["merkle_path"]).all())
