"""linear_hasher circuit: digest equals host keccak256 of concatenated messages."""

import numpy as np

from zkevm_circuits_tpu.base_structures.log_query import LogQueries
from zkevm_circuits_tpu.models import linear_hasher as lh
from zkevm_circuits_tpu.ops.keccak import keccak256_ref


def msg(i):
    return dict(
        address=0x1111 * (i + 1), key=0x2222 * (i + 1), read_value=0,
        written_value=(0x3333 * (i + 1)) % (1 << 256), aux_byte=2, rw_flag=True,
        rollback=False, is_service=(i % 2 == 0), shard_id=0,
        tx_number_in_block=i + 1, timestamp=50 + i,
    )


def expected_hash(rows):
    data = b"".join(lh.serialize_l2_l1_ref(r) for r in rows)
    return keccak256_ref(data)


def test_digest_matches_host_keccak():
    for count in (1, 2, 3):  # crosses the 136-byte rate boundary at 2
        rows = [msg(i) for i in range(count)]
        cfg = lh.LinearHasherConfig(limit=4)
        w = lh.generate_witness_jit(LogQueries.from_lists(rows), cfg)
        res = lh.eval_constraints_jit(w, cfg)
        for name, ok in res.items():
            assert bool(np.asarray(ok).all()), (count, name)
        got = bytes(int(b) for b in np.asarray(w.digest))
        assert got == expected_hash(rows), count


def test_empty_queue_gives_empty_hash():
    cfg = lh.LinearHasherConfig(limit=4)
    w = lh.generate_witness_jit(LogQueries.zeros((0,)), cfg)
    res = lh.eval_constraints_jit(w, cfg)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    got = bytes(int(b) for b in np.asarray(w.digest))
    assert got == keccak256_ref(b"")


def test_corrupted_block_rejected():
    rows = [msg(0), msg(1)]
    cfg = lh.LinearHasherConfig(limit=4)
    w = lh.generate_witness_jit(LogQueries.from_lists(rows), cfg)
    bad_lo = np.asarray(w.block_lo).copy()
    bad_lo[0, 0] ^= 1
    import dataclasses as dc
    import jax.numpy as jnp

    wb = dc.replace(w, block_lo=jnp.asarray(bad_lo))
    res = lh.eval_constraints_jit(wb, cfg)
    assert not bool(np.asarray(res["blocks"]).all())
