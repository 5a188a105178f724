"""storage_validity_by_grand_product circuit tests."""

import numpy as np
import jax.numpy as jnp

from zkevm_circuits_tpu.base_structures.log_query import LogQueries
from zkevm_circuits_tpu.models import storage_validity as sv

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-suite tier (see pyproject markers)


def sq(addr, key, rv, wv, rw, rollback=False):
    return dict(
        address=addr, key=key, read_value=rv, written_value=wv, aux_byte=0,
        rw_flag=rw, rollback=rollback, is_service=False, shard_id=0,
        tx_number_in_block=0, timestamp=77,
    )


def fixture():
    a_read = sq(0xA, 1, 100, 100, False)
    a_write = sq(0xA, 1, 100, 200, True)
    b_write = sq(0xB, 2, 7, 8, True)
    b_rb = sq(0xB, 2, 7, 8, True, rollback=True)
    # VM order (cycle indices 0..3)
    unsorted = [a_read, b_write, a_write, b_rb]
    # sorted by (key, address) then original cycle index
    sorted_rows = [a_read, a_write, b_write, b_rb]
    sorted_ts = [0, 2, 1, 3]
    return unsorted, sorted_rows, sorted_ts


def test_fixture_satisfied():
    unsorted, sorted_rows, sorted_ts = fixture()
    cfg = sv.StorageValidityConfig(limit=8)
    w = sv.generate_witness_jit(
        LogQueries.from_lists(unsorted),
        LogQueries.from_lists(sorted_rows),
        jnp.asarray(sorted_ts, jnp.uint32),
        cfg,
    )
    res = sv.eval_constraints_jit(w, cfg)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    # only cell A produces an output (a write 100 -> 200); B's write was
    # rolled back with no explicit read at depth 0
    assert int(np.asarray(w.result_count)[-1]) == 1
    flags = np.asarray(w.push_flags)
    idx = int(np.flatnonzero(flags)[0])
    items = w.push_items
    assert int(np.asarray(items.address)[idx][0]) == 0xA
    assert bool(np.asarray(items.rw_flag)[idx])  # it's a write
    assert int(np.asarray(items.read_value)[idx][0]) == 100
    assert int(np.asarray(items.written_value)[idx][0]) == 200


def test_protective_read_for_unchanged_readonly_cell():
    # a single read of a cell -> protective read must be emitted
    r = sq(0xC, 5, 42, 42, False)
    cfg = sv.StorageValidityConfig(limit=4)
    w = sv.generate_witness_jit(
        LogQueries.from_lists([r]), LogQueries.from_lists([r]),
        jnp.asarray([0], jnp.uint32), cfg,
    )
    res = sv.eval_constraints_jit(w, cfg)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    assert int(np.asarray(w.result_count)[-1]) == 1
    idx = int(np.flatnonzero(np.asarray(w.push_flags))[0])
    assert not bool(np.asarray(w.push_items.rw_flag)[idx])  # protective read


def test_read_consistency_enforced():
    a_write = sq(0xA, 1, 100, 200, True)
    a_read_wrong = sq(0xA, 1, 999, 999, False)  # reads a wrong value
    cfg = sv.StorageValidityConfig(limit=4)
    w = sv.generate_witness_jit(
        LogQueries.from_lists([a_write, a_read_wrong]),
        LogQueries.from_lists([a_write, a_read_wrong]),
        jnp.asarray([0, 1], jnp.uint32), cfg,
    )
    res = sv.eval_constraints_jit(w, cfg)
    assert not bool(np.asarray(res["read_consistency"]).all())


def test_wrong_shard_rejected():
    r = sq(0xC, 5, 42, 42, False)
    r["shard_id"] = 3
    cfg = sv.StorageValidityConfig(limit=4, shard_id=0)
    w = sv.generate_witness_jit(
        LogQueries.from_lists([r]), LogQueries.from_lists([r]),
        jnp.asarray([0], jnp.uint32), cfg,
    )
    res = sv.eval_constraints_jit(w, cfg)
    assert not bool(np.asarray(res["shard_id"]).all())


def test_key_order_enforced():
    a = sq(0xB, 2, 1, 1, False)
    b = sq(0xA, 1, 2, 2, False)  # smaller key AFTER larger key
    cfg = sv.StorageValidityConfig(limit=4)
    w = sv.generate_witness_jit(
        LogQueries.from_lists([a, b]), LogQueries.from_lists([a, b]),
        jnp.asarray([0, 1], jnp.uint32), cfg,
    )
    res = sv.eval_constraints_jit(w, cfg)
    assert not bool(np.asarray(res["key_order"]).all())


def test_timestamp_order_within_cell_enforced():
    a1 = sq(0xA, 1, 5, 5, False)
    a2 = sq(0xA, 1, 5, 5, False)
    cfg = sv.StorageValidityConfig(limit=4)
    w = sv.generate_witness_jit(
        LogQueries.from_lists([a1, a2]), LogQueries.from_lists([a1, a2]),
        jnp.asarray([1, 0], jnp.uint32), cfg,  # decreasing ts within cell
    )
    res = sv.eval_constraints_jit(w, cfg)
    assert not bool(np.asarray(res["timestamp_order"]).all())


def test_multi_instance_chaining():
    from zkevm_circuits_tpu.utils import protocol

    rows = [sq(0xA + i, i + 1, 0, 10 + i, True) for i in range(6)]
    cfg = sv.StorageValidityConfig(limit=2)
    w = sv.generate_witness_jit(
        LogQueries.from_lists(rows), LogQueries.from_lists(rows),
        jnp.arange(6, dtype=jnp.uint32), cfg,
    )
    res = sv.eval_constraints_jit(w, cfg)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    cf = sv.instance_compact_forms(w, cfg)
    assert np.asarray(cf.start_flag).tolist() == [True, False, False]
    assert np.asarray(cf.completion_flag).tolist() == [False, False, True]
    chain = protocol.check_instance_chaining(
        cf.start_flag, cf.completion_flag,
        cf.hidden_fsm_input_commitment, cf.hidden_fsm_output_commitment,
    )
    assert np.asarray(chain["chained"]).all()
    assert np.asarray(chain["fsm_handoff"]).all()
