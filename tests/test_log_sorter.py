"""log_sorter circuit: rollback cancellation, dedup, result queue."""

import numpy as np
import jax.numpy as jnp

from zkevm_circuits_tpu.base_structures.log_query import (
    LogQueries,
    encode_log_queries,
    encode_log_query_ref,
)
from zkevm_circuits_tpu.models import log_sorter as ls
from zkevm_circuits_tpu.utils import protocol

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-suite tier (see pyproject markers)


def ev(ts, key, val, rollback=False):
    return dict(
        address=0xABCD, key=key, read_value=0, written_value=val, aux_byte=1,
        rw_flag=True, rollback=rollback, is_service=False, shard_id=0,
        tx_number_in_block=1, timestamp=ts,
    )


def fixture():
    f10 = ev(10, 111, 1000)
    f20 = ev(20, 222, 2000)
    rb20 = ev(20, 222, 2000, rollback=True)
    f30 = ev(30, 333, 3000)
    unsorted = [f10, f20, f30, rb20]
    sorted_q = [f10, f20, rb20, f30]
    return unsorted, sorted_q


def test_encoding_matches_host_mirror():
    rows, _ = fixture()
    q = LogQueries.from_lists(rows)
    enc = encode_log_queries(q).astype_u64()
    for i, row in enumerate(rows):
        assert [int(x) for x in enc[i]] == encode_log_query_ref(row), i


def test_fixture_satisfied_and_dedups():
    unsorted, sorted_q = fixture()
    cfg = ls.LogSorterConfig(limit=8)
    w = ls.generate_witness_jit(
        LogQueries.from_lists(unsorted), LogQueries.from_lists(sorted_q), cfg
    )
    res = ls.eval_constraints_jit(w, cfg)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    # two surviving events (ts 10 and ts 30)
    assert int(np.asarray(w.result_count)[-1]) == 2
    adds = np.asarray(w.result_add)
    kept_ts = np.asarray(w.sorted.timestamp)
    # pushes fire when the NEXT row shows a different log; cleaned ts is 0
    items = w.result_items
    surviving_keys = [
        int(k[0]) for k, a in zip(np.asarray(items.key), adds) if a
    ]
    assert surviving_keys == [111, 333]
    cleaned_ts = np.asarray(items.timestamp)[adds]
    assert (cleaned_ts == 0).all()


def test_unordered_rejected():
    unsorted, sorted_q = fixture()
    bad = [sorted_q[0], sorted_q[3], sorted_q[1], sorted_q[2]]
    cfg = ls.LogSorterConfig(limit=8)
    w = ls.generate_witness_jit(
        LogQueries.from_lists(unsorted), LogQueries.from_lists(bad), cfg
    )
    res = ls.eval_constraints_jit(w, cfg)
    assert not bool(np.asarray(res["sort_order"]).all())


def test_duplicate_without_rollback_rejected():
    f10 = ev(10, 1, 5)
    dup10 = ev(10, 1, 5)  # same ts but NOT a rollback
    cfg = ls.LogSorterConfig(limit=4)
    w = ls.generate_witness_jit(
        LogQueries.from_lists([f10, dup10]), LogQueries.from_lists([f10, dup10]), cfg
    )
    res = ls.eval_constraints_jit(w, cfg)
    assert not bool(np.asarray(res["repeated_log_is_rollback"]).all())


def test_rollback_body_mismatch_rejected():
    f20 = ev(20, 222, 2000)
    rb20 = ev(20, 999, 2000, rollback=True)  # wrong key in rollback
    cfg = ls.LogSorterConfig(limit=4)
    w = ls.generate_witness_jit(
        LogQueries.from_lists([f20, rb20]), LogQueries.from_lists([f20, rb20]), cfg
    )
    res = ls.eval_constraints_jit(w, cfg)
    assert not bool(np.asarray(res["rollback_body_equal"]).all())


def test_read_in_queue_rejected():
    r = ev(10, 1, 5)
    r["rw_flag"] = False
    cfg = ls.LogSorterConfig(limit=4)
    w = ls.generate_witness_jit(
        LogQueries.from_lists([r]), LogQueries.from_lists([r]), cfg
    )
    res = ls.eval_constraints_jit(w, cfg)
    assert not bool(np.asarray(res["writes_only"]).all())


def test_multi_instance_chaining():
    rows = [ev(10 * (i + 1), 100 + i, 1000 + i) for i in range(6)]
    cfg = ls.LogSorterConfig(limit=2)
    w = ls.generate_witness_jit(
        LogQueries.from_lists(rows), LogQueries.from_lists(rows), cfg
    )
    res = ls.eval_constraints_jit(w, cfg)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    cf = ls.instance_compact_forms(w, cfg)
    assert np.asarray(cf.start_flag).tolist() == [True, False, False]
    assert np.asarray(cf.completion_flag).tolist() == [False, False, True]
    chain = protocol.check_instance_chaining(
        cf.start_flag, cf.completion_flag,
        cf.hidden_fsm_input_commitment, cf.hidden_fsm_output_commitment,
    )
    assert np.asarray(chain["chained"]).all()
    assert np.asarray(chain["fsm_handoff"]).all()
    # all 6 unique events survive
    assert int(np.asarray(w.result_count)[-1]) == 6


def test_host_tape_pipeline_matches_device():
    """numpy tapes + native chains produce the same witness as the jit path."""
    import numpy as np

    rows = [ev(10 * (i + 1), 100 + i, 1000 + i) for i in range(5)]
    rows.append(ev(60, 105, 1060, rollback=False))
    q = LogQueries.from_lists(rows)
    cfg = ls.LogSorterConfig(limit=8)
    w_dev = ls.generate_witness_jit(q, q, cfg)

    def tapes(lq):
        return dict(
            address=np.asarray(lq.address), key=np.asarray(lq.key),
            read_value=np.asarray(lq.read_value),
            written_value=np.asarray(lq.written_value),
            aux_byte=np.asarray(lq.aux_byte), rw_flag=np.asarray(lq.rw_flag),
            rollback=np.asarray(lq.rollback), is_service=np.asarray(lq.is_service),
            shard_id=np.asarray(lq.shard_id),
            tx_number_in_block=np.asarray(lq.tx_number_in_block),
            timestamp=np.asarray(lq.timestamp),
        )

    w_host = ls.generate_witness_host_tapes(tapes(q), tapes(q), cfg)
    np.testing.assert_array_equal(
        w_dev.chain_unsorted.astype_u64(), w_host.chain_unsorted.astype_u64()
    )
    np.testing.assert_array_equal(
        w_dev.result_chain.astype_u64(), w_host.result_chain.astype_u64()
    )
    np.testing.assert_array_equal(w_dev.lhs.astype_u64(), w_host.lhs.astype_u64())
    np.testing.assert_array_equal(
        np.asarray(w_dev.result_add), np.asarray(w_host.result_add)
    )
    res = ls.eval_constraints_jit(w_host, cfg)
    assert ls.all_ok(res)
