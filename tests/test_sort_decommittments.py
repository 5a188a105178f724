"""sort_decommittment_requests circuit tests."""

import numpy as np

from zkevm_circuits_tpu.base_structures.decommit_query import (
    DecommitQueries,
    encode_decommit_queries,
    encode_decommit_query_ref,
)
from zkevm_circuits_tpu.models import sort_decommittment_requests as sd


def dq(code_hash, page, ts, is_first=False):
    return dict(code_hash=code_hash, page=page, timestamp=ts, is_first=is_first)


HASH_A = (0x0101 << 224) + 0xAAA
HASH_B = (0x0101 << 224) + 0xBBB


def fixture():
    # VM requested A twice (ts 10, 30) and B once (ts 20); the VM-side queue
    # already carries is_first on first encounters (witness oracle sets it),
    # so the multisets match including the flag
    unsorted = [
        dq(HASH_A, 100, 10, is_first=True),
        dq(HASH_B, 200, 20, is_first=True),
        dq(HASH_A, 100, 30),
    ]
    # sorted by (hash, ts); is_first on first occurrence of each hash
    sorted_q = [
        dq(HASH_A, 100, 10, is_first=True),
        dq(HASH_A, 100, 30),
        dq(HASH_B, 200, 20, is_first=True),
    ]
    return unsorted, sorted_q


def test_encoding_matches_host_mirror():
    rows, _ = fixture()
    q = DecommitQueries.from_lists(rows)
    enc = encode_decommit_queries(q).astype_u64()
    for i, row in enumerate(rows):
        assert [int(x) for x in enc[i]] == encode_decommit_query_ref(row), i


def test_fixture_satisfied_and_dedups():
    unsorted, sorted_q = fixture()
    cfg = sd.DecommitSorterConfig(limit=8)
    w = sd.generate_witness_jit(
        DecommitQueries.from_lists(unsorted), DecommitQueries.from_lists(sorted_q), cfg
    )
    res = sd.eval_constraints_jit(w, cfg)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    # two distinct hashes survive
    assert int(np.asarray(w.result_count)[-1]) == 2
    adds = np.asarray(w.result_add)
    items = w.result_items
    kept = [
        (int(np.asarray(items.timestamp)[i]), bool(np.asarray(items.is_first)[i]))
        for i in range(len(adds))
        if adds[i]
    ]
    # deduped records carry first-encounter timestamps and is_first=true
    assert kept == [(10, True), (20, True)]


def test_missing_is_first_rejected():
    unsorted, sorted_q = fixture()
    bad = [dict(r) for r in sorted_q]
    bad[2]["is_first"] = False
    cfg = sd.DecommitSorterConfig(limit=8)
    w = sd.generate_witness_jit(
        DecommitQueries.from_lists(unsorted), DecommitQueries.from_lists(bad), cfg
    )
    res = sd.eval_constraints_jit(w, cfg)
    assert not bool(np.asarray(res["is_first_markers"]).all())


def test_page_mismatch_within_group_rejected():
    unsorted, sorted_q = fixture()
    bad = [dict(r) for r in sorted_q]
    bad[1]["page"] = 999
    cfg = sd.DecommitSorterConfig(limit=8)
    w = sd.generate_witness_jit(
        DecommitQueries.from_lists(unsorted), DecommitQueries.from_lists(bad), cfg
    )
    res = sd.eval_constraints_jit(w, cfg)
    assert not bool(np.asarray(res["same_page_within_group"]).all())


def test_wrong_order_rejected():
    unsorted, sorted_q = fixture()
    bad = [sorted_q[2], sorted_q[0], sorted_q[1]]
    cfg = sd.DecommitSorterConfig(limit=8)
    w = sd.generate_witness_jit(
        DecommitQueries.from_lists(unsorted), DecommitQueries.from_lists(bad), cfg
    )
    res = sd.eval_constraints_jit(w, cfg)
    assert not bool(np.asarray(res["sort_order"]).all())


def test_multiset_mismatch_rejected():
    unsorted, sorted_q = fixture()
    bad = [dict(r) for r in sorted_q]
    bad[0]["timestamp"] = 11  # not a permutation anymore
    cfg = sd.DecommitSorterConfig(limit=8)
    w = sd.generate_witness_jit(
        DecommitQueries.from_lists(unsorted), DecommitQueries.from_lists(bad), cfg
    )
    res = sd.eval_constraints_jit(w, cfg)
    assert not bool(np.asarray(res["grand_product_final"]).all())


def test_multi_instance_chaining():
    from zkevm_circuits_tpu.utils import protocol
    import numpy as np

    reqs = [dq((0x0101 << 224) + i, 100 + i, 10 * (i + 1), is_first=True) for i in range(6)]
    cfg = sd.DecommitSorterConfig(limit=2)
    w = sd.generate_witness_jit(
        DecommitQueries.from_lists(reqs), DecommitQueries.from_lists(reqs), cfg
    )
    assert sd.all_ok(sd.eval_constraints_jit(w, cfg))
    cf = sd.instance_compact_forms(w, cfg)
    assert np.asarray(cf.start_flag).tolist() == [True, False, False]
    assert np.asarray(cf.completion_flag).tolist() == [False, False, True]
    chain = protocol.check_instance_chaining(
        cf.start_flag, cf.completion_flag,
        cf.hidden_fsm_input_commitment, cf.hidden_fsm_output_commitment,
    )
    assert np.asarray(chain["chained"]).all()
    assert np.asarray(chain["fsm_handoff"]).all()
