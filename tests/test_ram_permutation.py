"""ram_permutation circuit: reference fixture (ram_permutation/mod.rs:559-634)
ported as a golden test, plus negative probes and multi-instance chaining."""

import numpy as np
import jax.numpy as jnp

from zkevm_circuits_tpu.base_structures.memory_query import (
    MemoryQueries,
    encode_memory_queries,
    encode_memory_query_ref,
)
from zkevm_circuits_tpu.isa.system_params import BOOTLOADER_HEAP_PAGE
from zkevm_circuits_tpu.models import ram_permutation as ram
from zkevm_circuits_tpu.utils import protocol


def reference_fixture():
    """The 3-query witness from the reference test (mod.rs:559-634)."""
    unsorted = [
        dict(timestamp=1025, memory_page=30, index=0, rw_flag=False, is_ptr=False,
             value=1125899906842626),
        dict(timestamp=1024, memory_page=30, index=0, rw_flag=True, is_ptr=False,
             value=1125899906842626),
        dict(timestamp=0, memory_page=BOOTLOADER_HEAP_PAGE, index=695, rw_flag=True,
             is_ptr=False, value=12345678),
    ]
    sorted_q = [unsorted[2], unsorted[1], unsorted[0]]
    return unsorted, sorted_q


def test_encoding_matches_host_mirror():
    unsorted, _ = reference_fixture()
    q = MemoryQueries.from_lists(unsorted)
    enc = encode_memory_queries(q).astype_u64()
    for i, row in enumerate(unsorted):
        assert [int(x) for x in enc[i]] == encode_memory_query_ref(row), i


def test_reference_fixture_satisfied():
    unsorted, sorted_q = reference_fixture()
    cfg = ram.RamPermutationConfig(limit=16)
    w = ram.generate_witness(
        MemoryQueries.from_lists(unsorted), MemoryQueries.from_lists(sorted_q), cfg
    )
    res = ram.eval_constraints_jit(w, cfg)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    # exactly one nondeterministic bootloader-heap write in the fixture
    assert int(np.asarray(w.nondet_count)[-1]) == 1
    # grand products agree at completion
    np.testing.assert_array_equal(
        w.lhs.astype_u64()[-1], w.rhs.astype_u64()[-1]
    )


def test_permuted_multiset_required():
    """sorted queue that is NOT a permutation of unsorted -> products differ."""
    unsorted, sorted_q = reference_fixture()
    bad = [dict(r) for r in sorted_q]
    bad[1]["value"] += 1
    cfg = ram.RamPermutationConfig(limit=16)
    w = ram.generate_witness(
        MemoryQueries.from_lists(unsorted), MemoryQueries.from_lists(bad), cfg
    )
    res = ram.eval_constraints_jit(w, cfg)
    assert not bool(np.asarray(res["grand_product_final"]).all())


def test_sort_order_enforced():
    unsorted, sorted_q = reference_fixture()
    bad = [sorted_q[1], sorted_q[0], sorted_q[2]]  # wrong order
    cfg = ram.RamPermutationConfig(limit=16)
    w = ram.generate_witness(
        MemoryQueries.from_lists(unsorted), MemoryQueries.from_lists(bad), cfg
    )
    res = ram.eval_constraints_jit(w, cfg)
    assert not bool(np.asarray(res["sort_order"]).all())


def test_read_consistency_enforced():
    """read-after-write must observe the written value."""
    unsorted = [
        dict(timestamp=10, memory_page=5, index=0, rw_flag=True, is_ptr=False, value=42),
        dict(timestamp=11, memory_page=5, index=0, rw_flag=False, is_ptr=False, value=43),
    ]
    sorted_q = list(unsorted)
    cfg = ram.RamPermutationConfig(limit=4)
    w = ram.generate_witness(
        MemoryQueries.from_lists(unsorted), MemoryQueries.from_lists(sorted_q), cfg
    )
    res = ram.eval_constraints_jit(w, cfg)
    assert not bool(np.asarray(res["read_consistency"]).all())


def test_uninit_read_must_be_zero():
    unsorted = [
        dict(timestamp=10, memory_page=5, index=3, rw_flag=False, is_ptr=False, value=7),
    ]
    cfg = ram.RamPermutationConfig(limit=4)
    w = ram.generate_witness(
        MemoryQueries.from_lists(unsorted), MemoryQueries.from_lists(unsorted), cfg
    )
    res = ram.eval_constraints_jit(w, cfg)
    # row 0 with is_start exempts the cross-row checks, but an uninit read of a
    # fresh cell later must be zero
    unsorted2 = [
        dict(timestamp=1, memory_page=4, index=0, rw_flag=True, is_ptr=False, value=1),
        dict(timestamp=10, memory_page=5, index=3, rw_flag=False, is_ptr=False, value=7),
    ]
    w2 = ram.generate_witness(
        MemoryQueries.from_lists(unsorted2), MemoryQueries.from_lists(unsorted2), cfg
    )
    res2 = ram.eval_constraints_jit(w2, cfg)
    assert not bool(np.asarray(res2["uninit_read_zero"]).all())


def test_multi_instance_chaining():
    """6 queries, limit 2 -> 3 chained instances with masked compact forms."""
    rows = []
    for i in range(6):
        rows.append(
            dict(timestamp=100 + i, memory_page=7, index=i, rw_flag=True,
                 is_ptr=False, value=1000 + i)
        )
    cfg = ram.RamPermutationConfig(limit=2)
    w = ram.generate_witness(
        MemoryQueries.from_lists(rows), MemoryQueries.from_lists(rows), cfg
    )
    res = ram.eval_constraints_jit(w, cfg)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name

    cf = ram.instance_compact_forms(w, cfg)
    assert np.asarray(cf.start_flag).tolist() == [True, False, False]
    assert np.asarray(cf.completion_flag).tolist() == [False, False, True]
    chain = protocol.check_instance_chaining(
        cf.start_flag,
        cf.completion_flag,
        cf.hidden_fsm_input_commitment,
        cf.hidden_fsm_output_commitment,
    )
    # masked commitments: instance 0 fsm_in zeroed, last instance fsm_out zeroed
    z = np.zeros(4, dtype=np.uint64)
    np.testing.assert_array_equal(cf.hidden_fsm_input_commitment.astype_u64()[0], z)
    np.testing.assert_array_equal(cf.hidden_fsm_output_commitment.astype_u64()[-1], z)
    # interior handoff holds
    assert np.asarray(chain["chained"]).all()
    assert np.asarray(chain["fsm_handoff"]).all()
    # observable input commitment identical across instances
    obs = cf.observable_input_commitment.astype_u64()
    assert (obs == obs[0]).all()
    # per-instance public-input commitments are 4 lanes
    assert cf.commitment().astype_u64().shape == (3, 4)
