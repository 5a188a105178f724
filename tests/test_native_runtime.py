"""Native C++ runtime vs python mirror / device path equivalence."""

import numpy as np

from zkevm_circuits_tpu.ops import gf, queues
from zkevm_circuits_tpu.runtime import native
from zkevm_circuits_tpu.utils import poseidon2_ref, queues_ref

P = gf.MODULUS
RNG = np.random.default_rng(0xC44)


def test_native_permutation_matches_mirror():
    states = RNG.integers(0, P, size=(64, 12), dtype=np.uint64)
    out = native.poseidon2_permute_batch(states)
    for i in range(8):
        assert out[i].tolist() == poseidon2_ref.permutation(states[i].tolist()), i
    # all rows processed
    assert (out != states).any(axis=1).all()


def test_native_full_state_chain_matches_device():
    n = 7
    encs = RNG.integers(0, P, size=(n, 8), dtype=np.uint64)
    execute = np.array([1, 1, 0, 1, 1, 0, 1], dtype=bool)
    init = RNG.integers(0, P, size=12, dtype=np.uint64)
    got = native.full_state_chain(encs, execute, init)
    dev = queues.simulate_chain(
        gf.from_u64(init), gf.from_u64(encs), np.asarray(execute)
    ).astype_u64()
    np.testing.assert_array_equal(got, dev)


def test_native_narrow_chain_matches_mirror():
    n = 5
    encs = RNG.integers(0, P, size=(n, 20), dtype=np.uint64)
    init = RNG.integers(0, P, size=4, dtype=np.uint64)
    got = native.narrow_chain(encs, None, init)
    exp = queues_ref.simulate_chain(init.tolist(), encs.tolist())
    for i in range(n + 1):
        assert got[i].tolist() == [x % P for x in exp[i]], i


def test_host_backend_witness_equals_device_backend():
    from zkevm_circuits_tpu.base_structures.memory_query import MemoryQueries
    from zkevm_circuits_tpu.models import ram_permutation as ram

    rows = [
        dict(timestamp=50 + i, memory_page=9, index=i, rw_flag=True, is_ptr=False,
             value=(1 << 100) + i)
        for i in range(5)
    ]
    cfg = ram.RamPermutationConfig(limit=8)
    q = MemoryQueries.from_lists(rows)
    w_dev = ram.generate_witness(q, q, cfg, backend="device")
    w_host = ram.generate_witness(q, q, cfg, backend="host")
    np.testing.assert_array_equal(
        w_dev.chain_unsorted.astype_u64(), w_host.chain_unsorted.astype_u64()
    )
    np.testing.assert_array_equal(w_dev.lhs.astype_u64(), w_host.lhs.astype_u64())
    res = ram.eval_constraints(w_host, cfg)
    assert ram.all_ok(res)
