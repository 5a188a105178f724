"""keccak256_round_function precompile circuit tests."""

import numpy as np

from zkevm_circuits_tpu.isa.system_params import (
    KECCAK256_PRECOMPILE_FORMAL_ADDRESS,
    PRECOMPILE_AUX_BYTE,
)
from zkevm_circuits_tpu.models import keccak256_round_function as kc
from zkevm_circuits_tpu.ops.keccak import keccak256_ref


def make_call(offset, length, in_page=55, out_page=66, out_word=3, ts=100):
    key = (
        offset
        | (length << 32)
        | (out_word << 64)
        | (in_page << 128)
        | (out_page << 160)
    )
    return dict(
        address=KECCAK256_PRECOMPILE_FORMAL_ADDRESS, key=key, read_value=0,
        written_value=0, aux_byte=PRECOMPILE_AUX_BYTE, rw_flag=True,
        rollback=False, is_service=False, shard_id=0, tx_number_in_block=1,
        timestamp=ts,
    )


def make_memory(page, data: bytes):
    mem = {}
    for wi in range((len(data) + 31) // 32):
        chunk = data[32 * wi : 32 * wi + 32].ljust(32, b"\x00")
        mem[(page, wi)] = chunk
    return mem


CFG = kc.KeccakRoundFunctionConfig(max_blocks=8, max_reads=24)


def run(calls, memory):
    w = kc.generate_witness(calls, memory, CFG)
    res = kc.eval_constraints_jit(w, CFG)
    return w, res


def test_single_short_call():
    data = b"hello zk world"
    memory = make_memory(55, data)
    w, res = run([make_call(0, len(data))], memory)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    digest = bytes(int(b) for b in np.asarray(w.digests)[0])
    assert digest == keccak256_ref(data)
    # the memory write carries the digest
    assert int(np.asarray(w.writes.memory_page)[0]) == 66
    assert int(np.asarray(w.writes.index)[0]) == 3


def test_unaligned_multi_block_call():
    payload = bytes(range(256)) * 2  # 512 bytes -> 4 keccak blocks
    offset = 7  # unaligned start
    backing = b"\x00" * offset + payload
    memory = make_memory(55, backing)
    w, res = run([make_call(offset, len(payload))], memory)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    digest = bytes(int(b) for b in np.asarray(w.digests)[0])
    assert digest == keccak256_ref(payload)


def test_rate_aligned_needs_full_padding_round():
    payload = bytes(range(136))  # exactly one rate -> extra padding block
    memory = make_memory(55, payload)
    w, res = run([make_call(0, 136)], memory)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    assert int(np.asarray(w.block_execute).sum()) == 2  # data block + pad block
    digest = bytes(int(b) for b in np.asarray(w.digests)[0])
    assert digest == keccak256_ref(payload)


def test_two_calls():
    d1, d2 = b"first", b"second message that is longer"
    memory = {}
    memory.update(make_memory(55, d1))
    memory.update(make_memory(56, d2))
    calls = [
        make_call(0, len(d1), in_page=55, out_word=0, ts=10),
        make_call(0, len(d2), in_page=56, out_word=1, ts=20),
    ]
    w, res = run(calls, memory)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    assert bytes(int(b) for b in np.asarray(w.digests)[0]) == keccak256_ref(d1)
    assert bytes(int(b) for b in np.asarray(w.digests)[1]) == keccak256_ref(d2)


def test_corrupted_digest_rejected():
    import dataclasses as dc
    import jax.numpy as jnp

    data = b"hello"
    memory = make_memory(55, data)
    w, _ = run([make_call(0, len(data))], memory)
    bad = np.asarray(w.digests).copy()
    bad[0, 0] ^= 1
    wb = dc.replace(w, digests=jnp.asarray(bad))
    res = kc.eval_constraints_jit(wb, CFG)
    assert not bool(np.asarray(res["digest_extraction"]).all())


def test_wrong_memory_value_rejected():
    import dataclasses as dc
    import jax.numpy as jnp

    data = b"hello"
    memory = make_memory(55, data)
    w, _ = run([make_call(0, len(data))], memory)
    vals = np.asarray(w.reads.value).copy()
    vals[0, 7] ^= 0x01000000  # flip a byte inside the covered region
    reads = dc.replace(w.reads, value=jnp.asarray(vals))
    wb = dc.replace(w, reads=reads)
    res = kc.eval_constraints_jit(wb, CFG)
    assert not bool(np.asarray(res["block_bytes"]).all())
