"""sha256_round_function precompile circuit tests."""

import hashlib

import numpy as np

from zkevm_circuits_tpu.isa.system_params import (
    PRECOMPILE_AUX_BYTE,
    SHA256_PRECOMPILE_FORMAL_ADDRESS,
)
from zkevm_circuits_tpu.models import sha256_round_function as sh


def sha_pad(data: bytes) -> bytes:
    bitlen = len(data) * 8
    out = bytearray(data) + b"\x80"
    while len(out) % 64 != 56:
        out += b"\x00"
    out += bitlen.to_bytes(8, "big")
    return bytes(out)


def make_call(in_off, num_rounds, in_page=70, out_page=71, out_off=5, ts=200):
    key = (
        in_off | (out_off << 64) | (in_page << 128) | (out_page << 160)
        | (num_rounds << 192)
    )
    return dict(
        address=SHA256_PRECOMPILE_FORMAL_ADDRESS, key=key, read_value=0,
        written_value=0, aux_byte=PRECOMPILE_AUX_BYTE, rw_flag=True,
        rollback=False, is_service=False, shard_id=0, tx_number_in_block=1,
        timestamp=ts,
    )


def memory_from(page, padded: bytes, start_word=0):
    assert len(padded) % 64 == 0
    mem = {}
    for wi in range(len(padded) // 32):
        mem[(page, start_word + wi)] = padded[32 * wi : 32 * wi + 32]
    return mem


CFG = sh.Sha256RoundFunctionConfig(max_rounds=6)


def test_single_block():
    data = b"abc"
    padded = sha_pad(data)
    mem = memory_from(70, padded)
    w = sh.generate_witness([make_call(0, len(padded) // 64)], mem, CFG)
    res = sh.eval_constraints_jit(w, CFG)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    # the written value encodes the true digest (per-limb LE repack)
    digest = hashlib.sha256(data).digest()
    limbs = np.asarray(w.writes.value)[0]
    for k in range(8):
        expect = int.from_bytes(digest[4 * k : 4 * k + 4], "little")
        assert int(limbs[7 - k]) == expect, k


def test_multi_block_and_two_calls():
    d1 = b"x" * 100  # 2 blocks after padding
    d2 = b"y" * 10
    p1, p2 = sha_pad(d1), sha_pad(d2)
    mem = {}
    mem.update(memory_from(70, p1))
    mem.update(memory_from(72, p2))
    calls = [
        make_call(0, len(p1) // 64, in_page=70, out_off=0, ts=10),
        make_call(0, len(p2) // 64, in_page=72, out_off=1, ts=20),
    ]
    w = sh.generate_witness(calls, mem, CFG)
    res = sh.eval_constraints_jit(w, CFG)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    for ci, d in enumerate([d1, d2]):
        digest = hashlib.sha256(d).digest()
        limbs = np.asarray(w.writes.value)[ci]
        assert int(limbs[7]) == int.from_bytes(digest[:4], "little"), ci


def test_wrong_state_rejected():
    import dataclasses as dc
    import jax.numpy as jnp

    padded = sha_pad(b"abc")
    mem = memory_from(70, padded)
    w = sh.generate_witness([make_call(0, 1)], mem, CFG)
    bad = np.asarray(w.state_after).copy()
    bad[0, 0] ^= 1
    wb = dc.replace(w, state_after=jnp.asarray(bad))
    res = sh.eval_constraints_jit(wb, CFG)
    assert not bool(np.asarray(res["compress_transitions"]).all())


def test_num_rounds_mismatch_rejected():
    import dataclasses as dc
    import jax.numpy as jnp

    padded = sha_pad(b"abc")
    mem = memory_from(70, padded)
    w = sh.generate_witness([make_call(0, 1)], mem, CFG)
    # claim an extra round in the ABI without executing it
    bad_exec = np.asarray(w.round_execute).copy()
    bad_exec[1] = False
    w2 = sh.generate_witness([make_call(0, 2)], memory_from(70, sha_pad(b"abc" * 30)), CFG)
    wb = dc.replace(w2, round_execute=jnp.asarray(np.array([True] + [False] * (CFG.max_rounds - 1))))
    res = sh.eval_constraints_jit(wb, CFG)
    assert not bool(np.asarray(res["num_rounds"]).all())
