"""keccak256_round_function multi-instance FSM continuation (VERDICT r1 weak
item 8): a multi-call, multi-block run sliced into 1-block instances — every
boundary, including MID-CALL ones, hands the full FSM (keccak state, call
progress, queue states) to the next instance via the ClosedFormInput
protocol (ref keccak256_round_function/input.rs:21-45)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from zkevm_circuits_tpu.isa import system_params as sp
from zkevm_circuits_tpu.models import keccak256_round_function as kc
from zkevm_circuits_tpu.ops import gf
from zkevm_circuits_tpu.ops.keccak import keccak256_ref
from zkevm_circuits_tpu.utils import protocol


def _two_call_witness():
    rng = np.random.default_rng(99)
    page = 31
    memory = {}
    lengths = [200, 150]  # 2 blocks each -> 4 executed blocks
    calls = []
    datas = []
    word_base = 0
    for ci, length in enumerate(lengths):
        data = bytes(int(b) for b in rng.integers(0, 256, size=length))
        datas.append(data)
        for wi in range((length + 31) // 32):
            word = data[32 * wi : 32 * wi + 32]
            memory[(page, word_base + wi)] = word + b"\x00" * (32 - len(word))
        calls.append(
            dict(
                address=sp.KECCAK256_PRECOMPILE_FORMAL_ADDRESS,
                key=(word_base * 32) | (length << 32) | ((100 + ci) << 64)
                | (page << 128) | (page << 160),
                read_value=0, written_value=0,
                aux_byte=sp.PRECOMPILE_AUX_BYTE, rw_flag=False,
                rollback=False, is_service=False, shard_id=0,
                tx_number_in_block=0, timestamp=10 + 100 * ci,
            )
        )
        word_base += (length + 31) // 32
    cfg = kc.KeccakRoundFunctionConfig(max_blocks=4, max_reads=16)
    w = kc.generate_witness(calls, memory, cfg)
    return w, cfg, datas


def test_multi_instance_chaining_mid_call():
    w, cfg, datas = _two_call_witness()
    res = kc.eval_constraints_jit(w, cfg)
    assert kc.all_ok(res), [k for k, v in res.items() if not np.asarray(v).all()]
    for ci, data in enumerate(datas):
        assert bytes(int(b) for b in np.asarray(w.digests)[ci]) == keccak256_ref(data)

    forms = kc.instance_compact_forms(w, cfg, limit_blocks=1)
    assert np.asarray(forms.start_flag).shape[0] == 4
    chain = protocol.check_instance_chaining(
        forms.start_flag, forms.completion_flag,
        forms.hidden_fsm_input_commitment, forms.hidden_fsm_output_commitment,
    )
    assert all(bool(np.asarray(v).all()) for v in chain.values()), chain
    # boundary 1 is MID-CALL (call 0 spans blocks 0..1): the handoff is live
    assert bool(np.asarray(forms.start_flag)[0])
    assert not bool(np.asarray(forms.completion_flag)[0])
    assert bool(np.asarray(forms.completion_flag)[-1])
    interior = forms.hidden_fsm_output_commitment[0].astype_u64()
    assert interior.any()


def test_boundary_state_tamper_caught_by_eval():
    w, cfg, _ = _two_call_witness()
    state_lo = np.array(w.state_lo, copy=True)
    state_lo[1, 0] ^= 1  # forge the keccak state entering block 1 (mid-call)
    w2 = dataclasses.replace(w, state_lo=jnp.asarray(state_lo))
    res = kc.eval_constraints_jit(w2, cfg)
    assert not kc.all_ok(res)


def test_sha256_multi_instance_chaining():
    from zkevm_circuits_tpu.models import sha256_round_function as sh
    from zkevm_circuits_tpu.ops import sha256 as sha_ops

    page = 44
    memory = {}
    calls = []
    word_base = 0
    for ci, nr in enumerate([2, 2]):  # two calls, two rounds each
        for wi in range(2 * nr):
            payload = bytes([ci * 16 + wi] * 32)
            memory[(page, word_base + wi)] = payload
        calls.append(
            dict(
                address=sp.SHA256_PRECOMPILE_FORMAL_ADDRESS,
                key=(word_base) | ((200 + ci) << 64) | (page << 128)
                | (page << 160) | (nr << 192),
                read_value=0, written_value=0,
                aux_byte=sp.PRECOMPILE_AUX_BYTE, rw_flag=False,
                rollback=False, is_service=False, shard_id=0,
                tx_number_in_block=0, timestamp=10 + 100 * ci,
            )
        )
        word_base += 2 * nr
    cfg = sh.Sha256RoundFunctionConfig(max_rounds=4)
    w = sh.generate_witness(calls, memory, cfg)
    assert sh.all_ok(sh.eval_constraints_jit(w, cfg))
    forms = sh.instance_compact_forms(w, cfg, limit_rounds=1)
    chain = protocol.check_instance_chaining(
        forms.start_flag, forms.completion_flag,
        forms.hidden_fsm_input_commitment, forms.hidden_fsm_output_commitment,
    )
    assert all(bool(np.asarray(v).all()) for v in chain.values()), chain
    assert bool(np.asarray(forms.completion_flag)[-1])


def test_code_unpacker_multi_instance_chaining():
    from zkevm_circuits_tpu.models import code_unpacker_sha256 as cu

    words_a = [100 + i for i in range(5)]   # 3 rounds
    words_b = [900 + i for i in range(3)]   # 2 rounds
    req_a = cu.make_request(words_a, page=70, timestamp=5)
    req_b = cu.make_request(words_b, page=71, timestamp=9)
    store = {req_a["code_hash"]: words_a, req_b["code_hash"]: words_b}
    cfg = cu.CodeUnpackerConfig(max_rounds=5)
    w = cu.generate_witness([req_a, req_b], store, cfg)
    assert cu.all_ok(cu.eval_constraints_jit(w, cfg))
    forms = cu.instance_compact_forms(w, cfg, limit_rounds=1)
    chain = protocol.check_instance_chaining(
        forms.start_flag, forms.completion_flag,
        forms.hidden_fsm_input_commitment, forms.hidden_fsm_output_commitment,
    )
    assert all(bool(np.asarray(v).all()) for v in chain.values()), chain
    # boundary 1 is mid-request (request A spans rounds 0..2)
    assert bool(np.asarray(forms.completion_flag)[-1])
