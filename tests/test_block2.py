"""Full 13-circuit block on the real-ISA EraVM (runtime/block2.py).

One bootloader program exercises every circuit type: storage write/read
(9, 10), event (11), L1 message (12 -> 13), three far_calls to kernel
precompile contracts that decommit (2, 3) and issue precompile-call logs
routed by demux (4) into ecrecover (7), keccak (5) and sha256 (6); the
memory-queue union (boot heap init ++ unpacker writes ++ VM tape ++
precompile traffic) closes under ram_permutation (8); the VM itself runs
as 4 chained ClosedFormInput instances (1); the scheduler orchestrates.

Reference dataflow: `src/scheduler/mod.rs:239-452`.
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.isa import opcodes as isa
from zkevm_circuits_tpu.isa import system_params as sp
from zkevm_circuits_tpu.models import code_unpacker_sha256 as cu
from zkevm_circuits_tpu.models import vm
from zkevm_circuits_tpu.ops import secp256k1 as ec
from zkevm_circuits_tpu.ops.keccak import keccak256_ref
from zkevm_circuits_tpu.runtime import block2

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-suite tier (see pyproject markers)

enc = isa.encode_instruction
FIRST = 1 << isa.FIRST_MESSAGE_FLAG_IDX
SWAP = 1 << isa.SWAP_OPERANDS_FLAG_IDX_FOR_ARITH_OPCODES


def _imm(val, dst):
    return enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=val, src1=0, dst0=dst)


def _shl(src, amt_reg, dst):
    return enc(isa.SHIFT, isa.SHIFT_SHL, src0=src, src1=amt_reg, dst0=dst)


def _odd_words(prog):
    words = vm.assemble_code_words(prog)
    if len(words) % 2 == 0:
        words.append(0)
    return words


def _ecrecover_contract():
    # r1 = forwarded heap fat ptr; extract its page, call the precompile on
    # words 0..3 of the caller's heap, read (success, address) back.
    prog = [
        _imm(32, 3),
        enc(isa.SHIFT, isa.SHIFT_SHR, src0=1, src1=3, dst0=2),  # ptr>>32
        _imm(1, 4),
        _shl(4, 3, 4),                                          # 2^32
        enc(isa.SUB, src_mode=isa.SRC_IMM, imm0=1, src1=4, dst0=4,
            flags=SWAP),                                        # 2^32-1
        enc(isa.BINOP, isa.BINOP_AND, src0=2, src1=4, dst0=2),  # page
        _imm(128, 3),
        _shl(2, 3, 2),                                          # in_page<<128
        enc(isa.LOG, isa.LOG_PRECOMPILE_CALL, src0=2, src1=0),
        enc(isa.UMA, isa.UMA_HEAP_READ, src0=0, dst0=5),        # success
        _imm(32, 6),
        enc(isa.UMA, isa.UMA_HEAP_READ, src0=6, dst0=7),        # address
        enc(isa.RET, isa.RET_OK),
    ]
    return _odd_words(prog)


def _keccak_contract():
    # write "deadbeef" bytes to heap word 0, hash 4 bytes, read digest back
    prog = [
        _imm(0xDEAD, 2),
        _imm(16, 3),
        _shl(2, 3, 2),
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=0xBEEF, src1=2, dst0=2),
        _imm(224, 3),
        _shl(2, 3, 2),                                          # word value
        enc(isa.UMA, isa.UMA_HEAP_WRITE, src0=0, src1=2),
        _imm(4, 4),
        _imm(32, 5),
        _shl(4, 5, 4),                                          # len 4 <<32
        _imm(10, 6),
        _imm(64, 7),
        _shl(6, 7, 6),                                          # out word 10
        enc(isa.ADD, src0=4, src1=6, dst0=4),
        enc(isa.LOG, isa.LOG_PRECOMPILE_CALL, src0=4, src1=0),
        _imm(320, 8),
        enc(isa.UMA, isa.UMA_HEAP_READ, src0=8, dst0=9),        # digest
        enc(isa.RET, isa.RET_OK),
    ]
    return _odd_words(prog)


def _sha256_contract():
    # pre-padded single block of sha256("abc") in heap words 0..1
    prog = [
        _imm(0x6162, 2),
        _imm(16, 3),
        _shl(2, 3, 2),
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=0x6380, src1=2, dst0=2),
        _imm(224, 3),
        _shl(2, 3, 2),
        enc(isa.UMA, isa.UMA_HEAP_WRITE, src0=0, src1=2),       # word 0
        _imm(24, 4),
        _imm(32, 5),
        enc(isa.UMA, isa.UMA_HEAP_WRITE, src0=5, src1=4),       # word 1: bitlen
        _imm(1, 6),
        _imm(192, 7),
        _shl(6, 7, 6),                                          # 1 round <<192
        _imm(12, 8),
        _imm(64, 9),
        _shl(8, 9, 8),                                          # out word 12
        enc(isa.ADD, src0=6, src1=8, dst0=6),
        enc(isa.LOG, isa.LOG_PRECOMPILE_CALL, src0=6, src1=0),
        enc(isa.RET, isa.RET_OK),
    ]
    return _odd_words(prog)


def _abi_ergs(len_bytes=0):
    """Instructions building a far_call ABI (204800 ergs, heap fwd) in r1."""
    out = [
        _imm(800, 5),
        _imm(8, 6),
        _shl(5, 6, 5),      # 204800
        _imm(192, 6),
        _shl(5, 6, 1),      # ergs<<192 -> r1
    ]
    if len_bytes:
        out += [
            _imm(len_bytes, 6),
            _imm(96, 7),
            _shl(6, 7, 6),
            enc(isa.ADD, src0=1, src1=6, dst0=1),
        ]
    return out


def _bootloader(eh):
    eh_imm = eh or 0
    prog = [
        # storage + events + l1
        _imm(5, 2),
        _imm(77, 3),
        enc(isa.LOG, isa.LOG_STORAGE_WRITE, src0=2, src1=3),
        enc(isa.LOG, isa.LOG_STORAGE_READ, src0=2, dst0=4),
        enc(isa.LOG, isa.LOG_EVENT, src0=2, src1=3, flags=FIRST),
        enc(isa.LOG, isa.LOG_TO_L1_MESSAGE, src0=2, src1=3),
    ]
    # ecrecover: forward heap words 0..3 (h, v, r, s)
    prog += _abi_ergs(len_bytes=128)
    prog += [
        _imm(sp.ECRECOVER_PRECOMPILE_FORMAL_ADDRESS, 2),
        enc(isa.FAR_CALL, isa.FAR_CALL_NORMAL, src0=1, src1=2, imm0=eh_imm),
    ]
    # keccak
    prog += _abi_ergs()
    prog += [
        _imm(sp.KECCAK256_PRECOMPILE_FORMAL_ADDRESS, 2),
        enc(isa.FAR_CALL, isa.FAR_CALL_NORMAL, src0=1, src1=2, imm0=eh_imm),
    ]
    # sha256
    prog += _abi_ergs()
    prog += [
        _imm(sp.SHA256_PRECOMPILE_FORMAL_ADDRESS, 2),
        enc(isa.FAR_CALL, isa.FAR_CALL_NORMAL, src0=1, src1=2, imm0=eh_imm),
    ]
    prog += [enc(isa.RET, isa.RET_OK)]
    if eh is not None:
        assert len(prog) == eh
    prog += [enc(isa.RET, isa.RET_PANIC)]  # eh
    return prog


@pytest.fixture(scope="module")
def block_result():
    ec_code = _ecrecover_contract()
    kc_code = _keccak_contract()
    sh_code = _sha256_contract()
    hashes = {
        sp.ECRECOVER_PRECOMPILE_FORMAL_ADDRESS: cu.make_request(ec_code, 0, 0)["code_hash"],
        sp.KECCAK256_PRECOMPILE_FORMAL_ADDRESS: cu.make_request(kc_code, 0, 0)["code_hash"],
        sp.SHA256_PRECOMPILE_FORMAL_ADDRESS: cu.make_request(sh_code, 0, 0)["code_hash"],
    }
    storage = {
        (0, sp.DEPLOYER_SYSTEM_CONTRACT_ADDRESS, a): h for a, h in hashes.items()
    }
    code_store = {
        hashes[sp.ECRECOVER_PRECOMPILE_FORMAL_ADDRESS]: ec_code,
        hashes[sp.KECCAK256_PRECOMPILE_FORMAL_ADDRESS]: kc_code,
        hashes[sp.SHA256_PRECOMPILE_FORMAL_ADDRESS]: sh_code,
    }

    # a valid signature for the ecrecover call
    priv, k = 0xC0FFEE, 0x12345
    h = int.from_bytes(keccak256_ref(b"zk block"), "big")
    r, s, recid = ec.sign(h, priv, k)
    heap = {0: h, 1: recid, 2: r, 3: s}

    eh = len(_bootloader(None)) - 1  # EH row index (two-pass measure)
    code = vm.assemble_code_words(_bootloader(eh))
    cfg = block2.Block2Config(
        vm_limit=128, vm_instance_limit=32, sorter_limit=32, hasher_limit=8,
        unpacker_rounds=16, keccak_blocks=8, keccak_reads=16, sha_rounds=8,
        ec_calls=1, storage_rows=16, ram_limit=128,
        prove_sorter_starks=True,
        prove_full_sorter_chains=True,
        prove_commitments=True,
    )
    res = block2.execute_block2(
        code, cfg, storage=storage, code_store=code_store, bootloader_heap=heap,
    )
    return res, priv


def test_block_ok(block_result):
    res, _ = block_result
    assert res.ok, res.failing()


def test_all_13_types_present(block_result):
    res, _ = block_result
    assert sorted(res.compact_forms) == list(range(1, 14))
    # the VM ran as multiple chained instances
    assert np.asarray(res.compact_forms[1].start_flag).shape[0] == 4


def test_vm_exited_cleanly_with_results(block_result):
    res, priv = block_result
    v = res.vm
    assert v.cs_depth == 0 and v.ctx.pc == 0
    # precompiles all fired
    assert len(v.precompile_calls["keccak"]) == 1
    assert len(v.precompile_calls["sha256"]) == 1
    assert len(v.precompile_calls["ecrecover"]) == 1
    # ecrecover recovered the signer's address (written to callee heap)
    expected = ec.eth_address(ec.mul(priv, (ec.GX, ec.GY)))
    ec_call = v.precompile_calls["ecrecover"][0]
    out_page = (int(ec_call["key"]) >> 160) & 0xFFFFFFFF
    assert v.memory[out_page][0][0] == 1
    assert v.memory[out_page][1][0] == expected
    # keccak digest of b"\xde\xad\xbe\xef" landed at word 10
    kc_call = v.precompile_calls["keccak"][0]
    kc_page = (int(kc_call["key"]) >> 160) & 0xFFFFFFFF
    assert v.memory[kc_page][10][0] == int.from_bytes(
        keccak256_ref(b"\xde\xad\xbe\xef"), "big"
    )


def test_l1_hash_produced(block_result):
    res, _ = block_result
    assert res.l1_messages_hash is not None
    assert res.scheduler_result is not None


def test_sorter_starks_proven(block_result):
    """Every grand-product family's node proof carried a verifier-produced
    STARK verdict (types 2/8/9/11/12), not a witness claim.  The fixture
    config sets prove_full_sorter_chains=True, so each verdict covers the
    FULL argument: grand product AND both Poseidon2 queue-tail chains, with
    Fiat-Shamir challenges re-derived from proven tails (prove_sorter_full)
    — including the n_real==0 empty-queue branch for inactive families."""
    res, _ = block_result
    assert sorted(res.stark_verdicts) == [2, 8, 9, 11, 12]
    assert all(res.stark_verdicts.values()), res.stark_verdicts
    assert res.scheduler_result is not None


def test_all_compact_commitments_proven(block_result):
    """Every circuit type's per-instance ClosedFormInput commitment — the
    payload the scheduler queues into the recursion tree (ref
    fsm_input_output/mod.rs:281-326, scheduler/mod.rs:902-961) — carried a
    verifier-checked sponge-chain STARK proof."""
    res, _ = block_result
    assert sorted(res.commitment_verdicts) == list(range(1, 14))
    assert all(res.commitment_verdicts.values()), res.commitment_verdicts


def test_tamper_breaks_block(block_result):
    res, _ = block_result
    # forge one memory value in the vm tape and re-run just ram_permutation:
    # covered by per-circuit tamper tests; here assert the block-level
    # handoffs are actually being checked
    assert res.handoffs and all(res.handoffs.values())
