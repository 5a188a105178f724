"""main_vm committed-trace STARK: accept + tamper-the-PROOF tests.

VERDICT r2 item 1: "a tamper test that a flipped register column makes the
*proof* fail (not just the evaluator)".  Reference shape:
src/main_vm/cycle.rs:959-966 (committed geometry), cycle.rs:28-795 (the
relation set), decoded_opcode.rs:233 (decode lookups — here logUp).
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.isa import opcodes as isa
from zkevm_circuits_tpu.models import vm
from zkevm_circuits_tpu.ops import gf
from zkevm_circuits_tpu.prover import vm_air
from zkevm_circuits_tpu.prover.stark import StarkParams, prove

pytestmark = pytest.mark.slow  # 2^11-row trace floor (decode table size)

enc = isa.encode_instruction
SET_FLAGS = 1 << isa.SET_FLAGS_FLAG_IDX
SWAP = 1 << isa.SWAP_OPERANDS_FLAG_IDX_FOR_ARITH_OPCODES


def _run(prog, limit=16, regs=None):
    v = vm.EraVM(vm.assemble_code_words(prog), limit)
    for idx, val in (regs or {}).items():
        v.registers[idx - 1] = [val, False]
    return v.run()


@pytest.fixture(scope="module")
def witness():
    big = (1 << 256) - 1
    prog = [
        enc(isa.ADD, src0=1, src1=2, dst0=3, flags=SET_FLAGS),
        enc(isa.SUB, src0=1, src1=2, dst0=4),
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=7, src1=3, dst0=5),
        enc(isa.SUB, src_mode=isa.SRC_IMM, imm0=1, src1=5, dst0=5,
            flags=SET_FLAGS | SWAP),
        enc(isa.JUMP, src_mode=isa.SRC_IMM, imm0=6),
        enc(isa.NOP),  # skipped over by the jump
        enc(isa.SUB, src0=1, src1=1, dst0=6, flags=SET_FLAGS),
        enc(isa.JUMP, src_mode=isa.SRC_IMM, imm0=9, condition=isa.COND_EQ),
        enc(isa.NOP),
        enc(isa.RET, isa.RET_OK),
    ]
    return _run(prog, limit=16,
                regs={1: big - 12345, 2: 0xFEDCBA9876543210}), 16


def test_residuals_vanish(witness):
    w, limit = witness
    bad = vm_air.debug_residuals(w, limit)
    assert not bad, bad


@pytest.fixture(scope="module")
def base_proof(witness):
    w, limit = witness
    return vm_air.prove_vm_core(w, limit)


def test_prove_and_verify(base_proof):
    proof, s_in, s_out, code_reads, params = base_proof
    assert vm_air.verify_vm_core(proof, s_in, s_out, code_reads, params)


def test_tampered_register_breaks_proof(witness):
    """Flip a register limb in the committed trace: the honest prover's
    FRI refuses (non-low-degree quotient) or the proof fails verification —
    either way the PROOF carries the register file, not the evaluator."""
    w, limit = witness
    phase1, fixed, log_n = vm_air.vm_core_trace(w, limit)
    air = vm_air.vm_core_air()
    params = StarkParams(log_n=log_n)
    _, p1, _, _ = vm_air.layout()
    cols = np.asarray(phase1.astype_u64(), np.uint64)
    # flip a limb of r3's value on the row after the ADD wrote it
    cols[p1.at("regs", 8 * 2 + 0), 1] ^= np.uint64(1)
    bad_trace = gf.from_u64(cols)
    s_in, s_out = vm_air.boundary_state_vectors(bad_trace)
    from zkevm_circuits_tpu.prover.stark import _commit_columns
    from zkevm_circuits_tpu.prover.vm_air import (_RLC, _boundary_publics,
                                                  _build_phase2)
    from zkevm_circuits_tpu.prover.stark import challenges_from_cap

    cap_f = _commit_columns(fixed, params)["cap"]
    cap_1 = _commit_columns(bad_trace, params)["cap"]
    ch, _ = challenges_from_cap(cap_1, air, cap_f)
    code_reads = vm_air.code_read_queries(w, limit)
    public = _boundary_publics(s_in, s_out, ch[_RLC],
                               vm_air.stream_rlc(code_reads, ch[vm_air._MQ]))
    try:
        proof = prove(bad_trace, air, params, public,
                      build_phase2=_build_phase2, fixed_cols=fixed)
    except AssertionError:
        return  # prover refused: the quotient is not low-degree
    assert not vm_air.verify_vm_core(proof, s_in, s_out, code_reads, params)


@pytest.fixture(scope="module")
def alu_witness():
    """Exercises every proven ALU family: mul (small + 512-bit overflow),
    div (normal + by-zero), all four shifts (incl. ror-by-0), all binops."""
    big = (1 << 256) - 1
    prog = [
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=0xBEEF, src1=0, dst0=1),
        enc(isa.MUL, src0=1, src1=1, dst0=2, dst1=3, flags=SET_FLAGS),
        enc(isa.MUL, src0=7, src1=7, dst0=4, dst1=5, flags=SET_FLAGS),
        enc(isa.DIV, src0=7, src1=1, dst0=6, dst1=8, flags=SET_FLAGS),
        enc(isa.DIV, src0=1, src1=9, dst0=10, dst1=11, flags=SET_FLAGS),
        enc(isa.SHIFT, isa.SHIFT_SHL, src0=7, src1=1, dst0=12),
        enc(isa.SHIFT, isa.SHIFT_SHR, src0=7, src1=1, dst0=13,
            flags=SET_FLAGS),
        enc(isa.SHIFT, isa.SHIFT_ROL, src0=7, src1=1, dst0=14),
        enc(isa.SHIFT, isa.SHIFT_ROR, src0=7, src1=9, dst0=12),
        enc(isa.SHIFT, isa.SHIFT_ROR, src0=7, src1=1, dst0=12),
        enc(isa.BINOP, isa.BINOP_AND, src0=7, src1=2, dst0=12,
            flags=SET_FLAGS),
        enc(isa.BINOP, isa.BINOP_OR, src0=7, src1=2, dst0=12),
        enc(isa.BINOP, isa.BINOP_XOR, src0=7, src1=7, dst0=12,
            flags=SET_FLAGS),
        enc(isa.RET, isa.RET_OK),
    ]
    return _run(prog, limit=24,
                regs={1: 0xBEEF, 7: big - 0x1234567890}), 24


def test_alu_residuals_vanish(alu_witness):
    w, limit = alu_witness
    bad = vm_air.debug_residuals(w, limit)
    assert not bad, bad


def test_alu_prove_and_verify(alu_witness):
    w, limit = alu_witness
    proof, s_in, s_out, code_reads, params = vm_air.prove_vm_core(w, limit)
    assert vm_air.verify_vm_core(proof, s_in, s_out, code_reads, params)


def test_forged_product_violates_relations(alu_witness):
    """Claim a wrong MUL product limb (flip both the committed dst byte and
    the multiplier's zl byte, consistently): the multiplier relation itself
    fails — evaluated directly on the trace domain, the same constraints
    the STARK composes (a full tampered PROVE is exercised by
    test_tampered_register_breaks_proof; this keeps the per-family negative
    coverage at residual-check cost)."""
    w, limit = alu_witness
    phase1, fixed, log_n = vm_air.vm_core_trace(w, limit)
    air = vm_air.vm_core_air()
    _, p1, _, _ = vm_air.layout()
    cols = np.asarray(phase1.astype_u64(), np.uint64)
    row = 2  # the big MUL
    assert cols[p1.at("et", isa.MUL), row] == 1
    cols[p1.at("mzl_b", 5), row] ^= np.uint64(1)
    cols[p1.at("dst0_b", 5), row] ^= np.uint64(1)
    bad_trace = gf.from_u64(cols)

    import jax.numpy as jnp

    from zkevm_circuits_tpu.ops.gf import GF
    from zkevm_circuits_tpu.prover.vm_air import _DEBUG_CH, _build_phase2

    p2 = _build_phase2(gf.concat([fixed, bad_trace], axis=0), _DEBUG_CH)
    full = gf.concat([fixed, bad_trace, p2], axis=0)
    rows = GF(full.lo.T, full.hi.T)
    ch = gf.from_u64(np.array(_DEBUG_CH, np.uint64))
    vals = air.row_constraints(rows, ch)
    bad = any(
        int((np.asarray(gf.canonicalize(v).astype_u64()) != 0).sum())
        for v in vals
    )
    assert bad, "forged product limb must violate the row relations"


def test_wrong_boundary_state_rejected(base_proof):
    """The publics bind the FSM boundary state: claiming a different final
    register value fails verification."""
    proof, s_in, s_out, code_reads, params = base_proof
    forged = s_out.copy()
    forged[-1] ^= np.uint64(1)
    assert not vm_air.verify_vm_core(proof, s_in, forged, code_reads, params)


def test_forged_code_read_stream_rejected(base_proof):
    """The macc public binds the executed code stream: claiming a different
    plaintext code-read list fails verification."""
    proof, s_in, s_out, code_reads, params = base_proof
    forged = np.asarray(code_reads, np.uint64).copy()
    forged[0, 3] ^= np.uint64(1)  # flip a code-word byte claim
    assert not vm_air.verify_vm_core(proof, s_in, s_out, forged, params)
