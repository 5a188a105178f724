"""Differential fuzzing of the EraVM (ROADMAP testing item): random
straight-line programs over the arithmetic/binop/shift/UMA families, checked
three ways per seed:

  1. the circuit accepts the simulator's trace (sim == circuit),
  2. the final register file matches an INDEPENDENT python model of the ISA
     semantics (this file re-implements them from the reference definitions,
     not from models/vm/sim.py — a genuine differential oracle),
  3. a random bit-flip in the trace's register columns is rejected.

Fixed limit so all seeds share one compiled evaluator.
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.isa import opcodes as isa
from zkevm_circuits_tpu.models import vm

enc = isa.encode_instruction
MASK256 = (1 << 256) - 1
LIMIT = 32
N_OPS = 18
SEEDS = [101, 202, 303, 404]


def _rand256(rng):
    return int.from_bytes(rng.bytes(32), "big")


class Model:
    """independent straight-line ISA model: regs r0..r15, byte-addressed heap."""

    def __init__(self, init_regs):
        self.regs = [0] * 16
        for i, v in init_regs.items():
            self.regs[i] = v
        self.heap = bytearray(512)

    def step(self, op, a_idx, b_idx, dst, imm=0, variant=None, use_imm=False):
        a = imm if use_imm else self.regs[a_idx]
        b = self.regs[b_idx]
        if op == "add":
            self.regs[dst] = (a + b) & MASK256
        elif op == "sub":
            self.regs[dst] = (a - b) & MASK256
        elif op == "mul":
            self.regs[dst] = (a * b) & MASK256
            self.regs[dst + 1] = (a * b) >> 256
        elif op == "div":
            self.regs[dst] = a // b
            self.regs[dst + 1] = a % b
        elif op == "and":
            self.regs[dst] = a & b
        elif op == "or":
            self.regs[dst] = a | b
        elif op == "xor":
            self.regs[dst] = a ^ b
        elif op == "shl":
            self.regs[dst] = (a << (b & 255)) & MASK256
        elif op == "shr":
            self.regs[dst] = a >> (b & 255)
        elif op == "heap_write":
            off = a  # src0 = byte offset (kept small by construction)
            self.heap[off : off + 32] = b.to_bytes(32, "big")
        elif op == "heap_read":
            off = a
            self.regs[dst] = int.from_bytes(self.heap[off : off + 32], "big")


def _gen_program(rng):
    """returns (instructions, model) with the model advanced to the end."""
    init = {i: _rand256(rng) for i in range(1, 9)}
    m = Model(init)
    prog = []
    ops = ["add", "sub", "mul", "div", "and", "or", "xor", "shl", "shr",
           "imm", "heap_write", "heap_read"]
    for _ in range(N_OPS):
        op = ops[int(rng.integers(0, len(ops)))]
        a = int(rng.integers(1, 14))
        b = int(rng.integers(1, 14))
        # mul/div write a register pair dst,dst+1
        dst = int(rng.integers(1, 14 if op in ("mul", "div") else 15))
        if op == "imm":
            v = int(rng.integers(0, 1 << 16))
            prog.append(enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=v, src1=0,
                            dst0=dst))
            m.step("add", 0, 0, dst, imm=v, use_imm=True)
        elif op in ("add", "sub"):
            code = isa.ADD if op == "add" else isa.SUB
            prog.append(enc(code, src0=a, src1=b, dst0=dst))
            m.step(op, a, b, dst)
        elif op == "mul":
            prog.append(enc(isa.MUL, src0=a, src1=b, dst0=dst, dst1=dst + 1))
            m.step(op, a, b, dst)
        elif op == "div":
            if m.regs[b] == 0:
                continue
            prog.append(enc(isa.DIV, src0=a, src1=b, dst0=dst, dst1=dst + 1))
            m.step(op, a, b, dst)
        elif op in ("and", "or", "xor"):
            variant = {"and": isa.BINOP_AND, "or": isa.BINOP_OR,
                       "xor": isa.BINOP_XOR}[op]
            prog.append(enc(isa.BINOP, variant, src0=a, src1=b, dst0=dst))
            m.step(op, a, b, dst)
        elif op in ("shl", "shr"):
            variant = isa.SHIFT_SHL if op == "shl" else isa.SHIFT_SHR
            prog.append(enc(isa.SHIFT, variant, src0=a, src1=b, dst0=dst))
            m.step(op, a, b, dst)
        elif op == "heap_write":
            off = int(rng.integers(0, 14)) * 32
            prog.append(enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=off, src1=0,
                            dst0=14))
            m.step("add", 0, 0, 14, imm=off, use_imm=True)
            prog.append(enc(isa.UMA, isa.UMA_HEAP_WRITE, src0=14, src1=b))
            m.step("heap_write", 14, b, 0)
        elif op == "heap_read":
            off = int(rng.integers(0, 14)) * 32
            prog.append(enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=off, src1=0,
                            dst0=14))
            m.step("add", 0, 0, 14, imm=off, use_imm=True)
            prog.append(enc(isa.UMA, isa.UMA_HEAP_READ, src0=14, dst0=dst))
            m.step("heap_read", 14, 0, dst)
    prog = prog[: LIMIT - 2]
    prog.append(enc(isa.RET, isa.RET_OK))
    return prog, m, init


@pytest.mark.parametrize("seed", SEEDS)
def test_random_program_differential(seed):
    rng = np.random.default_rng(seed)
    prog, model, init = _gen_program(rng)
    v = vm.EraVM(vm.assemble_code_words(prog), LIMIT)
    for i, val in init.items():
        v.registers[i - 1] = [val, False]
    w = v.run()
    dw = vm.prepare_device_witness(w)
    res = vm.eval_constraints(dw, LIMIT)
    bad = [k for k, r in res.items() if not bool(np.asarray(r).all())]
    assert not bad, f"seed {seed}: failing residuals {bad}"
    assert v.cs_depth == 0 and v.ctx.pc == 0, "dirty exit"

    # independent-model register differential at the RET row
    ret_row = len(prog) - 1
    for idx in range(1, 16):
        got = sum(
            int(x) << (32 * k) for k, x in enumerate(w["regs"][ret_row, idx - 1])
        )
        assert got == model.regs[idx], f"seed {seed}: r{idx} diverges"

    # random trace tamper must be rejected
    row = int(rng.integers(1, ret_row + 1))
    reg = int(rng.integers(0, 15))
    limb = int(rng.integers(0, 8))
    w["regs"][row, reg, limb] ^= 1 << int(rng.integers(0, 32))
    dw = vm.prepare_device_witness(w)
    res = vm.eval_constraints(dw, LIMIT)
    assert not vm.all_ok(res), f"seed {seed}: tamper accepted"
