"""main_vm v2 (real ISA): per-family end-to-end runs + tamper probes.

Each test assembles a real-ISA program, simulates (models/vm/sim.py), and
re-checks every cycle transition with the row-parallel circuit
(models/vm/circuit.py).  Reference semantics: src/main_vm/* (see module
docstrings for exact file:line citations).
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.isa import opcodes as isa
from zkevm_circuits_tpu.isa import system_params as sp
from zkevm_circuits_tpu.models import vm

enc = isa.encode_instruction
SET_FLAGS = 1 << isa.SET_FLAGS_FLAG_IDX


def run(prog, limit=16, regs=None, check_clean_exit=True, **kw):
    v = vm.EraVM(vm.assemble_code_words(prog), limit, **kw)
    for idx, val in (regs or {}).items():
        ptr = False
        if isinstance(val, tuple):
            val, ptr = val
        v.registers[idx - 1] = [val, ptr]
    w = v.run()
    dw = vm.prepare_device_witness(w)
    res = vm.eval_constraints(dw, limit)
    bad = [k for k, r in res.items() if not bool(np.asarray(r).all())]
    assert not bad, f"failing residuals: {bad}"
    if check_clean_exit:
        assert v.cs_depth == 0 and v.ctx.pc == 0, "dirty exit"
    return v, w


def reg_at(w, row, idx):
    return sum(int(x) << (32 * k) for k, x in enumerate(w["regs"][row, idx - 1]))


def test_arith_families():
    big = (1 << 256) - 1
    r1, r2 = big - 12345, 0xFEDCBA9876543210
    prog = [
        enc(isa.ADD, src0=1, src1=2, dst0=3, flags=SET_FLAGS),
        enc(isa.SUB, src0=1, src1=2, dst0=4),
        enc(isa.MUL, src0=1, src1=2, dst0=5, dst1=6),
        enc(isa.DIV, src0=1, src1=2, dst0=7, dst1=8),
        enc(isa.BINOP, isa.BINOP_XOR, src0=1, src1=2, dst0=9),
        enc(isa.SHIFT, isa.SHIFT_SHL, src0=1, src_mode=isa.SRC_REG,
            src1=10, dst0=11),
        enc(isa.SHIFT, isa.SHIFT_SHR, src0=1, src1=10, dst0=12),
        enc(isa.SHIFT, isa.SHIFT_ROL, src0=1, src1=10, dst0=13),
        enc(isa.SHIFT, isa.SHIFT_ROR, src0=1, src1=10, dst0=14),
        enc(isa.RET, isa.RET_OK),
    ]
    v, w = run(prog, limit=16, regs={1: r1, 2: r2, 10: 37})
    assert reg_at(w, 1, 3) == (r1 + r2) % (1 << 256)
    assert reg_at(w, 2, 4) == (r1 - r2) % (1 << 256)
    assert reg_at(w, 3, 5) == (r1 * r2) % (1 << 256)
    assert reg_at(w, 3, 6) == (r1 * r2) >> 256
    assert reg_at(w, 4, 7) == r1 // r2
    assert reg_at(w, 4, 8) == r1 % r2
    assert reg_at(w, 5, 9) == r1 ^ r2
    assert reg_at(w, 6, 11) == (r1 << 37) % (1 << 256)
    assert reg_at(w, 7, 12) == r1 >> 37
    rot = ((r1 << 37) | (r1 >> (256 - 37))) % (1 << 256)
    assert reg_at(w, 8, 13) == rot
    ror = ((r1 >> 37) | (r1 << (256 - 37))) % (1 << 256)
    assert reg_at(w, 9, 14) == ror


def test_conditional_jump_loop():
    # r1 counts down from 3; loop with conditional jump on NE
    prog = [
        # swapped SUB: computes src1 - src0 = r1 - imm(1)
        enc(isa.SUB, src_mode=isa.SRC_IMM, imm0=1, src1=1, dst0=1,
            flags=SET_FLAGS | (1 << isa.SWAP_OPERANDS_FLAG_IDX_FOR_ARITH_OPCODES)),
        enc(isa.JUMP, src_mode=isa.SRC_IMM, imm0=0, condition=isa.COND_NE),
        enc(isa.RET, isa.RET_OK),
    ]
    v, w = run(prog, limit=16, regs={1: 3})
    assert reg_at(w, 1, 1) == 2 and reg_at(w, 4, 1) == 1


def test_stack_addressing():
    # push two values onto the stack, read them back with offsets
    prog = [
        # push = write at sp, then sp += (reg+imm1); imm1=1 is canonical push
        # (ref utils.rs:356-375: index=current_sp, new_sp=sp+(reg+imm1))
        enc(isa.ADD, src0=1, src1=0, dst_mode=isa.DST_STACK_PUSH_POP, imm1=1),
        enc(isa.ADD, src0=2, src1=0, dst_mode=isa.DST_STACK_PUSH_POP, imm1=1),
        enc(isa.ADD, src_mode=isa.SRC_STACK_OFFSET, imm0=1, src1=0, dst0=5),
        enc(isa.ADD, src_mode=isa.SRC_STACK_OFFSET, imm0=2, src1=0, dst0=6),
        enc(isa.ADD, src_mode=isa.SRC_STACK_PUSH_POP, imm0=1, src1=0, dst0=7),
        enc(isa.RET, isa.RET_OK),
    ]
    v, w = run(prog, limit=16, regs={1: 111, 2: 222})
    assert reg_at(w, 3, 5) == 222
    assert reg_at(w, 4, 6) == 111
    assert reg_at(w, 5, 7) == 222  # pop reads top


def test_context_family():
    prog = [
        enc(isa.CONTEXT, isa.CTX_THIS, dst0=3),
        enc(isa.CONTEXT, isa.CTX_ERGS_LEFT, dst0=4),
        enc(isa.CONTEXT, isa.CTX_SET_CONTEXT_U128, src0=1),
        enc(isa.CONTEXT, isa.CTX_INCREMENT_TX_NUMBER),
        enc(isa.CONTEXT, isa.CTX_META, dst0=5),
        enc(isa.RET, isa.RET_OK),
    ]
    v, w = run(prog, limit=16, regs={1: 0xABCDEF})
    assert reg_at(w, 1, 3) == sp.BOOTLOADER_FORMAL_ADDRESS
    assert int(w["tx_number"][-1]) == 1
    assert list(w["ctx_u128"][3]) == [0xABCDEF, 0, 0, 0]


def test_uma_unaligned_roundtrip():
    val = (0x11223344556677 << 200) | 0xDEADBEEF
    prog = [
        enc(isa.UMA, isa.UMA_HEAP_WRITE, src0=1, src1=2),
        enc(isa.UMA, isa.UMA_HEAP_READ, src0=1, dst0=3),
        enc(isa.UMA, isa.UMA_HEAP_READ, src0=4, dst0=5,
            flags=1 << isa.UMA_INCREMENT_FLAG_IDX, dst1=6),
        enc(isa.RET, isa.RET_OK),
    ]
    v, w = run(prog, limit=16, regs={1: 13, 2: val, 4: 32})
    assert reg_at(w, 2, 3) == val
    assert reg_at(w, 3, 6) == 64  # incremented offset in dst1


def test_uma_fat_ptr_read_with_cleanup():
    # fat pointer: page=heap, start=0, length=40 -> reading at offset 16
    # crosses the slice end; bytes beyond length zero out
    val = int.from_bytes(bytes(range(1, 33)), "big")
    heap_page = sp.BOOTLOADER_BASE_PAGE + 2  # bootloader heap is base+2
    fat = (16) | (heap_page << 32) | (0 << 64) | (40 << 96)
    prog = [
        enc(isa.UMA, isa.UMA_HEAP_WRITE, src0=1, src1=2),      # heap[0..32]=val
        enc(isa.UMA, isa.UMA_FAT_PTR_READ, src0=3, dst0=4),
        enc(isa.RET, isa.RET_OK),
    ]
    v, w = run(prog, limit=16, regs={1: 0, 2: val, 3: (fat, True)})
    got = reg_at(w, 2, 4)
    raw = val.to_bytes(32, "big") + b"\x00" * 32
    expect = bytearray(raw[16:48])
    for i in range(40 - 16, 32):  # bytes past length-offset=24 cleaned
        expect[i] = 0
    assert got == int.from_bytes(bytes(expect), "big")


def test_log_storage_and_events():
    prog = [
        enc(isa.LOG, isa.LOG_STORAGE_WRITE, src0=1, src1=2),
        enc(isa.LOG, isa.LOG_STORAGE_READ, src0=1, dst0=3),
        enc(isa.LOG, isa.LOG_EVENT, src0=1, src1=2,
            flags=1 << isa.FIRST_MESSAGE_FLAG_IDX),
        enc(isa.LOG, isa.LOG_TO_L1_MESSAGE, src0=1, src1=2),
        enc(isa.RET, isa.RET_OK),
    ]
    v, w = run(prog, limit=16, regs={1: 0x55, 2: 777})
    assert reg_at(w, 2, 3) == 777
    kinds = [(q["aux_byte"], q["rollback"]) for q in v.log_tape]
    assert kinds[:4] == [
        (sp.STORAGE_AUX_BYTE, False), (sp.STORAGE_AUX_BYTE, False),
        (sp.EVENT_AUX_BYTE, False), (sp.L1_MESSAGE_AUX_BYTE, False),
    ]


def test_log_revert_appends_rollback():
    prog = [
        enc(isa.LOG, isa.LOG_STORAGE_WRITE, src0=1, src1=2),
        enc(isa.NEAR_CALL, imm0=6, imm1=4),
        enc(isa.LOG, isa.LOG_STORAGE_READ, src0=1, dst0=3),
        enc(isa.RET, isa.RET_OK),
        enc(isa.LOG, isa.LOG_STORAGE_READ, src0=1, dst0=3),  # eh
        enc(isa.RET, isa.RET_OK),
        enc(isa.LOG, isa.LOG_STORAGE_WRITE, src0=1, src1=4),  # callee@6
        enc(isa.LOG, isa.LOG_EVENT, src0=1, src1=4),
        enc(isa.RET, isa.RET_REVERT),
    ]
    v, w = run(prog, limit=24, regs={1: 0x99, 2: 111, 4: 999})
    rolled = [q for q in v.log_tape if q["rollback"]]
    assert len(rolled) == 2  # callee's write + event, appended at revert
    # the rollback entries appear in reverse push order
    assert rolled[0]["aux_byte"] == sp.EVENT_AUX_BYTE
    assert rolled[1]["aux_byte"] == sp.STORAGE_AUX_BYTE


def _callee_fixture():
    callee = vm.assemble_code_words([
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=42, src1=0, dst0=1),
        enc(isa.RET, isa.RET_OK),
    ])
    code_hash = (sp.CODE_HASH_VERSION_BYTE << 248) | (len(callee) << 224) | 0x77
    dest = 0x4242  # fits imm16 so tests can rebuild it after register erasure
    storage = {(0, sp.DEPLOYER_SYSTEM_CONTRACT_ADDRESS, dest): code_hash}
    return callee, code_hash, dest, storage


def test_far_call_roundtrip_and_page_reuse():
    # far_call clobbers r2..r15 (far_call.rs:1050-1071), so the second
    # call's ABI registers must be rebuilt after the first call returns.
    callee, code_hash, dest, storage = _callee_fixture()
    abi = (2 ** 30) << 192
    prog = [
        enc(isa.FAR_CALL, isa.FAR_CALL_NORMAL, src0=1, src1=2, imm0=7),
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=dest, src1=0, dst0=4),
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=1000, src1=0, dst0=5),
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=192, src1=0, dst0=6),
        enc(isa.SHIFT, isa.SHIFT_SHL, src0=5, src1=6, dst0=3),  # ergs<<192
        enc(isa.FAR_CALL, isa.FAR_CALL_NORMAL, src0=3, src1=4, imm0=7),
        enc(isa.RET, isa.RET_OK),
        enc(isa.RET, isa.RET_PANIC),  # eh
    ]
    v, w = run(
        prog, limit=32,
        regs={1: abi, 2: dest},
        storage=storage, code_store={code_hash: callee},
        check_clean_exit=False,
    )
    # second call reuses the decommitted page
    firsts = [q["is_first"] for q in v.decommit_tape]
    assert firsts == [True, False]
    assert v.cs_depth == 0


def test_near_call_ergs_split_and_panic_return():
    # callee burns more ergs than passed -> out-of-ergs panic -> EH
    prog = [
        # pass only r1=40 ergs: jump costs 6/iteration
        enc(isa.NEAR_CALL, src0=1, imm0=4, imm1=3),
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=1, src1=0, dst0=5),  # after ok
        enc(isa.RET, isa.RET_OK),
        enc(isa.RET, isa.RET_OK),  # eh: recover
        # callee@4: loop forever (burns passed ergs)
        enc(isa.JUMP, src_mode=isa.SRC_IMM, imm0=4),
    ]
    v, w = run(prog, limit=32, regs={1: 40})
    # panic propagated to EH which returned ok
    assert v.cs_depth == 0 and v.ctx.pc == 0
    assert bool(w["f_of"].any())  # panic set the OF flag on return


def test_tamper_register_value_fails():
    prog = [
        enc(isa.ADD, src0=1, src1=2, dst0=3),
        enc(isa.RET, isa.RET_OK),
    ]
    v = vm.EraVM(vm.assemble_code_words(prog), 8)
    v.registers[0] = [5, False]
    v.registers[1] = [6, False]
    w = v.run()
    w["regs"][1, 2, 0] ^= 1  # claim a wrong ADD result
    dw = vm.prepare_device_witness(w)
    res = vm.eval_constraints(dw, 8)
    assert not vm.all_ok(res)


def test_tamper_ergs_fails():
    prog = [enc(isa.NOP), enc(isa.RET, isa.RET_OK)]
    v = vm.EraVM(vm.assemble_code_words(prog), 8)
    w = v.run()
    w["ctx_ergs"][1] += 1  # free ergs
    dw = vm.prepare_device_witness(w)
    res = vm.eval_constraints(dw, 8)
    assert not vm.all_ok(res)


def test_tamper_storage_read_fails():
    prog = [
        enc(isa.LOG, isa.LOG_STORAGE_WRITE, src0=1, src1=2),
        enc(isa.LOG, isa.LOG_STORAGE_READ, src0=1, dst0=3),
        enc(isa.RET, isa.RET_OK),
    ]
    v = vm.EraVM(vm.assemble_code_words(prog), 12)
    v.registers[0] = [7, False]
    v.registers[1] = [123, False]
    w = v.run()
    w["storage_read_val"][1, 0] ^= 1  # lie about the read value
    dw = vm.prepare_device_witness(w)
    res = vm.eval_constraints(dw, 12)
    assert not vm.all_ok(res)


def test_tamper_rollback_head_fails():
    prog = [
        enc(isa.NEAR_CALL, imm0=3, imm1=2),
        enc(isa.RET, isa.RET_OK),
        enc(isa.RET, isa.RET_OK),
        enc(isa.LOG, isa.LOG_STORAGE_WRITE, src0=1, src1=2),  # callee@3
        enc(isa.RET, isa.RET_REVERT),
    ]
    v = vm.EraVM(vm.assemble_code_words(prog), 16)
    v.registers[0] = [1, False]
    v.registers[1] = [2, False]
    w = v.run()
    w["rb_prev_head"][1, 0] ^= 1  # forge the claimed head on the log row
    dw = vm.prepare_device_witness(w)
    res = vm.eval_constraints(dw, 16)
    assert not vm.all_ok(res)


def test_out_of_ergs_masks_into_panic():
    # a frame with tiny ergs panics on the first real opcode
    prog = [
        enc(isa.NEAR_CALL, src0=1, imm0=3, imm1=2),
        enc(isa.RET, isa.RET_OK),  # resume: ok
        enc(isa.RET, isa.RET_OK),  # eh
        enc(isa.MUL, src0=2, src1=2, dst0=3, dst1=4),  # callee: can't afford
        enc(isa.RET, isa.RET_OK),
    ]
    v, w = run(prog, limit=16, regs={1: 2, 2: 9})
    assert v.cs_depth == 0 and v.ctx.pc == 0


def test_static_context_forbids_writes():
    # far call with static flag; callee tries SSTORE -> panic -> EH ret ok
    callee = vm.assemble_code_words([
        enc(isa.LOG, isa.LOG_STORAGE_WRITE, src0=1, src1=1),
        enc(isa.RET, isa.RET_OK),
    ])
    code_hash = (sp.CODE_HASH_VERSION_BYTE << 248) | (len(callee) << 224) | 0x88
    dest = 0x20202
    storage = {(0, sp.DEPLOYER_SYSTEM_CONTRACT_ADDRESS, dest): code_hash}
    prog = [
        enc(isa.FAR_CALL, isa.FAR_CALL_NORMAL,
            flags=1 << isa.FAR_CALL_STATIC_FLAG_IDX, src0=1, src1=2, imm0=2),
        enc(isa.RET, isa.RET_OK),
        enc(isa.RET, isa.RET_OK),  # eh
    ]
    v, w = run(
        prog, limit=24, regs={1: (2 ** 28) << 192, 2: dest},
        storage=storage, code_store={code_hash: callee},
    )
    # no storage write made it through
    assert not any(q["rw_flag"] and q["aux_byte"] == sp.STORAGE_AUX_BYTE
                   for q in v.log_tape)
