"""Golden tests pinning the reconstructed zkEVM ISA data surface.

The decode table is pure data (isa/opcodes.py); these tests freeze the
current instance so any change — deliberate (swapping in upstream
zkevm_opcode_defs data) or accidental — fails loudly, per the
instance-pinning convention (see utils/challenges.INSTANCE_ID).
"""

import hashlib

import numpy as np

from zkevm_circuits_tpu.isa import opcodes as isa

GOLDEN_DIGEST = "e046dcd26c76aede75ef81b0bc69bfe92e6ff40f24b27e4054a02185e36b4759"


def test_table_shape_and_digest():
    assert len(isa.OPCODES_TABLE) == 1 << isa.OPCODES_TABLE_WIDTH == 2048
    assert isa.OPCODES_PROPS_INTEGER_BITMASKS.dtype == np.uint64
    assert isa.OPCODES_PRICES.dtype == np.uint32
    digest = hashlib.sha256(
        isa.OPCODES_PROPS_INTEGER_BITMASKS.tobytes() + isa.OPCODES_PRICES.tobytes()
    ).hexdigest()
    assert digest == GOLDEN_DIGEST
    # 1084 meaningful rows; the rest are Invalid padding with explicit panic
    n_invalid = sum(1 for v in isa.OPCODES_TABLE if v.op_type == isa.INVALID)
    assert n_invalid == 964
    assert isa.OPCODES_TABLE[0].op_type == isa.INVALID


def test_bitspread_sections_are_one_hot():
    props = isa.OPCODES_PROPS_INTEGER_BITMASKS
    for idx in (0, 1, 500, 1073, 2047):
        s = isa.spread_props(int(props[idx]))
        assert sum(s["op_type_bits"]) == 1
        assert sum(s["variant_bits"]) == 1
        assert sum(s["input_bits"]) == 1
        assert sum(s["output_bits"]) == 1
        v = isa.OPCODES_TABLE[idx]
        assert s["op_type_bits"][v.op_type] == 1
        assert s["variant_bits"][v.variant] == 1
        assert s["input_bits"][v.src_mode] == 1
        assert s["output_bits"][v.dst_mode] == 1


def test_aux_bits():
    # kernel-only: e.g. log.event; static-forbidden: storage write
    vi = isa.variant_index(isa.LOG, isa.LOG_EVENT)
    s = isa.spread_props(int(isa.OPCODES_PROPS_INTEGER_BITMASKS[vi]))
    assert s["kernel_only"] == 1 and s["static_ok"] == 0
    vi = isa.variant_index(isa.LOG, isa.LOG_STORAGE_WRITE)
    s = isa.spread_props(int(isa.OPCODES_PROPS_INTEGER_BITMASKS[vi]))
    assert s["kernel_only"] == 0 and s["static_ok"] == 0
    vi = isa.variant_index(isa.LOG, isa.LOG_STORAGE_READ)
    s = isa.spread_props(int(isa.OPCODES_PROPS_INTEGER_BITMASKS[vi]))
    assert s["kernel_only"] == 0 and s["static_ok"] == 1
    # invalid rows carry the explicit-panic aux bit
    s = isa.spread_props(int(isa.OPCODES_PROPS_INTEGER_BITMASKS[0]))
    assert s["explicit_panic"] == 1
    s = isa.spread_props(int(isa.OPCODES_PROPS_INTEGER_BITMASKS[isa.variant_index(isa.NOP)]))
    assert s["explicit_panic"] == 0


def test_encode_decode_roundtrip():
    cases = [
        dict(op_type=isa.NOP),
        dict(op_type=isa.ADD, src_mode=isa.SRC_STACK_OFFSET, flags=1,
             condition=isa.COND_NE, src0=3, src1=4, dst0=5, imm0=0xBEEF),
        dict(op_type=isa.UMA, variant=isa.UMA_FAT_PTR_READ,
             flags=1 << isa.UMA_INCREMENT_FLAG_IDX, src0=2, dst0=7),
        dict(op_type=isa.FAR_CALL, variant=isa.FAR_CALL_MIMIC,
             flags=1 << isa.FAR_CALL_STATIC_FLAG_IDX, src0=1, src1=2,
             imm0=11, imm1=22),
        dict(op_type=isa.RET, variant=isa.RET_PANIC),
        dict(op_type=isa.SHIFT, variant=isa.SHIFT_ROL, src_mode=isa.SRC_IMM,
             dst_mode=isa.DST_STACK_PUSH_POP, flags=0b11),
    ]
    for kw in cases:
        word = isa.encode_instruction(**kw)
        d = isa.decode_instruction(word)
        for k, want in kw.items():
            assert d[k] == want, (kw, k, d[k])
    # defaults decode as zeros
    d = isa.decode_instruction(isa.encode_instruction(isa.NOP))
    assert d["condition"] == isa.COND_ALWAYS and d["src0"] == 0 and d["imm1"] == 0


def test_condition_resolution_table():
    # per tables/conditional.rs:27-46: lt == of
    for of in (False, True):
        for eq in (False, True):
            for gt in (False, True):
                assert isa.condition_resolves(isa.COND_ALWAYS, of, eq, gt)
                assert isa.condition_resolves(isa.COND_GT, of, eq, gt) == gt
                assert isa.condition_resolves(isa.COND_LT, of, eq, gt) == of
                assert isa.condition_resolves(isa.COND_EQ, of, eq, gt) == eq
                assert isa.condition_resolves(isa.COND_GE, of, eq, gt) == (gt or eq)
                assert isa.condition_resolves(isa.COND_LE, of, eq, gt) == (of or eq)
                assert isa.condition_resolves(isa.COND_NE, of, eq, gt) == (not eq)
                assert isa.condition_resolves(isa.COND_GT_OR_LT, of, eq, gt) == (gt or of)


def test_prices_structure():
    # register-only arithmetic is AVERAGE, memory-addressed is RICH
    assert isa.OPCODES_PRICES[isa.variant_index(isa.ADD)] == isa.AVERAGE_OPCODE_ERGS
    assert (
        isa.OPCODES_PRICES[isa.variant_index(isa.ADD, src_mode=isa.SRC_STACK_OFFSET)]
        == isa.RICH_ADDRESSING_OPCODE_ERGS
    )
    assert isa.OPCODES_PRICES[isa.variant_index(isa.ADD, src_mode=isa.SRC_IMM)] == isa.AVERAGE_OPCODE_ERGS
    # storage write costs more than read; both dominate plain opcodes
    pr = isa.OPCODES_PRICES[isa.variant_index(isa.LOG, isa.LOG_STORAGE_READ)]
    pw = isa.OPCODES_PRICES[isa.variant_index(isa.LOG, isa.LOG_STORAGE_WRITE)]
    assert pw > pr > isa.RICH_ADDRESSING_OPCODE_ERGS


def test_masking_encodings():
    assert isa.decode_instruction(isa.NOP_ENCODING)["op_type"] == isa.NOP
    d = isa.decode_instruction(isa.PANIC_ENCODING)
    assert d["op_type"] == isa.RET and d["variant"] == isa.RET_PANIC
