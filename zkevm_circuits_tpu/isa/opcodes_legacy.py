"""zkEVM ISA opcode definitions (zkevm_opcode_defs port — provisional subset).

The reference consumes `OPCODES_TABLE` / `OPCODES_PROPS_INTEGER_BITMASKS` /
`OPCODES_PRICES` from the external zkevm_opcode_defs crate (layer 1,
SURVEY.md §2.3) — a 2^11-entry decode table.  That crate is not vendored here
(zero egress), so this module pins a PROVISIONAL instruction encoding with
the same decode-table structure (id -> price + property bitmask) covering the
opcode families implemented by models/main_vm.py; the table is pure data and
swappable for the exact upstream layout without touching kernel code.

Instruction word (64-bit, low-to-high):
    bits  0..7   opcode id
    bits  8..11  condition (0 always, 1 if-gt, 2 if-lt, 3 if-eq, 4 if-ne)
    bits 12..15  src0 register index
    bits 16..19  src1 register index
    bits 20..23  dst0 register index
    bits 24..27  dst1 register index (mul/div)
    bit  28      src1-is-immediate
    bits 32..63  imm32
"""

NOP = 0
ADD = 1
SUB = 2
AND = 3
OR = 4
XOR = 5
SHL = 6
SHR = 7
JUMP = 8
HEAP_READ = 9  # dst0 = heap[word index src0.lo] (uma family, word-aligned)
HEAP_WRITE = 10  # heap[word index src0.lo] = src1
LOG = 11  # log family: dst1 nibble = variant (0 event, 1 l1 msg, 2 sstore)
MUL = 12
DIV = 13
CONTEXT = 14  # context family: dst1 = variant (0 address, 1 ergs, 2 timestamp)
HALT = 15
NEAR_CALL = 16  # push return frame onto the callstack sponge; jump to imm
RET = 17  # pop the callstack sponge; jump to the saved return pc
PTR_ADD = 18  # fat-pointer offset add: dst0 = src0(ptr) + src1.lo; keeps is_ptr
FAR_CALL = 19  # call contract at src0.address: decommit push + 63/64 ergs +
#               callstack frame; full 32-element context encoding: round 2

NAMES = {
    NOP: "nop", ADD: "add", SUB: "sub", AND: "and", OR: "or", XOR: "xor",
    SHL: "shl", SHR: "shr", JUMP: "jump", HEAP_READ: "heap_read",
    HEAP_WRITE: "heap_write", LOG: "log", MUL: "mul", DIV: "div",
    CONTEXT: "context", HALT: "halt", NEAR_CALL: "near_call", RET: "ret",
    PTR_ADD: "ptr_add", FAR_CALL: "far_call",
}

LOG_VARIANT_EVENT = 0
LOG_VARIANT_L1_MESSAGE = 1
LOG_VARIANT_STORAGE_WRITE = 2

CTX_VARIANT_ADDRESS = 0
CTX_VARIANT_ERGS_LEFT = 1
CTX_VARIANT_TIMESTAMP = 2

# ergs prices (provisional uniform-ish schedule)
PRICES = {
    NOP: 1, ADD: 2, SUB: 2, AND: 2, OR: 2, XOR: 2, SHL: 3, SHR: 3, JUMP: 2,
    HEAP_READ: 4, HEAP_WRITE: 4, LOG: 6, MUL: 5, DIV: 5, CONTEXT: 2, HALT: 0,
    NEAR_CALL: 10, RET: 5, PTR_ADD: 2, FAR_CALL: 200,
}

# property bitmask bits (mirrors the reference's 48-bit property spread)
PROP_WRITES_DST0 = 1 << 0
PROP_WRITES_DST1 = 1 << 1
PROP_SETS_FLAGS = 1 << 2
PROP_IS_JUMP = 1 << 3
PROP_IS_HALT = 1 << 4
PROP_MEM_READ = 1 << 5
PROP_MEM_WRITE = 1 << 6

PROPS = {
    NOP: 0,
    ADD: PROP_WRITES_DST0 | PROP_SETS_FLAGS,
    SUB: PROP_WRITES_DST0 | PROP_SETS_FLAGS,
    AND: PROP_WRITES_DST0 | PROP_SETS_FLAGS,
    OR: PROP_WRITES_DST0 | PROP_SETS_FLAGS,
    XOR: PROP_WRITES_DST0 | PROP_SETS_FLAGS,
    SHL: PROP_WRITES_DST0 | PROP_SETS_FLAGS,
    SHR: PROP_WRITES_DST0 | PROP_SETS_FLAGS,
    JUMP: PROP_IS_JUMP,
    HEAP_READ: PROP_WRITES_DST0 | PROP_MEM_READ,
    HEAP_WRITE: PROP_MEM_WRITE,
    LOG: 0,
    MUL: PROP_WRITES_DST0 | PROP_WRITES_DST1 | PROP_SETS_FLAGS,
    DIV: PROP_WRITES_DST0 | PROP_WRITES_DST1 | PROP_SETS_FLAGS,
    CONTEXT: PROP_WRITES_DST0,
    HALT: PROP_IS_HALT,
    NEAR_CALL: PROP_IS_JUMP,
    RET: PROP_IS_JUMP,
    PTR_ADD: PROP_WRITES_DST0,
    FAR_CALL: PROP_IS_JUMP,
}

# conditions
COND_ALWAYS = 0
COND_GT = 1
COND_LT = 2
COND_EQ = 3
COND_NE = 4


def encode_instruction(
    op, cond=COND_ALWAYS, src0=0, src1=0, dst0=0, dst1=0, imm=None
) -> int:
    word = (
        (op & 0xFF)
        | ((cond & 0xF) << 8)
        | ((src0 & 0xF) << 12)
        | ((src1 & 0xF) << 16)
        | ((dst0 & 0xF) << 20)
        | ((dst1 & 0xF) << 24)
    )
    if imm is not None:
        word |= (1 << 28) | ((imm & 0xFFFFFFFF) << 32)
    return word


def decode_table():
    """id -> (price, props) rows, the VMOpcodeDecodingTable analog."""
    return {op: (PRICES[op], PROPS[op]) for op in NAMES}
