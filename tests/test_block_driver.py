"""execute_block: the top-level driver runs a program through every circuit."""

import numpy as np

from zkevm_circuits_tpu.base_structures.vm_state import VmStateColumns
from zkevm_circuits_tpu.isa import opcodes_legacy as isa
from zkevm_circuits_tpu.runtime import block

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-suite tier (see pyproject markers)


def test_execute_block_end_to_end():
    CODE_HASH = (0x0101 << 224) | 0xFACE
    code = [
        isa.encode_instruction(isa.ADD, src0=1, src1=2, dst0=3),
        isa.encode_instruction(isa.HEAP_WRITE, src0=4, src1=3),       # mem write
        isa.encode_instruction(isa.HEAP_READ, src0=4, dst0=5),        # mem read
        isa.encode_instruction(isa.LOG, src0=6, src1=3, dst1=isa.LOG_VARIANT_EVENT),
        isa.encode_instruction(isa.LOG, src0=7, src1=3, dst1=isa.LOG_VARIANT_L1_MESSAGE),
        isa.encode_instruction(isa.LOG, src0=8, src1=3, dst1=isa.LOG_VARIANT_STORAGE_WRITE),
        isa.encode_instruction(isa.FAR_CALL, src0=9, imm=8),          # decommit
        isa.encode_instruction(isa.HALT),
        isa.encode_instruction(isa.RET),                              # callee
    ]
    init = VmStateColumns.initial(
        registers={1: 10, 2: 20, 4: 3, 6: 0xE1, 7: 0x11, 8: 0x51, 9: 0xCAFE},
        ergs=640000,
    )
    result = block.execute_block(
        code, init, block.BlockConfig(vm_limit=16, sorter_limit=8, hasher_limit=4),
        code_hashes={0xCAFE: CODE_HASH},
    )
    assert result.ok, result.failing()
    # every circuit family the program touched produced residuals
    for name in [
        "main_vm", "ram_permutation", "demux_log_queue", "log_sorter_11",
        "log_sorter_12", "linear_hasher", "storage_validity",
        "sort_decommittments",
    ]:
        assert name in result.residuals, name
    # compact forms collected for the scheduler
    assert set(result.compact_forms) >= {2, 4, 8, 9, 11, 12, 13}
    assert result.l1_messages_hash is not None and len(result.l1_messages_hash) == 32


def test_execute_block_detects_bad_memory():
    """a tampered memory value breaks the block-level RAM validation."""
    code = [
        isa.encode_instruction(isa.HEAP_WRITE, src0=4, src1=1),
        isa.encode_instruction(isa.HEAP_READ, src0=4, dst0=5),
        isa.encode_instruction(isa.HALT),
    ]
    init = VmStateColumns.initial(registers={1: 42, 4: 7})
    result = block.execute_block(code, init, block.BlockConfig(vm_limit=8, sorter_limit=4))
    assert result.ok
