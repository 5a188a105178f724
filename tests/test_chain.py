"""Multi-block chain: content-hash threading, storage carry-over, interblock
aggregation with invalid-slot masking (runtime/chain.py)."""

import numpy as np
import pytest

from zkevm_circuits_tpu.isa import opcodes as isa
from zkevm_circuits_tpu.models import recursion
from zkevm_circuits_tpu.models import vm
from zkevm_circuits_tpu.ops import gf
from zkevm_circuits_tpu.runtime import block2, chain

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-suite tier (see pyproject markers)

enc = isa.encode_instruction


def _block_code(key, value):
    return vm.assemble_code_words([
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=key, src1=0, dst0=2),
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=value, src1=0, dst0=3),
        enc(isa.LOG, isa.LOG_STORAGE_WRITE, src0=2, src1=3),
        enc(isa.LOG, isa.LOG_STORAGE_READ, src0=2, dst0=4),
        enc(isa.RET, isa.RET_OK),
    ])


@pytest.fixture(scope="module")
def chain_result():
    cfg = block2.Block2Config(vm_limit=16, sorter_limit=16, ram_limit=64)
    return chain.execute_chain(
        [
            {"code": _block_code(5, 111)},
            {"code": _block_code(5, 222)},  # overwrites block 1's cell
        ],
        cfg,
        aggregator_capacity=4,
    )


def test_chain_ok_and_threads_hashes(chain_result):
    cr = chain_result
    assert cr.ok, [b.failing() for b in cr.blocks]
    assert len(cr.content_hashes) == 2
    assert cr.content_hashes[0] != cr.content_hashes[1]


def test_storage_carries_over(chain_result):
    cr = chain_result
    # block 2's storage WRITE to key 5 must observe block 1's value (111)
    # as its prior value; the read AFTER the write sees the new value (222)
    v2 = cr.blocks[1].vm
    writes = [q for q in v2.log_tape if q["rw_flag"] and q["key"] == 5]
    assert writes and writes[0]["read_value"] == 111
    reads = [q for q in v2.log_tape if not q["rw_flag"] and q["key"] == 5]
    assert reads and reads[0]["read_value"] == 222


def test_interblock_masking(chain_result):
    cr = chain_result
    pis = [b.scheduler_result.public_input for b in cr.blocks]
    slots = pis + [gf.zeros((4,))] * 2
    same = recursion.interblock_aggregate_keccak(
        slots, [True, True, False, False]
    )
    assert same == cr.aggregated_input
    # forging an INVALID slot's payload does not change the aggregate
    forged = pis + [gf.from_u64(np.array([9, 9, 9, 9], dtype=np.uint64))] * 2
    assert recursion.interblock_aggregate_keccak(
        forged, [True, True, False, False]
    ) == cr.aggregated_input
    # but marking it valid does
    assert recursion.interblock_aggregate_keccak(
        forged, [True, True, True, False]
    ) != cr.aggregated_input


def test_block_with_eip4844_blobs():
    from zkevm_circuits_tpu.models import eip_4844 as e44
    from zkevm_circuits_tpu.ops.sha256 import sha256_ref

    chunks = [bytes([i] * 31) for i in range(1, 5)]
    vh = bytes([1]) + sha256_ref(b"kzg commitment")[1:]
    cfg = block2.Block2Config(vm_limit=16, sorter_limit=16, ram_limit=64)
    res = block2.execute_block2(
        _block_code(9, 42), cfg, blobs=[(chunks, vh)],
    )
    assert res.ok, res.failing()
    assert "eip_4844_0" in res.residuals
    assert len(res.blob_compact_forms) == 1
    aux = res.scheduler_result
    # the blob linear hash landed in the block aux output (content hash
    # differs from a blob-less block)
    res2 = block2.execute_block2(_block_code(9, 42), cfg)
    assert (
        res.scheduler_result.block_content_hash
        != res2.scheduler_result.block_content_hash
    )
