"""block2 with prove_vm + prove_hash_chains: the driver's type-1 verdict is
the VM core STARK verifier's, and the hash-chain circuits (3/13 here; 5/6
covered by the full-block fixture path when precompiles fire) carry digest
STARKs.  Closes VERDICT r3 weak #4 (prove_vm wired but untested) and the
block-level "done when" of items 2/3.
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.isa import opcodes as isa
from zkevm_circuits_tpu.models import vm
from zkevm_circuits_tpu.runtime import block2

pytestmark = pytest.mark.slow

enc = isa.encode_instruction
SET = 1 << isa.SET_FLAGS_FLAG_IDX


@pytest.fixture(scope="module")
def proof_block():
    prog = [
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=0x1234, src1=0, dst0=1),
        enc(isa.MUL, src0=1, src1=1, dst0=2, dst1=3, flags=SET),
        enc(isa.SHIFT, isa.SHIFT_SHL, src0=2, src1=1, dst0=4),
        enc(isa.BINOP, isa.BINOP_XOR, src0=4, src1=2, dst0=5),
        # one L2->L1 message so linear_hasher (type 13) is active
        enc(isa.LOG, isa.LOG_TO_L1_MESSAGE, src0=1, src1=2),
        enc(isa.RET, isa.RET_OK),
    ]
    code = vm.assemble_code_words(prog)
    cfg = block2.Block2Config(
        vm_limit=16, vm_instance_limit=8, sorter_limit=16, hasher_limit=4,
        unpacker_rounds=8, ram_limit=64,
        prove_vm=True,
        prove_hash_chains=True,
        prove_routing=True,
    )
    blob = ([bytes([7]) * 31, bytes([9]) * 31], b"\x01" + b"\x22" * 31)
    return block2.execute_block2(code, cfg, blobs=[blob])


def test_block_ok(proof_block):
    assert proof_block.ok, proof_block.failing()


def test_vm_stark_verdict_present_and_true(proof_block):
    """Type 1's verdict is the REAL vm_air verifier outcome (not a witness
    claim): prove_vm routes the committed-trace STARK into the block flow."""
    assert proof_block.stark_verdicts.get(1) is True


def test_hash_chain_verdicts(proof_block):
    """The unpacker's sha256 code-hash chain (type 3) and linear_hasher's
    keccak stream (type 13) carry verified digest STARKs."""
    assert proof_block.stark_verdicts.get(3) is True
    assert proof_block.stark_verdicts.get(13) is True


def test_eip4844_keccak_chains_proven(proof_block):
    """The blob's three keccak chains (linear hash, z-challenge digest,
    output commitment) carry verified digest STARKs (type 255; ref
    eip_4844/mod.rs:157-174, 206-242)."""
    assert proof_block.stark_verdicts.get(255) is True


def test_demux_routing_verdict(proof_block):
    """Type 4's verdict is the demux routing STARK verifier's: committed
    selector certificates vs input/output-substream RLCs the verifier
    recomputes from the plaintext log tape (prover/demux_air.py; ref
    demux_log_queue/mod.rs:279-310)."""
    assert proof_block.stark_verdicts.get(4) is True


def test_code_read_stream_binds_to_tape(proof_block):
    """The VM proof's macc public binds the executed code stream; the
    driver cross-checked every bound code-read against the global memory
    tape (the same rows ram_permutation absorbs)."""
    assert proof_block.handoffs.get("vm_code_reads_on_tape") is True
