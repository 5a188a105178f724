"""keccak256_round_function buffer fill/drain patterns (VERDICT r1 #9).

The (length, unalignment) matrix is ported from the reference's
`test_for_length_and_unalignment` call sites
(`/root/reference/src/keccak256_round_function/mod.rs:1098-1143`): rate
boundaries (135/136 vs RATE=136), multi-block inputs, and 31/22-byte
unaligned starts — the cases that exercise the ByteBuffer's fill factor and
the unaligned 32-byte word reads (`mod.rs:108-133, 385-506`).
Digests are checked against the pinned host keccak256 reference.
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.isa import system_params as sp
from zkevm_circuits_tpu.models import keccak256_round_function as kc
from zkevm_circuits_tpu.ops.keccak import keccak256_ref

# (length, unalignment) — verbatim from the reference test call sites
CASES = [
    (50, 0), (135, 0), (200, 0), (180, 0), (136, 0),
    (50, 31), (135, 31), (136, 31), (200, 31), (166, 22),
]


def _drive(length, unalign):
    rng = np.random.default_rng(length * 1000 + unalign)
    data = bytes(int(b) for b in rng.integers(0, 256, size=length))
    page = 123
    memory = {}
    padded = b"\x00" * unalign + data
    for wi in range((len(padded) + 31) // 32):
        word = padded[32 * wi : 32 * wi + 32]
        memory[(page, wi)] = word + b"\x00" * (32 - len(word))
    call = dict(
        address=sp.KECCAK256_PRECOMPILE_FORMAL_ADDRESS,
        key=(unalign) | (length << 32) | (0 << 64) | (page << 128) | (456 << 160),
        read_value=0, written_value=0, aux_byte=sp.PRECOMPILE_AUX_BYTE,
        rw_flag=False, rollback=False, is_service=False, shard_id=0,
        tx_number_in_block=0, timestamp=7,
    )
    blocks = length // kc.RATE + 1
    reads = (unalign + length + 31) // 32
    cfg = kc.KeccakRoundFunctionConfig(max_blocks=blocks, max_reads=max(reads, 1))
    w = kc.generate_witness([call], memory, cfg)
    res = kc.eval_constraints_jit(w, cfg)
    bad = [k for k, v in res.items() if not bool(np.asarray(v).all())]
    assert not bad, (length, unalign, bad)
    digest = bytes(int(b) for b in np.asarray(w.digests)[0])
    assert digest == keccak256_ref(data), (length, unalign)


@pytest.mark.parametrize("length,unalign", CASES)
def test_buffer_pattern(length, unalign):
    _drive(length, unalign)
