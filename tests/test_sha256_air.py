"""sha256 compression-chain STARK: accept + tamper tests (VERDICT r3
item 3).  Reference shape: `src/sha256_round_function/mod.rs:271` (the
precompile's in-circuit compression) and `src/code_unpacker_sha256/
mod.rs:364-414` (the unpacker's code-hash chain)."""

import numpy as np
import pytest

from zkevm_circuits_tpu.ops import gf
from zkevm_circuits_tpu.ops.sha256 import sha256_ref
from zkevm_circuits_tpu.prover import sha256_air as sa
from zkevm_circuits_tpu.prover.stark import StarkParams, prove

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def proof_bundle():
    msg = b"tpu sha256 air"
    proof, digest, params = sa.prove_sha256(msg)
    return msg, proof, digest, params


def test_digest_matches_reference(proof_bundle):
    msg, _, digest, _ = proof_bundle
    assert digest == sha256_ref(msg)


def test_prove_and_verify(proof_bundle):
    msg, proof, digest, params = proof_bundle
    assert sa.verify_sha256(proof, msg, digest, params)


def test_two_block_message():
    msg = b"z" * 70
    proof, digest, params = sa.prove_sha256(msg)
    assert digest == sha256_ref(msg)
    assert sa.verify_sha256(proof, msg, digest, params)


def test_raw_blocks_chain():
    """The caller-pre-padded form the precompile/unpacker use."""
    rng = np.random.default_rng(7)
    blocks = rng.integers(0, 1 << 32, size=(2, 16), dtype=np.uint64)
    proof, dwords, params = sa.prove_sha256_blocks(blocks)
    # cross-check against the reference compression chain
    from zkevm_circuits_tpu.ops.sha256 import compress_ref, H0

    st = list(H0)
    for b in range(2):
        st = compress_ref(st, [int(x) for x in blocks[b]])
    assert [int(w) for w in dwords] == st
    assert sa.verify_sha256_blocks(proof, blocks, dwords, params)
    forged = dwords.copy()
    forged[2] ^= np.uint32(1)
    assert not sa.verify_sha256_blocks(proof, blocks, forged, params)


def test_flipped_digest_rejected(proof_bundle):
    msg, proof, digest, params = proof_bundle
    bad = bytearray(digest)
    bad[7] ^= 1
    assert not sa.verify_sha256(proof, msg, bytes(bad), params)


def test_different_message_rejected(proof_bundle):
    msg, proof, digest, params = proof_bundle
    assert not sa.verify_sha256(proof, msg + b"?", digest, params)


def test_tampered_state_bit_breaks_proof():
    msg = b"tamper sha"
    phase1, fixed, dwords, build_phase2, log_n = sa.build_sha256_trace(msg)
    air = sa.sha256_air()
    params = StarkParams(log_n=log_n)
    c = sa._cols()
    cols = np.asarray(phase1.astype_u64(), np.uint64)
    cols[c.st["e"].start + 9, 17] ^= np.uint64(1)
    bad_trace = gf.from_u64(cols)
    from zkevm_circuits_tpu.prover.stark import (_commit_columns,
                                                 challenges_from_cap)

    cap_f = _commit_columns(fixed, params)["cap"]
    cap_1 = _commit_columns(bad_trace, params)["cap"]
    (gamma,), _ = challenges_from_cap(cap_1, air, cap_f)
    acc = sa.message_rlc(msg, gamma)
    public = sa._publics(dwords, acc)
    try:
        proof = prove(bad_trace, air, params, public,
                      build_phase2=build_phase2, fixed_cols=fixed)
    except AssertionError:
        return
    digest = b"".join(int(w).to_bytes(4, "big") for w in dwords)
    assert not sa.verify_sha256(proof, msg, digest, params)
