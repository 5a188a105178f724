"""keccak-f[1600] STARK: accept + tamper tests (VERDICT r3 item 3).

Reference shape: the keccak256_round_function circuit's in-circuit keccak-f
(`src/keccak256_round_function/mod.rs:795+`) — here the permutation chain is
a committed bit-trace whose satisfaction IS the proof, with the message
bound by a verifier-recomputed RLC over the padded plaintext.
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.ops import gf
from zkevm_circuits_tpu.ops.keccak import keccak256_ref
from zkevm_circuits_tpu.prover import keccak_air as ka
from zkevm_circuits_tpu.prover.stark import StarkParams, prove

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def proof_bundle():
    msg = b"tpu keccak air"
    proof, digest, params = ka.prove_keccak256(msg)
    return msg, proof, digest, params


def test_digest_matches_reference(proof_bundle):
    msg, _, digest, _ = proof_bundle
    assert digest == keccak256_ref(msg)


def test_prove_and_verify(proof_bundle):
    msg, proof, digest, params = proof_bundle
    assert ka.verify_keccak256(proof, msg, digest, params)


def test_two_block_message():
    msg = b"q" * 150  # spans two rate blocks
    proof, digest, params = ka.prove_keccak256(msg)
    assert digest == keccak256_ref(msg)
    assert ka.verify_keccak256(proof, msg, digest, params)


def test_flipped_digest_byte_rejected(proof_bundle):
    msg, proof, digest, params = proof_bundle
    bad = bytearray(digest)
    bad[3] ^= 1
    assert not ka.verify_keccak256(proof, msg, bytes(bad), params)


def test_different_message_rejected(proof_bundle):
    msg, proof, digest, params = proof_bundle
    assert not ka.verify_keccak256(proof, msg + b"!", digest, params)


def test_tampered_state_bit_breaks_proof():
    """Flip one committed state bit mid-permutation: the round relation
    fails — the prover's FRI refuses or verification rejects."""
    msg = b"bit tamper"
    phase1, fixed, dwords, build_phase2, log_n = ka.build_keccak_trace(msg)
    air = ka.keccak_air()
    params = StarkParams(log_n=log_n)
    c = ka._cols()
    cols = np.asarray(phase1.astype_u64(), np.uint64)
    cols[c.A.start + 123, 5] ^= np.uint64(1)
    bad_trace = gf.from_u64(cols)
    from zkevm_circuits_tpu.prover.stark import (_commit_columns,
                                                 challenges_from_cap)

    cap_f = _commit_columns(fixed, params)["cap"]
    cap_1 = _commit_columns(bad_trace, params)["cap"]
    (gamma,), _ = challenges_from_cap(cap_1, air, cap_f)
    acc = ka.message_rlc(msg, gamma)
    public = ka._publics(dwords, acc)
    try:
        proof = prove(bad_trace, air, params, public,
                      build_phase2=build_phase2, fixed_cols=fixed)
    except AssertionError:
        return
    assert not ka.verify_keccak256(
        proof, msg,
        b"".join(int(w).to_bytes(4, "little") for w in dwords), params)
