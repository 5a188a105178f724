"""Poseidon2 sponge-chain STARK (prover/poseidon2_air.py): real proofs of
queue-tail commitments — `tail_final = sponge_chain(tail_init, encodings)`
with the message stream bound by a post-commitment RLC challenge.

Cross-checked against the runtime sponge (ops/queues.narrow_state_transition
/ full_state_transition), i.e. the proofs are about the SAME chain every
queue commitment in the framework uses (ref: boojum CircuitRoundFunction
usage, e.g. src/base_structures/vm_state/mod.rs:27-28).
"""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from zkevm_circuits_tpu.ops import gf, queues
from zkevm_circuits_tpu.prover import poseidon2_air as pa
from zkevm_circuits_tpu.prover.stark import StarkParams

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-suite tier (see pyproject markers)

PARAMS = StarkParams(log_n=5, log_blowup=2, num_queries=8, cap_log2=1)


@functools.lru_cache(maxsize=1)
def _narrow_case():
    rng = np.random.default_rng(0)
    enc = (rng.integers(0, 1 << 62, size=(8, 20)).astype(np.uint64)) % gf.MODULUS
    init = np.zeros(4, dtype=np.uint64)
    proof, publics, params = pa.prove_queue_chain(enc, init, pa.NARROW, PARAMS)
    return enc, init, proof, np.asarray(publics.astype_u64()), params


def test_narrow_chain_matches_runtime_sponge():
    enc, init, proof, pub, params = _narrow_case()
    st = gf.from_u64(init)
    for i in range(enc.shape[0]):
        st = queues.narrow_state_transition(
            st, gf.from_u64(enc[i]), jnp.asarray(True)
        )
    assert np.array_equal(np.asarray(st.astype_u64()), pub[4:8])


def test_narrow_chain_proof_accepts():
    enc, init, proof, pub, params = _narrow_case()
    assert pa.verify_queue_chain(proof, enc, init, pub[4:8], pa.NARROW, params)


def test_narrow_wrong_final_rejected():
    enc, init, proof, pub, params = _narrow_case()
    bad = pub[4:8].copy()
    bad[0] ^= 1
    assert not pa.verify_queue_chain(proof, enc, init, bad, pa.NARROW, params)


def test_narrow_wrong_message_rejected():
    # the RLC binding: a proof cannot be replayed against a different stream
    enc, init, proof, pub, params = _narrow_case()
    enc2 = enc.copy()
    enc2[3, 7] ^= 1
    assert not pa.verify_queue_chain(proof, enc2, init, pub[4:8], pa.NARROW, params)


def test_narrow_wrong_init_rejected():
    enc, init, proof, pub, params = _narrow_case()
    bad_init = init.copy()
    bad_init[1] = 5
    assert not pa.verify_queue_chain(
        proof, enc, bad_init, pub[4:8], pa.NARROW, params
    )


def test_full_state_chain_roundtrip():
    rng = np.random.default_rng(1)
    enc = (rng.integers(0, 1 << 62, size=(8, 8)).astype(np.uint64)) % gf.MODULUS
    init = (rng.integers(0, 1 << 62, size=4).astype(np.uint64)) % gf.MODULUS
    params = StarkParams(log_n=3, log_blowup=2, num_queries=8, cap_log2=1)
    proof, publics, params = pa.prove_queue_chain(enc, init, pa.FULL, params)
    pub = np.asarray(publics.astype_u64())

    st = gf.from_u64(np.concatenate([np.zeros(8, np.uint64), init]))
    for i in range(enc.shape[0]):
        st = queues.full_state_transition(
            st, gf.from_u64(enc[i]), jnp.asarray(True)
        )
    assert np.array_equal(np.asarray(st.astype_u64()), pub[4:16])
    assert pa.verify_queue_chain(proof, enc, init, pub[4:16], pa.FULL, params)
    bad = pub[4:16].copy()
    bad[5] ^= 1
    assert not pa.verify_queue_chain(proof, enc, init, bad, pa.FULL, params)
