"""FRI low-degree argument (ops/fri.py): honest accept, tamper reject."""

import numpy as np
import pytest

from zkevm_circuits_tpu.ops import fri, gf, ntt


def _codeword(log_domain, log_blowup, seed=7):
    n = 1 << log_domain
    deg = n >> log_blowup
    rng = np.random.default_rng(seed)
    coeffs = [int(x) % gf.MODULUS for x in rng.integers(0, 1 << 62, size=deg)]
    shift = gf.MULTIPLICATIVE_GENERATOR
    shifted = [
        c * pow(shift, j, gf.MODULUS) % gf.MODULUS for j, c in enumerate(coeffs)
    ] + [0] * (n - deg)
    evals = ntt.ntt_ref(shifted)
    return gf.from_u64(np.array(evals, np.uint64))


PARAMS = fri.FriParams(log_domain=8, log_blowup=1, num_queries=10,
                       final_poly_log_len=2, cap_log2=1)


def test_honest_proof_accepts():
    cw = _codeword(8, 1)
    proof = fri.prove(cw, PARAMS)
    assert len(proof.caps) == 6
    assert fri.verify(proof, PARAMS)


def test_high_degree_codeword_rejected_at_prover():
    n = 1 << 8
    rng = np.random.default_rng(9)
    cw = gf.from_u64(rng.integers(0, gf.MODULUS, size=n, dtype=np.uint64))
    with pytest.raises(AssertionError):
        fri.prove(cw, PARAMS)  # random codeword is not low degree


def test_tampered_final_poly_rejected():
    cw = _codeword(8, 1)
    proof = fri.prove(cw, PARAMS)
    proof.final_poly = np.array(proof.final_poly, copy=True)
    proof.final_poly[0, 0] ^= 1
    assert not fri.verify(proof, PARAMS)


def test_tampered_opening_rejected():
    cw = _codeword(8, 1)
    proof = fri.prove(cw, PARAMS)
    proof.openings[0][2]["pair"] = np.array(
        proof.openings[0][2]["pair"], copy=True
    )
    proof.openings[0][2]["pair"][0, 0] ^= 1
    assert not fri.verify(proof, PARAMS)


def test_wrong_query_indices_rejected():
    cw = _codeword(8, 1)
    proof = fri.prove(cw, PARAMS)
    proof.query_indices = list(proof.query_indices)
    proof.query_indices[0] = (proof.query_indices[0] + 1) % (1 << 7)
    assert not fri.verify(proof, PARAMS)
