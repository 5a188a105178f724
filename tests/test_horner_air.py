"""eip_4844 Horner-evaluation AIR (prover/horner_air.py): honest accept +
tamper rejections.  Reference relation: `src/eip_4844/mod.rs:186-204`."""

import numpy as np
import pytest

from zkevm_circuits_tpu.models import eip_4844 as e44
from zkevm_circuits_tpu.prover import horner_air as ha


@pytest.fixture(scope="module")
def blob_proof():
    E = 8
    cfg = e44.EIP4844Config(elements=E)
    rng = np.random.default_rng(0x4844)
    chunks = [bytes(rng.integers(0, 256, 31, dtype=np.uint8)) for _ in range(5)]
    vh = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    w = e44.generate_witness(chunks, vh, cfg)
    # the evaluator accepts (sanity: the witness is honest)
    res = e44.eval_constraints(w, cfg)
    assert e44.all_ok(res), {k: np.asarray(v).all() for k, v in res.items()}
    proof, publics, params = ha.prove_horner(w, E)
    pub_data = dict(
        E=E,
        chunks=np.asarray(w.chunks),
        truncated=np.asarray(w.truncated),
        opening_be=np.asarray(w.opening_be),
    )
    return w, proof, publics, params, pub_data


def test_honest_horner_accepts(blob_proof):
    w, proof, publics, params, pub = blob_proof
    assert ha.verify_horner(proof, pub, params)


def test_wrong_opening_rejected(blob_proof):
    w, proof, publics, params, pub = blob_proof
    bad = dict(pub)
    op = np.array(pub["opening_be"], copy=True)
    op[7] ^= 1
    bad["opening_be"] = op
    assert not ha.verify_horner(proof, bad, params)


def test_wrong_challenge_point_rejected(blob_proof):
    w, proof, publics, params, pub = blob_proof
    bad = dict(pub)
    tr = np.array(pub["truncated"], copy=True)
    tr[3] ^= 1
    bad["truncated"] = tr
    assert not ha.verify_horner(proof, bad, params)


def test_wrong_blob_rejected(blob_proof):
    """A different blob (different fe stream) under the same proof fails
    the fe-RLC public binding."""
    w, proof, publics, params, pub = blob_proof
    bad = dict(pub)
    ch = np.array(pub["chunks"], copy=True)
    ch[2, 5] ^= 1
    bad["chunks"] = ch
    assert not ha.verify_horner(proof, bad, params)


def test_tampered_trace_rejected(blob_proof):
    """Forge the Horner result inside the witness: the carry chains cannot
    close, so trace building fails — and a forged-but-consistent-bytes
    trace is caught by the STARK itself (flip a committed acc byte)."""
    w, proof, publics, params, pub = blob_proof
    import dataclasses

    acc = np.array(np.asarray(w.acc), copy=True)
    acc[3, 0] ^= 1
    bad_w = dataclasses.replace(w, acc=acc)
    with pytest.raises(AssertionError):
        ha.prove_horner(bad_w, pub["E"])
