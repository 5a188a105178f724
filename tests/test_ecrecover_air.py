"""ecrecover ladder AIR (prover/ecrecover_air.py): trace-builder closure,
honest accept + tamper rejections.  Reference relation:
`src/ecrecover/new_optimized.rs:870-1128`."""

import numpy as np
import pytest

from zkevm_circuits_tpu.models import ecrecover as ecr
from zkevm_circuits_tpu.ops import secp256k1 as ec
from zkevm_circuits_tpu.ops.keccak import keccak256_ref
from zkevm_circuits_tpu.prover import ecrecover_air as ea


def _witness():
    priv, k = 0xC0FFEE, 0x12345
    h = int.from_bytes(keccak256_ref(b"zk block"), "big")
    r, s, recid = ec.sign(h, priv, k)
    in_page, out_page, ts = 7, 9, 100
    key = (0) | (2 << 64) | (in_page << 128) | (out_page << 160)
    call = dict(address=0x1, key=key, read_value=0, written_value=0,
                rw_flag=False, aux_byte=4, rollback=False, is_service=True,
                shard_id=0, tx_number_in_block=0, timestamp=ts)
    mem = {(in_page, 0): h.to_bytes(32, "big"),
           (in_page, 1): recid.to_bytes(32, "big"),
           (in_page, 2): r.to_bytes(32, "big"),
           (in_page, 3): s.to_bytes(32, "big")}
    w = ecr.generate_witness([call], mem, ecr.EcrecoverConfig(max_calls=1))
    return w, priv


def test_trace_builder_closes():
    """Every identity's carry chain telescopes to zero on the honest
    witness (the builder asserts), and the plaintext claims recover the
    signer's point: acc1 + acc2 == priv * G."""
    w, priv = _witness()
    fixed, phase1, log_n = ea.build_ecrecover_trace(w)
    assert phase1.shape[1] == 1 << log_n
    cp = ea.calls_public_from_witness(w)
    assert cp[0]["active"]
    a1, a2 = cp[0]["acc1"], cp[0]["acc2"]
    Q = ec.add(a1, a2) if a1 else a2
    assert ec.eth_address(Q) == ec.eth_address(ec.mul(priv, (ec.GX, ec.GY)))


def test_records_deterministic():
    w, _ = _witness()
    cp = ea.calls_public_from_witness(w)
    r1 = ea.records_rlc(ea.ladder_records(cp), 987654321)
    r2 = ea.records_rlc(ea.ladder_records(cp), 987654321)
    assert r1 == r2
    # dummy-call records are the all-zero ladders
    recs = ea.ladder_records([dict(active=False)])
    assert len(recs) == 2 and recs[0]["inf"] == 1


@pytest.fixture(scope="module")
def ladder_proof():
    w, priv = _witness()
    proof, cp, params = ea.prove_ecrecover(w)
    return proof, cp, params


@pytest.mark.slow
def test_honest_ladders_accept(ladder_proof):
    proof, cp, params = ladder_proof
    assert ea.verify_ecrecover(proof, cp, params)


@pytest.mark.slow
def test_scalar_bit_tamper_rejected(ladder_proof):
    """Flipping one bit of u1 changes the bit stream the record binds."""
    proof, cp, params = ladder_proof
    bad = [dict(c) for c in cp]
    bad[0]["u1"] ^= 1 << 17
    assert not ea.verify_ecrecover(proof, bad, params)


@pytest.mark.slow
def test_output_tamper_rejected(ladder_proof):
    """Claiming a different ladder result point fails."""
    proof, cp, params = ladder_proof
    bad = [dict(c) for c in cp]
    x, y = bad[0]["acc2"]
    bad[0]["acc2"] = (x ^ 2, y)
    assert not ea.verify_ecrecover(proof, bad, params)


@pytest.mark.slow
def test_base_point_tamper_rejected(ladder_proof):
    """Claiming the R ladder ran on a different base point fails."""
    proof, cp, params = ladder_proof
    bad = [dict(c) for c in cp]
    x, y = bad[0]["R"]
    bad[0]["R"] = (x, y ^ 1)
    assert not ea.verify_ecrecover(proof, bad, params)
