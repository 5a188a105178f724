"""blake2s batch AIR (prover/blake2s_air.py): honest accept + tamper
rejections + storage_application call extraction.  Reference relation:
`src/storage_application/mod.rs:390-400` (path blake2s), 433-439 (derived
key), 523-570 (leaf)."""

import hashlib

import numpy as np
import pytest

from zkevm_circuits_tpu.prover import blake2s_air as ba


def _messages():
    # a node-shaped 64B, a derived-key-shaped 64B, a leaf-shaped 40B
    return [
        b"\xaa" * 32 + b"\xbb" * 32,
        b"\x00" * 12 + b"\x11" * 20 + b"\x22" * 32,
        b"\x00" * 7 + b"\x01" + bytes(range(32)),
    ]


@pytest.fixture(scope="module")
def batch_proof():
    msgs = _messages()
    proof, digests, params = ba.prove_blake2s_batch(msgs)
    return msgs, proof, digests, params


def test_digests_match_hashlib():
    """Trace builder (host numpy, no prover) against hashlib."""
    msgs = _messages()
    _, _, digests, _, _ = ba.build_blake2s_trace(msgs)
    for m, d in zip(msgs, digests):
        assert d == hashlib.blake2s(m).digest()


@pytest.mark.slow
def test_honest_batch_accepts(batch_proof):
    msgs, proof, digests, params = batch_proof
    assert ba.verify_blake2s_batch(proof, msgs, digests, params)


@pytest.mark.slow
def test_digest_tamper_rejected(batch_proof):
    msgs, proof, digests, params = batch_proof
    bad = list(digests)
    bad[1] = bytes([bad[1][0] ^ 1]) + bad[1][1:]
    assert not ba.verify_blake2s_batch(proof, msgs, bad, params)


@pytest.mark.slow
def test_message_tamper_rejected(batch_proof):
    msgs, proof, digests, params = batch_proof
    bad = list(msgs)
    bad[0] = bytes([bad[0][0] ^ 0x80]) + bad[0][1:]
    assert not ba.verify_blake2s_batch(proof, bad, digests, params)


@pytest.mark.slow
def test_dropped_call_rejected(batch_proof):
    msgs, proof, digests, params = batch_proof
    assert not ba.verify_blake2s_batch(proof, msgs[:-1], digests[:-1], params)


@pytest.mark.slow
def test_length_tamper_rejected(batch_proof):
    """Claiming a 40-byte leaf message was 64 bytes changes t and therefore
    the digest: the t component of the record RLC catches it."""
    msgs, proof, digests, params = batch_proof
    bad = list(msgs)
    bad[2] = bad[2] + b"\x00" * 24  # same padded words, different t
    assert not ba.verify_blake2s_batch(proof, bad, digests, params)


def test_storage_application_calls_extract():
    """blake2s_calls returns exactly the digests the witness's Merkle walk
    consumes, each matching a real blake2s of its plaintext."""
    from zkevm_circuits_tpu.models import storage_application as sa

    tree = sa.SparseStorageTree()
    cfg = sa.StorageApplicationConfig(max_rows=4)
    queries = [
        dict(address=0x8002, key=7, read_value=0, written_value=5,
             rw_flag=True, aux_byte=sa.STORAGE_AUX_BYTE, rollback=False,
             is_service=False, shard_id=0, tx_number_in_block=0,
             timestamp=11),
    ]
    w = sa.generate_witness(queries, tree, initial_counter=1, config=cfg)
    msgs, digs = sa.blake2s_calls(w)
    # 1 derived key + (read + write stages) x (leaf + 256 levels), deduped
    assert len(msgs) >= 1 + 257
    for m, d in zip(msgs, digs):
        assert hashlib.blake2s(m).digest() == d
    # the final write-stage root is in the proven set
    root_words = np.asarray(w.roots)[2]
    root = b"".join(int(x).to_bytes(4, "little") for x in root_words)
    assert root in digs
