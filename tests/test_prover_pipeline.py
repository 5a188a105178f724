"""Circuit -> STARK pipeline (prover/pipeline.py): the ram_permutation
grand-product argument proven by a real low-degree argument, with public
final products, and fed into the recursion leaf layer with a REAL
(verifier-produced, not witness-claimed) validity bit.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from zkevm_circuits_tpu.models import ram_permutation as ram
from zkevm_circuits_tpu.models import recursion
from zkevm_circuits_tpu.models.ram_permutation import MemoryQueries
from zkevm_circuits_tpu.ops import gf
from zkevm_circuits_tpu.prover import pipeline
from zkevm_circuits_tpu.prover.stark import StarkParams

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-suite tier (see pyproject markers)


def _fixture():
    unsorted = [
        dict(timestamp=1025, memory_page=30, index=0, rw_flag=True,
             is_ptr=False, value=123),
        dict(timestamp=2052, memory_page=30, index=0, rw_flag=False,
             is_ptr=False, value=123),
        dict(timestamp=0, memory_page=8, index=2, rw_flag=True,
             is_ptr=False, value=12345678),
    ]
    sorted_q = [unsorted[2], unsorted[0], unsorted[1]]
    cfg = ram.RamPermutationConfig(limit=16)
    return ram.generate_witness(
        MemoryQueries.from_lists(unsorted), MemoryQueries.from_lists(sorted_q), cfg
    ), cfg


PARAMS = StarkParams(log_n=4, log_blowup=2, num_queries=12, cap_log2=1)
PARAMS_8 = StarkParams(log_n=3, log_blowup=2, num_queries=12, cap_log2=1)


@pytest.fixture(scope="module")
def proven():
    w, cfg = _fixture()
    proof, public, params = pipeline.prove_permutation_argument(w, PARAMS)
    return w, cfg, proof, public, params


def test_real_witness_proof_accepts(proven):
    w, _, proof, public, params = proven
    # the public values ARE the circuit's final grand products
    np.testing.assert_array_equal(
        np.asarray(public.astype_u64()), np.asarray(w.lhs.astype_u64())[-1]
    )
    assert pipeline.verify_permutation_argument(proof, public, params)


def test_wrong_public_values_rejected(proven):
    _, _, proof, public, params = proven
    forged = gf.add(public, gf.ones(public.shape))
    assert not pipeline.verify_permutation_argument(proof, forged, params)


def test_non_permutation_unprovable():
    """tampered sorted queue -> lhs != rhs -> the last-row constraint fails:
    prover refuses (quotient not low degree) or the proof rejects."""
    unsorted = [
        dict(timestamp=1025, memory_page=30, index=0, rw_flag=True,
             is_ptr=False, value=123),
        dict(timestamp=2052, memory_page=30, index=0, rw_flag=False,
             is_ptr=False, value=123),
    ]
    bad_sorted = [dict(unsorted[0]), dict(unsorted[1])]
    bad_sorted[1]["value"] += 1
    cfg = ram.RamPermutationConfig(limit=16)
    w = ram.generate_witness(
        MemoryQueries.from_lists(unsorted),
        MemoryQueries.from_lists(bad_sorted), cfg,
    )
    try:
        proof, public, params = pipeline.prove_permutation_argument(w, PARAMS)
    except AssertionError:
        return
    assert not pipeline.verify_permutation_argument(proof, public, params)


def _log_ev(ts, key, val, rollback=False):
    return dict(
        address=0xABCD, key=key, read_value=0, written_value=val, aux_byte=1,
        rw_flag=True, rollback=rollback, is_service=False, shard_id=0,
        tx_number_in_block=1, timestamp=ts,
    )


def test_log_sorter_grand_product_proven():
    """The SAME AIR proves log_sorter's argument (20-wide encodings)."""
    from zkevm_circuits_tpu.base_structures.log_query import LogQueries
    from zkevm_circuits_tpu.models import log_sorter as ls

    f10 = _log_ev(10, 111, 1000)
    f20 = _log_ev(20, 222, 2000)
    rb20 = _log_ev(20, 222, 2000, rollback=True)
    f30 = _log_ev(30, 333, 3000)
    cfg = ls.LogSorterConfig(limit=8)
    w = ls.generate_witness_jit(
        LogQueries.from_lists([f10, f20, f30, rb20]),
        LogQueries.from_lists([f10, f20, rb20, f30]), cfg,
    )
    ok, proof, public, params = pipeline.prove_sorter_argument(w, PARAMS_8)
    assert ok
    forged = gf.add(public, gf.ones(public.shape))
    assert not pipeline.verify_permutation_argument(proof, forged, params)


def test_storage_validity_grand_product_proven():
    """Extended (timestamped, 21-wide) encodings via enc_*_ext duck-typing."""
    from zkevm_circuits_tpu.base_structures.log_query import LogQueries
    from zkevm_circuits_tpu.models import storage_validity as sv

    def sq(addr, key, rv, wv, rw, rollback=False):
        return dict(
            address=addr, key=key, read_value=rv, written_value=wv,
            aux_byte=0, rw_flag=rw, rollback=rollback, is_service=False,
            shard_id=0, tx_number_in_block=0, timestamp=77,
        )

    a_read = sq(0xA, 1, 100, 100, False)
    a_write = sq(0xA, 1, 100, 200, True)
    b_write = sq(0xB, 2, 7, 8, True)
    b_rb = sq(0xB, 2, 7, 8, True, rollback=True)
    cfg = sv.StorageValidityConfig(limit=8)
    w = sv.generate_witness_jit(
        LogQueries.from_lists([a_read, b_write, a_write, b_rb]),
        LogQueries.from_lists([a_read, a_write, b_write, b_rb]),
        jnp.asarray([0, 2, 1, 3], jnp.uint32),
        cfg,
    )
    ok, _, _, _ = pipeline.prove_sorter_argument(w, PARAMS_8)
    assert ok


def test_decommit_sorter_grand_product_proven_and_tamper_rejected():
    from zkevm_circuits_tpu.base_structures.decommit_query import (
        DecommitQueries,
    )
    from zkevm_circuits_tpu.models import sort_decommittment_requests as sd

    HA = (0x0101 << 224) + 0xAAA
    HB = (0x0101 << 224) + 0xBBB

    def dq(code_hash, page, ts, is_first=False):
        return dict(code_hash=code_hash, page=page, timestamp=ts,
                    is_first=is_first)

    unsorted = [dq(HA, 100, 10, True), dq(HB, 200, 20, True), dq(HA, 100, 30)]
    sorted_q = [dq(HA, 100, 10, True), dq(HA, 100, 30), dq(HB, 200, 20, True)]
    cfg = sd.DecommitSorterConfig(limit=8)
    w = sd.generate_witness_jit(
        DecommitQueries.from_lists(unsorted),
        DecommitQueries.from_lists(sorted_q), cfg,
    )
    ok, _, _, _ = pipeline.prove_sorter_argument(w, PARAMS_8)
    assert ok

    # non-permutation: the sorted side's multiset differs -> verdict False
    bad = [dict(r) for r in sorted_q]
    bad[1]["page"] += 1
    wb = sd.generate_witness_jit(
        DecommitQueries.from_lists(unsorted),
        DecommitQueries.from_lists(bad), cfg,
    )
    try:
        okb, _, _, _ = pipeline.prove_sorter_argument(wb, PARAMS_8)
    except AssertionError:
        return  # prover refused: quotient not low-degree
    assert not okb


def test_non_pow2_witness_padded():
    """limit=12 -> 12 rows, padded to 16 inside the trace builder."""
    w, _ = _fixture_with_limit(12)
    ok, _, public, _ = pipeline.prove_sorter_argument(w)
    assert ok
    np.testing.assert_array_equal(
        np.asarray(public.astype_u64()), np.asarray(w.lhs.astype_u64())[-1]
    )


def _fixture_with_limit(limit):
    unsorted = [
        dict(timestamp=1025, memory_page=30, index=0, rw_flag=True,
             is_ptr=False, value=123),
        dict(timestamp=2052, memory_page=30, index=0, rw_flag=False,
             is_ptr=False, value=123),
    ]
    sorted_q = [unsorted[0], unsorted[1]]
    cfg = ram.RamPermutationConfig(limit=limit)
    return ram.generate_witness(
        MemoryQueries.from_lists(unsorted), MemoryQueries.from_lists(sorted_q),
        cfg,
    ), cfg


def test_full_sorter_proof_ram(proven):
    """Grand product + BOTH full-state queue-tail chains proven; challenges
    re-derived by the verifier from the proven tails."""
    w, _, _, _, _ = proven
    ok, full = pipeline.prove_sorter_full(w, gp_params=PARAMS)
    assert ok
    assert full.chain_u is not None and full.chain_s is not None
    # tampering with the claimed unsorted tail breaks verification
    import dataclasses as _dc

    bad = _dc.replace(full, tail_u=(full.tail_u + 1) % (2**64 - 2**32 + 1))
    assert not pipeline.verify_sorter_full(w, bad)


def test_full_sorter_proof_log_sorter():
    """Narrow (4-wide tail, 3-chunk push) chains via the same API."""
    from zkevm_circuits_tpu.base_structures.log_query import LogQueries
    from zkevm_circuits_tpu.models import log_sorter as ls

    f10 = _log_ev(10, 111, 1000)
    f30 = _log_ev(30, 333, 3000)
    cfg = ls.LogSorterConfig(limit=8)
    w = ls.generate_witness_jit(
        LogQueries.from_lists([f10, f30]), LogQueries.from_lists([f10, f30]),
        cfg,
    )
    ok, full = pipeline.prove_sorter_full(w, gp_params=PARAMS_8)
    assert ok
    assert full.tail_u.shape == (4,)


def test_leaf_layer_consumes_real_proof(proven):
    w, cfg, proof, public, params = proven
    air = pipeline.permutation_air()
    forms = ram.instance_compact_forms(w, cfg)
    commitment = forms.commitment()[0] if forms.commitment().ndim == 2 else forms.commitment()
    rp = pipeline.as_recursion_proof(proof, air, params, public, commitment)
    assert rp.is_valid  # verifier-produced, not witness-claimed

    queue_types = gf.full((1,), 8)  # circuit type 8 = ram_permutation
    res = recursion.leaf_layer_check(
        circuit_type=8,
        queue_types=queue_types,
        queue_commitments=commitment[None],
        execute=jnp.ones((1,), bool),
        proofs=[rp],
        basic_vk_commitment=pipeline.stark_vk_commitment(air, params),
    )
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name

    # a proof checked under a DIFFERENT vk must fail the leaf's vk check
    other_params = StarkParams(log_n=4, log_blowup=2, num_queries=13, cap_log2=1)
    res2 = recursion.leaf_layer_check(
        circuit_type=8,
        queue_types=queue_types,
        queue_commitments=commitment[None],
        execute=jnp.ones((1,), bool),
        proofs=[rp],
        basic_vk_commitment=pipeline.stark_vk_commitment(air, other_params),
    )
    assert not bool(np.asarray(res2["proof_vk"]).all())


# ---------------------------------------------------------------------------
# ClosedFormInput commitment proofs (prove_compact_commitment)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def commitment_proven():
    from zkevm_circuits_tpu.ops import poseidon2

    rng = np.random.default_rng(0xC0DE)
    enc = rng.integers(0, gf.MODULUS, size=18, dtype=np.uint64)
    want = np.asarray(poseidon2.hash_padded(gf.from_u64(enc)).astype_u64())
    proof, c, fs, params = pipeline.prove_compact_commitment(enc)
    return enc, want, proof, c, fs, params


def test_compact_commitment_matches_and_verifies(commitment_proven):
    enc, want, proof, c, fs, params = commitment_proven
    # the proven commitment IS commit_encoding(enc)
    np.testing.assert_array_equal(c, want)
    assert pipeline.verify_compact_commitment(proof, enc, c, fs, params)


def test_compact_commitment_binds_plaintext(commitment_proven):
    enc, _, proof, c, fs, params = commitment_proven
    forged = enc.copy()
    forged[5] ^= 1
    assert not pipeline.verify_compact_commitment(proof, forged, c, fs, params)


def test_compact_commitment_binds_claimed_value(commitment_proven):
    enc, _, proof, c, fs, params = commitment_proven
    forged = c.copy()
    forged[0] = (int(forged[0]) + 1) % gf.MODULUS
    assert not pipeline.verify_compact_commitment(proof, enc, forged, fs,
                                                  params)


def test_instance_commitments_over_compact_forms():
    from zkevm_circuits_tpu.utils import protocol

    rng = np.random.default_rng(3)
    obs_in = gf.from_u64(rng.integers(0, gf.MODULUS, (2, 6), dtype=np.uint64))
    obs_out = gf.from_u64(rng.integers(0, gf.MODULUS, (2, 3), dtype=np.uint64))
    fsm = gf.from_u64(rng.integers(0, gf.MODULUS, (2, 5), dtype=np.uint64))
    start = jnp.array([True, False])
    complete = jnp.array([False, True])
    forms = protocol.compact_form_from_parts(start, complete, obs_in, obs_out,
                                             fsm, fsm)
    ok, proofs = pipeline.prove_instance_commitments(forms)
    assert ok and len(proofs) == 2
