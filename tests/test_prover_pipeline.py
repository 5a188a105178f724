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
