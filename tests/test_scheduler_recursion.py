"""Scheduler orchestration + recursion aggregation layer."""

import numpy as np
import jax.numpy as jnp
import pytest

from zkevm_circuits_tpu.base_structures.memory_query import MemoryQueries
from zkevm_circuits_tpu.models import ram_permutation as ram
from zkevm_circuits_tpu.models import recursion, scheduler
from zkevm_circuits_tpu.ops import gf, queues
from zkevm_circuits_tpu.utils import protocol


def ram_compact_forms():
    rows = [
        dict(timestamp=100 + i, memory_page=7, index=i, rw_flag=True,
             is_ptr=False, value=1000 + i)
        for i in range(4)
    ]
    cfg = ram.RamPermutationConfig(limit=2)
    q = MemoryQueries.from_lists(rows)
    w = ram.generate_witness(q, q, cfg)
    return ram.instance_compact_forms(w, cfg)


def leaf_params(ctype):
    return recursion.RecursionLeafParameters(
        circuit_type=ctype,
        basic_circuit_vk_commitment=(11, 12, 13, 14),
        leaf_vk_commitment=(21, 22, 23, 24),
    )


def test_scheduler_block_flow():
    cf = ram_compact_forms()
    node_vk = (31, 32, 33, 34)
    lp = {t: leaf_params(t) for t in scheduler.SEQUENCE_OF_CIRCUIT_TYPES}

    # build the expected node-proof surrogate for type 8 (ram)
    k = int(np.asarray(cf.start_flag).shape[0])
    commitments = cf.commitment()
    qchain = recursion.build_recursion_queue(
        gf.full((k,), 8), commitments, jnp.ones(k, dtype=bool)
    )
    qs = queues.QueueState(gf.zeros((12,)), qchain[k], jnp.uint32(k))
    proof = recursion.ProofSurrogate(
        public_input=scheduler.node_input_commitment(8, lp[8], node_vk, qs),
        is_valid=True,
        vk_commitment=gf.from_u64(np.array(node_vk, dtype=np.uint64)),
    )

    result = scheduler.run_scheduler(
        compact_forms_by_type={8: cf},
        node_proofs_by_type={8: proof},
        leaf_params_by_type=lp,
        node_vk_commitment=node_vk,
        previous_block_content_hash=b"\x11" * 32,
        block_data=scheduler.BlockPassthroughData(),
        block_meta=scheduler.BlockMetaParameters(),
        aux_output=scheduler.BlockAuxilaryOutput(),
    )
    assert scheduler.all_ok(result), result.checks
    assert result.public_input.astype_u64().shape == (4,)
    # deterministic
    result2 = scheduler.run_scheduler(
        {8: cf}, {8: proof}, lp, node_vk, b"\x11" * 32,
        scheduler.BlockPassthroughData(), scheduler.BlockMetaParameters(),
        scheduler.BlockAuxilaryOutput(),
    )
    np.testing.assert_array_equal(
        result.public_input.astype_u64(), result2.public_input.astype_u64()
    )


def test_scheduler_rejects_bad_proof():
    cf = ram_compact_forms()
    node_vk = (31, 32, 33, 34)
    lp = {t: leaf_params(t) for t in scheduler.SEQUENCE_OF_CIRCUIT_TYPES}
    bad_proof = recursion.ProofSurrogate(
        public_input=gf.from_u64(np.array([1, 2, 3, 4], dtype=np.uint64)),
        is_valid=True,
        vk_commitment=gf.from_u64(np.array(node_vk, dtype=np.uint64)),
    )
    result = scheduler.run_scheduler(
        {8: cf}, {8: bad_proof}, lp, node_vk, b"\x11" * 32,
        scheduler.BlockPassthroughData(), scheduler.BlockMetaParameters(),
        scheduler.BlockAuxilaryOutput(),
    )
    assert not result.checks["ram_validation_node_proof"]


def test_leaf_layer():
    n = 3
    types = gf.full((n,), 8)
    commitments = gf.from_u64(
        np.arange(1, n * 4 + 1, dtype=np.uint64).reshape(n, 4)
    )
    execute = jnp.ones(n, dtype=bool)
    proofs = [
        recursion.ProofSurrogate(commitments[i], True) for i in range(n)
    ]
    res = recursion.leaf_layer_check(8, types, commitments, execute, proofs)
    assert all(bool(np.asarray(v).all()) for v in res.values())
    # wrong type rejected
    res2 = recursion.leaf_layer_check(9, types, commitments, execute, proofs)
    assert not bool(np.asarray(res2["type_match"]).all())


def test_node_layer_split():
    n = 8
    types = gf.full((n,), 8)
    commitments = gf.from_u64(np.arange(32, dtype=np.uint64).reshape(n, 4))
    chain = recursion.build_recursion_queue(
        types, commitments, jnp.ones(n, dtype=bool)
    )
    parent = queues.QueueState(chain[0], chain[n], jnp.uint32(n))
    children = recursion.split_queue_chain(chain, n, 4, [2, 4, 6])
    res = recursion.check_split(parent, children)
    assert all(bool(np.asarray(v).all()) for v in res.values())
    assert [int(np.asarray(c.length)) for c in children] == [2, 2, 2, 2]
    # a wrong split point breaks the glue
    bad_children = recursion.split_queue_chain(chain, n, 4, [2, 4, 6])
    tampered = queues.QueueState(
        bad_children[1].head, bad_children[2].tail, bad_children[1].length
    )
    bad = [bad_children[0], tampered, bad_children[2], bad_children[3]]
    res2 = recursion.check_split(parent, bad)
    assert not bool(np.asarray(res2["glue"]).all())


def test_interblock_aggregation():
    pis = [
        gf.from_u64(np.array([1, 2, 3, 4], dtype=np.uint64)),
        gf.from_u64(np.array([5, 6, 7, 8], dtype=np.uint64)),
    ]
    h = recursion.interblock_aggregate_keccak(pis)
    assert len(h) == 32
    h2 = recursion.interblock_aggregate_keccak(list(reversed(pis)))
    assert h != h2


def test_node_layer_verify_batched():
    # fully-batched interior node check (node_layer/mod.rs:135-249): children
    # proofs verified against recomputed commitments + the right VK
    n, m, leaf_cap = 8, 4, 2
    types = gf.full((n,), 8)
    commitments = gf.from_u64(np.arange(32, dtype=np.uint64).reshape(n, 4))
    chain = recursion.build_recursion_queue(
        types, commitments, jnp.ones(n, dtype=bool)
    )
    parent = queues.QueueState(chain[0], chain[n], jnp.uint32(n))
    bounds = jnp.asarray([0, 2, 4, 6, 8])
    lp = leaf_params(8)
    node_vk = gf.from_u64(np.array([31, 32, 33, 34], dtype=np.uint64))

    heads, tails = chain[bounds[:-1]], chain[bounds[1:]]
    lengths = bounds[1:] - bounds[:-1]
    # n (=8) <= leaf_cap*m (=8) -> children are leaves -> leaf commitments
    child_cms = recursion.leaf_input_commitments_batched(lp, heads, tails, lengths)
    leaf_vk = gf.from_u64(np.array(lp.leaf_vk_commitment, dtype=np.uint64))
    proofs = recursion.ProofBatch(
        public_input=child_cms,
        is_valid=jnp.ones(m, dtype=bool),
        vk_commitment=gf.GF(
            jnp.broadcast_to(leaf_vk.lo, (m, 4)),
            jnp.broadcast_to(leaf_vk.hi, (m, 4)),
        ),
    )
    res = recursion.node_layer_verify(
        8, parent, chain, bounds, leaf_cap, lp, node_vk, proofs
    )
    assert all(bool(np.asarray(v).all()) for k, v in res.items())
    assert bool(np.asarray(res["children_are_leaves"]))

    # a proof under the WRONG VK is rejected (the VK-decision wiring)
    bad = recursion.ProofBatch(
        public_input=child_cms,
        is_valid=jnp.ones(m, dtype=bool),
        vk_commitment=gf.GF(
            jnp.broadcast_to(node_vk.lo, (m, 4)),
            jnp.broadcast_to(node_vk.hi, (m, 4)),
        ),
    )
    res2 = recursion.node_layer_verify(
        8, parent, chain, bounds, leaf_cap, lp, node_vk, bad
    )
    assert not bool(np.asarray(res2["children_proofs"]))

    # the whole check jits
    import jax

    jitted = jax.jit(
        lambda ch, pr: recursion.node_layer_verify(
            8, parent, ch, bounds, leaf_cap, lp, node_vk, pr
        )
    )
    res3 = jitted(chain, proofs)
    assert bool(np.asarray(res3["children_proofs"]))


def test_leaf_layer_vk_check():
    n = 3
    types = gf.full((n,), 8)
    commitments = gf.from_u64(
        np.arange(1, n * 4 + 1, dtype=np.uint64).reshape(n, 4)
    )
    execute = jnp.ones(n, dtype=bool)
    vk = (21, 22, 23, 24)
    good = [
        recursion.ProofSurrogate(
            commitments[i], True,
            vk_commitment=gf.from_u64(np.array(vk, dtype=np.uint64)),
        )
        for i in range(n)
    ]
    res = recursion.leaf_layer_check(
        8, types, commitments, execute, good, basic_vk_commitment=vk
    )
    assert all(bool(np.asarray(v).all()) for v in res.values())
    # proofs with no VK (or the wrong one) are rejected
    bare = [recursion.ProofSurrogate(commitments[i], True) for i in range(n)]
    res2 = recursion.leaf_layer_check(
        8, types, commitments, execute, bare, basic_vk_commitment=vk
    )
    assert not bool(np.asarray(res2["proof_vk"]).all())


def test_interblock_invalid_slot_masking():
    pis = [
        gf.from_u64(np.array([1, 2, 3, 4], dtype=np.uint64)),
        gf.from_u64(np.array([5, 6, 7, 8], dtype=np.uint64)),
    ]
    zero = gf.from_u64(np.zeros(4, dtype=np.uint64))
    # an invalid slot contributes zero bytes: forging its payload is inert
    h_masked = recursion.interblock_aggregate_keccak(pis, valid=[True, False])
    h_zeroed = recursion.interblock_aggregate_keccak([pis[0], zero])
    assert h_masked == h_zeroed
    # ...but a VALID slot's payload matters
    h_full = recursion.interblock_aggregate_keccak(pis)
    assert h_full != h_masked


@pytest.mark.slow
def test_leaf_layer_real_stark_proofs():
    """The leaf layer on REAL proofs (VERDICT r4 item 1 step 1, ref
    leaf_layer/mod.rs:150-198): each queued instance carries an actual
    sponge-chain STARK of its ClosedFormInput commitment; the leaf runs the
    real verifier, takes the public-input commitment FROM the proven
    publics, and demands equality with the queued commitment + pinned VK.
    Tampering with any part of a carried proof breaks the leaf."""
    from zkevm_circuits_tpu.prover import recursion_proofs as rp

    cf = ram_compact_forms()
    carried = rp.make_carried_proofs(cf)
    k = len(carried)
    commitments = cf.commitment().reshape((k, 4))
    execute = jnp.ones(k, dtype=bool)

    res = rp.leaf_layer_verify_starks(
        8, gf.full((k,), 8), commitments, execute, carried
    )
    assert all(bool(np.asarray(v).all()) for v in res.values()), res

    # 1) tampered claimed final state -> the STARK rejects -> leaf rejects
    import copy

    bad = copy.copy(carried[0])
    fs = np.array(bad.final_state, copy=True)
    fs[0] ^= 1
    bad.final_state = fs
    res1 = rp.leaf_layer_verify_starks(
        8, gf.full((k,), 8), commitments, execute, [bad] + carried[1:]
    )
    assert not bool(np.asarray(res1["proof_inputs"]).all())

    # 2) claiming a DIFFERENT compact form under an honest proof -> the
    # message-RLC binding rejects
    bad2 = copy.copy(carried[0])
    enc = np.array(bad2.encoding, copy=True)
    enc[3] ^= 1
    bad2.encoding = enc
    res2 = rp.leaf_layer_verify_starks(
        8, gf.full((k,), 8), commitments, execute, [bad2] + carried[1:]
    )
    assert not bool(np.asarray(res2["proof_inputs"]).all())

    # 3) a verified proof for the WRONG commitment (instances swapped) ->
    # public-input equality fails even though every STARK verifies
    if k >= 2:
        swapped = [carried[1], carried[0]] + carried[2:]
        res3 = rp.leaf_layer_verify_starks(
            8, gf.full((k,), 8), commitments, execute, swapped
        )
        assert not bool(np.asarray(res3["proof_inputs"]).all())

    # 4) wrong circuit type in the queue
    res4 = rp.leaf_layer_verify_starks(
        9, gf.full((k,), 8), commitments, execute, carried
    )
    assert not bool(np.asarray(res4["type_match"]).all())


def test_scheduler_node_proof_carries_relation():
    """VERDICT r4 item 7: the scheduler's node slot is built THROUGH the
    leaf path (VerifiedNodeProof) with the sorter RELATION proof attached —
    a tampered sorter witness breaks the slot's is_valid via the leaf
    verification, with the evaluator bypassed entirely."""
    import copy

    from zkevm_circuits_tpu.prover import pipeline as pl
    from zkevm_circuits_tpu.prover import recursion_proofs as rp

    rows = [
        dict(timestamp=100 + i, memory_page=7, index=i, rw_flag=True,
             is_ptr=False, value=1000 + i)
        for i in range(4)
    ]
    cfg = ram.RamPermutationConfig(limit=2)
    q = MemoryQueries.from_lists(rows)
    w = ram.generate_witness(q, q, cfg)
    cf = ram.instance_compact_forms(w, cfg)
    lp = leaf_params(8)
    node_vk = (1, 2, 3, 4)

    ok, full = pl.prove_sorter_full(w)
    assert ok
    proof, carried, leaf_ok = rp.scheduler_node_proof(
        8, cf, lp, node_vk, relation=(w, full)
    )
    assert leaf_ok and proof.is_valid
    assert proof.public_input.shape == (4,)
    # the slot verdict is the real leaf outcome; feeding it to the
    # scheduler's proof gate is what test_scheduler_rejects_bad_proof pins

    # tampered sorter witness under the SAME relation proof -> the leaf's
    # relation verification fails -> slot invalid
    import dataclasses as _dc

    enc = np.array(np.asarray(w.enc_sorted.astype_u64()), copy=True)
    enc[1, 0] ^= 1
    bad_w = _dc.replace(w, enc_sorted=gf.from_u64(enc))
    proof_t, _, leaf_ok_t = rp.scheduler_node_proof(
        8, cf, lp, node_vk, relation=(bad_w, full)
    )
    assert not leaf_ok_t and not proof_t.is_valid

    # extra_ok (e.g. a failed hash-chain verdict) also invalidates the slot
    proof_x, _, _ = rp.scheduler_node_proof(
        8, cf, lp, node_vk, relation=(w, full), extra_ok=False
    )
    assert not proof_x.is_valid
