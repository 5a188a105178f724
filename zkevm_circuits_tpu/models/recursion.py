"""Recursion/aggregation layer — leaf, node, compression, interblock.

Reference parity: `src/recursion/` — `leaf_layer_recursion_entry_point`
(leaf_layer/mod.rs:56-214), `node_layer_recursion_entry_point`
(node_layer/mod.rs:61-316 incl. `split_queue_state_into_n` :261-316),
`proof_compression_function` (compression/mod.rs:42-121), and
`interblock_recursion_function` + keccak input aggregation
(interblock/mod.rs:45-154, keccak_aggregator.rs).  NUM_BASE_LAYER_CIRCUITS =
13, VK_COMMITMENT_LENGTH = 4 (recursion/mod.rs:8-9).

RecursionQuery packs to 8 elements [circuit_type, c0..c3, 0, 0, 0]
(base_structures/recursion_query/mod.rs:29-46) and lives in a full-state
(width 12) queue.

Proof verification placeholder: until the FRI prover lands, an
`AllocatedProof` surrogate is (public_input_commitment: 4 GF, is_valid flag);
"verify" = commitment equality + validity — the leaf/node/queue-splitting
STRUCTURE (which defines the multi-host aggregation tree) is fully
implemented and checked.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gf, queues
from ..ops.gf import GF
from ..ops.queues import QueueState
from ..utils import protocol

NUM_BASE_LAYER_CIRCUITS = 13
VK_COMMITMENT_LENGTH = 4
RECURSION_QUERY_PACKED_WIDTH = 8


def encode_recursion_queries(circuit_type: GF, commitments: GF) -> GF:
    """(n,) type + (n, 4) commitments -> (n, 8) encodings."""
    z = gf.zeros(circuit_type.shape)
    return gf.concat(
        [
            gf.expand_dims(circuit_type, -1),
            commitments,
            gf.stack([z, z, z], axis=-1),
        ],
        axis=-1,
    )


def build_recursion_queue(circuit_type: GF, commitments: GF, execute) -> GF:
    """full-state queue chain over the recursion queries; returns (n+1, 12)."""
    enc = encode_recursion_queries(circuit_type, commitments)
    return queues.simulate_chain(gf.zeros((12,)), enc, execute)


@dataclasses.dataclass
class ProofSurrogate:
    """Stand-in for AllocatedProof until a prover exists.

    `vk_commitment` records WHICH verification key the proof verifies
    under — the leaf/node layers must check it against the expected VK
    (ref leaf_layer/mod.rs:91-127, node_layer/mod.rs:135-159); a proof
    carrying no VK fails any VK-checked site."""

    public_input: GF  # (4,)
    is_valid: bool
    vk_commitment: Optional[GF] = None  # (4,)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ProofBatch:
    """Stacked proofs for the batched (jit/shard-compatible) tree checks."""

    public_input: GF  # (n, 4)
    is_valid: jnp.ndarray  # (n,)
    vk_commitment: GF  # (n, 4)

    def tree_flatten(self):
        return (self.public_input, self.is_valid, self.vk_commitment), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def stack_proofs(proofs: Sequence[ProofSurrogate]) -> ProofBatch:
    vks = [
        p.vk_commitment if p.vk_commitment is not None else gf.zeros((4,))
        for p in proofs
    ]
    return ProofBatch(
        public_input=gf.stack([p.public_input for p in proofs], axis=0),
        is_valid=jnp.asarray([bool(p.is_valid) for p in proofs]),
        vk_commitment=gf.stack(vks, axis=0),
    )


@dataclasses.dataclass(frozen=True)
class RecursionLeafParameters:
    """ref leaf_layer/input.rs:26-43 — per-type leaf params commitment."""

    circuit_type: int
    basic_circuit_vk_commitment: tuple  # 4 ints
    leaf_vk_commitment: tuple  # 4 ints

    def encode(self) -> GF:
        vals = [self.circuit_type, *self.basic_circuit_vk_commitment, *self.leaf_vk_commitment]
        return gf.from_u64(np.array(vals, dtype=np.uint64))


def leaf_layer_check(
    circuit_type: int,
    queue_types: GF,
    queue_commitments: GF,
    execute,
    proofs,
    basic_vk_commitment=None,
) -> dict:
    """Leaf aggregation (ref leaf_layer/mod.rs:91-127, 150-204): every queued
    query's type must match; each claimed proof's public input must equal the
    queued commitment AND the proof must verify under the base-layer circuit
    VK whose commitment the leaf carries in its params; the queue must be
    fully drained (capacity >= length).  Fully batched: `proofs` may be a
    ProofBatch or a sequence of ProofSurrogate."""
    if not isinstance(proofs, ProofBatch):
        proofs = stack_proofs(proofs)
    type_ok = jnp.where(
        execute, gf.equal(queue_types, gf.full((), circuit_type)), True
    )
    input_ok = jnp.where(
        execute,
        jnp.all(gf.equal(proofs.public_input, queue_commitments), axis=-1)
        & proofs.is_valid,
        True,
    )
    out = {"type_match": type_ok, "proof_inputs": input_ok}
    if basic_vk_commitment is not None:
        expected_vk = (
            basic_vk_commitment
            if isinstance(basic_vk_commitment, GF)
            else gf.from_u64(np.array(basic_vk_commitment, dtype=np.uint64))
        )
        out["proof_vk"] = jnp.where(
            execute,
            jnp.all(gf.equal(proofs.vk_commitment, expected_vk), axis=-1),
            True,
        )
    return out


def leaf_input_commitment(
    params: RecursionLeafParameters, queue_state: QueueState
) -> GF:
    """commitment to RecursionLeafInput{params, queue_state}."""
    enc = gf.concat(
        [
            params.encode(),
            queue_state.head,
            queue_state.tail,
            gf.expand_dims(gf.from_u32(queue_state.length), -1),
        ],
        axis=-1,
    )
    return protocol.commit_encoding(enc)


def split_queue_chain(
    chain: GF, total_length, split_into: int, split_points: Sequence[int]
) -> List[QueueState]:
    """Split a materialized queue chain into consecutive sub-queue states.

    Mirrors `split_queue_state_into_n` (node_layer/mod.rs:261-316): the
    caller provides split points; heads/tails glue (here by construction,
    validated by `check_split`), lengths sum to the total.
    """
    bounds = [0, *split_points, int(total_length)]
    assert len(bounds) == split_into + 1
    out = []
    for i in range(split_into):
        b0, b1 = bounds[i], bounds[i + 1]
        assert b0 <= b1
        out.append(QueueState(chain[b0], chain[b1], jnp.uint32(b1 - b0)))
    return out


def check_split(parent: QueueState, children: List[QueueState]) -> dict:
    """Gluing invariants: heads chain tail-to-head, lengths sum, ends match."""
    head_ok = jnp.all(gf.equal(children[0].head, parent.head))
    glue_ok = jnp.ones((), dtype=bool)
    for a, b in zip(children[:-1], children[1:]):
        glue_ok = glue_ok & jnp.all(gf.equal(a.tail, b.head))
    tail_ok = jnp.all(gf.equal(children[-1].tail, parent.tail))
    total = sum(int(np.asarray(c.length)) for c in children)
    len_ok = jnp.asarray(total == int(np.asarray(parent.length)))
    return {"head": head_ok, "glue": glue_ok, "tail": tail_ok, "length": len_ok}


def node_layer_check(
    parent_state: QueueState,
    chain: GF,
    split_points: Sequence[int],
    node_capacity: int,
    leaf_capacity: int,
    child_proofs: Sequence[ProofSurrogate],
    child_input_commitments: Sequence[GF],
) -> dict:
    """Interior tree node (ref node_layer/mod.rs:135-249): split the queue,
    decide children-are-leaves by length <= leaf_capacity * node_capacity,
    verify each child proof against the recomputed child input commitment."""
    children = split_queue_chain(
        chain, int(np.asarray(parent_state.length)), node_capacity, split_points
    )
    res = check_split(parent_state, children)
    length = int(np.asarray(parent_state.length))
    children_are_leaves = length <= leaf_capacity * node_capacity
    ok = jnp.ones((), dtype=bool)
    for child, proof, commitment in zip(children, child_proofs, child_input_commitments):
        should_verify = int(np.asarray(child.length)) > 0
        if should_verify:
            ok = ok & jnp.all(gf.equal(proof.public_input, commitment)) & proof.is_valid
    res["children_proofs"] = ok
    res["children_are_leaves"] = jnp.asarray(children_are_leaves)
    return res


def _params_enc_broadcast(params: RecursionLeafParameters, m: int) -> GF:
    e = params.encode()  # (9,)
    return GF(
        jnp.broadcast_to(e.lo, (m,) + e.lo.shape),
        jnp.broadcast_to(e.hi, (m,) + e.hi.shape),
    )


def leaf_input_commitments_batched(
    params: RecursionLeafParameters, heads: GF, tails: GF, lengths
) -> GF:
    """(m,) leaf-input commitments: RecursionLeafInput{params, queue_state}
    committed per child (ref leaf_layer/input.rs)."""
    m = heads.shape[0]
    enc = gf.concat(
        [
            _params_enc_broadcast(params, m),
            heads,
            tails,
            gf.expand_dims(gf.from_u32(jnp.asarray(lengths, jnp.uint32)), -1),
        ],
        axis=-1,
    )
    return protocol.commit_encoding(enc)


def node_input_commitments_batched(
    circuit_type: int,
    params: RecursionLeafParameters,
    node_vk_commitment: GF,
    heads: GF,
    tails: GF,
    lengths,
) -> GF:
    """(m,) node-input commitments: RecursionNodeInput{type, params, node_vk,
    queue_state} (ref node_layer/input.rs)."""
    m = heads.shape[0]
    vk = GF(
        jnp.broadcast_to(node_vk_commitment.lo, (m,) + node_vk_commitment.lo.shape),
        jnp.broadcast_to(node_vk_commitment.hi, (m,) + node_vk_commitment.hi.shape),
    )
    enc = gf.concat(
        [
            GF(
                jnp.full((m, 1), circuit_type, jnp.uint32),
                jnp.zeros((m, 1), jnp.uint32),
            ),
            _params_enc_broadcast(params, m),
            vk,
            heads,
            tails,
            gf.expand_dims(gf.from_u32(jnp.asarray(lengths, jnp.uint32)), -1),
        ],
        axis=-1,
    )
    return protocol.commit_encoding(enc)


def node_layer_verify(
    circuit_type: int,
    parent_state: QueueState,
    chain: GF,
    bounds: jnp.ndarray,
    leaf_capacity: int,
    params: RecursionLeafParameters,
    node_vk_commitment,
    proofs: ProofBatch,
) -> dict:
    """Interior tree node, fully batched/jittable (ref node_layer/mod.rs:
    135-249 + :261-316): split the parent queue at `bounds` (a (m+1,) index
    vector into `chain`, bounds[0]==0), decide children-are-leaves by
    length <= leaf_capacity * m, recompute every child's input commitment
    in BOTH forms and select, and verify each non-empty child proof against
    the selected commitment AND the depth-appropriate VK (leaf VK when the
    children are leaves, the node VK otherwise — the VK-decision wiring of
    node_layer/mod.rs:135-159).  No python-int control flow: the result is a
    dict of device booleans and the whole check jits/shards."""
    if not isinstance(node_vk_commitment, GF):
        node_vk_commitment = gf.from_u64(
            np.array(node_vk_commitment, dtype=np.uint64)
        )
    m = bounds.shape[0] - 1
    heads = chain[bounds[:-1]]
    tails = chain[bounds[1:]]
    lengths = (bounds[1:] - bounds[:-1]).astype(jnp.uint32)

    res = {}
    res["head"] = jnp.all(gf.equal(heads[0], parent_state.head))
    res["tail"] = jnp.all(gf.equal(tails[m - 1], parent_state.tail))
    res["glue"] = jnp.all(gf.equal(heads[1:], tails[:-1]))
    res["length"] = lengths.sum() == parent_state.length

    children_are_leaves = parent_state.length <= jnp.uint32(leaf_capacity * m)
    leaf_cms = leaf_input_commitments_batched(params, heads, tails, lengths)
    node_cms = node_input_commitments_batched(
        circuit_type, params, node_vk_commitment, heads, tails, lengths
    )
    expected = gf.select(
        jnp.broadcast_to(children_are_leaves, (m, 1)), leaf_cms, node_cms
    )
    leaf_vk = gf.from_u64(np.array(params.leaf_vk_commitment, dtype=np.uint64))
    expected_vk = gf.select(
        jnp.broadcast_to(children_are_leaves, (m, 4)),
        GF(
            jnp.broadcast_to(leaf_vk.lo, (m, 4)),
            jnp.broadcast_to(leaf_vk.hi, (m, 4)),
        ),
        GF(
            jnp.broadcast_to(node_vk_commitment.lo, (m, 4)),
            jnp.broadcast_to(node_vk_commitment.hi, (m, 4)),
        ),
    )
    row_ok = (
        jnp.all(gf.equal(proofs.public_input, expected), axis=-1)
        & jnp.all(gf.equal(proofs.vk_commitment, expected_vk), axis=-1)
        & proofs.is_valid
    )
    res["children_proofs"] = jnp.all(row_ok | (lengths == 0))
    res["children_are_leaves"] = children_are_leaves
    return res


def compression_check(proof: ProofSurrogate, expected_input: GF) -> jnp.ndarray:
    """ref compression/mod.rs:42-121: verify exactly one proof over a baked-in
    VK and re-expose its public input."""
    return jnp.all(gf.equal(proof.public_input, expected_input)) & jnp.asarray(
        proof.is_valid
    )


def interblock_aggregate_keccak(
    public_inputs: List[GF], valid: Optional[Sequence[bool]] = None
) -> bytes:
    """ref interblock/keccak_aggregator.rs:5-96: keccak256 over the
    concatenated byte-decomposed public inputs (8 bytes BE per field
    element).  The aggregator has a FIXED slot capacity; `valid` marks the
    occupied slots — an invalid slot's bytes are masked to zero before
    absorption (the conditional byte-select of keccak_aggregator.rs:44-77),
    so a forged trailing slot cannot alter the aggregate unless its validity
    bit is set."""
    from ..ops.keccak import keccak256_ref

    if valid is None:
        valid = [True] * len(public_inputs)
    data = bytearray()
    for pi, ok in zip(public_inputs, valid):
        for v in np.asarray(pi.astype_u64()).reshape(-1):
            data += int(v).to_bytes(8, "big") if ok else b"\x00" * 8
    return keccak256_ref(bytes(data))
