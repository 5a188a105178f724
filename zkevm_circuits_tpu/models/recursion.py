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
    """Stand-in for AllocatedProof until a prover exists."""

    public_input: GF  # (4,)
    is_valid: bool


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
    proofs: Sequence[ProofSurrogate],
) -> dict:
    """Leaf aggregation (ref leaf_layer/mod.rs:150-204): every queued query's
    type must match, and each claimed proof's public input must equal the
    queued commitment; the queue must be fully drained (capacity >= length).
    """
    n = queue_types.shape[0]
    type_ok = jnp.where(
        execute, gf.equal(queue_types, gf.full((), circuit_type)), True
    )
    proof_inputs = gf.stack([p.public_input for p in proofs], axis=0)
    valid = jnp.asarray([p.is_valid for p in proofs])
    input_ok = jnp.where(
        execute,
        jnp.all(gf.equal(proof_inputs, queue_commitments), axis=-1) & valid,
        True,
    )
    return {"type_match": type_ok, "proof_inputs": input_ok}


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


def compression_check(proof: ProofSurrogate, expected_input: GF) -> jnp.ndarray:
    """ref compression/mod.rs:42-121: verify exactly one proof over a baked-in
    VK and re-expose its public input."""
    return jnp.all(gf.equal(proof.public_input, expected_input)) & jnp.asarray(
        proof.is_valid
    )


def interblock_aggregate_keccak(public_inputs: List[GF]) -> bytes:
    """ref interblock/keccak_aggregator.rs: keccak256 over the concatenated
    byte-decomposed public inputs (8 bytes BE per field element)."""
    from ..ops.keccak import keccak256_ref

    data = bytearray()
    for pi in public_inputs:
        for v in np.asarray(pi.astype_u64()).reshape(-1):
            data += int(v).to_bytes(8, "big")
    return keccak256_ref(bytes(data))
