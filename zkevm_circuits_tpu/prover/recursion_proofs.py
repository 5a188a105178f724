"""Real STARK proofs at the recursion tree's leaves (VERDICT r4 item 1/1).

Replaces the host-constructed ProofSurrogate with actual StarkProof
verification where the tree touches the base layer (ref
`src/recursion/leaf_layer/mod.rs:150-198`: pop query -> verify proof ->
enforce public-input == queued commitment):

  * every circuit instance carries a `CarriedProof`: the sponge-chain STARK
    of `commitment = commit_encoding(compact_form)` (prover/pipeline.py,
    ref fsm_input_output/mod.rs:281-326), optionally AND-ed with the
    circuit's relation proof (the sorter full argument of
    `pipeline.prove_sorter_full`, ref utils.rs:81-137);
  * `leaf_layer_verify_starks` runs the REAL verifier per instance and
    EXTRACTS the public-input commitment from the proven publics
    (final_state[:4] of the sponge proof) — the leaf's public is the
    verified proof's public, then demands equality with the commitment the
    scheduler queued;
  * the resulting `ProofBatch.is_valid` entries are verifier verdicts, so
    the existing batched tree checks (models/recursion.py) operate on real
    cryptographic outcomes.

The remaining IOU (step 2, prover/verifier_air.py): expressing one such
verification itself as an AIR so "this leaf verified its children" becomes
a provable statement rather than a trusted host loop.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..models import recursion
from ..ops import gf
from ..ops.gf import GF
from . import pipeline
from .stark import StarkParams, StarkProof


@dataclasses.dataclass
class CarriedProof:
    """One instance's proof bundle carried into a recursion leaf.

    `encoding` is PUBLIC data (the plaintext ClosedFormInput compact form —
    the verifier recomputes the absorbed chunks and the message RLC from
    it, `pipeline.verify_compact_commitment`); `final_state` is the claimed
    final sponge state whose first 4 lanes are the commitment."""

    proof: StarkProof
    params: StarkParams
    encoding: np.ndarray      # (18,) u64 plaintext compact-form encoding
    final_state: np.ndarray   # (12,) u64
    # optional circuit-relation proof verified alongside (duck-typed:
    # (witness, SorterFullProof) for the grand-product families)
    relation: Optional[Tuple[object, object]] = None


def commitment_vk() -> GF:
    """(4,) VK commitment of the compact-form commitment STARK — the
    `basic_circuit_vk_commitment` a leaf pins (ref leaf_layer/mod.rs:91-127
    — a proof only counts under the key the leaf expects)."""
    from . import poseidon2_air as pa

    # all compact forms are 18 elements -> 3 FULL-spec chunks -> log_n = 3
    return pipeline.stark_vk_commitment(
        pa.chain_air(pa.FULL), StarkParams(log_n=3, log_blowup=2)
    )


def make_carried_proofs(compact_forms,
                        relation: Optional[Tuple[object, object]] = None
                        ) -> List[CarriedProof]:
    """Prove every instance's ClosedFormInput commitment for one circuit
    type and bundle the proofs for the leaf layer.  `relation` (shared by
    the type's instances) is attached to the FIRST instance — one relation
    proof per circuit run, per the block driver's one-witness-per-type
    shape."""
    enc = np.asarray(compact_forms.encode().astype_u64(), np.uint64)
    if enc.ndim == 1:
        enc = enc[None]
    out = []
    for k in range(enc.shape[0]):
        proof, _commitment, final_state, params = (
            pipeline.prove_compact_commitment(enc[k])
        )
        out.append(CarriedProof(
            proof=proof, params=params, encoding=enc[k],
            final_state=final_state,
            relation=relation if k == 0 else None,
        ))
    return out


def verify_carried(cp: CarriedProof) -> Optional[np.ndarray]:
    """Run the REAL verifier; on success return the (4,) public-input
    commitment EXTRACTED from the proven publics (None on failure)."""
    commitment = np.asarray(cp.final_state[:4], np.uint64)
    ok = pipeline.verify_compact_commitment(
        cp.proof, cp.encoding, commitment, cp.final_state, cp.params
    )
    if cp.relation is not None:
        witness, full = cp.relation
        ok = bool(ok) and bool(pipeline.verify_sorter_full(witness, full))
    return commitment if ok else None


def carried_to_batch(carried: Sequence[CarriedProof]) -> recursion.ProofBatch:
    """ProofBatch whose is_valid/public_input come from REAL verification —
    a failed proof yields public_input=0 and is_valid=False (never the
    claimed values)."""
    vk = commitment_vk()
    publics, valid = [], []
    for cp in carried:
        extracted = verify_carried(cp)
        if extracted is None:
            publics.append(np.zeros(4, np.uint64))
            valid.append(False)
        else:
            publics.append(extracted)
            valid.append(True)
    m = len(carried)
    return recursion.ProofBatch(
        public_input=gf.from_u64(np.stack(publics)),
        is_valid=jnp.asarray(valid),
        vk_commitment=GF(
            jnp.broadcast_to(vk.lo, (m, 4)), jnp.broadcast_to(vk.hi, (m, 4))
        ),
    )


@dataclasses.dataclass
class NodeInFieldProof:
    """A node-level STARK proving the verification of its children's FRI
    query phase IN-FIELD (prover/verifier_air.py) — VERDICT r3 item 1 step
    2: "this node verified its children" becomes a provable statement.

    Outer checks kept host-side (documented in verifier_air.py): the
    public-coin FS replay and the DEEP-combine binding; `node_verify` runs
    them via the ordinary child verifier, and additionally demands the
    in-field proof of the query phase."""

    vproof: StarkProof
    vparams: StarkParams
    child_fri_params: tuple


def node_prove_in_field(children: Sequence[CarriedProof]) -> NodeInFieldProof:
    """Produce the node's verifier STARK over its children's FRI proofs.
    Raises if any child proof is invalid — a node cannot honestly claim to
    have verified a bad child."""
    from . import poseidon2_air as pa
    from .stark import _fri_params
    from . import verifier_air as va

    fri_ps = tuple(
        _fri_params(pa.chain_air(pa.FULL), cp.params) for cp in children
    )
    fri_proofs = [cp.proof.fri_proof for cp in children]
    vproof, _publics, vparams = va.prove_fri_verification(fri_proofs, fri_ps)
    return NodeInFieldProof(vproof, vparams, fri_ps)


def node_verify_in_field(node: NodeInFieldProof,
                         children: Sequence[CarriedProof]) -> bool:
    """The node check: every child verifies under the ordinary verifier
    (cheap outer parts) AND the in-field STARK proves the query-phase
    verification of EXACTLY these children's FRI proofs (the publics are
    rebuilt from the children, so a swapped/tampered child fails)."""
    from . import verifier_air as va

    for cp in children:
        if verify_carried(cp) is None:
            return False
    fri_proofs = [cp.proof.fri_proof for cp in children]
    return va.verify_fri_verification(
        node.vproof, fri_proofs, node.child_fri_params, node.vparams
    )


@dataclasses.dataclass
class VerifiedNodeProof:
    """A scheduler node-slot proof whose `is_valid` is the outcome of REAL
    verification — the leaf-layer STARK checks over every instance's
    carried commitment proof (+ its attached circuit-relation proof), and
    optionally the node's in-field FRI-verification STARK.  Replaces
    `recursion.ProofSurrogate` in the block flow (VERDICT r4 item 7); the
    scheduler consumes it duck-typed (public_input / is_valid /
    vk_commitment, ref scheduler/mod.rs:1026-1076)."""

    public_input: GF          # (4,) node input commitment
    is_valid: bool
    vk_commitment: Optional[GF] = None


def scheduler_node_proof(
    circuit_type: int,
    compact_forms,
    leaf_params,
    node_vk_commitment: tuple,
    relation: Optional[Tuple[object, object]] = None,
    extra_ok: bool = True,
    in_field: bool = False,
) -> Tuple[VerifiedNodeProof, List[CarriedProof], bool]:
    """Build one circuit type's scheduler node-slot proof THROUGH the leaf
    path: prove every instance's compact-form commitment, verify each with
    the real verifier (relation proof attached to instance 0), run the
    batched leaf checks against the queued commitments, optionally prove
    the node's FRI verification in-field, and expose the node input
    commitment with the verified verdict.

    Returns (proof, carried, leaf_ok) — `leaf_ok` excludes `extra_ok` so
    callers can report the leaf verdict separately."""
    import jax.numpy as jnp

    from ..models import scheduler as sched_mod
    from ..ops import queues

    carried = make_carried_proofs(compact_forms, relation=relation)
    k = len(carried)
    types = gf.full((k,), circuit_type)
    commitments = compact_forms.commitment().reshape((k, 4))
    execute = jnp.ones(k, dtype=bool)
    checks = leaf_layer_verify_starks(
        circuit_type, types, commitments, execute, carried
    )
    leaf_ok = all(bool(np.asarray(v).all()) for v in checks.values())
    if in_field and leaf_ok:
        node = node_prove_in_field(carried)
        leaf_ok = leaf_ok and node_verify_in_field(node, carried)
    qchain = recursion.build_recursion_queue(
        types, compact_forms.commitment(), execute
    )
    qs = queues.QueueState(gf.zeros((12,)), qchain[k], jnp.uint32(k))
    commitment = sched_mod.node_input_commitment(
        circuit_type, leaf_params, node_vk_commitment, qs
    )
    proof = VerifiedNodeProof(
        public_input=commitment,
        is_valid=bool(leaf_ok) and bool(extra_ok),
        vk_commitment=gf.from_u64(np.array(node_vk_commitment, np.uint64)),
    )
    return proof, carried, leaf_ok


def leaf_layer_verify_starks(
    circuit_type: int,
    queue_types: GF,
    queue_commitments: GF,
    execute,
    carried: Sequence[CarriedProof],
) -> Dict[str, object]:
    """The leaf layer on REAL proofs (ref leaf_layer/mod.rs:150-198): verify
    each queued instance's STARK, extract its public-input commitment, and
    run the batched leaf checks (type match + public-input == queued
    commitment + VK pin) on the verifier-produced batch."""
    batch = carried_to_batch(carried)
    return recursion.leaf_layer_check(
        circuit_type, queue_types, queue_commitments, execute, batch,
        basic_vk_commitment=commitment_vk(),
    )
