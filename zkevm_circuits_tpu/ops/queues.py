"""Circuit queues as array programs.

Reference-parity role: boojum's `CircuitQueue` (4-lane head/tail commitments;
used by log/recursion queues) and `FullStateCircuitQueue` (12-lane full sponge
state; memory/decommit queues) — SURVEY.md §2.3.  In the reference a queue is
a gadget whose push/pop threads a Poseidon2 sponge state element-to-element
(e.g. `simulate_new_tail_for_full_state_queue`, reference
`src/main_vm/cycle.rs:850-867`).

TPU design (trace-first):
  * A queue *trace* materializes the per-element sponge states as dense
    columns.  The chain itself is sequential, but once materialized, checking
    every transition `state[i+1] == absorb(state[i], enc[i])` is row-parallel:
    one batched Poseidon2 over all rows — this is the constraint-eval path.
  * Witness generation of a chain runs as a `lax.scan` on device (fine for
    one instance's `limit` rows) or in the native C++ runtime for bulk tapes.

Pinned sponge spec (self-consistent; boojum's table-level conventions are not
available in this environment — constants/orderings are data, swappable):
  * Full-state queue (W=12): tail state IS the 12-lane sponge state.
    push(enc8): state' = P(state with rate lanes replaced by enc8).
  * Narrow queue (W=4): tail is 4 lanes.  push(enc_L):
      s = zeros(12); s[8:12] = tail
      for each 8-chunk of zero-padded enc: s[0:8] = chunk; s = P(s)
      tail' = s[0:4]
  * Length increments by 1 per executed push/pop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from . import gf, poseidon2
from .gf import GF

FULL_STATE_WIDTH = 12  # FULL_SPONGE_QUEUE_STATE_WIDTH (ref vm_state/mod.rs:27)
NARROW_STATE_WIDTH = 4  # QUEUE_STATE_WIDTH (ref vm_state/mod.rs:28)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class QueueState:
    """head lanes, tail lanes, length — mirrors boojum's QueueState."""

    head: GF  # (..., W)
    tail: GF  # (..., W)
    length: jnp.ndarray  # (...,) uint32

    def tree_flatten(self):
        return (self.head, self.tail, self.length), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def width(self):
        return self.head.shape[-1]


def empty_queue_state(width: int, batch_shape=()) -> QueueState:
    z = gf.zeros(tuple(batch_shape) + (width,))
    return QueueState(z, z, jnp.zeros(batch_shape, dtype=jnp.uint32))


def is_queue_empty(state: QueueState) -> jnp.ndarray:
    return state.length == 0


def queue_states_equal(a: QueueState, b: QueueState) -> jnp.ndarray:
    """Mirrors `is_equal_queue_state` (reference src/utils.rs:139-155)."""
    heads = jnp.all(gf.equal(a.head, b.head), axis=-1)
    tails = jnp.all(gf.equal(a.tail, b.tail), axis=-1)
    return heads & tails & (a.length == b.length)


# ---------------------------------------------------------------------------
# Single-transition functions (batch-parallel over leading axes)
# ---------------------------------------------------------------------------


def full_state_transition(state: GF, encoding: GF, execute) -> GF:
    """W=12 push: permute with rate replaced; identity where not executed.

    state: (..., 12), encoding: (..., 8), execute: (...,) bool.
    """
    new = poseidon2.absorb_round(encoding, state)
    return gf.select(jnp.expand_dims(execute, -1), new, state)


def narrow_state_transition(tail: GF, encoding: GF, execute) -> GF:
    """W=4 push: multi-chunk absorb; identity where not executed.

    tail: (..., 4), encoding: (..., L), execute: (...,) bool.
    """
    batch = tail.shape[:-1]
    length = encoding.shape[-1]
    padded = length + (-length) % poseidon2.RATE
    if padded != length:
        encoding = gf.concat([encoding, gf.zeros(batch + (padded - length,))], axis=-1)
    state = gf.concat([gf.zeros(batch + (poseidon2.RATE,)), tail], axis=-1)
    for i in range(0, padded, poseidon2.RATE):
        state = poseidon2.absorb_round(encoding[..., i : i + poseidon2.RATE], state)
    new_tail = state[..., :NARROW_STATE_WIDTH]
    return gf.select(jnp.expand_dims(execute, -1), new_tail, tail)


def transition(state_lanes: GF, encoding: GF, execute) -> GF:
    if state_lanes.shape[-1] == FULL_STATE_WIDTH:
        return full_state_transition(state_lanes, encoding, execute)
    return narrow_state_transition(state_lanes, encoding, execute)


# ---------------------------------------------------------------------------
# Chain simulation (sequential witness generation, on device)
# ---------------------------------------------------------------------------


def simulate_chain(
    init_lanes: GF, encodings: GF, execute: Optional[jnp.ndarray] = None
) -> GF:
    """Run the sponge chain over n elements; returns all n+1 states.

    init_lanes: (W,), encodings: (n, L), execute: (n,) bool or None.
    Returns (n+1, W): states[0] == init, states[i+1] = push(states[i], enc[i]).
    Sequential by nature — use for witness generation of one instance, or use
    the native runtime for bulk tapes.
    """
    n = encodings.shape[0]
    if execute is None:
        execute = jnp.ones((n,), dtype=bool)

    def body(carry: GF, x):
        enc, ex = x
        new = transition(carry, enc, ex)
        return new, new

    _, states = jax.lax.scan(body, init_lanes, (encodings, execute))
    init_expanded = gf.expand_dims(init_lanes, 0)
    return gf.concat([init_expanded, states], axis=0)


def check_chain_segmented(
    boundaries: GF,
    encodings: GF,
    execute: Optional[jnp.ndarray] = None,
    unroll_permutation: bool = False,
) -> jnp.ndarray:
    """Verify a sponge chain from segment-boundary states only.

    boundaries: (S+1, W) — the chain state every `stride` rows, where
    stride = n // S; encodings: (n, L).  The device recomputes each segment
    with a batched scan (all segments in parallel, `stride` sequential steps)
    and compares the landing states — HBM traffic drops from O(n) states to
    O(S), the standard segmented-scan decomposition of the chain.
    Returns (S,) bool.
    """
    n = encodings.shape[0]
    S = boundaries.shape[0] - 1
    assert n % S == 0, (n, S)
    stride = n // S
    if execute is None:
        execute = jnp.ones((n,), dtype=bool)
    enc_seg = encodings.reshape((S, stride) + encodings.shape[1:])
    ex_seg = execute.reshape(S, stride)
    start = boundaries[:-1]  # (S, W)

    if unroll_permutation:
        from .poseidon2_tuned import absorb_round_unrolled

        def tr(state, enc, ex):
            new = absorb_round_unrolled(enc, state)
            return gf.select(jnp.expand_dims(ex, -1), new, state)
    else:
        tr = transition

    def body(carry: GF, x):
        enc, ex = x
        return tr(carry, enc, ex), None

    final, _ = jax.lax.scan(
        body,
        start,
        (
            GF(jnp.moveaxis(enc_seg.lo, 1, 0), jnp.moveaxis(enc_seg.hi, 1, 0)),
            jnp.moveaxis(ex_seg, 1, 0),
        ),
    )
    return jnp.all(gf.equal(final, boundaries[1:]), axis=-1)


def check_chain(
    states: GF, encodings: GF, execute: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Row-parallel verification that `states` is a valid sponge chain.

    states: (n+1, W), encodings: (n, L).  Returns (n,) bool — all True iff
    states[i+1] == push(states[i], enc[i]) for every row.  This is ONE
    batched Poseidon2 over all n rows (the TPU-native constraint check).
    """
    n = encodings.shape[0]
    if execute is None:
        execute = jnp.ones((n,), dtype=bool)
    inputs = states[:-1]
    expected = transition(inputs, encodings, execute)
    return jnp.all(gf.equal(expected, states[1:]), axis=-1)
