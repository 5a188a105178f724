"""The ClosedFormInput multi-instance continuation protocol.

Reference parity: `src/fsm_input_output/mod.rs` in
matter-labs/era-zkevm_circuits — the single most important cross-circuit
mechanism (SURVEY.md §5.4).  Every circuit instance's interface is a
`ClosedFormInput{start_flag, completion_flag, observable_input,
observable_output, hidden_fsm_input, hidden_fsm_output}`; the compact form
commits each part to 4 field elements with masking rules
(`from_full_form`, ref mod.rs:216-242):

  * fsm_input  commitment is zeroed when start_flag       (ref :221-226)
  * observable_output commitment is zeroed unless completion_flag (:229-234)
  * fsm_output commitment is zeroed when completion_flag  (:237-242)
  * observable_input commitment is NEVER masked           (:216)

Commitments use the Poseidon2 sponge with zero padding and length
specialization (`commit_encoding`, ref mod.rs:281-326) — exactly our
`poseidon2.hash_padded`.

The compact form itself encodes to 18 elements (2 flags + 4x4 lanes) and is
committed the same way; the scheduler pushes that 4-lane commitment into the
per-circuit-type recursion queue (ref `src/scheduler/mod.rs:932-961`).

Everything here is batch-parallel: commitments for many instances at once.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops import gf, poseidon2
from ..ops.gf import GF

CLOSED_FORM_COMMITMENT_LENGTH = 4
INPUT_OUTPUT_COMMITMENT_LENGTH = 4
COMPACT_FORM_ENCODING_LENGTH = 2 + 4 * CLOSED_FORM_COMMITMENT_LENGTH  # 18


def commit_encoding(encoding: GF) -> GF:
    """Commit a variable-length encoding to 4 lanes (zero-pad + length spec).

    Mirrors `commit_encoding` / `commit_variable_length_encodable_item`
    (ref fsm_input_output/mod.rs:257-326).
    """
    return poseidon2.hash_padded(encoding, length_specialize=True)


def bool_to_gf(flag) -> GF:
    """Boolean array -> 0/1 field element."""
    flag = jnp.asarray(flag)
    return gf.from_u32(flag.astype(jnp.uint32))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ClosedFormInputCompactForm:
    """4-lane commitments per part + flags (ref mod.rs:166-175)."""

    start_flag: jnp.ndarray  # (...,) bool
    completion_flag: jnp.ndarray  # (...,) bool
    observable_input_commitment: GF  # (..., 4)
    observable_output_commitment: GF  # (..., 4)
    hidden_fsm_input_commitment: GF  # (..., 4)
    hidden_fsm_output_commitment: GF  # (..., 4)

    def tree_flatten(self):
        return (
            self.start_flag,
            self.completion_flag,
            self.observable_input_commitment,
            self.observable_output_commitment,
            self.hidden_fsm_input_commitment,
            self.hidden_fsm_output_commitment,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def encode(self) -> GF:
        """18-element encoding in field order (flags then the 4 commitments)."""
        return gf.concat(
            [
                gf.expand_dims(bool_to_gf(self.start_flag), -1),
                gf.expand_dims(bool_to_gf(self.completion_flag), -1),
                self.observable_input_commitment,
                self.observable_output_commitment,
                self.hidden_fsm_input_commitment,
                self.hidden_fsm_output_commitment,
            ],
            axis=-1,
        )

    def commitment(self) -> GF:
        """The per-instance 4-lane commitment the scheduler queues up."""
        return commit_encoding(self.encode())


def compact_form_from_parts(
    start_flag,
    completion_flag,
    observable_input_encoding: GF,
    observable_output_encoding: GF,
    hidden_fsm_input_encoding: GF,
    hidden_fsm_output_encoding: GF,
) -> ClosedFormInputCompactForm:
    """Commit each part and apply the masking rules (ref mod.rs:178-254)."""
    start_flag = jnp.asarray(start_flag)
    completion_flag = jnp.asarray(completion_flag)
    obs_in = commit_encoding(observable_input_encoding)
    obs_out = commit_encoding(observable_output_encoding)
    fsm_in = commit_encoding(hidden_fsm_input_encoding)
    fsm_out = commit_encoding(hidden_fsm_output_encoding)

    zero = gf.zeros(obs_in.shape)
    start_mask = jnp.expand_dims(start_flag, -1)
    complete_mask = jnp.expand_dims(completion_flag, -1)
    fsm_in = gf.select(start_mask, zero, fsm_in)
    obs_out = gf.select(complete_mask, obs_out, zero)
    fsm_out = gf.select(complete_mask, zero, fsm_out)
    return ClosedFormInputCompactForm(
        start_flag=start_flag,
        completion_flag=completion_flag,
        observable_input_commitment=obs_in,
        observable_output_commitment=obs_out,
        hidden_fsm_input_commitment=fsm_in,
        hidden_fsm_output_commitment=fsm_out,
    )


def input_output_commitment(compact: ClosedFormInputCompactForm) -> GF:
    """The circuit's 4 public inputs = commitment of the compact form
    (every `*_entry_point` ends this way, e.g. ref src/main_vm/mod.rs:221-229).
    """
    return compact.commitment()


def single_instance_compact_form(
    observable_input_encoding: GF,
    observable_output_encoding: GF,
    hidden_fsm_encoding: GF = None,
) -> ClosedFormInputCompactForm:
    """Compact form for a circuit running as ONE instance (start=complete=
    true — the linear_hasher/eip_4844 shape, ref linear_hasher mod.rs:67).

    With start and completion both set, the masking rules zero both hidden
    FSM commitments regardless of the payload."""
    if hidden_fsm_encoding is None:
        hidden_fsm_encoding = gf.zeros(observable_input_encoding.shape[:-1] + (0,))
    batch = observable_input_encoding.shape[:-1]
    t = jnp.ones(batch, dtype=bool)
    return compact_form_from_parts(
        t, t, observable_input_encoding, observable_output_encoding,
        hidden_fsm_encoding, hidden_fsm_encoding,
    )


def encode_queue_state_generic(head: GF, tail: GF, length) -> GF:
    """[head lanes, tail lanes, length] — the pinned QueueState encoding."""
    return gf.concat(
        [head, tail, gf.expand_dims(gf.from_u32(jnp.asarray(length, jnp.uint32)), -1)],
        axis=-1,
    )


def check_instance_chaining(
    start_flags: jnp.ndarray,
    completion_flags: jnp.ndarray,
    fsm_input_commitments: GF,
    fsm_output_commitments: GF,
) -> dict:
    """Scheduler-side chaining invariants over an instance sequence (axis 0).

    Mirrors ref `src/scheduler/mod.rs:820-823, 914-930`:
      * start_flag[0] is True
      * start_flag[k+1] == completion_flag[k]
      * fsm_output_commitment[k] == fsm_input_commitment[k+1] when chained
    Returns dict of boolean arrays, all must be True.
    """
    first_starts = start_flags[0]
    chained = start_flags[1:] == completion_flags[:-1]
    fsm_match = jnp.all(
        gf.equal(fsm_output_commitments[:-1], fsm_input_commitments[1:]), axis=-1
    )
    # fsm handoff only needs to match where the next instance continues
    fsm_ok = fsm_match | start_flags[1:]
    return {
        "first_starts": first_starts,
        "chained": chained,
        "fsm_handoff": fsm_ok,
    }
