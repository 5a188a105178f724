"""storage_validity_by_grand_product — circuit type 9: storage-log dedup/sort.

Reference parity: `src/storage_validity_by_grand_product/` (entry
mod.rs:166-506, inner `sort_and_deduplicate_storage_access_inner`
mod.rs:510-897, I/O input.rs).  Semantics replicated:

  * `TimestampedStorageLogRecord` = LogQuery + extra 32-bit timestamp packed
    into encoding element 19 at bit offset 8 (mod.rs:63-95); the unsorted
    side gets the extension on the fly with timestamp = global cycle index
    (mod.rs:584-610).
  * grand products over the 20-element extended encodings; challenges from
    the two observable-input tails.
  * shard_id of every sorted record must equal shard_id_to_process
    (mod.rs:612-614).
  * ordering: packed key [key[0..8], address[0..5]] LSW-first non-strict
    ascending; equal keys => strictly increasing timestamps
    (mod.rs:635-648).
  * per-cell rollback-aware state machine (mod.rs:654-833): tracks
    {base_value, current_value, rollback depth, explicit-read-at-depth-0};
    on a cell switch emits a protective read (rw=false) or a write
    (rw=true, read_value = base, written_value = final) into the final
    sorted queue; finalization push when drained (mod.rs:835-880).

TPU design: the cell state machine is materialized as per-row state columns
(sequential witness scan; row-parallel transition checking) — identical
pattern to the queue sponge chains.  The shared transition function
`_cell_transition` runs both under `lax.scan` (witness, batch ()) and over
the whole trace at once (constraints, batch (N,)).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..base_structures.log_query import (
    LOG_QUERY_PACKED_WIDTH,
    LogQueries,
    encode_log_queries,
)
from ..ops import gf, queues
from ..ops.gf import GF
from ..ops.queues import QueueState
from ..utils import challenges as chal
from ..utils import protocol

NUM_REPETITIONS = chal.DEFAULT_NUM_REPETITIONS
TIMESTAMPED_STORAGE_LOG_ENCODING_LEN = 20
NUM_CHALLENGES = TIMESTAMPED_STORAGE_LOG_ENCODING_LEN + 1
EXTENDED_TIMESTAMP_ENCODING_ELEMENT = 19
EXTENDED_TIMESTAMP_ENCODING_OFFSET = 8
PACKED_KEY_LENGTH = 13  # ref input.rs:28


@dataclasses.dataclass(frozen=True)
class StorageValidityConfig:
    limit: int
    shard_id: int = 0


def extend_encoding_with_timestamp(enc: GF, timestamp: jnp.ndarray) -> GF:
    """enc[19] += ts << 8 (element 19 is the <8-bit rollback flag)."""
    ts = gf.from_u32(timestamp)
    shifted = gf.mul_const(ts, 1 << EXTENDED_TIMESTAMP_ENCODING_OFFSET)
    elem = gf.add(enc[..., EXTENDED_TIMESTAMP_ENCODING_ELEMENT], shifted)
    return gf.concat(
        [enc[..., :EXTENDED_TIMESTAMP_ENCODING_ELEMENT], gf.expand_dims(elem, -1)],
        axis=-1,
    )


def _empty_state(batch=()):
    u32 = lambda s=(): jnp.zeros(batch + s, dtype=jnp.uint32)
    return dict(
        base_value=u32((8,)),
        current_value=u32((8,)),
        depth=u32(),
        explicit_read=jnp.zeros(batch, dtype=bool),
        prev_address=u32((5,)),
        prev_key=u32((8,)),
        prev_timestamp=u32(),
        prev_trivial=jnp.ones(batch, dtype=bool),
    )


def _keys_equal(state, rec: LogQueries):
    return jnp.all(state["prev_key"] == rec.key, axis=-1) & jnp.all(
        state["prev_address"] == rec.address, axis=-1
    )


def _push_decision(state, shard_id):
    """The 'finish with the previous cell' push payload + should_update flag
    (ref mod.rs:666-705); everything derived from the carried state."""
    value_unchanged = jnp.all(state["current_value"] == state["base_value"], axis=-1)
    depth_zero = state["depth"] == 0
    unchanged_not_by_rollback = value_unchanged & ~depth_zero
    issue_protective_read = state["explicit_read"] | unchanged_not_by_rollback
    should_write = ~value_unchanged
    should_update = issue_protective_read | should_write
    batch = state["depth"].shape
    query = LogQueries(
        address=state["prev_address"],
        key=state["prev_key"],
        read_value=state["base_value"],
        written_value=state["current_value"],
        aux_byte=jnp.zeros(batch, jnp.uint32),
        rw_flag=should_write,
        rollback=jnp.zeros(batch, bool),
        is_service=jnp.zeros(batch, bool),
        shard_id=jnp.full(batch, shard_id, jnp.uint32),
        tx_number_in_block=jnp.zeros(batch, jnp.uint32),
        timestamp=jnp.zeros(batch, jnp.uint32),
    )
    return should_update, query


def _cell_transition(state, rec: LogQueries, ts: jnp.ndarray, execute, shard_id):
    """One row of the inner loop (ref mod.rs:584-833), batched or scalar.

    Returns (new_state, push_flag, push_query, checks_dict)."""
    trivial = ~execute
    keys_equal = _keys_equal(state, rec) & execute
    new_non_trivial_cell = execute & ~_keys_equal(state, rec)

    should_update, push_query = _push_decision(state, shard_id)
    push_flag = (~state["prev_trivial"]) & (~_keys_equal(state, rec)) & should_update

    # --- new-cell state refresh (mod.rs:707-752) ---
    meaningful = jnp.where(rec.rw_flag[..., None], rec.written_value, rec.read_value)
    base = jnp.where(new_non_trivial_cell[..., None], rec.read_value, state["base_value"])
    current = jnp.where(new_non_trivial_cell[..., None], meaningful, state["current_value"])
    depth_new_cell = jnp.where(rec.rw_flag, 1, 0).astype(jnp.uint32)
    depth = jnp.where(new_non_trivial_cell, depth_new_cell, state["depth"])
    explicit = jnp.where(new_non_trivial_cell, ~rec.rw_flag, state["explicit_read"])

    # --- same-cell update (mod.rs:755-825) ---
    same = execute & keys_equal
    read_same = same & ~rec.rw_flag
    write_no_rb = same & rec.rw_flag & ~rec.rollback
    write_rb = same & rec.rw_flag & rec.rollback
    depth = jnp.where(write_no_rb, depth + 1, depth)
    depth = jnp.where(write_rb, depth - 1, depth)
    read_consistent = jnp.all(current == rec.read_value, axis=-1)
    check_read = read_same | write_no_rb
    current = jnp.where(write_no_rb[..., None], rec.written_value, current)
    current = jnp.where(write_rb[..., None], rec.read_value, current)
    read_at_zero = (depth == 0) & read_same
    base = jnp.where(read_at_zero[..., None], rec.read_value, base)
    explicit = jnp.where(read_at_zero, True, explicit)

    new_state = dict(
        base_value=base,
        current_value=current,
        depth=depth,
        explicit_read=explicit,
        prev_address=jnp.where(execute[..., None], rec.address, state["prev_address"]),
        prev_key=jnp.where(execute[..., None], rec.key, state["prev_key"]),
        prev_timestamp=jnp.where(execute, ts, state["prev_timestamp"]),
        prev_trivial=trivial,
    )
    checks = dict(read_consistency=jnp.where(check_read, read_consistent, True))
    return new_state, push_flag, push_query, checks


def _packed_key_le(rec: LogQueries):
    """[key limbs(8), address limbs(5)] — address most significant."""
    return jnp.concatenate([rec.key, rec.address], axis=-1)


def _key_geq_prev(rec: LogQueries, total: int):
    """(cur > prev, cur == prev) on the 13-limb packed key vs previous row."""
    row = jnp.arange(total)
    prev = rec[jnp.maximum(row - 1, 0)]
    cur_k = _packed_key_le(rec)
    prev_k = _packed_key_le(prev)
    gt = jnp.zeros(total, dtype=bool)
    eq = jnp.ones(total, dtype=bool)
    for k in range(12, -1, -1):
        gt = gt | (eq & (cur_k[..., k] > prev_k[..., k]))
        eq = eq & (cur_k[..., k] == prev_k[..., k])
    eq = eq & (row > 0)
    gt = gt | (row == 0)  # row 0 compares against the zero key
    return gt, eq


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class StorageValidityWitness:
    n: jnp.ndarray
    execute: jnp.ndarray
    unsorted: LogQueries  # (N,)
    sorted: LogQueries  # (N,) records of the intermediate sorted queue
    sorted_ts: jnp.ndarray  # (N,) the extra TimestampedStorageLogRecord ts
    enc_unsorted_ext: GF  # (N, 20) extended with cycle index
    enc_sorted_ext: GF  # (N, 20)
    chain_unsorted: GF  # (N+1, 4) — over the RAW LogQuery encodings
    chain_sorted: GF  # (N+1, 4) — over the extended encodings
    challenges: GF
    lhs: GF
    rhs: GF
    cell_states: dict  # per-row state BEFORE the row, leaves (N+1, ...)
    push_flags: jnp.ndarray  # (N+1,)
    push_items: LogQueries  # (N+1,)
    result_chain: GF  # (N+2, 4)
    result_count: jnp.ndarray  # (N+1,)

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _pad_logs(q: LogQueries, total: int) -> LogQueries:
    n = q.shape[0]
    if n == total:
        return q
    pad = LogQueries.zeros((total - n,))
    return LogQueries(
        *[jnp.concatenate([a, b]) for a, b in zip(q.tree_flatten()[0], pad.tree_flatten()[0])]
    )


def generate_witness(
    unsorted: LogQueries,
    sorted_q: LogQueries,
    sorted_ts: jnp.ndarray,
    config: StorageValidityConfig,
) -> StorageValidityWitness:
    n = unsorted.shape[0]
    num_instances = max(1, -(-n // config.limit))
    total = num_instances * config.limit
    unsorted = _pad_logs(unsorted, total)
    sorted_q = _pad_logs(sorted_q, total)
    sorted_ts = jnp.concatenate(
        [jnp.asarray(sorted_ts, jnp.uint32), jnp.zeros(total - n, jnp.uint32)]
    )
    execute = jnp.arange(total, dtype=jnp.uint32) < jnp.uint32(n)
    cycle_idx = jnp.arange(total, dtype=jnp.uint32)

    enc_u_raw = encode_log_queries(unsorted)
    enc_s_raw = encode_log_queries(sorted_q)
    enc_u_ext = extend_encoding_with_timestamp(enc_u_raw, cycle_idx)
    enc_s_ext = extend_encoding_with_timestamp(enc_s_raw, sorted_ts)

    init4 = gf.zeros((4,))
    chain_u = queues.simulate_chain(init4, enc_u_raw, execute)
    chain_s = queues.simulate_chain(init4, enc_s_ext, execute)

    state_u = QueueState(gf.zeros((4,)), chain_u[total], jnp.uint32(n))
    state_s = QueueState(gf.zeros((4,)), chain_s[total], jnp.uint32(n))
    fs = chal.produce_fs_challenges(state_u, state_s, NUM_CHALLENGES, NUM_REPETITIONS)

    factors_u = chal.masked_factors(chal.grand_product_factors(enc_u_ext, fs), execute)
    factors_s = chal.masked_factors(chal.grand_product_factors(enc_s_ext, fs), execute)
    ones = gf.ones((NUM_REPETITIONS,))
    lhs = chal.product_accumulate(factors_u, ones)
    rhs = chal.product_accumulate(factors_s, ones)

    # sequential cell-state scan (witness only; checking is parallel)
    def body(carry, x):
        rec, ts, ex = x
        new_state, push_flag, push_query, _ = _cell_transition(
            carry, rec, ts, ex, config.shard_id
        )
        return new_state, (carry, push_flag, push_query)

    init_state = _empty_state()
    final_state, (states_before, push_flags, push_items) = jax.lax.scan(
        body, init_state, (sorted_q, sorted_ts, execute)
    )
    # append the final state (for the finalization push + FSM output)
    cell_states = {
        k: jnp.concatenate([states_before[k], final_state[k][None]])
        for k in states_before
    }
    fin_update, fin_query = _push_decision(final_state, config.shard_id)
    fin_flag = (~final_state["prev_trivial"]) & fin_update
    push_flags = jnp.concatenate([push_flags, fin_flag[None]])
    push_items = LogQueries(
        *[
            jnp.concatenate([a, b[None]])
            for a, b in zip(push_items.tree_flatten()[0], fin_query.tree_flatten()[0])
        ]
    )
    enc_result = encode_log_queries(push_items)
    result_chain = queues.simulate_chain(init4, enc_result, push_flags)
    result_count = jnp.cumsum(push_flags.astype(jnp.uint32), dtype=jnp.uint32)

    return StorageValidityWitness(
        n=jnp.uint32(n),
        execute=execute,
        unsorted=unsorted,
        sorted=sorted_q,
        sorted_ts=sorted_ts,
        enc_unsorted_ext=enc_u_ext,
        enc_sorted_ext=enc_s_ext,
        chain_unsorted=chain_u,
        chain_sorted=chain_s,
        challenges=fs,
        lhs=lhs,
        rhs=rhs,
        cell_states=cell_states,
        push_flags=push_flags,
        push_items=push_items,
        result_chain=result_chain,
        result_count=result_count,
    )


def eval_constraints(w: StorageValidityWitness, config: StorageValidityConfig) -> dict:
    total = w.execute.shape[0]
    s = w.sorted
    cycle_idx = jnp.arange(total, dtype=jnp.uint32)

    enc_u_raw = encode_log_queries(w.unsorted)
    enc_s_raw = encode_log_queries(s)
    enc_u_ok = jnp.all(
        gf.equal(extend_encoding_with_timestamp(enc_u_raw, cycle_idx), w.enc_unsorted_ext),
        axis=-1,
    )
    enc_s_ok = jnp.all(
        gf.equal(extend_encoding_with_timestamp(enc_s_raw, w.sorted_ts), w.enc_sorted_ext),
        axis=-1,
    )

    chain_u_ok = queues.check_chain(w.chain_unsorted, enc_u_raw, w.execute)
    chain_s_ok = queues.check_chain(w.chain_sorted, w.enc_sorted_ext, w.execute)

    state_u = QueueState(gf.zeros((4,)), w.chain_unsorted[total], w.n)
    state_s = QueueState(gf.zeros((4,)), w.chain_sorted[total], w.n)
    fs = chal.produce_fs_challenges(state_u, state_s, NUM_CHALLENGES, NUM_REPETITIONS)
    challenges_ok = jnp.all(gf.equal(fs, w.challenges))

    factors_u = chal.masked_factors(chal.grand_product_factors(w.enc_unsorted_ext, fs), w.execute)
    factors_s = chal.masked_factors(chal.grand_product_factors(w.enc_sorted_ext, fs), w.execute)
    ones = gf.ones((NUM_REPETITIONS,))
    prev_lhs = gf.concat([gf.expand_dims(ones, 0), w.lhs[:-1]], axis=0)
    prev_rhs = gf.concat([gf.expand_dims(ones, 0), w.rhs[:-1]], axis=0)
    lhs_ok = jnp.all(gf.equal(w.lhs, gf.mul(prev_lhs, factors_u)), axis=-1)
    rhs_ok = jnp.all(gf.equal(w.rhs, gf.mul(prev_rhs, factors_s)), axis=-1)

    shard_ok = jnp.where(w.execute, s.shard_id == jnp.uint32(config.shard_id), True)

    key_gt, key_eq = _key_geq_prev(s, total)
    order_ok = jnp.where(w.execute, key_gt | key_eq, True)
    row = jnp.arange(total)
    prev_ts = jnp.where(row > 0, w.sorted_ts[jnp.maximum(row - 1, 0)], 0)
    ts_ok = jnp.where(w.execute & key_eq, prev_ts < w.sorted_ts, True)

    # cell-state transitions + pushes, all rows at once
    states_before = {k: v[:-1] for k, v in w.cell_states.items()}
    new_state, push_flags, push_items, checks = _cell_transition(
        states_before, s, w.sorted_ts, w.execute, config.shard_id
    )
    state_ok = jnp.ones(total, dtype=bool)
    for k in new_state:
        expected = new_state[k]
        actual = w.cell_states[k][1:]
        state_ok = state_ok & jnp.all(
            (expected == actual).reshape(total, -1), axis=-1
        )
    fin_update, fin_query = _push_decision(
        {k: v[total] for k, v in w.cell_states.items()}, config.shard_id
    )
    fin_flag = (~w.cell_states["prev_trivial"][total]) & fin_update
    flags_ok = jnp.concatenate([push_flags, fin_flag[None]]) == w.push_flags
    expected_items = LogQueries(
        *[
            jnp.concatenate([a, b[None]])
            for a, b in zip(push_items.tree_flatten()[0], fin_query.tree_flatten()[0])
        ]
    )
    items_ok = jnp.ones(total + 1, dtype=bool)
    for a, b in zip(expected_items.tree_flatten()[0], w.push_items.tree_flatten()[0]):
        items_ok = items_ok & jnp.all((a == b).reshape(total + 1, -1), axis=-1)
    enc_result = encode_log_queries(w.push_items)
    result_chain_ok = queues.check_chain(w.result_chain, enc_result, w.push_flags)
    prev_count = jnp.concatenate([jnp.zeros((1,), jnp.uint32), w.result_count[:-1]])
    count_ok = w.result_count == prev_count + w.push_flags.astype(jnp.uint32)

    final_eq = jnp.all(gf.equal(w.lhs[total - 1], w.rhs[total - 1]))

    return {
        "encoding_unsorted": enc_u_ok,
        "encoding_sorted": enc_s_ok,
        "chain_unsorted": chain_u_ok,
        "chain_sorted": chain_s_ok,
        "challenges": challenges_ok,
        "lhs_transitions": lhs_ok,
        "rhs_transitions": rhs_ok,
        "shard_id": shard_ok,
        "key_order": order_ok,
        "timestamp_order": ts_ok,
        "read_consistency": checks["read_consistency"],
        "cell_state_transitions": state_ok,
        "push_flags": flags_ok,
        "push_items": items_ok,
        "result_chain": result_chain_ok,
        "result_count": count_ok,
        "grand_product_final": final_eq,
    }


def all_ok(residuals: dict) -> bool:
    return all(bool(np.asarray(v).all()) for v in residuals.values())


generate_witness_jit = jax.jit(generate_witness, static_argnums=(3,))
eval_constraints_jit = jax.jit(eval_constraints, static_argnums=(1,))


# ---------------------------------------------------------------------------
# ClosedFormInput per instance
# ---------------------------------------------------------------------------


def _encode_queue_state(qs: QueueState) -> GF:
    return gf.concat(
        [qs.head, qs.tail, gf.expand_dims(gf.from_u32(qs.length), -1)], axis=-1
    )


def instance_compact_forms(w: StorageValidityWitness, config: StorageValidityConfig):
    """FSM mirrors StorageDeduplicatorFSMInputOutput (ref input.rs:38-51):
    [lhs(2), rhs(2), unsorted_qs(9), intermediate_qs(9), final_qs(9),
    cycle_idx(1), previous_packed_key(13), previous_key(8),
    previous_address(5), previous_timestamp(1),
    this_cell_has_explicit_read_and_rollback_depth_zero(1), base_value(8),
    current_value(8), current_depth(1)] = 77 elements."""
    from ..utils import protocol as proto

    total = w.execute.shape[0]
    limit = config.limit
    k = total // limit
    bounds = jnp.arange(k + 1, dtype=jnp.int32) * limit
    ones = gf.ones((NUM_REPETITIONS,))
    cs = w.cell_states

    def fsm_at(b):
        prev_row = jnp.maximum(b - 1, 0)
        at_start = b == 0
        lhs = gf.select(at_start, ones, GF(w.lhs.lo[prev_row], w.lhs.hi[prev_row]))
        rhs = gf.select(at_start, ones, GF(w.rhs.lo[prev_row], w.rhs.hi[prev_row]))
        remaining = w.n - jnp.minimum(b.astype(jnp.uint32), w.n)
        qs_u = QueueState(w.chain_unsorted[b], w.chain_unsorted[total], remaining)
        qs_s = QueueState(w.chain_sorted[b], w.chain_sorted[total], remaining)
        res_idx = jnp.where(b == total, total + 1, b)
        res_len = jnp.where(
            b == 0, 0, w.result_count[jnp.where(b == total, total, prev_row)]
        ).astype(jnp.uint32)
        qs_res = QueueState(gf.zeros((4,)), w.result_chain[res_idx], res_len)
        state_b = {key: v[b] for key, v in cs.items()}
        packed = jnp.concatenate([state_b["prev_key"], state_b["prev_address"]])
        return gf.concat(
            [
                lhs,
                rhs,
                _encode_queue_state(qs_u),
                _encode_queue_state(qs_s),
                _encode_queue_state(qs_res),
                gf.expand_dims(gf.from_u32(b.astype(jnp.uint32)), -1),
                gf.from_u32(packed),
                gf.from_u32(state_b["prev_key"]),
                gf.from_u32(state_b["prev_address"]),
                gf.expand_dims(gf.from_u32(state_b["prev_timestamp"]), -1),
                gf.expand_dims(proto.bool_to_gf(state_b["explicit_read"]), -1),
                gf.from_u32(state_b["base_value"]),
                gf.from_u32(state_b["current_value"]),
                gf.expand_dims(gf.from_u32(state_b["depth"]), -1),
            ],
            axis=-1,
        )

    fsm_states = jax.vmap(fsm_at)(bounds)
    qs_u0 = QueueState(gf.zeros((4,)), w.chain_unsorted[total], w.n)
    qs_s0 = QueueState(gf.zeros((4,)), w.chain_sorted[total], w.n)
    shard = gf.full((1,), config.shard_id)
    obs_in_single = gf.concat(
        [shard, _encode_queue_state(qs_u0), _encode_queue_state(qs_s0)], axis=-1
    )
    obs_in = GF(
        jnp.broadcast_to(obs_in_single.lo, (k,) + obs_in_single.lo.shape),
        jnp.broadcast_to(obs_in_single.hi, (k,) + obs_in_single.hi.shape),
    )
    qs_final = QueueState(
        gf.zeros((4,)), w.result_chain[total + 1], w.result_count[total]
    )
    out_single = _encode_queue_state(qs_final)
    obs_out = GF(
        jnp.broadcast_to(out_single.lo, (k,) + out_single.lo.shape),
        jnp.broadcast_to(out_single.hi, (k,) + out_single.hi.shape),
    )
    start_flags = jnp.arange(k) == 0
    completion_flags = (jnp.arange(k, dtype=jnp.uint32) + 1) * jnp.uint32(limit) >= w.n
    return proto.compact_form_from_parts(
        start_flags, completion_flags, obs_in, obs_out, fsm_states[:-1], fsm_states[1:]
    )
