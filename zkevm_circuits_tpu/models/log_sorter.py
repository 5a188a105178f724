"""log_sorter — circuit types 11/12: events / L1-messages deduplicator.

Reference parity: `src/log_sorter/` (entry `sort_and_deduplicate_events_entry_point`
mod.rs:34-232, inner `repack_and_prove_events_rollbacks_inner` mod.rs:234-441,
I/O types input.rs).  The same circuit is instantiated twice by the scheduler
(events, L1 messages).  Semantics replicated:

  * two narrow (width-4) log queues popped in lockstep; equal lengths
    (mod.rs:275-279); grand products over the 20-element LogQuery encodings
    with FS challenges from both initial tails (mod.rs:113-132).
  * every popped item (both queues) must be a write (mod.rs:294-297, 317-320).
  * sort key = timestamp only; non-strict ascending (equal only for a
    forward/rollback pair) (mod.rs:326-334).
  * rollback-cancellation: a new timestamp must be non-rollback; a repeated
    timestamp must be the rollback of the previous log, and their key and
    written_value must agree (mod.rs:336-363).
  * the surviving (non-rolled-back) previous item is pushed into the result
    queue with cleaned fields: read_value=0, rw_flag=false, aux_byte=0,
    rollback=false, timestamp=0 (mod.rs:367-397); a finalization push after
    the last pop when the queue drained (mod.rs:405-435).

TPU design: identical trace-first shape as ram_permutation — flat rows =
pops; one extra virtual row for the finalization push; per-row chain states
for all three queues materialized so the constraint pass is 100% row-parallel.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

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
NUM_CHALLENGES = LOG_QUERY_PACKED_WIDTH + 1


@dataclasses.dataclass(frozen=True)
class LogSorterConfig:
    limit: int


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LogSorterWitness:
    n: jnp.ndarray  # () u32
    execute: jnp.ndarray  # (N,)
    unsorted: LogQueries  # (N,)
    sorted: LogQueries  # (N,)
    enc_unsorted: GF  # (N, 20)
    enc_sorted: GF  # (N, 20)
    chain_unsorted: GF  # (N+1, 4)
    chain_sorted: GF  # (N+1, 4)
    challenges: GF  # (2, 21)
    lhs: GF  # (N, 2)
    rhs: GF  # (N, 2)
    result_items: LogQueries  # (N+1,) cleaned previous items
    result_add: jnp.ndarray  # (N+1,) bool
    result_chain: GF  # (N+2, 4)
    result_count: jnp.ndarray  # (N+1,) u32 cumulative pushes

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _pad(q: LogQueries, total: int) -> LogQueries:
    n = q.shape[0]
    if n == total:
        return q
    pad = LogQueries.zeros((total - n,))
    leaves = [
        jnp.concatenate([a, b]) for a, b in zip(q.tree_flatten()[0], pad.tree_flatten()[0])
    ]
    return LogQueries(*leaves)


def _shift_one(q: LogQueries, extra_last: bool = False) -> LogQueries:
    """prev-row view: row i -> q[i-1]; row 0 -> zeros.  If extra_last, append
    one more row equal to q[N-1] (the finalization row's 'previous')."""
    idx = jnp.maximum(jnp.arange(q.shape[0]) - 1, 0)
    prev = q[idx]
    zero_first = LogQueries.zeros((1,))
    first = jnp.arange(q.shape[0]) == 0
    leaves = []
    for a, z in zip(prev.tree_flatten()[0], zero_first.tree_flatten()[0]):
        mask = first.reshape((-1,) + (1,) * (a.ndim - 1))
        leaves.append(jnp.where(mask, z, a))
    prev = LogQueries(*leaves)
    if extra_last:
        last = q[q.shape[0] - 1]
        leaves = [
            jnp.concatenate([a, b[None]])
            for a, b in zip(prev.tree_flatten()[0], last.tree_flatten()[0])
        ]
        prev = LogQueries(*leaves)
    return prev


def _cleaned(prev: LogQueries) -> LogQueries:
    """The result-queue push payload (ref mod.rs:383-395)."""
    z = jnp.zeros_like(prev.timestamp)
    return LogQueries(
        address=prev.address,
        key=prev.key,
        read_value=jnp.zeros_like(prev.read_value),
        written_value=prev.written_value,
        aux_byte=z,
        rw_flag=jnp.zeros_like(prev.rw_flag),
        rollback=jnp.zeros_like(prev.rollback),
        is_service=prev.is_service,
        shard_id=prev.shard_id,
        tx_number_in_block=prev.tx_number_in_block,
        timestamp=z,
    )


def _row_flags(sorted_q: LogQueries, execute: jnp.ndarray, total: int):
    """Per-row dedup logic flags, flat across instances."""
    row = jnp.arange(total)
    prev_ts = jnp.where(row > 0, sorted_q.timestamp[jnp.maximum(row - 1, 0)], 0)
    trivial = ~execute
    prev_trivial = jnp.where(row > 0, ~execute[jnp.maximum(row - 1, 0)], True)
    prev_rollback = jnp.where(row > 0, sorted_q.rollback[jnp.maximum(row - 1, 0)], False)
    same_log = prev_ts == sorted_q.timestamp
    order_ok = prev_ts <= sorted_q.timestamp
    add = (~prev_trivial) & (~same_log | trivial) & (~prev_rollback)
    return dict(
        prev_ts=prev_ts,
        trivial=trivial,
        prev_trivial=prev_trivial,
        prev_rollback=prev_rollback,
        same_log=same_log,
        order_ok=order_ok,
        add=add,
    )


def generate_witness(
    unsorted: LogQueries,
    sorted_q: LogQueries,
    config: LogSorterConfig,
) -> LogSorterWitness:
    n = unsorted.shape[0]
    assert sorted_q.shape[0] == n
    num_instances = max(1, -(-n // config.limit))
    total = num_instances * config.limit
    unsorted = _pad(unsorted, total)
    sorted_q = _pad(sorted_q, total)
    execute = jnp.arange(total, dtype=jnp.uint32) < jnp.uint32(n)

    enc_u = encode_log_queries(unsorted)
    enc_s = encode_log_queries(sorted_q)
    init4 = gf.zeros((4,))
    chain_u = queues.simulate_chain(init4, enc_u, execute)
    chain_s = queues.simulate_chain(init4, enc_s, execute)

    state_u = QueueState(gf.zeros((4,)), chain_u[total], jnp.uint32(n))
    state_s = QueueState(gf.zeros((4,)), chain_s[total], jnp.uint32(n))
    fs = chal.produce_fs_challenges(state_u, state_s, NUM_CHALLENGES, NUM_REPETITIONS)

    factors_u = chal.masked_factors(chal.grand_product_factors(enc_u, fs), execute)
    factors_s = chal.masked_factors(chal.grand_product_factors(enc_s, fs), execute)
    ones = gf.ones((NUM_REPETITIONS,))
    lhs = chal.product_accumulate(factors_u, ones)
    rhs = chal.product_accumulate(factors_s, ones)

    flags = _row_flags(sorted_q, execute, total)
    # finalization row: previous = last row, add iff it executed and is not
    # rollback (queue drained is implied at the end of the padded layout)
    final_add = execute[total - 1] & (~sorted_q.rollback[total - 1])
    result_add = jnp.concatenate([flags["add"], final_add[None]])
    prev_items = _shift_one(sorted_q, extra_last=True)  # (N+1,)
    result_items = _cleaned(prev_items)
    enc_result = encode_log_queries(result_items)
    result_chain = queues.simulate_chain(init4, enc_result, result_add)
    result_count = jnp.cumsum(result_add.astype(jnp.uint32), dtype=jnp.uint32)

    return LogSorterWitness(
        n=jnp.uint32(n),
        execute=execute,
        unsorted=unsorted,
        sorted=sorted_q,
        enc_unsorted=enc_u,
        enc_sorted=enc_s,
        chain_unsorted=chain_u,
        chain_sorted=chain_s,
        challenges=fs,
        lhs=lhs,
        rhs=rhs,
        result_items=result_items,
        result_add=result_add,
        result_chain=result_chain,
        result_count=result_count,
    )


def eval_constraints(w: LogSorterWitness, config: LogSorterConfig) -> dict:
    total = w.execute.shape[0]
    s = w.sorted

    chain_u_ok = queues.check_chain(w.chain_unsorted, w.enc_unsorted, w.execute)
    chain_s_ok = queues.check_chain(w.chain_sorted, w.enc_sorted, w.execute)

    state_u = QueueState(gf.zeros((4,)), w.chain_unsorted[total], w.n)
    state_s = QueueState(gf.zeros((4,)), w.chain_sorted[total], w.n)
    fs = chal.produce_fs_challenges(state_u, state_s, NUM_CHALLENGES, NUM_REPETITIONS)
    challenges_ok = jnp.all(gf.equal(fs, w.challenges))

    factors_u = chal.masked_factors(chal.grand_product_factors(w.enc_unsorted, fs), w.execute)
    factors_s = chal.masked_factors(chal.grand_product_factors(w.enc_sorted, fs), w.execute)
    ones = gf.ones((NUM_REPETITIONS,))
    prev_lhs = gf.concat([gf.expand_dims(ones, 0), w.lhs[:-1]], axis=0)
    prev_rhs = gf.concat([gf.expand_dims(ones, 0), w.rhs[:-1]], axis=0)
    lhs_ok = jnp.all(gf.equal(w.lhs, gf.mul(prev_lhs, factors_u)), axis=-1)
    rhs_ok = jnp.all(gf.equal(w.rhs, gf.mul(prev_rhs, factors_s)), axis=-1)

    enc_u_ok = jnp.all(gf.equal(encode_log_queries(w.unsorted), w.enc_unsorted), axis=-1)
    enc_s_ok = jnp.all(gf.equal(encode_log_queries(w.sorted), w.enc_sorted), axis=-1)

    # writes only (both queues) where popped
    writes_ok = jnp.where(w.execute, w.unsorted.rw_flag & s.rw_flag, True)

    flags = _row_flags(s, w.execute, total)
    order_ok = jnp.where(w.execute, flags["order_ok"], True)
    # new timestamp (different, nontrivial) => not rollback
    diff_ok = jnp.where(w.execute & ~flags["same_log"], ~s.rollback, True)
    # repeated timestamp (nontrivial) => must be rollback
    same_ok = jnp.where(w.execute & flags["same_log"], s.rollback, True)
    # body equality for the rollback pair
    prev_items = _shift_one(s)
    body_eq = jnp.all(s.key == prev_items.key, axis=-1) & jnp.all(
        s.written_value == prev_items.written_value, axis=-1
    )
    body_ok = jnp.where(
        flags["same_log"] & ~flags["prev_trivial"] & w.execute, body_eq, True
    )

    # result queue: add flags + cleaned payloads + chain
    final_add = w.execute[total - 1] & (~s.rollback[total - 1])
    expected_add = jnp.concatenate([flags["add"], final_add[None]])
    add_ok = expected_add == w.result_add
    expected_items = _cleaned(_shift_one(s, extra_last=True))
    item_leaves_ok = [
        jnp.all(
            (a == b).reshape(a.shape[0], -1), axis=-1
        )
        for a, b in zip(expected_items.tree_flatten()[0], w.result_items.tree_flatten()[0])
    ]
    items_ok = jnp.stack(item_leaves_ok, axis=0).all(axis=0)
    enc_result = encode_log_queries(w.result_items)
    result_chain_ok = queues.check_chain(w.result_chain, enc_result, w.result_add)
    prev_count = jnp.concatenate([jnp.zeros((1,), jnp.uint32), w.result_count[:-1]])
    count_ok = w.result_count == prev_count + w.result_add.astype(jnp.uint32)

    final_eq = jnp.all(gf.equal(w.lhs[total - 1], w.rhs[total - 1]))

    return {
        "chain_unsorted": chain_u_ok,
        "chain_sorted": chain_s_ok,
        "challenges": challenges_ok,
        "lhs_transitions": lhs_ok,
        "rhs_transitions": rhs_ok,
        "encoding_unsorted": enc_u_ok,
        "encoding_sorted": enc_s_ok,
        "writes_only": writes_ok,
        "sort_order": order_ok,
        "new_log_not_rollback": diff_ok,
        "repeated_log_is_rollback": same_ok,
        "rollback_body_equal": body_ok,
        "result_add_flags": add_ok,
        "result_items": items_ok,
        "result_chain": result_chain_ok,
        "result_count": count_ok,
        "grand_product_final": final_eq,
    }


def all_ok(residuals: dict) -> bool:
    return all(bool(np.asarray(v).all()) for v in residuals.values())


generate_witness_jit = jax.jit(generate_witness, static_argnums=(2,))
eval_constraints_jit = jax.jit(eval_constraints, static_argnums=(1,))


# ---------------------------------------------------------------------------
# production-scale host pipeline (numpy tapes + native C++ narrow chains)
# ---------------------------------------------------------------------------


@jax.jit
def _finish_stage_host(
    unsorted: LogQueries,
    sorted_q: LogQueries,
    execute: jnp.ndarray,
    enc_u: GF,
    enc_s: GF,
    chain_u: GF,
    chain_s: GF,
    result_items: LogQueries,
    result_add: jnp.ndarray,
    result_chain: GF,
    n: jnp.ndarray,
):
    total = execute.shape[0]
    state_u = QueueState(gf.zeros((4,)), chain_u[total], n)
    state_s = QueueState(gf.zeros((4,)), chain_s[total], n)
    fs = chal.produce_fs_challenges(state_u, state_s, NUM_CHALLENGES, NUM_REPETITIONS)
    factors_u = chal.masked_factors(chal.grand_product_factors(enc_u, fs), execute)
    factors_s = chal.masked_factors(chal.grand_product_factors(enc_s, fs), execute)
    ones = gf.ones((NUM_REPETITIONS,))
    lhs = chal.product_accumulate(factors_u, ones)
    rhs = chal.product_accumulate(factors_s, ones)
    result_count = jnp.cumsum(result_add.astype(jnp.uint32), dtype=jnp.uint32)
    return LogSorterWitness(
        n=n, execute=execute, unsorted=unsorted, sorted=sorted_q,
        enc_unsorted=enc_u, enc_sorted=enc_s, chain_unsorted=chain_u,
        chain_sorted=chain_s, challenges=fs, lhs=lhs, rhs=rhs,
        result_items=result_items, result_add=result_add,
        result_chain=result_chain, result_count=result_count,
    )


def generate_witness_host_tapes(
    tapes_unsorted: dict, tapes_sorted: dict, config: LogSorterConfig
) -> LogSorterWitness:
    """Full host pipeline: numpy LogQuery tapes in, native C++ sponge chains,
    one upload, device scans.  Mirrors ram_permutation's host path for the
    narrow-queue circuit family."""
    from ..base_structures.log_query import encode_log_queries_np
    from ..runtime import native

    n = int(tapes_unsorted["timestamp"].shape[0])
    num_instances = max(1, -(-n // config.limit))
    total = num_instances * config.limit

    def pad(t, count=None):
        count = total if count is None else count
        out = {}
        for k, v in t.items():
            if v.shape[0] < count:
                padshape = (count - v.shape[0],) + v.shape[1:]
                out[k] = np.concatenate([v, np.zeros(padshape, v.dtype)])
            else:
                out[k] = v
        return out

    tu, ts_ = pad(tapes_unsorted), pad(tapes_sorted)
    execute_np = np.arange(total) < n
    enc_u_np = encode_log_queries_np(**tu)
    enc_s_np = encode_log_queries_np(**ts_)

    # dedup flags + result payloads (numpy mirror of _row_flags/_cleaned)
    ts_col = ts_["timestamp"].astype(np.uint64)
    prev_ts = np.concatenate([[0], ts_col[:-1]])
    prev_trivial = np.concatenate([[True], ~execute_np[:-1]])
    prev_rollback = np.concatenate([[False], ts_["rollback"][:-1].astype(bool)])
    same_log = prev_ts == ts_col  # row 0 compares against 0 (as on device)
    trivial = ~execute_np
    add = (~prev_trivial) & (~same_log | trivial) & (~prev_rollback)
    final_add = bool(execute_np[total - 1]) and not bool(ts_["rollback"][total - 1])
    result_add_np = np.concatenate([add, [final_add]])

    def shift_extra(v):
        prev = np.concatenate([np.zeros((1,) + v.shape[1:], v.dtype), v[:-1]])
        return np.concatenate([prev, v[total - 1 : total]])

    result_tape = dict(
        address=shift_extra(ts_["address"]),
        key=shift_extra(ts_["key"]),
        read_value=np.zeros((total + 1, 8), ts_["read_value"].dtype),
        written_value=shift_extra(ts_["written_value"]),
        aux_byte=np.zeros(total + 1, ts_["aux_byte"].dtype),
        rw_flag=np.zeros(total + 1, bool),
        rollback=np.zeros(total + 1, bool),
        is_service=shift_extra(ts_["is_service"].astype(bool)),
        shard_id=shift_extra(ts_["shard_id"]),
        tx_number_in_block=shift_extra(ts_["tx_number_in_block"]),
        timestamp=np.zeros(total + 1, ts_["timestamp"].dtype),
    )
    enc_r_np = encode_log_queries_np(**result_tape)

    # native chains (3 in parallel; result chain padded to same length)
    enc_stack = np.zeros((3, total + 1, 20), np.uint64)
    enc_stack[0, :total] = enc_u_np
    enc_stack[1, :total] = enc_s_np
    enc_stack[2] = enc_r_np
    ex_stack = np.zeros((3, total + 1), np.uint8)
    ex_stack[0, :total] = execute_np
    ex_stack[1, :total] = execute_np
    ex_stack[2] = result_add_np
    chains = native.narrow_chains(enc_stack, ex_stack, np.zeros((3, 4), np.uint64))

    def mq(t, count):
        return LogQueries(
            jnp.asarray(t["address"].astype(np.uint32)),
            jnp.asarray(t["key"].astype(np.uint32)),
            jnp.asarray(t["read_value"].astype(np.uint32)),
            jnp.asarray(t["written_value"].astype(np.uint32)),
            jnp.asarray(t["aux_byte"].astype(np.uint32)),
            jnp.asarray(t["rw_flag"].astype(bool)),
            jnp.asarray(t["rollback"].astype(bool)),
            jnp.asarray(t["is_service"].astype(bool)),
            jnp.asarray(t["shard_id"].astype(np.uint32)),
            jnp.asarray(t["tx_number_in_block"].astype(np.uint32)),
            jnp.asarray(t["timestamp"].astype(np.uint32)),
        )

    return _finish_stage_host(
        mq(tu, total),
        mq(ts_, total),
        jnp.asarray(execute_np),
        gf.from_u64(enc_u_np),
        gf.from_u64(enc_s_np),
        gf.from_u64(chains[0][: total + 1]),
        gf.from_u64(chains[1][: total + 1]),
        mq(result_tape, total + 1),
        jnp.asarray(result_add_np),
        gf.from_u64(chains[2]),
        jnp.uint32(n),
    )


# ---------------------------------------------------------------------------
# ClosedFormInput per instance
# ---------------------------------------------------------------------------


def _encode_queue_state(qs: QueueState) -> GF:
    return gf.concat(
        [qs.head, qs.tail, gf.expand_dims(gf.from_u32(qs.length), -1)], axis=-1
    )


def _encode_log_query_flat(q: LogQueries) -> GF:
    """36-element CSVarLengthEncodable field-order encoding of a LogQuery."""
    b = protocol.bool_to_gf
    u = gf.from_u32
    return gf.concat(
        [
            u(q.address),
            u(q.key),
            u(q.read_value),
            u(q.written_value),
            gf.expand_dims(u(q.aux_byte), -1),
            gf.expand_dims(b(q.rw_flag), -1),
            gf.expand_dims(b(q.rollback), -1),
            gf.expand_dims(b(q.is_service), -1),
            gf.expand_dims(u(q.shard_id), -1),
            gf.expand_dims(u(q.tx_number_in_block), -1),
            gf.expand_dims(u(q.timestamp), -1),
        ],
        axis=-1,
    )


def instance_compact_forms(
    w: LogSorterWitness, config: LogSorterConfig
) -> protocol.ClosedFormInputCompactForm:
    """Per-instance compact forms.  FSM mirrors EventsDeduplicatorFSMInputOutput
    (ref input.rs:28-36): [lhs(2), rhs(2), unsorted_qs(9), intermediate_qs(9),
    final_result_qs(9), previous_key(1), previous_item(36)] = 68 elements."""
    total = w.execute.shape[0]
    limit = config.limit
    k = total // limit
    bounds = jnp.arange(k + 1, dtype=jnp.int32) * limit
    ones = gf.ones((NUM_REPETITIONS,))

    def fsm_at(b):
        prev_row = jnp.maximum(b - 1, 0)
        at_start = b == 0
        lhs = gf.select(at_start, ones, GF(w.lhs.lo[prev_row], w.lhs.hi[prev_row]))
        rhs = gf.select(at_start, ones, GF(w.rhs.lo[prev_row], w.rhs.hi[prev_row]))
        remaining = w.n - jnp.minimum(b.astype(jnp.uint32), w.n)
        qs_u = QueueState(w.chain_unsorted[b], w.chain_unsorted[total], remaining)
        qs_s = QueueState(w.chain_sorted[b], w.chain_sorted[total], remaining)
        # result queue state: finalization push included only at the very end
        res_idx = jnp.where(b == total, total + 1, b)
        res_len = jnp.where(
            b == 0, 0, w.result_count[jnp.where(b == total, total, prev_row)]
        ).astype(jnp.uint32)
        qs_res = QueueState(gf.zeros((4,)), w.result_chain[res_idx], res_len)
        prev_key = jnp.where(at_start, 0, w.sorted.timestamp[prev_row]).astype(jnp.uint32)
        prev_item = w.sorted[prev_row]
        leaves = []
        for a, z in zip(
            prev_item.tree_flatten()[0], LogQueries.zeros(()).tree_flatten()[0]
        ):
            leaves.append(jnp.where(at_start, z, a))
        prev_item = LogQueries(*leaves)
        return gf.concat(
            [
                lhs,
                rhs,
                _encode_queue_state(qs_u),
                _encode_queue_state(qs_s),
                _encode_queue_state(qs_res),
                gf.expand_dims(gf.from_u32(prev_key), -1),
                _encode_log_query_flat(prev_item),
            ],
            axis=-1,
        )

    fsm_states = jax.vmap(fsm_at)(bounds)
    fsm_in = fsm_states[:-1]
    fsm_out = fsm_states[1:]

    qs_u0 = QueueState(gf.zeros((4,)), w.chain_unsorted[total], w.n)
    qs_s0 = QueueState(gf.zeros((4,)), w.chain_sorted[total], w.n)
    obs_in_single = gf.concat(
        [_encode_queue_state(qs_u0), _encode_queue_state(qs_s0)], axis=-1
    )
    obs_in = GF(
        jnp.broadcast_to(obs_in_single.lo, (k,) + obs_in_single.lo.shape),
        jnp.broadcast_to(obs_in_single.hi, (k,) + obs_in_single.hi.shape),
    )

    # observable output: final result queue state (zeros unless completed; the
    # compact-form masking also zeroes it for non-final instances)
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
    return protocol.compact_form_from_parts(
        start_flags, completion_flags, obs_in, obs_out, fsm_in, fsm_out
    )
