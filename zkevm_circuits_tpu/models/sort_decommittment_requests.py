"""sort_decommittment_requests — circuit type 2: decommit-request dedup.

Reference parity: `src/sort_decommittment_requests/` (entry mod.rs:40-233,
inner `sort_and_deduplicate_code_decommittments_inner` mod.rs:235-380, I/O
input.rs).  Semantics replicated:

  * two full-state (width-12) decommit queues popped in lockstep, equal
    lengths; 2 grand products over the 8-element encodings.
  * strict ascending by packed key [timestamp, code_hash[0..8]] LSW-first
    (code_hash most significant) — `concatenate_key` mod.rs:382-397.
  * a new code_hash must carry the is_first marker (mod.rs:317-323);
    repeats of a hash must use the same memory page (mod.rs:325-335).
  * result queue receives one record per distinct hash: the previous record
    with is_first=true and timestamp = first-encounter timestamp
    (mod.rs:337-351); finalization push when drained (mod.rs:362-372).

TPU design: flat rows = pops (+1 finalization row); the per-group
first-encounter timestamp is a row-parallel gather via a cummax over group
start indices; everything else mirrors the log_sorter trace shape.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..base_structures.decommit_query import (
    DECOMMIT_QUERY_PACKED_WIDTH,
    DecommitQueries,
    encode_decommit_queries,
)
from ..ops import gf, queues
from ..ops.gf import GF
from ..ops.queues import QueueState
from ..utils import challenges as chal
from ..utils import protocol

NUM_REPETITIONS = chal.DEFAULT_NUM_REPETITIONS
NUM_CHALLENGES = DECOMMIT_QUERY_PACKED_WIDTH + 1
PACKED_KEY_LENGTH = 9  # ref input.rs:21


@dataclasses.dataclass(frozen=True)
class DecommitSorterConfig:
    limit: int


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DecommitSorterWitness:
    n: jnp.ndarray
    execute: jnp.ndarray  # (N,)
    unsorted: DecommitQueries
    sorted: DecommitQueries
    enc_unsorted: GF  # (N, 8)
    enc_sorted: GF  # (N, 8)
    chain_unsorted: GF  # (N+1, 12)
    chain_sorted: GF  # (N+1, 12)
    challenges: GF
    lhs: GF
    rhs: GF
    first_enc_ts: jnp.ndarray  # (N,) first-encounter ts of each row's group
    result_items: DecommitQueries  # (N+1,)
    result_add: jnp.ndarray  # (N+1,)
    result_chain: GF  # (N+2, 12)
    result_count: jnp.ndarray  # (N+1,)

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _pad(q: DecommitQueries, total: int) -> DecommitQueries:
    n = q.shape[0]
    if n == total:
        return q
    pad = DecommitQueries.zeros((total - n,))
    return DecommitQueries(
        *[jnp.concatenate([a, b]) for a, b in zip(q.tree_flatten()[0], pad.tree_flatten()[0])]
    )


def _same_hash_as_prev(s: DecommitQueries, total: int) -> jnp.ndarray:
    row = jnp.arange(total)
    prev = s[jnp.maximum(row - 1, 0)]
    same = jnp.all(s.code_hash == prev.code_hash, axis=-1)
    return jnp.where(row > 0, same, False)


def _key_gt_prev(s: DecommitQueries, total: int) -> jnp.ndarray:
    """strict (code_hash, timestamp) lexicographic cur > prev (hash-major)."""
    row = jnp.arange(total)
    prev = s[jnp.maximum(row - 1, 0)]
    hash_gt = jnp.zeros(total, dtype=bool)
    hash_eq = jnp.ones(total, dtype=bool)
    # compare limbs MSW->LSW
    for k in range(7, -1, -1):
        cur_l, prev_l = s.code_hash[..., k], prev.code_hash[..., k]
        hash_gt = hash_gt | (hash_eq & (cur_l > prev_l))
        hash_eq = hash_eq & (cur_l == prev_l)
    ts_gt = s.timestamp > prev.timestamp
    return hash_gt | (hash_eq & ts_gt)


def generate_witness(
    unsorted: DecommitQueries,
    sorted_q: DecommitQueries,
    config: DecommitSorterConfig,
) -> DecommitSorterWitness:
    n = unsorted.shape[0]
    assert sorted_q.shape[0] == n
    num_instances = max(1, -(-n // config.limit))
    total = num_instances * config.limit
    unsorted = _pad(unsorted, total)
    sorted_q = _pad(sorted_q, total)
    execute = jnp.arange(total, dtype=jnp.uint32) < jnp.uint32(n)

    enc_u = encode_decommit_queries(unsorted)
    enc_s = encode_decommit_queries(sorted_q)
    init = gf.zeros((12,))
    chain_u = queues.simulate_chain(init, enc_u, execute)
    chain_s = queues.simulate_chain(init, enc_s, execute)

    state_u = QueueState(gf.zeros((12,)), chain_u[total], jnp.uint32(n))
    state_s = QueueState(gf.zeros((12,)), chain_s[total], jnp.uint32(n))
    fs = chal.produce_fs_challenges(state_u, state_s, NUM_CHALLENGES, NUM_REPETITIONS)

    factors_u = chal.masked_factors(chal.grand_product_factors(enc_u, fs), execute)
    factors_s = chal.masked_factors(chal.grand_product_factors(enc_s, fs), execute)
    ones = gf.ones((NUM_REPETITIONS,))
    lhs = chal.product_accumulate(factors_u, ones)
    rhs = chal.product_accumulate(factors_s, ones)

    # first-encounter timestamp per hash group: gather ts at the group start
    same = _same_hash_as_prev(sorted_q, total)
    row = jnp.arange(total, dtype=jnp.int32)
    start_idx = jnp.where(~same, row, 0)
    group_start = jax.lax.cummax(start_idx)
    first_enc_ts = sorted_q.timestamp[group_start]

    # result pushes: previous record is emitted when this row starts a new
    # hash group (padding rows are all-zero, i.e. a different hash) and the
    # previous row executed — reference's different_hash & previous_nontrivial
    prev_exec = jnp.concatenate([jnp.array([False]), execute[:-1].astype(bool)])
    add = (~same) & prev_exec
    final_add = execute[total - 1]
    result_add = jnp.concatenate([add, final_add[None]])

    prev = sorted_q[jnp.maximum(row - 1, 0)]
    prev_first_ts = first_enc_ts[jnp.maximum(row - 1, 0)]
    result_items_body = DecommitQueries(
        code_hash=prev.code_hash,
        page=prev.page,
        is_first=jnp.ones(total, dtype=bool),
        timestamp=prev_first_ts,
    )
    last = sorted_q[total - 1]
    result_items = DecommitQueries(
        jnp.concatenate([result_items_body.code_hash, last.code_hash[None]]),
        jnp.concatenate([result_items_body.page, last.page[None]]),
        jnp.concatenate([result_items_body.is_first, jnp.ones((1,), bool)]),
        jnp.concatenate([result_items_body.timestamp, first_enc_ts[total - 1][None]]),
    )
    enc_result = encode_decommit_queries(result_items)
    result_chain = queues.simulate_chain(init, enc_result, result_add)
    result_count = jnp.cumsum(result_add.astype(jnp.uint32), dtype=jnp.uint32)

    return DecommitSorterWitness(
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
        first_enc_ts=first_enc_ts,
        result_items=result_items,
        result_add=result_add,
        result_chain=result_chain,
        result_count=result_count,
    )


def eval_constraints(w: DecommitSorterWitness, config: DecommitSorterConfig) -> dict:
    total = w.execute.shape[0]
    s = w.sorted

    chain_u_ok = queues.check_chain(w.chain_unsorted, w.enc_unsorted, w.execute)
    chain_s_ok = queues.check_chain(w.chain_sorted, w.enc_sorted, w.execute)

    state_u = QueueState(gf.zeros((12,)), w.chain_unsorted[total], w.n)
    state_s = QueueState(gf.zeros((12,)), w.chain_sorted[total], w.n)
    fs = chal.produce_fs_challenges(state_u, state_s, NUM_CHALLENGES, NUM_REPETITIONS)
    challenges_ok = jnp.all(gf.equal(fs, w.challenges))

    factors_u = chal.masked_factors(chal.grand_product_factors(w.enc_unsorted, fs), w.execute)
    factors_s = chal.masked_factors(chal.grand_product_factors(w.enc_sorted, fs), w.execute)
    ones = gf.ones((NUM_REPETITIONS,))
    prev_lhs = gf.concat([gf.expand_dims(ones, 0), w.lhs[:-1]], axis=0)
    prev_rhs = gf.concat([gf.expand_dims(ones, 0), w.rhs[:-1]], axis=0)
    lhs_ok = jnp.all(gf.equal(w.lhs, gf.mul(prev_lhs, factors_u)), axis=-1)
    rhs_ok = jnp.all(gf.equal(w.rhs, gf.mul(prev_rhs, factors_s)), axis=-1)

    enc_u_ok = jnp.all(gf.equal(encode_decommit_queries(w.unsorted), w.enc_unsorted), axis=-1)
    enc_s_ok = jnp.all(gf.equal(encode_decommit_queries(w.sorted), w.enc_sorted), axis=-1)

    # strict ascending by (code_hash, timestamp); row 0 vs zero-key trivially
    # greater (timestamps are nonzero)
    row = jnp.arange(total)
    order_rows = _key_gt_prev(s, total)
    order_ok = jnp.where(w.execute & (row > 0), order_rows, True)

    same = _same_hash_as_prev(s, total)
    prev_exec = jnp.concatenate([jnp.array([False]), w.execute[:-1].astype(bool)])
    # new hash => is_first marker
    first_ok = jnp.where(w.execute & ~same, s.is_first, True)
    # same hash (prev nontrivial) => same page
    prev = s[jnp.maximum(row - 1, 0)]
    page_ok = jnp.where(w.execute & same & prev_exec, s.page == prev.page, True)

    # result queue checks
    start_idx = jnp.where(~same, row.astype(jnp.int32), 0)
    group_start = jax.lax.cummax(start_idx)
    first_ts_expected = s.timestamp[group_start]
    first_ts_ok = first_ts_expected == w.first_enc_ts

    add = (~same) & prev_exec
    final_add = w.execute[total - 1]
    add_ok = jnp.concatenate([add, final_add[None]]) == w.result_add
    enc_result = encode_decommit_queries(w.result_items)
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
        "sort_order": order_ok,
        "is_first_markers": first_ok,
        "same_page_within_group": page_ok,
        "first_encounter_ts": first_ts_ok,
        "result_add_flags": add_ok,
        "result_chain": result_chain_ok,
        "result_count": count_ok,
        "grand_product_final": final_eq,
    }


def all_ok(residuals: dict) -> bool:
    return all(bool(np.asarray(v).all()) for v in residuals.values())


generate_witness_jit = jax.jit(generate_witness, static_argnums=(2,))
eval_constraints_jit = jax.jit(eval_constraints, static_argnums=(1,))


# ---------------------------------------------------------------------------
# ClosedFormInput per instance
# ---------------------------------------------------------------------------


def _encode_queue_state(qs: QueueState) -> GF:
    return gf.concat(
        [qs.head, qs.tail, gf.expand_dims(gf.from_u32(qs.length), -1)], axis=-1
    )


def _encode_decommit_flat(q: DecommitQueries) -> GF:
    """11-element field-order encoding of a DecommitQuery (code_hash(8),
    page, is_first, timestamp)."""
    b = lambda x: gf.from_u32(x.astype(jnp.uint32))
    return gf.concat(
        [
            gf.from_u32(q.code_hash),
            gf.expand_dims(gf.from_u32(q.page), -1),
            gf.expand_dims(b(q.is_first), -1),
            gf.expand_dims(gf.from_u32(q.timestamp), -1),
        ],
        axis=-1,
    )


def instance_compact_forms(
    w: DecommitSorterWitness, config: DecommitSorterConfig
):
    """FSM mirrors CodeDecommittmentsDeduplicatorFSMInputOutput (ref
    input.rs:26-37): [initial_qs(25), sorted_qs(25), final_qs(25), lhs(2),
    rhs(2), previous_packed_key(9), first_encountered_timestamp(1),
    previous_record(11)] = 100 elements."""
    from ..utils import protocol

    total = w.execute.shape[0]
    limit = config.limit
    k = total // limit
    bounds = jnp.arange(k + 1, dtype=jnp.int32) * limit
    ones = gf.ones((chal.DEFAULT_NUM_REPETITIONS,))

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
        qs_res = QueueState(gf.zeros((12,)), w.result_chain[res_idx], res_len)
        srow = w.sorted[prev_row]
        sel = lambda v: jnp.where(at_start, jnp.zeros_like(v), v)
        packed_key = gf.from_u32(
            jnp.concatenate([sel(srow.timestamp)[None], sel(srow.code_hash)])
        )
        first_ts = jnp.where(at_start, 0, w.first_enc_ts[prev_row]).astype(jnp.uint32)
        prev_record = DecommitQueries(
            sel(srow.code_hash), sel(srow.page),
            jnp.where(at_start, False, srow.is_first), sel(srow.timestamp),
        )
        return gf.concat(
            [
                _encode_queue_state(qs_u),
                _encode_queue_state(qs_s),
                _encode_queue_state(qs_res),
                lhs,
                rhs,
                packed_key,
                gf.expand_dims(gf.from_u32(first_ts), -1),
                _encode_decommit_flat(prev_record),
            ],
            axis=-1,
        )

    fsm_states = jax.vmap(fsm_at)(bounds)
    qs_u0 = QueueState(gf.zeros((12,)), w.chain_unsorted[total], w.n)
    qs_s0 = QueueState(gf.zeros((12,)), w.chain_sorted[total], w.n)
    obs_in_single = gf.concat(
        [_encode_queue_state(qs_u0), _encode_queue_state(qs_s0)], axis=-1
    )
    obs_in = GF(
        jnp.broadcast_to(obs_in_single.lo, (k,) + obs_in_single.lo.shape),
        jnp.broadcast_to(obs_in_single.hi, (k,) + obs_in_single.hi.shape),
    )
    qs_final = QueueState(
        gf.zeros((12,)), w.result_chain[total + 1], w.result_count[total]
    )
    out_single = _encode_queue_state(qs_final)
    obs_out = GF(
        jnp.broadcast_to(out_single.lo, (k,) + out_single.lo.shape),
        jnp.broadcast_to(out_single.hi, (k,) + out_single.hi.shape),
    )
    start_flags = jnp.arange(k) == 0
    completion_flags = (jnp.arange(k, dtype=jnp.uint32) + 1) * jnp.uint32(limit) >= w.n
    return protocol.compact_form_from_parts(
        start_flags, completion_flags, obs_in, obs_out, fsm_states[:-1], fsm_states[1:]
    )
