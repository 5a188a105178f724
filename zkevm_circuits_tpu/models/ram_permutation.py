"""ram_permutation — circuit type 8: memory-consistency argument.

Reference parity: `src/ram_permutation/` of matter-labs/era-zkevm_circuits
(`ram_permutation_entry_point` mod.rs:31-210, `partial_accumulate_inner`
mod.rs:212-382, input types input.rs).  Semantics replicated:

  * two full-state queues (unsorted from the VM, prover-sorted), popped in
    lockstep; lengths must match (mod.rs:237-241).
  * multiset equality via DEFAULT_NUM_PERMUTATION_ARGUMENT_REPETITIONS = 2
    grand products over the 8-element memory-query encodings with FS
    challenges derived from both initial queue tails (mod.rs:111-116).
  * sort order: strict ascending by (memory_page, index, timestamp) — the
    LSW-first limb key [timestamp, index, memory_page] compared by long
    subtraction (`unpacked_long_comparison`, storage_validity mod.rs:925-944;
    call site mod.rs:296-316).
  * RW semantics (mod.rs:318-357): first touch of a cell by a read must see
    zero (and non-pointer); a read of the same cell must see the previous
    value and is_ptr.
  * nondeterministic bootloader-heap writes (timestamp==0, page ==
    BOOTLOADER_HEAP_PAGE, write, non-pointer) are counted and must equal the
    observable input's snapshot length at completion (mod.rs:259-290,
    166-175).
  * terminal circuit: observable output is () (input.rs:86-91).

TPU design (trace-first): witness generation materializes per-row queue
sponge states, grand-product accumulator columns (log-depth associative
scan), and the nondet-write counter (cumsum).  Constraint evaluation is then
100% row-parallel: every transition (sponge, product, counter, ordering, RW)
is checked independently per row in one batched pass — the sequential chain
exists only in witness generation.  Multi-instance continuation falls out of
the flat row layout: instance k covers rows [k*limit, (k+1)*limit) and its
ClosedFormInput FSM snapshots are just gathers at the boundaries.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..base_structures.memory_query import (
    MEMORY_QUERY_PACKED_WIDTH,
    MemoryQueries,
    encode_memory_queries,
)
from ..isa.system_params import BOOTLOADER_HEAP_PAGE
from ..ops import gf, queues
from ..ops.gf import GF
from ..ops.queues import QueueState
from ..utils import challenges as chal
from ..utils import protocol

NUM_REPETITIONS = chal.DEFAULT_NUM_REPETITIONS
RAM_SORTING_KEY_LENGTH = 3  # ref input.rs:46
RAM_FULL_KEY_LENGTH = 2  # ref input.rs:47


@dataclasses.dataclass(frozen=True)
class RamPermutationConfig:
    limit: int  # pops per instance (the checkpoint interval)
    bootloader_heap_page: int = BOOTLOADER_HEAP_PAGE
    # when set, queue-chain witnesses carry only every chain_stride-th state
    # (segment boundaries); the constraint pass re-derives segments on device
    # in parallel (ops/queues.check_chain_segmented).  Cuts the host->device
    # witness traffic for the chains by ~chain_stride x.
    chain_stride: Optional[int] = None
    # unroll the Poseidon2 rounds in the segmented re-derivation (faster on
    # real TPU hardware; keep False for CPU test runs — XLA CPU compile time)
    unroll_poseidon: bool = False


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RamPermutationWitness:
    """Materialized trace of a full run (all instances, flat rows)."""

    n: jnp.ndarray  # () u32 true queue length
    execute: jnp.ndarray  # (N,) bool
    unsorted: MemoryQueries  # (N,)
    sorted: MemoryQueries  # (N,)
    enc_unsorted: GF  # (N, 8)
    enc_sorted: GF  # (N, 8)
    chain_unsorted: GF  # (N+1, 12) head-chain sponge states
    chain_sorted: GF  # (N+1, 12)
    challenges: GF  # (2, 9)
    lhs: GF  # (N, 2) running products AFTER row i
    rhs: GF  # (N, 2)
    nondet_count: jnp.ndarray  # (N,) u32 counter AFTER row i
    snapshot_length: jnp.ndarray  # () u32 observable input

    def tree_flatten(self):
        return (
            self.n,
            self.execute,
            self.unsorted,
            self.sorted,
            self.enc_unsorted,
            self.enc_sorted,
            self.chain_unsorted,
            self.chain_sorted,
            self.challenges,
            self.lhs,
            self.rhs,
            self.nondet_count,
            self.snapshot_length,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _pad_queries(q: MemoryQueries, total: int) -> MemoryQueries:
    n = q.shape[0]
    if n == total:
        return q
    pad = MemoryQueries.zeros((total - n,))
    return MemoryQueries(
        jnp.concatenate([q.timestamp, pad.timestamp]),
        jnp.concatenate([q.memory_page, pad.memory_page]),
        jnp.concatenate([q.index, pad.index]),
        jnp.concatenate([q.rw_flag, pad.rw_flag]),
        jnp.concatenate([q.is_ptr, pad.is_ptr]),
        jnp.concatenate([q.value, pad.value]),
    )


@jax.jit
def _encode_stage(unsorted: MemoryQueries, sorted_q: MemoryQueries, n: jnp.ndarray):
    total = unsorted.shape[0]
    execute = jnp.arange(total, dtype=jnp.uint32) < n
    return execute, encode_memory_queries(unsorted), encode_memory_queries(sorted_q)


@jax.jit
def _finish_stage(
    unsorted: MemoryQueries,
    sorted_q: MemoryQueries,
    execute: jnp.ndarray,
    chain_u: GF,
    chain_s: GF,
    n: jnp.ndarray,
    snap: jnp.ndarray,
    heap_page: jnp.ndarray,
) -> RamPermutationWitness:
    total = execute.shape[0]
    # encodings re-derived ON DEVICE from the tape columns — the host never
    # uploads them (they are 2x the tape volume; the tunnel is the bottleneck)
    enc_u = encode_memory_queries(unsorted)
    enc_s = encode_memory_queries(sorted_q)
    tail_u = chain_u[chain_u.shape[0] - 1]
    tail_s = chain_s[chain_s.shape[0] - 1]
    state_u = QueueState(gf.zeros((12,)), tail_u, n)
    state_s = QueueState(gf.zeros((12,)), tail_s, n)
    fs = chal.produce_fs_challenges(
        state_u, state_s, MEMORY_QUERY_PACKED_WIDTH + 1, NUM_REPETITIONS
    )

    factors_u = chal.masked_factors(chal.grand_product_factors(enc_u, fs), execute)
    factors_s = chal.masked_factors(chal.grand_product_factors(enc_s, fs), execute)
    ones = gf.ones((NUM_REPETITIONS,))
    lhs = chal.product_accumulate(factors_u, ones)
    rhs = chal.product_accumulate(factors_s, ones)

    is_nondet = (
        execute
        & (sorted_q.timestamp == 0)
        & (sorted_q.memory_page == heap_page)
        & sorted_q.rw_flag
        & (~sorted_q.is_ptr)
    )
    nondet_count = jnp.cumsum(is_nondet.astype(jnp.uint32), dtype=jnp.uint32)

    return RamPermutationWitness(
        n=n,
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
        nondet_count=nondet_count,
        snapshot_length=snap,
    )


def generate_witness(
    unsorted: MemoryQueries,
    sorted_q: MemoryQueries,
    config: RamPermutationConfig,
    snapshot_length: Optional[int] = None,
    backend: str = "device",
) -> RamPermutationWitness:
    """Materialize the full trace from the two query tapes.

    backend="device": sponge chains via lax.scan (jittable end-to-end).
    backend="host":   chains via the native C++ runtime (fast scalar path for
                      the intrinsically-sequential part; everything else runs
                      as two jitted device stages).
    """
    n = unsorted.shape[0]
    assert sorted_q.shape[0] == n, "queues must pop in lockstep (ref mod.rs:237)"
    num_instances = max(1, -(-n // config.limit))
    total = num_instances * config.limit

    unsorted = _pad_queries(unsorted, total)
    sorted_q = _pad_queries(sorted_q, total)
    n_arr = jnp.uint32(n)
    execute, enc_u, enc_s = _encode_stage(unsorted, sorted_q, n_arr)

    if backend == "host":
        from ..runtime import native

        ex_np = np.asarray(execute)
        init_np = np.zeros(12, dtype=np.uint64)
        chain_u = gf.from_u64(native.full_state_chain(enc_u.astype_u64(), ex_np, init_np))
        chain_s = gf.from_u64(native.full_state_chain(enc_s.astype_u64(), ex_np, init_np))
    else:
        init = gf.zeros((12,))
        chain_u = jax.jit(queues.simulate_chain)(init, enc_u, execute)
        chain_s = jax.jit(queues.simulate_chain)(init, enc_s, execute)

    if snapshot_length is None:
        snap_arr = None
    else:
        snap_arr = jnp.uint32(snapshot_length)

    w = _finish_stage(
        unsorted,
        sorted_q,
        execute,
        chain_u,
        chain_s,
        n_arr,
        jnp.uint32(0) if snap_arr is None else snap_arr,
        jnp.uint32(config.bootloader_heap_page),
    )
    if snap_arr is None:
        w = dataclasses.replace(w, snapshot_length=w.nondet_count[-1])
    return w


def generate_witness_host_tapes(
    tapes_unsorted: dict,
    tapes_sorted: dict,
    config: RamPermutationConfig,
    snapshot_length: Optional[int] = None,
) -> RamPermutationWitness:
    """Full host-side witness pipeline: numpy tapes in, one device upload out.

    tapes_*: dict of numpy arrays {timestamp, memory_page, index, rw_flag,
    is_ptr, value(n,8)}.  Encoding + sequential sponge chains run on the host
    (native C++); the associative scans and counters run on device via the
    jitted finish stage.  Minimizes host<->device transfers to a single
    upload of tapes + encodings + chain states.
    """
    from ..base_structures.memory_query import encode_memory_queries_np
    from ..runtime import native

    n = int(tapes_unsorted["timestamp"].shape[0])
    num_instances = max(1, -(-n // config.limit))
    total = num_instances * config.limit

    def pad(t):
        out = {}
        for k, v in t.items():
            if v.shape[0] == total:
                out[k] = v
            else:
                padshape = (total - v.shape[0],) + v.shape[1:]
                out[k] = np.concatenate([v, np.zeros(padshape, dtype=v.dtype)])
        return out

    tu, ts_ = pad(tapes_unsorted), pad(tapes_sorted)
    execute_np = np.arange(total, dtype=np.uint32) < np.uint32(n)

    # start the tape uploads FIRST — jnp.asarray dispatches async, so the
    # host->device transfer streams while the host computes the sponge chains
    def mq(t):
        return MemoryQueries(
            jnp.asarray(t["timestamp"].astype(np.uint32)),
            jnp.asarray(t["memory_page"].astype(np.uint32)),
            jnp.asarray(t["index"].astype(np.uint32)),
            jnp.asarray(t["rw_flag"].astype(bool)),
            jnp.asarray(t["is_ptr"].astype(bool)),
            jnp.asarray(t["value"].astype(np.uint32)),
        )

    mq_u, mq_s = mq(tu), mq(ts_)
    execute_dev = jnp.asarray(execute_np)

    enc = np.stack(
        [
            encode_memory_queries_np(**tu),
            encode_memory_queries_np(**ts_),
        ]
    )  # (2, total, 8)
    if config.chain_stride:
        chains = native.full_state_chains_strided(
            enc,
            np.stack([execute_np, execute_np]).astype(np.uint8),
            np.zeros((2, 12), np.uint64),
            config.chain_stride,
        )  # (2, total/stride + 1, 12)
    else:
        chains = native.full_state_chains(
            enc, np.stack([execute_np, execute_np]).astype(np.uint8), np.zeros((2, 12), np.uint64)
        )  # (2, total+1, 12)

    w = _finish_stage(
        mq_u,
        mq_s,
        execute_dev,
        gf.from_u64(chains[0]),
        gf.from_u64(chains[1]),
        jnp.uint32(n),
        jnp.uint32(0 if snapshot_length is None else snapshot_length),
        jnp.uint32(config.bootloader_heap_page),
    )
    if snapshot_length is None:
        w = dataclasses.replace(w, snapshot_length=w.nondet_count[-1])
    return w


def _sorting_key_gt_prev(cur: MemoryQueries, prev: MemoryQueries) -> jnp.ndarray:
    """strict (page, index, timestamp) lexicographic cur > prev (row-wise)."""
    pg_gt = cur.memory_page > prev.memory_page
    pg_eq = cur.memory_page == prev.memory_page
    ix_gt = cur.index > prev.index
    ix_eq = cur.index == prev.index
    ts_gt = cur.timestamp > prev.timestamp
    return pg_gt | (pg_eq & ix_gt) | (pg_eq & ix_eq & ts_gt)


def eval_constraints(w: RamPermutationWitness, config: RamPermutationConfig) -> dict:
    """Row-parallel constraint evaluation. Every entry must be all-True."""
    total = w.execute.shape[0]
    s = w.sorted

    # (1) queue sponge chains (one batched Poseidon2 each; segmented when the
    # witness carries boundary states only)
    if config.chain_stride:
        chain_u_ok = queues.check_chain_segmented(
            w.chain_unsorted, w.enc_unsorted, w.execute, config.unroll_poseidon
        )
        chain_s_ok = queues.check_chain_segmented(
            w.chain_sorted, w.enc_sorted, w.execute, config.unroll_poseidon
        )
    else:
        chain_u_ok = queues.check_chain(w.chain_unsorted, w.enc_unsorted, w.execute)
        chain_s_ok = queues.check_chain(w.chain_sorted, w.enc_sorted, w.execute)

    # (2) grand-product transitions, with challenges recomputed from tails
    tail_u = w.chain_unsorted[w.chain_unsorted.shape[0] - 1]
    tail_s = w.chain_sorted[w.chain_sorted.shape[0] - 1]
    state_u = QueueState(gf.zeros((12,)), tail_u, w.n)
    state_s = QueueState(gf.zeros((12,)), tail_s, w.n)
    fs = chal.produce_fs_challenges(
        state_u, state_s, MEMORY_QUERY_PACKED_WIDTH + 1, NUM_REPETITIONS
    )
    challenges_ok = jnp.all(gf.equal(fs, w.challenges))
    factors_u = chal.masked_factors(chal.grand_product_factors(w.enc_unsorted, fs), w.execute)
    factors_s = chal.masked_factors(chal.grand_product_factors(w.enc_sorted, fs), w.execute)
    ones = gf.ones((NUM_REPETITIONS,))
    prev_lhs = gf.concat([gf.expand_dims(ones, 0), w.lhs[:-1]], axis=0)
    prev_rhs = gf.concat([gf.expand_dims(ones, 0), w.rhs[:-1]], axis=0)
    lhs_ok = jnp.all(gf.equal(w.lhs, gf.mul(prev_lhs, factors_u)), axis=-1)
    rhs_ok = jnp.all(gf.equal(w.rhs, gf.mul(prev_rhs, factors_s)), axis=-1)

    # (3) encodings match the query fields (packing recomputed)
    enc_u_ok = jnp.all(gf.equal(encode_memory_queries(w.unsorted), w.enc_unsorted), axis=-1)
    enc_s_ok = jnp.all(gf.equal(encode_memory_queries(w.sorted), w.enc_sorted), axis=-1)

    # (4) strict sort order on rows 1.. where executed (ref mod.rs:304-316;
    #     row 0 of the whole run is exempt: is_start)
    prev = s[jnp.maximum(jnp.arange(total) - 1, 0)]
    order_ok_rows = _sorting_key_gt_prev(s, prev)
    row_idx = jnp.arange(total)
    enforce_order = w.execute & (row_idx > 0)
    order_ok = jnp.where(enforce_order, order_ok_rows, True)

    # (5) RW semantics (ref mod.rs:318-357)
    same_cell = (s.memory_page == prev.memory_page) & (s.index == prev.index)
    same_cell = same_cell & (row_idx > 0)  # row 0 of the run starts fresh
    is_read = ~s.rw_flag
    value_zero = jnp.all(s.value == 0, axis=-1) & (~s.is_ptr)
    value_eq_prev = jnp.all(s.value == prev.value, axis=-1) & (s.is_ptr == prev.is_ptr)
    uninit_read_ok = jnp.where(w.execute & is_read & (~same_cell), value_zero, True)
    rw_read_ok = jnp.where(w.execute & is_read & same_cell, value_eq_prev, True)

    # (6) nondet counter transitions + final equality with snapshot
    is_nondet = (
        w.execute
        & (s.timestamp == 0)
        & (s.memory_page == jnp.uint32(config.bootloader_heap_page))
        & s.rw_flag
        & (~s.is_ptr)
    )
    prev_count = jnp.concatenate([jnp.zeros((1,), jnp.uint32), w.nondet_count[:-1]])
    count_ok = w.nondet_count == prev_count + is_nondet.astype(jnp.uint32)

    # (7) completion checks: queues drained => lhs == rhs, counter == snapshot
    completed = jnp.uint32(total) >= w.n  # always true on the padded layout
    final_eq = jnp.all(gf.equal(w.lhs[total - 1], w.rhs[total - 1]))
    nondet_final_ok = w.nondet_count[total - 1] == w.snapshot_length

    return {
        "chain_unsorted": chain_u_ok,
        "chain_sorted": chain_s_ok,
        "challenges": challenges_ok,
        "lhs_transitions": lhs_ok,
        "rhs_transitions": rhs_ok,
        "encoding_unsorted": enc_u_ok,
        "encoding_sorted": enc_s_ok,
        "sort_order": order_ok,
        "uninit_read_zero": uninit_read_ok,
        "read_consistency": rw_read_ok,
        "grand_product_final": ~completed | final_eq,
        "nondet_writes_final": ~completed | nondet_final_ok,
    }


def all_ok(residuals: dict) -> bool:
    return all(bool(np.asarray(v).all()) for v in residuals.values())


eval_constraints_jit = jax.jit(eval_constraints, static_argnums=(1,))


# ---------------------------------------------------------------------------
# ClosedFormInput per instance
# ---------------------------------------------------------------------------


def _encode_queue_state(qs: QueueState) -> GF:
    """[head lanes, tail lanes, length] — pinned QueueState encoding."""
    return gf.concat(
        [qs.head, qs.tail, gf.expand_dims(gf.from_u32(qs.length), -1)], axis=-1
    )


def _gather_gf(x: GF, idx: jnp.ndarray) -> GF:
    return GF(x.lo[idx], x.hi[idx])


def instance_compact_forms(
    w: RamPermutationWitness, config: RamPermutationConfig
) -> protocol.ClosedFormInputCompactForm:
    """Per-instance ClosedFormInput compact forms (batched over instances).

    FSM payload mirrors RamPermutationFSMInputOutput (ref input.rs:52-62):
    [lhs(2), rhs(2), unsorted_queue_state(25), sorted_queue_state(25),
     previous_sorting_key(3), previous_full_key(2), previous_value(8),
     previous_is_ptr(1), num_nondeterministic_writes(1)] = 69 elements.
    """
    total = w.execute.shape[0]
    limit = config.limit
    k = total // limit
    bounds = jnp.arange(k + 1, dtype=jnp.int32) * limit  # (k+1,)
    stride = config.chain_stride or 1
    assert limit % stride == 0 or k == 1, (
        "chain_stride must divide the instance limit for FSM snapshots"
    )
    last_chain = w.chain_unsorted.shape[0] - 1

    ones = gf.ones((NUM_REPETITIONS,))

    def fsm_at(b):
        """FSM snapshot after b rows processed (b on instance boundaries)."""
        prev_row = jnp.maximum(b - 1, 0)
        at_start = b == 0
        lhs = gf.select(at_start, ones, _gather_gf(w.lhs, prev_row))
        rhs = gf.select(at_start, ones, _gather_gf(w.rhs, prev_row))
        remaining = w.n - jnp.minimum(b.astype(jnp.uint32), w.n)
        cb = b // stride
        qs_u = QueueState(w.chain_unsorted[cb], w.chain_unsorted[last_chain], remaining)
        qs_s = QueueState(w.chain_sorted[cb], w.chain_sorted[last_chain], remaining)
        srow = w.sorted[prev_row]
        zero32 = jnp.uint32(0)
        sel = lambda v: jnp.where(at_start, jnp.zeros_like(v), v)
        sorting_key = gf.from_u32(
            jnp.stack([sel(srow.timestamp), sel(srow.index), sel(srow.memory_page)])
        )
        full_key = gf.from_u32(jnp.stack([sel(srow.index), sel(srow.memory_page)]))
        prev_value = gf.from_u32(sel(srow.value))
        prev_is_ptr = protocol.bool_to_gf(jnp.where(at_start, False, srow.is_ptr))
        nondet = jnp.where(at_start, zero32, w.nondet_count[prev_row])
        return gf.concat(
            [
                lhs,
                rhs,
                _encode_queue_state(qs_u),
                _encode_queue_state(qs_s),
                sorting_key,
                full_key,
                prev_value,
                gf.expand_dims(prev_is_ptr, -1),
                gf.expand_dims(gf.from_u32(nondet), -1),
            ],
            axis=-1,
        )

    fsm_states = jax.vmap(fsm_at)(bounds)  # (k+1, 69)
    fsm_in = fsm_states[:-1]
    fsm_out = fsm_states[1:]

    # observable input: both initial queue states + snapshot length (input.rs:27-31)
    qs_u0 = QueueState(gf.zeros((12,)), w.chain_unsorted[last_chain], w.n)
    qs_s0 = QueueState(gf.zeros((12,)), w.chain_sorted[last_chain], w.n)
    obs_in_single = gf.concat(
        [
            _encode_queue_state(qs_u0),
            _encode_queue_state(qs_s0),
            gf.expand_dims(gf.from_u32(w.snapshot_length), -1),
        ],
        axis=-1,
    )
    obs_in = GF(
        jnp.broadcast_to(obs_in_single.lo, (k,) + obs_in_single.lo.shape),
        jnp.broadcast_to(obs_in_single.hi, (k,) + obs_in_single.hi.shape),
    )
    obs_out = gf.zeros((k, 0))  # observable output is () — empty encoding

    start_flags = jnp.arange(k) == 0
    completion_flags = (jnp.arange(k, dtype=jnp.uint32) + 1) * jnp.uint32(limit) >= w.n

    return protocol.compact_form_from_parts(
        start_flags, completion_flags, obs_in, obs_out, fsm_in, fsm_out
    )
