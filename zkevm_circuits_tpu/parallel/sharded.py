"""Sharded (multi-chip) constraint evaluation for permutation-argument circuits.

TPU-native distribution of the ram_permutation check (SURVEY.md §2.4, §5.8):

  * trace rows are sharded across the mesh axis "rows";
  * cross-row references (previous sorted element, next sponge state) become
    single-row halo exchanges via `jax.lax.ppermute` over ICI;
  * grand products / counters: per-shard inclusive scan locally, then an
    `all_gather` of shard totals and an exclusive per-shard prefix — the
    associative-scan decomposition of `accumulate_grand_products`
    (reference src/utils.rs:81-137).

Everything runs inside one `shard_map`, so XLA sees static per-shard shapes
and fuses the batched Poseidon2 with the elementwise checks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..base_structures.memory_query import MemoryQueries, encode_memory_queries
from ..models import ram_permutation as ram
from ..ops import gf, poseidon2, queues
from ..ops.gf import GF


def _gf_ppermute(x: GF, axis_name: str, perm) -> GF:
    return GF(
        jax.lax.ppermute(x.lo, axis_name, perm),
        jax.lax.ppermute(x.hi, axis_name, perm),
    )


def _gf_all_gather(x: GF, axis_name: str) -> GF:
    return GF(
        jax.lax.all_gather(x.lo, axis_name),
        jax.lax.all_gather(x.hi, axis_name),
    )


def _exclusive_prefix_product(shard_totals: GF, my_idx, num_shards: int) -> GF:
    """prod of totals of shards with index < my_idx.  shard_totals: (S, R)."""
    acc = gf.ones(shard_totals.shape[1:])
    for s in range(num_shards - 1):
        take = jnp.asarray(s) < my_idx
        acc = gf.select(take, gf.mul(acc, shard_totals[s]), acc)
    return acc


def sharded_eval_constraints(mesh: Mesh, w: ram.RamPermutationWitness,
                             config: ram.RamPermutationConfig) -> dict:
    """Row-sharded version of models.ram_permutation.eval_constraints.

    The (N+1)-state chains are passed as before-states (N,12) + final tail.
    Returns the same residual dict (entries per-shard-concatenated).
    """
    total = w.execute.shape[0]
    num_shards = mesh.shape["rows"]
    assert total % num_shards == 0, (total, num_shards)

    states_u_in = w.chain_unsorted[:-1]
    states_s_in = w.chain_sorted[:-1]
    tail_u = w.chain_unsorted[total]
    tail_s = w.chain_sorted[total]

    # challenges are recomputed (replicated — tiny)
    state_u0 = queues.QueueState(gf.zeros((12,)), tail_u, w.n)
    state_s0 = queues.QueueState(gf.zeros((12,)), tail_s, w.n)
    fs = ram.chal.produce_fs_challenges(state_u0, state_s0, 9, ram.NUM_REPETITIONS)

    row_spec = P("rows")
    rep = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            row_spec,  # execute
            row_spec,  # sorted queries (pytree prefix)
            row_spec,  # enc_u
            row_spec,  # enc_s
            row_spec,  # states_u_in
            row_spec,  # states_s_in
            row_spec,  # lhs
            row_spec,  # rhs
            row_spec,  # nondet_count
            rep,  # tail_u
            rep,  # tail_s
            rep,  # fs
            rep,  # n
            rep,  # snapshot
        ),
        out_specs=row_spec,
        check_rep=False,
    )
    def kernel(execute, sorted_q, enc_u, enc_s, st_u, st_s, lhs, rhs, nondet,
               tail_u, tail_s, fs, n, snapshot):
        ax = "rows"
        sidx = jax.lax.axis_index(ax)
        L = execute.shape[0]
        row0_global = sidx.astype(jnp.uint32) * jnp.uint32(L)

        # ---- sponge chain checks with halo for the next-state ----
        exp_u = queues.transition(st_u, enc_u, execute)
        exp_s = queues.transition(st_s, enc_s, execute)
        # neighbor's first before-state == our last row's after-state
        fwd = [(i, (i - 1) % num_shards) for i in range(num_shards)]
        nb_first_u = _gf_ppermute(st_u[0], ax, fwd)
        nb_first_s = _gf_ppermute(st_s[0], ax, fwd)
        last = sidx == num_shards - 1
        next_u = gf.concat([st_u[1:], gf.expand_dims(gf.select(last, tail_u, nb_first_u), 0)], axis=0)
        next_s = gf.concat([st_s[1:], gf.expand_dims(gf.select(last, tail_s, nb_first_s), 0)], axis=0)
        chain_u_ok = jnp.all(gf.equal(exp_u, next_u), axis=-1)
        chain_s_ok = jnp.all(gf.equal(exp_s, next_s), axis=-1)

        # ---- grand products: local scan + cross-shard exclusive prefix ----
        factors_u = ram.chal.masked_factors(ram.chal.grand_product_factors(enc_u, fs), execute)
        factors_s = ram.chal.masked_factors(ram.chal.grand_product_factors(enc_s, fs), execute)
        loc_l = jax.lax.associative_scan(gf.mul, factors_u, axis=0)
        loc_r = jax.lax.associative_scan(gf.mul, factors_s, axis=0)
        totals_l = _gf_all_gather(loc_l[-1], ax)  # (S, R)
        totals_r = _gf_all_gather(loc_r[-1], ax)
        pre_l = _exclusive_prefix_product(totals_l, sidx, num_shards)
        pre_r = _exclusive_prefix_product(totals_r, sidx, num_shards)
        lhs_expected = gf.mul(loc_l, pre_l)
        rhs_expected = gf.mul(loc_r, pre_r)
        lhs_ok = jnp.all(gf.equal(lhs_expected, lhs), axis=-1)
        rhs_ok = jnp.all(gf.equal(rhs_expected, rhs), axis=-1)

        # ---- ordering / RW checks with halo for previous sorted row ----
        bwd = [(i, (i + 1) % num_shards) for i in range(num_shards)]
        last_row = sorted_q[L - 1]
        prev_from_nb = MemoryQueries(
            jax.lax.ppermute(last_row.timestamp, ax, bwd),
            jax.lax.ppermute(last_row.memory_page, ax, bwd),
            jax.lax.ppermute(last_row.index, ax, bwd),
            jax.lax.ppermute(last_row.rw_flag, ax, bwd),
            jax.lax.ppermute(last_row.is_ptr, ax, bwd),
            jax.lax.ppermute(last_row.value, ax, bwd),
        )
        idx_prev = jnp.maximum(jnp.arange(L) - 1, 0)
        prev_local = sorted_q[idx_prev]
        first_mask = jnp.arange(L) == 0

        def splice(local_col, nb_col):
            return jnp.where(
                first_mask.reshape((-1,) + (1,) * (local_col.ndim - 1)),
                nb_col[None] if nb_col.ndim < local_col.ndim else nb_col,
                local_col,
            )

        prev = MemoryQueries(
            jnp.where(first_mask, prev_from_nb.timestamp, prev_local.timestamp),
            jnp.where(first_mask, prev_from_nb.memory_page, prev_local.memory_page),
            jnp.where(first_mask, prev_from_nb.index, prev_local.index),
            jnp.where(first_mask, prev_from_nb.rw_flag, prev_local.rw_flag),
            jnp.where(first_mask, prev_from_nb.is_ptr, prev_local.is_ptr),
            splice(prev_local.value, prev_from_nb.value),
        )
        global_idx = row0_global + jnp.arange(L, dtype=jnp.uint32)
        not_first_global = global_idx > 0
        order_rows = ram._sorting_key_gt_prev(sorted_q, prev)
        order_ok = jnp.where(execute & not_first_global, order_rows, True)

        same_cell = (
            (sorted_q.memory_page == prev.memory_page)
            & (sorted_q.index == prev.index)
            & not_first_global
        )
        is_read = ~sorted_q.rw_flag
        value_zero = jnp.all(sorted_q.value == 0, axis=-1) & (~sorted_q.is_ptr)
        value_eq_prev = jnp.all(sorted_q.value == prev.value, axis=-1) & (
            sorted_q.is_ptr == prev.is_ptr
        )
        uninit_ok = jnp.where(execute & is_read & (~same_cell), value_zero, True)
        rw_ok = jnp.where(execute & is_read & same_cell, value_eq_prev, True)

        # ---- nondet counter: local cumsum + exclusive prefix sum ----
        is_nondet = (
            execute
            & (sorted_q.timestamp == 0)
            & (sorted_q.memory_page == jnp.uint32(config.bootloader_heap_page))
            & sorted_q.rw_flag
            & (~sorted_q.is_ptr)
        )
        loc_cnt = jnp.cumsum(is_nondet.astype(jnp.uint32), dtype=jnp.uint32)
        totals_cnt = jax.lax.all_gather(loc_cnt[-1], ax)  # (S,)
        prefix_cnt = jnp.sum(
            jnp.where(jnp.arange(num_shards) < sidx, totals_cnt, 0), dtype=jnp.uint32
        )
        cnt_expected = loc_cnt + prefix_cnt
        cnt_ok = cnt_expected == nondet

        # ---- final checks live on the last shard's last row ----
        is_final_row = last & (jnp.arange(L) == L - 1)
        final_eq = jnp.all(gf.equal(lhs_expected[L - 1], rhs_expected[L - 1]))
        nondet_final = cnt_expected[L - 1] == snapshot
        final_ok = jnp.where(is_final_row, final_eq & nondet_final, True)

        return {
            "chain_unsorted": chain_u_ok,
            "chain_sorted": chain_s_ok,
            "lhs_transitions": lhs_ok,
            "rhs_transitions": rhs_ok,
            "sort_order": order_ok,
            "uninit_read_zero": uninit_ok,
            "read_consistency": rw_ok,
            "nondet_count": cnt_ok,
            "final_checks": final_ok,
        }

    return kernel(
        w.execute,
        w.sorted,
        w.enc_unsorted,
        w.enc_sorted,
        states_u_in,
        states_s_in,
        w.lhs,
        w.rhs,
        w.nondet_count,
        tail_u,
        tail_s,
        fs,
        w.n,
        w.snapshot_length,
    )
