"""sha256_round_function — circuit type 6: the sha256 precompile.

Reference parity: `src/sha256_round_function/` — ABI
`Sha256PrecompileCallParams::from_encoding` (mod.rs:65-83: key limbs
[0]=input_offset (word-aligned), [2]=output_offset, [4]=input_page,
[5]=output_page, [6]=num_rounds), cadence of MEMORY_READ_QUERIES_PER_CYCLE=2
aligned word reads + one sha256 compression per cycle (mod.rs:86), state
reset to IV at each call, digest written once num_rounds are exhausted with
per-word little-endian repacking into the u256 (mod.rs:290-305: limb[7-k] =
le_bytes(digest[4k..4k+4])).  The input is caller-pre-padded: no padding
logic in-circuit.

TPU-first row structure: one row per compression, flat across calls; reads,
state chains and the digest write are checked row-parallel from materialized
columns (host-side witness generation, ragged per-call round counts).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..base_structures.log_query import LogQueries, encode_log_queries
from ..base_structures.memory_query import MemoryQueries, encode_memory_queries
from ..isa.system_params import (
    PRECOMPILE_AUX_BYTE,
    SHA256_PRECOMPILE_FORMAL_ADDRESS,
)
from ..ops import gf, queues, sha256
from ..ops.gf import GF

MEMORY_READ_QUERIES_PER_CYCLE = 2


@dataclasses.dataclass(frozen=True)
class Sha256RoundFunctionConfig:
    max_rounds: int


def abi_from_key(key_limbs) -> dict:
    return dict(
        input_offset=key_limbs[..., 0],
        output_offset=key_limbs[..., 2],
        input_page=key_limbs[..., 4],
        output_page=key_limbs[..., 5],
        num_rounds=key_limbs[..., 6],
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Sha256RoundWitness:
    num_calls: jnp.ndarray
    calls: LogQueries  # (C,)
    call_execute: jnp.ndarray
    call_chain: GF  # (C+1, 4)
    # per-round columns (N = max_rounds)
    round_execute: jnp.ndarray  # (N,)
    round_call: jnp.ndarray  # (N,)
    round_is_first: jnp.ndarray
    round_is_last: jnp.ndarray
    block_words: jnp.ndarray  # (N, 16) u32 BE message words
    state_before: jnp.ndarray  # (N, 8)
    state_after: jnp.ndarray  # (N, 8)
    reads: MemoryQueries  # (2N,)
    read_execute: jnp.ndarray
    writes: MemoryQueries  # (C,)
    mem_chain: GF  # over reads-then-write per call order
    mem_order_encodings: GF
    mem_order_execute: jnp.ndarray

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _digest_value_limbs(state_words) -> list:
    """Final sha256 state -> u256 limbs per the reference's LE repack."""
    limbs = [0] * 8
    for k in range(8):
        w = int(state_words[k])
        be = w.to_bytes(4, "big")
        limbs[7 - k] = int.from_bytes(be, "little")
    return limbs


def generate_witness(
    calls: list, memory: dict, config: Sha256RoundFunctionConfig,
    mem_init_state=None,
) -> Sha256RoundWitness:
    """memory: {(page, word_index): 32 bytes} — input must be pre-padded.
    mem_init_state threads the global memory queue (scheduler mod.rs:284-349)."""
    C = max(len(calls), 1)
    N = config.max_rounds

    rounds = []
    read_rows = []
    write_rows = []
    for ci, call in enumerate(calls):
        key = int(call["key"])
        limbs = [(key >> (32 * k)) & 0xFFFFFFFF for k in range(8)]
        in_off, out_off, in_page, out_page, nr = (
            limbs[0], limbs[2], limbs[4], limbs[5], limbs[6],
        )
        ts = int(call["timestamp"])
        state = list(sha256.H0)
        for r in range(nr):
            words64 = b""
            for j in range(2):
                wi = in_off + 2 * r + j
                word = memory.get((in_page, wi), b"\x00" * 32)
                read_rows.append(
                    dict(timestamp=ts, memory_page=in_page, index=wi,
                         rw_flag=False, is_ptr=False,
                         value=int.from_bytes(word, "big"), call=ci)
                )
                words64 += word
            block = [int.from_bytes(words64[4 * j : 4 * j + 4], "big") for j in range(16)]
            new_state = sha256.compress_ref(state, block)
            rounds.append(
                dict(call=ci, first=r == 0, last=r == nr - 1, block=block,
                     before=list(state), after=list(new_state))
            )
            state = new_state
        value = 0
        for k, l in enumerate(_digest_value_limbs(state)):
            value |= l << (32 * k)
        write_rows.append(
            dict(timestamp=ts + 1, memory_page=out_page, index=out_off,
                 rw_flag=True, is_ptr=False, value=value)
        )
    assert len(rounds) <= N

    blk = np.zeros((N, 16), np.uint32)
    before = np.tile(np.array(sha256.H0, np.uint32), (N, 1))
    after = np.zeros((N, 8), np.uint32)
    rcall = np.zeros(N, np.int32)
    rfirst = np.zeros(N, bool)
    rlast = np.zeros(N, bool)
    rexec = np.zeros(N, bool)
    for i, r in enumerate(rounds):
        blk[i] = r["block"]
        before[i] = r["before"]
        after[i] = r["after"]
        rcall[i] = r["call"]
        rfirst[i] = r["first"]
        rlast[i] = r["last"]
        rexec[i] = True

    def mq(rows, count):
        padded = list(rows) + [
            dict(timestamp=0, memory_page=0, index=0, rw_flag=False, is_ptr=False, value=0)
        ] * (count - len(rows))
        return MemoryQueries.from_lists(padded)

    R = 2 * N
    reads_q = mq(read_rows, R)
    read_exec = np.arange(R) < len(read_rows)
    writes_q = mq(write_rows, C)

    order_rows = []
    for ci in range(len(calls)):
        order_rows.extend([r for r in read_rows if r["call"] == ci])
        order_rows.append(write_rows[ci])
    mem_q = mq(order_rows, R + C)
    mem_exec = np.arange(R + C) < len(order_rows)
    mem_enc = encode_memory_queries(mem_q)
    init12 = gf.zeros((12,)) if mem_init_state is None else gf.from_u64(
        np.asarray(mem_init_state, dtype=np.uint64))
    mem_chain = queues.simulate_chain(init12, mem_enc, jnp.asarray(mem_exec))

    call_pad = list(calls) + [
        dict(address=0, key=0, read_value=0, written_value=0, aux_byte=0,
             rw_flag=False, rollback=False, is_service=False, shard_id=0,
             tx_number_in_block=0, timestamp=0)
    ] * (C - len(calls))
    calls_q = LogQueries.from_lists(call_pad)
    call_exec = np.arange(C) < len(calls)
    call_enc = encode_log_queries(calls_q)
    call_chain = queues.simulate_chain(gf.zeros((4,)), call_enc, jnp.asarray(call_exec))

    return Sha256RoundWitness(
        num_calls=jnp.uint32(len(calls)),
        calls=calls_q,
        call_execute=jnp.asarray(call_exec),
        call_chain=call_chain,
        round_execute=jnp.asarray(rexec),
        round_call=jnp.asarray(rcall),
        round_is_first=jnp.asarray(rfirst),
        round_is_last=jnp.asarray(rlast),
        block_words=jnp.asarray(blk),
        state_before=jnp.asarray(before),
        state_after=jnp.asarray(after),
        reads=reads_q,
        read_execute=jnp.asarray(read_exec),
        writes=writes_q,
        mem_chain=mem_chain,
        mem_order_encodings=mem_enc,
        mem_order_execute=jnp.asarray(mem_exec),
    )


def eval_constraints(w: Sha256RoundWitness, config: Sha256RoundFunctionConfig) -> dict:
    N = config.max_rounds
    res = {}

    call_enc = encode_log_queries(w.calls)
    res["call_chain"] = queues.check_chain(w.call_chain, call_enc, w.call_execute)
    addr_ok = jnp.ones_like(w.call_execute)
    for i in range(5):
        l = (SHA256_PRECOMPILE_FORMAL_ADDRESS >> (32 * i)) & 0xFFFFFFFF
        addr_ok = addr_ok & (w.calls.address[..., i] == jnp.uint32(l))
    res["call_is_sha256_precompile"] = jnp.where(
        w.call_execute,
        addr_ok & (w.calls.aux_byte == jnp.uint32(PRECOMPILE_AUX_BYTE)),
        True,
    )

    # compression transitions
    expected_after = sha256.compress(w.state_before, w.block_words)
    res["compress_transitions"] = jnp.where(
        w.round_execute, (expected_after == w.state_after).all(axis=-1), True
    )
    # IV reset / continuity
    prev_after = jnp.concatenate(
        [jnp.tile(jnp.asarray(np.array(sha256.H0, np.uint32)), (1, 1)), w.state_after[:-1]]
    )
    iv = jnp.asarray(np.array(sha256.H0, np.uint32))
    cont = jnp.where(w.round_is_first[:, None], iv[None, :], prev_after)
    res["state_continuity"] = jnp.where(
        w.round_execute, (w.state_before == cont).all(axis=-1), True
    )

    # block words == read memory words (BE)
    abi = abi_from_key(w.calls.key)
    ridx = jnp.arange(N)
    r0 = 2 * ridx
    r1 = 2 * ridx + 1

    def word_be_words(value):  # (..., 8 limbs) -> (..., 8) BE u32 sha words
        return value[..., ::-1]

    w0 = word_be_words(w.reads.value[r0])
    w1 = word_be_words(w.reads.value[r1])
    expected_block = jnp.concatenate([w0, w1], axis=-1)
    res["block_words"] = jnp.where(
        w.round_execute, (expected_block == w.block_words).all(axis=-1), True
    )

    # read addressing: aligned words at input_offset + 2*round_in_call + j
    roff = _round_offset_within_call(w.round_call, w.round_execute)
    in_page = abi["input_page"][w.round_call]
    in_off = abi["input_offset"][w.round_call]
    read_ok0 = (w.reads.memory_page[r0] == in_page) & (
        w.reads.index[r0] == in_off + 2 * roff
    ) & (~w.reads.rw_flag[r0])
    read_ok1 = (w.reads.memory_page[r1] == in_page) & (
        w.reads.index[r1] == in_off + 2 * roff + 1
    ) & (~w.reads.rw_flag[r1])
    res["read_addressing"] = jnp.where(w.round_execute, read_ok0 & read_ok1, True)

    # digest write: value limbs = LE repack of the final state of the call
    final_states = _gather_final_states(w)

    def bswap(x):
        return (
            ((x & 0xFF) << 24) | ((x & 0xFF00) << 8)
            | ((x >> 8) & 0xFF00) | (x >> 24)
        )
    expected_limbs = bswap(final_states)[..., ::-1]  # limb[7-k] = bswap(H_k)
    res["write_value"] = jnp.where(
        w.call_execute, (w.writes.value == expected_limbs).all(axis=-1), True
    )
    res["write_addressing"] = jnp.where(
        w.call_execute,
        (w.writes.memory_page == abi["output_page"])
        & (w.writes.index == abi["output_offset"])
        & w.writes.rw_flag,
        True,
    )
    # num_rounds per call must match the executed rounds
    rounds_per_call = jnp.zeros(w.call_execute.shape[0], jnp.uint32).at[w.round_call].add(
        w.round_execute.astype(jnp.uint32), mode="drop"
    )
    res["num_rounds"] = jnp.where(
        w.call_execute, rounds_per_call == abi["num_rounds"], True
    )

    res["mem_chain"] = queues.check_chain(
        w.mem_chain, w.mem_order_encodings, w.mem_order_execute
    )
    return res


def _round_offset_within_call(round_call, round_execute):
    n = round_call.shape[0]
    idx = jnp.arange(n)
    first = jnp.concatenate([jnp.array([True]), round_call[1:] != round_call[:-1]])
    start = jax.lax.cummax(jnp.where(first, idx, 0))
    return (idx - start).astype(jnp.uint32)


def _gather_final_states(w: Sha256RoundWitness):
    C = w.call_execute.shape[0]
    out = jnp.zeros((C, 8), jnp.uint32)
    contrib = jnp.where((w.round_is_last & w.round_execute)[:, None], w.state_after, 0)
    return out.at[w.round_call].add(contrib, mode="drop")


def all_ok(residuals: dict) -> bool:
    return all(bool(np.asarray(v).all()) for v in residuals.values())


eval_constraints_jit = jax.jit(eval_constraints, static_argnums=(1,))


def instance_compact_forms(
    w: Sha256RoundWitness, config: Sha256RoundFunctionConfig, limit_rounds: int
):
    """Multi-instance ClosedFormInput over the round axis, continuation
    across calls and mid-call (the Sha256RoundFunctionFSM role, ref
    sha256_round_function/input.rs).  FSM at boundary r: the sha256 state
    BEFORE round r, the in-call progress, the calls-queue state after fully
    consumed calls, and the memory-queue state at the call boundary (the
    pinned order absorbs a call's reads before its rounds, write after)."""
    from ..utils import protocol

    N = config.max_rounds
    assert N % limit_rounds == 0, (N, limit_rounds)
    k = N // limit_rounds
    bounds = jnp.arange(k + 1) * limit_rounds

    C = w.call_execute.shape[0]
    rounds_per_call = (
        jnp.zeros(C + 1, jnp.uint32)
        .at[w.round_call + 1]
        .add(w.round_execute.astype(jnp.uint32))
    )
    reads_per_call = 2 * rounds_per_call
    prefix = jnp.concatenate(
        [jnp.zeros(1, jnp.uint32),
         jnp.cumsum(reads_per_call[1:] + 1, dtype=jnp.uint32)]
    )
    mem_pos_call = prefix[:-1] + reads_per_call[1:]

    idx = jnp.arange(N)
    first = jnp.where(w.round_is_first, idx, 0)
    group_start = jax.lax.cummax(first)
    round_off = (idx - group_start).astype(jnp.uint32)

    def fsm_at(b):
        in_range = b < N
        bi = jnp.minimum(b, N - 1)
        live = in_range & w.round_execute[bi]
        call = jnp.where(live, w.round_call[bi].astype(jnp.uint32), C)
        call_u = jnp.minimum(call, C - 1).astype(jnp.int32)
        off = jnp.where(in_range, round_off[bi], jnp.uint32(0))
        state = jnp.where(live, w.state_before[bi], jnp.zeros(8, jnp.uint32))
        done_calls = jnp.where(live, call, w.num_calls).astype(jnp.int32)
        call_tail = w.call_chain[done_calls]
        mem_pos = jnp.where(
            live, mem_pos_call[call_u],
            w.mem_order_execute.sum().astype(jnp.uint32),
        )
        mem_state = w.mem_chain[jnp.minimum(mem_pos, w.mem_chain.shape[0] - 1)]
        lanes = [gf.from_u32(state[j]) for j in range(8)]
        lanes += [
            gf.from_u32(jnp.asarray(call, jnp.uint32)),
            gf.from_u32(off),
            gf.from_u32(mem_pos.astype(jnp.uint32)),
        ]
        lanes += [call_tail[j] for j in range(4)]
        lanes += [mem_state[j] for j in range(12)]
        return gf.stack(lanes, axis=-1)

    fsm_states = jax.vmap(fsm_at)(bounds)

    calls_qs = protocol.encode_queue_state_generic(
        gf.zeros((4,)), w.call_chain[C], w.num_calls
    )
    n_mem = w.mem_order_execute.sum().astype(jnp.uint32)
    mem_initial = protocol.encode_queue_state_generic(
        gf.zeros((12,)), w.mem_chain[0], jnp.uint32(0)
    )
    mem_final = protocol.encode_queue_state_generic(
        gf.zeros((12,)), w.mem_chain[w.mem_chain.shape[0] - 1], n_mem
    )
    obs_in_single = gf.concat([calls_qs, mem_initial], axis=-1)
    obs_in = GF(
        jnp.broadcast_to(obs_in_single.lo, (k,) + obs_in_single.lo.shape),
        jnp.broadcast_to(obs_in_single.hi, (k,) + obs_in_single.hi.shape),
    )
    obs_out = GF(
        jnp.broadcast_to(mem_final.lo, (k,) + mem_final.lo.shape),
        jnp.broadcast_to(mem_final.hi, (k,) + mem_final.hi.shape),
    )
    n_rounds = w.round_execute.sum().astype(jnp.uint32)
    start_flags = jnp.arange(k) == 0
    completion_flags = (
        (jnp.arange(k, dtype=jnp.uint32) + 1) * jnp.uint32(limit_rounds)
        >= n_rounds
    )
    return protocol.compact_form_from_parts(
        start_flags, completion_flags, obs_in, obs_out,
        fsm_states[:-1], fsm_states[1:],
    )


def instance_compact_form(w: Sha256RoundWitness, config: Sha256RoundFunctionConfig):
    """Single-instance ClosedFormInput (same precompile I/O shape as keccak)."""
    from ..ops import gf as _gf
    from ..utils import protocol

    C = w.call_execute.shape[0]
    calls_qs = protocol.encode_queue_state_generic(
        _gf.zeros((4,)), w.call_chain[C], w.num_calls
    )
    n_mem = w.mem_order_execute.sum().astype(jnp.uint32)
    mem_initial = protocol.encode_queue_state_generic(
        _gf.zeros((12,)), w.mem_chain[0], jnp.uint32(0)
    )
    mem_final = protocol.encode_queue_state_generic(
        _gf.zeros((12,)), w.mem_chain[w.mem_chain.shape[0] - 1], n_mem
    )
    obs_in = _gf.concat([calls_qs, mem_initial], axis=-1)[None]
    obs_out = mem_final[None]
    return protocol.single_instance_compact_form(obs_in, obs_out)
