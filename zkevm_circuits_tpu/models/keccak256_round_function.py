"""keccak256_round_function — circuit type 5: the keccak precompile.

Reference parity: `src/keccak256_round_function/` (ABI
`Keccak256PrecompileCallParams::from_encoding` mod.rs:74-98: key limbs
[0]=input_memory_byte_offset, [1]=input_memory_byte_length,
[2]=output_word_offset, [4]=input_page, [5]=output_page; full-padding round
when len % 136 == 0), per-cycle cadence of 1 keccak-f + up to
MEMORY_QUERIES_PER_CYCLE = 6 unaligned 32-byte reads (input.rs:23), digest
written back as one memory word.

TPU-first row structure (redesigned, value-equivalent): one row per
keccak-f[1600] invocation (the reference's cycle cadence), flat across all
calls of the instance.  The reference's 192-byte ByteBuffer is a scheduling
device for its in-circuit cost model; here the byte stream is materialized
directly and every check is row-parallel:

  * call-queue pops + ABI decode (per call)
  * memory reads: aligned 32-byte words covering [offset, offset+len) of the
    input page, in word order per call, pushed to the memory queue; the
    byte stream is a gather from those words (unaligned start handled by
    index arithmetic, reference's UMA-style cleanup)
  * keccak state chain with reset at each call's first block; 0x01/0x80
    padding (0x81 fused case included); digest from the final state
  * one memory write of the BE digest per call

Witness generation is host-side (numpy — ragged per-call lengths); the
constraint pass is jitted/batched.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..base_structures.log_query import LogQueries, encode_log_queries
from ..base_structures.memory_query import MemoryQueries, encode_memory_queries
from ..isa.system_params import (
    KECCAK256_PRECOMPILE_FORMAL_ADDRESS,
    PRECOMPILE_AUX_BYTE,
)
from ..ops import gf, keccak, queues
from ..ops.gf import GF
from ..ops.keccak import KECCAK_RATE_BYTES as RATE

MEMORY_QUERIES_PER_CYCLE = 6  # ref input.rs:23


@dataclasses.dataclass(frozen=True)
class KeccakRoundFunctionConfig:
    max_blocks: int  # total keccak-f rows in the instance
    max_reads: int  # total 32-byte memory reads in the instance


def abi_from_key(key_limbs) -> dict:
    """Decode PrecompileCallABI from the LogQuery key (limbs LE u32)."""
    return dict(
        input_memory_byte_offset=key_limbs[..., 0],
        input_memory_byte_length=key_limbs[..., 1],
        output_word_offset=key_limbs[..., 2],
        input_page=key_limbs[..., 4],
        output_page=key_limbs[..., 5],
    )


def _word_bytes_be(value_limbs: np.ndarray) -> np.ndarray:
    """u256 (8 LE u32 limbs) -> 32 bytes in memory order (big-endian)."""
    out = np.empty(value_limbs.shape[:-1] + (32,), dtype=np.uint32)
    for k in range(8):
        limb = value_limbs[..., 7 - k]
        for j in range(4):
            out[..., 4 * k + j] = (limb >> (8 * (3 - j))) & 0xFF
    return out


def _bytes_to_u256_limbs(digest: np.ndarray) -> np.ndarray:
    """32 BE bytes -> 8 LE u32 limbs."""
    out = np.zeros(digest.shape[:-1] + (8,), dtype=np.uint32)
    for k in range(8):
        for j in range(4):
            out[..., 7 - k] = out[..., 7 - k] | (
                digest[..., 4 * k + j].astype(np.uint32) << (8 * (3 - j))
            )
    return out


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class KeccakRoundWitness:
    num_calls: jnp.ndarray  # ()
    calls: LogQueries  # (C,) padded call queue
    call_execute: jnp.ndarray  # (C,)
    call_chain: GF  # (C+1, 4) calls-queue head chain
    # per-block columns (B = max_blocks)
    block_execute: jnp.ndarray  # (B,)
    block_call: jnp.ndarray  # (B,) call index
    block_is_first: jnp.ndarray  # (B,)
    block_is_last: jnp.ndarray  # (B,)
    block_bytes: jnp.ndarray  # (B, 136) u32
    state_lo: jnp.ndarray  # (B+1, 25) state BEFORE each block (post-reset)
    state_hi: jnp.ndarray
    out_lo: jnp.ndarray  # (B, 25) state AFTER each block
    out_hi: jnp.ndarray
    # memory side
    reads: MemoryQueries  # (R,) read queries in order
    read_execute: jnp.ndarray  # (R,)
    read_call: jnp.ndarray  # (R,) call index of each read
    writes: MemoryQueries  # (C,) digest writes
    mem_chain: GF  # (R+C+1, 12) memory queue chain (reads then per-call write)
    mem_order_encodings: GF  # (R+C, 8)
    mem_order_execute: jnp.ndarray  # (R+C,)
    digests: jnp.ndarray  # (C, 32)

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def call_payloads(calls: list, memory: dict) -> list:
    """The PLAINTEXT input byte stream of each precompile call (the bytes
    the in-circuit keccak absorbs) — public data the digest STARK
    (prover/keccak_air.py) binds via its message RLC."""
    out = []
    for call in calls:
        key = int(call["key"])
        limbs = [(key >> (32 * k)) & 0xFFFFFFFF for k in range(8)]
        off, length = limbs[0], limbs[1]
        in_page = limbs[4]
        first_word = off // 32
        last_word = (off + length - 1) // 32 if length else first_word
        data = bytearray()
        for wi in range(first_word, last_word + 1):
            data += memory.get((in_page, wi), b"\x00" * 32)
        out.append(bytes(data[off % 32 : off % 32 + length]))
    return out


def generate_witness(
    calls: list,
    memory: dict,
    config: KeccakRoundFunctionConfig,
    mem_init_state=None,
) -> KeccakRoundWitness:
    """calls: list of dicts (LogQuery fields; key encodes the ABI).
    memory: {(page, word_index): 32-byte bytes object} backing store.
    mem_init_state: optional (12,) initial memory-queue sponge state — the
    scheduler's memory-queue THREADING (ref scheduler/mod.rs:284-349): this
    circuit continues the global memory queue where its predecessor left
    off; the compact form's mem_initial exposes it (mem_chain[0])."""
    C = len(calls)
    B, R = config.max_blocks, config.max_reads

    block_rows = []
    read_rows = []
    write_rows = []
    digests = []
    for ci, call in enumerate(calls):
        key = int(call["key"])
        limbs = [(key >> (32 * k)) & 0xFFFFFFFF for k in range(8)]
        off, length, out_word = limbs[0], limbs[1], limbs[2]
        in_page, out_page = limbs[4], limbs[5]
        ts = int(call["timestamp"])
        first_word = off // 32
        last_word = (off + length - 1) // 32 if length else first_word
        data = bytearray()
        for wi in range(first_word, last_word + 1):
            word = memory.get((in_page, wi), b"\x00" * 32)
            assert len(word) == 32
            read_rows.append(
                dict(
                    timestamp=ts,
                    memory_page=in_page,
                    index=wi,
                    rw_flag=False,
                    is_ptr=False,
                    value=int.from_bytes(word, "big"),
                    call=ci,
                )
            )
            data += word
        payload = bytes(data[off % 32 : off % 32 + length])
        digest = keccak.keccak256_ref(payload)
        digests.append(list(digest))
        # padded blocks
        padded = bytearray(payload)
        pad_len = RATE - (len(padded) % RATE)
        if pad_len == 1:
            padded += b"\x81"
        else:
            padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80"
        nb = len(padded) // RATE
        for b in range(nb):
            block_rows.append(
                dict(
                    call=ci,
                    first=b == 0,
                    last=b == nb - 1,
                    bytes=list(padded[b * RATE : (b + 1) * RATE]),
                )
            )
        write_rows.append(
            dict(
                timestamp=ts + 1,
                memory_page=out_page,
                index=out_word,
                rw_flag=True,
                is_ptr=False,
                value=int.from_bytes(digest, "big"),
            )
        )
    assert len(block_rows) <= B, (len(block_rows), B)
    assert len(read_rows) <= R, (len(read_rows), R)

    # ---- flat block columns + keccak chain (host) ----
    blk_bytes = np.zeros((B, RATE), dtype=np.uint32)
    blk_call = np.zeros(B, dtype=np.int32)
    blk_first = np.zeros(B, dtype=bool)
    blk_last = np.zeros(B, dtype=bool)
    blk_exec = np.zeros(B, dtype=bool)
    states = np.zeros((B + 1, 25), dtype=np.uint64)
    outs = np.zeros((B, 25), dtype=np.uint64)
    cur = [0] * 25
    for b, row in enumerate(block_rows):
        if row["first"]:
            cur = [0] * 25
        states[b] = cur
        lanes = keccak.bytes_to_lanes(bytes(row["bytes"]))
        cur = keccak.keccak_f1600_ref(
            [cur[i] ^ (lanes[i] if i < 17 else 0) for i in range(25)]
        )
        outs[b] = cur
        blk_bytes[b] = row["bytes"]
        blk_call[b] = row["call"]
        blk_first[b] = row["first"]
        blk_last[b] = row["last"]
        blk_exec[b] = True

    def mq_from_rows(rows, count):
        padded = list(rows) + [
            dict(timestamp=0, memory_page=0, index=0, rw_flag=False, is_ptr=False, value=0)
        ] * (count - len(rows))
        return MemoryQueries.from_lists(padded)

    reads_q = mq_from_rows(read_rows, R)
    read_exec = np.arange(R) < len(read_rows)
    read_call = np.zeros(R, dtype=np.int32)
    for i, r in enumerate(read_rows):
        read_call[i] = r["call"]
    writes_q = mq_from_rows(write_rows, max(C, 1))

    # memory queue order: all reads of call 0, its write, reads of call 1, ...
    order_rows = []
    for ci in range(C):
        order_rows.extend([r for r in read_rows if r["call"] == ci])
        order_rows.append(write_rows[ci])
    mem_q = mq_from_rows(order_rows, R + max(C, 1))
    mem_exec = np.arange(R + max(C, 1)) < len(order_rows)
    mem_enc = encode_memory_queries(mem_q)
    init12 = gf.zeros((12,)) if mem_init_state is None else gf.from_u64(
        np.asarray(mem_init_state, dtype=np.uint64))
    mem_chain = queues.simulate_chain(init12, mem_enc, jnp.asarray(mem_exec))

    # calls queue
    call_pad = calls + [
        dict(address=0, key=0, read_value=0, written_value=0, aux_byte=0,
             rw_flag=False, rollback=False, is_service=False, shard_id=0,
             tx_number_in_block=0, timestamp=0)
    ] * (max(C, 1) - C)
    calls_q = LogQueries.from_lists(call_pad)
    call_exec = np.arange(max(C, 1)) < C
    call_enc = encode_log_queries(calls_q)
    call_chain = queues.simulate_chain(gf.zeros((4,)), call_enc, jnp.asarray(call_exec))

    dig = np.zeros((max(C, 1), 32), dtype=np.uint32)
    for i, d in enumerate(digests):
        dig[i] = d

    return KeccakRoundWitness(
        num_calls=jnp.uint32(C),
        calls=calls_q,
        call_execute=jnp.asarray(call_exec),
        call_chain=call_chain,
        block_execute=jnp.asarray(blk_exec),
        block_call=jnp.asarray(blk_call),
        block_is_first=jnp.asarray(blk_first),
        block_is_last=jnp.asarray(blk_last),
        block_bytes=jnp.asarray(blk_bytes),
        state_lo=jnp.asarray((states & 0xFFFFFFFF).astype(np.uint32)),
        state_hi=jnp.asarray((states >> 32).astype(np.uint32)),
        out_lo=jnp.asarray((outs & 0xFFFFFFFF).astype(np.uint32)),
        out_hi=jnp.asarray((outs >> 32).astype(np.uint32)),
        reads=reads_q,
        read_execute=jnp.asarray(read_exec),
        read_call=jnp.asarray(read_call),
        writes=writes_q,
        mem_chain=mem_chain,
        mem_order_encodings=mem_enc,
        mem_order_execute=jnp.asarray(mem_exec),
        digests=jnp.asarray(dig),
    )


def _jnp_word_bytes_be(value: jnp.ndarray) -> jnp.ndarray:
    outs = []
    for k in range(8):
        limb = value[..., 7 - k]
        for j in range(4):
            outs.append((limb >> jnp.uint32(8 * (3 - j))) & jnp.uint32(0xFF))
    return jnp.stack(outs, axis=-1)


def eval_constraints(w: KeccakRoundWitness, config: KeccakRoundFunctionConfig) -> dict:
    B = config.max_blocks
    res = {}

    # (1) call queue: chain + precompile address/aux byte
    call_enc = encode_log_queries(w.calls)
    res["call_chain"] = queues.check_chain(w.call_chain, call_enc, w.call_execute)
    addr_ok = jnp.ones_like(w.call_execute)
    limbs = [(KECCAK256_PRECOMPILE_FORMAL_ADDRESS >> (32 * i)) & 0xFFFFFFFF for i in range(5)]
    for i, l in enumerate(limbs):
        addr_ok = addr_ok & (w.calls.address[..., i] == jnp.uint32(l))
    res["call_is_keccak_precompile"] = jnp.where(
        w.call_execute,
        addr_ok & (w.calls.aux_byte == jnp.uint32(PRECOMPILE_AUX_BYTE)),
        True,
    )

    # (2) keccak chain: reset at first block, absorb, digest at last
    abs_lo, abs_hi = keccak.absorb_block(
        w.state_lo[:-1],
        w.state_hi[:-1],
        *_block_lanes(w.block_bytes),
    )
    out_ok = (abs_lo == w.out_lo).all(axis=-1) & (abs_hi == w.out_hi).all(axis=-1)
    res["keccak_transitions"] = jnp.where(w.block_execute, out_ok, True)
    # state continuity: non-first blocks continue from previous out; first = 0
    prev_out_lo = jnp.concatenate([jnp.zeros((1, 25), jnp.uint32), w.out_lo[:-1]])
    prev_out_hi = jnp.concatenate([jnp.zeros((1, 25), jnp.uint32), w.out_hi[:-1]])
    cont_lo = jnp.where(w.block_is_first[:, None], 0, prev_out_lo)
    cont_hi = jnp.where(w.block_is_first[:, None], 0, prev_out_hi)
    res["state_continuity"] = jnp.where(
        w.block_execute,
        (w.state_lo[:-1] == cont_lo).all(axis=-1) & (w.state_hi[:-1] == cont_hi).all(axis=-1),
        True,
    )
    # digests extracted from the last block's output state
    dig = _digest_bytes(w.out_lo, w.out_hi)  # (B, 32)
    dig_call = w.digests[w.block_call]  # (B, 32)
    res["digest_extraction"] = jnp.where(
        w.block_execute & w.block_is_last, (dig == dig_call).all(axis=-1), True
    )

    # (3) block byte stream matches memory reads + padding
    abi = abi_from_key(w.calls.key)
    blk_off = _block_offset_within_call(w.block_call, w.block_is_first, B)
    byte_pos = blk_off[:, None] * RATE + jnp.arange(RATE)[None, :]  # (B,136)
    call_off = abi["input_memory_byte_offset"][w.block_call]
    call_len = abi["input_memory_byte_length"][w.block_call]
    gpos = (call_off % 32)[:, None] + byte_pos  # position within the read words
    widx = gpos // 32  # word index within the call's reads
    bidx = gpos % 32
    read_start = _call_read_start(w.read_call, w.call_execute.shape[0])
    flat_read = read_start[w.block_call][:, None] + widx
    flat_read = jnp.clip(flat_read, 0, w.reads.shape[0] - 1)
    word_bytes = _jnp_word_bytes_be(w.reads.value)  # (R, 32)
    data_byte = word_bytes[flat_read, bidx]
    in_msg = byte_pos < call_len[:, None]
    pad_one_pos = byte_pos == call_len[:, None]
    nb_call = call_len // RATE + 1
    last_byte = byte_pos == nb_call[:, None] * RATE - 1
    expected = jnp.where(in_msg, data_byte, 0)
    expected = jnp.where(pad_one_pos, expected | 0x01, expected)
    expected = jnp.where(last_byte, expected | 0x80, expected)
    res["block_bytes"] = jnp.where(
        w.block_execute, (expected == w.block_bytes).all(axis=-1), True
    )

    # (4) read queries address the right page/words
    res["read_addressing"] = jnp.where(
        w.read_execute,
        (w.reads.memory_page == abi["input_page"][w.read_call])
        & (~w.reads.rw_flag)
        & (
            w.reads.index
            == (abi["input_memory_byte_offset"][w.read_call] // 32)
            + _read_offset_within_call(w.read_call, w.read_execute)
        ),
        True,
    )

    # (5) writes carry the digest to the right location
    wdig = _jnp_word_bytes_be(w.writes.value)
    res["write_value_is_digest"] = jnp.where(
        w.call_execute, (wdig == w.digests).all(axis=-1), True
    )
    res["write_addressing"] = jnp.where(
        w.call_execute,
        (w.writes.memory_page == abi["output_page"])
        & (w.writes.index == abi["output_word_offset"])
        & w.writes.rw_flag,
        True,
    )

    # (6) memory queue chain over the pinned order
    res["mem_chain"] = queues.check_chain(
        w.mem_chain, w.mem_order_encodings, w.mem_order_execute
    )
    return res


def _block_lanes(block_bytes: jnp.ndarray):
    by = block_bytes.reshape(block_bytes.shape[0], RATE // 8, 8)
    lo = by[..., 0] | (by[..., 1] << 8) | (by[..., 2] << 16) | (by[..., 3] << 24)
    hi = by[..., 4] | (by[..., 5] << 8) | (by[..., 6] << 16) | (by[..., 7] << 24)
    return lo, hi


def _digest_bytes(state_lo, state_hi):
    outs = []
    for lane in range(4):
        for part in (state_lo, state_hi):
            word = part[..., lane]
            for j in range(4):
                outs.append((word >> jnp.uint32(8 * j)) & jnp.uint32(0xFF))
    return jnp.stack(outs, axis=-1)


def _block_offset_within_call(block_call, block_is_first, B):
    """block index within its call: 0 at first, +1 within the group."""
    idx = jnp.arange(B)
    start = jnp.where(block_is_first, idx, 0)
    group_start = jax.lax.cummax(start)
    return (idx - group_start).astype(jnp.uint32)


def _call_read_start(read_call, num_calls):
    """first flat read index of each call (reads grouped per call, in order)."""
    R = read_call.shape[0]
    idx = jnp.arange(R)
    # scatter-min of row index per call
    starts = (
        jnp.full(num_calls, R, jnp.int32)
        .at[read_call]
        .min(idx.astype(jnp.int32), mode="drop")
    )
    return starts


def _read_offset_within_call(read_call, read_execute):
    R = read_call.shape[0]
    idx = jnp.arange(R)
    first = jnp.concatenate([jnp.array([True]), read_call[1:] != read_call[:-1]])
    start = jax.lax.cummax(jnp.where(first, idx, 0))
    return (idx - start).astype(jnp.uint32)


def all_ok(residuals: dict) -> bool:
    return all(bool(np.asarray(v).all()) for v in residuals.values())


eval_constraints_jit = jax.jit(eval_constraints, static_argnums=(1,))


def instance_compact_forms(
    w: KeccakRoundWitness,
    config: KeccakRoundFunctionConfig,
    limit_blocks: int,
):
    """Multi-instance ClosedFormInput: the block axis sliced into
    `limit_blocks`-block instances, continuation ACROSS calls and mid-call
    (the Keccak256RoundFunctionFSM role, ref keccak256_round_function/
    input.rs:21-45).

    The hidden FSM at boundary b carries everything the next instance needs:
    the keccak internal state BEFORE block b (the 25 lanes, reset-at-first
    semantics make this exact), the in-call progress (call index + block
    offset within the call), the calls-queue state after the calls fully
    consumed, and the memory-queue state at the call boundary (our pinned
    order absorbs all of a call's reads before its first block, so the
    mem position is derivable from the call index alone)."""
    from ..ops import gf as _gf
    from ..utils import protocol

    B = config.max_blocks
    assert B % limit_blocks == 0, (B, limit_blocks)
    k = B // limit_blocks
    bounds = jnp.arange(k + 1) * limit_blocks  # (k+1,)

    C = w.call_execute.shape[0]
    # reads per call; the pinned memory order is [reads of call 0, write 0,
    # reads of call 1, write 1, ...], so the mem position at ANY block of
    # call ci (its reads already absorbed, its write not yet) is
    #   sum_{c<ci}(reads_c + 1) + reads_ci
    reads_per_call = (
        jnp.zeros(C + 1, jnp.uint32)
        .at[w.read_call + 1]
        .add(w.read_execute.astype(jnp.uint32))
    )
    prefix = jnp.concatenate(
        [jnp.zeros(1, jnp.uint32),
         jnp.cumsum(reads_per_call[1:] + 1, dtype=jnp.uint32)]
    )
    mem_pos_call = prefix[:-1] + reads_per_call[1:]  # (C,)

    blk_off = _block_offset_within_call(w.block_call, w.block_is_first, B)

    def fsm_at(b):
        in_range = b < B
        bi = jnp.minimum(b, B - 1)
        call = jnp.where(in_range & w.block_execute[bi], w.block_call[bi], C)
        call_u = jnp.minimum(call, C - 1).astype(jnp.int32)
        off = jnp.where(in_range, blk_off[bi], jnp.uint32(0))
        state_before = jnp.where(
            in_range, w.state_lo[bi], jnp.zeros(25, jnp.uint32)
        )
        state_before_hi = jnp.where(
            in_range, w.state_hi[bi], jnp.zeros(25, jnp.uint32)
        )
        # boundary exactly at a call start => previous calls fully consumed
        done_calls = jnp.where(
            in_range & w.block_execute[bi], call, w.num_calls
        ).astype(jnp.int32)
        call_tail = w.call_chain[done_calls]
        mem_pos = jnp.where(
            in_range & w.block_execute[bi],
            mem_pos_call[call_u],
            w.mem_order_execute.sum().astype(jnp.uint32),
        )
        mem_state = w.mem_chain[jnp.minimum(mem_pos, w.mem_chain.shape[0] - 1)]
        lanes = [
            _gf.from_u32(state_before[j]) for j in range(25)
        ] + [
            _gf.from_u32(state_before_hi[j]) for j in range(25)
        ] + [
            _gf.from_u32(jnp.asarray(call, jnp.uint32)),
            _gf.from_u32(off),
            _gf.from_u32(mem_pos.astype(jnp.uint32)),
        ]
        lanes += [call_tail[j] for j in range(4)]
        lanes += [mem_state[j] for j in range(12)]
        return _gf.stack(lanes, axis=-1)

    fsm_states = jax.vmap(fsm_at)(bounds)  # (k+1, L)

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
    obs_out_single = mem_final
    obs_out = GF(
        jnp.broadcast_to(obs_out_single.lo, (k,) + obs_out_single.lo.shape),
        jnp.broadcast_to(obs_out_single.hi, (k,) + obs_out_single.hi.shape),
    )

    n_blocks = w.block_execute.sum().astype(jnp.uint32)
    start_flags = jnp.arange(k) == 0
    completion_flags = (
        (jnp.arange(k, dtype=jnp.uint32) + 1) * jnp.uint32(limit_blocks)
        >= n_blocks
    )
    return protocol.compact_form_from_parts(
        start_flags, completion_flags, obs_in, obs_out,
        fsm_states[:-1], fsm_states[1:],
    )


def instance_compact_form(w: KeccakRoundWitness, config: KeccakRoundFunctionConfig):
    """Single-instance ClosedFormInput (PrecompileFunctionInputData/OutputData
    shape, ref base_structures/precompile_input_outputs/mod.rs:23-44)."""
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
