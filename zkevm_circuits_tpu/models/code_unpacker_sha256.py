"""code_unpacker_sha256 — circuit type 3: the code decommitter.

Reference parity: `src/code_unpacker_sha256/`
(`unpack_code_into_memory_inner` mod.rs:150-430).  Semantics replicated:

  * pops the deduplicated decommit queue; code_hash limb[7] packs
    [length_in_words : u16 | version_byte<<8 : u16]; the version byte must
    match ContractCodeSha256::VERSION_BYTE == 1 (mod.rs:195-209).
  * length_in_words is odd (Era invariant); rounds = (length+1)/2; each round
    writes 2 code words to (page, index++) at the request timestamp — except
    the final round which writes only the first word (mod.rs:310-345).
  * sha256 runs over the BE code words; the final round's second half-block
    is replaced by the padding [1<<31, 0..0, length_in_bits]
    (mod.rs:352-376).
  * at the final round the digest (as u256 limbs [H7..H1, 0], i.e. the code
    hash with limb 7 zeroed) must equal the requested hash (mod.rs:380-404).

TPU-first rows = sha256 rounds flat across requests; host witness gen,
row-parallel checking (same shape as the sha256 precompile circuit).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..base_structures.decommit_query import DecommitQueries, encode_decommit_queries
from ..base_structures.memory_query import MemoryQueries, encode_memory_queries
from ..ops import gf, queues, sha256
from ..ops.gf import GF

VERSION_BYTE = 1  # zkevm_opcode_defs ContractCodeSha256::VERSION_BYTE


@dataclasses.dataclass(frozen=True)
class CodeUnpackerConfig:
    max_rounds: int


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CodeUnpackerWitness:
    num_requests: jnp.ndarray
    requests: DecommitQueries  # (Q,)
    request_execute: jnp.ndarray
    request_chain: GF  # (Q+1, 12)
    # per-round columns (N = max_rounds)
    round_execute: jnp.ndarray  # (N,)
    round_request: jnp.ndarray  # (N,) request index
    round_is_first: jnp.ndarray
    round_is_last: jnp.ndarray
    word0: jnp.ndarray  # (N, 8) u32 limbs (LE), code word 0
    word1: jnp.ndarray  # (N, 8)
    block_words: jnp.ndarray  # (N, 16) sha256 BE input words
    state_before: jnp.ndarray  # (N, 8)
    state_after: jnp.ndarray  # (N, 8)
    writes: MemoryQueries  # (2N,) memory writes (word1 slot masked on final)
    write_execute: jnp.ndarray  # (2N,)
    mem_chain: GF  # (2N+1, 12)

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def make_request(code_words: list, page: int, timestamp: int) -> dict:
    """Build a DecommitQuery dict for a bytecode of odd word length, plus the
    canonical versioned hash."""
    W = len(code_words)
    assert W % 2 == 1, "Era bytecode length in words must be odd"
    data = b"".join(w.to_bytes(32, "big") for w in code_words)
    digest = sha256.sha256_ref(data)
    hash_int = int.from_bytes(digest, "big")
    # limb 7 (top 32 bits): version byte << 24 | length_in_words << 8? No:
    # limb7 = [version<<8 | ...]<<16 | length: top u16 = version<<8, low u16 = W
    hash_int &= (1 << 224) - 1  # drop top 4 bytes (H0)
    hash_int |= ((VERSION_BYTE << 8) << 16 | W) << 224
    return dict(code_hash=hash_int, page=page, timestamp=timestamp, is_first=True)


def generate_witness(
    requests: list, code_store: dict, config: CodeUnpackerConfig,
    mem_init_state=None,
) -> CodeUnpackerWitness:
    """requests: DecommitQuery dicts (see make_request).
    code_store: {code_hash_int: [word_int, ...]}.
    mem_init_state threads the global memory queue (scheduler mod.rs:284-349)."""
    Q = max(len(requests), 1)
    N = config.max_rounds

    rounds = []
    write_rows = []
    for qi, req in enumerate(requests):
        ch = int(req["code_hash"])
        W = ch >> 224 & 0xFFFF
        words = code_store[ch]
        assert len(words) == W
        ts, page = int(req["timestamp"]), int(req["page"])
        state = list(sha256.H0)
        nrounds = (W + 1) // 2
        bitlen = W * 32 * 8
        for r in range(nrounds):
            final = r == nrounds - 1
            w0 = words[2 * r]
            w1 = words[2 * r + 1] if not final else 0
            blk_bytes = w0.to_bytes(32, "big") + w1.to_bytes(32, "big")
            block = [int.from_bytes(blk_bytes[4 * j : 4 * j + 4], "big") for j in range(16)]
            if final:
                block[8:] = [1 << 31, 0, 0, 0, 0, 0, 0, bitlen]
            new_state = sha256.compress_ref(state, block)
            rounds.append(
                dict(req=qi, first=r == 0, last=final, w0=w0, w1=w1,
                     block=block, before=list(state), after=list(new_state))
            )
            state = new_state
            write_rows.append(
                dict(timestamp=ts, memory_page=page, index=2 * r, rw_flag=True,
                     is_ptr=False, value=w0, execute=True)
            )
            write_rows.append(
                dict(timestamp=ts, memory_page=page, index=2 * r + 1, rw_flag=True,
                     is_ptr=False, value=w1, execute=not final)
            )
    assert len(rounds) <= N

    def limbs(v):
        return [(v >> (32 * k)) & 0xFFFFFFFF for k in range(8)]

    blk = np.zeros((N, 16), np.uint32)
    before = np.tile(np.array(sha256.H0, np.uint32), (N, 1))
    after = np.zeros((N, 8), np.uint32)
    w0 = np.zeros((N, 8), np.uint32)
    w1 = np.zeros((N, 8), np.uint32)
    rreq = np.zeros(N, np.int32)
    rfirst = np.zeros(N, bool)
    rlast = np.zeros(N, bool)
    rexec = np.zeros(N, bool)
    for i, r in enumerate(rounds):
        blk[i] = r["block"]
        before[i] = r["before"]
        after[i] = r["after"]
        w0[i] = limbs(r["w0"])
        w1[i] = limbs(r["w1"])
        rreq[i] = r["req"]
        rfirst[i] = r["first"]
        rlast[i] = r["last"]
        rexec[i] = True

    pad_row = dict(timestamp=0, memory_page=0, index=0, rw_flag=False, is_ptr=False, value=0)
    wr_exec = np.zeros(2 * N, bool)
    wr_rows = []
    for i in range(2 * N):
        if i < len(write_rows):
            wr_rows.append({k: v for k, v in write_rows[i].items() if k != "execute"})
            wr_exec[i] = write_rows[i]["execute"]
        else:
            wr_rows.append(dict(pad_row))
    writes_q = MemoryQueries.from_lists(wr_rows)
    mem_enc = encode_memory_queries(writes_q)
    init12 = gf.zeros((12,)) if mem_init_state is None else gf.from_u64(
        np.asarray(mem_init_state, dtype=np.uint64))
    mem_chain = queues.simulate_chain(init12, mem_enc, jnp.asarray(wr_exec))

    req_pad = list(requests) + [dict(code_hash=0, page=0, timestamp=0, is_first=False)] * (
        Q - len(requests)
    )
    reqs = DecommitQueries.from_lists(req_pad)
    req_exec = np.arange(Q) < len(requests)
    req_enc = encode_decommit_queries(reqs)
    req_chain = queues.simulate_chain(gf.zeros((12,)), req_enc, jnp.asarray(req_exec))

    return CodeUnpackerWitness(
        num_requests=jnp.uint32(len(requests)),
        requests=reqs,
        request_execute=jnp.asarray(req_exec),
        request_chain=req_chain,
        round_execute=jnp.asarray(rexec),
        round_request=jnp.asarray(rreq),
        round_is_first=jnp.asarray(rfirst),
        round_is_last=jnp.asarray(rlast),
        word0=jnp.asarray(w0),
        word1=jnp.asarray(w1),
        block_words=jnp.asarray(blk),
        state_before=jnp.asarray(before),
        state_after=jnp.asarray(after),
        writes=writes_q,
        write_execute=jnp.asarray(wr_exec),
        mem_chain=mem_chain,
    )


def eval_constraints(w: CodeUnpackerWitness, config: CodeUnpackerConfig) -> dict:
    N = config.max_rounds
    res = {}

    req_enc = encode_decommit_queries(w.requests)
    res["request_chain"] = queues.check_chain(w.request_chain, req_enc, w.request_execute)
    # versioned hash: limb7 top u16 == version<<8, low u16 = length (odd)
    limb7 = w.requests.code_hash[..., 7]
    version_ok = (limb7 >> 16) == jnp.uint32(VERSION_BYTE << 8)
    length = limb7 & jnp.uint32(0xFFFF)
    res["versioned_hash"] = jnp.where(
        w.request_execute, version_ok & (length % 2 == 1), True
    )

    # rounds per request match (length+1)/2
    rounds_per_req = jnp.zeros(w.request_execute.shape[0], jnp.uint32).at[
        w.round_request
    ].add(w.round_execute.astype(jnp.uint32), mode="drop")
    res["round_count"] = jnp.where(
        w.request_execute, rounds_per_req == (length + 1) // 2, True
    )

    # sha256 block construction from code words
    def be_words(limbs):  # (..., 8) LE limbs -> 8 BE u32 sha words
        return limbs[..., ::-1]

    expected_blk = jnp.concatenate([be_words(w.word0), be_words(w.word1)], axis=-1)
    bitlen = (length[w.round_request] * jnp.uint32(256)).astype(jnp.uint32)
    pad_half = jnp.stack(
        [
            jnp.full(N, 1 << 31, jnp.uint32),
            *([jnp.zeros(N, jnp.uint32)] * 6),
            bitlen,
        ],
        axis=-1,
    )
    expected_blk = jnp.where(
        w.round_is_last[:, None],
        jnp.concatenate([be_words(w.word0), pad_half], axis=-1),
        expected_blk,
    )
    res["block_construction"] = jnp.where(
        w.round_execute, (expected_blk == w.block_words).all(axis=-1), True
    )

    # compression transitions + IV reset
    expected_after = sha256.compress(w.state_before, w.block_words)
    res["compress_transitions"] = jnp.where(
        w.round_execute, (expected_after == w.state_after).all(axis=-1), True
    )
    prev_after = jnp.concatenate(
        [jnp.tile(jnp.asarray(np.array(sha256.H0, np.uint32)), (1, 1)), w.state_after[:-1]]
    )
    iv = jnp.asarray(np.array(sha256.H0, np.uint32))
    cont = jnp.where(w.round_is_first[:, None], iv[None, :], prev_after)
    res["state_continuity"] = jnp.where(
        w.round_execute, (w.state_before == cont).all(axis=-1), True
    )

    # final-round digest equals the cutted hash: limbs [H7..H1, 0]
    digest_limbs = jnp.concatenate(
        [w.state_after[..., ::-1][..., :7], jnp.zeros((N, 1), jnp.uint32)], axis=-1
    )
    cutted = w.requests.code_hash[w.round_request].at[..., 7].set(0)
    res["hash_equality"] = jnp.where(
        w.round_execute & w.round_is_last,
        (digest_limbs == cutted).all(axis=-1),
        True,
    )

    # memory writes: correct page/index/ts, values = code words, word1 masked
    # on final rounds
    ridx = jnp.arange(N)
    roff = _round_offset_within_group(w.round_request)
    page = w.requests.page[w.round_request]
    ts = w.requests.timestamp[w.round_request]
    ok0 = (
        (w.writes.memory_page[2 * ridx] == page)
        & (w.writes.index[2 * ridx] == 2 * roff)
        & (w.writes.timestamp[2 * ridx] == ts)
        & w.writes.rw_flag[2 * ridx]
        & (w.writes.value[2 * ridx] == w.word0).all(axis=-1)
    )
    ok1 = (
        (w.writes.memory_page[2 * ridx + 1] == page)
        & (w.writes.index[2 * ridx + 1] == 2 * roff + 1)
        & (w.writes.value[2 * ridx + 1] == w.word1).all(axis=-1)
    )
    res["write_word0"] = jnp.where(w.round_execute, ok0, True)
    res["write_word1"] = jnp.where(w.round_execute & ~w.round_is_last, ok1, True)
    exec_ok0 = w.write_execute[2 * ridx] == w.round_execute
    exec_ok1 = w.write_execute[2 * ridx + 1] == (w.round_execute & ~w.round_is_last)
    res["write_execute_flags"] = exec_ok0 & exec_ok1

    mem_enc = encode_memory_queries(w.writes)
    res["mem_chain"] = queues.check_chain(w.mem_chain, mem_enc, w.write_execute)
    return res


def _round_offset_within_group(round_request):
    n = round_request.shape[0]
    idx = jnp.arange(n)
    first = jnp.concatenate([jnp.array([True]), round_request[1:] != round_request[:-1]])
    start = jax.lax.cummax(jnp.where(first, idx, 0))
    return (idx - start).astype(jnp.uint32)


def all_ok(residuals: dict) -> bool:
    return all(bool(np.asarray(v).all()) for v in residuals.values())


eval_constraints_jit = jax.jit(eval_constraints, static_argnums=(1,))


def instance_compact_forms(
    w: CodeUnpackerWitness, config: CodeUnpackerConfig, limit_rounds: int
):
    """Multi-instance ClosedFormInput over the unpack-round axis,
    continuation across and INSIDE decommit requests (the
    CodeDecommitterFSM role, ref code_decommiter/input.rs).  FSM at
    boundary r: the running sha256 state, request progress, the request
    queue consumed so far, and the memory queue after the writes emitted by
    rounds < r (2 per round, the final round's second slot masked)."""
    from ..ops import gf as _gf
    from ..utils import protocol

    N = config.max_rounds
    assert N % limit_rounds == 0, (N, limit_rounds)
    k = N // limit_rounds
    bounds = jnp.arange(k + 1) * limit_rounds

    Q = w.request_execute.shape[0]
    write_prefix = jnp.concatenate(
        [jnp.zeros(1, jnp.uint32),
         jnp.cumsum(w.write_execute.astype(jnp.uint32), dtype=jnp.uint32)]
    )

    idx = jnp.arange(N)
    first = jnp.where(w.round_is_first, idx, 0)
    group_start = jax.lax.cummax(first)
    round_off = (idx - group_start).astype(jnp.uint32)

    def fsm_at(b):
        in_range = b < N
        bi = jnp.minimum(b, N - 1)
        live = in_range & w.round_execute[bi]
        req = jnp.where(live, w.round_request[bi].astype(jnp.uint32), Q)
        off = jnp.where(in_range, round_off[bi], jnp.uint32(0))
        state = jnp.where(live, w.state_before[bi], jnp.zeros(8, jnp.uint32))
        done = jnp.where(live, req, w.num_requests).astype(jnp.int32)
        req_state = w.request_chain[done]
        mem_pos = jnp.where(
            live, write_prefix[2 * bi],
            w.write_execute.sum().astype(jnp.uint32),
        )
        mem_state = w.mem_chain[jnp.minimum(mem_pos, w.mem_chain.shape[0] - 1)]
        lanes = [_gf.from_u32(state[j]) for j in range(8)]
        lanes += [
            _gf.from_u32(jnp.asarray(req, jnp.uint32)),
            _gf.from_u32(off),
            _gf.from_u32(mem_pos.astype(jnp.uint32)),
        ]
        lanes += [req_state[j] for j in range(12)]
        lanes += [mem_state[j] for j in range(12)]
        return _gf.stack(lanes, axis=-1)

    fsm_states = jax.vmap(fsm_at)(bounds)

    req_qs = protocol.encode_queue_state_generic(
        _gf.zeros((12,)), w.request_chain[Q], w.num_requests
    )
    n_mem = w.write_execute.sum().astype(jnp.uint32)
    mem_initial = protocol.encode_queue_state_generic(
        _gf.zeros((12,)), w.mem_chain[0], jnp.uint32(0)
    )
    mem_final = protocol.encode_queue_state_generic(
        _gf.zeros((12,)), w.mem_chain[w.mem_chain.shape[0] - 1], n_mem
    )
    obs_in_single = _gf.concat([req_qs, mem_initial], axis=-1)
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


def instance_compact_form(w: CodeUnpackerWitness, config: CodeUnpackerConfig):
    """Single-instance ClosedFormInput (CodeDecommitterInputData shape:
    deduped decommit queue + memory queue; output = final memory queue)."""
    from ..ops import gf as _gf
    from ..utils import protocol

    Q = w.request_execute.shape[0]
    req_qs = protocol.encode_queue_state_generic(
        _gf.zeros((12,)), w.request_chain[Q], w.num_requests
    )
    n_mem = w.write_execute.sum().astype(jnp.uint32)
    mem_initial = protocol.encode_queue_state_generic(
        _gf.zeros((12,)), w.mem_chain[0], jnp.uint32(0)
    )
    mem_final = protocol.encode_queue_state_generic(
        _gf.zeros((12,)), w.mem_chain[w.mem_chain.shape[0] - 1], n_mem
    )
    obs_in = _gf.concat([req_qs, mem_initial], axis=-1)[None]
    obs_out = mem_final[None]
    return protocol.single_instance_compact_form(obs_in, obs_out)
