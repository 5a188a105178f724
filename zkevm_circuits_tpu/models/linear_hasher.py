"""linear_hasher — circuit type 13: L1-messages pubdata hasher.

Reference parity: `src/linear_hasher/` (entry mod.rs:~50-214).  Single
instance only (start_flag enforced true, mod.rs:67); pops the L1-message
queue, serializes each LogQuery to L2_TO_L1_MESSAGE_BYTE_LENGTH = 88 bytes
(`into_bytes`, log_query/mod.rs:645-686):

    shard_id(1) || is_service(1) || tx_number_be[2..4](2) || address_be(20)
    || key_be(32) || written_value_be(32)

streams them through in-circuit keccak256 with 136-byte-rate buffering and
0x01/0x80 padding (mod.rs:105-168), and exposes the 32-byte digest.  An empty
queue yields keccak256("") (mod.rs:87-95) — which the uniform padding path
produces naturally here.

TPU design: the ragged byte buffering becomes a static layout: the padded
byte stream is materialized as (B, 136) blocks (B = max blocks for the
instance capacity), the keccak state chain over blocks is the only
sequential part, and every check (serialization, stream gather, block
transitions, digest extraction) is batch-parallel.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..base_structures.log_query import LogQueries, encode_log_queries
from ..ops import gf, keccak, queues
from ..ops.gf import GF

L2_TO_L1_MESSAGE_BYTE_LENGTH = 88
RATE = keccak.KECCAK_RATE_BYTES  # 136


@dataclasses.dataclass(frozen=True)
class LinearHasherConfig:
    limit: int  # queue-pop capacity of the (single) instance


def serialize_l2_l1_bytes(q: LogQueries) -> jnp.ndarray:
    """(..., 88) uint32 byte values — exact reference layout."""
    def be_bytes(limbs, n_limbs):
        # limbs: (..., n) u32 little-endian limb order -> big-endian byte list
        out = []
        for k in range(n_limbs - 1, -1, -1):
            for j in (3, 2, 1, 0):
                out.append((limbs[..., k] >> jnp.uint32(8 * j)) & jnp.uint32(0xFF))
        return out

    cols = [q.shard_id & jnp.uint32(0xFF), q.is_service.astype(jnp.uint32)]
    # tx_number_in_block: 4 BE bytes, top 2 dropped (enforced zero)
    cols.append((q.tx_number_in_block >> jnp.uint32(8)) & jnp.uint32(0xFF))
    cols.append(q.tx_number_in_block & jnp.uint32(0xFF))
    cols.extend(be_bytes(q.address, 5))
    cols.extend(be_bytes(q.key, 8))
    cols.extend(be_bytes(q.written_value, 8))
    assert len(cols) == L2_TO_L1_MESSAGE_BYTE_LENGTH
    return jnp.stack(cols, axis=-1)


def _build_blocks(msg_bytes: jnp.ndarray, n: jnp.ndarray, max_blocks: int):
    """Flatten (N, 88) messages of which the first n are real, pad keccak-style,
    return ((B, 17) lane lo, (B, 17) lane hi, (B,) execute, nblocks)."""
    total_bytes = max_blocks * RATE
    stream = msg_bytes.reshape(-1)  # (N*88,)
    if stream.shape[0] < total_bytes:
        stream = jnp.concatenate(
            [stream, jnp.zeros(total_bytes - stream.shape[0], jnp.uint32)]
        )
    else:
        stream = stream[:total_bytes]
    idx = jnp.arange(total_bytes, dtype=jnp.uint32)
    msg_len = n * jnp.uint32(L2_TO_L1_MESSAGE_BYTE_LENGTH)
    nblocks = msg_len // jnp.uint32(RATE) + 1
    stream = jnp.where(idx < msg_len, stream, 0)
    stream = jnp.where(idx == msg_len, jnp.uint32(0x01), stream)
    last_byte_idx = nblocks * jnp.uint32(RATE) - 1
    stream = jnp.where(idx == last_byte_idx, stream | jnp.uint32(0x80), stream)
    # bytes -> 64-bit lanes (17 per block), little-endian within lane
    by = stream.reshape(max_blocks, RATE // 8, 8)
    lo = (
        by[..., 0] | (by[..., 1] << 8) | (by[..., 2] << 16) | (by[..., 3] << 24)
    )
    hi = (
        by[..., 4] | (by[..., 5] << 8) | (by[..., 6] << 16) | (by[..., 7] << 24)
    )
    execute = jnp.arange(max_blocks, dtype=jnp.uint32) < nblocks
    return lo, hi, execute, nblocks


def _keccak_chain(block_lo, block_hi, execute):
    """Sequential keccak-state chain over blocks; returns (B+1, 25) lo/hi."""

    def body(carry, x):
        blo, bhi, ex = x
        nlo, nhi = keccak.absorb_block(carry[0], carry[1], blo, bhi)
        nlo = jnp.where(ex, nlo, carry[0])
        nhi = jnp.where(ex, nhi, carry[1])
        return (nlo, nhi), (nlo, nhi)

    z = jnp.zeros((25,), jnp.uint32)
    (_, _), (states_lo, states_hi) = jax.lax.scan(
        body, (z, z), (block_lo, block_hi, execute)
    )
    states_lo = jnp.concatenate([z[None], states_lo])
    states_hi = jnp.concatenate([z[None], states_hi])
    return states_lo, states_hi


def digest_from_state(state_lo, state_hi) -> jnp.ndarray:
    """(…, 25) state -> (…, 32) digest bytes (first 4 lanes, LE bytes)."""
    outs = []
    for lane in range(4):
        for part in (state_lo, state_hi):
            w = part[..., lane]
            for j in range(4):
                outs.append((w >> jnp.uint32(8 * j)) & jnp.uint32(0xFF))
    return jnp.stack(outs, axis=-1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LinearHasherWitness:
    n: jnp.ndarray
    execute: jnp.ndarray  # (N,)
    queries: LogQueries
    encodings: GF
    input_chain: GF  # (N+1, 4)
    msg_bytes: jnp.ndarray  # (N, 88)
    block_lo: jnp.ndarray  # (B, 17)
    block_hi: jnp.ndarray
    block_execute: jnp.ndarray  # (B,)
    state_lo: jnp.ndarray  # (B+1, 25)
    state_hi: jnp.ndarray
    digest: jnp.ndarray  # (32,) bytes

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _max_blocks(limit: int) -> int:
    return (limit * L2_TO_L1_MESSAGE_BYTE_LENGTH) // RATE + 1


def generate_witness(queries: LogQueries, config: LinearHasherConfig) -> LinearHasherWitness:
    n = queries.shape[0]
    total = config.limit
    assert n <= total, "linear_hasher is single-instance (ref mod.rs:67)"
    if n != total:
        pad = LogQueries.zeros((total - n,))
        queries = LogQueries(
            *[
                jnp.concatenate([a, b])
                for a, b in zip(queries.tree_flatten()[0], pad.tree_flatten()[0])
            ]
        )
    execute = jnp.arange(total, dtype=jnp.uint32) < jnp.uint32(n)
    enc = encode_log_queries(queries)
    input_chain = queues.simulate_chain(gf.zeros((4,)), enc, execute)
    msg_bytes = serialize_l2_l1_bytes(queries)
    B = _max_blocks(total)
    blo, bhi, bex, nblocks = _build_blocks(msg_bytes, jnp.uint32(n), B)
    slo, shi = _keccak_chain(blo, bhi, bex)
    digest = digest_from_state(slo[nblocks], shi[nblocks])
    return LinearHasherWitness(
        n=jnp.uint32(n),
        execute=execute,
        queries=queries,
        encodings=enc,
        input_chain=input_chain,
        msg_bytes=msg_bytes,
        block_lo=blo,
        block_hi=bhi,
        block_execute=bex,
        state_lo=slo,
        state_hi=shi,
        digest=digest,
    )


def eval_constraints(w: LinearHasherWitness, config: LinearHasherConfig) -> dict:
    total = w.execute.shape[0]
    B = _max_blocks(total)
    enc_ok = jnp.all(gf.equal(encode_log_queries(w.queries), w.encodings), axis=-1)
    chain_ok = queues.check_chain(w.input_chain, w.encodings, w.execute)
    ser_ok = jnp.all(serialize_l2_l1_bytes(w.queries) == w.msg_bytes, axis=-1)
    # tx number must fit in 16 bits (truncated BE bytes enforced zero)
    tx_ok = jnp.where(w.execute, w.queries.tx_number_in_block < (1 << 16), True)
    blo, bhi, bex, nblocks = _build_blocks(w.msg_bytes, w.n, B)
    blocks_ok = (
        jnp.all(blo == w.block_lo, axis=-1)
        & jnp.all(bhi == w.block_hi, axis=-1)
        & (bex == w.block_execute)
    )
    # batch-parallel keccak transition check
    exp_lo, exp_hi = keccak.absorb_block(w.state_lo[:-1], w.state_hi[:-1], w.block_lo, w.block_hi)
    exp_lo = jnp.where(w.block_execute[:, None], exp_lo, w.state_lo[:-1])
    exp_hi = jnp.where(w.block_execute[:, None], exp_hi, w.state_hi[:-1])
    keccak_ok = jnp.all(
        (exp_lo == w.state_lo[1:]) & (exp_hi == w.state_hi[1:]), axis=-1
    )
    digest_ok = jnp.all(
        digest_from_state(w.state_lo[nblocks], w.state_hi[nblocks]) == w.digest
    )
    return {
        "encodings": enc_ok,
        "input_chain": chain_ok,
        "serialization": ser_ok,
        "tx_number_range": tx_ok,
        "blocks": blocks_ok,
        "keccak_chain": keccak_ok,
        "digest": digest_ok,
    }


def all_ok(residuals: dict) -> bool:
    return all(bool(np.asarray(v).all()) for v in residuals.values())


def serialize_l2_l1_ref(row: dict) -> bytes:
    """Host mirror of the 88-byte serialization."""
    out = bytearray()
    out.append(int(row.get("shard_id", 0)) & 0xFF)
    out.append(1 if row.get("is_service") else 0)
    out += int(row.get("tx_number_in_block", 0)).to_bytes(4, "big")[2:]
    out += int(row.get("address", 0)).to_bytes(20, "big")
    out += int(row.get("key", 0)).to_bytes(32, "big")
    out += int(row.get("written_value", 0)).to_bytes(32, "big")
    assert len(out) == L2_TO_L1_MESSAGE_BYTE_LENGTH
    return bytes(out)


generate_witness_jit = jax.jit(generate_witness, static_argnums=(1,))
eval_constraints_jit = jax.jit(eval_constraints, static_argnums=(1,))


def instance_compact_form(w: LinearHasherWitness, config: LinearHasherConfig):
    """Single-instance ClosedFormInput: input = queue state, output = the
    32-byte keccak hash (LinearHasherOutputData)."""
    from ..ops import gf as _gf
    from ..utils import protocol

    total = w.execute.shape[0]
    in_qs = protocol.encode_queue_state_generic(
        _gf.zeros((4,)), w.input_chain[total], w.n
    )
    digest_gf = _gf.from_u32(w.digest.astype(jnp.uint32))
    obs_in = in_qs[None]
    obs_out = digest_gf[None]
    return protocol.single_instance_compact_form(obs_in, obs_out)
