"""demux_log_queue — circuit type 4: log-queue demultiplexer.

Reference parity: `src/demux_log_queue/` (`demultiplex_storage_logs_inner`
mod.rs:234-…, `LogType` mod.rs:222-232).  Routes the VM's unified log queue
into NUM_SEPARATE_QUEUES = 6 output queues by aux_byte / precompile address:

    rollup storage   aux==STORAGE  && shard_id == 0 (porter shard FORBIDDEN)
    events           aux==EVENT
    L1 messages      aux==L1_MESSAGE
    keccak calls     aux==PRECOMPILE && address == keccak formal address
    sha256 calls     aux==PRECOMPILE && address == sha256 formal address
    ecrecover calls  aux==PRECOMPILE && address == ecrecover formal address

All routing decisions are row-parallel; the 6 output tails are sponge chains
over the same 20-element encodings with per-queue execute masks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..base_structures.log_query import LogQueries, encode_log_queries
from ..isa.system_params import (
    ECRECOVER_PRECOMPILE_FORMAL_ADDRESS,
    EVENT_AUX_BYTE,
    KECCAK256_PRECOMPILE_FORMAL_ADDRESS,
    L1_MESSAGE_AUX_BYTE,
    PRECOMPILE_AUX_BYTE,
    SHA256_PRECOMPILE_FORMAL_ADDRESS,
    STORAGE_AUX_BYTE,
)
from ..ops import gf, queues
from ..ops.gf import GF
from ..ops.queues import QueueState

NUM_SEPARATE_QUEUES = 6
QUEUE_NAMES = (
    "rollup_storage",
    "events",
    "l1_messages",
    "keccak",
    "sha256",
    "ecrecover",
)


@dataclasses.dataclass(frozen=True)
class DemuxConfig:
    limit: int


def _address_equals(addr: jnp.ndarray, const: int) -> jnp.ndarray:
    limbs = [(const >> (32 * i)) & 0xFFFFFFFF for i in range(5)]
    ok = jnp.ones(addr.shape[:-1], dtype=bool)
    for i, l in enumerate(limbs):
        ok = ok & (addr[..., i] == jnp.uint32(l))
    return ok


def route_flags(q: LogQueries, execute: jnp.ndarray) -> dict:
    """Per-row routing masks + the porter-forbidden residual."""
    aux = q.aux_byte
    is_storage = aux == jnp.uint32(STORAGE_AUX_BYTE)
    is_event = aux == jnp.uint32(EVENT_AUX_BYTE)
    is_l1 = aux == jnp.uint32(L1_MESSAGE_AUX_BYTE)
    is_precompile = aux == jnp.uint32(PRECOMPILE_AUX_BYTE)
    is_rollup_shard = q.shard_id == 0
    flags = {
        "rollup_storage": execute & is_storage & is_rollup_shard,
        "events": execute & is_event,
        "l1_messages": execute & is_l1,
        "keccak": execute
        & is_precompile
        & _address_equals(q.address, KECCAK256_PRECOMPILE_FORMAL_ADDRESS),
        "sha256": execute
        & is_precompile
        & _address_equals(q.address, SHA256_PRECOMPILE_FORMAL_ADDRESS),
        "ecrecover": execute
        & is_precompile
        & _address_equals(q.address, ECRECOVER_PRECOMPILE_FORMAL_ADDRESS),
    }
    porter_forbidden = ~(execute & is_storage & ~is_rollup_shard)
    return flags, porter_forbidden


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DemuxWitness:
    n: jnp.ndarray
    execute: jnp.ndarray
    queries: LogQueries  # (N,)
    encodings: GF  # (N, 20)
    input_chain: GF  # (N+1, 4)
    out_flags: dict  # name -> (N,) bool
    out_chains: dict  # name -> (N+1, 4)
    out_counts: dict  # name -> (N,) u32

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def generate_witness(queries: LogQueries, config: DemuxConfig) -> DemuxWitness:
    n = queries.shape[0]
    num_instances = max(1, -(-n // config.limit))
    total = num_instances * config.limit
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
    init4 = gf.zeros((4,))
    input_chain = queues.simulate_chain(init4, enc, execute)
    flags, _ = route_flags(queries, execute)
    out_chains = {
        name: queues.simulate_chain(init4, enc, flags[name]) for name in QUEUE_NAMES
    }
    out_counts = {
        name: jnp.cumsum(flags[name].astype(jnp.uint32), dtype=jnp.uint32)
        for name in QUEUE_NAMES
    }
    return DemuxWitness(
        n=jnp.uint32(n),
        execute=execute,
        queries=queries,
        encodings=enc,
        input_chain=input_chain,
        out_flags=flags,
        out_chains=out_chains,
        out_counts=out_counts,
    )


def eval_constraints(w: DemuxWitness, config: DemuxConfig) -> dict:
    total = w.execute.shape[0]
    enc_ok = jnp.all(gf.equal(encode_log_queries(w.queries), w.encodings), axis=-1)
    input_chain_ok = queues.check_chain(w.input_chain, w.encodings, w.execute)
    flags, porter_ok = route_flags(w.queries, w.execute)
    res = {
        "encodings": enc_ok,
        "input_chain": input_chain_ok,
        "porter_forbidden": porter_ok,
    }
    # each executed row routes to exactly one queue or none (plain log types)
    total_routed = jnp.zeros(total, dtype=jnp.uint32)
    for name in QUEUE_NAMES:
        res[f"flags_{name}"] = flags[name] == w.out_flags[name]
        res[f"chain_{name}"] = queues.check_chain(
            w.out_chains[name], w.encodings, w.out_flags[name]
        )
        prev = jnp.concatenate([jnp.zeros((1,), jnp.uint32), w.out_counts[name][:-1]])
        res[f"count_{name}"] = w.out_counts[name] == prev + w.out_flags[name].astype(
            jnp.uint32
        )
        total_routed = total_routed + flags[name].astype(jnp.uint32)
    res["at_most_one_route"] = total_routed <= 1
    return res


def all_ok(residuals: dict) -> bool:
    return all(bool(np.asarray(v).all()) for v in residuals.values())


def output_queue_states(w: DemuxWitness) -> dict:
    total = w.execute.shape[0]
    return {
        name: QueueState(
            gf.zeros((4,)), w.out_chains[name][total], w.out_counts[name][total - 1]
        )
        for name in QUEUE_NAMES
    }


generate_witness_jit = jax.jit(generate_witness, static_argnums=(1,))
eval_constraints_jit = jax.jit(eval_constraints, static_argnums=(1,))


def instance_compact_form(w: DemuxWitness, config: DemuxConfig):
    """Single-instance ClosedFormInput: input = the unified log queue state,
    output = the 6 demuxed queue states (ref demux input.rs)."""
    from ..utils import protocol

    total = w.execute.shape[0]
    in_qs = protocol.encode_queue_state_generic(
        gf.zeros((4,)), w.input_chain[total], w.n
    )
    outs = []
    for name in QUEUE_NAMES:
        outs.append(
            protocol.encode_queue_state_generic(
                gf.zeros((4,)), w.out_chains[name][total], w.out_counts[name][total - 1]
            )
        )
    obs_in = in_qs[None]
    obs_out = gf.concat(outs, axis=-1)[None]
    return protocol.single_instance_compact_form(obs_in, obs_out)
