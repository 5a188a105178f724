"""storage_application — circuit type 10: Merkle-tree storage applicator.

Reference parity: `src/storage_application/` (entry mod.rs:267-720) and
`src/base_structures/state_diff_record/mod.rs`.  Semantics replicated:

  * depth-256 binary Merkle tree of blake2s nodes (STORAGE_DEPTH = 256,
    input.rs:24); derived key = blake2s(0^12 || address_be || key_be)
    (mod.rs:433-439); path bits taken LSB-first from the derived key bytes.
  * leaf = blake2s(enumeration_index_bytes(8: high_be||low_be) || value_be)
    (mod.rs:523-570).
  * each query runs a read stage (path must recompute the current root) and,
    for writes, a write stage with the written value re-rooting the tree
    (mod.rs:583-600).
  * enumeration indices: reads carry a witness index; a write to a fresh
    slot (index 0) is assigned next_enumeration_counter, which increments
    (mod.rs:448-478).
  * per write, a 156-byte StateDiffRecord
    [address|key|derived_key|enum_index|initial|final] is keccak-absorbed
    over 2 rate blocks (state_diff_record/mod.rs:15-16); a final 0x01/0x80
    padding block closes the accumulator and the digest is exposed
    (mod.rs:662-689).

TPU design: rows = stages (1 per read, 2 per write).  All 256 path levels of
all rows are checked by ONE batched blake2s over (rows x 256) nodes; the
root/counter/keccak chains are materialized columns checked row-parallel.
Host-side witness generation (python mirrors).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..base_structures.log_query import LogQueries, encode_log_queries
from ..isa.system_params import STORAGE_AUX_BYTE
from ..ops import blake2s, gf, keccak, queues
from ..ops.gf import GF

STORAGE_DEPTH = 256
STATE_DIFF_RECORD_BYTE_ENCODING_LEN = 156
RATE = keccak.KECCAK_RATE_BYTES


@dataclasses.dataclass(frozen=True)
class StorageApplicationConfig:
    max_rows: int  # stage rows (reads + 2x writes)
    shard: int = 0


# ---------------------------------------------------------------------------
# host helpers (witness generation + an out-of-circuit sparse tree)
# ---------------------------------------------------------------------------


def derive_key_ref(address: int, key: int) -> bytes:
    data = b"\x00" * 12 + address.to_bytes(20, "big") + key.to_bytes(32, "big")
    return blake2s.blake2s_ref(data)


def leaf_hash_ref(enum_index: int, value: int) -> bytes:
    idx_bytes = (enum_index >> 32).to_bytes(4, "big") + (enum_index & 0xFFFFFFFF).to_bytes(4, "big")
    return blake2s.blake2s_ref(idx_bytes + value.to_bytes(32, "big"))


def path_bits(derived_key: bytes):
    return [(derived_key[i // 8] >> (i % 8)) & 1 for i in range(STORAGE_DEPTH)]


class SparseStorageTree:
    """Out-of-circuit depth-256 sparse Merkle tree (witness/test oracle).

    A leaf position is the 256-bit integer formed LSB-first from the derived
    key's path bits; a node at level L has id = position >> L and children
    ids (2*id | b) where b is path bit L-1 — bit b = 0 is the LEFT child
    (the circuit places `current` on the right when the bit is 1).
    """

    def __init__(self):
        self.empty = [leaf_hash_ref(0, 0)]
        for _ in range(STORAGE_DEPTH):
            self.empty.append(blake2s.blake2s_ref(self.empty[-1] + self.empty[-1]))
        self.leaves = {}  # position int -> (enum_index, value)

    @staticmethod
    def position(bits) -> int:
        p = 0
        for i, b in enumerate(bits):
            p |= int(b) << i
        return p

    def set_leaf(self, bits, enum_index: int, value: int):
        self.leaves[self.position(bits)] = (enum_index, value)

    def _node(self, level: int, node_id: int) -> bytes:
        members = [p for p in self.leaves if (p >> level) == node_id]
        if not members:
            return self.empty[level]
        if level == 0:
            return leaf_hash_ref(*self.leaves[node_id])
        lo = self._node(level - 1, node_id << 1)
        hi = self._node(level - 1, (node_id << 1) | 1)
        return blake2s.blake2s_ref(lo + hi)

    def root(self) -> bytes:
        return self._node(STORAGE_DEPTH, 0)

    def path(self, bits) -> list:
        """sibling hashes bottom-up (level 0 first)."""
        p = self.position(bits)
        return [self._node(l, (p >> l) ^ 1) for l in range(STORAGE_DEPTH)]


def apply_path_ref(leaf_hash: bytes, bits, path: list) -> bytes:
    """climb from leaf to root (circuit mod.rs:572-582)."""
    cur = leaf_hash
    for b, sib in zip(bits, path):
        left, right = (sib, cur) if b else (cur, sib)
        cur = blake2s.blake2s_ref(left + right)
    return cur


def state_diff_bytes_ref(address, key, derived_key, enum_index, initial, final):
    out = (
        address.to_bytes(20, "big")
        + key.to_bytes(32, "big")
        + derived_key
        + (enum_index >> 32).to_bytes(4, "big")
        + (enum_index & 0xFFFFFFFF).to_bytes(4, "big")
        + initial.to_bytes(32, "big")
        + final.to_bytes(32, "big")
    )
    assert len(out) == STATE_DIFF_RECORD_BYTE_ENCODING_LEN
    return out


def _bytes_to_words_le(data: bytes) -> list:
    return [int.from_bytes(data[4 * i : 4 * i + 4], "little") for i in range(len(data) // 4)]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class StorageApplicationWitness:
    num_queries: jnp.ndarray
    queries: LogQueries  # (Q,)
    query_execute: jnp.ndarray
    query_chain: GF  # (Q+1, 4)
    derived_keys: jnp.ndarray  # (Q, 8) u32 LE words of the 32 derived-key bytes
    read_indices: jnp.ndarray  # (Q, 2) u32 (lo, hi) witness enumeration index
    # stage rows (N = max_rows)
    row_execute: jnp.ndarray  # (N,)
    row_query: jnp.ndarray  # (N,)
    row_is_write_stage: jnp.ndarray  # (N,)
    row_leaf_index: jnp.ndarray  # (N, 2) u32 (lo, hi) index used for the leaf
    row_leaf_value: jnp.ndarray  # (N, 8) u32 LE words of the 32 BE value bytes
    row_path: jnp.ndarray  # (N, 256, 8) u32 LE words of sibling hashes
    row_nodes: jnp.ndarray  # (N, 257, 8) u32 LE words: leaf hash -> root
    roots: jnp.ndarray  # (N+1, 8) u32 LE words of the tree root
    counters: jnp.ndarray  # (N+1, 2) u32 next_enumeration_counter (lo, hi)
    # state-diff keccak accumulator
    diff_blocks_lo: jnp.ndarray  # (B, 17)
    diff_blocks_hi: jnp.ndarray  # (B, 17)
    diff_block_execute: jnp.ndarray  # (B,)
    diff_states_lo: jnp.ndarray  # (B+1, 25)
    diff_states_hi: jnp.ndarray
    diffs_digest: jnp.ndarray  # (32,) bytes

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def generate_witness(
    queries: list,
    tree: SparseStorageTree,
    initial_counter: int,
    config: StorageApplicationConfig,
) -> StorageApplicationWitness:
    """queries: LogQuery dicts (deduplicated, sorted storage accesses).
    `tree` is mutated as writes are applied (it is the backing state)."""
    Q = max(len(queries), 1)
    N = config.max_rows

    rows = []
    diff_records = []
    counter = initial_counter
    counters = [counter]
    roots = [tree.root()]
    derived_list = []
    read_idx_list = []
    for qi, q in enumerate(queries):
        addr, key = int(q["address"]), int(q["key"])
        rv, wv = int(q["read_value"]), int(q["written_value"])
        dk = derive_key_ref(addr, key)
        bits = path_bits(dk)
        derived_list.append(dk)
        pos = tree.position(bits)
        existing = tree.leaves.get(pos)
        read_index = existing[0] if existing else 0
        read_idx_list.append(read_index)
        path = tree.path(bits)
        # read stage
        rows.append(
            dict(query=qi, write=False, leaf_index=read_index, leaf_value=rv,
                 path=path, nodes=None)
        )
        roots.append(roots[-1])
        counters.append(counter)
        if q["rw_flag"]:
            # write stage: maybe assign a fresh index
            if read_index == 0:
                idx = counter
                counter += 1
            else:
                idx = read_index
            tree.set_leaf(bits, idx, wv)
            rows.append(
                dict(query=qi, write=True, leaf_index=idx, leaf_value=wv,
                     path=path, nodes=None)
            )
            roots.append(tree.root())
            counters.append(counter)
            diff_records.append(
                state_diff_bytes_ref(addr, key, dk, read_index, rv, wv)
            )
    assert len(rows) <= N, (len(rows), N)

    # materialize per-row node chains
    row_nodes = np.zeros((N, STORAGE_DEPTH + 1, 8), np.uint32)
    row_path = np.zeros((N, STORAGE_DEPTH, 8), np.uint32)
    row_leaf_index = np.zeros((N, 2), np.uint32)
    row_leaf_value = np.zeros((N, 8), np.uint32)
    row_query = np.zeros(N, np.int32)
    row_write = np.zeros(N, bool)
    row_exec = np.zeros(N, bool)
    for i, r in enumerate(rows):
        dk = derived_list[r["query"]]
        bits = path_bits(dk)
        leaf = leaf_hash_ref(r["leaf_index"], r["leaf_value"])
        nodes = [leaf]
        for b, sib in zip(bits, r["path"]):
            left, right = (sib, nodes[-1]) if b else (nodes[-1], sib)
            nodes.append(blake2s.blake2s_ref(left + right))
        for l in range(STORAGE_DEPTH + 1):
            row_nodes[i, l] = _bytes_to_words_le(nodes[l])
        for l in range(STORAGE_DEPTH):
            row_path[i, l] = _bytes_to_words_le(r["path"][l])
        row_leaf_index[i] = [r["leaf_index"] & 0xFFFFFFFF, r["leaf_index"] >> 32]
        row_leaf_value[i] = _bytes_to_words_le(r["leaf_value"].to_bytes(32, "big"))
        row_query[i] = r["query"]
        row_write[i] = r["write"]
        row_exec[i] = True

    roots_np = np.zeros((N + 1, 8), np.uint32)
    counters_np = np.zeros((N + 1, 2), np.uint32)
    for i in range(N + 1):
        src_root = roots[min(i, len(roots) - 1)]
        roots_np[i] = _bytes_to_words_le(src_root)
        c = counters[min(i, len(counters) - 1)]
        counters_np[i] = [c & 0xFFFFFFFF, c >> 32]

    # keccak accumulator over diff records (2 blocks each) + final padding
    B = 2 * max(len(queries), 1) + 1
    blocks = []
    for rec in diff_records:
        ext = rec + b"\x00" * (2 * RATE - len(rec))
        blocks.append(ext[:RATE])
        blocks.append(ext[RATE:])
    pad = bytearray(RATE)
    pad[0] = 0x01
    pad[RATE - 1] = 0x80
    blocks.append(bytes(pad))
    bexec = np.zeros(B, bool)
    blo = np.zeros((B, 17), np.uint32)
    bhi = np.zeros((B, 17), np.uint32)
    states = np.zeros((B + 1, 25), np.uint64)
    cur = [0] * 25
    for b, blk in enumerate(blocks):
        lanes = keccak.bytes_to_lanes(blk)
        cur = keccak.keccak_f1600_ref([cur[j] ^ (lanes[j] if j < 17 else 0) for j in range(25)])
        states[b + 1] = cur
        blo[b] = [l & 0xFFFFFFFF for l in lanes]
        bhi[b] = [l >> 32 for l in lanes]
        bexec[b] = True
    digest = b"".join(int(states[len(blocks)][j]).to_bytes(8, "little") for j in range(4))

    qpad = list(queries) + [
        dict(address=0, key=0, read_value=0, written_value=0, aux_byte=STORAGE_AUX_BYTE,
             rw_flag=False, rollback=False, is_service=False, shard_id=config.shard,
             tx_number_in_block=0, timestamp=0)
    ] * (Q - len(queries))
    queries_q = LogQueries.from_lists(qpad)
    q_exec = np.arange(Q) < len(queries)
    q_enc = encode_log_queries(queries_q)
    q_chain = queues.simulate_chain(gf.zeros((4,)), q_enc, jnp.asarray(q_exec))

    dk_np = np.zeros((Q, 8), np.uint32)
    ri_np = np.zeros((Q, 2), np.uint32)
    for i in range(len(queries)):
        dk_np[i] = _bytes_to_words_le(derived_list[i])
        ri_np[i] = [read_idx_list[i] & 0xFFFFFFFF, read_idx_list[i] >> 32]

    return StorageApplicationWitness(
        num_queries=jnp.uint32(len(queries)),
        queries=queries_q,
        query_execute=jnp.asarray(q_exec),
        query_chain=q_chain,
        derived_keys=jnp.asarray(dk_np),
        read_indices=jnp.asarray(ri_np),
        row_execute=jnp.asarray(row_exec),
        row_query=jnp.asarray(row_query),
        row_is_write_stage=jnp.asarray(row_write),
        row_leaf_index=jnp.asarray(row_leaf_index),
        row_leaf_value=jnp.asarray(row_leaf_value),
        row_path=jnp.asarray(row_path),
        row_nodes=jnp.asarray(row_nodes),
        roots=jnp.asarray(roots_np),
        counters=jnp.asarray(counters_np),
        diff_blocks_lo=jnp.asarray(blo),
        diff_blocks_hi=jnp.asarray(bhi),
        diff_block_execute=jnp.asarray(bexec),
        diff_states_lo=jnp.asarray((states & 0xFFFFFFFF).astype(np.uint32)),
        diff_states_hi=jnp.asarray((states >> 32).astype(np.uint32)),
        diffs_digest=jnp.asarray(np.frombuffer(digest, np.uint8).astype(np.uint32)),
    )


def blake2s_calls(w: "StorageApplicationWitness"):
    """Plaintext (messages, digests) of every blake2s invocation the
    executed stage rows perform — derived keys (ref mod.rs:433-439), leaf
    hashes (mod.rs:523-570) and all 256 path levels per stage
    (mod.rs:390-400) — deduplicated, for the batched single-block
    compression STARK (prover/blake2s_air.py).  Deterministic in the
    witness, so prover and verifier derive the SAME list."""

    def wb(ws) -> bytes:
        return b"".join(int(x).to_bytes(4, "little") for x in np.asarray(ws))

    seen = set()

    def put(msg: bytes, dig: bytes):
        # dedup identical (message, digest) pairs; distinct digests for one
        # message are both kept — the STARK refutes the forged one
        if (msg, dig) in seen:
            return
        seen.add((msg, dig))
        msgs.append(msg)
        digs.append(dig)

    msgs, digs = [], []
    Q = int(np.asarray(w.num_queries))
    addr_l = np.asarray(w.queries.address, np.uint64)
    key_l = np.asarray(w.queries.key, np.uint64)
    dks = np.asarray(w.derived_keys)
    dk_bytes = {}
    for qi in range(Q):
        addr = sum(int(addr_l[qi, j]) << (32 * j) for j in range(5))
        key = sum(int(key_l[qi, j]) << (32 * j) for j in range(8))
        dk_bytes[qi] = wb(dks[qi])
        put(b"\x00" * 12 + addr.to_bytes(20, "big") + key.to_bytes(32, "big"),
            dk_bytes[qi])
    rex = np.asarray(w.row_execute)
    rq = np.asarray(w.row_query)
    ridx = np.asarray(w.row_leaf_index, np.uint64)
    rval = np.asarray(w.row_leaf_value)
    rpath = np.asarray(w.row_path)
    rnodes = np.asarray(w.row_nodes)
    for i in range(rex.shape[0]):
        if not rex[i]:
            continue
        idx = int(ridx[i, 0]) | (int(ridx[i, 1]) << 32)
        leaf_msg = ((idx >> 32).to_bytes(4, "big")
                    + (idx & 0xFFFFFFFF).to_bytes(4, "big") + wb(rval[i]))
        put(leaf_msg, wb(rnodes[i, 0]))
        bits = path_bits(dk_bytes[int(rq[i])])
        for l in range(STORAGE_DEPTH):
            node = wb(rnodes[i, l])
            sib = wb(rpath[i, l])
            left, right = (sib, node) if bits[l] else (node, sib)
            put(left + right, wb(rnodes[i, l + 1]))
    return msgs, digs


def _blake2s_fixed(m_words: jnp.ndarray, nbytes: int) -> jnp.ndarray:
    """blake2s of a single sub-64-byte block: m_words (..., 16) LE u32."""
    h = blake2s.initial_state(m_words.shape[:-1])
    return blake2s.compress(h, m_words, nbytes, True)


def _be_value_words(value_limbs: jnp.ndarray) -> jnp.ndarray:
    """u256 LE limbs -> LE words of the 32 BE bytes."""
    def bswap(x):
        return (
            ((x & 0xFF) << 24) | ((x & 0xFF00) << 8) | ((x >> 8) & 0xFF00) | (x >> 24)
        )
    return bswap(value_limbs[..., ::-1])


def eval_constraints(w: StorageApplicationWitness, config: StorageApplicationConfig) -> dict:
    N = config.max_rows
    res = {}
    q = w.queries

    q_enc = encode_log_queries(q)
    res["query_chain"] = queues.check_chain(w.query_chain, q_enc, w.query_execute)
    res["shard_and_aux"] = jnp.where(
        w.query_execute,
        (q.shard_id == jnp.uint32(config.shard))
        & (q.aux_byte == jnp.uint32(STORAGE_AUX_BYTE)),
        True,
    )

    # derived key = blake2s(0^12 || addr_be || key_be) — 64-byte message
    addr_be = _be_addr_bytes_words(q.address)
    key_words = _be_value_words(q.key)
    dk_msg = jnp.concatenate(
        [jnp.zeros(q.shape + (3,), jnp.uint32), addr_be, key_words], axis=-1
    )
    dk = blake2s.compress(blake2s.initial_state(q.shape), dk_msg, 64, True)
    res["derived_key"] = jnp.where(
        w.query_execute, (dk == w.derived_keys).all(axis=-1), True
    )

    # leaf hashes: blake2s over 40 bytes [idx_hi_be, idx_lo_be, value_be]
    def bswap(x):
        return (((x & 0xFF) << 24) | ((x & 0xFF00) << 8) | ((x >> 8) & 0xFF00) | (x >> 24))

    leaf_msg = jnp.concatenate(
        [
            bswap(w.row_leaf_index[:, 1])[:, None],
            bswap(w.row_leaf_index[:, 0])[:, None],
            w.row_leaf_value,
            jnp.zeros((N, 6), jnp.uint32),
        ],
        axis=-1,
    )
    leaf_hash = _blake2s_fixed(leaf_msg, 40)
    res["leaf_hash"] = jnp.where(
        w.row_execute, (leaf_hash == w.row_nodes[:, 0]).all(axis=-1), True
    )

    # path climb: one batched blake2s over (N*256) nodes
    dkq = w.derived_keys[w.row_query]  # (N, 8)
    lvl = jnp.arange(STORAGE_DEPTH)
    byte_idx = lvl // 8
    word_idx = byte_idx // 4
    shift = (byte_idx % 4) * 8 + (lvl % 8)
    bits = (dkq[:, word_idx] >> shift.astype(jnp.uint32)) & 1  # (N, 256)
    cur = w.row_nodes[:, :-1]  # (N, 256, 8)
    sib = w.row_path  # (N, 256, 8)
    left = jnp.where(bits[..., None] == 1, sib, cur)
    right = jnp.where(bits[..., None] == 1, cur, sib)
    node_msg = jnp.concatenate([left, right], axis=-1).reshape(-1, 16)
    parent = _blake2s_fixed(node_msg, 64).reshape(N, STORAGE_DEPTH, 8)
    res["merkle_path"] = jnp.where(
        w.row_execute[:, None],
        (parent == w.row_nodes[:, 1:]).all(axis=-1),
        True,
    ).all(axis=-1)

    # roots: read rows must reproduce the running root; write rows re-root
    computed_root = w.row_nodes[:, STORAGE_DEPTH]
    res["read_root_match"] = jnp.where(
        w.row_execute & ~w.row_is_write_stage,
        (computed_root == w.roots[:-1]).all(axis=-1),
        True,
    )
    next_root = jnp.where(
        (w.row_execute & w.row_is_write_stage)[:, None], computed_root, w.roots[:-1]
    )
    res["root_chain"] = (next_root == w.roots[1:]).all(axis=-1)

    # stage structure: write rows follow their read rows with same query/path
    prev_q = jnp.concatenate([jnp.array([-1], jnp.int32), w.row_query[:-1]])
    prev_w = jnp.concatenate([jnp.array([False]), w.row_is_write_stage[:-1]])
    res["write_follows_read"] = jnp.where(
        w.row_execute & w.row_is_write_stage,
        (w.row_query == prev_q) & (~prev_w),
        True,
    )
    prev_path = jnp.concatenate([jnp.zeros((1,) + w.row_path.shape[1:], jnp.uint32), w.row_path[:-1]])
    res["write_same_path"] = jnp.where(
        w.row_execute & w.row_is_write_stage,
        (w.row_path == prev_path).reshape(N, -1).all(axis=-1),
        True,
    )
    # read rows use read_value + witness read index; write rows use written
    rv_words = _be_value_words(q.read_value)[w.row_query]
    wv_words = _be_value_words(q.written_value)[w.row_query]
    expect_value = jnp.where(w.row_is_write_stage[:, None], wv_words, rv_words)
    res["leaf_values"] = jnp.where(
        w.row_execute, (expect_value == w.row_leaf_value).all(axis=-1), True
    )
    read_idx = w.read_indices[w.row_query]
    res["read_leaf_index"] = jnp.where(
        w.row_execute & ~w.row_is_write_stage,
        (w.row_leaf_index == read_idx).all(axis=-1),
        True,
    )
    # write index: fresh (read idx 0) -> counter value; else read idx;
    # counter increments exactly on fresh writes
    fresh = (read_idx == 0).all(axis=-1)
    assigned = jnp.where(fresh[:, None], w.counters[:-1], read_idx)
    res["write_leaf_index"] = jnp.where(
        w.row_execute & w.row_is_write_stage,
        (w.row_leaf_index == assigned).all(axis=-1),
        True,
    )
    inc = (w.row_execute & w.row_is_write_stage & fresh).astype(jnp.uint32)
    # 64-bit increment across (lo, hi)
    new_lo = w.counters[:-1, 0] + inc
    carry = (new_lo < w.counters[:-1, 0]).astype(jnp.uint32)
    new_hi = w.counters[:-1, 1] + carry
    res["counter_chain"] = (w.counters[1:, 0] == new_lo) & (w.counters[1:, 1] == new_hi)

    # queries must alternate correctly: every write query has both stages
    rows_per_query = jnp.zeros(q.shape[0], jnp.uint32).at[w.row_query].add(
        w.row_execute.astype(jnp.uint32), mode="drop"
    )
    expected_rows = jnp.where(q.rw_flag, 2, 1).astype(jnp.uint32)
    res["stage_counts"] = jnp.where(
        w.query_execute, rows_per_query == expected_rows, True
    )

    # keccak accumulator chain + digest
    abs_lo, abs_hi = keccak.absorb_block(
        w.diff_states_lo[:-1], w.diff_states_hi[:-1], w.diff_blocks_lo, w.diff_blocks_hi
    )
    ok = (abs_lo == w.diff_states_lo[1:]).all(axis=-1) & (
        abs_hi == w.diff_states_hi[1:]
    ).all(axis=-1)
    res["diffs_keccak_chain"] = jnp.where(w.diff_block_execute, ok, True)
    nblocks = jnp.sum(w.diff_block_execute.astype(jnp.int32))
    final_lo = w.diff_states_lo[nblocks]
    final_hi = w.diff_states_hi[nblocks]
    outs = []
    for lane in range(4):
        for part in (final_lo, final_hi):
            word = part[lane]
            for j in range(4):
                outs.append((word >> jnp.uint32(8 * j)) & jnp.uint32(0xFF))
    res["diffs_digest"] = (jnp.stack(outs) == w.diffs_digest).all()
    return res


def _be_addr_bytes_words(address_limbs: jnp.ndarray) -> jnp.ndarray:
    """u160 LE limbs -> LE words of the 20 BE bytes."""
    def bswap(x):
        return (((x & 0xFF) << 24) | ((x & 0xFF00) << 8) | ((x >> 8) & 0xFF00) | (x >> 24))
    return bswap(address_limbs[..., ::-1])


def all_ok(residuals: dict) -> bool:
    return all(bool(np.asarray(v).all()) for v in residuals.values())


eval_constraints_jit = jax.jit(eval_constraints, static_argnums=(1,))


def instance_compact_form(w: StorageApplicationWitness, config: StorageApplicationConfig):
    """Single-instance ClosedFormInput (StorageApplicationInput/OutputData:
    shard, roots, enumeration counters, queue state, diffs hash)."""
    from ..utils import protocol

    Q = w.query_execute.shape[0]
    N = w.row_execute.shape[0]
    qs = protocol.encode_queue_state_generic(
        gf.zeros((4,)), w.query_chain[Q], w.num_queries
    )
    shard = gf.full((1,), config.shard)
    root0 = gf.from_u32(w.roots[0])
    counter0 = gf.from_u32(w.counters[0])
    obs_in = gf.concat([shard, root0, counter0, qs], axis=-1)[None]
    root_final = gf.from_u32(w.roots[N])
    counter_final = gf.from_u32(w.counters[N])
    diffs = gf.from_u32(w.diffs_digest.astype(jnp.uint32))
    obs_out = gf.concat([root_final, counter_final, diffs], axis=-1)[None]
    return protocol.single_instance_compact_form(obs_in, obs_out)
