"""MemoryQuery: the memory-queue element type, structure-of-arrays.

Reference parity: `src/base_structures/memory_query/mod.rs` —
fields {timestamp, memory_page, index, rw_flag, is_ptr, value:u256} (:30-37),
packed to MEMORY_QUERY_PACKED_WIDTH = 8 field elements (:26) with the exact
byte-decomposition layout of (:103-221):

    v0 = timestamp
    v1 = memory_page
    v2 = index + rw_flag * 2^32 + is_ptr * 2^33
    v3 = value[0] + b5_0 * 2^32 + b5_1 * 2^40 + b5_2 * 2^48
    v4 = value[1] + b5_3 * 2^32 + b6_0 * 2^40 + b6_1 * 2^48
    v5 = value[2] + b6_2 * 2^32 + b6_3 * 2^40 + b7_0 * 2^48
    v6 = value[3] + b7_1 * 2^32 + b7_2 * 2^40 + b7_3 * 2^48
    v7 = value[4]

where value is 8 little-endian u32 limbs and bK_j is byte j (LE) of limb K.
All packed elements are < 2^56 (< p), so the GF limbs are formed directly
with no modular reduction — bit-exact by construction.

TPU design: a batch of queries is a pytree of u32/bool arrays; encoding is a
handful of elementwise shifts/ors — fuses into the Poseidon2 absorb.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gf
from ..ops.gf import GF

MEMORY_QUERY_PACKED_WIDTH = 8
MEMORY_QUERY_UNROLLED_WIDTH = 13


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MemoryQueries:
    """SoA batch of memory queries (leading axes arbitrary)."""

    timestamp: jnp.ndarray  # u32
    memory_page: jnp.ndarray  # u32
    index: jnp.ndarray  # u32
    rw_flag: jnp.ndarray  # bool
    is_ptr: jnp.ndarray  # bool
    value: jnp.ndarray  # (..., 8) u32 little-endian limbs

    def tree_flatten(self):
        return (
            self.timestamp,
            self.memory_page,
            self.index,
            self.rw_flag,
            self.is_ptr,
            self.value,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.timestamp.shape

    def __getitem__(self, idx) -> "MemoryQueries":
        return MemoryQueries(
            self.timestamp[idx],
            self.memory_page[idx],
            self.index[idx],
            self.rw_flag[idx],
            self.is_ptr[idx],
            self.value[idx],
        )

    @staticmethod
    def from_lists(rows) -> "MemoryQueries":
        """rows: iterable of dicts with keys timestamp/memory_page/index/
        rw_flag/is_ptr/value (value as python int < 2^256)."""
        rows = list(rows)
        if not rows:
            return MemoryQueries.zeros((0,))
        ts, pg, ix, rw, ptr, vals = [], [], [], [], [], []
        for r in rows:
            ts.append(r["timestamp"])
            pg.append(r["memory_page"])
            ix.append(r["index"])
            rw.append(bool(r["rw_flag"]))
            ptr.append(bool(r["is_ptr"]))
            v = int(r["value"])
            vals.append([(v >> (32 * k)) & 0xFFFFFFFF for k in range(8)])
        return MemoryQueries(
            jnp.asarray(np.array(ts, dtype=np.uint32)),
            jnp.asarray(np.array(pg, dtype=np.uint32)),
            jnp.asarray(np.array(ix, dtype=np.uint32)),
            jnp.asarray(np.array(rw, dtype=bool)),
            jnp.asarray(np.array(ptr, dtype=bool)),
            jnp.asarray(np.array(vals, dtype=np.uint32)),
        )

    @staticmethod
    def zeros(shape) -> "MemoryQueries":
        z = jnp.zeros(shape, dtype=jnp.uint32)
        b = jnp.zeros(shape, dtype=bool)
        return MemoryQueries(z, z, z, b, b, jnp.zeros(tuple(shape) + (8,), dtype=jnp.uint32))


def _byte(x: jnp.ndarray, j: int) -> jnp.ndarray:
    return (x >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)


def encode_memory_queries(q: MemoryQueries) -> GF:
    """Pack to 8 field elements per query (exact reference layout)."""
    zero = jnp.zeros_like(q.timestamp)
    v5, v6, v7 = q.value[..., 5], q.value[..., 6], q.value[..., 7]
    rw = q.rw_flag.astype(jnp.uint32)
    ptr = q.is_ptr.astype(jnp.uint32)

    lanes = [
        GF(q.timestamp, zero),
        GF(q.memory_page, zero),
        GF(q.index, rw | (ptr << 1)),
        GF(q.value[..., 0], _byte(v5, 0) | (_byte(v5, 1) << 8) | (_byte(v5, 2) << 16)),
        GF(q.value[..., 1], _byte(v5, 3) | (_byte(v6, 0) << 8) | (_byte(v6, 1) << 16)),
        GF(q.value[..., 2], _byte(v6, 2) | (_byte(v6, 3) << 8) | (_byte(v7, 0) << 16)),
        GF(q.value[..., 3], _byte(v7, 1) | (_byte(v7, 2) << 8) | (_byte(v7, 3) << 16)),
        GF(q.value[..., 4], zero),
    ]
    return gf.stack(lanes, axis=-1)


def encode_memory_queries_np(
    timestamp: np.ndarray,
    memory_page: np.ndarray,
    index: np.ndarray,
    rw_flag: np.ndarray,
    is_ptr: np.ndarray,
    value: np.ndarray,
) -> np.ndarray:
    """Vectorized host-side packing (numpy u64) — bit-identical to
    encode_memory_queries; used by the native witness pipeline to avoid a
    device round-trip for encoding."""
    ts = timestamp.astype(np.uint64)
    pg = memory_page.astype(np.uint64)
    ix = index.astype(np.uint64)
    rw = rw_flag.astype(np.uint64)
    ptr = is_ptr.astype(np.uint64)
    v = value.astype(np.uint64)  # (..., 8)

    def byte(limb, j):
        return (v[..., limb] >> np.uint64(8 * j)) & np.uint64(0xFF)

    out = np.empty(ts.shape + (8,), dtype=np.uint64)
    out[..., 0] = ts
    out[..., 1] = pg
    out[..., 2] = ix | (rw << np.uint64(32)) | (ptr << np.uint64(33))
    out[..., 3] = v[..., 0] | (byte(5, 0) << np.uint64(32)) | (byte(5, 1) << np.uint64(40)) | (byte(5, 2) << np.uint64(48))
    out[..., 4] = v[..., 1] | (byte(5, 3) << np.uint64(32)) | (byte(6, 0) << np.uint64(40)) | (byte(6, 1) << np.uint64(48))
    out[..., 5] = v[..., 2] | (byte(6, 2) << np.uint64(32)) | (byte(6, 3) << np.uint64(40)) | (byte(7, 0) << np.uint64(48))
    out[..., 6] = v[..., 3] | (byte(7, 1) << np.uint64(32)) | (byte(7, 2) << np.uint64(40)) | (byte(7, 3) << np.uint64(48))
    out[..., 7] = v[..., 4]
    return out


def encode_memory_query_ref(row: dict) -> list:
    """Host mirror of the packing for golden tests."""
    v = int(row["value"])
    limbs = [(v >> (32 * k)) & 0xFFFFFFFF for k in range(8)]

    def byte(limb, j):
        return (limbs[limb] >> (8 * j)) & 0xFF

    return [
        row["timestamp"],
        row["memory_page"],
        row["index"] + (int(bool(row["rw_flag"])) << 32) + (int(bool(row["is_ptr"])) << 33),
        limbs[0] + (byte(5, 0) << 32) + (byte(5, 1) << 40) + (byte(5, 2) << 48),
        limbs[1] + (byte(5, 3) << 32) + (byte(6, 0) << 40) + (byte(6, 1) << 48),
        limbs[2] + (byte(6, 2) << 32) + (byte(6, 3) << 40) + (byte(7, 0) << 48),
        limbs[3] + (byte(7, 1) << 32) + (byte(7, 2) << 40) + (byte(7, 3) << 48),
        limbs[4],
    ]
