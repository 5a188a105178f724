"""DecommitQuery: decommit-queue element, structure-of-arrays.

Reference parity: `src/base_structures/decommit_query/mod.rs` — fields
{code_hash: u256, page, is_first, timestamp} (:22-27), packed width 8 with
the exact byte layout of (:31-110):

    v0 = code_hash[0] + pb0*2^32 + pb1*2^40 + pb2*2^48
    v1 = code_hash[1] + pb3*2^32 + tb0*2^40 + tb1*2^48
    v2 = code_hash[2] + tb2*2^32 + tb3*2^40 + is_first*2^48
    v3..v7 = code_hash[3..8]

(pbK / tbK = byte K, little-endian, of page / timestamp.)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gf
from ..ops.gf import GF

DECOMMIT_QUERY_PACKED_WIDTH = 8


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DecommitQueries:
    code_hash: jnp.ndarray  # (..., 8) u32 LE limbs
    page: jnp.ndarray  # u32
    is_first: jnp.ndarray  # bool
    timestamp: jnp.ndarray  # u32

    def tree_flatten(self):
        return (self.code_hash, self.page, self.is_first, self.timestamp), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.timestamp.shape

    def __getitem__(self, idx) -> "DecommitQueries":
        return DecommitQueries(
            self.code_hash[idx], self.page[idx], self.is_first[idx], self.timestamp[idx]
        )

    @staticmethod
    def from_lists(rows) -> "DecommitQueries":
        rows = list(rows)
        if not rows:
            return DecommitQueries.zeros((0,))
        ch, pg, fi, ts = [], [], [], []
        for r in rows:
            v = int(r["code_hash"])
            ch.append([(v >> (32 * k)) & 0xFFFFFFFF for k in range(8)])
            pg.append(r["page"])
            fi.append(bool(r.get("is_first", False)))
            ts.append(r["timestamp"])
        return DecommitQueries(
            jnp.asarray(np.array(ch, dtype=np.uint32)),
            jnp.asarray(np.array(pg, dtype=np.uint32)),
            jnp.asarray(np.array(fi, dtype=bool)),
            jnp.asarray(np.array(ts, dtype=np.uint32)),
        )

    @staticmethod
    def zeros(shape) -> "DecommitQueries":
        z = jnp.zeros(shape, dtype=jnp.uint32)
        return DecommitQueries(
            jnp.zeros(tuple(shape) + (8,), dtype=jnp.uint32),
            z,
            jnp.zeros(shape, dtype=bool),
            z,
        )


def _byte(x, j):
    return (x >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)


def encode_decommit_queries(q: DecommitQueries) -> GF:
    zero = jnp.zeros_like(q.timestamp)
    pb = [_byte(q.page, j) for j in range(4)]
    tb = [_byte(q.timestamp, j) for j in range(4)]
    fi = q.is_first.astype(jnp.uint32)
    lanes = [
        GF(q.code_hash[..., 0], pb[0] | (pb[1] << 8) | (pb[2] << 16)),
        GF(q.code_hash[..., 1], pb[3] | (tb[0] << 8) | (tb[1] << 16)),
        GF(q.code_hash[..., 2], tb[2] | (tb[3] << 8) | (fi << 16)),
    ] + [GF(q.code_hash[..., k], zero) for k in range(3, 8)]
    return gf.stack(lanes, axis=-1)


def encode_decommit_query_ref(row: dict) -> list:
    v = int(row["code_hash"])
    ch = [(v >> (32 * k)) & 0xFFFFFFFF for k in range(8)]
    pb = [(int(row["page"]) >> (8 * j)) & 0xFF for j in range(4)]
    tb = [(int(row["timestamp"]) >> (8 * j)) & 0xFF for j in range(4)]
    fi = int(bool(row.get("is_first", False)))
    return [
        ch[0] + (pb[0] << 32) + (pb[1] << 40) + (pb[2] << 48),
        ch[1] + (pb[3] << 32) + (tb[0] << 40) + (tb[1] << 48),
        ch[2] + (tb[2] << 32) + (tb[3] << 40) + (fi << 48),
        ch[3], ch[4], ch[5], ch[6], ch[7],
    ]
