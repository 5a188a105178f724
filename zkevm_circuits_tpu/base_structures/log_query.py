"""LogQuery: the unified log-queue element, structure-of-arrays.

Reference parity: `src/base_structures/log_query/mod.rs` — 11 fields (:23-35),
LOG_QUERY_PACKED_WIDTH = 20 (:38), 3 sponge absorption rounds (:39), rollback
flag isolated at packed index 19 (ROLLBACK_PACKING_FLAG_VARIABLE_IDX, :49) so
forward/rollback packings share the first two sponge rounds.

Exact packing (:121-516), with kb[i][j] = byte j (LE) of key limb i and
ab[i][j] = byte j of address limb i:

    v0..v7  = read_value[k]    + 3 key bytes      * 2^32 / 2^40 / 2^48
              (key bytes streamed in order kb[0][0..3], kb[1][0..3], ...)
    v8..v15 = written_value[k] + remaining key bytes then address bytes
    v16     = timestamp + ab[4][0..2] * shifts
    v17     = tx_number_in_block + ab[4][3]*2^32 + aux_byte*2^40 + shard_id*2^48
    v18     = rw_flag + 2 * is_service
    v19     = rollback

All packed values < 2^56 < p => GF limbs formed directly, bit-exact.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gf
from ..ops.gf import GF

LOG_QUERY_PACKED_WIDTH = 20
LOG_QUERY_ABSORBTION_ROUNDS = 3
ROLLBACK_PACKING_FLAG_VARIABLE_IDX = 19
FLATTENED_VARIABLE_LENGTH = 36


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LogQueries:
    """SoA batch of log queries (leading axes arbitrary)."""

    address: jnp.ndarray  # (..., 5) u32 LE limbs (u160)
    key: jnp.ndarray  # (..., 8) u32
    read_value: jnp.ndarray  # (..., 8) u32
    written_value: jnp.ndarray  # (..., 8) u32
    aux_byte: jnp.ndarray  # u32 (byte range)
    rw_flag: jnp.ndarray  # bool
    rollback: jnp.ndarray  # bool
    is_service: jnp.ndarray  # bool
    shard_id: jnp.ndarray  # u32 (byte range)
    tx_number_in_block: jnp.ndarray  # u32
    timestamp: jnp.ndarray  # u32

    def tree_flatten(self):
        return (
            self.address, self.key, self.read_value, self.written_value,
            self.aux_byte, self.rw_flag, self.rollback, self.is_service,
            self.shard_id, self.tx_number_in_block, self.timestamp,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.timestamp.shape

    def __getitem__(self, idx) -> "LogQueries":
        return LogQueries(*[leaf[idx] for leaf in self.tree_flatten()[0]])

    @staticmethod
    def from_lists(rows) -> "LogQueries":
        """rows: dicts with keys address,key,read_value,written_value (ints),
        aux_byte,rw_flag,rollback,is_service,shard_id,tx_number_in_block,
        timestamp."""

        rows = list(rows)
        if not rows:
            return LogQueries.zeros((0,))

        def limbs(v, k):
            return [(int(v) >> (32 * i)) & 0xFFFFFFFF for i in range(k)]

        cols = dict(
            address=[], key=[], read_value=[], written_value=[], aux_byte=[],
            rw_flag=[], rollback=[], is_service=[], shard_id=[],
            tx_number_in_block=[], timestamp=[],
        )
        for r in rows:
            cols["address"].append(limbs(r.get("address", 0), 5))
            cols["key"].append(limbs(r.get("key", 0), 8))
            cols["read_value"].append(limbs(r.get("read_value", 0), 8))
            cols["written_value"].append(limbs(r.get("written_value", 0), 8))
            cols["aux_byte"].append(r.get("aux_byte", 0))
            cols["rw_flag"].append(bool(r.get("rw_flag", False)))
            cols["rollback"].append(bool(r.get("rollback", False)))
            cols["is_service"].append(bool(r.get("is_service", False)))
            cols["shard_id"].append(r.get("shard_id", 0))
            cols["tx_number_in_block"].append(r.get("tx_number_in_block", 0))
            cols["timestamp"].append(r.get("timestamp", 0))
        u32 = lambda k: jnp.asarray(np.array(cols[k], dtype=np.uint32))
        b = lambda k: jnp.asarray(np.array(cols[k], dtype=bool))
        return LogQueries(
            u32("address"), u32("key"), u32("read_value"), u32("written_value"),
            u32("aux_byte"), b("rw_flag"), b("rollback"), b("is_service"),
            u32("shard_id"), u32("tx_number_in_block"), u32("timestamp"),
        )

    @staticmethod
    def zeros(shape) -> "LogQueries":
        z = lambda s: jnp.zeros(s, dtype=jnp.uint32)
        b = jnp.zeros(shape, dtype=bool)
        t = tuple(shape)
        return LogQueries(
            z(t + (5,)), z(t + (8,)), z(t + (8,)), z(t + (8,)),
            z(t), b, b, b, z(t), z(t), z(t),
        )


def _byte(x: jnp.ndarray, j: int) -> jnp.ndarray:
    return (x >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)


def encode_log_queries(q: LogQueries) -> GF:
    """Pack to 20 field elements per query (exact reference layout)."""
    zero = jnp.zeros_like(q.timestamp)

    # stream of key bytes: kb[limb][byte] in limb-major LE order, 32 bytes
    def kb(i):  # i in 0..31
        return _byte(q.key[..., i // 4], i % 4)

    def ab(i):  # address bytes, i in 0..19
        return _byte(q.address[..., i // 4], i % 4)

    def hi3(b0, b1, b2):
        return b0 | (b1 << 8) | (b2 << 16)

    lanes = []
    # v0..v7: read_value limbs + key bytes 3 at a time
    for k in range(8):
        lanes.append(
            GF(q.read_value[..., k], hi3(kb(3 * k), kb(3 * k + 1), kb(3 * k + 2)))
        )
    # v8..v15: written_value limbs + key bytes 24..31 then address bytes 0..15
    stream = [kb(i) for i in range(24, 32)] + [ab(i) for i in range(16)]
    for k in range(8):
        lanes.append(
            GF(
                q.written_value[..., k],
                hi3(stream[3 * k], stream[3 * k + 1], stream[3 * k + 2]),
            )
        )
    # v16: timestamp + address bytes 16,17,18
    lanes.append(GF(q.timestamp, hi3(ab(16), ab(17), ab(18))))
    # v17: tx_number + ab[19]*2^32 + aux_byte*2^40 + shard_id*2^48
    lanes.append(GF(q.tx_number_in_block, hi3(ab(19), q.aux_byte, q.shard_id)))
    # v18: rw_flag + 2*is_service
    lanes.append(
        GF(q.rw_flag.astype(jnp.uint32) + 2 * q.is_service.astype(jnp.uint32), zero)
    )
    # v19: rollback
    lanes.append(GF(q.rollback.astype(jnp.uint32), zero))
    return gf.stack(lanes, axis=-1)


def encode_with_rollback_flag(q: LogQueries) -> GF:
    """The rollback-side packing: same encoding with element 19 forced to 1
    (`update_packing_for_rollback`, ref :52-58)."""
    enc = encode_log_queries(q)
    one = gf.ones(q.timestamp.shape)
    return gf.concat(
        [enc[..., :ROLLBACK_PACKING_FLAG_VARIABLE_IDX], gf.expand_dims(one, -1)],
        axis=-1,
    )


def encode_log_queries_np(
    address: np.ndarray,
    key: np.ndarray,
    read_value: np.ndarray,
    written_value: np.ndarray,
    aux_byte: np.ndarray,
    rw_flag: np.ndarray,
    rollback: np.ndarray,
    is_service: np.ndarray,
    shard_id: np.ndarray,
    tx_number_in_block: np.ndarray,
    timestamp: np.ndarray,
) -> np.ndarray:
    """Vectorized host-side packing (numpy u64), bit-identical to
    encode_log_queries — for the native witness pipeline."""
    key64 = key.astype(np.uint64)
    addr64 = address.astype(np.uint64)

    def kb(i):
        return (key64[..., i // 4] >> np.uint64(8 * (i % 4))) & np.uint64(0xFF)

    def ab(i):
        return (addr64[..., i // 4] >> np.uint64(8 * (i % 4))) & np.uint64(0xFF)

    def hi3(b0, b1, b2):
        return (b0 << np.uint64(32)) | (b1 << np.uint64(40)) | (b2 << np.uint64(48))

    out = np.zeros(timestamp.shape + (20,), dtype=np.uint64)
    rv = read_value.astype(np.uint64)
    wv = written_value.astype(np.uint64)
    for k in range(8):
        out[..., k] = rv[..., k] | hi3(kb(3 * k), kb(3 * k + 1), kb(3 * k + 2))
    stream = [kb(i) for i in range(24, 32)] + [ab(i) for i in range(16)]
    for k in range(8):
        out[..., 8 + k] = wv[..., k] | hi3(stream[3 * k], stream[3 * k + 1], stream[3 * k + 2])
    out[..., 16] = timestamp.astype(np.uint64) | hi3(ab(16), ab(17), ab(18))
    out[..., 17] = tx_number_in_block.astype(np.uint64) | hi3(
        ab(19), aux_byte.astype(np.uint64), shard_id.astype(np.uint64)
    )
    out[..., 18] = rw_flag.astype(np.uint64) + 2 * is_service.astype(np.uint64)
    out[..., 19] = rollback.astype(np.uint64)
    return out


def encode_log_query_ref(row: dict) -> list:
    """Host mirror of the packing for golden tests."""
    def limbs(v, k):
        return [(int(v) >> (32 * i)) & 0xFFFFFFFF for i in range(k)]

    key_l = limbs(row.get("key", 0), 8)
    addr_l = limbs(row.get("address", 0), 5)
    rv = limbs(row.get("read_value", 0), 8)
    wv = limbs(row.get("written_value", 0), 8)
    kb = [(key_l[i // 4] >> (8 * (i % 4))) & 0xFF for i in range(32)]
    ab = [(addr_l[i // 4] >> (8 * (i % 4))) & 0xFF for i in range(20)]

    def pack(base, b0, b1, b2):
        return base + (b0 << 32) + (b1 << 40) + (b2 << 48)

    out = []
    for k in range(8):
        out.append(pack(rv[k], kb[3 * k], kb[3 * k + 1], kb[3 * k + 2]))
    stream = kb[24:32] + ab[:16]
    for k in range(8):
        out.append(pack(wv[k], stream[3 * k], stream[3 * k + 1], stream[3 * k + 2]))
    out.append(pack(row.get("timestamp", 0), ab[16], ab[17], ab[18]))
    out.append(
        pack(
            row.get("tx_number_in_block", 0),
            ab[19],
            row.get("aux_byte", 0),
            row.get("shard_id", 0),
        )
    )
    out.append(int(bool(row.get("rw_flag", False))) + 2 * int(bool(row.get("is_service", False))))
    out.append(int(bool(row.get("rollback", False))))
    return out
