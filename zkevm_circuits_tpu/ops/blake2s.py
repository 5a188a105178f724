"""blake2s compression, vectorized for TPU.

Reference-parity role: boojum's blake2s gadget, used by storage_application
for the depth-256 Merkle tree (derived key = blake2s(address||key), node
hashes — ref `src/storage_application/mod.rs:14,437-439`).

A batch of states is uint32 (..., 8); messages (..., 16) u32 LE words.
Host mirror cross-checked against hashlib.blake2s (digest_size=32, no key).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

IV = [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
      0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19]

SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
]


def _rotr(x, r):
    return (x >> jnp.uint32(r)) | (x << jnp.uint32(32 - r))


def compress(
    h: jnp.ndarray, m: jnp.ndarray, t: int, last: bool
) -> jnp.ndarray:
    """blake2s F: h (..., 8), m (..., 16) u32 LE words, t = byte counter."""
    v = [h[..., i] for i in range(8)] + [
        jnp.broadcast_to(jnp.uint32(IV[i]), h.shape[:-1]) for i in range(8)
    ]
    v[12] = v[12] ^ jnp.uint32(t & 0xFFFFFFFF)
    v[13] = v[13] ^ jnp.uint32((t >> 32) & 0xFFFFFFFF)
    if last:
        v[14] = v[14] ^ jnp.uint32(0xFFFFFFFF)

    def G(a, b, c, d, x, y):
        a = a + b + x
        d = _rotr(d ^ a, 16)
        c = c + d
        b = _rotr(b ^ c, 12)
        a = a + b + y
        d = _rotr(d ^ a, 8)
        c = c + d
        b = _rotr(b ^ c, 7)
        return a, b, c, d

    # one round body under lax.scan; per-round message words pre-gathered
    import jax
    import numpy as np

    sigma = np.asarray(SIGMA, dtype=np.int32)  # (10, 16)
    msg_rounds = jnp.moveaxis(m[..., sigma], -2, 0)  # (10, ..., 16)

    def round_body(vs, mr):
        v = list(vs)
        ms = [mr[..., i] for i in range(16)]
        v[0], v[4], v[8], v[12] = G(v[0], v[4], v[8], v[12], ms[0], ms[1])
        v[1], v[5], v[9], v[13] = G(v[1], v[5], v[9], v[13], ms[2], ms[3])
        v[2], v[6], v[10], v[14] = G(v[2], v[6], v[10], v[14], ms[4], ms[5])
        v[3], v[7], v[11], v[15] = G(v[3], v[7], v[11], v[15], ms[6], ms[7])
        v[0], v[5], v[10], v[15] = G(v[0], v[5], v[10], v[15], ms[8], ms[9])
        v[1], v[6], v[11], v[12] = G(v[1], v[6], v[11], v[12], ms[10], ms[11])
        v[2], v[7], v[8], v[13] = G(v[2], v[7], v[8], v[13], ms[12], ms[13])
        v[3], v[4], v[9], v[14] = G(v[3], v[4], v[9], v[14], ms[14], ms[15])
        return tuple(v), None

    vs, _ = jax.lax.scan(round_body, tuple(v), msg_rounds)
    v = list(vs)
    return jnp.stack(
        [h[..., i] ^ v[i] ^ v[i + 8] for i in range(8)], axis=-1
    )


def initial_state(batch_shape=(), digest_size: int = 32) -> jnp.ndarray:
    import numpy as np

    h = np.array(IV, dtype=np.uint32).copy()
    # parameter block: digest_size, key=0, fanout=1, depth=1
    h[0] ^= np.uint32(0x01010000 ^ digest_size)
    return jnp.broadcast_to(jnp.asarray(h), tuple(batch_shape) + (8,))


# ---------------------------------------------------------------------------
# Host mirror
# ---------------------------------------------------------------------------

_M32 = 0xFFFFFFFF


def _rotr_ref(x, r):
    return ((x >> r) | (x << (32 - r))) & _M32


def compress_ref(h: Sequence[int], m: Sequence[int], t: int, last: bool) -> List[int]:
    v = list(h) + list(IV)
    v[12] ^= t & _M32
    v[13] ^= (t >> 32) & _M32
    if last:
        v[14] ^= _M32

    def G(a, b, c, d, x, y):
        a = (a + b + x) & _M32
        d = _rotr_ref(d ^ a, 16)
        c = (c + d) & _M32
        b = _rotr_ref(b ^ c, 12)
        a = (a + b + y) & _M32
        d = _rotr_ref(d ^ a, 8)
        c = (c + d) & _M32
        b = _rotr_ref(b ^ c, 7)
        return a, b, c, d

    for r in range(10):
        s = SIGMA[r]
        v[0], v[4], v[8], v[12] = G(v[0], v[4], v[8], v[12], m[s[0]], m[s[1]])
        v[1], v[5], v[9], v[13] = G(v[1], v[5], v[9], v[13], m[s[2]], m[s[3]])
        v[2], v[6], v[10], v[14] = G(v[2], v[6], v[10], v[14], m[s[4]], m[s[5]])
        v[3], v[7], v[11], v[15] = G(v[3], v[7], v[11], v[15], m[s[6]], m[s[7]])
        v[0], v[5], v[10], v[15] = G(v[0], v[5], v[10], v[15], m[s[8]], m[s[9]])
        v[1], v[6], v[11], v[12] = G(v[1], v[6], v[11], v[12], m[s[10]], m[s[11]])
        v[2], v[7], v[8], v[13] = G(v[2], v[7], v[8], v[13], m[s[12]], m[s[13]])
        v[3], v[4], v[9], v[14] = G(v[3], v[4], v[9], v[14], m[s[14]], m[s[15]])
    return [(h[i] ^ v[i] ^ v[i + 8]) & _M32 for i in range(8)]


def blake2s_ref(data: bytes, digest_size: int = 32) -> bytes:
    h = list(IV)
    h[0] ^= 0x01010000 ^ digest_size
    msg = bytearray(data)
    if len(msg) == 0:
        msg = bytearray(64)
        blocks = [msg]
        t_final = 0
    else:
        pad = (-len(msg)) % 64
        total = len(data)
        msg += b"\x00" * pad
        blocks = [msg[i : i + 64] for i in range(0, len(msg), 64)]
        t_final = total
    for i, block in enumerate(blocks[:-1]):
        words = [int.from_bytes(block[4 * j : 4 * j + 4], "little") for j in range(16)]
        h = compress_ref(h, words, (i + 1) * 64, False)
    words = [int.from_bytes(blocks[-1][4 * j : 4 * j + 4], "little") for j in range(16)]
    h = compress_ref(h, words, t_final, True)
    return b"".join(x.to_bytes(4, "little") for x in h)[:digest_size]
