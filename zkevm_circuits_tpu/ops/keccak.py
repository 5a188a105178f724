"""keccak-f[1600] + keccak256, vectorized for TPU.

Reference-parity role: boojum's in-circuit keccak256 gadget (LANE_WIDTH=5,
BYTES_PER_WORD=8, KECCAK_RATE_BYTES=136 — SURVEY.md §2.3), consumed by the
keccak256_round_function precompile circuit, linear_hasher,
storage_application's pubdata accumulator, and the recursion interblock
aggregator.

TPU design: a batch of states is a pair of uint32 arrays (lo, hi) of shape
(..., 25) — 64-bit lanes split into u32 halves because TPU vector lanes are
32-bit.  theta/rho/pi/chi/iota are pure elementwise XOR/AND/rot over the
batch; the 24 rounds are unrolled (static rotation offsets per lane must be
compile-time constants, so a scan over rounds would still unroll the lane
shuffles — the graph is small either way).

Host mirror `keccak_f1600_ref` / `keccak256_ref` (python ints) is pinned by
the standard keccak256("")/("abc") test vectors.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

KECCAK_RATE_BYTES = 136
KECCAK_ROUNDS = 24

ROUND_CONSTANTS = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rotation offsets indexed [x][y]
ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _idx(x: int, y: int) -> int:
    return x + 5 * y


# ---------------------------------------------------------------------------
# Vectorized (lo, hi) u32-pair implementation
# ---------------------------------------------------------------------------


def _rotl64(lo: jnp.ndarray, hi: jnp.ndarray, r: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    r %= 64
    if r == 0:
        return lo, hi
    if r == 32:
        return hi, lo
    if r < 32:
        s = jnp.uint32(r)
        t = jnp.uint32(32 - r)
        return (lo << s) | (hi >> t), (hi << s) | (lo >> t)
    s = jnp.uint32(r - 32)
    t = jnp.uint32(64 - r)
    return (hi << s) | (lo >> t), (lo << s) | (hi >> t)


def _round(lo: jnp.ndarray, hi: jnp.ndarray, rc_lo, rc_hi):
    """One keccak round on (..., 25) u32 pairs (static lane shuffles)."""
    L = [lo[..., i] for i in range(25)]
    H = [hi[..., i] for i in range(25)]
    if True:
        # theta
        CL = [L[_idx(x, 0)] ^ L[_idx(x, 1)] ^ L[_idx(x, 2)] ^ L[_idx(x, 3)] ^ L[_idx(x, 4)] for x in range(5)]
        CH = [H[_idx(x, 0)] ^ H[_idx(x, 1)] ^ H[_idx(x, 2)] ^ H[_idx(x, 3)] ^ H[_idx(x, 4)] for x in range(5)]
        for x in range(5):
            rl, rh = _rotl64(CL[(x + 1) % 5], CH[(x + 1) % 5], 1)
            dl = CL[(x - 1) % 5] ^ rl
            dh = CH[(x - 1) % 5] ^ rh
            for y in range(5):
                L[_idx(x, y)] = L[_idx(x, y)] ^ dl
                H[_idx(x, y)] = H[_idx(x, y)] ^ dh
        # rho + pi
        BL = [None] * 25
        BH = [None] * 25
        for x in range(5):
            for y in range(5):
                rl, rh = _rotl64(L[_idx(x, y)], H[_idx(x, y)], ROT[x][y])
                BL[_idx(y, (2 * x + 3 * y) % 5)] = rl
                BH[_idx(y, (2 * x + 3 * y) % 5)] = rh
        # chi
        for x in range(5):
            for y in range(5):
                L[_idx(x, y)] = BL[_idx(x, y)] ^ (~BL[_idx((x + 1) % 5, y)] & BL[_idx((x + 2) % 5, y)])
                H[_idx(x, y)] = BH[_idx(x, y)] ^ (~BH[_idx((x + 1) % 5, y)] & BH[_idx((x + 2) % 5, y)])
        # iota
        L[0] = L[0] ^ rc_lo
        H[0] = H[0] ^ rc_hi
    return jnp.stack(L, axis=-1), jnp.stack(H, axis=-1)


def keccak_f1600(lo: jnp.ndarray, hi: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One permutation over a batch; lo/hi shape (..., 25) uint32.

    Rounds run under lax.scan (one round body in the compiled graph); the
    lane shuffles inside a round are static."""
    import numpy as np

    rcs = np.asarray(ROUND_CONSTANTS, dtype=np.uint64)
    rc_lo = jnp.asarray((rcs & 0xFFFFFFFF).astype(np.uint32))
    rc_hi = jnp.asarray((rcs >> 32).astype(np.uint32))

    def body(carry, rc):
        l, h = carry
        nl, nh = _round(l, h, rc[0], rc[1])
        return (nl, nh), None

    (lo, hi), _ = jax.lax.scan(body, (lo, hi), (rc_lo, rc_hi))
    return lo, hi


def absorb_block(lo, hi, block_lo, block_hi):
    """XOR a 17-lane (136-byte) block into the state and permute.

    block_*: (..., 17) uint32."""
    pad = lo.shape[:-1] + (25 - 17,)
    bl = jnp.concatenate([block_lo, jnp.zeros(pad, jnp.uint32)], axis=-1)
    bh = jnp.concatenate([block_hi, jnp.zeros(pad, jnp.uint32)], axis=-1)
    return keccak_f1600(lo ^ bl, hi ^ bh)


# ---------------------------------------------------------------------------
# Host mirror (python ints)
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1


def _rotl_ref(v: int, r: int) -> int:
    r %= 64
    return ((v << r) | (v >> (64 - r))) & _M64


def keccak_f1600_ref(state: Sequence[int]) -> List[int]:
    A = [v & _M64 for v in state]
    assert len(A) == 25
    for rc in ROUND_CONSTANTS:
        C = [A[_idx(x, 0)] ^ A[_idx(x, 1)] ^ A[_idx(x, 2)] ^ A[_idx(x, 3)] ^ A[_idx(x, 4)] for x in range(5)]
        D = [C[(x - 1) % 5] ^ _rotl_ref(C[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                A[_idx(x, y)] ^= D[x]
        B = [0] * 25
        for x in range(5):
            for y in range(5):
                B[_idx(y, (2 * x + 3 * y) % 5)] = _rotl_ref(A[_idx(x, y)], ROT[x][y])
        for x in range(5):
            for y in range(5):
                A[_idx(x, y)] = B[_idx(x, y)] ^ ((~B[_idx((x + 1) % 5, y)] & _M64) & B[_idx((x + 2) % 5, y)])
        A[0] ^= rc
    return A


def keccak256_ref(data: bytes) -> bytes:
    """keccak256 (original 0x01 padding, NOT NIST sha3's 0x06)."""
    state = [0] * 25
    rate = KECCAK_RATE_BYTES
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    if pad_len == 1:
        padded += b"\x81"
    else:
        padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80"
    for off in range(0, len(padded), rate):
        block = padded[off : off + rate]
        for i in range(rate // 8):
            lane = int.from_bytes(block[8 * i : 8 * i + 8], "little")
            state[i] ^= lane
        state = keccak_f1600_ref(state)
    out = b"".join(state[i].to_bytes(8, "little") for i in range(4))
    return out


def bytes_to_lanes(block: bytes) -> List[int]:
    assert len(block) % 8 == 0
    return [int.from_bytes(block[8 * i : 8 * i + 8], "little") for i in range(len(block) // 8)]
