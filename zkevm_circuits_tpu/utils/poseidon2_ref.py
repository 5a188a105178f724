"""Pure-python integer mirror of the Poseidon2-Goldilocks permutation.

Independent arithmetic path (python ints mod p) over the same Grain-generated
constants as ops/poseidon2.py — used for golden tests and host-side witness
tooling where a single hash (not a batch) is needed.
"""

from __future__ import annotations

from typing import List, Sequence

from ..ops.gf import MODULUS as P
from .grain import poseidon2_goldilocks_constants

WIDTH = 12
RATE = 8
R_FULL = 8
R_PARTIAL = 22

_EXT_RC, _INT_RC, _MU = poseidon2_goldilocks_constants(P, WIDTH, R_FULL, R_PARTIAL)

_M4 = (
    (5, 7, 1, 3),
    (4, 6, 1, 1),
    (1, 3, 5, 7),
    (1, 1, 4, 6),
)


def _m4(v: Sequence[int]) -> List[int]:
    return [sum(c * x for c, x in zip(row, v)) % P for row in _M4]


def _ext_matrix(s: List[int]) -> List[int]:
    blocks = [_m4(s[i : i + 4]) for i in (0, 4, 8)]
    sums = [(blocks[0][j] + blocks[1][j] + blocks[2][j]) % P for j in range(4)]
    out: List[int] = []
    for b in blocks:
        out.extend((b[j] + sums[j]) % P for j in range(4))
    return out


def _int_matrix(s: List[int]) -> List[int]:
    total = sum(s) % P
    return [(total + (_MU[i] - 1) * s[i]) % P for i in range(WIDTH)]


def _sbox(x: int) -> int:
    return pow(x, 7, P)


def permutation(state: Sequence[int]) -> List[int]:
    s = [x % P for x in state]
    assert len(s) == WIDTH
    s = _ext_matrix(s)
    half = R_FULL // 2
    for r in range(half):
        s = [(s[i] + _EXT_RC[r][i]) % P for i in range(WIDTH)]
        s = [_sbox(x) for x in s]
        s = _ext_matrix(s)
    for r in range(R_PARTIAL):
        s[0] = _sbox((s[0] + _INT_RC[r]) % P)
        s = _int_matrix(s)
    for r in range(half, R_FULL):
        s = [(s[i] + _EXT_RC[r][i]) % P for i in range(WIDTH)]
        s = [_sbox(x) for x in s]
        s = _ext_matrix(s)
    return s


def hash_padded(inputs: Sequence[int], length_specialize: bool = True) -> List[int]:
    """Mirror of ops.poseidon2.hash_padded for a single sequence."""
    vals = [x % P for x in inputs]
    state = [0] * WIDTH
    if length_specialize:
        state[WIDTH - 1] = len(vals) % P
    n_pad = (-len(vals)) % RATE
    vals = vals + [0] * n_pad
    for i in range(0, len(vals), RATE):
        state[:RATE] = vals[i : i + RATE]
        state = permutation(state)
    return state[:4]
