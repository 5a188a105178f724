"""Tuned Poseidon2 variants for the TPU compute path.

The portable permutation (ops/poseidon2.py) runs its rounds under `lax.scan`
to keep XLA CPU compile times sane for the test suite.  On the TPU the scan
is a fusion barrier — every round writes the (batch, 12, 2xu32) state back to
HBM.  `permutation_unrolled` emits all 30 rounds straight-line so XLA can
fuse the whole permutation into one elementwise pipeline over the batch;
use it in hot constraint-eval paths on real hardware.
"""

from __future__ import annotations

from .. import ops
from ..ops import gf
from ..ops.gf import GF
from ..ops import poseidon2 as p2


def permutation_unrolled(state: GF) -> GF:
    ext_rc = p2._const_gf(p2.EXT_RC)
    int_rc = p2._const_gf(p2.INT_RC)
    mu_m1 = p2._const_gf(p2._MU_MINUS_1)
    half = p2.R_FULL // 2

    def full_round(st, r):
        st = p2._ladd(st, ext_rc[r])
        st = p2._sbox(st)
        return p2._ext_matrix(st)

    def partial_round(st, r):
        lane0 = p2._sbox(p2._ladd(st[..., 0], int_rc[r]))
        st = gf.concat([gf.expand_dims(lane0, -1), st[..., 1:]], axis=-1)
        return p2._int_matrix(st, mu_m1)

    state = p2._ext_matrix(state)
    for r in range(half):
        state = full_round(state, r)
    for r in range(p2.R_PARTIAL):
        state = partial_round(state, r)
    for r in range(half, p2.R_FULL):
        state = full_round(state, r)
    return gf.canonicalize(state)


def absorb_round_unrolled(chunk: GF, state: GF) -> GF:
    return permutation_unrolled(p2.absorb_with_replacement(chunk, state))
