"""Fused Pallas Poseidon2-Goldilocks kernel (ROADMAP perf item: keep the
12-lane state in VMEM across all 30 rounds).

The portable permutation (ops/poseidon2.py) runs rounds under `lax.scan`,
which is a fusion barrier: each round's (batch, 12, 2xu32) state round-trips
HBM.  At 2^20-row constraint evals the permutation is ~all of the bench's
HBM traffic.  This kernel tiles the batch onto the lane axis — state layout
(12, TILE) with the 12 Poseidon lanes on SUBLANES and the batch on the
128-wide LANE axis — and emits all 30 rounds straight-line inside one
`pallas_call`, so the whole permutation runs out of VMEM/registers with one
HBM read and one HBM write per element.

The field/round math is the SAME code as the portable path (gf.add_lazy /
gf.mul_lazy / the M_E addition chain) — only re-indexed for the lane-first
layout — so the host mirror and golden-vector pins apply unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import gf
from .gf import GF
from . import poseidon2 as p2

_ladd = gf.add_lazy
_lmul = gf.mul_lazy


def _ldouble(x: GF) -> GF:
    return _ladd(x, x)


def _ext_matrix_lane0(state: GF) -> GF:
    """M_E @ state for layout (12, T): lanes on axis 0."""
    b = state.reshape(3, 4, state.shape[-1])
    x0, x1, x2, x3 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]  # (3, T) each
    t0 = _ladd(x0, x1)
    t1 = _ladd(x2, x3)
    t2 = _ladd(_ldouble(x1), t1)
    t3 = _ladd(_ldouble(x3), t0)
    t4 = _ladd(_ldouble(_ldouble(t1)), t3)
    t5 = _ladd(_ldouble(_ldouble(t0)), t2)
    t6 = _ladd(t3, t5)
    t7 = _ladd(t2, t4)
    w = gf.stack([t6, t5, t7, t4], axis=1)  # (3, 4, T)
    s = _ladd(_ladd(w[0], w[1]), w[2])  # (4, T)
    out = _ladd(w, gf.expand_dims(s, 0))
    return out.reshape(12, state.shape[-1])


def _sum_lanes_lane0(state: GF) -> GF:
    cur = state
    n = cur.shape[0]
    while n > 1:
        half = n // 2
        merged = _ladd(cur[:half], cur[half : 2 * half])
        if n % 2:
            merged = gf.concat([merged, cur[2 * half :]], axis=0)
            n = half + 1
        else:
            n = half
        cur = merged
    return cur[0]


def _int_matrix_lane0(state: GF, mu_m1: GF) -> GF:
    total = _sum_lanes_lane0(state)  # (T,)
    scaled = _lmul(state, mu_m1)  # (12, T) * (12, 1)
    return _ladd(scaled, gf.expand_dims(total, 0))


def _np_const_pair(values):
    arr = np.asarray(values, dtype=np.uint64)
    return (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32), (
        arr >> np.uint64(32)
    ).astype(np.uint32)


_EXT_LO, _EXT_HI = _np_const_pair(p2.EXT_RC)      # (8, 12)
_INT_LO, _INT_HI = _np_const_pair(p2.INT_RC)      # (22,)
_MU_LO, _MU_HI = _np_const_pair(p2._MU_MINUS_1)   # (12,)


def _kernel(lo_ref, hi_ref, elo_ref, ehi_ref, ilo_ref, ihi_ref,
            mlo_ref, mhi_ref, out_lo_ref, out_hi_ref):
    """Round constants arrive as kernel OPERANDS (pallas on real TPU rejects
    captured consts; interpret mode silently allowed them — r2 latent bug)."""
    state = GF(lo_ref[:], hi_ref[:])  # (12, T)
    half = p2.R_FULL // 2
    mu = GF(mlo_ref[:], mhi_ref[:])  # (12, 1)

    def rc_row(r):  # (12, 1) broadcastable against (12, T)
        return GF(elo_ref[r][:, None], ehi_ref[r][:, None])

    def full_round(st, r):
        st = _ladd(st, rc_row(r))
        st = p2._sbox(st)
        return _ext_matrix_lane0(st)

    def partial_round(st, r):
        rc = GF(ilo_ref[r, 0], ihi_ref[r, 0])
        lane0 = p2._sbox(_ladd(st[0], rc))
        st = gf.concat([gf.expand_dims(lane0, 0), st[1:]], axis=0)
        return _int_matrix_lane0(st, mu)

    state = _ext_matrix_lane0(state)
    for r in range(half):
        state = full_round(state, r)
    for r in range(p2.R_PARTIAL):
        state = partial_round(state, r)
    for r in range(half, p2.R_FULL):
        state = full_round(state, r)
    state = gf.canonicalize(state)
    out_lo_ref[:] = state.lo
    out_hi_ref[:] = state.hi


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _permutation_lane0(lo, hi, tile: int = 512, interpret: bool = False):
    """(12, N) u32 pair -> permuted (12, N); N must be a multiple of tile."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = lo.shape[1]
    grid = (N // tile,)
    spec = pl.BlockSpec((12, tile), lambda i: (0, i), memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    out_shape = [
        jax.ShapeDtypeStruct((12, N), jnp.uint32),
        jax.ShapeDtypeStruct((12, N), jnp.uint32),
    ]
    out_lo, out_hi = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec, spec,
                  const_spec((8, 12)), const_spec((8, 12)),
                  const_spec((22, 1)), const_spec((22, 1)),
                  const_spec((12, 1)), const_spec((12, 1))],
        out_specs=[spec, spec],
        out_shape=out_shape,
        interpret=interpret,
    )(lo, hi,
      jnp.asarray(_EXT_LO), jnp.asarray(_EXT_HI),
      jnp.asarray(_INT_LO[:, None]), jnp.asarray(_INT_HI[:, None]),
      jnp.asarray(_MU_LO[:, None]), jnp.asarray(_MU_HI[:, None]))
    return out_lo, out_hi


def permutation_pallas(state: GF, tile: int = 512, interpret=None) -> GF:
    """Drop-in for poseidon2.permutation: state (..., 12) -> (..., 12).

    Batch dims are flattened onto the kernel's lane axis (padded to `tile`);
    interpret=None auto-selects interpreter mode off-TPU so CPU tests
    exercise the identical kernel code."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch = state.shape[:-1]
    n = int(np.prod(batch)) if batch else 1
    flat = state.reshape(n, 12)
    padded = n + (-n) % tile
    if padded != n:
        flat = gf.concat([flat, gf.zeros((padded - n, 12))], axis=0)
    lo, hi = flat.lo.T, flat.hi.T  # (12, padded)
    out_lo, out_hi = _permutation_lane0(lo, hi, tile=tile, interpret=interpret)
    out = GF(out_lo.T[:n], out_hi.T[:n])
    return out.reshape(*batch, 12) if batch else out[0]
