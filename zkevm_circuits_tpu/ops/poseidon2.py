"""Poseidon2 permutation over Goldilocks, width 12 — the universal sponge.

Reference-parity role: boojum's `CircuitRoundFunction<F, 8, 12, 4>` (rate 8,
width 12, output 4) — the round function behind every queue tail, every
closed-form-input commitment, and Fiat-Shamir challenge derivation in
matter-labs/era-zkevm_circuits (SURVEY.md §2.3; e.g. reference
`src/utils.rs:31-55`, `src/main_vm/loading.rs:95-171`).

Structure (Poseidon2, GrassiKRS22), alpha = 7, R_F = 8 (4+4), R_P = 22:
  * pre-round:       state = M_E @ state          (Poseidon2 spec)
  * external round:  state += rc;  state = state^7;  state = M_E @ state
  * internal round:  state[0] += rc;  state[0] ^= 7;  state = M_I @ state
  * M_E = (J_{3x3} + I) (x) M4, M4 = [[5,7,1,3],[4,6,1,1],[1,3,5,7],[1,1,4,6]]
    applied via the paper's 8-addition chain, vectorized across the 3 blocks.
  * M_I = J + diag(mu - 1):  out_i = sum(state) + (mu_i - 1) * state_i.

Round constants / mu: Grain-LFSR generated (see utils/grain.py for why this
instance is self-pinned rather than copied from boojum; constants are data —
swappable without structural change).

TPU mapping: a batch of states is a GF of shape (..., 12).  All lane math is
vectorized over the full (batch, 12) array (VPU elementwise on u32 limbs);
rounds run under `lax.scan` so the compiled graph holds ONE round body per
phase regardless of round count.  The whole permutation is a single fused
elementwise pipeline over the batch — it shards trivially along batch axes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.grain import poseidon2_goldilocks_constants
from . import gf
from .gf import GF

WIDTH = 12
RATE = 8
CAPACITY = 4
COMMITMENT_WIDTH = 4
R_FULL = 8
R_PARTIAL = 22
ALPHA = 7

EXT_RC, INT_RC, MU = poseidon2_goldilocks_constants(gf.MODULUS, WIDTH, R_FULL, R_PARTIAL)
_MU_MINUS_1 = [(m - 1) % gf.MODULUS for m in MU]

# Identifies the exact round-constant instance every sponge-derived value
# (queue tails, commitments, challenges) in this build depends on.  Any
# cross-validation against values produced under a different constant set
# (e.g. upstream boojum's) must first compare this id so mismatches fail
# loudly instead of silently producing different commitments.  Pinned by
# tests/test_poseidon2.py::test_golden_pin.
import hashlib as _hashlib

INSTANCE_ID = int.from_bytes(
    _hashlib.sha256(
        repr(("poseidon2-goldilocks-grain-v1", EXT_RC, INT_RC, MU)).encode()
    ).digest()[:8],
    "little",
)


def _const_gf(values) -> GF:
    arr = np.asarray(values, dtype=np.uint64)
    return GF(
        jnp.asarray(arr & np.uint64(0xFFFFFFFF), dtype=jnp.uint32),
        jnp.asarray(arr >> np.uint64(32), dtype=jnp.uint32),
    )


# lazy (non-canonical) field ops inside the permutation — only the final
# output is canonicalized, which removes the per-op conditional subtracts
_ladd = gf.add_lazy
_lmul = gf.mul_lazy


def _ldouble(x: GF) -> GF:
    return _ladd(x, x)


def _sbox(x: GF) -> GF:
    # x^7 = x^3 * x^4 : vectorized over whatever shape x has
    x2 = _lmul(x, x)
    x3 = _lmul(x2, x)
    x4 = _lmul(x2, x2)
    return _lmul(x3, x4)


def _ext_matrix(state: GF) -> GF:
    """M_E @ state on trailing axis 12, vectorized across the three 4-blocks."""
    shape = state.shape
    b = state.reshape(shape[:-1] + (3, 4))
    x0, x1, x2, x3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    t0 = _ladd(x0, x1)
    t1 = _ladd(x2, x3)
    t2 = _ladd(_ldouble(x1), t1)
    t3 = _ladd(_ldouble(x3), t0)
    t4 = _ladd(_ldouble(_ldouble(t1)), t3)
    t5 = _ladd(_ldouble(_ldouble(t0)), t2)
    t6 = _ladd(t3, t5)
    t7 = _ladd(t2, t4)
    w = gf.stack([t6, t5, t7, t4], axis=-1)  # (..., 3, 4)
    s = _ladd(_ladd(w[..., 0, :], w[..., 1, :]), w[..., 2, :])  # (..., 4)
    out = _ladd(w, gf.expand_dims(s, -2))  # broadcast over blocks
    return out.reshape(shape)


def _sum_lanes_lazy(state: GF) -> GF:
    """lazy tree-sum over the trailing width-12 axis."""
    cur = state
    n = cur.shape[-1]
    while n > 1:
        half = n // 2
        merged = _ladd(cur[..., :half], cur[..., half : 2 * half])
        if n % 2:
            merged = gf.concat([merged, cur[..., 2 * half :]], axis=-1)
            n = half + 1
        else:
            n = half
        cur = merged
    return cur[..., 0]


def _int_matrix(state: GF, mu_m1: GF) -> GF:
    total = _sum_lanes_lazy(state)  # (...,)
    scaled = _lmul(state, mu_m1)  # broadcast (...,12) * (12,)
    return _ladd(scaled, gf.expand_dims(total, -1))


def _permutation_impl(state: GF) -> GF:
    """Poseidon2 permutation; `state` has trailing axis 12 (any batch dims)."""
    ext_rc = _const_gf(EXT_RC)  # (8, 12)
    int_rc = _const_gf(INT_RC)  # (22,)
    mu_m1 = _const_gf(_MU_MINUS_1)  # (12,)
    half = R_FULL // 2

    def full_round(st: GF, rc: GF) -> Tuple[GF, None]:
        st = _ladd(st, rc)
        st = _sbox(st)
        return _ext_matrix(st), None

    def partial_round(st: GF, rc: GF) -> Tuple[GF, None]:
        lane0 = _sbox(_ladd(st[..., 0], rc))
        st = gf.concat([gf.expand_dims(lane0, -1), st[..., 1:]], axis=-1)
        return _int_matrix(st, mu_m1), None

    state = _ext_matrix(state)
    state, _ = jax.lax.scan(full_round, state, ext_rc[:half])
    state, _ = jax.lax.scan(partial_round, state, int_rc)
    state, _ = jax.lax.scan(full_round, state, ext_rc[half:])
    return gf.canonicalize(state)


_permutation_flat_jit = jax.jit(_permutation_impl)

# Eager-call batch bucketing: every distinct batch shape of the permutation
# costs a fresh XLA compile of the 3-scan graph (~seconds on CPU, ~minutes
# over the axon remote-compile tunnel).  Merkle tree levels, FRI layers and
# per-query verifies all hit the permutation with different batch sizes, so
# eager callers are rounded up to power-of-two buckets (min 2^7) and served
# by ONE cached executable per bucket.  Traced callers (inside someone
# else's jit/vmap/scan) take the plain path — their shapes are static.
_MIN_BUCKET_LOG2 = 7

# Large batches on a real TPU route to the fused Pallas kernel
# (ops/poseidon2_pallas.py): all 30 rounds run out of VMEM with one HBM
# read/write per element, where the lax.scan path round-trips the state
# through HBM every round.  Threshold = one kernel tile; smaller batches
# aren't worth the pad.  ZKTPU_NO_PALLAS=1 disables (fallback knob).
_PALLAS_MIN_BATCH = 512


def _pallas_enabled() -> bool:
    import os

    if os.environ.get("ZKTPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # backend probing must never break the portable path
        return False


def _flat_batch(state: GF) -> int:
    n = 1
    for d in state.shape[:-1]:
        n *= int(d)
    return n


def permutation(state: GF) -> GF:
    """Poseidon2 permutation; `state` has trailing axis 12 (any batch dims).

    On TPU, batches >= _PALLAS_MIN_BATCH dispatch to the fused Pallas kernel
    (identical round math, golden-pinned by tests/test_poseidon2_pallas.py).
    Eager calls elsewhere are batch-bucketed (padded to a power of two) so
    repeated differently-shaped calls share compiled executables; traced
    calls compile inline as before."""
    if _pallas_enabled() and _flat_batch(state) >= _PALLAS_MIN_BATCH:
        from .poseidon2_pallas import permutation_pallas

        return permutation_pallas(state)
    if isinstance(state.lo, jax.core.Tracer) or isinstance(
        state.hi, jax.core.Tracer
    ):
        return _permutation_impl(state)
    batch = state.shape[:-1]
    flat = _flat_batch(state)
    bucket = max(1 << _MIN_BUCKET_LOG2, 1 << max(0, (flat - 1).bit_length()))
    st = state.reshape((flat, WIDTH))
    if bucket != flat:
        st = gf.concat([st, gf.zeros((bucket - flat, WIDTH))], axis=0)
    out = _permutation_flat_jit(st)
    if bucket != flat:
        out = out[:flat]
    return out.reshape(batch + (WIDTH,))


# ---------------------------------------------------------------------------
# Sponge conventions (matching boojum's round-function trait usage)
# ---------------------------------------------------------------------------


def empty_state(batch_shape=()) -> GF:
    """R::create_empty_state — all-zero width-12 state."""
    return gf.zeros(tuple(batch_shape) + (WIDTH,))


def apply_length_specialization(state: GF, length) -> GF:
    """Set the last capacity lane to the input length (domain separation).

    Mirrors boojum's `apply_length_specialization` used by FS-challenge
    derivation (reference `src/utils.rs:33`) and variable-length commitments.
    """
    length_gf = length if isinstance(length, GF) else gf.from_u32(jnp.uint32(length))
    last = gf.add(state[..., WIDTH - 1], length_gf)
    return gf.concat([state[..., : WIDTH - 1], gf.expand_dims(last, -1)], axis=-1)


def absorb_with_replacement(chunk: GF, state: GF) -> GF:
    """state[0:8] := chunk (replacement absorption), keep capacity lanes."""
    return gf.concat([chunk, state[..., RATE:]], axis=-1)


def absorb_round(chunk: GF, state: GF) -> GF:
    return permutation(absorb_with_replacement(chunk, state))


def state_into_commitment(state: GF) -> GF:
    """Take the first COMMITMENT_WIDTH lanes as a commitment."""
    return state[..., :COMMITMENT_WIDTH]


def hash_padded(inputs: GF, length_specialize: bool = True) -> GF:
    """Sponge-hash a trailing-axis sequence of field elements to 4 lanes.

    Zero-pads to a rate multiple; optionally applies length specialization
    (the convention used by `commit_encoding`, reference
    `src/fsm_input_output/mod.rs:281-326`, and FS challenges).
    """
    n = inputs.shape[-1]
    batch = inputs.shape[:-1]
    state = empty_state(batch)
    if length_specialize:
        state = apply_length_specialization(state, jnp.uint32(n))
    padded = n + (-n) % RATE
    if padded != n:
        pad = gf.zeros(batch + (padded - n,))
        inputs = gf.concat([inputs, pad], axis=-1)
    for i in range(0, padded, RATE):
        state = absorb_round(inputs[..., i : i + RATE], state)
    return state_into_commitment(state)


# Convenience jitted single-shot permutation for benches/tests.
permutation_jit = jax.jit(permutation)
