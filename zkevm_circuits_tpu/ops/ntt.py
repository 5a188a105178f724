"""Goldilocks NTT / LDE — the prover-layer polynomial substrate.

The reference stack's prover (boojum) evaluates witness polynomials on
low-degree-extended cosets via radix-2 NTTs over the Goldilocks field
(2-adicity 32).  This module is the TPU-native equivalent: fully vectorized
radix-2 Cooley-Tukey over the 2xu32-limb GF representation — one bit-reverse
gather, then log2(n) stages of reshape-butterflies (no scatters, no
data-dependent control flow; every stage is a fused elementwise map XLA
tiles over the batch).

API:
  ntt(a)                 evals of the coefficient vector a on the size-n
                         subgroup (natural order in, natural order out)
  intt(e)                inverse transform
  lde(evals, rate, coset) low-degree extension: subgroup evals -> evals on
                         a coset of the rate-times-larger subgroup
Host mirror `ntt_ref` (python ints) pins the semantics for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import gf
from .gf import GF, MODULUS, MULTIPLICATIVE_GENERATOR, TWO_ADICITY


def root_of_unity(log_n: int) -> int:
    """primitive 2^log_n-th root of unity (host int)."""
    assert log_n <= TWO_ADICITY
    return pow(MULTIPLICATIVE_GENERATOR, (MODULUS - 1) >> log_n, MODULUS)


@functools.lru_cache(maxsize=None)
def _twiddle_tables(log_n: int, inverse: bool):
    """Per-stage twiddle arrays: stage s works on length-2^(s+1) blocks and
    needs 2^s twiddles w^(n/len * j)."""
    n = 1 << log_n
    w = root_of_unity(log_n)
    if inverse:
        w = pow(w, MODULUS - 2, MODULUS)
    tables = []
    for s in range(log_n):
        length = 1 << (s + 1)
        step = n // length
        tw = [pow(w, step * j, MODULUS) for j in range(length // 2)]
        tables.append(np.array(tw, dtype=np.uint64))  # numpy: jit-trace safe
    return tuple(tables)


@functools.lru_cache(maxsize=None)
def _bit_reverse_idx(log_n: int):
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev  # numpy: converted to a fresh constant inside each trace


def _transform(a: GF, log_n: int, inverse: bool) -> GF:
    n = 1 << log_n
    assert a.shape[-1] == n
    batch = a.shape[:-1]
    x = a[..., _bit_reverse_idx(log_n)]
    tables = _twiddle_tables(log_n, inverse)
    for s in range(log_n):
        length = 1 << (s + 1)
        half = length // 2
        # butterflies as 2D half-slices, NOT a (m, 2, half) reshape: the
        # unit-middle-dim form miscompiles under jit on the axon TPU at
        # n>=512 (verified eager==ref, jit!=ref; the sliced form is
        # bit-identical on both paths)
        xr = x.reshape(*batch, n // length, length)
        u = xr[..., :half]
        v = gf.mul(xr[..., half:], gf.from_u64(tables[s]))
        out = gf.concat([gf.add(u, v), gf.sub(u, v)], axis=-1)
        x = out.reshape(*batch, n)
    return x


def ntt(a: GF) -> GF:
    """Coefficients -> evaluations on the size-n subgroup (natural order)."""
    n = a.shape[-1]
    log_n = int(n).bit_length() - 1
    assert 1 << log_n == n, "length must be a power of two"
    return _transform(a, log_n, inverse=False)


def intt(e: GF) -> GF:
    """Evaluations -> coefficients."""
    n = e.shape[-1]
    log_n = int(n).bit_length() - 1
    assert 1 << log_n == n
    out = _transform(e, log_n, inverse=True)
    n_inv = pow(n, MODULUS - 2, MODULUS)
    return gf.mul(out, gf.from_u64(np.uint64(n_inv)))


def lde(evals: GF, rate_log2: int, coset_shift: int = MULTIPLICATIVE_GENERATOR) -> GF:
    """Low-degree extension: evals on the size-n subgroup -> evals on the
    coset `shift * H'` of the size-(n * 2^rate_log2) subgroup H'.

    intt -> scale coefficients by shift^i -> zero-pad -> ntt; the scaling
    turns subgroup evaluation into coset evaluation (the standard coset-LDE
    of every FRI-based prover)."""
    n = evals.shape[-1]
    log_n = int(n).bit_length() - 1
    assert 1 << log_n == n
    coeffs = intt(evals)
    shift_pows = gf.from_u64(
        np.array(
            [pow(coset_shift, i, MODULUS) for i in range(n)], dtype=np.uint64
        )
    )
    shifted = gf.mul(coeffs, shift_pows)
    batch = evals.shape[:-1]
    pad = gf.zeros(batch + (n * ((1 << rate_log2) - 1),))
    padded = gf.concat([shifted, pad], axis=-1)
    return ntt(padded)


ntt_jit = jax.jit(ntt)
intt_jit = jax.jit(intt)


# ---------------------------------------------------------------------------
# host reference (python ints)
# ---------------------------------------------------------------------------


def ntt_ref(coeffs, inverse=False):
    n = len(coeffs)
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    w = root_of_unity(log_n)
    if inverse:
        w = pow(w, MODULUS - 2, MODULUS)
    if n == 1:
        return list(coeffs)
    even = ntt_ref(coeffs[0::2], inverse)
    odd = ntt_ref(coeffs[1::2], inverse)
    out = [0] * n
    for j in range(n // 2):
        t = odd[j] * pow(w, j, MODULUS) % MODULUS
        out[j] = (even[j] + t) % MODULUS
        out[j + n // 2] = (even[j] - t) % MODULUS
    return out


def intt_ref(evals):
    n = len(evals)
    n_inv = pow(n, MODULUS - 2, MODULUS)
    return [x * n_inv % MODULUS for x in ntt_ref(evals, inverse=True)]
