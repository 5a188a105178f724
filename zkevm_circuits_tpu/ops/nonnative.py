"""Non-native 256-bit arithmetic checking, batched for TPU.

Reference parity: boojum's `NonNativeFieldOverU16<F, P, 17>` (u16 limbs with
overflow tracking — ref `src/ecrecover/mod.rs:58-62`,
`src/eip_4844/mod.rs:40-42`).

TPU design: values are 16 x u16 limbs in u32 lanes.  Nothing is *computed*
mod p on device — identities are *checked*: the witness supplies quotients
(and any intermediate reduced values), and the checker verifies integer
identities of the form

    sum_i  a_i * b_i * m_i  +  sum_j x_j * m_j  + const
        ==  (same shape on the right-hand side)

limb-exactly.  Schoolbook coefficient sums are built by shift-aligning the
u16xu16 partial-product rows and tree-reducing them with exact (lo, hi) u32
carry pairs, then both sides are canonicalized to base-2^16 digits and
compared — all unsigned, all batch-parallel, compact XLA graphs.

Grammar for a side: list of terms
    ("prod", a_limbs, b_limbs, small_int_mult)
    ("lin",  x_limbs, small_int_mult)
    ("const", python_int)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

NLIMBS = 16  # 256-bit values
_MASK16 = jnp.uint32(0xFFFF)


def from_int(x: int, nlimbs: int = NLIMBS) -> np.ndarray:
    assert x >= 0
    out = np.array([(x >> (16 * i)) & 0xFFFF for i in range(nlimbs)], dtype=np.uint32)
    assert x >> (16 * nlimbs) == 0, "value does not fit the limb count"
    return out


def from_ints(xs, nlimbs: int = NLIMBS) -> np.ndarray:
    return np.stack([from_int(int(x), nlimbs) for x in xs])


def to_int(limbs) -> int:
    out = 0
    for i, l in enumerate(np.asarray(limbs).reshape(-1).tolist()):
        out |= int(l) << (16 * i)
    return out


# ---------------------------------------------------------------------------
# exact (lo, hi) u32-pair helpers
# ---------------------------------------------------------------------------


def _pair_add(alo, ahi, blo, bhi):
    lo = alo + blo
    hi = ahi + bhi + (lo < alo).astype(jnp.uint32)
    return lo, hi


def _pair_add_u32(alo, ahi, x):
    lo = alo + x
    hi = ahi + (lo < alo).astype(jnp.uint32)
    return lo, hi


def _coef_sums(a: jnp.ndarray, b: jnp.ndarray, mult: int, ncoef: int):
    """coefficient sums of mult * (a * b) as (lo, hi) arrays of length ncoef.

    a: (..., na), b: (..., nb) u16-in-u32; mult a small positive int."""
    na, nb = a.shape[-1], b.shape[-1]
    prods = a[..., :, None] * b[..., None, :]  # (..., na, nb) exact in u32
    rows_lo = []
    for i in range(na):
        row = prods[..., i, :]
        pad = [(0, 0)] * (row.ndim - 1) + [(i, ncoef - nb - i)]
        rows_lo.append(jnp.pad(row, pad))
    lo = jnp.zeros(a.shape[:-1] + (ncoef,), jnp.uint32)
    hi = jnp.zeros_like(lo)
    for row in rows_lo:
        lo, hi = _pair_add(lo, hi, row, jnp.zeros_like(row))
    out_lo, out_hi = jnp.zeros_like(lo), jnp.zeros_like(hi)
    for _ in range(mult):
        out_lo, out_hi = _pair_add(out_lo, out_hi, lo, hi)
    return out_lo, out_hi


def _side_digits(terms, ncoef: int, batch_shape):
    """canonical base-2^16 digits (ncoef + 2 of them) of a term sum."""
    lo = jnp.zeros(batch_shape + (ncoef,), jnp.uint32)
    hi = jnp.zeros_like(lo)
    for t in terms:
        kind = t[0]
        if kind == "prod":
            _, a, b, mult = t
            plo, phi = _coef_sums(a, b, mult, ncoef)
            lo, hi = _pair_add(lo, hi, plo, phi)
        elif kind == "lin":
            _, x, mult = t
            n = x.shape[-1]
            xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, ncoef - n)])
            for _ in range(mult):
                lo, hi = _pair_add(lo, hi, xp, jnp.zeros_like(xp))
        elif kind == "const":
            _, c = t
            limbs = from_int(int(c), ncoef)
            carr = jnp.broadcast_to(jnp.asarray(limbs), batch_shape + (ncoef,))
            lo, hi = _pair_add(lo, hi, carr, jnp.zeros_like(carr))
        else:
            raise ValueError(kind)
    # carry-propagate into digits
    carry = jnp.zeros(batch_shape, jnp.uint32)
    digits = []
    for k in range(ncoef):
        l, h = _pair_add_u32(lo[..., k], hi[..., k], carry)
        digits.append(l & _MASK16)
        carry = (l >> 16) | (h << 16)
    digits.append(carry & _MASK16)
    digits.append(carry >> 16)
    return digits


def sides_equal(lhs, rhs, batch_shape, ncoef: int = 2 * NLIMBS + 2) -> jnp.ndarray:
    """check  sum(lhs terms) == sum(rhs terms)  exactly.  Returns bool (...,)."""
    dl = _side_digits(lhs, ncoef, batch_shape)
    dr = _side_digits(rhs, ncoef, batch_shape)
    ok = jnp.ones(batch_shape, dtype=bool)
    for a, b in zip(dl, dr):
        ok = ok & (a == b)
    return ok


def check_mulmod(a, b, q, r, modulus: int) -> jnp.ndarray:
    """a*b == q*modulus + r (integers). a,b,r (...,16); q (...,nq)."""
    batch = a.shape[:-1]
    m = jnp.broadcast_to(jnp.asarray(from_int(modulus)), q.shape[:-1] + (NLIMBS,))
    return sides_equal(
        [("prod", a, b, 1)],
        [("prod", q, m, 1), ("lin", r, 1)],
        batch,
    )


def mulmod_witness(a: int, b: int, modulus: int):
    q, r = divmod(a * b, modulus)
    return q, r


def check_range(x: jnp.ndarray) -> jnp.ndarray:
    return (x <= _MASK16).all(axis=-1)


def limbs_lt(a: jnp.ndarray, b_int: int) -> jnp.ndarray:
    """a < b (constant), comparing 16-limb LE numbers."""
    b = from_int(b_int)
    lt = jnp.zeros(a.shape[:-1], dtype=bool)
    eq = jnp.ones(a.shape[:-1], dtype=bool)
    for k in range(NLIMBS - 1, -1, -1):
        bk = jnp.uint32(int(b[k]))
        lt = lt | (eq & (a[..., k] < bk))
        eq = eq & (a[..., k] == bk)
    return lt
