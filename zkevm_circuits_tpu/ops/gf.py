"""Goldilocks field arithmetic, TPU-native.

The reference framework (matter-labs/era-zkevm_circuits) delegates all field
arithmetic to the external `boojum` crate's `SmallField` over the Goldilocks
prime  p = 2^64 - 2^32 + 1  (see SURVEY.md §2.3; used everywhere, e.g.
reference `src/base_structures/memory_query/mod.rs:109` assumes >=56-bit
capacity packing).

TPU design
----------
TPUs have no 64-bit scalar units: the VPU operates on 32-bit integer lanes.
A field element is therefore a **pair of uint32 arrays** ``(lo, hi)``
(structure-of-arrays, so each limb maps straight onto 8x128 VPU registers and
shards cleanly along any batch axis).  All ops below are shape-polymorphic,
elementwise, branch-free, and jit/vmap/shard_map-compatible.

* 32x32->64 widening multiply is synthesized from four 16x16->32 products
  (exact in uint32).
* 128-bit -> 64-bit Goldilocks reduction uses 2^64 == 2^32 - 1 (mod p) and
  2^96 == -1 (mod p) (the standard fast-reduction identity).
* Elements are kept **canonical** (< p) at all times so that bit-exact
  comparisons and packing/unpacking against reference semantics are trivial.

A pure-Python mirror of every op lives in `gf_ref` (same file, bottom) and is
used by the test suite for exhaustive randomized cross-checks.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# Goldilocks prime and friends.
MODULUS = 0xFFFFFFFF00000001  # 2^64 - 2^32 + 1
EPSILON = 0xFFFFFFFF  # 2^64 - MODULUS = 2^32 - 1
_EPS = np.uint32(EPSILON)
# numpy-scalar literals: fold into jaxprs as Literals (no const capture in
# pallas kernels) yet fit u32 without x64 overflow checks
P_HI = np.uint32(0xFFFFFFFF)
P_LO = np.uint32(0x00000001)
MULTIPLICATIVE_GENERATOR = 7
TWO_ADICITY = 32

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GF:
    """A (batch of) Goldilocks field element(s): canonical u64 as two u32 limbs."""

    lo: jnp.ndarray
    hi: jnp.ndarray

    # -- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self.lo, self.hi), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- convenience -----------------------------------------------------
    @property
    def shape(self):
        return jnp.shape(self.lo)

    @property
    def ndim(self):
        return jnp.ndim(self.lo)

    def __getitem__(self, idx) -> "GF":
        return GF(self.lo[idx], self.hi[idx])

    def reshape(self, *shape) -> "GF":
        return GF(self.lo.reshape(*shape), self.hi.reshape(*shape))

    def astype_u64(self) -> jnp.ndarray:
        """Materialize as uint64 (host/test use; requires x64 or numpy)."""
        import numpy as np

        return np.asarray(self.lo, dtype=np.uint64) | (
            np.asarray(self.hi, dtype=np.uint64) << np.uint64(32)
        )

    # -- operators -------------------------------------------------------
    def __add__(self, other: "GF") -> "GF":
        return add(self, other)

    def __sub__(self, other: "GF") -> "GF":
        return sub(self, other)

    def __mul__(self, other: "GF") -> "GF":
        return mul(self, other)

    def __neg__(self) -> "GF":
        return neg(self)


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------


def from_u64(x: Any) -> GF:
    """Build a GF from python ints / numpy uint64 array (host-side)."""
    import numpy as np

    arr = np.asarray(x, dtype=np.uint64) % np.uint64(MODULUS)
    return GF(
        jnp.asarray(arr & np.uint64(0xFFFFFFFF), dtype=jnp.uint32),
        jnp.asarray(arr >> np.uint64(32), dtype=jnp.uint32),
    )


def from_u32(x: jnp.ndarray) -> GF:
    """Lift a uint32 array (< 2^32 <= p, already canonical) into GF."""
    x = jnp.asarray(x, dtype=jnp.uint32)
    return GF(x, jnp.zeros_like(x))


def zeros(shape=()) -> GF:
    z = jnp.zeros(shape, dtype=jnp.uint32)
    return GF(z, z)


def ones(shape=()) -> GF:
    return GF(jnp.ones(shape, dtype=jnp.uint32), jnp.zeros(shape, dtype=jnp.uint32))


def full(shape, value: int) -> GF:
    value = int(value) % MODULUS
    return GF(
        jnp.full(shape, value & 0xFFFFFFFF, dtype=jnp.uint32),
        jnp.full(shape, value >> 32, dtype=jnp.uint32),
    )


def constant(value: int) -> GF:
    return full((), value)


# ---------------------------------------------------------------------------
# u32/u64 primitive helpers (all exact in uint32 lanes)
# ---------------------------------------------------------------------------


def umul32(a: jnp.ndarray, b: jnp.ndarray):
    """Exact 32x32 -> 64 multiply via 16-bit limbs. Returns (lo, hi) u32."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + p10
    mid_carry = (mid < p01).astype(_U32)  # u32 wraparound detect
    lo = p00 + (mid << 16)
    lo_carry = (lo < p00).astype(_U32)
    hi = p11 + (mid >> 16) + (mid_carry << 16) + lo_carry
    return lo, hi


def add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 with carry-out. Returns (lo, hi, carry)."""
    lo = alo + blo
    c = (lo < alo).astype(_U32)
    hi0 = ahi + bhi
    c1 = (hi0 < ahi).astype(_U32)
    hi = hi0 + c
    c2 = (hi < hi0).astype(_U32)
    return lo, hi, c1 | c2


def sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 with borrow-out. Returns (lo, hi, borrow)."""
    lo = alo - blo
    b0 = (alo < blo).astype(_U32)
    hi0 = ahi - bhi
    b1 = (ahi < bhi).astype(_U32)
    hi = hi0 - b0
    b2 = (hi0 < b0).astype(_U32)
    return lo, hi, b1 | b2


def _geq_p(lo, hi):
    """u64 (lo,hi) >= MODULUS ?  (p = 0xFFFFFFFF_00000001)."""
    return (hi == P_HI) & (lo >= P_LO)


def _cond_sub_p(lo, hi):
    """Canonicalize a value < 2*p (as u64) by one conditional subtract."""
    ge = _geq_p(lo, hi)
    slo, shi, _ = sub64(lo, hi, P_LO, P_HI)
    return jnp.where(ge, slo, lo), jnp.where(ge, shi, hi)


# ---------------------------------------------------------------------------
# Field ops
# ---------------------------------------------------------------------------


def add(a: GF, b: GF) -> GF:
    lo, hi, carry = add64(a.lo, a.hi, b.lo, b.hi)
    # carry => result == a+b-2^64; adding EPSILON yields a+b-p (canonical,
    # cannot re-overflow since a+b < 2p).
    lo_c = lo + _EPS  # == lo - 1 (mod 2^32)
    hi_c = hi + (lo != 0).astype(_U32)
    lo1 = jnp.where(carry.astype(bool), lo_c, lo)
    hi1 = jnp.where(carry.astype(bool), hi_c, hi)
    # no-carry path may still be >= p
    lo2, hi2 = _cond_sub_p(lo1, hi1)
    return GF(lo2, hi2)


def sub(a: GF, b: GF) -> GF:
    lo, hi, borrow = sub64(a.lo, a.hi, b.lo, b.hi)
    # borrow => wrapped value is a-b+2^64; subtracting EPSILON yields a-b+p.
    lo_b = lo - _EPS  # == lo + 1 (mod 2^32)
    # lo - _EPS borrows iff lo < _EPS (i.e. lo != 0xFFFFFFFF)
    hi_b = hi - (lo < _EPS).astype(_U32)
    lo1 = jnp.where(borrow.astype(bool), lo_b, lo)
    hi1 = jnp.where(borrow.astype(bool), hi_b, hi)
    return GF(lo1, hi1)


def add_lazy(a: GF, b: GF) -> GF:
    """a + b (mod p) in NON-CANONICAL form: inputs/outputs any u64 < 2^64.

    a+b = s + c*2^64 == s + c*EPSILON (mod p); the EPSILON adjustment can wrap
    at most twice.  ~30% fewer ops than the canonical add — used inside hash
    permutations where only the final output needs canonicalizing."""
    lo, hi, c1 = add64(a.lo, a.hi, b.lo, b.hi)
    wrapped = c1.astype(bool)
    # first EPSILON adjustment
    alo = lo + _EPS
    ahi = hi + (lo != 0).astype(_U32)
    # did the adjustment itself wrap?  (ahi, alo) < (hi, lo) as u64
    w2 = wrapped & ((ahi < hi) | ((ahi == hi) & (alo < lo)))
    lo1 = jnp.where(wrapped, alo, lo)
    hi1 = jnp.where(wrapped, ahi, hi)
    # second adjustment cannot wrap again
    blo = lo1 + _EPS
    bhi = hi1 + (lo1 != 0).astype(_U32)
    lo2 = jnp.where(w2, blo, lo1)
    hi2 = jnp.where(w2, bhi, hi1)
    return GF(lo2, hi2)


def mul_lazy(a: GF, b: GF) -> GF:
    """a * b (mod p), output possibly non-canonical (< 2^64).  Valid for any
    u64 inputs; skips the final conditional subtract of `mul`."""
    ll_lo, ll_hi = umul32(a.lo, b.lo)
    lh_lo, lh_hi = umul32(a.lo, b.hi)
    hl_lo, hl_hi = umul32(a.hi, b.lo)
    hh_lo, hh_hi = umul32(a.hi, b.hi)
    x0 = ll_lo
    s1 = ll_hi + lh_lo
    c1 = (s1 < ll_hi).astype(_U32)
    x1 = s1 + hl_lo
    c2 = (x1 < s1).astype(_U32)
    carry_x2 = c1 + c2
    s2 = lh_hi + hl_hi
    d1 = (s2 < lh_hi).astype(_U32)
    s3 = s2 + hh_lo
    d2 = (s3 < s2).astype(_U32)
    x2 = s3 + carry_x2
    d3 = (x2 < s3).astype(_U32)
    x3 = hh_hi + d1 + d2 + d3
    return _reduce128_lazy(x0, x1, x2, x3)


def _reduce128_lazy(x0, x1, x2, x3) -> GF:
    """reduce128 without the final canonicalizing subtract."""
    t0lo, t0hi, borrow = sub64(x0, x1, x3, jnp.zeros_like(x3))
    blo = t0lo - _EPS
    bhi = t0hi - (t0lo < _EPS).astype(_U32)
    t0lo = jnp.where(borrow.astype(bool), blo, t0lo)
    t0hi = jnp.where(borrow.astype(bool), bhi, t0hi)
    nz = (x2 != 0).astype(_U32)
    t1lo = (0 - x2).astype(_U32)
    t1hi = x2 - nz
    lo, hi, carry = add64(t0lo, t0hi, t1lo, t1hi)
    lo_c = lo + _EPS
    hi_c = hi + (lo != 0).astype(_U32)
    lo = jnp.where(carry.astype(bool), lo_c, lo)
    hi = jnp.where(carry.astype(bool), hi_c, hi)
    return GF(lo, hi)


def canonicalize(a: GF) -> GF:
    lo, hi = _cond_sub_p(a.lo, a.hi)
    return GF(lo, hi)


def neg(a: GF) -> GF:
    is_zero = (a.lo == 0) & (a.hi == 0)
    lo, hi, _ = sub64(P_LO, P_HI, a.lo, a.hi)
    return GF(jnp.where(is_zero, 0, lo), jnp.where(is_zero, 0, hi))


def _reduce128(x0, x1, x2, x3) -> GF:
    """Reduce a 128-bit value (four u32 limbs, little-endian) mod p.

    n = n0 + 2^64*x2 + 2^96*x3 with n0 = (x1,x0):
        2^64 == 2^32 - 1,  2^96 == -1  (mod p)
    =>  n == n0 + (2^32-1)*x2 - x3.
    """
    # t0 = n0 - x3 (borrow => subtract EPSILON, i.e. add p then drop 2^64)
    t0lo, t0hi, borrow = sub64(x0, x1, x3, jnp.zeros_like(x3))
    # subtracting EPSILON from (t0lo, t0hi):
    blo = t0lo - _EPS
    bhi = t0hi - (t0lo < _EPS).astype(_U32)
    t0lo = jnp.where(borrow.astype(bool), blo, t0lo)
    t0hi = jnp.where(borrow.astype(bool), bhi, t0hi)
    # t1 = x2 * (2^32 - 1) = (x2 << 32) - x2
    nz = (x2 != 0).astype(_U32)
    t1lo = (0 - x2).astype(_U32)  # 2^32 - x2 (or 0)
    t1hi = x2 - nz
    # t2 = t0 + t1; on carry, add EPSILON (wraps at most once)
    lo, hi, carry = add64(t0lo, t0hi, t1lo, t1hi)
    lo_c = lo + _EPS
    hi_c = hi + (lo != 0).astype(_U32)
    lo = jnp.where(carry.astype(bool), lo_c, lo)
    hi = jnp.where(carry.astype(bool), hi_c, hi)
    lo, hi = _cond_sub_p(lo, hi)
    return GF(lo, hi)


def mul(a: GF, b: GF) -> GF:
    """Full 64x64 -> 128 schoolbook over u32 limbs, then fast reduction."""
    # partial products
    ll_lo, ll_hi = umul32(a.lo, b.lo)
    lh_lo, lh_hi = umul32(a.lo, b.hi)
    hl_lo, hl_hi = umul32(a.hi, b.lo)
    hh_lo, hh_hi = umul32(a.hi, b.hi)
    # x0 = ll_lo
    x0 = ll_lo
    # x1 = ll_hi + lh_lo + hl_lo  (with carries into x2)
    s1 = ll_hi + lh_lo
    c1 = (s1 < ll_hi).astype(_U32)
    x1 = s1 + hl_lo
    c2 = (x1 < s1).astype(_U32)
    carry_x2 = c1 + c2
    # x2 = lh_hi + hl_hi + hh_lo + carry_x2 (with carries into x3)
    s2 = lh_hi + hl_hi
    d1 = (s2 < lh_hi).astype(_U32)
    s3 = s2 + hh_lo
    d2 = (s3 < s2).astype(_U32)
    x2 = s3 + carry_x2
    d3 = (x2 < s3).astype(_U32)
    # x3 = hh_hi + d1 + d2 + d3 (cannot overflow: product < 2^128)
    x3 = hh_hi + d1 + d2 + d3
    return _reduce128(x0, x1, x2, x3)


def square(a: GF) -> GF:
    return mul(a, a)


def mul_const(a: GF, c: int) -> GF:
    """Multiply by a compile-time constant (broadcast)."""
    c = int(c) % MODULUS
    if c == 0:
        return zeros(a.shape)
    if c == 1:
        return a
    return mul(a, full((), c))


def add_const(a: GF, c: int) -> GF:
    c = int(c) % MODULUS
    if c == 0:
        return a
    return add(a, full((), c))


def double(a: GF) -> GF:
    return add(a, a)


def pow_const(a: GF, e: int) -> GF:
    """a^e for a static exponent (square-and-multiply, unrolled at trace)."""
    assert e >= 0
    if e == 0:
        return ones(a.shape)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result


_P_MINUS_2_BITS = [(MODULUS - 2) >> i & 1 for i in range(64)]


def _inv_impl(a: GF) -> GF:
    """a^(p-2) via square-and-multiply under lax.scan: ONE round body in
    the compiled graph instead of an unrolled ~95-mul chain (XLA:CPU
    compile time is pathologically superlinear in unrolled sequential
    chains, and eager dispatch over a remote device tunnel pays per-op
    latency ~3000 times)."""
    bits = jnp.asarray(np.array(_P_MINUS_2_BITS, dtype=np.uint32))

    def body(carry, bit):
        result, base = carry
        nr = select(bit == 1, mul(result, base), result)
        return (nr, square(base)), None

    (r, _), _ = jax.lax.scan(body, (ones(a.shape), a), bits)
    return r


_inv_jit = jax.jit(_inv_impl)


def inv(a: GF) -> GF:
    """Batched field inverse via Fermat: a^(p-2). inv(0) = 0 by convention."""
    if isinstance(a.lo, jax.core.Tracer) or isinstance(a.hi, jax.core.Tracer):
        return _inv_impl(a)
    return _inv_jit(a)


def geometric(base: int, n: int) -> GF:
    """[base^0 .. base^{n-1}] as an (n,) GF, n a power of two.

    Log-depth doubling ladder (log n vectorized multiplies, no host loop):
    arr_{k+1} = [arr_k, arr_k * base^(2^k)] — the device-resident power
    table needed by barycentric evaluation and DEEP quotient denominators."""
    assert n >= 1 and (n & (n - 1)) == 0
    arr = ones((1,))
    step = base % MODULUS
    while arr.shape[0] < n:
        arr = concat([arr, mul(arr, constant(step))], axis=0)
        step = step * step % MODULUS
    return canonicalize(arr)


def equal(a: GF, b: GF) -> jnp.ndarray:
    return (a.lo == b.lo) & (a.hi == b.hi)


def is_zero(a: GF) -> jnp.ndarray:
    return (a.lo == 0) & (a.hi == 0)


def select(mask: jnp.ndarray, a: GF, b: GF) -> GF:
    """Elementwise mask ? a : b (mask is boolean array, broadcastable)."""
    return GF(jnp.where(mask, a.lo, b.lo), jnp.where(mask, a.hi, b.hi))


def expand_dims(a: GF, axis=-1) -> GF:
    return GF(jnp.expand_dims(a.lo, axis), jnp.expand_dims(a.hi, axis))


def stack(elems, axis=0) -> GF:
    return GF(
        jnp.stack([e.lo for e in elems], axis=axis),
        jnp.stack([e.hi for e in elems], axis=axis),
    )


def concat(elems, axis=0) -> GF:
    return GF(
        jnp.concatenate([e.lo for e in elems], axis=axis),
        jnp.concatenate([e.hi for e in elems], axis=axis),
    )


def dot_mod(a: GF, b: GF, axis=-1) -> GF:
    """Sum_i a_i * b_i along `axis` (tree reduction of canonical adds)."""
    prod = mul(a, b)
    return sum_mod(prod, axis=axis)


def sum_mod(a: GF, axis=-1) -> GF:
    """Modular sum along an axis (log-depth pairwise tree)."""
    lo, hi = a.lo, a.hi
    axis = axis % lo.ndim
    n = lo.shape[axis]
    cur = GF(jnp.moveaxis(lo, axis, 0), jnp.moveaxis(hi, axis, 0))
    m = cur.lo.shape[0]
    while m > 1:
        half = m // 2
        left = GF(cur.lo[:half], cur.hi[:half])
        right = GF(cur.lo[half : 2 * half], cur.hi[half : 2 * half])
        merged = add(left, right)
        if m % 2:
            merged = GF(
                jnp.concatenate([merged.lo, cur.lo[2 * half :]], axis=0),
                jnp.concatenate([merged.hi, cur.hi[2 * half :]], axis=0),
            )
            m = half + 1
        else:
            m = half
        cur = merged
    return GF(cur.lo[0], cur.hi[0])


# ---------------------------------------------------------------------------
# Pure-python reference mirror (host/test only)
# ---------------------------------------------------------------------------


class gf_ref:
    """Host-side integer-arithmetic mirror for golden tests."""

    P = MODULUS

    @staticmethod
    def add(a: int, b: int) -> int:
        return (a + b) % MODULUS

    @staticmethod
    def sub(a: int, b: int) -> int:
        return (a - b) % MODULUS

    @staticmethod
    def mul(a: int, b: int) -> int:
        return (a * b) % MODULUS

    @staticmethod
    def neg(a: int) -> int:
        return (-a) % MODULUS

    @staticmethod
    def inv(a: int) -> int:
        return pow(a, MODULUS - 2, MODULUS) if a else 0

    @staticmethod
    def pow(a: int, e: int) -> int:
        return pow(a, e, MODULUS)
