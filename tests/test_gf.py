"""Randomized + edge-case cross-checks of the Goldilocks field vs python ints."""

import numpy as np
import pytest

from zkevm_circuits_tpu.ops import gf
from zkevm_circuits_tpu.ops.gf import gf_ref

P = gf.MODULUS
RNG = np.random.default_rng(0xE5A)


def rand_elems(n, include_edges=True):
    vals = RNG.integers(0, P, size=n, dtype=np.uint64)
    if include_edges:
        edges = np.array(
            [0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, P >> 1, (1 << 63)],
            dtype=np.uint64,
        ) % np.uint64(P)
        vals[: len(edges)] = edges
    return vals


def as_int(x):
    return [int(v) for v in x]


@pytest.mark.parametrize("n", [257])
def test_add_sub_neg(n):
    a = rand_elems(n)
    b = rand_elems(n)
    RNG.shuffle(b)
    ga, gb = gf.from_u64(a), gf.from_u64(b)
    got_add = gf.add(ga, gb).astype_u64()
    got_sub = gf.sub(ga, gb).astype_u64()
    got_neg = gf.neg(ga).astype_u64()
    for i, (x, y) in enumerate(zip(as_int(a), as_int(b))):
        assert int(got_add[i]) == gf_ref.add(x, y), (x, y)
        assert int(got_sub[i]) == gf_ref.sub(x, y), (x, y)
        assert int(got_neg[i]) == gf_ref.neg(x), x


def test_mul_exhaustive_edges():
    edges = [0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, 0xFFFFFFFE00000002]
    a = np.array([x for x in edges for _ in edges], dtype=np.uint64)
    b = np.array(edges * len(edges), dtype=np.uint64)
    got = gf.mul(gf.from_u64(a), gf.from_u64(b)).astype_u64()
    for i, (x, y) in enumerate(zip(as_int(a), as_int(b))):
        assert int(got[i]) == gf_ref.mul(x, y), (x, y)


def test_mul_random():
    n = 4096
    a = rand_elems(n)
    b = rand_elems(n)
    RNG.shuffle(b)
    got = gf.mul(gf.from_u64(a), gf.from_u64(b)).astype_u64()
    for i, (x, y) in enumerate(zip(as_int(a), as_int(b))):
        assert int(got[i]) == gf_ref.mul(x, y), (x, y)


def test_inverse():
    n = 129
    a = rand_elems(n)
    a[0] = 0  # inv(0) == 0 convention
    got = gf.inv(gf.from_u64(a)).astype_u64()
    for i, x in enumerate(as_int(a)):
        assert int(got[i]) == gf_ref.inv(x), x


def test_pow_const():
    a = rand_elems(33)
    for e in [0, 1, 2, 3, 7, 65537]:
        got = gf.pow_const(gf.from_u64(a), e).astype_u64()
        for i, x in enumerate(as_int(a)):
            assert int(got[i]) == gf_ref.pow(x, e), (x, e)


def test_sum_dot():
    a = rand_elems(100).reshape(10, 10)
    b = rand_elems(100).reshape(10, 10)
    ga, gb = gf.from_u64(a), gf.from_u64(b)
    got_sum = gf.sum_mod(ga, axis=1).astype_u64()
    got_dot = gf.dot_mod(ga, gb, axis=1).astype_u64()
    for i in range(10):
        s = sum(int(v) for v in a[i]) % P
        d = sum(int(x) * int(y) for x, y in zip(a[i], b[i])) % P
        assert int(got_sum[i]) == s
        assert int(got_dot[i]) == d


def test_select_equal():
    a = rand_elems(64)
    b = rand_elems(64)
    RNG.shuffle(b)
    ga, gb = gf.from_u64(a), gf.from_u64(b)
    mask = np.arange(64) % 2 == 0
    sel = gf.select(mask, ga, gb).astype_u64()
    np.testing.assert_array_equal(sel, np.where(mask, a, b))
    eq = np.asarray(gf.equal(ga, ga))
    assert eq.all()


def test_jit_and_vmap_compat():
    import jax

    a = gf.from_u64(rand_elems(128))
    b = gf.from_u64(rand_elems(128))
    f = jax.jit(lambda x, y: gf.mul(gf.add(x, y), y))
    out = f(a, b)
    expected = gf.mul(gf.add(a, b), b)
    np.testing.assert_array_equal(out.astype_u64(), expected.astype_u64())


def test_lazy_ops():
    """non-canonical add/mul agree with canonical math after canonicalize."""
    import jax.numpy as jnp
    from zkevm_circuits_tpu.ops.gf import GF

    n = 1024
    # include values >= p (non-canonical u64 inputs)
    a64 = RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)
    b64 = RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)
    edges = np.array([P, P + 1, (1 << 64) - 1, P - 1, 0, 1], dtype=np.uint64)
    a64[: len(edges)] = edges
    b64[: len(edges)] = edges[::-1]
    ga = GF(jnp.asarray((a64 & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((a64 >> 32).astype(np.uint32)))
    gb = GF(jnp.asarray((b64 & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((b64 >> 32).astype(np.uint32)))
    got_add = gf.canonicalize(gf.add_lazy(ga, gb)).astype_u64()
    got_mul = gf.canonicalize(gf.mul_lazy(ga, gb)).astype_u64()
    for i in range(n):
        assert int(got_add[i]) == (int(a64[i]) + int(b64[i])) % P, i
        assert int(got_mul[i]) == (int(a64[i]) * int(b64[i])) % P, i
