"""VM lookup tables + lookup machinery + GF(p^2) extension."""

import numpy as np
import jax.numpy as jnp

from zkevm_circuits_tpu import tables
from zkevm_circuits_tpu.ops import gf, gf2
from zkevm_circuits_tpu.ops.gf2 import gf2_ref

RNG = np.random.default_rng(0x6F2)


def test_bitshift_table_contents():
    t = tables.create_bitshift_table()
    assert t.shape == (1024, 3)
    # shift=40, row 0 covers limbs 0,1 of 2^40: limb1 = 2^8
    row = t[40 * 4]
    assert row[0] == 40
    assert row[2] == (1 << 40) >> 32
    # reconstruct 2^shift from its four rows
    for shift in (0, 31, 63, 200, 255):
        val = 0
        for idx in range(4):
            _, lo, hi = t[shift * 4 + idx]
            val |= int(lo) << (64 * idx)
            val |= int(hi) << (64 * idx + 32)
        assert val == 1 << shift, shift


def test_conditional_table():
    t = tables.create_conditionals_resolution_table()
    assert t.shape == (64, 3)
    lookup = {(int(r[0]), int(r[1])): int(r[2]) for r in t}
    assert lookup[(tables.COND_ALWAYS, 0)] == 1
    assert lookup[(tables.COND_EQ, 0b010)] == 1
    assert lookup[(tables.COND_EQ, 0b101)] == 0
    assert lookup[(tables.COND_GE, 0b100)] == 1  # gt
    assert lookup[(tables.COND_GE, 0b010)] == 1  # eq
    assert lookup[(tables.COND_GT_OR_LT, 0b001)] == 1  # of/lt


def test_bitmask_and_cleanup_tables():
    reg = tables.create_register_index_to_bitmask_table()
    assert int(reg[0][1]) == 0 and int(reg[5][1]) == 1 << 4
    uma = tables.create_uma_ptr_read_cleanup_table()
    assert int(uma[0][1]) == 0xFFFFFFFF
    assert int(uma[8][1]) == 0xFFFFFF00


def test_lookup_check():
    t = tables.create_uma_ptr_read_cleanup_table()
    queries = np.asarray([[3, 0xFFFFFFF8, 0], [0, 0xFFFFFFFF, 0]], dtype=np.uint64)
    ids = tables.lookup_row_ids(t, queries)
    ok = tables.lookup_check(t, jnp.asarray(queries.astype(np.uint32)), jnp.asarray(ids))
    assert bool(np.asarray(ok).all())
    bad = queries.copy()
    bad[0][1] ^= 1
    ok2 = tables.lookup_check(t, jnp.asarray(bad.astype(np.uint32)), jnp.asarray(ids))
    assert not bool(np.asarray(ok2).all())


def test_gf2_ops():
    n = 64
    P = gf.MODULUS
    a = [(int(x), int(y)) for x, y in zip(
        RNG.integers(0, P, n, dtype=np.uint64), RNG.integers(0, P, n, dtype=np.uint64))]
    b = [(int(x), int(y)) for x, y in zip(
        RNG.integers(0, P, n, dtype=np.uint64), RNG.integers(0, P, n, dtype=np.uint64))]
    ga = gf2.GF2(gf.from_u64(np.array([x[0] for x in a], np.uint64)),
                 gf.from_u64(np.array([x[1] for x in a], np.uint64)))
    gb = gf2.GF2(gf.from_u64(np.array([x[0] for x in b], np.uint64)),
                 gf.from_u64(np.array([x[1] for x in b], np.uint64)))
    got = gf2.mul(ga, gb)
    c0 = got.c0.astype_u64()
    c1 = got.c1.astype_u64()
    for i in range(n):
        e0, e1 = gf2_ref.mul(a[i], b[i])
        assert (int(c0[i]), int(c1[i])) == (e0, e1), i
    # inverse round-trip
    gi = gf2.inv(ga)
    prod = gf2.mul(ga, gi)
    np.testing.assert_array_equal(prod.c0.astype_u64(), np.ones(n, np.uint64))
    np.testing.assert_array_equal(prod.c1.astype_u64(), np.zeros(n, np.uint64))


def test_profiling_helpers():
    import jax
    from zkevm_circuits_tpu.utils import profiling

    f = jax.jit(lambda x: x * 2)
    t = profiling.time_jitted(f, jnp.arange(8))
    assert t["compile_s"] > 0 and t["steady_s"] >= 0
    rep = profiling.residual_report({"ok": jnp.ones(5, bool), "bad": jnp.asarray([True, False, True])})
    assert rep["ok"]["failing"] == 0
    assert rep["bad"]["failing"] == 1 and rep["bad"]["first_failure"] == 1
    text = profiling.format_residual_report({"ok": jnp.ones(2, bool)})
    assert "ok" in text
