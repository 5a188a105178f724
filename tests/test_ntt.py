"""Goldilocks NTT / LDE vs the python-int reference (ops/ntt.py)."""

import numpy as np

from zkevm_circuits_tpu.ops import gf, ntt


def test_ntt_matches_reference():
    rng = np.random.default_rng(11)
    n = 256
    coeffs = [int(x) % gf.MODULUS for x in rng.integers(0, 1 << 63, size=n)]
    got = np.asarray(ntt.ntt_jit(gf.from_u64(np.array(coeffs, np.uint64))).astype_u64())
    ref = np.array(ntt.ntt_ref(coeffs), np.uint64)
    np.testing.assert_array_equal(got, ref)


def test_roundtrip_and_batch():
    rng = np.random.default_rng(12)
    a = rng.integers(0, gf.MODULUS, size=(4, 512), dtype=np.uint64)
    g = gf.from_u64(a)
    back = np.asarray(ntt.intt_jit(ntt.ntt_jit(g)).astype_u64())
    np.testing.assert_array_equal(back, a)


def test_lde_degree_and_consistency():
    rng = np.random.default_rng(13)
    n, rate = 64, 2
    coeffs = [int(x) % gf.MODULUS for x in rng.integers(0, 1 << 62, size=n)]
    evals = ntt.ntt_ref(coeffs)
    ext = np.asarray(
        ntt.lde(gf.from_u64(np.array(evals, np.uint64)), rate).astype_u64()
    )
    # the extension evaluates the SAME polynomial on the shifted big subgroup
    big_n = n << rate
    w = ntt.root_of_unity(int(np.log2(big_n)))
    shift = gf.MULTIPLICATIVE_GENERATOR
    for i in [0, 1, 7, big_n - 1]:
        x = shift * pow(w, i, gf.MODULUS) % gf.MODULUS
        expect = 0
        for c in reversed(coeffs):
            expect = (expect * x + c) % gf.MODULUS
        assert int(ext[i]) == expect, i
    # interpolating the extension back gives the same coefficients (degree<n)
    big_coeffs = ntt.intt_ref([int(v) for v in ext])
    shift_inv = pow(shift, gf.MODULUS - 2, gf.MODULUS)
    unshifted = [
        c * pow(shift_inv, i, gf.MODULUS) % gf.MODULUS
        for i, c in enumerate(big_coeffs)
    ]
    assert unshifted[:n] == [c % gf.MODULUS for c in coeffs]
    assert all(c == 0 for c in unshifted[n:])
