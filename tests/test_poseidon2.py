"""Poseidon2 permutation: JAX batch vs pure-python mirror + golden pinning."""

import numpy as np

from zkevm_circuits_tpu.ops import gf, poseidon2
from zkevm_circuits_tpu.utils import poseidon2_ref

P = gf.MODULUS
RNG = np.random.default_rng(0xB00)


def test_jax_matches_python_mirror():
    batch = 16
    states = RNG.integers(0, P, size=(batch, 12), dtype=np.uint64)
    out = poseidon2.permutation(gf.from_u64(states)).astype_u64()
    for b in range(batch):
        expected = poseidon2_ref.permutation([int(x) for x in states[b]])
        assert [int(x) for x in out[b]] == expected, b


def test_golden_pin():
    """Freeze the instance: any change to constants/structure must fail here.

    Values pinned 2026-08-17 (round 1) from the Grain-LFSR-generated
    Poseidon2-Goldilocks instance; see utils/grain.py."""
    assert poseidon2_ref.permutation(list(range(12)))[:4] == [
        8375451536246023917, 1236755478162261938,
        1674308928158675145, 8949911864487308360,
    ]
    assert poseidon2_ref.permutation([0] * 12)[:4] == [
        10924663382038992981, 16968660912557243657,
        1726933205036856753, 11507966891164897058,
    ]
    assert poseidon2_ref.hash_padded([1, 2, 3]) == [
        13166768966533304066, 16646397356309775833,
        9541429963089087183, 11516789727474759615,
    ]
    # the instance id every sponge-derived value depends on (ops/poseidon2.py)
    assert poseidon2.INSTANCE_ID == 0x6354F5E6501D2929


def test_hash_padded_matches():
    for n in [1, 4, 8, 9, 16, 20, 21]:
        vals = RNG.integers(0, P, size=n, dtype=np.uint64)
        got = poseidon2.hash_padded(gf.from_u64(vals.reshape(1, n))).astype_u64()
        exp = poseidon2_ref.hash_padded([int(v) for v in vals])
        assert [int(x) for x in got[0]] == exp, n


def test_diffusion():
    """Flipping one input lane changes all output lanes (sanity)."""
    a = [7] * 12
    b = list(a)
    b[5] = 8
    ya = poseidon2_ref.permutation(a)
    yb = poseidon2_ref.permutation(b)
    assert all(x != y for x, y in zip(ya, yb))
