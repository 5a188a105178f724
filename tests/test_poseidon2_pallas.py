"""Fused Pallas Poseidon2 kernel vs the portable permutation.

Runs only on real TPU hardware: the suite's CPU backend cannot execute
Mosaic kernels, and interpret mode materializes the 30 unrolled rounds as
one giant XLA:CPU graph (the known unroll hang — see ops/poseidon2.py's
scan rationale).  The driver's verify pass and bench.py exercise it on the
real chip.
"""

import numpy as np
import pytest

import jax


def _tpu_available() -> bool:
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:
        return False


@pytest.mark.skipif(not _tpu_available(), reason="pallas kernel needs a TPU")
def test_pallas_matches_portable():
    from zkevm_circuits_tpu.ops import gf, poseidon2 as p2
    from zkevm_circuits_tpu.ops.poseidon2_pallas import permutation_pallas

    rng = np.random.default_rng(7)
    st = gf.from_u64(rng.integers(0, gf.MODULUS, size=(1000, 12), dtype=np.uint64))
    ref = p2.permutation(st)
    got = permutation_pallas(st, tile=512)
    np.testing.assert_array_equal(
        np.asarray(ref.astype_u64()), np.asarray(got.astype_u64())
    )
