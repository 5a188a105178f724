"""Minimal STARK (prover/stark.py): the grand-product accumulator AIR —
the first surrogate-free proof in the stack.

AIR = the transition of ram_permutation's permutation argument
(ref src/utils.rs:81-137): columns [factor, acc] with
    C(cur, nxt) = nxt.acc - cur.acc * cur.factor   (degree 2).
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.ops import gf
from zkevm_circuits_tpu.prover import AirSpec, StarkParams, prove, verify

LOG_N = 6


import functools


@functools.lru_cache(maxsize=1)
def _air():
    def constraints(cur, nxt, ch):
        # cols: 0 = factor, 1 = accumulator
        return [gf.sub(nxt[..., 1], gf.mul(cur[..., 1], cur[..., 0]))]

    return AirSpec(num_cols=2, max_degree=2, constraints=constraints)


def _trace(seed=3):
    n = 1 << LOG_N
    rng = np.random.default_rng(seed)
    factors = [int(x) % gf.MODULUS for x in rng.integers(1, 1 << 62, size=n)]
    acc = [1]
    for i in range(n - 1):
        acc.append(acc[-1] * factors[i] % gf.MODULUS)
    cols = np.array([factors, acc], dtype=np.uint64)
    return gf.from_u64(cols)


PARAMS = StarkParams(log_n=LOG_N, log_blowup=2, num_queries=12, cap_log2=1)


@pytest.fixture(scope="module")
def honest_proof():
    return prove(_trace(), _air(), PARAMS)


def test_honest_trace_accepts(honest_proof):
    assert verify(honest_proof, _air(), PARAMS)


def test_invalid_trace_rejected_or_unprovable():
    n = 1 << LOG_N
    bad = np.asarray(_trace().astype_u64()).copy()
    bad[1, n // 2] ^= 1  # break one accumulator step
    try:
        proof = prove(gf.from_u64(bad), _air(), PARAMS)
    except AssertionError:
        return  # quotient not low degree: prover refuses — the honest outcome
    assert not verify(proof, _air(), PARAMS)


def test_tampered_trace_opening_rejected(honest_proof):
    import copy

    proof = copy.deepcopy(honest_proof)
    proof.trace_openings[0]["cur"]["rows"][0] = np.array(
        proof.trace_openings[0]["cur"]["rows"][0], copy=True
    )
    proof.trace_openings[0]["cur"]["rows"][0][0, 0] ^= 1
    assert not verify(proof, _air(), PARAMS)


def test_swapped_cap_rejected(honest_proof):
    import copy

    other = prove(_trace(seed=8), _air(), PARAMS)
    proof = copy.deepcopy(honest_proof)
    proof.caps = list(other.caps)
    assert not verify(proof, _air(), PARAMS)
