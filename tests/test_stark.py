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


def test_tampered_ood_trace_value_rejected(honest_proof):
    import copy

    proof = copy.deepcopy(honest_proof)
    proof.ood = dict(proof.ood)
    tz = np.array(proof.ood["trace_z"], copy=True)
    tz[0] ^= 1
    proof.ood["trace_z"] = tz
    assert not verify(proof, _air(), PARAMS)


def test_tampered_ood_quotient_value_rejected(honest_proof):
    import copy

    proof = copy.deepcopy(honest_proof)
    proof.ood = dict(proof.ood)
    proof.ood["q_z"] = (proof.ood["q_z"] ^ 1) % gf.MODULUS
    assert not verify(proof, _air(), PARAMS)


def test_tampered_quotient_opening_rejected(honest_proof):
    import copy

    proof = copy.deepcopy(honest_proof)
    op = proof.trace_openings[0]["cur"]
    op["q_row"] = np.array(op["q_row"], copy=True)
    op["q_row"][0, 0] ^= 1
    assert not verify(proof, _air(), PARAMS)


def test_high_degree_trace_attack_rejected():
    """The attack the pre-DEEP protocol ACCEPTED (VERDICT r3 missing #4).

    A malicious prover commits per-point values on the LDE coset D that
    satisfy the transition constraint POINTWISE on D (acc' = acc * factor
    with factor defined as the pointwise ratio), so the composition Q is
    identically zero — trivially low degree — without the columns being
    degree < n polynomials (they encode NO trace on H).  The old verifier
    recomputed the composition at query points (pointwise zero: passes) and
    FRI'd the zero codeword (low degree: passes) -> accepted a proof of
    nothing.  Under DEEP the codeword includes (T_i(x) - T_i(z))/(x - z)
    for the committed columns; a high-degree column makes it high degree,
    so the FRI low-degree assertion fails on the prover side — the forgery
    is UNBUILDABLE (and any bypass of the assert dies in fri.verify)."""
    from zkevm_circuits_tpu.ops import fri, ntt
    from zkevm_circuits_tpu.prover import stark

    air, params = _air(), PARAMS
    n = 1 << params.log_n
    N = n << params.log_blowup
    blowup = 1 << params.log_blowup
    rng = np.random.default_rng(0xA77AC4)
    acc = rng.integers(1, gf.MODULUS, size=N, dtype=np.uint64)
    acc_next = np.roll(acc, -blowup)
    inv = np.array(
        [pow(int(a), gf.MODULUS - 2, gf.MODULUS) for a in acc],
        dtype=np.uint64,
    )
    factor = (acc_next.astype(object) * inv.astype(object)) % gf.MODULUS
    lde_cols = gf.from_u64(np.stack([factor.astype(np.uint64), acc]))

    # replay prove()'s flow with the forged on-domain evaluations
    tree = stark._commit_evals(lde_cols, params)
    ch, tr = stark.challenges_from_cap(tree["cap"], air)
    alpha = int(np.asarray(tr.challenge_ext().c0.astype_u64()))
    quotient = stark._compose_domain(lde_cols, air, alpha, params, None, ch)
    assert int(np.asarray(quotient.astype_u64()).max()) == 0  # pointwise-satisfying
    q_tree = stark._commit_evals(quotient, params)
    tr.absorb(q_tree["cap"])
    z = stark._ood_point(tr, params.log_n, params.log_blowup,
                         params.coset_shift)
    wz = z * ntt.root_of_unity(params.log_n) % gf.MODULUS
    # the forger's best OOD claims: barycentric over D (degree < N readout)
    t_z = stark._barycentric_eval(
        lde_cols, z, params.log_n + params.log_blowup, params.coset_shift)
    t_wz = stark._barycentric_eval(
        lde_cols, wz, params.log_n + params.log_blowup, params.coset_shift)
    ood = np.concatenate([
        np.asarray(t_z.astype_u64()), np.asarray(t_wz.astype_u64()),
        [np.uint64(0)]])
    tr.absorb(gf.from_u64(ood))
    lam = int(np.asarray(tr.challenge_ext().c0.astype_u64()))
    lpows, lam_m, lam_2m = stark._lambda_weights(lam, air.total_cols)
    xs = gf.from_u64(stark._domain_points(
        params.log_n + params.log_blowup, params.coset_shift))
    deep = stark._deep_combine(
        gf.GF(lde_cols.lo.T, lde_cols.hi.T), quotient, lpows,
        stark._alpha_gf(lam_m), stark._alpha_gf(lam_2m),
        gf.sum_mod(gf.mul(t_z, lpows), axis=-1),
        gf.sum_mod(gf.mul(t_wz, lpows), axis=-1),
        stark._alpha_gf(0),
        gf.inv(gf.sub(xs, gf.constant(z))),
        gf.inv(gf.sub(xs, gf.constant(wz))),
    )
    with pytest.raises(AssertionError):
        fri.prove(deep, stark._fri_params(air, params))
