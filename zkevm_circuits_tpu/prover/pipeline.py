"""Circuit -> STARK pipeline: real proofs for real circuit arguments.

First user: ram_permutation's permutation grand-product argument
(ref `src/ram_permutation/mod.rs:111-116` + `src/utils.rs:81-137`): the
NUM_REPETITIONS=2 challenge-compressed factor streams over the unsorted and
sorted memory-query encodings, their running products, product equality at
the end, and the final products exposed as PUBLIC values — all proven by
the coset-quotient STARK in `prover/stark.py` instead of being re-evaluated
by a trusting checker.

This replaces the `is_valid` bit of the recursion layer's ProofSurrogate
with the verdict of an actual low-degree argument for this sub-relation
(`as_recursion_proof`): the first surrogate-free link between the base
layer and the aggregation tree.  Scope note (honest): the STARK's public
values are the grand products, not yet the Poseidon2 compact-form
commitment — binding the sponge itself into the AIR is the remaining step
to full boojum-shape recursion.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

from ..models import recursion
from ..ops import gf, poseidon2
from ..ops.gf import GF
from ..utils import challenges as chal
from .stark import AirSpec, StarkParams, StarkProof, prove, verify

NUM_REPS = chal.DEFAULT_NUM_REPETITIONS  # 2


@functools.lru_cache(maxsize=1)
def permutation_air() -> AirSpec:
    """AIR of the two-repetition permutation argument.

    Columns: [f_u0, f_u1, f_s0, f_s1, lhs0, lhs1, rhs0, rhs1]
      - f_*r: challenge-compressed factor of row i (masked to 1 when the
        row is padding — masking happens at witness build, so the padded
        tail satisfies the same transition).
      - lhs/rhs_r: running products INCLUDING row i.
    Transitions (degree 2): acc[i+1] = acc[i] * f[i+1].
    First row (affine): acc[0] = f[0].
    Last row (affine): lhs == rhs (permutation accepted) and lhs == public.
    """

    def constraints(cur, nxt, ch):
        vals = []
        for r in range(NUM_REPS):
            vals.append(gf.sub(nxt[..., 4 + r], gf.mul(cur[..., 4 + r], nxt[..., r])))
            vals.append(gf.sub(nxt[..., 6 + r], gf.mul(cur[..., 6 + r], nxt[..., 2 + r])))
        return vals

    def first_row(row, public, ch):
        vals = []
        for r in range(NUM_REPS):
            vals.append(gf.sub(row[..., 4 + r], row[..., r]))
            vals.append(gf.sub(row[..., 6 + r], row[..., 2 + r]))
        return vals

    def last_row(row, public, ch):
        vals = []
        for r in range(NUM_REPS):
            vals.append(gf.sub(row[..., 4 + r], row[..., 6 + r]))
            vals.append(gf.sub(row[..., 4 + r], public[r]))
        return vals

    return AirSpec(
        num_cols=4 * NUM_REPS,
        max_degree=2,
        constraints=constraints,
        first_row=first_row,
        last_row=last_row,
        num_public=NUM_REPS,
    )


def permutation_trace(w) -> Tuple[GF, GF]:
    """(8, n) trace + (2,) public final products from a RamPermutationWitness.

    Factors are re-derived from the witness's committed encodings and
    challenges (chal.grand_product_factors) with padding rows masked to 1,
    exactly as `eval_constraints` does — the STARK proves the SAME relation
    the checker evaluates."""
    f_u = chal.masked_factors(
        chal.grand_product_factors(w.enc_unsorted, w.challenges), w.execute
    )
    f_s = chal.masked_factors(
        chal.grand_product_factors(w.enc_sorted, w.challenges), w.execute
    )
    n = f_u.shape[0]
    assert n & (n - 1) == 0, "witness length must be a power of two"
    cols = [f_u[..., r] for r in range(NUM_REPS)]
    cols += [f_s[..., r] for r in range(NUM_REPS)]
    cols += [w.lhs[..., r] for r in range(NUM_REPS)]
    cols += [w.rhs[..., r] for r in range(NUM_REPS)]
    trace = gf.stack(cols, axis=0)
    public = w.lhs[n - 1]  # (NUM_REPS,) final products (== rhs at accept)
    return trace, public


def prove_permutation_argument(
    w, params: Optional[StarkParams] = None
) -> Tuple[StarkProof, GF, StarkParams]:
    trace, public = permutation_trace(w)
    if params is None:
        log_n = int(trace.shape[1]).bit_length() - 1
        params = StarkParams(log_n=log_n)
    proof = prove(trace, permutation_air(), params, public)
    return proof, public, params


def verify_permutation_argument(proof: StarkProof, public: GF,
                                params: StarkParams) -> bool:
    return verify(proof, permutation_air(), params, public)


def stark_vk_commitment(air: AirSpec, params: StarkParams) -> GF:
    """(4,) Poseidon2 commitment to the STARK verifier's parameters — the
    role of the reference's VK commitment (recursion/leaf_layer/mod.rs:91-127):
    a proof only counts under the key it was checked with."""
    ident = np.array(
        [air.num_cols, air.max_degree, air.num_public, params.log_n,
         params.log_blowup, params.num_queries, params.cap_log2,
         params.coset_shift % gf.MODULUS],
        dtype=np.uint64,
    )
    return poseidon2.hash_padded(gf.from_u64(ident))[:4]


def as_recursion_proof(
    proof: StarkProof,
    air: AirSpec,
    params: StarkParams,
    public: GF,
    public_input_commitment: GF,
) -> recursion.ProofSurrogate:
    """Adapter into the aggregation tree: `is_valid` is the REAL verifier
    verdict (not witness-claimed), `vk_commitment` pins the verifying key."""
    ok = verify(proof, air, params, public)
    return recursion.ProofSurrogate(
        public_input=public_input_commitment,
        is_valid=bool(ok),
        vk_commitment=stark_vk_commitment(air, params),
    )
