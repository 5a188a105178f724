"""Fiat-Shamir challenge derivation + grand-product accumulation.

Reference parity: `src/utils.rs` in matter-labs/era-zkevm_circuits —
`produce_fs_challenges` (:12-78) and `accumulate_grand_products` (:81-137),
used by every sorter/permutation circuit (ram_permutation, storage_validity,
log_sorter, sort_decommittment_requests).

Semantics replicated exactly:
  * fs_input = unsorted.tail ++ [unsorted.length] ++ sorted.tail ++ [sorted.length]
  * sponge: empty state, length specialization with len(fs_input), absorb in
    zero-padded rate-8 chunks with replacement, permute per chunk.
  * squeeze: NUM_REPETITIONS x NUM_CHALLENGES matrix whose column 0 is
    fixed to ONE (the reference's `.skip(1)` — ref utils.rs:63-66!), the rest
    drawn from rate lanes, re-permuting when 8 are exhausted.
  * per-element factor: challenges[ENC] + sum_i enc_i * challenges[i]
    (an FMA fold), and the accumulator multiplies the factor in where
    `should_accumulate` — ref utils.rs:104-135.

TPU design: the factor computation is row-parallel; the running product is an
associative modular product -> `jax.lax.associative_scan` gives the whole
per-row accumulator column in log depth.  Cross-shard combination is a scan
over per-shard partial products (see parallel/).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import gf, poseidon2
from ..ops.gf import GF
from ..ops.queues import QueueState

DEFAULT_NUM_REPETITIONS = 2  # DEFAULT_NUM_PERMUTATION_ARGUMENT_REPETITIONS (ref lib.rs:39)


def produce_fs_challenges(
    unsorted: QueueState,
    sorted_q: QueueState,
    num_challenges: int,
    num_repetitions: int = DEFAULT_NUM_REPETITIONS,
) -> GF:
    """Derive the (num_repetitions, num_challenges) challenge matrix.

    Tail states only (QueueTailState in the reference): lanes + length.
    Returns GF of shape (num_repetitions, num_challenges); column 0 == 1.
    """
    fs_input = gf.concat(
        [
            unsorted.tail,
            gf.expand_dims(gf.from_u32(unsorted.length), -1),
            sorted_q.tail,
            gf.expand_dims(gf.from_u32(sorted_q.length), -1),
        ],
        axis=-1,
    )
    n = fs_input.shape[-1]
    state = poseidon2.empty_state(fs_input.shape[:-1])
    state = poseidon2.apply_length_specialization(state, jnp.uint32(n))
    padded = n + (-n) % poseidon2.RATE
    if padded != n:
        fs_input = gf.concat(
            [fs_input, gf.zeros(fs_input.shape[:-1] + (padded - n,))], axis=-1
        )
    for i in range(0, padded, poseidon2.RATE):
        state = poseidon2.absorb_round(fs_input[..., i : i + poseidon2.RATE], state)

    # squeeze with column 0 pinned to ONE (reference's skip(1))
    needed = num_repetitions * (num_challenges - 1)
    drawn = []
    available = list(range(poseidon2.RATE))
    while len(drawn) < needed:
        take = min(needed - len(drawn), len(available))
        for k in range(take):
            drawn.append(state[..., available[k]])
        if len(drawn) < needed:
            state = poseidon2.permutation(state)
    rows = []
    for rep in range(num_repetitions):
        cols = [gf.ones(fs_input.shape[:-1])]
        cols.extend(drawn[rep * (num_challenges - 1) : (rep + 1) * (num_challenges - 1)])
        rows.append(gf.stack(cols, axis=-1))
    return gf.stack(rows, axis=-2)  # (..., num_repetitions, num_challenges)


def grand_product_factors(encodings: GF, challenges: GF) -> GF:
    """Per-element multiplicative factors, row-parallel.

    encodings: (n, ENC); challenges: (R, ENC+1).
    Returns (n, R): factor[i, r] = challenges[r, ENC] + sum_j enc[i,j]*challenges[r,j].
    """
    enc_len = encodings.shape[-1]
    lin = challenges[..., :enc_len]  # (R, ENC)
    const = challenges[..., enc_len]  # (R,)
    # (n, 1, ENC) * (R, ENC) -> sum over ENC -> (n, R)
    prods = gf.mul(gf.expand_dims(encodings, -2), lin)
    return gf.add(gf.sum_mod(prods, axis=-1), const)


def masked_factors(factors: GF, should_accumulate: jnp.ndarray) -> GF:
    """Replace factors with 1 where the element is not accumulated."""
    return gf.select(
        jnp.expand_dims(should_accumulate, -1), factors, gf.ones(factors.shape)
    )


def product_accumulate(factors: GF, init: GF, axis: int = 0) -> GF:
    """Inclusive running product along `axis` seeded with `init`.

    factors: (n, R); init: (R,).  Returns (n, R) where out[i] =
    init * prod_{k<=i} factors[k].  log-depth via associative_scan.
    """
    scanned = jax.lax.associative_scan(gf.mul, factors, axis=axis)
    return gf.mul(scanned, init)


def final_product(factors: GF, init: GF, axis: int = 0) -> GF:
    """init * prod(factors) along axis (tree reduction)."""
    n = factors.shape[axis]
    cur = factors
    while n > 1:
        half = n // 2
        idx_a = [slice(None)] * cur.ndim
        idx_b = [slice(None)] * cur.ndim
        idx_r = [slice(None)] * cur.ndim
        idx_a[axis] = slice(0, half)
        idx_b[axis] = slice(half, 2 * half)
        idx_r[axis] = slice(2 * half, None)
        merged = gf.mul(cur[tuple(idx_a)], cur[tuple(idx_b)])
        if n % 2:
            merged = gf.concat([merged, cur[tuple(idx_r)]], axis=axis)
            n = half + 1
        else:
            n = half
        cur = merged
    sq = [slice(None)] * cur.ndim
    sq[axis] = 0
    return gf.mul(cur[tuple(sq)], init)
