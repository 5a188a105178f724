"""Minimal STARK: trace commitment + quotient low-degree argument.

Proves that committed trace columns T_0..T_{m-1} (length n, Goldilocks)
satisfy an AIR with
  * transition constraints: C_k(T(w^i), T(w^{i+1})) = 0 for every i < n-1,
  * first-row constraints:  F_j(T(w^0), public) = 0,
  * last-row constraints:   L_j(T(w^{n-1}), public) = 0,
where each constraint is a low-degree polynomial map of the named rows
(the shape of EVERY residual in this framework's circuits — e.g. the
grand-product accumulator transition acc' = acc * factor of ram_permutation,
ref `src/utils.rs:81-137`, is degree 2).  The `public` vector is absorbed
into the Fiat-Shamir transcript, so a proof is bound to its claimed public
values (the role of the reference's public-input commitment).

Protocol (a standard coset-quotient STARK, no DEEP sampling — documented
soundness simplification until the full boojum-parity prover lands):

  1. LDE every column to the coset D = shift*<W> of size n*blowup and
     Merkle-commit all columns row-wise (one leaf per domain point).
  2. Fiat-Shamir alpha (after absorbing cap + public); compose
       Q = [sum_k a^k C_k] / Z_trans + [sum_j a^j F_j]/(x-1)
           + [sum_j a^j L_j]/(x - w^{n-1})
     evaluated POINTWISE on D — the next-row value at x is the column at
     W^blowup * index (a pure roll: D is in natural order, w = W^blowup).
     Z_trans(x) = (x^n - 1)/(x - w^{n-1}) vanishes on H minus the last row.
     Q is a polynomial of degree < max((d-1)n, n-1) iff every constraint
     holds (whp over alpha).
  3. Prove Q low-degree with FRI (ops/fri.py), at a rate tightened by
     ceil(log2(d-1)) extra folds so the bound matches the quotient degree.
  4. Queries: FRI's layer-0 positions; the verifier opens the trace rows at
     x and w*x, recomputes the composition, and checks it equals the FRI
     layer-0 codeword value — binding the low-degree quotient to the
     COMMITTED trace.

TPU shape: steps 1-3 are whole-domain batched device ops (NTTs, one
evaluator call over all LDE rows, Merkle levels); only Fiat-Shamir ints and
query packaging run on host.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List, Optional

import numpy as np

from ..ops import fri, gf, merkle, ntt
from ..ops.fri import Transcript
from ..ops.gf import GF, MODULUS


@dataclasses.dataclass(frozen=True)
class AirSpec:
    """num_cols columns; `constraints(cur, nxt)` maps two (batch, num_cols)
    GF row-views to a list of (batch,) GF transition values, each of total
    degree <= max_degree in the trace cells.  `first_row(row, public)` /
    `last_row(row, public)` (optional) map a (batch, num_cols) row-view plus
    the (num_public,) GF public vector to boundary constraint values.
    Boundary constraints must be AFFINE in the trace cells (degree <= 1):
    their quotient by (x - pt) has degree d(n-1)-1, which exceeds the FRI
    bound for d >= 2 (transitions get the slack back from Z_trans's degree
    n-1; boundaries divide by a degree-1 factor only)."""

    num_cols: int
    max_degree: int
    constraints: Callable
    first_row: Optional[Callable] = None
    last_row: Optional[Callable] = None
    num_public: int = 0

    def num_constraints(self) -> int:
        probe = gf.zeros((1, self.num_cols))
        return len(self.constraints(probe, probe))


@dataclasses.dataclass(frozen=True)
class StarkParams:
    log_n: int
    log_blowup: int = 2     # must satisfy 2^log_blowup >= max_degree
    num_queries: int = 20
    cap_log2: int = 1
    coset_shift: int = gf.MULTIPLICATIVE_GENERATOR


@dataclasses.dataclass
class StarkProof:
    trace_cap: GF
    fri_proof: fri.FriProof
    # per query: trace rows at x and w*x with their Merkle paths
    trace_openings: List[dict]


def _fri_params(air: AirSpec, params: StarkParams) -> fri.FriParams:
    # quotient degree < max((d-1)n, n-1); tighten the FRI degree bound by
    # ceil(log2(d-1)) folds so honest quotients of degree-d AIRs pass
    extra = (air.max_degree - 2).bit_length() if air.max_degree > 2 else 0
    log_blowup = params.log_blowup - extra
    assert log_blowup >= 1, "blowup too small for this constraint degree"
    return fri.FriParams(
        log_domain=params.log_n + params.log_blowup,
        log_blowup=log_blowup,
        num_queries=params.num_queries,
        cap_log2=params.cap_log2,
        coset_shift=params.coset_shift,
    )


def _lde_columns(trace: GF, params: StarkParams) -> GF:
    """(m, n) columns -> (m, N) coset evaluations (N = n * blowup)."""
    return ntt.lde(trace, params.log_blowup, params.coset_shift)


def _row_leaves(lde_cols: GF) -> GF:
    """(m, N) -> (N, m) row-major leaves."""
    return GF(lde_cols.lo.T, lde_cols.hi.T)


def _batch_inv(vals: List[int]) -> List[int]:
    """Montgomery batch inversion: one field pow for the whole list."""
    pref = [1] * (len(vals) + 1)
    for i, v in enumerate(vals):
        pref[i + 1] = pref[i] * v % MODULUS
    inv = pow(pref[-1], MODULUS - 2, MODULUS)
    out = [0] * len(vals)
    for i in range(len(vals) - 1, -1, -1):
        out[i] = pref[i] * inv % MODULUS
        inv = inv * vals[i] % MODULUS
    return out


@functools.lru_cache(maxsize=16)
def _domain_and_zerofiers(log_n: int, log_blowup: int, shift: int):
    """LDE-domain points and the three inverse zerofiers, vectorized on host
    (incremental powers + one batched inversion), returned as GF vectors:
    1/Z_trans, 1/(x - 1), 1/(x - w^{n-1})."""
    n = 1 << log_n
    N = n << log_blowup
    w_small = ntt.root_of_unity(log_n)
    w_big = ntt.root_of_unity(log_n + log_blowup)
    last = pow(w_small, n - 1, MODULUS)

    xs = [0] * N
    x = shift % MODULUS
    for i in range(N):
        xs[i] = x
        x = x * w_big % MODULUS

    zt = [(pow(x, n, MODULUS) - 1) % MODULUS for x in xs]  # x^n - 1
    x_m_last = [(x - last) % MODULUS for x in xs]
    x_m_one = [(x - 1) % MODULUS for x in xs]
    invs = _batch_inv(zt + x_m_last + x_m_one)
    # 1/Z_trans = (x - last) / (x^n - 1)
    zt_inv = [x_m_last[i] * invs[i] % MODULUS for i in range(N)]
    last_inv = invs[N : 2 * N]
    first_inv = invs[2 * N :]
    as_gf = lambda v: gf.from_u64(np.array(v, dtype=np.uint64))
    return as_gf(zt_inv), as_gf(first_inv), as_gf(last_inv)


def _alpha_sum(vals: List[GF], alpha: int, a_pow: int):
    """sum_k alpha^{a_pow+k} vals[k]; returns (acc or None, next a_pow)."""
    acc = None
    for v in vals:
        term = gf.mul(v, gf.from_u64(np.uint64(a_pow)))
        acc = term if acc is None else gf.add(acc, term)
        a_pow = a_pow * alpha % MODULUS
    return acc, a_pow


def _compose(lde_cols: GF, air: AirSpec, alpha: int, params: StarkParams,
             public: Optional[GF]) -> GF:
    """alpha-combined quotient evaluations over the whole LDE domain."""
    import jax.numpy as jnp

    blowup = 1 << params.log_blowup
    cur = GF(lde_cols.lo.T, lde_cols.hi.T)           # (N, m)
    # next-row view: w = W^blowup on the natural-order coset, so T(w*x) is a
    # roll of the LDE columns by `blowup`
    nxt = GF(
        jnp.roll(lde_cols.lo, -blowup, axis=-1).T,
        jnp.roll(lde_cols.hi, -blowup, axis=-1).T,
    )
    zt_inv, first_inv, last_inv = _domain_and_zerofiers(
        params.log_n, params.log_blowup, params.coset_shift
    )

    a_pow = 1
    t_acc, a_pow = _alpha_sum(air.constraints(cur, nxt), alpha, a_pow)
    comp = gf.mul(t_acc, zt_inv)
    if air.first_row is not None:
        f_acc, a_pow = _alpha_sum(air.first_row(cur, public), alpha, a_pow)
        comp = gf.add(comp, gf.mul(f_acc, first_inv))
    if air.last_row is not None:
        l_acc, a_pow = _alpha_sum(air.last_row(cur, public), alpha, a_pow)
        comp = gf.add(comp, gf.mul(l_acc, last_inv))
    return comp  # (N,) — the quotient codeword


def _transcript_alpha(cap: GF, public: Optional[GF], num_public: int) -> int:
    tr = Transcript()
    tr.absorb(cap)
    if num_public:
        assert public is not None and public.shape == (num_public,)
        tr.absorb(public)
    return int(np.asarray(tr.challenge_ext().c0.astype_u64()))


def prove(trace: GF, air: AirSpec, params: StarkParams,
          public: Optional[GF] = None) -> StarkProof:
    n = 1 << params.log_n
    assert trace.shape == (air.num_cols, n)
    assert (1 << params.log_blowup) >= air.max_degree

    lde_cols = _lde_columns(trace, params)
    leaves = _row_leaves(lde_cols)
    leaf_hashes = merkle.hash_leaves(leaves)
    levels = merkle.tree_levels(leaf_hashes, params.cap_log2)
    cap = levels[-1]

    alpha = _transcript_alpha(cap, public, air.num_public)
    quotient = _compose(lde_cols, air, alpha, params, public)
    fproof = fri.prove(quotient, _fri_params(air, params))

    blowup = 1 << params.log_blowup
    N = n * blowup
    leaves_np_lo = np.asarray(leaves.lo)
    leaves_np_hi = np.asarray(leaves.hi)
    levels_np = [np.asarray(l.astype_u64()) for l in levels]
    openings = []
    for idx in fproof.query_indices:
        rows = {}
        for tag, j in (("cur", idx), ("nxt", (idx + blowup) % N),
                       ("cur_pair", idx + N // 2),
                       ("nxt_pair", (idx + N // 2 + blowup) % N)):
            rows[tag] = dict(
                row=np.stack([leaves_np_lo[j], leaves_np_hi[j]]),
                path=fri._open_path_np(levels_np, j),
                index=j,
            )
        openings.append(rows)
    return StarkProof(trace_cap=cap, fri_proof=fproof, trace_openings=openings)


def _row_gf(opening) -> GF:
    arr = np.asarray(opening["row"])
    import jax.numpy as jnp

    return GF(jnp.asarray(arr[0], jnp.uint32), jnp.asarray(arr[1], jnp.uint32))


def _host_alpha_sum(vals, alpha: int, a_pow: int):
    acc = 0
    for v in vals:
        acc = (acc + int(np.asarray(v.astype_u64()).reshape(-1)[0]) * a_pow) % MODULUS
        a_pow = a_pow * alpha % MODULUS
    return acc, a_pow


def verify(proof: StarkProof, air: AirSpec, params: StarkParams,
           public: Optional[GF] = None) -> bool:
    n = 1 << params.log_n
    blowup = 1 << params.log_blowup
    N = n * blowup
    if air.num_public and (public is None or public.shape != (air.num_public,)):
        return False
    alpha = _transcript_alpha(proof.trace_cap, public, air.num_public)

    if not fri.verify(proof.fri_proof, _fri_params(air, params)):
        return False

    w_small = ntt.root_of_unity(params.log_n)
    w_big = ntt.root_of_unity(params.log_n + params.log_blowup)
    last = pow(w_small, n - 1, MODULUS)

    for q, idx in enumerate(proof.fri_proof.query_indices):
        ops = proof.trace_openings[q]
        # all four rows must open against the trace cap
        for tag, j in (("cur", idx), ("nxt", (idx + blowup) % N),
                       ("cur_pair", idx + N // 2),
                       ("nxt_pair", (idx + N // 2 + blowup) % N)):
            op = ops[tag]
            if int(op["index"]) != j:
                return False
            lh = merkle.hash_leaves(_row_gf(op)[None])[0]
            okm = merkle.verify_path(
                lh, j, gf.from_u64(np.asarray(op["path"])), proof.trace_cap
            )
            if not bool(np.asarray(okm)):
                return False

        # recompute the quotient at BOTH fri pair positions and compare with
        # the fri layer-0 opening
        pair = np.asarray(proof.fri_proof.openings[q][0]["pair"], np.uint64)
        for half, (cur_tag, nxt_tag, j) in enumerate(
            (("cur", "nxt", idx), ("cur_pair", "nxt_pair", idx + N // 2))
        ):
            cur = _row_gf(ops[cur_tag])[None]
            nxt = _row_gf(ops[nxt_tag])[None]
            x = params.coset_shift * pow(w_big, j, MODULUS) % MODULUS
            zn = (pow(x, n, MODULUS) - 1) % MODULUS
            zt = zn * pow((x - last) % MODULUS, MODULUS - 2, MODULUS) % MODULUS

            a_pow = 1
            t_acc, a_pow = _host_alpha_sum(air.constraints(cur, nxt), alpha, a_pow)
            qv = t_acc * pow(zt, MODULUS - 2, MODULUS) % MODULUS
            if air.first_row is not None:
                f_acc, a_pow = _host_alpha_sum(air.first_row(cur, public), alpha, a_pow)
                qv = (qv + f_acc * pow((x - 1) % MODULUS, MODULUS - 2, MODULUS)) % MODULUS
            if air.last_row is not None:
                l_acc, a_pow = _host_alpha_sum(air.last_row(cur, public), alpha, a_pow)
                qv = (qv + l_acc * pow((x - last) % MODULUS, MODULUS - 2, MODULUS)) % MODULUS
            if int(pair[half, 0]) != qv or int(pair[half, 1]) != 0:
                return False
    return True
