"""Two-phase coset-quotient STARK: trace commitment + challenge round +
quotient low-degree argument.

Proves that committed trace columns T_0..T_{m-1} (length n, Goldilocks)
satisfy an AIR with
  * row constraints:        R_k(T(w^i), ch) = 0 for EVERY i (zerofier x^n-1),
  * transition constraints: C_k(T(w^i), T(w^{i+1}), ch) = 0 for i < n-1,
  * first-row constraints:  F_j(T(w^0), public, ch) = 0,
  * last-row constraints:   L_j(T(w^{n-1}), public, ch) = 0,
where each constraint is a low-degree polynomial map of the named rows
(the shape of EVERY residual in this framework's circuits — e.g. the
grand-product accumulator transition acc' = acc * factor of ram_permutation,
ref `src/utils.rs:81-137`, is degree 2).  The `public` vector is absorbed
into the Fiat-Shamir transcript, so a proof is bound to its claimed public
values (the role of the reference's public-input commitment).

Two phases (the structure of boojum's prover stages: witness columns first,
then the grand-product/lookup columns built from verifier challenges):

  phase 1:  commit the witness columns -> cap_1.
  challenge round:  ch = FS(cap_1) — `num_challenges` Goldilocks scalars
            available to every constraint AND to the phase-2 witness
            builder (e.g. an RLC binding of a committed message stream, or
            permutation-argument compression challenges).  Drawn BEFORE the
            public vector is absorbed so publics may be challenge-dependent
            (alpha, drawn after, still binds them).
  phase 2:  commit `num_phase2_cols` more columns built from (trace, ch)
            -> cap_2.  Constraints see the concatenation [phase1 | phase2].

Protocol (no DEEP sampling — documented soundness simplification until the
full boojum-parity prover lands):

  1. LDE every column to the coset D = shift*<W> of size n*blowup and
     Merkle-commit phase-1 / phase-2 column groups row-wise.
  2. Fiat-Shamir alpha (after absorbing caps + public); compose
       Q = [sum_k a^k C_k] / Z_trans + [sum_k a^k R_k] / (x^n - 1)
           + [sum_j a^j F_j]/(x-1) + [sum_j a^j L_j]/(x - w^{n-1})
     evaluated POINTWISE on D — the next-row value at x is the column at
     W^blowup * index (a pure roll: D is in natural order, w = W^blowup).
     Z_trans(x) = (x^n - 1)/(x - w^{n-1}) vanishes on H minus the last row.
     Q is a polynomial of degree < (d-1)n iff every constraint holds (whp
     over alpha).
  3. Prove Q low-degree with FRI (ops/fri.py), at a rate tightened by
     ceil(log2(d-1)) extra folds so the bound matches the quotient degree.
  4. Queries: FRI's layer-0 positions; the verifier opens the trace rows
     (both trees) at x and w*x, recomputes the composition, and checks it
     equals the FRI layer-0 codeword value — binding the low-degree
     quotient to the COMMITTED trace.

TPU shape: ONE jitted composition evaluator serves both sides — the prover
runs it over the whole LDE domain, the verifier over the batch of opened
query rows (challenges/alpha/zerofier-inverses enter as traced scalars and
vectors, so one executable per (air, shape), not per proof).  Merkle path
checks on the verifier side run as one batched `verify_path` per tree.
Only Fiat-Shamir ints and query packaging run on host.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from ..ops import fri, gf, merkle, ntt
from ..ops.fri import Transcript
from ..ops.gf import GF, MODULUS


@dataclasses.dataclass(frozen=True, eq=False)
class AirSpec:
    """`num_cols` phase-1 columns (+ `num_phase2_cols` challenge-derived
    columns).  All callables receive GF row-views over the CONCATENATED
    columns plus `ch`, a (num_challenges,) GF of challenge scalars:

      constraints(cur, nxt, ch)     -> [(batch,) GF ...]   transition rows
      row_constraints(cur, ch)      -> [(batch,) GF ...]   every row
      first_row(row, public, ch)    -> [...]               row 0 (affine)
      last_row(row, public, ch)     -> [...]               row n-1 (affine)

    Transition/row constraints may have total degree <= max_degree in the
    trace cells.  Boundary constraints must be AFFINE in the trace cells
    (degree <= 1): their quotient by (x - pt) has degree d(n-1)-1, which
    exceeds the FRI bound for d >= 2 (transitions get the slack back from
    Z_trans's degree n-1; boundaries divide by a degree-1 factor only)."""

    num_cols: int
    max_degree: int
    constraints: Callable
    row_constraints: Optional[Callable] = None
    first_row: Optional[Callable] = None
    last_row: Optional[Callable] = None
    num_public: int = 0
    num_phase2_cols: int = 0
    num_challenges: int = 0
    # Preprocessed ("fixed") columns: VERIFIER-KNOWN table data (e.g. the
    # VM decode table for the logUp lookup argument) committed as their own
    # column group.  The verifier receives the plaintext fixed columns and
    # recomputes their LDE+Merkle cap, so the proof is bound to THE table,
    # not a prover-chosen one (the role of boojum's precomputed setup tree).
    # Constraint row-views are ordered [fixed | phase1 | phase2].
    num_fixed_cols: int = 0
    # Optional scan-structured replacement for `row_constraints`:
    #   compose_row(cur, ch, alpha, a_pow) -> (alpha-weighted sum, a_pow')
    # For AIRs with hundreds of repeated per-round constraints (e.g. the
    # Poseidon2 chain AIR) a flat constraint list unrolls into a graph the
    # XLA CPU compiler cannot handle (see ops/poseidon2.py scan rationale);
    # the AIR instead folds its constraints under lax.scan and returns the
    # combined value directly.  Used identically by prover and verifier, so
    # consistency is by construction.
    compose_row: Optional[Callable] = None

    @property
    def total_cols(self) -> int:
        return self.num_fixed_cols + self.num_cols + self.num_phase2_cols


@dataclasses.dataclass(frozen=True)
class StarkParams:
    log_n: int
    log_blowup: int = 2     # must satisfy 2^log_blowup >= max_degree
    num_queries: int = 20
    cap_log2: int = 1
    coset_shift: int = gf.MULTIPLICATIVE_GENERATOR


@dataclasses.dataclass
class StarkProof:
    caps: List[GF]           # [phase1_cap] or [phase1_cap, phase2_cap]
    fri_proof: fri.FriProof
    # per query: {tag: {"rows": [np (2,m1), np (2,m2)?], "paths": [...],
    #                   "index": j}} for tag in cur/nxt/cur_pair/nxt_pair
    trace_openings: List[dict]

    @property
    def trace_cap(self) -> GF:  # phase-1 cap (compat accessor)
        return self.caps[0]


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
    """LDE-domain points and the four inverse zerofiers, vectorized on host
    (incremental powers + one batched inversion), returned as numpy u64:
    1/Z_trans, 1/(x^n - 1), 1/(x - 1), 1/(x - w^{n-1})."""
    n = 1 << log_n
    N = n << log_blowup
    w_big = ntt.root_of_unity(log_n + log_blowup)
    last = pow(ntt.root_of_unity(log_n), n - 1, MODULUS)

    xs = [0] * N
    x = shift % MODULUS
    for i in range(N):
        xs[i] = x
        x = x * w_big % MODULUS
    return _zerofier_invs_at(xs, n, last)


def _zerofier_invs_at(xs: Sequence[int], n: int, last: int):
    """inverse zerofiers at arbitrary points (all off H):
    (1/Z_trans, 1/(x^n-1), 1/(x-1), 1/(x-last)) as u64 arrays."""
    N = len(xs)
    zn = [(pow(x, n, MODULUS) - 1) % MODULUS for x in xs]
    x_m_last = [(x - last) % MODULUS for x in xs]
    x_m_one = [(x - 1) % MODULUS for x in xs]
    invs = _batch_inv(zn + x_m_last + x_m_one)
    zt_inv = [x_m_last[i] * invs[i] % MODULUS for i in range(N)]
    u64 = lambda v: np.array(v, dtype=np.uint64)
    return (
        u64(zt_inv),
        u64(invs[:N]),
        u64(invs[2 * N :]),
        u64(invs[N : 2 * N]),
    )


def _alpha_powers(alpha: GF, k: int) -> GF:
    """[alpha^0 .. alpha^{k-1}] as a (k,) GF, built under lax.scan.

    XLA:CPU compile time is pathologically superlinear in UNROLLED
    sequential-dependence chains (48 chained gf.muls >5 min; 1024 under
    scan = 0.14 s — measured), so every power/accumulator chain in the
    composition must be scan-structured or log-depth."""
    import jax

    def body(p, _):
        return gf.canonicalize(gf.mul(p, alpha)), p

    _, pows = jax.lax.scan(body, gf.ones(()), None, length=k)
    return pows


def _alpha_sum(vals: List[GF], alpha: GF, a_pow: GF):
    """sum_k alpha^k * a_pow * vals[k]; returns (acc or None, next a_pow).

    Stack + scan-powers + log-depth tree dot — NO unrolled mul chains.

    Each list element is either a single constraint value with the batch
    shape, or a VECTORIZED GROUP of constraints with one extra leading axis
    (shape (g, *batch) — e.g. all 120 register-limb residuals as one
    tensor).  Groups are flattened in order; every scalar constraint in a
    group gets its own alpha power, so AIRs can vectorize hot constraint
    families without changing the combination the verifier reproduces."""
    if not vals:
        return None, a_pow
    batch_ndim = 1  # rows are (batch, m) on both prover and verifier paths
    norm = []
    for v in vals:
        v = gf.canonicalize(v)
        if len(v.shape) == batch_ndim:
            v = gf.expand_dims(v, 0)
        elif len(v.shape) == batch_ndim + 1:
            pass
        else:  # (g1, g2, *batch) — flatten the leading axes
            lead = 1
            for d in v.shape[: len(v.shape) - batch_ndim]:
                lead *= int(d)
            v = v.reshape((lead,) + v.shape[len(v.shape) - batch_ndim :])
        norm.append(v)
    stacked = gf.concat(norm, axis=0)  # (k, *batch)
    k = int(stacked.shape[0])
    pows = _alpha_powers(alpha, k)                                   # (k,)
    w = gf.mul(pows, a_pow)
    while len(w.shape) < len(stacked.shape):
        w = gf.expand_dims(w, -1)
    acc = gf.sum_mod(gf.mul(stacked, w), axis=0)
    a_next = gf.mul(gf.mul(pows[k - 1], alpha), a_pow)
    return acc, gf.canonicalize(a_next)


@functools.partial(
    __import__("jax").jit, static_argnames=("air",)
)
def _compose_rows(cur: GF, nxt: GF, public: Optional[GF], ch: GF, alpha: GF,
                  zt_inv: GF, zn_inv: GF, first_inv: GF, last_inv: GF,
                  air: AirSpec) -> GF:
    """The pointwise quotient at a batch of (cur, nxt) row pairs with the
    inverse zerofiers evaluated at their domain points.  Shared by the
    prover (whole LDE domain) and the verifier (opened query rows)."""
    a_pow = gf.ones(())
    t_acc, a_pow = _alpha_sum(air.constraints(cur, nxt, ch), alpha, a_pow)
    comp = gf.mul(t_acc, zt_inv)
    if air.compose_row is not None:
        r_acc, a_pow = air.compose_row(cur, ch, alpha, a_pow)
        comp = gf.add(comp, gf.mul(r_acc, zn_inv))
    elif air.row_constraints is not None:
        r_acc, a_pow = _alpha_sum(air.row_constraints(cur, ch), alpha, a_pow)
        comp = gf.add(comp, gf.mul(r_acc, zn_inv))
    if air.first_row is not None:
        f_acc, a_pow = _alpha_sum(air.first_row(cur, public, ch), alpha, a_pow)
        comp = gf.add(comp, gf.mul(f_acc, first_inv))
    if air.last_row is not None:
        l_acc, a_pow = _alpha_sum(air.last_row(cur, public, ch), alpha, a_pow)
        comp = gf.add(comp, gf.mul(l_acc, last_inv))
    return gf.canonicalize(comp)


def _compose_domain(lde_cols: GF, air: AirSpec, alpha: int,
                    params: StarkParams, public: Optional[GF],
                    ch_ints: Tuple[int, ...]) -> GF:
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
    invs = _domain_and_zerofiers(
        params.log_n, params.log_blowup, params.coset_shift
    )
    zt_inv, zn_inv, first_inv, last_inv = (gf.from_u64(v) for v in invs)
    return _compose_rows(
        cur, nxt, public, _ch_gf(ch_ints), _alpha_gf(alpha),
        zt_inv, zn_inv, first_inv, last_inv, air=air,
    )


def _ch_gf(ch_ints: Tuple[int, ...]) -> GF:
    return gf.from_u64(np.array(ch_ints, dtype=np.uint64).reshape(-1))


def _alpha_gf(alpha: int) -> GF:
    return gf.from_u64(np.uint64(alpha))


def challenges_from_cap(cap1: GF, air: AirSpec, fixed_cap: Optional[GF] = None):
    """The challenge round: ch = FS([fixed_cap,] cap_1) BEFORE the public
    vector is absorbed — public values may themselves be challenge-dependent
    (e.g. the message-RLC binding of poseidon2_air); alpha still binds them."""
    tr = Transcript()
    if fixed_cap is not None:
        tr.absorb(fixed_cap)
    tr.absorb(cap1)
    ch = tuple(
        int(np.asarray(tr.challenge_ext().c0.astype_u64()))
        for _ in range(air.num_challenges)
    )
    return ch, tr


def _absorb_public(tr: Transcript, public: Optional[GF], air: AirSpec):
    if air.num_public:
        assert public is not None and public.shape == (air.num_public,)
        tr.absorb(public)


def _commit_columns(cols: GF, params: StarkParams):
    """LDE + row-Merkle a (m, n) column group; returns device + host views."""
    lde_cols = _lde_columns(cols, params)
    leaves = _row_leaves(lde_cols)
    leaf_hashes = merkle.hash_leaves(leaves)
    levels = merkle.tree_levels(leaf_hashes, params.cap_log2)
    return dict(
        lde=lde_cols,
        cap=levels[-1],
        leaves_lo=np.asarray(leaves.lo),
        leaves_hi=np.asarray(leaves.hi),
        levels_np=[np.asarray(l.astype_u64()) for l in levels],
    )


def prove(trace: GF, air: AirSpec, params: StarkParams,
          public: Optional[GF] = None,
          build_phase2: Optional[Callable] = None,
          fixed_cols: Optional[GF] = None) -> StarkProof:
    """`build_phase2(trace, ch_ints) -> (num_phase2_cols, n) GF` builds the
    challenge-derived columns (required iff air.num_phase2_cols > 0); its
    `trace` argument is the concatenation [fixed | phase1] when the AIR has
    fixed columns.  `fixed_cols` (num_fixed_cols, n) is the verifier-known
    preprocessed data (required iff air.num_fixed_cols > 0)."""
    n = 1 << params.log_n
    assert trace.shape == (air.num_cols, n)
    assert (1 << params.log_blowup) >= air.max_degree

    trees = []
    fixed_cap = None
    if air.num_fixed_cols:
        assert fixed_cols is not None and fixed_cols.shape == (
            air.num_fixed_cols, n)
        trees.append(_commit_columns(fixed_cols, params))
        fixed_cap = trees[0]["cap"]
    trees.append(_commit_columns(trace, params))
    ch, tr = challenges_from_cap(trees[-1]["cap"], air, fixed_cap)
    _absorb_public(tr, public, air)

    if air.num_phase2_cols:
        assert build_phase2 is not None
        p2_input = (gf.concat([fixed_cols, trace], axis=0)
                    if air.num_fixed_cols else trace)
        t2 = build_phase2(p2_input, ch)
        assert t2.shape == (air.num_phase2_cols, n)
        trees.append(_commit_columns(t2, params))
        tr.absorb(trees[-1]["cap"])
    lde_all = gf.concat([t["lde"] for t in trees], axis=0)

    alpha = int(np.asarray(tr.challenge_ext().c0.astype_u64()))
    quotient = _compose_domain(lde_all, air, alpha, params, public, ch)
    fproof = fri.prove(quotient, _fri_params(air, params))

    blowup = 1 << params.log_blowup
    N = n * blowup
    openings = []
    for idx in fproof.query_indices:
        rows = {}
        for tag, j in (("cur", idx), ("nxt", (idx + blowup) % N),
                       ("cur_pair", idx + N // 2),
                       ("nxt_pair", (idx + N // 2 + blowup) % N)):
            rows[tag] = dict(
                rows=[np.stack([t["leaves_lo"][j], t["leaves_hi"][j]])
                      for t in trees],
                paths=[fri._open_path_np(t["levels_np"], j) for t in trees],
                index=j,
            )
        openings.append(rows)
    return StarkProof(
        caps=[t["cap"] for t in trees],
        fri_proof=fproof,
        trace_openings=openings,
    )


_TAGS = ("cur", "nxt", "cur_pair", "nxt_pair")


def verify(proof: StarkProof, air: AirSpec, params: StarkParams,
           public: Optional[GF] = None,
           fixed_cols: Optional[GF] = None) -> bool:
    import jax.numpy as jnp

    n = 1 << params.log_n
    blowup = 1 << params.log_blowup
    N = n * blowup
    Q = params.num_queries
    has_fixed = 1 if air.num_fixed_cols else 0
    n_trees = has_fixed + 1 + (1 if air.num_phase2_cols else 0)
    if len(proof.caps) != n_trees or len(proof.trace_openings) != Q:
        return False
    if air.num_public and (public is None or public.shape != (air.num_public,)):
        return False
    fixed_cap = None
    if air.num_fixed_cols:
        # the fixed-column cap is part of the verifying key: recompute it
        # from the verifier-known plaintext table and demand equality
        if fixed_cols is None or fixed_cols.shape != (air.num_fixed_cols, n):
            return False
        want_cap = _commit_columns(fixed_cols, params)["cap"]
        if not bool(np.asarray(gf.equal(want_cap, proof.caps[0])).all()):
            return False
        fixed_cap = proof.caps[0]
    ch, tr = challenges_from_cap(proof.caps[has_fixed], air, fixed_cap)
    _absorb_public(tr, public, air)
    if air.num_phase2_cols:
        tr.absorb(proof.caps[-1])
    alpha = int(np.asarray(tr.challenge_ext().c0.astype_u64()))

    if not fri.verify(proof.fri_proof, _fri_params(air, params)):
        return False

    widths = ([air.num_fixed_cols] if has_fixed else []) + [air.num_cols] + (
        [air.num_phase2_cols] if air.num_phase2_cols else [])

    # gather all openings: indices must match the FRI query schedule, shapes
    # must match the column groups
    expect = []
    for idx in proof.fri_proof.query_indices:
        expect.append(
            {"cur": idx, "nxt": (idx + blowup) % N, "cur_pair": idx + N // 2,
             "nxt_pair": (idx + N // 2 + blowup) % N}
        )
    rows_by_tree = [[] for _ in range(n_trees)]   # flat (q, tag) order
    paths_by_tree = [[] for _ in range(n_trees)]
    flat_idx = []
    for q in range(Q):
        ops = proof.trace_openings[q]
        for tag in _TAGS:
            op = ops[tag]
            j = expect[q][tag]
            if int(op["index"]) != j or len(op["rows"]) != n_trees:
                return False
            flat_idx.append(j)
            for t in range(n_trees):
                row = np.asarray(op["rows"][t], dtype=np.uint32)
                path = np.asarray(op["paths"][t], dtype=np.uint64)
                if row.shape != (2, widths[t]):
                    return False
                rows_by_tree[t].append(row)
                paths_by_tree[t].append(path)

    # batched Merkle verification: one hash_leaves + verify_path per tree
    idx_arr = jnp.asarray(np.array(flat_idx, dtype=np.uint32))
    full_rows = []
    for t in range(n_trees):
        rows = np.stack(rows_by_tree[t])          # (4Q, 2, m_t)
        paths = np.stack(paths_by_tree[t])        # (4Q, depth, 4)
        rows_gf = GF(jnp.asarray(rows[:, 0]), jnp.asarray(rows[:, 1]))
        lh = merkle.hash_leaves(rows_gf)
        ok = merkle.verify_path(
            lh, idx_arr, gf.from_u64(paths), proof.caps[t]
        )
        if not bool(np.asarray(ok).all()):
            return False
        full_rows.append(rows)
    all_rows = np.concatenate(full_rows, axis=2)  # (4Q, 2, m)

    # batched composition at the opened points: rows 0,2 of each query group
    # are (cur, cur_pair); their next-rows are 1,3
    grouped = all_rows.reshape(Q, 4, 2, air.total_cols)
    cur_np = grouped[:, (0, 2)].reshape(2 * Q, 2, air.total_cols)
    nxt_np = grouped[:, (1, 3)].reshape(2 * Q, 2, air.total_cols)
    cur = GF(jnp.asarray(cur_np[:, 0]), jnp.asarray(cur_np[:, 1]))
    nxt = GF(jnp.asarray(nxt_np[:, 0]), jnp.asarray(nxt_np[:, 1]))

    w_big = ntt.root_of_unity(params.log_n + params.log_blowup)
    last = pow(ntt.root_of_unity(params.log_n), n - 1, MODULUS)
    xs = []
    for q, idx in enumerate(proof.fri_proof.query_indices):
        for j in (idx, idx + N // 2):
            xs.append(params.coset_shift * pow(w_big, j, MODULUS) % MODULUS)
    invs = _zerofier_invs_at(xs, n, last)
    zt_inv, zn_inv, first_inv, last_inv = (gf.from_u64(v) for v in invs)

    pub_b = None
    if air.num_public:
        pub_b = public  # broadcasting over the (2Q,) batch is shape-safe
    qv = _compose_rows(
        cur, nxt, pub_b, _ch_gf(ch), _alpha_gf(alpha),
        zt_inv, zn_inv, first_inv, last_inv, air=air,
    )
    qv_np = np.asarray(qv.astype_u64()).reshape(Q, 2)

    for q in range(Q):
        pair = np.asarray(proof.fri_proof.openings[q][0]["pair"], np.uint64)
        for half in range(2):
            if int(pair[half, 0]) != int(qv_np[q, half]) or int(pair[half, 1]) != 0:
                return False
    return True
