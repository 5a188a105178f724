"""ecrecover ladder AIR: STARK proof of the secp256k1 double-and-add
ladders (VERDICT r4 missing #3 / item 6, circuit type 7).

Reference: `src/ecrecover/new_optimized.rs:870-1128` — the reference
evaluates the full recovery `Q = u1*G + u2*R` inside one constraint
system.  The framework's evaluator (models/ecrecover.py) checks the same
affine double-and-add trace row-parallel; this module commits that trace
— one row per scalar bit per ladder, 512 rows per call — and proves the
group-law arithmetic, which is ~99% of the circuit's work:

  per row (committed u16 limbs as bytes, logUp byte-range-checked):
    base doubling      2*lam*y + qb*P == 3*x*x + qa*P,
                       lam^2 + qd*P == x' + 2x + qc*P,
                       lam*x + qf*P == lam*x' + y' + y + qe*P
    conditional add    (bit & !inf): the chord-law identities binding
                       (acc, base, a_lam, acc') with their own quotients
    selector algebra   s_set = bit*inf, s_add = bit*(1-inf),
                       inf' = inf*(1-bit); copy/set rules for acc'
  transitions          base(next) = base'(cur), acc(next) = acc'(cur),
                       inf(next) = inf'(cur) within a ladder
  record stream        one phase-2 accumulator absorbs, per ladder:
                       base point bytes (at the first row), each scalar
                       bit, and (inf', out bytes) at the last row; the
                       verifier recomputes the stream from the PLAINTEXT
                       per-call claims (u1/u2 bits, G / R, acc1 / acc2) —
                       the same plaintext the evaluator binds to the ABI
                       and memory tape.  Public: [final racc].

EVALUATOR-CHECKED still (documented): scalar derivation u1 = -h*r^{-1},
u2 = s*r^{-1} (mod n), curve membership of R, exception flags, the final
acc1+acc2 add, address keccak, and the ABI/memory binding — all row
relations in models/ecrecover.py eval_constraints.  The affine chord law
cannot represent acc == +/-base coincidences; as in the evaluator, a
natural occurrence has probability ~2^-256 for honestly-derived records
(witness generation asserts on it).

Nonnative machinery (byte-committed limbs, biased telescoping carry
chains, one logUp byte table) follows prover/horner_air.py.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import gf, secp256k1 as ec
from ..ops.gf import GF, MODULUS
from .stark import (AirSpec, StarkParams, StarkProof, challenges_from_cap,
                    prove, verify)

BITS = 256
NL = 16        # value limbs
NQ = 17        # quotient limbs
N_POS = 33     # carry positions per identity
BIAS = 1 << 23
P_LIMBS = [(ec.P >> (16 * j)) & 0xFFFF for j in range(NL)]

# record layout per ladder: 64 base bytes, then per step its bit, and at
# the last step additionally (inf', 64 output bytes); Horner absorption
# racc' = racc * gamma^k + ...
NUM_PUBLIC = 1


class _Reg:
    def __init__(self):
        self.index = {}
        self.n = 0

    def add(self, name, k=1):
        self.index[name] = (self.n, k)
        self.n += k

    def at(self, name, j=0):
        return self.index[name][0] + j


_VALS = ["bx", "by", "ax", "ay", "bnx", "bny", "anx", "any"]
_DQ = ["dqa", "dqb", "dqc", "dqd", "dqe", "dqf"]
_AQ = ["aqa", "aqb", "aqc", "aqd", "aqe", "aqf"]


@functools.lru_cache(maxsize=1)
def layout() -> Tuple[_Reg, _Reg, _Reg]:
    fx = _Reg()
    fx.add("t_byte"); fx.add("f_l0"); fx.add("f_ll")
    p1 = _Reg()
    # flags first: the pad full-row copy starts AFTER ll (pad/fl/ll carry
    # unmasked fixed bindings of their own)
    p1.add("pad"); p1.add("fl"); p1.add("ll")
    p1.add("bit"); p1.add("inf"); p1.add("ninf")
    p1.add("s_set"); p1.add("s_add")
    for nm in _VALS:
        p1.add(nm + "_b", 2 * NL)
    p1.add("dl_b", 2 * NL)
    for nm in _DQ:
        p1.add(nm + "_b", 2 * NQ)
    p1.add("al_b", 2 * NL)
    for nm in _AQ:
        p1.add(nm + "_b", 2 * NQ)
    for nm in ("dc1", "dc2", "dc3", "ac1", "ac2", "ac3"):
        p1.add(nm + "_b", 3 * N_POS)
    p1.add("m_byte")
    p2 = _Reg()
    p2.add("inv_qb", p1.index["m_byte"][0] - p1.index["bx_b"][0])
    p2.add("inv_tb")
    p2.add("lacc")
    p2.add("racc")
    return fx, p1, p2


_BQ0 = layout()[1].index["bx_b"][0]                 # first byte-query col
_N_BYTE_Q = layout()[1].index["m_byte"][0] - _BQ0   # all committed bytes


def _limb(row, base_ix, j):
    lo = row[..., base_ix + 2 * j]
    hi = row[..., base_ix + 2 * j + 1]
    return gf.add(lo, gf.mul_const(hi, 256))


def _grpx(v: GF) -> GF:
    """One grouped constraint per trailing lane."""
    return GF(jnp.moveaxis(v.lo, -1, 0), jnp.moveaxis(v.hi, -1, 0))


def _limbs_t(row, base_ix, count):
    """(batch, count) u16 limb tensor from interleaved lo/hi byte columns
    (strided slices, NOT index-array gathers: XLA:CPU expands gathers and
    the LLVM compile time of the composition explodes)."""
    lo = row[..., base_ix : base_ix + 2 * count : 2]
    hi = row[..., base_ix + 1 : base_ix + 2 * count : 2]
    return gf.add(lo, gf.mul_const(hi, 256))


def _carries_t(row, base_ix):
    """(batch, N_POS) biased carry values from their 3-byte columns."""
    b0 = row[..., base_ix : base_ix + 3 * N_POS : 3]
    b1 = row[..., base_ix + 1 : base_ix + 3 * N_POS : 3]
    b2 = row[..., base_ix + 2 : base_ix + 3 * N_POS : 3]
    return gf.add(b0, gf.add(gf.mul_const(b1, 1 << 8),
                             gf.mul_const(b2, 1 << 16)))


def _shift33(t: GF, off: int) -> GF:
    """Place a (batch, k) tensor at position `off` of a (batch, N_POS)
    window (zero-padded)."""
    k = int(t.shape[-1])
    parts = []
    if off:
        parts.append(gf.zeros(t.shape[:-1] + (off,)))
    parts.append(t)
    if off + k < N_POS:
        parts.append(gf.zeros(t.shape[:-1] + (N_POS - off - k,)))
    return gf.concat(parts, axis=-1)


_P_GF_CACHE = {}


def _conv(terms) -> GF:
    """Vectorized position sums M (batch, N_POS) for a term list:
    ('pp', A, B, coef) limb-tensor products, ('qp', Q, coef) quotient * P
    products, ('lin', A, coef) — A/B/Q are (batch, nl) GF tensors."""
    acc = None

    def add(x):
        nonlocal acc
        acc = x if acc is None else gf.add(acc, x)

    for t in terms:
        if t[0] == "pp":
            _, A, B, coef = t
            for a in range(int(A.shape[-1])):
                prod = gf.mul(gf.expand_dims(A[..., a], -1), B)
                if coef != 1:
                    prod = gf.mul_const(prod, coef % MODULUS)
                add(_shift33(prod, a))
        elif t[0] == "qp":
            _, Q, coef = t
            key = coef % MODULUS
            if key not in _P_GF_CACHE:
                # cache the NUMPY data only — a GF built here would capture
                # the enclosing trace and leak tracers across jit calls
                _P_GF_CACHE[key] = np.asarray(
                    [(l * key) % MODULUS for l in P_LIMBS], np.uint64)
            Pv = gf.from_u64(_P_GF_CACHE[key])
            for a in range(int(Q.shape[-1])):
                add(_shift33(gf.mul(gf.expand_dims(Q[..., a], -1), Pv), a))
        else:
            _, A, coef = t
            x = A if coef == 1 else gf.mul_const(A, coef % MODULUS)
            add(_shift33(x, 0))
    return acc


@functools.lru_cache(maxsize=1)
def ecrecover_air() -> AirSpec:
    fx, p1, p2 = layout()
    F, P1 = fx.n, p1.n

    def at(nm, j=0):
        return F + p1.at(nm, j)

    def at2(nm, j=0):
        return F + P1 + p2.at(nm, j)

    def limbs_t(row, nm, count=NL):
        return _limbs_t(row, at(nm), count)

    def identity(out, row, terms, carry_nm, mask=None):
        """Vectorized biased carry chain over all N_POS positions at once:
        rel = M + (C_prev - BIAS) - (C - BIAS) * 2^16, C_{-1} = BIAS."""
        M = _conv(terms)
        C = _carries_t(row, at(carry_nm + "_b"))
        bias = gf.constant(BIAS)
        prevC = gf.concat(
            [gf.full(M.shape[:-1] + (1,), BIAS), C[..., :-1]], axis=-1)
        rel = gf.sub(gf.add(M, gf.sub(prevC, bias)),
                     gf.mul_const(gf.sub(C, bias), 1 << 16))
        fin = gf.sub(C[..., -1], bias)
        if mask is not None:
            rel = gf.mul(gf.expand_dims(mask, -1), rel)
            fin = gf.mul(mask, fin)
        out.append(_grpx(rel))
        out.append(fin)

    def row_constraints(cur, ch):
        out = []
        one = gf.ones(())
        pad = cur[..., at("pad")]
        fl = cur[..., at("fl")]
        ll = cur[..., at("ll")]
        bit = cur[..., at("bit")]
        inf = cur[..., at("inf")]
        ninf = cur[..., at("ninf")]
        s_set = cur[..., at("s_set")]
        s_add = cur[..., at("s_add")]
        live = gf.sub(one, pad)
        # booleanity of the 8 flag columns (contiguous slice)
        flags = cur[..., F : F + 8]
        out.append(_grpx(gf.mul(flags, gf.sub(flags, one))))
        # flag bindings (unmasked: pads force fl = ll = 0)
        out.append(gf.sub(fl, gf.mul(live, cur[..., fx.at("f_l0")])))
        out.append(gf.sub(ll, gf.mul(live, cur[..., fx.at("f_ll")])))
        # selector algebra
        out.append(gf.sub(s_set, gf.mul(bit, inf)))
        out.append(gf.sub(s_add, gf.mul(bit, gf.sub(one, inf))))
        out.append(gf.sub(ninf, gf.mul(inf, gf.sub(one, bit))))
        # ladder start: acc at infinity; infinity coords pinned to zero
        out.append(gf.mul(fl, gf.sub(inf, one)))
        acc_bytes = cur[..., at("ax_b") : at("ax_b") + 4 * NL]
        out.append(_grpx(gf.mul(gf.expand_dims(inf, -1), acc_bytes)))
        # acc' copy/set rules (bytewise, affine under the masks)
        s_copy = gf.sub(one, bit)
        an = cur[..., at("anx_b") : at("anx_b") + 4 * NL]
        ac = acc_bytes
        bs = cur[..., at("bx_b") : at("bx_b") + 4 * NL]
        out.append(_grpx(gf.mul(gf.expand_dims(s_copy, -1), gf.sub(an, ac))))
        out.append(_grpx(gf.mul(gf.expand_dims(s_set, -1), gf.sub(an, bs))))
        # ---- base doubling identities (all rows; zero rows vanish) ----
        bx = limbs_t(cur, "bx_b"); by = limbs_t(cur, "by_b")
        bnx = limbs_t(cur, "bnx_b"); bny = limbs_t(cur, "bny_b")
        dl = limbs_t(cur, "dl_b")
        dq = {nm: limbs_t(cur, nm + "_b", NQ) for nm in _DQ}
        identity(out, cur, [("pp", dl, by, 2), ("qp", dq["dqb"], 1),
                            ("pp", bx, bx, -3), ("qp", dq["dqa"], -1)],
                 "dc1")
        identity(out, cur, [("pp", dl, dl, 1), ("qp", dq["dqd"], 1),
                            ("lin", bnx, -1), ("lin", bx, -2),
                            ("qp", dq["dqc"], -1)], "dc2")
        identity(out, cur, [("pp", dl, bx, 1), ("qp", dq["dqf"], 1),
                            ("pp", dl, bnx, -1), ("lin", bny, -1),
                            ("lin", by, -1), ("qp", dq["dqe"], -1)], "dc3")
        # ---- conditional chord add (masked by s_add) ----
        ax = limbs_t(cur, "ax_b"); ay = limbs_t(cur, "ay_b")
        anx = limbs_t(cur, "anx_b"); any_ = limbs_t(cur, "any_b")
        al = limbs_t(cur, "al_b")
        aq = {nm: limbs_t(cur, nm + "_b", NQ) for nm in _AQ}
        identity(out, cur, [("pp", al, bx, 1), ("lin", ay, 1),
                            ("qp", aq["aqb"], 1),
                            ("pp", al, ax, -1), ("lin", by, -1),
                            ("qp", aq["aqa"], -1)], "ac1", mask=s_add)
        identity(out, cur, [("pp", al, al, 1), ("qp", aq["aqd"], 1),
                            ("lin", anx, -1), ("lin", ax, -1),
                            ("lin", bx, -1), ("qp", aq["aqc"], -1)],
                 "ac2", mask=s_add)
        identity(out, cur, [("pp", al, ax, 1), ("qp", aq["aqf"], 1),
                            ("pp", al, anx, -1), ("lin", any_, -1),
                            ("lin", ay, -1), ("qp", aq["aqe"], -1)],
                 "ac3", mask=s_add)
        # ---- logUp byte rows ----
        X = ch[0]
        qb = cur[..., F + _BQ0 : F + _BQ0 + _N_BYTE_Q]
        invb = cur[..., at2("inv_qb") : at2("inv_qb") + _N_BYTE_Q]
        out.append(_grpx(gf.sub(
            gf.mul(invb, gf.sub(gf.expand_dims(X, -1), qb)),
            gf.ones(qb.shape))))
        out.append(gf.sub(
            gf.mul(cur[..., at2("inv_tb")],
                   gf.sub(X, cur[..., fx.at("t_byte")])),
            cur[..., at("m_byte")]))
        return out

    def _lookup_diff(row):
        v = gf.sum_mod(row[..., at2("inv_qb") : at2("inv_qb") + _N_BYTE_Q])
        return gf.sub(v, row[..., at2("inv_tb")])

    def constraints(cur, nxt, ch):
        out = []
        one = gf.ones(())
        pad_c, pad_n = cur[..., at("pad")], nxt[..., at("pad")]
        fl_n = nxt[..., at("fl")]
        fl_c = cur[..., at("fl")]
        ll_c = cur[..., at("ll")]
        # pad monotone; pads start only at a ladder boundary
        out.append(gf.mul(pad_c, gf.sub(one, pad_n)))
        out.append(gf.mul(gf.sub(pad_n, pad_c),
                          gf.sub(one, nxt[..., fx.at("f_l0")])))
        # pad full-row copy (flags pad/fl/ll excluded: own bindings)
        c0 = at("bit")
        out.append(_grpx(gf.mul(
            gf.expand_dims(pad_n, -1),
            gf.sub(nxt[..., c0 : F + P1], cur[..., c0 : F + P1]))))
        # within-ladder state threading
        cn = gf.mul(gf.sub(one, pad_n), gf.sub(one, fl_n))
        st_n = nxt[..., at("bx_b") : at("bx_b") + 4 * NL]
        stp_c = cur[..., at("bnx_b") : at("bnx_b") + 4 * NL]
        acc_n = nxt[..., at("ax_b") : at("ax_b") + 4 * NL]
        accp_c = cur[..., at("anx_b") : at("anx_b") + 4 * NL]
        out.append(_grpx(gf.mul(
            gf.expand_dims(cn, -1),
            gf.concat([gf.sub(st_n, stp_c),
                       gf.sub(acc_n, accp_c)], axis=-1))))
        out.append(gf.mul(cn, gf.sub(nxt[..., at("inf")],
                                     cur[..., at("ninf")])))
        # ---- record stream (phase 2) ----
        gamma = ch[1]
        gp = _gamma_powers67(gamma)                       # (67,) GF
        racc_c = cur[..., at2("racc")]
        racc_n = nxt[..., at2("racc")]
        g1, g65, g66 = gp[1], gp[65], gp[66]
        # Gamma(cur) = 1 + live*(g-1) + fl*(g^65-g) + ll*(g^66-g)
        G = gf.add(one, gf.mul(gf.sub(one, pad_c), gf.sub(g1, one)))
        G = gf.add(G, gf.mul(fl_c, gf.sub(g65, g1)))
        G = gf.add(G, gf.mul(ll_c, gf.sub(g66, g1)))
        # contrib: mid = bit; fl += base bytes at gamma^64..gamma^1;
        # ll = g^65*bit + g^64*inf' + out bytes at gamma^63..gamma^0
        bit_c = cur[..., at("bit")]
        contrib = gf.mul(gf.sub(gf.sub(one, pad_c), ll_c), bit_c)
        base_bytes = cur[..., at("bx_b") : at("bx_b") + 4 * NL]
        w_fl = gp[np.arange(64, 0, -1)]
        contrib = gf.add(contrib, gf.mul(
            fl_c, gf.sum_mod(gf.mul(base_bytes, w_fl), axis=-1)))
        out_bytes = cur[..., at("anx_b") : at("anx_b") + 4 * NL]
        w_ll = gp[np.arange(63, -1, -1)]
        ll_sum = gf.add(gf.mul(bit_c, g65),
                        gf.mul(cur[..., at("ninf")], gp[64]))
        ll_sum = gf.add(ll_sum,
                        gf.sum_mod(gf.mul(out_bytes, w_ll), axis=-1))
        contrib = gf.add(contrib, gf.mul(ll_c, ll_sum))
        out.append(gf.sub(racc_n, gf.add(gf.mul(racc_c, G), contrib)))
        # logUp accumulator transition
        out.append(gf.sub(gf.sub(nxt[..., at2("lacc")],
                                 cur[..., at2("lacc")]),
                          _lookup_diff(nxt)))
        return out

    def first_row(row, public, ch):
        return [row[..., at("pad")],
                row[..., at2("racc")],
                gf.sub(row[..., at2("lacc")], _lookup_diff(row))]

    def last_row(row, public, ch):
        return [gf.sub(row[..., at2("racc")], public[0]),
                row[..., at2("lacc")]]

    return AirSpec(
        num_cols=P1,
        max_degree=3,
        constraints=constraints,
        row_constraints=row_constraints,
        first_row=first_row,
        last_row=last_row,
        num_public=NUM_PUBLIC,
        num_fixed_cols=fx.n,
        num_phase2_cols=layout()[2].n,
        num_challenges=2,
    )


def _gamma_powers67(gamma: GF) -> GF:
    import jax

    def body(p, _):
        return gf.canonicalize(gf.mul(p, gamma)), p

    _, pows = jax.lax.scan(body, gf.ones(()), None, length=67)
    return pows



def fixed_cols(n: int) -> GF:
    r = np.arange(n)
    return gf.from_u64(np.stack([
        (r % 256).astype(np.uint64),
        (r % BITS == 0).astype(np.uint64),
        (r % BITS == BITS - 1).astype(np.uint64),
    ]))


def _bytes_rows(limbs: np.ndarray, nl: int) -> np.ndarray:
    """(R, nl) u16 -> (2*nl, R) bytes [lo0, hi0, ...]."""
    out = np.zeros((2 * nl, limbs.shape[0]), np.uint64)
    for j in range(nl):
        out[2 * j] = limbs[:, j] & 0xFF
        out[2 * j + 1] = (limbs[:, j] >> 8) & 0xFF
    return out


def _ident_carries(terms, R: int) -> np.ndarray:
    """terms: ('pp', A, B, coef) with A/B (R, nl) int64 — returns (R,
    N_POS) carries of the telescoped position sums (must close at 0)."""
    M = np.zeros((R, N_POS), np.int64)
    for t in terms:
        if t[0] == "pp":
            _, A, B, coef = t
            la, lb = A.shape[1], B.shape[1]
            for a in range(la):
                for b in range(lb):
                    if a + b < N_POS:
                        M[:, a + b] += coef * A[:, a] * B[:, b]
        elif t[0] == "qp":
            _, Q, coef = t
            for a in range(Q.shape[1]):
                for b in range(NL):
                    if P_LIMBS[b] and a + b < N_POS:
                        M[:, a + b] += coef * Q[:, a] * P_LIMBS[b]
        else:
            _, A, coef = t
            M[:, :A.shape[1]] += coef * A
    out = np.zeros((R, N_POS), np.int64)
    prev = np.zeros(R, np.int64)
    for j in range(N_POS):
        curv = M[:, j] + prev
        assert (curv % (1 << 16) == 0).all(), f"identity not divisible at {j}"
        curv >>= 16
        out[:, j] = curv
        prev = curv
    assert (prev == 0).all(), "identity does not close"
    return out


def _carry_bytes_rows(vals: np.ndarray) -> np.ndarray:
    out = np.zeros((3 * N_POS, vals.shape[0]), np.uint64)
    b = vals + BIAS
    assert (b >= 0).all() and (b < (1 << 24)).all(), "carry out of range"
    for j in range(N_POS):
        out[3 * j] = b[:, j] & 0xFF
        out[3 * j + 1] = (b[:, j] >> 8) & 0xFF
        out[3 * j + 2] = b[:, j] >> 16
    return out


def build_ecrecover_trace(w) -> Tuple[GF, GF, int]:
    """(fixed, phase1, log_n) from an EcrecoverWitness's step columns."""
    fx, p1, p2 = layout()
    st = {k: np.asarray(v, np.int64) for k, v in w.steps.items()}
    R = st["bit"].shape[0]
    assert R % (2 * BITS) == 0
    n = 1 << max(8, R.bit_length())  # >= R+1 (at least one pad row)
    if n <= R:
        n <<= 1

    cols = np.zeros((p1.n, n), np.uint64)

    def put(name, rows):
        s, k = p1.index[name]
        cols[s : s + k, : rows.shape[1]] = rows

    bit = st["bit"].astype(np.uint64)
    inf = st["acc_inf"].astype(np.uint64)
    ninf = st["acc_ninf"].astype(np.uint64)
    cols[p1.at("bit"), :R] = bit
    cols[p1.at("inf"), :R] = inf
    cols[p1.at("ninf"), :R] = ninf
    cols[p1.at("s_set"), :R] = bit * inf
    cols[p1.at("s_add"), :R] = bit * (1 - inf)
    cols[p1.at("fl"), :R] = (np.arange(R) % BITS == 0).astype(np.uint64)
    cols[p1.at("ll"), :R] = (np.arange(R) % BITS == BITS - 1).astype(np.uint64)

    names = dict(bx="base_x", by="base_y", ax="acc_x", ay="acc_y",
                 bnx="base_nx", bny="base_ny", anx="acc_nx", any="acc_ny",
                 dl="d_lam", al="a_lam")
    for short, full in names.items():
        put(short + "_b", _bytes_rows(st[full], NL))
    for short, full in (list(zip(_DQ, ["d_qa", "d_qb", "d_qc", "d_qd",
                                       "d_qe", "d_qf"]))
                        + list(zip(_AQ, ["a_qa", "a_qb", "a_qc", "a_qd",
                                         "a_qe", "a_qf"]))):
        put(short + "_b", _bytes_rows(st[full], NQ))

    # carry chains (add identities only on s_add rows; zeroed elsewhere)
    bx, by = st["base_x"], st["base_y"]
    bnx, bny = st["base_nx"], st["base_ny"]
    dl = st["d_lam"]
    d_c1 = _ident_carries([("pp", dl, by, 2), ("qp", st["d_qb"], 1),
                           ("pp", bx, bx, -3), ("qp", st["d_qa"], -1)], R)
    d_c2 = _ident_carries([("pp", dl, dl, 1), ("qp", st["d_qd"], 1),
                           ("lin", bnx, -1), ("lin", bx, -2),
                           ("qp", st["d_qc"], -1)], R)
    d_c3 = _ident_carries([("pp", dl, bx, 1), ("qp", st["d_qf"], 1),
                           ("pp", dl, bnx, -1), ("lin", bny, -1),
                           ("lin", by, -1), ("qp", st["d_qe"], -1)], R)
    sadd = (bit * (1 - inf)).astype(np.int64)[:, None]
    ax, ay = st["acc_x"] * sadd, st["acc_y"] * sadd
    anx, any_ = st["acc_nx"] * sadd, st["acc_ny"] * sadd
    al = st["a_lam"] * sadd
    bxm, bym = bx * sadd, by * sadd
    a_c1 = _ident_carries([("pp", al, bxm, 1), ("lin", ay, 1),
                           ("qp", st["a_qb"], 1),
                           ("pp", al, ax, -1), ("lin", bym, -1),
                           ("qp", st["a_qa"], -1)], R)
    a_c2 = _ident_carries([("pp", al, al, 1), ("qp", st["a_qd"], 1),
                           ("lin", anx, -1), ("lin", ax, -1),
                           ("lin", bxm, -1), ("qp", st["a_qc"], -1)], R)
    a_c3 = _ident_carries([("pp", al, ax, 1), ("qp", st["a_qf"], 1),
                           ("pp", al, anx, -1), ("lin", any_, -1),
                           ("lin", ay, -1), ("qp", st["a_qe"], -1)], R)
    for nm, cv in (("dc1", d_c1), ("dc2", d_c2), ("dc3", d_c3),
                   ("ac1", a_c1), ("ac2", a_c2), ("ac3", a_c3)):
        put(nm + "_b", _carry_bytes_rows(cv))
    # pad rows: replicate the last live row, then fix the flags
    cols[:, R:] = cols[:, R - 1][:, None]
    cols[p1.at("pad"), R:] = 1
    cols[p1.at("fl"), R:] = 0
    cols[p1.at("ll"), R:] = 0
    # biased-zero carries already replicated; byte multiplicities
    counts = np.bincount(
        cols[_BQ0 : _BQ0 + _N_BYTE_Q].reshape(-1).astype(np.int64),
        minlength=256)
    cols[p1.index["m_byte"][0], :256] = counts
    return fixed_cols(n), gf.from_u64(cols), int(np.log2(n))


def _build_phase2(trace: GF, ch_ints) -> GF:
    import jax

    fx, p1, p2 = layout()
    F = fx.n
    X = gf.from_u64(np.uint64(ch_ints[0]))
    gamma_i = int(ch_ints[1])
    qb = GF(trace.lo[F + _BQ0 : F + _BQ0 + _N_BYTE_Q].T,
            trace.hi[F + _BQ0 : F + _BQ0 + _N_BYTE_Q].T)
    inv_qb = gf.inv(gf.sub(gf.expand_dims(X, -1), qb))
    t_byte = trace[fx.at("t_byte")]
    m_byte = trace[F + p1.at("m_byte")]
    inv_tb = gf.mul(m_byte, gf.inv(gf.sub(X, t_byte)))
    diff = gf.sub(gf.sum_mod(inv_qb, axis=-1), inv_tb)

    def body(a, d):
        a = gf.add(a, d)
        return a, a

    _, lacc = jax.lax.scan(body, gf.zeros(()), diff)

    # racc column (host): racc BEFORE the row; absorb per the AIR's rule
    n = trace.shape[1]
    pad = np.asarray(trace[F + p1.at("pad")].astype_u64())
    fl = np.asarray(trace[F + p1.at("fl")].astype_u64())
    ll = np.asarray(trace[F + p1.at("ll")].astype_u64())
    bit = np.asarray(trace[F + p1.at("bit")].astype_u64())
    ninf = np.asarray(trace[F + p1.at("ninf")].astype_u64())
    s0, _k0 = p1.index["bx_b"]
    base_b = np.asarray(
        GF(trace.lo[F + s0 : F + s0 + 4 * NL],
           trace.hi[F + s0 : F + s0 + 4 * NL]).astype_u64())
    s1, _k1 = p1.index["anx_b"]
    out_b = np.asarray(
        GF(trace.lo[F + s1 : F + s1 + 4 * NL],
           trace.hi[F + s1 : F + s1 + 4 * NL]).astype_u64())
    gp = [pow(gamma_i, k, MODULUS) for k in range(67)]
    racc = np.zeros(n, np.uint64)
    a = 0
    for i in range(n):
        racc[i] = a
        if pad[i]:
            continue
        if fl[i]:
            a = a * gp[65] % MODULUS
            for j in range(64):
                a = (a + gp[64 - j] * int(base_b[j, i])) % MODULUS
            a = (a + int(bit[i])) % MODULUS
        elif ll[i]:
            a = a * gp[66] % MODULUS
            a = (a + gp[65] * int(bit[i]) + gp[64] * int(ninf[i])) % MODULUS
            for j in range(64):
                a = (a + gp[63 - j] * int(out_b[j, i])) % MODULUS
        else:
            a = (a * gamma_i + int(bit[i])) % MODULUS
    return gf.concat(
        [GF(inv_qb.lo.T, inv_qb.hi.T),
         gf.stack([inv_tb, lacc, gf.from_u64(racc)], axis=0)],
        axis=0,
    )


# ---------------------------------------------------------------------------
# verifier-side record recomputation (plaintext claims)
# ---------------------------------------------------------------------------


def _point_bytes(x: int, y: int) -> List[int]:
    out = []
    for v in (x, y):
        for j in range(NL):
            limb = (v >> (16 * j)) & 0xFFFF
            out += [limb & 0xFF, limb >> 8]
    return out


def ladder_records(calls_public: Sequence[dict]) -> List[dict]:
    """calls_public: per trace call slot (INCLUDING padded dummy calls):
    {active: bool, u1, u2: int, R: (x, y) | None, acc1: (x, y) | None,
     acc2: (x, y) | None} — the claims the evaluator separately binds to
    the ABI words.  Returns one record dict per ladder, in trace order."""
    records = []
    for cp in calls_public:
        if not cp.get("active", False):
            records.append(dict(base=(0, 0), bits=[0] * BITS, inf=1,
                                out=(0, 0)))
            records.append(dict(base=(0, 0), bits=[0] * BITS, inf=1,
                                out=(0, 0)))
            continue
        for scalar, base, acc in ((cp["u1"], (ec.GX, ec.GY), cp["acc1"]),
                                  (cp["u2"], cp["R"], cp["acc2"])):
            records.append(dict(
                base=base,
                bits=[(scalar >> i) & 1 for i in range(BITS)],
                inf=int(acc is None),
                out=acc if acc is not None else (0, 0),
            ))
    return records


def records_rlc(records: Sequence[dict], gamma: int) -> int:
    a = 0

    def push(v):
        nonlocal a
        a = (a * gamma + int(v)) % MODULUS

    for rec in records:
        for b in _point_bytes(*rec["base"]):
            push(b)
        for i in range(BITS):
            if i < BITS - 1:
                push(rec["bits"][i])
            else:
                push(rec["bits"][i])
                push(rec["inf"])
                for b in _point_bytes(*rec["out"]):
                    push(b)
    return a


def calls_public_from_witness(w) -> List[dict]:
    """Extract the per-call plaintext claims from an EcrecoverWitness.
    Deterministic in the witness; the evaluator binds the same values to
    the ABI/memory tape (models/ecrecover.py eval_constraints)."""
    C = int(np.asarray(w.scalars["u1"]).shape[0])
    exe = np.asarray(w.step_execute)

    def ival(limbs):
        return sum(int(v) << (16 * j) for j, v in enumerate(limbs))

    out = []
    for ci in range(C):
        active = bool(exe[ci * 2 * BITS])
        if not active:
            out.append(dict(active=False))
            continue
        u1 = ival(np.asarray(w.scalars["u1"])[ci])
        u2 = ival(np.asarray(w.scalars["u2"])[ci])
        rx = ival(np.asarray(w.points["rx"])[ci])
        # R.x may be rx + n (the x_overflow branch): read the committed
        # ladder base of the second ladder instead — the evaluator binds it
        base2_x = ival(np.asarray(w.steps["base_x"])[ci * 2 * BITS + BITS])
        base2_y = ival(np.asarray(w.steps["base_y"])[ci * 2 * BITS + BITS])
        a1x = ival(np.asarray(w.points["acc1x"])[ci])
        a1y = ival(np.asarray(w.points["acc1y"])[ci])
        a2x = ival(np.asarray(w.points["acc2x"])[ci])
        a2y = ival(np.asarray(w.points["acc2y"])[ci])
        out.append(dict(
            active=True, u1=u1, u2=u2, R=(base2_x, base2_y),
            acc1=None if u1 == 0 else (a1x, a1y),
            acc2=(a2x, a2y),
        ))
    return out


# ---------------------------------------------------------------------------
# prove / verify
# ---------------------------------------------------------------------------


def prove_ecrecover(w, params: Optional[StarkParams] = None
                    ) -> Tuple[StarkProof, List[dict], StarkParams]:
    """Prove the witness's ladders.  Returns (proof, calls_public, params)."""
    from .stark import _commit_columns

    fixed, phase1, log_n = build_ecrecover_trace(w)
    if params is None:
        params = StarkParams(log_n=log_n)
    air = ecrecover_air()
    ftree = _commit_columns(fixed, params)
    ptree = _commit_columns(phase1, params)
    ch, _ = challenges_from_cap(ptree["cap"], air, ftree["cap"])
    calls_public = calls_public_from_witness(w)
    acc = records_rlc(ladder_records(calls_public), int(ch[1]))
    public = gf.from_u64(np.array([acc], np.uint64))
    proof = prove(phase1, air, params, public, build_phase2=_build_phase2,
                  fixed_cols=fixed)
    return proof, calls_public, params


def verify_ecrecover(proof: StarkProof, calls_public: Sequence[dict],
                     params: StarkParams) -> bool:
    """calls_public: plaintext per-call claims (see ladder_records)."""
    from .stark import _commit_columns

    n = 1 << params.log_n
    if 2 * BITS * len(calls_public) >= n:
        return False
    air = ecrecover_air()
    fixed = fixed_cols(n)
    fcap = _commit_columns(fixed, params)["cap"]
    if len(proof.caps) != 3:
        return False
    ch, _ = challenges_from_cap(proof.caps[1], air, fcap)
    acc = records_rlc(ladder_records(calls_public), int(ch[1]))
    public = gf.from_u64(np.array([acc], np.uint64))
    return verify(proof, air, params, public, fixed_cols=fixed)
