"""eip_4844 Horner-evaluation AIR: STARK proof of the blob polynomial
opening in the BLS12-381 scalar field (VERDICT r4 item 6).

Reference: `src/eip_4844/mod.rs:186-204` — the 4096-step Horner walk
  acc_{i+1} = (acc_i + fe_i) * z  (mod r_BLS),   y = acc_E
over 17xu16-limb nonnative arithmetic inside the constraint system.  The
framework's evaluator (models/eip_4844.py:169-216) checks the same rows;
this module makes them a committed-trace STARK — closing the "Horner
evaluation has no proof" gap of the type-255 verdict.

Row i (one Horner step; E real rows, padded to 2^k):
  add:   acc_i + fe_i = t_i + k_i * r                (k_i < 2^16)
  mul:   t_i * z      = q_i * r + acc_{i+1}          (transition; skipped on
                                                      the last REAL row via
                                                      the fixed `lst` flag)
  last:  t_{E-1} = y                                 (the opening)

All values are committed as BYTES (u16 limbs = b0 + 256 b1), so every
range check is one logUp byte-table membership and every Horner relation is
AFFINE in trace cells: z and r enter as PUBLIC scalars / constants, and the
integer identities are carried by per-limb carry chains (biased carry bytes
C_j = c_j + BIAS, telescoping to exactness in Z because every per-limb
relation's magnitude stays far below the Goldilocks modulus).

Publics: [z limbs (16) | y limbs (16) | fe-stream RLC (1)].  The verifier
recomputes z from the proven challenge-digest truncation, y from the
claimed opening bytes, and the fe RLC from the PLAINTEXT blob chunks (the
same plaintext the type-255 keccak-chain STARKs bind to the blob hashes) —
the plaintext-mediated stream binding used by every hash-chain proof here.

Fixed columns: t_byte (0..255 cyclic), act (1 on real rows), lst (1 on the
last real row).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import gf
from ..ops.gf import GF, MODULUS
from .stark import AirSpec, StarkParams, StarkProof, prove, verify

BLS_FR = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
R_LIMBS = [(BLS_FR >> (16 * j)) & 0xFFFF for j in range(16)]

NFE = 16       # fe/acc/t limbs
NK = 1         # add carry-multiple limbs
NQ = 17        # mul quotient limbs
N_ADD_POS = 17   # carry positions for the add relation (limbs 0..16)
N_MUL_POS = 33   # carry positions for the mul relation (coef 0..32)
ADD_BIAS = 1 << 18
MUL_BIAS = 1 << 22


class _Reg:
    def __init__(self):
        self.index = {}
        self.n = 0

    def add(self, name, k=1):
        self.index[name] = (self.n, k)
        self.n += k

    def sl(self, name):
        s, k = self.index[name]
        return slice(s, s + k)

    def at(self, name, j=0):
        return self.index[name][0] + j


@functools.lru_cache(maxsize=1)
def layout() -> Tuple[_Reg, _Reg, _Reg]:
    fx = _Reg()
    fx.add("t_byte"); fx.add("act"); fx.add("lst")
    p1 = _Reg()
    p1.add("fe_b", 2 * NFE)
    p1.add("acc_b", 2 * NFE)     # acc BEFORE this row's step
    p1.add("t_b", 2 * NFE)
    p1.add("k_b", 2 * NK)
    p1.add("q_b", 2 * NQ)
    p1.add("addc_b", 3 * N_ADD_POS)
    p1.add("mulc_b", 3 * N_MUL_POS)
    p1.add("m_byte")             # byte-table multiplicity
    p2 = _Reg()
    p2.add("inv_qb", p1.index["m_byte"][0])  # one inverse per byte query col
    p2.add("inv_tb")
    p2.add("lacc")               # logUp accumulator
    p2.add("facc")               # fe-stream RLC accumulator (BEFORE row)
    return fx, p1, p2


_N_BYTE_Q = layout()[1].index["m_byte"][0]  # all p1 byte columns before m_byte


def _limb(row, base_ix, j):
    """u16 limb j from byte columns starting at absolute index base_ix."""
    lo = row[..., base_ix + 2 * j]
    hi = row[..., base_ix + 2 * j + 1]
    return gf.add(lo, gf.mul_const(hi, 256))


def _carry(row, base_ix, pos):
    """biased carry value C_pos from its 3 byte columns."""
    b0 = row[..., base_ix + 3 * pos]
    b1 = row[..., base_ix + 3 * pos + 1]
    b2 = row[..., base_ix + 3 * pos + 2]
    return gf.add(b0, gf.add(gf.mul_const(b1, 1 << 8),
                             gf.mul_const(b2, 1 << 16)))


@functools.lru_cache(maxsize=1)
def horner_air() -> AirSpec:
    fx, p1, p2 = layout()
    F, P1, P2 = fx.n, p1.n, p2.n

    def fat(nm, j=0):
        return fx.at(nm, j)

    def at(nm, j=0):
        return F + p1.at(nm, j)

    def at2(nm, j=0):
        return F + P1 + p2.at(nm, j)

    def limbs(row, nm, count):
        return [_limb(row, at(nm), j) for j in range(count)]

    def fe_rlc_row(row, ch):
        """sum_j delta^j fe_byte_j over the 32 committed fe bytes."""
        delta = ch[1]
        acc = row[..., at("fe_b", 2 * NFE - 1)]
        for j in range(2 * NFE - 2, -1, -1):
            acc = gf.add(gf.mul(acc, delta), row[..., at("fe_b", j)])
        return acc

    def compose_row_pub(cur, public, ch, alpha, a_pow):
        from .stark import _alpha_sum

        out = []
        act = cur[..., fat("act")]
        lst = cur[..., fat("lst")]
        fe = limbs(cur, "fe_b", NFE)
        acc = limbs(cur, "acc_b", NFE)
        t = limbs(cur, "t_b", NFE)
        k = _limb(cur, at("k_b"), 0)
        # add relation carry chain: (acc_j + fe_j - t_j - k*r_j) + C_{j-1}
        #   - BIAS_prev == (C_j - BIAS) * 2^16, masked by act
        prev = gf.constant(ADD_BIAS)  # C_{-1} = BIAS (zero carry)
        for j in range(N_ADD_POS):
            if j < NFE:
                a_j = gf.sub(gf.add(acc[j], fe[j]),
                             gf.add(t[j], gf.mul_const(k, R_LIMBS[j])))
            else:
                a_j = gf.zeros(act.shape)
            c_j = _carry(cur, at("addc_b"), j)
            rel = gf.sub(gf.add(a_j, gf.sub(prev, gf.constant(ADD_BIAS))),
                         gf.mul_const(gf.sub(c_j, gf.constant(ADD_BIAS)),
                                      1 << 16))
            out.append(gf.mul(act, rel))
            prev = c_j
        # final add carry must be zero
        out.append(gf.mul(act, gf.sub(prev, gf.constant(ADD_BIAS))))
        # last real row: t == y (publics 16..31)
        for j in range(NFE):
            out.append(gf.mul(lst, gf.sub(t[j], public[NFE + j])))
        # logUp byte rows: inv_qb * (X - b) == 1 per byte query column,
        # inv_tb * (X - t_byte) == m_byte
        X = ch[0]
        qb = cur[..., F : F + _N_BYTE_Q]
        invb = cur[..., at2("inv_qb") : at2("inv_qb") + _N_BYTE_Q]
        d = gf.sub(gf.mul(invb, gf.sub(gf.expand_dims(X, -1), qb)),
                   gf.ones(qb.shape))
        out.append(GF(jnp.moveaxis(d.lo, -1, 0), jnp.moveaxis(d.hi, -1, 0)))
        out.append(gf.sub(
            gf.mul(cur[..., at2("inv_tb")],
                   gf.sub(X, cur[..., fat("t_byte")])),
            cur[..., at("m_byte")]))
        return _alpha_sum(out, alpha, a_pow)

    def constraints_pub(cur, nxt, public, ch):
        out = []
        act = cur[..., fat("act")]
        lst = cur[..., fat("lst")]
        t = limbs(cur, "t_b", NFE)
        q = limbs(cur, "q_b", NQ)
        acc_n = limbs(nxt, "acc_b", NFE)
        z_pub = [public[j] for j in range(NFE)]
        # mul relation: t*z == q*r + acc'  (coefficient carry chain),
        # masked by act*(1-lst)
        mask = gf.mul(act, gf.sub(gf.ones(lst.shape), lst))
        prev = gf.constant(MUL_BIAS)
        for pos in range(N_MUL_POS):
            m_pos = gf.zeros(act.shape)
            for a in range(max(0, pos - NFE + 1), min(NQ, pos + 1)):
                b = pos - a
                if a < NFE and b < NFE:
                    m_pos = gf.add(m_pos, gf.mul(t[a], z_pub[b]))
            for a in range(max(0, pos - 15), min(NQ, pos + 1)):
                b = pos - a
                if b < NFE:
                    m_pos = gf.sub(m_pos, gf.mul_const(q[a], R_LIMBS[b]))
            if pos < NFE:
                m_pos = gf.sub(m_pos, acc_n[pos])
            c_pos = _carry(cur, at("mulc_b"), pos)
            rel = gf.sub(gf.add(m_pos, gf.sub(prev, gf.constant(MUL_BIAS))),
                         gf.mul_const(gf.sub(c_pos, gf.constant(MUL_BIAS)),
                                      1 << 16))
            out.append(gf.mul(mask, rel))
            prev = c_pos
        out.append(gf.mul(mask, gf.sub(prev, gf.constant(MUL_BIAS))))
        # lst row: acc' = t (the no-multiply final step, "horner_last");
        # pad rows hold acc unchanged (so y stays readable on every pad row)
        acc_c = limbs(cur, "acc_b", NFE)
        one = gf.ones(lst.shape)
        for j in range(NFE):
            out.append(gf.mul(lst, gf.sub(acc_n[j], t[j])))
            out.append(gf.mul(gf.sub(one, act), gf.sub(acc_n[j], acc_c[j])))
        # fe-stream RLC: facc' = facc * delta^32 + row_rlc on act rows
        delta = ch[1]
        d32 = delta
        for _ in range(5):
            d32 = gf.mul(d32, d32)  # delta^32
        facc_c = cur[..., at2("facc")]
        facc_n = nxt[..., at2("facc")]
        pushed = gf.add(gf.mul(facc_c, d32), fe_rlc_row(cur, ch))
        out.append(gf.sub(
            facc_n,
            gf.add(gf.mul(act, pushed),
                   gf.mul(gf.sub(gf.ones(act.shape), act), facc_c))))
        # logUp accumulator transition
        out.append(gf.sub(gf.sub(nxt[..., at2("lacc")], cur[..., at2("lacc")]),
                          _lookup_diff(nxt)))
        return out

    def _lookup_diff(row):
        v = gf.sum_mod(row[..., at2("inv_qb") : at2("inv_qb") + _N_BYTE_Q])
        return gf.sub(v, row[..., at2("inv_tb")])

    def first_row(row, public, ch):
        out = [row[..., at("acc_b", j)] for j in range(2 * NFE)]
        out.append(gf.sub(row[..., at2("lacc")], _lookup_diff(row)))
        out.append(row[..., at2("facc")])
        return out

    def last_row(row, public, ch):
        # the final pad row: facc carries the stream RLC (publics[32]);
        # logUp accumulator closes at zero
        return [gf.sub(row[..., at2("facc")], public[2 * NFE]),
                row[..., at2("lacc")]]

    return AirSpec(
        num_cols=P1,
        max_degree=3,
        constraints=None,
        constraints_pub=constraints_pub,
        compose_row_pub=compose_row_pub,
        first_row=first_row,
        last_row=last_row,
        num_public=2 * NFE + 1,
        num_fixed_cols=F,
        num_phase2_cols=P2,
        num_challenges=2,
    )


# ---------------------------------------------------------------------------
# trace builder
# ---------------------------------------------------------------------------


def fixed_cols(n: int, E: int) -> GF:
    t_byte = np.arange(n, dtype=np.uint64) % 256
    act = (np.arange(n) < E).astype(np.uint64)
    lst = (np.arange(n) == E - 1).astype(np.uint64)
    return gf.from_u64(np.stack([t_byte, act, lst]))


def _bytes_of_limbs(limbs: np.ndarray, nl: int) -> np.ndarray:
    """(E, nl) u16 limbs -> (2*nl, E) byte rows [lo0, hi0, lo1, ...]."""
    out = np.zeros((2 * nl, limbs.shape[0]), np.uint64)
    for j in range(nl):
        out[2 * j] = limbs[:, j] & 0xFF
        out[2 * j + 1] = limbs[:, j] >> 8
    return out


def _carry_bytes(vals: np.ndarray, bias: int, npos: int) -> np.ndarray:
    """(E, npos) signed carries -> (3*npos, E) biased byte rows."""
    out = np.zeros((3 * npos, vals.shape[0]), np.uint64)
    b = vals + bias
    assert (b >= 0).all() and (b < (1 << 24)).all(), "carry out of range"
    for j in range(npos):
        out[3 * j] = b[:, j] & 0xFF
        out[3 * j + 1] = (b[:, j] >> 8) & 0xFF
        out[3 * j + 2] = b[:, j] >> 16
    return out


def horner_trace(w, E: int) -> Tuple[GF, GF, GF, int]:
    """(fixed, phase1, publics-sans-RLC placeholder, log_n) from an
    EIP4844Witness.  The fe-RLC public is challenge-dependent and appended
    by prove_horner after the challenge round."""
    fe = np.asarray(w.fe, np.int64)          # (E, 16)
    acc = np.asarray(w.acc, np.int64)        # (E+1, 16)
    t = np.asarray(w.t, np.int64)            # (E, 16)
    k = np.asarray(w.add_k, np.int64)        # (E, 1)
    q = np.asarray(w.mul_q, np.int64)        # (E, 17)
    z = np.asarray(w.z, np.int64)            # (16,)
    r = np.asarray(R_LIMBS, np.int64)

    n = 1 << max(8, (max(E + 1, 2) - 1).bit_length())  # >= 256 (byte table)
    is_last = np.arange(E) == E - 1

    # add carries: (acc + fe - t - k*r) telescoping per limb
    A = np.zeros((E, N_ADD_POS), np.int64)
    A[:, :NFE] = acc[:-1] + fe - t - k * r[None, :]
    addc = np.zeros((E, N_ADD_POS), np.int64)
    prev = np.zeros(E, np.int64)
    for j in range(N_ADD_POS):
        cur = (A[:, j] + prev)
        assert (cur % (1 << 16) == 0).all()
        cur >>= 16
        addc[:, j] = cur
        prev = cur
    assert (prev == 0).all()

    # mul carries: t*z - q*r - acc' per coefficient (zeroed on last row)
    M = np.zeros((E, N_MUL_POS), np.int64)
    for pos in range(N_MUL_POS):
        s = np.zeros(E, np.int64)
        for a in range(max(0, pos - NFE + 1), min(NFE, pos + 1)):
            b = pos - a
            if b < NFE:
                s += t[:, a] * z[b]
        for a in range(max(0, pos - 15), min(NQ, pos + 1)):
            b = pos - a
            if b < NFE:
                s -= q[:, a] * r[b]
        if pos < NFE:
            s -= acc[1:, pos]
        M[:, pos] = s
    M[is_last] = 0
    mulc = np.zeros((E, N_MUL_POS), np.int64)
    prev = np.zeros(E, np.int64)
    for j in range(N_MUL_POS):
        cur = M[:, j] + prev
        assert (cur % (1 << 16) == 0).all(), (j, cur[:4])
        cur >>= 16
        mulc[:, j] = cur
        prev = cur
    assert (prev == 0).all()

    fx, p1, p2 = layout()
    cols = np.zeros((p1.n, n), np.uint64)

    def put(name, rows):
        s, kk = p1.index[name]
        cols[s : s + kk, : rows.shape[1]] = rows

    put("fe_b", _bytes_of_limbs(fe, NFE))
    # acc column = acc BEFORE the row; pad rows replicate acc_E (= y)
    acc_col = np.concatenate(
        [acc[:E], np.repeat(acc[E][None], n - E, axis=0)], axis=0
    )
    s, kk = p1.index["acc_b"]
    cols[s : s + kk] = _bytes_of_limbs(acc_col, NFE)
    put("t_b", _bytes_of_limbs(t, NFE))
    put("k_b", _bytes_of_limbs(k, NK))
    put("q_b", _bytes_of_limbs(q, NQ))
    put("addc_b", _carry_bytes(addc, ADD_BIAS, N_ADD_POS))
    put("mulc_b", _carry_bytes(mulc, MUL_BIAS, N_MUL_POS))
    # pad-row carries must encode zero (biased)
    for nm, bias, npos in (("addc_b", ADD_BIAS, N_ADD_POS),
                           ("mulc_b", MUL_BIAS, N_MUL_POS)):
        s, kk = p1.index[nm]
        for j in range(npos):
            cols[s + 3 * j, E:] = bias & 0xFF
            cols[s + 3 * j + 1, E:] = (bias >> 8) & 0xFF
            cols[s + 3 * j + 2, E:] = bias >> 16
    # byte-table multiplicities over every byte query column
    counts = np.bincount(
        cols[:_N_BYTE_Q].reshape(-1).astype(np.int64), minlength=256
    )
    m_col = np.zeros(n, np.uint64)
    m_col[:256] = counts
    cols[p1.index["m_byte"][0]] = m_col

    publics = np.zeros(2 * NFE + 1, np.uint64)
    publics[:NFE] = z.astype(np.uint64)
    publics[NFE : 2 * NFE] = acc[E].astype(np.uint64)  # y
    return fixed_cols(n, E), gf.from_u64(cols), publics, int(np.log2(n))


def _build_phase2(trace: GF, ch_ints) -> GF:
    import jax
    import jax.numpy as jnp

    fx, p1, p2 = layout()
    F = fx.n
    X = gf.from_u64(np.uint64(ch_ints[0]))
    delta = gf.from_u64(np.uint64(ch_ints[1]))
    qb = GF(trace.lo[F : F + _N_BYTE_Q].T, trace.hi[F : F + _N_BYTE_Q].T)
    inv_qb = gf.inv(gf.sub(gf.expand_dims(X, -1), qb))      # (n, NB)
    t_byte = trace[fx.at("t_byte")]
    m_byte = trace[F + p1.at("m_byte")]
    inv_tb = gf.mul(m_byte, gf.inv(gf.sub(X, t_byte)))
    diff = gf.sub(gf.sum_mod(inv_qb, axis=-1), inv_tb)

    def body(a, d):
        a = gf.add(a, d)
        return a, a

    _, lacc = jax.lax.scan(body, gf.zeros(()), diff)

    act = trace[fx.at("act")]
    fe_b = trace[F + p1.at("fe_b") : F + p1.at("fe_b") + 2 * NFE]
    d32 = delta
    for _ in range(5):
        d32 = gf.mul(d32, d32)
    rlc_rows = fe_b[2 * NFE - 1]
    for j in range(2 * NFE - 2, -1, -1):
        rlc_rows = gf.add(gf.mul(rlc_rows, delta), fe_b[j])

    def fbody(a, xs):
        a_act, r_row = xs
        nxt = gf.add(gf.mul(a, d32), r_row)
        a2 = GF(
            jnp.where(a_act.lo != 0, nxt.lo, a.lo),
            jnp.where(a_act.lo != 0, nxt.hi, a.hi),
        )
        return gf.canonicalize(a2), a

    _, facc = jax.lax.scan(fbody, gf.zeros(()), (act, gf.canonicalize(rlc_rows)))
    return gf.concat(
        [GF(inv_qb.lo.T, inv_qb.hi.T), gf.stack([inv_tb, lacc, facc], axis=0)],
        axis=0,
    )


def stream_rlc_host(fe_limbs: np.ndarray, delta: int) -> int:
    """Verifier-side recomputation of the fe-stream RLC from plaintext
    limbs (derived from the public blob chunks)."""
    acc = 0
    for i in range(fe_limbs.shape[0]):
        bs = []
        for j in range(NFE):
            bs.append(int(fe_limbs[i, j]) & 0xFF)
            bs.append(int(fe_limbs[i, j]) >> 8)
        row = 0
        for b in reversed(bs):
            row = (row * delta + b) % MODULUS
        acc = (acc * pow(delta, 32, MODULUS) + row) % MODULUS
    return acc


def prove_horner(w, E: int, params: Optional[StarkParams] = None):
    """Prove the blob's Horner opening.  Returns (proof, publics, params)."""
    from .stark import challenges_from_cap, _commit_columns

    fixed, phase1, publics, log_n = horner_trace(w, E)
    if params is None:
        params = StarkParams(log_n=log_n)
    air = horner_air()
    # the fe-RLC public depends on the delta challenge drawn from the caps:
    # pre-commit to derive it exactly as the verifier will
    ftree = _commit_columns(fixed, params)
    ptree = _commit_columns(phase1, params)
    ch, _ = challenges_from_cap(ptree["cap"], air, ftree["cap"])
    fe = np.asarray(w.fe, np.uint64)[:E]
    publics = publics.copy()
    publics[2 * NFE] = stream_rlc_host(fe, ch[1])
    proof = prove(phase1, air, params, gf.from_u64(publics),
                  build_phase2=_build_phase2, fixed_cols=fixed)
    return proof, publics, params


def verify_horner(proof: StarkProof, w_public: dict,
                  params: StarkParams) -> bool:
    """w_public: {chunks: (E, 31) bytes-as-ints, truncated: (16,) bytes,
    opening_be: (32,) bytes, E: int} — ALL public data; z/y/fe are
    recomputed from it, never taken from the prover."""
    from .stark import challenges_from_cap, _commit_columns

    E = int(w_public["E"])
    chunks = np.asarray(w_public["chunks"], np.uint64)
    trunc = np.asarray(w_public["truncated"], np.uint64)
    opening = np.asarray(w_public["opening_be"], np.uint64)
    n = 1 << params.log_n
    air = horner_air()
    fixed = fixed_cols(n, E)
    # z limbs from the BE truncated digest (models/eip_4844.py z_limbs rule)
    z = np.zeros(NFE, np.uint64)
    for i in range(16):
        z[(15 - i) // 2] += trunc[i] << np.uint64(8 * ((15 - i) % 2))
    # y limbs from the BE opening bytes
    y = np.zeros(NFE, np.uint64)
    for i in range(32):
        y[(31 - i) // 2] += opening[i] << np.uint64(8 * ((31 - i) % 2))
    # fe limbs from chunk bytes (31 LE bytes -> 16 limbs)
    fe = np.zeros((E, NFE), np.uint64)
    for j in range(NFE):
        lo = chunks[:, 2 * j]
        hi = chunks[:, 2 * j + 1] if 2 * j + 1 < 31 else np.zeros(E, np.uint64)
        fe[:, j] = lo | (hi << np.uint64(8))
    # replay the challenge round to derive delta for the fe-RLC public
    ftree_cap = _commit_columns(fixed, params)["cap"]
    ch, _ = challenges_from_cap(proof.caps[1], air, ftree_cap)
    publics = np.zeros(2 * NFE + 1, np.uint64)
    publics[:NFE] = z
    publics[NFE : 2 * NFE] = y
    publics[2 * NFE] = stream_rlc_host(fe, ch[1])
    return verify(proof, air, params, gf.from_u64(publics), fixed_cols=fixed)
