"""keccak-f[1600] sponge-chain AIR: STARK proofs of keccak256 digests.

Closes VERDICT r3 missing #3 for the keccak-based circuits: the
keccak256_round_function precompile (type 5, ref
`src/keccak256_round_function/mod.rs:795+`), linear_hasher (type 13,
`src/linear_hasher/mod.rs`), and storage_application's state-diff
keccak accumulator all hash byte streams with keccak256; this module proves
`digest = keccak256(message)` as a committed-trace STARK instead of
trusting the evaluator's keccak-f re-execution (ops/keccak.py).

Design (bit-column AIR, one row per round; TPU-shaped: every constraint is
a vectorized gather/elementwise group, no unrolled chains):

  row r of block b (r = 0..23, schedule pinned by FIXED columns):
    pad | ab | cont | rcb[64] |
    A[1600]          state bits at round input
    c0,c1,c2[320]    theta column-parity decomposition:
                       sum_y A[x,y,z] = c0 + 2 c1 + 4 c2   (affine)
    ap[1600]         post-theta bits: ap = XOR3(A, c0[x-1,z], c0[x+1,z-1]),
                       XOR3(u,v,w) = u+v+w - 2(uv+uw+vw) + 4uvw  (degree 3)
    t[1600]          chi product bits: t = (1 - B[x+1]) * B[x+2] where
                       B = rho/pi rewiring of ap (pure index map, degree 2)
    O[1600]          round output: O = B + t - 2 B t, with iota on lane
                       (0,0): O = X + rcb[z] - 2 X rcb[z]  (degree 3)
  transitions:
    cont' * (A' - O)             round-to-round continuity
    ab'   * (A'_cap - O_cap)     absorb rows keep capacity lanes
    ab'   * (acc' - acc*g^1088 - sum_i g^i XOR2(A'_i, O_i))
                                 message RLC over the absorbed rate bits
                                 (XOR2(a,b) = a + b - 2ab: the absorbed
                                 block is A_next XOR O_prev)
    pad'  * (col' - col)         padding replicates the last live row, so
                                 the digest reaches row n-1 and every
                                 row-local constraint stays satisfied
                                 (rcb is committed + live-bound to the
                                 fixed schedule exactly so copies verify)

  publics: [digest as 8 u32 (lanes 0..3 of the final O), message-RLC acc].
  The verifier recomputes the RLC from the PLAINTEXT padded message under
  the transcript-bound gamma — the proof commits to the exact byte stream
  (the same plaintext-mediated binding as prover/poseidon2_air.py).

Fixed columns (verifier-known): rcf[64] iota round-constant bits of the
round schedule, ir0 (round-0 flag).  A pad region may only begin where a
new block would start ((pad'-pad)*(1-ir0') = 0), so partial blocks cannot
be smuggled past the RLC.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import gf
from ..ops.gf import GF, MODULUS
from ..ops.keccak import KECCAK_RATE_BYTES, ROT, ROUND_CONSTANTS
from .stark import (AirSpec, StarkParams, StarkProof, challenges_from_cap,
                    prove, verify)

LANES = 25
ZBITS = 64
NBITS = LANES * ZBITS          # 1600
RATE_BITS = (KECCAK_RATE_BYTES // 8) * ZBITS  # 1088
ROUNDS = 24


def _lane(x: int, y: int) -> int:
    return x + 5 * y


def _bit(x: int, y: int, z: int) -> int:
    return _lane(x, y) * ZBITS + z


@functools.lru_cache(maxsize=1)
def _index_maps():
    """Static gather maps shared by the AIR and the trace builder."""
    # theta parity groups: PAR[(x, z)] = 5 A-bit indices of column (x, z)
    PAR = np.zeros((5 * ZBITS, 5), np.int64)
    for x in range(5):
        for z in range(ZBITS):
            PAR[x * ZBITS + z] = [_bit(x, y, z) for y in range(5)]
    # ap[pos] = XOR3(A[pos], c0[XU[pos]], c0[XV[pos]])
    XU = np.zeros(NBITS, np.int64)
    XV = np.zeros(NBITS, np.int64)
    for x in range(5):
        for y in range(5):
            for z in range(ZBITS):
                i = _bit(x, y, z)
                XU[i] = ((x - 1) % 5) * ZBITS + z
                XV[i] = ((x + 1) % 5) * ZBITS + (z - 1) % ZBITS
    # B[x,y,z] = ap[BI[x,y,z]] (rho rotation + pi lane permutation)
    BI = np.zeros(NBITS, np.int64)
    for x in range(5):
        for y in range(5):
            p, q = y, (2 * x + 3 * y) % 5
            r = ROT[x][y]
            for z in range(ZBITS):
                BI[_bit(p, q, z)] = _bit(x, y, (z - r) % ZBITS)
    B1I = np.zeros(NBITS, np.int64)
    B2I = np.zeros(NBITS, np.int64)
    for x in range(5):
        for y in range(5):
            for z in range(ZBITS):
                i = _bit(x, y, z)
                B1I[i] = BI[_bit((x + 1) % 5, y, z)]
                B2I[i] = BI[_bit((x + 2) % 5, y, z)]
    return PAR, XU, XV, BI, B1I, B2I


# round-constant bits, (ROUNDS, 64)
_RC_BITS = np.array(
    [[(rc >> z) & 1 for z in range(ZBITS)] for rc in ROUND_CONSTANTS],
    np.uint64,
)


class _Cols:
    def __init__(self):
        i = 0
        self.pad = i; i += 1
        self.ab = i; i += 1
        self.cont = i; i += 1
        self.rcb = slice(i, i + ZBITS); i += ZBITS
        self.A = slice(i, i + NBITS); i += NBITS
        self.c0 = slice(i, i + 5 * ZBITS); i += 5 * ZBITS
        self.c1 = slice(i, i + 5 * ZBITS); i += 5 * ZBITS
        self.c2 = slice(i, i + 5 * ZBITS); i += 5 * ZBITS
        self.ap = slice(i, i + NBITS); i += NBITS
        self.t = slice(i, i + NBITS); i += NBITS
        self.O = slice(i, i + NBITS); i += NBITS
        self.num_phase1 = i
        self.acc = i  # phase-2 (index in the concatenated row)
        # fixed columns (own tree, indices 0.. in the fixed group)
        self.f_rcf = slice(0, ZBITS)
        self.f_ir0 = ZBITS
        self.num_fixed = ZBITS + 1


@functools.lru_cache(maxsize=1)
def _cols() -> _Cols:
    return _Cols()


NUM_PUBLIC = 9  # 8 u32 digest words + message RLC


def fixed_columns(n: int) -> GF:
    c = _cols()
    out = np.zeros((c.num_fixed, n), np.uint64)
    r = np.arange(n) % ROUNDS
    out[c.f_rcf.start : c.f_rcf.stop] = _RC_BITS[r].T
    out[c.f_ir0] = (np.arange(n) % ROUNDS == 0).astype(np.uint64)
    return gf.from_u64(out)


def _sl(cur: GF, base: int, s) -> GF:
    if isinstance(s, slice):
        return cur[..., np.arange(base + s.start, base + s.stop)]
    return cur[..., base + s]


def _grp(v: GF) -> GF:
    return GF(jnp.moveaxis(v.lo, -1, 0), jnp.moveaxis(v.hi, -1, 0))


def _gamma_powers(gamma: GF, k: int) -> GF:
    import jax

    def body(p, _):
        return gf.canonicalize(gf.mul(p, gamma)), p

    _, pows = jax.lax.scan(body, gf.ones(()), None, length=k)
    return pows


def _pow_static(x: GF, e: int) -> GF:
    """x^e for a static exponent via square-and-multiply (log depth)."""
    acc = None
    base = x
    while e:
        if e & 1:
            acc = base if acc is None else gf.canonicalize(gf.mul(acc, base))
        base = gf.canonicalize(gf.mul(base, base))
        e >>= 1
    return acc if acc is not None else gf.ones(())


@functools.lru_cache(maxsize=1)
def keccak_air() -> AirSpec:
    c = _cols()
    F = c.num_fixed
    PAR, XU, XV, BI, B1I, B2I = _index_maps()
    one = gf.ones(())
    lane00 = np.arange(ZBITS)                  # O indices of lane (0,0)
    others = np.arange(ZBITS, NBITS)           # all other lanes
    cap_ix = np.arange(RATE_BITS, NBITS)       # capacity bit positions
    rate_ix = np.arange(RATE_BITS)

    bool_slices = ["A", "c0", "c1", "c2", "ap", "t", "O", "rcb"]

    def _not(x):
        return gf.sub(one, x)

    def row_constraints(cur, ch):
        out = []
        pad = _sl(cur, F, c.pad)
        ab = _sl(cur, F, c.ab)
        cont = _sl(cur, F, c.cont)
        live = _not(pad)
        ir0 = _sl(cur, 0, c.f_ir0)
        # booleanity
        for nm in ("pad", "ab", "cont"):
            v = _sl(cur, F, getattr(c, nm))
            out.append(gf.mul(v, gf.sub(v, one)))
        for nm in bool_slices:
            v = _sl(cur, F, getattr(c, nm))
            out.append(_grp(gf.mul(v, gf.sub(v, one))))
        # row-type bindings
        out.append(gf.sub(ab, gf.mul(live, ir0)))
        out.append(gf.sub(cont, gf.mul(live, _not(ir0))))
        # rcb pins the fixed iota schedule on live rows (copied on pad)
        rcb = _sl(cur, F, c.rcb)
        rcf = _sl(cur, 0, c.f_rcf)
        out.append(gf.mul(live, _grp(gf.sub(rcb, rcf))))
        # theta parity
        A = _sl(cur, F, c.A)
        c0 = _sl(cur, F, c.c0)
        c1 = _sl(cur, F, c.c1)
        c2 = _sl(cur, F, c.c2)
        psum = A[..., PAR[:, 0]]
        for k in range(1, 5):
            psum = gf.add(psum, A[..., PAR[:, k]])
        out.append(_grp(gf.sub(psum, gf.add(c0, gf.add(
            gf.mul_const(c1, 2), gf.mul_const(c2, 4))))))
        # ap = XOR3(A, c0[XU], c0[XV])
        ap = _sl(cur, F, c.ap)
        u, v, w = A, c0[..., XU], c0[..., XV]
        uv = gf.mul(u, v)
        uw = gf.mul(u, w)
        vw = gf.mul(v, w)
        x3 = gf.sub(gf.add(gf.add(u, v), w),
                    gf.double(gf.add(gf.add(uv, uw), vw)))
        x3 = gf.add(x3, gf.mul_const(gf.mul(uv, w), 4))
        out.append(_grp(gf.sub(ap, x3)))
        # t = (1 - B1) * B2
        t = _sl(cur, F, c.t)
        B1 = ap[..., B1I]
        B2 = ap[..., B2I]
        out.append(_grp(gf.sub(t, gf.sub(B2, gf.mul(B1, B2)))))
        # O = chi (+ iota on lane 00):  X = B + t - 2 B t
        O = _sl(cur, F, c.O)
        B = ap[..., BI]
        X = gf.sub(gf.add(B, t), gf.double(gf.mul(B, t)))
        out.append(_grp(gf.sub(O[..., others], X[..., others])))
        X0 = X[..., lane00]
        iota = gf.sub(gf.add(X0, rcb), gf.double(gf.mul(X0, rcb)))
        out.append(_grp(gf.sub(O[..., lane00], iota)))
        return out

    def constraints(cur, nxt, ch):
        out = []
        pad_c = _sl(cur, F, c.pad)
        pad_n = _sl(nxt, F, c.pad)
        ab_n = _sl(nxt, F, c.ab)
        cont_n = _sl(nxt, F, c.cont)
        ir0_n = _sl(nxt, 0, c.f_ir0)
        one_ = one
        # pad monotone + block-aligned start
        out.append(gf.mul(pad_c, gf.sub(one_, pad_n)))
        out.append(gf.mul(gf.sub(pad_n, pad_c), gf.sub(one_, ir0_n)))
        # pad rows replicate the previous row (all committed phase-1 bits)
        copy_ix = np.arange(c.rcb.start, c.num_phase1)
        diff = gf.sub(nxt[..., F + copy_ix], cur[..., F + copy_ix])
        out.append(gf.mul(pad_n, _grp(diff)))
        # continuity: next round input = this round output
        A_n = _sl(nxt, F, c.A)
        O_c = _sl(cur, F, c.O)
        out.append(gf.mul(cont_n, _grp(gf.sub(A_n, O_c))))
        cap = np.arange(RATE_BITS, NBITS)
        out.append(gf.mul(ab_n, _grp(gf.sub(A_n[..., cap], O_c[..., cap]))))
        # message RLC: absorbed block = A_next XOR O_prev on the rate bits
        gamma = ch[0]
        acc_c = cur[..., F + c.acc]
        acc_n = nxt[..., F + c.acc]
        gpows = _gamma_powers(gamma, RATE_BITS)
        a_r = A_n[..., rate_ix]
        o_r = O_c[..., rate_ix]
        m = gf.sub(gf.add(a_r, o_r), gf.double(gf.mul(a_r, o_r)))
        rlc = gf.sum_mod(gf.mul(m, gpows), axis=-1)
        G = _pow_static(gamma, RATE_BITS)
        out.append(gf.mul(ab_n, gf.sub(acc_n,
                                       gf.add(gf.mul(acc_c, G), rlc))))
        out.append(gf.mul(gf.sub(one_, ab_n), gf.sub(acc_n, acc_c)))
        return out

    def first_row(row, public, ch):
        out = [_sl(row, F, c.pad)]
        A = _sl(row, F, c.A)
        out.append(_grp(A[..., cap_ix]))
        gamma = ch[0]
        gpows = _gamma_powers(gamma, RATE_BITS)
        out.append(gf.sub(row[..., F + c.acc],
                          gf.sum_mod(gf.mul(A[..., rate_ix], gpows),
                                     axis=-1)))
        return out

    def last_row(row, public, ch):
        out = []
        O = _sl(row, F, c.O)
        w32 = gf.from_u64(np.uint64(1) << np.arange(32, dtype=np.uint64))
        for j in range(8):
            bits = O[..., np.arange(32 * j, 32 * (j + 1))]
            out.append(gf.sub(gf.sum_mod(gf.mul(bits, w32), axis=-1),
                              public[j]))
        out.append(gf.sub(row[..., F + c.acc], public[8]))
        return out

    return AirSpec(
        num_cols=c.num_phase1,
        max_degree=3,
        constraints=constraints,
        row_constraints=row_constraints,
        first_row=first_row,
        last_row=last_row,
        num_public=NUM_PUBLIC,
        num_fixed_cols=c.num_fixed,
        num_phase2_cols=1,
        num_challenges=1,
    )


# ---------------------------------------------------------------------------
# trace builder (numpy bit vectors; mirrors ops/keccak.py semantics)
# ---------------------------------------------------------------------------


def pad_message(message: bytes) -> np.ndarray:
    """keccak256 0x01..0x80 padding -> (B, RATE_BITS) bit blocks."""
    rate = KECCAK_RATE_BYTES
    padded = bytearray(message)
    pad_len = rate - (len(padded) % rate)
    if pad_len == 1:
        padded += b"\x81"
    else:
        padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80"
    data = np.frombuffer(bytes(padded), np.uint8)
    bits = np.unpackbits(data, bitorder="little").astype(np.uint64)
    return bits.reshape(-1, RATE_BITS)


def _round_witness(A: np.ndarray, rnd: int):
    """One keccak round on a (NBITS,) bit vector; returns per-column bits."""
    PAR, XU, XV, BI, B1I, B2I = _index_maps()
    csum = A[PAR].sum(axis=1)
    c0, c1, c2 = csum & 1, (csum >> 1) & 1, (csum >> 2) & 1
    ap = A ^ c0[XU] ^ c0[XV]
    B1, B2, B = ap[B1I], ap[B2I], ap[BI]
    t = (1 - B1) * B2
    O = B ^ t
    O[:ZBITS] ^= _RC_BITS[rnd]
    return c0, c1, c2, ap, t, O


def build_keccak_trace(message: bytes) -> Tuple[GF, GF, np.ndarray, object, int]:
    """(phase1, fixed, digest_words(8,) u32, build_phase2, log_n)."""
    c = _cols()
    blocks = pad_message(message)
    B = blocks.shape[0]
    live = ROUNDS * B
    n = 1 << max(5, live.bit_length())  # 24*B is never a power of two

    C = np.zeros((c.num_phase1, n), np.uint64)
    state = np.zeros(NBITS, np.uint64)
    msg_blocks = []
    r_ix = 0
    for b in range(B):
        A = state.copy()
        A[:RATE_BITS] ^= blocks[b]
        msg_blocks.append(blocks[b])
        for rnd in range(ROUNDS):
            c0, c1, c2, ap, t, O = _round_witness(A, rnd)
            C[c.A.start : c.A.stop, r_ix] = A
            C[c.c0.start : c.c0.stop, r_ix] = c0
            C[c.c1.start : c.c1.stop, r_ix] = c1
            C[c.c2.start : c.c2.stop, r_ix] = c2
            C[c.ap.start : c.ap.stop, r_ix] = ap
            C[c.t.start : c.t.stop, r_ix] = t
            C[c.O.start : c.O.stop, r_ix] = O
            C[c.rcb.start : c.rcb.stop, r_ix] = _RC_BITS[rnd]
            C[c.ab, r_ix] = 1 if rnd == 0 else 0
            C[c.cont, r_ix] = 0 if rnd == 0 else 1
            A = O
            r_ix += 1
        state = A
    # pad: replicate the last live row; pad/ab/cont flags
    C[c.rcb.start :, live:] = C[c.rcb.start :, live - 1][:, None]
    C[c.pad, live:] = 1
    C[c.ab, live:] = 0
    C[c.cont, live:] = 0

    digest_bits = state[: 8 * 32].reshape(8, 32)
    digest_words = (digest_bits << np.arange(32, dtype=np.uint64)).sum(1)

    def build_phase2(_trace, ch):
        gamma = ch[0]
        G = pow(gamma, RATE_BITS, MODULUS)
        acc = np.zeros(n, np.uint64)
        a = 0
        row = 0
        for b in range(B):
            r = 0
            g = 1
            for i in range(RATE_BITS):
                if msg_blocks[b][i]:
                    r = (r + g) % MODULUS
                g = g * gamma % MODULUS
            a = (a * G + r) % MODULUS if b else r
            acc[row : row + ROUNDS] = a
            row += ROUNDS
        acc[row:] = a
        return gf.from_u64(acc[None, :])

    log_n = int(n).bit_length() - 1
    return (gf.from_u64(C), fixed_columns(n), digest_words.astype(np.uint32),
            build_phase2, log_n)


def message_rlc(message: bytes, gamma: int) -> int:
    """Verifier-side RLC over the padded message bit blocks."""
    blocks = pad_message(message)
    G = pow(gamma, RATE_BITS, MODULUS)
    a = 0
    for b in range(blocks.shape[0]):
        r = 0
        g = 1
        for i in range(RATE_BITS):
            if blocks[b][i]:
                r = (r + g) % MODULUS
            g = g * gamma % MODULUS
        a = (a * G + r) % MODULUS if b else r
    return a


def _publics(digest_words: np.ndarray, acc: int) -> GF:
    return gf.from_u64(np.concatenate(
        [np.asarray(digest_words, np.uint64), [np.uint64(acc)]]))


def prove_keccak256(message: bytes,
                    params: Optional[StarkParams] = None
                    ) -> Tuple[StarkProof, bytes, StarkParams]:
    """STARK-prove digest = keccak256(message); returns (proof, digest,
    params).  The digest and the message RLC are the proof's publics."""
    from .stark import _commit_columns

    phase1, fixed, digest_words, build_phase2, log_n = (
        build_keccak_trace(message))
    air = keccak_air()
    if params is None:
        params = StarkParams(log_n=log_n)
    cap_f = _commit_columns(fixed, params)["cap"]
    cap_1 = _commit_columns(phase1, params)["cap"]
    (gamma,), _ = challenges_from_cap(cap_1, air, cap_f)
    acc = message_rlc(message, gamma)
    public = _publics(digest_words, acc)
    proof = prove(phase1, air, params, public, build_phase2=build_phase2,
                  fixed_cols=fixed)
    digest = b"".join(int(w).to_bytes(4, "little") for w in digest_words)
    return proof, digest, params


def verify_keccak256(proof: StarkProof, message: bytes, digest: bytes,
                     params: StarkParams) -> bool:
    """Verifier: recompute the fixed columns (VK), re-derive gamma, rebuild
    the publics from the PLAINTEXT message + claimed digest, verify."""
    air = keccak_air()
    n = 1 << params.log_n
    if ROUNDS * pad_message(message).shape[0] > n:
        return False
    fixed = fixed_columns(n)
    if len(proof.caps) != 3 or len(digest) != 32:
        return False
    (gamma,), _ = challenges_from_cap(proof.caps[1], air, proof.caps[0])
    acc = message_rlc(message, gamma)
    words = np.frombuffer(digest, np.uint32).astype(np.uint64)
    public = _publics(words, acc)
    return verify(proof, air, params, public, fixed_cols=fixed)
