"""sha256 compression-chain AIR: STARK proofs of sha256 digests.

Closes VERDICT r3 missing #3 for the sha256-based circuits: the
sha256_round_function precompile (type 6, ref
`src/sha256_round_function/mod.rs:271`) and code_unpacker_sha256's code-hash
recomputation (type 3, `src/code_unpacker_sha256/mod.rs:364-414`) both chain
sha256 compressions over 64-byte blocks; this module proves
`digest = sha256(message)` (and the raw block-chain form the unpacker uses)
as a committed-trace STARK instead of trusting the evaluator's compression
re-execution (ops/sha256.py).

Design — one row per ROUND (64 rows per 512-bit block), bit-column state
with a FUTURE message-schedule window (every reference is row-local or
cur->next):

  columns per row:
    pad | ab | cont | lst | kc |
    a..h bits [8 x 32]        working state at round input
    W[16 x 32] bits           w_t .. w_{t+15}   (W[0] = this round's word;
                              at a block-start row the window IS the
                              512-bit message block — the RLC binds it)
    s1v chv s0v mjv sg0 sg1   committed u32 VALUES of Sigma1(e), Ch(e,f,g),
                              Sigma0(a), Maj(a,b,c), sigma0(W[1]),
                              sigma1(W[14]) — each value-bound to its
                              degree-<=3 bit expression row-locally, so all
                              masked arithmetic stays affine (degree <= 3)
    ce[3] ca[3] sc[2]         round / schedule addition carries
    ia..ih [8]                the block's INITIAL state values (feed-forward)
    dg[8] + dgc[12]           digest words of this block: dg_x = x_64 + i_x
                              mod 2^32, bound on last-round rows

  transitions:
    cont': state shift (b<-a, ..., h<-g), window shift, the two round
           additions new_e = d + T1, new_a = T1 + T2 (T1 = h + s1v + chv +
           kc + W[0]val, T2 = s0v + mjv), schedule
           w_{t+16} = sg1 + W[9]val + sg0 + W[0]val, ia hold
    ab' :  next block's state = dg (feed-forward), next ia/acc bindings,
           message RLC acc' = acc*g^512 + sum_i g^i W'bits[i]
    pad':  full-row copy (kc/lst are committed + live-bound to the fixed
           schedule so copies stay valid — same trick as keccak_air)

  publics: [digest as 8 u32 big-endian words, message-RLC acc]; the
  verifier recomputes the RLC from the PLAINTEXT padded message under the
  transcript-bound gamma (plaintext-mediated stream binding, the same
  pattern as poseidon2_air / keccak_air).

Fixed columns: kf (round constant K_t), ir0f (block-start flag), lstf
(last-round flag).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import gf
from ..ops.gf import GF, MODULUS
from ..ops.sha256 import H0, K
from .stark import (AirSpec, StarkParams, StarkProof, challenges_from_cap,
                    prove, verify)

ROUNDS = 64
WBITS = 32
BLOCK_BITS = 16 * WBITS  # 512


class _Cols:
    def __init__(self):
        i = 0
        self.pad = i; i += 1
        self.ab = i; i += 1
        self.cont = i; i += 1
        self.lst = i; i += 1
        self.kc = i; i += 1
        self.st = {}
        for nm in "abcdefgh":
            self.st[nm] = slice(i, i + WBITS); i += WBITS
        self.W = slice(i, i + 16 * WBITS); i += 16 * WBITS
        self.s1v = i; i += 1
        self.chv = i; i += 1
        self.s0v = i; i += 1
        self.mjv = i; i += 1
        self.sg0 = i; i += 1
        self.sg1 = i; i += 1
        self.ce = slice(i, i + 3); i += 3
        self.ca = slice(i, i + 3); i += 3
        self.sc = slice(i, i + 2); i += 2
        self.ia = slice(i, i + 8); i += 8
        self.dg = slice(i, i + 8); i += 8
        # dgc: 3 bits for a, 3 for e, 1 each for b,c,d,f,g,h
        self.dgc = slice(i, i + 12); i += 12
        self.num_phase1 = i
        self.acc = i
        self.f_kf = 0
        self.f_ir0 = 1
        self.f_lst = 2
        self.num_fixed = 3


@functools.lru_cache(maxsize=1)
def _cols() -> _Cols:
    return _Cols()


NUM_PUBLIC = 9


def fixed_columns(n: int) -> GF:
    c = _cols()
    out = np.zeros((c.num_fixed, n), np.uint64)
    r = np.arange(n) % ROUNDS
    out[c.f_kf] = np.asarray(K, np.uint64)[r]
    out[c.f_ir0] = (r == 0).astype(np.uint64)
    out[c.f_lst] = (r == ROUNDS - 1).astype(np.uint64)
    return gf.from_u64(out)


def _rot_ix(r: int) -> np.ndarray:
    """bit i of ROTR(x, r) = x bit (i + r) % 32."""
    return (np.arange(WBITS) + r) % WBITS


def _grp(v: GF) -> GF:
    return GF(jnp.moveaxis(v.lo, -1, 0), jnp.moveaxis(v.hi, -1, 0))


def _gamma_powers(gamma: GF, k: int) -> GF:
    import jax

    def body(p, _):
        return gf.canonicalize(gf.mul(p, gamma)), p

    _, pows = jax.lax.scan(body, gf.ones(()), None, length=k)
    return pows


def _pow_static(x: GF, e: int) -> GF:
    acc = None
    base = x
    while e:
        if e & 1:
            acc = base if acc is None else gf.canonicalize(gf.mul(acc, base))
        base = gf.canonicalize(gf.mul(base, base))
        e >>= 1
    return acc if acc is not None else gf.ones(())


_W32 = np.uint64(1) << np.arange(WBITS, dtype=np.uint64)


def _xor3(u: GF, v: GF, w: GF) -> GF:
    uv, uw, vw = gf.mul(u, v), gf.mul(u, w), gf.mul(v, w)
    x = gf.sub(gf.add(gf.add(u, v), w),
               gf.double(gf.add(gf.add(uv, uw), vw)))
    return gf.add(x, gf.mul_const(gf.mul(uv, w), 4))


@functools.lru_cache(maxsize=1)
def sha256_air() -> AirSpec:
    c = _cols()
    F = c.num_fixed
    one = gf.ones(())
    w32 = gf.from_u64(_W32)

    def sl(row, s):
        if isinstance(s, slice):
            return row[..., np.arange(F + s.start, F + s.stop)]
        return row[..., F + s]

    def fx(row, j):
        return row[..., j]

    def val(bits):  # (batch, 32) -> (batch,)
        return gf.sum_mod(gf.mul(bits, w32), axis=-1)

    def wword(row, j):  # window word j bits
        return row[..., np.arange(F + c.W.start + j * WBITS,
                                  F + c.W.start + (j + 1) * WBITS)]

    def _not(x):
        return gf.sub(one, x)

    def t1_expr(cur):
        return gf.add(
            gf.add(val(sl(cur, c.st["h"])), sl(cur, c.s1v)),
            gf.add(gf.add(sl(cur, c.chv), sl(cur, c.kc)),
                   val(wword(cur, 0))))

    def row_constraints(cur, ch):
        out = []
        pad = sl(cur, c.pad)
        ab = sl(cur, c.ab)
        cont = sl(cur, c.cont)
        lst = sl(cur, c.lst)
        live = _not(pad)
        ir0 = fx(cur, c.f_ir0)
        lstf = fx(cur, c.f_lst)
        # booleanity: flags + all bit columns + carries
        for s in (c.pad, c.ab, c.cont, c.lst):
            v = sl(cur, s)
            out.append(gf.mul(v, gf.sub(v, one)))
        bit_ix = np.concatenate(
            [np.arange(s.start, s.stop) for s in c.st.values()]
            + [np.arange(c.W.start, c.W.stop),
               np.arange(c.ce.start, c.ce.stop),
               np.arange(c.ca.start, c.ca.stop),
               np.arange(c.sc.start, c.sc.stop),
               np.arange(c.dgc.start, c.dgc.stop)])
        b = cur[..., F + bit_ix]
        out.append(_grp(gf.mul(b, gf.sub(b, one))))
        # row-type bindings to the fixed schedule
        out.append(gf.sub(ab, gf.mul(live, ir0)))
        out.append(gf.sub(cont, gf.mul(live, _not(ir0))))
        out.append(gf.mul(live, gf.sub(lst, lstf)))
        out.append(gf.mul(live, gf.sub(sl(cur, c.kc), fx(cur, c.f_kf))))
        # committed round-function values
        e, f_, g = sl(cur, c.st["e"]), sl(cur, c.st["f"]), sl(cur, c.st["g"])
        a, bb_, cc_ = sl(cur, c.st["a"]), sl(cur, c.st["b"]), sl(cur, c.st["c"])
        s1bits = _xor3(e[..., _rot_ix(6)], e[..., _rot_ix(11)],
                       e[..., _rot_ix(25)])
        out.append(gf.sub(sl(cur, c.s1v), val(s1bits)))
        chbits = gf.add(gf.mul(e, f_), gf.mul(_not(e), g))
        out.append(gf.sub(sl(cur, c.chv), val(chbits)))
        s0bits = _xor3(a[..., _rot_ix(2)], a[..., _rot_ix(13)],
                       a[..., _rot_ix(22)])
        out.append(gf.sub(sl(cur, c.s0v), val(s0bits)))
        ab_, ac_, bc_ = gf.mul(a, bb_), gf.mul(a, cc_), gf.mul(bb_, cc_)
        mjbits = gf.sub(gf.add(gf.add(ab_, ac_), bc_),
                        gf.double(gf.mul(ab_, cc_)))
        out.append(gf.sub(sl(cur, c.mjv), val(mjbits)))
        # sigma0(W[1]) = ROTR7 ^ ROTR18 ^ SHR3; sigma1(W[14]) = R17^R19^SHR10
        w1 = wword(cur, 1)
        w14 = wword(cur, 14)

        def shr_bits(x, r):
            # bit i of SHR(x, r) = x bit (i + r) if i < 32 - r else 0
            ix = (np.arange(WBITS) + r) % WBITS
            mask = gf.from_u64((np.arange(WBITS) < WBITS - r)
                               .astype(np.uint64))
            return gf.mul(x[..., ix], mask)

        sg0bits = _xor3(w1[..., _rot_ix(7)], w1[..., _rot_ix(18)],
                        shr_bits(w1, 3))
        out.append(gf.sub(sl(cur, c.sg0), val(sg0bits)))
        sg1bits = _xor3(w14[..., _rot_ix(17)], w14[..., _rot_ix(19)],
                        shr_bits(w14, 10))
        out.append(gf.sub(sl(cur, c.sg1), val(sg1bits)))
        # ia binding at block-start rows
        ia = sl(cur, c.ia)
        st_vals = gf.stack([val(sl(cur, c.st[nm])) for nm in "abcdefgh"],
                           axis=-1)
        out.append(gf.mul(ab, _grp(gf.sub(ia, st_vals))))
        # digest words on last-round rows: dg_x = x_64 + i_x mod 2^32
        dg = sl(cur, c.dg)
        dgc = sl(cur, c.dgc)
        T1 = t1_expr(cur)
        T2 = gf.add(sl(cur, c.s0v), sl(cur, c.mjv))
        ia_w = [ia[..., j] for j in range(8)]
        dgc_a = gf.add(gf.add(dgc[..., 0], gf.double(dgc[..., 1])),
                       gf.mul_const(dgc[..., 2], 4))
        dgc_e = gf.add(gf.add(dgc[..., 3], gf.double(dgc[..., 4])),
                       gf.mul_const(dgc[..., 5], 4))
        new_a = gf.add(T1, T2)
        new_e = gf.add(val(sl(cur, c.st["d"])), T1)
        pairs = [
            (0, new_a, dgc_a),                         # a
            (1, st_vals[..., 0], dgc[..., 6]),         # b <- a
            (2, st_vals[..., 1], dgc[..., 7]),         # c <- b
            (3, st_vals[..., 2], dgc[..., 8]),         # d <- c
            (4, new_e, dgc_e),                         # e
            (5, st_vals[..., 4], dgc[..., 9]),         # f <- e
            (6, st_vals[..., 5], dgc[..., 10]),        # g <- f
            (7, st_vals[..., 6], dgc[..., 11]),        # h <- g
        ]
        for j, x64, carry in pairs:
            out.append(gf.mul(lst, gf.sub(
                gf.add(dg[..., j], gf.mul_const(carry, 1 << 32)),
                gf.add(x64, ia_w[j]))))
        return out

    def constraints(cur, nxt, ch):
        out = []
        pad_c, pad_n = sl(cur, c.pad), sl(nxt, c.pad)
        ab_n, cont_n = sl(nxt, c.ab), sl(nxt, c.cont)
        ir0_n = fx(nxt, c.f_ir0)
        out.append(gf.mul(pad_c, _not(pad_n)))
        out.append(gf.mul(gf.sub(pad_n, pad_c), _not(ir0_n)))
        copy_ix = np.arange(c.lst, c.num_phase1)
        out.append(gf.mul(pad_n, _grp(gf.sub(nxt[..., F + copy_ix],
                                             cur[..., F + copy_ix]))))
        # state shifts on cont' rows
        for dst, src in (("b", "a"), ("c", "b"), ("d", "c"), ("f", "e"),
                         ("g", "f"), ("h", "g")):
            out.append(gf.mul(cont_n, _grp(gf.sub(sl(nxt, c.st[dst]),
                                                  sl(cur, c.st[src])))))
        # round additions
        T1 = t1_expr(cur)
        T2 = gf.add(sl(cur, c.s0v), sl(cur, c.mjv))
        ce = sl(cur, c.ce)
        ca = sl(cur, c.ca)
        ce_v = gf.add(gf.add(ce[..., 0], gf.double(ce[..., 1])),
                      gf.mul_const(ce[..., 2], 4))
        ca_v = gf.add(gf.add(ca[..., 0], gf.double(ca[..., 1])),
                      gf.mul_const(ca[..., 2], 4))

        def val(bits):
            return gf.sum_mod(gf.mul(bits, gf.from_u64(_W32)), axis=-1)

        out.append(gf.mul(cont_n, gf.sub(
            gf.add(val(sl(nxt, c.st["e"])), gf.mul_const(ce_v, 1 << 32)),
            gf.add(val(sl(cur, c.st["d"])), T1))))
        out.append(gf.mul(cont_n, gf.sub(
            gf.add(val(sl(nxt, c.st["a"])), gf.mul_const(ca_v, 1 << 32)),
            gf.add(T1, T2))))
        # window shift + schedule
        Wc = sl(cur, c.W).reshape(sl(cur, c.W).shape[:-1] + (16, WBITS))
        Wn = sl(nxt, c.W).reshape(Wc.shape)
        shift_d = gf.sub(Wn[..., :15, :], Wc[..., 1:, :])
        shift_d = shift_d.reshape(shift_d.shape[:-2] + (15 * WBITS,))
        out.append(gf.mul(cont_n, _grp(shift_d)))
        sc = sl(cur, c.sc)
        sc_v = gf.add(sc[..., 0], gf.double(sc[..., 1]))
        w_new = val(Wn[..., 15, :])
        out.append(gf.mul(cont_n, gf.sub(
            gf.add(w_new, gf.mul_const(sc_v, 1 << 32)),
            gf.add(gf.add(sl(cur, c.sg1), val(Wc[..., 9, :])),
                   gf.add(sl(cur, c.sg0), val(Wc[..., 0, :]))))))
        # ia hold within a block
        out.append(gf.mul(cont_n, _grp(gf.sub(sl(nxt, c.ia),
                                              sl(cur, c.ia)))))
        # feed-forward into the next block
        dg = sl(cur, c.dg)
        nxt_vals = gf.stack([val(sl(nxt, c.st[nm])) for nm in "abcdefgh"],
                            axis=-1)
        out.append(gf.mul(ab_n, _grp(gf.sub(nxt_vals, dg))))
        # message RLC over the next block's window bits
        gamma = ch[0]
        acc_c = cur[..., F + c.acc]
        acc_n = nxt[..., F + c.acc]
        gpows = _gamma_powers(gamma, BLOCK_BITS)
        wbits_n = sl(nxt, c.W)
        rlc = gf.sum_mod(gf.mul(wbits_n, gpows), axis=-1)
        G = _pow_static(gamma, BLOCK_BITS)
        out.append(gf.mul(ab_n, gf.sub(acc_n,
                                       gf.add(gf.mul(acc_c, G), rlc))))
        out.append(gf.mul(_not(ab_n), gf.sub(acc_n, acc_c)))
        return out

    def first_row(row, public, ch):
        out = [sl(row, c.pad)]
        for j, nm in enumerate("abcdefgh"):
            bits = sl(row, c.st[nm])
            out.append(gf.sub(gf.sum_mod(gf.mul(bits, w32), axis=-1),
                              gf.constant(H0[j])))
        gamma = ch[0]
        gpows = _gamma_powers(gamma, BLOCK_BITS)
        out.append(gf.sub(row[..., F + c.acc],
                          gf.sum_mod(gf.mul(sl(row, c.W), gpows), axis=-1)))
        return out

    def last_row(row, public, ch):
        out = []
        dg = sl(row, c.dg)
        for j in range(8):
            out.append(gf.sub(dg[..., j], public[j]))
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
# trace builder
# ---------------------------------------------------------------------------

_M32 = (1 << 32) - 1


def pad_message(message: bytes) -> np.ndarray:
    """sha256 padding -> (B, 16) u32 big-endian words."""
    bitlen = 8 * len(message)
    padded = bytearray(message) + b"\x80"
    while len(padded) % 64 != 56:
        padded += b"\x00"
    padded += bitlen.to_bytes(8, "big")
    words = np.frombuffer(bytes(padded), ">u4").astype(np.uint64)
    return words.reshape(-1, 16)


def _rotr(x: int, r: int) -> int:
    return ((x >> r) | (x << (32 - r))) & _M32


def _bits(x: int) -> np.ndarray:
    return ((x >> np.arange(WBITS)) & 1).astype(np.uint64)


def build_sha256_trace(message: bytes):
    """(phase1, fixed, digest_words(8,) u32 BE, build_phase2, log_n)."""
    return build_sha256_trace_blocks(pad_message(message))


def build_sha256_trace_blocks(blocks: np.ndarray):
    """Raw caller-padded block chain (the sha256_round_function precompile
    and code_unpacker forms, ref sha256_round_function/mod.rs:86): blocks
    (B, 16) u32 BE words, digest = the final chain state."""
    c = _cols()
    blocks = np.asarray(blocks, np.uint64)
    B = blocks.shape[0]
    live = ROUNDS * B
    n = 1 << max(6, (live - 1).bit_length())  # live == n is fine (no pads)

    C = np.zeros((c.num_phase1, n), np.uint64)
    state = list(H0)
    r_ix = 0
    for b in range(B):
        # extend the schedule far enough for the future window
        w = list(blocks[b].astype(int))
        for t in range(16, ROUNDS + 16):
            s0 = _rotr(w[t - 15], 7) ^ _rotr(w[t - 15], 18) ^ (w[t - 15] >> 3)
            s1 = _rotr(w[t - 2], 17) ^ _rotr(w[t - 2], 19) ^ (w[t - 2] >> 10)
            w.append((w[t - 16] + s0 + w[t - 7] + s1) & _M32)
        a, bb_, cc_, d, e, f, g, h = state
        ia = list(state)
        for t in range(ROUNDS):
            row = r_ix + t
            for j, v in enumerate((a, bb_, cc_, d, e, f, g, h)):
                nm = "abcdefgh"[j]
                C[c.st[nm].start : c.st[nm].stop, row] = _bits(v)
            for j in range(16):
                C[c.W.start + j * WBITS : c.W.start + (j + 1) * WBITS,
                  row] = _bits(w[t + j])
            s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g & _M32)
            s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            mj = (a & bb_) ^ (a & cc_) ^ (bb_ & cc_)
            sg0 = _rotr(w[t + 1], 7) ^ _rotr(w[t + 1], 18) ^ (w[t + 1] >> 3)
            sg1 = (_rotr(w[t + 14], 17) ^ _rotr(w[t + 14], 19)
                   ^ (w[t + 14] >> 10))
            C[c.s1v, row] = s1
            C[c.chv, row] = ch
            C[c.s0v, row] = s0
            C[c.mjv, row] = mj
            C[c.sg0, row] = sg0
            C[c.sg1, row] = sg1
            C[c.kc, row] = K[t]
            C[c.ab, row] = 1 if t == 0 else 0
            C[c.cont, row] = 0 if t == 0 else 1
            C[c.lst, row] = 1 if t == ROUNDS - 1 else 0
            C[c.ia.start : c.ia.stop, row] = ia
            T1 = (h + s1 + ch + K[t] + w[t])
            T2 = (s0 + mj)
            new_e_full = d + T1
            new_a_full = T1 + T2
            ce = new_e_full >> 32
            ca = new_a_full >> 32
            C[c.ce.start : c.ce.stop, row] = [(ce >> k) & 1 for k in range(3)]
            C[c.ca.start : c.ca.stop, row] = [(ca >> k) & 1 for k in range(3)]
            # w[t] + sigma0(w[t+1]) + w[t+9] + sigma1(w[t+14]) = w[t+16]
            sc = (w[t] + sg0 + w[t + 9] + sg1) >> 32
            C[c.sc.start : c.sc.stop, row] = [(sc >> k) & 1 for k in range(2)]
            if t == ROUNDS - 1:
                # dg_x = x_64 + i_x; the AIR's dg constraints use the
                # UN-REDUCED new_a/new_e expressions, so the a/e carries
                # absorb the round carry too (3 bits each)
                fin = [
                    (new_a_full, ia[0]),
                    (a, ia[1]), (bb_, ia[2]), (cc_, ia[3]),
                    (new_e_full, ia[4]),
                    (e, ia[5]), (f, ia[6]), (g, ia[7]),
                ]
                for j, (x64, iax) in enumerate(fin):
                    C[c.dg.start + j, row] = (x64 + iax) & _M32
                carry_a = (fin[0][0] + fin[0][1]) >> 32
                carry_e = (fin[4][0] + fin[4][1]) >> 32
                dgc = ([(carry_a >> k) & 1 for k in range(3)]
                       + [(carry_e >> k) & 1 for k in range(3)]
                       + [((fin[j][0] + fin[j][1]) >> 32)
                          for j in (1, 2, 3, 5, 6, 7)])
                C[c.dgc.start : c.dgc.stop, row] = dgc
            h, g, f = g, f, e
            e = new_e_full & _M32
            d, cc_, bb_ = cc_, bb_, a
            a = new_a_full & _M32
        state = [(x + y) & _M32 for x, y in zip((a, bb_, cc_, d, e, f, g, h),
                                                ia)]
        r_ix += ROUNDS
    # padding rows replicate the last live row
    C[c.lst :, live:] = C[c.lst :, live - 1][:, None]
    C[c.pad, live:] = 1
    C[c.ab, live:] = 0
    C[c.cont, live:] = 0

    digest_words = np.asarray(state, np.uint64)
    blocks_u = blocks

    def build_phase2(_trace, ch):
        gamma = ch[0]
        G = pow(gamma, BLOCK_BITS, MODULUS)
        acc = np.zeros(n, np.uint64)
        a_ = 0
        row = 0
        for b in range(B):
            r = 0
            g_ = 1
            for j in range(16):
                wv = int(blocks_u[b, j])
                for k in range(WBITS):
                    if (wv >> k) & 1:
                        r = (r + g_) % MODULUS
                    g_ = g_ * gamma % MODULUS
            a_ = (a_ * G + r) % MODULUS if b else r
            acc[row : row + ROUNDS] = a_
            row += ROUNDS
        acc[row:] = a_
        return gf.from_u64(acc[None, :])

    log_n = int(n).bit_length() - 1
    return (gf.from_u64(C), fixed_columns(n),
            digest_words.astype(np.uint32), build_phase2, log_n)


def message_rlc(message: bytes, gamma: int) -> int:
    return blocks_rlc(pad_message(message), gamma)


def blocks_rlc(blocks: np.ndarray, gamma: int) -> int:
    G = pow(gamma, BLOCK_BITS, MODULUS)
    a_ = 0
    for b in range(blocks.shape[0]):
        r = 0
        g_ = 1
        for j in range(16):
            wv = int(blocks[b, j])
            for k in range(WBITS):
                if (wv >> k) & 1:
                    r = (r + g_) % MODULUS
                g_ = g_ * gamma % MODULUS
        a_ = (a_ * G + r) % MODULUS if b else r
    return a_


def _publics(digest_words: np.ndarray, acc: int) -> GF:
    return gf.from_u64(np.concatenate(
        [np.asarray(digest_words, np.uint64), [np.uint64(acc)]]))


def prove_sha256(message: bytes,
                 params: Optional[StarkParams] = None
                 ) -> Tuple[StarkProof, bytes, StarkParams]:
    from .stark import _commit_columns

    phase1, fixed, digest_words, build_phase2, log_n = (
        build_sha256_trace(message))
    air = sha256_air()
    if params is None:
        params = StarkParams(log_n=log_n)
    cap_f = _commit_columns(fixed, params)["cap"]
    cap_1 = _commit_columns(phase1, params)["cap"]
    (gamma,), _ = challenges_from_cap(cap_1, air, cap_f)
    acc = message_rlc(message, gamma)
    public = _publics(digest_words, acc)
    proof = prove(phase1, air, params, public, build_phase2=build_phase2,
                  fixed_cols=fixed)
    digest = b"".join(int(w).to_bytes(4, "big") for w in digest_words)
    return proof, digest, params


def verify_sha256(proof: StarkProof, message: bytes, digest: bytes,
                  params: StarkParams) -> bool:
    if len(digest) != 32:
        return False
    words = np.frombuffer(digest, ">u4").astype(np.uint64)
    return verify_sha256_blocks(proof, pad_message(message), words, params)


def prove_sha256_blocks(blocks: np.ndarray,
                        params: Optional[StarkParams] = None
                        ) -> Tuple[StarkProof, np.ndarray, StarkParams]:
    """Prove the raw caller-padded chain: digest = compress*(H0, blocks).
    Returns (proof, digest_words (8,) u32, params)."""
    from .stark import _commit_columns

    phase1, fixed, digest_words, build_phase2, log_n = (
        build_sha256_trace_blocks(blocks))
    air = sha256_air()
    if params is None:
        params = StarkParams(log_n=log_n)
    cap_f = _commit_columns(fixed, params)["cap"]
    cap_1 = _commit_columns(phase1, params)["cap"]
    (gamma,), _ = challenges_from_cap(cap_1, air, cap_f)
    acc = blocks_rlc(np.asarray(blocks, np.uint64), gamma)
    public = _publics(digest_words, acc)
    proof = prove(phase1, air, params, public, build_phase2=build_phase2,
                  fixed_cols=fixed)
    return proof, digest_words, params


def verify_sha256_blocks(proof: StarkProof, blocks: np.ndarray,
                         digest_words: np.ndarray,
                         params: StarkParams) -> bool:
    air = sha256_air()
    n = 1 << params.log_n
    blocks = np.asarray(blocks, np.uint64)
    if blocks.ndim != 2 or blocks.shape[1] != 16:
        return False
    if ROUNDS * blocks.shape[0] > n:
        return False
    fixed = fixed_columns(n)
    if len(proof.caps) != 3:
        return False
    digest_words = np.asarray(digest_words, np.uint64)
    if digest_words.shape != (8,):
        return False
    (gamma,), _ = challenges_from_cap(proof.caps[1], air, proof.caps[0])
    acc = blocks_rlc(blocks, gamma)
    public = _publics(digest_words, acc)
    return verify(proof, air, params, public, fixed_cols=fixed)
