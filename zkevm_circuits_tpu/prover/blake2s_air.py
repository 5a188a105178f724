"""blake2s single-block batch AIR: STARK proofs of blake2s digests.

Closes VERDICT r4 missing #3 / item 6 for storage_application (circuit
type 10): the reference recomputes the depth-256 storage Merkle tree with
in-circuit blake2s gadgets (`src/storage_application/mod.rs:390-400`,
derived key at mod.rs:433-439, leaf at mod.rs:523-570); here the row
evaluator (models/storage_application.py) keeps checking the path
STRUCTURE while this module proves every blake2s digest the paths consume
as ONE committed-trace STARK over the whole batch of compressions.

Every blake2s call storage_application makes is single-block (node =
blake2s(left||right) 64B, derived key = blake2s(0^12||addr||key) 64B,
leaf = blake2s(index8||value32) 40B), so the AIR proves a BATCH of
independent single-block compressions — 10 rows per call, one row per
round — instead of a chained stream:

  columns per row (phase 1):
    pad first lst          row-type flags (first/lst live-bound to the
                           fixed schedule; pads full-row copy — the same
                           trick as sha256_air/keccak_air)
    t8[8]                  message byte-count bits (t <= 64 < 256)
    v[16 x 32]             working-state bits at round input
    m[16 x 32]             message-block bits (held across the call)
    xv[16]                 committed SIGMA-selected message values, bound
                           to m via fixed one-hot selector columns
    A1 C1 A2 C2 D2 B2      [8 G-slots x 32] committed intermediate bits of
                           each G application (a+=b+x / d=ror16(d^a) /
                           c+=d / b=ror12(b^c) / a+=b+y / d=ror8(d^a) /
                           c+=d / b=ror7(b^c)); d1/b1 stay expressions
    ca1[16] cc1[8] ca2[16] cc2[8]   addition carries
    dg[8]                  digest words, bound on last-round rows to
                           IVP ^ v_out ^ v_out[8..] (single block: h = IVP)
  phase 2:
    acc                    record RLC accumulator: per call,
                           acc' = acc*g^521 + RLC_g([t] ++ mbits[512] ++
                           dg[8]); the verifier recomputes the final value
                           from the PLAINTEXT (t, m, digest) records —
                           plaintext-mediated stream binding, the same
                           pattern as keccak_air / sha256_air.

  publics: [final acc].

Fixed columns: f_r0 (round-0 flag), f_lst (round-9 flag), fsel[16x16]
(per-row one-hot SIGMA message selectors).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import gf
from ..ops.blake2s import IV, SIGMA
from ..ops.gf import GF, MODULUS
from .stark import (AirSpec, StarkParams, StarkProof, challenges_from_cap,
                    prove, verify)

ROUNDS = 10
WBITS = 32
_M32 = (1 << 32) - 1

# parameter-block-mixed initial state (digest_size=32, no key, fanout=1,
# depth=1) — every storage_application call hashes < 2^32 bytes in ONE block
IVP = [IV[0] ^ 0x01010020] + list(IV[1:])

# record = [t] ++ m bits (512) ++ dg words (8)
RECORD_LEN = 1 + 16 * WBITS + 8
NUM_PUBLIC = 1


class _Cols:
    def __init__(self):
        i = 0
        self.pad = i; i += 1
        self.first = i; i += 1
        self.lst = i; i += 1
        self.t8 = slice(i, i + 8); i += 8
        self.v = slice(i, i + 16 * WBITS); i += 16 * WBITS
        self.m = slice(i, i + 16 * WBITS); i += 16 * WBITS
        self.xv = slice(i, i + 16); i += 16
        self.A1 = slice(i, i + 8 * WBITS); i += 8 * WBITS
        self.C1 = slice(i, i + 8 * WBITS); i += 8 * WBITS
        self.A2 = slice(i, i + 8 * WBITS); i += 8 * WBITS
        self.C2 = slice(i, i + 8 * WBITS); i += 8 * WBITS
        self.D2 = slice(i, i + 8 * WBITS); i += 8 * WBITS
        self.B2 = slice(i, i + 8 * WBITS); i += 8 * WBITS
        self.ca1 = slice(i, i + 16); i += 16
        self.cc1 = slice(i, i + 8); i += 8
        self.ca2 = slice(i, i + 16); i += 16
        self.cc2 = slice(i, i + 8); i += 8
        self.dg = slice(i, i + 8); i += 8
        self.num_phase1 = i
        self.acc = i
        # fixed
        self.f_r0 = 0
        self.f_lst = 1
        self.fsel = slice(2, 2 + 16 * 16)
        self.num_fixed = 2 + 16 * 16


@functools.lru_cache(maxsize=1)
def _cols() -> _Cols:
    return _Cols()


# G-slot wiring: slots 0..3 = column step (G_g on v[g], v[4+g], v[8+g],
# v[12+g]), slots 4..7 = diagonal step (G'_gg on the column-step outputs
# a=A2[gg], b=B2[(gg+1)%4], c=C2[(gg+2)%4], d=D2[(gg+3)%4]) — exactly
# ops/blake2s.compress's round body.


def _slot_inputs(c: _Cols):
    """(a_ix, b_ix, c_ix, d_ix): (8, 32) phase1 bit-index arrays."""
    w = np.arange(WBITS)

    def vword(j):
        return c.v.start + j * WBITS + w

    def blk(s, g):
        return s.start + g * WBITS + w

    a_ix, b_ix, c_ix, d_ix = [], [], [], []
    for g in range(4):
        a_ix.append(vword(g)); b_ix.append(vword(4 + g))
        c_ix.append(vword(8 + g)); d_ix.append(vword(12 + g))
    for gg in range(4):
        a_ix.append(blk(c.A2, gg)); b_ix.append(blk(c.B2, (gg + 1) % 4))
        c_ix.append(blk(c.C2, (gg + 2) % 4)); d_ix.append(blk(c.D2, (gg + 3) % 4))
    return (np.array(a_ix), np.array(b_ix), np.array(c_ix), np.array(d_ix))


def _vout_index(c: _Cols) -> np.ndarray:
    """(16, 32) phase1 bit indices of the round's OUTPUT state v2."""
    w = np.arange(WBITS)

    def blk(s, g):
        return s.start + (4 + g) * WBITS + w

    out = np.zeros((16, WBITS), np.int64)
    for gg in range(4):
        out[gg] = blk(c.A2, gg)
    for k in range(4):
        out[4 + k] = blk(c.B2, (k + 3) % 4)
        out[8 + k] = blk(c.C2, (k + 2) % 4)
        out[12 + k] = blk(c.D2, (k + 1) % 4)
    return out


def fixed_columns(n: int) -> GF:
    c = _cols()
    out = np.zeros((c.num_fixed, n), np.uint64)
    r = np.arange(n) % ROUNDS
    out[c.f_r0] = (r == 0).astype(np.uint64)
    out[c.f_lst] = (r == ROUNDS - 1).astype(np.uint64)
    sig = np.asarray(SIGMA)  # (10, 16)
    for s in range(16):
        for k in range(16):
            out[c.fsel.start + s * 16 + k] = (sig[r, s] == k).astype(np.uint64)
    return gf.from_u64(out)


def _grp(v: GF, lanes: int = 1) -> GF:
    """Move the trailing `lanes` axes to the front (flattened): one grouped
    constraint per lane, batch dims preserved."""
    lo, hi = v.lo, v.hi
    if lanes > 1:
        lo = lo.reshape(lo.shape[:-lanes] + (-1,))
        hi = hi.reshape(hi.shape[:-lanes] + (-1,))
    return GF(jnp.moveaxis(lo, -1, 0), jnp.moveaxis(hi, -1, 0))


def _gamma_powers(gamma: GF, k: int) -> GF:
    import jax

    def body(p, _):
        return gf.canonicalize(gf.mul(p, gamma)), p

    _, pows = jax.lax.scan(body, gf.ones(()), None, length=k)
    return pows


def _pow_static(x: GF, e: int) -> GF:
    acc, base = None, x
    while e:
        if e & 1:
            acc = base if acc is None else gf.canonicalize(gf.mul(acc, base))
        base = gf.canonicalize(gf.mul(base, base))
        e >>= 1
    return acc if acc is not None else gf.ones(())


_W32 = np.uint64(1) << np.arange(WBITS, dtype=np.uint64)


@functools.lru_cache(maxsize=1)
def blake2s_air() -> AirSpec:
    c = _cols()
    F = c.num_fixed
    one = gf.ones(())
    w32 = gf.from_u64(_W32)

    def ror(x: GF, r: int) -> GF:
        # bit i of ror(x, r) = x bit (i + r) % 32 — jnp.roll, not a gather
        return GF(jnp.roll(x.lo, -r, axis=-1), jnp.roll(x.hi, -r, axis=-1))

    def P(ix):
        return F + np.asarray(ix)

    def sl(row, s):
        # contiguous slices, never index-array gathers (XLA:CPU compile)
        if isinstance(s, slice):
            return row[..., F + s.start : F + s.stop]
        return row[..., F + s]

    def blk4(row, s, g0, perm=None):
        """(batch, 4, 32) view of G-slot blocks g0..g0+3 of column group
        `s`, optionally re-ordered by `perm` (a tiny 4-element gather)."""
        v = row[..., F + s.start + g0 * WBITS : F + s.start + (g0 + 4) * WBITS]
        v = v.reshape(v.shape[:-1] + (4, WBITS))
        if perm is not None:
            v = v[..., np.asarray(perm), :]
        return v

    def val(bits):  # (..., 32) -> (...)
        return gf.sum_mod(gf.mul(bits, w32), axis=-1)

    def _not(x):
        return gf.sub(one, x)

    def xor2(u, v):
        return gf.sub(gf.add(u, v), gf.double(gf.mul(u, v)))

    def vout(row):
        """The round's OUTPUT state v2 as (batch, 16, 32) — diagonal-step
        output blocks re-ordered into word order (slices + 4-permutes)."""
        return gf.concat([
            blk4(row, c.A2, 4),
            blk4(row, c.B2, 4, perm=(3, 0, 1, 2)),
            blk4(row, c.C2, 4, perm=(2, 3, 0, 1)),
            blk4(row, c.D2, 4, perm=(1, 2, 3, 0)),
        ], axis=-2)

    def record_rlc(row, ch):
        """RLC_gamma([t] ++ mbits ++ dg) — affine in the trace cells."""
        gp = _gamma_powers(ch[0], RECORD_LEN)
        t_val = gf.sum_mod(gf.mul(sl(row, c.t8), gf.from_u64(_W32[:8])),
                           axis=-1)
        r = gf.mul(t_val, gp[0])
        r = gf.add(r, gf.sum_mod(gf.mul(sl(row, c.m),
                                        gp[1:1 + 16 * WBITS]), axis=-1))
        r = gf.add(r, gf.sum_mod(gf.mul(sl(row, c.dg),
                                        gp[1 + 16 * WBITS:]), axis=-1))
        return r

    def row_constraints(cur, ch):
        out = []
        pad = sl(cur, c.pad)
        first = sl(cur, c.first)
        lst = sl(cur, c.lst)
        live = _not(pad)
        f_r0 = cur[..., c.f_r0]
        f_lst = cur[..., c.f_lst]
        # booleanity: flags + every bit column — contiguous SLICES, not
        # index-array gathers (XLA:CPU expands gathers; LLVM compile time
        # of the composition explodes on thousands of expanded indices)
        for s0, s1 in ((c.pad, c.lst + 1), (c.t8.start, c.m.stop),
                       (c.A1.start, c.B2.stop), (c.ca1.start, c.cc2.stop)):
            b = cur[..., F + s0 : F + s1]
            out.append(_grp(gf.mul(b, gf.sub(b, one))))
        # row-type bindings: first = live*f_r0 (pads -> 0, so acc never
        # updates across the pad tail); lst live-bound only (pads COPY
        # lst=1 so the digest binding and last_row stay valid on the tail)
        out.append(gf.sub(first, gf.mul(live, f_r0)))
        out.append(gf.mul(live, gf.sub(lst, f_lst)))
        # xv binding: xv_s = sum_k fsel[s,k] * val(m_k)  (live rows)
        mbits = sl(cur, c.m).reshape(cur.shape[:-1] + (16, WBITS))
        mvals = val(mbits)  # (batch, 16)
        fsel = cur[..., c.fsel.start : c.fsel.stop]
        fsel = fsel.reshape(cur.shape[:-1] + (16, 16))
        selv = gf.sum_mod(gf.mul(fsel, gf.expand_dims(mvals, -2)), axis=-1)
        out.append(_grp(gf.mul(gf.expand_dims(live, -1),
                               gf.sub(sl(cur, c.xv), selv))))
        # v-init binding on first rows: v = [IVP | IV0..3 | IV4^t | IV5 |
        # ~IV6 | IV7]; only word 12's low 8 bits depend on the witness (t)
        vbits = sl(cur, c.v).reshape(cur.shape[:-1] + (16, WBITS))
        vinit = [IVP[j] for j in range(8)] + [IV[0], IV[1], IV[2], IV[3],
                                              IV[4], IV[5],
                                              IV[6] ^ _M32, IV[7]]
        const = np.zeros((16, WBITS), np.uint64)
        for j in range(16):
            const[j] = (np.uint64(vinit[j]) >> np.arange(WBITS,
                                                         dtype=np.uint64)) & 1
        fix_mask = np.ones((16, WBITS), np.uint64)
        fix_mask[12, :8] = 0  # t-dependent bits handled separately below
        d_const = gf.mul(gf.sub(vbits, gf.from_u64(const)),
                         gf.from_u64(fix_mask))
        first2 = gf.expand_dims(gf.expand_dims(first, -1), -1)
        out.append(_grp(gf.mul(first2, d_const), lanes=2))
        # word 12 low 8 bits: v_bit = IV4_bit XOR t_bit (affine in t8)
        t8 = sl(cur, c.t8)
        iv4 = [(IV[4] >> k) & 1 for k in range(8)]
        want = gf.stack(
            [_not(t8[..., k]) if iv4[k] else t8[..., k] for k in range(8)],
            axis=-1)
        d12 = gf.sub(vbits[..., 12, :8], want)
        out.append(_grp(gf.mul(gf.expand_dims(first, -1), d12)))
        # ---- the 8 G applications (row-local, fixed-free) ----
        A1 = sl(cur, c.A1).reshape(cur.shape[:-1] + (8, WBITS))
        C1 = sl(cur, c.C1).reshape(A1.shape)
        A2 = sl(cur, c.A2).reshape(A1.shape)
        C2 = sl(cur, c.C2).reshape(A1.shape)
        D2 = sl(cur, c.D2).reshape(A1.shape)
        B2 = sl(cur, c.B2).reshape(A1.shape)
        # slot inputs as slices + tiny 4-element permutes (column step
        # reads v word blocks; diagonal step reads the column outputs)
        ain = gf.concat([blk4(cur, c.v, 0), blk4(cur, c.A2, 0)], axis=-2)
        bin_ = gf.concat([blk4(cur, c.v, 4),
                          blk4(cur, c.B2, 0, perm=(1, 2, 3, 0))], axis=-2)
        cin = gf.concat([blk4(cur, c.v, 8),
                         blk4(cur, c.C2, 0, perm=(2, 3, 0, 1))], axis=-2)
        din = gf.concat([blk4(cur, c.v, 12),
                         blk4(cur, c.D2, 0, perm=(3, 0, 1, 2))], axis=-2)
        xv = sl(cur, c.xv)
        x = xv[..., np.arange(0, 16, 2)]
        y = xv[..., np.arange(1, 16, 2)]
        ca1 = sl(cur, c.ca1).reshape(cur.shape[:-1] + (8, 2))
        ca1v = gf.add(ca1[..., 0], gf.double(ca1[..., 1]))
        ca2 = sl(cur, c.ca2).reshape(cur.shape[:-1] + (8, 2))
        ca2v = gf.add(ca2[..., 0], gf.double(ca2[..., 1]))
        cc1 = sl(cur, c.cc1)
        cc2 = sl(cur, c.cc2)
        P32 = 1 << 32
        # a1 = a + b + x  (mod 2^32, carry <= 2)
        out.append(_grp(gf.sub(
            gf.add(val(A1), gf.mul_const(ca1v, P32)),
            gf.add(gf.add(val(ain), val(bin_)), x))))
        # c1 = c + d1, d1 = ror16(d ^ a1)
        d1 = xor2(ror(din, 16), ror(A1, 16))
        out.append(_grp(gf.sub(
            gf.add(val(C1), gf.mul_const(cc1, P32)),
            gf.add(val(cin), val(d1)))))
        # a2 = a1 + b1 + y, b1 = ror12(b ^ c1)
        b1 = xor2(ror(bin_, 12), ror(C1, 12))
        out.append(_grp(gf.sub(
            gf.add(val(A2), gf.mul_const(ca2v, P32)),
            gf.add(gf.add(val(A1), val(b1)), y))))
        # d2 = ror8(d1 ^ a2): bit i = xor(d1[(i+8)%32], a2[(i+8)%32]),
        # d1[(i+8)%32] = xor(d[(i+24)%32], a1[(i+24)%32])   (degree 3)
        d1s = xor2(ror(din, 24), ror(A1, 24))
        out.append(_grp(gf.sub(D2, xor2(d1s, ror(A2, 8))), lanes=2))
        # c2 = c1 + d2
        out.append(_grp(gf.sub(
            gf.add(val(C2), gf.mul_const(cc2, P32)),
            gf.add(val(C1), val(D2)))))
        # b2 = ror7(b1 ^ c2): b1[(i+7)%32] = xor(b[(i+19)%32], c1[(i+19)%32])
        b1s = xor2(ror(bin_, 19), ror(C1, 19))
        out.append(_grp(gf.sub(B2, xor2(b1s, ror(C2, 7))), lanes=2))
        # ---- digest binding on last-round rows ----
        # dg_j = sum_i 2^i (IVP_j[i] ^ v2[j][i] ^ v2[j+8][i])
        v2 = vout(cur)  # (batch, 16, 32)
        u = v2[..., :8, :]
        w_ = v2[..., 8:, :]
        x2 = xor2(u, w_)  # degree 2
        ivp_bits = np.zeros((8, WBITS), np.uint64)
        for j in range(8):
            ivp_bits[j] = (np.uint64(IVP[j])
                           >> np.arange(WBITS, dtype=np.uint64)) & 1
        cbits = gf.from_u64(ivp_bits)
        # c ^ e = c + (1-2c) e
        mixed = gf.add(cbits, gf.mul(gf.sub(one if False else gf.ones(()),
                                            gf.double(cbits)), x2))
        dgx = gf.sum_mod(gf.mul(mixed, w32), axis=-1)  # (batch, 8)
        out.append(_grp(gf.mul(gf.expand_dims(lst, -1),
                               gf.sub(sl(cur, c.dg), dgx))))
        return out

    def constraints(cur, nxt, ch):
        out = []
        pad_c, pad_n = sl(cur, c.pad), sl(nxt, c.pad)
        first_n = sl(nxt, c.first)
        f_r0_n = nxt[..., c.f_r0]
        # pads are monotone and may only start at a block boundary —
        # otherwise a truncated block's unbound dg could forge a record
        out.append(gf.mul(pad_c, _not(pad_n)))
        out.append(gf.mul(gf.sub(pad_n, pad_c), _not(f_r0_n)))
        # pad rows full-row copy (everything from lst on; pad/first have
        # unmasked bindings of their own)
        out.append(_grp(gf.mul(
            gf.expand_dims(pad_n, -1),
            gf.sub(nxt[..., F + c.lst : F + c.num_phase1],
                   cur[..., F + c.lst : F + c.num_phase1]))))
        # within-block transitions (next is live and not a block start)
        cn = gf.mul(_not(pad_n), _not(first_n))
        vn = sl(nxt, c.v)
        v2 = vout(cur).reshape(cur.shape[:-1] + (16 * WBITS,))
        out.append(_grp(gf.mul(gf.expand_dims(cn, -1), gf.sub(vn, v2))))
        for hs in (c.t8, c.m):
            out.append(_grp(gf.mul(gf.expand_dims(cn, -1),
                                   gf.sub(sl(nxt, hs), sl(cur, hs)))))
        # record absorption at block starts; copy elsewhere
        acc_c = cur[..., F + c.acc]
        acc_n = nxt[..., F + c.acc]
        G = _pow_static(ch[0], RECORD_LEN)
        r = record_rlc(cur, ch)
        out.append(gf.mul(first_n,
                          gf.sub(acc_n, gf.add(gf.mul(acc_c, G), r))))
        out.append(gf.mul(_not(first_n), gf.sub(acc_n, acc_c)))
        return out

    def first_row(row, public, ch):
        return [sl(row, c.pad), row[..., F + c.acc]]

    def last_row(row, public, ch):
        G = _pow_static(ch[0], RECORD_LEN)
        final = gf.add(gf.mul(row[..., F + c.acc], G), record_rlc(row, ch))
        return [gf.sub(final, public[0])]

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
# trace builder (vectorized over the batch of calls)
# ---------------------------------------------------------------------------


def _pad_message(message: bytes) -> np.ndarray:
    assert len(message) <= 64, "single-block AIR: message must be <= 64 bytes"
    data = message + b"\x00" * (64 - len(message))
    return np.frombuffer(data, "<u4").astype(np.uint64)


def _ror(x: np.ndarray, r: int) -> np.ndarray:
    x = x & _M32
    return ((x >> np.uint64(r)) | (x << np.uint64(32 - r))) & _M32


def _bits_of(vals: np.ndarray, width: int = WBITS) -> np.ndarray:
    """(B,) u64 -> (B, width) bits."""
    return ((vals[:, None] >> np.arange(width, dtype=np.uint64)) & 1)


def build_blake2s_trace(messages: Sequence[bytes]):
    """(phase1 GF, fixed GF, digests list[bytes], build_phase2, log_n)."""
    c = _cols()
    B = len(messages)
    assert B >= 1
    t = np.array([len(m) for m in messages], np.uint64)
    m_words = np.stack([_pad_message(m) for m in messages])  # (B, 16)
    live = ROUNDS * B
    n = 1 << max(6, (live - 1).bit_length())

    C = np.zeros((c.num_phase1, n), np.uint64)
    rows = np.arange(B) * ROUNDS  # row of round 0 per call

    # initial v
    v = np.zeros((B, 16), np.uint64)
    for j in range(8):
        v[:, j] = IVP[j]
    v[:, 8:12] = np.asarray(IV[:4], np.uint64)
    v[:, 12] = np.uint64(IV[4]) ^ t
    v[:, 13] = IV[5]
    v[:, 14] = np.uint64(IV[6]) ^ np.uint64(_M32)
    v[:, 15] = IV[7]

    def put_bits(s: slice, lane: int, rws: np.ndarray, vals: np.ndarray):
        bits = _bits_of(vals)
        for i in range(WBITS):
            C[s.start + lane * WBITS + i, rws] = bits[:, i]

    sig = np.asarray(SIGMA)
    for r in range(ROUNDS):
        rws = rows + r
        for j in range(16):
            put_bits(c.v, j, rws, v[:, j])
            put_bits(c.m, j, rws, m_words[:, j])
        for k in range(8):
            C[c.t8.start + k, rws] = (t >> np.uint64(k)) & 1
        # selected message values
        for s in range(16):
            C[c.xv.start + s, rws] = m_words[:, sig[r, s]]
        # the 8 G's
        vv = v.copy()
        A1 = np.zeros((8, B), np.uint64); C1 = np.zeros((8, B), np.uint64)
        A2 = np.zeros((8, B), np.uint64); C2 = np.zeros((8, B), np.uint64)
        D2 = np.zeros((8, B), np.uint64); B2 = np.zeros((8, B), np.uint64)
        CA1 = np.zeros((8, B), np.uint64); CC1 = np.zeros((8, B), np.uint64)
        CA2 = np.zeros((8, B), np.uint64); CC2 = np.zeros((8, B), np.uint64)

        def run_g(slot, a, b_, cc, d, x, y):
            a1f = a + b_ + x
            a1 = a1f & _M32; CA1[slot] = a1f >> 32
            d1 = _ror(d ^ a1, 16)
            c1f = cc + d1
            c1 = c1f & _M32; CC1[slot] = c1f >> 32
            b1 = _ror(b_ ^ c1, 12)
            a2f = a1 + b1 + y
            a2 = a2f & _M32; CA2[slot] = a2f >> 32
            d2 = _ror(d1 ^ a2, 8)
            c2f = c1 + d2
            c2 = c2f & _M32; CC2[slot] = c2f >> 32
            b2 = _ror(b1 ^ c2, 7)
            A1[slot], C1[slot], A2[slot] = a1, c1, a2
            C2[slot], D2[slot], B2[slot] = c2, d2, b2
            return a2, b2, c2, d2

        for g in range(4):
            run_g(g, vv[:, g], vv[:, 4 + g], vv[:, 8 + g], vv[:, 12 + g],
                  m_words[:, sig[r, 2 * g]], m_words[:, sig[r, 2 * g + 1]])
        for gg in range(4):
            run_g(4 + gg, A2[gg], B2[(gg + 1) % 4], C2[(gg + 2) % 4],
                  D2[(gg + 3) % 4],
                  m_words[:, sig[r, 8 + 2 * gg]],
                  m_words[:, sig[r, 9 + 2 * gg]])
        for slot in range(8):
            put_bits(c.A1, slot, rws, A1[slot])
            put_bits(c.C1, slot, rws, C1[slot])
            put_bits(c.A2, slot, rws, A2[slot])
            put_bits(c.C2, slot, rws, C2[slot])
            put_bits(c.D2, slot, rws, D2[slot])
            put_bits(c.B2, slot, rws, B2[slot])
            C[c.ca1.start + 2 * slot, rws] = CA1[slot] & 1
            C[c.ca1.start + 2 * slot + 1, rws] = CA1[slot] >> 1
            C[c.cc1.start + slot, rws] = CC1[slot]
            C[c.ca2.start + 2 * slot, rws] = CA2[slot] & 1
            C[c.ca2.start + 2 * slot + 1, rws] = CA2[slot] >> 1
            C[c.cc2.start + slot, rws] = CC2[slot]
        # next-round state
        v2 = np.zeros_like(v)
        for gg in range(4):
            v2[:, gg] = A2[4 + gg]
        for k in range(4):
            v2[:, 4 + k] = B2[4 + (k + 3) % 4]
            v2[:, 8 + k] = C2[4 + (k + 2) % 4]
            v2[:, 12 + k] = D2[4 + (k + 1) % 4]
        v = v2

    # digests, bound on last-round rows
    dg = np.zeros((B, 8), np.uint64)
    for j in range(8):
        dg[:, j] = np.uint64(IVP[j]) ^ v[:, j] ^ v[:, j + 8]
    lst_rows = rows + ROUNDS - 1
    for j in range(8):
        C[c.dg.start + j, lst_rows] = dg[:, j]
    # first/lst flags on live rows
    C[c.first, rows] = 1
    C[c.lst, lst_rows] = 1
    # pad tail: copy the final live row
    if live < n:
        C[:, live:] = C[:, live - 1][:, None]
        C[c.pad, live:] = 1
        C[c.first, live:] = 0

    digests = [b"".join(int(w).to_bytes(4, "little") for w in dg[i])
               for i in range(B)]
    t_host = t.copy()
    m_host = m_words.copy()
    dg_host = dg.copy()

    def build_phase2(_trace, ch):
        gamma = int(ch[0])
        acc_col = np.zeros(n, np.uint64)
        acc = 0
        G = pow(gamma, RECORD_LEN, MODULUS)
        for b in range(B):
            acc_col[b * ROUNDS:(b + 1) * ROUNDS] = acc
            r = _record_rlc_host(int(t_host[b]), m_host[b], dg_host[b], gamma)
            acc = (acc * G + r) % MODULUS
        # pads copy the in-row acc of the final live row
        acc_col[live:] = acc_col[live - 1]
        return gf.from_u64(acc_col[None, :])

    log_n = int(n).bit_length() - 1
    return gf.from_u64(C), fixed_columns(n), digests, build_phase2, log_n


def _record_rlc_host(t: int, m_words: np.ndarray, dg_words: np.ndarray,
                     gamma: int) -> int:
    r = t % MODULUS
    g = gamma
    for j in range(16):
        wv = int(m_words[j])
        for k in range(WBITS):
            if (wv >> k) & 1:
                r = (r + g) % MODULUS
            g = g * gamma % MODULUS
    for j in range(8):
        r = (r + g * int(dg_words[j])) % MODULUS
        g = g * gamma % MODULUS
    return r


def batch_rlc(records: Sequence[Tuple[int, np.ndarray, np.ndarray]],
              gamma: int) -> int:
    """records: [(t, m_words (16,), dg_words (8,)), ...] (plaintext)."""
    acc = 0
    G = pow(gamma, RECORD_LEN, MODULUS)
    for t, m, dgw in records:
        acc = (acc * G + _record_rlc_host(int(t), np.asarray(m, np.uint64),
                                          np.asarray(dgw, np.uint64),
                                          gamma)) % MODULUS
    return acc


def records_from_calls(messages: Sequence[bytes],
                       digests: Sequence[bytes]) -> List[Tuple]:
    out = []
    for msg, d in zip(messages, digests):
        m = _pad_message(msg)
        dgw = np.frombuffer(d, "<u4").astype(np.uint64)
        out.append((len(msg), m, dgw))
    return out


# ---------------------------------------------------------------------------
# prove / verify
# ---------------------------------------------------------------------------


def prove_blake2s_batch(messages: Sequence[bytes],
                        params: Optional[StarkParams] = None
                        ) -> Tuple[StarkProof, List[bytes], StarkParams]:
    """One STARK proving digest_i = blake2s(messages_i) for the whole batch.
    Returns (proof, digests, params)."""
    from .stark import _commit_columns

    phase1, fixed, digests, build_phase2, log_n = (
        build_blake2s_trace(messages))
    air = blake2s_air()
    if params is None:
        params = StarkParams(log_n=log_n)
    cap_f = _commit_columns(fixed, params)["cap"]
    cap_1 = _commit_columns(phase1, params)["cap"]
    (gamma,), _ = challenges_from_cap(cap_1, air, cap_f)
    acc = batch_rlc(records_from_calls(messages, digests), gamma)
    public = gf.from_u64(np.array([acc], np.uint64))
    proof = prove(phase1, air, params, public, build_phase2=build_phase2,
                  fixed_cols=fixed)
    return proof, digests, params


def verify_blake2s_batch(proof: StarkProof, messages: Sequence[bytes],
                         digests: Sequence[bytes],
                         params: StarkParams) -> bool:
    """messages/digests: the PLAINTEXT call list (public data — the path
    structure consuming these digests is evaluator+compact-form checked)."""
    air = blake2s_air()
    n = 1 << params.log_n
    if len(messages) != len(digests) or not messages:
        return False
    if ROUNDS * len(messages) > n:
        return False
    if any(len(m) > 64 for m in messages):
        return False
    if any(len(d) != 32 for d in digests):
        return False
    fixed = fixed_columns(n)
    from .stark import _commit_columns

    cap_f = _commit_columns(fixed, params)["cap"]
    if len(proof.caps) != 3:
        return False
    (gamma,), _ = challenges_from_cap(proof.caps[1], air, cap_f)
    acc = batch_rlc(records_from_calls(messages, digests), gamma)
    public = gf.from_u64(np.array([acc], np.uint64))
    return verify(proof, air, params, public, fixed_cols=fixed)
