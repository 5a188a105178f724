"""Poseidon2 sponge-chain AIR: STARK proofs of queue-tail commitments.

Every observable value in this framework — queue tails, ClosedFormInput
commitments, Fiat-Shamir challenges — is a Poseidon2 sponge chain
(reference: boojum's CircuitRoundFunction usage across
era-zkevm_circuits, e.g. `src/base_structures/vm_state/mod.rs:27-28` queue
states, `src/fsm_input_output/mod.rs:281-326` commitments).  This module
makes those chains *provable*: a two-phase STARK (prover/stark.py) whose
trace is the full round trajectory of a chain of width-12 permutations, and
whose public values are

    [tail_init | tail_final | message_rlc]

where `message_rlc` is a random-linear-combination accumulator over every
absorbed rate chunk under a challenge gamma drawn AFTER the trace
commitment (the phase-2 column).  A verifier who recomputes the RLC from
the plaintext encodings binds the proof to the exact message stream — i.e.
this is a real proof of `tail_final = sponge_chain(tail_init, encodings)`,
replacing the trusting re-evaluation in `ops/queues.check_chain`.

AIR layout (one row per absorbed rate-chunk / permutation):

    pad | b_0..b_{M-1} | chunk[8] | carry[4] |
        (s3[12], y[12]) x 4 full rounds |
        (s3, y) x 22 partial rounds |
        (s3[12], y[12]) x 4 full rounds | O[12]          (phase 1)
    acc                                                   (phase 2)

Degree-7 S-boxes are decomposed with committed cubes: per S-box cell the
trace carries s3 = x^3 and y = s3^2 * x (= x^7), so every constraint is
degree <= 3 in committed cells (x itself is AFFINE in committed cells: the
external/internal matrices are linear, so round-input lanes are linear
compositions of the previous round's committed y columns).  States between
rounds are therefore NOT committed — the constraint evaluator rebuilds
them as linear expressions via the same `_ext_matrix`/`_int_matrix` used
by the runtime permutation (ops/poseidon2.py).

Chaining:
  * narrow queues (QUEUE_STATE_WIDTH=4; `ops/queues.narrow_state_transition`)
    absorb M=3 chunks per push (20-element encodings zero-padded to 24) and
    RE-SEED lanes 8:12 from the previous push's out[:4] (the running tail);
    a one-hot M-phase counter (b_0..b_{M-1}) drives the carry source.
  * full-state queues (FULL_SPONGE_QUEUE_STATE_WIDTH=12;
    `ops/queues.full_state_transition`) absorb 1 chunk per push and carry
    lanes 8:12 of the previous output (replacement absorption makes lanes
    0:8 of the incoming state irrelevant).

Padding: rows beyond the real chain hold ONE precomputed valid block
(chunk=0, carry=0) so the ungated round constraints stay satisfied; a
committed boolean `pad` (monotone, booleanity-checked) switches the output
columns to passthrough so the real tail reaches the last row, where the
boundary constraint binds it to the public value.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gf, poseidon2
from ..ops.gf import GF, MODULUS
from ..ops.poseidon2 import (
    EXT_RC,
    INT_RC,
    R_FULL,
    R_PARTIAL,
    RATE,
    WIDTH,
    _MU_MINUS_1,
    _const_gf,
    _ext_matrix,
    _int_matrix,
    _ladd,
    _lmul,
)
from .stark import (
    AirSpec,
    StarkParams,
    StarkProof,
    _alpha_powers,
    _alpha_sum,
    prove,
    verify,
)

HALF_FULL = R_FULL // 2  # 4


@dataclasses.dataclass(frozen=True)
class ChainSpec:
    """blocks_per_push M; narrow chains restart each push from the running
    4-lane tail, full-state chains carry capacity lanes throughout."""

    blocks_per_push: int
    restart_from_tail: bool
    out_width: int  # 4 (narrow tail) or 12 (full queue state)

    @property
    def cols(self):
        return _ColMap(self.blocks_per_push)

    @property
    def num_public(self) -> int:
        return 4 + self.out_width + 1


NARROW = ChainSpec(blocks_per_push=3, restart_from_tail=True, out_width=4)
FULL = ChainSpec(blocks_per_push=1, restart_from_tail=False, out_width=12)


class PermCols:
    """Column layout of ONE permutation block starting at index `start`:
    chunk[8] | carry[4] | (s3[12], y[12]) x 4 | (s3, y) x 22 |
    (s3[12], y[12]) x 4 | out[12].  Reused by the chain AIR (one block per
    row) and the combined ram_permutation AIR (two blocks per row)."""

    def __init__(self, start: int = 0):
        i = start
        self.chunk = slice(i, i + RATE); i += RATE
        self.carry = slice(i, i + 4); i += 4
        self.full1_s3, self.full1_y = [], []
        for _ in range(HALF_FULL):
            self.full1_s3.append(slice(i, i + WIDTH)); i += WIDTH
            self.full1_y.append(slice(i, i + WIDTH)); i += WIDTH
        self.part_s3 = slice(i, i + R_PARTIAL); i += R_PARTIAL
        self.part_y = slice(i, i + R_PARTIAL); i += R_PARTIAL
        self.full2_s3, self.full2_y = [], []
        for _ in range(HALF_FULL):
            self.full2_s3.append(slice(i, i + WIDTH)); i += WIDTH
            self.full2_y.append(slice(i, i + WIDTH)); i += WIDTH
        self.out = slice(i, i + WIDTH); i += WIDTH
        self.end = i

    @property
    def width(self) -> int:
        return self.end - (self.chunk.start)


class _ColMap:
    """Phase-1 column index layout of the chain AIR."""

    def __init__(self, m: int):
        self.m = m
        i = 0
        self.pad = i; i += 1
        self.b = slice(i, i + m); i += m
        perm = PermCols(i)
        self.chunk = perm.chunk
        self.carry = perm.carry
        self.full1_s3, self.full1_y = perm.full1_s3, perm.full1_y
        self.part_s3, self.part_y = perm.part_s3, perm.part_y
        self.full2_s3, self.full2_y = perm.full2_s3, perm.full2_y
        self.out = perm.out
        self.perm = perm
        i = perm.end
        self.num_phase1 = i
        self.acc = i  # phase-2 column (index in the CONCATENATED row)
        self.total = i + 1


_c = gf.canonicalize


def _cube(x: GF) -> GF:
    return _lmul(_lmul(x, x), x)


def _sbox_out(s3: GF, x: GF) -> GF:
    return _lmul(_lmul(s3, s3), x)


def _rc_ext() -> GF:
    return _const_gf(EXT_RC)  # (8, 12)


def _rc_int() -> GF:
    return _const_gf(INT_RC)  # (22,)


def _mu_m1() -> GF:
    return _const_gf(_MU_MINUS_1)  # (12,)


def _unstack(v: GF):
    if len(v.shape) == 1:
        return [v]
    return [v[..., i] for i in range(v.shape[-1])]


def _rounds_first(cur: GF, slices, axis0_len: int) -> GF:
    """Stack per-round column blocks into a scan-leading axis:
    [(batch, k)] * R -> (R, batch, k)."""
    return gf.stack([cur[..., s] for s in slices], axis=0)


def _scan_axis0(v: GF) -> GF:
    """(batch, R) -> (R, batch) for scanning over rounds."""
    return GF(jnp.moveaxis(v.lo, -1, 0), jnp.moveaxis(v.hi, -1, 0))


def _dot_lanes(vals: GF, weights: GF) -> GF:
    """(batch, k) x (k,) weights -> (batch,) alpha-weighted lane sum
    (log-depth tree; unrolled chains hang the XLA:CPU compiler)."""
    return gf.dot_mod(gf.canonicalize(vals), weights, axis=-1)


def fold_perm_constraints(cur: GF, pcols: PermCols, alpha: GF, a_pow: GF):
    """Alpha-fold the S-box decomposition constraints of one permutation
    block (s3 = x^3 and y = s3^2 * x per round cell, round-input states
    rebuilt as linear compositions of committed y columns), with the 30
    rounds under lax.scan (unrolling hangs the XLA:CPU compiler).

    Returns (acc_contribution, a_pow', final_state) where final_state is
    the in-circuit linear/low-degree expression of the permutation output
    — the caller constrains it against the committed out columns."""
    ext_rc, int_rc, mu = _rc_ext(), _rc_int(), _mu_m1()
    w24 = _alpha_powers(alpha, 2 * WIDTH)
    a24 = _c(gf.mul(w24[2 * WIDTH - 1], alpha))
    w2 = _alpha_powers(alpha, 2)
    a2 = _c(gf.mul(w2[1], alpha))

    def full_body(carry, xs):
        st, a_pow, acc = carry
        rc, s3, y = xs
        x = _ladd(st, rc)
        c1 = gf.sub(_c(_cube(x)), s3)            # (batch, 12)
        c2 = gf.sub(_c(_sbox_out(s3, x)), y)
        inner = _dot_lanes(gf.concat([c1, c2], axis=-1), w24)
        acc = gf.add(acc, gf.mul(a_pow, inner))
        return (_ext_matrix(y), _c(gf.mul(a_pow, a24)), acc), None

    def partial_body(carry, xs):
        st, a_pow, acc = carry
        rc, s3, y = xs
        x0 = _ladd(st[..., 0], rc)
        c1 = gf.sub(_c(_cube(x0)), s3)           # (batch,)
        c2 = gf.sub(_c(_sbox_out(s3, x0)), y)
        inner = _dot_lanes(gf.stack([c1, c2], axis=-1), w2)
        acc = gf.add(acc, gf.mul(a_pow, inner))
        st = _int_matrix(
            gf.concat([gf.expand_dims(y, -1), st[..., 1:]], axis=-1), mu
        )
        return (st, _c(gf.mul(a_pow, a2)), acc), None

    s_pre = gf.concat([cur[..., pcols.chunk], cur[..., pcols.carry]], axis=-1)
    st = _ext_matrix(s_pre)
    batch = st.shape[:-1]
    acc0 = gf.zeros(batch)
    carry = (st, _c(a_pow), acc0)
    carry, _ = jax.lax.scan(
        full_body, carry,
        (ext_rc[:HALF_FULL],
         _rounds_first(cur, pcols.full1_s3, HALF_FULL),
         _rounds_first(cur, pcols.full1_y, HALF_FULL)),
    )
    carry, _ = jax.lax.scan(
        partial_body, carry,
        (int_rc,
         _scan_axis0(cur[..., pcols.part_s3]),
         _scan_axis0(cur[..., pcols.part_y])),
    )
    carry, _ = jax.lax.scan(
        full_body, carry,
        (ext_rc[HALF_FULL:],
         _rounds_first(cur, pcols.full2_s3, HALF_FULL),
         _rounds_first(cur, pcols.full2_y, HALF_FULL)),
    )
    final, a_pow, acc = carry
    return acc, a_pow, _c(final)


@functools.lru_cache(maxsize=8)
def chain_air(spec: ChainSpec) -> AirSpec:
    cols = spec.cols
    M = spec.blocks_per_push

    def _one_minus(x: GF) -> GF:
        return gf.sub(gf.ones(x.shape), x)

    def _rlc(chunk: GF, gamma: GF) -> GF:
        return _dot_lanes(chunk, _alpha_powers(gamma, RATE))

    def compose_row(cur, ch, alpha, a_pow):
        """Alpha-weighted sum of all per-row constraints, with the
        per-round S-box constraints folded under lax.scan (the flat list
        unrolls into a graph the XLA CPU compiler cannot handle)."""
        vals = []
        pad = cur[..., cols.pad]
        live = _one_minus(pad)
        # booleanity
        vals.append(gf.mul(pad, gf.sub(pad, gf.ones(pad.shape))))
        b = cur[..., cols.b]
        for i in range(M):
            bi = b[..., i]
            vals.append(gf.mul(bi, gf.sub(bi, gf.ones(bi.shape))))
            vals.append(gf.mul(pad, bi))          # pad rows: counter zeroed
        # one-hot on live rows
        tot = b[..., 0]
        for i in range(1, M):
            tot = gf.add(tot, b[..., i])
        vals.append(gf.mul(live, gf.sub(tot, gf.ones(tot.shape))))
        # pad rows hold the canonical zero-block (chunk=0, carry=0)
        for v in _unstack(cur[..., cols.chunk]):
            vals.append(gf.mul(pad, v))
        for v in _unstack(cur[..., cols.carry]):
            vals.append(gf.mul(pad, v))
        acc, a_pow = _alpha_sum(vals, alpha, a_pow)

        perm_acc, a_pow, final = fold_perm_constraints(
            cur, cols.perm, alpha, a_pow
        )
        acc = gf.add(acc, perm_acc)

        # O = permutation output on live rows (pad rows: passthrough,
        # enforced in transitions)
        vals = []
        O = cur[..., cols.out]
        for fo, oo in zip(_unstack(_c(final)), _unstack(O)):
            vals.append(gf.mul(live, gf.sub(oo, fo)))
        tail_acc, a_pow = _alpha_sum(vals, alpha, a_pow)
        return gf.add(acc, tail_acc), a_pow

    def constraints(cur, nxt, ch):
        vals = []
        pad_n = nxt[..., cols.pad]
        live_n = _one_minus(pad_n)
        # pad is monotone
        vals.append(gf.mul(cur[..., cols.pad], live_n))
        # one-hot counter rotates on live rows
        b_c, b_n = cur[..., cols.b], nxt[..., cols.b]
        for i in range(M):
            vals.append(
                gf.mul(live_n, gf.sub(b_n[..., i], b_c[..., (i - 1) % M]))
            )
        # carry chaining: push-start rows re-seed from the tail (narrow) or
        # continue from capacity lanes
        O_c = cur[..., cols.out]
        for k in range(4):
            if spec.restart_from_tail:
                b0 = b_n[..., 0]
                src = gf.add(
                    gf.mul(b0, O_c[..., k]),
                    gf.mul(_one_minus(b0), O_c[..., 8 + k]),
                )
            else:
                src = O_c[..., 8 + k]
            vals.append(
                gf.mul(live_n, gf.sub(nxt[..., cols.carry][..., k], src))
            )
        # pad rows pass the output through unchanged
        O_n = nxt[..., cols.out]
        for k in range(WIDTH):
            vals.append(gf.mul(pad_n, gf.sub(O_n[..., k], O_c[..., k])))
        # phase-2 RLC accumulator
        gamma = ch[0]
        g2 = gf.mul(gamma, gamma)
        g4 = gf.mul(g2, g2)
        g_rate = gf.mul(g4, g4)  # gamma^RATE (RATE = 8)
        acc_c, acc_n = cur[..., cols.acc], nxt[..., cols.acc]
        live_val = gf.add(
            gf.mul(acc_c, g_rate), _rlc(nxt[..., cols.chunk], gamma)
        )
        sel = gf.add(gf.mul(pad_n, acc_c), gf.mul(live_n, live_val))
        vals.append(gf.sub(acc_n, sel))
        return vals

    def first_row(row, public, ch):
        vals = []
        vals.append(row[..., cols.pad])
        vals.append(
            gf.sub(row[..., cols.b][..., 0], gf.ones(row[..., cols.pad].shape))
        )
        for k in range(4):
            vals.append(gf.sub(row[..., cols.carry][..., k], public[k]))
        vals.append(gf.sub(row[..., cols.acc], _rlc(row[..., cols.chunk], ch[0])))
        return vals

    def last_row(row, public, ch):
        vals = []
        O = row[..., cols.out]
        for k in range(spec.out_width):
            vals.append(gf.sub(O[..., k], public[4 + k]))
        vals.append(gf.sub(row[..., cols.acc], public[4 + spec.out_width]))
        return vals

    return AirSpec(
        num_cols=cols.num_phase1,
        max_degree=3,
        constraints=constraints,
        compose_row=compose_row,
        first_row=first_row,
        last_row=last_row,
        num_public=spec.num_public,
        num_phase2_cols=1,
        num_challenges=1,
    )


# ---------------------------------------------------------------------------
# trace builder (device scan over rows; one scan body per phase of rounds)
# ---------------------------------------------------------------------------


def _block_capture(s_pre: GF):
    """One permutation with per-round (s3, y) capture.  s_pre: (..., 12)."""
    ext_rc, int_rc, mu = _rc_ext(), _rc_int(), _mu_m1()

    def full_round(st, rc):
        x = _ladd(st, rc)
        s3 = _c(_cube(x))
        y = _c(_sbox_out(s3, x))
        return _ext_matrix(y), (s3, y)

    def partial_round(st, rc):
        x0 = _ladd(st[..., 0], rc)
        s3 = _c(_cube(x0))
        y = _c(_sbox_out(s3, x0))
        st2 = _int_matrix(
            gf.concat([gf.expand_dims(y, -1), st[..., 1:]], axis=-1), mu
        )
        return st2, (s3, y)

    st = _ext_matrix(s_pre)
    st, (f1_s3, f1_y) = jax.lax.scan(full_round, st, ext_rc[:HALF_FULL])
    st, (p_s3, p_y) = jax.lax.scan(partial_round, st, int_rc)
    st, (f2_s3, f2_y) = jax.lax.scan(full_round, st, ext_rc[HALF_FULL:])
    return _c(st), (f1_s3, f1_y, p_s3, p_y, f2_s3, f2_y)


@functools.lru_cache(maxsize=4)
def _chain_scan_fn(restart_from_tail: bool):
    def body(prev_o: GF, xs):
        chunk, b0 = xs
        if restart_from_tail:
            carry = gf.select(
                jnp.expand_dims(b0, -1) if b0.ndim else b0,
                prev_o[..., :4],
                prev_o[..., 8:12],
            )
        else:
            carry = prev_o[..., 8:12]
        s_pre = gf.concat([chunk, carry], axis=-1)
        out, caps = _block_capture(s_pre)
        return out, (carry, out, caps)

    return jax.jit(
        lambda init_o, chunks, b0s: jax.lax.scan(body, init_o, (chunks, b0s))
    )


def build_chain_trace(
    chunks: np.ndarray, init_state: np.ndarray, spec: ChainSpec,
    log_n: Optional[int] = None,
):
    """chunks: (B, 8) u64 rate blocks; init_state: (4,) u64 — the initial
    tail (narrow) or capacity lanes state[8:12] (full).  Returns
    (phase1 trace (num_phase1, n) GF, publics-sans-acc, build_phase2, n)."""
    B = chunks.shape[0]
    assert B >= 1 and chunks.shape == (B, RATE)
    M = spec.blocks_per_push
    assert B % M == 0, "chain length must be whole pushes"
    cols = spec.cols
    min_log = 3
    need = max(1 << min_log, 1 << (B - 1).bit_length())
    n = need if log_n is None else (1 << log_n)
    assert n >= B

    b0s = np.zeros(B, dtype=bool)
    b0s[::M] = True
    # init "previous output": row 0 reads its carry from lanes 0:4 (narrow
    # push-start) or 8:12 (full), so place the init state in both
    init_o = np.zeros(12, dtype=np.uint64)
    init_o[0:4] = init_state
    init_o[8:12] = init_state

    run = _chain_scan_fn(spec.restart_from_tail)
    final_o, (carries, outs, caps) = run(
        gf.from_u64(init_o), gf.from_u64(chunks.astype(np.uint64)),
        jnp.asarray(b0s),
    )
    f1_s3, f1_y, p_s3, p_y, f2_s3, f2_y = caps  # (B, R, 12) / (B, 22)

    # one canonical zero-block for pad rows
    pad_o, pad_caps = _block_capture(gf.zeros((WIDTH,)))
    pf1_s3, pf1_y, pp_s3, pp_y, pf2_s3, pf2_y = pad_caps

    tu = lambda g: np.asarray(g.astype_u64())
    trace = np.zeros((cols.num_phase1, n), dtype=np.uint64)
    trace[cols.pad, B:] = 1
    bcols = np.zeros((M, B), dtype=np.uint64)
    for i in range(M):
        bcols[i, i::M] = 1
    trace[cols.b, :B] = bcols
    trace[cols.chunk, :B] = chunks.astype(np.uint64).T
    trace[cols.carry, :B] = tu(carries).T
    for r in range(HALF_FULL):
        trace[cols.full1_s3[r], :B] = tu(f1_s3)[:, r, :].T
        trace[cols.full1_y[r], :B] = tu(f1_y)[:, r, :].T
        trace[cols.full2_s3[r], :B] = tu(f2_s3)[:, r, :].T
        trace[cols.full2_y[r], :B] = tu(f2_y)[:, r, :].T
        trace[cols.full1_s3[r], B:] = tu(pf1_s3)[r][:, None]
        trace[cols.full1_y[r], B:] = tu(pf1_y)[r][:, None]
        trace[cols.full2_s3[r], B:] = tu(pf2_s3)[r][:, None]
        trace[cols.full2_y[r], B:] = tu(pf2_y)[r][:, None]
    trace[cols.part_s3, :B] = tu(p_s3).T
    trace[cols.part_y, :B] = tu(p_y).T
    trace[cols.part_s3, B:] = tu(pp_s3)[:, None]
    trace[cols.part_y, B:] = tu(pp_y)[:, None]
    outs_np = tu(outs)  # (B, 12)
    trace[cols.out, :B] = outs_np.T
    trace[cols.out, B:] = outs_np[-1][:, None]  # passthrough

    chunks_u = chunks.astype(np.uint64)

    def build_phase2(_trace_gf, ch):
        gamma = ch[0]
        g_rate = pow(gamma, RATE, MODULUS)
        acc = np.zeros(n, dtype=np.uint64)
        a = 0
        for i in range(B):
            r = 0
            g = 1
            for j in range(RATE):
                r = (r + int(chunks_u[i, j]) * g) % MODULUS
                g = g * gamma % MODULUS
            a = (a * g_rate + r) % MODULUS if i else r
            acc[i] = a
        acc[B:] = a
        return gf.from_u64(acc[None, :])

    out_final = outs_np[-1]
    if spec.out_width == 4:
        out_pub = out_final[:4]
    else:
        out_pub = out_final
    publics_head = np.concatenate(
        [np.asarray(init_state, dtype=np.uint64), out_pub.astype(np.uint64)]
    )
    return gf.from_u64(trace), publics_head, build_phase2, n


def message_rlc(chunks: np.ndarray, gamma: int) -> int:
    """The public RLC binding: recomputed by the VERIFIER from plaintext
    chunks so the proof commits to the exact message stream."""
    g_rate = pow(gamma, RATE, MODULUS)
    a = 0
    for i in range(chunks.shape[0]):
        r = 0
        g = 1
        for j in range(chunks.shape[1]):
            r = (r + int(chunks[i, j]) * g) % MODULUS
            g = g * gamma % MODULUS
        a = (a * g_rate + r) % MODULUS if i else r
    return a


def encodings_to_chunks(encodings: np.ndarray) -> np.ndarray:
    """(L, E) narrow-queue encodings -> (L*ceil(E/8), 8) zero-padded chunks
    (the blocking of `ops/queues.narrow_state_transition`)."""
    L, E = encodings.shape
    padded = E + (-E) % RATE
    buf = np.zeros((L, padded), dtype=np.uint64)
    buf[:, :E] = encodings
    return buf.reshape(L * (padded // RATE), RATE)


# ---------------------------------------------------------------------------
# queue-chain proof API
# ---------------------------------------------------------------------------


def prove_queue_chain(
    encodings: np.ndarray,
    init_state: np.ndarray,
    spec: ChainSpec = NARROW,
    params: Optional[StarkParams] = None,
) -> Tuple[StarkProof, GF, StarkParams]:
    """Prove tail_final = sponge_chain(init, encodings).

    narrow: encodings (L, 20) u64, init_state = the (4,) tail;
    full:   encodings (L, 8) u64, init_state = state[8:12] (lanes 0:8 are
            replaced by the first absorption and cannot affect the chain).
    Returns (proof, publics, params); publics[4:4+out_width] is the proven
    final tail/state."""
    chunks = (
        encodings_to_chunks(encodings)
        if spec.blocks_per_push > 1
        else encodings.astype(np.uint64)
    )
    trace, pub_head, build_phase2, n = build_chain_trace(chunks, init_state, spec)
    if params is None:
        params = StarkParams(log_n=int(n).bit_length() - 1, log_blowup=2)
    air = chain_air(spec)
    # the acc public is challenge-dependent: gamma = FS(cap_1) exactly as
    # prove() derives it (public is absorbed AFTER the challenge round), so
    # one extra phase-1 commitment here learns gamma before prove() reruns
    # the same deterministic pipeline.
    from .stark import _commit_columns, challenges_from_cap

    cap1 = _commit_columns(trace, params)["cap"]
    (gamma,), _ = challenges_from_cap(cap1, air)
    acc = message_rlc(chunks, gamma)
    publics = np.concatenate(
        [pub_head, np.array([acc], dtype=np.uint64)]
    )
    public_gf = gf.from_u64(publics)
    proof = prove(trace, air, params, public_gf, build_phase2)
    return proof, public_gf, params


def verify_queue_chain(
    proof: StarkProof,
    encodings: np.ndarray,
    init_state: np.ndarray,
    final_state: np.ndarray,
    spec: ChainSpec = NARROW,
    params: Optional[StarkParams] = None,
) -> bool:
    """Check a queue-chain proof against PLAINTEXT encodings and claimed
    init/final states: recompute the RLC public under the transcript-bound
    gamma, then run the STARK verifier."""
    chunks = (
        encodings_to_chunks(encodings)
        if spec.blocks_per_push > 1
        else encodings.astype(np.uint64)
    )
    B = chunks.shape[0]
    if params is None:
        n = max(8, 1 << (B - 1).bit_length())
        params = StarkParams(log_n=int(n).bit_length() - 1, log_blowup=2)
    air = chain_air(spec)
    pub_head = np.concatenate(
        [np.asarray(init_state, np.uint64), np.asarray(final_state, np.uint64)]
    )
    if pub_head.shape != (4 + spec.out_width,):
        return False
    from .stark import challenges_from_cap

    (gamma,), _ = challenges_from_cap(proof.caps[0], air)
    acc = message_rlc(chunks, gamma)
    publics = np.concatenate([pub_head, np.array([acc], dtype=np.uint64)])
    return verify(proof, air, params, gf.from_u64(publics))
