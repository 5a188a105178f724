"""Provable lookup argument (logUp / logarithmic derivative).

Reference-parity role: boojum's lookup-table argument — the mechanism behind
every `cs.perform_lookup` in the reference (e.g. the VM opcode decode at
`src/main_vm/decoded_opcode.rs:233` against `VMOpcodeDecodingTable`, the
shift-to-multiplier lookup of `src/tables/bitshift.rs:12-40`, condition
resolution at `src/tables/conditional.rs:16-58`).  Until now this framework
checked lookups by index-witness gather (`tables/__init__.py`) — sound for
evaluation, but not carriable into a proof.  This module makes table
membership a STARK:

    sum_i  active_i / (X - key(q_i))  ==  sum_j  m_j / (X - key(t_j))

holds for a Fiat-Shamir X iff the active query tuples are a sub-multiset of
the table tuples with multiplicities m (logUp, Haböck ePrint 2022/1530 —
public technique, see PAPERS.md).  Tuples are compressed to a single field
key with a second challenge beta: key(x) = x_0 + beta x_1 + beta^2 x_2 + ...

Mapping onto the two-phase coset-quotient STARK (prover/stark.py):

  fixed columns   (verifier-known, cap recomputed by the verifier — the
                   "setup tree"):   t_0..t_{c-1}     the table tuples
  phase-1 columns (committed before challenges):
                   q_0..q_{c-1}     the queried tuples
                   active           1 on real queries, 0 on padding
                   m                multiplicity of table row j among queries
  challenges:      X = ch[0], beta = ch[1]        (drawn from FS(caps))
  phase-2 columns (challenge-derived):
                   inv_q = active / (X - key(q))
                   inv_t = m / (X - key(t))
                   acc   = running sum of (inv_q - inv_t)

  AIR (degree 2):
    row:        inv_q * (X - key(q)) - active  = 0
    row:        inv_t * (X - key(t)) - m       = 0
    row:        active * (active - 1)          = 0
    transition: acc' - acc - inv_q' + inv_t'   = 0
    first row:  acc - inv_q + inv_t            = 0   (affine)
    last row:   acc                            = 0   (affine)

The table occupies the first T rows (padded with multiplicity-0 rows up to
the power-of-two trace length); queries are padded with active=0 rows.  The
verifier supplies the PLAINTEXT table to `verify_lookup`, so a proof binds
the committed queries to THE agreed table, not a prover-chosen one.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

from ..ops import gf
from ..ops.gf import GF
from .stark import AirSpec, StarkParams, StarkProof, prove, verify


def _key(cols, beta: GF) -> GF:
    """Challenge-compressed tuple key: sum_k beta^k * cols[k] (Horner)."""
    acc = cols[-1]
    for k in range(len(cols) - 2, -1, -1):
        acc = gf.add(gf.mul(acc, beta), cols[k])
    return acc


@functools.lru_cache(maxsize=8)
def lookup_air(num_key_cols: int) -> AirSpec:
    """AIR for a `num_key_cols`-wide tuple lookup.

    Column order in row views (stark.py concatenation [fixed|p1|p2]):
      [0 .. c)        table tuple columns (fixed)
      [c .. 2c)       query tuple columns
      2c              active
      2c + 1          m
      2c + 2          inv_q
      2c + 3          inv_t
      2c + 4          acc
    """
    c = num_key_cols

    def split(row):
        t_cols = [row[..., k] for k in range(c)]
        q_cols = [row[..., c + k] for k in range(c)]
        active = row[..., 2 * c]
        m = row[..., 2 * c + 1]
        inv_q = row[..., 2 * c + 2]
        inv_t = row[..., 2 * c + 3]
        acc = row[..., 2 * c + 4]
        return t_cols, q_cols, active, m, inv_q, inv_t, acc

    def row_constraints(cur, ch):
        t_cols, q_cols, active, m, inv_q, inv_t, _ = split(cur)
        X, beta = ch[0], ch[1]
        kq = _key(q_cols, beta)
        kt = _key(t_cols, beta)
        return [
            gf.sub(gf.mul(inv_q, gf.sub(X, kq)), active),
            gf.sub(gf.mul(inv_t, gf.sub(X, kt)), m),
            gf.mul(active, gf.sub(active, gf.ones(active.shape))),
        ]

    def constraints(cur, nxt, ch):
        _, _, _, _, inv_q_n, inv_t_n, acc_n = split(nxt)
        acc = split(cur)[6]
        return [gf.sub(gf.sub(acc_n, acc), gf.sub(inv_q_n, inv_t_n))]

    def first_row(row, public, ch):
        _, _, _, _, inv_q, inv_t, acc = split(row)
        return [gf.sub(acc, gf.sub(inv_q, inv_t))]

    def last_row(row, public, ch):
        return [split(row)[6]]

    return AirSpec(
        num_cols=c + 2,
        max_degree=2,
        constraints=constraints,
        row_constraints=row_constraints,
        first_row=first_row,
        last_row=last_row,
        num_fixed_cols=c,
        num_phase2_cols=3,
        num_challenges=2,
    )


def _pad_pow2(arr: np.ndarray, n: int, fill=0) -> np.ndarray:
    out = np.full((arr.shape[0], n), fill, dtype=np.uint64)
    out[:, : arr.shape[1]] = arr
    return out


def lookup_trace(table_cols: np.ndarray, query_cols: np.ndarray,
                 log_n: Optional[int] = None
                 ) -> Tuple[GF, GF, np.ndarray, int]:
    """(fixed_cols GF, phase1 GF, multiplicities, log_n) for a lookup proof.

    table_cols: (c, T) u64 — the canonical table tuples (T >= 1).
    query_cols: (c, Q) u64 — the queried tuples; EVERY one must be in the
    table (the prover cannot build valid multiplicities otherwise — callers
    wanting a rejection test tamper the trace, see tests)."""
    table_cols = np.asarray(table_cols, np.uint64)
    query_cols = np.asarray(query_cols, np.uint64)
    c, T = table_cols.shape
    assert query_cols.shape[0] == c
    Q = query_cols.shape[1]
    n = 1 << (log_n if log_n is not None
              else max(max(T, Q) - 1, 1).bit_length())
    assert n >= T and n >= Q, (n, T, Q)

    # multiplicities: count each query tuple against table rows
    t_view = [tuple(int(table_cols[k, j]) for k in range(c)) for j in range(T)]
    index = {}
    for j, tup in enumerate(t_view):
        index.setdefault(tup, j)
    m = np.zeros(n, dtype=np.uint64)
    for i in range(Q):
        tup = tuple(int(query_cols[k, i]) for k in range(c))
        j = index.get(tup)
        if j is None:
            raise ValueError(f"query tuple {tup} not in table")
        m[j] += 1

    fixed = gf.from_u64(_pad_pow2(table_cols, n))
    active = np.zeros(n, dtype=np.uint64)
    active[:Q] = 1
    p1_rows = [_pad_pow2(query_cols, n), active[None], m[None]]
    phase1 = gf.from_u64(np.concatenate(p1_rows, axis=0))
    return fixed, phase1, m, int(np.log2(n))


def _build_phase2(c: int):
    """phase2 builder: trace is [fixed | phase1] = (2c+2, n)."""

    def build(trace: GF, ch_ints) -> GF:
        import jax

        X = gf.from_u64(np.uint64(ch_ints[0]))
        beta = gf.from_u64(np.uint64(ch_ints[1]))
        t_cols = [trace[k] for k in range(c)]
        q_cols = [trace[c + k] for k in range(c)]
        active = trace[2 * c]
        m = trace[2 * c + 1]
        kq = _key(q_cols, beta)
        kt = _key(t_cols, beta)
        inv_q = gf.mul(active, gf.inv(gf.sub(X, kq)))
        inv_t = gf.mul(m, gf.inv(gf.sub(X, kt)))
        diff = gf.sub(inv_q, inv_t)

        def body(acc, d):
            acc = gf.add(acc, d)
            return acc, acc

        _, acc = jax.lax.scan(body, gf.zeros(()), diff)
        return gf.stack([inv_q, inv_t, acc], axis=0)

    return build


def prove_lookup(table_cols: np.ndarray, query_cols: np.ndarray,
                 params: Optional[StarkParams] = None
                 ) -> Tuple[StarkProof, StarkParams]:
    """STARK-prove that every query tuple appears in the table."""
    c = int(np.asarray(table_cols).shape[0])
    fixed, phase1, _, log_n = lookup_trace(table_cols, query_cols)
    if params is None:
        params = StarkParams(log_n=log_n)
    air = lookup_air(c)
    proof = prove(phase1, air, params, build_phase2=_build_phase2(c),
                  fixed_cols=fixed)
    return proof, params


def verify_lookup(proof: StarkProof, table_cols: np.ndarray,
                  params: StarkParams) -> bool:
    """Verifier side: the PLAINTEXT canonical table pins the fixed-column
    cap; everything else is the STARK."""
    table_cols = np.asarray(table_cols, np.uint64)
    c = table_cols.shape[0]
    n = 1 << params.log_n
    if table_cols.shape[1] > n:
        return False
    fixed = gf.from_u64(_pad_pow2(table_cols, n))
    return verify(proof, lookup_air(c), params, fixed_cols=fixed)
