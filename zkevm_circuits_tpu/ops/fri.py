"""FRI low-degree argument over Goldilocks with GF(p^2) challenges.

The reference prover (boojum) proves witness-polynomial degree bounds with
FRI: commit to the codeword on an LDE coset, repeatedly fold by a
Fiat-Shamir challenge from the quadratic extension (`GoldilocksExt2` — our
ops/gf2.py), Merkle-committing every layer, then spot-check consistency at
random query positions.  This module is the TPU-native realization on top of
ops/{ntt,merkle,gf2}:

  * codeword values lift to GF(p^2); folds are fully batched device ops
    (the fold of a 2^k codeword is one vectorized butterfly);
  * each layer's Merkle leaves pack the fold pair (v(x), v(-x)) so a query
    needs ONE path per layer;
  * the transcript is a Poseidon2 sponge (host-driven ints, device hashing).

Fold rule (x' = x^2, domain halves, natural order kept):
    v'(x^2) = (v(x) + v(-x)) / 2  +  beta * (v(x) - v(-x)) / (2x)
with -x_i = x_{i + n/2} on the coset shift*<w>.

Prover: `prove(codeword, params)`; verifier: `verify(proof, params)` —
accepts iff the committed codeword is (within FRI soundness) a degree <
n/blowup polynomial's evaluation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List

import jax.numpy as jnp
import numpy as np

from . import gf, gf2, merkle, ntt, poseidon2
from .gf import GF, MODULUS
from .gf2 import GF2


@dataclasses.dataclass(frozen=True)
class FriParams:
    log_domain: int          # evaluation-domain size 2^log_domain
    log_blowup: int = 1      # rate: degree bound = 2^(log_domain - log_blowup)
    num_queries: int = 20
    final_poly_log_len: int = 2   # stop folding at this codeword length
    cap_log2: int = 1
    coset_shift: int = gf.MULTIPLICATIVE_GENERATOR


@dataclasses.dataclass
class FriProof:
    caps: List[GF]                # per-layer Merkle caps (2^cap, 4)
    final_poly: np.ndarray        # (2, final_len) u64 — GF2 coefficients
    query_indices: List[int]
    # per query, per layer: (pair values (2,2) u64-as-GF2, path)
    openings: List[List[dict]]


# ---------------------------------------------------------------------------
# transcript (Fiat-Shamir over Poseidon2)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _absorb_fn():
    """One jitted absorb program per flat length (each eager hash_padded
    call costs ~45 ms in small dispatches on the axon TPU; a proof absorbs
    ~25 times, so transcript ops must be single fused programs)."""
    import jax

    @jax.jit
    def run(state: GF, flat: GF) -> GF:
        return poseidon2.hash_padded(
            gf.concat([state, flat], axis=-1), length_specialize=True
        )

    return run


@functools.lru_cache(maxsize=None)
def _squeeze_fn():
    import jax

    @jax.jit
    def run(state: GF) -> GF:
        return poseidon2.hash_padded(state, length_specialize=False)

    return run


class Transcript:
    """Fiat-Shamir sponge with a DEVICE-resident state.

    absorb/challenge_ext produce device values without host pulls — the
    prover threads challenges straight into the next device stage (fold,
    composition) and only pulls an int when host logic (rejection sampling,
    query positions) genuinely needs one."""

    def __init__(self):
        self._state = gf.zeros((4,))

    def absorb(self, lanes: GF):
        self._state = _absorb_fn()(self._state, lanes.reshape(-1))

    def challenge_ext(self) -> GF2:
        self._state = _squeeze_fn()(self._state)
        return GF2(self._state[0], self._state[1])

    def challenge_index(self, bound: int) -> int:
        self._state = _squeeze_fn()(self._state)
        v = int(np.asarray(self._state[0].astype_u64()))
        return v % bound

    def challenge_indices(self, bound: int, count: int) -> List[int]:
        """`count` query indices, four per squeeze (all four state lanes are
        uniform), one host pull per squeeze instead of one per index."""
        out: List[int] = []
        while len(out) < count:
            self._state = _squeeze_fn()(self._state)
            lanes = np.asarray(self._state.astype_u64())
            for k in range(4):
                if len(out) < count:
                    out.append(int(lanes[k]) % bound)
        return out


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _x_inv_table(log_n: int, shift: int) -> GF:
    """(n/2,) inverses of the first-half domain points shift*w^i."""
    n = 1 << log_n
    w = ntt.root_of_unity(log_n)
    w_inv = pow(w, MODULUS - 2, MODULUS)
    s_inv = pow(shift, MODULUS - 2, MODULUS)
    vals = [s_inv * pow(w_inv, i, MODULUS) % MODULUS for i in range(n // 2)]
    return gf.from_u64(np.array(vals, dtype=np.uint64))


_HALF = pow(2, MODULUS - 2, MODULUS)


def _fold(v: GF2, beta: GF2, log_n: int, shift: int) -> GF2:
    """One FRI fold: (n,) GF2 codeword -> (n/2,)."""
    n = 1 << log_n
    half = n // 2
    a = GF2(v.c0[..., :half], v.c1[..., :half])          # v(x)
    b = GF2(v.c0[..., half:], v.c1[..., half:])          # v(-x)
    x_inv = _x_inv_table(log_n, shift)
    half_c = gf.from_u64(np.uint64(_HALF))
    even = gf2.mul(gf2.add(a, b), gf2.from_base(half_c))
    odd = gf2.mul(gf2.sub(a, b), gf2.from_base(gf.mul(half_c, x_inv)))
    return gf2.add(even, gf2.mul(beta, odd))


def _layer_leaves(v: GF2) -> GF:
    """Pack fold pairs into Merkle leaves: leaf i = [a0,a1,b0,b1] lanes."""
    n = v.c0.shape[-1]
    half = n // 2
    return gf.stack(
        [v.c0[..., :half], v.c1[..., :half],
         v.c0[..., half:], v.c1[..., half:]],
        axis=-1,
    )  # (half, 4)


def _open_path_np(levels_np, index: int) -> np.ndarray:
    """merkle.open_path on host-side numpy level arrays -> (depth, 4) u64."""
    sibs = []
    idx = index
    for lvl in levels_np[:-1]:
        sibs.append(lvl[idx ^ 1])
        idx >>= 1
    return np.stack(sibs, axis=0)


def _eval_poly_ext(coeffs: np.ndarray, x: int) -> tuple:
    """Horner eval of GF2 coefficients (2, L) u64 at BASE-field point x."""
    c0 = 0
    c1 = 0
    for j in range(coeffs.shape[1] - 1, -1, -1):
        c0 = (c0 * x + int(coeffs[0, j])) % MODULUS
        c1 = (c1 * x + int(coeffs[1, j])) % MODULUS
    return c0, c1


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _fold_jit():
    import jax

    return functools.partial(
        jax.jit, static_argnames=("log_n", "shift")
    )(_fold)


# --------------------------------------------------------------------------
# device-side opening gathers: levels stay resident; only the handful of
# queried digests/values ever cross the tunnel (pulling whole trees was
# ~16 MB / proof at 37 MB/s)
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _gather_rows_fn():
    import jax

    @jax.jit
    def run(lo, hi, idx):
        return lo[idx], hi[idx]

    return run


def gather_rows(arr: GF, idx_np: np.ndarray) -> np.ndarray:
    """arr (n, ...) GF, idx (k,) host ints -> (k, ..., 2) u64 numpy
    [..., 0]=value — one fused gather + one small pull."""
    import jax.numpy as jnp

    idx = jnp.asarray(np.asarray(idx_np, np.int32))
    lo, hi = _gather_rows_fn()(arr.lo, arr.hi, idx)
    out = np.asarray(GF(lo, hi).astype_u64())
    return out


@functools.lru_cache(maxsize=None)
def _gather_paths_fn():
    """One fused program per (level-shape-tuple, k): all sibling gathers +
    stack in a single dispatch (the eager per-level variant cost ~0.3 s per
    tree in small dispatches — the FRI-prove wall)."""
    import jax

    @jax.jit
    def run(level_los, level_his, sibs):
        # level_los/his: tuple of (size_d, 4); sibs: (depth, k) int32
        los = [lvl[sibs[d]] for d, lvl in enumerate(level_los)]
        his = [lvl[sibs[d]] for d, lvl in enumerate(level_his)]
        import jax.numpy as jnp

        return jnp.stack(los, axis=1), jnp.stack(his, axis=1)

    return run


def gather_paths(levels, idx_np: np.ndarray) -> np.ndarray:
    """Merkle sibling paths for k leaves: levels = [(size,4) GF ...],
    idx (k,) -> (k, depth, 4) u64 — one fused device gather, one pull."""
    import jax.numpy as jnp

    idx = np.asarray(idx_np, np.int64)
    k = idx.shape[0]
    depth = len(levels) - 1
    if depth == 0:
        return np.zeros((k, 0, 4), np.uint64)
    sibs = np.zeros((depth, k), np.int32)
    cur = idx
    for d in range(depth):
        sibs[d] = (cur ^ 1).astype(np.int32)
        cur = cur >> 1
    lo, hi = _gather_paths_fn()(
        tuple(l.lo for l in levels[:-1]),
        tuple(l.hi for l in levels[:-1]),
        jnp.asarray(sibs),
    )
    return np.asarray(GF(lo, hi).astype_u64())


def commit_layer(v: GF2, cap_log2: int):
    """Leaf-pack + hash + tree for one FRI layer; everything device-resident
    (Pallas Poseidon2 for big levels, bucketed executables for small)."""
    leaves = _layer_leaves(v)
    lh = merkle.hash_leaves(leaves)
    levels = merkle.tree_levels(lh, cap_log2)
    return dict(values=v, levels=levels, cap=levels[-1])


def prove(codeword: GF, params: FriParams, tr: Transcript = None) -> FriProof:
    """codeword: (n,) base-field evaluations on the coset shift*H.

    Device-resident: per-layer commit + fold keep the codeword, trees and
    the beta challenges on device (no per-layer pulls); the host pulls the
    tiny final codeword, ~Q/4 index squeezes and the queried openings."""
    n = 1 << params.log_domain
    assert codeword.shape == (n,)
    v = gf2.from_base(codeword)
    shift = params.coset_shift
    log_n = params.log_domain
    if tr is None:
        tr = Transcript()

    layers = []
    while log_n > params.final_poly_log_len:
        layer = commit_layer(v, params.cap_log2)
        layers.append(layer)
        tr.absorb(layer["cap"])
        beta = tr.challenge_ext()      # device GF2 — feeds the fold directly
        v = _fold_jit()(v, beta, log_n=log_n, shift=shift)
        shift = shift * shift % MODULUS
        log_n -= 1

    # final polynomial COEFFICIENTS (degree < final_len/blowup): derived by
    # interpolating the last (tiny) codeword on its coset and unshifting; an
    # honest low-degree codeword leaves the high coefficients zero (asserted)
    final_deg_len = 1 << max(params.final_poly_log_len - params.log_blowup, 0)
    c0 = _coset_coeffs([int(x) for x in np.asarray(v.c0.astype_u64())], shift)
    c1 = _coset_coeffs([int(x) for x in np.asarray(v.c1.astype_u64())], shift)
    assert all(c == 0 for c in c0[final_deg_len:]), "codeword not low degree"
    assert all(c == 0 for c in c1[final_deg_len:]), "codeword not low degree"
    final = np.zeros((2, final_deg_len), dtype=np.uint64)
    final[0] = c0[:final_deg_len]
    final[1] = c1[:final_deg_len]
    tr.absorb(gf.from_u64(final.reshape(-1)))

    indices = tr.challenge_indices(1 << (params.log_domain - 1),
                                   params.num_queries)

    # openings: per layer, gather the queried fold pairs + sibling paths on
    # device and pull only those
    Q = params.num_queries
    pos = np.asarray(indices, np.int64)
    per_layer_data = []
    for li, layer in enumerate(layers):
        nl = 1 << (params.log_domain - li)
        i = pos % (nl // 2)
        v_l = layer["values"]
        pair_idx = np.concatenate([i, i + nl // 2])          # (2Q,)
        vals = gather_rows(GF2_rows(v_l), pair_idx)          # (2Q, 2) u64
        paths = gather_paths(layer["levels"], i)             # (Q, depth, 4)
        per_layer_data.append((i.copy(), vals, paths))
        pos = i
    openings = []
    for q in range(Q):
        per_layer = []
        for li, (i_arr, vals, paths) in enumerate(per_layer_data):
            pair = np.array(
                [[vals[q, 0], vals[q, 1]],
                 [vals[Q + q, 0], vals[Q + q, 1]]], dtype=np.uint64)
            per_layer.append(dict(pair=pair, path=paths[q]))
        openings.append(per_layer)

    return FriProof(
        caps=[l["cap"] for l in layers],
        final_poly=final,
        query_indices=indices,
        openings=openings,
    )


def GF2_rows(v: GF2) -> GF:
    """(n,) GF2 codeword viewed as (n, 2) GF rows [c0, c1] for gathers."""
    return GF(
        jnp.stack([v.c0.lo, v.c1.lo], axis=-1),
        jnp.stack([v.c0.hi, v.c1.hi], axis=-1),
    )


def _coset_coeffs(evals, shift):
    """evals on shift*H -> the polynomial's own coefficients (unshifted)."""
    coeffs = ntt.intt_ref(evals)
    s_inv = pow(shift, MODULUS - 2, MODULUS)
    return [c * pow(s_inv, i, MODULUS) % MODULUS for i, c in enumerate(coeffs)]


# ---------------------------------------------------------------------------
# verifier
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _merkle_check_fn():
    """Fused leaf-hash + batched path verification + AND-reduce (one jit
    specialization per (Q, depth) shape)."""
    import jax

    @jax.jit
    def run(leaves: GF, idxs, paths: GF, cap: GF):
        lh = merkle.hash_leaves(leaves)
        return merkle.verify_path(lh, idxs, paths, cap).all()

    return run


def verify(proof: FriProof, params: FriParams) -> bool:
    n_layers = params.log_domain - params.final_poly_log_len
    if len(proof.caps) != n_layers:
        return False
    tr = Transcript()
    betas = []
    for cap in proof.caps:
        tr.absorb(cap)
        b = tr.challenge_ext()
        betas.append(
            (int(np.asarray(b.c0.astype_u64())), int(np.asarray(b.c1.astype_u64())))
        )
    tr.absorb(gf.from_u64(np.asarray(proof.final_poly).reshape(-1)))
    expect_idx = tr.challenge_indices(1 << (params.log_domain - 1),
                                      params.num_queries)
    if expect_idx != list(proof.query_indices):
        return False

    # ---- batched Merkle authentication: ONE fused (hash_leaves +
    # verify_path + all) program per layer depth across all queries; the
    # booleans are stacked on device and pulled once ----
    Q = params.num_queries
    layer_oks = []
    for li in range(n_layers):
        log_nl = params.log_domain - li
        nl = 1 << log_nl
        depth = log_nl - 1 - params.cap_log2
        leaves = np.zeros((Q, 4), np.uint64)
        paths = np.zeros((Q, depth, 4), np.uint64)
        idxs = np.zeros(Q, np.uint32)
        for q, idx in enumerate(proof.query_indices):
            pos = idx
            for ll in range(li):
                pos = pos % ((1 << (params.log_domain - ll)) // 2)
            i = pos % (nl // 2)
            op = proof.openings[q][li]
            pair = np.asarray(op["pair"], dtype=np.uint64)
            leaves[q] = [pair[0, 0], pair[0, 1], pair[1, 0], pair[1, 1]]
            path = np.asarray(op["path"], np.uint64)
            if path.shape != (depth, 4):
                return False
            paths[q] = path
            idxs[q] = i
        layer_oks.append(_merkle_check_fn()(
            gf.from_u64(leaves), jnp.asarray(idxs), gf.from_u64(paths),
            proof.caps[li],
        ))
    oks = np.asarray(jnp.stack(layer_oks))
    if not bool(oks.all()):
        return False

    roots = {}
    for q, idx in enumerate(proof.query_indices):
        pos = idx
        shift = params.coset_shift
        prev_fold = None
        for li in range(n_layers):
            log_nl = params.log_domain - li
            nl = 1 << log_nl
            i = pos % (nl // 2)
            op = proof.openings[q][li]
            pair = np.asarray(op["pair"], dtype=np.uint64)
            a = (int(pair[0, 0]), int(pair[0, 1]))
            b = (int(pair[1, 0]), int(pair[1, 1]))
            # (Merkle authentication batched above)
            # the previous fold must reappear at its position in THIS layer
            if prev_fold is not None:
                expected = a if pos < nl // 2 else b
                if expected != prev_fold:
                    return False
            if log_nl not in roots:
                roots[log_nl] = ntt.root_of_unity(log_nl)
            x = shift * pow(roots[log_nl], i, MODULUS) % MODULUS
            x_inv = pow(x, MODULUS - 2, MODULUS)
            beta = betas[li]
            even = [(a[k] + b[k]) * _HALF % MODULUS for k in range(2)]
            odd = [
                (a[k] - b[k]) * _HALF % MODULUS * x_inv % MODULUS for k in range(2)
            ]
            bo0 = (beta[0] * odd[0] + gf2.W_NONRESIDUE * beta[1] * odd[1]) % MODULUS
            bo1 = (beta[0] * odd[1] + beta[1] * odd[0]) % MODULUS
            prev_fold = ((even[0] + bo0) % MODULUS, (even[1] + bo1) % MODULUS)
            shift = shift * shift % MODULUS
            pos = i
        # final: the last fold equals the final polynomial at its point of
        # the final coset shift_final * H_final
        log_f = params.final_poly_log_len
        if log_f not in roots:
            roots[log_f] = ntt.root_of_unity(log_f)
        x = shift * pow(roots[log_f], pos, MODULUS) % MODULUS
        if _eval_poly_ext(np.asarray(proof.final_poly), x) != prev_fold:
            return False
    return True
