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


class Transcript:
    def __init__(self):
        self._state = gf.zeros((4,))

    def absorb(self, lanes: GF):
        flat = lanes.reshape(-1)
        self._state = poseidon2.hash_padded(
            gf.concat([self._state, flat], axis=-1), length_specialize=True
        )

    def challenge_ext(self) -> GF2:
        self._state = poseidon2.hash_padded(self._state, length_specialize=False)
        return GF2(self._state[0], self._state[1])

    def challenge_index(self, bound: int) -> int:
        self._state = poseidon2.hash_padded(self._state, length_specialize=False)
        v = int(np.asarray(self._state[0].astype_u64()))
        return v % bound


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


@functools.lru_cache(maxsize=1)
def _layer_commit_fn():
    """One fused device program per layer shape: leaves + full tree, with
    every level flattened into ONE array (a single host pull per layer —
    per-level pulls each cost a tunnel round trip on the axon TPU)."""
    import jax

    @functools.partial(jax.jit, static_argnames=("cap_log2",))
    def run(v: GF2, cap_log2: int):
        leaves = _layer_leaves(v)
        lh = merkle.hash_leaves(leaves)
        levels = merkle.tree_levels(lh, cap_log2)
        flat = gf.concat(levels, axis=0)
        return flat, levels[-1]

    return run


def _layer_commit_jit(v: GF2, cap_log2: int):
    return _layer_commit_fn()(v, cap_log2=cap_log2)


@functools.lru_cache(maxsize=None)
def _fold_jit():
    import jax

    return functools.partial(
        jax.jit, static_argnames=("log_n", "shift")
    )(_fold)


def _split_levels(flat_np: np.ndarray, n_leaves: int, cap_log2: int):
    out = []
    size = n_leaves
    off = 0
    while size >= (1 << cap_log2):
        out.append(flat_np[off : off + size])
        off += size
        if size == (1 << cap_log2):
            break
        size //= 2
    return out


def prove(codeword: GF, params: FriParams) -> FriProof:
    """codeword: (n,) base-field evaluations on the coset shift*H."""
    n = 1 << params.log_domain
    assert codeword.shape == (n,)
    v = gf2.from_base(codeword)
    shift = params.coset_shift
    log_n = params.log_domain
    tr = Transcript()

    layers = []     # (values GF2, leaf_hashes GF, levels, cap)
    betas = []
    while log_n > params.final_poly_log_len:
        flat, cap = _layer_commit_jit(v, params.cap_log2)
        # two host pulls per layer: the codeword pair and the whole tree
        vals_np = np.stack(
            [np.asarray(v.c0.astype_u64()), np.asarray(v.c1.astype_u64())]
        )
        levels_np = _split_levels(
            np.asarray(flat.astype_u64()), 1 << (log_n - 1), params.cap_log2
        )
        layers.append(
            dict(values=vals_np, levels=levels_np, cap=cap)
        )
        tr.absorb(cap)
        beta = tr.challenge_ext()
        betas.append(beta)
        v = _fold_jit()(v, beta, log_n=log_n, shift=shift)
        shift = shift * shift % MODULUS
        log_n -= 1

    # final polynomial COEFFICIENTS (degree < final_len/blowup): derived by
    # interpolating the last codeword on its coset and unshifting; an honest
    # low-degree codeword leaves the high coefficients zero (asserted)
    final_deg_len = 1 << max(params.final_poly_log_len - params.log_blowup, 0)
    c0 = _coset_coeffs([int(x) for x in np.asarray(v.c0.astype_u64())], shift)
    c1 = _coset_coeffs([int(x) for x in np.asarray(v.c1.astype_u64())], shift)
    assert all(c == 0 for c in c0[final_deg_len:]), "codeword not low degree"
    assert all(c == 0 for c in c1[final_deg_len:]), "codeword not low degree"
    final = np.zeros((2, final_deg_len), dtype=np.uint64)
    final[0] = c0[:final_deg_len]
    final[1] = c1[:final_deg_len]
    tr.absorb(gf.from_u64(final.reshape(-1)))

    # queries: pair indices at layer 0
    indices = [
        tr.challenge_index(1 << (params.log_domain - 1))
        for _ in range(params.num_queries)
    ]
    openings = []
    for idx in indices:
        per_layer = []
        pos = idx  # position of the previous fold inside the current layer
        for li, layer in enumerate(layers):
            nl = 1 << (params.log_domain - li)
            i = pos % (nl // 2)
            vals = layer["values"]
            pair = np.array(
                [[vals[0, i], vals[1, i]],
                 [vals[0, i + nl // 2], vals[1, i + nl // 2]]],
                dtype=np.uint64,
            )
            per_layer.append(
                dict(pair=pair, path=_open_path_np(layer["levels"], i))
            )
            pos = i
        openings.append(per_layer)

    return FriProof(
        caps=[l["cap"] for l in layers],
        final_poly=final,
        query_indices=indices,
        openings=openings,
    )


def _coset_coeffs(evals, shift):
    """evals on shift*H -> the polynomial's own coefficients (unshifted)."""
    coeffs = ntt.intt_ref(evals)
    s_inv = pow(shift, MODULUS - 2, MODULUS)
    return [c * pow(s_inv, i, MODULUS) % MODULUS for i, c in enumerate(coeffs)]


# ---------------------------------------------------------------------------
# verifier
# ---------------------------------------------------------------------------


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
    expect_idx = [
        tr.challenge_index(1 << (params.log_domain - 1))
        for _ in range(params.num_queries)
    ]
    if expect_idx != list(proof.query_indices):
        return False

    # ---- batched Merkle authentication: ONE hash_leaves + verify_path per
    # LAYER across all queries (per-query device calls each cost a tunnel
    # round trip; 20 queries x 16 layers was the verify wall-time) ----
    Q = params.num_queries
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
        lh = merkle.hash_leaves(gf.from_u64(leaves))
        okm = merkle.verify_path(
            lh, jnp.asarray(idxs), gf.from_u64(paths), proof.caps[li]
        )
        if not bool(np.asarray(okm).all()):
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
