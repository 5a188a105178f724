"""eip_4844 — blob polynomial-evaluation circuit (standalone).

Reference parity: `src/eip_4844/` (entry mod.rs:107-260) — 4096 x 31-byte
chunks (input.rs:26-27) interpreted as polynomial coefficients highest-degree
first; evaluation point z = keccak256(linear_hash || versioned_hash)
truncated to its last 16 bytes (mod.rs:157-174); Horner evaluation in the
BLS12-381 scalar field (17 x u16 limbs in the reference, mod.rs:40-42,
186-204); linear hash equality over the raw chunk bytes and an output
commitment keccak256(versioned_hash || truncated_hash || opening_value_be)
(mod.rs:206-242).  Scheduler integration is gated off upstream
(IMPLEMENT_4844_FUNCTIONALITY = false, scheduler/mod.rs:77) — standalone here
as well.

TPU design: rows = Horner steps.  Step i materializes t_i = acc_i + fe_i
(mod r) and acc_{i+1} = t_i * z (mod r), checked as batched integer
identities (ops/nonnative.py); the three keccak chains (blob linear hash,
challenge, output) are materialized block chains checked with the batched
keccak kernel.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import keccak, nonnative as nn

BLS_FR = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
ELEMENTS_PER_4844_BLOCK = 4096
CHUNK_BYTES = 31
RATE = keccak.KECCAK_RATE_BYTES


@dataclasses.dataclass(frozen=True)
class EIP4844Config:
    elements: int = ELEMENTS_PER_4844_BLOCK


def _fe_from_chunk_int(chunk_bytes: bytes) -> int:
    return int.from_bytes(chunk_bytes, "little")


def _keccak_chain_host(data: bytes):
    """padded blocks + state chain (host)."""
    padded = bytearray(data)
    pad_len = RATE - (len(padded) % RATE)
    if pad_len == 1:
        padded += b"\x81"
    else:
        padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80"
    nb = len(padded) // RATE
    blo = np.zeros((nb, 17), np.uint32)
    bhi = np.zeros((nb, 17), np.uint32)
    states = np.zeros((nb + 1, 25), np.uint64)
    cur = [0] * 25
    for b in range(nb):
        lanes = keccak.bytes_to_lanes(bytes(padded[b * RATE : (b + 1) * RATE]))
        cur = keccak.keccak_f1600_ref([cur[j] ^ (lanes[j] if j < 17 else 0) for j in range(25)])
        states[b + 1] = cur
        blo[b] = [l & 0xFFFFFFFF for l in lanes]
        bhi[b] = [l >> 32 for l in lanes]
    digest = b"".join(int(states[nb][j]).to_bytes(8, "little") for j in range(4))
    return blo, bhi, states, digest


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class EIP4844Witness:
    chunks: jnp.ndarray  # (E, 31) byte values
    fe: jnp.ndarray  # (E, 16) u16 limbs
    acc: jnp.ndarray  # (E+1, 16)
    t: jnp.ndarray  # (E, 16)  (acc_i + fe_i mod r)
    add_k: jnp.ndarray  # (E, 1) small quotients for the additions
    mul_q: jnp.ndarray  # (E, 17) quotients for t*z
    z: jnp.ndarray  # (16,) evaluation point limbs
    versioned_hash: jnp.ndarray  # (32,) bytes
    linear_hash: jnp.ndarray  # (32,)
    truncated: jnp.ndarray  # (16,)
    opening_be: jnp.ndarray  # (32,)
    output_hash: jnp.ndarray  # (32,)
    blob_blocks_lo: jnp.ndarray
    blob_blocks_hi: jnp.ndarray
    blob_states_lo: jnp.ndarray
    blob_states_hi: jnp.ndarray
    chal_states_lo: jnp.ndarray  # (2, 25)
    chal_states_hi: jnp.ndarray
    out_states_lo: jnp.ndarray
    out_states_hi: jnp.ndarray

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def generate_witness(chunks: list, versioned_hash: bytes, config: EIP4844Config) -> EIP4844Witness:
    E = config.elements
    data = list(chunks) + [b"\x00" * CHUNK_BYTES] * (E - len(chunks))
    assert all(len(c) == CHUNK_BYTES for c in data)
    blob = b"".join(data)
    blob_lo, blob_hi, blob_states, linear_hash = _keccak_chain_host(blob)
    chal_lo, chal_hi, chal_states, chal_digest = _keccak_chain_host(
        linear_hash + versioned_hash
    )
    truncated = chal_digest[16:]
    z = int.from_bytes(truncated, "big")

    fes = [_fe_from_chunk_int(c) for c in data]
    acc = [0]
    ts, ks, qs = [], [], []
    for i, fe in enumerate(fes):
        s = acc[-1] + fe
        k, t = divmod(s, BLS_FR)
        ts.append(t)
        ks.append(k)
        if i != E - 1:
            q, nxt = divmod(t * z, BLS_FR)
        else:
            q, nxt = 0, t
        qs.append(q)
        acc.append(nxt)
    y = acc[-1]
    opening_be = y.to_bytes(32, "big")
    out_lo, out_hi, out_states, output_hash = _keccak_chain_host(
        versioned_hash + truncated + opening_be
    )

    return EIP4844Witness(
        chunks=jnp.asarray(
            np.array([[b for b in c] for c in data], np.uint32)
        ),
        fe=jnp.asarray(nn.from_ints(fes)),
        acc=jnp.asarray(nn.from_ints(acc)),
        t=jnp.asarray(nn.from_ints(ts)),
        add_k=jnp.asarray(nn.from_ints(ks, 1)),
        mul_q=jnp.asarray(nn.from_ints(qs, 17)),
        z=jnp.asarray(nn.from_int(z)),
        versioned_hash=jnp.asarray(np.frombuffer(versioned_hash, np.uint8).astype(np.uint32)),
        linear_hash=jnp.asarray(np.frombuffer(linear_hash, np.uint8).astype(np.uint32)),
        truncated=jnp.asarray(np.frombuffer(truncated, np.uint8).astype(np.uint32)),
        opening_be=jnp.asarray(np.frombuffer(opening_be, np.uint8).astype(np.uint32)),
        output_hash=jnp.asarray(np.frombuffer(output_hash, np.uint8).astype(np.uint32)),
        blob_blocks_lo=jnp.asarray(blob_lo),
        blob_blocks_hi=jnp.asarray(blob_hi),
        blob_states_lo=jnp.asarray((blob_states & 0xFFFFFFFF).astype(np.uint32)),
        blob_states_hi=jnp.asarray((blob_states >> 32).astype(np.uint32)),
        chal_states_lo=jnp.asarray((chal_states & 0xFFFFFFFF).astype(np.uint32)),
        chal_states_hi=jnp.asarray((chal_states >> 32).astype(np.uint32)),
        out_states_lo=jnp.asarray((out_states & 0xFFFFFFFF).astype(np.uint32)),
        out_states_hi=jnp.asarray((out_states >> 32).astype(np.uint32)),
    )


def _digest_bytes(state_lo, state_hi):
    outs = []
    for lane in range(4):
        for part in (state_lo, state_hi):
            word = part[..., lane]
            for j in range(4):
                outs.append((word >> jnp.uint32(8 * j)) & jnp.uint32(0xFF))
    return jnp.stack(outs, axis=-1)


def eval_constraints(w: EIP4844Witness, config: EIP4844Config) -> dict:
    E = config.elements
    res = {}

    # witness limb/byte range checks: u16-limb identities in ops/nonnative
    # are exact only for limbs < 2^16 (and chunk bytes < 2^8), so every
    # witness-supplied column is range-checked before use
    res["limb_range"] = (
        nn.check_range(w.acc).all()
        & nn.check_range(w.t).all()
        & nn.check_range(w.mul_q).all()
        & nn.check_range(w.add_k).all()
        & nn.check_range(w.fe).all()
        & nn.check_range(w.z[None]).all()
        & (w.chunks <= 0xFF).all()
        & (w.truncated <= 0xFF).all()
        & (w.linear_hash <= 0xFF).all()
        & (w.versioned_hash <= 0xFF).all()
        & (w.opening_be <= 0xFF).all()
    )

    # field elements from chunk bytes (31 LE bytes -> 16 u16 limbs)
    by = w.chunks
    fe = jnp.zeros((E, 16), jnp.uint32)
    for j in range(16):
        lo = by[:, 2 * j]
        hi = by[:, 2 * j + 1] if 2 * j + 1 < CHUNK_BYTES else jnp.zeros(E, jnp.uint32)
        fe = fe.at[:, j].set(lo | (hi << 8))
    res["fe_from_chunks"] = (fe == w.fe).all(-1)

    rconst = jnp.broadcast_to(jnp.asarray(nn.from_int(BLS_FR)), (E, 16))
    # addition: acc_i + fe_i == t_i + k_i * r
    add_ok = nn.sides_equal(
        [("lin", w.acc[:-1], 1), ("lin", w.fe, 1)],
        [("lin", w.t, 1), ("prod", w.add_k, rconst, 1)],
        (E,),
    )
    res["horner_add"] = add_ok
    # multiply: t_i * z == q_i * r + acc_{i+1}  (all but the last step)
    zc = jnp.broadcast_to(w.z, (E, 16))
    mul_ok = nn.sides_equal(
        [("prod", w.t, zc, 1)],
        [("prod", w.mul_q, rconst, 1), ("lin", w.acc[1:], 1)],
        (E,),
    )
    is_last = jnp.arange(E) == E - 1
    res["horner_mul"] = jnp.where(is_last, True, mul_ok)
    res["horner_last"] = jnp.where(is_last, (w.t == w.acc[1:]).all(-1), True)
    res["acc_starts_zero"] = (w.acc[0] == 0).all()

    # blob keccak chain + linear hash
    exp_lo, exp_hi = keccak.absorb_block(
        w.blob_states_lo[:-1], w.blob_states_hi[:-1], w.blob_blocks_lo, w.blob_blocks_hi
    )
    res["blob_chain"] = (exp_lo == w.blob_states_lo[1:]).all(-1) & (
        exp_hi == w.blob_states_hi[1:]
    ).all(-1)
    res["linear_hash"] = (
        _digest_bytes(w.blob_states_lo[-1], w.blob_states_hi[-1]) == w.linear_hash
    ).all()
    # blob block bytes match chunk stream (+ padding)
    nb = w.blob_blocks_lo.shape[0]
    stream_len = E * CHUNK_BYTES
    total = nb * RATE
    idx = jnp.arange(total)
    flat = by.reshape(-1)
    flat = jnp.concatenate([flat, jnp.zeros(total - stream_len, jnp.uint32)])
    flat = jnp.where(idx == stream_len, 0x01, flat)
    flat = jnp.where(idx == total - 1, flat | 0x80, flat)
    sb = flat.reshape(nb, 17, 8)
    slo = sb[..., 0] | (sb[..., 1] << 8) | (sb[..., 2] << 16) | (sb[..., 3] << 24)
    shi = sb[..., 4] | (sb[..., 5] << 8) | (sb[..., 6] << 16) | (sb[..., 7] << 24)
    res["blob_blocks"] = (slo == w.blob_blocks_lo).all(-1) & (shi == w.blob_blocks_hi).all(-1)

    # challenge hash: keccak(linear_hash || versioned_hash), z = last 16 bytes BE
    def one_block(data_bytes):  # (64 or 80,) -> lanes
        n = data_bytes.shape[0]
        buf = jnp.zeros(RATE, jnp.uint32)
        buf = buf.at[:n].set(data_bytes)
        buf = buf.at[n].set(0x01)
        buf = buf.at[RATE - 1].set(buf[RATE - 1] | 0x80)
        bb = buf.reshape(17, 8)
        return (
            bb[:, 0] | (bb[:, 1] << 8) | (bb[:, 2] << 16) | (bb[:, 3] << 24),
            bb[:, 4] | (bb[:, 5] << 8) | (bb[:, 6] << 16) | (bb[:, 7] << 24),
        )

    cl, ch = one_block(jnp.concatenate([w.linear_hash, w.versioned_hash]))
    elo, ehi = keccak.absorb_block(
        w.chal_states_lo[0][None], w.chal_states_hi[0][None], cl[None], ch[None]
    )
    res["challenge_chain"] = (
        (w.chal_states_lo[0] == 0).all()
        & (elo[0] == w.chal_states_lo[1]).all()
        & (ehi[0] == w.chal_states_hi[1]).all()
    )
    chal_digest = _digest_bytes(w.chal_states_lo[1], w.chal_states_hi[1])
    res["truncated_hash"] = (chal_digest[16:] == w.truncated).all()
    # z limbs from BE truncated bytes
    zint = jnp.zeros(16, jnp.uint32)
    for i in range(16):  # byte i is most significant of the remaining
        limb = (15 - i) // 2
        shift = jnp.uint32(8 * ((15 - i) % 2))
        zint = zint.at[limb].add(w.truncated[i] << shift)
    res["z_limbs"] = (zint == w.z).all()

    # opening value BE serialization of acc_E
    acc_final = w.acc[E]
    ob = jnp.zeros(32, jnp.uint32)
    for i in range(32):
        limb = (31 - i) // 2
        shift = jnp.uint32(8 * ((31 - i) % 2))
        ob = ob.at[i].set((acc_final[limb] >> shift) & 0xFF)
    res["opening_serialization"] = (ob == w.opening_be).all()
    res["opening_canonical"] = nn.limbs_lt(acc_final[None], BLS_FR)[0]

    # output hash block
    ol, oh = one_block(
        jnp.concatenate([w.versioned_hash, w.truncated, w.opening_be])
    )
    flo, fhi = keccak.absorb_block(
        w.out_states_lo[0][None], w.out_states_hi[0][None], ol[None], oh[None]
    )
    res["output_chain"] = (
        (w.out_states_lo[0] == 0).all()
        & (flo[0] == w.out_states_lo[1]).all()
        & (fhi[0] == w.out_states_hi[1]).all()
    )
    res["output_hash"] = (
        _digest_bytes(w.out_states_lo[1], w.out_states_hi[1]) == w.output_hash
    ).all()
    return res


def all_ok(residuals: dict) -> bool:
    return all(bool(np.asarray(v).all()) for v in residuals.values())


eval_constraints_jit = jax.jit(eval_constraints, static_argnums=(1,))


def instance_compact_form(w: EIP4844Witness, config: EIP4844Config):
    """Single-instance ClosedFormInput (EIP4844OutputData: linear_hash +
    output_hash; observable input is () — ref eip_4844 mod.rs:143-155)."""
    import jax.numpy as jnp

    from .. import tables  # noqa: F401  (namespace consistency)
    from ..ops import gf as _gf
    from ..utils import protocol

    obs_in = _gf.zeros((1, 0))
    lh = _gf.from_u32(w.linear_hash.astype(jnp.uint32))
    oh = _gf.from_u32(w.output_hash.astype(jnp.uint32))
    obs_out = _gf.concat([lh, oh], axis=-1)[None]
    return protocol.single_instance_compact_form(obs_in, obs_out)
