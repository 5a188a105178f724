"""keccak-f1600 / sha256 / blake2s: device batch vs host mirrors vs stdlib."""

import hashlib

import numpy as np
import jax.numpy as jnp

from zkevm_circuits_tpu.ops import blake2s, keccak, sha256

RNG = np.random.default_rng(0x8A5)


def test_keccak256_known_vectors():
    assert keccak.keccak256_ref(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak.keccak256_ref(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_keccak_f1600_batch_matches_ref():
    batch = 5
    states = RNG.integers(0, 1 << 64, size=(batch, 25), dtype=np.uint64)
    lo = jnp.asarray((states & 0xFFFFFFFF).astype(np.uint32))
    hi = jnp.asarray((states >> 32).astype(np.uint32))
    olo, ohi = keccak.keccak_f1600(lo, hi)
    out = np.asarray(olo, dtype=np.uint64) | (np.asarray(ohi, dtype=np.uint64) << 32)
    for b in range(batch):
        exp = keccak.keccak_f1600_ref([int(x) for x in states[b]])
        assert [int(x) for x in out[b]] == exp, b


def test_keccak_absorb_block():
    data = bytes(range(136))
    lanes = keccak.bytes_to_lanes(data)
    # host: xor into zero state + permute
    exp = keccak.keccak_f1600_ref(lanes + [0] * 8)
    lo = jnp.zeros((1, 25), jnp.uint32)
    hi = jnp.zeros((1, 25), jnp.uint32)
    bl = jnp.asarray([[l & 0xFFFFFFFF for l in lanes]], dtype=jnp.uint32)
    bh = jnp.asarray([[l >> 32 for l in lanes]], dtype=jnp.uint32)
    olo, ohi = keccak.absorb_block(lo, hi, bl, bh)
    out = np.asarray(olo[0], dtype=np.uint64) | (np.asarray(ohi[0], dtype=np.uint64) << 32)
    assert [int(x) for x in out] == exp


def test_sha256_ref_vs_hashlib():
    for msg in [b"", b"abc", b"x" * 55, b"y" * 64, b"z" * 200]:
        assert sha256.sha256_ref(msg) == hashlib.sha256(msg).digest()


def test_sha256_batch_matches_ref():
    batch = 4
    states = RNG.integers(0, 1 << 32, size=(batch, 8), dtype=np.uint32)
    blocks = RNG.integers(0, 1 << 32, size=(batch, 16), dtype=np.uint32)
    out = np.asarray(sha256.compress(jnp.asarray(states), jnp.asarray(blocks)))
    for b in range(batch):
        exp = sha256.compress_ref([int(x) for x in states[b]], [int(x) for x in blocks[b]])
        assert [int(x) for x in out[b]] == exp, b


def test_blake2s_ref_vs_hashlib():
    for msg in [b"", b"abc", b"q" * 64, b"w" * 65, b"e" * 200]:
        assert blake2s.blake2s_ref(msg) == hashlib.blake2s(msg).digest(), msg


def test_blake2s_batch_matches_ref():
    batch = 4
    states = RNG.integers(0, 1 << 32, size=(batch, 8), dtype=np.uint32)
    blocks = RNG.integers(0, 1 << 32, size=(batch, 16), dtype=np.uint32)
    out = np.asarray(blake2s.compress(jnp.asarray(states), jnp.asarray(blocks), 64, False))
    for b in range(batch):
        exp = blake2s.compress_ref(
            [int(x) for x in states[b]], [int(x) for x in blocks[b]], 64, False
        )
        assert [int(x) for x in out[b]] == exp, b
    # last-block flag changes the output
    out2 = np.asarray(blake2s.compress(jnp.asarray(states), jnp.asarray(blocks), 64, True))
    assert (out2 != out).any()
