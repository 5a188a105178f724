"""code_unpacker_sha256 circuit tests."""

import numpy as np

from zkevm_circuits_tpu.models import code_unpacker_sha256 as cu

CFG = cu.CodeUnpackerConfig(max_rounds=8)


def make_code(n_words, seed=1):
    return [(seed * 0x0101010101 + i * 7919) % (1 << 256) for i in range(n_words)]


def test_single_request():
    words = make_code(3)  # odd length
    req = cu.make_request(words, page=500, timestamp=40)
    store = {int(req["code_hash"]): words}
    w = cu.generate_witness([req], store, CFG)
    res = cu.eval_constraints_jit(w, CFG)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    # 3 words -> 2 rounds, 3 memory writes executed
    assert int(np.asarray(w.round_execute).sum()) == 2
    assert int(np.asarray(w.write_execute).sum()) == 3


def test_two_requests():
    w1 = make_code(1, seed=2)
    w2 = make_code(5, seed=3)
    r1 = cu.make_request(w1, page=500, timestamp=40)
    r2 = cu.make_request(w2, page=501, timestamp=50)
    store = {int(r1["code_hash"]): w1, int(r2["code_hash"]): w2}
    w = cu.generate_witness([r1, r2], store, CFG)
    res = cu.eval_constraints_jit(w, CFG)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    assert int(np.asarray(w.round_execute).sum()) == 1 + 3


def test_wrong_code_rejected():
    """code words not matching the requested hash -> hash_equality fails."""
    import dataclasses as dc
    import jax.numpy as jnp

    words = make_code(3)
    req = cu.make_request(words, page=500, timestamp=40)
    store = {int(req["code_hash"]): words}
    w = cu.generate_witness([req], store, CFG)
    bad = np.asarray(w.word0).copy()
    bad[0, 0] ^= 1
    wb = dc.replace(w, word0=jnp.asarray(bad))
    res = cu.eval_constraints_jit(wb, CFG)
    # either the block construction or (after recompute) the hash fails
    ok_all = all(bool(np.asarray(v).all()) for v in res.values())
    assert not ok_all


def test_bad_version_rejected():
    words = make_code(3)
    req = cu.make_request(words, page=500, timestamp=40)
    req["code_hash"] = int(req["code_hash"]) ^ (0xFF << 248)  # corrupt version byte
    store = {int(req["code_hash"]): words}
    # witness gen reads length from the hash, still 3
    w = cu.generate_witness([req], store, CFG)
    res = cu.eval_constraints_jit(w, CFG)
    assert not bool(np.asarray(res["versioned_hash"]).all())
