"""ecrecover circuit: nonnative checker units + full recovery."""

import numpy as np
import jax.numpy as jnp

from zkevm_circuits_tpu.isa.system_params import (
    ECRECOVER_PRECOMPILE_FORMAL_ADDRESS,
    PRECOMPILE_AUX_BYTE,
)
from zkevm_circuits_tpu.models import ecrecover as er
from zkevm_circuits_tpu.ops import nonnative as nn, secp256k1 as ec

RNG = np.random.default_rng(0xEC)


def test_check_mulmod():
    mod = ec.P
    a = int(RNG.integers(0, 1 << 62)) ** 4 % (1 << 256)
    b = int(RNG.integers(0, 1 << 62)) ** 4 % (1 << 256)
    q, r = nn.mulmod_witness(a, b, mod)
    ok = nn.check_mulmod(
        jnp.asarray(nn.from_ints([a])),
        jnp.asarray(nn.from_ints([b])),
        jnp.asarray(nn.from_ints([q], 17)),
        jnp.asarray(nn.from_ints([r])),
        mod,
    )
    assert bool(np.asarray(ok)[0])
    # wrong remainder rejected
    ok2 = nn.check_mulmod(
        jnp.asarray(nn.from_ints([a])),
        jnp.asarray(nn.from_ints([b])),
        jnp.asarray(nn.from_ints([q], 17)),
        jnp.asarray(nn.from_ints([(r + 1) % mod])),
        mod,
    )
    assert not bool(np.asarray(ok2)[0])


def test_host_sign_recover_roundtrip():
    priv = 0xC0FFEE
    pub = ec.mul(priv, (ec.GX, ec.GY))
    digest = 0x1234567890ABCDEF << 64
    r, s, recid = ec.sign(digest, priv, k=0xBADC0DE)
    Q = ec.recover(digest, r, s, recid)
    assert Q == pub


def make_call(in_off=0, out_off=10, in_page=80, out_page=81, ts=300):
    key = in_off | (out_off << 64) | (in_page << 128) | (out_page << 160)
    return dict(
        address=ECRECOVER_PRECOMPILE_FORMAL_ADDRESS, key=key, read_value=0,
        written_value=0, aux_byte=PRECOMPILE_AUX_BYTE, rw_flag=True,
        rollback=False, is_service=False, shard_id=0, tx_number_in_block=1,
        timestamp=ts,
    )


CFG = er.EcrecoverConfig(max_calls=1)


def _witness_for_signature(priv=0xC0FFEE, k=0xBADC0DE, digest=0xDEADBEEF << 128):
    r, s, recid = ec.sign(digest, priv, k=k)
    memory = {
        (80, 0): digest.to_bytes(32, "big"),
        (80, 1): (27 + recid).to_bytes(32, "big"),
        (80, 2): r.to_bytes(32, "big"),
        (80, 3): s.to_bytes(32, "big"),
    }
    return er.generate_witness([make_call()], memory, CFG), priv


def test_full_recovery_circuit():
    w, priv = _witness_for_signature()
    res = er.eval_constraints_jit(w, CFG)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    # recovered address matches the signer's address
    pub = ec.mul(priv, (ec.GX, ec.GY))
    expected = ec.eth_address(pub)
    got = nn.to_int(
        np.asarray(w.addresses)[0].astype(np.uint64)
        .view(np.uint64) if False else 0
    )
    limbs = np.asarray(w.addresses)[0]
    got = sum(int(l) << (32 * i) for i, l in enumerate(limbs))
    assert got == expected
    # the address write carries it
    assert sum(
        int(l) << (32 * i) for i, l in enumerate(np.asarray(w.writes.value)[1])
    ) == expected


def test_invalid_signature_masked():
    """r out of range -> success=0, address=0, constraints still satisfied."""
    memory = {
        (80, 0): (123).to_bytes(32, "big"),
        (80, 1): (27).to_bytes(32, "big"),
        (80, 2): ec.N.to_bytes(32, "big"),  # r == n: out of range
        (80, 3): (5).to_bytes(32, "big"),
    }
    w = er.generate_witness([make_call()], memory, CFG)
    res = er.eval_constraints_jit(w, CFG)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    assert int(np.asarray(w.scalars["call_valid"])[0]) == 0
    assert int(np.asarray(w.writes.value)[0][0]) == 0  # success word = 0
    assert (np.asarray(w.writes.value)[1] == 0).all()  # address word = 0

    # probe: claiming validity for the out-of-range r must be rejected
    import dataclasses as dc

    sc = dict(w.scalars)
    sc["call_valid"] = jnp.ones_like(w.scalars["call_valid"])
    wb = dc.replace(w, scalars=sc)
    res2 = er.eval_constraints_jit(wb, CFG)
    assert not bool(np.asarray(res2["validity_range_flags"]).all())


def test_tampered_ladder_rejected():
    import dataclasses as dc

    w, _ = _witness_for_signature()
    steps = dict(w.steps)
    bad = np.asarray(steps["acc_nx"]).copy()
    row = int(np.flatnonzero(np.asarray(w.steps["bit"]) == 1)[5])
    bad[row, 0] ^= 1
    steps["acc_nx"] = jnp.asarray(bad)
    wb = dc.replace(w, steps=steps)
    res = er.eval_constraints_jit(wb, CFG)
    ok_all = all(bool(np.asarray(v).all()) for v in res.values())
    assert not ok_all


def test_wrong_scalar_bits_rejected():
    import dataclasses as dc

    w, _ = _witness_for_signature()
    steps = dict(w.steps)
    bad = np.asarray(steps["bit"]).copy()
    bad[3] ^= 1
    steps["bit"] = jnp.asarray(bad)
    wb = dc.replace(w, steps=steps)
    res = er.eval_constraints_jit(wb, CFG)
    assert not bool(np.asarray(res["scalar_bits"]).all())
