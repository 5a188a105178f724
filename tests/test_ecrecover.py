"""ecrecover circuit: nonnative checker units + full recovery + exceptions."""

import dataclasses as dc

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
    assert s < er.HALF_N
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


def _memory_for(digest, v, r, s, page=80):
    return {
        (page, 0): digest.to_bytes(32, "big"),
        (page, 1): v.to_bytes(32, "big"),
        (page, 2): r.to_bytes(32, "big"),
        (page, 3): s.to_bytes(32, "big"),
    }


def _witness_for_signature(priv=0xC0FFEE, k=0xBADC0DE, digest=0xDEADBEEF << 128):
    r, s, recid = ec.sign(digest, priv, k=k)
    memory = _memory_for(digest, recid, r, s)
    return er.generate_witness([make_call()], memory, CFG), priv


def _assert_all_ok(res):
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name


def test_full_recovery_circuit():
    w, priv = _witness_for_signature()
    res = er.eval_constraints_jit(w, CFG)
    _assert_all_ok(res)
    # recovered address matches the signer's address
    pub = ec.mul(priv, (ec.GX, ec.GY))
    expected = ec.eth_address(pub)
    limbs = np.asarray(w.addresses)[0]
    got = sum(int(l) << (32 * i) for i, l in enumerate(limbs))
    assert got == expected
    # the address write carries it
    assert sum(
        int(l) << (32 * i) for i, l in enumerate(np.asarray(w.writes.value)[1])
    ) == expected


def test_invalid_signature_masked():
    """r out of range -> success=0, address=0, constraints still satisfied."""
    memory = _memory_for(123, 0, ec.N, 5)  # r == n: zero mod n
    w = er.generate_witness([make_call()], memory, CFG)
    res = er.eval_constraints_jit(w, CFG)
    _assert_all_ok(res)
    assert int(np.asarray(w.scalars["call_valid"])[0]) == 0
    assert int(np.asarray(w.writes.value)[0][0]) == 0  # success word = 0
    assert (np.asarray(w.writes.value)[1] == 0).all()  # address word = 0

    # probe: claiming validity for the zero-mod-n r must be rejected
    sc = dict(w.scalars)
    sc["call_valid"] = jnp.ones_like(w.scalars["call_valid"])
    wb = dc.replace(w, scalars=sc)
    res2 = er.eval_constraints_jit(wb, CFG)
    assert not bool(np.asarray(res2["call_valid_binding"]).all())


def test_high_s_rejected():
    """the s >= (n-1)/2 convention check (new_optimized.rs:927-932)."""
    r, s, recid = ec.sign(0xFEED << 64, 0xC0FFEE, k=0x1234567)
    memory = _memory_for(0xFEED << 64, (recid ^ 1), r, ec.N - s)
    w = er.generate_witness([make_call()], memory, CFG)
    res = er.eval_constraints_jit(w, CFG)
    _assert_all_ok(res)
    assert int(np.asarray(w.scalars["call_valid"])[0]) == 0
    assert not bool(np.asarray(w.step_execute).any())  # ladder gated off


def test_nonresidue_lift_failure_proven():
    """r whose x^3+7 is a QNR: masked, with the w^2 == -t certificate."""
    # find a small r with t a non-residue
    r = None
    for cand in range(2, 200):
        t = (cand ** 3 + ec.B) % ec.P
        if pow(t, (ec.P - 1) // 2, ec.P) == ec.P - 1:
            r = cand
            break
    assert r is not None
    memory = _memory_for(123, 0, r, 5)
    w = er.generate_witness([make_call()], memory, CFG)
    res = er.eval_constraints_jit(w, CFG)
    _assert_all_ok(res)
    assert int(np.asarray(w.scalars["call_valid"])[0]) == 0
    assert int(np.asarray(w.scalars["nonres"])[0]) == 1

    # probe: claiming non-residue for a liftable r must fail the certificate
    w2, _ = _witness_for_signature()
    sc = dict(w2.scalars)
    sc["nonres"] = jnp.ones_like(w2.scalars["nonres"])
    wb = dc.replace(w2, scalars=sc)
    res2 = er.eval_constraints_jit(wb, CFG)
    bad = not bool(np.asarray(res2["nonres_cert"]).all()) or not bool(
        np.asarray(res2["step_execute_binding"]).all()
    )
    assert bad


def test_forged_r_point_rejected():
    """the R point must be bound to the signature's r (rx == r)."""
    w, _ = _witness_for_signature()
    pt = dict(w.points)
    # substitute a different valid curve point (2*G)
    twoG = ec.double((ec.GX, ec.GY))
    bad = np.asarray(pt["rx"]).copy()
    bad[0] = nn.from_int(twoG[0])
    pt["rx"] = jnp.asarray(bad)
    wb = dc.replace(w, points=pt)
    res = er.eval_constraints_jit(wb, CFG)
    assert not bool(np.asarray(res["rx_binding"]).all())


def test_wrong_parity_rejected():
    """ry with the wrong parity for the v word is rejected."""
    w, _ = _witness_for_signature()
    pt = dict(w.points)
    ry = nn.to_int(np.asarray(pt["ry"])[0])
    bad = np.asarray(pt["ry"]).copy()
    bad[0] = nn.from_int(ec.P - ry)
    pt["ry"] = jnp.asarray(bad)
    wb = dc.replace(w, points=pt)
    res = er.eval_constraints_jit(wb, CFG)
    ok_all = all(bool(np.asarray(v).all()) for v in res.values())
    assert not ok_all


def test_scalars_bound_to_reads():
    """the r scalar must match the memory-read tape."""
    w, _ = _witness_for_signature()
    sc = dict(w.scalars)
    bad = np.asarray(sc["r"]).copy()
    bad[0, 0] ^= 1
    sc["r"] = jnp.asarray(bad)
    wb = dc.replace(w, scalars=sc)
    res = er.eval_constraints_jit(wb, CFG)
    assert not bool(np.asarray(res["reads_bind_scalars"]).all())


def test_limb_range_enforced():
    """witness limbs above 2^16 are rejected (overflow-forgery guard)."""
    w, _ = _witness_for_signature()
    sc = dict(w.scalars)
    bad = np.asarray(sc["u1"]).copy()
    bad[0, 3] += 1 << 16
    sc["u1"] = jnp.asarray(bad)
    wb = dc.replace(w, scalars=sc)
    res = er.eval_constraints_jit(wb, CFG)
    assert not bool(np.asarray(res["limb_range"]).all())


def test_mem_abi_binding():
    """read rows must sit at the ABI-derived page/offset."""
    w, _ = _witness_for_signature()
    reads = dc.replace(
        w.reads, index=jnp.asarray(np.asarray(w.reads.index) + 1)
    )
    wb = dc.replace(w, reads=reads)
    res = er.eval_constraints_jit(wb, CFG)
    assert not bool(np.asarray(res["reads_abi"]).all())


def test_tampered_ladder_rejected():
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
    w, _ = _witness_for_signature()
    steps = dict(w.steps)
    bad = np.asarray(steps["bit"]).copy()
    bad[3] ^= 1
    steps["bit"] = jnp.asarray(bad)
    wb = dc.replace(w, steps=steps)
    res = er.eval_constraints_jit(wb, CFG)
    assert not bool(np.asarray(res["scalar_bits"]).all())


def test_gated_off_ladder_rejected():
    """forcing step_execute off while claiming validity must fail."""
    w, _ = _witness_for_signature()
    wb = dc.replace(w, step_execute=jnp.zeros_like(w.step_execute))
    res = er.eval_constraints_jit(wb, CFG)
    assert not bool(np.asarray(res["step_execute_binding"]).all())


def test_zero_message_hash_allowed():
    """h == 0 is allowed (ALLOW_ZERO_MESSAGE, new_optimized.rs:53):
    u1 == 0, acc1 is infinity, Q == u2*R."""
    priv, k = 0xC0FFEE, 0xBADC0DE
    r, s, recid = ec.sign(0, priv, k=k)
    memory = _memory_for(0, recid, r, s)
    w = er.generate_witness([make_call()], memory, CFG)
    res = er.eval_constraints_jit(w, CFG)
    _assert_all_ok(res)
    assert int(np.asarray(w.scalars["call_valid"])[0]) == 1
    # recovered = r^{-1} * s * R
    r_inv = pow(r, ec.N - 2, ec.N)
    R = ec.lift_x(r, odd=bool(recid & 1))
    Q = ec.mul(s * r_inv % ec.N, R)
    limbs = np.asarray(w.addresses)[0]
    got = sum(int(l) << (32 * i) for i, l in enumerate(limbs))
    assert got == ec.eth_address(Q)
