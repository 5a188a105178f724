"""eip_4844 blob circuit tests (small element count)."""

import numpy as np

from zkevm_circuits_tpu.models import eip_4844 as e4
from zkevm_circuits_tpu.ops.keccak import keccak256_ref

CFG = e4.EIP4844Config(elements=8)


def test_blob_evaluation():
    chunks = [bytes([i + 1] * 31) for i in range(3)]
    vh = bytes(range(32))
    w = e4.generate_witness(chunks, vh, CFG)
    res = e4.eval_constraints_jit(w, CFG)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    # linear hash matches host keccak of the padded blob
    blob = b"".join(chunks) + b"\x00" * 31 * (CFG.elements - len(chunks))
    assert bytes(int(b) for b in np.asarray(w.linear_hash)) == keccak256_ref(blob)
    # Horner result matches a direct polynomial evaluation (highest-degree first)
    z = int.from_bytes(keccak256_ref(keccak256_ref(blob) + vh)[16:], "big")
    coeffs = [int.from_bytes(blob[31 * i : 31 * i + 31], "little") for i in range(CFG.elements)]
    y = 0
    for i, c in enumerate(coeffs):
        y = (y + c) % e4.BLS_FR
        if i != CFG.elements - 1:
            y = y * z % e4.BLS_FR
    acc_final = np.asarray(w.acc)[-1]
    got = sum(int(l) << (16 * i) for i, l in enumerate(acc_final))
    assert got == y
    # output hash formula
    expected_out = keccak256_ref(vh + z.to_bytes(16, "big") + y.to_bytes(32, "big"))
    assert bytes(int(b) for b in np.asarray(w.output_hash)) == expected_out


def test_tampered_coefficient_rejected():
    import dataclasses as dc
    import jax.numpy as jnp

    chunks = [bytes([7] * 31)]
    w = e4.generate_witness(chunks, bytes(32), CFG)
    bad = np.asarray(w.fe).copy()
    bad[0, 0] ^= 1
    wb = dc.replace(w, fe=jnp.asarray(bad))
    res = e4.eval_constraints_jit(wb, CFG)
    ok_all = all(bool(np.asarray(v).all()) for v in res.values())
    assert not ok_all


def test_tampered_opening_rejected():
    import dataclasses as dc
    import jax.numpy as jnp

    chunks = [bytes([9] * 31)]
    w = e4.generate_witness(chunks, bytes(32), CFG)
    bad = np.asarray(w.acc).copy()
    bad[-1, 0] ^= 1
    wb = dc.replace(w, acc=jnp.asarray(bad))
    res = e4.eval_constraints_jit(wb, CFG)
    ok_all = all(bool(np.asarray(v).all()) for v in res.values())
    assert not ok_all
