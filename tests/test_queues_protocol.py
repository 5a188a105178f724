"""Queues, FS challenges, grand products, ClosedFormInput protocol."""

import numpy as np
import jax.numpy as jnp

from zkevm_circuits_tpu.ops import gf, queues
from zkevm_circuits_tpu.utils import challenges, protocol, queues_ref

P = gf.MODULUS
RNG = np.random.default_rng(0x0E5)


def rand(shape):
    return RNG.integers(0, P, size=shape, dtype=np.uint64)


def test_full_state_chain_matches_mirror():
    n = 6
    encs = rand((n, 8))
    execute = np.array([1, 1, 0, 1, 0, 1], dtype=bool)
    init = rand((12,))
    states = queues.simulate_chain(gf.from_u64(init), gf.from_u64(encs), jnp.asarray(execute))
    exp = queues_ref.simulate_chain([int(x) for x in init], encs.tolist(), execute.tolist())
    got = states.astype_u64()
    assert got.shape == (n + 1, 12)
    for i in range(n + 1):
        assert [int(x) for x in got[i]] == [x % P for x in exp[i]], i


def test_narrow_chain_matches_mirror():
    n = 4
    encs = rand((n, 20))  # LOG_QUERY_PACKED_WIDTH = 20
    init = rand((4,))
    states = queues.simulate_chain(gf.from_u64(init), gf.from_u64(encs))
    exp = queues_ref.simulate_chain([int(x) for x in init], encs.tolist())
    got = states.astype_u64()
    for i in range(n + 1):
        assert [int(x) for x in got[i]] == [x % P for x in exp[i]], i


def test_check_chain_parallel():
    n = 5
    encs = rand((n, 8))
    init = rand((12,))
    states = queues.simulate_chain(gf.from_u64(init), gf.from_u64(encs))
    ok = queues.check_chain(states, gf.from_u64(encs))
    assert np.asarray(ok).all()
    # corrupt one intermediate state -> that row and the next fail
    bad = states.astype_u64()
    bad[2, 3] ^= 1
    bad_states = gf.from_u64(bad)
    ok2 = np.asarray(queues.check_chain(bad_states, gf.from_u64(encs)))
    assert not ok2[1] and not ok2.all()


def test_fs_challenges_structure():
    uq = queues.QueueState(
        gf.from_u64(rand((12,))), gf.from_u64(rand((12,))), jnp.uint32(10)
    )
    sq = queues.QueueState(
        gf.from_u64(rand((12,))), gf.from_u64(rand((12,))), jnp.uint32(10)
    )
    ch = challenges.produce_fs_challenges(uq, sq, num_challenges=9, num_repetitions=2)
    arr = ch.astype_u64()
    assert arr.shape == (2, 9)
    assert arr[0, 0] == 1 and arr[1, 0] == 1
    # deterministic
    ch2 = challenges.produce_fs_challenges(uq, sq, num_challenges=9, num_repetitions=2)
    np.testing.assert_array_equal(arr, ch2.astype_u64())
    # distinct nontrivial values
    assert len({int(x) for x in arr.flatten()}) > 10


def test_grand_product_matches_sequential():
    n, enc_len, reps = 33, 8, 2
    encs = rand((n, enc_len))
    ch = rand((reps, enc_len + 1))
    should = RNG.integers(0, 2, size=n).astype(bool)
    factors = challenges.grand_product_factors(gf.from_u64(encs), gf.from_u64(ch))
    masked = challenges.masked_factors(factors, jnp.asarray(should))
    init = gf.ones((reps,))
    running = challenges.product_accumulate(masked, init).astype_u64()
    final = challenges.final_product(masked, init).astype_u64()

    acc = [1] * reps
    seq = []
    for i in range(n):
        for r in range(reps):
            if should[i]:
                contrib = int(ch[r][enc_len])
                for j in range(enc_len):
                    contrib = (contrib + int(encs[i][j]) * int(ch[r][j])) % P
                acc[r] = acc[r] * contrib % P
        seq.append(list(acc))
    for i in range(n):
        assert [int(x) for x in running[i]] == seq[i], i
    assert [int(x) for x in final] == seq[-1]


def test_compact_form_masking():
    batch = 3
    enc = lambda L: gf.from_u64(rand((batch, L)))
    start = jnp.asarray([True, False, False])
    complete = jnp.asarray([False, False, True])
    cf = protocol.compact_form_from_parts(
        start, complete, enc(5), enc(7), enc(11), enc(11)
    )
    z = np.zeros(4, dtype=np.uint64)
    fsm_in = cf.hidden_fsm_input_commitment.astype_u64()
    fsm_out = cf.hidden_fsm_output_commitment.astype_u64()
    obs_out = cf.observable_output_commitment.astype_u64()
    obs_in = cf.observable_input_commitment.astype_u64()
    # start instance: fsm_in zeroed; non-start: not zero
    np.testing.assert_array_equal(fsm_in[0], z)
    assert (fsm_in[1] != 0).any()
    # only completed instance exposes observable output
    np.testing.assert_array_equal(obs_out[0], z)
    np.testing.assert_array_equal(obs_out[1], z)
    assert (obs_out[2] != 0).any()
    # completed instance hides fsm_out
    np.testing.assert_array_equal(fsm_out[2], z)
    assert (fsm_out[0] != 0).any()
    # observable input never masked
    assert (obs_in != 0).any(axis=1).all()
    # commitment is 4 lanes per instance
    assert cf.commitment().astype_u64().shape == (batch, 4)


def test_instance_chaining():
    n = 4
    fsm_out = gf.from_u64(rand((n, 4)))
    # build a consistent chain: fsm_in[k+1] = fsm_out[k]
    fsm_in_arr = np.roll(fsm_out.astype_u64(), 1, axis=0)
    fsm_in = gf.from_u64(fsm_in_arr)
    start = jnp.asarray([True, False, False, False])
    complete = jnp.asarray([False, False, False, True])
    res = protocol.check_instance_chaining(start, complete, fsm_in, fsm_out)
    assert np.asarray(res["first_starts"]).all()
    assert np.asarray(res["chained"]).all()
    assert np.asarray(res["fsm_handoff"]).all()
    # break the handoff
    bad_in = fsm_in_arr.copy()
    bad_in[2, 0] ^= 1
    res2 = protocol.check_instance_chaining(start, complete, gf.from_u64(bad_in), fsm_out)
    assert not np.asarray(res2["fsm_handoff"]).all()
