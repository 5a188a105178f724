"""demux routing AIR (prover/demux_air.py): honest accept + routing tamper
rejections.  Reference relation: `src/demux_log_queue/mod.rs:279-310`."""

import numpy as np
import pytest

from zkevm_circuits_tpu.isa import system_params as sp
from zkevm_circuits_tpu.prover import demux_air as da


def _queries():
    qs = []
    # one element per family + one porter-shard storage log (routes nowhere)
    qs.append(dict(address=0x8002, key=5, read_value=1, written_value=2,
                   rw_flag=True, aux_byte=sp.STORAGE_AUX_BYTE, rollback=False,
                   is_service=False, shard_id=0, tx_number_in_block=0,
                   timestamp=21))
    qs.append(dict(address=0x8002, key=6, read_value=0, written_value=3,
                   rw_flag=True, aux_byte=sp.EVENT_AUX_BYTE, rollback=False,
                   is_service=True, shard_id=0, tx_number_in_block=1,
                   timestamp=25))
    qs.append(dict(address=0x8002, key=7, read_value=0, written_value=4,
                   rw_flag=True, aux_byte=sp.L1_MESSAGE_AUX_BYTE,
                   rollback=False, is_service=False, shard_id=0,
                   tx_number_in_block=1, timestamp=29))
    for addr in (sp.KECCAK256_PRECOMPILE_FORMAL_ADDRESS,
                 sp.SHA256_PRECOMPILE_FORMAL_ADDRESS,
                 sp.ECRECOVER_PRECOMPILE_FORMAL_ADDRESS):
        qs.append(dict(address=addr, key=(77 << 128), read_value=0,
                       written_value=0, rw_flag=False,
                       aux_byte=sp.PRECOMPILE_AUX_BYTE, rollback=False,
                       is_service=False, shard_id=0, tx_number_in_block=2,
                       timestamp=33))
    qs.append(dict(address=0x8002, key=9, read_value=0, written_value=1,
                   rw_flag=True, aux_byte=sp.STORAGE_AUX_BYTE, rollback=False,
                   is_service=False, shard_id=1,  # porter shard: unrouted
                   tx_number_in_block=3, timestamp=37))
    return qs


@pytest.fixture(scope="module")
def demux_proof():
    qs = _queries()
    proof, publics, params = da.prove_demux(qs)
    return qs, proof, publics, params


def test_honest_demux_accepts(demux_proof):
    qs, proof, publics, params = demux_proof
    assert da.verify_demux(proof, qs, params)


def test_host_routing_matches_model(demux_proof):
    """The AIR's routing rule equals models/demux_log_queue.route_flags."""
    from zkevm_circuits_tpu.base_structures.log_query import LogQueries
    from zkevm_circuits_tpu.models import demux_log_queue as dm
    import jax.numpy as jnp

    qs = _queries()
    lq = LogQueries.from_lists(qs)
    flags = dm.route_flags(lq, jnp.ones(len(qs), bool))
    f = da._field_rows(qs, np.ones(len(qs), np.uint64))
    for i in range(len(qs)):
        mine = da._route_host(f, i)
        theirs = [int(np.asarray(flags[nm][i])) for nm, _, _ in da.QUEUE_RULES]
        assert mine == theirs, (i, mine, theirs)


def test_rerouted_element_rejected(demux_proof):
    """Claiming a storage log went to the events queue fails: the verifier
    recomputes the output RLCs from the plaintext + the rule."""
    qs, proof, publics, params = demux_proof
    bad = [dict(q) for q in qs]
    bad[0]["aux_byte"] = 1  # verifier now expects it in 'events'
    assert not da.verify_demux(proof, bad, params)


def test_dropped_element_rejected(demux_proof):
    qs, proof, publics, params = demux_proof
    assert not da.verify_demux(proof, qs[:-2], params)


def test_value_tamper_rejected(demux_proof):
    qs, proof, publics, params = demux_proof
    bad = [dict(q) for q in qs]
    bad[3]["key"] ^= 1  # precompile ABI key
    assert not da.verify_demux(proof, bad, params)
