"""demux_log_queue circuit tests."""

import numpy as np

from zkevm_circuits_tpu.base_structures.log_query import LogQueries
from zkevm_circuits_tpu.isa.system_params import (
    EVENT_AUX_BYTE,
    KECCAK256_PRECOMPILE_FORMAL_ADDRESS,
    L1_MESSAGE_AUX_BYTE,
    PRECOMPILE_AUX_BYTE,
    SHA256_PRECOMPILE_FORMAL_ADDRESS,
    STORAGE_AUX_BYTE,
)
from zkevm_circuits_tpu.models import demux_log_queue as dm


def lq(aux, address=0x1234, shard=0):
    return dict(
        address=address, key=9, read_value=1, written_value=2, aux_byte=aux,
        rw_flag=True, rollback=False, is_service=False, shard_id=shard,
        tx_number_in_block=0, timestamp=5,
    )


def test_routing():
    rows = [
        lq(STORAGE_AUX_BYTE),
        lq(EVENT_AUX_BYTE),
        lq(L1_MESSAGE_AUX_BYTE),
        lq(PRECOMPILE_AUX_BYTE, address=KECCAK256_PRECOMPILE_FORMAL_ADDRESS),
        lq(PRECOMPILE_AUX_BYTE, address=SHA256_PRECOMPILE_FORMAL_ADDRESS),
        lq(STORAGE_AUX_BYTE),
    ]
    cfg = dm.DemuxConfig(limit=8)
    w = dm.generate_witness_jit(LogQueries.from_lists(rows), cfg)
    res = dm.eval_constraints_jit(w, cfg)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    counts = {k: int(np.asarray(v)[-1]) for k, v in w.out_counts.items()}
    assert counts == {
        "rollup_storage": 2, "events": 1, "l1_messages": 1,
        "keccak": 1, "sha256": 1, "ecrecover": 0,
    }
    # routed queues carry distinct tails
    states = dm.output_queue_states(w)
    tails = {k: tuple(int(x) for x in v.tail.astype_u64()) for k, v in states.items()}
    assert tails["rollup_storage"] != tails["events"]


def test_porter_shard_forbidden():
    rows = [lq(STORAGE_AUX_BYTE, shard=1)]
    cfg = dm.DemuxConfig(limit=4)
    w = dm.generate_witness_jit(LogQueries.from_lists(rows), cfg)
    res = dm.eval_constraints_jit(w, cfg)
    assert not bool(np.asarray(res["porter_forbidden"]).all())


def test_unknown_precompile_goes_nowhere():
    rows = [lq(PRECOMPILE_AUX_BYTE, address=0xDEAD)]
    cfg = dm.DemuxConfig(limit=4)
    w = dm.generate_witness_jit(LogQueries.from_lists(rows), cfg)
    res = dm.eval_constraints_jit(w, cfg)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    assert all(int(np.asarray(v)[-1]) == 0 for v in w.out_counts.values())
