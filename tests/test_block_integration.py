"""End-to-end block flow: one unified VM log stream driven through
demux -> (events sorter, storage sorter -> storage application,
L1 sorter -> linear hasher) with queue-tail handoffs checked, and all
circuits' compact forms orchestrated by the scheduler.

This is the cross-circuit dataflow the reference scheduler wires up
(scheduler/mod.rs:239-452): a producer circuit's observable-output queue
state must equal the consumer's observable-input queue state.
"""

import numpy as np
import jax.numpy as jnp

from zkevm_circuits_tpu.base_structures.log_query import LogQueries
from zkevm_circuits_tpu.isa.system_params import (
    EVENT_AUX_BYTE,
    L1_MESSAGE_AUX_BYTE,
    STORAGE_AUX_BYTE,
)
from zkevm_circuits_tpu.models import (
    demux_log_queue as dm,
    linear_hasher as lh,
    log_sorter as ls,
    recursion,
    scheduler,
    storage_application as sa,
    storage_validity as sv,
)
from zkevm_circuits_tpu.ops import gf, queues
from zkevm_circuits_tpu.utils import protocol

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-suite tier (see pyproject markers)


def lq(aux, address=0x9999, key=1, rv=0, wv=0, rw=True, ts=1, rollback=False):
    return dict(
        address=address, key=key, read_value=rv, written_value=wv, aux_byte=aux,
        rw_flag=rw, rollback=rollback, is_service=False, shard_id=0,
        tx_number_in_block=1, timestamp=ts,
    )


def tails_equal(a: queues.QueueState, b: queues.QueueState) -> bool:
    return bool(np.asarray(queues.queue_states_equal(a, b)))


def test_block_flow():
    # --- the VM's unified log stream (cycle order) ---
    storage_write = lq(STORAGE_AUX_BYTE, address=0xAA, key=5, rv=0, wv=77, ts=10)
    event_a = lq(EVENT_AUX_BYTE, key=100, wv=1000, ts=11)
    l1_msg = lq(L1_MESSAGE_AUX_BYTE, key=200, wv=2000, ts=12)
    event_b = lq(EVENT_AUX_BYTE, key=101, wv=1001, ts=13)
    stream = [storage_write, event_a, l1_msg, event_b]

    # --- demux ---
    dcfg = dm.DemuxConfig(limit=4)
    dw = dm.generate_witness_jit(LogQueries.from_lists(stream), dcfg)
    assert dm.all_ok(dm.eval_constraints_jit(dw, dcfg))
    out_states = dm.output_queue_states(dw)

    compact_forms = {}

    # --- events sorter (type 11) consumes the demuxed events queue ---
    ecfg = ls.LogSorterConfig(limit=4)
    events = [event_a, event_b]
    ew = ls.generate_witness_jit(
        LogQueries.from_lists(events), LogQueries.from_lists(events), ecfg
    )
    assert ls.all_ok(ls.eval_constraints_jit(ew, ecfg))
    # handoff: the sorter's unsorted-queue tail == demux events-queue tail
    sorter_in = queues.QueueState(
        gf.zeros((4,)), ew.chain_unsorted[ew.execute.shape[0]], ew.n
    )
    assert tails_equal(sorter_in, out_states["events"])
    compact_forms[11] = ls.instance_compact_forms(ew, ecfg)

    # --- L1 messages sorter (type 12) + linear hasher (type 13) ---
    lcfg = ls.LogSorterConfig(limit=4)
    l1s = [l1_msg]
    lw = ls.generate_witness_jit(
        LogQueries.from_lists(l1s), LogQueries.from_lists(l1s), lcfg
    )
    assert ls.all_ok(ls.eval_constraints_jit(lw, lcfg))
    l1_in = queues.QueueState(
        gf.zeros((4,)), lw.chain_unsorted[lw.execute.shape[0]], lw.n
    )
    assert tails_equal(l1_in, out_states["l1_messages"])
    compact_forms[12] = ls.instance_compact_forms(lw, lcfg)

    # the hasher consumes the sorter's RESULT queue
    survivors = [
        i for i in range(len(np.asarray(lw.result_add))) if np.asarray(lw.result_add)[i]
    ]
    items = lw.result_items
    hasher_rows = [
        dict(
            address=int(np.asarray(items.address)[i][0]),
            key=int(np.asarray(items.key)[i][0]),
            read_value=0,
            written_value=int(np.asarray(items.written_value)[i][0]),
            aux_byte=0, rw_flag=False, rollback=False,
            is_service=bool(np.asarray(items.is_service)[i]),
            shard_id=int(np.asarray(items.shard_id)[i]),
            tx_number_in_block=int(np.asarray(items.tx_number_in_block)[i]),
            timestamp=0,
        )
        for i in survivors
    ]
    hcfg = lh.LinearHasherConfig(limit=4)
    hw = lh.generate_witness_jit(LogQueries.from_lists(hasher_rows), hcfg)
    assert lh.all_ok(lh.eval_constraints_jit(hw, hcfg))
    hasher_in = queues.QueueState(
        gf.zeros((4,)), hw.input_chain[hw.execute.shape[0]], hw.n
    )
    result_out = queues.QueueState(
        gf.zeros((4,)),
        lw.result_chain[lw.execute.shape[0] + 1],
        lw.result_count[lw.execute.shape[0]],
    )
    assert tails_equal(hasher_in, result_out)

    # --- storage chain: validity sorter (type 9) -> application (type 10) ---
    scfg = sv.StorageValidityConfig(limit=4)
    storages = [storage_write]
    svw = sv.generate_witness_jit(
        LogQueries.from_lists(storages), LogQueries.from_lists(storages),
        jnp.asarray([0], jnp.uint32), scfg,
    )
    assert sv.all_ok(sv.eval_constraints_jit(svw, scfg))
    sv_in = queues.QueueState(
        gf.zeros((4,)), svw.chain_unsorted[svw.execute.shape[0]], svw.n
    )
    assert tails_equal(sv_in, out_states["rollup_storage"])
    # the applier consumes the deduplicated output
    surv = [i for i in range(len(np.asarray(svw.push_flags))) if np.asarray(svw.push_flags)[i]]
    apply_rows = []
    for i in surv:
        pi = svw.push_items
        apply_rows.append(
            dict(
                address=sum(int(l) << (32 * k) for k, l in enumerate(np.asarray(pi.address)[i])),
                key=sum(int(l) << (32 * k) for k, l in enumerate(np.asarray(pi.key)[i])),
                read_value=sum(int(l) << (32 * k) for k, l in enumerate(np.asarray(pi.read_value)[i])),
                written_value=sum(int(l) << (32 * k) for k, l in enumerate(np.asarray(pi.written_value)[i])),
                aux_byte=0, rw_flag=bool(np.asarray(pi.rw_flag)[i]), rollback=False,
                is_service=False, shard_id=0, tx_number_in_block=0, timestamp=0,
            )
        )
    tree = sa.SparseStorageTree()
    acfg = sa.StorageApplicationConfig(max_rows=4)
    aw = sa.generate_witness(apply_rows, tree, initial_counter=1, config=acfg)
    assert sa.all_ok(sa.eval_constraints_jit(aw, acfg))
    # the write landed: one state diff, counter advanced
    assert int(np.asarray(aw.row_execute).sum()) == 2  # read + write stage

    # --- scheduler over the produced compact forms ---
    node_vk = (1, 2, 3, 4)
    lp = {
        t: recursion.RecursionLeafParameters(t, (5, 6, 7, 8), (9, 10, 11, 12))
        for t in scheduler.SEQUENCE_OF_CIRCUIT_TYPES
    }
    proofs = {}
    for t, cf in compact_forms.items():
        k = int(np.asarray(cf.start_flag).shape[0])
        qchain = recursion.build_recursion_queue(
            gf.full((k,), t), cf.commitment(), jnp.ones(k, dtype=bool)
        )
        qs = queues.QueueState(gf.zeros((12,)), qchain[k], jnp.uint32(k))
        proofs[t] = recursion.ProofSurrogate(
            scheduler.node_input_commitment(t, lp[t], node_vk, qs), True,
            vk_commitment=gf.from_u64(np.array(node_vk, dtype=np.uint64)),
        )
    result = scheduler.run_scheduler(
        compact_forms_by_type=compact_forms,
        node_proofs_by_type=proofs,
        leaf_params_by_type=lp,
        node_vk_commitment=node_vk,
        previous_block_content_hash=b"\x00" * 32,
        block_data=scheduler.BlockPassthroughData(),
        block_meta=scheduler.BlockMetaParameters(),
        aux_output=scheduler.BlockAuxilaryOutput(
            l1_messages_linear_hash=bytes(int(b) for b in np.asarray(hw.digest)),
        ),
    )
    assert scheduler.all_ok(result), result.checks
