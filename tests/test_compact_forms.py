"""Every circuit family exposes a ClosedFormInput compact-form commitment."""

import numpy as np

from zkevm_circuits_tpu.base_structures.log_query import LogQueries
from zkevm_circuits_tpu.isa.system_params import (
    KECCAK256_PRECOMPILE_FORMAL_ADDRESS,
    PRECOMPILE_AUX_BYTE,
)
from zkevm_circuits_tpu.models import (
    code_unpacker_sha256 as cu,
    demux_log_queue as dm,
    eip_4844 as e4,
    keccak256_round_function as kc,
    linear_hasher as lh,
    storage_application as sa,
)


def test_single_instance_compact_forms():
    # keccak precompile
    data = b"q"
    mem = {(55, 0): data.ljust(32, b"\x00")}
    key = 0 | (1 << 32) | (3 << 64) | (55 << 128) | (66 << 160)
    call = dict(
        address=KECCAK256_PRECOMPILE_FORMAL_ADDRESS, key=key, read_value=0,
        written_value=0, aux_byte=PRECOMPILE_AUX_BYTE, rw_flag=True,
        rollback=False, is_service=False, shard_id=0, tx_number_in_block=1,
        timestamp=9,
    )
    cfg = kc.KeccakRoundFunctionConfig(max_blocks=2, max_reads=4)
    cf = kc.instance_compact_form(kc.generate_witness([call], mem, cfg), cfg)
    assert cf.commitment().astype_u64().shape == (1, 4)
    # start=complete=true masks both fsm commitments to zero
    z = np.zeros(4, dtype=np.uint64)
    np.testing.assert_array_equal(cf.hidden_fsm_input_commitment.astype_u64()[0], z)
    np.testing.assert_array_equal(cf.hidden_fsm_output_commitment.astype_u64()[0], z)
    assert (cf.observable_output_commitment.astype_u64()[0] != 0).any()

    # code unpacker
    words = [11, 22, 33]
    req = cu.make_request(words, 500, 40)
    ccfg = cu.CodeUnpackerConfig(max_rounds=4)
    cf = cu.instance_compact_form(
        cu.generate_witness([req], {int(req["code_hash"]): words}, ccfg), ccfg
    )
    assert cf.commitment().astype_u64().shape == (1, 4)

    # demux
    rows = [dict(address=1, key=2, read_value=0, written_value=3, aux_byte=1,
                 rw_flag=True, rollback=False, is_service=False, shard_id=0,
                 tx_number_in_block=0, timestamp=5)]
    dcfg = dm.DemuxConfig(limit=2)
    cf = dm.instance_compact_form(
        dm.generate_witness_jit(LogQueries.from_lists(rows), dcfg), dcfg
    )
    assert cf.commitment().astype_u64().shape == (1, 4)

    # linear hasher
    hcfg = lh.LinearHasherConfig(limit=2)
    msg = dict(address=1, key=2, read_value=0, written_value=3, aux_byte=2,
               rw_flag=True, rollback=False, is_service=True, shard_id=0,
               tx_number_in_block=1, timestamp=5)
    cf = lh.instance_compact_form(
        lh.generate_witness_jit(LogQueries.from_lists([msg]), hcfg), hcfg
    )
    assert cf.commitment().astype_u64().shape == (1, 4)

    # storage application
    tree = sa.SparseStorageTree()
    q = dict(address=0xAA, key=1, read_value=0, written_value=42, aux_byte=0,
             rw_flag=True, rollback=False, is_service=False, shard_id=0,
             tx_number_in_block=0, timestamp=0)
    scfg = sa.StorageApplicationConfig(max_rows=4)
    cf = sa.instance_compact_form(sa.generate_witness([q], tree, 1, scfg), scfg)
    assert cf.commitment().astype_u64().shape == (1, 4)

    # eip 4844
    ecfg = e4.EIP4844Config(elements=4)
    cf = e4.instance_compact_form(
        e4.generate_witness([bytes([3] * 31)], bytes(32), ecfg), ecfg
    )
    assert cf.commitment().astype_u64().shape == (1, 4)
