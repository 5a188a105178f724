"""Generic row-sharded constraint evaluation on the 8-device virtual mesh."""

import numpy as np
import jax

from zkevm_circuits_tpu.base_structures.log_query import LogQueries
from zkevm_circuits_tpu.base_structures.memory_query import MemoryQueries
from zkevm_circuits_tpu.models import log_sorter as ls
from zkevm_circuits_tpu.models import ram_permutation as ram
from zkevm_circuits_tpu.parallel import auto, mesh as meshlib

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-suite tier (see pyproject markers)


def test_log_sorter_auto_sharded():
    rows = [
        dict(address=1, key=i, read_value=0, written_value=i * 3, aux_byte=1,
             rw_flag=True, rollback=False, is_service=False, shard_id=0,
             tx_number_in_block=0, timestamp=10 * (i + 1))
        for i in range(16)
    ]
    cfg = ls.LogSorterConfig(limit=16)
    q = LogQueries.from_lists(rows)
    w = ls.generate_witness_jit(q, q, cfg)
    mesh = meshlib.make_mesh(n_rows=8, n_inst=1)
    res = auto.eval_sharded(ls.eval_constraints, w, cfg, mesh, 16)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name


def test_ram_auto_sharded_matches_manual():
    rows = [
        dict(timestamp=100 + i, memory_page=7, index=i, rw_flag=True,
             is_ptr=False, value=1000 + i)
        for i in range(16)
    ]
    cfg = ram.RamPermutationConfig(limit=16)
    q = MemoryQueries.from_lists(rows)
    w = ram.generate_witness(q, q, cfg)
    mesh = meshlib.make_mesh(n_rows=8, n_inst=1)
    res = auto.eval_sharded(ram.eval_constraints, w, cfg, mesh, 16)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name


def test_storage_validity_auto_sharded():
    import jax.numpy as jnp

    from zkevm_circuits_tpu.models import storage_validity as sv

    cells = {}
    rows = []
    for i in range(16):
        addr, key = 0xAA + (i % 3), 5 + (i % 4)
        prev = cells.get((addr, key), 0)
        cells[(addr, key)] = 70 + i
        rows.append(
            dict(address=addr, key=key, read_value=prev,
                 written_value=70 + i, aux_byte=0, rw_flag=True,
                 rollback=False, is_service=False, shard_id=0,
                 tx_number_in_block=0, timestamp=8 * (i + 2))
        )
    order = sorted(
        range(len(rows)), key=lambda i: (rows[i]["address"], rows[i]["key"], i)
    )
    cfg = sv.StorageValidityConfig(limit=16)
    w = sv.generate_witness_jit(
        LogQueries.from_lists(rows),
        LogQueries.from_lists([rows[i] for i in order]),
        jnp.asarray(order, jnp.uint32),
        cfg,
    )
    mesh = meshlib.make_mesh(n_rows=8, n_inst=1)
    res = auto.eval_sharded(sv.eval_constraints, w, cfg, mesh, 16)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name


def test_keccak_auto_sharded():
    from zkevm_circuits_tpu.isa import system_params as sp
    from zkevm_circuits_tpu.models import keccak256_round_function as kc

    memory = {(3, 0): bytes(range(32)), (3, 1): bytes(range(32, 64))}
    calls = [
        dict(
            address=sp.KECCAK256_PRECOMPILE_FORMAL_ADDRESS,
            key=(40 << 32) | (5 << 64) | (3 << 128) | (3 << 160),
            read_value=0, written_value=0, aux_byte=sp.PRECOMPILE_AUX_BYTE,
            rw_flag=False, rollback=False, is_service=False, shard_id=0,
            tx_number_in_block=0, timestamp=77,
        )
    ]
    cfg = kc.KeccakRoundFunctionConfig(max_blocks=8, max_reads=16)
    w = kc.generate_witness(calls, memory, cfg)
    mesh = meshlib.make_mesh(n_rows=8, n_inst=1)
    res = auto.eval_sharded(kc.eval_constraints, w, cfg, mesh, 8)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name


def test_vm2_auto_sharded():
    from zkevm_circuits_tpu.isa import opcodes as isa
    from zkevm_circuits_tpu.models import vm

    enc = isa.encode_instruction
    prog = [
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=7, src1=0, dst0=1),
        enc(isa.MUL, src0=1, src1=1, dst0=2, dst1=3),
        enc(isa.RET, isa.RET_OK),
    ]
    v = vm.EraVM(vm.assemble_code_words(prog), 16)
    dw = vm.prepare_device_witness(v.run())
    mesh = meshlib.make_mesh(n_rows=8, n_inst=1)
    res = auto.eval_sharded(vm.eval_constraints, dw, 16, mesh, 16)
    bad = [k for k, r in res.items() if not bool(np.asarray(r).all())]
    assert not bad, bad


def test_vm_instance_sharded_eval():
    """ROADMAP#4: instance k of the VM circuit evaluated on device k over
    the "inst" mesh axis; windowed eval must agree with the monolithic
    eval (transition checks never cross a window boundary)."""
    import jax
    import numpy as np

    from zkevm_circuits_tpu.isa import opcodes as isa
    from zkevm_circuits_tpu.models import vm
    from zkevm_circuits_tpu.parallel import mesh as meshlib

    enc = isa.encode_instruction
    prog = [
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=41, src1=0, dst0=1),
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=1, src1=1, dst0=2),
        enc(isa.BINOP, isa.BINOP_XOR, src0=1, src1=2, dst0=3),
        enc(isa.RET, isa.RET_OK),
    ]
    total = 16
    v = vm.EraVM(vm.assemble_code_words(prog), total)
    dw = vm.prepare_device_witness(v.run())

    mesh = meshlib.make_mesh(n_rows=len(jax.devices()) // 2, n_inst=2)
    limit = total // 2  # 2 instances across the 2-wide "inst" axis
    res = vm.vm_eval_instances_sharded(dw, limit, mesh)
    bad = [k for k, r in res.items() if not bool(np.asarray(r).all())]
    assert not bad, bad
    # every residual carries the (n_instances,) leading axis
    some = np.asarray(next(iter(res.values())))
    assert some.shape[0] == 2

    mono = vm.eval_constraints_jit(dw, total)
    bad = [k for k, r in mono.items() if not bool(np.asarray(r).all())]
    assert not bad, bad
