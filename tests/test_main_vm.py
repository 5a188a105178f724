"""main_vm circuit: mini program end-to-end + relation probes."""

import numpy as np

from zkevm_circuits_tpu.base_structures.vm_state import VmStateColumns
from zkevm_circuits_tpu.isa import opcodes_legacy as isa
from zkevm_circuits_tpu.models import main_vm as vm

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-suite tier (see pyproject markers)

CFG = vm.MainVmConfig(limit=16)


def run(code, registers=None):
    init = VmStateColumns.initial(registers=registers)
    w = vm.generate_witness(code, init, CFG)
    res = vm.eval_constraints_jit(w, CFG)
    return w, res


def reg_value(w, cycle, idx):
    limbs = np.asarray(w["regs_after"])[cycle, idx]
    return sum(int(l) << (32 * k) for k, l in enumerate(limbs))


def test_arithmetic_program():
    big = (1 << 256) - 1
    code = [
        isa.encode_instruction(isa.ADD, src0=1, src1=2, dst0=3),   # r3 = r1 + r2 (wraps)
        isa.encode_instruction(isa.SUB, src0=1, src1=2, dst0=4),   # r4 = r1 - r2
        isa.encode_instruction(isa.MUL, src0=1, src1=2, dst0=5, dst1=6),
        isa.encode_instruction(isa.DIV, src0=1, src1=2, dst0=7, dst1=8),
        isa.encode_instruction(isa.XOR, src0=1, src1=2, dst0=9),
        isa.encode_instruction(isa.SHL, src0=1, src1=0, dst0=10, imm=37),
        isa.encode_instruction(isa.SHR, src0=1, src1=0, dst0=11, imm=99),
        isa.encode_instruction(isa.HALT),
    ]
    r1 = big - 12345
    r2 = 0xFEDCBA9876543210
    w, res = run(code, registers={1: r1, 2: r2})
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    assert reg_value(w, 0, 3) == (r1 + r2) % (1 << 256)
    assert reg_value(w, 1, 4) == (r1 - r2) % (1 << 256)
    assert reg_value(w, 2, 5) == (r1 * r2) % (1 << 256)
    assert reg_value(w, 2, 6) == (r1 * r2) >> 256
    assert reg_value(w, 3, 7) == r1 // r2
    assert reg_value(w, 3, 8) == r1 % r2
    assert reg_value(w, 4, 9) == r1 ^ r2
    assert reg_value(w, 5, 10) == (r1 << 37) % (1 << 256)
    assert reg_value(w, 6, 11) == r1 >> 99
    # halted state sticks to the end of the instance
    assert bool(np.asarray(w["halted_after"])[-1])


def test_conditional_loop():
    # r1 counts down from 3 via SUB imm; loop with conditional jump (NE)
    code = [
        isa.encode_instruction(isa.SUB, src0=1, src1=0, dst0=1, imm=1),  # r1 -= 1
        isa.encode_instruction(isa.JUMP, cond=isa.COND_NE, imm=0),       # loop while != 0
        isa.encode_instruction(isa.HALT),
    ]
    w, res = run(code, registers={1: 3})
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    assert reg_value(w, 6, 1) == 0  # after 3 iterations (2 cycles each) + halt
    assert bool(np.asarray(w["halted_after"])[-1])


def test_wrong_result_rejected():
    import dataclasses as dc
    import jax.numpy as jnp

    code = [isa.encode_instruction(isa.ADD, src0=1, src1=2, dst0=3), isa.encode_instruction(isa.HALT)]
    w, _ = run(code, registers={1: 10, 2: 20})
    bad = dict(w)
    arr = np.asarray(w["result"]).copy()
    arr[0, 0] += 1
    bad["result"] = jnp.asarray(arr)
    res = vm.eval_constraints_jit(bad, CFG)
    ok_all = all(bool(np.asarray(v).all()) for v in res.values())
    assert not ok_all


def test_wrong_fetch_rejected():
    import jax.numpy as jnp

    code = [isa.encode_instruction(isa.ADD, src0=1, src1=2, dst0=3), isa.encode_instruction(isa.HALT)]
    w, _ = run(code, registers={1: 10, 2: 20})
    bad = dict(w)
    arr = np.asarray(w["opcode_word_lo"]).copy()
    arr[0] ^= 0xF000  # claim different src0
    bad["opcode_word_lo"] = jnp.asarray(arr)
    res = vm.eval_constraints_jit(bad, CFG)
    assert not bool(np.asarray(res["opcode_fetch"]).all())


def test_heap_ops_feed_ram_permutation():
    """VM heap traffic -> memory queue -> validated by ram_permutation."""
    from zkevm_circuits_tpu.models import main_vm as mvm
    from zkevm_circuits_tpu.models import ram_permutation as ram
    from zkevm_circuits_tpu.base_structures.memory_query import MemoryQueries

    code = [
        isa.encode_instruction(isa.HEAP_WRITE, src0=1, src1=2),  # heap[r1] = r2
        isa.encode_instruction(isa.HEAP_READ, src0=1, dst0=3),   # r3 = heap[r1]
        isa.encode_instruction(isa.HALT),
    ]
    init = VmStateColumns.initial(registers={1: 5, 2: 0xDEADBEEF})
    w = vm.generate_witness(code, init, CFG)
    res = vm.eval_constraints_jit(w, CFG)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    assert reg_value(w, 1, 3) == 0xDEADBEEF

    # feed the VM's memory queries into ram_permutation
    mq = mvm.memory_queries(w, CFG)
    pushed = np.asarray(w["mem_push"])
    rows = [
        dict(
            timestamp=int(np.asarray(mq.timestamp)[i]),
            memory_page=int(np.asarray(mq.memory_page)[i]),
            index=int(np.asarray(mq.index)[i]),
            rw_flag=bool(np.asarray(mq.rw_flag)[i]),
            is_ptr=False,
            value=sum(int(l) << (32 * k) for k, l in enumerate(np.asarray(mq.value)[i])),
        )
        for i in range(len(pushed))
        if pushed[i]
    ]
    sorted_rows = sorted(rows, key=lambda r: (r["memory_page"], r["index"], r["timestamp"]))
    rcfg = ram.RamPermutationConfig(limit=4)
    rw = ram.generate_witness(
        MemoryQueries.from_lists(rows), MemoryQueries.from_lists(sorted_rows), rcfg
    )
    rres = ram.eval_constraints_jit(rw, rcfg)
    for name, ok in rres.items():
        assert bool(np.asarray(ok).all()), name


def test_log_ops_feed_demux():
    """VM log opcodes -> unified log queue -> demultiplexed."""
    from zkevm_circuits_tpu.models import demux_log_queue as dm
    from zkevm_circuits_tpu.models import main_vm as mvm
    from zkevm_circuits_tpu.base_structures.log_query import LogQueries

    code = [
        isa.encode_instruction(isa.LOG, src0=1, src1=2, dst1=isa.LOG_VARIANT_EVENT),
        isa.encode_instruction(isa.LOG, src0=3, src1=4, dst1=isa.LOG_VARIANT_STORAGE_WRITE),
        isa.encode_instruction(isa.HALT),
    ]
    init = VmStateColumns.initial(registers={1: 100, 2: 200, 3: 5, 4: 77})
    w = vm.generate_witness(code, init, CFG)
    res = vm.eval_constraints_jit(w, CFG)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name

    lq = mvm.log_queries(w, CFG)
    pushed = np.asarray(w["log_push"])
    rows = []
    for i in range(len(pushed)):
        if not pushed[i]:
            continue
        rows.append(
            dict(
                address=sum(int(l) << (32 * k) for k, l in enumerate(np.asarray(lq.address)[i])),
                key=sum(int(l) << (32 * k) for k, l in enumerate(np.asarray(lq.key)[i])),
                read_value=sum(int(l) << (32 * k) for k, l in enumerate(np.asarray(lq.read_value)[i])),
                written_value=sum(int(l) << (32 * k) for k, l in enumerate(np.asarray(lq.written_value)[i])),
                aux_byte=int(np.asarray(lq.aux_byte)[i]),
                rw_flag=True, rollback=False, is_service=False, shard_id=0,
                tx_number_in_block=0,
                timestamp=int(np.asarray(lq.timestamp)[i]),
            )
        )
    dcfg = dm.DemuxConfig(limit=4)
    dw = dm.generate_witness_jit(LogQueries.from_lists(rows), dcfg)
    dres = dm.eval_constraints_jit(dw, dcfg)
    for name, ok in dres.items():
        assert bool(np.asarray(ok).all()), name
    counts = {k: int(np.asarray(v)[-1]) for k, v in dw.out_counts.items()}
    assert counts["events"] == 1 and counts["rollup_storage"] == 1


def test_context_reads():
    code = [
        isa.encode_instruction(isa.CONTEXT, dst0=1, dst1=isa.CTX_VARIANT_ADDRESS),
        isa.encode_instruction(isa.CONTEXT, dst0=2, dst1=isa.CTX_VARIANT_ERGS_LEFT),
        isa.encode_instruction(isa.CONTEXT, dst0=3, dst1=isa.CTX_VARIANT_TIMESTAMP),
        isa.encode_instruction(isa.HALT),
    ]
    w, res = run(code)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    assert reg_value(w, 0, 1) == CFG.contract_address
    assert reg_value(w, 2, 3) == CFG.starting_timestamp + 2


def test_near_call_ret():
    """nested near_call/ret with the callstack sponge verified per row."""
    code = [
        isa.encode_instruction(isa.NEAR_CALL, imm=3),        # 0: call f
        isa.encode_instruction(isa.ADD, src0=1, src1=2, dst0=4),  # 1: after ret
        isa.encode_instruction(isa.HALT),                    # 2
        isa.encode_instruction(isa.NEAR_CALL, imm=6),        # 3: f: call g
        isa.encode_instruction(isa.ADD, src0=1, src1=1, dst0=5),  # 4: after inner
        isa.encode_instruction(isa.RET),                     # 5
        isa.encode_instruction(isa.ADD, src0=2, src1=2, dst0=6),  # 6: g
        isa.encode_instruction(isa.RET),                     # 7
    ]
    w, res = run(code, registers={1: 10, 2: 20})
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    # g ran (r6 = 40), then f resumed (r5 = 20), then main resumed (r4 = 30)
    assert reg_value(w, CFG.limit - 1, 6) == 40
    assert reg_value(w, CFG.limit - 1, 5) == 20
    assert reg_value(w, CFG.limit - 1, 4) == 30
    # depth returns to 0 and the sponge state returns to the empty state
    assert int(np.asarray(w["cs_depth"])[-1]) == 0
    assert (np.asarray(w["cs_state_lo"])[-1] == 0).all()


def test_tampered_callstack_rejected():
    import jax.numpy as jnp

    code = [
        isa.encode_instruction(isa.NEAR_CALL, imm=2),
        isa.encode_instruction(isa.HALT),
        isa.encode_instruction(isa.RET),
    ]
    w, _ = run(code)
    bad = dict(w)
    arr = np.asarray(w["ret_return_pc"]).copy()
    rows = np.flatnonzero(arr)
    arr[rows[0]] = 7  # claim a different return pc
    bad["ret_return_pc"] = jnp.asarray(arr)
    res = vm.eval_constraints_jit(bad, CFG)
    ok_all = all(bool(np.asarray(v).all()) for v in res.values())
    assert not ok_all


def test_ptr_add():
    from zkevm_circuits_tpu.base_structures.vm_state import REGISTERS_COUNT

    code = [
        isa.encode_instruction(isa.PTR_ADD, src0=1, src1=0, dst0=2, imm=0x40),
        isa.encode_instruction(isa.HALT),
    ]
    init = VmStateColumns.initial(registers={1: (7 << 128) | 0x100})
    init["register_is_ptr"] = [False] * REGISTERS_COUNT
    init["register_is_ptr"][1] = True
    w = vm.generate_witness(code, init, CFG)
    res = vm.eval_constraints_jit(w, CFG)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    assert reg_value(w, 0, 2) == (7 << 128) | 0x140
    assert bool(np.asarray(w["regs_ptr_after"])[0, 2])  # dst stays a pointer

    # probe: ptr_add from a non-pointer register is rejected
    init2 = VmStateColumns.initial(registers={1: 0x100})
    w2 = vm.generate_witness(code, init2, CFG)
    res2 = vm.eval_constraints_jit(w2, CFG)
    assert not bool(np.asarray(res2["ptr_requires_pointer"]).all())


def test_far_call_feeds_decommit_sorter():
    """far_call -> decommit queue -> sort_decommittment_requests."""
    from zkevm_circuits_tpu.base_structures.decommit_query import DecommitQueries
    from zkevm_circuits_tpu.models import main_vm as mvm
    from zkevm_circuits_tpu.models import sort_decommittment_requests as sd

    CODE_HASH_A = (0x0101 << 224) | 0xABC
    code = [
        isa.encode_instruction(isa.FAR_CALL, src0=1, imm=3),  # call contract A
        isa.encode_instruction(isa.FAR_CALL, src0=1, imm=3),  # call A again
        isa.encode_instruction(isa.HALT),
        isa.encode_instruction(isa.RET),  # "callee" body
    ]
    init = VmStateColumns.initial(registers={1: 0xAAAA}, ergs=64000)
    w = vm.generate_witness(code, init, CFG, code_hashes={0xAAAA: CODE_HASH_A})
    res = vm.eval_constraints_jit(w, CFG)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    pushes = np.asarray(w["dec_push"])
    assert int(pushes.sum()) == 2
    firsts = np.asarray(w["dec_is_first"])[pushes]
    assert firsts.tolist() == [True, False]  # second call to A is not first
    # 63/64 ergs rule applied on the far_call rows
    eb = np.asarray(w["ergs_before"])[0]
    ea = np.asarray(w["ergs_after"])[0]
    charged = eb - isa.PRICES[isa.FAR_CALL]
    assert ea == charged - (charged >> 6)

    # the VM's decommit tape feeds the decommit sorter
    dq = mvm.decommit_queries(w, CFG)
    rows = [
        dict(
            code_hash=sum(int(l) << (32 * k) for k, l in enumerate(np.asarray(dq.code_hash)[i])),
            page=int(np.asarray(dq.page)[i]),
            timestamp=int(np.asarray(dq.timestamp)[i]),
            is_first=bool(np.asarray(dq.is_first)[i]),
        )
        for i in range(len(pushes))
        if pushes[i]
    ]
    # both calls reuse the same allocated page (era invariant)
    assert rows[0]["page"] == rows[1]["page"]
    sorted_rows = sorted(rows, key=lambda r: (r["code_hash"], r["timestamp"]))
    scfg = sd.DecommitSorterConfig(limit=4)
    sw = sd.generate_witness_jit(
        DecommitQueries.from_lists(rows), DecommitQueries.from_lists(sorted_rows), scfg
    )
    sres = sd.eval_constraints_jit(sw, scfg)
    for name, ok in sres.items():
        assert bool(np.asarray(ok).all()), name
    # dedup keeps one request for hash A
    assert int(np.asarray(sw.result_count)[-1]) == 1


def test_out_of_ergs_panics():
    """an opcode the frame cannot afford is masked into PANIC: no state
    change, ergs drained to zero, execution halts."""
    code = [
        isa.encode_instruction(isa.ADD, src0=1, src1=2, dst0=3),  # price 2
        isa.encode_instruction(isa.MUL, src0=1, src1=2, dst0=4, dst1=5),  # price 5
        isa.encode_instruction(isa.HALT),
    ]
    init = VmStateColumns.initial(registers={1: 10, 2: 20}, ergs=4)
    w = vm.generate_witness(code, init, CFG)
    res = vm.eval_constraints_jit(w, CFG)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    # the add ran (2 ergs left), the mul panicked
    assert reg_value(w, 0, 3) == 30
    assert reg_value(w, 1, 4) == 0  # masked — no writeback
    assert int(np.asarray(w["ergs_after"])[1]) == 0
    assert bool(np.asarray(w["halted_after"])[1])


def test_skipped_condition_keeps_state():
    code = [
        isa.encode_instruction(isa.ADD, cond=isa.COND_EQ, src0=1, src1=2, dst0=3),
        isa.encode_instruction(isa.HALT),
    ]
    # EQ flag starts false -> the add must NOT execute
    w, res = run(code, registers={1: 5, 2: 7})
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
    assert reg_value(w, 0, 3) == 0
