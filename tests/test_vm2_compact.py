"""main_vm v2 ClosedFormInput instancing: slicing, chaining, boot/exit pins.

Reference semantics: `src/main_vm/mod.rs:47-229` (entry point: boot-vs-FSM
select, exit invariants, compact form), `loading.rs:13-226` (boot state),
`fsm_input_output/mod.rs` (masking rules — tested via utils/protocol).
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.isa import opcodes as isa
from zkevm_circuits_tpu.models import vm

enc = isa.encode_instruction
SET_FLAGS = 1 << isa.SET_FLAGS_FLAG_IDX


def _countdown_run(total_cycles):
    # r1 counts down from 8; ~3 cycles/iteration + ret, then NOP-skip padding
    prog = [
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=8, src1=0, dst0=1),
        enc(isa.SUB, src_mode=isa.SRC_IMM, imm0=1, src1=1, dst0=1,
            flags=SET_FLAGS | (1 << isa.SWAP_OPERANDS_FLAG_IDX_FOR_ARITH_OPCODES)),
        enc(isa.JUMP, src_mode=isa.SRC_IMM, imm0=1, condition=isa.COND_NE),
        enc(isa.RET, isa.RET_OK),
    ]
    v = vm.EraVM(vm.assemble_code_words(prog), total_cycles)
    w = v.run()
    dw = vm.prepare_device_witness(w)
    return v, w, dw


@pytest.fixture(scope="module")
def countdown():
    return _countdown_run(32)


def test_instances_chain_and_pins(countdown):
    v, w, dw = countdown
    res = vm.eval_constraints(dw, 32)
    assert vm.all_ok(res), [k for k, r in res.items() if not np.asarray(r).all()]

    forms, cres = vm.vm_instance_compact_forms(dw, limit=8)
    bad = [k for k, r in cres.items() if not bool(np.asarray(r).all())]
    assert not bad, f"failing compact residuals: {bad}"
    assert forms.start_flag.shape == (4,)
    assert bool(forms.start_flag[0]) and not bool(forms.start_flag[1:].any())
    assert bool(forms.completion_flag[-1])
    # masking rules: fsm_in[0] zeroed by start, fsm_out[-1] zeroed by completion
    assert bool(np.asarray(
        vm.compact.gf.is_zero(forms.hidden_fsm_input_commitment[0]).all()
    ))
    assert bool(np.asarray(
        vm.compact.gf.is_zero(forms.hidden_fsm_output_commitment[-1]).all()
    ))
    # interior handoffs are nonzero and chain
    mid_out = forms.hidden_fsm_output_commitment[0].astype_u64()
    mid_in = forms.hidden_fsm_input_commitment[1].astype_u64()
    assert (mid_out == mid_in).all() and mid_out.any()


def test_tamper_boundary_state_breaks_handoff(countdown):
    v, w, dw = countdown
    w2 = {k: (np.array(val, copy=True) if isinstance(val, np.ndarray) else val)
          for k, val in w.items()}
    w2["ctx_ergs"] = np.array(w2["ctx_ergs"], copy=True)
    w2["ctx_ergs"][8] += 1  # boundary row between instance 0 and 1
    dw2 = vm.prepare_device_witness(w2)
    forms, cres = vm.vm_instance_compact_forms(dw2, limit=8)
    out0 = forms.hidden_fsm_output_commitment[0].astype_u64()
    in1 = forms.hidden_fsm_input_commitment[1].astype_u64()
    # the boundary state feeds BOTH sides identically (shared column), so the
    # handoff still matches — but eval_constraints on the slice catches the
    # forged ergs against the cycle transition.
    assert (out0 == in1).all()
    res = vm.eval_constraints(dw2, 32)
    assert not vm.all_ok(res)


def test_boot_pin_tamper_detected(countdown):
    v, w, dw = countdown
    w2 = dict(w)
    w2["ts"] = np.array(w["ts"], copy=True)
    w2["ts"][0] += 1  # claim a different starting timestamp
    dw2 = vm.prepare_device_witness(w2)
    _, cres = vm.vm_instance_compact_forms(dw2, limit=8)
    assert not bool(np.asarray(cres["boot_scalars"]).all())


def test_exit_invariant_requires_clean_halt():
    # a program that never rets: at the end depth != 0 -> exit residual fails
    prog = [enc(isa.JUMP, src_mode=isa.SRC_IMM, imm0=0)]
    v = vm.EraVM(vm.assemble_code_words(prog), 8, )
    w = v.run()
    dw = vm.prepare_device_witness(w)
    _, cres = vm.vm_instance_compact_forms(dw, limit=8)
    assert not bool(np.asarray(cres["exit_callstack_empty"]).all())
