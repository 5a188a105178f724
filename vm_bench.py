"""main_vm v2 at-scale benchmark: cycles/sec/chip for the full-fidelity
EraVM constraint evaluation (every opcode-family check, queue sponges,
callstack sponge, continuity — the per-cycle budget of BASELINE.md).

Not the driver headline (bench.py stays ram_permutation); run manually:
    python vm_bench.py [log2_cycles]
"""

import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from zkevm_circuits_tpu.isa import opcodes as isa
    from zkevm_circuits_tpu.models import vm

    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << log2
    enc = isa.encode_instruction
    SET = 1 << isa.SET_FLAGS_FLAG_IDX
    SWAP = 1 << isa.SWAP_OPERANDS_FLAG_IDX_FOR_ARITH_OPCODES
    # a mixed hot loop: arith + storage log + jump (3 log pushes per 8 cycles)
    prog = [
        enc(isa.ADD, src_mode=isa.SRC_IMM, imm0=0xFFFF, src1=0, dst0=1),
        enc(isa.SUB, src_mode=isa.SRC_IMM, imm0=1, src1=1, dst0=1,
            flags=SET | SWAP),
        enc(isa.MUL, src0=1, src1=1, dst0=2, dst1=3),
        enc(isa.BINOP, isa.BINOP_XOR, src0=2, src1=1, dst0=4),
        enc(isa.JUMP, src_mode=isa.SRC_IMM, imm0=1, condition=isa.COND_NE),
        enc(isa.RET, isa.RET_OK),
    ]
    t0 = time.time()
    v = vm.EraVM(vm.assemble_code_words(prog), n)
    w = v.run()
    sim_s = time.time() - t0
    t0 = time.time()
    dw = vm.prepare_device_witness(w)
    jax.block_until_ready(dw["regs"])
    upload_s = time.time() - t0

    t0 = time.time()
    res = vm.eval_constraints_jit(dw, n)
    ok = all(bool(np.asarray(r).all()) for r in res.values())
    first_s = time.time() - t0
    assert ok, [k for k, r in res.items() if not np.asarray(r).all()]

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        res = vm.eval_constraints_jit(dw, n)
    jax.block_until_ready(jax.tree_util.tree_leaves(res)[0])
    check_s = (time.time() - t0) / reps

    print(
        f"main_vm v2 eval: {n / check_s:,.0f} cycles/s/chip "
        f"(2^{log2} cycles in {check_s*1000:.0f} ms; first {first_s:.0f}s; "
        f"sim {sim_s:.1f}s; upload {upload_s:.1f}s; "
        f"device {jax.devices()[0]})"
    )


if __name__ == "__main__":
    main()
