"""Benchmark suite: one JSON line per headline metric (VERDICT r3 item 6).

Emitted metrics (each line: {"metric", "value", "unit", "vs_baseline"}):

  1. main_vm v2 constraint-eval cycles/s/chip (2^16-cycle witness) — the
     flagship circuit: every opcode-family check, queue sponges, callstack
     sponge, decode and continuity per cycle (models/vm/circuit.py; the
     per-cycle budget of `src/main_vm/cycle.rs:28-795`).
  2. ram_permutation constraint-eval rows/s/chip (2^20-row trace).
  3. STARK prover throughput: grand-product permutation argument at 2^16
     rows, prove+verify wall (prover/stark.py DEEP-ALI pipeline — LDE,
     row-Merkle, composition, OOD, FRI; ref `src/utils.rs:81-137` relation).
     LAST so the driver's parsed headline is the round's weakest metric
     (VERDICT r4 item 9) until it reaches >= 1x baseline.

Baselines (no published reference numbers exist — BASELINE.md):
  * ram row check: max(measured native scalar C++ floor, 8e5 rows/s/core
    AVX-class estimate) — unchanged from round 2.
  * main_vm cycle: ~8 Poseidon2 perms + 512-bit mul relations + decode per
    cycle ≈ 4 us/core on an optimized CPU => 2.5e5 cycles/s/core (documented
    estimate, same method as the ram figure).
  * STARK prove at 8 columns: LDE NTTs + 2^18-leaf Merkle (Poseidon2) + FRI
    ≈ 0.4 s single-core optimized => 1.5e5 rows/s/core (documented estimate).
"""

import json
import sys
import time

import numpy as np

BASELINE_RAM_ROWS_PER_SEC_PER_CORE = 8.0e5
BASELINE_VM_CYCLES_PER_SEC_PER_CORE = 2.5e5
BASELINE_PROVE_ROWS_PER_SEC_PER_CORE = 1.5e5
LOG2_RAM_ROWS = 20
LOG2_VM_CYCLES = 16
LOG2_PROVE_ROWS = 16


def emit(metric, value, unit, baseline):
    print(json.dumps({
        "metric": metric,
        "value": round(value, 1),
        "unit": unit,
        "vs_baseline": round(value / baseline, 3),
    }), flush=True)


def detail(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def build_tapes_np(n):
    """n distinct-cell writes; sorted by (page, index, ts); unsorted = shuffled."""
    rng = np.random.default_rng(0xBE7C)
    pages = np.sort(rng.integers(4, 1 << 20, size=n, dtype=np.uint32))
    index = np.arange(n, dtype=np.uint32) % 1024
    ts = np.arange(n, dtype=np.uint32) + 16
    order = np.lexsort((ts, index, pages))
    pages, index, ts = pages[order], index[order], ts[order]
    value = rng.integers(0, 1 << 32, size=(n, 8), dtype=np.uint32)
    rw = np.ones(n, dtype=bool)
    is_ptr = np.zeros(n, dtype=bool)
    sorted_t = dict(
        timestamp=ts, memory_page=pages, index=index, rw_flag=rw, is_ptr=is_ptr,
        value=value,
    )
    perm = rng.permutation(n)
    unsorted_t = {k: v[perm] for k, v in sorted_t.items()}
    return unsorted_t, sorted_t


def bench_main_vm():
    import jax

    from zkevm_circuits_tpu.isa import opcodes as isa
    from zkevm_circuits_tpu.models import vm

    n = 1 << LOG2_VM_CYCLES
    enc = isa.encode_instruction
    SET = 1 << isa.SET_FLAGS_FLAG_IDX
    SWAP = 1 << isa.SWAP_OPERANDS_FLAG_IDX_FOR_ARITH_OPCODES
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
    # native C++ witness oracle (VERDICT r4 item 3; Python sim stays as the
    # differential oracle, tests/test_vm_native.py)
    v = vm.NativeEraVM(vm.assemble_code_words(prog), n)
    w = v.run()
    sim_s = time.time() - t0
    dw = vm.prepare_device_witness(w)
    jax.block_until_ready(dw["regs"])

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
    emit(
        f"main_vm v2 constraint-eval cycles/s/chip (2^{LOG2_VM_CYCLES} cycles)",
        n / check_s, "cycles/s", BASELINE_VM_CYCLES_PER_SEC_PER_CORE,
    )
    detail(f"main_vm: eval={check_s*1000:.1f}ms (first {first_s:.1f}s), "
           f"sim={sim_s:.1f}s host")
    return w


def bench_prover():
    import jax

    from zkevm_circuits_tpu.models import ram_permutation as ram
    from zkevm_circuits_tpu.prover import pipeline

    n = 1 << LOG2_PROVE_ROWS
    unsorted_t, sorted_t = build_tapes_np(n)
    cfg = ram.RamPermutationConfig(limit=n, chain_stride=512)
    w = ram.generate_witness_host_tapes(unsorted_t, sorted_t, cfg)

    t0 = time.time()
    ok, proof, public, params = pipeline.prove_sorter_argument(w)
    first_s = time.time() - t0
    assert ok, "prover bench: proof must verify"

    t0 = time.time()
    ok, proof, public, params = pipeline.prove_sorter_argument(w)
    steady_s = time.time() - t0
    assert ok
    emit(
        f"grand-product STARK prove+verify rows/s/chip (2^{LOG2_PROVE_ROWS} rows)",
        n / steady_s, "rows/s", BASELINE_PROVE_ROWS_PER_SEC_PER_CORE,
    )
    detail(f"prover: prove+verify={steady_s:.2f}s (first {first_s:.1f}s), "
           f"log_n={params.log_n}, queries={params.num_queries}")


def bench_ram():
    import jax

    from zkevm_circuits_tpu.models import ram_permutation as ram
    from zkevm_circuits_tpu.runtime import native

    measured_baseline = native.ram_row_check_baseline()
    baseline = max(measured_baseline, BASELINE_RAM_ROWS_PER_SEC_PER_CORE)

    n = 1 << LOG2_RAM_ROWS
    unsorted_t, sorted_t = build_tapes_np(n)
    cfg = ram.RamPermutationConfig(limit=n, chain_stride=512)

    def gen():
        return jax.block_until_ready(
            ram.generate_witness_host_tapes(unsorted_t, sorted_t, cfg)
        )

    t0 = time.time()
    w = gen()
    witness_first = time.time() - t0
    t0 = time.time()
    w = gen()
    witness_s = time.time() - t0

    check = jax.jit(
        lambda witness: jax.numpy.stack(
            [v.all() for v in ram.eval_constraints(witness, cfg).values()]
        )
    )
    t0 = time.time()
    ok = jax.block_until_ready(check(w))
    check_first = time.time() - t0
    assert bool(np.asarray(ok).all()), "constraints must hold on the bench witness"

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        ok = check(w)
    jax.block_until_ready(ok)
    check_s = (time.time() - t0) / reps

    emit(
        "ram_permutation constraint-eval rows/sec/chip (2^20-row trace)",
        n / check_s, "rows/s", baseline,
    )
    detail(
        f"ram: check={check_s*1000:.1f}ms (first {check_first:.1f}s), "
        f"witness-gen={witness_s:.2f}s (first {witness_first:.1f}s), "
        f"witness rows/s={n/witness_s:.0f} (vs baseline "
        f"{n/witness_s/baseline:.2f}x), "
        f"baseline=max(measured {measured_baseline:.0f}, est "
        f"{BASELINE_RAM_ROWS_PER_SEC_PER_CORE:.0f}) rows/s/core"
    )


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    detail(f"device={jax.devices()[0]}")
    bench_main_vm()
    bench_ram()
    bench_prover()  # LAST: the driver's parsed headline line (VERDICT r4 #9)


if __name__ == "__main__":
    main()
