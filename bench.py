"""Benchmark: Goldilocks constraint-eval rows/sec/chip on ram_permutation.

The operative baseline (BASELINE.md): the reference publishes no numbers; the
unit of work is a 2^20-row trace of the permutation-argument circuit
(reference dev-test geometry, src/ram_permutation/mod.rs:419-497).  Per row
the check costs 2 Poseidon2-Goldilocks permutations (both queue chains), 2x2
grand-product FMA folds over 8-element encodings, the 96-bit sort comparison
and RW-semantics selects — the same work check_if_satisfied performs per row
on CPU.

Baseline constant: an optimized Rust CPU implementation of this per-row work
is dominated by the two Poseidon2 permutations (~0.4-0.6 us each per core,
plonky2/boojum-class implementations) => ~8e5 rows/s/core.  Recorded in
BASELINE.md as an estimate pending a real Rust measurement (no Rust toolchain
in this environment).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

# Operative baseline: an AVX-class optimized Rust CPU implementation
# (plonky2/boojum Poseidon2 at ~0.4-0.6 us/perm). Our OWN scalar-C++ runtime
# measures the same per-row work at startup (native.ram_row_check_baseline)
# as a hard measured floor; vs_baseline is reported against the LARGER of
# the two so the headline can never flatter itself against an unoptimized
# stand-in.
BASELINE_ROWS_PER_SEC_PER_CORE = 8.0e5
LOG2_ROWS = 20


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


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from zkevm_circuits_tpu.models import ram_permutation as ram
    from zkevm_circuits_tpu.runtime import native

    measured_baseline = native.ram_row_check_baseline()
    baseline = max(measured_baseline, BASELINE_ROWS_PER_SEC_PER_CORE)

    n = 1 << LOG2_ROWS
    unsorted_t, sorted_t = build_tapes_np(n)
    # segment-boundary chain witnesses: ~512x less host->device chain traffic;
    # the check re-derives segments on device in parallel
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

    rows_per_sec = n / check_s
    result = {
        "metric": "ram_permutation constraint-eval rows/sec/chip (2^20-row trace)",
        "value": round(rows_per_sec, 1),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_sec / baseline, 3),
    }
    print(json.dumps(result))
    print(
        f"# details: check={check_s*1000:.1f}ms (first {check_first:.1f}s), "
        f"witness-gen={witness_s:.2f}s (first {witness_first:.1f}s), "
        f"witness rows/s={n/witness_s:.0f} (vs baseline "
        f"{n/witness_s/baseline:.2f}x), "
        f"baseline=max(measured {measured_baseline:.0f}, est "
        f"{BASELINE_ROWS_PER_SEC_PER_CORE:.0f}) rows/s/core, "
        f"device={jax.devices()[0]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
