"""Stage-by-stage wall profile of the STARK prover on the real TPU.

Mirrors prover/stark.prove's flow with timers around every stage, plus
tunnel micro-benchmarks (RTT, pull bandwidth, dispatch pipelining) so the
optimization targets the measured wall, not guesses.  Read-only: no repo
behavior changes.  Run: python scripts/profile_prover.py [log_n]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 16

T0 = time.time()


def t(msg):
    print(f"[{time.time()-T0:8.2f}s] {msg}", flush=True)


def main():
    t(f"device={jax.devices()[0]}")

    # ---- tunnel micro-benchmarks ----
    x = jnp.zeros(())
    jax.block_until_ready(x)
    n_rtt = 20
    t0 = time.time()
    for _ in range(n_rtt):
        _ = float(jax.block_until_ready(jnp.zeros(()) + 1.0))
    rtt = (time.time() - t0) / n_rtt
    t(f"micro: RTT (tiny dispatch+pull) = {rtt*1000:.1f} ms")

    big = jnp.zeros((1 << 21,), jnp.uint64)  # 16 MB
    jax.block_until_ready(big)
    t0 = time.time()
    _ = np.asarray(big)
    bw = 16 / (time.time() - t0)
    t(f"micro: pull bandwidth = {bw:.1f} MB/s (16MB)")

    h = jnp.asarray(np.zeros((1 << 21,), np.uint64))
    t0 = time.time()
    h = jax.device_put(np.zeros((1 << 21,), np.uint64))
    jax.block_until_ready(h)
    t(f"micro: push 16MB = {time.time()-t0:.3f}s")

    f = jax.jit(lambda v: v + 1)
    jax.block_until_ready(f(big))
    t0 = time.time()
    y = big
    for _ in range(50):
        y = f(y)
    jax.block_until_ready(y)
    t(f"micro: 50 chained jit dispatches = {time.time()-t0:.3f}s total")

    # ---- stage profile of the sorter proof ----
    from bench import build_tapes_np
    from zkevm_circuits_tpu.models import ram_permutation as ram
    from zkevm_circuits_tpu.prover import pipeline, stark
    from zkevm_circuits_tpu.ops import fri, gf, ntt, merkle
    from zkevm_circuits_tpu.ops.gf import GF, MODULUS

    n = 1 << LOG_N
    unsorted_t, sorted_t = build_tapes_np(n)
    cfg = ram.RamPermutationConfig(limit=n, chain_stride=512)
    t0 = time.time()
    w = ram.generate_witness_host_tapes(unsorted_t, sorted_t, cfg)
    t(f"witness gen: {time.time()-t0:.2f}s")

    t0 = time.time()
    trace, public = pipeline.permutation_trace(w)
    jax.block_until_ready(trace.lo)
    t(f"trace build: {time.time()-t0:.2f}s  shape={trace.shape}")

    air = pipeline.permutation_air()
    params = stark.StarkParams(log_n=LOG_N)

    for rep in range(2):
        tag = "cold" if rep == 0 else "warm"
        tr0 = time.time()

        t0 = time.time()
        tree1 = stark._commit_columns(trace, params)
        t(f"{tag} commit phase1 (incl pulls): {time.time()-t0:.2f}s")

        t0 = time.time()
        ch, tsc = stark.challenges_from_cap(tree1["cap"], air, None)
        stark._absorb_public(tsc, public, air)
        t(f"{tag} challenge round: {time.time()-t0:.2f}s")

        all_cols = trace
        lde_all = tree1["lde"]
        trees = [tree1]

        t0 = time.time()
        alpha = int(np.asarray(tsc.challenge_ext().c0.astype_u64()))
        quotient = stark._compose_domain(lde_all, air, alpha, params,
                                         public, ch)
        jax.block_until_ready(quotient.lo)
        t(f"{tag} compose domain: {time.time()-t0:.2f}s")

        t0 = time.time()
        q_tree = stark._commit_evals(quotient, params)
        tsc.absorb(q_tree["cap"])
        t(f"{tag} q commit: {time.time()-t0:.2f}s")

        t0 = time.time()
        z = stark._ood_point(tsc, params.log_n, params.log_blowup,
                             params.coset_shift)
        wroot = ntt.root_of_unity(params.log_n)
        wz = z * wroot % MODULUS
        trace_z = stark._barycentric_eval(all_cols, z, params.log_n, 1)
        trace_wz = stark._barycentric_eval(all_cols, wz, params.log_n, 1)
        q_z = stark._barycentric_eval(
            quotient, z, params.log_n + params.log_blowup, params.coset_shift)
        ood = dict(
            trace_z=np.asarray(trace_z.astype_u64(), np.uint64),
            trace_wz=np.asarray(trace_wz.astype_u64(), np.uint64),
            q_z=int(np.asarray(q_z.astype_u64())),
        )
        tsc.absorb(gf.from_u64(np.concatenate(
            [ood["trace_z"], ood["trace_wz"], [np.uint64(ood["q_z"])]])))
        lam = int(np.asarray(tsc.challenge_ext().c0.astype_u64()))
        t(f"{tag} OOD round (3 barycentrics + FS): {time.time()-t0:.2f}s")

        t0 = time.time()
        m = air.total_cols
        blowup = 1 << params.log_blowup
        N = n * blowup
        lpows, lam_m, lam_2m = stark._lambda_weights(lam, m)
        xs = gf.from_u64(stark._domain_points(
            params.log_n + params.log_blowup, params.coset_shift))
        inv_xz = gf.inv(gf.sub(xs, gf.constant(z)))
        inv_xwz = gf.inv(gf.sub(xs, gf.constant(wz)))
        a_z = gf.sum_mod(gf.mul(trace_z, lpows), axis=-1)
        a_wz = gf.sum_mod(gf.mul(trace_wz, lpows), axis=-1)
        deep = stark._deep_combine(
            GF(lde_all.lo.T, lde_all.hi.T), quotient, lpows,
            stark._alpha_gf(lam_m), stark._alpha_gf(lam_2m), a_z, a_wz, q_z,
            inv_xz, inv_xwz)
        jax.block_until_ready(deep.lo)
        t(f"{tag} DEEP combine: {time.time()-t0:.2f}s")

        t0 = time.time()
        fparams = stark._fri_params(air, params)
        fproof = fri.prove(deep, fparams)
        t(f"{tag} FRI prove ({fparams.log_domain}->"
          f"{fparams.final_poly_log_len}): {time.time()-t0:.2f}s")

        t0 = time.time()
        idx_np = np.asarray(fproof.query_indices, np.int64)
        flat_idx = np.concatenate([idx_np, idx_np + N // 2])
        gathered = []
        for tt in trees + [q_tree]:
            rows_u64 = fri.gather_rows(tt["leaves"], flat_idx)
            paths_u64 = fri.gather_paths(tt["levels"], flat_idx)
            gathered.append((rows_u64, paths_u64))
        Qn = len(fproof.query_indices)

        def row_split(v):
            return np.stack([v & np.uint64(0xFFFFFFFF),
                             v >> np.uint64(32)]).astype(np.uint32)

        openings = []
        for qi, idx in enumerate(fproof.query_indices):
            rows = {}
            for tg, k in (("cur", qi), ("cur_pair", Qn + qi)):
                rows[tg] = dict(
                    rows=[row_split(gathered[ti][0][k])
                          for ti in range(len(trees))],
                    paths=[gathered[ti][1][k] for ti in range(len(trees))],
                    q_row=row_split(gathered[-1][0][k]),
                    q_path=gathered[-1][1][k],
                    index=int(flat_idx[k]),
                )
            openings.append(rows)
        proof = stark.StarkProof(
            caps=[tt["cap"] for tt in trees], q_cap=q_tree["cap"], ood=ood,
            fri_proof=fproof, trace_openings=openings)
        t(f"{tag} openings package: {time.time()-t0:.2f}s")
        t(f"{tag} TOTAL prove: {time.time()-tr0:.2f}s")

        t0 = time.time()
        ok = stark.verify(proof, air, params, public)
        t(f"{tag} TOTAL verify: {time.time()-t0:.2f}s ok={ok}")
        assert ok


if __name__ == "__main__":
    main()
