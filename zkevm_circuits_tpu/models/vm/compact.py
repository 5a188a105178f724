"""main_vm multi-instance ClosedFormInput (ref src/main_vm/mod.rs:47-229).

A long EraVM run of n*limit cycles is sliced into n circuit instances of
`limit` cycles each.  Instance k's hidden FSM input/output are the FULL
VmLocalState at cycle boundaries k*limit and (k+1)*limit (ref
`base_structures/vm_state/mod.rs:92-109` — every field of the state is
committed, so an adversary cannot splice incompatible instances).

The observable input is the VmInputData analog (ref `src/main_vm/input.rs`):
per-block context (default AA code hash, zkporter availability) plus the
block rollback-queue tail; the observable output is VmOutputData — the
final memory / decommittment / log queue states.

Boot checks (ref `src/main_vm/loading.rs:13-226`): the first instance's
row-0 state must BE the bootloader boot state — formal calldata fat
pointer in r1, bootloader context, and the callstack sponge equal to the
4-round Poseidon2 absorption of the empty-entry encoding whose rollback
head/tail are pinned to the block rollback tail.  Exit invariant (ref
`mod.rs:147-160`): at the final boundary the callstack is empty and pc==0.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...isa import system_params as sp
from ...ops import gf, poseidon2
from ...utils import protocol
from .circuit import _enc32

U32C = jnp.uint32

# (key, kind) in canonical encoding order.  kind: "u32" scalar column,
# "bool", "vec<k>" u32 vector column, "gf<k>" GF lanes column.
VM_LOCAL_STATE_LAYOUT = (
    ("regs", "vec120"),          # (15,8) u32 flattened
    ("regs_ptr", "bvec15"),
    ("f_of", "bool"), ("f_eq", "bool"), ("f_gt", "bool"),
    ("ts", "u32"), ("page_counter", "u32"), ("tx_number", "u32"),
    ("prev_code_page", "u32"), ("prev_super_pc", "u32"),
    ("prev_code_word", "vec8"),
    ("pending_exc", "bool"), ("ergs_pp", "u32"),
    ("ctx_u128", "vec4"),
    ("cs_depth", "u32"), ("cs_sponge", "gf12"),
    ("mem_q_state", "gf12"), ("mem_q_len", "u32"),
    ("dec_q_state", "gf12"), ("dec_q_len", "u32"),
    ("log_fwd_tail", "gf4"), ("log_fwd_len", "u32"),
    ("ctx_rq_head", "gf4"), ("ctx_rq_tail", "gf4"), ("ctx_rq_len", "u32"),
    ("ctx_this", "vec5"), ("ctx_caller", "vec5"), ("ctx_code_address", "vec5"),
    ("ctx_code_page", "u32"), ("ctx_base_page", "u32"),
    ("ctx_heap_bound", "u32"), ("ctx_aux_heap_bound", "u32"),
    ("ctx_pc", "u32"), ("ctx_sp", "u32"), ("ctx_eh", "u32"),
    ("ctx_ergs", "u32"),
    ("ctx_is_static", "bool"), ("ctx_is_kernel", "bool"),
    ("ctx_is_local", "bool"),
    ("ctx_shard_this", "u32"), ("ctx_shard_caller", "u32"),
    ("ctx_shard_code", "u32"),
    ("ctx_ctx_u128", "vec4"),
)


def encode_local_state(dw: dict, rows) -> gf.GF:
    """VmLocalState rows -> GF lane encoding, shape (len(rows), L)."""
    rows = jnp.asarray(rows)
    lanes = []
    for key, kind in VM_LOCAL_STATE_LAYOUT:
        col = dw[key]
        if kind.startswith("gf"):
            g = col[rows]
            for k in range(int(kind[2:])):
                lanes.append(g[..., k])
        elif kind == "u32":
            lanes.append(gf.from_u32(col[rows]))
        elif kind == "bool":
            lanes.append(gf.from_u32(col[rows].astype(U32C)))
        elif kind == "bvec15":
            v = col[rows].astype(U32C)  # (n, 15) -> one packed lane
            packed = jnp.zeros(v.shape[:-1], U32C)
            for k in range(15):
                packed = packed | (v[..., k] << U32C(k))
            lanes.append(gf.from_u32(packed))
        elif kind == "vec120":
            v = col[rows].reshape(*rows.shape, 120)
            for k in range(120):
                lanes.append(gf.from_u32(v[..., k]))
        else:  # vecK
            k_n = int(kind[3:])
            v = col[rows]
            for k in range(k_n):
                lanes.append(gf.from_u32(v[..., k]))
    return gf.stack(lanes, axis=-1)


def _queue_state_enc(state12: gf.GF, length) -> gf.GF:
    return gf.concat(
        [state12, gf.expand_dims(gf.from_u32(jnp.asarray(length, U32C)), -1)],
        axis=-1,
    )


def observable_input_encoding(dw: dict) -> gf.GF:
    """VmInputData analog (ref input.rs:33-47), shape (1, L): per-block
    context + the block rollback tail + the memory-queue INITIAL state (the
    ts=0 bootloader-heap pushes the scheduler made before handing over)."""
    aa = dw["default_aa_code_hash"].reshape(1, 8)
    lanes = [gf.from_u32(dw["zkporter_available"].astype(U32C).reshape(1))]
    for k in range(8):
        lanes.append(gf.from_u32(aa[:, k]))
    rb = dw["block_rollback_tail"].reshape(1, 4)
    for k in range(4):
        lanes.append(rb[:, k])
    mem0 = dw["mem_q_state"][jnp.asarray([0])]
    for k in range(12):
        lanes.append(mem0[..., k])
    lanes.append(gf.from_u32(dw["mem_q_len"][jnp.asarray([0])]))
    dec0 = dw["dec_q_state"][jnp.asarray([0])]
    for k in range(12):
        lanes.append(dec0[..., k])
    lanes.append(gf.from_u32(dw["dec_q_len"][jnp.asarray([0])]))
    return gf.stack(lanes, axis=-1)


def observable_output_encoding(dw: dict) -> gf.GF:
    """VmOutputData analog (ref input.rs:71-90), shape (1, L): the final
    log / memory / decommittment queue states."""
    n_last = dw["ts"].shape[0] - 1
    rows = jnp.asarray([n_last])
    return gf.concat(
        [
            _queue_state_enc(dw["log_fwd_tail"][rows], dw["log_fwd_len"][rows]),
            _queue_state_enc(dw["mem_q_state"][rows], dw["mem_q_len"][rows]),
            _queue_state_enc(dw["dec_q_state"][rows], dw["dec_q_len"][rows]),
        ],
        axis=-1,
    )


def _boot_sponge(block_rollback_tail: gf.GF) -> gf.GF:
    """Callstack sponge after absorbing the empty entry (loading.rs:95-171):
    an all-zero kernel-mode record whose rollback head/tail are the block
    rollback tail."""
    one = jnp.ones((1,), U32C)
    zero = jnp.zeros((1,), U32C)
    zf = jnp.zeros((1,), bool)
    z5 = jnp.zeros((1, 5), U32C)
    z4 = jnp.zeros((1, 4), U32C)
    rb = block_rollback_tail.reshape(1, 4)
    enc = _enc32(
        dict(
            rq_head=rb, rq_tail=rb,
            code_address=z5, this=z5, caller=z5, ctx_u128=z4,
            code_page=zero, base_page=zero, pc=zero, sp=zero,
            shard_this=zero, shard_caller=zero, shard_code=zero,
            is_static=zf, is_kernel=one.astype(bool), is_local=zf,
            ergs=zero, eh=zero, heap_bound=zero, aux_heap_bound=zero,
            rq_len=zero,
        )
    )
    st = gf.zeros((1, 12))
    for r in range(4):
        st = poseidon2.permutation(
            gf.concat([enc[..., 8 * r : 8 * r + 8], st[..., 8:]], axis=-1)
        )
    return st


def boot_and_exit_residuals(dw: dict) -> dict:
    """Row-0 boot-state pins + final-row exit invariants (device booleans)."""
    res = {}
    r0 = jnp.asarray([0])
    n_last = dw["ts"].shape[0] - 1
    rl = jnp.asarray([n_last])

    # --- registers: r1 = formal calldata fat pointer, rest zero ---
    regs0 = dw["regs"][0]  # (15, 8)
    r1_expected = jnp.zeros(8, U32C).at[1].set(U32C(sp.BOOTLOADER_CALLDATA_PAGE))
    res["boot_r1"] = (regs0[0] == r1_expected).all() & dw["regs_ptr"][0, 0]
    res["boot_regs_clear"] = (regs0[1:] == 0).all() & (~dw["regs_ptr"][0, 1:]).all()

    # --- scalar state pins ---
    pins = [
        ("f_of", 0), ("f_eq", 0), ("f_gt", 0),
        ("ts", sp.STARTING_TIMESTAMP), ("page_counter", sp.STARTING_BASE_PAGE),
        ("tx_number", 0), ("prev_code_page", 0), ("prev_super_pc", 0),
        ("pending_exc", 0), ("ergs_pp", 0), ("cs_depth", 1),
        ("log_fwd_len", 0),
        ("ctx_rq_len", 0),
        ("ctx_code_page", sp.BOOTLOADER_CODE_PAGE),
        ("ctx_base_page", sp.BOOTLOADER_BASE_PAGE),
        ("ctx_heap_bound", sp.BOOTLOADER_MAX_MEMORY),
        ("ctx_aux_heap_bound", sp.BOOTLOADER_MAX_MEMORY),
        ("ctx_pc", 0), ("ctx_sp", 0),
        ("ctx_eh", sp.INITIAL_FRAME_FORMAL_EH_LOCATION),
        ("ctx_ergs", sp.VM_INITIAL_FRAME_ERGS),
        ("ctx_is_static", 0), ("ctx_is_kernel", 1), ("ctx_is_local", 0),
        ("ctx_shard_this", 0), ("ctx_shard_caller", 0), ("ctx_shard_code", 0),
    ]
    ok = jnp.asarray(True)
    for key, val in pins:
        col = dw[key][0]
        ok = ok & (col.astype(U32C) == U32C(val))
    res["boot_scalars"] = ok
    res["boot_vectors"] = (
        (dw["prev_code_word"][0] == 0).all()
        & (dw["ctx_u128"][0] == 0).all()
        & (dw["ctx_ctx_u128"][0] == 0).all()
        & (dw["ctx_caller"][0] == 0).all()
    )
    boot_addr = np.array(
        [(sp.BOOTLOADER_FORMAL_ADDRESS >> (32 * k)) & 0xFFFFFFFF for k in range(5)],
        np.uint32,
    )
    res["boot_address"] = (dw["ctx_this"][0] == boot_addr).all() & (
        dw["ctx_code_address"][0] == boot_addr
    ).all()

    # --- the log queue starts empty; the memory/decommit queues' initial
    # states are NOT pinned to zero — they are bound into the observable
    # input, where the scheduler derives them from its own ts=0 heap pushes
    # and the bootloader decommit push (scheduler mod.rs:152-172) ---
    res["boot_queues"] = gf.is_zero(dw["log_fwd_tail"][r0]).all()
    rb = dw["block_rollback_tail"].reshape(1, 4)
    res["boot_rollback_chain"] = (
        gf.equal(dw["ctx_rq_head"][r0], rb).all()
        & gf.equal(dw["ctx_rq_tail"][r0], rb).all()
    )

    # --- callstack sponge == 4-round absorption of the empty entry ---
    res["boot_cs_sponge"] = gf.equal(
        dw["cs_sponge"][r0], _boot_sponge(dw["block_rollback_tail"])
    ).all()

    # --- exit invariants at the final boundary (mod.rs:147-160) ---
    res["exit_callstack_empty"] = dw["cs_depth"][rl][0] == 0
    res["exit_pc_zero"] = dw["ctx_pc"][rl][0] == 0
    return res


def vm_instance_compact_forms(dw: dict, limit: int):
    """Slice an n*limit-cycle device witness into n ClosedFormInput compact
    forms (ref mod.rs:178-229) + the boot/exit residual dict.

    Instance k: hidden fsm in/out = VmLocalState at rows k*limit and
    (k+1)*limit; start = (k==0); completion = (k==n-1).  Returns
    (compact_form_batch, residuals)."""
    total = dw["ts"].shape[0] - 1
    assert total % limit == 0, (total, limit)
    n = total // limit
    bounds = jnp.arange(n + 1) * limit
    states = encode_local_state(dw, bounds)  # (n+1, L)
    fsm_in, fsm_out = states[:-1], states[1:]

    idx = jnp.arange(n)
    start_flags = idx == 0
    completion_flags = idx == (n - 1)

    obs_in = observable_input_encoding(dw)
    obs_out = observable_output_encoding(dw)
    obs_in_b = gf.GF(
        jnp.broadcast_to(obs_in.lo, (n,) + obs_in.lo.shape[1:]),
        jnp.broadcast_to(obs_in.hi, (n,) + obs_in.hi.shape[1:]),
    )
    obs_out_b = gf.GF(
        jnp.broadcast_to(obs_out.lo, (n,) + obs_out.lo.shape[1:]),
        jnp.broadcast_to(obs_out.hi, (n,) + obs_out.hi.shape[1:]),
    )

    forms = protocol.compact_form_from_parts(
        start_flags, completion_flags, obs_in_b, obs_out_b, fsm_in, fsm_out
    )
    residuals = boot_and_exit_residuals(dw)
    chain = protocol.check_instance_chaining(
        forms.start_flag,
        forms.completion_flag,
        forms.hidden_fsm_input_commitment,
        forms.hidden_fsm_output_commitment,
    )
    residuals.update({"instance_" + k: v for k, v in chain.items()})
    return forms, residuals


# ---------------------------------------------------------------------------
# Per-instance sharded re-evaluation (the pipeline-parallel analog)
# ---------------------------------------------------------------------------


def vm_instance_windows(dw: dict, limit: int):
    """Slice the device witness into n overlapping per-instance windows.

    State columns (leading dim total+1) become (n, limit+1, ...) windows —
    consecutive instances SHARE their boundary row, which is exactly the
    VmLocalState the compact forms commit as hidden FSM input/output, so a
    window-local eval plus `check_instance_chaining` equals the monolithic
    eval.  Per-cycle columns (leading dim total) become (n, limit, ...).
    Everything else (per-block constants like `block_rollback_tail`) is
    broadcast.  Returns (windows, vmap_in_axes, n)."""
    total = int(dw["ts"].shape[0]) - 1
    assert total % limit == 0, (total, limit)
    n = total // limit
    state_idx = np.arange(n)[:, None] * limit + np.arange(limit + 1)[None, :]
    cyc_idx = state_idx[:, :-1]
    windows, axes = {}, {}
    # Per-block constants are classified by NAME, not by leading dim: a
    # constant column's shape can coincide with total/total+1 at small cycle
    # counts (e.g. default_aa_code_hash (8,) when total=8) and must never be
    # windowed with row indices.
    const_keys = {
        "block_rollback_tail", "default_aa_code_hash", "zkporter_available",
    }
    for k, v in dw.items():
        shape = (v.lo if isinstance(v, gf.GF) else v).shape
        lead = int(shape[0]) if len(shape) else -1
        if k in const_keys:
            windows[k], axes[k] = v, None
        elif lead == total + 1:
            windows[k], axes[k] = v[state_idx], 0
        elif lead == total:
            windows[k], axes[k] = v[cyc_idx], 0
        else:
            windows[k], axes[k] = v, None
    return windows, axes, n


def vm_eval_instances_sharded(dw: dict, limit: int, mesh, axis: str = "inst"):
    """Evaluate the VM circuit once PER ClosedFormInput instance with
    instance k placed on mesh slot k of `axis` (ROADMAP #4; the role of one
    prover machine per circuit instance in the reference's deployment).

    The circuit body is `eval_constraints` unchanged — vmapped over the
    window axis and jit-sharded so XLA keeps each instance's rows local to
    its device (transition checks never cross a window edge by
    construction).  Returns the residual dict with a leading (n,) instance
    axis per entry."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .circuit import eval_constraints

    windows, axes, n = vm_instance_windows(dw, limit)
    shardings = {
        k: NamedSharding(mesh, P(axis) if axes[k] == 0 else P())
        for k in windows
    }
    windows = jax.device_put(windows, shardings)
    fn = jax.jit(
        jax.vmap(lambda w_: eval_constraints(w_, limit), in_axes=(axes,)),
        static_argnums=(),
    )
    return fn(windows)
