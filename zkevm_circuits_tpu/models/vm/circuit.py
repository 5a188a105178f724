"""main_vm v2 row-parallel constraint evaluation (device side).

Re-derives every cycle transition of the EraVM trace produced by `sim.py`
and checks it against the claimed state columns — the trace-first equivalent
of `vm_cycle` (ref `src/main_vm/cycle.rs:28-795`).  Each residual is a
boolean array; satisfaction = every residual all-True.

Layout: state columns have N+1 rows (row i = state before cycle i); per-
cycle witness columns have N rows.  All 256-bit values are (N, 8) u32 LE
limbs; Poseidon2/queue states are GF pairs (from u64 via gf.from_u64).

Check groups (reference file per group):
  decode/masking        decoded_opcode.rs:42-220, pre_state.rs:88-246
  operands              pre_state.rs:301-482, utils.rs:237-384
  add/sub               opcodes/add_sub.rs
  mul/div               opcodes/mul_div.rs
  shift                 opcodes/shifts.rs (+ BitshiftTable)
  binop/jump/nop        opcodes/{binop,jump,nop}.rs
  context/ptr           opcodes/{context,ptr}.rs
  uma                   opcodes/uma.rs
  log                   opcodes/log.rs
  near/far/ret          opcodes/call_ret_impl/*.rs, call_ret.rs
  sponges               cycle.rs:670-784 (site-direct instead of slot-packed)
  state continuity      cycle.rs:158-668 (the StateDiffsAccumulator role)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...isa import opcodes as isa
from ...isa import system_params as sp
from ...ops import gf, nonnative as nn, poseidon2
from ...base_structures.memory_query import encode_memory_queries, MemoryQueries
from ...base_structures.log_query import (
    LogQueries,
    encode_log_queries,
    encode_with_rollback_flag,
)
from ...base_structures.decommit_query import DecommitQueries, encode_decommit_queries

U32C = jnp.uint32
MASK48 = (1 << 48) - 1

# ---- ISA tables as device constants ----
_PROPS = np.asarray(isa.OPCODES_PROPS_INTEGER_BITMASKS, dtype=np.uint64)
PROPS_LO = jnp.asarray((_PROPS & 0xFFFFFFFF).astype(np.uint32))
PROPS_HI = jnp.asarray((_PROPS >> 32).astype(np.uint32))
PRICES = jnp.asarray(isa.OPCODES_PRICES)

_NOP_SPREAD = isa.NOP_BITSPREAD
_PANIC_SPREAD = isa.PANIC_BITSPREAD
_NOP_ENC = isa.NOP_ENCODING
_PANIC_ENC = isa.PANIC_ENCODING

# 2^s decomposed into 8 u32 limbs for s in 0..256 (BitshiftTable role,
# ref src/tables/bitshift.rs:12-40 — the data is the same by construction)
_SHIFT_LIMBS = np.zeros((257, 8), dtype=np.uint32)
for _s in range(257):
    _v = 1 << _s
    for _k in range(8):
        _SHIFT_LIMBS[_s, _k] = (_v >> (32 * _k)) & 0xFFFFFFFF
SHIFT_LIMBS = jnp.asarray(_SHIFT_LIMBS)


def _bit(lo, hi, t):
    if t < 32:
        return (lo >> U32C(t)) & U32C(1)
    return (hi >> U32C(t - 32)) & U32C(1)


def _bool_bit(lo, hi, t):
    return _bit(lo, hi, t) == 1


def _u256_from_cols(x):
    return x  # (N, 8) u32


def _is_zero256(x):
    return (x == 0).all(-1)


def _eq256(a, b):
    return (a == b).all(-1)


def _lt256(a, b):
    """a < b over (N,8) LE u32 limbs."""
    lt = jnp.zeros(a.shape[:-1], dtype=bool)
    for k in range(8):
        lt = jnp.where(a[..., k] != b[..., k], a[..., k] < b[..., k], lt)
    return lt


def _u16limbs(x):
    """(N,8) u32 -> (N,16) u16-in-u32."""
    lo = x & U32C(0xFFFF)
    hi = x >> U32C(16)
    return jnp.stack([lo, hi], axis=-1).reshape(*x.shape[:-1], 16)


def prepare_device_witness(w: dict) -> dict:
    """Host->device conversion: u64 GF columns to GF pairs, rest to jnp."""
    out = {}
    gf_keys = {
        "cs_sponge", "mem_q_state", "dec_q_state", "log_fwd_tail",
        "ctx_rq_head", "ctx_rq_tail", "rb_prev_head", "call_rb_tail",
        "ret_prev_cs_sponge", "block_rollback_tail",
    }
    for k, v in w.items():
        if k in gf_keys or k in ("ret_popped_rq_head", "ret_popped_rq_tail"):
            out[k] = gf.from_u64(v)
        else:
            arr = np.asarray(v)
            if arr.dtype != np.bool_:
                arr = arr.astype(np.uint32)
            out[k] = jnp.asarray(arr)
    return out


# --------------------------------------------------------------------------
# sponge helpers (site-direct relations)
# --------------------------------------------------------------------------


def _absorb_full(state: gf.GF, enc: gf.GF) -> gf.GF:
    """Absorb-by-replacement of lanes 0..8 then permute.  state (N,12),
    enc (N,8)."""
    st = gf.concat([enc, state[..., 8:]], axis=-1)
    return poseidon2.permutation(st)


def _narrow_rounds(enc20: gf.GF, tail: gf.GF):
    """3-round narrow queue push in the FRAMEWORK-STANDARD convention
    (ops/queues.narrow_state_transition: previous tail in the capacity
    lanes, the 20-element encoding zero-padded to 24 absorbed by rate
    replacement) — the log queue is a standard CircuitQueue in the
    reference, so the VM's pushes must chain bit-identically with the demux
    input queue.  enc20 (N,20), tail (N,4).
    Returns (new_tail (N,4), [r0_out, r1_out, r2_out] full states)."""
    n = enc20.lo.shape[:-1]
    st0 = gf.concat([enc20[..., 0:8], tail], axis=-1)
    r0 = poseidon2.permutation(st0)
    st1 = gf.concat([enc20[..., 8:16], r0[..., 8:]], axis=-1)
    r1 = poseidon2.permutation(st1)
    st2 = gf.concat([enc20[..., 16:20], gf.zeros(n + (4,)), r1[..., 8:]], axis=-1)
    r2 = poseidon2.permutation(st2)
    return r2[..., 0:4], (r0, r1, r2)


def _gf_sel(mask, a: gf.GF, b: gf.GF) -> gf.GF:
    m = mask
    while m.ndim < a.lo.ndim:
        m = m[..., None]
    return gf.GF(jnp.where(m, a.lo, b.lo), jnp.where(m, a.hi, b.hi))


def _gf_eq(a: gf.GF, b: gf.GF):
    return ((a.lo == b.lo) & (a.hi == b.hi)).all(-1)


def _pack_lohi(lo32, hi_bits):
    """GF element = lo32 + hi_bits * 2^32 (all < 2^57 < p)."""
    return gf.GF(jnp.asarray(lo32, jnp.uint32), jnp.asarray(hi_bits, jnp.uint32))


# --------------------------------------------------------------------------
# the evaluation
# --------------------------------------------------------------------------


def eval_constraints(w: dict, limit: int) -> dict:
    """Row-parallel transition checks.  `w` = prepare_device_witness output."""
    N = limit
    res = {}
    rows = jnp.arange(N)

    # ---- state views: X_b = before-cycle, X_a = after-cycle ----
    def b(k):
        v = w[k]
        return v[:-1] if isinstance(v, gf.GF) else v[:-1]

    def a(k):
        v = w[k]
        return v[1:] if isinstance(v, gf.GF) else v[1:]

    # ================= prestate (pre_state.rs:88-246) =================
    depth_b = b("cs_depth")
    should_skip = depth_b == 0
    pending_b = b("pending_exc")
    exec_pending = pending_b & ~should_skip
    should_try_read = ~should_skip & ~pending_b

    pc_b = b("ctx_pc")
    pc_plus_one = (pc_b + 1) & U32C(0xFFFF)
    super_pc = pc_b >> U32C(2)
    sub_pc = pc_b & U32C(3)
    should_read_new = ~(
        (b("prev_code_page") == b("ctx_code_page")) & (super_pc == b("prev_super_pc"))
    )
    should_read_op = should_try_read & should_read_new
    res["should_read_opcode"] = w["should_read_opcode"] == should_read_op

    ts_b = b("ts")
    res["timestamp"] = a("ts") == jnp.where(should_skip, ts_b, ts_b + 4)

    # code word selection + prev_* updates
    cw = jnp.where(should_read_op[:, None], w["code_word_read"], b("prev_code_word"))
    res["prev_code_word"] = _eq256(a("prev_code_word"), cw)
    res["prev_code_page"] = a("prev_code_page") == b("ctx_code_page")
    res["prev_super_pc"] = a("prev_super_pc") == jnp.where(
        should_skip, b("prev_super_pc"), super_pc
    )

    # raw opcode: limbs (6-2k, 7-2k) for sub-pc k, then skip/pending masks
    raw_lo = jnp.zeros(N, U32C)
    raw_hi = jnp.zeros(N, U32C)
    for k in range(4):
        m = sub_pc == k
        raw_lo = jnp.where(m, cw[:, 6 - 2 * k], raw_lo)
        raw_hi = jnp.where(m, cw[:, 7 - 2 * k], raw_hi)
    raw_lo = jnp.where(should_skip, U32C(_NOP_ENC & 0xFFFFFFFF), raw_lo)
    raw_hi = jnp.where(should_skip, U32C(_NOP_ENC >> 32), raw_hi)
    raw_lo = jnp.where(exec_pending, U32C(_PANIC_ENC & 0xFFFFFFFF), raw_lo)
    raw_hi = jnp.where(exec_pending, U32C(_PANIC_ENC >> 32), raw_hi)
    res["raw_opcode"] = (w["raw_opcode_lo"] == raw_lo) & (w["raw_opcode_hi"] == raw_hi)
    res["pending_clear"] = ~exec_pending | ~a("pending_exc") | should_skip
    # (a: pending is consumed; families may set it again — continuity below)

    # ============ decode + fast exceptions (decoded_opcode.rs) ============
    variant_idx = raw_lo & U32C(0x7FF)
    cond = (raw_lo >> U32C(13)) & U32C(7)
    src0_enc = (raw_lo >> U32C(16)) & U32C(0xF)
    src1_enc = (raw_lo >> U32C(20)) & U32C(0xF)
    dst0_enc = (raw_lo >> U32C(24)) & U32C(0xF)
    dst1_enc = (raw_lo >> U32C(28)) & U32C(0xF)
    imm0 = raw_hi & U32C(0xFFFF)
    imm1 = raw_hi >> U32C(16)

    price = PRICES[variant_idx]
    props_lo = PROPS_LO[variant_idx]
    props_hi = PROPS_HI[variant_idx]

    f_of, f_eq, f_gt = b("f_of"), b("f_eq"), b("f_gt")
    cond_ok = (
        (cond == isa.COND_ALWAYS)
        | ((cond == isa.COND_GT) & f_gt)
        | ((cond == isa.COND_LT) & f_of)
        | ((cond == isa.COND_EQ) & f_eq)
        | ((cond == isa.COND_GE) & (f_gt | f_eq))
        | ((cond == isa.COND_LE) & (f_of | f_eq))
        | ((cond == isa.COND_NE) & ~f_eq)
        | ((cond == isa.COND_GT_OR_LT) & (f_gt | f_of))
    )

    masked_price = jnp.where(should_skip, U32C(0), price)
    ergs0 = b("ctx_ergs")
    out_of_ergs = masked_price > ergs0
    ergs1 = jnp.where(out_of_ergs, U32C(0), ergs0 - masked_price)

    AUX = isa.AUX_BITS_OFFSET
    kernel_only = _bool_bit(props_lo, props_hi, AUX + isa.KERNEL_MODE_FLAG_IDX)
    static_ok = _bool_bit(
        props_lo, props_hi, AUX + isa.CAN_BE_USED_IN_STATIC_CONTEXT_FLAG_IDX
    )
    explicit_panic = _bool_bit(props_lo, props_hi, AUX + isa.EXPLICIT_PANIC_FLAG_IDX)
    kernel_exc = kernel_only & ~b("ctx_is_kernel")
    static_exc = b("ctx_is_static") & ~static_ok
    callstack_full = depth_b == sp.VM_MAX_STACK_DEPTH
    mask_panic = explicit_panic | out_of_ergs | kernel_exc | static_exc | callstack_full
    mask_nop = ~mask_panic & ~cond_ok
    mask_any = mask_panic | mask_nop

    # effective 48-bit property spread after masking
    eff_lo = props_lo
    eff_hi = props_hi & U32C(0xFFFF)  # drop aux bits (48..51)
    eff_lo = jnp.where(mask_panic, U32C(_PANIC_SPREAD & 0xFFFFFFFF), eff_lo)
    eff_hi = jnp.where(mask_panic, U32C(_PANIC_SPREAD >> 32), eff_hi)
    eff_lo = jnp.where(mask_nop, U32C(_NOP_SPREAD & 0xFFFFFFFF), eff_lo)
    eff_hi = jnp.where(mask_nop, U32C(_NOP_SPREAD >> 32), eff_hi)

    def opbit(t):  # opcode-type boolean
        return _bool_bit(eff_lo, eff_hi, isa.TYPE_BITS_OFFSET + t)

    def varbit(t):  # sub-variant boolean
        return _bool_bit(eff_lo, eff_hi, isa.VARIANT_BITS_OFFSET + t)

    def flagbit(t):  # per-opcode flag boolean
        return _bool_bit(eff_lo, eff_hi, isa.FLAG_BITS_OFFSET + t)

    def srcmode(t):
        return _bool_bit(eff_lo, eff_hi, isa.INPUT_BITS_OFFSET + t)

    def dstmode(t):
        return _bool_bit(eff_lo, eff_hi, isa.OUTPUT_BITS_OFFSET + t)

    res["no_invalid"] = ~opbit(isa.INVALID)

    src0_idx = jnp.where(mask_any, U32C(0), src0_enc)
    src1_idx = jnp.where(mask_any, U32C(0), src1_enc)
    dst0_idx = jnp.where(mask_any, U32C(0), dst0_enc)
    dst1_idx = jnp.where(mask_any, U32C(0), dst1_enc)

    # ============ operand resolution (utils.rs:237-384) ============
    regs_b = b("regs")  # (N, 15, 8)
    regs_ptr_b = b("regs_ptr")

    def read_reg(idx):
        v = regs_b[rows, jnp.maximum(idx, 1) - 1]
        p = regs_ptr_b[rows, jnp.maximum(idx, 1) - 1]
        z = idx == 0
        return jnp.where(z[:, None], U32C(0), v), jnp.where(z, False, p)

    draft_src0, draft_src0_ptr = read_reg(src0_idx)
    src1_reg, src1_reg_ptr = read_reg(src1_idx)
    dst0_reg, _ = read_reg(dst0_idx)

    base_page = b("ctx_base_page")
    stack_page = base_page + 1
    heap_page = base_page + 2
    aux_heap_page = base_page + 3
    sp_b = b("ctx_sp")

    is_nop_op = opbit(isa.NOP)
    src_reg_low = draft_src0[:, 0] & U32C(0xFFFF)
    idx_abs = (src_reg_low + imm0) & U32C(0xFFFF)
    idx_rel = (sp_b - idx_abs) & U32C(0xFFFF)
    use_code = srcmode(isa.SRC_CODE)
    use_stack_abs = srcmode(isa.SRC_STACK_ABSOLUTE)
    use_stack_rel = srcmode(isa.SRC_STACK_OFFSET)
    use_stack_pp = srcmode(isa.SRC_STACK_PUSH_POP)
    use_stack = use_stack_abs | use_stack_rel | use_stack_pp
    src0_did_read = (use_stack | use_code) & ~is_nop_op
    res["src0_did_read"] = w["src0_did_read"] == src0_did_read
    src0_page = jnp.where(use_stack, stack_page, b("ctx_code_page"))
    src0_index = jnp.where(use_code | use_stack_abs, idx_abs, idx_rel)
    sp_after_src = jnp.where(use_stack_pp, idx_rel, sp_b)

    dst0_reg_low = dst0_reg[:, 0] & U32C(0xFFFF)
    d_idx_abs = (dst0_reg_low + imm1) & U32C(0xFFFF)
    d_idx_rel_push = (sp_after_src + d_idx_abs) & U32C(0xFFFF)
    d_idx_rel = (sp_after_src - d_idx_abs) & U32C(0xFFFF)
    d_abs = dstmode(isa.DST_STACK_ABSOLUTE)
    d_rel = dstmode(isa.DST_STACK_OFFSET)
    d_pp = dstmode(isa.DST_STACK_PUSH_POP)
    dst0_did_write = (d_abs | d_rel | d_pp) & ~is_nop_op
    res["dst0_did_write"] = w["dst0_did_write"] == dst0_did_write
    dst0_index = jnp.where(d_abs, d_idx_abs, jnp.where(d_pp, sp_after_src, d_idx_rel))
    sp_new = jnp.where(d_pp, d_idx_rel_push, sp_after_src)
    # far_call installs a fresh frame (sp=0, saved_context.rs defaults); ret
    # (incl. mask-panic rows, whose spread IS the panic-ret spread) restores
    # the popped frame's sp — the pop is bound by the callstack sponge.
    exp_sp = jnp.where(opbit(isa.FAR_CALL), U32C(0), sp_new)
    exp_sp = jnp.where(opbit(isa.RET), w["ret_popped_sp"], exp_sp)
    res["sp"] = a("ctx_sp") == jnp.where(should_skip, sp_b, exp_sp)
    res["dst0_location"] = (w["dst0_index"] == dst0_index) & (
        w["dst0_page"] == stack_page
    )

    # src0 selection + swap + fat-ptr erasure (pre_state.rs:399-482)
    imm_as_val = jnp.concatenate(
        [imm0[:, None], jnp.zeros((N, 7), U32C)], axis=-1
    )
    src0_v = jnp.where(
        srcmode(isa.SRC_REG)[:, None],
        draft_src0,
        jnp.where(srcmode(isa.SRC_IMM)[:, None], imm_as_val, w["src0_mem_val"]),
    )
    src0_p = jnp.where(
        srcmode(isa.SRC_REG), draft_src0_ptr,
        jnp.where(srcmode(isa.SRC_IMM), False, w["src0_mem_is_ptr"]),
    )
    src1_v, src1_p = src1_reg, src1_reg_ptr

    is_asym = opbit(isa.SUB) | opbit(isa.DIV) | opbit(isa.SHIFT)
    swap = (is_asym & flagbit(isa.SWAP_OPERANDS_FLAG_IDX_FOR_ARITH_OPCODES)) | (
        opbit(isa.PTR) & flagbit(isa.SWAP_OPERANDS_FLAG_IDX_FOR_PTR_OPCODE)
    )
    s0v = jnp.where(swap[:, None], src1_v, src0_v)
    s1v = jnp.where(swap[:, None], src0_v, src1_v)
    s0p = jnp.where(swap, src1_p, src0_p)
    s1p = jnp.where(swap, src0_p, src1_p)

    not_kernel = ~b("ctx_is_kernel")
    keeps_ptr = (
        opbit(isa.RET) | opbit(isa.PTR) | opbit(isa.UMA) | opbit(isa.FAR_CALL)
    )
    erase0 = s0p & ~keeps_ptr & not_kernel
    erase1 = s1p & not_kernel
    z2 = jnp.zeros((N,), U32C)

    def erase(v, m):
        v = v.at[:, 1].set(jnp.where(m, z2, v[:, 1]))
        v = v.at[:, 2].set(jnp.where(m, z2, v[:, 2]))
        return v

    s0v = erase(s0v, erase0)
    s1v = erase(s1v, erase1)
    s0p = s0p & ~erase0
    s1p = s1p & ~erase1

    res["src0"] = _eq256(w["src0_val"], s0v) & (w["src0_is_ptr"] == s0p)
    res["src1"] = _eq256(w["src1_val"], s1v) & (w["src1_is_ptr"] == s1p)
    src0_val, src1_val = w["src0_val"], w["src1_val"]
    src0_isptr, src1_isptr = w["src0_is_ptr"], w["src1_is_ptr"]

    ctx = dict(
        N=N, rows=rows, res=res, b=b, a=a,
        should_skip=should_skip, exec_pending=exec_pending,
        should_read_op=should_read_op,
        pc_plus_one=pc_plus_one, ts=ts_b, ergs1=ergs1,
        imm0=imm0, imm1=imm1,
        opbit=opbit, varbit=varbit, flagbit=flagbit,
        mask_panic=mask_panic, mask_nop=mask_nop,
        src0_val=src0_val, src1_val=src1_val,
        src0_isptr=src0_isptr, src1_isptr=src1_isptr,
        dst0_idx=dst0_idx, dst1_idx=dst1_idx,
        dst0_did_write=dst0_did_write, dst0_index=dst0_index,
        stack_page=stack_page, heap_page=heap_page,
        aux_heap_page=aux_heap_page,
        src0_did_read=src0_did_read, src0_page=src0_page,
        src0_index=src0_index,
    )
    return _eval_families(w, ctx)


def _eval_families(w: dict, c: dict) -> dict:
    N, rows, res, b, a = c["N"], c["rows"], c["res"], c["b"], c["a"]
    opbit, varbit, flagbit = c["opbit"], c["varbit"], c["flagbit"]
    s0, s1 = c["src0_val"], c["src1_val"]
    s0p, s1p = c["src0_isptr"], c["src1_isptr"]
    imm0, imm1 = c["imm0"], c["imm1"]
    ergs1, ts = c["ergs1"], c["ts"]
    should_skip = c["should_skip"]

    is_add, is_sub = opbit(isa.ADD), opbit(isa.SUB)
    is_mul, is_div = opbit(isa.MUL), opbit(isa.DIV)
    is_jump, is_ctxf = opbit(isa.JUMP), opbit(isa.CONTEXT)
    is_shift, is_binop = opbit(isa.SHIFT), opbit(isa.BINOP)
    is_ptrf, is_ncall = opbit(isa.PTR), opbit(isa.NEAR_CALL)
    is_logf, is_fcall = opbit(isa.LOG), opbit(isa.FAR_CALL)
    is_retf, is_uma = opbit(isa.RET), opbit(isa.UMA)

    set_flags = flagbit(isa.SET_FLAGS_FLAG_IDX)

    # ---------------- add/sub (opcodes/add_sub.rs) ----------------
    def add256(x, y):
        out = jnp.zeros_like(x)
        carry = jnp.zeros(x.shape[:-1], U32C)
        for k in range(8):
            t1 = x[..., k] + y[..., k]
            c1 = t1 < x[..., k]
            t2 = t1 + carry
            c2 = t2 < t1
            out = out.at[..., k].set(t2)
            carry = (c1 | c2).astype(U32C)
        return out, carry == 1

    def sub256(x, y):
        out = jnp.zeros_like(x)
        borrow = jnp.zeros(x.shape[:-1], U32C)
        for k in range(8):
            d1 = x[..., k] - y[..., k]
            b1 = x[..., k] < y[..., k]
            d2 = d1 - borrow
            b2 = d1 < borrow
            out = out.at[..., k].set(d2)
            borrow = (b1 | b2).astype(U32C)
        return out, borrow == 1

    add_r, add_of = add256(s0, s1)
    sub_r, sub_uf = sub256(s0, s1)
    addsub_r = jnp.where(is_add[:, None], add_r, sub_r)
    addsub_of = jnp.where(is_add, add_of, sub_uf)
    addsub_eq = _is_zero256(addsub_r)
    addsub_gt = ~addsub_of & ~addsub_eq

    # ---------------- mul/div (opcodes/mul_div.rs) ----------------
    a16 = _u16limbs(s0)
    b16 = _u16limbs(s1)
    r0_16 = _u16limbs(w["fam_res0"])
    r1_16 = _u16limbs(w["fam_res1"])
    lo_hi = jnp.concatenate([r0_16, r1_16], axis=-1)  # res0 + res1<<256
    mul_id = nn.sides_equal(
        [("prod", a16, b16, 1)], [("lin", lo_hi, 1)], (N,), ncoef=34
    )
    res["mul_relation"] = jnp.where(is_mul, mul_id, True)
    mul_of = ~_is_zero256(w["fam_res1"])
    mul_eq = _is_zero256(w["fam_res0"])
    mul_gt = ~mul_of & ~mul_eq

    div_id = nn.sides_equal(
        [("lin", a16, 1)],
        [("prod", r0_16, b16, 1), ("lin", r1_16, 1)],
        (N,), ncoef=34,
    )
    b_zero = _is_zero256(s1)
    rem_lt = _lt256(w["fam_res1"], s1)
    div_ok = jnp.where(
        b_zero,
        _is_zero256(w["fam_res0"]) & _is_zero256(w["fam_res1"]),
        div_id & rem_lt,
    )
    res["div_relation"] = jnp.where(is_div, div_ok, True)
    div_of = b_zero
    div_eq = ~b_zero & _is_zero256(w["fam_res0"])
    div_gt = ~b_zero & _is_zero256(w["fam_res1"])

    muldiv_r0, muldiv_r1 = w["fam_res0"], w["fam_res1"]
    muldiv_of = jnp.where(is_mul, mul_of, div_of)
    muldiv_eq = jnp.where(is_mul, mul_eq, div_eq)
    muldiv_gt = jnp.where(is_mul, mul_gt, div_gt)

    # ---------------- shift (opcodes/shifts.rs) ----------------
    sh_amt = s1[:, 0] & U32C(0xFF)
    is_rol, is_ror = varbit(isa.SHIFT_ROL), varbit(isa.SHIFT_ROR)
    is_shr = varbit(isa.SHIFT_SHR)
    is_cyclic = is_rol | is_ror
    full_shift = jnp.where(is_ror & (sh_amt != 0), U32C(256) - sh_amt, sh_amt)
    mult = SHIFT_LIMBS[full_shift]  # (N, 8) = 2^full_shift limbs
    m16 = _u16limbs(mult)
    # right shift: a = q * 2^s + r, r < 2^s  (q=res0, r=res1)
    shr_id = nn.sides_equal(
        [("lin", a16, 1)],
        [("prod", r0_16, m16, 1), ("lin", r1_16, 1)],
        (N,), ncoef=34,
    )
    shr_ok = shr_id & _lt256(w["fam_res1"], mult)
    # left shift: a * 2^s = hi<<256 + lo  (lo=res0, hi=res1)
    shl_id = nn.sides_equal(
        [("prod", a16, m16, 1)], [("lin", lo_hi, 1)], (N,), ncoef=34
    )
    res["shift_relation"] = jnp.where(
        is_shift, jnp.where(is_shr, shr_ok, shl_id), True
    )
    shift_r = jnp.where(
        is_shr[:, None],
        w["fam_res0"],
        jnp.where(
            is_cyclic[:, None], w["fam_res0"] | w["fam_res1"], w["fam_res0"]
        ),
    )
    shift_eq = _is_zero256(shift_r)

    # ---------------- binop ----------------
    is_and, is_or = varbit(isa.BINOP_AND), varbit(isa.BINOP_OR)
    binop_r = jnp.where(
        is_and[:, None], s0 & s1, jnp.where(is_or[:, None], s0 | s1, s0 ^ s1)
    )
    binop_eq = _is_zero256(binop_r)

    # ---------------- context (opcodes/context.rs) ----------------
    ctx_res = jnp.zeros((N, 8), U32C)
    v_this, v_caller = varbit(isa.CTX_THIS), varbit(isa.CTX_CALLER)
    v_code = varbit(isa.CTX_CODE_ADDRESS)
    v_meta, v_ergs = varbit(isa.CTX_META), varbit(isa.CTX_ERGS_LEFT)
    v_sp, v_get128 = varbit(isa.CTX_SP), varbit(isa.CTX_GET_CONTEXT_U128)
    v_set128 = varbit(isa.CTX_SET_CONTEXT_U128)
    v_setpp = varbit(isa.CTX_SET_ERGS_PER_PUBDATA)
    v_inctx = varbit(isa.CTX_INCREMENT_TX_NUMBER)

    def put_addr(mask, addr5):
        nonlocal ctx_res
        padded = jnp.concatenate([addr5, jnp.zeros((N, 3), U32C)], axis=-1)
        ctx_res = jnp.where(mask[:, None], padded, ctx_res)

    low32 = jnp.where(v_ergs, ergs1, b("ctx_sp"))
    ctx_res = ctx_res.at[:, 0].set(low32)
    ctx_res = jnp.where(
        v_get128[:, None],
        jnp.concatenate([b("ctx_ctx_u128"), jnp.zeros((N, 4), U32C)], axis=-1),
        ctx_res,
    )
    put_addr(v_this, b("ctx_this"))
    put_addr(v_caller, b("ctx_caller"))
    put_addr(v_code, b("ctx_code_address"))
    meta = jnp.stack(
        [
            b("ergs_pp"), jnp.zeros(N, U32C),
            b("ctx_heap_bound"), b("ctx_aux_heap_bound"),
            jnp.zeros(N, U32C), jnp.zeros(N, U32C), jnp.zeros(N, U32C),
            b("ctx_shard_this")
            | (b("ctx_shard_caller") << U32C(8))
            | (b("ctx_shard_code") << U32C(16)),
        ],
        axis=-1,
    )
    ctx_res = jnp.where(v_meta[:, None], meta, ctx_res)
    ctx_write_dst0 = ~(v_set128 | v_setpp | v_inctx)

    # ---------------- ptr (opcodes/ptr.rs) ----------------
    p_add, p_sub = varbit(isa.PTR_ADD), varbit(isa.PTR_SUB)
    p_pack, p_shrink = varbit(isa.PTR_PACK), varbit(isa.PTR_SHRINK)
    args_bad = ~(s0p & ~s1p)
    b_hi_nz = ~(s1[:, 1:] == 0).all(-1)
    b_lo128_nz = ~(s1[:, :4] == 0).all(-1)
    off_add = s0[:, 0] + s1[:, 0]
    add_of_p = off_add < s0[:, 0]
    off_sub = s0[:, 0] - s1[:, 0]
    sub_uf_p = s0[:, 0] < s1[:, 0]
    len_shrink = s0[:, 3] - s1[:, 0]
    shrink_uf = s0[:, 3] < s1[:, 0]
    ptr_panic = args_bad | (
        (p_add | p_sub) & b_hi_nz
    ) | (p_pack & b_lo128_nz) | (p_add & add_of_p) | (p_sub & sub_uf_p) | (
        p_shrink & shrink_uf
    )
    ptr_r = s0
    ptr_r = ptr_r.at[:, 0].set(
        jnp.where(p_add, off_add, jnp.where(p_sub, off_sub, s0[:, 0]))
    )
    ptr_r = ptr_r.at[:, 3].set(jnp.where(p_shrink, len_shrink, s0[:, 3]))
    ptr_r = jnp.where(
        p_pack[:, None],
        jnp.concatenate([s0[:, :4], s1[:, 4:]], axis=-1),
        ptr_r,
    )

    # ---------------- jump ----------------
    jump_pc = s0[:, 0] & U32C(0xFFFF)

    c.update(
        is_add=is_add, is_sub=is_sub, is_mul=is_mul, is_div=is_div,
        is_jump=is_jump, is_ctxf=is_ctxf, is_shift=is_shift,
        is_binop=is_binop, is_ptrf=is_ptrf, is_ncall=is_ncall,
        is_logf=is_logf, is_fcall=is_fcall, is_retf=is_retf, is_uma=is_uma,
        set_flags=set_flags,
        addsub_r=addsub_r, addsub_of=addsub_of, addsub_eq=addsub_eq,
        addsub_gt=addsub_gt,
        muldiv_r0=muldiv_r0, muldiv_r1=muldiv_r1,
        muldiv_of=muldiv_of, muldiv_eq=muldiv_eq, muldiv_gt=muldiv_gt,
        shift_r=shift_r, shift_eq=shift_eq,
        binop_r=binop_r, binop_eq=binop_eq,
        ctx_res=ctx_res, ctx_write_dst0=ctx_write_dst0,
        v_set128=v_set128, v_setpp=v_setpp, v_inctx=v_inctx,
        ptr_panic=ptr_panic, ptr_r=ptr_r, jump_pc=jump_pc,
    )
    return _eval_memory_and_log(w, c)


def _be_bytes(limbs):
    """(N,8) u32 LE limbs -> (N,32) big-endian bytes."""
    outs = []
    for j in range(32):
        limb = limbs[..., 7 - j // 4]
        outs.append((limb >> U32C(8 * (3 - j % 4))) & U32C(0xFF))
    return jnp.stack(outs, axis=-1)


def _from_be_bytes(bts):
    """(N,32) BE bytes -> (N,8) u32 LE limbs."""
    outs = []
    for k in range(8):
        base = (7 - k) * 4
        limb = (
            (bts[..., base] << U32C(24))
            | (bts[..., base + 1] << U32C(16))
            | (bts[..., base + 2] << U32C(8))
            | bts[..., base + 3]
        )
        outs.append(limb)
    return jnp.stack(outs, axis=-1)


def _eval_memory_and_log(w: dict, c: dict) -> dict:
    N, res, b, a = c["N"], c["res"], c["b"], c["a"]
    varbit, flagbit = c["varbit"], c["flagbit"]
    s0, s1 = c["src0_val"], c["src1_val"]
    s0p = c["src0_isptr"]
    ergs1, ts = c["ergs1"], c["ts"]
    is_uma, is_logf = c["is_uma"], c["is_logf"]

    # ================= UMA (opcodes/uma.rs) =================
    u_hr, u_hw = varbit(isa.UMA_HEAP_READ), varbit(isa.UMA_HEAP_WRITE)
    u_ahr, u_ahw = varbit(isa.UMA_AUX_HEAP_READ), varbit(isa.UMA_AUX_HEAP_WRITE)
    u_fpr = varbit(isa.UMA_FAT_PTR_READ)
    u_incr = flagbit(isa.UMA_INCREMENT_FLAG_IDX)
    access_heap = is_uma & (u_hr | u_hw)
    access_aux = is_uma & (u_ahr | u_ahw)
    uma_read = u_hr | u_ahr | u_fpr
    uma_write = u_hw | u_ahw

    offset, upage = s0[:, 0], s0[:, 1]
    ustart, ulen = s0[:, 2], s0[:, 3]
    not_ptr_exp = u_fpr & ~s0p
    in_slice = offset < ulen
    skip_legit = u_fpr & ~in_slice
    formal_start = jnp.where(u_fpr, ustart, U32C(0))
    abs_addr = formal_start + offset
    inc_off = offset + U32C(32)
    non_addr = offset >= U32C(0xFFFFFFDF)
    uma_panic = not_ptr_exp | non_addr
    uma_skip = not_ptr_exp | skip_legit | non_addr
    d_oob = inc_off - ulen
    bytes_oob = jnp.where(
        ~uma_skip & (inc_off >= ulen), d_oob & U32C(31), U32C(0)
    )

    heap_like = access_heap | access_aux
    bound = jnp.where(access_heap, b("ctx_heap_bound"), b("ctx_aux_heap_bound"))
    grows = heap_like & (inc_off > bound)
    growth = jnp.where(grows, inc_off - bound, U32C(0))
    top_nz = ~(s0[:, 1:] == 0).all(-1)
    penal = heap_like & (top_nz | non_addr)
    growth_cost = jnp.where(penal, U32C(0xFFFFFFFF), growth)
    uma_panic = uma_panic | penal
    uma_skip = uma_skip | penal
    uma_new_bound = jnp.where(grows, inc_off, bound)

    ergs_uf = growth_cost > ergs1
    uma_ergs2 = jnp.where(ergs_uf, U32C(0), ergs1 - growth_cost)
    uma_panic = uma_panic | ergs_uf
    uma_skip = uma_skip | ergs_uf

    mem_page = jnp.where(
        access_heap, c["heap_page"], jnp.where(access_aux, c["aux_heap_page"], upage)
    )
    cell = abs_addr >> U32C(5)
    unalign = abs_addr & U32C(31)
    read_a = is_uma & ~uma_skip
    read_b = read_a & (unalign != 0)
    exec_write = is_uma & uma_write & ~uma_skip
    exec_write_b = exec_write & (unalign != 0)

    a_val = jnp.where(read_a[:, None], w["uma_a_val"], U32C(0))
    b_val = jnp.where(read_b[:, None], w["uma_b_val"], U32C(0))
    res["uma_masked_reads"] = _eq256(a_val, w["uma_a_val"]) & _eq256(
        b_val, w["uma_b_val"]
    )

    buf = jnp.concatenate([_be_bytes(a_val), _be_bytes(b_val)], axis=-1)  # (N,64)
    selected = jnp.zeros((N, 32), U32C)
    for u in range(32):
        m = (unalign == u)[:, None]
        selected = jnp.where(m, buf[:, u : u + 32], selected)
    cleanup = jnp.where(u_fpr, bytes_oob, U32C(0))
    keep = jnp.arange(32)[None, :] < (32 - cleanup)[:, None]
    selected = jnp.where(keep, selected, U32C(0))
    uma_read_value = _from_be_bytes(selected)

    wr_bytes = _be_bytes(s1)
    wbuf = buf
    for u in range(32):
        m = (unalign == u)[:, None]
        patched = jnp.concatenate(
            [buf[:, :u], wr_bytes, buf[:, u + 32 :]], axis=-1
        )
        wbuf = jnp.where(m, patched, wbuf)
    a_new = _from_be_bytes(wbuf[:, :32])
    b_new = _from_be_bytes(wbuf[:, 32:])

    incr_src0 = s0.at[:, 0].set(inc_off)

    # ================= memory queue chain =================
    mem0 = b("mem_q_state")
    zero_b = jnp.zeros(N, bool)

    def mq(ts_, page, index, rw, is_ptr, value):
        return MemoryQueries(
            timestamp=ts_, memory_page=page, index=index,
            rw_flag=rw if rw.dtype == bool else rw.astype(bool),
            is_ptr=is_ptr if isinstance(is_ptr, jnp.ndarray) else jnp.full(N, is_ptr),
            value=value,
        )

    # code-word read
    pc_b = b("ctx_pc")
    super_pc = pc_b >> U32C(2)
    enc_code = encode_memory_queries(
        mq(ts, b("ctx_code_page"), super_pc, zero_b, zero_b, w["code_word_read"])
    )
    out_code = _absorb_full(mem0, enc_code)
    mem1 = _gf_sel(c["should_read_op"], out_code, mem0)

    # src0 read
    enc_src0 = encode_memory_queries(
        mq(ts, c["src0_page"], c["src0_index"], zero_b,
           w["src0_mem_is_ptr"], w["src0_mem_val"])
    )
    out_src0 = _absorb_full(mem1, enc_src0)
    mem2 = _gf_sel(c["src0_did_read"], out_src0, mem1)

    # uma reads + writes (chained)
    enc_uma_ra = encode_memory_queries(mq(ts, mem_page, cell, zero_b, zero_b, a_val))
    out_ra = _absorb_full(mem2, enc_uma_ra)
    mem3 = _gf_sel(read_a, out_ra, mem2)
    enc_uma_rb = encode_memory_queries(
        mq(ts, mem_page, cell + 1, zero_b, zero_b, b_val)
    )
    out_rb = _absorb_full(mem3, enc_uma_rb)
    mem4 = _gf_sel(read_b, out_rb, mem3)
    one_b = jnp.ones(N, bool)
    enc_uma_wa = encode_memory_queries(
        mq(ts + 3, mem_page, cell, one_b, zero_b, a_new)
    )
    out_wa = _absorb_full(mem4, enc_uma_wa)
    mem5 = _gf_sel(exec_write, out_wa, mem4)
    enc_uma_wb = encode_memory_queries(
        mq(ts + 3, mem_page, cell + 1, one_b, zero_b, b_new)
    )
    out_wb = _absorb_full(mem5, enc_uma_wb)
    mem6 = _gf_sel(exec_write_b, out_wb, mem5)

    c.update(
        uma_panic=is_uma & uma_panic, uma_read_value=uma_read_value,
        uma_read=uma_read, uma_write=uma_write, u_incr=u_incr,
        incr_src0=incr_src0, uma_ergs2=uma_ergs2,
        uma_grow_heap=access_heap, uma_grow_aux=access_aux,
        uma_new_bound=uma_new_bound,
        mem_after_uma=mem6,
        mem_count_pre_dst0=(
            c["should_read_op"].astype(U32C)
            + c["src0_did_read"].astype(U32C)
            + read_a.astype(U32C) + read_b.astype(U32C)
            + exec_write.astype(U32C) + exec_write_b.astype(U32C)
        ),
    )

    # ================= log family (opcodes/log.rs) =================
    l_sr, l_sw = varbit(isa.LOG_STORAGE_READ), varbit(isa.LOG_STORAGE_WRITE)
    l_ev, l_l1 = varbit(isa.LOG_EVENT), varbit(isa.LOG_TO_L1_MESSAGE)
    l_pc = varbit(isa.LOG_PRECOMPILE_CALL)
    is_storage = l_sr | l_sw
    revertable = ~(l_sr | l_pc)

    key = s0
    swap_r = is_logf & l_pc & (s0[:, 4] == 0)
    swap_w = is_logf & l_pc & (s0[:, 5] == 0)
    key = key.at[:, 4].set(jnp.where(swap_r, c["heap_page"], key[:, 4]))
    key = key.at[:, 5].set(jnp.where(swap_w, c["heap_page"], key[:, 5]))

    shard = b("ctx_shard_this")
    aux_byte = (
        is_storage.astype(U32C) * sp.STORAGE_AUX_BYTE
        + l_ev.astype(U32C) * sp.EVENT_AUX_BYTE
        + l_l1.astype(U32C) * sp.L1_MESSAGE_AUX_BYTE
        + l_pc.astype(U32C) * sp.PRECOMPILE_AUX_BYTE
    )
    refund = w["pubdata_refund"]
    res["pubdata_refund_range"] = refund <= U32C(sp.INITIAL_STORAGE_WRITE_PUBDATA_BYTES)
    burn = jnp.where(
        l_sw & (shard == 0),
        b("ergs_pp") * (U32C(sp.INITIAL_STORAGE_WRITE_PUBDATA_BYTES) - refund),
        jnp.where(
            l_l1,
            b("ergs_pp") * U32C(sp.L1_MESSAGE_PUBDATA_BYTES),
            jnp.where(l_pc, s1[:, 0], U32C(0)),
        ),
    )
    log_uf = burn > ergs1
    log_ergs2 = jnp.where(log_uf, U32C(0), ergs1 - burn)
    log_exec = is_logf & ~log_uf
    log_exec_rb = log_exec & revertable

    read_value = jnp.where(
        (is_storage & log_exec)[:, None], w["storage_read_val"], U32C(0)
    )
    written_value = jnp.where(revertable[:, None], s1, read_value)
    first_flag = flagbit(isa.FIRST_MESSAGE_FLAG_IDX) & (l_ev | l_l1)

    lq = LogQueries(
        address=jnp.concatenate(
            [b("ctx_this")], axis=-1
        ),
        key=key,
        read_value=read_value,
        written_value=written_value,
        rw_flag=revertable,
        aux_byte=aux_byte,
        rollback=jnp.zeros(N, bool),
        is_service=first_flag,
        shard_id=shard,
        tx_number_in_block=b("tx_number"),
        timestamp=ts + 1,
    )
    enc_fwd = encode_log_queries(lq)
    enc_rb = encode_with_rollback_flag(lq)

    # forward queue push + independent rollback chain (standard convention:
    # the rollback side starts from the claimed previous head in capacity)
    new_fwd_tail, _ = _narrow_rounds(enc_fwd, b("log_fwd_tail"))
    rb_head, _ = _narrow_rounds(enc_rb, w["rb_prev_head"])
    res["log_rollback_head_chain"] = jnp.where(
        log_exec_rb, _gf_eq(rb_head, b("ctx_rq_head")), True
    )

    log_dst0 = jnp.where(
        l_sr[:, None],
        read_value,
        jnp.zeros((N, 8), U32C).at[:, 0].set(log_exec.astype(U32C)),
    )

    c.update(
        log_exec=log_exec, log_exec_rb=log_exec_rb, log_ergs2=log_ergs2,
        log_new_fwd_tail=new_fwd_tail, log_dst0=log_dst0,
        log_dst0_update=is_logf & (l_sr | l_pc),
    )
    return _eval_callret(w, c)


def _enc32(fields) -> gf.GF:
    """Pack saved-context fields into the 32-element encoding
    (saved_context.rs:114-265).  fields = dict of (N,)-arrays / GF."""
    f = fields
    lanes = [f["rq_head"][..., k] for k in range(4)]
    lanes += [f["rq_tail"][..., k] for k in range(4)]
    for key in ("code_address", "this", "caller"):
        for k in range(5):
            lanes.append(gf.from_u32(f[key][..., k]))
    for k in range(4):
        lanes.append(gf.from_u32(f["ctx_u128"][..., k]))
    lanes.append(
        _pack_lohi(
            f["code_page"],
            f["pc"] | (f["shard_this"] << U32C(16)) | (f["is_static"].astype(U32C) << U32C(24)),
        )
    )
    lanes.append(
        _pack_lohi(
            f["base_page"],
            f["sp"] | (f["shard_caller"] << U32C(16)) | (f["is_kernel"].astype(U32C) << U32C(24)),
        )
    )
    lanes.append(
        _pack_lohi(
            f["ergs"],
            f["eh"] | (f["shard_code"] << U32C(16)) | (f["is_local"].astype(U32C) << U32C(24)),
        )
    )
    ql = f["rq_len"]
    lanes.append(
        _pack_lohi(f["heap_bound"], (ql & U32C(0xFF)) | (((ql >> U32C(8)) & U32C(0xFF)) << U32C(8)))
    )
    lanes.append(
        _pack_lohi(
            f["aux_heap_bound"],
            ((ql >> U32C(16)) & U32C(0xFF)) | (((ql >> U32C(24)) & U32C(0xFF)) << U32C(8)),
        )
    )
    return gf.stack(lanes, axis=-1)


def _eval_callret(w: dict, c: dict) -> dict:
    N, res, b, a = c["N"], c["res"], c["b"], c["a"]
    varbit, flagbit = c["varbit"], c["flagbit"]
    s0, s1 = c["src0_val"], c["src1_val"]
    s0p = c["src0_isptr"]
    ergs1, ts = c["ergs1"], c["ts"]
    is_ncall, is_fcall, is_retf = c["is_ncall"], c["is_fcall"], c["is_retf"]
    imm0, imm1 = c["imm0"], c["imm1"]

    # ---------------- far_call (call_ret_impl/far_call.rs) ----------------
    fc_delegate = varbit(isa.FAR_CALL_DELEGATE)
    fc_mimic = varbit(isa.FAR_CALL_MIMIC)
    fc_static = flagbit(isa.FAR_CALL_STATIC_FLAG_IDX)
    fc_shard = flagbit(isa.FAR_CALL_SHARD_FLAG_IDX)

    ergs_abi = s0[:, 6]
    fwd_byte = s0[:, 7] & U32C(0xFF)
    shard_byte = (s0[:, 7] >> U32C(8)) & U32C(0xFF)
    ctor_byte = (s0[:, 7] >> U32C(16)) & U32C(0xFF)
    sys_byte = s0[:, 7] >> U32C(24)
    use_aux = fwd_byte == sp.FORWARD_PAGE_USE_AUX_HEAP
    fwd_ptr = fwd_byte == sp.FORWARD_PAGE_FORWARD_FAT_POINTER
    use_heap = ~(use_aux | fwd_ptr)

    dest5 = s1[:, :5]
    target_kernel = (s1[:, 0] < (1 << 16)) & (s1[:, 1:5] == 0).all(-1)
    dest_shard = jnp.where(fc_shard, shard_byte, b("ctx_shard_this"))
    zkporter = dest_shard != 0
    kernel_b = b("ctx_is_kernel")
    ctor_call = (ctor_byte != 0) & kernel_b
    sys_call = (sys_byte != 0) & target_kernel

    offset, page = s0[:, 0], s0[:, 1]
    start, length = s0[:, 2], s0[:, 3]
    nonzero_off_fresh = (offset != 0) & ~fwd_ptr
    end_ni = start + length
    slice_of = end_ni < start
    invalid_slice = length < offset
    ptr_invalid = nonzero_off_fresh | slice_of | invalid_slice

    zkp_avail = w["zkporter_available"]
    should_read = (~zkporter | zkp_avail) & is_fcall
    raw_hash = w["storage_read_val"]
    hash_empty = _is_zero256(raw_hash)
    mask_aa = should_read & hash_empty & ~target_kernel
    aa_hash = jnp.broadcast_to(w["default_aa_code_hash"], (N, 8))
    porter_mask = zkporter & ~zkp_avail
    bytecode_hash = jnp.where(mask_aa[:, None], aa_hash, raw_hash)
    bytecode_hash = jnp.where(porter_mask[:, None], U32C(0), bytecode_hash)

    # code-hash read goes into the forward log queue (narrow, 3 rounds)
    dep5 = jnp.zeros((N, 5), U32C).at[:, 0].set(
        U32C(sp.DEPLOYER_SYSTEM_CONTRACT_ADDRESS)
    )
    key8 = jnp.concatenate([dest5, jnp.zeros((N, 3), U32C)], axis=-1)
    fc_lq = LogQueries(
        address=dep5, key=key8, read_value=raw_hash, written_value=raw_hash,
        rw_flag=jnp.zeros(N, bool), aux_byte=jnp.full(N, sp.STORAGE_AUX_BYTE, U32C),
        rollback=jnp.zeros(N, bool), is_service=jnp.zeros(N, bool),
        shard_id=dest_shard, tx_number_in_block=b("tx_number"), timestamp=ts + 1,
    )
    fc_fwd_tail, _fc_rounds = _narrow_rounds(
        encode_log_queries(fc_lq), b("log_fwd_tail")
    )

    version = bytecode_hash[:, 7] >> U32C(24)
    marker = (bytecode_hash[:, 7] >> U32C(16)) & U32C(0xFF)
    version_ok = version == sp.CODE_HASH_VERSION_BYTE
    normal_marker = marker == sp.CODE_AT_REST_MARKER
    constructed_marker = marker == sp.YET_CONSTRUCTED_MARKER
    format_exc = ~version_ok | ~(normal_marker | constructed_marker)
    can_call = (normal_marker & ~ctor_call) | (constructed_marker & ctor_call)
    in_construction_kernel = ~can_call & target_kernel

    at_rest7 = (bytecode_hash[:, 7] & U32C(0xFF00FFFF)) | U32C(
        sp.CODE_AT_REST_MARKER << 16
    )
    at_rest = bytecode_hash.at[:, 7].set(at_rest7)
    masked_else = jnp.where(target_kernel[:, None], U32C(0), aa_hash)
    masked_hash = jnp.where(can_call[:, None], at_rest, masked_else)
    code_len = jnp.where(format_exc, U32C(0), masked_hash[:, 7] & U32C(0xFFFF))

    fat_ptr_exp_exc = fwd_ptr & ~s0p
    exc0 = format_exc | in_construction_kernel | fat_ptr_exp_exc | ptr_invalid

    ub = jnp.where(exc0, U32C(0), end_ni)
    ub = jnp.where(slice_of & ~fwd_ptr, U32C(0xFFFFFFFF), ub)
    fc_bound = jnp.where(use_heap, b("ctx_heap_bound"), b("ctx_aux_heap_bound"))
    fc_grows = (use_heap | use_aux) & (ub > fc_bound)
    fc_growth = jnp.where(fc_grows, ub - fc_bound, U32C(0))
    fc_new_bound = jnp.where(fc_grows, ub, fc_bound)
    fc_uf = fc_growth > ergs1
    fc_ergs2 = jnp.where(fc_uf, U32C(0), ergs1 - fc_growth)
    exc1 = exc0 | fc_uf

    dec_cost = U32C(sp.ERGS_PER_CODE_WORD_DECOMMITTMENT) * code_len
    dec_uf = dec_cost > fc_ergs2
    should_dec = is_fcall & ~exc1 & ~dec_uf
    fc_exc = exc1 | dec_uf
    ergs_after_dec = jnp.where(should_dec, fc_ergs2 - dec_cost, fc_ergs2)
    suggested = w["dec_suggested_page"]
    new_base_page = b("page_counter")
    dec_first = suggested == new_base_page
    ergs_after_dec = jnp.where(should_dec & ~dec_first, fc_ergs2, ergs_after_dec)
    code_page_new = jnp.where(should_dec, suggested, U32C(sp.UNMAPPED_PAGE))

    dq = DecommitQueries(
        code_hash=masked_hash, page=suggested,
        is_first=dec_first, timestamp=ts + 1,
    )
    out_dec = _absorb_full(b("dec_q_state"), encode_decommit_queries(dq))
    dec_next = _gf_sel(should_dec, out_dec, b("dec_q_state"))
    res["dec_queue"] = _gf_eq(a("dec_q_state"), dec_next) & (
        a("dec_q_len") == b("dec_q_len") + should_dec.astype(U32C)
    )

    max_pass = (ergs_after_dec // 64) * 63
    fc_pass = jnp.minimum(ergs_abi, max_pass)
    fc_caller_remaining = ergs_after_dec - fc_pass

    # far-call ABI registers (r1 pointer, r2 flags)
    fc_r1 = jnp.zeros((N, 8), U32C)
    fptr_page = jnp.where(fwd_ptr, page, jnp.where(use_heap, c["heap_page"], c["aux_heap_page"]))
    fptr_start = jnp.where(fwd_ptr, start + offset, start)
    fptr_len = jnp.where(fwd_ptr, length - offset, length)
    fc_r1 = fc_r1.at[:, 1].set(jnp.where(fc_exc, U32C(0), fptr_page))
    fc_r1 = fc_r1.at[:, 2].set(jnp.where(fc_exc, U32C(0), fptr_start))
    fc_r1 = fc_r1.at[:, 3].set(jnp.where(fc_exc, U32C(0), fptr_len))
    fc_r2 = jnp.zeros((N, 8), U32C).at[:, 0].set(
        ctor_call.astype(U32C) | (sys_call.astype(U32C) << 1)
    )

    # ---------------- near_call ----------------
    nc_abi = s0[:, 0]
    nc_pass_all = nc_abi == 0
    nc_to_pass = jnp.where(nc_pass_all, ergs1, nc_abi)
    nc_uf = nc_to_pass > ergs1
    nc_remaining = jnp.where(nc_uf, U32C(0), ergs1 - nc_to_pass)
    nc_passed = jnp.where(nc_uf, ergs1, nc_to_pass)

    # ---------------- ret ----------------
    r_ok, r_rev = varbit(isa.RET_OK), varbit(isa.RET_REVERT)
    r_panic = varbit(isa.RET_PANIC)
    r_local = b("ctx_is_local")
    r_far = ~r_local
    r_label = flagbit(isa.RET_TO_LABEL_BIT_IDX)

    rs0 = jnp.where(r_panic[:, None], U32C(0), s0)
    rs0p = ~r_panic & s0p
    r_fwd_byte = rs0[:, 7] & U32C(0xFF)
    r_use_aux = r_fwd_byte == sp.FORWARD_PAGE_USE_AUX_HEAP
    r_fwd_ptr = r_fwd_byte == sp.FORWARD_PAGE_FORWARD_FAT_POINTER
    r_use_heap = ~(r_use_aux | r_fwd_ptr)
    r_off, r_page = rs0[:, 0], rs0[:, 1]
    r_start, r_len = rs0[:, 2], rs0[:, 3]
    r_fpe = r_fwd_ptr & ~rs0p & r_far
    r_nonuni = r_fwd_ptr & (r_page < b("ctx_base_page"))
    r_end = r_start + r_len
    r_slice_of = r_end < r_start
    r_ptr_invalid = ((r_off != 0) & ~r_fwd_ptr) | r_slice_of | (r_len < r_off)
    r_exc = r_panic | (r_far & (r_fpe | r_nonuni | r_ptr_invalid))

    r_ub = jnp.where(r_exc, U32C(0), r_end)
    r_ub = jnp.where(r_slice_of & ~r_fwd_ptr, U32C(0xFFFFFFFF), r_ub)
    r_bound = jnp.where(r_use_heap, b("ctx_heap_bound"), b("ctx_aux_heap_bound"))
    r_growth = jnp.where(
        r_far & ~r_exc & (r_use_heap | r_use_aux) & (r_ub > r_bound),
        r_ub - r_bound, U32C(0),
    )
    r_uf = r_growth > ergs1
    r_ergs2 = jnp.where(r_uf, U32C(0), ergs1 - r_growth)
    r_exc = r_exc | (r_far & r_uf)
    r_ergs2 = jnp.where(r_local, ergs1, r_ergs2)
    r_nl_panic = r_far & (r_panic | r_exc)
    r_revert = r_rev | r_panic | r_nl_panic

    pop_ergs = w["ret_popped_ergs"]
    r_parent_ergs = pop_ergs + r_ergs2

    # rollback-queue joins (ret.rs:344-418)
    res["ret_revert_head_is_fwd_tail"] = jnp.where(
        is_retf & r_revert,
        _gf_eq(b("ctx_rq_head"), b("log_fwd_tail")),
        True,
    )
    res["ret_ok_parent_head_is_child_tail"] = jnp.where(
        is_retf & ~r_revert,
        _gf_eq(w["ret_popped_rq_head"], b("ctx_rq_tail")),
        True,
    )

    r_r1 = jnp.zeros((N, 8), U32C)
    rptr_page = jnp.where(
        r_fwd_ptr, r_page, jnp.where(r_use_heap, c["heap_page"], c["aux_heap_page"])
    )
    rptr_start = jnp.where(r_fwd_ptr, r_start + r_off, r_start)
    rptr_len = jnp.where(r_fwd_ptr, r_len - r_off, r_len)
    r_r1 = r_r1.at[:, 1].set(jnp.where(r_exc, U32C(0), rptr_page))
    r_r1 = r_r1.at[:, 2].set(jnp.where(r_exc, U32C(0), rptr_start))
    r_r1 = r_r1.at[:, 3].set(jnp.where(r_exc, U32C(0), rptr_len))

    r_dst_pc = jnp.where(
        r_revert,
        b("ctx_eh"),
        w["ret_popped_pc"],
    )
    r_dst_pc = jnp.where(r_label & r_local, imm0, r_dst_pc)

    # ---------------- callstack sponge (call_ret.rs:167-274) -------------
    push_mask = is_ncall | is_fcall
    pop_mask = is_retf
    any_cs = push_mask | pop_mask

    saved_ergs = jnp.where(is_fcall, fc_caller_remaining, nc_remaining)
    saved_heap = jnp.where(
        is_fcall & use_heap & fc_grows, fc_new_bound, b("ctx_heap_bound")
    )
    saved_aux = jnp.where(
        is_fcall & use_aux & fc_grows, fc_new_bound, b("ctx_aux_heap_bound")
    )
    push_fields = dict(
        rq_head=b("ctx_rq_head"), rq_tail=b("ctx_rq_tail"),
        code_address=b("ctx_code_address"), this=b("ctx_this"),
        caller=b("ctx_caller"), ctx_u128=b("ctx_ctx_u128"),
        code_page=b("ctx_code_page"), base_page=b("ctx_base_page"),
        pc=c["pc_plus_one"], sp=a("ctx_sp"),
        shard_this=b("ctx_shard_this"), shard_caller=b("ctx_shard_caller"),
        shard_code=b("ctx_shard_code"),
        is_static=b("ctx_is_static"), is_kernel=b("ctx_is_kernel"),
        is_local=b("ctx_is_local"),
        ergs=saved_ergs, eh=b("ctx_eh"),
        heap_bound=saved_heap, aux_heap_bound=saved_aux,
        rq_len=b("ctx_rq_len"),
    )
    pop_fields = dict(
        rq_head=w["ret_popped_rq_head"], rq_tail=w["ret_popped_rq_tail"],
        code_address=w["ret_popped_code_address"], this=w["ret_popped_this"],
        caller=w["ret_popped_caller"], ctx_u128=w["ret_popped_ctx_u128"],
        code_page=w["ret_popped_code_page"], base_page=w["ret_popped_base_page"],
        pc=w["ret_popped_pc"], sp=w["ret_popped_sp"],
        shard_this=w["ret_popped_shard_this"],
        shard_caller=w["ret_popped_shard_caller"],
        shard_code=w["ret_popped_shard_code"],
        is_static=w["ret_popped_is_static"], is_kernel=w["ret_popped_is_kernel"],
        is_local=w["ret_popped_is_local"],
        ergs=w["ret_popped_ergs"], eh=w["ret_popped_eh"],
        heap_bound=w["ret_popped_heap_bound"],
        aux_heap_bound=w["ret_popped_aux_heap_bound"],
        rq_len=w["ret_popped_rq_len"],
    )
    enc_push = _enc32(push_fields)
    enc_pop = _enc32(pop_fields)
    enc_cs = _gf_sel(pop_mask, enc_pop, enc_push)
    base_cs = _gf_sel(pop_mask, w["ret_prev_cs_sponge"], b("cs_sponge"))
    st = base_cs
    for r in range(4):
        st = poseidon2.permutation(
            gf.concat([enc_cs[..., 8 * r : 8 * r + 8], st[..., 8:]], axis=-1)
        )
    res["cs_sponge_push"] = jnp.where(push_mask, _gf_eq(st, a("cs_sponge")), True)
    res["cs_sponge_pop"] = jnp.where(
        pop_mask,
        _gf_eq(st, b("cs_sponge")) & _gf_eq(a("cs_sponge"), w["ret_prev_cs_sponge"]),
        True,
    )
    res["cs_sponge_keep"] = jnp.where(
        ~any_cs, _gf_eq(a("cs_sponge"), b("cs_sponge")), True
    )
    res["cs_depth"] = a("cs_depth") == jnp.where(
        push_mask, b("cs_depth") + 1,
        jnp.where(pop_mask, b("cs_depth") - 1, b("cs_depth")),
    )

    c.update(
        is_fcall=is_fcall, fc_exc=is_fcall & fc_exc,
        fc_delegate=fc_delegate, fc_mimic=fc_mimic, fc_static=fc_static,
        fc_pass=fc_pass, fc_fwd_tail=fc_fwd_tail, fc_should_read=should_read,
        fc_code_page=code_page_new, fc_dest5=dest5, fc_dest_shard=dest_shard,
        fc_target_kernel=target_kernel, fc_sys_call=sys_call,
        fc_r1=fc_r1, fc_r2=fc_r2, new_base_page=new_base_page,
        nc_passed=nc_passed,
        r_local=r_local, r_far=r_far, r_revert=r_revert,
        r_nl_panic=r_nl_panic, r_panic=r_panic, r_parent_ergs=r_parent_ergs,
        r_dst_pc=r_dst_pc, r_r1=r_r1,
        push_mask=push_mask, pop_mask=pop_mask,
    )
    return _eval_continuity(w, c)


def _eval_continuity(w: dict, c: dict) -> dict:
    """The StateDiffsAccumulator application (cycle.rs:158-668): every
    state column's next value re-derived and compared."""
    N, rows, res, b, a = c["N"], c["rows"], c["res"], c["b"], c["a"]
    s0 = c["src0_val"]
    is_add, is_sub, is_mul, is_div = c["is_add"], c["is_sub"], c["is_mul"], c["is_div"]
    is_shift, is_binop, is_ptrf = c["is_shift"], c["is_binop"], c["is_ptrf"]
    is_ctxf, is_jump, is_uma = c["is_ctxf"], c["is_jump"], c["is_uma"]
    is_logf, is_ncall, is_fcall, is_retf = (
        c["is_logf"], c["is_ncall"], c["is_fcall"], c["is_retf"],
    )
    should_skip = c["should_skip"]
    set_flags = c["set_flags"]

    # ---- dst0/dst1 candidates ----
    uma_wr_incr = c["uma_write"] & c["u_incr"]
    dst0_val = jnp.where((is_add | is_sub)[:, None], c["addsub_r"], jnp.zeros((N, 8), U32C))
    dst0_val = jnp.where((is_mul | is_div)[:, None], c["muldiv_r0"], dst0_val)
    dst0_val = jnp.where(is_shift[:, None], c["shift_r"], dst0_val)
    dst0_val = jnp.where(is_binop[:, None], c["binop_r"], dst0_val)
    dst0_val = jnp.where(is_ptrf[:, None], c["ptr_r"], dst0_val)
    dst0_val = jnp.where(is_ctxf[:, None], c["ctx_res"], dst0_val)
    dst0_val = jnp.where(
        is_uma[:, None],
        jnp.where(uma_wr_incr[:, None], c["incr_src0"], c["uma_read_value"]),
        dst0_val,
    )
    dst0_val = jnp.where(is_logf[:, None], c["log_dst0"], dst0_val)
    dst0_ptr_flag = (is_ptrf | (is_uma & uma_wr_incr)) & c["src0_isptr"]

    dst0_update = (
        is_add | is_sub | is_mul | is_div | is_shift | is_binop
        | (is_ptrf & ~c["ptr_panic"])
        | (is_ctxf & c["ctx_write_dst0"])
        | (is_uma & ~c["uma_panic"] & (c["uma_read"] | uma_wr_incr))
        | c["log_dst0_update"]
    )
    dst1_val = jnp.where((is_mul | is_div)[:, None], c["muldiv_r1"], c["incr_src0"])
    dst1_update = (is_mul | is_div) | (
        is_uma & ~c["uma_panic"] & c["uma_read"] & c["u_incr"]
    )
    dst1_ptr_flag = is_uma & c["src0_isptr"]

    # ---- register writeback (cycle.rs:320-433 + far/ret specifics) ----
    regs_b, regs_a = b("regs"), a("regs")
    ptr_b, ptr_a = b("regs_ptr"), a("regs_ptr")
    dst0_reg_write = dst0_update & ~c["dst0_did_write"]
    ok = jnp.ones(N, dtype=bool)
    fc_r1_ptr = jnp.ones(N, bool)
    for r in range(15):
        sel0 = dst0_reg_write & (c["dst0_idx"] == r + 1)
        sel1 = dst1_update & (c["dst1_idx"] == r + 1)
        expv = regs_b[:, r]
        expp = ptr_b[:, r]
        expv = jnp.where(sel0[:, None], dst0_val, expv)
        expp = jnp.where(sel0, dst0_ptr_flag, expp)
        expv = jnp.where(sel1[:, None], dst1_val, expv)
        expp = jnp.where(sel1, dst1_ptr_flag, expp)
        # far_call ABI registers
        if r == 0:
            expv = jnp.where(is_fcall[:, None], c["fc_r1"], expv)
            expp = jnp.where(is_fcall, True, expp)
            far_ret = is_retf & c["r_far"]
            expv = jnp.where(far_ret[:, None], c["r_r1"], expv)
            expp = jnp.where(far_ret, True, expp)
        elif r == 1:
            expv = jnp.where(is_fcall[:, None], c["fc_r2"], expv)
            expp = jnp.where(is_fcall, False, expp)
        if r in sp.CALL_SYSTEM_ABI_REGISTERS:
            zero_it = is_fcall & ~c["fc_sys_call"]
            expv = jnp.where(zero_it[:, None], U32C(0), expv)
            expp = jnp.where(is_fcall, False, expp)
        if r in sp.CALL_RESERVED_RANGE or r == sp.CALL_IMPLICIT_PARAMETER_REG_IDX:
            expv = jnp.where(is_fcall[:, None], U32C(0), expv)
            expp = jnp.where(is_fcall, False, expp)
        if r >= 1:
            far_ret = is_retf & c["r_far"]
            expv = jnp.where(far_ret[:, None], U32C(0), expv)
            expp = jnp.where(far_ret, False, expp)
        ok = ok & _eq256(regs_a[:, r], expv) & (ptr_a[:, r] == expp)
    res["registers"] = ok

    # ---- flags ----
    upd = jnp.zeros(N, bool)
    nf_of = jnp.zeros(N, bool)
    nf_eq = jnp.zeros(N, bool)
    nf_gt = jnp.zeros(N, bool)

    def set_fl(m, of, eq, gt):
        nonlocal upd, nf_of, nf_eq, nf_gt
        upd = upd | m
        nf_of = jnp.where(m, of, nf_of)
        nf_eq = jnp.where(m, eq, nf_eq)
        nf_gt = jnp.where(m, gt, nf_gt)

    set_fl((is_add | is_sub) & set_flags, c["addsub_of"], c["addsub_eq"], c["addsub_gt"])
    set_fl((is_mul | is_div) & set_flags, c["muldiv_of"], c["muldiv_eq"], c["muldiv_gt"])
    set_fl(is_shift & set_flags, False, c["shift_eq"], False)
    set_fl(is_binop & set_flags, False, c["binop_eq"], False)
    ret_panic_flag = is_retf & (c["r_panic"] | c["r_nl_panic"])
    set_fl(is_ncall | is_fcall | is_retf, ret_panic_flag, False, False)
    res["flags"] = (
        (a("f_of") == jnp.where(upd, nf_of, b("f_of")))
        & (a("f_eq") == jnp.where(upd, nf_eq, b("f_eq")))
        & (a("f_gt") == jnp.where(upd, nf_gt, b("f_gt")))
    )

    # ---- pc ----
    exp_pc = c["pc_plus_one"]
    exp_pc = jnp.where(is_jump, c["jump_pc"], exp_pc)
    exp_pc = jnp.where(is_ncall, c["imm0"], exp_pc)
    exp_pc = jnp.where(is_fcall, U32C(0), exp_pc)
    exp_pc = jnp.where(is_retf, c["r_dst_pc"], exp_pc)
    exp_pc = jnp.where(should_skip, b("ctx_pc"), exp_pc)
    res["pc"] = a("ctx_pc") == exp_pc

    # ---- ergs ----
    exp_ergs = c["ergs1"]
    exp_ergs = jnp.where(is_uma, c["uma_ergs2"], exp_ergs)
    exp_ergs = jnp.where(is_logf, c["log_ergs2"], exp_ergs)
    exp_ergs = jnp.where(is_ncall, c["nc_passed"], exp_ergs)
    exp_ergs = jnp.where(is_fcall, c["fc_pass"], exp_ergs)
    exp_ergs = jnp.where(is_retf, c["r_parent_ergs"], exp_ergs)
    res["ergs"] = a("ctx_ergs") == exp_ergs

    # ---- heap bounds ----
    stip = U32C(sp.NEW_FRAME_MEMORY_STIPEND)
    exp_hb = jnp.where(c["uma_grow_heap"], c["uma_new_bound"], b("ctx_heap_bound"))
    exp_ab = jnp.where(c["uma_grow_aux"], c["uma_new_bound"], b("ctx_aux_heap_bound"))
    exp_hb = jnp.where(is_fcall, stip, exp_hb)
    exp_ab = jnp.where(is_fcall, stip, exp_ab)
    ret_far = is_retf & c["r_far"]
    exp_hb = jnp.where(ret_far, w["ret_popped_heap_bound"], exp_hb)
    exp_ab = jnp.where(ret_far, w["ret_popped_aux_heap_bound"], exp_ab)
    res["heap_bounds"] = (a("ctx_heap_bound") == exp_hb) & (
        a("ctx_aux_heap_bound") == exp_ab
    )

    # ---- pending exception ----
    exp_pend = (is_ptrf & c["ptr_panic"]) | c["uma_panic"] | c["fc_exc"]
    res["pending"] = a("pending_exc") == exp_pend

    # ---- u128 context value + frame composite ----
    v128 = jnp.where(
        (is_ctxf & c["v_set128"])[:, None], s0[:, :4], b("ctx_u128")
    )
    v128 = jnp.where((is_fcall | ret_far)[:, None], U32C(0), v128)
    res["ctx_u128"] = (a("ctx_u128") == v128).all(-1)
    frame128 = b("ctx_ctx_u128")
    frame128 = jnp.where(
        is_fcall[:, None],
        jnp.where(c["fc_delegate"][:, None], b("ctx_ctx_u128"), b("ctx_u128")),
        frame128,
    )
    frame128 = jnp.where(is_retf[:, None], w["ret_popped_ctx_u128"], frame128)
    res["frame_u128"] = (a("ctx_ctx_u128") == frame128).all(-1)

    # ---- tx number / pubdata price / page counter ----
    res["tx_number"] = a("tx_number") == jnp.where(
        is_ctxf & c["v_inctx"], b("tx_number") + 1, b("tx_number")
    )
    res["ergs_pp"] = a("ergs_pp") == jnp.where(
        is_ctxf & c["v_setpp"], s0[:, 0], b("ergs_pp")
    )
    res["page_counter"] = a("page_counter") == jnp.where(
        is_fcall, b("page_counter") + sp.NEW_MEMORY_PAGES_PER_FAR_CALL,
        b("page_counter"),
    )

    # ---- frame identity fields ----
    def frame_field(name, fc_val, pop_key, width=None):
        cur = b(name)
        exp = cur
        if fc_val is not None:
            m = is_fcall[:, None] if width else is_fcall
            exp = jnp.where(m, fc_val, exp)
        m = is_retf[:, None] if width else is_retf
        exp = jnp.where(m, w[pop_key], exp)
        got = a(name)
        eqv = (got == exp).all(-1) if width else got == exp
        return eqv

    kern_b = b("ctx_is_kernel")
    fc_this = jnp.where(
        c["fc_delegate"][:, None], b("ctx_this"), c["fc_dest5"]
    )
    mimic_reg = b("regs")[:, sp.CALL_IMPLICIT_PARAMETER_REG_IDX, :5]
    fc_caller = jnp.where(
        c["fc_delegate"][:, None],
        b("ctx_caller"),
        jnp.where(c["fc_mimic"][:, None], mimic_reg, b("ctx_this")),
    )
    okf = frame_field("ctx_this", fc_this, "ret_popped_this", width=5)
    okf &= frame_field("ctx_caller", fc_caller, "ret_popped_caller", width=5)
    okf &= frame_field("ctx_code_address", c["fc_dest5"], "ret_popped_code_address", width=5)
    okf &= frame_field("ctx_code_page", c["fc_code_page"], "ret_popped_code_page")
    okf &= frame_field("ctx_base_page", c["new_base_page"], "ret_popped_base_page")
    okf &= frame_field(
        "ctx_shard_this",
        jnp.where(c["fc_delegate"], b("ctx_shard_this"), c["fc_dest_shard"]),
        "ret_popped_shard_this",
    )
    okf &= frame_field("ctx_shard_caller", b("ctx_shard_this"), "ret_popped_shard_caller")
    okf &= frame_field("ctx_shard_code", c["fc_dest_shard"], "ret_popped_shard_code")
    res["frame_identity"] = okf

    exp_eh = b("ctx_eh")
    exp_eh = jnp.where(is_ncall, c["imm1"], exp_eh)
    exp_eh = jnp.where(is_fcall, c["imm0"], exp_eh)
    exp_eh = jnp.where(is_retf, w["ret_popped_eh"], exp_eh)
    res["frame_eh"] = a("ctx_eh") == exp_eh

    exp_static = b("ctx_is_static")
    exp_static = jnp.where(is_fcall, c["fc_static"] | b("ctx_is_static"), exp_static)
    exp_static = jnp.where(is_retf, w["ret_popped_is_static"], exp_static)
    exp_kernel = b("ctx_is_kernel")
    exp_kernel = jnp.where(
        is_fcall,
        jnp.where(c["fc_delegate"], kern_b, c["fc_target_kernel"]),
        exp_kernel,
    )
    exp_kernel = jnp.where(is_retf, w["ret_popped_is_kernel"], exp_kernel)
    exp_local = b("ctx_is_local")
    exp_local = jnp.where(is_ncall, True, exp_local)
    exp_local = jnp.where(is_fcall, False, exp_local)
    exp_local = jnp.where(is_retf, w["ret_popped_is_local"], exp_local)
    res["frame_flags"] = (
        (a("ctx_is_static") == exp_static)
        & (a("ctx_is_kernel") == exp_kernel)
        & (a("ctx_is_local") == exp_local)
    )

    # ---- rollback queue head/tail/len ----
    call_mask = is_ncall | is_fcall
    exp_head = b("ctx_rq_head")
    exp_tail = b("ctx_rq_tail")
    exp_len = b("ctx_rq_len")
    exp_head = _gf_sel(c["log_exec_rb"], w["rb_prev_head"], exp_head)
    exp_len = jnp.where(c["log_exec_rb"], exp_len + 1, exp_len)
    exp_head = _gf_sel(call_mask, w["call_rb_tail"], exp_head)
    exp_tail = _gf_sel(call_mask, w["call_rb_tail"], exp_tail)
    exp_len = jnp.where(call_mask, U32C(0), exp_len)
    pop_head = w["ret_popped_rq_head"]
    pop_tail = w["ret_popped_rq_tail"]
    pop_len = w["ret_popped_rq_len"]
    ret_ok_m = is_retf & ~c["r_revert"]
    ret_rv_m = is_retf & c["r_revert"]
    exp_head = _gf_sel(ret_rv_m, pop_head, exp_head)
    exp_head = _gf_sel(ret_ok_m, b("ctx_rq_head"), exp_head)
    exp_tail = _gf_sel(is_retf, pop_tail, exp_tail)
    exp_len = jnp.where(ret_rv_m, pop_len, exp_len)
    exp_len = jnp.where(ret_ok_m, pop_len + b("ctx_rq_len"), exp_len)
    res["rq_head"] = _gf_eq(a("ctx_rq_head"), exp_head)
    res["rq_tail"] = _gf_eq(a("ctx_rq_tail"), exp_tail)
    res["rq_len"] = a("ctx_rq_len") == exp_len

    # ---- memory queue (dst0 write chained after uma) ----
    dst0_mem_cap = is_add | is_sub | is_mul | is_div | is_shift | is_binop | is_ptrf
    dst0_mem = c["dst0_did_write"] & dst0_update & dst0_mem_cap
    enc_dst0 = encode_memory_queries(
        MemoryQueries(
            timestamp=c["ts"] + 3,
            memory_page=c["stack_page"],
            index=c["dst0_index"],
            rw_flag=jnp.ones(N, bool),
            is_ptr=dst0_ptr_flag,
            value=dst0_val,
        )
    )
    mem6 = c["mem_after_uma"]
    out_dst0 = _absorb_full(mem6, enc_dst0)
    mem_final = _gf_sel(dst0_mem, out_dst0, mem6)
    res["mem_queue"] = _gf_eq(a("mem_q_state"), mem_final)
    res["mem_queue_len"] = a("mem_q_len") == (
        b("mem_q_len") + c["mem_count_pre_dst0"] + dst0_mem.astype(U32C)
    )

    # ---- log forward queue ----
    exp_fwd = b("log_fwd_tail")
    exp_fwd_len = b("log_fwd_len")
    exp_fwd = _gf_sel(c["log_exec"], c["log_new_fwd_tail"], exp_fwd)
    exp_fwd_len = jnp.where(c["log_exec"], exp_fwd_len + 1, exp_fwd_len)
    exp_fwd = _gf_sel(c["fc_should_read"], c["fc_fwd_tail"], exp_fwd)
    exp_fwd_len = jnp.where(c["fc_should_read"], exp_fwd_len + 1, exp_fwd_len)
    exp_fwd = _gf_sel(ret_rv_m, b("ctx_rq_tail"), exp_fwd)
    exp_fwd_len = jnp.where(ret_rv_m, exp_fwd_len + b("ctx_rq_len"), exp_fwd_len)
    res["log_fwd_tail"] = _gf_eq(a("log_fwd_tail"), exp_fwd)
    res["log_fwd_len"] = a("log_fwd_len") == exp_fwd_len

    return res


def all_ok(residuals: dict) -> bool:
    import numpy as _np

    return all(bool(_np.asarray(v).all()) for v in residuals.values())


@functools.partial(jax.jit, static_argnums=(1,))
def _eval_jit(w, limit):
    return eval_constraints(w, limit)


def eval_constraints_jit(w: dict, limit: int) -> dict:
    return _eval_jit(w, limit)
