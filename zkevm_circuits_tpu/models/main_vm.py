"""main_vm — circuit type 1: the zkEVM CPU circuit.

Reference parity: `src/main_vm/` (`main_vm_entry_point` mod.rs:47-232,
`vm_cycle` cycle.rs:28-795, decoder decoded_opcode.rs:42-220, opcode
appliers src/main_vm/opcodes/*).  The reference runs `limit` cycles; each
cycle decodes one opcode, applies 11 opcode-family candidates, and merges
state diffs via one-hot dot-product selects, with budgets of 1 add/sub
relation + 3 mul/div relations + 8 Poseidon2 sponges per cycle
(state_diffs.rs:15-18).

TPU-first layout: rows = cycles.  Witness generation is a host VM simulator
(the witness-oracle role, SURVEY.md §2.4 item 5) producing dense per-cycle
state columns; constraint evaluation checks every cycle transition
row-parallel:

  * decode: opcode word -> fields + (price, props) from the decode table
    (the VMOpcodeDecodingTable analog);
  * condition resolution against the flags port (VMConditionalResolutionTable
    analog);
  * ALU: 256-bit add/sub via materialized 8-limb carry chains (the
    UIntXAddGate<32> relation, opcodes/mod.rs:101-125) and 256x256->512
    mul/div via integer limb identities (the U8x4FMAGate relation role,
    opcodes/mod.rs:129-180) through ops/nonnative.sides_equal;
  * bytewise and/or/xor checked directly on u32 lanes (binop family);
  * writeback: per-register one-hot select checks (cycle.rs dst merge);
  * pc / ergs / flags / halt transitions.

Round-1 opcode coverage: nop, add, sub, and, or, xor, jump, mul, div, halt
(the add_sub, binop, jump, nop and mul_div applier families).  The uma, log,
call_ret, context, ptr and shift families plus the decommit/callstack sponge
budget land in the next round; the VmState/queue plumbing for them is in
place (base_structures/vm_state.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..base_structures.vm_state import REGISTERS_COUNT
from ..isa import opcodes_legacy as isa
from ..ops import nonnative as nn
from .. import tables

U32M = 0xFFFFFFFF
_BITSHIFT_TABLE = tables.create_bitshift_table()


@dataclasses.dataclass(frozen=True)
class MainVmConfig:
    limit: int  # cycles per instance
    heap_page: int = 10  # the active context's heap page (uma family)
    starting_timestamp: int = 8
    contract_address: int = 0x8001  # this context's address (log family)
    code_page_base: int = 1024  # far_call allocates callee code pages from here


# ---------------------------------------------------------------------------
# host VM simulator (witness oracle role)
# ---------------------------------------------------------------------------


def _to_limbs(v: int):
    return [(v >> (32 * k)) & U32M for k in range(8)]


def _from_limbs(limbs):
    return sum(int(l) << (32 * k) for k, l in enumerate(limbs))


def simulate(
    code: list, initial: dict, limit: int, heap=None, heap_page=10, start_ts=8,
    storage=None, contract_address=0x8001, code_hashes=None, code_page_base=1024,
) -> dict:
    """Run the mini-VM for `limit` cycles; returns dense witness columns.

    `heap` {word_index: int} and `storage` {key: value} are the backing
    stores (the witness-oracle role); heap accesses emit MemoryQuery rows
    and log opcodes emit LogQuery rows that thread the VM's queues —
    global consistency is enforced downstream (ram_permutation, demux,
    storage_validity)."""
    heap = {} if heap is None else heap
    storage = {} if storage is None else storage
    regs = [list(r) for r in initial["registers"]]
    reg_ptr = list(initial.get("register_is_ptr", [False] * REGISTERS_COUNT))
    flags = dict(of=initial["flag_of_lt"], eq=initial["flag_eq"], gt=initial["flag_gt"])
    pc = int(initial["pc"])
    ergs = int(initial["ergs_remaining"])
    ts = int(initial["timestamp"])
    halted = bool(initial["halted"])

    cols = {
        k: []
        for k in [
            "opcode_word_lo", "opcode_word_hi", "op", "cond", "src0", "src1",
            "dst0", "dst1", "use_imm", "imm", "execute_op", "src0_val",
            "src1_val", "result", "result_hi", "carries", "div_rem",
            "regs_before", "flags_before", "pc_before", "ergs_before",
            "halted_before", "regs_after", "flags_after", "pc_after",
            "ergs_after", "halted_after", "mul_q_dummy",
            "shift_amount", "shift_mult", "shift_rows", "shift_aux",
            "mem_push", "mem_rw", "mem_index", "mem_value",
            "log_push", "log_variant", "log_key", "log_value", "log_read_value",
            "ret_return_pc", "regs_ptr_before", "regs_ptr_after", "result_is_ptr",
            "dec_push", "dec_code_hash", "dec_page", "dec_is_first",
        ]
    }
    code_hashes = {} if code_hashes is None else code_hashes
    code_hash_pages = {}  # hash -> allocated code page (reused on re-decommit)
    # callstack sponge (narrow 4-lane state; push absorbs the saved frame)
    from ..utils import queues_ref

    cs_stack = []  # python frames: (return_pc, previous sponge state)
    cs_state = [0, 0, 0, 0]
    cs_depth = 0
    cs_states = [list(cs_state)]
    cs_depths = [0]
    ret_prev_states = []

    for _cycle in range(limit):
        word = code[pc] if (not halted and pc < len(code)) else isa.encode_instruction(isa.NOP)
        op = word & 0xFF
        cond = (word >> 8) & 0xF
        s0 = (word >> 12) & 0xF
        s1 = (word >> 16) & 0xF
        d0 = (word >> 20) & 0xF
        d1 = (word >> 24) & 0xF
        use_imm = (word >> 28) & 1
        imm = (word >> 32) & U32M

        cond_ok = {
            isa.COND_ALWAYS: True,
            isa.COND_GT: flags["gt"],
            isa.COND_LT: flags["of"],
            isa.COND_EQ: flags["eq"],
            isa.COND_NE: not flags["eq"],
        }[cond]
        # out-of-ergs masks the opcode into PANIC (decoded_opcode.rs:78-158
        # fast-exception role, reduced: suppress effects, drain ergs, halt)
        price_now = isa.PRICES.get(op, 0)
        out_of_ergs = (not halted) and cond_ok and price_now > ergs
        execute_op = (not halted) and cond_ok and not out_of_ergs

        a = _from_limbs(regs[s0])
        b = imm if use_imm else _from_limbs(regs[s1])

        cols["regs_before"].append([list(r) for r in regs])
        cols["regs_ptr_before"].append(list(reg_ptr))
        cols["flags_before"].append([flags["of"], flags["eq"], flags["gt"]])
        cols["pc_before"].append(pc)
        cols["ergs_before"].append(ergs)
        cols["halted_before"].append(halted)

        res, res_hi, carries, rem = 0, 0, [0] * 9, 0
        shift_cols = (0, 1, 0)  # (amount, multiplier 2^s, aux)
        mem_cols = (False, False, 0, 0)  # (push, rw, word index, value)
        log_cols = (False, 0, 0, 0, 0)  # (push, variant, key, value, read_value)
        ret_cols = ([0, 0, 0, 0], 0)  # (previous sponge state, return pc)
        dec_cols = (False, 0, 0, False)  # (push, code hash, page, is_first)
        res_is_ptr = False
        new_flags = dict(flags)
        new_pc = pc + 1 if not halted else pc
        writes0 = writes1 = False
        if out_of_ergs:
            ergs = 0
            halted = True
        if execute_op:
            price, props = isa.decode_table()[op]
            ergs = max(0, ergs - price)
            if op in (isa.ADD, isa.SUB):
                writes0 = True
                if op == isa.ADD:
                    full = a + b
                    res = full & ((1 << 256) - 1)
                    carry = full >> 256
                else:
                    full = a - b
                    res = full % (1 << 256)
                    carry = 1 if a < b else 0
                # materialize the 8-limb carry chain
                c = 0
                for k in range(8):
                    al, bl = (a >> (32 * k)) & U32M, (b >> (32 * k)) & U32M
                    if op == isa.ADD:
                        t = al + bl + c
                        c = t >> 32
                    else:
                        t = al - bl - c
                        c = 1 if t < 0 else 0
                    carries[k + 1] = c
                new_flags = dict(of=bool(carry), eq=res == 0, gt=(not carry) and res != 0)
            elif op in (isa.AND, isa.OR, isa.XOR):
                writes0 = True
                res = {isa.AND: a & b, isa.OR: a | b, isa.XOR: a ^ b}[op]
                new_flags = dict(of=False, eq=res == 0, gt=False)
            elif op == isa.MUL:
                writes0 = writes1 = True
                full = a * b
                res = full & ((1 << 256) - 1)
                res_hi = full >> 256
                new_flags = dict(of=res_hi != 0, eq=res == 0, gt=False)
            elif op == isa.DIV:
                writes0 = writes1 = True
                if b == 0:
                    res, rem = 0, 0
                else:
                    res, rem = divmod(a, b)
                res_hi = rem  # dst1 receives the remainder
                new_flags = dict(of=b == 0, eq=res == 0, gt=rem == 0 and b != 0)
            elif op in (isa.SHL, isa.SHR):
                writes0 = True
                s_amt = b & 0xFF
                mult = 1 << s_amt
                if op == isa.SHL:
                    full = a * mult
                    res = full % (1 << 256)
                    shift_aux = full >> 256
                else:
                    res, shift_aux = divmod(a, mult)
                shift_cols = (s_amt, mult, shift_aux)
                new_flags = dict(of=False, eq=res == 0, gt=False)
            elif op == isa.HEAP_READ:
                writes0 = True
                widx = a & U32M
                res = heap.get(widx, 0)
                mem_cols = (True, False, widx, res)
            elif op == isa.HEAP_WRITE:
                widx = a & U32M
                heap[widx] = b
                mem_cols = (True, True, widx, b)
            elif op == isa.LOG:
                variant = d1  # dst1 nibble selects the log variant
                read_val = 0
                if variant == isa.LOG_VARIANT_STORAGE_WRITE:
                    read_val = storage.get(a, 0)
                    storage[a] = b
                log_cols = (True, variant, a, b, read_val)
            elif op == isa.CONTEXT:
                writes0 = True
                res = {
                    isa.CTX_VARIANT_ADDRESS: contract_address,
                    isa.CTX_VARIANT_ERGS_LEFT: ergs,
                    isa.CTX_VARIANT_TIMESTAMP: start_ts + _cycle,
                }.get(d1, 0)
            elif op == isa.JUMP:
                new_pc = imm
            elif op == isa.NEAR_CALL:
                frame_enc = [pc + 1] + [0] * 7
                cs_stack.append((pc + 1, list(cs_state)))
                cs_state = queues_ref.narrow_push(cs_state, frame_enc)
                cs_depth += 1
                new_pc = imm
            elif op == isa.RET:
                if cs_depth == 0:
                    halted = True
                else:
                    ret_pc, prev_state = cs_stack.pop()
                    ret_cols = (list(prev_state), ret_pc)
                    cs_state = prev_state
                    cs_depth -= 1
                    new_pc = ret_pc
            elif op == isa.PTR_ADD:
                writes0 = True
                res = (a + (b & U32M)) % (1 << 256)
                res_is_ptr = True
            elif op == isa.FAR_CALL:
                # decommit request for the callee's code (witness oracle maps
                # address -> versioned code hash), 63/64 ergs passing, and a
                # return frame (reduced 8-element encoding this round)
                callee = a % (1 << 160)
                code_hash = code_hashes.get(callee, 0)
                is_first = code_hash not in code_hash_pages
                if is_first:
                    code_hash_pages[code_hash] = code_page_base + len(code_hash_pages)
                page = code_hash_pages[code_hash]
                dec_cols = (True, code_hash, page, is_first)
                ergs = ergs - (ergs >> 6)  # caller keeps 1/64 (burned here;
                # restored with full frames in round 2)
                frame_enc = [pc + 1] + [0] * 7
                cs_stack.append((pc + 1, list(cs_state)))
                cs_state = queues_ref.narrow_push(cs_state, frame_enc)
                cs_depth += 1
                new_pc = imm
            elif op == isa.HALT:
                halted = True
        flags = new_flags if execute_op and (isa.PROPS.get(op, 0) & isa.PROP_SETS_FLAGS) else flags
        if execute_op and writes0:
            regs[d0] = _to_limbs(res)
            reg_ptr[d0] = res_is_ptr
        if execute_op and writes1:
            regs[d1] = _to_limbs(res_hi)
            reg_ptr[d1] = False
        pc = new_pc if not cols["halted_before"][-1] else pc

        cols["opcode_word_lo"].append(word & U32M)
        cols["opcode_word_hi"].append(word >> 32)
        cols["op"].append(op)
        cols["cond"].append(cond)
        cols["src0"].append(s0)
        cols["src1"].append(s1)
        cols["dst0"].append(d0)
        cols["dst1"].append(d1)
        cols["use_imm"].append(use_imm)
        cols["imm"].append(imm)
        cols["execute_op"].append(execute_op)
        cols["src0_val"].append(_to_limbs(a))
        cols["src1_val"].append(_to_limbs(b))
        cols["result"].append(_to_limbs(res))
        cols["result_hi"].append(_to_limbs(res_hi))
        cols["carries"].append(list(carries))
        cols["div_rem"].append(_to_limbs(rem))
        cols["mul_q_dummy"].append(0)
        s_amt, s_mult, s_aux = shift_cols
        cols["shift_amount"].append(s_amt)
        cols["shift_mult"].append(_to_limbs(s_mult))
        cols["shift_rows"].append([s_amt * 4 + idx for idx in range(4)])
        cols["shift_aux"].append(_to_limbs(s_aux))
        m_push, m_rw, m_idx, m_val = mem_cols
        cols["mem_push"].append(m_push)
        cols["mem_rw"].append(m_rw)
        cols["mem_index"].append(m_idx)
        cols["mem_value"].append(_to_limbs(m_val))
        l_push, l_var, l_key, l_val, l_rv = log_cols
        cols["log_push"].append(l_push)
        cols["log_variant"].append(l_var)
        cols["log_key"].append(_to_limbs(l_key))
        cols["log_value"].append(_to_limbs(l_val))
        cols["log_read_value"].append(_to_limbs(l_rv))
        cols["ret_return_pc"].append(ret_cols[1])
        ret_prev_states.append(list(ret_cols[0]))
        cs_states.append(list(cs_state))
        cs_depths.append(cs_depth)
        d_push, d_hash, d_page, d_first = dec_cols
        cols["dec_push"].append(d_push)
        cols["dec_code_hash"].append(_to_limbs(d_hash))
        cols["dec_page"].append(d_page)
        cols["dec_is_first"].append(d_first)
        cols["regs_after"].append([list(r) for r in regs])
        cols["regs_ptr_after"].append(list(reg_ptr))
        cols["result_is_ptr"].append(res_is_ptr)
        cols["flags_after"].append([flags["of"], flags["eq"], flags["gt"]])
        cols["pc_after"].append(pc)
        cols["ergs_after"].append(ergs)
        cols["halted_after"].append(halted)

    out = {}
    for k, v in cols.items():
        arr = np.asarray(v)
        if arr.dtype == bool:
            out[k] = jnp.asarray(arr)
        else:
            out[k] = jnp.asarray(arr.astype(np.uint32))
    # the code tape (for opcode-fetch checking)
    out["code_lo"] = jnp.asarray(np.array([cw & U32M for cw in code], np.uint32))
    out["code_hi"] = jnp.asarray(np.array([cw >> 32 for cw in code], np.uint32))
    # callstack sponge columns (field elements as lo/hi u32 pairs)
    cs = np.asarray(cs_states, np.uint64)  # (N+1, 4)
    out["cs_state_lo"] = jnp.asarray((cs & 0xFFFFFFFF).astype(np.uint32))
    out["cs_state_hi"] = jnp.asarray((cs >> 32).astype(np.uint32))
    rp = np.asarray(ret_prev_states, np.uint64)  # (N, 4)
    out["ret_prev_lo"] = jnp.asarray((rp & 0xFFFFFFFF).astype(np.uint32))
    out["ret_prev_hi"] = jnp.asarray((rp >> 32).astype(np.uint32))
    out["cs_depth"] = jnp.asarray(np.asarray(cs_depths, np.uint32))
    return out


def generate_witness(
    code: list, initial: dict, config: MainVmConfig, heap=None, storage=None,
    code_hashes=None,
) -> dict:
    w = simulate(
        code, initial, config.limit, heap, config.heap_page,
        config.starting_timestamp, storage, config.contract_address,
        code_hashes, config.code_page_base,
    )
    from ..ops import gf, queues
    from ..base_structures.log_query import encode_log_queries
    from ..base_structures.memory_query import encode_memory_queries

    mq = memory_queries(w, config)
    w["mem_chain"] = queues.simulate_chain(
        gf.zeros((12,)), encode_memory_queries(mq), w["mem_push"]
    )
    lq = log_queries(w, config)
    w["log_chain"] = queues.simulate_chain(
        gf.zeros((4,)), encode_log_queries(lq), w["log_push"]
    )
    from ..base_structures.decommit_query import encode_decommit_queries

    dq = decommit_queries(w, config)
    w["dec_chain"] = queues.simulate_chain(
        gf.zeros((12,)), encode_decommit_queries(dq), w["dec_push"]
    )
    return w


def decommit_queries(w: dict, config: MainVmConfig):
    """The per-cycle DecommitQuery view of the far_call columns — the tape
    that feeds sort_decommittment_requests (far_call.rs:1418 role)."""
    from ..base_structures.decommit_query import DecommitQueries

    N = w["dec_push"].shape[0]
    ts = jnp.uint32(config.starting_timestamp) + jnp.arange(N, dtype=jnp.uint32)
    return DecommitQueries(
        code_hash=w["dec_code_hash"],
        page=w["dec_page"],
        is_first=w["dec_is_first"],
        timestamp=ts,
    )


def log_queries(w: dict, config: MainVmConfig):
    """The per-cycle LogQuery view of the log columns — the unified log tape
    that feeds demux_log_queue."""
    from ..base_structures.log_query import LogQueries
    from ..isa.system_params import (
        EVENT_AUX_BYTE,
        L1_MESSAGE_AUX_BYTE,
        STORAGE_AUX_BYTE,
    )

    N = w["log_push"].shape[0]
    ts = jnp.uint32(config.starting_timestamp) + jnp.arange(N, dtype=jnp.uint32)
    var = w["log_variant"]
    aux = jnp.where(
        var == isa.LOG_VARIANT_EVENT,
        jnp.uint32(EVENT_AUX_BYTE),
        jnp.where(
            var == isa.LOG_VARIANT_L1_MESSAGE,
            jnp.uint32(L1_MESSAGE_AUX_BYTE),
            jnp.uint32(STORAGE_AUX_BYTE),
        ),
    )
    addr_limbs = jnp.zeros((N, 5), jnp.uint32)
    for k in range(5):
        addr_limbs = addr_limbs.at[:, k].set(
            jnp.uint32((config.contract_address >> (32 * k)) & 0xFFFFFFFF)
        )
    return LogQueries(
        address=addr_limbs,
        key=w["log_key"],
        read_value=w["log_read_value"],
        written_value=w["log_value"],
        aux_byte=aux,
        rw_flag=jnp.ones(N, bool),
        rollback=jnp.zeros(N, bool),
        is_service=jnp.zeros(N, bool),
        shard_id=jnp.zeros(N, jnp.uint32),
        tx_number_in_block=jnp.zeros(N, jnp.uint32),
        timestamp=ts,
    )


def memory_queries(w: dict, config: MainVmConfig):
    """The per-cycle MemoryQuery view of the uma columns — the tape that
    feeds ram_permutation's unsorted queue."""
    from ..base_structures.memory_query import MemoryQueries

    N = w["mem_push"].shape[0]
    ts = jnp.uint32(config.starting_timestamp) + jnp.arange(N, dtype=jnp.uint32)
    return MemoryQueries(
        timestamp=ts,
        memory_page=jnp.full(N, config.heap_page, jnp.uint32),
        index=w["mem_index"],
        rw_flag=w["mem_rw"],
        is_ptr=jnp.zeros(N, bool),
        value=w["mem_value"],
    )


# ---------------------------------------------------------------------------
# constraint evaluation (row-parallel)
# ---------------------------------------------------------------------------


def _u32_to_u16_limbs(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 8) u32 limbs -> (..., 16) u16 limbs."""
    lo = x & jnp.uint32(0xFFFF)
    hi = x >> 16
    return jnp.stack([lo, hi], axis=-1).reshape(x.shape[:-1] + (16,))


def eval_constraints(w: dict, config: MainVmConfig) -> dict:
    N = config.limit
    res = {}

    # ---- decode: fields match the opcode word ----
    word_lo, word_hi = w["opcode_word_lo"], w["opcode_word_hi"]
    res["decode_fields"] = (
        (w["op"] == (word_lo & 0xFF))
        & (w["cond"] == ((word_lo >> 8) & 0xF))
        & (w["src0"] == ((word_lo >> 12) & 0xF))
        & (w["src1"] == ((word_lo >> 16) & 0xF))
        & (w["dst0"] == ((word_lo >> 20) & 0xF))
        & (w["dst1"] == ((word_lo >> 24) & 0xF))
        & (w["use_imm"] == ((word_lo >> 28) & 1))
        & (w["imm"] == word_hi)
    )

    # ---- opcode fetch: the executed word comes from the code tape at pc
    # (the super-PC code-word read of pre_state.rs:113-175; out-of-range or
    # halted cycles execute NOP) ----
    L = w["code_lo"].shape[0]
    pc_b = w["pc_before"]
    in_code = (pc_b < L) & ~w["halted_before"]
    fetched_lo = w["code_lo"][jnp.minimum(pc_b, L - 1)]
    fetched_hi = w["code_hi"][jnp.minimum(pc_b, L - 1)]
    nop_word = isa.encode_instruction(isa.NOP)
    exp_lo = jnp.where(in_code, fetched_lo, jnp.uint32(nop_word & U32M))
    exp_hi = jnp.where(in_code, fetched_hi, jnp.uint32(nop_word >> 32))
    res["opcode_fetch"] = (word_lo == exp_lo) & (word_hi == exp_hi)

    # ---- condition resolution (VMConditionalResolutionTable analog) ----
    fb = w["flags_before"]
    of, eq, gt = fb[:, 0] == 1, fb[:, 1] == 1, fb[:, 2] == 1
    cond_ok = (
        (w["cond"] == isa.COND_ALWAYS)
        | ((w["cond"] == isa.COND_GT) & gt)
        | ((w["cond"] == isa.COND_LT) & of)
        | ((w["cond"] == isa.COND_EQ) & eq)
        | ((w["cond"] == isa.COND_NE) & ~eq)
    )
    halted_before = w["halted_before"]
    price0 = jnp.zeros(N, jnp.uint32)
    for o, p in isa.PRICES.items():
        price0 = jnp.where(w["op"] == o, jnp.uint32(p), price0)
    out_of_ergs = cond_ok & ~halted_before & (price0 > w["ergs_before"])
    res["condition_resolution"] = w["execute_op"] == (
        cond_ok & ~halted_before & ~out_of_ergs
    )

    # ---- operand resolution ----
    rows = jnp.arange(N)
    regs_b = w["regs_before"]  # (N, 15, 8)
    src0_sel = regs_b[rows, w["src0"] % REGISTERS_COUNT]
    imm_val = jnp.concatenate(
        [w["imm"][:, None], jnp.zeros((N, 7), jnp.uint32)], axis=-1
    )
    src1_reg = regs_b[rows, w["src1"] % REGISTERS_COUNT]
    src1_sel = jnp.where((w["use_imm"] == 1)[:, None], imm_val, src1_reg)
    res["src0_resolution"] = (w["src0_val"] == src0_sel).all(-1)
    res["src1_resolution"] = (w["src1_val"] == src1_sel).all(-1)

    ex = w["execute_op"]
    a, b, r = w["src0_val"], w["src1_val"], w["result"]
    op = w["op"]

    # ---- add/sub: 8-limb carry chains (UIntXAddGate<32> relation) ----
    c = w["carries"]  # (N, 9)
    add_ok = jnp.ones(N, dtype=bool)
    sub_ok = jnp.ones(N, dtype=bool)
    for k in range(8):
        # carry iff a + b + cin >= 2^32; detect via wrap on two adds
        t1 = a[:, k] + b[:, k]
        c1 = t1 < a[:, k]
        t2 = t1 + c[:, k]
        c2 = t2 < t1
        add_ok = add_ok & (r[:, k] == t2) & (c[:, k + 1] == (c1 | c2).astype(jnp.uint32))
        d1 = a[:, k] - b[:, k]
        b1 = a[:, k] < b[:, k]
        d2 = d1 - c[:, k]
        b2 = d1 < c[:, k]
        sub_ok = sub_ok & (r[:, k] == d2) & (c[:, k + 1] == (b1 | b2).astype(jnp.uint32))
    res["add_relation"] = jnp.where(ex & (op == isa.ADD), add_ok & (c[:, 0] == 0), True)
    res["sub_relation"] = jnp.where(ex & (op == isa.SUB), sub_ok & (c[:, 0] == 0), True)

    # ---- binop ----
    res["binop_and"] = jnp.where(ex & (op == isa.AND), (r == (a & b)).all(-1), True)
    res["binop_or"] = jnp.where(ex & (op == isa.OR), (r == (a | b)).all(-1), True)
    res["binop_xor"] = jnp.where(ex & (op == isa.XOR), (r == (a ^ b)).all(-1), True)

    # ---- mul/div: 512-bit integer identities (U8x4FMAGate relation role) ----
    a16 = _u32_to_u16_limbs(a)
    b16 = _u32_to_u16_limbs(b)
    lo16 = _u32_to_u16_limbs(r)
    hi16 = _u32_to_u16_limbs(w["result_hi"])
    lo_hi = jnp.concatenate([lo16, hi16], axis=-1)  # (N, 32) = lo + hi<<256
    mul_id = nn.sides_equal(
        [("prod", a16, b16, 1)], [("lin", lo_hi, 1)], (N,), ncoef=34
    )
    res["mul_relation"] = jnp.where(ex & (op == isa.MUL), mul_id, True)
    # div: a == q*b + rem, rem < b (b != 0); q = result, rem = result_hi
    rem16 = _u32_to_u16_limbs(w["div_rem"])
    div_id = nn.sides_equal(
        [("lin", a16, 1)],
        [("prod", lo16, b16, 1), ("lin", rem16, 1)],
        (N,),
        ncoef=34,
    )
    b_nonzero = (b != 0).any(-1)
    rem_lt_b = _limbs_lt_256(w["div_rem"], b)
    div_ok = div_id & rem_lt_b & (w["result_hi"] == w["div_rem"]).all(-1)
    div_by_zero_ok = (r == 0).all(-1) & (w["result_hi"] == 0).all(-1)
    res["div_relation"] = jnp.where(
        ex & (op == isa.DIV), jnp.where(b_nonzero, div_ok, div_by_zero_ok), True
    )

    # ---- shifts: BitshiftTable lookups + mul/div relation (shifts.rs role) --
    is_shift = ex & ((op == isa.SHL) | (op == isa.SHR))
    s_amt = w["shift_amount"]
    res["shift_amount"] = jnp.where(is_shift, s_amt == (b[:, 0] & 0xFF), True)
    # 4 table lookups reconstruct the 256-bit multiplier 2^s
    shift_lookup_ok = jnp.ones(N, dtype=bool)
    for idx in range(4):
        q = jnp.stack(
            [
                s_amt + (idx << 8),
                w["shift_mult"][:, 2 * idx],
                w["shift_mult"][:, 2 * idx + 1],
            ],
            axis=-1,
        )
        shift_lookup_ok = shift_lookup_ok & tables.lookup_check(
            _BITSHIFT_TABLE, q, w["shift_rows"][:, idx]
        )
    res["shift_multiplier_lookup"] = jnp.where(is_shift, shift_lookup_ok, True)
    m16 = _u32_to_u16_limbs(w["shift_mult"])
    aux16 = _u32_to_u16_limbs(w["shift_aux"])
    # SHL: a * m == aux * 2^256 + res    (aux = overflowed high part)
    shl_id = nn.sides_equal(
        [("prod", a16, m16, 1)],
        [("lin", jnp.concatenate([lo16, aux16], axis=-1), 1)],
        (N,),
        ncoef=34,
    )
    res["shl_relation"] = jnp.where(ex & (op == isa.SHL), shl_id, True)
    # SHR: a == res * m + aux, aux < m
    shr_id = nn.sides_equal(
        [("lin", a16, 1)],
        [("prod", lo16, m16, 1), ("lin", aux16, 1)],
        (N,),
        ncoef=34,
    )
    aux_lt_m = _limbs_lt_256(w["shift_aux"], w["shift_mult"])
    res["shr_relation"] = jnp.where(ex & (op == isa.SHR), shr_id & aux_lt_m, True)

    # ---- uma family: memory-queue pushes (heap read/write, word-aligned) --
    from ..ops import gf as _gf, queues as _queues
    from ..base_structures.memory_query import encode_memory_queries

    is_mread = ex & (op == isa.HEAP_READ)
    is_mwrite = ex & (op == isa.HEAP_WRITE)
    res["mem_push_flags"] = w["mem_push"] == (is_mread | is_mwrite)
    res["mem_rw_flags"] = jnp.where(w["mem_push"], w["mem_rw"] == is_mwrite, True)
    res["mem_addressing"] = jnp.where(
        w["mem_push"], w["mem_index"] == a[:, 0], True
    )
    # read: the opcode result IS the queried value (oracle-provided; global
    # consistency is ram_permutation's job); write: the value is src1
    res["mem_read_value"] = jnp.where(
        is_mread, (w["result"] == w["mem_value"]).all(-1), True
    )
    res["mem_write_value"] = jnp.where(
        is_mwrite, (w["mem_value"] == b).all(-1), True
    )
    mq = memory_queries(w, config)
    res["mem_queue_chain"] = _queues.check_chain(
        w["mem_chain"], encode_memory_queries(mq), w["mem_push"]
    )

    # ---- log family: unified log-queue pushes (forward-only; rollbacks are
    # round-2 with the two-sided queue) ----
    from ..base_structures.log_query import encode_log_queries

    is_log = ex & (op == isa.LOG)
    res["log_push_flags"] = w["log_push"] == is_log
    res["log_fields"] = jnp.where(
        w["log_push"],
        (w["log_variant"] == w["dst1"])
        & (w["log_key"] == a).all(-1)
        & (w["log_value"] == b).all(-1),
        True,
    )
    lq = log_queries(w, config)
    res["log_queue_chain"] = _queues.check_chain(
        w["log_chain"], encode_log_queries(lq), w["log_push"]
    )

    # ---- context family: VM-state reads into dst0 ----
    is_ctx = ex & (op == isa.CONTEXT)
    rows_n = jnp.arange(N, dtype=jnp.uint32)
    ctx_scalar = jnp.where(
        w["dst1"] == isa.CTX_VARIANT_ERGS_LEFT,
        w["ergs_after"],
        jnp.where(
            w["dst1"] == isa.CTX_VARIANT_TIMESTAMP,
            jnp.uint32(config.starting_timestamp) + rows_n,
            jnp.uint32(0),
        ),
    )
    ctx_expected = jnp.zeros((N, 8), jnp.uint32).at[:, 0].set(ctx_scalar)
    addr_row = jnp.asarray(
        [(config.contract_address >> (32 * k)) & 0xFFFFFFFF for k in range(8)],
        jnp.uint32,
    )
    ctx_expected = jnp.where(
        (w["dst1"] == isa.CTX_VARIANT_ADDRESS)[:, None],
        addr_row[None, :],
        ctx_expected,
    )
    res["context_reads"] = jnp.where(is_ctx, (w["result"] == ctx_expected).all(-1), True)

    # ---- call_ret family: callstack sponge push/pop (the saved-frame sponge
    # of loading.rs:95-171 / call_ret_impl, reduced frame for near_call) ----
    from ..ops.gf import GF as _GF

    cs_before = _GF(w["cs_state_lo"][:-1], w["cs_state_hi"][:-1])
    cs_after = _GF(w["cs_state_lo"][1:], w["cs_state_hi"][1:])
    depth_b = w["cs_depth"][:-1]
    depth_a = w["cs_depth"][1:]
    is_far = ex & (op == isa.FAR_CALL)
    is_call = (ex & (op == isa.NEAR_CALL)) | is_far
    is_ret = ex & (op == isa.RET)
    ret_pops = is_ret & (depth_b > 0)
    ret_empty = is_ret & (depth_b == 0)
    ones_n = jnp.ones(N, dtype=bool)

    def frame_enc(pc_vals):
        lo = jnp.zeros((N, 8), jnp.uint32).at[:, 0].set(pc_vals)
        return _GF(lo, jnp.zeros((N, 8), jnp.uint32))

    pushed = _queues.narrow_state_transition(
        cs_before, frame_enc(w["pc_before"] + 1), ones_n
    )
    res["callstack_push"] = jnp.where(
        is_call,
        _gf.equal(pushed, cs_after).all(-1) & (depth_a == depth_b + 1),
        True,
    )
    prev_state = _GF(w["ret_prev_lo"], w["ret_prev_hi"])
    reabsorbed = _queues.narrow_state_transition(
        prev_state, frame_enc(w["ret_return_pc"]), ones_n
    )
    res["callstack_pop"] = jnp.where(
        ret_pops,
        _gf.equal(reabsorbed, cs_before).all(-1)
        & _gf.equal(cs_after, prev_state).all(-1)
        & (depth_a == depth_b - 1),
        True,
    )
    res["callstack_frozen"] = jnp.where(
        ~is_call & ~ret_pops,
        _gf.equal(cs_after, cs_before).all(-1) & (depth_a == depth_b),
        True,
    )

    # ---- writeback: one-hot register merge (cycle.rs dst selects) ----
    props = jnp.zeros(N, jnp.uint32)
    for o, p in isa.PROPS.items():
        props = jnp.where(op == o, jnp.uint32(p), props)
    writes0 = ex & ((props & isa.PROP_WRITES_DST0) != 0)
    writes1 = ex & ((props & isa.PROP_WRITES_DST1) != 0)
    regs_a = w["regs_after"]
    reg_idx = jnp.arange(REGISTERS_COUNT)
    is_d0 = (reg_idx[None, :] == w["dst0"][:, None]) & writes0[:, None]
    is_d1 = (reg_idx[None, :] == w["dst1"][:, None]) & writes1[:, None]
    expected = jnp.where(is_d0[..., None], w["result"][:, None, :], regs_b)
    expected = jnp.where(is_d1[..., None], w["result_hi"][:, None, :], expected)
    res["register_writeback"] = (regs_a == expected).reshape(N, -1).all(-1)
    # pointer-flag writeback (ptr family semantics: ptr ops keep is_ptr,
    # everything else clears it on write)
    exp_ptr = jnp.where(is_d0, w["result_is_ptr"][:, None], w["regs_ptr_before"])
    exp_ptr = jnp.where(is_d1, False, exp_ptr)
    res["register_ptr_writeback"] = (w["regs_ptr_after"] == exp_ptr).all(-1)
    # ptr_add requires a pointer source and produces a pointer
    is_ptr_op = ex & (op == isa.PTR_ADD)
    src0_is_ptr = jnp.take_along_axis(
        w["regs_ptr_before"], (w["src0"] % REGISTERS_COUNT)[:, None].astype(jnp.int32), axis=1
    )[:, 0]
    res["ptr_requires_pointer"] = jnp.where(is_ptr_op, src0_is_ptr, True)
    res["ptr_result_flag"] = w["result_is_ptr"] == is_ptr_op
    # ptr_add value: src0 + low u32 of src1
    ptr_sum_lo = a[:, 0] + b[:, 0]
    ptr_c = (ptr_sum_lo < a[:, 0]).astype(jnp.uint32)
    ptr_expected = a.at[:, 0].set(ptr_sum_lo)
    carry = ptr_c
    for k in range(1, 8):
        nk = a[:, k] + carry
        carry = (nk < a[:, k]).astype(jnp.uint32)
        ptr_expected = ptr_expected.at[:, k].set(nk)
    res["ptr_add_value"] = jnp.where(
        is_ptr_op, (w["result"] == ptr_expected).all(-1), True
    )

    # ---- flags / pc / ergs / halt transitions ----
    sets_flags = ex & ((props & isa.PROP_SETS_FLAGS) != 0)
    r_zero = (r == 0).all(-1)
    carry_out = c[:, 8] == 1
    hi_nonzero = (w["result_hi"] != 0).any(-1)
    exp_of = jnp.where(op == isa.MUL, hi_nonzero, carry_out)
    exp_of = jnp.where(op == isa.DIV, ~b_nonzero, exp_of)
    exp_of = jnp.where((op == isa.AND) | (op == isa.OR) | (op == isa.XOR), False, exp_of)
    exp_gt = jnp.where(
        (op == isa.ADD) | (op == isa.SUB), ~carry_out & ~r_zero, jnp.zeros(N, bool)
    )
    exp_gt = jnp.where(op == isa.DIV, ((w["div_rem"] == 0).all(-1)) & b_nonzero, exp_gt)
    fa = w["flags_after"]
    flags_expected = jnp.stack(
        [exp_of.astype(jnp.uint32), r_zero.astype(jnp.uint32), exp_gt.astype(jnp.uint32)],
        axis=-1,
    )
    res["flags_update"] = jnp.where(
        sets_flags, (fa == flags_expected).all(-1), (fa == fb).all(-1)
    )

    is_jump = ex & (op == isa.JUMP)
    exp_pc = jnp.where(is_jump | is_call, w["imm"], w["pc_before"] + 1)
    exp_pc = jnp.where(ret_pops, w["ret_return_pc"], exp_pc)
    exp_pc = jnp.where(halted_before, w["pc_before"], exp_pc)
    res["pc_update"] = w["pc_after"] == exp_pc

    price = jnp.zeros(N, jnp.uint32)
    for o, p in isa.PRICES.items():
        price = jnp.where(op == o, jnp.uint32(p), price)
    charged = w["ergs_before"] - jnp.minimum(price, w["ergs_before"])
    # far_call passes 63/64 of the remaining ergs (opcodes far_call 63/64 rule)
    exp_ergs = jnp.where(is_far, charged - (charged >> 6), charged)
    exp_ergs = jnp.where(ex, exp_ergs, w["ergs_before"])
    exp_ergs = jnp.where(out_of_ergs, 0, exp_ergs)  # panic drains ergs
    res["ergs_update"] = w["ergs_after"] == exp_ergs

    is_halt = (ex & (op == isa.HALT)) | ret_empty | out_of_ergs
    res["halt_update"] = w["halted_after"] == (halted_before | is_halt)

    # ---- far_call decommit-queue pushes ----
    from ..base_structures.decommit_query import encode_decommit_queries

    res["dec_push_flags"] = w["dec_push"] == is_far
    # fresh pages are allocated sequentially per DISTINCT hash; a re-decommit
    # reuses the first occurrence's page (the decommit sorter's
    # same-page-within-group invariant)
    firsts_before = jnp.concatenate(
        [jnp.zeros(1, jnp.uint32),
         jnp.cumsum((w["dec_push"] & w["dec_is_first"]).astype(jnp.uint32))[:-1]]
    )
    res["dec_page_allocation"] = jnp.where(
        w["dec_push"] & w["dec_is_first"],
        w["dec_page"] == jnp.uint32(config.code_page_base) + firsts_before,
        True,
    )
    same_hash = (w["dec_code_hash"][:, None, :] == w["dec_code_hash"][None, :, :]).all(-1)
    earlier = jnp.tril(jnp.ones((N, N), bool), k=-1)
    pair_pushed = w["dec_push"][:, None] & w["dec_push"][None, :]
    seen_before = (same_hash & earlier & w["dec_push"][None, :]).any(-1)
    res["dec_is_first"] = jnp.where(
        w["dec_push"], w["dec_is_first"] == ~seen_before, True
    )
    # page reuse: any two pushed rows with the same hash share the page
    page_eq = w["dec_page"][:, None] == w["dec_page"][None, :]
    res["dec_page_reuse"] = (~(same_hash & pair_pushed) | page_eq).all(-1)
    dqv = decommit_queries(w, config)
    res["dec_queue_chain"] = _queues.check_chain(
        w["dec_chain"], encode_decommit_queries(dqv), w["dec_push"]
    )

    # ---- cycle-to-cycle continuity ----
    prev = lambda x: x[:-1]
    res["state_continuity"] = (
        (w["regs_before"][1:] == w["regs_after"][:-1]).reshape(N - 1, -1).all(-1)
        & (w["flags_before"][1:] == w["flags_after"][:-1]).all(-1)
        & (w["pc_before"][1:] == w["pc_after"][:-1])
        & (w["ergs_before"][1:] == w["ergs_after"][:-1])
        & (w["halted_before"][1:] == w["halted_after"][:-1])
    )
    return res


def _limbs_lt_256(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    lt = jnp.zeros(a.shape[:-1], bool)
    eq = jnp.ones(a.shape[:-1], bool)
    for k in range(7, -1, -1):
        lt = lt | (eq & (a[..., k] < b[..., k]))
        eq = eq & (a[..., k] == b[..., k])
    return lt


def all_ok(residuals: dict) -> bool:
    return all(bool(np.asarray(v).all()) for v in residuals.values())


eval_constraints_jit = jax.jit(eval_constraints, static_argnums=(1,))
