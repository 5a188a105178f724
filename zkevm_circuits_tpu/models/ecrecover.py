"""ecrecover — circuit type 7: ECDSA public-key recovery precompile.

Reference parity: `src/ecrecover/` (entry `new_optimized.rs:1129-1384`, inner
`:870-1128`) — non-native secp256k1 over Goldilocks, per call 4 memory reads
(digest, v, r, s — MEMORY_QUERIES_PER_CALL = 4, mod.rs:41), recovery
`Q = r^{-1}(s*R - h*G) = u1*G + u2*R` with `u1 = -h*r^{-1}, u2 = s*r^{-1}
(mod n)`, final keccak256 of the affine point -> address, and a (success,
address) pair written to memory.

TPU-first redesign: where the reference evaluates GLV/wNAF windowed
multiplication gadgets in-circuit (new_optimized.rs:328-860), this framework
materializes the *affine double-and-add trace* as rows — one row per scalar
bit per ladder — and checks every group-law transition as integer identities
over 16 x u16 limbs (ops/nonnative.py) with per-identity quotient witnesses.
All (calls x 512) rows are checked by one batched pass.

Exception semantics mirror new_optimized.rs:913-1127 exactly; every flag is
recomputed *in-circuit* from values bound to the memory-read tape:

  - s >= (n-1)/2 convention violation (HALF_SUBGROUP_SIZE, :927-932)
  - x_overflow with r + n overflowing 256 bits (:934-937)
  - x = r + n*x_overflow out of base-field range (:939-945)
  - r == 0 / s == 0 (mod n)  (:949-954; h == 0 allowed, ALLOW_ZERO_MESSAGE
    = true, :53)
  - t = x^3 + b == 0 (:975-980)
  - t a quadratic non-residue (:1033-1035) — proven by a witness certificate
    w with w^2 == -t (mod p), valid because p == 3 (mod 4): t is a QNR iff
    -t is a QR.  The residue case is proven by ry itself (ry^2 == t).
  - recovered point at infinity (:1090-1096) — proven by acc1 == -acc2 on
    the checked ladder results.

recid is the low byte of the v word (:1288); bit 0 selects the y parity of
the lifted R, bit 1 the x = r + n branch (:915-925).  success/address writes
are masked on any exception (:1123).

The affine ladder (vs the reference's complete projective formulas) cannot
represent acc1 == +/-acc2 coincidences mid-add; the doubling coincidence
acc1 == acc2 at the final add has probability ~2^-256 for bound inputs and
witness generation asserts on it.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..base_structures.log_query import LogQueries, encode_log_queries
from ..base_structures.memory_query import MemoryQueries, encode_memory_queries
from ..isa.system_params import (
    ECRECOVER_PRECOMPILE_FORMAL_ADDRESS,
    PRECOMPILE_AUX_BYTE,
)
from ..ops import gf, keccak, nonnative as nn, queues, secp256k1 as ec
from ..ops.gf import GF

MEMORY_QUERIES_PER_CALL = 4
BITS = 256
# new_optimized.rs:109 HALF_SUBGROUP_SIZE = (n-1)/2; s >= this is an exception
HALF_N = (ec.N - 1) // 2
# 2^256 - n: r >= this means r + n overflows 256 bits (the `error` flag)
R_PLUS_N_OVERFLOW = (1 << 256) - ec.N


@dataclasses.dataclass(frozen=True)
class EcrecoverConfig:
    max_calls: int


def _limbs16(x: int, n=16):
    return nn.from_int(x % (1 << (16 * n)), n)


def _q_limbs(x: int):
    # quotients can slightly exceed 256 bits; 17 limbs of slack
    return nn.from_int(x, 17)


class _W:
    """column builder: dict of lists -> stacked numpy arrays."""

    def __init__(self):
        self.cols = {}

    def add(self, **kw):
        for k, v in kw.items():
            self.cols.setdefault(k, []).append(v)

    def stack(self, total):
        out = {}
        for k, vs in self.cols.items():
            arr = np.asarray(vs, dtype=np.uint32)
            pad = total - arr.shape[0]
            if pad:
                arr = np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
            out[k] = jnp.asarray(arr)
        return out


def _dummy_step(wb: _W):
    """all-zero step row (layout filler for masked calls)."""
    z16 = _limbs16(0)
    z17 = _q_limbs(0)
    wb.add(
        base_x=z16, base_y=z16, acc_x=z16, acc_y=z16,
        acc_inf=np.uint32(1), bit=np.uint32(0),
        d_lam=z16, d_qa=z17, d_qb=z17, d_qc=z17, d_qd=z17, d_qe=z17, d_qf=z17,
        a_lam=z16, a_qa=z17, a_qb=z17, a_qc=z17, a_qd=z17, a_qe=z17, a_qf=z17,
        base_nx=z16, base_ny=z16, acc_nx=z16, acc_ny=z16, acc_ninf=np.uint32(1),
    )


def _double_witness(wb: _W, pt):
    """emit witness columns for doubling pt -> returns 2*pt."""
    x, y = pt
    lam = 3 * x * x * pow(2 * y, ec.P - 2, ec.P) % ec.P
    x3 = (lam * lam - 2 * x) % ec.P
    y3 = (lam * (x - x3) - y) % ec.P
    qa = (lam * 2 * y) // ec.P
    qb = (3 * x * x) // ec.P
    d2 = lam * lam - (x3 + 2 * x)
    qc, qd = (d2 // ec.P, 0) if d2 >= 0 else (0, -d2 // ec.P)
    d3 = lam * x - (lam * x3 + y3 + y)
    qe, qf = (d3 // ec.P, 0) if d3 >= 0 else (0, -d3 // ec.P)
    wb.add(
        d_lam=_limbs16(lam), d_qa=_q_limbs(qa), d_qb=_q_limbs(qb),
        d_qc=_q_limbs(qc), d_qd=_q_limbs(qd), d_qe=_q_limbs(qe), d_qf=_q_limbs(qf),
    )
    return (x3, y3)


def _add_witness(wb: _W, p1, p2, res_if_degenerate=None):
    """emit witness columns for p1 + p2 (x1 != x2 assumed when used)."""
    if p1 is None or p2 is None or p1[0] == p2[0]:
        # unused row (gated off); emit zeros
        wb.add(
            a_lam=_limbs16(0), a_qa=_q_limbs(0), a_qb=_q_limbs(0),
            a_qc=_q_limbs(0), a_qd=_q_limbs(0), a_qe=_q_limbs(0), a_qf=_q_limbs(0),
        )
        return res_if_degenerate
    x1, y1 = p1
    x2, y2 = p2
    lam = (y2 - y1) * pow(x2 - x1, ec.P - 2, ec.P) % ec.P
    x3 = (lam * lam - x1 - x2) % ec.P
    y3 = (lam * (x1 - x3) - y1) % ec.P
    d1 = (lam * x2 + y1) - (lam * x1 + y2)
    qa, qb = (d1 // ec.P, 0) if d1 >= 0 else (0, -d1 // ec.P)
    d2 = lam * lam - (x3 + x1 + x2)
    qc, qd = (d2 // ec.P, 0) if d2 >= 0 else (0, -d2 // ec.P)
    d3 = lam * x1 - (lam * x3 + y3 + y1)
    qe, qf = (d3 // ec.P, 0) if d3 >= 0 else (0, -d3 // ec.P)
    wb.add(
        a_lam=_limbs16(lam), a_qa=_q_limbs(qa), a_qb=_q_limbs(qb),
        a_qc=_q_limbs(qc), a_qd=_q_limbs(qd), a_qe=_q_limbs(qe), a_qf=_q_limbs(qf),
    )
    return (x3, y3)


_SCALAR_KEYS = ["u1", "u2", "r", "s", "h", "r_inv", "q_rinv", "q_u1", "q_u2",
                "call_valid", "nonres", "exc_inf"]
_POINT_KEYS = ["rx", "ry", "curve_w", "q_curve_w", "t", "q_t", "q_ry",
               "w_cert", "q_w", "qx", "qy",
               "f_lam", "f_qa", "f_qb", "f_qc", "f_qd", "f_qe", "f_qf",
               "acc1x", "acc1y", "acc2x", "acc2y"]


def _analyze_call(h, v, r, s):
    """host-side mirror of the in-circuit exception evaluation.

    Returns a dict with all per-call derived quantities (flags, t/ry/w_cert,
    ladder inputs).  Mirrors new_optimized.rs:913-1096."""
    recid = v & 0xFF
    y_odd = recid & 1
    x_ovf = (recid >> 1) & 1
    out = dict(y_odd=y_odd, x_ovf=x_ovf, t=0, ry=0, w_cert=0, nonres=False,
               rx=0, exc_inf=False, R=None)
    out["exc_s_conv"] = s >= HALF_N
    out["exc_error"] = bool(x_ovf) and r >= R_PLUS_N_OVERFLOW
    out["exc_r_zero"] = r % ec.N == 0
    out["exc_s_zero"] = s % ec.N == 0
    need_x = not out["exc_error"]
    x = (r + ec.N * x_ovf) if need_x else 0
    out["rx"] = x
    out["exc_x_range"] = need_x and x >= ec.P
    need_t = need_x and not out["exc_x_range"]
    out["need_t"] = need_t
    t = (x * x * x + ec.B) % ec.P if need_t else 0
    out["t"] = t
    out["exc_t_zero"] = need_t and t == 0
    if need_t and not out["exc_t_zero"]:
        y = pow(t, (ec.P + 1) // 4, ec.P)
        if y * y % ec.P == t:
            out["ry"] = y if (y & 1) == y_odd else ec.P - y
            out["R"] = (x, out["ry"])
        else:
            out["nonres"] = True
            out["w_cert"] = pow(ec.P - t, (ec.P + 1) // 4, ec.P)
            assert out["w_cert"] ** 2 % ec.P == (ec.P - t) % ec.P
    out["pre_exc"] = (
        out["exc_s_conv"] or out["exc_error"] or out["exc_x_range"]
        or out["exc_r_zero"] or out["exc_s_zero"] or out["exc_t_zero"]
        or out["nonres"]
    )
    out["ladder_on"] = not out["pre_exc"]
    return out


def generate_witness(calls: list, memory: dict, config: EcrecoverConfig,
                     mem_init_state=None) -> EcrecoverWitness:
    """calls: LogQuery dicts (key = ABI: [0]=in word off, [2]=out word off,
    [4]=in page, [5]=out page).  memory[(page, word)] = 32-byte value.
    Input layout at in_off: [digest, v, r, s]."""
    C = max(len(calls), 1)
    S = 2 * BITS

    sc = {k: [] for k in _SCALAR_KEYS}
    pts = {k: [] for k in _POINT_KEYS}
    step_builder = _W()
    step_exec = []
    read_rows, write_rows = [], []
    addresses = []

    for ci, call in enumerate(calls):
        key = int(call["key"])
        kl = [(key >> (32 * k)) & 0xFFFFFFFF for k in range(8)]
        in_off, out_off, in_page, out_page = kl[0], kl[2], kl[4], kl[5]
        ts = int(call["timestamp"])

        def word(idx):
            return int.from_bytes(memory.get((in_page, in_off + idx), b"\x00" * 32), "big")

        h, v, r, s = word(0), word(1), word(2), word(3)
        for j, val in enumerate([h, v, r, s]):
            read_rows.append(
                dict(timestamp=ts, memory_page=in_page, index=in_off + j,
                     rw_flag=False, is_ptr=False, value=val)
            )
        a = _analyze_call(h, v, r, s)

        sc["r"].append(_limbs16(r))
        sc["s"].append(_limbs16(s))
        sc["h"].append(_limbs16(h))
        sc["nonres"].append(np.uint32(a["nonres"]))

        valid = False
        if not a["ladder_on"]:
            # masked failure: ladder gated off (2*BITS dummy rows keep the
            # per-call step layout); still bind rx/t/ry/w_cert where defined
            for _ in range(2 * BITS):
                _dummy_step(step_builder)
                step_exec.append(False)
            for k2 in ["u1", "u2", "r_inv"]:
                sc[k2].append(_limbs16(0))
            for k2 in ["q_rinv", "q_u1", "q_u2"]:
                sc[k2].append(_q_limbs(0))
            need_x = not a["exc_error"]
            pts["rx"].append(_limbs16(a["rx"] if need_x else 0))
            if a["need_t"]:
                x = a["rx"]
                w_sq = x * x % ec.P
                pts["curve_w"].append(_limbs16(w_sq))
                pts["q_curve_w"].append(_q_limbs((x * x) // ec.P))
                pts["t"].append(_limbs16(a["t"]))
                pts["q_t"].append(_q_limbs((x * w_sq + ec.B - a["t"]) // ec.P))
                pts["ry"].append(_limbs16(a["ry"]))
                q_ry = 0 if a["nonres"] else (a["ry"] ** 2 - a["t"]) // ec.P
                pts["q_ry"].append(_q_limbs(q_ry))
                pts["w_cert"].append(_limbs16(a["w_cert"]))
                pts["q_w"].append(_q_limbs((a["w_cert"] ** 2 + a["t"]) // ec.P))
            else:
                for k2 in ["curve_w", "t", "ry", "w_cert"]:
                    pts[k2].append(_limbs16(0))
                for k2 in ["q_curve_w", "q_t", "q_ry", "q_w"]:
                    pts[k2].append(_q_limbs(0))
            for k2 in ["qx", "qy", "acc1x", "acc1y", "acc2x", "acc2y", "f_lam"]:
                pts[k2].append(_limbs16(0))
            for k2 in ["f_qa", "f_qb", "f_qc", "f_qd", "f_qe", "f_qf"]:
                pts[k2].append(_q_limbs(0))
            sc["exc_inf"].append(np.uint32(0))
        else:
            r_inv = pow(r % ec.N, ec.N - 2, ec.N)
            u1 = (-h * r_inv) % ec.N
            u2 = (s * r_inv) % ec.N
            R = a["R"]

            sc["u1"].append(_limbs16(u1))
            sc["u2"].append(_limbs16(u2))
            sc["r_inv"].append(_limbs16(r_inv))
            sc["q_rinv"].append(_q_limbs((r * r_inv - 1) // ec.N))
            sc["q_u1"].append(_q_limbs((h * r_inv + u1) // ec.N))
            sc["q_u2"].append(_q_limbs((s * r_inv - u2) // ec.N))

            x = a["rx"]
            pts["rx"].append(_limbs16(x))
            w_sq = x * x % ec.P
            pts["curve_w"].append(_limbs16(w_sq))
            pts["q_curve_w"].append(_q_limbs((x * x) // ec.P))
            pts["t"].append(_limbs16(a["t"]))
            pts["q_t"].append(_q_limbs((x * w_sq + ec.B - a["t"]) // ec.P))
            pts["ry"].append(_limbs16(a["ry"]))
            pts["q_ry"].append(_q_limbs((a["ry"] ** 2 - a["t"]) // ec.P))
            pts["w_cert"].append(_limbs16(0))
            pts["q_w"].append(_q_limbs(0))

            # two ladders
            accs = []
            for scalar, base in ((u1, (ec.GX, ec.GY)), (u2, R)):
                acc = None
                cur = base
                for i in range(BITS):
                    bit = (scalar >> i) & 1
                    wb_row = step_builder
                    wb_row.add(
                        base_x=_limbs16(cur[0]), base_y=_limbs16(cur[1]),
                        acc_x=_limbs16(acc[0] if acc else 0),
                        acc_y=_limbs16(acc[1] if acc else 0),
                        acc_inf=np.uint32(acc is None),
                        bit=np.uint32(bit),
                    )
                    nxt_base = _double_witness(wb_row, cur)
                    if bit:
                        new_acc = cur if acc is None else ec.add(acc, cur)
                        _add_witness(wb_row, acc, cur)
                    else:
                        new_acc = acc
                        _add_witness(wb_row, None, None)
                    wb_row.add(
                        base_nx=_limbs16(nxt_base[0]), base_ny=_limbs16(nxt_base[1]),
                        acc_nx=_limbs16(new_acc[0] if new_acc else 0),
                        acc_ny=_limbs16(new_acc[1] if new_acc else 0),
                        acc_ninf=np.uint32(new_acc is None),
                    )
                    step_exec.append(True)
                    acc = new_acc
                    cur = nxt_base
                accs.append(acc)

            acc1, acc2 = accs
            # acc2 = u2*R with u2 != 0 (mod n) -> never infinity here
            assert acc2 is not None
            exc_inf = (
                acc1 is not None and acc1[0] == acc2[0]
                and (acc1[1] + acc2[1]) % ec.P == 0
            )
            sc["exc_inf"].append(np.uint32(exc_inf))
            pts["acc1x"].append(_limbs16(acc1[0] if acc1 else 0))
            pts["acc1y"].append(_limbs16(acc1[1] if acc1 else 0))
            pts["acc2x"].append(_limbs16(acc2[0]))
            pts["acc2y"].append(_limbs16(acc2[1]))
            if exc_inf:
                Q = None
                for k2 in ["f_lam"]:
                    pts[k2].append(_limbs16(0))
                for k2 in ["f_qa", "f_qb", "f_qc", "f_qd", "f_qe", "f_qf"]:
                    pts[k2].append(_q_limbs(0))
                pts["qx"].append(_limbs16(0))
                pts["qy"].append(_limbs16(0))
            elif acc1 is None:
                # u1 == 0 (zero message hash): Q = acc2 directly
                Q = acc2
                for k2 in ["f_lam"]:
                    pts[k2].append(_limbs16(0))
                for k2 in ["f_qa", "f_qb", "f_qc", "f_qd", "f_qe", "f_qf"]:
                    pts[k2].append(_q_limbs(0))
                pts["qx"].append(_limbs16(Q[0]))
                pts["qy"].append(_limbs16(Q[1]))
                valid = True
            else:
                assert acc1[0] != acc2[0], "doubling coincidence (prob ~2^-256)"
                fw = _W()
                Q = _add_witness(fw, acc1, acc2)
                for k, vs in fw.cols.items():
                    pts["f_" + k[2:]].append(vs[0])
                pts["qx"].append(_limbs16(Q[0]))
                pts["qy"].append(_limbs16(Q[1]))
                valid = True

        sc["call_valid"].append(np.uint32(valid))
        if valid:
            addr = ec.eth_address(Q)
            addresses.append([(addr >> (32 * k)) & 0xFFFFFFFF for k in range(8)])
            write_rows.append(
                dict(timestamp=ts + 1, memory_page=out_page, index=out_off,
                     rw_flag=True, is_ptr=False, value=1)
            )
            write_rows.append(
                dict(timestamp=ts + 1, memory_page=out_page, index=out_off + 1,
                     rw_flag=True, is_ptr=False, value=addr)
            )
        else:
            addresses.append([0] * 8)
            for word_i in range(2):
                write_rows.append(
                    dict(timestamp=ts + 1, memory_page=out_page,
                         index=out_off + word_i, rw_flag=True, is_ptr=False,
                         value=0)
                )

    total_steps = C * S
    steps = step_builder.stack(total_steps)
    step_exec += [False] * (total_steps - len(step_exec))

    def pad_stack(lst, shape_tail):
        arr = (
            np.asarray(lst, dtype=np.uint32)
            if lst
            else np.zeros((0,) + shape_tail, np.uint32)
        )
        pad = C - arr.shape[0]
        if pad:
            arr = np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], np.uint32)])
        return jnp.asarray(arr)

    flag_keys = ("call_valid", "nonres", "exc_inf")
    scalars = {
        k: pad_stack(v, () if k in flag_keys else ((17,) if k.startswith("q_") else (16,)))
        for k, v in sc.items()
    }
    points = {}
    for k, v in pts.items():
        tail = (17,) if (k.startswith("q_") or k.startswith("f_q")) else (16,)
        points[k] = pad_stack(v, tail)

    pad_mq = dict(timestamp=0, memory_page=0, index=0, rw_flag=False, is_ptr=False, value=0)
    reads = MemoryQueries.from_lists(read_rows + [pad_mq] * (4 * C - len(read_rows)))
    writes = MemoryQueries.from_lists(write_rows + [pad_mq] * (2 * C - len(write_rows)))
    order = []
    for ci in range(len(calls)):
        order.extend(read_rows[4 * ci : 4 * ci + 4])
        order.extend(write_rows[2 * ci : 2 * ci + 2])
    mem_q = MemoryQueries.from_lists(order + [pad_mq] * (6 * C - len(order)))
    mem_exec = np.arange(6 * C) < len(order)
    mem_enc = encode_memory_queries(mem_q)
    init12 = gf.zeros((12,)) if mem_init_state is None else gf.from_u64(
        np.asarray(mem_init_state, dtype=np.uint64))
    mem_chain = queues.simulate_chain(init12, mem_enc, jnp.asarray(mem_exec))

    call_pad = list(calls) + [
        dict(address=0, key=0, read_value=0, written_value=0, aux_byte=0,
             rw_flag=False, rollback=False, is_service=False, shard_id=0,
             tx_number_in_block=0, timestamp=0)
    ] * (C - len(calls))
    calls_q = LogQueries.from_lists(call_pad)
    call_exec = np.arange(C) < len(calls)
    call_chain = queues.simulate_chain(
        gf.zeros((4,)), encode_log_queries(calls_q), jnp.asarray(call_exec)
    )

    return EcrecoverWitness(
        num_calls=jnp.uint32(len(calls)),
        calls=calls_q,
        call_execute=jnp.asarray(call_exec),
        call_chain=call_chain,
        scalars=scalars,
        points=points,
        steps=steps,
        step_execute=jnp.asarray(np.asarray(step_exec)),
        reads=reads,
        writes=writes,
        mem_chain=mem_chain,
        addresses=pad_stack(addresses, (8,)),
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class EcrecoverWitness:
    num_calls: jnp.ndarray
    calls: LogQueries
    call_execute: jnp.ndarray
    call_chain: GF
    scalars: dict  # per-call limbs + flags (see _SCALAR_KEYS)
    points: dict  # per-call point/exception columns (see _POINT_KEYS)
    steps: dict  # ladder step columns, (C*512, ...)
    step_execute: jnp.ndarray
    reads: MemoryQueries  # (4C,)
    writes: MemoryQueries  # (2C,)
    mem_chain: GF
    addresses: jnp.ndarray  # (C, 8) u32 LE limbs of the recovered address

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


_P = ec.P
_N = ec.N


def _check_double(st, batch):
    """group-law identities for base doubling (all rows)."""
    x, y, lam = st["base_x"], st["base_y"], st["d_lam"]
    xn, yn = st["base_nx"], st["base_ny"]
    pl = lambda q: ("prod", q, _pconst(q.shape[:-1]), 1)
    i1 = nn.sides_equal(
        [("prod", lam, y, 2), pl(st["d_qb"])],
        [("prod", x, x, 3), pl(st["d_qa"])],
        batch,
    )
    i2 = nn.sides_equal(
        [("prod", lam, lam, 1), pl(st["d_qd"])],
        [("lin", xn, 1), ("lin", x, 2), pl(st["d_qc"])],
        batch,
    )
    i3 = nn.sides_equal(
        [("prod", lam, x, 1), pl(st["d_qf"])],
        [("prod", lam, xn, 1), ("lin", yn, 1), ("lin", y, 1), pl(st["d_qe"])],
        batch,
    )
    return i1 & i2 & i3


def _pconst(batch):
    return jnp.broadcast_to(jnp.asarray(nn.from_int(_P)), batch + (16,))


def _nconst(batch):
    return jnp.broadcast_to(jnp.asarray(nn.from_int(_N)), batch + (16,))


def _check_add(x1, y1, x2, y2, x3, y3, lam, qa, qb, qc, qd, qe, qf, batch):
    pl = lambda q: ("prod", q, _pconst(batch), 1)
    i1 = nn.sides_equal(
        [("prod", lam, x2, 1), ("lin", y1, 1), pl(qb)],
        [("prod", lam, x1, 1), ("lin", y2, 1), pl(qa)],
        batch,
    )
    i2 = nn.sides_equal(
        [("prod", lam, lam, 1), pl(qd)],
        [("lin", x3, 1), ("lin", x1, 1), ("lin", x2, 1), pl(qc)],
        batch,
    )
    i3 = nn.sides_equal(
        [("prod", lam, x1, 1), pl(qf)],
        [("prod", lam, x3, 1), ("lin", y3, 1), ("lin", y1, 1), pl(qe)],
        batch,
    )
    return i1 & i2 & i3


def _limbs_eq_const(a, value: int):
    """a (..., 16) u16 limbs == constant 256-bit value."""
    limbs = nn.from_int(value)
    ok = jnp.ones(a.shape[:-1], dtype=bool)
    for k in range(16):
        ok = ok & (a[..., k] == jnp.uint32(int(limbs[k])))
    return ok


def _u16_pairs_eq_u32(limbs16, words32):
    """limbs16 (..., 16) u16-in-u32 recombine to words32 (..., 8) u32.

    Exact when limbs16 is range-checked (<= 0xFFFF)."""
    lo = limbs16[..., 0::2]
    hi = limbs16[..., 1::2]
    return ((lo + (hi << 16)) == words32).all(axis=-1)


def eval_constraints(w: EcrecoverWitness, config: EcrecoverConfig) -> dict:
    res = {}
    C = w.call_execute.shape[0]
    S = w.step_execute.shape[0]
    st = w.steps
    sc = w.scalars
    pt = w.points
    ce = w.call_execute

    # --- witness limb range checks (all witness-supplied limb columns) -----
    rng = jnp.ones((), dtype=bool)
    for d in (sc, pt):
        for k, v in d.items():
            if v.ndim >= 2 and v.shape[-1] in (16, 17):
                rng = rng & nn.check_range(v).all()
    for k, v in st.items():
        if v.ndim >= 2 and v.shape[-1] in (16, 17):
            rng = rng & nn.check_range(v).all()
    res["limb_range"] = rng

    # --- call queue + precompile identity ---------------------------------
    res["call_chain"] = queues.check_chain(
        w.call_chain, encode_log_queries(w.calls), ce
    )
    addr_ok = jnp.ones_like(ce)
    for i in range(5):
        l = (ECRECOVER_PRECOMPILE_FORMAL_ADDRESS >> (32 * i)) & 0xFFFFFFFF
        addr_ok = addr_ok & (w.calls.address[..., i] == jnp.uint32(l))
    res["call_is_ecrecover"] = jnp.where(
        ce, addr_ok & (w.calls.aux_byte == jnp.uint32(PRECOMPILE_AUX_BYTE)), True
    )

    # --- memory ABI binding (reads/writes tied to the call's ABI key) -----
    key = w.calls.key  # (C, 8) u32
    in_off, out_off = key[:, 0], key[:, 2]
    in_page, out_page = key[:, 4], key[:, 5]
    call_ts = w.calls.timestamp
    rd_call = jnp.arange(4 * C) // 4
    rd_j = (jnp.arange(4 * C) % 4).astype(jnp.uint32)
    reads_ok = (
        (w.reads.memory_page == in_page[rd_call])
        & (w.reads.index == in_off[rd_call] + rd_j)
        & (w.reads.timestamp == call_ts[rd_call])
        & (~w.reads.rw_flag)
        & (~w.reads.is_ptr)
    )
    res["reads_abi"] = jnp.where(ce[rd_call], reads_ok, True)
    wr_call = jnp.arange(2 * C) // 2
    wr_j = (jnp.arange(2 * C) % 2).astype(jnp.uint32)
    writes_ok = (
        (w.writes.memory_page == out_page[wr_call])
        & (w.writes.index == out_off[wr_call] + wr_j)
        & (w.writes.timestamp == call_ts[wr_call] + 1)
        & w.writes.rw_flag
        & (~w.writes.is_ptr)
    )
    res["writes_abi"] = jnp.where(ce[wr_call], writes_ok, True)

    # --- bind h/r/s scalar limbs to the read tape -------------------------
    h_words = w.reads.value[0::4]  # (C, 8)
    v_words = w.reads.value[1::4]
    r_words = w.reads.value[2::4]
    s_words = w.reads.value[3::4]
    res["reads_bind_scalars"] = jnp.where(
        ce,
        _u16_pairs_eq_u32(sc["h"], h_words)
        & _u16_pairs_eq_u32(sc["r"], r_words)
        & _u16_pairs_eq_u32(sc["s"], s_words),
        True,
    )

    # --- recid bits from the v word low byte (new_optimized.rs:1288,924) --
    v_byte = v_words[:, 0] & jnp.uint32(0xFF)
    y_odd = v_byte & 1
    x_ovf = (v_byte >> 1) & 1
    x_ovf_b = x_ovf == 1

    # --- in-circuit exception flags (new_optimized.rs:913-1096) -----------
    s_lt_half = nn.limbs_lt(sc["s"], HALF_N)
    exc_s_conv = ~s_lt_half
    exc_error = x_ovf_b & ~nn.limbs_lt(sc["r"], R_PLUS_N_OVERFLOW)
    zero16 = jnp.zeros((C, 16), jnp.uint32)
    r_zero_mod_n = (sc["r"] == zero16).all(-1) | _limbs_eq_const(sc["r"], _N)
    s_zero_mod_n = (sc["s"] == zero16).all(-1) | _limbs_eq_const(sc["s"], _N)
    # h == 0 is allowed (ALLOW_ZERO_MESSAGE = true, new_optimized.rs:53)

    # rx binding: rx == r + n * x_overflow whenever r + n does not overflow
    need_x = ~exc_error
    rx_eq_r = (pt["rx"] == sc["r"]).all(-1)
    rx_eq_r_plus_n = nn.sides_equal(
        [("lin", pt["rx"], 1)], [("lin", sc["r"], 1), ("const", _N)], (C,)
    )
    res["rx_binding"] = jnp.where(
        ce & need_x, jnp.where(x_ovf_b, rx_eq_r_plus_n, rx_eq_r), True
    )
    exc_x_range = need_x & ~nn.limbs_lt(pt["rx"], _P)
    need_t = need_x & ~exc_x_range

    # t = rx^3 + b (mod p): curve_w == rx^2 mod p, then t == rx*curve_w + b
    pc = _pconst((C,))
    curve_w_ok = nn.sides_equal(
        [("prod", pt["rx"], pt["rx"], 1)],
        [("prod", pt["q_curve_w"], pc, 1), ("lin", pt["curve_w"], 1)],
        (C,),
    )
    t_ok = nn.sides_equal(
        [("prod", pt["rx"], pt["curve_w"], 1), ("const", ec.B)],
        [("prod", pt["q_t"], pc, 1), ("lin", pt["t"], 1)],
        (C,),
    )
    res["t_binding"] = jnp.where(ce & need_t, curve_w_ok & t_ok, True)
    exc_t_zero = need_t & (pt["t"] == zero16).all(-1)

    # residue status: either ry^2 == t (residue) or w^2 == -t (non-residue)
    nonres = sc["nonres"] == 1
    has_y = need_t & ~exc_t_zero & ~nonres
    ry_sq_ok = nn.sides_equal(
        [("prod", pt["ry"], pt["ry"], 1)],
        [("prod", pt["q_ry"], pc, 1), ("lin", pt["t"], 1)],
        (C,),
    )
    res["ry_lift"] = jnp.where(ce & has_y, ry_sq_ok, True)
    w_cert_ok = nn.sides_equal(
        [("prod", pt["w_cert"], pt["w_cert"], 1), ("lin", pt["t"], 1)],
        [("prod", pt["q_w"], pc, 1)],
        (C,),
    )
    res["nonres_cert"] = jnp.where(ce & need_t & ~exc_t_zero & nonres,
                                   w_cert_ok, True)
    # the nonres flag only means anything where t is bound
    res["nonres_flag_domain"] = jnp.where(ce & ~(need_t & ~exc_t_zero),
                                          ~nonres, True)
    exc_nonres = need_t & ~exc_t_zero & nonres

    res["r_point_range"] = jnp.where(ce & has_y, nn.limbs_lt(pt["ry"], _P), True)
    res["ry_parity"] = jnp.where(
        ce & has_y, (pt["ry"][:, 0] & 1) == y_odd, True
    )

    pre_exc = (exc_s_conv | exc_error | exc_x_range | r_zero_mod_n
               | s_zero_mod_n | exc_t_zero | exc_nonres)
    ladder_on = ce & ~pre_exc

    # acc1/acc2 infinity flags from the checked ladder's last steps
    idx = jnp.arange(S)
    last1_idx = jnp.arange(C) * (2 * BITS) + (BITS - 1)
    last2_idx = jnp.arange(C) * (2 * BITS) + (2 * BITS - 1)
    acc1_inf = jnp.take(st["acc_ninf"], last1_idx) == 1
    acc2_inf = jnp.take(st["acc_ninf"], last2_idx) == 1
    exc_inf_flag = sc["exc_inf"] == 1
    # infinity certificate: acc1 == -acc2 (both finite, x equal, y's sum to p)
    inf_cert = (
        ~acc1_inf & ~acc2_inf
        & (pt["acc1x"] == pt["acc2x"]).all(-1)
        & nn.sides_equal(
            [("lin", pt["acc1y"], 1), ("lin", pt["acc2y"], 1)],
            [("const", _P)], (C,),
        )
    )
    res["exc_inf_cert"] = jnp.where(ladder_on & exc_inf_flag, inf_cert, True)
    res["exc_inf_domain"] = jnp.where(~ladder_on, ~exc_inf_flag, True)

    valid = ladder_on & ~exc_inf_flag
    res["call_valid_binding"] = jnp.where(
        ce, (sc["call_valid"] == 1) == valid, True
    )

    # --- scalar derivation (mod n), gated on ladder_on --------------------
    ncn = _nconst((C,))
    one = jnp.zeros((C, 16), jnp.uint32).at[:, 0].set(1)
    ok = nn.sides_equal(
        [("prod", sc["r"], sc["r_inv"], 1)],
        [("prod", sc["q_rinv"], ncn, 1), ("lin", one, 1)], (C,),
    )
    ok &= nn.sides_equal(
        [("prod", sc["h"], sc["r_inv"], 1), ("lin", sc["u1"], 1)],
        [("prod", sc["q_u1"], ncn, 1)], (C,),
    )
    ok &= nn.sides_equal(
        [("prod", sc["s"], sc["r_inv"], 1)],
        [("prod", sc["q_u2"], ncn, 1), ("lin", sc["u2"], 1)], (C,),
    )
    res["scalar_derivation"] = jnp.where(ladder_on, ok, True)

    # --- ladder steps -----------------------------------------------------
    sbatch = (S,)
    step_call = idx // (2 * BITS)
    # step_execute is fully determined by the per-call ladder_on flag
    res["step_execute_binding"] = w.step_execute == ladder_on[step_call]
    res["double_steps"] = jnp.where(
        w.step_execute, _check_double(st, sbatch), True
    )
    bit = st["bit"][..., 0] if st["bit"].ndim > 1 else st["bit"]
    acc_inf = (st["acc_inf"][..., 0] if st["acc_inf"].ndim > 1 else st["acc_inf"]) == 1
    acc_ninf = (st["acc_ninf"][..., 0] if st["acc_ninf"].ndim > 1 else st["acc_ninf"]) == 1
    do_add = w.step_execute & (bit == 1) & (~acc_inf)
    add_ok = _check_add(
        st["acc_x"], st["acc_y"], st["base_x"], st["base_y"],
        st["acc_nx"], st["acc_ny"], st["a_lam"],
        st["a_qa"], st["a_qb"], st["a_qc"], st["a_qd"], st["a_qe"], st["a_qf"],
        sbatch,
    )
    res["add_steps"] = jnp.where(do_add, add_ok, True)
    # distinct x for real adds (group-law completeness guard)
    res["add_distinct_x"] = jnp.where(
        do_add, (st["acc_x"] != st["base_x"]).any(axis=-1), True
    )
    # bit==1 & inf: acc_next = base; bit==0: acc_next = acc; inf flag updates
    take_base = w.step_execute & (bit == 1) & acc_inf
    keep = w.step_execute & (bit == 0)
    res["acc_assignment"] = (
        jnp.where(
            take_base,
            (st["acc_nx"] == st["base_x"]).all(-1) & (st["acc_ny"] == st["base_y"]).all(-1),
            True,
        )
        & jnp.where(
            keep,
            (st["acc_nx"] == st["acc_x"]).all(-1) & (st["acc_ny"] == st["acc_y"]).all(-1),
            True,
        )
        & jnp.where(w.step_execute, acc_ninf == (acc_inf & (bit == 0)), True)
    )

    # step chaining: base/acc continuity within each 256-step ladder
    pos_in_ladder = idx % BITS
    not_first = (pos_in_ladder > 0) & w.step_execute
    prev = lambda a: jnp.concatenate([a[:1], a[:-1]])
    cont = (
        (st["base_x"] == prev(st["base_nx"])).all(-1)
        & (st["base_y"] == prev(st["base_ny"])).all(-1)
        & (st["acc_x"] == prev(st["acc_nx"])).all(-1)
        & (st["acc_y"] == prev(st["acc_ny"])).all(-1)
        & (acc_inf == prev(acc_ninf.astype(jnp.uint32)).astype(bool))
    )
    res["step_continuity"] = jnp.where(not_first, cont, True)
    # ladder starts: first step of ladder1 has base = G; ladder2 base = R
    is_l2_start = (pos_in_ladder == 0) & ((idx % (2 * BITS)) == BITS)
    gx = jnp.asarray(nn.from_int(ec.GX))
    gy = jnp.asarray(nn.from_int(ec.GY))
    res["ladder1_base"] = jnp.where(
        w.step_execute & (idx % (2 * BITS) == 0),
        (st["base_x"] == gx).all(-1) & (st["base_y"] == gy).all(-1)
        & (acc_inf),
        True,
    )
    rx_per_step = pt["rx"][step_call]
    ry_per_step = pt["ry"][step_call]
    res["ladder2_base"] = jnp.where(
        w.step_execute & is_l2_start,
        (st["base_x"] == rx_per_step).all(-1) & (st["base_y"] == ry_per_step).all(-1)
        & acc_inf,
        True,
    )
    # scalar bits match u1/u2 decomposition
    limb_idx = pos_in_ladder // 16
    bit_in_limb = pos_in_ladder % 16
    is_l2 = (idx % (2 * BITS)) >= BITS
    u1_steps = sc["u1"][step_call]
    u2_steps = sc["u2"][step_call]
    limb = jnp.where(
        is_l2,
        jnp.take_along_axis(u2_steps, limb_idx[:, None], axis=1)[:, 0],
        jnp.take_along_axis(u1_steps, limb_idx[:, None], axis=1)[:, 0],
    )
    expected_bit = (limb >> bit_in_limb.astype(jnp.uint32)) & 1
    res["scalar_bits"] = jnp.where(w.step_execute, bit == expected_bit, True)

    # the last step of each ladder must carry acc == acc1/acc2
    last1 = (idx % (2 * BITS)) == BITS - 1
    last2 = (idx % (2 * BITS)) == 2 * BITS - 1
    a1x = pt["acc1x"][step_call]
    a1y = pt["acc1y"][step_call]
    a2x = pt["acc2x"][step_call]
    a2y = pt["acc2y"][step_call]
    res["ladder_results"] = jnp.where(
        w.step_execute & last1 & ~acc_ninf,
        (st["acc_nx"] == a1x).all(-1) & (st["acc_ny"] == a1y).all(-1),
        True,
    ) & jnp.where(
        w.step_execute & last2 & ~acc_ninf,
        (st["acc_nx"] == a2x).all(-1) & (st["acc_ny"] == a2y).all(-1),
        True,
    )
    # acc2 must be finite for a running ladder (u2 != 0 given s != 0 mod n)
    res["acc2_finite"] = jnp.where(ladder_on, ~acc2_inf, True)

    # --- final addition: Q = acc1 + acc2 (or Q = acc2 when u1 == 0) -------
    final_ok = _check_add(
        pt["acc1x"], pt["acc1y"], pt["acc2x"], pt["acc2y"],
        pt["qx"], pt["qy"], pt["f_lam"],
        pt["f_qa"], pt["f_qb"], pt["f_qc"], pt["f_qd"], pt["f_qe"], pt["f_qf"],
        (C,),
    )
    res["final_add"] = jnp.where(valid & ~acc1_inf, final_ok, True)
    res["final_add_distinct_x"] = jnp.where(
        valid & ~acc1_inf, (pt["acc1x"] != pt["acc2x"]).any(-1), True
    )
    res["final_q_from_acc2"] = jnp.where(
        valid & acc1_inf,
        (pt["qx"] == pt["acc2x"]).all(-1) & (pt["qy"] == pt["acc2y"]).all(-1),
        True,
    )

    # --- address: keccak256(Qx_be || Qy_be)[12:] --------------------------
    def be_bytes_words(limbs16):
        # 16 u16 LE limbs -> 32 BE bytes
        by = []
        for i in range(31, -1, -1):
            by.append((limbs16[..., i // 2] >> jnp.uint32(8 * (i % 2))) & 0xFF)
        return jnp.stack(by, axis=-1)  # (C, 32) BE byte order

    qb = jnp.concatenate([be_bytes_words(pt["qx"]), be_bytes_words(pt["qy"])], axis=-1)
    # build the single padded keccak block (64 bytes + 0x01 .. 0x80)
    pad_block = jnp.zeros((C, 136), jnp.uint32)
    pad_block = pad_block.at[:, :64].set(qb)
    pad_block = pad_block.at[:, 64].set(0x01)
    pad_block = pad_block.at[:, 135].set(0x80)
    by = pad_block.reshape(C, 17, 8)
    blo = by[..., 0] | (by[..., 1] << 8) | (by[..., 2] << 16) | (by[..., 3] << 24)
    bhi = by[..., 4] | (by[..., 5] << 8) | (by[..., 6] << 16) | (by[..., 7] << 24)
    slo, shi = keccak.absorb_block(
        jnp.zeros((C, 25), jnp.uint32), jnp.zeros((C, 25), jnp.uint32), blo, bhi
    )
    # digest bytes 12..32 -> 20-byte address -> compare vs w.addresses (u256)
    dig = []
    for lane in range(4):
        for part in (slo, shi):
            word = part[..., lane]
            for j in range(4):
                dig.append((word >> jnp.uint32(8 * j)) & 0xFF)
    dig = jnp.stack(dig, axis=-1)  # (C, 32) digest bytes
    addr_bytes = dig[:, 12:]  # (C, 20) BE address bytes
    addr_limbs = jnp.zeros((C, 8), jnp.uint32)
    for i in range(20):
        shift = jnp.uint32(8 * ((19 - i) % 4))
        addr_limbs = addr_limbs.at[:, (19 - i) // 4].add(addr_bytes[:, i] << shift)
    res["address"] = jnp.where(valid, (addr_limbs == w.addresses).all(-1), True)
    res["masked_address_zero"] = jnp.where(
        ce & ~valid, (w.addresses == 0).all(-1), True
    )

    # --- memory writes: (success, masked address) -------------------------
    exp_success = jnp.where(valid, 1, 0).astype(jnp.uint32)
    res["write_success"] = jnp.where(
        ce,
        (w.writes.value[0::2, 0] == exp_success)
        & (w.writes.value[0::2, 1:] == 0).all(-1),
        True,
    )
    exp_addr = jnp.where(valid[:, None], w.addresses, 0)
    res["write_address"] = jnp.where(
        ce, (w.writes.value[1::2] == exp_addr).all(-1), True
    )

    # --- memory queue: encodings recomputed from the bound reads/writes ---
    def interleave(r_field, w_field):
        rf = r_field.reshape((C, 4) + r_field.shape[1:])
        wf = w_field.reshape((C, 2) + w_field.shape[1:])
        return jnp.concatenate([rf, wf], axis=1).reshape((6 * C,) + r_field.shape[1:])

    mem_q = MemoryQueries(
        timestamp=interleave(w.reads.timestamp, w.writes.timestamp),
        memory_page=interleave(w.reads.memory_page, w.writes.memory_page),
        index=interleave(w.reads.index, w.writes.index),
        rw_flag=interleave(w.reads.rw_flag, w.writes.rw_flag),
        is_ptr=interleave(w.reads.is_ptr, w.writes.is_ptr),
        value=interleave(w.reads.value, w.writes.value),
    )
    mem_exec = ce[jnp.arange(6 * C) // 6]
    res["mem_chain"] = queues.check_chain(
        w.mem_chain, encode_memory_queries(mem_q), mem_exec
    )
    return res


def all_ok(residuals: dict) -> bool:
    return all(bool(np.asarray(v).all()) for v in residuals.values())


eval_constraints_jit = jax.jit(eval_constraints, static_argnums=(1,))


def instance_compact_form(w: EcrecoverWitness, config: EcrecoverConfig):
    """Single-instance ClosedFormInput (precompile I/O shape)."""
    from ..utils import protocol

    C = w.call_execute.shape[0]
    calls_qs = protocol.encode_queue_state_generic(
        gf.zeros((4,)), w.call_chain[C], w.num_calls
    )
    n_mem = (w.call_execute.sum() * 6).astype(jnp.uint32)
    mem_initial = protocol.encode_queue_state_generic(
        gf.zeros((12,)), w.mem_chain[0], jnp.uint32(0)
    )
    mem_final = protocol.encode_queue_state_generic(
        gf.zeros((12,)), w.mem_chain[w.mem_chain.shape[0] - 1], n_mem
    )
    obs_in = gf.concat([calls_qs, mem_initial], axis=-1)[None]
    obs_out = mem_final[None]
    return protocol.single_instance_compact_form(obs_in, obs_out)
