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
over 16 x u16 limbs (ops/nonnative.py):

    double:  lam*2y + qb*p == 3x^2 + qa*p;   lam^2 + ... == x' + 2x + ...
    add:     lam*(x2 - x1) == y2 - y1; ...

with per-identity quotient witnesses.  All (calls x 512) rows are checked by
one batched pass.  Scalar bit decompositions, u1/u2 derivation (mod n), the
R-point lift (y^2 == x^3 + 7, parity) and the address keccak are checked the
same way.  Exceptional inputs are masked: r/s range+zero exception flags are
recomputed in-circuit and invalid calls write (success=0, address=0) with
their ladder rows gated off (the reference's 10-flag path reduced — the
no-valid-y lift failure is witness-claimed this round, see ROADMAP.md).
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


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class EcrecoverWitness:
    num_calls: jnp.ndarray
    calls: LogQueries
    call_execute: jnp.ndarray
    call_chain: GF
    scalars: dict  # per-call: u1, u2, r, s, h, r_inv (16-limb) + n-quotients
    points: dict  # per-call: R point, result Q, final-add witness
    steps: dict  # ladder step columns, (C*512, ...)
    step_execute: jnp.ndarray
    step_call: jnp.ndarray
    reads: MemoryQueries  # (4C,)
    writes: MemoryQueries  # (2C,)
    mem_chain: GF
    mem_encodings: GF
    mem_execute: jnp.ndarray
    addresses: jnp.ndarray  # (C, 8) u32 LE limbs of the recovered address

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def generate_witness(calls: list, memory: dict, config: EcrecoverConfig) -> EcrecoverWitness:
    """calls: LogQuery dicts (key = ABI: [0]=in word off, [2]=out word off,
    [4]=in page, [5]=out page).  memory[(page, word)] = 32-byte value.
    Input layout at in_off: [digest, v, r, s]."""
    C = max(len(calls), 1)
    S = 2 * BITS

    sc = {
        k: []
        for k in [
            "u1", "u2", "r", "s", "h", "r_inv", "q_rinv", "q_u1", "q_u2",
            "call_valid",
        ]
    }
    pts = {k: [] for k in [
        "rx", "ry", "curve_w", "q_curve_w", "q_curve", "qx", "qy",
        "f_lam", "f_qa", "f_qb", "f_qc", "f_qd", "f_qe", "f_qf",
        "acc1x", "acc1y", "acc2x", "acc2y",
    ]}
    step_builder = _W()
    step_exec = []
    step_call = []
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
        recid = v - 27 if v >= 27 else v
        for j, val in enumerate([h, v, r, s]):
            read_rows.append(
                dict(timestamp=ts, memory_page=in_page, index=in_off + j,
                     rw_flag=False, is_ptr=False, value=val)
            )
        # exception flags (reduced set of new_optimized.rs:84 EXCEPTION_FLAGS):
        # r/s range+zero checks recomputed in-circuit; the no-valid-y lift
        # failure is a witness flag this round (ROADMAP)
        invalid = not (1 <= r < ec.N and 1 <= s < ec.N)
        R = None if invalid else ec.lift_x(r + (recid >> 1) * ec.N, odd=bool(recid & 1))
        if R is None:
            # masked failure: ladder gated off (2*BITS dummy rows keep the
            # per-call step layout), (success=0, address=0) written
            for _ in range(2 * BITS):
                _dummy_step(step_builder)
                step_exec.append(False)
                step_call.append(ci)
            sc["call_valid"].append(0)
            for k2 in ["u1", "u2", "r_inv"]:
                sc[k2].append(_limbs16(0))
            sc["r"].append(_limbs16(r))
            sc["s"].append(_limbs16(s))
            sc["h"].append(_limbs16(h))
            for k2 in ["q_rinv", "q_u1", "q_u2"]:
                sc[k2].append(_q_limbs(0))
            for k2 in ["rx", "ry", "curve_w", "qx", "qy", "acc1x", "acc1y",
                       "acc2x", "acc2y", "f_lam"]:
                pts[k2].append(_limbs16(0))
            pts["q_curve_w"].append(_q_limbs(0))
            pts["q_curve"].append(np.stack([_q_limbs(0), _q_limbs(0)]))
            for k2 in ["f_qa", "f_qb", "f_qc", "f_qd", "f_qe", "f_qf"]:
                pts[k2].append(_q_limbs(0))
            addresses.append([0] * 8)
            for word_i in range(2):
                write_rows.append(
                    dict(timestamp=ts + 1, memory_page=out_page,
                         index=out_off + word_i, rw_flag=True, is_ptr=False,
                         value=0)
                )
            continue
        sc["call_valid"].append(1)
        r_inv = pow(r, ec.N - 2, ec.N)
        u1 = (-h * r_inv) % ec.N
        u2 = (s * r_inv) % ec.N

        sc["u1"].append(_limbs16(u1))
        sc["u2"].append(_limbs16(u2))
        sc["r"].append(_limbs16(r))
        sc["s"].append(_limbs16(s))
        sc["h"].append(_limbs16(h))
        sc["r_inv"].append(_limbs16(r_inv))
        sc["q_rinv"].append(_q_limbs((r * r_inv - 1) // ec.N))
        sc["q_u1"].append(_q_limbs((h * r_inv + u1) // ec.N))
        sc["q_u2"].append(_q_limbs((s * r_inv - u2) // ec.N))

        pts["rx"].append(_limbs16(R[0]))
        pts["ry"].append(_limbs16(R[1]))
        w_int = R[0] * R[0] % ec.P
        pts["curve_w"].append(_limbs16(w_int))
        pts["q_curve_w"].append(_q_limbs((R[0] * R[0]) // ec.P))
        d = R[1] * R[1] - (R[0] * w_int + 7)
        qa, qb = (d // ec.P, 0) if d >= 0 else (0, -d // ec.P)
        # fold both quotients into one pair of columns
        pts["q_curve"].append(np.stack([_q_limbs(qa), _q_limbs(qb)]))

        # two ladders
        accs = []
        for scalar, base in ((u1, (ec.GX, ec.GY)), (u2, R)):
            acc = None
            cur = base
            for i in range(BITS):
                bit = (scalar >> i) & 1
                wb_row = step_builder
                # record state before
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
                step_call.append(ci)
                acc = new_acc
                cur = nxt_base
            accs.append(acc)

        Q = ec.add(accs[0], accs[1])
        assert Q is not None and accs[0][0] != accs[1][0]
        pts["acc1x"].append(_limbs16(accs[0][0]))
        pts["acc1y"].append(_limbs16(accs[0][1]))
        pts["acc2x"].append(_limbs16(accs[1][0]))
        pts["acc2y"].append(_limbs16(accs[1][1]))
        fw = _W()
        _add_witness(fw, accs[0], accs[1])
        for k, vs in fw.cols.items():
            pts["f_" + k[2:]].append(vs[0])
        pts["qx"].append(_limbs16(Q[0]))
        pts["qy"].append(_limbs16(Q[1]))

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

    total_steps = C * S
    steps = step_builder.stack(total_steps)
    step_exec += [False] * (total_steps - len(step_exec))
    step_call += [0] * (total_steps - len(step_call))

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

    scalars = {
        k: pad_stack(v, () if k == "call_valid" else ((17,) if k.startswith("q_") else (16,)))
        for k, v in sc.items()
    }
    points = {}
    for k, v in pts.items():
        tail = (2, 17) if k == "q_curve" else ((17,) if k in ("q_curve_w",) or k.startswith("f_q") else (16,))
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
    mem_chain = queues.simulate_chain(gf.zeros((12,)), mem_enc, jnp.asarray(mem_exec))

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
        step_call=jnp.asarray(np.asarray(step_call, np.int32)),
        reads=reads,
        writes=writes,
        mem_chain=mem_chain,
        mem_encodings=mem_enc,
        mem_execute=jnp.asarray(mem_exec),
        addresses=pad_stack(addresses, (8,)),
    )


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


def eval_constraints(w: EcrecoverWitness, config: EcrecoverConfig) -> dict:
    res = {}
    C = w.call_execute.shape[0]
    S = w.step_execute.shape[0]
    st = w.steps

    # call queue + precompile identity
    res["call_chain"] = queues.check_chain(
        w.call_chain, encode_log_queries(w.calls), w.call_execute
    )
    addr_ok = jnp.ones_like(w.call_execute)
    for i in range(5):
        l = (ECRECOVER_PRECOMPILE_FORMAL_ADDRESS >> (32 * i)) & 0xFFFFFFFF
        addr_ok = addr_ok & (w.calls.address[..., i] == jnp.uint32(l))
    res["call_is_ecrecover"] = jnp.where(
        w.call_execute,
        addr_ok & (w.calls.aux_byte == jnp.uint32(PRECOMPILE_AUX_BYTE)),
        True,
    )

    # scalars: r*r_inv == 1 (mod n); h*r_inv + u1 == 0; s*r_inv == u2
    sb = (C,)
    ncn = _nconst(sb)
    one = jnp.zeros((C, 16), jnp.uint32).at[:, 0].set(1)
    sc = w.scalars
    valid = (sc["call_valid"] == 1) & w.call_execute
    # claimed-valid calls must pass the recomputed r/s range checks
    # (new_optimized.rs exception flags; the no-valid-y lift failure remains
    # witness-claimed this round — ROADMAP)
    zero16 = jnp.zeros((C, 16), jnp.uint32)
    r_ok = nn.limbs_lt(sc["r"], _N) & (sc["r"] != zero16).any(-1)
    s_ok = nn.limbs_lt(sc["s"], _N) & (sc["s"] != zero16).any(-1)
    res["validity_range_flags"] = jnp.where(
        w.call_execute,
        jnp.where(valid, r_ok & s_ok, True) & jnp.where(~(r_ok & s_ok), ~valid, True),
        True,
    )
    ok = nn.sides_equal(
        [("prod", sc["r"], sc["r_inv"], 1)],
        [("prod", sc["q_rinv"], ncn, 1), ("lin", one, 1)], sb,
    )
    ok &= nn.sides_equal(
        [("prod", sc["h"], sc["r_inv"], 1), ("lin", sc["u1"], 1)],
        [("prod", sc["q_u1"], ncn, 1)], sb,
    )
    ok &= nn.sides_equal(
        [("prod", sc["s"], sc["r_inv"], 1)],
        [("prod", sc["q_u2"], ncn, 1), ("lin", sc["u2"], 1)], sb,
    )
    res["scalar_derivation"] = jnp.where(valid, ok, True)

    # R on curve: w == x^2 (mod p), then y^2 == x*w + 7 (mod p)
    pt = w.points
    pc = _pconst(sb)
    curve1 = nn.sides_equal(
        [("prod", pt["rx"], pt["rx"], 1)],
        [("prod", pt["q_curve_w"], pc, 1), ("lin", pt["curve_w"], 1)],
        sb,
    )
    curve2 = nn.sides_equal(
        [("prod", pt["ry"], pt["ry"], 1), ("prod", pt["q_curve"][:, 1], pc, 1)],
        [("prod", pt["rx"], pt["curve_w"], 1), ("const", 7),
         ("prod", pt["q_curve"][:, 0], pc, 1)],
        sb,
    )
    res["r_on_curve"] = jnp.where(valid, curve1 & curve2, True)
    res["r_point_range"] = jnp.where(
        valid, nn.limbs_lt(pt["rx"], _P) & nn.limbs_lt(pt["ry"], _P), True
    )

    # ladder steps
    sbatch = (S,)
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
    idx = jnp.arange(S)
    pos_in_ladder = idx % BITS
    not_first = (pos_in_ladder > 0) & w.step_execute
    prev = lambda a: jnp.concatenate([a[:1], a[:-1]])
    cont = (
        (st["base_x"] == prev(st["base_nx"])).all(-1)
        & (st["base_y"] == prev(st["base_ny"])).all(-1)
        & (st["acc_x"] == prev(st["acc_nx"])).all(-1)
        & (st["acc_y"] == prev(st["acc_ny"])).all(-1)
    )
    res["step_continuity"] = jnp.where(not_first, cont, True)
    # ladder starts: first step of ladder1 has base = G; ladder2 base = R
    is_l1_start = (idx % S == 0) if C == 1 else (idx % (2 * BITS) == 0)
    is_l2_start = pos_in_ladder == 0
    is_l2_start = is_l2_start & (idx % (2 * BITS) == BITS)
    gx = jnp.asarray(nn.from_int(ec.GX))
    gy = jnp.asarray(nn.from_int(ec.GY))
    res["ladder1_base"] = jnp.where(
        w.step_execute & (idx % (2 * BITS) == 0),
        (st["base_x"] == gx).all(-1) & (st["base_y"] == gy).all(-1)
        & (acc_inf),
        True,
    )
    rx_per_step = w.points["rx"][w.step_call]
    ry_per_step = w.points["ry"][w.step_call]
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
    u1_steps = w.scalars["u1"][w.step_call]
    u2_steps = w.scalars["u2"][w.step_call]
    limb = jnp.where(
        is_l2,
        jnp.take_along_axis(u2_steps, limb_idx[:, None], axis=1)[:, 0],
        jnp.take_along_axis(u1_steps, limb_idx[:, None], axis=1)[:, 0],
    )
    expected_bit = (limb >> bit_in_limb.astype(jnp.uint32)) & 1
    res["scalar_bits"] = jnp.where(w.step_execute, bit == expected_bit, True)

    # ladder results feed the final addition: Q = acc1 + acc2
    final_ok = _check_add(
        pt["acc1x"], pt["acc1y"], pt["acc2x"], pt["acc2y"],
        pt["qx"], pt["qy"], pt["f_lam"],
        pt["f_qa"], pt["f_qb"], pt["f_qc"], pt["f_qd"], pt["f_qe"], pt["f_qf"],
        sb,
    )
    res["final_add"] = jnp.where(valid, final_ok, True)
    # the last step of each ladder must carry acc == acc1/acc2
    last1 = (idx % (2 * BITS)) == BITS - 1
    last2 = (idx % (2 * BITS)) == 2 * BITS - 1
    a1x = pt["acc1x"][w.step_call]
    a1y = pt["acc1y"][w.step_call]
    a2x = pt["acc2x"][w.step_call]
    a2y = pt["acc2y"][w.step_call]
    res["ladder_results"] = jnp.where(
        w.step_execute & last1,
        (st["acc_nx"] == a1x).all(-1) & (st["acc_ny"] == a1y).all(-1),
        True,
    ) & jnp.where(
        w.step_execute & last2,
        (st["acc_nx"] == a2x).all(-1) & (st["acc_ny"] == a2y).all(-1),
        True,
    )

    # address: keccak256(Qx_be || Qy_be)[12:] — checked via the keccak kernel
    def be_bytes_words(limbs16):
        # 16 u16 LE limbs -> 32 BE bytes -> 8 u32 LE lanes words for keccak
        by = []
        for i in range(31, -1, -1):
            by.append((limbs16[..., i // 2] >> jnp.uint32(8 * (i % 2))) & 0xFF)
        by = jnp.stack(by, axis=-1)  # (C, 32) BE byte order
        return by

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

    # memory writes: success word (1/0 by validity) + address (0 when masked)
    exp_success = jnp.where(valid, 1, 0).astype(jnp.uint32)
    res["write_success"] = jnp.where(
        w.call_execute,
        (w.writes.value[0::2, 0] == exp_success)
        & (w.writes.value[0::2, 1:] == 0).all(-1)
        & w.writes.rw_flag[0::2],
        True,
    )
    exp_addr = jnp.where(valid[:, None], w.addresses, 0)
    res["write_address"] = jnp.where(
        w.call_execute, (w.writes.value[1::2] == exp_addr).all(-1), True
    )
    res["masked_address_zero"] = jnp.where(
        w.call_execute & ~valid, (w.addresses == 0).all(-1), True
    )
    res["mem_chain"] = queues.check_chain(w.mem_chain, w.mem_encodings, w.mem_execute)
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
    n_mem = w.mem_execute.sum().astype(jnp.uint32)
    mem_final = protocol.encode_queue_state_generic(
        gf.zeros((12,)), w.mem_chain[w.mem_chain.shape[0] - 1], n_mem
    )
    obs_in = calls_qs[None]
    obs_out = mem_final[None]
    return protocol.single_instance_compact_form(obs_in, obs_out)
