"""demux_log_queue routing AIR: STARK proof of the per-pop routing decision
(VERDICT r4 item 6; ref `src/demux_log_queue/mod.rs:279-310`).

The reference demultiplexes the VM's unified log queue into 6 output
queues inside the constraint system: per pop, boolean flags derived from
(aux_byte, shard_id, precompile address) route the element.  Here one row
per input element commits the query's FIELDS AS BYTES, re-derives the
20-lane standard encoding affinely (base_structures/log_query.py packing),
proves the 6 routing selectors with equality certificates, and accumulates
challenge-RLC streams:

  iacc  — RLC of every executed element's 20-lane encoding (input queue)
  oacc_k — RLC of the SELECTED elements' encodings per output queue k

Publics: [iacc final | 6 x oacc final].  The verifier recomputes all seven
from the PLAINTEXT queries and the routing rule — so a proof binds the
committed routing to the agreed input stream, and each output substream to
the plaintext the downstream circuits (and their chain proofs) consume.
Selector soundness: each flag carries an inverse certificate against a
challenge-compressed field difference (flag = 1 iff the compressed diff is
zero, whp over the FS challenge).

Routing rule (models/demux_log_queue.py route_flags; mod.rs:222-232):
  0 rollup_storage: aux == STORAGE && shard == 0
  1 events:         aux == EVENT
  2 l1_messages:    aux == L1_MESSAGE
  3 keccak:         aux == PRECOMPILE && address == KECCAK_FORMAL
  4 sha256:         aux == PRECOMPILE && address == SHA256_FORMAL
  5 ecrecover:      aux == PRECOMPILE && address == ECRECOVER_FORMAL
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..isa.system_params import (
    ECRECOVER_PRECOMPILE_FORMAL_ADDRESS,
    EVENT_AUX_BYTE,
    KECCAK256_PRECOMPILE_FORMAL_ADDRESS,
    L1_MESSAGE_AUX_BYTE,
    PRECOMPILE_AUX_BYTE,
    SHA256_PRECOMPILE_FORMAL_ADDRESS,
    STORAGE_AUX_BYTE,
)
from ..ops import gf
from ..ops.gf import GF, MODULUS
from .stark import AirSpec, StarkParams, StarkProof, prove, verify

QUEUE_RULES = (
    ("rollup_storage", STORAGE_AUX_BYTE, None),
    ("events", EVENT_AUX_BYTE, None),
    ("l1_messages", L1_MESSAGE_AUX_BYTE, None),
    ("keccak", PRECOMPILE_AUX_BYTE, KECCAK256_PRECOMPILE_FORMAL_ADDRESS),
    ("sha256", PRECOMPILE_AUX_BYTE, SHA256_PRECOMPILE_FORMAL_ADDRESS),
    ("ecrecover", PRECOMPILE_AUX_BYTE, ECRECOVER_PRECOMPILE_FORMAL_ADDRESS),
)
NQ = len(QUEUE_RULES)
ENC_W = 20


class _Reg:
    def __init__(self):
        self.index = {}
        self.n = 0

    def add(self, name, k=1):
        self.index[name] = (self.n, k)
        self.n += k

    def at(self, name, j=0):
        return self.index[name][0] + j


@functools.lru_cache(maxsize=1)
def layout() -> Tuple[_Reg, _Reg, _Reg]:
    fx = _Reg()
    fx.add("t_byte")
    p1 = _Reg()
    # field bytes (LE): key 32, addr 20, read_value 32, written_value 32,
    # ts 4, tx 4
    p1.add("key_b", 32)
    p1.add("addr_b", 20)
    p1.add("rv_b", 32)
    p1.add("wv_b", 32)
    p1.add("ts_b", 4)
    p1.add("tx_b", 4)
    p1.add("aux")            # byte-valued (range-checked)
    p1.add("shard")          # byte-valued
    p1.add("rw"); p1.add("rollback"); p1.add("svc"); p1.add("exec")  # bools
    # routing flags (finv certificates are challenge-derived -> phase 2)
    p1.add("flag", NQ)
    p1.add("m_byte")
    p2 = _Reg()
    p2.add("finv", NQ)
    p2.add("inv_qb", p1.index["rw"][0])  # byte-checked columns: key..shard
    p2.add("inv_tb")
    p2.add("lacc")
    p2.add("iacc")
    p2.add("oacc", NQ)
    return fx, p1, p2


# byte columns range-checked: key_b..tx_b + aux + shard (bools and flags
# are bound by booleanity; finv is a free field certificate)
_N_BYTE_Q = layout()[1].index["rw"][0]


def _enc_lanes(row, at):
    """The 20-lane standard encoding, affine in the committed bytes
    (base_structures/log_query.py encode_log_query_ref)."""
    def b(nm, j):
        return row[..., at(nm, j)]

    def u32(nm, j0):
        v = b(nm, j0)
        for i in range(1, 4):
            v = gf.add(v, gf.mul_const(b(nm, j0 + i), 1 << (8 * i)))
        return v

    def pack(base, b0, b1, b2):
        return gf.add(base, gf.add(gf.mul_const(b0, 1 << 32),
                                   gf.add(gf.mul_const(b1, 1 << 40),
                                          gf.mul_const(b2, 1 << 48))))

    lanes = []
    for k in range(8):
        lanes.append(pack(u32("rv_b", 4 * k), b("key_b", 3 * k),
                          b("key_b", 3 * k + 1), b("key_b", 3 * k + 2)))
    stream = [("key_b", 24 + i) for i in range(8)] + [
        ("addr_b", i) for i in range(16)]
    for k in range(8):
        s0, s1, s2 = stream[3 * k], stream[3 * k + 1], stream[3 * k + 2]
        lanes.append(pack(u32("wv_b", 4 * k), b(*s0), b(*s1), b(*s2)))
    lanes.append(pack(u32("ts_b", 0), b("addr_b", 16), b("addr_b", 17),
                      b("addr_b", 18)))
    lanes.append(pack(u32("tx_b", 0), b("addr_b", 19), row[..., at("aux")],
                      row[..., at("shard")]))
    lanes.append(gf.add(row[..., at("rw")],
                        gf.mul_const(row[..., at("svc")], 2)))
    lanes.append(row[..., at("rollback")])
    return lanes


def _rule_diff(row, at, qi: int, ch):
    """Challenge-compressed difference that is ZERO iff queue qi's rule
    matches: (aux - aux_const) + mu * shard-or-address terms."""
    mu = ch[2]
    _name, aux_c, addr_c = QUEUE_RULES[qi]
    d = gf.sub(row[..., at("aux")], gf.constant(aux_c))
    if addr_c is None and qi == 0:
        # rollup storage additionally requires shard == 0
        d = gf.add(gf.mul(mu, d), row[..., at("shard")])
    elif addr_c is not None:
        for i in range(20):
            byte_c = (addr_c >> (8 * i)) & 0xFF
            d = gf.add(gf.mul(mu, d),
                       gf.sub(row[..., at("addr_b", i)],
                              gf.constant(byte_c)))
    return d


@functools.lru_cache(maxsize=1)
def demux_air() -> AirSpec:
    fx, p1, p2 = layout()
    F, P1, P2 = fx.n, p1.n, p2.n
    NB = p2.index["inv_qb"][1]

    def fat(nm, j=0):
        return fx.at(nm, j)

    def at(nm, j=0):
        return F + p1.at(nm, j)

    def at2(nm, j=0):
        return F + P1 + p2.at(nm, j)

    def compose_row_pub(cur, public, ch, alpha, a_pow):
        from .stark import _alpha_sum

        out = []
        one = gf.ones(cur[..., 0].shape)
        ex = cur[..., at("exec")]
        # booleanity
        for nm in ("rw", "rollback", "svc", "exec"):
            v = cur[..., at(nm)]
            out.append(gf.mul(v, gf.sub(v, one)))
        for qi in range(NQ):
            f = cur[..., at("flag", qi)]
            out.append(gf.mul(f, gf.sub(f, one)))
            d = _rule_diff(cur, at, qi, ch)
            # flag == 1 => rule matches (f * d == 0);
            # executed && flag == 0 => certificate d * finv == 1 (rule
            # violated); padding rows route nowhere ((1-exec) * f == 0)
            out.append(gf.mul(f, d))
            out.append(gf.mul(gf.sub(ex, f),
                              gf.sub(gf.mul(d, cur[..., at2("finv", qi)]),
                                     one)))
            out.append(gf.mul(gf.sub(one, ex), f))
        # logUp byte ranges
        X = ch[0]
        qb = cur[..., F : F + NB]
        invb = cur[..., at2("inv_qb") : at2("inv_qb") + NB]
        d = gf.sub(gf.mul(invb, gf.sub(gf.expand_dims(X, -1), qb)),
                   gf.ones(qb.shape))
        out.append(GF(jnp.moveaxis(d.lo, -1, 0), jnp.moveaxis(d.hi, -1, 0)))
        out.append(gf.sub(
            gf.mul(cur[..., at2("inv_tb")],
                   gf.sub(X, cur[..., fat("t_byte")])),
            cur[..., at("m_byte")]))
        return _alpha_sum(out, alpha, a_pow)

    def _lookup_diff(row):
        NBl = NB
        v = gf.sum_mod(row[..., at2("inv_qb") : at2("inv_qb") + NBl])
        return gf.sub(v, row[..., at2("inv_tb")])

    def _row_rlc(row, ch):
        delta = ch[1]
        lanes = _enc_lanes(row, at)
        acc = lanes[-1]
        for j in range(ENC_W - 2, -1, -1):
            acc = gf.add(gf.mul(acc, delta), lanes[j])
        return acc

    def constraints_pub(cur, nxt, public, ch):
        out = []
        one = gf.ones(cur[..., 0].shape)
        delta = ch[1]
        d4 = gf.mul(gf.mul(delta, delta), gf.mul(delta, delta))
        d16 = gf.mul(gf.mul(d4, d4), gf.mul(d4, d4))
        d20 = gf.mul(d16, d4)
        ex = cur[..., at("exec")]
        r = _row_rlc(cur, ch)
        # input RLC
        iacc_c = cur[..., at2("iacc")]
        iacc_n = nxt[..., at2("iacc")]
        pushed = gf.add(gf.mul(iacc_c, d20), r)
        out.append(gf.sub(
            iacc_n, gf.add(gf.mul(ex, pushed),
                           gf.mul(gf.sub(one, ex), iacc_c))))
        # output RLCs, selected rows only (flag implies exec by the pad rule)
        for qi in range(NQ):
            f = cur[..., at("flag", qi)]
            oc = cur[..., at2("oacc", qi)]
            on = nxt[..., at2("oacc", qi)]
            opush = gf.add(gf.mul(oc, d20), r)
            out.append(gf.sub(
                on, gf.add(gf.mul(f, opush), gf.mul(gf.sub(one, f), oc))))
        # logUp accumulator
        out.append(gf.sub(gf.sub(nxt[..., at2("lacc")], cur[..., at2("lacc")]),
                          _lookup_diff(nxt)))
        return out

    def first_row(row, public, ch):
        return [row[..., at2("iacc")]] + [
            row[..., at2("oacc", qi)] for qi in range(NQ)
        ] + [gf.sub(row[..., at2("lacc")], _lookup_diff(row))]

    def last_row(row, public, ch):
        # final accumulators: the last row must be padding (exec=0) so the
        # BEFORE-row accumulators are the totals
        out = [row[..., at("exec")],
               gf.sub(row[..., at2("iacc")], public[0])]
        for qi in range(NQ):
            out.append(gf.sub(row[..., at2("oacc", qi)], public[1 + qi]))
        out.append(row[..., at2("lacc")])
        return out

    return AirSpec(
        num_cols=P1,
        max_degree=3,
        constraints=None,
        constraints_pub=constraints_pub,
        compose_row_pub=compose_row_pub,
        first_row=first_row,
        last_row=last_row,
        num_public=1 + NQ,
        num_fixed_cols=F,
        num_phase2_cols=P2,
        num_challenges=3,
    )


# ---------------------------------------------------------------------------
# trace builder + prove/verify
# ---------------------------------------------------------------------------


def _field_rows(queries, execute) -> dict:
    """Plaintext query fields -> byte rows (host numpy)."""
    import numpy as np

    n = len(queries)
    f = dict(
        key_b=np.zeros((32, n), np.uint64), addr_b=np.zeros((20, n), np.uint64),
        rv_b=np.zeros((32, n), np.uint64), wv_b=np.zeros((32, n), np.uint64),
        ts_b=np.zeros((4, n), np.uint64), tx_b=np.zeros((4, n), np.uint64),
        aux=np.zeros(n, np.uint64), shard=np.zeros(n, np.uint64),
        rw=np.zeros(n, np.uint64), rollback=np.zeros(n, np.uint64),
        svc=np.zeros(n, np.uint64), exec=np.asarray(execute, np.uint64),
    )
    for i, q in enumerate(queries):
        for j in range(32):
            f["key_b"][j, i] = (int(q.get("key", 0)) >> (8 * j)) & 0xFF
            f["rv_b"][j, i] = (int(q.get("read_value", 0)) >> (8 * j)) & 0xFF
            f["wv_b"][j, i] = (int(q.get("written_value", 0)) >> (8 * j)) & 0xFF
        for j in range(20):
            f["addr_b"][j, i] = (int(q.get("address", 0)) >> (8 * j)) & 0xFF
        for j in range(4):
            f["ts_b"][j, i] = (int(q.get("timestamp", 0)) >> (8 * j)) & 0xFF
            f["tx_b"][j, i] = (int(q.get("tx_number_in_block", 0)) >> (8 * j)) & 0xFF
        f["aux"][i] = int(q.get("aux_byte", 0))
        f["shard"][i] = int(q.get("shard_id", 0))
        f["rw"][i] = int(bool(q.get("rw_flag", False)))
        f["rollback"][i] = int(bool(q.get("rollback", False)))
        f["svc"][i] = int(bool(q.get("is_service", False)))
    return f


def _route_host(f: dict, i: int) -> list:
    aux = int(f["aux"][i]); shard = int(f["shard"][i])
    addr = sum(int(f["addr_b"][j, i]) << (8 * j) for j in range(20))
    flags = []
    for _nm, aux_c, addr_c in QUEUE_RULES:
        if addr_c is None and _nm == "rollup_storage":
            flags.append(int(aux == aux_c and shard == 0))
        elif addr_c is None:
            flags.append(int(aux == aux_c))
        else:
            flags.append(int(aux == aux_c and addr == addr_c))
    return flags


def demux_trace(queries, n: Optional[int] = None, ch_mu: int = 0):
    """(fixed GF, phase1 GF, log_n).  queries: list of plaintext LogQuery
    dicts (the executed input stream, in order)."""
    Q = len(queries)
    n = n or (1 << max(8, (Q + 1 - 1).bit_length()))
    execute = np.zeros(n, np.uint64)
    execute[:Q] = 1
    f = _field_rows(queries, execute[:Q])

    fx, p1, p2 = layout()
    cols = np.zeros((p1.n, n), np.uint64)

    def put(name, rows):
        s, k = p1.index[name]
        if rows.ndim == 1:
            cols[s, : rows.shape[0]] = rows
        else:
            cols[s : s + k, : rows.shape[1]] = rows

    for nm in ("key_b", "addr_b", "rv_b", "wv_b", "ts_b", "tx_b"):
        put(nm, f[nm])
    for nm in ("aux", "shard", "rw", "rollback", "svc"):
        put(nm, f[nm])
    cols[p1.index["exec"][0]] = execute
    for i in range(Q):
        for qi, fl in enumerate(_route_host(f, i)):
            cols[p1.at("flag", qi), i] = fl
    fixed = gf.from_u64(np.stack([np.arange(n, dtype=np.uint64) % 256]))
    # byte multiplicities
    NB = p2.index["inv_qb"][1]
    counts = np.bincount(cols[:NB].reshape(-1).astype(np.int64), minlength=256)
    m = np.zeros(n, np.uint64)
    m[:256] = counts
    cols[p1.index["m_byte"][0]] = m
    return fixed, gf.from_u64(cols), int(np.log2(n))


def _build_phase2(trace: GF, ch_ints) -> GF:
    import jax

    fx, p1, p2 = layout()
    F = fx.n
    NB = p2.index["inv_qb"][1]
    X = gf.from_u64(np.uint64(ch_ints[0]))
    delta = gf.from_u64(np.uint64(ch_ints[1]))
    mu = gf.from_u64(np.uint64(ch_ints[2]))
    n = int(trace.shape[1])

    rows = GF(trace.lo.T, trace.hi.T)  # (n, m) row view

    def at(nm, j=0):
        return F + p1.at(nm, j)

    ch3 = [X, delta, mu]
    finvs = []
    for qi in range(NQ):
        d = _rule_diff(rows, at, qi, ch3)
        inv = gf.inv(d)  # gf.inv(0) yields 0 under Fermat (0^(p-2) = 0)
        finvs.append(inv)

    qb = rows[..., F : F + NB]
    inv_qb = gf.inv(gf.sub(gf.expand_dims(X, -1), qb))
    t_byte = trace[fx.at("t_byte")]
    m_byte = trace[F + p1.at("m_byte")]
    inv_tb = gf.mul(m_byte, gf.inv(gf.sub(X, t_byte)))
    diff = gf.sub(gf.sum_mod(inv_qb, axis=-1), inv_tb)

    def body(a, dd):
        a = gf.add(a, dd)
        return a, a

    _, lacc = jax.lax.scan(body, gf.zeros(()), diff)

    d4 = gf.mul(gf.mul(delta, delta), gf.mul(delta, delta))
    d16 = gf.mul(gf.mul(d4, d4), gf.mul(d4, d4))
    d20 = gf.mul(d16, d4)
    lanes = _enc_lanes(rows, at)
    r = lanes[-1]
    for j in range(ENC_W - 2, -1, -1):
        r = gf.add(gf.mul(r, delta), lanes[j])
    r = gf.canonicalize(r)

    def acc_scan(sel):
        def b2(a, xs):
            s, rr = xs
            nxt = gf.add(gf.mul(a, d20), rr)
            import jax.numpy as jnp2

            a2 = GF(jnp.where(s.lo != 0, nxt.lo, a.lo),
                    jnp.where(s.lo != 0, nxt.hi, a.hi))
            return gf.canonicalize(a2), a

        _, acc = jax.lax.scan(b2, gf.zeros(()), (sel, r))
        return acc

    iacc = acc_scan(trace[at("exec") - 0])
    oaccs = [acc_scan(trace[at("flag", qi)]) for qi in range(NQ)]
    return gf.concat(
        [gf.stack(finvs, axis=0),
         GF(inv_qb.lo.T, inv_qb.hi.T),
         gf.stack([inv_tb, lacc, iacc] + oaccs, axis=0)],
        axis=0,
    )


def host_publics(queries, delta: int) -> np.ndarray:
    """Verifier-side recomputation of [iacc | oacc_0..5] from the PLAINTEXT
    input stream and the routing rule."""
    from ..base_structures.log_query import encode_log_query_ref

    f = _field_rows(queries, np.ones(len(queries), np.uint64))
    d20 = pow(delta, 20, MODULUS)
    iacc = 0
    oacc = [0] * NQ
    for i, q in enumerate(queries):
        lanes = encode_log_query_ref(q)
        r = 0
        for v in reversed(lanes):
            r = (r * delta + int(v)) % MODULUS
        iacc = (iacc * d20 + r) % MODULUS
        for qi, fl in enumerate(_route_host(f, i)):
            if fl:
                oacc[qi] = (oacc[qi] * d20 + r) % MODULUS
    return np.array([iacc] + oacc, np.uint64)


def prove_demux(queries, params: Optional[StarkParams] = None):
    """Prove the routing of the executed input log stream.  Returns
    (proof, publics, params)."""
    from .stark import challenges_from_cap, _commit_columns

    fixed, phase1, log_n = demux_trace(queries)
    if params is None:
        params = StarkParams(log_n=log_n)
    air = demux_air()
    ftree = _commit_columns(fixed, params)
    ptree = _commit_columns(phase1, params)
    ch, _ = challenges_from_cap(ptree["cap"], air, ftree["cap"])
    publics = host_publics(queries, ch[1])
    proof = prove(phase1, air, params, gf.from_u64(publics),
                  build_phase2=_build_phase2, fixed_cols=fixed)
    return proof, publics, params


def verify_demux(proof: StarkProof, queries, params: StarkParams) -> bool:
    """queries: the PLAINTEXT executed input stream (public data — the
    scheduler derives it; downstream circuits consume the routed
    substreams)."""
    from .stark import challenges_from_cap, _commit_columns

    n = 1 << params.log_n
    if len(queries) > n:
        return False
    air = demux_air()
    fixed = gf.from_u64(np.stack([np.arange(n, dtype=np.uint64) % 256]))
    fcap = _commit_columns(fixed, params)["cap"]
    ch, _ = challenges_from_cap(proof.caps[1], air, fcap)
    publics = host_publics(queries, ch[1])
    return verify(proof, air, params, gf.from_u64(publics), fixed_cols=fixed)
