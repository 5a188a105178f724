"""Property-based randomized cross-checks of the sorter circuits against
independent python reference models (ROADMAP testing item; reference analog:
the randomized `test_inner` drivers, e.g.
src/storage_validity_by_grand_product/test_input.rs).

All seeds share one (limit, shape) so each family compiles once.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zkevm_circuits_tpu.base_structures.decommit_query import DecommitQueries
from zkevm_circuits_tpu.base_structures.log_query import LogQueries
from zkevm_circuits_tpu.models import log_sorter as ls
from zkevm_circuits_tpu.models import sort_decommittment_requests as sd
from zkevm_circuits_tpu.models import storage_validity as sv

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-suite tier (see pyproject markers)

SEEDS = [11, 23, 57]
LIMIT = 64


def _ok(res):
    bad = [k for k, v in res.items() if not bool(np.asarray(v).all())]
    assert not bad, bad


# --------------------------------------------------------------- log_sorter


def _ev(ts, key, val, rollback=False):
    return dict(
        address=0xABCD, key=key, read_value=0, written_value=val, aux_byte=1,
        rw_flag=True, rollback=rollback, is_service=False, shard_id=0,
        tx_number_in_block=1, timestamp=ts,
    )


def _gen_events(rng, n):
    """forwards at ts 10,20,...; each rolled back with prob .3.  Unsorted =
    forwards in emission order then rollbacks LIFO (the VM's two-sided queue
    resolution order); sorted = by (ts, rollback)."""
    fwd, rb = [], []
    for i in range(n):
        e = _ev(10 * (i + 1), int(rng.integers(1, 1 << 30)),
                int(rng.integers(1, 1 << 31)))
        fwd.append(e)
        if rng.random() < 0.3:
            rb.append(dict(e, rollback=True))
    unsorted = fwd + rb[::-1]
    sorted_q = []
    rb_ts = {e["timestamp"] for e in rb}
    for e in fwd:
        sorted_q.append(e)
        if e["timestamp"] in rb_ts:
            sorted_q.append(dict(e, rollback=True))
    surviving = [e for e in fwd if e["timestamp"] not in rb_ts]
    return unsorted, sorted_q, surviving


@pytest.mark.parametrize("seed", SEEDS)
def test_log_sorter_random_vs_model(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(8, 24))
    unsorted, sorted_q, surviving = _gen_events(rng, n)
    cfg = ls.LogSorterConfig(limit=LIMIT)
    w = ls.generate_witness_jit(
        LogQueries.from_lists(unsorted), LogQueries.from_lists(sorted_q), cfg
    )
    _ok(ls.eval_constraints_jit(w, cfg))
    assert int(np.asarray(w.result_count)[-1]) == len(surviving)
    adds = np.asarray(w.result_add)
    got_keys = [int(k) for k in np.asarray(w.result_items.key)[adds][:, 0]]
    assert got_keys == [e["key"] for e in surviving]


def test_log_sorter_uncancelled_rollback_rejected():
    """a rollback whose forward twin is absent must fail the sorter."""
    rng = np.random.default_rng(99)
    unsorted, sorted_q, _ = _gen_events(rng, 8)
    orphan = dict(_ev(990, 777, 888), rollback=True)
    fwd_orphan = dict(orphan, rollback=False)
    cfg = ls.LogSorterConfig(limit=LIMIT)
    w = ls.generate_witness_jit(
        LogQueries.from_lists(unsorted + [orphan]),
        LogQueries.from_lists(sorted_q + [orphan]),
        cfg,
    )
    res = ls.eval_constraints_jit(w, cfg)
    assert not all(bool(np.asarray(v).all()) for v in res.values())


# --------------------------------------------- sort_decommittment_requests


def _gen_decommits(rng, n_hashes):
    rows, pages = [], {}
    ts = 4
    for h in range(n_hashes):
        code_hash = (0x0101 << 224) + int(rng.integers(1, 1 << 60))
        page = int(rng.integers(8, 1 << 20))
        pages[code_hash] = page
        for rep in range(int(rng.integers(1, 4))):
            rows.append(dict(code_hash=code_hash, page=page, timestamp=ts,
                             is_first=False))
            ts += int(rng.integers(1, 9))
    rng.shuffle(rows)
    # the VM-side oracle marks first encounters (in emission order)
    seen = set()
    for r in rows:
        if r["code_hash"] not in seen:
            r["is_first"] = True
            seen.add(r["code_hash"])
    sorted_rows = sorted(rows, key=lambda r: (r["code_hash"], r["timestamp"]))
    # circuit-side is_first sits on the sorted first occurrence
    sorted_rows = [dict(r) for r in sorted_rows]
    seen = set()
    for r in sorted_rows:
        r["is_first"] = r["code_hash"] not in seen
        seen.add(r["code_hash"])
    # but the multiset must match: put unsorted is_first where sorted has it
    first_ts = {}
    for r in sorted_rows:
        if r["is_first"]:
            first_ts[r["code_hash"]] = r["timestamp"]
    for r in rows:
        r["is_first"] = first_ts[r["code_hash"]] == r["timestamp"]
    expected = [
        dict(code_hash=h, page=pages[h], timestamp=t, is_first=True)
        for h, t in sorted(first_ts.items())
    ]
    return rows, sorted_rows, expected


@pytest.mark.parametrize("seed", SEEDS)
def test_decommit_sorter_random_vs_model(seed):
    rng = np.random.default_rng(seed)
    unsorted, sorted_rows, expected = _gen_decommits(rng, int(rng.integers(4, 10)))
    cfg = sd.DecommitSorterConfig(limit=LIMIT)
    w = sd.generate_witness_jit(
        DecommitQueries.from_lists(unsorted),
        DecommitQueries.from_lists(sorted_rows), cfg,
    )
    _ok(sd.eval_constraints_jit(w, cfg))
    adds = np.asarray(w.result_add)
    assert int(adds.sum()) == len(expected)
    got_hash = np.asarray(w.result_items.code_hash)[adds]
    got_ts = np.asarray(w.result_items.timestamp)[adds]
    for row, exp in zip(range(len(expected)), expected):
        got = sum(int(x) << (32 * i) for i, x in enumerate(got_hash[row]))
        assert got == exp["code_hash"]
        assert int(got_ts[row]) == exp["timestamp"]


def test_decommit_sorter_page_mismatch_rejected():
    rng = np.random.default_rng(3)
    unsorted, sorted_rows, _ = _gen_decommits(rng, 6)
    # find a repeated hash in sorted order and fork its page
    for i in range(1, len(sorted_rows)):
        if sorted_rows[i]["code_hash"] == sorted_rows[i - 1]["code_hash"]:
            bad = [dict(r) for r in sorted_rows]
            bad_u = [dict(r) for r in unsorted]
            victim = bad[i]
            for r in bad_u:
                if (r["code_hash"], r["timestamp"]) == (
                    victim["code_hash"], victim["timestamp"]
                ):
                    r["page"] += 1
            victim["page"] += 1
            cfg = sd.DecommitSorterConfig(limit=LIMIT)
            w = sd.generate_witness_jit(
                DecommitQueries.from_lists(bad_u),
                DecommitQueries.from_lists(bad), cfg,
            )
            res = sd.eval_constraints_jit(w, cfg)
            assert not all(bool(np.asarray(v).all()) for v in res.values())
            return
    pytest.skip("no repeated hash in this draw")


# ------------------------------------------------------- storage_validity


def _sq(addr, key, rv, wv, rw, ts):
    return dict(
        address=addr, key=key, read_value=rv, written_value=wv, aux_byte=0,
        rw_flag=rw, rollback=False, is_service=False, shard_id=0,
        tx_number_in_block=0, timestamp=ts,
    )


def _gen_storage(rng, n_cells):
    """per cell: optional read of the initial value then 0-2 writes with a
    final value != initial (avoiding the no-op-write edge).  Expected pushes:
    write record (base -> final) for written cells, protective read for
    read-only cells, in packed-key order (address, key)."""
    cells = []
    for _ in range(n_cells):
        addr = int(rng.integers(1, 1 << 40))
        key = int(rng.integers(1, 1 << 40))
        base = int(rng.integers(0, 1 << 32))
        n_writes = int(rng.integers(0, 3))
        reads_first = n_writes == 0 or rng.random() < 0.5
        cells.append((addr, key, base, n_writes, reads_first))
    ops = []
    for ci, (addr, key, base, n_writes, reads_first) in enumerate(cells):
        cur = base
        cell_ops = []
        if reads_first:
            cell_ops.append(_sq(addr, key, cur, cur, False, 77))
        for wi in range(n_writes):
            nxt = int(rng.integers(0, 1 << 32))
            if wi == n_writes - 1 and nxt == base:
                nxt = (nxt + 1) % (1 << 32)
            cell_ops.append(_sq(addr, key, cur, nxt, True, 77))
            cur = nxt
        ops.append((ci, cell_ops, base, cur))
    # interleave cells round-robin to scramble VM order; cycle index = order
    unsorted, tagged = [], []
    pending = [(ci, list(co)) for ci, co, *_ in ops]
    while pending:
        i = int(rng.integers(0, len(pending)))
        ci, co = pending[i]
        unsorted.append((ci, co.pop(0)))
        if not co:
            pending.pop(i)
    for cyc, (ci, op) in enumerate(unsorted):
        tagged.append((ci, cyc, op))
    # sorted by packed key (address most significant), then cycle
    order = sorted(tagged, key=lambda t: (t[2]["address"], t[2]["key"], t[1]))
    sorted_rows = [t[2] for t in order]
    sorted_ts = [t[1] for t in order]
    expected = []
    for addr, key, base, n_writes, reads_first in sorted(
        cells, key=lambda c: (c[0], c[1])
    ):
        final = next(c[3] for c in ops if cells[c[0]][:2] == (addr, key))
        if n_writes > 0:
            expected.append(("w", addr, key, base, final))
        else:
            expected.append(("r", addr, key, base, base))
    return [t[2] for t in tagged], sorted_rows, sorted_ts, expected


@pytest.mark.parametrize("seed", SEEDS)
def test_storage_validity_random_vs_model(seed):
    rng = np.random.default_rng(seed)
    unsorted, sorted_rows, sorted_ts, expected = _gen_storage(
        rng, int(rng.integers(4, 12))
    )
    cfg = sv.StorageValidityConfig(limit=LIMIT)
    w = sv.generate_witness_jit(
        LogQueries.from_lists(unsorted),
        LogQueries.from_lists(sorted_rows),
        jnp.asarray(sorted_ts, jnp.uint32),
        cfg,
    )
    _ok(sv.eval_constraints_jit(w, cfg))
    flags = np.asarray(w.push_flags)
    assert int(flags.sum()) == len(expected)
    addr = np.asarray(w.push_items.address)[flags][:, 0]
    rw = np.asarray(w.push_items.rw_flag)[flags]
    wv = np.asarray(w.push_items.written_value)[flags][:, 0]
    for i, (kind, a, k, base, final) in enumerate(expected):
        assert int(addr[i]) == a & 0xFFFFFFFF, (i, kind)
        assert bool(rw[i]) == (kind == "w"), (i, kind)
        if kind == "w":
            assert int(wv[i]) == final & 0xFFFFFFFF, i


def test_storage_validity_read_forgery_rejected():
    """a read claiming a value != the cell's base must fail."""
    rng = np.random.default_rng(5)
    unsorted, sorted_rows, sorted_ts, _ = _gen_storage(rng, 6)
    ridx = next(
        (i for i, r in enumerate(sorted_rows) if not r["rw_flag"]), None
    )
    if ridx is None:
        pytest.skip("no read in this draw")
    bad_sorted = [dict(r) for r in sorted_rows]
    bad_sorted[ridx]["read_value"] += 1
    bad_sorted[ridx]["written_value"] += 1
    # mirror in unsorted (multiset must match or it fails trivially)
    bad_unsorted = [
        dict(bad_sorted[ridx]) if r == sorted_rows[ridx] else r
        for r in unsorted
    ]
    cfg = sv.StorageValidityConfig(limit=LIMIT)
    w = sv.generate_witness_jit(
        LogQueries.from_lists(bad_unsorted),
        LogQueries.from_lists(bad_sorted),
        jnp.asarray(sorted_ts, jnp.uint32),
        cfg,
    )
    res = sv.eval_constraints_jit(w, cfg)
    assert not all(bool(np.asarray(v).all()) for v in res.values())
