"""Block execution driver — the era-zkevm_test_harness role.

Runs a program on the VM, extracts every queue tape the run produced, drives
each consumer circuit on its tape, checks all constraints, and hands the
compact forms to the scheduler.  This is the top-level API a user of the
reference stack (simulator -> witness oracle -> per-circuit provers ->
scheduler) lands on here:

    result = execute_block(code, initial, BlockConfig(...), code_hashes=...)
    assert result.ok

The dataflow mirrors scheduler/mod.rs:239-452: VM memory queue ->
ram_permutation; VM log queue -> demux -> {events sorter, l1 sorter ->
linear hasher, storage sorter}; VM decommit queue ->
sort_decommittment_requests.  Sorted counterpart tapes are produced
host-side (the prover's sorting oracle role).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from ..base_structures.decommit_query import DecommitQueries
from ..base_structures.log_query import LogQueries
from ..base_structures.memory_query import MemoryQueries
from ..models import (
    demux_log_queue as dm,
    linear_hasher as lh,
    log_sorter as ls,
    main_vm as mvm,
    ram_permutation as ram,
    sort_decommittment_requests as sd,
    storage_validity as sv,
)


@dataclasses.dataclass(frozen=True)
class BlockConfig:
    vm_limit: int = 32
    sorter_limit: int = 32
    hasher_limit: int = 8


@dataclasses.dataclass
class BlockResult:
    residuals: Dict[str, dict]
    compact_forms: Dict[int, object]
    l1_messages_hash: Optional[bytes]

    @property
    def ok(self) -> bool:
        for res in self.residuals.values():
            for v in res.values():
                if not bool(np.asarray(v).all()):
                    return False
        return True

    def failing(self):
        out = []
        for circuit, res in self.residuals.items():
            for name, v in res.items():
                if not bool(np.asarray(v).all()):
                    out.append(f"{circuit}.{name}")
        return out


def _rows_from_soa(soa, mask, int_fields=(), limb_fields=(), bool_fields=()):
    rows = []
    for i in range(len(mask)):
        if not mask[i]:
            continue
        row = {}
        for f in int_fields:
            row[f] = int(np.asarray(getattr(soa, f))[i])
        for f in limb_fields:
            limbs = np.asarray(getattr(soa, f))[i]
            row[f] = sum(int(l) << (32 * k) for k, l in enumerate(limbs))
        for f in bool_fields:
            row[f] = bool(np.asarray(getattr(soa, f))[i])
        rows.append(row)
    return rows


def execute_block(
    code: list,
    initial: dict,
    config: BlockConfig,
    heap=None,
    storage=None,
    code_hashes=None,
) -> BlockResult:
    residuals: Dict[str, dict] = {}
    compact_forms: Dict[int, object] = {}

    # ---- circuit 1: the VM ----
    vm_cfg = mvm.MainVmConfig(limit=config.vm_limit)
    w = mvm.generate_witness(code, initial, vm_cfg, heap=heap, storage=storage,
                             code_hashes=code_hashes)
    residuals["main_vm"] = mvm.eval_constraints_jit(w, vm_cfg)

    # ---- circuit 8: memory consistency ----
    mem_rows = _rows_from_soa(
        mvm.memory_queries(w, vm_cfg), np.asarray(w["mem_push"]),
        int_fields=("timestamp", "memory_page", "index"),
        limb_fields=("value",), bool_fields=("rw_flag", "is_ptr"),
    )
    if mem_rows:
        sorted_mem = sorted(
            mem_rows, key=lambda r: (r["memory_page"], r["index"], r["timestamp"])
        )
        rcfg = ram.RamPermutationConfig(limit=config.sorter_limit)
        rw_ = ram.generate_witness(
            MemoryQueries.from_lists(mem_rows), MemoryQueries.from_lists(sorted_mem), rcfg
        )
        residuals["ram_permutation"] = ram.eval_constraints_jit(rw_, rcfg)
        compact_forms[8] = ram.instance_compact_forms(rw_, rcfg)

    # ---- circuit 4: demux ----
    log_rows = _rows_from_soa(
        mvm.log_queries(w, vm_cfg), np.asarray(w["log_push"]),
        int_fields=("aux_byte", "shard_id", "tx_number_in_block", "timestamp"),
        limb_fields=("address", "key", "read_value", "written_value"),
        bool_fields=("rw_flag", "rollback", "is_service"),
    )
    dcfg = dm.DemuxConfig(limit=config.sorter_limit)
    dw = dm.generate_witness_jit(LogQueries.from_lists(log_rows), dcfg)
    residuals["demux_log_queue"] = dm.eval_constraints_jit(dw, dcfg)
    compact_forms[4] = dm.instance_compact_form(dw, dcfg)

    from ..isa.system_params import (
        EVENT_AUX_BYTE,
        L1_MESSAGE_AUX_BYTE,
        STORAGE_AUX_BYTE,
    )

    events = [r for r in log_rows if r["aux_byte"] == EVENT_AUX_BYTE]
    l1s = [r for r in log_rows if r["aux_byte"] == L1_MESSAGE_AUX_BYTE]
    storages = [r for r in log_rows if r["aux_byte"] == STORAGE_AUX_BYTE]

    scfg = ls.LogSorterConfig(limit=config.sorter_limit)
    l1_hash = None
    # ---- circuits 11/12: events + l1 sorters ----
    for ctype, rows in ((11, events), (12, l1s)):
        if not rows:
            continue
        q = LogQueries.from_lists(rows)
        sw = ls.generate_witness_jit(q, q, scfg)  # already timestamp-ordered
        residuals[f"log_sorter_{ctype}"] = ls.eval_constraints_jit(sw, scfg)
        compact_forms[ctype] = ls.instance_compact_forms(sw, scfg)
        if ctype == 12:
            # ---- circuit 13: the l1 message hasher on the sorted output ----
            adds = np.asarray(sw.result_add)
            items = sw.result_items
            survivors = _rows_from_soa(
                items, adds,
                int_fields=("aux_byte", "shard_id", "tx_number_in_block", "timestamp"),
                limb_fields=("address", "key", "read_value", "written_value"),
                bool_fields=("rw_flag", "rollback", "is_service"),
            )
            hcfg = lh.LinearHasherConfig(limit=config.hasher_limit)
            hw = lh.generate_witness_jit(LogQueries.from_lists(survivors), hcfg)
            residuals["linear_hasher"] = lh.eval_constraints_jit(hw, hcfg)
            compact_forms[13] = lh.instance_compact_form(hw, hcfg)
            l1_hash = bytes(int(b) for b in np.asarray(hw.digest))

    # ---- circuit 9: storage dedup ----
    if storages:
        # sort by (address, key, i): the circuit's packed comparison key is
        # address-most-significant (ref concatenate_key, storage_validity
        # mod.rs:633-648)
        order = sorted(
            range(len(storages)),
            key=lambda i: (storages[i]["address"], storages[i]["key"], i),
        )
        sorted_st = [storages[i] for i in order]
        positions = list(order)  # cycle index within the storage sub-queue
        vcfg = sv.StorageValidityConfig(limit=config.sorter_limit)
        vw = sv.generate_witness_jit(
            LogQueries.from_lists(storages),
            LogQueries.from_lists(sorted_st),
            jnp.asarray(positions, jnp.uint32),
            vcfg,
        )
        residuals["storage_validity"] = sv.eval_constraints_jit(vw, vcfg)
        compact_forms[9] = sv.instance_compact_forms(vw, vcfg)

    # ---- circuit 2: decommit dedup ----
    dec_rows = _rows_from_soa(
        mvm.decommit_queries(w, vm_cfg), np.asarray(w["dec_push"]),
        int_fields=("page", "timestamp"), limb_fields=("code_hash",),
        bool_fields=("is_first",),
    )
    if dec_rows:
        sorted_dec = sorted(dec_rows, key=lambda r: (r["code_hash"], r["timestamp"]))
        ccfg = sd.DecommitSorterConfig(limit=config.sorter_limit)
        cw = sd.generate_witness_jit(
            DecommitQueries.from_lists(dec_rows),
            DecommitQueries.from_lists(sorted_dec),
            ccfg,
        )
        residuals["sort_decommittments"] = sd.eval_constraints_jit(cw, ccfg)
        compact_forms[2] = sd.instance_compact_forms(cw, ccfg)

    return BlockResult(
        residuals=residuals, compact_forms=compact_forms, l1_messages_hash=l1_hash
    )
