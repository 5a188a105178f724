"""Generic row-sharded constraint evaluation on the 8-device virtual mesh."""

import numpy as np
import jax

from zkevm_circuits_tpu.base_structures.log_query import LogQueries
from zkevm_circuits_tpu.base_structures.memory_query import MemoryQueries
from zkevm_circuits_tpu.models import log_sorter as ls
from zkevm_circuits_tpu.models import ram_permutation as ram
from zkevm_circuits_tpu.parallel import auto, mesh as meshlib


def test_log_sorter_auto_sharded():
    rows = [
        dict(address=1, key=i, read_value=0, written_value=i * 3, aux_byte=1,
             rw_flag=True, rollback=False, is_service=False, shard_id=0,
             tx_number_in_block=0, timestamp=10 * (i + 1))
        for i in range(16)
    ]
    cfg = ls.LogSorterConfig(limit=16)
    q = LogQueries.from_lists(rows)
    w = ls.generate_witness_jit(q, q, cfg)
    mesh = meshlib.make_mesh(n_rows=8, n_inst=1)
    res = auto.eval_sharded(ls.eval_constraints, w, cfg, mesh, 16)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name


def test_ram_auto_sharded_matches_manual():
    rows = [
        dict(timestamp=100 + i, memory_page=7, index=i, rw_flag=True,
             is_ptr=False, value=1000 + i)
        for i in range(16)
    ]
    cfg = ram.RamPermutationConfig(limit=16)
    q = MemoryQueries.from_lists(rows)
    w = ram.generate_witness(q, q, cfg)
    mesh = meshlib.make_mesh(n_rows=8, n_inst=1)
    res = auto.eval_sharded(ram.eval_constraints, w, cfg, mesh, 16)
    for name, ok in res.items():
        assert bool(np.asarray(ok).all()), name
