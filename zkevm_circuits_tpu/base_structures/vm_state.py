"""VmLocalState + register file, structure-of-arrays.

Reference parity: `src/base_structures/vm_state/mod.rs` — REGISTERS_COUNT=15
(:30), `VmLocalState` (:92-109) with flags, pc, timestamp, ergs, memory /
decommit queue states, callstack; `VMRegister` = {is_ptr, value: u256}
(`register/mod.rs:21-24`); `ArithmeticFlagsPort` = {overflow_or_less_than,
equal, greater_than}.

Round-1 scope: the register file, flags, pc/ergs/timestamp and the threaded
queue states are materialized; callstack sponge columns are carried as
opaque state (push/pop semantics land with the call_ret opcode family).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gf import GF

REGISTERS_COUNT = 15
FULL_SPONGE_QUEUE_STATE_WIDTH = 12
QUEUE_STATE_WIDTH = 4


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class VmStateColumns:
    """Per-cycle VM state columns (leading axis = cycle rows + 1)."""

    registers: jnp.ndarray  # (..., 15, 8) u32 values
    register_is_ptr: jnp.ndarray  # (..., 15) bool
    flag_of_lt: jnp.ndarray  # (...,) bool  (overflow_or_less_than)
    flag_eq: jnp.ndarray  # (...,) bool
    flag_gt: jnp.ndarray  # (...,) bool
    pc: jnp.ndarray  # (...,) u32
    ergs_remaining: jnp.ndarray  # (...,) u32
    timestamp: jnp.ndarray  # (...,) u32
    halted: jnp.ndarray  # (...,) bool (execution finished / pending exception)

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def initial(registers=None, ergs=10**6):
        regs = np.zeros((REGISTERS_COUNT, 8), np.uint32)
        if registers:
            for idx, val in registers.items():
                for k in range(8):
                    regs[idx, k] = (int(val) >> (32 * k)) & 0xFFFFFFFF
        return dict(
            registers=regs,
            register_is_ptr=np.zeros(REGISTERS_COUNT, bool),
            flag_of_lt=False,
            flag_eq=False,
            flag_gt=False,
            pc=0,
            ergs_remaining=ergs,
            timestamp=8,
            halted=False,
        )
