"""main_vm v2 — the full EraVM circuit, rebuilt on the real zkEVM ISA.

Replaces the round-1 mini-ISA VM (deleted in round 4; vm2/block2 is the
only VM stack).  Reference: `src/main_vm/` — entry point
`main_vm_entry_point` (`mod.rs:47-232`), per-cycle `vm_cycle`
(`cycle.rs:28-795`), prestate (`pre_state.rs:71-519`), decoder
(`decoded_opcode.rs:42-220`), and the 11 opcode appliers (`opcodes/*`).

Trace-first TPU design: `sim.py` is the witness oracle + tracer (host,
numpy/native), `circuit.py` re-derives every cycle transition row-parallel
on device (jax), `compact.py` slices a long run into `limit`-cycle
ClosedFormInput instances.
"""

from .state import (  # noqa: F401
    ExecutionContextRecord,
    encode_context_records_np,
    initial_bootloader_state,
)
from .sim import EraVM, VmConfig, assemble_code_words, simulate  # noqa: F401
from .native_sim import NativeEraVM  # noqa: F401
from .circuit import (  # noqa: F401
    all_ok,
    eval_constraints,
    eval_constraints_jit,
    prepare_device_witness,
)
from .compact import (  # noqa: F401
    boot_and_exit_residuals,
    encode_local_state,
    vm_instance_compact_forms,
    vm_instance_windows,
    vm_eval_instances_sharded,
)
