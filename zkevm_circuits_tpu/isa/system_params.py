"""System parameters of the zkEVM ISA (port of the zkevm_opcode_defs surface).

The reference consumes these from the external `zkevm_opcode_defs` crate
(SURVEY.md §2.3, layer 1) — e.g. `BOOTLOADER_HEAP_PAGE` in
`src/ram_permutation/mod.rs:26,243`, `BOOTLOADER_CODE_PAGE` /
`BOOTLOADER_CALLDATA_PAGE` / `STARTING_TIMESTAMP` in
`src/main_vm/loading.rs:32,192,201`.

That crate is not vendored in this environment (zero egress), so values below
are pinned from the public Era protocol definitions; anything not
independently verifiable here is marked PROVISIONAL and treated as pure data
by every kernel (a corrected value changes witnesses, never code).
"""

# --- memory pages -----------------------------------------------------------
BOOTLOADER_CODE_PAGE = 8
BOOTLOADER_CALLDATA_PAGE = 3  # PROVISIONAL
BOOTLOADER_BASE_PAGE = 8
BOOTLOADER_HEAP_PAGE = 10  # PROVISIONAL: heap page derived from base page
BOOTLOADER_AUX_HEAP_PAGE = 11  # PROVISIONAL

# --- timestamps / limits ----------------------------------------------------
STARTING_TIMESTAMP = 8  # PROVISIONAL
TIMESTAMPS_PER_CYCLE = 4  # PROVISIONAL
VM_MAX_STACK_DEPTH = 1024  # PROVISIONAL
STARTING_BASE_PAGE = 8

# --- formal addresses -------------------------------------------------------
BOOTLOADER_FORMAL_ADDRESS = 0x8001
ECRECOVER_PRECOMPILE_FORMAL_ADDRESS = 0x0001
SHA256_PRECOMPILE_FORMAL_ADDRESS = 0x0002
KECCAK256_PRECOMPILE_FORMAL_ADDRESS = 0x8010

# --- log/query aux bytes (demux discriminators) -----------------------------
STORAGE_AUX_BYTE = 0
EVENT_AUX_BYTE = 1
L1_MESSAGE_AUX_BYTE = 2
PRECOMPILE_AUX_BYTE = 3

# --- misc -------------------------------------------------------------------
REGISTERS_COUNT = 15  # ref src/base_structures/vm_state/mod.rs:30
L2_TO_L1_MESSAGE_BYTE_LENGTH = 88  # ref src/base_structures/log_query/mod.rs
NUM_PROCESSABLE_SHARDS = 1  # ref src/scheduler/mod.rs:386
