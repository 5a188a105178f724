"""ctypes bindings + lazy build of the native host runtime (native/gl_runtime.cpp).

The native library handles the intrinsically-sequential witness work (queue
sponge chains) at scalar-C++ speed while the TPU does row-parallel constraint
evaluation — the same split as the reference's native witness oracles
(SURVEY.md §2.4 item 5).  Poseidon2 constants are injected from
utils/grain.py at load so the instance has a single source of truth.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "gl_runtime.cpp")
_SRC_VM = os.path.join(_REPO_ROOT, "native", "eravm.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libgl_runtime.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    srcs = [_SRC, _SRC_VM]
    newest = max(os.path.getmtime(s) for s in srcs)
    if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < newest:
        cmd = [
            "g++", "-O3", "-march=native", "-funroll-loops",
            "-shared", "-fPIC", "-fopenmp",
            "-o", _LIB + ".tmp",
        ] + srcs
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(_LIB + ".tmp", _LIB)
    return _LIB


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            u64p = ctypes.POINTER(ctypes.c_uint64)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.gl_poseidon2_init.argtypes = [u64p, u64p, u64p]
            lib.gl_poseidon2_permute.argtypes = [u64p]
            lib.gl_poseidon2_permute_batch.argtypes = [u64p, ctypes.c_int64]
            lib.gl_full_state_chain.argtypes = [u64p, u64p, u8p, u64p, ctypes.c_int64]
            lib.gl_full_state_chains.argtypes = [
                u64p, u64p, u8p, u64p, ctypes.c_int64, ctypes.c_int64,
            ]
            lib.gl_full_state_chains_strided.argtypes = [
                u64p, u64p, u8p, u64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ]
            lib.gl_narrow_chain.argtypes = [
                u64p, u64p, u8p, u64p, ctypes.c_int64, ctypes.c_int64,
            ]
            lib.gl_narrow_chains.argtypes = [
                u64p, u64p, u8p, u64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ]
            lib.gl_ram_row_check_bench.argtypes = [
                u64p, ctypes.c_int64, u64p,
            ]
            lib.gl_is_initialized.restype = ctypes.c_int

            from ..ops.poseidon2 import EXT_RC, INT_RC, MU

            ext = np.asarray(EXT_RC, dtype=np.uint64).reshape(-1)
            intr = np.asarray(INT_RC, dtype=np.uint64)
            mu = np.asarray(MU, dtype=np.uint64)
            lib.gl_poseidon2_init(
                ext.ctypes.data_as(u64p), intr.ctypes.data_as(u64p), mu.ctypes.data_as(u64p)
            )
            _lib = lib
    return _lib


def _u64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _u8p(a: Optional[np.ndarray]):
    if a is None:
        return ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8))
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def poseidon2_permute(state: np.ndarray) -> np.ndarray:
    """In-place-free single permutation (12 u64)."""
    lib = get_lib()
    out = np.ascontiguousarray(state, dtype=np.uint64).copy()
    lib.gl_poseidon2_permute(_u64p(out))
    return out


def poseidon2_permute_batch(states: np.ndarray) -> np.ndarray:
    lib = get_lib()
    out = np.ascontiguousarray(states, dtype=np.uint64).copy()
    lib.gl_poseidon2_permute_batch(_u64p(out), out.shape[0])
    return out


def full_state_chain(
    encodings: np.ndarray, execute: Optional[np.ndarray], init: np.ndarray
) -> np.ndarray:
    """encodings (n,8) u64, execute (n,) bool/None, init (12,) -> (n+1,12)."""
    lib = get_lib()
    enc = np.ascontiguousarray(encodings, dtype=np.uint64)
    n = enc.shape[0]
    ex = None if execute is None else np.ascontiguousarray(execute, dtype=np.uint8)
    ini = np.ascontiguousarray(init, dtype=np.uint64)
    out = np.empty((n + 1, 12), dtype=np.uint64)
    lib.gl_full_state_chain(_u64p(out), _u64p(enc), _u8p(ex), _u64p(ini), n)
    return out


def full_state_chains(
    encodings: np.ndarray, execute: Optional[np.ndarray], init: np.ndarray
) -> np.ndarray:
    """K chains in parallel: encodings (K,n,8), init (K,12) -> (K,n+1,12)."""
    lib = get_lib()
    enc = np.ascontiguousarray(encodings, dtype=np.uint64)
    k, n = enc.shape[0], enc.shape[1]
    ex = None if execute is None else np.ascontiguousarray(execute, dtype=np.uint8)
    ini = np.ascontiguousarray(init, dtype=np.uint64)
    out = np.empty((k, n + 1, 12), dtype=np.uint64)
    lib.gl_full_state_chains(_u64p(out), _u64p(enc), _u8p(ex), _u64p(ini), k, n)
    return out


def full_state_chains_strided(
    encodings: np.ndarray, execute: Optional[np.ndarray], init: np.ndarray, stride: int
) -> np.ndarray:
    """K chains, boundary states only: (K,n,8) -> (K, n/stride + 1, 12)."""
    lib = get_lib()
    enc = np.ascontiguousarray(encodings, dtype=np.uint64)
    k, n = enc.shape[0], enc.shape[1]
    assert n % stride == 0
    ex = None if execute is None else np.ascontiguousarray(execute, dtype=np.uint8)
    ini = np.ascontiguousarray(init, dtype=np.uint64)
    out = np.empty((k, n // stride + 1, 12), dtype=np.uint64)
    lib.gl_full_state_chains_strided(
        _u64p(out), _u64p(enc), _u8p(ex), _u64p(ini), k, n, stride
    )
    return out


def narrow_chains(
    encodings: np.ndarray, execute: Optional[np.ndarray], init: np.ndarray
) -> np.ndarray:
    """K narrow chains in parallel: (K,n,L), (K,4) -> (K, n+1, 4)."""
    lib = get_lib()
    enc = np.ascontiguousarray(encodings, dtype=np.uint64)
    k, n, enc_len = enc.shape
    ex = None if execute is None else np.ascontiguousarray(execute, dtype=np.uint8)
    ini = np.ascontiguousarray(init, dtype=np.uint64)
    out = np.empty((k, n + 1, 4), dtype=np.uint64)
    lib.gl_narrow_chains(_u64p(out), _u64p(enc), _u8p(ex), _u64p(ini), k, n, enc_len)
    return out


def narrow_chain(
    encodings: np.ndarray, execute: Optional[np.ndarray], init: np.ndarray
) -> np.ndarray:
    """encodings (n,L) u64, init (4,) -> (n+1,4)."""
    lib = get_lib()
    enc = np.ascontiguousarray(encodings, dtype=np.uint64)
    n, enc_len = enc.shape
    ex = None if execute is None else np.ascontiguousarray(execute, dtype=np.uint8)
    ini = np.ascontiguousarray(init, dtype=np.uint64)
    out = np.empty((n + 1, 4), dtype=np.uint64)
    lib.gl_narrow_chain(_u64p(out), _u64p(enc), _u8p(ex), _u64p(ini), n, enc_len)
    return out


def ram_row_check_baseline(n: int = 1 << 16) -> float:
    """Measured single-core rows/s of the ram_permutation per-row work
    (2 Poseidon2 permutations + grand-product folds + sort/RW checks) —
    the stand-in-Rust CPU baseline (VERDICT round 1, item 7)."""
    import time

    lib = get_lib()
    rng = np.random.default_rng(7)
    enc = rng.integers(0, (1 << 63), size=(n, 8), dtype=np.uint64)
    out = np.zeros(12, np.uint64)
    # warm once (page in + icache), then time
    lib.gl_ram_row_check_bench(_u64p(enc), min(n, 4096), _u64p(out))
    t0 = time.perf_counter()
    lib.gl_ram_row_check_bench(_u64p(enc), n, _u64p(out))
    dt = time.perf_counter() - t0
    return n / dt
