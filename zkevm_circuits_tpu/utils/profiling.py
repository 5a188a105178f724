"""Tracing / profiling / observability helpers.

Reference parity (SURVEY.md §5.1, §5.5): the reference's observability is the
`verbose_circuits` dbg! layer, boojum's `log_tracing` forwarding, and
`print_gate_stats` on dev assemblies.  The TPU-native equivalents here:

  * `time_jitted` — wall-clock a jitted callable with compile/steady split
    (the per-kernel timing role; pair with `jax.profiler.trace` for full
    XLA traces).
  * `residual_report` — per-check pass/fail counts over a residual dict (the
    `print_gate_stats` / pretty-comparison role: every circuit's
    `eval_constraints` already returns named per-row residuals, so "debug
    mode" is just reading them — no special build needed).
  * `trace` — context manager around `jax.profiler.trace` writing a TensorBoard
    trace directory.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np


def time_jitted(fn: Callable, *args, reps: int = 3) -> Dict[str, float]:
    """Returns {'compile_s', 'steady_s'} for a jitted callable."""
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return {"compile_s": compile_s, "steady_s": (time.perf_counter() - t0) / reps}


def residual_report(residuals: Dict[str, "jax.Array"]) -> Dict[str, dict]:
    """Per-check summary: total rows, failing rows, first failing index."""
    report = {}
    for name, arr in residuals.items():
        a = np.asarray(arr)
        flat = a.reshape(-1) if a.ndim else a.reshape(1)
        failing = np.flatnonzero(~flat)
        report[name] = {
            "rows": int(flat.size),
            "failing": int(failing.size),
            "first_failure": int(failing[0]) if failing.size else None,
        }
    return report


def format_residual_report(residuals) -> str:
    lines = []
    for name, info in residual_report(residuals).items():
        status = "ok" if info["failing"] == 0 else f"FAIL x{info['failing']} (first @ {info['first_failure']})"
        lines.append(f"{name:32s} {info['rows']:>10d} rows  {status}")
    return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
