"""Profiling and tracing helpers.

The reference ships clock() timer macros and gprof hooks
(utils.h:64-65, Makefile:61-63); the TPU-native equivalents are XLA
device traces (viewable in Perfetto/XProf) plus simple wall-clock
solver-rate reporting that accounts for the async dispatch model.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture an XLA device trace (open in Perfetto / TensorBoard).

    with device_trace("/tmp/trace"):
        run_solve(...)
    """
    with jax.profiler.trace(logdir):
        yield


@contextlib.contextmanager
def timed(label: str, sink=None, sync_on: Optional[object] = None):
    """Wall-clock a block; blocks on `sync_on` (a jax array/pytree) so
    async dispatch does not fake instant completion."""
    t0 = time.time()
    yield
    if sync_on is not None:
        jax.block_until_ready(sync_on)
    dt = time.time() - t0
    msg = f"[jpeg2png_tpu] {label}: {dt * 1e3:.2f} ms"
    (sink or print)(msg)


def solver_rate(n_pixels: int, iterations: int, seconds: float) -> dict:
    """Normalize a solve timing into the benchmark metrics."""
    mp_iter = n_pixels * iterations / 1e6 / seconds
    return {
        "mp_iter_per_s": round(mp_iter, 1),
        "seconds": round(seconds, 4),
        "us_per_iteration": round(seconds / iterations * 1e6, 1),
    }


def kernel_cost_table(jitted, *args) -> str:
    """XLA cost analysis of a compiled solver (flops/bytes estimates)."""
    compiled = jitted.lower(*args).compile()
    ca = compiled.cost_analysis()
    keys = ("flops", "transcendentals", "bytes accessed")
    rows = [f"{k:>18}: {ca[k]:.3e}" for k in keys if k in ca]
    return "\n".join(rows)
