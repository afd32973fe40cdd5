"""Numeric debugging — the TPU analog of the reference's FP traps.

The reference's DEBUG builds trap FE_DIVBYZERO/OVERFLOW/INVALID with
glibc feenableexcept (fp_exceptions.c:9-14) to catch norm-zero division
bugs.  JAX's equivalents are jax_debug_nans/jax_debug_infs — the solver
is written so that zero norms take the subdifferential-0 branch and no
NaN/Inf is ever produced (compute.c:97, :158, :211 analogs), which this
mode verifies at runtime.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def fp_exceptions(enable: bool = True):
    """Context manager: raise on any NaN/Inf produced on device."""
    if not enable:
        yield
        return
    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)


def enable_fp_exceptions() -> None:
    """Process-wide enable (mirrors enable_fp_exceptions, jpeg2png.c:178)."""
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)
