"""Persistent XLA compilation cache for CLI cold starts.

The fused Pallas solve kernels take tens of seconds to compile the
first time; a one-shot CLI process (the reference's usage model,
jpeg2png.c:177) would pay that on every invocation.  Pointing JAX at
an on-disk compilation cache makes every invocation after the first
load the compiled executable instead (verified through the remote-TPU
backend: second-process solve latency drops from ~tens of seconds to
~2 s for the 512x512 default-flag solve).
"""

from __future__ import annotations

import os


def enable_persistent_cache() -> str | None:
    """Point JAX at an on-disk compilation cache directory.

    Honors ``JAX_COMPILATION_CACHE_DIR`` when the user set one (JAX
    also reads it natively); otherwise defaults to
    ``$XDG_CACHE_HOME/jpeg2png_tpu/xla``.  Set
    ``JPEG2PNG_TPU_NO_COMPILE_CACHE=1`` to disable.  Returns the cache
    path, or None when disabled/unavailable — the cache is an
    optimization, never an error.
    """
    if os.environ.get("JPEG2PNG_TPU_NO_COMPILE_CACHE"):
        return None
    import jax

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not path:
        base = os.environ.get(
            "XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
        path = os.path.join(base, "jpeg2png_tpu", "xla")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # the kernels we care about all compile in >> 1 s; skipping
        # sub-second entries keeps the cache dir from filling with
        # thousands of trivial jit helpers
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - optional facility only
        return None
    return path
