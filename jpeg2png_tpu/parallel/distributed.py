"""Multi-host scaffolding: process initialization + global meshes.

The reference is a single process with OpenMP shared memory (SURVEY.md
§5 "distributed communication backend: absent"); scaling beyond one
host here uses the standard JAX multi-controller model:

  * every participating host runs the SAME program;
  * `initialize()` wires them into one runtime via
    `jax.distributed.initialize` (coordinator TCP address + process
    count + rank — on Cloud TPU pods all three auto-detect from the
    environment, so `initialize()` with no args is enough there);
  * after that, `jax.devices()` returns the GLOBAL device list, and
    the meshes built by `parallel.mesh` span all hosts: stripe ("y")
    collectives ride ICI within a slice and DCN across hosts, batch
    ("batch") parallelism needs no collectives at all.

Environment-variable form (for launchers that cannot pass flags):
    JPEG2PNG_COORDINATOR=host:port
    JPEG2PNG_NUM_PROCESSES=N
    JPEG2PNG_PROCESS_ID=i

CLI: `--tpu-distributed` calls initialize() before any device use.

Tested by tests/test_distributed.py: two localhost CPU processes
initialize, build a global 2-device stripe mesh, and run a striped
solve whose halo ppermutes and psums cross the process boundary.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple:
    """Join the multi-host runtime; returns (process_index,
    process_count).  Arguments default to the JPEG2PNG_* environment
    variables, then to JAX's own auto-detection (TPU pod metadata).

    Must be called before any other JAX API touches devices.
    """
    import jax

    if coordinator_address is None:
        coordinator_address = os.environ.get("JPEG2PNG_COORDINATOR")
    if num_processes is None:
        v = os.environ.get("JPEG2PNG_NUM_PROCESSES")
        num_processes = int(v) if v else None
    if process_id is None:
        v = os.environ.get("JPEG2PNG_PROCESS_ID")
        process_id = int(v) if v else None

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # idempotent: the CLI may be invoked from a program that
        # already joined the runtime (e.g. tests driving cli.main
        # after their own initialize()).  jax raises for both
        # "already initialized" and "backend already touched" — a
        # process_count > 1 proves the runtime is actually up
        if jax.process_count() <= 1:
            raise
    return jax.process_index(), jax.process_count()


def is_multi_process() -> bool:
    import jax

    return jax.process_count() > 1


def is_primary() -> bool:
    """Whether this process is the designated writer (rank 0).

    In a multi-controller run every process executes the same program;
    host-side side effects that must happen once — PNG files, CSV rows,
    the progress bar, checkpoint snapshot files — are rank-0-only, the
    analog of the reference's single writer (jpeg2png.c:162-165)."""
    import jax

    return jax.process_index() == 0


def barrier(name: str) -> None:
    """Cross-process sync point (no-op single-process)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def gather_output(fdata):
    """Fetch a (possibly cross-host sharded) solver output to every
    host for PNG writing — the all-gather happens once per image, at
    the very end (SURVEY.md §5: 'all-gather only at PNG write')."""
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    if not is_multi_process():
        return np.asarray(fdata)
    if isinstance(fdata, np.ndarray):
        # already a host array — every process holds the same copy
        # (e.g. chunked-solve metrics, concatenated on each host from
        # P() out specs); allgathering it would concatenate
        # process_count identical copies
        return fdata
    if getattr(fdata, "is_fully_replicated", False):
        # every host already holds a replica (e.g. the metrics, out
        # spec P()) — a local read suffices
        return np.asarray(fdata)
    return np.asarray(
        multihost_utils.process_allgather(fdata, tiled=True))
