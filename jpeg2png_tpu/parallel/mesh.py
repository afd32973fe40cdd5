"""Device mesh construction for spatial (stripe) sharding.

One image is sharded over devices in row stripes (the sequence/context
parallel analog for this workload — SURVEY.md §5); batch parallelism
adds an independent leading axis.  The mesh axis names are:

    "y"     — image rows (stripe/context parallel; halo collectives)
    "batch" — independent images (pure data parallel)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def stripe_mesh(n_devices: Optional[int] = None,
                devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over `n_devices` (default: all) with axis "y"."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("y",))


def batch_mesh(n_devices: Optional[int] = None,
               devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh with axis "batch" — pure data parallelism over images
    (the reference's OpenMP-over-files analog, jpeg2png.c:330-337)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("batch",))


