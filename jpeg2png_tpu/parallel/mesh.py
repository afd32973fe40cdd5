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


def _take(n_devices: Optional[int], what: str) -> Sequence:
    """The first `n_devices` global devices; an explicit request for
    more than exist is an error, never a silent truncation (a "striped
    over 8" solve that quietly ran on 1 device hides both the perf and
    the sharding-validity signal)."""
    devices = jax.devices()
    if n_devices is None:
        return devices
    if n_devices > len(devices):
        raise ValueError(
            f"need {n_devices} devices for a {n_devices}-way {what} "
            f"mesh, have {len(devices)}")
    return devices[:n_devices]


def stripe_mesh(n_devices: Optional[int] = None,
                devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over `n_devices` (default: all) with axis "y"."""
    if devices is None:
        devices = _take(n_devices, "stripe")
    return Mesh(np.asarray(devices), ("y",))


def batch_mesh(n_devices: Optional[int] = None,
               devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh with axis "batch" — pure data parallelism over images
    (the reference's OpenMP-over-files analog, jpeg2png.c:330-337)."""
    if devices is None:
        devices = _take(n_devices, "batch")
    return Mesh(np.asarray(devices), ("batch",))


def batch_stripe_mesh(n_batch: int, n_stripes: int,
                      devices: Optional[Sequence] = None) -> Mesh:
    """2-D ("batch", "y") mesh: n_batch independent images, each
    striped over n_stripes devices — the pod topology for serving many
    giant files at once (SURVEY.md §5).  Consecutive devices form each
    image's stripe group so the per-iteration "y" halo/psum collectives
    ride the closest ICI links; the batch axis carries no collectives
    at all."""
    if devices is None:
        devices = jax.devices()
    need = n_batch * n_stripes
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for a {n_batch}x{n_stripes} mesh, "
            f"have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_batch, n_stripes)
    return Mesh(arr, ("batch", "y"))


