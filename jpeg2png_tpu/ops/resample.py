"""Chroma-subsampling resample helpers.

The reference replicates each subsampled pixel over its h_samp x w_samp
footprint at init (compute.c:296-302, with edge clamping) and decomposes
each footprint into mean + residual during the projection
(compute.c:349-370).  Here these are reshape-based reductions /
broadcasts that XLA fuses away.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def upsample_replicate(sub: jnp.ndarray, sy: int, sx: int) -> jnp.ndarray:
    """[..., h, w] -> [..., h*sy, w*sx] by footprint replication."""
    if sy == 1 and sx == 1:
        return sub
    *lead, h, w = sub.shape
    x = jnp.broadcast_to(
        sub[..., :, None, :, None], (*lead, h, sy, w, sx)
    )
    return x.reshape(*lead, h * sy, w * sx)


def upsample_nearest_clamped(
    sub: jnp.ndarray, sy: int, sx: int, h_out: int, w_out: int
) -> jnp.ndarray:
    """Nearest upsample to an arbitrary (possibly larger) full-res canvas.

    Matches aux_init's index rule cy = MIN(y/h_samp, h-1) (compute.c:298-299):
    pixels past h*sy replicate the last source row/column.
    """
    h, w = sub.shape[-2:]
    yy = np.minimum(np.arange(h_out) // sy, h - 1)
    xx = np.minimum(np.arange(w_out) // sx, w - 1)
    return sub[..., yy, :][..., :, xx]


def footprint_mean(full: jnp.ndarray, sy: int, sx: int) -> jnp.ndarray:
    """[..., h*sy, w*sx] -> [..., h, w] mean over each footprint."""
    if sy == 1 and sx == 1:
        return full
    *lead, hh, ww = full.shape
    x = full.reshape(*lead, hh // sy, sy, ww // sx, sx)
    return x.mean(axis=(-3, -1))
