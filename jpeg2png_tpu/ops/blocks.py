"""Raster <-> 8x8-block layout transforms.

The reference shuffles between "boxed" (block-major, 64 contiguous floats
per 8x8 block, block i = by*block_w + bx) and raster row-major layouts
with explicit copy loops (reference: box.c:5-36).  In XLA these are pure
reshape/transpose ops that fuse into neighbouring computations for free;
we standardize on a 4-D block tensor [..., nby, nbx, 8, 8] whose leading
two block dims match the reference's block-major order.
"""

from __future__ import annotations

import jax.numpy as jnp


def blockify(img: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] -> [..., H//8, W//8, 8, 8].  H, W must be multiples of 8."""
    *lead, h, w = img.shape
    assert h % 8 == 0 and w % 8 == 0, (h, w)
    x = img.reshape(*lead, h // 8, 8, w // 8, 8)
    return jnp.moveaxis(x, -3, -2)


def deblockify(blocks: jnp.ndarray) -> jnp.ndarray:
    """[..., nby, nbx, 8, 8] -> [..., nby*8, nbx*8]."""
    *lead, nby, nbx, i, j = blocks.shape
    assert i == 8 and j == 8
    x = jnp.moveaxis(blocks, -2, -3)
    return x.reshape(*lead, nby * 8, nbx * 8)
