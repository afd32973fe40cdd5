"""Projection onto the JPEG feasible set Q.

Q = { u : DCT(u)[j] in [(data[j]-0.5)*quant[j], (data[j]+0.5)*quant[j]] }
per 8x8 block — every image in Q re-encodes to exactly the source JPEG.
Because the block DCT is orthonormal, projecting is just clamping in DCT
space (reference: compute.c:323-331, README.md:113).

For subsampled channels the reference first decomposes each subsampling
footprint into its mean (projected at subsampled resolution) plus a
residual that is passed through untouched — an exact orthogonal
decomposition along the vector of ones (compute.c:334-404).  The same
code path here handles the non-subsampled case (footprints of 1x1 have
zero residual).

The clamped DCT coefficients are returned as well: the next iteration's
prob term uses them (compute.c:381).
"""

from __future__ import annotations

import jax.numpy as jnp

from jpeg2png_tpu.ops.blocks import blockify, deblockify
from jpeg2png_tpu.ops.dct import dct8x8, idct8x8
from jpeg2png_tpu.ops.resample import footprint_mean, upsample_replicate


def project_channel(
    region: jnp.ndarray,    # [hc*sy, wc*sx] slice of full-res fdata
    lo: jnp.ndarray,        # [nby, nbx, 8, 8] (data-0.5)*quant
    hi: jnp.ndarray,        # [nby, nbx, 8, 8] (data+0.5)*quant
    sy: int,
    sx: int,
):
    """Returns (projected_region, clamped_dct)."""
    sub = footprint_mean(region, sy, sx)
    if sy == 1 and sx == 1:
        residual = None
    else:
        residual = region - upsample_replicate(sub, sy, sx)

    coefs = dct8x8(blockify(sub))
    clamped = jnp.clip(coefs, lo, hi)
    sub_proj = deblockify(idct8x8(clamped))

    if residual is None:
        out = sub_proj
    else:
        out = residual + upsample_replicate(sub_proj, sy, sx)
    return out, clamped


def project_channel_raster(
    region: jnp.ndarray,    # [hc*sy, wc*sx] slice of full-res fdata
    lo_r: jnp.ndarray,      # [hc, wc] rasterized (data-0.5)*quant
    hi_r: jnp.ndarray,      # [hc, wc] rasterized (data+0.5)*quant
    sy: int,
    sx: int,
):
    """Raster-layout projection: identical math to project_channel but
    with the block DCT applied in place via block-diagonal matmuls
    (ops/dct_raster.py) — no blockify/deblockify transposes in the hot
    loop.  Returns (projected_region, clamped_dct_raster)."""
    from jpeg2png_tpu.ops.dct_raster import dct_raster, idct_raster

    sub = footprint_mean(region, sy, sx)
    if sy == 1 and sx == 1:
        residual = None
    else:
        residual = region - upsample_replicate(sub, sy, sx)

    coefs = dct_raster(sub)
    clamped = jnp.clip(coefs, lo_r, hi_r)
    sub_proj = idct_raster(clamped)

    if residual is None:
        out = sub_proj
    else:
        out = residual + upsample_replicate(sub_proj, sy, sx)
    return out, clamped
