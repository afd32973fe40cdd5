"""DCT-coefficient-distance ("probability") term.

Matches compute_step_prob (reference: compute.c:38-70): the deviation of
the *saved clamped DCT coefficients from the last projection* (not the
DCT of the current extrapolated iterate!) from the plain-decode
coefficients data*quant, measured in quantization-step units.  The
pixel-space gradient is the IDCT of dev/quant^2, replicated over the
subsampling footprint (compute.c:53-66).

Objective bookkeeping quirk: the reference's SIMD build (the shipped
binary) logs prob_dist *without* the alpha factor while the scalar C
path logs alpha*prob_dist (compute_simd_step.c:61 vs compute.c:69); the
image is unaffected either way.  We expose `include_alpha` so CSV logs
can be diffed against either build.
"""

from __future__ import annotations

import jax.numpy as jnp

from jpeg2png_tpu.ops.blocks import deblockify
from jpeg2png_tpu.ops.dct import idct8x8
from jpeg2png_tpu.ops.resample import upsample_replicate


def prob_term(
    cos: jnp.ndarray,       # [nby, nbx, 8, 8] saved clamped DCT coefficients
    dq: jnp.ndarray,        # [nby, nbx, 8, 8] data * quant
    quant: jnp.ndarray,     # [8, 8] float quantization table
    p_alpha: jnp.ndarray,   # scalar pweight * 2 * 255 * sqrt(2) (compute.c:245)
    sy: int,
    sx: int,
    include_alpha_in_dist: bool = False,
):
    """Returns (prob_dist, grad_region).

    grad_region is [nby*8*sy, nbx*8*sx] — the caller pads/places it into
    the full-res gradient (it may cover only part of the canvas when the
    channel's block grid is smaller, mirroring the scatter extent of
    compute.c:58-64).
    """
    dev = cos - dq
    scaled = dev / quant
    prob_dist = 0.5 * jnp.sum(scaled * scaled, dtype=jnp.float32)
    if include_alpha_in_dist:
        prob_dist = p_alpha * prob_dist
    deriv = dev / (quant * quant)
    pix = deblockify(idct8x8(deriv))
    grad_region = p_alpha * upsample_replicate(pix, sy, sx)
    return prob_dist, grad_region


def prob_term_raster(
    cos_r: jnp.ndarray,     # [hc, wc] clamped DCT coefficients (raster)
    dq_r: jnp.ndarray,      # [hc, wc] rasterized data * quant
    inv_q_r: jnp.ndarray,   # [hc, wc] rasterized 1/quant
    p_alpha: jnp.ndarray,
    sy: int,
    sx: int,
    include_alpha_in_dist: bool = False,
):
    """Raster-layout prob term (same math as prob_term; the IDCT runs as
    block-diagonal matmuls via ops/dct_raster.py, no layout shuffles)."""
    from jpeg2png_tpu.ops.dct_raster import idct_raster

    dev = cos_r - dq_r
    scaled = dev * inv_q_r
    prob_dist = 0.5 * jnp.sum(scaled * scaled, dtype=jnp.float32)
    if include_alpha_in_dist:
        prob_dist = p_alpha * prob_dist
    pix = idct_raster(scaled * inv_q_r)
    grad_region = p_alpha * upsample_replicate(pix, sy, sx)
    return prob_dist, grad_region
