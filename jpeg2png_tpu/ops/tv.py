"""TV and second-order TGV subgradient terms, in gather form.

The reference computes these with per-pixel *scatter*-adds into the
gradient buffer (reference: compute.c:73-125 for TV, compute.c:128-197
for TGV2, derivative formulas in notes/derivatives.wxm.txt).  Scatter is
hostile to SIMD/SPMD hardware; on TPU every output pixel instead
*gathers* the contributions its neighbours would have scattered to it.
The two forms are algebraically identical (verified against a scatter
oracle in tests/oracle.py); boundary guards in the scatter loops become
zero-padded shifts here.

Conventions (x = fastest axis = last dim W, y = H; c = channel):
    gx[c,y,x] = f[c,y,x+1] - f[c,y,x]   (0 in the last column)
    gy[c,y,x] = f[c,y+1,x] - f[c,y,x]   (0 in the last row)
    g_norm[y,x] = sqrt(sum_c gx^2 + gy^2)     -- channels are coupled
with subgradient 0 wherever the norm vanishes (reference:
compute.c:97-105, README.md:109-110).
"""

from __future__ import annotations

import jax.numpy as jnp


def shift2d(a: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[..., y, x] = a[..., y-dy, x-dx], zero where out of bounds."""
    if dy:
        pad = [(0, 0)] * (a.ndim - 2) + ([(dy, 0)] if dy > 0 else [(0, -dy)]) + [(0, 0)]
        a = jnp.pad(a, pad)
        a = a[..., : a.shape[-2] - dy, :] if dy > 0 else a[..., -dy:, :]
    if dx:
        pad = [(0, 0)] * (a.ndim - 1) + ([(dx, 0)] if dx > 0 else [(0, -dx)])
        a = jnp.pad(a, pad)
        a = a[..., : a.shape[-1] - dx] if dx > 0 else a[..., -dx:]
    return a


def forward_diffs(f: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward differences with zeroed last column/row (compute.c:79-81)."""
    gx = shift2d(f, 0, -1) - f
    gx = gx.at[..., :, -1].set(0.0)
    gy = shift2d(f, -1, 0) - f
    gy = gy.at[..., -1, :].set(0.0)
    return gx, gy


def tv_term(f: jnp.ndarray):
    """First-order TV objective and gather-form gradient.

    Args:
        f: [C, H, W] current iterate (full resolution, all channels).
    Returns:
        (tv, grad, gx, gy): scalar objective contribution
        alpha*sum(g_norm) with alpha = 1/sqrt(C) (compute.c:90-91), the
        [C, H, W] gradient contribution, and the forward differences
        (kept for the TGV2 term, mirroring temp[0]/temp[1] at
        compute.c:108-112).
    """
    nchannel = f.shape[0]
    gx, gy = forward_diffs(f)
    g_norm = jnp.sqrt(jnp.sum(gx * gx + gy * gy, axis=0))
    alpha = 1.0 / jnp.sqrt(jnp.float32(nchannel))
    tv = alpha * jnp.sum(g_norm, dtype=jnp.float32)

    inv = jnp.where(g_norm == 0.0, 0.0, 1.0 / g_norm)
    a = gx * inv  # broadcasts [H,W] over channels
    b = gy * inv
    # gather of the 3-point scatter at compute.c:98-104:
    #   self: -(gx+gy)/n;  from left neighbour: +gx/n;  from above: +gy/n
    grad = alpha * (-(a + b) + shift2d(a, 0, 1) + shift2d(b, 1, 0))
    return tv, grad, gx, gy


def tv2_term(gx: jnp.ndarray, gy: jnp.ndarray, alpha: float):
    """Second-order TGV objective and gather-form gradient.

    Backward differences of the stored first differences, symmetrized
    cross term, Frobenius-style joint norm (compute.c:137-152), and the
    gather equivalent of the 7-point scatter at compute.c:158-185.

    Args:
        gx, gy: [C, H, W] forward differences from tv_term.
        alpha:  weight / sqrt(2) (compute.c:258), before the 1/sqrt(C)
                factor applied here (compute.c:154).
    Returns:
        (tv2, grad) scalar objective contribution and [C, H, W] gradient.
    """
    nchannel = gx.shape[0]
    # backward differences, zero at the first column/row
    # (compute.c:137-143: "x <= 0 ? 0. : ..." — the x=0/y=0 diffs are 0,
    # not gx[0], so zero them explicitly after the shift-subtract)
    g_xx = (gx - shift2d(gx, 0, 1)).at[..., :, 0].set(0.0)
    g_yx = (gy - shift2d(gy, 0, 1)).at[..., :, 0].set(0.0)
    g_xy = (gx - shift2d(gx, 1, 0)).at[..., 0, :].set(0.0)
    g_yy = (gy - shift2d(gy, 1, 0)).at[..., 0, :].set(0.0)
    sym = (g_xy + g_yx) * 0.5

    n2 = jnp.sqrt(jnp.sum(g_xx * g_xx + 2.0 * sym * sym + g_yy * g_yy, axis=0))
    alpha_c = alpha / jnp.sqrt(jnp.float32(nchannel))
    tv2 = alpha_c * jnp.sum(n2, dtype=jnp.float32)

    inv = jnp.where(n2 == 0.0, 0.0, 1.0 / n2)
    center = -(2.0 * g_xx + 2.0 * sym + 2.0 * g_yy) * inv
    p = (g_xx + sym) * inv   # scattered to x-1 and x+1 by the source
    q = (g_yy + sym) * inv   # scattered to y-1 and y+1 by the source
    r = -sym * inv           # scattered to (x+1,y-1) and (x-1,y+1)
    grad = alpha_c * (
        center
        + shift2d(p, 0, -1) + shift2d(p, 0, 1)
        + shift2d(q, -1, 0) + shift2d(q, 1, 0)
        + shift2d(r, -1, 1) + shift2d(r, 1, -1)
    )
    return tv2, grad
