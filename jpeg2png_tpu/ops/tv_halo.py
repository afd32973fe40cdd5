"""TV/TGV2 gather gradient on a halo-extended row tile.

Shared math for spatially-sharded solvers: given the extrapolated
iterate for a contiguous band of rows plus a 2-row halo on each side
(received from stripe neighbours via `ppermute`, or zeros at the global
image boundary), compute the TV + TGV2 gather gradient for the band's
own rows and the band's contribution to the objective sums.

Global edge semantics follow the reference exactly (compute.c:73-197):
forward differences are zeroed on the last global row/column, backward
differences on the first, and gather contributions whose source pixel
falls outside the image are dropped.  All boundary handling is done
with global-row-index masks so the function is agnostic to which stripe
of the image it is looking at — the same contract as the single-chip
Pallas kernel (kernels/grad_step.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _shift_x(a, delta):
    """out[..., x] = a[..., x - delta], zero-filled (image is never
    sharded along W)."""
    if delta > 0:
        pad = jnp.zeros(a.shape[:-1] + (delta,), a.dtype)
        return jnp.concatenate([pad, a[..., :-delta]], axis=-1)
    pad = jnp.zeros(a.shape[:-1] + (-delta,), a.dtype)
    return jnp.concatenate([a[..., -delta:], pad], axis=-1)


def _shift_y(a, delta, rows, h):
    """out[..., y, :] = a[..., y - delta, :] with zeros where the source
    global row does not exist.  Row axis is -2; `rows` holds global row
    ids for axis -2 (traced OK)."""
    rolled = jnp.roll(a, delta, axis=-2)
    src = rows - delta
    ok = (src >= 0) & (src < h)
    return jnp.where(ok[..., :, None], rolled, 0.0)


def grad_gather_halo(fl_ext: jnp.ndarray, row0, H: int, weight: float,
                     w_true: int | None = None):
    """Args:
        fl_ext: [C, L+4, W] extrapolated values; rows 0-1 are the halo
            from above (zeros if none), rows L+2..L+3 the halo below.
        row0: global row index of fl_ext[:, 2, :] (first own row);
            may be traced (e.g. axis_index * L).
        H: TRUE global image height.  The global (striped) canvas may
            be taller (zero-padded, frozen rows); everything at global
            row >= H gets zero gradient and contributes nothing.
        weight: static TGV2 weight.
        w_true: TRUE image width when W is a zero-padded canvas width
            (default: W).  Columns >= w_true are frozen padding.
    Returns:
        (grad [C, L, W], tv_partial, tv2_partial) — gradient for the
        own rows and this band's objective contributions.
    """
    C, T, W = fl_ext.shape
    L = T - 4
    WT = W if w_true is None else int(w_true)
    rows = jnp.arange(T) + (row0 - 2)       # global row per tile row
    cols = jnp.arange(W)

    own_row = (rows >= row0) & (rows < jnp.minimum(row0 + L, H))

    gx = jnp.where(cols[None, None, :] < WT - 1,
                   _shift_x(fl_ext, -1) - fl_ext, 0.0)
    gy_ok = (rows >= 0) & (rows < H - 1)
    gy = jnp.where(gy_ok[None, :, None],
                   jnp.roll(fl_ext, -1, axis=-2) - fl_ext, 0.0)

    g_norm = jnp.sqrt(jnp.sum(gx * gx + gy * gy, axis=0, keepdims=True))
    alpha = 1.0 / math.sqrt(C)
    inv = jnp.where(g_norm == 0.0, 0.0, 1.0 / g_norm)
    a = gx * inv
    b = gy * inv
    grad = (-(a + b) + _shift_x(a, 1) + _shift_y(b, 1, rows, H)) * alpha

    tv_partial = alpha * jnp.sum(
        jnp.where(own_row[None, :, None], g_norm, 0.0), dtype=jnp.float32)

    if weight != 0.0:
        alpha2 = (weight / math.sqrt(2.0)) / math.sqrt(C)
        first_col = cols[None, None, :] >= 1
        first_row = (rows >= 1)[None, :, None]
        g_xx = jnp.where(first_col, gx - _shift_x(gx, 1), 0.0)
        g_yx = jnp.where(first_col, gy - _shift_x(gy, 1), 0.0)
        g_xy = jnp.where(first_row, gx - _shift_y(gx, 1, rows, H), 0.0)
        g_yy = jnp.where(first_row, gy - _shift_y(gy, 1, rows, H), 0.0)
        # canvas padding: the x-diff of gy at pad col WT is a spurious
        # -gy[WT-1], and the y-diffs of gx/gy at pad row H are spurious
        # -gx[H-1]/-gy[H-1] (kernels/iter_step.py rationale); the
        # straight diffs are already zero there (gx/gy edge-masked)
        if WT < W:
            g_yx = jnp.where(cols[None, None, :] < WT, g_yx, 0.0)
        in_rows = (rows < H)[None, :, None]
        g_xy = jnp.where(in_rows, g_xy, 0.0)
        g_yy = jnp.where(in_rows, g_yy, 0.0)
        sym = (g_xy + g_yx) * 0.5
        n2 = jnp.sqrt(jnp.sum(
            g_xx * g_xx + 2.0 * sym * sym + g_yy * g_yy,
            axis=0, keepdims=True))
        inv2 = jnp.where(n2 == 0.0, 0.0, 1.0 / n2)
        center = -(2.0 * g_xx + 2.0 * sym + 2.0 * g_yy) * inv2
        p = (g_xx + sym) * inv2
        q = (g_yy + sym) * inv2
        r = -sym * inv2
        g2 = (center
              + _shift_x(p, -1) + _shift_x(p, 1)
              + _shift_y(q, -1, rows, H) + _shift_y(q, 1, rows, H)
              + _shift_x(_shift_y(r, -1, rows, H), 1)
              + _shift_x(_shift_y(r, 1, rows, H), -1))
        grad = grad + alpha2 * g2
        tv2_partial = alpha2 * jnp.sum(
            jnp.where(own_row[None, :, None], n2, 0.0), dtype=jnp.float32)
    else:
        tv2_partial = jnp.float32(0.0)

    # zero the gradient outside the true canvas so padding stays
    # frozen at exactly 0 and the global norm stays clean (the TGV2
    # gather legitimately reads boundary values into the first pad
    # row/col — the reference's scatter would land out of bounds there)
    pad_mask = (rows < H)[None, :, None]
    if WT < W:
        pad_mask = pad_mask & (cols[None, None, :] < WT)
    grad = jnp.where(pad_mask, grad, 0.0)

    return grad[:, 2:2 + L, :], tv_partial, tv2_partial
