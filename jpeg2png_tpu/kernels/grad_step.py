"""Fused FISTA-extrapolation + TV/TGV2 gradient Pallas kernel.

The hot half of every solver iteration (reference: compute.c:427-443,
i.e. the FISTA extrapolate + compute_step pipeline minus the prob term,
which arrives pre-computed as a pixel-space gradient) fused into a
single VMEM-resident pass:

    extrap = f + factor * (f - fista)
    gx, gy = forward diffs of extrap        (zero last col/row)
    grad   = TV gather + TGV2 gather + pgrad
    partials: per-channel sum(grad^2), tv objective, tv2 objective

The image is processed in row stripes (the TPU Pallas grid is
sequential, so scalar accumulators in SMEM scratch persist across
stripes).  Each stripe DMAs its rows plus an 8-row halo from HBM — the stencil
only needs 2 (the TGV2 gather reaches through two chained backward
differences, SURVEY.md §5), but HBM slices must be 8-row aligned.  Boundary stripes clamp
the DMA window; the resulting tile offset of a stripe's own first row
is static per stripe class (first/interior/last), so the own-rows
extraction uses static rolls under @pl.when branches (Mosaic has no
dynamic_slice on vectors).  Global edge semantics (forward diffs zeroed
on the last row/column, backward diffs zeroed on the first,
out-of-image gather contributions dropped) are enforced with index
masks, exactly mirroring ops/tv.py which in turn matches the reference
scatter loops (compute.c:73-197).

Mosaic-dialect notes: all tensor math is per-channel 2-D [T, W] with
the channel loop unrolled in Python (3-D vector ops and axis-0
reductions hit unsupported lowering paths), and every operand lives in
ANY/HBM memory space with manual DMA both ways (mixing manual-DMA
inputs with pipeline-blocked VMEM outputs crashes this Mosaic version).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rows2d(start, t, w):
    return jax.lax.broadcasted_iota(jnp.int32, (t, w), 0) + start


def _cols2d(t, w):
    return jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)


def _roll(a, delta, axis):
    """Circular shift by delta (pltpu.roll only takes non-negative)."""
    return pltpu.roll(a, shift=delta % a.shape[axis], axis=axis)


def _shift_x(a, delta):
    """out[.., x] = a[.., x - delta], zero where the source column
    does not exist.  delta in {-1, +1}; a is [T, W]."""
    rolled = _roll(a, delta, 1)
    w = a.shape[1]
    cols = _cols2d(*a.shape)
    if delta > 0:
        return jnp.where(cols >= delta, rolled, 0.0)
    return jnp.where(cols < w + delta, rolled, 0.0)


def _shift_y(a, delta, rows, h):
    """out[y, ..] = a[y - delta, ..], zero where the source global row
    does not exist (outside [0, h))."""
    rolled = _roll(a, delta, 0)
    src = rows - delta
    return jnp.where((src >= 0) & (src < h), rolled, 0.0)


def _stencil_terms(fl, rows, cols, HT, WT, H, W, weight, own,
                   dynamic=False):
    """Joint TV + TGV2 gather stencil (compute.c:73-197) on the
    extrapolated tiles `fl` (per-channel list of [T, W]).

    Returns (grad list of [T, W], tv_contrib, tv2_contrib) where the
    objective contributions are already summed over the `own` rows
    (tv2_contrib is None when the TGV2 weight is 0).  Shared by the
    f32 and the lite kernels — the stencil math is identical; only the
    state dtypes around it differ.

    dynamic=True means HT/WT are RUNTIME scalars (dynamic-extent
    bucketed serving): the pad-boundary masks are then emitted
    unconditionally, since whether the true edge sits inside the
    padded canvas is no longer a trace-time fact."""
    C = len(fl)
    gx = [None] * C
    gy = [None] * C
    for c in range(C):
        gx[c] = jnp.where(cols < WT - 1, _roll(fl[c], -1, 1) - fl[c], 0.0)
        gy[c] = jnp.where(rows < HT - 1, _roll(fl[c], -1, 0) - fl[c], 0.0)

    # ---- TV term (compute.c:73-125 in gather form) ----
    gsq = gx[0] * gx[0] + gy[0] * gy[0]
    for c in range(1, C):
        gsq = gsq + gx[c] * gx[c] + gy[c] * gy[c]
    g_norm = jnp.sqrt(gsq)
    alpha = 1.0 / math.sqrt(C)
    inv = jnp.where(g_norm == 0.0, 0.0, 1.0 / g_norm)

    grad = [None] * C
    for c in range(C):
        a = gx[c] * inv
        b = gy[c] * inv
        grad[c] = (-(a + b) + _shift_x(a, 1)
                   + _shift_y(b, 1, rows, HT)) * alpha

    tv_contrib = alpha * jnp.sum(jnp.where(own, g_norm, 0.0))
    tv2_contrib = None

    # ---- TGV2 term (compute.c:128-197 in gather form) ----
    if weight != 0.0:
        alpha2 = (weight / math.sqrt(2.0)) / math.sqrt(C)
        g_xx = [None] * C
        g_yy = [None] * C
        sym = [None] * C
        n2sq = None
        for c in range(C):
            g_xx[c] = jnp.where(cols >= 1, gx[c] - _shift_x(gx[c], 1), 0.0)
            g_yx = jnp.where(cols >= 1, gy[c] - _shift_x(gy[c], 1), 0.0)
            if dynamic or WT < W:
                # canvas padding: the x-diff of gy at pad col WT is a
                # spurious -gy[WT-1] (kernels/iter_step.py rationale)
                g_yx = jnp.where(cols < WT, g_yx, 0.0)
            g_xy = jnp.where(rows >= 1,
                             gx[c] - _shift_y(gx[c], 1, rows, HT), 0.0)
            g_yy[c] = jnp.where(rows >= 1,
                                gy[c] - _shift_y(gy[c], 1, rows, HT), 0.0)
            if dynamic or HT < H:
                # and the y-diff of gx at pad row HT: -gx[HT-1]
                g_xy = jnp.where(rows < HT, g_xy, 0.0)
                g_yy[c] = jnp.where(rows < HT, g_yy[c], 0.0)
            sym[c] = (g_xy + g_yx) * 0.5
            term = (g_xx[c] * g_xx[c] + 2.0 * sym[c] * sym[c]
                    + g_yy[c] * g_yy[c])
            n2sq = term if n2sq is None else n2sq + term
        n2 = jnp.sqrt(n2sq)
        inv2 = jnp.where(n2 == 0.0, 0.0, 1.0 / n2)
        for c in range(C):
            center = -(2.0 * g_xx[c] + 2.0 * sym[c] + 2.0 * g_yy[c]) * inv2
            p = (g_xx[c] + sym[c]) * inv2
            q = (g_yy[c] + sym[c]) * inv2
            r = -sym[c] * inv2
            g2 = (center
                  + _shift_x(p, -1) + _shift_x(p, 1)
                  + _shift_y(q, -1, rows, HT) + _shift_y(q, 1, rows, HT)
                  + _shift_x(_shift_y(r, -1, rows, HT), 1)
                  + _shift_x(_shift_y(r, 1, rows, HT), -1))
            grad[c] = grad[c] + alpha2 * g2
        tv2_contrib = alpha2 * jnp.sum(jnp.where(own, n2, 0.0))

    return grad, tv_contrib, tv2_contrib


def _expand_devq(x, ah, al_, bh, bl_, dc_t, sr, wc, sx):
    """Coef-space devq [sr, wc] -> pixel-space prob gradient
    (compute.c:38-70: alpha * idct(dev/q^2) replicated over the
    subsampling footprint) — iter_step.py's stencil-phase expansion,
    used by the lite kernels (kernels/stripe_grad.py).

    devq is a small-magnitude correction (dev/q^2 <= 1/(2q)) already
    in bf16, so both transform passes run single-pass bf16 (bf16's
    relative error is absolutely negligible there and exact zeros stay
    exact — see kernels/iter_step.py col_bwd for the measured accuracy
    evidence): 2 MXU passes total, not 5.  dc_t is a [>= sr, W] f32
    VMEM scratch."""
    TCs = 128 * sx
    for tc in range(wc // 128):
        xs = x[:, tc * 128:(tc + 1) * 128]
        dn = (((1,), (0,)), ((), ()))
        dc_t[:sr, tc * TCs:(tc + 1) * TCs] = jax.lax.dot_general(
            xs, bh, dn, preferred_element_type=jnp.float32)
    return jax.lax.dot_general(
        ah, dc_t[:sr, :].astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _kernel(
    factor_ref,            # scalar-prefetch (1,) FISTA factor
    *refs,                 # per-channel HBM refs + scratch, see below
    C, P, H, W, HT, WT, SH, weight, nstripes, prob_mask,
):
    """refs layout (all ANY/HBM unless noted):
    C x f, C x fista, P x pgrad (only channels with prob_mask[c]),
    C x grad out, C x extrap out, partials out (8,128);
    scratch: f_tile [C,T,W], fi_tile [C,T,W], pg_tile [P,SH,W],
    g_out [C,SH,W], e_out [C,SH,W], part_out (8,128), acc SMEM (8,),
    sem DMA (8,).
    """
    it = iter(refs)
    f_hbms = [next(it) for _ in range(C)]
    fi_hbms = [next(it) for _ in range(C)]
    pg_hbms = [next(it) for _ in range(P)]
    grad_hbms = [next(it) for _ in range(C)]
    extrap_hbms = [next(it) for _ in range(C)]
    partial_hbm = next(it)
    f_tile = next(it)
    fi_tile = next(it)
    pg_tile = next(it) if P else None
    g_out = next(it)
    e_out = next(it)
    part_out = next(it)
    acc = next(it)
    sem = next(it)

    i = pl.program_id(0)
    T = SH + 16
    r0 = pl.multiple_of(i * SH, 8)
    start = pl.multiple_of(jnp.clip(r0 - 8, 0, H - T), 8)
    last_rows = H - (nstripes - 1) * SH  # height of the final stripe

    copies = []
    for c in range(C):
        cp = pltpu.make_async_copy(
            f_hbms[c].at[pl.ds(start, T), :], f_tile.at[c], sem.at[0])
        cp.start()
        copies.append(cp)
        cp = pltpu.make_async_copy(
            fi_hbms[c].at[pl.ds(start, T), :], fi_tile.at[c], sem.at[1])
        cp.start()
        copies.append(cp)

    @pl.when(i == 0)
    def _():
        for j in range(8):
            acc[j] = jnp.float32(0.0)

    # prob gradient rows for this stripe (block-aligned, no halo)
    if P:
        @pl.when(i < nstripes - 1)
        def _():
            for pi in range(P):
                cp = pltpu.make_async_copy(
                    pg_hbms[pi].at[pl.ds(r0, SH), :], pg_tile.at[pi],
                    sem.at[2])
                cp.start()
                cp.wait()

        @pl.when(i == nstripes - 1)
        def _():
            for pi in range(P):
                cp = pltpu.make_async_copy(
                    pg_hbms[pi].at[pl.ds(r0, last_rows), :],
                    pg_tile.at[pi, pl.ds(0, last_rows), :], sem.at[2])
                cp.start()
                cp.wait()

    for cp in copies:
        cp.wait()

    factor = factor_ref[0]
    rows = _rows2d(start, T, W)
    cols = _cols2d(T, W)
    own = (rows >= r0) & (rows < jnp.minimum(r0 + SH, H))

    # per-channel 2-D tiles, channel loop unrolled
    fl = [None] * C
    for c in range(C):
        f = f_tile[c, :, :]
        fl[c] = f + factor * (f - fi_tile[c, :, :])

    grad, tv_c, tv2_c = _stencil_terms(
        fl, rows, cols, HT, WT, H, W, weight, own)
    acc[C] = acc[C] + tv_c
    if tv2_c is not None:
        acc[C + 1] = acc[C + 1] + tv2_c

    # ---- own-rows extraction (static per stripe class) + writeback ----
    block_rows = jax.lax.broadcasted_iota(jnp.int32, (SH, W), 0) + r0
    valid = block_rows < H

    prob_idx = {}
    pi = 0
    for c in range(C):
        if prob_mask[c]:
            prob_idx[c] = pi
            pi += 1

    pad_mask = None
    if HT < H or WT < W:
        # zero the gradient outside the true canvas: the TGV2 gather
        # reads boundary values into the first pad row/col (see
        # kernels/iter_step.py), which would un-freeze padding under
        # subsampled projection and contaminate the global norm
        rows_own = jax.lax.broadcasted_iota(jnp.int32, (SH, W), 0) + r0
        cols_own = jax.lax.broadcasted_iota(jnp.int32, (SH, W), 1)
        pad_mask = (rows_own < HT) & (cols_own < WT)

    def emit(off: int):
        for c in range(C):
            g = grad[c] if off == 0 else _roll(grad[c], -off, 0)
            e = fl[c] if off == 0 else _roll(fl[c], -off, 0)
            g_own = g[:SH, :]
            if pad_mask is not None:
                g_own = jnp.where(pad_mask, g_own, 0.0)
            if c in prob_idx:
                g_own = g_own + pg_tile[prob_idx[c], :, :]
            g_own = jnp.where(valid, g_own, 0.0)
            g_out[c, :, :] = g_own
            e_out[c, :, :] = jnp.where(valid, e[:SH, :], 0.0)
            acc[c] = acc[c] + jnp.sum(g_own * g_own)

    off_last = nstripes * SH - H + 16

    @pl.when(i == 0)
    def _():
        emit(0)

    if nstripes > 2:
        @pl.when((i > 0) & (i < nstripes - 1))
        def _():
            emit(8)

    @pl.when(i == nstripes - 1)
    def _():
        emit(off_last)

    # DMA results back to HBM (sizes are static per stripe class)
    @pl.when(i < nstripes - 1)
    def _():
        cps = []
        for c in range(C):
            cg = pltpu.make_async_copy(
                g_out.at[c], grad_hbms[c].at[pl.ds(r0, SH), :], sem.at[3])
            ce = pltpu.make_async_copy(
                e_out.at[c], extrap_hbms[c].at[pl.ds(r0, SH), :], sem.at[4])
            cg.start()
            ce.start()
            cps.extend([cg, ce])
        for cp in cps:
            cp.wait()

    @pl.when(i == nstripes - 1)
    def _():
        cps = []
        for c in range(C):
            cg = pltpu.make_async_copy(
                g_out.at[c, pl.ds(0, last_rows), :],
                grad_hbms[c].at[pl.ds(r0, last_rows), :], sem.at[3])
            ce = pltpu.make_async_copy(
                e_out.at[c, pl.ds(0, last_rows), :],
                extrap_hbms[c].at[pl.ds(r0, last_rows), :], sem.at[4])
            cg.start()
            ce.start()
            cps.extend([cg, ce])
        for cp in cps:
            cp.wait()

        vals = jnp.stack([acc[j] for j in range(8)])
        part_out[:, :] = jnp.broadcast_to(vals[:, None], (8, 128))
        cpp = pltpu.make_async_copy(part_out, partial_hbm, sem.at[5])
        cpp.start()
        cpp.wait()


def _pick_stripe(h: int, w: int) -> int:
    """Stripe height: bound VMEM tile bytes ~ 5 * C * (SH+16) * W * 4.

    HBM DMA slices must be 8-row aligned (Mosaic (8,128) tiling), so the
    halo is 8 rows per side even though the stencil only needs 2.
    Capped at 64 rows in the wide-lane regime: TGV2 stencil tiles
    around 128x2048 cross a Mosaic codegen resource and run ~2x slower
    per pixel (see kernels/iter_step.stripe_h)."""
    budget = 48 * 1024 * 1024
    cap = 64 if w > 1024 else 256
    for sh in (256, 128, 64, 32, 16, 8):
        if sh > cap:
            continue
        if 5 * 3 * (sh + 16) * w * 4 <= budget and h >= sh + 16:
            return sh
    return 0


def supports(C: int, H: int, W: int) -> bool:
    # lane dim must be whole (8,128) tiles: small/odd widths hit Mosaic
    # memref-slice limits (those images use the XLA path instead)
    if H % 8 or W % 128:
        return False
    return _pick_stripe(H, W) != 0


def fused_grad(fdatas, fistas, pgrads, factor, weight: float,
               h_true: int | None = None, w_true: int | None = None):
    """Run the fused kernel.

    Args:
        fdatas, fistas: per-channel lists of [H, W] float32 (shared
            canvas shape).
        pgrads: per-channel list of [H, W] prob pixel gradients, with
            None for channels whose prob term is disabled (pweight 0).
        factor: scalar FISTA extrapolation factor (traced).
        weight: static TGV2 weight (0 disables the second-order term).
        h_true, w_true: true image-canvas extent when [H, W] is a
            zero-padded canvas (edge masks key to these; padding stays
            frozen at zero exactly as in kernels/iter_step.py).
    Returns:
        (grads list of [H,W], extraps list of [H,W], sumsq [C], tv, tv2)
    """
    C = len(fdatas)
    H, W = fdatas[0].shape
    HT = H if h_true is None else int(h_true)
    WT = W if w_true is None else int(w_true)
    prob_mask = tuple(p is not None for p in pgrads)
    P = sum(prob_mask)
    SH = _pick_stripe(H, W)
    assert SH, (H, W)
    nstripes = pl.cdiv(H, SH)
    T = SH + 16

    kernel = functools.partial(
        _kernel, C=C, P=P, H=H, W=W, HT=HT, WT=WT, SH=SH,
        weight=float(weight), nstripes=nstripes, prob_mask=prob_mask)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((C, T, W), jnp.float32),
        pltpu.VMEM((C, T, W), jnp.float32),
    ]
    if P:
        scratch.append(pltpu.VMEM((P, SH, W), jnp.float32))
    scratch += [
        pltpu.VMEM((C, SH, W), jnp.float32),
        pltpu.VMEM((C, SH, W), jnp.float32),
        pltpu.VMEM((8, 128), jnp.float32),
        pltpu.SMEM((8,), jnp.float32),
        pltpu.SemaphoreType.DMA((8,)),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                         # factor (1,)
        grid=(nstripes,),
        in_specs=[any_spec] * (2 * C + P),
        out_specs=[any_spec] * (2 * C + 1),
        scratch_shapes=scratch,
    )

    hw = jax.ShapeDtypeStruct((H, W), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[hw] * (2 * C) + [jax.ShapeDtypeStruct((8, 128),
                                                         jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # v5e has 100+ MB of usable VMEM; the 16 MB default scoped
            # cap rejects wide-canvas stripes (see iter_step.py)
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(jnp.reshape(factor.astype(jnp.float32), (1,)),
      *fdatas, *fistas, *[p for p in pgrads if p is not None])

    grads = list(outs[:C])
    extraps = list(outs[C:2 * C])
    partials = outs[2 * C]
    sumsq = partials[:C, 0]
    tv = partials[C, 0]
    tv2 = partials[C + 1, 0]
    return grads, extraps, sumsq, tv, tv2
