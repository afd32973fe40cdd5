"""Striped (multi-chip) fused FISTA-extrapolation + TV/TGV2 gradient.

The per-device half of the spatially-sharded solver (parallel/
stripes.py): each device owns a contiguous band of L rows of every
channel and runs THIS kernel on it, so striped multi-chip solves get
fused-kernel per-chip throughput instead of the pure-XLA ops tier
(round-1 VERDICT item 1).  The global couplings of the reference
algorithm stay outside as XLA collectives:

  * the TV/TGV2 stencil needs rows from the neighbouring bands — the
    caller ppermutes an 8-row halo of f and fista along the "y" mesh
    axis (8, not the stencil's 2, because HBM DMA row slices must be
    8-aligned) and passes them in as separate halo arrays;
  * the step normalization is GLOBAL over the whole image
    (compute.c:200-216) — this kernel returns the band's LOCAL
    sum(grad^2) / tv / tv2 partials and the caller psums them.

Design relative to kernels/grad_step.py (the single-chip variant):
the halo arrays make EVERY stripe an interior stripe — the DMA window
for band stripe k is simply rows [k*SH-8, k*SH+SH+8), with the first /
last 8 rows sourced from the halo arrays at the band edges — so the
own-row offset is the constant 8 and there are no stripe classes.  The
price is that the global-edge masks key on the band's global row
offset `row0 = axis_index("y") * L`, a traced scalar, so they are
runtime masks on every stripe (the same regime as the dynamic-extent
mode of kernels/iter_step.py).  Under shard_map every device runs this
one uniform program (SPMD).

Canvas padding follows the frozen-zero / FREE-sentinel algebra of the
two-kernel tier (kernels/iter_step.py rationale): h_true/w_true are the
TRUE canvas extents within the padded [n*L, W] canvas; the gradient is
zeroed outside them so padding stays exactly 0.

Reference counterparts: compute.c:427-443 (extrapolation + gradient),
compute.c:73-197 (TV/TGV2 scatter, here in gather form).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg2png_tpu.kernels.grad_step import (
    _cols2d, _expand_devq, _roll, _rows2d, _shift_x, _shift_y,
    _stencil_terms)

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def _kernel(
    factor_ref,            # scalar-prefetch (1,) f32 FISTA factor
    row0_ref,              # scalar-prefetch (1,) i32 global band row
    *refs,
    C, P, L, W, HT, WT, SH, weight, NS, prob_mask,
):
    """refs layout:
    in:  C x f [L,W], C x fista [L,W], P x pgrad [L,W],
         C x f_top [8,W], C x f_bot [8,W],
         C x fi_top [8,W], C x fi_bot [8,W]
    out: C x grad [L,W], C x extrap [L,W], partials (8,128)
    scratch: f_t [C,T,W], fi_t [C,T,W], pg_t [P,SH,W],
         g_out [C,SH,W], e_out [C,SH,W], part_out (8,128),
         acc SMEM (8,), sem DMA (8,).

    acc slots: [sumsq_c for c < C], [C]=tv, [C+1]=tv2.
    """
    it = iter(refs)
    f_hbms = [next(it) for _ in range(C)]
    fi_hbms = [next(it) for _ in range(C)]
    pg_hbms = [next(it) for _ in range(P)]
    ftop_hbms = [next(it) for _ in range(C)]
    fbot_hbms = [next(it) for _ in range(C)]
    fitop_hbms = [next(it) for _ in range(C)]
    fibot_hbms = [next(it) for _ in range(C)]
    grad_hbms = [next(it) for _ in range(C)]
    extrap_hbms = [next(it) for _ in range(C)]
    partial_hbm = next(it)
    f_t = next(it)
    fi_t = next(it)
    pg_t = next(it) if P else None
    g_out = next(it)
    e_out = next(it)
    part_out = next(it)
    acc = next(it)
    sem = next(it)

    k = pl.program_id(0)
    T = SH + 16
    r0 = pl.multiple_of(k * SH, 8)      # first own band row
    factor = factor_ref[0]
    row0 = row0_ref[0]

    @pl.when(k == 0)
    def _():
        for j in range(8):
            acc[j] = jnp.float32(0.0)

    # ---- stage the halo-extended window [r0-8, r0+SH+8) into VMEM ----
    # band-interior rows come from f/fista; the 8 rows beyond either
    # band edge come from the ppermuted halo arrays.  All slice offsets
    # are 8-aligned (SH % 8 == 0).  Each branch starts ALL its copies
    # then waits them (waits must live in the same @pl.when as their
    # starts — a wait on a never-started DMA blocks forever).
    def run_dmas(specs):
        cps = []
        for src, dst, si in specs:
            cp = pltpu.make_async_copy(src, dst, sem.at[si])
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()

    def prob_specs():
        return [(pg_hbms[pi].at[pl.ds(r0, SH), :], pg_t.at[pi], 2)
                for pi in range(P)]

    if NS == 1:
        specs = []
        for c in range(C):
            specs += [
                (ftop_hbms[c], f_t.at[c, pl.ds(0, 8), :], 0),
                (f_hbms[c], f_t.at[c, pl.ds(8, SH), :], 0),
                (fbot_hbms[c], f_t.at[c, pl.ds(8 + SH, 8), :], 0),
                (fitop_hbms[c], fi_t.at[c, pl.ds(0, 8), :], 1),
                (fi_hbms[c], fi_t.at[c, pl.ds(8, SH), :], 1),
                (fibot_hbms[c], fi_t.at[c, pl.ds(8 + SH, 8), :], 1),
            ]
        run_dmas(specs + prob_specs())
    else:
        @pl.when(k == 0)
        def _():
            specs = []
            for c in range(C):
                specs += [
                    (ftop_hbms[c], f_t.at[c, pl.ds(0, 8), :], 0),
                    (f_hbms[c].at[pl.ds(0, SH + 8), :],
                     f_t.at[c, pl.ds(8, SH + 8), :], 0),
                    (fitop_hbms[c], fi_t.at[c, pl.ds(0, 8), :], 1),
                    (fi_hbms[c].at[pl.ds(0, SH + 8), :],
                     fi_t.at[c, pl.ds(8, SH + 8), :], 1),
                ]
            run_dmas(specs + prob_specs())

        if NS > 2:
            @pl.when((k > 0) & (k < NS - 1))
            def _():
                start = pl.multiple_of(r0 - 8, 8)
                specs = []
                for c in range(C):
                    specs += [
                        (f_hbms[c].at[pl.ds(start, T), :], f_t.at[c], 0),
                        (fi_hbms[c].at[pl.ds(start, T), :], fi_t.at[c], 1),
                    ]
                run_dmas(specs + prob_specs())

        @pl.when(k == NS - 1)
        def _():
            start = pl.multiple_of(r0 - 8, 8)
            specs = []
            for c in range(C):
                specs += [
                    (f_hbms[c].at[pl.ds(start, SH + 8), :],
                     f_t.at[c, pl.ds(0, SH + 8), :], 0),
                    (fbot_hbms[c], f_t.at[c, pl.ds(SH + 8, 8), :], 0),
                    (fi_hbms[c].at[pl.ds(start, SH + 8), :],
                     fi_t.at[c, pl.ds(0, SH + 8), :], 1),
                    (fibot_hbms[c], fi_t.at[c, pl.ds(SH + 8, 8), :], 1),
                ]
            run_dmas(specs + prob_specs())

    # ---- global coordinates of the window rows ----
    # window row i is band row (r0 - 8 + i), global row row0 + that.
    rows = _rows2d(row0 + r0 - 8, T, W)
    cols = _cols2d(T, W)

    # ---- extrapolation (compute.c:431-440) + forward diffs ----
    # halo rows extrapolate with the same global factor, so computing
    # uniformly over the window is exact; ppermute boundary zeros stay
    # zero and the global-row masks drop them anyway.
    fl = [None] * C
    gx = [None] * C
    gy = [None] * C
    for c in range(C):
        f = f_t[c, :, :]
        fl[c] = f + factor * (f - fi_t[c, :, :])
        gx[c] = jnp.where(cols < WT - 1, _roll(fl[c], -1, 1) - fl[c], 0.0)
        gy[c] = jnp.where(rows < HT - 1, _roll(fl[c], -1, 0) - fl[c], 0.0)

    own = slice(8, 8 + SH)

    # ---- TV term (compute.c:73-125, gather form) ----
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
    acc[C] = acc[C] + alpha * jnp.sum(g_norm[own, :])

    # ---- TGV2 term (compute.c:128-197, gather form) ----
    if weight != 0.0:
        alpha2 = (weight / math.sqrt(2.0)) / math.sqrt(C)
        g_xx = [None] * C
        g_yy = [None] * C
        sym = [None] * C
        n2sq = None
        for c in range(C):
            g_xx[c] = jnp.where(cols >= 1, gx[c] - _shift_x(gx[c], 1), 0.0)
            g_yx = jnp.where(cols >= 1, gy[c] - _shift_x(gy[c], 1), 0.0)
            # canvas padding: the x-diff of gy at pad col WT is a
            # spurious -gy[WT-1]; same for the y-diffs of gx/gy at pad
            # row HT (kernels/iter_step.py rationale).  The straight
            # diffs are already zero there (gx/gy are edge-masked).
            g_yx = jnp.where(cols < WT, g_yx, 0.0)
            dxy = jnp.where(rows >= 1,
                            gx[c] - _shift_y(gx[c], 1, rows, HT), 0.0)
            dyy = jnp.where(rows >= 1,
                            gy[c] - _shift_y(gy[c], 1, rows, HT), 0.0)
            g_xy = jnp.where(rows < HT, dxy, 0.0)
            g_yy[c] = jnp.where(rows < HT, dyy, 0.0)
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
        acc[C + 1] = acc[C + 1] + alpha2 * jnp.sum(n2[own, :])

    # ---- own-rows writeback ----
    # zero the gradient outside the true canvas (the TGV2 gather reads
    # boundary values into the first pad row/col; padding must stay
    # frozen at exactly 0 and the global norm clean).  NB: the masks
    # are FRESH (SH, W) iotas — sublane-offset slices of the [T, W]
    # iotas crash the Mosaic lowering (array.h limits check).
    rows_own = (jax.lax.broadcasted_iota(jnp.int32, (SH, W), 0)
                + (row0 + r0))
    cols_own = jax.lax.broadcasted_iota(jnp.int32, (SH, W), 1)
    pad_mask = (rows_own < HT) & (cols_own < WT)

    prob_idx = {}
    pi = 0
    for c in range(C):
        if prob_mask[c]:
            prob_idx[c] = pi
            pi += 1

    for c in range(C):
        g_own = jnp.where(pad_mask, grad[c][own, :], 0.0)
        if c in prob_idx:
            g_own = g_own + pg_t[prob_idx[c], :, :]
        g_out[c, :, :] = g_own
        e_out[c, :, :] = fl[c][own, :]
        acc[c] = acc[c] + jnp.sum(g_own * g_own)

    run_dmas(
        [(g_out.at[c], grad_hbms[c].at[pl.ds(r0, SH), :], 3)
         for c in range(C)]
        + [(e_out.at[c], extrap_hbms[c].at[pl.ds(r0, SH), :], 4)
           for c in range(C)])

    @pl.when(k == NS - 1)
    def _():
        vals = jnp.stack([acc[j] for j in range(8)])
        part_out[:, :] = jnp.broadcast_to(vals[:, None], (8, 128))
        cpp = pltpu.make_async_copy(part_out, partial_hbm, sem.at[5])
        cpp.start()
        cpp.wait()


def _pick_stripe(L: int, W: int, C: int) -> int:
    """Largest SH dividing the band height L within the VMEM budget.

    Capped at 64 rows in the wide-lane regime — TGV2 stencil tiles
    around 128x2048 cross a Mosaic codegen resource and run ~2x slower
    per pixel (see kernels/iter_step.stripe_h)."""
    budget = 48 * 1024 * 1024
    cap = 64 if W > 1024 else 256
    for sh in (256, 128, 64, 32, 16, 8):
        if sh > cap or L % sh:
            continue
        if C * (2 * (sh + 16) + 2 * sh) * W * 4 <= budget:
            return sh
    return 0


def supports(C: int, L: int, W: int) -> bool:
    """Geometry gate: band of L rows, W-wide padded canvas."""
    if L % 8 or W % 128:
        return False
    return _pick_stripe(L, W, C) != 0


def fused_grad_striped(fdatas, fistas, pgrads, halos, factor, row0,
                       weight: float, h_true: int, w_true: int):
    """Fused extrapolation + TV/TGV2 gradient for one device's band.

    Args:
        fdatas, fistas: per-channel lists of [L, W] f32 (local band).
        pgrads: per-channel list of [L, W] prob pixel gradients, None
            for channels with pweight 0.
        halos: (f_tops, f_bots, fi_tops, fi_bots) — per-channel lists
            of [8, W] halo rows from the neighbouring bands (ppermute;
            zeros at the global image boundary).
        factor: traced scalar FISTA extrapolation factor.
        row0: traced int32 scalar — global row of the band's first row.
        weight: static TGV2 weight.
        h_true, w_true: static TRUE canvas extents (global).
    Returns:
        (grads list [L,W], extraps list [L,W], sumsq_local [C],
         tv_local, tv2_local) — partials are LOCAL; psum them.
    """
    C = len(fdatas)
    L, W = fdatas[0].shape
    prob_mask = tuple(p is not None for p in pgrads)
    P = sum(prob_mask)
    SH = _pick_stripe(L, W, C)
    assert SH, (L, W)
    NS = L // SH
    T = SH + 16
    f_tops, f_bots, fi_tops, fi_bots = halos

    kernel = functools.partial(
        _kernel, C=C, P=P, L=L, W=W, HT=int(h_true), WT=int(w_true),
        SH=SH, weight=float(weight), NS=NS, prob_mask=prob_mask)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((C, T, W), _F32),
        pltpu.VMEM((C, T, W), _F32),
    ]
    if P:
        scratch.append(pltpu.VMEM((P, SH, W), _F32))
    scratch += [
        pltpu.VMEM((C, SH, W), _F32),
        pltpu.VMEM((C, SH, W), _F32),
        pltpu.VMEM((8, 128), _F32),
        pltpu.SMEM((8,), _F32),
        pltpu.SemaphoreType.DMA((8,)),
    ]

    n_in = 2 * C + P + 4 * C
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NS,),
        in_specs=[any_spec] * n_in,
        out_specs=[any_spec] * (2 * C + 1),
        scratch_shapes=scratch,
    )

    hw = jax.ShapeDtypeStruct((L, W), _F32)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[hw] * (2 * C) + [jax.ShapeDtypeStruct((8, 128), _F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(jnp.reshape(jnp.asarray(factor, _F32), (1,)),
      jnp.reshape(jnp.asarray(row0, jnp.int32), (1,)),
      *fdatas, *fistas, *[p for p in pgrads if p is not None],
      *f_tops, *f_bots, *fi_tops, *fi_bots)

    grads = list(outs[:C])
    extraps = list(outs[C:2 * C])
    partials = outs[2 * C]
    sumsq = partials[:C, 0]
    tv = partials[C, 0]
    tv2 = partials[C + 1, 0]
    return grads, extraps, sumsq, tv, tv2


def _kernel_lite(
    factor_ref,            # scalar-prefetch (1,) f32 FISTA factor
    row0_ref,              # scalar-prefetch (1,) i32 global band row
    *refs,
    C, P, L, W, H2, HT, WT, SH, weight, NS, prob_mask, samps,
    p_alpha_sss, dynamic=False,
):
    """LITE striped variant: bf16 FISTA-difference state + coef-space
    devq prob carry — the two-lite scheme (kernels/grad_step.py
    _kernel_lite) with the striped kernel's halo-extended windows.
    Per-channel band state is f (f32) and d = f - fista (bf16); the
    prob term arrives as the previous projection's (clamped-dq)/q^2
    coefficient carry (band-local rows) and is expanded to the
    pixel-space gradient in-kernel (compute.c:38-70).  Gradients leave
    in bf16 (subgradient-noise rationale: the iterate stays f32 in the
    projection kernel).

    bf16/int16 HBM tiles are (16, 128)-packed, so the halo is 16 rows
    (stencil needs 2) and every DMA row slice is 16-aligned: L % SH,
    SH % 16, and SH % (16*sy) for the devq slices of prob channels.
    Unlike grad_step's single-chip lite kernel there is no partial
    last stripe — the striped canvas pads to full bands.

    refs layout:
    in:  C x f [L,W] f32, C x d [L,W] bf16, P x devq [L/sy,Wc] bf16,
         4*n_samp ab tiles, C x f_top [16,W] f32, C x f_bot,
         C x d_top [16,W] bf16, C x d_bot
    out: C x grad [L,W] bf16, partials (8,128)
    scratch: f_t [C,T,W] f32, d_t [C,T,W] bf16, P x dq_t [SR,Wc] bf16,
         ab VMEMs, dc_t [SH,W] f32, g_out [C,SH,W] bf16, part_out,
         acc SMEM (8,), sem DMA (8,).
    """
    uniq = list(dict.fromkeys(
        samps[c] for c in range(C) if prob_mask[c]))
    n_samp = len(uniq)
    it = iter(refs)
    # dynamic-extent (bucketed serving) mode: the TRUE canvas extents
    # ride in as a third scalar-prefetch array instead of trace-time
    # constants, so one compiled kernel serves every image padded to
    # this bucket shape (kernels/iter_step.py dynamic-mode analog)
    ext_ref = next(it) if dynamic else None
    f_hbms = [next(it) for _ in range(C)]
    d_hbms = [next(it) for _ in range(C)]
    dq_hbms = [next(it) for _ in range(P)]
    ab_hbms = [next(it) for _ in range(4 * n_samp)]
    ftop_hbms = [next(it) for _ in range(C)]
    fbot_hbms = [next(it) for _ in range(C)]
    dtop_hbms = [next(it) for _ in range(C)]
    dbot_hbms = [next(it) for _ in range(C)]
    grad_hbms = [next(it) for _ in range(C)]
    partial_hbm = next(it)
    f_t = next(it)
    d_t = next(it)
    dq_ts = [next(it) for _ in range(P)]
    ab_ts = [next(it) for _ in range(4 * n_samp)]
    dc_t = next(it)
    g_out = next(it)
    part_out = next(it)
    acc = next(it)
    sem = next(it)

    k = pl.program_id(0)
    T = SH + 32
    r0 = pl.multiple_of(k * SH, 16)
    factor = factor_ref[0]
    row0 = row0_ref[0]
    ht = ext_ref[0] if dynamic else HT
    wt = ext_ref[1] if dynamic else WT

    @pl.when(k == 0)
    def _():
        cps = []
        for src, dst in zip(ab_hbms, ab_ts):
            cp = pltpu.make_async_copy(src, dst, sem.at[6])
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()
        for j in range(8):
            acc[j] = jnp.float32(0.0)

    # ---- stage the halo-extended window [r0-16, r0+SH+16) ----
    # band-interior rows from f/d; the 16 rows past either band edge
    # from the ppermuted halo arrays (kernels/stripe_grad._kernel
    # staging pattern, 16-row halos for the bf16 tiling)
    def run_dmas(specs):
        cps = []
        for src, dst, si in specs:
            cp = pltpu.make_async_copy(src, dst, sem.at[si])
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()

    def prob_specs():
        out = []
        for pi, c in enumerate([c for c in range(C) if prob_mask[c]]):
            sy = samps[c][0]
            sr = SH // sy
            out.append((dq_hbms[pi].at[pl.ds(k * sr, sr), :],
                        dq_ts[pi], 2))
        return out

    if NS == 1:
        specs = []
        for c in range(C):
            specs += [
                (ftop_hbms[c], f_t.at[c, pl.ds(0, 16), :], 0),
                (f_hbms[c], f_t.at[c, pl.ds(16, SH), :], 0),
                (fbot_hbms[c], f_t.at[c, pl.ds(16 + SH, 16), :], 0),
                (dtop_hbms[c], d_t.at[c, pl.ds(0, 16), :], 1),
                (d_hbms[c], d_t.at[c, pl.ds(16, SH), :], 1),
                (dbot_hbms[c], d_t.at[c, pl.ds(16 + SH, 16), :], 1),
            ]
        run_dmas(specs + prob_specs())
    else:
        @pl.when(k == 0)
        def _():
            specs = []
            for c in range(C):
                specs += [
                    (ftop_hbms[c], f_t.at[c, pl.ds(0, 16), :], 0),
                    (f_hbms[c].at[pl.ds(0, SH + 16), :],
                     f_t.at[c, pl.ds(16, SH + 16), :], 0),
                    (dtop_hbms[c], d_t.at[c, pl.ds(0, 16), :], 1),
                    (d_hbms[c].at[pl.ds(0, SH + 16), :],
                     d_t.at[c, pl.ds(16, SH + 16), :], 1),
                ]
            run_dmas(specs + prob_specs())

        if NS > 2:
            @pl.when((k > 0) & (k < NS - 1))
            def _():
                start = pl.multiple_of(r0 - 16, 16)
                specs = []
                for c in range(C):
                    specs += [
                        (f_hbms[c].at[pl.ds(start, T), :], f_t.at[c], 0),
                        (d_hbms[c].at[pl.ds(start, T), :], d_t.at[c], 1),
                    ]
                run_dmas(specs + prob_specs())

        @pl.when(k == NS - 1)
        def _():
            start = pl.multiple_of(r0 - 16, 16)
            specs = []
            for c in range(C):
                specs += [
                    (f_hbms[c].at[pl.ds(start, SH + 16), :],
                     f_t.at[c, pl.ds(0, SH + 16), :], 0),
                    (fbot_hbms[c], f_t.at[c, pl.ds(SH + 16, 16), :], 0),
                    (d_hbms[c].at[pl.ds(start, SH + 16), :],
                     d_t.at[c, pl.ds(0, SH + 16), :], 1),
                    (dbot_hbms[c], d_t.at[c, pl.ds(SH + 16, 16), :], 1),
                ]
            run_dmas(specs + prob_specs())

    # ---- stencil on the halo-extended window ----
    # window row i is band row (r0 - 16 + i), global row row0 + that
    rows = _rows2d(row0 + r0 - 16, T, W)
    cols = _cols2d(T, W)
    own_rows = slice(16, 16 + SH)
    win_r = jax.lax.broadcasted_iota(jnp.int32, (T, W), 0)
    own = (win_r >= 16) & (win_r < 16 + SH)

    fl = [None] * C
    for c in range(C):
        fl[c] = (f_t[c, :, :]
                 + factor * d_t[c, :, :].astype(jnp.float32))

    grad, tv_c, tv2_c = _stencil_terms(
        fl, rows, cols, ht, wt, H2, W, weight, own, dynamic=dynamic)
    acc[C] = acc[C] + tv_c
    if tv2_c is not None:
        acc[C + 1] = acc[C + 1] + tv2_c

    # ---- own-rows extraction + devq expansion + bf16 writeback ----
    rows_own = (jax.lax.broadcasted_iota(jnp.int32, (SH, W), 0)
                + (row0 + r0))
    cols_own = jax.lax.broadcasted_iota(jnp.int32, (SH, W), 1)
    pad_mask = (rows_own < ht) & (cols_own < wt)

    prob_idx = {}
    pi = 0
    for c in range(C):
        if prob_mask[c]:
            prob_idx[c] = pi
            pi += 1
    samp_slot = {s: j for j, s in enumerate(uniq)}

    for c in range(C):
        g_own = jnp.where(pad_mask, grad[c][own_rows, :], 0.0)
        if c in prob_idx:
            sy, sx = samps[c]
            kk = samp_slot[samps[c]]
            pg = _expand_devq(
                dq_ts[prob_idx[c]][:, :],
                ab_ts[4 * kk][:, :], ab_ts[4 * kk + 1][:, :],
                ab_ts[4 * kk + 2][:, :], ab_ts[4 * kk + 3][:, :],
                dc_t, SH // sy, W // sx, sx)
            g_own = g_own + p_alpha_sss[c] * pg
        g_out[c, :, :] = g_own.astype(_BF16)
        acc[c] = acc[c] + jnp.sum(g_own * g_own)

    run_dmas([(g_out.at[c], grad_hbms[c].at[pl.ds(r0, SH), :], 3)
              for c in range(C)])

    @pl.when(k == NS - 1)
    def _():
        vals = jnp.stack([acc[j] for j in range(8)])
        part_out[:, :] = jnp.broadcast_to(vals[:, None], (8, 128))
        cpp = pltpu.make_async_copy(part_out, partial_hbm, sem.at[5])
        cpp.start()
        cpp.wait()


def _pick_stripe_lite(L: int | None, W: int, C: int, samps,
                      prob_mask) -> int:
    """Largest SH dividing L with 16-aligned bf16 DMA slices for every
    channel (SH % 16; SH % (16*sy) for prob channels' devq slices),
    under the VMEM budget and the wide-lane 64-row stencil cap.
    L=None skips the divisibility requirement (used to CHOOSE a padded
    band height, see padded_band_height)."""
    budget = 48 * 1024 * 1024
    cap = 64 if W > 1024 else 256
    unit = 16
    for (sy, _), pm in zip(samps, prob_mask):
        if pm:
            unit = math.lcm(unit, 16 * sy)
    for sh in (256, 128, 64, 32, 16):
        if sh > cap or (L is not None and L % sh) or sh % unit:
            continue
        # f32 f/dc_t + bf16 d/g_out tiles
        if (C * (6 * (sh + 32) + 2 * sh) * W + 4 * sh * W) <= budget:
            return sh
    return 0


def padded_band_height(H: int, W: int, C: int, samps,
                       prob_mask) -> int:
    """A padded band height H2 >= H that the lite kernel serves
    (0 if no stripe height fits): the largest admissible stripe height
    whose whole-stripe padding stays within 25%, else the least-padded
    admissible one.  The H2 - H pad rows ride the frozen q == 0
    padding algebra; used by the single-chip two-lite tier, which runs
    this kernel on the whole canvas as one band with zero halos
    (models/solver.py)."""
    budget = 48 * 1024 * 1024
    cap = 64 if W > 1024 else 256
    unit = 16
    for (sy, _), pm in zip(samps, prob_mask):
        if pm:
            unit = math.lcm(unit, 16 * sy)
    fallback = 0
    for sh in (256, 128, 64, 32, 16):
        if sh > cap or sh % unit:
            continue
        if (C * (6 * (sh + 32) + 2 * sh) * W + 4 * sh * W) > budget:
            continue
        H2 = -(-H // sh) * sh
        if 4 * H2 <= 5 * H:
            return H2
        fallback = H2  # least-padded so far (sh descends)
    return fallback


def supports_lite(C: int, L: int, W: int, samps, prob_mask) -> bool:
    """Geometry gate for the lite striped gradient kernel."""
    if L % 16 or W % 128:
        return False
    for (sy, sx), pm in zip(samps, prob_mask):
        if pm and ((W // sx) % 128 or W % sx or L % (16 * sy)):
            return False
    return _pick_stripe_lite(L, W, C, samps, prob_mask) != 0


def fused_grad_striped_lite(fdatas, ds, devqs, halos, factor, row0,
                            weight: float, samps, p_alpha_sss,
                            h_pad: int, h_true: int, w_true: int,
                            extents=None):
    """Lite fused extrapolation + TV/TGV2 gradient for one band.

    Args:
        fdatas: per-channel [L, W] f32 band iterates.
        ds: per-channel [L, W] bf16 FISTA differences d = f - fista.
        devqs: per-PROB-channel [L//sy, W//sx] bf16 coefficient-space
            (clamped-dq)/q^2 carries from the previous projection.
        halos: (f_tops, f_bots, d_tops, d_bots) — per-channel lists of
            [16, W] halo rows from the neighbouring bands (f in f32,
            d in bf16; zeros at the global image boundary).
        factor: traced scalar FISTA extrapolation factor.
        row0: traced int32 global row of the band's first row.
        weight: static TGV2 weight.
        samps: per-channel (sy, sx).
        p_alpha_sss: per-channel static p_alpha*sy*sx (0 = prob off).
        h_true, w_true: static TRUE canvas extents (global).
        extents: optional traced [2] int32 (h_true, w_true) — dynamic-
            extent mode for bucketed serving of two-lite-class images:
            h_true/w_true are ignored and ONE compiled kernel serves
            every image padded to this band shape.
    Returns:
        (grads list of [L, W] bf16, sumsq_local [C], tv_local,
         tv2_local) — partials are LOCAL; psum them.  No extraps
        output: the lite projection recomputes the extrapolation from
        (f, d, factor) in-kernel.
    """
    from jpeg2png_tpu.kernels.project_step import _ab_tiles

    C = len(fdatas)
    L, W = fdatas[0].shape
    prob_mask = tuple(pa != 0.0 for pa in p_alpha_sss)
    P = sum(prob_mask)
    SH = _pick_stripe_lite(L, W, C, samps, prob_mask)
    assert SH, (L, W)
    NS = L // SH
    T = SH + 32
    f_tops, f_bots, d_tops, d_bots = halos
    dynamic = extents is not None

    uniq = list(dict.fromkeys(
        samps[c] for c in range(C) if prob_mask[c]))
    ab_consts = []
    ab_shapes = []
    for (sy, sx) in uniq:
        for m in _ab_tiles(SH, sy, 128, sx):
            ab_consts.append(jnp.asarray(m))
            ab_shapes.append(m.shape)

    kernel = functools.partial(
        _kernel_lite, C=C, P=P, L=L, W=W, H2=int(h_pad),
        HT=0 if dynamic else int(h_true),
        WT=0 if dynamic else int(w_true), SH=SH,
        weight=float(weight), NS=NS,
        prob_mask=prob_mask, samps=tuple(samps),
        p_alpha_sss=tuple(float(p) for p in p_alpha_sss),
        dynamic=dynamic)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((C, T, W), _F32),         # f_t
        pltpu.VMEM((C, T, W), _BF16),        # d_t
    ]
    for c in range(C):
        if prob_mask[c]:
            sy, sx = samps[c]
            scratch.append(
                pltpu.VMEM((SH // sy, W // sx), _BF16))   # dq_t
    for shp in ab_shapes:
        scratch.append(pltpu.VMEM(shp, _BF16))
    scratch += [
        pltpu.VMEM((SH, W), _F32),           # dc_t (expansion)
        pltpu.VMEM((C, SH, W), _BF16),       # g_out
        pltpu.VMEM((8, 128), _F32),
        pltpu.SMEM((8,), _F32),
        pltpu.SemaphoreType.DMA((8,)),
    ]

    n_in = 2 * C + P + 4 * len(uniq) + 4 * C
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if dynamic else 2,
        grid=(NS,),
        in_specs=[any_spec] * n_in,
        out_specs=[any_spec] * (C + 1),
        scratch_shapes=scratch,
    )

    prefetch = (jnp.reshape(jnp.asarray(factor, _F32), (1,)),
                jnp.reshape(jnp.asarray(row0, jnp.int32), (1,)))
    if dynamic:
        prefetch += (extents.astype(jnp.int32),)
    hwb = jax.ShapeDtypeStruct((L, W), _BF16)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[hwb] * C + [jax.ShapeDtypeStruct((8, 128), _F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(*prefetch,
      *fdatas, *ds, *devqs, *ab_consts,
      *f_tops, *f_bots, *d_tops, *d_bots)

    grads = list(outs[:C])
    partials = outs[C]
    sumsq = partials[:C, 0]
    tv = partials[C, 0]
    tv2 = partials[C + 1, 0]
    return grads, sumsq, tv, tv2
