"""Whole-iteration fused Pallas kernel: gradient phase + projection phase.

One pallas_call per solver iteration (reference: the entire loop body
compute.c:427-453).  The TPU Pallas grid is sequential, so a phased grid

    grid = (NS + NS,)   # NS gradient stripes, then NS projection stripes

gives an exact global barrier between the gradient accumulation and the
normalized step: per-channel sum(grad^2) accumulates in SMEM scratch
across the gradient stripes, and each projection stripe turns it into
the per-channel step scale step/||g|| (compute.c:200-216) without ever
leaving the chip.

The kernel is designed to the HBM-bandwidth roofline of the iteration:

  * the extrapolated iterate and the gradient live in VMEM canvases
    [C, H, W] between the two phases — they never touch HBM.  This is
    what gates the kernel to canvases with 2*4*C*H*W <~ 7 MB (e.g.
    512x512x3); larger images use the two-kernel pipeline
    (kernels/grad_step.py + project_step.py) or the striped multi-chip
    solver.
  * the clamp bounds lo/hi and the prob constants dq/inv_q are derived
    in-kernel from the raw int16 coefficients and the rasterized quant
    tables (lo,hi = data*q -+ q/2, inv_q = 1/q; jpeg.c:86, compute.c:
    323-331), so the per-iteration constant traffic is data (2 B/coef)
    + q (4 B/coef) instead of four f32 rasters (16 B/coef).
  * the prob term crosses iterations at coefficient resolution: the
    projection phase emits devq = (clamp(coefs)-dq)/q^2 [hc, wc] and the
    NEXT iteration's gradient phase expands it to pixel space with the
    tiled bf16x3 matmuls (pgrad = p_alpha*ss * A^T devq B, identical to
    compute.c:38-70 reading aux->cos saved at compute.c:381).

Per-iteration HBM traffic at 512x512 4:2:0 is ~15 MB (f, fista, fnew,
devq carry, int16 coefficients, quant rasters) versus ~34 MB for the
two-kernel pipeline it replaces.

Geometry restrictions (solver falls back otherwise): every channel's
region is the full canvas, H % 64 == 0, W % 128 == 0, each channel's
coef width is a multiple of 128 (or <= 256), and the VMEM canvas gate
above.  Both phases use SH=128 row stripes and a single 128-pixel-row
matmul chunk, so one set of bf16 transform tiles per distinct sampling
factor serves the gradient-phase prob expansion and the projection.

Precision and Mosaic constraints are those of the two parent kernels:
bf16x3 matmuls (see project_step.py docstring), ANY memory space with
manual DMA, 8-row-aligned slices, per-channel 2-D tiles, static-roll
own-row extraction under @pl.when stripe classes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg2png_tpu.kernels.grad_step import (
    _cols2d, _roll, _rows2d, _shift_x, _shift_y)
from jpeg2png_tpu.kernels.project_step import _ab_tiles, _dot3, _split

SH = 128          # stripe height (pixel rows) for both phases
_F32 = jnp.float32


def _kernel(
    scalars_ref,           # scalar-prefetch (2,): [fista factor, step size]
    *refs,
    C, P, H, W, weight, prob_mask, samps, p_alpha_sss, TCs, NS,
):
    """refs layout (inputs, then outputs, then scratch):

    in:  C x f, C x fista, P x devq_in,
         C x data (int16 raster), C x q (f32 raster)      [hc, wc]
         per distinct samp: ah, al, bh, bl                (bf16 tiles)
    out: C x fnew, P x devq_out, partials (8,128)
    scratch: e_can, g_can [C,H,W] (inter-phase canvases);
         ft, fit [C,T,W]; P x dqt [sr,wc]; C x dat_t [sr,wc] i16;
         C x q_t [sr,wc] f32; out_t [C,SH,W]; P x dqo [sr,wc];
         cf_t, dc_t [SH,W]; 4*n_samp bf16 tiles; part_out (8,128);
         acc SMEM (8,); sem DMA (8,).

    acc slots: [sumsq_c for c<C], [C]=tv, [C+1]=tv2, [C+2+pi]=prob_dist
    of prob channel pi (so C + 2 + P <= 8, true for C <= 3).
    """
    n_samp = len(dict.fromkeys(samps))
    it = iter(refs)
    f_hbms = [next(it) for _ in range(C)]
    fi_hbms = [next(it) for _ in range(C)]
    dq_in_hbms = [next(it) for _ in range(P)]
    dat_hbms = [next(it) for _ in range(C)]
    q_hbms = [next(it) for _ in range(C)]
    ab_hbms = [next(it) for _ in range(4 * n_samp)]
    fnew_hbms = [next(it) for _ in range(C)]
    dq_out_hbms = [next(it) for _ in range(P)]
    partial_hbm = next(it)

    e_can = next(it)
    g_can = next(it)
    ft = next(it)
    fit = next(it)
    dqt = [next(it) for _ in range(P)]
    dat_t = [next(it) for _ in range(C)]
    q_t = [next(it) for _ in range(C)]
    out_t = next(it)
    dqo = [next(it) for _ in range(P)]
    cf_t = next(it)
    dc_t = next(it)
    abt = [next(it) for _ in range(4 * n_samp)]
    part_out = next(it)
    acc = next(it)
    sem = next(it)

    samp_idx = {}
    for s in samps:
        if s not in samp_idx:
            samp_idx[s] = len(samp_idx)
    prob_idx = {}
    for c in range(C):
        if prob_mask[c]:
            prob_idx[c] = len(prob_idx)

    i = pl.program_id(0)
    factor = scalars_ref[0]
    step = scalars_ref[1]

    @pl.when(i == 0)
    def _():
        cps = []
        for k in range(4 * n_samp):
            cp = pltpu.make_async_copy(ab_hbms[k], abt[k], sem.at[7])
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()
        for j in range(8):
            acc[j] = jnp.float32(0.0)

    def col_bwd(x, bh_, bl_, TC, sx, wc):
        """x [rows, wc] @ P_c -> writes dc_t[:rows, :W]; returns view."""
        rows = x.shape[0]
        xh, xl = _split(x)
        for tc in range(wc // TC):
            dc_t[:rows, tc * TC * sx:(tc + 1) * TC * sx] = _dot3(
                xh[:, tc * TC:(tc + 1) * TC],
                xl[:, tc * TC:(tc + 1) * TC],
                bh_, bl_, ((1,), (0,)))
        return dc_t[:rows, :]

    # =================== PHASE 0: gradient stripes ===================
    @pl.when(i < NS)
    def _grad_phase():
        T = SH + 16
        r0 = pl.multiple_of(i * SH, 8)
        start = pl.multiple_of(jnp.clip(r0 - 8, 0, H - T), 8)

        cps = []
        for c in range(C):
            cp = pltpu.make_async_copy(
                f_hbms[c].at[pl.ds(start, T), :], ft.at[c], sem.at[0])
            cp.start()
            cps.append(cp)
            cp = pltpu.make_async_copy(
                fi_hbms[c].at[pl.ds(start, T), :], fit.at[c], sem.at[1])
            cp.start()
            cps.append(cp)
        for c, pi in prob_idx.items():
            sy, sx = samps[c]
            sr = SH // sy
            cr0 = pl.multiple_of(i * sr, 8)
            cp = pltpu.make_async_copy(
                dq_in_hbms[pi].at[pl.ds(cr0, sr), :], dqt[pi], sem.at[2])
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()

        rows = _rows2d(start, T, W)
        cols = _cols2d(T, W)

        fl = [None] * C
        gx = [None] * C
        gy = [None] * C
        for c in range(C):
            f = ft[c, :, :]
            fl[c] = f + factor * (f - fit[c, :, :])
            gx[c] = jnp.where(cols < W - 1, _roll(fl[c], -1, 1) - fl[c], 0.0)
            gy[c] = jnp.where(rows < H - 1, _roll(fl[c], -1, 0) - fl[c], 0.0)

        gsq = gx[0] * gx[0] + gy[0] * gy[0]
        for c in range(1, C):
            gsq = gsq + gx[c] * gx[c] + gy[c] * gy[c]
        g_norm = jnp.sqrt(gsq)
        alpha = 1.0 / math.sqrt(C)
        inv = jnp.where(g_norm == 0.0, 0.0, 1.0 / g_norm)

        own = (rows >= r0) & (rows < r0 + SH)
        grad = [None] * C
        for c in range(C):
            a = gx[c] * inv
            b = gy[c] * inv
            grad[c] = (-(a + b) + _shift_x(a, 1)
                       + _shift_y(b, 1, rows, H)) * alpha
        acc[C] = acc[C] + alpha * jnp.sum(jnp.where(own, g_norm, 0.0))

        if weight != 0.0:
            alpha2 = (weight / math.sqrt(2.0)) / math.sqrt(C)
            g_xx = [None] * C
            g_yy = [None] * C
            sym = [None] * C
            n2sq = None
            for c in range(C):
                g_xx[c] = jnp.where(cols >= 1, gx[c] - _shift_x(gx[c], 1),
                                    0.0)
                g_yx = jnp.where(cols >= 1, gy[c] - _shift_x(gy[c], 1), 0.0)
                g_xy = jnp.where(rows >= 1,
                                 gx[c] - _shift_y(gx[c], 1, rows, H), 0.0)
                g_yy[c] = jnp.where(rows >= 1,
                                    gy[c] - _shift_y(gy[c], 1, rows, H), 0.0)
                sym[c] = (g_xy + g_yx) * 0.5
                term = (g_xx[c] * g_xx[c] + 2.0 * sym[c] * sym[c]
                        + g_yy[c] * g_yy[c])
                n2sq = term if n2sq is None else n2sq + term
            n2 = jnp.sqrt(n2sq)
            inv2 = jnp.where(n2 == 0.0, 0.0, 1.0 / n2)
            for c in range(C):
                center = -(2.0 * g_xx[c] + 2.0 * sym[c]
                           + 2.0 * g_yy[c]) * inv2
                p = (g_xx[c] + sym[c]) * inv2
                q = (g_yy[c] + sym[c]) * inv2
                r = -sym[c] * inv2
                g2 = (center
                      + _shift_x(p, -1) + _shift_x(p, 1)
                      + _shift_y(q, -1, rows, H) + _shift_y(q, 1, rows, H)
                      + _shift_x(_shift_y(r, -1, rows, H), 1)
                      + _shift_x(_shift_y(r, 1, rows, H), -1))
                grad[c] = grad[c] + alpha2 * g2
            acc[C + 1] = acc[C + 1] + alpha2 * jnp.sum(
                jnp.where(own, n2, 0.0))

        def emit(off: int):
            for c in range(C):
                g = grad[c] if off == 0 else _roll(grad[c], -off, 0)
                e = fl[c] if off == 0 else _roll(fl[c], -off, 0)
                g_own = g[:SH, :]
                if prob_mask[c]:
                    pi = prob_idx[c]
                    sy, sx = samps[c]
                    k = samp_idx[samps[c]]
                    wc = W // sx
                    # expand devq -> pixel-space prob gradient
                    # (compute.c:38-70: alpha * idct(dev/q^2) replicated)
                    dd = col_bwd(dqt[pi][:, :],
                                 abt[4 * k + 2][:, :], abt[4 * k + 3][:, :],
                                 TCs[c], sx, wc)
                    ddh, ddl = _split(dd)
                    pg = _dot3(abt[4 * k][:, :], abt[4 * k + 1][:, :],
                               ddh, ddl, ((0,), (0,)))
                    g_own = g_own + p_alpha_sss[c] * pg
                g_can[c, pl.ds(r0, SH), :] = g_own
                e_can[c, pl.ds(r0, SH), :] = e[:SH, :]
                acc[c] = acc[c] + jnp.sum(g_own * g_own)

        @pl.when(i == 0)
        def _():
            emit(0)

        if NS > 2:
            @pl.when((i > 0) & (i < NS - 1))
            def _():
                emit(8)

        if NS > 1:
            @pl.when(i == NS - 1)
            def _():
                emit(16)

    # =================== PHASE 1: projection stripes ===================
    @pl.when(i >= NS)
    def _proj_phase():
        j = i - NS
        r0 = pl.multiple_of(j * SH, 8)

        cps = []
        for c in range(C):
            sy, sx = samps[c]
            sr = SH // sy
            cr0 = pl.multiple_of(j * sr, 8)
            cp = pltpu.make_async_copy(
                dat_hbms[c].at[pl.ds(cr0, sr), :], dat_t[c], sem.at[0])
            cp.start()
            cps.append(cp)
            cp = pltpu.make_async_copy(
                q_hbms[c].at[pl.ds(cr0, sr), :], q_t[c], sem.at[1])
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()

        out_cps = []
        for c in range(C):
            sy, sx = samps[c]
            ss = float(sy * sx)
            sr = SH // sy
            wc = W // sx
            k = samp_idx[samps[c]]
            ah_ = abt[4 * k][:, :]
            al_ = abt[4 * k + 1][:, :]
            bh_ = abt[4 * k + 2][:, :]
            bl_ = abt[4 * k + 3][:, :]
            TC = TCs[c]

            sumsq = acc[c]
            scale = jnp.where(sumsq == 0.0, 0.0,
                              step * jax.lax.rsqrt(sumsq))

            fmid = (e_can[c, pl.ds(r0, SH), :]
                    - scale * g_can[c, pl.ds(r0, SH), :])
            fh, fl2 = _split(fmid)
            xr = _dot3(ah_, al_, fh, fl2, ((1,), (0,)))      # [sr, W]
            xrh, xrl = _split(xr)
            for tc in range(wc // TC):
                cf_t[:sr, tc * TC:(tc + 1) * TC] = _dot3(
                    xrh[:, tc * TC * sx:(tc + 1) * TC * sx],
                    xrl[:, tc * TC * sx:(tc + 1) * TC * sx],
                    bh_, bl_, ((1,), (1,)))
            coefs = cf_t[:sr, :wc]

            # in-kernel clamp bounds (jpeg.c:86, compute.c:323-331)
            q = q_t[c][:, :]
            dq = dat_t[c][:, :].astype(_F32) * q
            hq = 0.5 * q
            clamped = jnp.clip(coefs, dq - hq, dq + hq)
            dcv = col_bwd(clamped - coefs, bh_, bl_, TC, sx, wc)
            dch, dcl = _split(dcv)
            back = _dot3(ah_, al_, dch, dcl, ((0,), (0,)))   # [SH, W]
            out_t[c, :, :] = fmid + ss * back

            if prob_mask[c]:
                pi = prob_idx[c]
                iq = 1.0 / q
                devp = (clamped - dq) * iq
                acc[C + 2 + pi] = acc[C + 2 + pi] + 0.5 * jnp.sum(
                    devp * devp)
                dqo[pi][:, :] = devp * iq

            cpo = pltpu.make_async_copy(
                out_t.at[c], fnew_hbms[c].at[pl.ds(r0, SH), :], sem.at[3])
            cpo.start()
            out_cps.append(cpo)
            if prob_mask[c]:
                pi = prob_idx[c]
                cr0 = pl.multiple_of(j * sr, 8)
                cpd = pltpu.make_async_copy(
                    dqo[pi], dq_out_hbms[pi].at[pl.ds(cr0, sr), :],
                    sem.at[4])
                cpd.start()
                out_cps.append(cpd)

        @pl.when(i == 2 * NS - 1)
        def _():
            vals = jnp.stack([acc[jj] for jj in range(8)])
            part_out[:, :] = jnp.broadcast_to(vals[:, None], (8, 128))
            cpp = pltpu.make_async_copy(part_out, partial_hbm, sem.at[5])
            cpp.start()
            cpp.wait()

        for cp in out_cps:
            cp.wait()


def _tcs(W: int, samps) -> tuple:
    """Per-channel coef-space column tile width."""
    out = []
    for sy, sx in samps:
        wc = W // sx
        out.append(128 if wc % 128 == 0 else wc)
    return tuple(out)


def supports(C: int, H: int, W: int, samps, geoms_full_canvas: bool) -> bool:
    """Geometry gate for the fused-iteration kernel."""
    if not geoms_full_canvas or C + 2 + C > 8:
        return False
    if H % SH or W % 128 or H < SH + 16:
        return False
    # extrap+grad canvases must fit comfortably in VMEM
    if 2 * 4 * C * H * W > 7 * 1024 * 1024:
        return False
    for sy, sx in samps:
        if SH % (8 * sy) or W % sx:
            return False
        # coef-space column tiles are lane slices of VMEM scratch, which
        # Mosaic requires to be 128-lane aligned (project_step.supports)
        if (W // sx) % 128:
            return False
    return True


def fused_iteration(fdatas, fistas, devqs, factor, step_size,
                    datas_i16, q_rs, p_alpha_sss, samps, weight):
    """Run one full solver iteration as a single Pallas kernel.

    Args:
        fdatas, fistas: per-channel [H, W] f32 lists (full canvas).
        devqs: per-PROB-channel [hc, wc] f32 list — (clamped-dq)/q^2 from
            the previous projection (zeros at iteration 0).
        factor: traced FISTA extrapolation factor.
        step_size: static or traced step (radius/sqrt(1+iterations)).
        datas_i16: per-channel [hc, wc] int16 rasterized coefficients.
        q_rs: per-channel [hc, wc] f32 rasterized quant tables.
        p_alpha_sss: per-channel static float p_alpha*sy*sx (0 = no prob).
        samps: per-channel (sy, sx).
        weight: static TGV2 weight.
    Returns:
        (fnews list, devqs_out list, tv, tv2, dists [P], sumsq [C])
    """
    C = len(fdatas)
    H, W = fdatas[0].shape
    assert H % SH == 0 and H >= SH + 16, (H, SH)
    prob_mask = tuple(pa != 0.0 for pa in p_alpha_sss)
    P = sum(prob_mask)
    NS = H // SH
    TCs = _tcs(W, samps)

    uniq = list(dict.fromkeys(samps))
    n_samp = len(uniq)
    ab_consts = []
    ab_shapes = []
    for (sy, sx) in uniq:
        wc = W // sx
        tc = 128 if wc % 128 == 0 else wc
        ah, al_, bh, bl_ = _ab_tiles(SH, sy, tc, sx)
        for m in (ah, al_, bh, bl_):
            ab_consts.append(jnp.asarray(m))
            ab_shapes.append(m.shape)

    kernel = functools.partial(
        _kernel, C=C, P=P, H=H, W=W, weight=float(weight),
        prob_mask=prob_mask, samps=tuple(samps),
        p_alpha_sss=tuple(float(p) for p in p_alpha_sss),
        TCs=TCs, NS=NS)

    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    n_in = 2 * C + P + 2 * C + 4 * n_samp
    n_out = C + P + 1

    T = SH + 16
    scratch = [
        pltpu.VMEM((C, H, W), _F32),          # e_can
        pltpu.VMEM((C, H, W), _F32),          # g_can
        pltpu.VMEM((C, T, W), _F32),          # ft
        pltpu.VMEM((C, T, W), _F32),          # fit
    ]
    pi = 0
    for c in range(C):
        if prob_mask[c]:
            sy, sx = samps[c]
            scratch.append(pltpu.VMEM((SH // sy, W // sx), _F32))  # dqt
            pi += 1
    for c in range(C):
        sy, sx = samps[c]
        scratch.append(pltpu.VMEM((SH // sy, W // sx), jnp.int16))  # dat_t
    for c in range(C):
        sy, sx = samps[c]
        scratch.append(pltpu.VMEM((SH // sy, W // sx), _F32))       # q_t
    scratch.append(pltpu.VMEM((C, SH, W), _F32))   # out_t
    for c in range(C):
        if prob_mask[c]:
            sy, sx = samps[c]
            scratch.append(pltpu.VMEM((SH // sy, W // sx), _F32))  # dqo
    scratch += [
        pltpu.VMEM((SH, W), _F32),            # cf_t
        pltpu.VMEM((SH, W), _F32),            # dc_t
    ]
    for shp in ab_shapes:
        scratch.append(pltpu.VMEM(shp, jnp.bfloat16))
    scratch += [
        pltpu.VMEM((8, 128), _F32),           # part_out
        pltpu.SMEM((8,), _F32),
        pltpu.SemaphoreType.DMA((8,)),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2 * NS,),
        in_specs=[any_spec] * n_in,
        out_specs=[any_spec] * n_out,
        scratch_shapes=scratch,
    )

    hw = jax.ShapeDtypeStruct((H, W), _F32)
    dq_shapes = [jax.ShapeDtypeStruct(d.shape, _F32) for d in devqs]
    out_shape = ([hw] * C + dq_shapes
                 + [jax.ShapeDtypeStruct((8, 128), _F32)])

    scalars = jnp.stack([
        jnp.asarray(factor, _F32),
        jnp.asarray(step_size, _F32),
    ])

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(scalars, *fdatas, *fistas, *devqs, *datas_i16, *q_rs, *ab_consts)

    fnews = list(outs[:C])
    devqs_out = list(outs[C:C + P])
    partials = outs[C + P]
    sumsq = partials[:C, 0]
    tv = partials[C, 0]
    tv2 = partials[C + 1, 0]
    dists = [partials[C + 2 + pi, 0] for pi in range(P)]
    return fnews, devqs_out, tv, tv2, dists, sumsq
