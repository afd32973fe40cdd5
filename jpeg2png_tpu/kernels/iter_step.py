"""Whole-solve fused Pallas kernel: the entire FISTA loop in VMEM.

The reference's entire hot loop (compute.c:427-453) runs as a SINGLE
pallas_call with a sequential 2-D grid

    grid = (nsteps, NS + NS)   # iterations x (grad stripes, proj stripes)

and — the load-bearing design point — the ENTIRE solver state lives in
VMEM for the whole solve.  TPU v5e exposes on the order of 100+ MB of
VMEM (the oft-quoted 16 MB is only the compiler's default scoped-vmem
cap), which comfortably holds the three [C, H, W] canvases (iterate,
FISTA shadow, gradient), the coefficient-resolution prob carry, and the
int16 coefficients + quant rasters for canvases up to ~2 MP.  HBM is
touched exactly three times per solve: initial staging in, per-iteration
(8,128) metrics rows out, and the final state out.  Per-iteration HBM
traffic is ZERO — every previous design (4-launch pipeline ~34 MB/iter,
HBM-carry mega-kernel ~15 MB/iter) was bounded by it.

Within one iteration the phased inner grid gives an exact global
barrier between the gradient accumulation and the normalized step:
per-channel sum(grad^2) accumulates in SMEM scratch across the gradient
stripes, and each projection stripe turns it into the per-channel step
scale step/||g|| (compute.c:200-216).  The FISTA "pointer swap"
(compute.c:437-439) is two in-place VMEM row updates per projection
stripe: fista_rows <- f_rows, f_rows <- projected.  The per-iteration
extrapolation factors arrive as a scalar-prefetch array since the
t-sequence is closed-form.  There is no lax.scan, no per-iteration
launch, no DMA wait on any per-stripe path.

Other design points:

  * the extrapolated iterate is never materialized: the projection
    phase recomputes e = f + factor*(f - fista) from the VMEM canvases
    (2 VPU ops) instead of a third canvas.
  * the clamp bounds lo/hi and the prob constants dq/inv_q are derived
    in-kernel from the raw int16 coefficients and the rasterized quant
    tables (lo,hi = data*q -+ q/2, inv_q = 1/q; jpeg.c:86, compute.c:
    323-331), staged into VMEM once per solve.
  * the prob term crosses iterations at coefficient resolution:
    projection writes devq = (clamp(coefs)-dq)/q^2 rows in VMEM and the
    next iteration's gradient phase expands them to pixel space with
    tiled bf16x3 matmuls (pgrad = p_alpha*ss * A^T devq B, identical to
    compute.c:38-70 reading aux->cos saved at compute.c:381).
  * all DCT/resample matmuls are 128-tiled block-diagonal bf16x3 MXU
    products with f32 accumulation (see project_step.py docstring).

Geometry: fused_solve zero-pads any block-aligned canvas to the
128-aligned shape the kernel needs (see _pad_shape); the only real
gates are the VMEM state budget (~1.9 MP at C=3) and a padding-waste
cap for tiny images.  Both phases use stripe_h(W) row stripes
(128, dropping to 64 in the wide-lane regime — see stripe_h).

Mosaic constraints: ANY memory space with manual DMA at the staging
edges, 8-row-aligned dynamic VMEM slices, per-channel 2-D tiles,
static-roll own-row extraction under @pl.when stripe classes.
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

_F32 = jnp.float32


def stripe_h(w_pad: int) -> int:
    """Stripe height for both kernel phases, by PADDED canvas width.

    128 in the narrow regime; 64 once rows exceed 8 lane-tiles —
    measured (round 2): with SH=128 tiles, canvases combining TGV2 +
    >= 1 MP + W > 1024 run ~2x slower per pixel (512x2048: 289
    us/(MP*iter)); with SH=64 tiles the penalty vanishes entirely
    (148, equal to the W=1024 rate).  The TGV2 stencil's ~20 live
    [SH+16, W] temporaries apparently cross a Mosaic codegen resource
    at tile sizes around 128x2048; halving the stripe keeps every
    stripe tile under it."""
    return 64 if w_pad > 1024 else 128


def _kernel(
    factors_ref,           # scalar-prefetch [nsteps] FISTA factors
    *refs,                 # [extents (2,) i32 prefetch when dynamic]
    C, P, H, W, H_true, W_true, weight, prob_mask, samps, p_alpha_sss,
    TCs, NS, step, nsteps, dynamic, SH, lite=False,
):
    """refs layout (inputs, then outputs, then scratch):

    in:  C x f0, C x fista0, P x devq0,
         C x data (int16 raster), C x q (f32 raster)      [hc, wc]
         per distinct samp: ah, al, bh, bl                (bf16 tiles)
    out: C x fdata, C x fista, P x devq, metrics [nsteps, 8, 128]
    scratch: f_can, fi_can, g_can [C,H,W] (whole-solve canvases);
         P x devq_v [hc,wc]; C x dat_t [sr,wc] i16 + C x q_t [sr,wc]
         (coef constants stream per projection stripe from HBM —
         keeping them VMEM-resident pressured the allocator at large
         canvases and capped the size gate);
         cf_t, dc_t [SH,W]; 4*n_samp bf16 tiles; part_out (8,128);
         acc SMEM (8,); sem DMA (8,).

    acc slots: [sumsq_c for c<C], [C]=tv, [C+1]=tv2, [C+2+pi]=prob_dist
    of prob channel pi (so C + 2 + P <= 8, true for C <= 3).
    """
    n_samp = len(dict.fromkeys(samps))
    rit = iter(refs)
    extents_ref = next(rit) if dynamic else None
    step_ref = next(rit) if dynamic else None
    f0_hbms = [next(rit) for _ in range(C)]
    fi0_hbms = [next(rit) for _ in range(C)]
    dq0_hbms = [next(rit) for _ in range(P)]
    dat_hbms = [next(rit) for _ in range(C)]
    q_hbms = [next(rit) for _ in range(C)]
    ab_hbms = [next(rit) for _ in range(4 * n_samp)]
    f_out_hbms = [next(rit) for _ in range(C)]
    fi_out_hbms = [next(rit) for _ in range(C)]
    dq_out_hbms = [next(rit) for _ in range(P)]
    metrics_hbm = next(rit)

    f_can = next(rit)
    fi_can = next(rit)
    g_can = next(rit)
    devq_v = [next(rit) for _ in range(P)]
    dat_t = [next(rit) for _ in range(C)]
    q_t = [next(rit) for _ in range(C)]
    cf_t = next(rit)
    dc_t = next(rit)
    abt = [next(rit) for _ in range(4 * n_samp)]
    part_out = next(rit)
    acc = next(rit)
    sem = next(rit)

    samp_idx = {}
    for s in samps:
        if s not in samp_idx:
            samp_idx[s] = len(samp_idx)
    prob_idx = {}
    for c in range(C):
        if prob_mask[c]:
            prob_idx[c] = len(prob_idx)

    it = pl.program_id(0)     # iteration index
    k = pl.program_id(1)      # stripe index within the iteration
    factor = factors_ref[it]
    T = SH + 16
    # true image extents: compile-time constants normally; runtime
    # scalars in dynamic-extent (bucketed serving) mode, where one
    # compiled kernel serves every image padded to this bucket shape
    ht = extents_ref[0] if dynamic else H_true
    wt = extents_ref[1] if dynamic else W_true
    step_v = step_ref[0] if dynamic else step

    # ---- one-time staging: whole state HBM -> VMEM ----
    @pl.when((it == 0) & (k == 0))
    def _():
        cps = []
        for kk in range(4 * n_samp):
            cp = pltpu.make_async_copy(ab_hbms[kk], abt[kk], sem.at[7])
            cp.start()
            cps.append(cp)
        for c in range(C):
            for src, dst, si in ((f0_hbms[c], f_can.at[c], 0),
                                 (fi0_hbms[c], fi_can.at[c], 1)):
                cp = pltpu.make_async_copy(src, dst, sem.at[si])
                cp.start()
                cps.append(cp)
        for pi in range(P):
            cp = pltpu.make_async_copy(dq0_hbms[pi], devq_v[pi],
                                       sem.at[4])
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()

    @pl.when(k == 0)
    def _():
        for j in range(8):
            acc[j] = jnp.float32(0.0)

    def col_bwd(x, bh_, TC, sx, wc):
        """x [rows, wc] @ P_c -> writes dc_t[:rows, :W]; returns view.

        Single-pass bf16: every input routed here is a small-magnitude
        correction (clamp overshoot, bounded by the box radius q/2, or
        devq = dev/q^2 <= 1/(2q)), where bf16's 2^-8 RELATIVE error is
        absolutely negligible and exact zeros (the unclamped/padded
        majority) stay exact.  The forward DCT of the full-magnitude
        iterate stays 3-pass bf16x3 — measured on the 512x512 fixture,
        this fwd-exact/bwd-fast split converges to 68.96 dB vs the
        reference binary, indistinguishable from all-3-pass (68.96;
        all-2-pass drops to 64.2, all-1-pass to 54.9), while cutting
        MXU passes per iteration 18 -> 10 (+12% headline: 6,387 ->
        7,160 MP*iter/s)."""
        rows = x.shape[0]
        xb = x.astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        for tc in range(wc // TC):
            dc_t[:rows, tc * TC * sx:(tc + 1) * TC * sx] = (
                jax.lax.dot_general(
                    xb[:, tc * TC:(tc + 1) * TC], bh_, dn,
                    preferred_element_type=_F32))
        return dc_t[:rows, :]

    # =================== PHASE 0: gradient stripes ===================
    # The stencil is instantiated per stripe class (top edge / interior
    # / bottom edge) so that y-direction edge masks only exist where the
    # image edge is actually inside the window; the static own-row
    # offset also turns the own-row extraction and the norm reductions
    # into static slices.  Tile-boundary roll wraparound lands >= 6 rows
    # outside the own-row window (stencil reach 2 < halo 8), so interior
    # stripes need no y masks at all.
    @pl.when(k < NS)
    def _grad_phase():
        r0 = pl.multiple_of(k * SH, 8)
        start = pl.multiple_of(jnp.clip(r0 - 8, 0, H - T), 8)

        rows = _rows2d(start, T, W)
        cols = _cols2d(T, W)

        def stencil_emit(top: bool, bot: bool, off: int):
            """Gradient stencil + writeback; top/bot say whether the
            window contains image row 0 / row H-1."""
            def sh_y(a, d):
                if (d > 0 and not top) or (d < 0 and not bot):
                    return _roll(a, d, 0)
                return _shift_y(a, d, rows, ht)

            fl = [None] * C
            gx = [None] * C
            gy = [None] * C
            for c in range(C):
                f = f_can[c, pl.ds(start, T), :]
                if lite:
                    # lite: fi_can holds the bf16 FISTA DIFFERENCE
                    # d = f - fista, so e = f + factor*d directly
                    fl[c] = f + factor * fi_can[
                        c, pl.ds(start, T), :].astype(_F32)
                else:
                    fl[c] = f + factor * (
                        f - fi_can[c, pl.ds(start, T), :])
                gx[c] = jnp.where(cols < wt - 1,
                                  _roll(fl[c], -1, 1) - fl[c], 0.0)
                dy = _roll(fl[c], -1, 0) - fl[c]
                gy[c] = (jnp.where(rows < ht - 1, dy, 0.0)
                         if bot else dy)

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
                grad[c] = (-(a + b) + _shift_x(a, 1) + sh_y(b, 1)) * alpha
            acc[C] = acc[C] + alpha * jnp.sum(g_norm[off:off + SH, :])

            if weight != 0.0:
                alpha2 = (weight / math.sqrt(2.0)) / math.sqrt(C)
                g_xx = [None] * C
                g_yy = [None] * C
                sym = [None] * C
                n2sq = None
                for c in range(C):
                    g_xx[c] = jnp.where(cols >= 1,
                                        gx[c] - _shift_x(gx[c], 1), 0.0)
                    g_yx = jnp.where(cols >= 1,
                                     gy[c] - _shift_x(gy[c], 1), 0.0)
                    if dynamic or W_true < W:
                        # canvas padding: the x-diff of gy at pad col
                        # wt is a spurious -gy[wt-1]; the straight
                        # diffs are already zero there because gx/gy
                        # themselves are edge-masked
                        g_yx = jnp.where(cols < wt, g_yx, 0.0)
                    dxy = gx[c] - sh_y(gx[c], 1)
                    dyy = gy[c] - sh_y(gy[c], 1)
                    if top:
                        dxy = jnp.where(rows >= 1, dxy, 0.0)
                        dyy = jnp.where(rows >= 1, dyy, 0.0)
                    if bot and (dynamic or H_true < H):
                        # same in y: the y-diff of gx at pad row ht is
                        # a spurious -gx[ht-1]
                        dxy = jnp.where(rows < ht, dxy, 0.0)
                        dyy = jnp.where(rows < ht, dyy, 0.0)
                    g_xy = dxy
                    g_yy[c] = dyy
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
                          + sh_y(q, -1) + sh_y(q, 1)
                          + _shift_x(sh_y(r, -1), 1)
                          + _shift_x(sh_y(r, 1), -1))
                    grad[c] = grad[c] + alpha2 * g2
                acc[C + 1] = acc[C + 1] + alpha2 * jnp.sum(
                    n2[off:off + SH, :])

            pad_mask = None
            if dynamic or H_true < H or W_true < W:
                # the TGV2 gather legitimately reads boundary values
                # into the first pad row/col (the reference's scatter
                # would land out of bounds there); zero the gradient
                # outside the true canvas so padding stays exactly 0
                # (subsampled projection would otherwise keep its
                # footprint residual) and the global norm stays clean
                rows_own = (jax.lax.broadcasted_iota(
                    jnp.int32, (SH, W), 0) + r0)
                cols_own = jax.lax.broadcasted_iota(
                    jnp.int32, (SH, W), 1)
                pad_mask = (rows_own < ht) & (cols_own < wt)
            for c in range(C):
                g_own = grad[c][off:off + SH, :]
                if pad_mask is not None:
                    g_own = jnp.where(pad_mask, g_own, 0.0)
                if prob_mask[c]:
                    pi = prob_idx[c]
                    sy, sx = samps[c]
                    kk = samp_idx[samps[c]]
                    wc = W // sx
                    sr = SH // sy
                    cr0 = pl.multiple_of(k * sr, 8)
                    # expand devq -> pixel-space prob gradient
                    # (compute.c:38-70: alpha * idct(dev/q^2) replicated)
                    dd = col_bwd(devq_v[pi][pl.ds(cr0, sr), :],
                                 abt[4 * kk + 2][:, :],
                                 TCs[c], sx, wc)
                    pg = jax.lax.dot_general(
                        abt[4 * kk][:, :], dd.astype(jnp.bfloat16),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=_F32)
                    g_own = g_own + p_alpha_sss[c] * pg
                if lite:
                    g_can[c, pl.ds(r0, SH), :] = g_own.astype(
                        jnp.bfloat16)
                else:
                    g_can[c, pl.ds(r0, SH), :] = g_own
                acc[c] = acc[c] + jnp.sum(g_own * g_own)

        # group stripes by static (top, bottom-edge, own-row-offset)
        # config.  A stripe needs the bottom-edge masks whenever its
        # halo WINDOW contains the true image's last row — not only
        # when its own rows do: when the image height is stripe-aligned
        # and the canvas is padded, the first all-padding stripe's halo
        # reaches back into real data, and without masks its stencil
        # would manufacture spurious diffs across the pad boundary.
        # In dynamic-extent mode the edge position is a runtime value,
        # so every stripe carries the bottom-edge masks.
        configs = {}
        for kk in range(NS):
            off = 0 if kk == 0 else (16 if kk == NS - 1 else 8)
            if dynamic:
                bot_kk = True
            else:
                start_kk = min(max(kk * SH - 8, 0), H - T)
                bot_kk = start_kk <= H_true - 1 < start_kk + T
            key = (kk == 0, bot_kk, off)
            configs.setdefault(key, []).append(kk)
        for (top, bot, off), ks in configs.items():
            pred = (k == ks[0])
            for kk in ks[1:]:
                pred = pred | (k == kk)

            @pl.when(pred)
            def _(top=top, bot=bot, off=off):
                stencil_emit(top, bot, off)

    # =================== PHASE 1: projection stripes ===================
    @pl.when(k >= NS)
    def _proj_phase():
        j = k - NS
        r0 = pl.multiple_of(j * SH, 8)

        cps_in = []
        for c in range(C):
            sy, _sx = samps[c]
            sr = SH // sy
            cr0 = pl.multiple_of(j * sr, 8)
            cp = pltpu.make_async_copy(
                dat_hbms[c].at[pl.ds(cr0, sr), :], dat_t[c], sem.at[2])
            cp.start()
            cps_in.append(cp)
            cp = pltpu.make_async_copy(
                q_hbms[c].at[pl.ds(cr0, sr), :], q_t[c], sem.at[3])
            cp.start()
            cps_in.append(cp)
        for cp in cps_in:
            cp.wait()

        for c in range(C):
            sy, sx = samps[c]
            ss = float(sy * sx)
            sr = SH // sy
            wc = W // sx
            cr0 = pl.multiple_of(j * sr, 8)
            kk = samp_idx[samps[c]]
            ah_ = abt[4 * kk][:, :]
            al_ = abt[4 * kk + 1][:, :]
            bh_ = abt[4 * kk + 2][:, :]
            bl_ = abt[4 * kk + 3][:, :]
            TC = TCs[c]

            sumsq = acc[c]
            scale = jnp.where(sumsq == 0.0, 0.0,
                              step_v * jax.lax.rsqrt(sumsq))

            # recompute the extrapolated iterate from the canvases
            # (compute.c:431-440) and take the normalized step
            fv = f_can[c, pl.ds(r0, SH), :]
            if lite:
                ev = fv + factor * fi_can[
                    c, pl.ds(r0, SH), :].astype(_F32)
            else:
                ev = fv + factor * (fv - fi_can[c, pl.ds(r0, SH), :])
            fmid = ev - scale * g_can[c, pl.ds(r0, SH), :].astype(_F32)
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
            dcv = col_bwd(clamped - coefs, bh_, TC, sx, wc)
            back = jax.lax.dot_general(                       # [SH, W]
                ah_, dcv.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())), preferred_element_type=_F32)

            # FISTA swap, in place (compute.c:437-439); lite stores
            # the new difference fnew - f instead of the old iterate
            fnew = fmid + ss * back
            if lite:
                fi_can[c, pl.ds(r0, SH), :] = (fnew - fv).astype(
                    jnp.bfloat16)
            else:
                fi_can[c, pl.ds(r0, SH), :] = fv
            f_can[c, pl.ds(r0, SH), :] = fnew

            if prob_mask[c]:
                pi = prob_idx[c]
                # q == 0 marks canvas padding (real tables reject zeros,
                # jpeg.c:42) and q >= 2^39 the FREE region-gap sentinel;
                # both must contribute EXACTLY zero to the prob term
                # (the two-kernel tier zeroes its padded iq the same way)
                from jpeg2png_tpu.kernels.project_step import (
                    FREE_Q_MIN)
                iq = jnp.where((q > 0.0) & (q < FREE_Q_MIN),
                               1.0 / q, 0.0)
                devp = (clamped - dq) * iq
                acc[C + 2 + pi] = acc[C + 2 + pi] + 0.5 * jnp.sum(
                    devp * devp)
                dv = devp * iq
                devq_v[pi][pl.ds(cr0, sr), :] = (
                    dv.astype(jnp.bfloat16) if lite else dv)

        @pl.when(k == 2 * NS - 1)
        def _():
            vals = jnp.stack([acc[jj] for jj in range(8)])
            part_out[:, :] = jnp.broadcast_to(vals[:, None], (8, 128))
            cpp = pltpu.make_async_copy(part_out, metrics_hbm.at[it],
                                        sem.at[5])
            cpp.start()
            cpp.wait()

        # ---- final staging: whole state VMEM -> HBM ----
        @pl.when((it == nsteps - 1) & (k == 2 * NS - 1))
        def _():
            cps = []
            for c in range(C):
                for src, dst, si in ((f_can.at[c], f_out_hbms[c], 0),
                                     (fi_can.at[c], fi_out_hbms[c], 1)):
                    cp = pltpu.make_async_copy(src, dst, sem.at[si])
                    cp.start()
                    cps.append(cp)
            for pi in range(P):
                cp = pltpu.make_async_copy(devq_v[pi], dq_out_hbms[pi],
                                           sem.at[2])
                cp.start()
                cps.append(cp)
            for cp in cps:
                cp.wait()


def _tcs(W: int, samps) -> tuple:
    """Per-channel coef-space column tile width.

    Always 128: _pad_shape pads W to 128*max_sx and legal JPEG w_samps
    divide max_sx, so every channel's coef width is a 128-multiple.
    Enforced here because the kernel hard-codes 128-wide B tiles
    (_ab_tiles(SH, sy, 128, sx)) — a non-128 tile would mismatch the
    _dot3 contraction shapes at trace time."""
    for sy, sx in samps:
        assert (W // sx) % 128 == 0, (W, sx)
    return tuple(128 for _ in samps)


def _pad_shape(H: int, W: int, samps):
    """Padded canvas (H_pad, W_pad): the canvas is zero-padded so all
    stripes/tiles are 128-aligned; padded coefficients carry quant 0,
    whose lo == hi == 0 boxes freeze the padded pixels at exactly 0
    (they start 0, get 0 gradient — edge masks sever the coupling at
    the true image border — and re-project to 0)."""
    max_sx = max(sx for _, sx in samps)
    wq = 128 * max_sx
    W_pad = -(-W // wq) * wq
    sh = stripe_h(W_pad)
    H_pad = -(-H // sh) * sh
    if H_pad < sh + 16:
        H_pad += sh
    return H_pad, W_pad


def _geom_ok(C: int, H: int, W: int, samps,
             geoms_full_canvas: bool) -> bool:
    if not geoms_full_canvas or C + 2 + C > 8:
        return False
    if H % 8 or W % 8:
        return False
    for sy, sx in samps:
        if 64 % (8 * sy) or W % sx or H % sy:
            return False
    return True


def supports_lite(C: int, H: int, W: int, samps,
                  geoms_full_canvas: bool) -> bool:
    """Gate for the LITE whole-solve kernel: bf16 fista-difference,
    bf16 gradient and bf16 devq canvases shrink the per-pixel VMEM
    state from 12 B/channel to 8 (+2 B/coef), extending zero-HBM
    whole-solves to ~3.7 MP at 4:2:0.  Numerics: the bf16 canvases
    store GRADIENT-CLASS quantities (the step direction and the FISTA
    momentum difference), whose ~2^-9 relative rounding acts as tiny
    subgradient noise — the iterate itself stays f32 and the
    projection re-clamps every iteration, so convergence holds (gated
    by PSNR/objective vs the two-kernel tier in tests.tpu_checks).
    Only used when the full-precision kernel's gate fails."""
    if not _geom_ok(C, H, W, samps, geoms_full_canvas):
        return False
    H_pad, W_pad = _pad_shape(H, W, samps)
    state = ((4 + 2 + 2) * C * H_pad * W_pad
             + 2 * sum((H_pad // sy) * (W_pad // sx)
                       for sy, sx in samps))
    # spill cliff is ~100 MB of resident state (CLAUDE.md probe)
    if state > 97 * 1024 * 1024:
        return False
    if H_pad * W_pad > 4 * H * W:
        return False
    return True


def supports(C: int, H: int, W: int, samps, geoms_full_canvas: bool) -> bool:
    """Geometry gate for the fused-solve kernel (H, W = TRUE canvas)."""
    if not _geom_ok(C, H, W, samps, geoms_full_canvas):
        return False
    H_pad, W_pad = _pad_shape(H, W, samps)
    # whole-solve VMEM budget: three f32 canvases + the devq carry
    # (4 B/coef, worst case all channels prob-enabled; the int16 data
    # and quant rasters stream per stripe) + ~12 MB for stencil
    # temporaries and tiles (SH<=64 in the wide regime keeps them
    # small), against ~124 MB of physical v5e VMEM.  Probed round 2:
    # 2.21 MP (state ~95 MB) runs at full speed (387 us/iter traced,
    # ~5,700 MP*iter/s — the ~8400 once quoted here was harness noise);
    # 2.43 MP (~103 MB) starts spilling (~4700) but still well beats
    # the two-kernel tier; beyond this gate it would degrade past it.
    canvases = 3 * 4 * C * H_pad * W_pad
    consts = sum(4 * (H_pad // sy) * (W_pad // sx) for sy, sx in samps)
    if canvases + consts + 12 * 1024 * 1024 > 118 * 1024 * 1024:
        return False
    # tiny images: padding waste makes the XLA path competitive anyway
    if H_pad * W_pad > 4 * H * W:
        return False
    return True


def fused_solve(f0s, fista0s, devq0s, factors, step_size,
                datas_i16, q_rs, p_alpha_sss, samps, weight,
                extents=None, lite=False):
    """Run `nsteps = len(factors)` solver iterations in ONE kernel.

    Args:
        f0s, fista0s: per-channel [H, W] f32 lists (full canvas).
        devq0s: per-PROB-channel [hc, wc] f32 — (clamped-dq)/q^2 carry
            (zeros for a fresh start: the prob term then contributes
            exactly zero on iteration 0, like cos seeded with data*quant
            at compute.c:279-286).
        factors: [nsteps] f32 array of FISTA extrapolation factors
            (factor 0 at a fresh iteration 0; compute.c:431-440).
        step_size: radius/sqrt(1+iterations) — static float normally,
            traced scalar in dynamic-extent mode.
        datas_i16: per-channel [hc, wc] int16 rasterized coefficients.
        q_rs: per-channel [hc, wc] f32 rasterized quant tables.
        p_alpha_sss: per-channel static float p_alpha*sy*sx (0 = no prob).
        samps: per-channel (sy, sx).
        weight: static TGV2 weight.
        extents: optional traced [2] int32 (h_true, w_true) — dynamic-
            extent mode for bucketed serving: inputs must already be at
            an aligned bucket shape (the caller pads and builds the
            FREE/FROZEN quant raster), and ONE compiled kernel serves
            every image in the bucket regardless of its true size.
    Returns:
        (fdatas list [H,W], fistas list, devqs_out list,
         partials [nsteps, 8]) where partials columns are
        [sumsq_0..C-1, tv, tv2, dist_p0, dist_p1, ...] per iteration.
    """
    C = len(f0s)
    H_true, W_true = f0s[0].shape
    dynamic = extents is not None
    if dynamic:
        H, W = H_true, W_true   # caller already padded to the bucket
        SH = stripe_h(W)
        assert H % SH == 0 and H >= SH + 16 and W % 128 == 0, (H, W)
    else:
        H, W = _pad_shape(H_true, W_true, samps)
        SH = stripe_h(W)
    prob_mask = tuple(pa != 0.0 for pa in p_alpha_sss)
    P = sum(prob_mask)
    NS = H // SH
    TCs = _tcs(W, samps)
    nsteps = factors.shape[0]

    def pad_to(x, h, w):
        ph, pw = h - x.shape[0], w - x.shape[1]
        return x if ph == 0 and pw == 0 else jnp.pad(x, ((0, ph), (0, pw)))

    coef_true_shapes = [d.shape for d in datas_i16]
    if not dynamic and (H, W) != (H_true, W_true):
        f0s = [pad_to(f, H, W) for f in f0s]
        fista0s = [pad_to(f, H, W) for f in fista0s]
        padded_coef = [(H // sy, W // sx) for sy, sx in samps]
        datas_i16 = [pad_to(d, *padded_coef[c])
                     for c, d in enumerate(datas_i16)]
        q_rs = [pad_to(q, *padded_coef[c]) for c, q in enumerate(q_rs)]
        prob_cs = [c for c in range(C) if prob_mask[c]]
        devq0s = [pad_to(d, *padded_coef[prob_cs[pi]])
                  for pi, d in enumerate(devq0s)]

    if lite:
        # the kernel carries the FISTA state as the bf16 difference
        # d = f - fista and the prob carry in bf16 (supports_lite
        # rationale); the f32 (f, fista, devq) interface is unchanged
        fista0s = [(f - fi).astype(jnp.bfloat16)
                   for f, fi in zip(f0s, fista0s)]
        devq0s = [d.astype(jnp.bfloat16) for d in devq0s]

    uniq = list(dict.fromkeys(samps))
    n_samp = len(uniq)
    ab_consts = []
    ab_shapes = []
    for (sy, sx) in uniq:
        ah, al_, bh, bl_ = _ab_tiles(SH, sy, 128, sx)
        for m in (ah, al_, bh, bl_):
            ab_consts.append(jnp.asarray(m))
            ab_shapes.append(m.shape)

    kernel = functools.partial(
        _kernel, C=C, P=P, H=H, W=W, H_true=int(H_true),
        W_true=int(W_true), weight=float(weight),
        prob_mask=prob_mask, samps=tuple(samps),
        p_alpha_sss=tuple(float(p) for p in p_alpha_sss),
        TCs=TCs, NS=NS,
        step=0.0 if dynamic else float(step_size),
        nsteps=int(nsteps), dynamic=dynamic, SH=SH, lite=lite)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    n_in = 2 * C + P + 2 * C + 4 * n_samp
    n_out = 2 * C + P + 1

    coef_shapes = [d.shape for d in datas_i16]
    side = jnp.bfloat16 if lite else _F32
    scratch = [
        pltpu.VMEM((C, H, W), _F32),          # f_can
        pltpu.VMEM((C, H, W), side),          # fi_can (lite: bf16 diff)
        pltpu.VMEM((C, H, W), side),          # g_can
    ]
    for pi, c in enumerate(c for c in range(C) if prob_mask[c]):
        scratch.append(pltpu.VMEM(coef_shapes[c], side))        # devq_v
    for c in range(C):
        sy, sx = samps[c]
        scratch.append(
            pltpu.VMEM((SH // sy, W // sx), jnp.int16))         # dat_t
    for c in range(C):
        sy, sx = samps[c]
        scratch.append(pltpu.VMEM((SH // sy, W // sx), _F32))   # q_t
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
        num_scalar_prefetch=3 if dynamic else 1,
        grid=(nsteps, 2 * NS),
        in_specs=[any_spec] * n_in,
        out_specs=[any_spec] * n_out,
        scratch_shapes=scratch,
    )

    hw = jax.ShapeDtypeStruct((H, W), _F32)
    side_np = jnp.bfloat16 if lite else _F32
    hw_side = jax.ShapeDtypeStruct((H, W), side_np)
    dq_shapes = [jax.ShapeDtypeStruct(d.shape, side_np) for d in devq0s]
    out_shape = ([hw] * C + [hw_side] * C + dq_shapes
                 + [jax.ShapeDtypeStruct((nsteps, 8, 128), _F32)])

    prefetch = (factors.astype(_F32),)
    if dynamic:
        prefetch += (extents.astype(jnp.int32),
                     jnp.reshape(jnp.asarray(step_size, _F32), (1,)))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # the whole-solve canvases intentionally exceed the 16 MB
            # default scoped-vmem cap; v5e has far more physical VMEM
            vmem_limit_bytes=124 * 1024 * 1024,
        ),
    )(*prefetch, *f0s, *fista0s, *devq0s,
      *datas_i16, *q_rs, *ab_consts)

    fdatas = list(outs[:C])
    fistas = list(outs[C:2 * C])
    devqs_out = list(outs[2 * C:2 * C + P])
    partials = outs[2 * C + P][:, :, 0]        # [nsteps, 8]
    if lite:
        # reconstruct the f32 interface: fista = f - d
        fistas = [f - d.astype(_F32) for f, d in zip(fdatas, fistas)]
        devqs_out = [d.astype(_F32) for d in devqs_out]

    if not dynamic and (H, W) != (H_true, W_true):
        # crop the zero padding back off (it stayed exactly 0)
        fdatas = [f[:H_true, :W_true] for f in fdatas]
        fistas = [f[:H_true, :W_true] for f in fistas]
        prob_cs = [c for c in range(C) if prob_mask[c]]
        devqs_out = [
            d[:coef_true_shapes[prob_cs[pi]][0],
              :coef_true_shapes[prob_cs[pi]][1]]
            for pi, d in enumerate(devqs_out)]
    return fdatas, fistas, devqs_out, partials


def fista_factors(t0, nsteps: int):
    """[nsteps] extrapolation factors from FISTA momentum t0
    (compute.c:427-440: factor 0 on the first iteration when t0 == 1).

    Returns (factors [nsteps], t_final)."""
    def step(t, _):
        tnext = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) / 2.0
        return tnext, (t - 1.0) / tnext

    t_final, factors = jax.lax.scan(
        step, jnp.asarray(t0, _F32), None, length=nsteps)
    return factors, t_final


def fused_iteration(fdatas, fistas, devqs, factor, step_size,
                    datas_i16, q_rs, p_alpha_sss, samps, weight):
    """Single-iteration wrapper over fused_solve (used by parity tests).

    Returns:
        (fnews list, devqs_out list, tv, tv2, dists [P], sumsq [C])
    """
    C = len(fdatas)
    factors = jnp.reshape(jnp.asarray(factor, _F32), (1,))
    fnews, _, devqs_out, partials = fused_solve(
        fdatas, fistas, devqs, factors, step_size,
        datas_i16, q_rs, p_alpha_sss, samps, weight)
    P = len(devqs_out)
    row = partials[0]
    sumsq = row[:C]
    tv = row[C]
    tv2 = row[C + 1]
    dists = [row[C + 2 + pi] for pi in range(P)]
    return fnews, devqs_out, tv, tv2, dists, sumsq
