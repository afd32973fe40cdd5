"""Fused normalized-step + box-projection + prob-gradient Pallas kernel.

The second half of every solver iteration for one channel (reference:
compute.c:209-216 do_step + :334-404 projection + :38-70 prob term),
fused into a single VMEM-resident pass per row stripe:

    fmid   = extrap - scale * grad                  (normalized step)
    coefs  = A_r @ fmid @ P_c^T                     (mean+DCT matmuls)
    clamp  = clip(coefs, lo, hi)                    (box projection)
    fnew   = fmid + ss * A_r^T (clamp - coefs) P_c  (mean/residual form)
    devp   = (clamp - dq) * inv_q
    dist  += 0.5 * sum(devp^2)                      (next prob_dist)
    pgrad  = p_alpha * ss * A_r^T (devp * inv_q) P_c  (next prob grad)

A_r = I (x) (D @ M_sy), P_c the same over columns (ops/dct_raster.py
algebra).  Both are block-diagonal with an 8x8s repeating block, so
applying them through one dense [K, K*s] matrix wastes ~(K/8)x the
MXU FLOPs on structural zeros.  Instead the kernel walks the stripe in
128-pixel-row chunks and the width in 128-coef-column tiles, applying a
single small constant per side (A: [128/sy, 128], B: [128, 128*sx]) —
every block on the diagonal is the same matrix, so one tile constant
serves the whole image and the matmul FLOPs drop to the structural
minimum at MXU-friendly shapes.

Matmul precision: inputs are split into (hi, lo) bfloat16 pairs and
each product takes 3 MXU passes with f32 accumulation (hi*hi + hi*lo +
lo*hi — the classic bf16x3 scheme, ~1e-5 relative error, half the cost
of the 6-pass `precision=HIGHEST` f32 emulation).  The dropped lo*lo
term is ~2^-18 relative; against clamp boxes of half-width 0.5*quant
(>= 0.5) this is numerically invisible, and the e2e golden-PSNR gates
(tests/test_e2e.py) hold unchanged.

Same Mosaic constraints as kernels/grad_step.py: ANY memory space with
manual DMA everywhere, 8-row-aligned slices, 2-D tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg2png_tpu.ops.dct_raster import _blockdiag_sampled

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def _split(x):
    """f32 -> (hi, lo) bf16 pair with x ~= hi + lo to ~2^-17 relative."""
    hi = x.astype(_BF16)
    lo = (x - hi.astype(_F32)).astype(_BF16)
    return hi, lo


def _dot3(xh, xl, yh, yl, dims):
    """bf16x3 dot_general with f32 accumulation (drops the lo*lo term)."""
    dn = (dims, ((), ()))
    out = jax.lax.dot_general(xh, yh, dn, preferred_element_type=_F32)
    out = out + jax.lax.dot_general(xh, yl, dn, preferred_element_type=_F32)
    out = out + jax.lax.dot_general(xl, yh, dn, preferred_element_type=_F32)
    return out


def _stripe_math(scale, e_t, g_t, lo_t, hi_t, dq_t, iq_t,
                 out_t, pg_t, cf_t, dc_t, ah, al, bh, bl,
                 acc, dist_slot, pa_ss_scale, *,
                 SH, W, WC, sy, sx, RC, TC, with_prob):
    """One channel's stripe: normalized step + box projection (+ prob
    gradient) on the staged VMEM tiles.  Shared by the single- and
    multi-channel kernels; `acc[dist_slot]` accumulates the channel's
    prob distance across stripes."""
    RCc = RC // sy   # coef rows per chunk
    TCs = TC * sx    # pixel columns per coef-column tile
    ss = float(sy * sx)

    def col_fwd(xh, xl):
        """x [RCc, W] (split) @ P_c^T -> [RCc, WC] via cf_t tiles."""
        for tc in range(WC // TC):
            cf_t[:, tc * TC:(tc + 1) * TC] = _dot3(
                xh[:, tc * TCs:(tc + 1) * TCs],
                xl[:, tc * TCs:(tc + 1) * TCs],
                bh, bl, ((1,), (1,)))
        return cf_t[:, :]

    def col_bwd(x):
        """x [RCc, WC] @ P_c -> [RCc, W] via dc_t tiles.

        Single-pass bf16: every input routed here is a small-magnitude
        correction (clamp overshoot, bounded by the box radius q/2, or
        devq = dev/q^2 <= 1/(2q)) where bf16's relative error is
        absolutely negligible and exact zeros (the unclamped majority)
        stay exact — see kernels/iter_step.py col_bwd for the measured
        accuracy evidence (converged PSNR identical to all-3-pass)."""
        xb = x.astype(_BF16)
        dn = (((1,), (0,)), ((), ()))
        for tc in range(WC // TC):
            dc_t[:, tc * TCs:(tc + 1) * TCs] = jax.lax.dot_general(
                xb[:, tc * TC:(tc + 1) * TC], bh, dn,
                preferred_element_type=_F32)
        return dc_t[:, :]

    rb_dn = (((0,), (0,)), ((), ()))   # single-pass bf16 row expansion

    # the projection is independent per 8*sy-row block, so the stripe
    # is processed in RC-pixel-row chunks end-to-end
    for rc in range(SH // RC):
        p0 = rc * RC
        c0 = rc * RCc
        fmid = e_t[p0:p0 + RC, :] - scale * g_t[p0:p0 + RC, :]
        fh, fl = _split(fmid)
        xr = _dot3(ah, al, fh, fl, ((1,), (0,)))        # [RCc, W]
        xrh, xrl = _split(xr)
        coefs = col_fwd(xrh, xrl)                        # [RCc, WC]
        lo = lo_t[c0:c0 + RCc, :]
        hi = hi_t[c0:c0 + RCc, :]
        clamped = jnp.clip(coefs, lo, hi)
        dc = col_bwd(clamped - coefs)                    # [RCc, W]
        back = jax.lax.dot_general(                      # [RC, W]
            ah, dc.astype(_BF16), rb_dn, preferred_element_type=_F32)
        out_t[p0:p0 + RC, :] = fmid + ss * back

        if with_prob:
            devp = (clamped - dq_t[c0:c0 + RCc, :]) * iq_t[c0:c0 + RCc, :]
            acc[dist_slot] = acc[dist_slot] + 0.5 * jnp.sum(devp * devp)
            dd = col_bwd(devp * iq_t[c0:c0 + RCc, :])
            pgb = jax.lax.dot_general(
                ah, dd.astype(_BF16), rb_dn, preferred_element_type=_F32)
            pg_t[p0:p0 + RC, :] = pa_ss_scale * pgb


def _kernel(
    scale_ref,             # scalar-prefetch (2,): [step scale, p_alpha*ss]
    extrap_hbm, grad_hbm,  # ANY [H, W]
    ah_hbm, al_hbm,        # ANY [RCc, RC] bf16 (row-transform tile, hi/lo)
    bh_hbm, bl_hbm,        # ANY [TC, TCs] bf16 (col-transform tile, hi/lo)
    lo_hbm, hi_hbm,        # ANY [hc, wc]
    dq_hbm, iq_hbm,        # ANY [hc, wc]  (absent when prob disabled)
    fnew_hbm,              # out ANY [H, W]
    pgrad_hbm,             # out ANY [H, W]   (when prob enabled)
    dist_hbm,              # out ANY (8, 128) (when prob enabled)
    e_t, g_t,              # VMEM scratch [SH, W]
    ah_t, al_t,            # VMEM scratch [RCc, RC] bf16
    bh_t, bl_t,            # VMEM scratch [TC, TCs] bf16
    lo_t, hi_t, dq_t, iq_t,  # VMEM scratch [SR, WC]
    out_t, pg_t,           # VMEM scratch [SH, W]
    cf_t,                  # VMEM scratch [RCc, WC]  (coefs, per chunk)
    dc_t,                  # VMEM scratch [RCc, W]   (col back-expansion)
    dist_t,                # VMEM scratch (8, 128)
    acc,                   # SMEM scratch (8,)
    sem,                   # DMA semaphores (8,)
    *,
    H, W, SH, SR, WC, sy, sx, RC, TC, with_prob, nstripes,
):
    i = pl.program_id(0)
    r0 = pl.multiple_of(i * SH, 8)
    cr0 = pl.multiple_of(i * SR, 8)   # coef-space row offset

    # constants: stage once, persist in scratch across the (sequential)
    # grid; re-DMA'd only on the first stripe
    @pl.when(i == 0)
    def _():
        cps = []
        for src, dst, si in ((ah_hbm, ah_t, 4), (al_hbm, al_t, 5),
                             (bh_hbm, bh_t, 6), (bl_hbm, bl_t, 7)):
            cp = pltpu.make_async_copy(src, dst, sem.at[si])
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()
        for j in range(8):
            acc[j] = jnp.float32(0.0)

    cps = []
    for src, dst, si in ((extrap_hbm, e_t, 0), (grad_hbm, g_t, 1)):
        cp = pltpu.make_async_copy(src.at[pl.ds(r0, SH), :], dst, sem.at[si])
        cp.start()
        cps.append(cp)
    for src, dst, si in ((lo_hbm, lo_t, 2), (hi_hbm, hi_t, 3),
                         (dq_hbm, dq_t, 6), (iq_hbm, iq_t, 7)):
        if src is None:
            continue
        cp = pltpu.make_async_copy(src.at[pl.ds(cr0, SR), :], dst, sem.at[si])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    _stripe_math(
        scale_ref[0], e_t, g_t, lo_t, hi_t, dq_t, iq_t,
        out_t, pg_t, cf_t, dc_t,
        ah_t[:, :], al_t[:, :], bh_t[:, :], bl_t[:, :],
        acc, 0, scale_ref[1],
        SH=SH, W=W, WC=WC, sy=sy, sx=sx, RC=RC, TC=TC,
        with_prob=with_prob)

    cpo = pltpu.make_async_copy(out_t, fnew_hbm.at[pl.ds(r0, SH), :],
                                sem.at[0])
    cpo.start()

    if with_prob:
        cpg = pltpu.make_async_copy(pg_t, pgrad_hbm.at[pl.ds(r0, SH), :],
                                    sem.at[1])
        cpg.start()

        @pl.when(i == nstripes - 1)
        def _():
            vals = jnp.stack([acc[j] for j in range(8)])
            dist_t[:, :] = jnp.broadcast_to(vals[:, None], (8, 128))
            cpd = pltpu.make_async_copy(dist_t, dist_hbm, sem.at[2])
            cpd.start()
            cpd.wait()

        cpg.wait()
    cpo.wait()


@functools.lru_cache(maxsize=None)
def _ab_tiles(RC: int, sy: int, TC: int, sx: int):
    """(Ah, Al, Bh, Bl) bf16 host constants for the tiled transforms.

    A = I_{RC/(8 sy)} (x) (D @ M_sy): [RC/sy, RC]
    B = I_{TC/8}      (x) (D @ M_sx): [TC, TC*sx]
    """
    a = _blockdiag_sampled(RC // sy, sy, "float64")
    b = _blockdiag_sampled(TC, sx, "float64")

    def split_np(m):
        hi = m.astype(np.float32).astype(jnp.bfloat16)
        lo = (m - np.asarray(hi, np.float64)).astype(
            np.float32).astype(jnp.bfloat16)
        return np.asarray(hi), np.asarray(lo)

    ah, al_ = split_np(a)
    bh, bl_ = split_np(b)
    return ah, al_, bh, bl_


def _chunks(H: int, W: int, SH: int, sy: int, sx: int):
    """(RC, TC): row-chunk pixel height and col-tile coef width."""
    RC = 128 if SH % 128 == 0 else SH
    WC = W // sx
    TC = 128 if WC % 128 == 0 else WC
    return RC, TC


def _pick_stripe(h: int, w: int, sy: int) -> int:
    """Largest SH dividing h, multiple of 8*sy, fitting VMEM."""
    budget = 32 * 1024 * 1024
    for sh in (256, 128, 64, 32, 16, 8):
        if sh % (8 * sy) or h % sh:
            continue
        if 5 * sh * w * 4 <= budget:
            return sh
    return 0


def supports(H: int, W: int, sy: int, sx: int) -> bool:
    if H % 8 or W % 128 or W > 8192:
        return False
    # coef-space column tiles are lane slices of VMEM scratch, which
    # Mosaic requires to be 128-lane aligned — a coef width that is not
    # a multiple of 128 (e.g. chroma of a 128-wide 4:2:0 image) would
    # emit an unsupported memref_slice; those channels use the XLA path
    if (W // sx) % 128:
        return False
    return _pick_stripe(H, W, sy) != 0


def fused_project(extrap, grad, scale, lo, hi, dq, inv_q, p_alpha_ss,
                  sy: int, sx: int):
    """Run the fused step+projection(+prob) kernel for one channel.

    Args:
        extrap, grad: [H, W] float32 (full canvas = channel region).
        scale: traced scalar step_size/norm.
        lo, hi: [hc, wc] rasterized clamp bounds.
        dq, inv_q: [hc, wc] rasterized data*quant and 1/quant, or None
            to disable the prob term.
        p_alpha_ss: static float p_alpha * sy * sx (0 disables prob).
        sy, sx: sampling (footprint) factors.
    Returns:
        (fnew [H,W], pgrad [H,W] or None, prob_dist scalar or 0.0)
    """
    H, W = extrap.shape
    with_prob = p_alpha_ss != 0.0
    SH = _pick_stripe(H, W, sy)
    assert SH, (H, W, sy)
    nstripes = H // SH
    SR = SH // sy
    WC = W // sx
    RC, TC = _chunks(H, W, SH, sy, sx)
    RCc = RC // sy
    TCs = TC * sx

    ah, al_, bh, bl_ = _ab_tiles(RC, sy, TC, sx)
    consts = (jnp.asarray(ah), jnp.asarray(al_),
              jnp.asarray(bh), jnp.asarray(bl_))

    kernel = functools.partial(
        _kernel, H=H, W=W, SH=SH, SR=SR, WC=WC, sy=sy, sx=sx,
        RC=RC, TC=TC, with_prob=with_prob, nstripes=nstripes)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    n_in = 10 if with_prob else 8
    n_out = 3 if with_prob else 1

    scratch = [
        pltpu.VMEM((SH, W), jnp.float32),    # e_t
        pltpu.VMEM((SH, W), jnp.float32),    # g_t
        pltpu.VMEM((RCc, RC), _BF16),        # ah_t
        pltpu.VMEM((RCc, RC), _BF16),        # al_t
        pltpu.VMEM((TC, TCs), _BF16),        # bh_t
        pltpu.VMEM((TC, TCs), _BF16),        # bl_t
        pltpu.VMEM((SR, WC), jnp.float32),   # lo_t
        pltpu.VMEM((SR, WC), jnp.float32),   # hi_t
        pltpu.VMEM((SR, WC), jnp.float32),   # dq_t
        pltpu.VMEM((SR, WC), jnp.float32),   # iq_t
        pltpu.VMEM((SH, W), jnp.float32),    # out_t
        pltpu.VMEM((SH, W), jnp.float32),    # pg_t
        pltpu.VMEM((RCc, WC), jnp.float32),  # cf_t
        pltpu.VMEM((RCc, W), jnp.float32),   # dc_t
        pltpu.VMEM((8, 128), jnp.float32),   # dist_t
        pltpu.SMEM((8,), jnp.float32),
        pltpu.SemaphoreType.DMA((8,)),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nstripes,),
        in_specs=[any_spec] * n_in,
        out_specs=[any_spec] * n_out,
        scratch_shapes=scratch,
    )

    hw = jax.ShapeDtypeStruct((H, W), jnp.float32)
    scalars = jnp.stack([
        scale.astype(jnp.float32),
        jnp.float32(p_alpha_ss),
    ])

    if with_prob:
        fnew, pgrad, dist = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[hw, hw, jax.ShapeDtypeStruct((8, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(scalars, extrap, grad, *consts, lo, hi, dq, inv_q)
        return fnew, pgrad, dist[0, 0]

    fnew, = pl.pallas_call(
        functools.partial(_kernel_adapter, kernel=kernel),
        grid_spec=grid_spec,
        out_shape=[hw],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(scalars, extrap, grad, *consts, lo, hi)
    return fnew, None, jnp.float32(0.0)


def _kernel_adapter(scale_ref, e, g, ah, al_, bh, bl_, l, h, fnew,
                    e_t, g_t, ah_t, al_t, bh_t, bl_t,
                    lo_t, hi_t, dq_t, iq_t,
                    out_t, pg_t, cf_t, dc_t, dist_t, acc, sem, *, kernel):
    """No-prob arity adapter: fills the disabled refs with None."""
    kernel(scale_ref, e, g, ah, al_, bh, bl_, l, h, None, None,
           fnew, None, None,
           e_t, g_t, ah_t, al_t, bh_t, bl_t, lo_t, hi_t, dq_t, iq_t,
           out_t, pg_t, cf_t, dc_t, dist_t, acc, sem)



# ---------------------------------------------------------------------------
# Multi-channel variant: ALL channels' normalized-step + projection + prob
# gradient in ONE pallas_call.  The two-kernel tier and the striped path
# are launch-bound (1 + C dispatches per iteration); merging the C
# projection dispatches makes every iteration exactly 2 launches.
# Reference: compute.c:445-448 — the per-channel projection loop, here a
# static channel loop inside one kernel.
# ---------------------------------------------------------------------------


def _kernel_multi(scales_ref, *refs, H, W, SH, samps, prob_mask,
                  nstripes):
    """refs layout (C channels, P = sum(prob_mask) prob channels):
    in, per channel: e, g, ah, al, bh, bl, lo, hi, [dq, iq]
    out: C x fnew, P x pgrad, dist (8,128) when P > 0
    scratch, per channel: e_t, g_t, ah_t, al_t, bh_t, bl_t, lo_t, hi_t,
        [dq_t, iq_t], out_t, [pg_t], cf_t, dc_t
    then dist_t (8,128) when P, acc SMEM (8,), sem DMA (8,).

    scales_ref: (2C,) scalar prefetch — [scale_c ...] + [pa_ss_c ...].
    acc slot pi accumulates prob channel pi's distance partial.
    """
    C = len(samps)
    n_prob = sum(prob_mask)
    it = iter(refs)
    ins = [[next(it) for _ in range(10 if prob_mask[c] else 8)]
           for c in range(C)]
    fnew_hbms = [next(it) for _ in range(C)]
    pgrad_hbms = [next(it) for _ in range(n_prob)]
    dist_hbm = next(it) if n_prob else None
    scr = [[next(it) for _ in range(14 if prob_mask[c] else 11)]
           for c in range(C)]
    dist_t = next(it) if n_prob else None
    acc = next(it)
    sem = next(it)

    i = pl.program_id(0)
    r0 = pl.multiple_of(i * SH, 8)

    @pl.when(i == 0)
    def _():
        # stage the (tiny) transform constants once; they persist in
        # scratch across the sequential grid
        cps = []
        for c in range(C):
            for j in range(2, 6):     # ah, al, bh, bl
                cp = pltpu.make_async_copy(ins[c][j], scr[c][j],
                                           sem.at[6])
                cp.start()
                cps.append(cp)
        for cp in cps:
            cp.wait()
        for j in range(8):
            acc[j] = jnp.float32(0.0)

    # start ALL channels' stripe DMAs, then wait all (start-all-wait-all
    # — manual prefetch/double-buffering has never won in this Mosaic
    # version; see CLAUDE.md failed experiments)
    cps = []
    for c in range(C):
        sy, _ = samps[c]
        SR = SH // sy
        cr0 = pl.multiple_of(i * SR, 8)
        for j, si in ((0, 0), (1, 1)):               # e, g pixel stripes
            cp = pltpu.make_async_copy(
                ins[c][j].at[pl.ds(r0, SH), :], scr[c][j], sem.at[si])
            cp.start()
            cps.append(cp)
        n_cf = 4 if prob_mask[c] else 2              # lo, hi, [dq, iq]
        for j in range(n_cf):
            cp = pltpu.make_async_copy(
                ins[c][6 + j].at[pl.ds(cr0, SR), :], scr[c][6 + j],
                sem.at[2 + j])
            cp.start()
            cps.append(cp)
    for cp in cps:
        cp.wait()

    pi = 0
    out_cps = []
    for c in range(C):
        sy, sx = samps[c]
        WC = W // sx
        RC, TC = _chunks(H, W, SH, sy, sx)
        with_prob = bool(prob_mask[c])
        if with_prob:
            dq_t, iq_t = scr[c][8], scr[c][9]
            out_t, pg_t = scr[c][10], scr[c][11]
            cf_t, dc_t = scr[c][12], scr[c][13]
        else:
            dq_t = iq_t = pg_t = None
            out_t, cf_t, dc_t = scr[c][8], scr[c][9], scr[c][10]

        _stripe_math(
            scales_ref[c], scr[c][0], scr[c][1], scr[c][6], scr[c][7],
            dq_t, iq_t, out_t, pg_t, cf_t, dc_t,
            scr[c][2][:, :], scr[c][3][:, :],
            scr[c][4][:, :], scr[c][5][:, :],
            acc, pi, scales_ref[C + c],
            SH=SH, W=W, WC=WC, sy=sy, sx=sx, RC=RC, TC=TC,
            with_prob=with_prob)

        cpo = pltpu.make_async_copy(
            out_t, fnew_hbms[c].at[pl.ds(r0, SH), :], sem.at[0])
        cpo.start()
        out_cps.append(cpo)
        if with_prob:
            cpg = pltpu.make_async_copy(
                pg_t, pgrad_hbms[pi].at[pl.ds(r0, SH), :], sem.at[1])
            cpg.start()
            out_cps.append(cpg)
            pi += 1

    if n_prob:
        @pl.when(i == nstripes - 1)
        def _():
            vals = jnp.stack([acc[j] for j in range(8)])
            dist_t[:, :] = jnp.broadcast_to(vals[:, None], (8, 128))
            cpd = pltpu.make_async_copy(dist_t, dist_hbm, sem.at[2])
            cpd.start()
            cpd.wait()

    for cp in out_cps:
        cp.wait()


def _pick_stripe_multi(h: int, w: int, samps) -> int:
    """Largest SH dividing h, multiple of 8*lcm(sy), with every
    channel's scratch resident at once."""
    import math as _math

    budget = 40 * 1024 * 1024
    unit = 8
    for sy, _ in samps:
        unit = _math.lcm(unit, 8 * sy)
    C = len(samps)
    for sh in (256, 128, 64, 32, 16, 8):
        if sh % unit or h % sh:
            continue
        if C * 5 * sh * w * 4 <= budget:
            return sh
    return 0


def supports_multi(H: int, W: int, samps) -> bool:
    """Geometry gate for the one-call multi-channel projection."""
    if any(not supports(H, W, sy, sx) for sy, sx in samps):
        return False
    return _pick_stripe_multi(H, W, samps) != 0


def fused_project_multi(extraps, grads, scales, los, his, dqs, iqs,
                        pa_sss, samps):
    """All channels' normalized-step + projection (+ prob) in one call.

    Args:
        extraps, grads: per-channel [H, W] f32 lists (shared canvas).
        scales: [C] traced step_size/norm vector.
        los, his: per-channel rasterized clamp bounds [H/sy, W/sx].
        dqs, iqs: per-channel data*quant and 1/quant rasters, None for
            channels with the prob term off.
        pa_sss: per-channel static p_alpha * sy * sx (0 = prob off).
        samps: per-channel (sy, sx).
    Returns:
        (fnews list, pgrads list with None for prob-off channels,
         dists [C] — per-channel prob distances, 0.0 where off).
    """
    C = len(extraps)
    H, W = extraps[0].shape
    prob_mask = tuple(p != 0.0 for p in pa_sss)
    n_prob = sum(prob_mask)
    SH = _pick_stripe_multi(H, W, samps)
    assert SH, (H, W, samps)
    nstripes = H // SH

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    operands = []
    n_in = 0
    scratch = []
    for c, (sy, sx) in enumerate(samps):
        SR = SH // sy
        WC = W // sx
        RC, TC = _chunks(H, W, SH, sy, sx)
        RCc = RC // sy
        TCs = TC * sx
        ah, al_, bh, bl_ = _ab_tiles(RC, sy, TC, sx)
        operands += [extraps[c], grads[c],
                     jnp.asarray(ah), jnp.asarray(al_),
                     jnp.asarray(bh), jnp.asarray(bl_),
                     los[c], his[c]]
        scratch += [
            pltpu.VMEM((SH, W), _F32),           # e_t
            pltpu.VMEM((SH, W), _F32),           # g_t
            pltpu.VMEM((RCc, RC), _BF16),        # ah_t
            pltpu.VMEM((RCc, RC), _BF16),        # al_t
            pltpu.VMEM((TC, TCs), _BF16),        # bh_t
            pltpu.VMEM((TC, TCs), _BF16),        # bl_t
            pltpu.VMEM((SR, WC), _F32),          # lo_t
            pltpu.VMEM((SR, WC), _F32),          # hi_t
        ]
        if prob_mask[c]:
            operands += [dqs[c], iqs[c]]
            scratch += [
                pltpu.VMEM((SR, WC), _F32),      # dq_t
                pltpu.VMEM((SR, WC), _F32),      # iq_t
            ]
        scratch += [pltpu.VMEM((SH, W), _F32)]   # out_t
        if prob_mask[c]:
            scratch += [pltpu.VMEM((SH, W), _F32)]   # pg_t
        scratch += [
            pltpu.VMEM((RCc, WC), _F32),         # cf_t
            pltpu.VMEM((RCc, W), _F32),          # dc_t
        ]
        n_in += 10 if prob_mask[c] else 8
    if n_prob:
        scratch += [pltpu.VMEM((8, 128), _F32)]  # dist_t
    scratch += [
        pltpu.SMEM((8,), _F32),
        pltpu.SemaphoreType.DMA((8,)),
    ]

    n_out = C + n_prob + (1 if n_prob else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nstripes,),
        in_specs=[any_spec] * n_in,
        out_specs=[any_spec] * n_out,
        scratch_shapes=scratch,
    )

    hw = jax.ShapeDtypeStruct((H, W), _F32)
    out_shape = [hw] * (C + n_prob)
    if n_prob:
        out_shape += [jax.ShapeDtypeStruct((8, 128), _F32)]

    scalars = jnp.concatenate([
        jnp.asarray(scales, _F32).reshape(-1),
        jnp.asarray(list(pa_sss), _F32),
    ])

    kernel = functools.partial(
        _kernel_multi, H=H, W=W, SH=SH, samps=tuple(samps),
        prob_mask=prob_mask, nstripes=nstripes)

    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(scalars, *operands)

    fnews = list(outs[:C])
    pgrads_flat = list(outs[C:C + n_prob])
    dists = []
    pgrads = []
    pi = 0
    for c in range(C):
        if prob_mask[c]:
            pgrads.append(pgrads_flat[pi])
            # dist_t row j broadcasts acc slot j across the lanes
            dists.append(outs[-1][pi, 0])
            pi += 1
        else:
            pgrads.append(None)
            dists.append(jnp.float32(0.0))
    return fnews, pgrads, dists


# ---------------------------------------------------------------------------
# LITE multi-channel variant: the two-kernel tier's HBM-traffic diet.
# State crossing the kernels is f (f32) + d = f - fista (bf16) + the
# gradient (bf16) + a coef-space devq carry (bf16), and the clamp
# bounds are computed IN-KERNEL from the int16 coefficients and the
# quant raster exactly as the mega kernel does (kernels/iter_step.py:
# q == 0 marks frozen canvas padding, q >= 2^39 the FREE region-gap
# sentinel) — replacing the four streamed f32 lo/hi/dq/iq rasters with
# one int16 + one f32 raster.  Per-iteration HBM traffic at 6.29 MP
# 4:2:0 drops from ~900 MB to ~510 MB.  Numerics follow mega-lite:
# bf16 holds only gradient-class quantities, the iterate stays f32
# (kernels/iter_step.py supports_lite rationale).
# ---------------------------------------------------------------------------

# FREE-sentinel quant pair, the single source of truth: writers mark
# region-gap coefficients with FREE_Q; kernels treat any q >= FREE_Q_MIN
# as an unconstrained box (and q == 0 as frozen canvas padding) — see
# kernels/iter_step.py:433-458 for the algebra.
FREE_Q = 2.0 ** 40
FREE_Q_MIN = 2.0 ** 39
_FREE_Q_MIN = FREE_Q_MIN


def _stripe_math_lite(scale, factor, f_t, d_t, g_t, dat_t, q_t,
                      out_t, dn_t, dq_out_t, cf_t, dc_t,
                      ah, al, bh, bl, acc, dist_slot, *,
                      SH, W, WC, sy, sx, RC, TC, with_prob):
    """One channel's lite stripe: recompute the FISTA extrapolation
    from (f, d), take the normalized step, project onto the in-kernel
    quant boxes, and emit (fnew f32, dnew bf16, devq bf16)."""
    RCc = RC // sy
    TCs = TC * sx
    ss = float(sy * sx)

    def col_fwd(xh, xl):
        for tc in range(WC // TC):
            cf_t[:, tc * TC:(tc + 1) * TC] = _dot3(
                xh[:, tc * TCs:(tc + 1) * TCs],
                xl[:, tc * TCs:(tc + 1) * TCs],
                bh, bl, ((1,), (1,)))
        return cf_t[:, :]

    def col_bwd(x):
        # single-pass bf16 on the clamp correction — see _stripe_math
        xb = x.astype(_BF16)
        dn = (((1,), (0,)), ((), ()))
        for tc in range(WC // TC):
            dc_t[:, tc * TCs:(tc + 1) * TCs] = jax.lax.dot_general(
                xb[:, tc * TC:(tc + 1) * TC], bh, dn,
                preferred_element_type=_F32)
        return dc_t[:, :]

    for rc in range(SH // RC):
        p0 = rc * RC
        c0 = rc * RCc
        fv = f_t[p0:p0 + RC, :]
        ev = fv + factor * d_t[p0:p0 + RC, :].astype(_F32)
        fmid = ev - scale * g_t[p0:p0 + RC, :].astype(_F32)
        fh, fl = _split(fmid)
        xr = _dot3(ah, al, fh, fl, ((1,), (0,)))        # [RCc, W]
        xrh, xrl = _split(xr)
        coefs = col_fwd(xrh, xrl)                        # [RCc, WC]

        # in-kernel clamp bounds (jpeg.c:86, compute.c:323-331):
        # q == 0 freezes canvas padding at 0, q >= 2^39 (FREE) leaves
        # region-gap coefficients unconstrained — same algebra as
        # kernels/iter_step.py:433-437
        q = q_t[c0:c0 + RCc, :]
        dq = dat_t[c0:c0 + RCc, :].astype(_F32) * q
        hq = 0.5 * q
        clamped = jnp.clip(coefs, dq - hq, dq + hq)
        dc = col_bwd(clamped - coefs)                    # [RCc, W]
        back = jax.lax.dot_general(                      # [RC, W]
            ah, dc.astype(_BF16), (((0,), (0,)), ((), ())),
            preferred_element_type=_F32)
        fnew = fmid + ss * back
        out_t[p0:p0 + RC, :] = fnew
        dn_t[p0:p0 + RC, :] = (fnew - fv).astype(_BF16)

        if with_prob:
            iq = jnp.where((q > 0.0) & (q < _FREE_Q_MIN), 1.0 / q, 0.0)
            devp = (clamped - dq) * iq
            acc[dist_slot] = acc[dist_slot] + 0.5 * jnp.sum(devp * devp)
            dq_out_t[c0:c0 + RCc, :] = (devp * iq).astype(_BF16)


def _kernel_multi_lite(scales_ref, *refs, H, W, SH, samps, prob_mask,
                       nstripes):
    """refs layout (C channels, P = sum(prob_mask)):
    in, per channel: f, d, g, ah, al, bh, bl, dat (i16), q (f32)
    out: C x fnew (f32), C x dnew (bf16), P x devq (bf16), dist (8,128)
        when P > 0
    scratch, per channel: f_t, d_t, g_t, ab x4, dat_t, q_t, out_t,
        dn_t, [dq_out_t], cf_t, dc_t; then dist_t when P, acc SMEM,
        sem DMA.

    scales_ref: (C+1,) scalar prefetch — [scale_c ...] + [factor].
    """
    C = len(samps)
    n_prob = sum(prob_mask)
    it = iter(refs)
    ins = [[next(it) for _ in range(9)] for _ in range(C)]
    fnew_hbms = [next(it) for _ in range(C)]
    dnew_hbms = [next(it) for _ in range(C)]
    dq_hbms = [next(it) for _ in range(n_prob)]
    dist_hbm = next(it) if n_prob else None
    scr = [[next(it) for _ in range(14 if prob_mask[c] else 13)]
           for c in range(C)]
    dist_t = next(it) if n_prob else None
    acc = next(it)
    sem = next(it)

    i = pl.program_id(0)
    r0 = pl.multiple_of(i * SH, 16)
    factor = scales_ref[C]

    @pl.when(i == 0)
    def _():
        cps = []
        for c in range(C):
            for j in range(3, 7):     # ah, al, bh, bl
                cp = pltpu.make_async_copy(ins[c][j], scr[c][j],
                                           sem.at[6])
                cp.start()
                cps.append(cp)
        for cp in cps:
            cp.wait()
        for j in range(8):
            acc[j] = jnp.float32(0.0)

    cps = []
    for c in range(C):
        sy, _ = samps[c]
        SR = SH // sy
        cr0 = pl.multiple_of(i * SR, 16)
        for j, si in ((0, 0), (1, 1), (2, 2)):       # f, d, g stripes
            cp = pltpu.make_async_copy(
                ins[c][j].at[pl.ds(r0, SH), :], scr[c][j], sem.at[si])
            cp.start()
            cps.append(cp)
        for j, si in ((7, 3), (8, 4)):               # dat, q
            cp = pltpu.make_async_copy(
                ins[c][j].at[pl.ds(cr0, SR), :], scr[c][j],
                sem.at[si])
            cp.start()
            cps.append(cp)
    for cp in cps:
        cp.wait()

    pi = 0
    out_cps = []
    for c in range(C):
        sy, sx = samps[c]
        SR = SH // sy
        cr0 = pl.multiple_of(i * SR, 16)
        WC = W // sx
        RC, TC = _chunks(H, W, SH, sy, sx)
        with_prob = bool(prob_mask[c])
        out_t = scr[c][9]
        dn_t = scr[c][10]
        if with_prob:
            dq_out_t, cf_t, dc_t = scr[c][11], scr[c][12], scr[c][13]
        else:
            dq_out_t = None
            cf_t, dc_t = scr[c][11], scr[c][12]

        _stripe_math_lite(
            scales_ref[c], factor, scr[c][0], scr[c][1], scr[c][2],
            scr[c][7], scr[c][8], out_t, dn_t, dq_out_t, cf_t, dc_t,
            scr[c][3][:, :], scr[c][4][:, :],
            scr[c][5][:, :], scr[c][6][:, :],
            acc, pi,
            SH=SH, W=W, WC=WC, sy=sy, sx=sx, RC=RC, TC=TC,
            with_prob=with_prob)

        cpo = pltpu.make_async_copy(
            out_t, fnew_hbms[c].at[pl.ds(r0, SH), :], sem.at[0])
        cpo.start()
        out_cps.append(cpo)
        cpd = pltpu.make_async_copy(
            dn_t, dnew_hbms[c].at[pl.ds(r0, SH), :], sem.at[1])
        cpd.start()
        out_cps.append(cpd)
        if with_prob:
            cpq = pltpu.make_async_copy(
                dq_out_t, dq_hbms[pi].at[pl.ds(cr0, SR), :], sem.at[2])
            cpq.start()
            out_cps.append(cpq)
            pi += 1

    if n_prob:
        @pl.when(i == nstripes - 1)
        def _():
            vals = jnp.stack([acc[j] for j in range(8)])
            dist_t[:, :] = jnp.broadcast_to(vals[:, None], (8, 128))
            cpd2 = pltpu.make_async_copy(dist_t, dist_hbm, sem.at[5])
            cpd2.start()
            cpd2.wait()

    for cp in out_cps:
        cp.wait()


def _pick_stripe_multi_lite(h: int, w: int, samps) -> int:
    """Largest SH dividing h with 16-aligned slices for every channel
    (bf16/int16 HBM tiles are (16, 128)-packed: pixel slices need
    SH % 16, coef slices SH % (16*sy)) and every channel's scratch
    resident at once.

    Tall stripes are deliberate: the grid is DMA-descriptor-bound
    (per-grid-step descriptor builds dominate at large canvases — the
    hbm_iter lesson, CLAUDE.md), and the projection walks each stripe
    in 128-row chunks internally so the matmul tile sizes don't grow
    with SH."""
    import math as _math

    budget = 64 * 1024 * 1024
    unit = 16
    for sy, _ in samps:
        unit = _math.lcm(unit, 16 * sy)
    C = len(samps)
    for sh in (512, 256, 128, 64, 32, 16):
        if sh % unit or h % sh:
            continue
        # f32 f/out/cf/dc + bf16 d/g/dn ~ 14 B/px + coef tiles
        if C * 16 * sh * w <= budget:
            return sh
    return 0


def supports_multi_lite(H: int, W: int, samps) -> bool:
    """Geometry gate for the lite one-call multi-channel projection."""
    if H % 16:
        return False
    if any(not supports(H, W, sy, sx) for sy, sx in samps):
        return False
    return _pick_stripe_multi_lite(H, W, samps) != 0


def fused_project_multi_lite(fdatas, ds, grads, factor, scales,
                             datas_i16, q_rs, pa_sss, samps):
    """All channels' lite normalized-step + projection in one call.

    Args:
        fdatas: per-channel [H, W] f32 iterates (shared canvas).
        ds: per-channel [H, W] bf16 FISTA differences.
        grads: per-channel [H, W] bf16 gradients (fused_grad_lite).
        factor: traced scalar FISTA extrapolation factor.
        scales: [C] traced step_size/norm vector.
        datas_i16: per-channel [H//sy, W//sx] int16 coefficient
            rasters (zero in padding).
        q_rs: per-channel [H//sy, W//sx] f32 quant rasters — 0 in
            frozen canvas padding, >= 2^40 (FREE) in region gaps.
        pa_sss: per-channel static p_alpha*sy*sx (0 = prob off).
        samps: per-channel (sy, sx).
    Returns:
        (fnews f32 list, dnews bf16 list, devqs list with None for
         prob-off channels, dists [C] — 0.0 where prob off).
    """
    C = len(fdatas)
    H, W = fdatas[0].shape
    prob_mask = tuple(p != 0.0 for p in pa_sss)
    n_prob = sum(prob_mask)
    SH = _pick_stripe_multi_lite(H, W, samps)
    assert SH, (H, W, samps)
    nstripes = H // SH

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    operands = []
    scratch = []
    for c, (sy, sx) in enumerate(samps):
        SR = SH // sy
        WC = W // sx
        RC, TC = _chunks(H, W, SH, sy, sx)
        RCc = RC // sy
        TCs = TC * sx
        ah, al_, bh, bl_ = _ab_tiles(RC, sy, TC, sx)
        operands += [fdatas[c], ds[c], grads[c],
                     jnp.asarray(ah), jnp.asarray(al_),
                     jnp.asarray(bh), jnp.asarray(bl_),
                     datas_i16[c], q_rs[c]]
        scratch += [
            pltpu.VMEM((SH, W), _F32),           # f_t
            pltpu.VMEM((SH, W), _BF16),          # d_t
            pltpu.VMEM((SH, W), _BF16),          # g_t
            pltpu.VMEM((RCc, RC), _BF16),        # ah_t
            pltpu.VMEM((RCc, RC), _BF16),        # al_t
            pltpu.VMEM((TC, TCs), _BF16),        # bh_t
            pltpu.VMEM((TC, TCs), _BF16),        # bl_t
            pltpu.VMEM((SR, WC), jnp.int16),     # dat_t
            pltpu.VMEM((SR, WC), _F32),          # q_t
            pltpu.VMEM((SH, W), _F32),           # out_t
            pltpu.VMEM((SH, W), _BF16),          # dn_t
        ]
        if prob_mask[c]:
            scratch += [pltpu.VMEM((SR, WC), _BF16)]  # dq_out_t
        scratch += [
            pltpu.VMEM((RCc, WC), _F32),         # cf_t
            pltpu.VMEM((RCc, W), _F32),          # dc_t
        ]
    if n_prob:
        scratch += [pltpu.VMEM((8, 128), _F32)]  # dist_t
    scratch += [
        pltpu.SMEM((8,), _F32),
        pltpu.SemaphoreType.DMA((8,)),
    ]

    n_out = 2 * C + n_prob + (1 if n_prob else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nstripes,),
        in_specs=[any_spec] * (9 * C),
        out_specs=[any_spec] * n_out,
        scratch_shapes=scratch,
    )

    hw = jax.ShapeDtypeStruct((H, W), _F32)
    hwb = jax.ShapeDtypeStruct((H, W), _BF16)
    out_shape = [hw] * C + [hwb] * C
    for c in range(C):
        if prob_mask[c]:
            sy, sx = samps[c]
            out_shape.append(jax.ShapeDtypeStruct(
                (H // sy, W // sx), _BF16))
    if n_prob:
        out_shape += [jax.ShapeDtypeStruct((8, 128), _F32)]

    scalars = jnp.concatenate([
        jnp.asarray(scales, _F32).reshape(-1),
        jnp.reshape(factor.astype(_F32), (1,)),
    ])

    kernel = functools.partial(
        _kernel_multi_lite, H=H, W=W, SH=SH, samps=tuple(samps),
        prob_mask=prob_mask, nstripes=nstripes)

    # donate the carry canvases: f -> fnew and d -> dnew reuse the
    # input buffers, eliminating XLA's per-iteration while-carry copies
    # (~340 us/iter at 6.29 MP).  Input indices count the
    # scalar-prefetch operand (index 0), so channel c's f is 1 + 9c.
    aliases = {}
    for c in range(C):
        aliases[1 + 9 * c] = c          # f -> fnew
        aliases[2 + 9 * c] = C + c      # d -> dnew
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(scalars, *operands)

    fnews = list(outs[:C])
    dnews = list(outs[C:2 * C])
    dq_flat = list(outs[2 * C:2 * C + n_prob])
    devqs = []
    dists = []
    pi = 0
    for c in range(C):
        if prob_mask[c]:
            devqs.append(dq_flat[pi])
            dists.append(outs[-1][pi, 0])
            pi += 1
        else:
            devqs.append(None)
            dists.append(jnp.float32(0.0))
    return fnews, dnews, devqs, dists
