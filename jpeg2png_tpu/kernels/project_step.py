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
    RCc = RC // sy   # coef rows per chunk
    TCs = TC * sx    # pixel columns per coef-column tile
    ss = float(sy * sx)
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

    scale = scale_ref[0]
    ah = ah_t[:, :]
    al = al_t[:, :]
    bh = bh_t[:, :]
    bl = bl_t[:, :]

    def col_fwd(xh, xl):
        """x [RCc, W] (split) @ P_c^T -> [RCc, WC] via cf_t tiles."""
        for tc in range(WC // TC):
            cf_t[:, tc * TC:(tc + 1) * TC] = _dot3(
                xh[:, tc * TCs:(tc + 1) * TCs],
                xl[:, tc * TCs:(tc + 1) * TCs],
                bh, bl, ((1,), (1,)))
        return cf_t[:, :]

    def col_bwd(x):
        """x [RCc, WC] @ P_c -> [RCc, W] via dc_t tiles."""
        xh, xl = _split(x)
        for tc in range(WC // TC):
            dc_t[:, tc * TCs:(tc + 1) * TCs] = _dot3(
                xh[:, tc * TC:(tc + 1) * TC],
                xl[:, tc * TC:(tc + 1) * TC],
                bh, bl, ((1,), (0,)))
        return dc_t[:, :]

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
        dch, dcl = _split(dc)
        back = _dot3(ah, al, dch, dcl, ((0,), (0,)))     # [RC, W]
        out_t[p0:p0 + RC, :] = fmid + ss * back

        if with_prob:
            devp = (clamped - dq_t[c0:c0 + RCc, :]) * iq_t[c0:c0 + RCc, :]
            acc[0] = acc[0] + 0.5 * jnp.sum(devp * devp)
            dd = col_bwd(devp * iq_t[c0:c0 + RCc, :])
            ddh, ddl = _split(dd)
            pgb = _dot3(ah, al, ddh, ddl, ((0,), (0,)))
            pg_t[p0:p0 + RC, :] = scale_ref[1] * pgb

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

    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
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
