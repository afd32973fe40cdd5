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

A_r = I (x) (D @ M_sy) over the stripe rows, P_c the same over the full
width (ops/dct_raster.py algebra); both are passed in as constants and
staged to VMEM once.  All matmuls hit the MXU; there are no layout
shuffles, and the whole second half of the iteration is one kernel
launch per channel instead of ~8 XLA ops each.

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

_PREC = jax.lax.Precision.HIGHEST


def _kernel(
    scale_ref,             # scalar-prefetch (2,): [step scale, p_alpha*ss]
    extrap_hbm, grad_hbm,  # ANY [H, W]
    ar_hbm,                # ANY [SR, SH]  (A_r for one stripe)
    pc_hbm,                # ANY [WC, W]   (P_c over the full width)
    lo_hbm, hi_hbm,        # ANY [hc, wc]
    dq_hbm, iq_hbm,        # ANY [hc, wc]  (absent when prob disabled)
    fnew_hbm,              # out ANY [H, W]
    pgrad_hbm,             # out ANY [H, W]   (when prob enabled)
    dist_hbm,              # out ANY (8, 128) (when prob enabled)
    e_t, g_t,              # VMEM scratch [SH, W]
    ar_t,                  # VMEM scratch [SR, SH]
    pc_t,                  # VMEM scratch [WC, W]
    lo_t, hi_t, dq_t, iq_t,  # VMEM scratch [SR, WC]
    out_t, pg_t,           # VMEM scratch [SH, W]
    dist_t,                # VMEM scratch (8, 128)
    acc,                   # SMEM scratch (8,)
    sem,                   # DMA semaphores (8,)
    *,
    H, W, SH, SR, WC, sy, sx, with_prob, nstripes,
):
    i = pl.program_id(0)
    r0 = pl.multiple_of(i * SH, 8)
    cr0 = pl.multiple_of(i * SR, 8)   # coef-space row offset

    # constants: stage once, persist in scratch across the (sequential)
    # grid; re-DMA'd only on the first stripe
    @pl.when(i == 0)
    def _():
        c1 = pltpu.make_async_copy(ar_hbm, ar_t, sem.at[4])
        c2 = pltpu.make_async_copy(pc_hbm, pc_t, sem.at[5])
        c1.start()
        c2.start()
        c1.wait()
        c2.wait()
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
    fmid = e_t[:, :] - scale * g_t[:, :]
    ar = ar_t[:, :]
    pc = pc_t[:, :]

    # coefs = A_r @ fmid @ P_c^T
    xr = jax.lax.dot_general(ar, fmid, (((1,), (0,)), ((), ())),
                             precision=_PREC,
                             preferred_element_type=jnp.float32)
    coefs = jax.lax.dot_general(xr, pc, (((1,), (1,)), ((), ())),
                                precision=_PREC,
                                preferred_element_type=jnp.float32)
    clamped = jnp.clip(coefs, lo_t[:, :], hi_t[:, :])
    delta = clamped - coefs
    # fnew = fmid + ss * A_r^T @ delta @ P_c
    dc = jax.lax.dot_general(delta, pc, (((1,), (0,)), ((), ())),
                             precision=_PREC,
                             preferred_element_type=jnp.float32)
    back = jax.lax.dot_general(ar, dc, (((0,), (0,)), ((), ())),
                               precision=_PREC,
                               preferred_element_type=jnp.float32)
    out_t[:, :] = fmid + float(sy * sx) * back

    cpo = pltpu.make_async_copy(out_t, fnew_hbm.at[pl.ds(r0, SH), :],
                                sem.at[0])
    cpo.start()

    if with_prob:
        devp = (clamped - dq_t[:, :]) * iq_t[:, :]
        acc[0] = acc[0] + 0.5 * jnp.sum(devp * devp)
        dd = jax.lax.dot_general(devp * iq_t[:, :], pc,
                                 (((1,), (0,)), ((), ())),
                                 precision=_PREC,
                                 preferred_element_type=jnp.float32)
        pgb = jax.lax.dot_general(ar, dd, (((0,), (0,)), ((), ())),
                                  precision=_PREC,
                                  preferred_element_type=jnp.float32)
        pg_t[:, :] = scale_ref[1] * pgb
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
def _ar_matrix(SH: int, sy: int) -> np.ndarray:
    """A_r for one stripe: I_{SH/(8 sy)} (x) (D @ M_sy), [SH/sy, SH]."""
    k = SH // sy
    return _blockdiag_sampled(k, sy)


@functools.lru_cache(maxsize=None)
def _pc_matrix(W: int, sx: int) -> np.ndarray:
    """P_c over the full width: [W/sx, W]."""
    k = W // sx
    return _blockdiag_sampled(k, sx)


def _pick_stripe(h: int, w: int, sy: int) -> int:
    """Largest SH dividing h, multiple of 8*sy, fitting VMEM."""
    budget = 6 * 1024 * 1024
    for sh in (256, 128, 64, 32, 16, 8):
        if sh % (8 * sy) or h % sh:
            continue
        if (6 * sh * w + (w // 1) * w) * 4 <= budget:
            return sh
    return 0


def supports(H: int, W: int, sy: int, sx: int) -> bool:
    if H % 8 or W % 128 or W > 1024:
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

    ar = jnp.asarray(_ar_matrix(SH, sy))
    pc = jnp.asarray(_pc_matrix(W, sx))

    kernel = functools.partial(
        _kernel, H=H, W=W, SH=SH, SR=SR, WC=WC, sy=sy, sx=sx,
        with_prob=with_prob, nstripes=nstripes)

    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    n_in = 8 if with_prob else 6
    n_out = 3 if with_prob else 1

    scratch = [
        pltpu.VMEM((SH, W), jnp.float32),   # e_t
        pltpu.VMEM((SH, W), jnp.float32),   # g_t
        pltpu.VMEM((SR, SH), jnp.float32),  # ar_t
        pltpu.VMEM((WC, W), jnp.float32),   # pc_t
        pltpu.VMEM((SR, WC), jnp.float32),  # lo_t
        pltpu.VMEM((SR, WC), jnp.float32),  # hi_t
        pltpu.VMEM((SR, WC), jnp.float32),  # dq_t
        pltpu.VMEM((SR, WC), jnp.float32),  # iq_t
        pltpu.VMEM((SH, W), jnp.float32),   # out_t
        pltpu.VMEM((SH, W), jnp.float32),   # pg_t
        pltpu.VMEM((8, 128), jnp.float32),  # dist_t
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
        )(scalars, extrap, grad, ar, pc, lo, hi, dq, inv_q)
        return fnew, pgrad, dist[0, 0]

    fnew, = pl.pallas_call(
        functools.partial(_kernel_adapter, kernel=kernel),
        grid_spec=grid_spec,
        out_shape=[hw],
    )(scalars, extrap, grad, ar, pc, lo, hi)
    return fnew, None, jnp.float32(0.0)


def _kernel_adapter(scale_ref, e, g, a, p, l, h, fnew,
                    e_t, g_t, ar_t, pc_t, lo_t, hi_t, dq_t, iq_t,
                    out_t, pg_t, dist_t, acc, sem, *, kernel):
    """No-prob arity adapter: fills the disabled refs with None."""
    kernel(scale_ref, e, g, a, p, l, h, None, None, fnew, None, None,
           e_t, g_t, ar_t, pc_t, lo_t, hi_t, dq_t, iq_t,
           out_t, pg_t, dist_t, acc, sem)
