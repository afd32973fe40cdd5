"""FISTA-accelerated projected subgradient solver.

The flagship "model" of this framework: the whole iterate loop of the
reference (compute.c:406-465) expressed as a single `lax.scan` under
`jit`, so XLA fuses the TV/TGV2 stencils, the prob term, the normalized
step and the DCT box projection into on-chip loops, with per-iteration
convergence metrics streamed out of the scan carry.

Semantics replicated exactly (validated against a scatter-form oracle
and the reference binary's CSV logs / PNG output):
  * full-res canvas H, W = max over channels of coef dims x sampling
    (compute.c:410-418); channels whose own region is smaller are only
    projected/prob-scattered on their region, the rest of the canvas
    evolves freely (compute.c:349-403 loop bounds).
  * FISTA extrapolation with factor (t-1)/t_next, factor 0 at i=0, and
    buffer swap (compute.c:427-440).
  * constant step radius/sqrt(1+iterations), radius = sqrt(h*w)/2
    (compute.c:425,443), normalized by the per-channel gradient norm
    (compute.c:200-216).
  * the prob term reads the clamped DCT saved by the *previous*
    projection, not the DCT of the current extrapolated iterate
    (compute.c:381, compute.c:37).
  * objective = (tv + tv2 + prob_dist) / total_alpha with
    p_alpha = pweight*2*255*sqrt(2), tv alpha 1/sqrt(C) per channel
    count, tgv alpha weight/sqrt(2) (compute.c:223-275).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jpeg2png_tpu.ops.blocks import deblockify
from jpeg2png_tpu.ops.dct_raster import idct_raster
from jpeg2png_tpu.ops.projection import project_channel_raster
from jpeg2png_tpu.ops.prob import prob_term_raster
from jpeg2png_tpu.ops.resample import upsample_nearest_clamped
from jpeg2png_tpu.ops.tv import tv_term, tv2_term


@dataclasses.dataclass(frozen=True)
class ChannelGeometry:
    """Static per-channel shape info (jpeg.c:50-67).

    nby/nbx: 8x8 block grid; h_samp/w_samp: vertical/horizontal pixel
    replication factors (max_samp / this channel's samp).
    """
    nby: int
    nbx: int
    h_samp: int = 1
    w_samp: int = 1

    @property
    def ph(self) -> int:  # pixel rows at coef resolution
        return self.nby * 8

    @property
    def pw(self) -> int:
        return self.nbx * 8

    @property
    def region_h(self) -> int:  # full-res rows this channel covers
        return self.ph * self.h_samp

    @property
    def region_w(self) -> int:
        return self.pw * self.w_samp


@functools.lru_cache(maxsize=None)
def _fista_factors_np(nsteps: int) -> Tuple[np.ndarray, float]:
    """Host-side FISTA factor sequence from t0=1 (compute.c:427-440)."""
    t = 1.0
    out = np.empty((nsteps,), np.float32)
    for i in range(nsteps):
        tnext = (1.0 + math.sqrt(1.0 + 4.0 * t * t)) / 2.0
        out[i] = (t - 1.0) / tnext
        t = tnext
    return out, t


def canvas_shape(geoms: Sequence[ChannelGeometry]) -> Tuple[int, int]:
    """Full-res canvas = max over channels (compute.c:410-418)."""
    return (max(g.region_h for g in geoms), max(g.region_w for g in geoms))


def objective_alphas(
    weight: float, pweights: Sequence[float], nchannel: int,
) -> Tuple[list, float]:
    """(p_alphas, total_alpha) — the objective-term scale factors
    (compute.c:223-275: p_alpha = pweight*2*255*sqrt(2) per channel,
    total_alpha = sum of active p_alphas + C [TV] + C*w/sqrt(2) [TGV2]).
    The single source of truth shared by every solve path."""
    p_alphas = [pw * 2.0 * 255.0 * math.sqrt(2.0) for pw in pweights]
    total_alpha = sum(pa for pa in p_alphas if pa != 0.0) + nchannel
    if weight != 0.0:
        total_alpha += (weight / math.sqrt(2.0)) * nchannel
    return p_alphas, total_alpha


def mega_metrics(partials, prob_dist_prev, p_alphas, total_alpha,
                 simd_compat_logging: bool, xp=jnp):
    """CSV metrics from the fused kernel's partials.

    partials: [nsteps, >= C+2+P] rows [sumsq_0..C-1, tv, tv2, dist_p0,
    ...] (kernels/iter_step.py).  The reference logs the prob distance
    computed from the PREVIOUS projection's clamped coefs
    (compute.c:381, :37), hence the one-row shift seeded with
    `prob_dist_prev`.  Returns (metrics [nsteps, 4] with columns
    (objective, prob_dist, tv, tv2) — logger.c:13 — and the final
    prob_dist to carry).  Works on jnp (in-trace) and np (host) alike.
    """
    nchannel = len(p_alphas)
    tv = partials[:, nchannel]
    tv2 = partials[:, nchannel + 1]
    dist_total = xp.zeros_like(tv)
    for pi, c in enumerate(
            c for c in range(nchannel) if p_alphas[c] != 0.0):
        d = partials[:, nchannel + 2 + pi]
        if not simd_compat_logging:
            d = p_alphas[c] * d
        dist_total = dist_total + d
    prob_col = xp.concatenate(
        [xp.reshape(xp.asarray(prob_dist_prev, dtype=tv.dtype), (1,)),
         dist_total[:-1]])
    objective = (tv + tv2 + prob_col) / total_alpha
    metrics = xp.stack([objective, prob_col, tv, tv2], axis=1)
    return metrics, dist_total[-1]


def initial_decode(data: jnp.ndarray, quant: jnp.ndarray) -> jnp.ndarray:
    """Plain JPEG decode of one channel: dequantize + IDCT (jpeg.c:83-92).

    data: [nby, nbx, 8, 8] int16; quant: [8, 8] float. Returns [ph, pw].
    """
    nby, nbx = data.shape[:2]
    data_r = deblockify(data.astype(quant.dtype))
    q_r = jnp.tile(quant, (nby, nbx))
    return idct_raster(data_r * q_r)


@functools.lru_cache(maxsize=32)
def _build_solver_impl(
    geoms: Tuple[ChannelGeometry, ...],
    weight: float,
    pweights: Tuple[float, ...],
    iterations: int,
    simd_compat_logging: bool,
    dtype: str,
    use_pallas: bool = False,
):
    """Build the (unjitted) resumable solver implementation.

    Returns solve_impl(datas, quants, carry_in, nsteps) ->
    (fdata, metrics, carry_out): `carry_in=None` starts from the plain
    decode; a carry from a previous call resumes (checkpoint/resume for
    long runs — the whole solver state is this small pytree, SURVEY.md
    §5).  `iterations` is the TOTAL planned count and fixes the step
    size radius/sqrt(1+iterations) (compute.c:443) regardless of how
    many chunks the run is split into.

    Weights/iterations are trace-time constants: zero-weight terms are
    skipped entirely, like the pweight/weight branches at
    compute.c:244-261.
    """
    nchannel = len(geoms)
    H, W = canvas_shape(geoms)
    radius = math.sqrt(float(H) * float(W)) / 2.0
    step_size = radius / math.sqrt(1.0 + iterations)

    p_alphas, total_alpha = objective_alphas(weight, pweights, nchannel)

    def solve_impl(datas, quants, carry_in, nsteps):
        f32 = jnp.dtype(dtype)
        # rasterize all per-channel constants once (outside the scan):
        # coefficient (u,v) of block (by,bx) lives at (8by+u, 8bx+v)
        q_rs = [jnp.tile(q.astype(f32), (g.nby, g.nbx))
                for q, g in zip(quants, geoms)]
        data_rs = [deblockify(d.astype(f32)) for d in datas]
        dqs = [dr * qr for dr, qr in zip(data_rs, q_rs)]
        los = [dq - 0.5 * qr for dq, qr in zip(dqs, q_rs)]
        his = [dq + 0.5 * qr for dq, qr in zip(dqs, q_rs)]
        inv_qs = [1.0 / qr for qr in q_rs]
        data_i16_rs = [deblockify(d) for d in datas]  # int16 rasters
        # pin the rasterized constants: without this barrier XLA's
        # while-loop constant sinking re-materializes the tile/div
        # broadcasts INSIDE the solve loop (~20us/iter at 512x512)
        dqs, los, his, inv_qs, q_rs, data_i16_rs = (
            jax.lax.optimization_barrier(
                (dqs, los, his, inv_qs, q_rs, data_i16_rs)))

        # initial iterate: plain decode, nearest-upsampled to the canvas
        # with edge clamping (compute.c:296-302)
        f0 = jnp.stack([
            upsample_nearest_clamped(
                idct_raster(dq), g.h_samp, g.w_samp, H, W
            )
            for dq, g in zip(dqs, geoms)
        ])

        def prob_from_cos(cos):
            """(prob_dist, pixel-space gradient [C,H,W]) from the saved
            clamped DCT coefficients (compute.c:38-70)."""
            prob_dist = jnp.float32(0.0)
            prob_grads = []
            for c, g in enumerate(geoms):
                if p_alphas[c] == 0.0:
                    prob_grads.append(jnp.zeros((H, W), f32))
                    continue
                dist, region = prob_term_raster(
                    cos[c], dqs[c], inv_qs[c],
                    jnp.asarray(p_alphas[c], f32),
                    g.h_samp, g.w_samp,
                    include_alpha_in_dist=not simd_compat_logging,
                )
                prob_dist = prob_dist + dist
                if g.region_h != H or g.region_w != W:
                    region = jnp.pad(
                        region,
                        ((0, H - g.region_h), (0, W - g.region_w)),
                    )
                prob_grads.append(region)
            return prob_dist, jnp.stack(prob_grads)

        def do_projection(fdata):
            """Per-channel projection (compute.c:334-404); returns the
            projected canvas and the clamped DCT coefficients."""
            new_f = []
            new_cos = []
            for c, g in enumerate(geoms):
                region = fdata[c, : g.region_h, : g.region_w]
                proj, clamped = project_channel_raster(
                    region, los[c], his[c], g.h_samp, g.w_samp
                )
                new_cos.append(clamped)
                if g.region_h != H or g.region_w != W:
                    ch = fdata[c].at[: g.region_h, : g.region_w].set(proj)
                else:
                    ch = proj
                new_f.append(ch)
            return jnp.stack(new_f), tuple(new_cos)

        def fista_factor(t):
            tnext = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) / 2.0
            return tnext, (t - 1.0) / tnext

        def body_xla(carry, _):
            fdata, fista, cos, t = carry

            # --- FISTA extrapolation (compute.c:431-440) ---
            tnext, factor = fista_factor(t)
            extrapolated = fdata + factor * (fdata - fista)
            fista = fdata
            fdata = extrapolated

            # --- gradient of the objective ---
            prob_dist, grad = prob_from_cos(cos)

            tv, gtv, gx, gy = tv_term(fdata)
            grad = grad + gtv

            if weight != 0.0:
                tv2, g2 = tv2_term(gx, gy, weight / math.sqrt(2.0))
                grad = grad + g2
            else:
                tv2 = jnp.float32(0.0)

            # --- normalized step (compute.c:200-216, per channel) ---
            norms = jnp.sqrt(jnp.sum(grad * grad, axis=(1, 2)))
            scale = jnp.where(norms == 0.0, 0.0, step_size / norms)
            fdata = fdata - grad * scale[:, None, None]

            # --- projection onto Q per channel (compute.c:334-404) ---
            fdata, new_cos = do_projection(fdata)

            objective = (tv + tv2 + prob_dist) / jnp.float32(total_alpha)
            metrics = jnp.stack([objective, prob_dist, tv, tv2])
            return (fdata, fista, new_cos, tnext), metrics

        def project_prob_channel(c, g, fmid):
            """Fused update path for one channel: box projection with
            footprint mean/residual folded into the DCT matmuls
            (ops/dct_raster.py sampled transforms) + the next
            iteration's prob pixel gradient and distance.

            Algebra: with P = (I (x) D) @ M per axis (M = footprint
            mean), out = fmid + s_r*s_c * P^T (clip(coefs) - coefs) P,
            identical to the reference's mean/residual decomposition
            (compute.c:334-404) up to f32 rounding.
            """
            from jpeg2png_tpu.ops.dct_raster import (
                sampled_dct, sampled_idct_up)

            sy, sx = g.h_samp, g.w_samp
            ss = float(sy * sx)
            ragged = g.region_h != H or g.region_w != W
            region = fmid[: g.region_h, : g.region_w] if ragged else fmid
            coefs = sampled_dct(region, sy, sx)
            clamped = jnp.clip(coefs, los[c], his[c])
            fnew_region = region + ss * sampled_idct_up(
                clamped - coefs, sy, sx)
            if ragged:
                fnew = fmid.at[: g.region_h, : g.region_w].set(fnew_region)
            else:
                fnew = fnew_region

            if p_alphas[c] == 0.0:
                return fnew, None, jnp.float32(0.0)
            devp = (clamped - dqs[c]) * inv_qs[c]
            dist = 0.5 * jnp.sum(devp * devp, dtype=jnp.float32)
            if not simd_compat_logging:
                dist = p_alphas[c] * dist
            pgrad_region = (p_alphas[c] * ss) * sampled_idct_up(
                devp * inv_qs[c], sy, sx)
            if ragged:
                pgrad = jnp.pad(
                    pgrad_region,
                    ((0, H - g.region_h), (0, W - g.region_w)))
            else:
                pgrad = pgrad_region
            return fnew, pgrad, dist

        def solve_mega(carry, fresh, data_arr, q_arr, lite=False):
            # ONE Pallas kernel for ALL nsteps iterations
            # (kernels/iter_step.py): the entire solver state stays in
            # VMEM across iterations; per iteration a gradient phase and
            # a projection phase with the global-norm barrier in SMEM.
            # No lax.scan, no per-iteration launches, zero per-iteration
            # HBM traffic.
            from jpeg2png_tpu.kernels import iter_step

            fdatas, fistas, devqs, prob_dist, t = carry

            pa_ss = tuple(
                p_alphas[c] * g.h_samp * g.w_samp
                for c, g in enumerate(geoms))
            if fresh:
                # fresh start: t0 == 1 statically, so the whole factor
                # sequence is a trace-time constant (the device scalar
                # scan costs ~0.4 ms — 8 us/iter at the default i=50)
                factors, t_final = _fista_factors_np(nsteps)
                factors = jnp.asarray(factors)
                t_final = jnp.float32(t_final)
            else:
                factors, t_final = iter_step.fista_factors(t, nsteps)
            fnews, fistas_out, devqs_out, partials = iter_step.fused_solve(
                list(fdatas), list(fistas), list(devqs), factors,
                step_size, data_arr, q_arr,
                pa_ss, [(g.h_samp, g.w_samp) for g in geoms], weight,
                lite=lite)

            metrics, dist_final = mega_metrics(
                partials, prob_dist, p_alphas, total_alpha,
                simd_compat_logging)
            carry = (tuple(fnews), tuple(fistas_out), tuple(devqs_out),
                     dist_final, t_final)
            return carry, metrics

        def make_body_pallas(W2, los2, his2, dqs2, iqs2, assume_full):
            # Scan body with the whole iteration in Pallas: one fused
            # pass for extrapolation + TV/TGV2 gradients
            # (kernels/grad_step.py) and one fused pass per channel for
            # the normalized step + box projection + prob gradient
            # (kernels/project_step.py).  State lives as per-channel
            # [H, W2] tuples — no [C, H, W] stacking in the loop (stacks
            # are physical copies).  The prob term is carried as a
            # pixel-space gradient computed right after the previous
            # projection (identical to reading aux->cos,
            # compute.c:381 + :38-70).
            #
            # W2/constants may describe a W-zero-padded canvas (padding
            # frozen by lo == hi == 0 boxes, true-edge masks in the
            # gradient kernel; see kernels/iter_step.py rationale);
            # assume_full means every channel projects on the whole
            # padded canvas (region gaps carry unconstrained boxes).
            from jpeg2png_tpu.kernels import project_step
            from jpeg2png_tpu.kernels.grad_step import fused_grad

            samp_list = [(g.h_samp, g.w_samp) for g in geoms]
            # one multi-channel projection dispatch when every channel
            # projects on the full padded canvas: 1 + C launches per
            # iteration become 2 (the launch count is this tier's
            # throughput knob at 3-6 MP)
            use_multi = (
                assume_full
                and project_step.supports_multi(H, W2, samp_list))

            def body(carry, _):
                fdatas, fistas, pgrads, prob_dist, t = carry
                tnext, factor = fista_factor(t)

                pg_in = []
                k = 0
                for c in range(len(geoms)):
                    if p_alphas[c] != 0.0:
                        pg_in.append(pgrads[k])
                        k += 1
                    else:
                        pg_in.append(None)
                grads, extraps, sumsq, tv, tv2 = fused_grad(
                    list(fdatas), list(fistas), pg_in, factor, weight,
                    h_true=H, w_true=W)
                norms = jnp.sqrt(sumsq)
                scale = jnp.where(norms == 0.0, 0.0, step_size / norms)

                new_fdatas = []
                new_pgrads = []
                prob_dist_next = jnp.float32(0.0)
                if use_multi:
                    pa_ss = [
                        p_alphas[c] * g.h_samp * g.w_samp
                        for c, g in enumerate(geoms)]
                    new_fdatas, pgs, dists = (
                        project_step.fused_project_multi(
                            extraps, grads, scale, los2, his2,
                            [dqs2[c] if pa_ss[c] != 0.0 else None
                             for c in range(len(geoms))],
                            [iqs2[c] if pa_ss[c] != 0.0 else None
                             for c in range(len(geoms))],
                            pa_ss, samp_list))
                    for c in range(len(geoms)):
                        d = dists[c]
                        if pa_ss[c] != 0.0 and not simd_compat_logging:
                            d = p_alphas[c] * d
                        prob_dist_next = prob_dist_next + d
                        if pgs[c] is not None:
                            new_pgrads.append(pgs[c])
                else:
                    for c, g in enumerate(geoms):
                        full_canvas = assume_full or (
                            g.region_h == H and g.region_w == W2)
                        if full_canvas and project_step.supports(
                                H, W2, g.h_samp, g.w_samp):
                            with_prob = p_alphas[c] != 0.0
                            fnew, pgrad, dist = (
                                project_step.fused_project(
                                    extraps[c], grads[c], scale[c],
                                    los2[c], his2[c],
                                    dqs2[c] if with_prob else None,
                                    iqs2[c] if with_prob else None,
                                    (p_alphas[c] * g.h_samp * g.w_samp
                                     if with_prob else 0.0),
                                    g.h_samp, g.w_samp))
                            if with_prob and not simd_compat_logging:
                                dist = p_alphas[c] * dist
                        else:
                            fmid = extraps[c] - grads[c] * scale[c]
                            fnew, pgrad, dist = project_prob_channel(
                                c, g, fmid)
                        new_fdatas.append(fnew)
                        if pgrad is not None:
                            new_pgrads.append(pgrad)
                        prob_dist_next = prob_dist_next + dist

                objective = ((tv + tv2 + prob_dist)
                             / jnp.float32(total_alpha))
                metrics = jnp.stack([objective, prob_dist, tv, tv2])
                carry = (tuple(new_fdatas), fdatas, tuple(new_pgrads),
                         prob_dist_next, tnext)
                return carry, metrics

            return body

        def make_body_pallas_lite(dat2, q2, pa_sss):
            """LITE two-kernel body: bf16 side state (FISTA difference,
            gradient, coef-space devq carry) and in-kernel clamp bounds
            from int16+quant rasters — the mega-lite scheme applied to
            the per-iteration pipeline (kernels/project_step.py lite
            rationale).  Cuts per-iteration HBM traffic ~1.8x vs the
            f32 body; the iterate stays f32.

            Carry: (f tuple f32, d tuple bf16 = f - fista,
            devq tuple bf16 per prob channel, prob_dist, t).
            """
            from jpeg2png_tpu.kernels import project_step
            from jpeg2png_tpu.kernels.stripe_grad import (
                fused_grad_striped_lite)

            samp_l = [(g.h_samp, g.w_samp) for g in geoms]

            def body(carry, _):
                fdatas, dds, devqs, prob_dist, t = carry
                tnext, factor = fista_factor(t)
                # the STRIPED lite kernel on the whole canvas as one
                # band: zero halos (the global-boundary value) and
                # row0 = 0.  Its uniform halo-staged stripes beat the
                # stripe-class kernel by ~26% (_two_lite_geometry
                # note); H2 is padded to whole stripes for it.
                L2, W2b = fdatas[0].shape
                zf = [jnp.zeros((16, W2b), jnp.float32)] * len(geoms)
                zd = [jnp.zeros((16, W2b), jnp.bfloat16)] * len(geoms)
                grads, sumsq, tv, tv2 = fused_grad_striped_lite(
                    list(fdatas), list(dds), list(devqs),
                    (zf, zf, zd, zd), factor, jnp.int32(0),
                    weight, samp_l, pa_sss,
                    h_pad=L2, h_true=H, w_true=W)
                norms = jnp.sqrt(sumsq)
                scale = jnp.where(norms == 0.0, 0.0, step_size / norms)
                fnews, dnews, devq_news, dists = (
                    project_step.fused_project_multi_lite(
                        list(fdatas), list(dds), grads, factor, scale,
                        dat2, q2, pa_sss, samp_l))
                prob_dist_next = jnp.float32(0.0)
                for c in range(len(geoms)):
                    d = dists[c]
                    if pa_sss[c] != 0.0 and not simd_compat_logging:
                        d = p_alphas[c] * d
                    prob_dist_next = prob_dist_next + d
                objective = ((tv + tv2 + prob_dist)
                             / jnp.float32(total_alpha))
                metrics = jnp.stack([objective, prob_dist, tv, tv2])
                carry_out = (tuple(fnews), tuple(dnews),
                             tuple(dv for dv in devq_news
                                   if dv is not None),
                             prob_dist_next, tnext)
                return carry_out, metrics

            return body

        if use_pallas:
            from jpeg2png_tpu.kernels import iter_step
            from jpeg2png_tpu.kernels.grad_step import (
                supports as _grad_supports)

            samp_list = [(g.h_samp, g.w_samp) for g in geoms]
            # mega-lite: past the full-precision VMEM gate, bf16
            # side-canvases (fista diff / gradient / devq) keep the
            # whole solve resident up to ~3.7 MP (iter_step.supports_lite
            # rationale; validated vs the two-kernel tier on-chip)
            mega_lite = (
                not iter_step.supports(nchannel, H, W, samp_list, True)
                and iter_step.supports_lite(
                    nchannel, H, W, samp_list, True))
            if (iter_step.supports(nchannel, H, W, samp_list, True)
                    or mega_lite):
                # channels whose region is smaller than the canvas (the
                # odd-size luma case, compute.c:349-403 loop bounds):
                # pad their coef arrays to canvas-coef shape with a huge
                # FREE sentinel quant — the box clamp becomes a no-op
                # and the prob term underflows to exactly zero, so those
                # canvas pixels evolve unconstrained like the reference.
                from jpeg2png_tpu.kernels.project_step import (
                    FREE_Q as _FQ)
                FREE_Q = jnp.float32(_FQ)
                data_arr, q_arr, dq0_shapes = [], [], []
                for c, g in enumerate(geoms):
                    shp = (H // g.h_samp, W // g.w_samp)
                    d, qq = data_i16_rs[c], q_rs[c]
                    if d.shape != shp:
                        pad = ((0, shp[0] - d.shape[0]),
                               (0, shp[1] - d.shape[1]))
                        d = jnp.pad(d, pad)
                        qq = jnp.pad(qq, pad, constant_values=FREE_Q)
                    data_arr.append(d)
                    q_arr.append(qq)
                    dq0_shapes.append(shp)
                fresh = carry_in is None
                if fresh:
                    f0s = tuple(f0[c] for c in range(len(geoms)))
                    dq0 = tuple(
                        jnp.zeros(dq0_shapes[c], f32)
                        for c in range(len(geoms)) if p_alphas[c] != 0.0)
                    carry_in = (f0s, f0s, dq0, jnp.float32(0.0),
                                jnp.asarray(1.0, f32))
                if nsteps == 0:
                    # state-initialization call (checkpoint/resume)
                    return (jnp.stack(carry_in[0]),
                            jnp.zeros((0, 4), jnp.float32), carry_in)
                carry_out, metrics = solve_mega(
                    carry_in, fresh, data_arr, q_arr, lite=mega_lite)
                return jnp.stack(carry_out[0]), metrics, carry_out
            # two-kernel tier for canvases beyond the fused-solve VMEM
            # gate: W-pad to the 128*max_sx alignment the kernels need
            # (H needs no padding — the gradient kernel handles any
            # 8-multiple height with clamped windows).  Padded columns
            # carry lo == hi == 0 boxes and stay frozen at zero;
            # region-gap channels carry unconstrained sentinel boxes.
            from jpeg2png_tpu.kernels import project_step as _proj

            max_sx = max(g.w_samp for g in geoms)
            wq = 128 * max_sx
            W2 = -(-W // wq) * wq
            two_ok = (
                H % 8 == 0
                and _grad_supports(nchannel, H, W2)
                and all(_proj.supports(H, W2, g.h_samp, g.w_samp)
                        and H % g.h_samp == 0
                        for g in geoms))
            if two_ok:
                pa_sss = tuple(
                    p_alphas[c] * g.h_samp * g.w_samp
                    for c, g in enumerate(geoms))
                prob_mask_l = tuple(p != 0.0 for p in pa_sss)
                H2, lite_ok = _two_lite_geometry(geoms, W2, prob_mask_l)
            else:
                lite_ok = False
            if lite_ok:
                # LITE tier: int16 + quant rasters with the mega
                # kernel's padding algebra (q == 0 freezes canvas
                # padding, q >= 2^39 FREE leaves region gaps
                # unconstrained — kernels/iter_step.py:433-458)
                from jpeg2png_tpu.kernels.project_step import (
                    FREE_Q as _FQ)
                FREE_Q = jnp.float32(_FQ)
                dat2, q2 = [], []
                for c, g in enumerate(geoms):
                    hc_t, wc_t = data_i16_rs[c].shape
                    hc, wc = H // g.h_samp, W // g.w_samp
                    hc_p, wc_p = H2 // g.h_samp, W2 // g.w_samp
                    d = data_i16_rs[c]
                    qq = q_rs[c]
                    if (hc_t, wc_t) != (hc, wc):
                        pad = ((0, hc - hc_t), (0, wc - wc_t))
                        d = jnp.pad(d, pad)
                        qq = jnp.pad(qq, pad, constant_values=FREE_Q)
                    if (hc_p, wc_p) != (hc, wc):
                        padhw = ((0, hc_p - hc), (0, wc_p - wc))
                        d = jnp.pad(d, padhw)
                        qq = jnp.pad(qq, padhw)  # q 0: frozen at 0
                    dat2.append(d)
                    q2.append(qq)
                # pin the padded rasters: XLA while-loop constant
                # sinking would otherwise re-materialize the pads
                # inside the scan (the round-3 striped-path lesson)
                dat2, q2 = jax.lax.optimization_barrier((dat2, q2))
                if carry_in is None:
                    f0s = tuple(
                        jnp.pad(f0[c], ((0, H2 - H), (0, W2 - W)))
                        if (H2, W2) != (H, W) else f0[c]
                        for c in range(len(geoms)))
                    d0 = tuple(
                        jnp.zeros((H2, W2), jnp.bfloat16)
                        for _ in range(len(geoms)))
                    dq0 = tuple(
                        jnp.zeros((H2 // g.h_samp, W2 // g.w_samp),
                                  jnp.bfloat16)
                        for c, g in enumerate(geoms)
                        if p_alphas[c] != 0.0)
                    carry_in = (f0s, d0, dq0, jnp.float32(0.0),
                                jnp.asarray(1.0, f32))
                body = make_body_pallas_lite(dat2, q2, pa_sss)
                carry_out, metrics = jax.lax.scan(
                    body, carry_in, None, length=nsteps)
                fdata = jnp.stack(carry_out[0])
                if (H2, W2) != (H, W):
                    fdata = fdata[:, :H, :W]
                return fdata, metrics, carry_out
            if two_ok:
                BIG = jnp.float32(2.0 ** 39)
                los2, his2, dqs2, iqs2 = [], [], [], []
                for c, g in enumerate(geoms):
                    hc_t, wc_t = H // g.h_samp, W // g.w_samp
                    wc_p = W2 // g.w_samp
                    lo, hi = los[c], his[c]
                    dq, iq = dqs[c], inv_qs[c]
                    if lo.shape != (hc_t, wc_t):
                        # region gap: unconstrained boxes, no prob
                        pad = ((0, hc_t - lo.shape[0]),
                               (0, wc_t - lo.shape[1]))
                        lo = jnp.pad(lo, pad, constant_values=-BIG)
                        hi = jnp.pad(hi, pad, constant_values=BIG)
                        dq = jnp.pad(dq, pad)
                        iq = jnp.pad(iq, pad)
                    if wc_p != wc_t:
                        # canvas padding: lo == hi == 0 freezes it
                        padw = ((0, 0), (0, wc_p - wc_t))
                        lo = jnp.pad(lo, padw)
                        hi = jnp.pad(hi, padw)
                        dq = jnp.pad(dq, padw)
                        iq = jnp.pad(iq, padw)
                    los2.append(lo)
                    his2.append(hi)
                    dqs2.append(dq)
                    iqs2.append(iq)

                if carry_in is None:
                    f0s = tuple(
                        jnp.pad(f0[c], ((0, 0), (0, W2 - W)))
                        if W2 != W else f0[c]
                        for c in range(len(geoms)))
                    pg0 = tuple(
                        jnp.zeros((H, W2), f32)
                        for c in range(len(geoms))
                        if p_alphas[c] != 0.0)
                    carry_in = (f0s, f0s, pg0, jnp.float32(0.0),
                                jnp.asarray(1.0, f32))
                body = make_body_pallas(W2, los2, his2, dqs2, iqs2, True)
                carry_out, metrics = jax.lax.scan(
                    body, carry_in, None, length=nsteps
                )
                fdata = jnp.stack(carry_out[0])
                if W2 != W:
                    fdata = fdata[:, :, :W]
                return fdata, metrics, carry_out
            # geometry not expressible in the Pallas kernels: XLA path

        if carry_in is None:
            # cos seeded with data*quant (compute.c:279-286) => the prob
            # term contributes exactly zero on iteration 0
            carry_in = (f0, f0, tuple(dqs), jnp.asarray(1.0, f32))
        carry_out, metrics = jax.lax.scan(
            body_xla, carry_in, None, length=nsteps
        )
        return carry_out[0], metrics, carry_out

    return solve_impl


@functools.lru_cache(maxsize=32)
def _build_solver(
    geoms: Tuple[ChannelGeometry, ...],
    weight: float,
    pweights: Tuple[float, ...],
    iterations: int,
    simd_compat_logging: bool,
    dtype: str,
    use_pallas: bool = False,
):
    """Jitted full solve for a fixed geometry + hyperparameter setting."""
    impl = _build_solver_impl(
        geoms, weight, pweights, iterations, simd_compat_logging, dtype,
        use_pallas)

    def solve(datas, quants):
        fdata, metrics, _ = impl(datas, quants, None, iterations)
        return fdata, metrics

    return jax.jit(solve)


def _two_lite_geometry(geoms, W2: int, prob_mask):
    """(H2, ok) for the two-lite tier: the stripe-aligned padded
    canvas height and whether the lite kernels + the 2x padding-waste
    gate cover this geometry (given the f32 two-kernel gates already
    passed at width W2).  Shared by solve_impl and active_tier so the
    checkpoint fingerprint's tier label can never drift from the
    dispatch."""
    from jpeg2png_tpu.kernels import project_step, stripe_grad

    H, W = canvas_shape(geoms)
    samps = [(g.h_samp, g.w_samp) for g in geoms]
    # the tier runs the STRIPED lite gradient kernel on the whole
    # canvas as one band (zero halos): its halo-staged windows make
    # every stripe interior — own-row extraction is a static slice
    # with no rolls and the DMA program is uniform, measured 26%
    # faster than the stripe-class kernel (882 vs 1192 us/iter at
    # 6.29 MP).  That needs H padded to a whole number of stripes
    # (frozen q == 0 rows, like the W2 column padding), 16*sy-aligned
    # for the bf16/int16 (16, 128) HBM tiling.
    H2 = stripe_grad.padded_band_height(
        H, W2, len(geoms), samps, tuple(prob_mask))
    ok = (H2 != 0
          and stripe_grad.supports_lite(len(geoms), H2, W2, samps,
                                        tuple(prob_mask))
          and project_step.supports_multi_lite(H2, W2, samps)
          and H2 * W2 <= 2 * H * W)
    return H2, ok


def active_tier(geoms: Tuple[ChannelGeometry, ...],
                use_pallas: bool,
                pweights: Tuple[float, ...] | None = None) -> str:
    """Which solver tier (and therefore carry pytree format) solve_impl
    will pick: 'mega' (whole-solve kernel, coef-space devq carry),
    'two-lite' (bf16-state pipeline, coef-space devq carry), 'two'
    (f32 two-kernel pipeline, [H, W2] pixel-space pgrad carry) or 'xla'
    ([C, H, W] stack + clamped-DCT cos carry).  Mirrors solve_impl's
    gating exactly; checkpoint fingerprints include this so a carry
    written by one tier is never reinterpreted by another.

    The two-lite gate depends on which channels have the prob term
    enabled (alignment constraints apply to their devq carries); pass
    `pweights` for an exact answer — None assumes all enabled (the
    default CLI configuration)."""
    if not use_pallas:
        return "xla"
    from jpeg2png_tpu.kernels import grad_step, iter_step, project_step

    H, W = canvas_shape(geoms)
    samps = [(g.h_samp, g.w_samp) for g in geoms]
    if iter_step.supports(len(geoms), H, W, samps, True):
        return "mega"
    if iter_step.supports_lite(len(geoms), H, W, samps, True):
        return "mega-lite"
    wq = 128 * max(sx for _, sx in samps)
    W2 = -(-W // wq) * wq
    if (H % 8 == 0
            and grad_step.supports(len(geoms), H, W2)
            and all(project_step.supports(H, W2, sy, sx) and H % sy == 0
                    for sy, sx in samps)):
        if pweights is None:
            prob_mask = tuple(True for _ in geoms)
        else:
            prob_mask = tuple(p != 0.0 for p in pweights)
        if _two_lite_geometry(geoms, W2, prob_mask)[1]:
            return "two-lite"
        return "two"
    return "xla"


def _pallas_default(geoms: Tuple[ChannelGeometry, ...]) -> bool:
    """Use the fused Pallas path on TPU when the geometry supports it."""
    if jax.default_backend() != "tpu":
        return False
    return active_tier(geoms, True) != "xla"


def transpose_problem(datas, quants, samps):
    """The x<->y transposed problem: block grids and the entries of
    every 8x8 block transpose, quant tables transpose, sampling factors
    swap.  solve(transpose).swapaxes(1, 2) == solve(original) because
    the whole objective is transpose-invariant.

    Device arrays transpose ON DEVICE: np.asarray here would fetch the
    coefficient planes back through the remote-TPU tunnel (~40 MB/s)
    and re-upload the transposed copies on EVERY solve call — ~0.7 s of
    per-call overhead for a 6 MP canvas (measured; it dominated the
    bench wall clock before this was jnp)."""
    datas_t = [jnp.transpose(jnp.asarray(d), (1, 0, 3, 2)) for d in datas]
    quants_t = [jnp.asarray(q).T for q in quants]
    samps_t = [(sx, sy) for (sy, sx) in samps]
    return datas_t, quants_t, samps_t


def solve_joint(
    datas: Sequence[np.ndarray],
    quants: Sequence[np.ndarray],
    samps: Sequence[Tuple[int, int]],
    weight: float,
    pweights: Sequence[float],
    iterations: int,
    simd_compat_logging: bool = True,
    dtype: str = "float32",
    use_pallas: bool | None = None,
):
    """Joint multi-channel solve (the default mode, jpeg2png.c:142-144).

    Args:
        datas: per channel int16 [nby, nbx, 8, 8] DCT coefficients.
        quants: per channel [8, 8] quantization tables.
        samps: per channel (h_samp, w_samp) replication factors.
    Returns:
        (fdata [C, H, W] float, metrics [iterations, 4]) where metrics
        columns are (objective, prob_dist, tv, tv2) per iteration —
        exactly the reference CSV columns (logger.c:13).
    """
    geoms = tuple(
        ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
        for d, (sy, sx) in zip(datas, samps)
    )
    # Mosaic vector ops can degrade once the lane dimension exceeds
    # 1024; the objective is transpose-invariant (TV/TGV2 are symmetric
    # in x/y, block DCTs of transposed blocks are transposed
    # coefficients), so landscape images solve transposed when that
    # keeps the lane dim in the fast range.
    H, W = canvas_shape(geoms)
    if (jax.default_backend() == "tpu" and use_pallas is not False
            and W > 1024 and H < W):
        datas_t, quants_t, samps_t = transpose_problem(
            datas, quants, samps)
        fdata, metrics = solve_joint(
            datas_t, quants_t, samps_t, weight, pweights, iterations,
            simd_compat_logging, dtype, use_pallas)
        return jnp.swapaxes(fdata, 1, 2), metrics
    if use_pallas is None:
        use_pallas = _pallas_default(geoms)
    solver = _build_solver(
        geoms, float(weight), tuple(float(p) for p in pweights),
        int(iterations), bool(simd_compat_logging), dtype,
        bool(use_pallas),
    )
    return solver(
        [jnp.asarray(d) for d in datas],
        [jnp.asarray(q) for q in quants],
    )


@functools.lru_cache(maxsize=64)
def _chunk_step_fn(geoms, weight, pweights, iterations,
                   simd_compat_logging, dtype, use_pallas, nsteps):
    """Jitted resumable step of `nsteps` iterations (cached so repeated
    chunked solves of one configuration never retrace)."""
    impl = _build_solver_impl(
        geoms, weight, pweights, iterations, simd_compat_logging, dtype,
        use_pallas)
    return jax.jit(lambda d, q, c: impl(d, q, c, nsteps))


def solve_joint_chunked(
    datas, quants, samps, weight, pweights, iterations,
    on_chunk=None, chunk: int | None = None,
    simd_compat_logging: bool = True, dtype: str = "float32",
    use_pallas: bool | None = None,
):
    """solve_joint split into host-visible chunks.

    The reference ticks its progress bar and CSV log every iteration
    from inside the hot loop (compute.c:449-452, logger.c:20); the
    fused device loop here is opaque until it returns, so long solves
    run as a sequence of resumable chunks instead — numerically
    identical to one uninterrupted solve (the step size keys on the
    TOTAL iteration count and the carry resumes exactly; the
    checkpoint tests prove chunked == one-shot).  After each chunk,
    `on_chunk(done_iterations, metrics_chunk)` fires on the host.

    Returns (fdata, metrics) like solve_joint.
    """
    geoms = tuple(
        ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
        for d, (sy, sx) in zip(datas, samps)
    )
    H, W = canvas_shape(geoms)
    if (jax.default_backend() == "tpu" and use_pallas is not False
            and W > 1024 and H < W):
        # same landscape-transpose orientation as solve_joint; metrics
        # and chunk boundaries are orientation-invariant
        datas_t, quants_t, samps_t = transpose_problem(
            datas, quants, samps)
        fdata, metrics = solve_joint_chunked(
            datas_t, quants_t, samps_t, weight, pweights, iterations,
            on_chunk, chunk, simd_compat_logging, dtype, use_pallas)
        return jnp.swapaxes(fdata, 1, 2), metrics
    if use_pallas is None:
        use_pallas = _pallas_default(geoms)
    if chunk is None:
        chunk = max(8, min(50, iterations // 20 or iterations))

    key = (geoms, float(weight), tuple(float(p) for p in pweights),
           int(iterations), bool(simd_compat_logging), dtype,
           bool(use_pallas))
    d_dev = [jnp.asarray(d) for d in datas]
    q_dev = [jnp.asarray(q) for q in quants]
    fdata0, _, carry = _chunk_step_fn(*key, 0)(d_dev, q_dev, None)
    if iterations == 0:
        # degenerate but valid: the initial decode, like solve_joint
        return fdata0, np.zeros((0, 4), np.float32)

    all_metrics = []
    done = 0
    fdata = None
    while done < iterations:
        n = min(chunk, iterations - done)
        fdata, metrics, carry = _chunk_step_fn(*key, n)(
            d_dev, q_dev, carry)
        metrics = np.asarray(metrics)
        done += n
        all_metrics.append(metrics)
        if on_chunk is not None:
            on_chunk(done, metrics)
    return fdata, np.concatenate(all_metrics) if all_metrics else (
        np.zeros((0, 4), np.float32))


def solve_separate(
    datas, quants, samps, weights, pweights, iterations_per_channel,
    simd_compat_logging: bool = True, dtype: str = "float32",
):
    """Per-channel independent solves (-s mode, jpeg2png.c:146-153).

    Each channel still runs on the shared full-res canvas so that edges
    line up, exactly like the reference (compute() computes w,h from the
    single channel it is given — note this differs from joint mode: the
    canvas is that channel's own region).
    Returns list of ([1, Hc, Wc] fdata, metrics) per channel.
    """
    results = []
    for c in range(len(datas)):
        res = solve_joint(
            [datas[c]], [quants[c]], [samps[c]],
            weights[c], [pweights[c]], iterations_per_channel[c],
            simd_compat_logging, dtype,
        )
        results.append(res)
    return results
