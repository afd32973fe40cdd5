"""Spatially-sharded solver: one image striped across a device mesh.

The multi-chip scaling path (BASELINE.json config 5: a giant image
sharded into row stripes across N >= 2 hosts).  Each device owns a
contiguous band of rows of every channel; per iteration exactly THREE
collectives run (gated by tests/test_stripes.py::test_collective_count*
and ::test_collective_bytes_per_iteration):

  * 2 batched halo exchanges (jax.lax.ppermute — ICI neighbours, one
    per direction): every channel's boundary-row slivers of the iterate
    AND the FISTA companion travel as ONE stacked payload per
    direction (devices at the global image boundary receive zeros,
    which the gather masks treat as "outside the image"),
  * the fused TV/TGV2 gradient on the halo-extended band — on TPU via
    the striped Pallas kernel (kernels/stripe_grad.py), so every chip
    runs at fused-kernel throughput; pure-XLA fallback via
    ops/tv_halo.py elsewhere,
  * 1 fused [C+3] vector psum carrying the per-channel gradient
    sumsqs — the step normalization is GLOBAL over the whole image
    (compute.c:200-216), the collective the reference's shared-memory
    design gets for free — plus tv, tv2, and the PREVIOUS iteration's
    prob distance (the prob term reads the previous projection,
    compute.c:381, so deferring it one iteration into the shared
    vector costs nothing; the carry holds per-device (1,) partials),
  * block-local DCT box projection and prob gradient per band — on TPU
    via kernels/project_step.py (stripe boundaries are 8*h_samp-aligned
    by construction so 8x8 blocks and subsampling footprints never
    straddle devices).

Arbitrary geometry: the canvas is zero-padded to the stripe grid
(H2 % (n * 8 * lcm(h_samps)) == 0, W2 % (128 * lcm(w_samps)) == 0) with
the frozen-zero / FREE-sentinel box algebra of the single-chip kernels
(kernels/iter_step.py): padded coefficients carry lo == hi == 0 boxes
(pixels frozen at exactly 0), channels whose region is smaller than the
canvas carry unconstrained +-2^39 boxes over the gap, and the gradient
kernels zero everything outside the true canvas.  Any image stripes.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from jpeg2png_tpu.models.solver import (
    ChannelGeometry, canvas_shape, objective_alphas,
)
from jpeg2png_tpu.ops.blocks import deblockify
from jpeg2png_tpu.ops.dct_raster import (
    idct_raster, sampled_dct, sampled_idct_up,
)
from jpeg2png_tpu.ops.resample import upsample_nearest_clamped
from jpeg2png_tpu.ops.tv_halo import grad_gather_halo

_BIG = jnp.float32(2.0 ** 39)   # FREE box half-width for region gaps


def _lcm(vals) -> int:
    out = 1
    for v in vals:
        out = math.lcm(out, int(v))
    return out


def padded_striped_shape(
    geoms: Tuple[ChannelGeometry, ...], n: int,
) -> Tuple[int, int, int, int, int]:
    """(H, W, H2, W2, L): true canvas, padded striped canvas, band rows.

    H2: rows divisible by n bands of L rows, L aligned to 8*lcm(h_samp)
    so every channel's 8x8 block rows and subsampling footprints stay
    device-local.  W2: width aligned to 128*lcm(w_samp) (Mosaic lane
    tiles at every channel's coefficient resolution).
    """
    H, W = canvas_shape(geoms)
    unit_h = 8 * _lcm(g.h_samp for g in geoms)
    unit_w = 128 * _lcm(g.w_samp for g in geoms)
    H2 = -(-H // (n * unit_h)) * (n * unit_h)
    W2 = -(-W // unit_w) * unit_w
    return H, W, H2, W2, H2 // n


def padded_striped_shape_lite(
    geoms: Tuple[ChannelGeometry, ...], n: int,
) -> Tuple[int, int, int, int, int]:
    """padded_striped_shape for the LITE striped body: band heights
    align to 16*lcm(h_samp) (bf16/int16 HBM tiles are (16, 128)-packed,
    so every DMA row slice — including each channel's coefficient-
    raster band — must be 16-aligned)."""
    H, W = canvas_shape(geoms)
    unit_h = 16 * _lcm(g.h_samp for g in geoms)
    unit_w = 128 * _lcm(g.w_samp for g in geoms)
    H2 = -(-H // (n * unit_h)) * (n * unit_h)
    W2 = -(-W // unit_w) * unit_w
    return H, W, H2, W2, H2 // n


def pallas_striped_lite_supported(
    geoms: Tuple[ChannelGeometry, ...], n: int,
    pweights: Tuple[float, ...],
) -> bool:
    """Whether the LITE striped body (bf16 difference/gradient state +
    coef-space devq carries, kernels/stripe_grad.fused_grad_striped_lite
    + kernels/project_step.fused_project_multi_lite) covers this
    geometry."""
    from jpeg2png_tpu.kernels import project_step, stripe_grad

    if not stripes_supported(geoms, n):
        return False
    H, W, H2, W2, L = padded_striped_shape_lite(geoms, n)
    samps = [(g.h_samp, g.w_samp) for g in geoms]
    prob_mask = tuple(p != 0.0 for p in pweights)
    return (stripe_grad.supports_lite(len(geoms), L, W2, samps,
                                      prob_mask)
            and project_step.supports_multi_lite(L, W2, samps)
            and H2 * W2 <= 2 * H * W)


def striped_carry_kind(
    geoms: Tuple[ChannelGeometry, ...], n: int, use_pallas: bool,
    pweights: Tuple[float, ...],
) -> str:
    """Which striped carry format _build_striped will produce: 'xla' /
    'f32' (f, fista, pixel-space pgrads) or 'lite' (f, bf16 d,
    coef-space bf16 devqs).  Checkpoint fingerprints include this so a
    snapshot from one body is never reinterpreted by another."""
    if not use_pallas:
        return "xla"
    if pallas_striped_lite_supported(geoms, n, tuple(pweights)):
        return "lite"
    return "f32"


def stripes_supported(geoms: Tuple[ChannelGeometry, ...], n: int) -> bool:
    """Whether this geometry can stripe over n devices at all (the
    padding algebra makes that nearly always true)."""
    H, W = canvas_shape(geoms)
    return (n >= 1
            and all(H % g.h_samp == 0 and W % g.w_samp == 0
                    for g in geoms))


def pallas_striped_supported(
    geoms: Tuple[ChannelGeometry, ...], n: int,
) -> bool:
    """Whether the fused Pallas striped body covers this geometry."""
    from jpeg2png_tpu.kernels import project_step, stripe_grad

    if not stripes_supported(geoms, n):
        return False
    _, _, _, W2, L = padded_striped_shape(geoms, n)
    if not stripe_grad.supports(len(geoms), L, W2):
        return False
    return all(
        project_step.supports(L, W2, g.h_samp, g.w_samp)
        and L % (8 * g.h_samp) == 0
        for g in geoms)


def _padded_consts(datas, quants, geoms, H, W, H2, W2):
    """Per-channel (dq, lo, hi, iq) at padded-coef shape plus the
    initial canvas f0 [C, H2, W2].

    Three zones per channel (kernels/iter_step.py algebra):
      * true region: real boxes lo/hi = data*q -+ q/2, iq = 1/q;
      * region -> true-canvas gap: FREE boxes (+-2^39), iq = 0 — those
        canvas pixels evolve unconstrained (compute.c:349-403 bounds);
      * canvas padding: lo == hi == 0, iq = 0 — frozen at exactly 0.
    """
    f32 = jnp.float32
    dqs, los, his, iqs = [], [], [], []
    f0s = []
    for d, q, g in zip(datas, quants, geoms):
        sy, sx = g.h_samp, g.w_samp
        q_r = jnp.tile(q.astype(f32), (g.nby, g.nbx))
        dq = deblockify(d.astype(f32)) * q_r
        lo = dq - 0.5 * q_r
        hi = dq + 0.5 * q_r
        iq = 1.0 / q_r
        hc_t, wc_t = H // sy, W // sx
        if dq.shape != (hc_t, wc_t):
            pad = ((0, hc_t - dq.shape[0]), (0, wc_t - dq.shape[1]))
            lo = jnp.pad(lo, pad, constant_values=-_BIG)
            hi = jnp.pad(hi, pad, constant_values=_BIG)
            dq = jnp.pad(dq, pad)
            iq = jnp.pad(iq, pad)
        hc_p, wc_p = H2 // sy, W2 // sx
        if (hc_p, wc_p) != (hc_t, wc_t):
            pad = ((0, hc_p - hc_t), (0, wc_p - wc_t))
            lo = jnp.pad(lo, pad)
            hi = jnp.pad(hi, pad)
            dq = jnp.pad(dq, pad)
            iq = jnp.pad(iq, pad)
        dqs.append(dq)
        los.append(lo)
        his.append(hi)
        iqs.append(iq)
        # plain decode, nearest-upsampled + edge-clamped to the true
        # canvas (compute.c:296-302), zero-padded to the striped grid
        dec = upsample_nearest_clamped(
            idct_raster(deblockify(d.astype(f32))
                        * jnp.tile(q.astype(f32), (g.nby, g.nbx))),
            sy, sx, H, W)
        f0s.append(jnp.pad(dec, ((0, H2 - H), (0, W2 - W))))
    return dqs, los, his, iqs, jnp.stack(f0s)


def _free_q():
    from jpeg2png_tpu.kernels.project_step import FREE_Q
    return jnp.float32(FREE_Q)


def _padded_consts_lite(datas, quants, geoms, H, W, H2, W2):
    """Lite const rasters: per-channel (dat int16, q f32) at padded
    coefficient shape, plus the initial canvas f0 [C, H2, W2].

    The quant raster encodes the three box zones in ONE array
    (kernels/iter_step.py:433-458 algebra): real q in the true region,
    q == 0 in frozen canvas padding, q >= 2^39 (FREE) over
    region-to-canvas gaps — the projection kernel derives lo/hi/iq
    from (dat, q) in-kernel."""
    f32 = jnp.float32
    dats, qs, f0s = [], [], []
    for d, q, g in zip(datas, quants, geoms):
        sy, sx = g.h_samp, g.w_samp
        q_r = jnp.tile(q.astype(f32), (g.nby, g.nbx))
        di = deblockify(d.astype(jnp.int16))
        hc_t, wc_t = H // sy, W // sx
        if di.shape != (hc_t, wc_t):
            pad = ((0, hc_t - di.shape[0]), (0, wc_t - di.shape[1]))
            di = jnp.pad(di, pad)
            q_r = jnp.pad(q_r, pad, constant_values=_free_q())
        hc_p, wc_p = H2 // sy, W2 // sx
        if (hc_p, wc_p) != (hc_t, wc_t):
            pad = ((0, hc_p - hc_t), (0, wc_p - wc_t))
            di = jnp.pad(di, pad)
            q_r = jnp.pad(q_r, pad)      # q 0: frozen at 0
        dats.append(di)
        qs.append(q_r)
        dec = upsample_nearest_clamped(
            idct_raster(deblockify(d.astype(f32))
                        * jnp.tile(q.astype(f32), (g.nby, g.nbx))),
            sy, sx, H, W)
        f0s.append(jnp.pad(dec, ((0, H2 - H), (0, W2 - W))))
    return dats, qs, jnp.stack(f0s)


def _build_striped_lite(
    geoms: Tuple[ChannelGeometry, ...],
    weight: float,
    pweights: Tuple[float, ...],
    iterations: int,
    simd_compat_logging: bool,
    mesh: Mesh,
    nsteps: int,
    batch: bool,
):
    """LITE striped solver body (see _build_striped for the contract):
    bf16 FISTA-difference + gradient state, coef-space bf16 devq prob
    carries, and in-kernel clamp boxes from int16 + quant rasters — the
    two-lite HBM diet (kernels/grad_step._kernel_lite rationale)
    applied per band.  Per iteration each device still issues exactly
    THREE collectives: two batched halo ppermutes (f f32 + d-as-f32
    slivers, 16 rows each for the bf16 DMA tiling) and the fused [C+3]
    vector psum."""
    nchannel = len(geoms)
    n = mesh.shape["y"]
    H, W, H2, W2, L = padded_striped_shape_lite(geoms, n)

    radius = math.sqrt(float(H) * float(W)) / 2.0
    step_size = radius / math.sqrt(1.0 + iterations)
    p_alphas, total_alpha = objective_alphas(weight, pweights, nchannel)
    samp_list = [(g.h_samp, g.w_samp) for g in geoms]
    pa_sss = tuple(
        p_alphas[c] * g.h_samp * g.w_samp if p_alphas[c] != 0.0 else 0.0
        for c, g in enumerate(geoms))
    prob_on = [p_alphas[c] != 0.0 for c in range(nchannel)]
    n_prob = sum(prob_on)

    up_perm = [(i, i + 1) for i in range(n - 1)]
    down_perm = [(i + 1, i) for i in range(n - 1)]

    def fista_factor(t):
        tnext = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) / 2.0
        return tnext, (t - 1.0) / tnext

    def shard_body(*args):
        from jpeg2png_tpu.kernels import project_step
        from jpeg2png_tpu.kernels.stripe_grad import (
            fused_grad_striped_lite)

        dats = args[0:nchannel]            # [L//sy, W2//sx] i16 band
        qs = args[nchannel:2 * nchannel]
        f_in = args[2 * nchannel]          # [C, L, W2] f32
        d_in = args[2 * nchannel + 1]      # [C, L, W2] bf16
        devq_in = args[2 * nchannel + 2:2 * nchannel + 2 + n_prob]
        pd0 = args[2 * nchannel + 2 + n_prob]
        t0 = args[2 * nchannel + 3 + n_prob]

        idx = jax.lax.axis_index("y")
        row0 = idx * L
        f32 = jnp.float32

        def body(carry, _):
            fdatas, ds, devqs, prob_dist, t = carry
            tnext, factor = fista_factor(t)

            # --- 16-row halo exchange (bf16 DMA slices must be
            #     16-aligned; f rides in f32, d upcast to f32 so all
            #     channels share ONE payload per direction) ---
            up_payload = jnp.concatenate(
                [f[-16:, :] for f in fdatas]
                + [d[-16:, :].astype(f32) for d in ds], axis=0)
            down_payload = jnp.concatenate(
                [f[:16, :] for f in fdatas]
                + [d[:16, :].astype(f32) for d in ds], axis=0)
            tops = jax.lax.ppermute(up_payload, "y", up_perm)
            bots = jax.lax.ppermute(down_payload, "y", down_perm)
            f_tops = [tops[16 * c:16 * c + 16, :]
                      for c in range(nchannel)]
            d_tops = [tops[16 * (nchannel + c):16 * (nchannel + c) + 16,
                           :].astype(jnp.bfloat16)
                      for c in range(nchannel)]
            f_bots = [bots[16 * c:16 * c + 16, :]
                      for c in range(nchannel)]
            d_bots = [bots[16 * (nchannel + c):16 * (nchannel + c) + 16,
                           :].astype(jnp.bfloat16)
                      for c in range(nchannel)]

            grads, sumsq_l, tv_l, tv2_l = fused_grad_striped_lite(
                list(fdatas), list(ds), list(devqs),
                (f_tops, f_bots, d_tops, d_bots),
                factor, row0, weight, samp_list, pa_sss, H2, H, W)

            # ONE fused [C+3] vector psum: gradient norms (global step
            # normalization, compute.c:200-216), tv/tv2 sums and the
            # PREVIOUS iteration's prob distance (deferred for free)
            vec = jnp.concatenate(
                [sumsq_l, jnp.stack([tv_l, tv2_l, prob_dist[0]])])
            vec = jax.lax.psum(vec, "y")
            sumsq = vec[:nchannel]
            tv, tv2, pdist = (vec[nchannel], vec[nchannel + 1],
                              vec[nchannel + 2])
            norms = jnp.sqrt(sumsq)
            scale = jnp.where(norms == 0.0, 0.0, step_size / norms)

            fnews, dnews, devq_news, dists = (
                project_step.fused_project_multi_lite(
                    list(fdatas), list(ds), grads, factor, scale,
                    list(dats), list(qs), pa_sss, samp_list))
            dist_local = jnp.float32(0.0)
            for c in range(nchannel):
                d = dists[c]
                if prob_on[c] and not simd_compat_logging:
                    d = p_alphas[c] * d
                dist_local = dist_local + d

            objective = (tv + tv2 + pdist) / jnp.float32(total_alpha)
            metrics = jnp.stack([objective, pdist, tv, tv2])
            carry_out = (tuple(fnews), tuple(dnews),
                         tuple(dv for dv in devq_news
                               if dv is not None),
                         jnp.reshape(dist_local, (1,)), tnext)
            return carry_out, metrics

        init = (
            tuple(f_in[c] for c in range(nchannel)),
            tuple(d_in[c] for c in range(nchannel)),
            tuple(devq_in),
            pd0,
            t0,
        )
        (fdata, dd, dqs_out, pd, t), metrics = jax.lax.scan(
            body, init, None, length=nsteps)
        outs = [jnp.stack(fdata), metrics, jnp.stack(dd)]
        outs += list(dqs_out)
        outs += [pd, t]
        return tuple(outs)


    band = P(None, "y", None)
    coef = P("y", None)
    in_specs = ([coef] * (2 * nchannel) + [band, band]
                + [coef] * n_prob + [P("y"), P()])
    out_specs = ([band, P(), band] + [coef] * n_prob
                 + [P("y"), P()])

    body = shard_body
    if batch:
        def _prepend(spec):
            return P("batch", *spec)

        in_specs = [_prepend(s) for s in in_specs[:-1]] + [P()]
        out_specs = [_prepend(s) for s in out_specs[:-1]] + [P()]

        def body(*args):  # noqa: F811 - deliberate wrap
            outs = shard_body(*[a[0] for a in args[:-1]], args[-1])
            return tuple(o[None] for o in outs[:-1]) + (outs[-1],)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        check_vma=False,
    )

    def zero_carry_tail(lead=()):
        d0 = jnp.zeros(lead + (nchannel, H2, W2), jnp.bfloat16)
        dq0 = [jnp.zeros(lead + (H2 // g.h_samp, W2 // g.w_samp),
                         jnp.bfloat16)
               for c, g in enumerate(geoms) if prob_on[c]]
        return d0, dq0

    def solve(datas, quants, carry=None):
        if batch:
            per = [_padded_consts_lite(d, q, geoms, H, W, H2, W2)
                   for d, q in zip(datas, quants)]
            B = len(per)
            dats = [jnp.stack([p[0][c] for p in per])
                    for c in range(nchannel)]
            qs = [jnp.stack([p[1][c] for p in per])
                  for c in range(nchannel)]
            f0 = jnp.stack([p[2] for p in per])
            dats, qs, f0 = jax.lax.optimization_barrier(
                (dats, qs, f0))
            if carry is None:
                d0, dq0 = zero_carry_tail((B,))
                carry = (f0, d0, *dq0,
                         jnp.zeros((B, n), jnp.float32),
                         jnp.float32(1.0))
            outs = sharded(*dats, *qs, *carry)
            fdata, metrics = outs[0], outs[1]
            carry_out = (fdata,) + tuple(outs[2:])
            return fdata[:, :, :H, :W], metrics, carry_out
        dats, qs, f0 = _padded_consts_lite(
            datas, quants, geoms, H, W, H2, W2)
        # pin the padded constants against while-loop constant sinking
        # (the round-3 striped-path lesson, see _build_striped)
        dats, qs, f0 = jax.lax.optimization_barrier((dats, qs, f0))
        if carry is None:
            d0, dq0 = zero_carry_tail()
            carry = (f0, d0, *dq0,
                     jnp.zeros((n,), jnp.float32), jnp.float32(1.0))
        outs = sharded(*dats, *qs, *carry)
        fdata, metrics = outs[0], outs[1]
        carry_out = (fdata,) + tuple(outs[2:])
        return fdata[:, :H, :W], metrics, carry_out

    return jax.jit(solve)


@functools.lru_cache(maxsize=32)
def _build_striped(
    geoms: Tuple[ChannelGeometry, ...],
    weight: float,
    pweights: Tuple[float, ...],
    iterations: int,
    simd_compat_logging: bool,
    mesh: Mesh,
    use_pallas: bool,
    nsteps: int | None = None,
    batch: bool = False,
):
    """Jitted resumable striped solver: solve(datas, quants, carry) ->
    (fdata cropped, metrics [nsteps, 4], carry_out).  carry=None starts
    fresh; `iterations` is the TOTAL planned count (fixes the step
    size, compute.c:443) while `nsteps` is this chunk's length — so
    long striped runs stream progress/CSV in chunks exactly like the
    single-chip path (models/solver.solve_joint_chunked).

    batch=True serves a 2-D ("batch", "y") mesh: B same-geometry images
    each striped over the "y" sub-axis while the batch spreads over
    "batch" (SURVEY.md §5's pod topology for many files x giant files).
    datas/quants then carry a leading [B] dim and exactly one image
    lives per batch shard; the per-image body is unchanged — its "y"
    collectives stay within each image's stripe group."""
    if nsteps is None:
        nsteps = iterations
    nchannel = len(geoms)
    n = mesh.shape["y"]
    lite = bool(use_pallas) and pallas_striped_lite_supported(
        geoms, n, pweights)
    if lite:
        return _build_striped_lite(
            geoms, weight, pweights, iterations, simd_compat_logging,
            mesh, nsteps, batch)
    H, W, H2, W2, L = padded_striped_shape(geoms, n)

    # step size keys on the TRUE canvas (compute.c:425)
    radius = math.sqrt(float(H) * float(W)) / 2.0
    step_size = radius / math.sqrt(1.0 + iterations)
    p_alphas, total_alpha = objective_alphas(weight, pweights, nchannel)

    up_perm = [(i, i + 1) for i in range(n - 1)]    # my bottom rows -> next
    down_perm = [(i + 1, i) for i in range(n - 1)]  # my top rows -> prev

    def fista_factor(t):
        tnext = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) / 2.0
        return tnext, (t - 1.0) / tnext

    def make_project(los, his, dqs, iqs):
        """Per-channel normalized-step output -> (fnew, pgrad, dist):
        XLA form shared by both bodies; the Pallas body overrides with
        kernels/project_step.py."""
        def project_prob(c, g, fmid_c):
            sy, sx = g.h_samp, g.w_samp
            ss = float(sy * sx)
            coefs = sampled_dct(fmid_c, sy, sx)
            clamped = jnp.clip(coefs, los[c], his[c])
            fnew = fmid_c + ss * sampled_idct_up(clamped - coefs, sy, sx)
            if p_alphas[c] == 0.0:
                return fnew, None, jnp.float32(0.0)
            devp = (clamped - dqs[c]) * iqs[c]
            dist = 0.5 * jnp.sum(devp * devp, dtype=jnp.float32)
            if not simd_compat_logging:
                dist = p_alphas[c] * dist
            pgrad = (p_alphas[c] * ss) * sampled_idct_up(
                devp * iqs[c], sy, sx)
            return fnew, pgrad, dist
        return project_prob

    n_prob = sum(1 for c in range(nchannel) if p_alphas[c] != 0.0)

    def shard_body(*args):
        """Runs per device under shard_map; args are local shards:
        4C box/prob constants, then the carry (f, fista [C, L, W2],
        prob pixel-gradients [P, L, W2] when any, prob_dist, t)."""
        dqs = args[0:nchannel]
        los = args[nchannel:2 * nchannel]
        his = args[2 * nchannel:3 * nchannel]
        iqs = args[3 * nchannel:4 * nchannel]
        f_in = args[4 * nchannel]             # [C, L, W2] local band
        fi_in = args[4 * nchannel + 1]
        if n_prob:
            pg_stack = args[4 * nchannel + 2]
            pd0, t0 = args[4 * nchannel + 3], args[4 * nchannel + 4]
        else:
            pg_stack = None
            pd0, t0 = args[4 * nchannel + 2], args[4 * nchannel + 3]

        idx = jax.lax.axis_index("y")
        row0 = idx * L
        project_prob = make_project(los, his, dqs, iqs)
        prob_on = [p_alphas[c] != 0.0 for c in range(nchannel)]

        def finish_iteration(extraps, grads, sumsq_l, tv_l, tv2_l,
                             fdatas, pd_local, tnext):
            """ONE fused global psum + normalized step + projection;
            shared by the Pallas and XLA bodies.

            All per-iteration scalar couplings ride one [C+3] vector
            all-reduce: the C gradient norms (the reference's global
            do_step normalization, compute.c:200-216), the tv/tv2
            objective sums, and the PREVIOUS iteration's prob distance
            — the prob term is logged one iteration behind anyway
            (compute.c:381 reads the previous projection's cos), so its
            psum defers into the next iteration's vector for free.
            pd_local is each device's (1,) local partial."""
            vec = jnp.concatenate(
                [sumsq_l, jnp.stack([tv_l, tv2_l, pd_local[0]])])
            vec = jax.lax.psum(vec, "y")
            sumsq = vec[:nchannel]
            tv, tv2, prob_dist = vec[nchannel], vec[nchannel + 1], \
                vec[nchannel + 2]
            norms = jnp.sqrt(sumsq)
            scale = jnp.where(norms == 0.0, 0.0, step_size / norms)

            new_f, new_pg = [], []
            dist_local = jnp.float32(0.0)
            if use_pallas:
                from jpeg2png_tpu.kernels import project_step

                samp_list = [(g.h_samp, g.w_samp) for g in geoms]
                pa_ss = [p_alphas[c] * g.h_samp * g.w_samp
                         if prob_on[c] else 0.0
                         for c, g in enumerate(geoms)]
                if project_step.supports_multi(L, W2, samp_list):
                    # all C channels' projections in ONE dispatch
                    new_f, pgs, dists = (
                        project_step.fused_project_multi(
                            list(extraps), list(grads), scale,
                            list(los), list(his),
                            [dqs[c] if prob_on[c] else None
                             for c in range(nchannel)],
                            [iqs[c] if prob_on[c] else None
                             for c in range(nchannel)],
                            pa_ss, samp_list))
                    for c in range(nchannel):
                        d = dists[c]
                        if prob_on[c] and not simd_compat_logging:
                            d = p_alphas[c] * d
                        dist_local = dist_local + d
                        if pgs[c] is not None:
                            new_pg.append(pgs[c])
                else:
                    for c, g in enumerate(geoms):
                        fn, pg, d = project_step.fused_project(
                            extraps[c], grads[c], scale[c],
                            los[c], his[c],
                            dqs[c] if prob_on[c] else None,
                            iqs[c] if prob_on[c] else None,
                            pa_ss[c], g.h_samp, g.w_samp)
                        if prob_on[c] and not simd_compat_logging:
                            d = p_alphas[c] * d
                        new_f.append(fn)
                        if pg is not None:
                            new_pg.append(pg)
                        dist_local = dist_local + d
            else:
                for c, g in enumerate(geoms):
                    fmid = extraps[c] - grads[c] * scale[c]
                    fn, pg, d = project_prob(c, g, fmid)
                    new_f.append(fn)
                    if pg is not None:
                        new_pg.append(pg)
                    dist_local = dist_local + d

            objective = (tv + tv2 + prob_dist) / jnp.float32(total_alpha)
            metrics = jnp.stack([objective, prob_dist, tv, tv2])
            carry = (tuple(new_f), tuple(fdatas), tuple(new_pg),
                     jnp.reshape(dist_local, (1,)), tnext)
            return carry, metrics

        def body_pallas(carry, _):
            from jpeg2png_tpu.kernels.stripe_grad import fused_grad_striped

            fdatas, fistas, pgrads, prob_dist, t = carry
            tnext, factor = fista_factor(t)

            # --- 8-row halo exchange over ICI (zeros at boundaries);
            #     8 not 2 because DMA row slices must be 8-aligned.
            #     ALL channels' f and fista slivers ride ONE ppermute
            #     per direction (a [2C*8, W] payload): at pod scale the
            #     striped iteration is latency-bound, so collective
            #     COUNT, not bytes, is the efficiency knob ---
            up_payload = jnp.concatenate(
                [f[-8:, :] for f in fdatas]
                + [f[-8:, :] for f in fistas], axis=0)
            down_payload = jnp.concatenate(
                [f[:8, :] for f in fdatas]
                + [f[:8, :] for f in fistas], axis=0)
            tops = jax.lax.ppermute(up_payload, "y", up_perm)
            bots = jax.lax.ppermute(down_payload, "y", down_perm)
            f_tops = [tops[8 * c:8 * c + 8, :] for c in range(nchannel)]
            fi_tops = [tops[8 * (nchannel + c):8 * (nchannel + c) + 8, :]
                       for c in range(nchannel)]
            f_bots = [bots[8 * c:8 * c + 8, :] for c in range(nchannel)]
            fi_bots = [bots[8 * (nchannel + c):8 * (nchannel + c) + 8, :]
                       for c in range(nchannel)]

            pg_in, k = [], 0
            for c in range(nchannel):
                if prob_on[c]:
                    pg_in.append(pgrads[k])
                    k += 1
                else:
                    pg_in.append(None)
            grads, extraps, sumsq_l, tv_l, tv2_l = fused_grad_striped(
                list(fdatas), list(fistas), pg_in,
                (f_tops, f_bots, fi_tops, fi_bots),
                factor, row0, weight, H, W)
            return finish_iteration(
                extraps, grads, sumsq_l, tv_l, tv2_l,
                fdatas, prob_dist, tnext)

        def body_xla(carry, _):
            fdatas, fistas, pgrads, prob_dist, t = carry
            tnext, factor = fista_factor(t)
            fstack = jnp.stack(fdatas)
            extrap = fstack + factor * (fstack - jnp.stack(fistas))

            # --- 2-row halo exchange over ICI (zeros at boundaries) ---
            top_halo = jax.lax.ppermute(extrap[:, -2:, :], "y", up_perm)
            bot_halo = jax.lax.ppermute(extrap[:, :2, :], "y", down_perm)
            ext = jnp.concatenate([top_halo, extrap, bot_halo], axis=1)

            grad, tv_l, tv2_l = grad_gather_halo(
                ext, row0, H, weight, w_true=W)
            k = 0
            for c in range(nchannel):
                if prob_on[c]:
                    grad = grad.at[c].add(pgrads[k])
                    k += 1
            sumsq_l = jnp.sum(grad * grad, axis=(1, 2))
            return finish_iteration(
                [extrap[c] for c in range(nchannel)],
                [grad[c] for c in range(nchannel)],
                sumsq_l, tv_l, tv2_l, fdatas, prob_dist, tnext)

        init = (
            tuple(f_in[c] for c in range(nchannel)),
            tuple(fi_in[c] for c in range(nchannel)),
            tuple(pg_stack[p] for p in range(n_prob)) if n_prob else (),
            pd0,
            t0,
        )
        (fdata, fista, pgs, pd, t), metrics = jax.lax.scan(
            body_pallas if use_pallas else body_xla, init, None,
            length=nsteps)
        outs = [jnp.stack(fdata), metrics, jnp.stack(fista)]
        if n_prob:
            outs.append(jnp.stack(pgs))
        outs += [pd, t]
        return tuple(outs)


    # the prob-dist carry is a per-device (1,) LOCAL partial (its psum
    # is deferred into the next iteration's fused vector all-reduce),
    # so it shards P("y") — global shape (n,) — instead of replicating
    band = P(None, "y", None)
    in_specs = ([P("y", None)] * (4 * nchannel) + [band, band]
                + ([band] if n_prob else []) + [P("y"), P()])
    out_specs = ([band, P(), band] + ([band] if n_prob else [])
                 + [P("y"), P()])

    body = shard_body
    if batch:
        # 2-D mesh: every spec (except the replicated scalar t) gains a
        # leading "batch" dim; each batch shard holds exactly ONE image
        # (local leading extent 1), so the per-image body runs
        # unchanged on the squeezed shard and the result re-gains the
        # leading axis.  The "y" collectives stay per-image: shard_map
        # collectives over one axis never cross the other.
        def _prepend(spec):
            return P("batch", *spec)

        in_specs = [_prepend(s) for s in in_specs[:-1]] + [P()]
        out_specs = [_prepend(s) for s in out_specs[:-1]] + [P()]

        def body(*args):  # noqa: F811 - deliberate wrap
            outs = shard_body(*[a[0] for a in args[:-1]], args[-1])
            return tuple(o[None] for o in outs[:-1]) + (outs[-1],)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        check_vma=False,
    )

    def solve(datas, quants, carry=None):
        if batch:
            # datas/quants: [B][C]; stack per-channel consts over B
            per = [_padded_consts(d, q, geoms, H, W, H2, W2)
                   for d, q in zip(datas, quants)]
            B = len(per)
            dqs = [jnp.stack([p[0][c] for p in per])
                   for c in range(nchannel)]
            los = [jnp.stack([p[1][c] for p in per])
                   for c in range(nchannel)]
            his = [jnp.stack([p[2][c] for p in per])
                   for c in range(nchannel)]
            iqs = [jnp.stack([p[3][c] for p in per])
                   for c in range(nchannel)]
            f0 = jnp.stack([p[4] for p in per])
            # pin the padded constants (see the non-batch branch)
            dqs, los, his, iqs, f0 = jax.lax.optimization_barrier(
                (dqs, los, his, iqs, f0))
            if carry is None:
                pgz = ([jnp.zeros((B, n_prob, H2, W2), jnp.float32)]
                       if n_prob else [])
                carry = (f0, f0, *pgz,
                         jnp.zeros((B, n), jnp.float32),
                         jnp.float32(1.0))
            outs = sharded(*dqs, *los, *his, *iqs, *carry)
            fdata, metrics = outs[0], outs[1]
            carry_out = (fdata,) + tuple(outs[2:])
            return fdata[:, :, :H, :W], metrics, carry_out
        dqs, los, his, iqs, f0 = _padded_consts(
            datas, quants, geoms, H, W, H2, W2)
        # pin the padded constants: without this barrier XLA's
        # while-loop constant sinking re-materializes the tile/pad
        # broadcasts INSIDE the solve loop — profiled at ~1.1 ms/iter
        # of reshape+broadcast at 6.29 MP (the same trap solver.py:194
        # pins on the single-chip path)
        dqs, los, his, iqs, f0 = jax.lax.optimization_barrier(
            (dqs, los, his, iqs, f0))
        if carry is None:
            pgz = ([jnp.zeros((n_prob, H2, W2), jnp.float32)]
                   if n_prob else [])
            carry = (f0, f0, *pgz,
                     jnp.zeros((n,), jnp.float32), jnp.float32(1.0))
        outs = sharded(*dqs, *los, *his, *iqs, *carry)
        fdata, metrics = outs[0], outs[1]
        carry_out = (fdata,) + tuple(outs[2:])
        return fdata[:, :H, :W], metrics, carry_out

    return jax.jit(solve)


def solve_striped_batched(
    datas: Sequence[Sequence[np.ndarray]],   # [B][C]
    quants: Sequence[Sequence[np.ndarray]],  # [B][C]
    samps: Sequence[Tuple[int, int]],
    weight: float,
    pweights: Sequence[float],
    iterations: int,
    mesh: Mesh,
    simd_compat_logging: bool = True,
    use_pallas: Optional[bool] = None,
):
    """B same-geometry images, each striped over the mesh's "y" axis,
    batched over its "batch" axis — the 2-D pod topology for serving
    many giant files at once (SURVEY.md §5).  Requires
    mesh.shape["batch"] == B (one image per batch shard).

    Returns (fdata [B, C, H, W], metrics [B, iterations, 4])."""
    geoms = tuple(
        ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
        for d, (sy, sx) in zip(datas[0], samps)
    )
    n = mesh.shape["y"]
    nb = mesh.shape["batch"]
    if len(datas) != nb:
        raise ValueError(
            f"batch size {len(datas)} != mesh batch axis {nb}")
    if not stripes_supported(geoms, n):
        raise ValueError(
            f"geometry {geoms} cannot be striped over {n} devices")
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and (pallas_striped_supported(geoms, n)
                           or pallas_striped_lite_supported(
                               geoms, n, tuple(
                                   float(p) for p in pweights))))
    solver = _build_striped(
        geoms, float(weight), tuple(float(p) for p in pweights),
        int(iterations), bool(simd_compat_logging), mesh,
        bool(use_pallas), None, True)
    d_dev = [[jnp.asarray(d) for d in img] for img in datas]
    q_dev = [[jnp.asarray(q) for q in img] for img in quants]
    fdata, metrics, _ = solver(d_dev, q_dev, None)
    return fdata, metrics


def solve_striped(
    datas: Sequence[np.ndarray],
    quants: Sequence[np.ndarray],
    samps: Sequence[Tuple[int, int]],
    weight: float,
    pweights: Sequence[float],
    iterations: int,
    mesh: Mesh,
    simd_compat_logging: bool = True,
    use_pallas: Optional[bool] = None,
    on_chunk=None,
    chunk: Optional[int] = None,
):
    """Striped multi-device solve.  Same contract as solve_joint.

    on_chunk(done_iterations, metrics_chunk), when given, switches to
    resumable chunked execution (numerically identical) so progress
    and CSV rows stream during the solve."""
    geoms = tuple(
        ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
        for d, (sy, sx) in zip(datas, samps)
    )
    n = mesh.shape["y"]
    if not stripes_supported(geoms, n):
        raise ValueError(
            f"geometry {geoms} cannot be striped over {n} devices")
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and (pallas_striped_supported(geoms, n)
                           or pallas_striped_lite_supported(
                               geoms, n, tuple(
                                   float(p) for p in pweights))))
    key = (geoms, float(weight), tuple(float(p) for p in pweights),
           int(iterations), bool(simd_compat_logging), mesh,
           bool(use_pallas))
    d_dev = [jnp.asarray(d) for d in datas]
    q_dev = [jnp.asarray(q) for q in quants]
    if on_chunk is None:
        fdata, metrics, _ = _build_striped(*key)(d_dev, q_dev, None)
        return fdata, metrics
    # chunked execution: the carry resumes exactly (step size keys on
    # the TOTAL count), so the progress bar ticks and the CSV streams
    # during giant striped solves too
    if chunk is None:
        chunk = max(8, min(50, iterations // 20 or iterations))
    done = 0
    carry = None
    fdata = None
    all_metrics = []
    while done < iterations:
        nn = min(chunk, iterations - done)
        fdata, metrics, carry = _build_striped(*key, nn)(
            d_dev, q_dev, carry)
        metrics = np.asarray(metrics)
        done += nn
        all_metrics.append(metrics)
        on_chunk(done, metrics)
    return fdata, np.concatenate(all_metrics)
