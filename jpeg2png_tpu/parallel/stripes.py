"""Spatially-sharded solver: one image striped across a device mesh.

The multi-chip scaling path (BASELINE.json config 5: a giant image
sharded into row stripes across N >= 2 hosts).  Each device owns a
contiguous band of rows of every channel; per iteration:

  * 1 halo exchange of 2 boundary rows of the extrapolated iterate
    (jax.lax.ppermute — ICI neighbours; devices at the global image
    boundary receive zeros, which the gather masks treat as
    "outside the image"),
  * TV/TGV2 gather gradient on the halo-extended band (ops/tv_halo.py),
  * 1 psum for the per-channel gradient norms — the step normalization
    is GLOBAL over the whole image (compute.c:200-216), this is the
    collective the reference's shared-memory design gets for free,
  * 1 psum for the objective sums (tv, tv2, prob_dist),
  * block-local DCT box projection and prob gradient per band (stripe
    boundaries are 8*h_samp-aligned by construction so 8x8 blocks and
    subsampling footprints never straddle devices).

Alignment requirement: H % (n_devices * 8 * max_h_samp) == 0 — the
caller pads/bucketizes giant inputs to this grid.  All channels must
cover the full canvas (true for aligned inputs).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jpeg2png_tpu.models.solver import ChannelGeometry, canvas_shape
from jpeg2png_tpu.ops.blocks import deblockify
from jpeg2png_tpu.ops.dct_raster import (
    idct_raster, sampled_dct, sampled_idct_up,
)
from jpeg2png_tpu.ops.resample import upsample_replicate
from jpeg2png_tpu.ops.tv_halo import grad_gather_halo


def stripes_supported(geoms: Tuple[ChannelGeometry, ...], n: int) -> bool:
    H, W = canvas_shape(geoms)
    align = n * 8 * max(g.h_samp for g in geoms)
    if H % align or W % 8:
        return False
    # every channel must cover the full canvas
    return all(g.region_h == H and g.region_w == W for g in geoms)


@functools.lru_cache(maxsize=16)
def _build_striped(
    geoms: Tuple[ChannelGeometry, ...],
    weight: float,
    pweights: Tuple[float, ...],
    iterations: int,
    simd_compat_logging: bool,
    mesh: Mesh,
):
    nchannel = len(geoms)
    H, W = canvas_shape(geoms)
    n = mesh.shape["y"]
    assert stripes_supported(geoms, n), (geoms, n)
    L = H // n  # full-res rows per device

    radius = math.sqrt(float(H) * float(W)) / 2.0
    step_size = radius / math.sqrt(1.0 + iterations)
    p_alphas = [pw * 2.0 * 255.0 * math.sqrt(2.0) for pw in pweights]
    total_alpha = sum(pa for pa in p_alphas if pa != 0.0) + nchannel
    if weight != 0.0:
        total_alpha += (weight / math.sqrt(2.0)) * nchannel

    up_perm = [(i, i + 1) for i in range(n - 1)]    # my bottom rows -> next
    down_perm = [(i + 1, i) for i in range(n - 1)]  # my top rows -> prev

    def shard_body(*consts_and_f0):
        """Runs per device under shard_map; args are local shards."""
        dqs = consts_and_f0[0:nchannel]
        los = consts_and_f0[nchannel:2 * nchannel]
        his = consts_and_f0[2 * nchannel:3 * nchannel]
        inv_qs = consts_and_f0[3 * nchannel:4 * nchannel]
        f0 = consts_and_f0[4 * nchannel]      # [C, L, W] local band

        idx = jax.lax.axis_index("y")
        row0 = idx * L

        def fista_factor(t):
            tnext = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) / 2.0
            return tnext, (t - 1.0) / tnext

        def project_prob(c, g, fmid_c):
            sy, sx = g.h_samp, g.w_samp
            ss = float(sy * sx)
            coefs = sampled_dct(fmid_c, sy, sx)
            clamped = jnp.clip(coefs, los[c], his[c])
            fnew = fmid_c + ss * sampled_idct_up(clamped - coefs, sy, sx)
            if p_alphas[c] == 0.0:
                return fnew, jnp.zeros_like(fmid_c), jnp.float32(0.0)
            devp = (clamped - dqs[c]) * inv_qs[c]
            dist = 0.5 * jnp.sum(devp * devp, dtype=jnp.float32)
            if not simd_compat_logging:
                dist = p_alphas[c] * dist
            pgrad = (p_alphas[c] * ss) * sampled_idct_up(
                devp * inv_qs[c], sy, sx)
            return fnew, pgrad, dist

        def body(carry, _):
            fdata, fista, pgrad, prob_dist, t = carry
            tnext, factor = fista_factor(t)
            extrap = fdata + factor * (fdata - fista)

            # --- 2-row halo exchange over ICI (zeros at boundaries) ---
            top_halo = jax.lax.ppermute(extrap[:, -2:, :], "y", up_perm)
            bot_halo = jax.lax.ppermute(extrap[:, :2, :], "y", down_perm)
            ext = jnp.concatenate([top_halo, extrap, bot_halo], axis=1)

            grad, tv_p, tv2_p = grad_gather_halo(ext, row0, H, weight)
            grad = grad + pgrad

            # --- global norms / objective sums (the one global
            #     synchronization the algorithm truly needs) ---
            sumsq = jax.lax.psum(
                jnp.sum(grad * grad, axis=(1, 2)), "y")
            tv = jax.lax.psum(tv_p, "y")
            tv2 = jax.lax.psum(tv2_p, "y")

            norms = jnp.sqrt(sumsq)
            scale = jnp.where(norms == 0.0, 0.0, step_size / norms)
            fmid = extrap - grad * scale[:, None, None]

            new_f = []
            new_pg = []
            dist_local = jnp.float32(0.0)
            for c, g in enumerate(geoms):
                fn, pg, d = project_prob(c, g, fmid[c])
                new_f.append(fn)
                new_pg.append(pg)
                dist_local = dist_local + d
            prob_dist_next = jax.lax.psum(dist_local, "y")

            objective = (tv + tv2 + prob_dist) / jnp.float32(total_alpha)
            metrics = jnp.stack([objective, prob_dist, tv, tv2])
            carry = (jnp.stack(new_f), fdata, jnp.stack(new_pg),
                     prob_dist_next, tnext)
            return carry, metrics

        init = (f0, f0, jnp.zeros_like(f0), jnp.float32(0.0),
                jnp.float32(1.0))
        (fdata, _, _, _, _), metrics = jax.lax.scan(
            body, init, None, length=iterations)
        return fdata, metrics

    from jax.experimental.shard_map import shard_map

    sharded = shard_map(
        shard_body, mesh=mesh,
        in_specs=tuple([P("y", None)] * (4 * nchannel) + [P(None, "y", None)]),
        out_specs=(P(None, "y", None), P()),
        check_rep=False,
    )

    def solve(datas, quants):
        f32 = jnp.float32
        q_rs = [jnp.tile(q.astype(f32), (g.nby, g.nbx))
                for q, g in zip(quants, geoms)]
        data_rs = [deblockify(d.astype(f32)) for d in datas]
        dqs = [dr * qr for dr, qr in zip(data_rs, q_rs)]
        los = [dq - 0.5 * qr for dq, qr in zip(dqs, q_rs)]
        his = [dq + 0.5 * qr for dq, qr in zip(dqs, q_rs)]
        inv_qs = [1.0 / qr for qr in q_rs]
        f0 = jnp.stack([
            upsample_replicate(idct_raster(dq), g.h_samp, g.w_samp)
            for dq, g in zip(dqs, geoms)
        ])
        return sharded(*dqs, *los, *his, *inv_qs, f0)

    return jax.jit(solve)


def solve_striped(
    datas: Sequence[np.ndarray],
    quants: Sequence[np.ndarray],
    samps: Sequence[Tuple[int, int]],
    weight: float,
    pweights: Sequence[float],
    iterations: int,
    mesh: Mesh,
    simd_compat_logging: bool = True,
):
    """Striped multi-device solve.  Same contract as solve_joint."""
    geoms = tuple(
        ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
        for d, (sy, sx) in zip(datas, samps)
    )
    solver = _build_striped(
        geoms, float(weight), tuple(float(p) for p in pweights),
        int(iterations), bool(simd_compat_logging), mesh,
    )
    return solver(
        [jnp.asarray(d) for d in datas],
        [jnp.asarray(q) for q in quants],
    )
