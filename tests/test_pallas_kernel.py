"""Fused Pallas gradient kernel vs the XLA ops, in interpreter mode.

The CI environment is CPU-only, so the kernel runs through the Pallas
interpreter here; the same comparison runs compiled on real TPU via
`python -m tests.tpu_checks` (see that module).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from jpeg2png_tpu.kernels import grad_step
from jpeg2png_tpu.ops.tv import tv_term, tv2_term


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)


@pytest.mark.parametrize("C,H,W,weight,with_prob", [
    (3, 96, 128, 0.3, True),      # 3 stripes, all terms
    (3, 96, 128, 0.0, False),     # TV only, no prob
    (1, 104, 256, 0.3, True),     # single channel, partial last stripe
])
def test_fused_grad_matches_ops(interpret_pallas, C, H, W, weight, with_prob):
    rng = np.random.default_rng(0)
    fs = [jnp.asarray(rng.normal(0, 50, (H, W)).astype(np.float32))
          for _ in range(C)]
    fis = [jnp.asarray(rng.normal(0, 50, (H, W)).astype(np.float32))
           for _ in range(C)]
    pgs = [jnp.asarray(rng.normal(0, 1, (H, W)).astype(np.float32))
           if with_prob else None for _ in range(C)]
    factor = jnp.float32(0.37)

    grads, extraps, sumsq, tv, tv2 = grad_step.fused_grad(
        fs, fis, pgs, factor, weight)

    f = jnp.stack(fs)
    fl = f + factor * (f - jnp.stack(fis))
    tv_r, gtv, gx, gy = tv_term(fl)
    gref = gtv
    tv2_r = 0.0
    if weight != 0.0:
        tv2_r, g2 = tv2_term(gx, gy, weight / np.sqrt(2))
        gref = gref + g2
    if with_prob:
        gref = gref + jnp.stack(pgs)
    gref = np.asarray(gref)

    got = np.stack([np.asarray(g) for g in grads])
    np.testing.assert_allclose(got, gref, atol=1e-4)
    np.testing.assert_allclose(
        np.stack([np.asarray(e) for e in extraps]), np.asarray(fl),
        atol=1e-5)
    assert abs(float(tv) - float(tv_r)) / float(tv_r) < 1e-5
    if weight != 0.0:
        assert abs(float(tv2) - float(tv2_r)) / float(tv2_r) < 1e-5
    np.testing.assert_allclose(
        np.asarray(sumsq), (gref**2).sum(axis=(1, 2)), rtol=1e-5)


def test_supports_gating():
    assert grad_step.supports(3, 512, 512)
    assert grad_step.supports(3, 48, 128)
    assert not grad_step.supports(3, 64, 104)   # width not lane-aligned
    assert not grad_step.supports(3, 16, 128)   # too short for halo
    assert not grad_step.supports(3, 63, 512)   # height not 8-aligned


def test_sampled_dct_matches_mean_plus_dct():
    """The fused resample+DCT matmuls equal mean-downsample then DCT."""
    from jpeg2png_tpu.ops.dct_raster import (
        dct_raster, idct_raster, sampled_dct, sampled_idct_up)
    from jpeg2png_tpu.ops.resample import footprint_mean, upsample_replicate

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 100, (64, 96)).astype(np.float32))
    for sy, sx in [(1, 1), (2, 2), (2, 1)]:
        ref = dct_raster(footprint_mean(x[: 64, : 96], sy, sx))
        got = sampled_dct(x, sy, sx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-3)
        # inverse + upsample (caller multiplies by sy*sx)
        y = jnp.asarray(rng.normal(0, 10, got.shape).astype(np.float32))
        ref_up = upsample_replicate(idct_raster(y), sy, sx)
        got_up = sy * sx * sampled_idct_up(y, sy, sx)
        np.testing.assert_allclose(np.asarray(got_up), np.asarray(ref_up),
                                   atol=2e-3)


def test_raster_dct_matches_blocked():
    from jpeg2png_tpu.ops.blocks import blockify, deblockify
    from jpeg2png_tpu.ops.dct import dct8x8
    from jpeg2png_tpu.ops.dct_raster import dct_raster, idct_raster

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 100, (48, 72)).astype(np.float32))
    ref = np.asarray(deblockify(dct8x8(blockify(x))))
    # blocked coefficient (u,v) of block (by,bx) sits at (8by+u, 8bx+v)
    got = np.asarray(dct_raster(x))
    np.testing.assert_allclose(got, ref, atol=2e-3)
    back = np.asarray(idct_raster(dct_raster(x)))
    np.testing.assert_allclose(back, np.asarray(x), atol=2e-3)


@pytest.mark.parametrize("sy,sx,with_prob", [
    (1, 1, True), (2, 2, True), (1, 1, False),
])
def test_fused_project_matches_ops(interpret_pallas, sy, sx, with_prob):
    from jpeg2png_tpu.kernels.project_step import fused_project
    from jpeg2png_tpu.ops.dct_raster import sampled_dct, sampled_idct_up

    rng = np.random.default_rng(3)
    H, W = 64, 128
    hc, wc = H // sy, W // sx
    e = jnp.asarray(rng.normal(0, 50, (H, W)).astype(np.float32))
    g = jnp.asarray(rng.normal(0, 1, (H, W)).astype(np.float32))
    q = jnp.asarray(np.tile(
        rng.integers(1, 60, (8, 8)).astype(np.float32),
        (hc // 8, wc // 8)))
    scale = jnp.float32(0.02)
    pa = 0.36
    fmid = e - scale * g
    # boxes centered on the state's own coefficients plus a +-2-step
    # jitter so some boxes bind — the solver's invariant (the iterate
    # starts at box centers and stays near the feasible set), and the
    # realistic small-correction regime the kernel's single-pass-bf16
    # backward DCT is specified for (see _stripe_math.col_bwd)
    data = jnp.asarray(np.asarray(
        np.round(np.asarray(sampled_dct(fmid, sy, sx)) / q)
        + rng.integers(-2, 3, (hc, wc))).astype(np.float32))
    dq = data * q
    lo, hi, iq = dq - 0.5 * q, dq + 0.5 * q, 1.0 / q

    fnew, pg, dist = fused_project(
        e, g, scale, lo, hi,
        dq if with_prob else None, iq if with_prob else None,
        pa * sy * sx if with_prob else 0.0, sy, sx)

    # tolerances: forward DCT is bf16x3 (~1e-5 relative; see
    # kernels/project_step.py docstring), backward DCT of the clamp
    # correction is single-pass bf16, so the gate scales with the
    # correction magnitude — the ops reference path stays f32
    coefs = sampled_dct(fmid, sy, sx)
    cl = jnp.clip(coefs, lo, hi)
    corr = float(jnp.max(jnp.abs(cl - coefs)))
    fref = fmid + sy * sx * sampled_idct_up(cl - coefs, sy, sx)
    np.testing.assert_allclose(np.asarray(fnew), np.asarray(fref),
                               atol=2e-2 + corr * 2.0 ** -7)
    if with_prob:
        devp = (cl - dq) * iq
        np.testing.assert_allclose(
            float(dist), float(0.5 * jnp.sum(devp * devp)), rtol=1e-4)
        pgref = pa * sy * sx * sampled_idct_up(devp * iq, sy, sx)
        corr_pg = float(jnp.max(jnp.abs(devp * iq)))
        np.testing.assert_allclose(
            np.asarray(pg), np.asarray(pgref),
            atol=1e-4 + pa * sy * sx * corr_pg * 2.0 ** -6)
    else:
        assert pg is None


@pytest.mark.parametrize("samps,prob", [
    ([(1, 1), (2, 2), (2, 2)], [True, True, True]),      # 4:2:0
    ([(1, 1)] * 3, [True, False, True]),                 # mixed prob
    ([(1, 1), (2, 2), (2, 2)], [False, False, False]),   # prob off
])
def test_fused_project_multi_matches_single(interpret_pallas, samps, prob):
    """ONE multi-channel projection dispatch == the C per-channel
    fused_project dispatches it replaces (VERDICT round-2 items 1/5:
    per-iteration launch count)."""
    from jpeg2png_tpu.kernels.project_step import (
        fused_project, fused_project_multi, supports_multi)

    rng = np.random.default_rng(5)
    H, W = 64, 256
    C = len(samps)
    assert supports_multi(H, W, samps)
    es, gs, los, his, dqs, iqs, pa_ss = [], [], [], [], [], [], []
    for c, (sy, sx) in enumerate(samps):
        hc, wc = H // sy, W // sx
        es.append(jnp.asarray(
            rng.normal(0, 50, (H, W)).astype(np.float32)))
        gs.append(jnp.asarray(
            rng.normal(0, 1, (H, W)).astype(np.float32)))
        q = jnp.asarray(np.tile(
            rng.integers(1, 60, (8, 8)).astype(np.float32),
            (hc // 8, wc // 8)))
        data = jnp.asarray(
            np.round(rng.normal(0, 5, (hc, wc))).astype(np.float32))
        dq = data * q
        los.append(dq - 0.5 * q)
        his.append(dq + 0.5 * q)
        dqs.append(dq if prob[c] else None)
        iqs.append(1.0 / q if prob[c] else None)
        pa_ss.append(0.36 * sy * sx if prob[c] else 0.0)
    scales = jnp.asarray(
        rng.uniform(0.01, 0.05, (C,)).astype(np.float32))

    fnews, pgs, dists = fused_project_multi(
        es, gs, scales, los, his, dqs, iqs, pa_ss, samps)

    for c, (sy, sx) in enumerate(samps):
        f1, pg1, d1 = fused_project(
            es[c], gs[c], scales[c], los[c], his[c], dqs[c], iqs[c],
            pa_ss[c], sy, sx)
        np.testing.assert_allclose(np.asarray(fnews[c]),
                                   np.asarray(f1), atol=1e-4)
        if prob[c]:
            np.testing.assert_allclose(np.asarray(pgs[c]),
                                       np.asarray(pg1), atol=1e-6)
            np.testing.assert_allclose(float(dists[c]), float(d1),
                                       rtol=1e-5)
        else:
            assert pgs[c] is None
            assert float(dists[c]) == 0.0


@pytest.mark.parametrize("samps,prob,weight,H,W", [
    ([(1, 1), (2, 2), (2, 2)], [True, True, True], 0.3, 256, 256),  # 4:2:0
    ([(1, 1)], [True], 0.3, 256, 256),                   # single channel
    ([(1, 1), (2, 2), (2, 2)], [True, False, True], 0.0, 256, 256),
    # non-128-aligned canvas: exercises the zero-padding path (padded
    # to 256x512) including the cross-derivative boundary masks
    ([(1, 1), (2, 2), (2, 2)], [True, True, True], 0.3, 208, 272),
    # stripe-aligned height + row padding: the first all-padding
    # stripe's halo reaches back into real data (regression test for
    # the window-based bottom-edge mask selection)
    ([(1, 1), (2, 2), (2, 2)], [True, True, True], 0.3, 128, 128),
])
def test_fused_iteration_matches_ops(interpret_pallas, samps, prob, weight,
                                     H, W):
    """One whole-iteration kernel call == extrapolate + TV/TGV2 gather +
    prob expansion + normalized step + projection via the ops path."""
    from jpeg2png_tpu.kernels.iter_step import fused_iteration
    from jpeg2png_tpu.ops.dct_raster import sampled_dct, sampled_idct_up

    rng = np.random.default_rng(7)
    C = len(samps)
    factor = jnp.float32(0.41)
    step = jnp.float32(3.7)

    fs = [jnp.asarray(rng.normal(0, 50, (H, W)).astype(np.float32))
          for _ in range(C)]
    # the FISTA shadow tracks the iterate closely in a real solve (it
    # IS the previous iterate); keeping the pair close also keeps the
    # clamp corrections in the realistic small-magnitude regime the
    # kernel's single-pass-bf16 backward DCT is specified for
    fis = [f + jnp.asarray(rng.normal(0, 2, (H, W)).astype(np.float32))
           for f in fs]
    los, his, dqs_all, iqs_all, devqs, pa_ss = [], [], [], [], [], []
    datas_i16, q_rs = [], []
    from jpeg2png_tpu.ops.dct_raster import sampled_dct as _sdct
    for c, (sy, sx) in enumerate(samps):
        hc, wc = H // sy, W // sx
        q = np.tile(rng.integers(1, 60, (8, 8)).astype(np.float32),
                    (hc // 8, wc // 8))
        # boxes centered on the state's own coefficients (the solver's
        # invariant: the iterate starts at box centers and stays near
        # the feasible set), plus a +-2-step jitter so some boxes bind
        data = np.asarray(
            np.round(np.asarray(_sdct(fs[c], sy, sx)) / q)
            + rng.integers(-2, 3, (hc, wc))).astype(np.float32)
        data = np.clip(data, -2000, 2000)
        datas_i16.append(jnp.asarray(data.astype(np.int16)))
        q_rs.append(jnp.asarray(q))
        dq = jnp.asarray(data * q)
        los.append(dq - 0.5 * q)
        his.append(dq + 0.5 * q)
        dqs_all.append(dq)
        iqs_all.append(jnp.asarray(1.0 / q))
        if prob[c]:
            devqs.append(jnp.asarray(
                rng.normal(0, 0.1, (hc, wc)).astype(np.float32)))
            pa_ss.append(0.36 * sy * sx)
        else:
            pa_ss.append(0.0)
    prob_cs = [c for c in range(C) if prob[c]]

    fnews, devqs_out, tv, tv2, dists, sumsq = fused_iteration(
        fs, fis, devqs, factor, step, datas_i16, q_rs,
        pa_ss, samps, weight)

    # ---- ops reference ----
    f = jnp.stack(fs)
    fl = f + factor * (f - jnp.stack(fis))
    tv_r, grad, gx, gy = tv_term(fl)
    tv2_r = 0.0
    if weight != 0.0:
        tv2_r, g2 = tv2_term(gx, gy, weight / np.sqrt(2))
        grad = grad + g2
    pi = 0
    pgrads = []
    for c, (sy, sx) in enumerate(samps):
        if not prob[c]:
            pgrads.append(jnp.zeros((H, W)))
            continue
        pgrads.append(pa_ss[c] * sampled_idct_up(devqs[pi], sy, sx))
        pi += 1
    grad = grad + jnp.stack(pgrads)
    norms = jnp.sqrt(jnp.sum(grad * grad, axis=(1, 2)))
    scale = jnp.where(norms == 0.0, 0.0, step / norms)
    fmid = fl - grad * scale[:, None, None]
    pi = 0
    for c, (sy, sx) in enumerate(samps):
        coefs = sampled_dct(fmid[c], sy, sx)
        cl = jnp.clip(coefs, los[c], his[c])
        fref = fmid[c] + sy * sx * sampled_idct_up(cl - coefs, sy, sx)
        # the kernel's backward DCT of the correction is single-pass
        # bf16: its error contract is RELATIVE to the correction
        # magnitude (iter_step.col_bwd), so the gate scales with it
        corr = float(jnp.max(jnp.abs(cl - coefs)))
        np.testing.assert_allclose(np.asarray(fnews[c]), np.asarray(fref),
                                   atol=3e-2 + corr * 2.0 ** -7)
        if prob[c]:
            devp = (cl - dqs_all[c]) * iqs_all[c]
            np.testing.assert_allclose(
                float(dists[pi]), float(0.5 * jnp.sum(devp * devp)),
                rtol=2e-3)
            np.testing.assert_allclose(
                np.asarray(devqs_out[pi]), np.asarray(devp * iqs_all[c]),
                atol=1e-3)
            pi += 1
    assert abs(float(tv) - float(tv_r)) / float(tv_r) < 1e-4
    if weight != 0.0:
        assert abs(float(tv2) - float(tv2_r)) / float(tv2_r) < 1e-4
    np.testing.assert_allclose(
        np.asarray(sumsq), np.asarray(norms) ** 2, rtol=1e-3)


def test_fused_solve_random_geometries(interpret_pallas):
    """Randomized block-grid fuzz over the padding machinery: every
    valid 4:2:0 geometry must agree with the ops path after one
    iteration and keep its padding at exactly zero."""
    from jpeg2png_tpu.kernels.iter_step import fused_solve, supports

    rng = np.random.default_rng(11)
    tried = 0
    for _ in range(8):
        nby = int(rng.integers(8, 21)) * 2   # luma blocks (even for 420)
        nbx = int(rng.integers(8, 21)) * 2
        H, W = nby * 8, nbx * 8
        samps = [(1, 1), (2, 2), (2, 2)]
        if not supports(3, H, W, samps, True):
            continue
        tried += 1
        datas = [rng.integers(-20, 20, (nby, nbx, 8, 8)).astype(np.int16),
                 rng.integers(-9, 9, (nby // 2, nbx // 2, 8, 8)).astype(
                     np.int16),
                 rng.integers(-9, 9, (nby // 2, nbx // 2, 8, 8)).astype(
                     np.int16)]
        quants = [rng.integers(1, 50, (8, 8)).astype(np.uint16)
                  for _ in range(3)]

        from jpeg2png_tpu.models.solver import solve_joint
        fp, mp_ = solve_joint(datas, quants, samps, 0.3, [0.001] * 3, 1,
                              use_pallas=True)
        fx, mx_ = solve_joint(datas, quants, samps, 0.3, [0.001] * 3, 1,
                              use_pallas=False)
        np.testing.assert_allclose(np.asarray(fp), np.asarray(fx),
                                   atol=2e-2,
                                   err_msg=f"geometry {H}x{W}")
        np.testing.assert_allclose(
            np.asarray(mp_)[0], np.asarray(mx_)[0], rtol=1e-4,
            err_msg=f"metrics {H}x{W}")
    assert tried >= 4, "fuzz loop never hit a supported geometry"


@pytest.mark.parametrize("samps,prob,weight", [
    ([(1, 1), (2, 2), (2, 2)], [True, True, True], 0.3),
    ([(1, 1)] * 3, [True, False, True], 0.0),
])
def test_fused_solve_lite_matches_ops(interpret_pallas, samps, prob,
                                      weight):
    """The LITE whole-solve kernel (bf16 fista-diff/gradient/devq
    canvases — the >2.4 MP VMEM-gate extension) stays within bf16
    subgradient-noise tolerance of the f32 XLA solver over a short
    horizon."""
    from jpeg2png_tpu.kernels import iter_step
    from jpeg2png_tpu.models.solver import (
        _fista_factors_np, objective_alphas, solve_joint)
    from jpeg2png_tpu.ops.blocks import deblockify

    rng = np.random.default_rng(11)
    H = W = 128
    C = len(samps)
    datas, quants = [], []
    for sy, sx in samps:
        nb = H // (8 * sy)
        datas.append(rng.integers(-25, 25, (nb, nb, 8, 8))
                     .astype(np.int16))
        quants.append(rng.integers(1, 60, (8, 8)).astype(np.uint16))
    iters = 4
    pweights = [0.001 if p else 0.0 for p in prob]
    pa, _ = objective_alphas(weight, pweights, C)
    pa_ss = tuple(pa[c] * sy * sx
                  for c, (sy, sx) in enumerate(samps))

    import jax.numpy as jnp
    from jpeg2png_tpu.ops.dct_raster import idct_raster
    from jpeg2png_tpu.ops.resample import upsample_nearest_clamped
    f0s, dat_rs, q_rs = [], [], []
    for c, (sy, sx) in enumerate(samps):
        q_r = jnp.tile(jnp.asarray(quants[c], jnp.float32),
                       (datas[c].shape[0], datas[c].shape[1]))
        d_r = deblockify(jnp.asarray(datas[c], jnp.float32))
        f0s.append(upsample_nearest_clamped(
            idct_raster(d_r * q_r), sy, sx, H, W))
        dat_rs.append(deblockify(jnp.asarray(datas[c])))
        q_rs.append(q_r)
    dq0 = [jnp.zeros_like(q_rs[c]) for c in range(C) if prob[c]]
    factors, _ = _fista_factors_np(iters)
    radius = (H * W) ** 0.5 / 2.0
    step = radius / (1.0 + iters) ** 0.5

    fnews, _, _, partials = iter_step.fused_solve(
        f0s, f0s, dq0, jnp.asarray(factors), step,
        dat_rs, q_rs, pa_ss, samps, weight, lite=True)

    fd_ref, m_ref = solve_joint(datas, quants, samps, weight, pweights,
                                iters, use_pallas=False)
    fd = np.stack([np.asarray(f) for f in fnews])
    np.testing.assert_allclose(fd, np.asarray(fd_ref), atol=0.5)
    # objective partials track within bf16-noise tolerance
    m = np.asarray(partials)
    np.testing.assert_allclose(m[:, len(samps)],     # tv column
                               np.asarray(m_ref)[:, 2], rtol=2e-2)
