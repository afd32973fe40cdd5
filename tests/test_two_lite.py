"""The LITE two-kernel tier (bf16 side state + in-kernel consts).

Round-3 HBM-traffic diet for canvases beyond the mega-lite VMEM gate
(~3.7 MP): the per-iteration pipeline carries f (f32) + d = f - fista
(bf16) + a coef-space devq prob carry (bf16), the gradient crosses the
kernels in bf16, and the projection computes its clamp boxes in-kernel
from int16 coefficients + a quant raster (kernels/project_step.py lite
rationale; the padding algebra matches kernels/iter_step.py:433-458).

Interpreter-mode parity here; the same paths run compiled on the real
chip via `python -m tests.tpu_checks`.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from jpeg2png_tpu.kernels import grad_step
from jpeg2png_tpu.kernels import project_step as ps


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)


@pytest.fixture
def force_two_tier(monkeypatch):
    """Push solve_impl past the whole-solve gates so small test
    geometries exercise the two-kernel tiers."""
    from jpeg2png_tpu.kernels import iter_step

    monkeypatch.setattr(iter_step, "supports", lambda *a, **k: False)
    monkeypatch.setattr(iter_step, "supports_lite", lambda *a, **k: False)


def _bf16ify(x):
    return np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))


def test_fused_grad_lite_matches_f32(interpret_pallas):
    """The two-lite tier's gradient pass — the STRIPED lite kernel run
    on the whole canvas as one zero-halo band (models/solver.py
    make_body_pallas_lite) — == f32 fused_grad to bf16 output
    rounding, with the coef-space devq carry expanded in-kernel
    (compute.c:38-70)."""
    from jpeg2png_tpu.kernels import stripe_grad
    from jpeg2png_tpu.ops.dct_raster import sampled_idct_up

    rng = np.random.default_rng(0)
    C, H, W = 3, 128, 256
    samps = [(1, 1), (2, 2), (2, 2)]
    pa_ss = (0.36, 0.36 * 4, 0.0)       # third channel prob off
    prob_mask = tuple(p != 0.0 for p in pa_ss)
    assert stripe_grad.supports_lite(C, H, W, samps, prob_mask)
    assert stripe_grad.padded_band_height(H, W, C, samps,
                                          prob_mask) == H

    # bf16-exact inputs so the two kernels see identical state
    fs = [jnp.asarray(_bf16ify(rng.normal(0, 50, (H, W))))
          for _ in range(C)]
    dvals = [_bf16ify(rng.normal(0, 2, (H, W))) for _ in range(C)]
    ds = [jnp.asarray(d, jnp.bfloat16) for d in dvals]
    fis = [f - jnp.asarray(d) for f, d in zip(fs, dvals)]
    devq_vals = [_bf16ify(rng.normal(0, 0.1, (H // sy, W // sx)))
                 for c, (sy, sx) in enumerate(samps) if prob_mask[c]]
    devqs = [jnp.asarray(d, jnp.bfloat16) for d in devq_vals]
    factor = jnp.float32(0.37)
    weight = 0.3

    zf = [jnp.zeros((16, W), jnp.float32)] * C
    zd = [jnp.zeros((16, W), jnp.bfloat16)] * C
    grads, sumsq, tv, tv2 = stripe_grad.fused_grad_striped_lite(
        fs, ds, devqs, (zf, zf, zd, zd), factor, jnp.int32(0),
        weight, samps, pa_ss, h_pad=H, h_true=H, w_true=W)

    pgs, pi = [], 0
    for c, (sy, sx) in enumerate(samps):
        if prob_mask[c]:
            pgs.append(pa_ss[c] * sampled_idct_up(
                jnp.asarray(devq_vals[pi]), sy, sx))
            pi += 1
        else:
            pgs.append(None)
    g_ref, _, ss_ref, tv_ref, tv2_ref = grad_step.fused_grad(
        fs, fis, pgs, factor, weight)

    for c in range(C):
        got = np.asarray(grads[c]).astype(np.float32)
        ref = np.asarray(g_ref[c])
        # bf16 mantissa: |err| <= |ref| * 2^-8 + tiny
        assert np.abs(got - ref).max() <= np.abs(ref).max() / 128 + 1e-4
    assert abs(float(tv) - float(tv_ref)) / float(tv_ref) < 1e-5
    assert abs(float(tv2) - float(tv2_ref)) / float(tv2_ref) < 1e-5
    np.testing.assert_allclose(np.asarray(sumsq), np.asarray(ss_ref),
                               rtol=1e-5)


def test_fused_project_multi_lite_matches_f32(interpret_pallas):
    """Projection-lite == the f32 multi kernel on identical state: the
    in-kernel int16+quant clamp boxes equal the streamed lo/hi rasters,
    and (dnew, devq) are the bf16 roundings of their f32 values."""
    from jpeg2png_tpu.ops.dct_raster import sampled_dct

    rng = np.random.default_rng(1)
    C, H, W = 3, 128, 256
    samps = [(1, 1), (2, 2), (2, 2)]
    pa_ss = (0.36, 0.36 * 4, 0.0)
    assert ps.supports_multi_lite(H, W, samps)

    fs = [jnp.asarray(_bf16ify(rng.normal(0, 50, (H, W))))
          for _ in range(C)]
    dvals = [_bf16ify(rng.normal(0, 2, (H, W))) for _ in range(C)]
    ds = [jnp.asarray(d, jnp.bfloat16) for d in dvals]
    gvals = [_bf16ify(rng.normal(0, 1, (H, W))) for _ in range(C)]
    gs = [jnp.asarray(g, jnp.bfloat16) for g in gvals]
    factor = jnp.float32(0.41)
    scales = jnp.asarray([1.3, 0.7, 2.1], jnp.float32)

    datas_i16, q_rs, los, his, dqs, iqs = [], [], [], [], [], []
    for c, (sy, sx) in enumerate(samps):
        hc, wc = H // sy, W // sx
        q = np.tile(rng.integers(1, 60, (8, 8)).astype(np.float32),
                    (hc // 8, wc // 8))
        d = np.round(rng.normal(0, 5, (hc, wc)))
        datas_i16.append(jnp.asarray(d.astype(np.int16)))
        q_rs.append(jnp.asarray(q))
        dq = d * q
        los.append(jnp.asarray(dq - 0.5 * q))
        his.append(jnp.asarray(dq + 0.5 * q))
        dqs.append(jnp.asarray(dq))
        iqs.append(jnp.asarray(1.0 / q))

    fnews, dnews, devqs, dists = ps.fused_project_multi_lite(
        fs, ds, gs, factor, scales, datas_i16, q_rs, pa_ss, samps)

    extraps = [fs[c] + factor * jnp.asarray(dvals[c]) for c in range(C)]
    g32 = [jnp.asarray(g) for g in gvals]
    f_ref, _, _ = ps.fused_project_multi(
        extraps, g32, scales, los, his,
        [dqs[c] if pa_ss[c] else None for c in range(C)],
        [iqs[c] if pa_ss[c] else None for c in range(C)],
        pa_ss, samps)

    for c, (sy, sx) in enumerate(samps):
        np.testing.assert_allclose(np.asarray(fnews[c]),
                                   np.asarray(f_ref[c]), atol=1e-3)
        dn = np.asarray(dnews[c]).astype(np.float32)
        dn_ref = np.asarray(fnews[c]) - np.asarray(fs[c])
        assert (np.abs(dn - dn_ref).max()
                <= np.abs(dn_ref).max() / 128 + 1e-4)
        if not pa_ss[c]:
            assert devqs[c] is None
            assert float(dists[c]) == 0.0
            continue
        fmid = extraps[c] - scales[c] * g32[c]
        coefs = sampled_dct(fmid, sy, sx)
        cl = jnp.clip(coefs, los[c], his[c])
        devp = (cl - dqs[c]) * iqs[c]
        ref = np.asarray(devp * iqs[c])
        got = np.asarray(devqs[c]).astype(np.float32)
        assert np.abs(got - ref).max() <= np.abs(ref).max() / 128 + 1e-5
        np.testing.assert_allclose(
            float(dists[c]), float(0.5 * jnp.sum(devp * devp)),
            rtol=5e-3)


@pytest.mark.parametrize("luma_blocks,chroma_blocks", [
    ((16, 16), (8, 8)),      # exact 128x128
    ((77, 77), (39, 39)),    # odd: FREE region-gap rows/cols + W2 pad
])
def test_solve_two_lite_matches_xla(interpret_pallas, force_two_tier,
                                    luma_blocks, chroma_blocks):
    """End-to-end through solve_impl: the forced two-lite tier tracks
    the f32 XLA solver within bf16 subgradient-noise tolerance
    (trajectory comparisons are PSNR-based per the project-wide
    chaotic-divergence caveat; iteration-0 metrics match pointwise)."""
    from jpeg2png_tpu.models.solver import (
        ChannelGeometry, active_tier, solve_joint)

    rng = np.random.default_rng(3)
    samps = [(1, 1), (2, 2), (2, 2)]
    datas, quants = [], []
    for (sy, sx) in samps:
        nby, nbx = luma_blocks if sy == 1 else chroma_blocks
        datas.append(rng.integers(-25, 25, (nby, nbx, 8, 8))
                     .astype(np.int16))
        quants.append(rng.integers(1, 60, (8, 8)).astype(np.uint16))
    geoms = tuple(ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
                  for d, (sy, sx) in zip(datas, samps))
    assert active_tier(geoms, True, (0.001,) * 3) == "two-lite"

    iters = 8
    fp, mp_ = solve_joint(datas, quants, samps, 0.3, [0.001] * 3,
                          iters, use_pallas=True)
    fx, mx_ = solve_joint(datas, quants, samps, 0.3, [0.001] * 3,
                          iters, use_pallas=False)
    fp, fx = np.asarray(fp), np.asarray(fx)
    mse = ((fp - fx) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr > 60.0, psnr
    np.testing.assert_allclose(np.asarray(mp_)[0], np.asarray(mx_)[0],
                               rtol=1e-4)
    assert (abs(np.asarray(mp_)[-1, 0] - np.asarray(mx_)[-1, 0])
            / np.asarray(mx_)[-1, 0]) < 1e-3


def test_two_lite_tier_gating():
    """active_tier mirrors the solve_impl gates: whole-stripe H
    padding with frozen q == 0 rows, falling back to the f32 'two'
    tier where the lite kernels' lane alignment fails."""
    from jpeg2png_tpu.models.solver import ChannelGeometry, active_tier
    from jpeg2png_tpu.kernels import iter_step

    orig_s, orig_l = iter_step.supports, iter_step.supports_lite
    iter_step.supports = lambda *a, **k: False
    iter_step.supports_lite = lambda *a, **k: False
    try:
        g16 = (ChannelGeometry(16, 32, 1, 1),)       # H=128: aligned
        assert active_tier(g16, True, (1.0,)) == "two-lite"
        # H=600: the lite tier H-pads to whole stripes with frozen
        # q == 0 rows rather than falling back
        g75 = (ChannelGeometry(75, 32, 1, 1),)
        assert active_tier(g75, True, (1.0,)) == "two-lite"
        # short canvases ride the zero-halo band kernel too (H=24
        # pads to one 32-row stripe; the halo arrays cover the rest)
        g3 = (ChannelGeometry(3, 32, 1, 1),)
        assert active_tier(g3, True, (1.0,)) == "two-lite"
        # subsampled channels never break the lite lane gates: W2
        # already pads to 128*max_sx, so W2//sx stays 128-aligned
        gnarrow = (ChannelGeometry(16, 16, 1, 1),    # W2 = 256
                   ChannelGeometry(8, 8, 2, 2))
        assert active_tier(gnarrow, True, (1.0, 1.0)) == "two-lite"
        # H=24, W=136: stripe padding (32) x W2 padding (256) trips
        # the 2x padding-waste gate -> f32 'two' fallback
        gwaste = (ChannelGeometry(3, 17, 1, 1),)
        assert active_tier(gwaste, True, (1.0,)) == "two"
    finally:
        iter_step.supports, iter_step.supports_lite = orig_s, orig_l


def test_two_lite_checkpoint_roundtrip(interpret_pallas, force_two_tier,
                                       tmp_path):
    """bf16 carry leaves survive the .npz snapshot (np.savez cannot
    store ml_dtypes.bfloat16 — save_state views them as uint16) and a
    killed-and-resumed two-lite solve equals the uninterrupted one."""
    from jpeg2png_tpu.models.checkpoint import (
        load_state, save_state, solve_checkpointed)

    # unit roundtrip: mixed f32/bf16 pytree
    carry = ((jnp.arange(8, dtype=jnp.float32),),
             (jnp.linspace(-2, 2, 8).astype(jnp.bfloat16),),
             jnp.float32(3.5))
    path = str(tmp_path / "ck.npz")
    save_state(path, carry, 7, "fp")
    back, it = load_state(path, "fp")
    assert it == 7
    assert back[1][0].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(back[1][0]).view(np.uint16),
        np.asarray(carry[1][0]).view(np.uint16))

    # resumable two-lite solve == one-shot
    rng = np.random.default_rng(9)
    samps = [(1, 1), (2, 2), (2, 2)]
    datas, quants = [], []
    for sy, sx in samps:
        nb = 16 // sy
        datas.append(rng.integers(-25, 25, (nb, nb, 8, 8))
                     .astype(np.int16))
        quants.append(rng.integers(1, 60, (8, 8)).astype(np.uint16))
    ck = str(tmp_path / "solve.npz")
    res = solve_checkpointed(datas, quants, samps, 0.3, [0.001] * 3,
                             6, ck, checkpoint_every=3,
                             use_pallas=True)
    from jpeg2png_tpu.models.solver import solve_joint
    f_ref, m_ref = solve_joint(datas, quants, samps, 0.3, [0.001] * 3,
                               6, use_pallas=True)
    np.testing.assert_allclose(res.fdata, np.asarray(f_ref), atol=1e-4)
    np.testing.assert_allclose(res.metrics, np.asarray(m_ref),
                               rtol=1e-4)


def test_two_lite_alpha_logging_mode(interpret_pallas, force_two_tier):
    """simd_compat_logging=False (the alpha-scaled objective variant —
    the reference C-vs-SIMD logging quirk, compute.c:69 vs
    compute_simd_step.c:61) flows through the lite projection's dist
    outputs identically to the XLA path."""
    from jpeg2png_tpu.models.solver import solve_joint

    rng = np.random.default_rng(21)
    samps = [(1, 1), (2, 2), (2, 2)]
    datas, quants = [], []
    for sy, sx in samps:
        nb = 16 // sy
        datas.append(rng.integers(-25, 25, (nb, nb, 8, 8))
                     .astype(np.int16))
        quants.append(rng.integers(1, 60, (8, 8)).astype(np.uint16))
    fp, mp_ = solve_joint(datas, quants, samps, 0.3, [0.001] * 3, 5,
                          simd_compat_logging=False, use_pallas=True)
    fx, mx_ = solve_joint(datas, quants, samps, 0.3, [0.001] * 3, 5,
                          simd_compat_logging=False, use_pallas=False)
    # prob_dist is logged one iteration behind: row 0 compares
    # pointwise (dist still 0), row 1 carries the first alpha-scaled
    # distance, whose bf16x3 projection matmuls give ~1e-3 relative
    np.testing.assert_allclose(np.asarray(mp_)[0], np.asarray(mx_)[0],
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mp_)[1], np.asarray(mx_)[1],
                               rtol=1e-2)
    assert np.asarray(mp_)[1, 1] > 0        # the scaled dist is live
    mse = ((np.asarray(fp) - np.asarray(fx)) ** 2).mean()
    assert 10 * np.log10(255.0 ** 2 / max(mse, 1e-12)) > 60
