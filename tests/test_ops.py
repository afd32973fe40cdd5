"""Gather-form TPU ops vs the scatter-form NumPy oracle."""

import numpy as np
import pytest

from jpeg2png_tpu.ops.blocks import blockify, deblockify
from jpeg2png_tpu.ops.prob import prob_term
from jpeg2png_tpu.ops.projection import project_channel
from jpeg2png_tpu.ops.resample import (
    footprint_mean, upsample_nearest_clamped, upsample_replicate,
)
from jpeg2png_tpu.ops.tv import shift2d, tv_term, tv2_term

import oracle


def test_blockify_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(24, 40)).astype(np.float32)
    blocks = np.asarray(blockify(img))
    assert blocks.shape == (3, 5, 8, 8)
    np.testing.assert_array_equal(
        blocks[1, 2], img[8:16, 16:24]
    )
    np.testing.assert_array_equal(np.asarray(deblockify(blocks)), img)


def test_shift2d():
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    s = np.asarray(shift2d(a, 1, 0))
    assert s[0].sum() == 0 and (s[1:] == a[:-1]).all()
    s = np.asarray(shift2d(a, 0, -1))
    assert (s[:, -1] == 0).all() and (s[:, :-1] == a[:, 1:]).all()
    s = np.asarray(shift2d(a, -1, 1))
    assert (s[-1] == 0).all() and (s[:, 0] == 0).all()
    assert (s[:-1, 1:] == a[1:, :-1]).all()


@pytest.mark.parametrize("C,H,W", [(1, 12, 16), (3, 11, 9), (3, 16, 16)])
def test_tv_gather_matches_scatter(C, H, W):
    rng = np.random.default_rng(3)
    f = rng.normal(0, 50, (C, H, W)).astype(np.float32)
    tv_o, grad_o, gx_o, gy_o = oracle.tv_scatter(f.astype(np.float64))
    tv, grad, gx, gy = tv_term(f)
    assert abs(float(tv) - tv_o) / tv_o < 1e-5
    np.testing.assert_allclose(np.asarray(gx), gx_o, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy), gy_o, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grad), grad_o, atol=1e-4)


@pytest.mark.parametrize("C,H,W", [(1, 12, 16), (3, 11, 9)])
def test_tv2_gather_matches_scatter(C, H, W):
    rng = np.random.default_rng(4)
    f = rng.normal(0, 50, (C, H, W)).astype(np.float32)
    _, _, gx, gy = tv_term(f)
    gx = np.asarray(gx)
    gy = np.asarray(gy)
    alpha = 0.3 / np.sqrt(2)
    tv2_o, grad_o = oracle.tv2_scatter(
        gx.astype(np.float64), gy.astype(np.float64), alpha
    )
    tv2, grad = tv2_term(gx, gy, alpha)
    assert abs(float(tv2) - tv2_o) / max(tv2_o, 1e-9) < 1e-5
    np.testing.assert_allclose(np.asarray(grad), grad_o, atol=1e-4)


def test_tv_constant_image_zero_subgradient():
    # g_norm == 0 everywhere -> subderivative chosen as 0 (README.md:109-110)
    f = np.full((3, 16, 16), 7.0, np.float32)
    tv, grad, _, _ = tv_term(f)
    assert float(tv) == 0.0
    assert np.abs(np.asarray(grad)).max() == 0.0


@pytest.mark.parametrize("sy,sx", [(1, 1), (2, 2), (2, 1)])
def test_prob_matches_scatter(sy, sx):
    rng = np.random.default_rng(5)
    nby, nbx = 2, 3
    data = rng.integers(-20, 20, (nby, nbx, 8, 8)).astype(np.int16)
    quant = rng.integers(1, 100, (8, 8)).astype(np.float32)
    cos = (data * quant + rng.normal(0, 10, data.shape)).astype(np.float32)
    p_alpha = 0.001 * 2 * 255 * np.sqrt(2)
    H, W = nby * 8 * sy, nbx * 8 * sx

    dist_o, grad_o = oracle.prob_scatter(
        cos.astype(np.float64), data.astype(np.float64),
        quant.astype(np.float64), p_alpha, sy, sx, H, W,
    )
    dq = data.astype(np.float32) * quant
    dist, grad = prob_term(cos, dq, quant, np.float32(p_alpha), sy, sx)
    assert abs(float(dist) - dist_o) / dist_o < 1e-5
    np.testing.assert_allclose(np.asarray(grad), grad_o, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("sy,sx", [(1, 1), (2, 2), (1, 2)])
def test_projection_matches_oracle(sy, sx):
    rng = np.random.default_rng(6)
    nby, nbx = 3, 2
    data = rng.integers(-15, 15, (nby, nbx, 8, 8)).astype(np.int16)
    quant = rng.integers(1, 60, (8, 8)).astype(np.float32)
    region = rng.normal(0, 100, (nby * 8 * sy, nbx * 8 * sx)).astype(np.float32)

    proj_o, clamp_o = oracle.project(
        region.astype(np.float64), data.astype(np.float64),
        quant.astype(np.float64), sy, sx,
    )
    lo = (data.astype(np.float32) - 0.5) * quant
    hi = (data.astype(np.float32) + 0.5) * quant
    proj, clamped = project_channel(region, lo, hi, sy, sx)
    np.testing.assert_allclose(np.asarray(proj), proj_o, atol=5e-3)
    np.testing.assert_allclose(np.asarray(clamped), clamp_o, atol=5e-3)


def test_projection_idempotent_and_feasible():
    # projecting twice == projecting once; output DCT is inside the box
    rng = np.random.default_rng(7)
    data = rng.integers(-10, 10, (2, 2, 8, 8)).astype(np.int16)
    quant = rng.integers(1, 40, (8, 8)).astype(np.float32)
    region = rng.normal(0, 80, (16, 16)).astype(np.float32)
    lo = (data.astype(np.float32) - 0.5) * quant
    hi = (data.astype(np.float32) + 0.5) * quant
    p1, c1 = project_channel(region, lo, hi, 1, 1)
    p2, c2 = project_channel(np.asarray(p1), lo, hi, 1, 1)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), atol=1e-2)
    assert (np.asarray(c1) >= lo - 1e-3).all()
    assert (np.asarray(c1) <= hi + 1e-3).all()


def test_upsample_helpers():
    rng = np.random.default_rng(8)
    sub = rng.normal(size=(4, 6)).astype(np.float32)
    up = np.asarray(upsample_replicate(sub, 2, 2))
    assert up.shape == (8, 12)
    assert (up[::2, ::2] == sub).all() and (up[1::2, 1::2] == sub).all()
    np.testing.assert_allclose(np.asarray(footprint_mean(up, 2, 2)), sub,
                               rtol=1e-6)
    # clamped nearest covers a larger canvas by edge replication
    big = np.asarray(upsample_nearest_clamped(sub, 2, 2, 10, 14))
    assert (big[8:, :] == big[7:8, :]).all()
    assert (big[:, 12:] == big[:, 11:12]).all()
