"""DCT numerics bedrock tests (SURVEY.md §7 step 1)."""

import numpy as np
import pytest

from jpeg2png_tpu.ops.dct import (
    dct8x8, idct8x8, dct8x8_kron, idct8x8_kron, dct_matrix_f64,
)


def naive_dct2(block):
    """O(64^2) direct evaluation of the orthonormal 2-D DCT-II."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (block[y, x]
                          * np.cos(np.pi * (2 * y + 1) * u / 16)
                          * np.cos(np.pi * (2 * x + 1) * v / 16))
            cu = np.sqrt(0.125) if u == 0 else np.sqrt(0.25)
            cv = np.sqrt(0.125) if v == 0 else np.sqrt(0.25)
            out[u, v] = cu * cv * s
    return out


def test_matrix_orthonormal():
    d = dct_matrix_f64()
    np.testing.assert_allclose(d @ d.T, np.eye(8), atol=1e-14)


def test_matches_ooura_constants():
    # C8_4R = sqrt(2/8)*cos(pi/4); C8_1R = sqrt(2/8)*cos(pi/16) etc.
    # (reference: ooura/dct.c:24-31)
    d = dct_matrix_f64()
    assert abs(d[4, 0] - 0.35355339059327376220) < 1e-15
    assert abs(d[1, 0] - 0.49039264020161522456) < 1e-15
    assert abs(d[2, 0] - 0.46193976625564337806) < 1e-15


def test_forward_matches_naive():
    rng = np.random.default_rng(0)
    block = rng.normal(0, 100, (8, 8)).astype(np.float32)
    expected = naive_dct2(block.astype(np.float64))
    got = np.asarray(dct8x8(block[None, None]))[0, 0]
    np.testing.assert_allclose(got, expected, atol=2e-3)


@pytest.mark.parametrize("fwd,inv", [(dct8x8, idct8x8),
                                     (dct8x8_kron, idct8x8_kron)])
def test_roundtrip(fwd, inv):
    rng = np.random.default_rng(1)
    blocks = rng.normal(0, 200, (4, 5, 8, 8)).astype(np.float32)
    back = np.asarray(inv(fwd(blocks)))
    np.testing.assert_allclose(back, blocks, atol=1e-2)


def test_kron_matches_separable():
    rng = np.random.default_rng(2)
    blocks = rng.normal(0, 200, (3, 7, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(dct8x8_kron(blocks)), np.asarray(dct8x8(blocks)),
        atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(idct8x8_kron(blocks)), np.asarray(idct8x8(blocks)),
        atol=1e-2,
    )


def test_dc_coefficient():
    # flat block of value v has DC = 8*v (orthonormal scaling), rest 0
    block = np.full((1, 1, 8, 8), 13.0, np.float32)
    coefs = np.asarray(dct8x8(block))[0, 0]
    assert abs(coefs[0, 0] - 13.0 * 8.0) < 1e-3
    assert np.abs(coefs).sum() - abs(coefs[0, 0]) < 1e-3
