"""Blocked 8x8 DCT applied directly in raster layout.

The naive route (blockify -> per-block DCT -> deblockify) spends most of
its time in the [H,W] <-> [H/8,W/8,8,8] transposes, which are hostile to
the TPU's (8,128) vector layout.  But the per-block 2-D DCT is linear
and block-local, so over the *raster* image it is exactly

    Y = (I_{H/8} (x) D) @ X @ (I_{W/8} (x) D)^T

with D the orthonormal 8-point DCT-II matrix: coefficient (u, v) of
block (by, bx) lands at raster position (8*by+u, 8*bx+v).  Both factors
are block-diagonal, so they can be applied in fixed-size chunks
(I_{K/8} (x) D is a [K, K] constant) — large, dense, transpose-free
matmuls that run on the MXU at full tilt.  Quantization tables and
clamp bounds get pre-rasterized to the same coordinate convention
(jnp.tile / per-block expansion), making the whole projection
(reference: compute.c:334-404) elementwise-plus-matmul in raster space.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jpeg2png_tpu.ops.dct import dct_matrix_f64

_PREC = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _blockdiag_dct(k: int, dtype: str = "float32") -> np.ndarray:
    """I_{k/8} (x) D as a [k, k] host constant."""
    assert k % 8 == 0
    return np.asarray(
        np.kron(np.eye(k // 8), dct_matrix_f64()), dtype=dtype)


def _chunk(n: int) -> int:
    """Largest chunk size in {256,128,64,32,16,8} dividing n."""
    for k in (256, 128, 64, 32, 16, 8):
        if n % k == 0:
            return k
    raise ValueError(f"dimension {n} not a multiple of 8")


def _apply_rows(x: jnp.ndarray, transpose_d: bool) -> jnp.ndarray:
    """Per-8-row-block DCT along axis -2 of [..., H, W]."""
    h = x.shape[-2]
    k = _chunk(h)
    a = jnp.asarray(_blockdiag_dct(k, str(x.dtype)))
    if transpose_d:
        a = a.T
    lead = x.shape[:-2]
    xr = x.reshape(*lead, h // k, k, x.shape[-1])
    y = jnp.einsum("ij,...cjw->...ciw", a, xr, precision=_PREC)
    return y.reshape(*lead, h, x.shape[-1])


def _apply_cols(x: jnp.ndarray, transpose_d: bool) -> jnp.ndarray:
    """Per-8-col-block DCT along axis -1 of [..., H, W]."""
    w = x.shape[-1]
    k = _chunk(w)
    a = jnp.asarray(_blockdiag_dct(k, str(x.dtype)))
    if transpose_d:
        a = a.T
    lead = x.shape[:-2]
    xr = x.reshape(*lead, x.shape[-2], w // k, k)
    # Y[..., h, c, v] = sum_w X[..., h, c, w] * A[v, w]
    y = jnp.einsum("...hcw,vw->...hcv", xr, a, precision=_PREC)
    return y.reshape(*lead, x.shape[-2], w)


def dct_raster(x: jnp.ndarray) -> jnp.ndarray:
    """Forward per-8x8-block orthonormal DCT-II of a raster [..., H, W]."""
    return _apply_cols(_apply_rows(x, False), False)


def idct_raster(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse (DCT-III); exact inverse of dct_raster."""
    return _apply_cols(_apply_rows(x, True), True)


def rasterize_blocked(blocked: np.ndarray) -> np.ndarray:
    """[nby, nbx, 8, 8] host array -> raster [nby*8, nbx*8].

    Places block (by, bx) entry (u, v) at (8*by+u, 8*bx+v) — the raster
    coordinate convention of dct_raster outputs.
    """
    nby, nbx = blocked.shape[:2]
    return np.moveaxis(blocked, 2, 1).reshape(nby * 8, nbx * 8)


def tile_quant(quant: np.ndarray, nby: int, nbx: int) -> np.ndarray:
    """[8, 8] quant table -> raster [nby*8, nbx*8]."""
    return np.tile(quant, (nby, nbx))


# ---------------------------------------------------------------------------
# Sampled block transforms: mean-downsample fused into the DCT matmuls.
#
# For a channel with footprint s (chroma of 4:2:0 has s=2 per axis), the
# reference projection first decomposes each s x s footprint into mean +
# residual (compute.c:349-370), projects the mean image in DCT space and
# replicates it back (compute.c:390-403).  Both resamples are linear:
# mean along rows is M = I (x) ones(s)/s and replication is s * M^T, so
# with P = (I (x) D) @ M (per axis, still block-diagonal) the whole
# projection collapses to
#
#     coefs = P_r @ X @ P_c^T
#     out   = X + (s_r * s_c) * P_r^T @ (clip(coefs, lo, hi) - coefs) @ P_c
#
# and the prob pixel gradient (compute.c:38-70) to
#
#     pgrad = p_alpha * (s_r * s_c) * P_r^T @ ((cos - dq) / q^2) @ P_c
#
# — dense MXU matmuls with no reshape/broadcast resampling in the loop
# (the 4-D footprint reshapes are physical copies under the TPU's
# (8,128) tiled layout and dominated the iteration before this).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _sampled_base(s: int, dtype: str = "float32") -> np.ndarray:
    """D @ (I_8 (x) ones(s)/s) as an [8, 8*s] host constant."""
    d = dct_matrix_f64()
    m = np.kron(np.eye(8), np.full((1, s), 1.0 / s))
    return np.asarray(d @ m, dtype=dtype)


@functools.lru_cache(maxsize=None)
def _blockdiag_sampled(k: int, s: int, dtype: str = "float32") -> np.ndarray:
    """I_{k/8} (x) (D @ M_s): a [k, k*s] chunk of P."""
    assert k % 8 == 0
    return np.asarray(
        np.kron(np.eye(k // 8), _sampled_base(s, "float64")), dtype=dtype)


def sampled_dct_rows(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """P_r @ x: [..., H, W] -> [..., H/(8s) * 8, W] (mean+DCT on rows)."""
    h = x.shape[-2]
    hc = h // s
    k = _chunk(hc)
    a = jnp.asarray(_blockdiag_sampled(k, s, str(x.dtype)))  # [k, k*s]
    lead = x.shape[:-2]
    xr = x.reshape(*lead, hc // k, k * s, x.shape[-1])
    y = jnp.einsum("ij,...cjw->...ciw", a, xr, precision=_PREC)
    return y.reshape(*lead, hc, x.shape[-1])


def sampled_idct_rows(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """P_r^T @ x: [..., hc, W] -> [..., hc*s, W] (IDCT+replicate/s)."""
    hc = x.shape[-2]
    k = _chunk(hc)
    a = jnp.asarray(_blockdiag_sampled(k, s, str(x.dtype)))
    lead = x.shape[:-2]
    xr = x.reshape(*lead, hc // k, k, x.shape[-1])
    y = jnp.einsum("ij,...ciw->...cjw", a, xr, precision=_PREC)
    return y.reshape(*lead, hc * s, x.shape[-1])


def sampled_dct_cols(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """x @ P_c^T: [..., H, W] -> [..., H, W/s] (mean+DCT on cols)."""
    w = x.shape[-1]
    wc = w // s
    k = _chunk(wc)
    a = jnp.asarray(_blockdiag_sampled(k, s, str(x.dtype)))
    lead = x.shape[:-2]
    xr = x.reshape(*lead, x.shape[-2], wc // k, k * s)
    y = jnp.einsum("...hcw,vw->...hcv", xr, a, precision=_PREC)
    return y.reshape(*lead, x.shape[-2], wc)


def sampled_idct_cols(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """x @ P_c: [..., H, wc] -> [..., H, wc*s]."""
    wc = x.shape[-1]
    k = _chunk(wc)
    a = jnp.asarray(_blockdiag_sampled(k, s, str(x.dtype)))
    lead = x.shape[:-2]
    xr = x.reshape(*lead, x.shape[-2], wc // k, k)
    y = jnp.einsum("...hcv,vw->...hcw", xr, a, precision=_PREC)
    return y.reshape(*lead, x.shape[-2], wc * s)


def sampled_dct(x: jnp.ndarray, sy: int, sx: int) -> jnp.ndarray:
    """Footprint-mean + per-8x8-block DCT in one matmul pair."""
    return sampled_dct_cols(sampled_dct_rows(x, sy), sx)


def sampled_idct_up(x: jnp.ndarray, sy: int, sx: int) -> jnp.ndarray:
    """IDCT + footprint replication: returns (sy*sx) * upsample(idct(x))
    WITHOUT the sy*sx factor — callers multiply by sy*sx themselves."""
    return sampled_idct_cols(sampled_idct_rows(x, sy), sx)
