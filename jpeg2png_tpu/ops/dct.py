"""Orthonormal 8x8 block DCT-II / DCT-III as TPU matmuls.

The reference uses Takuya Ooura's in-place scalar butterflies
(reference: ooura/dct.c:34-159) producing the *normalized* (orthonormal)
2-D DCT-II; orthonormality is what makes the quantization-box projection
valid (reference: README.md:113).  On TPU we instead express the same
transform as dense matmuls so it runs on the MXU:

  * separable form:  Y = D @ X @ D^T            (two 8x8 batched matmuls)
  * kron form:       vec(Y) = (D (x) D) vec(X)  (one [N,64]x[64,64] matmul)

The kron form does 4x the FLOPs of the separable form but maps to a
single large well-shaped matmul, which is what the MXU wants; both are
exposed and benchmarked.  All matmuls run with Precision.HIGHEST —
the default TPU bf16 matmul passes would lose ~8 units of amplitude on
coefficient magnitudes up to 255*8, far coarser than the +-0.5*quant
feasible boxes the solver projects onto.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# -----------------------------------------------------------------------------
# Transform constants
# -----------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def dct_matrix_f64() -> np.ndarray:
    """The orthonormal 8-point DCT-II matrix D, float64.

    D[k, n] = s_k * cos(pi * (2n+1) * k / 16),  s_0 = sqrt(1/8), s_k = 1/2.

    Rows are orthonormal: D @ D.T == I.  Applying D to columns and rows of
    an 8x8 block gives exactly the "normalized 8x8 DCT" of the reference
    (ooura/dct.c:98: dct8x8s), e.g. D[4,:] entries all equal
    sqrt(2/8)*cos(pi/4) = 0.3535533905932738 = C8_4R.
    """
    k = np.arange(8).reshape(8, 1).astype(np.float64)
    n = np.arange(8).reshape(1, 8).astype(np.float64)
    d = np.cos(np.pi * (2 * n + 1) * k / 16.0) * np.sqrt(2.0 / 8.0)
    d[0, :] = np.sqrt(1.0 / 8.0)
    return d


@functools.lru_cache(maxsize=None)
def _dct_mat(dtype: str = "float32") -> np.ndarray:
    # cache host-side constants only: caching a jnp array created during
    # a jit trace would leak a tracer into later traces
    return np.asarray(dct_matrix_f64(), dtype=dtype)


@functools.lru_cache(maxsize=None)
def _kron_mat(dtype: str = "float32") -> np.ndarray:
    """M[(i*8+j), (i'*8+j')] = D[i,i'] * D[j,j'] so vec(Y) = M @ vec(X)."""
    d = dct_matrix_f64()
    return np.asarray(np.kron(d, d), dtype=dtype)


_PREC = jax.lax.Precision.HIGHEST


# -----------------------------------------------------------------------------
# Blocked transforms.  Blocks layout: [..., nby, nbx, 8, 8]
# -----------------------------------------------------------------------------


def dct8x8(blocks: jnp.ndarray) -> jnp.ndarray:
    """Forward orthonormal 2-D DCT-II over trailing [8, 8] dims."""
    d = _dct_mat(str(blocks.dtype))
    y = jnp.einsum("ij,...jk->...ik", d, blocks, precision=_PREC)
    return jnp.einsum("...ik,jk->...ij", y, d, precision=_PREC)


def idct8x8(blocks: jnp.ndarray) -> jnp.ndarray:
    """Inverse (DCT-III) over trailing [8, 8] dims; exact inverse of dct8x8."""
    d = _dct_mat(str(blocks.dtype))
    y = jnp.einsum("ji,...jk->...ik", d, blocks, precision=_PREC)
    return jnp.einsum("...ik,kj->...ij", y, d, precision=_PREC)


def dct8x8_kron(blocks: jnp.ndarray) -> jnp.ndarray:
    """Forward DCT via a single [N, 64] x [64, 64] matmul (MXU-friendly)."""
    m = _kron_mat(str(blocks.dtype))
    shape = blocks.shape
    flat = blocks.reshape(-1, 64)
    out = jax.lax.dot_general(
        flat, m, (((1,), (1,)), ((), ())), precision=_PREC,
        preferred_element_type=flat.dtype,
    )
    return out.reshape(shape)


def idct8x8_kron(blocks: jnp.ndarray) -> jnp.ndarray:
    """Inverse DCT via a single [N, 64] x [64, 64] matmul."""
    m = _kron_mat(str(blocks.dtype))
    shape = blocks.shape
    flat = blocks.reshape(-1, 64)
    out = jax.lax.dot_general(
        flat, m, (((1,), (0,)), ((), ())), precision=_PREC,
        preferred_element_type=flat.dtype,
    )
    return out.reshape(shape)
