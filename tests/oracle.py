"""Scalar NumPy oracle for the solver math, written in *scatter* form.

This is the test-side twin of the gather-form TPU ops: a direct,
loop/scatter-style realization of the algorithm as documented in
SURVEY.md §2/§3 (subgradient scatter for TV at compute.c:93-106, the
7-point TGV2 scatter at compute.c:158-185, footprint-replicated prob
gradient at compute.c:53-66, mean/residual projection at
compute.c:334-404).  It exists so the vectorized gather ops can be
diffed against an independent formulation, the same role compare()
played for the reference's SIMD kernels (utils.c:55-68).

Everything here is float64 NumPy and deliberately slow/obvious.
"""

from __future__ import annotations

import numpy as np


def dct_matrix() -> np.ndarray:
    k = np.arange(8).reshape(8, 1).astype(np.float64)
    n = np.arange(8).reshape(1, 8).astype(np.float64)
    d = np.cos(np.pi * (2 * n + 1) * k / 16.0) * np.sqrt(0.25)
    d[0, :] = np.sqrt(0.125)
    return d


_D = dct_matrix()


def dct2(block: np.ndarray) -> np.ndarray:
    return _D @ block @ _D.T


def idct2(block: np.ndarray) -> np.ndarray:
    return _D.T @ block @ _D


def blocks_to_raster(blocks: np.ndarray) -> np.ndarray:
    nby, nbx = blocks.shape[:2]
    out = np.zeros((nby * 8, nbx * 8))
    for by in range(nby):
        for bx in range(nbx):
            out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = blocks[by, bx]
    return out


def raster_to_blocks(img: np.ndarray) -> np.ndarray:
    h, w = img.shape
    out = np.zeros((h // 8, w // 8, 8, 8))
    for by in range(h // 8):
        for bx in range(w // 8):
            out[by, bx] = img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
    return out


def tv_scatter(f: np.ndarray):
    """f: [C, H, W]. Returns (tv, grad, gx, gy) via per-pixel scatter."""
    C, H, W = f.shape
    grad = np.zeros_like(f)
    gx = np.zeros_like(f)
    gy = np.zeros_like(f)
    alpha = 1.0 / np.sqrt(C)
    tv = 0.0
    for y in range(H):
        for x in range(W):
            gxs = np.zeros(C)
            gys = np.zeros(C)
            for c in range(C):
                if x < W - 1:
                    gxs[c] = f[c, y, x + 1] - f[c, y, x]
                if y < H - 1:
                    gys[c] = f[c, y + 1, x] - f[c, y, x]
            g_norm = np.sqrt(np.sum(gxs**2 + gys**2))
            tv += alpha * g_norm
            if g_norm != 0:
                for c in range(C):
                    grad[c, y, x] += alpha * -(gxs[c] + gys[c]) / g_norm
                    if x < W - 1:
                        grad[c, y, x + 1] += alpha * gxs[c] / g_norm
                    if y < H - 1:
                        grad[c, y + 1, x] += alpha * gys[c] / g_norm
            gx[:, y, x] = gxs
            gy[:, y, x] = gys
    return tv, grad, gx, gy


def tv2_scatter(gx: np.ndarray, gy: np.ndarray, alpha: float):
    """Second-order term from stored diffs. alpha = weight/sqrt(2)."""
    C, H, W = gx.shape
    grad = np.zeros_like(gx)
    a = alpha / np.sqrt(C)
    tv2 = 0.0
    for y in range(H):
        for x in range(W):
            g_xx = np.zeros(C)
            g_yy = np.zeros(C)
            sym = np.zeros(C)
            for c in range(C):
                gxx = gx[c, y, x] - gx[c, y, x - 1] if x > 0 else 0.0
                gyx = gy[c, y, x] - gy[c, y, x - 1] if x > 0 else 0.0
                gxy = gx[c, y, x] - gx[c, y - 1, x] if y > 0 else 0.0
                gyy = gy[c, y, x] - gy[c, y - 1, x] if y > 0 else 0.0
                g_xx[c] = gxx
                g_yy[c] = gyy
                sym[c] = (gxy + gyx) / 2.0
            n2 = np.sqrt(np.sum(g_xx**2 + 2 * sym**2 + g_yy**2))
            tv2 += a * n2
            if n2 != 0:
                for c in range(C):
                    grad[c, y, x] += a * (-(2 * g_xx[c] + 2 * sym[c] + 2 * g_yy[c]) / n2)
                    if x > 0:
                        grad[c, y, x - 1] += a * (sym[c] + g_xx[c]) / n2
                    if x < W - 1:
                        grad[c, y, x + 1] += a * (sym[c] + g_xx[c]) / n2
                    if y > 0:
                        grad[c, y - 1, x] += a * (g_yy[c] + sym[c]) / n2
                    if y < H - 1:
                        grad[c, y + 1, x] += a * (g_yy[c] + sym[c]) / n2
                    if x < W - 1 and y > 0:
                        grad[c, y - 1, x + 1] += a * (-sym[c]) / n2
                    if x > 0 and y < H - 1:
                        grad[c, y + 1, x - 1] += a * (-sym[c]) / n2
    return tv2, grad


def prob_scatter(cos, data, quant, p_alpha, sy, sx, H, W):
    """cos/data: [nby, nbx, 8, 8]; returns (alpha-free dist, grad [H, W])."""
    nby, nbx = cos.shape[:2]
    grad = np.zeros((H, W))
    dist = 0.0
    for by in range(nby):
        for bx in range(nbx):
            dev = cos[by, bx] - data[by, bx] * quant
            dist += 0.5 * np.sum((dev / quant) ** 2)
            pix = idct2(dev / quant**2)
            for iy in range(8):
                for ix in range(8):
                    cy = by * 8 + iy
                    cx = bx * 8 + ix
                    for oy in range(sy):
                        for ox in range(sx):
                            grad[cy * sy + oy, cx * sx + ox] += p_alpha * pix[iy, ix]
    return dist, grad


def project(region, data, quant, sy, sx):
    """Projection of one channel's region; returns (projected, clamped)."""
    hh, ww = region.shape
    hc, wc = hh // sy, ww // sx
    sub = np.zeros((hc, wc))
    residual = region.copy()
    for cy in range(hc):
        for cx in range(wc):
            m = region[cy * sy:(cy + 1) * sy, cx * sx:(cx + 1) * sx].mean()
            sub[cy, cx] = m
            residual[cy * sy:(cy + 1) * sy, cx * sx:(cx + 1) * sx] -= m
    blocks = raster_to_blocks(sub)
    clamped = np.zeros_like(blocks)
    for by in range(blocks.shape[0]):
        for bx in range(blocks.shape[1]):
            coefs = dct2(blocks[by, bx])
            lo = (data[by, bx] - 0.5) * quant
            hi = (data[by, bx] + 0.5) * quant
            clamped[by, bx] = np.clip(coefs, lo, hi)
            blocks[by, bx] = idct2(clamped[by, bx])
    out = blocks_to_raster(blocks)
    full = residual
    for cy in range(hc):
        for cx in range(wc):
            full[cy * sy:(cy + 1) * sy, cx * sx:(cx + 1) * sx] += out[cy, cx]
    return full, clamped


def solve(datas, quants, samps, weight, pweights, iterations,
          simd_compat_logging=True):
    """Full oracle solve, mirroring compute() (compute.c:406-465).

    Returns (fdata [C, H, W], metrics [iterations, 4]).
    """
    C = len(datas)
    H = max(d.shape[0] * 8 * sy for d, (sy, sx) in zip(datas, samps))
    W = max(d.shape[1] * 8 * sx for d, (sy, sx) in zip(datas, samps))

    fdata = np.zeros((C, H, W))
    cos = []
    for c, (data, quant, (sy, sx)) in enumerate(zip(datas, quants, samps)):
        nby, nbx = data.shape[:2]
        dec = np.zeros((nby * 8, nbx * 8))
        dq = data.astype(np.float64) * quant
        for by in range(nby):
            for bx in range(nbx):
                dec[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = idct2(dq[by, bx])
        for y in range(H):
            for x in range(W):
                cy = min(y // sy, nby * 8 - 1)
                cx = min(x // sx, nbx * 8 - 1)
                fdata[c, y, x] = dec[cy, cx]
        cos.append(dq.copy())

    fista = fdata.copy()
    radius = np.sqrt(float(H) * float(W)) / 2.0
    step_size = radius / np.sqrt(1.0 + iterations)
    p_alphas = [p * 2 * 255 * np.sqrt(2) for p in pweights]
    total_alpha = sum(pa for pa in p_alphas if pa != 0) + C
    if weight != 0:
        total_alpha += weight / np.sqrt(2) * C

    t = 1.0
    metrics = []
    for _ in range(iterations):
        tnext = (1 + np.sqrt(1 + 4 * t * t)) / 2
        factor = (t - 1) / tnext
        new = fdata + factor * (fdata - fista)
        fista = fdata
        fdata = new
        t = tnext

        grad = np.zeros_like(fdata)
        prob_dist = 0.0
        for c, (data, quant, (sy, sx)) in enumerate(zip(datas, quants, samps)):
            if p_alphas[c] == 0:
                continue
            dist, g = prob_scatter(cos[c], data, quant, p_alphas[c], sy, sx,
                                   data.shape[0] * 8 * sy, data.shape[1] * 8 * sx)
            prob_dist += p_alphas[c] * dist if not simd_compat_logging else dist
            grad[c, :g.shape[0], :g.shape[1]] += g

        tv, gtv, gx, gy = tv_scatter(fdata)
        grad += gtv
        tv2 = 0.0
        if weight != 0:
            tv2, g2 = tv2_scatter(gx, gy, weight / np.sqrt(2))
            grad += g2

        for c in range(C):
            norm = np.sqrt(np.sum(grad[c] ** 2))
            if norm != 0:
                fdata[c] -= step_size * grad[c] / norm

        for c, (data, quant, (sy, sx)) in enumerate(zip(datas, quants, samps)):
            rh = data.shape[0] * 8 * sy
            rw = data.shape[1] * 8 * sx
            proj, clamped = project(fdata[c, :rh, :rw], data, quant, sy, sx)
            fdata[c, :rh, :rw] = proj
            cos[c] = clamped

        metrics.append([(tv + tv2 + prob_dist) / total_alpha, prob_dist, tv, tv2])

    return fdata, np.array(metrics)
