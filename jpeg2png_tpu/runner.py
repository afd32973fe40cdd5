"""Batched multi-image decoding (BASELINE.json config 4).

The reference parallelizes over input files with OpenMP threads
(jpeg2png.c:330-337, "almost linear speedup"); the TPU-native analog
batches images through one compiled solve:

  * images are read on the host (thread pool — entropy decode is the
    host-side stage, SURVEY.md §7 hard-parts #4),
  * grouped into buckets by exact solver geometry (channel block grids
    + sampling factors): every bucket member shares one compilation,
    avoiding the recompilation storm mixed sizes would otherwise cause,
  * each bucket is solved as one vmapped scan over a stacked
    [B, ...] coefficient tensor — the batch dimension is free
    parallelism for the TPU,
  * per-image quant tables ride along as batched inputs (varied quant
    tables recompile nothing).

Images whose geometry appears only once still go through the batched
path with B=1 (same compiled artifact as any other B=1 of that shape).
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jpeg2png_tpu.io import JpegImage, read_jpeg
from jpeg2png_tpu.models.solver import ChannelGeometry, _build_solver
from jpeg2png_tpu.utils.config import SolverConfig  # noqa: F401 (API)


def geometry_key(img: JpegImage) -> Tuple:
    return tuple(
        (p.nby, p.nbx, p.h_samp, p.w_samp) for p in img.planes
    )


@dataclasses.dataclass
class BatchResult:
    fdata: np.ndarray     # [B, C, H, W]
    metrics: np.ndarray   # [B, iterations, 4]


def solve_batched(
    datas: Sequence[Sequence[np.ndarray]],   # [B][C] int16 coef tensors
    quants: Sequence[Sequence[np.ndarray]],  # [B][C] uint16 tables
    samps: Sequence[Tuple[int, int]],        # [C]
    weight: float,
    pweights: Sequence[float],
    iterations: int,
    simd_compat_logging: bool = True,
    use_pallas: Optional[bool] = None,
) -> BatchResult:
    """Solve B same-geometry images in one vmapped compiled step."""
    from jpeg2png_tpu.models.solver import _pallas_default

    geoms = tuple(
        ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
        for d, (sy, sx) in zip(datas[0], samps)
    )
    if use_pallas is None:
        use_pallas = _pallas_default(geoms)
    solver = _build_solver(
        geoms, float(weight), tuple(float(p) for p in pweights),
        int(iterations), bool(simd_compat_logging), "float32",
        bool(use_pallas),
    )
    C = len(samps)
    stacked_d = [jnp.asarray(np.stack([b[c] for b in datas]))
                 for c in range(C)]
    stacked_q = [jnp.asarray(np.stack([b[c] for b in quants]))
                 for c in range(C)]
    if use_pallas:
        # the manual-DMA Pallas kernels do not vmap under this Mosaic
        # version, but they run fine under lax.map: one dispatch, each
        # image solved at full fused-kernel speed (~3x the vmapped XLA
        # path per image)
        batched = jax.jit(lambda ds, qs: jax.lax.map(
            lambda t: solver(t[0], t[1]), (ds, qs)))
    else:
        batched = jax.jit(jax.vmap(solver, in_axes=([0] * C, [0] * C)))
    fdata, metrics = batched(stacked_d, stacked_q)
    return BatchResult(np.asarray(fdata), np.asarray(metrics))


def decode_files_batched(
    infiles: Sequence[str],
    cfg: SolverConfig,
    bits: int = 8,
    io_threads: int = 8,
    logger=None,
) -> Dict[str, "np.ndarray"]:
    """Read, bucket, batch-solve and color-convert many files.

    Returns {infile: pixels}.  Joint mode only (separate-components
    batching would triple the bucket count for little gain).
    """
    from jpeg2png_tpu.ops.color import gray_packed, ycbcr_to_rgb_packed

    with concurrent.futures.ThreadPoolExecutor(io_threads) as pool:
        images = list(pool.map(read_jpeg, infiles))

    buckets: Dict[Tuple, List[int]] = defaultdict(list)
    for i, img in enumerate(images):
        buckets[geometry_key(img)].append(i)

    out: Dict[str, np.ndarray] = {}
    for key, members in buckets.items():
        imgs = [images[i] for i in members]
        C = imgs[0].nchannel
        datas = [[p.data for p in im.planes] for im in imgs]
        quants = [[p.quant for p in im.planes] for im in imgs]
        samps = [(p.h_samp, p.w_samp) for p in imgs[0].planes]
        res = solve_batched(
            datas, quants, samps,
            cfg.weights[0], list(cfg.pweights[:C]), cfg.iterations[0],
            cfg.simd_compat_logging,
        )
        for bi, i in enumerate(members):
            im = images[i]
            if logger is not None:
                logger.log_metrics(infiles[i], 3 if im.nchannel > 1 else 0,
                                   res.metrics[bi])
            h, w = im.height, im.width
            fd = res.fdata[bi]
            if C == 1:
                pix = np.asarray(gray_packed(
                    jnp.asarray(fd[0, :h, :w] + 128.0), bits))
            else:
                pix = np.asarray(ycbcr_to_rgb_packed(
                    jnp.asarray(fd[0, :h, :w] + 128.0),
                    jnp.asarray(fd[1, :h, :w]),
                    jnp.asarray(fd[2, :h, :w]), bits))
            out[infiles[i]] = pix
    return out
