"""Per-file decode pipeline: JPEG -> smooth solve -> PNG.

The TPU-native equivalent of decode_file (reference: jpeg2png.c:120-172):
read coefficients on the host, run the fused solver on device (joint or
per-channel), re-add the +128 luma offset (jpeg2png.c:156-159), convert
YCbCr -> RGB on device with the reference's exact constants and
clamp-then-scale order (png.c:44-47), and pack a PNG on the host.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from jpeg2png_tpu.io import JpegImage, read_jpeg, require_supported, write_png
from jpeg2png_tpu.models.solver import solve_joint
from jpeg2png_tpu.ops.color import gray_packed, ycbcr_to_rgb_packed
from jpeg2png_tpu.utils.config import SolverConfig
from jpeg2png_tpu.utils.logger import ConvergenceLogger
from jpeg2png_tpu.utils.progress import ProgressBar


@dataclasses.dataclass
class DecodeResult:
    pixels: np.ndarray          # [H, W, 3] or [H, W] uint8/uint16
    metrics_per_channel: dict   # channel id (3 = joint) -> [iters, 4]


def smooth_decode(img: JpegImage, cfg: SolverConfig,
                  progress: Optional[ProgressBar] = None,
                  bits: int = 8, stripes: int = 0) -> DecodeResult:
    """Solve and convert one parsed JPEG to output pixels.

    stripes > 1 shards the image's rows over that many devices with
    per-iteration halo collectives (parallel/stripes.py) — the path for
    giant images that exceed one chip (BASELINE.json config 5).
    """
    require_supported(img)
    datas = [p.data for p in img.planes]
    quants = [p.quant for p in img.planes]
    samps = [(p.h_samp, p.w_samp) for p in img.planes]
    C = img.nchannel

    metrics_out = {}
    if stripes > 1 and (not cfg.separate_components or C == 1):
        from jpeg2png_tpu.parallel.mesh import stripe_mesh
        from jpeg2png_tpu.parallel.stripes import solve_striped

        # any geometry stripes: solve_striped zero-pads the canvas to
        # the stripe grid with frozen/FREE boxes and crops afterwards
        fdata, metrics = solve_striped(
            datas, quants, samps, cfg.weights[0], cfg.pweights[:C],
            cfg.iterations[0], stripe_mesh(stripes),
            cfg.simd_compat_logging)
        metrics_out[3 if C > 1 else 0] = np.asarray(metrics)
        channels = [fdata[c] for c in range(C)]
        if progress:
            progress.increment(cfg.iterations[0])
    elif not cfg.separate_components or C == 1:
        fdata, metrics = solve_joint(
            datas, quants, samps,
            cfg.weights[0], cfg.pweights[:C], cfg.iterations[0],
            cfg.simd_compat_logging, cfg.dtype,
        )
        metrics_out[3 if C > 1 else 0] = np.asarray(metrics)
        channels = [fdata[c] for c in range(C)]
        if progress:
            progress.increment(cfg.iterations[0])
    else:
        channels = []
        for c in range(C):
            s = cfg.channel(c)
            fd, metrics = solve_joint(
                [datas[c]], [quants[c]], [samps[c]],
                s.weight, [s.pweight], s.iterations,
                cfg.simd_compat_logging, cfg.dtype,
            )
            metrics_out[c] = np.asarray(metrics)
            channels.append(fd[0])
            if progress:
                progress.increment(s.iterations)

    h, w = img.height, img.width
    if C == 1:
        y = channels[0][:h, :w] + 128.0
        pixels = np.asarray(gray_packed(y, bits))
    else:
        y = channels[0][:h, :w] + 128.0
        cb = channels[1][:h, :w]
        cr = channels[2][:h, :w]
        pixels = np.asarray(ycbcr_to_rgb_packed(y, cb, cr, bits))
    return DecodeResult(pixels=pixels, metrics_per_channel=metrics_out)


def decode_file(
    infile: str,
    outfile: str,
    cfg: SolverConfig,
    bits: int = 8,
    logger: Optional[ConvergenceLogger] = None,
    progress: Optional[ProgressBar] = None,
    stripes: int = 0,
) -> DecodeResult:
    """Full per-file pipeline (jpeg2png.c:120-172)."""
    img = read_jpeg(infile)
    result = smooth_decode(img, cfg, progress, bits, stripes)
    if logger is not None:
        for channel, metrics in sorted(result.metrics_per_channel.items()):
            logger.log_metrics(infile, channel, metrics)
    write_png(outfile, result.pixels, bits)
    return result


def plain_decode(img: JpegImage, bits: int = 8) -> np.ndarray:
    """Baseline (blocky) decode without smoothing — the solver's starting
    point, exposed for comparisons and tests (jpeg.c:83-92 + write_png)."""
    from jpeg2png_tpu.models.solver import initial_decode
    from jpeg2png_tpu.ops.resample import upsample_nearest_clamped

    H = max(p.ph * p.h_samp for p in img.planes)
    W = max(p.pw * p.w_samp for p in img.planes)
    chans = []
    for p in img.planes:
        dec = initial_decode(jnp.asarray(p.data),
                             jnp.asarray(p.quant).astype(jnp.float32))
        chans.append(upsample_nearest_clamped(dec, p.h_samp, p.w_samp, H, W))
    h, w = img.height, img.width
    if img.nchannel == 1:
        return np.asarray(gray_packed(chans[0][:h, :w] + 128.0, bits))
    return np.asarray(ycbcr_to_rgb_packed(
        chans[0][:h, :w] + 128.0, chans[1][:h, :w], chans[2][:h, :w], bits))
