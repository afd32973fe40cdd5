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
                  bits: int = 8, stripes: int = 0,
                  metrics_stream=None) -> DecodeResult:
    """Solve and convert one parsed JPEG to output pixels.

    stripes > 1 shards the image's rows over that many devices with
    per-iteration halo collectives (parallel/stripes.py) — the path for
    giant images that exceed one chip (BASELINE.json config 5).

    metrics_stream: optional callable (channel, start_iteration,
    metrics_chunk) fired DURING the solve — with it (or a progress
    bar) active, long solves run as resumable chunks so the bar ticks
    and the CSV streams mid-solve, like the reference's per-iteration
    hooks (compute.c:449-452, logger.c:20).  Chunking is bit-identical
    to the one-shot solve on the whole-solve (mega/mega-lite) kernel
    and the bucketed tiers; on the two-lite tier the XLA glue between
    kernels fuses differently per chunk length, a few-ulp drift (see
    test_runner.py::test_solve_bucket_two_lite_matches_per_image).
    """
    require_supported(img)
    datas = [p.data for p in img.planes]
    quants = [p.quant for p in img.planes]
    samps = [(p.h_samp, p.w_samp) for p in img.planes]
    C = img.nchannel

    # chunked execution once there is someone to tell about progress.
    # Short solves (<= 16 iterations) chunk PER ITERATION so the bar
    # ticks with the reference's fidelity (progressbar.c:37-47 redraws
    # every iteration); longer solves use the default 8-50 chunk, which
    # amortizes dispatch overhead at the same visual granularity.
    def _chunk_for(iters):
        return 1 if iters <= 16 else None

    def chunked_solve(ds, qs, ss, w, pw, iters, channel_id):
        from jpeg2png_tpu.models.solver import solve_joint_chunked

        def on_chunk(done, chunk_metrics):
            if progress:
                progress.increment(chunk_metrics.shape[0])
            if metrics_stream:
                metrics_stream(channel_id, done - chunk_metrics.shape[0],
                               chunk_metrics)

        return solve_joint_chunked(
            ds, qs, ss, w, pw, iters, on_chunk=on_chunk,
            chunk=_chunk_for(iters),
            simd_compat_logging=cfg.simd_compat_logging,
            dtype=cfg.dtype)

    live = (progress is not None or metrics_stream is not None)
    # Multi-controller runs: the chunking DECISION must be rank-uniform.
    # Observers (progress bar, CSV stream) exist on rank 0 only, and the
    # striped chunk loop issues a separate collective schedule per chunk
    # — a rank that one-shots while rank 0 chunks desynchronizes the
    # Gloo/ICI collectives and kills the whole run.  Every rank chunks;
    # ranks without observers run no-op callbacks.
    from jpeg2png_tpu.parallel.distributed import is_multi_process
    if is_multi_process():
        live = True

    if stripes > 1:
        # degrade loudly, never silently: an unsatisfiable stripe
        # request clamps to the real device count with a warning (the
        # mesh constructors themselves refuse to truncate — mesh.py).
        # The warning is host-side output, so like the CSV/progress/PNG
        # writes it prints on rank 0 only.
        import sys

        import jax

        from jpeg2png_tpu.parallel.distributed import is_primary
        avail = len(jax.devices())
        if stripes > avail:
            if is_primary():
                what = (f"striping over {avail}" if avail > 1 else
                        "falling back to the single-device solver")
                print(f"jpeg2png_tpu: --tpu-stripes {stripes} exceeds "
                      f"the {avail} available device(s); {what}",
                      file=sys.stderr)
            stripes = avail

    metrics_out = {}
    if stripes > 1 and (not cfg.separate_components or C == 1):
        from jpeg2png_tpu.parallel.mesh import stripe_mesh
        from jpeg2png_tpu.parallel.stripes import solve_striped

        # any geometry stripes: solve_striped zero-pads the canvas to
        # the stripe grid with frozen/FREE boxes and crops afterwards
        channel_id = 3 if C > 1 else 0
        on_chunk = None
        if live and cfg.iterations[0] > 0:
            def on_chunk(done, chunk_metrics):
                if progress:
                    progress.increment(chunk_metrics.shape[0])
                if metrics_stream:
                    metrics_stream(channel_id,
                                   done - chunk_metrics.shape[0],
                                   chunk_metrics)
        fdata, metrics = solve_striped(
            datas, quants, samps, cfg.weights[0], cfg.pweights[:C],
            cfg.iterations[0], stripe_mesh(stripes),
            cfg.simd_compat_logging, on_chunk=on_chunk,
            chunk=_chunk_for(cfg.iterations[0]))
        # under multi-host execution the striped result is sharded
        # across processes: all-gather it once, here at the very end
        from jpeg2png_tpu.parallel.distributed import gather_output
        fdata = gather_output(fdata)
        metrics = gather_output(metrics)
        metrics_out[channel_id] = np.asarray(metrics)
        channels = [fdata[c] for c in range(C)]
        if on_chunk is None:
            if progress:
                progress.increment(cfg.iterations[0])
            if metrics_stream:
                metrics_stream(channel_id, 0, np.asarray(metrics))
    elif stripes > 1:
        # -s + --tpu-stripes: each channel is an independent C=1
        # striped solve on the shared full-res canvas (the reference's
        # per-channel compute() calls, jpeg2png.c:146-153, each sharded
        # over the mesh) — previously this combination silently fell
        # back to unstriped per-channel solves (VERDICT round-2 item 6)
        from jpeg2png_tpu.parallel.distributed import gather_output
        from jpeg2png_tpu.parallel.mesh import stripe_mesh
        from jpeg2png_tpu.parallel.stripes import solve_striped

        mesh = stripe_mesh(stripes)
        channels = []
        for c in range(C):
            s = cfg.channel(c)
            on_chunk = None
            if live and s.iterations > 0:
                def on_chunk(done, chunk_metrics, c=c):
                    if progress:
                        progress.increment(chunk_metrics.shape[0])
                    if metrics_stream:
                        metrics_stream(c, done - chunk_metrics.shape[0],
                                       chunk_metrics)
            fd, metrics = solve_striped(
                [datas[c]], [quants[c]], [samps[c]], s.weight,
                [s.pweight], s.iterations, mesh,
                cfg.simd_compat_logging, on_chunk=on_chunk,
                chunk=_chunk_for(s.iterations))
            fd = gather_output(fd)
            metrics = gather_output(metrics)
            metrics_out[c] = np.asarray(metrics)
            channels.append(fd[0])
            if on_chunk is None:
                if progress:
                    progress.increment(s.iterations)
                if metrics_stream:
                    metrics_stream(c, 0, np.asarray(metrics))
    elif not cfg.separate_components or C == 1:
        channel_id = 3 if C > 1 else 0
        if live and cfg.iterations[0] > 0:
            fdata, metrics = chunked_solve(
                datas, quants, samps, cfg.weights[0],
                cfg.pweights[:C], cfg.iterations[0], channel_id)
        else:
            fdata, metrics = solve_joint(
                datas, quants, samps,
                cfg.weights[0], cfg.pweights[:C], cfg.iterations[0],
                cfg.simd_compat_logging, cfg.dtype,
            )
            if progress:
                progress.increment(cfg.iterations[0])
            if metrics_stream:
                metrics_stream(channel_id, 0, np.asarray(metrics))
        metrics_out[channel_id] = np.asarray(metrics)
        channels = [fdata[c] for c in range(C)]
    else:
        channels = []
        for c in range(C):
            s = cfg.channel(c)
            if live and s.iterations > 0:
                fd, metrics = chunked_solve(
                    [datas[c]], [quants[c]], [samps[c]],
                    s.weight, [s.pweight], s.iterations, c)
            else:
                fd, metrics = solve_joint(
                    [datas[c]], [quants[c]], [samps[c]],
                    s.weight, [s.pweight], s.iterations,
                    cfg.simd_compat_logging, cfg.dtype,
                )
                if progress:
                    progress.increment(s.iterations)
                if metrics_stream:
                    metrics_stream(c, 0, np.asarray(metrics))
            metrics_out[c] = np.asarray(metrics)
            channels.append(fd[0])

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
    """Full per-file pipeline (jpeg2png.c:120-172).

    CSV rows stream DURING the solve (chunked execution) rather than
    after it, so `-c` on a long run behaves like the reference's
    in-loop logger (logger.c:20)."""
    from jpeg2png_tpu.parallel.distributed import barrier, is_primary

    img = read_jpeg(infile)
    primary = is_primary()
    stream = None
    if logger is not None and primary:
        def stream(channel, start, metrics):
            logger.log_metrics(infile, channel, metrics,
                               start_iteration=start)
    result = smooth_decode(img, cfg, progress, bits, stripes,
                           metrics_stream=stream)
    # multi-controller runs execute this on every process; only rank 0
    # writes the file (the reference's single writer, jpeg2png.c:162-165
    # — gather_output already landed the pixels on every host).  The
    # barrier keeps non-writers from racing ahead (e.g. exiting and
    # tearing down the coordinator before the write completes); it sits
    # in a finally so a rank-0 write failure surfaces as an error on
    # rank 0 instead of stranding the other ranks at the barrier.
    try:
        if primary:
            write_png(outfile, result.pixels, bits)
    finally:
        barrier(f"write:{outfile}")
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
