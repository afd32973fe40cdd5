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
import math
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


def dp_degree(B: int, requested: Optional[int] = None) -> int:
    """Data-parallel width for a B-image bucket: how many devices to
    spread the batch over (the reference's "almost linear" OpenMP-over-
    files scaling, jpeg2png.c:330-337, mapped onto the device mesh).

    Counts LOCAL devices: batch DP needs no collectives, so in a
    multi-controller run each process batches over its own chips and
    files are partitioned across processes (decode_files_batched)."""
    n = len(jax.local_devices())
    if requested is not None:
        n = min(n, requested)
    return max(1, min(n, B))


def _dp_wrap(body, n_dp: int):
    """jit(body) for n_dp == 1; otherwise shard_map over an n_dp-device
    "batch" mesh — each device solves its shard of the stacked inputs
    locally (no collectives: images are independent)."""
    if n_dp <= 1:
        return jax.jit(body)
    from jax.sharding import PartitionSpec as P

    from jpeg2png_tpu.parallel.mesh import batch_mesh

    mesh = batch_mesh(n_dp, devices=jax.local_devices()[:n_dp])
    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P("batch"), out_specs=P("batch"),
        check_vma=False))


def _pad_batch(arrays_tree, B: int, n_dp: int):
    """Pad the leading batch dim to a multiple of n_dp by repeating the
    first member (cropped off the results)."""
    pad = (-B) % n_dp
    if pad == 0:
        return arrays_tree
    return jax.tree.map(
        lambda a: np.concatenate([a, np.repeat(a[:1], pad, axis=0)]),
        arrays_tree)


def solve_batched(
    datas: Sequence[Sequence[np.ndarray]],   # [B][C] int16 coef tensors
    quants: Sequence[Sequence[np.ndarray]],  # [B][C] uint16 tables
    samps: Sequence[Tuple[int, int]],        # [C]
    weight: float,
    pweights: Sequence[float],
    iterations: int,
    simd_compat_logging: bool = True,
    use_pallas: Optional[bool] = None,
    data_parallel: Optional[int] = None,
) -> BatchResult:
    """Solve B same-geometry images in one batched compiled step,
    sharded over the available devices (data_parallel bounds the device
    count; default all)."""
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
    B = len(datas)
    n_dp = dp_degree(B, data_parallel)
    stacked = (
        [np.stack([np.asarray(b[c]) for b in datas]) for c in range(C)],
        [np.stack([np.asarray(b[c]) for b in quants]) for c in range(C)],
    )
    stacked = _pad_batch(stacked, B, n_dp)
    if use_pallas:
        # the manual-DMA Pallas kernels do not vmap under this Mosaic
        # version, but they run fine under lax.map: one dispatch per
        # device, each image solved at full fused-kernel speed (~3x the
        # vmapped XLA path per image)
        def body(ds, qs):
            return jax.lax.map(lambda t: solver(t[0], t[1]), (ds, qs))
    else:
        body = jax.vmap(solver, in_axes=([0] * C, [0] * C))
    batched = _dp_wrap(body, n_dp)
    fdata, metrics = batched(*jax.tree.map(jnp.asarray, stacked))
    return BatchResult(np.asarray(fdata)[:B], np.asarray(metrics)[:B])


def decode_files_batched(
    infiles: Sequence[str],
    cfg: SolverConfig,
    bits: int = 8,
    io_threads: int = 8,
    logger=None,
    errors: Optional[List[str]] = None,
    data_parallel: Optional[int] = None,
) -> Dict[str, "np.ndarray"]:
    """Read, bucket, batch-solve and color-convert many files.

    Returns {infile: pixels}.  Joint mode only (separate-components
    batching would triple the bucket count for little gain).

    Error isolation: when `errors` is a list, a file that fails to read
    (or a bucket that fails to solve) drops out with a message appended
    to it and the remaining files still decode — the improvement over
    the reference's die()-and-exit (utils.c:11-40).  With errors=None
    the first failure raises (library behavior).
    """
    from jpeg2png_tpu.ops.color import gray_packed, ycbcr_to_rgb_packed

    from jpeg2png_tpu.kernels import iter_step
    from jpeg2png_tpu.models.solver import ChannelGeometry, canvas_shape

    # multi-controller runs: partition the file list round-robin so
    # each process solves (and writes) only its own shard — the pod-
    # scale form of the reference's parallel-over-files loop
    # (jpeg2png.c:330-337); without this every controller would
    # redundantly solve everything
    if jax.process_count() > 1:
        pid, np_ = jax.process_index(), jax.process_count()
        infiles = [f for i, f in enumerate(infiles) if i % np_ == pid]

    def read_one(f):
        if errors is None:
            return read_jpeg(f)
        try:
            return read_jpeg(f)
        except (ValueError, OSError) as e:
            errors.append(f"{f}: {e}")
            return None

    with concurrent.futures.ThreadPoolExecutor(io_threads) as pool:
        images = list(pool.map(read_one, infiles))

    # mixed-size dynamic-extent bucketing on TPU: images sharing a
    # padded bucket shape + subsampling solve through ONE compiled
    # kernel regardless of their exact sizes (SURVEY.md §7 #6); exact-
    # geometry bucketing is the fallback for other backends/geometries
    buckets: Dict[Tuple, List[int]] = defaultdict(list)
    for i, img in enumerate(images):
        if img is None:
            continue
        samps = tuple((p.h_samp, p.w_samp) for p in img.planes)
        if jax.default_backend() == "tpu":
            # gate on the image's TRUE canvas (supports() checks the
            # padding-waste cap against it — evaluating it on the
            # already-padded bucket shape would make the cap vacuous)
            geoms = tuple(
                ChannelGeometry(p.nby, p.nbx, p.h_samp, p.w_samp)
                for p in img.planes)
            H, W = canvas_shape(geoms)
            if (iter_step.supports(img.nchannel, H, W, list(samps),
                                   True)
                    or iter_step.supports_lite(
                        img.nchannel, H, W, list(samps), True)):
                # 2.4-3.7 MP buckets ride the mega-lite kernel
                # (solve_bucket picks lite from the bucket shape)
                hb, wb = bucket_shape_for(img)
                buckets[("dyn", hb, wb, samps)].append(i)
                continue
        buckets[("exact",) + geometry_key(img)].append(i)

    out: Dict[str, np.ndarray] = {}
    for key, members in buckets.items():
        imgs = [images[i] for i in members]
        C = imgs[0].nchannel
        samps = [(p.h_samp, p.w_samp) for p in imgs[0].planes]
        try:
            if key[0] == "dyn":
                res = solve_bucket(
                    imgs, (key[1], key[2]),
                    cfg.weights[0], list(cfg.pweights[:C]),
                    cfg.iterations[0], cfg.simd_compat_logging,
                    data_parallel=data_parallel,
                )
            else:
                datas = [[p.data for p in im.planes] for im in imgs]
                quants = [[p.quant for p in im.planes] for im in imgs]
                res = solve_batched(
                    datas, quants, samps,
                    cfg.weights[0], list(cfg.pweights[:C]),
                    cfg.iterations[0], cfg.simd_compat_logging,
                    data_parallel=data_parallel,
                )
        except (ValueError, OSError) as e:
            if errors is None:
                raise
            for i in members:
                errors.append(f"{infiles[i]}: {e}")
            continue
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


# ---------------------------------------------------------------------------
# Mixed-size bucketed solving (dynamic-extent mode): ONE compiled kernel
# per bucket shape serves every image padded into it — the answer to the
# recompilation-storm hard part (SURVEY.md §7 #6) for realistic batches
# of assorted JPEG sizes.
# ---------------------------------------------------------------------------


from jpeg2png_tpu.kernels.project_step import FREE_Q as _FREE_Q_F
_FREE_Q = np.float32(_FREE_Q_F)


def _np_initial_canvas(planes, H, W, HB, WB):
    """Host-side plain decode -> nearest-upsample -> zero-pad to bucket.

    Mirrors decode_coefficients + aux_init (jpeg.c:83-92,
    compute.c:296-302) in numpy so the bucket solve needs no per-shape
    compiled init. Returns [C, HB, WB] float32."""
    from jpeg2png_tpu.ops.dct import dct_matrix_f64

    d = dct_matrix_f64()
    out = np.zeros((len(planes), HB, WB), np.float32)
    for c, p in enumerate(planes):
        x = p.data.astype(np.float64) * p.quant.astype(np.float64)
        # IDCT per block: D^T @ x @ D
        y = np.einsum("ji,abjk->abik", d, x)
        y = np.einsum("abik,kj->abij", y, d)
        nby, nbx = y.shape[:2]
        raster = np.moveaxis(y, 2, 1).reshape(nby * 8, nbx * 8)
        ry, rx = raster.shape
        sy, sx = p.h_samp, p.w_samp
        up = np.repeat(np.repeat(raster, sy, 0), sx, 1)
        # edge-clamped extension to the true canvas (compute.c:298-299)
        up = np.pad(up, ((0, max(0, H - up.shape[0])),
                         (0, max(0, W - up.shape[1]))), mode="edge")
        out[c, :H, :W] = up[:H, :W]
    return out


def _np_bucket_consts(planes, H, W, HB, WB):
    """Per-channel (data int16 raster, quant f32 raster) at bucket-coef
    shape: real quant over the channel's region, the FREE sentinel over
    the region->canvas gap (unconstrained boxes, prob underflows to 0),
    zero over the bucket padding (frozen lo == hi == 0 boxes)."""
    datas, q_rs = [], []
    for p in planes:
        sy, sx = p.h_samp, p.w_samp
        hcb, wcb = HB // sy, WB // sx
        hct, wct = H // sy, W // sx
        nby, nbx = p.data.shape[:2]
        dat = np.zeros((hcb, wcb), np.int16)
        dat[:nby * 8, :nbx * 8] = np.moveaxis(
            p.data, 2, 1).reshape(nby * 8, nbx * 8)
        q = np.zeros((hcb, wcb), np.float32)
        q[:hct, :wct] = _FREE_Q
        q[:nby * 8, :nbx * 8] = np.tile(
            p.quant.astype(np.float32), (nby, nbx))
        datas.append(dat)
        q_rs.append(q)
    return datas, q_rs


def bucket_shape_for(img: JpegImage) -> Tuple[int, int]:
    """The dynamic-extent bucket an image naturally pads into."""
    from jpeg2png_tpu.kernels.iter_step import _pad_shape
    from jpeg2png_tpu.models.solver import ChannelGeometry, canvas_shape

    geoms = tuple(ChannelGeometry(p.nby, p.nbx, p.h_samp, p.w_samp)
                  for p in img.planes)
    H, W = canvas_shape(geoms)
    samps = [(p.h_samp, p.w_samp) for p in img.planes]
    return _pad_shape(H, W, samps)


import functools


@functools.lru_cache(maxsize=64)
def _bucket_solver(bucket, samps, pa_ss, weight, iterations, n_dp=1,
                   lite=False):
    """Jitted dynamic-extent bucket solver, cached per configuration
    (one compilation serves every image and batch size B of the
    bucket... B still shapes the trace; lax.map keys on B).  n_dp > 1
    shards the batch over that many devices (shard_map, no
    collectives)."""
    import jax
    import jax.numpy as jnp

    from jpeg2png_tpu.kernels import iter_step
    from jpeg2png_tpu.models.solver import _fista_factors_np

    HB, WB = bucket
    C = len(samps)
    factors_np, _ = _fista_factors_np(int(iterations))

    def one(t):
        f0, dat, q, ext, step = t
        fs = [f0[c] for c in range(C)]
        dq0 = [jnp.zeros((HB // sy, WB // sx), jnp.float32)
               for c, (sy, sx) in enumerate(samps) if pa_ss[c] != 0.0]
        fnews, _, _, partials = iter_step.fused_solve(
            fs, fs, dq0, jnp.asarray(factors_np), step[0],
            [dat[c] for c in range(C)], [q[c] for c in range(C)],
            pa_ss, list(samps), weight, extents=ext, lite=lite)
        return jnp.stack(fnews), partials

    return _dp_wrap(lambda t: jax.lax.map(one, t), n_dp)


def solve_bucket(
    images: Sequence[JpegImage],
    bucket: Tuple[int, int],
    weight: float,
    pweights: Sequence[float],
    iterations: int,
    simd_compat_logging: bool = True,
    data_parallel: Optional[int] = None,
) -> BatchResult:
    """Solve mixed-size same-subsampling images through ONE compiled
    dynamic-extent kernel (kernels/iter_step.py).

    Every image is host-padded to the `bucket` canvas; its true extents
    ride in as runtime scalars, so adding a new image size to the
    bucket never recompiles.  Returned fdata is [B, C, HB, WB] (crop
    with each image's height/width).
    """
    import jax
    import jax.numpy as jnp

    from jpeg2png_tpu.models.solver import (
        ChannelGeometry, canvas_shape, mega_metrics, objective_alphas)

    HB, WB = bucket
    samps = [(p.h_samp, p.w_samp) for p in images[0].planes]
    C = len(samps)
    pa, total_alpha = objective_alphas(float(weight), pweights, C)
    pa_ss = tuple(pa[c] * sy * sx for c, (sy, sx) in enumerate(samps))

    f0s, dats, qs, exts, radii = [], [], [], [], []
    for img in images:
        geoms = tuple(ChannelGeometry(p.nby, p.nbx, p.h_samp, p.w_samp)
                      for p in img.planes)
        H, W = canvas_shape(geoms)
        assert H <= HB and W <= WB, (H, W, bucket)
        f0s.append(_np_initial_canvas(img.planes, H, W, HB, WB))
        d, q = _np_bucket_consts(img.planes, H, W, HB, WB)
        dats.append(d)
        qs.append(q)
        exts.append((H, W))
        radii.append(math.sqrt(float(H) * float(W)) / 2.0)

    # the step size radius/sqrt(1+iters) depends on each image's TRUE
    # canvas (compute.c:425); in dynamic-extent mode it rides in as a
    # runtime scalar alongside the extents, so mixed canvases share the
    # one compiled kernel
    steps = [r / math.sqrt(1.0 + iterations) for r in radii]
    B = len(images)
    n_dp = dp_degree(B, data_parallel)

    # lite-ness is a property of the BUCKET shape: past the f32 VMEM
    # gate, the bucket solves through the mega-lite kernel — and past
    # the lite gate too there is no whole-solve kernel for this bucket;
    # refuse loudly rather than blow the Mosaic VMEM cap at compile time
    # (decode_files_batched pre-filters, but solve_bucket is public API)
    from jpeg2png_tpu.kernels import iter_step as _is
    lite = not _is.supports(C, HB, WB, samps, True)
    if lite and not _is.supports_lite(C, HB, WB, samps, True):
        raise ValueError(
            f"bucket canvas {HB}x{WB} (C={C}) exceeds the whole-solve "
            "VMEM gates (f32 and lite); solve these images individually "
            "via solve_joint / solve_striped instead")

    mapped = _bucket_solver(
        (HB, WB), tuple(samps), pa_ss, float(weight), int(iterations),
        n_dp, lite)
    stacked = (
        np.stack(f0s),
        [np.stack([d[c] for d in dats]) for c in range(C)],
        [np.stack([q[c] for q in qs]) for c in range(C)],
        np.array(exts, np.int32),
        np.array(steps, np.float32)[:, None],
    )
    stacked = jax.tree.map(jnp.asarray, _pad_batch(stacked, B, n_dp))
    fd, partials = mapped(stacked)
    fdata_out = np.asarray(fd)[:B]
    partials = np.asarray(partials)[:B]
    metrics_out = np.zeros((B, iterations, 4), np.float32)
    for i in range(B):
        # same metrics assembly as the solver's fused path (fresh
        # start: prob row 0 is exactly 0, compute.c:279-286)
        metrics_out[i], _ = mega_metrics(
            partials[i], 0.0, pa, total_alpha, simd_compat_logging,
            xp=np)
    return BatchResult(fdata_out, metrics_out)
