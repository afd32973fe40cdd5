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
from functools import lru_cache as _functools_lru_cache
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
    fdata: Optional[np.ndarray]   # [B, C, H, W]; None with finish=
    metrics: np.ndarray           # [B, iterations, 4]


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


@_functools_lru_cache(maxsize=64)
def _batched_solver(geoms, weight, pweights, iterations,
                    simd_compat_logging, use_pallas, n_dp, C):
    """Jitted same-geometry batched solver, cached per configuration —
    rebuilding the jit wrapper per call would re-trace AND re-compile
    the whole batched solve on every warm serving pass (the
    recompilation-storm gate test_batched_warm_pass_compiles_nothing
    caught exactly that)."""
    solver = _build_solver(
        geoms, weight, pweights, iterations, simd_compat_logging,
        "float32", use_pallas)
    if use_pallas:
        # the manual-DMA Pallas kernels do not vmap under this Mosaic
        # version, but they run fine under lax.map: one dispatch per
        # device, each image solved at full fused-kernel speed (~3x the
        # vmapped XLA path per image)
        def body(ds, qs):
            return jax.lax.map(lambda t: solver(t[0], t[1]), (ds, qs))
    else:
        body = jax.vmap(solver, in_axes=([0] * C, [0] * C))
    return _dp_wrap(body, n_dp)


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
    C = len(samps)
    B = len(datas)
    n_dp = dp_degree(B, data_parallel)
    batched = _batched_solver(
        geoms, float(weight), tuple(float(p) for p in pweights),
        int(iterations), bool(simd_compat_logging), bool(use_pallas),
        n_dp, C)
    stacked = (
        [np.stack([np.asarray(b[c]) for b in datas]) for c in range(C)],
        [np.stack([np.asarray(b[c]) for b in quants]) for c in range(C)],
    )
    stacked = _pad_batch(stacked, B, n_dp)
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
    progress=None,
    stats: Optional[dict] = None,
    on_pixels=None,
) -> Dict[str, "np.ndarray"]:
    """Read, bucket, batch-solve and color-convert many files.

    Returns {infile: pixels}.  Joint mode only (separate-components
    batching would triple the bucket count for little gain).

    Error isolation: when `errors` is a list, a file that fails to read
    (or a bucket that fails to solve) drops out with a message appended
    to it and the remaining files still decode — the improvement over
    the reference's die()-and-exit (utils.c:11-40).  With errors=None
    the first failure raises (library behavior).

    With `progress`/`logger`, dynamic-extent buckets run chunked so the
    bar ticks and CSV rows stream DURING the solve (solve_bucket's
    on_chunk); exact-geometry buckets tick/log when the bucket returns.
    The bar's total should be len(infiles) * iterations.

    `on_pixels(infile, pixels)`, when given, receives each image's
    final pixels AS THEY ARRIVE from the device (from the fetch
    threads, possibly while other buckets are still solving) and the
    returned dict is then empty — the streaming-consumer mode the CLI
    uses to overlap PNG encoding with the remaining solves.

    `stats`, when given, also receives a stage breakdown of where the
    wall time went: read_s (threaded entropy decode), solve_s (the
    pipelined upload/solve/fetch region), upload_mb (int16 coefs +
    quant tables; the initial decode itself runs on device), fetch_mb
    (final packed pixels).
    """
    import threading
    import time as _time

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

    t_read0 = _time.time()
    with concurrent.futures.ThreadPoolExecutor(io_threads) as pool:
        images = list(pool.map(read_one, infiles))
    read_s = _time.time() - t_read0

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
                hb, wb = quantized_bucket_for(img)
                buckets[("dyn", hb, wb, samps)].append(i)
                continue
            # past the whole-solve gates: two-lite dynamic-extent
            # buckets, so assorted big photos (4 MP and up) still share
            # compilations instead of recompiling per distinct size
            b2 = two_lite_bucket_for(img, cfg.pweights[:img.nchannel])
            if b2 is not None:
                buckets[("dyn2", b2[0], b2[1], samps)].append(i)
                continue
        buckets[("exact",) + geometry_key(img)].append(i)

    if stats is not None:
        # observability for benchmarks/tests: how well the corpus
        # collapsed into shared compilations
        stats["n_buckets"] = len(buckets)
        stats["n_dyn_buckets"] = sum(
            1 for k in buckets if k[0] in ("dyn", "dyn2"))
        stats["bucket_classes"] = {
            cls: sum(1 for k in buckets if k[0] == cls)
            for cls in ("dyn", "dyn2", "exact")}
        stats["bucket_sizes"] = sorted(
            (len(v) for v in buckets.values()), reverse=True)
        stats["read_s"] = round(read_s, 3)
        # host->device bytes the bucketed solves will upload (int16
        # coef rasters at bucket coef shape + f32 quant tables); the
        # initial decode and quant rasters are built on device
        up = 0
        for key, mem in buckets.items():
            if key[0] not in ("dyn", "dyn2"):
                continue
            hb, wb, samps_k = key[1], key[2], key[3]
            per_img = sum(2 * (hb // sy) * (wb // sx) + 256
                          for sy, sx in samps_k)
            up += per_img * len(mem)
        stats["upload_mb"] = round(up / 1e6, 1)

    out: Dict[str, np.ndarray] = {}
    out_lock = threading.Lock()
    fetch_mb = [0.0]
    fetch_thread_s = [0.0]
    _upload_init_s[0] = 0.0
    t_solve0 = _time.time()

    # The wire is phased: the solve loop only UPLOADS and dispatches
    # (collecting each image's packed pixels as a device array), and
    # every pixel fetch happens after the last dispatch.  Running the
    # two directions concurrently collapses the remote tunnel to
    # ~16 MB/s down (measured: 348 MB of pixels took ~35 thread-
    # seconds against uploads vs ~23 MB/s/stream clean); phase
    # separation lets uploads ride at ~125 MB/s and the pooled fetch
    # at ~35 MB/s.  Pixels wait on device as dense flat uint32
    # (_pack_pixels): tiled [h, w, 3] uint8 fetches ~30% slower and
    # pads heavily in device memory.
    pending_pixels: List[Tuple[str, object, tuple, object]] = []

    with concurrent.futures.ThreadPoolExecutor(4) as fetch_pool:
        fetch_jobs = []

        def fetch_one(infile, packed_dev, shape, dtype):
            t0 = _time.time()
            u32 = np.asarray(packed_dev)
            dt = _time.time() - t0
            pix = _unpack_pixels(u32, shape, dtype)
            if on_pixels is not None:
                with out_lock:
                    fetch_mb[0] += u32.nbytes / 1e6
                    fetch_thread_s[0] += dt
                on_pixels(infile, pix)
            else:
                with out_lock:
                    fetch_mb[0] += u32.nbytes / 1e6
                    fetch_thread_s[0] += dt
                    out[infile] = pix

        for key, members in buckets.items():
            imgs = [images[i] for i in members]
            C = imgs[0].nchannel
            samps = [(p.h_samp, p.w_samp) for p in imgs[0].planes]
            ch_id = 3 if C > 1 else 0
            streamed = False
            try:
                if key[0] in ("dyn", "dyn2"):
                    on_chunk = None
                    if logger is not None or progress is not None:
                        streamed = True

                        def on_chunk(mbs, done, metrics_chunk):
                            n = metrics_chunk.shape[1]
                            for bi, m in enumerate(mbs):
                                if logger is not None:
                                    logger.log_metrics(
                                        infiles[members[m]], ch_id,
                                        metrics_chunk[bi],
                                        start_iteration=done - n)
                            if progress is not None:
                                progress.increment(len(mbs) * n)
                    solver_fn = (solve_bucket if key[0] == "dyn"
                                 else solve_bucket_two)

                    def finish(mbs, f_dev):
                        # crop + color-convert ON DEVICE and park the
                        # packed pixels there (compact uint32, 3 B/px
                        # of payload vs the ~12 B/px padded f32
                        # canvases — the round-4 warm-serving floor);
                        # the fetch itself is deferred past the last
                        # dispatch (wire phasing, see above)
                        for bi, m in enumerate(mbs):
                            im = imgs[m]
                            h, w = im.height, im.width
                            fd = f_dev[bi]
                            if C == 1:
                                pix = gray_packed(
                                    fd[0, :h, :w] + 128.0, bits)
                            else:
                                pix = ycbcr_to_rgb_packed(
                                    fd[0, :h, :w] + 128.0,
                                    fd[1, :h, :w], fd[2, :h, :w], bits)
                            pending_pixels.append(
                                (infiles[members[m]], _pack_pixels(pix),
                                 pix.shape, pix.dtype))

                    res = solver_fn(
                        imgs, (key[1], key[2]),
                        cfg.weights[0], list(cfg.pweights[:C]),
                        cfg.iterations[0], cfg.simd_compat_logging,
                        data_parallel=data_parallel, on_chunk=on_chunk,
                        finish=finish,
                    )
                else:
                    datas = [[p.data for p in im.planes] for im in imgs]
                    quants = [[p.quant for p in im.planes]
                              for im in imgs]
                    res = solve_batched(
                        datas, quants, samps,
                        cfg.weights[0], list(cfg.pweights[:C]),
                        cfg.iterations[0], cfg.simd_compat_logging,
                        data_parallel=data_parallel,
                    )
                    if progress is not None:
                        progress.increment(
                            len(members) * cfg.iterations[0])
            except (ValueError, OSError) as e:
                if errors is None:
                    raise
                for i in members:
                    errors.append(f"{infiles[i]}: {e}")
                continue
            for bi, i in enumerate(members):
                im = images[i]
                if logger is not None and not streamed:
                    logger.log_metrics(
                        infiles[i], 3 if im.nchannel > 1 else 0,
                        res.metrics[bi])
                if res.fdata is None:
                    continue   # pixels already parked by finish()
                h, w = im.height, im.width
                fd = res.fdata[bi]
                if C == 1:
                    pix_dev = gray_packed(
                        jnp.asarray(fd[0, :h, :w] + 128.0), bits)
                else:
                    pix_dev = ycbcr_to_rgb_packed(
                        jnp.asarray(fd[0, :h, :w] + 128.0),
                        jnp.asarray(fd[1, :h, :w]),
                        jnp.asarray(fd[2, :h, :w]), bits)
                pending_pixels.append(
                    (infiles[i], _pack_pixels(pix_dev),
                     pix_dev.shape, pix_dev.dtype))
        # wire phase 2: every upload/dispatch is in; drain the packed
        # pixels through the pooled device->host fetch
        for infile, packed, shape, dtype in pending_pixels:
            fetch_jobs.append(fetch_pool.submit(
                fetch_one, infile, packed, shape, dtype))
        for job in fetch_jobs:
            job.result()   # surface fetch-thread exceptions
    if stats is not None:
        stats["solve_s"] = round(_time.time() - t_solve0, 3)
        stats["fetch_mb"] = round(fetch_mb[0], 1)
        # cumulative seconds inside np.asarray across the 4 fetch
        # threads (divide by ~4 for the wall share) and main-thread
        # upload-initiation seconds — the two link-side costs
        stats["fetch_thread_s"] = round(fetch_thread_s[0], 3)
        stats["upload_init_s"] = round(_upload_init_s[0], 3)
    return out


# ---------------------------------------------------------------------------
# Mixed-size bucketed solving (dynamic-extent mode): ONE compiled kernel
# per bucket shape serves every image padded into it — the answer to the
# recompilation-storm hard part (SURVEY.md §7 #6) for realistic batches
# of assorted JPEG sizes.
# ---------------------------------------------------------------------------


from jpeg2png_tpu.kernels.project_step import FREE_Q as _FREE_Q_F
_FREE_Q = np.float32(_FREE_Q_F)


def _stage_image_host(planes, HB, WB):
    """Host staging for the bucketed serving path: ONLY the int16
    coefficient rasters (zero-padded to the bucket coef shape) plus the
    8x8 quant tables and the coef-region extents.

    Everything else — the initial decode, the FREE/FROZEN quant
    rasters — is built ON DEVICE by _bucket_init.  At 4:2:0 this is
    ~3 B per bucket pixel over the host->device link, vs the ~21 B/px
    (f32 canvases + f32 quant rasters) the earlier NumPy-decode staging
    shipped — the round-4 serving wall (VERDICT round-4 item 1)."""
    dats, quants, regions = [], [], []
    for p in planes:
        sy, sx = p.h_samp, p.w_samp
        hcb, wcb = HB // sy, WB // sx
        nby, nbx = p.data.shape[:2]
        dat = np.zeros((hcb, wcb), np.int16)
        dat[:nby * 8, :nbx * 8] = np.moveaxis(
            p.data, 2, 1).reshape(nby * 8, nbx * 8)
        dats.append(dat)
        quants.append(p.quant.astype(np.float32))
        regions.append((nby * 8, nbx * 8))
    return dats, quants, np.asarray(regions, np.int32)


@_functools_lru_cache(maxsize=64)
def _bucket_init(bucket, samps, n_img, n_dp):
    """Jitted on-device bucket init: initial decode + quant rasters.

    Per image (lax.map over the stacked chunk) and per channel:
      * dequantize + IDCT the int16 coef raster in f32 (the same
        block-diagonal MXU matmuls as initial_decode; jpeg.c:83-92),
      * nearest-upsample with edge clamping to the TRUE canvas extents
        and zero beyond (aux_init's cy = MIN(y/h_samp, h-1) rule,
        compute.c:296-302) — extents are traced scalars, so one
        compilation serves every image in the bucket,
      * build the FREE/FROZEN quant raster (real quant over the coef
        region, FREE sentinel over the region->canvas gap, 0 over the
        bucket padding) from the 8x8 table + region/canvas extents.

    Returns (f0 [B, C, HB, WB] f32, q rasters per channel)."""
    from jpeg2png_tpu.ops.dct_raster import idct_raster

    HB, WB = bucket
    C = len(samps)

    def one(t):
        dats, qts, regions, ext = t
        f0s, q_rs = [], []
        for c, (sy, sx) in enumerate(samps):
            hcb, wcb = HB // sy, WB // sx
            qt = jnp.tile(qts[c], (hcb // 8, wcb // 8))
            rr = jax.lax.broadcasted_iota(jnp.int32, (hcb, wcb), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (hcb, wcb), 1)
            in_data = (rr < regions[c, 0]) & (cc < regions[c, 1])
            in_canvas = (rr < ext[0] // sy) & (cc < ext[1] // sx)
            q_rs.append(jnp.where(
                in_data, qt,
                jnp.where(in_canvas, _FREE_Q, jnp.float32(0.0))))
            # dequantize over the whole bucket raster: the padding
            # coefficients are zero, so dat * tiled-quant is exact
            raster = idct_raster(dats[c].astype(jnp.float32) * qt)
            ridx = jnp.minimum(jnp.arange(HB) // sy, regions[c, 0] - 1)
            cidx = jnp.minimum(jnp.arange(WB) // sx, regions[c, 1] - 1)
            up = jnp.take(jnp.take(raster, ridx, axis=0),
                          cidx, axis=1)
            mask = ((jnp.arange(HB)[:, None] < ext[0])
                    & (jnp.arange(WB)[None, :] < ext[1]))
            f0s.append(jnp.where(mask, up, jnp.float32(0.0)))
        return jnp.stack(f0s), tuple(q_rs)

    def body(t):
        return jax.lax.map(one, t)

    if n_dp <= 1:
        return jax.jit(body)

    from jax.sharding import PartitionSpec as P

    from jpeg2png_tpu.parallel.mesh import batch_mesh

    mesh = batch_mesh(n_dp, devices=jax.local_devices()[:n_dp])
    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P("batch"), out_specs=P("batch"),
        check_vma=False))


def _pack_pixels(pix):
    """Packed uint8/uint16 pixels -> flat dense uint32 device array.

    Two reasons, both measured through the remote tunnel: a tiled
    [h, w, 3] uint8 array fetches ~30% slower than the same bytes as a
    dense wide uint32 vector, and its minor-dim-3 device layout pads
    heavily while parked waiting for the phased fetch.  Unpack with
    _unpack_pixels (both ends little-endian)."""
    per = 4 if pix.dtype == jnp.uint8 else 2
    flat = pix.reshape(-1)
    pad = (-flat.shape[0]) % per
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return jax.lax.bitcast_convert_type(
        flat.reshape(-1, per), jnp.uint32)


def _unpack_pixels(u32_np, shape, dtype):
    """Host-side inverse of _pack_pixels."""
    n = int(np.prod(shape))
    return u32_np.view(np.dtype(dtype))[:n].reshape(shape)


# observability: main-thread seconds spent initiating chunk uploads
# (host staging copies; the wire transfer itself is async).  Reset and
# read by decode_files_batched around its bucket loop — module-level so
# solve_bucket/solve_bucket_two need no stats plumbing in their API.
_upload_init_s = [0.0]


def _upload_chunk(staged, sel, exts, steps, C):
    """Stack + upload one dispatch chunk's staged host arrays (int16
    coef rasters, 8x8 quant tables, region/canvas extents, step
    sizes).  jnp.asarray initiates the transfers asynchronously — the
    device can still be solving the previous chunk."""
    import time as _time

    t0 = _time.time()
    dat = [jnp.asarray(np.stack([staged[m][0][c] for m in sel]))
           for c in range(C)]
    qt = [jnp.asarray(np.stack([staged[m][1][c] for m in sel]))
          for c in range(C)]
    regions = jnp.asarray(np.stack([staged[m][2] for m in sel]))
    ext = jnp.asarray(np.asarray([exts[m] for m in sel], np.int32))
    step = jnp.asarray(np.asarray([steps[m] for m in sel],
                                  np.float32)[:, None])
    _upload_init_s[0] += _time.time() - t0
    return dat, qt, regions, ext, step


def bucket_shape_for(img: JpegImage) -> Tuple[int, int]:
    """The dynamic-extent bucket an image naturally pads into."""
    from jpeg2png_tpu.kernels.iter_step import _pad_shape
    from jpeg2png_tpu.models.solver import ChannelGeometry, canvas_shape

    geoms = tuple(ChannelGeometry(p.nby, p.nbx, p.h_samp, p.w_samp)
                  for p in img.planes)
    H, W = canvas_shape(geoms)
    samps = [(p.h_samp, p.w_samp) for p in img.planes]
    return _pad_shape(H, W, samps)


# geometric size ladder for bucket coarsening (~1.2-1.5x steps): the
# padding waste a rung can add stays modest while assorted photo sizes
# collapse onto a handful of rungs
_BUCKET_LADDER = (128, 192, 256, 384, 512, 640, 768, 1024, 1280, 1536,
                  2048, 2560, 3072, 4096)


def quantized_bucket_for(img: JpegImage) -> Tuple[int, int]:
    """A COARSENED dynamic-extent bucket: the true canvas is rounded up
    a geometric size ladder before padding, so a realistic corpus of
    assorted JPEG sizes lands in a few shared bucket shapes (= a few
    compilations) instead of one per distinct size — the
    recompilation-storm guard at serving scale (SURVEY.md §7 #6).

    Falls back to the natural (minimal) bucket when coarsening would
    waste > 1.8x the natural bucket's area or push the bucket past the
    whole-solve VMEM gates (solve_bucket would refuse it)."""
    from jpeg2png_tpu.kernels import iter_step
    from jpeg2png_tpu.models.solver import ChannelGeometry, canvas_shape

    geoms = tuple(ChannelGeometry(p.nby, p.nbx, p.h_samp, p.w_samp)
                  for p in img.planes)
    H, W = canvas_shape(geoms)
    samps = [(p.h_samp, p.w_samp) for p in img.planes]

    def up(v):
        for x in _BUCKET_LADDER:
            if x >= v:
                return x
        return v

    natural = iter_step._pad_shape(H, W, samps)
    coarse = iter_step._pad_shape(up(H), up(W), samps)
    C = len(samps)
    if (coarse[0] * coarse[1] <= 1.8 * natural[0] * natural[1]
            and (iter_step.supports(C, coarse[0], coarse[1], samps, True)
                 or iter_step.supports_lite(
                     C, coarse[0], coarse[1], samps, True))):
        return coarse
    return natural


import functools


@functools.lru_cache(maxsize=64)
def _bucket_solver(bucket, samps, pa_ss, weight, n_dp=1, lite=False):
    """Jitted resumable dynamic-extent bucket step, cached per bucket
    CONFIGURATION only: the iteration-chunk length and the batch size
    shape the trace through the inputs (factors [n], stacked [B, ...]),
    and solve_bucket dispatches in fixed-size chunks — so a bucket
    compiles at most two artifacts no matter how many images or
    progress chunks flow through it (the recompilation-storm guard,
    SURVEY.md §7 #6).  n_dp > 1 shards the batch over that many
    devices (shard_map, no collectives).

    The step takes and returns the full solver carry (f, fista, devq)
    per image; chunked execution is bit-identical to one-shot (the
    bf16 lite carries round-trip exactly through their f32 interface).
    """
    import jax

    from jax.sharding import PartitionSpec as P

    from jpeg2png_tpu.kernels import iter_step

    HB, WB = bucket
    C = len(samps)
    P_n = sum(1 for p in pa_ss if p != 0.0)

    def one(factors, t):
        f, fi, dqs, dat, q, ext, step = t
        fnews, finews, dqnews, partials = iter_step.fused_solve(
            [f[c] for c in range(C)], [fi[c] for c in range(C)],
            [dqs[pi] for pi in range(P_n)], factors, step[0],
            [dat[c] for c in range(C)], [q[c] for c in range(C)],
            pa_ss, list(samps), weight, extents=ext, lite=lite)
        # barrier: without it XLA fuses the pallas outputs with the
        # map body's dynamic-update-slices and stages every output
        # plane in scoped VMEM at once — >16 MB for multi-member
        # chunks of >= 0.4 MP buckets ("Ran out of memory in memory
        # space vmem ... on stack for closed_call")
        return jax.lax.optimization_barrier(
            (jnp.stack(fnews), jnp.stack(finews), tuple(dqnews),
             partials))

    def body(factors, t):
        return jax.lax.map(lambda u: one(factors, u), t)

    if n_dp <= 1:
        return jax.jit(body)

    from jpeg2png_tpu.parallel.mesh import batch_mesh

    mesh = batch_mesh(n_dp, devices=jax.local_devices()[:n_dp])
    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P("batch")),
        out_specs=P("batch"), check_vma=False))


@_functools_lru_cache(maxsize=32)
def _bucket_two_solver(bucket, samps, pa, total_alpha, weight,
                       simd_compat_logging, n_dp=1):
    """Jitted resumable dynamic-extent TWO-LITE bucket step, for images
    past the whole-solve VMEM gates (> ~3.7 MP): the per-iteration bf16
    pipeline — stripe_grad.fused_grad_striped_lite run on the whole
    bucket canvas as one zero-halo band + ONE multi-channel
    project_step.fused_project_multi_lite dispatch — under lax.scan,
    with each image's TRUE extents and step size as traced scalars
    (kernels/iter_step.py dynamic-mode analog).  A batch of assorted
    4-25 MP photos shares this one compiled artifact instead of
    recompiling per distinct size (SURVEY.md §7 #6 past the mega gate).
    """
    import jax

    from jax.sharding import PartitionSpec as P

    from jpeg2png_tpu.kernels import project_step
    from jpeg2png_tpu.kernels.stripe_grad import fused_grad_striped_lite

    H2, W2 = bucket
    C = len(samps)
    pa_sss = tuple(pa[c] * sy * sx for c, (sy, sx) in enumerate(samps))
    prob_cs = [c for c in range(C) if pa_sss[c] != 0.0]

    def one(factors, t):
        f, d, dqs, prob0, dat, q, ext, step = t

        def body(carry, factor):
            fdatas, dds, devqs, prob_dist = carry
            zf = [jnp.zeros((16, W2), jnp.float32)] * C
            zd = [jnp.zeros((16, W2), jnp.bfloat16)] * C
            grads, sumsq, tv, tv2 = fused_grad_striped_lite(
                list(fdatas), list(dds), list(devqs),
                (zf, zf, zd, zd), factor, jnp.int32(0),
                weight, list(samps), pa_sss,
                h_pad=H2, h_true=0, w_true=0, extents=ext)
            norms = jnp.sqrt(sumsq)
            scale = jnp.where(norms == 0.0, 0.0, step[0] / norms)
            fnews, dnews, devq_news, dists = (
                project_step.fused_project_multi_lite(
                    list(fdatas), list(dds), grads, factor, scale,
                    [dat[c] for c in range(C)],
                    [q[c] for c in range(C)], pa_sss, list(samps)))
            prob_next = jnp.float32(0.0)
            for c in range(C):
                dd = dists[c]
                if pa_sss[c] != 0.0 and not simd_compat_logging:
                    dd = pa[c] * dd
                prob_next = prob_next + dd
            objective = (tv + tv2 + prob_dist) / jnp.float32(total_alpha)
            metrics = jnp.stack([objective, prob_dist, tv, tv2])
            carry_out = (tuple(fnews), tuple(dnews),
                         tuple(dv for dv in devq_news if dv is not None),
                         prob_next)
            return carry_out, metrics

        carry0 = (tuple(f[c] for c in range(C)),
                  tuple(d[c] for c in range(C)),
                  tuple(dqs[pi] for pi in range(len(prob_cs))),
                  prob0)
        (fs, dds, dqo, probn), metrics = jax.lax.scan(
            body, carry0, factors)
        # barrier: keep XLA from staging the stacked outputs in scoped
        # VMEM inside the map body fusion (see _bucket_solver.one)
        return jax.lax.optimization_barrier(
            (jnp.stack(fs), jnp.stack(dds), tuple(dqo), probn,
             metrics))

    def step_fn(factors, t):
        return jax.lax.map(lambda u: one(factors, u), t)

    if n_dp <= 1:
        return jax.jit(step_fn)

    from jpeg2png_tpu.parallel.mesh import batch_mesh

    mesh = batch_mesh(n_dp, devices=jax.local_devices()[:n_dp])
    return jax.jit(jax.shard_map(
        step_fn, mesh=mesh, in_specs=(P(), P("batch")),
        out_specs=P("batch"), check_vma=False))


def two_lite_bucket_for(img: JpegImage, pweights) -> Optional[
        Tuple[int, int]]:
    """The two-lite dynamic-extent bucket serving an image past the
    whole-solve VMEM gates, or None when the lite kernels cannot.

    Tries the ladder-coarsened shape first (shared compilations across
    assorted big-photo sizes), falling back to the natural minimal
    bucket when coarsening wastes > 1.8x its area; mirrors
    solver._two_lite_geometry's gates (including the 2x padding-waste
    cap vs the true canvas)."""
    from jpeg2png_tpu.kernels import project_step, stripe_grad
    from jpeg2png_tpu.models.solver import ChannelGeometry, canvas_shape

    geoms = tuple(ChannelGeometry(p.nby, p.nbx, p.h_samp, p.w_samp)
                  for p in img.planes)
    H, W = canvas_shape(geoms)
    samps = [(p.h_samp, p.w_samp) for p in img.planes]
    C = len(samps)
    prob_mask = tuple(p != 0.0 for p in pweights[:C])
    wq = 128 * max(sx for _, sx in samps)

    def mk(Hc, Wc):
        W2 = -(-Wc // wq) * wq
        H2 = stripe_grad.padded_band_height(Hc, W2, C, samps, prob_mask)
        if (H2 and stripe_grad.supports_lite(C, H2, W2, samps,
                                             prob_mask)
                and project_step.supports_multi_lite(H2, W2, samps)):
            return (H2, W2)
        return None

    natural = mk(H, W)
    if natural is None or natural[0] * natural[1] > 2 * H * W:
        return None

    def up(v):
        for x in _BUCKET_LADDER:
            if x >= v:
                return x
        return v

    coarse = mk(up(H), up(W))
    if (coarse is not None
            and coarse[0] * coarse[1]
            <= 1.8 * natural[0] * natural[1]):
        return coarse
    return natural


def solve_bucket_two(
    images: Sequence[JpegImage],
    bucket: Tuple[int, int],
    weight: float,
    pweights: Sequence[float],
    iterations: int,
    simd_compat_logging: bool = True,
    data_parallel: Optional[int] = None,
    on_chunk=None,
    iter_chunk: Optional[int] = None,
    finish=None,
) -> BatchResult:
    """solve_bucket for the two-lite tier: mixed-size images PAST the
    whole-solve VMEM gates (4 MP and beyond) share one compiled
    dynamic-extent per-iteration pipeline.  Same contract as
    solve_bucket (including the device-side `finish` hook); dispatch
    is per-n_dp-image chunks (these canvases are large — batching them
    into one lax.map would multiply resident HBM state for no
    throughput gain, the map is sequential anyway).
    """
    from jpeg2png_tpu.models.solver import (
        ChannelGeometry, _fista_factors_np, canvas_shape,
        objective_alphas)

    H2, W2 = bucket
    samps = [(p.h_samp, p.w_samp) for p in images[0].planes]
    C = len(samps)
    pa, total_alpha = objective_alphas(float(weight), pweights, C)
    pa_ss = tuple(pa[c] * sy * sx for c, (sy, sx) in enumerate(samps))
    prob_cs = [c for c in range(C) if pa_ss[c] != 0.0]

    staged, exts, steps = [], [], []
    for img in images:
        geoms = tuple(ChannelGeometry(p.nby, p.nbx, p.h_samp, p.w_samp)
                      for p in img.planes)
        H, W = canvas_shape(geoms)
        assert H <= H2 and W <= W2, (H, W, bucket)
        staged.append(_stage_image_host(img.planes, H2, W2))
        exts.append((H, W))
        steps.append(math.sqrt(float(H) * float(W)) / 2.0
                     / math.sqrt(1.0 + iterations))

    B = len(images)
    n_dp = dp_degree(B, data_parallel)
    stepper = _bucket_two_solver(
        (H2, W2), tuple(samps), tuple(pa), float(total_alpha),
        float(weight), bool(simd_compat_logging), n_dp)
    factors_np, _ = _fista_factors_np(int(iterations))
    if iter_chunk is None:
        iter_chunk = iterations if on_chunk is None else (
            1 if iterations <= 16
            else max(8, min(50, iterations // 20 or iterations)))

    if iterations == 0:
        init0 = _bucket_init((H2, W2), tuple(samps), B, 1)
        f0_all, _ = init0(_upload_chunk(staged, list(range(B)),
                                        exts, steps, C)[:4])
        if finish is not None:
            finish(list(range(B)), f0_all)
            f0_all = None
        else:
            f0_all = np.asarray(f0_all)
        return BatchResult(f0_all, np.zeros((B, 0, 4), np.float32))

    fdata_out = (None if finish is not None
                 else np.zeros((B, C, H2, W2), np.float32))
    metrics_out = np.zeros((B, iterations, 4), np.float32)
    pending = None   # one-deep finalize queue (see solve_bucket)

    def finalize(p):
        members, f_dev, metric_devs = p
        done0 = 0
        for metrics in metric_devs:
            n = metrics.shape[1]
            metrics_out[members, done0:done0 + n] = (
                np.asarray(metrics)[:len(members)])
            done0 += n
        if finish is not None:
            finish(members, f_dev)
        else:
            fdata_out[members] = np.asarray(f_dev)[:len(members)]

    i = 0
    while i < B:
        members = list(range(i, min(i + n_dp, B)))
        sel = members + [members[0]] * (n_dp - len(members))
        dat, qt, regions, ext, step = _upload_chunk(
            staged, sel, exts, steps, C)
        init_fn = _bucket_init((H2, W2), tuple(samps), n_dp, n_dp)
        f, q_dev = init_fn((dat, qt, regions, ext))
        d = jnp.zeros((n_dp, C, H2, W2), jnp.bfloat16)
        dqs = tuple(
            jnp.zeros((n_dp, H2 // samps[c][0], W2 // samps[c][1]),
                      jnp.bfloat16)
            for c in prob_cs)
        prob0 = jnp.zeros((n_dp,), jnp.float32)
        consts = (dat, list(q_dev), ext, step)
        done = 0
        metric_devs = []
        while done < iterations:
            n = min(iter_chunk, iterations - done)
            f, d, dqs, prob0, metrics = stepper(
                jnp.asarray(factors_np[done:done + n]),
                (f, d, dqs, prob0) + consts)
            if on_chunk is None:
                metric_devs.append(metrics)
            else:
                metrics_out[members, done:done + n] = (
                    np.asarray(metrics)[:len(members)])
            done += n
            if on_chunk is not None:
                on_chunk(members,
                         done, metrics_out[members, done - n:done])
        if pending is not None:
            finalize(pending)
        pending = (members, f, metric_devs)
        i += n_dp
    finalize(pending)
    return BatchResult(fdata_out, metrics_out)


def solve_bucket(
    images: Sequence[JpegImage],
    bucket: Tuple[int, int],
    weight: float,
    pweights: Sequence[float],
    iterations: int,
    simd_compat_logging: bool = True,
    data_parallel: Optional[int] = None,
    on_chunk=None,
    iter_chunk: Optional[int] = None,
    finish=None,
) -> BatchResult:
    """Solve mixed-size same-subsampling images through ONE compiled
    dynamic-extent kernel (kernels/iter_step.py).

    Every image is host-padded to the `bucket` canvas; its true extents
    ride in as runtime scalars, so adding a new image size to the
    bucket never recompiles.  Returned fdata is [B, C, HB, WB] (crop
    with each image's height/width).

    Dispatch is chunked on BOTH axes:
      * images go through the compiled step in fixed-size chunks
        (8*n_dp, then n_dp for the remainder), so a bucket compiles at
        most two artifacts for ANY batch size;
      * with `on_chunk`, iterations run as resumable chunks
        (`iter_chunk` each; the single-file pipeline's 8-50 default) —
        bit-identical to one-shot — and
        `on_chunk(member_indices, done_iterations, metrics_chunk)`
        fires after each so progress bars tick and CSV rows stream
        DURING bucket solves, like the reference's in-loop hooks
        (compute.c:449-452, logger.c:20).

    `finish(member_indices, fdata_device)`, when given, receives each
    image chunk's solved canvases as a DEVICE array (padded members
    included at the tail) and BatchResult.fdata is None: the caller
    crops/color-converts on device and fetches compact pixels, instead
    of this function fetching the full padded f32 canvases through the
    (slow) host link — at serving scale the f32 fetch is the wall-time
    floor, ~12 B/px vs 3 B/px of final pixels.
    """
    import jax

    from jpeg2png_tpu.models.solver import (
        ChannelGeometry, _fista_factors_np, canvas_shape, mega_metrics,
        objective_alphas)

    HB, WB = bucket
    samps = [(p.h_samp, p.w_samp) for p in images[0].planes]
    C = len(samps)
    pa, total_alpha = objective_alphas(float(weight), pweights, C)
    pa_ss = tuple(pa[c] * sy * sx for c, (sy, sx) in enumerate(samps))
    prob_cs = [c for c in range(C) if pa_ss[c] != 0.0]

    staged, exts, steps = [], [], []
    for img in images:
        geoms = tuple(ChannelGeometry(p.nby, p.nbx, p.h_samp, p.w_samp)
                      for p in img.planes)
        H, W = canvas_shape(geoms)
        assert H <= HB and W <= WB, (H, W, bucket)
        staged.append(_stage_image_host(img.planes, HB, WB))
        exts.append((H, W))
        # the step size radius/sqrt(1+iters) depends on each image's
        # TRUE canvas (compute.c:425); it rides in as a runtime scalar
        # alongside the extents, so mixed canvases share the kernel
        steps.append(math.sqrt(float(H) * float(W)) / 2.0
                     / math.sqrt(1.0 + iterations))

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

    stepper = _bucket_solver(
        (HB, WB), tuple(samps), pa_ss, float(weight), n_dp, lite)
    factors_np, _ = _fista_factors_np(int(iterations))
    if iter_chunk is None:
        iter_chunk = iterations if on_chunk is None else (
            1 if iterations <= 16
            else max(8, min(50, iterations // 20 or iterations)))

    if iterations == 0:
        # degenerate but valid: the initial decode (like solve_joint)
        init0 = _bucket_init((HB, WB), tuple(samps), B, 1)
        f0_all, _ = init0(_upload_chunk(staged, list(range(B)),
                                        exts, steps, C)[:4])
        if finish is not None:
            finish(list(range(B)), f0_all)
            f0_all = None
        else:
            f0_all = np.asarray(f0_all)
        return BatchResult(f0_all, np.zeros((B, 0, 4), np.float32))

    fdata_out = (None if finish is not None
                 else np.zeros((B, C, HB, WB), np.float32))
    metrics_out = np.zeros((B, iterations, 4), np.float32)
    BC = 8 * n_dp

    # one-deep finalize queue: chunk k's results are fetched AFTER
    # chunk k+1's uploads and solve are dispatched, so the (slow)
    # device->host pixel/canvas transfers overlap the next chunk's
    # device work instead of serializing with it
    pending = None

    def finalize(p):
        members, f_dev, partial_devs = p
        prob_prev = np.zeros((len(members),), np.float32)
        done0 = 0
        for partials in partial_devs:
            partials_np = np.asarray(partials)[:len(members)]
            n = partials_np.shape[1]
            for bi, m in enumerate(members):
                # same metrics assembly as the solver's fused path
                # (fresh start: prob row 0 is exactly 0,
                # compute.c:279-286; chunk boundaries carry the
                # one-row prob shift through prob_prev)
                metrics_out[m, done0:done0 + n], prob_prev[bi] = (
                    mega_metrics(
                        partials_np[bi], prob_prev[bi], pa, total_alpha,
                        simd_compat_logging, xp=np))
            done0 += n
        if finish is not None:
            finish(members, f_dev)
        else:
            fdata_out[members] = np.asarray(f_dev)[:len(members)]

    i = 0
    while i < B:
        n_img = BC if B - i >= BC else n_dp
        members = list(range(i, min(i + n_img, B)))
        sel = members + [members[0]] * (n_img - len(members))
        dat, qt, regions, ext, step = _upload_chunk(
            staged, sel, exts, steps, C)
        init_fn = _bucket_init((HB, WB), tuple(samps), n_img, n_dp)
        f, q_dev = init_fn((dat, qt, regions, ext))
        fi = f
        dqs = tuple(
            jnp.zeros((n_img, HB // samps[c][0], WB // samps[c][1]),
                      jnp.float32)
            for c in prob_cs)
        consts = (dat, list(q_dev), ext, step)
        done = 0
        prob_prev = np.zeros((len(members),), np.float32)
        partial_devs = []
        while done < iterations:
            n = min(iter_chunk, iterations - done)
            f, fi, dqs, partials = stepper(
                jnp.asarray(factors_np[done:done + n]),
                (f, fi, dqs) + consts)
            if on_chunk is None:
                # deferred fetch: stash the device partials for
                # finalize (one dispatch per chunk, nothing blocks)
                partial_devs.append(partials)
            else:
                partials_np = np.asarray(partials)[:len(members)]
                for bi, m in enumerate(members):
                    metrics_out[m, done:done + n], prob_prev[bi] = (
                        mega_metrics(
                            partials_np[bi], prob_prev[bi], pa,
                            total_alpha, simd_compat_logging, xp=np))
            done += n
            if on_chunk is not None:
                on_chunk(members,
                         done, metrics_out[members, done - n:done])
        if pending is not None:
            finalize(pending)
        pending = (members, f, partial_devs)
        i += n_img
    finalize(pending)
    return BatchResult(fdata_out, metrics_out)
