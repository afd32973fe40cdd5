"""Batched runner: bucketing, vmapped solve parity, end-to-end batch."""

import numpy as np

from jpeg2png_tpu.io import read_jpeg
from jpeg2png_tpu.models.solver import solve_joint
from jpeg2png_tpu.pipeline import smooth_decode
from jpeg2png_tpu.runner import decode_files_batched, solve_batched
from jpeg2png_tpu.utils.config import SolverConfig


def test_batched_matches_individual():
    rng = np.random.default_rng(31)
    samps = [(1, 1), (2, 2), (2, 2)]
    B = 3
    datas, quants = [], []
    for _ in range(B):
        datas.append([
            rng.integers(-25, 25, (4, 4, 8, 8)).astype(np.int16),
            rng.integers(-12, 12, (2, 2, 8, 8)).astype(np.int16),
            rng.integers(-12, 12, (2, 2, 8, 8)).astype(np.int16),
        ])
        quants.append([rng.integers(1, 60, (8, 8)).astype(np.uint16)
                       for _ in range(3)])

    res = solve_batched(datas, quants, samps, 0.3, [0.001] * 3, 3)
    assert res.fdata.shape == (B, 3, 32, 32)
    for b in range(B):
        fd, m = solve_joint(datas[b], quants[b], samps, 0.3, [0.001] * 3, 3,
                            use_pallas=False)
        np.testing.assert_allclose(res.fdata[b], np.asarray(fd), atol=5e-3)
        np.testing.assert_allclose(res.metrics[b], np.asarray(m), rtol=3e-4)


def test_decode_files_batched_mixed_sizes(fixtures_dir):
    files = [str(fixtures_dir / n) for n in (
        "lineart64_q20_420.jpg",          # bucket A
        "lineart64_q20_420_prog.jpg",     # bucket A (same geometry)
        "photo80_q30_422.jpg",            # bucket B
        "gray64_q30.jpg",                 # bucket C (1 channel)
    )]
    cfg = SolverConfig(iterations=(3,) * 3)
    out = decode_files_batched(files, cfg)
    assert set(out) == set(files)
    assert out[files[0]].shape == (64, 64, 3)
    assert out[files[2]].shape == (80, 80, 3)
    assert out[files[3]].shape == (64, 64)

    # bucketed result == single-image pipeline result (up to f32
    # reduction-order drift amplified by the subgradient; pixel-level)
    single = smooth_decode(read_jpeg(files[0]), cfg)
    diff = np.abs(out[files[0]].astype(int) - single.pixels.astype(int))
    assert diff.max() <= 3
    assert (diff > 1).mean() < 0.01


def test_solve_bucket_matches_per_image(fixtures_dir, monkeypatch):
    """Mixed-size images through ONE dynamic-extent kernel == per-image
    solves (pre-chaos: state after 1 iteration, metrics rows 0-1)."""
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)

    from jpeg2png_tpu.io import read_jpeg
    from jpeg2png_tpu.models.solver import solve_joint
    from jpeg2png_tpu.runner import solve_bucket

    imgs = [read_jpeg(fixtures_dir / "lineart128_q10_420.jpg"),
            read_jpeg(fixtures_dir / "lineart64_q20_420.jpg")]
    bucket = (256, 256)

    res1 = solve_bucket(imgs, bucket, 0.3, [0.001] * 3, 1)
    res2 = solve_bucket(imgs, bucket, 0.3, [0.001] * 3, 2)

    for bi, img in enumerate(imgs):
        d = [p.data for p in img.planes]
        q = [p.quant for p in img.planes]
        s = [(p.h_samp, p.w_samp) for p in img.planes]
        fx, mx = solve_joint(d, q, s, 0.3, [0.001] * 3, 1,
                             use_pallas=False)
        fx = np.asarray(fx)
        H, W = fx.shape[1:]
        got = res1.fdata[bi][:, :H, :W]
        np.testing.assert_allclose(got, fx, atol=5e-3)
        # bucket padding stayed exactly zero
        assert np.all(res1.fdata[bi][:, H:, :] == 0.0)
        assert np.all(res1.fdata[bi][:, :, W:] == 0.0)

        _, mx2 = solve_joint(d, q, s, 0.3, [0.001] * 3, 2,
                             use_pallas=False)
        np.testing.assert_allclose(
            res2.metrics[bi][:2, 0], np.asarray(mx2)[:2, 0], rtol=1e-4)


def test_batched_error_isolation(fixtures_dir, tmp_path):
    """A corrupt member drops out with an error; the rest still solve
    (VERDICT round-1 item 7 — the reference's die() would abort all,
    utils.c:11-40)."""
    junk = tmp_path / "junk.jpg"
    junk.write_bytes(b"\xff\xd8\xff\xe0 this is not a real jpeg")
    files = [str(fixtures_dir / "lineart64_q20_420.jpg"),
             str(junk),
             str(fixtures_dir / "photo80_q30_422.jpg")]
    cfg = SolverConfig(iterations=(2,) * 3)
    errors = []
    out = decode_files_batched(files, cfg, errors=errors)
    assert set(out) == {files[0], files[2]}
    assert len(errors) == 1 and str(junk) in errors[0]


def test_batched_error_raises_without_list(tmp_path):
    """Library behavior unchanged: errors=None raises on a bad file."""
    import pytest

    junk = tmp_path / "junk.jpg"
    junk.write_bytes(b"not a jpeg at all")
    cfg = SolverConfig(iterations=(2,) * 3)
    with pytest.raises((ValueError, OSError)):
        decode_files_batched([str(junk), str(junk)], cfg)


def test_batched_data_parallel_matches_single_device():
    """A B=8 bucket sharded over 8 virtual devices == per-image solves
    (VERDICT round-1 item 2: N chips -> ~N x file throughput; the
    reference's OpenMP-over-files analog, jpeg2png.c:330-337)."""
    import jax

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 devices")
    rng = np.random.default_rng(11)
    samps = [(1, 1), (2, 2), (2, 2)]
    B = 8
    datas, quants = [], []
    for _ in range(B):
        datas.append([
            rng.integers(-25, 25, (4, 4, 8, 8)).astype(np.int16),
            rng.integers(-12, 12, (2, 2, 8, 8)).astype(np.int16),
            rng.integers(-12, 12, (2, 2, 8, 8)).astype(np.int16),
        ])
        quants.append([rng.integers(1, 60, (8, 8)).astype(np.uint16)
                       for _ in range(3)])

    from jpeg2png_tpu.runner import dp_degree
    assert dp_degree(B) == 8
    res = solve_batched(datas, quants, samps, 0.3, [0.001] * 3, 3,
                        data_parallel=8)
    res1 = solve_batched(datas, quants, samps, 0.3, [0.001] * 3, 3,
                         data_parallel=1)
    # sharded vmap reduces in a different order -> f32 drift only
    np.testing.assert_allclose(res.fdata, res1.fdata, atol=5e-3)
    np.testing.assert_allclose(res.metrics, res1.metrics,
                               rtol=1e-4, atol=0.5)

    # uneven batch: B=5 over 4 devices (padding member cropped)
    res5 = solve_batched(datas[:5], quants[:5], samps, 0.3,
                         [0.001] * 3, 3, data_parallel=4)
    assert res5.fdata.shape[0] == 5
    np.testing.assert_allclose(res5.fdata, res1.fdata[:5], atol=5e-3)


def test_bucket_data_parallel_matches(fixtures_dir, monkeypatch):
    """Dynamic-extent bucket sharded over devices == unsharded."""
    import jax
    import jax.experimental.pallas as pl

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs 2 devices")
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)

    from jpeg2png_tpu.runner import solve_bucket

    imgs = [read_jpeg(fixtures_dir / "lineart128_q10_420.jpg"),
            read_jpeg(fixtures_dir / "lineart64_q20_420.jpg")]
    bucket = (256, 256)
    r2 = solve_bucket(imgs, bucket, 0.3, [0.001] * 3, 1,
                      data_parallel=2)
    r1 = solve_bucket(imgs, bucket, 0.3, [0.001] * 3, 1,
                      data_parallel=1)
    np.testing.assert_allclose(r2.fdata, r1.fdata, atol=1e-4)
    np.testing.assert_allclose(r2.metrics, r1.metrics, rtol=1e-5)


def test_solve_bucket_lite_matches_per_image(fixtures_dir, monkeypatch):
    """Dynamic-extent bucket serving through the mega-LITE kernel
    (buckets past the f32 VMEM gate — round 3): same parity bar as the
    full-precision bucket test, with bf16-noise tolerance."""
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    # force the lite decision at this (small) bucket shape
    from jpeg2png_tpu.kernels import iter_step
    monkeypatch.setattr(iter_step, "supports",
                        lambda *a, **k: False)

    from jpeg2png_tpu.io import read_jpeg
    from jpeg2png_tpu.models.solver import solve_joint
    from jpeg2png_tpu.runner import _bucket_solver, solve_bucket

    _bucket_solver.cache_clear()
    try:
        imgs = [read_jpeg(fixtures_dir / "lineart128_q10_420.jpg"),
                read_jpeg(fixtures_dir / "lineart64_q20_420.jpg")]
        bucket = (256, 256)
        # 1 iteration: pre-chaos (lineart's flat regions flip TV
        # subgradient branches under ANY perturbation from iteration 2
        # on — bf16 side-canvas noise included; the project-wide
        # convention is pre-chaos exactness + PSNR later)
        res = solve_bucket(imgs, bucket, 0.3, [0.001] * 3, 1)
        for bi, img in enumerate(imgs):
            d = [p.data for p in img.planes]
            q = [p.quant for p in img.planes]
            s = [(p.h_samp, p.w_samp) for p in img.planes]
            fx, mx = solve_joint(d, q, s, 0.3, [0.001] * 3, 1,
                                 use_pallas=False)
            fx = np.asarray(fx)
            H, W = fx.shape[1:]
            np.testing.assert_allclose(res.fdata[bi][:, :H, :W], fx,
                                       atol=0.1)
            assert np.all(res.fdata[bi][:, H:, :] == 0.0)
            assert np.all(res.fdata[bi][:, :, W:] == 0.0)
            np.testing.assert_allclose(
                res.metrics[bi][:1, 0], np.asarray(mx)[:1, 0],
                rtol=2e-2)
    finally:
        _bucket_solver.cache_clear()


def test_solve_bucket_refuses_oversized_bucket(fixtures_dir):
    """A bucket shape past BOTH whole-solve VMEM gates (f32 and lite)
    raises a clear ValueError up front instead of failing deep inside
    the Mosaic compile (round-3 code-review finding: the invariant
    used to live only in decode_files_batched's pre-filter)."""
    import pytest

    from jpeg2png_tpu.runner import solve_bucket

    img = read_jpeg(fixtures_dir / "lineart128_q10_420.jpg")
    with pytest.raises(ValueError, match="exceeds the whole-solve"):
        solve_bucket([img], (4096, 4096), 0.3, [0.001] * 3, 1)


def _interpret_pallas(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)


def test_solve_bucket_chunked_matches_oneshot(fixtures_dir, monkeypatch):
    """Iteration-chunked bucket solves (mid-solve progress/CSV
    streaming, the reference's in-loop hooks compute.c:449-452) are
    bit-identical to one-shot: the carry resumes exactly, and the
    streamed metrics chunks reassemble into the full table."""
    _interpret_pallas(monkeypatch)
    from jpeg2png_tpu.runner import solve_bucket

    imgs = [read_jpeg(fixtures_dir / "lineart128_q10_420.jpg"),
            read_jpeg(fixtures_dir / "lineart64_q20_420.jpg")]
    bucket = (256, 256)
    one = solve_bucket(imgs, bucket, 0.3, [0.001] * 3, 3)
    seen = []

    def on_chunk(members, done, metrics):
        seen.append((list(members), done, metrics.copy()))

    chunked = solve_bucket(imgs, bucket, 0.3, [0.001] * 3, 3,
                           on_chunk=on_chunk, iter_chunk=1)
    np.testing.assert_array_equal(chunked.fdata, one.fdata)
    np.testing.assert_array_equal(chunked.metrics, one.metrics)
    assert [s[1] for s in seen] == [1, 2, 3]
    streamed = np.concatenate([s[2] for s in seen], axis=1)
    np.testing.assert_array_equal(streamed, one.metrics)


def test_bucket_dispatch_chunks_bound_compilations(fixtures_dir,
                                                   monkeypatch):
    """Any batch size flows through fixed-size dispatch chunks
    (8*n_dp, then n_dp), so a bucket compiles at most two artifacts —
    B is never baked into a trace shape beyond those two."""
    _interpret_pallas(monkeypatch)
    from jpeg2png_tpu.runner import solve_bucket
    from jpeg2png_tpu.utils.timing import CompileCounter

    img = read_jpeg(fixtures_dir / "lineart64_q20_420.jpg")
    bucket = (256, 256)
    solve_bucket([img] * 9, bucket, 0.3, [0.001] * 3, 1,
                 data_parallel=1)  # warm: compiles the two chunk shapes
    with CompileCounter() as cc:
        res = solve_bucket([img] * 13, bucket, 0.3, [0.001] * 3, 1,
                           data_parallel=1)
    assert res.fdata.shape[0] == 13
    assert cc.count == 0, "a new batch size must not recompile"


def test_quantized_buckets_merge_mixed_sizes(tmp_path, monkeypatch):
    """Assorted sizes collapse into ONE shared dyn bucket shape
    (the recompilation-storm guard, SURVEY.md §7 #6), solve through
    the dynamic-extent kernel, stream progress/CSV mid-solve, and
    produce correctly sized outputs."""
    import io as _io

    import jax

    from jpeg2png_tpu.utils.corpus import mint_corpus
    from jpeg2png_tpu.utils.logger import ConvergenceLogger

    _interpret_pallas(monkeypatch)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    files = mint_corpus(tmp_path, 4, sizes=(
        (320, 240), (288, 224), (320, 256), (384, 256)))
    cfg = SolverConfig(iterations=(2,) * 3)

    class FakeProgress:
        ticks = 0

        def increment(self, n):
            self.ticks += n

    buf = _io.StringIO()
    logger = ConvergenceLogger(buf)
    progress = FakeProgress()
    stats = {}
    out = decode_files_batched(files, cfg, logger=logger,
                               progress=progress, stats=stats)
    assert stats["n_dyn_buckets"] == 1 and stats["n_buckets"] == 1
    assert set(out) == set(files)
    assert out[files[0]].shape == (240, 320, 3)
    assert out[files[1]].shape == (224, 288, 3)
    # progress ticked once per (file, iteration); CSV streamed one row
    # per (file, iteration) with channel 3 (joint)
    assert progress.ticks == 4 * 2
    rows = [r for r in buf.getvalue().splitlines()[1:] if r]
    assert len(rows) == 4 * 2
    assert all(r.split(",")[1] == "3" for r in rows)


def test_batched_warm_pass_compiles_nothing(fixtures_dir):
    """Steady-state serving of an already-seen corpus compiles NOTHING
    (the recompilation-storm gate; VERDICT round-3 item 2)."""
    from jpeg2png_tpu.utils.timing import CompileCounter

    files = [str(fixtures_dir / "lineart64_q20_420.jpg"),
             str(fixtures_dir / "photo80_q30_422.jpg")]
    cfg = SolverConfig(iterations=(2,) * 3)
    decode_files_batched(files, cfg)   # cold pass pays the compiles
    with CompileCounter() as cc:
        out = decode_files_batched(files, cfg)
    assert set(out) == set(files)
    assert cc.count == 0


def test_solve_bucket_two_lite_matches_per_image(fixtures_dir,
                                                 monkeypatch):
    """Dynamic-extent bucket serving through the TWO-LITE pipeline
    (images past the whole-solve VMEM gates — VERDICT round-3 item 3):
    mixed sizes through ONE compiled per-iteration pipeline match
    per-image solves at the lite tiers' parity bar (pre-chaos state
    after 1 iteration + metrics, bf16-noise tolerance), padding stays
    exactly zero, and chunked execution reassembles bit-identically."""
    _interpret_pallas(monkeypatch)
    from jpeg2png_tpu.models.solver import solve_joint
    from jpeg2png_tpu.runner import solve_bucket_two

    imgs = [read_jpeg(fixtures_dir / "lineart128_q10_420.jpg"),
            read_jpeg(fixtures_dir / "lineart64_q20_420.jpg")]
    bucket = (128, 256)
    res = solve_bucket_two(imgs, bucket, 0.3, [0.001] * 3, 1,
                           data_parallel=1)
    for bi, img in enumerate(imgs):
        d = [p.data for p in img.planes]
        q = [p.quant for p in img.planes]
        s = [(p.h_samp, p.w_samp) for p in img.planes]
        fx, mx = solve_joint(d, q, s, 0.3, [0.001] * 3, 1,
                             use_pallas=False)
        fx = np.asarray(fx)
        H, W = fx.shape[1:]
        np.testing.assert_allclose(res.fdata[bi][:, :H, :W], fx,
                                   atol=0.1)
        assert np.all(res.fdata[bi][:, H:, :] == 0.0)
        assert np.all(res.fdata[bi][:, :, W:] == 0.0)
        np.testing.assert_allclose(
            res.metrics[bi][:1, 0], np.asarray(mx)[:1, 0], rtol=2e-2)

    # chunked (streaming) execution resumes exactly.  Unlike the mega
    # kernel (everything inside ONE pallas call -> bit-identical), the
    # two-lite body has XLA glue between the kernels (norm sqrt, step
    # scale, metrics) that the scan body and the single-step trace fuse
    # differently — a few-ulp drift that the TV subgradient's branch
    # flips amplify to ~1e-2 on a handful of pixels by iteration 3
    # (the known chaos trap, CLAUDE.md).  A real resume error would be
    # large and systematic, not <0.01% of pixels at <2e-4 relative.
    seen = []
    res3 = solve_bucket_two(imgs, bucket, 0.3, [0.001] * 3, 3,
                            data_parallel=1)
    res3c = solve_bucket_two(
        imgs, bucket, 0.3, [0.001] * 3, 3, data_parallel=1,
        on_chunk=lambda mbs, done, m: seen.append(done), iter_chunk=1)
    np.testing.assert_allclose(res3c.fdata, res3.fdata, atol=2e-2)
    assert (np.abs(res3c.fdata - res3.fdata) > 1e-3).mean() < 1e-4
    np.testing.assert_allclose(res3c.metrics, res3.metrics,
                               rtol=1e-4, atol=1e-3)
    assert seen == [1, 2, 3, 1, 2, 3]  # two per-image chunks (n_dp=1)


def test_bucket_device_init_matches_host_oracle(fixtures_dir):
    """The on-device bucket init (initial decode + FREE/FROZEN quant
    rasters built from int16 coefs + 8x8 tables — the staging diet
    that made batched serving device-bound, VERDICT round-4 item 1)
    matches a float64 host oracle of decode_coefficients + aux_init
    (jpeg.c:83-92, compute.c:296-302) and the quant-raster algebra."""
    from jpeg2png_tpu.models.solver import ChannelGeometry, canvas_shape
    from jpeg2png_tpu.ops.dct import dct_matrix_f64
    from jpeg2png_tpu.runner import (_FREE_Q, _bucket_init,
                                     _stage_image_host, _upload_chunk)

    for name in ("photo80_q30_422.jpg", "lineart64_q20_420.jpg",
                 "gray64_q30.jpg"):
        img = read_jpeg(fixtures_dir / name)
        HB, WB = 128, 256
        geoms = tuple(ChannelGeometry(p.nby, p.nbx, p.h_samp, p.w_samp)
                      for p in img.planes)
        H, W = canvas_shape(geoms)
        C = len(img.planes)
        staged = [_stage_image_host(img.planes, HB, WB)]
        chunk = _upload_chunk(staged, [0], [(H, W)], [1.0], C)
        f0, q_rs = _bucket_init((HB, WB), tuple(
            (p.h_samp, p.w_samp) for p in img.planes), 1, 1)(chunk[:4])
        f0 = np.asarray(f0)[0]

        d = dct_matrix_f64()
        for c, p in enumerate(img.planes):
            sy, sx = p.h_samp, p.w_samp
            # float64 oracle: dequant + IDCT + nearest-upsample with
            # edge clamp to (H, W), zero beyond, zero bucket padding
            y = np.matmul(d.T, np.matmul(
                p.data.astype(np.float64) * p.quant, d))
            nby, nbx = y.shape[:2]
            raster = np.moveaxis(y, 2, 1).reshape(nby * 8, nbx * 8)
            yy = np.minimum(np.arange(HB) // sy, nby * 8 - 1)
            xx = np.minimum(np.arange(WB) // sx, nbx * 8 - 1)
            up = raster[yy][:, xx]
            up[np.arange(HB) >= H] = 0.0
            up[:, np.arange(WB) >= W] = 0.0
            np.testing.assert_allclose(f0[c], up, atol=5e-3)

            # quant raster: real quant over the coef region, FREE over
            # the region->canvas gap, 0 over the bucket padding
            hcb, wcb = HB // sy, WB // sx
            qr = np.zeros((hcb, wcb), np.float32)
            qr[:H // sy, :W // sx] = _FREE_Q
            qr[:nby * 8, :nbx * 8] = np.tile(
                p.quant.astype(np.float32), (nby, nbx))
            np.testing.assert_array_equal(np.asarray(q_rs[c])[0], qr)


def test_two_lite_bucket_routing(monkeypatch):
    """decode_files_batched routes images past the whole-solve gates
    into shared dyn2 buckets instead of exact-geometry recompiles."""
    import jax

    from jpeg2png_tpu.io import JpegImage
    from jpeg2png_tpu.runner import two_lite_bucket_for

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    # fabricate header-only images of two different big sizes (the
    # routing decision needs geometry only)
    def fake_img(nby, nbx):
        from jpeg2png_tpu.io.jpeg_reader import CoefPlane
        planes = []
        for c, (sy, sx) in enumerate([(1, 1), (2, 2), (2, 2)]):
            planes.append(CoefPlane(
                data=np.zeros((nby // sy, nbx // sx, 8, 8), np.int16),
                quant=np.ones((8, 8), np.uint16),
                h_samp=sy, w_samp=sx))
        return JpegImage(height=nby * 8, width=nbx * 8,
                         progressive=False, planes=planes)

    a = fake_img(320, 256)   # 2560x2048 = 5.2 MP
    b = fake_img(288, 224)   # 2304x1792 = 4.1 MP
    ba = two_lite_bucket_for(a, (0.001,) * 3)
    bb = two_lite_bucket_for(b, (0.001,) * 3)
    assert ba is not None and ba == bb, (ba, bb)


def test_pixel_pack_roundtrip():
    """Packed-uint32 pixel fetches (dense layout for the phased
    device->host wire) round-trip exactly for every output dtype/shape
    class the runner produces."""
    import jax.numpy as jnp

    from jpeg2png_tpu.runner import _pack_pixels, _unpack_pixels

    rng = np.random.default_rng(5)
    for shape, dt in [((33, 47, 3), np.uint8), ((64, 64), np.uint8),
                      ((21, 17, 3), np.uint16), ((52, 100), np.uint16)]:
        x = (rng.random(shape) * 250).astype(dt)
        p = _pack_pixels(jnp.asarray(x))
        y = _unpack_pixels(np.asarray(p), shape, x.dtype)
        assert y.dtype == x.dtype
        np.testing.assert_array_equal(x, y)
