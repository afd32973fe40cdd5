"""Striped multi-device solver vs the single-device solver.

Runs on a simulated 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8), validating the halo exchange,
the global-psum step normalization, block-local projection and the
frozen/FREE padding algebra against the ordinary solver — both the
pure-XLA striped body and the fused Pallas striped body (interpreted
here; compiled on real TPU via tests/tpu_checks.py).
"""

import numpy as np
import pytest
import jax
from jax.experimental import pallas as pl

from jpeg2png_tpu.models.solver import ChannelGeometry, solve_joint
from jpeg2png_tpu.parallel.mesh import stripe_mesh
from jpeg2png_tpu.parallel.stripes import (
    padded_striped_shape, pallas_striped_supported, solve_striped,
    stripes_supported,
)


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)


def synth(rng, layout):
    datas, quants, samps = [], [], []
    for nby, nbx, sy, sx in layout:
        datas.append(rng.integers(-25, 25, (nby, nbx, 8, 8)).astype(np.int16))
        quants.append(rng.integers(1, 80, (8, 8)).astype(np.uint16))
        samps.append((sy, sx))
    return datas, quants, samps


@pytest.mark.parametrize("n_dev,layout,weight", [
    # 4:4:4, H=128 over 4 devices (32 rows each)
    (4, [(16, 16, 1, 1)] * 3, 0.3),
    # 4:2:0, H=256 over 8 devices (32 rows each, chroma 16 rows)
    (8, [(32, 16, 1, 1), (16, 8, 2, 2), (16, 8, 2, 2)], 0.3),
    # TV only
    (4, [(16, 8, 1, 1)], 0.0),
])
def test_striped_matches_single(n_dev, layout, weight):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(21)
    datas, quants, samps = synth(rng, layout)
    mesh = stripe_mesh(n_dev)

    fd_s, m_s = solve_striped(datas, quants, samps, weight,
                              [0.001] * len(datas), 4, mesh,
                              use_pallas=False)
    fd_1, m_1 = solve_joint(datas, quants, samps, weight,
                            [0.001] * len(datas), 4, use_pallas=False)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_1),
                               rtol=5e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(fd_s), np.asarray(fd_1),
                               atol=0.5)


@pytest.mark.parametrize("n_dev,layout,weight,pweight", [
    # aligned 4:2:0 over 4 devices
    (4, [(16, 16, 1, 1), (8, 8, 2, 2), (8, 8, 2, 2)], 0.3, 0.001),
    # UNALIGNED height (24 blocks = 192 rows over 4 -> pads to 256)
    # + ragged canvas (region gap: luma 192 rows, chroma region 192)
    (4, [(24, 16, 1, 1), (12, 8, 2, 2), (12, 8, 2, 2)], 0.3, 0.001),
    # single channel, TV only, width needs padding (64 -> 128)
    (4, [(16, 8, 1, 1)], 0.0, 0.001),
    # prob off entirely
    (2, [(16, 16, 1, 1)] * 3, 0.3, 0.0),
])
def test_striped_pallas_matches_single(interpret_pallas, n_dev, layout,
                                       weight, pweight):
    """The fused Pallas striped body (kernels/stripe_grad.py +
    kernels/project_step.py under shard_map) == single-device solve."""
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(7)
    datas, quants, samps = synth(rng, layout)
    mesh = stripe_mesh(n_dev)
    C = len(datas)

    geoms = tuple(ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
                  for d, (sy, sx) in zip(datas, samps))
    assert pallas_striped_supported(geoms, n_dev)

    fd_s, m_s = solve_striped(datas, quants, samps, weight,
                              [pweight] * C, 4, mesh, use_pallas=True)
    fd_1, m_1 = solve_joint(datas, quants, samps, weight,
                            [pweight] * C, 4, use_pallas=False)
    assert fd_s.shape == fd_1.shape
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_1),
                               rtol=5e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(fd_s), np.asarray(fd_1),
                               atol=0.5)


def test_striped_real_fixture_unaligned(interpret_pallas, fixtures_dir):
    """--tpu-stripes on a real 600x400 4:2:0 photo (VERDICT round-1
    item 3's done-criterion): unaligned H=400 over 4 devices, both
    striped bodies match the single-device solve."""
    from jpeg2png_tpu.io import read_jpeg

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    img = read_jpeg(fixtures_dir / "photo600x400_q20_420.jpg")
    datas = [p.data for p in img.planes]
    quants = [p.quant for p in img.planes]
    samps = [(p.h_samp, p.w_samp) for p in img.planes]
    mesh = stripe_mesh(4)

    fd_1, m_1 = solve_joint(datas, quants, samps, 0.3, [0.001] * 3, 3,
                            use_pallas=False)
    for use_pallas in (False, True):
        fd_s, m_s = solve_striped(datas, quants, samps, 0.3,
                                  [0.001] * 3, 3, mesh,
                                  use_pallas=use_pallas)
        assert fd_s.shape == fd_1.shape
        np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_1),
                                   rtol=5e-3, atol=1e-2)
        # real images hit the known chaotic FP divergence (flat-region
        # TV subgradients) after ~2 iterations — gate by PSNR, the
        # project-wide convention for solution comparison
        mse = float(np.mean(
            (np.asarray(fd_s) - np.asarray(fd_1)) ** 2))
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
        assert psnr > 55.0, f"use_pallas={use_pallas}: {psnr:.1f} dB"


def test_padded_striped_shape():
    # 400 rows over 4 devices, 4:2:0 -> unit 16, band 112 -> H2=448
    g420 = (ChannelGeometry(50, 75, 1, 1), ChannelGeometry(25, 38, 2, 2),
            ChannelGeometry(25, 38, 2, 2))
    H, W, H2, W2, L = padded_striped_shape(g420, 4)
    assert (H, W) == (400, 608)
    assert H2 % (4 * 16) == 0 and H2 >= H
    assert W2 % 256 == 0 and W2 >= W
    assert L == H2 // 4

    g444 = (ChannelGeometry(16, 16, 1, 1),) * 3
    assert stripes_supported(g444, 7)       # pads to 7*...
    H, W, H2, W2, L = padded_striped_shape(g444, 7)
    assert H2 % (7 * 8) == 0 and L % 8 == 0


def test_collective_count():
    """Scaling regression guard (VERDICT round-2 item 1): the striped
    iteration is latency-bound at pod scale, so collective COUNT is the
    efficiency knob.  The body must issue exactly 3 collectives per
    iteration: 2 halo ppermutes (top/bottom, all channels' f+fista
    slivers in one payload each) + 1 fused [C+3] vector all-reduce
    (norms, tv, tv2, and the previous iteration's prob dist — deferred
    one iteration into the shared vector).  Gate at <= 4 for slack."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(3)
    datas, quants, samps = synth(rng, [(16, 16, 1, 1)] * 3)
    mesh = stripe_mesh(4)
    iters = 3

    from jpeg2png_tpu.parallel.stripes import _build_striped
    geoms = tuple(ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
                  for d, (sy, sx) in zip(datas, samps))
    solver = _build_striped(geoms, 0.3, (0.001,) * 3, iters, True,
                            mesh, False)
    import jax.numpy as jnp
    lowered = solver.lower([jnp.asarray(d) for d in datas],
                           [jnp.asarray(q) for q in quants])
    hlo = lowered.compile().as_text()
    n_coll = hlo.count("collective-permute(") + hlo.count(
        "all-reduce(")
    # while-loop body counts once regardless of iteration count
    assert n_coll <= 4, f"{n_coll} collectives in the loop body"


def test_cli_tpu_stripes_e2e(fixtures_dir, tmp_path):
    """`--tpu-stripes 4` through the real CLI on an unaligned fixture
    produces (near-)identical pixels to the single-device CLI run."""
    from jpeg2png_tpu.cli import main
    from tests.pngdec import decode_png

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    src = str(fixtures_dir / "photo600x400_q20_420.jpg")
    out_s = str(tmp_path / "striped.png")
    out_1 = str(tmp_path / "single.png")
    assert main([src, "-o", out_s, "-i", "3", "-q",
                 "--tpu-stripes", "4"]) == 0
    assert main([src, "-o", out_1, "-i", "3", "-q"]) == 0
    a = np.asarray(decode_png(open(out_s, "rb").read()), np.float64)
    b = np.asarray(decode_png(open(out_1, "rb").read()), np.float64)
    assert a.shape == b.shape == (400, 600, 3)
    mse = ((a - b) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr > 55.0, psnr


@pytest.mark.parametrize("use_pallas", [False, True])
def test_batch_stripe_mesh_2d(use_pallas, interpret_pallas):
    """2-D (batch, y) mesh serving (VERDICT round-2 item 7): B=2
    images x 4-way stripes on the 8-device CPU mesh match per-image
    striped solves."""
    from jpeg2png_tpu.parallel.mesh import batch_stripe_mesh
    from jpeg2png_tpu.parallel.stripes import solve_striped_batched

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(31)
    layout = [(16, 16, 1, 1), (8, 8, 2, 2), (8, 8, 2, 2)]
    d0, q0, samps = synth(rng, layout)
    d1, q1, _ = synth(rng, layout)
    mesh2 = batch_stripe_mesh(2, 4)

    fd_b, m_b = solve_striped_batched(
        [d0, d1], [q0, q1], samps, 0.3, [0.001] * 3, 4, mesh2,
        use_pallas=use_pallas)
    assert fd_b.shape[0] == 2 and m_b.shape == (2, 4, 4)

    mesh1 = stripe_mesh(4)
    for bi, (dd, qq) in enumerate([(d0, q0), (d1, q1)]):
        fd_1, m_1 = solve_striped(dd, qq, samps, 0.3, [0.001] * 3, 4,
                                  mesh1, use_pallas=use_pallas)
        np.testing.assert_allclose(np.asarray(m_b[bi]), np.asarray(m_1),
                                   rtol=5e-3, atol=1e-2)
        np.testing.assert_allclose(np.asarray(fd_b[bi]),
                                   np.asarray(fd_1), atol=0.5)


def test_striped_golden_50_iters(fixtures_dir):
    """CONVERGED striped validation (VERDICT round-2 item 4): a full
    50-iteration striped decode holds the same golden-PSNR bar against
    the reference binary's own output as the single-chip path."""
    from jpeg2png_tpu.io import read_jpeg
    from jpeg2png_tpu.pipeline import smooth_decode
    from jpeg2png_tpu.utils.config import SolverConfig
    from tests.pngdec import decode_png

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    img = read_jpeg(fixtures_dir / "photo600x400_q20_420.jpg")
    res = smooth_decode(img, SolverConfig(), stripes=4)
    golden = np.asarray(decode_png(open(
        fixtures_dir / "golden" / "photo600x400_q20_420_i50.png",
        "rb").read()), np.float64)
    mse = ((np.asarray(res.pixels, np.float64) - golden) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr > 45.0, psnr


def test_cli_separate_stripes_e2e(fixtures_dir, tmp_path):
    """`-s --tpu-stripes 4`: per-channel STRIPED solves (VERDICT
    round-2 item 6 — this combination used to silently ignore
    striping) match plain `-s` output."""
    from jpeg2png_tpu.cli import main
    from tests.pngdec import decode_png

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    src = str(fixtures_dir / "photo600x400_q20_420.jpg")
    out_s = str(tmp_path / "sep_striped.png")
    out_1 = str(tmp_path / "sep.png")
    assert main([src, "-o", out_s, "-i", "3", "-q", "-s",
                 "--tpu-stripes", "4"]) == 0
    assert main([src, "-o", out_1, "-i", "3", "-q", "-s"]) == 0
    a = np.asarray(decode_png(open(out_s, "rb").read()), np.float64)
    b = np.asarray(decode_png(open(out_1, "rb").read()), np.float64)
    assert a.shape == b.shape == (400, 600, 3)
    mse = ((a - b) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    # 45 dB, the project-wide FP-divergence gate: -s chroma solves are
    # TV-only (weight 0) and flat-region subgradient chaos bites sooner
    # than in the joint test above (measured ~52 dB at 3 iterations)
    assert psnr > 45.0, psnr


def test_collective_count_pallas_body(interpret_pallas):
    """Same scaling guard for the fused Pallas striped body: per
    iteration exactly 2 batched halo ppermutes + 1 fused vector
    all-reduce — a regression that adds collectives (e.g. an
    accidental all-gather of a band) shows up in the compiled HLO's
    loop body."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(3)
    datas, quants, samps = synth(rng, [(16, 16, 1, 1)] * 3)
    mesh = stripe_mesh(4)

    from jpeg2png_tpu.parallel.stripes import _build_striped
    geoms = tuple(ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
                  for d, (sy, sx) in zip(datas, samps))
    solver = _build_striped(geoms, 0.3, (0.001,) * 3, 3, True,
                            mesh, True)
    import jax.numpy as jnp
    hlo = solver.lower(
        [jnp.asarray(d) for d in datas],
        [jnp.asarray(q) for q in quants]).compile().as_text()
    n_coll = hlo.count("collective-permute(") + hlo.count("all-reduce(")
    assert n_coll <= 4, f"{n_coll} collectives in the loop body"
    assert "all-gather(" not in hlo.split("ENTRY")[0]


def test_striped_chunked_matches_one_shot():
    """Chunked striped execution (live progress/CSV for giant images)
    resumes exactly: same compiled body, carry round-trips through the
    host loop."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(9)
    datas, quants, samps = synth(rng, [(16, 16, 1, 1)] * 3)
    mesh = stripe_mesh(4)

    seen = []
    fd_c, m_c = solve_striped(
        datas, quants, samps, 0.3, [0.001] * 3, 10, mesh,
        use_pallas=False, chunk=4,
        on_chunk=lambda done, m: seen.append((done, m.shape[0])))
    fd_1, m_1 = solve_striped(
        datas, quants, samps, 0.3, [0.001] * 3, 10, mesh,
        use_pallas=False)
    assert seen == [(4, 4), (8, 4), (10, 2)]
    np.testing.assert_allclose(np.asarray(m_c), np.asarray(m_1),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fd_c), np.asarray(fd_1),
                               atol=1e-4)


def test_mesh_refuses_silent_truncation():
    """Explicitly requesting more mesh devices than exist must raise,
    not silently build a smaller mesh (a 1-device "8-stripe" solve
    hides both the perf and the sharding-validity signal — the same
    contract batch_stripe_mesh always had)."""
    from jpeg2png_tpu.parallel.mesh import batch_mesh

    n = len(jax.devices())
    with pytest.raises(ValueError, match="have"):
        stripe_mesh(n + 1)
    with pytest.raises(ValueError, match="have"):
        batch_mesh(n + 1)
    # default (all devices) and exact requests still fine
    assert stripe_mesh().devices.size == n
    assert stripe_mesh(n).devices.size == n


def test_pipeline_clamps_oversized_stripes(fixtures_dir, capsys):
    """--tpu-stripes N > device count degrades loudly: warning on
    stderr, solve striped over all real devices, same pixels."""
    from jpeg2png_tpu.io import read_jpeg
    from jpeg2png_tpu.pipeline import smooth_decode
    from jpeg2png_tpu.utils.config import SolverConfig

    img = read_jpeg(fixtures_dir / "photo600x400_q20_420.jpg")
    cfg = SolverConfig(iterations=[3] * 4)
    n = len(jax.devices())
    res = smooth_decode(img, cfg, stripes=n + 37)
    err = capsys.readouterr().err
    assert f"exceeds the {n} available" in err
    ref = smooth_decode(img, cfg, stripes=n)
    assert res.pixels.shape == ref.pixels.shape == (400, 600, 3)
    mse = ((res.pixels.astype(np.float64)
            - ref.pixels.astype(np.float64)) ** 2).mean()
    assert mse < 1e-12


def test_collective_bytes_per_iteration(interpret_pallas):
    """Scaling guard at the BYTE level (the count gate's complement):
    the striped loop body's collective payload must be exactly
    2 halo ppermutes of [2C*h, W2] f32 (h = 16 for the lite body's
    bf16 DMA tiling, 8 for the f32 body) + 1 fused [C+3] f32
    all-reduce.  docs/scaling.md derives the N-chip efficiency
    projection from exactly these numbers — a payload regression
    (e.g. an accidental full-band exchange) breaks this test before
    it silently halves pod-scale efficiency."""
    import re

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(3)
    datas, quants, samps = synth(rng, [(16, 16, 1, 1)] * 3)
    mesh = stripe_mesh(4)
    C = 3

    from jpeg2png_tpu.parallel.stripes import (
        _build_striped, padded_striped_shape_lite, striped_carry_kind)
    geoms = tuple(ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
                  for d, (sy, sx) in zip(datas, samps))
    kind = striped_carry_kind(geoms, 4, True, (0.001,) * 3)
    solver = _build_striped(geoms, 0.3, (0.001,) * 3, 3, True,
                            mesh, True)
    import jax.numpy as jnp
    hlo = solver.lower(
        [jnp.asarray(d) for d in datas],
        [jnp.asarray(q) for q in quants]).compile().as_text()

    sizes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f64": 8}

    def op_bytes(opname):
        total = 0
        for m in re.finditer(
                r"= (\w+)\[([\d,]*)\]\S* %s\(" % opname, hlo):
            n = 1
            for x in m.group(2).split(","):
                if x:
                    n *= int(x)
            total += sizes[m.group(1)] * n
        return total

    if kind == "lite":
        _, _, _, W2, _ = padded_striped_shape_lite(geoms, 4)
        halo_rows = 16
    else:
        _, _, _, W2, _ = padded_striped_shape(geoms, 4)
        halo_rows = 8
    expected_perm = 2 * (2 * C * halo_rows * W2) * 4
    assert op_bytes("collective-permute") == expected_perm
    # the fused [C+3] f32 vector (+ slack for a layout pad)
    assert 0 < op_bytes("all-reduce") <= 2 * (C + 3) * 4
