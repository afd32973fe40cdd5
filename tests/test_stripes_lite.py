"""The LITE striped body: bf16 state + coef-space devq prob carries.

Round-3 extension of the two-lite HBM diet (tests/test_two_lite.py) to
the spatially-sharded solver: per band the carry is f (f32) +
d = f - fista (bf16) + coefficient-space bf16 devq prob carries, the
halo exchange rides 16-row slivers (bf16 HBM tiles are (16,128)-packed)
and the projection computes its clamp boxes in-kernel from int16 +
quant rasters.  The per-iteration collective budget stays at THREE
(2 batched halo ppermutes + 1 fused vector psum).

Interpreter-mode parity on the 8-device CPU mesh here; compiled n=1
checks live in tests.tpu_checks.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import Mesh

from jpeg2png_tpu.models.solver import ChannelGeometry, solve_joint
from jpeg2png_tpu.parallel import stripes


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)


def _psnr(a, b):
    mse = ((np.asarray(a, np.float64)
            - np.asarray(b, np.float64)) ** 2).mean()
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def _synth(rng, layouts):
    datas, quants, samps = [], [], []
    for nby, nbx, sy, sx in layouts:
        datas.append(rng.integers(-25, 25, (nby, nbx, 8, 8))
                     .astype(np.int16))
        quants.append(rng.integers(1, 60, (8, 8)).astype(np.uint16))
        samps.append((sy, sx))
    return datas, quants, samps


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip("not enough devices")
    return Mesh(np.array(jax.devices()[:n]), ("y",))


def _geoms(datas, samps):
    return tuple(ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
                 for d, (sy, sx) in zip(datas, samps))


@pytest.mark.parametrize("n_dev,layout,weight,pweights", [
    (4, [(16, 16, 1, 1)] * 3, 0.3, (0.001,) * 3),       # aligned 4:4:4
    (4, [(16, 16, 1, 1), (8, 8, 2, 2), (8, 8, 2, 2)],   # aligned 4:2:0
     0.3, (0.001,) * 3),
    (2, [(77, 77, 1, 1), (39, 39, 2, 2), (39, 39, 2, 2)],  # odd: FREE
     0.3, (0.001,) * 3),                                 # gaps + pads
    (4, [(16, 16, 1, 1), (8, 8, 2, 2), (8, 8, 2, 2)],   # prob partial,
     0.0, (0.001, 0.0, 0.0)),                            # TGV2 off
    (4, [(16, 16, 1, 1)], 0.3, (0.001,)),                # grayscale
])
def test_striped_lite_matches_single(interpret_pallas, n_dev, layout,
                                     weight, pweights):
    """The lite striped body tracks the single-chip XLA solver (PSNR
    gates per the project-wide chaotic-divergence caveat; iteration-0
    metrics match pointwise)."""
    rng = np.random.default_rng(11)
    datas, quants, samps = _synth(rng, layout)
    geoms = _geoms(datas, samps)
    mesh = _mesh(n_dev)
    assert stripes.pallas_striped_lite_supported(
        geoms, n_dev, tuple(pweights)), "gate must select the lite body"
    assert stripes.striped_carry_kind(
        geoms, n_dev, True, tuple(pweights)) == "lite"

    fd_s, m_s = stripes.solve_striped(
        datas, quants, samps, weight, list(pweights), 8, mesh,
        use_pallas=True)
    fd_x, m_x = solve_joint(
        datas, quants, samps, weight, list(pweights), 8,
        use_pallas=False)
    assert _psnr(fd_s, fd_x) > 60.0
    np.testing.assert_allclose(np.asarray(m_s)[0], np.asarray(m_x)[0],
                               rtol=1e-4)
    mx = np.asarray(m_x)[-1, 0]
    assert abs(np.asarray(m_s)[-1, 0] - mx) / abs(mx) < 1e-3


def test_striped_lite_collective_count(interpret_pallas):
    """Per iteration exactly 3 collectives (2 halo ppermutes + 1 fused
    [C+3] psum) in the lite loop body — the pod-scale latency budget
    (README striped-scaling analysis) must not regress.  Setup-time
    const resharding on unaligned geometry is excluded by using an
    aligned layout, exactly like the f32 body's gate."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(3)
    datas, quants, samps = _synth(rng, [(16, 16, 1, 1)] * 3)
    geoms = _geoms(datas, samps)
    mesh = _mesh(4)
    assert stripes.striped_carry_kind(geoms, 4, True, (0.001,) * 3) \
        == "lite"
    solver = stripes._build_striped(geoms, 0.3, (0.001,) * 3, 3, True,
                                    mesh, True)
    hlo = solver.lower(
        [jnp.asarray(d) for d in datas],
        [jnp.asarray(q) for q in quants]).compile().as_text()
    n_coll = (hlo.count("collective-permute(")
              + hlo.count("all-reduce("))
    assert n_coll <= 4, f"{n_coll} collectives in the loop body"
    assert "all-gather(" not in hlo.split("ENTRY")[0]


def test_striped_lite_batched_2d(interpret_pallas):
    """B=2 images x 4-way stripes on the ('batch','y') mesh through the
    lite body match per-image single-chip solves."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(5)
    datas, quants, samps = _synth(
        rng, [(16, 16, 1, 1), (8, 8, 2, 2), (8, 8, 2, 2)])
    datas2 = [datas, [np.clip(d + 1, -25, 25) for d in datas]]
    quants2 = [quants, quants]
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("batch", "y"))
    fd_b, m_b = stripes.solve_striped_batched(
        datas2, quants2, samps, 0.3, [0.001] * 3, 6, mesh,
        use_pallas=True)
    for b in range(2):
        fx, mx = solve_joint(datas2[b], quants2[b], samps, 0.3,
                             [0.001] * 3, 6, use_pallas=False)
        assert _psnr(fd_b[b], fx) > 60.0
        np.testing.assert_allclose(np.asarray(m_b)[b, 0],
                                   np.asarray(mx)[0], rtol=1e-4)


def test_striped_lite_chunked_matches_one_shot(interpret_pallas):
    """Chunked lite execution (the resume/progress path) is numerically
    identical to one uninterrupted solve — the carry round-trips the
    bf16 d / devq state exactly."""
    rng = np.random.default_rng(9)
    datas, quants, samps = _synth(
        rng, [(16, 16, 1, 1), (8, 8, 2, 2), (8, 8, 2, 2)])
    mesh = _mesh(4)
    fd1, m1 = stripes.solve_striped(
        datas, quants, samps, 0.3, [0.001] * 3, 9, mesh,
        use_pallas=True)
    chunks = []
    fd2, m2 = stripes.solve_striped(
        datas, quants, samps, 0.3, [0.001] * 3, 9, mesh,
        use_pallas=True,
        on_chunk=lambda done, m: chunks.append(done), chunk=4)
    np.testing.assert_array_equal(np.asarray(fd1), np.asarray(fd2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    assert chunks == [4, 8, 9]


def test_striped_lite_checkpoint_roundtrip(interpret_pallas, tmp_path):
    """solve_striped_checkpointed through the lite body: the bf16
    carry snapshots to .npz (uint16 views) and resumes to the exact
    uninterrupted result; a snapshot from the f32 body is refused."""
    from jpeg2png_tpu.models.checkpoint import (
        save_state, solve_striped_checkpointed)

    rng = np.random.default_rng(13)
    datas, quants, samps = _synth(
        rng, [(16, 16, 1, 1), (8, 8, 2, 2), (8, 8, 2, 2)])
    mesh = _mesh(4)
    ck = str(tmp_path / "striped.npz")
    res = solve_striped_checkpointed(
        datas, quants, samps, 0.3, [0.001] * 3, 9, mesh, ck,
        checkpoint_every=4, use_pallas=True)
    fd1, m1 = stripes.solve_striped(
        datas, quants, samps, 0.3, [0.001] * 3, 9, mesh,
        use_pallas=True)
    np.testing.assert_allclose(res.fdata, np.asarray(fd1), atol=1e-4)
    np.testing.assert_allclose(res.metrics, np.asarray(m1), rtol=1e-4)

    # a carry written under a different striped body kind is refused
    save_state(ck, (jnp.zeros((4, 4)),), 4, "wrong-kind-fp")
    with pytest.raises(ValueError,
                       match="different solve configuration"):
        solve_striped_checkpointed(
            datas, quants, samps, 0.3, [0.001] * 3, 9, mesh, ck,
            checkpoint_every=4, use_pallas=True)


def test_f32_striped_body_still_selectable(interpret_pallas,
                                           monkeypatch):
    """When the lite gates fail the f32 striped body still runs — keep
    both bodies covered (the lite gates legitimately reject e.g.
    tiny canvases via the 2x padding-waste guard)."""
    rng = np.random.default_rng(17)
    datas, quants, samps = _synth(
        rng, [(16, 16, 1, 1), (8, 8, 2, 2), (8, 8, 2, 2)])
    geoms = _geoms(datas, samps)
    mesh = _mesh(4)
    monkeypatch.setattr(stripes, "pallas_striped_lite_supported",
                        lambda *a, **k: False)
    stripes._build_striped.cache_clear()
    assert stripes.striped_carry_kind(geoms, 4, True, (0.001,) * 3) \
        == "f32"
    fd_s, _ = stripes.solve_striped(
        datas, quants, samps, 0.3, [0.001] * 3, 8, mesh,
        use_pallas=True)
    fd_x, _ = solve_joint(datas, quants, samps, 0.3, [0.001] * 3, 8,
                          use_pallas=False)
    assert _psnr(fd_s, fd_x) > 60.0
    stripes._build_striped.cache_clear()


def test_striped_realistic_band_geometry(interpret_pallas):
    """Realistic band heights over the 8-device virtual mesh (round-4
    VERDICT item 6): the dryrun and the parity tests above stripe
    16-32-row bands, which cannot catch stripe-boundary bugs at the
    band geometries real giant images produce (halo-staged windows
    spanning full 64+ row bands, 16-row bf16 alignment across a
    4:2:0 chroma mix).

    Two rows: the XLA striped body on a ~1 MP canvas (128-row bands),
    and the interpreted LITE body on the largest canvas that stays
    tractable in interpreter mode (768x1024, 96-row bands)."""
    rng = np.random.default_rng(23)

    # XLA body, 1024x1024 4:2:0 over 8 devices -> 128-row bands
    datas, quants, samps = _synth(
        rng, [(128, 128, 1, 1), (64, 64, 2, 2), (64, 64, 2, 2)])
    mesh = _mesh(8)
    fd_s, m_s = stripes.solve_striped(
        datas, quants, samps, 0.3, [0.001] * 3, 2, mesh,
        use_pallas=False)
    fd_x, m_x = solve_joint(datas, quants, samps, 0.3, [0.001] * 3, 2,
                            use_pallas=False)
    assert _psnr(fd_s, fd_x) > 60.0
    np.testing.assert_allclose(np.asarray(m_s)[0], np.asarray(m_x)[0],
                               rtol=1e-4)

    # interpreted LITE body, 768x1024 4:2:0 over 8 devices -> 96-row
    # bands (whole halo-staged windows, 16-row-aligned chroma splits)
    datas, quants, samps = _synth(
        rng, [(96, 128, 1, 1), (48, 64, 2, 2), (48, 64, 2, 2)])
    geoms = _geoms(datas, samps)
    assert stripes.striped_carry_kind(geoms, 8, True, (0.001,) * 3) \
        == "lite"
    fd_l, m_l = stripes.solve_striped(
        datas, quants, samps, 0.3, [0.001] * 3, 2, mesh,
        use_pallas=True)
    fd_x, m_x = solve_joint(datas, quants, samps, 0.3, [0.001] * 3, 2,
                            use_pallas=False)
    assert _psnr(fd_l, fd_x) > 60.0
    np.testing.assert_allclose(np.asarray(m_l)[0], np.asarray(m_x)[0],
                               rtol=1e-4)
