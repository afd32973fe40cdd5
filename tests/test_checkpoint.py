"""Checkpoint/resume: chunked == uninterrupted, resume after a 'crash'."""

import numpy as np
import pytest

from jpeg2png_tpu.models.checkpoint import (
    load_state, save_state, solve_checkpointed,
)
from jpeg2png_tpu.models.solver import solve_joint


def synth(rng):
    datas = [
        rng.integers(-25, 25, (4, 4, 8, 8)).astype(np.int16),
        rng.integers(-12, 12, (2, 2, 8, 8)).astype(np.int16),
        rng.integers(-12, 12, (2, 2, 8, 8)).astype(np.int16),
    ]
    quants = [rng.integers(1, 60, (8, 8)).astype(np.uint16)
              for _ in range(3)]
    return datas, quants, [(1, 1), (2, 2), (2, 2)]


def test_chunked_equals_uninterrupted(tmp_path):
    rng = np.random.default_rng(41)
    datas, quants, samps = synth(rng)
    ckpt = str(tmp_path / "state.npz")

    res = solve_checkpointed(datas, quants, samps, 0.3, [0.001] * 3,
                             iterations=6, checkpoint_path=ckpt,
                             checkpoint_every=2, use_pallas=False)
    fd, m = solve_joint(datas, quants, samps, 0.3, [0.001] * 3, 6,
                        use_pallas=False)
    np.testing.assert_array_equal(res.fdata, np.asarray(fd))
    np.testing.assert_array_equal(res.metrics, np.asarray(m))
    assert res.resumed_from == 0
    # completed runs clean up their snapshot
    assert not (tmp_path / "state.npz").exists()


def test_resume_after_partial_run(tmp_path):
    rng = np.random.default_rng(42)
    datas, quants, samps = synth(rng)
    ckpt = str(tmp_path / "state.npz")

    # simulate a crash: run only the first 4 of 6 iterations, keeping
    # the snapshot written after iteration 4
    from jpeg2png_tpu.models import checkpoint as C
    import jax, jax.numpy as jnp
    from jpeg2png_tpu.models.solver import ChannelGeometry, _build_solver_impl
    geoms = tuple(ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
                  for d, (sy, sx) in zip(datas, samps))
    impl = _build_solver_impl(geoms, 0.3, (0.001,) * 3, 6, True,
                              "float32", False)
    fp = C._fingerprint(geoms, 0.3, [0.001] * 3, 6, False)
    d = [jnp.asarray(x) for x in datas]
    q = [jnp.asarray(x) for x in quants]
    _, m_first, carry = jax.jit(lambda a, b: impl(a, b, None, 4))(d, q)
    C.save_state(ckpt, carry, 4, fp)

    res = solve_checkpointed(datas, quants, samps, 0.3, [0.001] * 3,
                             iterations=6, checkpoint_path=ckpt,
                             checkpoint_every=100, use_pallas=False)
    assert res.resumed_from == 4
    assert res.metrics.shape == (2, 4)   # only the remaining iterations

    fd_full, m_full = solve_joint(datas, quants, samps, 0.3, [0.001] * 3, 6,
                                  use_pallas=False)
    np.testing.assert_array_equal(res.fdata, np.asarray(fd_full))
    np.testing.assert_array_equal(res.metrics, np.asarray(m_full)[4:])


def test_save_state_extension_exact_and_atomic(tmp_path):
    """np.savez on a *path* appends '.npz', which would break the
    os.path.exists resume checks; the open-file-handle + os.replace
    write is extension-exact and leaves no temp droppings."""
    import os

    ckpt = str(tmp_path / "state.ckpt")
    save_state(ckpt, {"x": np.arange(5)}, 3, "0123456789abcdef")
    assert os.path.exists(ckpt)
    assert not os.path.exists(ckpt + ".npz")
    carry, it = load_state(ckpt, "0123456789abcdef")
    assert it == 3
    np.testing.assert_array_equal(carry["x"], np.arange(5))
    assert sorted(p.name for p in tmp_path.iterdir()) == ["state.ckpt"]


def test_foreign_checkpoint_not_deleted(tmp_path):
    """resume=False with an existing mismatched snapshot: the run must
    not delete a file it neither wrote nor validated."""
    import os

    rng = np.random.default_rng(45)
    datas, quants, samps = synth(rng)
    ckpt = str(tmp_path / "state.npz")
    save_state(ckpt, {"x": np.zeros(3)}, 1, "deadbeefdeadbeef")
    res = solve_checkpointed(datas, quants, samps, 0.3, [0.001] * 3,
                             iterations=3, checkpoint_path=ckpt,
                             checkpoint_every=100, resume=False,
                             use_pallas=False)
    assert res.resumed_from == 0
    assert os.path.exists(ckpt)   # foreign file untouched


def test_chunked_iterations_zero():
    """solve_joint_chunked(iterations=0) returns the initial decode
    like solve_joint, not (None, empty)."""
    from jpeg2png_tpu.models.solver import solve_joint_chunked

    rng = np.random.default_rng(46)
    datas, quants, samps = synth(rng)
    fd, m = solve_joint_chunked(datas, quants, samps, 0.3, [0.001] * 3,
                                0, use_pallas=False)
    assert m.shape == (0, 4)
    fd1, _ = solve_joint(datas, quants, samps, 0.3, [0.001] * 3, 0,
                         use_pallas=False)
    np.testing.assert_array_equal(np.asarray(fd), np.asarray(fd1))


def test_fingerprint_mismatch_refused(tmp_path):
    rng = np.random.default_rng(43)
    datas, quants, samps = synth(rng)
    ckpt = str(tmp_path / "state.npz")
    save_state(ckpt, {"x": np.zeros(3)}, 1, "deadbeefdeadbeef")
    with pytest.raises(ValueError, match="different solve configuration"):
        load_state(ckpt, "0123456789abcdef")


def test_striped_checkpoint_chunked_and_resume(tmp_path):
    """Striped checkpoint/resume: chunked == one-shot, and a snapshot
    left by a partial run resumes to the identical final state."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from jpeg2png_tpu.models.checkpoint import solve_striped_checkpointed
    from jpeg2png_tpu.parallel.mesh import stripe_mesh
    from jpeg2png_tpu.parallel.stripes import solve_striped

    rng = np.random.default_rng(44)
    datas, quants, samps = synth(rng)
    # stripeable geometry: 4x bigger luma
    datas[0] = rng.integers(-25, 25, (16, 16, 8, 8)).astype(np.int16)
    datas[1] = rng.integers(-12, 12, (8, 8, 8, 8)).astype(np.int16)
    datas[2] = rng.integers(-12, 12, (8, 8, 8, 8)).astype(np.int16)
    mesh = stripe_mesh(4)
    ckpt = str(tmp_path / "striped.npz")

    res = solve_striped_checkpointed(
        datas, quants, samps, 0.3, [0.001] * 3, 6, mesh,
        checkpoint_path=ckpt, checkpoint_every=2, use_pallas=False)
    fd, m = solve_striped(datas, quants, samps, 0.3, [0.001] * 3, 6,
                          mesh, use_pallas=False)
    np.testing.assert_array_equal(res.fdata, np.asarray(fd))
    np.testing.assert_array_equal(res.metrics, np.asarray(m))
    assert not (tmp_path / "striped.npz").exists()

    # simulated crash: run 4 of 6 via a tiny checkpoint_every and stop
    # by copying the snapshot written after iteration 4
    import shutil

    from jpeg2png_tpu.models import checkpoint as C
    from jpeg2png_tpu.parallel.stripes import _build_striped
    import jax.numpy as jnp
    from jpeg2png_tpu.models.solver import ChannelGeometry
    geoms = tuple(ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
                  for d, (sy, sx) in zip(datas, samps))
    key = (geoms, 0.3, (0.001,) * 3, 6, True, mesh, False)
    d = [jnp.asarray(x) for x in datas]
    q = [jnp.asarray(x) for x in quants]
    _, m_first, carry = _build_striped(*key, 4)(d, q, None)
    fp = C.striped_fingerprint(geoms, 4, False, 0.3,
                               tuple([0.001] * 3), 6)
    C.save_state(ckpt, carry, 4, fp)

    res2 = solve_striped_checkpointed(
        datas, quants, samps, 0.3, [0.001] * 3, 6, mesh,
        checkpoint_path=ckpt, checkpoint_every=100, use_pallas=False)
    assert res2.resumed_from == 4
    np.testing.assert_allclose(res2.fdata, np.asarray(fd), atol=1e-5)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(m_first), res2.metrics]),
        np.asarray(m), rtol=1e-6)
