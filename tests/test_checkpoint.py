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


def test_fingerprint_mismatch_refused(tmp_path):
    rng = np.random.default_rng(43)
    datas, quants, samps = synth(rng)
    ckpt = str(tmp_path / "state.npz")
    save_state(ckpt, {"x": np.zeros(3)}, 1, "deadbeefdeadbeef")
    with pytest.raises(ValueError, match="different solve configuration"):
        load_state(ckpt, "0123456789abcdef")
