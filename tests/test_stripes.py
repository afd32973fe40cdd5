"""Striped multi-device solver vs the single-device solver.

Runs on a simulated 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8), validating the halo exchange,
the global-psum step normalization, and block-local projection against
the ordinary solver bit-for-... well, float-for-float.
"""

import numpy as np
import pytest
import jax

from jpeg2png_tpu.models.solver import solve_joint
from jpeg2png_tpu.parallel.mesh import stripe_mesh
from jpeg2png_tpu.parallel.stripes import solve_striped, stripes_supported
from jpeg2png_tpu.models.solver import ChannelGeometry


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
                              [0.001] * len(datas), 4, mesh)
    fd_1, m_1 = solve_joint(datas, quants, samps, weight,
                            [0.001] * len(datas), 4, use_pallas=False)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_1),
                               rtol=5e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(fd_s), np.asarray(fd_1),
                               atol=0.5)


def test_stripes_supported_gating():
    g444 = (ChannelGeometry(16, 16, 1, 1),) * 3
    assert stripes_supported(g444, 4)
    assert not stripes_supported(g444, 7)      # 128 % (7*8) != 0
    g420 = (ChannelGeometry(32, 16, 1, 1), ChannelGeometry(16, 8, 2, 2),
            ChannelGeometry(16, 8, 2, 2))
    assert stripes_supported(g420, 8)
    # ragged canvas (luma region smaller) is not shardable
    gragged = (ChannelGeometry(13, 13, 1, 1), ChannelGeometry(7, 7, 2, 2),
               ChannelGeometry(7, 7, 2, 2))
    assert not stripes_supported(gragged, 2)
