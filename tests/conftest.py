"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests use a simulated 8-device mesh
(XLA_FLAGS=--xla_force_host_platform_device_count), per the strategy in
SURVEY.md §4. Must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon site hook (this machine's remote-TPU tunnel) overrides
# JAX_PLATFORMS via jax.config at interpreter start; override it back —
# tests must run on the simulated 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture
def fixtures_dir():
    return FIXTURES
