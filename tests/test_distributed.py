"""Multi-host smoke test: 2 localhost CPU processes, one global mesh.

Spawns two subprocesses that each call
jpeg2png_tpu.parallel.distributed.initialize() against a localhost
coordinator, build a stripe mesh over the GLOBAL device list (one CPU
device per process), and run a striped solve whose per-iteration halo
ppermute and psum collectives cross the process boundary.  This is the
SURVEY.md §5 distributed-backend row exercised end-to-end on CI
hardware (no pod needed).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    # exactly one CPU device per process: the 2-process mesh is the
    # multi-host topology under test
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")

    from jpeg2png_tpu.parallel.distributed import initialize, gather_output
    pid, count = initialize()
    assert count == 2, count
    assert len(jax.devices()) == 2, jax.devices()

    from jpeg2png_tpu.parallel.mesh import stripe_mesh
    from jpeg2png_tpu.parallel.stripes import solve_striped

    rng = np.random.default_rng(3)
    datas = [rng.integers(-25, 25, (4, 16, 8, 8)).astype(np.int16)
             for _ in range(3)]
    quants = [rng.integers(1, 60, (8, 8)).astype(np.uint16)
              for _ in range(3)]
    samps = [(1, 1)] * 3
    mesh = stripe_mesh()          # both processes' devices
    fdata, metrics = solve_striped(
        datas, quants, samps, 0.3, [0.001] * 3, 2, mesh,
        use_pallas=False)
    m = gather_output(metrics)          # replicated: local read
    assert np.isfinite(m).all() and m.shape == (2, 4)
    # host np arrays (e.g. chunked-solve metrics) are already
    # replicated per-process: gather_output must pass them through,
    # NOT concatenate process_count identical copies
    m_again = gather_output(np.asarray(m))
    assert m_again.shape == (2, 4), m_again.shape
    fd = gather_output(fdata)           # row-sharded across processes
    assert fd.shape == (3, 32, 128), fd.shape
    assert np.isfinite(fd).all()
    # cross-check vs the single-process solver on rank 0's data
    from jpeg2png_tpu.models.solver import solve_joint
    fd1, _ = solve_joint(datas, quants, samps, 0.3, [0.001] * 3, 2,
                         use_pallas=False)
    assert np.abs(fd - np.asarray(fd1)).max() < 0.5
    print(f"proc {pid}: striped solve over 2 processes ok", flush=True)
""")


@pytest.mark.skipif(
    os.environ.get("JPEG2PNG_SKIP_MULTIPROC") == "1",
    reason="multi-process smoke disabled")
def test_two_process_striped_solve(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = []
    for i in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update({
            "JPEG2PNG_COORDINATOR": f"localhost:{port}",
            "JPEG2PNG_NUM_PROCESSES": "2",
            "JPEG2PNG_PROCESS_ID": str(i),
            "PYTHONPATH": repo + os.pathsep + os.environ.get(
                "PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process solve hung:\n" + "\n".join(outs))

    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outs[i]}"
        assert "striped solve over 2 processes ok" in outs[i]
