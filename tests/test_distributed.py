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

    # --- CLI e2e: exactly ONE process writes the PNG/CSV (VERDICT
    # round-2 item 2; reference single writer jpeg2png.c:162-165) ---
    from jpeg2png_tpu.parallel.distributed import barrier
    from jpeg2png_tpu.cli import main
    out_dir = os.environ["JPEG2PNG_TEST_TMP"]
    src = os.path.join("tests", "fixtures", "photo600x400_q20_420.jpg")
    shared_png = os.path.join(out_dir, "distributed_out.png")
    # every rank passes its OWN csv path: only rank 0's may appear
    csv_path = os.path.join(out_dir, f"rank{pid}.csv")
    rc = main([src, "-o", shared_png, "-i", "2", "-q", "-c", csv_path,
               "--tpu-stripes", "2", "--tpu-distributed"])
    assert rc == 0, rc
    barrier("cli-e2e-done")
    assert os.path.exists(shared_png)
    assert os.path.exists(os.path.join(out_dir, "rank0.csv"))
    assert not os.path.exists(os.path.join(out_dir, "rank1.csv")), \
        "rank 1 wrote a CSV"
    print(f"proc {pid}: single-writer CLI e2e ok", flush=True)

    # --- striped checkpoint save/resume across 2 processes ---
    from jpeg2png_tpu.models.checkpoint import solve_striped_checkpointed
    ckpt = os.path.join(out_dir, "striped2.ckpt")
    res = solve_striped_checkpointed(
        datas, quants, samps, 0.3, [0.001] * 3, 4, mesh,
        checkpoint_path=ckpt, checkpoint_every=2, use_pallas=False)
    assert not os.path.exists(ckpt)      # completed: cleaned up
    fd4, m4 = solve_striped(datas, quants, samps, 0.3, [0.001] * 3, 4,
                            mesh, use_pallas=False)
    np.testing.assert_array_equal(res.fdata, gather_output(fd4))
    np.testing.assert_array_equal(res.metrics, gather_output(m4))
    print(f"proc {pid}: striped checkpoint over 2 processes ok",
          flush=True)

    # --- striped-LITE body across 2 processes (round 3): the 16-row
    # halo ppermutes and devq-carry sharding cross the host boundary
    # for real; only the band kernel itself runs interpreted ---
    from jax.experimental import pallas as pl
    from jpeg2png_tpu.parallel.stripes import striped_carry_kind
    from jpeg2png_tpu.models.solver import ChannelGeometry
    geoms = tuple(ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
                  for d, (sy, sx) in zip(datas, samps))
    assert striped_carry_kind(geoms, 2, True, (0.001,) * 3) == "lite"
    orig = pl.pallas_call
    pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        fd_l, m_l = solve_striped(
            datas, quants, samps, 0.3, [0.001] * 3, 2, mesh,
            use_pallas=True)
        fdl = gather_output(fd_l)
        assert np.abs(fdl - np.asarray(fd1)).max() < 0.5
    finally:
        pl.pallas_call = orig
    print(f"proc {pid}: striped-lite over 2 processes ok", flush=True)
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
            "JPEG2PNG_TEST_TMP": str(tmp_path),
            "PYTHONPATH": repo + os.pathsep + os.environ.get(
                "PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process solve hung:\n" + "\n".join(outs))

    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outs[i]}"
        assert "striped solve over 2 processes ok" in outs[i]
