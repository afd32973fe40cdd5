"""Smoke test for tools/profile_solve.py (the device-trace breakdown
tool behind README's tier tables).  On CPU the timings are
meaningless; the gate is that a trace is captured, device ops are
found, and a per-iteration table prints."""

import pathlib
import subprocess
import sys


def test_profile_solve_smoke(tmp_path):
    tool = (pathlib.Path(__file__).parent.parent
            / "tools" / "profile_solve.py")
    out = subprocess.run(
        [sys.executable, str(tool), "--nby", "8", "--nbx", "16",
         "--iters", "2", "--trace-dir", str(tmp_path / "trace")],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "HOME": "/root"},
        cwd=str(tool.parent.parent),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "us/iter" in out.stdout, out.stdout
