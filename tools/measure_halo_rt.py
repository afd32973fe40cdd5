#!/usr/bin/env python
"""Measure the cross-PROCESS halo-exchange round trip (DCN anchor).

Spawns two localhost CPU processes (the tests/test_distributed.py
machinery), builds the 2-device global mesh, and times the striped
solver's actual halo collective — a ppermute of the LITE body's
[2C*16, W2] f32 sliver payload (parallel/stripes.py) — plus the fused
[C+3] psum, min over repetitions.

Localhost TCP is not a data-center network, but the number anchors
everything that is NOT wire time: serialization, the distributed
runtime's per-collective software path, and the cross-process
synchronization.  docs/scaling.md combines it with public DCN
bandwidth for the projection's inter-host leg.

Usage: python tools/measure_halo_rt.py [W2] (default 3072)
Prints one JSON line per payload.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

_WORKER = textwrap.dedent("""
    import os, sys, time, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")

    from jpeg2png_tpu.parallel.distributed import initialize
    pid, count = initialize()
    assert count == 2
    from jax.sharding import Mesh, PartitionSpec as P

    W2 = int(os.environ["JPEG2PNG_HALO_W2"])
    C = 3
    mesh = Mesh(np.array(jax.devices()), ("y",))

    @jax.jit
    @lambda f: jax.shard_map(f, mesh=mesh, in_specs=P("y"),
                             out_specs=(P("y"), P("y")),
                             check_vma=False)
    def halo_step(x):
        # the striped solver's per-iteration collectives: one batched
        # [2C*16, W2] sliver ppermute per direction + the fused [C+3]
        # vector psum
        up = jax.lax.ppermute(x, "y", [(0, 1), (1, 0)])
        dn = jax.lax.ppermute(x, "y", [(1, 0), (0, 1)])
        v = jax.lax.psum(jnp.sum(x[:1, :1, :8]).reshape(1) *
                         jnp.ones((1, C + 3), x.dtype), "y")
        return x + up + dn, v

    # x sharded [2, rows, W2]: each process owns one [2C*16, W2] band
    rows = 2 * C * 16
    x = jnp.ones((2, rows, W2), jnp.float32)
    x = jax.device_put(x, jax.sharding.NamedSharding(mesh, P("y")))
    y, v = halo_step(x); y.block_until_ready()        # compile
    best = float("inf")
    for _ in range(30):
        t0 = time.time()
        y, v = halo_step(x)
        y.block_until_ready()
        best = min(best, time.time() - t0)
    payload = rows * W2 * 4
    if pid == 0:
        print(json.dumps({
            "W2": W2, "payload_bytes_per_dir": payload,
            "round_trip_s": round(best, 6),
            "note": "2 localhost CPU procs; includes one band add"}),
            flush=True)
""")


def main():
    w2 = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "build", "halo_rt_worker.py")
    os.makedirs(os.path.dirname(worker), exist_ok=True)
    with open(worker, "w") as f:
        f.write(_WORKER)
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update({
            "JPEG2PNG_COORDINATOR": f"localhost:{port}",
            "JPEG2PNG_NUM_PROCESSES": "2",
            "JPEG2PNG_PROCESS_ID": str(i),
            "JPEG2PNG_HALO_W2": str(w2),
            "PYTHONPATH": repo + os.pathsep + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        if p.returncode != 0:
            print(out, file=sys.stderr)
            sys.exit(1)
        for line in out.splitlines():
            if line.startswith("{"):
                print(line)


if __name__ == "__main__":
    main()
