#!/usr/bin/env python
"""Batched-serving benchmark (BASELINE.json config 4).

Two modes:

  --mixed [N]   (default 100 files) THE config-4 measurement: a
                deterministic mixed-size corpus (>= 10 pixel sizes,
                8 quality levels, 4:2:0/4:2:2/4:4:4) through
                decode_files_batched.  Reports files/s, aggregate
                MP*iter/s, bucket count, and cold/warm compile counts
                (warm must be 0 — the recompilation-storm gate).
                bench.py records the same numbers every round.

  (no flag)     same-geometry B-sweep: aggregate throughput of B
                copies of the 512x512 fixture through one compiled
                artifact — the TPU analog of the reference's
                OpenMP-over-files loop (jpeg2png.c:330-337).

Usage:  python tools/bench_batch.py [--mixed [N]] [--iters N]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

FIXTURE = (pathlib.Path(__file__).resolve().parents[1]
           / "tests/fixtures/photo512_q10_420.jpg")


def same_geometry_sweep(iters):
    import jax
    import jax.numpy as jnp

    from jpeg2png_tpu.io import read_jpeg
    from jpeg2png_tpu.models.solver import (
        ChannelGeometry, _build_solver, _pallas_default)

    img = read_jpeg(FIXTURE)
    datas = [p.data for p in img.planes]
    quants = [p.quant for p in img.planes]
    samps = [(p.h_samp, p.w_samp) for p in img.planes]
    mp = (512 * 512) / 1e6
    C = len(samps)

    geoms = tuple(
        ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
        for d, (sy, sx) in zip(datas, samps))
    solver = _build_solver(geoms, 0.3, (0.001,) * 3, iters, True,
                           "float32", _pallas_default(geoms))

    # NOTE: device->host fetch through the remote-TPU tunnel runs at
    # ~40 MB/s and would dominate; sync on the tiny metrics tail so the
    # number reflects device compute (runner.solve_batched additionally
    # pays one [B,C,H,W] fetch per bucket, amortized across a batch).
    for B in (1, 4, 16):
        sd = [jnp.asarray(np.stack([datas[c]] * B)) for c in range(C)]
        sq = [jnp.asarray(np.stack([quants[c]] * B)) for c in range(C)]
        batched = jax.jit(lambda ds, qs: jax.lax.map(
            lambda t: solver(t[0], t[1]), (ds, qs)))
        fd, m = batched(sd, sq)
        np.asarray(m[:, -1])
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fd, m = batched(sd, sq)
            np.asarray(m[:, -1])
            best = min(best, time.time() - t0)
        rate = B * mp * iters / best
        print(f"B={B:3d}: {best*1e3:8.1f} ms  "
              f"{rate:8.1f} MP*iter/s aggregate  "
              f"({best/B/iters*1e6:6.1f} us/image/iter)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--mixed", nargs="?", const=100, default=None,
                    type=int, metavar="N",
                    help="mixed-size corpus of N files (default 100) "
                         "through decode_files_batched")
    ap.add_argument("--workdir", default="/tmp/jpeg2png_tpu_corpus",
                    help="corpus directory (reused across runs)")
    args = ap.parse_args()

    if args.mixed is not None:
        from jpeg2png_tpu.utils.compile_cache import (
            enable_persistent_cache)
        from jpeg2png_tpu.utils.timing import mixed_batch_bench
        enable_persistent_cache()
        res = mixed_batch_bench(args.mixed, args.iters or 50,
                                workdir=args.workdir)
        print(json.dumps(res))
        return
    same_geometry_sweep(args.iters or 200)


if __name__ == "__main__":
    main()
