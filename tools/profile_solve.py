#!/usr/bin/env python
"""Per-kernel device-time breakdown of one solve (jax.profiler trace).

Runs a solve at the given canvas size on the current backend, captures
a device trace, and prints the top ops by device time per iteration —
the tool behind the README's tier-breakdown tables (e.g. the 6.29 MP
"grad stencil 1256 us + projection 970 us + carry copies 225 us"
figure).

    python tools/profile_solve.py --nby 256 --nbx 384 --iters 60
    python tools/profile_solve.py --nby 256 --nbx 192 --striped

Works on the real chip (accurate) and on CPU (ops run interpreted /
XLA; useful only for op inventory, not timing).
"""

import argparse
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nby", type=int, default=256,
                    help="luma block rows (canvas H = 8*nby)")
    ap.add_argument("--nbx", type=int, default=384,
                    help="luma block cols (canvas W = 8*nbx)")
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--striped", action="store_true",
                    help="profile the striped body on an n=1 mesh")
    ap.add_argument("--transpose", action="store_true",
                    help="transpose the problem first (orientation "
                         "A/B comparisons; solve_joint already "
                         "transposes landscape canvases itself)")
    ap.add_argument("--top", type=int, default=14)
    ap.add_argument("--trace-dir", default="/tmp/jpeg2png_prof")
    args = ap.parse_args()

    import jax
    import numpy as np

    from jpeg2png_tpu.utils.timing import synth_coefs

    datas, quants, samps = synth_coefs(args.nby, args.nbx)
    if args.transpose:
        from jpeg2png_tpu.models.solver import transpose_problem

        datas, quants, samps = transpose_problem(datas, quants, samps)

    if args.striped:
        from jpeg2png_tpu.parallel.mesh import stripe_mesh
        from jpeg2png_tpu.parallel.stripes import solve_striped

        mesh = stripe_mesh(1)

        def run():
            fd, m = solve_striped(datas, quants, samps, 0.3,
                                  [0.001] * 3, args.iters, mesh)
            np.asarray(m[-1])
    else:
        from jpeg2png_tpu.models.solver import solve_joint

        def run():
            fd, m = solve_joint(datas, quants, samps, 0.3,
                                [0.001] * 3, args.iters)
            np.asarray(m[-1])

    run()                         # warm-up / compile
    shutil.rmtree(args.trace_dir, ignore_errors=True)
    with jax.profiler.trace(args.trace_dir):
        run()

    files = glob.glob(os.path.join(args.trace_dir, "**",
                                   "*.trace.json.gz"), recursive=True)
    if not files:
        sys.exit("no trace produced (backend without profiler?)")
    ev = json.load(gzip.open(files[0]))["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "args" in e}
    dev_pids = [p for p, n in pids.items()
                if "TPU" in n or "tpu" in n.lower() or "/device:" in n]
    if not dev_pids:
        # CPU backend: no device process — aggregate every pid that
        # carries complete ('X') events so the op inventory still prints
        dev_pids = sorted({e["pid"] for e in ev
                           if e.get("ph") == "X" and "pid" in e})
    tot = {}
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tot[e["name"]] = tot.get(e["name"], 0.0) + e.get("dur", 0)
    mp = args.nby * 8 * args.nbx * 8 / 1e6
    print(f"canvas {args.nby * 8}x{args.nbx * 8} ({mp:.2f} MP), "
          f"{args.iters} iters, device pids {dev_pids}")
    for name, d in sorted(tot.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{d / args.iters:9.1f} us/iter  {name}")


if __name__ == "__main__":
    main()
