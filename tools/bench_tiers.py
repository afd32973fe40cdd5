#!/usr/bin/env python
"""Tier-table benchmark: solver throughput across canvas sizes.

Measures the marginal MP*iter/s (min over repetitions of an
n1 -> n2 iteration-count difference, which cancels the remote-tunnel
dispatch overhead — see bench.py) for each solver tier:

    0.26 MP  512x512    whole-solve VMEM kernel (headline fixture)
    1.05 MP  1024x1024  whole-solve VMEM kernel, large
    1.64 MP  1280x1280  whole-solve VMEM kernel at the gate edge
    3.15 MP  2048x1536  big-canvas tier
    6.29 MP  2048x3072  big-canvas tier (the README table row)
   25.17 MP  6144x4096  giant-image class (BASELINE config 5)
  100.66 MP  12288x8192 single-chip ceiling probe (~3.3 GB state)

Prints one JSON line per tier; `--update-readme` is a reminder that
README's tier table is maintained from these numbers.  Large-canvas
timings through the tunnel swing: min over >= 4 repetitions, and run
the whole thing twice when a number looks off (CLAUDE.md).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from jpeg2png_tpu.utils.timing import (  # noqa: E402
    joint_timer, marginal_rate, striped_timer, synth_coefs)


def tier_rate(nby, nbx, n1, n2, reps=4):
    datas, quants, samps = synth_coefs(nby, nbx)
    mp = nby * 8 * nbx * 8 / 1e6
    timed = joint_timer(datas, quants, samps, reps)
    return mp, marginal_rate(timed, mp, n1, n2)


TIERS = [
    ("0.26MP 512x512", 64, 64, 1000, 3000),
    ("1.05MP 1024x1024", 128, 128, 200, 600),
    ("1.64MP 1280x1280", 160, 160, 100, 400),
    ("2.21MP 1536x1440", 192, 180, 60, 260),
    ("3.15MP 2048x1536", 256, 192, 50, 200),
    ("6.29MP 2048x3072", 256, 384, 30, 130),
    # giant-image class (BASELINE config 5): the two-lite tier carries
    # these on ONE chip — measured round 4: 25 MP ~4,100, 50 MP ~4,100,
    # 100.7 MP ~3,800 MP*iter/s (no size cliff; the reference's only
    # ceiling is its RAM guard, jpeg.c:65-67)
    ("25.17MP 6144x4096", 768, 512, 10, 40),
    ("100.66MP 12288x8192", 1536, 1024, 5, 20),
]


def striped_rate(nby, nbx, n1, n2, reps=3):
    """Per-chip rate of the fused striped body on an n=1 mesh."""
    datas, quants, samps = synth_coefs(nby, nbx)
    mp = nby * 8 * nbx * 8 / 1e6
    timed = striped_timer(datas, quants, samps, reps)
    return mp, marginal_rate(timed, mp, n1, n2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    out = {}
    for name, nby, nbx, n1, n2 in TIERS:
        if args.quick:
            n1, n2 = max(n1 // 5, 5), max(n2 // 5, 20)
        mp, rate = tier_rate(nby, nbx, n1, n2)
        out[name] = round(rate, 1)
        print(json.dumps({"tier": name, "mp_iter_per_s": round(rate, 1)}),
              flush=True)
    # striped-path row: 6.29MP band on one chip (the multi-chip path's
    # per-chip rate; VERDICT round-2 item 3)
    n1, n2 = (10, 40) if args.quick else (30, 130)
    mp, rate = striped_rate(256, 384, n1, n2)
    out["6.29MP striped n=1"] = round(rate, 1)
    print(json.dumps({"tier": "6.29MP striped n=1",
                      "mp_iter_per_s": round(rate, 1)}), flush=True)
    print(json.dumps({"tiers": out}))


if __name__ == "__main__":
    main()
