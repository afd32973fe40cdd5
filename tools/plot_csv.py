#!/usr/bin/env python
"""Plot convergence CSV logs — the analog of the reference's R script
(notes/plot_csv.r): overlay the objective curves of one or more runs
and report their minima, for regression-checking optimizer changes.

    python tools/plot_csv.py run_a.csv run_b.csv -o compare.png
"""

import argparse
import csv
import sys
from collections import defaultdict


def load(path):
    series = defaultdict(list)   # (filename, channel) -> [objective...]
    with open(path) as f:
        for row in csv.DictReader(f):
            series[(row["filename"], row["channel"])].append(
                float(row["objective"]))
    return series


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="+")
    ap.add_argument("-o", "--output", default="convergence.png")
    args = ap.parse_args()

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        have_mpl = True
    except ImportError:
        have_mpl = False

    if have_mpl:
        fig, ax = plt.subplots(figsize=(8, 5))
    for path in args.csvs:
        for (fname, channel), obj in load(path).items():
            label = f"{path}:{fname}#{channel}"
            print(f"{label}: {len(obj)} iters, "
                  f"final={obj[-1]:.4f}, min={min(obj):.4f}")
            if have_mpl:
                ax.plot(obj, label=label)
    if have_mpl:
        ax.set_xlabel("iteration")
        ax.set_ylabel("objective")
        ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(args.output, dpi=120)
        print(f"wrote {args.output}")
    else:
        print("(matplotlib unavailable — printed summary only)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
