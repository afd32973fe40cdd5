"""Command-line interface, flag-for-flag compatible with the reference.

Every flag of jpeg2png (reference: jpeg2png.c:27-117, parsing at
:177-267) is honored with the same names, defaults, validation rules
and output-naming behavior:

  -o/--output, -f/--force, -w/--second-order-weight w[,cb,cr],
  -p/--probability-weight p[,cb,cr], -i/--iterations n[,cb,cr],
  -q/--quiet, -s/--separate-components, -t/--threads,
  -1/--16-bits-png, -c/--csv-log, -h/--help, -V/--version

plus TPU-era extras prefixed --tpu-* (device mesh / sharding knobs).
"""

from __future__ import annotations

import argparse
import concurrent.futures
import os
import sys

from jpeg2png_tpu import __version__
from jpeg2png_tpu.utils.config import (
    DEFAULT_ITERATIONS, DEFAULT_PWEIGHT, DEFAULT_WEIGHT, SolverConfig,
)


def _parse_triple(s: str, conv, what: str):
    parts = s.split(",")
    if len(parts) not in (1, 3):
        raise SystemExit(f"invalid {what}")
    try:
        vals = [conv(p) for p in parts]
    except ValueError:
        raise SystemExit(f"invalid {what}")
    return vals


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="jpeg2png_tpu",
        description="Silky smooth JPEG decoding on TPU — recover the "
        "smoothest image that re-encodes to the input JPEG.",
        epilog="Progress note: the solve runs on-device; the bar's "
        "total counts iterations and advances in resumable device "
        "chunks (per iteration for solves of <= 16 iterations, "
        "roughly 8-50 iterations each beyond that).  In multi-host "
        "runs (--tpu-distributed) the PNG/CSV/progress writers run on "
        "process 0 only, and with --tpu-batch each process solves its "
        "own share of the file list (the CSV then covers process 0's "
        "share).",
        add_help=False,
    )
    p.add_argument("inputs", nargs="*", metavar="picture.jpg")
    p.add_argument("-o", "--output", action="append", default=[],
                   metavar="picture.png",
                   help="output file name; zero times or once per input "
                        "(overwrites when given)")
    p.add_argument("-f", "--force", action="store_true",
                   help="overwrite outputs even without explicit -o")
    p.add_argument("-w", "--second-order-weight", default=None,
                   metavar="weight[,cb,cr]",
                   help=f"TGV weight alpha_1 (default {DEFAULT_WEIGHT}; "
                        "chroma defaults to 0; triple requires -s)")
    p.add_argument("-p", "--probability-weight", default=None,
                   metavar="pweight[,cb,cr]",
                   help=f"DCT distance weight (default {DEFAULT_PWEIGHT})")
    p.add_argument("-i", "--iterations", default=None,
                   metavar="iterations[,cb,cr]",
                   help=f"optimization steps (default {DEFAULT_ITERATIONS}; "
                        "triple requires -s)")
    p.add_argument("-q", "--quiet", action="store_true",
                   help="don't show the progress bar")
    p.add_argument("-s", "--separate-components", action="store_true",
                   help="optimize components separately")
    p.add_argument("-t", "--threads", type=int, default=None,
                   help="max parallelism: host worker threads for "
                        "multi-file IO, and with --tpu-batch also the "
                        "max devices a bucket fans out over (the "
                        "reference's -t bounds OpenMP solve threads; "
                        "here solves are device dispatches, so -t "
                        "bounds both pools)")
    p.add_argument("-1", "--16-bits-png", dest="png16", action="store_true",
                   help="output 16-bit PNG")
    p.add_argument("-c", "--csv-log", default=None, metavar="csv_log",
                   help="write per-iteration optimization log")
    p.add_argument("-h", "--help", action="help",
                   help="display this help text and exit")
    p.add_argument("-V", "--version", action="version",
                   version=f"jpeg2png_tpu version {__version__}")
    # --- TPU-era extras ---
    p.add_argument("--tpu-stripes", type=int, default=0, metavar="N",
                   help="shard each image into N row stripes across "
                        "devices (0 = auto: single device); with -s, "
                        "each channel runs its own striped solve")
    p.add_argument("--tpu-batch", action="store_true",
                   help="solve same-shaped inputs batched in one step")
    p.add_argument("--tpu-distributed", action="store_true",
                   help="join a multi-host run (jax.distributed: "
                        "coordinator/rank from JPEG2PNG_COORDINATOR, "
                        "JPEG2PNG_NUM_PROCESSES, JPEG2PNG_PROCESS_ID, "
                        "or auto-detected on TPU pods); meshes then "
                        "span all hosts' devices")
    return p


def config_from_args(args) -> SolverConfig:
    weights = [DEFAULT_WEIGHT, 0.0, 0.0]
    if args.second_order_weight is not None:
        vals = _parse_triple(args.second_order_weight, float, "weight")
        if len(vals) == 3:
            if not args.separate_components:
                raise SystemExit("different weights are only possible when "
                                 "using separated components")
            weights = vals
        else:
            weights = [vals[0], 0.0, 0.0]

    pweights = [DEFAULT_PWEIGHT] * 3
    if args.probability_weight is not None:
        vals = _parse_triple(args.probability_weight, float,
                             "probability weight")
        pweights = vals if len(vals) == 3 else [vals[0]] * 3

    iterations = [DEFAULT_ITERATIONS] * 3
    if args.iterations is not None:
        vals = _parse_triple(args.iterations, int, "number of iterations")
        if len(vals) == 3:
            if not args.separate_components:
                raise SystemExit("different iteration counts are only "
                                 "possible when using separated components")
            iterations = vals
        else:
            iterations = [vals[0]] * 3

    return SolverConfig(
        weights=tuple(weights),
        pweights=tuple(pweights),
        iterations=tuple(iterations),
        separate_components=args.separate_components,
    )


def derive_output_name(infile: str) -> str:
    """original name with .jpg/.jpeg replaced by .png (jpeg2png.c:291-301)."""
    lower = infile.lower()
    if lower.endswith(".jpeg"):
        return infile[:-5] + ".png"
    if lower.endswith(".jpg"):
        return infile[:-4] + ".png"
    return infile + ".png"


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not args.inputs:
        build_parser().print_help()
        return 1

    cfg = config_from_args(args)
    bits = 16 if args.png16 else 8

    nin = len(args.inputs)
    nout = len(args.output)
    if nout not in (0, nin):
        raise SystemExit("must give output file names for all input files "
                         "or none")

    if nout:
        outfiles = list(args.output)
    else:
        outfiles = []
        for infile in args.inputs:
            if not os.path.exists(infile):
                raise SystemExit(f"could not open input file `{infile}`")
            outfile = derive_output_name(infile)
            if not args.force and os.path.exists(outfile):
                raise SystemExit(f"not overwriting output file `{outfile}`")
            outfiles.append(outfile)

    # lazy imports so --help/--version don't pay for jax startup
    from jpeg2png_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    if args.tpu_distributed:
        from jpeg2png_tpu.parallel.distributed import initialize
        initialize()
    from jpeg2png_tpu.pipeline import decode_file
    from jpeg2png_tpu.utils.logger import ConvergenceLogger
    from jpeg2png_tpu.utils.progress import ProgressBar

    # rank-0-only host side effects in multi-controller runs: one CSV
    # file, one progress bar (jpeg2png.c:162-165's single-writer analog)
    from jpeg2png_tpu.parallel.distributed import is_multi_process, is_primary
    primary = is_primary()
    multi_process = is_multi_process()

    csv_f = open(args.csv_log, "w") if (args.csv_log and primary) else None
    logger = ConvergenceLogger(csv_f)

    batched = args.tpu_batch and nin > 1 and not cfg.separate_components
    nin_bar = nin
    if batched and multi_process:
        # the batched runner partitions files round-robin across
        # processes (runner.py); rank 0's bar only ever ticks for the
        # files rank 0 owns — size it to that share so it completes
        import jax
        nin_bar = len(args.inputs[0::jax.process_count()])
    total = (nin_bar * cfg.iterations[0] if not cfg.separate_components
             else nin * sum(cfg.iterations))
    progress = None if (args.quiet or not primary) else ProgressBar(total)

    failures = 0

    def run_one(pair):
        infile, outfile = pair
        try:
            decode_file(infile, outfile, cfg, bits, logger, progress,
                        stripes=args.tpu_stripes)
            return None
        except (ValueError, OSError) as e:
            return f"{infile}: {e}"

    pairs = list(zip(args.inputs, outfiles))
    errors = []
    if batched:
        # one batched solve per geometry bucket (runner.py), with
        # per-image error isolation: a corrupt member drops out with a
        # stderr line and the rest of the bucket still solves
        import collections
        import threading

        from jpeg2png_tpu.io import write_png
        from jpeg2png_tpu.runner import decode_files_batched

        # PNG encoding streams from the runner's fetch threads
        # (on_pixels) as each image's pixels arrive from the device,
        # overlapping the zlib work with the remaining solves instead
        # of serializing it at the end (VERDICT round-4 item 1)
        outmap = collections.defaultdict(list)
        for infile, outfile in pairs:
            outmap[infile].append(outfile)
        png_errors = []
        png_lock = threading.Lock()

        def on_pixels(infile, pix):
            for outfile in outmap[infile]:
                try:
                    write_png(outfile, pix, bits)
                except (ValueError, OSError) as e:
                    with png_lock:
                        png_errors.append(f"{infile}: {e}")

        # the runner owns progress ticking: dynamic-extent buckets tick
        # per iteration chunk DURING the solve (solve_bucket on_chunk),
        # exact-geometry buckets when each bucket returns
        decode_files_batched(
            args.inputs, cfg, bits,
            io_threads=args.threads or 8, logger=logger, errors=errors,
            data_parallel=args.threads, progress=progress,
            on_pixels=on_pixels)
        errors.extend(png_errors)
    # per-image error isolation: one bad file doesn't kill the batch
    # (improvement over the reference, where die() exits, SURVEY.md §5)
    elif args.threads and args.threads > 1 and nin > 1 and not multi_process:
        # single-process only: in a multi-controller run every rank must
        # reach decode_file's per-file write barrier in the SAME order,
        # which thread scheduling cannot guarantee — those runs fall
        # through to the serial loop below (same file order everywhere)
        with concurrent.futures.ThreadPoolExecutor(args.threads) as pool:
            errors = [e for e in pool.map(run_one, pairs) if e]
    else:
        errors = [e for e in map(run_one, pairs) if e]

    if progress:
        progress.clear()
    if csv_f:
        csv_f.close()
    for e in errors:
        print(f"jpeg2png_tpu: {e}", file=sys.stderr)
        failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
