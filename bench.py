#!/usr/bin/env python
"""Headline benchmark: solver throughput at 1000 iterations on one chip.

Prints ONE JSON line:
    {"metric": "mp_iter_per_s", "value": N, "unit": "MP*iter/s",
     "vs_baseline": N}

Baseline: the reference C binary (victorvde/jpeg2png, SSE2+OpenMP
build) decodes the same 512x512 q10 4:2:0 fixture with -i 1000 in
12.52 s on this host's CPU => 20.94 MP*iter/s (see BASELINE.md; the
binary builds from /root/reference with `make`).  vs_baseline is the
speedup over that number.

Method: two warm solves at different iteration counts, differenced, so
the fixed per-call dispatch/transfer overhead of the remote-TPU tunnel
cancels and the number reflects sustained device throughput — the
regime that matters for the batched/serving use-case (BASELINE.json
configs 3-4).  Run with --wall for the conservative total-wall-clock
variant, --quick for a fast smoke test.
"""

import argparse
import json
import pathlib

REFERENCE_MP_ITER_PER_S = 20.94  # 512x512 (0.262144 MP), -i 1000, 12.52 s
FIXTURE = pathlib.Path(__file__).parent / "tests/fixtures/photo512_q10_420.jpg"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="fast smoke test (fewer iterations)")
    ap.add_argument("--wall", action="store_true",
                    help="report total wall clock of one 1000-iter solve "
                         "instead of the marginal rate")
    ap.add_argument("--no-tiers", action="store_true",
                    help="skip the secondary large-canvas tier "
                         "measurement (headline fixture only)")
    args = ap.parse_args()

    from jpeg2png_tpu.io import read_jpeg
    from jpeg2png_tpu.utils.timing import (
        joint_timer, marginal_rate, striped_timer, synth_coefs)

    img = read_jpeg(FIXTURE)
    datas = [p.data for p in img.planes]
    quants = [p.quant for p in img.planes]
    samps = [(p.h_samp, p.w_samp) for p in img.planes]
    mp = (512 * 512) / 1e6

    n1, n2 = (200, 1200) if args.quick else (1000, 3000)
    reps = 3 if args.quick else 5

    timed = joint_timer(datas, quants, samps, reps)
    if args.wall:
        value = mp * n1 / timed(n1)
    else:
        value = marginal_rate(timed, mp, n1, n2)

    out = {
        "metric": "mp_iter_per_s",
        "value": round(value, 1),
        "unit": "MP*iter/s",
        "vs_baseline": round(value / REFERENCE_MP_ITER_PER_S, 2),
    }

    # secondary tier: a 6.29 MP synthetic canvas on the big-canvas
    # path, so the headline (the best-case fused-kernel tier) never
    # overstates the general case.  tools/bench_tiers.py has the full
    # tier table.
    if not args.quick and not args.no_tiers:
        datas6, quants6, samps6 = synth_coefs(256, 384)
        mp6 = 256 * 8 * 384 * 8 / 1e6
        try:
            out["mp_iter_per_s_6mp"] = round(marginal_rate(
                joint_timer(datas6, quants6, samps6, reps=3),
                mp6, 30, 130), 1)
        except Exception:   # noqa: BLE001 - secondary metric only
            out["mp_iter_per_s_6mp"] = None

        # striped-path row (n=1 mesh on the single chip): the per-chip
        # rate of the fused striped body — the multi-chip scaling
        # path's per-chip throughput, captured mechanically so a
        # stripe_grad regression moves a recorded number (VERDICT
        # round-2 item 3)
        try:
            out["mp_iter_per_s_striped_6mp"] = round(marginal_rate(
                striped_timer(datas6, quants6, samps6, reps=3),
                mp6, 30, 130), 1)
        except Exception:   # noqa: BLE001 - secondary metric only
            out["mp_iter_per_s_striped_6mp"] = None

        # giant-image row (BASELINE config 5 size class): a 25.17 MP
        # canvas through the two-lite tier on ONE chip — recorded every
        # round so a large-canvas regression moves a captured number
        # (VERDICT round-3 item 1; tools/bench_tiers.py also probes
        # 100.7 MP)
        try:
            datas25, quants25, samps25 = synth_coefs(768, 512)
            mp25 = 768 * 8 * 512 * 8 / 1e6
            out["mp_iter_per_s_25mp"] = round(marginal_rate(
                joint_timer(datas25, quants25, samps25, reps=3),
                mp25, 10, 40), 1)
        except Exception:   # noqa: BLE001 - secondary metric only
            out["mp_iter_per_s_25mp"] = None

        # HBM-ceiling row (VERDICT round-4 item 5): 50.33 MP through
        # the two-lite tier — ~1.7 GB of state; a regression at the
        # single-chip ceiling moves this recorded number
        # (tools/bench_tiers.py also probes 100.7 MP)
        try:
            datas50, quants50, samps50 = synth_coefs(768, 1024)
            mp50 = 768 * 8 * 1024 * 8 / 1e6
            out["mp_iter_per_s_50mp"] = round(marginal_rate(
                joint_timer(datas50, quants50, samps50, reps=2),
                mp50, 8, 28), 1)
        except Exception:   # noqa: BLE001 - secondary metric only
            out["mp_iter_per_s_50mp"] = None

        # BASELINE config 4: 100 mixed-size files through the batched
        # runner (>= 10 sizes incl. 1-8 MP members spanning all three
        # serving tiers, 8 quant tables, mixed subsampling).
        # files/s and aggregate MP*iter/s are WARM steady-state serving
        # (the cold pass pays bucketing + compilation; the persistent
        # XLA cache makes it cheap after the first round);
        # compiles_warm == 0 is the recompilation-storm gate.
        try:
            from jpeg2png_tpu.utils.compile_cache import (
                enable_persistent_cache)
            from jpeg2png_tpu.utils.timing import mixed_batch_bench
            enable_persistent_cache()
            batched = mixed_batch_bench(
                100, 50, workdir="/tmp/jpeg2png_tpu_corpus")
            out["batched_files_per_s"] = batched["files_per_s"]
            out["batched_mp_iter_per_s"] = batched["mp_iter_per_s"]
            out["batched_n_buckets"] = batched["n_buckets"]
            out["batched_bucket_classes"] = batched["bucket_classes"]
            out["batched_compiles_warm"] = batched["compiles_warm"]
            out["batched_mp_total"] = batched["mp_total"]
            out["batched_stage_breakdown"] = {
                k: batched[k] for k in (
                    "warm_read_s", "warm_solve_s",
                    "upload_mb", "fetch_mb")}
        except Exception:   # noqa: BLE001 - secondary metric only
            out["batched_files_per_s"] = None

    print(json.dumps(out))


if __name__ == "__main__":
    main()
