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
import time

import numpy as np

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
    from jpeg2png_tpu.models.solver import solve_joint

    img = read_jpeg(FIXTURE)
    datas = [p.data for p in img.planes]
    quants = [p.quant for p in img.planes]
    samps = [(p.h_samp, p.w_samp) for p in img.planes]
    mp = (512 * 512) / 1e6

    n1, n2 = (200, 1200) if args.quick else (1000, 3000)
    reps = 3 if args.quick else 5

    def timed(iters):
        # min over repetitions: the remote-TPU tunnel adds multi-ms
        # jitter per call, and the marginal method amplifies it
        best = float("inf")
        fd, m = solve_joint(datas, quants, samps, 0.3, [0.001] * 3, iters)
        np.asarray(m[-1])  # warm compile + sync via a tiny transfer
        for _ in range(reps):
            t0 = time.time()
            fd, m = solve_joint(datas, quants, samps, 0.3,
                                [0.001] * 3, iters)
            np.asarray(m[-1])
            best = min(best, time.time() - t0)
        return best

    def marginal(timed_fn, mp_, a, b, attempts=3):
        # tunnel jitter occasionally yields t(b) <= t(a); a negative
        # delta is noise, not an infinite rate — retry, then sanity-cap
        # by the longer run's wall rate
        for _ in range(attempts):
            ta, tb = timed_fn(a), timed_fn(b)
            if tb > ta * 1.02:
                break
        rate = mp_ * (b - a) / max(tb - ta, 1e-9)
        return min(rate, 5.0 * mp_ * b / tb)

    if args.wall:
        value = mp * n1 / timed(n1)
    else:
        value = marginal(timed, mp, n1, n2)

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
        try:
            rng = np.random.default_rng(0)
            nby, nbx = 256, 384
            datas6 = [
                rng.integers(-25, 25, (nby, nbx, 8, 8)).astype(np.int16),
                rng.integers(-12, 12, (nby // 2, nbx // 2, 8, 8)
                             ).astype(np.int16),
                rng.integers(-12, 12, (nby // 2, nbx // 2, 8, 8)
                             ).astype(np.int16)]
            quants6 = [rng.integers(1, 60, (8, 8)).astype(np.uint16)
                       for _ in range(3)]
            mp6 = nby * 8 * nbx * 8 / 1e6

            def timed6(iters, reps=3):
                best = float("inf")
                fd, m = solve_joint(datas6, quants6, samps, 0.3,
                                    [0.001] * 3, iters)
                np.asarray(m[-1])
                for _ in range(reps):
                    t0 = time.time()
                    fd, m = solve_joint(datas6, quants6, samps, 0.3,
                                        [0.001] * 3, iters)
                    np.asarray(m[-1])
                    best = min(best, time.time() - t0)
                return best

            out["mp_iter_per_s_6mp"] = round(
                marginal(timed6, mp6, 30, 130), 1)
        except Exception:   # noqa: BLE001 - secondary metric only
            out["mp_iter_per_s_6mp"] = None

        # striped-path row (n=1 mesh on the single chip): the per-chip
        # rate of the fused striped body — the multi-chip scaling
        # path's per-chip throughput, captured mechanically so a
        # stripe_grad regression moves a recorded number (VERDICT
        # round-2 item 3)
        try:
            import jax

            from jpeg2png_tpu.parallel.mesh import stripe_mesh
            from jpeg2png_tpu.parallel.stripes import solve_striped

            mesh1 = stripe_mesh(1)
            use_pallas = jax.default_backend() == "tpu"

            def timed_s(iters, reps=3):
                best = float("inf")
                fd, m = solve_striped(datas6, quants6, samps, 0.3,
                                      [0.001] * 3, iters, mesh1,
                                      use_pallas=use_pallas)
                np.asarray(m[-1])
                for _ in range(reps):
                    t0 = time.time()
                    fd, m = solve_striped(datas6, quants6, samps, 0.3,
                                          [0.001] * 3, iters, mesh1,
                                          use_pallas=use_pallas)
                    np.asarray(m[-1])
                    best = min(best, time.time() - t0)
                return best

            out["mp_iter_per_s_striped_6mp"] = round(
                marginal(timed_s, mp6, 30, 130), 1)
        except Exception:   # noqa: BLE001 - secondary metric only
            out["mp_iter_per_s_striped_6mp"] = None

    print(json.dumps(out))


if __name__ == "__main__":
    main()
