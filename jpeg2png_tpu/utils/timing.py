"""Shared benchmark timing harnesses (bench.py + tools/bench_tiers.py).

The remote-TPU tunnel adds multi-ms jitter per dispatch; every rate
here is a min-over-repetitions marginal between two warm iteration
counts so the fixed overhead cancels (CLAUDE.md: never trust
single-shot marginal timings).
"""

from __future__ import annotations

import time

import numpy as np


def marginal_rate(timed, mp, n1, n2, attempts=3):
    """Marginal MP*iter/s between warm runs at n1 and n2 iterations.

    Tunnel jitter occasionally yields t(n2) <= t(n1); a non-positive
    (or sub-2%) delta is noise, not an infinite rate.  A single lucky
    (t1 high, t2 low) pair inflates the marginal the same way — a
    recorded 6,853 striped figure was really ~3,770 on the device
    trace — so the estimate is the MEDIAN of per-attempt marginals,
    and it is capped at 2x the longer run's wall rate (cancelling the
    fixed dispatch overhead can legitimately push the marginal past 1x
    wall, but the overhead is never most of a 100+-iteration run).  If
    jitter swamps the delta on every attempt, fall back to the wall
    rate itself (a real, conservative measurement) instead of
    fabricating a number."""
    rates = []
    t2 = None
    for _ in range(attempts):
        t1, t2 = timed(n1), timed(n2)
        if t2 > t1 * 1.02:
            rates.append(mp * (n2 - n1) / (t2 - t1))
    if not rates:
        return mp * n2 / t2
    rates.sort()
    return min(rates[(len(rates) - 1) // 2], 2.0 * mp * n2 / t2)


def synth_coefs(nby, nbx, seed=0):
    """Synthetic photo-class 4:2:0 coefficient planes for an
    (nby*8) x (nbx*8) luma canvas."""
    rng = np.random.default_rng(seed)
    datas = [
        rng.integers(-25, 25, (nby, nbx, 8, 8)).astype(np.int16),
        rng.integers(-12, 12, (nby // 2, nbx // 2, 8, 8)).astype(np.int16),
        rng.integers(-12, 12, (nby // 2, nbx // 2, 8, 8)).astype(np.int16),
    ]
    quants = [rng.integers(1, 60, (8, 8)).astype(np.uint16)
              for _ in range(3)]
    return datas, quants, [(1, 1), (2, 2), (2, 2)]


def _preupload(datas, quants):
    """Upload coefficient planes to the device ONCE.

    solve_joint/solve_striped call jnp.asarray on their inputs, a no-op
    for committed device arrays — but for numpy inputs every timed call
    re-uploads ~20-40 MB through the remote-TPU tunnel (~40 MB/s), and
    that 0.3-1 s of jittery transfer swamps the ~0.2 s iteration delta
    the marginal measures (a recorded striped 413 MP*iter/s was really
    3,900 with pre-uploaded inputs)."""
    import jax.numpy as jnp

    return ([jnp.asarray(d) for d in datas],
            [jnp.asarray(q) for q in quants])


def joint_timer(datas, quants, samps, reps):
    """-> timed(iters): best wall seconds of a solve_joint over reps."""
    from jpeg2png_tpu.models.solver import solve_joint

    datas, quants = _preupload(datas, quants)

    def timed(iters):
        best = float("inf")
        fd, m = solve_joint(datas, quants, samps, 0.3, [0.001] * 3, iters)
        np.asarray(m[-1])  # warm compile + sync via a tiny transfer
        for _ in range(reps):
            t0 = time.time()
            fd, m = solve_joint(datas, quants, samps, 0.3, [0.001] * 3,
                                iters)
            np.asarray(m[-1])
            best = min(best, time.time() - t0)
        return best

    return timed


def striped_timer(datas, quants, samps, reps, n_stripes=1):
    """-> timed(iters) for the fused striped body on an n-device mesh."""
    import jax

    from jpeg2png_tpu.parallel.mesh import stripe_mesh
    from jpeg2png_tpu.parallel.stripes import solve_striped

    mesh = stripe_mesh(n_stripes)
    use_pallas = jax.default_backend() == "tpu"
    datas, quants = _preupload(datas, quants)

    def timed(iters):
        best = float("inf")
        fd, m = solve_striped(datas, quants, samps, 0.3, [0.001] * 3,
                              iters, mesh, use_pallas=use_pallas)
        np.asarray(m[-1])
        for _ in range(reps):
            t0 = time.time()
            fd, m = solve_striped(datas, quants, samps, 0.3, [0.001] * 3,
                                  iters, mesh, use_pallas=use_pallas)
            np.asarray(m[-1])
            best = min(best, time.time() - t0)
        return best

    return timed
