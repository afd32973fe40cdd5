"""marginal_rate estimator (jpeg2png_tpu/utils/timing.py).

The estimator feeds bench.py / tools/bench_tiers.py; these pin the
jitter-hardening semantics (median-of-attempts, 2x-wall cap, wall-rate
fallback) with deterministic fake timers.
"""

from jpeg2png_tpu.utils.timing import marginal_rate


def make_timed(times):
    """timed(n) popping successive (t1, t2) pairs from `times`."""
    seq = list(times)

    def timed(n):
        return seq.pop(0)

    return timed


def test_median_of_attempts_rejects_one_lucky_pair():
    # true marginal: 100 iters in 1.0 s => 10 MP*iter/s at mp=0.1.
    # attempt 2's (t1 high, t2 low) pair alone would claim ~33.
    timed = make_timed([
        0.5, 1.5,     # attempt 1: delta 1.0  -> 10.0
        0.8, 1.1,     # attempt 2: delta 0.3  -> 33.3 (jitter)
        0.5, 1.5,     # attempt 3: delta 1.0  -> 10.0
    ])
    rate = marginal_rate(timed, 0.1, 30, 130, attempts=3)
    assert abs(rate - 10.0) < 1e-9


def test_capped_at_twice_wall_rate():
    # every attempt claims a tiny delta; the cap keeps the estimate
    # within 2x of the longer run's wall rate mp*n2/t2 = 13.0
    timed = make_timed([1.0, 1.1] * 3)
    rate = marginal_rate(timed, 0.1, 30, 130, attempts=3)
    assert abs(rate - 2.0 * 0.1 * 130 / 1.1) < 1e-9


def test_wall_rate_fallback_when_no_valid_delta():
    # t2 <= 1.02*t1 on every attempt: jitter swamps the marginal
    timed = make_timed([1.0, 1.0] * 3)
    rate = marginal_rate(timed, 0.1, 30, 130, attempts=3)
    assert abs(rate - 0.1 * 130 / 1.0) < 1e-9
