"""Quality-vs-ground-truth gates.

BASELINE.json north star: "PSNR >= reference against ground truth at
identical -i/-w/-p settings."  tools/quality_eval.py mints the
fixtures under tests/fixtures/quality/ (deterministic ground-truth
image + its JPEG + the reference binary's smoothed output); this test
re-decodes the JPEG with our pipeline and checks, offline:

  1. our PSNR vs ground truth >= the reference's, minus a 0.05 dB
     FP-divergence allowance (trajectories of any two FP
     implementations diverge chaotically — compare solutions, never
     traces; SURVEY.md §2 determinism note), and
  2. smoothing actually beats the plain IDCT decode vs ground truth
     (the product claim, README.md:43-46 — holds on line art AND on
     these photo-class fixtures).
"""

import numpy as np
import pytest
from PIL import Image

from jpeg2png_tpu.io import read_jpeg
from jpeg2png_tpu.pipeline import plain_decode, smooth_decode
from jpeg2png_tpu.utils.config import SolverConfig


def psnr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = ((a - b) ** 2).mean()
    return np.inf if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("name,iters", [
    ("lineart160x120_q20_420", 50),    # the reference's strong case
    ("photo168x128_q30_420", 50),      # photo-class content
    ("lineart160x120_q50_444", 50),    # no-resample geometry
    # BASELINE config 3 coverage (VERDICT round-3 item 6):
    ("lineart160x120_q20_420_i1000", 1000),   # full convergence
    ("photo512x384_q25_420", 50),             # realistic resolution
    # the full sampling matrix at realistic resolution (round-4
    # VERDICT item 7)
    ("photo512x384_q30_444", 50),
    ("lineart512x384_q25_422", 50),
    # photo512x384_q25_420_i1000 (converged AND 512-class) is gated
    # compiled-on-chip in tests.tpu_checks — ~minutes on this CPU path
])
def test_psnr_vs_ground_truth_beats_reference(fixtures_dir, name,
                                              iters):
    qdir = fixtures_dir / "quality"
    gt = np.asarray(Image.open(qdir / f"{name}_gt.png").convert("RGB"))
    ref = np.asarray(
        Image.open(qdir / f"{name}_ref_i{iters}.png").convert("RGB"))
    img = read_jpeg(qdir / f"{name}.jpg")
    ours = smooth_decode(img, SolverConfig(iterations=(iters,) * 3)).pixels
    plain = plain_decode(img)

    psnr_ref = psnr(ref, gt)
    psnr_ours = psnr(ours, gt)
    # (1) the north-star gate
    assert psnr_ours >= psnr_ref - 0.05, (psnr_ours, psnr_ref)
    # (2) smoothing improves on the blocky baseline decode
    assert psnr_ours > psnr(plain, gt) + 0.5
    # and the solutions themselves agree closely (the usual golden bar)
    assert psnr(ours, ref) > 45.0
