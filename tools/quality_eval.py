#!/usr/bin/env python
"""Quality-vs-ground-truth evaluation.

BASELINE.json north star: "Output must match the reference binary's
PNG within PSNR >= reference against ground truth at identical
-i/-w/-p settings."  This tool measures that mechanically:

1. mints deterministic ground-truth images (seeded — line art, the
   reference's strong case per README.md:43-46, and a smooth photo),
2. JPEG-encodes them at a given quality/subsampling,
3. decodes the JPEG three ways — plain IDCT (the libjpeg baseline the
   smoothing is supposed to beat), the reference binary
   (/tmp/refbuild/jpeg2png, see CLAUDE.md for the build recipe), and
   this framework — at identical -i/-w/-p,
4. reports PSNR of each against the ground truth.

Run `python tools/quality_eval.py` for the table (requires the
reference binary), or `--mint` to (re)generate the offline fixtures
under tests/fixtures/quality/ that tests/test_quality.py gates on
without needing the binary.
"""

import argparse
import json
import pathlib
import subprocess
import sys
import tempfile

import numpy as np
from PIL import Image

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REF_BINARY = pathlib.Path("/tmp/refbuild/jpeg2png")
QUALITY_DIR = (pathlib.Path(__file__).resolve().parents[1]
               / "tests/fixtures/quality")

# Evaluation matrix: name -> (ground-truth maker, JPEG quality,
# PIL subsampling id, iterations).  Small sizes keep the CPU test gate
# fast while exercising real 4:2:0 resampling geometry; the 512-class
# and i=1000 rows cover BASELINE config 3 (convergence) at realistic
# resolution (VERDICT round-3 item 6) — the 512x384 i=1000 gate runs
# compiled in tests.tpu_checks (minutes on CPU, seconds on the chip).
CONFIGS = {
    "lineart160x120_q20_420": ("lineart", 160, 120, 20, 2, 50),
    "photo168x128_q30_420": ("photo", 168, 128, 30, 2, 50),
    "lineart160x120_q50_444": ("lineart", 160, 120, 50, 0, 50),
    "lineart160x120_q20_420_i1000": ("lineart", 160, 120, 20, 2, 1000),
    "photo512x384_q25_420": ("photo", 512, 384, 25, 2, 50),
    "photo512x384_q25_420_i1000": ("photo", 512, 384, 25, 2, 1000),
    # 4:4:4 and 4:2:2 at realistic resolution (round-4 VERDICT item
    # 7): the quality table spans the full sampling matrix the e2e
    # golden gates cover, not just 4:2:0 + one thumbnail 4:4:4
    "photo512x384_q30_444": ("photo", 512, 384, 30, 0, 50),
    "lineart512x384_q25_422": ("lineart", 512, 384, 25, 1, 50),
}


def make_lineart(w, h, seed=7):
    """Flat regions, hard edges, thin curves — cartoon/line-art-class
    content, where quantization ringing is worst and the smoother
    shines (README.md:43-44)."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 235.0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    # flat color panels
    img[yy > 0.72 * h] = (70.0, 120.0, 200.0)
    img[(xx > 0.65 * w) & (yy <= 0.72 * h)] = (250.0, 200.0, 60.0)
    # a disc
    cy, cx, r = 0.38 * h, 0.3 * w, 0.22 * min(h, w)
    img[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = (180.0, 40.0, 50.0)
    # thin dark strokes: a sine curve and some straight lines
    curve = (0.5 * h + 0.18 * h * np.sin(xx[0] * 2 * np.pi / w * 3))
    for t in (-1, 0, 1):
        rows = np.clip(np.round(curve) + t, 0, h - 1).astype(int)
        img[rows, np.arange(w)] = 25.0
    for k in range(3):
        x0 = int((0.1 + 0.12 * k) * w)
        img[int(0.05 * h):int(0.3 * h), x0:x0 + 2] = 25.0
    # tiny speckle so flat panels are not bit-identical constants
    img += rng.normal(0, 0.6, img.shape)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def make_photo(w, h, seed=11):
    """Smooth gradients plus low-frequency texture — photo-class
    content (the reference's weak case, README.md:45-46); included so
    the table shows both regimes honestly."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = np.stack([
        120 + 90 * np.sin(2 * np.pi * (xx / w * 0.7 + yy / h * 0.3)),
        128 + 70 * np.cos(2 * np.pi * (yy / h * 0.9)),
        110 + 80 * np.sin(2 * np.pi * (xx / w * 0.4 - yy / h * 0.6)),
    ], axis=-1)
    # low-pass noise texture: random field smoothed by separable box
    noise = rng.normal(0, 28, (h, w, 3))
    for axis in (0, 1):
        for _ in range(3):
            noise = (np.roll(noise, 1, axis) + noise
                     + np.roll(noise, -1, axis)) / 3.0
    img = base + noise
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


MAKERS = {"lineart": make_lineart, "photo": make_photo}


def psnr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = ((a - b) ** 2).mean()
    return float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def encode_jpeg(gt, path, quality, subsampling):
    Image.fromarray(gt).save(path, "JPEG", quality=quality,
                             subsampling=subsampling)


def run_reference(jpg, out_png, iterations):
    subprocess.run(
        [str(REF_BINARY), str(jpg), "-o", str(out_png), "-f",
         "-i", str(iterations), "-q"],
        check=True, capture_output=True)
    return np.asarray(Image.open(out_png).convert("RGB"))


def run_ours(jpg, iterations):
    from jpeg2png_tpu.io import read_jpeg
    from jpeg2png_tpu.pipeline import plain_decode, smooth_decode
    from jpeg2png_tpu.utils.config import SolverConfig
    img = read_jpeg(jpg)
    cfg = SolverConfig(iterations=(iterations,) * 3)
    smoothed = smooth_decode(img, cfg).pixels
    plain = plain_decode(img)
    return smoothed, plain


def evaluate(mint=False, skip_ours=False):
    rows = []
    workdir = QUALITY_DIR if mint else pathlib.Path(tempfile.mkdtemp())
    if mint:
        QUALITY_DIR.mkdir(parents=True, exist_ok=True)
    for name, (kind, w, h, q, sub, iters) in CONFIGS.items():
        gt = MAKERS[kind](w, h)
        jpg = workdir / f"{name}.jpg"
        encode_jpeg(gt, jpg, q, sub)
        ref_png = workdir / f"{name}_ref_i{iters}.png"
        ref = run_reference(jpg, ref_png, iters)
        if mint:
            Image.fromarray(gt).save(workdir / f"{name}_gt.png")
        row = {
            "config": name, "iterations": iters,
            "psnr_reference_vs_gt": round(psnr(ref, gt), 3),
        }
        if not skip_ours:
            ours, plain = run_ours(jpg, iters)
            row.update({
                "psnr_plain_vs_gt": round(psnr(plain, gt), 3),
                "psnr_ours_vs_gt": round(psnr(ours, gt), 3),
                "psnr_ours_vs_reference": round(psnr(ours, ref), 3),
            })
        rows.append(row)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mint", action="store_true",
                    help="write ground-truth/JPEG/reference-output "
                         "fixtures under tests/fixtures/quality/")
    ap.add_argument("--skip-ours", action="store_true",
                    help="mint/reference only (no solves on this host "
                         "— e.g. while the TPU is busy); the PSNR "
                         "gates then run via tests/test_quality.py")
    args = ap.parse_args()
    if not REF_BINARY.exists():
        sys.exit("reference binary missing — build it per CLAUDE.md "
                 "(cp -r /root/reference /tmp/refbuild && make ...)")
    rows = evaluate(mint=args.mint, skip_ours=args.skip_ours)
    for row in rows:
        print(json.dumps(row))
    if not args.skip_ours:
        worst = min(r["psnr_ours_vs_gt"] - r["psnr_reference_vs_gt"]
                    for r in rows)
        print(f"# worst ours-minus-reference margin: {worst:+.3f} dB "
              f"(target: >= 0)")


if __name__ == "__main__":
    main()
