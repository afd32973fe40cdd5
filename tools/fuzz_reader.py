#!/usr/bin/env python
"""Mutation fuzzing of the JPEG coefficient reader (the AFL-recipe
analog, reference notes/afl.txt: `afl-fuzz` over a JPEG corpus with
`-i2 -o /dev/null`).

Takes every fixture JPEG, applies byte-level mutations (bit flips,
byte substitutions, truncations, duplications, marker corruption) and
feeds each mutant to read_jpeg; any outcome other than a clean parse
or a clean ValueError/OSError is a bug (segfaults in the C extension
abort the process and fail the run loudly).

    python tools/fuzz_reader.py [--n 2000] [--seed 0]

A 200-mutant smoke run is wired into the test suite
(tests/test_io.py::test_reader_fuzz_smoke).
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def mutate(data: bytes, rng: np.random.Generator) -> bytes:
    buf = bytearray(data)
    kind = rng.integers(0, 5)
    if kind == 0 and len(buf) > 4:                 # bit flip(s)
        for _ in range(int(rng.integers(1, 8))):
            i = int(rng.integers(0, len(buf)))
            buf[i] ^= 1 << int(rng.integers(0, 8))
    elif kind == 1 and len(buf) > 4:               # byte substitution
        for _ in range(int(rng.integers(1, 16))):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
    elif kind == 2 and len(buf) > 8:               # truncation
        buf = buf[: int(rng.integers(2, len(buf)))]
    elif kind == 3 and len(buf) > 16:              # chunk duplication
        a = int(rng.integers(0, len(buf) - 8))
        b = int(rng.integers(a + 1, min(a + 64, len(buf))))
        at = int(rng.integers(0, len(buf)))
        buf = buf[:at] + buf[a:b] + buf[at:]
    else:                                          # marker corruption
        idxs = [i for i in range(len(buf) - 1) if buf[i] == 0xFF]
        if idxs:
            i = idxs[int(rng.integers(0, len(idxs)))]
            buf[i + 1] = int(rng.integers(0, 256))
    return bytes(buf)


def run(n: int, seed: int, corpus=None, verbose=True) -> int:
    from jpeg2png_tpu.io import read_jpeg

    if corpus is None:
        corpus = sorted(
            (pathlib.Path(__file__).parent.parent / "tests/fixtures"
             ).glob("*.jpg"))
    datas = [p.read_bytes() for p in corpus]
    rng = np.random.default_rng(seed)
    parsed = rejected = 0
    for i in range(n):
        mut = mutate(datas[int(rng.integers(0, len(datas)))], rng)
        try:
            img = read_jpeg(mut)
            # parsed mutants must still be structurally sound
            assert 1 <= img.nchannel <= 3
            for p in img.planes:
                assert p.data.shape == (p.nby, p.nbx, 8, 8)
                assert (p.quant > 0).all()
            parsed += 1
        except (ValueError, OSError):
            rejected += 1
    if verbose:
        print(f"{n} mutants: {parsed} parsed, {rejected} rejected, "
              "0 crashes")
    return parsed


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    sys.exit(0 if run(args.n, args.seed) >= 0 else 1)
