"""JPEG DCT-coefficient reading (host side).

Wraps the native `_jpegio` extension (libjpeg-backed entropy decode of
baseline/progressive streams, reference: jpeg.c:22-80) into numpy-typed
dataclasses ready to ship to HBM: per component an int16 coefficient
tensor [nby, nbx, 8, 8] in natural order plus its uint16 quant table
[8, 8] and sampling (replication) factors.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import List, Sequence, Union

import numpy as np

from jpeg2png_tpu.io import _jpegio


@dataclasses.dataclass
class CoefPlane:
    """One component's quantized DCT coefficients.

    Mirrors `struct coef` (reference: jpeg2png.h:7-20): `data` is the
    quantized integer lattice, `quant` the quantization table, and
    h_samp/w_samp how many full-res rows/columns one pixel of this
    plane covers (2 for the chroma of a 4:2:0 file).
    """
    data: np.ndarray    # int16 [nby, nbx, 8, 8]
    quant: np.ndarray   # uint16 [8, 8]
    h_samp: int
    w_samp: int

    @property
    def nby(self) -> int:
        return self.data.shape[0]

    @property
    def nbx(self) -> int:
        return self.data.shape[1]

    @property
    def ph(self) -> int:
        return self.nby * 8

    @property
    def pw(self) -> int:
        return self.nbx * 8


@dataclasses.dataclass
class JpegImage:
    height: int          # true image height (pre block-rounding)
    width: int
    progressive: bool
    planes: List[CoefPlane]
    # libjpeg corrupt-data warnings emitted during decode ("Corrupt
    # JPEG data", "Premature end of JPEG file", ...).  The file still
    # decoded; the reference prints these to stderr and keeps going
    # (jpeg.c:14-19 die_output_message).  Capped at 8 texts;
    # n_warnings counts all of them.
    warnings: tuple = ()
    n_warnings: int = 0

    @property
    def nchannel(self) -> int:
        return len(self.planes)


def read_jpeg(src: Union[str, pathlib.Path, bytes],
              print_warnings: bool = True) -> JpegImage:
    """Read DCT coefficients + quant tables from a JPEG file or buffer.

    Raises ValueError with a libjpeg-derived message on malformed input
    (same failure taxonomy as the reference's hardened reader,
    jpeg.c:34-67).  Corrupt-but-decodable input decodes with warnings
    collected on JpegImage.warnings and (like the reference's
    die_output_message, jpeg.c:14-19) printed to stderr unless
    print_warnings=False.
    """
    import sys

    if isinstance(src, (str, pathlib.Path)):
        with open(src, "rb") as f:
            raw = f.read()
    else:
        raw = bytes(src)

    parsed = _jpegio.read_coefficients(raw)
    planes = []
    for comp in parsed["components"]:
        nby, nbx = comp["nby"], comp["nbx"]
        data = np.frombuffer(comp["data"], dtype="<i2").reshape(nby, nbx, 8, 8)
        quant = np.frombuffer(comp["quant"], dtype="<u2").reshape(8, 8)
        planes.append(
            CoefPlane(
                data=np.ascontiguousarray(data),
                quant=np.ascontiguousarray(quant),
                h_samp=comp["h_samp"],
                w_samp=comp["w_samp"],
            )
        )
    warnings = tuple(parsed.get("warnings", ()))
    if print_warnings:
        for w in warnings:
            print(f"libjpeg error: {w}", file=sys.stderr)
    return JpegImage(
        height=parsed["height"],
        width=parsed["width"],
        progressive=bool(parsed["progressive"]),
        planes=planes,
        warnings=warnings,
        n_warnings=int(parsed.get("n_warnings", 0)),
    )


def require_supported(img: JpegImage, strict_reference_compat: bool = False):
    """Component-count policy.

    The reference supports exactly 3-component JPEGs (jpeg.c:34); this
    framework additionally handles grayscale.  With
    strict_reference_compat, mirror the reference's error instead.
    """
    if strict_reference_compat and img.nchannel != 3:
        raise ValueError("only 3 component jpegs are supported")
    if img.nchannel not in (1, 3):
        raise ValueError(
            f"unsupported number of components: {img.nchannel} "
            "(grayscale and YCbCr are supported)"
        )
