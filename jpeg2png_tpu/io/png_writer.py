"""PNG output (host side).

From-scratch PNG encoder on zlib — no libpng dependency.  Semantics
match the reference writer (reference: png.c:20-78): 8- or 16-bit RGB
(or grayscale, an extension), no interlace, big-endian 16-bit samples.
Color conversion happens on-device in ops/color.py; this module only
packs already-quantized integer pixels into the container format.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # native libpng encoder (faster, GIL-free); zlib path is fallback
    from jpeg2png_tpu.io import _pngio
except ImportError:  # pragma: no cover
    _pngio = None

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, bits: int = 8,
               force_python: bool = False) -> bytes:
    """Encode [H, W, 3] RGB or [H, W] grayscale (uint8/uint16) to PNG.

    Uses the native libpng encoder when built (filtered, GIL-free);
    otherwise a pure zlib path with filter type 0.  16-bit samples are
    written big-endian (png.c:56-61).
    """
    if _pngio is not None and not force_python:
        arr = pixels if pixels.ndim == 3 else pixels[:, :, None]
        h, w, ch = arr.shape
        if ch in (1, 3) and bits in (8, 16):
            raw = (arr.astype("u1", copy=False) if bits == 8
                   else arr.astype(">u2", copy=False))
            return _pngio.encode(
                np.ascontiguousarray(raw).tobytes(), h, w, ch, bits)
    if pixels.ndim == 2:
        color_type = 0
        pixels = pixels[:, :, None]
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        color_type = 2
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")

    h, w, _ = pixels.shape
    if bits == 8:
        raw = pixels.astype("u1", copy=False)
    elif bits == 16:
        raw = pixels.astype(">u2", copy=False)
    else:
        raise ValueError("bits must be 8 or 16")

    body = raw.reshape(h, -1).view("u1")
    # prepend filter byte 0 to each row
    filtered = np.zeros((h, body.shape[1] + 1), dtype="u1")
    filtered[:, 1:] = body

    ihdr = struct.pack(">IIBBBBB", w, h, bits, color_type, 0, 0, 0)
    idat = zlib.compress(filtered.tobytes(), 6)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def write_png(path, pixels: np.ndarray, bits: int = 8) -> None:
    with open(path, "wb") as f:
        f.write(encode_png(pixels, bits))
