"""Minimal test-side PNG decoder (all 5 filters, 8/16-bit gray/RGB).

PIL silently downconverts 16-bit RGB PNGs to 8-bit, so golden
comparisons at 16 bits need an independent decoder.  Supports exactly
what the goldens and our writer emit: non-interlaced color type 0/2,
bit depth 8/16.
"""

import struct
import zlib

import numpy as np


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    ihdr = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    w, h, depth, ctype, comp, filt, interlace = ihdr
    assert interlace == 0 and comp == 0 and filt == 0
    assert ctype in (0, 2) and depth in (8, 16)
    nchan = 3 if ctype == 2 else 1
    bpp = nchan * depth // 8          # bytes per pixel
    stride = w * bpp

    raw = zlib.decompress(idat)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    off = 0
    for row in range(h):
        ftype = raw[off]
        line = np.frombuffer(raw[off + 1:off + 1 + stride], np.uint8).astype(np.int32)
        off += 1 + stride
        cur = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = cur[i - bpp] if i >= bpp else 0        # left
            b = prev[i]                                 # up
            c = prev[i - bpp] if i >= bpp else 0       # up-left
            if ftype == 0:
                v = line[i]
            elif ftype == 1:
                v = line[i] + a
            elif ftype == 2:
                v = line[i] + b
            elif ftype == 3:
                v = line[i] + (a + b) // 2
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = line[i] + pr
            else:
                raise ValueError(f"bad filter {ftype}")
            cur[i] = v & 0xFF
        out[row] = cur.astype(np.uint8)
        prev = cur

    if depth == 8:
        img = out.reshape(h, w, nchan)
    else:
        img = out.view(">u2").astype(np.uint16).reshape(h, w, nchan)
    return img[:, :, 0] if nchan == 1 else img
