"""Minimal baseline JPEG encoder with ARBITRARY sampling factors.

Exists because no system encoder here can emit exotic chroma layouts:
PIL only does 4:4:4/4:2:2/4:2:0 and cjpeg isn't installed, but the
reference decodes any libjpeg-legal sampling (e.g. 4:4:0 = vertical-
only subsampling, jpeg.c:57-58 computes w_samp/h_samp per component),
so the test suite needs fixtures PIL cannot produce
(tests/fixtures/*_440.jpg).

Standard JFIF baseline: Annex K quant tables scaled by libjpeg's
quality curve, Annex K Huffman tables, interleaved MCUs, byte-stuffed
entropy stream.  Verified round-trip against PIL's decoder and the
reference binary (tests/test_io.py::test_tiny_jpeg_roundtrip).
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K base tables (natural order)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int32).reshape(8, 8)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int32).reshape(8, 8)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# Annex K Huffman specs: (bits[1..16], values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])


def _scale_table(base, quality):
    """libjpeg's quality scaling (jcparam.c semantics)."""
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    t = (base * s + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _huff_codes(bits, values):
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _dct2(block):
    n = np.arange(8)
    c = np.cos((2 * n[:, None] + 1) * n[None, :] * np.pi / 16)
    d = c.T / 2.0
    d[0, :] /= np.sqrt(2.0)
    return d @ block @ d.T


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8

    def flush(self):
        if self.nbits:
            # pad the final partial byte with 1-bits (JPEG convention)
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _magnitude(v):
    a = abs(int(v))
    size = a.bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, int(v) & ((1 << size) - 1)


def encode(rgb: np.ndarray, quality: int = 75,
           sampling=((2, 2), (1, 1), (1, 1))) -> bytes:
    """Encode an [H, W, 3] uint8 RGB array as baseline JFIF JPEG.

    sampling: ((Hy, Vy), (Hcb, Vcb), (Hcr, Vcr)) component sampling
    factors — e.g. ((2,2),(1,1),(1,1)) = 4:2:0,
    ((1,2),(1,1),(1,1)) = 4:4:0 (vertical-only chroma subsampling).
    """
    H, W = rgb.shape[:2]
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    planes3 = [y, cb, cr]

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    qt = [_scale_table(_QL, quality), _scale_table(_QC, quality)]
    qsel = [0, 1, 1]

    # per-component downsample (box) + pad to whole blocks of the MCU grid
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    comps = []
    for ci, (hs, vs) in enumerate(sampling):
        p = planes3[ci]
        fy, fx = vmax // vs, hmax // hs
        if fy > 1 or fx > 1:
            ph = -(-p.shape[0] // fy) * fy
            pw = -(-p.shape[1] // fx) * fx
            p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                       mode="edge")
            p = p.reshape(p.shape[0] // fy, fy,
                          p.shape[1] // fx, fx).mean(axis=(1, 3))
        th, tw = mcuy * vs * 8, mcux * hs * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                   mode="edge")
        comps.append(p)

    dc_codes = [_huff_codes(*_DC_L), _huff_codes(*_DC_C)]
    ac_codes = [_huff_codes(*_AC_L), _huff_codes(*_AC_C)]

    bw = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hs, vs) in enumerate(sampling):
                tsel = 0 if ci == 0 else 1
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = comps[ci][y0:y0 + 8, x0:x0 + 8]
                        coef = np.round(
                            _dct2(blk) / qt[qsel[ci]]).astype(np.int32)
                        zz = coef.flatten()[_ZIGZAG]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        size, bits = _magnitude(diff)
                        code, ln = dc_codes[tsel][size]
                        bw.put(code, ln)
                        if size:
                            bw.put(bits, size)
                        run = 0
                        for kk in range(1, 64):
                            v = int(zz[kk])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_codes[tsel][0xF0]
                                bw.put(code, ln)
                                run -= 16
                            size, bits = _magnitude(v)
                            code, ln = ac_codes[tsel][(run << 4) | size]
                            bw.put(code, ln)
                            bw.put(bits, size)
                            run = 0
                        if run:
                            code, ln = ac_codes[tsel][0x00]
                            bw.put(code, ln)
    bw.flush()

    out = bytearray()
    out += b"\xff\xd8"                                   # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for ti, t in enumerate(qt):
        out += b"\xff\xdb" + struct.pack(">HB", 67, ti)
        out += bytes(int(v) for v in t.flatten()[_ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, H, W, 3)
    for ci, (hs, vs) in enumerate(sampling):
        out += struct.pack("BBB", ci + 1, (hs << 4) | vs, qsel[ci])
    for tc, ti, (bits, values) in ((0, 0, _DC_L), (0, 1, _DC_C),
                                   (1, 0, _AC_L), (1, 1, _AC_C)):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(values), (tc << 4) | ti)
        out += bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for ci in range(3):
        td = 0 if ci == 0 else 1
        out += struct.pack("BB", ci + 1, (td << 4) | td)
    out += bytes([0, 63, 0])
    out += bw.out
    out += b"\xff\xd9"                                   # EOI
    return bytes(out)
