"""Baseline JPEG codec — pure stdlib + numpy, no codec library.

Closes the "widest format gap" from the round-2 verdict: JPEG decode
was a stub because the container ships no libjpeg/PIL. Baseline JPEG
(ITU-T T.81) is, however, implementable from the public spec with
nothing but bit twiddling and an 8×8 IDCT:

- :func:`jpeg_encode_blocks` writes genuine JFIF bytes — SOI, APP0,
  DQT, SOF0, DHT (the spec's Annex K luminance Huffman tables), SOS,
  entropy-coded scan with byte stuffing, EOI — for a grayscale image
  whose 8×8 blocks each carry a single DC coefficient.
- :func:`jpeg_decode` is a REAL general baseline decoder: marker
  parser, DQT/DHT readers (canonical Huffman reconstruction), SOF0,
  scan entropy decode (DC prediction, AC run-length, EOB/ZRL, FF00
  unstuffing), dequantize, de-zigzag, float IDCT, level shift, clamp,
  block assembly, edge crop. It decodes any 8-bit single-component
  baseline JPEG, not just the synthetic ones.

Exactness contract (what lets a SQL oracle verify the round trip
bit-for-bit): the synthesis quantizes DC with q₀ = 8, so a DC-only
block's IDCT is the constant dc·q₀/8 = dc and the decoded pixel is
exactly dc + 128 — integer math a SQL oracle can replay. The decoder
itself is general (AC coefficients, any 8-bit quant table); only the
*test fixture* restricts itself to the exactly-representable subset.

Color: 3-component SOF0 with no chroma subsampling (4:4:4 — every
component 1×1 sampling) decodes for real: interleaved MCU entropy
decode with per-component DC predictors and quant tables, then JFIF
YCbCr→RGB (half-up rounding, so a SQL oracle replays it with
``floor(x + 0.5)``). :func:`jpeg_encode_blocks_color` writes matching
3-component JFIF bytes for the DC-only synthetic fixture.

Chroma subsampling (r10 verdict #3 — most real-world JPEGs are
4:2:0): the decoder handles the general interleaved MCU scan for the
full spec-legal factor range 1..4 (4:4:4, 4:2:0, 4:2:2, 4:4:0, 4:1:1,
3:1:1, … — r12 lifted the former 1..2 envelope) — per-MCU hi×vi
blocks per component, MCU-order → block-raster reassembly,
sample-replication chroma upsample ((y·vi)//vmax — T.81 leaves the
upsampling filter to the decoder; replication is the deterministic
choice a SQL oracle replays in closed form).
:func:`jpeg_encode_blocks_420` writes matching 4:2:0 JFIF bytes for
the DC-only synthetic fixture (:func:`synth_420_block_values`).

Restart intervals (DRI/RSTn, r12 — T.81 §B.2.4.4/E.2.4): real-world
camera/libjpeg output emits restart markers routinely, so the decoder
handles them for real — at each restart boundary the entropy stream
byte-aligns, the RSTn marker (modulo-8 sequence VERIFIED, out-of-order
refuses) is consumed, and every DC predictor resets to 0. The writers
take ``restart_interval=N`` (MCUs between markers) and emit the DRI
segment + aligned RSTn markers, so fixtures cover the path end-to-end
with the same closed-form pixel oracle (restart markers change the
bytes, never the pixels).

Progressive (SOF2, r12 — T.81 Annex G): the decoder accumulates scans
into per-component coefficient memory — interleaved DC first scans,
DC successive-approximation refinements (raw bits), AC first scans
with EOBRUN band coding, AC refinements with interleaved correction
bits (G.1.2.3), spectral selection in any banding, restart intervals
inside progressive scans — then reconstructs through the same IDCT
kernel as baseline, so a progressive and a baseline encoding of
identical coefficients decode bit-identically (pinned by tests).
:func:`jpeg_encode_progressive` writes the matching libjpeg-style
scan script (custom AC Huffman table carrying the EOBn symbols
baseline tables lack).

Hierarchical/lossless/arithmetic SOFs raise ``NotImplementedError``
explicitly rather than mis-decoding.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

__all__ = [
    "jpeg_encode_blocks",
    "jpeg_encode_blocks_color",
    "jpeg_encode_blocks_sampled",
    "jpeg_encode_blocks_420",
    "jpeg_encode_progressive",
    "jpeg_decode",
    "synth_block_values",
    "synth_color_block_values",
    "synth_420_block_values",
]

# zigzag scan order: ZIGZAG[k] = flat index (row*8+col) of the k-th
# coefficient in scan order (T.81 figure A.6)
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

# Annex K luminance Huffman tables (T.81 tables K.3/K.5)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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

# quant table: q[0] = 8 makes a DC-only block decode to exactly
# dc + 128 (IDCT of the lone F00 = dc*8 is the constant dc); the other
# entries are an arbitrary valid value — the synthesis never emits AC
Q_TABLE = [8] + [16] * 63


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical Huffman per T.81 C.2."""
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
    """(length, code) -> symbol, for the reader side. Cached: an Arrow
    batch of documents typically shares a handful of Huffman tables
    (libjpeg's defaults, or one synthesizer's), and rebuilding the dict
    per doc was ~30% of decode wall time."""
    return _decode_table_cached(tuple(bits), tuple(vals))


@functools.lru_cache(maxsize=64)
def _decode_table_cached(
    bits: tuple[int, ...], vals: tuple[int, ...]
) -> dict[tuple[int, int], int]:
    return {
        (ln, code): sym
        for sym, (code, ln) in _canonical_codes(list(bits), list(vals)).items()
    }


class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (a 0xFF data
    byte is followed by 0x00 so it can't be mistaken for a marker)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1s (T.81 F.1.2.3) — required
        before a restart marker; a 0xFF pad byte gets stuffed like any
        data byte."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def emit_rst(self, m: int) -> None:
        """Append the RSTm marker bytes (0xFFD0+m) — raw marker, no
        stuffing. Caller must align() first."""
        self.align()
        self.out += bytes([0xFF, 0xD0 + (m & 7)])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader over entropy-coded data: removes FF00
    stuffing, stops at any real marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            # refuse-don't-misparse: truncation inside the entropy
            # stream must be a clean ValueError (r8 media fuzz)
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed data byte
            elif 0xD0 <= nxt <= 0xD7:
                # a restart marker is only legal AT a restart boundary,
                # where restart() consumes it before any bit is read —
                # hitting one mid-entropy means the stream and the
                # declared restart interval disagree
                raise ValueError(
                    "unexpected restart marker inside entropy-coded "
                    "segment (corrupt stream or wrong DRI interval)"
                )
            else:
                raise ValueError("hit marker inside entropy-coded segment")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, length: int) -> int:
        while self.nbits < length:
            self._fill()
        self.nbits -= length
        v = (self.acc >> self.nbits) & ((1 << length) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def restart(self, expect: int) -> None:
        """Consume the RSTn marker at a restart boundary (T.81
        §E.2.4): discard the partial byte (writers pad with 1s), skip
        optional 0xFF fill bytes, and VERIFY the modulo-8 restart
        sequence number — an out-of-order RSTn means lost data and
        refuses rather than desynchronizing every later block."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG: expected restart marker")
        if self.data[self.pos] != 0xFF:
            raise ValueError(
                f"expected RST{expect} marker at restart boundary "
                f"(byte {self.pos})"
            )
        p = self.pos + 1
        while self.data[p] == 0xFF:  # B.1.1.2 fill bytes
            p += 1
            if p >= len(self.data):
                raise ValueError("truncated JPEG: expected restart marker")
        m = self.data[p]
        if not (0xD0 <= m <= 0xD7):
            raise ValueError(
                f"expected RST{expect} marker, found 0xFF{m:02X}"
            )
        if m - 0xD0 != expect & 7:
            raise ValueError(
                f"restart marker out of sequence: expected "
                f"RST{expect & 7}, got RST{m - 0xD0}"
            )
        self.pos = p + 1


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map `size` raw bits to the signed coefficient."""
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">HH", tag, len(body) + 2) + body


def jpeg_encode_blocks(
    dc_values: list[int],
    blocks_x: int,
    width: int,
    height: int,
    restart_interval: int = 0,
) -> bytes:
    """Genuine grayscale baseline JFIF bytes for an image of DC-only
    8×8 blocks: ``dc_values`` in raster block order (``blocks_x`` per
    row), each quantized-DC in [-128, 127]. Any baseline decoder
    accepts the output; :func:`jpeg_decode` round-trips it to blocks
    of the constant pixel dc + 128. ``restart_interval=N`` (r12)
    additionally writes the DRI segment and an aligned RSTn marker
    every N MCUs (= blocks here) with DC predictors reset — same
    pixels, restart-exercising bytes."""
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    prev = 0
    rst = 0
    for bi, dc in enumerate(dc_values):
        if restart_interval and bi and bi % restart_interval == 0:
            w.emit_rst(rst)
            rst = (rst + 1) % 8
            prev = 0
        diff = dc - prev
        prev = dc
        s = _category(diff)
        code, ln = dc_codes[s]
        w.write(code, ln)
        if s:
            w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        eob, eln = ac_codes[0x00]
        w.write(eob, eln)
    scan = w.flush()

    # DQT body: Pq/Tq nibble byte then 64 entries in zigzag order
    dqt = bytes([0x00]) + bytes(Q_TABLE[ZIGZAG[k]] for k in range(64))
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    dht = (
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
        + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    )
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    dri = (
        _marker(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + _marker(0xFFE0, app0)
        + _marker(0xFFDB, dqt)
        + _marker(0xFFC0, sof0)
        + _marker(0xFFC4, dht)
        + dri
        + _marker(0xFFDA, sos)
        + scan
        + b"\xff\xd9"
    )


def jpeg_encode_blocks_color(
    dc_y: list[int],
    dc_cb: list[int],
    dc_cr: list[int],
    blocks_x: int,
    width: int,
    height: int,
) -> bytes:
    """Genuine 3-component 4:4:4 baseline JFIF bytes for an image of
    DC-only 8×8 blocks: per-component quantized DCs in raster block
    order. All components share quant table 0 and the Annex K Huffman
    tables (Td=Ta=0 — legal per T.81); MCUs interleave (Y, Cb, Cr) one
    block each, with independent DC predictors."""
    if not len(dc_y) == len(dc_cb) == len(dc_cr):
        raise ValueError("component DC lists must have equal length")
    # all-1×1 specialization of the general sampled writer (r11): one
    # 8×8 MCU per block position interleaving (Y, Cb, Cr) — the same
    # scan order, markers, and tables, so the bytes are identical to
    # the pre-r11 dedicated writer (pinned by the color round-trip
    # tests and the jpeg_color_decode oracle row)
    return jpeg_encode_blocks_sampled(
        [dc_y, dc_cb, dc_cr],
        [(1, 1), (1, 1), (1, 1)],
        blocks_x,
        width,
        height,
    )


def jpeg_encode_blocks_sampled(
    dc_planes: list[list[int]],
    factors: list[tuple[int, int]],
    mcus_x: int,
    width: int,
    height: int,
    restart_interval: int = 0,
) -> bytes:
    """Genuine 3-component SAMPLED baseline JFIF bytes for an image of
    DC-only 8×8 blocks: component ci has sampling factors ``factors
    [ci] = (hi, vi)`` and contributes hi×vi blocks per MCU (raster
    within the MCU); ``dc_planes[ci]`` is that component's full block
    grid in raster order (mcus_x·hi wide). The writer maps raster →
    interleaved MCU scan order. All components share quant table 0 and
    the Annex K Huffman tables (legal per T.81).
    ``restart_interval=N`` (r12) writes DRI + an aligned RSTn marker
    every N MCUs with all DC predictors reset."""
    if len(dc_planes) != 3 or len(factors) != 3:
        raise ValueError("exactly 3 components (Y, Cb, Cr)")
    n_mcus = len(dc_planes[0]) // (factors[0][0] * factors[0][1])
    if n_mcus % mcus_x:
        raise ValueError("block grid not divisible by mcus_x")
    mcus_y = n_mcus // mcus_x
    for ci, ((hi, vi), dcs) in enumerate(zip(factors, dc_planes)):
        if len(dcs) != n_mcus * hi * vi:
            raise ValueError(f"component {ci}: {len(dcs)} blocks, "
                             f"expected {n_mcus * hi * vi}")
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    prevs = [0, 0, 0]

    def put(ci: int, dc: int) -> None:
        diff = dc - prevs[ci]
        prevs[ci] = dc
        s = _category(diff)
        code, ln = dc_codes[s]
        w.write(code, ln)
        if s:
            w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        eob, eln = ac_codes[0x00]
        w.write(eob, eln)

    rst = 0
    for mi in range(mcus_y * mcus_x):
        my, mx = divmod(mi, mcus_x)
        if restart_interval and mi and mi % restart_interval == 0:
            w.emit_rst(rst)
            rst = (rst + 1) % 8
            prevs[:] = [0, 0, 0]
        for ci, (hi, vi) in enumerate(factors):
            bx_c = mcus_x * hi
            for iy in range(vi):
                for ix in range(hi):
                    put(ci, dc_planes[ci][(my * vi + iy) * bx_c + mx * hi + ix])
    scan = w.flush()

    dqt = bytes([0x00]) + bytes(Q_TABLE[ZIGZAG[k]] for k in range(64))
    comp_spec = []
    for ci, (hi, vi) in enumerate(factors):
        comp_spec += [ci + 1, (hi << 4) | vi, 0]
    sof0 = struct.pack(">BHHB", 8, height, width, 3) + bytes(comp_spec)
    dht = (
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
        + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    )
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    dri = (
        _marker(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + _marker(0xFFE0, app0)
        + _marker(0xFFDB, dqt)
        + _marker(0xFFC0, sof0)
        + _marker(0xFFC4, dht)
        + dri
        + _marker(0xFFDA, sos)
        + scan
        + b"\xff\xd9"
    )


def jpeg_encode_blocks_420(
    dc_y: list[int],
    dc_cb: list[int],
    dc_cr: list[int],
    mcus_x: int,
    width: int,
    height: int,
    restart_interval: int = 0,
) -> bytes:
    """4:2:0 (Y 2×2, chroma 1×1 — each 16×16 MCU interleaves four Y
    blocks then one Cb and one Cr) specialization of
    :func:`jpeg_encode_blocks_sampled` — the subsampling most
    real-world JPEGs use."""
    if len(dc_cb) != len(dc_cr):
        raise ValueError("chroma DC lists must have equal length")
    if len(dc_y) != 4 * len(dc_cb):
        raise ValueError("4:2:0 needs 4 Y blocks per chroma block")
    return jpeg_encode_blocks_sampled(
        [dc_y, dc_cb, dc_cr],
        [(2, 2), (1, 1), (1, 1)],
        mcus_x,
        width,
        height,
        restart_interval=restart_interval,
    )


# Progressive AC Huffman table: the Annex K baseline AC table has no
# EOBn (r<<4, r>0) symbols, which progressive band coding requires —
# so progressive scans ship this uniform 8-bit canonical table covering
# every symbol the encoder can emit: EOB0..EOB14 (0x00..0xE0), ZRL
# (0xF0), and (r, s) for r 0..15 / s 1..10 — 176 symbols, Kraft sum
# 176/256, all-ones code unused. The decoder reads whatever DHT the
# stream carries, so this choice is an encoder detail only.
PROG_AC_VALS = (
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
PROG_AC_BITS = [0] * 7 + [len(PROG_AC_VALS)] + [0] * 8


def _prog_scan_header(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(comp_ids)])
    for cid in comp_ids:
        body += bytes([cid, 0x00])  # Td = Ta = 0
    return _marker(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))


class _ProgressiveWriter:
    """Entropy writer for one progressive scan: wraps _BitWriter with
    EOBRUN accumulation and the pending-correction-bit FIFO the AC
    refinement coding needs (T.81 G.1.2.3: the EOBn symbol is emitted
    first, then the correction bits of the blocks it covers, in
    traversal order)."""

    def __init__(self, dc_codes, ac_codes):
        self.w = _BitWriter()
        self.dc = dc_codes
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []

    def sym_ac(self, sym: int) -> None:
        code, ln = self.ac[sym]
        self.w.write(code, ln)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = min(14, self.eobrun.bit_length() - 1)
            self.sym_ac(r << 4)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
        for bit in self.pending:
            self.w.write(bit, 1)
        self.eobrun = 0
        self.pending = []

    def restart(self, seq: int) -> None:
        self.flush_eobrun()
        self.w.emit_rst(seq)


def jpeg_encode_progressive(
    coeff_planes,
    factors: list[tuple[int, int]],
    mcus_x: int,
    width: int,
    height: int,
    dc_al: int = 1,
    ac_al: int = 1,
    bands: tuple = ((1, 63),),
    restart_interval: int = 0,
) -> bytes:
    """Genuine progressive (SOF2) JFIF bytes from per-component
    QUANTIZED zigzag coefficient blocks — the full successive-
    approximation scan script libjpeg-style output uses:

    1. interleaved DC first scan at Al=dc_al,
    2. DC refinement scans down to Al=0 (one raw bit per block),
    3. per-component AC first scans per spectral ``band`` at Al=ac_al
       (EOBRUN band coding),
    4. per-component AC refinement scans down to Al=0 (correction-bit
       coding per T.81 G.1.2.3).

    ``coeff_planes[ci]`` is component ci's blocks in PADDED-grid
    raster order (``mcus_x·hi`` per row), each a 64-int zigzag row —
    the same coefficient relation a baseline encoder would entropy-
    code directly, which is what makes the progressive/baseline
    decode-equality test meaningful. ``restart_interval=N`` emits
    DRI + RSTn in every scan (DC predictors and EOBRUN reset, pending
    correction bits flushed before the marker)."""
    ncomp = len(coeff_planes)
    if ncomp not in (1, 3) or len(factors) != ncomp:
        raise ValueError("1 or 3 components with matching factors")
    if dc_al < 0 or ac_al < 0 or dc_al > 13 or ac_al > 13:
        raise ValueError("successive-approximation Al must be in 0..13")
    h0, v0 = factors[0]
    n_mcus = len(coeff_planes[0]) // (h0 * v0)
    if n_mcus % mcus_x:
        raise ValueError("block grid not divisible by mcus_x")
    mcus_y = n_mcus // mcus_x
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    planes = [np.asarray(p, dtype=np.int64).reshape(-1, 64) for p in coeff_planes]
    for ci, ((hi, vi), pl) in enumerate(zip(factors, planes)):
        if len(pl) != n_mcus * hi * vi:
            raise ValueError(
                f"component {ci}: {len(pl)} blocks, expected {n_mcus * hi * vi}"
            )
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)

    # per-component non-interleaved grids (AC scans) over padded grids
    grids = []
    for hi, vi in factors:
        nbx_pad = mcus_x * hi
        cw = -(-width * hi // hmax)
        ch = -(-height * vi // vmax)
        grids.append((nbx_pad, -(-cw // 8), -(-ch // 8)))

    def dc_first_scan() -> bytes:
        pw = _ProgressiveWriter(dc_codes, ac_codes)
        preds = [0] * ncomp
        rst = 0
        for m in range(n_mcus):
            if restart_interval and m and m % restart_interval == 0:
                pw.w.emit_rst(rst)
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            my, mx = divmod(m, mcus_x)
            for ci, (hi, vi) in enumerate(factors):
                nbx = mcus_x * hi
                for iy in range(vi):
                    for ix in range(hi):
                        b = (my * vi + iy) * nbx + mx * hi + ix
                        v = int(planes[ci][b, 0]) >> dc_al
                        diff = v - preds[ci]
                        preds[ci] = v
                        s = _category(diff)
                        code, ln = dc_codes[s]
                        pw.w.write(code, ln)
                        if s:
                            pw.w.write(
                                diff if diff >= 0 else diff + (1 << s) - 1, s
                            )
        comp_ids = list(range(1, ncomp + 1))
        return _prog_scan_header(comp_ids, 0, 0, 0, dc_al) + pw.w.flush()

    def dc_refine_scan(al: int) -> bytes:
        pw = _ProgressiveWriter(dc_codes, ac_codes)
        rst = 0
        for m in range(n_mcus):
            if restart_interval and m and m % restart_interval == 0:
                pw.w.emit_rst(rst)
                rst = (rst + 1) % 8
            my, mx = divmod(m, mcus_x)
            for ci, (hi, vi) in enumerate(factors):
                nbx = mcus_x * hi
                for iy in range(vi):
                    for ix in range(hi):
                        b = (my * vi + iy) * nbx + mx * hi + ix
                        pw.w.write((int(planes[ci][b, 0]) >> al) & 1, 1)
        comp_ids = list(range(1, ncomp + 1))
        return _prog_scan_header(comp_ids, 0, 0, al + 1, al) + pw.w.flush()

    def _blocks_non_interleaved(ci: int):
        nbx_pad, nbx, nby = grids[ci]
        for b in range(nbx * nby):
            by, bx = divmod(b, nbx)
            yield b, by * nbx_pad + bx

    def ac_first_scan(ci: int, ss: int, se: int) -> bytes:
        pw = _ProgressiveWriter(dc_codes, ac_codes)
        rst = 0
        for b, idx in _blocks_non_interleaved(ci):
            if restart_interval and b and b % restart_interval == 0:
                pw.restart(rst)
                rst = (rst + 1) % 8
            row = planes[ci][idx]
            r = 0
            emitted = False
            for k in range(ss, se + 1):
                c = int(row[k])
                t = (abs(c) >> ac_al) * (1 if c >= 0 else -1)
                if t == 0:
                    r += 1
                    continue
                pw.flush_eobrun()
                while r > 15:
                    pw.sym_ac(0xF0)
                    r -= 16
                s = _category(t)
                pw.sym_ac((r << 4) | s)
                pw.w.write(t if t >= 0 else t + (1 << s) - 1, s)
                r = 0
                emitted = True
            if r > 0 or not emitted:
                pw.eobrun += 1
                if pw.eobrun == 0x7FFF:
                    pw.flush_eobrun()
        pw.flush_eobrun()
        return _prog_scan_header([ci + 1], ss, se, 0, ac_al) + pw.w.flush()

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        ah = al + 1
        pw = _ProgressiveWriter(dc_codes, ac_codes)
        rst = 0
        for b, idx in _blocks_non_interleaved(ci):
            if restart_interval and b and b % restart_interval == 0:
                pw.restart(rst)
                rst = (rst + 1) % 8
            row = planes[ci][idx]
            r = 0
            cur: list[int] = []
            for k in range(ss, se + 1):
                c = int(row[k])
                prev = abs(c) >> ah
                now = abs(c) >> al
                if prev != 0:  # already significant: correction bit
                    cur.append(now & 1)
                    continue
                if now == 0:
                    r += 1
                    if r == 16:
                        pw.flush_eobrun()
                        pw.sym_ac(0xF0)
                        for bit in cur:
                            pw.w.write(bit, 1)
                        cur = []
                        r = 0
                    continue
                # newly significant (|now| is exactly 1 here)
                pw.flush_eobrun()
                pw.sym_ac((r << 4) | 1)
                pw.w.write(1 if c > 0 else 0, 1)
                for bit in cur:
                    pw.w.write(bit, 1)
                cur = []
                r = 0
            if r > 0 or cur:
                pw.eobrun += 1
                pw.pending.extend(cur)
                if pw.eobrun == 0x7FFF:
                    pw.flush_eobrun()
        pw.flush_eobrun()
        return _prog_scan_header([ci + 1], ss, se, ah, al) + pw.w.flush()

    dqt = bytes([0x00]) + bytes(Q_TABLE[ZIGZAG[k]] for k in range(64))
    comp_spec = []
    for ci, (hi, vi) in enumerate(factors):
        comp_spec += [ci + 1, (hi << 4) | vi, 0]
    sof2 = struct.pack(">BHHB", 8, height, width, ncomp) + bytes(comp_spec)
    dht = (
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
        + bytes([0x10]) + bytes(PROG_AC_BITS) + bytes(PROG_AC_VALS)
    )
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    out = (
        b"\xff\xd8"
        + _marker(0xFFE0, app0)
        + _marker(0xFFDB, dqt)
        + _marker(0xFFC2, sof2)
        + _marker(0xFFC4, dht)
    )
    if restart_interval:
        out += _marker(0xFFDD, struct.pack(">H", restart_interval))
    out += dc_first_scan()
    for al in range(dc_al - 1, -1, -1):
        out += dc_refine_scan(al)
    for ci in range(ncomp):
        for ss, se in bands:
            out += ac_first_scan(ci, ss, se)
    for al in range(ac_al - 1, -1, -1):
        for ci in range(ncomp):
            for ss, se in bands:
                out += ac_refine_scan(ci, ss, se, al)
    return out + b"\xff\xd9"


# IDCT basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16); block = Aᵀ F A
_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0) / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _idct_plane(coeff_rows, q: np.ndarray, nbx: int, nby: int) -> np.ndarray:
    """Dequant + de-zigzag + IDCT batched across ALL blocks of a
    component — one scatter and one broadcast matmul chain (block =
    Aᵀ F A), never per-block matmuls. Shared by the baseline scan
    decoder and the progressive reconstruction."""
    nb = nbx * nby
    coeffs = np.asarray(coeff_rows, dtype=np.float64)
    fq = np.zeros((nb, 64), dtype=np.float64)
    fq[:, ZIGZAG] = coeffs * q[ZIGZAG]
    blocks = _A.T @ fq.reshape(nb, 8, 8) @ _A
    pix = np.clip(np.round(blocks + 128.0), 0, 255).astype(np.uint8)
    return (
        pix.reshape(nby, nbx, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(nby * 8, nbx * 8)
    )


def _ycbcr_rgb(planes: list[np.ndarray]) -> np.ndarray:
    """JFIF YCbCr→RGB on level-shifted integer samples; half-up
    rounding (floor(x + 0.5)) so a SQL oracle can replay the
    conversion exactly in closed form."""
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64)
    cr = planes[2].astype(np.float64)
    rgb = np.stack(
        [
            np.floor(y + 1.402 * (cr - 128.0) + 0.5),
            np.floor(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5),
            np.floor(y + 1.772 * (cb - 128.0) + 0.5),
        ],
        axis=-1,
    )
    return np.clip(rgb, 0, 255).astype(np.uint8)


class _ProgressiveFrame:
    """Coefficient memory + scan decoder for progressive JPEG (SOF2,
    T.81 Annex G) — the format most web/photo pipeline output uses
    alongside baseline. Scans accumulate into per-component zigzag
    coefficient arrays: DC first (interleaved MCU order or single-
    component raster), DC successive-approximation refinement (one raw
    bit per block), AC first with EOBRUN band coding, and AC
    refinement with interleaved correction bits (G.1.2.3). After EOI
    the accumulated coefficients dequantize + IDCT through the same
    shared kernel as the baseline path, so a progressive and a
    baseline encoding of identical coefficients decode bit-identically
    (pinned by tests)."""

    def __init__(self, comps, width, height):
        self.comps = comps  # (cid, hi, vi, tqi)
        self.width, self.height = width, height
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcux = -(-width // (8 * self.hmax))
        self.mcuy = -(-height // (8 * self.vmax))
        self.grids = []  # (nbx_pad, nby_pad, nbx_non, nby_non)
        self.coeff = []
        for _cid, hi, vi, _tqi in comps:
            nbx_pad, nby_pad = self.mcux * hi, self.mcuy * vi
            cw = -(-width * hi // self.hmax)
            ch = -(-height * vi // self.vmax)
            self.grids.append((nbx_pad, nby_pad, -(-cw // 8), -(-ch // 8)))
            self.coeff.append(
                np.zeros((nbx_pad * nby_pad, 64), dtype=np.int64)
            )

    def decode_scan(self, data, pos, body, htables, restart_interval):
        """Decode one SOS's entropy data into the coefficient store;
        returns the byte position of the next marker."""
        ns = body[0]
        if len(body) < 4 + 2 * ns:
            raise ValueError("truncated SOS segment")
        ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
        ah, al = ahal >> 4, ahal & 0x0F
        if ss > se or se > 63:
            raise ValueError(f"illegal spectral band {ss}..{se}")
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se = 0")
        if ss > 0 and ns != 1:
            raise ValueError("progressive AC scans must be non-interleaved")
        cid_idx = {c[0]: i for i, c in enumerate(self.comps)}
        scomp = []  # (frame index, dc table | None, ac table | None)
        for i in range(ns):
            cs, tda = body[1 + 2 * i], body[2 + 2 * i]
            if cs not in cid_idx:
                raise ValueError(f"SOS references undefined component {cs}")
            dc_t = ac_t = None
            if ss == 0 and ah == 0:
                if (0, tda >> 4) not in htables:
                    raise ValueError("SOS references undefined Huffman table")
                dc_t = htables[(0, tda >> 4)]
            if ss > 0:
                if (1, tda & 0x0F) not in htables:
                    raise ValueError("SOS references undefined Huffman table")
                ac_t = htables[(1, tda & 0x0F)]
            scomp.append((cid_idx[cs], dc_t, ac_t))
        if ns > 1 and ns != len(self.comps):
            raise NotImplementedError(
                "progressive DC scans must cover one or all components"
            )
        reader = _BitReader(data, pos)
        self._eobrun = 0
        if ss == 0 and ns == len(self.comps) and ns > 1:
            self._dc_interleaved(reader, scomp, ah, al, restart_interval)
        else:
            self._single_component(reader, scomp[0], ss, se, ah, al,
                                   restart_interval)
        # entropy data ends at the next marker: skip unread pad bytes,
        # including a stuffed 0xFF00 pad (all-ones padding that formed
        # 0xFF gets byte-stuffed like any data byte)
        p = reader.pos
        while p < len(data):
            if data[p] == 0xFF:
                if p + 1 < len(data) and data[p + 1] == 0x00:
                    p += 2
                    continue
                break
            p += 1
        return p

    def _dc_interleaved(self, reader, scomp, ah, al, ri):
        preds = [0] * len(scomp)
        for m in range(self.mcux * self.mcuy):
            if ri and m and m % ri == 0:
                reader.restart((m // ri - 1) % 8)
                preds = [0] * len(scomp)
            my, mx = divmod(m, self.mcux)
            for si, (fi, dc_t, _ac) in enumerate(scomp):
                _cid, hi, vi, _tqi = self.comps[fi]
                nbx = self.grids[fi][0]
                for iy in range(vi):
                    for ix in range(hi):
                        b = (my * vi + iy) * nbx + mx * hi + ix
                        self._dc_block(reader, fi, b, si, preds, dc_t, ah, al)

    def _single_component(self, reader, sc, ss, se, ah, al, ri):
        fi, dc_t, ac_t = sc
        nbx_pad, _nby_pad, nbx, nby = self.grids[fi]
        preds = [0]
        for b in range(nbx * nby):
            if ri and b and b % ri == 0:
                reader.restart((b // ri - 1) % 8)
                preds = [0]
                self._eobrun = 0
            by, bx = divmod(b, nbx)
            idx = by * nbx_pad + bx
            if ss == 0:
                self._dc_block(reader, fi, idx, 0, preds, dc_t, ah, al)
            elif ah == 0:
                self._ac_first_block(reader, fi, idx, ac_t, ss, se, al)
            else:
                self._ac_refine_block(reader, fi, idx, ac_t, ss, se, al)

    def _dc_block(self, reader, fi, b, si, preds, dc_t, ah, al):
        coef = self.coeff[fi]
        if ah == 0:
            s = reader.read_symbol(dc_t)
            diff = _extend(reader.read(s), s) if s else 0
            preds[si] += diff
            coef[b, 0] = preds[si] << al
        else:  # refinement: one raw bit, additive at this precision
            coef[b, 0] += reader.read(1) << al

    def _ac_first_block(self, reader, fi, b, ac_t, ss, se, al):
        if self._eobrun > 0:
            self._eobrun -= 1
            return
        coef = self.coeff[fi]
        k = ss
        while k <= se:
            sym = reader.read_symbol(ac_t)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                self._eobrun = (1 << r) - 1
                if r:
                    self._eobrun += reader.read(r)
                return
            k += r
            if k > se:
                raise ValueError("AC run past end of spectral band")
            coef[b, k] = _extend(reader.read(s), s) << al
            k += 1

    def _ac_refine_block(self, reader, fi, b, ac_t, ss, se, al):
        """T.81 G.1.2.3 AC successive-approximation refinement: runs
        count ZERO-HISTORY positions only; every nonzero-history
        coefficient crossed consumes one correction bit; an EOB run
        still consumes correction bits for the band's remaining
        nonzero coefficients."""
        coef = self.coeff[fi]
        p1, m1 = 1 << al, -1 << al

        def correct(k):
            if reader.read(1) and not (abs(int(coef[b, k])) & p1):
                coef[b, k] += p1 if coef[b, k] >= 0 else m1

        k = ss
        if self._eobrun == 0:
            while k <= se:
                sym = reader.read_symbol(ac_t)
                r, s = sym >> 4, sym & 0x0F
                if s == 0 and r != 15:
                    # NOT pre-decremented (unlike the first-scan path):
                    # the CURRENT block still consumes correction bits
                    # for its remaining nonzero coefficients in the
                    # eobrun sweep below, then counts itself off
                    self._eobrun = 1 << r
                    if r:
                        self._eobrun += reader.read(r)
                    break
                if s == 0:  # ZRL: 16 zero-history positions
                    val = 0
                else:
                    if s != 1:
                        raise ValueError(
                            "AC refinement magnitude must be 1"
                        )
                    val = p1 if reader.read(1) else m1
                while k <= se:
                    if coef[b, k] != 0:
                        correct(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if k > se and val:
                    raise ValueError("AC refinement run past band end")
                if val:
                    coef[b, k] = val
                k += 1
        if self._eobrun > 0:
            while k <= se:
                if coef[b, k] != 0:
                    correct(k)
                k += 1
            self._eobrun -= 1

    def reconstruct(self, qtables) -> np.ndarray:
        planes = []
        for fi, (_cid, hi, vi, tqi) in enumerate(self.comps):
            if tqi not in qtables:
                raise ValueError("frame references undefined quant table")
            q = np.array(qtables[tqi], dtype=np.float64)
            nbx, nby = self.grids[fi][0], self.grids[fi][1]
            plane = _idct_plane(self.coeff[fi], q, nbx, nby)
            yidx = (np.arange(self.height) * vi) // self.vmax
            xidx = (np.arange(self.width) * hi) // self.hmax
            planes.append(plane[yidx][:, xidx])
        if len(planes) == 1:
            return planes[0]
        return _ycbcr_rgb(planes)


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Decode 8-bit baseline JPEG bytes: single-component → (h, w)
    uint8; 3-component → (h, w, 3) uint8 RGB (JFIF YCbCr→RGB, half-up
    rounding) for the full spec-legal sampling range (T.81 B.2.2:
    factors 1..4 — 4:4:4, 4:2:0, 4:2:2, 4:4:0, 4:1:1, 3:1:1, …) with
    replication chroma upsample ((y·vi)//vmax — deterministic and
    closed-form, including the fractional 2-against-3 ratios the spec
    permits). General within that envelope: arbitrary Huffman and
    quant tables are read from the stream, AC run-length/EOB/ZRL are
    honored, restart intervals handled, FF00 stuffing removed, partial
    edge blocks cropped."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = 0
    restart_interval = 0
    progressive = False
    frame: _ProgressiveFrame | None = None
    # (component id, h factor, v factor, quant table id)
    comps: list[tuple[int, int, int, int]] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG: lone 0xFF at end of payload")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip them (a spec-valid baseline JPEG with fill
        # padding was previously rejected as a truncated segment)
        while data[pos + 1] == 0xFF:
            pos += 1
            if pos + 1 >= len(data):
                raise ValueError("truncated JPEG: lone 0xFF at end of payload")
        tag = data[pos + 1]
        if tag == 0xD9:  # EOI
            if frame is not None:
                # progressive: all scans accumulated — reconstruct
                return frame.reconstruct(qtables)
            break
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG: incomplete segment header")
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if seglen < 2 or pos + 2 + seglen > len(data):
            raise ValueError("truncated JPEG: segment body exceeds payload")
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if tag == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(body):
                if i + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                pq, t = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                zz = list(body[i + 1 : i + 65])
                q = [0] * 64
                for k in range(64):
                    q[ZIGZAG[k]] = zz[k]
                qtables[t] = q
                i += 65
        elif tag == 0xC4:  # DHT — possibly several tables per segment
            i = 0
            while i < len(body):
                if i + 17 > len(body):
                    raise ValueError("truncated DHT segment")
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                if i + 17 + n > len(body):
                    raise ValueError("truncated DHT segment values")
                vals = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _decode_table(bits, vals)
                i += 17 + n
        elif tag in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = tag == 0xC2
            if len(body) < 6:
                raise ValueError("truncated JPEG: short SOF segment")
            _prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if width == 0 or height == 0:
                raise ValueError(
                    f"zero-dimension JPEG ({width}x{height}) refused"
                )
            # hard pixel-count cap (mirrors the PNG decoder's, r12):
            # the progressive path allocates per-component coefficient
            # memory up front from these header dims, so a 20-byte
            # forged SOF declaring 65535x65535 would otherwise demand
            # ~34 GB before the entropy decode ever fails
            if width * height > 1 << 26:
                raise ValueError(
                    f"JPEG dimensions {width}x{height} exceed decode cap"
                )
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEGs not supported")
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF0 component list")
            comps = []
            for ci in range(ncomp):
                cid, hv, tqi = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0x0F
                # full spec-legal sampling envelope (T.81 B.2.2: Hi/Vi
                # ∈ 1..4 — r12 lifted the former 1..2 refusal: the
                # interleaved-MCU scan and the (y·vi)//vmax replication
                # upsample are factor-agnostic, now fixture-tested at
                # 3 and 4); 0 or >4 is stream corruption and refuses
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(
                        f"illegal sampling factors {hi}x{vi} (T.81 "
                        "B.2.2 allows 1..4)"
                    )
                comps.append((cid, hi, vi, tqi))
        elif tag in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                     0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0) and progressive (SOF2) JPEGs supported"
            )
        elif tag == 0xDD:  # DRI — restart interval in MCUs (0 disables)
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif tag == 0xDA:  # SOS — entropy data follows the header
            if not body:
                raise ValueError("truncated SOS segment")
            ns = body[0]
            # ns == len(comps) == 0 (SOS with no preceding SOF0) must
            # refuse here — it previously passed the equality check and
            # crashed with IndexError at the plane assembly
            if not comps or ns == 0:
                raise ValueError("SOS before SOF0 (no frame components)")
            if progressive:
                if frame is None:
                    frame = _ProgressiveFrame(comps, width, height)
                pos = frame.decode_scan(
                    data, pos, body, htables, restart_interval
                )
                continue
            if ns != len(comps):
                raise NotImplementedError("scan must cover all frame components")
            if len(body) < 1 + 2 * ns:
                raise ValueError("truncated SOS component list")
            # per-component entropy tables, in scan order — every
            # reference must resolve (a flipped header bit can point a
            # scan at a component or table that was never defined;
            # refuse, don't KeyError — r8 media fuzz)
            sel: list[tuple[dict, dict, np.ndarray]] = []
            shs: list[int] = []
            svs: list[int] = []
            cmap = {c[0]: c[1:] for c in comps}
            for ci in range(ns):
                cs, tda = body[1 + 2 * ci], body[2 + 2 * ci]
                if cs not in cmap:
                    raise ValueError(f"SOS references undefined component {cs}")
                hi, vi, tqi = cmap[cs]
                if (0, tda >> 4) not in htables or (1, tda & 0x0F) not in htables:
                    raise ValueError("SOS references undefined Huffman table")
                if tqi not in qtables:
                    raise ValueError("SOS references undefined quant table")
                shs.append(hi)
                svs.append(vi)
                sel.append(
                    (
                        htables[(0, tda >> 4)],
                        htables[(1, tda & 0x0F)],
                        np.array(qtables[tqi], dtype=np.float64),
                    )
                )
            reader = _BitReader(data, pos)

            def decode_block(ci: int, prevs: list[int]) -> list[int]:
                dc_tab, ac_tab, _q = sel[ci]
                row = [0] * 64
                s = reader.read_symbol(dc_tab)
                diff = _extend(reader.read(s), s) if s else 0
                prevs[ci] += diff
                row[0] = prevs[ci]
                k = 1
                while k < 64:
                    sym = reader.read_symbol(ac_tab)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL: 16 zeros
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    k += run
                    if k >= 64:
                        raise ValueError("AC run past end of block")
                    row[k] = _extend(reader.read(size), size)
                    k += 1
                return row

            def idct_plane(ci: int, coeff_rows: list[list[int]],
                           nbx: int, nby: int) -> np.ndarray:
                # dequant + de-zigzag + IDCT batched across ALL blocks
                # of the component — one scatter and one broadcast
                # matmul chain (block = Aᵀ F A), never per-block matmuls
                _dc, _ac, q = sel[ci]
                nb = nbx * nby
                coeffs = np.array(coeff_rows, dtype=np.float64)
                fq = np.zeros((nb, 64), dtype=np.float64)
                fq[:, ZIGZAG] = coeffs * q[ZIGZAG]
                blocks = _A.T @ fq.reshape(nb, 8, 8) @ _A
                pix = np.clip(np.round(blocks + 128.0), 0, 255).astype(np.uint8)
                return (
                    pix.reshape(nby, nbx, 8, 8)
                    .transpose(0, 2, 1, 3)
                    .reshape(nby * 8, nbx * 8)
                )

            hmax, vmax = max(shs), max(svs)
            if ns == 1 or (hmax == 1 and vmax == 1):
                # 4:4:4 (or single-component non-interleaved: T.81
                # A.2.2 — one block per MCU, sampling factors inert):
                # MCU order is simply (Y[, Cb, Cr]) per block position.
                # pass 1 is sequential entropy decode (the bit stream
                # forbids parallelism); blocks accumulate as plain
                # Python lists (scalar numpy writes measured 1.6×
                # slower).
                bx, by = (width + 7) // 8, (height + 7) // 8
                rows: list[list[list[int]]] = [[] for _ in range(ns)]
                prevs = [0] * ns
                for _b in range(bx * by):
                    # restart boundary: every MCU (= one block position
                    # here) multiple of the DRI interval — byte-align,
                    # consume RSTn (sequence verified), reset predictors
                    if restart_interval and _b and _b % restart_interval == 0:
                        reader.restart((_b // restart_interval - 1) % 8)
                        prevs[:] = [0] * ns
                    for ci in range(ns):
                        rows[ci].append(decode_block(ci, prevs))
                planes = [
                    idct_plane(ci, rows[ci], bx, by)[:height, :width]
                    for ci in range(ns)
                ]
            else:
                # general interleaved MCU scan (T.81 A.2.3): the MCU is
                # hmax×vmax data units of the highest-resolution
                # component; each component contributes hi×vi blocks
                # per MCU in raster order within the MCU. Chroma planes
                # upsample by sample replication — index (y·vi)//vmax,
                # (x·hi)//hmax — the deterministic box upsample a SQL
                # oracle replays in closed form (T.81 leaves the
                # upsampling filter to the decoder).
                mcux = -(-width // (8 * hmax))
                mcuy = -(-height // (8 * vmax))
                rows = [[] for _ in range(ns)]
                prevs = [0] * ns
                for _m in range(mcux * mcuy):
                    if restart_interval and _m and _m % restart_interval == 0:
                        reader.restart((_m // restart_interval - 1) % 8)
                        prevs[:] = [0] * ns
                    for ci in range(ns):
                        for _b in range(shs[ci] * svs[ci]):
                            rows[ci].append(decode_block(ci, prevs))
                planes = []
                yidx = np.arange(height)
                xidx = np.arange(width)
                for ci in range(ns):
                    hi, vi = shs[ci], svs[ci]
                    nbx, nby = mcux * hi, mcuy * vi
                    # MCU scan order → block raster order: block k of
                    # MCU (my, mx) sits at block row my·vi + k//hi,
                    # block col mx·hi + k%hi
                    perm = np.empty(nbx * nby, dtype=np.int64)
                    p = 0
                    for my in range(mcuy):
                        for mx in range(mcux):
                            for iy in range(vi):
                                for ix in range(hi):
                                    perm[p] = (my * vi + iy) * nbx + mx * hi + ix
                                    p += 1
                    raster: list[list[int]] = [None] * (nbx * nby)  # type: ignore[list-item]
                    for k, r in enumerate(rows[ci]):
                        raster[perm[k]] = r
                    plane = idct_plane(ci, raster, nbx, nby)
                    planes.append(plane[(yidx * vi) // vmax][:, (xidx * hi) // hmax])
            if ns == 1:
                return planes[0]
            # JFIF YCbCr→RGB on the level-shifted integer samples;
            # half-up rounding (floor(x + 0.5)) so a SQL oracle can
            # replay the conversion exactly in closed form
            y = planes[0].astype(np.float64)
            cb = planes[1].astype(np.float64)
            cr = planes[2].astype(np.float64)
            rgb = np.stack(
                [
                    np.floor(y + 1.402 * (cr - 128.0) + 0.5),
                    np.floor(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5),
                    np.floor(y + 1.772 * (cb - 128.0) + 0.5),
                ],
                axis=-1,
            )
            return np.clip(rgb, 0, 255).astype(np.uint8)
    if frame is not None:
        raise ValueError("truncated progressive JPEG: missing EOI")
    raise ValueError("no SOS marker found")


def synth_block_values(key: int) -> tuple[list[int], int, int, int]:
    """Closed-form fixture: w = 8*(1 + key%3), h = 8*(1 + key%2),
    block b (raster order) has quantized DC ((key*31 + b*17) % 256)
    - 128, i.e. decodes to the constant pixel (key*31 + b*17) % 256.
    Pure integer math a SQL oracle replays without seeing bytes."""
    bx, by = 1 + key % 3, 1 + key % 2
    dcs = [((key * 31 + b * 17) % 256) - 128 for b in range(bx * by)]
    return dcs, bx, bx * 8, by * 8


def synth_420_block_values(key: int) -> tuple[list[int], list[int], list[int], int, int, int]:
    """Closed-form 4:2:0 fixture: mcus_x = 1 + key%2, mcus_y =
    1 + key%3 → width 16·mcus_x, height 16·mcus_y. Y block b (raster
    order over the 2·mcus_x-wide grid) carries y = (key*31 + b*17) %
    256; chroma block c (raster over the mcus_x-wide grid) carries
    cb = (key*7 + c*11) % 256, cr = (key*13 + c*5) % 256. After the
    replication upsample, pixel (x, y) sees y from block
    (y//8)·2·mcus_x + x//8 and chroma from block
    (y//16)·mcus_x + x//16 — pure integer math a SQL oracle replays,
    with the same floor(x + 0.5) RGB conversion as the 4:4:4 path."""
    mx, my = 1 + key % 2, 1 + key % 3
    nb_y, nb_c = (2 * mx) * (2 * my), mx * my
    dc_y = [((key * 31 + b * 17) % 256) - 128 for b in range(nb_y)]
    dc_cb = [((key * 7 + b * 11) % 256) - 128 for b in range(nb_c)]
    dc_cr = [((key * 13 + b * 5) % 256) - 128 for b in range(nb_c)]
    return dc_y, dc_cb, dc_cr, mx, 16 * mx, 16 * my


def synth_color_block_values(key: int) -> tuple[list[int], list[int], list[int], int, int, int]:
    """Closed-form COLOR fixture: same dims as :func:`synth_block_values`;
    block b carries per-component quantized DCs so its level-shifted
    samples are y = (key*31 + b*17) % 256, cb = (key*7 + b*11) % 256,
    cr = (key*13 + b*5) % 256 — pure integer math; the RGB conversion
    (floor(x + 0.5), clamp) is then replayable in SQL."""
    bx, by = 1 + key % 3, 1 + key % 2
    nb = bx * by
    dc_y = [((key * 31 + b * 17) % 256) - 128 for b in range(nb)]
    dc_cb = [((key * 7 + b * 11) % 256) - 128 for b in range(nb)]
    dc_cr = [((key * 13 + b * 5) % 256) - 128 for b in range(nb)]
    return dc_y, dc_cb, dc_cr, bx, bx * 8, by * 8
