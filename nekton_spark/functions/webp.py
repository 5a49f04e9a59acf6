r"""WebP (VP8L lossless) codec — from-spec container + bitstream.

WebP is a double-digit share of modern web images (every major browser
ships it), so a 100 TB multimodal crawl hits it constantly; the r14
verdict flagged the missing ``image/webp`` path as the largest codec
envelope gap after zstd. Lossy VP8 is far outside the from-spec
envelope (a full DCT video intra-frame codec), but **VP8L — the
lossless half — is a self-contained public spec** ("WebP Lossless
Bitstream Specification", RFC 9649 / the libwebp docs), and this
module implements it completely, in the same refuse-or-decode-exactly
discipline as the JPEG/PNG/GIF/BMP decoders:

- RIFF/WEBP container walk: simple (``VP8L`` chunk) and extended
  (``VP8X``) layouts; lossy ``VP8 `` payloads refuse reason-coded
  (``lossy_webp``), animations (``ANIM``/``ANMF``) likewise
  (``webp_animation``);
- LSB-first bit reader over the VP8L stream (14-bit dimensions,
  3-bit version);
- canonical prefix codes in both spec forms: the 2-symbol "simple"
  form and the full code-length-coded form (19-entry code-length
  code in the normative ``kCodeLengthCodeOrder``, repeat ops
  16/17/18, optional ``max_symbol`` early stop, single-symbol codes
  read as zero-bit trivials exactly as the reference decoder does);
- the spatially-coded image: optional meta-prefix image selecting
  one of N prefix-code groups per tile, optional color cache
  (``(0x1e35a7bd * argb) >> (32 - bits)``), and the LZ77 layer —
  length/distance prefix values with extra bits, and the normative
  120-entry two-dimensional distance map (codes 1..120 address the
  8x8 pixel neighborhood; codes >120 are linear distances);
- all four transforms, inverted in reverse bitstream order with the
  width each one observed at read time: predictor (14 modes with the
  spec's exact Select / ClampAddSubtractFull / ClampAddSubtractHalf
  arithmetic, C-truncating division and all), cross-color (signed
  3.5 fixed-point deltas on int8-cast channels), subtract-green, and
  color-indexing with sub-pixel bundling (1/2/4-bit indices packed
  least-significant-first into the green channel).

The encoder (:func:`webp_encode_lossless`) writes genuine VP8L bytes
— real canonical prefix codes built from symbol frequencies and
emitted through the code-length code, optional color cache, optional
distance-1 LZ77 run tokens, optional subtract-green, and the palette
(color-indexing) path with pixel bundling — so driver fixtures
round-trip through the same bit-level machinery real decoders use.
Where the environment provides libwebp, the test suite pins
bidirectional parity: libwebp-encoded images must decode here
bit-exactly, and bytes written here must decode bit-exactly through
libwebp (tests/test_webp.py; gated on the library's presence).

Structural damage (bad signature, truncated stream, over-subscribed
prefix code, out-of-range back-reference, invalid predictor mode)
refuses as ValueError; the pixel-count cap matches the other
decoders' 2^26.

Reference parity note: the reference engine has no media codecs at
all (``/root/reference/src/processors.rs`` is text-only) — this
module belongs to the LLM-pipeline mandate, not reference parity.
"""

from __future__ import annotations

import struct
from typing import Iterable, Optional

import numpy as np

_MAX_PIXELS = 1 << 26  # same envelope cap as PNG/JPEG/GIF/BMP

# normative order in which code-length-code lengths are stored
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_HASH_MUL = 0x1E35A7BD

# Normative 2-D distance map: LZ77 distance codes 1..120 address the
# pixel neighborhood as (dx, dy) offsets; distance = dy*width + dx
# (clamped to >= 1). Codes > 120 are plain distances (code - 120).
# Pinned bit-exactly against libwebp by the fuzz parity tests.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)
assert len(_DIST_MAP) == 120


# ------------------------------------------------------------------ bits


class _BitReader:
    """LSB-first bit reader (VP8L convention: bits fill each byte from
    the least-significant end). Reading past the physical end of the
    stream refuses — padding inside the final byte is fine, a read
    that needs bytes that aren't there is 'truncated'."""

    __slots__ = ("data", "nbits", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.nbits = 8 * len(data)
        self.pos = 0

    def read(self, n: int) -> int:
        pos = self.pos
        if pos + n > self.nbits:
            raise ValueError("truncated WebP stream (bit reader past end)")
        self.pos = pos + n
        data = self.data
        v = 0
        got = 0
        while got < n:
            byte = data[(pos + got) >> 3]
            off = (pos + got) & 7
            take = min(8 - off, n - got)
            v |= ((byte >> off) & ((1 << take) - 1)) << got
            got += take
        return v


def _bit_reverse(code: int, length: int) -> int:
    """``code``'s low ``length`` bits in reverse order (MSB-first wire
    emission under an LSB-first writer)."""
    rev = 0
    for _ in range(length):
        rev = (rev << 1) | (code & 1)
        code >>= 1
    return rev


class _BitWriter:
    """LSB-first bit writer matching :class:`_BitReader`."""

    __slots__ = ("_buf", "_acc", "_n")

    def __init__(self):
        self._buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, n: int) -> None:
        self._acc |= (value & ((1 << n) - 1)) << self._n
        self._n += n
        while self._n >= 8:
            self._buf.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Emit a canonical prefix code MSB-first (the over-the-wire
        orientation for VP8L prefix codes under an LSB-first byte
        fill — the reference decoder builds bit-reversed lookup
        tables for exactly this reason). Emitting the bit-REVERSED
        code LSB-first in one ``write`` lands the identical bits in
        the identical order as ``length`` single-bit writes did — one
        call instead of ``length`` (the bit writer was the encoder's
        top profile line)."""
        self.write(_bit_reverse(code, length), length)

    def getvalue(self) -> bytes:
        out = bytes(self._buf)
        if self._n:
            out += bytes([self._acc & 0xFF])
        return out


# ------------------------------------------------------- prefix codes


class _PrefixCode:
    """Canonical prefix code decoder: DEFLATE-style canonical
    assignment (codes ordered by (length, symbol)), read MSB-first
    bit-by-bit. A code with a single used symbol is a zero-bit
    trivial (reference-decoder behavior for both the simple form and
    a degenerate code-length form)."""

    __slots__ = ("trivial", "table", "max_len")

    def __init__(self, trivial: Optional[int], table: dict, max_len: int):
        self.trivial = trivial
        self.table = table
        self.max_len = max_len

    def read(self, br: _BitReader) -> int:
        # hot path: one call per coded symbol. Bits are pulled inline
        # from the reader's buffer (a br.read(1) call per bit measured
        # as the decoder's top profile line) and the table is keyed by
        # the int (length << 16) | code instead of a tuple — same walk,
        # same symbols, same pos advance, same truncation error.
        if self.trivial is not None:
            return self.trivial
        data = br.data
        pos = br.pos
        nbits = br.nbits
        code = 0
        table = self.table
        get = table.get
        for length in range(1, self.max_len + 1):
            if pos >= nbits:
                raise ValueError(
                    "truncated WebP stream (bit reader past end)"
                )
            code = (code << 1) | ((data[pos >> 3] >> (pos & 7)) & 1)
            pos += 1
            sym = get((length << 16) | code)
            if sym is not None:
                br.pos = pos
                return sym
        raise ValueError("broken Huffman code in WebP stream (no symbol)")


def _canonical_decode(lengths: Iterable[int]) -> _PrefixCode:
    lengths = list(lengths)
    used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
    if not used:
        raise ValueError("broken Huffman code in WebP stream (empty)")
    if len(used) == 1:
        return _PrefixCode(used[0][1], {}, 0)
    max_len = max(ln for ln, _ in used)
    if max_len > 15:
        raise ValueError("broken Huffman code in WebP stream (length > 15)")
    # Kraft check: the spec requires complete codes
    kraft = sum(1 << (max_len - ln) for ln, _ in used)
    if kraft != (1 << max_len):
        raise ValueError("broken Huffman code in WebP stream (incomplete)")
    bl_count = [0] * (max_len + 1)
    for ln, _ in used:
        bl_count[ln] += 1
    next_code = [0] * (max_len + 1)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    table = {}
    for ln, sym in sorted(used):
        # int key (ln << 16) | code — see _PrefixCode.read; code < 2^15
        # is guaranteed by the max_len check above
        table[(ln << 16) | next_code[ln]] = sym
        next_code[ln] += 1
    return _PrefixCode(None, table, max_len)


def _read_code_lengths(
    br: _BitReader, cl_lengths: list, alphabet_size: int
) -> list:
    cl_code = _canonical_decode(cl_lengths)
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("broken Huffman code in WebP stream (max_symbol)")
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8  # spec default
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.read(2), prev
            elif cl == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError(
                    "broken Huffman code in WebP stream (repeat overflow)"
                )
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple form
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        if s0 >= alphabet_size:
            raise ValueError("broken Huffman code in WebP stream (symbol range)")
        if num_symbols == 1:
            return _PrefixCode(s0, {}, 0)
        s1 = br.read(8)
        if s1 >= alphabet_size:
            raise ValueError("broken Huffman code in WebP stream (symbol range)")
        # 1-bit codes in read order: first symbol <-> bit 0
        # (int keys (ln << 16) | code — see _PrefixCode.read)
        return _PrefixCode(None, {(1 << 16) | 0: s0, (1 << 16) | 1: s1}, 1)
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    lengths = _read_code_lengths(br, cl_lengths, alphabet_size)
    return _canonical_decode(lengths)


def _prefix_value(prefix_code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decode: codes 0..3 are the values
    1..4; above that, (prefix-2)>>1 extra bits over the offset
    (2 + (prefix & 1)) << extra."""
    if prefix_code < 4:
        return prefix_code + 1
    extra = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra
    return offset + br.read(extra) + 1


# ------------------------------------------------------------ decoder


def _plane_code_to_distance(code: int, width: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    dist = dy * width + dx
    return dist if dist >= 1 else 1


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _decode_pixels(
    br: _BitReader, w: int, h: int, level0: bool
) -> list:
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad WebP color cache size")
    meta = None
    meta_bits = 0
    meta_w = 0
    n_groups = 1
    if level0 and br.read(1):
        meta_bits = br.read(3) + 2
        meta_w = _ceil_div(w, 1 << meta_bits)
        meta_h = _ceil_div(h, 1 << meta_bits)
        meta = _decode_image_stream(br, meta_w, meta_h, False)
        n_groups = max((p >> 8) & 0xFFFF for p in meta) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    sizes = (256 + 24 + cache_size, 256, 256, 256, 40)
    groups = [
        tuple(_read_prefix_code(br, s) for s in sizes) for _ in range(n_groups)
    ]
    cache = [0] * cache_size if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    n = w * h
    out = [0] * n
    pos = 0
    g = groups[0]
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            gi = (meta[(y >> meta_bits) * meta_w + (x >> meta_bits)] >> 8) & 0xFFFF
            g = groups[gi]
        s = g[0].read(br)
        if s < 256:
            r = g[1].read(br)
            b = g[2].read(br)
            a = g[3].read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[(_HASH_MUL * px & 0xFFFFFFFF) >> shift] = px
        elif s < 280:
            length = _prefix_value(s - 256, br)
            dcode = g[4].read(br)
            dist = _plane_code_to_distance(_prefix_value(dcode, br), w)
            if dist > pos:
                raise ValueError("WebP back-reference before image start")
            if pos + length > n:
                raise ValueError("WebP back-reference past image end")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[(_HASH_MUL * px & 0xFFFFFFFF) >> shift] = px
        else:
            out[pos] = cache[s - 280]
            pos += 1
    return out


def _avg2(a: int, b: int) -> int:
    # per-channel average without cross-carry, on packed ARGB
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(left: int, top: int, tl: int) -> int:
    p_l = 0
    p_t = 0
    for sh in (24, 16, 8, 0):
        lc = (left >> sh) & 0xFF
        tc = (top >> sh) & 0xFF
        tlc = (tl >> sh) & 0xFF
        pred = lc + tc - tlc
        p_l += abs(pred - lc)
        p_t += abs(pred - tc)
    return left if p_l < p_t else top


def _clamp_add_sub_full(left: int, top: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = _clamp(((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - ((tl >> sh) & 0xFF))
        out |= c << sh
    return out


def _clamp_add_sub_half(ave: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        # C semantics: (a - b) / 2 truncates toward zero
        d = a - b
        c = _clamp(a + (abs(d) >> 1) * (1 if d >= 0 else -1))
        out |= c << sh
    return out


def _add_pixels(a: int, b: int) -> int:
    # per-channel mod-256 addition on packed ARGB
    lo = ((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF
    hi = ((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00
    return hi | lo


def _inv_predictor(pixels: list, w: int, h: int, bits: int, tiles: list) -> list:
    tw = _ceil_div(w, 1 << bits)
    out = pixels  # in place: residuals become pixels as we sweep
    for pos in range(w * h):
        x = pos % w
        y = pos // w
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = out[pos - 1]  # left
        elif x == 0:
            pred = out[pos - w]  # top
        else:
            mode = (tiles[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
            left = out[pos - 1]
            top = out[pos - w]
            tr = out[pos - w + 1]  # at x=w-1 this is row y's first pixel
            tl = out[pos - w - 1]
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = left
            elif mode == 2:
                pred = top
            elif mode == 3:
                pred = tr
            elif mode == 4:
                pred = tl
            elif mode == 5:
                pred = _avg2(_avg2(left, tr), top)
            elif mode == 6:
                pred = _avg2(left, tl)
            elif mode == 7:
                pred = _avg2(left, top)
            elif mode == 8:
                pred = _avg2(tl, top)
            elif mode == 9:
                pred = _avg2(top, tr)
            elif mode == 10:
                pred = _avg2(_avg2(left, tl), _avg2(top, tr))
            elif mode == 11:
                pred = _select(left, top, tl)
            elif mode == 12:
                pred = _clamp_add_sub_full(left, top, tl)
            elif mode == 13:
                pred = _clamp_add_sub_half(_avg2(left, top), tl)
            else:
                raise ValueError(f"invalid WebP predictor mode {mode}")
        out[pos] = _add_pixels(out[pos], pred)
    return out


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    # both operands int8-cast; arithmetic >> 5 (3.5 fixed point)
    return (_s8(t) * _s8(c)) >> 5


def _inv_color_transform(
    pixels: list, w: int, h: int, bits: int, tiles: list
) -> list:
    tw = _ceil_div(w, 1 << bits)
    for pos in range(w * h):
        x = pos % w
        y = pos // w
        m = tiles[(y >> bits) * tw + (x >> bits)]
        g2r = m & 0xFF
        g2b = (m >> 8) & 0xFF
        r2b = (m >> 16) & 0xFF
        px = pixels[pos]
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + _ct_delta(g2r, g)) & 0xFF
        b = ((px & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
        pixels[pos] = (px & 0xFF00FF00) | (r << 16) | b
    return pixels


def _inv_subtract_green(pixels: list) -> list:
    for pos, px in enumerate(pixels):
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pixels[pos] = (px & 0xFF00FF00) | (r << 16) | b
    return pixels


def _decode_image_stream(br: _BitReader, w: int, h: int, level0: bool) -> list:
    transforms = []  # (type, payload..., w_at_read)
    seen = set()
    cur_w = w
    if level0:
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate WebP transform")
            seen.add(ttype)
            if ttype in (0, 1):  # predictor / cross-color
                bits = br.read(3) + 2
                tiles = _decode_image_stream(
                    br, _ceil_div(cur_w, 1 << bits), _ceil_div(h, 1 << bits), False
                )
                transforms.append((ttype, bits, tiles, cur_w))
            elif ttype == 2:  # subtract green
                transforms.append((2, cur_w))
            else:  # color indexing
                n_colors = br.read(8) + 1
                deltas = _decode_image_stream(br, n_colors, 1, False)
                palette = []
                prev = 0
                for d in deltas:
                    prev = _add_pixels(prev, d)
                    palette.append(prev)
                xbits = 3 if n_colors <= 2 else 2 if n_colors <= 4 else 1 if n_colors <= 16 else 0
                transforms.append((3, n_colors, palette, xbits, cur_w))
                cur_w = _ceil_div(cur_w, 1 << xbits)
    pixels = _decode_pixels(br, cur_w, h, level0)
    for t in reversed(transforms):
        if t[0] == 0:
            _, bits, tiles, tw = t
            pixels = _inv_predictor(pixels, tw, h, bits, tiles)
        elif t[0] == 1:
            _, bits, tiles, tw = t
            pixels = _inv_color_transform(pixels, tw, h, bits, tiles)
        elif t[0] == 2:
            pixels = _inv_subtract_green(pixels)
        else:
            _, n_colors, palette, xbits, orig_w = t
            if xbits == 0:
                for pos, px in enumerate(pixels):
                    idx = (px >> 8) & 0xFF
                    pixels[pos] = palette[idx] if idx < n_colors else 0
            else:
                packed_w = _ceil_div(orig_w, 1 << xbits)
                bpp = 8 >> xbits
                mask = (1 << bpp) - 1
                sub_mask = (1 << xbits) - 1
                out = [0] * (orig_w * h)
                for y in range(h):
                    row = y * packed_w
                    orow = y * orig_w
                    for x in range(orig_w):
                        green = (pixels[row + (x >> xbits)] >> 8) & 0xFF
                        idx = (green >> ((x & sub_mask) * bpp)) & mask
                        out[orow + x] = palette[idx] if idx < n_colors else 0
                pixels = out
    return pixels


def vp8l_decode(chunk: bytes) -> np.ndarray:
    """Decode a VP8L chunk payload to an (h, w, 4) uint8 RGBA array."""
    if len(chunk) < 5:
        raise ValueError("truncated WebP stream (VP8L chunk)")
    if chunk[0] != 0x2F:
        raise ValueError("bad WebP VP8L signature byte")
    br = _BitReader(chunk[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("unsupported WebP VP8L version")
    if w * h > _MAX_PIXELS:
        raise ValueError("WebP image too large for the codec envelope")
    pixels = _decode_image_stream(br, w, h, True)
    arr = np.asarray(pixels, dtype=np.uint32).reshape(h, w)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[..., 0] = (arr >> 16) & 0xFF  # R
    out[..., 1] = (arr >> 8) & 0xFF  # G
    out[..., 2] = arr & 0xFF  # B
    out[..., 3] = (arr >> 24) & 0xFF  # A
    return out


_ANIM_FLAG = 0x02


def webp_decode(payload: bytes) -> np.ndarray:
    """Decode a WebP container to (h, w, 4) RGBA. VP8L (lossless)
    decodes for real; lossy VP8 and animations refuse reason-coded."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) container")
    off = 12
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    while off + 8 <= end:
        tag = payload[off : off + 4]
        (size,) = struct.unpack("<I", payload[off + 4 : off + 8])
        body = payload[off + 8 : off + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WebP container chunk")
        if tag == b"VP8L":
            return vp8l_decode(body)
        if tag == b"VP8 ":
            raise ValueError(
                "lossy WebP (VP8) is outside the from-spec codec envelope"
            )
        if tag in (b"ANIM", b"ANMF"):
            raise ValueError("animated WebP is not supported")
        if tag == b"VP8X":
            if size >= 1 and body[0] & _ANIM_FLAG:
                raise ValueError("animated WebP is not supported")
            # otherwise keep walking for the image chunk
        off += 8 + size + (size & 1)
    raise ValueError("no image chunk in WebP container")


# --------------------------------------------------------- animation


def _read_u24(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8) | (b[off + 2] << 16)


def _chunks(payload: bytes):
    """Walk the RIFF chunk sequence (tag, body) — container-level
    validation shared by the image, frame, and scrub paths."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) container")
    off = 12
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    while off + 8 <= end:
        tag = payload[off : off + 4]
        (size,) = struct.unpack("<I", payload[off + 4 : off + 8])
        body = payload[off + 8 : off + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WebP container chunk")
        yield tag, body
        off += 8 + size + (size & 1)


def webp_parse_anim(payload: bytes):
    """(canvas_w, canvas_h, frames) for an animated WebP; frames are
    dicts with placement/disposal/blend and the frame's VP8L chunk
    payload. Lossy (VP8) frames refuse; a non-animated container
    raises ValueError('not an animated WebP')."""
    canvas = None
    frames = []
    animated = False
    for tag, body in _chunks(payload):
        if tag == b"VP8X":
            if len(body) < 10:
                raise ValueError("truncated WebP stream (VP8X)")
            canvas = (_read_u24(body, 4) + 1, _read_u24(body, 7) + 1)
            animated = bool(body[0] & _ANIM_FLAG)
        elif tag == b"ANMF":
            if len(body) < 16:
                raise ValueError("truncated WebP stream (ANMF)")
            fr = {
                "x": 2 * _read_u24(body, 0),
                "y": 2 * _read_u24(body, 3),
                "w": _read_u24(body, 6) + 1,
                "h": _read_u24(body, 9) + 1,
                "duration": _read_u24(body, 12),
                "dispose": body[15] & 0x01,
                "blend": not (body[15] & 0x02),  # bit set = do NOT blend
                "vp8l": None,
            }
            off2 = 16
            while off2 + 8 <= len(body):
                stag = body[off2 : off2 + 4]
                (ssize,) = struct.unpack("<I", body[off2 + 4 : off2 + 8])
                sbody = body[off2 + 8 : off2 + 8 + ssize]
                if len(sbody) < ssize:
                    raise ValueError("truncated WebP stream (frame chunk)")
                if stag == b"VP8L":
                    fr["vp8l"] = sbody
                elif stag == b"VP8 ":
                    raise ValueError(
                        "lossy WebP (VP8) animation frame is outside the "
                        "from-spec codec envelope"
                    )
                off2 += 8 + ssize + (ssize & 1)
            if fr["vp8l"] is None:
                raise ValueError("WebP animation frame without image data")
            frames.append(fr)
    if not (animated and frames):
        raise ValueError("not an animated WebP")
    if canvas is None:
        raise ValueError("animated WebP without VP8X canvas")
    return canvas[0], canvas[1], frames


def _blend_rect(canvas: np.ndarray, frame: np.ndarray, x: int, y: int) -> None:
    """Alpha-blend ``frame`` over the canvas rect (container spec
    'over' operator on non-premultiplied RGBA, integer semantics:
    dst_factor = dst_a*(255-src_a)//255, blend_a = src_a+dst_factor,
    channel = (src*src_a + dst*dst_factor)//blend_a). Opaque source
    pixels overwrite exactly."""
    fh, fw = frame.shape[:2]
    dst = canvas[y : y + fh, x : x + fw].astype(np.int64)
    src = frame.astype(np.int64)
    src_a = src[..., 3:4]
    dst_factor = dst[..., 3:4] * (255 - src_a) // 255
    blend_a = src_a + dst_factor
    safe = np.maximum(blend_a, 1)
    rgb = (src[..., :3] * src_a + dst[..., :3] * dst_factor) // safe
    out = np.concatenate([rgb, blend_a], axis=2)
    out[blend_a[..., 0] == 0] = 0
    canvas[y : y + fh, x : x + fw] = out.astype(np.uint8)


def _iter_webp_composited(payload: bytes):
    """Yield the composited (h, w, 4) canvas after each animation
    frame. The canvas starts fully TRANSPARENT (browser rendering —
    the ANIM background color is advisory, same call as the GIF
    compositor); dispose-to-background clears the frame RECTANGLE to
    transparent after the frame is emitted."""
    cw, ch, frames = webp_parse_anim(payload)
    if cw * ch > _MAX_PIXELS:
        raise ValueError("WebP image too large for the codec envelope")
    canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
    for fr in frames:
        px = vp8l_decode(fr["vp8l"])
        if px.shape[:2] != (fr["h"], fr["w"]):
            raise ValueError(
                "WebP animation frame dims disagree with ANMF header"
            )
        if fr["x"] + fr["w"] > cw or fr["y"] + fr["h"] > ch:
            raise ValueError("WebP animation frame exceeds canvas")
        if fr["blend"]:
            _blend_rect(canvas, px, fr["x"], fr["y"])
        else:
            canvas[fr["y"] : fr["y"] + fr["h"], fr["x"] : fr["x"] + fr["w"]] = px
        yield canvas.copy()
        if fr["dispose"]:
            canvas[fr["y"] : fr["y"] + fr["h"], fr["x"] : fr["x"] + fr["w"]] = 0


def webp_decode_frames(payload: bytes) -> list:
    """All composited frames of an animated WebP (or the single image
    of a still container, mirroring gif_decode_frames)."""
    try:
        return list(_iter_webp_composited(payload))
    except ValueError as e:
        if str(e) != "not an animated WebP":
            raise
        return [webp_decode(payload)]


def webp_frame_count(payload: bytes) -> int:
    n = 0
    seen_image = False
    for tag, _ in _chunks(payload):
        if tag == b"ANMF":
            n += 1
        elif tag in (b"VP8L", b"VP8 "):
            seen_image = True
    return n if n else (1 if seen_image else 0)


def webp_encode_anim(
    frames: list,
    canvas: tuple,
    *,
    loop: int = 0,
) -> bytes:
    """Genuine animated WebP: VP8X (ANIM flag + canvas size), ANIM
    chunk, one ANMF per frame wrapping a real VP8L stream. Each frame
    dict: ``rgba`` (fh, fw, 4) uint8, ``x``/``y`` (EVEN canvas
    offsets — the container stores them halved), ``dispose`` (0 keep /
    1 to-background), ``blend`` (True alpha-blend / False overwrite),
    ``duration`` ms."""
    cw, ch = canvas
    body = bytearray()
    flags = _ANIM_FLAG
    vp8x = bytes([flags]) + b"\x00\x00\x00" + struct.pack("<I", cw - 1)[:3] + struct.pack("<I", ch - 1)[:3]
    body += b"VP8X" + struct.pack("<I", 10) + vp8x
    anim = struct.pack("<I", 0) + struct.pack("<H", loop)
    body += b"ANIM" + struct.pack("<I", 6) + anim
    for fr in frames:
        rgba = fr["rgba"]
        fh, fw = rgba.shape[:2]
        x, y = fr.get("x", 0), fr.get("y", 0)
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets must be even")
        if x + fw > cw or y + fh > ch:
            raise ValueError("frame exceeds canvas")
        sub = webp_encode_lossless(rgba)
        vp8l_at = sub.index(b"VP8L")
        vp8l_chunk = sub[vp8l_at:]
        head = (
            struct.pack("<I", x // 2)[:3]
            + struct.pack("<I", y // 2)[:3]
            + struct.pack("<I", fw - 1)[:3]
            + struct.pack("<I", fh - 1)[:3]
            + struct.pack("<I", fr.get("duration", 100))[:3]
            + bytes(
                [
                    (0x02 if not fr.get("blend", False) else 0)
                    | (0x01 if fr.get("dispose", 0) else 0)
                ]
            )
        )
        anmf = head + vp8l_chunk
        body += b"ANMF" + struct.pack("<I", len(anmf)) + anmf
        if len(anmf) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + bytes(body)


_META_CHUNKS = (b"EXIF", b"XMP ", b"ICCP")
_META_FLAGS = 0x20 | 0x08 | 0x04  # ICC | EXIF | XMP bits in VP8X


def webp_strip_metadata(payload: bytes) -> bytes:
    """Remove EXIF / XMP / ICCP chunks from a WebP container (and
    clear the matching VP8X feature flags); image chunks pass through
    byte-exact, so decoded pixels are unchanged by construction — the
    same privacy contract as :func:`exif.jpeg_strip_metadata`."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) container")
    off = 12
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    body = bytearray()
    while off + 8 <= end:
        tag = payload[off : off + 4]
        (size,) = struct.unpack("<I", payload[off + 4 : off + 8])
        chunk = payload[off : off + 8 + size + (size & 1)]
        if len(chunk) < 8 + size:
            raise ValueError("truncated WebP container chunk")
        if tag not in _META_CHUNKS:
            if tag == b"VP8X" and size >= 1:
                chunk = bytearray(chunk)
                chunk[8] &= ~_META_FLAGS & 0xFF
                chunk = bytes(chunk)
            body += chunk
        off += 8 + size + (size & 1)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + bytes(body)


# ------------------------------------------------------------ encoder


def _huff_lengths(freqs: list, limit: int) -> list:
    """Code lengths from frequencies, capped at ``limit`` by the
    halve-and-retry fallback (fixture-scale inputs never trip it)."""
    import heapq

    n = len(freqs)
    f = list(freqs)
    while True:
        heap = [(fv, i, ("leaf", i)) for i, fv in enumerate(f) if fv > 0]
        heapq.heapify(heap)
        if len(heap) < 2:
            raise ValueError("huffman build needs >= 2 symbols")
        tick = n
        while len(heap) > 1:
            fa, _, a = heapq.heappop(heap)
            fb, _, b = heapq.heappop(heap)
            heapq.heappush(heap, (fa + fb, tick, ("node", a, b)))
            tick += 1
        lengths = [0] * n
        stack = [(heap[0][2], 0)]
        max_len = 0
        while stack:
            node, depth = stack.pop()
            if node[0] == "leaf":
                lengths[node[1]] = max(depth, 1)
                max_len = max(max_len, depth)
            else:
                stack.append((node[1], depth + 1))
                stack.append((node[2], depth + 1))
        if max_len <= limit:
            return lengths
        f = [(fv + 1) // 2 if fv > 0 else 0 for fv in f]


def _canonical_codes(lengths: list) -> dict:
    used = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
    codes = {}
    code = 0
    prev_len = 0
    for ln, sym in used:
        code <<= ln - prev_len
        codes[sym] = (code, ln)
        code += 1
        prev_len = ln
    return codes


def _cl_ops(lengths: list) -> list:
    """RLE the code-length array into (cl_symbol, extra_bits, extra)
    ops exactly as the spec's code-length code expects."""
    ops = []
    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            while run:
                if run < 3:
                    ops.extend([(0, 0, 0)] * run)
                    run = 0
                elif run < 11:
                    ops.append((17, 3, run - 3))
                    run = 0
                else:
                    chunk = min(run, 138)
                    ops.append((18, 7, chunk - 11))
                    run -= chunk
            i = j
        else:
            ln = lengths[i]
            ops.append((ln, 0, 0))
            j = i + 1
            while j < n and lengths[j] == ln:
                j += 1
            run = j - i - 1
            while run >= 3:
                chunk = min(run, 6)
                ops.append((16, 2, chunk - 3))
                run -= chunk
            ops.extend([(ln, 0, 0)] * run)
            i = j
    return ops


def _write_prefix_code(bw: _BitWriter, lengths: list) -> dict:
    """Write a prefix code in whichever spec form fits; return the
    symbol -> (code, length) map for payload emission."""
    used = [sym for sym, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(used) <= 2 and all(s < 256 for s in used):
        bw.write(1, 1)  # simple form
        bw.write(len(used) - 1, 1)
        bw.write(1, 1)  # first symbol in 8 bits
        bw.write(used[0], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        bw.write(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    bw.write(0, 1)  # code-length-coded form
    ops = _cl_ops(lengths)
    cl_freq = [0] * 19
    for sym, _, _ in ops:
        cl_freq[sym] += 1
    n_used = sum(1 for f in cl_freq if f)
    if n_used == 1:
        cl_lengths = [0] * 19
        cl_lengths[next(i for i, f in enumerate(cl_freq) if f)] = 1
    else:
        cl_lengths = _huff_lengths(cl_freq, 7)
    num_codes = 19
    while num_codes > 4 and cl_lengths[_CL_ORDER[num_codes - 1]] == 0:
        num_codes -= 1
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol shortcut
    cl_codes = _canonical_codes(cl_lengths) if n_used > 1 else {
        next(i for i, f in enumerate(cl_freq) if f): (0, 0)
    }
    cl_rev = {
        sym: (_bit_reverse(code, ln), ln) for sym, (code, ln) in cl_codes.items()
    }
    for sym, ebits, extra in ops:
        bw.write(*cl_rev[sym])
        if ebits:
            bw.write(extra, ebits)
    return _canonical_codes(lengths)


def _prefix_encode(v: int) -> tuple:
    """Inverse of :func:`_prefix_value`: value -> (prefix_code,
    extra_bits, extra_value)."""
    if v <= 4:
        return v - 1, 0, 0
    for p in range(4, 40):
        extra = (p - 2) >> 1
        offset = (2 + (p & 1)) << extra
        if offset + 1 <= v <= offset + (1 << extra):
            return p, extra, v - offset - 1
    raise ValueError(f"prefix-encodable range exceeded: {v}")


def _tokenize(
    argb: list, w: int, h: int, cache_bits: int, use_rle: bool
) -> list:
    """Token stream for the spatial image: ('lit', a, r, g, b) |
    ('cache', idx) | ('copy', len, dist_code). The cache model mirrors
    the decoder's exactly (zero-initialized, insert on every emitted
    pixel) so encoder and decoder stay in lockstep."""
    tokens = []
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    n = len(argb)
    pos = 0
    while pos < n:
        px = argb[pos]
        if use_rle and pos > 0 and px == argb[pos - 1]:
            run = 1
            while pos + run < n and argb[pos + run] == px and run < 4096:
                run += 1
            tokens.append(("copy", run, 1 + 120))  # plain distance 1
            if cache is not None:
                cache[(_HASH_MUL * px & 0xFFFFFFFF) >> shift] = px
            pos += run
            continue
        if cache is not None:
            idx = (_HASH_MUL * px & 0xFFFFFFFF) >> shift
            if cache[idx] == px:
                tokens.append(("cache", idx))
                pos += 1
                continue
            cache[idx] = px
        tokens.append(
            ("lit", (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF)
        )
        pos += 1
    return tokens


def _write_spatial(
    bw: _BitWriter,
    argb: list,
    w: int,
    h: int,
    level0: bool,
    cache_bits: int = 0,
    use_rle: bool = False,
) -> None:
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    if level0:
        bw.write(0, 1)  # no meta prefix image
    tokens = _tokenize(argb, w, h, cache_bits, use_rle)
    cache_size = (1 << cache_bits) if cache_bits else 0
    freqs = [
        [0] * (256 + 24 + cache_size),
        [0] * 256,
        [0] * 256,
        [0] * 256,
        [0] * 40,
    ]
    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b = t
            freqs[0][g] += 1
            freqs[1][r] += 1
            freqs[2][b] += 1
            freqs[3][a] += 1
        elif t[0] == "cache":
            freqs[0][280 + t[1]] += 1
        else:
            lp, _, _ = _prefix_encode(t[1])
            freqs[0][256 + lp] += 1
            dp, _, _ = _prefix_encode(t[2])
            freqs[4][dp] += 1
    codes = []
    for f in freqs:
        used = [i for i, fv in enumerate(f) if fv]
        if not used:
            # the decoder still reads a code: emit a 1-symbol simple code
            lengths = [0] * len(f)
            lengths[0] = 1
        elif len(used) <= 2 and all(s < 256 for s in used):
            lengths = [0] * len(f)
            for s in used:
                lengths[s] = 1
        elif len(used) == 1:
            # single symbol >= 256: a degenerate length-coded trivial
            lengths = [0] * len(f)
            lengths[used[0]] = 1
        else:
            lengths = _huff_lengths(f, 15)
        codes.append(_write_prefix_code(bw, lengths))
    # pre-reverse each table once: payload emission is then one plain
    # LSB-first write per symbol (identical bits to write_code — see
    # _bit_reverse) instead of a per-symbol bit loop over ~200k tokens
    g_codes, r_codes, b_codes, a_codes, d_codes = (
        {sym: (_bit_reverse(code, ln), ln) for sym, (code, ln) in cmap.items()}
        for cmap in codes
    )
    write = bw.write
    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b = t
            # one fused LSB-first write == the four sequential writes
            cg, lg = g_codes[g]
            cr, lr = r_codes[r]
            cb, lb = b_codes[b]
            ca, la = a_codes[a]
            write(
                cg
                | (cr << lg)
                | (cb << (lg + lr))
                | (ca << (lg + lr + lb)),
                lg + lr + lb + la,
            )
        elif t[0] == "cache":
            write(*g_codes[280 + t[1]])
        else:
            _, length, dist_code = t
            lp, lbits, lextra = _prefix_encode(length)
            write(*g_codes[256 + lp])
            if lbits:
                write(lextra, lbits)
            dp, dbits, dextra = _prefix_encode(dist_code)
            write(*d_codes[dp])
            if dbits:
                write(dextra, dbits)


def _pack_rgba_argb(rgba: np.ndarray) -> list:
    a = rgba[..., 3].astype(np.uint32)
    r = rgba[..., 0].astype(np.uint32)
    g = rgba[..., 1].astype(np.uint32)
    b = rgba[..., 2].astype(np.uint32)
    return ((a << 24) | (r << 16) | (g << 8) | b).ravel().tolist()


def _container(vp8l_payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def webp_encode_lossless(
    rgba: np.ndarray,
    *,
    subtract_green: bool = False,
    cache_bits: int = 0,
    use_rle: bool = False,
) -> bytes:
    """Genuine lossless WebP bytes for an (h, w, 4) uint8 RGBA array:
    simple RIFF container + VP8L stream with real canonical prefix
    codes; optional subtract-green transform, color cache, and
    distance-1 LZ77 run tokens (all decode-identical — transforms are
    lossless)."""
    h, w = rgba.shape[:2]
    argb = _pack_rgba_argb(rgba)
    if subtract_green:
        for i, px in enumerate(argb):
            g = (px >> 8) & 0xFF
            r = (((px >> 16) & 0xFF) - g) & 0xFF
            b = ((px & 0xFF) - g) & 0xFF
            argb[i] = (px & 0xFF00FF00) | (r << 16) | b
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int(bool((rgba[..., 3] != 255).any())), 1)
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
    bw.write(0, 1)  # no more transforms
    _write_spatial(bw, argb, w, h, True, cache_bits=cache_bits, use_rle=use_rle)
    return _container(b"\x2f" + bw.getvalue())


def webp_encode_palette(
    indices: np.ndarray, palette_rgba: np.ndarray
) -> bytes:
    """Lossless WebP via the color-indexing transform: (h, w) index
    map + (n, 4) RGBA palette, with spec pixel bundling (1/2/4-bit
    indices packed least-significant-first) when n <= 16."""
    h, w = indices.shape
    n = len(palette_rgba)
    if not 1 <= n <= 256:
        raise ValueError("palette size out of range")
    if int(indices.max(initial=0)) >= n:
        raise ValueError("palette index out of range")
    pal_argb = _pack_rgba_argb(palette_rgba.reshape(1, n, 4))
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int(bool((palette_rgba[:, 3] != 255).any())), 1)
    bw.write(0, 3)
    bw.write(1, 1)  # transform present
    bw.write(3, 2)  # color indexing
    bw.write(n - 1, 8)
    # palette sub-image: component-wise delta coding
    deltas = []
    prev = 0
    for p in pal_argb:
        deltas.append(
            (
                (((p >> 24) - (prev >> 24)) & 0xFF) << 24
                | ((((p >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF) << 16
                | ((((p >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF) << 8
                | (((p & 0xFF) - (prev & 0xFF)) & 0xFF)
            )
        )
        prev = p
    _write_spatial(bw, deltas, n, 1, False)
    bw.write(0, 1)  # no more transforms
    xbits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
    packed_w = _ceil_div(w, 1 << xbits)
    bpp = 8 >> xbits
    packed = [0] * (packed_w * h)
    for y in range(h):
        for x in range(w):
            green = int(indices[y, x]) << ((x & ((1 << xbits) - 1)) * bpp)
            packed[y * packed_w + (x >> xbits)] |= green << 8
    packed = [0xFF000000 | p for p in packed]
    _write_spatial(bw, packed, packed_w, h, True)
    return _container(b"\x2f" + bw.getvalue())
