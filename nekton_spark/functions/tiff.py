r"""TIFF codec — from-spec baseline TIFF 6.0 reader/writer.

TIFF is the scan-and-archive format: multi-page document scans, fax
archives, remote-sensing tiles and museum/library digitizations are
overwhelmingly TIFF, so a 100 TB document crawl keeps meeting
``image/tiff`` payloads. No codec library ships in this environment,
so — like the JPEG/PNG/GIF/BMP/WebP decoders — this is an original
implementation from the public TIFF 6.0 specification (Adobe, 1992)
with the repo's refuse-or-decode-exactly discipline:

- both byte orders (``II`` little / ``MM`` big endian), classic
  32-bit IFDs; multi-page files walk the IFD chain
  (:func:`tiff_decode_pages`, page cap as a bomb guard);
- baseline strip organization: ``StripOffsets`` / ``StripByteCounts``
  / ``RowsPerStrip`` (tiled TIFF refuses reason-coded);
- compressions: **none** (1), **TIFF-LZW** (5 — MSB-first variable
  width codes 9→12 bits with the spec's EARLY-CHANGE width bump one
  code before the table fills, Clear/EOI, KwKwK), **Deflate** (8 and
  the legacy 32946 — zlib, bounded inflate), **PackBits** (32773 —
  Apple RLE: n≥0 literal run, n<0 repeat run, -128 noop);
  CCITT G3/G4 (2/3/4) and JPEG-in-TIFF (6/7) refuse reason-coded;
- photometrics: BlackIsZero / WhiteIsZero grayscale at 1/4/8 bits
  (bit-packed rows MSB-first, row-aligned), 8-bit RGB, and Palette
  (``ColorMap``'s 16-bit entries scaled ``>> 8`` per the common
  convention);
- horizontal differencing predictor (tag 317 = 2) for 8-bit LZW /
  Deflate samples, undone per row per sample channel.

The writer (:func:`tiff_encode`) emits genuine little-endian TIFFs —
real LZW with early-change, PackBits runs, multi-strip layout,
palette color maps, multi-page chains — so fixtures round-trip
through the same bit-level machinery real decoders use; the test
battery corrupts them (truncation, bit flips, garbage) and demands
refuse-or-decode-exactly.

Structural damage (bad magic, IFD out of bounds, strip overflow,
LZW code overflow, short strips) refuses as ValueError; the
pixel-count cap matches the other decoders' 2^26, and the IFD chain
caps at 10k pages.

Reference parity note: the reference engine has no media codecs
(``/root/reference/src/processors.rs`` is text-only) — this module
belongs to the LLM-pipeline mandate's multimodal surface, not
reference parity.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAX_PIXELS = 1 << 26
_MAX_PAGES = 10_000

# tag ids (TIFF 6.0 §8)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PREDICTOR = 317
_T_COLORMAP = 320

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

_COMPRESSION_REFUSALS = {
    2: "TIFF CCITT Group 3 1-D compression is outside the envelope",
    3: "TIFF CCITT T.4 (Group 3) compression is outside the envelope",
    4: "TIFF CCITT T.6 (Group 4) compression is outside the envelope",
    6: "TIFF old-style JPEG compression is outside the envelope",
    7: "TIFF JPEG compression is outside the envelope",
}


# ------------------------------------------------------------- reader


def _read_ifds(b: bytes):
    if len(b) < 8:
        raise ValueError("truncated TIFF header")
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF payload (bad magic)")
    (off,) = struct.unpack(e + "I", b[4:8])
    ifds = []
    seen = set()
    while off:
        if off in seen:
            raise ValueError("TIFF IFD chain cycles")
        seen.add(off)
        if len(ifds) >= _MAX_PAGES:
            raise ValueError("TIFF IFD chain exceeds page bound")
        if off + 2 > len(b):
            raise ValueError("TIFF IFD offset out of bounds")
        (n,) = struct.unpack(e + "H", b[off : off + 2])
        end = off + 2 + 12 * n
        if end + 4 > len(b):
            raise ValueError("TIFF IFD exceeds payload")
        tags = {}
        for i in range(n):
            eo = off + 2 + 12 * i
            tag, typ, cnt = struct.unpack(e + "HHI", b[eo : eo + 8])
            size = _TYPE_SIZES.get(typ)
            if size is None:
                continue  # unknown field type: spec says skip
            total = size * cnt
            if total <= 4:
                data = b[eo + 8 : eo + 8 + total]
            else:
                (voff,) = struct.unpack(e + "I", b[eo + 8 : eo + 12])
                if voff + total > len(b):
                    raise ValueError("TIFF tag value out of bounds")
                data = b[voff : voff + total]
            if typ in (3, 8):
                vals = list(struct.unpack(e + "H" * cnt, data))
            elif typ in (4, 9):
                vals = list(struct.unpack(e + "I" * cnt, data))
            elif typ in (1, 6, 7):
                vals = list(data)
            elif typ == 5:
                vals = [
                    struct.unpack(e + "II", data[8 * k : 8 * k + 8])
                    for k in range(cnt)
                ]
            else:  # ASCII
                vals = [data]
            tags[tag] = vals
        ifds.append(tags)
        (off,) = struct.unpack(e + "I", b[end : end + 4])
    if not ifds:
        raise ValueError("TIFF payload has no IFD")
    return ifds


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW (spec §13): MSB-first bit packing, 9-bit codes
    growing to 12 with the EARLY CHANGE (width bumps at table length
    511/1023/2047 — one before the power of two), Clear=256, EOI=257."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # stream ended without EOI: tolerate if output complete
                if len(out) >= expected:
                    return bytes(out[:expected])
                raise ValueError("TIFF LZW stream truncated")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            reset()
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF LZW first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW code overflows table")
        out += entry
        prev = entry
        # early change: bump BEFORE the table reaches 2^width
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
        if len(out) > expected:
            raise ValueError("TIFF LZW output exceeds strip size")
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n and len(out) < expected:
        c = data[pos]
        pos += 1
        if c == 128:
            continue
        if c < 128:
            if pos + c + 1 > n:
                raise ValueError("TIFF PackBits literal run truncated")
            out += data[pos : pos + c + 1]
            pos += c + 1
        else:
            if pos >= n:
                raise ValueError("TIFF PackBits repeat run truncated")
            out += bytes([data[pos]]) * (257 - c)
            pos += 1
    if len(out) < expected:
        raise ValueError("TIFF PackBits output short of strip size")
    return bytes(out[:expected])


def _as_int(v, tag: int) -> int:
    # a bit-flipped field type can deliver RATIONAL tuples or ASCII
    # bytes where a count belongs — refuse, don't TypeError
    if isinstance(v, (int, np.integer)):
        return int(v)
    raise ValueError(f"TIFF tag {tag} has a non-integer field type")


def _one(tags: dict, tag: int, default=None):
    v = tags.get(tag)
    if not v:  # absent OR a corrupt zero-count entry
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default
    return _as_int(v[0], tag)


def _decode_page(b: bytes, tags: dict) -> np.ndarray:
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF is outside the baseline envelope")
    w = int(_one(tags, _T_WIDTH))
    h = int(_one(tags, _T_LENGTH))
    if w <= 0 or h <= 0:
        raise ValueError("TIFF zero-dimension image")
    if w * h > _MAX_PIXELS:
        raise ValueError("TIFF image too large for the codec envelope")
    comp = int(_one(tags, _T_COMPRESSION, 1))
    if comp in _COMPRESSION_REFUSALS:
        raise NotImplementedError(_COMPRESSION_REFUSALS[comp])
    if comp not in (1, 5, 8, 32773, 32946):
        raise NotImplementedError(f"TIFF compression {comp} not decodable here")
    photo = int(_one(tags, _T_PHOTOMETRIC))
    samples = int(_one(tags, _T_SAMPLES, 1))
    bits_list = [_as_int(x, _T_BITS) for x in (tags.get(_T_BITS) or [1])]
    bits = bits_list[0]
    if any(x != bits for x in bits_list):
        raise NotImplementedError("TIFF mixed per-sample bit depths")
    predictor = int(_one(tags, _T_PREDICTOR, 1))
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} not supported")
    if predictor == 2 and bits != 8:
        raise NotImplementedError("TIFF predictor 2 requires 8-bit samples")
    if photo == 2:
        if samples < 3 or bits != 8:
            raise ValueError("TIFF RGB requires 3+ samples of 8 bits")
    elif photo in (0, 1):
        if samples != 1 or bits not in (1, 4, 8):
            raise NotImplementedError(
                "TIFF grayscale supports 1 sample at 1/4/8 bits"
            )
    elif photo == 3:
        if samples != 1 or bits not in (1, 4, 8):
            raise ValueError("TIFF palette requires 1 sample at 1/4/8 bits")
        if _T_COLORMAP not in tags:
            raise ValueError("TIFF palette image missing ColorMap")
    else:
        raise NotImplementedError(f"TIFF photometric {photo} not supported")

    offsets = [
        _as_int(x, _T_STRIP_OFFSETS) for x in tags.get(_T_STRIP_OFFSETS, [])
    ]
    counts = [
        _as_int(x, _T_STRIP_COUNTS) for x in tags.get(_T_STRIP_COUNTS, [])
    ]
    if not offsets or len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/counts missing or mismatched")
    rows_per_strip = int(_one(tags, _T_ROWS_PER_STRIP, h))
    if rows_per_strip <= 0:
        raise ValueError("TIFF RowsPerStrip must be positive")
    row_bytes = (w * bits * samples + 7) // 8

    raw = bytearray()
    rows_done = 0
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(b):
            raise ValueError("TIFF strip exceeds payload")
        strip_rows = min(rows_per_strip, h - rows_done)
        if strip_rows <= 0:
            break
        expected = strip_rows * row_bytes
        chunk = b[off : off + cnt]
        if comp == 1:
            if len(chunk) < expected:
                raise ValueError("TIFF uncompressed strip short")
            data = chunk[:expected]
        elif comp == 5:
            data = _lzw_decode_tiff(chunk, expected)
        elif comp in (8, 32946):
            d = zlib.decompressobj()
            try:
                data = d.decompress(chunk, expected + 1)
            except zlib.error as exc:
                raise ValueError(f"TIFF deflate strip: {exc}") from None
            if len(data) < expected:
                raise ValueError("TIFF deflate strip short")
            data = data[:expected]
        else:  # packbits
            data = _packbits_decode(chunk, expected)
        if predictor == 2:
            arr = np.frombuffer(data, dtype=np.uint8).reshape(
                strip_rows, w, samples
            )
            data = np.cumsum(arr, axis=1, dtype=np.uint32).astype(
                np.uint8
            ).tobytes()
        raw += data
        rows_done += strip_rows
    if rows_done < h:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")

    if bits == 8:
        plane = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(
            h, w, samples
        )
    else:
        rows = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, row_bytes)
        unpacked = np.unpackbits(rows, axis=1)
        if bits == 1:
            plane = unpacked[:, :w].reshape(h, w, 1)
        else:  # 4
            nib = unpacked.reshape(h, -1, 4)
            vals = (nib * (8, 4, 2, 1)).sum(axis=2).astype(np.uint8)
            plane = vals[:, :w].reshape(h, w, 1)

    if photo == 2:
        return plane[:, :, :3].copy()
    if photo == 3:
        cmap = [_as_int(x, _T_COLORMAP) for x in tags[_T_COLORMAP]]
        ncol = 1 << bits
        if len(cmap) < 3 * ncol:
            raise ValueError("TIFF ColorMap shorter than palette size")
        pal = (
            np.array(cmap[: 3 * ncol], dtype=np.uint16)
            .reshape(3, ncol)
            .T
            >> 8
        ).astype(np.uint8)
        idx = plane[:, :, 0]
        if int(idx.max(initial=0)) >= ncol:
            raise ValueError("TIFF palette index out of range")
        return pal[idx]
    # grayscale
    g = plane[:, :, 0]
    maxv = (1 << bits) - 1
    if photo == 0:  # WhiteIsZero
        g = maxv - g
    if bits != 8:
        g = (g.astype(np.uint16) * 255 // maxv).astype(np.uint8)
    return g.copy()


def tiff_decode_pages(payload: bytes) -> list:
    """Every page of a (possibly multi-page) TIFF, decoded: grayscale
    pages as (h, w) uint8, RGB/palette pages as (h, w, 3)."""
    b = bytes(payload)
    return [_decode_page(b, tags) for tags in _read_ifds(b)]


def tiff_decode(payload: bytes) -> np.ndarray:
    """First page of the TIFF (the ``decode_image`` contract)."""
    b = bytes(payload)
    return _decode_page(b, _read_ifds(b)[0])


def tiff_page_count(payload: bytes) -> int:
    return len(_read_ifds(bytes(payload)))


# ------------------------------------------------------------- writer


def _lzw_encode_tiff(data: bytes) -> bytes:
    """Real TIFF-LZW with early change — the inverse of
    :func:`_lzw_decode_tiff`, exercised bit-for-bit by the battery."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        # width accounting: the decoder lags the encoder by exactly one
        # table entry, and its EARLY-CHANGE bump fires when its next
        # free index reaches 2^w - 1 — which the encoder's next_code
        # reaches one code later, at 2^w. At width 12 the spec's CLEAR
        # point (4094) keeps the decoder's table from needing index
        # 4095.
        if width < 12:
            if next_code >= (1 << width):
                width += 1
        elif next_code >= 4094:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i + 1
        while (
            j < n
            and (j + 1 >= n or data[j] != data[j + 1])
            and j - i < 128
        ):
            j += 1
        lit = data[i:j]
        out += bytes([len(lit) - 1]) + lit
        i = j
    return bytes(out)


def tiff_encode(
    pages: list,
    *,
    compression: int = 1,
    photometric: int | None = None,
    palette: np.ndarray | None = None,
    rows_per_strip: int | None = None,
    predictor: int = 1,
    bits: int = 8,
) -> bytes:
    """Genuine little-endian TIFF bytes. ``pages`` is a list of
    arrays: (h, w) grayscale / palette indices, or (h, w, 3) RGB.
    ``compression``: 1 none / 5 LZW / 8 deflate / 32773 PackBits.
    ``photometric`` defaults to 1 (BlackIsZero) for 2-D pages and 2
    for RGB; pass 0 for WhiteIsZero fixtures (samples stored
    inverted-ready) or 3 with ``palette`` (n, 3) uint8. ``bits`` 1/4/8
    for single-sample pages (bit-packed rows MSB-first)."""
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    ifd_ptr_at = 4
    for page in pages:
        page = np.asarray(page, dtype=np.uint8)
        rgb = page.ndim == 3
        h, w = page.shape[:2]
        samples = 3 if rgb else 1
        photo = photometric if photometric is not None else (2 if rgb else 1)
        pbits = 8 if rgb else bits
        rps = rows_per_strip or h
        if pbits == 8:
            rowdata = page.reshape(h, w * samples)
        else:
            if rgb:
                raise ValueError("bit-packed rows are single-sample only")
            nbit = np.unpackbits(
                page.reshape(h, w, 1), axis=2, count=8
            )[:, :, 8 - pbits :]
            flat = nbit.reshape(h, w * pbits)
            pad = (-flat.shape[1]) % 8
            if pad:
                flat = np.concatenate(
                    [flat, np.zeros((h, pad), dtype=np.uint8)], axis=1
                )
            rowdata = np.packbits(flat, axis=1)
        strips = []
        for y0 in range(0, h, rps):
            rows = rowdata[y0 : y0 + rps]
            if predictor == 2:
                if pbits != 8:
                    raise ValueError("predictor 2 requires 8-bit samples")
                arr = rows.reshape(rows.shape[0], w, samples).astype(np.int16)
                diff = np.empty_like(arr)
                diff[:, 0] = arr[:, 0]
                diff[:, 1:] = arr[:, 1:] - arr[:, :-1]
                rows = (diff & 0xFF).astype(np.uint8).reshape(
                    rows.shape[0], -1
                )
            raw = rows.tobytes()
            if compression == 1:
                strips.append(raw)
            elif compression == 5:
                strips.append(_lzw_encode_tiff(raw))
            elif compression == 8:
                strips.append(zlib.compress(raw, 6))
            elif compression == 32773:
                strips.append(_packbits_encode(raw))
            else:
                raise ValueError(f"unsupported encode compression {compression}")
        strip_offsets = []
        for s in strips:
            strip_offsets.append(len(out))
            out += s
            if len(out) & 1:
                out += b"\x00"

        entries = []  # (tag, type, count, packed-or-offsetdata)

        def short(tag, *vals):
            entries.append((tag, 3, vals))

        def long_(tag, *vals):
            entries.append((tag, 4, vals))

        short(_T_WIDTH, w)
        short(_T_LENGTH, h)
        short(_T_BITS, *([pbits] * samples))
        short(_T_COMPRESSION, compression)
        short(_T_PHOTOMETRIC, photo)
        long_(_T_STRIP_OFFSETS, *strip_offsets)
        short(_T_SAMPLES, samples)
        short(_T_ROWS_PER_STRIP, rps)
        long_(_T_STRIP_COUNTS, *[len(s) for s in strips])
        if predictor == 2:
            short(_T_PREDICTOR, 2)
        if photo == 3:
            if palette is None:
                raise ValueError("photometric 3 requires a palette")
            ncol = 1 << pbits
            pal = np.zeros((ncol, 3), dtype=np.uint16)
            pal[: len(palette)] = palette.astype(np.uint16) << 8
            short(_T_COLORMAP, *pal.T.reshape(-1).tolist())

        # materialize out-of-line values, then the IFD
        blobs = []
        for tag, typ, vals in entries:
            size = _TYPE_SIZES[typ] * len(vals)
            if size > 4:
                at = len(out)
                packed = struct.pack(
                    "<" + ("H" if typ == 3 else "I") * len(vals), *vals
                )
                out += packed
                if len(out) & 1:
                    out += b"\x00"
                blobs.append((tag, typ, len(vals), struct.pack("<I", at)))
            else:
                packed = struct.pack(
                    "<" + ("H" if typ == 3 else "I") * len(vals), *vals
                )
                blobs.append(
                    (tag, typ, len(vals), packed + b"\x00" * (4 - size))
                )
        ifd_at = len(out)
        struct.pack_into("<I", out, ifd_ptr_at, ifd_at)
        out += struct.pack("<H", len(blobs))
        for tag, typ, cnt, val4 in sorted(blobs):
            out += struct.pack("<HHI", tag, typ, cnt) + val4
        ifd_ptr_at = len(out)
        out += struct.pack("<I", 0)  # next-IFD pointer (patched next loop)
    return bytes(out)
