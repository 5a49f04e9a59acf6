r"""BMP codec — the uncompressed/RLE Windows bitmap envelope.

BMP is the legacy-corpus format: screenshots, scans, dataset dumps from
Windows tooling. Original implementation from the public BMP file
format (BITMAPFILEHEADER + BITMAPINFOHEADER layout, Windows 3.x), same
refuse-or-decode-exactly discipline as the JPEG/PNG/GIF siblings:

- BI_RGB at 1/4/8 bpp (palette, BGRA quads), 24 bpp (BGR triples) and
  32 bpp (BGRx, the padding byte dropped);
- BI_RLE8 (the common compressed 8-bit flavor): encoded runs,
  absolute mode with word alignment, end-of-line / end-of-bitmap /
  delta escapes — delta refuses (it leaves pixels undefined unless a
  background contract exists, which corpus decode does not have);
- bottom-up rows (positive height) and top-down (negative height),
  4-byte row padding;
- refusals: other compressions (RLE4/bitfields/JPEG-in-BMP), bad
  signature, truncated headers/rows, palette index overflow, the
  shared 2^26 pixel cap.

Output: (h, w, 3) uint8 RGB (palette expanded; BGR swapped).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 1 << 26

_BI_RGB, _BI_RLE8 = 0, 1


def bmp_encode(
    img: np.ndarray,
    bpp: int = 24,
    palette: np.ndarray | None = None,
    top_down: bool = False,
    rle8: bool = False,
) -> bytes:
    """Genuine BMP bytes. ``img`` is (h, w, 3) RGB for bpp 24/32, or
    (h, w) palette indices with ``palette`` (n, 3) RGB for bpp 1/4/8.
    ``rle8`` writes BI_RLE8 (bpp must be 8): encoded-mode runs with
    end-of-line escapes — real RLE, exercised against the decoder."""
    h, w = img.shape[:2]
    if bpp in (1, 4, 8):
        if palette is None:
            raise ValueError("palette required for indexed BMP")
        pal = np.asarray(palette, dtype=np.uint8)
        n_colors = pal.shape[0]
        if n_colors > (1 << bpp):
            raise ValueError(f"palette size {n_colors} exceeds {bpp} bpp")
        quads = np.zeros((n_colors, 4), dtype=np.uint8)
        quads[:, 0] = pal[:, 2]  # BGR0 quads
        quads[:, 1] = pal[:, 1]
        quads[:, 2] = pal[:, 0]
        pal_bytes = quads.tobytes()
        idx = img.astype(np.uint8)
        if rle8:
            if bpp != 8:
                raise ValueError("RLE8 requires bpp=8")
            data = bytearray()
            for y in range(h - 1, -1, -1) if not top_down else range(h):
                row = idx[y]
                x = 0
                while x < w:
                    run = 1
                    while x + run < w and row[x + run] == row[x] and run < 255:
                        run += 1
                    data += bytes([run, row[x]])
                    x += run
                data += b"\x00\x00"  # end of line
            data = bytes(data[:-2] + b"\x00\x01")  # last EOL → end of bitmap
            comp = _BI_RLE8
        else:
            row_bytes = (w * bpp + 7) // 8
            pad = (-row_bytes) % 4
            rows = []
            for y in range(h - 1, -1, -1) if not top_down else range(h):
                if bpp == 8:
                    rb = idx[y].tobytes()
                else:
                    per = 8 // bpp
                    padded = np.zeros(((w + per - 1) // per) * per, dtype=np.uint8)
                    padded[:w] = idx[y]
                    packed = np.zeros(len(padded) // per, dtype=np.uint8)
                    for j in range(per):
                        packed |= padded[j::per] << (8 - bpp * (j + 1))
                    rb = packed.tobytes()
                rows.append(rb + b"\x00" * pad)
            data = b"".join(rows)
            comp = _BI_RGB
    elif bpp in (24, 32):
        pal_bytes = b""
        nch = bpp // 8
        row_bytes = w * nch
        pad = (-row_bytes) % 4
        rows = []
        for y in range(h - 1, -1, -1) if not top_down else range(h):
            px = img[y]
            b = np.zeros((w, nch), dtype=np.uint8)
            b[:, 0] = px[:, 2]
            b[:, 1] = px[:, 1]
            b[:, 2] = px[:, 0]
            rows.append(b.tobytes() + b"\x00" * pad)
        data = b"".join(rows)
        comp = _BI_RGB
    else:
        raise ValueError(f"unsupported encode bpp {bpp}")
    off = 14 + 40 + len(pal_bytes)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, -h if top_down else h, 1, bpp, comp, len(data),
        2835, 2835, len(pal_bytes) // 4, 0,
    )
    head = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    return head + info + pal_bytes + data


def bmp_decode(payload: bytes) -> np.ndarray:
    b = bytes(payload)
    if len(b) < 14 or b[:2] != b"BM":
        raise ValueError("not a BMP payload (missing BM signature)")
    if len(b) < 54:
        raise ValueError("truncated BMP: short headers")
    (_sig, _size, _r1, _r2, off) = struct.unpack("<2sIHHI", b[:14])
    hdr_size = struct.unpack("<I", b[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError(
            f"BMP header size {hdr_size} (OS/2 core headers) not supported"
        )
    (
        _hs, w, h_signed, planes, bpp, comp, _isz, _xp, _yp, clr_used, _clr_imp
    ) = struct.unpack("<IiiHHIIiiII", b[14:54])
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h == 0:
        raise ValueError(f"zero-dimension BMP ({w}x{h_signed}) refused")
    if w * h > _MAX_PIXELS:
        raise ValueError(f"BMP dimensions {w}x{h} exceed decode cap")
    if planes != 1:
        raise ValueError(f"BMP planes {planes} != 1")
    if comp == _BI_RLE8:
        if bpp != 8:
            raise ValueError(f"BI_RLE8 with bpp {bpp} refused")
    elif comp != _BI_RGB:
        raise NotImplementedError(
            f"BMP compression {comp} not supported (BI_RGB/BI_RLE8 only)"
        )
    if bpp not in (1, 4, 8, 24, 32):
        raise NotImplementedError(f"BMP bit depth {bpp} not supported")

    pal = None
    if bpp <= 8:
        n_colors = clr_used or (1 << bpp)
        pal_end = 14 + hdr_size + 4 * n_colors
        if pal_end > len(b) or pal_end > off:
            raise ValueError("truncated BMP: palette exceeds pixel offset")
        quads = np.frombuffer(
            b[14 + hdr_size : pal_end], dtype=np.uint8
        ).reshape(n_colors, 4)
        pal = quads[:, [2, 1, 0]].copy()  # BGR0 → RGB

    if off > len(b):
        raise ValueError("truncated BMP: pixel offset beyond payload")
    data = b[off:]

    if comp == _BI_RLE8:
        idx = np.zeros((h, w), dtype=np.uint8)
        x, y, p = 0, 0, 0
        n = len(data)
        done = False
        while not done:
            if p + 2 > n:
                raise ValueError("truncated BMP: RLE stream ended mid-pair")
            c0, c1 = data[p], data[p + 1]
            p += 2
            if c0 > 0:  # encoded run
                if y >= h or x + c0 > w:
                    raise ValueError("corrupt BMP: RLE run overflows row")
                idx[y, x : x + c0] = c1
                x += c0
            elif c1 == 0:  # end of line
                x, y = 0, y + 1
            elif c1 == 1:  # end of bitmap
                done = True
            elif c1 == 2:  # delta: undefined pixels
                raise NotImplementedError(
                    "BMP RLE8 delta escape leaves pixels undefined; refused"
                )
            else:  # absolute mode: c1 literal bytes, word-aligned
                if y >= h or x + c1 > w:
                    raise ValueError("corrupt BMP: RLE absolute overflows row")
                end = p + c1
                if end > n:
                    raise ValueError("truncated BMP: RLE absolute run")
                idx[y, x : x + c1] = np.frombuffer(data[p:end], dtype=np.uint8)
                x += c1
                p = end + (c1 & 1)
        rows = idx if top_down else idx[::-1]
        if int(rows.max(initial=0)) >= pal.shape[0]:
            raise ValueError("corrupt BMP: palette index out of range")
        return pal[rows]

    row_bytes = (w * bpp + 7) // 8
    stride = row_bytes + ((-row_bytes) % 4)
    if len(data) < stride * h:
        raise ValueError("truncated BMP: pixel data shorter than h rows")
    raw = np.frombuffer(data[: stride * h], dtype=np.uint8).reshape(h, stride)
    raw = raw if top_down else raw[::-1]
    if bpp in (24, 32):
        nch = bpp // 8
        px = raw[:, : w * nch].reshape(h, w, nch)
        return px[:, :, [2, 1, 0]].copy()
    if bpp == 8:
        idx = raw[:, :w]
    else:
        per = 8 // bpp
        bits = raw[:, :row_bytes]
        cols = []
        for j in range(per):
            shift = 8 - bpp * (j + 1)
            cols.append((bits >> shift) & ((1 << bpp) - 1))
        idx = np.stack(cols, axis=2).reshape(h, -1)[:, :w]
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("corrupt BMP: palette index out of range")
    return pal[idx]
