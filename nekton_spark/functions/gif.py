r"""GIF codec — from-spec LZW, palettes, interlace, animation frames.

GIF is the third big still-image format in web crawls (after JPEG/PNG)
and the dominant short-animation container; a 100 TB multimodal corpus
hits it constantly. No codec library ships in this environment, so —
like the JPEG (functions/jpeg.py) and PNG (functions/multimodal.py)
decoders — this is an original implementation from the public
GIF87a/GIF89a specification (CompuServe 1987/1989, spec appendix F
for the LZW variant) with this repo's refuse-or-decode-exactly
discipline:

- header + Logical Screen Descriptor, global/local color tables;
- the GIF flavor of LZW: LSB-first variable-width codes (min+1 .. 12
  bits), CLEAR/EOI codes, table rebuild, the KwKwK self-reference
  case, deferred-clear (a full table freezes insertion until the next
  CLEAR), data packaged in ≤255-byte sub-blocks;
- 4-pass row interlace (rows 0::8, 4::8, 2::4, 1::2);
- Graphic Control Extension: transparency index → RGBA output;
  other extensions (application/comment/plain-text) skip by length;
- animation (r13 — sub-canvas COMPOSITION, closing the r12 verdict's
  largest codec gap): real animated GIFs are predominantly delta
  frames — sub-canvas patches composited onto the prior canvas under
  a per-frame disposal method. The composition contract:

  * the canvas starts fully TRANSPARENT (what browsers render);
  * each frame's patch rectangle must lie inside the canvas (else
    ValueError); patch pixels equal to the frame's transparent index
    leave the canvas unchanged, all others write (palette RGB, 255);
  * the emitted frame is the canvas AFTER the patch lands — always
    (h, w, 4) RGBA on the composition path;
  * disposal 0 (unspecified) / 1 (do not dispose) leave the canvas;
    disposal 2 (restore to background) clears the patch RECTANGLE to
    transparent after the frame is emitted (browser semantics — the
    spec's "background color" renders as transparency);
  * disposal 3 (restore to previous, r14 — the last GIF disposal):
    after the frame is emitted, the patch RECTANGLE reverts to its
    pre-render pixels (one saved patch copy per frame, never a second
    full canvas); reserved values 4-7 refuse.

  BYTE-IDENTICAL legacy contract: an animation whose frames ALL cover
  the full canvas (and use no disposal-3 frame — a transparent
  restore-to-previous frame changes what successors composite over
  even at full canvas) decodes exactly as before — each frame
  independent, RGB (or RGBA via its own GCE transparency), no
  composition state. A sub-canvas or disposal-3 frame switches the
  container to the composition path.

Structural damage (bad signature, truncated sub-blocks, out-of-range
LZW codes, palette index overflow, missing trailer) refuses as
ValueError; the pixel-count cap matches the PNG/JPEG decoders' 2^26.

The encoder (:func:`gif_encode`) writes genuine GIF89a bytes with a
real growing-table LZW compressor — fixtures round-trip through the
same bit-level path real decoders use, not a stub.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 1 << 26  # shared decode cap (PNG/JPEG parity)
_MAX_CODE = 4095  # 12-bit LZW ceiling (GIF spec appendix F)

# interlace passes: (first row, stride)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------- LZW

def _lzw_decode(data: bytes, min_code: int, expected: int) -> bytes:
    """GIF LZW → index bytes. ``expected`` bounds the output (bomb
    guard + exactness check happens at the caller). Semantics: codes
    are LSB-first; the table slot counter advances after EVERY data
    code (the first after CLEAR included), so width grows when the
    slot counter hits 1<<width; at 12 bits insertion freezes until
    the next CLEAR (deferred clear)."""
    if not 2 <= min_code <= 8:
        raise ValueError(f"illegal GIF LZW minimum code size {min_code}")
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    # prefix/suffix tables: entry i (> eoi) = string(prefix[i]) + chr(suffix[i])
    prefix = np.zeros(_MAX_CODE + 1, dtype=np.int32)
    suffix = np.zeros(_MAX_CODE + 1, dtype=np.uint8)
    hi = eoi  # last used slot; next insert goes to hi (post-increment below)
    last = -1  # -1 = no pending prefix (start / after clear / frozen)
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    def expand(code: int) -> bytes:
        s = bytearray()
        while code > eoi:
            s.append(suffix[code])
            code = int(prefix[code])
        s.append(code)
        s.reverse()
        return bytes(s)

    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated GIF: LZW stream ended mid-code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            width = min_code + 1
            hi = eoi
            last = -1
            continue
        if code == eoi:
            break
        if code < clear:
            out.append(code)
            if last >= 0 and hi < _MAX_CODE:
                hi += 1
                prefix[hi] = last
                suffix[hi] = code
        elif last >= 0 and code <= hi + 1 and hi < _MAX_CODE:
            # normal expand, or KwKwK when code == hi+1
            hi += 1
            prefix[hi] = last
            if code == hi:  # KwKwK: entry completes with its own first byte
                s = expand(last)
                suffix[hi] = s[0]
                out.extend(s)
                out.append(s[0])
            else:
                s = expand(code)
                suffix[hi] = s[0]
                out.extend(s)
        elif last >= 0 and code <= hi:
            # table frozen at 12 bits: existing codes still decode
            out.extend(expand(code))
        else:
            raise ValueError(f"corrupt GIF: LZW code {code} out of range")
        if len(out) > expected:
            raise ValueError(
                f"corrupt GIF: LZW output exceeds frame size {expected}"
            )
        last = code
        if hi + 1 == (1 << width) and width < 12:
            width += 1
    return bytes(out)


def _lzw_encode(indices: bytes, min_code: int) -> bytes:
    """Index bytes → GIF LZW (growing table, CLEAR on table full,
    deferred-width rule mirroring :func:`_lzw_decode`: the slot
    counter also advances on the final flushed code, so the EOI code
    is written at the grown width)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code + 1
    hi = eoi
    table: dict[tuple[int, int], int] = {}
    emit(clear, width)
    cur = -1
    for b in indices:
        if cur < 0:
            cur = b
            continue
        nxt = table.get((cur, b))
        if nxt is not None:
            cur = nxt
            continue
        emit(cur, width)
        # mirror the decoder's slot advance (+ width growth)
        hi += 1
        table[(cur, b)] = hi
        if hi == (1 << width) and width < 12:
            width += 1
        cur = b
        if hi >= _MAX_CODE:
            emit(clear, width)
            width = min_code + 1
            hi = eoi
            table.clear()
    if cur >= 0:
        emit(cur, width)
        hi += 1  # the decoder advances its slot counter on this read too
        if hi == (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------ encoder

def gif_encode(
    frames,
    palette: np.ndarray,
    interlace: bool = False,
    transparent_index: int | None = None,
    delay_cs: int = 4,
) -> bytes:
    """Genuine GIF89a bytes: one or more full-canvas frames of palette
    indices (h, w) over one global color table. ``palette`` is
    (n, 3) uint8 with n a power of two in 2..256; ``transparent_index``
    adds a Graphic Control Extension marking that index transparent
    (decode returns RGBA)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    pal = np.asarray(palette, dtype=np.uint8)
    n_colors = pal.shape[0]
    if n_colors < 2 or n_colors > 256 or n_colors & (n_colors - 1):
        raise ValueError(f"palette size {n_colors} must be a power of two in 2..256")
    depth = max(1, int(n_colors).bit_length() - 1)
    h, w = frames[0].shape
    body = bytearray()
    body += b"GIF89a"
    # LSD: canvas w/h, GCT flag + color resolution + size bits
    body += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7) << 4 | (depth - 1), 0, 0)
    body += pal.tobytes()
    min_code = max(2, depth)
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must cover the full canvas")
        if int(fr.max(initial=0)) >= n_colors:
            raise ValueError("palette index out of range")
        if transparent_index is not None or len(frames) > 1:
            # GCE block: introducer, label, size 4, packed (disposal 0,
            # no user input, transparency flag), delay, index, term
            tflag = 1 if transparent_index is not None else 0
            body += struct.pack(
                "<BBBBHBB", 0x21, 0xF9, 4, tflag, delay_cs,
                transparent_index or 0, 0,
            )
        idx = fr.astype(np.uint8)
        if interlace:
            rows = []
            for start, step in _INTERLACE:
                rows.append(idx[start::step])
            idx = np.concatenate(rows, axis=0)
        body += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
        body += bytes([min_code])
        stream = _lzw_encode(idx.tobytes(), min_code)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            body += bytes([len(chunk)]) + chunk
        body += b"\x00"
    body += b"\x3b"
    return bytes(body)


def gif_encode_anim(
    patches,
    palette: np.ndarray,
    canvas: tuple[int, int],
    interlace: bool = False,
    delay_cs: int = 4,
) -> bytes:
    """GIF89a with per-frame placement/disposal/transparency — the
    delta-frame fixture writer for the composition path. ``patches``
    is a list of dicts: ``indices`` (fh, fw) palette indices, ``x0`` /
    ``y0`` placement (default 0), ``disposal`` 0|1|2|3 (default 0) and
    ``transparent`` index or None; ``canvas`` is (w, h). Shares the
    LZW/packaging guts with :func:`gif_encode`."""
    pal = np.asarray(palette, dtype=np.uint8)
    n_colors = pal.shape[0]
    if n_colors < 2 or n_colors > 256 or n_colors & (n_colors - 1):
        raise ValueError(f"palette size {n_colors} must be a power of two in 2..256")
    depth = max(1, int(n_colors).bit_length() - 1)
    w, h = canvas
    body = bytearray()
    body += b"GIF89a"
    body += struct.pack(
        "<HHBBB", w, h, 0x80 | ((depth - 1) & 7) << 4 | (depth - 1), 0, 0
    )
    body += pal.tobytes()
    min_code = max(2, depth)
    for p in patches:
        idx = np.asarray(p["indices"], dtype=np.uint8)
        fh, fw = idx.shape
        x0, y0 = int(p.get("x0", 0)), int(p.get("y0", 0))
        disposal = int(p.get("disposal", 0))
        transparent = p.get("transparent")
        if disposal not in (0, 1, 2, 3):
            raise ValueError(f"disposal {disposal} not encodable here")
        if x0 + fw > w or y0 + fh > h:
            raise ValueError("patch rectangle exceeds canvas")
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("palette index out of range")
        tflag = 1 if transparent is not None else 0
        body += struct.pack(
            "<BBBBHBB", 0x21, 0xF9, 4, (disposal << 2) | tflag, delay_cs,
            transparent or 0, 0,
        )
        if interlace:
            rows = []
            for start, step in _INTERLACE:
                rows.append(idx[start::step])
            idx = np.concatenate(rows, axis=0)
        body += struct.pack(
            "<BHHHHB", 0x2C, x0, y0, fw, fh, 0x40 if interlace else 0
        )
        body += bytes([min_code])
        stream = _lzw_encode(idx.tobytes(), min_code)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            body += bytes([len(chunk)]) + chunk
        body += b"\x00"
    body += b"\x3b"
    return bytes(body)


# ------------------------------------------------------------ decoder

def _read_color_table(b: bytes, pos: int, depth_bits: int):
    n = 2 << depth_bits
    end = pos + 3 * n
    if end > len(b):
        raise ValueError("truncated GIF: color table exceeds payload")
    return np.frombuffer(b[pos:end], dtype=np.uint8).reshape(n, 3), end


def _skip_subblocks(b: bytes, pos: int) -> int:
    while True:
        if pos >= len(b):
            raise ValueError("truncated GIF: unterminated sub-blocks")
        sz = b[pos]
        pos += 1
        if sz == 0:
            return pos
        if pos + sz > len(b):
            raise ValueError("truncated GIF: sub-block exceeds payload")
        pos += sz


def _parse(payload: bytes):
    """Walk the container; yield per-frame dicts. Shared by decode /
    frame-count so the structural validation is identical."""
    b = bytes(payload)
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a signature)")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    if sw == 0 or sh == 0:
        raise ValueError(f"zero-dimension GIF ({sw}x{sh}) refused")
    if sw * sh > _MAX_PIXELS:
        raise ValueError(f"GIF dimensions {sw}x{sh} exceed decode cap")
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(b, pos, packed & 7)
    transparent = None
    pending_disposal = 0
    saw_trailer = False
    frames = []
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            saw_trailer = True
            break
        if block == 0x21:  # extension
            if pos >= len(b):
                raise ValueError("truncated GIF: bare extension introducer")
            label = b[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                if pos + 6 > len(b) or b[pos] != 4:
                    raise ValueError("truncated GIF: short GCE block")
                flags = b[pos + 1]
                tidx = b[pos + 4]
                transparent = tidx if flags & 1 else None
                disposal = (flags >> 2) & 7
                pos = _skip_subblocks(b, pos)
                if disposal not in (0, 1, 2, 3):
                    # 4-7 are reserved in GIF89a — refuse, don't guess
                    raise NotImplementedError(
                        f"GIF disposal method {disposal} is reserved"
                    )
                pending_disposal = disposal
            else:  # application / comment / plain text: skip by length
                pos = _skip_subblocks(b, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02X}")
        if pos + 9 > len(b):
            raise ValueError("truncated GIF: short image descriptor")
        x0, y0, fw, fh, fpacked = struct.unpack("<HHHHB", b[pos : pos + 9])
        pos += 9
        lct = None
        if fpacked & 0x80:
            lct, pos = _read_color_table(b, pos, fpacked & 7)
        if pos >= len(b):
            raise ValueError("truncated GIF: missing LZW minimum code size")
        min_code = b[pos]
        pos += 1
        start = pos
        pos = _skip_subblocks(b, pos)
        raw = bytearray()
        p = start
        while b[p] != 0:
            raw += b[p + 1 : p + 1 + b[p]]
            p += 1 + b[p]
        frames.append(
            {
                "x0": x0, "y0": y0, "w": fw, "h": fh,
                "interlace": bool(fpacked & 0x40),
                "table": lct if lct is not None else gct,
                "min_code": min_code,
                "lzw": bytes(raw),
                "transparent": transparent,
                "disposal": pending_disposal,
            }
        )
        transparent = None
        pending_disposal = 0
    if not saw_trailer:
        raise ValueError("truncated GIF: missing trailer")
    return sw, sh, frames


def _decode_patch(fr: dict) -> np.ndarray:
    """One frame's LZW stream → (fh, fw) palette-index array
    (deinterlaced, palette-range-checked) — the shared kernel of the
    independent and composition paths."""
    if fr["table"] is None:
        raise ValueError("GIF frame has neither local nor global color table")
    fh, fw = fr["h"], fr["w"]
    n = fw * fh
    if n == 0:
        raise ValueError("zero-dimension GIF frame refused")
    idx = np.frombuffer(
        _lzw_decode(fr["lzw"], fr["min_code"], n), dtype=np.uint8
    )
    if len(idx) != n:
        raise ValueError(
            f"GIF pixel data inconsistent with frame size: {len(idx)} "
            f"indices for {n} expected"
        )
    if int(idx.max(initial=0)) >= fr["table"].shape[0]:
        raise ValueError("corrupt GIF: palette index out of range")
    idx = idx.reshape(fh, fw)
    if fr["interlace"]:
        de = np.empty_like(idx)
        row = 0
        for start, step in _INTERLACE:
            cnt = len(range(start, fh, step))
            de[start::step] = idx[row : row + cnt]
            row += cnt
        idx = de
    return idx


def _decode_frame(sw: int, sh: int, fr: dict) -> np.ndarray:
    """Independent (legacy, byte-identical) decode of one FULL-CANVAS
    frame: RGB, or RGBA via the frame's own GCE transparency."""
    if (fr["x0"], fr["y0"], fr["w"], fr["h"]) != (0, 0, sw, sh):
        raise NotImplementedError(
            "sub-canvas GIF frame requires composition against prior "
            f"frames (frame {fr['w']}x{fr['h']}@{fr['x0']},{fr['y0']} on "
            f"a {sw}x{sh} canvas) — use the composition path"
        )
    idx = _decode_patch(fr)
    rgb = fr["table"][idx]
    if fr["transparent"] is not None:
        alpha = np.where(idx == fr["transparent"], 0, 255).astype(np.uint8)
        return np.dstack([rgb, alpha])
    return rgb


def _full_canvas(sw: int, sh: int, frames: list[dict]) -> bool:
    """True when every frame may decode INDEPENDENTLY (the legacy
    byte-identical contract): full-canvas rectangles and no
    restore-to-previous disposal (a transparent disposal-3 frame
    changes what its successors composite over even at full canvas)."""
    return all(
        (fr["x0"], fr["y0"], fr["w"], fr["h"]) == (0, 0, sw, sh)
        and fr["disposal"] != 3
        for fr in frames
    )


def _iter_composited(sw: int, sh: int, frames: list[dict]):
    """Yield the composited (sh, sw, 4) RGBA canvas after each frame
    (module-docstring contract). The yielded array is the LIVE canvas —
    callers that keep a frame must ``.copy()`` it before advancing."""
    canvas = np.zeros((sh, sw, 4), dtype=np.uint8)
    for fr in frames:
        x0, y0, fw, fh = fr["x0"], fr["y0"], fr["w"], fr["h"]
        if x0 + fw > sw or y0 + fh > sh:
            raise ValueError(
                f"corrupt GIF: frame rectangle {fw}x{fh}@{x0},{y0} "
                f"exceeds the {sw}x{sh} canvas"
            )
        idx = _decode_patch(fr)
        rgb = fr["table"][idx]
        region = canvas[y0 : y0 + fh, x0 : x0 + fw]
        # disposal 3 (restore to previous): the area overwritten by
        # this frame reverts to its pre-render pixels after the frame
        # is emitted — ONE saved patch-rectangle per frame, never a
        # second full canvas (GIF89a §23; r13 verdict #5)
        saved = region.copy() if fr["disposal"] == 3 else None
        if fr["transparent"] is not None:
            opaque = idx != fr["transparent"]
            region[opaque, :3] = rgb[opaque]
            region[opaque, 3] = 255
        else:
            region[..., :3] = rgb
            region[..., 3] = 255
        yield canvas
        if fr["disposal"] == 2:
            region[:] = 0
        elif saved is not None:
            region[:] = saved


def gif_decode(payload: bytes) -> np.ndarray:
    """First frame → (h, w, 3) uint8 RGB, or (h, w, 4) RGBA when the
    frame's GCE marks a transparent index. A sub-canvas first frame
    composites onto the transparent canvas → (h, w, 4) RGBA."""
    sw, sh, frames = _parse(payload)
    if not frames:
        raise ValueError("GIF contains no image data")
    if _full_canvas(sw, sh, frames[:1]):
        return _decode_frame(sw, sh, frames[0])
    return next(_iter_composited(sw, sh, frames[:1])).copy()


def gif_decode_frames(payload: bytes) -> list[np.ndarray]:
    """All frames. All-full-canvas animations decode independently
    (legacy byte-identical contract); any sub-canvas frame switches
    the whole container to the composition path (every emitted frame
    is the composited (h, w, 4) RGBA canvas)."""
    sw, sh, frames = _parse(payload)
    if not frames:
        raise ValueError("GIF contains no image data")
    if _full_canvas(sw, sh, frames):
        return [_decode_frame(sw, sh, fr) for fr in frames]
    return [c.copy() for c in _iter_composited(sw, sh, frames)]


def gif_frame_count(payload: bytes) -> int:
    return len(_parse(payload)[2])
