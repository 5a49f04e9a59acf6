r"""PDF text extraction (ISO 32000 subset) — the crawl's other big
document format.

After HTML, PDF is the dominant document format in web crawls; a
training-data pipeline that refuses every ``application/pdf`` byte
stream leaves a large fraction of the high-quality corpus (papers,
reports, books) on the floor. No PDF library ships in this
environment, so — like the JPEG/PNG/GIF/BMP decoders — this is an
original implementation from the public ISO 32000-1 specification,
with the repo's refuse-or-extract-exactly discipline:

- **object index by scan, not xref**: indirect objects are located by
  scanning for ``N G obj`` headers (the same strategy PDF repair
  tools use), with later definitions winning — this handles both
  incremental updates and the broken-xref files real crawls are full
  of, and sidesteps the classic-table vs xref-stream split entirely;
  objects inside **object streams** (``/Type /ObjStm``, how PDF 1.5+
  files store most of their objects) are indexed too;
- **filters**: ``FlateDecode`` (zlib, bounded inflate, PNG predictors
  2 and 10–15), ``ASCIIHexDecode``, filter arrays; anything else on a
  CONTENT stream refuses reason-coded (``DCTDecode``/``CCITT`` are
  image payloads and never carry text);
- **page tree**: ``/Root → /Pages → /Kids`` walk (inherited
  ``/Resources``), one output row per page, ``/Contents`` arrays
  concatenated in order;
- **text operators**: ``BT``/``ET`` blocks; ``Tj``, ``'``, ``"``,
  ``TJ`` (kerning numbers ignored per convention); ``Tf`` switches
  the decoding font; ``Td``/``TD``/``T*`` and ``Tm`` with a vertical
  move emit a newline — the deterministic line model the synth writer
  round-trips;
- **fonts / encodings**: simple fonts decode 1-byte codes via
  ``/WinAnsiEncoding`` (cp1252; undefined slots refuse) or
  StandardEncoding (ASCII range; non-ASCII refuses rather than
  guessing glyph names); composite ``/Type0`` fonts with
  ``/Identity-H`` decode 2-byte codes through their ``/ToUnicode``
  CMap (``bfchar``/``bfrange``; surrogate pairs recombine via
  UTF-16BE) — the two paths that cover the overwhelming majority of
  real text PDFs. A text-showing operator under a font this module
  cannot decode refuses the page reason-coded (never mojibake);
- **refusals**: ``/Encrypt`` in any trailer (``encrypted``), missing
  root/pages (``no_page_tree``), corrupt streams; all surfaced as
  reason codes through :func:`pdf_extract`'s per-row isolation — one
  bad PDF never fails the task (the WARC per-record lesson).

Execution shape: one Arrow pass, one row per page (``mapInPandas``,
no shuffle) — the same corpus-scale contract as ``html_extract``.
The fixture writer (:func:`pdf_encode`) emits genuine PDFs (classic
xref with correct byte offsets, Flate or plain content streams,
WinAnsi literal strings or Identity-H hex strings + ToUnicode CMap)
so the driver row's oracle replays extraction closed-form on
arbitrary-unicode document text.
"""

from __future__ import annotations

import io
import re
import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_MAX_INFLATE = 1 << 30

# ------------------------------------------------------------ lexer


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"ref({self.num})"


class _Name(str):
    """PDF name object (distinct from strings)."""


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    def __init__(self, b: bytes, pos: int = 0):
        self.b = b
        self.pos = pos

    def _skip_ws(self) -> None:
        b, n = self.b, len(self.b)
        while self.pos < n:
            c = self.b[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                while self.pos < n and b[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def peek_bytes(self, k: int) -> bytes:
        return self.b[self.pos : self.pos + k]

    def read_object(self):
        """One PDF object at the cursor (dict/array/name/string/
        number/bool/null/indirect-ref)."""
        self._skip_ws()
        b = self.b
        if self.pos >= len(b):
            raise ValueError("corrupt PDF: object expected at end of data")
        c = b[self.pos]
        if b[self.pos : self.pos + 2] == b"<<":
            return self._read_dict()
        if c == 0x3C:  # '<' hex string
            return self._read_hex_string()
        if c == 0x28:  # '('
            return self._read_literal_string()
        if c == 0x2F:  # '/'
            return self._read_name()
        if c == 0x5B:  # '['
            self.pos += 1
            out = []
            while True:
                self._skip_ws()
                if self.pos < len(b) and b[self.pos] == 0x5D:
                    self.pos += 1
                    return out
                out.append(self.read_object())
        if b[self.pos : self.pos + 4] == b"true":
            self.pos += 4
            return True
        if b[self.pos : self.pos + 5] == b"false":
            self.pos += 5
            return False
        if b[self.pos : self.pos + 4] == b"null":
            self.pos += 4
            return None
        # number or indirect reference "N G R"
        m = re.match(rb"[+-]?(\d+\.?\d*|\.\d+)", b[self.pos : self.pos + 32])
        if not m:
            raise ValueError(
                f"corrupt PDF: unparseable token at offset {self.pos}"
            )
        tok = m.group(0)
        self.pos += len(tok)
        save = self.pos
        # lookahead for "G R"
        if b"." not in tok:
            self._skip_ws()
            m2 = re.match(rb"(\d+)\s+R(?![a-zA-Z])", b[self.pos : self.pos + 24])
            if m2:
                # consume up to and including the R
                adv = m2.end(1)
                self.pos += adv
                self._skip_ws()
                self.pos += 1  # 'R'
                return _Ref(int(tok))
            self.pos = save
        return float(tok) if b"." in tok else int(tok)

    def _read_name(self) -> _Name:
        b = self.b
        self.pos += 1
        out = bytearray()
        while self.pos < len(b):
            c = b[self.pos]
            if c in _WS or c in _DELIM:
                break
            if c == 0x23 and self.pos + 2 < len(b):  # '#xx'
                out.append(int(b[self.pos + 1 : self.pos + 3], 16))
                self.pos += 3
                continue
            out.append(c)
            self.pos += 1
        return _Name(out.decode("latin-1"))

    def _read_dict(self) -> dict:
        self.pos += 2
        d: dict = {}
        while True:
            self._skip_ws()
            if self.peek_bytes(2) == b">>":
                self.pos += 2
                return d
            key = self.read_object()
            if not isinstance(key, _Name):
                raise ValueError("corrupt PDF: dict key is not a name")
            d[str(key)] = self.read_object()

    def _read_hex_string(self) -> bytes:
        b = self.b
        self.pos += 1
        out = bytearray()
        digits = []
        while self.pos < len(b):
            c = b[self.pos]
            self.pos += 1
            if c == 0x3E:  # '>'
                if digits:
                    out.append(int("%s0" % digits[0], 16))
                return bytes(out)
            if c in _WS:
                continue
            digits.append(chr(c))
            if len(digits) == 2:
                out.append(int("".join(digits), 16))
                digits = []
        raise ValueError("corrupt PDF: unterminated hex string")

    def _read_literal_string(self) -> bytes:
        b = self.b
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < len(b):
            c = b[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash
                if self.pos >= len(b):
                    break
                e = b[self.pos]
                self.pos += 1
                esc = {
                    0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
                    0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C,
                }
                if e in esc:
                    out.append(esc[e])
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_digits = [e - 0x30]
                    while (
                        len(oct_digits) < 3
                        and self.pos < len(b)
                        and 0x30 <= b[self.pos] <= 0x37
                    ):
                        oct_digits.append(b[self.pos] - 0x30)
                        self.pos += 1
                    v = 0
                    for d in oct_digits:
                        v = v * 8 + d
                    out.append(v & 0xFF)
                elif e in b"\r\n":  # line continuation
                    if e == 0x0D and self.pos < len(b) and b[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    return bytes(out)
            out.append(c)
        raise ValueError("corrupt PDF: unterminated literal string")


# ------------------------------------------------------------ filters


def _png_unpredict(data: bytes, colors: int, columns: int) -> bytes:
    """PNG predictors (10-15) over 1-byte components — the layout xref
    streams and Flate predictor-12 content use."""
    row = colors * columns
    out = bytearray()
    prev = bytearray(row)
    pos = 0
    while pos < len(data):
        if pos + 1 + row > len(data):
            raise ValueError("corrupt PDF: predictor row exceeds data")
        ft = data[pos]
        cur = bytearray(data[pos + 1 : pos + 1 + row])
        pos += 1 + row
        if ft == 0:
            pass
        elif ft == 1:
            for i in range(colors, row):
                cur[i] = (cur[i] + cur[i - colors]) & 0xFF
        elif ft == 2:
            for i in range(row):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ft == 3:
            for i in range(row):
                left = cur[i - colors] if i >= colors else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(row):
                a = cur[i - colors] if i >= colors else 0
                bb = prev[i]
                cc = prev[i - colors] if i >= colors else 0
                p = a + bb - cc
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else cc)
                cur[i] = (cur[i] + pr) & 0xFF
        else:
            raise ValueError(f"corrupt PDF: PNG predictor filter {ft}")
        out += cur
        prev = cur
    return bytes(out)


def _apply_filters(data: bytes, filt, parms) -> bytes:
    filters = filt if isinstance(filt, list) else ([] if filt is None else [filt])
    parm_list = parms if isinstance(parms, list) else [parms] * len(filters)
    for f, p in zip(filters, parm_list):
        name = str(f)
        if name == "FlateDecode":
            d = zlib.decompressobj()
            try:
                data = d.decompress(data, _MAX_INFLATE + 1)
            except zlib.error as e:
                raise ValueError(f"corrupt PDF: flate stream: {e}") from None
            if len(data) > _MAX_INFLATE:
                raise ValueError("PDF stream exceeds inflate bound")
            pred = 1
            colors, columns = 1, 1
            if isinstance(p, dict):
                pred = int(p.get("Predictor", 1))
                colors = int(p.get("Colors", 1)) * (
                    (int(p.get("BitsPerComponent", 8)) + 7) // 8
                )
                columns = int(p.get("Columns", 1))
            if pred >= 10:
                data = _png_unpredict(data, colors, columns)
            elif pred == 2:
                raise NotImplementedError(
                    "PDF TIFF predictor 2 not supported"
                )
        elif name == "ASCIIHexDecode":
            body = data.split(b">")[0]
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", body)
            if len(hx) % 2:
                hx += b"0"
            data = bytes.fromhex(hx.decode("ascii"))
        else:
            raise NotImplementedError(
                f"PDF stream filter {name!r} not decodable here"
            )
    return data


# ------------------------------------------------------------ document


class _Doc:
    """Object store built by scanning for ``N G obj`` headers and
    unpacking object streams; resolves refs on access."""

    def __init__(self, b: bytes):
        self.b = b
        if not b.lstrip()[:5].startswith(b"%PDF-"):
            raise ValueError("not a PDF payload (missing %PDF- header)")
        self.objects: dict[int, object] = {}
        self._raw_streams: dict[int, bytes] = {}
        trailer_dicts = []
        # matches are scanned in file order; covered_end tracks the end
        # of the last stream's raw bytes so 'N G obj' byte patterns
        # INSIDE compressed data can't shadow real objects
        covered_end = 0
        for m in re.finditer(rb"(?<![0-9])(\d+)\s+(\d+)\s+obj\b", b):
            if m.start() < covered_end:
                continue
            num = int(m.group(1))
            lex = _Lexer(b, m.end())
            try:
                obj = lex.read_object()
            except ValueError:
                continue  # junk match inside a binary stream
            lex._skip_ws()
            if isinstance(obj, dict) and lex.peek_bytes(6) == b"stream":
                lex.pos += 6
                if b[lex.pos : lex.pos + 2] == b"\r\n":
                    lex.pos += 2
                elif b[lex.pos : lex.pos + 1] in (b"\n", b"\r"):
                    lex.pos += 1
                ln = obj.get("Length")
                if isinstance(ln, _Ref):
                    # Length as a forward ref: fall back to endstream
                    end = b.find(b"endstream", lex.pos)
                    if end < 0:
                        raise ValueError(
                            "corrupt PDF: stream without endstream"
                        )
                    raw = b[lex.pos : end].rstrip(b"\r\n")
                else:
                    ln = int(ln or 0)
                    if lex.pos + ln > len(b):
                        raise ValueError(
                            "corrupt PDF: stream length exceeds payload"
                        )
                    raw = b[lex.pos : lex.pos + ln]
                self._raw_streams[num] = raw
                covered_end = lex.pos + len(raw)
            self.objects[num] = obj
        for m in re.finditer(rb"trailer\b", b):
            lex = _Lexer(b, m.end())
            try:
                td = lex.read_object()
            except ValueError:
                continue
            if isinstance(td, dict):
                trailer_dicts.append(td)
        # xref-stream files have no 'trailer' keyword: the stream dict
        # doubles as the trailer
        for num, obj in self.objects.items():
            if isinstance(obj, dict) and str(obj.get("Type", "")) == "XRef":
                trailer_dicts.append(obj)
        if any("Encrypt" in t for t in trailer_dicts):
            raise NotImplementedError("encrypted PDF refused")
        self.trailers = trailer_dicts
        self._unpack_object_streams()

    def resolve(self, obj):
        seen = 0
        while isinstance(obj, _Ref):
            obj = self.objects.get(obj.num)
            seen += 1
            if seen > 64:
                raise ValueError("corrupt PDF: reference cycle")
        return obj

    def stream_data(self, num: int) -> bytes:
        obj = self.objects.get(num)
        raw = self._raw_streams.get(num)
        if not isinstance(obj, dict) or raw is None:
            raise ValueError(f"PDF object {num} is not a stream")
        return _apply_filters(
            raw, self.resolve(obj.get("Filter")),
            self.resolve(obj.get("DecodeParms")),
        )

    def _unpack_object_streams(self) -> None:
        for num, obj in list(self.objects.items()):
            if not (
                isinstance(obj, dict)
                and str(obj.get("Type", "")) == "ObjStm"
            ):
                continue
            data = self.stream_data(num)
            n = int(self.resolve(obj.get("N", 0)))
            first = int(self.resolve(obj.get("First", 0)))
            head = data[:first].split()
            for i in range(n):
                onum = int(head[2 * i])
                off = int(head[2 * i + 1])
                lex = _Lexer(data, first + off)
                # objects inside ObjStm never shadow a later top-level
                # definition of the same number
                if onum not in self.objects:
                    self.objects[onum] = lex.read_object()

    def root(self) -> dict:
        for t in self.trailers:
            r = self.resolve(t.get("Root"))
            if isinstance(r, dict):
                return r
        # fall back: any /Type /Catalog object
        for obj in self.objects.values():
            o = self.resolve(obj)
            if isinstance(o, dict) and str(o.get("Type", "")) == "Catalog":
                return o
        raise ValueError("corrupt PDF: no_page_tree (no document catalog)")

    def pages(self) -> list[dict]:
        root = self.root()
        pages_obj = self.resolve(root.get("Pages"))
        if not isinstance(pages_obj, dict):
            raise ValueError("corrupt PDF: no_page_tree (missing /Pages)")
        out: list[dict] = []

        def walk(node: dict, inherited_res):
            res = self.resolve(node.get("Resources")) or inherited_res
            t = str(node.get("Type", ""))
            if t == "Page":
                n2 = dict(node)
                n2["__res__"] = res
                out.append(n2)
                return
            kids = self.resolve(node.get("Kids")) or []
            if len(out) > 100_000:
                raise ValueError("corrupt PDF: page tree exceeds bound")
            for k in kids:
                kk = self.resolve(k)
                if isinstance(kk, dict):
                    walk(kk, res)

        walk(pages_obj, None)
        return out


# ------------------------------------------------------------ fonts

# StandardEncoding ASCII range is identity; everything non-ASCII
# refuses rather than guessing glyph names.


def _decode_simple(data: bytes, encoding: str) -> str:
    if encoding == "WinAnsiEncoding":
        try:
            return data.decode("cp1252")
        except UnicodeDecodeError:
            raise ValueError(
                "PDF text byte undefined in WinAnsiEncoding"
            ) from None
    # StandardEncoding / unspecified: ASCII-safe subset only
    if any(c > 0x7E or (c < 0x20 and c not in (0x09, 0x0A, 0x0D)) for c in data):
        raise NotImplementedError(
            "PDF font_encoding: non-ASCII byte under StandardEncoding"
        )
    return data.decode("ascii")


class _CMap:
    """ToUnicode lookup: explicit bfchar entries + LAZY bfrange spans
    (an identity <0000><FFFF> range must not expand to a 65k-entry
    dict per page — lookups walk the span list instead)."""

    def __init__(self):
        self.chars: dict[int, str] = {}
        self.ranges: list[tuple[int, int, int]] = []  # (lo, hi, base)

    def get(self, code: int) -> str | None:
        hit = self.chars.get(code)
        if hit is not None:
            return hit
        for lo, hi, base in self.ranges:
            if lo <= code <= hi:
                v = base + (code - lo)
                return chr(v) if v <= 0x10FFFF else None
        return None


def _parse_tounicode(cmap: bytes) -> _CMap:
    """bfchar/bfrange sections of a ToUnicode CMap → :class:`_CMap`."""
    out = _CMap()

    def _uni(tok: bytes) -> str:
        return bytes.fromhex(tok.decode("ascii")).decode(
            "utf-16-be", "surrogatepass"
        )

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
        toks = re.findall(rb"<([0-9A-Fa-f]+)>", m.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            out.chars[int(src, 16)] = _uni(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
        body = m.group(1)
        for rm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(<([0-9A-Fa-f]+)>|\[(.*?)\])",
            body,
            re.S,
        ):
            lo, hi = int(rm.group(1), 16), int(rm.group(2), 16)
            if rm.group(5) is not None:  # array form: one dst per code
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", rm.group(5))
                for i, d in enumerate(dsts):
                    out.chars[lo + i] = _uni(d)
            else:
                out.ranges.append((lo, hi, int(rm.group(4), 16)))
    return out


class _Font:
    def __init__(self, doc: _Doc, fdict: dict):
        self.two_byte = False
        self.cmap: _CMap | None = None
        self.encoding = "StandardEncoding"
        sub = str(doc.resolve(fdict.get("Subtype", "")))
        if sub == "Type0":
            enc = doc.resolve(fdict.get("Encoding"))
            if str(enc) not in ("Identity-H", "Identity-V"):
                raise NotImplementedError(
                    f"PDF font_encoding: Type0 encoding {enc!r}"
                )
            self.two_byte = True
            tu = fdict.get("ToUnicode")
            if not isinstance(tu, _Ref):
                raise NotImplementedError(
                    "PDF font_encoding: Type0 font without ToUnicode stream"
                )
            self.cmap = _parse_tounicode(doc.stream_data(tu.num))
        else:
            enc = doc.resolve(fdict.get("Encoding"))
            if isinstance(enc, dict):
                if "Differences" in enc:
                    raise NotImplementedError(
                        "PDF font_encoding: Differences array unsupported"
                    )
                enc = doc.resolve(enc.get("BaseEncoding")) or "StandardEncoding"
            self.encoding = str(enc) if enc else "StandardEncoding"
            if self.encoding not in (
                "WinAnsiEncoding", "StandardEncoding", "MacRomanEncoding",
            ):
                raise NotImplementedError(
                    f"PDF font_encoding: {self.encoding!r}"
                )

    def decode(self, data: bytes) -> str:
        if self.two_byte:
            if len(data) % 2:
                raise ValueError("PDF Identity-H string with odd length")
            assert self.cmap is not None
            parts = []
            for i in range(0, len(data), 2):
                code = (data[i] << 8) | data[i + 1]
                u = self.cmap.get(code)
                if u is None:
                    raise ValueError(
                        f"PDF ToUnicode CMap missing code {code}"
                    )
                parts.append(u)
            # surrogate halves mapped individually recombine here
            return (
                "".join(parts)
                .encode("utf-16-be", "surrogatepass")
                .decode("utf-16-be", "surrogatepass")
            )
        if self.encoding == "MacRomanEncoding":
            try:
                return data.decode("mac_roman")
            except UnicodeDecodeError:
                raise ValueError(
                    "PDF text byte undefined in MacRomanEncoding"
                ) from None
        return _decode_simple(data, self.encoding)


# ------------------------------------------------------------ content


def _extract_page_text(doc: _Doc, page: dict) -> str:
    contents = doc.resolve(page.get("Contents"))
    if contents is None:
        return ""
    parts = []
    raw_contents = page.get("Contents")
    nums = (
        [r.num for r in raw_contents if isinstance(r, _Ref)]
        if isinstance(raw_contents, list)
        else ([raw_contents.num] if isinstance(raw_contents, _Ref) else [])
    )
    if not nums:
        raise ValueError("corrupt PDF: /Contents is not a stream reference")
    for num in nums:
        parts.append(doc.stream_data(num))
    data = b"\n".join(parts)
    res = page.get("__res__") or {}
    fonts_dict = doc.resolve(res.get("Font")) if isinstance(res, dict) else {}
    fonts_dict = fonts_dict or {}
    font_cache: dict[str, _Font] = {}

    lex = _Lexer(data)
    stack: list = []
    out: list[str] = []
    cur_font: _Font | None = None
    pending_newline = False
    ty_seen = None

    def show(sval: bytes) -> None:
        nonlocal pending_newline
        if cur_font is None:
            raise ValueError("PDF text shown before any Tf font selection")
        if pending_newline and out:
            out.append("\n")
        pending_newline = False
        out.append(cur_font.decode(sval))

    n = len(data)
    while True:
        lex._skip_ws()
        if lex.pos >= n:
            break
        c = data[lex.pos]
        if (
            c in b"/<(["
            or c in (0x2B, 0x2D, 0x2E)
            or 0x30 <= c <= 0x39
        ):
            try:
                stack.append(lex.read_object())
            except ValueError:
                lex.pos += 1
            continue
        m = re.match(rb"[A-Za-z'\"*]{1,3}", data[lex.pos : lex.pos + 3])
        if not m:
            lex.pos += 1
            continue
        op = m.group(0)
        lex.pos += len(op)
        if op == b"BI":
            # inline image: binary data between ID and EI would skid
            # through the lexer as garbage operands — skip to EI
            end = data.find(b"EI", lex.pos)
            if end < 0:
                raise ValueError("corrupt PDF: inline image without EI")
            lex.pos = end + 2
            stack.clear()
            continue
        if op == b"Tf":
            if len(stack) >= 2 and isinstance(stack[-2], _Name):
                fname = str(stack[-2])
                if fname not in font_cache:
                    fd = doc.resolve(fonts_dict.get(fname))
                    if not isinstance(fd, dict):
                        raise ValueError(
                            f"PDF font resource {fname!r} missing"
                        )
                    font_cache[fname] = _Font(doc, fd)
                cur_font = font_cache[fname]
        elif op == b"Tj":
            if stack and isinstance(stack[-1], bytes):
                show(stack[-1])
        elif op == b"TJ":
            if stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        show(el)
        elif op in (b"'", b'"'):
            # move to next line and show
            pending_newline = True
            if stack and isinstance(stack[-1], bytes):
                show(stack[-1])
        elif op in (b"Td", b"TD", b"T*"):
            pending_newline = True
        elif op == b"Tm":
            if len(stack) >= 6:
                ty = stack[-1]
                if ty_seen is not None and ty != ty_seen:
                    pending_newline = True
                ty_seen = ty
        elif op == b"BT":
            ty_seen = None
        # postfix semantics: every operator consumes its operands
        stack.clear()
    return "".join(out)


# ------------------------------------------------------------ public


def pdf_page_texts(payload: bytes) -> list[str]:
    """PDF bytes → per-page extracted text (module-docstring line
    model). Raises ValueError/NotImplementedError reason-coded."""
    doc = _Doc(bytes(payload))
    return [_extract_page_text(doc, p) for p in doc.pages()]


def pdf_info(payload: bytes) -> dict:
    """Document metadata: n_pages + /Info Title (None when absent)."""
    doc = _Doc(bytes(payload))
    title = None
    for t in doc.trailers:
        info = doc.resolve(t.get("Info"))
        if isinstance(info, dict):
            tt = doc.resolve(info.get("Title"))
            if isinstance(tt, bytes):
                if tt[:2] == b"\xfe\xff":
                    title = tt[2:].decode("utf-16-be", "replace")
                else:
                    title = tt.decode("latin-1")
    return {"n_pages": len(doc.pages()), "title": title}


_PDF_REFUSAL_CODES = [
    ("encrypted", "encrypted"),
    ("font_encoding", "font_encoding"),
    ("ToUnicode", "font_encoding"),
    ("WinAnsiEncoding", "font_encoding"),
    ("MacRomanEncoding", "font_encoding"),
    ("filter", "unsupported_filter"),
    ("predictor", "unsupported_filter"),
    ("no_page_tree", "no_page_tree"),
    ("Catalog", "no_page_tree"),
    ("Pages", "no_page_tree"),
    ("%PDF-", "bad_signature"),
    ("inflate", "stream_bomb"),
]


def _pdf_refusal_code(e: BaseException) -> str:
    s = str(e)
    for key, code in _PDF_REFUSAL_CODES:
        if key in s:
            return code
    return "corrupt_pdf"


def pdf_extract(
    df: DataFrame, payload_col: str = "payload", keep_cols: list[str] | None = None
) -> DataFrame:
    """Explode PDF payload bytes into one row per page: (page_no,
    text, n_pages, title, refusal). Per-ROW isolation (the WARC
    lesson): a refusing PDF emits one row with NULL text and a stable
    reason code instead of failing the task. Map-only Arrow pass, no
    shuffle; 100 TB of PDFs parallelize by file through media_files
    like every other binary source."""
    from .similarity import ensure_parallelism

    # the parse is ~ms/doc of pure Python: a compact single-file input
    # (1-2 parquet splits) would pin the whole corpus on 2 cores —
    # fan out round-robin when (and only when) under-partitioned
    df = ensure_parallelism(df)
    keep = keep_cols if keep_cols is not None else [
        f.name for f in df.schema.fields if f.name != payload_col
    ]
    out_schema = T.StructType(
        [df.schema[c] for c in keep]
        + [
            T.StructField("page_no", T.IntegerType(), True),
            T.StructField("n_pages", T.IntegerType(), True),
            T.StructField("title", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("refusal", T.StringType(), True),
        ]
    )

    def run(batches):
        for pdf_batch in batches:
            rows = []
            for _, row in pdf_batch.iterrows():
                base = {c: row[c] for c in keep}
                doc_rows: list[dict] = []
                try:
                    payload = bytes(row[payload_col])
                    doc = _Doc(payload)
                    pages = doc.pages()
                    info = {"n_pages": len(pages), "title": None}
                    for t in doc.trailers:
                        inf = doc.resolve(t.get("Info"))
                        if isinstance(inf, dict):
                            tt = doc.resolve(inf.get("Title"))
                            if isinstance(tt, bytes):
                                info["title"] = (
                                    tt[2:].decode("utf-16-be", "replace")
                                    if tt[:2] == b"\xfe\xff"
                                    else tt.decode("latin-1")
                                )
                    for i, p in enumerate(pages):
                        r = dict(base)
                        r.update(
                            page_no=i,
                            n_pages=info["n_pages"],
                            title=info["title"],
                            text=_extract_page_text(doc, p),
                            refusal=None,
                        )
                        doc_rows.append(r)
                except (ValueError, NotImplementedError) as e:
                    # atomic per document: a page failing mid-walk must
                    # not leave earlier page rows next to the refusal
                    r = dict(base)
                    r.update(
                        page_no=None, n_pages=None, title=None, text=None,
                        refusal=_pdf_refusal_code(e),
                    )
                    doc_rows = [r]
                rows.extend(doc_rows)
            yield pd.DataFrame(
                rows,
                columns=[*keep, "page_no", "n_pages", "title", "text",
                         "refusal"],
            )

    return df.mapInPandas(run, out_schema)


# ------------------------------------------------------------ images

# image-XObject refusal codes: stable, SQL-replayable — the codecs a
# real PDF corpus carries that are outside this repo's envelope
_IMG_FILTER_REFUSALS = {
    "CCITTFaxDecode": "ccitt",
    "JBIG2Decode": "jbig2",
    "JPXDecode": "jpx",
}

_GRAY_PALETTE = None  # lazily-built identity palette for gray→BMP


def pdf_image_payloads(payload: bytes) -> list[dict]:
    """Embedded image XObjects of a PDF, per-image isolated.

    PDFs are the crawl's second document format AND an image container:
    scans, figures, and photos ship as ``/Subtype /Image`` stream
    objects. Each image resolves to a dict with ``img_no`` (object-
    number order), ``width``/``height``, and either a decodable
    ``(mime, payload)`` pair or a reason-coded ``refusal``:

    - ``DCTDecode`` payloads ARE baseline-JPEG byte streams — handed
      through verbatim as ``image/jpeg`` (decodable pre-filters like
      ASCIIHex/Flate ahead of the DCT stage are unwrapped first), so
      the downstream decode rides the repo's from-spec JPEG envelope;
    - ``FlateDecode``/plain raster payloads (8-bit DeviceGray /
      DeviceRGB, PNG predictors honored via the shared filter path)
      are re-wrapped LOSSLESSLY as ``image/bmp`` — a deterministic
      container the envelope already decodes — with the origin noted;
    - ``CCITTFaxDecode`` / ``JBIG2Decode`` / ``JPXDecode`` refuse
      reason-coded (``ccitt`` / ``jbig2`` / ``jpx``); structurally
      damaged images refuse ``image_corrupt`` / ``image_format`` —
      one bad image never hides its siblings (per-image isolation).
    """
    import numpy as np

    from .bmp import bmp_encode

    global _GRAY_PALETTE
    if _GRAY_PALETTE is None:
        _GRAY_PALETTE = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)

    doc = _Doc(payload)
    out: list[dict] = []
    for num in sorted(doc.objects):
        obj = doc.objects[num]
        if not (isinstance(obj, dict) and num in doc._raw_streams):
            continue
        if str(doc.resolve(obj.get("Subtype", ""))) != "Image":
            continue
        rec: dict = {
            "img_no": len(out),
            "width": None,
            "height": None,
            "mime": None,
            "payload": None,
            "refusal": None,
        }
        out.append(rec)
        try:
            w = doc.resolve(obj.get("Width"))
            h = doc.resolve(obj.get("Height"))
            if not (isinstance(w, int) and isinstance(h, int) and w > 0 and h > 0):
                rec["refusal"] = "image_corrupt"
                continue
            rec["width"], rec["height"] = w, h
            if w * h > (1 << 26):
                rec["refusal"] = "image_corrupt"
                continue
            filt = doc.resolve(obj.get("Filter"))
            filters = (
                [str(f) for f in filt]
                if isinstance(filt, list)
                else ([str(filt)] if filt is not None else [])
            )
            parms = doc.resolve(obj.get("DecodeParms"))
            raw = doc._raw_streams[num]
            bad = next(
                (f for f in filters if f in _IMG_FILTER_REFUSALS), None
            )
            if bad is not None:
                rec["refusal"] = _IMG_FILTER_REFUSALS[bad]
                continue
            if filters and filters[-1] == "DCTDecode":
                pre = filters[:-1]
                if pre:
                    pre_parms = (
                        parms[: len(pre)] if isinstance(parms, list) else parms
                    )
                    raw = _apply_filters(raw, [_Name(f) for f in pre], pre_parms)
                rec["mime"] = "image/jpeg"
                rec["payload"] = raw
                continue
            # raster path: everything decodable by the shared filters
            data = doc.stream_data(num)
            bits = doc.resolve(obj.get("BitsPerComponent", 8))
            cs = doc.resolve(obj.get("ColorSpace"))
            cs_name = str(cs) if isinstance(cs, (_Name, str)) else None
            if bits != 8 or cs_name not in ("DeviceGray", "DeviceRGB"):
                rec["refusal"] = "image_format"
                continue
            ncomp = 1 if cs_name == "DeviceGray" else 3
            if len(data) != w * h * ncomp:
                rec["refusal"] = "image_corrupt"
                continue
            arr = np.frombuffer(data, dtype=np.uint8)
            if ncomp == 1:
                bmp = bmp_encode(arr.reshape(h, w), 8, palette=_GRAY_PALETTE)
            else:
                bmp = bmp_encode(arr.reshape(h, w, 3), 24)
            rec["mime"] = "image/bmp"
            rec["payload"] = bmp
        except (ValueError, NotImplementedError) as e:
            rec["refusal"] = (
                "image_filter"
                if "filter" in str(e)
                else "image_corrupt"
            )
    return out


def pdf_images(
    df: DataFrame, payload_col: str = "payload", keep_cols: list[str] | None = None
) -> DataFrame:
    """Explode PDF payloads into one row per embedded image XObject:
    (img_no, width, height, img_mime, media, refusal) — ``media`` is
    the engine's standard media struct, so the output feeds straight
    into decode_image / decode_coverage / image_dhash: the multimodal
    loop for document corpora (PDF → images → perceptual dedup)
    without any new decode surface. Per-ROW and per-IMAGE isolation:
    a refusing document emits one reason-coded row, a refusing image
    only its own. Map-only Arrow pass, no shuffle; 100 TB of PDFs
    parallelize by file through media_files."""
    from .multimodal import MEDIA_SCHEMA
    from .similarity import ensure_parallelism

    df = ensure_parallelism(df)
    keep = keep_cols if keep_cols is not None else [
        f.name for f in df.schema.fields if f.name != payload_col
    ]
    out_schema = T.StructType(
        [df.schema[c] for c in keep]
        + [
            T.StructField("img_no", T.IntegerType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("img_mime", T.StringType(), True),
            T.StructField("media", MEDIA_SCHEMA, True),
            T.StructField("refusal", T.StringType(), True),
        ]
    )

    def run(batches):
        for pdf_batch in batches:
            rows = []
            for _, row in pdf_batch.iterrows():
                base = {c: row[c] for c in keep}
                try:
                    imgs = pdf_image_payloads(bytes(row[payload_col]))
                    doc_rows = []
                    for im in imgs:
                        r = dict(base)
                        r.update(
                            img_no=im["img_no"],
                            width=im["width"],
                            height=im["height"],
                            img_mime=im["mime"],
                            media=(
                                {
                                    "payload": im["payload"],
                                    "mime": im["mime"],
                                    "meta": {"origin": "pdf-xobject"},
                                }
                                if im["payload"] is not None
                                else None
                            ),
                            refusal=im["refusal"],
                        )
                        doc_rows.append(r)
                except (ValueError, NotImplementedError) as e:
                    doc_rows = [
                        dict(
                            base,
                            img_no=None,
                            width=None,
                            height=None,
                            img_mime=None,
                            media=None,
                            refusal=_pdf_refusal_code(e),
                        )
                    ]
                rows.extend(doc_rows)
            yield pd.DataFrame(
                rows,
                columns=[*keep, "img_no", "width", "height", "img_mime",
                         "media", "refusal"],
            )

    return df.mapInPandas(run, out_schema)


def synth_pdf_media(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """One REAL PDF per row cycling the envelope by key % 4 — every
    leg's per-page text is a pure function of (key, text), so the
    driver row replays extraction closed-form:

    0. Flate + WinAnsi Tj lines: ["Doc <key>", "line <key>"];
    1. plain content + Type0 Identity-H hex strings CARRYING THE
       DOCUMENT TEXT (arbitrary unicode): ["t <key>", text];
    2. Flate + Identity-H, TWO pages: page p = ["pg <p> of <key>"],
       packed through an OBJECT STREAM (the PDF 1.5 layout);
    3. WinAnsi + kerned TJ arrays + /Info title "T<key % 7>":
       ["café <key>"]."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("pdf", T.BinaryType(), True)]
    )

    def run(batches):
        def one(row) -> bytes:
            key = int(row[key_col])
            text = row[text_col] if row[text_col] is not None else ""
            leg = key % 4
            if leg == 0:
                return pdf_encode([[f"Doc {key}", f"line {key}"]])
            if leg == 1:
                return pdf_encode(
                    [[f"t {key}", text]], flate=False, unicode_font=True
                )
            if leg == 2:
                return pdf_encode(
                    [[f"pg 0 of {key}"], [f"pg 1 of {key}"]],
                    unicode_font=True,
                    objstm=True,
                )
            return pdf_encode(
                [[f"café {key}"]], title=f"T{key % 7}", tj_split=True
            )

        for pdf_batch in batches:
            yield pdf_batch.assign(pdf=pdf_batch.apply(one, axis=1))

    from .similarity import ensure_parallelism

    # fan out BELOW the per-row Python pass (r15 opt): a 1-split
    # local input would serialize it on one task; no-op at scale
    return ensure_parallelism(df).mapInPandas(run, out_schema)


def synth_pdf_image_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """One REAL PDF per row with embedded image XObjects, every leg's
    decoded pixels a pure function of the key (the driver row replays
    the full pdf → extract → decode chain closed-form). Leg key % 3:

    0. a DCTDecode grayscale JPEG (the jpeg fixtures' closed form:
       w = 8(1 + k%3), h = 8(1 + k%2), pixel = (k*31 + block*17) % 256);
    1. a FlateDecode RGB raster (w = 8 + k%9, h = 8 + k%7, pixel =
       (k*31 + y*17 + x*7 + c*11) % 256), PNG predictor 12 on odd
       keys — the Up-filter path through the shared filter stack;
    2. a CCITTFaxDecode stub (16×16) — the reason-coded refusal leg.

    Keys with k % 4 == 0 embed a SECOND image (img_no 1): a 5×6
    FlateDecode gray raster g(y, x) = (k*5 + 3y + x) % 256 — on leg-2
    keys this pins per-image isolation (the sibling decodes even
    though img_no 0 refused)."""
    import numpy as np

    from .jpeg import jpeg_encode_blocks, synth_block_values

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("pdf", T.BinaryType(), True)]
    )

    def run(batches):
        def one(key: int) -> bytes:
            leg = key % 3
            if leg == 0:
                dcs, bx, w, h = synth_block_values(key)
                imgs = [
                    {
                        "kind": "dct",
                        "jpeg": jpeg_encode_blocks(dcs, bx, w, h),
                        "width": w,
                        "height": h,
                        "gray": True,
                    }
                ]
            elif leg == 1:
                w, h = 8 + key % 9, 8 + key % 7
                yy, xx = np.mgrid[0:h, 0:w]
                rgb = np.stack(
                    [(key * 31 + yy * 17 + xx * 7 + c * 11) % 256
                     for c in range(3)],
                    axis=2,
                ).astype(np.uint8)
                imgs = [
                    {"kind": "raw", "pixels": rgb,
                     "predictor": 12 if key % 2 else 0}
                ]
            else:
                imgs = [{"kind": "ccitt", "width": 16, "height": 16}]
            if key % 4 == 0:
                yy, xx = np.mgrid[0:5, 0:6]
                gray = ((key * 5 + 3 * yy + xx) % 256).astype(np.uint8)
                imgs.append({"kind": "raw", "pixels": gray, "predictor": 0})
            return pdf_encode([[f"img doc {key}"]], images=imgs)

        for pdf_batch in batches:
            yield pdf_batch.assign(pdf=pdf_batch[key_col].map(one))

    from .similarity import ensure_parallelism

    # fan out BELOW the per-row Python pass (r15 opt): a 1-split
    # local input would serialize it on one task; no-op at scale
    return ensure_parallelism(df).mapInPandas(run, out_schema)


# ------------------------------------------------------------ writer


def _esc_literal(data: bytes) -> bytes:
    return (
        data.replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
        .replace(b"\r", b"\\r")
    )


def pdf_encode(
    pages: list[list[str]],
    title: str | None = None,
    flate: bool = True,
    unicode_font: bool = False,
    tj_split: bool = False,
    objstm: bool = False,
    images: list[dict] | None = None,
) -> bytes:
    """A genuine PDF for fixtures: classic xref with correct byte
    offsets, one content stream per page (Flate or plain), Helvetica
    WinAnsi literal strings — or, with ``unicode_font=True``, a Type0
    Identity-H font whose ToUnicode CMap identity-maps UTF-16BE code
    units, so ARBITRARY unicode round-trips exactly. Each inner list
    is one page's lines (joined by Td line moves → '\\n' on
    extraction). ``tj_split`` shows each line as a kerned TJ array
    (two halves with an ignored adjustment number — WinAnsi only);
    ``objstm`` packs the catalog/pages/font/info dictionaries into a
    PDF 1.5 object stream (the modern layout the index unpacks).

    ``images`` (r15) embeds image XObjects on page 0, referenced via
    ``/XObject << /ImN … >>`` and painted with ``Do`` operators. Each
    item is one of:

    - ``{"kind": "dct", "jpeg": bytes, "width": w, "height": h,
      "gray": bool}`` — a DCTDecode XObject carrying the JPEG bytes
      verbatim;
    - ``{"kind": "raw", "pixels": (h, w) or (h, w, 3) uint8 array,
      "predictor": 0 | 12}`` — a FlateDecode raster (predictor 12
      writes PNG Up-filtered rows + ``/DecodeParms``);
    - ``{"kind": "ccitt", "width": w, "height": h}`` — a
      CCITTFaxDecode stub (the envelope-refusal fixture)."""
    if tj_split and unicode_font:
        raise ValueError("tj_split fixtures are WinAnsi-only")
    images = images or []
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    img_base = font_num + 3  # after font, cmap, info slots
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] >>".encode()
    )
    xobj_res = ""
    if images:
        refs = " ".join(
            f"/Im{k} {img_base + k} 0 R" for k in range(len(images))
        )
        xobj_res = f" /XObject << {refs} >>"
    for i, lines in enumerate(pages):
        pg, ct = 3 + 2 * i, 4 + 2 * i
        objs[pg] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >>"
            f"{xobj_res if i == 0 else ''} >> "
            f"/Contents {ct} 0 R >>"
        ).encode()
        body = bytearray(b"BT\n/F1 12 Tf\n")
        for j, line in enumerate(lines):
            if j:
                body += b"0 -14 Td\n"
            else:
                body += b"72 720 Td\n"
            if unicode_font:
                hx = line.encode("utf-16-be", "surrogatepass").hex()
                body += b"<" + hx.encode() + b"> Tj\n"
            elif tj_split:
                enc = line.encode("cp1252")
                half = len(enc) // 2
                body += (
                    b"[(" + _esc_literal(enc[:half]) + b") -4 ("
                    + _esc_literal(enc[half:]) + b")] TJ\n"
                )
            else:
                body += b"(" + _esc_literal(line.encode("cp1252")) + b") Tj\n"
        body += b"ET"
        if i == 0:
            for k in range(len(images)):
                body += (
                    f"\nq 96 0 0 96 {40 + 110 * k} 480 cm /Im{k} Do Q"
                ).encode()
        data = bytes(body)
        if flate:
            data = zlib.compress(data, 6)
            objs[ct] = (
                f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
                + b"\nstream\n" + data + b"\nendstream"
            )
        else:
            objs[ct] = (
                f"<< /Length {len(data)} >>".encode()
                + b"\nstream\n" + data + b"\nendstream"
            )
    if unicode_font:
        cmap = (
            b"/CIDInit /ProcSet findresource begin\n"
            b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"1 beginbfrange <0000> <FFFF> <0000> endbfrange\n"
            b"end"
        )
        objs[font_num + 1] = (
            f"<< /Length {len(cmap)} >>".encode()
            + b"\nstream\n" + cmap + b"\nendstream"
        )
        objs[font_num] = (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
            f"/Encoding /Identity-H /ToUnicode {font_num + 1} 0 R "
            f"/DescendantFonts [] >>"
        ).encode()
    else:
        objs[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>"
        )
    info_num = font_num + 2
    if title is not None:
        objs[info_num] = (
            b"<< /Title (" + _esc_literal(title.encode("cp1252")) + b") >>"
        )
    for k, im in enumerate(images):
        num = img_base + k
        kind = im["kind"]
        if kind == "dct":
            data = im["jpeg"]
            cs = "/DeviceGray" if im.get("gray", True) else "/DeviceRGB"
            head = (
                f"<< /Type /XObject /Subtype /Image /Width {im['width']} "
                f"/Height {im['height']} /BitsPerComponent 8 "
                f"/ColorSpace {cs} /Filter /DCTDecode "
                f"/Length {len(data)} >>"
            )
        elif kind == "raw":
            px = im["pixels"]
            h_px, w_px = px.shape[:2]
            ncomp = 1 if px.ndim == 2 else px.shape[2]
            samples = px.reshape(h_px, w_px * ncomp)
            pred = int(im.get("predictor", 0))
            if pred == 12:
                # PNG Up rows: per-row filter tag 2 + (cur - prev)
                rows = bytearray()
                prev = bytes(w_px * ncomp)
                for y in range(h_px):
                    cur = samples[y].tobytes()
                    rows += b"\x02" + bytes(
                        (c - p) & 0xFF for c, p in zip(cur, prev)
                    )
                    prev = cur
                data = zlib.compress(bytes(rows), 6)
                parms = (
                    f" /DecodeParms << /Predictor 12 /Colors {ncomp} "
                    f"/Columns {w_px} /BitsPerComponent 8 >>"
                )
            elif pred == 0:
                data = zlib.compress(samples.tobytes(), 6)
                parms = ""
            else:
                raise ValueError(f"unsupported fixture predictor {pred}")
            cs = "/DeviceGray" if ncomp == 1 else "/DeviceRGB"
            head = (
                f"<< /Type /XObject /Subtype /Image /Width {w_px} "
                f"/Height {h_px} /BitsPerComponent 8 /ColorSpace {cs} "
                f"/Filter /FlateDecode{parms} /Length {len(data)} >>"
            )
        elif kind == "ccitt":
            data = b"\x00\x01\x02\x03"
            head = (
                f"<< /Type /XObject /Subtype /Image /Width {im['width']} "
                f"/Height {im['height']} /BitsPerComponent 1 "
                f"/ColorSpace /DeviceGray /Filter /CCITTFaxDecode "
                f"/Length {len(data)} >>"
            )
        else:
            raise ValueError(f"unknown fixture image kind {kind!r}")
        objs[num] = head.encode() + b"\nstream\n" + data + b"\nendstream"
    if objstm:
        # pack the non-stream dictionaries into one object stream
        packed_nums = [
            n for n in sorted(objs)
            if b"\nstream\n" not in objs[n]
        ]
        offs, payload = [], bytearray()
        for n2 in packed_nums:
            offs.append((n2, len(payload)))
            payload += objs[n2] + b"\n"
        head = " ".join(f"{n2} {o}" for n2, o in offs).encode() + b"\n"
        stm_num = max(objs) + 1
        data = zlib.compress(bytes(head + payload), 6)
        objs = {n2: v for n2, v in objs.items() if n2 not in packed_nums}
        objs[stm_num] = (
            f"<< /Type /ObjStm /N {len(offs)} /First {len(head)} "
            f"/Length {len(data)} /Filter /FlateDecode >>".encode()
            + b"\nstream\n" + data + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    maxnum = max(objs)
    out += f"xref\n0 {maxnum + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, maxnum + 1):
        if num in offsets:
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        else:
            out += b"0000000000 65535 f \n"
    trailer = f"<< /Size {maxnum + 1} /Root 1 0 R"
    if title is not None:
        trailer += f" /Info {info_num} 0 R"
    trailer += " >>"
    out += b"trailer\n" + trailer.encode()
    out += f"\nstartxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)
