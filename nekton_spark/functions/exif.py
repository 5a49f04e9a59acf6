r"""EXIF metadata: extraction and privacy scrubbing for JPEG media.

Camera JPEGs carry an APP1 "Exif" segment — a little TIFF file with
IFD tag tables — whose GPS sub-IFD is personally identifying: a
training corpus built from user photos must strip it (and usually all
APPn/COM metadata) before anything ships. This module gives the
pipeline both directions, original implementations from the public
specs (Exif 2.x / TIFF 6.0 IFD layout, JPEG T.81 segment framing):

- :func:`exif_extract` — parse APP1: byte order (II/MM), IFD0 tags
  orientation (0x0112), DateTime (0x0132), and the GPS IFD pointer
  (0x8825) with latitude/longitude decoded from their
  degree/minute/second RATIONALs. Malformed TIFF structures refuse
  with ValueError; a JPEG with no Exif returns all-NULL.
- :func:`jpeg_strip_metadata` — drop every APP1..APP15 and COM
  segment from the JPEG byte stream (APP0/JFIF stays: it carries
  density, not identity; entropy-coded data is untouched, so the
  DECODED PIXELS ARE BYTE-IDENTICAL — pinned by test and by the
  driver row's pixel checksums).
- :func:`exif_encode_app1` — fixture writer for the same tags.

Spark surface: :func:`media_exif` (columns orientation/datetime/
has_gps/lat/lon) and :func:`scrub_media_metadata` (cleaned payload in
place, byte-count telemetry) — both one Arrow pass, map-only.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ORIENT, _DATETIME, _GPS_PTR = 0x0112, 0x0132, 0x8825
_GPS_LAT_REF, _GPS_LAT, _GPS_LON_REF, _GPS_LON = 0x1, 0x2, 0x3, 0x4


def _jpeg_segments(b: bytes):
    """Yield (offset, marker, total_len) for each marker segment up to
    SOS; entropy-coded data follows SOS and is never walked."""
    if len(b) < 2 or b[0] != 0xFF or b[1] != 0xD8:
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        m = b[pos + 1]
        if m == 0xD9:  # EOI
            return
        if m == 0xDA:  # SOS — stop walking; rest is entropy data
            (ln,) = struct.unpack(">H", b[pos + 2 : pos + 4])
            yield pos, m, 2 + ln
            return
        (ln,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        if pos + 2 + ln > len(b):
            raise ValueError("truncated JPEG: segment exceeds payload")
        yield pos, m, 2 + ln
        pos += 2 + ln


def jpeg_strip_metadata(payload: bytes) -> bytes:
    """Remove APP1..APP15 and COM segments; everything else —
    including the entropy-coded stream — passes through byte-exact."""
    b = bytes(payload)
    drop: list[tuple[int, int]] = []
    for off, m, ln in _jpeg_segments(b):
        if (0xE1 <= m <= 0xEF) or m == 0xFE:  # APPn (n>=1) / COM
            drop.append((off, off + ln))
    if not drop:
        return b
    out = bytearray()
    prev = 0
    for a, z in drop:
        out += b[prev:a]
        prev = z
    out += b[prev:]
    return bytes(out)


def _ifd_entries(t: bytes, off: int, le: bool):
    fmt = "<" if le else ">"
    if off + 2 > len(t):
        raise ValueError("truncated EXIF: IFD count beyond payload")
    (n,) = struct.unpack(fmt + "H", t[off : off + 2])
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(t):
            raise ValueError("truncated EXIF: IFD entry beyond payload")
        tag, typ, cnt = struct.unpack(fmt + "HHI", t[e : e + 8])
        yield tag, typ, cnt, t[e + 8 : e + 12]


def _rational(t: bytes, off: int, le: bool, idx: int) -> float:
    fmt = "<" if le else ">"
    p = off + 8 * idx
    if p + 8 > len(t):
        raise ValueError("truncated EXIF: rational beyond payload")
    num, den = struct.unpack(fmt + "II", t[p : p + 8])
    if den == 0:
        raise ValueError("corrupt EXIF: zero-denominator rational")
    return num / den


def _dms(t: bytes, val4: bytes, le: bool) -> float:
    fmt = "<" if le else ">"
    (off,) = struct.unpack(fmt + "I", val4)
    d = _rational(t, off, le, 0)
    m = _rational(t, off, le, 1)
    s = _rational(t, off, le, 2)
    return d + m / 60 + s / 3600


def exif_extract(payload: bytes) -> dict:
    """APP1 Exif → {orientation, datetime, has_gps, lat, lon} (all
    None/0 when the JPEG carries no Exif)."""
    out = {
        "orientation": None, "datetime": None,
        "has_gps": 0, "lat": None, "lon": None,
    }
    b = bytes(payload)
    app1 = None
    for off, m, ln in _jpeg_segments(b):
        if m == 0xE1 and b[off + 4 : off + 10] == b"Exif\x00\x00":
            # ln is the TOTAL segment length (marker + length bytes
            # included), so the segment ends at off + ln exactly —
            # off + 2 + ln would leak 2 bytes of the NEXT marker into
            # the TIFF buffer and let its bounds checks admit them
            # (r12 ADVICE off-by-two).
            app1 = b[off + 10 : off + ln]
            break
    if app1 is None:
        return out
    t = app1
    if len(t) < 8:
        raise ValueError("truncated EXIF: short TIFF header")
    if t[:2] == b"II":
        le = True
    elif t[:2] == b"MM":
        le = False
    else:
        raise ValueError(f"corrupt EXIF: byte order {t[:2]!r}")
    fmt = "<" if le else ">"
    (magic,) = struct.unpack(fmt + "H", t[2:4])
    if magic != 42:
        raise ValueError(f"corrupt EXIF: TIFF magic {magic}")
    (ifd0,) = struct.unpack(fmt + "I", t[4:8])
    gps_off = None
    for tag, typ, cnt, val4 in _ifd_entries(t, ifd0, le):
        if tag == _ORIENT and typ == 3:  # SHORT
            out["orientation"] = struct.unpack(fmt + "H", val4[:2])[0]
        elif tag == _DATETIME and typ == 2:  # ASCII, 20 bytes incl NUL
            (p,) = struct.unpack(fmt + "I", val4)
            end = min(p + cnt, len(t))
            out["datetime"] = t[p:end].split(b"\x00")[0].decode("ascii", "replace")
        elif tag == _GPS_PTR and typ == 4:
            (gps_off,) = struct.unpack(fmt + "I", val4)
    if gps_off is not None:
        out["has_gps"] = 1
        lat = lon = None
        lat_sign = lon_sign = 1
        for tag, typ, cnt, val4 in _ifd_entries(t, gps_off, le):
            if tag == _GPS_LAT_REF:
                lat_sign = -1 if val4[:1] == b"S" else 1
            elif tag == _GPS_LON_REF:
                lon_sign = -1 if val4[:1] == b"W" else 1
            elif tag == _GPS_LAT and typ == 5 and cnt == 3:
                lat = _dms(t, val4, le)
            elif tag == _GPS_LON and typ == 5 and cnt == 3:
                lon = _dms(t, val4, le)
        out["lat"] = None if lat is None else lat_sign * lat
        out["lon"] = None if lon is None else lon_sign * lon
    return out


def exif_encode_app1(
    orientation: int | None = None,
    datetime: str | None = None,
    gps: tuple[float, float] | None = None,
    le: bool = True,
) -> bytes:
    """A genuine APP1 Exif segment for fixtures — IFD0 with the tags
    above; GPS coordinates encoded as degree/minute/second rationals
    with 1000-denominator seconds (so values with millisecond-arc
    precision round-trip exactly)."""
    fmt = "<" if le else ">"
    entries: list[tuple[int, int, int, bytes]] = []
    tail = bytearray()
    ifd0_off = 8

    def add_entry(tag, typ, cnt, val4):
        entries.append((tag, typ, cnt, val4))

    n_entries = (
        (orientation is not None) + (datetime is not None) + (gps is not None)
    )
    tail_base = ifd0_off + 2 + 12 * n_entries + 4
    if orientation is not None:
        add_entry(_ORIENT, 3, 1, struct.pack(fmt + "HH", orientation, 0))
    if datetime is not None:
        s = datetime.encode("ascii") + b"\x00"
        add_entry(_DATETIME, 2, len(s), struct.pack(fmt + "I", tail_base + len(tail)))
        tail += s
    if gps is not None:
        gps_ifd_off = None  # patched below
        add_entry(_GPS_PTR, 4, 1, b"\x00\x00\x00\x00")

    def dms_bytes(v: float) -> bytes:
        v = abs(v)
        d = int(v)
        m = int((v - d) * 60)
        s = round(((v - d) * 60 - m) * 60 * 1000)
        return struct.pack(fmt + "IIIIII", d, 1, m, 1, s, 1000)

    body = bytearray()
    body += (b"II" if le else b"MM") + struct.pack(fmt + "H", 42)
    body += struct.pack(fmt + "I", ifd0_off)
    body += struct.pack(fmt + "H", n_entries)
    ent_bytes = bytearray()
    for tag, typ, cnt, val4 in entries:
        ent_bytes += struct.pack(fmt + "HHI", tag, typ, cnt) + val4
    body += ent_bytes
    body += struct.pack(fmt + "I", 0)  # next IFD
    body += tail
    if gps is not None:
        gps_ifd_off = len(body)
        lat, lon = gps
        g = bytearray()
        g += struct.pack(fmt + "H", 4)
        rat_base = gps_ifd_off + 2 + 12 * 4 + 4
        g += struct.pack(fmt + "HHI", _GPS_LAT_REF, 2, 2) + (
            (b"S" if lat < 0 else b"N") + b"\x00\x00\x00"
        )
        g += struct.pack(fmt + "HHI", _GPS_LAT, 5, 3) + struct.pack(
            fmt + "I", rat_base
        )
        g += struct.pack(fmt + "HHI", _GPS_LON_REF, 2, 2) + (
            (b"W" if lon < 0 else b"E") + b"\x00\x00\x00"
        )
        g += struct.pack(fmt + "HHI", _GPS_LON, 5, 3) + struct.pack(
            fmt + "I", rat_base + 24
        )
        g += struct.pack(fmt + "I", 0)
        g += dms_bytes(lat) + dms_bytes(lon)
        # patch the GPS pointer value in IFD0
        for i, (tag, typ, cnt, _v) in enumerate(entries):
            if tag == _GPS_PTR:
                p = ifd0_off + 2 + 12 * i + 8
                body[p : p + 4] = struct.pack(fmt + "I", gps_ifd_off)
        body += g
    seg = b"Exif\x00\x00" + bytes(body)
    return b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment right after SOI (fixture helper)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


_EXIF_SCHEMA = T.StructType(
    [
        T.StructField("orientation", T.IntegerType()),
        T.StructField("exif_datetime", T.StringType()),
        T.StructField("has_gps", T.IntegerType()),
        T.StructField("gps_lat", T.DoubleType()),
        T.StructField("gps_lon", T.DoubleType()),
    ]
)


def media_exif(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Attach EXIF columns to JPEG media rows (non-JPEG / Exif-less
    rows get NULLs). One Arrow pass, map-only."""
    from .similarity import ensure_parallelism

    df = ensure_parallelism(df)  # heavy Arrow pass: fan out when under-partitioned


    @F.pandas_udf(_EXIF_SCHEMA)
    def _ex(media: pd.DataFrame) -> pd.DataFrame:
        # a struct input arrives as a pd.DataFrame with one column per
        # field (Arrow struct → pandas), not a Series of dicts
        rows = []
        for payload, mime in zip(media["payload"], media["mime"]):
            if payload is None or mime != "image/jpeg":
                rows.append((None, None, 0, None, None))
                continue
            e = exif_extract(payload)
            rows.append(
                (e["orientation"], e["datetime"], e["has_gps"], e["lat"], e["lon"])
            )
        return pd.DataFrame(
            rows,
            columns=["orientation", "exif_datetime", "has_gps", "gps_lat", "gps_lon"],
        )

    d = df.withColumn("_e", _ex(F.col(media_col)))
    for c in ("orientation", "exif_datetime", "has_gps", "gps_lat", "gps_lon"):
        d = d.withColumn(c, F.col(f"_e.{c}"))
    return d.drop("_e")


def scrub_media_metadata(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Strip APPn (n≥1) / COM from JPEG media payloads — and (r15)
    EXIF / XMP / ICCP chunks from WebP containers — in place;
    ``scrubbed_bytes`` records how much identity-bearing metadata each
    row shed. Decoded pixels are unchanged by construction."""
    from .similarity import ensure_parallelism

    df = ensure_parallelism(df)  # heavy Arrow pass: fan out when under-partitioned

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("scrubbed_bytes", T.IntegerType())]
    )

    def run(batches):
        def one(m):
            if m is None or m.get("payload") is None:
                return m, 0
            if m.get("mime") == "image/jpeg":
                clean = jpeg_strip_metadata(m["payload"])
            elif m.get("mime") == "image/webp":
                from .webp import webp_strip_metadata

                clean = webp_strip_metadata(m["payload"])
            else:
                return m, 0
            m2 = dict(m)
            m2["payload"] = clean
            return m2, len(m["payload"]) - len(clean)

        for pdf in batches:
            medias, shed = [], []
            for m in pdf[media_col]:
                m2, n = one(m)
                medias.append(m2)
                shed.append(n)
            yield pdf.assign(**{media_col: medias, "scrubbed_bytes": shed})

    return df.mapInPandas(run, out_schema)


def synth_jpeg_exif_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """REAL camera-style JPEG per row: the closed-form grayscale
    baseline payload (jpeg.synth_block_values) with an APP1 Exif —
    orientation 1 + key%8, DateTime from key (day/hour/min/sec
    cycles), GPS on key%3 == 0 at lat (key%90)+0.25 / lon
    −((key%180)+0.5) (quarter/half degrees are exact in the DMS
    rational encoding, so extraction is closed-form)."""
    from .jpeg import jpeg_encode_blocks, synth_block_values

    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField("media", T.StructType(
            [
                T.StructField("payload", T.BinaryType()),
                T.StructField("mime", T.StringType()),
                T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
            ]
        ))]
    )

    def run(batches):
        def one(key: int) -> dict:
            dcs, bx, w, h = synth_block_values(key)
            base = jpeg_encode_blocks(dcs, bx, w, h)
            dt = (
                f"2021:01:{1 + key % 28:02d} "
                f"{key % 24:02d}:{key % 60:02d}:{(key * 7) % 60:02d}"
            )
            gps = (
                ((key % 90) + 0.25, -((key % 180) + 0.5))
                if key % 3 == 0
                else None
            )
            app1 = exif_encode_app1(
                orientation=1 + key % 8, datetime=dt, gps=gps,
                le=bool(key % 2 == 0),
            )
            return {
                "payload": insert_app1(base, app1),
                "mime": "image/jpeg",
                "meta": {"origin": "synth-exif"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    from .similarity import ensure_parallelism

    # fan out BELOW the per-row Python pass (r15 opt): a 1-split
    # local input would serialize it on one task; no-op at scale
    return ensure_parallelism(df).mapInPandas(run, out_schema)
