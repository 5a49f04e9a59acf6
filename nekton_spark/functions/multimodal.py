"""Multimodal columns: image/audio/video as typed binary + metadata.

Model (SURVEY §2.5): a media item is a struct column

    media STRUCT<
      payload:  BINARY,                 -- opaque encoded bytes
      mime:     STRING,                 -- 'image/png', 'audio/wav', ...
      meta:     MAP<STRING,STRING>      -- width/height/sample_rate/...
    >

stored in Parquet (binary columns are first-class there; at 100 TB the
payloads dominate, so operators below select only the columns they
need — column pruning keeps metadata-only pipelines from reading
payload bytes at all).

Decode / feature-extraction run as Arrow-batched ``mapInPandas``
operators. Two codecs are REAL, needing no external library:

- Audio (WAV): stdlib ``wave`` — :func:`decode_audio` parses PCM
  headers and samples and derives sample-rate/duration/RMS features,
  verified bit-exactly against a DuckDB oracle that recomputes them
  from the synthesis closed form (:func:`synth_wav_media`).
- Image (PNG): stdlib ``zlib``/``struct`` — :func:`synth_png_media`
  writes genuine PNG files (signature, IHDR/IDAT/IEND chunks with
  CRCs, per-scanline filters cycling through all five filter types),
  and :func:`decode_image` parses and unfilters them back to pixels.
  The DuckDB oracle recomputes the expected pixels from the synthesis
  closed form, so any corruption in either direction of the
  filter/deflate/CRC round trip breaks the hash match.

- Image (JPEG): :mod:`.jpeg` implements baseline JPEG (ITU-T T.81)
  from the public spec — :func:`synth_jpeg_media` writes genuine JFIF
  bytes (Annex K Huffman tables, entropy-coded scan, byte stuffing)
  and :func:`decode_image` runs the real marker/Huffman/IDCT decoder
  on them. The synthesis restricts itself to DC-only blocks so the
  decoded pixels have an integer closed form a SQL oracle can replay;
  the decoder itself handles general single-component baseline
  streams.

- Image (color JPEG): 3-component SOF0 4:4:4 decodes for real too
  (interleaved MCUs, per-component DC prediction, JFIF YCbCr→RGB with
  SQL-replayable half-up rounding).
- Image (color PNG, r8): truecolor-8 (RGB) scanlines — PNG filters
  operate per byte with the left neighbor bpp=3 back (spec 9.2), so
  the same five-filter machinery encodes and decodes 3-channel rows
  (:func:`synth_png_color_media` / the generalized
  :func:`_png_decode`).
- Video (MJPEG AVI): :mod:`.video` writes and walks the RIFF/AVI
  container from the public spec; :func:`frame_sample` decodes only
  the sampled frames through the JPEG decoder — the standard
  frame-sampling shape for video corpora.

Inter-frame video codecs (H.26x/VP9/AV1) are not implementable from
scratch, so on those mimes the kernels refuse with
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (payload-hash-derived "pixels") exercises
the full Spark plumbing — schema, batching, partitioning — which *is*
real and tested.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)



def _fanned(df: DataFrame) -> DataFrame:
    """Fan a synth input out below its encode stage — a small corpus
    reads as one parquet split and the per-row encoder would run on a
    single task (ensure_parallelism no-ops at real scale and on
    already-repartitioned/streaming frames)."""
    from .similarity import ensure_parallelism

    return ensure_parallelism(df)

def pack_media(payload_col, mime_col, meta_col=None):
    meta = meta_col if meta_col is not None else F.lit(None).cast("map<string,string>")
    return F.struct(
        payload_col.alias("payload"), mime_col.alias("mime"), meta.alias("meta")
    )


def media_from_text(df: DataFrame, text_col: str = "text", mime: str = "application/octet-stream") -> DataFrame:
    """Test/demo constructor: wrap a text column's bytes as media.

    Engine-wide NULL-text contract applied HERE (the constructor is
    the user surface): a NULL document becomes an EMPTY payload, not a
    NULL one — ``encode(NULL)`` would otherwise flow a null-payload
    media struct into decode_image's deliberate null-media refusal
    (caught by fuzz seed 88: a NULL-text doc inside
    multimodal_decode's 20-doc sample errored the whole query)."""
    return df.withColumn(
        "media",
        pack_media(
            F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8"),
            F.lit(mime),
            F.create_map(F.lit("origin"), F.lit("text")),
        ),
    )


def _fake_decode(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic fake decoder: seed from md5(payload) → uint8 array.

    Stands in for a real codec (PIL/libjpeg) that this container lacks;
    same payload always yields the same "image"."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def decode_image(
    df: DataFrame,
    media_col: str = "media",
    height: int = 8,
    width: int = 8,
    fake: bool = False,
) -> DataFrame:
    """media → (…, pixels: array<int>, dec_height, dec_width).

    PNG payloads (mime ``image/png``) decode for REAL via the stdlib
    zlib/struct parser (:func:`_png_decode`); JPEG payloads (mime
    ``image/jpeg``) via the pure-numpy baseline decoder
    (:func:`.jpeg.jpeg_decode`). ``height``/``width`` are ignored for
    both (dimensions come from the headers). Other formats need codec
    libraries this container lacks: pass fake=True for the
    deterministic stub decoder. The mapInPandas plumbing (Arrow batches
    of binary, flat pixel output) is identical for all paths.
    """
    from .similarity import ensure_parallelism

    df = ensure_parallelism(df)  # heavy Arrow pass: fan out when under-partitioned

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("pixels", T.ArrayType(T.IntegerType()), True),
            T.StructField("dec_height", T.IntegerType(), True),
            T.StructField("dec_width", T.IntegerType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(m: dict) -> tuple:
            if m is None or m.get("payload") is None:
                # the frame_sample contract, enforced consistently: a
                # clear refusal instead of an opaque NoneType TypeError
                raise ValueError(
                    "null media struct/payload: filter null rows out "
                    "before decode_image"
                )
            if not fake:
                if m["mime"] == "image/png":
                    pix = _png_decode(m["payload"])
                elif m["mime"] == "image/jpeg":
                    from .jpeg import jpeg_decode

                    pix = jpeg_decode(m["payload"])
                elif m["mime"] == "image/gif":
                    from .gif import gif_decode

                    pix = gif_decode(m["payload"])
                elif m["mime"] == "image/bmp":
                    from .bmp import bmp_decode

                    pix = bmp_decode(m["payload"])
                elif m["mime"] == "image/webp":
                    from .webp import webp_decode

                    pix = webp_decode(m["payload"])
                elif m["mime"] == "image/tiff":
                    from .tiff import tiff_decode

                    pix = tiff_decode(m["payload"])
                else:
                    raise NotImplementedError(
                        f"no codec for {m['mime']!r} in this environment; "
                        "use fake=True for the deterministic stub decoder"
                    )
            else:
                pix = _fake_decode(m["payload"], height, width)
            return pix.ravel().astype(np.int64).tolist(), pix.shape[0], pix.shape[1]

        for pdf in batches:
            px, hh, ww = [], [], []
            for m in pdf[media_col]:
                p, a, b = one(m)
                px.append(p)
                hh.append(a)
                ww.append(b)
            yield pdf.assign(pixels=px, dec_height=hh, dec_width=ww)

    return df.mapInPandas(run, out_schema)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


_REFUSAL_CODES = [
    # (message substring, stable reason code) — first match wins; the
    # substrings are the codec modules' own refusal wordings, pinned by
    # tests so a reworded exception can't silently retire a code
    ("no codec", "unsupported_mime"),
    ("baseline", "unsupported_sof"),  # lossless/hierarchical/arithmetic
    ("sampling factors", "sampling_factors"),
    ("quant", "quant_16bit"),
    ("restart", "restart_desync"),
    ("truncated", "truncated"),
    ("SOI", "bad_signature"),
    ("not a JPEG", "bad_signature"),
    ("PNG", "bad_png"),
    ("zero-dimension", "zero_dim"),
    # sub-canvas composition errors; reserved disposals 4-7 word their
    # refusal "GIF disposal method N is reserved" and map to bad_gif
    # via the "GIF" row below (disposal 3 decodes since r14)
    ("composition", "gif_composition"),
    ("LZW", "bad_lzw"),
    ("GIF", "bad_gif"),
    ("delta escape", "rle_delta"),
    ("RLE", "bad_rle"),
    ("BMP", "bad_bmp"),
    ("Huffman", "bad_entropy"),
    # WebP (r15): VP8L decodes for real; lossy VP8 and animation are
    # reason-coded envelope refusals, structural damage is bad_webp.
    # (after the Huffman row so a broken-prefix-code refusal keeps the
    # codec-family-neutral bad_entropy code)
    ("lossy WebP", "lossy_webp"),
    ("animated WebP", "webp_animation"),
    ("WebP", "bad_webp"),
    # TIFF (r15): CCITT/JPEG-in-TIFF/tiled are envelope refusals;
    # structural damage is bad_tiff (LZW damage keeps the shared
    # bad_lzw via the earlier row)
    ("CCITT", "ccitt_tiff"),
    ("JPEG compression", "tiff_jpeg"),
    ("tiled TIFF", "tiff_tiled"),
    ("TIFF", "bad_tiff"),
    ("marker", "bad_marker"),
    ("null media", "null_payload"),
]


def _refusal_code(e: BaseException) -> str:
    s = str(e)
    for key, code in _REFUSAL_CODES:
        if key in s:
            return code
    return "corrupt"


def decode_coverage(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Per-row decode-coverage telemetry (r11 verdict #8): attempt the
    REAL decode of each media payload and annotate the row with
    ``decode_status`` ('ok' | 'refused' | 'null') and a stable
    reason-coded ``decode_reason`` ('png'/'jpeg' codec tag on success;
    'unsupported_mime', 'truncated', 'progressive_jpeg',
    'sampling_factors', 'restart_desync', … on refusal — see
    ``_REFUSAL_CODES``). A 100 TB curation run rolls this up
    (groupBy(status, reason).count(), one bounded partial-agg'd
    shuffle) to see what fraction of its media the codec envelope
    actually decodes and WHY the rest refused — without that counter a
    refuse-don't-misparse codec silently looks like full coverage.
    Map-only: one Arrow pass, decode results are discarded (statuses
    only), no shuffle."""
    from .similarity import ensure_parallelism

    df = ensure_parallelism(df)  # heavy Arrow pass: fan out when under-partitioned

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("decode_status", T.StringType(), False),
            T.StructField("decode_reason", T.StringType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import jpeg_decode

        def one(m) -> tuple:
            if m is None or m.get("payload") is None:
                return "null", "null_payload"
            try:
                if m["mime"] == "image/png":
                    _png_decode(m["payload"])
                    return "ok", "png"
                if m["mime"] == "image/jpeg":
                    jpeg_decode(m["payload"])
                    return "ok", "jpeg"
                if m["mime"] == "image/gif":
                    from .gif import gif_decode

                    gif_decode(m["payload"])
                    return "ok", "gif"
                if m["mime"] == "image/bmp":
                    from .bmp import bmp_decode

                    bmp_decode(m["payload"])
                    return "ok", "bmp"
                if m["mime"] == "image/webp":
                    from .webp import webp_decode

                    webp_decode(m["payload"])
                    return "ok", "webp"
                if m["mime"] == "image/tiff":
                    from .tiff import tiff_decode

                    tiff_decode(m["payload"])
                    return "ok", "tiff"
                raise NotImplementedError(
                    f"no codec for {m['mime']!r} in this environment"
                )
            except (ValueError, NotImplementedError) as e:
                return "refused", _refusal_code(e)

        for pdf in batches:
            st, rs = [], []
            for m in pdf[media_col]:
                a, b = one(m)
                st.append(a)
                rs.append(b)
            yield pdf.assign(decode_status=st, decode_reason=rs)

    return df.mapInPandas(run, out_schema)


_WAV_GUID_SUFFIX = bytes.fromhex("000000001000800000aa00389b71")


def _wav_encode(samples: np.ndarray, fmt: str, rate: int, extensible: bool = False) -> bytes:
    """Genuine RIFF/WAVE bytes for 1-channel audio across the r12
    envelope: ``fmt`` ∈ pcm8 (samples are CENTERED ints, stored
    +128 unsigned) / pcm16 / pcm24 (3-byte LE two's complement) /
    pcm32 / float32 / float64 / ulaw / alaw (for the G.711 formats
    samples ARE the 8-bit codewords, written through unchanged);
    ``extensible=True`` wraps the format in a WAVE_FORMAT_EXTENSIBLE
    fmt chunk (SubFormat GUID)."""
    tag, bits = {
        "pcm8": (1, 8), "pcm16": (1, 16), "pcm24": (1, 24),
        "pcm32": (1, 32), "float32": (3, 32), "float64": (3, 64),
        "alaw": (6, 8), "ulaw": (7, 8),
    }[fmt]
    if tag in (6, 7):
        data = np.asarray(samples, dtype=np.int64).astype(np.uint8).tobytes()
    elif tag == 3:
        data = samples.astype("<f4" if bits == 32 else "<f8").tobytes()
    elif bits == 8:
        data = (np.asarray(samples, dtype=np.int64) + 128).astype(np.uint8).tobytes()
    elif bits == 24:
        v = np.asarray(samples, dtype=np.int64) & 0xFFFFFF
        b = np.empty((len(v), 3), dtype=np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        data = b.tobytes()
    else:
        data = np.asarray(samples, dtype=np.int64).astype(
            "<i2" if bits == 16 else "<i4"
        ).tobytes()
    sw = bits // 8
    if extensible:
        fmt_body = struct.pack(
            "<HHIIHHHHI", 0xFFFE, 1, rate, rate * sw, sw, bits, 22, bits, 0
        ) + struct.pack("<H", tag) + _WAV_GUID_SUFFIX
    else:
        fmt_body = struct.pack("<HHIIHH", tag, 1, rate, rate * sw, sw, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"  # word alignment pad
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def synth_wav_envelope_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL WAV payload per row cycling the r12 audio
    envelope: fmt = (pcm8, pcm16, pcm24, float32)[key % 4], wrapped in
    WAVE_FORMAT_EXTENSIBLE on odd keys; n = 64 + key % 64 mono samples
    at 8000 Hz with s_i = ((key*31 + i*17) % 4096) − 2048 (pcm8 uses
    the mod-256 variant) — integer-valued everywhere, so rate /
    n_samples / rms are SQL-replayable in closed form."""
    import numpy as np

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            fmt = ("pcm8", "pcm16", "pcm24", "float32")[key % 4]
            n = 64 + key % 64
            i = np.arange(n)
            if fmt == "pcm8":
                s = (key * 31 + i * 17) % 256 - 128
            else:
                s = (key * 31 + i * 17) % 4096 - 2048
            return {
                "payload": _wav_encode(s, fmt, 8000, extensible=bool(key % 2)),
                "mime": "audio/wav",
                "meta": {"origin": "synth-wav-envelope"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    # fan out BELOW the synth encoder (r15 opt): a 1-split local
    # parquet would serialize the per-row encode on one task
    return _fanned(df).mapInPandas(run, out_schema)


def synth_wav_g711_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL G.711 telephony WAV per row: fmt = ulaw on even
    keys / alaw on odd (alaw rides the WAVE_FORMAT_EXTENSIBLE wrapper),
    n = 64 + key % 64 codewords b_i = (key*31 + i*17) % 256 at
    8000 Hz. The codewords are the closed form, so the oracle decodes
    them with the same G.711 segment formulas in SQL and lands on the
    identical integer linears."""
    import numpy as np

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            fmt = ("ulaw", "alaw")[key % 2]
            n = 64 + key % 64
            b = (key * 31 + np.arange(n) * 17) % 256
            return {
                "payload": _wav_encode(b, fmt, 8000, extensible=bool(key % 2)),
                "mime": "audio/wav",
                "meta": {"origin": "synth-wav-g711"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    # fan out BELOW the synth encoder (r15 opt): a 1-split local
    # parquet would serialize the per-row encode on one task
    return _fanned(df).mapInPandas(run, out_schema)


def synth_png_palette_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL palette PNG per row exercising the r12 envelope:
    bit depth d = (1, 2, 4, 8)[key % 4], Adam7 INTERLACE on odd keys,
    per-row filter cycling — with a closed-form palette and index map
    so the decoded RGB is SQL-replayable: n = 2^d entries,
    palette[i][c] = (key*7 + i*13 + c*29) % 256, index(y, x) =
    (key + 3y + x) % n, dims w = 8 + key%9, h = 8 + key%7 (the
    synth_pixels geometry)."""
    import numpy as np

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            d = (1, 2, 4, 8)[key % 4]
            n = 1 << d
            w, h = 8 + key % 9, 8 + key % 7
            i = np.arange(n)
            pal = np.stack(
                [(key * 7 + i * 13 + c * 29) % 256 for c in range(3)], axis=1
            ).astype(np.uint8)
            yy, xx = np.mgrid[0:h, 0:w]
            idx = (key + 3 * yy + xx) % n
            return {
                "payload": _png_encode_ex(
                    idx, 3, d, interlace=key % 2, palette=pal
                ),
                "mime": "image/png",
                "meta": {"origin": "synth-palette"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    # fan out BELOW the synth encoder (r15 opt): a 1-split local
    # parquet would serialize the per-row encode on one task
    return _fanned(df).mapInPandas(run, out_schema)


def synth_gif_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL GIF per row (functions/gif.py): palette size
    2^d with d = (1, 2, 4, 8)[key % 4], 4-pass INTERLACE on odd keys,
    a transparent index (GCE, → RGBA) on key % 5 == 0. Palette,
    index map and dims share the PNG-palette closed forms —
    palette[i][c] = (key*7 + i*13 + c*29) % 256, index(y, x) =
    (key + 3y + x) % n, w = 8 + key%9, h = 8 + key%7 — so the decoded
    flat array is SQL-replayable through the LZW round trip."""
    import numpy as np

    from .gif import gif_encode

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            d = (1, 2, 4, 8)[key % 4]
            n = 1 << d
            w, h = 8 + key % 9, 8 + key % 7
            i = np.arange(n)
            pal = np.stack(
                [(key * 7 + i * 13 + c * 29) % 256 for c in range(3)], axis=1
            ).astype(np.uint8)
            yy, xx = np.mgrid[0:h, 0:w]
            idx = ((key + 3 * yy + xx) % n).astype(np.uint8)
            return {
                "payload": gif_encode(
                    idx,
                    pal,
                    interlace=bool(key % 2),
                    transparent_index=(key % n) if key % 5 == 0 else None,
                ),
                "mime": "image/gif",
                "meta": {"origin": "synth-gif"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    # fan out BELOW the synth encoder (r15 opt): a 1-split local
    # parquet would serialize the per-row encode on one task
    return _fanned(df).mapInPandas(run, out_schema)


def synth_webp_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL lossless WebP per row (functions/webp.py — VP8L
    from spec, r15). Three closed-form legs by key % 3, each driving a
    different part of the VP8L surface while keeping the decoded RGBA
    array SQL-replayable (w = 8 + key%9, h = 8 + key%7; alpha is 255
    except on key % 5 == 0, where it is closed-form too):

    - 0 TRUECOLOR literals: v(y, x, c) = (key*31 + y*17 + x*7 + c*11)
      % 256 for c in (R, G, B) and — on the alpha keys — c = 3 (so
      alpha = v + 33). Encoded with subtract-green on odd keys and a
      color cache of 1 + key%10 bits on key % 4 < 2: the bytes differ
      per key, the decoded pixels never do.
    - 1 RLE runs: the same form evaluated at x' = x - x%3 (horizontal
      runs of three), encoded with distance-1 LZ77 copy tokens — the
      length/distance prefix path.
    - 2 PALETTE: the PNG-palette closed forms — d = (1,2,4,8)[key%4],
      n = 2^d, palette[i][c] = (key*7 + i*13 + c*29) % 256 (alpha
      keys: palette alpha = (key*7 + i*13 + 97) % 256), index(y, x) =
      (key + 3y + x) % n — through the color-indexing transform with
      spec pixel bundling (d = 1/2/4 packs 8/4/2 indices per green
      byte)."""
    import numpy as np

    from .similarity import ensure_parallelism
    from .webp import webp_encode_lossless, webp_encode_palette

    # the VP8L encoder (real per-image canonical Huffman builds) is
    # the heaviest synth in the fixture family — fan out BEFORE the
    # encode stage or a 1-split local parquet serializes it
    df = ensure_parallelism(df)

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            w, h = 8 + key % 9, 8 + key % 7
            leg = key % 3
            alpha_key = key % 5 == 0
            if leg < 2:
                yy, xx = np.mgrid[0:h, 0:w]
                if leg == 1:
                    xx = xx - xx % 3
                img = np.stack(
                    [(key * 31 + yy * 17 + xx * 7 + c * 11) % 256 for c in range(4)],
                    axis=2,
                ).astype(np.uint8)
                if not alpha_key:
                    img[..., 3] = 255
                payload = webp_encode_lossless(
                    img,
                    subtract_green=bool(key % 2),
                    cache_bits=(1 + key % 10) if key % 4 < 2 else 0,
                    use_rle=leg == 1,
                )
            else:
                d = (1, 2, 4, 8)[key % 4]
                n = 1 << d
                i = np.arange(n)
                pal = np.stack(
                    [(key * 7 + i * 13 + c * 29) % 256 for c in range(3)]
                    + [
                        (key * 7 + i * 13 + 97) % 256
                        if alpha_key
                        else np.full(n, 255)
                    ],
                    axis=1,
                ).astype(np.uint8)
                yy, xx = np.mgrid[0:h, 0:w]
                idx = ((key + 3 * yy + xx) % n).astype(np.uint8)
                payload = webp_encode_palette(idx, pal)
            return {
                "payload": payload,
                "mime": "image/webp",
                "meta": {"origin": "synth-webp"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    return df.mapInPandas(run, out_schema)


def synth_tiff_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL TIFF per row (functions/tiff.py — baseline TIFF
    6.0 from spec, r15). Five closed-form legs by key % 5, each a
    different (compression, photometric, bit-depth) corner while the
    decoded pixels stay SQL-replayable (w = 8 + key%9, h = 8 + key%7):

    - 0 gray-8 UNCOMPRESSED: v(y, x) = (key*31 + y*17 + x*7) % 256;
    - 1 RGB-8 LZW + horizontal PREDICTOR, multi-strip (rows_per_strip
      4): v(y, x, c) = (key*31 + y*17 + x*7 + c*11) % 256;
    - 2 PALETTE-4 PackBits (bit-packed rows): palette[i][c] =
      (key*7 + i*13 + c*29) % 256, index(y, x) = (key + 3y + x) % 16;
    - 3 gray-8 DEFLATE, multi-strip (rows_per_strip 3): same form as
      leg 0;
    - 4 BILEVEL WhiteIsZero uncompressed: bit(y, x) = (key + 3y + x)
      % 2, decoding to (1 - bit) * 255."""
    import numpy as np

    from .tiff import tiff_encode

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            w, h = 8 + key % 9, 8 + key % 7
            leg = key % 5
            yy, xx = np.mgrid[0:h, 0:w]
            if leg == 0:
                img = ((key * 31 + yy * 17 + xx * 7) % 256).astype(np.uint8)
                payload = tiff_encode([img])
            elif leg == 1:
                img = np.stack(
                    [(key * 31 + yy * 17 + xx * 7 + c * 11) % 256
                     for c in range(3)],
                    axis=2,
                ).astype(np.uint8)
                payload = tiff_encode(
                    [img], compression=5, predictor=2, rows_per_strip=4
                )
            elif leg == 2:
                i = np.arange(16)
                pal = np.stack(
                    [(key * 7 + i * 13 + c * 29) % 256 for c in range(3)],
                    axis=1,
                ).astype(np.uint8)
                idx = ((key + 3 * yy + xx) % 16).astype(np.uint8)
                payload = tiff_encode(
                    [idx], compression=32773, photometric=3,
                    palette=pal, bits=4,
                )
            elif leg == 3:
                img = ((key * 31 + yy * 17 + xx * 7) % 256).astype(np.uint8)
                payload = tiff_encode(
                    [img], compression=8, rows_per_strip=3
                )
            else:
                bits = ((key + 3 * yy + xx) % 2).astype(np.uint8)
                payload = tiff_encode([bits], photometric=0, bits=1)
            return {
                "payload": payload,
                "mime": "image/tiff",
                "meta": {"origin": "synth-tiff"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    # fan out BELOW the synth encoder (r15 opt): a 1-split local
    # parquet would serialize the per-row encode on one task
    return _fanned(df).mapInPandas(run, out_schema)


def synth_webp_anim_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL animated WebP per row (functions/webp.py r15 —
    VP8X/ANIM/ANMF container, every frame a genuine VP8L stream):
    2 + key % 3 frames on a (w, h) = (8 + key%9, 8 + key%7) canvas.
    Frame 0 covers the canvas, opaque, v0(y, x, c) = (key*31 + y*17 +
    x*7 + c*11) % 256; frames f >= 1 are opaque inset patches at
    (2, 2) of size (w-4, h-4) with PATCH-LOCAL closed form
    vf(y, x, c) = (key*31 + f*53 + y*17 + x*7 + c*11) % 256, blend
    method alternating no-blend (odd f) / alpha-blend (even f — an
    opaque source makes both paths land identical pixels, so the
    oracle replay is exact while both blend branches execute).
    Disposal stays 0 here (dispose-to-background is pinned by the
    unit tests' hand-computed canvases)."""
    import numpy as np

    from .similarity import ensure_parallelism
    from .webp import webp_encode_anim

    # per-frame VP8L encodes: fan out before the heavy synth stage
    df = ensure_parallelism(df)

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            w, h = 8 + key % 9, 8 + key % 7
            n_frames = 2 + key % 3
            yy, xx = np.mgrid[0:h, 0:w]
            f0 = np.stack(
                [(key * 31 + yy * 17 + xx * 7 + c * 11) % 256 for c in range(3)]
                + [np.full((h, w), 255)],
                axis=2,
            ).astype(np.uint8)
            frames = [{"rgba": f0, "x": 0, "y": 0, "blend": False}]
            pyy, pxx = np.mgrid[0 : h - 4, 0 : w - 4]
            for f in range(1, n_frames):
                patch = np.stack(
                    [
                        (key * 31 + f * 53 + pyy * 17 + pxx * 7 + c * 11) % 256
                        for c in range(3)
                    ]
                    + [np.full((h - 4, w - 4), 255)],
                    axis=2,
                ).astype(np.uint8)
                frames.append(
                    {"rgba": patch, "x": 2, "y": 2, "blend": f % 2 == 0}
                )
            return {
                "payload": webp_encode_anim(frames, (w, h)),
                "mime": "image/webp",
                "meta": {"origin": "synth-webp-anim"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    return df.mapInPandas(run, out_schema)


def synth_gif_anim_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL animated GIF per row: 2 + key % 3 frames over one
    16-color global table, interlaced on odd keys. Frame f's index map
    is (key + f + 3y + x) % 16 with the shared closed-form palette.

    r13 — DELTA frames: keys with key % 3 == 1 carry frame 0 full
    canvas and every later frame as a SUB-CANVAS inset patch (x0=y0=1,
    (h-2)x(w-2), disposal 1) whose indices follow the same global
    formula on the patch region — so the composited canvas at frame f
    is closed-form: interior = frame-f colors, 1-pixel border = frame-0
    colors, alpha 255 (RGBA, the composition-path contract). Keys with
    key % 3 == 0 stay all-full-canvas and exercise the byte-identical
    legacy path (RGB) in the same driver row.

    r14 — DISPOSAL 3 (r13 verdict #5): keys with key % 3 == 2 make the
    restore-to-previous semantics OBSERVABLE in the sampled frame:
    frame 1 is the (1,1) inset patch with disposal 3 (reverted after
    emit), frame 2 a SMALLER (2,2) (h-4)x(w-4) disposal-1 patch — so
    sampled frame 2's canvas must show frame-0 pixels in the ring
    frame 1 covered (a decoder that treats disposal 3 as 'do not
    dispose' leaves frame-1 colors there; as 'clear', transparency —
    both change px_sum). Frame 3 is the (1,1) disposal-1 patch."""
    import numpy as np

    from .gif import gif_encode, gif_encode_anim

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            w, h = 8 + key % 9, 8 + key % 7
            i = np.arange(16)
            pal = np.stack(
                [(key * 7 + i * 13 + c * 29) % 256 for c in range(3)], axis=1
            ).astype(np.uint8)
            yy, xx = np.mgrid[0:h, 0:w]
            n_frames = 2 + key % 3
            if key % 3 == 0:
                frames = [
                    ((key + f + 3 * yy + xx) % 16).astype(np.uint8)
                    for f in range(n_frames)
                ]
                payload = gif_encode(frames, pal, interlace=bool(key % 2))
            else:
                pyy, pxx = np.mgrid[1 : h - 1, 1 : w - 1]
                qyy, qxx = np.mgrid[2 : h - 2, 2 : w - 2]

                def patch(f: int) -> dict:
                    if key % 3 == 2 and f == 1:
                        return {
                            "indices": (
                                (key + 1 + 3 * pyy + pxx) % 16
                            ).astype(np.uint8),
                            "x0": 1, "y0": 1, "disposal": 3,
                        }
                    if key % 3 == 2 and f == 2:
                        return {
                            "indices": (
                                (key + 2 + 3 * qyy + qxx) % 16
                            ).astype(np.uint8),
                            "x0": 2, "y0": 2, "disposal": 1,
                        }
                    return {
                        "indices": (
                            (key + f + 3 * pyy + pxx) % 16
                        ).astype(np.uint8),
                        "x0": 1, "y0": 1, "disposal": 1,
                    }

                patches = [
                    {"indices": ((key + 3 * yy + xx) % 16).astype(np.uint8)}
                ] + [patch(f) for f in range(1, n_frames)]
                payload = gif_encode_anim(
                    patches, pal, (w, h), interlace=bool(key % 2)
                )
            return {
                "payload": payload,
                "mime": "image/gif",
                "meta": {"origin": "synth-gif-anim"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    # fan out BELOW the synth encoder (r15 opt): a 1-split local
    # parquet would serialize the per-row encode on one task
    return _fanned(df).mapInPandas(run, out_schema)


def synth_bmp_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL BMP per row (functions/bmp.py): bpp =
    (1, 4, 8, 24)[key % 4] — the 8-bit leg rides BI_RLE8, top-down on
    odd keys. Indexed legs share the closed-form palette/index maps;
    the 24-bit leg uses the SAME formulas with a virtual 256-entry
    palette (value = (key*7 + idx*13 + c*29) % 256 with idx =
    (key + 3y + x) % n, n = (2, 16, 256, 256)[key % 4]) so one oracle
    expression replays every leg."""
    import numpy as np

    from .bmp import bmp_encode

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            bpp = (1, 4, 8, 24)[key % 4]
            n = (2, 16, 256, 256)[key % 4]
            w, h = 8 + key % 9, 8 + key % 7
            i = np.arange(n)
            pal = np.stack(
                [(key * 7 + i * 13 + c * 29) % 256 for c in range(3)], axis=1
            ).astype(np.uint8)
            yy, xx = np.mgrid[0:h, 0:w]
            idx = ((key + 3 * yy + xx) % n).astype(np.uint8)
            if bpp == 24:
                img = pal[idx]
                payload = bmp_encode(img, 24, top_down=bool(key % 2))
            else:
                payload = bmp_encode(
                    idx, bpp, palette=pal,
                    top_down=bool(key % 2), rle8=(bpp == 8),
                )
            return {
                "payload": payload,
                "mime": "image/bmp",
                "meta": {"origin": "synth-bmp"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    # fan out BELOW the synth encoder (r15 opt): a 1-split local
    # parquet would serialize the per-row encode on one task
    return _fanned(df).mapInPandas(run, out_schema)


def synth_jpeg_progressive_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL progressive (SOF2) JPEG payload per row
    (:func:`.jpeg.jpeg_encode_progressive` — full successive-
    approximation scan script: interleaved DC first at Al=2, two DC
    refinement scans, AC first + refinement over split spectral bands,
    restart interval key % 3). The coefficients are the SAME DC-only
    blocks as :func:`synth_jpeg_media` (:func:`.jpeg.synth_block_values`
    closed form), so block b of image ``key`` decodes to the constant
    (key*31 + b*17) % 256 exactly — the identical SQL oracle covers the
    whole progressive path."""
    import numpy as np

    from .jpeg import jpeg_encode_progressive, synth_block_values

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            dcs, bx, w, h = synth_block_values(key)
            rows = np.zeros((len(dcs), 64), dtype=np.int64)
            rows[:, 0] = dcs
            return {
                "payload": jpeg_encode_progressive(
                    [rows],
                    [(1, 1)],
                    bx,
                    w,
                    h,
                    dc_al=2,
                    ac_al=1,
                    bands=((1, 5), (6, 63)),
                    restart_interval=key % 3,
                ),
                "mime": "image/jpeg",
                "meta": {"origin": "synth-progressive"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    # fan out BELOW the synth encoder (r15 opt): a 1-split local
    # parquet would serialize the per-row encode on one task
    return _fanned(df).mapInPandas(run, out_schema)


def synth_coverage_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Deterministic mixed-coverage corpus for the decode_coverage
    oracle row: key % 7 selects the payload class — 0 PNG, 1 grayscale
    JPEG, 2 4:2:0 JPEG (restart interval key % 3), 3 a TRUNCATED JPEG
    (cut inside the APP0/DQT headers at 10 + key % 10 bytes, always a
    'truncated' refusal), 4 an unsupported mime, 5 a lossless WebP
    (VP8L decodes for real, r15), 6 a lossy WebP (always the
    reason-coded 'lossy_webp' refusal). The expected (status, reason)
    is a pure function of the key residue, so a SQL oracle replays the
    rollup in closed form."""
    import struct as _struct

    import numpy as np

    from .jpeg import (
        jpeg_encode_blocks,
        jpeg_encode_blocks_420,
        synth_420_block_values,
        synth_block_values,
    )
    from .webp import webp_encode_lossless

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            r = key % 7
            if r == 5:
                img = np.stack(
                    [(key * 31 + np.add.outer(np.arange(8) * 17, np.arange(8) * 7)
                      + c * 11) % 256 for c in range(3)]
                    + [np.full((8, 8), 255)],
                    axis=2,
                ).astype(np.uint8)
                return {
                    "payload": webp_encode_lossless(
                        img, subtract_green=bool(key % 2)
                    ),
                    "mime": "image/webp",
                    "meta": {"cls": "webp"},
                }
            if r == 6:
                return {
                    "payload": (
                        b"RIFF" + _struct.pack("<I", 16) + b"WEBP"
                        + b"VP8 " + _struct.pack("<I", 4) + b"\x00" * 4
                    ),
                    "mime": "image/webp",
                    "meta": {"cls": "lossy_webp"},
                }
            if r == 0:
                return {
                    "payload": _png_encode(_synth_pixels(key)),
                    "mime": "image/png",
                    "meta": {"cls": "png"},
                }
            if r == 1:
                dcs, bx, w, h = synth_block_values(key)
                return {
                    "payload": jpeg_encode_blocks(dcs, bx, w, h),
                    "mime": "image/jpeg",
                    "meta": {"cls": "jpeg"},
                }
            if r == 2:
                dy, dcb, dcr, mx, w, h = synth_420_block_values(key)
                return {
                    "payload": jpeg_encode_blocks_420(
                        dy, dcb, dcr, mx, w, h, restart_interval=key % 3
                    ),
                    "mime": "image/jpeg",
                    "meta": {"cls": "jpeg420"},
                }
            if r == 3:
                dcs, bx, w, h = synth_block_values(key)
                cut = 10 + key % 10  # always inside the header segments
                return {
                    "payload": jpeg_encode_blocks(dcs, bx, w, h)[:cut],
                    "mime": "image/jpeg",
                    "meta": {"cls": "truncated"},
                }
            return {
                "payload": b"\x00\x01\x02\x03",
                "mime": "video/h264",
                "meta": {"cls": "unsupported"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    # fan out BELOW the synth encoder (r15 opt): a 1-split local
    # parquet would serialize the per-row encode on one task
    return _fanned(df).mapInPandas(run, out_schema)


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec 9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib as _z

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png_encode(pix: np.ndarray) -> bytes:
    """Genuine PNG bytes for an (h, w) uint8 grayscale-8 array or an
    (h, w, 3) uint8 truecolor-8 (RGB) array. Each scanline y uses
    filter type y % 5, so a payload round trip exercises
    None/Sub/Up/Average/Paeth encode AND decode paths. PNG filters
    operate per BYTE with the left neighbor ``bpp`` bytes back (spec
    9.2), so the same vectorized forms serve both color types."""
    import struct
    import zlib as _z

    if pix.ndim == 2:
        h, w = pix.shape
        bpp, ctype = 1, 0
    else:
        h, w, nc = pix.shape
        if nc != 3:
            raise ValueError(f"PNG encoder supports 1 or 3 channels, got {nc}")
        bpp, ctype = 3, 2
    rowbytes = w * bpp
    raw = _png_filter_rows(
        pix.reshape(h, rowbytes).astype(np.int64), bpp
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_filter_rows(byte_rows: np.ndarray, bpp: int) -> bytearray:
    """Forward-filter (h, rowbytes) byte rows, scanline y using filter
    type y % 5 so round trips exercise None/Sub/Up/Average/Paeth both
    ways. Encoder-side Paeth predicts from ORIGINAL neighbors (no
    reconstruction recurrence), so it vectorizes exactly."""
    h, rowbytes = byte_rows.shape
    prev = np.zeros(rowbytes, dtype=np.int64)
    raw = bytearray()
    for y in range(h):
        cur = byte_rows[y]
        f = y % 5
        left = np.concatenate((np.zeros(bpp, dtype=np.int64), cur[:-bpp]))
        upleft = np.concatenate((np.zeros(bpp, dtype=np.int64), prev[:-bpp]))
        if f == 0:
            out = cur
        elif f == 1:
            out = cur - left
        elif f == 2:
            out = cur - prev
        elif f == 3:
            out = cur - (left + prev) // 2
        else:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            out = cur - pred
        raw.append(f)
        raw.extend((out % 256).astype(np.uint8).tobytes())
        prev = cur
    return raw


def _png_pack_rows(samples: np.ndarray, depth: int) -> np.ndarray:
    """(nrows, w, channels) integer samples → (nrows, rowbytes) bytes:
    MSB-first bit packing for sub-byte depths, big-endian pairs for
    16-bit."""
    nrows, w, channels = samples.shape
    if depth == 8:
        return samples.reshape(nrows, w * channels).astype(np.int64)
    if depth == 16:
        flat = samples.reshape(nrows, w * channels)
        out = np.empty((nrows, 2 * w * channels), dtype=np.int64)
        out[:, 0::2] = flat >> 8
        out[:, 1::2] = flat & 0xFF
        return out
    per_byte = 8 // depth
    padded_w = -(-w // per_byte) * per_byte
    vals = np.zeros((nrows, padded_w), dtype=np.int64)
    vals[:, :w] = samples.reshape(nrows, w)
    shifts = np.arange(per_byte - 1, -1, -1) * depth
    return (vals.reshape(nrows, -1, per_byte) << shifts[None, None, :]).sum(
        axis=2
    )


def _png_encode_ex(
    samples: np.ndarray,
    ctype: int,
    depth: int,
    interlace: int = 0,
    palette: np.ndarray | None = None,
    trns: bytes | None = None,
) -> bytes:
    """General PNG writer for the r12 decode envelope: any legal
    (color type, bit depth) pair, optional Adam7 interlace (each pass
    filtered independently, empty passes emit nothing), PLTE/tRNS for
    palette images. ``samples`` are UNSCALED integer samples shaped
    (h, w[, channels]); filter type cycles y % 5 within every pass."""
    import struct
    import zlib as _z

    if depth not in _PNG_DEPTHS.get(ctype, ()):
        raise ValueError(f"illegal (ctype {ctype}, depth {depth})")
    channels = _PNG_CHANNELS[ctype]
    if samples.ndim == 2:
        samples = samples[:, :, None]
    h, w, nc = samples.shape
    if nc != channels:
        raise ValueError(f"ctype {ctype} needs {channels} channels, got {nc}")
    bpp = max(1, channels * depth // 8)
    if interlace == 0:
        passes = [(0, 0, 1, 1)]
    else:
        passes = [(x0, y0, dx, dy) for x0, y0, dx, dy in _ADAM7]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = samples[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        raw += _png_filter_rows(_png_pack_rows(sub.astype(np.int64), depth), bpp)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG needs a palette")
        out += _png_chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    if trns is not None:
        out += _png_chunk(b"tRNS", trns)
    return (
        out
        + _png_chunk(b"IDAT", _z.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


# PNG color types: ctype -> samples per pixel (spec 11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# legal (ctype, depth) combinations (spec table 11.1)
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}
# Adam7 pass origins/strides (spec 8.2): (x0, y0, dx, dy)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, nrows: int, rowbytes: int, bpp: int) -> np.ndarray:
    """Invert the five PNG scanline filters (per BYTE, left neighbor
    ``bpp`` back — spec 9.2) over one filtered sub-image; returns
    (nrows, rowbytes) int64. None/Up are element-wise; Sub is bpp
    interleaved running sums; Average and Paeth depend on the
    just-computed left pixel → plain-int Python loop for those only."""
    stride = rowbytes + 1
    out = np.zeros((nrows, rowbytes), dtype=np.int64)
    prev = np.zeros(rowbytes, dtype=np.int64)
    for y in range(nrows):
        line = raw[y * stride : (y + 1) * stride]
        f = line[0]
        data = np.frombuffer(line[1:], dtype=np.uint8).astype(np.int64)
        if f == 0:
            cur = data
        elif f == 1:
            cur = np.cumsum(data.reshape(-1, bpp), axis=0).reshape(-1) % 256
        elif f == 2:
            cur = (data + prev) % 256
        elif f == 3:
            dl, pl, c_list = data.tolist(), prev.tolist(), []
            for x in range(rowbytes):
                a = c_list[x - bpp] if x >= bpp else 0
                c_list.append((dl[x] + (a + pl[x]) // 2) % 256)
            cur = np.array(c_list, dtype=np.int64)
        elif f == 4:
            dl, pl, c_list = data.tolist(), prev.tolist(), []
            for x in range(rowbytes):
                a = c_list[x - bpp] if x >= bpp else 0
                b = pl[x]
                c = pl[x - bpp] if x >= bpp else 0
                c_list.append((dl[x] + _paeth(a, b, c)) % 256)
            cur = np.array(c_list, dtype=np.int64)
        else:
            raise ValueError(f"bad filter type {f}")
        out[y] = cur
        prev = cur
    return out


def _png_unpack_samples(
    rows: np.ndarray, w: int, channels: int, depth: int
) -> np.ndarray:
    """Row bytes → (nrows, w, channels) integer samples: MSB-first bit
    unpacking for sub-byte depths, big-endian pairs for 16-bit."""
    nrows = len(rows)
    if depth == 8:
        return rows[:, : w * channels].reshape(nrows, w, channels)
    if depth == 16:
        b = rows[:, : 2 * w * channels]
        return (b[:, 0::2] * 256 + b[:, 1::2]).reshape(nrows, w, channels)
    # depths 1/2/4: channels is always 1 (gray or palette indices)
    per_byte = 8 // depth
    u8 = rows.astype(np.uint8)
    shifts = np.arange(per_byte - 1, -1, -1) * depth
    bits = (u8[:, :, None] >> shifts[None, None, :]) & ((1 << depth) - 1)
    return bits.reshape(nrows, -1)[:, :w].reshape(nrows, w, 1).astype(np.int64)


def _png_decode(payload: bytes) -> np.ndarray:
    """Parse PNG bytes back to pixels across the full common envelope
    (r12 — real corpora are not just gray8/rgb8): grayscale at depths
    1/2/4/8/16, truecolor 8/16, palette 1/2/4/8 (PLTE expansion, tRNS
    → RGBA), gray+alpha and RGBA at 8/16, and Adam7 INTERLACED images
    (7 independently-filtered passes reassembled on the pixel lattice).
    Returns (h, w) for grayscale, (h, w, 2) gray+alpha, (h, w, 3) RGB
    / palette, (h, w, 4) RGBA / palette+tRNS — uint8, except 16-bit
    depths → uint16 (samples are NOT rescaled; sub-byte grays scale by
    the exact 255/(2^d−1) integer factor). Validates signature, chunk
    CRCs, IHDR legality (spec table 11.1), inflate size (bomb guard),
    and per-pass size consistency; a tRNS on color types 0/2 (single
    transparent color) is parsed and ignored — pixels stay exact.
    Everything else refuses explicitly."""
    import struct
    import zlib as _z

    if bytes(payload[:8]) != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, saw_ihdr = 8, bytearray(), False
    w = ihdr_h = depth = ctype = interlace = 0
    plte: bytes | None = None
    trns: bytes | None = None
    while pos < len(payload):
        # refuse-don't-misparse: every truncation must surface as a
        # clean ValueError, never a struct/zlib internal (r8 media fuzz)
        if pos + 12 > len(payload):
            raise ValueError("truncated PNG: incomplete chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        if pos + 12 + length > len(payload):
            raise ValueError("truncated PNG: chunk body exceeds payload")
        tag = bytes(payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if _z.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            if length < 13:
                raise ValueError("truncated PNG: short IHDR")
            w, ihdr_h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
            saw_ihdr = True
            if ctype not in _PNG_CHANNELS:
                raise ValueError(f"illegal PNG color type {ctype}")
            if depth not in _PNG_DEPTHS[ctype]:
                raise ValueError(
                    f"illegal PNG bit depth {depth} for color type {ctype}"
                )
            if comp != 0 or filt != 0:
                raise ValueError("illegal PNG compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"illegal PNG interlace method {interlace}")
            if w == 0 or ihdr_h == 0:
                raise ValueError("zero-dimension PNG refused")
            # hard pixel-count cap: the inflate guard below bounds
            # output at the IHDR-declared size, so a forged IHDR
            # declaring e.g. 2^31×2^31 would otherwise still license
            # a huge allocation. Per-row batch media at this layer is
            # bounded well under this.
            if w * ihdr_h > 1 << 26:
                raise ValueError(
                    f"PNG dimensions {w}x{ihdr_h} exceed decode cap"
                )
        elif tag == b"PLTE":
            if length % 3 or length == 0 or length > 768:
                raise ValueError("illegal PLTE chunk length")
            plte = bytes(body)
        elif tag == b"tRNS":
            trns = bytes(body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if not saw_ihdr:
        raise ValueError("truncated PNG: no IHDR chunk")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG without PLTE chunk")
    channels = _PNG_CHANNELS[ctype]

    def _rowbytes(width: int) -> int:
        return -(-width * channels * depth // 8)

    # pass geometry: one full-frame pass, or the 7 Adam7 sub-images
    if interlace == 0:
        passes = [(0, 0, 1, 1, w, ihdr_h)]
    else:
        passes = []
        for x0, y0, dx, dy in _ADAM7:
            pw = max(0, -(-(w - x0) // dx))
            ph = max(0, -(-(ihdr_h - y0) // dy))
            passes.append((x0, y0, dx, dy, pw, ph))
    expected = sum(
        ph * (1 + _rowbytes(pw)) for *_xy, pw, ph in passes if pw and ph
    )
    # decompression-bomb guard (r8 ADVICE): cap inflate output at the
    # IHDR-declared size + 1 BEFORE the consistency check — a small
    # CRC-valid payload declaring huge dimensions must refuse, not
    # inflate unbounded. The +1 byte distinguishes "exactly expected"
    # from "stream continues past expected" (refused below either way:
    # the != check fails on the overshoot byte).
    try:
        dec = _z.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
    except _z.error as e:
        raise ValueError(f"corrupt or truncated PNG IDAT stream: {e}") from None
    if dec.unconsumed_tail or len(raw) != expected:
        raise ValueError(
            f"PNG pixel data inconsistent with IHDR: {len(raw)} bytes "
            f"for {expected} expected"
        )
    bpp = max(1, channels * depth // 8)
    img = np.zeros((ihdr_h, w, channels), dtype=np.int64)
    off = 0
    for x0, y0, dx, dy, pw, ph in passes:
        if pw == 0 or ph == 0:
            continue
        rb = _rowbytes(pw)
        chunk = raw[off : off + ph * (rb + 1)]
        off += ph * (rb + 1)
        rows = _png_unfilter(chunk, ph, rb, bpp)
        samples = _png_unpack_samples(rows, pw, channels, depth)
        img[y0::dy, x0::dx] = samples
    if ctype == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = img[:, :, 0]
        if int(idx.max()) >= len(pal):
            raise ValueError("palette index out of PLTE range")
        rgb = pal[idx]
        if trns is not None:
            alpha = np.full(len(pal), 255, dtype=np.uint8)
            alpha[: min(len(trns), len(pal))] = np.frombuffer(
                trns[: len(pal)], dtype=np.uint8
            )
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if ctype == 0 and depth < 8:
        # exact integer rescale: 255/(2^d−1) is 255, 85, or 17
        img = img * (255 // ((1 << depth) - 1))
    out_dtype = np.uint16 if depth == 16 else np.uint8
    arr = img.astype(out_dtype)
    return arr[:, :, 0] if channels == 1 else arr


def _synth_pixels(key: int) -> np.ndarray:
    """Closed-form deterministic pixels for key-derived test images:
    w = 8 + key%9, h = 8 + key%7, p(y,x) = (key*31 + y*17 + x*7) % 256.
    Pure integer math so a SQL oracle can recompute the expected decode
    output without ever seeing the bytes."""
    w, h = 8 + key % 9, 8 + key % 7
    y, x = np.mgrid[0:h, 0:w]
    return ((key * 31 + y * 17 + x * 7) % 256).astype(np.uint8)


def synth_png_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL grayscale PNG payload per row (stdlib zlib/struct
    encoder, :func:`_png_encode`): genuine signature/IHDR/IDAT/IEND
    bytes with CRCs that any PNG decoder accepts. The image-pipeline
    fixture — testdata ships no images, so pixels come from the
    :func:`_synth_pixels` closed form."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            return {
                "payload": _png_encode(_synth_pixels(key)),
                "mime": "image/png",
                "meta": {"origin": "synth"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    # fan out BELOW the synth encoder (r15 opt): a 1-split local
    # parquet would serialize the per-row encode on one task
    return _fanned(df).mapInPandas(run, out_schema)


def _synth_pixels_color(key: int) -> np.ndarray:
    """Closed-form deterministic RGB pixels: same dims as
    :func:`_synth_pixels` (w = 8 + key%9, h = 8 + key%7),
    p(y, x, ch) = (key*31 + y*17 + x*7 + ch*11) % 256 — pure integer
    math a SQL oracle replays without seeing the bytes."""
    w, h = 8 + key % 9, 8 + key % 7
    y, x, ch = np.mgrid[0:h, 0:w, 0:3]
    return ((key * 31 + y * 17 + x * 7 + ch * 11) % 256).astype(np.uint8)


def synth_png_color_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL truecolor-8 (RGB) PNG payload per row — the color
    twin of :func:`synth_png_media` (r8): same genuine chunk/CRC/filter
    structure, 3 bytes per pixel, pixels from the
    :func:`_synth_pixels_color` closed form."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            return {
                "payload": _png_encode(_synth_pixels_color(key)),
                "mime": "image/png",
                "meta": {"origin": "synth", "channels": "3"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    # fan out BELOW the synth encoder (r15 opt): a 1-split local
    # parquet would serialize the per-row encode on one task
    return _fanned(df).mapInPandas(run, out_schema)


def synth_jpeg_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL grayscale baseline-JPEG payload per row
    (:func:`.jpeg.jpeg_encode_blocks` — genuine JFIF any baseline
    decoder accepts). Pixels follow the :func:`.jpeg.synth_block_values`
    closed form: DC-only 8×8 blocks, so block b of image ``key`` decodes
    to the constant (key*31 + b*17) % 256 exactly. Every third row
    (key % 3 ∈ {1, 2}) encodes with that restart interval (DRI/RSTn,
    r12) — the pixels are unchanged, so the same closed-form oracle now
    exercises the restart path end-to-end."""
    from .jpeg import jpeg_encode_blocks, synth_block_values

    out_schema = T.StructType(df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            dcs, bx, w, h = synth_block_values(key)
            return {
                "payload": jpeg_encode_blocks(
                    dcs, bx, w, h, restart_interval=key % 3
                ),
                "mime": "image/jpeg",
                "meta": {"origin": "synth"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    # fan out BELOW the synth encoder (r15 opt): a 1-split local
    # parquet would serialize the per-row encode on one task
    return _fanned(df).mapInPandas(run, out_schema)


def synth_jpeg_color_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL 3-component 4:4:4 baseline-JPEG payload per row
    (:func:`.jpeg.jpeg_encode_blocks_color`). Samples follow the
    :func:`.jpeg.synth_color_block_values` closed form, so the decoded
    RGB is replayable in SQL (floor(x+0.5) conversion, clamp)."""
    from .jpeg import jpeg_encode_blocks_color, synth_color_block_values

    out_schema = T.StructType(df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            dc_y, dc_cb, dc_cr, bx, w, h = synth_color_block_values(key)
            return {
                "payload": jpeg_encode_blocks_color(dc_y, dc_cb, dc_cr, bx, w, h),
                "mime": "image/jpeg",
                "meta": {"origin": "synth-color"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    # fan out BELOW the synth encoder (r15 opt): a 1-split local
    # parquet would serialize the per-row encode on one task
    return _fanned(df).mapInPandas(run, out_schema)


def synth_jpeg_420_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL 3-component 4:2:0 baseline-JPEG payload per row
    (:func:`.jpeg.jpeg_encode_blocks_420` — Y sampled 2×2, chroma 1×1,
    the subsampling most real-world JPEGs use). Samples follow the
    :func:`.jpeg.synth_420_block_values` closed form, so the decoded
    RGB (replication chroma upsample + floor(x+0.5) conversion) is
    replayable in SQL. Every third row (key % 3 ∈ {1, 2}) encodes with
    that restart interval (DRI/RSTn, r12) — same pixels, so the oracle
    also covers restarts in the interleaved-MCU scan."""
    from .jpeg import jpeg_encode_blocks_420, synth_420_block_values

    out_schema = T.StructType(df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            dc_y, dc_cb, dc_cr, mx, w, h = synth_420_block_values(key)
            return {
                "payload": jpeg_encode_blocks_420(
                    dc_y, dc_cb, dc_cr, mx, w, h, restart_interval=key % 3
                ),
                "mime": "image/jpeg",
                "meta": {"origin": "synth-420"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    # fan out BELOW the synth encoder (r15 opt): a 1-split local
    # parquet would serialize the per-row encode on one task
    return _fanned(df).mapInPandas(run, out_schema)


def _synth_samples(key: int, n: int) -> "np.ndarray":
    """Closed-form deterministic PCM16 samples for key-derived test
    audio: s_i = ((key*7919 + i*104729) mod 65536) - 32768. Pure
    integer math so a SQL oracle can recompute the expected decode
    features without ever seeing the bytes."""
    i = np.arange(n, dtype=np.int64)
    return ((key * 7919 + i * 104729) % 65536 - 32768).astype(np.int16)


def synth_wav_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL mono PCM16 WAV payload per row (stdlib ``wave``
    writer): 8 kHz, 256 + key%256 frames of :func:`_synth_samples`.
    The audio-pipeline fixture — testdata ships no audio, so the
    payload is synthesized, but the bytes are genuine RIFF/WAVE that
    any decoder accepts."""
    import io
    import wave

    out_schema = T.StructType(df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            n = 256 + key % 256
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(_synth_samples(key, n).tobytes())
            return {
                "payload": buf.getvalue(),
                "mime": "audio/wav",
                "meta": {"origin": "synth"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    # fan out BELOW the synth encoder (r15 opt): a 1-split local
    # parquet would serialize the per-row encode on one task
    return _fanned(df).mapInPandas(run, out_schema)


_WAV_FMT_PCM, _WAV_FMT_FLOAT, _WAV_FMT_EXT = 1, 3, 0xFFFE
_WAV_FMT_ALAW, _WAV_FMT_MULAW = 6, 7
_WAV_FMT_NAMES = {
    (1, 8): "pcm8", (1, 16): "pcm16", (1, 24): "pcm24", (1, 32): "pcm32",
    (3, 32): "float32", (3, 64): "float64",
    (6, 8): "alaw", (7, 8): "ulaw",
}


def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """G.711 codeword → 16-bit-aligned linear PCM, built from the
    ITU-T G.711 segment formulas (Tables 1a/2a — derived, not copied):

    µ-law: codewords transmit COMPLEMENTED; with c = ~b, segment
    e = (c>>4)&7, mantissa m = c&15, the 14-bit magnitude is
    (2m+33)·2^e − 33, i.e. 16-bit-aligned ((m<<3)+0x84)<<e − 0x84;
    sign bit set (c&0x80) means negative. Both zero codes (0xFF/0x7F)
    decode to 0.

    A-law: codewords transmit XOR 0x55; with c = b^0x55, segment
    s = (c>>4)&7, mantissa m = c&15, the 13-bit magnitude is
    (2m+1)·2^max(s,1) ... folded to the 16-bit-aligned closed form
    seg 0: (m<<4)+8; seg ≥ 1: ((m<<4)+0x108)<<(s−1). Sign bit SET
    means positive (A-law's inverted sign convention).
    """
    c = (~np.arange(256)) & 0xFF
    t = (((c & 15) << 3) + 0x84) << ((c >> 4) & 7)
    ulaw = np.where(c & 0x80, 0x84 - t, t - 0x84).astype(np.int64)

    c = np.arange(256) ^ 0x55
    seg = (c >> 4) & 7
    t16 = (c & 15) << 4
    mag = np.where(
        seg == 0,
        t16 + 8,
        (t16 + 0x108) << np.maximum(seg - 1, 0),
    )
    alaw = np.where(c & 0x80, mag, -mag).astype(np.int64)
    return ulaw, alaw


_ULAW_TABLE, _ALAW_TABLE = _g711_tables()


def _wav_parse(payload: bytes):
    """From-spec RIFF/WAVE parser (r12 — replaces the stdlib ``wave``
    reader so the audio envelope covers what real corpora carry):
    PCM 8 (unsigned, centered by −128) / 16 / 24 (3-byte LE two's
    complement) / 32 and IEEE float 32/64, including
    WAVE_FORMAT_EXTENSIBLE wrappers (the SubFormat GUID's leading tag
    word selects the real format). Chunks walk word-aligned; unknown
    chunks skip. Returns (fmt_name, rate, nch, n_frames, samples) with
    samples int64 for PCM (exact) and float64 for float formats.
    G.711 µ-law/A-law (tags 7/6, the telephony-corpus formats) decode
    via the from-spec segment tables in :func:`_g711_tables` to
    16-bit-aligned int64 linears. Remaining compressed format tags
    (MP3, ADPCM, …) refuse as NotImplementedError; structural damage
    as ValueError."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE header)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated WAV: {tag!r} chunk body exceeds payload")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("truncated WAV: short fmt chunk")
            afmt, nch, rate, _br, balign, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if afmt == _WAV_FMT_EXT:
                if size < 26:
                    raise ValueError(
                        "truncated WAV: short WAVE_FORMAT_EXTENSIBLE fmt"
                    )
                (afmt,) = struct.unpack("<H", body[24:26])
            fmt = (afmt, nch, rate, balign, bits)
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("not a decodable WAV payload: no fmt chunk")
    if data is None:
        raise ValueError("not a decodable WAV payload: no data chunk")
    afmt, nch, rate, balign, bits = fmt
    if nch < 1:
        raise ValueError("not a decodable WAV payload: zero channels")
    if (afmt, bits) not in _WAV_FMT_NAMES:
        if afmt in (_WAV_FMT_PCM, _WAV_FMT_FLOAT, _WAV_FMT_ALAW, _WAV_FMT_MULAW):
            raise ValueError(
                f"illegal WAV bit depth {bits} for format tag {afmt}"
            )
        raise NotImplementedError(
            f"compressed WAV format tag 0x{afmt:04X} not supported"
        )
    sw = bits // 8
    if balign != nch * sw:
        raise ValueError(
            f"WAV blockalign {balign} inconsistent with "
            f"{nch} channels x {sw} bytes"
        )
    if len(data) % balign:
        raise ValueError("truncated WAV: data is not a whole number of frames")
    n = len(data) // balign
    if afmt in (_WAV_FMT_MULAW, _WAV_FMT_ALAW):
        table = _ULAW_TABLE if afmt == _WAV_FMT_MULAW else _ALAW_TABLE
        s = table[np.frombuffer(data, dtype=np.uint8)]
    elif afmt == _WAV_FMT_FLOAT:
        s = np.frombuffer(data, dtype="<f4" if bits == 32 else "<f8").astype(
            np.float64
        )
    elif bits == 8:
        s = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    elif bits == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.int64)
    elif bits == 32:
        s = np.frombuffer(data, dtype="<i4").astype(np.int64)
    else:  # 24-bit: 3-byte little-endian two's complement
        u = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        v = u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)
        s = v - ((v >> 23) & 1) * (1 << 24)
    return _WAV_FMT_NAMES[(afmt, bits)], rate, nch, n, s


def decode_audio(df: DataFrame, media_col: str = "media") -> DataFrame:
    """REAL audio decode (from-spec RIFF parser, r12 — no external
    codec): parse the WAV header and samples across the full
    uncompressed envelope (PCM 8/16/24/32, IEEE float 32/64,
    WAVE_FORMAT_EXTENSIBLE), derive

    - ``fmt`` — the decoded sample format name (telemetry)
    - ``sample_rate``, ``n_channels``, ``n_samples`` (header/frames)
    - ``duration_ms`` = n_samples * 1000 / rate
    - ``rms`` = sqrt(mean(sample²)) over the decoded samples (PCM8
      centered by −128; PCM16 math identical to the pre-r12 path)

    Arrow-batched ``mapInPandas``; rounding is left to the caller's
    JVM-side ``F.round`` (numpy rounds half-even, Spark/DuckDB
    half-up). PCM square-sums accumulate as exact Python ints (24/32-
    bit squares overflow int64), so the double math is reproducible
    against a SQL oracle; float formats accumulate float64."""
    from .similarity import ensure_parallelism

    df = ensure_parallelism(df)  # heavy Arrow pass: fan out when under-partitioned

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("fmt", T.StringType(), True),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_channels", T.IntegerType(), True),
            T.StructField("n_samples", T.IntegerType(), True),
            T.StructField("duration_ms", T.DoubleType(), True),
            T.StructField("rms", T.DoubleType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(m: dict) -> tuple:
            if m is None or m.get("payload") is None:
                raise ValueError(
                    "null media struct/payload: filter null rows out "
                    "before decode_audio"
                )
            fmt, rate, nch, n, s = _wav_parse(m["payload"])
            if rate <= 0:
                # a fmt chunk may declare rate 0; the duration division
                # below must refuse it cleanly, not ZeroDivisionError
                raise ValueError(f"not a decodable WAV payload: sample rate {rate}")
            if s.dtype == np.float64:
                sq = float((s * s).sum())
            elif int(np.abs(s).max(initial=0)) < (1 << 23):
                sq = int((s * s).sum())  # int64-safe for <= 24-bit audio
            else:
                sq = sum(int(x) * int(x) for x in s.tolist())
            rms = float(np.sqrt(sq / len(s))) if len(s) else 0.0
            return fmt, rate, nch, n, n * 1000.0 / rate, rms

        for pdf in batches:
            cols = pdf[media_col].map(one)
            yield pdf.assign(
                fmt=cols.map(lambda t: t[0]),
                sample_rate=cols.map(lambda t: t[1]),
                n_channels=cols.map(lambda t: t[2]),
                n_samples=cols.map(lambda t: t[3]),
                duration_ms=cols.map(lambda t: t[4]),
                rms=cols.map(lambda t: t[5]),
            )

    return df.mapInPandas(run, out_schema)


def resize_image(
    df: DataFrame,
    out_h: int,
    out_w: int,
    pixels_col: str = "pixels",
    h_col: str = "dec_height",
    w_col: str = "dec_width",
) -> DataFrame:
    """Nearest-neighbor resize of decoded pixel rows → (…, pixels,
    dec_height, dec_width replaced by the resized grid).

    REAL and dependency-free: out[y][x] = in[y*h//out_h][x*w//out_w] —
    pure integer index math (the standard nearest-neighbor with
    floor), so a SQL oracle can replay it exactly. Arrow-batched
    mapInPandas; map-only, no shuffle."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name not in (pixels_col, h_col, w_col)]
        + [
            T.StructField(pixels_col, T.ArrayType(T.IntegerType()), True),
            T.StructField(h_col, T.IntegerType(), True),
            T.StructField(w_col, T.IntegerType(), True),
        ]
    )
    ys = np.arange(out_h)
    xs = np.arange(out_w)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(row) -> list:
                h, w = row[h_col], row[w_col]
                flat = np.asarray(row[pixels_col], dtype=np.int64)
                # channel count from the flat length: 1 (gray) or 3
                # (RGB — the r8 color decoders emit h*w*3 values);
                # rows resize per pixel, channels ride along
                nc, rem = divmod(len(flat), h * w)
                if rem != 0 or nc not in (1, 3):
                    raise ValueError(
                        f"pixel array of {len(flat)} values does not "
                        f"factor as {h}x{w} gray or RGB"
                    )
                px = flat.reshape(h, w, nc)
                return px[np.ix_(ys * h // out_h, xs * w // out_w)].ravel().tolist()

            resized = pdf.apply(one, axis=1)
            out = pdf.drop(columns=[pixels_col, h_col, w_col])
            yield out.assign(**{pixels_col: resized, h_col: out_h, w_col: out_w})

    return df.mapInPandas(run, out_schema)


def media_features(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Cheap metadata-level features — pure expressions, payload never
    leaves the JVM: byte size, mime class, payload md5."""
    m = F.col(media_col)
    return df.select(
        "*",
        F.length(m.getField("payload")).alias("n_bytes"),
        F.split_part(m.getField("mime"), F.lit("/"), F.lit(1)).alias("media_class"),
        F.md5(m.getField("payload")).alias("payload_md5"),
    )


def synth_avi_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Attach a REAL MJPEG AVI payload per row (:mod:`.video` RIFF
    writer over :func:`.jpeg.jpeg_encode_blocks` frames). Closed form:
    video ``key`` has 2 + key%3 frames of the key's block geometry;
    frame f, block b decodes to the constant pixel
    (key*31 + f*19 + b*17) % 256 — SQL-replayable end to end."""
    from .jpeg import jpeg_encode_blocks
    from .video import AVI_MIME, avi_encode_mjpeg

    out_schema = T.StructType(df.schema.fields + [T.StructField("media", MEDIA_SCHEMA, True)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(key: int) -> dict:
            bx, by = 1 + key % 3, 1 + key % 2
            w, h = bx * 8, by * 8
            frames = []
            for f in range(2 + key % 3):
                dcs = [((key * 31 + f * 19 + b * 17) % 256) - 128 for b in range(bx * by)]
                frames.append(jpeg_encode_blocks(dcs, bx, w, h))
            return {
                "payload": avi_encode_mjpeg(frames, w, h),
                "mime": AVI_MIME,
                "meta": {"origin": "synth-video"},
            }

        for pdf in batches:
            yield pdf.assign(media=pdf[key_col].map(one))

    # fan out BELOW the synth encoder (r15 opt): a 1-split local
    # parquet would serialize the per-row encode on one task
    return _fanned(df).mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame,
    media_col: str = "media",
    n_frames: int | None = 4,
    every: int = 1,
    fake: bool = False,
) -> DataFrame:
    """Video → sampled decoded frames (one row per sampled frame).

    ``every`` must be >= 1 (0 was an opaque range() error inside the
    executor; a negative stride silently sampled nothing).

    REAL for MJPEG AVI (``video/x-msvideo``) and animated GIF
    (``image/gif``, r12): the container walk (RIFF chunks / GIF
    sub-blocks) finds the per-frame payloads and only every
    ``every``-th frame is entropy-decoded (JPEG Huffman / GIF LZW) —
    skipped frames cost nothing beyond the walk, which is the point of
    frame sampling at corpus scale. ``n_frames`` caps the number of SAMPLED
    frames per video on both paths (``None`` = no cap); the fake stub
    emits exactly ``n_frames`` rows. Output rows carry (frame_idx,
    pixels, dec_height, dec_width). A null media struct or payload
    raises a clear error instead of a TypeError deep in the decoder.
    Inter-frame codecs (H.26x/VP9/AV1) still raise — not
    implementable from scratch; ``fake=True`` keeps the deterministic
    stub (frame_idx + md5) for them."""
    from .similarity import ensure_parallelism

    df = ensure_parallelism(df)  # heavy Arrow pass: fan out when under-partitioned

    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")
    if fake:
        out_schema = T.StructType(
            df.schema.fields
            + [T.StructField("frame_idx", T.IntegerType(), True),
               T.StructField("frame_md5", T.StringType(), True)]
        )

        def run_fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for _, row in pdf.iterrows():
                    m = row[media_col]
                    payload = (m["payload"] if m is not None else None) or b""
                    for i in range(n_frames if n_frames is not None else 4):
                        r = dict(row)
                        r["frame_idx"] = i
                        r["frame_md5"] = hashlib.md5(payload + i.to_bytes(4, "big")).hexdigest()
                        rows.append(r)
                yield pd.DataFrame(rows, columns=[*pdf.columns, "frame_idx", "frame_md5"])

        return df.mapInPandas(run_fake, out_schema)

    from .jpeg import jpeg_decode
    from .video import AVI_MIME, avi_decode_frames

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("frame_idx", T.IntegerType(), True),
            T.StructField("pixels", T.ArrayType(T.IntegerType()), True),
            T.StructField("dec_height", T.IntegerType(), True),
            T.StructField("dec_width", T.IntegerType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                m = row[media_col]
                if m is None or m.get("payload") is None:
                    raise ValueError(
                        f"null media struct/payload in column {media_col!r}: "
                        "filter null rows out (or fill a payload) before frame_sample"
                    )
                if m["mime"] == AVI_MIME:
                    frames = avi_decode_frames(m["payload"])

                    def dec_ith(i, _f=frames):
                        return jpeg_decode(_f[i])

                elif m["mime"] == "image/gif":
                    from .gif import (
                        _decode_frame,
                        _full_canvas,
                        _iter_composited,
                        _parse,
                    )

                    sw, sh, gframes = _parse(m["payload"])
                    frames = gframes
                    if _full_canvas(sw, sh, gframes):
                        # legacy sparse path: only sampled frames pay
                        # for LZW; skipped frames cost just the walk
                        def dec_ith(i, _sw=sw, _sh=sh, _f=gframes):
                            return _decode_frame(_sw, _sh, _f[i])

                    else:
                        # delta frames (r13): composition is a chain —
                        # prior frames must decode regardless, so walk
                        # the compositor once, copying ONLY sampled
                        # canvases (sampled indices ascend by
                        # construction of range())
                        comp = {"it": _iter_composited(sw, sh, gframes), "next": 0}

                        def dec_ith(i, _c=comp):
                            canvas = None
                            while _c["next"] <= i:
                                canvas = next(_c["it"])
                                _c["next"] += 1
                            assert canvas is not None, "sampling must ascend"
                            return canvas.copy()

                elif m["mime"] == "image/webp":
                    # r15: animated WebP (ANMF + VP8L frames). Like the
                    # GIF delta path, blend/dispose composition is a
                    # chain — walk the compositor once, copying ONLY
                    # sampled canvases; a still container is one frame
                    from .webp import (
                        _iter_webp_composited,
                        webp_decode,
                        webp_frame_count,
                    )

                    n_total = webp_frame_count(m["payload"])
                    frames = range(n_total)
                    if n_total <= 1:
                        def dec_ith(i, _p=m["payload"]):
                            return webp_decode(_p)

                    else:
                        comp = {
                            "it": _iter_webp_composited(m["payload"]),
                            "next": 0,
                        }

                        def dec_ith(i, _c=comp):
                            canvas = None
                            while _c["next"] <= i:
                                canvas = next(_c["it"])
                                _c["next"] += 1
                            assert canvas is not None, "sampling must ascend"
                            return canvas.copy()

                elif m["mime"] == "image/tiff":
                    # r15: multi-page TIFF (fax/scan corpora) — pages
                    # are independent IFDs, so sampling is truly
                    # sparse: the IFD walk is cheap, skipped pages
                    # never decode
                    from .tiff import _decode_page, _read_ifds

                    _payload = bytes(m["payload"])
                    frames = _read_ifds(_payload)

                    def dec_ith(i, _b=_payload, _t=frames):
                        return _decode_page(_b, _t[i])

                else:
                    raise NotImplementedError(
                        f"no video codec for {m['mime']!r} (MJPEG AVI, "
                        "animated GIF, animated WebP, or multi-page "
                        "TIFF); use fake=True for the stub sampler"
                    )
                sampled = range(0, len(frames), every)
                if n_frames is not None:
                    sampled = list(sampled)[:n_frames]
                for idx in sampled:
                    pix = dec_ith(idx)
                    r = dict(row)
                    r["frame_idx"] = idx
                    r["pixels"] = pix.ravel().astype(np.int64).tolist()
                    r["dec_height"] = pix.shape[0]
                    r["dec_width"] = pix.shape[1]
                    rows.append(r)
            yield pd.DataFrame(
                rows,
                columns=[*pdf.columns, "frame_idx", "pixels", "dec_height", "dec_width"],
            )

    return df.mapInPandas(run, out_schema)
