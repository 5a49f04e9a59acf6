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
operators. Audio (WAV) decoding is REAL — stdlib ``wave`` needs no
external codec: :func:`decode_audio` parses PCM headers and samples
and derives sample-rate/duration/RMS features, verified bit-exactly
against a DuckDB oracle that recomputes them from the synthesis
closed form (:func:`synth_wav_media`). Image/video codec libraries
are not in this container, so those decode kernels are STUBS:
``decode_image`` raises ``NotImplementedError`` unless ``fake=True``,
in which case a deterministic fake decoder (payload-hash-derived
"pixels") exercises the full Spark plumbing — schema, batching,
partitioning — which *is* real and tested.
"""

from __future__ import annotations

import hashlib
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


def pack_media(payload_col, mime_col, meta_col=None):
    meta = meta_col if meta_col is not None else F.lit(None).cast("map<string,string>")
    return F.struct(
        payload_col.alias("payload"), mime_col.alias("mime"), meta.alias("meta")
    )


def media_from_text(df: DataFrame, text_col: str = "text", mime: str = "application/octet-stream") -> DataFrame:
    """Test/demo constructor: wrap a text column's bytes as media."""
    return df.withColumn(
        "media",
        pack_media(
            F.encode(F.col(text_col), "utf-8"),
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

    Real decoding needs an image codec library (not in this container):
    pass fake=True for the deterministic stub. The mapInPandas plumbing
    (Arrow batches of binary, flat pixel output) is identical for both.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "use fake=True for the deterministic stub decoder"
        )
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("pixels", T.ArrayType(T.IntegerType()), True),
            T.StructField("dec_height", T.IntegerType(), True),
            T.StructField("dec_width", T.IntegerType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = [
                _fake_decode(m["payload"], height, width).ravel().tolist()
                for m in pdf[media_col]
            ]
            yield pdf.assign(pixels=pixels, dec_height=height, dec_width=width)

    return df.mapInPandas(run, out_schema)


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

    return df.mapInPandas(run, out_schema)


def decode_audio(df: DataFrame, media_col: str = "media") -> DataFrame:
    """REAL audio decode (stdlib ``wave`` — no external codec): parse
    the WAV header and PCM16 samples, derive

    - ``sample_rate``, ``n_channels``, ``n_samples`` (header/frames)
    - ``duration_ms`` = n_samples * 1000 / rate
    - ``rms`` = sqrt(mean(sample²)) over int16 samples

    Arrow-batched ``mapInPandas``; rounding is left to the caller's
    JVM-side ``F.round`` (numpy rounds half-even, Spark/DuckDB
    half-up). Sample-square sums stay < 2^53, so the double math is
    exact and bit-reproducible against a SQL oracle."""
    import io
    import wave

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_channels", T.IntegerType(), True),
            T.StructField("n_samples", T.IntegerType(), True),
            T.StructField("duration_ms", T.DoubleType(), True),
            T.StructField("rms", T.DoubleType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(m: dict) -> tuple:
            with wave.open(io.BytesIO(m["payload"]), "rb") as w:
                rate, nch, n = w.getframerate(), w.getnchannels(), w.getnframes()
                raw = w.readframes(n)
            s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
            sq = int((s * s).sum())
            rms = float(np.sqrt(sq / len(s))) if len(s) else 0.0
            return rate, nch, n, n * 1000.0 / rate, rms

        for pdf in batches:
            cols = pdf[media_col].map(one)
            yield pdf.assign(
                sample_rate=cols.map(lambda t: t[0]),
                n_channels=cols.map(lambda t: t[1]),
                n_samples=cols.map(lambda t: t[2]),
                duration_ms=cols.map(lambda t: t[3]),
                rms=cols.map(lambda t: t[4]),
            )

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


def frame_sample(
    df: DataFrame,
    media_col: str = "media",
    n_frames: int = 4,
    fake: bool = False,
) -> DataFrame:
    """Video → sampled frames (one row per frame). Stubbed like decode."""
    if not fake:
        raise NotImplementedError(
            "video codecs are not available in this environment; use fake=True"
        )
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField("frame_idx", T.IntegerType(), True),
           T.StructField("frame_md5", T.StringType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = row[media_col]["payload"] or b""
                for i in range(n_frames):
                    r = dict(row)
                    r["frame_idx"] = i
                    r["frame_md5"] = hashlib.md5(payload + i.to_bytes(4, "big")).hexdigest()
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[*pdf.columns, "frame_idx", "frame_md5"])

    return df.mapInPandas(run, out_schema)
