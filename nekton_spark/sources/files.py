"""File sources — the connector surface the reference lacks (SURVEY §2.4).

``type: file`` reads text/parquet/csv/json, batch or streaming
(``stream: true`` → ``spark.readStream`` with the same options; file
streaming is also the test stand-in for the reference's stdin source
per SURVEY §2.1). ``type: table`` loads one of the driver's parquet
tables relationally (no message wrapping) for the relational layer.

Scale: these are plain DataSource V2 scans — column pruning, predicate
pushdown and partition pruning all apply; ``maxFilesPerTrigger``
bounds micro-batch size in streaming mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.messages import from_column
from ..registry import register_source


@register_source("file")
def file_source(
    spark: SparkSession,
    path: str,
    format: str = "text",
    stream: bool = False,
    schema: str | None = None,
    value_column: str = "value",
    as_messages: bool = True,
    **options,
) -> DataFrame:
    reader = spark.readStream if stream else spark.read
    reader = reader.format(format)
    if schema:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    # same NTZ→TIMESTAMP normalization as table_source: a parquet file
    # with naive-µs timestamps read through `type: file` must enter the
    # engine with the same column types as through `type: table`, or
    # every downstream timestamp consumer needs its own guard
    df = _normalize_ntz(reader.load(path))
    if not as_messages:
        return df
    # one message per batch in both modes — from_column handles the
    # streaming id assignment itself (xxhash64(uuid), messages.py)
    return from_column(df, value_column)


# columns stored as parquet TIMESTAMP(NANOS), which Spark reads as long
# under spark.sql.legacy.parquet.nanosAsLong; converted to TIMESTAMP here.
NS_TIMESTAMP_COLS: dict[str, list[str]] = {"events": ["ts"]}


def _convert_ns_cols(df: DataFrame, name: str) -> DataFrame:
    from pyspark.sql import types as T

    for c in NS_TIMESTAMP_COLS.get(name, []):
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            # integer division ns→us: int64 ns (~1.7e18) exceeds double's
            # 53-bit mantissa, so a float path would corrupt timestamps
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} DIV 1000")))
    return _normalize_ntz(df)


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Parquet naive ``timestamp[us]`` reads back as TIMESTAMP_NTZ under
    Spark 4's default ``inferTimestampNTZ``; the whole engine (watermarks,
    ``unix_micros``, interval joins) speaks TIMESTAMP. With the session tz
    pinned UTC the cast preserves wall-clock exactly, so DuckDB-oracle
    string comparisons are unchanged. Done once at the scan, not per
    operator — one projection, stays inside whole-stage codegen."""
    from pyspark.sql import types as T

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    if not ntz:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})


_MEDIA_MIME_BY_EXT = {
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "jfif": "image/jpeg",
    "gif": "image/gif",
    "bmp": "image/bmp",
    "webp": "image/webp",
    "tif": "image/tiff",
    "tiff": "image/tiff",
    "warc": "application/warc",
    "tar": "application/x-tar",
    "pdf": "application/pdf",
    "docx": (
        "application/vnd.openxmlformats-officedocument"
        ".wordprocessingml.document"
    ),
    "html": "text/html",
    "htm": "text/html",
    "txt": "text/plain",
    "wav": "audio/wav",
    "avi": "video/avi",
}

_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


@register_source("media_files")
def media_files_source(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    stream: bool = False,
    recursive: bool = False,
    mime: str | None = None,
    max_bytes: int | None = None,
    **options,
) -> DataFrame:
    """Ingest raw media FILES as media rows via Spark's ``binaryFile``
    source — the shape a real multimodal training pipeline uses to
    read an object-store image/audio dump: distributed listing + read
    (no driver-side file walk), partition sizing via
    ``spark.sql.files.maxPartitionBytes`` like any scan, and
    ``pathGlobFilter``/``recursiveFileLookup`` pushed to the listing.
    Each file becomes ``(doc_id, media)`` with doc_id =
    xxhash64(path) (stable across runs and cluster sizes — the same
    content-addressed convention the shard sink uses) and media =
    struct(payload = content, mime from the file extension (or the
    explicit ``mime`` override — unknown extensions ingest as
    application/octet-stream and REFUSE at decode time, where the
    refusal is reason-coded by decode_coverage), meta{path, length}).

    ``max_bytes`` filters oversized files AT THE LISTING via a pushed
    ``length`` predicate — the 100 TB guard against a stray multi-GB
    artifact entering an Arrow batch. ``stream=True`` uses readStream
    (Structured Streaming file-source semantics: each file processed
    exactly once; bound micro-batches with ``maxFilesPerTrigger``)."""
    reader = spark.readStream if stream else spark.read
    reader = reader.format("binaryFile")
    if stream:
        # file stream sources require an explicit schema; binaryFile's
        # is fixed by the format
        reader = reader.schema(_BINARY_FILE_SCHEMA)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= int(max_bytes))
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    mime_col = F.lit(mime) if mime is not None else F.coalesce(
        *[
            F.when(ext == e, F.lit(m))
            for e, m in _MEDIA_MIME_BY_EXT.items()
        ],
        F.lit("application/octet-stream"),
    )
    from ..functions.multimodal import pack_media

    return df.select(
        F.xxhash64("path").alias("doc_id"),
        pack_media(
            F.col("content"),
            mime_col,
            F.create_map(
                F.lit("path"), F.col("path"),
                F.lit("length"), F.col("length").cast("string"),
            ),
        ).alias("media"),
    )


@register_source("table")
def table_source(spark: SparkSession, path: str, name: str | None = None) -> DataFrame:
    full = f"{path}/{name}.parquet" if name else path
    tbl = name or path.rstrip("/").rsplit("/", 1)[-1].removesuffix(".parquet")
    if tbl in NS_TIMESTAMP_COLS:
        # runtime-settable SQL conf; needed even when the caller built the
        # session (the driver's harness does)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ→TZ cast semantics (and DuckDB-oracle parity) assume UTC even
    # when the caller built the session; runtime-settable, idempotent.
    # This DOES mutate session state for subsequent queries — warn
    # (once per process) if the caller had pinned something else, so
    # the override is never silent.
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        import warnings

        warnings.warn(
            "table_source pins spark.sql.session.timeZone=UTC for "
            "timestamp parity with the parquet tables' naive-UTC "
            "wall-clocks; the previous session timezone is overridden",
            stacklevel=2,
        )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _convert_ns_cols(spark.read.parquet(full), tbl)


@register_source("sql_view")
def sql_view_source(spark: SparkSession, name: str) -> DataFrame:
    """An existing temp view / catalog table as a pipeline input."""
    return spark.table(name)


@register_source("sql")
def sql_source(spark: SparkSession, query: str) -> DataFrame:
    """Arbitrary SQL as a pipeline input."""
    return spark.sql(query)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load the driver's star schema and register temp views."""
    names = names or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    out = {}
    for n in names:
        df = _convert_ns_cols(spark.read.parquet(f"{sf_dir}/{n}.parquet"), n)
        df.createOrReplaceTempView(n)
        out[n] = df
    return out
