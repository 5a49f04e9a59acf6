"""Sinks (reference ``src/sinks.rs`` + the file/memory surface it lacks).

- ``stdout``: one UTF-8 line per message in (batch_id, msg_idx) order
  (reference ``src/sinks.rs:17-21``). Batch mode prints on the driver;
  streaming mode uses the console sink.
- ``file``: parquet/csv/json/text writer with partitioning — the
  durable sink the reference lacks (SURVEY §2.4).
- ``memory``: streaming test sink (named in-memory table).
- ``kafka``: registered in ``sources.kafka`` (same module as its source,
  mirroring the reference's file layout).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame

from ..registry import register_sink


# Bounded by default: ``toLocalIterator`` streams rather than
# collecting, but an unbounded batch print of a 100 TB frame is still a
# driver firehose. The default cap mirrors the console sink's numRows
# convention (scaled for CLI use); ``limit: null`` in the spec (or
# ``limit=None``) opts out explicitly for unix-filter-style pipes, and
# a hit cap says so on stderr — never a silent truncation.
_DEFAULT_STDOUT_LIMIT = 1000


@register_sink("stdout")
def stdout_sink(df: DataFrame, limit: int | None = ..., file=None):
    if df.isStreaming:
        return df.writeStream.format("console").option("truncate", "false").start()
    defaulted = limit is ...
    if defaulted:
        limit = _DEFAULT_STDOUT_LIMIT
    out = file or sys.stdout
    cols = set(df.columns)
    if {"batch_id", "msg_idx", "value"} <= cols:
        df = df.orderBy("batch_id", "msg_idx").select("value")
    elif "value" not in cols:
        # relational frame: render rows as pipe-joined lines
        from pyspark.sql import functions as F

        df = df.select(F.concat_ws("|", *[F.col(c).cast("string") for c in df.columns]).alias("value"))
    else:
        df = df.select("value")
    it = df.toLocalIterator()
    n = 0
    for row in it:
        print(row.value, file=out)
        n += 1
        if limit is not None and n >= limit:
            if defaulted and next(iter(it), None) is not None:
                print(
                    f"nekton_spark: stdout sink stopped at the default "
                    f"limit of {limit} rows; set 'limit: null' to print all",
                    file=sys.stderr,
                )
            break
    return None


@register_sink("file")
def file_sink(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    checkpoint: str | None = None,
    layout: str | None = None,
    layout_cols: list[str] | None = None,
    layout_files: int = 8,
    **options,
):
    """``layout: morton|hilbert`` + ``layout_cols: [a, b, ...]``
    re-clusters the batch write on the space-filling-curve key
    (functions/layout.py) so parquet row-group min/max stats prune
    box predicates — the write-side of the measured 25-vs-128-of-256
    pruning win. Morton takes 2+ columns (z_value_n for k > 2);
    Hilbert is 2-D only. Batch only (a streaming micro-batch is too
    small to re-cluster globally; refuse rather than silently
    ignore)."""
    if layout is not None:
        if df.isStreaming:
            raise ValueError("layout re-clustering is batch-only")
        if format != "parquet":
            raise ValueError("layout re-clustering requires format=parquet")
        if partition_by:
            raise ValueError(
                "layout re-clustering and partition_by are mutually "
                "exclusive: the curve writers own the file split "
                "(refuse rather than silently ignore)"
            )
        if options:
            raise ValueError(
                "layout re-clustering does not thread writer options "
                f"({sorted(options)}); drop them or drop layout "
                "(refuse rather than silently ignore)"
            )
        from ..functions.layout import (
            hilbert_write,
            zorder_write,
            zorder_write_n,
        )

        if layout not in ("morton", "zorder", "hilbert"):
            raise ValueError(
                f"unknown layout {layout!r}: one of ['hilbert', 'morton', 'zorder']"
            )
        if not layout_cols or len(layout_cols) < 2:
            raise ValueError("layout needs layout_cols: [col_a, col_b, ...]")
        if layout == "hilbert" and len(layout_cols) != 2:
            # the derived-table Hilbert transform is 2-D; the N-column
            # curve path is Morton (z_value_n) — refuse rather than
            # silently truncate the column list
            raise ValueError(
                "hilbert layout is 2-D; use layout: morton for "
                f"{len(layout_cols)} columns"
            )
        if mode != "overwrite":
            raise ValueError("layout re-clustering writes mode=overwrite")
        if layout == "hilbert":
            hilbert_write(df, path, layout_cols[0], layout_cols[1],
                          n_files=layout_files)
        elif len(layout_cols) == 2:
            zorder_write(df, path, layout_cols[0], layout_cols[1],
                         n_files=layout_files)
        else:
            zorder_write_n(df, path, list(layout_cols),
                           n_files=layout_files)
        return None
    if df.isStreaming:
        writer = df.writeStream.format(format).option("path", path)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        for k, v in options.items():
            writer = writer.option(k, v)
        return writer.start()
    writer = df.write.format(format).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
    return None


@register_sink("ann_index")
def ann_index_sink(df: DataFrame, path: str, mode: str = "build", **kw):
    """Build and persist an IVF-PQ vector index from the frame's
    (vec_id, embedding) columns (similarity.ivfpq_index_build): the
    compressed codes relation plus centroids/codebooks/meta, all
    parquet. ``mode: append`` (r12) instead encodes the frame under
    the existing index's FROZEN quantizers and appends to its codes
    (similarity.ivfpq_index_append — drift-gated, id-collision
    checked). Query with the ``ann_index_query`` processor. Batch
    only."""
    if df.isStreaming:
        raise ValueError("ann_index build is batch-only")
    from ..functions.similarity import ivfpq_index_append, ivfpq_index_build

    if mode == "append":
        ivfpq_index_append(df, path, **kw)
    elif mode in ("build", "overwrite"):
        ivfpq_index_build(df, path, **kw)
    else:
        raise ValueError(f"unknown ann_index mode: {mode!r} (build|append)")
    return None


@register_sink("memory")
def memory_sink(df: DataFrame, name: str = "out"):
    if not df.isStreaming:
        df.createOrReplaceTempView(name)
        return None
    return df.writeStream.format("memory").queryName(name).outputMode("append").start()

from . import exactly_once  # noqa: F401, E402  (register type tag)


@register_sink("shards")
def shard_sink(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    target_rows: int | None = None,
    key_col: str = "doc_id",
    format: str = "parquet",
    mode: str = "overwrite",
    **options,
):
    """Deterministic training-shard writer: every row lands in shard
    ``pmod(hash60(key), n_shards)`` and rows inside a shard are sorted
    by key — so the shard LAYOUT (membership and order, hence bytes)
    is a pure function of the data, independent of input partitioning,
    task scheduling, or cluster size. That reproducibility is what a
    training pipeline needs to resume/diff/audit its shards across
    re-runs; Spark's default writer gives neither (file split = input
    partitioning, order = arrival).

    ``n_shards`` may be derived from ``target_rows`` via parquet-footer
    row counts (metadata only, no job — same trick as the LSH auto
    width). One shuffle on the shard key (uniform by construction);
    each shard value is one write task → exactly one file per shard
    under ``_shard=<k>/`` directories, and downstream readers prune on
    the shard column like any partition column.
    """
    from ..functions.hashing import hash60
    from pyspark.sql import functions as F

    if (n_shards is None) == (target_rows is None):
        raise ValueError("pass exactly one of n_shards / target_rows")
    if n_shards is None:
        from ..functions.similarity import _estimate_rows

        n_shards = max(1, -(-_estimate_rows(df) // target_rows))
    sharded = (
        df.withColumn("_shard", F.pmod(hash60(F.col(key_col)), F.lit(n_shards)))
        .repartition(n_shards, F.col("_shard"))
        .sortWithinPartitions("_shard", key_col)
    )
    writer = sharded.write.format(format).mode(mode).partitionBy("_shard")
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
    return None


@register_sink("webdataset")
def webdataset_sink(
    df: DataFrame,
    path: str,
    key_col: str = "sample_key",
    exts_col: str = "exts",
    n_shards: int = 32,
    gz: bool = False,
    max_shard_bytes: int = 1 << 30,
):
    """Write (sample_key, ext → bytes) rows as WebDataset tar shards —
    the format training loaders stream. Deterministic layout: sample →
    shard pmod(xxhash64(key), n_shards), key-ordered within the shard,
    one shuffle total. Cluster-grade: tasks write via pyarrow.fs
    (local / file:// / hdfs:// / s3://) with temp + rename commit; the
    max_shard_bytes guard refuses oversized shards with an n_shards
    sizing rule instead of OOMing (functions/webdataset.
    write_webdataset)."""
    from ..functions.webdataset import write_webdataset

    n = write_webdataset(
        df, path, key_col, exts_col, n_shards, gz, max_shard_bytes
    )
    print(f"webdataset: wrote {n} samples to {path}", file=sys.stderr)
