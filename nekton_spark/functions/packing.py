"""Sequence packing for LLM training pipelines.

Training consumes fixed-length context windows, not documents: docs
are concatenated in a deterministic order and cut every ``budget``
tokens (GPT-style packing — documents may straddle window
boundaries). This operator computes, for every document, which
context window(s) it lands in and at what offset, so a downstream
writer can materialize shuffled-but-reproducible training shards.

100 TB shape: a single global concatenation order would serialize the
cumsum, so packing is *sharded*: docs are assigned to ``n_shards``
streams by a deterministic key hash, each shard concatenates
independently (one window cumsum per shard = one sort-shuffle,
embarrassingly parallel), and pack ids are globally unique via
``shard * 2^40 + window_index``. This is exactly how multi-worker
training data loaders pack in practice — per-worker streams, not one
global stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_analysis import token_count

PACK_STRIDE = 2**40


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "whitespace",
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """→ (id, shard, n_tokens, start_offset, pack_id, pack_pos, n_packs).

    - ``shard``: ``id % n_shards`` — deterministic, balanced for dense ids.
    - ``start_offset``: the doc's first-token position in its shard's
      concatenated stream (docs ordered by id within the shard).
    - ``pack_id``: globally-unique id of the context window containing
      the doc's first token (``shard * 2^40 + start_offset // budget``).
    - ``pack_pos``: offset of the doc's first token inside that window.
    - ``n_packs``: how many windows the doc spans (straddlers > 1).

    Zero-token docs occupy no space: they report the window they would
    start in and ``n_packs = 0``.

    ``tokenizer="bpe"`` (with a ``merges`` table, default
    ``bpe.STD_MERGES``) budgets in trained-BPE tokens instead of
    whitespace tokens — the real training-pipeline accounting; the
    count comes from one vocabulary-bounded ``bpe_encode`` pass
    (functions/bpe.py) joined by id, and the packing arithmetic is
    unchanged.
    """
    # fail fast: n_shards=0 would be a mid-job ANSI DIVIDE_BY_ZERO,
    # budget<=0 an Infinity offset whose long cast crashes (ANSI) or
    # corrupts pack ids (non-ANSI) — the chunk_documents guard pattern
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if tokenizer not in ("whitespace", "bpe"):
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    shard = (F.col(id_col) % n_shards).alias("shard")
    if tokenizer == "bpe":
        from .bpe import STD_MERGES, bpe_encode

        counts = bpe_encode(df, STD_MERGES if merges is None else merges,
                            text_col, id_col)
        base = counts.select(
            F.col(id_col).alias("id"),
            shard,
            F.col("n_bpe").cast("long").alias("n_tokens"),
        )
    else:
        base = df.select(
            F.col(id_col).alias("id"),
            shard,
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        )
    w = Window.partitionBy("shard").orderBy("id")
    cum = F.sum("n_tokens").over(w)
    with_start = base.withColumn("start_offset", cum - F.col("n_tokens"))
    return with_start.select(
        "id",
        "shard",
        "n_tokens",
        "start_offset",
        (F.col("shard") * F.lit(PACK_STRIDE) + F.floor(F.col("start_offset") / budget)).alias(
            "pack_id"
        ),
        (F.col("start_offset") % budget).alias("pack_pos"),
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / budget)
            - F.floor(F.col("start_offset") / budget)
            + 1
        )
        .alias("n_packs"),
    )
