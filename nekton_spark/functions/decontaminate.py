"""Train/eval decontamination for LLM-data pipelines.

Standard practice before training: any training document sharing a
long-enough word n-gram with an evaluation document is contaminated
and must be flagged or dropped (the GPT-3/PaLM-style 8-13-gram
overlap rule). The reference has no analog (it has no joins at all —
SURVEY §2.4); this is a north-star §2.5-family operator.

100 TB shape: the eval set is always tiny relative to training data
(thousands of benchmark docs vs billions of training docs), so the
plan is

1. distinct (eval_id, shingle) — small; **broadcast**;
2. distinct (train_id, shingle) — map-only explode, no shuffle;
3. broadcast hash join on the shingle string, then partial-aggregated
   count per (train_id, eval_id).

The only shuffle is the final count aggregation over *matching* pairs
— contamination hits, not the corpus. Removal is a broadcast anti-join
of flagged train ids. No Python workers anywhere: shingling is the
same codegen expression the dedup family uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import ngrams


def _doc_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int, alias: str, fan_out: bool = False
) -> DataFrame:
    if fan_out:
        # small parquet inputs read as 1-2 splits; the explode+join
        # would run on one task (see similarity.ensure_parallelism —
        # no-op at real scale)
        from .similarity import ensure_parallelism

        df = ensure_parallelism(df)
    return (
        df.select(
            F.col(id_col).alias(alias),
            F.explode(F.array_distinct(ngrams(F.col(text_col), n))).alias("s"),
        )
    )


def contamination_pairs(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(train_id, eval_id, n_shared): distinct word n-grams shared by a
    train/eval document pair. Docs shorter than ``n`` tokens yield no
    shingles and cannot collide."""
    tr = _doc_shingles(train, id_col, text_col, n, "train_id", fan_out=True)
    ev = _doc_shingles(eval_df, id_col, text_col, n, "eval_id")
    return (
        tr.join(F.broadcast(ev), "s")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training rows with no (or < ``min_shared``) eval n-gram overlap —
    the write-side of the contamination check."""
    flagged = (
        contamination_pairs(train, eval_df, n, id_col, text_col)
        .filter(F.col("n_shared") >= min_shared)
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    return train.join(F.broadcast(flagged), id_col, "left_anti")
