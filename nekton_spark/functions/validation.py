"""Data-quality validation — the Deequ/dbt-tests niche, one job wide.

Training-data ingest needs constraint checks (null fractions, key
uniqueness, value ranges, referential integrity) as a gate before
compute is spent downstream. The design constraint at 100 TB is that
a report of k checks must NOT cost k scans:

- every row-local check (completeness, range, set membership) compiles
  to one conditional-count expression, all folded into a SINGLE
  aggregate pass (one scan, no shuffle beyond the final 1-row reduce);
- uniqueness rides the same pass as ``count vs count_distinct``
  (approx variant available for sketch-budget pipelines);
- referential integrity is the one check that genuinely needs a second
  input: a broadcast/left-anti join against the (usually dimension-
  sized) referenced key set, counted in the same job.

The report is one row of named metrics — feed it to ``observed``
(metrics.py) or assert on it in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["null_fraction", "in_range_fraction", "unique_ratio", "check_report"]


def null_fraction(col: str) -> Column:
    return (F.count(F.lit(1)) - F.count(col)) / F.count(F.lit(1))


def in_range_fraction(col: str, lo, hi) -> Column:
    return F.sum(
        F.when(F.col(col).between(lo, hi), 1).otherwise(0)
    ) / F.count(F.lit(1))


def unique_ratio(col: str) -> Column:
    return F.count_distinct(F.col(col)) / F.count(F.lit(1))


def check_report(
    df: DataFrame,
    checks: dict[str, Column],
    fk: tuple[str, DataFrame, str] | None = None,
) -> DataFrame:
    """One-row report: every named check expression evaluated in a
    single aggregate pass. ``fk=(col, dim_df, dim_col)`` adds a
    referential-integrity violation count via one broadcast anti-join
    (its own job over the same scan, still no second shuffle of df).

    NULL foreign keys are NOT violations — SQL ``NOT IN`` semantics
    drop them (NULL NOT IN ... is NULL), so the anti-join filters them
    first; they surface instead as ``fk_nulls``, folded into the main
    row-local aggregate pass (no extra scan)."""
    agg_cols = [c.alias(name) for name, c in checks.items()]
    if fk is not None:
        agg_cols.append(
            F.sum(F.when(F.col(fk[0]).isNull(), 1).otherwise(0))
            .cast("long")
            .alias("fk_nulls")
        )
    report = df.agg(*agg_cols)
    if fk is not None:
        col, dim, dim_col = fk
        violations = (
            df.select(F.col(col))
            .where(F.col(col).isNotNull())
            .join(F.broadcast(dim.select(F.col(dim_col).alias(col)).distinct()), col, "left_anti")
            .agg(F.count(F.lit(1)).alias("fk_violations"))
        )
        report = report.join(violations)
    return report
