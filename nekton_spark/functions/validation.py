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


def drift_report(
    old: DataFrame,
    new: DataFrame,
    numeric_cols: list[str],
    bins: int = 10,
) -> DataFrame:
    """Snapshot-to-snapshot drift for numeric columns — the ingest
    audit that catches a broken upstream before training compute is
    spent. One row per column: counts, null counts, min/max of both
    snapshots, and the Population Stability Index over ``bins``
    equal-width bins anchored on the OLD snapshot's [min, max]
    (out-of-range new values clamp into the edge bins, so a shifted
    distribution shows up as edge-bin mass, not silent loss).

    PSI = Σ_b (p_new - p_old)·ln(p_new/p_old), probabilities
    Laplace-smoothed ((cnt+1)/(n+bins)) so empty bins never divide by
    zero. Conventional read: <0.1 stable, 0.1-0.25 moderate, >0.25
    action.

    Exactness: bin counts are conditional sums (exact longs); the PSI
    is a fixed left-associated chain over ``bins`` terms of exact-
    operand divisions — the only libm call is ln, which matched the
    oracle bit-for-bit across this repo's LM-scoring operators —
    rounded to 1e-6. Cost: one min/max pass over OLD for the edges
    (2 doubles to the driver), then one single-aggregate pass per
    snapshot; the final join is 1-row × 1-row.
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    rows = []
    for c in numeric_cols:
        edge = old.select(
            F.min(F.col(c).cast("double")).alias("lo"),
            F.max(F.col(c).cast("double")).alias("hi"),
        ).first()
        if edge.lo is None or edge.hi is None:
            raise ValueError(
                f"old snapshot has no non-null values for column {c!r}; "
                "PSI bin edges are anchored on the old snapshot's [min, max]"
            )
        lo, hi = float(edge.lo), float(edge.hi)
        width = (hi - lo) / bins if hi > lo else 1.0

        def binned_counts(df: DataFrame, tag: str) -> DataFrame:
            v = F.col(c).cast("double")
            b = F.least(
                F.lit(bins - 1),
                F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")),
            )
            aggs = [
                F.count(F.lit(1)).alias(f"n_{tag}"),
                (F.count(F.lit(1)) - F.count(c)).alias(f"nulls_{tag}"),
                F.min(v).alias(f"min_{tag}"),
                F.max(v).alias(f"max_{tag}"),
            ] + [
                F.sum(
                    F.when(v.isNotNull() & (b == i), F.lit(1)).otherwise(F.lit(0))
                ).alias(f"b{i}_{tag}")
                for i in range(bins)
            ]
            return df.agg(*aggs)

        o, n = binned_counts(old, "old"), binned_counts(new, "new")
        joined = o.crossJoin(n)
        no = F.col("n_old") - F.col("nulls_old")
        nn = F.col("n_new") - F.col("nulls_new")
        psi = None
        for i in range(bins):
            po = (F.col(f"b{i}_old") + 1).cast("double") / (no + bins)
            pn = (F.col(f"b{i}_new") + 1).cast("double") / (nn + bins)
            term = (pn - po) * F.log(pn / po)
            psi = term if psi is None else psi + term
        rows.append(
            joined.select(
                F.lit(c).alias("column"),
                "n_old", "n_new", "nulls_old", "nulls_new",
                "min_old", "max_old", "min_new", "max_new",
                F.round(psi, 6).alias("psi"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def category_drift(
    old: DataFrame, new: DataFrame, col: str
) -> DataFrame:
    """Categorical drift: per value, counts and exact frequency shares
    in both snapshots (full outer on the value set, so a category that
    appears or vanishes shows 0 on one side instead of dropping out).
    All longs + exact-operand divisions — bit-replayable. One
    partial-agg'd shuffle per snapshot on the (small) category key."""
    def counted(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy(F.col(col).alias("value")).agg(
            F.count(F.lit(1)).alias(f"n_{tag}")
        )

    o, n = counted(old, "old"), counted(new, "new")
    t_old = old.count()
    t_new = new.count()
    return (
        o.join(n, "value", "full_outer")
        .select(
            "value",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            (F.coalesce("n_old", F.lit(0)).cast("double") / F.lit(float(t_old))).alias("frac_old"),
            (F.coalesce("n_new", F.lit(0)).cast("double") / F.lit(float(t_new))).alias("frac_new"),
        )
    )
