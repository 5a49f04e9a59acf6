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

from ..materialize import materialize

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
    rounded to 1e-6. Cost: THREE scans total regardless of how many
    columns are checked — one min/max pass over OLD for every
    column's edges, then one all-columns aggregate per snapshot (the
    same k-checks-must-not-cost-k-scans rule check_report follows; a
    first cut ran 3 jobs PER column). The 1×1 joined row is
    materialized once, so the per-column output selects are local.
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    if not numeric_cols:
        raise ValueError("numeric_cols must be non-empty")

    # pass 1: every column's bin edges from ONE old-snapshot aggregate
    mm = old.agg(
        *[
            f
            for i, c in enumerate(numeric_cols)
            for f in (
                F.min(F.col(c).cast("double")).alias(f"_lo{i}"),
                F.max(F.col(c).cast("double")).alias(f"_hi{i}"),
            )
        ]
    ).first()
    edges: dict[str, tuple[float, float, float]] = {}
    for i, c in enumerate(numeric_cols):
        lo, hi = mm[f"_lo{i}"], mm[f"_hi{i}"]
        if lo is None or hi is None:
            raise ValueError(
                f"old snapshot has no non-null values for column {c!r}; "
                "PSI bin edges are anchored on the old snapshot's [min, max]"
            )
        lo, hi = float(lo), float(hi)
        edges[c] = (lo, hi, (hi - lo) / bins if hi > lo else 1.0)

    # passes 2+3: one aggregate per snapshot covering every column
    def snapshot_agg(df: DataFrame, tag: str) -> DataFrame:
        aggs = []
        for i, c in enumerate(numeric_cols):
            lo, hi, width = edges[c]
            v = F.col(c).cast("double")
            # clamp in LONG, no int cast: a far-drifted new value (the
            # exact input a drift report exists for, e.g. epoch-ms
            # landing in an epoch-s column) makes floor() exceed int32
            # — a floor->cast('int')->clamp order would throw ANSI
            # CAST_OVERFLOW before the clamp could bite
            b = F.least(
                F.lit(bins - 1).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor((v - F.lit(lo)) / F.lit(width)),
                ),
            )
            aggs += [
                F.count(F.lit(1)).alias(f"n_{tag}_{i}"),
                (F.count(F.lit(1)) - F.count(c)).alias(f"nulls_{tag}_{i}"),
                F.min(v).alias(f"min_{tag}_{i}"),
                F.max(v).alias(f"max_{tag}_{i}"),
            ] + [
                F.sum(
                    F.when(v.isNotNull() & (b == j), F.lit(1)).otherwise(F.lit(0))
                ).alias(f"b{j}_{tag}_{i}")
                for j in range(bins)
            ]
        return df.agg(*aggs)

    joined = (
        snapshot_agg(old, "old")
        .crossJoin(snapshot_agg(new, "new"))
        .transform(materialize)  # ONE row; column selects below are local
    )
    rows = []
    for i, c in enumerate(numeric_cols):
        no = F.col(f"n_old_{i}") - F.col(f"nulls_old_{i}")
        nn = F.col(f"n_new_{i}") - F.col(f"nulls_new_{i}")
        psi = None
        for j in range(bins):
            po = (F.col(f"b{j}_old_{i}") + 1).cast("double") / (no + bins)
            pn = (F.col(f"b{j}_new_{i}") + 1).cast("double") / (nn + bins)
            term = (pn - po) * F.log(pn / po)
            psi = term if psi is None else psi + term
        rows.append(
            joined.select(
                F.lit(c).alias("column"),
                F.col(f"n_old_{i}").alias("n_old"),
                F.col(f"n_new_{i}").alias("n_new"),
                F.col(f"nulls_old_{i}").alias("nulls_old"),
                F.col(f"nulls_new_{i}").alias("nulls_new"),
                F.col(f"min_old_{i}").alias("min_old"),
                F.col(f"max_old_{i}").alias("max_old"),
                F.col(f"min_new_{i}").alias("min_new"),
                F.col(f"max_new_{i}").alias("max_new"),
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

    # totals derive from the grouped counts (the groupBy keeps a NULL
    # category, so sum == count(*)) — no second scan of either
    # snapshot; the grouped frames are category-cardinality tiny, so
    # materializing them makes the derivation a metadata-cheap job
    o = counted(old, "old").transform(materialize)
    n = counted(new, "new").transform(materialize)
    t_old = (o.agg(F.sum("n_old")).first()[0]) or 0
    t_new = (n.agg(F.sum("n_new")).first()[0]) or 0
    if t_old == 0 or t_new == 0:
        raise ValueError(
            f"category_drift: empty snapshot (old={t_old}, new={t_new} "
            "rows) — frequency shares are undefined"
        )
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
