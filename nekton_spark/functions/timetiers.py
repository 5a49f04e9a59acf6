"""Hypertable-style tiered time rollups (continuous aggregates).

TimescaleDB-style continuous aggregates keep the same measure at
several time granularities (minute → hour → day), with each coarse
tier maintained FROM the next finer tier, never by rescanning raw
data. The trick is composable partial aggregates: sum-of-sums,
sum-of-counts, min-of-mins, max-of-maxes are exact re-aggregations,
and avg derives as total/count at read time.

100 TB shape: the raw scan happens once (finest tier); every coarser
tier aggregates rows already reduced by orders of magnitude, so the
whole pyramid costs barely more than the finest tier alone. In
streaming form each tier is a watermarked windowed aggregation reading
the previous tier's sink — the same composition, incrementally
maintained (Structured Streaming's append-mode windowed aggs).

The reference has no time semantics at all (SURVEY §2.4); this is a
north-star operator the task brief names directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["time_tier_rollup"]

_UNIT_SECONDS = {
    "second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
}


def _tier_seconds(tier: str) -> int:
    qty, unit = tier.split()
    return int(qty) * _UNIT_SECONDS[unit.rstrip("s")]


def time_tier_rollup(
    df: DataFrame,
    tiers: list[str],
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """→ union of all tiers: (tier, bucket_start, *keys, n, total,
    vmin, vmax), where ``tier`` is the granularity string and
    ``bucket_start`` the bucket's epoch seconds.

    ``tiers`` must be ordered fine→coarse, STRICTLY increasing, and
    each must evenly divide the next (so coarse buckets are exact
    unions of fine buckets — the precondition for re-aggregation to
    be exact; an equal-duration pair would emit the same tier twice
    under two labels).

    NULL-measure contract: ``n`` counts ROWS in the bucket (events
    happened whether or not their measure was recorded) while
    ``total``/``vmin``/``vmax`` skip NULL measures — so the read-time
    ``avg = total/n`` identity is exact only when the measure column
    is non-NULL; with NULL measures divide by a count(value) the
    caller adds to the finest tier instead.
    """
    keys = keys or []
    if not tiers:
        raise ValueError("tiers must be a non-empty fine->coarse list")
    secs = [_tier_seconds(t) for t in tiers]
    for fine, coarse in zip(secs, secs[1:]):
        if coarse <= fine:
            raise ValueError(
                f"tiers must be strictly increasing: {coarse}s after {fine}s"
            )
        if coarse % fine != 0:
            raise ValueError(f"tiers must nest: {fine}s does not divide {coarse}s")

    # finest tier: the only scan of raw data
    finest = (
        df.groupBy(
            (F.floor(F.unix_timestamp(F.col(ts_col)) / secs[0]) * secs[0]).alias("bucket_start"),
            *keys,
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("total"),
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
        )
    )
    out = [finest.select(F.lit(tiers[0]).alias("tier"), "bucket_start", *keys, "n", "total", "vmin", "vmax")]
    prev = finest
    for tier, s in zip(tiers[1:], secs[1:]):
        # coarse tiers re-aggregate the previous tier (composable
        # partials) — input is already reduced, never the raw table
        prev = (
            prev.groupBy(
                (F.floor(F.col("bucket_start") / s) * s).alias("bucket_start"), *keys
            )
            .agg(
                F.sum("n").alias("n"),
                F.sum("total").alias("total"),
                F.min("vmin").alias("vmin"),
                F.max("vmax").alias("vmax"),
            )
        )
        out.append(
            prev.select(F.lit(tier).alias("tier"), "bucket_start", *keys, "n", "total", "vmin", "vmax")
        )
    result = out[0]
    for t in out[1:]:
        result = result.unionByName(t)
    return result
