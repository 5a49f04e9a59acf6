"""Z-order (Morton-curve) data layout for multi-dimensional scan
pruning (Morton 1966; the clustering technique Delta Lake's OPTIMIZE
ZORDER and ClickHouse/Databricks layouts popularized — public
knowledge).

Why it matters at 100 TB: parquet row-group min/max statistics prune
scans only along the ORDER the data was written in. A table laid out
by time prunes time predicates and nothing else; a query filtering on
``(user_id, value)`` reads everything. Interleaving the bits of the
two (bucketized) key columns into one Morton key and range-writing on
it gives every row group a TIGHT bounding box in BOTH dimensions, so
a 2-D box predicate skips most row groups — turning footer metadata
into a poor man's spatial index with zero read-path changes.

The reference engine (byte-stream pipeline, no storage layout —
``src/sinks.rs`` writes stdout/kafka only) has nothing here; this
extends the scale layer SURVEY §2.4-2.5 adds. Spark-first shape:
the Morton key is a pure codegen'd bit expression (no UDF), the
write is ``repartitionByRange(z).sortWithinPartitions(z)`` (one
range-exchange — the same shuffle ANY re-layout pays), and pruning
needs no engine support beyond ordinary parquet footer stats.

Exactness: bucketization is ``floor((x − min)·(2^bits − 1)/(max −
min))`` over doubles — plain IEEE arithmetic on exact inputs,
bit-identical in Spark and the DuckDB oracle; the interleave is
integer shifts/masks. NULL in either key column → NULL z-value
(ordered first by the range writer; flagged, never dropped).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16


def _check_bits(bits: int) -> None:
    # bits > 31 would push column b's top bit into (or past) the long
    # sign bit, making half the keys negative and silently splitting
    # the Z-curve order — refuse, don't mislayout.
    if not 1 <= bits <= 31:
        raise ValueError(f"zorder bits must be in [1, 31], got {bits}")


def _bucket(x: Column, lo: float, hi: float, bits: int) -> Column:
    """Map x ∈ [lo, hi] onto integer buckets 0..2^bits−1 (constant
    column → bucket 0; NULL → NULL). Values OUTSIDE [lo, hi] — the
    caller-supplied-``ranges`` path with stale table statistics —
    clamp to the edge buckets (what Delta's ZORDER does): an
    out-of-range row lands in the nearest Z-curve segment instead of
    aliasing onto an unrelated key through the bit mask."""
    n = (1 << bits) - 1
    if hi == lo:
        return F.when(x.isNull(), F.lit(None).cast("long")).otherwise(F.lit(0))
    raw = F.floor(
        (x.cast("double") - F.lit(float(lo))) * F.lit(float(n))
        / F.lit(float(hi) - float(lo))
    ).cast("long")
    # NOTE: least/greatest SKIP nulls in Spark (they are not
    # null-propagating), so the NULL contract needs the explicit
    # branch. The clamp is a no-op when [lo, hi] is the data's own
    # min/max (raw is then always in range — the oracle replays the
    # unclamped formula and still hash-matches); it only bites on the
    # caller-supplied stale-statistics path.
    clamped = F.greatest(
        F.least(raw, F.lit(n).cast("long")), F.lit(0).cast("long")
    )
    return F.when(x.isNull(), F.lit(None).cast("long")).otherwise(clamped)


def _interleave(a: Column, b: Column, bits: int) -> Column:
    """Morton key: bit i of ``a`` lands at position 2i, bit i of
    ``b`` at 2i+1. Unrolled shifts/masks — whole-stage codegen, no
    loop at runtime."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def z_value(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = Z_BITS,
    ranges: tuple[tuple[float, float], tuple[float, float]] | None = None,
) -> DataFrame:
    """Append ``zv``: the Morton key of the two bucketized columns.
    Map-only; pass ``ranges`` to reuse known statistics instead of
    the one min/max aggregate."""
    _check_bits(bits)
    if ranges is not None:
        (alo, ahi), (blo, bhi) = ranges
    else:
        # ONE combined aggregate — a single stats scan, not one per
        # column (at 100 TB the pre-pass is the cost that matters;
        # with real table statistics pass `ranges` and skip it).
        row = df.agg(
            F.min(F.col(col_a).cast("double")).alias("alo"),
            F.max(F.col(col_a).cast("double")).alias("ahi"),
            F.min(F.col(col_b).cast("double")).alias("blo"),
            F.max(F.col(col_b).cast("double")).alias("bhi"),
        ).first()
        alo, ahi = (
            (0.0, 0.0) if row.alo is None else (float(row.alo), float(row.ahi))
        )
        blo, bhi = (
            (0.0, 0.0) if row.blo is None else (float(row.blo), float(row.bhi))
        )
    ba = _bucket(F.col(col_a), alo, ahi, bits)
    bb = _bucket(F.col(col_b), blo, bhi, bits)
    return df.withColumn("zv", _interleave(ba, bb, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = Z_BITS,
    n_files: int = 8,
) -> None:
    """Re-layout ``df`` on the Morton key and write parquet: one
    range exchange (the sampling-based partitioner keeps output files
    even-sized under skew) + an in-partition sort, so every file and
    every row group covers a compact Z-curve segment — a tight
    min/max box in BOTH key columns."""
    (
        z_value(df, col_a, col_b, bits)
        .repartitionByRange(n_files, "zv")
        .sortWithinPartitions("zv")
        .drop("zv")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroups_matching(
    path: str, col_a: str, a_lo, a_hi, col_b: str, b_lo, b_hi
) -> tuple[int, int]:
    """Pruning measurement used by tests/bench: (row groups whose
    footer min/max box intersects the predicate box, total row
    groups) — exactly the skip decision a scan makes from metadata."""
    import pyarrow.parquet as pq

    match, total = 0, 0
    ds = pq.ParquetDataset(path)
    for frag in ds.fragments:
        md = frag.metadata
        names = frag.physical_schema.names
        ia, ib = names.index(col_a), names.index(col_b)
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            sa, sb = rg.column(ia).statistics, rg.column(ib).statistics
            total += 1
            # a row group with MISSING stats (no statistics object, or
            # statistics without min/max — e.g. an all-NULL chunk)
            # cannot be proven non-intersecting, so a real scan must
            # read it — count it as matching, never as pruned
            a_hit = (
                sa is None
                or not sa.has_min_max
                or not (sa.max < a_lo or sa.min > a_hi)
            )
            b_hit = (
                sb is None
                or not sb.has_min_max
                or not (sb.max < b_lo or sb.min > b_hi)
            )
            if a_hit and b_hit:
                match += 1
    return match, total
