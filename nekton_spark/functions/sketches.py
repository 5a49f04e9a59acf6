"""Count-Min Sketch heavy hitters over document tokens.

The 100 TB way to ask "what are the most frequent tokens": a
fixed-size mergeable sketch (Cormode & Muthukrishnan 2005). Exact
top-k token counting (``text_analysis.top_tokens``) shuffles one row
per DISTINCT token — unbounded vocabulary at crawl scale; the sketch
shuffles at most ``depth * width`` cells no matter the corpus, and
map-side partial aggregation collapses each executor's token stream
onto those cells before anything crosses the network.

The reference engine (an 11-operator byte-stream pipeline,
``src/processors.rs``) has no aggregation at all; this is part of the
relational/curation layer SURVEY §2.4-2.5 adds on top. Everything is
integer arithmetic over ``hash60`` buckets — JVM-side, codegen'd, and
replayed exactly by the DuckDB oracle (no float rounding anywhere).

Estimation contract: ``est_n(token) = min over rows r of
cell[r][(h60 >> (r·log2 width)) & (width−1)]`` with
``h60 = hash60(token, CMS_SALT)`` — row r reads its own DISJOINT
bit-field of the single 60-bit hash (requires power-of-two width and
depth·log2(width) ≤ 60), so cross-row collisions are independent and
one md5 covers all rows. NOT an odd-multiplier affine family: with a
power-of-two width the low-bit extraction makes A_r·Δ ≡ 0 (mod W)
independent of r — every row would collide identically. est_n is an
upper bound on the true count (never under), overestimate bounded by
e·N/width w.h.p.
A sketch cannot ENUMERATE its keys; heavy-hitter queries score a
candidate token set against it. ``cms_heavy_hitters`` uses the corpus'
distinct tokens as candidates (exercising build + probe end-to-end);
at 100 TB the candidate set would come from a sample or a prior
vocabulary, while the SKETCH side stays exact over the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nekton_spark.functions.hashing import hash60
from nekton_spark.functions.text_analysis import tokenize

CMS_WIDTH = 1024
CMS_DEPTH = 4
CMS_SALT = 5000  # base-hash seed; rows read disjoint bit-fields of it


def _bits_per_row(width: int, depth: int) -> int:
    bits = (width - 1).bit_length()
    if width <= 1 or width != 1 << bits:
        raise ValueError(f"CMS width must be a power of two, got {width}")
    if bits * depth > 60:
        raise ValueError(
            f"depth {depth} x log2(width) {bits} exceeds the 60 hash bits"
        )
    return bits


def _tokens(df: DataFrame, text_col: str) -> DataFrame:
    from .similarity import ensure_parallelism

    # fan out below the tokenizer (r15 opt): a 1-split input would run
    # the regex split + hash + partial agg on one task; no-op at scale
    return (
        ensure_parallelism(df)
        .select(F.explode(tokenize(F.col(text_col))).alias("token"))
        .where(F.length("token") > 0)
    )


def _probe_pairs(width: int, depth: int):
    """(r, bucket) struct array for one token — ONE md5 per
    occurrence, row r's bucket sliced from its own bit-field of the
    60-bit hash (shift + mask: codegen'd literals, no join). This is
    what keeps the sketch build cheap at scale — the md5 cost is per
    occurrence, not per occurrence × depth (measured 13.5 s → 4× less
    hashing at sf1)."""
    bits = _bits_per_row(width, depth)
    h = hash60(F.col("token"), CMS_SALT)
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    F.shiftright(h, r * bits)
                    .bitwiseAND(F.lit(width - 1))
                    .alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    )


def cms_sketch(
    df: DataFrame,
    text_col: str = "text",
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Build the sketch: one row per non-empty (row, bucket) cell,
    ``(r, bucket, n)``. The explode fans each token to ``depth`` rows,
    but the groupBy keys onto at most depth*width cells, so map-side
    combine bounds the shuffle at O(cells) per executor regardless of
    corpus size. Cells never touched are absent (count 0 by contract);
    sketches merge by unioning cell rows and summing ``n``."""
    return (
        _tokens(df, text_col)
        .select(_probe_pairs(width, depth).alias("p"))
        .groupBy(F.col("p.r").alias("r"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Score a candidate token set against a sketch: broadcast the
    sketch (≤ depth*width rows by construction — a bounded broadcast
    at ANY corpus size) onto the candidates' (r, bucket) probes and
    take the min across rows. Missing cells count 0 (the sketch only
    stores touched cells). Input: any DataFrame with a ``token``
    column; every other candidate column rides through (so a caller
    can carry e.g. a true count without a re-join and a second corpus
    scan); output adds ``est_n``."""
    carry = [c for c in candidates.columns]
    # internal names are _cms_-prefixed so a carried candidate column
    # called n / r / bucket / cell_n cannot collide with the probe or
    # sketch columns (the docstring invites callers to carry a count)
    reserved = {"_cms_r", "_cms_bucket", "_cms_n", "_cms_cell"}
    if reserved & set(carry):
        raise ValueError(f"candidate columns collide with {sorted(reserved)}")
    probes = candidates.select(
        *carry, _probe_pairs(width, depth).alias("p")
    ).select(
        *carry,
        F.col("p.r").alias("_cms_r"),
        F.col("p.bucket").alias("_cms_bucket"),
    )
    sk = sketch.select(
        F.col("r").alias("_cms_r"),
        F.col("bucket").alias("_cms_bucket"),
        F.col("n").alias("_cms_n"),
    )
    joined = probes.join(
        F.broadcast(sk), ["_cms_r", "_cms_bucket"], "left"
    ).select(*carry, F.coalesce("_cms_n", F.lit(0)).alias("_cms_cell"))
    return joined.groupBy(*carry).agg(F.min("_cms_cell").alias("est_n"))


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    k: int = 40,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Top-k tokens by CMS-estimated count, with the true count
    alongside (``est_n >= true_n`` always — the sketch never
    undercounts). Rank ties break on token text for determinism.
    Returns (token, est_n, true_n, rank), rank 1..k."""
    from pyspark.sql import Window

    sketch = cms_sketch(df, text_col, width, depth)
    true_counts = (
        _tokens(df, text_col).groupBy("token").agg(F.count(F.lit(1)).alias("true_n"))
    )
    # true_n rides through the probe leg: one corpus scan builds the
    # sketch, one builds the counts — no third scan / re-join to pair
    # est with true (Catalyst clones unaggregated subtrees otherwise).
    scored = cms_estimate(true_counts, sketch, width, depth)
    # the rank<=k filter over an unpartitioned window looks like a
    # vocabulary-wide single-partition sort, but Spark 4's
    # InferWindowGroupLimit + LimitPushDownThroughWindow rewrite it to
    # TakeOrderedAndProject(limit=k) BEFORE the window, so the window
    # only ever sees k rows (pinned by
    # test_heavy_hitters_cms_two_scans_bounded_shuffle).
    w = Window.orderBy(F.desc("est_n"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("token", "est_n", "true_n", "rank")
    )


# --------------------------------------------------------------- KMV

KMV_K = 256
KMV_SALT = 5100
_POW2_60 = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = KMV_K,
) -> DataFrame:
    """K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002)
    — the mergeable bounded-state alternative to exact
    countDistinct, and (unlike HyperLogLog) EXACTLY replayable in SQL:
    the sketch is just the k smallest distinct hash60 values, and the
    estimate is (k−1)·2^60 / h_(k) (2^60 and k−1 are exact doubles —
    a power of two scales the exponent — so the IEEE division is
    bit-identical in every engine; fewer than k distinct hashes means
    the sketch saw everything and the count is exact).

    Scale shape: one Arrow pass emits each BATCH's per-group k
    smallest distinct hashes (≤ batches·groups·k rows — bounded
    regardless of row count), then a distinct + per-group rank keeps
    the global min-k; no shuffle ever carries one row per distinct
    value the way countDistinct does. Sketches merge by unioning
    min-k sets and re-taking the k smallest.

    Returns one row per group: (*group_cols, est_distinct,
    sketch_size). est >= actual only in expectation — KMV is unbiased,
    not one-sided like CMS."""
    import pandas as pd

    from pyspark.sql import Window

    groups = list(group_cols or [])

    # NULL values don't count as a distinct value (count(DISTINCT x)
    # semantics) — and a NULL hash would sort NULLS FIRST in Spark but
    # NULLS LAST in the oracle, so it must never reach the min-k.
    h = hash60(F.col(value_col), KMV_SALT).alias("h")
    hashed = df.where(F.col(value_col).isNotNull()).select(*groups, h)

    def partial_mink(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            if groups:
                # dropna=False: Spark groupBy (and the SQL oracle) keep
                # a NULL group key; pandas' default dropna=True would
                # silently erase the NULL group's distinct count
                out = (
                    pdf.groupby(groups, sort=False, dropna=False)["h"]
                    .apply(lambda s: pd.Series(sorted(s.unique())[:k]))
                    .reset_index(groups)[groups + ["h"]]
                )
            else:
                out = pd.DataFrame({"h": sorted(pdf["h"].unique())[:k]})
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in hashed.schema.fields
    )
    partial = hashed.mapInPandas(partial_mink, schema).distinct()
    w = Window.partitionBy(*[F.col(g) for g in groups]).orderBy(F.asc("h"))
    mink = partial.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    est = F.when(
        F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
    ).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(_POW2_60) / F.max("h").cast("double")
        ).cast("double")
    )
    return mink.groupBy(*groups).agg(
        est.cast("long").alias("est_distinct"),
        F.count(F.lit(1)).alias("sketch_size"),
    )
