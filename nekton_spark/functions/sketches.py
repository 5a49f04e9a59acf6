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
cell[r][hash60(token, CMS_SALT + r) % width]`` — an upper bound on the
true count (never under), with overestimate bounded by e·N/width w.h.p.
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
CMS_SALT = 5000  # row r hashes with seed CMS_SALT + r (5000..5003 free)


def _tokens(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(tokenize(F.col(text_col))).alias("token"))
        .where(F.length("token") > 0)
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
    toks = _tokens(df, text_col)
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    return (
        toks.select("token", rows)
        .select(
            "r",
            (hash60(F.col("token"), F.lit(CMS_SALT) + F.col("r")) % width).alias(
                "bucket"
            ),
        )
        .groupBy("r", "bucket")
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
    probes = candidates.select(
        *carry, F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    ).select(
        *carry,
        "r",
        (hash60(F.col("token"), F.lit(CMS_SALT) + F.col("r")) % width).alias(
            "bucket"
        ),
    )
    joined = probes.join(F.broadcast(sketch), ["r", "bucket"], "left").select(
        *carry, F.coalesce("n", F.lit(0)).alias("cell_n")
    )
    return joined.groupBy(*carry).agg(F.min("cell_n").alias("est_n"))


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
    w = Window.orderBy(F.desc("est_n"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("token", "est_n", "true_n", "rank")
    )
