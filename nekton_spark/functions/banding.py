"""Shared banded self-join with hot-bucket policy (r14).

Every banded near-dup miner in the repo reduces to the same step: a
frame with one row per (id, band-key...) self-equi-joins on the key to
produce candidate pairs. A genuine N-member near-dup clique shares
every band key, so the TRUE pair set — and therefore the join output —
is quadratic in N; that is pair semantics, not a plan defect. What IS
a plan defect at 100 TB is executing that quadratic bucket as ONE
straggler join task. Two opt-in knobs govern dirty corpora (ported
from imagehash.image_near_dup_pairs, r13, where they were first
landed; r14 factors the construction here so the text MinHash path
gets the identical, property-pinned machinery):

- ``max_bucket`` — REFUSE when any bucket exceeds it (engine policy:
  loud, instead of silently materializing N²/2 rows; run exact dedup
  first or raise the cap deliberately);
- ``salt_tile`` — opt INTO completion with the quadratic work SPREAD
  across the cluster: rows in a bucket larger than ``salt_tile`` get a
  deterministic tile t = pmod(xxhash64(id), nt) with nt =
  ceil(bucket/tile), and are replicated once per tile u into subgroup
  (key..., least(t, u), greatest(t, u)). The join keys on the subgroup
  and a side-consistency predicate makes every unordered pair meet in
  EXACTLY one subgroup per shared band key, so the pair set is
  IDENTICAL to the unsalted plan (pinned by tests on both callers)
  while a c-row clique becomes ~(c/tile)²/2 independent join tasks.
  Buckets ≤ ``salt_tile`` (the overwhelming mass) take the nt=1 fast
  path: zero replication, the same join as the unsalted plan.
  Replication volume is nt× rows for oversized buckets only — the
  same O(c²/tile) order their pair output already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..materialize import materialize


def salted_band_pairs(
    banded: DataFrame,
    key_cols: list[str],
    id_col: str = "id",
    carry: tuple[str, ...] = (),
    max_bucket: int | None = None,
    salt_tile: int | None = None,
    what: str = "band bucket",
) -> DataFrame:
    """Candidate pairs from a banded frame: returns one row per
    (bucket-co-membership, orientation-normalized) pair —
    ``(id_a, id_b[, <carry>_a..., <carry>_b...])`` with id_a < id_b,
    NOT de-duplicated across buckets (callers apply ``distinct()``,
    exactly as they did around their hand-rolled joins)."""
    if max_bucket is not None and max_bucket < 2:
        raise ValueError(f"max_bucket must be >= 2, got {max_bucket}")
    if salt_tile is not None and salt_tile < 2:
        raise ValueError(f"salt_tile must be >= 2, got {salt_tile}")
    if max_bucket is not None or salt_tile is not None:
        # the census/salting aggregations below re-execute the banded
        # frame's lineage (e.g. an Arrow MinHash signature stage) and
        # the self-join would then compute it a third time — pin it
        # once up front (r15, ADVICE: previously only the salt_tile
        # path materialized, so max_bucket-only callers paid double)
        banded = banded.transform(materialize)
    if max_bucket is not None:
        hot = (
            banded.groupBy(*key_cols)
            .count()
            .filter(F.col("count") > max_bucket)
            .limit(1)
            .collect()
        )
        if hot:
            keys = {k: hot[0][k] for k in key_cols}
            raise ValueError(
                f"{what} {keys} holds {hot[0]['count']} rows "
                f"> max_bucket={max_bucket}: the pair output would be "
                "quadratic — run exact dedup first, raise max_bucket "
                "deliberately, or opt into salt_tile"
            )
    join_keys = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in key_cols]
    if salt_tile is not None:
        # bucket census is tiny (oversized buckets only); AQE sees it
        # at the stage boundary and broadcasts the left join below
        big = (
            banded.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("bucket_n"))
            .filter(F.col("bucket_n") > salt_tile)
        )
        keep = [id_col, *carry, *key_cols]
        banded = (
            banded.join(big, list(key_cols), "left")
            .withColumn(
                "nt",
                F.ceil(
                    F.coalesce(F.col("bucket_n"), F.lit(1)) / salt_tile
                ).cast("int"),
            )
            .withColumn(
                "t", F.pmod(F.xxhash64(id_col), F.col("nt")).cast("int")
            )
            .select(
                *keep,
                "t",
                F.explode(F.sequence(F.lit(0), F.col("nt") - 1)).alias("u"),
            )
            .select(
                *keep,
                "t",
                F.least("t", "u").alias("ti"),
                F.greatest("t", "u").alias("tj"),
            )
        )
        # subgroup key spreads the quadratic bucket over ~nt²/2 join
        # partitions; the side-consistency predicate makes each
        # unordered pair meet exactly ONCE per shared band key (tiles
        # (ta, tb) only in subgroup (min, max) with the matching
        # orientation; ta == tb only in the diagonal subgroup)
        join_keys += [
            F.col("l.ti") == F.col("r.ti"),
            F.col("l.tj") == F.col("r.tj"),
            (
                (F.col("l.t") == F.col("l.ti"))
                & (F.col("r.t") == F.col("l.tj"))
            )
            | (
                (F.col("l.t") == F.col("l.tj"))
                & (F.col("r.t") == F.col("l.ti"))
            ),
        ]
    left, right = banded.alias("l"), banded.alias("r")
    cond = join_keys[0] & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
    for k in join_keys[1:]:
        cond = cond & k
    out_cols = [
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
    ]
    for c in carry:
        out_cols += [
            F.col(f"l.{c}").alias(f"{c}_a"),
            F.col(f"r.{c}").alias(f"{c}_b"),
        ]
    return left.join(right, cond).select(*out_cols)
