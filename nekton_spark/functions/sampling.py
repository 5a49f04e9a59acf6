"""Deterministic sampling & dataset splitting for training-data pipelines.

Random sampling (``df.sample``) is seed-and-partitioning dependent —
resampling after a repartition yields a different subset, which is
poison for reproducible dataset builds. These operators are
*content-addressed*: membership depends only on the row's key, via the
portable 60-bit hash, so they are stable across runs, engines,
partitionings, and cluster sizes — and exactly verifiable against the
DuckDB oracle.

- :func:`hash_sample` — keep ~rate of rows (hash(key) mod M < rate·M).
- :func:`train_val_test_split` — disjoint, exhaustive split assignment.
- :func:`stratified_hash_sample` — per-stratum rates.

All map-only: zero shuffles, trivially 100 TB-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import hash60

BUCKETS = 1_000_000


def _bucket(key: Column, seed: int) -> Column:
    return hash60(key, seed) % BUCKETS


def hash_sample(df: DataFrame, key_col: str, rate: float, seed: int = 42) -> DataFrame:
    """Keep rows whose key hashes into the first ``rate`` fraction of buckets."""
    return df.filter(_bucket(F.col(key_col), seed) < int(rate * BUCKETS))


def split_assignment(key: Column, weights: dict[str, float], seed: int = 42) -> Column:
    """Label each row with its split name; weights must sum to ≤ 1,
    remainder goes to the last split."""
    b = _bucket(key, seed)
    names = list(weights)
    bounds = []
    acc = 0.0
    for name in names:
        acc += weights[name]
        bounds.append((name, int(acc * BUCKETS)))
    chain = None
    for name, bound in bounds:  # first matching bound wins
        cond = b < F.lit(bound)
        chain = F.when(cond, F.lit(name)) if chain is None else chain.when(cond, F.lit(name))
    return chain.otherwise(F.lit(names[-1]))


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn("split", split_assignment(F.col(key_col), weights, seed))


def stratified_hash_sample(
    df: DataFrame, key_col: str, stratum_col: str, rates: dict[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum deterministic rates; strata not in ``rates`` are dropped."""
    b = _bucket(F.col(key_col), seed)
    cond = F.lit(False)
    for stratum, rate in rates.items():
        cond = cond | ((F.col(stratum_col) == stratum) & (b < int(rate * BUCKETS)))
    return df.filter(cond)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of ``k`` rows, weight-
    proportional per the Efraimidis–Spirakis exponential-key scheme:
    each row draws u ∈ (0, 1] and is ranked by -ln(u) / w ascending —
    the classic one-pass distributed reservoir (quality-weighted
    corpus subsetting, importance-sampled eval sets).

    Content-addressed like every sampler here: u = (hash60(key)+1)/2^60
    (exact power-of-two division), so the sample is stable across
    runs, engines and partitionings, and the DuckDB oracle replays
    membership exactly. Rows with weight ≤ 0 or NULL are excluded
    (they have zero selection probability; -ln(u)/w would be a NaN/∞
    trap, not a sample key). The plan is map + TakeOrderedAndProject:
    per-partition partial top-k merged on one task — never a global
    sort — and the rank window afterwards sees only the k survivors.
    Output adds ``sample_key`` (rounded) and ``rank``."""
    from pyspark.sql import Window

    u = (hash60(F.col(key_col), seed) + F.lit(1).cast("double")) / F.lit(
        float(1 << 60)
    )
    skey = -F.log(u) / F.col(weight_col).cast("double")
    order = [F.asc("sample_key"), F.asc(key_col)]
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("sample_key", F.round(skey, 10))
        .orderBy(*order)
        .limit(k)
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
    )


def quota_sample(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    order_col: str,
    key_col: str,
    descending: bool = True,
) -> DataFrame:
    """At most ``k`` rows per group, best-first by ``order_col`` with
    deterministic ties on ``key_col`` — the per-source / per-language
    cap every curation pipeline needs (bound any one source's share
    while keeping its best documents).

    One shuffle on the group key; the rank window scans each group
    once. Group skew note: a hot group's window partition cannot be
    split, but the window only *counts* to k per group — state is one
    row — so a hot group costs a scan, not memory; at 100 TB a
    pre-filter on a per-group threshold (computed from a sampled
    quantile) would trim the scan if groups are pathological."""
    from pyspark.sql import Window

    direction = F.desc(order_col) if descending else F.asc(order_col)
    w = Window.partitionBy(*group_cols).orderBy(direction, F.asc(key_col))
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def mixture_sample(
    df: DataFrame,
    targets: dict[str, float],
    budget_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    tokenizer: str = "whitespace",
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Token-proportional source mixing (the DoReMi / data-mixing prep
    step): sample each source at the rate that makes its share of the
    output approach ``targets[source]`` of ``budget_tokens`` —
    rate_s = min(1, budget·target_s / tokens_s). A source whose
    corpus cannot fill its target share is taken whole (rate capped
    at 1; the OTHER sources' rates are NOT re-normalized to absorb
    the shortfall — detecting it is the caller's job, by comparing
    realized per-source token shares of the output against
    ``targets``, an O(|sources|) aggregate);
    sources absent from ``targets`` are dropped. Membership is
    content-addressed (hash60 bucket < floor(rate·BUCKETS)) — the same
    reproducibility contract as every sampler here.

    100 TB shape: one partial-aggregated shuffle of per-source token
    totals (|sources| rows), rates broadcast-joined back, then a
    map-only filter. The rate arithmetic is one multiply + one divide
    + one floor of exact integer operands, so an external SQL oracle
    replays membership bit-for-bit.
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    if tokenizer not in ("whitespace", "bpe"):
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    from .text_analysis import token_count

    if tokenizer == "bpe":
        # budget in trained-BPE tokens (functions/bpe.py): per-source
        # totals come from the vocabulary-bounded encode pass; the
        # membership hash and rate arithmetic are unchanged
        from .bpe import STD_MERGES, bpe_encode

        counts = bpe_encode(df, STD_MERGES if merges is None else merges,
                            text_col, id_col)
        per_doc = df.select(F.col(source_col).alias("_src"), F.col(id_col)).join(
            counts.select(id_col, F.col("n_bpe").alias("_tok")), id_col
        )
    else:
        per_doc = df.select(
            F.col(source_col).alias("_src"),
            token_count(F.col(text_col)).alias("_tok"),
        )
    totals = per_doc.groupBy("_src").agg(
        F.sum("_tok").cast("long").alias("_tokens")
    )
    tmap = F.create_map(
        *[x for sname, share in sorted(targets.items()) for x in (F.lit(sname), F.lit(float(share)))]
    )
    rates = (
        totals.select(
            "_src",
            "_tokens",
            # share first, NULL-filtered BEFORE least(): Spark's least()
            # IGNORES NULL operands, so least(1.0, NULL) is 1.0 and an
            # un-targeted source would silently sample whole
            tmap[F.col("_src")].alias("_share"),
        )
        .filter(F.col("_share").isNotNull())
        .select(
            "_src",
            "_tokens",
            F.least(
                F.lit(1.0),
                F.lit(float(budget_tokens)) * F.col("_share") / F.col("_tokens"),
            ).alias("_rate"),
        )
    )
    b = _bucket(F.col(id_col), seed)
    return (
        df.join(
            F.broadcast(rates), df[source_col] == rates["_src"], "inner"
        )
        .filter(b < F.floor(F.col("_rate") * BUCKETS))
        .drop("_src", "_tokens", "_rate")
    )


DSIR_BUCKETS = 4096


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 77,
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR; Xie et al.
    2023, public paper) — score every RAW document by how much more
    likely its hashed n-gram features are under a small TARGET corpus
    than under the raw corpus itself:

        log_ratio(d) = Σ_features  ln((c_t(b)+1)/(N_t+B))
                                 − ln((c_r(b)+1)/(N_r+B))

    where b = hash60(feature, seed) mod B buckets, features are the
    doc's word unigrams AND bigrams (lowered whitespace tokens), and
    c/N are bucket/total feature counts of each corpus with add-one
    smoothing. High log_ratio = "looks like the target domain";
    selection is then a deterministic top-k (or threshold) over the
    scores — the importance-resampling step with content-addressed
    stability instead of a sampling RNG. Returns (doc_id, n_feats,
    log_ratio) for every raw doc with ≥1 token; scores rounded to 6 dp.

    100 TB shape — the point of DSIR's hashed features is that BOTH
    models are fixed-size however big the corpora: the bucket tables
    are ≤ B rows each (partial-aggregated shuffles bounded at B) and
    broadcast to the scoring pass, totals are broadcast 1-row
    aggregates, the feature explode is map-only codegen (zero
    Python), and the per-doc sum partial-aggregates on doc_id — one
    data-scale shuffle end to end. Oracle-exact: hash60 is the
    cross-engine hash and the score is one rounded sum of pure-ln
    terms (the unigram/bigram_logprob precedent).
    """
    from .similarity import ensure_parallelism
    from .text_analysis import tokenize

    def feat_rows(df: DataFrame, with_id: bool) -> DataFrame:
        # single-file corpora scan as 1-2 splits; the feature explode
        # and bucket-count partial aggs must not serialize onto them
        df = ensure_parallelism(df)
        c = F.lower(F.coalesce(F.col(text_col), F.lit("")))
        toks = F.filter(tokenize(c), lambda t: F.length(t) > 0)
        bigrams = F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        grams = F.when(F.size(toks) >= 2, F.concat(toks, bigrams)).otherwise(toks)
        cols = [F.col(id_col).alias("doc_id")] if with_id else []
        rows = df.select(*cols, F.explode(grams).alias("feat"))
        return rows.select(
            *(["doc_id"] if with_id else []),
            (hash60(F.col("feat"), seed) % n_buckets).cast("int").alias("b"),
        )

    t_counts = feat_rows(target, False).groupBy("b").agg(
        F.count(F.lit(1)).alias("ct")
    )
    raw_feats = feat_rows(raw, True)
    r_counts = raw_feats.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    n_t = t_counts.agg(F.sum("ct").alias("nt"))
    n_r = r_counts.agg(F.sum("cr").alias("nr"))
    term = F.log(
        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
        / (F.col("nt") + F.lit(float(n_buckets)))
    ) - F.log(
        (F.col("cr") + F.lit(1.0)) / (F.col("nr") + F.lit(float(n_buckets)))
    )
    return (
        raw_feats.join(F.broadcast(t_counts), "b", "left")
        .join(F.broadcast(r_counts), "b")  # every raw bucket exists
        .crossJoin(F.broadcast(n_t))
        .crossJoin(F.broadcast(n_r))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum(term), 6).alias("log_ratio"),
        )
    )
