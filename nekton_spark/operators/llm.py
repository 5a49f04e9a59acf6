"""Spec (YAML) surface for the LLM-data-pipeline operators.

Everything in functions/ is also addressable from a pipeline spec, so
a user can run e.g.::

    input:
      type: table
      path: /root/testdata/sf0.01
      name: documents
    pipeline:
      processors:
        - type: quality_filter
          min_quality: 0.5
        - type: dedup_minhash
          threshold: 0.8
    output:
      type: file
      path: /out
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import dedup as dd
from ..functions import similarity as sim
from ..functions import text_analysis as ta
from ..registry import register_processor


@register_processor("text_stats")
def text_stats_processor(df: DataFrame, text_col: str = "text") -> DataFrame:
    return ta.with_text_stats(df, text_col)


@register_processor("quality_filter")
def quality_filter(df: DataFrame, text_col: str = "text", min_quality: float = 0.5) -> DataFrame:
    return df.filter(ta.quality_score(F.col(text_col)) >= min_quality)


@register_processor("lang_filter")
def lang_filter(df: DataFrame, langs: list[str], text_col: str = "text") -> DataFrame:
    return df.filter(ta.lang_id(F.col(text_col)).isin(langs))


@register_processor("token_count")
def token_count_processor(df: DataFrame, text_col: str = "text", bpe: bool = False) -> DataFrame:
    fn = ta.bpe_token_count if bpe else ta.token_count
    return df.withColumn("n_tokens", fn(F.col(text_col)))


@register_processor("bpe_encode")
def bpe_encode_processor(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int | None = None,
    merges: list | None = None,
) -> DataFrame:
    """Trained-BPE token ids per doc (functions/bpe.py): apply the
    frozen STD_MERGES table, a user-supplied ``merges`` list of
    [left, right] pairs, or train ``n_merges`` fresh merges on the
    input corpus first."""
    from ..functions.bpe import STD_MERGES, bpe_encode, train_bpe

    if merges is not None:
        table = [tuple(p) for p in merges]
    elif n_merges is not None:
        table = train_bpe(df, n_merges=n_merges, text_col=text_col)
    else:
        table = STD_MERGES
    return df.join(bpe_encode(df, table, text_col, id_col), id_col)


@register_processor("fingerprint")
def fingerprint_processor(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fp", ta.fingerprint(F.col(text_col)))


@register_processor("dedup_exact")
def dedup_exact_processor(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", keep_rows: bool = True
) -> DataFrame:
    """keep_rows=True → survivors (full rows); False → group summary."""
    groups = dd.exact_dedup(df, text_col, id_col)
    if not keep_rows:
        return groups
    return df.join(
        groups.select(F.col("keep_id").alias(id_col)), on=id_col, how="left_semi"
    )


@register_processor("dedup_minhash")
def dedup_minhash_processor(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    keep_rows: bool = True,
    **kw,
) -> DataFrame:
    """keep_rows=True → drop the higher-id member of each near-dup pair."""
    pairs = dd.minhash_lsh_pairs(df, text_col, id_col, threshold=threshold, **kw)
    if not keep_rows:
        return pairs
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


@register_processor("dedup_simhash")
def dedup_simhash_processor(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return dd.simhash_dedup(df, text_col, id_col)


@register_processor("ngram_jaccard")
def ngram_jaccard_processor(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    tokenize: str = "word",
) -> DataFrame:
    return dd.ngram_jaccard_pairs(
        df, text_col, id_col, n, threshold, tokenize=tokenize
    )


def _select_queries(df: DataFrame, query_ids, id_col: str) -> DataFrame:
    """Query-row selection shared by the ANN processors: absent/None →
    every row is a query; a non-empty list filters to those ids; an
    explicitly EMPTY list REFUSES (r11 ADVICE) — ``query_ids: []`` is
    a spec typo, and treating it as 'no filter' silently fans the
    whole frame out as queries against the corpus."""
    if query_ids is None:
        return df
    if len(query_ids) == 0:
        raise ValueError(
            "query_ids: [] selects no queries; omit the key to query "
            "every row (refuse rather than fan out the whole frame)"
        )
    return df.filter(F.col(id_col).isin(query_ids))


@register_processor("ann_topk")
def ann_topk_processor(
    df: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    method: str = "brute",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kw,
) -> DataFrame:
    q = _select_queries(df, query_ids, id_col)
    fn = {
        "brute": sim.brute_force_topk,
        "lsh": sim.lsh_topk,
        "ivf": sim.ivf_topk,
        "pq": sim.pq_topk,
        "pq_rerank": sim.pq_topk_rerank,
        "ivfpq": sim.ivfpq_topk,
        "ivfpq_residual": sim.ivfpq_residual_topk,
    }.get(method)
    if fn is None:
        raise ValueError(
            f"unknown ann method: {method!r} "
            "(brute|lsh|ivf|pq|pq_rerank|ivfpq|ivfpq_residual)"
        )
    return fn(df, q, k=k, id_col=id_col, vec_col=vec_col, **kw)


@register_processor("ann_index_query")
def ann_index_query_processor(
    df: DataFrame,
    path: str,
    query_ids: list[int] | None = None,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a PERSISTED IVF-PQ index (built by the ``ann_index`` sink
    or similarity.ivfpq_index_build) with rows of ``df`` as queries —
    the build-once/query-many half of the ann_topk surface."""
    q = _select_queries(df, query_ids, id_col)
    return sim.ivfpq_index_query(
        df.sparkSession, path, q, k=k, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col,
    )


@register_processor("decode_media")
def decode_media_processor(df: DataFrame, kind: str = "image", **kw) -> DataFrame:
    """Real codecs, all from public specs with no codec library: PNG
    (zlib), baseline JPEG incl. 4:4:4 color (T.81), WAV (wave), MJPEG
    AVI video (RIFF walk + per-frame JPEG); see
    functions/multimodal.py and functions/video.py."""
    from ..functions import multimodal as mm

    if kind == "image":
        return mm.decode_image(df, **kw)
    if kind == "audio":
        return mm.decode_audio(df, **kw)
    if kind == "video":
        return mm.frame_sample(df, **kw)
    raise ValueError(f"unknown media kind: {kind!r} (image|audio|video)")


@register_processor("decode_coverage")
def decode_coverage_processor(
    df: DataFrame, media_col: str = "media", rollup: bool = False
) -> DataFrame:
    """Decode-coverage telemetry (functions/multimodal.decode_coverage,
    r12): annotate each media row with (decode_status, decode_reason)
    from a real decode attempt — or, with ``rollup: true``, return the
    corpus-level (status, reason, n) counter relation a 100 TB run
    reads to see what fraction of its media the codec envelope decodes
    and why the rest refused."""
    from ..functions.multimodal import decode_coverage as _cov

    per = _cov(df, media_col=media_col)
    if not rollup:
        return per
    return per.groupBy("decode_status", "decode_reason").agg(
        F.count(F.lit(1)).alias("n")
    )


@register_processor("embedding_near_dup")
def embedding_near_dup_processor(df: DataFrame, threshold: float = 0.95, **kw) -> DataFrame:
    return sim.embedding_near_dup(df, threshold=threshold, **kw)


@register_processor("decontaminate")
def decontaminate_processor(
    df: DataFrame,
    eval_path: str,
    eval_name: str = "documents",
    eval_filter: str | None = None,
    n: int = 8,
    min_shared: int = 1,
    **kw,
) -> DataFrame:
    """Drop rows sharing a distinct word n-gram with an eval table
    (functions/decontaminate.py); ``eval_filter`` is a SQL predicate
    selecting the eval subset."""
    from ..functions.decontaminate import decontaminate as _dec

    spark = df.sparkSession
    ev = spark.read.parquet(f"{eval_path}/{eval_name}.parquet")
    if eval_filter:
        ev = ev.filter(eval_filter)
    return _dec(df, ev, n=n, min_shared=min_shared, **kw)


@register_processor("pack_sequences")
def pack_sequences_processor(df: DataFrame, budget: int = 2048, n_shards: int = 32, **kw) -> DataFrame:
    from ..functions.packing import pack_sequences as _pack

    return _pack(df, budget=budget, n_shards=n_shards, **kw)


@register_processor("redact_pii")
def redact_pii_processor(df: DataFrame, text_col: str = "text", counts: bool = False) -> DataFrame:
    """Scrub emails / NANP phones / E.164 international numbers /
    IPv4s / IBANs in place (<EMAIL>/<PHONE>/<E164>/<IPV4>/<IBAN>
    tokens); counts=True adds per-kind pre-redaction match counts."""
    # engine-wide NULL=empty-document contract applied HERE (the user
    # surface): without the coalesce a NULL-text doc gets NULL counts
    # (a `n_email = 0` clean-set filter would silently drop it) and a
    # NULL redacted text
    c = F.coalesce(F.col(text_col), F.lit(""))
    out = df
    if counts:
        for kind in ta.PII_PATTERNS:
            out = out.withColumn(f"n_{kind}", ta.pii_count(c, kind))
    return out.withColumn(text_col, ta.redact_pii(c))


@register_processor("common_passages")
def common_passages_processor(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 5,
    max_passages: int = 1000,
) -> DataFrame:
    """Cross-doc repeated-passage audit (boilerplate / contamination)."""
    return ta.common_passages(df, text_col, id_col, n, min_docs, max_passages)


@register_processor("repetition_filter")
def repetition_filter_processor(
    df: DataFrame, text_col: str = "text", n: int = 3, max_dup_fraction: float = 0.5
) -> DataFrame:
    """Drop docs whose duplicate-n-gram fraction exceeds the bound
    (Gopher-style intra-doc repetition rule)."""
    return df.filter(ta.dup_ngram_fraction(F.col(text_col), n) <= max_dup_fraction)


@register_processor("top_tokens")
def top_tokens_processor(df: DataFrame, k: int = 50, text_col: str = "text") -> DataFrame:
    return ta.top_tokens(df, k=k, text_col=text_col)


@register_processor("tier_rollup")
def tier_rollup_processor(df: DataFrame, tiers: list[str], **kw) -> DataFrame:
    from ..functions.timetiers import time_tier_rollup

    return time_tier_rollup(df, tiers, **kw)


@register_processor("latest_by_key")
def latest_by_key_processor(
    df: DataFrame, key: str, order_by: list[str], carry: list[str]
) -> DataFrame:
    """Latest record per key by the (codegen'd) struct ordering —
    the CDC/upsert staple as a spec tag."""
    ordering = F.struct(*[F.col(c) for c in order_by])
    payload = F.struct(*[F.col(c).alias(c) for c in carry])
    out = df.groupBy(key).agg(F.max_by(payload, ordering).alias("_last"))
    return out.select(key, *[F.col(f"_last.{c}").alias(c) for c in carry])


@register_processor("remove_boilerplate")
def remove_boilerplate_processor(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 5,
    sep: str = "\n",
) -> DataFrame:
    """Strip lines appearing in >= min_docs distinct docs (C4/RefinedWeb
    line dedup) — the write-side of the common_passages audit."""
    return ta.remove_boilerplate_lines(df, text_col, id_col, min_docs, sep)


@register_processor("dedup_lines")
def dedup_lines_processor(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide exact line dedup, KEEP-FIRST rule (C4 §2.2 /
    RefinedWeb): every later occurrence of a duplicated line — across
    documents or within one — is removed; the globally-first survives.
    Contrast `remove_boilerplate`, which strips every occurrence."""
    return ta.dedup_lines_keep_first(df, text_col, id_col, min_count, sep)


@register_processor("remove_repeated_spans")
def remove_repeated_spans_processor(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-doc exact-substring span removal (Lee et al. 2021 as a
    fixed-window n-gram variant): an n-token window in >= min_docs
    distinct docs is stripped everywhere except the smallest-id doc;
    overlapping windows union so longer repeats strip whole."""
    return ta.remove_repeated_spans(df, text_col, id_col, n, min_docs)


@register_processor("classifier_score")
def classifier_score_processor(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", seed: int = 4100
) -> DataFrame:
    """Linear bag-of-words quality-classifier scoring (placeholder hash
    weights from the spec path; trained weights are a Python-API
    concern — they need a weights DataFrame)."""
    return ta.classifier_score(df, None, text_col, id_col, seed)


@register_processor("lang_id")
def lang_id_processor(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "trained",
) -> DataFrame:
    """Annotate each row with a ``lang`` column. ``method: trained``
    (default) runs the char-trigram NB model
    (functions/langid_model.py — broadcast weights, one pivot shuffle,
    then an id-keyed join back onto the frame); ``method: profile``
    keeps the zero-shuffle stopword heuristic for when a map-only plan
    matters more than zh/short-text accuracy."""
    if method == "profile":
        return df.withColumn("lang", ta.lang_id(F.col(text_col)))
    if method != "trained":
        raise ValueError(f"lang_id method must be trained|profile, got {method!r}")
    from nekton_spark.functions.langid_model import lang_id_annotate

    # map-only annotate (NOT score+self-join: that shape is a
    # stream-stream join on a streaming input and a pointless shuffle
    # on a batch one); replaces any existing `lang` column
    return lang_id_annotate(df, text_col)


@register_processor("dsir")
def dsir_processor(
    df: DataFrame,
    target_where: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    min_log_ratio: float | None = None,
) -> DataFrame:
    """DSIR importance scoring from the spec path: ``target_where`` is
    a SQL predicate naming the in-frame target split (e.g.
    ``source IN ('wiki')``); every NON-target row is scored with
    sampling.dsir_importance and annotated with (n_feats, log_ratio).
    With ``min_log_ratio`` the processor also applies the selection
    threshold — the resampling step as a filter. Rows with no tokens
    are dropped (no features ⇒ no score), like the Python API."""
    from nekton_spark.functions.sampling import dsir_importance

    cond = F.expr(target_where)
    scores = dsir_importance(
        df.filter(~cond), df.filter(cond), n_buckets, text_col, id_col
    ).select(F.col("doc_id").alias(id_col), "n_feats", "log_ratio")
    out = df.filter(~cond).join(scores, id_col)
    if min_log_ratio is not None:
        out = out.filter(F.col("log_ratio") >= float(min_log_ratio))
    return out


@register_processor("fuzzy_decontaminate")
def fuzzy_decontaminate_processor(
    df: DataFrame,
    eval_path: str,
    eval_table: str = "documents",
    threshold: float = 0.5,
    k: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash: str = "xxhash64",
    exclude_same_id: bool = False,
    tokenize: str = "word",
) -> DataFrame:
    """Drop training docs near-duplicating any eval doc (banded MinHash
    across frames; eval side read from eval_path/eval_table). The spec
    default is the pure-JVM xxhash64 engine. ``exclude_same_id: true``
    is the shared-corpus harness mode (train and eval carved from one
    id space — a row is not its own leak); leave it false when the id
    spaces are unrelated."""
    from ..functions.decontaminate import fuzzy_decontaminate
    from ..sources.files import table_source

    ev = table_source(df.sparkSession, eval_path, eval_table)
    return fuzzy_decontaminate(
        df, ev, k, bands, shingle_n, threshold, id_col, text_col, hash,
        exclude_same_id, tokenize,
    )


@register_processor("length_histogram")
def length_histogram_processor(
    df: DataFrame, bin_width: int = 50, text_col: str = "text"
) -> DataFrame:
    return ta.token_length_histogram(df, bin_width, text_col)


@register_processor("semdedup")
def semdedup_processor(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int | None = None,
    tau: float = 0.9,
    drop: bool = False,
) -> DataFrame:
    """SemDeDup semantic dedup over an embedding column; drop=True
    anti-joins the duplicates away instead of flagging them."""
    from ..functions.clustering import semdedup as _sd

    flags = _sd(df, vec_col, id_col, k=k, tau=tau)
    if not drop:
        return flags
    keep = flags.filter(F.col("is_dup") == 0).select(id_col)
    return df.join(keep, id_col, "left_semi")


@register_processor("curriculum")
def curriculum_processor(
    df: DataFrame, n_buckets: int = 4, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Quality-curriculum ntile assignment (bucket 1 = best)."""
    return ta.curriculum_buckets(df, n_buckets, id_col, text_col)


@register_processor("normalize_text")
def normalize_text_processor(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
    lowercase: bool = True,
    collapse_ws: bool = True,
) -> DataFrame:
    """Unicode NFC + lowercase + whitespace collapse — dedup prep."""
    return ta.normalize_text(df, text_col, out_col, "NFC", lowercase, collapse_ws)


@register_processor("tfidf_top_terms")
def tfidf_top_terms_processor(
    df: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document top-k TF-IDF terms (add-one-smoothed ln idf)."""
    return ta.tfidf_top_terms(df, k, id_col, text_col)


@register_processor("bm25")
def bm25_processor(
    df: DataFrame,
    queries: dict[int, str] | None = None,
    queries_path: str | None = None,
    queries_table: str = "queries",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenize: str = "word",
) -> DataFrame:
    """Okapi BM25 top-k retrieval. Queries come inline from the spec
    (``queries: {1: "alpha beta", ...}``) or from a parquet table at
    ``queries_path`` with (query_id, query_text) columns."""
    if queries:
        qdf = df.sparkSession.createDataFrame(
            [(int(i), q) for i, q in queries.items()],
            "query_id long, query_text string",
        )
    elif queries_path:
        from ..sources.files import table_source

        qdf = table_source(df.sparkSession, queries_path, queries_table)
    else:
        raise ValueError("bm25 needs either `queries` or `queries_path`")
    return ta.bm25_topk(df, qdf, k, k1, b, id_col, text_col, tokenize=tokenize)


@register_processor("chunk")
def chunk_processor(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "whitespace",
) -> DataFrame:
    """RAG sliding-window chunking: one output row per token window."""
    return ta.chunk_documents(
        df, chunk_tokens, overlap, id_col, text_col, tokenizer
    )


@register_processor("bpe_merges")
def bpe_merges_processor(df: DataFrame, k: int = 50, text_col: str = "text") -> DataFrame:
    """First-round BPE merge candidates (top-k adjacent char pairs)."""
    return ta.bpe_merge_candidates(df, k, text_col)


@register_processor("bloom_decontaminate")
def bloom_decontaminate_processor(
    df: DataFrame,
    eval_path: str,
    eval_table: str = "documents",
    n: int = 8,
    m_bits: int | None = None,
    k_hashes: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    verify_exact: bool = True,
    tokenize: str = "word",
) -> DataFrame:
    """Bloom-gated exact-n-gram decontamination: drop training docs
    sharing an n-gram with the eval corpus at ``eval_path`` (the
    broadcast side is the filter's set-bit relation — bounded at any
    eval size)."""
    from ..functions.decontaminate import bloom_decontaminate
    from ..sources.files import table_source

    ev = table_source(df.sparkSession, eval_path, eval_table)
    return bloom_decontaminate(
        df, ev, n, m_bits, k_hashes, id_col, text_col, verify_exact, tokenize
    )


@register_processor("weighted_sample")
def weighted_sample_processor(
    df: DataFrame, key_col: str, weight_col: str, k: int, seed: int = 42
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    content-addressed keys; plan is map + TakeOrderedAndProject)."""
    from ..functions.sampling import weighted_sample

    return weighted_sample(df, key_col, weight_col, k, seed)


@register_processor("quota_sample")
def quota_sample_processor(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    order_col: str,
    key_col: str,
    descending: bool = True,
) -> DataFrame:
    """At most k rows per group, best-first with deterministic ties —
    the per-source share cap."""
    from ..functions.sampling import quota_sample

    return quota_sample(df, group_cols, k, order_col, key_col, descending)


@register_processor("drift")
def drift_processor(
    df: DataFrame,
    other: dict,
    numeric_cols: list[str] | None = None,
    category_col: str | None = None,
    bins: int = 10,
) -> DataFrame:
    """Snapshot drift report: df = the OLD snapshot, ``other`` (the
    nested input/processors block, same shape as asof_join's) = the
    NEW one. ``numeric_cols`` → PSI report rows; ``category_col`` →
    per-value share rows (exactly one of the two)."""
    from ..functions.validation import category_drift, drift_report
    from .relational import _resolve_other

    new = _resolve_other(df, other)
    if (numeric_cols is None) == (category_col is None):
        raise ValueError("pass exactly one of numeric_cols / category_col")
    if numeric_cols:
        return drift_report(df, new, numeric_cols, bins)
    return category_drift(df, new, category_col)


@register_processor("mixture_sample")
def mixture_sample_processor(
    df: DataFrame,
    targets: dict[str, float],
    budget_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """Token-proportional source mixing: sample each source toward
    targets[source] share of budget_tokens (rate caps at 1)."""
    from ..functions.sampling import mixture_sample

    return mixture_sample(
        df, targets, budget_tokens, source_col, id_col, text_col, seed
    )


@register_processor("stratified_sample")
def stratified_sample_processor(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic hash rates (language rebalancing);
    strata absent from ``rates`` are dropped."""
    from ..functions.sampling import stratified_hash_sample

    return stratified_hash_sample(df, key_col, stratum_col, rates, seed)


@register_processor("heavy_hitters")
def heavy_hitters_processor(
    df: DataFrame,
    k: int = 40,
    text_col: str = "text",
    width: int | None = None,
    depth: int | None = None,
) -> DataFrame:
    """Count-Min Sketch frequent tokens (functions/sketches.py):
    top-k by estimated count with the true count alongside — the
    bounded-shuffle alternative to top_tokens at crawl scale."""
    from ..functions import sketches as sk

    return sk.cms_heavy_hitters(
        df,
        text_col=text_col,
        k=k,
        width=width or sk.CMS_WIDTH,
        depth=depth or sk.CMS_DEPTH,
    )


@register_processor("pca")
def pca_processor(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_components: int = 2,
) -> DataFrame:
    """Deterministic distributed PCA (functions/pca.py): project each
    embedding onto the top principal components."""
    from ..functions.pca import embedding_pca

    return embedding_pca(
        df, vec_col=vec_col, id_col=id_col, dim=dim, n_components=n_components
    )


@register_processor("dedup_keep_best")
def dedup_keep_best_processor(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    drop: bool = False,
) -> DataFrame:
    """Quality-policy near-dup resolution: mine n-gram Jaccard pairs,
    resolve clusters, keep the highest-quality member of each
    (functions/graph.keep_best_per_component). drop=True filters the
    frame down to the keepers (all columns preserved); default flags
    (id, component, quality, keep)."""
    from ..functions.graph import keep_best_per_component

    flags = keep_best_per_component(
        df,
        dd.ngram_jaccard_pairs(df, text_col, id_col, n, threshold),
        ta.quality_score(F.col(text_col)),
        id_col=id_col,
    )
    if not drop:
        return flags
    keepers = flags.filter(F.col("keep")).select(id_col)
    return df.join(keepers, id_col, "left_semi")


@register_processor("dedup_winnow")
def dedup_winnow_processor(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_doc_freq: int = 50,
    tokenize: str = "word",
) -> DataFrame:
    """Winnowing fingerprint near-dup pairs (functions/winnow.py —
    Schleimer et al. 2003 / MOSS): density-bounded fingerprint
    selection, df-cut inverted-index pair mining. Guarantees any
    shared passage of >= w+k-1 tokens is caught."""
    from ..functions.winnow import winnow_pairs

    return winnow_pairs(
        df, text_col, id_col, k=k, w=w,
        min_shared=min_shared, max_doc_freq=max_doc_freq,
        tokenize=tokenize,
    )


@register_processor("embedding_outliers")
def embedding_outliers_processor(
    df: DataFrame,
    k: int = 25,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Centroid-distance outlier detection (functions/outliers.py):
    top-k vectors farthest from the corpus centroid — the curation
    complement of near-dup pruning."""
    from ..functions.outliers import embedding_outliers

    return embedding_outliers(df, vec_col=vec_col, id_col=id_col, k=k, dim=dim)


@register_processor("mmr")
def mmr_processor(
    df: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    c: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """MMR diverse top-k (functions/similarity.py:mmr_topk —
    Carbonell & Goldstein 1998): redundancy-penalized greedy re-rank
    of the top-c relevance candidates."""
    q = _select_queries(df, query_ids, id_col)
    return sim.mmr_topk(
        df, q, k=k, c=c, lam=lam, id_col=id_col, vec_col=vec_col, dim=dim
    )


@register_processor("zorder_key")
def zorder_key_processor(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
) -> DataFrame:
    """Append the Morton/Z-order clustering key (functions/layout.py)
    — range-partition + sort on ``zv`` before writing so parquet
    row-group min/max boxes prune 2-D predicates."""
    from ..functions.layout import z_value

    return z_value(df, col_a, col_b, bits=bits)


@register_processor("zorder_key_n")
def zorder_key_n_processor(
    df: DataFrame,
    cols: list,
    bits: int | None = None,
) -> DataFrame:
    """N-column Morton clustering key (time × tenant × metric layouts):
    bit i of column j lands at i*k+j; per-column width auto-sized to
    62//k bits unless given."""
    from ..functions.layout import z_value_n

    return z_value_n(df, list(cols), bits=bits)


@register_processor("hilbert_key")
def hilbert_key_processor(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
) -> DataFrame:
    """Append the Hilbert clustering key (functions/layout.py) — the
    locality upgrade over zorder_key: no Morton seams, so row-group
    bounding boxes are tighter and 2-D predicates prune more."""
    from ..functions.layout import hilbert_value

    return hilbert_value(df, col_a, col_b, bits=bits)


@register_processor("html_extract")
def html_extract_processor(
    df: DataFrame, html_col: str = "html", text_col: str = "text"
) -> DataFrame:
    """HTML → text extraction (functions/html.py): all non-empty text
    blocks one-per-line plus n_blocks/text_chars/link_chars/
    link_density triage signals. The crawl-ingest front door —
    map-only, one Arrow crossing, no shuffle."""
    from ..functions.html import html_extract

    return html_extract(df, html_col=html_col, text_col=text_col)


@register_processor("html_to_markdown")
def html_to_markdown_processor(
    df: DataFrame, html_col: str = "html", out_col: str = "markdown"
) -> DataFrame:
    """Structure-preserving HTML → Markdown (functions/html.py, r13):
    headings, lists, links, emphasis, code fences and blockquotes
    survive into the training text instead of flattening away — the
    extraction mode modern pretraining corpora keep. Map-only, one
    Arrow crossing."""
    from ..functions.html import html_to_markdown

    return html_to_markdown(df, html_col=html_col, out_col=out_col)


@register_processor("html_jsonld")
def html_jsonld_processor(
    df: DataFrame, html_col: str = "html"
) -> DataFrame:
    """Provenance/compliance metadata from embedded JSON-LD
    (functions/html.py, r13): @type inventory, license, datePublished,
    author + block counts — the schema.org signals a compliant corpus
    keeps per page. Map-only, one Arrow crossing."""
    from ..functions.html import html_jsonld

    return html_jsonld(df, html_col=html_col)


@register_processor("html_main_text")
def html_main_text_processor(
    df: DataFrame,
    html_col: str = "html",
    text_col: str = "main_text",
    max_link_density: float = 0.5,
    min_block_chars: int = 2,
) -> DataFrame:
    """Boilerplate-aware main-text selection (jusText-lite block
    heuristic): drop link-dense and too-short blocks, keep body
    prose; n_kept/n_dropped let a corpus rollup watch the keep rate."""
    from ..functions.html import html_main_text

    return html_main_text(
        df,
        html_col=html_col,
        text_col=text_col,
        max_link_density=max_link_density,
        min_block_chars=min_block_chars,
    )


@register_processor("url_keys")
def url_keys_processor(
    df: DataFrame,
    url_col: str = "url",
    norm_col: str = "norm_url",
    domain_col: str = "domain",
) -> DataFrame:
    """Attach the URL dedup keys (functions/urls.py): canonical
    spelling + registered domain (eTLD+1). Pure codegen, map-only."""
    from ..functions.urls import with_url_keys

    return with_url_keys(df, url_col, norm_col, domain_col)


@register_processor("domain_rollup")
def domain_rollup_processor(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registered-domain URL/page inventory — the input to domain
    quotas and per-domain caps. One shuffle on the domain key."""
    from ..functions.urls import domain_rollup

    return domain_rollup(df, url_col)


@register_processor("domain_quota")
def domain_quota_processor(
    df: DataFrame,
    url_col: str = "url",
    max_per_domain: int = 1000,
    priority_col: str | None = None,
) -> DataFrame:
    """Cap pages per registered domain (urls.domain_quota, r13):
    quality-first when ``priority_col`` is given, else a deterministic
    uniform hash sample of each domain's pages. One domain-key
    shuffle + rank window, no global sort."""
    from ..functions.urls import domain_quota

    return domain_quota(df, url_col, max_per_domain, priority_col)


@register_processor("warc_records")
def warc_records_processor(
    df: DataFrame, payload_col: str = "payload", media: bool = False
) -> DataFrame:
    """Explode WARC bytes (plain or .warc.gz) into one row per record
    with the HTTP response layer unwrapped (functions/warc.py) — the
    step between media_files ingestion of a crawl dump and
    html_extract. ``media: true`` reads the payload out of the media
    struct the media_files source produces."""
    from ..functions.warc import warc_records

    if media:
        df = df.withColumn("_warc_payload", F.col("media.payload"))
        return warc_records(df, "_warc_payload").drop("media")
    return warc_records(df, payload_col)


@register_processor("pdf_extract")
def pdf_extract_processor(
    df: DataFrame, payload_col: str = "payload", media: bool = False
) -> DataFrame:
    """PDF → one row per page of extracted text + metadata
    (functions/pdf.py, r13 — ISO 32000 subset; per-row reason-coded
    refusal, never mojibake). ``media: true`` reads the payload out of
    the media struct the media_files source produces."""
    from ..functions.pdf import pdf_extract

    if media:
        df = df.withColumn("_pdf_payload", F.col("media.payload"))
        keep = [c for c in df.columns if c not in ("media", "_pdf_payload")]
        return pdf_extract(df, "_pdf_payload", keep_cols=keep)
    return pdf_extract(df, payload_col)


@register_processor("pdf_images")
def pdf_images_processor(
    df: DataFrame, payload_col: str = "payload", media: bool = False
) -> DataFrame:
    """PDF → one row per embedded image XObject as a standard media
    struct (functions/pdf.py, r15 — DCTDecode hands JPEG bytes
    through, Flate rasters re-wrap losslessly as BMP, CCITT/JBIG2/JPX
    refuse reason-coded, per-image isolation). Chains straight into
    decode_image / image_dhash: the multimodal loop for document
    corpora. ``media: true`` reads the payload out of the media
    struct the media_files source produces."""
    from ..functions.pdf import pdf_images

    if media:
        df = df.withColumn("_pdf_payload", F.col("media.payload"))
        keep = [c for c in df.columns if c not in ("media", "_pdf_payload")]
        return pdf_images(df, "_pdf_payload", keep_cols=keep)
    return pdf_images(df, payload_col)


@register_processor("extract_documents")
def extract_documents_processor(
    df: DataFrame, media_col: str = "media"
) -> DataFrame:
    """Mixed-format ingest router (functions/documents.py, r13):
    route each media row by mime to the PDF / DOCX / HTML / plain-text
    extractor in one Arrow pass, landing on the normalized
    (doc_format, unit_no, n_units, title, text, refusal) schema —
    point media_files at a mixed directory and get text rows."""
    from ..functions.documents import extract_documents

    keep = [c for c in df.columns if c != media_col]
    return extract_documents(df, media_col, keep_cols=keep)


@register_processor("docx_extract")
def docx_extract_processor(
    df: DataFrame, payload_col: str = "payload", media: bool = False
) -> DataFrame:
    """DOCX → text + title + paragraph count (functions/docx.py, r13
    — ECMA-376 WordprocessingML subset over the stdlib zip reader);
    per-row reason-coded refusal. ``media: true`` reads the payload
    out of the media struct."""
    from ..functions.docx import docx_extract

    if media:
        df = df.withColumn("_docx_payload", F.col("media.payload"))
        keep = [c for c in df.columns if c not in ("media", "_docx_payload")]
        return docx_extract(df, "_docx_payload", keep_cols=keep)
    return docx_extract(df, payload_col)


@register_processor("feed_entries")
def feed_entries_processor(
    df: DataFrame, payload_col: str = "payload", media: bool = False
) -> DataFrame:
    """RSS/Atom feed payloads → one row per entry (functions/feeds.py,
    r13): titles/links/dates/ids with CDATA and entity handling;
    refusals isolate per row reason-coded. ``media: true`` reads the
    payload out of the media struct."""
    from ..functions.feeds import feed_entries

    if media:
        df = df.withColumn("_feed_payload", F.col("media.payload"))
        keep = [c for c in df.columns if c not in ("media", "_feed_payload")]
        return feed_entries(df, "_feed_payload", keep_cols=keep)
    return feed_entries(df, payload_col)


@register_processor("sitemap_entries")
def sitemap_entries_processor(
    df: DataFrame, payload_col: str = "payload", media: bool = False
) -> DataFrame:
    """Sitemap payloads → one row per entry (functions/sitemap.py,
    r13): urlset urls / sitemapindex children (kind='sitemap') /
    plain-text lines; gzip inflates bounded; refusals isolate per row
    reason-coded. ``media: true`` reads the payload out of the media
    struct."""
    from ..functions.sitemap import sitemap_entries

    if media:
        df = df.withColumn("_sm_payload", F.col("media.payload"))
        keep = [c for c in df.columns if c not in ("media", "_sm_payload")]
        return sitemap_entries(df, "_sm_payload", keep_cols=keep)
    return sitemap_entries(df, payload_col)


@register_processor("crawl_coverage")
def crawl_coverage_processor(
    df: DataFrame, payload_col: str = "warc", media: bool = False
) -> DataFrame:
    """Crawl-ingest coverage rollup (functions/warc.crawl_coverage,
    r13 — the front-end mirror of decode_coverage): WARC framing +
    HTTP unwrap + charset decode over response records, rolled up to
    (stage, status, reason, n) so a 100 TB user reads what fraction of
    a crawl survives to text and why the rest refused. ``media: true``
    reads the payload out of the media struct the media_files source
    produces."""
    from ..functions.warc import crawl_coverage

    if media:
        df = df.withColumn("_warc_payload", F.col("media.payload"))
        return crawl_coverage(df, "_warc_payload")
    return crawl_coverage(df, payload_col)


@register_processor("image_dhash")
def image_dhash_processor(
    df: DataFrame,
    pixels_col: str = "pixels",
    h_col: str = "dec_height",
    w_col: str = "dec_width",
) -> DataFrame:
    """Attach the 64-bit perceptual dHash to decoded-image rows
    (functions/imagehash.py) — composes after decode_media /
    frame_sample. Map-only, one Arrow pass."""
    from ..functions.imagehash import image_dhash

    return image_dhash(df, pixels_col, h_col, w_col)


@register_processor("auto_orient")
def auto_orient_processor(
    df: DataFrame,
    pixels_col: str = "pixels",
    h_col: str = "dec_height",
    w_col: str = "dec_width",
    orient_col: str = "orientation",
) -> DataFrame:
    """Rotate/flip decoded pixels upright per EXIF orientation
    (functions/imagehash.auto_orient, r13) — compose media_exif →
    decode_media → auto_orient → image_dhash so camera-rotated
    re-shoots dedup at Hamming 0. Map-only Arrow pass."""
    from ..functions.imagehash import auto_orient

    return auto_orient(df, pixels_col, h_col, w_col, orient_col)


@register_processor("image_near_dup")
def image_near_dup_processor(
    df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = None,
    salt_tile: int | None = None,
) -> DataFrame:
    """Image near-dup pairs over decoded frames: banded dHash
    self-join + popcount verify; exact recall for max_hamming <=
    bands-1. ``max_bucket`` refuses hot cliques; ``salt_tile`` (r13)
    opts into completing them with the quadratic work tile-spread
    across the cluster, output unchanged."""
    from ..functions.imagehash import image_near_dup_pairs

    return image_near_dup_pairs(
        df, id_col=id_col, bands=bands, max_hamming=max_hamming,
        max_bucket=max_bucket, salt_tile=salt_tile,
    )


@register_processor("decode_body_text")
def decode_body_text_processor(
    df: DataFrame,
    body_col: str = "body",
    ct_col: str = "http_content_type",
    text_col: str = "html",
) -> DataFrame:
    """Charset-aware bytes → text for crawl bodies (functions/warc.py):
    BOM / HTTP header / meta sniffing, strict declared decode,
    UTF-8 → latin-1 fallback; NULL text + reason-coded charset on
    refusal. The step between warc_records and html_extract."""
    from ..functions.warc import decode_body_text

    return decode_body_text(df, body_col, ct_col, text_col)


@register_processor("html_meta")
def html_meta_processor(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Page-level metadata (functions/html.py): title, <html lang>,
    canonical link, robots noindex/nofollow — filter on noindex = 0
    for a directives-compliant corpus. Map-only Arrow pass."""
    from ..functions.html import html_meta

    return html_meta(df, html_col)


@register_processor("tar_records")
def tar_records_processor(
    df: DataFrame, payload_col: str = "payload", media: bool = False
) -> DataFrame:
    """Explode tar shard bytes into one row per member
    (functions/webdataset.py). media: true reads from the media
    struct the media_files source produces."""
    from ..functions.webdataset import tar_records

    if media:
        df = df.withColumn("_tar_payload", F.col("media.payload"))
        return tar_records(df, "_tar_payload").drop("media")
    return tar_records(df, payload_col)


@register_processor("webdataset_samples")
def webdataset_samples_processor(
    df: DataFrame, payload_col: str = "payload", media: bool = False
) -> DataFrame:
    """Explode WebDataset tar shards into one row per sample with an
    ext -> bytes map (members grouped under the first-dot key inside
    the shard pass, no shuffle)."""
    from ..functions.webdataset import webdataset_samples

    if media:
        df = df.withColumn("_tar_payload", F.col("media.payload"))
        return webdataset_samples(df, "_tar_payload").drop("media")
    return webdataset_samples(df, payload_col)


@register_processor("media_exif")
def media_exif_processor(df: DataFrame, media_col: str = "media") -> DataFrame:
    """EXIF columns for JPEG media (functions/exif.py): orientation,
    capture datetime, GPS presence + coordinates — triage before the
    privacy scrub. Map-only Arrow pass."""
    from ..functions.exif import media_exif

    return media_exif(df, media_col)


@register_processor("scrub_media_metadata")
def scrub_media_metadata_processor(
    df: DataFrame, media_col: str = "media"
) -> DataFrame:
    """Strip APPn/COM metadata (EXIF/XMP/comments — the PII-bearing
    segments) from JPEG payloads in place; decoded pixels are
    byte-identical by construction. scrubbed_bytes records shed
    metadata per row."""
    from ..functions.exif import scrub_media_metadata

    return scrub_media_metadata(df, media_col)


@register_processor("robots_filter")
def robots_filter_processor(
    df: DataFrame,
    robots_col: str = "robots_txt",
    path_col: str = "path",
    agent: str = "*",
    out_col: str = "robots_allowed",
) -> DataFrame:
    """RFC 9309 robots.txt verdict per row (functions/robots.py) —
    join the per-host robots relation (broadcast, host-cardinality)
    before this map; filter out_col = 1 for a compliant corpus."""
    from ..functions.robots import robots_filter

    return robots_filter(df, robots_col, path_col, agent, out_col)


@register_processor("split_sentences")
def split_sentences_processor(
    df: DataFrame, text_col: str = "text", out_col: str = "sentences"
) -> DataFrame:
    """Rule-based sentence segmentation
    (functions/text_analysis.split_sentences, r13): terminal
    punctuation + capital start, abbreviation-guarded; adds
    sentences array + n_sentences. Pure codegen, map-only."""
    from ..functions.text_analysis import split_sentences

    return split_sentences(df, text_col=text_col, out_col=out_col)
