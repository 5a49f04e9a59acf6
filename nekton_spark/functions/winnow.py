"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm; public paper).

Why another dedup primitive: the exact-substring family here
(``text_analysis.remove_repeated_spans``, ``dedup.ngram_jaccard_pairs``
with ``candidates='all'``) indexes EVERY token n-gram — one inverted
row per gram occurrence, O(tokens) join input per document. Winnowing
selects a guaranteed-density subset instead: hash every k-gram, slide
a window of w consecutive hashes, keep the minimum of each window
(rightmost on ties). The two theorems that make it the 100 TB choice:

- **guarantee**: any substring match of at least t = w + k - 1 tokens
  shares at least one selected fingerprint (no false negatives above
  the noise threshold), and
- **density**: the expected selected fraction is 2/(w+1) of positions
  — the inverted index is ~w/2× smaller than all-grams BEFORE any
  df-cut, with the same equi-join pair-mining shape after it.

The reference engine (an 11-operator byte-stream pipeline,
``src/processors.rs``) has nothing in this family; this extends the
dedup layer of SURVEY §2.5.

Everything is JVM-side Catalyst expressions (array HOFs — no Python
anywhere) over the shared ``hash60`` so the DuckDB oracle replays it
exactly: grams and window minima are order-deterministic integer/list
operations, and the rightmost-min tie rule is expressed as
``array_position(reverse(window), min)`` identically in both engines.

Scale shape: fingerprint selection is MAP-ONLY per document (one
projection, no shuffle). Pair mining is the standard inverted-index
plan: explode distinct fingerprints (≈ 2·tokens/(w+1) rows/doc),
df-cut the globally hot fingerprints (boilerplate — MOSS does the
same), equi-join on the 8-byte hash, count shared per pair. Nothing
is all-pairs; the hottest join key is bounded by ``max_doc_freq``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..materialize import materialize

from nekton_spark.functions.hashing import hash60
from nekton_spark.functions.text_analysis import token_count
from nekton_spark.functions.text_analysis import tokenize as _tokenize

WINNOW_SALT = 5200


def _gram_hashes(toks: Column, n_tokens: Column, k: int) -> Column:
    """Array of hash60(k-gram) in position order; empty when the doc
    has fewer than k tokens."""
    grams = F.transform(
        F.sequence(F.lit(0), n_tokens - k),
        lambda i: hash60(F.concat_ws(" ", F.slice(toks, i + 1, k)), WINNOW_SALT),
    )
    return F.when(n_tokens >= k, grams).otherwise(
        F.array().cast("array<bigint>")
    )


def _select_fingerprints(h: Column, w: int) -> Column:
    """Winnowing selection over a gram-hash array: for each window of
    ``w`` consecutive hashes keep (pos, fp) of the minimum, rightmost
    occurrence on ties; duplicates collapse (the classic "record each
    selection once" rule). Documents with fewer grams than ``w`` are
    one whole-array window (shorter than the guarantee threshold, but
    short docs still fingerprint). Positions are 1-based gram indexes."""
    m = F.size(h)
    wlen = F.least(F.lit(w), m)

    def one_window(j: Column) -> Column:
        s = F.slice(h, j + 1, wlen)
        mn = F.array_min(s)
        # rightmost occurrence of mn inside the window: first position
        # in the reversed slice, mapped back to a global gram index.
        rpos = j + wlen + 1 - F.array_position(F.reverse(s), mn)
        return F.struct(rpos.cast("int").alias("pos"), mn.alias("fp"))

    sel = F.array_distinct(
        F.transform(F.sequence(F.lit(0), m - wlen), one_window)
    )
    return F.when(m > 0, sel).otherwise(
        F.array().cast("array<struct<pos:int,fp:bigint>>")
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
    tokenize: str = "word",
) -> DataFrame:
    """One row per selected fingerprint: (doc_id, pos, fp). Map-only —
    tokenize, hash the k-grams, winnow — no shuffle; empty/short docs
    simply emit no rows.

    The intermediate token and gram-hash ARRAYS are pinned behind
    ``explode(array(...))`` Generate barriers: CollapseProject would
    otherwise inline the producing expression into the consuming
    lambda, re-running the split per GRAM and the full md5 gram array
    per WINDOW — O(n²) per document (the same interpreted-HOF trap the
    lang_id expression path hit; measured here as 133 s for 500 docs
    vs <2 s with the barriers). A Generate's output attribute cannot
    be collapsed into, so each stage evaluates exactly once per row
    while the whole chain stays one narrow (shuffle-free) pipeline."""
    toks_n = F.struct(
        _tokenize(F.col(text_col), tokenize).alias("toks"),
        token_count(F.col(text_col), tokenize).alias("n"),
    )
    s1 = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array(toks_n)).alias("t"),
    )
    h = _gram_hashes(F.col("t.toks"), F.col("t.n"), k)
    s2 = s1.select("doc_id", F.explode(F.array(h)).alias("h"))
    return s2.select(
        "doc_id", F.explode(_select_fingerprints(F.col("h"), w)).alias("s")
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp"))


def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_doc_freq: int = 50,
    tokenize: str = "word",
) -> DataFrame:
    """Document pairs sharing winnowed fingerprints — the MOSS report:
    (id_a, id_b, n_shared, overlap) with id_a < id_b, ``n_shared`` =
    distinct shared fingerprint VALUES and ``overlap`` = n_shared /
    min(|fp_a|, |fp_b|) (round-6 terminal float, the repo's standard
    contract). By the winnowing guarantee, any pair sharing a passage
    of ≥ w+k-1 tokens appears here (unless the fingerprint was df-cut
    as corpus boilerplate — the same contract MOSS applies to shared
    templates).

    Plan: distinct (doc, fp) inverted index (selection already
    collapsed positions; DISTINCT here collapses a value selected at
    several positions of the same doc), df-cut fingerprints present in
    more than ``max_doc_freq`` docs via broadcast anti-join, 8-byte
    equi-join, per-pair count. Σ df² over SURVIVING fingerprints
    bounds the join fan-out at any corpus size."""
    from nekton_spark.functions.similarity import ensure_parallelism

    fp = (
        # fan out BELOW the fingerprint projection: a small corpus reads
        # as one parquet split, and the winnow expression chain (gram
        # hashing + window minima) is the heavy stage — repartitioning
        # its OUTPUT would run it on one task and then shuffle the
        # result (measured 1.9 s single-task vs 0.55 s fanned at sf0.1)
        winnow_fingerprints(ensure_parallelism(df), text_col, id_col, k, w, tokenize)
        .select("doc_id", "fp")
        .distinct()
        # feeds the df-cut, the sizes aggregate, and both join sides —
        # materialize once instead of re-winnowing four times.
        .transform(materialize)
    )
    hot = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_doc_freq)
        .select("fp")
    )
    inv = fp.join(F.broadcast(hot), "fp", "left_anti")
    sizes = inv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = inv.alias("a"), inv.alias("b")
    shared = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    return (
        shared.join(sa, F.col("id_a") == F.col("sa.doc_id"))
        .join(sb, F.col("id_b") == F.col("sb.doc_id"))
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / F.least(F.col("sa.sz"), F.col("sb.sz")),
                6,
            ).alias("overlap"),
        )
    )
