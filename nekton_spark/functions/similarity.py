r"""Similarity search over embedding columns (SURVEY §2.5).

Two paths:

- :func:`brute_force_topk` — exact cosine top-k: broadcast the (small)
  query set against the corpus, score with codegen'd array expressions
  (``aggregate``/``zip_with`` — JVM-side, no Python), take top-k per
  query with a window. The *oracle* and the right answer whenever the
  query set is small: one broadcast, zero shuffles of the corpus, a
  partial top-k per partition then a tiny final top-k (Catalyst plans
  rank-filter windows with partial sort).
- :func:`lsh_topk` — the scale path: random-hyperplane LSH (sign-bit
  sketch) bucketing; candidates = corpus rows sharing a band with the
  query sketch; exact cosine re-rank inside candidates only. At 100 TB
  the corpus is hashed once (map-only), bucketed (one shuffle on
  uniform sketch bands), and each query probes its buckets instead of
  scanning the corpus.

Hyperplanes are generated deterministically from :func:`~.hashing.hash60`
(seeded), so results are reproducible across engines/runs without
shipping a random matrix.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyspark.sql import types as T

from ..materialize import materialize
from .hashing import hash60_py


def as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _sql_double(x: float) -> str:
    """Render a Python float as a Spark SQL double literal that parses
    back to the IDENTICAL IEEE-754 value: Python's repr is the shortest
    round-trip decimal, and Double.parseDouble returns the nearest
    double to any decimal string — for a round-trip repr that nearest
    double is the original. Non-finite spellings use the CAST form the
    parser requires (cannot arise from finite training data; kept for
    defensive completeness)."""
    x = float(x)
    if math.isfinite(x):
        return repr(x) + "D"
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    return "CAST('Infinity' AS DOUBLE)" if x > 0 else "CAST('-Infinity' AS DOUBLE)"


def _adc_chain_sql(luts: list[list[float]]) -> str:
    """The per-query ADC score chain as ONE SQL fragment — the
    left-associated sum of per-subspace element_at LUT lookups,
    structurally identical to the former per-``F.lit`` Column build
    (same Add/ElementAt/Literal tree after parsing, so values are
    bit-identical) but costing ONE py4j round-trip per query instead of
    ~m_sub·(ksub+2): profiling showed the Column construction spent
    7.9 s of ann_topk_ivfpq_residual's 8.5 s build in 11k JVM gateway
    calls, and the 200-query recall legs paid ~25k calls (guide §1
    measure / §5 driver discipline — the driver was the bottleneck,
    not the cluster)."""
    terms = [
        "element_at(array({}),(element_at(codes,{})+1))".format(
            ",".join(_sql_double(v) for v in lut), s + 1
        )
        for s, lut in enumerate(luts)
    ]
    chain = terms[0]
    for t in terms[1:]:
        chain = "(" + chain + "+" + t + ")"
    return chain


def _adc_explode(struct_sqls: list[str]) -> Column:
    """explode(array(<per-query named_structs>)) parsed in one py4j
    call. Each element is ``named_struct('query_id', CAST(q AS BIGINT),
    'score', <score_sql>)`` — the same struct the Column builders
    produced."""
    return F.expr("explode(array({}))".format(",".join(struct_sqls)))


def _local_df(spark, rows: list[tuple], ddl: str) -> DataFrame:
    """A driver-local relation built through the pandas/Arrow
    converter instead of the pickled-``parallelize`` path. The plain
    ``createDataFrame(list, ddl)`` route slices the rows into
    ``defaultParallelism`` pickled partitions, and a downstream
    ``coalesce(1)`` (the index writers' one-file layout) then walks
    ALL of them through sequential Python-worker rounds — measured
    6–7 s per kilobyte-scale write on local[32] vs 0.65 s through one
    Arrow batch (guide §5 driver discipline). Values are exact either
    way: float64/int64/strings cross Arrow bit-identically, ``None``
    maps to null."""
    schema = T._parse_datatype_string(ddl)
    pdf = pd.DataFrame(
        {f.name: [r[i] for r in rows] for i, f in enumerate(schema.fields)}
    )
    return spark.createDataFrame(pdf, schema)


def _already_repartitioned(df: DataFrame) -> bool:
    """True when the frame's logical plan already carries a Repartition
    node (ours or the caller's) — walking node names via py4j, never
    stringifying the plan (synth plans embed multi-KB literals)."""
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            if node.nodeName() in ("Repartition", "RepartitionByExpression"):
                return True
            ch = node.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
    except Exception:
        return False
    return False


# Slice granularity for the VECTOR kernels (sketch / dot-product /
# quantize / PCA / k-means assignment / dHash): their per-row work is
# ~µs-scale numpy batch arithmetic, so a task needs ≥ ~2500 wide rows
# (~1 MiB of 64-dim doubles) before it amortizes its own scheduling +
# Arrow round-trip. r15 sized these sites at the 64 KiB default tuned
# for the ms-per-row codec/extract kernels, which spread a 2000-row
# corpus over 12 near-empty Python tasks — the measured
# embedding_near_dup regression (+30%, slower at 32 cores than 8,
# r15 verdict #1). Interleaved same-session A/B at sf0.1 (min-of-2):
# embedding_near_dup 1.65→1.38, image_near_dup 2.33→1.73, ann_topk_lsh
# 2.33→1.69, kmeans_tiered 1.83→1.45, semdedup 1.37→1.13, pca
# 0.78→0.51 — while webp_decode (ms/row codec; KEEPS the 64 KiB
# default) was 1.5 s at 64 KiB vs 8.3 s at 1 MiB. At the decade
# scales the coarser slice still fans: sf1 embeddings (7.8 MB) → 7
# slices, sf10 (78 MB) → 32; at real scale the helper is a no-op
# either way (natural splits exceed the target).
VEC_BYTES_PER_SLICE = 1 << 20


def ensure_parallelism(df: DataFrame, bytes_per_slice: int = 64 << 10) -> DataFrame:
    """Small corpora read as 1-2 parquet splits; with the query side
    broadcast there is no shuffle to fan the scoring out, so the whole
    candidate evaluation would run on one task. Repartition up to the
    cluster's parallelism when (and only when) the input is
    under-partitioned — a no-op at real scale, where file splits
    already exceed core count.

    Sizing comes from the input files' byte size (no RDD conversion,
    no count job): the fan-out target is one slice per
    ``bytes_per_slice`` capped at the cluster parallelism, so a
    500-row corpus gets ~4 tasks instead of 32 near-empty Python
    workers, while a 100 TB corpus is left alone (its natural split
    count already exceeds any target this could pick)."""
    if df.isStreaming:
        # micro-batch partitioning is the source's business; the
        # heavy-extractor call sites (r13) share this helper and must
        # stay stream-composable
        return df
    if getattr(df, "_nekton_fanned_out", False):
        # idempotence marker (r15 opt): callers that fan out BEFORE a
        # heavy projection (synth text, codec synth) hand the marked
        # frame down a chain whose inner stages also call this helper —
        # without the marker each call would stack another round-robin
        # exchange of the full payload
        return df
    if _already_repartitioned(df):
        # the marker does not survive .select()/.withColumn() (new
        # DataFrame objects), so also recognise an upstream Repartition
        # in the logical plan: entry paths fan out BEFORE their synth
        # projection precisely so the heavy expression runs fanned —
        # stacking a second exchange above it would undo nothing and
        # shuffle the synthesized payload a second time
        return df
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    files = [f for f in df.inputFiles() if f.startswith("file:")]
    if not files:
        # non-file-backed (in-memory test frames) or remote storage:
        # remote inputs are large/multi-split in practice — leave as-is
        if not df.inputFiles() and df.rdd.getNumPartitions() < target:
            out = df.repartition(target)
            out._nekton_fanned_out = True
            return out
        return df
    from urllib.parse import unquote, urlparse

    total = 0
    for f in files:
        try:
            total += os.path.getsize(unquote(urlparse(f).path))
        except OSError:
            return df
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    s = raw.lower().rstrip("b")
    max_split = (
        int(s[:-1]) * units[s[-1]] if s and s[-1] in units else int(s or 134217728)
    )
    est_splits = max(len(files), total // max_split)
    want = max(1, min(target, total // bytes_per_slice))
    if est_splits < want:
        out = df.repartition(want)
        out._nekton_fanned_out = True
        return out
    return df


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product. With a known ``dim`` the sum is unrolled into a flat
    left-associated expression chain: higher-order functions
    (aggregate/zip_with) are *interpreted* per element in Spark — they
    never enter whole-stage codegen — so the unrolled form is ~10×
    faster on wide candidate joins. Left association keeps the float
    accumulation order identical to the HOF fold (and to the DuckDB
    oracle's list_reduce)."""
    if dim is None:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
    # NOTE: measured SLOWER than the HOF fold for dim=64 inside wide
    # operators — the unrolled tree exceeds codegen method limits and
    # falls back to interpretation. Kept for narrow/small-dim uses.
    terms = [F.element_at(a, i + 1) * F.element_at(b, i + 1) for i in range(dim)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def norm(a: Column, dim: int | None = None) -> Column:
    if dim is None:
        return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    terms = [F.element_at(a, i + 1) * F.element_at(a, i + 1) for i in range(dim)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return F.sqrt(out)


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, score) — score = cosine,
    ties broken by neighbor id; self-matches excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")),
        VEC_BYTES_PER_SLICE,
    )
    cos = cosine_udf()
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos(F.col("qv"), F.col("cv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def hyperplane_values(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j ∈ {-1,+1}
    from bit parity of hash60(j, seed). Rademacher hyperplanes are a
    standard SimHash choice and need no stored matrix. Computed once
    driver-side and embedded as literals — recomputing the md5-derived
    components per row would dominate the sketch cost."""
    return [1.0 if hash60_py(str(j), seed) & 1 else -1.0 for j in range(dim)]


def hyperplane(seed: int, dim: int) -> Column:
    return F.array(*[F.lit(v) for v in hyperplane_values(seed, dim)])


def sketch_bits(vec: Column, dim: int, n_bits: int = 16) -> Column:
    """n_bits sign bits of <v, h_i> packed into a long (pure-expression
    form; see :func:`sketch_udf` for the fast path)."""
    bits = []
    for i in range(n_bits):
        h = hyperplane(7000 + i, dim)
        bits.append(
            F.when(dot(vec, h) >= 0, F.lit(2**i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def sketch_udf(dim: int, n_bits: int = 16):
    """Arrow-batched sketch: numpy replaces ~1000 interpreted HOF lambda
    steps per row (measured 1.25 ms/row → µs/row). Exactness: the dot
    products use ``cumsum`` along the last axis, whose final element is
    by definition the left-to-right fold — bit-identical to the
    expression form and to the DuckDB oracle's ``list_reduce``."""
    if not 0 < n_bits <= 62:
        # bit 63 is the long's sign bit and numpy's 1<<63 wraps to
        # INT64_MIN (and 1<<64 to 0) — a silent wrong sketch, so refuse
        raise ValueError(f"n_bits must be in 1..62, got {n_bits}")
    H = np.array([hyperplane_values(7000 + i, dim) for i in range(n_bits)])  # (bits, dim)
    powers = (1 << np.arange(n_bits)).astype(np.int64)

    @F.pandas_udf("long")
    def _sketch(v: pd.Series) -> pd.Series:
        M = np.asarray([np.asarray(x, dtype=np.float64) for x in v])  # (n, dim)
        # exact left fold over dimensions, accumulated column-by-column:
        # identical addition order to cumsum(M[:,None,:]*H, axis=2)[..,-1]
        # but with (n, bits) temporaries instead of an (n, bits, dim)
        # cube — the ~300 MB/batch cube allocations measured as
        # memory-compaction stalls on a loaded host (see clustering
        # _matrix_assigner for the same fix)
        dots = np.zeros((len(M), H.shape[0]))
        for j in range(H.shape[1]):
            dots += M[:, j, None] * H[None, :, j]
        return pd.Series(((dots >= 0) * powers).sum(axis=1).astype(np.int64))

    return _sketch


def _fold_dots(C: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """All-pairs dot products as the exact LEFT FOLD, dimension by
    dimension: acc_j += C[:,j] ⊗ Q[:,j] in ascending j — the identical
    addition sequence to ``cumsum(C[:,None,:]*Q[None,:,:],axis=2)[...,-1]``
    (and to the DuckDB oracle's fold), but with O(n·m) working memory
    instead of O(n·m·dim). The cumsum form allocated an (n, m, 64)
    float64 temporary — ~800 MB per 1250-row bucket, which at the sf1
    rehearsal turned embedding_near_dup into a 163 s allocation storm.
    A BLAS matmul would be fastest but sums pairwise — different
    rounding order, which would break oracle bit-parity."""
    acc = np.zeros((C.shape[0], Q.shape[0]))
    for j in range(C.shape[1]):
        acc += C[:, j, None] * Q[None, :, j]
    return acc


def cosine_udf():
    """Arrow-batched cosine with exact left-fold sums (cumsum); rounding
    stays JVM-side (F.round) because numpy rounds half-even while
    Spark/DuckDB round half-up."""
    @F.pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.asarray([np.asarray(x, dtype=np.float64) for x in a])
        B = np.asarray([np.asarray(x, dtype=np.float64) for x in b])
        dots = np.cumsum(A * B, axis=1)[:, -1]
        na = np.sqrt(np.cumsum(A * A, axis=1)[:, -1])
        nb = np.sqrt(np.cumsum(B * B, axis=1)[:, -1])
        return pd.Series(dots / (na * nb))

    return _cos


def _estimate_rows(df: DataFrame) -> int:
    """Row count for the width policy WITHOUT an eager Spark job when
    the frame is file-backed: parquet footers carry exact row counts,
    so summing them driver-side is a metadata read (the same trick
    :func:`ensure_parallelism` uses for byte sizes). Exact for
    scan-shaped inputs — the only shape the auto-width driver queries
    use — and equal to the ``count(*)`` a SQL oracle computes over the
    same table. An upstream filter would make this an upper bound,
    which is a fine width heuristic but would diverge from a
    count-based oracle: pass an explicit ``n_bits`` there. Falls back
    to ``df.count()`` (non-parquet / in-memory frames); streaming
    frames must pass ``n_bits`` explicitly."""
    files = df.inputFiles()
    local = [f for f in files if f.startswith("file:")]
    if files and len(local) == len(files):
        from urllib.parse import unquote, urlparse

        try:
            import pyarrow.parquet as pq

            total = 0
            for f in local:
                path = unquote(urlparse(f).path)
                if not path.endswith(".parquet"):
                    return df.count()
                total += pq.ParquetFile(path).metadata.num_rows
            return total
        except Exception:
            pass
    return df.count()


def _resolve_band_width(
    df: DataFrame, n_bits: int | None, bands: int, target_bucket: int
) -> int:
    """Shared banded-sketch width policy: auto width scales bits with
    the corpus (bits-per-band = ceil(log2(n / target_bucket)) clamped
    to [2, min(14, 62 // bands)]) so bucket sizes stay ~target_bucket
    as n grows — a FIXED width degenerates toward brute force (bucket
    size n / 2^r; the sf10 rehearsal measured a fixed 16-bit top-k at
    4.6× per data decade for exactly this reason). Explicit n_bits is
    honored verbatim after validation — that is what lets a SQL oracle
    replay the exact bucket structure; the auto width is ALSO
    oracle-replayable because the arithmetic is integer-exact:
    bits-per-band = ceil(log2(ceil(n / target_bucket))) computed via
    ``int.bit_length`` here and ``ceil(log2(m))`` over the integer m
    in SQL — equal for all m (ceil∘log2 commutes with the inner ceil
    on integer thresholds, and log2 of a power of two is exact in
    IEEE double on both engines)."""
    if not 1 <= bands <= 62:
        raise ValueError(
            f"bands must be in 1..62, got {bands}: each band needs >=1 bit of a 62-bit sketch"
        )
    if n_bits is None:
        n = _estimate_rows(df)
        m = max(1, -(-n // target_bucket))  # ceil(n / target_bucket)
        r_auto = max(2, (m - 1).bit_length())  # == ceil(log2(m)), exactly
        n_bits = bands * max(1, min(r_auto, 14, 62 // bands))
    if n_bits > 62:
        raise ValueError(
            f"n_bits={n_bits} exceeds 62: the sketch packs into one signed "
            "long; use more bands at <=62 total bits instead"
        )
    if n_bits < bands:
        # r = n_bits // bands would be 0 → mask 0 → every row in one bucket
        # per band: a silent all-pairs quadratic blowup, refuse instead
        raise ValueError(
            f"n_bits={n_bits} < bands={bands}: each band needs >=1 bit "
            "(n_bits // bands >= 1); lower bands or raise n_bits"
        )
    return n_bits


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int | None = None,
    bands: int = 4,
    target_bucket: int = 64,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: band the sign sketch into ``bands`` sub-keys;
    candidates share ≥1 band with the query; exact cosine re-rank.

    Recall is tuned by bands/n_bits (more bands = higher recall, more
    candidates). The default width scales with the corpus (see
    :func:`_resolve_band_width`) so per-band buckets stay
    ~``target_bucket`` rows as n grows; a fixed width makes the bucket
    scoring degenerate toward brute force. Returns the same schema as
    brute_force_topk.

    ``multiprobe=1`` (r11 — Lv et al., "Multi-Probe LSH", VLDB 2007;
    the DEFAULT since r15, r14 verdict #5 — it dominated plain LSH on
    every measured axis: recall@10 0.815 vs 0.255 uniform, 0.995 vs
    0.65 clustered, at a LOWER wall): each QUERY additionally probes
    every band key at Hamming distance 1 (the r single-bit flips per
    band — a near-miss query whose sketch differs from its neighbors'
    in one hyperplane sign still meets them). Corpus-side storage and
    bucketing are UNCHANGED — the query side fans out ×(1 + r),
    bounded because queries are the small side by contract; recall
    rises without the memory cost of more bands. ``multiprobe=0``
    selects the classic single-probe plan (the ann_topk_lsh oracle
    twin pins it). Radii > 1 are refused (the probe-sequence quality
    ordering beyond distance 1 is a different algorithm)."""
    if multiprobe not in (0, 1):
        raise ValueError(
            f"multiprobe={multiprobe}: only 0 (off) or 1 (Hamming-1 "
            "query probes) supported"
        )
    n_bits = _resolve_band_width(corpus, n_bits, bands, target_bucket)
    r = n_bits // bands
    mask = (1 << r) - 1

    sketch = sketch_udf(dim, n_bits)

    def banded(df: DataFrame, idc: str, vc: str, probe: bool = False):
        v = as_double(F.col(vc))
        entries = []
        for b in range(bands):
            kb = F.shiftright(F.col("sk"), b * r).bitwiseAND(F.lit(mask))
            entries.append(
                F.struct(F.lit(b).alias("band"), kb.alias("key"))
            )
            if probe:
                for t in range(r):
                    entries.append(
                        F.struct(
                            F.lit(b).alias("band"),
                            kb.bitwiseXOR(F.lit(1 << t)).alias("key"),
                        )
                    )
        return (
            df.select(F.col(idc).alias("id"), v.alias("v"))
            .withColumn("sk", sketch("v"))
            .select(
                "id",
                "v",
                F.explode(F.array(*entries)).alias("e"),
            )
            .select("id", "v", F.col("e.band").alias("band"), F.col("e.key").alias("key"))
        )

    # cb feeds BOTH the bucket-size census and the salted join: without
    # materialization the corpus-scale sketch UDF (the dominant map
    # cost) executes once per branch. Checkpoint volume = the same
    # bands× rows the bucket shuffle already moves.
    cb = materialize(banded(ensure_parallelism(corpus, VEC_BYTES_PER_SLICE), id_col, vec_col))
    qb = banded(queries, id_col, vec_col, probe=bool(multiprobe))

    # Salt oversized corpus buckets into ~tile-row subgroups (same
    # hazard as embedding_near_dup: a sketch bucket is otherwise ONE
    # cogroup = one task, so a hot bucket — e.g. a tight cosine
    # cluster the hyperplanes cannot split — serializes its whole
    # candidate scoring on one core). Corpus rows get a deterministic
    # tile ct = pmod(xxhash64(id), n_tiles); query rows are replicated
    # to every tile of their bucket (queries are the small side by
    # contract), so each (query, candidate) pair meets exactly once.
    tile = 2048
    big = (
        cb.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(F.col("bucket_n") > tile)
    )
    nt = F.ceil(F.coalesce(F.col("bucket_n"), F.lit(1)) / tile).cast("int")
    cbs = (
        cb.join(big, ["band", "key"], "left")
        .withColumn("ct", F.pmod(F.xxhash64("id"), nt).cast("int"))
        .select("id", "v", "band", "key", "ct")
    )
    qbs = (
        qb.join(big, ["band", "key"], "left")
        .withColumn("nt", nt)
        .select(
            "id",
            "v",
            "band",
            "key",
            F.explode(F.sequence(F.lit(0), F.col("nt") - 1)).alias("ct"),
        )
    )

    # Score per (salted) LSH bucket with a cogrouped applyInPandas:
    # each vector crosses the wire once per band (~bands·n rows)
    # instead of once per candidate pair (~n²/buckets rows of ~1 KB).
    # Inside a bucket one exact-fold (cumsum) "matmul" scores all
    # pairs — BLAS-class speed, bit-identical sums (tile membership
    # does not change any pair's fold order).
    def score_bucket(cdf: pd.DataFrame, qdf: pd.DataFrame) -> pd.DataFrame:
        if cdf.empty or qdf.empty:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "score": []})
        C = np.asarray([np.asarray(x) for x in cdf["v"]])
        Q = np.asarray([np.asarray(x) for x in qdf["v"]])
        dots = _fold_dots(C, Q)
        nc = np.sqrt(np.cumsum(C * C, axis=1)[:, -1])
        nq = np.sqrt(np.cumsum(Q * Q, axis=1)[:, -1])
        S = dots / (nc[:, None] * nq[None, :])
        ci = cdf["id"].to_numpy()
        qi = qdf["id"].to_numpy()
        n_idx, q_idx = np.nonzero(ci[:, None] != qi[None, :])
        return pd.DataFrame(
            {"query_id": qi[q_idx], "neighbor_id": ci[n_idx], "score": S[n_idx, q_idx]}
        )

    scored_raw = (
        # explicit repartition on the full salted key — a shuffle join
        # above would leave (band, key) partitioning, which already
        # satisfies the cogroup's clustering requirement, putting every
        # subgroup of a hot bucket back into one task
        cbs.repartition("band", "key", "ct")
        .groupBy("band", "key", "ct")
        .cogroup(qbs.repartition("band", "key", "ct").groupBy("band", "key", "ct"))
        .applyInPandas(score_bucket, "query_id long, neighbor_id long, score double")
    )
    scored = scored_raw.select(
        "query_id", "neighbor_id", F.round("score", 6).alias("score")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _resolve_coarse(
    coarse: str | None, centroid_stride: int | None, coarse_k: int | None
) -> str:
    """Resolve the coarse-quantizer mode shared by the IVF family.

    ``coarse=None`` (the engine default since r12) means TRAINED
    k-means cells — worth +0.28–0.45 clustered recall@10 at flat wall
    vs the sampled quantizer (r11 bench) — UNLESS the caller pinned an
    explicit ``centroid_stride``, the sampled quantizer's only sizing
    knob, in which case the sampled semantics those call sites were
    written against (and the SQL oracles replay) are kept. Explicit
    ``coarse=`` values are honored verbatim, and parameter/mode
    mismatches REFUSE rather than silently ignore (the engine-wide
    policy): ``centroid_stride`` with kmeans, ``coarse_k`` with
    sample, and ``coarse_k < 1`` (0 is a sizing bug, not a request
    for the √n default — r11 ADVICE)."""
    if coarse is None:
        coarse = "sample" if centroid_stride is not None else "kmeans"
    if coarse not in ("sample", "kmeans"):
        raise ValueError(f"unknown coarse quantizer {coarse!r}: sample|kmeans")
    if coarse == "kmeans" and centroid_stride is not None:
        raise ValueError(
            "centroid_stride applies to coarse='sample' only; with "
            "coarse='kmeans' size the quantizer via coarse_k "
            "(refuse rather than silently ignore)"
        )
    if coarse_k is not None:
        if coarse == "sample":
            raise ValueError(
                "coarse_k applies to coarse='kmeans' only; with "
                "coarse='sample' size the quantizer via centroid_stride "
                "(refuse rather than silently ignore)"
            )
        if coarse_k < 1:
            raise ValueError(f"coarse_k must be >= 1, got {coarse_k}")
    return coarse


def _coarse_centroids(
    base: DataFrame,
    coarse: str,
    n: int,
    train_stride: int,
    centroid_stride: int | None,
    coarse_k: int | None,
    coarse_iters: int,
    max_centroids: int,
):
    """The coarse quantizer's centroid set, shared by the whole IVF
    family (consolidates the four per-entry-point copies — r11 review
    wave #4). Returns ``(c_ids, c_mat, k_c, centroid_stride)`` where
    exactly one of the last two is non-None, recording the resolved
    sizing for persisted-index metadata.

    ``n`` is supplied by the CALLER — ivf_topk pays an exact count()
    (its probe join reuses the job), the PQ paths use the metadata
    estimate — so consolidating the dispatch does not change any
    path's job structure.

    kmeans: bounded k-means over the train_stride sample, cid = index
    0..k-1 (driver state = O(k·dim), capped by max_centroids).
    sample: every centroid_stride-th corpus vector (cid = corpus id),
    stride auto-sized to √n and ceil-raised until the centroid count
    fits max_centroids."""
    if coarse == "kmeans":
        from .clustering import train_centroids

        k_c = coarse_k if coarse_k is not None else max(
            1, min(math.isqrt(n), max_centroids)
        )
        ctr = base.filter(F.col("id") % train_stride == 0).select(
            F.col("id").alias("_kid"), F.col("v").alias("_kv")
        )
        cb0 = train_centroids(ctr, k_c, coarse_iters)
        return (
            np.arange(len(cb0), dtype=np.int64),
            np.asarray(cb0, dtype=np.float64),
            k_c,
            None,
        )
    if centroid_stride is None:
        centroid_stride = max(1, math.isqrt(n), -(-n // max_centroids))
    cent_rows = (
        base.filter(F.col("id") % centroid_stride == 0).orderBy("id").collect()
    )
    return (
        np.array([r["id"] for r in cent_rows], dtype=np.int64),
        np.asarray([np.asarray(r["v"], dtype=np.float64) for r in cent_rows]),
        None,
        int(centroid_stride),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    centroid_stride: int | None = None,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_centroids: int = 1 << 16,
    coarse: str | None = None,
    coarse_k: int | None = None,
    coarse_iters: int = 2,
    train_cap: int = 1 << 16,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    centroid-owned lists, search only the ``n_probe`` lists nearest to
    each query.

    Stages, sized for the 100 TB shape:

    1. **Centroids**: the deterministic sample ``id % centroid_stride
       == 0``. The default stride is ``floor(sqrt(n))`` — IVF's usual
       √n regime — so the centroid count (and with it the driver-side
       matrix and the per-task closure) stays O(√n) as the corpus
       grows: 10⁹ vectors → ~3.2e4 centroids, never the O(n/constant)
       a fixed stride degrades to. ``max_centroids`` additionally caps
       the auto mode (stride is raised until C fits). An explicit
       stride is honored verbatim — that is what lets a SQL oracle
       replay the exact centroid set. No k-means iterations: a fixed
       pseudo-random sample is the textbook "IVF-flat with random
       seeds" baseline. The centroid set is broadcast (small).
    2. **Assignment** (the n×C dot products every IVF build pays):
       broadcast join + Arrow-batched exact-fold cosine, then
       ``max_by`` argmax — partial aggregation runs map-side, so the
       shuffle carries ONE row per corpus vector, not n×C rows.
    3. **Probe + search**: queries score the broadcast centroids the
       same way, keep ``n_probe`` lists, and join assignments on the
       centroid id — the only corpus-sized shuffle keys on centroid id
       with list-sized fan-out. Exact cosine re-scores candidates;
       top-k by (rounded score desc, neighbor id).

    ``coarse="kmeans"`` (r11; the DEFAULT since r12 — ``coarse=None``
    resolves to kmeans unless an explicit ``centroid_stride`` pins the
    sampled quantizer, see :func:`_resolve_coarse`): centroids come
    from the deterministic
    k-means trainer (clustering.train_centroids, L2, rounded means)
    over the ``train_cap``-stride-sampled corpus at ``coarse_k``
    (default √n, capped) instead of the raw √n sample — cells then
    align with the data's actual cluster structure, which lifts the
    probed-set ceiling dramatically on clustered corpora (measured
    .640 → .950 cosine-ceiling recall@10 at n_probe=4 on the
    64-cluster σ=0.10 bench corpus — the sampled quantizer's cells
    split real clusters, k-means cells don't). Training cost is
    bounded: the per-iteration assignment runs over the ≤ train_cap
    sample, not the corpus; centroid ids are 0..k-1. The oracle
    replays training with the kmeans CTE family (same seeds-by-hash60,
    round(avg, 6) recomputes).

    Approximation contract: identical to the oracle's SQL replay of the
    same algorithm (assignment argmax uses the bit-exact left-fold
    cosine on both engines), NOT to brute force — recall vs brute
    force is a quality property tested separately."""
    coarse = _resolve_coarse(coarse, centroid_stride, coarse_k)
    base = corpus.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    base = ensure_parallelism(base, VEC_BYTES_PER_SLICE)
    cos = cosine_udf()
    # Assignment pays the n×C dot products every IVF build pays, but a
    # broadcast JOIN would ship both 64-dim vectors through Arrow for
    # all n×C rows (measured 10× slower at a 10× rehearsal). Instead
    # the centroid MATRIX — O(C) driver data, same status as the
    # literal hyperplanes in sketch_bits — rides the task closure, and
    # each corpus batch scores all centroids in one exact-fold kernel:
    # every vector crosses to Python exactly once. argmax over the
    # cid-sorted matrix picks the smallest cid on ties — identical to
    # ORDER BY sim DESC, cid ASC.
    # one count job buys both the √n sizing and the train stride; an
    # explicit sampled stride needs neither, so it keeps paying zero
    # count jobs (a full count at corpus scale is not free)
    n = base.count() if (coarse == "kmeans" or centroid_stride is None) else 0
    c_ids, c_mat, _kc, _cs = _coarse_centroids(
        base, coarse, n, max(1, -(-n // train_cap)),
        centroid_stride, coarse_k, coarse_iters, max_centroids,
    )
    # the probe join broadcasts the centroid relation; rebuilding it
    # from the collected matrix (bounded by max_centroids) instead of
    # re-scanning the corpus saves the second scan the sampled branch
    # used to pay
    cents = _local_df(
        corpus.sparkSession,
        [(int(i), [float(x) for x in v]) for i, v in zip(c_ids, c_mat)],
        "cid long, cv array<double>",
    )
    c_norm = np.sqrt(np.cumsum(c_mat * c_mat, axis=1)[:, -1])

    assign_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
            T.StructField("cid", T.LongType()),
        ]
    )

    def assign(batches: "pd.DataFrame") -> "pd.DataFrame":
        # chunk rows so the (rows, centroids) score matrix stays ~32 MB:
        # a 10k-row Arrow batch against the 65536-centroid cap would
        # otherwise allocate a 5 GB matrix per batch (see the
        # memory-compaction findings on _matrix_assigner/sketch_udf)
        row_chunk = max(1, (32 << 20) // (8 * max(1, len(c_ids))))
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"id": [], "v": [], "cid": []})
                continue
            V = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            nv = np.sqrt(np.cumsum(V * V, axis=1)[:, -1])
            best = np.empty(len(V), dtype=np.int64)
            for r0 in range(0, len(V), row_chunk):
                r1 = min(r0 + row_chunk, len(V))
                dots = _fold_dots(V[r0:r1], c_mat)
                S = dots / (nv[r0:r1, None] * c_norm[None, :])
                best[r0:r1] = S.argmax(axis=1)
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "v": pdf["v"], "cid": c_ids[best]}
            )

    assigned = base.mapInPandas(assign, assign_schema)
    q = queries.select(F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv"))
    wp = Window.partitionBy("query_id").orderBy(F.desc("psim"), F.asc("cid"))
    probed = (
        q.join(F.broadcast(cents))
        .select("query_id", "qv", "cid", cos(F.col("qv"), F.col("cv")).alias("psim"))
        .withColumn("prank", F.row_number().over(wp))
        .filter(F.col("prank") <= n_probe)
        .select("query_id", "qv", "cid")
    )
    scored = (
        probed.join(assigned, "cid")
        .filter(F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(cos(F.col("qv"), F.col("v")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


PQ_TRAIN_CAP = 1 << 16


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m_sub: int = 8,
    ksub: int = 16,
    iters: int = 2,
    train_cap: int = PQ_TRAIN_CAP,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Product-quantization (PQ) compressed top-k by inner product —
    the MEMORY scale path: each vector is stored as ``m_sub`` one-byte
    codes instead of dim doubles (64 dims → 8 codes: 512 B → 8 B, a
    64× smaller scan; at 10^10 vectors the compressed corpus is ~80 GB
    instead of ~5 TB). Returns (query_id, neighbor_id, score, rank),
    score = the asymmetric-distance (ADC) approximate inner product.

    Stages, sized for 100 TB:

    1. **Codebooks** (driver state O(m_sub·ksub·d0) — 1 KB-scale):
       the vector splits into ``m_sub`` subspaces of d0 = dim/m_sub
       dims; each subspace trains an independent deterministic k-means
       (clustering.train_centroids: seeds = the ksub TRAINING
       subvectors with the smallest hash60(id, SEED_ORDER_SALT),
       ``iters - 1`` rounded-mean recomputes) over
       the deterministic sample ``id % stride == 0`` with stride =
       ceil(n / train_cap) — training rows are bounded at ``train_cap``
       whatever the corpus size, and the stride is replayed from
       count(*) by the SQL oracle (n from parquet footers here, equal
       for scan-shaped inputs).
    2. **Encode** (map-only, one Arrow pass): per subspace, exact
       left-fold squared-L2 argmin to the codebook, first-index ties —
       (id, codes: array<int>). Zero shuffles.
    3. **ADC scan** (map-only + per-query top-k): queries are collected
       (bounded small side by contract) and their per-subspace lookup
       tables LUT[s][c] = <q_sub, codebook[s][c]> computed driver-side
       with the same left-fold; the score is a pure-codegen chain of
       element_at lookups summed left-associated — the compressed scan
       never touches a vector. Top-k = per-query rank window over the
       scored rows (the same accepted shape as brute/IVF).

    Approximation contract: identical to the oracle's SQL replay of
    the same algorithm (training, encoding, and LUT arithmetic are the
    same exact folds); recall vs brute force is a separate quality
    property (tests/test_functions.py asserts a floor on the synth
    corpus)."""
    if dim % m_sub != 0:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    d0 = dim // m_sub
    from .clustering import train_subspace_codebooks

    base = corpus.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    base = ensure_parallelism(base, VEC_BYTES_PER_SLICE)
    n = _estimate_rows(base)
    stride = max(1, -(-n // train_cap))
    tr = base.filter(F.col("id") % stride == 0)
    # all m_sub codebooks in 2 bounded jobs (bit-identical to the
    # per-subspace train_centroids loop — see train_subspace_codebooks)
    cbs = train_subspace_codebooks(tr, m_sub, d0, ksub, iters)
    C = [np.asarray(cb, dtype=np.float64) for cb in cbs]

    code_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"id": [], "codes": []})
                continue
            V = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            codes = np.empty((len(V), m_sub), dtype=np.int32)
            for s in range(m_sub):
                P = V[:, s * d0 : (s + 1) * d0]
                d = np.zeros((len(P), len(C[s])))
                for j in range(d0):  # exact left fold over dimensions
                    dcol = P[:, j, None] - C[s][None, :, j]
                    d += dcol * dcol
                codes[:, s] = d.argmin(axis=1)  # first index on ties
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "codes": list(codes)}
            )

    encoded = base.mapInPandas(encode, code_schema)

    q_rows = (
        queries.select(F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"))
        .orderBy("qid")
        .collect()  # queries are the bounded small side by contract
    )
    if not q_rows:
        # see _ivfpq_adc_topk: zero query structs would explode VOID
        return encoded.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, score double, rank int"
        )

    def lut_for(qv: list[float], s: int) -> list[float]:
        out = []
        for c in range(ksub):
            acc = 0.0
            for j in range(d0):  # same left fold as the SQL dot chain
                acc += qv[s * d0 + j] * cbs[s][c][j]
            out.append(acc)
        return out

    structs = []
    for r in q_rows:
        luts = [lut_for(list(r.qv), s) for s in range(m_sub)]
        structs.append(
            "named_struct('query_id',CAST({} AS BIGINT),'score',round({},6))".format(
                int(r.qid), _adc_chain_sql(luts)
            )
        )
    scored = (
        encoded.select(
            F.col("id").alias("neighbor_id"),
            _adc_explode(structs).alias("qs"),
        )
        .select("qs.query_id", "neighbor_id", "qs.score")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    centroid_stride: int | None = None,
    n_probe: int = 4,
    m_sub: int = 8,
    ksub: int = 16,
    iters: int = 2,
    train_cap: int = PQ_TRAIN_CAP,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    max_centroids: int = 1 << 16,
    coarse: str | None = None,
    coarse_k: int | None = None,
    coarse_iters: int = 2,
) -> DataFrame:
    """IVF + PQ composition (the classic coarse-quantizer + product-
    quantizer index): the corpus is partitioned into √n inverted lists
    (ivf_topk's deterministic coarse centroids and exact-fold cosine
    argmax) AND stored as m_sub one-byte PQ codes (pq_topk's global
    codebooks) — queries ADC-scan ONLY the ``n_probe`` probed lists
    (default 4 — same r10 clustered-recall sweep as ivf_topk: 2->4
    lifted clustered recall@10 0.37->0.465 at no wall cost).

    This is the scale composition neither parent achieves alone:

    - vs pq_topk: the compressed scan shrinks from n rows to
      ~n·n_probe/√n rows (probed lists only) — at 10^10 vectors and
      n_probe=2 the per-query scan reads ~2·10^5× fewer codes.
    - vs ivf_topk: probed lists are scored from 8-byte codes via
      pure-codegen LUT lookups instead of re-scoring true vectors
      through an Arrow cosine — the 64× memory win rides along.

    Build cost: ONE fused Arrow pass computes both the coarse
    assignment (chunked exact-fold cosine argmax vs the O(√n)
    broadcast-by-closure centroid matrix) and the PQ codes (exact
    left-fold squared-L2 argmin per subspace) — each corpus vector
    crosses to Python exactly once, the build shuffles nothing.
    Probing is driver-side (queries are the bounded small side by
    contract; centroids are already driver-resident): same fold, same
    (sim desc, cid asc) tie order as ivf_topk's window. The per-query
    probed-cell guard wraps the LUT score in a WHEN, so unprobed rows
    never evaluate the chain.

    Exactness: the oracle replays coarse centroids + assignment +
    probing (ivf CTEs) and PQ training + encoding + ADC (pq CTEs)
    joined on the probed cells — exact hash-match; recall vs brute
    force is a separate quality property (global codebooks — see
    :func:`ivfpq_residual_topk` for the residual-encoded variant that
    recovers the recall global codebooks lose)."""
    if dim % m_sub != 0:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    coarse = _resolve_coarse(coarse, centroid_stride, coarse_k)
    d0 = dim // m_sub
    from .clustering import train_subspace_codebooks

    base = corpus.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    base = ensure_parallelism(base, VEC_BYTES_PER_SLICE)
    n = _estimate_rows(base)
    pq_stride = max(1, -(-n // train_cap))
    c_ids, c_mat, _kc, _cs = _coarse_centroids(
        base, coarse, n, pq_stride,
        centroid_stride, coarse_k, coarse_iters, max_centroids,
    )
    c_norm = np.sqrt(np.cumsum(c_mat * c_mat, axis=1)[:, -1])

    tr = base.filter(F.col("id") % pq_stride == 0)
    cbs = train_subspace_codebooks(tr, m_sub, d0, ksub, iters)
    encoded = _ivfpq_encode_pass(base, c_ids, c_mat, c_norm, cbs, m_sub, d0)
    return _ivfpq_adc_topk(
        encoded, queries, c_ids, c_mat, c_norm, cbs,
        m_sub, d0, ksub, n_probe, k, id_col, vec_col,
    )


def _ivfpq_encode_pass(base, c_ids, c_mat, c_norm, cbs, m_sub, d0):
    """The fused IVF-PQ build pass (extracted from ivfpq_topk, r11, so
    the persisted-index build shares it verbatim): ONE Arrow pass
    computing the coarse cosine-argmax assignment AND the per-subspace
    raw-vector PQ codes — (id, cid, codes), zero shuffles."""
    C = [np.asarray(cb, dtype=np.float64) for cb in cbs]
    build_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("cid", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def build(batches):
        row_chunk = max(1, (32 << 20) // (8 * max(1, len(c_ids))))
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"id": [], "cid": [], "codes": []})
                continue
            V = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            nv = np.sqrt(np.cumsum(V * V, axis=1)[:, -1])
            best = np.empty(len(V), dtype=np.int64)
            for r0 in range(0, len(V), row_chunk):
                r1 = min(r0 + row_chunk, len(V))
                dots = _fold_dots(V[r0:r1], c_mat)
                S = dots / (nv[r0:r1, None] * c_norm[None, :])
                best[r0:r1] = S.argmax(axis=1)  # ties → smallest cid
            codes = np.empty((len(V), m_sub), dtype=np.int32)
            for s in range(m_sub):
                P = V[:, s * d0 : (s + 1) * d0]
                d = np.zeros((len(P), len(C[s])))
                for j in range(d0):  # exact left fold over dimensions
                    dcol = P[:, j, None] - C[s][None, :, j]
                    d += dcol * dcol
                codes[:, s] = d.argmin(axis=1)  # first index on ties
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "cid": c_ids[best],
                    "codes": list(codes),
                }
            )

    return base.mapInPandas(build, build_schema)


def _ivfpq_adc_topk(
    encoded, queries, c_ids, c_mat, c_norm, cbs,
    m_sub, d0, ksub, n_probe, k, id_col, vec_col,
):
    """The IVF-PQ probe + ADC-scan + top-k stage (extracted from
    ivfpq_topk, r11, so the persisted-index query path shares it
    verbatim): driver-side probing over the resident centroid matrix,
    per-query LUT chains guarded by the probed-cell WHEN, rank
    window."""
    q_rows = (
        queries.select(F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"))
        .orderBy("qid")
        .collect()
    )
    if not q_rows:
        # no queries → empty result, not F.array() of zero structs
        # (a VOID-typed explode that fails the downstream struct
        # extraction with an unactionable AnalysisException — r11
        # review catch)
        return encoded.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, score double, rank int"
        )

    def lut_for(qv: list[float], s: int) -> list[float]:
        out = []
        for c in range(ksub):
            acc = 0.0
            for j in range(d0):
                acc += qv[s * d0 + j] * cbs[s][c][j]
            out.append(acc)
        return out

    structs = []
    for r in q_rows:
        qv = np.asarray(list(r.qv), dtype=np.float64)
        qn = np.sqrt(np.cumsum(qv * qv)[-1])
        dots = _fold_dots(qv[None, :], c_mat)[0]
        sims = dots / (qn * c_norm)
        probed = sorted(range(len(c_ids)), key=lambda j: (-sims[j], c_ids[j]))
        cells = [int(c_ids[j]) for j in probed[:n_probe]]
        luts = [lut_for(list(r.qv), s) for s in range(m_sub)]
        # probed-cell guard OUTSIDE the LUT chain: unprobed rows
        # short-circuit to NULL without evaluating it
        structs.append(
            "named_struct('query_id',CAST({} AS BIGINT),'score',"
            "CASE WHEN (cid IN ({})) THEN round({},6) END)".format(
                int(r.qid),
                ",".join(str(c) for c in cells),
                _adc_chain_sql(luts),
            )
        )
    scored = (
        encoded.select(
            F.col("id").alias("neighbor_id"),
            F.col("cid"),
            _adc_explode(structs).alias("qs"),
        )
        .select("qs.query_id", "neighbor_id", "qs.score")
        .filter(F.col("score").isNotNull() & (F.col("query_id") != F.col("neighbor_id")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _pq_distortion(sample: DataFrame, cbs, m_sub: int, d0: int) -> float:
    """Mean squared PQ reconstruction error of ``sample`` (id, v) under
    frozen per-subspace codebooks — the bounded drift statistic the
    persisted-index append gate compares against. One Arrow pass over
    the ≤ train_cap stride slice, two scalars per partition to the
    driver; the same exact left-fold distance arithmetic the encode
    pass argmins over."""
    C = [np.asarray(cb, dtype=np.float64) for cb in cbs]
    schema = T.StructType(
        [T.StructField("e", T.DoubleType()), T.StructField("c", T.LongType())]
    )

    def dist(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"e": [0.0], "c": [0]})
                continue
            V = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            tot = 0.0
            for s in range(m_sub):
                P = V[:, s * d0 : (s + 1) * d0]
                d = np.zeros((len(P), len(C[s])))
                for j in range(d0):
                    dcol = P[:, j, None] - C[s][None, :, j]
                    d += dcol * dcol
                tot += float(d.min(axis=1).sum())
            yield pd.DataFrame({"e": [tot], "c": [len(V)]})

    row = (
        sample.mapInPandas(dist, schema)
        .agg(F.sum("e").alias("e"), F.sum("c").alias("c"))
        .collect()[0]
    )
    return float(row["e"] / row["c"]) if row["c"] else 0.0


def _write_index_meta(spark, path: str, meta: dict) -> None:
    """Persist the parameters-only meta as ONE parquet row via the
    Spark writer (format/2) — every index artifact then lives behind
    the same filesystem abstraction, so an object-store ``path`` that
    can hold the codes can hold the meta too (r11 ADVICE: the
    driver-side open() made build/query silently POSIX-only)."""
    fields, vals = [], []
    for k, v in meta.items():
        if isinstance(v, bool):
            t = "boolean"
        elif isinstance(v, int) or v is None and k != "format":
            t = "long"
        elif isinstance(v, float):
            t = "double"
        else:
            t = "string"
        fields.append(f"{k} {t}")
        vals.append(v)
    _local_df(spark, [tuple(vals)], ", ".join(fields)).coalesce(
        1
    ).write.mode("overwrite").parquet(path.rstrip("/") + "/meta")


def _ivfpq_index_load(spark, path: str):
    """Load a persisted IVF-PQ index's driver-scale state: the
    parameters row plus (cid-sorted) centroid matrix and (sub,
    code)-sorted codebooks. Reads format/2 parquet artifacts; falls
    back to the r11 format/1 single-JSON layout when
    ``ivfpq_meta.json`` is present on a driver-readable path. Returns
    (meta, c_ids, c_mat, c_norm, cbs)."""
    import json
    import os

    jmeta = os.path.join(path, "ivfpq_meta.json")
    if "://" not in path and os.path.exists(jmeta):
        with open(jmeta) as f:
            meta = json.load(f)
        if meta.get("format") != "nekton_spark.ivfpq/1":
            raise ValueError(f"not an ivfpq index: {path}")
        c_ids = np.array(meta["c_ids"], dtype=np.int64)
        c_mat = np.asarray(meta["c_mat"], dtype=np.float64)
        cbs = meta["cbs"]
    else:
        try:
            mrow = spark.read.parquet(path.rstrip("/") + "/meta").collect()
        except Exception as e:
            raise ValueError(
                f"not an ivfpq index (no meta relation or ivfpq_meta.json): {path}"
            ) from e
        if len(mrow) != 1:
            raise ValueError(f"corrupt ivfpq index meta ({len(mrow)} rows): {path}")
        meta = mrow[0].asDict()
        if meta.get("format") != "nekton_spark.ivfpq/2":
            raise ValueError(f"not an ivfpq index: {path}")
        cent = spark.read.parquet(path.rstrip("/") + "/centroids").collect()
        cent.sort(key=lambda r: r["cid"])
        c_ids = np.array([r["cid"] for r in cent], dtype=np.int64)
        c_mat = np.asarray(
            [np.asarray(r["cv"], dtype=np.float64) for r in cent]
        )
        cbr = spark.read.parquet(path.rstrip("/") + "/codebooks").collect()
        cbr.sort(key=lambda r: (r["sub"], r["code"]))
        cbs = [[] for _ in range(meta["m_sub"])]
        for r in cbr:
            cbs[r["sub"]].append(list(r["c"]))
    c_norm = np.sqrt(np.cumsum(c_mat * c_mat, axis=1)[:, -1])
    return meta, c_ids, c_mat, c_norm, cbs


def ivfpq_index_build(
    corpus: DataFrame,
    path: str,
    centroid_stride: int | None = None,
    m_sub: int = 8,
    ksub: int = 16,
    iters: int = 2,
    train_cap: int = PQ_TRAIN_CAP,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    max_centroids: int = 1 << 16,
    coarse: str | None = None,
    coarse_k: int | None = None,
    coarse_iters: int = 2,
) -> dict:
    """PERSIST an IVF-PQ index (r11; format/2 since r12): the
    build-once/query-many split every production vector index has — at
    10^10 vectors re-training codebooks and re-encoding the corpus per
    query batch is the actual cost, and this is the half ivfpq_topk
    fuses away. Writes, ALL through the Spark writer — so any
    filesystem the codes relation can reach (object stores included)
    holds the WHOLE index; the r11 driver-written JSON blob (O(√n·dim)
    floats, ~130 MB at 10^10 vectors, POSIX-only) is gone:

    - ``path/codes``: the compressed corpus relation (id, cid, codes)
      as parquet — the only corpus-sized artifact, ~m_sub bytes of
      codes per vector (the 64× memory story, now durable);
    - ``path/centroids``: (cid, cv) parquet — O(√n) rows, partially
      loadable;
    - ``path/codebooks``: (sub, code, c) parquet — m_sub·ksub rows;
    - ``path/meta``: ONE parquet row of build parameters: format tag,
      m_sub/ksub/dim/iters/train_cap, the RESOLVED coarse mode with
      coarse_k/coarse_iters or centroid_stride (so a non-default
      build is auditable and reproducible from its artifacts — r11
      ADVICE), n_rows, and the training-sample PQ distortion the
      :func:`ivfpq_index_append` drift gate compares against.

    Build = the SAME stages ivfpq_topk runs — so ``ivfpq_index_query``
    over the persisted artifacts returns EXACTLY ivfpq_topk's rows for
    the same parameters (the ann_index_roundtrip driver row pins this
    against the ivfpq oracle). Returns the meta dict with the
    in-memory c_ids/c_mat/cbs arrays attached for convenience."""
    # refuse before the expensive coarse stage (the inline operators
    # check dim first too — r11 review catch)
    if dim % m_sub != 0:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    coarse = _resolve_coarse(coarse, centroid_stride, coarse_k)
    d0 = dim // m_sub
    base = corpus.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    base = ensure_parallelism(base, VEC_BYTES_PER_SLICE)
    n = _estimate_rows(base)
    pq_stride = max(1, -(-n // train_cap))
    c_ids, c_mat, coarse_k, centroid_stride = _coarse_centroids(
        base, coarse, n, pq_stride,
        centroid_stride, coarse_k, coarse_iters, max_centroids,
    )
    c_norm = np.sqrt(np.cumsum(c_mat * c_mat, axis=1)[:, -1])
    from .clustering import train_subspace_codebooks
    tr = base.filter(F.col("id") % pq_stride == 0)
    cbs = train_subspace_codebooks(tr, m_sub, d0, ksub, iters)
    train_distortion = _pq_distortion(tr, cbs, m_sub, d0)
    encoded = _ivfpq_encode_pass(base, c_ids, c_mat, c_norm, cbs, m_sub, d0)
    encoded.write.mode("overwrite").parquet(path.rstrip("/") + "/codes")
    spark = corpus.sparkSession
    _local_df(
        spark,
        [(int(i), [float(x) for x in v]) for i, v in zip(c_ids, c_mat)],
        "cid long, cv array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(path.rstrip("/") + "/centroids")
    _local_df(
        spark,
        [
            (s, j, [float(x) for x in cbs[s][j]])
            for s in range(m_sub)
            for j in range(len(cbs[s]))
        ],
        "sub int, code int, c array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(path.rstrip("/") + "/codebooks")
    meta = {
        "format": "nekton_spark.ivfpq/2",
        "m_sub": m_sub,
        "ksub": ksub,
        "d0": d0,
        "dim": dim,
        "iters": iters,
        "train_cap": train_cap,
        "coarse": coarse,
        "coarse_k": coarse_k if coarse == "kmeans" else None,
        "coarse_iters": coarse_iters if coarse == "kmeans" else None,
        "centroid_stride": int(centroid_stride) if coarse == "sample" else None,
        "n_rows": int(n),
        "train_distortion": float(train_distortion),
    }
    _write_index_meta(spark, path, meta)
    return meta | {
        "c_ids": [int(x) for x in c_ids],
        "c_mat": [[float(x) for x in row] for row in c_mat],
        "cbs": cbs,
    }


def ivfpq_index_query(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVF-PQ index (see :func:`ivfpq_index_build`):
    loads the driver-scale meta/centroids/codebooks, scans ONLY the
    parquet codes relation (never a raw vector), and runs the
    identical probe + ADC + top-k stage as ivfpq_topk — same rows, no
    training, no encode pass. Reads format/2 parquet indexes and the
    legacy r11 format/1 JSON layout."""
    meta, c_ids, c_mat, c_norm, cbs = _ivfpq_index_load(spark, path)
    encoded = spark.read.parquet(path.rstrip("/") + "/codes")
    return _ivfpq_adc_topk(
        encoded, queries, c_ids, c_mat, c_norm, cbs,
        meta["m_sub"], meta["d0"], meta["ksub"], n_probe, k,
        id_col, vec_col,
    )


def ivfpq_index_append(
    corpus: DataFrame,
    path: str,
    drift_tol: float = 2.0,
    verify_ids: bool = True,
    train_cap: int = PQ_TRAIN_CAP,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """INCREMENTALLY append new vectors to a persisted IVF-PQ index
    (r11 verdict #5): encode the batch under the FROZEN centroids and
    codebooks — no retrain, no re-encode of the existing corpus — and
    append the resulting (id, cid, codes) rows to ``path/codes``.
    Appending is what makes the build-once artifact maintainable at
    10^10 vectors: a daily 0.1% ingest re-encodes 0.1% of the corpus
    instead of rebuilding for hours.

    Frozen quantizers only stay VALID while new data resembles the
    training distribution, so the append REFUSES (rather than silently
    degrading recall) when the batch's PQ distortion — mean squared
    reconstruction error over a ≤ train_cap stride sample, the same
    statistic the build recorded as ``train_distortion`` — exceeds
    ``drift_tol ×`` the build's value. A drifted batch means: rebuild,
    or raise drift_tol deliberately.

    ``verify_ids=True`` (default) refuses id collisions with the
    existing codes via one bounded semi-join count — a duplicate id
    would silently corrupt every later query. At extreme scale where
    the caller guarantees disjoint ids, pass False to skip the scan.
    Format/2 indexes only (a /1 index predates the drift statistic —
    rebuild it). Returns the updated meta dict."""
    spark = corpus.sparkSession
    meta, c_ids, c_mat, c_norm, cbs = _ivfpq_index_load(spark, path)
    if meta.get("format") != "nekton_spark.ivfpq/2":
        raise ValueError(
            "ivfpq_index_append requires a format/2 index (the r11 "
            "format/1 JSON layout records no train_distortion): rebuild "
            f"with ivfpq_index_build: {path}"
        )
    m_sub, d0 = meta["m_sub"], meta["d0"]
    base = corpus.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    )
    base = ensure_parallelism(base, VEC_BYTES_PER_SLICE)
    n_new = _estimate_rows(base)
    if n_new == 0:
        return dict(meta)
    stride = max(1, -(-n_new // train_cap))
    batch_distortion = _pq_distortion(
        base.filter(F.col("id") % stride == 0), cbs, m_sub, d0
    )
    ref = float(meta["train_distortion"])
    if batch_distortion > drift_tol * max(ref, 1e-12):
        raise ValueError(
            f"append batch drifts from the index's training distribution: "
            f"batch PQ distortion {batch_distortion:.6g} > drift_tol "
            f"({drift_tol}) x train_distortion {ref:.6g} — rebuild the "
            "index (or raise drift_tol deliberately)"
        )
    codes_path = path.rstrip("/") + "/codes"
    if verify_ids:
        existing = spark.read.parquet(codes_path).select("id")
        dups = base.select("id").join(existing, "id", "left_semi").count()
        if dups:
            raise ValueError(
                f"append batch shares {dups} id(s) with the existing index "
                "(duplicate ids corrupt queries); deduplicate or rebuild"
            )
    encoded = _ivfpq_encode_pass(base, c_ids, c_mat, c_norm, cbs, m_sub, d0)
    encoded.write.mode("append").parquet(codes_path)
    new_meta = dict(meta)
    new_meta["n_rows"] = int(meta["n_rows"]) + int(n_new)
    _write_index_meta(spark, path, new_meta)
    return new_meta


def ivfpq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    centroid_stride: int | None = None,
    n_probe: int = 4,
    m_sub: int = 8,
    ksub: int = 16,
    iters: int = 2,
    train_cap: int = PQ_TRAIN_CAP,
    rerank_mult: int | None = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    max_centroids: int = 1 << 16,
    coarse: str | None = None,
    coarse_k: int | None = None,
    coarse_iters: int = 2,
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding + exact re-rank (Jégou, Douze &
    Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
    2011 §IV.B; the re-rank stage is FAISS's IndexIVFPQR composition):
    each vector is PQ-quantized as its residual r = v − c(v) from its
    coarse centroid instead of raw against global codebooks, scored as
    <q, v> ≈ <q, c(v)> + ADC(residual codes), and the ADC scan
    NOMINATES ``rerank_mult·k`` candidates per query whose true
    vectors alone are fetched and exact-cosine re-ranked (pq_topk_
    rerank's broadcast-semi-join stage — no corpus shuffle).

    Measured honesty (r11, 64-cluster σ=0.10 mixture, n=2000,
    n_probe=4): residual ADC has LOWER approximation error than raw
    ADC (mean |score − <q,v>| 0.286 vs 0.446 over returned top-10) —
    the TPAMI claim holds — but under this engine's deterministic
    SAMPLED coarse centroids (√n rows, not k-means means) residual
    distributions are multimodal (a cell whose cluster owns no
    centroid leaves center-difference-scale residuals next to tiny
    within-cluster ones), so pure residual-ADC ranking is NOT better
    than raw here (clustered recall@10 .32 vs .465). What closes the
    gap is the re-rank: residual-ADC nomination + exact-cosine re-rank
    reaches the probed-set cosine ceiling (= ivf_topk's recall, .64 at
    n_probe=4; the default rerank_mult=10 is the smallest that does) while the primary scan stays 8-byte codes over probed
    lists only — the memory/scan story of ivfpq with the recall of
    ivf. ``rerank_mult=None`` gives the pure-ADC variant.

    Scoring: the coarse term <q, c(v)> is exact per (query, probed
    cell) and rides as a literal in a chained CASE on cid; the
    residual ADC chain is the same pure-codegen LUT fold as the
    parents. Unprobed rows short-circuit to NULL before evaluating
    the chain.

    Build adds ONE bounded Arrow pass over the TRAINING SAMPLE
    (stride-capped at ``train_cap``, materialized once so the m_sub
    per-subspace k-means don't recompute the coarse assignment) on top
    of ivfpq's fused corpus pass — the corpus itself still crosses to
    Python exactly once (assign + residual + encode fused). Driver
    state stays O(√n + m_sub·ksub·d0); the re-rank fetch is
    |queries|·rerank_mult·k rows via broadcast semi-join.

    Exactness: residual = v − cv is deterministic elementwise IEEE
    arithmetic, so the oracle replays it inside the SAME CTE families
    as ivfpq (coarse assign → residual relation → per-subspace
    training/encode on residual slices → ADC + the per-cell coarse
    dot → exact-cosine re-rank) — exact hash-match, refuting the
    former "trades oracle replayability for recall" claim."""
    if dim % m_sub != 0:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    coarse = _resolve_coarse(coarse, centroid_stride, coarse_k)
    d0 = dim // m_sub
    from .clustering import train_subspace_codebooks

    base = corpus.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    base = ensure_parallelism(base, VEC_BYTES_PER_SLICE)
    n = _estimate_rows(base)
    pq_stride = max(1, -(-n // train_cap))
    # under kmeans the trained coarse cells give unimodal residuals AND
    # a far higher probed-set ceiling on clustered corpora — the
    # composition FAISS's IVFPQR actually ships
    c_ids, c_mat, _kc, _cs = _coarse_centroids(
        base, coarse, n, pq_stride,
        centroid_stride, coarse_k, coarse_iters, max_centroids,
    )
    c_norm = np.sqrt(np.cumsum(c_mat * c_mat, axis=1)[:, -1])

    resid_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("rv", T.ArrayType(T.DoubleType())),
        ]
    )

    def _coarse_best(V: np.ndarray) -> np.ndarray:
        # chunked exact-fold cosine argmax vs the closure centroid
        # matrix — the parents' assignment kernel (ties → smallest cid
        # via argmax-first over the cid-sorted matrix)
        nv = np.sqrt(np.cumsum(V * V, axis=1)[:, -1])
        best = np.empty(len(V), dtype=np.int64)
        row_chunk = max(1, (32 << 20) // (8 * max(1, len(c_ids))))
        for r0 in range(0, len(V), row_chunk):
            r1 = min(r0 + row_chunk, len(V))
            dots = _fold_dots(V[r0:r1], c_mat)
            S = dots / (nv[r0:r1, None] * c_norm[None, :])
            best[r0:r1] = S.argmax(axis=1)
        return best

    def residuals(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"id": [], "rv": []})
                continue
            V = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            R = V - c_mat[_coarse_best(V)]
            yield pd.DataFrame({"id": pdf["id"].to_numpy(), "rv": list(R)})

    # materialized once: the m_sub per-subspace k-means each run a seed
    # job + (iters-1) recompute jobs over this bounded (≤ train_cap)
    # relation — without the cut they would recompute the Arrow
    # assignment 8× per job
    trr = materialize(
        base.filter(F.col("id") % pq_stride == 0).mapInPandas(
            residuals, resid_schema
        )
    )
    cbs = train_subspace_codebooks(
        trr.select("id", F.col("rv").alias("v")), m_sub, d0, ksub, iters
    )
    C = [np.asarray(cb, dtype=np.float64) for cb in cbs]

    build_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("cid", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def build(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"id": [], "cid": [], "codes": []})
                continue
            V = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            best = _coarse_best(V)
            R = V - c_mat[best]
            codes = np.empty((len(V), m_sub), dtype=np.int32)
            for s in range(m_sub):
                P = R[:, s * d0 : (s + 1) * d0]
                d = np.zeros((len(P), len(C[s])))
                for j in range(d0):  # exact left fold over dimensions
                    dcol = P[:, j, None] - C[s][None, :, j]
                    d += dcol * dcol
                codes[:, s] = d.argmin(axis=1)  # first index on ties
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "cid": c_ids[best],
                    "codes": list(codes),
                }
            )

    encoded = base.mapInPandas(build, build_schema)

    q_rows = (
        queries.select(F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"))
        .orderBy("qid")
        .collect()
    )
    if not q_rows:
        # see _ivfpq_adc_topk: zero query structs would explode VOID
        return encoded.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, score double, rank int"
        )

    def lut_for(qv: list[float], s: int) -> list[float]:
        out = []
        for c in range(ksub):
            acc = 0.0
            for j in range(d0):  # same left fold as the SQL dot chain
                acc += qv[s * d0 + j] * cbs[s][c][j]
            out.append(acc)
        return out

    structs = []
    for r in q_rows:
        qv = np.asarray(list(r.qv), dtype=np.float64)
        qn = np.sqrt(np.cumsum(qv * qv)[-1])
        dots = _fold_dots(qv[None, :], c_mat)[0]
        sims = dots / (qn * c_norm)
        probed = sorted(range(len(c_ids)), key=lambda j: (-sims[j], c_ids[j]))
        cells = probed[:n_probe]
        # coarse term <q, c_cid> per probed cell: the same 0.0-seeded
        # left fold as lut_for, replayed by the oracle's unrolled dot
        qlist = list(r.qv)
        whens = []
        for j in cells:
            acc = 0.0
            for t in range(dim):
                acc += qlist[t] * float(c_mat[j][t])
            whens.append(
                "WHEN (cid = {}) THEN {}".format(int(c_ids[j]), _sql_double(acc))
            )
        cterm = "CASE " + " ".join(whens) + " END"
        luts = [lut_for(qlist, s) for s in range(m_sub)]
        # probed-cell guard OUTSIDE the chain: unprobed rows
        # short-circuit to NULL without evaluating it; score = coarse
        # term + residual ADC, left-associated (the cterm CASE is
        # duplicated in guard and sum exactly as the former Column
        # build duplicated its `cterm` expression tree)
        chain = _adc_chain_sql(luts)
        structs.append(
            "named_struct('query_id',CAST({qid} AS BIGINT),'score',"
            "CASE WHEN (({ct}) IS NOT NULL) THEN round((({ct})+{ch}),6) "
            "END)".format(qid=int(r.qid), ct=cterm, ch=chain)
        )
    scored = (
        encoded.select(
            F.col("id").alias("neighbor_id"),
            F.col("cid"),
            _adc_explode(structs).alias("qs"),
        )
        .select("qs.query_id", "neighbor_id", "qs.score")
        .filter(F.col("score").isNotNull() & (F.col("query_id") != F.col("neighbor_id")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if rerank_mult is None:
        return ranked.filter(F.col("rank") <= k).select(
            "query_id", "neighbor_id", "score", "rank"
        )
    c = max(k, rerank_mult * k)
    cand = ranked.filter(F.col("rank") <= c).select("query_id", "neighbor_id")
    cvec = ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
        ),
        VEC_BYTES_PER_SLICE,
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    cos = cosine_udf()
    rescored = (
        cvec.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos(F.col("qv"), F.col("cv")), 6).alias("score"),
        )
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def pq_topk_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    c_mult: int = 4,
    m_sub: int = 8,
    ksub: int = 16,
    iters: int = 2,
    train_cap: int = PQ_TRAIN_CAP,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """PQ scan + exact re-rank: the ADC compressed scan nominates the
    top ``c = c_mult·k`` candidates per query, then ONLY those rows'
    true vectors are fetched and scored with exact cosine (the same
    scoring as brute_force_topk, so recall is measured against the
    ground-truth ranking it approximates). This recovers most of the
    recall ADC quantization loses — r7 measured pq_topk at ~0.3
    recall@5 on isotropic Gaussians (the documented worst case); the
    re-rank lifts the planted-twin fixture to ≥0.9 recall@10
    (tests/test_functions.py) — while preserving the memory story:

    - The compressed scan still never touches a vector (the 64×
      smaller read is unchanged).
    - The candidate relation is |queries|·c rows — broadcast onto a
      second corpus scan that reads only (id, vector) for the matched
      rows (broadcast hash semi-join shape: no corpus shuffle, no new
      scale risk; at 10^10 vectors the scan is column-pruned to the
      id+vector columns and the join output is |queries|·c rows).
    - The final rank window is over |queries|·c rows — driver-scale.

    Exactness: candidates come from pq_topk (oracle-replayed ADC), and
    the re-rank cosine is the same exact left-fold the brute-force
    oracle replays — the whole operator is SQL-expressible.
    """
    c = max(k, c_mult * k)
    cand = pq_topk(
        corpus,
        queries,
        k=c,
        m_sub=m_sub,
        ksub=ksub,
        iters=iters,
        train_cap=train_cap,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
    ).select("query_id", "neighbor_id")
    cvec = ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
        ),
        VEC_BYTES_PER_SLICE,
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    cos = cosine_udf()
    scored = (
        cvec.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos(F.col("qv"), F.col("cv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    c: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Maximal Marginal Relevance diverse top-k (Carbonell & Goldstein,
    SIGIR 1998 — public paper): greedily select ``k`` of the top-``c``
    relevance candidates, each pick maximizing
    ``lam·sim(q,d) − (1−lam)·max_{s∈selected} sim(d,s)`` — the
    standard redundancy-penalized re-rank a retrieval/training-mix
    pipeline runs so near-duplicate passages don't crowd a context
    window or a mixture quota. Returns (query_id, neighbor_id, score,
    mmr, rank): ``score`` = cosine relevance, ``mmr`` = the value the
    pick maximized (= score for rank 1), rank 1..min(k, candidates).

    Scale shape: the ONLY corpus-scale stage is candidate generation
    (exact brute-force scan here, same contract as brute_force_topk —
    at larger scale swap the nomination for ivf/pq_rerank, the
    selection below is source-agnostic). Everything after is bounded
    by construction: candidate vectors are fetched with a broadcast
    semi-join (the pq_rerank shape — no corpus shuffle), pairwise
    candidate similarity is |q|·c² rows, and the greedy loop runs
    per-query in ONE cogrouped applyInPandas pass (each group is c
    rows — driver never loops).

    Exactness: relevance and pairwise cosines are round-6 JVM values
    (the brute-force contract); the greedy arithmetic
    ``lam·score − (1−lam)·pen`` is plain IEEE double on grid inputs,
    bit-identical in numpy and the oracle's unrolled-iteration SQL;
    ties resolve to the smaller neighbor id in both."""
    # the nomination subtree feeds THREE consumers (both sides of the
    # pairwise self-join via cwith, and the cogroup's candidate input);
    # materialize once at |q|·c rows so the corpus-scale scan+window
    # runs exactly once instead of once per plan branch
    cand = (
        brute_force_topk(
            corpus, queries, k=c, id_col=id_col, vec_col=vec_col, dim=dim
        )
        .select("query_id", "neighbor_id", "score")
        .transform(materialize)
    )
    cvec = ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
        ),
        VEC_BYTES_PER_SLICE,
    )
    # same for the vector fetch: cwith appears on both sides of the
    # pairwise join — checkpoint keeps the corpus fetch join single-run
    cwith = (
        cvec.join(
            F.broadcast(cand.select("query_id", "neighbor_id")), "neighbor_id"
        )
        .select("query_id", "neighbor_id", "cv")
        .transform(materialize)
    )
    cos = cosine_udf()
    a, b = cwith.alias("a"), cwith.alias("b")
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.neighbor_id") != F.col("b.neighbor_id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.neighbor_id").alias("na"),
            F.col("b.neighbor_id").alias("nb"),
            F.round(cos(F.col("a.cv"), F.col("b.cv")), 6).alias("psim"),
        )
    )
    pen_coef = 1.0 - lam

    def greedy(key, cand_pdf, pairs_pdf):
        qid = key[0]
        n = len(cand_pdf)
        if n == 0:
            return pd.DataFrame(
                columns=["query_id", "neighbor_id", "score", "mmr", "rank"]
            )
        ids = cand_pdf["neighbor_id"].to_numpy()
        qs = cand_pdf["score"].to_numpy(dtype=np.float64)
        # no int() casts: ids keep the input column's type (string ids
        # work — the _tiered_kmeans / lang_id_trained id-type pattern)
        idx = {v: i for i, v in enumerate(ids)}
        P = np.zeros((n, n), dtype=np.float64)
        for na, nb, ps in zip(
            pairs_pdf["na"], pairs_pdf["nb"], pairs_pdf["psim"]
        ):
            P[idx[na], idx[nb]] = ps
        remaining = np.ones(n, dtype=bool)
        # -inf start: the max similarity to the selected set can be
        # NEGATIVE (anti-similar candidates earn a bonus, which is
        # MMR's point) — a zero floor would silently clamp it.
        maxpen = np.full(n, -np.inf, dtype=np.float64)
        out = []
        for r in range(min(k, n)):
            mmr = qs if r == 0 else lam * qs - pen_coef * maxpen
            best = -1
            for i in range(n):
                if not remaining[i]:
                    continue
                if (
                    best < 0
                    or mmr[i] > mmr[best]
                    or (mmr[i] == mmr[best] and ids[i] < ids[best])
                ):
                    best = i
            out.append((qid, ids[best], qs[best], float(mmr[best]), r + 1))
            remaining[best] = False
            maxpen = np.maximum(maxpen, P[:, best])
        return pd.DataFrame(
            out, columns=["query_id", "neighbor_id", "score", "mmr", "rank"]
        )

    # derive both id field types from the actual frames (string/int ids
    # both work) instead of hard-coding long — the _tiered_kmeans /
    # _lang_id_trained_arrow pattern
    qid_t = cand.schema["query_id"].dataType.simpleString()
    nid_t = cand.schema["neighbor_id"].dataType.simpleString()
    return (
        cand.groupBy("query_id")
        .cogroup(pairs.groupBy("query_id"))
        .applyInPandas(
            greedy,
            f"query_id {qid_t}, neighbor_id {nid_t}, "
            "score double, mmr double, rank int",
        )
    )


def embedding_near_dup(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int | None = None,
    bands: int = 4,
    target_bucket: int = 64,
    salt_tile: int = 2048,
) -> DataFrame:
    """Cosine-threshold near-duplicate pairs via the banded sketch:
    pairs must share a band, then exact cosine ≥ threshold.
    Returns (id_a, id_b, score), id_a < id_b.

    The default sketch width SCALES WITH THE CORPUS: bits-per-band =
    ceil(log2(n / target_bucket)), so each band partitions the corpus
    into ~n/target_bucket buckets and the in-bucket all-pairs stage
    stays O(n · target_bucket) total. A fixed width is quadratic —
    the 30× rehearsal measured 16 bits at 60k vectors: ~3.7k-row
    buckets, 331 s (vs 12.8 s at 20k) — exactly the bucket-growth
    blowup this formula removes. Bits-per-band caps at
    ``min(14, 62 // bands)`` so the packed long never exceeds 62 bits
    (bit 63 is the sign; shifting into it flips the packed value
    negative and wider shifts wrap to 0 — silent wrong sketches).
    Raising ``bands`` therefore NARROWS each band past 4 bands rather
    than widening the total; per-band recall is (1-θ/π)^r, so more
    bands at fixed total width trades precision for recall — the
    right direction for loose thresholds. An explicit ``n_bits`` is
    honored verbatim (but validated ≤ 62) — that is what lets the SQL
    oracle replay the exact bucket structure."""
    n_bits = _resolve_band_width(df, n_bits, bands, target_bucket)
    r = n_bits // bands
    mask = (1 << r) - 1
    sketch = sketch_udf(dim, n_bits)
    base = (
        ensure_parallelism(df, VEC_BYTES_PER_SLICE)
        .select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
        .withColumn("sk", sketch("v"))
        .select(
            "id",
            "v",
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(F.col("sk"), b * r).bitwiseAND(F.lit(mask))
                        for b in range(bands)
                    ]
                )
            ).alias("band", "key"),
        )
    )
    # base feeds BOTH the bucket-size census (big) and the salted
    # join: materialize once so the corpus-scale sketch UDF runs one
    # time, not once per branch (the fd301b6 reused-subtree rule).
    base = base.transform(materialize)

    # All pairs within a bucket via exact-fold bucket matmuls (see
    # lsh_topk.score_bucket): vectors shuffled once per band, not per
    # pair. TILED + pre-filtered + SALTED: the sketch cannot split a
    # tight cosine CLUSTER (every member lands on the same side of
    # every hyperplane, so more bits never separate them) — a label
    # cluster of c vectors is one c-row bucket no matter the width.
    # The sf10 rehearsal hit c ≈ 20k: a dense c×c score matrix is
    # 3.2 GB and emitting all c² pre-threshold rows OOM-killed the
    # JVM. Tiles bound worker memory at O(TILE²) and the threshold
    # prunes inside the UDF (with a margin wider than the
    # round-half-up boundary, so the JVM-side exact filter still
    # decides membership bit-identically). The salt then spreads the
    # O(c²/TILE²) tile-pair units across the CLUSTER: without it an
    # oversized bucket is one applyInPandas group = one task, and at
    # sf10 embedding_near_dup spent most of its wall in a few
    # hot-bucket stragglers while 29 cores idled. Each row gets a
    # deterministic tile t = pmod(xxhash64(id), n_tiles) and is
    # replicated once per tile u; the subgroup key (band, key,
    # least(t,u), greatest(t,u)) is a SEPARATE group, so every
    # unordered row pair meets in exactly one subgroup and a c-row
    # cluster becomes ~(c/TILE)²/2 independent tasks. Replication
    # cost is n_tiles× rows for oversized buckets only — the same
    # O(c²/TILE) volume their pair mining already pays. Normal
    # buckets (≤ TILE rows, the overwhelming mass under the
    # auto-width policy) take the nt=1 fast path: one subgroup, no
    # replication. Salting never changes the output: per-pair scores
    # are the same per-dimension left fold regardless of tile shape,
    # so oracle float parity is preserved (property-tested directly:
    # tests/test_properties.py forces salt_tile ∈ {1, 2, 7} and
    # asserts pair-set equality against the unsalted run).
    tile = salt_tile

    big = (
        base.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(F.col("bucket_n") > tile)
    )
    # oversized buckets are ≤ n/TILE and empty in the healthy regime —
    # AQE sees the tiny agg output at the stage boundary and broadcasts
    salted = (
        base.join(big, ["band", "key"], "left")
        .withColumn(
            "nt", F.ceil(F.coalesce(F.col("bucket_n"), F.lit(1)) / tile).cast("int")
        )
        .withColumn("t", F.pmod(F.xxhash64("id"), F.col("nt")).cast("int"))
        .select(
            "id",
            "v",
            "band",
            "key",
            "t",
            F.explode(F.sequence(F.lit(0), F.col("nt") - 1)).alias("u"),
        )
        .select(
            "id",
            "v",
            "band",
            "key",
            "t",
            F.least("t", "u").alias("ti"),
            F.greatest("t", "u").alias("tj"),
        )
    )

    def pairs_in_subgroup(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "score": []})
        if len(pdf) < 2:
            return empty
        ti, tj = int(pdf["ti"].iat[0]), int(pdf["tj"].iat[0])
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        if ti == tj:
            # diagonal subgroup: upper triangle over id-sorted rows
            V = np.asarray([np.asarray(x) for x in pdf["v"]])
            ids = pdf["id"].to_numpy()
            order = np.argsort(ids, kind="stable")
            V, ids = V[order], ids[order]
            nv = np.sqrt(np.cumsum(V * V, axis=1)[:, -1])
            m = len(ids)
            for i0 in range(0, m, tile):
                i1 = min(i0 + tile, m)
                for j0 in range(i0, m, tile):  # ids sorted → j tiles ≥ i tiles
                    j1 = min(j0 + tile, m)
                    S = _fold_dots(V[i0:i1], V[j0:j1]) / (
                        nv[i0:i1, None] * nv[None, j0:j1]
                    )
                    keep = (ids[i0:i1, None] < ids[None, j0:j1]) & (
                        S >= threshold - 1e-6
                    )
                    ai, bi = np.nonzero(keep)
                    if len(ai):
                        out_a.append(ids[i0:i1][ai])
                        out_b.append(ids[j0:j1][bi])
                        out_s.append(S[ai, bi])
        else:
            # off-diagonal: full cross of the two tiles' rows; hashed
            # tiles are unordered, so orient each pair by id here
            a = pdf[pdf["t"] == ti]
            b = pdf[pdf["t"] == tj]
            if len(a) == 0 or len(b) == 0:
                return empty
            A = np.asarray([np.asarray(x) for x in a["v"]])
            B = np.asarray([np.asarray(x) for x in b["v"]])
            aids = a["id"].to_numpy()
            bids = b["id"].to_numpy()
            na = np.sqrt(np.cumsum(A * A, axis=1)[:, -1])
            nb = np.sqrt(np.cumsum(B * B, axis=1)[:, -1])
            for i0 in range(0, len(aids), tile):  # hash imbalance guard
                i1 = min(i0 + tile, len(aids))
                for j0 in range(0, len(bids), tile):
                    j1 = min(j0 + tile, len(bids))
                    S = _fold_dots(A[i0:i1], B[j0:j1]) / (
                        na[i0:i1, None] * nb[None, j0:j1]
                    )
                    keep = S >= threshold - 1e-6
                    ai, bi = np.nonzero(keep)
                    if len(ai):
                        x = aids[i0:i1][ai]
                        y = bids[j0:j1][bi]
                        out_a.append(np.minimum(x, y))
                        out_b.append(np.maximum(x, y))
                        out_s.append(S[ai, bi])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "score": np.concatenate(out_s),
            }
        )

    pairs = (
        # explicit repartition on the FULL salted key: a shuffle join
        # above would leave (band, key) partitioning, which satisfies
        # the groupBy's clustering requirement — Spark would add no
        # exchange and every subgroup of a hot bucket would land in
        # the SAME task, defeating the salt
        salted.repartition("band", "key", "ti", "tj")
        .groupBy("band", "key", "ti", "tj")
        .applyInPandas(pairs_in_subgroup, "id_a long, id_b long, score double")
        .select("id_a", "id_b", F.round("score", 6).alias("score"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("score") >= threshold)
    )
    return pairs


def quantized_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 4.0,
) -> DataFrame:
    """Grid-quantized exact embedding dedup: floor every component to
    a 1/scale lattice, group on the md5 of the quantized vector.
    Returns (qkey, keep_id, n_members).

    The O(n) complement to the banded cosine path: one map pass + one
    uniform-key shuffle, no pairs, no verification stage — the cheap
    first-line dedup for re-encoded/re-crawled embeddings whose drift
    is below the lattice step. Deterministic integer-boundary floors
    (use a power-of-two scale: x*scale is then exact in binary
    floating point), so a SQL oracle replays membership exactly."""
    key = F.md5(
        F.concat_ws(
            ",",
            F.transform(
                as_double(F.col(vec_col)),
                lambda x: F.floor(x * scale).cast("long").cast("string"),
            ),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"), key.alias("qkey"))
        .groupBy("qkey")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_members"))
    )
