"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
   "sf": ..., "canary": {...}, "value_canary_normalized": ...}

Each query is timed end-to-end (plan + execute + materialize counts) on a
warm session. The headline metric is the sum of per-query wall times.

Host-drift canary (round-7): this host's ambient condition drifts the
identical bench 23.8-41 s across a day (BASELINE.md host notes), which
drowns round-over-round signal. Two fixed-cost data-independent probes
run FIRST — a codegen leg (64M-row arithmetic range sum) and an Arrow
leg (pandas_udf numpy loop over 4M rows, the allocation-sensitive
path) — each min-of-3, and the headline total is also reported
normalized by the pinned reference ratios. Raw stays the headline
`value`; the normalized figure is for cross-round comparison.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: relational joins/aggs, message pipeline, dedup, ANN, text,
# events windows — one per operator family
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q10_returned_items",
    "topk_customers_per_nation",
    "grouping_sets_orders",
    "exists_subquery",
    "running_revenue_window",
    "range_join_value_bands",
    "events_tumbling_window",
    "events_sessionization",
    "events_asof_join",
    "pipeline_chain",
    "text_stats",
    "text_quality",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_xxh",
    "dedup_ngram_jaccard",
    "dedup_ngram_dfcut",
    "dedup_simhash",
    "dedup_connected_components",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "embedding_near_dup",
]

# SECOND headline set (r10 verdict #5), frozen at r11: the r1 set above
# predates everything built after round 1, so regressions in the newer
# families were invisible to the headline number. One query per
# post-r1 family — tokenizer, winnowing, DSIR, PCA, line-level dedup,
# boilerplate, sketches, span removal, decontamination, SemDeDup,
# tiered k-means, MMR, PQ re-rank, residual IVF-PQ, hybrid retrieval.
# NEVER edit this list (comparability contract, same as HEADLINE);
# reported as value2/queries2 alongside — never replacing — the r1 set.
HEADLINE2 = [
    "bpe_encode_docs",
    "dedup_winnow",
    "dsir_select",
    "embedding_pca",
    "line_dedup_firstkeep",
    "boilerplate_removal",
    "heavy_hitters_cms",
    "repeated_span_removal",
    "fuzzy_decontamination",
    "semdedup_prune",
    "kmeans_tiered",
    "mmr_diverse_topk",
    "ann_topk_pq_rerank",
    "ann_topk_ivfpq_residual",
    "hybrid_search_rrf",
]

# THIRD headline set, frozen at r12: the crawl-ingest front end and
# the r12 codec/image-dedup families (WARC framing + HTTP unwrap,
# HTML extraction, charset decode, URL canonicalization, GIF LZW,
# BMP, G.711, animated-frame sampling, dHash near-dup mining). Same
# contract as the other two sets: NEVER edit; reported as
# value3/queries3 alongside.
HEADLINE3 = [
    "warc_extract",
    "html_extract",
    "charset_decode",
    "url_normalize_check",
    "gif_decode",
    "gif_frame_sample",
    "bmp_decode",
    "wav_g711_features",
    "image_near_dup",
]
# r13 NOTE (comparability): the list above is frozen, but
# gif_frame_sample's SEMANTICS changed in r13 — synth keys %3 != 0 now
# carry sub-canvas delta frames and run the real composition chain, so
# its wall recalibrated 3.35 → ~4.6 s at sf0.1 BY DESIGN (see the
# BASELINE.md r13 decade-rehearsal entry). Compare HEADLINE3 against
# the r13 recalibration, not the r12 12.39 s.

# FOURTH headline set, frozen at r13: the r13 ingest/extraction
# families — PDF text extraction, structure-preserving Markdown,
# sitemap inventory, ingest-coverage telemetry, EXIF orientation
# normalization. Same contract: NEVER edit; reported as
# value4/queries4 alongside.
HEADLINE4 = [
    "pdf_extract",
    "docx_extract",
    "document_extract",
    "html_markdown",
    "sitemap_extract",
    "crawl_coverage",
    "image_auto_orient",
]
# r14 NOTES (comparability, list frozen): crawl_coverage's synth grew
# from 6 to 8 legs in r14 (adds a colonless-WARC-header leg and a REAL
# brotli decode leg), and image_auto_orient widened from 4 to all 8
# EXIF orientations — both walls recalibrate slightly BY DESIGN.
# r15 NOTE: crawl_coverage grew to 9 legs (adds a REAL zstd decode
# leg; leg 1's undecodable coding re-pointed zstd → compress).

# FIFTH headline set, frozen at r14: the r13-late + r14 families —
# spaceless-script (CJK) near-dup mining through the script-spread
# tokenizer, per-domain crawl quotas, sentence segmentation, feed
# extraction. Same contract: NEVER edit; reported as value5/queries5.
HEADLINE5 = [
    "dedup_minhash_cjk",
    "domain_quota_sample",
    "sentence_split",
    "feed_extract",
]


# pinned on the r7 session host at its quietest observed moment
# (codegen 0.179 s, arrow 0.545 s — BENCH_r07 recorded 0.177/0.544).
# A judge re-run computes its own ratios against these, so the
# normalized totals are comparable across rounds even when the raw
# ones drift.  Each leg's ratio is clamped at 1.0 below, so the
# reference MUST be an actually-observed quiet-host time: a reference
# below anything the host can reach would force host_factor > 1 on
# every run and systematically deflate the normalized value (r7
# shipped 0.145/0.414 here, which did exactly that — fixed per r7
# ADVICE; normalized figures from r7 and earlier carry that ~20% bias).
CANARY_REF = {"codegen": 0.179, "arrow": 0.545}


import pandas as pd  # module-level: the pandas_udf type-hint resolver
# looks the 'pd.Series' annotation up in module globals


def _canary_times(spark) -> dict[str, float]:
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def _heavy(x: pd.Series) -> pd.Series:
        import numpy as np

        v = x.to_numpy(dtype="float64")
        acc = np.zeros_like(v)
        for _ in range(8):
            acc = acc * 1.0000001 + np.sqrt(v + acc)
        return pd.Series(acc)

    def codegen():
        spark.range(64 << 20).select(
            F.sum((F.col("id") % 97) * (F.col("id") % 101))
        ).collect()

    def arrow():
        spark.range(4 << 20).select(
            F.sum(_heavy(F.col("id").cast("double")))
        ).collect()

    out = {}
    for name, fn in [("codegen", codegen), ("arrow", arrow)]:
        fn()  # warm
        best = None
        for _ in range(3):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def _streaming_bench(spark) -> dict:
    """Micro-batch throughput legs (r7 verdict #6 — the streaming layer
    had correctness evidence but no recorded throughput).

    Two legs, each a real ``writeStream`` driven to completion with
    ``processAllAvailable`` over file-stream micro-batches built from
    the bench SF dir (inputs are staged untimed; the timed window is
    start → all batches committed, so per-query stream-init cost is
    included — a real always-on stream amortizes it, so treat these as
    LOWER bounds on steady-state rows/sec):

    - ``curation``: the e2e doc chain (redact_pii → repetition_filter →
      quality_filter → fingerprint → dedup_within_watermark) over the
      documents table in 4 micro-batches, exactly-once epoch file sink —
      the Arrow-UDF + stateful-dedup path.
    - ``events_window``: watermarked 5-minute tumbling aggregation over
      the events table in 4 micro-batches, update mode to the noop sink —
      the pure-JVM stateful-agg path.

    Each leg is min-of-2 full stream runs (fresh checkpoint/output per
    rep — criterion-style, same as the batch legs): the r8→r9 closes
    showed a wide single-run noise band (646-839 rows/s on curation),
    which made round-over-round streaming comparisons mostly noise.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from nekton_spark.spec import Spec, run_spec

    out: dict[str, dict] = {}
    work = tempfile.mkdtemp(prefix="bench_stream_")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # ---- leg 1: curation chain over documents ----
        docs_src = os.path.join(work, "docs_src")
        docs = (
            spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .select(
                "doc_id",
                F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")).alias("ts"),
                "text",
            )
        )
        n_docs = docs.count()
        docs.repartition(32).write.mode("overwrite").parquet(docs_src)
        # state_partitions pinned at 8 (r15, r14 verdict #4): the r14
        # A/B adjudicated the curation floor as per-partition
        # state-store delta-commit cost (32→8→2 partitions gave
        # 5.6→2.3→2.2 s on constant data), so an UNpinned leg measured
        # the session's ambient shuffle count, not the engine — the
        # 821→410 rows/s r13→r14 driver swing class. Pinning makes the
        # BASELINE.md rows/s floor a one-look adjudication. The
        # session conf is restored before the events leg below
        # (run_spec leaves it set for streaming sinks by design).
        curation_state_partitions = 8
        spec_tpl = (
            f"engine:\n  state_partitions: {curation_state_partitions}\n"
        ) + """
input:
  type: file
  path: {src}
  format: parquet
  stream: true
  as_messages: false
  schema: "doc_id long, ts timestamp, text string"
  maxFilesPerTrigger: "8"
pipeline:
  processors:
{procs}
output:
  type: file_exactly_once
  path: {out}
  checkpoint: {ckpt}
"""
        stages = [
            ("redact_pii", "    - type: redact_pii\n      counts: true"),
            (
                "repetition_filter",
                "    - type: repetition_filter\n      max_dup_fraction: 0.5",
            ),
            (
                "quality_filter",
                "    - type: quality_filter\n      min_quality: 0.2",
            ),
            ("fingerprint", "    - type: fingerprint"),
            (
                "dedup_within_watermark",
                "    - type: dedup_within_watermark\n      columns: [fp]"
                "\n      ts_col: ts\n      delay: 60 minutes",
            ),
        ]
        full_procs = "\n".join(s[1] for s in stages)

        def run_curation(procs: str, tag: str) -> tuple[float, object]:
            spec = spec_tpl.format(
                src=docs_src,
                procs=procs,
                out=os.path.join(work, f"docs_out_{tag}"),
                ckpt=os.path.join(work, f"docs_ckpt_{tag}"),
            )
            t0 = time.time()
            q = run_spec(spark, Spec.from_yaml(spec))
            q.processAllAvailable()
            w = time.time() - t0
            dur: dict[str, float] = {}
            for p in q.recentProgress:
                for dk, dv in (p.durationMs or {}).items():
                    dur[dk] = dur.get(dk, 0) + dv
            q.stop()
            return w, dur

        wall = math.inf
        dur_best: dict[str, float] = {}
        for rep in range(2):
            w, dur = run_curation(full_procs, f"full{rep}")
            if w < wall:
                wall, dur_best = w, dur
        out["curation"] = {
            "rows": n_docs,
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(n_docs / wall),
            "state_partitions": curation_state_partitions,
            # r9 verdict #5: micro-batch duration breakdown of the best
            # full-chain run (summed across batches) — separates
            # batch-execution cost from offset/commit/planning overhead
            "duration_breakdown_sec": {
                k: round(v / 1000.0, 3) for k, v in sorted(dur_best.items())
            },
        }

        # Per-processor attribution (r9 verdict #5): run the chain at
        # increasing prefix lengths (prefix 0 = a noop processor: the
        # source→sink floor incl. stream init), one run each; a
        # stage's cost = its prefix wall minus the previous prefix's.
        # Deltas include plan-fusion effects by design (that IS the
        # marginal cost of adding the stage to this chain) and single
        # runs ride the ambient noise band — localization signal, not
        # a headline metric.
        prefix_walls = [run_curation("    - type: noop", "p0")[0]]
        for i in range(1, len(stages) + 1):
            procs = "\n".join(s[1] for s in stages[:i])
            prefix_walls.append(run_curation(procs, f"p{i}")[0])
        stage_attr = {"base_stream_noop": round(prefix_walls[0], 3)}
        for i, (name, _) in enumerate(stages):
            stage_attr[name] = round(
                max(prefix_walls[i + 1] - prefix_walls[i], 0.0), 3
            )
        out["curation"]["stage_attribution_sec"] = stage_attr
        print(f"# curation stages: {stage_attr}", file=sys.stderr)

        # the curation specs' engine block left the session at the
        # pinned count; hand the ambient value back before leg 2
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)

        # ---- leg 2: watermarked tumbling agg over events ----
        ev_src = os.path.join(work, "ev_src")
        ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        n_ev = ev.count()
        ev.repartition(32).write.mode("overwrite").parquet(ev_src)
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", "8")
            .parquet(ev_src)
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        )
        wall = math.inf
        for rep in range(2):
            t0 = time.time()
            q = (
                agg.writeStream.format("noop")
                .outputMode("update")
                .option(
                    "checkpointLocation", os.path.join(work, f"ev_ckpt{rep}")
                )
                .start()
            )
            q.processAllAvailable()
            q.stop()
            wall = min(wall, time.time() - t0)
        out["events_window"] = {
            "rows": n_ev,
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(n_ev / wall),
        }
    finally:
        # idempotent re-restore: covers a curation-leg exception
        # escaping before the inline restore above
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)
    return out


def _clustered_embeddings(spark, n: int, dim: int = 64, n_clusters: int = 64,
                          sigma: float = 0.10, seed: int = 20260815):
    """Deterministic mixture-of-Gaussians embedding corpus (r9 verdict
    #4): unit-norm cluster centers drawn once from a fixed-seed RNG,
    row i assigned to cluster i % n_clusters with within-cluster noise
    sigma ≪ 1 — real embedding geometry (tight semantic clusters),
    unlike the isotropic testdata corpus where ANN recall is pinned to
    the structureless worst case. Generated in-memory (numpy) and
    handed to Spark as one frame; vec_id = row index."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cl = np.arange(n) % n_clusters
    X = centers[cl] + sigma * rng.standard_normal((n, dim))
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _ann_recall_bench(spark) -> dict:
    """Per-method recall@10 vs brute-force cosine at the bench SF
    (r8 verdict #5 — recall was previously asserted only on planted
    tiny fixtures, so a recall regression was invisible between
    rounds). Two legs per method, each with 20 fixed queries against
    the full bench embedding corpus at engine-default knobs:

    - ``recall_at_10``: queries = corpus rows vec_id < 20, truth =
      brute-force cosine top-10. The bench corpus is ISOTROPIC random
      Gaussians — the documented approximate-NN worst case (top-10
      neighbors are barely-above-ambient cosines, so candidate pruning
      has almost no structure to exploit). Absolute values are
      therefore LOW BY DATA DESIGN; the leg exists for
      round-over-round regression visibility, not as a quality score.
    - ``twin_recall_at_10``: queries = deterministic near-copies of
      corpus rows vec_id < 20 (each component ×1.0001, query_id =
      vec_id + 10^9), measuring whether each method surfaces the
      planted twin in its top-10 — recall on MEANINGFUL structure,
      the number that should stay ≈1.0 for lsh/rerank-style methods.
    - ``clustered_recall_at_10`` (r9 verdict #4): same protocol on a
      deterministic mixture-of-Gaussians corpus of the same size
      (64 unit-norm cluster centers, within-cluster σ=0.10 — real
      embedding geometry). Mid-range by design, so band/probe/
      codebook regressions MOVE it — the tuning signal the isotropic
      leg cannot be. σ chosen so no method saturates (r10 probe at
      the then-default n_probe=2: lsh .65 / ivf .47 / pq .49 /
      pq_rerank .96 / ivfpq .37; at σ=.05 pq_rerank pins to 1.0 and
      can only regress silently). The leg already earned its keep:
      the r10 n_probe sweep it enabled moved the engine default to 4
      (ivf .47→.64, ivfpq .37→.465, no wall cost), so expect those
      two rows to sit higher from r10 on. r11 adds ivfpq_residual
      (residual encoding + exact re-rank): expect clustered ≈ ivf's
      .64 — the probed-set cosine ceiling — at ivfpq-like wall. r11
      also adds the kmeans-coarse variants (ivf_kmeans,
      ivfpq_residual_k): trained cells lift the probed ceiling
      itself — expect clustered ≈ .92 for both.

    Wall is build + search, min-of-1 — informational only."""
    from pyspark.sql import functions as F

    from nekton_spark.functions import similarity as sim

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    k = 10
    q_nat = emb.filter(F.col("vec_id") < 20)
    q_twin = q_nat.select(
        (F.col("vec_id") + F.lit(1_000_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.0001)).alias("embedding"),
    )

    def topk_sets(df):
        out: dict[int, set[int]] = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    methods = {
        # sampled-coarse legs pinned (coarse="sample") for round-over-
        # round comparability — the engine DEFAULT is kmeans since r12,
        # measured by the *_kmeans/*_k legs (which therefore double as
        # the default-path recall floor)
        # single-probe pinned (multiprobe=0) for comparability — the
        # engine DEFAULT is multiprobe since r15 (verdict #5), measured
        # by the lsh_mp leg (which therefore doubles as the
        # default-path recall floor)
        "lsh": lambda c, q, k: sim.lsh_topk(c, q, k=k, multiprobe=0),
        "ivf": lambda c, q, k: sim.ivf_topk(c, q, k=k, coarse="sample"),
        "pq": sim.pq_topk,
        "pq_rerank": sim.pq_topk_rerank,
        "ivfpq": lambda c, q, k: sim.ivfpq_topk(c, q, k=k, coarse="sample"),
        "ivfpq_residual": lambda c, q, k: sim.ivfpq_residual_topk(
            c, q, k=k, coarse="sample"
        ),
        "lsh_mp": lambda c, q, k: sim.lsh_topk(c, q, k=k, multiprobe=1),
        "ivf_kmeans": lambda c, q, k: sim.ivf_topk(c, q, k=k, coarse="kmeans"),
        "ivfpq_residual_k": lambda c, q, k: sim.ivfpq_residual_topk(
            c, q, k=k, coarse="kmeans"
        ),
    }
    n_corpus = emb.count()
    clu = _clustered_embeddings(spark, n_corpus).cache()
    clu.count()
    q_clu = clu.filter(F.col("vec_id") < 20)

    truth = topk_sets(sim.brute_force_topk(emb, q_nat, k=k))
    truth_clu = topk_sets(sim.brute_force_topk(clu, q_clu, k=k))

    def mean_recall(got, t_sets):
        return sum(
            len(got.get(qid, set()) & t) / len(t) for qid, t in t_sets.items()
        ) / len(t_sets)

    out: dict[str, dict] = {}
    for name, fn in methods.items():
        t0 = time.time()
        got = topk_sets(fn(emb, q_nat, k=k))
        wall = time.time() - t0
        recall = mean_recall(got, truth)
        twin_got = topk_sets(fn(emb, q_twin, k=k))
        twin = sum(
            (qid - 1_000_000_000) in twin_got.get(qid, set())
            for qid in [r.vec_id for r in q_twin.select("vec_id").collect()]
        ) / 20
        clu_recall = mean_recall(topk_sets(fn(clu, q_clu, k=k)), truth_clu)
        out[name] = {
            "recall_at_10": round(recall, 3),
            "twin_recall_at_10": round(twin, 3),
            "clustered_recall_at_10": round(clu_recall, 3),
            "wall_sec": round(wall, 3),
        }
        print(f"# ann_recall {name}: {out[name]}", file=sys.stderr)
    clu.unpersist()
    return out


def _layout_pruning_bench(spark) -> dict:
    """Row groups READ (matched, of total) for a fixed 16-box predicate
    grid over events(user_id, value) at the bench SF, for three
    layouts: natural insertion order, Morton (zorder_write), Hilbert
    (hilbert_write) — measured from real parquet footers, the same
    min/max stats a scan prunes on. Lower = better; natural is the
    read-everything baseline, and Hilbert < Morton is the no-seams
    locality claim tracked per round. Also reports the one-off layout
    write wall (the range exchange any re-layout pays)."""
    import tempfile

    from nekton_spark.functions.layout import (
        hilbert_write,
        rowgroups_matching,
        zorder_write,
    )

    e = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    tmp = tempfile.mkdtemp(prefix="bench_layout_")
    paths = {"natural": os.path.join(tmp, "nat"),
             "morton": os.path.join(tmp, "z"),
             "hilbert": os.path.join(tmp, "h")}
    walls = {}
    t0 = time.time()
    e.repartitionByRange(16, "event_id").sortWithinPartitions(
        "event_id"
    ).write.mode("overwrite").parquet(paths["natural"])
    walls["natural"] = round(time.time() - t0, 3)
    t0 = time.time()
    zorder_write(e, paths["morton"], "user_id", "value", n_files=16)
    walls["morton"] = round(time.time() - t0, 3)
    t0 = time.time()
    hilbert_write(e, paths["hilbert"], "user_id", "value", n_files=16)
    walls["hilbert"] = round(time.time() - t0, 3)

    out: dict[str, dict] = {}
    for name, p in paths.items():
        m, t = 0, 0
        for ulo in (0, 1000, 2000, 3000):
            for vlo in (0.0, 25.0, 50.0, 75.0):
                mm, tt = rowgroups_matching(
                    p, "user_id", ulo, ulo + 300, "value", vlo, vlo + 10.0
                )
                m += mm
                t += tt
        out[name] = {
            "rowgroups_read": m,
            "rowgroups_total": t,
            "write_wall_sec": walls[name],
        }
        print(f"# layout_pruning {name}: {out[name]}", file=sys.stderr)
    return out


def main() -> int:
    import __spark_entry__ as entrymod

    from nekton_spark.session import get_spark

    # local mode: driver heap is the only memory pool. 24g, not 48g:
    # an oversized heap measured WORSE on a long-lived host (same
    # bench, same hour: 41.1 s at 48g vs 23.8 s at 24g) - huge-page
    # compaction stalls on a fragmented host dwarf the GC headroom it
    # buys, and the round-6 ledger's host-envelope finding (48g + 32
    # Arrow workers exceeding the 128 GB host) points the same way
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("nekton-bench")
    qs = entrymod.queries()

    # warm the JVM + Python-UDF-worker paths once (not timed): local-mode
    # worker spawn (~10 s for 32 workers) is a fixed local artifact a real
    # cluster amortizes across the app lifetime
    qs["q01_pricing_summary"](spark, SF_DIR).count()
    qs["ann_topk_bruteforce"](spark, SF_DIR).count()

    canary = _canary_times(spark)
    print(f"# canary: {canary}", file=sys.stderr)

    from pyspark.sql import functions as F

    # min of three runs per query (r7: was two): the host shows
    # background load that randomly inflates single runs by 5-20 s;
    # the min is the honest cost of the plan (criterion-style).
    #
    # Two actions per query (r7): `count` is the historical headline —
    # comparable back to round 1 — but Catalyst PRUNES unreferenced
    # projections out of a count() plan, so for pure-projection queries
    # (text_stats, text_quality, scalar_functions) it measures little
    # more than the scan. The `evaluated` leg forces every output
    # column through bit_xor(xxhash64(struct(*))) — the honest
    # all-columns cost (text_stats: 0.20 s counted vs 2.87 s evaluated
    # at sf0.1).
    def run_set(names: list[str]) -> tuple[dict[str, float], dict[str, float]]:
        t: dict[str, float] = {}
        t_eval: dict[str, float] = {}
        for name in names:
            fn = qs[name]
            best, n = None, 0
            for _ in range(3):
                t0 = time.time()
                n = fn(spark, SF_DIR).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            t[name] = round(best, 3)
            best_e = None
            for _ in range(2):
                # fn() inside the timer: operators with eager checkpoints
                # do their heavy work at build time
                t0 = time.time()
                df = fn(spark, SF_DIR)
                df.select(F.bit_xor(F.xxhash64(F.struct(*df.columns)))).collect()
                dt = time.time() - t0
                best_e = dt if best_e is None else min(best_e, dt)
            t_eval[name] = round(best_e, 3)
            print(
                f"# {name}: {n} rows in {t[name]:.2f}s"
                f" (evaluated {t_eval[name]:.2f}s)",
                file=sys.stderr,
            )
        return t, t_eval

    times, times_eval = run_set(HEADLINE)
    times2, times2_eval = run_set(HEADLINE2)
    times3, times3_eval = run_set(HEADLINE3)
    times4, times4_eval = run_set(HEADLINE4)
    times5, times5_eval = run_set(HEADLINE5)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(times.values()), 3)
    # host-condition factor: how much slower the fixed probes ran vs
    # their pinned references (mean of the two legs' ratios, each
    # clamped below at 1.0 so a faster-than-pin host never deflates)
    factor = (
        max(1.0, canary["codegen"] / CANARY_REF["codegen"])
        + max(1.0, canary["arrow"] / CANARY_REF["arrow"])
    ) / 2
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "canary": canary,
        "canary_ref": CANARY_REF,
        "host_factor": round(factor, 3),
        "value_canary_normalized": round(total / factor, 3),
        "queries_evaluated": times_eval,
        "value_evaluated": round(sum(times_eval.values()), 3),
        # second headline set (frozen r11): post-r1 families; the r1
        # set above is unchanged for round-over-round comparability
        "queries2": times2,
        "value2": round(sum(times2.values()), 3),
        "value2_canary_normalized": round(sum(times2.values()) / factor, 3),
        "queries2_evaluated": times2_eval,
        "value2_evaluated": round(sum(times2_eval.values()), 3),
        # third headline set (frozen r12): crawl-ingest + r12 codec /
        # image-dedup families
        "queries3": times3,
        "value3": round(sum(times3.values()), 3),
        "value3_canary_normalized": round(sum(times3.values()) / factor, 3),
        "queries3_evaluated": times3_eval,
        "value3_evaluated": round(sum(times3_eval.values()), 3),
        # fourth headline set (frozen r13): PDF / Markdown / sitemap /
        # coverage / orientation families
        "queries4": times4,
        "value4": round(sum(times4.values()), 3),
        "value4_canary_normalized": round(sum(times4.values()) / factor, 3),
        "queries4_evaluated": times4_eval,
        "value4_evaluated": round(sum(times4_eval.values()), 3),
        # fifth headline set (frozen r14): CJK script-tokenized
        # near-dup + crawl quota / sentence / feed families
        "queries5": times5,
        "value5": round(sum(times5.values()), 3),
        "value5_canary_normalized": round(sum(times5.values()) / factor, 3),
        "queries5_evaluated": times5_eval,
        "value5_evaluated": round(sum(times5_eval.values()), 3),
    }
    try:
        out["streaming"] = _streaming_bench(spark)
    except Exception as e:  # the batch headline must survive a streaming failure
        out["streaming"] = {"error": f"{type(e).__name__}: {e}"}
    try:
        out["ann_recall"] = _ann_recall_bench(spark)
    except Exception as e:
        out["ann_recall"] = {"error": f"{type(e).__name__}: {e}"}
    try:
        out["layout_pruning"] = _layout_pruning_bench(spark)
    except Exception as e:
        out["layout_pruning"] = {"error": f"{type(e).__name__}: {e}"}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
