"""Randomized-corpus extension of the correctness gate.

check_oracle.py proves Spark == DuckDB on the fixed synthetic corpus;
this tool proves it on ADVERSARIAL corpora the fixtures never cover —
leading/trailing whitespace, empty-ish docs, unicode, exact dups,
near-dup cliques, constant embedding clusters — by writing a seeded
random sf-dir and running the same query-vs-oracle comparison. It has
already caught one real parity bug (the classifier denominator
counting the empty token a space-only trim leaves before a leading
newline).

Usage: python tools/fuzz_oracle.py [seed] [query ...]
(default seed 0, default = every documents/embeddings-only query)
"""

from __future__ import annotations

import os
import random
import sys
import tempfile

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# documents/embeddings-only queries (no events/TPC-H tables involved)
DOC_QUERIES = [
    "text_stats", "text_quality", "gopher_quality_rules", "doc_repetition",
    "corpus_quality_gate", "dedup_exact", "dedup_simhash",
    "dedup_simhash_hamming", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_ngram_dfcut", "dedup_ngram_sampled", "common_passages",
    "pii_redaction", "unigram_logprob", "bigram_logprob", "tfidf_top_terms",
    "bm25_search", "chunk_documents", "vocab_top_tokens", "vocab_coverage",
    "sample_hash_10pct", "train_val_test_split", "stratified_sample",
    "weighted_sample_docs", "quota_sample_sources", "source_quality_rollup",
    "classifier_score_docs", "classifier_trained", "token_length_histogram",
    "boilerplate_removal", "fuzzy_decontamination", "curriculum_buckets",
    "bpe_merge_candidates", "decontamination_check", "bloom_decontamination",
    "dedup_incremental", "pack_sequences_check",
    # message-pipeline + codec families (documents-driven too: the
    # pipes transform text; the codecs synthesize payloads from doc_id)
    "pipe_replace", "pipe_regex_replace", "pipe_regex_split",
    "pipe_regex_select", "pipeline_chain", "pipe_subprocess",
    "jpeg_decode", "jpeg_color_decode", "image_decode", "image_resize",
    "audio_features", "video_frame_sample", "multimodal_features",
    "multimodal_decode", "text_stats",
]
EMB_QUERIES = [
    "ann_topk_bruteforce", "ann_topk_lsh", "ann_topk_ivf",
    "embedding_near_dup", "embedding_quant_dedup", "kmeans_clusters",
    "semdedup_prune",
]
EVENT_QUERIES = [
    "events_sessionization", "events_tumbling_window",
    "events_sliding_window", "events_interval_join", "events_asof_join",
    "events_lead_lag", "events_topk_users", "events_json_extract",
    "latest_event_per_user", "events_tier_rollup",
]

VOCAB = [
    "alpha", "Beta", "GAMMA", "delta", "x", "punct!", "a-b", "the", "and",
    "of", "naïve", "Ω", "mail@example.com", "192.168.0.1", "...", "#",
]


def gen_documents(rng: random.Random, n: int = 240) -> pd.DataFrame:
    rows = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.05:
            # exact duplicate of an earlier doc (dedup_exact fodder)
            text = rows[rng.randrange(len(rows))][1] if rows else "x y z"
        elif kind < 0.12 and rows:
            # near-dup: clone + drop one token
            base = rows[rng.randrange(len(rows))][1].split()
            if len(base) > 3:
                del base[rng.randrange(len(base))]
            text = " ".join(base)
        else:
            n_tok = rng.randint(1, 40)
            toks = [rng.choice(VOCAB) for _ in range(n_tok)]
            text = " ".join(toks)
            r = rng.random()
            if r < 0.1:
                text = "\n" + text          # leading newline (trim edge)
            elif r < 0.2:
                text = text + "  \n"        # trailing mixed whitespace
            elif r < 0.3:
                text = text.replace(" ", "\n", 2)  # embedded newlines
            elif r < 0.35:
                text = text.replace(" ", "\t", 1)  # tab separator
        rows.append((i, text))
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [rng.choice(["en", "es", "fr", "de", "zh"]) for _ in rows],
            "source": [rng.choice([f"s{j}" for j in range(6)]) for _ in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    )


def gen_embeddings(rng: random.Random, n: int = 300, dim: int = 64) -> pd.DataFrame:
    npr = np.random.RandomState(rng.randrange(2**31))
    base = npr.randn(n, dim).astype(np.float32)
    # a constant cluster (quantizer/near-dup fodder) + tight pairs
    const = npr.randn(dim).astype(np.float32)
    for i in range(0, n, 17):
        base[i] = const
    for i in range(1, n, 29):
        base[i] = base[i - 1] + npr.randn(dim).astype(np.float32) * 1e-3
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row for row in base],
            "label": npr.randint(0, 5, size=n).astype(np.int32),
        }
    )


def gen_events(rng: random.Random, n: int = 2000) -> pd.DataFrame:
    """Timestamp torture shapes: duplicate ts per user (window-order
    ties), burst clusters inside one session gap, exact
    window-boundary instants (:00 minutes), microsecond-adjacent
    pairs, idle users, one hot user."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    rows = []
    ts_prev = base
    for i in range(n):
        r = rng.random()
        if r < 0.3:
            ts = ts_prev + dt.timedelta(seconds=rng.randint(0, 90))  # burst
        elif r < 0.35:
            ts = ts_prev  # exact duplicate instant
        elif r < 0.45:
            # exact 5-minute boundary (tumbling/sliding edge)
            ts = base + dt.timedelta(minutes=5 * rng.randint(0, 8000))
        elif r < 0.5:
            ts = ts_prev + dt.timedelta(microseconds=1)
        else:
            ts = base + dt.timedelta(seconds=rng.randint(0, 30 * 86400))
        ts_prev = ts
        user = 0 if rng.random() < 0.25 else rng.randint(1, 12)  # hot user 0
        rows.append(
            (
                i,
                ts,
                user,
                rng.choice(["click", "view", "purchase", "signup", "error"]),
                # INTEGER-valued doubles: group sums are then exact in
                # ANY accumulation order, so a mismatch means a logic
                # bug, not the inherent Spark-vs-DuckDB float-sum order
                # difference (an inexact 2-decimal value column showed
                # round(sum, 2) off by 0.01 on large fuzz groups — and
                # the fixed testdata carries the same latent hazard)
                float(rng.randint(0, 100)),
                '{"k": %d}' % rng.randint(0, 99),
            )
        )
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def write_sf_dir(seed: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    out = tempfile.mkdtemp(prefix=f"fuzz-sf-{seed}-")
    docs = gen_documents(rng)
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), f"{out}/documents.parquet")
    emb = gen_embeddings(rng)
    emb_tbl = pa.table(
        {
            "vec_id": pa.array(emb["vec_id"], pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in emb["embedding"]], pa.list_(pa.float32())),
            "label": pa.array(emb["label"], pa.int32()),
        }
    )
    pq.write_table(emb_tbl, f"{out}/embeddings.parquet")
    ev = gen_events(rng)
    ev_tbl = pa.table(
        {
            "event_id": pa.array(ev["event_id"], pa.int64()),
            "ts": pa.array(ev["ts"], pa.timestamp("us")),
            "user_id": pa.array(ev["user_id"], pa.int64()),
            "event_type": pa.array(ev["event_type"], pa.string()),
            "value": pa.array(ev["value"], pa.float64()),
            "props": pa.array(ev["props"], pa.string()),
        }
    )
    pq.write_table(ev_tbl, f"{out}/events.parquet")
    return out


def main() -> int:
    args = sys.argv[1:]
    seed = int(args[0]) if args and args[0].isdigit() else 0
    names = args[1:] if args and args[0].isdigit() else args
    if not names:
        names = DOC_QUERIES + EMB_QUERIES + EVENT_QUERIES

    import duckdb

    import __spark_entry__ as entrymod
    from check_oracle import compare  # same comparator as the gate
    from nekton_spark.session import get_spark

    sf_dir = write_sf_dir(seed)
    print(f"corpus: {sf_dir}", file=sys.stderr)
    spark = get_spark("fuzz-oracle")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failures = []
    for name in names:
        if name not in qs:
            print(f"skip  {name}: unknown query", file=sys.stderr)
            continue
        try:
            spark_pdf = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"rows  {name}: {len(spark_pdf)} (no oracle)", file=sys.stderr)
                continue
            oracle_pdf = con.execute(oracles[name]).df()
            ok, msg = compare(spark_pdf, oracle_pdf)
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            ok, msg = False, f"error: {type(exc).__name__}: {exc}"
        status = "PASS " if ok else "FAIL "
        print(f"{status} {name}: {msg}"[:300], file=sys.stderr)
        if not ok:
            failures.append(name)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
