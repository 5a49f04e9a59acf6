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
    "dedup_ngram_dfcut", "dedup_ngram_sampled", "dedup_winnow",
    "common_passages",
    "pii_redaction", "unigram_logprob", "bigram_logprob", "tfidf_top_terms",
    "bm25_search", "chunk_documents", "vocab_top_tokens", "vocab_coverage",
    "sample_hash_10pct", "train_val_test_split", "stratified_sample",
    "weighted_sample_docs", "quota_sample_sources", "source_quality_rollup",
    "mixture_sample", "dataset_drift", "category_drift",
    "classifier_score_docs", "classifier_trained", "token_length_histogram",
    "boilerplate_removal", "fuzzy_decontamination", "curriculum_buckets",
    "normalize_text", "repeated_span_removal",
    "bpe_merge_candidates", "decontamination_check", "bloom_decontamination",
    "dedup_incremental", "pack_sequences_check", "dedup_keep_best",
    "lang_id_trained", "dsir_select", "hybrid_search_rrf",
    "heavy_hitters_cms", "bpe_encode_docs", "line_dedup_firstkeep",
    "bpe_roundtrip",
    # NOT listed: minhash_xxh_pairset — it asserts xxh==md5 engine
    # pair-set equality, which holds by construction only for exact
    # dup cliques (the fixed testdata corpora); the hostile corpus
    # plants near-knee jaccard pairs where the two hash families
    # legitimately differ in banding recall (seed 76: 35 vs 31 pairs),
    # so fuzzing it would red on documented-correct behavior.
    # message-pipeline + codec families (documents-driven too: the
    # pipes transform text; the codecs synthesize payloads from doc_id)
    "pipe_replace", "pipe_regex_replace", "pipe_regex_split",
    "pipe_regex_select", "pipeline_chain", "pipe_subprocess",
    "jpeg_decode", "jpeg_color_decode", "jpeg_420_decode",
    "png_color_decode",
    "image_decode", "image_resize",
    "audio_features", "video_frame_sample", "multimodal_features",
    "multimodal_decode", "text_stats",
    # r12 first wave (codec envelope widening)
    "jpeg_progressive_decode", "png_palette_decode",
    "wav_envelope_features", "decode_coverage",
    # r12 third wave: crawl-ingest front end, new codecs, image dedup,
    # compliance/privacy, WebDataset
    "html_extract", "html_main_text", "html_meta",
    "warc_extract", "charset_decode", "webdataset_extract",
    "url_normalize_check", "domain_rollup_urls",
    "gif_decode", "gif_frame_sample", "bmp_decode",
    "wav_g711_features", "image_dhash", "image_near_dup",
    "exif_scrub", "robots_eval",
    # r13: ingest coverage telemetry + EXIF orientation normalization
    # + PDF extraction
    "crawl_coverage", "image_auto_orient", "pdf_extract",
    "html_markdown", "sitemap_extract", "docx_extract",
    "document_extract", "html_jsonld", "feed_extract",
    "domain_quota_sample", "sentence_split",
    # r14: spaceless-script tokenization (the corpus itself now plants
    # whole-CJK docs and near-dup CJK cliques — see gen_documents)
    "dedup_minhash_cjk",
]
EMB_QUERIES = [
    "ann_topk_bruteforce", "ann_topk_lsh", "ann_topk_ivf", "ann_topk_pq",
    "ann_topk_pq_rerank", "ann_topk_ivfpq", "ann_topk_ivfpq_residual",
    "ann_topk_ivf_kmeans", "ann_topk_ivfpq_residual_k", "ann_topk_lsh_mp",
    "ann_index_roundtrip",
    "embedding_pca", "embedding_outliers", "mmr_diverse_topk",
    "embedding_near_dup", "embedding_quant_dedup", "kmeans_clusters",
    "semdedup_prune", "kmeans_tiered",
]
EVENT_QUERIES = [
    "events_sessionization", "events_tumbling_window",
    "events_sliding_window", "events_interval_join", "events_asof_join",
    "events_lead_lag", "events_topk_users", "events_json_extract",
    "latest_event_per_user", "events_tier_rollup", "zorder_key_check",
    "hilbert_key_check", "zorder_key_n",
]
# TPC-H-analog + relational batteries (r7: the r6 verdict asked for the
# same hostile treatment the event family got — NULL FKs, dangling FKs,
# hot customers, empty groups, boundary dates)
REL_QUERIES = [
    "q01_pricing_summary", "q02_min_cost_part", "q03_shipping_priority",
    "q04_order_priority", "q05_region_revenue", "q06_forecast_revenue",
    "q07_volume_shipping", "q08_market_share", "q09_product_profit",
    "q10_returned_items", "q11_important_suppliers", "q12_late_shipments",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_part_supplier_counts", "q17_small_quantity_revenue",
    "q18_large_orders", "q19_discounted_revenue", "q20_excess_suppliers",
    "q21_waiting_orders", "q22_idle_customers",
    "topk_customers_per_nation", "rollup_orders", "grouping_sets_orders",
    "pivot_order_status", "distinct_customers_per_segment",
    "customers_without_orders", "set_ops_customers", "scalar_functions",
    "exists_subquery", "running_revenue_window", "percentiles_by_segment",
    "min_max_by_nation", "conditional_aggregation", "date_arithmetic",
    "string_functions", "range_join_value_bands", "null_semantics",
    "scalar_subquery_above_avg", "unpivot_lineitem_metrics",
    "approx_distinct_check", "distinct_kmv", "approx_quantile_check",
]
# r8: adversarial-media property gate (r7 verdict #8) — not a
# query-vs-oracle compare; see run_media_fuzz
MEDIA_QUERIES = ["media_adversarial"]

VOCAB = [
    "alpha", "Beta", "GAMMA", "delta", "x", "punct!", "a-b", "the", "and",
    "of", "naïve", "Ω", "mail@example.com", "192.168.0.1", "...", "#",
    "nai\u0308ve",  # DECOMPOSED form of naïve — NFC-normalization fodder
    # r14 spaceless-script fodder: mixed-in Han/kana/Thai/Hangul and a
    # supplementary-plane ideograph ride through every text kernel (the
    # word paths see them as ordinary opaque tokens; the script paths
    # must spread them identically in all three engines)
    "中文词", "データ", "ไทยคำ", "한국어", "𠀀浅",
]

# spaceless-script alphabet for whole-CJK fuzz docs (Han + kana + Thai
# + Hangul + astral Han — every SPACELESS_RANGES block gets hit)
CJK_CHARS = (
    [chr(0x4E00 + i) for i in range(0, 300, 7)]
    + [chr(0x3041 + i) for i in range(0, 40, 3)]
    + [chr(0x30A1 + i) for i in range(0, 40, 3)]
    + [chr(0x0E01 + i) for i in range(0, 40, 3)]
    + [chr(0xAC00 + i * 11) for i in range(20)]
    + [chr(0x20000 + i) for i in range(4)]
)
_CJK_SET = frozenset(CJK_CHARS)


def gen_documents(
    rng: random.Random, n: int = 240, null_text_rate: float = 0.03
) -> pd.DataFrame:
    """null_text_rate (default 3%): real corpora carry NULL text, and
    the engine-wide contract (NULL = empty document) was defined and
    fixed against exactly this leg — it caught 9 divergent pairs on
    first run (r7)."""
    rows = []
    for i in range(n):
        kind = rng.random()
        if rng.random() < null_text_rate:
            rows.append((i, None))
            continue
        nonnull = [r for r in rows if r[1] is not None]
        if kind < 0.05:
            # exact duplicate of an earlier doc (dedup_exact fodder)
            text = nonnull[rng.randrange(len(nonnull))][1] if nonnull else "x y z"
        elif kind < 0.12 and nonnull:
            # near-dup: clone + drop one token
            base = nonnull[rng.randrange(len(nonnull))][1].split()
            if len(base) > 3:
                del base[rng.randrange(len(base))]
            text = " ".join(base)
        elif kind < 0.18:
            # r14: whole-CJK spaceless doc — near-dup CJK clique member
            # on a re-roll (clone an earlier CJK doc, mutate one char);
            # the word tokenizer sees ONE token here, the script paths
            # must character-shingle it identically in both engines
            cjk_prior = [
                r[1] for r in nonnull
                if r[1] and r[1][:1] in _CJK_SET
            ]
            if cjk_prior and rng.random() < 0.5:
                base = list(cjk_prior[rng.randrange(len(cjk_prior))])
                base[rng.randrange(len(base))] = rng.choice(CJK_CHARS)
                text = "".join(base)
            else:
                text = "".join(
                    rng.choice(CJK_CHARS) for _ in range(rng.randint(8, 30))
                )
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
            # src<j>: the fixed corpus's naming, so source-targeted queries
            # (mixture_sample) run non-vacuously on fuzz corpora too
            "source": [rng.choice([f"src{j}" for j in range(6)]) for _ in rows],
            "n_chars": [len(r[1]) if r[1] is not None else 0 for r in rows],
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
        pr = rng.random()
        if pr < 0.02:
            props = None          # NULL props (json extract must not crash)
        elif pr < 0.04:
            props = '{"k": '      # malformed JSON (extract yields NULL)
        elif pr < 0.05:
            props = "not json"
        else:
            props = '{"k": %d}' % rng.randint(0, 99)
        etype = (
            None if rng.random() < 0.01  # NULL event_type: a real group key
            else rng.choice(["click", "view", "purchase", "signup", "error"])
        )
        rows.append(
            (
                i,
                ts,
                user,
                etype,
                # INTEGER-valued doubles: group sums are then exact in
                # ANY accumulation order, so a mismatch means a logic
                # bug, not the inherent Spark-vs-DuckDB float-sum order
                # difference (an inexact 2-decimal value column showed
                # round(sum, 2) off by 0.01 on large fuzz groups — and
                # the fixed testdata carries the same latent hazard)
                float(rng.randint(0, 100)),
                props,
            )
        )
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


# All money/quantity doubles in the fuzz corpus are DYADIC rationals
# (multiples of 2^-5 or coarser): products like extprice·(1-disc)·(1+tax)
# and every group sum are then EXACT in IEEE double in any accumulation
# order, so a Spark-vs-DuckDB mismatch is a logic bug, never the
# inherent float-sum order difference (the same posture as the event
# family's integer-valued doubles). Discount 0.0625 sits inside the
# queries' [0.05, 0.07] band predicates.
_DISCOUNTS = [0.0, 0.03125, 0.0625, 0.09375, 0.25]
_TAXES = [0.0, 0.0625, 0.125]
_SEGMENTS = ["MACHINERY", "BUILDING", "FURNITURE", "AUTOMOBILE"]  # HOUSEHOLD: empty group
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PTYPES = ["PROMO", "ECONOMY", "MEDIUM", "SMALL", "STANDARD", "LARGE"]


def _q4(rng: random.Random, lo: float, hi: float) -> float:
    """Uniform multiple of 0.25 in [lo, hi] — exactly representable."""
    return rng.randint(int(lo * 4), int(hi * 4)) / 4.0


def gen_relational(rng: random.Random):
    """Adversarial TPC-H-shaped tables: a hot customer takes ~25% of
    orders, one hot order carries 40 lineitems, one hot part appears in
    ~10% of lineitems; ~1% NULL and ~1% dangling o_custkey; key spaces
    have gaps; nation 23 has no customers and no suppliers; segment
    HOUSEHOLD exists in no customer; orderdates pile on exact year /
    quarter boundaries and the corpus min/max."""
    import datetime as dt

    region = pd.DataFrame(
        {
            "r_regionkey": pd.array(range(5), dtype="int32"),
            "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
        }
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": pd.array(range(25), dtype="int32"),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pd.array([i % 5 for i in range(25)], dtype="int32"),
        }
    )
    # customers: gappy keys (every 3rd id skipped), hot nation 7
    cust_keys = [i for i in range(600) if i % 3 != 2][:400]
    customer = pd.DataFrame(
        {
            "c_custkey": pd.array(cust_keys, dtype="int64"),
            "c_name": [f"Customer#{k:09d}" for k in cust_keys],
            "c_nationkey": pd.array(
                [
                    7 if rng.random() < 0.3 else rng.choice(
                        [n for n in range(25) if n != 23]
                    )
                    for _ in cust_keys
                ],
                dtype="int32",
            ),
            "c_acctbal": [
                None if rng.random() < 0.02 else _q4(rng, -999, 9999)
                for _ in cust_keys
            ],
            "c_mktsegment": [rng.choice(_SEGMENTS) for _ in cust_keys],
        }
    )
    supp_keys = list(range(1, 41))
    supplier = pd.DataFrame(
        {
            "s_suppkey": pd.array(supp_keys, dtype="int64"),
            "s_name": [f"Supplier#{k:09d}" for k in supp_keys],
            "s_nationkey": pd.array(
                [rng.choice([n for n in range(25) if n != 23]) for _ in supp_keys],
                dtype="int32",
            ),
            "s_acctbal": [_q4(rng, -999, 9999) for _ in supp_keys],
        }
    )
    part_keys = list(range(1, 151))
    part = pd.DataFrame(
        {
            "p_partkey": pd.array(part_keys, dtype="int64"),
            "p_name": [
                f"part {rng.choice(['green', 'red', 'ivory', 'navy'])} {k}"
                for k in part_keys
            ],
            "p_brand": [f"Brand#{rng.randint(1, 25)}" for _ in part_keys],
            "p_type": [rng.choice(_PTYPES) for _ in part_keys],
            "p_size": pd.array([rng.randint(1, 50) for _ in part_keys], dtype="int32"),
            "p_retailprice": [_q4(rng, 900, 1000) for _ in part_keys],
        }
    )
    base = dt.datetime(1995, 1, 1)
    last = dt.datetime(2001, 8, 1)
    hot_cust = cust_keys[0]

    def orderdate():
        r = rng.random()
        if r < 0.1:
            return dt.datetime(rng.randint(1995, 2001), 1, 1)  # year starts
        if r < 0.18:
            return dt.datetime(rng.randint(1995, 2000), rng.choice([1, 4, 7, 10]), 1)
        if r < 0.2:
            return rng.choice([base, last])  # corpus extremes
        return base + dt.timedelta(days=rng.randint(0, (last - base).days))

    n_orders = 3000
    okeys = [i * 2 + rng.randint(0, 1) for i in range(n_orders)]  # gappy
    o_rows = []
    for ok in okeys:
        r = rng.random()
        if r < 0.01:
            ck = None  # NULL FK
        elif r < 0.02:
            ck = 999_999  # dangling FK
        elif r < 0.25:
            ck = hot_cust
        else:
            ck = rng.choice(cust_keys)
        o_rows.append(
            (
                ok,
                ck,
                rng.choices(["O", "F", "P"], weights=[48, 48, 4])[0],
                _q4(rng, 100, 400000),
                orderdate(),
                rng.choice(_PRIORITIES),
            )
        )
    orders = pd.DataFrame(
        o_rows,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    )
    orders["o_orderkey"] = orders["o_orderkey"].astype("int64")
    orders["o_custkey"] = orders["o_custkey"].astype("Int64")
    odate = {r[0]: r[4] for r in o_rows}
    hot_order = okeys[1]
    hot_part = part_keys[0]
    l_rows = []
    # ~10% of orders get no lineitems (empty-group / anti-join fodder)
    lined = [ok for ok in okeys if rng.random() > 0.1]
    for ok in lined:
        n_li = 40 if ok == hot_order else rng.randint(1, 7)
        for ln in range(1, n_li + 1):
            pk = hot_part if rng.random() < 0.1 else rng.choice(part_keys)
            if rng.random() < 0.01:
                pk = 999_999  # dangling part
            ship = odate[ok] + dt.timedelta(days=rng.randint(0, 120))
            if rng.random() < 0.05:
                ship = odate[ok]  # same-instant edge
            l_rows.append(
                (
                    ok,
                    pk,
                    rng.choice(supp_keys),
                    ln,
                    float(rng.randint(1, 50)),
                    _q4(rng, 100, 100000),
                    rng.choice(_DISCOUNTS),
                    rng.choice(_TAXES),
                    rng.choice(["A", "N", "R"]),
                    rng.choice(["O", "F"]),
                    ship,
                )
            )
    lineitem = pd.DataFrame(
        l_rows,
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    )
    for c, t in [("l_orderkey", "int64"), ("l_partkey", "int64"),
                 ("l_suppkey", "int64"), ("l_linenumber", "int32")]:
        lineitem[c] = lineitem[c].astype(t)
    return {
        "region": region, "nation": nation, "customer": customer,
        "supplier": supplier, "part": part, "orders": orders,
        "lineitem": lineitem,
    }


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
    rel = gen_relational(rng)
    # pin the exact driver-testdata physical types (int32 nation/region
    # keys, naive µs timestamps) so schema comparison stays apples-to-
    # apples with the fixed corpus
    rel_schemas = {
        "region": pa.schema(
            [("r_regionkey", pa.int32()), ("r_name", pa.string())]
        ),
        "nation": pa.schema(
            [("n_nationkey", pa.int32()), ("n_name", pa.string()),
             ("n_regionkey", pa.int32())]
        ),
        "customer": pa.schema(
            [("c_custkey", pa.int64()), ("c_name", pa.string()),
             ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
             ("c_mktsegment", pa.string())]
        ),
        "supplier": pa.schema(
            [("s_suppkey", pa.int64()), ("s_name", pa.string()),
             ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]
        ),
        "part": pa.schema(
            [("p_partkey", pa.int64()), ("p_name", pa.string()),
             ("p_brand", pa.string()), ("p_type", pa.string()),
             ("p_size", pa.int32()), ("p_retailprice", pa.float64())]
        ),
        "orders": pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
             ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
             ("o_orderdate", pa.timestamp("us")),
             ("o_orderpriority", pa.string())]
        ),
        "lineitem": pa.schema(
            [("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
             ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
             ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
             ("l_discount", pa.float64()), ("l_tax", pa.float64()),
             ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
             ("l_shipdate", pa.timestamp("us"))]
        ),
    }
    for name, pdf in rel.items():
        tbl = pa.Table.from_pandas(
            pdf, schema=rel_schemas[name], preserve_index=False
        )
        pq.write_table(tbl, f"{out}/{name}.parquet")
    return out


def run_media_fuzz(spark, seed: int) -> tuple[bool, str]:
    """Adversarial-media gate: refuse-or-decode-exactly.

    Seeded corruptions of VALID payloads from the repo's own from-spec
    encoders (grayscale PNG, baseline gray + color JPEG, PCM16 WAV,
    MJPEG AVI): truncations at random offsets, single-bit flips, stray
    marker bytes, zero-dimension headers, empty payloads, garbage. The
    contract, per payload×codec:

    - an UNTOUCHED valid payload must decode EXACTLY (pixel/sample
      equality against the synthesis ground truth);
    - any corrupted payload must either refuse with ValueError /
      NotImplementedError or return a WELL-FORMED result (uint8 array /
      frame list) — a format with no integrity check (JPEG entropy
      bits) may legally decode flipped bits to different pixels, but
      it must never leak an internal error (IndexError, struct.error,
      zlib.error, EOFError) or hang.

    A second leg drives the Spark operators (decode_image over a mixed
    PNG/JPEG frame, decode_audio over WAV media) to assert the
    mapInPandas plumbing surfaces the same decodes, and that an
    unsupported mime refuses through the operator path too.
    """
    import io
    import struct
    import wave

    from nekton_spark.functions.jpeg import (
        jpeg_decode,
        jpeg_encode_blocks,
        jpeg_encode_blocks_420,
        jpeg_encode_blocks_color,
        jpeg_encode_blocks_sampled,
        jpeg_encode_progressive,
        synth_420_block_values,
        synth_block_values,
    )
    from nekton_spark.functions.multimodal import (
        _ALAW_TABLE,
        _ULAW_TABLE,
        _png_decode,
        _png_encode,
        _png_encode_ex,
        _synth_pixels,
        _synth_pixels_color,
        _synth_samples,
        _wav_encode,
        _wav_parse,
    )
    from nekton_spark.functions.bmp import bmp_decode, bmp_encode
    from nekton_spark.functions.gif import (
        gif_decode,
        gif_decode_frames,
        gif_encode,
        gif_encode_anim,
    )
    from nekton_spark.functions.video import avi_decode_frames, avi_encode_mjpeg
    from nekton_spark.functions.tiff import tiff_decode, tiff_encode
    from nekton_spark.functions.webp import (
        webp_decode,
        webp_decode_frames,
        webp_encode_anim,
        webp_encode_lossless,
        webp_encode_palette,
    )

    rng = random.Random(seed * 7919 + 11)
    problems: list[str] = []
    checked = 0

    def _jpeg_progressive_base(key: int):
        # r12 SOF2: valid-payload probe checks EXACT pixels against
        # the same DC-only closed form as the baseline jpeg fixtures;
        # the corruption battery then hits the multi-scan path
        # (successive approximation + split bands + restarts)
        dcs, bx, w, h = synth_block_values(key % 6)
        rows = np.zeros((len(dcs), 64), dtype=np.int64)
        rows[:, 0] = dcs
        payload = jpeg_encode_progressive(
            [rows], [(1, 1)], bx, w, h,
            dc_al=2, ac_al=1, bands=((1, 5), (6, 63)),
            restart_interval=key % 3,
        )
        k = key % 6
        yy, xx = np.mgrid[0:h, 0:w]
        truth = ((k * 31 + ((yy // 8) * bx + xx // 8) * 17) % 256).astype(
            np.uint8
        )
        return payload, jpeg_decode, truth

    def _jpeg_420_base(key: int):
        # r11: subsampled decode is in the envelope — the valid-payload
        # probe checks EXACT pixels against the synth_420 closed form
        # (replication chroma upsample + floor(x+0.5) RGB). r12: every
        # other base encodes with a restart interval, so the corruption
        # battery also hits DRI/RSTn streams.
        dc_y, dc_cb, dc_cr, mx, w, h = synth_420_block_values(key % 6)
        payload = jpeg_encode_blocks_420(
            dc_y, dc_cb, dc_cr, mx, w, h, restart_interval=key % 3
        )
        k = key % 6
        yy, xx = np.mgrid[0:h, 0:w]
        yv = (k * 31 + ((yy // 8) * (2 * mx) + xx // 8) * 17) % 256
        cbb = (yy // 16) * mx + xx // 16
        cb = (k * 7 + cbb * 11) % 256
        cr = (k * 13 + cbb * 5) % 256
        truth = np.clip(np.stack([
            np.floor(yv + 1.402 * (cr - 128.0) + 0.5),
            np.floor(yv - 0.344136 * (cb - 128.0)
                     - 0.714136 * (cr - 128.0) + 0.5),
            np.floor(yv + 1.772 * (cb - 128.0) + 0.5),
        ], axis=-1), 0, 255).astype(np.uint8)
        return payload, jpeg_decode, truth

    def make_wav(key: int) -> bytes:
        n = 256 + key % 256
        s = _synth_samples(key, n)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(s.astype("<i2").tobytes())
        return buf.getvalue()

    def corruptions(p: bytes):
        n = len(p)
        yield "trunc_head", p[: rng.randrange(0, min(16, n))]
        yield "trunc_mid", p[: rng.randrange(n // 4, max(n // 4 + 1, 3 * n // 4))]
        yield "trunc_tail", p[: n - rng.randrange(1, min(8, n))]
        i = rng.randrange(n)
        yield "bitflip", p[:i] + bytes([p[i] ^ (1 << rng.randrange(8))]) + p[i + 1 :]
        i = rng.randrange(n)
        yield "stray_marker", p[:i] + bytes([0xFF, rng.randrange(256)]) + p[i:]
        yield "empty", b""
        yield "garbage", bytes(rng.randrange(256) for _ in range(64))
        yield "doubled", p + p

    def probe(tag, fn, expect=None):
        nonlocal checked
        checked += 1
        try:
            r = fn()
        except (ValueError, NotImplementedError):
            if expect is not None:
                problems.append(f"{tag}: refused a VALID payload")
            return
        except Exception as exc:  # noqa: BLE001 — the gate's whole point
            problems.append(f"{tag}: leaked {type(exc).__name__}: {exc}")
            return
        if expect is not None and not np.array_equal(r, expect):
            problems.append(f"{tag}: decode != ground truth")
        elif expect is None and hasattr(r, "dtype") and r.dtype not in (
            np.uint8,
            np.dtype("<i2"),  # WAV samples are int16 by format
        ):
            problems.append(f"{tag}: malformed decode dtype {r.dtype}")

    for key in [rng.randrange(1, 1 << 30) for _ in range(6)]:
        pix = _synth_pixels(key)
        cpix = _synth_pixels_color(key)
        pal = np.stack(
            [(key * 7 + np.arange(16) * 13 + c * 29) % 256 for c in range(3)],
            axis=1,
        ).astype(np.uint8)
        pidx = ((key + np.add.outer(3 * np.arange(11), np.arange(13))) % 16)
        # r13 delta-frame ground truth: frame-0 canvas with the
        # (5, 6)@(3, 2) patch composited (transparent-index holes on
        # key %% 3 == 0 keep frame-0 pixels)
        _panim = (
            (key + 1 + np.add.outer(3 * np.arange(5), np.arange(6))) % 16
        ).astype(np.uint8)
        _ptr = (key % 16) if key % 3 == 0 else None
        _panim_exp = pal[pidx].copy()
        _pm = np.ones((5, 6), bool) if _ptr is None else (_panim != _ptr)
        _panim_exp[2:7, 3:9][_pm] = pal[_panim][_pm]
        # r14 disposal-3 ground truth: the (5, 6)@(3, 2) middle patch
        # is restore-to-previous, so the final canvas is frame 0 with
        # ONLY the last (3, 4)@(4, 3) patch composited
        _pd3 = (
            (key + 2 + np.add.outer(3 * np.arange(3), np.arange(4))) % 16
        ).astype(np.uint8)
        _pd3_exp = pal[pidx].copy()
        _pd3_exp[3:6, 4:8] = pal[_pd3]
        # r15 WebP ground truths: RGBA truecolor (alpha closed-form)
        # and an RGBA palette sharing the GIF/BMP index map
        _webp_img = np.dstack(
            [cpix, ((key + np.add.outer(np.arange(cpix.shape[0]),
                                        np.arange(cpix.shape[1]))) % 256
                    ).astype(np.uint8)]
        )
        _webp_pal = np.concatenate(
            [pal, ((key * 7 + np.arange(16) * 13 + 97) % 256
                   ).astype(np.uint8)[:, None]],
            axis=1,
        )
        bases = [
            ("png", _png_encode(pix), _png_decode, pix),
            ("png_color", _png_encode(cpix), _png_decode, cpix),
            (
                "png_pal_adam7",  # r12 envelope: palette-4 + interlace
                _png_encode_ex(pidx, 3, 4, interlace=1, palette=pal),
                _png_decode,
                pal[pidx],
            ),
            (
                "gif",  # r12: LZW stream through the same battery
                gif_encode(
                    pidx.astype(np.uint8), pal,
                    interlace=bool(key % 2),
                    transparent_index=(key % 16) if key % 3 == 0 else None,
                ),
                lambda p: gif_decode(p)[:, :, :3],
                pal[pidx],
            ),
            (
                "gif_anim",  # r13: delta-frame composition battery
                gif_encode_anim(
                    [
                        {"indices": pidx.astype(np.uint8), "disposal": 1},
                        {
                            "indices": _panim,
                            "x0": 3,
                            "y0": 2,
                            "transparent": _ptr,
                        },
                    ],
                    pal,
                    (13, 11),
                ),
                lambda p: gif_decode_frames(p)[-1][:, :, :3],
                _panim_exp,
            ),
            (
                "gif_disp3",  # r14: restore-to-previous battery — the
                # disposal-3 middle patch must be REVERTED before the
                # final smaller patch lands
                gif_encode_anim(
                    [
                        {"indices": pidx.astype(np.uint8), "disposal": 1},
                        {
                            "indices": _panim,
                            "x0": 3,
                            "y0": 2,
                            "disposal": 3,
                        },
                        {
                            "indices": _pd3,
                            "x0": 4,
                            "y0": 3,
                        },
                    ],
                    pal,
                    (13, 11),
                ),
                lambda p: gif_decode_frames(p)[-1][:, :, :3],
                _pd3_exp,
            ),
            (
                "bmp",  # r12: indexed-8 via BI_RLE8 / 24-bit raw
                bmp_encode(pal[pidx], 24, top_down=bool(key % 2))
                if key % 2
                else bmp_encode(
                    pidx.astype(np.uint8), 8,
                    palette=np.vstack([pal] * 16), rle8=True,
                ),
                bmp_decode,
                pal[pidx],
            ),
            (
                "webp",  # r15: VP8L truecolor (subtract-green/cache/
                # LZ77 runs vary by key) through the same battery
                webp_encode_lossless(
                    _webp_img,
                    subtract_green=bool(key % 2),
                    cache_bits=1 + key % 10,
                    use_rle=True,
                ),
                webp_decode,
                _webp_img,
            ),
            (
                "webp_pal",  # r15: color-indexing + pixel bundling
                webp_encode_palette(pidx.astype(np.uint8), _webp_pal),
                webp_decode,
                _webp_pal[pidx],
            ),
            (
                "webp_anim",  # r15: ANMF composition (no-blend inset
                # patch over a full first frame) through the battery
                webp_encode_anim(
                    [
                        {"rgba": _webp_img, "x": 0, "y": 0, "blend": False},
                        # no-blend: the patch's alpha plane is NOT
                        # opaque, so alpha-blend would change pixels —
                        # blend-path exactness is pinned in pytest
                        {"rgba": _webp_img[2:7, 2:8], "x": 2, "y": 2,
                         "blend": False},
                    ],
                    (_webp_img.shape[1], _webp_img.shape[0]),
                ),
                lambda p: webp_decode_frames(p)[-1],
                _webp_img,  # patch copies the same pixels back
            ),
            (
                "tiff_lzw",  # r15: TIFF-LZW + predictor, multi-strip
                tiff_encode(
                    [cpix], compression=5, predictor=2, rows_per_strip=4
                ),
                tiff_decode,
                cpix,
            ),
            (
                "tiff_pal",  # r15: PackBits palette-4, bit-packed rows
                tiff_encode(
                    [(pidx % 16).astype(np.uint8)], compression=32773,
                    photometric=3, palette=pal, bits=4,
                ),
                tiff_decode,
                pal[pidx % 16],
            ),
            (
                "jpeg",
                jpeg_encode_blocks(
                    [rng.randrange(-64, 64) for _ in range(4)], 2, 16, 16
                ),
                jpeg_decode,
                None,  # gray ground truth needs the DC layout; exactness
                # is oracled by jpeg_decode queries — here assert decode
                # well-formedness + refusal hygiene
            ),
            (
                "jpeg_dri",
                jpeg_encode_blocks(
                    [rng.randrange(-64, 64) for _ in range(6)], 3, 24, 16,
                    restart_interval=1 + key % 3,
                ),
                jpeg_decode,
                None,  # restart-interval stream through the same
                # corruption battery (bitflips can hit RSTn markers,
                # truncations can land mid-restart-segment)
            ),
            ("jpeg_420", *_jpeg_420_base(key)),
            ("jpeg_prog", *_jpeg_progressive_base(key)),
            (
                "jpeg_411",
                jpeg_encode_blocks_sampled(
                    [
                        [rng.randrange(-64, 64) for _ in range(8)],
                        [rng.randrange(-64, 64) for _ in range(2)],
                        [rng.randrange(-64, 64) for _ in range(2)],
                    ],
                    [(4, 1), (1, 1), (1, 1)],
                    1, 32, 16,
                ),
                jpeg_decode,
                None,  # r12 factor-4 stream (4:1:1) through the same
                # corruption battery; exactness is pinned by the
                # closed-form pytest, here assert refusal hygiene
            ),
            ("wav", make_wav(key), None,
             _synth_samples(key, 256 + key % 256).astype("<i2")),
            (
                "wav_g711",  # r12: telephony µ-law/A-law stream
                _wav_encode(
                    (key * 31 + np.arange(64 + key % 64) * 17) % 256,
                    ("ulaw", "alaw")[key % 2], 8000,
                    extensible=bool(key % 2),
                ),
                lambda p: _wav_parse(p)[4].astype("<i2"),
                (_ULAW_TABLE if key % 2 == 0 else _ALAW_TABLE)[
                    (key * 31 + np.arange(64 + key % 64) * 17) % 256
                ].astype("<i2"),
            ),
        ]
        for name, payload, dec, truth in bases:
            if name == "wav":

                def dec(p):  # noqa: PLW0127 — per-base decoder
                    with wave.open(io.BytesIO(p), "rb") as w:
                        raise_on = w.getnframes()
                        raw = w.readframes(raise_on)
                    if len(raw) != raise_on * w.getnchannels() * 2:
                        raise ValueError("short")
                    return np.frombuffer(raw, dtype="<i2")

                # route stdlib wave errors the way decode_audio does
                real_dec = dec

                def dec(p, _rd=real_dec):
                    try:
                        return _rd(p)
                    except (wave.Error, EOFError, RuntimeError, struct.error) as e:
                        raise ValueError(str(e)) from None

            probe(f"{name}:valid", lambda d=dec, p=payload: d(p), expect=truth)
            for ctag, cp in corruptions(payload):
                probe(f"{name}:{ctag}", lambda d=dec, p=cp: d(p))

    # AVI container: valid round-trip + corruptions
    sub = jpeg_encode_blocks([3, -1], 2, 16, 8)
    avi = avi_encode_mjpeg([sub, sub, sub], 16, 8)
    probe("avi:valid_framecount", lambda: np.array(len(avi_decode_frames(avi))), expect=np.array(3))
    for ctag, cp in corruptions(avi):
        probe(f"avi:{ctag}", lambda p=cp: [np.frombuffer(f, dtype=np.uint8) for f in avi_decode_frames(p)] and np.zeros(0, np.uint8))

    # DRI-specific refusal probes (r12): these must REFUSE with
    # ValueError — acceptance would mean silent desynchronization
    dri_p = bytes(
        jpeg_encode_blocks([3, -1, 7, 0], 2, 16, 16, restart_interval=1)
    )
    i = dri_p.find(b"\xff\xd0")
    for ptag, bad in [
        ("out_of_seq_rst", dri_p[: i + 1] + bytes([0xD4]) + dri_p[i + 2 :]),
        ("rst_replaced_by_data", dri_p[:i] + b"\x00\x00" + dri_p[i + 2 :]),
    ]:
        checked += 1
        try:
            jpeg_decode(bad)
            problems.append(f"jpeg_dri:{ptag}: accepted a corrupt restart")
        except ValueError:
            pass
        except Exception as exc:  # noqa: BLE001
            problems.append(f"jpeg_dri:{ptag}: leaked {type(exc).__name__}")

    # ---- Spark operator leg ----
    from pyspark.sql import functions as F

    from nekton_spark.functions.multimodal import (
        decode_audio,
        decode_image,
        synth_jpeg_media,
        synth_png_media,
        synth_wav_media,
    )

    ids = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    n_png = decode_image(synth_png_media(ids)).count()
    n_jpg = decode_image(synth_jpeg_media(ids)).count()
    n_wav = decode_audio(synth_wav_media(ids)).count()
    if not (n_png == n_jpg == n_wav == 20):
        problems.append(f"spark leg counts png={n_png} jpg={n_jpg} wav={n_wav}")
    checked += 3
    # unsupported mime must refuse through the operator path
    from nekton_spark.functions.multimodal import media_from_text

    bad = media_from_text(
        ids.select("doc_id", F.lit("x").alias("text")), mime="video/h264"
    )
    try:
        decode_image(bad).count()
        problems.append("spark leg: unsupported mime did NOT refuse")
    except Exception as exc:
        if "NotImplementedError" not in str(type(exc)) and "no codec" not in str(exc):
            problems.append(f"spark leg: unsupported mime leaked {type(exc).__name__}")
    checked += 1

    if problems:
        return False, f"{len(problems)}/{checked} probes failed: " + "; ".join(problems[:4])
    return True, f"{checked} probes: refuse-or-decode-exactly holds"


def main() -> int:
    args = sys.argv[1:]
    seed = int(args[0]) if args and args[0].isdigit() else 0
    names = args[1:] if args and args[0].isdigit() else args
    if not names:
        names = DOC_QUERIES + EMB_QUERIES + EVENT_QUERIES + REL_QUERIES + MEDIA_QUERIES

    import duckdb

    import __spark_entry__ as entrymod
    from check_oracle import compare  # same comparator as the gate
    from nekton_spark.session import get_spark

    sf_dir = write_sf_dir(seed)
    print(f"corpus: {sf_dir}", file=sys.stderr)
    spark = get_spark("fuzz-oracle")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in (
        "documents", "embeddings", "events", "region", "nation",
        "customer", "supplier", "part", "orders", "lineitem",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failures = []
    for name in names:
        if name in MEDIA_QUERIES:
            try:
                ok, msg = run_media_fuzz(spark, seed)
            except Exception as exc:  # noqa: BLE001
                ok, msg = False, f"error: {type(exc).__name__}: {exc}"
            status = "PASS " if ok else "FAIL "
            print(f"{status} {name}: {msg}"[:300], file=sys.stderr)
            if not ok:
                failures.append(name)
            continue
        if name not in qs:
            print(f"skip  {name}: unknown query", file=sys.stderr)
            continue
        try:
            spark_pdf = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"rows  {name}: {len(spark_pdf)} (no oracle)", file=sys.stderr)
                continue
            try:
                oracle_pdf = con.execute(oracles[name]).df()
            except duckdb.OutOfMemoryException:
                # the big PQ-oracle CTEs can accumulate buffer-pool
                # pressure across a long multi-query sweep on one
                # in-memory connection (observed seed 122: 5 PQ rows
                # back-to-back); a fresh connection is a clean retry,
                # not a pass — the query itself is unchanged
                con.close()
                con = duckdb.connect()
                for t in (
                    "documents", "embeddings", "events", "region", "nation",
                    "customer", "supplier", "part", "orders", "lineitem",
                ):
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
                    )
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
