"""Deterministic SKEWED variant of a testdata sf dir for skew rehearsals.

Usage: python tools/make_skew.py <in_dir> <out_dir>

`make_scale.py` scales volume with constant per-key cardinalities — it
cannot expose hot-key behavior. This tool keeps volume constant and
concentrates keys the way real corpora do, so every skew-sensitive
plan (per-key windows, groupBy, LSH buckets, near-dup cliques) sees a
hot partition:

- events: ~30% of all events land on ONE user (user_id 0) — a bot/
  service account. Stresses sessionization/lead-lag/latest-per-user
  windows (a window partition cannot be split by AQE) and groupBy-user
  aggregates (AQE skew handling + partial aggregation absorb these).
- orders: ~30% on ONE customer (o_custkey 1) — a marketplace megabuyer.
  Stresses the customer⋈orders join (AQE skew-join splits it) and
  per-customer counts (q13 shape).
- documents: ~10% of docs become near-copies of one boilerplate
  template (genuine near-dup clique — the "mirrored page" pathology).
  Every banded-LSH bucket for those docs is hot, and the verified pair
  set itself is quadratic in the clique (that is the true answer, not
  an artifact). Also ~50% of docs collapse onto one `source` value
  (stresses per-source rollups).
- embeddings: ~10% collapse onto one constant vector (re-encoded
  asset pathology) — one hot sketch bucket, quadratic true pair set.

Selection is hash-based on the row key, so the output is deterministic
and engine-independent. Dimension tables pass through unchanged.
"""

import os
import sys

import duckdb

# 40-word boilerplate: clique members share all its shingles and differ
# only in a 3-token tail → pairwise 3-gram Jaccard ≈ 0.8, well above the
# 0.5 near-dup threshold, so the clique is a TRUE near-dup cluster.
TEMPLATE = " ".join(f"boiler{w % 13}tok{w}" for w in range(40))


def main() -> int:
    in_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    os.makedirs(out_dir, exist_ok=True)

    def t(name):
        return f"read_parquet('{in_dir}/{name}.parquet')"

    def copy(sql, name):
        con.execute(f"COPY ({sql}) TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    for dim in ("region", "nation", "customer", "supplier", "part"):
        copy(f"SELECT * FROM {t(dim)}", dim)

    copy(
        f"SELECT o_orderkey,"
        f" CASE WHEN hash(o_orderkey) % 10 < 3 THEN 1 ELSE o_custkey END AS o_custkey,"
        f" o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM {t('orders')}",
        "orders",
    )
    copy(f"SELECT * FROM {t('lineitem')}", "lineitem")
    copy(
        f"SELECT event_id, ts,"
        f" CASE WHEN hash(event_id) % 10 < 3 THEN 0 ELSE user_id END AS user_id,"
        f" event_type, value, props FROM {t('events')}",
        "events",
    )
    copy(
        f"""SELECT doc_id,
       CASE WHEN hash(doc_id) % 10 = 0
            THEN '{TEMPLATE} tail' || doc_id::VARCHAR || 'a b'
            ELSE text END AS text,
       lang,
       CASE WHEN hash(doc_id) % 2 = 0 THEN 'hotsource' ELSE source END AS source,
       CASE WHEN hash(doc_id) % 10 = 0
            THEN length('{TEMPLATE} tail' || doc_id::VARCHAR || 'a b')
            ELSE n_chars END AS n_chars
FROM {t('documents')}""",
        "documents",
    )
    # - ~10% of the corpus collapses onto one constant vector (hot
    #   sketch bucket / hot IVF list, quadratic true pair set);
    # - ALL ANN query vectors (vec_id < 10, the driver queries' probe
    #   set) become near-copies of that same vector (+2^-12 * (vec_id+1)
    #   on component 1 keeps them distinct but cosine ≈ 1), so every
    #   query probes the SAME LSH bucket / IVF centroid list — the
    #   hot-probe pathology the round-5 skew rehearsal did not cover.
    copy(
        f"""WITH hot AS (SELECT embedding AS hv FROM {t('embeddings')} ORDER BY vec_id LIMIT 1)
SELECT vec_id,
       CASE WHEN vec_id < 10
            THEN list_transform(
                   (SELECT hv FROM hot),
                   (x, i) -> CASE WHEN i = 1
                             THEN x + (vec_id + 1) * 0.000244140625
                             ELSE x END)
            WHEN hash(vec_id) % 10 = 0
            THEN (SELECT hv FROM hot)
            ELSE embedding END AS embedding,
       label
FROM {t('embeddings')}""",
        "embeddings",
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
