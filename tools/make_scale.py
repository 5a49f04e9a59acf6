"""Deterministic scale-up of a testdata sf dir for perf rehearsals.

Usage: python tools/make_scale.py <in_dir> <out_dir> <reps>

Replicates fact tables <reps>× with disjoint key spaces so join
fan-outs, group cardinalities per key, and near-dup cluster sizes all
stay constant while total volume scales linearly — the shape a real
10× corpus has, unlike naive row duplication (which would turn every
document into a <reps>-clique and quadratically inflate the dedup
workload):

- relational keys get a per-replica offset (dimension tables region/
  nation stay fixed, like real scale-ups scale facts not dims)
- document tokens get a per-replica suffix for r>0, so cross-replica
  shingle sets are disjoint (near-dup pairs scale ×reps, not ×reps²)
- embeddings are cyclically rotated by r, preserving within-replica
  cosine structure while decorrelating replicas

Output is written by DuckDB as ordinary parquet (timestamps become µs;
the engine's readers are type-guarded for both ns and µs).
"""

import sys

import duckdb


def main() -> int:
    in_dir, out_dir, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")

    def t(name):
        return f"read_parquet('{in_dir}/{name}.parquet')"

    def copy(sql, name):
        con.execute(f"COPY ({sql}) TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out_dir}/{name}.parquet')").fetchone()[0]
        print(f"{name}: {n} rows")

    import os

    os.makedirs(out_dir, exist_ok=True)
    R = f"range({reps}) reps(r)"

    copy(f"SELECT * FROM {t('region')}", "region")
    copy(f"SELECT * FROM {t('nation')}", "nation")
    copy(
        f"SELECT c_custkey + r*15000 AS c_custkey, c_name, c_nationkey, c_acctbal,"
        f" c_mktsegment FROM {t('customer')}, {R}",
        "customer",
    )
    copy(
        f"SELECT s_suppkey + r*1000 AS s_suppkey, s_name, s_nationkey, s_acctbal"
        f" FROM {t('supplier')}, {R}",
        "supplier",
    )
    copy(
        f"SELECT p_partkey + r*20000 AS p_partkey, p_name, p_brand, p_type, p_size,"
        f" p_retailprice FROM {t('part')}, {R}",
        "part",
    )
    copy(
        f"SELECT o_orderkey + r*10000000 AS o_orderkey, o_custkey + r*15000 AS o_custkey,"
        f" o_orderstatus, o_totalprice, o_orderdate::TIMESTAMPTZ AS o_orderdate, o_orderpriority FROM {t('orders')}, {R}",
        "orders",
    )
    copy(
        f"SELECT l_orderkey + r*10000000 AS l_orderkey, l_partkey + r*20000 AS l_partkey,"
        f" l_suppkey + r*1000 AS l_suppkey, l_linenumber, l_quantity, l_extendedprice,"
        f" l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate::TIMESTAMPTZ AS l_shipdate FROM {t('lineitem')}, {R}",
        "lineitem",
    )
    copy(
        f"SELECT event_id + r*1000000 AS event_id, ts::TIMESTAMPTZ AS ts, user_id + r*1000000 AS user_id,"
        f" event_type, value, props FROM {t('events')}, {R}",
        "events",
    )
    copy(
        f"""SELECT doc_id + r*100000 AS doc_id,
       CASE WHEN r = 0 THEN text
            ELSE array_to_string(list_transform(regexp_split_to_array(trim(text), '\\s+'),
                                                w -> w || 'z' || r::VARCHAR), ' ') END AS text,
       lang, source,
       CASE WHEN r = 0 THEN n_chars
            ELSE length(array_to_string(list_transform(regexp_split_to_array(trim(text), '\\s+'),
                                                       w -> w || 'z' || r::VARCHAR), ' ')) END AS n_chars
FROM {t('documents')}, {R}""",
        "documents",
    )
    # rotation must wrap modulo the embedding dim (64): a raw rotation by
    # r >= 64 degenerates to the identity, silently making replicas 64+
    # EXACT copies of replica 0 (measured: a 37-way duplicate cluster per
    # base vector at reps=100 — a pathological pair blowup the scale-up
    # must not fabricate). Wrap cycles flip sign instead (cosine -1:
    # norms and within-replica structure preserved, replicas decorrelated;
    # distinct for reps < 128).
    copy(
        f"""SELECT vec_id + r*100000 AS vec_id,
       CASE WHEN r = 0 THEN embedding
            ELSE list_transform(
                   list_concat(embedding[((r % 64)+1):], embedding[1:(r % 64)]),
                   x -> x * (CASE WHEN (r // 64) % 2 = 1 THEN -1 ELSE 1 END))::FLOAT[]
            END AS embedding,
       label
FROM {t('embeddings')}, {R}""",
        "embeddings",
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
