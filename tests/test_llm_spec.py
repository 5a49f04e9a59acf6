"""YAML spec surface for LLM-pipeline operators: end-to-end spec runs
over the driver's documents/embeddings tables."""

from nekton_spark.spec import Spec, compile_spec


def compile_df(spark, yaml_text):
    df, _ = compile_spec(spark, Spec.from_yaml(yaml_text))
    return df


class TestLlmSpecs:
    def test_quality_filter_and_dedup_pipeline(self, spark, sf_dir):
        df = compile_df(
            spark,
            f"""
input:
  type: table
  path: {sf_dir}
  name: documents
pipeline:
  processors:
    - type: text_stats
    - type: quality_filter
      min_quality: 0.3
    - type: dedup_exact
output:
  type: memory
""",
        )
        n = df.count()
        assert 0 < n <= 500
        assert "quality" in df.columns

    def test_dedup_minhash_drops_near_dups(self, spark):
        rows = [
            (0, "the quick brown fox jumps over the lazy dog again today"),
            (1, "the quick brown fox jumps over the lazy dog again tomorrow"),
            (2, "entirely different words in this completely other document here"),
        ]
        spark.createDataFrame(rows, "doc_id long, text string").createOrReplaceTempView("near_docs")
        df = compile_df(
            spark,
            """
input:
  type: sql_view
  name: near_docs
pipeline:
  processors:
    - type: dedup_minhash
      threshold: 0.3
output:
  type: memory
""",
        )
        ids = sorted(r.doc_id for r in df.collect())
        assert ids == [0, 2]  # doc 1 deduped against doc 0

    def test_dedup_minhash_cjk_spec_tokenize(self, spark):
        """r14 e2e: the YAML `tokenize: script` knob reaches the
        minhash kernels — a spaceless-CJK near-dup pair survives a
        word-policy spec untouched but dedupes under the script
        policy."""
        rows = [
            (0, "春眠不觉晓处处闻啼鸟夜来风雨声花落知多少甲"),
            (1, "春眠不觉晓处处闻啼鸟夜来风雨声花落知多少乙"),
            (2, "完全不同的另外一段文字内容而已再来几个字凑数"),
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).createOrReplaceTempView("cjk_docs")
        word = compile_df(
            spark,
            """
input:
  type: sql_view
  name: cjk_docs
pipeline:
  processors:
    - type: dedup_minhash
      threshold: 0.5
output:
  type: memory
""",
        )
        assert sorted(r.doc_id for r in word.collect()) == [0, 1, 2]
        script = compile_df(
            spark,
            """
input:
  type: sql_view
  name: cjk_docs
pipeline:
  processors:
    - type: dedup_minhash
      threshold: 0.5
      tokenize: script
output:
  type: memory
""",
        )
        assert sorted(r.doc_id for r in script.collect()) == [0, 2]

    def test_ann_topk_spec(self, spark, sf_dir):
        df = compile_df(
            spark,
            f"""
input:
  type: table
  path: {sf_dir}
  name: embeddings
pipeline:
  processors:
    - type: ann_topk
      query_ids: [0, 1]
      k: 3
output:
  type: memory
""",
        )
        rows = df.collect()
        assert len(rows) == 6
        assert {r.query_id for r in rows} == {0, 1}

    def test_ann_topk_ivf_spec(self, spark, sf_dir):
        df = compile_df(
            spark,
            f"""
input:
  type: table
  path: {sf_dir}
  name: embeddings
pipeline:
  processors:
    - type: ann_topk
      method: ivf
      query_ids: [0, 1]
      k: 3
      centroid_stride: 20
      n_probe: 3
output:
  type: memory
""",
        )
        rows = df.collect()
        assert len(rows) == 6
        assert {r.query_id for r in rows} == {0, 1}
        assert all(r.rank <= 3 for r in rows)

    def test_decode_media_spec(self, spark, sf_dir):
        """PNG synth + real decode through the YAML surface."""
        from nekton_spark.functions.multimodal import synth_png_media

        base = compile_df(
            spark,
            f"""
input:
  type: table
  path: {sf_dir}
  name: documents
pipeline:
  processors:
    - type: filter
      predicate: doc_id < 5
output:
  type: memory
""",
        )
        media = synth_png_media(base.select("doc_id"))
        from nekton_spark.operators.llm import decode_media_processor

        out = decode_media_processor(media, kind="image").collect()
        assert len(out) == 5
        assert all(len(r.pixels) == r.dec_height * r.dec_width for r in out)

    def test_asof_join_spec(self, spark, sf_dir):
        df = compile_df(
            spark,
            f"""
input:
  type: table
  path: {sf_dir}
  name: events
pipeline:
  processors:
    - type: filter
      predicate: "event_type = 'purchase'"
    - type: select
      columns: ["event_id", "user_id", "ts"]
    - type: asof_join
      by: user_id
      other:
        input:
          type: table
          path: {sf_dir}
          name: events
        processors:
          - type: filter
            predicate: "event_type = 'click'"
          - type: select
            columns: ["user_id", "ts", "event_id as click_id"]
output:
  type: memory
""",
        )
        assert df.count() > 0
        assert "click_id" in df.columns

    def test_training_pipeline_spec(self, spark, sf_dir):
        """Full training-data prep as ONE spec: quality filter →
        decontaminate vs an eval slice → pack into context windows."""
        df = compile_df(
            spark,
            f"""
input:
  type: table
  path: {sf_dir}
  name: documents
pipeline:
  processors:
    - type: quality_filter
      min_quality: 0.2
    - type: decontaminate
      eval_path: {sf_dir}
      eval_name: documents
      eval_filter: doc_id % 97 = 0
      n: 4
    - type: pack_sequences
      budget: 256
      n_shards: 4
output:
  type: memory
""",
        )
        rows = df.collect()
        assert 0 < len(rows) <= 500
        assert all(r.pack_pos < 256 for r in rows)
        # eval docs themselves were part of train input → each shares
        # all its 4-grams with itself in eval, so none survive
        assert all(r.id % 97 != 0 for r in rows)

    def test_latest_by_key_and_tier_rollup_specs(self, spark, sf_dir):
        latest = compile_df(
            spark,
            f"""
input:
  type: table
  path: {sf_dir}
  name: events
pipeline:
  processors:
    - type: latest_by_key
      key: user_id
      order_by: [ts, event_id]
      carry: [event_id, event_type]
output:
  type: memory
""",
        )
        assert latest.count() == latest.select("user_id").distinct().count()
        tiers = compile_df(
            spark,
            f"""
input:
  type: table
  path: {sf_dir}
  name: events
pipeline:
  processors:
    - type: tier_rollup
      tiers: ["1 minute", "1 hour"]
output:
  type: memory
""",
        )
        got = {r.tier for r in tiers.select("tier").distinct().collect()}
        assert got == {"1 minute", "1 hour"}

    def test_redact_pii_and_repetition_filter_specs(self, spark):
        rows = [
            (0, "reach me at alice@example.com or 555-123-4567 from 10.0.0.1"),
            (1, "spam spam spam spam spam spam spam spam spam spam spam spam"),
            (2, "a perfectly ordinary sentence with no contact details at all"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.createOrReplaceTempView("pii_docs")
        out = compile_df(
            spark,
            """
input:
  type: sql
  query: SELECT * FROM pii_docs
pipeline:
  processors:
    - type: redact_pii
      counts: true
    - type: repetition_filter
      max_dup_fraction: 0.5
output:
  type: memory
""",
        )
        got = {r.doc_id: r for r in out.collect()}
        # doc 1 is pure repetition (dup 3-gram fraction ~0.8) → dropped
        assert set(got) == {0, 2}
        r0 = got[0]
        assert r0.n_email == 1 and r0.n_phone == 1 and r0.n_ipv4 == 1
        assert "<EMAIL>" in r0.text and "<PHONE>" in r0.text and "<IPV4>" in r0.text
        assert "alice" not in r0.text and "4567" not in r0.text
        assert got[2].text == rows[2][1]

    def test_redact_pii_e164_and_iban_injection(self, spark):
        """Per-pattern injection + near-miss negatives for the
        international patterns: E.164 must require '+' and a nonzero
        lead digit; IBAN must require CC + check digits + >=11
        alphanumerics; neither may fire on the other kinds' tokens."""
        rows = [
            (0, "wire to DE44500105175407324931 today"),          # real IBAN shape
            (1, "call +41446681800 now"),                          # E.164
            (2, "+0446681800 is not E.164 (zero lead)"),           # negative
            (3, "DE44SHORT1 is too short for an IBAN"),            # negative
            (4, "ticket ABCD-1234 and version 1.2.3 stay"),        # negative
            (5, "both +919876543210 and GB29NWBK60161331926819"),  # two kinds
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.createOrReplaceTempView("pii_docs_intl")
        out = compile_df(
            spark,
            """
input:
  type: sql
  query: SELECT * FROM pii_docs_intl
pipeline:
  processors:
    - type: redact_pii
      counts: true
output:
  type: memory
""",
        )
        got = {r.doc_id: r for r in out.collect()}
        assert got[0].n_iban == 1 and "<IBAN>" in got[0].text and "5407" not in got[0].text
        assert got[1].n_e164 == 1 and "<E164>" in got[1].text and "6681800" not in got[1].text
        assert got[2].n_e164 == 0 and "+0446681800" in got[2].text
        assert got[3].n_iban == 0 and "DE44SHORT1" in got[3].text
        assert got[4].n_e164 == got[4].n_iban == got[4].n_ipv4 == 0
        assert got[4].text == rows[4][1]
        assert got[5].n_e164 == 1 and got[5].n_iban == 1
        assert "<E164>" in got[5].text and "<IBAN>" in got[5].text


class TestThirdSessionSpecTags:
    BASE = """
input:
  type: table
  path: /root/testdata/sf0.001
  name: {table}
pipeline:
  processors:
  - type: {proc}
output: {{type: memory}}
"""

    def _run(self, spark, proc, table="documents"):
        from nekton_spark.spec import Spec, compile_spec

        raw = self.BASE.format(proc=proc, table=table)
        df, _ = compile_spec(spark, Spec.from_yaml(raw))
        return df

    def test_remove_boilerplate_tag(self, spark):
        df = self._run(spark, "remove_boilerplate\n    min_docs: 3")
        assert df.count() == 500 and "n_removed" in df.columns

    def test_dedup_lines_tag(self, spark):
        df = self._run(spark, "dedup_lines\n    min_count: 2")
        assert df.count() == 500 and "n_removed" in df.columns

    def test_remove_repeated_spans_tag(self, spark):
        df = self._run(spark, "remove_repeated_spans\n    n: 8\n    min_docs: 3")
        assert df.count() == 500 and "clean_text" in df.columns

    def test_classifier_score_tag(self, spark):
        df = self._run(spark, "classifier_score")
        assert df.count() == 500 and "clf_score" in df.columns

    def test_length_histogram_tag(self, spark):
        df = self._run(spark, "length_histogram")
        assert df.count() >= 1 and "bin_lo" in df.columns

    def test_semdedup_tag(self, spark):
        df = self._run(spark, "semdedup\n    tau: 0.35", table="embeddings")
        assert df.count() == 500 and "is_dup" in df.columns

    def test_fuzzy_decontaminate_tag_drops_self_dups(self, spark):
        # eval = the same corpus at threshold ~1. In the default mode
        # (unrelated id spaces) every doc matches its own identical
        # eval twin, so everything is dropped; with the opt-in
        # shared-corpus mode (exclude_same_id) a doc is not its own
        # leak and only docs with a same-text SIBLING are dropped —
        # the synthetic corpus has none, so all 500 survive
        dropped = self._run(
            spark,
            "fuzzy_decontaminate\n    eval_path: /root/testdata/sf0.001\n    threshold: 0.99",
        )
        assert dropped.count() == 0
        kept = self._run(
            spark,
            "fuzzy_decontaminate\n    eval_path: /root/testdata/sf0.001\n"
            "    threshold: 0.99\n    exclude_same_id: true",
        )
        assert kept.count() == 500


class TestRound7SpecTags:
    """r6 verdict #6: the operators that were functions-only get YAML
    spec tags — each must resolve, compile, and run end-to-end from a
    spec (the reference's product surface, /root/reference/src/lib.rs:67-72)."""

    BASE = """
input:
  type: table
  path: /root/testdata/sf0.001
  name: {table}
pipeline:
  processors:
  - type: {proc}
output: {{type: memory}}
"""

    def _run(self, spark, proc, table="documents"):
        from nekton_spark.spec import Spec, compile_spec

        raw = self.BASE.format(proc=proc, table=table)
        df, _ = compile_spec(spark, Spec.from_yaml(raw))
        return df

    def test_tfidf_tag(self, spark):
        df = self._run(spark, "tfidf_top_terms\n    k: 2")
        assert df.count() == 1000 and "tfidf" in df.columns

    def test_bm25_inline_queries_tag(self, spark):
        df = self._run(spark, 'bm25\n    k: 3\n    queries:\n      1: "hash join"')
        rows = df.collect()
        assert 0 < len(rows) <= 3 and {r.query_id for r in rows} == {1}

    def test_bm25_requires_queries(self, spark):
        import pytest as _pytest

        with _pytest.raises(Exception, match="queries"):
            self._run(spark, "bm25").collect()

    def test_chunk_tag(self, spark):
        df = self._run(spark, "chunk\n    chunk_tokens: 16\n    overlap: 4")
        assert df.count() > 500 and "chunk_idx" in df.columns

    def test_bpe_merges_tag(self, spark):
        df = self._run(spark, "bpe_merges\n    k: 10")
        assert df.count() == 10 and "pair" in df.columns

    def test_bloom_decontaminate_tag(self, spark):
        # eval = same corpus: every doc shares its own 8-grams, so the
        # whole corpus is flagged and dropped — exercises filter build,
        # broadcast set-bit relation, and exact verification
        df = self._run(
            spark,
            "bloom_decontaminate\n    eval_path: /root/testdata/sf0.001",
        )
        assert df.count() == 0

    def test_weighted_sample_tag(self, spark):
        df = self._run(
            spark,
            "weighted_sample\n    key_col: doc_id\n    weight_col: n_chars\n    k: 25",
        )
        assert df.count() == 25

    def test_quota_sample_tag(self, spark):
        df = self._run(
            spark,
            "quota_sample\n    group_cols: [source]\n    k: 5\n"
            "    order_col: n_chars\n    key_col: doc_id",
        )
        from pyspark.sql import functions as F

        per = df.groupBy("source").count().agg(F.max("count")).first()[0]
        assert per <= 5

    def test_stratified_sample_tag(self, spark):
        df = self._run(
            spark,
            "stratified_sample\n    key_col: doc_id\n    stratum_col: lang\n"
            "    rates:\n      en: 1.0\n      fr: 0.0",
        )
        langs = {r.lang for r in df.select("lang").distinct().collect()}
        assert "fr" not in langs

    def test_ann_topk_pq_method(self, spark):
        df = self._run(
            spark,
            "ann_topk\n    method: pq\n    query_ids: [0, 1]\n    k: 3",
            table="embeddings",
        )
        rows = df.collect()
        assert len(rows) == 6 and {r.query_id for r in rows} == {0, 1}

    def test_ann_topk_pq_rerank_method(self, spark):
        """pq_rerank spec tag: ADC candidates re-scored with exact
        cosine — scores are cosines (≤ 1), not raw inner products."""
        df = self._run(
            spark,
            "ann_topk\n    method: pq_rerank\n    query_ids: [0, 1]\n    k: 3",
            table="embeddings",
        )
        rows = df.collect()
        assert len(rows) == 6 and {r.query_id for r in rows} == {0, 1}
        assert all(r.score <= 1.0 for r in rows)

    def test_ann_topk_ivfpq_method(self, spark):
        df = self._run(
            spark,
            "ann_topk\n    method: ivfpq\n    query_ids: [0, 1]\n    k: 3",
            table="embeddings",
        )
        rows = df.collect()
        assert len(rows) == 6 and {r.query_id for r in rows} == {0, 1}

    def test_ann_topk_ivfpq_residual_method(self, spark):
        """r11 spec tag: residual IVF-PQ — re-ranked scores are exact
        cosines (≤ 1), not raw inner products."""
        df = self._run(
            spark,
            "ann_topk\n    method: ivfpq_residual\n    query_ids: [0, 1]\n    k: 3",
            table="embeddings",
        )
        rows = df.collect()
        assert len(rows) == 6 and {r.query_id for r in rows} == {0, 1}
        assert all(r.score <= 1.0 for r in rows)

    def test_drift_tag_numeric_and_categorical(self, spark):
        from nekton_spark.spec import Spec, compile_spec

        raw = """
input:
  type: table
  path: /root/testdata/sf0.001
  name: documents
pipeline:
  processors:
  - type: filter
    predicate: doc_id % 2 = 0
  - type: drift
    numeric_cols: [n_chars]
    other:
      input:
        type: table
        path: /root/testdata/sf0.001
        name: documents
      processors:
      - type: filter
        predicate: doc_id % 2 = 1
output: {type: memory}
"""
        df, _ = compile_spec(spark, Spec.from_yaml(raw))
        r = df.first()
        assert r.column == "n_chars" and r.psi is not None

    def test_mixture_sample_tag(self, spark):
        df = self._run(
            spark,
            "mixture_sample\n    budget_tokens: 2000\n    targets:\n"
            "      src0: 0.5\n      src1: 0.5",
        )
        srcs = {r.source for r in df.select("source").distinct().collect()}
        assert srcs <= {"src0", "src1"} and df.count() > 0


class TestR9SpecTags:
    BASE = """
input:
  type: table
  path: /root/testdata/sf0.001
  name: {table}
pipeline:
  processors:
  - type: {proc}
output: {{type: memory}}
"""

    def _run(self, spark, proc, table="documents"):
        from nekton_spark.spec import Spec, compile_spec

        raw = self.BASE.format(proc=proc, table=table)
        df, _ = compile_spec(spark, Spec.from_yaml(raw))
        return df

    def test_lang_id_trained_tag(self, spark):
        df = self._run(spark, "lang_id")
        assert df.count() == 500 and "lang" in df.columns
        # annotation preserves the frame's own columns
        assert "text" in df.columns and "source" in df.columns

    def test_lang_id_profile_tag(self, spark):
        df = self._run(spark, "lang_id\n    method: profile")
        assert df.count() == 500 and "lang" in df.columns

    def test_lang_id_bad_method_refused(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="trained|profile"):
            self._run(spark, "lang_id\n    method: bogus").count()

    def test_dsir_tag_scores_and_threshold(self, spark):
        df = self._run(
            spark, "dsir\n    target_where: source IN ('src0', 'src1')"
        )
        n_all = df.count()
        assert n_all > 0 and "log_ratio" in df.columns
        assert df.filter("source IN ('src0', 'src1')").count() == 0
        # threshold semantics at both extremes (scores on this corpus
        # are all negative — the target split is 10% of 500 random
        # docs, so no raw doc looks more target-like than raw-like):
        # a floor below every score keeps all, one above drops all
        lo = self._run(
            spark,
            "dsir\n    target_where: source IN ('src0', 'src1')\n"
            "    min_log_ratio: -1000000.0",
        )
        assert lo.count() == n_all
        hi = self._run(
            spark,
            "dsir\n    target_where: source IN ('src0', 'src1')\n"
            "    min_log_ratio: 1000000.0",
        )
        assert hi.count() == 0

    def test_heavy_hitters_tag(self, spark):
        df = self._run(spark, "heavy_hitters\n    k: 5")
        rows = df.collect()
        assert len(rows) == 5
        assert all(r.est_n >= r.true_n for r in rows)

    def test_pca_tag(self, spark):
        df = self._run(spark, "pca", table="embeddings")
        assert df.columns == ["vec_id", "pc1", "pc2"]
        assert df.count() == 500

    def test_dedup_winnow_tag(self, spark):
        df = self._run(spark, "dedup_winnow\n    min_shared: 1")
        assert df.columns == ["id_a", "id_b", "n_shared", "overlap"]
        assert df.count() > 0  # the sf0.001 corpus plants near-dups
        assert df.filter("id_a >= id_b").count() == 0

    def test_embedding_outliers_tag(self, spark):
        df = self._run(spark, "embedding_outliers\n    k: 10", table="embeddings")
        rows = df.collect()
        assert [r.rank for r in rows] == list(range(1, 11))
        assert all(rows[i].dist2 >= rows[i + 1].dist2 for i in range(9))

    def test_mmr_tag(self, spark):
        df = self._run(
            spark,
            "mmr\n    query_ids: [0, 1]\n    k: 3\n    c: 10",
            table="embeddings",
        )
        rows = df.collect()
        assert len(rows) == 6
        assert {r.query_id for r in rows} == {0, 1}
        r1 = [r for r in rows if r.rank == 1]
        assert all(r.mmr == r.score for r in r1)

    def test_zorder_key_tag(self, spark):
        df = self._run(
            spark, "zorder_key\n    col_a: doc_id\n    col_b: n_chars"
        )
        assert "zv" in df.columns
        assert df.filter("zv IS NULL").count() == 0
        assert df.count() == 500  # annotate pass carries every row

    def test_zorder_key_n_tag(self, spark):
        df = self._run(
            spark, "zorder_key_n\n    cols: [doc_id, n_chars]\n    bits: 16"
        )
        assert "zv" in df.columns and df.count() == 500

    def test_hilbert_key_tag(self, spark):
        df = self._run(
            spark, "hilbert_key\n    col_a: doc_id\n    col_b: n_chars"
        )
        assert "hv" in df.columns
        assert df.filter("hv IS NULL").count() == 0
        assert df.count() == 500

    def test_dedup_keep_best_tag_flags_and_drop(self, spark):
        flags = self._run(spark, "dedup_keep_best")
        assert set(flags.columns) == {"doc_id", "component", "quality", "keep"}
        n_keep = flags.filter("keep").count()
        kept = self._run(spark, "dedup_keep_best\n    drop: true")
        assert kept.count() == n_keep
        assert "text" in kept.columns  # drop preserves the frame's columns


class TestBpeSpecTag:
    def test_bpe_encode_frozen_table(self, spark, sf_dir):
        df = compile_df(
            spark,
            f"""
input:
  type: table
  path: {sf_dir}
  name: documents
pipeline:
  processors:
    - type: bpe_encode
output:
  type: memory
""",
        )
        assert {"bpe_ids", "n_bpe"} <= set(df.columns)
        rows = df.select("n_bpe").collect()
        assert len(rows) == 500 and any(r.n_bpe > 0 for r in rows)

    def test_bpe_encode_user_merges(self, spark):
        from nekton_spark.spec import Spec, compile_spec

        df = spark.createDataFrame(
            [(1, "abab cd")], "doc_id long, text string"
        )
        df.createOrReplaceTempView("bpe_in")
        out = compile_df(
            spark,
            """
input:
  type: sql
  query: SELECT * FROM bpe_in
pipeline:
  processors:
    - type: bpe_encode
      merges:
        - [a, b]
        - [ab, ab]
output:
  type: memory
""",
        )
        (row,) = out.collect()
        # vocab: a=0 b=1 c=2 d=3, ab=4, abab=5 -> "abab"=[5], "cd"=[2,3]
        assert row.bpe_ids == [5, 2, 3] and row.n_bpe == 3


class TestComplianceGate:
    def test_end_to_end_gate(self, spark, tmp_path):
        """The specs/compliance-gate.yml composition: WARC -> decode ->
        meta + JSON-LD -> URL keys -> broadcast robots join ->
        robots_filter -> keep allowed, indexable pages with their
        license."""
        from nekton_spark.functions.warc import warc_encode_response

        warcs = tmp_path / "warcs"
        warcs.mkdir()
        pages = [
            ("http://a.example/public/x", "", '"license":"CC"'),
            ("http://a.example/private/y", "", '"license":"X"'),
            ("http://a.example/public/z",
             '<meta name="robots" content="noindex">', '"license":"X"'),
            ("http://b.example/ok", "", '"license":"ToS"'),
        ]
        recs = []
        for i, (uri, meta, lic) in enumerate(pages):
            html = (
                f"<html><head><title>P{i}</title>{meta}"
                f'<script type="application/ld+json">'
                f'{{"@type":"Article",{lic}}}</script>'
                f"</head><body><p>body {i}</p></body></html>"
            )
            recs.append(
                warc_encode_response(uri, html.encode(), record_id=f"<u:{i}>")
            )
        (warcs / "dump.warc").write_bytes(b"".join(recs))
        robots_dir = tmp_path / "robots"
        spark.createDataFrame(
            [
                ("a.example", "User-agent: *\nDisallow: /private/\n"),
                ("b.example", "User-agent: *\nDisallow:\n"),
            ],
            "domain string, robots_txt string",
        ).write.parquet(str(robots_dir))
        out = compile_df(
            spark,
            f"""
input:
  type: media_files
  path: {warcs}
  glob: "*.warc"
pipeline:
  processors:
    - type: warc_records
      media: true
    - type: filter
      predicate: "warc_type = 'response' AND http_status = 200"
    - type: decode_body_text
    - type: html_meta
    - type: html_jsonld
    - type: url_keys
      url_col: target_uri
    - type: with_column
      name: path
      expr: "regexp_extract(target_uri, '^[a-z]+://[^/]+(/.*)$', 1)"
    - type: join
      other:
        type: file
        path: {robots_dir}
        format: parquet
        as_messages: false
      "on": ["domain"]
      how: left
      broadcast: true
    - type: robots_filter
      agent: trainbot
    - type: filter
      predicate: "robots_allowed = 1 AND noindex = 0"
    - type: select
      columns: ["norm_url", "title", "license"]
output:
  type: memory
""",
        )
        rows = sorted(
            (r.norm_url, r.title, r.license) for r in out.collect()
        )
        assert rows == [
            ("http://a.example/public/x", "P0", "CC"),
            ("http://b.example/ok", "P3", "ToS"),
        ]


class TestDiscoveryInventory:
    def test_sitemaps_to_domain_inventory(self, spark, tmp_path):
        """The specs/discovery-inventory.yml composition: sitemap
        payloads (plain + gzip) -> entries -> canonical URL keys ->
        per-domain inventory; case-varying hosts and permuted query
        params must collapse to one page."""
        import zlib

        d = tmp_path / "sitemaps"
        d.mkdir()
        (d / "a.xml").write_bytes(
            b"<urlset><url><loc>https://A.example/p?b=2&amp;a=1</loc></url>"
            b"<url><loc>https://a.example/p?a=1&amp;b=2</loc></url>"
            b"<url><loc>https://a.example/q</loc></url></urlset>"
        )
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        (d / "b.xml.gz").write_bytes(
            co.compress(
                b"<urlset><url><loc>https://b.example/x</loc></url></urlset>"
            )
            + co.flush()
        )
        out = compile_df(
            spark,
            f"""
input:
  type: media_files
  path: {d}
  glob: "*.xml*"
pipeline:
  processors:
    - type: sitemap_entries
      media: true
    - type: filter
      predicate: "refusal IS NULL AND kind = 'url'"
    - type: domain_rollup
      url_col: loc
output:
  type: memory
""",
        )
        got = {r.domain: (r.n_urls, r.n_pages) for r in out.collect()}
        assert got == {"a.example": (3, 2), "b.example": (1, 1)}
