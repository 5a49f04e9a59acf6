"""Winnowing fingerprint tests (functions/winnow.py — Schleimer et
al. 2003): selection correctness (density bound, rightmost-tie rule,
short-doc edges) and the paper's detection guarantee (any shared
passage of >= w+k-1 tokens yields a shared fingerprint)."""

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nekton_spark.functions.winnow import winnow_fingerprints, winnow_pairs

K, W = 4, 4
GUARANTEE = W + K - 1  # 7 tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSelection:
    def test_short_empty_null_docs_emit_nothing(self, spark):
        df = _docs(
            spark,
            [(1, "a b c"), (2, ""), (3, None), (4, "   "), (5, "a b c d")],
        )
        out = winnow_fingerprints(df, k=K, w=W).collect()
        # only doc 5 has >= k tokens: one gram, one whole-array window
        assert {r.doc_id for r in out} == {5}
        assert len(out) == 1 and out[0].pos == 1

    def test_density_bound(self, spark):
        """At most one selection per window: |fps| <= n_grams - wlen + 1,
        and at least one for any doc with >= k tokens."""
        words = [string.ascii_lowercase[i % 26] + str(i * 7 % 13) for i in range(60)]
        df = _docs(spark, [(1, " ".join(words))])
        fps = winnow_fingerprints(df, k=K, w=W).collect()
        n_grams = 60 - K + 1
        n_windows = n_grams - W + 1
        assert 1 <= len(fps) <= n_windows
        # winnowing's expected density is 2/(w+1); allow generous slack
        # but catch a selector that keeps (almost) everything.
        assert len(fps) <= int(0.8 * n_grams)

    def test_rightmost_tie_rule(self, spark):
        """All-identical tokens -> every gram hashes equal -> each
        window's minimum is a tie, resolved to the RIGHTMOST position:
        window j (0-based) selects gram index j + w."""
        df = _docs(spark, [(1, " ".join(["x"] * 10))])
        fps = winnow_fingerprints(df, k=K, w=W).collect()
        # 7 grams, windows j=0..3 -> positions {4,5,6,7}, one fp value
        assert sorted(r.pos for r in fps) == [4, 5, 6, 7]
        assert len({r.fp for r in fps}) == 1

    def test_positions_are_valid_gram_indexes(self, spark):
        words = [f"t{i}" for i in range(30)]
        df = _docs(spark, [(1, " ".join(words))])
        fps = winnow_fingerprints(df, k=K, w=W).collect()
        n_grams = 30 - K + 1
        assert all(1 <= r.pos <= n_grams for r in fps)
        assert len({(r.pos, r.fp) for r in fps}) == len(fps)


class TestGuarantee:
    def test_planted_passage_detected(self, spark):
        """Two docs sharing exactly a GUARANTEE-token passage in
        otherwise disjoint text must share a fingerprint."""
        passage = " ".join(f"shared{i}" for i in range(GUARANTEE))
        a = " ".join(f"left{i}" for i in range(20)) + " " + passage
        b = passage + " " + " ".join(f"right{i}" for i in range(20))
        df = _docs(spark, [(1, a), (2, b)])
        pairs = winnow_pairs(
            df, k=K, w=W, min_shared=1, max_doc_freq=10
        ).collect()
        assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]

    def test_disjoint_docs_share_nothing(self, spark):
        a = " ".join(f"alpha{i}" for i in range(30))
        b = " ".join(f"beta{i}" for i in range(30))
        pairs = winnow_pairs(
            _docs(spark, [(1, a), (2, b)]), k=K, w=W, min_shared=1
        ).collect()
        assert pairs == []

    def test_df_cut_drops_boilerplate_fingerprints(self, spark):
        """A passage present in EVERY doc is boilerplate: with
        max_doc_freq=1 every SHARED fingerprint is cut and no pairs
        survive, while the permissive cut reports all-pairs overlap.
        (A cut between the extremes can still leave pairs whose shared
        fp was selected by few docs — selection near the unique/shared
        boundary is context-dependent, which is winnowing/MOSS
        behavior, not a bug.)"""
        passage = " ".join(f"tpl{i}" for i in range(GUARANTEE))
        rows = [
            (i, " ".join(f"u{i}w{j}" for j in range(15)) + " " + passage)
            for i in range(6)
        ]
        loose = winnow_pairs(
            _docs(spark, rows), k=K, w=W, min_shared=1, max_doc_freq=10
        ).collect()
        assert len(loose) == 15  # all 6-choose-2 pairs share the passage
        cut = winnow_pairs(
            _docs(spark, rows), k=K, w=W, min_shared=1, max_doc_freq=1
        ).collect()
        assert cut == []

    @settings(max_examples=15, deadline=None)
    @given(
        plen=st.integers(GUARANTEE, 12),
        la=st.integers(0, 10),
        lb=st.integers(0, 10),
        salt=st.integers(0, 1000),
    )
    def test_guarantee_property(self, spark, plen, la, lb, salt):
        """Schleimer et al. theorem: a shared substring of
        w+k-1 tokens or longer ALWAYS yields a shared fingerprint,
        wherever it sits in either doc (derandomized via the gate
        hypothesis profile)."""
        passage = " ".join(f"p{salt}x{i}" for i in range(plen))
        a_words = [f"a{salt}x{i}" for i in range(la)]
        b_words = [f"b{salt}x{i}" for i in range(lb)]
        a = " ".join(a_words + [passage])
        b = " ".join([passage] + b_words)
        fp = winnow_fingerprints(
            _docs(spark, [(1, a), (2, b)]), k=K, w=W
        ).collect()
        s1 = {r.fp for r in fp if r.doc_id == 1}
        s2 = {r.fp for r in fp if r.doc_id == 2}
        assert s1 & s2


class TestPairsOutput:
    def test_overlap_is_shared_over_min_size(self, spark):
        df = _docs(spark, [(1, " ".join(["x"] * 10)), (2, " ".join(["x"] * 10))])
        pairs = winnow_pairs(df, k=K, w=W, min_shared=1).collect()
        assert len(pairs) == 1
        p = pairs[0]
        assert p.n_shared == 1 and p.overlap == pytest.approx(1.0)


class TestScriptTokenize:
    def test_cjk_shared_passage_needs_script_policy(self, spark):
        """r14: two documents sharing a long spaceless-CJK passage are
        invisible to word-token winnowing (each doc ~1 token < k);
        tokenize='script' fingerprints per character and the pair
        surfaces with the winnowing guarantee intact."""
        from nekton_spark.functions.winnow import winnow_pairs

        shared = "春眠不觉晓处处闻啼鸟夜来风雨声花落知多少"  # 20 chars
        d = spark.createDataFrame(
            [
                (1, "甲" + shared + "乙"),
                (2, "丙丁" + shared),
                (3, "完全不同的另外一段文字内容而已"),
            ],
            "doc_id long, text string",
        )
        assert winnow_pairs(d, k=4, w=4, min_shared=2).count() == 0
        got = winnow_pairs(
            d, k=4, w=4, min_shared=2, tokenize="script"
        ).collect()
        assert [(r.id_a, r.id_b) for r in got] == [(1, 2)]
