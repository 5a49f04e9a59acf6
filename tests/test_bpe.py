"""Trained-BPE tests (functions/bpe.py): trainer determinism, greedy
encode semantics (lowest rank first, leftmost, overlap handling),
vocab id layout, end-to-end encode, and the frozen STD_MERGES pin."""

import pytest
from pyspark.sql import functions as F

from nekton_spark.functions.bpe import (
    STD_MERGES,
    bpe_encode,
    build_vocab,
    encode_word,
    train_bpe,
    train_bpe_py,
)

SF = "/root/testdata/sf0.001"


class TestTrainer:
    def test_hand_computed(self):
        # "abab"x3 + "ab"x2: pair (a,b) count 8 wins round 1;
        # round 2: ("ab","ab") count 3 beats ("b","a")... which is
        # gone after merging; round 3: nothing >= 2 twice
        m = train_bpe_py({"abab": 3, "ab": 2}, 5)
        assert m[0] == ("a", "b")
        assert m[1] == ("ab", "ab")
        assert len(m) == 2  # no remaining pair with count >= 2

    def test_tie_breaks_lexicographic(self):
        # (a,b) and (c,d) both count 2 -> (a,b) first
        m = train_bpe_py({"ab": 2, "cd": 2}, 2)
        assert m == [("a", "b"), ("c", "d")]

    def test_incremental_trainer_equals_naive_reference(self):
        """r11: train_bpe_py is the incremental (subword-nmt style)
        trainer; its merge table must equal the textbook full-rescan
        reference on randomized tables, including overlap-heavy words
        ('aaaa') and count-1 early stops."""
        import random

        from nekton_spark.functions.bpe import _train_bpe_py_naive

        for seed in range(20):
            rng = random.Random(seed)
            words = {}
            for _ in range(rng.randint(5, 150)):
                w = "".join(
                    rng.choice("abcde") for _ in range(rng.randint(1, 10))
                )
                words[w] = rng.randint(1, 50)
            words["a" * rng.randint(2, 9)] = rng.randint(1, 9)
            nm = rng.randint(1, 60)
            assert train_bpe_py(words, nm) == _train_bpe_py_naive(words, nm), seed

    def test_count1_pairs_not_merged(self):
        assert train_bpe_py({"xy": 1}, 3) == []

    def test_spark_front_end_matches_frozen(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        assert train_bpe(docs, n_merges=24) == STD_MERGES


class TestEncodeWord:
    def test_chained_merges(self):
        ranks = {p: i for i, p in enumerate(STD_MERGES)}
        assert encode_word("window", ranks) == ["window"]
        assert encode_word("windows", ranks) == ["window", "s"]
        assert encode_word("sort", ranks) == ["sort"]
        assert encode_word("zzz", ranks) == ["z", "z", "z"]

    def test_lowest_rank_wins_over_leftmost(self):
        # rules: rank0 (b,c), rank1 (a,b). "abc": (a,b) at pos0 is
        # leftmost but (b,c) has lower rank -> merge bc first, then
        # (a,bc) is no rule -> ["a","bc"]
        ranks = {("b", "c"): 0, ("a", "b"): 1}
        assert encode_word("abc", ranks) == ["a", "bc"]

    def test_leftmost_within_same_rank_and_overlap(self):
        # greedy run semantics: "aaa" with (a,a) -> [aa, a]
        ranks = {("a", "a"): 0}
        assert encode_word("aaa", ranks) == ["aa", "a"]
        assert encode_word("aaaa", ranks) == ["aa", "aa"]
        assert encode_word("aaaaa", ranks) == ["aa", "aa", "a"]

    def test_merge_reopens_lower_rank(self):
        # "xab": rank0 (x,ab) can only fire AFTER rank1 (a,b) creates
        # "ab" -- the one-merge-per-step loop re-scans from scratch
        ranks = {("x", "ab"): 0, ("a", "b"): 1}
        assert encode_word("xab", ranks) == ["xab"]


class TestVocab:
    def test_layout(self, spark):
        df = spark.createDataFrame(
            [(1, "ba ab"), (2, "c a")], "doc_id long, text string"
        )
        v = build_vocab(df, [("a", "b"), ("b", "a")])
        # base chars sorted, then merge outputs in rank order
        assert v == {"a": 0, "b": 1, "c": 2, "ab": 3, "ba": 4}

    def test_duplicate_merge_output_single_id(self, spark):
        df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        # ("a","bc") and ("ab","c") both output "abc": one id
        v = build_vocab(df, [("b", "c"), ("a", "bc"), ("a", "b"), ("ab", "c")])
        assert list(v) == ["a", "b", "c", "bc", "abc", "ab"]


class TestEncodeFrame:
    def _df(self, spark):
        return spark.createDataFrame(
            [
                (1, "window sort"),
                (2, None),
                (3, "   "),
                (4, "zzz window"),
            ],
            "doc_id long, text string",
        )

    def test_end_to_end(self, spark):
        df = self._df(spark)
        v = build_vocab(df, STD_MERGES)
        out = {r.doc_id: (r.bpe_ids, r.n_bpe) for r in
               bpe_encode(df, STD_MERGES).collect()}
        assert out[1] == ([v["window"], v["sort"]], 2)
        assert out[2] == ([], 0)   # NULL text = empty doc
        assert out[3] == ([], 0)   # whitespace-only
        assert out[4] == ([v["z"]] * 3 + [v["window"]], 4)

    def test_word_order_preserved(self, spark):
        df = spark.createDataFrame(
            [(1, "b a b a a")], "doc_id long, text string"
        )
        v = build_vocab(df, [])
        (row,) = bpe_encode(df, []).collect()
        assert row.bpe_ids == [v["b"], v["a"], v["b"], v["a"], v["a"]]

    def test_plan_no_cartesian_single_arrow_pass(self, spark):
        from nekton_spark import plans

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        df = bpe_encode(docs, STD_MERGES)
        p = plans.simple_plan(df)
        assert "CartesianProduct" not in p
        # exactly one Arrow eval, on the distinct-word relation
        assert p.count("ArrowEvalPython") == 1


class TestTokenBudgetWiring:
    """tokenizer='bpe' on the three token-budget consumers: identical
    arithmetic, trained-BPE counts."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (0, "window sort window", "src0"),
                (1, "zzz", "src0"),
                (2, "order order order order", "src1"),
                (3, None, "src1"),
            ],
            "doc_id long, text string, source string",
        )

    def test_pack_sequences_bpe_counts(self, spark):
        from nekton_spark.functions.packing import pack_sequences

        out = {r.id: r.n_tokens for r in
               pack_sequences(self._docs(spark), budget=4, n_shards=1,
                              tokenizer="bpe").collect()}
        # window/sort/order are single tokens under STD_MERGES; zzz = 3
        assert out == {0: 3, 1: 3, 2: 4, 3: 0}

    def test_pack_sequences_unknown_tokenizer_refused(self, spark):
        from nekton_spark.functions.packing import pack_sequences

        with pytest.raises(ValueError, match="unknown tokenizer"):
            pack_sequences(self._docs(spark), tokenizer="wordpiece")

    def test_chunk_documents_bpe_ids(self, spark):
        from nekton_spark.functions.bpe import STD_MERGES, bpe_encode
        from nekton_spark.functions.text_analysis import chunk_documents

        df = self._docs(spark)
        ids = {r.doc_id: r.bpe_ids for r in bpe_encode(df, STD_MERGES).collect()}
        out = chunk_documents(df, chunk_tokens=2, overlap=1,
                              tokenizer="bpe").collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        # doc 0: 3 bpe tokens, stride 1 -> chunks [0:2],[1:3]
        c0 = sorted(by_doc[0], key=lambda r: r.chunk_idx)
        assert [r.chunk_ids for r in c0] == [ids[0][0:2], ids[0][1:3]]
        assert all(r.n_chunks == 2 for r in c0)
        assert 3 not in by_doc  # empty doc yields no chunks

    def test_mixture_sample_bpe_budget(self, spark):
        from nekton_spark.functions.sampling import mixture_sample

        df = self._docs(spark)
        # budget large enough that every source rate caps at 1 -> all
        # docs of targeted sources kept regardless of tokenizer
        full = mixture_sample(df, {"src0": 0.5, "src1": 0.5}, 10**6,
                              tokenizer="bpe")
        assert sorted(r.doc_id for r in full.collect()) == [0, 1, 2, 3]
        # whitespace and bpe modes agree on membership mechanics; only
        # the rate inputs differ — tiny budget drops the bigger source
        some = mixture_sample(df, {"src1": 1.0}, 1, tokenizer="bpe")
        assert all(r.source == "src1" for r in some.collect())


class TestSpecProcessorTrainedBranch:
    def test_n_merges_trains_on_input(self, spark):
        from nekton_spark.operators.llm import bpe_encode_processor

        df = spark.createDataFrame(
            [(1, "abab abab"), (2, "abab cd")], "doc_id long, text string"
        )
        out = {r.doc_id: r.bpe_ids for r in
               bpe_encode_processor(df, n_merges=2).collect()}
        # trained on input: (a,b) then (ab,ab); vocab a0 b1 c2 d3 ab4 abab5
        assert out[1] == [5, 5]
        assert out[2] == [5, 2, 3]


class TestDecode:
    def test_round_trip_char_stream(self, spark):
        from nekton_spark.functions.bpe import bpe_decode

        df = spark.createDataFrame(
            [(1, "window sort zzz"), (2, None)], "doc_id long, text string"
        )
        v = build_vocab(df, STD_MERGES)
        enc = bpe_encode(df, STD_MERGES)
        out = {r.doc_id: r.tokens for r in bpe_decode(enc, v).collect()}
        assert out[1] == ["window", "sort", "z", "z", "z"]
        # concat(tokens) == whitespace-stripped char stream
        assert "".join(out[1]) == "windowsortzzz"
        assert out[2] == []

    def test_unknown_id_refused(self, spark):
        from nekton_spark.functions.bpe import bpe_decode

        df = spark.createDataFrame(
            [(1, [999],)], "doc_id long, bpe_ids array<int>"
        )
        with pytest.raises(Exception, match="not in vocab"):
            bpe_decode(df, {"a": 0}).collect()

    def test_encode_foreign_vocab_refused(self, spark):
        # r10 ADVICE: a caller-supplied vocab that doesn't cover the
        # corpus alphabet refuses with context (mirrors bpe_decode),
        # not a bare KeyError from inside the Arrow pass
        df = spark.createDataFrame(
            [(1, "zq zq")], "doc_id long, text string"
        )
        with pytest.raises(Exception, match="not in vocab"):
            bpe_encode(df, STD_MERGES, vocab={"a": 0}).collect()
