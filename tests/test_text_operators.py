"""Golden-equality tests for the reference processor surface.

Vectors come verbatim from the reference's own unit tests (FIXTURES.md
§A); every processor gets a one-batch and a two-batch variant because
batch-boundary preservation is the invariant the reference tests
(SURVEY §5).
"""

from nekton_spark.operators import text
from nekton_spark.operators.messages import collect_batches, messages_df, renumber


def run(spark, batches, op, **kw):
    return collect_batches(op(messages_df(spark, batches), **kw))


class TestReplace:
    def test_one_batch(self, spark):
        assert run(spark, [["cheese"]], text.replace, **{"from": "ee", "to": "oo"}) == [["choose"]]

    def test_two_batches(self, spark):
        # reference src/processors.rs:82-98
        got = run(spark, [["cheese"], ["geese"]], text.replace, **{"from": "ee", "to": "oo"})
        assert got == [["choose"], ["goose"]]

    def test_multiple_occurrences(self, spark):
        assert run(spark, [["aaa"]], text.replace, **{"from": "a", "to": "bb"}) == [["bbbbbb"]]

    def test_literal_not_regex(self, spark):
        assert run(spark, [["a.c"]], text.replace, **{"from": ".", "to": "!"}) == [["a!c"]]


class TestRegexReplace:
    def test_named_groups_date(self, spark):
        # reference src/regex.rs:61-75
        got = run(
            spark,
            [["2012-03-14, 2013-01-15 and 2014-07-05"]],
            text.regex_replace,
            re=r"(?P<y>\d{4})-(?P<m>\d{2})-(?P<d>\d{2})",
            rep="$m/$d/$y",
        )
        assert got == [["03/14/2012, 01/15/2013 and 07/05/2014"]]

    def test_two_batches(self, spark):
        got = run(
            spark,
            [["2012-03-14"], ["2014-07-05"]],
            text.regex_replace,
            re=r"(?P<y>\d{4})-(?P<m>\d{2})-(?P<d>\d{2})",
            rep="$m/$d/$y",
        )
        assert got == [["03/14/2012"], ["07/05/2014"]]

    def test_numeric_group_refs(self, spark):
        assert run(spark, [["ab"]], text.regex_replace, re=r"(a)(b)", rep="$2$1") == [["ba"]]

    def test_dollar_literal(self, spark):
        assert run(spark, [["price"]], text.regex_replace, re="price", rep="$$9") == [["$9"]]


class TestRegexSplit:
    def test_whitespace(self, spark):
        # reference src/regex.rs:152-161
        assert run(spark, [["cheese\tcheese"]], text.regex_split, re=r"[ \t]+") == [
            ["cheese", "cheese"]
        ]

    def test_two_batches(self, spark):
        got = run(spark, [["a b"], ["c\td"]], text.regex_split, re=r"[ \t]+")
        assert got == [["a", "b"], ["c", "d"]]

    def test_keeps_empty_segments(self, spark):
        # Rust Regex::split keeps empties (SURVEY §2.2) → split(..., -1)
        assert run(spark, [["a,,b,"]], text.regex_split, re=",") == [["a", "", "b", ""]]

    def test_order_preserved_across_fanout(self, spark):
        got = run(spark, [["1,2,3,4,5,6,7,8,9,10"]], text.regex_split, re=",")
        assert got == [[str(i) for i in range(1, 11)]]


class TestRegexSelect:
    def test_hashtags(self, spark):
        # reference src/regex.rs:237-246
        got = run(spark, [["hello #cheese #world"]], text.regex_select, re=r"\#[a-zA-Z][0-9a-zA-Z_]*")
        assert got == [["#cheese", "#world"]]

    def test_no_match_drops_message(self, spark):
        got = run(
            spark,
            [["hello #x"], ["no tags at all"]],
            text.regex_select,
            re=r"\#[a-zA-Z][0-9a-zA-Z_]*",
        )
        assert got == [["#x"]]

    def test_two_batches(self, spark):
        got = run(spark, [["#a b"], ["c #d"]], text.regex_select, re=r"\#[a-zA-Z]+")
        assert got == [["#a"], ["#d"]]


class TestNoop:
    def test_identity(self, spark):
        df = messages_df(spark, [["x", "y"], ["z"]])
        assert collect_batches(text.noop(df)) == [["x", "y"], ["z"]]


class TestRenumber:
    def test_dense_after_split(self, spark):
        df = text.regex_split(messages_df(spark, [["a,b,c"]]), re=",")
        rows = renumber(df).orderBy("msg_idx").collect()
        assert [r.msg_idx for r in rows] == [0, 1, 2]
        assert [r.value for r in rows] == ["a", "b", "c"]


class TestDialectTranslation:
    def test_pattern(self):
        assert text.translate_pattern(r"(?P<y>\d+)") == r"(?<y>\d+)"

    def test_replacement_named(self):
        assert text.translate_replacement("$m/$d/$y") == "${m}/${d}/${y}"

    def test_replacement_braced(self):
        assert text.translate_replacement("${name}x") == "${name}x"

    def test_replacement_numeric(self):
        assert text.translate_replacement("$1-$2") == "$1-$2"

    def test_replacement_dollar_escape(self):
        assert text.translate_replacement("$$1") == "\\$1"

    def test_trailing_dollar(self):
        assert text.translate_replacement("x$") == "x\\$"

    def test_backslash(self):
        assert text.translate_replacement(r"a\b") == "a\\\\b"

    def test_ascii_word_boundary_cross_engine(self, spark):
        """r15 opt-round fuzz (seed 4651): Java's ``\\b`` is
        Unicode-aware by default, RE2/DuckDB's is ASCII-only — on
        ``a买b`` RE2 sees a boundary before ``b`` (买 ∉ ASCII \\w) and
        Java does not (买 IS a Java word char), so the
        pipe_regex_select driver row diverged from its oracle by one
        row. The row now spells the boundary explicitly as
        ``(?<![0-9A-Za-z_])`` — this test pins that spelling to RE2's
        ``\\b`` in DuckDB on the hostile neighborhood battery, and
        keeps the old blind spot red (the raw Java ``\\b`` still
        disagrees on the CJK-adjacent case)."""
        import duckdb

        from pyspark.sql import functions as F

        cases = [
            "a买b delta",       # CJK word char abuts the match (the fuzz doc)
            "a-b sat _b 9s",    # ASCII non-word / word neighborhoods
            "bs b s",           # start-of-string + bare tokens
            "买so Ωsat",        # spaceless + Greek (Ω is a Java word char too)
            "naïve sb",         # accented Latin neighbor
        ]
        ascii_pat = r"(?<![0-9A-Za-z_])[bs][a-z]*"
        d = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, t string")
        got = {
            r.i: r.m
            for r in d.select(
                "i", F.regexp_extract_all("t", F.lit(ascii_pat), F.lit(0)).alias("m")
            ).collect()
        }
        con = duckdb.connect()
        for i, c in enumerate(cases):
            want = con.execute(
                r"SELECT regexp_extract_all(?, '\b[bs][a-z]*')", [c]
            ).fetchone()[0]
            assert got[i] == want, (c, got[i], want)
        # the old blind spot stays red: raw Java \b misses the
        # CJK-adjacent match RE2 finds
        java_b = {
            r.i: r.m
            for r in d.select(
                "i", F.regexp_extract_all("t", F.lit(r"\b[bs][a-z]*"), F.lit(0)).alias("m")
            ).collect()
        }
        assert java_b[0] != got[0] and "b" in got[0]


class TestBatchMetadata:
    """Reference MessageBatch.metadata analog (src/lib.rs:33): batch-
    scoped keys ride in the per-message map under the 'batch.' prefix
    and survive any operator chain."""

    def test_survives_fanout_chain(self, spark):
        from nekton_spark.operators.messages import batch_metadata, with_batch_metadata

        df = with_batch_metadata(
            messages_df(spark, [["a,b", "c"], ["d,e"]]), {"origin": "test", "v": "1"}
        )
        out = text.replace(text.regex_split(df, re=","), to="X", **{"from": "d"})
        # per-message rows all still carry the batch-scoped keys
        rows = out.collect()
        assert all(r.metadata["batch.origin"] == "test" for r in rows)
        # and the batch-level view recovers one stripped map per batch
        bm = {r.batch_id: r.batch_meta for r in batch_metadata(out).collect()}
        assert bm == {0: {"origin": "test", "v": "1"}, 1: {"origin": "test", "v": "1"}}

    def test_merges_with_existing_message_metadata(self, spark):
        from pyspark.sql import functions as F

        from nekton_spark.operators.messages import batch_metadata, with_batch_metadata

        base = messages_df(spark, [["x"]]).withColumn(
            "metadata", F.create_map(F.lit("partition_key"), F.lit("7"))
        )
        out = with_batch_metadata(base, {"job": "j1"})
        r = out.first()
        assert r.metadata == {"partition_key": "7", "batch.job": "j1"}
        assert batch_metadata(out).first().batch_meta == {"job": "j1"}


class TestDupNgramFractionParity:
    def test_arrow_path_bit_equal_to_expression_witness(self, spark):
        """The r8 Arrow one-pass dup_ngram_fraction must be bit-equal
        to the pure-JVM expression form on every whitespace/NULL edge
        the tokenizer contract defines (space-only trim, ASCII \\s+
        split keeping leading/trailing empties, NULL = empty doc)."""
        from pyspark.sql import functions as F

        from nekton_spark.functions.text_analysis import (
            dup_ngram_fraction,
            dup_ngram_fraction_expr,
        )

        texts = [
            None, "", "   ", "\n", "a", "a b", "a b c", "a b c a b c",
            "a a a a a a", "\nx y z x y z", "x y z  \n", "x\ty z x y z",
            "a b c d e f g h", "one two three one two three one two three",
            " nbsp stays one token maybe", "a  b   c a  b",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string"
        )
        for n in (2, 3, 5):
            rows = df.select(
                "id",
                dup_ngram_fraction(F.col("text"), n).alias("arrow"),
                dup_ngram_fraction_expr(F.col("text"), n).alias("expr"),
            ).collect()
            for r in rows:
                assert r.arrow == r.expr, (n, texts[r.id], r.arrow, r.expr)

    def test_ngram_count_equals_size_of_ngrams(self, spark):
        """r15 opt parity witness: ngram_count (token arithmetic) must
        equal size(ngrams(...)) — the HOF it replaced in
        doc_repetition — on the same whitespace/NULL edge battery."""
        from pyspark.sql import functions as F

        from nekton_spark.functions.text_analysis import ngram_count, ngrams

        texts = [
            None, "", "   ", "\n", "a", "a b", "a b c", "a b c a b c",
            "a a a a a a", "\nx y z x y z", "x y z  \n", "x\ty z x y z",
            "a b c d e f g h", "one two three one two three one two three",
            " nbsp stays one token maybe", "a  b   c a  b",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string"
        )
        for n in (2, 3, 5):
            rows = df.select(
                "id",
                ngram_count(F.col("text"), n).alias("fast"),
                F.size(ngrams(F.col("text"), n)).alias("hof"),
            ).collect()
            for r in rows:
                assert r.fast == r.hof, (n, texts[r.id], r.fast, r.hof)


class TestTrainedLangId:
    """r8 verdict #7: the trained trigram-NB language id must beat the
    stopword-profile heuristic on HELD-OUT sentences (none appear in
    the embedded training corpus), and handle the degenerate inputs
    the NULL-text contract covers."""

    HELD_OUT = [
        ("en", "i would like to know when the next train leaves for the city."),
        ("en", "his answer was short but it explained everything we needed."),
        ("en", "please bring the documents to the meeting tomorrow afternoon."),
        ("es", "quisiera saber cuando sale el proximo tren hacia la ciudad."),
        ("es", "su respuesta fue corta pero explico todo lo que necesitabamos."),
        ("es", "por favor trae los documentos a la reunion de manana por la tarde."),
        ("fr", "je voudrais savoir quand part le prochain train pour la ville."),
        ("fr", "sa reponse etait courte mais elle expliquait tout ce qu il fallait."),
        ("fr", "veuillez apporter les documents a la reunion de demain apres midi."),
        ("de", "ich mochte wissen wann der nachste zug in die stadt fahrt."),
        ("de", "seine antwort war kurz aber sie erklarte alles was wir brauchten."),
        ("de", "bitte bringen sie die unterlagen morgen nachmittag zur besprechung."),
        ("zh", "我想知道下一班去城里的火车什么时候出发。"),
        ("zh", "他的回答很短，但解释了我们需要知道的一切。"),
        ("zh", "请明天下午把文件带到会议上来。"),
        # r12 breadth extension: 15 more languages, 2 held-out each
        ("pt", "gostaria de saber quando parte o próximo trem para a cidade."),
        ("pt", "por favor traga os documentos para a reunião de amanhã à tarde."),
        ("it", "vorrei sapere quando parte il prossimo treno per la città."),
        ("it", "per favore porta i documenti alla riunione di domani pomeriggio."),
        ("nl", "ik zou graag willen weten wanneer de volgende trein naar de stad vertrekt."),
        ("nl", "breng de documenten alsjeblieft morgenmiddag naar de vergadering."),
        ("sv", "jag skulle vilja veta när nästa tåg till staden går."),
        ("sv", "ta med dokumenten till mötet i morgon eftermiddag."),
        ("pl", "chciałbym wiedzieć kiedy odjeżdża następny pociąg do miasta."),
        ("pl", "proszę przynieść dokumenty na jutrzejsze spotkanie po południu."),
        ("tr", "bir sonraki trenin şehre ne zaman kalkacağını bilmek istiyorum."),
        ("tr", "lütfen belgeleri yarın öğleden sonra toplantıya getirin."),
        ("fi", "haluaisin tietää milloin seuraava juna lähtee kaupunkiin."),
        ("fi", "tuo asiakirjat huomenna iltapäivällä kokoukseen."),
        ("ro", "aș vrea să știu când pleacă următorul tren spre oraș."),
        ("ro", "vă rog să aduceți documentele la ședința de mâine după amiază."),
        ("id", "saya ingin tahu kapan kereta berikutnya berangkat ke kota."),
        ("id", "tolong bawa dokumen itu ke rapat besok sore."),
        ("vi", "tôi muốn biết khi nào chuyến tàu tiếp theo rời đi thành phố."),
        ("vi", "vui lòng mang tài liệu đến cuộc họp chiều mai."),
        ("ru", "я хотел бы знать когда отправляется следующий поезд в город."),
        ("ru", "пожалуйста принесите документы на завтрашнее собрание."),
        ("ja", "次の電車がいつ街へ出発するのか知りたい。"),
        ("ja", "明日の午後、会議に書類を持ってきてください。"),
        ("ko", "다음 기차가 언제 도시로 떠나는지 알고 싶다."),
        ("ko", "내일 오후 회의에 서류를 가져오세요."),
        ("ar", "أود أن أعرف متى يغادر القطار التالي إلى المدينة."),
        ("ar", "من فضلك أحضر الوثائق إلى اجتماع بعد ظهر الغد."),
        ("hi", "मैं जानना चाहता हूं कि अगली ट्रेन शहर के लिए कब निकलती है।"),
        ("hi", "कृपया कल दोपहर की बैठक में दस्तावेज लेकर आएं।"),
    ]

    def _df(self, spark):
        rows = [(i, t, s) for i, (t, s) in enumerate(self.HELD_OUT)]
        return spark.createDataFrame(rows, "doc_id long, truth string, text string")

    def test_heldout_accuracy_at_or_above_heuristic(self, spark):
        from pyspark.sql import functions as F

        from nekton_spark.functions.langid_model import lang_id_trained
        from nekton_spark.functions.text_analysis import lang_id

        df = self._df(spark)
        trained = {r.doc_id: r.lang for r in lang_id_trained(df).collect()}
        heur = {
            r.doc_id: r.h
            for r in df.select("doc_id", lang_id(F.col("text")).alias("h")).collect()
        }
        truth = {i: t for i, (t, _) in enumerate(self.HELD_OUT)}
        acc_t = sum(trained[i] == truth[i] for i in truth) / len(truth)
        acc_h = sum(heur[i] == truth[i] for i in truth) / len(truth)
        assert acc_t >= acc_h, (acc_t, acc_h)
        assert acc_t >= 0.9, f"trained held-out accuracy {acc_t:.2f} < 0.9"
        # the heuristic structurally cannot see unsegmented zh text via
        # whitespace tokens on these sentences containing punctuation;
        # the trained model must get all three
        zh_ids = [i for i, (t, _) in enumerate(self.HELD_OUT) if t == "zh"]
        assert all(trained[i] == "zh" for i in zh_ids)

    def test_degenerate_inputs(self, spark):
        from nekton_spark.functions.langid_model import lang_id_trained

        rows = [(0, None), (1, ""), (2, "xy"), (3, "   ")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: (r.lang, r.n_grams) for r in lang_id_trained(df).collect()}
        assert got[0] == ("und", 0)  # NULL → empty-document contract
        assert got[1] == ("und", 0)
        assert got[2] == ("und", 0)  # 2 chars → under the 3-char floor
        assert got[3][1] == 6  # three spaces → 3·3−3 = 6 gram occurrences
        assert len(got) == 4

    def test_arrow_and_expr_paths_agree(self, spark):
        """The Arrow one-pass scorer and the expression
        explode+broadcast+pivot twin are bit-identical (integer score
        arithmetic is order-free) — including unicode, ties, NULL, and
        sub-trigram inputs."""
        from nekton_spark.functions.langid_model import lang_id_trained

        rows = [(i, t, s) for i, (t, s) in enumerate(self.HELD_OUT)]
        rows += [(100, "und", None), (101, "und", ""), (102, "und", "ab")]
        df = spark.createDataFrame(rows, "doc_id long, truth string, text string")
        a = sorted(map(tuple, lang_id_trained(df, impl="arrow").collect()))
        e = sorted(map(tuple, lang_id_trained(df, impl="expr").collect()))
        assert a == e

    def test_annotate_matches_trained_and_replaces_lang(self, spark):
        """lang_id_annotate (the map-only processor/streaming shape)
        agrees with lang_id_trained verdict-for-verdict, preserves all
        other columns, and REPLACES an existing lang column."""
        from nekton_spark.functions.langid_model import (
            lang_id_annotate,
            lang_id_trained,
        )

        rows = [
            (i, "wrong", t, s) for i, (t, s) in enumerate(self.HELD_OUT)
        ] + [(100, "wrong", "und", None), (101, "wrong", "und", "ab")]
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, truth string, text string"
        )
        ann = lang_id_annotate(df)
        assert ann.columns.count("lang") == 1
        got = {r.doc_id: r for r in ann.collect()}
        ref = {r.doc_id: r.lang for r in lang_id_trained(df).collect()}
        assert {k: v.lang for k, v in got.items()} == ref
        assert all(v.truth is not None for v in got.values())  # cols kept
        assert not any(v.lang == "wrong" for v in got.values())  # replaced

    def test_annotate_streaming_map_only(self, spark, tmp_path):
        """The annotate path must run on a STREAMING frame (map-only,
        no stateful ops) — the spec `lang_id` processor's streaming
        contract."""
        from pyspark.sql import functions as F

        from nekton_spark.functions.langid_model import lang_id_annotate

        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(i, t) for i, (_, t) in enumerate(self.HELD_OUT[:6])],
            "doc_id long, text string",
        ).write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        out = lang_id_annotate(stream)
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("langid_stream_test")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                r.doc_id: r.lang
                for r in spark.sql("SELECT * FROM langid_stream_test").collect()
            }
        finally:
            q.stop()
        truth = {i: t for i, (t, _) in enumerate(self.HELD_OUT[:6])}
        assert got == truth


class TestSentenceSplit:
    def test_boundaries_and_guards(self, spark):
        from pyspark.sql import functions as F

        from nekton_spark.functions.text_analysis import split_sentences

        rows = [
            (1, 'Alpha one. Beta two! Dr. Smith spoke? "Quoted." End.'),
            (2, "One sentence only"),
            (3, "e.g. lowercase guard stays. Real End. Next 9 one."),
            (4, None),
            (5, "  "),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: (r.sentences, r.n_sentences)
               for r in split_sentences(df).collect()}
        assert got[1] == (
            ["Alpha one.", "Beta two!", "Dr. Smith spoke?", '"Quoted."',
             "End."], 5)
        assert got[2] == (["One sentence only"], 1)
        assert got[3] == (
            ["e.g. lowercase guard stays.", "Real End.", "Next 9 one."], 3)
        # NULL / whitespace text = empty document contract
        assert got[4] == ([], 0) and got[5] == ([], 0)

    def test_processor(self, spark):
        from nekton_spark.registry import PROCESSORS

        df = spark.createDataFrame([(1, "A b. C d.")], "doc_id long, text string")
        assert PROCESSORS["split_sentences"](df).first().n_sentences == 2

    def test_guarded_abbreviations_never_split(self, spark):
        """Property over the EXPORTED guard list (r13 verdict #7):
        every abbreviation followed by '.' and a capitalized (and a
        digit-led) continuation stays ONE sentence, while the same
        shape with an unguarded word splits."""
        from nekton_spark.functions.text_analysis import (
            SENTENCE_ABBREVIATIONS,
            split_sentences,
        )

        abbrs = [a.replace("\\.", ".") for a in SENTENCE_ABBREVIATIONS]
        rows = []
        for i, a in enumerate(abbrs):
            rows.append((2 * i, f"We cite {a}. Smith here."))
            rows.append((2 * i + 1, f"We cite {a}. 42 here."))
        control = len(rows)
        rows.append((control, "We cite word. Smith here."))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r.n_sentences for r in split_sentences(df).collect()}
        for i, a in enumerate(abbrs):
            assert got[2 * i] == 1, f"{a}. before capital split"
            assert got[2 * i + 1] == 1, f"{a}. before digit split"
        assert got[control] == 2  # unguarded word still splits
