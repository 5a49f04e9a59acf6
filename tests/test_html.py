"""HTML → text extraction (functions/html.py): parser edge cases,
the two DataFrame surfaces, the boilerplate keep rule, and the spec
processors. The driver rows html_extract / html_main_text carry the
closed-form oracle; here we pin the behaviors the synth page can't
reach (tag soup, nesting, void elements, single-decode entities)."""

import pytest
from pyspark.sql import functions as F

from nekton_spark.functions.html import (
    _parse_blocks,
    html_extract,
    html_main_text,
    synth_html,
)


class TestParseBlocks:
    def test_basic_blocks(self):
        got = _parse_blocks("<p>a</p><p>b  c</p>")
        assert got == [("a", 1, 0), ("b c", 3, 0)]

    def test_script_style_comment_dropped(self):
        html = (
            "<script>var a = '<p>x</p>';</script><style>p{}</style>"
            "<noscript>n</noscript><template>t</template>"
            "<!-- c --><p>kept</p>"
        )
        assert _parse_blocks(html) == [("kept", 4, 0)]

    def test_entities_decode_once(self):
        # &amp;#38; is the literal '&#38;', not '&'
        assert _parse_blocks("<p>&amp;#38; &lt;i&gt;</p>") == [
            ("&#38; <i>", 9, 0)
        ]

    def test_br_hr_split_blocks(self):
        assert [b[0] for b in _parse_blocks("<p>a<br>b<hr>c</p>")] == [
            "a", "b", "c"
        ]
        # XHTML-style void form
        assert [b[0] for b in _parse_blocks("<p>a<br/>b</p>")] == ["a", "b"]

    def test_link_chars(self):
        got = _parse_blocks('<p>see <a href="/x">here</a> now</p>')
        assert got == [("see here now", 12, 4)]

    def test_nested_anchor_closes(self):
        # tag soup: stray </a> must not underflow
        got = _parse_blocks("</a><p><a>x</a>y</p>")
        assert got == [("xy", 2, 1)]

    def test_inline_tags_flow(self):
        got = _parse_blocks("<p><b>bo</b>ld <i>it</i></p>")
        assert got == [("bold it", 7, 0)]

    def test_unclosed_trailing_text_flushes(self):
        assert _parse_blocks("<p>open") == [("open", 4, 0)]

    def test_empty_and_whitespace_blocks_dropped(self):
        assert _parse_blocks("<p>  </p><div></div><p>x</p>") == [("x", 1, 0)]

    def test_table_rows_are_blocks(self):
        got = _parse_blocks(
            "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>"
        )
        assert [b[0] for b in got] == ["a", "b", "c"]


class TestDataFrames:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, html string")

    def test_extract_columns(self, spark):
        d = self._df(spark, [(1, "<h1>t</h1><p>body <a href=x>l</a></p>")])
        row = html_extract(d).collect()[0]
        assert row.text == "t\nbody l"
        assert row.n_blocks == 2
        assert row.text_chars == 7
        assert row.link_chars == 1
        assert row.link_density == round(1 / 7, 6)

    def test_null_html_is_empty_document(self, spark):
        row = html_extract(self._df(spark, [(1, None)])).collect()[0]
        assert row.text == "" and row.n_blocks == 0
        assert row.link_density is None

    def test_main_text_drops_nav_and_short(self, spark):
        d = self._df(
            spark,
            [(1, '<p>real body text</p><div><a href=x>Home</a></div><p>z</p>')],
        )
        row = html_main_text(d).collect()[0]
        assert row.main_text == "real body text"
        assert row.n_kept == 1 and row.n_dropped == 2

    def test_main_text_threshold_validation(self, spark):
        d = self._df(spark, [(1, "<p>x</p>")])
        with pytest.raises(ValueError, match="max_link_density"):
            html_main_text(d, max_link_density=1.5)
        with pytest.raises(ValueError, match="min_block_chars"):
            html_main_text(d, min_block_chars=0)

    def test_synth_round_trip(self, spark, tables):
        d = tables["documents"].select("doc_id", "text").limit(20)
        out = html_extract(synth_html(d)).select("doc_id", "text", "n_blocks")
        exp = d.select(
            "doc_id",
            F.concat(
                F.lit("T\nDoc & "),
                F.col("doc_id").cast("string"),
                F.lit("\n"),
                F.trim(F.regexp_replace("text", r"\s+", " ")),
                F.lit("\nHome Next >"),
            ).alias("text"),
        )
        j = out.join(exp.withColumnRenamed("text", "exp"), "doc_id")
        assert j.filter(F.col("text") != F.col("exp")).count() == 0
        assert out.filter(F.col("n_blocks") != 4).count() == 0

    def test_processor_registry(self, spark):
        from nekton_spark.registry import PROCESSORS

        d = self._df(spark, [(1, "<p>hello</p>")])
        got = PROCESSORS["html_extract"](d).collect()[0]
        assert got.text == "hello"
        got2 = PROCESSORS["html_main_text"](d).collect()[0]
        assert got2.main_text == "hello"

    def test_no_shuffle_map_only(self, spark):
        d = self._df(spark, [(1, "<p>x</p>")])
        plan = html_extract(d)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestMeta:
    def test_fields(self, spark):
        from nekton_spark.functions.html import html_meta

        rows = [
            (1, '<html lang="en"><head><title> A  B </title>'
                '<meta name="robots" content="NOINDEX, nofollow">'
                '<link rel="canonical" href="https://x/y"></head></html>'),
            (2, "<p>no head</p>"),
            (3, '<meta name="robots" content="none">'),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, html string")
        got = {r.doc_id: r for r in html_meta(df).collect()}
        assert (got[1].title, got[1].lang, got[1].canonical) == (
            "A B", "en", "https://x/y")
        assert (got[1].noindex, got[1].nofollow) == (1, 1)
        assert got[2].title is None and got[2].noindex == 0
        assert (got[3].noindex, got[3].nofollow) == (1, 1)  # 'none' = both
        assert got[4].title is None

    def test_processor(self, spark):
        from nekton_spark.registry import PROCESSORS

        df = spark.createDataFrame(
            [(1, "<title>t</title>")], "doc_id long, html string"
        )
        assert PROCESSORS["html_meta"](df).first().title == "t"


class TestMarkdown:
    def test_rules(self):
        from nekton_spark.functions.html import _parse_markdown

        h = (
            "<h1>Top</h1><h3>Sub</h3>"
            "<p>plain <b>bold</b> <em>it</em> <code>c()</code> "
            '<a href="/x">lnk</a></p>'
            "<ul><li>a</li><li>b<ul><li>deep</li></ul></li></ul>"
            "<ol><li>one</li><li>two</li></ol>"
            "<pre>keep  raw\n  indent</pre>"
            "<blockquote>q1</blockquote>"
        )
        assert _parse_markdown(h) == (
            "# Top\n\n### Sub\n\n"
            "plain **bold** *it* `c()` [lnk](/x)\n\n"
            "- a\n\n- b\n\n  - deep\n\n"
            "1. one\n\n2. two\n\n"
            "```\nkeep  raw\n  indent\n```\n\n"
            "> q1"
        )

    def test_br_hard_break_and_hostile_nul(self):
        from nekton_spark.functions.html import _parse_markdown

        assert _parse_markdown("<p>x<br>y</p>") == "x  \ny"
        # a literal NUL in data is content, not a break marker
        assert _parse_markdown("<p>a\x00b</p>") == "a\x00b"

    def test_script_comments_vanish_entities_decode(self):
        from nekton_spark.functions.html import _parse_markdown

        h = "<script>no()</script><p>A &amp; B</p><!-- c -->"
        assert _parse_markdown(h) == "A & B"

    def test_empty_inline_emits_nothing(self):
        from nekton_spark.functions.html import _parse_markdown

        assert _parse_markdown("<p>x <b></b>y</p>") == "x y"
        assert _parse_markdown('<p><a href="/z"></a>w</p>') == "w"

    def test_unclosed_inline_at_block_edge(self):
        from nekton_spark.functions.html import _parse_markdown

        assert _parse_markdown("<p>a <b>bold</p><p>next</p>") == (
            "a **bold**\n\nnext"
        )

    def test_nested_quote_prefix(self):
        from nekton_spark.functions.html import _parse_markdown

        assert _parse_markdown(
            "<blockquote>outer<blockquote>inner</blockquote></blockquote>"
        ) == "> outer\n\n> > inner"

    def test_spark_surface_and_processor(self, spark):
        from nekton_spark.functions.html import (
            html_to_markdown,
            synth_html_markdown,
        )
        from nekton_spark.registry import PROCESSORS

        d = spark.createDataFrame(
            [(3, "T  3"), (4, None)], "doc_id long, text string"
        )
        got = {
            r.doc_id: r.markdown
            for r in html_to_markdown(synth_html_markdown(d)).collect()
        }
        assert got[3].startswith("## Doc 3\n\nT 3 has **bold 3** and ")
        assert "[a link](/l/3)" in got[3]
        assert "\n\n```\nraw  3\ncode\n```\n\n> quote 3" in got[3]
        # NULL text follows the empty-document contract
        assert got[4].startswith("## Doc 4\n\nhas **bold 4**")

        df = spark.createDataFrame(
            [(1, "<h1>t</h1>")], "doc_id long, html string"
        )
        assert PROCESSORS["html_to_markdown"](df).first().markdown == "# t"


class TestJsonLd:
    def test_blocks_and_fields(self):
        from nekton_spark.functions.html import _parse_jsonld

        h = (
            '<script type="application/ld+json">'
            '{"@type":"Article","license":"L"}</script>'
            '<script type="application/ld+json">{bad</script>'
            '<SCRIPT TYPE="APPLICATION/LD+JSON">'
            '{"@graph":[{"@type":"Person","name":"P"}]}</SCRIPT>'
            "<script>var x = 1;</script>"
        )
        objs, n_bad = _parse_jsonld(h)
        assert n_bad == 1
        assert [o.get("@type") for o in objs] == ["Article", "Person"]

    def test_value_normal_forms(self):
        from nekton_spark.functions.html import _jsonld_str

        assert _jsonld_str("s") == "s"
        assert _jsonld_str({"name": "N", "@id": "I"}) == "N"
        assert _jsonld_str({"@id": "I"}) == "I"
        assert _jsonld_str([{"url": "U"}]) == "U"
        assert _jsonld_str(7) is None

    def test_spark_surface(self, spark):
        from nekton_spark.functions.html import html_jsonld, synth_html_jsonld
        from nekton_spark.registry import PROCESSORS

        d = spark.range(0, 12).select(F.col("id").alias("doc_id"))
        got = {r.doc_id: r for r in html_jsonld(synth_html_jsonld(d)).collect()}
        for k in range(12):
            r = got[k]
            assert r.ld_types == ["Article"]
            assert r.date_published == f"2024-0{k % 9 + 1}-01"
            assert r.author == f"A. {k % 11}"
            assert r.n_ld_blocks == 1
            assert r.n_ld_bad == (1 if k % 4 == 0 else 0)
        assert "creativecommons" in got[0].license
        # NULL html = no metadata, not a crash
        nul = spark.createDataFrame([(1, None)], "doc_id long, html string")
        rn = html_jsonld(nul).first()
        assert rn.n_ld_blocks == 0 and rn.license is None

        df = spark.createDataFrame(
            [(1, '<script type="application/ld+json">'
                 '{"@type":"Book","license":"X"}</script>')],
            "doc_id long, html string",
        )
        assert PROCESSORS["html_jsonld"](df).first().license == "X"
