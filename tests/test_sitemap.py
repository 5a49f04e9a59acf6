"""Sitemap protocol (functions/sitemap.py): urlset / sitemapindex /
plain-text / gzip parsing, protocol caps, per-row isolation, the
robots.txt Sitemap: directive extractor, and the Spark surfaces. The
driver row sitemap_extract carries the closed-form oracle."""

import zlib

import pytest
from pyspark.sql import functions as F

from nekton_spark.functions.sitemap import (
    parse_sitemap,
    robots_sitemaps,
    sitemap_entries,
    synth_sitemap_media,
)

URLSET = (
    b'<?xml version="1.0" encoding="UTF-8"?>'
    b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    b"<url><loc>https://e/p?a=1&amp;b=2</loc><lastmod>2024-01-02</lastmod>"
    b"<changefreq>daily</changefreq><priority>0.8</priority></url>"
    b"<url><loc> https://e/q </loc></url></urlset>"
)


class TestKernel:
    def test_urlset_fields_and_entities(self):
        got = parse_sitemap(URLSET)
        assert got[0] == {
            "kind": "url", "loc": "https://e/p?a=1&b=2",
            "lastmod": "2024-01-02", "changefreq": "daily", "priority": 0.8,
        }
        assert got[1]["loc"] == "https://e/q"
        assert got[1]["priority"] is None

    def test_namespace_prefixes(self):
        idx = (
            b'<sm:sitemapindex xmlns:sm="y"><sm:sitemap>'
            b"<sm:loc>https://e/a.xml</sm:loc>"
            b"<sm:lastmod>2023-12-31</sm:lastmod>"
            b"</sm:sitemap></sm:sitemapindex>"
        )
        got = parse_sitemap(idx)
        assert got == [{
            "kind": "sitemap", "loc": "https://e/a.xml",
            "lastmod": "2023-12-31", "changefreq": None, "priority": None,
        }]

    def test_item_tags_with_attributes(self):
        """<url> elements carrying attributes still parse, and the
        item regex never mistakes the <urlset>/<sitemapindex> roots
        for items."""
        got = parse_sitemap(
            b'<urlset><url data-x="1"><loc>https://e/a</loc></url></urlset>'
        )
        assert [e["loc"] for e in got] == ["https://e/a"]

    def test_child_tags_with_attributes(self):
        """A <loc> (or any child tag) carrying attributes is still a
        valid entry, not missing_loc (r13 ADVICE) — and a longer tag
        sharing the prefix (<locations>) is still NOT mistaken for it."""
        got = parse_sitemap(
            b'<urlset><url><loc data-y="2">https://e/b</loc>'
            b"<lastmod tz='z'>2024-05-06</lastmod></url></urlset>"
        )
        assert got == [{
            "kind": "url", "loc": "https://e/b", "lastmod": "2024-05-06",
            "changefreq": None, "priority": None,
        }]
        import pytest as _pt
        with _pt.raises(ValueError, match="missing required <loc>"):
            parse_sitemap(
                b"<urlset><url><locations>https://e/c</locations>"
                b"</url></urlset>"
            )

    def test_gzip_and_plain_text(self):
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        gz = co.compress(URLSET) + co.flush()
        assert parse_sitemap(gz) == parse_sitemap(URLSET)
        txt = b"https://e/a\n\n https://e/b \n"
        assert [e["loc"] for e in parse_sitemap(txt)] == [
            "https://e/a", "https://e/b",
        ]

    def test_refusals(self):
        with pytest.raises(ValueError, match="urlset/sitemapindex"):
            parse_sitemap(b"<html>page</html>")
        with pytest.raises(ValueError, match="absolute URL"):
            parse_sitemap(b"not-a-url\n")
        with pytest.raises(ValueError, match="<loc>"):
            parse_sitemap(b"<urlset><url><lastmod>x</lastmod></url></urlset>")
        with pytest.raises(ValueError, match="gzip"):
            parse_sitemap(b"\x1f\x8b" + b"\x00" * 20)
        with pytest.raises(ValueError, match="UTF-8"):
            parse_sitemap(b"<urlset>\xff\xfe\xfa</urlset>")

    def test_entry_cap(self):
        body = b"".join(
            b"<url><loc>https://e/" + str(i).encode() + b"</loc></url>"
            for i in range(50_001)
        )
        with pytest.raises(ValueError, match="50000-entry"):
            parse_sitemap(b"<urlset>" + body + b"</urlset>")

    def test_robots_sitemap_directives(self):
        txt = (
            "User-agent: *\nDisallow: /x\n"
            "Sitemap: https://e/sitemap.xml\n"
            "sitemap: https://e/2.xml # comment\n"
        )
        assert robots_sitemaps(txt) == [
            "https://e/sitemap.xml", "https://e/2.xml",
        ]
        assert robots_sitemaps(None) == []


class TestSpark:
    def test_synth_legs(self, spark):
        d = spark.createDataFrame([(k,) for k in range(8)], "doc_id long")
        rows = sitemap_entries(synth_sitemap_media(d)).collect()
        by_key = {}
        for r in rows:
            by_key.setdefault(r.doc_id, []).append(r)
        assert len(by_key[1]) == 3  # gzipped leg carries 3 urls
        assert all(r.refusal is None for r in rows)
        assert by_key[0][0].loc == "https://s.example/p?a=1&k=0u0"
        assert by_key[2][0].kind == "sitemap"
        assert by_key[3][0].loc == "https://s.example/t/3/0"
        assert by_key[5][0].priority == 0.5

    def test_per_row_isolation(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(URLSET)), (2, bytearray(b"<html>no</html>"))],
            "doc_id long, payload binary",
        )
        got = {}
        for r in sitemap_entries(df).collect():
            got.setdefault(r.doc_id, []).append(r)
        assert len(got[1]) == 2 and got[1][0].refusal is None
        assert len(got[2]) == 1 and got[2][0].refusal == "not_a_sitemap"
        assert got[2][0].loc is None

    def test_processor_registry(self, spark):
        from nekton_spark.registry import PROCESSORS

        df = spark.createDataFrame(
            [(1, bytearray(URLSET))], "doc_id long, payload binary"
        )
        out = PROCESSORS["sitemap_entries"](df).collect()
        assert out[0].loc == "https://e/p?a=1&b=2"
