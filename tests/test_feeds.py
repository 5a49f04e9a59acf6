"""RSS/Atom feeds (functions/feeds.py): kernel parsing across both
dialects, CDATA/entity/link-rel handling, bomb guards, per-row
isolation, Spark surfaces. Driver row feed_extract carries the
closed-form oracle."""

import pytest
from pyspark.sql import functions as F

from nekton_spark.functions.feeds import (
    feed_entries,
    parse_feed,
    synth_feed_media,
)

RSS = (
    b'<?xml version="1.0"?><rss version="2.0"><channel>'
    b"<title>Chan &amp; Co</title>"
    b"<item><title>T1</title><link>https://e/a</link>"
    b"<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>"
    b"<guid>g1</guid></item>"
    b"<item><title><![CDATA[Raw <b> kept]]></title></item>"
    b"</channel></rss>"
)

ATOM = (
    b'<feed xmlns="http://www.w3.org/2005/Atom"><title>AF</title>'
    b'<entry><title>A1</title><link rel="self" href="https://e/self"/>'
    b'<link rel="alternate" href="https://e/alt"/>'
    b"<updated>2024-02-01</updated><id>u1</id></entry>"
    b'<entry><title>A2</title><link href="https://e/plain"/>'
    b"<published>2024-03-01</published><id>u2</id></entry></feed>"
)


class TestKernel:
    def test_rss(self):
        got = parse_feed(RSS)
        assert got[0] == {
            "feed_kind": "rss", "feed_title": "Chan & Co", "title": "T1",
            "link": "https://e/a",
            "published": "Mon, 01 Jan 2024 00:00:00 GMT", "entry_id": "g1",
        }
        # CDATA unwraps raw (no entity decode inside)
        assert got[1]["title"] == "Raw <b> kept"
        assert got[1]["link"] is None

    def test_atom(self):
        got = parse_feed(ATOM)
        assert got[0]["link"] == "https://e/alt"  # alternate wins over self
        assert got[0]["published"] == "2024-02-01"  # updated preferred
        assert got[1]["link"] == "https://e/plain"  # rel-less accepted
        assert got[1]["published"] == "2024-03-01"
        assert [g["feed_title"] for g in got] == ["AF", "AF"]

    def test_atom_single_quoted_attrs(self):
        """Single-quoted href/rel attributes are valid XML and must
        yield the link (r13 ADVICE)."""
        feed = (
            b"<feed><title>SQ</title><entry><title>e</title>"
            b"<link rel='alternate' href='https://e/sq'/>"
            b"<id>sq1</id></entry></feed>"
        )
        got = parse_feed(feed)
        assert got[0]["link"] == "https://e/sq"

    def test_refusals(self):
        with pytest.raises(ValueError, match="rss/channel/feed"):
            parse_feed(b"<html>nope</html>")
        body = b"".join(
            b"<item><title>t</title></item>" for _ in range(50_001)
        )
        with pytest.raises(ValueError, match="50000-entry"):
            parse_feed(b"<rss><channel>" + body + b"</channel></rss>")


class TestSpark:
    def test_synth_legs(self, spark):
        d = spark.createDataFrame([(k,) for k in range(6)], "doc_id long")
        rows = feed_entries(synth_feed_media(d)).collect()
        by_key = {}
        for r in rows:
            by_key.setdefault(r.doc_id, []).append(r)
        assert len(by_key[0]) == 2 and by_key[0][0].feed_kind == "rss"
        assert by_key[0][0].title == "T & 0_0"
        assert len(by_key[1]) == 2 and by_key[1][0].feed_kind == "atom"
        assert by_key[1][0].link == "https://f.example/a/1/0"
        assert len(by_key[2]) == 1 and by_key[2][0].refusal == "not_a_feed"

    def test_processor_registry(self, spark):
        from nekton_spark.registry import PROCESSORS

        df = spark.createDataFrame(
            [(1, bytearray(ATOM))], "doc_id long, payload binary"
        )
        out = PROCESSORS["feed_entries"](df).collect()
        assert out[0].link == "https://e/alt"
