"""WARC extraction (functions/warc.py): framing round trips across
every coding combination, refusals, the Python/JVM synth-page sync pin
that transfers html_extract's oracle to the warc_extract driver row,
and the DataFrame/processor surfaces."""

import zlib

import pytest
from pyspark.sql import functions as F

from nekton_spark.functions.warc import (
    _parse_http_response,
    synth_page_bytes,
    synth_warc_media,
    warc_encode_request,
    warc_encode_response,
    warc_gzip,
    warc_parse_records,
    warc_records,
)

HTML = b"<html><body><p>hello world</p></body></html>"


class TestFraming:
    def test_round_trips_all_codings(self):
        for chunked in (False, True):
            for gz_body in (False, True):
                rec = warc_encode_response(
                    "http://e.com/a", HTML, chunked=chunked, gzip_body=gz_body
                )
                full = warc_encode_request("http://e.com/a") + rec
                for payload in (full, warc_gzip([rec])):
                    rs = warc_parse_records(payload)
                    r = rs[-1]
                    assert r["warc_type"] == "response"
                    assert r["http_status"] == 200
                    assert r["target_uri"] == "http://e.com/a"
                    assert r["body"] == HTML

    def test_request_record_passes_through(self):
        rs = warc_parse_records(warc_encode_request("http://e.com/a"))
        assert rs[0]["warc_type"] == "request"
        assert rs[0]["http_status"] is None
        assert rs[0]["body"].startswith(b"GET ")

    def test_deflate_body(self):
        body = zlib.compress(HTML)
        block = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + body
        )
        status, hh, out = _parse_http_response(block)
        assert (status, out) == (200, HTML)

    def test_refusals(self):
        with pytest.raises(ValueError, match="WARC"):
            warc_parse_records(b"NOTAWARC")
        rec = warc_encode_response("u", HTML)
        with pytest.raises(ValueError, match="truncated|terminator"):
            warc_parse_records(rec[:-6])
        with pytest.raises(ValueError, match="Content-Length"):
            warc_parse_records(rec.replace(b"Content-Length", b"X-L", 1))
        # br DECODES since r14, zstd since r15 — corrupt streams are
        # ValueError; genuinely undecodable codings (RFC 9110
        # 'compress') still refuse NotImplementedError
        with pytest.raises(ValueError, match="brotli"):
            _parse_http_response(
                b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nx"
            )
        with pytest.raises(ValueError, match="zstd"):
            _parse_http_response(
                b"HTTP/1.1 200 OK\r\nContent-Encoding: zstd\r\n\r\nx"
            )
        with pytest.raises(NotImplementedError, match="compress"):
            _parse_http_response(
                b"HTTP/1.1 200 OK\r\nContent-Encoding: compress\r\n\r\nx"
            )
        with pytest.raises(ValueError, match="chunk"):
            _parse_http_response(
                b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\nx"
            )
        with pytest.raises(ValueError, match="gzip"):
            warc_parse_records(b"\x1f\x8b" + b"\x00" * 30)
        with pytest.raises(NotImplementedError, match="version"):
            warc_parse_records(
                b"WARC/9.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
            )

    def test_per_record_error_isolation(self):
        """r12 ADVICE: one bad record among good ones must not fail
        the file — the HTTP unwrap is isolated per record with a
        stable reason code, NULL http fields and the RAW block as
        body; only WARC-level framing damage still raises."""
        from nekton_spark.functions.warc import _warc_wrap

        br = _warc_wrap(
            "http://e.com/br",
            b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nXX",
            "<urn:uuid:br>",
        )  # corrupt brotli: isolates as bad_brotli (r14 — br decodes)
        chunk = _warc_wrap(
            "http://e.com/ch",
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\nx",
            "<urn:uuid:ch>",
        )
        nocolon = _warc_wrap(
            "http://e.com/nc",
            b"HTTP/1.1 200 OK\r\nBadHeaderNoColon\r\n\r\nbody",
            "<urn:uuid:nc>",
        )
        good = warc_encode_response("http://e.com/ok", HTML)
        rs = warc_parse_records(good + br + chunk + nocolon + good)
        assert len(rs) == 5
        assert [r["refusal"] for r in rs] == [
            None, "bad_brotli", "bad_chunking", "bad_header_line", None,
        ]
        for r in (rs[0], rs[4]):
            assert r["http_status"] == 200 and r["body"] == HTML
        for r in rs[1:4]:
            assert r["http_status"] is None
            assert r["body"].startswith(b"HTTP/1.1")  # raw block kept
            assert r["target_uri"] is not None  # WARC headers survive

    def test_warc_header_line_without_colon_is_isolated(self):
        """A stray colon-less WARC header line flags the record
        (refusal=bad_warc_header_line) but the record still frames via
        Content-Length and its HTTP layer still unwraps."""
        rec = warc_encode_response("http://e.com/a", HTML)
        bad = rec.replace(b"\r\n\r\nHTTP/", b"\r\nJunkNoColon\r\n\r\nHTTP/", 1)
        good = warc_encode_response("http://e.com/b", HTML + b"2")
        rs = warc_parse_records(bad + good)
        assert len(rs) == 2
        assert rs[0]["refusal"] == "bad_warc_header_line"
        assert rs[0]["http_status"] == 200 and rs[0]["body"] == HTML
        assert rs[1]["refusal"] is None and rs[1]["body"] == HTML + b"2"

    def test_multi_record_offsets(self):
        recs = [
            warc_encode_response(f"http://e.com/{i}", HTML + bytes([48 + i]))
            for i in range(5)
        ]
        rs = warc_parse_records(b"".join(recs))
        assert [r["target_uri"] for r in rs] == [
            f"http://e.com/{i}" for i in range(5)
        ]
        assert [r["body"][-1:] for r in rs] == [bytes([48 + i]) for i in range(5)]


class TestSparkSurface:
    def test_synth_page_matches_synth_html(self, spark, tables):
        """The Python twin must stay byte-identical to the JVM synth —
        this pin is what transfers html_extract's oracle to
        warc_extract."""
        from nekton_spark.functions.html import synth_html

        d = tables["documents"].select("doc_id", "text").limit(25)
        jvm = {r.doc_id: r.html for r in synth_html(d).collect()}
        for r in d.collect():
            assert synth_page_bytes(r.doc_id, r.text).decode("utf-8") == jvm[
                r.doc_id
            ]

    def test_warc_records_dataframe(self, spark, tables):
        d = tables["documents"].select("doc_id", "text").limit(12)
        recs = warc_records(synth_warc_media(d).drop("text"), "warc")
        got = recs.groupBy("warc_type").count().collect()
        assert {(r.warc_type, r["count"]) for r in got} == {
            ("request", 12), ("response", 12),
        }
        resp = recs.filter(F.col("warc_type") == "response")
        row = resp.filter(F.col("doc_id") == 1).first()  # gzip body + gz container
        assert row.http_status == 200
        assert bytes(row.body) == synth_page_bytes(
            1, d.filter(F.col("doc_id") == 1).first().text
        )

    def test_decode_body_text(self, spark):
        from nekton_spark.functions.warc import decode_body_text

        rows = [
            (0, bytearray("é".encode("utf-8")), None),  # undeclared utf-8
            (1, bytearray(b"\xe9caf\xe9"), None),  # invalid utf-8 → latin-1
            (2, bytearray("привет".encode("cp1251")),
             "text/html; charset=windows-1251"),
            # mis-declared: cp1251 bytes claimed as utf-8 → strict refusal
            (3, bytearray("привет".encode("cp1251")),
             "text/html; charset=utf-8"),
            (4, bytearray(b"\xef\xbb\xbfbom"), None),  # BOM strips
            (5, bytearray(b"x"), "text/html; charset=klingon-9"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, body binary, http_content_type string"
        )
        got = {r.doc_id: (r.html, r.charset)
               for r in decode_body_text(df).collect()}
        assert got[0] == ("é", "utf-8")
        assert got[1] == ("écafé", "latin-1")
        assert got[2] == ("привет", "windows-1251")
        assert got[3][0] is None and got[3][1].startswith("refused:undecodable")
        assert got[4] == ("bom", "utf-8")
        assert got[5][0] is None and "unknown_charset" in got[5][1]

    def test_processor_registry(self, spark):
        from nekton_spark.registry import PROCESSORS

        df = spark.createDataFrame(
            [(1, bytearray(warc_encode_response("http://e.com/x", HTML)))],
            "doc_id long, payload binary",
        )
        out = PROCESSORS["warc_records"](df).collect()
        assert out[0].target_uri == "http://e.com/x"
        assert bytes(out[0].body) == HTML

    def test_brotli_content_coding(self):
        """r14 (r13 verdict #4 adjudication): Content-Encoding: br
        unwraps through pyarrow's bundled reference brotli — valid
        bodies decode exactly, damage refuses reason-coded, and the
        chunked+br stack composes."""
        import pyarrow as pa

        from nekton_spark.functions.warc import (
            _crawl_refusal_code,
            _parse_http_response,
        )

        text = ("brotli page content " * 40).encode()
        comp = bytes(pa.Codec("brotli").compress(text))

        def resp(body: bytes, extra: bytes = b"") -> bytes:
            return (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Encoding: br\r\n" + extra
                + f"Content-Length: {len(body)}\r\n\r\n".encode() + body
            )

        status, hh, body = _parse_http_response(resp(comp))
        assert status == 200 and body == text
        # truncated / garbage streams refuse with the brotli code
        for bad in (comp[: len(comp) // 2], b"\x00garbage not brotli"):
            try:
                _parse_http_response(resp(bad))
                raise AssertionError("corrupt brotli did not refuse")
            except ValueError as e:
                assert _crawl_refusal_code(e) == "bad_brotli"
        # chunked transfer + br content coding compose (RFC order:
        # de-chunk first, then content-decode)
        chunked = (
            f"{len(comp):x}\r\n".encode() + comp + b"\r\n0\r\n\r\n"
        )
        st2, _, b2 = _parse_http_response(
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Transfer-Encoding: chunked\r\nContent-Encoding: br\r\n\r\n"
            + chunked
        )
        assert st2 == 200 and b2 == text

    def test_zstd_content_coding(self):
        """r15 (r14 verdict #2): Content-Encoding: zstd unwraps
        through pyarrow's bundled reference zstd — the same envelope
        adjudication as brotli: valid bodies decode exactly, damage
        (including truncation, which zstd detects via its frame
        checksum machinery) refuses reason-coded, and the chunked+zstd
        stack composes in RFC order."""
        import pyarrow as pa

        from nekton_spark.functions.warc import (
            _crawl_refusal_code,
            _parse_http_response,
        )

        text = ("zstd page content " * 40).encode()
        comp = bytes(pa.Codec("zstd").compress(text))

        def resp(body: bytes) -> bytes:
            return (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Encoding: zstd\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode() + body
            )

        status, hh, body = _parse_http_response(resp(comp))
        assert status == 200 and body == text
        for bad in (comp[: len(comp) // 2], b"\x00garbage not zstd"):
            try:
                _parse_http_response(resp(bad))
                raise AssertionError("corrupt zstd did not refuse")
            except ValueError as e:
                assert _crawl_refusal_code(e) == "bad_zstd"
        chunked = f"{len(comp):x}\r\n".encode() + comp + b"\r\n0\r\n\r\n"
        st2, _, b2 = _parse_http_response(
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Transfer-Encoding: chunked\r\nContent-Encoding: zstd\r\n\r\n"
            + chunked
        )
        assert st2 == 200 and b2 == text

    def test_crawl_coverage_rollup(self, spark):
        """crawl_coverage (r13): the hostile synth cycles every ingest
        refusal reason by key % 9; the rollup must land on the exact
        closed-form counts per (stage, status, reason). Leg 6 (r13
        ADVICE) plants a colonless WARC header line over a CLEAN
        response — the lenient-envelope flag must land in the ok
        bucket, not as an http refusal; legs 7 (r14) and 8 (r15) VALID
        brotli / zstd bodies that must decode to the ok bucket; leg 1
        (re-pointed r15) an undecodable 'compress' coding."""
        from nekton_spark.functions.warc import (
            crawl_coverage,
            synth_warc_hostile,
        )

        d = spark.createDataFrame(
            [(k, f"text {k}") for k in range(36)], "doc_id long, text string"
        )
        got = {
            (r.stage, r.status, r.reason): r.n
            for r in crawl_coverage(
                synth_warc_hostile(d).drop("doc_id", "text")
            ).collect()
        }
        assert got == {
            # legs 0 + 6 (flagged header) + 7 (brotli) + 8 (zstd)
            ("ok", "ok", "utf-8"): 16,
            ("http", "refused", "content_coding"): 4,
            ("http", "refused", "bad_chunking"): 4,
            ("http", "refused", "bad_header_line"): 4,
            ("charset", "refused", "unknown_charset:klingon"): 4,
            ("charset", "refused", "undecodable:utf-8"): 4,
        }

    def test_crawl_coverage_processor(self, spark):
        from nekton_spark.functions.warc import synth_warc_hostile
        from nekton_spark.registry import PROCESSORS

        d = spark.createDataFrame(
            [(k, "t") for k in range(8)], "doc_id long, text string"
        )
        out = PROCESSORS["crawl_coverage"](
            synth_warc_hostile(d).drop("doc_id", "text")
        ).collect()
        assert sum(r.n for r in out) == 8
        assert {r.stage for r in out} == {"ok", "http", "charset"}

    def test_streaming_crawl_ingest(self, spark, tmp_path):
        """The crawl front end is stateless maps, so it composes with
        Structured Streaming unchanged: media_files(stream) →
        warc_records → decode_body_text → html_main_text, exactly-once
        per file."""
        from nekton_spark.functions.html import html_main_text
        from nekton_spark.functions.warc import decode_body_text, warc_records
        from nekton_spark.sources.files import media_files_source

        d = tmp_path / "warcs"
        d.mkdir()
        for k in range(3):
            rec = warc_encode_response(
                f"http://s.example/{k}",
                f"<h1>page {k}</h1><p>stream body {k}</p>".encode(),
                chunked=(k % 2 == 0),
            )
            (d / f"c{k}.warc.gz").write_bytes(warc_gzip([rec]))
        stream = media_files_source(spark, str(d), stream=True, glob="*.warc.gz")
        recs = warc_records(
            stream.withColumn("payload", F.col("media.payload")).drop("media"),
            "payload",
        )
        resp = decode_body_text(
            recs.filter(F.col("warc_type") == "response")
        )
        out = html_main_text(resp)
        q = (
            out.select("target_uri", "main_text")
            .writeStream.format("memory")
            .queryName("crawl_stream")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = {
            r.target_uri: r.main_text
            for r in spark.sql("SELECT * FROM crawl_stream").collect()
        }
        assert rows == {
            f"http://s.example/{k}": f"page {k}\nstream body {k}"
            for k in range(3)
        }
