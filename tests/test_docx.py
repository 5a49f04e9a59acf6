"""DOCX extraction (functions/docx.py): zip/XML round trips, control
element handling, refusal contracts, per-row isolation, Spark
surfaces. Driver row docx_extract carries the closed-form oracle."""

import io
import zipfile

import pytest
from pyspark.sql import functions as F

from nekton_spark.functions.docx import (
    docx_encode,
    docx_extract,
    docx_text,
    synth_docx_media,
)


class TestKernel:
    def test_round_trip(self):
        paras = ["Doc 5", "hello\tworld\nsecond & <line>", "end 5"]
        t, title, n = docx_text(docx_encode(paras, title="T&5"))
        assert t == "\n".join(paras)
        assert title == "T&5" and n == 3

    def test_unicode_round_trip(self):
        paras = ["привет 🙂", "日本語\tx"]
        t, title, n = docx_text(docx_encode(paras))
        assert t == "\n".join(paras) and title is None and n == 2

    def test_deterministic_bytes(self):
        assert docx_encode(["a", "b"]) == docx_encode(["a", "b"])

    def test_empty_paragraphs_kept(self):
        assert docx_text(docx_encode(["", "x", ""]))[0] == "\nx\n"

    def test_refusals(self):
        with pytest.raises(ValueError, match="ZIP signature"):
            docx_text(b"junk")
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("other.xml", "y")
        with pytest.raises(ValueError, match="not_docx"):
            docx_text(buf.getvalue())
        with pytest.raises(ValueError, match="zip"):
            docx_text(b"PK\x03\x04 corrupt")


class TestSpark:
    def test_extract_rows(self, spark):
        d = spark.createDataFrame(
            [(k, f"body {k}\tt") for k in range(6)],
            "doc_id long, text string",
        )
        out = docx_extract(synth_docx_media(d).drop("text"), "docx").collect()
        got = {r.doc_id: r for r in out}
        for k in range(6):
            r = got[k]
            assert r.text == f"Doc {k}\nbody {k}\tt\nend {k % 9}"
            assert r.n_paragraphs == 3 and r.refusal is None
            assert r.title == (f"T{k % 7}" if k % 3 == 0 else None)

    def test_per_row_isolation(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(docx_encode(["ok"]))), (2, bytearray(b"nope"))],
            "doc_id long, payload binary",
        )
        got = {r.doc_id: r for r in docx_extract(df).collect()}
        assert got[1].text == "ok" and got[1].refusal is None
        assert got[2].text is None and got[2].refusal == "bad_signature"

    def test_processor_and_media_ext(self, spark, tmp_path):
        from nekton_spark.registry import PROCESSORS
        from nekton_spark.sources.files import media_files_source

        p = tmp_path / "docs"
        p.mkdir()
        (p / "a.docx").write_bytes(docx_encode(["from file"]))
        media = media_files_source(spark, str(p))
        assert media.first().media.mime.endswith("wordprocessingml.document")
        out = PROCESSORS["docx_extract"](media, media=True).collect()
        assert out[0].text == "from file"
