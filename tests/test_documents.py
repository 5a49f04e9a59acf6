"""Mixed-format document router (functions/documents.py): mime
dispatch, normalized schema, refusal isolation, Spark surfaces. The
driver row document_extract carries the closed-form oracle."""

from pyspark.sql import functions as F

from nekton_spark.functions.documents import (
    _extract_one,
    extract_documents,
    synth_document_media,
)
from nekton_spark.functions.docx import docx_encode
from nekton_spark.functions.pdf import pdf_encode


class TestKernel:
    def test_pdf_pages(self):
        p = pdf_encode([["a"], ["b"]])
        rows = _extract_one("application/pdf", p)
        assert [(r["unit_no"], r["text"]) for r in rows] == [(0, "a"), (1, "b")]
        assert all(r["doc_format"] == "pdf" and r["n_units"] == 2 for r in rows)

    def test_docx_and_mime_params_ignored(self):
        d = docx_encode(["x", "y"], title="T")
        rows = _extract_one(
            "application/vnd.openxmlformats-officedocument"
            ".wordprocessingml.document; charset=x",
            d,
        )
        assert rows[0]["text"] == "x\ny" and rows[0]["title"] == "T"
        assert rows[0]["n_units"] == 2

    def test_html_and_plain(self):
        rows = _extract_one(
            "text/html", b"<title>T</title><p>body &amp; soul</p>"
        )
        assert rows[0]["doc_format"] == "html"
        assert rows[0]["text"] == "T\nbody & soul"
        assert rows[0]["title"] == "T"
        rows = _extract_one("text/plain", "héllo".encode("utf-8"))
        assert rows[0]["text"] == "héllo"
        # invalid utf-8 falls back to the latin-1 total function
        rows = _extract_one("text/plain", b"caf\xe9")
        assert rows[0]["text"] == "café"

    def test_refusals_stay_reason_coded(self):
        rows = _extract_one("application/pdf", b"not a pdf")
        assert rows[0]["refusal"] == "bad_signature"
        rows = _extract_one("application/zstd", b"\x28\xb5")
        assert rows[0]["refusal"] == "unsupported_mime"


class TestSpark:
    def test_mixed_corpus_rows(self, spark):
        d = spark.createDataFrame(
            [(k, f"body {k}") for k in range(10)], "doc_id long, text string"
        )
        out = extract_documents(synth_document_media(d).drop("text"))
        got = {r.doc_id: r for r in out.collect()}
        assert got[0].doc_format == "pdf" and got[0].text == "d 0\nbody 0"
        assert got[1].doc_format == "docx" and got[1].title == "T1"
        assert got[2].doc_format == "html" and got[2].title == "T"
        assert got[3].text == "plain 3\nbody 3"
        assert got[4].refusal == "unsupported_mime"
        assert got[4].text is None

    def test_processor_over_media_files(self, spark, tmp_path):
        from nekton_spark.registry import PROCESSORS
        from nekton_spark.sources.files import media_files_source

        p = tmp_path / "mixed"
        p.mkdir()
        (p / "a.pdf").write_bytes(pdf_encode([["pdf text"]]))
        (p / "b.docx").write_bytes(docx_encode(["docx text"]))
        (p / "c.html").write_bytes(b"<p>html text</p>")
        (p / "d.txt").write_bytes(b"plain text")
        media = media_files_source(spark, str(p))
        out = PROCESSORS["extract_documents"](media).collect()
        texts = {r.doc_format: r.text for r in out}
        assert texts.get("pdf") == "pdf text"
        assert texts.get("docx") == "docx text"
        assert texts.get("html") == "html text"
        assert texts.get("text") == "plain text"
