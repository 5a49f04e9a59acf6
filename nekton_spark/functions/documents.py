r"""Mixed-format document extraction — the one-call ingest router.

A real curation corpus directory is never one format: it is PDFs next
to DOCX next to saved HTML next to plain text. ``extract_documents``
routes each ``media_files`` row by mime to the matching extractor —
:mod:`.pdf` (one row per page), :mod:`.docx`, :mod:`.html` (+ charset
fallback), plain text — inside ONE Arrow pass, landing every format on
the same normalized schema:

    (doc_format, unit_no, n_units, title, text, refusal)

``unit_no`` counts pages for PDF and is 0 for single-unit formats;
``n_units`` is pages (PDF), paragraphs (DOCX), text blocks (HTML), or
1 (plain text). Refusals stay per-row reason codes (each extractor's
own codes, plus ``unsupported_mime``), so the standard coverage rollup
``groupBy(doc_format, refusal).count()`` reads ingest health across
the whole mixed corpus. Map-only, no shuffle; parallelizes by file.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_DOCX_MIME = (
    "application/vnd.openxmlformats-officedocument"
    ".wordprocessingml.document"
)

_OUT_FIELDS = [
    T.StructField("doc_format", T.StringType(), True),
    T.StructField("unit_no", T.IntegerType(), True),
    T.StructField("n_units", T.IntegerType(), True),
    T.StructField("title", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("refusal", T.StringType(), True),
]


def _decode_text_bytes(b: bytes) -> str:
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")  # the WHATWG total-function fallback


def _extract_one(mime: str | None, payload: bytes) -> list[dict]:
    """One media payload → normalized rows (pure kernel, shared by the
    Spark surface and tests)."""
    from .docx import _refusal_code as _docx_code
    from .docx import docx_text
    from .html import _parse_blocks, _parse_meta
    from .pdf import _Doc, _extract_page_text, _pdf_refusal_code

    mime = (mime or "").split(";")[0].strip().lower()
    if mime == "application/pdf":
        try:
            doc = _Doc(bytes(payload))
            pages = doc.pages()
            title = None
            for t in doc.trailers:
                inf = doc.resolve(t.get("Info"))
                if isinstance(inf, dict):
                    tt = doc.resolve(inf.get("Title"))
                    if isinstance(tt, bytes):
                        title = (
                            tt[2:].decode("utf-16-be", "replace")
                            if tt[:2] == b"\xfe\xff"
                            else tt.decode("latin-1")
                        )
            return [
                {
                    "doc_format": "pdf", "unit_no": i,
                    "n_units": len(pages), "title": title,
                    "text": _extract_page_text(doc, p), "refusal": None,
                }
                for i, p in enumerate(pages)
            ]
        except (ValueError, NotImplementedError) as e:
            return [{
                "doc_format": "pdf", "unit_no": None, "n_units": None,
                "title": None, "text": None,
                "refusal": _pdf_refusal_code(e),
            }]
    if mime == _DOCX_MIME:
        try:
            text, title, n_p = docx_text(payload)
            return [{
                "doc_format": "docx", "unit_no": 0, "n_units": n_p,
                "title": title, "text": text, "refusal": None,
            }]
        except (ValueError, NotImplementedError) as e:
            return [{
                "doc_format": "docx", "unit_no": None, "n_units": None,
                "title": None, "text": None, "refusal": _docx_code(e),
            }]
    if mime == "text/html":
        html = _decode_text_bytes(bytes(payload))
        blocks = _parse_blocks(html)
        title = _parse_meta(html)[0]
        return [{
            "doc_format": "html", "unit_no": 0, "n_units": len(blocks),
            "title": title, "text": "\n".join(b[0] for b in blocks),
            "refusal": None,
        }]
    if mime == "text/plain":
        return [{
            "doc_format": "text", "unit_no": 0, "n_units": 1,
            "title": None, "text": _decode_text_bytes(bytes(payload)),
            "refusal": None,
        }]
    return [{
        "doc_format": mime or "unknown", "unit_no": None, "n_units": None,
        "title": None, "text": None, "refusal": "unsupported_mime",
    }]


def extract_documents(
    df: DataFrame, media_col: str = "media",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Route every media row to its format's extractor (module
    docstring). One Arrow pass, map-only."""
    from .similarity import ensure_parallelism

    df = ensure_parallelism(df)  # heavy per-row parse: see pdf_extract
    keep = keep_cols if keep_cols is not None else [
        f.name for f in df.schema.fields if f.name != media_col
    ]
    out_schema = T.StructType([df.schema[c] for c in keep] + _OUT_FIELDS)

    def run(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                base = {c: row[c] for c in keep}
                m = row[media_col]
                if m is None or m.get("payload") is None:
                    out = [{
                        "doc_format": "unknown", "unit_no": None,
                        "n_units": None, "title": None, "text": None,
                        "refusal": "null_payload",
                    }]
                else:
                    out = _extract_one(m.get("mime"), bytes(m["payload"]))
                for o in out:
                    r = dict(base)
                    r.update(o)
                    rows.append(r)
            yield pd.DataFrame(
                rows, columns=[*keep, *[f.name for f in _OUT_FIELDS]]
            )

    return df.mapInPandas(run, out_schema)


def synth_document_media(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """A mixed-format corpus cycling key % 5 — every leg's normalized
    row is a closed form of (key, text):

    0. PDF, one Identity-H page ["d <key>", text];
    1. DOCX, paragraphs ["d <key>", text] with title "T<key % 7>";
    2. HTML, the synth_html page (html_extract's closed form + title
       'T');
    3. plain text: "plain <key>\\n" + text;
    4. an unsupported mime (application/zstd) → unsupported_mime.
    """
    from .docx import docx_encode
    from .html import synth_html  # noqa: F401 — JVM twin, kept for parity
    from .pdf import pdf_encode
    from .warc import synth_page_bytes

    media_schema = T.StructType(
        [
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("mime", T.StringType(), True),
        ]
    )
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("media", media_schema, True)]
    )

    def run(batches):
        def one(row):
            key = int(row[key_col])
            text = row[text_col] if row[text_col] is not None else ""
            leg = key % 5
            if leg == 0:
                return (
                    pdf_encode([[f"d {key}", text]], unicode_font=True),
                    "application/pdf",
                )
            if leg == 1:
                return (
                    docx_encode([f"d {key}", text], title=f"T{key % 7}"),
                    _DOCX_MIME,
                )
            if leg == 2:
                return synth_page_bytes(key, text), "text/html"
            if leg == 3:
                return (f"plain {key}\n" + text).encode("utf-8"), "text/plain"
            return b"\x28\xb5\x2f\xfd", "application/zstd"

        for pdf in batches:
            med = [one(row) for _, row in pdf.iterrows()]
            yield pdf.assign(
                media=[{"payload": p, "mime": m} for p, m in med]
            )

    from .similarity import ensure_parallelism

    # fan out BELOW the per-row Python pass (r15 opt): a 1-split
    # local input would serialize it on one task; no-op at scale
    return ensure_parallelism(df).mapInPandas(run, out_schema)
