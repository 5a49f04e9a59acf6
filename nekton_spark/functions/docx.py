r"""DOCX text extraction (ECMA-376 WordprocessingML subset).

Office documents are the third big document family in curated corpora
(after HTML and PDF), and DOCX is structurally cheap to support: a ZIP
container (stdlib ``zipfile`` — the public battle-tested parser, same
rationale as ``tarfile`` for WebDataset) holding
``word/document.xml``. Original implementation from the public
ECMA-376 spec:

- one output paragraph per ``<w:p>``; text is the concatenation of
  the paragraph's ``<w:t>`` runs (entity-decoded; ``xml:space`` is
  irrelevant to extraction — run text is verbatim either way);
- ``<w:tab/>`` → TAB, ``<w:br/>`` / ``<w:cr/>`` → newline WITHIN the
  paragraph; paragraphs join with newlines;
- tables flatten row-major (their cells are ordinary ``<w:p>``
  paragraphs in document order — the ECMA-376 body order);
- document title from ``docProps/core.xml`` ``<dc:title>`` when
  present;
- refusals: not a ZIP (``bad_signature``), no ``word/document.xml``
  member (``not_docx``), member exceeding the inflate bound
  (``stream_bomb``), undecodable XML (``bad_encoding``) — all stable
  reason codes, per-row isolated through :func:`docx_extract` (the
  WARC lesson: one bad file never fails the task).

The parse is regex over the element subset — WordprocessingML is
machine-generated XML; a ``<w:t>``/``<w:p>`` scan is exact on it and
tolerant of the namespace-prefix noise real generators emit.

Execution shape: one Arrow pass, one row per document (map-only, no
shuffle); parallelizes by file through ``media_files`` like PDF/WARC.
"""

from __future__ import annotations

import io
import re
import zipfile

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_MAX_MEMBER = 1 << 30

_ENTITIES = [
    ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&apos;", "'"),
]


def _unescape(s: str) -> str:
    for k, v in _ENTITIES:
        s = s.replace(k, v)
    return s


def _read_member(zf: zipfile.ZipFile, name: str) -> bytes | None:
    try:
        info = zf.getinfo(name)
    except KeyError:
        return None
    if info.file_size > _MAX_MEMBER:
        raise ValueError(f"docx member {name} exceeds inflate bound")
    return zf.read(name)


_P_RE = re.compile(rb"<w:p[ >].*?</w:p>|<w:p/>", re.S)
_RUN_RE = re.compile(
    rb"<w:t(?:[ ][^>]*)?>(.*?)</w:t>|<w:tab/>|<w:br/>|<w:cr/>", re.S
)


def docx_text(payload: bytes) -> tuple[str, str | None, int]:
    """DOCX bytes → (text, title, n_paragraphs)."""
    b = bytes(payload)
    if b[:2] != b"PK":
        raise ValueError("not a DOCX payload (missing ZIP signature)")
    try:
        zf = zipfile.ZipFile(io.BytesIO(b))
    except zipfile.BadZipFile as e:
        raise ValueError(f"corrupt DOCX zip: {e}") from None
    doc = _read_member(zf, "word/document.xml")
    if doc is None:
        raise ValueError("ZIP without word/document.xml is not_docx")
    paragraphs: list[str] = []
    for pm in _P_RE.finditer(doc):
        parts: list[str] = []
        for rm in _RUN_RE.finditer(pm.group(0)):
            tok = rm.group(0)
            if tok.startswith(b"<w:tab"):
                parts.append("\t")
            elif tok.startswith((b"<w:br", b"<w:cr")):
                parts.append("\n")
            else:
                try:
                    parts.append(_unescape(rm.group(1).decode("utf-8")))
                except UnicodeDecodeError:
                    raise ValueError(
                        "docx run text bad_encoding (not UTF-8)"
                    ) from None
        paragraphs.append("".join(parts))
    title = None
    core = _read_member(zf, "docProps/core.xml")
    if core is not None:
        m = re.search(rb"<dc:title>(.*?)</dc:title>", core, re.S)
        if m:
            try:
                title = _unescape(m.group(1).decode("utf-8"))
            except UnicodeDecodeError:
                raise ValueError(
                    "docx title bad_encoding (not UTF-8)"
                ) from None
    return "\n".join(paragraphs), title, len(paragraphs)


_REFUSAL_CODES = [
    ("ZIP signature", "bad_signature"),
    ("not_docx", "not_docx"),
    ("inflate bound", "stream_bomb"),
    ("bad_encoding", "bad_encoding"),
    ("zip", "corrupt_zip"),
]


def _refusal_code(e: BaseException) -> str:
    s = str(e)
    for k, c in _REFUSAL_CODES:
        if k in s:
            return c
    return "corrupt_docx"


def docx_extract(
    df: DataFrame, payload_col: str = "payload",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """One row per document: (text, title, n_paragraphs, refusal) —
    refusing files isolate reason-coded. Map-only Arrow pass."""
    from .similarity import ensure_parallelism

    df = ensure_parallelism(df)  # heavy per-row parse: see pdf_extract
    keep = keep_cols if keep_cols is not None else [
        f.name for f in df.schema.fields if f.name != payload_col
    ]
    out_schema = T.StructType(
        [df.schema[c] for c in keep]
        + [
            T.StructField("text", T.StringType(), True),
            T.StructField("title", T.StringType(), True),
            T.StructField("n_paragraphs", T.IntegerType(), True),
            T.StructField("refusal", T.StringType(), True),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                base = {c: row[c] for c in keep}
                try:
                    text, title, n_p = docx_text(row[payload_col])
                    base.update(
                        text=text, title=title, n_paragraphs=n_p,
                        refusal=None,
                    )
                except (ValueError, NotImplementedError) as e:
                    base.update(
                        text=None, title=None, n_paragraphs=None,
                        refusal=_refusal_code(e),
                    )
                rows.append(base)
            yield pd.DataFrame(
                rows,
                columns=[*keep, "text", "title", "n_paragraphs", "refusal"],
            )

    return df.mapInPandas(run, out_schema)


# ------------------------------------------------------------ writer


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def docx_encode(
    paragraphs: list[str], title: str | None = None
) -> bytes:
    """A genuine minimal DOCX for fixtures: STORED zip members with
    zeroed timestamps (byte-deterministic), ``[Content_Types].xml``,
    ``word/document.xml`` with one ``<w:p>``/``<w:t>`` per paragraph
    (embedded TABs and newlines become ``<w:tab/>``/``<w:br/>``),
    optional ``docProps/core.xml`` title."""
    runs = []
    for p in paragraphs:
        parts = []
        for ch in p:
            if ch == "\t":
                parts.append("<w:tab/>")
            elif ch == "\n":
                parts.append("<w:br/>")
            else:
                parts.append(ch)
        # merge literal chars into runs between control elements
        body = []
        cur = []
        for tok in parts:
            if tok in ("<w:tab/>", "<w:br/>"):
                if cur:
                    body.append(
                        '<w:r><w:t xml:space="preserve">'
                        + _xml_escape("".join(cur)) + "</w:t></w:r>"
                    )
                    cur = []
                body.append(f"<w:r>{tok}</w:r>")
            else:
                cur.append(tok)
        if cur:
            body.append(
                '<w:r><w:t xml:space="preserve">'
                + _xml_escape("".join(cur)) + "</w:t></w:r>"
            )
        runs.append("<w:p>" + "".join(body) + "</w:p>")
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        + "".join(runs)
        + "</w:body></w:document>"
    )
    ct = (
        '<?xml version="1.0"?><Types xmlns="http://schemas.'
        'openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        "</Types>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        def add(name: str, data: str) -> None:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, data)

        add("[Content_Types].xml", ct)
        add("word/document.xml", document)
        if title is not None:
            add(
                "docProps/core.xml",
                '<?xml version="1.0"?><cp:coreProperties '
                'xmlns:cp="http://schemas.openxmlformats.org/package/'
                '2006/metadata/core-properties" xmlns:dc="http://purl.'
                'org/dc/elements/1.1/"><dc:title>'
                + _xml_escape(title)
                + "</dc:title></cp:coreProperties>",
            )
    return buf.getvalue()


def synth_docx_media(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """One DOCX per row: heading paragraph "Doc <key>", a paragraph
    carrying the raw document text (tabs/newlines round-trip through
    <w:tab/>/<w:br/>), a third paragraph "end <key % 9>"; title
    "T<key % 7>" on key % 3 == 0 — every field a closed form."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("docx", T.BinaryType(), True)]
    )

    def run(batches):
        def one(row) -> bytes:
            key = int(row[key_col])
            text = row[text_col] if row[text_col] is not None else ""
            return docx_encode(
                [f"Doc {key}", text, f"end {key % 9}"],
                title=f"T{key % 7}" if key % 3 == 0 else None,
            )

        for pdf in batches:
            yield pdf.assign(docx=pdf.apply(one, axis=1))

    from .similarity import ensure_parallelism

    # fan out BELOW the per-row Python pass (r15 opt): a 1-split
    # local input would serialize it on one task; no-op at scale
    return ensure_parallelism(df).mapInPandas(run, out_schema)
