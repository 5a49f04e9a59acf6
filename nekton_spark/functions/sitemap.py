r"""Sitemap protocol parsing (sitemaps.org, the robots.txt companion).

A compliant crawl pipeline discovers URLs through sitemaps — the
``Sitemap:`` directives in robots.txt point at XML url sets (or
indexes of further sitemaps), and the inventory they declare is the
site's OWN statement of what to crawl and when it changed. Original
implementation from the public sitemaps.org protocol:

- ``<urlset>`` documents: one row per ``<url>`` with ``loc``
  (required; entity-decoded), ``lastmod``, ``changefreq``,
  ``priority``;
- ``<sitemapindex>`` documents: one row per ``<sitemap>`` with
  ``loc``/``lastmod`` and ``kind='sitemap'`` so the caller recurses;
- plain-TEXT sitemaps (one URL per line) when the payload is not XML;
- gzip payloads (the ``.xml.gz`` convention) inflate bounded first;
- the parse is tag-tolerant (regex over the element subset, namespace
  prefixes ignored) — sitemap XML in the wild is machine-generated
  but prefix-happy;
- the protocol's 50 000-entry/50 MB limits are enforced as refusals
  (a "sitemap" past the limit is spam or a bomb).

Spark surface: :func:`sitemap_entries` explodes payload bytes into
entry rows in one Arrow pass (map-only, no shuffle); compose with
``url_normalize``/``domain_rollup`` for the crawl inventory, and
:func:`robots.parse_robots`-adjacent :func:`robots_sitemaps` to pull
the directive URLs out of robots.txt bodies.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_MAX_INFLATE = 50 * (1 << 20)  # the protocol's own 50 MB uncompressed cap
_MAX_ENTRIES = 50_000  # protocol cap per sitemap file

_ENTITIES = [
    ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&apos;", "'"),
]


def _unescape(s: str) -> str:
    for k, v in _ENTITIES:
        s = s.replace(k, v)
    return s


def _tag_text(block: str, tag: str) -> str | None:
    # optional attribute tail on the opening tag (r13 ADVICE: a <loc>
    # carrying any attribute is still a valid sitemap entry)
    m = re.search(
        rf"<(?:\w+:)?{tag}(?:\s[^>]*)?>\s*(.*?)\s*</(?:\w+:)?{tag}\s*>",
        block,
        re.S | re.I,
    )
    return _unescape(m.group(1)) if m else None


def robots_sitemaps(txt: str | None) -> list[str]:
    """``Sitemap:`` directive URLs from a robots.txt body (the
    protocol's discovery mechanism; directives are group-independent
    and case-insensitive)."""
    if not txt:
        return []
    out = []
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap" and val.strip():
            out.append(val.strip())
    return out


def parse_sitemap(payload: bytes) -> list[dict]:
    """Sitemap bytes (XML urlset / sitemapindex, gzip, or plain text)
    → entry dicts (kind, loc, lastmod, changefreq, priority)."""
    b = bytes(payload)
    if b[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            b = d.decompress(b, _MAX_INFLATE + 1)
        except zlib.error as e:
            raise ValueError(f"corrupt gzip sitemap: {e}") from None
        if len(b) > _MAX_INFLATE:
            raise ValueError("sitemap exceeds the protocol's 50 MB cap")
    if len(b) > _MAX_INFLATE:
        raise ValueError("sitemap exceeds the protocol's 50 MB cap")
    try:
        text = b.decode("utf-8")
    except UnicodeDecodeError:
        raise ValueError("sitemap is not UTF-8 (protocol requirement)") from None
    entries: list[dict] = []
    stripped = text.lstrip()
    is_xml = stripped.startswith("<")
    if not is_xml:
        # plain-text sitemap: one absolute URL per line
        for line in text.splitlines():
            u = line.strip()
            if not u:
                continue
            if "://" not in u:
                raise ValueError(
                    f"plain-text sitemap line is not an absolute URL: {u[:40]!r}"
                )
            entries.append(
                {"kind": "url", "loc": u, "lastmod": None,
                 "changefreq": None, "priority": None}
            )
            if len(entries) > _MAX_ENTRIES:
                raise ValueError(
                    "sitemap exceeds the protocol's 50000-entry cap"
                )
        return entries
    is_index = re.search(r"<(?:\w+:)?sitemapindex[\s>]", text, re.I) is not None
    is_urlset = re.search(r"<(?:\w+:)?urlset[\s>]", text, re.I) is not None
    if not (is_index or is_urlset):
        raise ValueError(
            "not a sitemap payload (no urlset/sitemapindex root)"
        )
    item_tag = "sitemap" if is_index else "url"
    kind = "sitemap" if is_index else "url"
    for m in re.finditer(
        rf"<(?:\w+:)?{item_tag}(?:\s[^>]*)?>(.*?)</(?:\w+:)?{item_tag}\s*>",
        text,
        re.S | re.I,
    ):
        block = m.group(1)
        loc = _tag_text(block, "loc")
        if loc is None or not loc.strip():
            raise ValueError("sitemap entry missing required <loc>")
        pr = _tag_text(block, "priority")
        entries.append(
            {
                "kind": kind,
                "loc": loc.strip(),
                "lastmod": _tag_text(block, "lastmod"),
                "changefreq": _tag_text(block, "changefreq"),
                "priority": float(pr) if pr is not None else None,
            }
        )
        if len(entries) > _MAX_ENTRIES:
            raise ValueError("sitemap exceeds the protocol's 50000-entry cap")
    return entries


_ENTRY_FIELDS = [
    T.StructField("kind", T.StringType(), True),
    T.StructField("loc", T.StringType(), True),
    T.StructField("lastmod", T.StringType(), True),
    T.StructField("changefreq", T.StringType(), True),
    T.StructField("priority", T.DoubleType(), True),
    # NULL for clean payloads; reason code when the payload refused
    # and the row was isolated (the WARC lesson)
    T.StructField("refusal", T.StringType(), True),
]

_REFUSAL_CODES = [
    ("gzip", "bad_gzip"),
    ("50 MB", "too_large"),
    ("50000-entry", "too_many_entries"),
    ("UTF-8", "bad_encoding"),
    ("absolute URL", "bad_text_line"),
    ("<loc>", "missing_loc"),
    ("urlset/sitemapindex", "not_a_sitemap"),
]


def _refusal_code(e: BaseException) -> str:
    s = str(e)
    for k, c in _REFUSAL_CODES:
        if k in s:
            return c
    return "corrupt_sitemap"


def sitemap_entries(
    df: DataFrame, payload_col: str = "payload",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Explode sitemap payload bytes into one row per entry; a
    refusing payload emits ONE reason-coded row instead of failing
    the task. Map-only Arrow pass, no shuffle."""
    from .similarity import ensure_parallelism

    df = ensure_parallelism(df)  # heavy per-row parse: see pdf_extract
    keep = keep_cols if keep_cols is not None else [
        f.name for f in df.schema.fields if f.name != payload_col
    ]
    out_schema = T.StructType([df.schema[c] for c in keep] + _ENTRY_FIELDS)

    def run(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                base = {c: row[c] for c in keep}
                try:
                    got = parse_sitemap(row[payload_col])
                except (ValueError, NotImplementedError) as e:
                    r = dict(base)
                    r.update(kind=None, loc=None, lastmod=None,
                             changefreq=None, priority=None,
                             refusal=_refusal_code(e))
                    rows.append(r)
                    continue
                for ent in got:
                    r = dict(base)
                    r.update(ent)
                    r["refusal"] = None
                    rows.append(r)
            yield pd.DataFrame(
                rows,
                columns=[*keep, *[f.name for f in _ENTRY_FIELDS]],
            )

    return df.mapInPandas(run, out_schema)


def synth_sitemap_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """One sitemap payload per row cycling the envelope by key % 4 —
    every entry field is a closed form of the key:

    0. XML urlset, 2 + key%2 urls (loc with an &amp; entity, lastmod,
       changefreq cycling, priority (key%10)/10);
    1. the same urlset GZIPPED;
    2. a sitemapindex with 2 child sitemaps;
    3. a plain-text sitemap with 2 urls."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("payload", T.BinaryType(), True)]
    )
    freqs = ["daily", "weekly", "monthly"]

    def run(batches):
        def one(key: int) -> bytes:
            leg = key % 4
            if leg in (0, 1):
                items = []
                for u in range(2 + key % 2):
                    items.append(
                        "<url><loc>https://s.example/p?a=1&amp;k="
                        f"{key}u{u}</loc>"
                        f"<lastmod>2024-0{1 + (key + u) % 9}-01</lastmod>"
                        f"<changefreq>{freqs[(key + u) % 3]}</changefreq>"
                        f"<priority>0.{key % 10}</priority></url>"
                    )
                xml = (
                    '<?xml version="1.0" encoding="UTF-8"?>'
                    '<urlset xmlns="http://www.sitemaps.org/schemas/'
                    'sitemap/0.9">' + "".join(items) + "</urlset>"
                ).encode()
                if leg == 1:
                    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
                    return co.compress(xml) + co.flush()
                return xml
            if leg == 2:
                items = "".join(
                    f"<sitemap><loc>https://s.example/sm{key}_{u}.xml</loc>"
                    f"<lastmod>2024-1{u}-05</lastmod></sitemap>"
                    for u in range(2)
                )
                return (
                    "<sitemapindex>" + items + "</sitemapindex>"
                ).encode()
            return (
                f"https://s.example/t/{key}/0\n"
                f"https://s.example/t/{key}/1\n"
            ).encode()

        for pdf in batches:
            yield pdf.assign(payload=pdf[key_col].map(one))

    from .similarity import ensure_parallelism

    # fan out BELOW the per-row Python pass (r15 opt): a 1-split
    # local input would serialize it on one task; no-op at scale
    return ensure_parallelism(df).mapInPandas(run, out_schema)
