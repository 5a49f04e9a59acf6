r"""RSS 2.0 / Atom feed parsing — the third crawl-discovery surface.

Alongside robots.txt (permission) and sitemaps (inventory), feeds are
how sites announce NEW content; a freshness-aware crawl schedules from
them. Original implementation from the public RSS 2.0 spec and RFC
4287 (Atom):

- RSS: one row per ``<item>`` — ``title``, ``link``, ``pubDate``,
  ``guid``; channel title carried per row as ``feed_title``;
- Atom: one row per ``<entry>`` — ``title``, the ``<link href>``
  (first ``rel="alternate"`` or unqualified link), ``updated`` /
  ``published`` (updated preferred, the RFC's required element),
  ``id``;
- entity decoding on text fields; CDATA sections unwrap; namespace
  prefixes tolerated (regex scan over the element subset — feed XML
  is machine-generated);
- bomb guards: 50 MB payload / 50 000 entries refuse;
- refusals are stable reason codes, per-row isolated through
  :func:`feed_entries` (the WARC lesson).

Map-only Arrow pass, no shuffle; compose with ``url_normalize`` /
``domain_rollup`` exactly like sitemap entries.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_MAX_BYTES = 50 * (1 << 20)
_MAX_ENTRIES = 50_000

_ENTITIES = [
    ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&apos;", "'"),
]


def _unescape(s: str) -> str:
    for k, v in _ENTITIES:
        s = s.replace(k, v)
    return s


_CDATA_RE = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)


def _text_of(block: str, tag: str) -> str | None:
    m = re.search(
        rf"<(?:\w+:)?{tag}(?:\s[^>]*)?>(.*?)</(?:\w+:)?{tag}\s*>",
        block,
        re.S | re.I,
    )
    if not m:
        return None
    v = m.group(1).strip()
    cm = _CDATA_RE.match(v)
    if cm:
        return cm.group(1)
    return _unescape(v)


def _atom_link(block: str) -> str | None:
    """First rel="alternate" (or rel-less) <link href=...>. Accepts
    both attribute quote styles — single-quoted href/rel is valid XML
    (r13 ADVICE)."""
    best = None
    for m in re.finditer(r"<(?:\w+:)?link\s([^>]*?)/?>", block, re.S | re.I):
        attrs = {
            k: v[1:-1]
            for k, v in re.findall(
                r"(\w+)\s*=\s*(\"[^\"]*\"|'[^']*')", m.group(1)
            )
        }
        rel = attrs.get("rel", "alternate").lower()
        href = attrs.get("href")
        if href and rel == "alternate":
            return _unescape(href)
        if href and best is None:
            best = _unescape(href)
    return best


def parse_feed(payload: bytes) -> list[dict]:
    """Feed bytes → entry dicts (feed_kind, feed_title, title, link,
    published, entry_id)."""
    b = bytes(payload)
    if len(b) > _MAX_BYTES:
        raise ValueError("feed exceeds the 50 MB bound")
    try:
        text = b.decode("utf-8")
    except UnicodeDecodeError:
        try:
            text = b.decode("latin-1")
        except Exception:  # pragma: no cover - latin-1 is total
            raise ValueError("feed bad_encoding") from None
    is_rss = re.search(r"<(?:\w+:)?rss[\s>]", text, re.I) is not None or (
        re.search(r"<(?:\w+:)?channel[\s>]", text, re.I) is not None
    )
    is_atom = re.search(r"<(?:\w+:)?feed[\s>]", text, re.I) is not None
    if not (is_rss or is_atom):
        raise ValueError("not a feed payload (no rss/channel/feed root)")
    entries: list[dict] = []
    if is_rss:
        feed_title = None
        ch = re.search(
            r"<(?:\w+:)?channel(?:\s[^>]*)?>(.*)</(?:\w+:)?channel\s*>",
            text,
            re.S | re.I,
        )
        body = ch.group(1) if ch else text
        head = re.split(r"<(?:\w+:)?item[\s>]", body, maxsplit=1,
                        flags=re.I)[0]
        feed_title = _text_of(head, "title")
        for m in re.finditer(
            r"<(?:\w+:)?item(?:\s[^>]*)?>(.*?)</(?:\w+:)?item\s*>",
            body,
            re.S | re.I,
        ):
            blk = m.group(1)
            entries.append(
                {
                    "feed_kind": "rss",
                    "feed_title": feed_title,
                    "title": _text_of(blk, "title"),
                    "link": _text_of(blk, "link"),
                    "published": _text_of(blk, "pubDate"),
                    "entry_id": _text_of(blk, "guid"),
                }
            )
            if len(entries) > _MAX_ENTRIES:
                raise ValueError("feed exceeds the 50000-entry bound")
        return entries
    head = re.split(r"<(?:\w+:)?entry[\s>]", text, maxsplit=1, flags=re.I)[0]
    feed_title = _text_of(head, "title")
    for m in re.finditer(
        r"<(?:\w+:)?entry(?:\s[^>]*)?>(.*?)</(?:\w+:)?entry\s*>",
        text,
        re.S | re.I,
    ):
        blk = m.group(1)
        entries.append(
            {
                "feed_kind": "atom",
                "feed_title": feed_title,
                "title": _text_of(blk, "title"),
                "link": _atom_link(blk),
                "published": _text_of(blk, "updated")
                or _text_of(blk, "published"),
                "entry_id": _text_of(blk, "id"),
            }
        )
        if len(entries) > _MAX_ENTRIES:
            raise ValueError("feed exceeds the 50000-entry bound")
    return entries


_ENTRY_FIELDS = [
    T.StructField("feed_kind", T.StringType(), True),
    T.StructField("feed_title", T.StringType(), True),
    T.StructField("title", T.StringType(), True),
    T.StructField("link", T.StringType(), True),
    T.StructField("published", T.StringType(), True),
    T.StructField("entry_id", T.StringType(), True),
    T.StructField("refusal", T.StringType(), True),
]

_REFUSAL_CODES = [
    ("50 MB", "too_large"),
    ("50000-entry", "too_many_entries"),
    ("bad_encoding", "bad_encoding"),
    ("rss/channel/feed", "not_a_feed"),
]


def _refusal_code(e: BaseException) -> str:
    s = str(e)
    for k, c in _REFUSAL_CODES:
        if k in s:
            return c
    return "corrupt_feed"


def feed_entries(
    df: DataFrame, payload_col: str = "payload",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Explode feed payload bytes into one row per entry; a refusing
    payload emits ONE reason-coded row. Map-only Arrow pass."""
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
                    got = parse_feed(row[payload_col])
                except (ValueError, NotImplementedError) as e:
                    r = dict(base)
                    r.update(
                        feed_kind=None, feed_title=None, title=None,
                        link=None, published=None, entry_id=None,
                        refusal=_refusal_code(e),
                    )
                    rows.append(r)
                    continue
                for ent in got:
                    r = dict(base)
                    r.update(ent)
                    r["refusal"] = None
                    rows.append(r)
            yield pd.DataFrame(
                rows, columns=[*keep, *[f.name for f in _ENTRY_FIELDS]]
            )

    return df.mapInPandas(run, out_schema)


def synth_feed_media(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """One feed per row cycling key % 3 — every field a closed form:

    0. RSS channel "Feed <key>" with 2 items (title with an &amp;
       entity, link, pubDate, guid);
    1. Atom feed with 2 entries (CDATA title, rel=alternate link among
       a self link, updated, id);
    2. not a feed at all → refusal not_a_feed."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("payload", T.BinaryType(), True)]
    )

    def run(batches):
        def one(key: int) -> bytes:
            leg = key % 3
            if leg == 0:
                items = "".join(
                    f"<item><title>T &amp; {key}_{i}</title>"
                    f"<link>https://f.example/r/{key}/{i}</link>"
                    f"<pubDate>Mon, 0{1 + (key + i) % 9} Jan 2024 "
                    f"00:00:00 GMT</pubDate>"
                    f"<guid>g{key}_{i}</guid></item>"
                    for i in range(2)
                )
                return (
                    f'<?xml version="1.0"?><rss version="2.0"><channel>'
                    f"<title>Feed {key}</title>{items}</channel></rss>"
                ).encode()
            if leg == 1:
                entries = "".join(
                    f"<entry><title><![CDATA[A {key}_{i}]]></title>"
                    f'<link rel="self" href="https://f.example/self"/>'
                    f'<link rel="alternate" '
                    f'href="https://f.example/a/{key}/{i}"/>'
                    f"<updated>2024-02-0{1 + (key + i) % 9}</updated>"
                    f"<id>urn:{key}:{i}</id></entry>"
                    for i in range(2)
                )
                return (
                    '<feed xmlns="http://www.w3.org/2005/Atom">'
                    f"<title>AFeed {key}</title>{entries}</feed>"
                ).encode()
            return b"<html>not a feed</html>"

        for pdf in batches:
            yield pdf.assign(payload=pdf[key_col].map(one))

    from .similarity import ensure_parallelism

    # fan out BELOW the per-row Python pass (r15 opt): a 1-split
    # local input would serialize it on one task; no-op at scale
    return ensure_parallelism(df).mapInPandas(run, out_schema)
