r"""HTML → text extraction for web-corpus curation (SURVEY §2.5 ext).

A 100 TB LLM training corpus starts life as crawled HTML (the Common
Crawl / WARC shape); the first pipeline stage is markup removal plus
boilerplate-aware main-text selection. The reference has no HTML
surface at all — this module is part of the LLM-data extension layer,
built from the public HTML5 text-extraction conventions:

- tags whose CONTENT is never text: ``script style noscript template``
  (plus comments, processing instructions, doctype);
- block-level elements delimit text blocks (one output line per
  non-empty block), inline elements flow within a block;
- character/entity references decode once (``&amp;#38;`` is the
  literal ``&#38;``, not ``&``);
- whitespace collapses within a block (runs → one space, ends trimmed),
  the HTML rendering convention outside ``pre`` — applied uniformly
  (``pre`` too; a curation pipeline wants stable normal forms, not
  typography).

Boilerplate handling is the jusText/Arc90-style block heuristic
(Pomikálek 2011, public): score every block by LINK DENSITY (chars
contributed from inside ``<a>`` / block chars) and length; navigation,
footers and link farms are short and link-dense, body prose is long
and link-sparse. :func:`html_main_text` keeps blocks under a link-
density ceiling and over a length floor — deliberately two thresholds,
not a trained model, so the keep/drop decision is exactly replayable
by the SQL oracle.

Execution shape: ONE Arrow-batched pandas UDF per call (the parse is
the stdlib ``html.parser`` state machine — there is no JVM HTML parser
in Spark, and the per-row work is the lex itself, so this is the
honest Pandas-UDF case). Map-only, zero shuffles, linear in corpus
bytes; at cluster scale it parallelizes embarrassingly like the codec
family. NULL html follows the engine-wide NULL-text contract: treated
as the empty document (empty text, zero blocks).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# content of these never reaches the text layer
_DROP_CONTENT = {"script", "style", "noscript", "template"}

# HTML block-level elements (text-block delimiters). <br> and <hr> are
# void separators handled alongside. title is included: it is the one
# head element carrying real text.
_BLOCK = {
    "address", "article", "aside", "blockquote", "body", "caption",
    "dd", "details", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hgroup", "html", "legend", "li", "main", "nav", "ol",
    "option", "p", "pre", "section", "select", "summary", "table",
    "tbody", "td", "tfoot", "th", "thead", "title", "tr", "ul",
}

_BLOCK_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("text", T.StringType()),
            T.StructField("n_chars", T.IntegerType()),
            T.StructField("link_chars", T.IntegerType()),
        ]
    )
)


def _parse_blocks(html: str) -> list[tuple[str, int, int]]:
    """Parse one document into ``(text, n_chars, link_chars)`` blocks.

    Single pass over the byte stream via the stdlib tolerant parser
    (never raises on real-world tag soup); whitespace-collapsed block
    text, empty blocks dropped.
    """
    from html.parser import HTMLParser

    blocks: list[tuple[str, int, int]] = []

    class _X(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.parts: list[str] = []
            self.link_parts: list[str] = []
            self.drop = 0  # depth inside script/style/...
            self.a_depth = 0

        def _flush(self) -> None:
            raw = "".join(self.parts)
            text = " ".join(raw.split())
            if text:
                link_raw = "".join(self.link_parts)
                link = " ".join(link_raw.split())
                blocks.append((text, len(text), len(link)))
            self.parts = []
            self.link_parts = []

        def handle_starttag(self, tag: str, attrs) -> None:
            if tag in _DROP_CONTENT:
                self.drop += 1
            elif tag in _BLOCK or tag in ("br", "hr"):
                self._flush()
            elif tag == "a":
                self.a_depth += 1

        def handle_endtag(self, tag: str) -> None:
            if tag in _DROP_CONTENT:
                self.drop = max(0, self.drop - 1)
            elif tag in _BLOCK:
                self._flush()
            elif tag == "a":
                self.a_depth = max(0, self.a_depth - 1)

        # void elements arrive here when written XHTML-style (<br/>)
        def handle_startendtag(self, tag: str, attrs) -> None:
            self.handle_starttag(tag, attrs)
            if tag in _DROP_CONTENT:
                self.drop = max(0, self.drop - 1)
            elif tag == "a":
                self.a_depth = max(0, self.a_depth - 1)

        def handle_data(self, data: str) -> None:
            if self.drop:
                return
            self.parts.append(data)
            if self.a_depth:
                self.link_parts.append(data)

    p = _X()
    p.feed(html)
    p.close()
    p._flush()
    return blocks


def _blocks_udf() -> Column:
    @F.pandas_udf(_BLOCK_SCHEMA)
    def _blocks(s: pd.Series) -> pd.Series:
        return s.map(lambda h: _parse_blocks(h) if h else [])

    return _blocks


def html_blocks(
    df: DataFrame, html_col: str = "html", out_col: str = "blocks"
) -> DataFrame:
    """Low-level surface: one array-of-structs column
    ``(text, n_chars, link_chars)`` per document — the shared substrate
    both extraction modes select from. One Python crossing; everything
    downstream is codegen over the array."""
    from .similarity import ensure_parallelism

    # fan out below the parse (r15 opt): 1-split input would run the
    # Arrow state-machine parser on one task; no-op at scale/streaming
    df = ensure_parallelism(df)
    return df.withColumn(out_col, _blocks_udf()(F.col(html_col)))


def html_extract(
    df: DataFrame, html_col: str = "html", text_col: str = "text"
) -> DataFrame:
    """Full text extraction: every non-empty block, one per line, plus
    the corpus-triage signals ``n_blocks``, ``text_chars``,
    ``link_chars`` and ``link_density`` (NULL on zero-text documents —
    0/0 is "no evidence", not "no links")."""
    d = html_blocks(df, html_col, "_blk")
    agg = F.aggregate(
        "_blk",
        F.struct(
            F.lit(0).cast("long").alias("tc"), F.lit(0).cast("long").alias("lc")
        ),
        lambda acc, b: F.struct(
            (acc.tc + b.n_chars).alias("tc"), (acc.lc + b.link_chars).alias("lc")
        ),
    )
    d = d.withColumn("_tot", agg)
    d = (
        d.withColumn(
            text_col, F.array_join(F.transform("_blk", lambda b: b.text), "\n")
        )
        .withColumn("n_blocks", F.size("_blk"))
        .withColumn("text_chars", F.col("_tot.tc"))
        .withColumn("link_chars", F.col("_tot.lc"))
        .withColumn(
            "link_density",
            F.when(
                F.col("text_chars") > 0,
                F.round(F.col("link_chars") / F.col("text_chars"), 6),
            ),
        )
    )
    return d.drop("_blk", "_tot")


def html_main_text(
    df: DataFrame,
    html_col: str = "html",
    text_col: str = "main_text",
    max_link_density: float = 0.5,
    min_block_chars: int = 2,
) -> DataFrame:
    """Boilerplate-aware main-text selection (jusText-lite): keep
    blocks with ``link_chars/n_chars <= max_link_density`` AND
    ``n_chars >= min_block_chars``; navigation/footer/link-farm blocks
    fail the first test, stray single glyphs the second. Returns the
    kept text plus ``n_kept``/``n_dropped`` so a corpus rollup can
    watch what fraction of crawl bytes the heuristic keeps."""
    if not 0.0 <= max_link_density <= 1.0:
        raise ValueError(
            f"max_link_density must be in [0,1], got {max_link_density}"
        )
    if min_block_chars < 1:
        raise ValueError(f"min_block_chars must be >= 1, got {min_block_chars}")
    d = html_blocks(df, html_col, "_blk")
    keep = F.filter(
        "_blk",
        lambda b: (b.link_chars <= b.n_chars * F.lit(max_link_density))
        & (b.n_chars >= F.lit(min_block_chars)),
    )
    d = d.withColumn("_keep", keep)
    d = (
        d.withColumn(
            text_col, F.array_join(F.transform("_keep", lambda b: b.text), "\n")
        )
        .withColumn("n_kept", F.size("_keep"))
        .withColumn("n_dropped", F.size("_blk") - F.size("_keep"))
    )
    return d.drop("_blk", "_keep")


def synth_html(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id",
    out_col: str = "html",
) -> DataFrame:
    """Deterministic HTML page around each document (driver-row /
    test fixture synth, JVM-side): head with title + script + style
    that must vanish, an ``<h1>`` carrying an entity, the document
    text entity-escaped inside ``<p>`` (the extractor must decode it
    back), a link-only nav div (the boilerplate target), a comment.
    Closed-form invertible, so the DuckDB oracle reconstructs the
    expected extraction directly from the raw columns."""
    esc = F.col(text_col)
    for a, b in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(a), F.lit(b))
    esc = F.coalesce(esc, F.lit(""))
    html = F.concat(
        F.lit(
            "<html><head><title>T</title><script>var x = '<p>no</p>';"
            "</script><style>p { color: red }</style></head><body>"
        ),
        F.lit("<h1>Doc &amp; "),
        F.col(key_col).cast("string"),
        F.lit("</h1><p>"),
        esc,
        F.lit(
            '</p><div><a href="/">Home</a> <a href="/n">Next &gt;</a>'
            "</div><!-- footer --></body></html>"
        ),
    )
    return df.withColumn(out_col, html)


# ------------------------------------------------------------ JSON-LD


def _parse_jsonld(html: str) -> tuple[list[dict], int]:
    """``<script type="application/ld+json">`` blocks → (parsed JSON
    objects, n_bad). Tag scan via the tolerant stdlib parser (type
    attribute matched case-insensitively); blocks that fail
    ``json.loads`` count in ``n_bad`` instead of failing the page.
    A top-level JSON array contributes each object; ``@graph`` nodes
    flatten one level (the common publisher layout)."""
    import json
    from html.parser import HTMLParser

    raw_blocks: list[str] = []

    class _J(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=False)
            self.in_ld = False
            self.buf: list[str] = []

        def handle_starttag(self, tag: str, attrs) -> None:
            if tag == "script":
                t = next((v for k, v in attrs if k == "type"), "")
                self.in_ld = (t or "").strip().lower() == "application/ld+json"
                self.buf = []

        def handle_endtag(self, tag: str) -> None:
            if tag == "script" and self.in_ld:
                raw_blocks.append("".join(self.buf))
                self.in_ld = False

        def handle_data(self, data: str) -> None:
            if self.in_ld:
                self.buf.append(data)

    p = _J()
    p.feed(html)
    p.close()
    objs: list[dict] = []
    n_bad = 0
    for raw in raw_blocks:
        try:
            v = json.loads(raw)
        except (ValueError, RecursionError):
            n_bad += 1
            continue
        items = v if isinstance(v, list) else [v]
        for it in items:
            if isinstance(it, dict):
                graph = it.get("@graph")
                if isinstance(graph, list):
                    objs.extend(g for g in graph if isinstance(g, dict))
                else:
                    objs.append(it)
    return objs, n_bad


def _jsonld_str(v) -> str | None:
    """Normalize a JSON-LD value to one string: strings pass, dicts
    take 'name' then '@id' then 'url' (the schema.org conventions),
    lists take their first normalizable element."""
    if isinstance(v, str):
        return v
    if isinstance(v, dict):
        for k in ("name", "@id", "url"):
            if isinstance(v.get(k), str):
                return v[k]
        return None
    if isinstance(v, list):
        for x in v:
            s = _jsonld_str(x)
            if s is not None:
                return s
    return None


def html_jsonld(
    df: DataFrame, html_col: str = "html"
) -> DataFrame:
    """Provenance/compliance metadata from embedded JSON-LD (r13): the
    schema.org signals a compliant training corpus keeps per page —
    ``@type`` inventory, ``license`` (string or object normal form),
    ``datePublished``, ``author`` (name normal form), plus block
    counts (``n_ld_blocks`` parsed, ``n_ld_bad`` unparseable). First
    non-NULL value wins across a page's objects, document order.
    Map-only, one Arrow pass."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("ld_types", T.ArrayType(T.StringType()), True),
            T.StructField("license", T.StringType(), True),
            T.StructField("date_published", T.StringType(), True),
            T.StructField("author", T.StringType(), True),
            T.StructField("n_ld_blocks", T.IntegerType(), False),
            T.StructField("n_ld_bad", T.IntegerType(), False),
        ]
    )

    def run(batches):
        def one(h):
            if h is None:
                return [], None, None, None, 0, 0
            objs, n_bad = _parse_jsonld(h)
            types: list[str] = []
            lic = datep = author = None
            for o in objs:
                t = o.get("@type")
                for tv in t if isinstance(t, list) else [t]:
                    if isinstance(tv, str):
                        types.append(tv)
                if lic is None:
                    lic = _jsonld_str(o.get("license"))
                if datep is None:
                    v = o.get("datePublished")
                    datep = v if isinstance(v, str) else None
                if author is None:
                    author = _jsonld_str(o.get("author"))
            return types, lic, datep, author, len(objs), n_bad

        for pdf in batches:
            cols = [one(h) for h in pdf[html_col]]
            yield pdf.assign(
                ld_types=[c[0] for c in cols],
                license=[c[1] for c in cols],
                date_published=[c[2] for c in cols],
                author=[c[3] for c in cols],
                n_ld_blocks=[c[4] for c in cols],
                n_ld_bad=[c[5] for c in cols],
            )

    from .similarity import ensure_parallelism

    # fan out below the parse (r15 opt, see html_blocks)
    return ensure_parallelism(df).mapInPandas(run, out_schema)


def synth_html_jsonld(
    df: DataFrame, key_col: str = "doc_id", out_col: str = "html"
) -> DataFrame:
    """Page with one JSON-LD Article block — license URL cycling
    key % 3 (incl. a CC URL), datePublished and author closed-form;
    key % 4 == 0 adds a second block that is INVALID JSON (must count
    in n_ld_bad, not fail); key % 5 == 0 wraps the article in @graph."""
    key = F.col(key_col)
    lic = (
        F.when(key % 3 == 0,
               F.lit("https://creativecommons.org/licenses/by/4.0/"))
        .when(key % 3 == 1, F.lit("https://example.com/tos"))
        .otherwise(F.lit("https://rightsstatements.org/page/InC/1.0/"))
    )
    body = F.concat(
        F.lit('{"@context":"https://schema.org","@type":"Article",'
              '"license":"'),
        lic,
        F.lit('","datePublished":"2024-0'),
        (key % 9 + 1).cast("string"),
        F.lit('-01","author":{"@type":"Person","name":"A. '),
        (key % 11).cast("string"),
        F.lit('"}}'),
    )
    block = F.when(
        key % 5 == 0,
        F.concat(F.lit('{"@context":"https://schema.org","@graph":['),
                 body, F.lit("]}")),
    ).otherwise(body)
    bad = F.when(
        key % 4 == 0,
        F.lit('<script type="application/ld+json">{not json</script>'),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html><head><script type="application/ld+json">'),
        block,
        F.lit("</script>"),
        bad,
        F.lit("</head><body><p>x</p></body></html>"),
    )
    return df.withColumn(out_col, html)


# ----------------------------------------------------------- markdown

_MD_INLINE = {"b": "**", "strong": "**", "i": "*", "em": "*", "code": "`"}
_MD_HEADINGS = {f"h{i}": i for i in range(1, 7)}


def _parse_markdown(html: str) -> str:
    """One document → Markdown (the structure-preserving extraction —
    headings, lists, links, emphasis, code fences and blockquotes
    survive into the training text instead of flattening away).
    Documented deterministic contract, replayed by the driver row's
    oracle:

    - ``h1``–``h6`` → ``#``·n heading blocks; ``p``/``div``/other
      block tags → paragraph blocks; blocks join with a blank line;
    - ``ul``/``ol`` items → ``- `` / ``n. `` lines (2-space indent per
      nesting level), one block per list item;
    - ``blockquote`` content gets a ``> `` prefix;
    - ``pre`` emits a fenced code block with its text RAW (no
      whitespace collapse — the one exception);
    - inline: ``**bold**``, ``*italic*``, ``​`code`​``,
      ``[text](href)`` — inner whitespace of an inline element trims
      into the wrapper; block text whitespace-collapses as in
      :func:`html_extract`;
    - script/style/noscript/template content and comments vanish.
    """
    from html.parser import HTMLParser

    out_blocks: list[str] = []

    class _M(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.drop = 0
            self.pre = 0
            self.quote = 0
            self.lists: list[list[int]] = []  # [counter] per level; ul=-1
            self.prefix = ""
            # stack of (kind, href, parts) for open inline elements;
            # bottom entry is the block buffer
            self.stack: list[list] = [["block", None, []]]

        # -- block assembly
        def _emit(self, text: str) -> None:
            if text:
                out_blocks.append(text)

        def _flush(self) -> None:
            # collapse any inline elements left open at a block edge
            while len(self.stack) > 1:
                self._close_inline()
            parts = self.stack[0][2]
            self.stack[0][2] = []
            if self.pre:
                text = "".join(p for p in parts if p is not None)
            else:
                # None markers (from <br>) become markdown hard
                # breaks; each line collapses independently. An
                # out-of-band marker — no in-band sentinel a hostile
                # document could collide with.
                segs: list[list[str]] = [[]]
                for p in parts:
                    if p is None:
                        segs.append([])
                    else:
                        segs[-1].append(p)
                lines = [" ".join("".join(s).split()) for s in segs]
                text = "  \n".join(ln for ln in lines if ln)
            if not text:
                return
            if self.pre:
                self._emit("```\n" + text.strip("\n") + "\n```")
            else:
                pre = self.prefix
                if self.quote:
                    pre = "> " * self.quote + pre
                self._emit(pre + text)
            self.prefix = ""

        # -- inline assembly
        def _open_inline(self, kind: str, href: str | None = None) -> None:
            self.stack.append([kind, href, []])

        def _close_inline(self) -> None:
            kind, href, parts = self.stack.pop()
            inner = " ".join(
                "".join(p for p in parts if p is not None).split()
            )
            if kind == "a":
                wrapped = f"[{inner}]({href or ''})" if inner else ""
            else:
                mark = _MD_INLINE[kind]
                wrapped = f"{mark}{inner}{mark}" if inner else ""
            self.stack[-1][2].append(wrapped)

        # -- parser events
        def handle_starttag(self, tag: str, attrs) -> None:
            if tag in _DROP_CONTENT:
                self.drop += 1
                return
            if self.drop:
                return
            if tag in _MD_HEADINGS:
                self._flush()
                self.prefix = "#" * _MD_HEADINGS[tag] + " "
            elif tag == "pre":
                self._flush()
                self.pre += 1
            elif tag == "blockquote":
                self._flush()
                self.quote += 1
            elif tag in ("ul", "ol"):
                self._flush()
                self.lists.append([0 if tag == "ol" else -1])
            elif tag == "li":
                self._flush()
                depth = max(len(self.lists) - 1, 0)
                if self.lists and self.lists[-1][0] >= 0:
                    self.lists[-1][0] += 1
                    self.prefix = "  " * depth + f"{self.lists[-1][0]}. "
                else:
                    self.prefix = "  " * depth + "- "
            elif tag in _MD_INLINE:
                if not self.pre:
                    self._open_inline(tag)
            elif tag == "a":
                if not self.pre:
                    href = dict(attrs).get("href")
                    self._open_inline("a", href)
            elif tag == "br":
                self.stack[-1][2].append("\n" if self.pre else None)
            elif tag in _BLOCK or tag == "hr":
                self._flush()

        def handle_endtag(self, tag: str) -> None:
            if tag in _DROP_CONTENT:
                self.drop = max(0, self.drop - 1)
                return
            if self.drop:
                return
            # markdown-specific containers FIRST — several are also in
            # the generic _BLOCK set and must run their state pops
            if tag == "pre":
                self._flush()
                self.pre = max(0, self.pre - 1)
            elif tag == "blockquote":
                self._flush()
                self.quote = max(0, self.quote - 1)
            elif tag in ("ul", "ol"):
                self._flush()
                if self.lists:
                    self.lists.pop()
            elif tag in _MD_HEADINGS or tag == "li" or tag in _BLOCK:
                self._flush()
            elif tag in _MD_INLINE or tag == "a":
                if not self.pre and len(self.stack) > 1:
                    self._close_inline()

        def handle_startendtag(self, tag: str, attrs) -> None:
            if tag == "br":
                self.handle_starttag(tag, attrs)
            elif tag in _DROP_CONTENT:
                pass
            else:
                self.handle_starttag(tag, attrs)
                self.handle_endtag(tag)

        def handle_data(self, data: str) -> None:
            if not self.drop:
                self.stack[-1][2].append(data)

    p = _M()
    p.feed(html)
    p.close()
    p._flush()
    return "\n\n".join(out_blocks)


def html_to_markdown(
    df: DataFrame, html_col: str = "html", out_col: str = "markdown"
) -> DataFrame:
    """Structure-preserving extraction: HTML → Markdown per the
    :func:`_parse_markdown` contract. Flat text extraction
    (:func:`html_extract`) loses headings/lists/code — the structure a
    pretraining corpus increasingly keeps. One Arrow pass, map-only."""

    @F.pandas_udf(T.StringType())
    def _md(s: pd.Series) -> pd.Series:
        return pd.Series(
            [None if h is None else _parse_markdown(h) for h in s],
            dtype="object",
        )

    from .similarity import ensure_parallelism

    # fan out below the parse (r15 opt, see html_blocks)
    return ensure_parallelism(df).withColumn(out_col, _md(F.col(html_col)))


def synth_html_markdown(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id",
    out_col: str = "html",
) -> DataFrame:
    """Deterministic page exercising every Markdown rule — heading,
    paragraph with bold + link (document text rides the paragraph,
    entity-escaped), ordered and unordered list items, a raw
    ``<pre>`` fence, a blockquote — each a closed form of (key, text)
    for the driver row's oracle."""
    esc = F.col(text_col)
    for a, b in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(a), F.lit(b))
    esc = F.coalesce(esc, F.lit(""))
    key = F.col(key_col).cast("string")
    html = F.concat(
        F.lit("<html><head><script>no()</script></head><body><h2>Doc "),
        key,
        F.lit("</h2><p>"),
        esc,
        F.lit(" has <b>bold "),
        key,
        F.lit('</b> and <a href="/l/'),
        (F.col(key_col) % 7).cast("string"),
        F.lit('">a link</a></p><ul><li>item zero</li><li>item '),
        (F.col(key_col) % 5).cast("string"),
        F.lit("</li></ul><ol><li>first</li><li>second "),
        key,
        F.lit("</li></ol><pre>raw  "),
        key,
        F.lit("\ncode</pre><blockquote>quote "),
        key,
        F.lit("</blockquote></body></html>"),
    )
    return df.withColumn(out_col, html)


def _parse_meta(html: str) -> tuple:
    """One pass for page-level curation metadata: title text, the
    ``<html lang>`` attribute, the canonical link href, and the
    robots noindex/nofollow directives (``<meta name="robots">``,
    comma-separated token list per the robots-meta convention)."""
    from html.parser import HTMLParser

    state = {
        "title": None, "lang": None, "canonical": None,
        "noindex": 0, "nofollow": 0, "in_title": 0, "title_parts": [],
    }

    class _M(HTMLParser):
        def handle_starttag(self, tag, attrs):
            a = dict(attrs)
            if tag == "html" and state["lang"] is None:
                state["lang"] = a.get("lang")
            elif tag == "title" and state["title"] is None:
                state["in_title"] = 1
            elif tag == "meta":
                if (a.get("name") or "").lower() == "robots":
                    toks = [
                        t.strip().lower()
                        for t in (a.get("content") or "").split(",")
                    ]
                    if "noindex" in toks or "none" in toks:
                        state["noindex"] = 1
                    if "nofollow" in toks or "none" in toks:
                        state["nofollow"] = 1
            elif tag == "link":
                if (a.get("rel") or "").lower() == "canonical" and state[
                    "canonical"
                ] is None:
                    state["canonical"] = a.get("href")

        def handle_endtag(self, tag):
            if tag == "title" and state["in_title"]:
                state["in_title"] = 0
                if state["title"] is None:
                    t = " ".join("".join(state["title_parts"]).split())
                    state["title"] = t

        def handle_data(self, data):
            if state["in_title"]:
                state["title_parts"].append(data)

    p = _M()
    p.feed(html)
    p.close()
    return (
        state["title"], state["lang"], state["canonical"],
        state["noindex"], state["nofollow"],
    )


def html_meta(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Page-level metadata for crawl curation: ``title``, ``lang``
    (the <html lang> attribute — the page's own language claim, to
    cross-check against the trained lang-id), ``canonical`` (URL-level
    dedup prefers the canonical spelling the page declares), and the
    robots directives ``noindex``/``nofollow`` (a compliant training
    pipeline drops noindex pages). One Arrow pass, map-only."""
    schema = T.StructType(
        [
            T.StructField("title", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("canonical", T.StringType()),
            T.StructField("noindex", T.IntegerType()),
            T.StructField("nofollow", T.IntegerType()),
        ]
    )

    @F.pandas_udf(schema)
    def _meta(s: pd.Series) -> pd.DataFrame:
        rows = [_parse_meta(h) if h else (None, None, None, 0, 0) for h in s]
        return pd.DataFrame(
            rows, columns=["title", "lang", "canonical", "noindex", "nofollow"]
        )

    from .similarity import ensure_parallelism

    # fan out below the parse (r15 opt, see html_blocks)
    d = ensure_parallelism(df).withColumn("_m", _meta(F.col(html_col)))
    for c in ("title", "lang", "canonical", "noindex", "nofollow"):
        d = d.withColumn(c, F.col(f"_m.{c}"))
    return d.drop("_m")


def synth_html_meta(
    df: DataFrame, key_col: str = "doc_id", out_col: str = "html"
) -> DataFrame:
    """Deterministic page head for the html_meta driver row: lang
    cycles key%3, robots content cycles key%4 (absent / noindex /
    nofollow / 'noindex, nofollow'), canonical always present."""
    key = F.col(key_col)
    lang = (
        F.when(key % 3 == 0, F.lit("en"))
        .when(key % 3 == 1, F.lit("de-AT"))
        .otherwise(F.lit("ja"))
    )
    robots = (
        F.when(key % 4 == 1, F.lit('<meta name="robots" content="noindex">'))
        .when(key % 4 == 2, F.lit('<meta name="robots" content="nofollow">'))
        .when(key % 4 == 3,
              F.lit('<meta name="robots" content="noindex, nofollow">'))
        .otherwise(F.lit(""))
    )
    html = F.concat(
        F.lit('<html lang="'), lang, F.lit('"><head><title> Page '),
        key.cast("string"), F.lit(" </title>"), robots,
        F.lit('<link rel="canonical" href="https://e.com/c/'),
        (key % 9).cast("string"),
        F.lit('"></head><body><p>x</p></body></html>'),
    )
    return df.withColumn(out_col, html)
