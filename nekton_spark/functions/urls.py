r"""URL canonicalization for web-corpus curation (SURVEY §2.5 ext).

Before any content dedup, a crawl pipeline dedups and quota-samples by
URL — and raw crawl URLs are noisy: case-varying hosts, default ports,
fragments, tracking parameters, permuted query strings. These
operators give every URL one canonical spelling and one ownership key
(the registered domain / eTLD+1), the two columns domain quotas and
URL-level dedup key on.

All pure Catalyst expressions — regexp extraction + array ops, zero
Python, whole-stage codegen'd, map-only (no shuffle). The grouping
surfaces (:func:`domain_rollup`) shuffle only on the derived domain
key, whose cardinality is domains, not pages.

Normal form (documented contract, exactly replayable in SQL):

1. must match ``scheme://authority`` with a non-empty authority, else
   NULL (a curation filter key, not an error — plain strings, mailto:,
   data: URIs all map to NULL);
2. scheme and authority lowercase (userinfo, if any, is lowercased
   with the authority — crawl URLs carrying credentials are dropped by
   robots rules long before this stage);
3. fragment removed (never sent to the server);
4. default port stripped (``http…:80``, ``https…:443``);
5. tracking parameters removed: ``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``mc_eid``, ``igshid`` (the public click-id families);
6. surviving query parameters SORTED bytewise (``b=2&a=1`` and
   ``a=1&b=2`` become one page — the point of a dedup key); an emptied
   query drops its ``?``;
7. empty path becomes ``/``.

The registered domain uses an embedded multi-part-suffix table of the
common public-suffix entries (co.uk-class second-level registries).
A full publicsuffix.org snapshot is a drop-in replacement for the
literal set; the lookup shape (last-two-labels membership) is the same
one production eTLD+1 extractors use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)"
_VALID_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+"
# (?i) — tracking params are matched case-insensitively (UTM_Source=,
# FBCLID= are common in the wild); scheme/host are lowercased by the
# normal form but query params keep their case EXCEPT for this filter.
_TRACKING_RE = r"(?i)^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid)="

# common second-level public-suffix entries (publicsuffix.org-class
# data, abbreviated): host last-two-labels in this set → eTLD+1 is
# the last THREE labels
MULTI_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br",
    "com.mx", "com.ar", "com.co", "com.pe", "com.ve",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.tw", "com.hk", "com.sg", "com.my", "co.th", "co.id",
    "co.in", "net.in", "org.in", "co.kr", "or.kr",
    "co.za", "org.za", "co.il", "com.tr", "com.ua",
    "com.pl", "com.ru", "com.eg", "com.sa", "com.ng",
]


def url_normalize(col: Column) -> Column:
    """Canonical URL spelling per the module contract; NULL for
    anything that is not ``scheme://authority…``."""
    scheme = F.lower(F.regexp_extract(col, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(col, _AUTH_RE, 1))
    rest = F.regexp_extract(col, _REST_RE, 1)  # path[?query], no fragment
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(
            F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
        ).otherwise(F.lit("")),
    )
    return F.when(col.rlike(_VALID_RE), norm)


def registered_domain(col: Column) -> Column:
    """eTLD+1 from a URL or bare host: strip scheme/userinfo/port,
    lowercase, then the last two labels — or three when the last two
    are a second-level public suffix (co.uk class). Single-label hosts
    (localhost, intranet names) return themselves; NULL stays NULL."""
    host = F.when(
        col.contains("://"),
        F.regexp_extract(col, r"://(?:[^/?#@]*@)?([^/?#:]*)", 1),
    ).otherwise(F.regexp_extract(col, r"^(?:[^@/]*@)?([^:/]*)", 1))
    host = F.lower(host)
    labels = F.split(host, r"\.")
    k = F.size(labels)
    last2 = F.concat(
        F.element_at(labels, -2), F.lit("."), F.element_at(labels, -1)
    )
    etld1 = (
        F.when((k >= 3) & F.element_at(labels, -2).isNotNull()
               & last2.isin(MULTI_SUFFIXES),
               F.concat(F.element_at(labels, -3), F.lit("."), last2))
        .when(k >= 2, last2)
        .otherwise(host)
    )
    return F.when(host != "", etld1)


def with_url_keys(
    df: DataFrame, url_col: str = "url",
    norm_col: str = "norm_url", domain_col: str = "domain",
) -> DataFrame:
    """Attach both keys: the canonical URL (page-level dedup key) and
    the registered domain (quota/rollup key)."""
    d = df.withColumn(norm_col, url_normalize(F.col(url_col)))
    return d.withColumn(domain_col, registered_domain(F.col(norm_col)))


def domain_rollup(
    df: DataFrame, url_col: str = "url",
) -> DataFrame:
    """Per-registered-domain crawl inventory: total URLs and distinct
    canonical pages. One shuffle on the domain key (partial-aggregated
    map-side); the standard input to domain quotas and per-domain
    caps.

    The derived keys are pinned behind an ``explode(array(struct))``
    Generate barrier before the aggregate: CollapseProject would
    otherwise re-inline the full normalization regexp chain into
    ``registered_domain`` AND into ``countDistinct``'s Expand +
    partial/final agg phases — measured as ~22 s of driver-side
    codegen/compile and MiB-scale task binaries for a 3-row result
    (constant cost, but pure waste). A Generate's output attribute
    cannot be collapsed into, so the chain compiles and evaluates
    exactly once per row while the plan stays one narrow stage +
    one partial-aggregated shuffle. Two chained barriers: the first
    pins ``norm_url`` (so ``registered_domain`` consumes the pinned
    attribute, not a re-inlined copy of the chain), the second pins
    ``domain`` (so the aggregate's Expand consumes an attribute).
    ``explode(array(x))`` on a scalar is 1:1 even for NULL x
    (``array(NULL)`` is a one-element array), so row counts are
    preserved."""
    s1 = df.select(
        F.explode(F.array(url_normalize(F.col(url_col)))).alias("norm_url")
    )
    pinned = s1.select(
        "norm_url",
        F.explode(
            F.array(registered_domain(F.col("norm_url")))
        ).alias("domain"),
    )
    return (
        pinned.filter(F.col("domain").isNotNull())
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("norm_url").alias("n_pages"),
        )
    )


def domain_quota(
    df: DataFrame,
    url_col: str = "url",
    max_per_domain: int = 1000,
    priority_col: str | None = None,
) -> DataFrame:
    """Cap pages per registered domain — the balancing step between
    URL canonicalization and content dedup (a handful of mega-domains
    otherwise dominate a crawl corpus). Keeps at most
    ``max_per_domain`` rows per eTLD+1: rank by ``priority_col``
    descending when given (quality-first), else by
    ``xxhash64(norm_url)`` (deterministic uniform sample of the
    domain's pages — re-runs keep the SAME pages). Ties on the sort
    key break by ``norm_url`` so the cut is total and reproducible.

    Plan: derive keys (Generate-barriered like :func:`domain_rollup`),
    ONE shuffle on the domain key, per-partition rank window — no
    global sort, no driver state; NULL-domain rows (unparseable URLs)
    are dropped, the same contract as the rollup."""
    from pyspark.sql import Window

    if max_per_domain < 1:
        raise ValueError(f"max_per_domain must be >= 1, got {max_per_domain}")

    # Collision-proof temp names (r13 ADVICE): an input that already
    # carries a column named _nu/_dom/_rk must pass through untouched.
    def _fresh(base: str) -> str:
        name, i = base, 0
        while name in df.columns:
            i += 1
            name = f"{base}_{i}"
        return name

    c_nu, c_dom, c_rk = _fresh("_nu"), _fresh("_dom"), _fresh("_rk")
    s1 = df.withColumn(
        c_nu, F.explode(F.array(url_normalize(F.col(url_col))))
    )
    keyed = s1.withColumn(
        c_dom, F.explode(F.array(registered_domain(F.col(c_nu))))
    ).filter(F.col(c_dom).isNotNull())
    if priority_col is not None:
        order = [F.col(priority_col).desc(), F.col(c_nu).asc()]
    else:
        order = [F.xxhash64(c_nu).asc(), F.col(c_nu).asc()]
    w = Window.partitionBy(c_dom).orderBy(*order)
    return (
        keyed.withColumn(c_rk, F.row_number().over(w))
        .filter(F.col(c_rk) <= max_per_domain)
        .drop(c_nu, c_dom, c_rk)
    )


def synth_urls(
    df: DataFrame, key_col: str = "doc_id", out_col: str = "url"
) -> DataFrame:
    """Deterministic raw-crawl URL per row (driver-row / test synth,
    JVM-side): case-varying host (three domains, one under a co.uk
    public suffix), explicit default port, tracking + permutable query
    params, fragment — every rule of the normal form fires. Closed-
    form invertible, so the oracle constructs the canonical result
    directly."""
    key = F.col(key_col)
    scheme = F.when(key % 2 == 0, F.lit("http")).otherwise(F.lit("https"))
    host = (
        F.when(key % 3 == 0, F.lit("Example.COM"))
        .when(key % 3 == 1, F.lit("shop.Example.co.uk"))
        .otherwise(F.lit("cdn.mirror.example.org"))
    )
    port = F.when(key % 2 == 0, F.lit(":80")).otherwise(F.lit(":443"))
    url = F.concat(
        scheme, F.lit("://"), host, port,
        F.lit("/item/"), (key % 7).cast("string"),
        F.lit("?utm_source=feed&b="), (key % 5).cast("string"),
        F.lit("&a=1#frag"),
    )
    return df.withColumn(out_col, url)
