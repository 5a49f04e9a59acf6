"""URL canonicalization (functions/urls.py): the normal-form rules
one by one, registered-domain extraction incl. the multi-part public
suffixes, NULL/garbage handling, and the rollup's plan shape. The
driver rows url_normalize_check / domain_rollup_urls carry the
closed-form oracle."""

from pyspark.sql import functions as F

from nekton_spark.functions.urls import (
    domain_rollup,
    registered_domain,
    synth_urls,
    url_normalize,
    with_url_keys,
)

CASES = [
    # raw, expected norm, expected domain
    ("HTTP://WWW.Example.COM:80/Path?b=2&a=1&utm_source=x#f",
     "http://www.example.com/Path?a=1&b=2", "example.com"),
    ("https://shop.Example.co.uk:443",
     "https://shop.example.co.uk/", "example.co.uk"),
    ("https://a.b.example.org:8443/x?fbclid=z",
     "https://a.b.example.org:8443/x", "example.org"),  # non-default port kept
    ("http://localhost/x", "http://localhost/x", "localhost"),
    ("not a url", None, None),
    ("mailto:x@y.com", None, None),
    (None, None, None),
    # :80 is only default for http — ftp keeps it
    ("ftp://Files.Example.com:80/a", "ftp://files.example.com:80/a",
     "example.com"),
    ("http://user@Host.COM/p", "http://user@host.com/p", "host.com"),
    ("http://example.com?only=1", "http://example.com/?only=1",
     "example.com"),
    # query emptied by tracking removal drops its '?'
    ("http://example.com/?utm_campaign=a&gclid=b", "http://example.com/",
     "example.com"),
    # param sort is bytewise; empty segments (a&&b) vanish
    ("http://e.com/p?z=1&&y=2", "http://e.com/p?y=2&z=1", "e.com"),
    # tracking params match case-insensitively (r12 ADVICE): scheme and
    # host are lowercased by the normal form but query-param NAMES keep
    # their case in the wild — UTM_Source= / FBCLID= must still vanish
    ("http://e.com/p?UTM_Source=x&a=1", "http://e.com/p?a=1", "e.com"),
    ("http://e.com/p?FBCLID=z&Utm_Medium=m", "http://e.com/p", "e.com"),
    # ...while non-tracking params keep their (significant) case
    ("http://e.com/p?Page=2", "http://e.com/p?Page=2", "e.com"),
]


class TestNormalForm:
    def test_cases(self, spark):
        df = spark.createDataFrame(
            [(i, c[0]) for i, c in enumerate(CASES)], "i long, url string"
        )
        got = {r.i: (r.norm_url, r.domain) for r in with_url_keys(df).collect()}
        for i, (raw, en, ed) in enumerate(CASES):
            assert got[i] == (en, ed), f"case {i}: {raw!r} -> {got[i]}"

    def test_idempotent(self, spark):
        """Normalizing a normalized URL is the identity — the property
        that makes it a dedup KEY."""
        df = spark.createDataFrame(
            [(i, c[0]) for i, c in enumerate(CASES) if c[1]],
            "i long, url string",
        )
        once = df.select("i", url_normalize(F.col("url")).alias("n1"))
        twice = once.select("i", "n1", url_normalize(F.col("n1")).alias("n2"))
        assert twice.filter(F.col("n1") != F.col("n2")).count() == 0

    def test_registered_domain_on_bare_hosts(self, spark):
        rows = [
            ("WWW.Example.CO.UK", "example.co.uk"),
            ("deep.sub.example.com", "example.com"),
            ("example.com.au", "example.com.au"),  # exactly suffix+1
            ("host", "host"),
            ("user@host.org:8080", "host.org"),
        ]
        df = spark.createDataFrame(rows, "h string, want string")
        got = df.select(
            registered_domain(F.col("h")).alias("d"), "want"
        ).collect()
        for r in got:
            assert r.d == r.want


class TestRollup:
    def test_rollup_counts(self, spark):
        d = spark.range(0, 30).select(F.col("id").alias("doc_id"))
        got = {r.domain: (r.n_urls, r.n_pages)
               for r in domain_rollup(synth_urls(d)).collect()}
        assert got == {
            "example.com": (10, 10),
            "example.co.uk": (10, 10),
            "example.org": (10, 10),
        }

    def test_keys_are_codegen_map_only(self, spark):
        d = spark.range(0, 10).select(F.col("id").alias("doc_id"))
        plan = (
            with_url_keys(synth_urls(d))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_processor_registry(self, spark):
        from nekton_spark.registry import PROCESSORS

        d = spark.range(0, 6).select(F.col("id").alias("doc_id"))
        urls = synth_urls(d)
        assert "norm_url" in PROCESSORS["url_keys"](urls).columns
        assert PROCESSORS["domain_rollup"](urls).count() == 3


class TestDomainQuota:
    def test_caps_and_determinism(self, spark):
        from nekton_spark.functions.urls import domain_quota, synth_urls

        d = synth_urls(
            spark.range(0, 90).selectExpr("id as doc_id")
        )
        out = domain_quota(d, max_per_domain=10)
        got = out.selectExpr("doc_id % 3 as dom").groupBy("dom").count()
        assert {r["count"] for r in got.collect()} == {10}
        # deterministic: same pages survive on a re-run
        a = sorted(r.doc_id for r in out.collect())
        b = sorted(r.doc_id for r in domain_quota(d, max_per_domain=10).collect())
        assert a == b

    def test_priority_first(self, spark):
        from pyspark.sql import functions as F

        from nekton_spark.functions.urls import domain_quota, synth_urls

        d = synth_urls(
            spark.range(0, 30).selectExpr("id as doc_id")
        ).withColumn("priority", F.col("doc_id"))
        out = domain_quota(d, max_per_domain=3, priority_col="priority")
        kept = sorted(r.doc_id for r in out.collect())
        # top-3 doc_ids per residue class of 3 domains
        expect = sorted(
            k for k in range(30)
            if k in sorted([x for x in range(30) if x % 3 == k % 3],
                           reverse=True)[:3]
        )
        assert kept == expect

    def test_null_domain_dropped_and_validation(self, spark):
        import pytest as _pt
        from pyspark.sql import functions as F

        from nekton_spark.functions.urls import domain_quota

        d = spark.createDataFrame(
            [(1, "not a url"), (2, "https://ok.example/x")],
            "doc_id long, url string",
        )
        assert [r.doc_id for r in domain_quota(d).collect()] == [2]
        with _pt.raises(ValueError, match="max_per_domain"):
            domain_quota(d, max_per_domain=0)

    def test_processor(self, spark):
        from nekton_spark.functions.urls import synth_urls
        from nekton_spark.registry import PROCESSORS

        d = synth_urls(spark.range(0, 12).selectExpr("id as doc_id"))
        assert PROCESSORS["domain_quota"](d, max_per_domain=2).count() == 6

    def test_temp_name_collision(self, spark):
        """User columns named _nu/_dom/_rk survive untouched — the
        window's temp columns must pick fresh names (r13 ADVICE)."""
        from nekton_spark.functions.urls import domain_quota

        d = spark.createDataFrame(
            [(1, "https://ok.example/x", "keep-nu", 7, "keep-rk")],
            "doc_id long, url string, _nu string, _dom long, _rk string",
        )
        out = domain_quota(d, max_per_domain=5)
        assert out.columns == ["doc_id", "url", "_nu", "_dom", "_rk"]
        row = out.collect()[0]
        assert (row._nu, row._dom, row._rk) == ("keep-nu", 7, "keep-rk")
