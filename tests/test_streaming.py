"""Structured Streaming tests: file source → windowed/stateful ops →
memory sink, driven synchronously with processAllAvailable().

The reference's whole streaming model (one record in flight, ack after
sink — src/lib.rs:84-93) is subsumed by the micro-batch + offset-log
loop these tests exercise.
"""

import pandas as pd
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """Materialize sf0.001 events as a parquet dir readable by readStream."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    from nekton_spark.sources.files import table_source

    table_source(spark, "/root/testdata/sf0.001", "events").write.mode("overwrite").parquet(d)
    return d


def run_stream(df, name):
    q = df.writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    return df.sparkSession.sql(f"SELECT * FROM {name}")


def run_stream_update(df, name):
    q = df.writeStream.format("memory").queryName(name).outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    return df.sparkSession.sql(f"SELECT * FROM {name}")


def read_events_stream(spark, d):
    schema = spark.read.parquet(d).schema
    return spark.readStream.schema(schema).parquet(d)


class TestWindowedStreams:
    def test_tumbling_window_counts_match_batch(self, spark, events_stream_dir):
        from nekton_spark.streaming.windows import tumbling_window

        stream = read_events_stream(spark, events_stream_dir)
        agg = tumbling_window(
            stream, duration="5 minutes", group_by=["event_type"],
            aggs=["count(*) as n"], watermark="1 minute",
        )
        got = run_stream(agg, "tumbling_out").select("window", "event_type", "n")

        batch = spark.read.parquet(events_stream_dir)
        expected = batch.groupBy(F.window("ts", "5 minutes").alias("window"), "event_type").agg(
            F.count(F.lit(1)).alias("n")
        )
        # append mode only emits windows the watermark has closed: the
        # trailing open window (per event_type) is withheld — correct
        # streaming semantics, so allow up to one window per type
        n_types = batch.select("event_type").distinct().count()
        assert expected.count() - n_types <= got.count() <= expected.count()
        assert got.exceptAll(expected).count() == 0  # emitted rows are exact

    def test_session_window_batch_equivalence(self, spark, events_stream_dir):
        from nekton_spark.streaming.windows import session_window

        batch = spark.read.parquet(events_stream_dir)
        sess = session_window(batch, gap="30 minutes", group_by=["user_id"], aggs=["count(*) as n"])
        # one row per (user, session); total events preserved
        assert sess.agg(F.sum("n")).first()[0] == batch.count()

    def test_dedup_within_watermark_stream(self, spark, events_stream_dir):
        from nekton_spark.streaming.windows import dedup_within_watermark

        stream = read_events_stream(spark, events_stream_dir)
        dd = dedup_within_watermark(stream, ["user_id"], delay="10 minutes")
        got = run_stream(dd, "dedup_out")
        n_users = spark.read.parquet(events_stream_dir).select("user_id").distinct().count()
        # within-watermark dedup can only merge rows inside the delay
        # horizon, so result is >= global distinct; on this data every
        # user appears across many watermark windows
        assert n_users <= got.count() <= spark.read.parquet(events_stream_dir).count()
        assert got.count() < spark.read.parquet(events_stream_dir).count()

    def test_dedup_within_watermark_batch_twin_schema_parity(self, spark, events_stream_dir):
        """Batch and streaming modes of the same spec must emit identical
        schemas: the NTZ→TIMESTAMP normalization applies on BOTH branches,
        so a downstream sink/union sees one timestamp type."""
        from nekton_spark.streaming.windows import dedup_within_watermark

        batch = spark.read.parquet(events_stream_dir)
        stream = read_events_stream(spark, events_stream_dir)
        b = dedup_within_watermark(batch, ["user_id"], delay="10 minutes")
        s = dedup_within_watermark(stream, ["user_id"], delay="10 minutes")
        # withWatermark stamps eventTime metadata on the field, so compare
        # the (name, type) signature, which is what a sink/union checks
        assert [(f.name, f.dataType) for f in b.schema.fields] == [
            (f.name, f.dataType) for f in s.schema.fields
        ]
        assert str(b.schema["ts"].dataType) == "TimestampType()"


class TestStatefulStream:
    def test_running_counters_final_state_matches_batch(self, spark, events_stream_dir):
        from nekton_spark.streaming.stateful import running_counters

        stream = read_events_stream(spark, events_stream_dir)
        got = run_stream_update(running_counters(stream), "counters_out")
        # last update per key = final totals
        final = (
            got.toPandas()
            .sort_index()
            .groupby("key", as_index=False)
            .last()
        )
        batch = spark.read.parquet(events_stream_dir)
        expected = (
            running_counters(batch)
            .toPandas()
            .sort_values("key", ignore_index=True)
        )
        final = final.sort_values("key", ignore_index=True)
        assert list(final["key"]) == list(expected["key"])
        assert list(final["n_events"]) == list(expected["n_events"])
        assert [round(x, 6) for x in final["total"]] == [round(x, 6) for x in expected["total"]]


class TestStreamingSpec:
    def test_yaml_streaming_pipeline(self, spark, tmp_path):
        """End-to-end: YAML spec with streaming file source → regex op →
        memory sink, the reference pipeline shape on an unbounded input."""
        src = tmp_path / "in"
        src.mkdir()
        (src / "a.txt").write_text("hello #one\nworld #two\n")
        from nekton_spark.spec import Spec, compile_spec

        spec = Spec.from_yaml(
            f"""
input:
  type: file
  path: {src}
  format: text
  stream: true
pipeline:
  processors:
    - type: regex_select
      re: '\\#[a-z]+'
output:
  type: memory
  name: spec_stream_out
"""
        )
        df, run_sink = compile_spec(spark, spec)
        assert df.isStreaming
        q = run_sink()
        q.processAllAvailable()
        q.stop()
        vals = sorted(r.value for r in spark.sql("SELECT * FROM spec_stream_out").collect())
        assert vals == ["#one", "#two"]


class TestStreamingNearDup:
    DOCS = [
        # (doc_id, ts, text): 1↔2 identical & close in time; 3 matches
        # them but arrives beyond the horizon; 4/5 near-dups in-window;
        # 6 unrelated
        (1, "2024-01-01 10:00:00", "the quick brown fox jumps over the lazy dog today"),
        (2, "2024-01-01 10:03:00", "the quick brown fox jumps over the lazy dog today"),
        (3, "2024-01-01 11:30:00", "the quick brown fox jumps over the lazy dog today"),
        (4, "2024-01-01 10:01:00", "pack my box with five dozen liquor jugs right now"),
        (5, "2024-01-01 10:05:00", "pack my box with five dozen liquor jugs right here"),
        (6, "2024-01-01 10:02:00", "completely different content with other words entirely in it"),
    ]
    SCHEMA = "doc_id long, ts timestamp, text string"

    def _df(self, spark, rows):
        import datetime as dt

        rows = [
            (i, dt.datetime.strptime(t, "%Y-%m-%d %H:%M:%S"), x) for i, t, x in rows
        ]
        return spark.createDataFrame(rows, self.SCHEMA)

    def _write(self, spark, d):
        self._df(spark, self.DOCS).coalesce(1).write.mode("overwrite").parquet(d)

    def test_streaming_pairs_respect_horizon_and_match_batch(self, spark, tmp_path):
        from nekton_spark.streaming.neardup import streaming_minhash_near_dup

        d = str(tmp_path / "docs")
        self._write(spark, d)
        stream = spark.readStream.schema(self.SCHEMA).parquet(d)
        out = run_stream(
            streaming_minhash_near_dup(stream, delay="10 minutes", threshold=0.3),
            "neardup_out",
        )
        got = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
        # 1-2 within 3 min (identical), 4-5 within 4 min (near-dup);
        # doc 3 is identical to 1/2 but 87+ min later -> state evicted
        assert set(got) == {(1, 2), (4, 5)}
        assert got[(1, 2)] == 1.0
        assert 0.3 <= got[(4, 5)] < 1.0

        # batch-equivalence: same operator on the batch frame
        batch = streaming_minhash_near_dup(
            spark.read.parquet(d), delay="10 minutes", threshold=0.3
        )
        assert {(r.id_a, r.id_b): r.jaccard for r in batch.collect()} == got

    def test_replay_idempotence(self, spark, tmp_path):
        """Restarting from the checkpoint after new data arrives must
        not re-emit pairs already produced (exactly-once surface)."""
        from nekton_spark.streaming.neardup import streaming_minhash_near_dup

        d = str(tmp_path / "docs")
        out_dir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        self._write(spark, d)

        def run_once():
            stream = spark.readStream.schema(self.SCHEMA).parquet(d)
            q = (
                streaming_minhash_near_dup(stream, delay="10 minutes", threshold=0.3)
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .start()
            )
            q.processAllAvailable()
            q.stop()

        run_once()
        first = {(r.id_a, r.id_b) for r in spark.read.parquet(out_dir).collect()}
        assert first == {(1, 2), (4, 5)}

        # two more near-dup docs land in a new file; replay from ckpt
        extra = [
            (7, "2024-01-01 12:00:00", "some brand new duplicated sentence appears twice here ok"),
            (8, "2024-01-01 12:04:00", "some brand new duplicated sentence appears twice here ok"),
        ]
        self._df(spark, extra).coalesce(1).write.mode("append").parquet(d)
        run_once()
        rows = spark.read.parquet(out_dir).collect()
        assert len(rows) == len({(r.id_a, r.id_b) for r in rows}) == 3
        assert {(r.id_a, r.id_b) for r in rows} == {(1, 2), (4, 5), (7, 8)}


class TestHttpSource:
    def test_http_post_to_stream(self, spark, tmp_path):
        import random
        import time
        import urllib.request

        from nekton_spark.sources.http import http_server_source

        port = random.randint(40000, 60000)
        df = http_server_source(
            spark,
            address=f"127.0.0.1:{port}",
            path="/post",
            spool_dir=str(tmp_path / "spool"),
        )
        q = df.writeStream.format("memory").queryName("http_out").outputMode("append").start()
        try:
            time.sleep(1.0)
            for body in (b"alpha", b"beta"):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/post", data=body, method="POST"
                )
                with urllib.request.urlopen(req) as resp:
                    assert resp.status == 201
            deadline = time.time() + 30
            while time.time() < deadline:
                q.processAllAvailable()
                if spark.sql("SELECT * FROM http_out").count() >= 2:
                    break
                time.sleep(0.5)
            vals = sorted(r.value for r in spark.sql("SELECT * FROM http_out").collect())
            assert vals == ["alpha", "beta"]
        finally:
            q.stop()

    def test_http_wrong_path_404_wrong_method_405(self, spark):
        import urllib.error
        import urllib.request

        from nekton_spark.sources.http import start_http_listener

        server, _ = start_http_listener("127.0.0.1:49173", "/post")
        try:
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(
                    urllib.request.Request(
                        "http://127.0.0.1:49173/nope", data=b"x", method="POST"
                    )
                )
            assert e.value.code == 404
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen("http://127.0.0.1:49173/post")
            assert e.value.code == 405
        finally:
            server.shutdown()

    def test_spool_concurrent_appends_never_expose_gaps(self, tmp_path):
        """Regression for the advisor-reported race: seq N+1 renamed
        before N exists → current_end() exposes a gap and read_range
        crashes the micro-batch. Hammer append() from many threads
        while a reader polls; every observed [0, current_end) range
        must be fully readable."""
        import concurrent.futures

        from nekton_spark.sources.http import _Spool

        spool = _Spool(str(tmp_path / "spool"))
        stop = False
        errors = []

        def reader():
            while not stop:
                end = _Spool.current_end(spool.root)
                try:
                    rows = _Spool.read_range(spool.root, 0, end)
                except FileNotFoundError as e:  # the race being tested
                    errors.append(e)
                    return
                assert [s for s, _ in rows] == list(range(end))

        t = __import__("threading").Thread(target=reader)
        t.start()
        try:
            with concurrent.futures.ThreadPoolExecutor(max_workers=16) as ex:
                list(ex.map(lambda i: spool.append(f"m{i}".encode()), range(400)))
        finally:
            stop = True
            t.join()
        assert not errors
        assert _Spool.current_end(spool.root) == 400
        assert [s for s, _ in _Spool.read_range(spool.root, 0, 400)] == list(range(400))


class TestStreamingTierRollup:
    def test_streaming_finest_tier_feeds_batch_coarse_tier(self, spark, events_stream_dir, tmp_path):
        """The continuous-aggregate composition (functions/timetiers.py
        docstring): the finest tier runs as a watermarked streaming
        windowed agg writing parquet; the coarse tier re-aggregates the
        sink's output in batch. Every emitted hour bucket must equal
        the hour aggregation computed directly from raw events."""
        stream = read_events_stream(spark, events_stream_dir)
        minute = (
            stream.withWatermark("ts", "1 minute")
            .groupBy(F.window("ts", "1 minute").alias("win"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("total"),
                F.min("value").alias("vmin"),
                F.max("value").alias("vmax"),
            )
            .select(
                F.unix_timestamp("win.start").alias("bucket_start"),
                "event_type", "n", "total", "vmin", "vmax",
            )
        )
        sink = str(tmp_path / "minute_tier")
        q = (
            minute.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

        tier1 = spark.read.parquet(sink)
        hour = (
            tier1.groupBy(
                (F.floor(F.col("bucket_start") / 3600) * 3600).alias("bucket_start"),
                "event_type",
            )
            .agg(
                F.sum("n").alias("n"),
                F.sum("total").alias("total"),
                F.min("vmin").alias("vmin"),
                F.max("vmax").alias("vmax"),
            )
        )
        direct = (
            spark.read.parquet(events_stream_dir)
            .groupBy(
                (F.floor(F.unix_timestamp("ts") / 3600) * 3600).alias("bucket_start"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("total"),
                F.min("value").alias("vmin"),
                F.max("value").alias("vmax"),
            )
        )
        got = {(r.bucket_start, r.event_type): r for r in hour.collect()}
        want = {(r.bucket_start, r.event_type): r for r in direct.collect()}
        assert got, "streaming tier emitted nothing"
        for key, g in got.items():
            w = want[key]
            # append mode withholds open minute windows, so an hour
            # bucket at the stream tail may be partial: counts must
            # never exceed direct, and complete buckets match exactly
            assert g.n <= w.n
            if g.n == w.n:
                assert abs(g.total - w.total) < 1e-6
                assert g.vmin == w.vmin and g.vmax == w.vmax
        complete = sum(1 for k in got if got[k].n == want[k].n)
        assert complete >= len(got) - 2 * len({k[1] for k in got})


class TestEstimateVerifyNearDup:
    def test_estimator_tracks_exact_on_batch_twin(self, spark):
        """verify='estimate' carries only the k-long signature (the
        state-width win); its candidate set is identical to exact mode
        (same banding), and on clear duplicates the estimator must
        agree with exact Jaccard within the k=16 stderr."""
        from nekton_spark.streaming.neardup import streaming_minhash_near_dup

        texts = (
            ["the quick brown fox jumps over the lazy dog again today ok"] * 3
            + ["pack my box with five dozen liquor jugs right now please"] * 2
            + ["some entirely different text about various unrelated topics here"]
        )
        df = spark.createDataFrame(
            [(i, t, 1704067200 + i) for i, t in enumerate(texts)],
            "doc_id long, text string, es long",
        ).select("doc_id", "text", F.timestamp_seconds("es").alias("ts"))
        exact = {
            (r.id_a, r.id_b): r.jaccard
            for r in streaming_minhash_near_dup(df, delay="1 hour", threshold=0.5).collect()
        }
        est = {
            (r.id_a, r.id_b): r.jaccard
            for r in streaming_minhash_near_dup(
                df, delay="1 hour", threshold=0.5, verify="estimate"
            ).collect()
        }
        # identical duplicates: estimator is exactly 1.0, same pairs
        assert set(exact) == {(0, 1), (0, 2), (1, 2), (3, 4)}
        assert set(est) == set(exact)
        for pair, j in est.items():
            assert j == 1.0 and exact[pair] == 1.0

    def test_estimate_mode_rejects_bad_verify(self, spark):
        from nekton_spark.streaming.neardup import streaming_minhash_near_dup

        df = spark.createDataFrame([(0, "a b c", 0)], "doc_id long, text string, es long").select(
            "doc_id", "text", F.timestamp_seconds("es").alias("ts")
        )
        import pytest as _pytest

        with _pytest.raises(ValueError, match="unknown verify mode"):
            streaming_minhash_near_dup(df, verify="maybe")
