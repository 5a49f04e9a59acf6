"""Subprocess pipe operator goldens (reference src/processors.rs tests)."""

import shutil

import pytest

from nekton_spark.operators.messages import collect_batches, messages_df
from nekton_spark.operators.process import pipe_partitions, process

needs_awk = pytest.mark.skipif(shutil.which("awk") is None, reason="awk not installed")
AWK_SPLIT = ["-v", "RS=[,\n]", "{a=$0; print a}"]


@needs_awk
class TestProcess:
    def test_awk_split_one_batch(self, spark):
        # reference src/processors.rs:172-182
        df = messages_df(spark, [["hello,world,cheese"]])
        got = collect_batches(process(df, name="awk", args=AWK_SPLIT))
        assert got == [["hello", "world", "cheese"]]

    def test_awk_split_two_batches(self, spark):
        # reference src/processors.rs:184-200 — batch boundaries preserved
        df = messages_df(spark, [["a,b,c"], ["d,e,f"]])
        got = collect_batches(process(df, name="awk", args=AWK_SPLIT))
        assert got == [["a", "b", "c"], ["d", "e", "f"]]

    def test_multi_message_batch_framing(self, spark):
        # all payloads of one batch go to ONE child, newline-joined
        df = messages_df(spark, [["x", "y"]])
        got = collect_batches(process(df, name="wc", args=["-l"]))
        assert got == [["2"]]

    def test_empty_lines_dropped(self, spark):
        # reference drops empty stdout segments (src/processors.rs:138-145)
        df = messages_df(spark, [["a,,b"]])
        got = collect_batches(process(df, name="awk", args=AWK_SPLIT))
        assert got == [["a", "b"]]


class TestCat:
    def test_cat_identity(self, spark):
        df = messages_df(spark, [["one"], ["two"]])
        got = collect_batches(process(df, name="cat"))
        assert got == [["one"], ["two"]]

    def test_pipe_partitions_runs(self, spark):
        df = messages_df(spark, [["one"], ["two"]])
        vals = sorted(r.value for r in pipe_partitions(df, name="cat").collect())
        assert vals == ["one", "two"]
