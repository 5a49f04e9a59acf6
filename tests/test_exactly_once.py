"""Exactly-once sink: epoch-keyed idempotent writes + checkpoint recovery."""

import time


class TestExactlyOnceSink:
    def test_epoch_partitioned_output_and_replay_idempotence(self, spark, tmp_path):
        from nekton_spark.sinks.exactly_once import exactly_once_file_sink

        src = tmp_path / "in"
        src.mkdir()
        (src / "a.txt").write_text("r1\nr2\n")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        stream = spark.readStream.format("text").load(str(src))
        q = exactly_once_file_sink(stream, path=out, checkpoint=ckpt)
        q.processAllAvailable()
        q.stop()
        first = spark.read.parquet(out)
        assert sorted(r.value for r in first.collect()) == ["r1", "r2"]
        assert "epoch" in first.columns

        # new file + restart from the same checkpoint: old epochs intact,
        # new epoch added, nothing duplicated
        (src / "b.txt").write_text("r3\n")
        stream2 = spark.readStream.format("text").load(str(src))
        q2 = exactly_once_file_sink(stream2, path=out, checkpoint=ckpt)
        q2.processAllAvailable()
        q2.stop()
        vals = sorted(r.value for r in spark.read.parquet(out).collect())
        assert vals == ["r1", "r2", "r3"]

    def test_spec_surface(self, spark, tmp_path):
        from nekton_spark.spec import Spec, run_spec

        src = tmp_path / "in"
        src.mkdir()
        (src / "a.txt").write_text("x\ny\n")
        q = run_spec(
            spark,
            f"""
input:
  type: file
  path: {src}
  format: text
  stream: true
  as_messages: false
pipeline:
  processors: []
output:
  type: file_exactly_once
  path: {tmp_path}/out2
  checkpoint: {tmp_path}/ckpt2
""",
        )
        q.processAllAvailable()
        q.stop()
        assert spark.read.parquet(f"{tmp_path}/out2").count() == 2
