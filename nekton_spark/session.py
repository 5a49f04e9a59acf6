"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we would set cluster-side: AQE on
(runtime re-planning, skew-join handling, partition coalescing),
shuffle partitions sized to cores (local) — on a real cluster this
would be ``spark.sql.shuffle.partitions ≈ 2-3× total executor cores``
and AQE coalescing trims the rest. Arrow is enabled so every
Pandas-UDF / ``applyInPandas`` operator moves data in columnar
batches, never row-at-a-time pickling.

Cluster durability knob: set ``SPARK_GRAFT_CHECKPOINT_DIR`` to a DFS
path (``hdfs://...``, ``s3://...``) when submitting to a real cluster
— every iterative/multi-consumer operator then pins intermediates via
reliable ``checkpoint()`` under that dir (survives executor loss)
instead of the local-mode ``localCheckpoint`` default. See
``nekton_spark/materialize.py``; results are bit-identical in both
modes (``tests/test_materialize.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def _cpus() -> str:
    return os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_spark(app_name: str = "nekton_spark", extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the session with scale-aware defaults.

    Every knob here is chosen for the 100 TB design point and merely
    scaled down for local testing:

    - AQE + skew join: at scale, runtime stats beat static planning.
    - ``autoBroadcastJoinThreshold`` left at default (10 MB): dimension
      tables (region/nation/supplier/part at any SF where they fit)
      broadcast automatically; we additionally hint ``F.broadcast`` on
      known-small sides so plans do not regress when stats are missing.
    - ``maxPartitionBytes`` 128 MB: parquet split granularity that keeps
      scan tasks uniform on huge inputs.
    - Session timezone pinned UTC so timestamp semantics match the
      DuckDB oracle and are cluster-invariant.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # driver testdata stores events.ts as parquet TIMESTAMP(NANOS),
        # which Spark rejects by default; read as long + convert (files.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
