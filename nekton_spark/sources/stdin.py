"""stdin source (reference ``type: stdin``, ``src/sources.rs:13-30``).

The reference reads stdin line-by-line, one line per single-message
batch. Spark has no stdin source: the driver reads stdin (a single
process reading a single pipe is inherently not distributable) and
parallelizes the lines into a message DataFrame — each line its own
batch, matching the reference's batching exactly.

For unbounded stdin-like streams, use the ``file``/``socket``/``kafka``
streaming sources instead; stdin is a CLI convenience, not the scale
path.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession

from ..operators.messages import MESSAGE_SCHEMA
from ..registry import register_source


@register_source("stdin")
def stdin_source(spark: SparkSession, lines: list[str] | None = None) -> DataFrame:
    """``lines`` is injectable for tests; defaults to reading sys.stdin."""
    if lines is None:
        lines = [ln.rstrip("\n") for ln in sys.stdin]
    rows = [(i, 0, ln, {}) for i, ln in enumerate(lines)]
    return spark.createDataFrame(rows, MESSAGE_SCHEMA)
