"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no state at all (SURVEY §2.4); these demonstrate the
engine's custom-stateful surface with one canonical operator:

- :func:`running_counters` — per-key running count/sum with
  GroupState, the minimal template every custom stateful operator
  (rate limiting, CDC collapse, per-entity accumulators) follows.

State is per-key in the state store (RocksDB-backed on a real
cluster), so memory scales with distinct keys, not events.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n_events bigint, total double"
STATE_SCHEMA = "n bigint, total double"


def _update(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total": [total]})


def running_counters(df: DataFrame, key_col: str = "event_type", value_col: str = "value") -> DataFrame:
    """Streaming: emits updated per-key counters each micro-batch.
    Batch fallback: plain groupBy (same output schema, final values)."""
    src = df.select(df[key_col].alias("key"), df[value_col].alias("value"))
    if not df.isStreaming:
        from pyspark.sql import functions as F

        return src.groupBy("key").agg(
            F.count(F.lit(1)).alias("n_events"), F.sum("value").cast("double").alias("total")
        )
    return src.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
