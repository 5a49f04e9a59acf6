"""Pipeline metrics (the reference's declared-but-unbuilt intent).

The reference declares ``prometheus = "0.7"`` in its manifest but never
imports it anywhere (reference ``Cargo.toml:19``; verified by grep —
SURVEY §2.4). The evident intent is throughput/health counters for
running pipelines; Spark's native hooks cover it without any new
dependency:

- **Streaming**: a :class:`StreamingQueryListener` receives every
  micro-batch's ``StreamingQueryProgress`` (rows, rates, durations,
  state size) driver-side — zero cost on executors, no extra actions.
- **Batch**: ``pyspark.sql.Observation`` attaches metric expressions
  to a frame; they are computed *inside* the existing job (accumulator
  semantics), not by a second pass over the data.

Exposition is Prometheus text format 0.0.4 — what the reference's
declared crate would have produced — rendered from the collected
snapshot; serve it from any HTTP endpoint or scrape the string.
"""

from __future__ import annotations

import threading
from typing import Any

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql.streaming import StreamingQueryListener


def observed(df: DataFrame, name: str, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named metric expressions to a batch frame.

    Returns ``(df, observation)``; after the first action on ``df``,
    ``observation.get`` yields the metric values. The metrics ride the
    job's own pass over the data (Spark ``CollectMetrics`` node), so
    there is no second scan — safe on a 100 TB input.

        df, obs = observed(df, "ingest", rows=F.count(F.lit(1)))
        df.write.parquet(...)
        obs.get["rows"]
    """
    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in metrics.items()]), obs


class MetricsListener(StreamingQueryListener):
    """Accumulates per-query throughput counters from progress events.

    Driver-side only; retains O(#queries) state (last progress + running
    totals), never rows. Thread-safe: Spark delivers events from its
    listener bus thread while ``snapshot``/``prometheus_text`` are
    called from user code.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._queries: dict[str, dict[str, Any]] = {}

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._queries.setdefault(
                str(event.id),
                {"name": event.name or str(event.id), "batches": 0, "rows": 0,
                 "input_rps": 0.0, "process_rps": 0.0, "state_rows": 0, "active": True},
            )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            q = self._queries.setdefault(
                str(p.id), {"name": p.name or str(p.id), "batches": 0, "rows": 0,
                            "input_rps": 0.0, "process_rps": 0.0, "state_rows": 0,
                            "active": True},
            )
            q["batches"] += 1
            q["rows"] += p.numInputRows or 0
            q["input_rps"] = p.inputRowsPerSecond or 0.0
            q["process_rps"] = p.processedRowsPerSecond or 0.0
            q["state_rows"] = sum(s.numRowsTotal or 0 for s in (p.stateOperators or []))

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            if str(event.id) in self._queries:
                self._queries[str(event.id)]["active"] = False

    def onQueryIdle(self, event) -> None:  # pragma: no cover - no-op
        pass

    # -- exposition ---------------------------------------------------------
    def snapshot(self) -> dict[str, dict[str, Any]]:
        with self._lock:
            return {k: dict(v) for k, v in self._queries.items()}

    @staticmethod
    def _esc(label_value: str) -> str:
        """Escape a label value per the exposition format: backslash,
        double quote, and newline must be backslash-escaped."""
        return (
            str(label_value)
            .replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
        )

    def prometheus_text(self) -> str:
        """Prometheus text exposition format 0.0.4."""
        snap = self.snapshot()
        out = [
            "# HELP nekton_input_rows_total Input rows consumed per query",
            "# TYPE nekton_input_rows_total counter",
        ]
        for q in snap.values():
            out.append(f'nekton_input_rows_total{{query="{self._esc(q["name"])}"}} {q["rows"]}')
        out += [
            "# HELP nekton_batches_total Micro-batches completed per query",
            "# TYPE nekton_batches_total counter",
        ]
        for q in snap.values():
            out.append(f'nekton_batches_total{{query="{self._esc(q["name"])}"}} {q["batches"]}')
        out += [
            "# HELP nekton_input_rows_per_second Latest input rate",
            "# TYPE nekton_input_rows_per_second gauge",
        ]
        for q in snap.values():
            out.append(
                f'nekton_input_rows_per_second{{query="{self._esc(q["name"])}"}} {q["input_rps"]}'
            )
        out += [
            "# HELP nekton_state_rows Current stateful-operator row count",
            "# TYPE nekton_state_rows gauge",
        ]
        for q in snap.values():
            out.append(f'nekton_state_rows{{query="{self._esc(q["name"])}"}} {q["state_rows"]}')
        return "\n".join(out) + "\n"


def attach(spark) -> MetricsListener:
    """Register a fresh :class:`MetricsListener` on the session's
    streaming listener bus and return it."""
    listener = MetricsListener()
    spark.streams.addListener(listener)
    return listener
