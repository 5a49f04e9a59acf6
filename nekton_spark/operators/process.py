"""Subprocess pipe operator (reference ``type: process``).

The reference spawns a child process **per batch**, writes all message
payloads joined by ``\\n`` (plus trailing ``\\n``) to its stdin, splits
the child's stdout on ``\\n`` and drops empty segments
(``src/processors.rs:101-152``; framing at ``:123-131``, empty-drop at
``:138-145``). N:M per batch — e.g. awk splitting CSV in
``config_examples/std.yml:8-10``.

Spark design: ``applyInPandas`` grouped by ``batch_id`` so batch
boundaries (the framing unit the child observes) are preserved
exactly. Data moves via Arrow, and one Python worker per partition
handles many groups, so child-process spawn cost is amortized across a
partition's batches — the per-record process-boundary cost the
reference pays (one child per batch, serially) parallelizes across
executors here.

Scale note (100 TB): grouping by ``batch_id`` shuffles once on a
high-cardinality key — uniform by construction (ids are
partition-local monotonic), so no skew. For pipelines that don't
care about batch framing, :func:`pipe_partitions` offers the
``mapInPandas`` variant with **zero** shuffle: the child sees each
Arrow batch as one frame.
"""

from __future__ import annotations

import subprocess
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..registry import register_processor
from .messages import MESSAGE_SCHEMA, STRIDE

__all__ = ["process", "pipe_partitions"]


def _run_child(name: str, args: list[str], payloads: list[str]) -> list[str]:
    """Reference framing: join '\\n' + trailing '\\n' in; split '\\n',
    drop empties out (src/processors.rs:123-145)."""
    stdin = ("\n".join(payloads) + "\n").encode("utf-8")
    out = subprocess.run(
        [name, *args], input=stdin, stdout=subprocess.PIPE, check=True
    ).stdout.decode("utf-8")
    return [seg for seg in out.split("\n") if seg]


@register_processor("process")
def process(df: DataFrame, name: str, args: list[str] | None = None) -> DataFrame:
    """Run ``name args...`` once per batch over the batch's payloads."""
    args = list(args or [])

    def per_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("msg_idx")
        segs = _run_child(name, args, pdf["value"].tolist())
        base = int(pdf["msg_idx"].iloc[0])
        # 1:N op -> copy the batch's metadata to each child (messages.py
        # invariant: batch-scoped keys survive every operator; setting
        # None here silently dropped batch.* metadata mid-chain)
        meta = pdf["metadata"].iloc[0]
        return pd.DataFrame(
            {
                "batch_id": pdf["batch_id"].iloc[0],
                # child output is a new sequence for the batch: stride off
                # the first parent index to stay order-stable and collision-free
                "msg_idx": [base * STRIDE + i for i in range(len(segs))],
                "value": segs,
                "metadata": [meta] * len(segs),
            }
        )

    return df.groupBy("batch_id").applyInPandas(per_batch, MESSAGE_SCHEMA)


def pipe_partitions(df: DataFrame, name: str, args: list[str] | None = None) -> DataFrame:
    """Shuffle-free variant: one child invocation per Arrow batch.

    Equivalent to ``rdd.pipe`` but Arrow-framed and schema-preserving.
    Batch membership of outputs follows the first input row of the
    Arrow batch (frame semantics differ from the reference's per-batch
    framing — use :func:`process` when exact parity matters).
    """
    args = list(args or [])

    def per_part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            segs = _run_child(name, args, pdf["value"].tolist())
            meta = pdf["metadata"].iloc[0]  # same 1:N metadata copy
            yield pd.DataFrame(
                {
                    "batch_id": pdf["batch_id"].iloc[0],
                    "msg_idx": range(len(segs)),
                    "value": segs,
                    "metadata": [meta] * len(segs),
                }
            )

    return df.mapInPandas(per_part, MESSAGE_SCHEMA)
