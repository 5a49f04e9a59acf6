"""Cluster-durable materialization for reused / iterative subtrees.

Every iterative or multi-consumer operator in the engine (MinHash
signatures, star-contraction rounds, k-means point frames, MMR
candidate nomination, winnowing fingerprints, …) must pin an
intermediate frame so Spark does not re-derive a corpus-scale subtree
once per plan branch or grow an unbounded lineage across loop rounds.

Two mechanisms exist, with different durability:

- ``DataFrame.localCheckpoint(eager=True)`` — blocks live in executor
  storage memory/disk. Fast (no DFS round-trip), but on a REAL cluster
  a lost executor loses its blocks and the job fails: lineage was
  truncated, so there is nothing to recompute from. Fine on
  ``local[*]`` where executor death == driver death anyway.
- reliable ``DataFrame.checkpoint(eager=True)`` — blocks written to
  ``sparkContext.setCheckpointDir`` (HDFS/S3/DBFS on a cluster).
  Survives executor loss; the fault-tolerant choice at 100 TB.

``materialize(df)`` is the single switch point: every operator in the
package routes through it instead of calling ``localCheckpoint``
directly. Mode selection, in order:

1. explicit per-session override via ``set_checkpoint_dir(path)``;
2. the ``SPARK_GRAFT_CHECKPOINT_DIR`` environment variable (set it to
   a DFS path when submitting to a cluster — e.g.
   ``hdfs:///tmp/nekton-ckpt`` or ``s3://bucket/ckpt``);
3. neither set → ``localCheckpoint`` (the local-mode default).

Both paths produce bit-identical frames (checkpointing only changes
WHERE the materialized blocks live, never their content) —
``tests/test_materialize.py`` pins that on representative operators.

The reference engine (`src/lib.rs:85-92`) holds each one-message batch
in memory for the life of its Transaction and has no recovery story;
this helper is the Spark-side replacement for that implicit pin.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

__all__ = ["materialize", "set_checkpoint_dir", "checkpoint_dir"]

# module-level override; None -> fall back to the environment variable
_override: str | None = None


def set_checkpoint_dir(path: str | None) -> None:
    """Session-wide override for the reliable checkpoint directory.

    ``set_checkpoint_dir("hdfs:///...")`` switches every subsequent
    ``materialize`` call to reliable checkpointing; ``None`` reverts
    to the ``SPARK_GRAFT_CHECKPOINT_DIR`` env / local default.
    """
    global _override
    _override = path


def checkpoint_dir() -> str | None:
    """The reliable checkpoint dir in effect (None = local mode)."""
    if _override is not None:
        return _override
    return os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR") or None


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut lineage and pin ``df``'s rows, durably when configured.

    Drop-in replacement for ``df.localCheckpoint(eager=True)``: with no
    checkpoint dir configured that is exactly what runs; with
    ``SPARK_GRAFT_CHECKPOINT_DIR`` (or ``set_checkpoint_dir``) set, a
    reliable ``df.checkpoint(eager=True)`` runs instead, writing blocks
    under the configured directory so a 1000-executor job survives
    executor loss mid-iteration.

    Iterative callers (star-contraction rounds, k-means sweeps) leave
    one checkpoint per round under the dir; submit with
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` so
    reference-dropped round checkpoints are garbage-collected instead
    of accumulating for the job's lifetime.
    """
    d = checkpoint_dir()
    if d is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    # setCheckpointDir is idempotent for a fixed path; keep it in sync
    # with the configured dir (the user may re-point mid-session)
    if getattr(sc, "_nekton_ckpt_dir", None) != d:
        sc.setCheckpointDir(d)
        sc._nekton_ckpt_dir = d
    return df.checkpoint(eager=eager)
