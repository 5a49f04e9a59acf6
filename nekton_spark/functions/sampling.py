"""Deterministic sampling & dataset splitting for training-data pipelines.

Random sampling (``df.sample``) is seed-and-partitioning dependent —
resampling after a repartition yields a different subset, which is
poison for reproducible dataset builds. These operators are
*content-addressed*: membership depends only on the row's key, via the
portable 60-bit hash, so they are stable across runs, engines,
partitionings, and cluster sizes — and exactly verifiable against the
DuckDB oracle.

- :func:`hash_sample` — keep ~rate of rows (hash(key) mod M < rate·M).
- :func:`train_val_test_split` — disjoint, exhaustive split assignment.
- :func:`stratified_hash_sample` — per-stratum rates.

All map-only: zero shuffles, trivially 100 TB-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import hash60

BUCKETS = 1_000_000


def _bucket(key: Column, seed: int) -> Column:
    return hash60(key, seed) % BUCKETS


def hash_sample(df: DataFrame, key_col: str, rate: float, seed: int = 42) -> DataFrame:
    """Keep rows whose key hashes into the first ``rate`` fraction of buckets."""
    return df.filter(_bucket(F.col(key_col), seed) < int(rate * BUCKETS))


def split_assignment(key: Column, weights: dict[str, float], seed: int = 42) -> Column:
    """Label each row with its split name; weights must sum to ≤ 1,
    remainder goes to the last split."""
    b = _bucket(key, seed)
    names = list(weights)
    bounds = []
    acc = 0.0
    for name in names:
        acc += weights[name]
        bounds.append((name, int(acc * BUCKETS)))
    chain = None
    for name, bound in bounds:  # first matching bound wins
        cond = b < F.lit(bound)
        chain = F.when(cond, F.lit(name)) if chain is None else chain.when(cond, F.lit(name))
    return chain.otherwise(F.lit(names[-1]))


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn("split", split_assignment(F.col(key_col), weights, seed))


def stratified_hash_sample(
    df: DataFrame, key_col: str, stratum_col: str, rates: dict[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum deterministic rates; strata not in ``rates`` are dropped."""
    b = _bucket(F.col(key_col), seed)
    cond = F.lit(False)
    for stratum, rate in rates.items():
        cond = cond | ((F.col(stratum_col) == stratum) & (b < int(rate * BUCKETS)))
    return df.filter(cond)
