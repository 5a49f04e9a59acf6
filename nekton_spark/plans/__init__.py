"""Plan inspection helpers — make "is this the plan we'd want at 100 TB"
checkable in code and tests, not just by eyeballing .explain().
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def formatted_plan(df: DataFrame) -> str:
    return _explain(df, "formatted")


def simple_plan(df: DataFrame) -> str:
    return _explain(df, "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (predicate pushdown proof)."""
    out = []
    for line in formatted_plan(df).splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:"):
            out.append(s.removeprefix("PushedFilters:").strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read by scans (column-pruning proof)."""
    cols: list[str] = []
    for line in formatted_plan(df).splitlines():
        s = line.strip()
        if s.startswith("ReadSchema:"):
            schema = s.removeprefix("ReadSchema:").strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            depth = 0
            field = ""
            for ch in inner:
                # parentheses nest too: decimal(10,2)'s comma would
                # otherwise split mid-type and emit a phantom column
                if ch in "<(":
                    depth += 1
                elif ch in ">)":
                    depth -= 1
                if ch == "," and depth == 0:
                    cols.append(field.split(":")[0])
                    field = ""
                else:
                    field += ch
            if field:
                cols.append(field.split(":")[0])
    return cols


def count_exchanges(df: DataFrame) -> int:
    """DATA-MOVEMENT shuffle count in the physical plan (lower =
    better at scale). Deliberately counts hash and range exchanges
    only: RoundRobinPartitioning exchanges are excluded because they
    are exactly the ``ensure_parallelism`` fan-outs this engine
    inserts for under-split local inputs (a no-op at real scale) —
    every pinned budget in tests/test_plans.py is calibrated to this
    definition. Use ``simple_plan(df).count("Exchange")`` when the
    round-robin fan-out itself is under test."""
    p = simple_plan(df)
    return p.count("Exchange hashpartitioning") + p.count(
        "Exchange rangepartitioning"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df) or "BroadcastNestedLoopJoin" in simple_plan(df)


def single_partition_exchanges(df: DataFrame) -> int:
    """Count of Exchange SinglePartition nodes — a global sort/window
    funneling ALL rows through one task. Zero is the target for any
    operator that must scale; top-k should compile to
    TakeOrderedAndProject (per-partition partial top-k) instead."""
    return simple_plan(df).count("Exchange SinglePartition")


def has_take_ordered(df: DataFrame) -> bool:
    """True when the k-selection compiles to TakeOrderedAndProject —
    per-partition partial top-k with a bounded merge, never a full
    global sort."""
    return "TakeOrderedAndProject" in simple_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen'd subtrees. Uses the codegen
    explain mode: with AQE on, the pre-execution formatted plan hides
    codegen annotation."""
    import re

    m = re.match(r"Found (\d+) WholeStageCodegen", _explain(df, "codegen"))
    return int(m.group(1)) if m else 0


def partition_filters(df: DataFrame) -> list[str]:
    """Partition-pruning predicates at the scan (only partition
    directories matching these are listed/read — the layout win of
    a partitioned write)."""
    out = []
    for line in formatted_plan(df).splitlines():
        s = line.strip()
        if s.startswith("PartitionFilters:"):
            out.append(s.removeprefix("PartitionFilters:").strip())
    return out
