"""YAML pipeline spec → Spark plan (reference frontend parity).

The reference's whole frontend is serde-YAML into a ``Spec`` struct —
``input`` / ``pipeline.processors[]`` / ``output`` with polymorphic
``type:`` dispatch (``src/lib.rs:67-72``, ``:42-59``); the deserialized
struct tree *is* the logical and physical plan (SURVEY §3.1). Here the
same YAML compiles to a lazy DataFrame chain and Catalyst does the
actual planning: predicate pushdown, codegen, AQE — the optimizer the
reference doesn't have runs on every spec for free.

Example (runs the reference's ``config_examples/std.yml`` unchanged in
meaning)::

    input:
      type: stdin
    pipeline:
      processors:
        - type: replace
          from: cheese
          to: bacon
        - type: regex_split
          re: ","
    output:
      type: stdout
"""

from __future__ import annotations

import io
from dataclasses import dataclass
from typing import Any

import yaml

from pyspark.sql import DataFrame, SparkSession

from . import operators, sinks, sources, streaming  # noqa: F401  (populate registries)
from .registry import PROCESSORS, SINKS, SOURCES, lookup


@dataclass
class Spec:
    input: dict
    processors: list[dict]
    output: dict

    @classmethod
    def from_yaml(cls, text_or_stream) -> "Spec":
        if isinstance(text_or_stream, str):
            text_or_stream = io.StringIO(text_or_stream)
        raw = yaml.safe_load(text_or_stream) or {}
        pipeline = raw.get("pipeline") or {}
        return cls(
            input=raw.get("input") or {},
            processors=list(pipeline.get("processors") or []),
            output=raw.get("output") or {},
        )

    @classmethod
    def from_file(cls, path: str) -> "Spec":
        with open(path) as f:
            return cls.from_yaml(f)


def compile_spec(spark: SparkSession, spec: Spec) -> tuple[DataFrame, Any]:
    """Compile to (final DataFrame, sink thunk). Lazy until the sink runs."""
    src_factory, src_conf = lookup(SOURCES, "source", spec.input)
    df = src_factory(spark, **src_conf)
    for proc in spec.processors:
        factory, conf = lookup(PROCESSORS, "processor", proc)
        df = factory(df, **conf)
    sink_factory, sink_conf = lookup(SINKS, "sink", spec.output)
    return df, lambda final=df: sink_factory(final, **sink_conf)


def run_spec(spark: SparkSession, spec: Spec | str):
    """Parse-compile-execute; returns the sink's result (None or a
    StreamingQuery). The analog of ``start_stream_processor``
    (reference ``src/lib.rs:74-94``)."""
    if isinstance(spec, str):
        # a newline-free string is only a FILE when it exists on disk —
        # a valid one-line flow-style YAML spec was previously fed to
        # open() and died with FileNotFoundError
        import os

        if "\n" not in spec and os.path.exists(spec):
            spec = Spec.from_file(spec)
        else:
            spec = Spec.from_yaml(spec)
    _, run_sink = compile_spec(spark, spec)
    return run_sink()
