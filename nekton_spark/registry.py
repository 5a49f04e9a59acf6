"""Operator registries — the Spark analog of the reference's typetag dispatch.

The reference registers sources/processors/sinks under a YAML ``type:``
tag via ``#[typetag::serde(tag = "type")]`` (reference ``src/lib.rs:42-59``,
e.g. ``#[typetag::serde(name = "stdin")]`` at ``src/sources.rs:16``).
Here each registry maps the tag to a Python factory: the factory takes
the YAML config dict and returns

- source:    ``(spark) -> DataFrame``              (bounded or streaming)
- processor: ``(DataFrame) -> DataFrame``          (lazy Catalyst transform)
- sink:      ``(DataFrame) -> None | StreamingQuery``

Unknown tags raise at spec-compile time, matching serde's
fail-at-deserialization behavior (reference ``src/lib.rs:115-117``).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SOURCES: dict[str, Callable[..., Any]] = {}
PROCESSORS: dict[str, Callable[..., Any]] = {}
SINKS: dict[str, Callable[..., Any]] = {}


def _register(table: dict[str, Callable], kind: str, name: str):
    def deco(fn: Callable):
        if name in table:
            raise ValueError(f"duplicate {kind} type: {name!r}")
        table[name] = fn
        return fn

    return deco


def register_source(name: str):
    return _register(SOURCES, "source", name)


def register_processor(name: str):
    return _register(PROCESSORS, "processor", name)


def register_sink(name: str):
    return _register(SINKS, "sink", name)


def lookup(table: dict[str, Callable], kind: str, conf: dict) -> tuple[Callable, dict]:
    conf = dict(conf or {})
    type_tag = conf.pop("type", None)
    if type_tag is None:
        raise ValueError(f"{kind} config missing 'type' tag: {conf}")
    try:
        factory = table[type_tag]
    except KeyError:
        known = ", ".join(sorted(table))
        raise ValueError(f"unknown {kind} type {type_tag!r} (known: {known})") from None
    return factory, conf
