r"""Reference processor surface: noop / replace / regex family.

Every operator here compiles to built-in Catalyst expressions
(whole-stage-codegen'd, JVM-side) — no Python in the hot path. Each is
registered under the same YAML ``type:`` tag as the reference operator
it matches, and each docstring cites the reference impl whose
semantics it reproduces.

Regex dialect: the reference uses Rust ``regex`` syntax
(``(?P<name>...)`` groups, ``$name``/``$1``/``${name}`` replacement
refs, ``$$`` literal dollar — reference ``src/regex.rs``). Spark uses
Java regex (``(?<name>...)``, ``${name}``/``$1``, ``\$`` literal).
:func:`translate_pattern` / :func:`translate_replacement` convert at
spec-compile time so user specs written for the reference run
unchanged (SURVEY §2.2 caveat).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..registry import register_processor
from .messages import refine_idx

__all__ = [
    "noop",
    "replace",
    "regex_replace",
    "regex_split",
    "regex_select",
    "translate_pattern",
    "translate_replacement",
]


def translate_pattern(pattern: str) -> str:
    """Rust-regex pattern → Java-regex pattern.

    The only syntactic divergence exercised by the reference is named
    groups: Rust ``(?P<name>...)`` vs Java ``(?<name>...)`` (reference
    test ``src/regex.rs:61-75``). Java accepts the rest of the
    reference's patterns verbatim.
    """
    return pattern.replace("(?P<", "(?<")


def translate_replacement(rep: str) -> str:
    """Rust-regex replacement string → Java replacement string.

    Rust: ``$1``, ``$name``, ``${name}``, ``$$`` = literal ``$``.
    Java:  ``$1``, ``${name}`` only, ``\\$`` = literal ``$``.
    """
    out = []
    i, n = 0, len(rep)
    while i < n:
        c = rep[i]
        if c == "\\":
            out.append("\\\\")
            i += 1
        elif c == "$":
            if i + 1 < n and rep[i + 1] == "$":
                out.append("\\$")
                i += 2
            else:
                m = _re.match(r"\$(\{)?([A-Za-z_][A-Za-z0-9_]*|\d+)(?(1)\})", rep[i:])
                if m:
                    ref = m.group(2)
                    if (
                        ref.isdigit()
                        and m.group(1)
                        and i + m.end() < n
                        and rep[i + m.end()].isdigit()
                    ):
                        # Rust '${1}1' = group 1 then literal '1'. Java
                        # has no brace syntax for NUMERIC refs, and a
                        # bare '$11' resolves greedily to group 11 —
                        # stripping the braces would silently reference
                        # the wrong group. No faithful translation
                        # exists; refuse rather than corrupt.
                        raise ValueError(
                            f"cannot translate replacement {rep!r}: Java has "
                            "no disambiguated form for a braced numeric "
                            "group ref followed by a digit"
                        )
                    out.append(f"${ref}" if ref.isdigit() else f"${{{ref}}}")
                    i += m.end()
                else:
                    out.append("\\$")
                    i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


@register_processor("noop")
def noop(df: DataFrame) -> DataFrame:
    """Identity (reference ``src/processors.rs:11-19``).

    The spec compiler still registers it so reference specs parse, but
    Catalyst sees no node at all — cheaper than the reference, which
    pays a closure call per batch.
    """
    return df


@register_processor("replace")
def replace(df: DataFrame, from_: str = None, to: str = None, **kw) -> DataFrame:
    """Literal substring replace on every message, 1:1.

    Matches Rust ``str::replace`` (reference ``src/processors.rs:40``):
    every non-overlapping occurrence, left to right. Compiles to the
    codegen'd ``StringReplace`` expression — no regex engine involved.
    YAML keys are ``from``/``to`` (``from`` is a Python keyword, hence
    the alias handling).
    """
    from_ = kw.pop("from", from_)
    if from_ is None or to is None:
        raise ValueError("replace requires 'from' and 'to'")
    return df.withColumn("value", F.replace("value", F.lit(from_), F.lit(to)))


@register_processor("regex_replace")
def regex_replace(df: DataFrame, re: str, rep: str) -> DataFrame:
    """Regex replace-all with group refs, 1:1 (reference ``src/regex.rs:10-40``).

    ``re``/``rep`` are Rust-dialect (as in reference specs) and are
    translated; golden vector: date reformat with named groups
    (``src/regex.rs:61-75``).
    """
    return df.withColumn(
        "value", F.regexp_replace("value", translate_pattern(re), translate_replacement(rep))
    )


@register_processor("regex_split")
def regex_split(df: DataFrame, re: str) -> DataFrame:
    """Split each message at regex matches; segments stay in the batch, 1:N.

    Rust ``Regex::split`` keeps empty segments (leading, internal,
    trailing), so we pass ``limit=-1`` to Spark's split, which does the
    same (reference ``src/regex.rs:96-132``; SURVEY §2.2). The fan-out
    uses ``posexplode`` + index striding — order preserved with zero
    shuffle.

    Documented divergence envelope: for a pattern that matches EMPTY
    at position 0 (e.g. ``\\d*`` against ``abc``), Java's
    ``Pattern.split`` drops the leading empty segment while Rust keeps
    it — a JVM-level difference ``limit=-1`` does not control. None of
    the reference's split patterns can match empty; flag only if a
    spec relies on zero-width-at-start splits.
    """
    return (
        df.select(
            "batch_id",
            "msg_idx",
            "metadata",
            F.posexplode(F.split("value", translate_pattern(re), -1)).alias("pos", "value"),
        )
        .select(
            "batch_id",
            refine_idx(F.col("msg_idx"), F.col("pos")).alias("msg_idx"),
            "value",
            "metadata",
        )
    )


@register_processor("regex_select")
def regex_select(df: DataFrame, re: str) -> DataFrame:
    """Emit every non-overlapping match as its own message, 0:N.

    A message with no match disappears (reference ``find_iter`` loop,
    ``src/regex.rs:193-210``): plain ``posexplode`` (not outer) on
    ``regexp_extract_all`` reproduces exactly that — empty match arrays
    yield no rows.
    """
    return (
        df.select(
            "batch_id",
            "msg_idx",
            "metadata",
            F.posexplode(F.regexp_extract_all("value", F.lit(translate_pattern(re)), F.lit(0))).alias(
                "pos", "value"
            ),
        )
        .select(
            "batch_id",
            refine_idx(F.col("msg_idx"), F.col("pos")).alias("msg_idx"),
            "value",
            "metadata",
        )
    )
