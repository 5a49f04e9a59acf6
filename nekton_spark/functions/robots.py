r"""robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol).

The compliance side of crawl curation: before a page enters a corpus,
the host's robots.txt decides whether the crawler was allowed to fetch
it at all (and well-run training pipelines re-check at curation time —
politeness snapshots go stale). Original implementation from the
public RFC 9309 / Google REP documentation:

- group selection: the groups whose ``User-agent`` token most
  specifically matches the product token (longest token that is a
  case-insensitive PREFIX of the product token wins; ``*`` is the
  fallback); ALL groups at the winning specificity merge their rules
  (§2.2.1 — duplicate-token groups are a single logical group);
  multiple user-agents may share one group;
- rule matching: ``Allow``/``Disallow`` paths match as prefixes with
  ``*`` (any chars) and ``$`` (end anchor) wildcards;
- precedence: the LONGEST matching rule wins; on a length tie, Allow
  wins (RFC 9309 §2.2.2);
- an empty ``Disallow:`` matches nothing; no matching rule = allowed;
  a missing/unparseable robots.txt = allowed (the RFC's
  fail-open for 4xx).

Spark surface: :func:`robots_allowed_expr`-style evaluation happens in
one Arrow pass over (robots_txt, path) pairs — at corpus scale the
robots bodies arrive as one small per-host relation that BROADCAST
joins onto pages by registered domain (cardinality = hosts, not
pages), then this map evaluates per row. No shuffle beyond that
broadcast.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


import functools
import re


@functools.lru_cache(maxsize=4096)
def _rule_regex(rule: str):
    """RFC 9309 path pattern → anchored regex: '*' = any char run,
    trailing '$' = end anchor, everything else literal. Prefix match
    unless anchored (re.match anchors at the start already)."""
    anchored = rule.endswith("$")
    if anchored:
        rule = rule[:-1]
    body = ".*".join(re.escape(p) for p in rule.split("*"))
    return re.compile(body + ("$" if anchored else ""))


def _rule_matches(rule: str, path: str) -> bool:
    return _rule_regex(rule).match(path) is not None


def parse_robots(txt: str | None) -> list[tuple[str, list[tuple[bool, str]]]]:
    """robots.txt → ordered [(user_agent_token, [(is_allow, path)])]
    groups. Lines outside any group and unknown directives are
    ignored; comments strip at '#'."""
    if not txt:
        return []
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    agents_open = False  # collecting consecutive User-agent lines

    def flush():
        nonlocal cur_agents, cur_rules
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        cur_agents, cur_rules = [], []

    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not agents_open:
                flush()
                agents_open = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            agents_open = False
            if cur_agents:
                cur_rules.append((key == "allow", val))
        else:
            agents_open = False  # sitemap / crawl-delay etc. end the UA run
    flush()
    return [(a, rules) for agents, rules in groups for a in agents]


def robots_allowed(txt: str | None, agent: str, path: str) -> int:
    """1 if ``agent`` may fetch ``path`` under ``txt`` (RFC 9309
    precedence), else 0. Missing robots → allowed.

    Group selection (RFC 9309 §2.2.1, r12 ADVICE fix): a ``User-agent``
    token matches when it is a case-insensitive PREFIX of the product
    token (``trainbot`` matches ``trainbot-news``; ``bot`` does NOT
    match ``trainbot`` — the substring matching this replaces would
    have); the winning specificity is the longest matching token, and
    the rules of ALL groups at that specificity are MERGED (a second
    ``User-agent: x`` group later in the file contributes its rules
    instead of being silently ignored). ``*`` groups merge likewise as
    the fallback."""
    groups = parse_robots(txt)
    if not groups:
        return 1
    agent = agent.lower()
    best_len = -1
    for token, _ in groups:
        if token != "*" and agent.startswith(token) and len(token) > best_len:
            best_len = len(token)
    if best_len >= 0:
        rules = [
            r
            for token, rs in groups
            if token != "*" and len(token) == best_len
            and agent.startswith(token)
            for r in rs
        ]
    elif any(token == "*" for token, _ in groups):
        rules = [r for token, rs in groups if token == "*" for r in rs]
    else:
        return 1
    verdict, best_rule_len = 1, -1
    for is_allow, rule in rules:
        if rule == "":
            continue  # empty Disallow/Allow matches nothing
        if _rule_matches(rule, path):
            ln = len(rule)
            if ln > best_rule_len or (ln == best_rule_len and is_allow):
                best_rule_len = ln
                verdict = 1 if is_allow else 0
    return verdict


def robots_filter(
    df: DataFrame,
    robots_col: str = "robots_txt",
    path_col: str = "path",
    agent: str = "*",
    out_col: str = "robots_allowed",
) -> DataFrame:
    """Annotate rows with the RFC 9309 verdict. One Arrow pass; join
    the per-host robots relation on (broadcast, host-cardinality)
    before calling this."""

    @F.pandas_udf("int")
    def _ra(txt: pd.Series, path: pd.Series) -> pd.Series:
        return pd.Series(
            [robots_allowed(t, agent, p or "/") for t, p in zip(txt, path)],
            dtype="int32",
        )

    from .similarity import ensure_parallelism

    # fan out below the matcher (r15 opt): 1-split input would run
    # the Arrow pass on one task; no-op at scale and on streams
    return ensure_parallelism(df).withColumn(
        out_col, _ra(F.col(robots_col), F.col(path_col))
    )


def synth_robots(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Deterministic (robots_txt, path) pairs exercising group
    selection, wildcard/anchor matching, and the longest-rule/Allow
    tiebreak — each leg's verdict is a closed-form CASE on doc_id.

    robots body (fixed): a '*' group disallowing /private/ and
    /tmp/*.bin$ but allowing /private/ok/, and a 'trainbot' group
    disallowing everything except /public/. path cycles doc_id % 6;
    agent alternates trainbot / randombot by doc_id % 2."""
    txt = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/ok/\n"
        "Disallow: /tmp/*.bin$\n"
        "\n"
        "User-agent: trainbot\n"
        "Disallow: /\n"
        "Allow: /public/\n"
    )
    key = F.col(key_col)
    path = (
        F.when(key % 6 == 0, F.lit("/index.html"))
        .when(key % 6 == 1, F.lit("/private/a.html"))
        .when(key % 6 == 2, F.lit("/private/ok/b.html"))
        .when(key % 6 == 3, F.lit("/tmp/x.bin"))
        .when(key % 6 == 4, F.lit("/tmp/x.bin.gz"))
        .otherwise(F.lit("/public/c.html"))
    )
    return df.withColumn("robots_txt", F.lit(txt)).withColumn("path", path)
