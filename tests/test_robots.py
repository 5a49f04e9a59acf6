"""robots.txt (functions/robots.py, RFC 9309): group selection, path
wildcards/anchors, precedence + the Allow tiebreak, fail-open, and the
Spark surface. The driver row robots_eval carries the closed-form
oracle."""

import pytest
from pyspark.sql import functions as F

from nekton_spark.functions.robots import (
    parse_robots,
    robots_allowed,
    robots_filter,
    synth_robots,
)

TXT = """User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp/*.bin$

User-agent: trainbot
Disallow: /
Allow: /public/
"""


class TestSemantics:
    @pytest.mark.parametrize(
        "agent,path,want",
        [
            ("randombot", "/index.html", 1),
            ("randombot", "/private/a.html", 0),
            ("randombot", "/private/ok/b.html", 1),  # longer Allow wins
            ("randombot", "/tmp/x.bin", 0),  # $ anchors
            ("randombot", "/tmp/x.bin.gz", 1),  # anchor excludes suffix
            ("TrainBot/1.0", "/index.html", 0),  # specific group wins
            ("trainbot", "/public/c.html", 1),
            ("trainbot", "/private/ok/b.html", 0),
        ],
    )
    def test_verdicts(self, agent, path, want):
        assert robots_allowed(TXT, agent, path) == want

    def test_fail_open(self):
        assert robots_allowed(None, "x", "/a") == 1
        assert robots_allowed("", "x", "/a") == 1
        assert robots_allowed("no colons here", "x", "/a") == 1

    def test_allow_wins_length_tie(self):
        tie = "User-agent: *\nDisallow: /dir/\nAllow: /dir*\n"
        assert robots_allowed(tie, "a", "/dir/x") == 1

    def test_empty_disallow_matches_nothing(self):
        assert robots_allowed("User-agent: *\nDisallow:\n", "a", "/x") == 1

    def test_shared_user_agent_group(self):
        sh = "User-agent: a\nUser-agent: b\nDisallow: /\n"
        assert robots_allowed(sh, "a", "/x") == 0
        assert robots_allowed(sh, "b", "/x") == 0
        assert robots_allowed(sh, "c", "/x") == 1  # no * fallback

    def test_duplicate_token_groups_merge(self):
        """RFC 9309 §2.2.1 (r12 ADVICE): two groups for the same agent
        token are one logical group — the second group's Disallow must
        not fail open."""
        t = ("User-agent: a\nDisallow: /x/\n\n"
             "Sitemap: http://e.com/s.xml\n\n"
             "User-agent: a\nDisallow: /y/\n")
        assert robots_allowed(t, "a", "/x/1") == 0
        assert robots_allowed(t, "a", "/y/z") == 0  # was 1 pre-fix
        assert robots_allowed(t, "a", "/z/1") == 1
        # '*' fallback groups merge the same way
        s = "User-agent: *\nDisallow: /x/\n\nUser-agent: *\nDisallow: /y/\n"
        assert robots_allowed(s, "other", "/y/z") == 0

    def test_merge_only_at_winning_specificity(self):
        """A shorter matching token's rules do NOT merge into the more
        specific group's verdict (longest-token group wins alone)."""
        t = ("User-agent: train\nDisallow: /a/\n\n"
             "User-agent: trainbot\nDisallow: /b/\n")
        assert robots_allowed(t, "trainbot", "/a/1") == 1  # less specific
        assert robots_allowed(t, "trainbot", "/b/1") == 0
        assert robots_allowed(t, "train-x", "/a/1") == 0  # 'train' group

    def test_prefix_not_substring_token_match(self):
        """Token matches as a prefix of the product token: 'bot' must
        not capture 'trainbot' (the pre-fix substring match did)."""
        t = "User-agent: bot\nDisallow: /\n"
        assert robots_allowed(t, "trainbot", "/x") == 1
        assert robots_allowed(t, "bot-news", "/x") == 0
        assert robots_allowed(t, "BotRider/2", "/x") == 0

    def test_comments_and_unknown_directives(self):
        t = ("# banner\nUser-agent: *  # inline\nCrawl-delay: 5\n"
             "Disallow: /x/ # comment\n")
        groups = parse_robots(t)
        assert groups == [("*", [(False, "/x/")])]
        assert robots_allowed(t, "a", "/x/1") == 0


class TestSpark:
    def test_filter_columns(self, spark):
        d = spark.range(0, 12).select(F.col("id").alias("doc_id"))
        out = robots_filter(synth_robots(d), agent="trainbot").collect()
        for r in out:
            assert r.robots_allowed == (1 if r.doc_id % 6 == 5 else 0)

    def test_processor_registry(self, spark):
        from nekton_spark.registry import PROCESSORS

        d = synth_robots(spark.range(0, 6).select(F.col("id").alias("doc_id")))
        got = PROCESSORS["robots_filter"](d, agent="randombot").collect()
        verdicts = {r.doc_id % 6: r.robots_allowed for r in got}
        assert verdicts == {0: 1, 1: 0, 2: 1, 3: 0, 4: 1, 5: 1}
