"""S2 robots.txt parsing: stdlib-fidelity of the rules table + first-match
decision, and the Spark parse surface."""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

import pytest

from crawler_spark.sources.robots import (
    parse_robots_df,
    parse_robots_entries,
    rules_for_agent,
)

SAMPLE = """
User-agent: *
Crawl-delay: 2
Allow: /private/open
Disallow: /private
Disallow: /tmp/

User-agent: special-bot
Disallow: /

User-agent: empty-bot
Disallow:
"""

PATHS = [
    "/", "/index.html", "/private", "/private/", "/private/open",
    "/private/open/doc1", "/private/area9", "/tmp/", "/tmp/x", "/tmpfile",
    "/a/b/c", "/priv", "/private2",
]


def _decide(rules, path: str) -> bool:
    """First-match decision over ordered rule dicts (engine/oracle twin)."""
    for r in sorted(rules, key=lambda r: r["rule_order"]):
        if path.startswith(r["path_prefix"]):
            return r["allow"]
    return True


@pytest.mark.parametrize("agent", ["*", "special-bot", "empty-bot"])
def test_first_match_equals_stdlib_can_fetch(agent):
    rfp = RobotFileParser()
    rfp.parse(SAMPLE.splitlines())
    rules = [r for r in parse_robots_entries(SAMPLE) if r["user_agent"] == agent]
    if agent != "*" and not rules:
        rules = [r for r in parse_robots_entries(SAMPLE) if r["user_agent"] == "*"]
    for path in PATHS:
        url = f"http://h.test{path}"
        assert _decide(rules, path) == rfp.can_fetch(agent, url), (agent, path)


def test_crawl_delay_and_empty_disallow():
    rules = parse_robots_entries(SAMPLE)
    star = [r for r in rules if r["user_agent"] == "*"]
    assert all(r["crawl_delay"] == 2.0 for r in star)
    # stdlib rewrites a bare "Disallow:" into an allow-everything rule
    empty = [r for r in rules if r["user_agent"] == "empty-bot"]
    assert len(empty) == 1 and empty[0]["allow"] and empty[0]["path_prefix"] in ("", "/")
    assert parse_robots_entries("") == []
    assert parse_robots_entries("garbage ###") == []


def test_parse_robots_df_and_agent_selection(spark):
    df = spark.createDataFrame(
        [("h1.test", SAMPLE), ("h2.test", "User-agent: *\nDisallow: /x\n")],
        ["host", "robots_txt"],
    )
    rules = parse_robots_df(df)
    per_host = {r["host"] for r in rules.select("host").distinct().collect()}
    assert per_host == {"h1.test", "h2.test"}
    star = rules_for_agent(rules, "crawler-spark")  # unknown agent -> '*' rows
    got = {
        (r["host"], r["path_prefix"], r["allow"], r["rule_order"])
        for r in star.collect()
    }
    assert ("h2.test", "/x", False, 0) in got
    assert all(not p.startswith("/priv") or h == "h1.test" for h, p, _, _ in got)
    special = rules_for_agent(rules, "special-bot").where("host = 'h1.test'").collect()
    assert [r["path_prefix"] for r in special] == ["/"]  # exact agent wins

def test_rules_for_agent_stdlib_substring_and_first_group(spark):
    """Case-insensitive substring match on the UA's first token; only the
    FIRST matching group applies (stdlib applies_to / first-entry)."""
    txt = (
        "User-agent: Crawler\nDisallow: /a\n\n"
        "User-agent: crawler\nDisallow: /b\n\n"  # second group for same agent: ignored
        "User-agent: *\nDisallow: /c\n"
    )
    df = spark.createDataFrame([("h.test", txt)], ["host", "robots_txt"])
    rules = parse_robots_df(df)
    got = rules_for_agent(rules, "Crawler-Spark/1.0")
    prefixes = sorted(r["path_prefix"] for r in got.collect())
    # 'crawler' (lowered) is a substring of 'crawler-spark' -> first matching
    # group only; '*' fallback not used; second group ignored
    assert prefixes == ["/a"]
    star = rules_for_agent(rules, "unrelated-bot")
    assert sorted(r["path_prefix"] for r in star.collect()) == ["/c"]


def test_percent_encoded_rule_matches_unquoted_canonical_path():
    """A rule with a percent-encodable char ('Disallow: /a b', stored
    quoted '/a%20b' by stdlib) must deny the canonical (UNQUOTED) path
    '/a b/x' exactly as stdlib can_fetch denies 'http://h/a%20b/x'."""
    txt = "User-agent: *\nDisallow: /a b\n"
    rfp = RobotFileParser()
    rfp.parse(txt.splitlines())
    assert rfp.can_fetch("*", "http://h.test/a%20b/x") is False
    rules = parse_robots_entries(txt)
    # prefixes are stored unquoted so the engine's unquoted canonical
    # path space matches stdlib's quoted-on-both-sides comparison
    assert rules[0]["path_prefix"] == "/a b"
    assert _decide(rules, "/a b/x") is False
    assert _decide(rules, "/ab/x") is True
