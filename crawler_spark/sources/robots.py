"""robots.txt parsing (SURVEY.md S2) — raw text -> ordered rules table.

The reference fetches robots.txt and delegates every decision to stdlib
``urllib.robotparser.RobotFileParser``
(/root/reference/src/crawler/url_management/robots.py:219-269, 56-133). This
module reproduces that contract in two layers:

1. ``parse_robots_entries`` (plain Python): runs the SAME stdlib parser over
   the text and flattens its entries into ordered rule rows
   (host, user_agent, path_prefix, allow, crawl_delay, rule_order) — stdlib
   semantics by construction, including the empty-``Disallow:``-means-allow
   rewrite and percent-quoting of rule paths.
2. ``parse_robots_df``: the Spark surface — an Arrow-batched pandas UDF
   applying (1) per host document, exploded into the rules table the round
   plan broadcasts (plans/round._robots_dims).

Decision semantics downstream (round plan + oracle simulator): for a host's
rules sorted by rule_order, the FIRST rule whose path_prefix prefixes the
URL path decides (allow/deny); no match or no rules = allow (fail-open,
robots.py:77-87). This is RobotFileParser.can_fetch's rule-iteration order
for a single user-agent group. Multi-agent files keep each group's rows
tagged with its user_agent; callers filter to their agent (exact match if
present, else '*'), mirroring stdlib's best-entry selection for
single-token agents.
"""

from __future__ import annotations

from urllib.parse import unquote
from urllib.robotparser import RobotFileParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RULES_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("user_agent", T.StringType(), False),
            T.StructField("path_prefix", T.StringType(), False),
            T.StructField("allow", T.BooleanType(), False),
            T.StructField("crawl_delay", T.DoubleType(), True),
            T.StructField("rule_order", T.IntegerType(), False),
            T.StructField("entry_id", T.IntegerType(), False),
        ]
    )
)


def parse_robots_entries(text: str) -> list[dict]:
    """Flatten stdlib-parsed robots.txt into ordered rule dicts."""
    if not text:
        return []
    rfp = RobotFileParser()
    try:
        rfp.parse(text.splitlines())
    except Exception:
        return []  # unparsable -> no rules -> fail-open allow
    out: list[dict] = []
    order = 0
    entries = list(rfp.entries)
    if rfp.default_entry is not None:
        entries.append(rfp.default_entry)
    for entry_id, entry in enumerate(entries):
        delay = float(entry.delay) if entry.delay is not None else None
        for agent in entry.useragents:
            for line in entry.rulelines:
                out.append(
                    {
                        "user_agent": agent,
                        # stdlib stores rule paths QUOTED and can_fetch
                        # quotes the URL path before matching; the engine's
                        # canonical paths are UNQUOTED (canonicalize_url),
                        # so unquote the prefix to put both sides in the
                        # same space — a quoted rule like 'Disallow: /a b'
                        # (stored '/a%20b') otherwise never matches and
                        # fails open. Narrowing vs stdlib: a rule that
                        # percent-encodes a RESERVED char (e.g. %2F) to
                        # mean the literal octet is conflated with the
                        # structural char after unquoting.
                        "path_prefix": unquote(line.path),
                        "allow": bool(line.allowance),
                        "crawl_delay": delay,
                        "rule_order": order,
                        "entry_id": entry_id,
                    }
                )
                order += 1
            if not entry.rulelines and delay is not None:
                # crawl-delay-only entry still matters for politeness
                out.append(
                    {
                        "user_agent": agent,
                        "path_prefix": "",
                        "allow": True,
                        "crawl_delay": delay,
                        "rule_order": order,
                        "entry_id": entry_id,
                    }
                )
                order += 1
    return out


def parse_robots_df(
    robots_txt: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> exploded ordered rules table (S2 Spark surface)."""

    @F.pandas_udf(RULES_SCHEMA)
    def _parse(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: [
                (
                    r["user_agent"], r["path_prefix"], r["allow"],
                    r["crawl_delay"], r["rule_order"], r["entry_id"],
                )
                for r in parse_robots_entries(t if isinstance(t, str) else "")
            ]
        )

    return (
        robots_txt.select(F.col(host_col).alias("host"), _parse(F.col(text_col)).alias("_rules"))
        .select("host", F.explode("_rules").alias("r"))
        .select(
            "host",
            F.col("r.user_agent").alias("user_agent"),
            F.col("r.path_prefix").alias("path_prefix"),
            F.col("r.allow").alias("allow"),
            F.col("r.crawl_delay").alias("crawl_delay"),
            F.col("r.rule_order").alias("rule_order"),
            F.col("r.entry_id").alias("entry_id"),
        )
    )


def rules_for_agent(rules: DataFrame, agent: str) -> DataFrame:
    """stdlib best-entry selection: per host, the rows of the FIRST entry
    whose agent token matches.

    RobotFileParser.Entry.applies_to lowercases both sides, takes the
    crawler UA's first token (before '/'), and substring-matches the robots
    token inside it; entries are checked in file order and only the first
    match applies ('*' entries parse into default_entry, which our parser
    appends last, so specific entries naturally win on rule_order). A second
    matching group for the same agent is ignored, like stdlib.
    """
    from pyspark.sql import Window

    a0 = agent.split("/")[0].lower()
    matching = rules.where(
        (F.col("user_agent") == "*")
        | F.lit(a0).contains(F.lower(F.col("user_agent")))
    )
    w = Window.partitionBy("host")
    return (
        matching.withColumn("_best", F.min("entry_id").over(w))
        .where(F.col("entry_id") == F.col("_best"))
        .drop("_best")
    )
