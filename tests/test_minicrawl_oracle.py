"""The unrolled-crawl DuckDB twin vs the pure-Python oracle simulator.

Closes the triangle for the flagship registry entries: the engine is pinned
to the simulator by tests/test_engine_parity.py, and this suite pins the
DuckDB SQL (what the external driver runs) to the same simulator — all three
executors of the deterministic round contract must agree. No SparkSession
needed, so this runs in seconds.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from crawler_spark.minicrawl_oracle import (
    HOSTS,
    MAX_PAGES,
    MAX_ROUNDS,
    PAGES_PER_HOST,
    SEED,
    sql_crawl_media_features,
    sql_crawl_order_mini,
)
from crawler_spark.sources.corpus import gen_corpus
from oracle.simulator import CrawlSimulator, SimConfig

pytestmark = pytest.mark.engine  # split: see pytest.ini


@pytest.fixture(scope="module")
def sim_result():
    docs, seeds, robots = gen_corpus(
        hosts=HOSTS, pages_per_host=PAGES_PER_HOST, seed=SEED
    )
    res = CrawlSimulator(
        docs, seeds, robots, SimConfig(max_pages=MAX_PAGES, max_rounds=MAX_ROUNDS)
    ).run()
    return docs, res


def test_sql_crawl_order_matches_simulator(sim_result):
    _, res = sim_result
    expected = sorted(res.crawl_order)
    got = sorted(
        (int(r), int(s), c)
        for r, s, c in duckdb.connect().execute(sql_crawl_order_mini()).fetchall()
    )
    assert len(got) > 0
    assert got == expected


def test_sql_crawl_media_features_matches_simulator(sim_result):
    docs, res = sim_result
    spans_by_doc = {d["doc_id"]: d["spans"] for d in docs}
    expected = []
    for canon, e in res.frontier.items():
        if e.status != "completed":
            continue
        media = [
            s
            for s in sorted(spans_by_doc[canon], key=lambda s: s["offset"])
            if s["kind"] == "media"
        ]
        for pos, s in enumerate(media):
            dig = hashlib.md5(s["media_ref"].encode()).digest()
            expected.append(
                (
                    e.round_completed,
                    canon,
                    pos,
                    s["media_ref"],
                    dig[0],
                    dig[1],
                    round(sum(dig) / 16, 4),
                )
            )
    expected.sort()
    got = sorted(
        (int(r), c, int(p), m, int(w), int(h), float(mb))
        for r, c, p, m, w, h, mb in duckdb.connect()
        .execute(sql_crawl_media_features())
        .fetchall()
    )
    assert len(got) > 0
    assert got == expected


def test_sim_exercises_every_contract_branch(sim_result):
    """The fixture corpus must actually hit the paths the SQL unrolls:
    retries (failures), robots skips, multiple rounds, discoveries."""
    _, res = sim_result
    statuses = {e.status for e in res.frontier.values()}
    assert "completed" in statuses
    assert "skipped" in statuses  # robots-denied rows exist
    assert res.rounds_run >= 3
    assert any(e.attempts > 0 for e in res.frontier.values())  # retry path
    assert any(e.parent is not None for e in res.frontier.values())  # discovery
