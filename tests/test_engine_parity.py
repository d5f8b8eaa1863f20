"""Full-crawl parity: Spark engine vs pure-Python oracle simulator.

Golden invariants (SURVEY.md §5): crawl-order equality, URL-seen set
equality, per-page word-frequency equality, frontier status equality,
politeness invariant, dedup invariant, and kill-and-resume equivalence.
"""

import pytest

from crawler_spark.config import CrawlConfig
from crawler_spark.plans.engine import (
    read_crawl_order,
    read_frontier_statuses,
    read_url_seen,
    read_word_frequencies,
    run_crawl,
)
from crawler_spark.sources.corpus import gen_corpus, to_documents_df, to_robots_df
from oracle.simulator import CrawlSimulator, SimConfig

pytestmark = pytest.mark.engine  # split: see pytest.ini


CFG = dict(max_depth=2, max_pages=120, default_delay=1.0, horizon=30.0, max_rounds=12)


@pytest.fixture(scope="module")
def corpus():
    return gen_corpus(hosts=4, pages_per_host=12, seed=42)


@pytest.fixture(scope="module")
def oracle_result(corpus):
    documents, seeds, robots = corpus
    return CrawlSimulator(documents, seeds, robots, SimConfig(**CFG)).run()


@pytest.fixture(scope="module")
def engine_result(spark, corpus, tmp_path_factory):
    documents, seeds, robots = corpus
    workdir = str(tmp_path_factory.mktemp("crawl"))
    summary = run_crawl(
        spark,
        workdir,
        to_documents_df(spark, documents),
        to_robots_df(spark, robots),
        seeds,
        CrawlConfig(**CFG),
    )
    return workdir, summary


def test_crawl_order_equality(spark, engine_result, oracle_result):
    workdir, _ = engine_result
    got = read_crawl_order(spark, workdir)
    expected = oracle_result.crawl_order
    assert len(got) > 0
    assert got == expected


def test_url_seen_equality(spark, engine_result, oracle_result):
    workdir, _ = engine_result
    assert read_url_seen(spark, workdir) == oracle_result.url_seen


def test_word_frequencies_equality(spark, engine_result, oracle_result):
    workdir, _ = engine_result
    got = read_word_frequencies(spark, workdir)
    assert set(got) == set(oracle_result.word_freq)
    for url, freq in oracle_result.word_freq.items():
        assert got[url] == freq, url


def test_frontier_status_equality(spark, engine_result, oracle_result):
    workdir, _ = engine_result
    got = read_frontier_statuses(spark, workdir)
    expected = {c: e.status for c, e in oracle_result.frontier.items()}
    assert got == expected


def test_dedup_invariant(spark, engine_result):
    """url_seen has no duplicate canonical URLs; crawl order never repeats."""
    from crawler_spark.tables import SnapshotCatalog

    workdir, _ = engine_result
    seen_df = SnapshotCatalog(workdir).read(spark, "url_seen")
    assert seen_df.count() == seen_df.select("canonical").distinct().count()
    order = read_crawl_order(spark, workdir)
    urls = [c for (_, _, c) in order]
    # a URL may be scheduled again only as a retry (failure); completed URLs never repeat
    statuses = read_frontier_statuses(spark, workdir)
    completed = [u for u in urls if statuses.get(u) == "completed"]
    assert len(completed) == len(set(completed))


def test_politeness_invariant(spark, engine_result, corpus):
    """No host is scheduled more than floor(horizon/delay) times per round."""
    import math

    _, seeds, robots = corpus
    delays = {r["host"]: r["crawl_delay"] for r in robots if r["crawl_delay"] is not None}
    workdir, _ = engine_result
    order = read_crawl_order(spark, workdir)
    from crawler_spark.functions.urls import host_of

    per_round_host: dict = {}
    for rnd, _, canon in order:
        key = (rnd, host_of(canon))
        per_round_host[key] = per_round_host.get(key, 0) + 1
    for (rnd, host), n in per_round_host.items():
        d = delays.get(host, CFG["default_delay"])
        budget = (1 << 30) if d <= 0 else int(math.floor(CFG["horizon"] / d))
        assert n <= budget, (rnd, host, n, budget)


def test_resume_equivalence(spark, corpus, oracle_result, tmp_path_factory):
    """Stop after 2 rounds, resume with full budget -> identical final state."""
    documents, seeds, robots = corpus
    workdir = str(tmp_path_factory.mktemp("resume"))
    docs_df, robots_df = to_documents_df(spark, documents), to_robots_df(spark, robots)

    partial_cfg = CrawlConfig(**{**CFG, "max_rounds": 2})
    run_crawl(spark, workdir, docs_df, robots_df, seeds, partial_cfg)
    partial_order = read_crawl_order(spark, workdir)
    assert 0 < len(partial_order) < len(oracle_result.crawl_order)

    run_crawl(spark, workdir, docs_df, robots_df, seeds, CrawlConfig(**CFG))
    assert read_crawl_order(spark, workdir) == oracle_result.crawl_order
    assert read_url_seen(spark, workdir) == oracle_result.url_seen
    statuses = read_frontier_statuses(spark, workdir)
    assert statuses == {c: e.status for c, e in oracle_result.frontier.items()}


def test_fetch_ts_politeness_slots(spark, engine_result, corpus):
    """Virtual fetch times: same-host fetches within a round are spaced by
    at least the host's crawl_delay and stay inside the round horizon."""
    from crawler_spark.functions.urls import host_of
    from crawler_spark.tables import SnapshotCatalog

    _, seeds, robots = corpus
    delays = {r["host"]: r["crawl_delay"] for r in robots if r["crawl_delay"] is not None}
    workdir, _ = engine_result
    order = SnapshotCatalog(workdir).read(spark, "crawl_order")
    rows = order.select("round", "canonical", "fetch_ts").collect()
    by_host: dict = {}
    for r in rows:
        by_host.setdefault((r["round"], host_of(r["canonical"])), []).append(r["fetch_ts"])
    for (rnd, host), ts in by_host.items():
        ts.sort()
        d = delays.get(host, CFG["default_delay"])  # 0.0 = unlimited (reference semantics)
        t0 = rnd * CFG["horizon"]
        assert ts[0] == t0
        if d and d > 0:
            assert all(abs((b - a) - d) < 1e-9 or (b - a) >= d for a, b in zip(ts, ts[1:]))
            assert ts[-1] < t0 + CFG["horizon"]


def test_error_events_match_failures(spark, engine_result, oracle_result, corpus):
    """S10: one error row per failed fetch attempt; totals line up with the
    oracle's scheduled-minus-completed accounting. F8/F9: rejection error
    types appear exactly for scheduled docs with bad content-type/size."""
    from crawler_spark.tables import SnapshotCatalog

    workdir, _ = engine_result
    errors = SnapshotCatalog(workdir).read(spark, "errors")
    pages = SnapshotCatalog(workdir).read(spark, "pages")
    n_err = errors.count()
    n_failed_fetches = pages.where("NOT success").count()
    assert n_err == n_failed_fetches
    labels = {
        r["error_type"]
        for r in errors.select("error_type").distinct().collect()
    }
    assert labels <= {"fetch_failed", "content_type_rejected", "content_too_large"}
    # cross-check each rejection label against the corpus ground truth
    documents, _, _ = corpus
    meta = {d["doc_id"]: d for d in documents}
    for r in errors.select("canonical", "error_type").collect():
        d = meta.get(r["canonical"])
        if r["error_type"] == "fetch_failed":
            assert d is None
        elif r["error_type"] == "content_type_rejected":
            assert d is not None and "text/html" not in d["content_type"]
        else:  # content_too_large
            assert d is not None and "text/html" in d["content_type"]
            assert d["size_bytes"] > 10_485_760


def test_content_filter_fixtures_present(corpus):
    """The parity corpus actually exercises F8/F9: it contains at least one
    non-HTML doc and one oversized doc (otherwise the parity above is vacuous)."""
    documents, _, _ = corpus
    assert any("text/html" not in d["content_type"] for d in documents)
    assert any(d["size_bytes"] > 10_485_760 for d in documents)


def test_content_filter_parity_explicit(spark, tmp_path_factory):
    """F8/F9 end-to-end: a hand-built corpus where specific linked pages are
    non-HTML or oversized; engine and oracle agree on order, statuses, and
    the rejected pages never contribute words or links."""
    from crawler_spark.sources.corpus import to_documents_df, to_robots_df
    from oracle.simulator import CrawlSimulator, SimConfig

    def doc(url, links, content_type="text/html; charset=utf-8", size=1000):
        spans = [
            {"kind": "title", "text": "t", "media_ref": "", "offset": 0},
            {"kind": "text", "text": "alpha beta gamma", "media_ref": "", "offset": 1},
        ] + [
            {"kind": "link", "text": l, "media_ref": "", "offset": 2 + i}
            for i, l in enumerate(links)
        ]
        return {
            "doc_id": url, "spans": spans,
            "content_type": content_type, "size_bytes": size,
        }

    root = "http://hostf.test/"
    documents = [
        doc(root, ["/html", "/pdf", "/big", "/fine"]),
        doc("http://hostf.test/html", ["/late"]),
        doc("http://hostf.test/pdf", ["/never"], content_type="application/pdf"),
        doc("http://hostf.test/big", ["/never2"], size=20_000_000),
        doc("http://hostf.test/fine", []),
        doc("http://hostf.test/late", []),
    ]
    seeds = [{"url": root, "priority": 10, "depth": 0}]
    cfg = dict(max_depth=3, max_pages=50, default_delay=1.0, horizon=30.0, max_rounds=10)
    oracle = CrawlSimulator(documents, seeds, [], SimConfig(**cfg)).run()
    workdir = str(tmp_path_factory.mktemp("ctfilter"))
    run_crawl(
        spark, workdir, to_documents_df(spark, documents),
        to_robots_df(spark, []), seeds, CrawlConfig(**cfg),
    )
    assert read_crawl_order(spark, workdir) == oracle.crawl_order
    statuses = read_frontier_statuses(spark, workdir)
    assert statuses == {c: e.status for c, e in oracle.frontier.items()}
    # rejected pages retried to exhaustion -> failed; their links never enqueued
    assert statuses["http://hostf.test/pdf"] == "failed"
    assert statuses["http://hostf.test/big"] == "failed"
    seen = read_url_seen(spark, workdir)
    assert "http://hostf.test/never" not in seen
    assert "http://hostf.test/never2" not in seen
    # and they contribute no word frequencies
    wf = read_word_frequencies(spark, workdir)
    assert "http://hostf.test/pdf" not in wf
    assert "http://hostf.test/big" not in wf
    assert "http://hostf.test/fine" in wf


def test_link_classification_parity(spark, engine_result, oracle_result):
    """J4: per-link internal/external flags match the oracle's raw-netloc
    equality (processor.py:289-320), position by position."""
    from crawler_spark.tables import SnapshotCatalog

    workdir, _ = engine_result
    links = SnapshotCatalog(workdir).read(spark, "links")
    got: dict = {}
    for r in links.select("src", "link_pos", "is_internal").collect():
        got.setdefault(r["src"], {})[r["link_pos"]] = r["is_internal"]
    for src, flags in oracle_result.links_internal.items():
        assert got.get(src, {}) == dict(enumerate(flags)), src
    # the fixture exercises BOTH classes (www-variant spellings -> external)
    all_flags = [f for flags in oracle_result.links_internal.values() for f in flags]
    assert any(all_flags) and not all(all_flags)


def test_sitemap_parity(spark, tmp_path_factory):
    """S3/S4/E2: sitemap URLs enter the frontier at priority 3 / depth 1,
    before seeds in enqueue order (first-put-wins on collision), and
    interleave with priority-10 seeds and priority-5 discovered links in the
    crawl-ordering contract. Engine and oracle agree on the full order."""
    from crawler_spark.sources.corpus import gen_corpus, to_documents_df, to_robots_df
    from oracle.simulator import CrawlSimulator, SimConfig

    documents, seeds, robots = gen_corpus(hosts=4, pages_per_host=10, seed=7)
    locs0 = [
        "http://www.host0.test:80/page2",      # canonicalization-variant spelling
        "http://host0.test/page3?utm_source=x",
        "http://host1.test/",                   # collides with a seed -> sitemap wins
        "http://host2.test/private/area5",      # robots-disallowed path
        "http://host0.test/missing999999",      # fetch-miss path
        "http://host0.test/page2",              # duplicate within the sitemap
        "javascript:void(0)",                   # invalid -> dropped by both
    ]
    xml0 = "<urlset>" + "".join(
        f"<url><loc>{u}</loc></url>" for u in locs0
    ) + "</urlset>"
    xml1 = (
        "<urlset><url><loc>  http://host3.test/page4  </loc></url>"
        "<url><loc><![CDATA[http://host3.test/page5]]></loc></url></urlset>"
    )
    # non-default sitemap_priority: proves cfg.sitemap_priority/sitemap_depth
    # are threaded through BOTH engines (ADVICE r2 dead-knob fix). 4 < 5 ranks
    # sitemap rows BELOW discovered links — a genuinely different crawl order
    # than the default-3 case, so a dead knob would fail the order equality.
    cfg = dict(max_depth=2, max_pages=100, default_delay=1.0, horizon=30.0,
               max_rounds=10, sitemap_priority=4, sitemap_depth=1)
    oracle = CrawlSimulator(
        documents, seeds, robots, SimConfig(**cfg), sitemaps=[xml0, xml1]
    ).run()
    workdir = str(tmp_path_factory.mktemp("sitemap"))
    sitemaps_df = spark.createDataFrame(
        [(0, xml0), (1, xml1)], "sitemap_ord int, xml string"
    )
    run_crawl(
        spark, workdir, to_documents_df(spark, documents),
        to_robots_df(spark, robots), seeds, CrawlConfig(**cfg),
        sitemaps_df=sitemaps_df,
    )
    assert read_crawl_order(spark, workdir) == oracle.crawl_order
    assert read_url_seen(spark, workdir) == oracle.url_seen
    statuses = read_frontier_statuses(spark, workdir)
    assert statuses == {c: e.status for c, e in oracle.frontier.items()}
    # sitemap-only URLs really were crawled (CDATA/whitespace parse included)
    crawled = {c for (_, _, c) in oracle.crawl_order}
    assert "http://host3.test/page4" in crawled
    assert "http://host3.test/page5" in crawled
    # the colliding seed took the sitemap leg: depth 1, priority-3 class
    assert oracle.frontier["http://host1.test/"].depth == 1


def test_sitemap_cap(spark):
    """The max_pages//4 cap applies PER SITEMAP FILE (engine.py:662)."""
    from crawler_spark.sources.sitemap import sitemap_frontier_rows

    xml = "<urlset>" + "".join(
        f"<url><loc>http://h.test/p{i}</loc></url>" for i in range(30)
    ) + "</urlset>"
    df = spark.createDataFrame([(0, xml), (1, xml)], "sitemap_ord int, xml string")
    rows = sitemap_frontier_rows(df, max_urls=10).collect()
    assert len(rows) == 20
    assert all(r["sitemap_pos"] < 10 for r in rows)
    assert {r["priority"] for r in rows} == {3}
    assert {r["depth"] for r in rows} == {1}


def test_blocked_domain_parity(spark, corpus, tmp_path_factory):
    """F6 domain restriction: engine and oracle agree when a host is blocked."""
    from crawler_spark.sources.corpus import to_documents_df, to_robots_df
    from oracle.simulator import CrawlSimulator, SimConfig

    documents, seeds, robots = corpus
    blocked = ("host2.test",)
    cfg = {**CFG, "max_rounds": 6}
    oracle = CrawlSimulator(
        documents, seeds, robots, SimConfig(**cfg, blocked_domains=blocked)
    ).run()
    workdir = str(tmp_path_factory.mktemp("blocked"))
    run_crawl(
        spark,
        workdir,
        to_documents_df(spark, documents),
        to_robots_df(spark, robots),
        seeds,
        CrawlConfig(**cfg, blocked_domains=blocked),
    )
    got = read_crawl_order(spark, workdir)
    assert got == oracle.crawl_order
    # seeds are exempt (engine.py start_crawl has no domain check), but no
    # DISCOVERED host2 URL may appear
    from crawler_spark.functions.urls import host_of

    seed_canon = {c for (_, _, c) in got[: len(seeds)]}
    discovered_hosts = {host_of(c) for (_, _, c) in got if c not in seed_canon}
    assert "host2.test" not in discovered_hosts
    assert read_url_seen(spark, workdir) == oracle.url_seen


def test_multi_agent_robots_parity(spark, tmp_path_factory):
    """ADVICE r1: a robots table with a specific-agent group plus '*' rows is
    now group-selected INSIDE the engine (exact-agent-else-'*' per host) —
    engine and oracle agree for both a specific UA and the default, and the
    two agents genuinely see different crawls."""
    from crawler_spark.sources.corpus import gen_corpus, to_documents_df, to_robots_df
    from oracle.simulator import CrawlSimulator, SimConfig

    documents, seeds, robots = gen_corpus(hosts=3, pages_per_host=8, seed=11)
    robots = [r for r in robots if r["host"] != "host0.test"]
    robots += [
        # specific group: spider is banned from /page*; '*' group only bans /private
        {"host": "host0.test", "user_agent": "spider", "path_prefix": "/page",
         "allow": False, "crawl_delay": None, "rule_order": 0},
        {"host": "host0.test", "user_agent": "*", "path_prefix": "/private",
         "allow": False, "crawl_delay": None, "rule_order": 1},
    ]
    cfg = dict(max_depth=2, max_pages=80, default_delay=1.0, horizon=30.0, max_rounds=8)
    orders = {}
    for ua in ("spider/1.0", "*"):
        oracle = CrawlSimulator(
            documents, seeds, robots, SimConfig(**cfg, user_agent=ua)
        ).run()
        workdir = str(tmp_path_factory.mktemp(f"ua-{ua[0]}"))
        run_crawl(
            spark, workdir, to_documents_df(spark, documents),
            to_robots_df(spark, robots), seeds,
            CrawlConfig(**cfg, user_agent=ua),
        )
        assert read_crawl_order(spark, workdir) == oracle.crawl_order
        statuses = read_frontier_statuses(spark, workdir)
        assert statuses == {c: e.status for c, e in oracle.frontier.items()}
        orders[ua] = oracle.crawl_order
    assert orders["spider/1.0"] != orders["*"]
    # spider never crawls a host0 /page URL; '*' does
    spider_urls = {c for (_, _, c) in orders["spider/1.0"]}
    star_urls = {c for (_, _, c) in orders["*"]}
    assert not any(u.startswith("http://host0.test/page") for u in spider_urls)
    assert any(u.startswith("http://host0.test/page") for u in star_urls)


def test_parse_robots_df_feeds_engine(spark, tmp_path_factory):
    """S2 end-to-end: raw robots.txt parsed by the stdlib-parity pandas UDF
    (parse_robots_df, carrying entry_id) feeds run_crawl directly; the
    engine's rules_for_agent best-entry selection reproduces the oracle fed
    with equivalent hand-built per-agent rows — for both a specific UA and
    the default."""
    from crawler_spark.sources.corpus import gen_corpus, to_documents_df
    from crawler_spark.sources.robots import parse_robots_df
    from oracle.simulator import CrawlSimulator, SimConfig

    robots_txt = (
        "User-agent: spider\nDisallow: /page\n\n"
        "User-agent: *\nDisallow: /private\nCrawl-delay: 2\n"
    )
    hosts = ["host0.test", "host1.test", "host2.test"]
    txt_df = spark.createDataFrame(
        [(h, robots_txt) for h in hosts], "host string, robots_txt string"
    )
    rules_df = parse_robots_df(txt_df)
    documents, seeds, _ = gen_corpus(hosts=3, pages_per_host=8, seed=33)
    hand_rows = []
    for h in hosts:
        hand_rows += [
            {"host": h, "user_agent": "spider", "path_prefix": "/page",
             "allow": False, "crawl_delay": None, "rule_order": 0},
            {"host": h, "user_agent": "*", "path_prefix": "/private",
             "allow": False, "crawl_delay": 2.0, "rule_order": 1},
        ]
    cfg = dict(max_depth=2, max_pages=80, default_delay=1.0, horizon=30.0, max_rounds=8)
    orders = {}
    for ua in ("spider/1.0", "other/1.0"):
        oracle = CrawlSimulator(
            documents, seeds, hand_rows, SimConfig(**cfg, user_agent=ua)
        ).run()
        wd = str(tmp_path_factory.mktemp(f"rparse-{ua[0]}"))
        run_crawl(
            spark, wd, to_documents_df(spark, documents), rules_df, seeds,
            CrawlConfig(**cfg, user_agent=ua),
        )
        got = read_crawl_order(spark, wd)
        assert got == oracle.crawl_order, ua
        orders[ua] = got
    assert orders["spider/1.0"] != orders["other/1.0"]
