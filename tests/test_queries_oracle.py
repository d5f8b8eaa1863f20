"""Driver-gate mirror: every REGISTRY query vs its DuckDB oracle at sf0.001.

Reproduces the driver's CORRECTNESS check locally (row count + schema +
order-insensitive value comparison) so oracle drift is caught before a round
ends. The crawl entries (no SQL twin) get the driver's weaker rows-only
check here; their semantics are covered by test_engine_parity.py.
"""

from __future__ import annotations

import duckdb
import pytest

from crawler_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows)


# the mini-crawl is exercised end-to-end by test_engine_parity; running it
# again here would double the suite's wall time for no new coverage
SQL_CHECKED = sorted(n for n, s in REGISTRY.items() if s.sql is not None)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    srows = [tuple(r) for r in df.collect()]
    res = duck.execute(spec.sql_text())
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(df.columns) == sorted(dcols), f"{name}: schema mismatch"
    assert _normalize(srows, df.columns) == _normalize(drows, dcols), (
        f"{name}: value mismatch ({len(srows)} vs {len(drows)} rows)"
    )


def test_registry_nonempty_results(spark):
    """Queries that must not silently degenerate to empty output."""
    for name in ["word_topk", "dedup_minhash_lsh", "knn_cosine", "frontier_ordering"]:
        assert len(REGISTRY[name].fn(spark, SF_DIR).head(1)) == 1, name


def test_spark_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 20


def test_registry_builders_are_lazy(spark):
    """No registry builder may EXECUTE anything while constructing its plan
    (VERDICT r1: tf_idf once ran a driver-side .count() mid-build — an extra
    scan and an eager action inside what should be pure plan algebra). The
    only jobs plan construction is allowed to launch are parquet
    schema-inference footer reads ('parquet at ...', 1 task); any action
    (count/collect/checkpoint) shows up under its own callsite name."""
    def sql_executions() -> int:
        # every DataFrame ACTION registers a SQL execution in the UI store;
        # parquet schema-inference footer reads do not
        return spark._jsparkSession.sharedState().statusStore().executionsCount()

    import time as _t

    # builders that deliberately localCheckpoint a shared intermediate
    # (shingles / simhash / IVF assignment feed 2+ consumers; without the
    # checkpoint the corpus is re-scanned and re-tokenized up to 4x). Under
    # AQE the checkpoint registers exactly ONE execution at build time.
    SHARERS = {
        "dedup_minhash_lsh", "dedup_minhash_k64", "dedup_ngram_jaccard",
        "dedup_simhash", "ann_ivf", "ann_ivf_probe2", "ann_neardup_blocked",
        "lm_surprisal",
        # the word/shingle stream feeds 2+ consumers in each of these
        "inverted_index", "bm25_topk", "dedup_jaccard_prefix",
        "winnow_dedup",
    }
    for name in SQL_CHECKED:
        if name in (
            "stream_politeness_gate", "stream_sessions", "dedup_clusters",
            "dedup_clusters_star", "training_keepset", "source_reputation",
            "corpus_shuffle", "pack_sequences", "kmeans", "kmeans_sizes",
            "ann_neardup_kmeans", "token_budget", "shard_assignment",
        ):
            continue  # run by design: a streaming job / an iterative
            # label-propagation loop with a convergence probe per round /
            # the distributed rank+cumsum offsets pass (one collect of a
            # row per partition is the operator's essence)
        before = sql_executions()
        REGISTRY[name].fn(spark, SF_DIR)
        _t.sleep(0.3)  # the status store is fed asynchronously
        ran = sql_executions() - before
        allowed = 1 if name in SHARERS else 0
        assert ran <= allowed, (
            f"{name}: plan construction ran {ran} SQL execution(s) "
            f"(allowed {allowed}) — a builder calls a redundant action "
            "(count/collect) instead of staying plan algebra"
        )


def test_percentile_approx_exact_mode_matches_quantile_disc(spark, duck):
    """session_stats_approx's oracle contract: with accuracy >= n, Spark's
    GK sketch (percentile_approx) returns exactly DuckDB's quantile_disc
    element — including awkward n/p where p*n is not integral."""
    from pyspark.sql import functions as F

    vals = [1.0, 2.0, 3.5, 7.0, 11.0, 13.0, 17.0]  # n=7, nothing integral
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    ps = [0.3, 0.5, 0.75, 0.95, 0.99]
    got = df.agg(F.percentile_approx("x", ps, 10**7)).collect()[0][0]
    duck.execute("CREATE OR REPLACE TABLE _pq(x DOUBLE)")
    duck.executemany("INSERT INTO _pq VALUES (?)", [(v,) for v in vals])
    want = [
        duck.execute(f"SELECT quantile_disc(x, {p}) FROM _pq").fetchone()[0]
        for p in ps
    ]
    assert got == want
