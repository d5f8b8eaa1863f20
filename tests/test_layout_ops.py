"""Round-4 continuation operators: site-template audit, DUST rule mining,
leakage-safe cluster split, Z-order layout — planted fixtures with known
answers (the registry oracle entries carry the full value checks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.dedup import template_segments
from crawler_spark.operators.hostscope import dust_rule_support
from crawler_spark.operators.ordering import zorder_expr
from crawler_spark.operators.pipeline import split_assign, split_by_cluster


def test_template_segments_planted(spark):
    tpl = "one two three four five"  # seg_len=5 -> exactly one template segment
    rows = [
        # host a: template on 3/4 docs (75% >= 25%, >= 2 docs) -> detected
        (0, "a", tpl + " unique alpha beta gamma delta"),
        (1, "a", tpl + " unique epsilon zeta eta theta"),
        (2, "a", tpl + " unique iota kappa lda mu"),
        (3, "a", "nothing shared here at all today then"),
        # host b: same text twice in ONE doc is 1 distinct doc -> min_docs=2 fails
        (4, "b", tpl + " " + tpl),
        (5, "b", "totally different words entirely everywhere now again ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["source"]: r.asDict()
        for r in template_segments(
            df, "doc_id", "text", "source", seg_len=5, min_docs=2, min_share_bp=2500
        ).collect()
    }
    assert out["a"]["n_template_segments"] == 1
    assert out["a"]["template_occurrences"] == 3
    assert out["a"]["n_docs"] == 4
    # b's repeated segment is within one doc only
    assert out["b"]["n_template_segments"] == 0
    assert out["b"]["template_share_bp"] == 0


def test_dust_rule_support_classifies_each_rule(spark):
    rows = [
        ("/relative/path",),
        ("http://www.ex.test/a",),
        ("http://ex.test:80/a",),
        ("http://ex.test/a#frag",),
        ("http://ex.test/a/",),
        ("http://ex.test/",),  # root slash is canonical, NOT trailing_slash
        ("http://ex.test/a?utm_source=x&gclid=y",),
        ("http://other.test/b?utm_source=z",),
        # the classic DUST junk params: uppercase and digit-bearing keys
        ("http://ex.test/c?PHPSESSID=abc&id2=5",),
        # scheme-aware default ports: 443 is default only for https, and
        # 80 on an https URL is NOT a default port (no rule may fire)
        ("https://ex.test:443/a",),
        ("https://ex.test:80/a",),
        # a key repeated within one URL counts once (per-URL support)
        ("http://dup.test/d?a=1&a=2",),
    ]
    df = spark.createDataFrame(rows, "href string")
    out = {r["rule"]: (r["support"], r["n_hosts"]) for r in dust_rule_support(df).collect()}
    assert out["relative"] == (1, 1)
    assert out["www"] == (1, 1)
    assert out["port80"] == (1, 1)
    assert out["port443"] == (1, 1)
    assert out["fragment"] == (1, 1)
    assert out["trailing_slash"] == (1, 1)
    assert out["param:utm_source"] == (2, 2)  # two hosts carry the param
    assert out["param:gclid"] == (1, 1)
    assert out["param:PHPSESSID"] == (1, 1)
    assert out["param:id2"] == (1, 1)
    assert out["param:a"] == (1, 1)  # ?a=1&a=2 is ONE firing URL
    assert "param:" not in str(set(out) - {
        "relative", "www", "port80", "port443", "fragment", "trailing_slash",
        "param:utm_source", "param:gclid", "param:PHPSESSID", "param:id2",
        "param:a",
    })


def test_split_by_cluster_never_straddles(spark):
    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    # 40 docs in 10 clusters of 4 (cluster = smallest member id)
    clusters = spark.createDataFrame(
        [(i, (i // 4) * 4) for i in range(40)], "doc long, cluster long"
    )
    out = split_by_cluster(docs, clusters, "doc_id")
    spans = (
        out.where(F.col("clustered"))
        .join(clusters.withColumnRenamed("doc", "doc_id"), "doc_id")
        .groupBy("cluster")
        .agg(F.countDistinct("split").alias("k"))
        .agg(F.max("k"))
        .first()[0]
    )
    assert spans == 1  # no cluster straddles splits
    # unclustered docs keep split_assign's per-doc assignment exactly
    solo = out.where(~F.col("clustered")).select("doc_id", "split")
    ref = split_assign(docs.where(F.col("doc_id") >= 40), "doc_id").select(
        "doc_id", F.col("split").alias("ref_split")
    )
    diff = solo.join(ref, "doc_id").where(F.col("split") != F.col("ref_split")).count()
    assert diff == 0


def test_zorder_expr_interleaves_and_orders(spark):
    # known value: x=3 -> bits at positions 1,3; y=1 -> position 0 => 0b1011
    row = spark.range(1).select(F.expr(zorder_expr("3", "1", bits=4)).alias("z")).first()
    assert row["z"] == 0b1011
    # locality: range-bucketing the z key bounds BOTH dims per bucket
    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    z = grid.select("x", "y", F.expr(zorder_expr("x", "y", bits=4)).alias("z"))
    buckets = (
        z.withColumn("b", F.expr("z >> 4"))  # 16 buckets of the 8-bit key
        .groupBy("b")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .agg(F.max("xs"), F.max("ys"))
        .first()
    )
    # each bucket is one 4x4 tile: both spans bounded at 3 (vs 15 unsharded)
    assert buckets[0] == 3 and buckets[1] == 3


def test_rendezvous_assign_minimal_disruption(spark):
    from crawler_spark.operators.hostscope import rendezvous_assign

    hosts = spark.createDataFrame(
        [(f"host{i}.test",) for i in range(200)], "host string"
    )
    both = rendezvous_assign(
        rendezvous_assign(hosts, 4, out_col="w4"), 5, out_col="w5"
    )
    rows = both.collect()
    moved = [r for r in rows if r["w4"] != r["w5"]]
    # HRW structural guarantee: movers can only move TO the new worker
    assert moved and all(r["w5"] == 4 for r in moved)
    # expectation 1/5 of hosts move; allow generous slack on 200 draws
    assert 0.08 <= len(moved) / 200 <= 0.35
    # assignment is total and in range at both sizes
    assert all(r["w4"] in range(4) and r["w5"] in range(5) for r in rows)


def test_bbit_minhash_estimates_bounds(spark):
    from crawler_spark.operators.dedup import (
        bbit_minhash_estimates,
        doc_shingles,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # identical
        (3, "alpha beta gamma delta epsilon zeta eta theta iota NOPE"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = doc_shingles(df, "doc_id", "text", n=3)
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "doc_a long, doc_b long")
    out = {(r["doc_a"], r["doc_b"]): r.asDict() for r in
           bbit_minhash_estimates(pairs, sh, k=16, b=2).collect()}
    ident = out[(1, 2)]
    # identical docs: every position matches at full width AND at b bits,
    # and both estimators return exactly 10000 bp
    assert ident["match_full"] == 16 and ident["match_bbit"] == 16
    assert ident["est_full_bp"] == 10000 and ident["est_bbit_bp"] == 10000
    near = out[(1, 3)]
    # b-bit agreement can only exceed full-width agreement (truncation
    # collides, never separates), and estimates stay in [0, 10000]
    assert near["match_bbit"] >= near["match_full"]
    assert 0 <= near["est_bbit_bp"] <= 10000
    assert 0 <= near["est_full_bp"] <= 10000


# -- property tests (engine-free: DuckDB evaluates the shared expression
# text; python md5 mirrors hash60's definition) ------------------------------

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st


def _deinterleave(z: int, bits: int = 16) -> tuple[int, int]:
    x = y = 0
    for i in range(bits):
        y |= ((z >> (2 * i)) & 1) << i
        x |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


@given(st.integers(0, 65535), st.integers(0, 65535))
@settings(max_examples=200, deadline=None)
def test_zorder_expr_is_bijective(x, y):
    (z,) = duckdb.sql(f"SELECT {zorder_expr(str(x), str(y))}").fetchone()
    assert _deinterleave(z) == (x, y)
    # tile recursion: dropping 2 z-bits is interleaving the halved keys —
    # the property that makes z-range scans equal quad-tree tiles
    (z2,) = duckdb.sql(
        f"SELECT {zorder_expr(str(x // 2), str(y // 2))}"
    ).fetchone()
    assert z >> 2 == z2


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rdv(host: str, n: int) -> int:
    scores = [_hash60(f"{host}#{w}") for w in range(n)]
    return scores.index(max(scores))


@given(st.text(alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
               min_size=1, max_size=40),
       st.integers(2, 12))
@settings(max_examples=300, deadline=None)
def test_rendezvous_property_minimal_disruption(host, n):
    """HRW invariant for ANY host string and worker count: growing n -> n+1
    either keeps the assignment or moves it to the NEW worker only."""
    before, after = _rdv(host, n), _rdv(host, n + 1)
    assert after == before or after == n
