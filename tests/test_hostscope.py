"""hostscope operator unit tests — PSL edge cases, EWMA contract, salt
sizing, SURT ordering/locality."""

from pyspark.sql import functions as F

from crawler_spark.operators.hostscope import (
    _EWMA_WEIGHTS,
    adaptive_delay,
    cdx_shards,
    frontier_skew,
    surt_key,
    with_registered_domain,
)


def _regdom(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    rows = with_registered_domain(df).collect()
    return {r["host"]: (r["registered_domain"], r["public_suffix"]) for r in rows}


def test_registered_domain_psl_cases(spark):
    got = _regdom(
        spark,
        [
            "www.example.co.uk",   # multi-label suffix under a subdomain
            "example.co.uk",       # exactly suffix + 1
            "co.uk",               # IS a public suffix -> no registrable part
            "a.b.example.com",     # deep subdomain chain
            "myblog.blogspot.com", # private-domain suffix (blogspot.com)
            "blogspot.com",        # the private suffix itself
            "foo.bar.s3.amazonaws.com",  # 3-label suffix
            "example.unknowntld",  # implicit "*": last label is the suffix
            "unknowntld",          # bare single label -> no registrable part
            "localhost",           # same
        ],
    )
    assert got["www.example.co.uk"] == ("example.co.uk", "co.uk")
    assert got["example.co.uk"] == ("example.co.uk", "co.uk")
    assert got["co.uk"] == (None, "co.uk")
    assert got["a.b.example.com"] == ("example.com", "com")
    assert got["myblog.blogspot.com"] == ("myblog.blogspot.com", "blogspot.com")
    assert got["blogspot.com"] == (None, "blogspot.com")
    assert got["foo.bar.s3.amazonaws.com"] == (
        "bar.s3.amazonaws.com",
        "s3.amazonaws.com",
    )
    assert got["example.unknowntld"] == ("example.unknowntld", "unknowntld")
    assert got["unknowntld"] == (None, "unknowntld")
    assert got["localhost"] == (None, "localhost")


def _psl_reference(host):
    """Pure-Python PSL longest-match reference (same embedded suffix set)."""
    from crawler_spark.operators.hostscope import PUBLIC_SUFFIXES

    labels = host.split(".")
    n = len(labels)
    suf = labels[-1]
    for k in (1, 2, 3):
        if n >= k and ".".join(labels[n - k:]) in PUBLIC_SUFFIXES:
            suf = ".".join(labels[n - k:])
    sn = len(suf.split("."))
    if n > sn:
        return labels[n - sn - 1] + "." + suf, suf
    return None, suf


def test_registered_domain_differential(spark):
    """2000 seeded pseudo-random hosts vs the pure-Python PSL reference —
    one Spark job, every (registered_domain, public_suffix) pair equal."""
    import random

    from crawler_spark.operators.hostscope import PUBLIC_SUFFIXES

    rng = random.Random(1234)
    parts = ["www", "a", "cdn", "x9", "blog", "example", "co", "uk", "com",
             "github", "io", "s3", "amazonaws", "svc"]
    hosts = []
    for _ in range(2000):
        n = rng.randint(1, 5)
        if rng.random() < 0.4:  # end on a known suffix half the time
            tail = rng.choice(PUBLIC_SUFFIXES)
            head = [rng.choice(parts) for _ in range(rng.randint(0, 3))]
            hosts.append(".".join(head + [tail]))
        else:
            hosts.append(".".join(rng.choice(parts) for _ in range(n)))
    expected = {h: _psl_reference(h) for h in set(hosts)}
    df = spark.createDataFrame([(h,) for h in set(hosts)], ["host"])
    got = {
        r["host"]: (r["registered_domain"], r["public_suffix"])
        for r in with_registered_domain(df).collect()
    }
    assert got == expected


def test_registered_domain_dim_parity(spark):
    """The broadcast-dim PSL path (production: full 9k-rule snapshot)
    matches the literal-map path bit-for-bit, and its plan broadcasts."""
    from crawler_spark.operators.hostscope import (
        PUBLIC_SUFFIXES,
        with_registered_domain_dim,
    )

    hosts = [
        "www.example.co.uk", "example.co.uk", "co.uk", "a.b.example.com",
        "myblog.blogspot.com", "blogspot.com", "foo.bar.s3.amazonaws.com",
        "example.unknowntld", "unknowntld", "localhost", "x.y.z.github.io",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    dim = spark.createDataFrame([(s,) for s in PUBLIC_SUFFIXES], ["suffix"])
    got = with_registered_domain_dim(df, dim)
    want = with_registered_domain(df)
    key = lambda rows: sorted(  # noqa: E731
        (r["host"], r["registered_domain"], r["public_suffix"]) for r in rows
    )
    assert key(got.collect()) == key(want.collect())
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_adaptive_delay_contract(spark):
    # one host, 10 fetches: only the last 8 count, newest weighted 4^7
    rows = [("h", i, 100 * (i + 1)) for i in range(10)]  # latency 100..1000
    df = spark.createDataFrame(rows, ["host", "fetch_id", "latency_ms"]).withColumn(
        "ts", F.col("fetch_id").cast("long")
    )
    out = adaptive_delay(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_obs"] == 8
    lat_by_age = [100 * (10 - a) for a in range(8)]  # age 0 = newest = 1000
    wx = sum(w * x for w, x in zip(_EWMA_WEIGHTS, lat_by_age))
    sw = sum(_EWMA_WEIGHTS)
    assert r["ewma_ms_milli"] == wx * 1000 // sw
    assert r["delay_ms"] == min(5000, max(100, 2 * wx // sw))


def test_adaptive_delay_clamps(spark):
    rows = [("fast", 0, 1), ("fast", 1, 2), ("slow", 0, 9000), ("slow", 1, 9500)]
    df = spark.createDataFrame(rows, ["host", "fetch_id", "latency_ms"]).withColumn(
        "ts", F.col("fetch_id").cast("long")
    )
    got = {r["host"]: r["delay_ms"] for r in adaptive_delay(df).collect()}
    assert got["fast"] == 100  # clamped up to the politeness floor
    assert got["slow"] == 5000  # clamped down to the ceiling


def test_frontier_skew_salt_sizing(spark):
    # 64 urls on hot + 64 spread over 64 hosts; 8 partitions -> ideal 16
    rows = [("hot",)] * 64 + [(f"t{i}",) for i in range(64)]
    df = spark.createDataFrame(rows, ["host"])
    out = {r["host"]: r for r in frontier_skew(df, n_partitions=8).collect()}
    hot = out["hot"]
    assert hot["salt_factor"] == 4  # ceil(64 / ceil(128/8)) = ceil(64/16)
    assert hot["share_bp"] == 64 * 10000 // 128
    # tail hosts are each 1/128 = 78bp < the 100bp reporting floor
    assert set(out) == {"hot"}


def test_drain_forecast(spark):
    from crawler_spark.operators.hostscope import drain_forecast

    queue = spark.createDataFrame(
        [("slow", 100), ("fast", 100), ("unseen", 10)], ["host", "pending_n"]
    )
    delays = spark.createDataFrame(
        [("slow", 5000), ("fast", 100)], ["host", "delay_ms"]
    )
    out = {r["host"]: r for r in drain_forecast(queue, delays, round_seconds=10).collect()}
    assert out["slow"]["slots_per_round"] == 2  # 10000 // 5000
    assert out["slow"]["rounds_to_drain"] == 50
    assert out["fast"]["slots_per_round"] == 100
    assert out["fast"]["rounds_to_drain"] == 1
    assert out["unseen"]["delay_ms"] == 500  # default-delay fallback
    assert out["unseen"]["rounds_to_drain"] == 1  # 10 urls, 20 slots
    # the polite slow host pins the wave
    assert [h for h, r in out.items() if r["critical"] == 1] == ["slow"]


def test_surt_key_and_shard_locality(spark):
    df = spark.createDataFrame(
        [("https://www.example.com/a?b=1",)], ["url"]
    ).select(surt_key(F.col("url")).alias("k"))
    assert df.collect()[0]["k"] == "com,example,www)/a?b=1"
    # 4 hosts x 8 urls, 4 shards: SURT sharding gives 1 host per shard
    rows = [
        (f"https://h{h}.test/p{i}", f"h{h}.test")
        for h in range(4)
        for i in range(8)
    ]
    urls = spark.createDataFrame(rows, ["url", "host"])
    out = cdx_shards(urls, n_shards=4).collect()
    assert [r["shard"] for r in out] == [0, 1, 2, 3]
    assert all(r["n_urls"] == 8 for r in out)
    assert all(r["surt_hosts"] == 1 for r in out)
    assert sum(r["hash_hosts"] or 0 for r in out) >= 4  # hash scatters hosts
