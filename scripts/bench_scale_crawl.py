"""Engine-level scale bench: crawl a Spark-generated corpus end to end.

bench.py measures the round's CORE ops (politeness top-k, dedup anti-join)
in isolation; this script runs the WHOLE round pipeline — robots join,
politeness, global sequencing, fetch join, span extraction regexes, word
frequencies, link discovery + canonicalization pandas UDFs, dedup, frontier
rewrite, snapshot commit — on a corpus of 10^5+ pages generated JVM-side
(sources/corpus_spark.py; no driver data).

Usage: python scripts/bench_scale_crawl.py [hosts] [pages_per_host] [rounds] [curate_shards]
Prints one JSON line with per-round metrics and pages/sec. A non-zero 4th
arg additionally times the end-to-end curation leg (pipeline.curate_crawl:
catalog -> keepset filters -> size-balanced shards on disk) over the
just-committed catalog and reports wall seconds, keep/drop rates, and
shard balance (VERDICT r3 #7).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    curate_shards = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from crawler_spark.config import CrawlConfig
    from crawler_spark.plans.engine import run_crawl
    from crawler_spark.sources.corpus_spark import corpus_df, seed_urls, sitemap_docs_df
    from crawler_spark.sparkutils import get_spark

    spark = get_spark("crawl-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    docs = corpus_df(spark, hosts=hosts, pages_per_host=pages)
    # every 3rd host has rules; a decoy specific-agent group exercises the
    # engine's per-round group selection (dropped for the default '*' UA)
    robots = spark.createDataFrame(
        [
            row
            for h in range(0, hosts, 3)
            for row in (
                (f"host{h}.test", "*", "/private", False, 0.5, 0),
                (f"host{h}.test", "otherbot", "/", False, None, 1),
            )
        ],
        "host string, user_agent string, path_prefix string, allow boolean,"
        " crawl_delay double, rule_order int",
    )
    seeds = seed_urls(hosts, every=2)
    # S3/S4 leg at scale: one sitemap per 8th host, 20 locs each
    sitemaps = sitemap_docs_df(spark, hosts, pages)

    workdir = tempfile.mkdtemp(prefix="crawl-scale-", dir="/dev/shm")
    cfg = CrawlConfig(
        max_pages=hosts * pages,
        max_rounds=rounds,
        max_depth=6,
        n_host_buckets=64,
        horizon=30.0,
    )
    t0 = time.time()
    summary = run_crawl(spark, workdir, docs, robots, seeds, cfg, sitemaps_df=sitemaps)
    wall = time.time() - t0
    scheduled = summary["scheduled_total"]
    out = {
        "corpus_pages": hosts * pages,
        "seeds": len(seeds),
        "rounds": [
            {k: r[k] for k in ("round", "scheduled", "completed", "fresh")}
            for r in summary["rounds"]
        ],
        "stopped": summary["stopped"],
        "scheduled_total": scheduled,
        "wall_sec": round(wall, 1),
        "pages_per_sec": round(scheduled / wall, 1),
    }
    if curate_shards:
        from crawler_spark.operators.pipeline import curate_crawl

        t1 = time.time()
        card = curate_crawl(
            spark, workdir, os.path.join(workdir, "curated"), curate_shards
        )
        cwall = time.time() - t1
        sizes = [s["total_chars"] for s in card["shards"]]
        out["curate"] = {
            "wall_sec": round(cwall, 1),
            "kept": card["kept"],
            "dropped": card["dropped"],
            "docs_per_sec": round(card["kept"] / cwall, 1),
            "n_shards": card["n_shards"],
            "shard_chars_min": min(sizes) if sizes else 0,
            "shard_chars_max": max(sizes) if sizes else 0,
            "shard_balance_pct": (
                round((max(sizes) - min(sizes)) / max(sizes) * 100, 2)
                if sizes and max(sizes)
                else 0.0
            ),
        }
    shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
