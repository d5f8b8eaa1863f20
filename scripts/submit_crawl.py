"""spark-submit entry point for the crawl engine (north_rule deployment path).

Package the library and run a crawl:

    cd /root/repo
    zip -r /tmp/crawler_spark.zip crawler_spark
    spark-submit --master local[32] \
        --conf spark.sql.shuffle.partitions=32 \
        --py-files /tmp/crawler_spark.zip \
        scripts/submit_crawl.py \
        --workdir /tmp/crawl-run --hosts 10 --pages-per-host 20 \
        --max-pages 500 --max-rounds 10

On a cluster, replace --master and point --workdir at shared storage; the
documents/robots inputs come from --documents/--robots parquet paths instead
of the synthetic generator. Resumable: rerunning with the same --workdir
continues from the last committed round (plans/engine.py X5).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser(description="Run (or resume) a frontier crawl")
    p.add_argument("--workdir", required=True, help="snapshot catalog root")
    p.add_argument("--documents", help="parquet path: interleaved-docs table (doc_id, spans)")
    p.add_argument(
        "--robots",
        help="parquet path: robots rules table (host, user_agent, path_prefix,"
        " allow, crawl_delay, rule_order) — rule_order is REQUIRED for hosts"
        " with multiple rules (first-match semantics); parse_robots_df emits it",
    )
    p.add_argument("--sitemaps", help="parquet path: sitemap XML docs (sitemap_ord, xml)")
    p.add_argument("--user-agent", default="*", help="robots group to obey")
    p.add_argument("--seeds", help="json file: [{url, priority, depth}, ...]")
    p.add_argument("--hosts", type=int, default=10, help="synthetic corpus: hosts")
    p.add_argument("--pages-per-host", type=int, default=20)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max-pages", type=int, default=1000)
    p.add_argument("--max-depth", type=int, default=3)
    p.add_argument("--max-rounds", type=int, default=50)
    p.add_argument("--host-buckets", type=int, default=16)
    args = p.parse_args()

    # spark-submit owns the session config (--master/--conf); only defaults
    # that matter for plan quality are set here, non-destructively
    spark = SparkSession.builder.appName("crawler-spark-submit").getOrCreate()
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
    }.items():
        spark.conf.set(k, v)

    from crawler_spark.config import CrawlConfig
    from crawler_spark.plans.engine import run_crawl

    if args.documents:
        documents_df = spark.read.parquet(args.documents)
        robots_df = (
            spark.read.parquet(args.robots)
            if args.robots
            else spark.createDataFrame(
                [],
                "host string, user_agent string, path_prefix string, "
                "allow boolean, crawl_delay double, rule_order int",
            )
        )
        with open(args.seeds) as f:
            seeds = json.load(f)
    else:
        from crawler_spark.sources.corpus import (
            gen_corpus,
            to_documents_df,
            to_robots_df,
        )

        documents, seeds, robots = gen_corpus(
            hosts=args.hosts, pages_per_host=args.pages_per_host, seed=args.seed
        )
        documents_df = to_documents_df(spark, documents)
        robots_df = to_robots_df(spark, robots)

    cfg = CrawlConfig(
        max_pages=args.max_pages,
        max_depth=args.max_depth,
        max_rounds=args.max_rounds,
        n_host_buckets=args.host_buckets,
        user_agent=args.user_agent,
    )
    sitemaps_df = spark.read.parquet(args.sitemaps) if args.sitemaps else None
    summary = run_crawl(
        spark, args.workdir, documents_df, robots_df, seeds, cfg,
        sitemaps_df=sitemaps_df,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
