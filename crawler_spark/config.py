"""Crawl configuration (reference config/default.yaml + utils/config.py:31-57).

Mirrors oracle.simulator.SimConfig — keep field semantics in sync; tests run
both engines with identical values.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class CrawlConfig:
    max_depth: int = 3          # crawler.max_depth default (config.py:33)
    max_pages: int = 1000       # crawler.max_pages default (config.py:34)
    default_delay: float = 1.0  # rate_limit_delay default (config.py:35)
    horizon: float = 30.0       # virtual seconds per scheduling round
    max_rounds: int = 50        # driver loop guard (engine.py:284-298 analog)
    max_attempts: int = 3       # retry cap (queue.py:369)
    n_host_buckets: int = 16    # frontier partition buckets (4096 at 10^10 scale)
    # url_seen bucket count (bucketBy on (url_hash, canonical)); fixed at
    # init like an Iceberg bucket spec — 4096 at 10^10-URL scale, small here
    # so mini-crawl catalogs don't carry thousands of tiny files
    n_seen_buckets: int = 16
    salt_buckets: int = 8       # hot-host salting for the politeness window
    # F1/F6 domain restrictions (validator.py:239-251, engine.py:581-589):
    # blocked wins; a non-empty allowed tuple is exclusive
    allowed_domains: tuple = ()
    blocked_domains: tuple = ()
    # F8/F9 content filters (worker.py:235-264): a response whose
    # content-type contains none of these substrings, or whose size exceeds
    # max_page_size, raises ContentError -> the ordinary failure/retry path
    allowed_content_types: tuple = ("text/html",)
    max_page_size: int = 10_485_760  # content.max_page_size default
    # S3/S4 sitemap budget (engine.py:662): at most max_pages//4 sitemap URLs
    # are enqueued, at priority 3 / depth 1
    sitemap_priority: int = 3
    sitemap_depth: int = 1
    # F7 robots group selection (crawler.user_agent, config.py:36): which
    # user-agent's rule group applies; parse_robots_df output gets stdlib
    # best-entry selection, hand-built tables get exact-agent-else-'*'
    user_agent: str = "*"
