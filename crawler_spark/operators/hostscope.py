"""Host-scoped frontier governance — registered domains, adaptive delay,
key-skew audit, SURT index sharding.

The reference scopes every crawl-policy decision to the raw hostname
(url_management/queue.py keys politeness and budgets on netloc). At
10^10-URL scale four host-level controls become load-bearing that a
few-hundred-page crawl never exercises; each is a small exact-integer
operator here so the DuckDB oracle can value-hash it:

* ``with_registered_domain`` — eTLD+1 (publicsuffix.org semantics) so
  budgets and blocklists bind ``*.blogspot.com``-style subdomain farms to
  ONE owner instead of handing every subdomain a fresh budget.
* ``adaptive_delay`` — per-host crawl delay from OBSERVED fetch latency
  (truncated exponential weighting), the Heritrix-style backpressure that
  replaces a global constant delay once hosts number in the millions.
* ``frontier_skew`` — the pre-flight key-skew audit that sizes the salt
  factor for the fetch join (plans/round.py J8 takes the salt as a knob;
  this is where the number comes from).
* ``surt_keys`` / ``cdx_shards`` — SURT-ordered index sharding (the
  CommonCrawl CDX convention: host labels reversed, so one registered
  domain's URLs are contiguous), with a locality measurement against hash
  sharding.

Scale shape: registered-domain extraction is pure expression work (a
literal map over the embedded suffix set — whole-stage codegen, zero
shuffle; a full 9k-entry publicsuffix.org snapshot would swap in one
broadcast dim joined three times, still zero shuffle). adaptive_delay is
one host-partitioned window + one groupBy(host). frontier_skew is one
groupBy(host). cdx_shards rides the two-phase global prefix sum
(ordering.with_global_seq — one row per partition to the driver).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# -- registered domain (eTLD+1) ----------------------------------------------

# Embedded subset of the Mozilla Public Suffix List (publicsuffix.org,
# public domain dedication for the list data). A production deployment
# ships the full ~9k-rule snapshot as a broadcast dimension; the algorithm
# below (longest-suffix match, implicit "*" fallback to the last label) is
# the PSL algorithm minus wildcard/exception rules, which the subset does
# not need. Ordered longest-first only for readability.
PUBLIC_SUFFIXES: tuple[str, ...] = (
    # three-label
    "s3.amazonaws.com",
    # two-label
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "co.in", "co.kr", "com.cn",
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    # one-label
    "com", "org", "net", "edu", "gov", "mil", "int",
    "io", "dev", "app", "info", "biz", "xyz",
)

_MAX_SUFFIX_LABELS = 3


def _suffix_of(host: Column) -> Column:
    """Longest matching public suffix of ``host`` (PSL longest-match rule;
    no match -> the last label, the PSL implicit ``*`` rule)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    members = F.array(*[F.lit(s) for s in PUBLIC_SUFFIXES])
    # greatest(..., 1): slice start must stay positive even when n < k (the
    # n >= k guard below does NOT short-circuit expression evaluation)
    cand = {
        k: F.array_join(
            F.slice(labels, F.greatest(n - (k - 1), F.lit(1)), k), "."
        )
        for k in range(_MAX_SUFFIX_LABELS, 0, -1)
    }
    out = F.element_at(labels, -1)  # implicit "*" fallback
    for k in sorted(cand):  # shortest first; later (longer) wins the chain
        out = F.when(
            (n >= k) & F.array_contains(members, cand[k]), cand[k]
        ).otherwise(out)
    return out


def with_registered_domain(
    df: DataFrame, host_col: str = "host", out_col: str = "registered_domain"
) -> DataFrame:
    """Add the eTLD+1 column: the public suffix plus ONE preceding label.

    A host that IS a public suffix (or a bare single label) has no
    registrable part -> NULL, matching the PSL contract. Pure expression —
    no join, no shuffle, stays inside whole-stage codegen.
    """
    host = F.col(host_col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    suf = _suffix_of(host)
    suf_n = F.size(F.split(suf, r"\."))
    reg = F.concat(F.element_at(labels, -(suf_n + 1)), F.lit("."), suf)
    return df.withColumn(
        out_col, F.when(n > suf_n, reg).otherwise(F.lit(None).cast("string"))
    ).withColumn("public_suffix", suf)


def with_registered_domain_dim(
    df: DataFrame,
    suffixes: DataFrame,
    host_col: str = "host",
    out_col: str = "registered_domain",
) -> DataFrame:
    """The production-PSL variant of :func:`with_registered_domain`: the
    suffix set arrives as a DataFrame dimension (``suffix`` string column —
    the full ~9k-rule publicsuffix.org snapshot, refreshed out-of-band)
    instead of a compiled-in literal.

    Plan shape: THREE broadcast left joins (one per candidate label count,
    each against the dim pre-filtered to that label count) and a coalesce —
    no shuffle on the fact side, no explode. Matches the literal-map path
    bit-for-bit on any suffix set (pinned by test_hostscope parity)."""
    host = F.col(host_col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    dim = suffixes.select(
        F.col("suffix"), F.size(F.split("suffix", r"\.")).alias("_k")
    )
    out = df.withColumn("_n", n)
    matched = []
    for k in range(1, _MAX_SUFFIX_LABELS + 1):
        cand = F.array_join(F.slice(labels, F.greatest(n - (k - 1), F.lit(1)), k), ".")
        col = f"_m{k}"
        side = F.broadcast(
            dim.where(F.col("_k") == k).select(F.col("suffix").alias(col))
        )
        out = out.join(
            side, (F.col("_n") >= k) & (cand == F.col(col)), "left"
        )
        matched.append(F.col(col))
    suf = F.coalesce(*reversed(matched), F.element_at(labels, -1))
    suf_n = F.size(F.split(suf, r"\."))
    reg = F.concat(
        F.element_at(F.split(F.col(host_col), r"\."), -(suf_n + 1)),
        F.lit("."),
        suf,
    )
    result = out.withColumn("public_suffix", suf).withColumn(
        out_col,
        F.when(F.col("_n") > suf_n, reg).otherwise(F.lit(None).cast("string")),
    )
    return result.drop("_n", *[f"_m{k}" for k in range(1, _MAX_SUFFIX_LABELS + 1)])


def etld1_budget(
    frontier: DataFrame, host_col: str = "host", total_budget: int = 10_000
) -> DataFrame:
    """Per-registered-domain budget rollup: URL mass, distinct-host fan-out,
    and the proportional page budget (integer apportionment, floor).

    The admission-control view a 10^10 frontier computes BEFORE handing
    budgets to hosts: a subdomain farm (thousands of hosts, one registered
    domain) gets one shared budget, not thousands. One groupBy(etld1).
    """
    d = with_registered_domain(frontier, host_col)
    # frontier total as a 1-row agg broadcast into the plan (the repo's
    # scalar-folding pattern: corpus_drift, drain_forecast) — NOT an eager
    # .count(), which would scan the frontier twice and fire a job at
    # plan-build time
    tot = d.agg(F.count(F.lit(1)).cast("long").alias("_tot"))
    return (
        d.groupBy("registered_domain", "public_suffix")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.countDistinct(host_col).cast("long").alias("n_hosts"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "registered_domain",
            "public_suffix",
            "n_urls",
            "n_hosts",
            F.expr("(n_urls * 10000) div _tot").alias("share_bp"),
            F.expr(f"(n_urls * {int(total_budget)}) div _tot").alias("page_budget"),
        )
        .orderBy("registered_domain")
    )


# -- adaptive politeness ------------------------------------------------------

# (3/4)^age scaled by 4^7 for age 0..7 — newest observation heaviest.
_EWMA_WINDOW = 8
_EWMA_WEIGHTS = tuple(3**a * 4 ** (7 - a) for a in range(_EWMA_WINDOW))


def adaptive_delay(
    fetches: DataFrame,
    host_col: str = "host",
    latency_col: str = "latency_ms",
    order_cols: tuple[str, ...] = ("ts", "fetch_id"),
    target_multiple: int = 2,
    min_delay_ms: int = 100,
    max_delay_ms: int = 5_000,
) -> DataFrame:
    """Per-host adaptive crawl delay from observed latency (Heritrix's
    delay-factor policy: wait ``target_multiple`` x the server's recent
    response time, clamped).

    Recency weighting is a TRUNCATED exponential — the last 8 observations
    with integer weights 3^age * 4^(7-age) (i.e. (3/4)^age in basis 4^7) —
    instead of a running EWMA, so the result is closed-form, exact in
    int64, and identical in the DuckDB oracle. ewma_ms_milli carries the
    weighted mean in milli-milliseconds:

        ewma_ms_milli = (sum w*x * 1000) div (sum w)       [over ages seen]
        delay_ms      = clamp((target_multiple * sum w*x) div (sum w),
                              min_delay_ms, max_delay_ms)

    One window (partitioned by host — no global sort) + one groupBy(host).
    """
    order = [F.col(c).desc() for c in order_cols]
    w = Window.partitionBy(host_col).orderBy(*order)
    weights = F.array(*[F.lit(v) for v in _EWMA_WEIGHTS])
    recent = (
        fetches.withColumn("_age", F.row_number().over(w) - 1)
        .where(F.col("_age") < _EWMA_WINDOW)
        .withColumn("_w", F.element_at(weights, F.col("_age") + 1).cast("long"))
    )
    agg = recent.groupBy(host_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(F.col("_w") * F.col(latency_col).cast("long")).alias("_wx"),
        F.sum("_w").alias("_sw"),
    )
    raw = F.expr(f"({target_multiple} * _wx) div _sw")
    return agg.select(
        F.col(host_col).alias("host"),
        "n_obs",
        F.expr("(_wx * 1000) div _sw").alias("ewma_ms_milli"),
        F.greatest(
            F.lit(min_delay_ms).cast("long"),
            F.least(F.lit(max_delay_ms).cast("long"), raw),
        ).alias("delay_ms"),
    )


def drain_forecast(
    queue: DataFrame,
    delays: DataFrame,
    host_col: str = "host",
    pending_col: str = "pending_n",
    round_seconds: int = 10,
    default_delay_ms: int = 500,
) -> DataFrame:
    """Politeness-constrained drain forecast per host — the capacity-planning
    query a 10^10 frontier runs before a crawl wave: with each host capped
    at one fetch per ``delay_ms`` (the :func:`adaptive_delay` output), how
    many rounds until its queue drains, and which host is the makespan
    driver (adding executors cannot finish the wave faster than the
    slowest POLITE host — the crawl-scheduling analog of Amdahl).

        slots_per_round = max(1, (round_seconds * 1000) div delay_ms)
        rounds_to_drain = ceil(pending_n / slots_per_round)
        critical        = 1 on the argmax host(s)

    Hosts with no observed latency fall back to ``default_delay_ms``. One
    host-keyed join (both sides are host-level aggregates — at 10^10 URLs
    that is ~10^7-8 rows, hash-partitioned on host) plus a one-row max
    broadcast for the critical flag. Exact integers throughout.
    """
    d = delays.select(
        F.col("host").alias("_dh"), F.col("delay_ms").alias("_delay")
    )
    q = queue.select(
        F.col(host_col).alias("host"), F.col(pending_col).cast("long").alias("pending_n")
    )
    j = q.join(d, q["host"] == d["_dh"], "left").select(
        "host",
        "pending_n",
        F.coalesce(F.col("_delay"), F.lit(default_delay_ms)).cast("long").alias("delay_ms"),
    )
    budget_ms = int(round_seconds) * 1000
    j = j.select(
        "host",
        "pending_n",
        "delay_ms",
        F.greatest(F.lit(1).cast("long"), F.expr(f"{budget_ms} div delay_ms")).alias(
            "slots_per_round"
        ),
    ).withColumn(
        "rounds_to_drain",
        F.expr("(pending_n + slots_per_round - 1) div slots_per_round"),
    )
    worst = j.agg(F.max("rounds_to_drain").alias("_w"))
    return (
        j.crossJoin(F.broadcast(worst))  # one-row scalar, broadcast
        .withColumn(
            "critical", (F.col("rounds_to_drain") == F.col("_w")).cast("int")
        )
        .drop("_w")
        .orderBy("host")
    )


# -- frontier key-skew audit --------------------------------------------------


def frontier_skew(
    frontier: DataFrame,
    host_col: str = "host",
    n_partitions: int = 32,
    min_share_bp: int = 100,
) -> DataFrame:
    """Hosts heavy enough to skew the fetch join, with the salt factor that
    levels them.

    ``salt_factor = ceil(n_urls / ceil(total / n_partitions))`` — how many
    salted sub-keys bring this host's largest task back to the mean task
    size. Feed the result to the J8 salted fetch join (plans/round.py);
    hosts under ``min_share_bp`` (default 1%) never need salt and are
    dropped so the audit's output stays broadcast-sized at any frontier
    size. One groupBy(host).
    """
    counts = frontier.groupBy(host_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_urls")
    )
    # lazy 1-row scalar (see etld1_budget): no second frontier scan, no
    # plan-build-time job; ideal task size derives in-plan from the total
    tot = frontier.agg(F.count(F.lit(1)).cast("long").alias("_tot"))
    p = int(n_partitions)
    ideal = f"((_tot + {p - 1}) div {p})"
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col(host_col).alias("host"),
            "n_urls",
            F.expr("(n_urls * 10000) div _tot").alias("share_bp"),
            F.expr(f"(n_urls + {ideal} - 1) div {ideal}").alias("salt_factor"),
        )
        .where(F.col("share_bp") >= min_share_bp)
        .orderBy(F.col("n_urls").desc(), "host")
    )


# -- SURT index sharding ------------------------------------------------------


def surt_key(url_col: Column) -> Column:
    """SURT form of a URL (the CommonCrawl CDX ordering convention):
    scheme dropped, host labels reversed and comma-joined, ``)`` before the
    path — ``https://www.example.com/a?b`` -> ``com,example,www)/a?b``.
    Pure expression."""
    rest = F.regexp_replace(url_col, r"^[a-z][a-z0-9+.-]*://", "")
    host = F.regexp_extract(rest, r"^([^/]*)", 1)
    path = rest.substr(F.length(host) + 1, F.lit(1 << 20))
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(rev, F.lit(")"), F.when(path == "", F.lit("/")).otherwise(path))


def cdx_shards(
    urls: DataFrame,
    url_col: str = "url",
    n_shards: int = 8,
    host_col: str = "host",
) -> DataFrame:
    """Assign each URL to a contiguous shard of the SURT-ordered index and
    measure the locality win: distinct hosts touched per shard under SURT
    order vs hash sharding.

    A CDX index is range-partitioned on the SURT key so one registered
    domain's URLs land in one shard (binary-searchable, and delta-encoding
    compresses runs of a shared prefix); hash sharding scatters every host
    across ALL shards. Output one row per shard id with both host counts —
    surt_hosts is the locality evidence (<< hash_hosts).

    Global order rides with_global_seq (two-phase prefix sum: one
    repartitionByRange + per-partition counts to the driver); the hash
    twin is a pure expression. One extra groupBy(shard) per flavor.
    """
    from crawler_spark.functions.hashing import hash60
    from crawler_spark.operators.ordering import carry_seq_cache, with_global_seq

    keyed = urls.withColumn("_surt", surt_key(F.col(url_col)))
    seq = with_global_seq(keyed, [F.col("_surt"), F.col(url_col)], seq_col="_seq")
    tot = seq._global_seq_total  # row count, free byproduct of the seq pass
    assigned = seq.select(
        F.col(host_col),
        F.expr(f"(_seq * {n_shards}) div {int(tot)}").alias("shard"),
        F.pmod(hash60(F.col(url_col)), F.lit(n_shards)).cast("long").alias("_hs"),
    )
    surt_side = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct(host_col).cast("long").alias("surt_hosts"),
    )
    hash_side = assigned.groupBy(F.col("_hs").alias("shard")).agg(
        F.countDistinct(host_col).cast("long").alias("hash_hosts")
    )
    out = surt_side.join(hash_side, "shard", "left").orderBy("shard")
    return carry_seq_cache(seq, out)


def dust_rule_support(links: DataFrame, href_col: str = "href") -> DataFrame:
    """DUST rule-support mining (Bar-Yossef, Keidar & Schwartz, WWW 2007,
    "Do Not Crawl in the DUST: Different URLs with Similar Text"), phase 1:
    count, over the RAW discovered-link space, how often each candidate
    URL-rewrite rule would fire — the evidence an operator reads before
    promoting a rule into the static canonicalizer (functions/urls.py F2/F3,
    reference url_management/normalizer.py). Phase 2 of DUST — validating a
    candidate by content equality of the rewritten pair — is
    :func:`crawler_spark.operators.dedup.exact_dedup` over fetched pages
    keyed by the rewritten URL.

    Candidate rules mined:
      - ``relative``        href needs base resolution (not a rewrite, but
                            sized here because it bounds the resolver stage)
      - ``www``             strip a leading ``www.`` host label
      - ``port80``          strip an explicit default port on an http URL
      - ``port443``         strip an explicit default port on an https URL
                            (scheme-aware pair: 80 is NOT the default for
                            https, so a rewrite justified by ``port80``
                            must never fire on ``https://h:80/``)
      - ``fragment``        strip a ``#fragment``
      - ``trailing_slash``  strip a non-root trailing slash
      - ``param:<k>``       strip query parameter ``k`` (one rule PER KEY —
                            DUST's parameter-exclusion rules; utm_*/gclid
                            support is what justifies the tracking-param
                            strip list)

    Returns (rule, support, n_hosts) — the number of URLs the rule fires
    on (each rule counts at most once per href, so ``?a=1&a=2`` adds 1 to
    ``param:a``, not 2) and distinct hosts (relative hrefs count under a
    '' host). Scale: one map-only rule expansion per link row (pure
    expressions, no UDF) and one aggregate keyed on the rule string — a
    few dozen groups no matter how many trillions of links.
    """
    h = F.col(href_col)
    is_abs = h.rlike("^https?://")
    path = F.regexp_extract(h, r"^https?://[^/?#]+([^?#]*)", 1)
    structural = F.array(
        F.when(~is_abs, F.lit("relative")),
        F.when(h.rlike(r"^https?://www\."), F.lit("www")),
        F.when(h.rlike("^http://[^/?#]*:80([/?#]|$)"), F.lit("port80")),
        F.when(h.rlike("^https://[^/?#]*:443([/?#]|$)"), F.lit("port443")),
        F.when(F.instr(h, "#") > 0, F.lit("fragment")),
        F.when(
            is_abs & F.endswith(path, F.lit("/")) & (F.length(path) > 1),
            F.lit("trailing_slash"),
        ),
    )
    params = F.transform(
        F.regexp_extract_all(h, F.lit("[?&]([A-Za-z0-9_.~%-]+)="), F.lit(1)),
        lambda k: F.concat(F.lit("param:"), k),
    )
    host = F.when(is_abs, F.regexp_extract(h, "^https?://([^/?#]+)", 1)).otherwise(
        F.lit("")
    )
    # array_distinct: support is per-URL ("how many URLs would this rule
    # rewrite"), so a key repeated within one query string counts once
    rules = F.array_distinct(F.array_compact(F.concat(structural, params)))
    return (
        links.select(host.alias("host"), F.explode(rules).alias("rule"))
        .groupBy("rule")
        .agg(
            F.count("*").cast("long").alias("support"),
            F.countDistinct("host").cast("long").alias("n_hosts"),
        )
    )


def rendezvous_assign(
    hosts: DataFrame, n_workers: int, host_col: str = "host", out_col: str = "worker"
) -> DataFrame:
    """Rendezvous (highest-random-weight) host -> crawler-worker assignment
    (Thaler & Ravishankar 1998; the consistent-assignment scheme UbiCrawler
    — Boldi et al. 2004 — uses so each host has exactly one fetching agent
    and agent failure/addition reassigns only that agent's share).

    worker(h) = argmax over w in [0, n_workers) of hash60(h || '#' || w) —
    a pure per-row expression (no table of workers, no shuffle, no UDF):
    the score array's first-maximum position in exact integer arithmetic,
    so the assignment is engine-portable and value-checkable. The
    politeness invariant rides on it at cluster scale: one host never
    fetches from two workers.

    Adding worker N leaves a host's assignment unchanged unless the new
    worker's hash beats ALL existing ones — in expectation exactly
    1/(N+1) of hosts move (measured by ``q_rendezvous_shards``'s oracle
    row), versus (N)/(N+1) under mod-N hashing.
    """
    from crawler_spark.functions.hashing import hash60

    # array-based argmax: build the score ARRAY once, then
    # array_position(arr, array_max(arr)). A comparison-chain argmax over
    # separate score columns does NOT survive Catalyst — projection collapse
    # inlines the md5 expression into every greatest()/comparison site,
    # O(n_workers^2) evaluations per row, pushing the generated code past
    # the whole-stage-codegen 64KB method limit (observed at n=9: codegen
    # fell back to interpreted). The array form evaluates the n hashes
    # twice at worst (array_max + array_position operands), independent of
    # n^2. array_position returns the FIRST occurrence (1-based), so ties
    # (impossible for md5-distinct inputs, but defined anyway) resolve to
    # the LOWEST worker id.
    arr = F.array(
        *[
            hash60(F.concat(F.col(host_col), F.lit(f"#{w}")))
            for w in range(n_workers)
        ]
    )
    pick = (F.array_position(arr, F.array_max(arr)) - 1).cast("long")
    return hosts.withColumn(out_col, pick)
