"""DuckDB SQL twin of the deterministic mini-crawl (VERDICT r3 #3/#4).

The flagship ``crawl_order_mini`` / ``crawl_media_features`` registry entries
run the REAL engine (plans/engine.run_crawl) over the fixed
``gen_corpus(hosts=3, pages_per_host=8, seed=42)`` corpus. Their correctness
was previously pinned only by the engine-vs-Python-simulator parity suite —
the driver saw a rows-only check. This module closes that hole by unrolling
the deterministic round contract (oracle/simulator.py:28-60) into ONE DuckDB
SQL statement, exactly as ``hits_scores``/``bpe_merges`` unrolled their
recurrences:

    robots first-prefix-match -> per-host politeness budget rank -> global
    seq cutoff -> fetch outcome (content-type/size) -> link extraction +
    canonicalization -> in-round first-occurrence dedup -> anti-join vs
    url_seen -> retry w/ backoff, repeated for max_rounds=6 rounds.

The corpus itself comes from Python's Mersenne-Twister (not expressible in
SQL), so :func:`mini_inputs_dir` materializes the three tiny input tables
(24 documents, 3 seeds, robots rules) to parquet with pyarrow — no Spark —
at a path keyed by the generator params + a digest of sources/corpus.py, and
the SQL reads them with ``read_parquet``. Everything downstream of those
inputs is recomputed independently inside DuckDB.

URL semantics (functions/urls.py F1-F3, T5) are re-expressed in SQL for the
URL shapes this corpus produces (absolute http, root-relative paths,
www./:80/tracking/fragment/trailing-slash variants, mailto:/tel:/javascript:
schemes, blocked extensions). Two documented narrowings vs the general
Python code, both vacuous here: query pairs are sorted as whole 'k=v'
strings (equals sort-by-key-then-value for the corpus's non-digit keys), and
pagination-param int normalization is skipped (no page/p/offset params in
the corpus). Any divergence would fail the driver's value-hash immediately.

Every per-round CTE is ``AS MATERIALIZED``: DuckDB inlines plain CTEs at
each reference, and the round recurrence references the previous round's
state several times — inlining would blow up exponentially in max_rounds.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import tempfile

# mini-crawl engine params — must match queries._mini_crawl_workdir
HOSTS = 3
PAGES_PER_HOST = 8
SEED = 42
MAX_PAGES = 60
MAX_ROUNDS = 6
HORIZON = 30.0
DEFAULT_DELAY = 1.0
MAX_DEPTH = 3
MAX_ATTEMPTS = 3
MAX_PAGE_SIZE = 10_485_760

_BLOCKED_EXT_RE = (
    r"\.(pdf|docx?|xlsx?|pptx?|zip|rar|tar|gz|7z|jpe?g|png|gif|bmp|svg|webp"
    r"|mp3|mp4|avi|mov|wmv|flv|exe|msi|dmg|deb|rpm)$"
)

_TRACKING = (
    "'utm_source','utm_medium','utm_campaign','utm_term','utm_content',"
    "'gclid','fbclid','msclkid','ref','referrer','_ga','_gid','sessionid',"
    "'jsessionid'"
)


def mini_inputs_dir() -> str:
    """Materialize the mini-corpus inputs as parquet for DuckDB; idempotent.

    pyarrow-only (the oracle side must not depend on Spark). The path digest
    covers the generator source file, so a corpus-generator change points the
    oracle at fresh inputs just as the Spark side's whole-package digest
    points the engine at a fresh catalog.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_spark.sources import corpus as corpus_mod
    from crawler_spark.sources.corpus import gen_corpus

    src_digest = hashlib.md5(
        pathlib.Path(corpus_mod.__file__).read_bytes()
    ).hexdigest()[:12]
    tag = f"h{HOSTS}-p{PAGES_PER_HOST}-s{SEED}-{src_digest}"
    d = os.path.join(tempfile.gettempdir(), f"crawler-spark-mini-oracle-{tag}")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    # atomic publish: build in a private dir, rename into place. Concurrent
    # importers (parallel pytest, bench + check_oracle) must never observe a
    # half-written parquet, and losers of the rename race discard their copy
    # (the content is deterministic, so any winner's output is equivalent).
    import shutil
    import uuid

    tmp = f"{d}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp)

    documents, seeds, robots = gen_corpus(
        hosts=HOSTS, pages_per_host=PAGES_PER_HOST, seed=SEED
    )

    span_t = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    doc_tbl = pa.table(
        {
            "doc_id": pa.array([x["doc_id"] for x in documents], pa.string()),
            "spans": pa.array(
                [
                    [
                        {
                            "kind": s["kind"],
                            "text": s["text"],
                            "media_ref": s["media_ref"],
                            "offset": s["offset"],
                        }
                        for s in x["spans"]
                    ]
                    for x in documents
                ],
                pa.list_(span_t),
            ),
            "content_type": pa.array(
                [x["content_type"] for x in documents], pa.string()
            ),
            "size_bytes": pa.array([x["size_bytes"] for x in documents], pa.int64()),
        }
    )
    seed_tbl = pa.table(
        {
            "ord": pa.array(range(len(seeds)), pa.int64()),
            "url": pa.array([s["url"] for s in seeds], pa.string()),
            "priority": pa.array([s["priority"] for s in seeds], pa.int64()),
            "depth": pa.array([s["depth"] for s in seeds], pa.int64()),
        }
    )
    robots_tbl = pa.table(
        {
            "host": pa.array([r["host"] for r in robots], pa.string()),
            "user_agent": pa.array([r["user_agent"] for r in robots], pa.string()),
            "path_prefix": pa.array([r["path_prefix"] for r in robots], pa.string()),
            "allow": pa.array([r["allow"] for r in robots], pa.bool_()),
            "crawl_delay": pa.array([r["crawl_delay"] for r in robots], pa.float64()),
            "rule_order": pa.array([r["rule_order"] for r in robots], pa.int64()),
        }
    )
    pq.write_table(doc_tbl, os.path.join(tmp, "documents.parquet"))
    pq.write_table(seed_tbl, os.path.join(tmp, "seeds.parquet"))
    pq.write_table(robots_tbl, os.path.join(tmp, "robots.parquet"))
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write("ok\n")
    try:
        os.rename(tmp, d)
    except OSError:
        if not os.path.exists(done):
            # stale partial dir from a crashed pre-atomic run blocks the
            # rename; replace it (worst case a concurrent writer re-races,
            # and ends up in one of the two branches here)
            shutil.rmtree(d, ignore_errors=True)
            try:
                os.rename(tmp, d)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)
        else:
            # lost the race; the winner's identical output is in place
            shutil.rmtree(tmp, ignore_errors=True)
    return d


def _canon_select(url_expr: str) -> str:
    """SQL expression fragment list computing (canon, chost, cpath) from an
    absolute URL expression — the F2 normalize + F3 canonicalize composition
    for this corpus's URL shapes, using DuckDB lateral column aliases.

    Emits aliases: _sch, _hst, _pth, _q, _hp, _pn, _qn, canon, chost, cpath.
    """
    return f"""
      lower(regexp_extract({url_expr}, '^([a-zA-Z]+)://', 1)) AS _sch,
      lower(regexp_extract({url_expr}, '^[a-zA-Z]+://([^/?#]*)', 1)) AS _hst,
      regexp_extract({url_expr}, '^[a-zA-Z]+://[^/?#]*([^?#]*)', 1) AS _pth,
      regexp_extract({url_expr}, '\\?([^#]*)', 1) AS _q,
      -- normalize strips the default port, canonicalize strips www.
      CASE WHEN starts_with(
             CASE WHEN _sch = 'http' THEN replace(_hst, ':80', '')
                  WHEN _sch = 'https' THEN replace(_hst, ':443', '')
                  ELSE _hst END, 'www.')
           THEN substr(CASE WHEN _sch = 'http' THEN replace(_hst, ':80', '')
                            WHEN _sch = 'https' THEN replace(_hst, ':443', '')
                            ELSE _hst END, 5)
           ELSE CASE WHEN _sch = 'http' THEN replace(_hst, ':80', '')
                     WHEN _sch = 'https' THEN replace(_hst, ':443', '')
                     ELSE _hst END END AS _hp,
      -- path: '' -> '/', collapse slash runs, strip trailing slash (len>1)
      CASE WHEN regexp_replace(coalesce(_pth, ''), '/+', '/', 'g') IN ('', '/')
           THEN '/'
           ELSE rtrim(regexp_replace(_pth, '/+', '/', 'g'), '/') END AS _pn,
      -- query: drop blank-valued + tracking params, sort remaining pairs
      -- ('k=v' string sort == key-then-value sort for this corpus's keys)
      -- coalesce: array_to_string of an EMPTY list is NULL in DuckDB
      coalesce(array_to_string(list_sort(
        list_filter(string_split(coalesce(_q, ''), '&'),
        x -> strpos(x, '=') > 0
             AND substr(x, strpos(x, '=') + 1) <> ''
             AND NOT list_contains([{_TRACKING}],
                                   lower(substr(x, 1, strpos(x, '=') - 1))))),
        '&'), '') AS _qn,
      _sch || '://' || _hp || _pn
        || CASE WHEN _qn = '' THEN '' ELSE '?' || _qn END AS canon,
      _hp AS chost,
      -- robots path = everything after the first host occurrence (sim :306)
      substr(canon, strpos(canon, _hp) + length(_hp)) AS cpath"""


def _round_ctes(r: int) -> str:
    """The unrolled SQL CTEs for scheduling round ``r`` (contract steps 1-9)."""
    t0 = f"{r * HORIZON!r}"
    prev_ran = "TRUE" if r == 0 else f"(SELECT b FROM ran{r - 1})"
    prev_orders = "orders_init" if r == 0 else f"orders_upto{r - 1}"
    disc_base = (r + 1) * 10**14
    return f"""
elig{r} AS MATERIALIZED (
  SELECT * FROM frontier{r} WHERE scheduled_at <= {t0}
),
-- the loop BREAKS on an empty eligible set or an exhausted global budget:
-- later rounds never run even if retries become eligible (sim :359-366)
ran{r} AS MATERIALIZED (
  SELECT (SELECT count(*) FROM elig{r}) > 0
     AND (SELECT count(*) FROM {prev_orders}) < {MAX_PAGES}
     AND {prev_ran} AS b
),
-- robots: FIRST matching prefix by rule_order decides; fail-open (step 2)
rbm{r} AS MATERIALIZED (
  SELECT e.canonical, rb.allow,
         row_number() OVER (PARTITION BY e.canonical ORDER BY rb.rule_order) AS rn
  FROM elig{r} e
  JOIN robots rb ON rb.host = e.host AND starts_with(e.path, rb.path_prefix)
),
allowed{r} AS MATERIALIZED (
  SELECT e.* FROM elig{r} e
  LEFT JOIN (SELECT canonical, allow FROM rbm{r} WHERE rn = 1) m USING (canonical)
  WHERE coalesce(m.allow, TRUE)
),
-- per-host politeness budget floor(H/delay), rank by the frontier key (step 3)
admh{r} AS MATERIALIZED (
  SELECT a.* FROM (
    SELECT a.*, row_number() OVER (
      PARTITION BY host
      ORDER BY priority DESC, depth, discovered_at, canonical) AS hrank
    FROM allowed{r} a) a
  LEFT JOIN hostbudget hb USING (host)
  WHERE a.hrank <= coalesce(hb.budget, {int(HORIZON / DEFAULT_DELAY)})
),
-- global budget cutoff in global rank order = the crawl-order segment (step 4)
adm{r} AS MATERIALIZED (
  SELECT * FROM (
    SELECT a.*, row_number() OVER (
      ORDER BY priority DESC, depth, discovered_at, canonical) - 1 AS seq
    FROM admh{r} a) t
  WHERE (SELECT b FROM ran{r})
    AND seq < {MAX_PAGES} - (SELECT count(*) FROM {prev_orders})
),
-- fetch outcome: missing doc, content-type, or size -> failure (step 5)
outc{r} AS MATERIALIZED (
  SELECT a.*, coalesce(d.ok, FALSE) AS success
  FROM adm{r} a LEFT JOIN doc_ok d ON d.doc_id = a.canonical
),
-- discovered candidates; in-round first occurrence by (parent rank, link pos)
cand{r} AS MATERIALIZED (
  SELECT l.canon, l.chost, l.cpath, o.depth + 1 AS ndepth,
         CAST({disc_base} + o.seq * 1000000 + l.pos AS BIGINT) AS ndisc,
         row_number() OVER (PARTITION BY l.canon ORDER BY o.seq, l.pos) AS rn
  FROM outc{r} o JOIN canonlinks l ON l.parent = o.canonical
  WHERE o.success AND o.depth < {MAX_DEPTH}
),
new{r} AS MATERIALIZED (
  SELECT c.canon, c.chost, c.cpath, c.ndepth, c.ndisc
  FROM cand{r} c
  WHERE c.rn = 1
    AND NOT EXISTS (SELECT 1 FROM seen{r} s WHERE s.canonical = c.canon)
),
seen{r + 1} AS MATERIALIZED (
  SELECT canonical FROM seen{r} UNION ALL SELECT canon FROM new{r}
),
orders_upto{r} AS MATERIALIZED (
  SELECT round, seq, canonical FROM {prev_orders}
  UNION ALL
  SELECT {r} AS round, seq, canonical FROM adm{r}
),
frontier{r + 1} AS MATERIALIZED (
  -- not yet eligible (or the loop already broke): carried unchanged
  SELECT canonical, host, path, depth, priority, attempts, discovered_at,
         scheduled_at
  FROM frontier{r} WHERE scheduled_at > {t0} OR NOT (SELECT b FROM ran{r})
  UNION ALL
  -- eligible + allowed but lost the budget race: stays pending unchanged
  -- (eligible + robots-denied rows are dropped here = status 'skipped')
  SELECT a.canonical, a.host, a.path, a.depth, a.priority, a.attempts,
         a.discovered_at, a.scheduled_at
  FROM allowed{r} a
  WHERE (SELECT b FROM ran{r})
    AND NOT EXISTS (SELECT 1 FROM adm{r} x WHERE x.canonical = a.canonical)
  UNION ALL
  -- failures with retries left: priority-1, backoff 2^attempts (step 8)
  SELECT canonical, host, path, depth, priority - 1, attempts + 1,
         discovered_at, {t0} + power(2, attempts + 1)
  FROM outc{r} WHERE NOT success AND attempts + 1 < {MAX_ATTEMPTS}
  UNION ALL
  -- discoveries: depth+1, priority 5, next-round schedule (step 7)
  SELECT canon, chost, cpath, ndepth, 5, 0, ndisc, {(r + 1) * HORIZON!r}
  FROM new{r}
)"""


def _common_ctes(inputs: str) -> str:
    """Input tables + round-independent document precomputation."""
    return f"""
docs AS MATERIALIZED (
  SELECT * FROM read_parquet('{inputs}/documents.parquet')),
robots AS MATERIALIZED (
  SELECT * FROM read_parquet('{inputs}/robots.parquet')),
seedsrc AS (SELECT * FROM read_parquet('{inputs}/seeds.parquet')),
-- crawl_delay per host: max over non-null rows; <=0 -> unbounded (step 3)
hostbudget AS MATERIALIZED (
  SELECT host,
         CASE WHEN max(crawl_delay) <= 0 THEN 1073741824
              ELSE CAST(floor({HORIZON!r} / max(crawl_delay)) AS BIGINT) END
           AS budget
  FROM robots WHERE crawl_delay IS NOT NULL GROUP BY host
),
-- F8/F9 fetch outcome: content-type containment then size cap (worker.py:235-264)
doc_ok AS MATERIALIZED (
  SELECT doc_id,
         (strpos(lower(content_type), 'text/html') > 0
          AND size_bytes <= {MAX_PAGE_SIZE}) AS ok
  FROM docs
),
spanrows AS (SELECT doc_id, unnest(spans) AS s FROM docs),
-- T5 link resolution (resolve_link): skip ''/#/mailto:tel:javascript:data:,
-- urljoin (corpus hrefs are absolute or root-relative)
resolved AS (
  SELECT doc_id, s.offset AS off,
    CASE
      WHEN trim(s.text) = '' OR starts_with(trim(s.text), '#') THEN NULL
      WHEN starts_with(trim(s.text), 'mailto:')
        OR starts_with(trim(s.text), 'tel:')
        OR starts_with(trim(s.text), 'javascript:')
        OR starts_with(trim(s.text), 'data:') THEN NULL
      WHEN starts_with(trim(s.text), 'http://')
        OR starts_with(trim(s.text), 'https://') THEN trim(s.text)
      WHEN starts_with(trim(s.text), '/')
        THEN regexp_extract(doc_id, '^(https?://[^/?#]*)', 1) || trim(s.text)
      ELSE NULL
    END AS absolute
  FROM spanrows WHERE s.kind = 'link'
),
-- F1 validity: scheme+host present, blocked-extension filter on the path
validlinks AS (
  SELECT doc_id, off, absolute FROM resolved
  WHERE absolute IS NOT NULL
    AND regexp_extract(absolute, '^https?://([^/?#]*)', 1) <> ''
    AND NOT regexp_matches(
          lower(regexp_extract(absolute, '^https?://[^/?#]*([^?#]*)', 1)),
          '{_BLOCKED_EXT_RE}')
),
-- ordered distinct on the ABSOLUTE url (fragment variants distinct HERE,
-- collapsed only at canonicalization — worker.py:297-346)
linkpos AS MATERIALIZED (
  SELECT doc_id, absolute,
         row_number() OVER (PARTITION BY doc_id ORDER BY min(off)) - 1 AS pos
  FROM validlinks GROUP BY doc_id, absolute
),
canonlinks AS MATERIALIZED (
  SELECT doc_id AS parent, pos, {_canon_select('absolute')}
  FROM linkpos
),
seedcanon AS (
  SELECT ord, priority, depth, {_canon_select('url')}
  FROM seedsrc
),
frontier0 AS MATERIALIZED (
  SELECT canon AS canonical, chost AS host, cpath AS path,
         depth, priority, 0 AS attempts,
         CAST(ord AS BIGINT) AS discovered_at, 0.0 AS scheduled_at
  FROM seedcanon
),
seen0 AS MATERIALIZED (SELECT canon AS canonical FROM seedcanon),
orders_init AS (
  SELECT 0 AS round, CAST(0 AS BIGINT) AS seq, '' AS canonical WHERE FALSE
)"""


def sql_crawl_order_mini() -> str:
    """The full unrolled crawl: SELECT (round, seq, canonical)."""
    inputs = mini_inputs_dir()
    rounds = ",\n".join(_round_ctes(r) for r in range(MAX_ROUNDS))
    return f"""WITH {_common_ctes(inputs)},
{rounds}
SELECT round, seq, canonical FROM orders_upto{MAX_ROUNDS - 1}
"""


def sql_crawl_time_travel(as_of_round: int = 2) -> str:
    """Snapshot time-travel twin (tables.read_as_of / read_increment).

    The catalog contract: the ``pages`` table as committed at round k is
    exactly the scheduled fetches of rounds 0..k (append-only sink, one row
    per admitted URL, plans/round.py S7), and the CDC increment (k, cur]
    is exactly the rows appended after that snapshot. So the twin is the
    unrolled scheduled set tagged by round — 'asof' for round <= k,
    'increment' above — with the fetch-outcome flag carried through.
    """
    inputs = mini_inputs_dir()
    rounds = ",\n".join(_round_ctes(r) for r in range(MAX_ROUNDS))
    pages = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, seq, canonical, success FROM outc{r}"
        for r in range(MAX_ROUNDS)
    )
    return f"""WITH {_common_ctes(inputs)},
{rounds},
pages AS ({pages})
SELECT CASE WHEN round <= {as_of_round} THEN 'asof' ELSE 'increment' END AS part,
       round, seq, canonical, success
FROM pages
"""


def sql_crawl_round_metrics() -> str:
    """Committed per-round metrics twin (tables.metrics_history).

    Each committed round's manifest records scheduled / completed /
    failed_or_retry / skipped / fresh (plans/round.py set_metrics); the
    engine commits a round only when it admits at least one URL
    (admitted_cnt == 0 advances the virtual clock without committing), so
    the twin is the unrolled per-round counts filtered to scheduled > 0:
    scheduled = |adm|, completed = successful outcomes, skipped = eligible
    rows whose first matching robots rule denies, fresh = |new|.
    """
    inputs = mini_inputs_dir()
    rounds = ",\n".join(_round_ctes(r) for r in range(MAX_ROUNDS))
    per_round = "\nUNION ALL\n".join(
        f"""SELECT {r} AS round,
       (SELECT count(*) FROM adm{r}) AS scheduled,
       (SELECT count(*) FROM outc{r} WHERE success) AS completed,
       (SELECT count(*) FROM outc{r} WHERE NOT success) AS failed_or_retry,
       (SELECT count(*) FROM elig{r} e
        JOIN (SELECT canonical, allow FROM rbm{r} WHERE rn = 1) m
          USING (canonical)
        WHERE NOT m.allow) AS skipped,
       (SELECT count(*) FROM new{r}) AS fresh"""
        for r in range(MAX_ROUNDS)
    )
    return f"""WITH {_common_ctes(inputs)},
{rounds},
metrics AS ({per_round})
SELECT * FROM metrics WHERE scheduled > 0
"""


def sql_crawl_media_features() -> str:
    """Media spans of completed pages + fake-backend features, per round.

    Reuses the crawl unroll for the completed-page set; features reproduce
    multimodal.decode_features(backend='fake') over the synth_media payload
    unhex(md5(media_ref)): width/height = first two digest bytes, mean_byte
    = round(avg of all 16, 4) — exact (sum/16 terminates in 4 decimals).
    """
    inputs = mini_inputs_dir()
    rounds = ",\n".join(_round_ctes(r) for r in range(MAX_ROUNDS))
    completed = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, canonical FROM outc{r} WHERE success"
        for r in range(MAX_ROUNDS)
    )
    return f"""WITH {_common_ctes(inputs)},
{rounds},
completed AS ({completed}),
mediaspans AS (
  SELECT doc_id, s.media_ref AS media_ref,
         row_number() OVER (PARTITION BY doc_id ORDER BY s.offset) - 1
           AS media_pos
  FROM spanrows WHERE s.kind = 'media'
)
SELECT c.round, c.canonical, m.media_pos, m.media_ref,
       CAST(('0x' || substr(md5(m.media_ref), 1, 2)) AS INT) AS width,
       CAST(('0x' || substr(md5(m.media_ref), 3, 2)) AS INT) AS height,
       round((SELECT avg(CAST(('0x' || substr(md5(m.media_ref), 2 * i.i + 1, 2))
                              AS INT))
              FROM range(0, 16) i(i)), 4) AS mean_byte
FROM completed c JOIN mediaspans m ON m.doc_id = c.canonical
"""
