"""Pure-Python oracle: reimplements the reference crawl pipeline verbatim.

This is the correctness twin of the Spark engine (SURVEY.md §5, §7 step 8).
Text processing uses Python ``re`` (the reference's engine) while the Spark
side uses JVM regex column expressions — two independent executors of the
same specification, compared span-by-span / word-by-word / order-by-order in
tests.

Reference semantics implemented (file:line in /root/reference/src/crawler/):
- worker text path: extractor.extract_text (extractor.py:43-73, clean
  :306-330) -> processor._clean_text (processor.py:228-248) ->
  analyzer.analyze_text (analyzer.py:69-152)
- link path: worker._extract_and_validate_links (worker.py:297-346) —
  anchors only, skip empty/#, urljoin, validate, ordered distinct; no link
  extraction at depth >= max_depth (worker.py:327-329)
- frontier ordering: priority DESC, depth ASC, discovered_at ASC
  (queue.py:48-56; persistent_queue.py:145)
- priorities: seeds 10 (engine.py:253), discovered 5 (engine.py:613),
  sitemap 3 (engine.py:679); retry priority-1, backoff 2^attempts, max 3
  attempts (queue.py:358-392); depth+1 on discovery
- dedup: a canonical URL is enqueued at most once per session
  (queue.py:161-181 — exact-set semantics per SURVEY.md §7 decision 3)
- politeness: >= crawl_delay between same-host fetches (queue.py:231-330),
  virtualized (SURVEY.md §7 decision 2)

== Deterministic round contract (shared by oracle and Spark engine) ==

Virtual time: round r (r = 0,1,...) spans [r*H, (r+1)*H) with horizon H.

Round r:
 1. eligible  = pending frontier rows with scheduled_at <= r*H
 2. robots    = drop rows whose URL path starts with a disallowed prefix for
                the row's host (fail-open when host has no rules); dropped
                rows get status='skipped' permanently
 3. politeness budget per host = floor(H / crawl_delay) (crawl_delay null ->
    default_delay; <= 0 -> unbounded); admit the per-host top-budget rows
    ranked by (priority DESC, depth ASC, discovered_at ASC, canonical ASC)
 4. global budget: admit at most (max_pages - previously scheduled) rows in
    global rank order (same key). Admitted rows, in that order, form the
    round's crawl-order segment.
 5. fetch = lookup canonical URL in documents; miss -> failure; a found doc
    whose content_type lacks every allowed substring, or whose size_bytes
    exceeds max_page_size, is REJECTED -> same failure path (F8/F9,
    worker.py:235-264; content-type precedes size)
 6. success: worker text/word/link pipeline; links resolved against the
    canonical URL, validated, ordered-distinct; dropped if link depth
    (parent+1) > max_depth or parent depth >= max_depth
 7. new URLs: normalize -> canonicalize -> first-occurrence dedup within the
    round (by parent rank, then link position) -> anti-join vs url_seen ->
    enqueued with depth=parent+1, priority=5, attempts=0,
    discovered_at = (r+1)*10^14 + min(parent_rank, 10^8-1)*10^6 + min(link_pos, 10^6-1),
    scheduled_at = (r+1)*H; inserted into url_seen
 8. failure: attempts+1; if attempts < 3 -> priority-1, stays pending with
    scheduled_at = r*H + 2^attempts; else status='failed'
 9. success rows -> status='completed'

Termination: no eligible pending rows, or max_pages scheduled, or max_rounds.

Seeds are normalized (engine.py:249-257), canonicalized for dedup, priority
10, depth 0, discovered_at = seed list index, scheduled_at = 0.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from crawler_spark.functions.urls import (
    canonicalize_url,
    host_of,
    is_valid_url,
    normalize_url,
    resolve_link,
)

# -- text pipeline (Python re twin of crawler_spark/functions/text.py) -------

VISIBLE_KINDS = {"text", "title", "main"}

STOPWORDS = {
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
    "to", "was", "will", "with", "this", "but", "they", "have",
    "had", "what", "said", "each", "which", "she", "do", "how", "their",
    "if", "up", "out", "many", "then", "them", "these", "so", "some",
    "her", "would", "make", "like", "into", "him", "time", "two", "more",
    "go", "no", "way", "could", "my", "than", "first", "been", "call",
    "who", "oil", "sit", "now", "find", "down", "day", "did", "get",
    "come", "made", "may", "part",
}

_RE_WS = re.compile(r"\s+")
_RE_DOTS = re.compile(r"[.]{3,}")
_RE_DASH = re.compile(r"[-]{3,}")
_RE_NONPRINT = re.compile(r"[^\x20-\x7E -￿]")
_RE_URL = re.compile(
    r"http[s]?://(?:[a-zA-Z]|[0-9]|[$-_@.&+]|[!*\(\),]|(?:%[0-9a-fA-F][0-9a-fA-F]))+"
)
_RE_EMAIL = re.compile(r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b")
_RE_WORD = re.compile(r"\b[a-zA-Z]+\b")
# S4 sitemap <loc> extraction — same pattern as sources/sitemap.py:
# <url>-scoped so a <sitemapindex> yields zero URLs (reference ET walks
# .//url/loc, robots.py:388-404)
_RE_LOC = re.compile(
    r"(?s)<url[\s>](?:(?!</url>).)*?"
    r"<loc>\s*(?:<!\[CDATA\[)?\s*(.*?)\s*(?:\]\]>)?\s*</loc>"
)


def extract_text(spans) -> str:
    """extractor._extract_text_from_soup analog over pre-segmented spans."""
    ordered = sorted(spans, key=lambda s: s["offset"])
    pieces = [s["text"] for s in ordered if s["kind"] in VISIBLE_KINDS and s["text"] != ""]
    return " ".join(pieces)


def clean_text_extractor(text: str) -> str:
    if not text:
        return ""
    t = _RE_WS.sub(" ", text)
    t = _RE_DOTS.sub("...", t)
    t = _RE_DASH.sub("---", t)
    t = _RE_NONPRINT.sub("", t)
    t = _RE_URL.sub("", t)
    t = _RE_EMAIL.sub("", t)
    return _RE_WS.sub(" ", t).strip()


def clean_text_processor(text: str) -> str:
    if not text:
        return ""
    t = _RE_WS.sub(" ", text)
    t = _RE_NONPRINT.sub("", t)
    t = _RE_URL.sub("", t)
    t = _RE_EMAIL.sub("", t)
    return _RE_WS.sub(" ", t).strip()


def worker_clean_text(spans) -> str:
    return clean_text_processor(clean_text_extractor(extract_text(spans)))


def tokenize(text: str):
    """analyzer._extract_words (analyzer.py:127-152)."""
    out = []
    for w in _RE_WORD.findall(text.lower()):
        if len(w) < 2 or len(w) > 50:
            continue
        if w in STOPWORDS:
            continue
        if not w.isalpha():
            continue
        out.append(w)
    return out


def word_frequencies(spans):
    freq: dict[str, int] = {}
    for w in tokenize(worker_clean_text(spans)):
        freq[w] = freq.get(w, 0) + 1
    return freq


def extract_links(spans, base_url: str, depth: int, max_depth: int):
    """worker._extract_and_validate_links, ordered distinct (worker.py:297-346)."""
    if depth >= max_depth:
        return []
    links = []
    for s in sorted(spans, key=lambda x: x["offset"]):
        if s["kind"] != "link":
            continue
        absolute = resolve_link(s["text"], base_url)
        if absolute is None:
            continue
        if is_valid_url(absolute):
            links.append(absolute)
    seen, unique = set(), []
    for l in links:
        if l not in seen:
            seen.add(l)
            unique.append(l)
    return unique


# -- crawl simulator ----------------------------------------------------------

@dataclass
class SimConfig:
    max_depth: int = 3
    max_pages: int = 1000
    default_delay: float = 1.0
    horizon: float = 30.0
    max_rounds: int = 50
    max_attempts: int = 3
    # F1/F6 domain restrictions (validator.py:239-251, engine.py:581-589):
    # blocked wins; a non-empty allowed set is exclusive
    allowed_domains: tuple = ()
    blocked_domains: tuple = ()
    # F8/F9 content filters (worker.py:235-264): substring containment on
    # lowercased content-type, then body-size cap; either rejection is an
    # ordinary fetch failure (retry w/ backoff)
    allowed_content_types: tuple = ("text/html",)
    max_page_size: int = 10_485_760
    # S3/S4 sitemap enqueue attributes (engine.py:678-679); twin of
    # CrawlConfig.sitemap_priority/sitemap_depth
    sitemap_priority: int = 3
    sitemap_depth: int = 1
    # F7 robots group selection — twin of plans/round._robots_dims
    user_agent: str = "*"

    def domain_ok(self, host: str) -> bool:
        if host in self.blocked_domains:
            return False
        if self.allowed_domains:
            return host in self.allowed_domains
        return True


@dataclass
class Entry:
    canonical: str
    url: str
    host: str
    depth: int
    priority: int
    parent: str | None
    discovered_at: int
    attempts: int = 0
    scheduled_at: float = 0.0
    status: str = "pending"
    round_completed: int = -1


def _rank_key(e: Entry):
    return (-e.priority, e.depth, e.discovered_at, e.canonical)


@dataclass
class SimResult:
    crawl_order: list = field(default_factory=list)  # (round, seq, canonical)
    url_seen: set = field(default_factory=set)
    word_freq: dict = field(default_factory=dict)  # canonical -> {word: n}
    texts: dict = field(default_factory=dict)  # canonical -> cleaned text
    links: dict = field(default_factory=dict)  # canonical -> [absolute urls]
    # J4 (processor.py:289-320): canonical -> [is_internal] aligned with links
    links_internal: dict = field(default_factory=dict)
    frontier: dict = field(default_factory=dict)  # canonical -> Entry
    rounds_run: int = 0


class CrawlSimulator:
    def __init__(
        self,
        documents,
        seeds,
        robots,
        config: SimConfig | None = None,
        sitemaps: list[str] | None = None,
    ):
        self.sitemaps = sitemaps or []  # sitemap XML documents, file order
        self.docs = {d["doc_id"]: d["spans"] for d in documents}
        # F8/F9 fetch-outcome attributes; docs without them fail open
        self.fetch_meta = {
            d["doc_id"]: (d.get("content_type", "text/html"), d.get("size_bytes", 0))
            for d in documents
        }
        self.seeds = seeds
        self.config = config or SimConfig()
        # ordered rules per host: FIRST prefix match decides (stdlib
        # RobotFileParser iteration order; engine twin plans/round._robots_dims)
        # Group selection first (same twin): rows matching our agent (exact
        # token containment or '*'); a host with any specific-agent match
        # ignores its '*' rows (exact-else-'*').
        a0 = ((self.config.user_agent if config else "*") or "*").split("/")[0].lower()

        def _matches(ua: str) -> bool:
            return ua == "*" or ua.lower() in a0

        by_host: dict[str, list[dict]] = {}
        for r in robots:
            if _matches(r.get("user_agent", "*")):
                by_host.setdefault(r["host"], []).append(r)
        self.rules: dict[str, list[tuple[int, str, bool]]] = {}
        self.delay: dict[str, float] = {}
        for host, rows in by_host.items():
            specific = [r for r in rows if r.get("user_agent", "*") != "*"]
            selected = specific if specific else rows
            for r in selected:
                self.rules[host] = self.rules.get(host, [])
                self.rules[host].append(
                    (r.get("rule_order", 0), r["path_prefix"], bool(r["allow"]))
                )
                if r["crawl_delay"] is not None:
                    # engine twin uses max() over the selected rows
                    self.delay[host] = max(
                        self.delay.get(host, r["crawl_delay"]), r["crawl_delay"]
                    )
        for host in self.rules:
            self.rules[host].sort()

    def _robots_allowed(self, e: Entry) -> bool:
        rules = self.rules.get(e.host)
        if not rules:
            return True
        path = e.canonical.split(e.host, 1)[1] if e.host in e.canonical else "/"
        for _, prefix, allow in rules:
            if path.startswith(prefix):
                return allow
        return True

    def _host_budget(self, host: str) -> int:
        d = self.delay.get(host, self.config.default_delay)
        if d is None or d <= 0:
            return 1 << 30
        return max(int(math.floor(self.config.horizon / d)), 0)

    def run(self) -> SimResult:
        cfg = self.config
        res = SimResult()
        frontier: dict[str, Entry] = {}

        # sitemap URLs enqueue BEFORE seeds (engine.py:245-249) at priority 3
        # / depth 1, max_pages//4 per sitemap file (engine.py:662,678-679);
        # first put of a canonical wins, so a colliding seed is skipped below
        sitemap_cap = cfg.max_pages // 4
        if sitemap_cap > 0:
            for ordn, xml in enumerate(self.sitemaps):
                for pos, loc in enumerate(_RE_LOC.findall(xml)[:sitemap_cap]):
                    norm = normalize_url(loc)
                    if norm is None or not is_valid_url(norm):
                        continue
                    canon = canonicalize_url(norm)
                    if canon in res.url_seen:
                        continue
                    res.url_seen.add(canon)
                    frontier[canon] = Entry(
                        canonical=canon, url=norm, host=host_of(canon),
                        depth=cfg.sitemap_depth,
                        priority=cfg.sitemap_priority, parent=None,
                        discovered_at=ordn * (sitemap_cap + 1) + pos,
                        scheduled_at=0.0,
                    )

        for i, s in enumerate(self.seeds):
            norm = normalize_url(s["url"])
            if norm is None:
                continue
            canon = canonicalize_url(norm)
            if canon in res.url_seen:
                continue
            res.url_seen.add(canon)
            frontier[canon] = Entry(
                canonical=canon, url=norm, host=host_of(canon), depth=s["depth"],
                priority=s["priority"], parent=None, discovered_at=i, scheduled_at=0.0,
            )

        scheduled_total = 0
        for rnd in range(cfg.max_rounds):
            t0 = rnd * cfg.horizon
            eligible = [
                e for e in frontier.values()
                if e.status == "pending" and e.scheduled_at <= t0
            ]
            if not eligible or scheduled_total >= cfg.max_pages:
                break
            res.rounds_run = rnd + 1

            allowed = []
            for e in eligible:
                if self._robots_allowed(e):
                    allowed.append(e)
                else:
                    e.status = "skipped"

            # per-host politeness budget
            by_host: dict[str, list[Entry]] = {}
            for e in allowed:
                by_host.setdefault(e.host, []).append(e)
            admitted = []
            for host, entries in by_host.items():
                entries.sort(key=_rank_key)
                admitted.extend(entries[: self._host_budget(host)])

            # global budget + global crawl order
            admitted.sort(key=_rank_key)
            admitted = admitted[: cfg.max_pages - scheduled_total]
            scheduled_total += len(admitted)

            new_candidates = []  # (parent_rank, link_pos, parent Entry, absolute url)
            for rank, e in enumerate(admitted):
                res.crawl_order.append((rnd, rank, e.canonical))
                spans = self.docs.get(e.canonical)
                rejected = False
                if spans is not None:
                    # F8/F9 (worker.py:235-264): content-type containment
                    # check first, then size cap; either -> ordinary failure
                    ct, size = self.fetch_meta[e.canonical]
                    ct = (ct or "").lower()
                    if not any(t.lower() in ct for t in cfg.allowed_content_types):
                        rejected = True
                    elif (size or 0) > cfg.max_page_size:
                        rejected = True
                if spans is None or rejected:
                    e.attempts += 1
                    if e.attempts < cfg.max_attempts:
                        e.priority -= 1
                        e.scheduled_at = t0 + 2 ** e.attempts
                    else:
                        e.status = "failed"
                    continue
                e.status = "completed"
                e.round_completed = rnd
                res.texts[e.canonical] = worker_clean_text(spans)
                res.word_freq[e.canonical] = word_frequencies(spans)
                links = extract_links(spans, e.canonical, e.depth, cfg.max_depth)
                res.links[e.canonical] = links
                base_host = host_of(e.canonical)
                res.links_internal[e.canonical] = [
                    host_of(l) == base_host for l in links
                ]
                if e.depth + 1 <= cfg.max_depth:
                    for pos, link in enumerate(links):
                        new_candidates.append((rank, pos, e, link))

            # normalize -> canonicalize -> in-round first-occurrence dedup ->
            # anti-join vs url_seen
            for rank, pos, parent, link in new_candidates:
                norm = normalize_url(link)
                if norm is None:
                    continue
                canon = canonicalize_url(norm)
                if not self.config.domain_ok(host_of(canon)):
                    continue  # F6 domain restriction (engine.py:581-589)
                if canon in res.url_seen:
                    continue
                res.url_seen.add(canon)
                frontier[canon] = Entry(
                    canonical=canon, url=norm, host=host_of(canon),
                    depth=parent.depth + 1, priority=5, parent=parent.canonical,
                    discovered_at=(rnd + 1) * 10**14
                    + min(rank, 10**8 - 1) * 10**6
                    + min(pos, 10**6 - 1),
                    scheduled_at=(rnd + 1) * cfg.horizon,
                )

        res.frontier = frontier
        return res
