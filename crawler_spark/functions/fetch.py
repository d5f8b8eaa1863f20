"""Fetch-outcome classification (F8/F9 — reference core/worker.py:235-264).

The reference's ``_fetch_page`` rejects a response in header order:

1. content-type: the lowercased header must CONTAIN one of
   ``content.allowed_content_types`` (default ``['text/html']``) —
   substring containment, so ``text/html; charset=utf-8`` passes;
2. size: a body larger than ``content.max_page_size`` (default 10 MiB)
   raises after the content-type check, so a response failing both reports
   the content-type error.

Either rejection raises ContentError, which the worker folds into the same
``success=False`` result as a network failure (worker.py:193-207) — the
engine then retries with backoff exactly like a 404.  These expressions are
the column twins of that logic; they are used by the round plan on the
simulated-fetch join output and by the ``fetch_outcomes`` registry query.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column
from pyspark.sql import functions as F

# error_type labels in the errors sink (storage/database.py:347-375 analog)
FETCH_FAILED = "fetch_failed"            # missing document (404/network analog)
CONTENT_TYPE_REJECTED = "content_type_rejected"
CONTENT_TOO_LARGE = "content_too_large"


def content_type_ok(ct: Column, allowed_types: tuple[str, ...]) -> Column:
    """True iff lower(ct) contains any allowed substring; null ct fails
    (reference: missing header -> '' -> never contains 'text/html').
    An empty allowed list rejects everything — ``any([])`` is False in the
    reference's check too."""
    if not allowed_types:
        return F.lit(False)
    lowered = F.lower(F.coalesce(ct, F.lit("")))
    return reduce(or_, [lowered.contains(t.lower()) for t in allowed_types])


def size_ok(size: Column, max_page_size: int) -> Column:
    """True iff the body fits the budget; null size passes (no header and an
    empty body both read as size 0 in the reference)."""
    return F.coalesce(size, F.lit(0)) <= F.lit(max_page_size)


def fetch_outcome(
    found: Column,
    ct: Column,
    size: Column,
    allowed_types: tuple[str, ...],
    max_page_size: int,
) -> Column:
    """Null = success; otherwise the error_type, in the reference's
    precedence order (missing > content-type > size)."""
    return (
        F.when(~found, F.lit(FETCH_FAILED))
        .when(~content_type_ok(ct, allowed_types), F.lit(CONTENT_TYPE_REJECTED))
        .when(~size_ok(size, max_page_size), F.lit(CONTENT_TOO_LARGE))
    )
