"""Engine-portable deterministic hashing (dedup / fingerprint substrate).

The reference keys its URL-seen set on MD5 hex digests
(/root/reference/src/crawler/url_management/queue.py:35-38). For the
training-data dedup operators we need a 64-bit integer hash that produces
IDENTICAL values in Spark SQL and in the DuckDB oracle SQL the driver runs,
so every dedup query can be value-checked end to end.

``hash60(x)`` = first 15 hex chars of md5(x) as a base-16 integer — 60 bits,
always positive, representable exactly in int64 by both engines:

    Spark : CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
    DuckDB: CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)

(xxhash64 stays the internal partitioning hash for the frontier — it is
cheaper JVM-side — but it does not exist in DuckDB, so the *checkable*
operators use hash60.)

MinHash draws from the classic universal family h_i(x) = (a_i*x + b_i) mod p
with p = 2^31-1 (Broder 1997). ``x`` is first reduced mod p so a_i*x stays
under 2^62 — no int64 overflow in either engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1

# Deterministic MinHash parameters (seedless — fixed literals shared with the
# oracle SQL). Defaults: K=8 permutations banded 4 x 2 — small on purpose,
# because the DuckDB oracle re-derives every permutation; the operators take
# k/band_size knobs (the _a/_b formulas extend to any i) and a production
# near-dup pass at 10^10 docs would run K=128+, bands sized to its
# similarity threshold, with the identical plan shape.
MINHASH_K = 8
LSH_BAND_SIZE = 2


def _perm_a(i: int) -> int:
    return (i * 2_654_435_761 + 1) % MERSENNE_P


def _perm_b(i: int) -> int:
    return (i * 1_013_904_223 + 12_345) % MERSENNE_P


MINHASH_A = [_perm_a(i) for i in range(MINHASH_K)]
MINHASH_B = [_perm_b(i) for i in range(MINHASH_K)]


def hash60(col: Column) -> Column:
    """60-bit positive integer hash of a string column (portable, see module doc)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """DuckDB SQL text computing the same value as :func:`hash60`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_term(i: int, reduced: Column) -> Column:
    """h_i over a column already reduced mod MERSENNE_P (any i >= 0)."""
    return F.pmod(F.lit(_perm_a(i)) * reduced + F.lit(_perm_b(i)), F.lit(MERSENNE_P))


def minhash_term_sql(i: int, reduced_expr: str) -> str:
    return f"(({_perm_a(i)} * {reduced_expr} + {_perm_b(i)}) % {MERSENNE_P})"
