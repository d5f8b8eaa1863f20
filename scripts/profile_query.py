"""Profile REGISTRY queries: per-operator SQLMetrics + shuffle/spill rollups.

Usage: python scripts/profile_query.py [sf_dir] name [name ...]

The per-query analog of the reference's PerformanceProfiler report
(monitoring/profiler.py:192-236): wall time plus where the bytes moved —
reads crawler_spark.profiling over the exact AQE-final plan that executed.
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    if not args:
        print(__doc__)
        return 2

    from crawler_spark.operators.ordering import release_global_seq
    from crawler_spark.profiling import format_profile, profile_df
    from crawler_spark.queries import REGISTRY
    from crawler_spark.sparkutils import get_spark

    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    summary = []
    for name in args:
        if name not in REGISTRY:
            print(f"{name}: not in REGISTRY")
            return 2
        import time

        t0 = time.time()
        df = REGISTRY[name].fn(spark, sf_dir)
        build_sec = round(time.time() - t0, 3)  # driver-side builder loops
        prof = profile_df(df)
        release_global_seq(df)
        spark.catalog.clearCache()
        print(f"\n== {name} ==  (builder {build_sec}s + plan below)")
        print(format_profile(prof))
        summary.append(
            (name, build_sec + prof["wall_sec"], build_sec,
             prof["shuffle_bytes_written"], prof["spill_bytes"])
        )
    if len(summary) > 1:
        print("\n== summary (by total wall) ==")
        for name, tot, build, shuf, spill in sorted(summary, key=lambda t: -t[1]):
            print(
                f"{tot:8.2f}s (builder {build:6.2f}s)  shuffle {shuf:>14,}B"
                f"  spill {spill:>12,}B  {name}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
