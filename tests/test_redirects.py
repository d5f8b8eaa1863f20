"""resolve_redirects semantics pins: exact hop counts, loop classification,
and the over-cap chain falling into the same '(loop)' bucket a real fetcher's
too-many-redirects outcome uses. The registry oracle test value-checks the
operator against the DuckDB recursive-CTE twin; these pin the boundary
behaviors the synthetic registry input does not reach."""

from __future__ import annotations

from crawler_spark.operators.graph import resolve_redirects


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "src string, dst string")


def test_chain_hops_exact(spark):
    # a -> b -> c -> t : hops are exact chain lengths to the shared terminal
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "t")])
    got = {r["src"]: (r["final"], r["hops"]) for r in resolve_redirects(e).collect()}
    assert got == {"a": ("t", 3), "b": ("t", 2), "c": ("t", 1)}


def test_loop_and_feeder_classified(spark):
    # x feeds a 2-cycle; all three rows are '(loop)' (the feeder never
    # terminates either — exactly the fetcher's too-many-redirects class)
    e = _edges(spark, [("x", "p"), ("p", "q"), ("q", "p")])
    got = {r["src"]: (r["final"], r["hops"]) for r in resolve_redirects(e).collect()}
    assert got == {k: ("(loop)", -1) for k in ("x", "p", "q")}


def test_over_cap_chain_is_loop_bucket(spark):
    # chain of length 40 with max_hops=16 (doubling reaches 2^5=32 < 40):
    # unresolved rows land in '(loop)', resolved tail keeps exact hops
    e = _edges(spark, [(f"n{i}", f"n{i + 1}") for i in range(40)])
    rows = resolve_redirects(e, max_hops=16).collect()
    got = {r["src"]: (r["final"], r["hops"]) for r in rows}
    assert got["n39"] == ("n40", 1)
    assert got["n8"] == ("n40", 32)  # exactly at the 2^rounds horizon
    assert got["n7"] == ("(loop)", -1)  # 33 hops away: over the horizon
    assert len(rows) == 40


def test_mixed_terminals_and_branching_in(spark):
    # two chains converging on one terminal; branching INTO a node is fine
    # (only out-degree is constrained to 1 by the redirect model)
    e = _edges(spark, [("a", "m"), ("b", "m"), ("m", "t")])
    got = {r["src"]: (r["final"], r["hops"]) for r in resolve_redirects(e).collect()}
    assert got == {"a": ("t", 2), "b": ("t", 2), "m": ("t", 1)}
