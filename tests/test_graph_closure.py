"""dependency_closure: fixpoint, shortest depth, cycle termination
(analysis.go:758-797 GetDependencyGraph, registry.go:1546-1592)."""

from __future__ import annotations

from axonops_schema_registry_spark.operators.graph import dependency_closure


def _closure(spark, edges):
    df = spark.createDataFrame(edges, "subject string, ref_subject string")
    out = dependency_closure(df)
    return {(r["subject"], r["ref_subject"]): r["depth"]
            for r in out.collect()}


def test_three_level_chain(spark):
    got = _closure(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1,
                   ("a", "c"): 2, ("b", "d"): 2, ("a", "d"): 3}


def test_diamond_keeps_shortest_depth(spark):
    got = _closure(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    assert got[("a", "c")] == 1


def test_cycle_terminates(spark):
    """A reference cycle must not loop forever; every reachable pair is
    still emitted exactly once."""
    got = _closure(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "a"): 1,
                   ("a", "c"): 2, ("b", "a"): 2, ("c", "b"): 2,
                   ("a", "a"): 3, ("b", "b"): 3, ("c", "c"): 3}


def test_self_loop_terminates(spark):
    got = _closure(spark, [("a", "a"), ("a", "b")])
    assert got == {("a", "a"): 1, ("a", "b"): 1}
