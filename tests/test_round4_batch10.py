"""Round-4 batch 10: bounded taxonomy cycle detection, truth-discovery
source reliability."""

import pytest


# ---------------------------------------------------------------- cycles


def test_cycle_edges_ring_and_dag(spark):
    from saber_spark.operators.graph import cycle_edges
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),     # 3-ring
         ("x", "y"), ("y", "x"),                 # 2-ring
         ("p", "q"), ("q", "r"),                 # chain (no cycle)
         ("s", "s")],                            # self-loop
        "src string, dst string")
    got = {(r.src, r.dst): r.cycle_len
           for r in cycle_edges(edges, max_len=4).collect()}
    assert got[("a", "b")] == 3
    assert got[("b", "c")] == 3
    assert got[("c", "a")] == 3
    assert got[("x", "y")] == 2
    assert got[("y", "x")] == 2
    assert got[("s", "s")] == 1
    assert got[("p", "q")] is None
    assert got[("q", "r")] is None


def test_cycle_edges_bound_and_shortest(spark):
    from saber_spark.operators.graph import cycle_edges
    # 5-ring: invisible at max_len=4, visible at 5
    ring5 = [(f"n{i}", f"n{(i + 1) % 5}") for i in range(5)]
    df = spark.createDataFrame(ring5, "src string, dst string")
    assert all(r.cycle_len is None
               for r in cycle_edges(df, max_len=4).collect())
    assert all(r.cycle_len == 5
               for r in cycle_edges(df, max_len=5).collect())
    # chord makes a shorter cycle: shortest wins
    chord = ring5 + [("n2", "n0")]
    df2 = spark.createDataFrame(chord, "src string, dst string")
    got = {(r.src, r.dst): r.cycle_len
           for r in cycle_edges(df2, max_len=5).collect()}
    assert got[("n0", "n1")] == 3   # n0->n1->n2->n0
    assert got[("n2", "n0")] == 3
    assert got[("n3", "n4")] == 5   # only the long way round


# ------------------------------------------------------- source reliability


def test_source_reliability_scorecard(spark):
    from saber_spark.operators.triples import source_reliability
    obs = spark.createDataFrame(
        [("e1", "p", "ok", "good"), ("e2", "p", "ok", "good"),
         ("e1", "p", "ok", "meh"), ("e2", "p", "bad", "meh"),
         ("e1", "p", "ok", "tiebreaker"),
         # duplicate assertion collapses to one claim
         ("e2", "p", "bad", "meh")],
        "subj string, pred string, obj string, source string")
    got = {r.source: r for r in source_reliability(obs).collect()}
    # majority: e1 -> ok (3 sources); e2 -> ok (1 'good') vs bad
    # (1 'meh') -> tie, obj ASC -> 'bad' wins
    assert (got["good"].n_claims, got["good"].n_correct) == (2, 1)
    assert got["good"].reliability == 0.5
    assert (got["meh"].n_claims, got["meh"].n_correct) == (2, 2)
    assert got["meh"].reliability == 1.0
    assert got["tiebreaker"].reliability == 1.0
