"""Round-4 batch 11: AMIE rule confidence, reliability-weighted fusion."""

import pytest


# ----------------------------------------------------- rule_confidence


def test_rule_confidence_support_and_negatives(spark):
    from saber_spark.operators.triples import rule_confidence
    kg = spark.createDataFrame(
        [("a", "p", "b"), ("b", "q", "c"), ("a", "r", "c"),   # closed path
         ("d", "p", "e"), ("e", "q", "f")],                   # open path
        "subj string, pred string, obj string")
    got = {(r.pred1, r.pred2, r.head_pred):
           (r.n_body_pairs, r.n_support, r.confidence)
           for r in rule_confidence(kg).collect()}
    # body (p, q) has pairs (a, c) and (d, f); only (a, c) closes via r
    assert got[("p", "q", "r")] == (2, 1, 0.5)
    # bodies (p,p)/(q,*) etc. have no support rows at all
    assert all(k[2] == "r" for k in got), got


def test_rule_confidence_distinct_pairs_not_paths(spark):
    from saber_spark.operators.triples import rule_confidence
    # two mids chain the SAME (a, b) pair: body pairs collapse to 1
    kg = spark.createDataFrame(
        [("a", "p", "m1"), ("a", "p", "m2"),
         ("m1", "q", "b"), ("m2", "q", "b"),
         ("a", "h", "b")],
        "subj string, pred string, obj string")
    rows = {(r.pred1, r.pred2, r.head_pred):
            (r.n_body_pairs, r.n_support, r.confidence)
            for r in rule_confidence(kg).collect()}
    assert rows[("p", "q", "h")] == (1, 1, 1.0)


def test_rule_confidence_hub_exclusion(spark):
    from saber_spark.operators.triples import rule_confidence
    kg = spark.createDataFrame(
        [("a", "p", "m"), ("m", "q", "b"), ("a", "h", "b")],
        "subj string, pred string, obj string")
    # max_mid_degree=0 excludes every mid -> no body pairs, no rules
    assert rule_confidence(kg, max_mid_degree=0).count() == 0


# ----------------------------------------------------- resolve_weighted


def _obs(spark):
    # s1/s2 reliable (agree with majority everywhere), s3 dissents on f2
    return spark.createDataFrame(
        [("f1", "is", "x", "s1"), ("f1", "is", "x", "s2"),
         ("f1", "is", "x", "s3"),
         ("f2", "is", "y", "s1"), ("f2", "is", "y", "s2"),
         ("f2", "is", "z", "s3")],
        "subj string, pred string, obj string, source string")


def test_resolve_weighted_winner_and_mass(spark):
    from saber_spark.operators.triples import resolve_weighted
    got = {(r.subj, r.pred): r for r in resolve_weighted(_obs(spark)).collect()}
    # round 1: s1=s2=1.0 (2/2 correct), s3=0.5 (1/2)
    r1 = got[("f1", "is")]
    assert (r1.resolved_obj, r1.n_sources) == ("x", 3)
    assert r1.weight == pytest.approx(2.5)       # 1 + 1 + 0.5
    assert r1.weight_share == pytest.approx(1.0)
    r2 = got[("f2", "is")]
    assert (r2.resolved_obj, r2.n_sources) == ("y", 2)
    assert r2.weight == pytest.approx(2.0)
    assert r2.weight_share == pytest.approx(0.8)  # 2.0 / 2.5


def test_resolve_weighted_overturns_unreliable_majority(spark):
    from saber_spark.operators.triples import resolve_weighted
    # On b1-b4 the three sources all disagree; the round-1 tie breaks
    # obj ASC to t's (alphabetically smallest) value, so t scores 4/5
    # and u1/u2 1/5 each. On the contested slot a, raw counts say 'w'
    # (2 votes) but weighted mass says 'v' (0.8 > 0.2 + 0.2) — the
    # unreliable pair's majority is overturned in round 2.
    rows = [("a", "is", "w", "u1"), ("a", "is", "w", "u2"),
            ("a", "is", "v", "t")]
    for i in range(1, 5):
        rows += [(f"b{i}", "is", "k", "t"),
                 (f"b{i}", "is", "p", "u1"),
                 (f"b{i}", "is", "q", "u2")]
    obs = spark.createDataFrame(
        rows, "subj string, pred string, obj string, source string")
    got = {r.subj: r for r in resolve_weighted(obs).collect()}
    assert got["a"].resolved_obj == "v"
    assert got["a"].weight == pytest.approx(0.8)
    assert got["a"].weight_share == pytest.approx(0.8 / 1.2)
    assert all(got[f"b{i}"].resolved_obj == "k" for i in range(1, 5))
