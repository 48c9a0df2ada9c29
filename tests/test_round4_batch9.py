"""Round-4 batch 9: B-cubed cluster evaluation, knowledge-fusion
majority vote, predicate-signature type inference."""

import pytest


# ------------------------------------------------------------------ B-cubed


def test_bcubed_textbook_example(spark):
    from saber_spark.operators.evaluation import bcubed_eval
    # gold: {1,2,3} {4,5}; pred: {1,2} {3,4,5}
    assign = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "x"), (3, "b", "x"),
         (4, "b", "y"), (5, "b", "y")],
        "item long, pred_cluster string, gold_cluster string")
    row = bcubed_eval(assign).collect()[0]
    # per-item precision: 1,2 -> 2/2; 3 -> 1/3; 4,5 -> 2/3  => 17/30? no:
    # (1 + 1 + 1/3 + 2/3 + 2/3)/5 = (11/3)/5 = 11/15
    # per-item recall: 1,2 -> 2/3; 3 -> 1/3; 4,5 -> 2/2 => (2/3+2/3+1/3+1+1)/5
    #   = (11/3)/5 = 11/15
    assert row.n_items == 5
    assert row.bcubed_precision == pytest.approx(11 / 15, abs=1e-6)
    assert row.bcubed_recall == pytest.approx(11 / 15, abs=1e-6)
    assert row.bcubed_f1 == pytest.approx(11 / 15, abs=1e-6)


def test_bcubed_perfect_and_degenerate(spark):
    from saber_spark.operators.evaluation import bcubed_eval
    perfect = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "x"), (3, "b", "y")],
        "item long, pred_cluster string, gold_cluster string")
    row = bcubed_eval(perfect).collect()[0]
    assert (row.bcubed_precision, row.bcubed_recall, row.bcubed_f1) == \
        (1.0, 1.0, 1.0)
    # everything in one pred cluster, gold all singletons:
    # precision per item = 1/3, recall = 1
    lump = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "a", "z")],
        "item long, pred_cluster string, gold_cluster string")
    row = bcubed_eval(lump).collect()[0]
    assert row.bcubed_precision == pytest.approx(1 / 3, abs=1e-6)
    assert row.bcubed_recall == 1.0


# -------------------------------------------------------- conflict resolution


def test_resolve_conflicts_majority_and_ties(spark):
    from saber_spark.operators.triples import resolve_conflicts
    obs = spark.createDataFrame(
        [("e1", "status", "ok", "feedA"),
         ("e1", "status", "ok", "feedB"),
         ("e1", "status", "bad", "feedC"),
         # duplicate assertion from one source counts once
         ("e1", "status", "bad", "feedC"),
         # tie 1-1 -> obj ASC wins
         ("e2", "status", "q", "feedA"),
         ("e2", "status", "p", "feedB"),
         # clean slot
         ("e3", "status", "ok", "feedA")],
        "subj string, pred string, obj string, source string")
    got = {r.subj: r for r in resolve_conflicts(obs).collect()}
    e1 = got["e1"]
    assert (e1.resolved_obj, e1.n_values, e1.n_votes, e1.n_supporting) \
        == ("ok", 2, 3, 2)
    assert e1.confidence == pytest.approx(2 / 3, abs=1e-6)
    assert got["e2"].resolved_obj == "p"
    assert got["e2"].confidence == 0.5
    assert (got["e3"].resolved_obj, got["e3"].confidence) == ("ok", 1.0)


def test_resolve_conflicts_source_dissent_within_source(spark):
    from saber_spark.operators.triples import resolve_conflicts
    # one source asserting two objects casts two votes
    obs = spark.createDataFrame(
        [("e", "p", "x", "s1"), ("e", "p", "y", "s1"),
         ("e", "p", "x", "s2")],
        "subj string, pred string, obj string, source string")
    r = resolve_conflicts(obs).collect()[0]
    assert (r.resolved_obj, r.n_votes, r.n_supporting) == ("x", 3, 2)


# ----------------------------------------------------------- type inference


def test_infer_entity_types_votes_and_ties(spark):
    from saber_spark.operators.triples import infer_entity_types
    triples = spark.createDataFrame(
        [("c1", "placed", "o1"), ("c1", "placed", "o2"),
         ("o1", "contains", "p1"),
         # corrupted: c1 in an object slot gets an 'order' vote
         ("c2", "placed", "c1"),
         # unknown predicate casts no votes
         ("c1", "mystery", "zz")],
        "subj string, pred string, obj string")
    sig = spark.createDataFrame(
        [("placed", "cust", "order"), ("contains", "order", "part")],
        "pred string, domain_type string, range_type string")
    got = {r.entity: r for r in
           infer_entity_types(triples, sig).collect()}
    c1 = got["c1"]
    assert (c1.inferred_type, c1.n_for, c1.n_votes) == ("cust", 2, 3)
    assert c1.vote_share == pytest.approx(2 / 3, abs=1e-6)
    # o1: 'order' votes from placed-obj AND contains-subj slots
    assert (got["o1"].inferred_type, got["o1"].n_votes) == ("order", 2)
    assert got["p1"].inferred_type == "part"
    assert "zz" not in got  # no vote, no guessed row


def test_infer_entity_types_tiebreak_type_asc(spark):
    from saber_spark.operators.triples import infer_entity_types
    triples = spark.createDataFrame(
        [("e", "p1", "x"), ("e", "p2", "y")],
        "subj string, pred string, obj string")
    sig = spark.createDataFrame(
        [("p1", "beta", "t"), ("p2", "alfa", "t")],
        "pred string, domain_type string, range_type string")
    got = {r.entity: r for r in
           infer_entity_types(triples, sig).collect()}
    assert got["e"].inferred_type == "alfa"  # 1-1 tie -> type ASC
    assert got["e"].vote_share == 0.5
