"""Round-4 batch 8: Hearst hypernym harvesting, domain/range schema
audit, MRR/Hits@k link-prediction ranking — hand-example goldens +
brute-force parity."""

import hashlib
import math
import re
from collections import defaultdict

import pytest


# ----------------------------------------------------------- Hearst patterns


def test_hearst_hand_example(spark):
    from saber_spark.operators.triples import hearst_hypernyms
    docs = spark.createDataFrame(
        [(1, "Mammals such as dogs are common. Cats and other pets "
             "need care. Metals including iron rust."),
         (2, "mammals such as dogs bark; mammals such as cats meow")],
        "doc_id long, text string")
    got = {(r.hypernym, r.hyponym, r.pattern): r.n_mentions
           for r in hearst_hypernyms(docs).collect()}
    assert got == {
        ("mammals", "dogs", "such_as"): 2,
        ("mammals", "cats", "such_as"): 1,
        ("pets", "cats", "and_other"): 1,
        ("metals", "iron", "including"): 1,
    }


def test_hearst_no_matches_and_nonoverlap(spark):
    from saber_spark.operators.triples import hearst_hypernyms
    docs = spark.createDataFrame(
        [(1, "nothing to see here"),
         # chained pattern: "a such as b and other c" must yield the
         # such_as pair (a,b) AND the and_other pair (c,b) — legs are
         # independent regex sweeps over the same text
         (2, "tools such as hammers and other devices exist")],
        "doc_id long, text string")
    got = {(r.hypernym, r.hyponym, r.pattern) for r in
           hearst_hypernyms(docs).collect()}
    assert got == {("tools", "hammers", "such_as"),
                   ("devices", "hammers", "and_other")}


# -------------------------------------------------------- domain/range audit


def test_domain_range_audit_hand_example(spark):
    from saber_spark.operators.triples import domain_range_audit
    triples = spark.createDataFrame(
        [("c1", "placed", "o1"), ("c2", "placed", "o2"),
         ("c3", "placed", "o3"),
         ("o9", "placed", "c9"),          # swapped -> violation
         ("o1", "contains", "p1"), ("o2", "contains", "p2")],
        "subj string, pred string, obj string")
    types = spark.createDataFrame(
        [("c1", "cust"), ("c2", "cust"), ("c3", "cust"), ("c9", "cust"),
         ("o1", "order"), ("o2", "order"), ("o3", "order"),
         ("o9", "order"), ("p1", "part"), ("p2", "part")],
        "entity string, etype string")
    got = {r.pred: r for r in
           domain_range_audit(triples, types).collect()}
    p = got["placed"]
    assert (p.n_triples, p.domain_type, p.range_type,
            p.n_conform, p.n_violations) == (4, "cust", "order", 3, 1)
    assert p.violation_rate == 0.25
    c = got["contains"]
    assert (c.n_triples, c.n_violations) == (2, 0)


def test_domain_range_audit_unknown_and_ties(spark):
    from saber_spark.operators.triples import domain_range_audit
    # x1 untyped -> 'unknown'; the two signatures tie 1-1 and the
    # ASC/ASC tie-break must pick ('a-type', ...) deterministically
    triples = spark.createDataFrame(
        [("a1", "rel", "b1"), ("x1", "rel", "b2")],
        "subj string, pred string, obj string")
    types = spark.createDataFrame(
        [("a1", "atype"), ("b1", "btype"), ("b2", "btype")],
        "entity string, etype string")
    row = domain_range_audit(triples, types).collect()[0]
    assert (row.domain_type, row.range_type) == ("atype", "btype")
    assert (row.n_conform, row.n_violations) == (1, 1)


# ------------------------------------------------- MRR / Hits@k ranking eval


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _ranking_brute(edge_list, split_denom=2, ks=(1, 3, 10)):
    """Pure-python twin of link_prediction_ranking."""
    norm = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    train = {e for e in norm
             if _md5_32(f"{e[0]}:{e[1]}") % split_denom != 0}
    test = norm - train
    adj = defaultdict(set)
    for a, b in train:
        adj[a].add(b)
        adj[b].add(a)
    scores = defaultdict(float)
    for z, ns in adj.items():
        if len(ns) < 2:
            continue
        w = 1.0 / math.log(len(ns))
        ordered = sorted(ns)
        for i, u in enumerate(ordered):
            for v in ordered[i + 1:]:
                scores[(u, v)] += w
    cands = {p: round(s, 6) for p, s in scores.items()
             if p[1] not in adj[p[0]]}
    by_query = defaultdict(list)
    for (a, b), s in cands.items():
        by_query[a].append((b, s))
    best = {}
    for a, lst in by_query.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        for rk, (b, _) in enumerate(lst, 1):
            if (a, b) in test:
                best[a] = rk
                break
    n_q = len(best)
    mrr = round(sum(1.0 / r for r in best.values()) / n_q, 6) if n_q \
        else None
    hits = {k: sum(1 for r in best.values() if r <= k) for k in ks}
    return n_q, mrr, hits


def test_ranking_brute_force_parity(spark):
    from saber_spark.operators.graph import link_prediction_ranking
    # a 12-clique: the md5 split holds ~half its edges out, and every
    # held-out pair stays a 2-hop candidate in the dense train half —
    # guaranteed test positives; spokes add non-positive noise
    nodes = [f"n{i:02d}" for i in range(12)]
    edges = [(a, b) for i, a in enumerate(nodes)
             for b in nodes[i + 1:]]
    edges += [(nodes[i], f"x{i}") for i in range(6)]
    df = spark.createDataFrame(edges, "src string, dst string")
    row = link_prediction_ranking(df).collect()[0]
    n_q, mrr, hits = _ranking_brute(edges)
    assert n_q > 0, "fixture must produce participating queries"
    assert row.n_queries == n_q
    assert row.mrr == pytest.approx(mrr, abs=2e-6)
    assert (row.hits_1, row.hits_3, row.hits_10) == (
        hits[1], hits[3], hits[10])


def test_ranking_hits_monotone_and_bounds(spark):
    from saber_spark.operators.graph import link_prediction_ranking
    nodes = [f"h{i}" for i in range(9)]
    edges = [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]]
    df = spark.createDataFrame(edges, "src string, dst string")
    row = link_prediction_ranking(df).collect()[0]
    assert 0 <= row.hits_1 <= row.hits_3 <= row.hits_10 <= row.n_queries
    if row.n_queries:
        assert 0.0 < row.mrr <= 1.0


def test_ranking_empty_graph_zero_hits(spark):
    from saber_spark.operators.graph import link_prediction_ranking
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    row = link_prediction_ranking(df).collect()[0]
    assert (row.n_queries, row.hits_1, row.hits_3, row.hits_10) == \
        (0, 0, 0, 0)
    assert row.mrr is None
