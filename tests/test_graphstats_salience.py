"""Brute-force parity tests for graph_summary / modularity (graph.py)
and entity_salience / negation_flags (linking.py)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from saber_spark.operators.graph import graph_summary, modularity
from saber_spark.operators.linking import entity_salience, negation_flags


def _brute_summary(edges):
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({n for p in e for n in p})
    out, inn = {}, {}
    for s, d in e:
        out[s] = out.get(s, 0) + 1
        inn[d] = inn.get(d, 0) + 1
    es = set(e)
    n_recip = sum(1 for s, d in e if (d, s) in es)
    m = len(e)
    xs = [out[s] for s, d in e]
    ys = [inn[d] for s, d in e]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    varx, vary = m * sxx - sx * sx, m * syy - sy * sy
    cov = m * sxy - sx * sy
    assort = 0.0 if varx == 0 or vary == 0 else cov / math.sqrt(varx * vary)
    n = len(nodes)
    dens = 0.0 if n < 2 else m / (n * (n - 1))
    return {"n_nodes": n, "n_edges": m, "n_reciprocal": n_recip,
            "reciprocity": round(n_recip / m, 6),
            "density": round(dens, 6),
            "max_out_degree": max(out.values()),
            "max_in_degree": max(inn.values()),
            "assortativity": round(assort, 6)}


class TestGraphSummary:
    def test_matches_bruteforce_random(self, spark):
        rng = random.Random(7)
        edges = sorted({(f"n{rng.randrange(12)}", f"n{rng.randrange(12)}")
                        for _ in range(60)})
        df = spark.createDataFrame(edges, "src string, dst string")
        got = graph_summary(df).collect()[0].asDict()
        assert got == _brute_summary(edges)

    def test_self_loops_and_duplicates_collapse(self, spark):
        df = spark.createDataFrame(
            [("a", "a"), ("a", "b"), ("a", "b"), ("b", "a")],
            "src string, dst string")
        got = graph_summary(df).collect()[0].asDict()
        assert got["n_edges"] == 2 and got["n_reciprocal"] == 2
        assert got["reciprocity"] == 1.0

    def test_zero_variance_assortativity_defined(self, spark):
        # perfect 1-regular matching: every x=1, y=1 -> variance 0 -> 0.0
        df = spark.createDataFrame([("a", "b"), ("c", "d")],
                                   "src string, dst string")
        got = graph_summary(df).collect()[0].asDict()
        assert got["assortativity"] == 0.0


def _brute_modularity(edges, labels, weights=None):
    und = {}
    for i, (s, d) in enumerate(edges):
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        w = weights[i] if weights is not None else None
        if weights is None:
            und[(a, b)] = 1
        else:
            und[(a, b)] = und.get((a, b), 0) + w
    m = sum(und.values())
    deg = {}
    for (a, b), w in und.items():
        deg[a] = deg.get(a, 0) + w
        deg[b] = deg.get(b, 0) + w
    comms = {}
    for n, c in labels.items():
        if n in deg:
            comms.setdefault(c, []).append(n)
    out = {}
    for c, members in comms.items():
        ms = set(members)
        w_in = sum(w for (a, b), w in und.items() if a in ms and b in ms)
        dsum = sum(deg[n] for n in members)
        q = w_in / m - (dsum / (2.0 * m)) ** 2
        out[c] = (len(members), w_in, dsum, round(q, 6))
    return out


class TestModularity:
    def test_matches_bruteforce_weighted(self, spark):
        rng = random.Random(11)
        edges = sorted({(f"n{rng.randrange(10)}", f"n{rng.randrange(10)}")
                        for _ in range(40)})
        weights = [rng.randrange(1, 5) for _ in edges]
        labels = {f"n{i}": f"c{i % 3}" for i in range(10)}
        edf = spark.createDataFrame(
            [(s, d, w) for (s, d), w in zip(edges, weights)],
            "src string, dst string, w long")
        ldf = spark.createDataFrame(sorted(labels.items()),
                                    "node string, community string")
        got = {r["community"]: (r["n_nodes"], r["internal_weight"],
                                r["degree_sum"], r["q_contrib"])
               for r in modularity(edf, ldf, weight_col="w").collect()}
        assert got == _brute_modularity(edges, labels, weights)

    def test_unweighted_collapses_reciprocal_edges(self, spark):
        edf = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("b", "c")],
            "src string, dst string")
        ldf = spark.createDataFrame(
            [("a", "x"), ("b", "x"), ("c", "y")],
            "node string, community string")
        rows = {r["community"]: r for r in modularity(edf, ldf).collect()}
        # m=2 undirected edges; a-b internal to x (w=1, not 2)
        assert rows["x"]["internal_weight"] == 1
        assert rows["x"]["degree_sum"] == 3  # deg(a)=1, deg(b)=2
        assert rows["y"]["internal_weight"] == 0

    def test_global_q_of_two_cliques_positive(self, spark):
        cliq = [(f"{p}{i}", f"{p}{j}") for p in "AB"
                for i in range(4) for j in range(i + 1, 4)]
        edf = spark.createDataFrame(cliq + [("A0", "B0")],
                                    "src string, dst string")
        ldf = spark.createDataFrame(
            [(f"{p}{i}", p) for p in "AB" for i in range(4)],
            "node string, community string")
        q = sum(r["q_contrib"] for r in modularity(edf, ldf).collect())
        assert q > 0.3  # near-ideal split of a barbell graph


class TestEntitySalience:
    def test_hand_example(self, spark):
        linked = spark.createDataFrame(
            [(1, 0, "E1"), (1, 5, "E1"), (1, 9, "E2")],
            "doc_id long, pos long, canonical_id string")
        lens = spark.createDataFrame([(1, 10)], "doc_id long, doc_len long")
        rows = {r["canonical_id"]: r
                for r in entity_salience(linked, lens).collect()}
        e1 = rows["E1"]
        assert (e1["n_mentions"], e1["first_pos"], e1["last_pos"],
                e1["spread"]) == (2, 0, 5, 5)
        assert e1["salience"] == 2.0  # 2 * (1 - 0/10)
        assert rows["E2"]["salience"] == round(1 * (1 - 9 / 10), 6)


class TestNegationFlags:
    def test_window_boundaries(self, spark):
        # cue at pos 0; mentions at pos 1..7 — negated iff pos-5 <= 0 < pos
        linked = spark.createDataFrame(
            [(1, p, f"E{p}") for p in range(1, 8)],
            "doc_id long, pos long, canonical_id string")
        tokens = spark.createDataFrame(
            [(1, 0, "not")] + [(1, p, "word") for p in range(1, 8)],
            "doc_id long, pos long, token string")
        rows = {r["canonical_id"]: r["n_negated"]
                for r in negation_flags(linked, tokens, window=5).collect()}
        assert {k: v for k, v in rows.items()} == {
            "E1": 1, "E2": 1, "E3": 1, "E4": 1, "E5": 1, "E6": 0, "E7": 0}

    def test_cue_after_mention_does_not_negate(self, spark):
        linked = spark.createDataFrame([(1, 0, "E")],
                                       "doc_id long, pos long, "
                                       "canonical_id string")
        tokens = spark.createDataFrame([(1, 0, "word"), (1, 1, "no")],
                                       "doc_id long, pos long, token string")
        r = negation_flags(linked, tokens).collect()[0]
        assert r["n_negated"] == 0 and r["neg_rate"] == 0.0

    def test_cross_document_cue_ignored(self, spark):
        linked = spark.createDataFrame([(2, 3, "E")],
                                       "doc_id long, pos long, "
                                       "canonical_id string")
        tokens = spark.createDataFrame([(1, 1, "no"), (2, 3, "word")],
                                       "doc_id long, pos long, token string")
        assert negation_flags(linked, tokens).collect()[0]["n_negated"] == 0


class TestResolveEntities:
    def test_transitive_chain_and_blocking(self, spark):
        from saber_spark.operators.canonicalize import resolve_entities
        names = spark.createDataFrame(
            [("ab",), ("abc",), ("abcd",),   # chain: ab~abc~abcd
             ("xyz",), ("qyz",),             # first-char typo: NOT merged
             ("solo",)],                     # singleton
            "name string")
        got = {r["name"]: r["canonical"]
               for r in resolve_entities(names, max_edits=1).collect()}
        assert got["ab"] == got["abc"] == got["abcd"] == "ab"
        assert got["xyz"] == "xyz" and got["qyz"] == "qyz"
        assert got["solo"] == "solo"

    def test_max_edits_two_merges_wider(self, spark):
        from saber_spark.operators.canonicalize import resolve_entities
        names = spark.createDataFrame([("p53",), ("p534x",)], "name string")
        one = {r["name"]: r["canonical"]
               for r in resolve_entities(names, max_edits=1).collect()}
        two = {r["name"]: r["canonical"]
               for r in resolve_entities(names, max_edits=2).collect()}
        assert one["p534x"] == "p534x"      # lev=2 > 1
        assert two["p534x"] == "p53"


class TestMadOutliers:
    def test_flags_injected_outlier_only(self, spark):
        from saber_spark.operators.groupstats import mad_outliers
        rows = [(i, "s", 100 + (i % 5)) for i in range(20)] + [(99, "s", 5000)]
        df = spark.createDataFrame(rows, "doc_id long, source string, v long")
        r = mad_outliers(df, "v", "source").collect()[0]
        assert r["n_rows"] == 21 and r["n_outliers"] == 1
        assert r["median_val"] == 102.0
        assert r["outlier_rate"] == round(1 / 21, 6)

    def test_zero_mad_group_defined(self, spark):
        from saber_spark.operators.groupstats import mad_outliers
        df = spark.createDataFrame([(i, "s", 7) for i in range(10)],
                                   "doc_id long, source string, v long")
        r = mad_outliers(df, "v", "source").collect()[0]
        assert r["mad"] == 0.0 and r["n_outliers"] == 0
        assert r["outlier_rate"] == 0.0


class TestExtractDates:
    def test_valid_invalid_and_leap(self, spark):
        from saber_spark.operators.textstats import extract_dates
        df = spark.createDataFrame(
            [(1, "seen 2023-07-14 and bogus 2023-13-40 ok"),
             (2, "leap 2024-02-29 valid"),
             (3, "nonleap 2023-02-29 invalid"),
             (4, "no dates here")],
            "doc_id long, text string")
        got = {(r["doc_id"], r["date_str"], r["month"])
               for r in extract_dates(df).collect()}
        assert got == {(1, "2023-07-14", "2023-07"),
                       (2, "2024-02-29", "2024-02")}


class TestTripleCardinalityAudit:
    def test_fanout_and_violations(self, spark):
        from saber_spark.operators.triples import triple_cardinality_audit
        rows = ([("s1", "p", f"o{i}") for i in range(5)]   # fan-out 5
                + [("s2", "p", "o0"), ("s2", "p", "o0")]   # dup collapses
                + [("s3", "q", "o1")])
        t = spark.createDataFrame(rows, "subj string, pred string, obj string")
        got = {r["pred"]: r
               for r in triple_cardinality_audit(t, max_card=3).collect()}
        p = got["p"]
        assert (p["n_triples"], p["n_subjects"], p["max_fanout"],
                p["n_violating_subjects"]) == (6, 2, 5, 1)
        assert p["violation_rate"] == 0.5
        assert got["q"]["n_violating_subjects"] == 0


class TestVocabProfile:
    def test_hand_example(self, spark):
        from saber_spark.operators.vocab import vocab_profile
        toks = spark.createDataFrame(
            [("a",), ("a",), ("a",), ("b",), ("c",)], "token string")
        r = vocab_profile(toks).collect()[0]
        assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (5, 3, 2)
        assert r["hapax_ratio"] == round(2 / 3, 6)
        assert r["type_token_ratio"] == 0.6
        assert r["top1_share"] == 0.6
