"""Round-5 KG read-side operators: basic-graph-pattern matching
(bgp_match) and entity cards (entity_card)."""

import pytest
from pyspark.sql import functions as F

from saber_spark.operators.triples import bgp_match, entity_card


def _kg(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_bgp_two_hop_bindings(spark):
    t = _kg(spark, [
        ("a", "placed", "o1"), ("b", "placed", "o2"),
        ("o1", "contains", "p1"), ("o1", "contains", "p2"),
        ("o2", "contains", "p1"),
        ("x", "other", "y"),
    ])
    got = {(r.c, r.o, r.p)
           for r in bgp_match(t, [("?c", "placed", "?o"),
                                  ("?o", "contains", "?p")]).collect()}
    assert got == {("a", "o1", "p1"), ("a", "o1", "p2"), ("b", "o2", "p1")}


def test_bgp_constant_subject_and_repeated_var(spark):
    t = _kg(spark, [
        ("a", "knows", "a"), ("a", "knows", "b"), ("b", "knows", "b"),
    ])
    # constant subject
    got = {r.v for r in bgp_match(t, [("a", "knows", "?v")]).collect()}
    assert got == {"a", "b"}
    # repeated variable = intra-pattern equality (self-loops only)
    loops = {r.x for r in bgp_match(t, [("?x", "knows", "?x")]).collect()}
    assert loops == {"a", "b"}


def test_bgp_optional_leaves_null_when_unbound(spark):
    t = _kg(spark, [
        ("a", "placed", "o1"), ("b", "placed", "o2"),
        ("o1", "shipped_by", "s9"),
    ])
    rows = {(r.c, r.o, r.s)
            for r in bgp_match(t, [("?c", "placed", "?o")],
                               optionals=[("?o", "shipped_by", "?s")])
            .collect()}
    assert rows == {("a", "o1", "s9"), ("b", "o2", None)}


def test_bgp_anti_removes_bindings(spark):
    t = _kg(spark, [
        ("a", "placed", "o1"), ("b", "placed", "o2"),
        ("b", "placed", "b"),          # self-loop: b must be excluded
        ("o1", "contains", "p1"), ("o2", "contains", "p1"),
    ])
    got = {r.c for r in bgp_match(t, [("?c", "placed", "?o"),
                                      ("?o", "contains", "?p")],
                                  anti=[("?c", "placed", "?c")]).collect()}
    assert got == {"a"}


def test_bgp_bag_semantics_keeps_duplicates(spark):
    t = _kg(spark, [
        ("a", "placed", "o1"), ("a", "placed", "o1"),
        ("o1", "contains", "p1"),
    ])
    assert bgp_match(t, [("?c", "placed", "?o"),
                         ("?o", "contains", "?p")]).count() == 2


def test_bgp_disconnected_pattern_raises(spark):
    t = _kg(spark, [("a", "p", "b")])
    with pytest.raises(ValueError, match="Cartesian"):
        bgp_match(t, [("?x", "p", "?y"), ("?u", "p", "?v")])
    with pytest.raises(ValueError, match="OPTIONAL"):
        bgp_match(t, [("?x", "p", "?y")], optionals=[("?u", "p", "?v")])
    with pytest.raises(ValueError, match="NOT EXISTS"):
        bgp_match(t, [("?x", "p", "?y")], anti=[("?u", "p", "?v")])
    with pytest.raises(ValueError, match="constant-only"):
        bgp_match(t, [("a", "p", "b")])


def test_bgp_join_order_prefers_constants_first(spark):
    # the most-selective (2-constant) pattern must anchor the join tree:
    # verify via the result only — ordering is a plan property, but a
    # wrong greedy walk would raise the Cartesian error here because the
    # middle pattern is the only bridge between the two others.
    t = _kg(spark, [
        ("a", "placed", "o1"), ("o1", "contains", "p1"),
        ("p1", "made_by", "m1"),
    ])
    got = bgp_match(t, [("?p", "made_by", "?m"),
                        ("?o", "contains", "?p"),
                        ("a", "placed", "?o")]).collect()
    assert [(r.o, r.p, r.m) for r in got] == [("o1", "p1", "m1")]


def test_entity_card_counts_and_modal_neighbor(spark):
    t = _kg(spark, [
        ("a", "likes", "x"), ("a", "likes", "x"), ("a", "likes", "y"),
        ("b", "likes", "x"),
    ])
    rows = {(r.entity, r.direction, r.pred):
            (r.n_triples, r.n_neighbors, r.top_neighbor)
            for r in entity_card(t).collect()}
    assert rows[("a", "out", "likes")] == (3, 2, "x")
    assert rows[("x", "in", "likes")] == (3, 2, "a")  # tie a/b -> ASC
    assert rows[("y", "in", "likes")] == (1, 1, "a")
    assert rows[("b", "out", "likes")] == (1, 1, "x")
    assert len(rows) == 4


def test_bgp_constant_filter_is_pushed_down(spark):
    t = _kg(spark, [("a", "placed", "o1"), ("o1", "contains", "p1")])
    plan = (bgp_match(t, [("?c", "placed", "?o"),
                          ("?o", "contains", "?p")])
            ._jdf.queryExecution().executedPlan().toString())
    assert "pythonUDF" not in plan.lower()


# ----------------------------- characteristic sets / time travel


def test_characteristic_sets_counts(spark):
    from saber_spark.operators.triples import characteristic_sets
    t = _kg(spark, [
        ("a", "placed", "o1"), ("a", "bought", "p1"), ("a", "bought", "p2"),
        ("b", "placed", "o2"),
        ("o1", "contains", "p1"),
    ])
    rows = {r.char_set: (r.n_entities, r.n_triples)
            for r in characteristic_sets(t).collect()}
    assert rows == {"bought,placed": (1, 3), "placed": (1, 1),
                    "contains": (1, 1)}


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, "
              "valid_from long, valid_to long, n_snaps long")


def test_kg_asof_reads_point_in_time(spark):
    from saber_spark.operators.triples import kg_asof
    h = _hist(spark, [
        ("a", "p", "x", 1, 3, 3), ("a", "p", "x", 6, 7, 2),
        ("b", "p", "y", 2, 2, 1),
    ])
    at4 = {tuple(r) for r in kg_asof(h, 4).collect()}
    assert at4 == set()                       # gap between islands
    at2 = {tuple(r) for r in kg_asof(h, 2).collect()}
    assert at2 == {("a", "p", "x"), ("b", "p", "y")}
    at6 = {tuple(r) for r in kg_asof(h, 6).collect()}
    assert at6 == {("a", "p", "x")}


def test_kg_snapshot_diff_statuses(spark):
    from saber_spark.operators.triples import kg_snapshot_diff
    h = _hist(spark, [
        ("keep", "p", "x", 1, 5, 5),          # covers both -> unchanged
        ("gone", "p", "y", 1, 2, 2),          # only s1 -> retracted
        ("new", "p", "z", 3, 4, 2),           # only s2 -> added
        ("off", "p", "w", 8, 9, 2),           # neither -> absent
        ("back", "p", "v", 1, 2, 2),          # two islands: s1 and s2
        ("back", "p", "v", 3, 3, 1),          #   -> unchanged via bool_or
    ])
    got = {(r.subj, r.status)
           for r in kg_snapshot_diff(h, 2, 3).collect()}
    assert got == {("keep", "unchanged"), ("gone", "retracted"),
                   ("new", "added"), ("back", "unchanged")}


def test_kg_snapshot_diff_accepts_columns(spark):
    from saber_spark.operators.triples import kg_snapshot_diff
    h = _hist(spark, [("a", "p", "x", 1, 1, 1), ("b", "p", "y", 2, 2, 1)])
    m = h.groupBy().agg(F.min("valid_from").alias("_s1"))
    hj = h.crossJoin(F.broadcast(m))
    got = {(r.subj, r.status)
           for r in kg_snapshot_diff(hj, F.col("_s1"),
                                     F.col("_s1") + 1).collect()}
    assert got == {("a", "retracted"), ("b", "added")}


# ----------------------------- VoID stats + cost-ordered BGP


def test_void_profile_counts(spark):
    from saber_spark.operators.triples import void_profile
    t = _kg(spark, [
        ("a", "p", "x"), ("a", "p", "y"), ("b", "p", "x"),
        ("a", "q", "x"),
    ])
    rows = {r.pred: (r.n_triples, r.n_distinct_subj, r.n_distinct_obj)
            for r in void_profile(t).collect()}
    assert rows == {"p": (3, 2, 2), "q": (1, 1, 1)}


def test_bgp_stats_roundtrip(spark):
    from saber_spark.operators.triples import bgp_stats, void_profile
    t = _kg(spark, [("a", "p", "x"), ("b", "q", "y")])
    assert bgp_stats(void_profile(t)) == {"p": (1, 1, 1), "q": (1, 1, 1)}


def test_bgp_estimate_selectivity():
    from saber_spark.operators.triples import _bgp_estimate
    stats = {"rare": (10, 5, 5), "common": (1000, 100, 100)}
    total = 1010.0
    # constant predicate: its triple count; bound terms divide
    assert _bgp_estimate(("?s", "rare", "?o"), stats, total) == 10.0
    assert _bgp_estimate(("c", "rare", "?o"), stats, total) == 2.0
    assert _bgp_estimate(("c", "rare", "d"), stats, total) == 0.4
    # unknown constant predicate matches nothing in the profiled store
    assert _bgp_estimate(("?s", "absent", "?o"), stats, total) == 0.0
    # variable predicate: store size with 1/10 per bound term
    assert _bgp_estimate(("?s", "?p", "?o"), stats, total) == total
    assert _bgp_estimate(("c", "?p", "?o"), stats, total) == total / 10


def test_bgp_order_uses_stats_over_constant_count():
    from saber_spark.operators.triples import _bgp_estimate, _bgp_order
    stats = {"rare": (2, 2, 2), "common": (1000, 10, 10)}
    patterns = [("c1", "common", "?x"),        # 2 constants, est 100
                ("?x", "rare", "?y")]          # 1 constant, est 2
    order = _bgp_order(
        patterns, lambda p: _bgp_estimate(p, stats, 1002.0))
    assert order == [1, 0]                     # stats flip the anchor
    # constants-count heuristic picks the other anchor
    n_const = lambda p: -sum(  # noqa: E731
        1 for x in p if not (isinstance(x, str) and x.startswith("?")))
    assert _bgp_order(patterns, n_const) == [0, 1]


def test_bgp_match_with_stats_same_bindings(spark):
    from saber_spark.operators.triples import (bgp_match, bgp_stats,
                                               void_profile)
    t = _kg(spark, [
        ("a", "placed", "o1"), ("b", "placed", "o2"),
        ("o1", "contains", "p1"), ("o1", "contains", "p2"),
        ("o2", "contains", "p1"),
    ])
    pats = [("?c", "placed", "?o"), ("?o", "contains", "?p")]
    plain = {(r.c, r.o, r.p) for r in bgp_match(t, pats).collect()}
    st = bgp_stats(void_profile(t))
    costed = {(r.c, r.o, r.p)
              for r in bgp_match(t, pats, stats=st).collect()}
    assert plain == costed == {("a", "o1", "p1"), ("a", "o1", "p2"),
                               ("b", "o2", "p1")}


# ----------------------------- randomized brute-force parity


def _brute_bgp(rows, patterns):
    """Reference BGP evaluation by nested loops over the triple list
    (bag semantics), independent of any join machinery."""
    def unify(binding, pattern, triple):
        b = dict(binding)
        for term, val in zip(pattern, triple):
            if isinstance(term, str) and term.startswith("?"):
                v = term[1:]
                if b.get(v, val) != val:
                    return None
                b[v] = val
            elif term != val:
                return None
        return b

    out = [{}]
    for p in patterns:
        nxt = []
        for b in out:
            for tr in rows:
                u = unify(b, p, tr)
                if u is not None:
                    nxt.append(u)
        out = nxt
    return out


def test_bgp_randomized_parity_with_bruteforce(spark):
    import random
    rnd = random.Random(20260819)
    ents = [f"e{i}" for i in range(6)]
    preds = ["p", "q", "r"]
    shapes = [
        [("?a", "p", "?b"), ("?b", "q", "?c")],
        [("?a", "p", "?b"), ("?b", "q", "?c"), ("?c", "r", "?d")],
        [("?a", "p", "?b"), ("?a", "q", "?c")],          # star
        [("e0", "p", "?b"), ("?b", "q", "?c")],          # constant anchor
        [("?a", "p", "?a")],                             # self-loop
    ]
    for trial in range(8):
        rows = [(rnd.choice(ents), rnd.choice(preds), rnd.choice(ents))
                for _ in range(rnd.randint(5, 25))]
        t = _kg(spark, rows)
        pats = shapes[trial % len(shapes)]
        expected = _brute_bgp(rows, pats)
        varnames = sorted({x[1:] for p in pats for x in p
                           if isinstance(x, str) and x.startswith("?")})
        exp = sorted(tuple(b[v] for v in varnames) for b in expected)
        got = sorted(tuple(getattr(r, v) for v in varnames)
                     for r in bgp_match(t, pats).collect())
        assert got == exp, (trial, pats)


def test_kg_snapshot_diff_randomized_parity_with_raw_sets(spark):
    import random
    from saber_spark.operators.triples import (kg_snapshot_diff,
                                               triple_history)
    rnd = random.Random(42)
    for trial in range(5):
        obs = sorted({(f"s{rnd.randint(0, 3)}", "p", f"o{rnd.randint(0, 2)}",
                       rnd.randint(0, 9)) for _ in range(rnd.randint(8, 30))})
        s1, s2 = rnd.randint(0, 8), rnd.randint(0, 9)
        df = spark.createDataFrame(
            obs, "subj string, pred string, obj string, snap long")
        got = {(r.subj, r.pred, r.obj): r.status
               for r in kg_snapshot_diff(triple_history(df), s1, s2)
               .collect()}
        # brute force straight from the raw observation sets
        keys = {(s, p, o) for s, p, o, _ in obs}
        exp = {}
        for k in keys:
            snaps = {sn for s, p, o, sn in obs if (s, p, o) == k}
            in1, in2 = s1 in snaps, s2 in snaps
            if in1 or in2:
                exp[k] = ("unchanged" if in1 and in2
                          else "added" if in2 else "retracted")
        assert got == exp, (trial, s1, s2)


# ---------------------------------------------------------------- CONSTRUCT


class TestConstruct:
    def _kg(self, spark, rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string")

    def test_construct_materializes_templates_set_semantics(self, spark):
        from saber_spark.operators.triples import construct
        t = self._kg(spark, [
            ("c1", "placed", "o1"), ("o1", "contains", "p1"),
            ("o1", "contains", "p2"),
            ("s1", "supplies", "p1"), ("s1", "supplies", "p2"),
            ("s2", "supplies", "p2"),
        ])
        got = {(r.subj, r.pred, r.obj)
               for r in construct(
                   t,
                   [("?c", "placed", "?o"), ("?o", "contains", "?p"),
                    ("?s", "supplies", "?p")],
                   [("?c", "bought_from", "?s"),
                    ("?s", "sold_to", "?c")]).collect()}
        # (c1,s1) matches via p1 AND p2 -> ONE triple each way (set)
        assert got == {("c1", "bought_from", "s1"),
                       ("c1", "bought_from", "s2"),
                       ("s1", "sold_to", "c1"), ("s2", "sold_to", "c1")}

    def test_construct_dedups_when_templates_overlap(self, spark):
        # r6 distinct-skip guard: identical templates (not pairwise
        # disjoint) and a var-subset template (not injective) must both
        # keep set semantics
        from saber_spark.operators.triples import construct
        t = self._kg(spark, [
            ("c1", "placed", "o1"), ("c1", "placed", "o2")])
        dup = construct(t, [("?c", "placed", "?o")],
                        [("?c", "is", "buyer"), ("?c", "is", "buyer")])
        assert [tuple(r) for r in dup.collect()] == [("c1", "is", "buyer")]
        sub = construct(t, [("?c", "placed", "?o")],
                        [("?c", "is", "buyer"), ("?c", "saw", "?o")])
        rows = sorted(map(tuple, sub.collect()))
        assert rows == [("c1", "is", "buyer"),
                        ("c1", "saw", "o1"), ("c1", "saw", "o2")]

    def test_construct_drops_null_optional_slots(self, spark):
        from saber_spark.operators.triples import construct
        t = self._kg(spark, [
            ("c1", "placed", "o1"), ("c2", "placed", "o2"),
            ("o1", "shipped_by", "s9"),
        ])
        got = {(r.subj, r.pred, r.obj)
               for r in construct(
                   t, [("?c", "placed", "?o")],
                   [("?c", "shipper", "?s")],
                   optionals=[("?o", "shipped_by", "?s")]).collect()}
        assert got == {("c1", "shipper", "s9")}   # c2's NULL slot dropped

    def test_construct_unbound_template_var_raises(self, spark):
        from saber_spark.operators.triples import construct
        t = self._kg(spark, [("a", "p", "b")])
        with pytest.raises(ValueError, match="not bound"):
            construct(t, [("?x", "p", "?y")], [("?x", "q", "?z")])
