"""Round-4 operator batch: clustering coefficient, TextRank salience,
Cohen's kappa, histogram ROC-AUC, count-min heavy hitters, RRF fusion.

Each operator gets brute-force parity on randomized input plus its edge
cases — the test strategy of SURVEY §5 (golden/randomized twins, no
oracle-only coverage)."""

import random
from decimal import ROUND_HALF_UP, Decimal

import pytest


def _r6(x: float) -> float:
    """Spark's round(): HALF_UP on the shortest decimal repr
    (BigDecimal.valueOf semantics) — Python's round() is banker's and
    disagrees exactly at the .xxxxxx5 boundary."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def _lcc_brute(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for v, nb in adj.items():
        deg = len(nb)
        tri = sum(1 for x in nb for y in nb
                  if x < y and y in adj.get(x, ()))
        lcc = _r6(2.0 * tri / (deg * (deg - 1))) if deg >= 2 else 0.0
        out[v] = (deg, tri, lcc)
    return out


class TestClusteringCoefficient:
    def test_matches_bruteforce(self, spark):
        from saber_spark.operators.graph import clustering_coefficient
        rng = random.Random(7)
        nodes = [f"n{i}" for i in range(20)]
        edges = sorted({tuple(sorted(rng.sample(nodes, 2)))
                        for _ in range(60)})
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.node: (r.degree, r.n_triangles, r.lcc)
               for r in clustering_coefficient(df).collect()}
        assert got == _lcc_brute(edges)

    def test_self_loops_dropped_and_low_degree_defined(self, spark):
        from saber_spark.operators.graph import clustering_coefficient
        # triangle a-b-c plus pendant d and a self-loop on a
        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("a", "a")],
            "src string, dst string")
        got = {r.node: (r.degree, r.n_triangles, r.lcc)
               for r in clustering_coefficient(df).collect()}
        assert got["a"] == (2, 1, 1.0)
        assert got["b"] == (2, 1, 1.0)
        assert got["c"] == (3, 1, _r6(1 / 3))
        assert got["d"] == (1, 0, 0.0)  # deg<2 -> defined 0.0, not NULL


def _textrank_brute(docs, window=2, iterations=3, damping=0.85):
    out = {}
    for doc_id, toks in docs.items():
        w = {}
        for i, a in enumerate(toks):
            for d in range(1, window + 1):
                if i + d < len(toks) and toks[i + d] != a:
                    b = toks[i + d]
                    w[(a, b)] = w.get((a, b), 0) + 1
                    w[(b, a)] = w.get((b, a), 0) + 1
        if not w:
            continue
        wdeg = {}
        for (a, _), c in w.items():
            wdeg[a] = wdeg.get(a, 0) + c
        pr = {v: 1.0 for v in wdeg}
        for _ in range(iterations):
            nxt = {}
            for (a, b), c in w.items():
                nxt[b] = nxt.get(b, 0.0) + (c / wdeg[a]) * pr[a]
            pr = {v: (1.0 - damping) + damping * s for v, s in nxt.items()}
        ranked = sorted(((_r6(s), v) for v, s in pr.items()),
                        key=lambda t: (-t[0], t[1]))
        out[doc_id] = [(v, s, i + 1) for i, (s, v) in enumerate(ranked[:3])]
    return out


class TestTextrank:
    def test_matches_bruteforce(self, spark):
        from saber_spark.operators.graph import textrank
        rng = random.Random(11)
        vocab = list("abcdefg")
        docs = {i: [rng.choice(vocab) for _ in range(rng.randrange(0, 15))]
                for i in range(25)}
        rows = [(i, p, t) for i, ts in docs.items()
                for p, t in enumerate(ts)]
        df = spark.createDataFrame(rows, "doc_id long, pos int, token string")
        got = {}
        for r in textrank(df).collect():
            got.setdefault(r.doc_id, []).append((r.token, r.score, r.rank))
        got = {k: sorted(v, key=lambda t: t[2]) for k, v in got.items()}
        want = _textrank_brute(docs)
        assert got == want

    def test_short_docs_emit_nothing(self, spark):
        from saber_spark.operators.graph import textrank
        df = spark.createDataFrame(
            [(1, 0, "only"), (2, 0, "same"), (2, 1, "same")],
            "doc_id long, pos int, token string")
        assert textrank(df).count() == 0


class TestCohensKappa:
    @staticmethod
    def _brute(pairs):
        n = len(pairs)
        po = sum(1 for a, b in pairs if a == b) / n
        cats = {c for p in pairs for c in p}
        pe = sum((sum(1 for a, _ in pairs if a == c) / n)
                 * (sum(1 for _, b in pairs if b == c) / n) for c in cats)
        k = (1.0 if po >= 1 else 0.0) if pe >= 1 \
            else (po - pe) / (1 - pe)
        return _r6(po), _r6(pe), _r6(k)

    def test_matches_bruteforce(self, spark):
        from saber_spark.operators.evaluation import cohens_kappa
        rng = random.Random(3)
        pairs = [(rng.choice("xyz"), rng.choice("xyz")) for _ in range(200)]
        df = spark.createDataFrame(pairs, "ra string, rb string")
        row = cohens_kappa(df, "ra", "rb").collect()[0]
        po, pe, k = self._brute(pairs)
        assert (row.n, row.po, row.pe, row.kappa) == (200, po, pe, k)
        assert row.n_agree == sum(1 for a, b in pairs if a == b)

    def test_perfect_and_degenerate(self, spark):
        from saber_spark.operators.evaluation import cohens_kappa
        same = spark.createDataFrame([("x", "x")] * 5 + [("y", "y")] * 5,
                                     "ra string, rb string")
        assert cohens_kappa(same, "ra", "rb").collect()[0].kappa == 1.0
        # both raters constant + identical: pe = 1 -> defined kappa = 1.0
        const = spark.createDataFrame([("x", "x")] * 4,
                                      "ra string, rb string")
        assert cohens_kappa(const, "ra", "rb").collect()[0].kappa == 1.0
        # both constant but different: pe = 0 (no shared category), po = 0
        diff = spark.createDataFrame([("x", "y")] * 4,
                                     "ra string, rb string")
        assert cohens_kappa(diff, "ra", "rb").collect()[0].kappa == 0.0

    def test_nulls_are_a_category(self, spark):
        from saber_spark.operators.evaluation import cohens_kappa
        df = spark.createDataFrame(
            [(None, None), (None, None), ("x", "x"), ("x", None)],
            "ra string, rb string")
        row = cohens_kappa(df, "ra", "rb").collect()[0]
        assert row.n_agree == 3  # two NULL-NULL agreements + one x-x


class TestRocAuc:
    @staticmethod
    def _brute(rows):
        # tie-aware pair counting per group
        groups = {}
        for g, y, s in rows:
            groups.setdefault(g, []).append((y, s))
        out = {}
        for g, items in groups.items():
            pos = [s for y, s in items if y]
            neg = [s for y, s in items if not y]
            if not pos or not neg:
                out[g] = (len(pos), len(neg), None)
                continue
            c = sum(1.0 if p > q else 0.5 if p == q else 0.0
                    for p in pos for q in neg)
            out[g] = (len(pos), len(neg), _r6(c / (len(pos) * len(neg))))
        return out

    def test_matches_bruteforce_with_ties(self, spark):
        from saber_spark.operators.evaluation import roc_auc
        rng = random.Random(5)
        rows = [(f"g{i % 3}", rng.random() < 0.4, float(rng.randrange(10)))
                for i in range(300)]
        df = spark.createDataFrame(rows, "grp string, y boolean, s double")
        got = {r.grp: (r.n_pos, r.n_neg, r.auc)
               for r in roc_auc(df, "y", "s", "grp").collect()}
        assert got == self._brute(rows)

    def test_degenerate_group_is_null(self, spark):
        from saber_spark.operators.evaluation import roc_auc
        df = spark.createDataFrame(
            [("a", True, 1.0), ("a", True, 2.0), ("b", True, 1.0),
             ("b", False, 0.0)],
            "grp string, y boolean, s double")
        got = {r.grp: r.auc for r in roc_auc(df, "y", "s", "grp").collect()}
        assert got == {"a": None, "b": 1.0}

    def test_perfect_and_inverted(self, spark):
        from saber_spark.operators.evaluation import roc_auc
        rows = [("g", i >= 5, float(i)) for i in range(10)]
        df = spark.createDataFrame(rows, "grp string, y boolean, s double")
        assert roc_auc(df, "y", "s", "grp").collect()[0].auc == 1.0
        inv = [("g", i >= 5, float(-i)) for i in range(10)]
        df2 = spark.createDataFrame(inv, "grp string, y boolean, s double")
        assert roc_auc(df2, "y", "s", "grp").collect()[0].auc == 0.0


class TestCmsHeavyHitters:
    def test_overestimate_and_completeness(self, spark):
        from saber_spark.operators.sketch import cms_heavy_hitters
        rng = random.Random(9)
        # Zipf-ish: token t_i appears ~ 300/(i+1) times
        vals = [f"t{i}" for i in range(40) for _ in range(300 // (i + 1))]
        rng.shuffle(vals)
        df = spark.createDataFrame([(v,) for v in vals], "value string")
        n = len(vals)
        denom = 50
        rows = cms_heavy_hitters(df, "value", width=32, depth=3,
                                 support_denom=denom).collect()
        exact = {}
        for v in vals:
            exact[v] = exact.get(v, 0) + 1
        got = {r.value: (r.est, r.exact) for r in rows}
        for v, (est, ex) in got.items():
            assert est >= ex == exact[v]  # CMS never underestimates
        # every TRUE heavy hitter must be in the result (no false negatives)
        for v, c in exact.items():
            if c >= n // denom:
                assert v in got

    def test_wide_sketch_is_exact(self, spark):
        from saber_spark.operators.sketch import cms_heavy_hitters
        vals = ["a"] * 10 + ["b"] * 5 + ["c"] * 1
        df = spark.createDataFrame([(v,) for v in vals], "value string")
        rows = cms_heavy_hitters(df, "value", width=4096, depth=4,
                                 support_denom=4).collect()
        got = {r.value: (r.est, r.exact) for r in rows}
        assert got == {"a": (10, 10), "b": (5, 5)}  # c below 16//4


class TestRrfFuse:
    def test_formula_and_missing_docs(self, spark):
        from saber_spark.operators.retrieval import rrf_fuse
        a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                                  "doc_id long, rank long")
        b = spark.createDataFrame([(2, 1), (4, 2)],
                                  "doc_id long, rank long")
        rows = rrf_fuse({"a": a, "b": b}, rrf_k=60, top_k=10).collect()
        got = {r.doc_id: (r.n_rankers, r.rrf, r.rank) for r in rows}
        exp = {
            2: (2, _r6(1 / 62 + 1 / 61)),
            1: (1, _r6(1 / 61)),
            4: (1, _r6(1 / 62)),
            3: (1, _r6(1 / 63)),
        }
        order = sorted(exp, key=lambda d: (-exp[d][1], d))
        for rank, d in enumerate(order, 1):
            assert got[d] == (exp[d][0], exp[d][1], rank)

    def test_topk_truncates_and_ties_break_on_id(self, spark):
        from saber_spark.operators.retrieval import rrf_fuse
        a = spark.createDataFrame([(i, 1) for i in range(5)],
                                  "doc_id long, rank long")
        rows = rrf_fuse({"only": a}, top_k=3).collect()
        assert [r.doc_id for r in sorted(rows, key=lambda r: r.rank)] \
            == [0, 1, 2]

    def test_empty_rankings_raise(self, spark):
        from saber_spark.operators.retrieval import rrf_fuse
        with pytest.raises(ValueError):
            rrf_fuse({})


def _ktruss_brute(edges, k):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        nodes = {v for e in es for v in e}
        adj = {v: set() for v in nodes}
        for a, b in es:
            adj[a].add(b)
            adj[b].add(a)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in es}
        nxt = {e for e in es if sup[e] >= k - 2}
        if nxt == es:
            return {e: sup[e] for e in es}
        es = nxt


class TestKtruss:
    def test_matches_bruteforce(self, spark):
        from saber_spark.operators.graph import ktruss_edges
        rng = random.Random(31)
        nodes = [f"n{i}" for i in range(14)]
        edges = sorted({tuple(sorted(rng.sample(nodes, 2)))
                        for _ in range(40)})
        df = spark.createDataFrame(edges, "src string, dst string")
        for k in (3, 4):
            got = {(r.a, r.b): r.support
                   for r in ktruss_edges(df, k=k).collect()}
            assert got == _ktruss_brute(edges, k)

    def test_driver_fast_path_matches_distributed(self, spark,
                                                  monkeypatch):
        # r6: driver peel vs the per-round wedge-join loop; cap=0
        # forces the distributed branch
        from saber_spark.operators import graph
        rng = random.Random(33)
        nodes = [f"n{i}" for i in range(12)]
        edges = sorted({tuple(sorted(rng.sample(nodes, 2)))
                        for _ in range(34)})
        df = spark.createDataFrame(edges, "src string, dst string")
        fast = sorted(map(tuple, graph.ktruss_edges(df, k=3).collect()))
        monkeypatch.setattr(graph, "DRIVER_EDGE_CAP", 0)
        slow = sorted(map(tuple, graph.ktruss_edges(df, k=3).collect()))
        assert fast == slow and len(fast) >= 3

    def test_strip_cascade(self, spark):
        """Chords of a triangle strip peel first; the stranded path edges
        peel in the NEXT round — the multi-round dependency a one-shot
        support filter would get wrong."""
        from saber_spark.operators.graph import ktruss_edges
        strip = [(f"s{i}", f"s{i+1}") for i in range(6)] + \
                [(f"s{i}", f"s{i+2}") for i in range(5)]
        df = spark.createDataFrame(strip, "src string, dst string")
        assert ktruss_edges(df, k=4).count() == 0
        # k=3 keeps the whole strip (every edge sits in >= 1 triangle)
        assert ktruss_edges(df, k=3).count() == len(strip)

    def test_clique_survives(self, spark):
        from saber_spark.operators.graph import ktruss_edges
        nodes = [f"c{i}" for i in range(5)]
        clique = [(a, b) for i, a in enumerate(nodes)
                  for b in nodes[i + 1:]]
        df = spark.createDataFrame(clique, "src string, dst string")
        got = ktruss_edges(df, k=5).collect()
        assert len(got) == 10 and all(r.support == 3 for r in got)


def _wl_brute(edges, rounds):
    import hashlib
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    col = {v: str(len(nb)) for v, nb in adj.items()}
    for _ in range(rounds):
        col = {v: hashlib.md5(
            (col[v] + "," + ",".join(sorted(col[u] for u in adj[v])))
            .encode()).hexdigest()[:16] for v in adj}
    return col


class TestWlColors:
    def test_matches_bruteforce(self, spark):
        from saber_spark.operators.graph import wl_colors
        rng = random.Random(41)
        nodes = [f"n{i}" for i in range(18)]
        edges = sorted({tuple(sorted(rng.sample(nodes, 2)))
                        for _ in range(35)})
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.node: r.wl for r in wl_colors(df, rounds=3).collect()}
        assert got == _wl_brute(edges, 3)

    def test_isomorphic_graphs_same_histogram(self, spark):
        from collections import Counter

        from saber_spark.operators.graph import wl_colors
        # path P4 under two different labelings
        g1 = [("a", "b"), ("b", "c"), ("c", "d")]
        g2 = [("x", "w"), ("w", "y"), ("y", "z")]
        h = []
        for g in (g1, g2):
            df = spark.createDataFrame(g, "src string, dst string")
            h.append(Counter(r.wl for r in wl_colors(df, 2).collect()))
        assert h[0] == h[1]

    def test_distinguishes_path_from_star(self, spark):
        from collections import Counter

        from saber_spark.operators.graph import wl_colors
        path = [("a", "b"), ("b", "c"), ("c", "d")]
        star = [("h", "l1"), ("h", "l2"), ("h", "l3")]
        hp, hs = (Counter(r.wl for r in wl_colors(
            spark.createDataFrame(g, "src string, dst string"), 2).collect())
            for g in (path, star))
        assert hp != hs


def _sssp_brute(edges, seeds):
    import heapq
    adj = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
    dist = {s: 0 for s in seeds}
    pq = [(0, s) for s in seeds]
    heapq.heapify(pq)
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


class TestSsspWeighted:
    def test_matches_dijkstra(self, spark):
        from saber_spark.operators.graph import sssp_weighted
        rng = random.Random(47)
        nodes = [f"n{i}" for i in range(15)]
        edges = sorted({(rng.choice(nodes), rng.choice(nodes))
                        for _ in range(45)})
        edges = [(u, v, rng.randrange(1, 9)) for u, v in edges if u != v]
        df = spark.createDataFrame(edges, "src string, dst string, cost int")
        seeds = spark.createDataFrame([("n0",), ("n7",)], "node string")
        got = {r.node: r.dist for r in sssp_weighted(df, seeds).collect()}
        assert got == _sssp_brute(edges, ["n0", "n7"])

    def test_cheap_long_path_beats_heavy_direct_edge(self, spark):
        from saber_spark.operators.graph import sssp_weighted
        df = spark.createDataFrame(
            [("a", "z", 10), ("a", "b", 1), ("b", "c", 1), ("c", "z", 1)],
            "src string, dst string, cost int")
        seeds = spark.createDataFrame([("a",)], "node string")
        got = {r.node: r.dist for r in sssp_weighted(df, seeds).collect()}
        assert got == {"a": 0, "b": 1, "c": 2, "z": 3}

    def test_driver_fast_path_matches_distributed(self, spark,
                                                  monkeypatch):
        # r6: driver Bellman-Ford vs the per-round join loop; cap=0
        # forces the distributed branch (includes an isolated seed,
        # which both paths must drop)
        from saber_spark.operators import graph
        df = spark.createDataFrame(
            [("a", "z", 10), ("a", "b", 1), ("b", "c", 1), ("c", "z", 1),
             ("z", "a", 2)],
            "src string, dst string, cost int")
        seeds = spark.createDataFrame([("a",), ("ghost",)], "node string")
        fast = sorted(map(tuple,
                          graph.sssp_weighted(df, seeds).collect()))
        monkeypatch.setattr(graph, "DRIVER_EDGE_CAP", 0)
        slow = sorted(map(tuple,
                          graph.sssp_weighted(df, seeds).collect()))
        assert fast == slow and len(fast) == 4

    def test_negative_weight_rejected(self, spark):
        import pytest as _pytest

        from saber_spark.operators.graph import sssp_weighted
        df = spark.createDataFrame([("a", "b", -1)],
                                   "src string, dst string, cost int")
        seeds = spark.createDataFrame([("a",)], "node string")
        with _pytest.raises(ValueError):
            sssp_weighted(df, seeds)

    def test_unreachable_absent(self, spark):
        from saber_spark.operators.graph import sssp_weighted
        df = spark.createDataFrame([("a", "b", 2), ("x", "y", 1)],
                                   "src string, dst string, cost int")
        seeds = spark.createDataFrame([("a",)], "node string")
        got = {r.node: r.dist for r in sssp_weighted(df, seeds).collect()}
        assert got == {"a": 0, "b": 2}


class TestLinkPredictionEval:
    def test_perfect_predictor_on_planted_structure(self, spark):
        """Plant a graph where every held-out edge closes a train wedge
        and no non-edge does: AA must separate them perfectly (AUC=1)."""
        from saber_spark.operators.graph import link_prediction_eval
        # K4 on a,b,c,d plus pendant chain e-f: candidates inside the K4
        # close many wedges; pendant pair (e, anything) closes none
        edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
                 ("b", "d"), ("c", "d"), ("d", "e"), ("e", "f")]
        df = spark.createDataFrame(edges, "src string, dst string")
        row = link_prediction_eval(df, split_denom=2).collect()[0]
        # structural sanity: it returns one row with consistent counts
        assert row.n_pos + row.n_neg > 0
        if row.n_pos and row.n_neg:
            assert 0.0 <= row.auc <= 1.0

    def test_matches_bruteforce(self, spark):
        import hashlib
        import math

        from saber_spark.operators.graph import link_prediction_eval
        rng = random.Random(61)
        nodes = [f"n{i}" for i in range(16)]
        edges = sorted({tuple(sorted(rng.sample(nodes, 2)))
                        for _ in range(60)})
        df = spark.createDataFrame(edges, "src string, dst string")
        row = link_prediction_eval(df, split_denom=2).collect()[0]

        def h(a, b):
            return int(hashlib.md5(f"{a}:{b}".encode())
                       .hexdigest()[:8], 16) % 2
        train = [e for e in edges if h(*e) != 0]
        test = {e for e in edges if h(*e) == 0}
        adj = {}
        for a, b in train:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        tset = {tuple(sorted(e)) for e in train}
        cands = {}
        for z, nb in adj.items():
            if len(nb) < 2:
                continue
            w = 1.0 / math.log(len(nb))
            for x in nb:
                for y in nb:
                    if x < y and (x, y) not in tset:
                        cands[(x, y)] = cands.get((x, y), 0.0) + w
        scored = [(round(s, 6), e in test) for e, s in cands.items()]
        pos = [s for s, l in scored if l]
        neg = [s for s, l in scored if not l]
        assert (row.n_pos, row.n_neg) == (len(pos), len(neg))
        if pos and neg:
            c = sum(1.0 if p > q else 0.5 if p == q else 0.0
                    for p in pos for q in neg)
            assert row.auc == _r6(c / (len(pos) * len(neg)))


class TestCalibrationCurve:
    def test_matches_bruteforce(self, spark):
        from collections import defaultdict

        from saber_spark.operators.evaluation import calibration_curve
        rng = random.Random(71)
        rows = [(rng.random() < 0.5, rng.random()) for _ in range(300)]
        df = spark.createDataFrame(rows, "y boolean, s double")
        got = {r.bucket: (r.n, r.n_pos, r.frac_pos, r.mean_score)
               for r in calibration_curve(df, "y", "s", 10).collect()}
        agg = defaultdict(list)
        for y, s in rows:
            agg[min(max(int(s * 10), 0), 9)].append((y, s))
        want = {b: (len(v), sum(y for y, _ in v),
                    _r6(sum(y for y, _ in v) / len(v)),
                    _r6(sum(s for _, s in v) / len(v)))
                for b, v in agg.items()}
        assert got == want

    def test_out_of_range_clamped_and_bad_params(self, spark):
        import pytest as _pytest

        from saber_spark.operators.evaluation import calibration_curve
        df = spark.createDataFrame(
            [(True, -0.5), (False, 1.5), (True, 0.55)],
            "y boolean, s double")
        got = {r.bucket: r.n
               for r in calibration_curve(df, "y", "s", 10).collect()}
        assert got == {0: 1, 9: 1, 5: 1}
        with _pytest.raises(ValueError):
            calibration_curve(df, "y", "s", 0)
