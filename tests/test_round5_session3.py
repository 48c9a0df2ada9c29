"""Round-5 final-session batch 7: Dunning G^2 collocations, Monroe
log-odds keyness, rank-biased overlap."""

import math

from pyspark.sql import functions as F


def _tokens(spark, docs):
    """docs: {doc_id: [tokens]} -> (doc_id, pos, token)."""
    rows = [(d, p, t) for d, toks in docs.items()
            for p, t in enumerate(toks)]
    return spark.createDataFrame(rows, "doc_id long, pos long, token string")


class TestLoglikCollocations:
    def test_hand_computed_g2(self, spark):
        from saber_spark.operators.vocab import loglik_collocations
        # bigrams: (a,b) (b,a) (a,b) (b,c); N=4
        toks = _tokens(spark, {0: ["a", "b", "a", "b", "c"]})
        out = {(r.w1, r.w2): r for r in
               loglik_collocations(toks, min_count=1).collect()}
        ab = out[("a", "b")]
        assert (ab.c12, ab.c1, ab.c2) == (2, 2, 2)
        # O = [2,0,0,2], E = [1,1,1,1] -> G2 = 2*(2ln2 + 2ln2) = 8 ln 2
        assert ab.g2 == round(8 * math.log(2), 6)

    def test_independence_scores_zero(self, spark):
        from saber_spark.operators.vocab import loglik_collocations
        # every (left,right) combination equally often -> G2 = 0 exactly
        toks = _tokens(spark, {0: ["a", "x"], 1: ["a", "y"],
                               2: ["b", "x"], 3: ["b", "y"]})
        for r in loglik_collocations(toks, min_count=1).collect():
            assert r.g2 == 0.0

    def test_no_bigram_across_documents(self, spark):
        from saber_spark.operators.vocab import loglik_collocations
        toks = _tokens(spark, {0: ["a"], 1: ["b"]})
        assert loglik_collocations(toks, min_count=1).count() == 0

    def test_alpha_only_drops_punctuation_bigrams(self, spark):
        from saber_spark.operators.vocab import loglik_collocations
        toks = _tokens(spark, {0: ["a", ".", "a", ".", "b", "b"]})
        out = loglik_collocations(toks, min_count=1).collect()
        assert {(r.w1, r.w2) for r in out} == {("b", "b")}

    def test_min_count_floor(self, spark):
        from saber_spark.operators.vocab import loglik_collocations
        toks = _tokens(spark, {0: ["a", "b", "a", "b", "c", "d"]})
        out = loglik_collocations(toks, min_count=2).collect()
        assert {(r.w1, r.w2) for r in out} == {("a", "b")}


class TestLogoddsKeyness:
    def _toks(self, spark, en, de):
        rows = [("en", t) for t in en] + [("de", t) for t in de]
        return spark.createDataFrame(rows, "lang string, token string")

    def test_hand_computed_delta_z(self, spark):
        from saber_spark.operators.vocab import logodds_keyness
        toks = self._toks(spark, ["x", "x", "y"], ["x", "y", "y"])
        out = {r.token: r for r in
               logodds_keyness(toks, "lang", "en", "de",
                               alpha0=2.0, min_total=1).collect()}
        x = out["x"]
        assert (x.ca, x.cb) == (2, 1)
        # aw = 2*3/6 = 1; delta = ln(3/2) - ln(2/3) = 2 ln 1.5
        delta = 2 * math.log(1.5)
        assert x.delta == round(delta, 6)
        # var = 1/(2+1) + 1/(1+1)
        assert x.z == round(delta / math.sqrt(1 / 3 + 1 / 2), 6)

    def test_antisymmetric_in_groups(self, spark):
        from saber_spark.operators.vocab import logodds_keyness
        toks = self._toks(spark, ["x", "x", "y"], ["x", "y", "y"])
        ab = {r.token: r for r in
              logodds_keyness(toks, "lang", "en", "de",
                              alpha0=2.0, min_total=1).collect()}
        ba = {r.token: r for r in
              logodds_keyness(toks, "lang", "de", "en",
                              alpha0=2.0, min_total=1).collect()}
        for t in ab:
            assert ab[t].delta == -ba[t].delta
            assert ab[t].z == -ba[t].z

    def test_balanced_token_scores_zero(self, spark):
        from saber_spark.operators.vocab import logodds_keyness
        toks = self._toks(spark, ["x", "y"], ["x", "y"])
        out = {r.token: r for r in
               logodds_keyness(toks, "lang", "en", "de",
                               alpha0=2.0, min_total=1).collect()}
        assert out["x"].delta == 0.0 and out["x"].z == 0.0

    def test_min_total_floor(self, spark):
        from saber_spark.operators.vocab import logodds_keyness
        toks = self._toks(spark, ["x", "x", "y"], ["x"])
        out = logodds_keyness(toks, "lang", "en", "de",
                              alpha0=2.0, min_total=3).collect()
        assert [r.token for r in out] == ["x"]


class TestRboOverlap:
    def _rank(self, spark, items):
        return spark.createDataFrame(
            [(it, i + 1) for i, it in enumerate(items)],
            "item string, rank long")

    def test_identical_rankings(self, spark):
        from saber_spark.operators.retrieval import rbo_overlap
        a = self._rank(spark, [f"h{i}" for i in range(10)])
        out = rbo_overlap(a, a, ["item"], depth=10, p=0.9).collect()[0]
        # X_d = d at every depth -> rbo = (1-p) sum p^(d-1) = 1 - p^D
        assert out.rbo == round(1 - 0.9 ** 10, 6)
        assert out.agreement == 1.0 and out.x_depth == 10

    def test_disjoint_rankings(self, spark):
        from saber_spark.operators.retrieval import rbo_overlap
        a = self._rank(spark, ["a", "b", "c"])
        b = self._rank(spark, ["x", "y", "z"])
        out = rbo_overlap(a, b, ["item"], depth=3, p=0.9).collect()[0]
        assert out.rbo == 0.0 and out.x_depth == 0

    def test_hand_computed_swap(self, spark):
        from saber_spark.operators.retrieval import rbo_overlap
        # A = [1,2,3], B = [2,1,3]: X = (0, 2, 3)
        a = self._rank(spark, ["1", "2", "3"])
        b = self._rank(spark, ["2", "1", "3"])
        out = rbo_overlap(a, b, ["item"], depth=3, p=0.5).collect()[0]
        # (1-.5)*(.5^0*0/1 + .5^1*2/2 + .5^2*3/3) = 0.375
        assert out.rbo == 0.375
        assert out.agreement == 1.0

    def test_truncation_ignores_deep_ranks(self, spark):
        from saber_spark.operators.retrieval import rbo_overlap
        # shared item sits past the depth cut in B -> contributes nothing
        a = self._rank(spark, ["a", "b"])
        b = self._rank(spark, ["x", "y", "a"])
        out = rbo_overlap(a, b, ["item"], depth=2, p=0.9).collect()[0]
        assert out.rbo == 0.0 and out.x_depth == 0


class TestBenfordAudit:
    def test_hand_computed_digits_and_chi2(self, spark):
        from saber_spark.operators.profile import benford_audit
        df = spark.createDataFrame(
            [(1.0,), (19.0,), (250.0,), (3.5,), (0.0,), (-5.0,)],
            "x double")
        out = {r.digit: r for r in benford_audit(df, "x").collect()}
        assert len(out) == 9  # zero-support digits still present
        assert out[1].n == 2 and out[2].n == 1 and out[3].n == 1
        assert out[9].n == 0
        p1 = math.log10(2)
        assert out[1].obs_p == 0.5
        assert out[1].exp_p == round(p1, 6)
        assert out[1].chi2_term == round((2 - 4 * p1) ** 2 / (4 * p1), 6)

    def test_first_digit_of_fractions(self, spark):
        from saber_spark.operators.profile import benford_audit
        # 0.042 -> 4; 0.9 -> 9 (negative floor(log10))
        df = spark.createDataFrame([(0.042,), (0.9,)], "x double")
        out = {r.digit: r.n for r in benford_audit(df, "x").collect()}
        assert out[4] == 1 and out[9] == 1

    def test_benford_sample_has_small_chi2(self, spark):
        from saber_spark.operators.profile import benford_audit
        # exact Benford proportions scaled to 1000 -> chi2 ~ 0
        rows = []
        for d in range(1, 10):
            n_d = round(1000 * math.log10(1 + 1 / d))
            rows += [(float(d * 10),)] * n_d
        df = spark.createDataFrame(rows, "x double")
        chi2 = sum(r.chi2_term
                   for r in benford_audit(df, "x").collect())
        assert chi2 < 0.1


class TestLexicalRichness:
    def test_hand_computed_panel(self, spark):
        from saber_spark.operators.profile import lexical_richness
        items = spark.createDataFrame(
            [("a",), ("a",), ("b",), ("c",)], "token string")
        out = lexical_richness(items, "token").collect()[0]
        assert (out.n_tokens, out.n_types, out.f1) == (4, 3, 2)
        assert out.ttr == 0.75
        assert out.hapax_frac == round(2 / 3, 6)
        # sum r^2 n_r = 4 + 1 + 1 = 6 -> 1e4 * (6-4)/16 = 1250
        assert out.yule_k == 1250.0

    def test_all_distinct_is_zero_k(self, spark):
        from saber_spark.operators.profile import lexical_richness
        items = spark.createDataFrame(
            [("a",), ("b",), ("c",)], "token string")
        out = lexical_richness(items, "token").collect()[0]
        assert out.yule_k == 0.0 and out.ttr == 1.0 and out.hapax_frac == 1.0

    def test_single_type_max_repetition(self, spark):
        from saber_spark.operators.profile import lexical_richness
        items = spark.createDataFrame([("a",)] * 10, "token string")
        out = lexical_richness(items, "token").collect()[0]
        # 1e4 * (100 - 10) / 100 = 9000
        assert out.yule_k == 9000.0 and out.f1 == 0


class TestWilsonLowerBound:
    def _df(self, spark, groups):
        rows = [(g, s) for g, (k, n) in groups.items()
                for s in [True] * k + [False] * (n - k)]
        return spark.createDataFrame(rows, "src string, ok boolean")

    def test_small_perfect_does_not_outrank_large_good(self, spark):
        from saber_spark.operators.evaluation import wilson_lower_bound
        df = self._df(spark, {"tiny": (3, 3), "big": (970, 1000)})
        out = {r.src: r for r in
               wilson_lower_bound(df, "src", "ok").collect()}
        assert out["tiny"].p_hat == 1.0 and out["big"].p_hat == 0.97
        assert out["big"].wilson_lb > out["tiny"].wilson_lb
        assert out["big"].rank == 1 and out["tiny"].rank == 2

    def test_hand_computed_bound(self, spark):
        from saber_spark.operators.evaluation import wilson_lower_bound
        df = self._df(spark, {"s": (8, 10)})
        out = wilson_lower_bound(df, "src", "ok").collect()[0]
        z, p, n = 1.959964, 0.8, 10
        lb = ((p + z * z / (2 * n)
               - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)))
              / (1 + z * z / n))
        assert out.wilson_lb == round(lb, 6)

    def test_zero_successes(self, spark):
        from saber_spark.operators.evaluation import wilson_lower_bound
        df = self._df(spark, {"s": (0, 5)})
        out = wilson_lower_bound(df, "src", "ok").collect()[0]
        assert out.p_hat == 0.0 and out.wilson_lb == 0.0


class TestAutocorrelation:
    def _events(self, spark, hourly_counts, start="2024-01-01 00:00:00"):
        import datetime as dt
        t0 = dt.datetime.fromisoformat(start)
        rows = [(t0 + dt.timedelta(hours=h, minutes=m),)
                for h, c in enumerate(hourly_counts)
                for m in range(c)]
        return spark.createDataFrame(rows, "ts timestamp")

    def test_alternating_series(self, spark):
        from saber_spark.operators.timeseries import autocorrelation
        out = {r.lag: r for r in
               autocorrelation(self._events(spark, [1, 2, 1, 2, 1, 2]),
                               max_lag=2).collect()}
        # xbar = 1.5, ss = 1.5; lag1: 5 pairs each -0.25 -> -1.25/1.5
        assert out[1].n_pairs == 5
        assert out[1].r == round(-1.25 / 1.5, 6)
        # lag2: 4 pairs each +0.25 -> 1.0/1.5
        assert out[2].r == round(1.0 / 1.5, 6)

    def test_densify_counts_empty_hours_as_zero(self, spark):
        from saber_spark.operators.timeseries import autocorrelation
        # hours 0 and 2 have events, hour 1 none -> series [2, 0, 2]
        ev = self._events(spark, [2, 0, 2])
        out = {r.lag: r for r in
               autocorrelation(ev, max_lag=2).collect()}
        # xbar = 4/3; ss = 2*(2/3)^2 + (4/3)^2 = 8/3
        # lag1: (2-4/3)(0-4/3) + (0-4/3)(2-4/3) = 2 * -8/9 = -16/9
        assert out[1].n_pairs == 2
        assert out[1].r == round((-16 / 9) / (8 / 3), 6)

    def test_constant_series_nan_guard(self, spark):
        from saber_spark.operators.timeseries import autocorrelation
        # zero variance -> ss = 0 -> r is NULL (0/0), never a crash
        out = autocorrelation(self._events(spark, [3, 3, 3]),
                              max_lag=1).collect()
        assert out[0].r is None


class TestTermDispersion:
    def _toks(self, spark, pairs):
        return spark.createDataFrame(pairs, "source string, token string")

    def test_concentrated_vs_distributed(self, spark):
        from saber_spark.operators.vocab import term_dispersion
        toks = self._toks(spark, [
            ("A", "t"), ("A", "t"),          # concentrated in A
            ("A", "w"), ("B", "w"),          # tracks part sizes
            ("B", "x"), ("B", "x"),          # fills B to size 4... no
        ])
        # parts: A=3, B=3 -> s = 0.5 each
        out = {r.token: r for r in
               term_dispersion(toks, "source", min_count=1).collect()}
        assert out["t"].dp == 0.5      # all mass in a half-sized part
        assert out["w"].dp == 0.0      # perfectly proportional
        assert out["x"].dp == 0.5

    def test_unseen_parts_contribute_their_share(self, spark):
        from saber_spark.operators.vocab import term_dispersion
        # parts A=9, B=1; token only in B -> DP = 0.5*(|1-0.1|+|0-0.9|)
        toks = self._toks(spark, [("A", "f")] * 9 + [("B", "g")])
        out = {r.token: r for r in
               term_dispersion(toks, "source", min_count=1).collect()}
        assert out["g"].dp == 0.9
        # token only in the BIG part: 0.5*(|1-0.9|+0.1) = 0.1
        assert out["f"].dp == round(0.1, 6)

    def test_min_count_floor(self, spark):
        from saber_spark.operators.vocab import term_dispersion
        toks = self._toks(spark, [("A", "t"), ("A", "t"), ("B", "u")])
        out = term_dispersion(toks, "source", min_count=2).collect()
        assert [r.token for r in out] == ["t"]


class TestMapEval:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    def test_hand_computed_ap(self, spark):
        from saber_spark.operators.retrieval import map_eval
        docs = self._docs(spark, ["q q q r", "q q x", "q r", "z"])
        out = map_eval(docs, [("q", "r")], k=10).collect()[0]
        assert (out.n_candidates, out.n_relevant) == (3, 2)
        # ranks: doc0 (rel), doc1, doc2 (rel) -> AP = (1/1 + 2/3)/2
        assert out.ap == round((1 + 2 / 3) / 2, 6)
        assert out.p_at_k == 0.2
    def test_perfect_ranking(self, spark):
        from saber_spark.operators.retrieval import map_eval
        docs = self._docs(spark, ["q q r", "q r", "q x"])
        out = map_eval(docs, [("q", "r")], k=10).collect()[0]
        assert out.ap == 1.0

    def test_no_relevant_is_zero(self, spark):
        from saber_spark.operators.retrieval import map_eval
        docs = self._docs(spark, ["q a", "q b"])
        out = map_eval(docs, [("q", "r")], k=10).collect()[0]
        assert out.ap == 0.0 and out.n_relevant == 0

    def test_k_truncation(self, spark):
        from saber_spark.operators.retrieval import map_eval
        # relevant doc at rank 3, k = 2 -> contributes nothing to AP@k
        docs = self._docs(spark, ["q q q a", "q q b", "q r"])
        out = map_eval(docs, [("q", "r")], k=2).collect()[0]
        assert out.ap == 0.0 and out.p_at_k == 0.0


class TestHeapsFit:
    def test_all_distinct_is_linear_growth(self, spark):
        from saber_spark.operators.vocab import heaps_fit
        # V(n) = n exactly -> beta = 1, K = 1, r2 = 1
        toks = _tokens(spark, {0: [f"t{i}" for i in range(10)],
                               1: [f"u{i}" for i in range(10)]})
        out = heaps_fit(toks).collect()[0]
        assert (out.n_tokens, out.n_types) == (20, 20)
        assert out.beta == 1.0 and out.k_hat == 1.0 and out.r2 == 1.0

    def test_matches_numpy_ols(self, spark):
        from saber_spark.operators.vocab import heaps_fit
        # deterministic mixed corpus; compare against a reference OLS
        words = ["a", "b", "a", "c", "b", "d", "a", "e", "f", "c",
                 "g", "a", "h", "b", "i", "j", "k", "a", "l", "b"]
        toks = _tokens(spark, {0: words})
        out = heaps_fit(toks).collect()[0]
        # reference: first-occurrence prefix vocab counts
        seen, first = set(), []
        for i, w in enumerate(words, 1):
            if w not in seen:
                seen.add(w)
                first.append(i)
        n = len(words)
        pts = []
        for j in range(1, 11):
            n_c = (j * n) // 10
            v_c = sum(1 for fi in first if fi <= n_c)
            pts.append((math.log(n_c), math.log(v_c)))
        k = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        beta = (sxy - sx * sy / k) / (sxx - sx * sx / k)
        assert out.beta == round(beta, 6)
        assert out.n_types == 12

    def test_single_type_degenerate_is_null(self, spark):
        from saber_spark.operators.vocab import heaps_fit
        toks = _tokens(spark, {0: ["a"] * 20})
        out = heaps_fit(toks).collect()[0]
        assert out.beta == 0.0 and out.r2 is None  # zero y-variance


class TestBurrowsDelta:
    def _toks(self, spark, parts):
        rows = [(p, t) for p, toks in parts.items() for t in toks]
        return spark.createDataFrame(rows, "source string, token string")

    def test_hand_computed_two_parts(self, spark):
        from saber_spark.operators.textstats import burrows_delta
        toks = self._toks(spark, {"A": ["x", "x", "y"],
                                  "B": ["x", "y", "y"]})
        out = {r.source: r for r in
               burrows_delta(toks, "source", top_m=2).collect()}
        # f_A(x)=2/3, f_B(x)=1/3 -> |z| = |1/6| / (|1/3|/sqrt(2))
        expect = (1 / 6) / ((1 / 3) / math.sqrt(2))
        assert out["A"].delta == round(expect, 6)
        assert out["A"].delta == out["B"].delta  # 2-part symmetry
        assert out["A"].part_tokens == 3

    def test_identical_parts_zero_delta(self, spark):
        from saber_spark.operators.textstats import burrows_delta
        toks = self._toks(spark, {"A": ["x", "y"], "B": ["x", "y"]})
        for r in burrows_delta(toks, "source", top_m=2).collect():
            assert r.delta == 0.0  # sd = 0 -> z = 0 by convention

    def test_missing_token_counts_as_zero(self, spark):
        from saber_spark.operators.textstats import burrows_delta
        toks = self._toks(spark, {"A": ["x", "x"], "B": ["y", "y"]})
        out = {r.source: r.delta for r in
               burrows_delta(toks, "source", top_m=2).collect()}
        # f matrices (1,0) vs (0,1): |z| = 0.5/(sqrt(2)/2 / sqrt(2)) ...
        expect = 0.5 / ((1.0) / math.sqrt(2))
        assert out["A"] == round(expect, 6) and out["B"] == out["A"]

    def test_top_m_restricts_tokens(self, spark):
        from saber_spark.operators.textstats import burrows_delta
        # 'rare' differs wildly but is outside top-1 -> delta driven by x
        toks = self._toks(spark, {"A": ["x", "x", "rare"],
                                  "B": ["x", "x"]})
        out = {r.source: r.delta for r in
               burrows_delta(toks, "source", top_m=1).collect()}
        # top-1 = x; f_A = 2/3, f_B = 1
        d = abs((2 / 3 - 5 / 6)) / (abs(1 / 3) / math.sqrt(2))
        assert out["A"] == round(d, 6)


class TestAssocRules:
    def _ev(self, spark, user_items):
        rows = [(u, i) for u, items in user_items.items() for i in items]
        return spark.createDataFrame(rows, "user_id long, event_type string")

    def test_hand_computed_support_conf_lift(self, spark):
        from saber_spark.operators.sessions import assoc_rules
        ev = self._ev(spark, {1: ["a", "b"], 2: ["a", "b"],
                              3: ["a"], 4: ["b", "c"]})
        out = {(r.item_a, r.item_b): r for r in
               assoc_rules(ev, min_support=1).collect()}
        ab = out[("a", "b")]
        assert ab.support == 2
        assert ab.conf_ab == round(2 / 3, 6)  # P(b|a)
        assert ab.conf_ba == round(2 / 3, 6)
        assert ab.lift == round(4 * 2 / 9, 6)
        bc = out[("b", "c")]
        assert bc.lift == round(4 / 3, 6)

    def test_set_semantics_ignore_repeats(self, spark):
        from saber_spark.operators.sessions import assoc_rules
        ev = self._ev(spark, {1: ["a", "a", "b", "b", "b"]})
        out = assoc_rules(ev, min_support=1).collect()
        assert len(out) == 1 and out[0].support == 1

    def test_min_support_floor(self, spark):
        from saber_spark.operators.sessions import assoc_rules
        ev = self._ev(spark, {1: ["a", "b"], 2: ["a", "c"]})
        assert assoc_rules(ev, min_support=2).count() == 0

    def test_independent_items_lift_one(self, spark):
        from saber_spark.operators.sessions import assoc_rules
        # a and b fully independent across 4 users: lift = 1
        ev = self._ev(spark, {1: ["a", "b"], 2: ["a"],
                              3: ["b"], 4: ["z"]})
        out = {(r.item_a, r.item_b): r for r in
               assoc_rules(ev, min_support=1).collect()}
        assert out[("a", "b")].lift == 1.0


class TestMannWhitneyU:
    def _df(self, spark, a, b):
        rows = [("a", v) for v in a] + [("b", v) for v in b]
        return spark.createDataFrame(rows, "g string, v long")

    def test_fully_separated(self, spark):
        from saber_spark.operators.groupstats import mann_whitney_u
        out = mann_whitney_u(self._df(spark, [1, 2, 3], [4, 5, 6]),
                             "g", "a", "b", "v").collect()[0]
        # R_a = 6 -> U_a = 0; no ties: var = 3*3*7/12
        assert (out.n_a, out.n_b, out.u_a) == (3, 3, 0.0)
        assert out.z == round(-4.5 / math.sqrt(5.25), 6)

    def test_tie_correction(self, spark):
        from saber_spark.operators.groupstats import mann_whitney_u
        out = mann_whitney_u(self._df(spark, [1, 1], [1, 2]),
                             "g", "a", "b", "v").collect()[0]
        # avg rank of the 1-block = 2 -> R_a = 4, U_a = 1
        # var = (4/12) * (5 - 24/12) = 1 -> z = -1
        assert out.u_a == 1.0 and out.z == -1.0

    def test_identical_groups_z_zero(self, spark):
        from saber_spark.operators.groupstats import mann_whitney_u
        out = mann_whitney_u(self._df(spark, [1, 2, 3], [1, 2, 3]),
                             "g", "a", "b", "v").collect()[0]
        assert out.z == 0.0


class TestKsTwoSample:
    def _df(self, spark, a, b):
        rows = [("a", v) for v in a] + [("b", v) for v in b]
        return spark.createDataFrame(rows, "g string, v long")

    def test_disjoint_supports_d_one(self, spark):
        from saber_spark.operators.groupstats import ks_two_sample
        out = ks_two_sample(self._df(spark, [1, 2], [3, 4]),
                            "g", "a", "b", "v").collect()[0]
        assert out.d == 1.0
        assert out.scaled == 1.0  # sqrt(2*2/4) = 1

    def test_interleaved(self, spark):
        from saber_spark.operators.groupstats import ks_two_sample
        out = ks_two_sample(self._df(spark, [1, 3], [2, 4]),
                            "g", "a", "b", "v").collect()[0]
        assert out.d == 0.5

    def test_identical_distributions_d_zero(self, spark):
        from saber_spark.operators.groupstats import ks_two_sample
        out = ks_two_sample(self._df(spark, [1, 2, 3], [1, 2, 3]),
                            "g", "a", "b", "v").collect()[0]
        assert out.d == 0.0


class TestSpearmanRho:
    def _df(self, spark, xs, ys):
        return spark.createDataFrame(list(zip(xs, ys)), "x long, y long")

    def test_perfect_monotone(self, spark):
        from saber_spark.operators.groupstats import spearman_rho
        out = spearman_rho(self._df(spark, [1, 5, 9, 20],
                                    [2, 4, 100, 200]), "x", "y").collect()[0]
        assert out.rho == 1.0

    def test_perfect_inverse(self, spark):
        from saber_spark.operators.groupstats import spearman_rho
        out = spearman_rho(self._df(spark, [1, 2, 3], [9, 5, 1]),
                           "x", "y").collect()[0]
        assert out.rho == -1.0

    def test_hand_computed_partial(self, spark):
        from saber_spark.operators.groupstats import spearman_rho
        # rank pairs (1,1),(2,3),(3,2),(4,4) -> rho = 4/5
        out = spearman_rho(self._df(spark, [1, 2, 3, 4], [1, 3, 2, 4]),
                           "x", "y").collect()[0]
        assert out.rho == 0.8

    def test_constant_column_null(self, spark):
        from saber_spark.operators.groupstats import spearman_rho
        out = spearman_rho(self._df(spark, [1, 2, 3], [7, 7, 7]),
                           "x", "y").collect()[0]
        assert out.rho is None


class TestKendallTau:
    def _df(self, spark, xs, ys):
        return spark.createDataFrame(list(zip(xs, ys)), "x long, y long")

    def test_perfect_concordance(self, spark):
        from saber_spark.operators.groupstats import kendall_tau
        out = kendall_tau(self._df(spark, [1, 2, 3], [10, 20, 30]),
                          "x", "y").collect()[0]
        assert (out.concordant, out.discordant) == (3, 0)
        assert out.tau_b == 1.0

    def test_perfect_discordance(self, spark):
        from saber_spark.operators.groupstats import kendall_tau
        out = kendall_tau(self._df(spark, [1, 2, 3], [30, 20, 10]),
                          "x", "y").collect()[0]
        assert out.tau_b == -1.0

    def test_tie_corrected_hand_value(self, spark):
        from saber_spark.operators.groupstats import kendall_tau
        # C=4 D=0, one x-tie pair, one y-tie pair -> 4/sqrt(25) = 0.8
        out = kendall_tau(self._df(spark, [1, 2, 2, 3], [1, 2, 3, 3]),
                          "x", "y").collect()[0]
        assert (out.concordant, out.discordant) == (4, 0)
        assert out.tau_b == 0.8

    def test_constant_column_null(self, spark):
        from saber_spark.operators.groupstats import kendall_tau
        out = kendall_tau(self._df(spark, [5, 5, 5], [1, 2, 3]),
                          "x", "y").collect()[0]
        assert out.tau_b is None


class TestChisqIndependence:
    def _df(self, spark, cells):
        rows = [(a, b) for a, b, n in cells for _ in range(n)]
        return spark.createDataFrame(rows, "a string, b string")

    def test_independent_is_zero(self, spark):
        from saber_spark.operators.profile import chisq_independence
        df = self._df(spark, [("a1", "b1", 2), ("a1", "b2", 2),
                              ("a2", "b1", 2), ("a2", "b2", 2)])
        out = chisq_independence(df, "a", "b").collect()[0]
        assert out.chi2 == 0.0 and out.cramers_v == 0.0
        assert out.dof == 1

    def test_perfect_association(self, spark):
        from saber_spark.operators.profile import chisq_independence
        df = self._df(spark, [("a1", "b1", 3), ("a2", "b2", 3)])
        out = chisq_independence(df, "a", "b").collect()[0]
        # zero cells enter via the o^2/e - n identity: chi2 = n
        assert out.chi2 == 6.0 and out.cramers_v == 1.0

    def test_hand_computed_2x2(self, spark):
        from saber_spark.operators.profile import chisq_independence
        df = self._df(spark, [("a1", "b1", 10), ("a1", "b2", 20),
                              ("a2", "b1", 20), ("a2", "b2", 10)])
        out = chisq_independence(df, "a", "b").collect()[0]
        assert out.chi2 == round(1000 * 60 / 900 - 60, 6)
        assert out.cramers_v == round(math.sqrt((1000 * 60 / 900 - 60)
                                                / 60), 6)


class TestEntropyRate:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    def test_deterministic_alternation(self, spark):
        from saber_spark.operators.lm import entropy_rate
        out = entropy_rate(self._docs(spark, ["a b a b a"]),
                           r"[0-9a-zA-Z]+").collect()[0]
        # context fully determines the next token -> H2 = 0
        assert out.h_bigram_rate == 0.0 and out.ppl_bigram == 1.0
        assert out.h_unigram == round(math.log(2), 6)
        assert out.ppl_unigram == 2.0

    def test_hand_computed_mixed(self, spark):
        from saber_spark.operators.lm import entropy_rate
        out = entropy_rate(self._docs(spark, ["a a b b"]),
                           r"[0-9a-zA-Z]+").collect()[0]
        # bigrams aa ab bb; p(next|a) = 1/2 -> H2 = (2/3) ln 2
        assert out.n_bigrams == 3
        assert out.h_bigram_rate == round(2 / 3 * math.log(2), 6)

    def test_no_cross_document_bigrams(self, spark):
        from saber_spark.operators.lm import entropy_rate
        out = entropy_rate(self._docs(spark, ["a b", "b a"]),
                           r"[0-9a-zA-Z]+").collect()[0]
        assert out.n_bigrams == 2  # never (b, b) across the doc gap
        assert out.h_bigram_rate == 0.0


class TestSStemmer:
    def test_rule_table(self, spark):
        from saber_spark.operators.vocab import s_stem
        cases = {
            "queries": "query",   # -ies -> -y
            "ponies": "pony",
            "daies": "daies",     # -aies exception
            "tables": "table",    # -es -> -e (drop the s)
            "batches": "batche",  # Harman's documented behavior
            "shoes": "shoes",     # -oes exception
            "trees": "trees",     # -ees exception
            "cats": "cat",        # -s -> ''
            "bus": "bus",         # -us exception
            "class": "class",     # -ss exception
            "table": "table",     # no suffix -> unchanged
        }
        df = spark.createDataFrame([(w,) for w in cases], "w string")
        out = {r.w: r.stem for r in
               df.select("w", s_stem("w").alias("stem")).collect()}
        assert out == cases

    def test_stem_collapse_groups(self, spark):
        from saber_spark.operators.vocab import stem_collapse
        toks = spark.createDataFrame(
            [("table",), ("tables",), ("query",), ("queries",),
             ("scan",)], "token string")
        out = {r.stem: r for r in stem_collapse(toks).collect()}
        assert set(out) == {"table", "query"}
        assert out["table"].n_variants == 2
        assert out["table"].n_tokens == 2


class TestControlChart:
    def _events(self, spark, hourly_counts):
        import datetime as dt
        t0 = dt.datetime(2024, 1, 1)
        rows = [(t0 + dt.timedelta(hours=h, minutes=m),)
                for h, c in enumerate(hourly_counts)
                for m in range(c)]
        return spark.createDataFrame(rows, "ts timestamp")

    def test_spike_flagged_high(self, spark):
        from saber_spark.operators.timeseries import control_chart
        out = control_chart(
            self._events(spark, [5, 5, 5, 5, 50])).collect()
        assert len(out) == 1
        r = out[0]
        # xbar = 14, MRbar = 45/4
        assert r.x == 50 and r.side == "high"
        assert r.xbar == 14.0 and r.mr_bar == 11.25
        assert r.ucl == round(14 + 2.66 * 11.25, 6)

    def test_stable_series_no_alerts(self, spark):
        from saber_spark.operators.timeseries import control_chart
        assert control_chart(
            self._events(spark, [7, 7, 7, 7])).count() == 0

    def test_empty_hour_can_violate_low(self, spark):
        from saber_spark.operators.timeseries import control_chart
        # hour 2 has no events at all -> densified 0 breaches k=1 LCL
        out = control_chart(
            self._events(spark, [10, 10, 0, 10, 10, 10]),
            k=1.0).collect()
        assert any(r.x == 0 and r.side == "low" for r in out)


class TestMojibakeAudit:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    def test_detects_each_marker(self, spark):
        from saber_spark.operators.textstats import mojibake_audit
        docs = self._docs(spark, [
            "cafÃ© menu",          # A-tilde double-decode
            "itâ€™s fine",    # smart-quote damage
            "xÂ y",                # NBSP damage
            "ï»¿header",      # BOM as text
            "lossy � here �",      # two replacement chars
        ])
        out = {r.marker: r for r in mojibake_audit(docs).collect()}
        assert len(out) == 5
        assert out["Ã"].n_docs_affected == 1
        assert out["â€"].n_occurrences == 1
        assert out["�"].n_occurrences == 2
        assert out["ï»¿"].n_docs_affected == 1

    def test_clean_corpus_all_zero_rows_present(self, spark):
        from saber_spark.operators.textstats import mojibake_audit
        out = mojibake_audit(
            self._docs(spark, ["plain ascii text", "more text"])).collect()
        assert len(out) == 5
        assert all(r.n_occurrences == 0 for r in out)


def _ev_stream(spark, streams, day_step=0):
    """streams: {user: [type,...]} -> events with ts/event_id ordering."""
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for u, types in streams.items():
        for i, t in enumerate(types):
            rows.append((u, t, t0 + dt.timedelta(hours=i), eid))
            eid += 1
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long")


class TestSeqPatterns:
    def test_gap_subsequence_support(self, spark):
        from saber_spark.operators.sessions import seq_patterns
        ev = _ev_stream(spark, {1: ["a", "x", "b"],   # a before b (gap)
                                2: ["b", "a"],        # b before a
                                3: ["a", "a"]})       # no pair
        out = {(r.first_type, r.then_type): r for r in
               seq_patterns(ev, min_support=1).collect()}
        assert out[("a", "b")].support == 1
        assert out[("b", "a")].support == 1
        assert ("a", "a") not in out
        # user 1 also has a->x and x->b
        assert out[("a", "x")].support == 1

    def test_one_count_per_user(self, spark):
        from saber_spark.operators.sessions import seq_patterns
        ev = _ev_stream(spark, {1: ["a", "b", "a", "b"]})
        out = {(r.first_type, r.then_type): r.support for r in
               seq_patterns(ev, min_support=1).collect()}
        assert out[("a", "b")] == 1  # repeats don't inflate support
        assert out[("b", "a")] == 1  # a@3 after b@2 -> also present

    def test_support_floor_and_frac(self, spark):
        from saber_spark.operators.sessions import seq_patterns
        ev = _ev_stream(spark, {1: ["a", "b"], 2: ["a", "b"],
                                3: ["b", "c"], 4: ["z"]})
        out = seq_patterns(ev, min_support=2).collect()
        assert len(out) == 1
        assert out[0].support == 2 and out[0].support_frac == 0.5


class TestKaplanMeier:
    def _events(self, spark, user_days):
        """user_days: {user: [day offsets of events]}"""
        import datetime as dt
        t0 = dt.datetime(2024, 1, 1)
        rows = [(u, t0 + dt.timedelta(days=d)) for u, ds in
                user_days.items() for d in ds]
        return spark.createDataFrame(rows, "user_id long, ts timestamp")

    def test_hand_computed_curve(self, spark):
        from saber_spark.operators.sessions import kaplan_meier
        ev = self._events(spark, {1: [0, 1], 2: [0, 1], 3: [0, 2],
                                  4: [0, 10]})
        out = {r.t_days: r for r in
               kaplan_meier(ev, censor_guard_hours=12).collect()}
        # u4's last event IS the corpus end -> censored
        assert set(out) == {1, 2}
        assert (out[1].n_risk, out[1].n_churned) == (4, 2)
        assert out[1].survival == 0.5
        assert (out[2].n_risk, out[2].n_churned) == (2, 1)
        assert out[2].survival == 0.25

    def test_all_churn_hits_zero(self, spark):
        from saber_spark.operators.sessions import kaplan_meier
        ev = self._events(spark, {1: [0, 1], 2: [0, 1], 3: [0, 30]})
        out = {r.t_days: r for r in
               kaplan_meier(ev, censor_guard_hours=12).collect()}
        # at t=1 both at-risk users churn ... but u3 (t=30) is at risk too
        assert out[1].survival == round(1 - 2 / 3, 6)

    def test_censored_never_counted_as_churn(self, spark):
        from saber_spark.operators.sessions import kaplan_meier
        # both users end at the corpus end -> all censored -> no rows
        ev = self._events(spark, {1: [0, 5], 2: [1, 5]})
        assert kaplan_meier(ev, censor_guard_hours=12).count() == 0


class TestMarkovStationary:
    def test_two_state_cycle_uniform(self, spark):
        from saber_spark.operators.sessions import markov_stationary
        ev = _ev_stream(spark, {1: ["a", "b", "a", "b", "a"]})
        out = {r.state: r.pi for r in
               markov_stationary(ev, iterations=10).collect()}
        # doubly stochastic 2-cycle: uniform is stationary from uniform
        assert out == {"a": 0.5, "b": 0.5}

    def test_biased_chain_converges(self, spark):
        from saber_spark.operators.sessions import markov_stationary
        # P: a->a 0.75, a->b 0.25; b->a 1.0 -> pi = (0.8, 0.2)
        ev = _ev_stream(spark, {1: ["a", "a", "a", "a", "b"],
                                2: ["b", "a"]})
        out = {r.state: r.pi for r in
               markov_stationary(ev, iterations=30).collect()}
        assert abs(out["a"] - 0.8) < 1e-4
        assert abs(out["a"] + out["b"] - 1.0) < 1e-6


class TestRobustLocation:
    def _df(self, spark, vals):
        return spark.createDataFrame(
            [("g", v) for v in vals], "src string, v long")

    def test_hand_computed_trim_and_winsor(self, spark):
        from saber_spark.operators.groupstats import robust_location
        out = robust_location(
            self._df(spark, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 100]),
            "src", "v", trim_frac=0.1).collect()[0]
        assert (out.n, out.k_trimmed) == (11, 1)
        assert out.mean == round(145 / 11, 6)
        assert out.trimmed_mean == 5.0     # mean of 1..9
        assert out.winsorized_mean == 5.0  # (45 + 1 + 9) / 11
        assert out.winsorized_mean < out.mean  # outlier neutralized

    def test_small_group_no_trim(self, spark):
        from saber_spark.operators.groupstats import robust_location
        out = robust_location(self._df(spark, [1, 2, 9]),
                              "src", "v", trim_frac=0.1).collect()[0]
        assert out.k_trimmed == 0
        assert out.mean == out.trimmed_mean == out.winsorized_mean == 4.0


class TestEffectSize:
    def _df(self, spark, a, b):
        rows = [("a", v) for v in a] + [("b", v) for v in b]
        return spark.createDataFrame(rows, "g string, v long")

    def test_hand_computed_d_and_g(self, spark):
        from saber_spark.operators.groupstats import effect_size
        out = effect_size(self._df(spark, [1, 2, 3], [4, 5, 6]),
                          "g", "a", "b", "v").collect()[0]
        # means 2 and 5, pooled sd 1 -> d = -3; g = d * (1 - 3/15)
        assert out.cohens_d == -3.0
        assert out.hedges_g == -2.4

    def test_equal_groups_zero(self, spark):
        from saber_spark.operators.groupstats import effect_size
        out = effect_size(self._df(spark, [1, 2, 3], [3, 2, 1]),
                          "g", "a", "b", "v").collect()[0]
        assert out.cohens_d == 0.0

    def test_zero_variance_null(self, spark):
        from saber_spark.operators.groupstats import effect_size
        out = effect_size(self._df(spark, [5, 5], [5, 5]),
                          "g", "a", "b", "v").collect()[0]
        assert out.cohens_d is None


class TestTheilSen:
    def _events(self, spark, daily_counts):
        import datetime as dt
        t0 = dt.datetime(2024, 1, 1)
        rows = [(t0 + dt.timedelta(days=d, minutes=m),)
                for d, c in enumerate(daily_counts)
                for m in range(c)]
        return spark.createDataFrame(rows, "ts timestamp")

    def test_perfect_linear(self, spark):
        import datetime as dt
        from saber_spark.operators.timeseries import theil_sen
        out = theil_sen(self._events(spark, [1, 2, 3, 4, 5])).collect()[0]
        assert out.slope_per_bucket == 1.0
        d0 = (dt.datetime(2024, 1, 1) - dt.datetime(1970, 1, 1)).days
        assert out.intercept == round(1.0 - d0, 6)
        assert out.n_pairs == 10

    def test_outlier_does_not_move_slope(self, spark):
        from saber_spark.operators.timeseries import theil_sen
        out = theil_sen(
            self._events(spark, [1, 2, 3, 4, 100])).collect()[0]
        # 6 of 10 pairwise slopes are exactly 1 -> median stays 1
        assert out.slope_per_bucket == 1.0

    def test_flat_series(self, spark):
        from saber_spark.operators.timeseries import theil_sen
        out = theil_sen(self._events(spark, [4, 4, 4, 4])).collect()[0]
        assert out.slope_per_bucket == 0.0


class TestCrossCorrelation:
    def _events(self, spark, a_counts, b_counts, b_offset):
        import datetime as dt
        t0 = dt.datetime(2024, 1, 1)
        rows = []
        for h, c in enumerate(a_counts):
            rows += [("a", t0 + dt.timedelta(hours=h, minutes=m))
                     for m in range(c)]
        for h, c in enumerate(b_counts):
            rows += [("b", t0 + dt.timedelta(hours=h + b_offset,
                                             minutes=m))
                     for m in range(c)]
        return spark.createDataFrame(rows, "event_type string, ts timestamp")

    def test_self_correlation_at_zero(self, spark):
        from saber_spark.operators.timeseries import cross_correlation
        ev = self._events(spark, [1, 3, 2, 4], [], 0)
        out = {r.lag: r.r for r in
               cross_correlation(ev, "a", "a", max_lag=1).collect()}
        assert out[0] == 1.0

    def test_hand_computed_shifted(self, spark):
        from saber_spark.operators.timeseries import cross_correlation
        # x = [2,1,2,1,0,0], y = [0,0,2,1,2,1] -> r(2) = 2/4
        ev = self._events(spark, [2, 1, 2, 1], [2, 1, 2, 1], 2)
        out = {r.lag: r.r for r in
               cross_correlation(ev, "a", "b", max_lag=3).collect()}
        assert out[2] == 0.5
        assert out[2] == max(v for v in out.values() if v is not None)

    def test_lag_window_row_counts(self, spark):
        from saber_spark.operators.timeseries import cross_correlation
        ev = self._events(spark, [1, 1, 1, 1], [], 0)
        out = {r.lag: r.n_pairs for r in
               cross_correlation(ev, "a", "a", max_lag=2).collect()}
        assert out[0] == 4 and out[2] == 2 and out[-2] == 2


class TestBurstinessPanel:
    def _events(self, spark, user_hours):
        import datetime as dt
        t0 = dt.datetime(2024, 1, 1)
        rows = [(u, t0 + dt.timedelta(hours=h))
                for u, hs in user_hours.items() for h in hs]
        return spark.createDataFrame(rows, "user_id long, ts timestamp")

    def test_periodic_is_minus_one(self, spark):
        from saber_spark.operators.timeseries import burstiness_panel
        out = burstiness_panel(
            self._events(spark, {1: range(6)})).collect()[0]
        assert out.fano == 0.0          # constant hourly counts
        assert out.mean_gap_s == 3600.0
        assert out.cv_gap == 0.0
        assert out.burstiness == -1.0   # perfectly periodic

    def test_bursty_positive(self, spark):
        from saber_spark.operators.timeseries import burstiness_panel
        # gaps 1h,1h,1h,45h: heavy-tailed -> cv > 1 -> B > 0
        out = burstiness_panel(
            self._events(spark, {1: [0, 1, 2, 3, 48]})).collect()[0]
        assert out.cv_gap > 1.0 and out.burstiness > 0.0

    def test_gaps_never_cross_users(self, spark):
        from saber_spark.operators.timeseries import burstiness_panel
        out = burstiness_panel(
            self._events(spark, {1: [0, 1], 2: [100, 101]})).collect()[0]
        assert out.n_gaps == 2          # not 3: no inter-user gap


class TestCocitation:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    def test_hand_computed_cosine(self, spark):
        from saber_spark.operators.graph import cocitation_cosine
        e = self._edges(spark, [("s1", "a"), ("s1", "b"), ("s2", "a"),
                                ("s2", "b"), ("s3", "a"), ("s3", "c")])
        out = {(r.a, r.b): r for r in
               cocitation_cosine(e, min_common=1).collect()}
        ab = out[("a", "b")]
        assert ab.n_common == 2
        assert ab.cosine == round(2 / math.sqrt(3 * 2), 6)
        assert out[("a", "c")].cosine == round(1 / math.sqrt(3), 6)

    def test_min_common_floor(self, spark):
        from saber_spark.operators.graph import cocitation_cosine
        e = self._edges(spark, [("s1", "a"), ("s1", "b"), ("s2", "a"),
                                ("s2", "b"), ("s3", "a"), ("s3", "c")])
        out = {(r.a, r.b) for r in cocitation_cosine(e, min_common=2).collect()}
        assert out == {("a", "b")}

    def test_duplicate_edges_collapse(self, spark):
        from saber_spark.operators.graph import cocitation_cosine
        e = self._edges(spark, [("s1", "a"), ("s1", "a"), ("s1", "b")])
        out = cocitation_cosine(e, min_common=1).collect()
        assert len(out) == 1 and out[0].n_common == 1

    def test_coupling_via_reversed_edges(self, spark):
        from saber_spark.operators.graph import cocitation_cosine
        # bibliographic coupling: p1 and p2 both cite z
        e = self._edges(spark, [("p1", "z"), ("p2", "z"), ("p1", "w"),
                                ("p2", "w")])
        rev = e.select(F.col("dst").alias("src"),
                       F.col("src").alias("dst"))
        out = cocitation_cosine(rev, min_common=2).collect()
        assert len(out) == 1
        assert (out[0].a, out[0].b, out[0].n_common) == ("p1", "p2", 2)


def _hourly_events(spark, hourly_counts, day_buckets=False):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    step = dt.timedelta(days=1) if day_buckets else dt.timedelta(hours=1)
    rows = [(t0 + h * step + dt.timedelta(minutes=m),)
            for h, c in enumerate(hourly_counts) for m in range(c)]
    return spark.createDataFrame(rows, "ts timestamp")


class TestMannKendall:
    def test_strictly_increasing(self, spark):
        from saber_spark.operators.timeseries import mann_kendall
        out = mann_kendall(_hourly_events(
            spark, [1, 2, 3, 4, 5], day_buckets=True)).collect()[0]
        # all 10 pairs positive; no ties
        assert out.s == 10
        var = 5 * 4 * 15 / 18
        assert out.var_s == round(var, 6)
        assert out.z == round(9 / math.sqrt(var), 6)

    def test_tie_correction(self, spark):
        from saber_spark.operators.timeseries import mann_kendall
        out = mann_kendall(_hourly_events(
            spark, [2, 2, 3], day_buckets=True)).collect()[0]
        # pairs: (2,2)=0, (2,3)=+1, (2,3)=+1 -> S = 2
        assert out.s == 2
        # tie group t=2: term = 2*1*9 = 18 -> var = (3*2*11 - 18)/18
        assert out.var_s == round((66 - 18) / 18, 6)

    def test_flat_is_zero(self, spark):
        from saber_spark.operators.timeseries import mann_kendall
        out = mann_kendall(_hourly_events(
            spark, [4, 4, 4, 4], day_buckets=True)).collect()[0]
        assert out.s == 0 and out.z == 0.0


class TestRunsTest:
    def test_alternating_max_runs(self, spark):
        from saber_spark.operators.timeseries import runs_test
        out = runs_test(_hourly_events(
            spark, [1, 9, 1, 9, 1, 9])).collect()[0]
        # median 5, n1 = n2 = 3, alternation -> 6 runs (max)
        assert (out.n1, out.n2, out.runs) == (3, 3, 6)
        assert out.mu == 4.0
        assert out.z > 0

    def test_clumped_min_runs(self, spark):
        from saber_spark.operators.timeseries import runs_test
        out = runs_test(_hourly_events(
            spark, [1, 1, 1, 9, 9, 9])).collect()[0]
        assert out.runs == 2 and out.z < 0

    def test_median_ties_excluded(self, spark):
        from saber_spark.operators.timeseries import runs_test
        # series [1, 5, 5, 9]: median 5 -> only 1 and 9 survive
        out = runs_test(_hourly_events(spark, [1, 5, 5, 9])).collect()[0]
        assert out.n1 + out.n2 == 2 and out.runs == 2


class TestSeasonalProfile:
    def test_phase_means_and_shares(self, spark):
        from saber_spark.operators.timeseries import seasonal_profile
        # two full days: hour h has h+1 events each day (nonzero first
        # bucket, so the densified span is exactly 48 buckets)
        counts = [h + 1 for h in range(24)] * 2
        out = {r.phase: r for r in
               seasonal_profile(_hourly_events(spark, counts)).collect()}
        assert len(out) == 24
        assert all(r.n_buckets == 2 for r in out.values())
        total = sum(counts)
        for r in out.values():
            assert r.share == round(r.mean_count * 2 / total, 6)

    def test_shares_sum_to_one(self, spark):
        from saber_spark.operators.timeseries import seasonal_profile
        out = seasonal_profile(
            _hourly_events(spark, [3, 1, 4, 1, 5] * 10)).collect()
        assert abs(sum(r.share for r in out) - 1.0) < 1e-4


class TestPpmiSimilarity:
    def test_identical_context_words_cosine_one(self, spark):
        from saber_spark.operators.vocab import ppmi_similarity
        docs = {}
        for i in range(3):
            docs[2 * i] = ["x", "a", "b"]
            docs[2 * i + 1] = ["y", "a", "b"]
        out = {(r.a, r.b): r for r in
               ppmi_similarity(_tokens(spark, docs), window=2,
                               min_pair=3, min_shared=2).collect()}
        xy = out[("x", "y")]
        # x and y see exactly the contexts {a, b} with equal counts
        assert xy.n_shared == 2 and xy.cosine == 1.0

    def test_disjoint_contexts_absent(self, spark):
        from saber_spark.operators.vocab import ppmi_similarity
        docs = {}
        for i in range(3):
            docs[2 * i] = ["x", "a"]
            docs[2 * i + 1] = ["y", "b"]
        out = {(r.a, r.b) for r in
               ppmi_similarity(_tokens(spark, docs), window=2,
                               min_pair=1, min_shared=1).collect()}
        assert ("x", "y") not in out

    def test_min_pair_floor(self, spark):
        from saber_spark.operators.vocab import ppmi_similarity
        docs = {0: ["x", "a"], 1: ["y", "a"]}  # pairs occur once
        assert ppmi_similarity(_tokens(spark, docs), window=2,
                               min_pair=3, min_shared=1).count() == 0


class TestOgMeta:
    def _pages(self, spark, html):
        return spark.createDataFrame([("u1", html)], "url string, html string")

    def test_both_orders_and_decode(self, spark):
        from saber_spark.operators.structured import og_meta
        html = ('<head>'
                '<meta property="og:title" content="A &amp; B" />'
                '<meta content="article" property="og:type" />'
                '</head>')
        out = {r.og_key: r.content for r in
               og_meta(self._pages(spark, html)).collect()}
        assert out == {"og:title": "A & B", "og:type": "article"}

    def test_non_og_meta_ignored(self, spark):
        from saber_spark.operators.structured import og_meta
        html = '<meta property="twitter:card" content="x" />'
        assert og_meta(self._pages(spark, html)).count() == 0


class TestRelCanonical:
    def _pages(self, spark, rows):
        return spark.createDataFrame(rows, "url string, html string")

    def test_self_and_cross_declarations(self, spark):
        from saber_spark.operators.webstats import rel_canonical
        rows = [
            ("u1", '<link rel="canonical" href="u1" />'),
            ("u2", '<link rel="canonical" href="u1" />'),
            ("u3", "<html>no declaration</html>"),
        ]
        out = {r.url: r for r in
               rel_canonical(self._pages(spark, rows)).collect()}
        assert set(out) == {"u1", "u2"}
        assert out["u1"].self_canonical is True
        assert out["u2"].self_canonical is False
        assert out["u2"].canonical == "u1"

    def test_first_declaration_wins(self, spark):
        from saber_spark.operators.webstats import rel_canonical
        rows = [("u1", '<link rel="canonical" href="a" />'
                       '<link rel="canonical" href="b" />')]
        out = rel_canonical(self._pages(spark, rows)).collect()[0]
        assert out.canonical == "a"


class TestHorvitzThompson:
    def test_full_sampling_exact(self, spark):
        from saber_spark.operators.samples import horvitz_thompson
        df = spark.createDataFrame(
            [(i, "a", 10) for i in range(20)],
            "id long, s string, v long")
        out = horvitz_thompson(df, "id", "v", {}, "s").collect()[0]
        # pi = 1 everywhere -> estimator is exact
        assert out.n_sampled == 20
        assert out.t_hat == 200.0 and out.rel_err == 0.0

    def test_half_sampling_unbiased_form(self, spark):
        from saber_spark.operators.samples import horvitz_thompson
        from saber_spark.operators.splits import HASH_MOD, KNUTH
        df = spark.createDataFrame(
            [(i, "a", 10) for i in range(2000)],
            "id long, s string, v long")
        out = horvitz_thompson(df, "id", "v",
                               {"a": 0.5}, "s").collect()[0]
        # each sampled row contributes v/0.5 = 20
        assert out.t_hat == out.n_sampled * 20.0
        assert out.rel_err < 0.05  # hash thinning ~ uniform

    def test_uncovered_stratum_fully_sampled(self, spark):
        from saber_spark.operators.samples import horvitz_thompson
        df = spark.createDataFrame(
            [(i, "other", 5) for i in range(10)],
            "id long, s string, v long")
        out = horvitz_thompson(df, "id", "v",
                               {"a": 0.1}, "s").collect()[0]
        assert out.n_sampled == 10 and out.rel_err == 0.0


class TestNeymanAllocation:
    def _df(self, spark, strata):
        rows = [(s, v) for s, vals in strata.items() for v in vals]
        return spark.createDataFrame(rows, "src string, v long")

    def test_zero_variance_stratum_gets_nothing(self, spark):
        from saber_spark.operators.samples import neyman_allocation
        out = {r.stratum: r for r in neyman_allocation(
            self._df(spark, {"flat": [5] * 10,
                             "wild": [0, 10] * 5}),
            "src", "v", budget=100).collect()}
        assert out["flat"].alloc_neyman == 0.0
        assert out["wild"].alloc_neyman == 100.0
        # proportional would split evenly
        assert out["flat"].alloc_prop == 50.0

    def test_hand_computed_weights(self, spark):
        from saber_spark.operators.samples import neyman_allocation
        # sd(a) = 1 (values 1,3 pop sd), sd(b) = 2 (values 1,5)
        out = {r.stratum: r for r in neyman_allocation(
            self._df(spark, {"a": [1, 3], "b": [1, 5]}),
            "src", "v", budget=90).collect()}
        assert out["a"].sd == 1.0 and out["b"].sd == 2.0
        # weights 2*1 and 2*2 -> 30 / 60
        assert out["a"].alloc_neyman == 30.0
        assert out["b"].alloc_neyman == 60.0


class TestJackknifeMean:
    def _df(self, spark, groups):
        rows = [(g, v) for g, vals in groups.items() for v in vals]
        return spark.createDataFrame(rows, "src string, v long")

    def test_hand_computed_two_groups(self, spark):
        from saber_spark.operators.samples import jackknife_mean
        out = jackknife_mean(self._df(spark, {"a": [1, 1], "b": [3, 3]}),
                             "src", "v").collect()[0]
        # theta_(a) = 3, theta_(b) = 1, tbar = 2
        # var = (1/2) * ((3-2)^2 + (1-2)^2) = 1 -> se = 1
        assert out.mean == 2.0 and out.se_jack == 1.0

    def test_homogeneous_groups_zero_se(self, spark):
        from saber_spark.operators.samples import jackknife_mean
        out = jackknife_mean(self._df(spark, {"a": [4, 4], "b": [4, 4],
                                              "c": [4, 4]}),
                             "src", "v").collect()[0]
        assert out.se_jack == 0.0 and out.se_naive == 0.0

    def test_cluster_correlation_inflates_se(self, spark):
        from saber_spark.operators.samples import jackknife_mean
        # within-group constant, between-group spread: the clustered
        # design's true uncertainty >> naive iid se
        groups = {f"g{i}": [i * 10] * 50 for i in range(4)}
        out = jackknife_mean(self._df(spark, groups),
                             "src", "v").collect()[0]
        assert out.se_jack > out.se_naive


class TestQldTopk:
    def _toks(self, spark, docs):
        rows = [(d, p, t) for d, ts in docs.items()
                for p, t in enumerate(ts)]
        return spark.createDataFrame(
            rows, "doc_id long, pos long, token string")

    def test_hand_computed_scores(self, spark):
        from saber_spark.operators.retrieval import qld_topk
        toks = self._toks(spark, {0: ["q", "q", "a"], 1: ["q", "b"],
                                  2: ["c", "c"]})
        out = {r.doc_id: r for r in
               qld_topk(toks, ["q"], top_k=10, mu=1.0).collect()}
        assert set(out) == {0, 1}  # d2 has no query term
        cf, cn = 3, 7
        s0 = math.log((2 + 1 * cf / cn) / (3 + 1))
        s1 = math.log((1 + 1 * cf / cn) / (2 + 1))
        assert out[0].score == round(s0, 6)
        assert out[1].score == round(s1, 6)
        assert out[0].rank == 1  # higher likelihood ranks first

    def test_smoothing_scores_missing_terms(self, spark):
        from saber_spark.operators.retrieval import qld_topk
        # d1 contains q but not r; r exists elsewhere in the corpus ->
        # d1 still gets a (smoothed) r contribution
        toks = self._toks(spark, {0: ["q", "r"], 1: ["q", "b"]})
        out = {r.doc_id: r for r in
               qld_topk(toks, ["q", "r"], mu=1.0).collect()}
        assert out[1].n_hits == 1  # only q matched...
        assert out[0].score > out[1].score  # ...but both terms scored

    def test_oov_query_term_dropped(self, spark):
        from saber_spark.operators.retrieval import qld_topk
        toks = self._toks(spark, {0: ["q", "a"]})
        out = qld_topk(toks, ["q", "zzz"], mu=1.0).collect()
        assert len(out) == 1 and out[0].score is not None


class TestErrEval:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    def test_hand_computed_cascade(self, spark):
        from saber_spark.operators.retrieval import err_eval
        # ranks by tf of q: d0 (tf3, rel3), d1 (tf2, rel0), d2 (tf1, rel1)
        docs = self._docs(spark, ["q q q r r r", "q q x", "q r"])
        out = err_eval(docs, [("q", "r")], k=10).collect()[0]
        r1, r2, r3 = 7 / 8, 0.0, 1 / 8
        err = r1 + 0 + (1 / 3) * r3 * (1 - r1) * (1 - r2)
        assert out.err == round(err, 6)

    def test_perfect_first_result_dominates(self, spark):
        from saber_spark.operators.retrieval import err_eval
        docs = self._docs(spark, ["q q r r r", "q r r r"])
        out = err_eval(docs, [("q", "r")], k=10).collect()[0]
        # both rel 3: ERR = 7/8 + (1/2)(7/8)(1/8)
        assert out.err == round(7 / 8 + 0.5 * 7 / 8 / 8, 6)

    def test_k_truncation(self, spark):
        from saber_spark.operators.retrieval import err_eval
        docs = self._docs(spark, ["q q x", "q r"])
        out = err_eval(docs, [("q", "r")], k=1).collect()[0]
        assert out.err == 0.0  # only the rel-0 doc is inside k


class TestMmrRerank:
    def _dfs(self, spark, rels, sims):
        cand = spark.createDataFrame(
            [(d, r) for d, r in rels.items()], "doc_id string, rel double")
        sim = spark.createDataFrame(
            [(a, b, s) for (a, b), s in sims.items()],
            "a string, b string, sim double")
        return cand, sim

    def test_diversity_beats_relevance(self, spark):
        from saber_spark.operators.retrieval import mmr_rerank
        cand, sim = self._dfs(spark, {"a": 1.0, "b": 0.9, "c": 0.8},
                              {("a", "b"): 1.0})
        out = [r.doc_id for r in
               sorted(mmr_rerank(cand, sim, k=3, lam=0.7).collect(),
                      key=lambda r: r.step)]
        assert out == ["a", "c", "b"]  # near-dup b demoted below c

    def test_lambda_one_recovers_plain_ranking(self, spark):
        from saber_spark.operators.retrieval import mmr_rerank
        cand, sim = self._dfs(spark, {"a": 1.0, "b": 0.9, "c": 0.8},
                              {("a", "b"): 1.0})
        out = [r.doc_id for r in
               sorted(mmr_rerank(cand, sim, k=3, lam=1.0).collect(),
                      key=lambda r: r.step)]
        assert out == ["a", "b", "c"]

    def test_first_pick_is_pure_relevance(self, spark):
        from saber_spark.operators.retrieval import mmr_rerank
        cand, sim = self._dfs(spark, {"a": 0.5, "b": 0.9},
                              {("a", "b"): 1.0})
        out = mmr_rerank(cand, sim, k=1, lam=0.5).collect()
        assert out[0].doc_id == "b" and out[0].mmr == 0.45


class TestNysiisKey:
    def _keys(self, spark, names):
        from saber_spark.operators.canonicalize import nysiis_key
        df = spark.createDataFrame([(n,) for n in names], "n string")
        return {r.n: r.k for r in
                df.select("n", nysiis_key(F.col("n")).alias("k")).collect()}

    def test_classic_conflations(self, spark):
        k = self._keys(spark, ["MacDonald", "McDonald", "phone", "fone",
                               "cats", "cat"])
        assert k["MacDonald"] == k["McDonald"]
        assert k["phone"] == k["fone"]
        assert k["cats"] == k["cat"]

    def test_differs_from_soundex_style(self, spark):
        from saber_spark.operators.canonicalize import phonetic_key
        # the two keys must be INDEPENDENT blockings, not clones
        df = None
        k1 = self._keys(spark, ["blue gear", "blue bolt"])
        assert k1["blue gear"] != k1["blue bolt"]

    def test_first_char_preserved(self, spark):
        k = self._keys(spark, ["widget", "ring"])
        assert k["widget"].startswith("w") and k["ring"].startswith("r")


class TestDiceBigram:
    def _sim(self, spark, a, b):
        from saber_spark.operators.canonicalize import (
            dice_bigram_similarity)
        df = spark.createDataFrame([(a, b)], "x string, y string")
        return df.select(dice_bigram_similarity(
            F.col("x"), F.col("y")).alias("d")).collect()[0].d

    def test_hand_computed(self, spark):
        # night/nacht share only 'ht' -> 2*1/(4+4)
        assert self._sim(spark, "night", "nacht") == 0.25

    def test_identical_is_one(self, spark):
        assert self._sim(spark, "widget", "widget") == 1.0

    def test_transposition_damage_is_local(self, spark):
        # a tail transposition only destroys the bigrams it touches:
        # abcdefgh vs abcdefhg share ab..ef -> 2*5/(7+7)
        assert self._sim(spark, "abcdefgh", "abcdefhg") == 10 / 14

    def test_short_string_zero(self, spark):
        assert self._sim(spark, "a", "abc") == 0.0

    def test_verified_pairs_blocks_first(self, spark):
        from saber_spark.operators.canonicalize import dice_verified_pairs
        names = spark.createDataFrame(
            [(1, "phone"), (2, "fone"), (3, "zebra")],
            "id long, name string")
        out = dice_verified_pairs(names, "name", "id",
                                  threshold=0.0).collect()
        # zebra shares no NYSIIS block -> never compared
        assert {(r.id_a, r.id_b) for r in out} == {(1, 2)}


class TestKatzCentrality:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    def test_hand_computed_chain(self, spark):
        from saber_spark.operators.graph import katz_centrality
        e = self._edges(spark, [("a", "b"), ("b", "c")])
        out = {r.node: r.katz for r in
               katz_centrality(e, alpha=0.5, k_max=3).collect()}
        # walks into b: a->b (0.5); into c: b->c (0.5) + a->b->c (0.25)
        assert out == {"a": 0.0, "b": 0.5, "c": 0.75}

    def test_star_hub(self, spark):
        from saber_spark.operators.graph import katz_centrality
        e = self._edges(spark, [("x", "h"), ("y", "h"), ("z", "h")])
        out = {r.node: r.katz for r in
               katz_centrality(e, alpha=0.1, k_max=4).collect()}
        assert out["h"] == round(0.3, 6)

    def test_truncation_depth(self, spark):
        from saber_spark.operators.graph import katz_centrality
        # a->b->c->d with k_max=2: d gets len-1 (0.5) + len-2 (0.25),
        # the len-3 walk from a is cut off
        e = self._edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        out = {r.node: r.katz for r in
               katz_centrality(e, alpha=0.5, k_max=2).collect()}
        assert out["d"] == 0.75


class TestCtLang:
    def _docs(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string")

    def test_separable_languages_classified(self, spark):
        from saber_spark.operators.classify import ct_lang_confusion
        # two 'languages' with disjoint trigram inventories; enough
        # docs that every hash bucket has train data
        rows = []
        for i in range(40):
            rows.append((2 * i, "aaa bbb aaa bbb aaa", "xx"))
            rows.append((2 * i + 1, "zzz yyy zzz yyy zzz", "yy"))
        out = {(r.true_lang, r.pred_lang): r.n_docs for r in
               ct_lang_confusion(self._docs(spark, rows),
                                 top_k=10).collect()}
        assert all(t == p for (t, p) in out)  # perfect diagonal

    def test_out_of_place_prefers_matching_profile(self, spark):
        from saber_spark.operators.classify import ct_lang_confusion
        rows = []
        for i in range(60):
            rows.append((2 * i, "the cat sat on the mat", "en"))
            rows.append((2 * i + 1, "der hund lief im wald", "de"))
        out = {(r.true_lang, r.pred_lang): r.n_docs for r in
               ct_lang_confusion(self._docs(spark, rows),
                                 top_k=20).collect()}
        diag = sum(n for (t, p), n in out.items() if t == p)
        total = sum(out.values())
        assert diag == total


class TestTokenAdaptation:
    def test_hand_computed(self, spark):
        from saber_spark.operators.vocab import token_adaptation
        toks = _tokens(spark, {0: ["x", "x", "y"], 1: ["x"],
                               2: ["y"], 3: ["z"]})
        out = {r.token: r for r in
               token_adaptation(toks, min_df=1).collect()}
        x = out["x"]
        # x: df1=2 (docs 0,1), df2=1 (doc 0); N=4
        assert (x.df1, x.df2) == (2, 1)
        assert x.prior == 0.5 and x.adaptation == 0.5
        assert x.lift == 1.0

    def test_bursty_token_lift(self, spark):
        from saber_spark.operators.vocab import token_adaptation
        # 'b' always repeats when present -> adaptation 1, prior 0.25
        toks = _tokens(spark, {0: ["b", "b", "b"], 1: ["a"],
                               2: ["a"], 3: ["a"]})
        out = {r.token: r for r in
               token_adaptation(toks, min_df=1).collect()}
        assert out["b"].adaptation == 1.0 and out["b"].lift == 4.0

    def test_min_df_floor(self, spark):
        from saber_spark.operators.vocab import token_adaptation
        toks = _tokens(spark, {0: ["a"], 1: ["a"], 2: ["rare"]})
        out = token_adaptation(toks, min_df=2).collect()
        assert [r.token for r in out] == ["a"]


class TestRocchioRerank:
    def _toks(self, spark, docs):
        rows = [(d, p, t) for d, ts in docs.items()
                for p, t in enumerate(ts)]
        return spark.createDataFrame(
            rows, "doc_id long, pos long, token string")

    def test_expansion_promotes_co_occurring_docs(self, spark):
        from saber_spark.operators.retrieval import rocchio_rerank
        # 'q' docs all carry 'exp'; doc 10 has q once but lots of exp
        docs = {i: ["q", "exp", "exp", "filler%d" % i] for i in range(5)}
        docs[10] = ["q", "exp", "exp", "exp", "exp", "exp"]
        docs[11] = ["q", "zzz", "zzz", "zzz", "zzz", "zzz"]
        out = {r.doc_id: r for r in rocchio_rerank(
            self._toks(spark, docs), ["q"], fb_docs=3,
            fb_terms=2).collect()}
        # the exp-heavy doc outranks the zzz doc after feedback
        assert out[10].rank < out[11].rank

    def test_candidates_limited_to_query_matches(self, spark):
        from saber_spark.operators.retrieval import rocchio_rerank
        docs = {0: ["q", "exp"], 1: ["exp", "exp"]}  # doc1 has no q
        out = rocchio_rerank(self._toks(spark, docs), ["q"],
                             fb_docs=1, fb_terms=1).collect()
        assert [r.doc_id for r in out] == [0]

    def test_deterministic_ranking(self, spark):
        from saber_spark.operators.retrieval import rocchio_rerank
        docs = {i: ["q", "a"] for i in range(4)}
        out = rocchio_rerank(self._toks(spark, docs), ["q"]).collect()
        assert [r.doc_id for r in out] == [0, 1, 2, 3]  # id tie-break
