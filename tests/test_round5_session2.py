"""Round-5 final-session batch 2: ComplEx scoring, landmark harmonic
centrality, RAKE keyphrases, k-anonymity audit, Kneser-Ney smoothing."""

import pytest
from pyspark.sql import functions as F


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


class TestComplexScore:
    def _emb(self, spark, vecs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in vecs.items()],
            "vec_id long, embedding array<float>")

    def test_four_term_expansion(self, spark):
        from saber_spark.operators.kge import complex_score
        # dim 2 -> half 1: h = (hr, hi), r = (rr, ri), t = (tr, ti)
        # cust:0 -> row 0, part:1 -> row 14 (13 offset + 1); relation row 3
        emb = self._emb(spark, {0: [0.001, 0.002], 14: [0.003, 0.001],
                                3: [0.002, 0.005], 1: [0.0, 0.0],
                                2: [0.0, 0.0], 4: [0.0, 0.0],
                                5: [0.0, 0.0], 6: [0.0, 0.0],
                                7: [0.0, 0.0], 8: [0.0, 0.0],
                                9: [0.0, 0.0], 10: [0.0, 0.0],
                                11: [0.0, 0.0], 12: [0.0, 0.0],
                                13: [0.0, 0.0], 15: [0.0, 0.0]})
        t = _triples(spark, [("cust:0", "made", "part:1")])
        out = complex_score(t, emb, {"made": 3}).collect()
        assert len(out) == 1
        # q(h)=(1,2), q(r)=(2,5), q(t)=(3,1):
        # hr*rr*tr + hi*rr*ti + hr*ri*ti - hi*ri*tr
        # = 1*2*3 + 2*2*1 + 1*5*1 - 2*5*3 = 6 + 4 + 5 - 30 = -15
        assert out[0].score == -15 and out[0].rank == 1

    def test_antisymmetric_under_reversal(self, spark):
        """The property DistMult cannot express: score(h, r, t) !=
        score(t, r, h) when the imaginary relation part is nonzero."""
        from saber_spark.operators.kge import complex_score
        emb = self._emb(spark, {0: [0.001, 0.002], 1: [0.003, 0.001],
                                2: [0.002, 0.005], 3: [0.0, 0.0]})
        fwd = _triples(spark, [("cust:0", "r", "cust:1")])
        rev = _triples(spark, [("cust:1", "r", "cust:0")])
        s_fwd = complex_score(fwd, emb, {"r": 2}).collect()[0].score
        s_rev = complex_score(rev, emb, {"r": 2}).collect()[0].score
        # real terms agree, imaginary cross terms swap and change sign:
        # fwd: 1*2*3 + 2*2*1 + 1*5*1 - 2*5*3 = 6 + 4 + 5 - 30 = -15
        # rev: 3*2*1 + 1*2*2 + 3*5*2 - 1*5*1 = 6 + 4 + 30 - 5 = 35
        assert s_fwd == -15 and s_rev == 35 and s_fwd != s_rev

    def test_odd_dim_raises(self, spark):
        from saber_spark.operators.kge import complex_score
        emb = self._emb(spark, {0: [0.001, 0.002, 0.003],
                                1: [0.001, 0.0, 0.0],
                                2: [0.0, 0.001, 0.0]})
        t = _triples(spark, [("cust:0", "r", "cust:1")])
        with pytest.raises(ValueError, match="odd"):
            complex_score(t, emb, {"r": 2})

    def test_missing_relation_row_raises(self, spark):
        from saber_spark.operators.kge import complex_score
        emb = self._emb(spark, {0: [0.001, 0.0], 1: [0.001, 0.0]})
        t = _triples(spark, [("cust:0", "r", "cust:1")])
        with pytest.raises(ValueError, match="no embedding row"):
            complex_score(t, emb, {"r": 99})


class TestHarmonicCentrality:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    def _landmarks(self, spark, nodes):
        return spark.createDataFrame([(n,) for n in nodes], "node string")

    def test_path_graph_distances(self, spark):
        from saber_spark.operators.graph import harmonic_centrality
        # a -> b -> c -> d, landmarks {a, b}
        e = self._edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        out = {r.node: (r.n_reached, r.est_harmonic)
               for r in harmonic_centrality(
                   e, self._landmarks(spark, ["a", "b"]),
                   max_depth=3).collect()}
        # d(a,b)=1 d(a,c)=2 d(a,d)=3 ; d(b,c)=1 d(b,d)=2 ; |L| = 2
        assert out["b"] == (1, round(1.0 / 2, 6))
        assert out["c"] == (2, round((1 / 2 + 1 / 1) / 2, 6))
        assert out["d"] == (2, round((1 / 3 + 1 / 2) / 2, 6))
        assert "a" not in out  # only landmark self-distances -> dropped

    def test_bfs_takes_shortest_of_multiple_paths(self, spark):
        from saber_spark.operators.graph import harmonic_centrality
        # a -> b -> c and a -> c: d(a, c) must be 1, not 2
        e = self._edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
        out = {r.node: r.est_harmonic for r in harmonic_centrality(
            e, self._landmarks(spark, ["a"]), max_depth=3).collect()}
        assert out["c"] == 1.0

    def test_max_depth_truncates(self, spark):
        from saber_spark.operators.graph import harmonic_centrality
        e = self._edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        out = {r.node for r in harmonic_centrality(
            e, self._landmarks(spark, ["a"]), max_depth=2).collect()}
        assert out == {"b", "c"}  # d is 3 hops out

    def test_unreachable_contributes_nothing(self, spark):
        from saber_spark.operators.graph import harmonic_centrality
        # two components: landmark in one, island in the other
        e = self._edges(spark, [("a", "b"), ("x", "y")])
        out = {r.node: (r.n_reached, r.est_harmonic)
               for r in harmonic_centrality(
                   e, self._landmarks(spark, ["a", "x"]),
                   max_depth=3).collect()}
        assert out["b"] == (1, round(1 / 2, 6))  # only a reaches b; /|L|=2
        assert out["y"] == (1, round(1 / 2, 6))

    def test_empty_landmarks_raise(self, spark):
        from saber_spark.operators.graph import harmonic_centrality
        e = self._edges(spark, [("a", "b")])
        with pytest.raises(ValueError, match="empty landmark"):
            harmonic_centrality(e, self._landmarks(spark, []))


class TestRakeKeywords:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    def test_rose_scoring_on_one_doc(self, spark):
        from saber_spark.operators.textstats import rake_keywords
        # stopword list: the a of and to in is it
        # phrases: "deep learning" | "deep models" | "win"
        docs = self._docs(spark, ["deep learning of deep models, a win"])
        out = {r.phrase: (r.n_words, r.score, r.rank)
               for r in rake_keywords(docs, top_k=5).collect()}
        # freq(deep)=2 deg(deep)=4 -> 2.0 ; learning 1/2 -> 2.0
        # models 1/2 -> 2.0 ; win 1/1 -> 1.0
        assert out["deep learning"] == (2, 4.0, 1)
        assert out["deep models"] == (2, 4.0, 2)  # tie -> phrase ASC
        assert out["win"] == (1, 1.0, 3)

    def test_repeated_phrase_scores_once(self, spark):
        from saber_spark.operators.textstats import rake_keywords
        docs = self._docs(spark, ["red fox. red fox. blue bird."])
        out = {r.phrase: r.score
               for r in rake_keywords(docs, top_k=5).collect()}
        # red: freq 2, deg 4 -> 2 ; fox: same -> phrase = 4.0 (not doubled)
        assert out["red fox"] == 4.0
        assert out["blue bird"] == 4.0

    def test_word_multiplicity_inside_phrase(self, spark):
        from saber_spark.operators.textstats import rake_keywords
        docs = self._docs(spark, ["big big win"])
        out = {r.phrase: r.score
               for r in rake_keywords(docs, top_k=5).collect()}
        # one phrase of 3 words: big freq 2 deg 6 -> 3 ; win 1/3 -> 3
        # phrase = 3 + 3 + 3 = 9
        assert out["big big win"] == 9.0

    def test_max_words_cap_drops_long_runs(self, spark):
        from saber_spark.operators.textstats import rake_keywords
        docs = self._docs(spark, ["alpha beta gamma delta epsilon, zeta"])
        out = {r.phrase for r in rake_keywords(
            docs, max_words=4, top_k=5).collect()}
        assert out == {"zeta"}  # 5-word run exceeds the cap entirely

    def test_stopwords_and_punct_delimit(self, spark):
        from saber_spark.operators.textstats import rake_keywords
        docs = self._docs(spark, ["cats and dogs; fish"])
        out = {r.phrase for r in rake_keywords(docs, top_k=5).collect()}
        assert out == {"cats", "dogs", "fish"}


class TestKAnonymity:
    def test_summary_counts(self, spark):
        from saber_spark.operators.profile import k_anonymity_audit
        rows = [("us", 1, "A"), ("us", 1, "B"), ("us", 1, "A"),
                ("us", 2, "A"), ("uk", 1, "B"), ("uk", 1, "B")]
        df = spark.createDataFrame(rows, "nation string, bucket int, seg string")
        out = k_anonymity_audit(df, ["nation", "bucket"], "seg",
                                k=2, ell=2).collect()[0]
        # classes: (us,1) size 3 l 2 ; (us,2) size 1 l 1 ; (uk,1) size 2 l 1
        assert out.n_rows == 6 and out.n_classes == 3
        assert out.min_class_size == 1
        assert out.n_classes_below_k == 1 and out.n_rows_below_k == 1
        assert out.min_l_diversity == 1 and out.n_classes_below_l == 2
        assert out.k_anonymous is False and out.l_diverse is False

    def test_anonymous_when_all_classes_big_and_diverse(self, spark):
        from saber_spark.operators.profile import k_anonymity_audit
        rows = [("us", "A"), ("us", "B"), ("us", "C"),
                ("uk", "A"), ("uk", "B")]
        df = spark.createDataFrame(rows, "nation string, seg string")
        out = k_anonymity_audit(df, ["nation"], "seg", k=2, ell=2).collect()[0]
        assert out.k_anonymous is True and out.l_diverse is True
        assert out.n_classes_below_k == 0 and out.n_rows_below_k == 0

    def test_null_quasi_identifier_is_a_class(self, spark):
        from saber_spark.operators.profile import k_anonymity_audit
        rows = [(None, "A"), (None, "B"), ("us", "A"), ("us", "B")]
        df = spark.createDataFrame(rows, "nation string, seg string")
        out = k_anonymity_audit(df, ["nation"], "seg", k=2, ell=2).collect()[0]
        assert out.n_classes == 2 and out.k_anonymous is True


class TestKneserNey:
    PAT = r"[0-9a-zA-Z]+|[^0-9a-zA-Z\s]"

    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    def test_continuation_vs_frequency(self, spark):
        """The KN signature: 'francisco' is frequent but follows only one
        context, so its continuation probability collapses below a rarer
        word that follows many contexts."""
        from saber_spark.operators.lm import kneser_ney_bigrams
        docs = self._docs(spark, [
            "san francisco san francisco san francisco",
            "red cat blue cat green cat",
        ])
        out = {(r.w1, r.w2): r for r in kneser_ney_bigrams(
            docs, self.PAT, top_k=50).collect()}
        fr = out[("san", "francisco")]
        cat = out[("blue", "cat")]
        # francisco follows 1 context; cat follows 3
        assert fr.n1plus_bwd == 1 and cat.n1plus_bwd == 3
        assert cat.p_cont > fr.p_cont

    def test_exact_probability(self, spark):
        from saber_spark.operators.lm import kneser_ney_bigrams
        docs = self._docs(spark, ["a b a b a c"])
        out = {(r.w1, r.w2): r for r in kneser_ney_bigrams(
            docs, self.PAT, discount=0.75, top_k=50).collect()}
        # bigrams: (a,b)x2 (b,a)x2 (a,c)x1 ; types T = 3
        # c(a)=3, N1+(a,*)=2 ; N1+(*,b)=1 ; P_cont(b)=1/3
        # P_kn(b|a) = (2-.75)/3 + .75*2/3 * (1/3)
        ab = out[("a", "b")]
        assert ab.c12 == 2 and ab.c1 == 3
        assert ab.n1plus_fwd == 2 and ab.n1plus_bwd == 1
        expected = (2 - 0.75) / 3 + 0.75 * 2 / 3 * (1 / 3)
        assert ab.p_kn == round(expected, 6)

    def test_probabilities_sum_to_one_per_context(self, spark):
        """Interpolated KN is a proper conditional distribution: for a
        context with ALL continuations observed, sum_w2 P_kn(w2|w1) = 1."""
        from saber_spark.operators.lm import kneser_ney_bigrams
        docs = self._docs(spark, ["x y x z x y"])
        rows = kneser_ney_bigrams(docs, self.PAT, top_k=50).collect()
        # context x: continuations y (x2), z (x1); vocabulary of observed
        # SECOND slots is exactly {y, z, x} but only y,z follow x... sum
        # over observed (x, *) rows + the backoff mass spread over the
        # remaining continuation types must equal 1:
        # sum_observed P_kn + d*N1+(x,*)/c(x) * sum_unobserved P_cont = 1
        x_rows = [r for r in rows if r.w1 == "x"]
        obs = sum(r.p_kn for r in x_rows)
        d, c1 = 0.75, 3
        n1f = x_rows[0].n1plus_fwd
        all_pcont = {r.w2: r.p_cont for r in rows}
        unobs = set(all_pcont) - {r.w2 for r in x_rows}
        backoff = d * n1f / c1 * sum(all_pcont[w] for w in unobs)
        assert abs(obs + backoff - 1.0) < 1e-5

    def test_top_k_by_count(self, spark):
        from saber_spark.operators.lm import kneser_ney_bigrams
        docs = self._docs(spark, ["p q p q p q r s"])
        rows = kneser_ney_bigrams(docs, self.PAT, top_k=2).collect()
        assert len(rows) == 2
        assert {(r.w1, r.w2) for r in rows} == {("p", "q"), ("q", "p")}


class TestIfpSameas:
    def _triples(self, spark, rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string")

    def test_shared_key_infers_identity(self, spark):
        from saber_spark.operators.ontology import ifp_sameas
        t = self._triples(spark, [
            ("e1", "email", "x@y.z"), ("e2", "email", "x@y.z"),
            ("e3", "email", "other@y.z"),
            ("e1", "name", "shared"), ("e3", "name", "shared"),
        ])
        out = {(r.a, r.b): r.n_witnesses
               for r in ifp_sameas(t, ["email"]).collect()}
        # name is NOT declared inverse-functional -> no (e1, e3) pair
        assert out == {("e1", "e2"): 1}

    def test_multiple_witnesses_counted(self, spark):
        from saber_spark.operators.ontology import ifp_sameas
        t = self._triples(spark, [
            ("e1", "email", "x@y.z"), ("e2", "email", "x@y.z"),
            ("e1", "vat", "V1"), ("e2", "vat", "V1"),
        ])
        out = ifp_sameas(t, ["email", "vat"]).collect()
        assert len(out) == 1 and out[0].n_witnesses == 2

    def test_placeholder_fanout_excluded(self, spark):
        from saber_spark.operators.ontology import ifp_sameas
        rows = [(f"e{i}", "email", "info@example.com") for i in range(10)]
        rows += [("a1", "email", "real@y.z"), ("a2", "email", "real@y.z")]
        out = ifp_sameas(self._triples(spark, rows), ["email"],
                         max_fan=5).collect()
        # the 10-subject placeholder would emit 45 pairs; guard drops it
        assert [(r.a, r.b) for r in out] == [("a1", "a2")]

    def test_duplicate_assertions_count_once(self, spark):
        from saber_spark.operators.ontology import ifp_sameas
        t = self._triples(spark, [
            ("e1", "email", "x@y.z"), ("e1", "email", "x@y.z"),
            ("e2", "email", "x@y.z"),
        ])
        out = ifp_sameas(t, ["email"]).collect()
        assert len(out) == 1 and out[0].n_witnesses == 1

    def test_empty_pred_list_raises(self, spark):
        import pytest as _pt
        from saber_spark.operators.ontology import ifp_sameas
        with _pt.raises(ValueError, match="empty"):
            ifp_sameas(self._triples(spark, [("a", "p", "b")]), [])


class TestDisjointAudit:
    def _types(self, spark, rows):
        return spark.createDataFrame(rows, "entity string, type string")

    def test_violation_detected_in_canonical_order(self, spark):
        from saber_spark.operators.ontology import disjoint_audit
        t = self._types(spark, [("x", "Disease"), ("x", "Gene"),
                                ("y", "Disease")])
        out = disjoint_audit(t, [("Gene", "Disease")]).collect()
        assert [(r.entity, r.type_a, r.type_b) for r in out] == [
            ("x", "Disease", "Gene")]  # axiom order normalized

    def test_undeclared_pair_not_flagged(self, spark):
        from saber_spark.operators.ontology import disjoint_audit
        t = self._types(spark, [("x", "Disease"), ("x", "Chemical")])
        out = disjoint_audit(t, [("Gene", "Disease")]).collect()
        assert out == []

    def test_duplicate_assertions_one_row(self, spark):
        from saber_spark.operators.ontology import disjoint_audit
        t = self._types(spark, [("x", "A"), ("x", "A"), ("x", "B")])
        out = disjoint_audit(t, [("A", "B")]).collect()
        assert len(out) == 1

    def test_self_disjoint_axiom_raises(self, spark):
        import pytest as _pt
        from saber_spark.operators.ontology import disjoint_audit
        with _pt.raises(ValueError, match="disjoint with itself"):
            disjoint_audit(self._types(spark, [("x", "A")]), [("A", "A")])

    def test_empty_axioms_raise(self, spark):
        import pytest as _pt
        from saber_spark.operators.ontology import disjoint_audit
        with _pt.raises(ValueError, match="empty axiom"):
            disjoint_audit(self._types(spark, [("x", "A")]), [])


class TestEvalSemeval:
    def _chunks(self, spark, rows):
        return spark.createDataFrame(
            rows, "seq_id long, label string, chunk_start long, "
                  "chunk_end long")

    def _modes(self, spark, gold, pred):
        from saber_spark.operators.evaluation import evaluate_chunks_semeval
        out = evaluate_chunks_semeval(
            self._chunks(spark, gold), self._chunks(spark, pred),
            extra_keys=["seq_id"]).collect()
        return {r.mode: r for r in out}

    def test_textbook_categories(self, spark):
        # gold: [0,2) PER, [5,8) LOC ; pred: [0,2) PER (strict COR),
        # [5,7) LOC (overlap, right label), [9,10) ORG (spurious)
        gold = [(1, "PER", 0, 2), (1, "LOC", 5, 8)]
        pred = [(1, "PER", 0, 2), (1, "LOC", 5, 7), (1, "ORG", 9, 10)]
        m = self._modes(spark, gold, pred)
        s = m["strict"]
        assert (s.cor, s.inc, s.par, s.mis, s.spu) == (1, 1, 0, 0, 1)
        e = m["exact"]
        assert (e.cor, e.inc, e.par, e.mis, e.spu) == (1, 1, 0, 0, 1)
        p = m["partial"]
        assert (p.cor, p.inc, p.par, p.mis, p.spu) == (1, 0, 1, 0, 1)
        t = m["type"]
        assert (t.cor, t.inc, t.par, t.mis, t.spu) == (2, 0, 0, 0, 1)
        # partial: P = (1 + 0.5) / 3, R = (1 + 0.5) / 2
        assert p.precision == 0.5 and p.recall == 0.75

    def test_wrong_label_exact_span(self, spark):
        gold = [(1, "PER", 0, 2)]
        pred = [(1, "ORG", 0, 2)]
        m = self._modes(spark, gold, pred)
        assert m["strict"].cor == 0 and m["strict"].inc == 1
        assert m["exact"].cor == 1          # boundaries-only mode forgives
        assert m["type"].cor == 0 and m["type"].inc == 1
        assert m["partial"].cor == 1        # exact boundary = full credit

    def test_missed_gold_counts_mis(self, spark):
        gold = [(1, "PER", 0, 2), (2, "PER", 0, 2)]
        pred = [(1, "PER", 0, 2)]
        m = self._modes(spark, gold, pred)
        assert m["strict"].mis == 1 and m["strict"].spu == 0
        assert m["strict"].recall == 0.5 and m["strict"].precision == 1.0

    def test_sequence_key_isolates(self, spark):
        # same span in a DIFFERENT sequence must not match
        gold = [(1, "PER", 0, 2)]
        pred = [(2, "PER", 0, 2)]
        m = self._modes(spark, gold, pred)
        assert m["strict"].spu == 1 and m["strict"].mis == 1

    def test_matches_kernel_on_exact_tp(self, spark):
        """strict-mode COR must equal evaluate_chunks' exact-criteria TP
        (the two formulations share semantics on exact matches)."""
        from saber_spark.operators.evaluation import evaluate_chunks
        gold = [(1, "A", 0, 2), (1, "B", 3, 5), (2, "A", 1, 4)]
        pred = [(1, "A", 0, 2), (1, "B", 3, 6), (2, "A", 1, 4)]
        m = self._modes(spark, gold, pred)
        tp = (evaluate_chunks(self._chunks(spark, gold),
                              self._chunks(spark, pred),
                              criteria="exact", extra_keys=["seq_id"])
              .agg(F.sum("tp")).collect()[0][0])
        assert m["strict"].cor == tp == 2


class TestFoldedBlocks:
    def test_fold_reunites_variants(self, spark):
        from saber_spark.operators.canonicalize import folded_blocks
        names = spark.createDataFrame(
            [("Müller",), ("MÜLLER",), ("Muller",), ("Ødegård",),
             ("Odegard",), ("Smith",)], "name string")
        out = {r.folded: (r.n_rows, r.n_variants)
               for r in folded_blocks(names).collect()}
        assert out["muller"] == (3, 3)
        assert out["odegard"] == (2, 2)
        assert out["smith"] == (1, 1)

    def test_fold_map_is_aligned_and_lossless(self, spark):
        from saber_spark.operators.canonicalize import (FOLD_DST, FOLD_SRC,
                                                        ascii_fold)
        assert len(FOLD_SRC) == len(FOLD_DST)
        df = spark.createDataFrame([(FOLD_SRC,)], "name string")
        folded = df.select(ascii_fold(F.col("name")).alias("f")).collect()
        assert folded[0].f == FOLD_DST  # every mapped char folds to ASCII

    def test_ascii_input_is_untouched_except_case(self, spark):
        from saber_spark.operators.canonicalize import ascii_fold
        df = spark.createDataFrame([("Hello World 42",)], "name string")
        assert df.select(ascii_fold(F.col("name")).alias("f")) \
            .collect()[0].f == "hello world 42"


class TestKwicSnippets:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    def test_window_and_edges(self, spark):
        from saber_spark.operators.retrieval import kwic_snippets
        docs = self._docs(spark, ["alpha beta gamma delta epsilon"])
        out = {r.pos: r.snippet for r in kwic_snippets(
            docs, "gamma", window=1).collect()}
        assert out == {2: "beta gamma delta"}
        out0 = {r.pos: r.snippet for r in kwic_snippets(
            docs, "alpha", window=2).collect()}
        assert out0 == {0: "alpha beta gamma"}  # left edge clamps
        out4 = {r.pos: r.snippet for r in kwic_snippets(
            docs, "epsilon", window=2).collect()}
        assert out4 == {4: "gamma delta epsilon"}  # right edge clamps

    def test_max_per_doc_keeps_earliest(self, spark):
        from saber_spark.operators.retrieval import kwic_snippets
        docs = self._docs(spark, ["x a x b x c x d"])
        out = sorted(r.pos for r in kwic_snippets(
            docs, "x", window=1, max_per_doc=2).collect())
        assert out == [0, 2]

    def test_absent_term_no_rows(self, spark):
        from saber_spark.operators.retrieval import kwic_snippets
        docs = self._docs(spark, ["alpha beta"])
        assert kwic_snippets(docs, "zzz").count() == 0

    def test_punctuation_tokens_count_positions(self, spark):
        from saber_spark.operators.retrieval import kwic_snippets
        # NERsuite tokenizer: ',' is its own token at pos 1
        docs = self._docs(spark, ["alpha, beta gamma"])
        out = {r.pos: r.snippet for r in kwic_snippets(
            docs, "beta", window=1).collect()}
        assert out == {2: ", beta gamma"}


class TestJsDivergence:
    def _toks(self, spark, rows):
        return spark.createDataFrame(rows, "grp string, token string")

    def test_identical_slices_zero(self, spark):
        from saber_spark.operators.vocab import unigram_js_divergence
        rows = [("a", t) for t in "x y z x".split()]
        rows += [("b", t) for t in "x y z x".split()]
        out = unigram_js_divergence(
            self._toks(spark, rows), "grp", "a", "b").collect()[0]
        assert out.jsd_nats == 0.0
        assert out.n_tokens_a == 4 and out.n_tokens_b == 4

    def test_disjoint_slices_ln2(self, spark):
        import math
        from saber_spark.operators.vocab import unigram_js_divergence
        rows = [("a", "x"), ("a", "y"), ("b", "p"), ("b", "q")]
        out = unigram_js_divergence(
            self._toks(spark, rows), "grp", "a", "b").collect()[0]
        assert out.jsd_nats == round(math.log(2), 6)

    def test_hand_computed_value(self, spark):
        import math
        from saber_spark.operators.vocab import unigram_js_divergence
        # P = {x: 1}, Q = {x: .5, y: .5}
        rows = [("a", "x"), ("a", "x"), ("b", "x"), ("b", "y")]
        out = unigram_js_divergence(
            self._toks(spark, rows), "grp", "a", "b").collect()[0]
        m_x, m_y = 0.75, 0.25
        expected = (0.5 * (1.0 * math.log(1.0 / m_x))
                    + 0.5 * (0.5 * math.log(0.5 / m_x)
                             + 0.5 * math.log(0.5 / m_y)))
        assert abs(out.jsd_nats - expected) < 2e-6
        assert out.n_types == 2

    def test_other_groups_ignored(self, spark):
        from saber_spark.operators.vocab import unigram_js_divergence
        rows = [("a", "x"), ("b", "x"), ("c", "zzz")] * 2
        out = unigram_js_divergence(
            self._toks(spark, rows), "grp", "a", "b").collect()[0]
        assert out.n_types == 1 and out.jsd_nats == 0.0


class TestChao1:
    def _items(self, spark, tokens):
        return spark.createDataFrame([(t,) for t in tokens],
                                     "item string")

    def test_hand_computed(self, spark):
        from saber_spark.operators.profile import chao1_richness
        # freqs: a:3, b:1, c:1, d:2  ->  s_obs=4, f1=2, f2=1
        # chao1 = 4 + 2*1/(2*2) = 4.5 ; unseen = 1 - 4/4.5
        toks = "a a a b c d d".split()
        out = chao1_richness(self._items(spark, toks), "item").collect()[0]
        assert (out.s_obs, out.f1, out.f2) == (4, 2, 1)
        assert out.chao1 == 4.5
        assert out.unseen_frac == round(1 - 4 / 4.5, 6)

    def test_no_singletons_means_complete(self, spark):
        from saber_spark.operators.profile import chao1_richness
        toks = "a a b b c c".split()
        out = chao1_richness(self._items(spark, toks), "item").collect()[0]
        assert out.f1 == 0 and out.chao1 == float(out.s_obs)
        assert out.unseen_frac == 0.0

    def test_defined_when_no_doubletons(self, spark):
        from saber_spark.operators.profile import chao1_richness
        toks = "a b c".split()  # all singletons, f2 = 0
        out = chao1_richness(self._items(spark, toks), "item").collect()[0]
        # bias-corrected: 3 + 3*2/(2*1) = 6
        assert out.chao1 == 6.0


class TestCaptureRecapture:
    def _df(self, spark, ids):
        return spark.createDataFrame([(i,) for i in ids], "id long")

    def test_chapman_formula(self, spark):
        from saber_spark.operators.evaluation import capture_recapture
        a = self._df(spark, range(0, 60))       # 60 caught
        b = self._df(spark, range(40, 100))     # 60 caught, 20 overlap
        out = capture_recapture(a, b, ["id"]).collect()[0]
        assert (out.n_a, out.n_b, out.n_both) == (60, 60, 20)
        n_hat = 61 * 61 / 21 - 1
        assert out.n_hat == round(n_hat, 6)
        assert out.recall_a == round(60 / n_hat, 6)

    def test_recovers_universe_under_independent_thinning(self, spark):
        """The methodological claim the operator exists for: two
        independent hash-thinned samples of a 2000-item universe give
        N-hat within a few percent of 2000."""
        from saber_spark.operators.evaluation import capture_recapture
        universe = self._df(spark, range(2000))
        ha = (F.conv(F.substring(F.md5(F.concat(F.lit("a:"),
              F.col("id").cast("string"))), 1, 8), 16, 10)
              .cast("long") % 5)
        hb = (F.conv(F.substring(F.md5(F.concat(F.lit("b:"),
              F.col("id").cast("string"))), 1, 8), 16, 10)
              .cast("long") % 5)
        a = universe.filter(ha < 4)   # ~80%
        b = universe.filter(hb < 3)   # ~60%
        out = capture_recapture(a, b, ["id"]).collect()[0]
        assert abs(out.n_hat - 2000) / 2000 < 0.05
        assert abs(out.recall_a - 0.8) < 0.05

    def test_full_overlap_degenerates_to_count(self, spark):
        from saber_spark.operators.evaluation import capture_recapture
        a = self._df(spark, range(10))
        out = capture_recapture(a, a, ["id"]).collect()[0]
        assert out.n_hat == 10.0 and out.recall_a == 1.0

    def test_duplicates_collapse(self, spark):
        from saber_spark.operators.evaluation import capture_recapture
        a = self._df(spark, [1, 1, 2])
        b = self._df(spark, [2, 2, 3])
        out = capture_recapture(a, b, ["id"]).collect()[0]
        assert (out.n_a, out.n_b, out.n_both) == (2, 2, 1)
