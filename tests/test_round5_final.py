"""Round-5 final batch: product-quantization codes, quote attribution,
nDCG ranking eval, approximate FD mining."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_001


class TestPQCodes:
    def _emb(self, spark, vecs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>")

    def test_codebook_vectors_encode_to_themselves(self, spark):
        from saber_spark.operators.similarity import pq_codes
        # 4 codebook vectors, dim 8, m=2 -> each codebook vector's best
        # codeword in every subspace is itself at dist2 = 0
        vecs = [[i + 0.1 * j for j in range(8)] for i in range(4)]
        out = pq_codes(self._emb(spark, vecs), m=2, n_codes=4).collect()
        assert len(out) == 4 * 2
        for r in out:
            if r.vec_id < 4:
                assert r.code == r.vec_id and r.dist2 == 0

    def test_assignment_is_nearest_and_tiebreak_lowest_code(self, spark):
        from saber_spark.operators.similarity import pq_codes
        # codewords 0/1 differ only in the first component (0 vs 10);
        # vector 2 sits at exactly 5 -> equidistant -> code 0 wins the tie
        vecs = [[0.0, 0, 0, 0], [10.0, 0, 0, 0], [5.0, 0, 0, 0],
                [9.0, 0, 0, 0]]
        got = {(r.vec_id, r.code) for r in
               pq_codes(self._emb(spark, vecs), m=1, n_codes=2).collect()}
        assert (2, 0) in got      # tie -> lowest code
        assert (3, 1) in got      # nearest (9 closer to 10)

    def test_dim_not_divisible_raises(self, spark):
        import pytest

        from saber_spark.operators.similarity import pq_codes
        with pytest.raises(ValueError, match="not divisible"):
            pq_codes(self._emb(spark, [[1.0, 2, 3], [4.0, 5, 6]]),
                     m=2, n_codes=2)

    def test_non_contiguous_ids_raise(self, spark):
        import pytest

        from saber_spark.operators.similarity import pq_codes
        df = spark.createDataFrame([(5, [1.0, 2.0])],
                                   "vec_id long, embedding array<float>")
        with pytest.raises(ValueError, match="contiguous"):
            pq_codes(df, m=1, n_codes=2)

    def test_row_shape_on_testdata(self, spark):
        from saber_spark.operators.similarity import pq_codes
        emb = spark.read.parquet(f"{SF_DIR_001}/embeddings.parquet")
        out = pq_codes(emb, m=4, n_codes=8)
        n = emb.count()
        assert out.count() == n * 4
        assert out.columns == ["vec_id", "sub_id", "code", "dist2"]


class TestQuoteAttribution:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_both_frames(self, spark):
        from saber_spark.operators.structured import quote_attribution
        txt = ('Dr. Chen said "the model converged." '
               '"we shipped it," replied Dean Park.')
        rows = quote_attribution(self._docs(spark, [(1, txt)])).collect()
        by_frame = {r.frame: r for r in rows}
        d = by_frame["direct"]
        assert (d.speaker, d.quote, d.cue) == (
            "Dr. Chen", "the model converged.", "said")
        i = by_frame["inverted"]
        # sentence-final period stays OUTSIDE the speaker capture
        assert (i.speaker, i.quote, i.cue) == (
            "Dean Park", "we shipped it", "replied")

    def test_multiple_quotes_zip_positionally(self, spark):
        from saber_spark.operators.structured import quote_attribution
        txt = ('Ms. Ito said "alpha." Mr. Alvarez said "beta."')
        rows = sorted(
            quote_attribution(self._docs(spark, [(1, txt)])).collect(),
            key=lambda r: r.quote)
        assert [(r.speaker, r.quote) for r in rows] == [
            ("Ms. Ito", "alpha."), ("Mr. Alvarez", "beta.")]

    def test_lowercase_prose_matches_nothing(self, spark):
        from saber_spark.operators.structured import quote_attribution
        out = quote_attribution(self._docs(
            spark, [(1, 'he said "nothing" and left'), (2, None)]))
        assert out.count() == 0

    def test_fixture_short_docs_keep_only_direct_frame(self, spark):
        from saber_spark.fixtures.pages import build_docs_with_quotes
        from saber_spark.operators.structured import quote_attribution
        docs = build_docs_with_quotes(spark, SF_DIR_001)
        out = quote_attribution(docs)
        counts = dict(out.groupBy("frame").count().collect())
        # every non-blank doc has the direct frame; the inverted frame
        # drops out only for docs shorter than the second slice
        assert counts["direct"] >= counts.get("inverted", 0) > 0


class TestNdcgEval:
    def test_perfect_agreement_gives_ndcg_one(self, spark):
        from saber_spark.operators.retrieval import ndcg_eval
        # tf(q) and rel-term counts rank the docs identically
        docs = spark.createDataFrame(
            [(1, "q q q r r r"), (2, "q q r r"), (3, "q r")],
            "doc_id long, text string")
        row = ndcg_eval(docs, [("q", "r")], k=10).collect()[0]
        assert row.ndcg == 1.0 and row.n_candidates == 3

    def test_known_inversion(self, spark):
        import math

        from saber_spark.operators.retrieval import ndcg_eval
        # system ranks doc1 first (tf 2 vs 1) but doc2 is the relevant one
        docs = spark.createDataFrame(
            [(1, "q q"), (2, "q r")], "doc_id long, text string")
        row = ndcg_eval(docs, [("q", "r")], k=10).collect()[0]
        dcg = 0.0 / math.log2(2) + 1.0 / math.log2(3)
        idcg = 1.0 / math.log2(2)
        assert abs(row.ndcg - round(dcg / idcg, 6)) < 1e-9

    def test_zero_idcg_yields_zero(self, spark):
        from saber_spark.operators.retrieval import ndcg_eval
        docs = spark.createDataFrame([(1, "q only")],
                                     "doc_id long, text string")
        row = ndcg_eval(docs, [("q", "absent")], k=10).collect()[0]
        assert row.ndcg == 0.0 and row.idcg == 0.0

    def test_grade_cap_at_three(self, spark):
        from saber_spark.operators.retrieval import ndcg_eval
        docs = spark.createDataFrame(
            [(1, "q r r r r r r r")], "doc_id long, text string")
        row = ndcg_eval(docs, [("q", "r")], k=10).collect()[0]
        assert row.idcg == 7.0  # (2^3 - 1) / log2(2)


class TestFdMine:
    def _df(self, spark):
        return spark.createDataFrame(
            [("a", 1, "x"), ("a", 1, "x"), ("a", 2, "x"),
             ("b", 3, "y"), ("b", 3, "z")],
            "k string, v int, w string")

    def test_exact_fd_holds(self, spark):
        from saber_spark.operators.profile import fd_mine
        rows = {(r.lhs_col, r.rhs_col): r for r in
                fd_mine(self._df(spark), [("v", "k"), ("k", "v")]).collect()}
        assert rows[("v", "k")].holds and rows[("v", "k")].g3_error == 0.0

    def test_g3_error_counts_minimum_deletions(self, spark):
        from saber_spark.operators.profile import fd_mine
        rows = {(r.lhs_col, r.rhs_col): r for r in
                fd_mine(self._df(spark),
                        [("k", "v"), ("k", "w")]).collect()}
        # k=a: keep 2 of 3; k=b: keep 2 of 2 -> g3 = 1 - 4/5
        assert rows[("k", "v")].g3_error == 0.2
        assert not rows[("k", "v")].holds
        # k=a: keep 3 of 3; k=b: keep 1 of 2 -> g3 = 1 - 4/5
        assert rows[("k", "w")].g3_error == 0.2

    def test_eps_tolerance(self, spark):
        from saber_spark.operators.profile import fd_mine
        rows = fd_mine(self._df(spark), [("k", "v")], eps=0.25).collect()
        assert rows[0].holds

    def test_null_groups_as_value(self, spark):
        from saber_spark.operators.profile import fd_mine
        df = spark.createDataFrame(
            [(None, 1), (None, 1), ("a", 2)], "k string, v int")
        row = fd_mine(df, [("k", "v")]).collect()[0]
        assert row.n_groups == 2 and row.g3_error == 0.0


class TestRdfsEntail:
    def _schema(self, spark):
        dom = spark.createDataFrame([("p", "C")], "pred string, cls string")
        rng = spark.createDataFrame([("p", "D")], "pred string, cls string")
        sub = spark.createDataFrame(
            [("C", "B"), ("B", "A"), ("D", "A")],
            "child string, parent string")
        return dom, rng, sub

    def test_rules_and_closure(self, spark):
        from saber_spark.operators.ontology import rdfs_entail
        t = spark.createDataFrame([("s", "p", "o")],
                                  "subj string, pred string, obj string")
        got = {(r.entity, r.type) for r in
               rdfs_entail(t, *self._schema(spark)).collect()}
        # rdfs2: s:C, rdfs9 up the chain: s:B, s:A; rdfs3: o:D, rdfs9: o:A
        assert got == {("s", "C"), ("s", "B"), ("s", "A"),
                       ("o", "D"), ("o", "A")}

    def test_set_semantics_no_duplicates(self, spark):
        from saber_spark.operators.ontology import rdfs_entail
        # two triples typing the same entity the same way -> one row
        t = spark.createDataFrame(
            [("s", "p", "o1"), ("s", "p", "o2")],
            "subj string, pred string, obj string")
        out = rdfs_entail(t, *self._schema(spark))
        assert out.count() == out.distinct().count()
        assert out.filter("entity = 's' AND type = 'C'").count() == 1

    def test_undeclared_predicate_entails_nothing(self, spark):
        from saber_spark.operators.ontology import rdfs_entail
        t = spark.createDataFrame([("s", "unknown", "o")],
                                  "subj string, pred string, obj string")
        assert rdfs_entail(t, *self._schema(spark)).count() == 0

    def test_driver_fast_path_matches_join_path(self, spark,
                                                monkeypatch):
        # r6: one-scan emission-array path vs broadcast-join path;
        # cap=0 forces the join branch
        from saber_spark.operators import ontology
        t = spark.createDataFrame(
            [("s", "p", "o"), ("x", "p", "s"), ("s", "unknown", "o")],
            "subj string, pred string, obj string")
        fast = sorted(map(tuple, ontology.rdfs_entail(
            t, *self._schema(spark)).collect()))
        monkeypatch.setattr(ontology, "DRIVER_SCHEMA_CAP", 0)
        slow = sorted(map(tuple, ontology.rdfs_entail(
            t, *self._schema(spark)).collect()))
        assert fast == slow and len(fast) >= 6

    def test_subprop_fast_path_matches_join_path(self, spark,
                                                 monkeypatch):
        from saber_spark.operators import ontology
        t = spark.createDataFrame(
            [("s", "placed", "o"), ("o", "contains", "q"),
             ("a", "weird", "b")],
            "subj string, pred string, obj string")
        subprops = spark.createDataFrame(
            [("placed", "commercial"), ("commercial", "related")],
            "child string, parent string")
        inverses = spark.createDataFrame(
            [("placed", "placed_by"), ("commercial", "has_part_of")],
            "pred string, inverse string")
        fast = sorted(map(tuple, ontology.subprop_entail(
            t, subprops, inverses).collect()))
        monkeypatch.setattr(ontology, "DRIVER_SCHEMA_CAP", 0)
        slow = sorted(map(tuple, ontology.subprop_entail(
            t, subprops, inverses).collect()))
        assert fast == slow and len(fast) == 7


class TestOptionalBgp:
    def test_unbound_optional_yields_null(self, spark):
        from saber_spark.operators.triples import bgp_match
        t = spark.createDataFrame(
            [("c1", "placed", "o1"), ("c2", "placed", "o2"),
             ("o1", "contains", "p1")],
            "subj string, pred string, obj string")
        rows = {r.c: r for r in bgp_match(
            t, [("?c", "placed", "?o")],
            optionals=[("?o", "contains", "?p")]).collect()}
        assert rows["c1"].p == "p1"
        assert rows["c2"].p is None

    def test_disconnected_optional_raises(self, spark):
        import pytest

        from saber_spark.operators.triples import bgp_match
        t = spark.createDataFrame(
            [("a", "p", "b")], "subj string, pred string, obj string")
        with pytest.raises(ValueError, match="OPTIONAL"):
            bgp_match(t, [("?x", "p", "?y")],
                      optionals=[("?q", "p", "?r")])


class TestSchemaMatch:
    def test_overlap_scores(self, spark):
        from saber_spark.operators.profile import schema_match
        a = spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, "z")], "id int, nm string")
        b = spark.createDataFrame(
            [(2, "p"), (3, "q"), (4, "r")], "ref int, tag string")
        rows = {(r.col_a, r.col_b): r for r in
                schema_match(a, b, ["id", "nm"], ["ref", "tag"]).collect()}
        m = rows[("id", "ref")]
        # {1,2,3} vs {2,3,4}: 2 common of 4 union
        assert (m.n_a, m.n_b, m.n_common) == (3, 3, 2)
        assert m.jaccard == 0.5 and m.containment == round(2 / 3, 6)
        # disjoint pairs never materialize
        assert ("nm", "tag") not in rows

    def test_subset_containment_full(self, spark):
        from saber_spark.operators.profile import schema_match
        a = spark.createDataFrame([(i,) for i in range(10)], "k int")
        b = spark.createDataFrame([(i,) for i in range(3)], "s int")
        m = schema_match(a, b, ["k"], ["s"]).collect()[0]
        assert m.containment == 1.0 and m.jaccard == 0.3

    def test_nulls_and_duplicates_dropped(self, spark):
        from saber_spark.operators.profile import schema_match
        a = spark.createDataFrame([("x",), ("x",), (None,)], "v string")
        b = spark.createDataFrame([("x",), (None,)], "w string")
        m = schema_match(a, b, ["v"], ["w"]).collect()[0]
        assert (m.n_a, m.n_b, m.n_common, m.jaccard) == (1, 1, 1, 1.0)


class TestTranseScore:
    def _emb(self, spark, n=8, dim=4):
        # vec i = [i, i, i, i] -> q = [1000i]*4
        return spark.createDataFrame(
            [(i, [float(i)] * dim) for i in range(n)],
            "vec_id long, embedding array<float>")

    def test_energy_is_exact_integer_l1(self, spark):
        from saber_spark.operators.kge import transe_score
        # cust:1 -placed-> order:2 with n=8: hid=1, tid=(2+7)%8=1,
        # rel vec = row 3 -> energy = sum|1000*1 + 1000*3 - 1000*1| * 4
        t = spark.createDataFrame([("cust:1", "placed", "order:2")],
                                  "subj string, pred string, obj string")
        row = transe_score(t, self._emb(spark), {"placed": 3}).collect()[0]
        assert row.energy == 4 * 3000 and row.rank == 1

    def test_plausibility_ranking(self, spark):
        from saber_spark.operators.kge import transe_score
        # rel vec row 0 = zero translation: energy = L1(h - t);
        # cust:1->cust:1 is a perfect match (energy 0), cust:1->cust:5 isn't
        t = spark.createDataFrame(
            [("cust:1", "placed", "cust:1"), ("cust:1", "placed", "cust:5")],
            "subj string, pred string, obj string")
        rows = sorted(transe_score(t, self._emb(spark),
                                   {"placed": 0}).collect(),
                      key=lambda r: r.rank)
        assert rows[0].obj == "cust:1" and rows[0].energy == 0
        assert rows[1].energy == 4 * 4000

    def test_missing_relation_row_raises(self, spark):
        import pytest

        from saber_spark.operators.kge import transe_score
        t = spark.createDataFrame([("cust:1", "placed", "order:2")],
                                  "subj string, pred string, obj string")
        with pytest.raises(ValueError, match="no embedding row"):
            transe_score(t, self._emb(spark, n=4), {"placed": 99})

    def test_unmapped_predicates_filtered(self, spark):
        from saber_spark.operators.kge import transe_score
        t = spark.createDataFrame(
            [("cust:1", "placed", "order:2"), ("cust:1", "weird", "part:3")],
            "subj string, pred string, obj string")
        out = transe_score(t, self._emb(spark), {"placed": 3})
        assert out.count() == 1

    def test_fast_path_matches_join_path(self, spark):
        # r6: the numpy fast path (embedding matrix under the broadcast
        # threshold) must emit byte-identical rows to the distributed
        # join path; disabling auto-broadcast forces the join path.
        from saber_spark.operators.kge import (complex_score,
                                               distmult_score,
                                               rotate_score, transe_score)
        t = spark.createDataFrame(
            [(f"cust:{i}", p, f"order:{(3 * i + j) % 11}")
             for i in range(12) for j, p in enumerate(("placed", "ships"))],
            "subj string, pred string, obj string")
        emb = spark.createDataFrame(
            [(i, [float((7 * i + d * d) % 13) - 6.0 for d in range(4)])
             for i in range(8)],
            "vec_id long, embedding array<float>")
        ids = {"placed": 3, "ships": 5}
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        for fn in (transe_score, distmult_score, complex_score,
                   rotate_score):
            fast = sorted(map(tuple, fn(t, emb, ids, top_k=4).collect()))
            try:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
                slow = sorted(map(tuple,
                                  fn(t, emb, ids, top_k=4).collect()))
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            assert fast == slow and len(fast) == 8, fn.__name__


class TestFactRanking:
    def test_rare_value_outranks_hub(self, spark):
        from saber_spark.operators.triples import fact_ranking
        t = spark.createDataFrame(
            [("s1", "p", "hub"), ("s2", "p", "hub"), ("s3", "p", "hub"),
             ("s1", "q", "rare")],
            "subj string, pred string, obj string")
        rows = {(r.subj, r.rank): r for r in fact_ranking(t, k=2).collect()}
        assert rows[("s1", 1)].obj == "rare"      # info 2.0 beats 0.415
        assert rows[("s1", 2)].obj == "hub"
        assert rows[("s1", 1)].n_po == 1

    def test_k_bounds_output(self, spark):
        from saber_spark.operators.triples import fact_ranking
        t = spark.createDataFrame(
            [("s", "p", f"o{i}") for i in range(5)],
            "subj string, pred string, obj string")
        out = fact_ranking(t, k=3)
        assert out.count() == 3
        # equal info -> tie-break obj ASC
        assert [r.obj for r in sorted(out.collect(),
                                      key=lambda r: r.rank)] == \
            ["o0", "o1", "o2"]


class TestInvertedIndex:
    def _toks(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, pos long, token string")

    def test_postings_positions_and_df(self, spark):
        from saber_spark.operators.retrieval import inverted_index
        idx = {(r.token, r.doc_id): r for r in inverted_index(self._toks(
            spark, [(1, 0, "a"), (1, 2, "a"), (1, 1, "b"),
                    (2, 0, "a")])).collect()}
        p = idx[("a", 1)]
        assert p.positions == [0, 2] and p.n_occ == 2 and p.doc_freq == 2
        assert idx[("b", 1)].doc_freq == 1

    def test_positions_sorted_regardless_of_input_order(self, spark):
        from saber_spark.operators.retrieval import inverted_index
        rows = inverted_index(self._toks(
            spark, [(1, 5, "x"), (1, 1, "x"), (1, 3, "x")])).collect()
        assert rows[0].positions == [1, 3, 5]


class TestPhraseSearch:
    def _toks(self, spark, words, doc_id=1):
        return spark.createDataFrame(
            [(doc_id, i, w) for i, w in enumerate(words)],
            "doc_id long, pos long, token string")

    def test_consecutive_match_only(self, spark):
        from saber_spark.operators.retrieval import phrase_search
        t = self._toks(spark, ["big", "data", "x", "data", "big"])
        rows = phrase_search(t, ["big", "data"]).collect()
        assert len(rows) == 1
        assert rows[0].match_positions == [0] and rows[0].n_matches == 1

    def test_repeated_token_overlaps(self, spark):
        from saber_spark.operators.retrieval import phrase_search
        # "b b b" -> anchors 0 and 1 for phrase "b b"
        t = self._toks(spark, ["b", "b", "b"])
        rows = phrase_search(t, ["b", "b"]).collect()
        assert rows[0].match_positions == [0, 1]

    def test_three_term_phrase_and_empty_raise(self, spark):
        import pytest

        from saber_spark.operators.retrieval import phrase_search
        t = self._toks(spark, ["a", "b", "c", "a", "b"])
        rows = phrase_search(t, ["a", "b", "c"]).collect()
        assert rows[0].match_positions == [0]
        with pytest.raises(ValueError, match="at least one"):
            phrase_search(t, [])


class TestExpectationsCheck:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, "O", 10.0), (2, "O", -5.0), (2, "X", None), (3, None, 7.0)],
            "k long, status string, price double")

    def test_all_kinds(self, spark):
        from saber_spark.operators.profile import expectations_check
        out = {r.check_name: r for r in expectations_check(self._df(spark), [
            ("k_unique", "unique", "k", None),
            ("status_not_null", "not_null", "status", None),
            ("status_domain", "accepted_values", "status", ["O", "F"]),
            ("price_floor", "min", "price", 0.0),
        ]).collect()}
        # k=2 appears twice -> 1 row must go
        assert out["k_unique"].n_violations == 1 and not out["k_unique"].passed
        assert out["status_not_null"].n_violations == 1
        # 'X' and NULL both fall outside the domain
        assert out["status_domain"].n_violations == 2
        # -5.0 below floor, NULL counts as violating
        assert out["price_floor"].n_violations == 2
        assert all(r.n_rows == 4 for r in out.values())

    def test_passing_and_unknown_kind(self, spark):
        import pytest

        from saber_spark.operators.profile import expectations_check
        row = expectations_check(self._df(spark), [
            ("k_nn", "not_null", "k", None)]).collect()[0]
        assert row.passed and row.n_violations == 0
        with pytest.raises(ValueError, match="unknown kind"):
            expectations_check(self._df(spark), [("x", "nope", "k", None)])


class TestMeasurements:
    def test_extraction_and_si(self, spark):
        from saber_spark.operators.structured import measurements
        docs = spark.createDataFrame(
            [(1, "route spans 12 km and takes 2.5 ms today")],
            "doc_id long, text string")
        rows = {r.unit: r for r in measurements(docs).collect()}
        assert rows["km"].si_value == 12000.0 and rows["km"].si_unit == "m"
        assert rows["ms"].si_value == 0.0025 and rows["ms"].si_unit == "s"
        assert rows["km"].quantity == 12.0

    def test_unknown_units_ignored(self, spark):
        from saber_spark.operators.structured import measurements
        docs = spark.createDataFrame(
            [(1, "5 furlongs and 3 zz"), (2, None)],
            "doc_id long, text string")
        assert measurements(docs).count() == 0


class TestCitationSpans:
    def test_groups_and_members(self, spark):
        from saber_spark.operators.structured import citation_spans
        docs = spark.createDataFrame(
            [(1, "see [4] and [7,9] plus [12]")],
            "doc_id long, text string")
        rows = sorted(citation_spans(docs).collect(),
                      key=lambda r: (r.group_idx, r.ref_num))
        assert [(r.group_idx, r.ref_num) for r in rows] == [
            (0, 4), (1, 7), (1, 9), (2, 12)]

    def test_plain_brackets_without_numbers_ignored(self, spark):
        from saber_spark.operators.structured import citation_spans
        docs = spark.createDataFrame([(1, "array[i] and [a,b]")],
                                     "doc_id long, text string")
        assert citation_spans(docs).count() == 0


class TestCusumChangepoints:
    def _events(self, spark, counts, key="k"):
        # counts[i] events on day i
        rows = []
        eid = 0
        for day, n in enumerate(counts):
            for _ in range(n):
                rows.append((eid, f"2024-01-{day+1:02d} 00:00:00", key))
                eid += 1
        return spark.createDataFrame(
            rows, "event_id long, ts string, event_type string")

    def test_level_shift_flags_after_shift(self, spark):
        from saber_spark.operators.timeseries import cusum_changepoints
        ev = self._events(spark, [5, 5, 5, 5, 5, 20, 20, 20])
        rows = sorted(cusum_changepoints(ev, threshold_sigma=1.0).collect(),
                      key=lambda r: r.day)
        assert [r.flagged for r in rows[:5]] == [False] * 5
        assert rows[-1].flagged  # sustained shift accumulates past 1 sigma

    def test_stationary_series_never_flags(self, spark):
        from saber_spark.operators.timeseries import cusum_changepoints
        ev = self._events(spark, [5] * 10)
        out = cusum_changepoints(ev).collect()
        assert all(not r.flagged for r in out)
        assert all(r.cusum == 0.0 for r in out)

    def test_cumsum_identity_matches_recursive_cusum(self, spark):
        from saber_spark.operators.timeseries import cusum_changepoints
        counts = [3, 9, 1, 7, 2, 8, 4]
        ev = self._events(spark, counts)
        rows = sorted(cusum_changepoints(ev).collect(), key=lambda r: r.day)
        mean = sum(counts) / len(counts)
        s = 0.0
        for r, x in zip(rows, counts):
            s = max(0.0, s + (x - mean))
            assert abs(r.cusum - s) < 1e-6


class TestGiniConcentration:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "grp string, key string")

    def test_uniform_is_zero(self, spark):
        from saber_spark.operators.groupstats import gini_concentration
        df = self._df(spark, [("g", "a")] * 3 + [("g", "b")] * 3
                      + [("g", "c")] * 3)
        row = gini_concentration(df, "grp", "key").collect()[0]
        assert row.gini == 0.0 and row.n_keys == 3 and row.total == 9

    def test_concentration_raises_gini(self, spark):
        from saber_spark.operators.groupstats import gini_concentration
        # counts 1,1,8: G = 2*(1*1+2*1+3*8)/(3*10) - 4/3 = 54/30 - 40/30
        df = self._df(spark, [("g", "a")] + [("g", "b")]
                      + [("g", "c")] * 8)
        row = gini_concentration(df, "grp", "key").collect()[0]
        assert row.gini == round(14 / 30, 6)

    def test_single_key_group_is_zero(self, spark):
        from saber_spark.operators.groupstats import gini_concentration
        row = gini_concentration(self._df(spark, [("g", "a")] * 5),
                                 "grp", "key").collect()[0]
        assert row.gini == 0.0


class TestAnalogyEval:
    def _emb(self, spark, vecs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>")

    def test_exact_analogy_recovered(self, spark):
        from saber_spark.operators.kge import analogy_eval
        # b - a + c = exactly vec 3: (1,0)-(0,0)+(0,1) = (1,1)
        vecs = [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0],
                [-1.0, -1.0]]
        row = analogy_eval(self._emb(spark, vecs), [(0, 1, 2)]).collect()[0]
        assert row.predicted == 3 and row.cosine == 1.0

    def test_query_vectors_excluded(self, spark):
        from saber_spark.operators.kge import analogy_eval
        # without exclusion, b (identical direction) would win
        vecs = [[0.0, 1.0], [2.0, 0.0], [1.0, 0.0], [0.9, 0.1]]
        row = analogy_eval(self._emb(spark, vecs), [(0, 1, 2)]).collect()[0]
        assert row.predicted == 3

    def test_missing_row_raises(self, spark):
        import pytest

        from saber_spark.operators.kge import analogy_eval
        with pytest.raises(ValueError, match="no embedding rows"):
            analogy_eval(self._emb(spark, [[1.0, 0.0]]), [(0, 1, 2)])


class TestShaclValidate:
    def _run(self, spark, facts, shapes, closed=("C",)):
        from saber_spark.operators.ontology import shacl_validate
        f = spark.createDataFrame(facts, "subj string, pred string, obj string")
        t = spark.createDataFrame(
            [(s,) for s in {r[0] for r in facts}],
            "subj string").selectExpr("subj", "'C' AS cls")
        sh = spark.createDataFrame(
            shapes, "cls string, pred string, min_count int, max_count int")
        return {(r.subj, r.violation): (r.expected, r.actual)
                for r in shacl_validate(f, t, sh,
                                        closed_classes=list(closed)).collect()}

    def test_min_max_closed(self, spark):
        facts = ([("a", "p", "x")] + [("b", "p", f"x{i}") for i in range(3)]
                 + [("b", "q", "y")])
        out = self._run(spark, facts, [("C", "p", 2, 2)])
        # a has 1 p (minCount 2), b has 3 p (maxCount 2) and unlisted q
        assert out[("a", "minCount")] == (2, 1)
        assert out[("b", "maxCount")] == (2, 3)
        assert out[("b", "closed")] == (0, 1)
        assert len(out) == 3

    def test_clean_batch_is_empty(self, spark):
        facts = [("a", "p", "x"), ("b", "p", "y")]
        assert self._run(spark, facts, [("C", "p", 1, 1)]) == {}

    def test_null_max_is_unbounded_and_open_when_not_closed(self, spark):
        facts = [("a", "p", f"x{i}") for i in range(5)] + [("a", "q", "y")]
        out = self._run(spark, facts, [("C", "p", 1, None)], closed=())
        assert out == {}


class TestPpjoinSimilarity:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    def test_exact_pairs_at_boundary(self, spark):
        from saber_spark.operators.dedup import ppjoin_similarity
        # docs 0/1: jaccard 3/5 = 0.6 exactly (integer test must KEEP it);
        # doc 2 disjoint
        docs = self._docs(spark, ["a b c d", "a b c e", "x y z"])
        out = ppjoin_similarity(docs, threshold=0.6).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.doc_a, r.doc_b, r.inter, r.jaccard) == (0, 1, 3, 0.6)

    def test_matches_brute_force(self, spark):
        import itertools
        import random

        from saber_spark.operators.dedup import ppjoin_similarity
        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(30)]
        texts = [" ".join(rng.sample(vocab, rng.randint(4, 12)))
                 for _ in range(25)]
        sets = [set(t.split()) for t in texts]
        want = {}
        for a, b in itertools.combinations(range(25), 2):
            i = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if i * 2 >= u:  # threshold 0.5
                want[(a, b)] = i
        got = {(r.doc_a, r.doc_b): r.inter
               for r in ppjoin_similarity(
                   self._docs(spark, texts), threshold=0.5).collect()}
        assert got == want

    def test_length_filter_prunes_size_mismatch(self, spark):
        from saber_spark.operators.dedup import ppjoin_similarity
        # subset containment but |a|=2 vs |b|=8: jaccard 0.25 < 0.5
        docs = self._docs(spark, ["a b", "a b c d e f g h"])
        assert ppjoin_similarity(docs, threshold=0.5).count() == 0


class TestTexttiling:
    def _one(self, spark, text, window=4, cutoff=0.1):
        from saber_spark.operators.textstats import texttiling
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return sorted(texttiling(docs, window=window, cutoff=cutoff)
                      .collect(), key=lambda r: r.gap)

    def test_topic_shift_is_boundary(self, spark):
        # blocks: [a a a a][a a a a][x x x x][x x x x] -> gap 1 is the
        # cohesion minimum (cos 0) between two perfectly cohesive sides
        text = " ".join(["alpha"] * 8 + ["omega"] * 8)
        rows = self._one(spark, text)
        assert [r.gap for r in rows] == [0, 1, 2]
        assert rows[1].cosine == 0.0 and rows[1].boundary
        assert rows[1].depth == 2.0
        # edge gaps: NULL depth, never boundaries
        assert rows[0].depth is None and not rows[0].boundary
        assert rows[2].depth is None and not rows[2].boundary

    def test_uniform_doc_has_no_boundary(self, spark):
        rows = self._one(spark, " ".join(["tok"] * 20))
        assert all(not r.boundary for r in rows)
        assert all(r.cosine == 1.0 for r in rows)

    def test_depth_requires_strict_local_min(self, spark):
        # monotone decreasing cohesion: gap may clear the cutoff on one
        # side only -> no strict local minimum, no boundary
        text = " ".join(["a"] * 8 + ["a", "b", "a", "b"] + ["b"] * 4)
        rows = self._one(spark, text)
        for r in rows:
            if r.boundary:
                assert r.depth > 0.1
