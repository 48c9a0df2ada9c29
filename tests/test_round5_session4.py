"""Round-5 final-session batch 23+: cluster validity panel, PCA power
iteration (operators/cluster.py)."""

from __future__ import annotations

import math

import pytest


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestClusterValidity:
    def test_well_separated_clusters_score_well(self, spark):
        from saber_spark.operators.cluster import cluster_validity
        rows = ([(i, [10.0 + (i % 3) * 0.01, 10.0]) for i in range(6)]
                + [(i, [-10.0, -10.0 - (i % 3) * 0.01])
                   for i in range(6, 12)])
        r = cluster_validity(_emb(spark, rows), k=2,
                             iterations=3).collect()[0]
        assert r.k == 2 and r.n == 12
        # tight, far-apart clusters: silhouette ~ 1, DB ~ 0, CH huge
        assert r.silhouette > 0.99
        assert r.davies_bouldin < 0.01
        assert r.calinski_harabasz > 1e5

    def test_single_blob_split_in_two_scores_poorly(self, spark):
        from saber_spark.operators.cluster import cluster_validity
        # one uniform line of points, no real cluster structure
        rows = [(i, [float(i), 0.0]) for i in range(12)]
        r = cluster_validity(_emb(spark, rows), k=2,
                             iterations=3).collect()[0]
        # silhouette clearly below the separated case
        assert r.silhouette < 0.8
        assert r.davies_bouldin > 0.3

    def test_hand_computed_two_point_clusters(self, spark):
        from saber_spark.operators.cluster import cluster_validity
        # clusters {(0,0),(2,0)} and {(10,0),(12,0)}: centroids (1,0),(11,0)
        # inner points (2,0),(10,0): a = 1, b = 9  -> s = 8/9
        # outer points (0,0),(12,0): a = 1, b = 11 -> s = 10/11
        # silhouette = (8/9 + 10/11)/2; DB: s_i = 1 both, d(c1,c2) = 10
        # -> DB = 0.2; W = 4, B = 2*25 + 2*25 = 100 (global mean (6,0)),
        # CH = (B/1)/(W/2) = 50 — QUANT scales B and W alike, CH unchanged.
        rows = [(0, [0.0, 0.0]), (1, [2.0, 0.0]),
                (2, [10.0, 0.0]), (3, [12.0, 0.0])]
        r = cluster_validity(_emb(spark, rows), k=2,
                             iterations=2).collect()[0]
        assert r.silhouette == pytest.approx((8 / 9 + 10 / 11) / 2,
                                             abs=1e-6)
        assert r.davies_bouldin == pytest.approx(0.2, abs=1e-6)
        assert r.calinski_harabasz == pytest.approx(50.0, abs=1e-4)

    def test_deterministic(self, spark):
        from saber_spark.operators.cluster import cluster_validity
        rows = [(i, [float((i * 7) % 5), float((i * 3) % 4)])
                for i in range(20)]
        df = _emb(spark, rows)
        a = cluster_validity(df, k=3, iterations=2).collect()[0]
        b = cluster_validity(df, k=3, iterations=2).collect()[0]
        assert a == b


class TestPcaTop:
    def test_dominant_axis_found(self, spark):
        from saber_spark.operators.cluster import pca_top_component
        # variance concentrated on dim 0; tiny noise on dim 1
        rows = [(i, [float(i) * 5.0, float(i % 2) * 0.01, 0.0])
                for i in range(10)]
        out = {r.dim: r for r in
               pca_top_component(_emb(spark, rows)).collect()}
        assert len(out) == 3
        assert abs(out[0].loading) > 0.999
        assert out[0].var_share > 0.999
        # eigenvalue/share identical on every row
        assert len({r.eigenvalue for r in out.values()}) == 1

    def test_pure_single_dim_eigenvalue(self, spark):
        from saber_spark.operators.cluster import pca_top_component
        # x = 0,1,2,3 on dim 0 only; sample variance = 5/3.
        # quantized by 1000 -> eigenvalue = 5/3 * 1e6
        rows = [(i, [float(i), 0.0]) for i in range(4)]
        out = {r.dim: r for r in
               pca_top_component(_emb(spark, rows)).collect()}
        assert out[0].loading == pytest.approx(1.0, abs=1e-9)
        assert out[0].eigenvalue == pytest.approx(5.0 / 3.0 * 1e6,
                                                  rel=1e-9)
        assert out[0].var_share == pytest.approx(1.0, abs=1e-9)
        assert out[1].loading == pytest.approx(0.0, abs=1e-9)

    def test_sign_normalized_loading_sum_nonneg(self, spark):
        from saber_spark.operators.cluster import pca_top_component
        rows = [(i, [-float(i) * 3.0, float(i) * 0.5]) for i in range(8)]
        out = pca_top_component(_emb(spark, rows)).collect()
        assert sum(r.loading for r in out) >= 0

    def test_two_correlated_dims_equal_loadings(self, spark):
        from saber_spark.operators.cluster import pca_top_component
        # y = x exactly -> first PC is (1,1)/sqrt(2)
        rows = [(i, [float(i), float(i)]) for i in range(6)]
        out = {r.dim: r.loading for r in
               pca_top_component(_emb(spark, rows)).collect()}
        assert out[0] == pytest.approx(1 / math.sqrt(2), abs=1e-6)
        assert out[1] == pytest.approx(1 / math.sqrt(2), abs=1e-6)


class TestRotateScore:
    def test_rot65_all_unit_modulus(self):
        from saber_spark.operators.kge import ROT65, ROT65_DEN
        assert len(ROT65) == 32 and len(set(ROT65)) == 32
        assert all(c * c + s * s == ROT65_DEN ** 2 for c, s in ROT65)

    def _embs(self, spark, vecs):
        return spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>")

    def test_hand_computed_energy(self, spark):
        from saber_spark.operators.kge import (ROT65, ROT65_DEN,
                                               rotate_score)
        # dim 2 -> one complex dim; entities cust:0 -> row 0,
        # order:0 -> row (0+7) % 4 = 3; relation row 2
        vecs = [[0.5, 0.25], [9.0, 9.0], [0.103, 0.207], [0.75, -0.5]]
        trip = spark.createDataFrame([("cust:0", "placed", "order:0")],
                                     "subj string, pred string, obj string")
        out = rotate_score(trip, self._embs(spark, vecs),
                           {"placed": 2}, top_k=5).collect()
        rv = [round(0.103 * 1000), round(0.207 * 1000)]  # 103, 207
        c, s = ROT65[(abs(rv[0]) + 3 * abs(rv[1])) % 32]
        h = [500, 250]
        t = [750, -500]
        e65 = (abs(h[0] * c - h[1] * s - ROT65_DEN * t[0])
               + abs(h[1] * c + h[0] * s - ROT65_DEN * t[1]))
        assert len(out) == 1
        assert out[0].energy == round(e65 / ROT65_DEN, 6)
        assert out[0].rank == 1

    def test_direction_sensitive(self, spark):
        from saber_spark.operators.kge import rotate_score
        # a rotation is generally not its own inverse -> the reversed
        # triple scores differently (the RotatE antisymmetry capability)
        vecs = [[0.5, 0.25], [0.9, -0.3], [0.103, 0.207], [0.75, -0.5]]
        embs = self._embs(spark, vecs)
        fwd = spark.createDataFrame([("cust:0", "placed", "cust:1")],
                                    "subj string, pred string, obj string")
        rev = spark.createDataFrame([("cust:1", "placed", "cust:0")],
                                    "subj string, pred string, obj string")
        ef = rotate_score(fwd, embs, {"placed": 2}).collect()[0].energy
        er = rotate_score(rev, embs, {"placed": 2}).collect()[0].energy
        assert ef != er

    def test_odd_dim_raises(self, spark):
        from saber_spark.operators.kge import rotate_score
        trip = spark.createDataFrame([("cust:0", "placed", "cust:1")],
                                     "subj string, pred string, obj string")
        with pytest.raises(ValueError, match="odd"):
            rotate_score(trip, self._embs(spark, [[1.0], [2.0], [3.0]]),
                         {"placed": 2}).collect()

    def test_missing_relation_row_raises(self, spark):
        from saber_spark.operators.kge import rotate_score
        trip = spark.createDataFrame([("cust:0", "placed", "cust:1")],
                                     "subj string, pred string, obj string")
        with pytest.raises(ValueError, match="placed"):
            rotate_score(trip, self._embs(spark, [[1.0, 2.0]]),
                         {"placed": 99}).collect()


class TestBowtieStructure:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    def test_textbook_decomposition(self, spark):
        from saber_spark.operators.graph import bowtie_structure
        # core {a,b}; in1 -> core; core -> out1; tendril t1 off in1;
        # disconnected pair d1 -> d2.  pivot = a (degree 4).
        pairs = [("a", "b"), ("b", "a"), ("in1", "a"), ("a", "out1"),
                 ("in1", "t1"), ("d1", "d2")]
        out = {r.component: r for r in
               bowtie_structure(self._edges(spark, pairs)).collect()}
        assert out["CORE"].n_hosts == 2
        assert out["IN"].n_hosts == 1
        assert out["OUT"].n_hosts == 1
        assert out["TENDRIL"].n_hosts == 1
        assert out["DISCONNECTED"].n_hosts == 2
        assert out["CORE"].share == pytest.approx(2 / 7, abs=1e-6)

    def test_shares_sum_to_one(self, spark):
        from saber_spark.operators.graph import bowtie_structure
        pairs = [("a", "b"), ("b", "a"), ("c", "a"), ("a", "d"),
                 ("e", "f")]
        out = bowtie_structure(self._edges(spark, pairs)).collect()
        assert sum(r.share for r in out) == pytest.approx(1.0, abs=1e-5)
        assert sum(r.n_hosts for r in out) == 6

    def test_driver_fast_path_matches_distributed(self, spark,
                                                  monkeypatch):
        # r6: the exact driver census must agree with the frontier-BFS
        # path row for row; cap=0 forces the distributed branch
        from saber_spark.operators import graph
        pairs = [("a", "b"), ("b", "a"), ("in1", "a"), ("a", "out1"),
                 ("in1", "t1"), ("d1", "d2"), ("out1", "o2"),
                 ("i0", "in1")]
        fast = sorted(map(tuple, graph.bowtie_structure(
            self._edges(spark, pairs)).collect()))
        monkeypatch.setattr(graph, "DRIVER_EDGE_CAP", 0)
        slow = sorted(map(tuple, graph.bowtie_structure(
            self._edges(spark, pairs)).collect()))
        assert fast == slow and len(fast) >= 4

    def test_depth_cap_demotes_far_nodes(self, spark):
        from saber_spark.operators.graph import bowtie_structure
        # chain core -> x1 -> x2 -> x3; with max_depth=2 only x1, x2
        # are OUT; x3 is weakly connected -> TENDRIL (documented cap
        # semantics)
        pairs = [("a", "b"), ("b", "a"), ("a", "x1"), ("x1", "x2"),
                 ("x2", "x3")]
        out = {r.component: r.n_hosts for r in bowtie_structure(
            self._edges(spark, pairs), max_depth=2).collect()}
        assert out["OUT"] == 2 and out.get("TENDRIL") == 1

    def test_all_core_cycle(self, spark):
        from saber_spark.operators.graph import bowtie_structure
        pairs = [("a", "b"), ("b", "c"), ("c", "a")]
        out = bowtie_structure(self._edges(spark, pairs)).collect()
        assert len(out) == 1
        assert out[0].component == "CORE" and out[0].n_hosts == 3
        assert out[0].share == 1.0


class TestTrustrankSpamMass:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    def _seeds(self, spark, names):
        return spark.createDataFrame([(n,) for n in names], "node string")

    def test_hand_computed_one_round(self, spark):
        from saber_spark.operators.graph import trustrank_spam_mass
        # a -> b, seed {a}, 1 iteration: n=2, u=0.5
        # pr:  a = 0.15*0.5 = 0.075          b = 0.15*0.5 + 0.85*0.5 = 0.5
        # tr:  a = 0.15*1.0 = 0.15           b = 0.85*1.0 = 0.85
        # mass a = (0.075-0.15)/0.075 = -1   b = (0.5-0.85)/0.5 = -0.7
        out = {r.node: r for r in trustrank_spam_mass(
            self._edges(spark, [("a", "b")]), self._seeds(spark, ["a"]),
            iterations=1).collect()}
        assert out["a"].pr == pytest.approx(0.075)
        assert out["a"].trust == pytest.approx(0.15)
        assert out["a"].spam_mass == pytest.approx(-1.0)
        assert out["b"].pr == pytest.approx(0.5)
        assert out["b"].trust == pytest.approx(0.85)
        assert out["b"].spam_mass == pytest.approx(-0.7)

    def test_link_farm_flagged(self, spark):
        from saber_spark.operators.graph import trustrank_spam_mass
        # trusted hub t <-> g (good cycle); farm s0..s4 -> boss -> g
        pairs = ([("t", "g"), ("g", "t")]
                 + [(f"s{i}", "boss") for i in range(5)]
                 + [("boss", "g")])
        out = {r.node: r for r in trustrank_spam_mass(
            self._edges(spark, pairs), self._seeds(spark, ["t"]),
            iterations=4).collect()}
        # the boss accumulates rank from the farm but zero trust
        assert out["boss"].trust == 0.0
        assert out["boss"].spam_mass == 1.0
        assert out["boss"].pr > out["s0"].pr
        # the trusted seed is not spam; g (fed by both the farm's boss
        # and the seed) sits strictly between the seed and the farm
        assert out["t"].spam_mass <= 0.0
        assert out["t"].spam_mass < out["g"].spam_mass < 1.0

    def test_empty_seeds_raise(self, spark):
        from saber_spark.operators.graph import trustrank_spam_mass
        with pytest.raises(ValueError, match="empty"):
            trustrank_spam_mass(self._edges(spark, [("a", "b")]),
                                self._seeds(spark, []).limit(0))

    def test_absent_seed_raises(self, spark):
        from saber_spark.operators.graph import trustrank_spam_mass
        with pytest.raises(ValueError, match="not present"):
            trustrank_spam_mass(self._edges(spark, [("a", "b")]),
                                self._seeds(spark, ["zz"])).collect()


class TestScanClusters:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    def _two_cliques(self):
        # 5-cliques: the hand sigmas below (2/sqrt(12) for a pendant,
        # 2/sqrt(18) for a two-clique bridge) assume clique degree 4
        a = [(f"a{i}", f"a{j}") for i in range(5) for j in range(i + 1, 5)]
        b = [(f"b{i}", f"b{j}") for i in range(5) for j in range(i + 1, 5)]
        return a + b

    def test_two_cliques_two_clusters(self, spark):
        from saber_spark.operators.graph import scan_clusters
        out = {r.node: r for r in scan_clusters(
            self._edges(spark, self._two_cliques()),
            eps=0.5, mu=3).collect()}
        assert all(out[f"a{i}"].role == "core" for i in range(5))
        a_cl = {out[f"a{i}"].cluster for i in range(5)}
        b_cl = {out[f"b{i}"].cluster for i in range(5)}
        assert len(a_cl) == 1 and len(b_cl) == 1 and a_cl != b_cl

    def test_driver_fast_path_matches_distributed(self, spark,
                                                  monkeypatch):
        # r6: exact driver chain vs the wedge-join path; cap=0 forces
        # the distributed branch (graph with cores/border/hub/outlier)
        from saber_spark.operators import graph
        pairs = self._two_cliques() + [
            ("h", "a0"), ("h", "b0"), ("p", "a1"), ("z1", "z2")]
        fast = sorted(map(tuple, graph.scan_clusters(
            self._edges(spark, pairs), eps=0.5, mu=3).collect()))
        monkeypatch.setattr(graph, "DRIVER_EDGE_CAP", 0)
        slow = sorted(map(tuple, graph.scan_clusters(
            self._edges(spark, pairs), eps=0.5, mu=3).collect()))
        assert fast == slow and len(fast) >= 12

    def test_hub_bridges_two_clusters(self, spark):
        from saber_spark.operators.graph import scan_clusters
        # h touches one member of each clique: low sigma on both sides
        # (its neighborhood agrees with neither clique) but neighbors in
        # two clusters -> hub
        pairs = self._two_cliques() + [("h", "a0"), ("h", "b0")]
        out = {r.node: r for r in scan_clusters(
            self._edges(spark, pairs), eps=0.5, mu=3).collect()}
        assert out["h"].role == "hub" and out["h"].cluster is None

    def test_pendant_is_border_and_lone_is_outlier(self, spark):
        from saber_spark.operators.graph import scan_clusters
        # p-a0: sigma = 2/sqrt(2*6) ~ 0.577 >= 0.5 -> border of a's
        # cluster; x-y is an isolated pair, sigma(x,y) = 1 but
        # n_eps = 2 < mu -> no cores -> both outliers
        pairs = self._two_cliques() + [("p", "a0"), ("x", "y")]
        out = {r.node: r for r in scan_clusters(
            self._edges(spark, pairs), eps=0.5, mu=3).collect()}
        assert out["p"].role == "border"
        assert out["p"].cluster == out["a0"].cluster
        assert out["x"].role == "outlier" and out["x"].cluster is None

    def test_sigma_hand_value_gates_border(self, spark):
        from saber_spark.operators.graph import scan_clusters
        # with eps just above 2/sqrt(12) the pendant drops to outlier
        pairs = self._two_cliques() + [("p", "a0")]
        out = {r.node: r for r in scan_clusters(
            self._edges(spark, pairs), eps=0.58, mu=3).collect()}
        assert out["p"].role == "outlier"

    def test_isolated_core_singleton_cluster(self, spark):
        from saber_spark.operators.graph import scan_clusters
        # triangle: every node core (sigma = 1 between all), one cluster
        pairs = [("t0", "t1"), ("t1", "t2"), ("t0", "t2")]
        out = scan_clusters(self._edges(spark, pairs),
                            eps=0.9, mu=3).collect()
        assert {r.role for r in out} == {"core"}
        assert len({r.cluster for r in out}) == 1


class TestKcenterSeeds:
    def _emb(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")

    def test_farthest_first_order(self, spark):
        from saber_spark.operators.cluster import kcenter_seeds
        # line 0, 1, 10: start at id 0; farthest is 10 (d2 1e8);
        # then 1 (min-dist to {0,10} = 1e6)
        rows = [(0, [0.0]), (1, [1.0]), (2, [10.0])]
        out = [(r.seed_rank, r.vec_id, r.d2) for r in
               kcenter_seeds(self._emb(spark, rows), k=3)
               .orderBy("seed_rank").collect()]
        assert out == [(0, 0, 0), (1, 2, 100000000), (2, 1, 1000000)]

    def test_driver_fast_path_matches_distributed(self, spark):
        # r6: numpy traversal vs the per-round argmax jobs; disabling
        # auto-broadcast forces the distributed branch
        from saber_spark.operators.cluster import kcenter_seeds
        rows = [(i, [float((i * 7) % 13), float((i * 3) % 11)])
                for i in range(24)]
        df = self._emb(spark, rows)
        fast = sorted(map(tuple, kcenter_seeds(df, k=5).collect()))
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            slow = sorted(map(tuple, kcenter_seeds(df, k=5).collect()))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert fast == slow and len(fast) == 5

    def test_coverage_radius_nonincreasing(self, spark):
        from saber_spark.operators.cluster import kcenter_seeds
        rows = [(i, [float((i * 7) % 13), float((i * 3) % 11)])
                for i in range(24)]
        out = [r.d2 for r in kcenter_seeds(self._emb(spark, rows), k=5)
               .orderBy("seed_rank").collect()][1:]
        assert all(a >= b for a, b in zip(out, out[1:]))

    def test_tie_breaks_to_smallest_id(self, spark):
        from saber_spark.operators.cluster import kcenter_seeds
        # two points equidistant from seed 0: id 1 wins
        rows = [(0, [0.0]), (1, [5.0]), (2, [-5.0])]
        out = [r.vec_id for r in kcenter_seeds(self._emb(spark, rows),
                                               k=2)
               .orderBy("seed_rank").collect()]
        assert out == [0, 1]

    def test_fewer_than_k_raises(self, spark):
        from saber_spark.operators.cluster import kcenter_seeds
        with pytest.raises(ValueError, match="need"):
            kcenter_seeds(self._emb(spark, [(0, [1.0])]), k=3)


class TestScriptProfile:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_mixed_scripts_counted(self, spark):
        from saber_spark.operators.textstats import script_profile
        out = {r.doc_id: r for r in script_profile(self._docs(spark, [
            (0, "hello мир 数据"), (1, "12345 !!"),
            (2, "données straße"), (3, "και κόσμος"),
            (4, "مرحبا بالعالم"), (5, "안녕하세요"),
        ])).collect()}
        assert (out[0].n_latin, out[0].n_cyrillic, out[0].n_cjk) == (5, 3, 2)
        assert out[0].script == "latin" and out[0].share == 0.5
        assert out[1].script == "none" and out[1].share == 0.0
        assert out[2].script == "latin" and out[2].share == 1.0
        assert out[3].script == "greek"
        assert out[4].script == "arabic"
        assert out[5].script == "hangul"

    def test_tie_breaks_by_declared_order(self, spark):
        from saber_spark.operators.textstats import script_profile
        # 2 latin letters vs 2 cyrillic letters -> latin (declared first)
        out = script_profile(self._docs(spark, [(0, "ab мы")])).collect()[0]
        assert out.n_latin == out.n_cyrillic == 2
        assert out.script == "latin" and out.share == 0.5

    def test_kana_counts_as_cjk(self, spark):
        from saber_spark.operators.textstats import script_profile
        out = script_profile(self._docs(spark, [(0, "データ 処理")])).collect()[0]
        assert out.n_cjk == 5 and out.script == "cjk"


class TestPldRollup:
    def _hosts(self, spark, names):
        return spark.createDataFrame([(n,) for n in names], "host string")

    def test_longest_suffix_wins(self, spark):
        from saber_spark.operators.webstats import pld_registered_domain
        out = {r.host: r for r in pld_registered_domain(self._hosts(
            spark, ["shop.example.co.uk", "example.uk"])).collect()}
        # co.uk beats uk: registered one label above co.uk
        assert out["shop.example.co.uk"].registered == "example.co.uk"
        assert out["shop.example.co.uk"].suffix == "co.uk"
        assert out["example.uk"].registered == "example.uk"
        assert out["example.uk"].suffix == "uk"

    def test_bare_suffix_not_registrable(self, spark):
        from saber_spark.operators.webstats import pld_registered_domain
        out = pld_registered_domain(
            self._hosts(spark, ["co.uk"])).collect()[0]
        assert out.registered == "co.uk" and out.matched is False

    def test_unknown_tld_falls_back_to_apex(self, spark):
        from saber_spark.operators.webstats import pld_registered_domain
        out = pld_registered_domain(
            self._hosts(spark, ["x.y.weird.zz"])).collect()[0]
        assert out.registered == "weird.zz"
        assert out.suffix == "" and out.matched is False

    def test_deep_subdomain_collapses(self, spark):
        from saber_spark.operators.webstats import pld_registered_domain
        out = pld_registered_domain(
            self._hosts(spark, ["a.b.c.example.com"])).collect()[0]
        assert out.registered == "example.com" and out.matched is True

    def test_rollup_groups_hosts(self, spark):
        from saber_spark.operators.webstats import pld_rollup
        urls = spark.createDataFrame(
            [("https://www.site.com/a",), ("https://m.site.com/b",),
             ("https://site.com/c",), ("https://other.org/d",)],
            "url string")
        out = {r.registered: r for r in pld_rollup(urls).collect()}
        assert out["site.com"].n_urls == 3
        assert out["site.com"].n_hosts == 3
        assert out["other.org"].n_urls == 1


class TestWordpieceEncode:
    def _toks(self, spark, words):
        return spark.createDataFrame([(w,) for w in words],
                                     "token string")

    def _encode(self, spark, words, vocab):
        from saber_spark.operators.bpe import wordpiece_encode
        out = wordpiece_encode(self._toks(spark, words), vocab)
        res: dict[str, list[str]] = {}
        for r in sorted(out.collect(), key=lambda r: (r.word, r.idx)):
            res.setdefault(r.word, []).append(r.piece)
        return res

    def test_greedy_longest_match(self, spark):
        vocab = ["dream", "d", "r", "e", "a", "m", "y",
                 "##y", "##r", "##e", "##a", "##m"]
        res = self._encode(spark, ["dreamy"], vocab)
        assert res["dreamy"] == ["dream", "##y"]

    def test_driver_fast_path_matches_join_path(self, spark,
                                                monkeypatch):
        # r6: the driver greedy walk vs the pointer-chase join plan;
        # cap=0 forces the join path
        from saber_spark.operators import bpe
        vocab = ["dream", "d", "r", "e", "a", "m", "y", "da", "ta",
                 "##y", "##r", "##e", "##a", "##m", "##ta", "##tab"]
        words = ["dreamy", "datatable", "dada", "q" * 30, "m"]
        fast = sorted(map(tuple, bpe.wordpiece_encode(
            self._toks(spark, words), vocab).collect()))
        monkeypatch.setattr(bpe, "DRIVER_WORD_CAP", 0)
        slow = sorted(map(tuple, bpe.wordpiece_encode(
            self._toks(spark, words), vocab).collect()))
        assert fast == slow and len(fast) >= 6

    def test_greedy_no_backtracking_unks(self, spark):
        # greedy takes ##tab (longer), gets stuck, whole word -> [UNK]
        # even though data ##ta ##ble would have worked (BERT behavior)
        vocab = ["data", "##ta", "##tab", "##ble"]
        res = self._encode(spark, ["datatable"], vocab)
        assert res["datatable"] == ["[UNK]"]

    def test_missing_char_unks_whole_word(self, spark):
        vocab = [c for c in "uery"] + ["##" + c for c in "uery"]
        res = self._encode(spark, ["query", "ere"], vocab)
        assert res["query"] == ["[UNK]"]       # no 'q'
        assert res["ere"] == ["e", "##r", "##e"]

    def test_continuation_vs_initial_distinct(self, spark):
        # 'ab' exists only as continuation: cannot start a word
        vocab = ["x", "##ab", "a", "b", "##b"]
        res = self._encode(spark, ["xab", "ab"], vocab)
        assert res["xab"] == ["x", "##ab"]
        assert res["ab"] == ["a", "##b"]

    def test_over_long_word_unks(self, spark):
        vocab = ["x", "##x"]
        res = self._encode(spark, ["x" * 26], vocab)
        assert res["x" * 26] == ["[UNK]"]

    def test_empty_vocab_raises(self, spark):
        from saber_spark.operators.bpe import wordpiece_encode
        with pytest.raises(ValueError, match="empty"):
            wordpiece_encode(self._toks(spark, ["a"]), [])


class TestMinKProb:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_outlier_tokens_lower_mink(self, spark):
        from saber_spark.operators.lm import min_k_prob
        # doc 0 (scored half) carries rare bigrams; other scored docs
        # are pure in-distribution
        rows = [(i, "data stream " * 8
                 + ("weird glyph blob" if i == 0 else ""))
                for i in range(8)]
        out = {r.doc_id: r for r in min_k_prob(
            self._docs(spark, rows), r"[a-z]+").collect()}
        scored = sorted(out)
        base = [d for d in scored if d != 0]
        assert out[0].mink_avg_logprob < out[base[0]].mink_avg_logprob
        # min-k average can never exceed the full average
        for d in scored:
            assert (out[d].mink_avg_logprob
                    <= out[d].full_avg_logprob + 1e-9)

    def test_selection_count_is_ceil(self, spark):
        from saber_spark.operators.lm import min_k_prob
        rows = [(i, "a b c d e f g h i j k l") for i in range(6)]
        out = min_k_prob(self._docs(spark, rows), r"[a-z]+",
                         k_pct=0.2).collect()
        for r in out:
            assert r.n_selected == -(-r.n_bigrams // 5)  # ceil(n/5)

    def test_k_one_equals_full(self, spark):
        from saber_spark.operators.lm import min_k_prob
        rows = [(i, "x y z w v u t s") for i in range(6)]
        out = min_k_prob(self._docs(spark, rows), r"[a-z]+",
                         k_pct=1.0).collect()
        for r in out:
            assert r.mink_avg_logprob == pytest.approx(
                r.full_avg_logprob, abs=2e-6)


class TestSelfBleu:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_duplicate_docs_score_one(self, spark):
        from saber_spark.operators.textstats import self_bleu
        docs = self._docs(spark, [
            (0, "the cat sat on the mat"),
            (1, "the cat sat on the mat"),
            (2, "a completely different sentence here now")])
        out = {r.doc_id: r for r in
               self_bleu(docs, r"[a-z]+").collect()}
        assert out[0].self_bleu == 1.0 and out[1].self_bleu == 1.0
        assert out[2].self_bleu == 0.0
        assert out[2].p1 == 0.0  # no unigram shared with any other doc

    def test_clip_excludes_own_counts(self, spark):
        from saber_spark.operators.textstats import self_bleu
        # doc 0 repeats 'x' 4 times; the only other doc has it once:
        # clipped unigram matches for doc 0 = min(4, 1) + 0s
        docs = self._docs(spark, [(0, "x x x x"), (1, "x y z w")])
        out = {r.doc_id: r for r in
               self_bleu(docs, r"[a-z]+").collect()}
        assert out[0].p1 == pytest.approx(0.25, abs=1e-6)
        assert out[1].p1 == pytest.approx(0.25, abs=1e-6)

    def test_brevity_penalty_for_short_candidate(self, spark):
        from saber_spark.operators.textstats import self_bleu
        # doc 1 (2 tokens) vs closest other length 6: bp = exp(1 - 3)
        docs = self._docs(spark, [
            (0, "a b c d e f"), (1, "a b"), (2, "a b c d e g")])
        out = {r.doc_id: r for r in
               self_bleu(docs, r"[a-z]+").collect()}
        assert out[1].ref_len == 6
        assert out[1].bp == pytest.approx(round(math.exp(1 - 3.0), 6))
        assert out[0].bp == 1.0

    def test_zero_fourgram_zeroes_bleu(self, spark):
        from saber_spark.operators.textstats import self_bleu
        # shares unigrams but no 4-gram -> BLEU exactly 0 (no smoothing)
        docs = self._docs(spark, [
            (0, "a b c d e"), (1, "a c b e d")])
        out = {r.doc_id: r for r in
               self_bleu(docs, r"[a-z]+").collect()}
        assert out[0].p1 == 1.0 and out[0].p4 == 0.0
        assert out[0].self_bleu == 0.0


class TestSifEmbeddings:
    def _toks(self, spark, docs):
        rows = [(d, t) for d, ts in docs.items() for t in ts]
        return spark.createDataFrame(rows, "doc_id long, token string")

    def _embs(self, spark, n=16, d=4):
        return spark.createDataFrame(
            [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(d)])
             for i in range(n)],
            "vec_id long, embedding array<float>")

    def test_every_doc_gets_full_vector(self, spark):
        from saber_spark.operators.cluster import sif_embeddings
        docs = {d: ("data stream join rare%d x%d" % (d, d)).split()
                for d in range(5)}
        out = sif_embeddings(self._toks(spark, docs),
                             self._embs(spark)).collect()
        vecs: dict[int, dict[int, float]] = {}
        for r in out:
            vecs.setdefault(r.doc_id, {})[r.dim] = r.value
        assert len(vecs) == 5 and all(len(v) == 4 for v in vecs.values())

    def test_rank1_correction(self, spark):
        from saber_spark.operators.cluster import sif_embeddings
        docs = {d: ("data stream join rare%d" % d).split()
                for d in range(4)}
        toks, embs = self._toks(spark, docs), self._embs(spark)
        corrected = sif_embeddings(toks, embs).collect()
        plain = sif_embeddings(toks, embs, pc_iterations=0).collect()
        c = {(r.doc_id, r.dim): r.value for r in corrected}
        p = {(r.doc_id, r.dim): r.value for r in plain}
        # correction matrix (p - c) must be rank 1: all 2x2 minors ~ 0
        diff = {k: p[k] - c[k] for k in p}
        docs_ = sorted({k[0] for k in p})
        dims_ = sorted({k[1] for k in p})
        for da, db in [(docs_[0], docs_[1]), (docs_[1], docs_[2])]:
            for i, j in [(dims_[0], dims_[1]), (dims_[2], dims_[3])]:
                det = (diff[(da, i)] * diff[(db, j)]
                       - diff[(da, j)] * diff[(db, i)])
                assert abs(det) < 1e-3

    def test_rare_tokens_weigh_more(self, spark):
        from saber_spark.operators.cluster import sif_embeddings
        # two docs share a flooding common token; their difference comes
        # only from their rare tokens, amplified by the SIF weight
        docs = {0: ["common"] * 20 + ["uniqa"],
                1: ["common"] * 20 + ["uniqb"]}
        out = sif_embeddings(self._toks(spark, docs),
                             self._embs(spark),
                             pc_iterations=0).collect()
        v = {}
        for r in out:
            v.setdefault(r.doc_id, {})[r.dim] = r.value
        # docs must differ despite 20/21 shared tokens
        assert any(abs(v[0][d] - v[1][d]) > 1e-6 for d in v[0])

    def test_deterministic(self, spark):
        from saber_spark.operators.cluster import sif_embeddings
        docs = {d: ("a b c d%d" % d).split() for d in range(3)}
        toks, embs = self._toks(spark, docs), self._embs(spark)
        r1 = sorted(map(tuple, sif_embeddings(toks, embs).collect()))
        r2 = sorted(map(tuple, sif_embeddings(toks, embs).collect()))
        assert r1 == r2


class TestBradleyTerry:
    def _m(self, spark, rows):
        return spark.createDataFrame(rows, "winner string, loser string")

    def test_transitive_strengths(self, spark):
        from saber_spark.operators.evaluation import bradley_terry
        rows = ([("a", "b")] * 9 + [("b", "a")]
                + [("b", "c")] * 9 + [("c", "b")]
                + [("a", "c")] * 5)
        out = {r.item: r for r in bradley_terry(
            self._m(spark, rows)).collect()}
        assert out["a"].rank == 1 and out["c"].rank == 3
        assert out["a"].theta > out["b"].theta > out["c"].theta
        assert out["a"].wins == 14 and out["a"].comparisons == 15

    def test_balanced_pair_equal_strength(self, spark):
        from saber_spark.operators.evaluation import bradley_terry
        rows = [("a", "b")] * 5 + [("b", "a")] * 5
        out = {r.item: r for r in bradley_terry(
            self._m(spark, rows)).collect()}
        assert out["a"].theta == pytest.approx(out["b"].theta, abs=1e-6)
        # geometric-mean pinning: product of thetas = 1
        assert out["a"].theta * out["b"].theta == pytest.approx(
            1.0, abs=1e-5)

    def test_zero_win_item_goes_to_zero(self, spark):
        from saber_spark.operators.evaluation import bradley_terry
        rows = [("a", "z")] * 4 + [("b", "z")] * 4 + [("a", "b"),
                                                      ("b", "a")]
        out = {r.item: r for r in bradley_terry(
            self._m(spark, rows)).collect()}
        assert out["z"].wins == 0
        assert out["z"].theta == pytest.approx(0.0, abs=1e-6)
        assert out["z"].rank == 3

    def test_bt_probability_recovered(self, spark):
        from saber_spark.operators.evaluation import bradley_terry
        # a beats b 3:1 -> fitted P(a>b) = ta/(ta+tb) ~ 0.75
        rows = [("a", "b")] * 3 + [("b", "a")]
        out = {r.item: r for r in bradley_terry(
            self._m(spark, rows), iterations=30).collect()}
        p = out["a"].theta / (out["a"].theta + out["b"].theta)
        assert p == pytest.approx(0.75, abs=1e-3)


class TestLuhnAbstract:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_cluster_score_ranks_sentences(self, spark):
        from saber_spark.operators.textstats import luhn_abstract
        docs = self._docs(spark, [(0,
            "spark streams data fast. "
            "the filler filler filler sentence is here. "
            "data spark data spark wins again. nothing to see.")])
        out = luhn_abstract(docs, r"[a-z]+").orderBy("rank").collect()
        # 'data spark data spark wins again': 4 sig tokens span 4 -> 4.0
        assert out[0].sentence.startswith("data spark data spark")
        assert out[0].n_sig == 4 and out[0].score == 4.0
        # 'filler filler filler': 3 sig tokens span 3 -> 3.0
        assert out[1].score == 3.0

    def test_gap_breaks_cluster(self, spark):
        from saber_spark.operators.textstats import luhn_abstract
        # two sig words 6 apart (> gap+1=5) form two 1-word clusters:
        # best score 1, not 4/7
        docs = self._docs(spark, [(0,
            "key a b c d e key. key key other words here.")])
        out = {r.sent_idx: r for r in
               luhn_abstract(docs, r"[a-z]+").collect()}
        assert out[0].score == 1.0
        assert out[1].score == 2.0  # adjacent pair: 2^2 / span 2

    def test_stopwords_not_significant(self, spark):
        from saber_spark.operators.textstats import luhn_abstract
        # 'the' repeats but is a stopword -> no significant words at all
        docs = self._docs(spark, [(0, "the the the. the the again.")])
        out = luhn_abstract(docs, r"[a-z]+").collect()
        assert out == []

    def test_top_sentences_cap_and_tie_order(self, spark):
        from saber_spark.operators.textstats import luhn_abstract
        # three equally scored sentences: document order wins, top 2 kept
        docs = self._docs(spark, [(0, "dup dup one. dup dup two. "
                                      "dup dup three.")])
        out = luhn_abstract(docs, r"[a-z]+",
                            top_sentences=2).orderBy("rank").collect()
        assert [r.sent_idx for r in out] == [0, 1]
        assert all(r.score == 2.0 for r in out)
