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
