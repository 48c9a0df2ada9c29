"""Scale-mechanism tests: AQE skew-join splitting, bucketed co-located
joins, salted aggregation under real skew, explicit repartitioning."""

import pytest
from pyspark.sql import functions as F

from saber_spark.operators.canonicalize import salted_count


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of 400k rows share one hub key (the 'p53 problem')."""
    n = 400_000
    base = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("HUB"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 1000).cast("string")))
        .alias("key"),
        F.col("id").alias("payload"),
    )
    return base


class TestSaltedAggUnderSkew:
    def test_salted_equals_naive_on_skew(self, spark, skewed):
        salted = {r["key"]: r["n"] for r in
                  salted_count(skewed, ["key"], "payload").collect()}
        naive = {r["key"]: r["n"] for r in
                 skewed.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert salted == naive
        assert salted["HUB"] == 360_000

    def test_partial_rows_bounded(self, spark, skewed):
        """Phase 1 must spread the hub key over <= S salt buckets, so no
        reducer sees the hub's full traffic."""
        from saber_spark.operators.canonicalize import DEFAULT_SALT_BUCKETS
        partial = (
            skewed.withColumn("_salt", F.pmod(F.xxhash64("payload"),
                                              F.lit(DEFAULT_SALT_BUCKETS)))
            .groupBy("key", "_salt").agg(F.count(F.lit(1)).alias("c"))
        )
        hub = partial.filter(F.col("key") == "HUB").collect()
        assert len(hub) == DEFAULT_SALT_BUCKETS
        biggest = max(r["c"] for r in hub)
        assert biggest < 360_000 * 2 / DEFAULT_SALT_BUCKETS  # well spread


class TestAQESkewJoin:
    def test_skew_join_split(self, spark, skewed):
        """AQE must mark the skewed sort-merge join and split the hub
        partition (isSkew=true in the final adaptive plan)."""
        other = spark.range(1000).select(
            F.when(F.col("id") % 500 == 0, F.lit("HUB"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 1000).cast("string")))
            .alias("key"),
            F.col("id").alias("rhs"),
        )
        # force SMJ (disable broadcast) so skew handling is observable
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        try:
            joined = skewed.join(other, "key")
            # collect() runs the DataFrame's OWN QueryExecution (count/write
            # would clone the plan), so the adaptive FINAL plan with skew
            # annotations is inspectable on this instance afterwards
            rows = joined.collect()
            assert len(rows) > 0
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in plan
            assert "isSkew=true" in plan or "skew=true" in plan.lower(), plan[:2000]
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                           str(64 * 1024 * 1024))
            spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
            spark.conf.unset(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")


class TestBucketedJoin:
    def test_bucketed_join_avoids_shuffle(self, spark, tmp_path):
        """Bucketing both sides on the join key co-locates them: the join
        plan has NO Exchange above either scan (pre-shuffled storage — the
        strategy for repeated url-keyed joins at 100 TB)."""
        left = spark.range(10_000).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
            (F.col("id") * 2).alias("a"))
        right = spark.range(5_000).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
            (F.col("id") * 3).alias("b"))
        left.write.bucketBy(8, "url").sortBy("url").mode("overwrite")\
            .saveAsTable("mentions_bucketed")
        right.write.bucketBy(8, "url").sortBy("url").mode("overwrite")\
            .saveAsTable("pages_bucketed")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("mentions_bucketed").join(
                spark.table("pages_bucketed"), "url")
            n = joined.count()
            assert n == 5_000
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" not in plan, plan[:2000]
            assert "SortMergeJoin" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                           str(64 * 1024 * 1024))
            spark.sql("DROP TABLE IF EXISTS mentions_bucketed")
            spark.sql("DROP TABLE IF EXISTS pages_bucketed")


class TestExplicitRepartition:
    def test_pipeline_repartition_applied(self, spark):
        """The tagger input is repartitioned on url hash: the physical plan
        carries the explicit Exchange (uniform work distribution)."""
        from saber_spark.fixtures.dictionary import surface_label_map
        from saber_spark.fixtures.pages import build_pages_df
        from saber_spark.operators.extract import extract_text

        pages = build_pages_df(spark, "/root/testdata/sf0.001")
        ext = extract_text(pages).repartition(48, F.col("url"))
        plan = ext._jdf.queryExecution().executedPlan().toString()
        assert "REPARTITION_BY_NUM" in plan or "hashpartitioning(url" in plan


class TestPartitionPruning:
    def test_partitioned_write_prunes_scan(self, spark, tmp_path):
        """Hive-partitioned output + an equality filter on the partition
        column must prune at PLANNING time: the scan's PartitionFilters
        carries the predicate and only the matching directory is read —
        at 100 TB this is the difference between scanning one source and
        scanning the lake."""
        from saber_spark.sources.registry import write_table
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = str(tmp_path / "docs_by_source")
        write_table(docs, out, partition_by=["source"])
        got = spark.read.parquet(out).filter("source = 'src0'")
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "src0" in plan
        # the data filter must NOT degrade to a post-scan Filter on all rows
        assert got.count() == docs.filter("source = 'src0'").count()
        # physical proof: only the src0 directory's files feed the scan
        files = [r["file"] for r in got.select(
            F.input_file_name().alias("file")).distinct().collect()]
        assert files and all("source=src0" in f for f in files)
