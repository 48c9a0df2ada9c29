"""Incremental streaming KG edges + SQL function registration + resume
robustness."""

import os
import shutil

from pyspark.sql import functions as F

from saber_spark.fixtures.dictionary import grounding_dict_df, surface_label_map
from saber_spark.fixtures.pages import build_pages_df
from saber_spark.functions import register_all
from saber_spark.pipeline import run_pipeline
from saber_spark.streaming.stream import start_incremental_edges

SF_DIR = "/root/testdata/sf0.001"


class TestIncrementalEdges:
    def test_streaming_edges_match_batch(self, spark, tmp_path):
        """availableNow incremental run over the page table must produce the
        SAME edge table as the batch pipeline."""
        pages_dir = str(tmp_path / "pages")
        build_pages_df(spark, SF_DIR).filter("lang = 'en'").write.parquet(pages_dir)
        schema = spark.read.parquet(pages_dir).schema
        # maxFilesPerTrigger forces multiple micro-batches -> exercises merge
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "2").parquet(pages_dir))
        bc = spark.sparkContext.broadcast(surface_label_map())
        edges_path = str(tmp_path / "edges")
        q = start_incremental_edges(
            stream, bc, grounding_dict_df(spark), edges_path,
            str(tmp_path / "ckpt"))
        q.awaitTermination(300)

        got = {(r["subj"], r["obj"]): (r["n_occurrences"], r["first_url"])
               for r in spark.read.parquet(edges_path).collect()}
        batch = run_pipeline(spark, build_pages_df(spark, SF_DIR))["edges"]
        expected = {(r["subj"], r["obj"]): (r["n_occurrences"], r["first_url"])
                    for r in batch.collect()}
        assert got == expected

    def test_restart_is_exactly_once(self, spark, tmp_path):
        """Restarting the finished stream must not double-count edges."""
        pages_dir = str(tmp_path / "pages")
        build_pages_df(spark, SF_DIR).filter("lang = 'en'").limit(20)\
            .write.parquet(pages_dir)
        schema = spark.read.parquet(pages_dir).schema
        bc = spark.sparkContext.broadcast(surface_label_map())
        edges_path = str(tmp_path / "edges")
        ckpt = str(tmp_path / "ckpt")
        for _ in range(2):  # second start consumes nothing new
            stream = spark.readStream.schema(schema).parquet(pages_dir)
            q = start_incremental_edges(
                stream, bc, grounding_dict_df(spark), edges_path, ckpt)
            q.awaitTermination(300)
        total = (spark.read.parquet(edges_path)
                 .agg(F.sum("n_occurrences")).first()[0])
        one_shot = run_pipeline(
            spark, spark.read.parquet(pages_dir))["triples"].count()
        assert total == one_shot


class TestSqlFunctions:
    def test_registered_and_callable(self, spark):
        names = register_all(spark)
        assert len(names) == 4
        row = spark.sql(
            "SELECT saber_sterilize('  a   b ') AS s, "
            "saber_tokenize('p53-x') AS t, "
            "saber_extract_html('<p>hi &amp; bye</p>') AS h, "
            "saber_chunk_entities(array('B-X','I-X','O')) AS c").first()
        assert row["s"] == "a b"
        assert row["t"] == ["p53", "-", "x"]
        assert row["h"] == "hi & bye"
        assert [tuple(c) for c in row["c"]] == [("X", 0, 2)]


class TestResumeRobustness:
    def test_partial_stage_without_manifest_recomputed(self, spark, tmp_path):
        """A stage dir that exists but has NO manifest (simulated mid-write
        kill) must be recomputed, yielding correct output."""
        pages = build_pages_df(spark, SF_DIR)
        ckpt = str(tmp_path / "ckpt")
        out1 = run_pipeline(spark, pages, checkpoint_dir=ckpt)
        edges1 = sorted((r["subj"], r["obj"], r["n_occurrences"])
                        for r in out1["edges"].collect())
        # simulate kill during the 'linked' stage write: manifest missing,
        # parquet data half-there (delete manifest + one data file)
        linked_dir = os.path.join(ckpt, "linked")
        os.remove(os.path.join(linked_dir, "_saber_manifest.json"))
        for f in os.listdir(linked_dir):
            if f.endswith(".parquet"):
                os.remove(os.path.join(linked_dir, f))
                break
        out2 = run_pipeline(spark, pages, checkpoint_dir=ckpt)
        edges2 = sorted((r["subj"], r["obj"], r["n_occurrences"])
                        for r in out2["edges"].collect())
        assert edges1 == edges2

    def test_corrupt_manifest_recomputed(self, spark, tmp_path):
        pages = build_pages_df(spark, SF_DIR)
        ckpt = str(tmp_path / "ckpt")
        run_pipeline(spark, pages, checkpoint_dir=ckpt)
        mpath = os.path.join(ckpt, "mentions", "_saber_manifest.json")
        with open(mpath, "w") as f:
            f.write("{not json")
        out = run_pipeline(spark, pages, checkpoint_dir=ckpt)
        assert out["edges"].count() > 0
        # manifest restored valid by the recompute
        import json
        with open(mpath) as f:
            m = json.load(f)
        assert m["complete"] is True

    def test_stage_name_mismatch_recomputed(self, spark, tmp_path):
        """A manifest from a DIFFERENT stage name in the dir is not trusted."""
        pages = build_pages_df(spark, SF_DIR)
        ckpt = str(tmp_path / "ckpt")
        run_pipeline(spark, pages, checkpoint_dir=ckpt)
        src = os.path.join(ckpt, "mentions")
        dst = os.path.join(ckpt, "nodes")
        shutil.rmtree(dst)
        shutil.copytree(src, dst)  # nodes dir now holds a mentions manifest
        out = run_pipeline(spark, pages, checkpoint_dir=ckpt)
        cols = set(out["nodes"].columns)
        assert {"canonical_id", "label", "n_mentions", "n_docs"} <= cols


class TestStatefulLabelCounts:
    def test_running_counts_accumulate_across_batches(self, spark, tmp_path):
        """applyInPandasWithState keeps per-label state across micro-batches:
        the final update must equal the all-batch totals."""
        from saber_spark.operators.extract import extract_text
        from saber_spark.operators.tagger import detect_mentions
        from saber_spark.streaming.stream import stream_running_label_counts

        pages_dir = str(tmp_path / "pages")
        build_pages_df(spark, SF_DIR).filter("lang = 'en'").write.parquet(pages_dir)
        schema = spark.read.parquet(pages_dir).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "2").parquet(pages_dir))
        bc = spark.sparkContext.broadcast(surface_label_map())
        mentions_stream = detect_mentions(extract_text(stream), bc)
        q = (stream_running_label_counts(mentions_stream)
             .writeStream.format("memory").queryName("label_counts")
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(300)
        # last update per label (memory sink appends every update)
        rows = spark.sql("""
            SELECT label, max(n_mentions) AS n FROM label_counts GROUP BY label
        """).collect()
        got = {r["label"]: r["n"] for r in rows}
        batch = detect_mentions(
            extract_text(spark.read.parquet(pages_dir)), bc)
        expected = {r["label"]: r["n"] for r in
                    batch.groupBy("label").agg(
                        F.count(F.lit(1)).alias("n")).collect()}
        assert got == expected
