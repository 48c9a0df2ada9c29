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


class TestIncrementalCuration:
    def test_new_docs_dedup_against_history(self, spark, tmp_path):
        """Micro-batch 2's near-dup of a batch-1 doc is flagged against
        the ACCUMULATED bucket history and dropped; fresh docs keep; a
        quality-failing doc never reaches dedup. History holds buckets
        only for finally-kept docs."""
        from saber_spark.streaming import start_incremental_curation

        stops = ["the", "of", "and", "to", "in", "is"]

        def body(seed):
            return " ".join(f"w{seed}x{i} {stops[i % 6]}" for i in range(60))

        a = body("a")
        near_a = a.replace("wax3", "changed", 1)   # ~0.97 shingle Jaccard
        schema = "doc_id long, text string, source string"
        src = str(tmp_path / "docs")
        b0 = [(1, a, "web"), (2, body("b"), "web"), (3, "zz qq", "web")]
        b1 = [(10, near_a, "web"), (11, body("c"), "web")]
        for i, batch in enumerate([b0, b1]):
            spark.createDataFrame(batch, schema).coalesce(1) \
                .write.mode("append" if i else "overwrite").parquet(src)

        dec_path = str(tmp_path / "decisions")
        buck_path = str(tmp_path / "buckets")
        stream = (spark.readStream.schema(spark.read.parquet(src).schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_incremental_curation(
            stream, dec_path, buck_path,
            checkpoint_path=str(tmp_path / "ckpt"))
        q.awaitTermination(240)

        dec = {r["doc_id"]: r for r in
               spark.read.parquet(dec_path).collect()}
        assert len(dec) == 5
        assert dec[1]["final_keep"] and dec[2]["final_keep"]
        assert not dec[3]["quality_keep"] and not dec[3]["final_keep"]
        assert dec[10]["quality_keep"] and dec[10]["dup_of_history"]
        assert not dec[10]["final_keep"]
        assert dec[11]["final_keep"] and not dec[11]["dup_of_history"]

        hist_ids = {r["doc_id"] for r in
                    spark.read.parquet(buck_path)
                    .select("doc_id").distinct().collect()}
        assert hist_ids == {1, 2, 11}  # kept docs only anchor the history

    def test_within_batch_near_dup_earlier_doc_wins(self, spark, tmp_path):
        from saber_spark.streaming import start_incremental_curation

        stops = ["the", "of", "and", "to", "in", "is"]
        base = " ".join(f"q{i}z {stops[i % 6]}" for i in range(60))
        schema = "doc_id long, text string, source string"
        src = str(tmp_path / "docs")
        spark.createDataFrame(
            [(5, base, "web"), (9, base.replace("q7z", "edited", 1), "web")],
            schema).coalesce(1).write.parquet(src)
        stream = (spark.readStream.schema(spark.read.parquet(src).schema)
                  .parquet(src))
        q = start_incremental_curation(
            stream, str(tmp_path / "dec"), str(tmp_path / "buck"),
            checkpoint_path=str(tmp_path / "ck"))
        q.awaitTermination(240)
        dec = {r["doc_id"]: r for r in
               spark.read.parquet(str(tmp_path / "dec")).collect()}
        assert dec[5]["final_keep"] and not dec[5]["dup_in_batch"]
        assert dec[9]["dup_in_batch"] and not dec[9]["final_keep"]
