"""Corpus-curation pipeline (saber_spark.curate): end-to-end invariants,
checkpoint resume, and the decontamination path."""

import os

import pytest
from pyspark.sql import functions as F

from saber_spark.curate import run_curation

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


class TestCurationEndToEnd:
    def test_decision_table_invariants(self, spark, docs):
        out = run_curation(spark, docs)
        dec = out["decision"].collect()
        n_docs = docs.count()
        assert len(dec) == n_docs  # one row PER INPUT DOC, dropped or kept
        assert len({r["doc_id"] for r in dec}) == n_docs
        for r in dec:
            if r["final_keep"]:
                assert r["quality_keep"] and r["dup_keep"] \
                    and not r["contaminated"]
            if not r["quality_keep"]:
                # never reached dedup -> no cluster assignment, never kept
                assert r["dup_keep"] is None and not r["final_keep"]
                assert r["reasons"] != ""
        n_final = sum(1 for r in dec if r["final_keep"])
        assert 0 < n_final < n_docs  # the filter actually discriminates

        # weights/shards cover exactly the survivors
        assert out["shards"].count() == n_final
        w = out["weights"].agg(F.sum("n_docs")).collect()[0][0]
        assert w == n_final

    def test_scrubbed_text_is_the_release_text(self, spark):
        """The masked text flows into dedup/packing: a planted email is
        gone from the curated corpus."""
        stops = ["the", "of", "and", "to", "in", "is"]
        body = " ".join(f"w{i}x {stops[i % 6]}" for i in range(60))
        docs = spark.createDataFrame(
            [(1, body + " contact a@b.co now", "web"),
             (2, body + " second doc distinct", "web")],
            "doc_id long, text string, source string")
        out = run_curation(spark, docs)
        texts = {r["doc_id"]: r["text"] for r in
                 out["scrubbed"].select("doc_id", "text").collect()}
        assert "<EMAIL>" in texts[1] and "a@b.co" not in texts[1]


class TestCurationContamination:
    def test_planted_eval_doc_is_dropped(self, spark, docs):
        eval_docs = docs.limit(3).select("doc_id", "text")
        out = run_curation(spark, docs, eval_docs=eval_docs,
                           contamination_n=5)
        dec = {r["doc_id"]: r for r in out["decision"].collect()}
        eval_ids = [r["doc_id"] for r in eval_docs.collect()]
        flagged = [i for i in eval_ids
                   if dec[i]["quality_keep"] and dec[i]["contaminated"]]
        # every quality-surviving planted doc is flagged and dropped
        for i in flagged:
            assert not dec[i]["final_keep"]
        assert any(dec[i]["contaminated"] for i in eval_ids
                   if dec[i]["quality_keep"])


class TestCurationResume:
    def test_kill_and_resume_reuses_early_stages(self, spark, docs,
                                                 tmp_path):
        import shutil

        ck = str(tmp_path / "ckpt")
        first = run_curation(spark, docs, checkpoint_dir=ck)
        expected = sorted(map(tuple, first["decision"].collect()))

        # simulate a crash after the dedup stage: wipe everything later
        for stage in ("decision", "weights", "shards"):
            shutil.rmtree(os.path.join(ck, stage), ignore_errors=True)
        early_mtime = os.path.getmtime(
            os.path.join(ck, "keep_list", "_saber_manifest.json"))

        second = run_curation(spark, docs, checkpoint_dir=ck)
        assert sorted(map(tuple, second["decision"].collect())) == expected
        # the expensive early stage was REPLAYED from parquet, not rerun
        assert os.path.getmtime(
            os.path.join(ck, "keep_list", "_saber_manifest.json")) == early_mtime


class TestCurationConfigPinning:
    def test_changed_config_recomputes_stale_stages(self, spark, docs,
                                                    tmp_path):
        """Rerunning against an existing checkpoint dir with a different
        dedup threshold / a newly supplied eval set must RECOMPUTE the
        affected stages, not silently serve the stale cache (r4 review
        finding)."""
        import os

        ck = str(tmp_path / "ckpt")
        run_curation(spark, docs, checkpoint_dir=ck)
        manifest = os.path.join(ck, "keep_list", "_saber_manifest.json")
        t_first = os.path.getmtime(manifest)
        dec_manifest = os.path.join(ck, "decision", "_saber_manifest.json")
        t_dec_first = os.path.getmtime(dec_manifest)

        # same config -> replay, nothing recomputed
        run_curation(spark, docs, checkpoint_dir=ck)
        assert os.path.getmtime(manifest) == t_first

        # different threshold -> keep_list + decision recompute
        run_curation(spark, docs, checkpoint_dir=ck, dedup_threshold=0.9)
        assert os.path.getmtime(manifest) > t_first
        assert os.path.getmtime(dec_manifest) > t_dec_first

        # newly supplied eval set -> decision recomputes with contamination
        eval_docs = docs.limit(2).select("doc_id", "text")
        out = run_curation(spark, docs, checkpoint_dir=ck,
                           dedup_threshold=0.9, eval_docs=eval_docs)
        assert out["decision"].filter("contaminated").count() >= 1


class TestCurationEmptyCorpus:
    def test_empty_input_yields_empty_tables_without_error(self, spark):
        """An empty crawl slice (scheduling reality at 10^12 docs: some
        partitions/days are empty) must produce empty-but-well-formed
        tables through the WHOLE curation chain, not exceptions."""
        empty = spark.createDataFrame(
            [], "doc_id long, text string, source string")
        out = run_curation(spark, empty)
        for name in ("verdicts", "decision", "weights", "shards"):
            assert out[name].count() == 0, name
        assert "final_keep" in out["decision"].columns

    def test_all_docs_filtered_yields_empty_survivor_tables(self, spark):
        """Every doc failing quality: decision has one row per doc (all
        drops), weights/shards are empty, dedup never sees a doc."""
        docs = spark.createDataFrame(
            [(1, "zz", "a"), (2, "qq ww", "b")],
            "doc_id long, text string, source string")
        out = run_curation(spark, docs)
        dec = out["decision"].collect()
        assert len(dec) == 2
        assert all(not r["final_keep"] for r in dec)
        assert out["weights"].count() == 0
        assert out["shards"].count() == 0


class TestLineageReport:
    def test_manifests_become_one_queryable_table(self, spark, docs,
                                                  tmp_path):
        from pyspark.sql import functions as F

        from saber_spark.checkpoint import lineage_report
        ck = str(tmp_path / "ck")
        out = run_curation(spark, docs, checkpoint_dir=ck)
        rep = lineage_report(spark, ck)
        stages = {r["stage"] for r in rep.select("stage").distinct().collect()}
        assert {"verdicts", "scrubbed", "keep_list", "decision",
                "weights", "shards"} <= stages
        # per-partition rows sum to the stage total
        sums = {r["stage"]: r["s"] for r in
                rep.groupBy("stage").agg(F.sum("rows").alias("s")).collect()}
        totals = {r["stage"]: r["stage_rows"] for r in
                  rep.select("stage", "stage_rows").distinct().collect()}
        for s in stages:
            assert sums[s] == totals[s], s
        # config-pinned stages carry their config
        klcfg = rep.filter("stage = 'keep_list'") \
            .select("config_json").first()["config_json"]
        assert "dedup_threshold" in klcfg
        # decision row count equals the input corpus
        assert totals["decision"] == docs.count()
