"""End-to-end corpus-curation pipeline — the training-data twin of the KG
job (pipeline.py): one resumable, checkpointed Spark job turning a raw
document table into a release-ready training corpus plus full audit
tables.

documents
  --quality_filter--> per-doc keep/drop verdicts (lang/quality/repetition
                      reasons — every dropped doc is explainable)
  --pii_scrub-------> masked text + PII counts (release hygiene)
  --dedup_clusters--> transitive near-dup keep-list (LSH -> Jaccard -> CC)
  --contamination---> benchmark n-gram overlap flags (optional eval set)
  --decision--------> ONE row per input doc joining every stage's verdict
                      + final_keep (the corpus release decision table)
  --mixture_weights-> temperature-scaled source mixing plan over survivors
  --pack_sequences--> token-budget shard assignments for the kept corpus

Stage order is deliberate: quality filtering FIRST shrinks the corpus
before the (more expensive) shingle-based dedup; PII masking runs before
dedup so near-identical docs differing only in masked spans cluster
together; contamination runs on the masked text the release would ship.

Every stage goes through checkpoint.run_stage: with --checkpoint-dir the
job is kill-and-resume safe with per-partition lineage manifests, exactly
like the KG pipeline (north_rule checkpoint/lineage applies to curation
runs the same way — a 100 TB curation pass is hours of work you do not
restart from zero).

Run as a job:
  python -m saber_spark.curate --sf-dir /root/testdata/sf0.001 \
      --out /tmp/curate_out [--checkpoint-dir /tmp/curate_ckpt]
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saber_spark import checkpoint as ckpt
from saber_spark.operators.dedup import contamination_check, dedup_clusters
from saber_spark.operators.packing import pack_sequences
from saber_spark.operators.splits import mixture_weights
from saber_spark.operators.textstats import pii_scrub, quality_filter


def run_curation(
    spark: SparkSession,
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    checkpoint_dir: str | None = None,
    dedup_threshold: float = 0.5,
    pack_window: int = 512,
    contamination_n: int = 5,
    persist: bool = True,
) -> dict[str, DataFrame]:
    """Full curation pass; returns
    {verdicts, scrubbed, keep_list, decision, weights, shards}.

    ``decision`` is the audit artifact: one row PER INPUT DOC with every
    stage's verdict and ``final_keep`` = quality_keep AND dup_keep AND NOT
    contaminated. ``shards``/``weights`` cover only final_keep survivors.

    Scale notes: quality_filter/pii_scrub are narrow (plus gopher's two
    doc-local aggs); dedup runs on the quality-KEPT subset only (the
    standard order — RefinedWeb dedups after rule filtering, cutting the
    shingle volume by the reject rate); the decision table is built with
    doc_id equi-joins of per-stage verdict tables, each already
    doc_id-sized or smaller. Without a checkpoint_dir the multi-consumer
    stages (verdicts, the kept corpus, the decision table) are persisted
    once so downstream consumers don't recompute the filter chain;
    ``persist=False`` disables that for one-shot callers (e.g. the driver
    query wrapper) that would otherwise leak cached partitions they
    cannot release.

    Checkpoint stages are CONFIG-PINNED: rerunning against an existing
    checkpoint_dir with a different dedup_threshold / pack_window /
    eval set recomputes the affected stages instead of silently serving
    the stale cache (checkpoint.is_complete).
    """
    cfg = {"dedup_threshold": dedup_threshold,
           "has_eval": eval_docs is not None,
           "contamination_n": contamination_n}

    def _persist(df: DataFrame) -> DataFrame:
        return df.persist() if persist and checkpoint_dir is None else df

    verdicts = _persist(ckpt.run_stage(
        spark, checkpoint_dir, "verdicts",
        lambda: quality_filter(docs)))

    def compute_scrubbed() -> DataFrame:
        kept_ids = verdicts.filter("keep").select("doc_id")
        kept = docs.join(kept_ids, "doc_id")
        sc = pii_scrub(kept)
        # carry the masked text forward as THE text of the curated corpus
        return (kept.drop("text")
                .join(sc.withColumnRenamed("scrubbed", "text"), "doc_id"))

    scrubbed = _persist(ckpt.run_stage(spark, checkpoint_dir, "scrubbed",
                                       compute_scrubbed))

    keep_list = ckpt.run_stage(
        spark, checkpoint_dir, "keep_list",
        lambda: dedup_clusters(scrubbed, threshold=dedup_threshold,
                               rounds=None),
        config=cfg)

    if eval_docs is not None:
        contamination = ckpt.run_stage(
            spark, checkpoint_dir, "contamination",
            lambda: contamination_check(scrubbed, eval_docs,
                                        n=contamination_n),
            config=cfg)
    else:
        contamination = None

    def compute_decision() -> DataFrame:
        d = (verdicts
             .withColumnRenamed("keep", "quality_keep")
             .join(keep_list.select(
                 "doc_id", "cluster_id", "cluster_size",
                 F.col("keep").alias("dup_keep")), "doc_id", "left"))
        if contamination is not None:
            d = d.join(contamination.select("doc_id", "contaminated"),
                       "doc_id", "left")
        else:
            d = d.withColumn("contaminated", F.lit(False))
        # quality-dropped docs never reached dedup: their dup columns are
        # NULL by construction, and they are dropped regardless
        return d.select(
            "doc_id", "quality_keep", "n_failed", "reasons",
            "cluster_id", "cluster_size", "dup_keep",
            F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
            (F.col("quality_keep")
             & F.coalesce("dup_keep", F.lit(False))
             & ~F.coalesce("contaminated", F.lit(False))
             ).alias("final_keep"))

    decision = _persist(ckpt.run_stage(spark, checkpoint_dir, "decision",
                                       compute_decision, config=cfg))

    def final_corpus() -> DataFrame:
        return scrubbed.join(
            decision.filter("final_keep").select("doc_id"), "doc_id")

    weights = ckpt.run_stage(
        spark, checkpoint_dir, "weights",
        lambda: mixture_weights(final_corpus()), config=cfg)
    shards = ckpt.run_stage(
        spark, checkpoint_dir, "shards",
        lambda: pack_sequences(final_corpus(), window=pack_window),
        config={**cfg, "pack_window": pack_window})

    return {"verdicts": verdicts, "scrubbed": scrubbed,
            "keep_list": keep_list, "decision": decision,
            "weights": weights, "shards": shards}


def main() -> None:
    from saber_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--eval-dir", default=None,
                    help="optional parquet dir of benchmark docs "
                         "(doc_id, text) for decontamination")
    ap.add_argument("--dedup-threshold", type=float, default=0.5)
    ap.add_argument("--pack-window", type=int, default=512)
    args = ap.parse_args()

    spark = get_spark("saber_spark.curate")
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    eval_docs = (spark.read.parquet(args.eval_dir)
                 if args.eval_dir else None)
    out = run_curation(spark, docs, eval_docs=eval_docs,
                       checkpoint_dir=args.checkpoint_dir,
                       dedup_threshold=args.dedup_threshold,
                       pack_window=args.pack_window)
    for name in ("decision", "weights", "shards"):
        out[name].write.mode("overwrite").parquet(
            os.path.join(args.out, name))
    dec = spark.read.parquet(os.path.join(args.out, "decision"))
    metrics = {
        "n_docs": dec.count(),
        "n_quality_kept": dec.filter("quality_keep").count(),
        "n_final_kept": dec.filter("final_keep").count(),
        "n_contaminated": dec.filter("contaminated").count(),
    }
    with open(os.path.join(args.out, "metrics.json"), "w") as fh:
        json.dump(metrics, fh, indent=1)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
