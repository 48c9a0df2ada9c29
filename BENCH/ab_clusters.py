"""A/B: dedup_clusters end-to-end with vs without a shared shingle stage.

VERDICT r3 #5: dedup_clusters is the slowest bench query (4.77 s first-run
at sf0.1) and references the shingle lineage in BOTH the LSH-candidate
branch and the Jaccard-verify branch; ab_shingles.json already showed the
shared persisted stage wins for the candidates+verify pair at x32 corpus
scale. This harness measures the FULL capstone chain (candidates -> verify
-> connected components -> keep table) at the same x32 scale:

  recompute  status quo — dedup_clusters(docs) recomputes shingles per
             branch inside codegen
  persist    doc_shingles() persisted MEMORY_AND_DISK, passed via the
             existing shingles= parameter to both branches
  materialized  doc_shingles() written to parquet once, read back — the
             durable-checkpoint shape a 100 TB run would use

Same replicated-corpus builder and interleaved-rounds protocol as
ab_shingles.py (import reuse). Writes BENCH/ab_clusters.json.

Usage: python BENCH/ab_clusters.py [--replicate 32] [--rounds 3] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "BENCH"))

from ab_shingles import build_corpus  # noqa: E402


def run_variant(spark, docs, variant: str, scratch: str) -> dict:
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from saber_spark.operators.dedup import dedup_clusters, doc_shingles

    t0 = time.monotonic()
    sh = None
    path = None
    if variant == "persist":
        sh = doc_shingles(docs).persist(StorageLevel.MEMORY_AND_DISK)
    elif variant == "materialized":
        path = os.path.join(scratch, "shingles")
        doc_shingles(docs).write.mode("overwrite").parquet(path)
        sh = docs.sparkSession.read.parquet(path)
    try:
        out = dedup_clusters(docs, threshold=0.5, rounds=None, shingles=sh)
        agg = out.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("keep").cast("long")).alias("kept")).collect()[0]
        seconds = time.monotonic() - t0  # stop BEFORE cleanup: unpersist /
        # rmtree are not part of the measured chain
    finally:
        if variant == "persist":
            sh.unpersist()
        if path:
            shutil.rmtree(path, ignore_errors=True)
    return {"seconds": round(seconds, 3),
            "rows": agg["rows"], "kept": agg["kept"]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from saber_spark.session import get_spark

    spark = get_spark("ab_clusters", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="ab_clusters_")
    docs = build_corpus(spark, args.sf_dir, args.replicate,
                        os.path.join(scratch, "corpus"))
    n_docs = docs.count()

    variants = ["recompute", "persist", "materialized"]
    for v in variants:  # untimed warmup per shape
        run_variant(spark, docs, v, scratch)

    samples: dict[str, list[dict]] = {v: [] for v in variants}
    for _ in range(args.rounds):
        for v in variants:  # interleaved: drift hits all equally
            samples[v].append(run_variant(spark, docs, v, scratch))

    # the three variants must compute the SAME result — otherwise the
    # timing comparison is between non-equivalent plans
    results = {(s["rows"], s["kept"]) for ss in samples.values() for s in ss}
    assert len(results) == 1, f"variant results diverge: {results}"

    report = {
        "chain": "dedup_clusters (LSH -> jaccard>=0.5 -> CC -> keep table)",
        "input": (f"{args.sf_dir} documents x{args.replicate}, {n_docs} "
                  f"docs, local[{args.cpus}], production xxhash64 ids"),
        "protocol": (f"{args.rounds} interleaved timed rounds per variant "
                     "after one untimed warmup each; median reported"),
        "samples": samples,
        "median_seconds": {
            v: round(statistics.median(s["seconds"] for s in samples[v]), 3)
            for v in variants},
        "rows": samples["recompute"][0]["rows"],
        "kept": samples["recompute"][0]["kept"],
    }
    meds = report["median_seconds"]
    report["winner"] = min(meds, key=meds.get)
    with open(os.path.join(REPO, "BENCH", "ab_clusters.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("median_seconds", "winner", "rows", "kept")}))
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
