"""A/B: shared shingle stage vs in-codegen recompute for the dedup chain.

The candidates+verify chain (minhash_candidates -> ngram_jaccard) references
the narrow shingle lineage in several join branches; Catalyst recomputes it
per branch (8 scans observed in the formatted plan). Three physical
strategies for that shared stage, measured at bench scale:

  recompute     status quo — each branch recomputes shingles inside
                whole-stage codegen (no cache, no extra I/O)
  persist       doc_shingles().persist(MEMORY_AND_DISK) shared by both stages
  materialized  doc_shingles() written to parquet once, read back — the
                "materialized checkpoint stage" shape a 100 TB run would use

Input: sf0.1 documents replicated REPLICATE x. Naive replication would make
every replica group an exact-dup clique (quadratic candidate blowup), and a
per-replica global word sort makes ALL docs near-dups (the 31-token test
vocabulary collapses under any corpus-wide ordering — measured: 4M candidate
pairs from 10k docs). Instead each base doc spawns REPLICATE/8 permutation
families (positional sort key xxhash64(word, position, base_doc, family) —
doc-specific AND per-occurrence, so the word-salad randomness survives) x 8
variants each dropping a different single word: bounded near-dup groups of
8 (28 verify pairs per group), candidate count linear in corpus size like
real web data (measured at x8: 133,514 in-group + 22,913 cross-group noise
pairs from 40,000 docs). Production id
path (portable_ids=False, xxhash64 shingle ids — no global vocab sort).

Variants alternate in time (A,B,C,A,B,C,...) so hypervisor drift hits all
three equally; per-variant MEDIAN is reported. Writes BENCH/ab_shingles.json.

Usage: python BENCH/ab_shingles.py [--replicate 32] [--rounds 3] [--cpus 32]
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


def build_corpus(spark, sf_dir: str, replicate: int, out: str):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    fam = (F.col("_rep") / 8).cast("int")
    variant = F.col("_rep") % 8
    arr = F.split(F.col("text"), " ")
    # doc+family-specific POSITIONAL shuffle, then drop the variant-th word.
    # The sort key must include the position: keying on the word alone
    # clusters duplicate words into runs ("hash hash hash big big ...") and
    # over a 31-word vocabulary every doc then shares the same few
    # "w w w" shingles — measured 5.5M candidate pairs from 40k docs.
    idx = F.sequence(F.lit(1), F.size(arr))
    perm = F.transform(
        F.array_sort(F.zip_with(arr, idx, lambda w, i: F.struct(
            F.xxhash64(w, i, F.col("doc_id"), fam).alias("h"),
            w.alias("w")))),
        lambda s: s["w"])
    kept = F.filter(perm, lambda w, i: i != variant)
    shuffled = (
        docs
        .withColumn("_rep", F.explode(
            F.sequence(F.lit(0), F.lit(replicate - 1))))
        .withColumn("text", F.concat_ws(" ", kept))
        .withColumn("doc_id", F.col("doc_id") * replicate + F.col("_rep"))
        .drop("_rep"))
    shuffled.repartition(64, "doc_id").write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def run_variant(spark, docs, variant: str, scratch: str) -> dict:
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.storagelevel import StorageLevel

    from saber_spark.operators.dedup import (doc_shingles, minhash_candidates,
                                             ngram_jaccard)

    t0 = time.monotonic()
    if variant == "recompute":
        pairs = minhash_candidates(docs)
        out = ngram_jaccard(docs, pairs)
        n = out.count()
    elif variant == "persist":
        sh = doc_shingles(docs).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            pairs = minhash_candidates(docs, shingles=sh)
            out = ngram_jaccard(docs, pairs, shingles=sh)
            n = out.count()
        finally:
            sh.unpersist()
    elif variant == "materialized":
        path = os.path.join(scratch, "shingles")
        doc_shingles(docs).write.mode("overwrite").parquet(path)
        sh = docs.sparkSession.read.parquet(path)
        pairs = minhash_candidates(docs, shingles=sh)
        out = ngram_jaccard(docs, pairs, shingles=sh)
        n = out.count()
        shutil.rmtree(path, ignore_errors=True)
    else:
        raise ValueError(variant)
    return {"seconds": round(time.monotonic() - t0, 3), "pairs": n}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from saber_spark.session import get_spark

    spark = get_spark("ab_shingles", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="ab_shingles_")
    docs = build_corpus(spark, args.sf_dir, args.replicate,
                        os.path.join(scratch, "corpus"))
    n_docs = docs.count()

    variants = ["recompute", "persist", "materialized"]
    # untimed warmup (python workers + JIT), one per variant shape
    for v in variants:
        run_variant(spark, docs, v, scratch)

    samples: dict[str, list[dict]] = {v: [] for v in variants}
    for _ in range(args.rounds):
        for v in variants:          # interleaved: drift hits all equally
            samples[v].append(run_variant(spark, docs, v, scratch))

    report = {
        "input": (f"{args.sf_dir} documents x{args.replicate} "
                  f"(per-family positional shuffle, drop-one-word variants), "
                  f"{n_docs} docs, "
                  f"local[{args.cpus}], production xxhash64 shingle ids"),
        "protocol": (f"{args.rounds} interleaved timed rounds per variant "
                     "after one untimed warmup each; median reported"),
        "samples": samples,
        "median_seconds": {
            v: round(statistics.median(s["seconds"] for s in samples[v]), 3)
            for v in variants},
        "pairs": samples["recompute"][0]["pairs"],
    }
    meds = report["median_seconds"]
    report["winner"] = min(meds, key=meds.get)
    with open(os.path.join(REPO, "BENCH", "ab_shingles.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("median_seconds", "winner", "pairs")}))
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
