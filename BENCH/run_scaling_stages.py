"""Stage-level N vs 4N scaling — the job-intrinsic signal, machine-checkable.

BASELINE.md's strongest scaling claim is the within-session stage table
(dominant extract+tag+link stage ~4x at 4x threads). This script produces
that table as a committed JSON instead of prose: each level runs in a fresh
process (a JVM cannot change master in-place) on identical input and times
each pipeline stage SEPARATELY:

  linked   run_pipeline + materialize the persisted `linked` stage
           (all Python/Arrow work + broadcast linking + salted agg)
  edges    edges sink parquet write (consumes persisted `linked`)
  nodes    nodes sink parquet write (ditto)

Sinks are written sequentially here (isolating each stage's time); the
throughput benches write them concurrently. Per-stage MEDIAN over --runs
timed repeats after an untimed warmup. Efficiency per stage =
(t_low / t_high) / (n4 / n).

Levels alternate in time (L,H,L,H — the run_scaling_paired.py protocol):
this VM's high level swings 1.8x between back-to-back identical fresh
processes (measured 72.6s then 40.8s, machine idle, hw probe healthy), so
a single unpaired comparison measures the hypervisor's mood. Efficiency is
computed per adjacent pair and the median across pairs is the headline.

Writes BENCH/scaling_stages.json.
Usage: python BENCH/run_scaling_stages.py [--replicate 32] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, statistics, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from saber_spark.session import get_spark
from saber_spark.fixtures.pages import build_pages_df
from saber_spark.pipeline import run_pipeline

cpus = int(sys.argv[1]); replicate = int(sys.argv[2])
sf_dir = sys.argv[3]; out = sys.argv[4]; pages_dir = sys.argv[5]
n_runs = int(sys.argv[6])
spark = get_spark("scaling_stages", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")

DOC_REPEAT = int(os.environ.get("SCALING_DOC_REPEAT", "20"))
if not os.path.exists(pages_dir + "/_SUCCESS"):
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    long_docs = (docs
                 .withColumn("_rep", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))))
                 .withColumn("doc_id", F.col("doc_id") * replicate + F.col("_rep"))
                 .drop("_rep")
                 .withColumn("text", F.concat_ws(" ", *([F.col("text")] * DOC_REPEAT)))
                 .withColumn("n_chars", F.length("text")))
    scaled_sf = pages_dir + "_docs"
    long_docs.repartition(128, "doc_id").write.mode("overwrite").parquet(
        scaled_sf + "/documents.parquet")
    build_pages_df(spark, scaled_sf).write.mode("overwrite").parquet(pages_dir)

pages = spark.read.parquet(pages_dir)
n_docs = pages.filter("lang = 'en'").count()

warm = run_pipeline(spark, pages)
warm["edges"].write.mode("overwrite").parquet(out + "/warm_edges")
for df in warm.values():
    try:
        df.unpersist()
    except Exception:
        pass

stage_times = {"linked": [], "edges": [], "nodes": []}
for _ in range(n_runs):
    t0 = time.monotonic()
    result = run_pipeline(spark, pages)
    result["linked"].count()
    stage_times["linked"].append(time.monotonic() - t0)
    t0 = time.monotonic()
    result["edges"].write.mode("overwrite").parquet(out + "/edges")
    stage_times["edges"].append(time.monotonic() - t0)
    t0 = time.monotonic()
    result["nodes"].write.mode("overwrite").parquet(out + "/nodes")
    stage_times["nodes"].append(time.monotonic() - t0)
    for df in result.values():
        try:
            df.unpersist()
        except Exception:
            pass
print(json.dumps({
    "cpus": cpus, "docs": n_docs,
    "samples": {k: [round(t, 3) for t in v] for k, v in stage_times.items()},
    "median": {k: round(statistics.median(v), 3)
               for k, v in stage_times.items()},
}))
"""


def run_level(cpus: int, replicate: int, sf_dir: str, pages_dir: str,
              runs: int) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    # pin to the level's core budget (see run_scaling.run_level): without
    # this, a local[N] JVM schedules GC/netty/Python workers onto the other
    # cores and the low level is not an N-core measurement
    prefix = (["taskset", "-c", f"0-{cpus - 1}"]
              if shutil.which("taskset") else [])
    with tempfile.TemporaryDirectory(prefix=f"scst{cpus}_") as out:
        proc = subprocess.run(
            prefix + [sys.executable, "-c", WORKER % {"repo": REPO},
             str(cpus), str(replicate), sf_dir, out, pages_dir, str(runs)],
            capture_output=True, text=True, cwd=REPO, timeout=3600, env=env)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-3000:])
        raise SystemExit(f"level cpus={cpus} failed")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--n4", type=int, default=16)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--pairs", type=int, default=2,
                    help="adjacent L,H pairs (drift-robust, like "
                         "run_scaling_paired.py): efficiency per pair, "
                         "median across pairs")
    args = ap.parse_args()

    scratch = tempfile.mkdtemp(prefix="scst_pages_")
    pages_dir = scratch + "/pages"
    ratio = args.n4 / args.n
    pair_rows = []
    try:
        for i in range(args.pairs):
            low = run_level(args.n, args.replicate, args.sf_dir, pages_dir,
                            args.runs)
            high = run_level(args.n4, args.replicate, args.sf_dir, pages_dir,
                             args.runs)
            stages = {}
            for st in ("linked", "edges", "nodes"):
                sp = low["median"][st] / high["median"][st]
                stages[st] = {
                    "low_median_s": low["median"][st],
                    "high_median_s": high["median"][st],
                    "speedup": round(sp, 2),
                    "efficiency": round(sp / ratio, 3),
                }
            pair_rows.append({"pair": i, "low": low, "high": high,
                              "stages": stages})
            print(json.dumps({"pair": i, "stages": stages}))
    finally:
        # the replicated x20-length corpus is multi-GB; leaking one tree
        # per run would let disk pressure perturb later measurements
        shutil.rmtree(scratch, ignore_errors=True)

    summary = {
        st: {
            "speedup_median": round(statistics.median(
                p["stages"][st]["speedup"] for p in pair_rows), 2),
            "efficiency_median": round(statistics.median(
                p["stages"][st]["efficiency"] for p in pair_rows), 3),
            "speedups": [p["stages"][st]["speedup"] for p in pair_rows],
        }
        for st in ("linked", "edges", "nodes")
    }
    report = {
        "protocol": ((f"PINNED (taskset per level) "
                      if shutil.which("taskset") else "UNPINNED ")
                     + f"PAIRED fresh-process levels local[{args.n}] vs "
                     f"local[{args.n4}], alternating in time "
                     f"({args.pairs} pairs), identical input, untimed "
                     f"warmup + {args.runs} timed runs per process "
                     "(median); per-stage efficiency per adjacent pair, "
                     "median across pairs; sinks written sequentially to "
                     "isolate stage times"),
        "input": f"{args.sf_dir} pages x{args.replicate}",
        "docs": pair_rows[0]["low"]["docs"],
        "pairs": pair_rows,
        "summary": summary,
    }
    with open(os.path.join(REPO, "BENCH", "scaling_stages.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"summary": summary, "docs": report["docs"]}))


if __name__ == "__main__":
    main()
