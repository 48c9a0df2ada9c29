"""Extra benchmarks (guide §1.4): per-query isolation with the noop sink.

NOT part of the frozen driver contract — bench.py is the measured harness.
This script exists so optimization work can time individual queries (and
capture their formatted plans) without running the whole 270-query suite.

Usage:
  python bench_extra.py q1 q2 ...            # time first+second .count()
  python bench_extra.py --noop q1 ...        # noop-sink instead of count
  python bench_extra.py --explain DIR q1 ... # also write <q>.txt plans
  python bench_extra.py --repeat N q1 ...    # N timed repeats (default 2)

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS — same contract as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--noop", action="store_true",
                    help="materialize via noop sink instead of .count()")
    ap.add_argument("--explain", metavar="DIR",
                    help="write .explain('formatted') to DIR/<query>.txt")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)

    import __spark_entry__ as e
    from saber_spark.session import get_spark

    spark = get_spark("saber_spark.bench_extra", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    jvm_gc = spark.sparkContext._jvm.System.gc

    out: dict[str, list[float]] = {}
    for name in args.queries:
        if name not in qs:
            print(f"!! unknown query: {name}", file=sys.stderr)
            continue
        jvm_gc()
        runs = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            runs.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = runs
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        print(json.dumps({name: runs}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "timings": out}))


if __name__ == "__main__":
    main()
