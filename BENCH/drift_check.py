"""Interleaved re-measure of canonicalize_salted / triples_cooccur drift
(VERDICT r3 What's-wrong #3) at bench shape: sf0.1, local[32], first-run
per fresh plan + steady second run, 2 interleaved rounds."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import __spark_entry__ as e
from saber_spark.session import get_spark

spark = get_spark("drift", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
qs = e.queries()
SF = "/root/testdata/sf0.1"
names = ["canonicalize_salted", "triples_cooccur"]
# warmup python workers/JIT on an unrelated query
qs["token_freq"](spark, SF).count()
out = {n: [] for n in names}
for rnd in range(2):
    for n in names:
        t0 = time.monotonic(); qs[n](spark, SF).count()
        first = time.monotonic() - t0
        t0 = time.monotonic(); qs[n](spark, SF).count()
        steady = time.monotonic() - t0
        out[n].append({"first": round(first, 3), "steady": round(steady, 3)})
print(json.dumps(out))
