"""Pinned, fully-interleaved N vs 4N scaling measurement.

Third protocol generation. The paired protocol (run_scaling_paired.py)
alternates LEVEL PROCESSES (each several minutes); measured drift on this
VM swings throughput 2x on minute scales, so drift still lands between the
two members of a pair. This protocol:

  - pins each level to exactly its core budget via taskset (run_scaling.
    run_level): local[N] is a true N-core cgroup — GC, netty, parquet and
    Python workers all compete inside the pin, like a real executor;
  - alternates SINGLE-timed-run processes L,H,L,H,... (`--samples` each,
    untimed warmup inside every process) so each level's samples spread
    evenly across the whole measurement window;
  - reports the MEDIAN of each level's samples and the efficiency of the
    medians, plus every raw sample (nothing selected).

Writes BENCH/scaling_interleaved.json.
Usage: python BENCH/run_scaling_interleaved.py [--samples 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import REPO, run_level  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--n4", type=int, default=16)
    ap.add_argument("--samples", type=int, default=5)
    args = ap.parse_args()

    pages_dir = tempfile.mkdtemp(prefix="scali_pages_") + "/pages"
    low_samples, high_samples = [], []
    for i in range(args.samples):
        low = run_level(args.n, args.replicate, args.sf_dir, pages_dir, 1)
        high = run_level(args.n4, args.replicate, args.sf_dir, pages_dir, 1)
        low_samples.append(low)
        high_samples.append(high)
        print(json.dumps({"round": i,
                          "low_dps": low["docs_per_sec"],
                          "high_dps": high["docs_per_sec"]}))

    docs = low_samples[0]["docs"]
    lo_dps = [s["docs_per_sec"] for s in low_samples]
    hi_dps = [s["docs_per_sec"] for s in high_samples]
    lo_med = statistics.median(lo_dps)
    hi_med = statistics.median(hi_dps)
    eff = hi_med / ((args.n4 / args.n) * lo_med)
    report = {
        "protocol": (f"PINNED taskset 0-{args.n - 1} local[{args.n}] vs "
                     f"0-{args.n4 - 1} local[{args.n4}]; single-timed-run "
                     f"processes fully interleaved L,H x{args.samples}; "
                     "median per level; efficiency of medians"),
        "input": f"{args.sf_dir} pages x{args.replicate} ({docs} docs)",
        "low_docs_per_sec_samples": lo_dps,
        "high_docs_per_sec_samples": hi_dps,
        "low_seconds_samples": [s["median_seconds"] for s in low_samples],
        "high_seconds_samples": [s["median_seconds"] for s in high_samples],
        "low_docs_per_sec_median": round(lo_med, 3),
        "high_docs_per_sec_median": round(hi_med, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH", "scaling_interleaved.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("low_docs_per_sec_median", "high_docs_per_sec_median",
                       "scaling_efficiency", "pass")}))


if __name__ == "__main__":
    main()
