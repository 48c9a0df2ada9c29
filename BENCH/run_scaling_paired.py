"""Paired N vs 4N scaling measurement — drift-robust protocol.

Two independent median-of-5 runs of run_scaling.py measured raw 4->16
efficiencies of 0.835 and 0.532 on IDENTICAL code and input: the sandbox
hypervisor's steal drifts on minute scales, so an unpaired comparison
(all low-level runs, then all high-level runs) measures the machine's mood
as much as the job. This protocol removes the drift term:

  - levels alternate in time: L,H,L,H,... one fresh process each;
  - each process does an untimed warmup + `--runs` timed runs and reports
    its MEDIAN (robust within-process);
  - efficiency is computed PER ADJACENT PAIR (measured minutes apart under
    near-identical machine conditions) and the MEDIAN of pair efficiencies
    is the headline — machine drift shifts both members of a pair together
    and cancels in the ratio.

Writes BENCH/scaling_paired.json.
Usage: python BENCH/run_scaling_paired.py [--pairs 3] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import REPO, _pin_tag, run_level  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--n4", type=int, default=16)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="scaling_paired.json",
                    help="output filename inside BENCH/")
    args = ap.parse_args()

    pages_dir = tempfile.mkdtemp(prefix="scalp_pages_") + "/pages"
    pairs = []
    for i in range(args.pairs):
        low = run_level(args.n, args.replicate, args.sf_dir, pages_dir,
                        args.runs)
        high = run_level(args.n4, args.replicate, args.sf_dir, pages_dir,
                         args.runs)
        eff = high["docs_per_sec"] / ((args.n4 / args.n) * low["docs_per_sec"])
        pairs.append({"pair": i, "low": low, "high": high,
                      "efficiency": round(eff, 3)})
        print(json.dumps(pairs[-1]))

    effs = [p["efficiency"] for p in pairs]
    report = {
        "protocol": (f"PAIRED {_pin_tag(args.n)}local[{args.n}] vs "
                     f"{_pin_tag(args.n4)}local[{args.n4}]: levels "
                     f"alternate in time, {args.runs} timed runs per process "
                     f"(median), efficiency per adjacent pair, median of "
                     f"pair efficiencies reported"),
        "input": f"{args.sf_dir} pages x{args.replicate}",
        "pairs": pairs,
        "pair_efficiencies": effs,
        "scaling_efficiency": round(statistics.median(effs), 3),
        "target": 0.8,
        "pass": statistics.median(effs) >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH", args.out), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("pair_efficiencies", "scaling_efficiency", "pass")}))


if __name__ == "__main__":
    main()
