#!/bin/sh
# Run the KG pipeline the way the north rule states: spark-submit --py-files.
#
# Packages saber_spark/ into a zip (what --py-files ships to every executor
# on a real cluster) and submits pipeline.py against it. In this sandbox the
# master is local[N]; on a cluster only --master/--deploy-mode change.
#
# Usage: tools/submit_pipeline.sh [cpus] [sf_dir] [out_dir] [job]
#   job: pipeline (default, the KG build) | curate (the corpus-curation job)
set -eu
CPUS="${1:-8}"
SF_DIR="${2:-/root/testdata/sf0.001}"
OUT="${3:-/tmp/kg_submit_out}"
JOB="${4:-pipeline}"
case "$JOB" in pipeline|curate) ;; *) echo "unknown job: $JOB" >&2; exit 2;; esac
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="/tmp/saber_spark_pkg.zip"

rm -f "$ZIP"
(cd "$REPO" && python -c "
import os, zipfile
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('saber_spark'):
        if '__pycache__' in root:
            continue
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
")

# get_spark() builds the session in-app; align its parallelism with the
# submit-level master (builder config wins over spark-submit conf in client
# mode, so the env var is the single source of truth)
SPARK_GRAFT_CPUS="$CPUS"
export SPARK_GRAFT_CPUS

exec spark-submit \
  --master "local[$CPUS]" \
  --conf spark.sql.shuffle.partitions="$CPUS" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  "$REPO/saber_spark/$JOB.py" \
  --sf-dir "$SF_DIR" --out "$OUT"
