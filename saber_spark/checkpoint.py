"""Checkpoint/resume with per-partition lineage + metrics (north_rule).

Each pipeline stage can be materialized to parquet with a lineage column
(``_part_id`` = spark_partition_id at write time) and a sidecar manifest
``_saber_manifest.json`` holding row counts per partition, total rows, and
stage metrics. On resume, a stage whose manifest exists and is marked
complete is loaded from parquet instead of recomputed — a rerun after a
mid-job failure skips all finished stages (reference analogue: Keras
ModelCheckpoint per epoch, saber/utils/model_utils.py:86-112, generalized to
dataflow stages).

Why a sidecar and not _SUCCESS alone: _SUCCESS says "a job finished", the
manifest says WHICH stage wrote it, over how many rows, from which config —
enough to audit lineage at 100 TB without re-scanning.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_saber_manifest.json"
LINEAGE_COL = "_part_id"


def _manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST_NAME)


def is_complete(path: str, stage: str,
                config: dict | None = None) -> bool:
    """A stage replays only if its manifest is complete AND was written
    under the same ``config`` (a JSON-able dict of the parameters the
    stage's output depends on). A config mismatch — e.g. rerunning
    curation with a newly supplied eval set or a different dedup
    threshold against an old checkpoint dir — must RECOMPUTE, not
    silently serve stale output. Stages written before a config was
    recorded (or checked without one) keep the old name-only behavior."""
    try:
        with open(_manifest_path(path)) as f:
            m = json.load(f)
        if not (m.get("stage") == stage and m.get("complete") is True):
            return False
        if config is not None and m.get("config") is not None                 and m["config"] != config:
            return False
        return True
    except (OSError, json.JSONDecodeError):
        return False


def write_stage(df: DataFrame, path: str, stage: str,
                partition_by: list[str] | None = None,
                extra_metrics: dict | None = None,
                fmt: str | None = None,
                config: dict | None = None) -> DataFrame:
    """Materialize a stage with lineage, write the manifest, return a reader.

    The lineage column records the physical partition that produced each row
    (per-partition lineage, north_rule); per-partition row counts land in the
    manifest for audit/resume. Writes go through the sink registry, so the
    checkpoint format (parquet default / Iceberg at deploy) is a config value.
    """
    from saber_spark.sources.registry import (DEFAULT_WRITE_FORMAT,
                                              read_table, write_table)
    fmt = fmt or DEFAULT_WRITE_FORMAT
    with_lineage = df.withColumn(LINEAGE_COL, F.spark_partition_id())
    t0 = time.monotonic()
    write_table(with_lineage, path, fmt, partition_by=partition_by)
    elapsed = time.monotonic() - t0

    spark = df.sparkSession
    written = read_table(spark, path, fmt)
    part_counts = {
        str(r[LINEAGE_COL]): r["cnt"]
        for r in written.groupBy(LINEAGE_COL).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    manifest = {
        "stage": stage,
        "complete": True,
        "rows": int(sum(part_counts.values())),
        "partitions": part_counts,
        "write_seconds": round(elapsed, 3),
        "metrics": extra_metrics or {},
        "config": config,
    }
    with open(_manifest_path(path), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return written.drop(LINEAGE_COL)


def read_stage(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    from saber_spark.sources.registry import DEFAULT_WRITE_FORMAT, read_table
    df = read_table(spark, path, fmt or DEFAULT_WRITE_FORMAT)
    return df.drop(LINEAGE_COL) if LINEAGE_COL in df.columns else df


def run_stage(spark: SparkSession, checkpoint_dir: str | None, stage: str,
              compute, resume: bool = True,
              config: dict | None = None) -> DataFrame:
    """Compute-or-load a stage.

    With no checkpoint_dir the stage stays lazy (pure DataFrame chaining);
    with one, the stage is materialized once and replayed from parquet on
    resume — killing the job after stage k and rerunning produces identical
    final output without redoing stages 1..k. ``config`` pins the stage to
    the parameters it was computed under: a rerun with a different config
    recomputes instead of serving the stale checkpoint (see is_complete).
    """
    if checkpoint_dir is None:
        return compute()
    path = os.path.join(checkpoint_dir, stage)
    if resume and is_complete(path, stage, config):
        return read_stage(spark, path)
    return write_stage(compute(), path, stage, config=config)


def read_manifest(checkpoint_dir: str, stage: str) -> dict:
    with open(_manifest_path(os.path.join(checkpoint_dir, stage))) as f:
        return json.load(f)


def lineage_report(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """All stage manifests of a checkpointed job as ONE queryable table:
    (stage, partition_id, rows, stage_rows, write_seconds, config_json).

    The audit surface the north_rule's per-partition lineage exists for:
    "which partition of which stage produced how many rows, under what
    config" answerable with a filter instead of opening JSON sidecars by
    hand. Driver-side cost is O(stages) file reads — manifests are tiny
    regardless of data scale.
    """
    recs = []
    for stage in sorted(os.listdir(checkpoint_dir)):
        mp = _manifest_path(os.path.join(checkpoint_dir, stage))
        if not os.path.exists(mp):
            continue
        with open(mp) as fh:
            m = json.load(fh)
        cfg = json.dumps(m.get("config"), sort_keys=True) \
            if m.get("config") is not None else None
        for part, rows in sorted(m.get("partitions", {}).items()):
            recs.append((m["stage"], int(part), int(rows),
                         int(m.get("rows", 0)),
                         float(m.get("write_seconds", 0.0)), cfg))
        if not m.get("partitions"):
            recs.append((m["stage"], None, None, int(m.get("rows", 0)),
                         float(m.get("write_seconds", 0.0)), cfg))
    return spark.createDataFrame(
        recs, "stage string, partition_id int, rows long, stage_rows long, "
              "write_seconds double, config_json string")
