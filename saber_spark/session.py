"""SparkSession factory with scale-oriented defaults.

The same configuration is used by tests, bench.py, and the driver entry.
Parallelism is controlled by SPARK_GRAFT_CPUS (default: all local cores) so
the N -> 4N scaling-efficiency bench (BASELINE.md) can run the identical job
at two parallelism levels.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size mirrors the reference's prediction batch
# (PRED_BATCH_SIZE=256, /root/reference/saber/constants.py:60) scaled up for
# Arrow efficiency: the tagger UDF re-batches to 256 sentences internally.
ARROW_MAX_RECORDS = 10_000


def get_spark(app_name: str = "saber_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Create (or fetch) a SparkSession tuned for this engine.

    Scale posture: AQE on (runtime coalescing + skew-join splitting),
    adaptive broadcast, Arrow enabled for all pandas UDF stages. On a real
    cluster the same settings apply; only master/memory change via
    spark-submit conf.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(32, cpus)
    # Pin BLAS/OpenMP to one thread per Python worker: with K concurrent
    # pandas-UDF workers each spawning cpu_count() BLAS threads, K*cores
    # spinning threads drive kernel time to ~85% and make local[32] SLOWER
    # than local[8]. Python workers inherit the driver env in local mode.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "NUMEXPR_NUM_THREADS", "VECLIB_MAXIMUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
