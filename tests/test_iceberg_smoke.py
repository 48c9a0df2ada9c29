"""Iceberg-catalog smoke path for the write/merge seam (jar-gated).

The engine's sinks go through ``saber_spark.sources.registry`` whose
``iceberg`` branches (DataFrameWriterV2 createOrReplace/append, MERGE INTO,
saber.applied_epoch table property) cannot execute in this sandbox — the
iceberg-spark-runtime jar is not installed and pip installs are out of
scope. This module is the deploy-time CI step: it SKIPS cleanly when the
jar is absent and, when present (drop ``iceberg-spark-runtime-*.jar`` into
``$SPARK_HOME/jars`` or pass ``spark.jars.packages``), exercises:

  - write_table(fmt='iceberg') createOrReplace + append round-trip
  - merge_upsert MERGE INTO: matched rows sum/min, unmatched insert
  - epoch replay: a re-applied epoch is a no-op (saber.applied_epoch)

Iceberg catalogs register lazily via runtime conf, so the shared session
fixture is reused — only the catalog/warehouse confs are set here.
"""

from __future__ import annotations

import glob
import os

import pytest

import pyspark

_JAR_DIRS = [os.path.join(os.path.dirname(pyspark.__file__), "jars")]
if os.environ.get("SPARK_HOME"):
    _JAR_DIRS.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
_JARS = [j for d in _JAR_DIRS
         for j in glob.glob(os.path.join(d, "iceberg-spark-runtime*.jar"))]
_EXTRA = os.environ.get("ICEBERG_JAR")
HAVE_ICEBERG = bool(_JARS or (_EXTRA and os.path.exists(_EXTRA)))

pytestmark = pytest.mark.skipif(
    not HAVE_ICEBERG,
    reason="iceberg-spark-runtime jar not installed (sandbox); this is the "
           "deploy-time CI step — see module docstring")


@pytest.fixture(scope="module")
def iceberg_spark(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    spark.conf.set("spark.sql.catalog.local",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.local.type", "hadoop")
    spark.conf.set("spark.sql.catalog.local.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS local.db")
    return spark


def test_write_table_roundtrip(iceberg_spark):
    from saber_spark.sources.registry import write_table
    spark = iceberg_spark
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, grp string")
    write_table(df, "local.db.t_rt", fmt="iceberg")
    assert spark.table("local.db.t_rt").count() == 2
    write_table(df, "local.db.t_rt", fmt="iceberg", mode="append")
    assert spark.table("local.db.t_rt").count() == 4


def test_merge_upsert_and_epoch_replay(iceberg_spark):
    from saber_spark.sources.registry import merge_upsert, write_table
    spark = iceberg_spark
    schema = "subj string, pred string, obj string, n long, first string"
    base = spark.createDataFrame([("a", "p", "b", 2, "u9")], schema)
    write_table(base, "local.db.edges", fmt="iceberg")
    upd = spark.createDataFrame(
        [("a", "p", "b", 3, "u1"), ("x", "p", "y", 1, "u2")], schema)
    kw = dict(keys=["subj", "pred", "obj"], sum_cols=["n"],
              min_cols=["first"], fmt="iceberg")
    merge_upsert("local.db.edges", upd, epoch_id=1, **kw)
    got = {(r["subj"], r["obj"]): (r["n"], r["first"])
           for r in spark.table("local.db.edges").collect()}
    assert got == {("a", "b"): (5, "u1"), ("x", "y"): (1, "u2")}
    # replayed epoch: guarded by the saber.applied_epoch table property
    merge_upsert("local.db.edges", upd, epoch_id=1, **kw)
    assert {r["n"] for r in spark.table("local.db.edges").collect()} == {5, 1}
