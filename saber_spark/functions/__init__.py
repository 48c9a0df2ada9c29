"""SQL-callable function surface: register the kernels as Spark SQL UDFs.

The reference exposes its text kernels only as Python internals; the rebuild
publishes them to Spark SQL so any query (spark.sql or a BI tool on the
thrift server) can call them:

    SELECT saber_sterilize(text), saber_tokenize(text) FROM pages

Row-at-a-time UDFs are the SLOW path (SURVEY §4) — these registrations exist
for interactive/ad-hoc use; the pipeline itself uses built-in expressions
and Arrow pandas UDFs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from saber_spark.kernels.chunk import chunk_entities
from saber_spark.kernels.text import extract_html_text, sterilize, tokenize

CHUNK_SCHEMA = ArrayType(StructType([
    StructField("label", StringType()),
    StructField("chunk_start", IntegerType()),
    StructField("chunk_end", IntegerType()),
]))


def register_all(spark: SparkSession) -> list[str]:
    """Register every kernel as a SQL function; returns the names."""
    spark.udf.register("saber_sterilize", sterilize, StringType())
    spark.udf.register("saber_tokenize", tokenize, ArrayType(StringType()))
    spark.udf.register("saber_extract_html", extract_html_text, StringType())
    spark.udf.register(
        "saber_chunk_entities",
        lambda tags: [(lab, int(i), int(j))
                      for lab, i, j in chunk_entities(list(tags or []))],
        CHUNK_SCHEMA)
    return ["saber_sterilize", "saber_tokenize", "saber_extract_html",
            "saber_chunk_entities"]
