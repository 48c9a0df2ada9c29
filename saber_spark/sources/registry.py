"""Generic table connector: one entry point over Spark's native sources.

The reference reads only CoNLL TSV / word2vec / HDF5 (SURVEY.md §2.1 note);
this engine inherits parquet/csv/json/orc/text from Spark and exposes them
uniformly so every pipeline input (pages, dictionaries, corpora) can come
from any format. Iceberg: at deploy time the same call becomes
``spark.read.format('iceberg').load(table)`` — the runtime jar is not in
this sandbox, so parquet stands in with identical DataFrame semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {"parquet", "csv", "json", "orc", "text"}


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: str | None = None, **options) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"Unsupported format {fmt!r}; one of {sorted(_FORMATS)}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
