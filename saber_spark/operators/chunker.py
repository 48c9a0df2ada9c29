"""BIO chunk decode as a pure-SQL window formulation (gaps-and-islands).

Reference semantics (saber/preprocessor.py:195-227, kernel twin in
saber_spark.kernels.chunk): a chunk is a maximal run [B-X, I-X, I-X, ...];
runs that start with I- (orphans) are invalid and dropped.

Formulation over a (seq_id, pos, tag) table:
  brk  = 0 iff tag is I-X and the previous tag in the sequence is B-X or I-X
         of the SAME type, else 1          (lag window)
  grp  = running sum of brk                (range window)
  keep groups whose first tag starts with 'B'  (min_by pos -> first tag)

Each group is then one chunk: (seq_id, label, chunk_start, chunk_end).

This is the oracle-checkable twin of the in-UDF chunker; a property test
(tests/test_operators.py) cross-checks it against kernels.chunk_entities on
the same sequences.

Scale: two stacked windows over the same (seq_id, pos) ordering -> ONE
shuffle on seq_id, both windows and the final groupBy reuse the partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_bio_sql(tags: DataFrame, seq_col: str = "seq_id",
                  pos_col: str = "pos", tag_col: str = "tag") -> DataFrame:
    """(seq_id, pos, tag) -> (seq_id, label, chunk_start, chunk_end)."""
    w = Window.partitionBy(seq_col).orderBy(pos_col)
    t = F.col(tag_col)
    tag_type = F.substring_index(t, "-", -1)
    prev_tag = F.lag(t).over(w)
    prev_type = F.lag(tag_type).over(w)

    extends = (
        t.startswith("I")
        & prev_tag.isNotNull()
        & (prev_type == tag_type)
        & (prev_tag.startswith("B") | prev_tag.startswith("I"))
    )
    with_grp = (
        tags.withColumn("_brk", F.when(extends, F.lit(0)).otherwise(F.lit(1)))
        .withColumn("_grp", F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        with_grp.groupBy(seq_col, "_grp")
        .agg(
            F.min_by(t, F.col(pos_col)).alias("_first_tag"),
            F.substring_index(F.min_by(t, F.col(pos_col)), "-", -1).alias("label"),
            F.min(pos_col).alias("chunk_start"),
            (F.max(pos_col) + 1).alias("chunk_end"),
        )
        .filter(F.col("_first_tag").startswith("B"))
        .select(seq_col, "label", "chunk_start", "chunk_end")
    )
