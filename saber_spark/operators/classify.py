"""Embedding-based nearest-centroid classification — closed-form
distributed training.

The production corpus-quality-classifier shape (CCNet / GPT-3 appendix A:
score every document with a lightweight classifier over features or
embeddings) with the simplest trainable model that needs NO gradient
loop: per-class centroids, fit as ONE hash aggregation over the training
split, predicted by cosine against the broadcast centroid table. The
reference's neural classifier slot stays in operators/tagger.py; this is
the vector-side classifier an embedding column makes possible.

Engine portability follows the similarity-module convention: components
quantize to integers (round(x * QUANT)), the centroid is carried as the
EXACT integer per-dimension sum (cosine is scale-invariant, so the mean's
float division is never needed), dots and norms are exact integers below
2^53, and the final score double (int / sqrt(int)) is IEEE
correctly-rounded — bitwise identical on any engine. Ties break by label
ascending.

Scale shape: fit = one partial+final hash agg on (label, dim); predict =
posexplode + a broadcast join on dim against the (labels x dims)-row
centroid table + one (vec, label) agg + a per-vec argmax window. The
embedding table shuffles once on vec_id for the dot aggregation; nothing
is ever collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from saber_spark.operators.similarity import QUANT
from saber_spark.operators.splits import fold_assign


def _quantized_dims(embeddings: DataFrame, id_col: str, vec_col: str,
                    *extra_cols: str) -> DataFrame:
    q = F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") * QUANT).cast("long"))
    return embeddings.select(
        F.col(id_col), *[F.col(c) for c in extra_cols],
        F.posexplode(q).alias("dim", "qv"))


def centroid_fit(embeddings: DataFrame, label_col: str = "label",
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """-> (label, dim, csum): exact integer sufficient statistics of the
    per-class centroid (component sums of the quantized vectors). The
    count is deliberately absent — cosine scoring only needs the
    DIRECTION, and keeping sums integer keeps the whole model
    engine-portable."""
    return (_quantized_dims(embeddings, id_col, vec_col, label_col)
            .groupBy(label_col, "dim")
            .agg(F.sum("qv").alias("csum")))


def centroid_predict(embeddings: DataFrame, centroids: DataFrame,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     label_col: str = "label") -> DataFrame:
    """-> (vec_id, pred_label, score): argmax-cosine class per vector
    (score = dot(x, csum)/|csum| — |x| is constant per vector and cannot
    change the argmax, so it is not computed). Deterministic: exact
    integer dot, correctly-rounded sqrt/div, ties by label ascending."""
    cent = centroids.withColumnRenamed(label_col, "_c_label")
    dims = _quantized_dims(embeddings, id_col, vec_col)
    dots = (dims.join(F.broadcast(cent), "dim")
            .groupBy(id_col, "_c_label")
            .agg(F.sum(F.col("qv") * F.col("csum")).alias("dot")))
    cnorm = (cent.groupBy("_c_label")
             .agg(F.sum(F.col("csum") * F.col("csum")).alias("cnorm2")))
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(),
                                           F.col("_c_label").asc())
    return (dots.join(F.broadcast(cnorm), "_c_label")
            .withColumn("score",
                        F.col("dot") / F.sqrt(F.col("cnorm2").cast("double")))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(id_col, F.col("_c_label").alias("pred_label"), "score"))


def centroid_confusion(embeddings: DataFrame, folds: int = 5,
                       label_col: str = "label", id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Held-out evaluation: fit on hash-folds != 0, predict fold 0,
    -> (true_label, pred_label, n_vecs) confusion counts. The fold
    assignment is the engine-portable Knuth hash (splits.fold_assign
    formula), so train/test membership is reproducible anywhere."""
    with_fold = fold_assign(embeddings, id_col, folds, "_fold")
    cents = centroid_fit(with_fold.filter("_fold != 0"),
                         label_col, id_col, vec_col)
    test = with_fold.filter("_fold = 0")
    preds = centroid_predict(test, cents, id_col, vec_col, label_col)
    return (preds.join(test.select(id_col,
                                   F.col(label_col).alias("true_label")),
                       id_col)
            .groupBy("true_label", "pred_label")
            .agg(F.count(F.lit(1)).alias("n_vecs")))


def entity_centroids(linked: DataFrame, embeddings: DataFrame,
                     ent_col: str = "canonical_id",
                     doc_col: str = "doc_id", id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Linked mentions + document embeddings -> (canonical_id, dim,
    csum, n_docs): exact integer sufficient statistics of each
    entity's CONTEXT centroid — the component sums of the quantized
    embeddings of the documents that mention it (distinct doc per
    entity, so a 50-mention doc votes once).

    The KG<->embedding bridge artifact: entity context centroids are
    what SemDeDup-style semantic entity merging, embedding-based alias
    suggestion, and type-induction clustering all consume. Integer
    quantized sums (the centroid_fit convention) keep the table
    engine-portable and mergeable — a second corpus shard's sums just
    add.

    Scale shape: distinct (entity, doc) collapses mention multiplicity
    FIRST (one hash agg keyed like the linked table), then one
    equi-join against the embeddings table on the doc key and one
    partial+final agg on (entity, dim) — hub entities fan out over
    docs, absorbed by the map-side combine on the |E| x dims keyspace.
    """
    ent_docs = (linked.select(F.col(ent_col).alias("entity"),
                              F.col(doc_col).alias("d"))
                .distinct())
    dims = _quantized_dims(
        embeddings.select(F.col(id_col).alias("d"), vec_col),
        "d", vec_col)
    return (ent_docs.join(dims, "d")
            .groupBy("entity", "dim")
            .agg(F.sum("qv").alias("csum"),
                 F.count_distinct("d").alias("n_docs"))
            .select(F.col("entity").alias(ent_col), "dim", "csum",
                    "n_docs"))
