"""Word-embedding connector: word2vec text format -> broadcast matrix.

Reference behavior (saber/embeddings.py:29-106, gensim-based):
  - load vectors from word2vec format (`V d` header, then `word v1 .. vd`);
  - prepare_embedding_index: word -> vector dict;
  - prepare_embedding_matrix: row i = vector of word id i, ZERO row for
    words without a vector (:97-106);
  - load_all=False keeps only corpus-vocabulary words (the broadcast-size
    optimization, :74-96); load_all=True regenerates the vocabulary from
    the embedding file instead;
  - debug mode caps at the first 10k vectors (:68).

Spark-first: the file parses as a DataFrame (so a 100 GB embedding file
semi-joins against the corpus vocab WITHOUT driver memory), and only the
filtered result is collected into the NumPy matrix that ships to executors
as a broadcast.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEBUG_VECTOR_CAP = 10_000  # parity: saber/embeddings.py:68


def load_word2vec_text(spark: SparkSession, path: str,
                       debug: bool = False) -> DataFrame:
    """word2vec text file -> (word string, vector array<float>).

    The `V d` header line is dropped by requiring >= 2 value tokens and a
    non-numeric first field... more robustly: any line whose remainder
    parses to d floats where d matches the header is kept.
    """
    raw = spark.read.text(path).select(F.col("value"))
    parsed = raw.select(
        F.split(F.trim(F.col("value")), r"\s+").alias("parts")
    ).filter(F.size("parts") > 2).select(
        F.element_at("parts", 1).alias("word"),
        F.slice(F.col("parts"), 2, F.size("parts") - 1)
        .cast("array<float>").alias("vector"),
    ).filter(F.col("vector").getItem(0).isNotNull())
    if debug:
        parsed = parsed.limit(DEBUG_VECTOR_CAP)
    return parsed


def filter_to_vocab(embeddings: DataFrame, vocab: DataFrame) -> DataFrame:
    """Semi-join the embedding table against the corpus vocabulary.

    Reference: Embeddings.load(load_all=False) keeps only corpus words
    (saber/embeddings.py:74-96) — this is what keeps the broadcast small.
    vocab: (token, token_id).
    """
    return embeddings.join(
        F.broadcast(vocab.select(F.col("token").alias("word"))), "word",
        "left_semi")


def build_embedding_matrix(embeddings: DataFrame, vocab: DataFrame,
                           dim: int | None = None) -> np.ndarray:
    """(V_total x d) float32 matrix: row token_id = vector, zero for OOV.

    Parity: saber/embeddings.py:97-106 (zero row for misses; ids 0/1 are
    PAD/UNK and stay zero). Collect happens AFTER the vocab semi-join, so
    driver memory is bounded by |corpus vocab|, not the embedding file.
    """
    joined = (vocab.join(embeddings.withColumnRenamed("word", "token"),
                         "token", "left")
              .select("token_id", "vector"))
    rows = joined.collect()
    if dim is None:
        dim = next((len(r["vector"]) for r in rows if r["vector"] is not None), 0)
    n = max((r["token_id"] for r in rows), default=-1) + 1
    matrix = np.zeros((n, dim), dtype=np.float32)
    for r in rows:
        if r["vector"] is not None and len(r["vector"]) == dim:
            matrix[r["token_id"]] = r["vector"]
    return matrix


def write_word2vec_text(vectors: DataFrame, path: str) -> None:
    """(word, vector) DataFrame -> word2vec text format (`V d` header,
    then `word v1 .. vd` lines) — the reference's embedding artifact
    (saber/embeddings.py:69 loads exactly this via gensim), so embeddings
    filtered/derived by this engine round-trip into the reference.

    Vector components render with repr-style minimal formatting matching
    load_word2vec_text's float parse (roundtrip-tested). Embedding files
    are vocabulary-bounded; the single-file write mirrors the format's
    one-file contract.

    Malformed input fails at WRITE time instead of producing a file the
    format cannot represent: words containing whitespace re-parse as a
    different word + shifted components, null components silently shrink
    a row (concat_ws drops nulls) making the header dim wrong, ragged
    dims break the header contract, and dim < 2 is unloadable by the
    header-skip heuristic (a data line needs >= 3 fields).
    """
    checked = vectors.select(
        "word", "vector",
        F.size("vector").alias("_dim"),
        (F.col("word").rlike(r"\s") | F.col("word").isNull()).alias("_badw"),
        F.exists("vector", lambda x: x.isNull()).alias("_nullv"),
    )
    bad = checked.filter(F.col("_badw") | F.col("_nullv")).limit(1).count()
    if bad:
        raise ValueError(
            "write_word2vec_text: words must be non-null without "
            "whitespace and vectors must have no null components")
    dims = [r["_dim"] for r in
            checked.select("_dim").distinct().limit(3).collect()]
    if len(dims) != 1:
        raise ValueError(
            f"write_word2vec_text: ragged vector dims {sorted(dims)}")
    dim = dims[0]
    if dim < 2:
        raise ValueError(
            "write_word2vec_text: dim must be >= 2 (the word2vec text "
            "header-skip heuristic cannot round-trip 1-d vectors)")
    rows = checked.select(
        "word",
        F.concat_ws(" ", F.transform(
            "vector", lambda x: x.cast("string"))).alias("vals"),
    ).orderBy("word").collect()
    if not rows:
        raise ValueError("write_word2vec_text: empty vectors DataFrame")
    with open(path, "w") as out:
        out.write(f"{len(rows)} {dim}\n")
        for r in rows:
            out.write(f"{r['word']} {r['vals']}\n")
