"""Tokenization / vocabulary / rare-token operators (DataFrame-native).

Reference basis:
  - tokenize: NERsuite regex (saber/utils/text_utils.py:10) — here as the
    built-in ``regexp_extract_all`` so Catalyst keeps the stage codegen'd
    (the pandas-UDF variant in operators/tagger.py is the byte-identity
    path; this one is the oracle-checkable relational form).
  - vocab build: type_to_idx (saber/preprocessor.py:101-137) — distinct +
    row_number (consecutive ids; reference reserves PAD=0/UNK=1, so data
    ids start at 2, saber/constants.py:19-29).
  - rare tokens: replace_rare_tokens count<=NUM_RARE=1
    (saber/preprocessor.py:229-257).

Scale notes: token explode multiplies rows ~200x; groupBy(token) is a
classic partial+final hash agg (map-side combine collapses each partition to
|vocab| rows before shuffling — the shuffle is tiny regardless of corpus
size). row_number over a global orderBy is a single-partition sort, safe
only because vocabularies are small post-aggregation; never apply it to raw
tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from saber_spark.kernels.text import INFIX_PATTERN

# reserved ids, parity with saber/constants.py:19-29
PAD_ID, UNK_ID = 0, 1
FIRST_DATA_ID = 2


def tokenize_docs(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """documents -> (doc_id, pos, token) via built-in regexp + posexplode."""
    return (
        docs.select(
            F.col(id_col),
            F.posexplode(
                F.regexp_extract_all(F.col(text_col), F.lit(INFIX_PATTERN), F.lit(0))
            ).alias("pos", "token"),
        )
    )


def token_freq(tokens: DataFrame) -> DataFrame:
    """(.., token) -> (token, freq); partial+final hash aggregation."""
    return tokens.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))


def rare_tokens(tokens: DataFrame, max_count: int = 1) -> DataFrame:
    """Tokens with corpus frequency <= max_count (reference NUM_RARE=1)."""
    return token_freq(tokens).filter(F.col("freq") <= max_count)


def tfidf_scores(tokens: DataFrame) -> DataFrame:
    """(doc_id, pos, token) -> (doc_id, token, tf, df, tfidf).

    tfidf = tf * ln(N / df) with raw counts (tf = in-doc term count,
    df = number of documents containing the term, N = number of documents
    with at least one token — docs whose text tokenizes to nothing are
    outside the event space, so they count toward neither df nor N) — the
    classic smoothing-free formulation so the oracle is exact (integers
    everywhere except one final ln, rounded to 6).

    Scale shape: tf is one partial+final hash agg on (doc_id, token); df
    derives from tf by a second agg on token (tf rows are already distinct
    doc-term pairs, so no countDistinct shuffle of raw tokens); N comes
    from a broadcast 1-row aggregate, not a driver action. The df join
    shuffles on token — no window, no global sort.
    """
    tf = (tokens.groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).alias("tf")))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = (tf.select("doc_id").distinct()
              .agg(F.count(F.lit(1)).alias("n_docs")))
    return (tf.join(df, "token")
            .crossJoin(F.broadcast(n_docs))
            .select(
                "doc_id", "token",
                F.col("tf").cast("long").alias("tf"),
                F.col("df").cast("long").alias("df"),
                F.round(F.col("tf").cast("double")
                        * F.log(F.col("n_docs").cast("double")
                                / F.col("df").cast("double")),
                        6).alias("tfidf")))


def tfidf_topk(tokens: DataFrame, k: int = 3) -> DataFrame:
    """Top-k terms per document by TF-IDF, ties broken by token ascending
    (deterministic). Output (doc_id, token, tf, tfidf, rank), rank 1..k.

    The ranked form is the user API; the oracle-checked query uses
    tfidf_scores instead because a score TIE between different (tf, df)
    combinations (e.g. 2*ln(N/50) == ln(N/5²·…)) would make rank depend on
    last-ulp libm differences across engines. The per-doc top-k window
    repartitions on doc_id — bounded partitions, never a global sort.
    """
    scored = tfidf_scores(tokens)
    w = (Window.partitionBy("doc_id")
         .orderBy(F.col("tfidf").desc(), F.col("token")))
    return (scored
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("doc_id", "token", "tf", "tfidf", "rank"))


def vocab_ids(tokens: DataFrame) -> DataFrame:
    """(token) -> (token, token_id), consecutive ids from FIRST_DATA_ID.

    Deterministic (orderBy token); the distinct collapses to |vocab| rows
    before the single-partition window, so the sort is bounded.
    """
    distinct = tokens.select("token").distinct()
    w = Window.orderBy("token")
    return distinct.select(
        "token",
        (F.row_number().over(w) + FIRST_DATA_ID - 1).alias("token_id"),
    )
