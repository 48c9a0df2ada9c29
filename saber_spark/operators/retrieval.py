"""Keyword retrieval over the document corpus: Okapi BM25 top-k.

The retrieval sibling of operators/vocab.py's TF-IDF: where tfidf_topk
profiles each document's own salient terms, bm25_topk ranks DOCUMENTS
against a QUERY — the scoring function behind Lucene/Elasticsearch and
the lexical half of every modern RAG / training-data-curation stack
(e.g. retrieving contamination candidates or topic-targeted subsets
from a web corpus).

Formulation (Robertson/Lucene "plus one" idf, always positive):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d, q) = sum over t in q of
                  idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b*dl/avgdl))

with N and df counted over documents that tokenize to >= 1 token (the
event-space convention shared with tfidf_scores), dl = document token
count, avgdl its corpus mean.

Scale shape: tf is one partial+final hash agg on (doc_id, token); the
query-term join is a BROADCAST semi-join (a query has tens of terms),
so only matching postings survive before any wide operation; df for the
query terms aggregates that already-filtered slice; N and avgdl ride in
as broadcast 1-row aggregates (no driver action). The final top-k is
orderBy + limit — Spark's TakeOrderedAndProject, a per-partition heap +
driver merge of k rows, never a global sort shuffle. Integer counts
everywhere; the single float expression is rounded to 6dp, the same
cross-engine contract as tfidf/edge_pmi.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(tokens: DataFrame, query_terms: list[str], top_k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """(doc_id, .., token) + query terms -> top-k (doc_id, n_hits, score,
    rank), rank 1 = best; ties broken (rounded score DESC, doc_id ASC)
    so the result is deterministic and engine-portable.

    n_hits = number of distinct query terms the document contains
    (the coordination factor surfaced for downstream filters).
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    spark = tokens.sparkSession
    q = spark.createDataFrame([(t,) for t in sorted(set(query_terms))],
                              "token string")
    tf = (tokens.groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).alias("tf")))
    dl = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.avg("dl").alias("avgdl"))
    hits = tf.join(F.broadcast(q), "token")
    df = hits.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    denom = (F.col("tf")
             + F.lit(k1) * (F.lit(1.0 - b)
                            + F.lit(b) * F.col("dl") / F.col("avgdl")))
    term_score = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    scored = (hits
              .join(F.broadcast(df), "token")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(stats))
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_hits"),
                   F.round(F.sum(term_score), 6).alias("score")))
    top = (scored
           .orderBy(F.col("score").desc(), F.col("doc_id").asc())
           .limit(top_k))
    # re-ranking k rows: the window sorts only the top-k slice
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.select("doc_id", "n_hits", "score",
                      F.row_number().over(w).cast("long").alias("rank"))
