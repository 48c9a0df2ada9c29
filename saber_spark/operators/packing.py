"""Sequence packing: assign documents to fixed-token-budget training shards.

LLM pretraining consumes the corpus as a stream of fixed-size context
windows: documents are concatenated (within a shard) and cut every
``window`` tokens. The pipeline-side operator is the assignment table —
which bin each document lands in and at which token offset — so a
downstream tokenizer/writer can materialize shard files without any global
coordination.

Relational form (engine-portable, oracle-checkable): a running token count
per pack group via a window frame, bin = cumulative-before // window,
offset = cumulative-before % window. Docs longer than ``window`` simply
span bins, exactly like training-time packing.

Scale: ONE shuffle on the pack group column. The running sum is sequential
WITHIN a group, so the group column must have enough cardinality to spread
work — at 10^12 docs pack by (source, shard) where shard =
pmod(xxhash64(doc_id), K): training order is shuffled downstream anyway,
so the within-group order (doc_id here, for determinism) carries no
semantic weight, and K scales the parallelism. The testdata query packs by
``source`` (4 groups) purely because the oracle corpus is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(docs: DataFrame, window: int = 512,
                   group_col: str = "source", text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """-> (doc_id, <group_col>, n_tokens, bin_id, bin_offset).

    bin_id / bin_offset locate the document's first token in the packed
    stream of its group: tokens [cum_before, cum_before + n_tokens) cut
    into ``window``-sized bins. Token count is the whitespace count (the
    cheap budget estimate; swap in token_counts.n_re_tokens for the
    BPE-ish budget — the packing math is identical).
    """
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), " "))
    w = (Window.partitionBy(group_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    # bin split uses BIGINT `div`, not floor(double /): double rounding can
    # cross a bin boundary once cumulative counts get large
    return (
        docs.select(F.col(id_col), F.col(group_col),
                    n_tokens.cast("long").alias("n_tokens"))
        .withColumn("_cum_before", cum_before.cast("long"))
        .select(
            id_col, group_col, "n_tokens",
            F.expr(f"_cum_before div {int(window)}").alias("bin_id"),
            F.pmod(F.col("_cum_before"), F.lit(int(window))
                   ).cast("long").alias("bin_offset"),
        )
    )


def chunk_documents(tokens: DataFrame, window: int = 8, stride: int = 4,
                    id_col: str = "doc_id", pos_col: str = "pos",
                    token_col: str = "token") -> DataFrame:
    """(doc_id, pos, token) -> (doc_id, chunk_id, chunk_start, n_tokens,
    chunk_text): overlapping sliding-window chunks — window ``window``
    tokens, a new chunk every ``stride`` (stride < window = overlap).

    The RAG/embedding-index chunker (and the long-doc pretraining
    shard): sequence_packing fits WHOLE docs into token budgets; this
    splits LONG docs into overlapping windows so no span is cut at a
    hard boundary without also appearing intact in a neighbor chunk.
    chunk_id = k means the chunk covering positions
    [k*stride, k*stride + window); trailing chunks are shorter, and a
    doc emits chunks only for windows it reaches (a 5-token doc at
    window 8 emits exactly chunk 0).

    Scale shape: chunk membership is per-row integer arithmetic + one
    explode by the CONSTANT factor ceil(window/stride) (each token sits
    in at most that many chunks); reassembly is the scrub_dup_spans
    ordered collect keyed (doc, chunk) — one shuffle on a key finer
    than doc_id, so long docs spread across reducers instead of
    hot-spotting one.
    """
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError("chunk_documents: need 0 < stride <= window")
    p = F.col(pos_col).cast("long")
    # first chunk index covering pos: ceil((pos-window+1)/stride),
    # clamped at 0 — the piecewise form keeps the integer division on a
    # NON-NEGATIVE numerator, where Spark `div` and DuckDB `//` agree
    k_min = F.when(p - window + 1 <= 0, F.lit(0)).otherwise(
        F.expr(f"({pos_col} - {window} + {stride}) div {stride}"))
    k_max = F.expr(f"{pos_col} div {stride}")
    assigned = (tokens
                .select(F.col(id_col), p.alias("p"),
                        F.col(token_col).alias("tok"),
                        F.explode(F.sequence(k_min, k_max)).alias("k")))
    return (assigned
            .groupBy(id_col, F.col("k").alias("chunk_id"))
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.array_join(F.transform(
                     F.array_sort(F.collect_list(F.struct("p", "tok"))),
                     lambda s: s.tok), " ").alias("chunk_text"))
            .select(id_col, "chunk_id",
                    (F.col("chunk_id") * stride).alias("chunk_start"),
                    "n_tokens", "chunk_text"))


def rendezvous_shards(docs: DataFrame, n_shards: int,
                      compare_shards: int | None = None,
                      key_col: str = "doc_id") -> DataFrame:
    """Rendezvous (highest-random-weight) sharding (Thaler-Ravishankar
    1998) -> one row per key: (key, shard[, shard_resized, moved]).

    The stable output-bucketing layer of an INCREMENTAL corpus pipeline:
    shard = argmax over shards of hash(key, shard). Unlike
    ``pmod(hash(key), N)`` — which remaps ~(N-1)/N of all keys when N
    changes — rendezvous moves only ~1/(N+1) of keys when a shard is
    added, so a recrawl that grows the shard count invalidates only that
    slice of downstream per-shard artifacts (indexes, dedup state,
    tokenized shard files). With ``compare_shards`` the resized
    assignment and a ``moved`` flag are emitted alongside, making the
    churn directly auditable.

    The per-(key, shard) weight is the first 8 hex chars of
    md5(key || '#' || shard) as an integer — engine-portable (identical
    in DuckDB for the oracle; the anf_reach convention), uniform enough
    for balance, and NOT a Spark-internal hash, so assignments are
    reproducible outside the JVM. Ties (astronomically rare at 32 bits)
    break toward the lower shard id via the (weight, -shard) struct max.

    Scale shape: the argmax is a narrow per-row expression over
    ``n_shards`` literal legs — zero joins, zero shuffles, zero Python;
    cost is O(N_shards) per row map-side. For thousands of shards swap
    the literal legs for a posexploded shard dimension + one
    max_by(shard, weight) agg (one shuffle on the key) — same result,
    documented trade-off.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.col(key_col).cast("string")

    def weight(s: int):
        return F.conv(F.substring(
            F.md5(F.concat(key, F.lit("#"), F.lit(str(s)))), 1, 8),
            16, 10).cast("long")

    def argmax(n: int):
        best = F.greatest(*[F.struct(weight(s).alias("w"),
                                     F.lit(-s).alias("neg"))
                            for s in range(n)]) if n > 1 \
            else F.struct(weight(0).alias("w"), F.lit(0).alias("neg"))
        return (-best["neg"]).cast("long")

    out = docs.select(F.col(key_col),
                      argmax(n_shards).alias("shard"))
    if compare_shards is not None:
        if compare_shards < 1:
            raise ValueError("compare_shards must be >= 1, "
                             f"got {compare_shards}")
        out = (out
               .withColumn("shard_resized", argmax(compare_shards))
               .withColumn("moved",
                           F.col("shard") != F.col("shard_resized")))
    return out
