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
from pyspark.sql import types as T


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


def rrf_fuse(rankings: dict[str, DataFrame], rrf_k: int = 60,
             top_k: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of named rank lists
    -> top-k (doc_id, n_rankers, rrf, rank).

        rrf(d) = sum over rankers r listing d of 1 / (rrf_k + rank_r(d))

    THE standard hybrid-retrieval combiner (lexical BM25 + dense cosine
    in every production RAG stack): rank-based, so the rankers' scores
    need no calibration against each other; rrf_k=60 is the published
    constant. Documents missing from a ranker's list contribute nothing
    for that ranker (the truncated-list semantics of the paper).
    n_rankers = how many lists the doc appeared in (coordination
    evidence, the bm25 n_hits convention).

    Ties broken (rounded rrf DESC, doc_id ASC) — deterministic and
    engine-portable. rrf is rounded to 6dp AFTER summing exact
    1/(k+rank) rationals in DOUBLE; rank inputs are integers, so both
    engines compute bit-identical doubles.

    Scale shape: each input list is already top-k-truncated (tens to
    thousands of rows), so the union + groupBy runs on ranker-bounded
    data no matter the corpus size; the final top-k is the bm25
    TakeOrderedAndProject shape (per-partition heap, k-row driver
    merge), never a global sort.
    """
    if not rankings:
        raise ValueError("rrf_fuse: rankings must be non-empty")
    parts = [
        df.select(F.col(id_col),
                  (F.lit(1.0) / (F.lit(rrf_k) + F.col("rank"))).alias("rr"))
        for _, df in sorted(rankings.items())
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    fused = (allr.groupBy(id_col)
             .agg(F.count(F.lit(1)).cast("long").alias("n_rankers"),
                  F.round(F.sum("rr"), 6).alias("rrf")))
    top = (fused.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
           .limit(top_k))
    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return top.select(id_col, "n_rankers", "rrf",
                      F.row_number().over(w).cast("long").alias("rank"))


def ndcg_eval(docs: DataFrame, query_pairs: list[tuple[str, str]],
              k: int = 10, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Ranking-quality evaluation: nDCG@k per query (Järvelin & Kekäläinen
    2002) — the eval half of the retrieval stack next to bm25_topk /
    rrf_fuse (MRR/AUC live in the link-prediction ops; nDCG is the graded
    judgment metric those can't express).

    Each query is (term, rel_term): the SYSTEM ranks candidate documents
    (those containing ``term``) by that term's frequency (tf DESC, doc_id
    ASC — a deliberately simple ranker so the metric itself is the thing
    under test), while graded RELEVANCE is derived independently as
    min(tf(rel_term), 3) — a deterministic editorial stand-in with grades
    0..3. DCG@k uses the (2^rel - 1)/log2(rank+1) gain; IDCG@k re-ranks
    the same candidate set by rel DESC. nDCG = DCG/IDCG (0 when IDCG=0).

    Scale shape: ONE scan — queries ride in as an exploded broadcast
    literal (|Q| rows per doc, narrow), tf/rel are higher-order filters on
    the split token array inside codegen, and the two rankings are windows
    partitioned by query term (the only exchange; |Q| partitions, each
    holding just that query's candidate postings). Output is |Q| rows.
    """
    qarr = F.array(*[
        F.struct(F.lit(t).alias("term"), F.lit(r).alias("rel_term"))
        for t, r in query_pairs])
    toks = F.split(F.trim(F.col(text_col)), r"\s+")

    def tf_of(term_col):
        return F.size(F.filter(toks, lambda x: x == term_col))

    scored = (docs
              .select(F.col(id_col).alias("doc_id"),
                      F.explode(qarr).alias("qp"),
                      toks.alias("_toks"))
              .select("doc_id",
                      F.col("qp.term").alias("term"),
                      F.size(F.filter(
                          F.col("_toks"),
                          lambda x: x == F.col("qp.term"))).alias("tf"),
                      F.least(
                          F.size(F.filter(
                              F.col("_toks"),
                              lambda x: x == F.col("qp.rel_term"))),
                          F.lit(3)).cast("long").alias("rel"))
              .filter(F.col("tf") > 0))
    w_sys = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc())
    w_ideal = Window.partitionBy("term").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc())
    gains = (scored
             .withColumn("sys_rank", F.row_number().over(w_sys))
             .withColumn("ideal_rank", F.row_number().over(w_ideal)))

    def gain(rank_col):
        return (F.pow(F.lit(2.0), F.col("rel").cast("double")) - 1.0) / \
            F.log2(rank_col.cast("double") + 1.0)

    agg = (gains.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.when(F.col("sys_rank") <= k, gain(F.col("sys_rank")))
              .otherwise(F.lit(0.0))).alias("dcg_raw"),
        F.sum(F.when(F.col("ideal_rank") <= k, gain(F.col("ideal_rank")))
              .otherwise(F.lit(0.0))).alias("idcg_raw")))
    return agg.select(
        F.col("term").alias("query_term"),
        "n_candidates",
        F.round("dcg_raw", 6).alias("dcg"),
        F.round("idcg_raw", 6).alias("idcg"),
        F.round(F.when(F.col("idcg_raw") > 0,
                       F.col("dcg_raw") / F.col("idcg_raw"))
                .otherwise(F.lit(0.0)), 6).alias("ndcg"))


def inverted_index(tokens: DataFrame, id_col: str = "doc_id",
                   pos_col: str = "pos", token_col: str = "token"
                   ) -> DataFrame:
    """Positional inverted-index construction — the index-build half of
    the retrieval stack (bm25_topk/ndcg_eval consume rankings; this is
    the Lucene-segment-shaped posting table they'd be served from at
    scale): one row per (token, doc) posting carrying the document's
    sorted occurrence positions and the token's document frequency.

    Scale shape: ONE (token, doc) hash agg builds the postings
    (map-side combine collapses within-partition repeats; positions
    collect inside the agg and sort with array_sort — never a window),
    then the doc-frequency side is a second agg of the ALREADY-reduced
    posting table joined back on the token key. Postings for one token
    land co-partitioned — exactly the layout a phrase/intersection
    query wants to consume.

    -> (token, doc_id, doc_freq, n_occ, positions array<long> sorted).
    """
    postings = (tokens.groupBy(F.col(token_col).alias("token"),
                               F.col(id_col).alias("doc_id"))
                .agg(F.count(F.lit(1)).alias("n_occ"),
                     F.array_sort(F.collect_list(
                         F.col(pos_col).cast("long"))).alias("positions")))
    df_tbl = postings.groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq"))
    return (postings.join(df_tbl, "token")
            .select("token", "doc_id", "doc_freq", "n_occ", "positions"))


def phrase_search(tokens: DataFrame, phrase: list[str],
                  id_col: str = "doc_id", pos_col: str = "pos",
                  token_col: str = "token") -> DataFrame:
    """Exact positional phrase search (the classic posting-list
    intersection): find every document position where the terms of
    ``phrase`` occur consecutively. Each term's postings are ONE
    filtered, pushed-down scan projected to (doc, pos - i) — aligning
    all terms of one phrase occurrence to the same anchor — and the
    conjunction is a chain of equi-joins on (doc, anchor), the BGP
    shape applied to positions. Aggregated per document.

    -> (doc_id, n_matches, match_positions array<long> sorted anchors).
    """
    if not phrase:
        raise ValueError("phrase_search needs at least one term")
    acc = None
    for i, term in enumerate(phrase):
        leg = (tokens.filter(F.col(token_col) == term)
               .select(F.col(id_col).alias("doc_id"),
                       (F.col(pos_col).cast("long") - i).alias("anchor")))
        acc = leg if acc is None else acc.join(leg, ["doc_id", "anchor"])
    return (acc.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_matches"),
                 F.array_sort(F.collect_list("anchor"))
                 .alias("match_positions")))


def kwic_snippets(docs: DataFrame, term: str, window: int = 3,
                  max_per_doc: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Keyword-in-context concordance (the KWIC index, Luhn 1960 — the
    result-snippet surface a retrieval stack serves next to bm25/phrase
    ranks): for each occurrence of ``term`` in a document, the
    ±``window``-token context around it, capped at ``max_per_doc``
    occurrences (earliest first).

    Entirely NARROW: hit positions come from an index-aware transform
    over the token array inside the row, the per-doc cap is an array
    slice (order-preserving, so "earliest first" is by construction,
    no window function), and the snippet is an array slice around each
    exploded hit — the token array never leaves its row, so the
    operator costs one scan, zero shuffles, zero Python at any corpus
    size. (Contrast phrase_search, which pays posting joins because it
    must CONJOIN terms; a single-term concordance never needs to.)

    -> (doc_id, pos, snippet): pos = 0-based token index of the hit,
    snippet = space-joined context tokens.
    """
    from saber_spark.kernels.text import INFIX_PATTERN
    arr = F.regexp_extract_all(F.col(text_col), F.lit(INFIX_PATTERN),
                               F.lit(0))
    d = (docs.select(F.col(id_col).alias("doc_id"), arr.alias("arr"))
         .filter(F.size("arr") > 0))
    positions = F.filter(
        F.transform(F.col("arr"),
                    lambda x, i: F.when(x == F.lit(term), i)
                    .otherwise(F.lit(-1))),
        lambda p: p >= 0)
    hits = (d.select("doc_id", "arr",
                     F.explode(F.slice(positions, 1, max_per_doc))
                     .alias("pos")))
    start0 = F.greatest(F.col("pos") - window, F.lit(0))
    end_excl = F.least(F.col("pos") + window + 1, F.size("arr"))
    return hits.select(
        "doc_id", F.col("pos").cast("long").alias("pos"),
        F.array_join(F.slice(F.col("arr"), start0 + 1, end_excl - start0),
                     " ").alias("snippet"))


def rbo_overlap(ranking_a: DataFrame, ranking_b: DataFrame,
                key_cols: list[str], depth: int = 10,
                p: float = 0.9, rank_col: str = "rank") -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) between
    two rankings, truncated at ``depth`` — the top-weighted,
    conjointness-free answer to "did the ranking change?" that a
    pipeline asks when a scorer/index/filter is swapped (Kendall tau
    needs both lists to rank the same universe; RBO handles truncated,
    partially-disjoint lists, which is what retrieval and host-priority
    lists are).

        RBO@D = (1 - p) * sum_{d=1..D} p^(d-1) * X_d / d

    where X_d = |A[:d] ∩ B[:d]| and p is the persistence (top-weight)
    parameter; the paper's prefix evaluation with the extrapolation
    term dropped (reported separately as agreement@D = X_D / D).

    An item shared by both lists enters every prefix intersection at
    entry_depth = max(rank_a, rank_b); X_d = #{shared: entry <= d} —
    so the whole computation runs on the joined shared-item table
    (<= D rows) crossed with D depth rows: constant-bounded regardless
    of corpus size. The only corpus-scale work is whatever produced
    the rankings. Exact integer X_d; pow/division in DOUBLE -> 6dp
    round is engine-portable.

    -> ONE row (depth, p, x_depth, agreement 6dp, rbo 6dp).
    """
    spark = ranking_a.sparkSession
    ra = ranking_a.select(*key_cols, F.col(rank_col).alias("ra")) \
        .filter(F.col("ra") <= depth)
    rb = ranking_b.select(*key_cols, F.col(rank_col).alias("rb")) \
        .filter(F.col("rb") <= depth)
    shared = ra.join(rb, key_cols).select(
        F.greatest("ra", "rb").alias("entry"))
    depths = spark.range(1, depth + 1).select(F.col("id").alias("d"))
    xd = (depths.join(F.broadcast(shared), F.col("entry") <= F.col("d"),
                      "left")
          .groupBy("d")
          .agg(F.count("entry").alias("x_d")))
    term = (F.pow(F.lit(p), F.col("d") - 1) * F.col("x_d") / F.col("d"))
    return xd.agg(
        F.lit(depth).cast("long").alias("depth"),
        F.lit(p).alias("p"),
        F.max(F.when(F.col("d") == depth, F.col("x_d")))
        .cast("long").alias("x_depth"),
        F.round(F.max(F.when(F.col("d") == depth, F.col("x_d"))) / depth,
                6).alias("agreement"),
        F.round((1 - p) * F.sum(term), 6).alias("rbo"))


def map_eval(docs: DataFrame, query_pairs: list[tuple[str, str]],
             k: int = 10, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Mean-average-precision / precision@k evaluation per query
    (Buckley & Voorhees SIGIR 2000 conventions; the TREC binary twin
    of ndcg_eval's graded judgment): same deliberately-simple system
    ranking as ndcg_eval (tf of the query term DESC, doc_id ASC over
    candidate docs containing the term) with BINARY relevance
    rel = [tf(rel_term) > 0], so the metric — not the ranker — is the
    thing under test.

        AP@k  = sum_{i<=k, rel_i=1} P@i / min(R, k)
        P@k   = (# relevant in top k) / k

    with R = total relevant candidates (AP@k = 0 when R = 0, the
    trec_eval convention). Ranks/counts are exact integers; the final
    divisions are the only floating steps -> 6dp round.

    Scale shape: ndcg_eval's contract — ONE scan with the query list
    exploded as a broadcast literal, tf via higher-order filters in
    codegen, ONE window exchange partitioned by query term, |Q|-row
    output. The cumulative-relevant count rides the SAME sys-rank
    window (running sum), adding zero exchanges.

    -> |Q| rows (query_term, n_candidates, n_relevant, p_at_k 6dp,
    ap 6dp).
    """
    qarr = F.array(*[
        F.struct(F.lit(t).alias("term"), F.lit(r).alias("rel_term"))
        for t, r in query_pairs])
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    scored = (docs
              .select(F.col(id_col).alias("doc_id"),
                      F.explode(qarr).alias("qp"),
                      toks.alias("_toks"))
              .select("doc_id",
                      F.col("qp.term").alias("term"),
                      F.size(F.filter(
                          F.col("_toks"),
                          lambda x: x == F.col("qp.term"))).alias("tf"),
                      (F.size(F.filter(
                          F.col("_toks"),
                          lambda x: x == F.col("qp.rel_term"))) > 0)
                      .cast("long").alias("rel"))
              .filter(F.col("tf") > 0))
    w_sys = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc())
    ranked = (scored
              .withColumn("sys_rank", F.row_number().over(w_sys))
              .withColumn("cum_rel", F.sum("rel").over(
                  w_sys.rowsBetween(Window.unboundedPreceding, 0))))
    agg = (ranked.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum("rel").alias("n_relevant"),
        F.sum(F.when((F.col("sys_rank") <= k) & (F.col("rel") == 1),
                     F.col("cum_rel") / F.col("sys_rank"))
              .otherwise(F.lit(0.0))).alias("ap_num"),
        F.sum(F.when(F.col("sys_rank") <= k, F.col("rel"))
              .otherwise(F.lit(0))).alias("rel_at_k")))
    return agg.select(
        F.col("term").alias("query_term"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
        F.col("n_relevant").cast("long").alias("n_relevant"),
        F.round(F.col("rel_at_k") / k, 6).alias("p_at_k"),
        F.round(F.when(F.col("n_relevant") > 0,
                       F.col("ap_num")
                       / F.least(F.col("n_relevant"), F.lit(k)))
                .otherwise(F.lit(0.0)), 6).alias("ap"))


def qld_topk(tokens: DataFrame, query_terms: list[str], top_k: int = 10,
             mu: float = 2000.0) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Ponte &
    Croft SIGIR 1998; Zhai & Lafferty SIGIR 2001) — the language-
    modeling scorer that sits beside bm25_topk in every IR textbook
    and behind Indri/Galago:

        score(d, q) = sum over t in q of
                      ln( (tf_td + mu * p(t|C)) / (dl_d + mu) )

    with p(t|C) the corpus unigram MLE and mu the Dirichlet prior
    mass (2000 is the standard default). Unlike BM25 every query term
    contributes for every candidate (smoothing gives unseen terms
    nonzero mass) — candidates are docs matching >= 1 term, scored on
    ALL query terms via the smoothed formula.

    Ties broken (rounded score DESC, doc_id ASC). Exact integer
    tf/dl/cf under the log -> 6dp round is engine-portable.

    Scale shape: bm25_topk's contract — tf is one (doc, token) hash
    agg; the query join is a broadcast semi-join; corpus stats are a
    broadcast |q|-row table; candidates' missing-term rows are
    manufactured by a broadcast crossJoin with the query list (|cand|
    x |q| rows, bounded); final top-k is TakeOrderedAndProject.

    -> top-k (doc_id, n_hits, score 6dp, rank).
    """
    if not query_terms:
        raise ValueError("qld_topk: query_terms must be non-empty")
    spark = tokens.sparkSession
    q = spark.createDataFrame([(t,) for t in sorted(set(query_terms))],
                              "qt string")
    tf = (tokens.groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).alias("tf")))
    dl = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus_n = tokens.agg(F.count(F.lit(1)).alias("cn"))
    cf = (tokens.join(F.broadcast(q), tokens.token == F.col("qt"))
          .groupBy("qt").agg(F.count(F.lit(1)).alias("cf")))
    # OOV guard: a query term with cf = 0 would make EVERY candidate's
    # term ln(0) — the standard practice (Indri) drops corpus-unseen
    # terms from the query
    qstats = (q.join(cf, "qt", "left")
              .select("qt", F.coalesce("cf", F.lit(0)).alias("cf"))
              .filter(F.col("cf") > 0)
              .crossJoin(F.broadcast(corpus_n)))
    cands = (tf.join(F.broadcast(q), tf.token == F.col("qt"))
             .select("doc_id").distinct())
    grid = (cands.join(dl, "doc_id")
            .crossJoin(F.broadcast(qstats)))
    tfq = (tf.join(F.broadcast(q), tf.token == F.col("qt"))
           .select("doc_id", "qt", "tf"))
    scored_terms = (grid.join(tfq, ["doc_id", "qt"], "left")
                    .select("doc_id", "dl", "qt",
                            F.coalesce("tf", F.lit(0)).alias("tf"),
                            "cf", "cn"))
    term = F.log((F.col("tf") + F.lit(mu) * F.col("cf") / F.col("cn"))
                 / (F.col("dl") + F.lit(mu)))
    scored = (scored_terms.groupBy("doc_id")
              .agg(F.sum((F.col("tf") > 0).cast("long")).alias("n_hits"),
                   F.round(F.sum(term), 6).alias("score")))
    top = (scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
           .limit(top_k))
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.select("doc_id", "n_hits", "score",
                      F.row_number().over(w).cast("long").alias("rank"))


def err_eval(docs: DataFrame, query_pairs: list[tuple[str, str]],
             k: int = 10, id_col: str = "doc_id",
             text_col: str = "text", max_grade: int = 3) -> DataFrame:
    """Expected Reciprocal Rank (Chapelle et al. CIKM 2009) — the
    cascade-model ranking metric that, unlike nDCG's position
    discount, models a user who STOPS at the first satisfying
    result:

        ERR@k = sum_{r<=k} (1/r) * R_r * prod_{i<r} (1 - R_i),
        R = (2^rel - 1) / 2^max_grade

    Same harness as ndcg_eval/map_eval: system ranks candidates by
    query-term tf (DESC, doc_id ASC), graded relevance = min(tf of
    the paired rel_term, max_grade). The stopping product rides the
    SAME ranking window as a cumulative sum of ln(1 - R) (exact-zero
    guard for R = 1 handled by a cumulative dead flag, the
    kaplan_meier device).

    -> |Q| rows (query_term, n_candidates, err 6dp).
    """
    qarr = F.array(*[
        F.struct(F.lit(t).alias("term"), F.lit(r).alias("rel_term"))
        for t, r in query_pairs])
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    scored = (docs
              .select(F.col(id_col).alias("doc_id"),
                      F.explode(qarr).alias("qp"),
                      toks.alias("_toks"))
              .select("doc_id",
                      F.col("qp.term").alias("term"),
                      F.size(F.filter(
                          F.col("_toks"),
                          lambda x: x == F.col("qp.term"))).alias("tf"),
                      F.least(
                          F.size(F.filter(
                              F.col("_toks"),
                              lambda x: x == F.col("qp.rel_term"))),
                          F.lit(max_grade)).cast("long").alias("rel"))
              .filter(F.col("tf") > 0))
    r_prob = (F.pow(F.lit(2.0), F.col("rel").cast("double")) - 1) \
        / F.lit(float(2 ** max_grade))
    w_sys = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc())
    w_prev = w_sys.rowsBetween(Window.unboundedPreceding, -1)
    ranked = (scored
              .withColumn("rr", r_prob)
              .withColumn("rank", F.row_number().over(w_sys))
              .withColumn("ln_stop", F.sum(
                  F.when(F.col("rr") < 1, F.log(1 - F.col("rr"))))
                  .over(w_prev))
              .withColumn("dead_before", F.max(
                  (F.col("rr") >= 1).cast("int")).over(w_prev)))
    contrib = F.when(
        (F.col("rank") <= k) & (F.coalesce("dead_before", F.lit(0)) == 0),
        F.col("rr") / F.col("rank")
        * F.exp(F.coalesce("ln_stop", F.lit(0.0)))).otherwise(F.lit(0.0))
    return (ranked.groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("n_candidates"),
                 F.round(F.sum(contrib), 6).alias("err"))
            .select(F.col("term").alias("query_term"),
                    "n_candidates", "err"))


def mmr_rerank(candidates: DataFrame, sim_pairs: DataFrame,
               k: int = 5, lam: float = 0.7,
               id_col: str = "doc_id", rel_col: str = "rel",
               ) -> DataFrame:
    """Maximal Marginal Relevance diversified re-ranking (Carbonell &
    Goldstein SIGIR 1998): greedily select k items maximizing

        mmr(d) = lam * rel(d) - (1 - lam) * max over selected s
                 of sim(d, s)

    — THE classic redundancy-penalized top-k: a plain top-k returns
    five near-duplicate pages from one mirror farm; MMR trades
    relevance against novelty (lam = 1 recovers the plain ranking).
    ``sim_pairs`` is an undirected (a, b, sim) table over the
    CANDIDATE set only (tens of rows — the caller's top-N), so every
    step is candidate-sized.

    Determinism: each greedy argmax orders by (6dp-rounded mmr DESC,
    id ASC) — engine-portable like every ranked output in this repo.

    Scale shape: the greedy loop is inherently sequential and both
    inputs are CANDIDATE-sized by contract (the caller's top-N and its
    pairwise sims — tens to a few hundred rows at any corpus size), so
    the loop runs on the driver over two one-shot collects: the corpus
    queries upstream of each input run exactly once, and no per-step
    Spark job is launched at all (r5 shape cost 9.2s at sf0.1 in
    per-step localCheckpoints + re-derived pair tables; the r6
    argmax-job shape ~1s of step jobs; this one none). The greedy
    arithmetic is the identical IEEE expression lam*rel - (1-lam)*ms,
    with the 6dp rounding applied to the shortest round-trip decimal
    (Decimal(repr(x)) HALF_UP), which is exactly Spark round's
    Double.toString + BigDecimal HALF_UP semantics.

    -> k rows (step, doc_id, rel 6dp, mmr 6dp).
    """
    import decimal

    q6 = decimal.Decimal("0.000001")

    def rnd6(x: float) -> float:
        return float(decimal.Decimal(repr(float(x))).quantize(
            q6, rounding=decimal.ROUND_HALF_UP))

    cand_rows = candidates.select(
        F.col(id_col).alias("d"),
        F.col(rel_col).cast("double").alias("rel")).collect()
    rels = {r["d"]: float(r["rel"]) for r in cand_rows}
    sims: dict = {}
    for r in sim_pairs.select("a", "b", "sim").collect():
        s = float(r["sim"])
        for x, y in ((r["a"], r["b"]), (r["b"], r["a"])):
            d = sims.setdefault(x, {})
            if y not in d or s > d[y]:
                d[y] = s
    picked_ids: list = []
    out_rows: list[tuple] = []
    for step in range(1, k + 1):
        best = None
        for d, rel in rels.items():
            if d in picked_ids:
                continue
            if picked_ids:
                nbrs = sims.get(d, {})
                ms = max((nbrs[y] for y in picked_ids if y in nbrs),
                         default=0.0)
                mmr = rnd6(lam * rel - (1 - lam) * ms)
            else:
                mmr = rnd6(lam * rel)
            if best is None or (-mmr, d) < (-best[2], best[0]):
                best = (d, rel, mmr)
        if best is None:
            break  # fewer candidates than k
        out_rows.append((step, best[0], best[1], best[2]))
        picked_ids.append(best[0])
    spark = candidates.sparkSession
    schema = T.StructType([
        T.StructField("step", T.LongType(), False),
        T.StructField(id_col, candidates.schema[id_col].dataType, True),
        T.StructField("rel", T.DoubleType(), True),
        T.StructField("mmr", T.DoubleType(), True)])
    return (spark.createDataFrame(out_rows, schema)
            .select("step", id_col, F.round("rel", 6).alias("rel"), "mmr"))


def rocchio_rerank(tokens: DataFrame, query_terms: list[str],
                   alpha: float = 1.0, beta: float = 0.75,
                   fb_docs: int = 10, fb_terms: int = 5,
                   top_k: int = 10) -> DataFrame:
    """Rocchio pseudo-relevance feedback (Rocchio 1971, the SMART
    system's query modification; the blind-feedback form is the
    classic first-pass expansion every IR stack reimplements): run
    BM25, take the top ``fb_docs`` as pseudo-relevant, move the query
    toward their tf-idf centroid,

        w(t) = alpha * [t in q] + beta * centroid_tfidf(t),

    keep the ``fb_terms`` strongest non-query expansion terms
    (weight DESC, token ASC — deterministic), and re-rank candidates
    by the dot product of w with the doc tf-idf vector. Candidates =
    docs matching >= 1 ORIGINAL query term (the standard second-pass
    scope). tf-idf = tf * ln(N/df); 6dp rounds before every ranked
    cut.

    Scale shape: bm25's aggregates are reused (tf/dl/df built once);
    the feedback centroid aggregates fb_docs' postings (broadcast-
    bounded); the final scoring is ONE join of the expanded |q|+
    fb_terms weight table (broadcast) against candidate postings;
    top-k is TakeOrderedAndProject.

    -> top-k (doc_id, score 6dp, rank).
    """
    if not query_terms:
        raise ValueError("rocchio_rerank: query_terms must be non-empty")
    spark = tokens.sparkSession
    q = spark.createDataFrame([(t,) for t in sorted(set(query_terms))],
                              "qt string")
    first = bm25_topk(tokens, query_terms, top_k=fb_docs)
    # eager checkpoint: the (doc, token, tf) table feeds tfidf (twice —
    # feedback centroid and final scoring), df, and the candidate
    # filter; without the cut each consumer replays the corpus-wide
    # token agg (4 passes measured at sf0.1, r6)
    tf = (tokens.groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).alias("tf"))
          .localCheckpoint(eager=True))
    n_docs = tokens.select("doc_id").distinct() \
        .agg(F.count(F.lit(1)).alias("n"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    tfidf = (tf.join(df, "token").crossJoin(F.broadcast(n_docs))
             .select("doc_id", "token",
                     (F.col("tf")
                      * F.log(F.col("n") / F.col("df"))).alias("w")))
    fb = (tfidf.join(F.broadcast(first.select("doc_id")), "doc_id")
          .groupBy("token")
          .agg((F.sum("w") / fb_docs).alias("cw")))
    # expansion terms: strongest centroid terms NOT in the query
    expansion = (fb.join(F.broadcast(q), fb.token == F.col("qt"),
                         "left_anti")
                 .orderBy(F.round(F.col("cw"), 6).desc(),
                          F.col("token").asc())
                 .limit(fb_terms))
    q_weights = (q.select(F.col("qt").alias("token"))
                 .join(fb.withColumnRenamed("token", "token"),
                       "token", "left")
                 .select("token",
                         (F.lit(alpha)
                          + F.lit(beta) * F.coalesce("cw", F.lit(0.0)))
                         .alias("qw")))
    e_weights = expansion.select(
        "token", (F.lit(beta) * F.col("cw")).alias("qw"))
    weights = q_weights.unionByName(e_weights)
    cands = (tf.join(F.broadcast(q), tf.token == F.col("qt"))
             .select("doc_id").distinct())
    scored = (tfidf.join(F.broadcast(weights), "token")
              .join(cands, "doc_id")
              .groupBy("doc_id")
              .agg(F.round(F.sum(F.col("w") * F.col("qw")), 6)
                   .alias("score")))
    top = (scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
           .limit(top_k))
    w_rank = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.select("doc_id", "score",
                      F.row_number().over(w_rank).cast("long")
                      .alias("rank"))
