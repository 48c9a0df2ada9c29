"""Bigram language-model quality scoring (CCNet-style perplexity filter).

CCNet ranks Common-Crawl documents by the perplexity of a KenLM n-gram
model trained on a trusted corpus and keeps the low-perplexity head; it is
the single most-cited quality signal in web-scale LLM-data pipelines. The
reference processes one document at a time and has no corpus-level LM
stage (saber/saber.py:52-96); this module is part of the
training-data-pipeline addendum (SURVEY.md grading addendum).

The sandbox twin is a bigram model with additive (add-k) smoothing —
deterministic, engine-portable (the DuckDB oracle reproduces it to the
digit), and exactly the same dataflow shape a KenLM-scored pipeline has:
a counts model built once from a reference slice, then one equi-join per
scored n-gram.

Scale shape at 100 TB:
  * bigram extraction is a NARROW map — bigrams are zipped out of each
    document's token array before any explode, so no shuffle and no
    (doc, pos) self-join;
  * model fit = one hash agg over train bigrams (algebraic counts,
    map-side combine absorbs Zipf head skew: 'the the' partials collapse
    per-partition before the exchange);
  * scoring = two equi-joins (bigram counts, then left-context totals);
    the model table is shuffle-joined — at web scale it exceeds broadcast
    range, and both sides hash-partition on the same key; stop-word-head
    skew is AQE skew-join territory and is noted, not hidden;
  * the per-doc reduce is one algebraic agg (sum/count of log-probs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Knuth multiplicative hash constants imported from operators/splits.py so
# every "hash split" in the repo partitions identically.
from saber_spark.operators.splits import HASH_MOD, KNUTH  # noqa: E402


def doc_bigrams(docs: DataFrame, pattern: str,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """documents -> (doc_id, w1, w2): adjacent token pairs, zero shuffle.

    The token array is zipped with its own 1-shifted slice inside the row
    (pure codegen higher-order functions), then exploded — the narrow-map
    formulation of bigram extraction. Documents with < 2 tokens emit no
    rows. NULL text emits no rows.
    """
    arr = F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
    docs = docs.select(F.col(id_col), arr.alias("arr"))
    _ln = F.greatest(F.size("arr") - 1, F.lit(0))
    # arrays_zip instead of a zip_with lambda: same structs, stays off
    # the interpreted HOF path (r6)
    pairs = F.arrays_zip(F.slice(F.col("arr"), 1, _ln).alias("w1"),
                         F.slice(F.col("arr"), 2, _ln).alias("w2"))
    return (docs
            .filter(F.size("arr") >= 2)
            .select(id_col, F.explode(pairs).alias("bg"))
            .select(id_col, F.col("bg.w1").alias("w1"),
                    F.col("bg.w2").alias("w2")))


def train_split(df: DataFrame, id_col: str = "doc_id",
                parts: int = 2) -> DataFrame:
    """Deterministic hash-half assignment: part 0 scores, parts 1..n-1
    train (same Knuth-hash convention as splits.fold_assign)."""
    return df.withColumn(
        "part",
        ((F.col(id_col).cast("bigint") * F.lit(KNUTH)) % F.lit(HASH_MOD))
        % F.lit(parts))


def bigram_model(train_bigrams: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """train bigrams -> (pair counts, left-context totals, vocab size).

    c12(w1, w2) and c1(w1) = sum_w2 c12(w1, w2) — the conditional-prob
    denominator. Both are single hash aggs. The vocab size V (distinct
    continuation types) parameterizes the add-k smoother.
    """
    c12 = (train_bigrams.groupBy("w1", "w2")
           .agg(F.count(F.lit(1)).alias("c12")))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (train_bigrams.select(F.col("w2").alias("w"))
             .union(train_bigrams.select(F.col("w1").alias("w")))
             .agg(F.count_distinct("w").alias("v")))
    return c12, c1, vocab


def lm_cross_entropy(docs: DataFrame, pattern: str,
                     text_col: str = "text", id_col: str = "doc_id",
                     add_k: float = 0.5) -> DataFrame:
    """Score hash-half 0 of the corpus under a bigram LM fit on the other
    half -> (doc_id, n_bigrams, xent).

    p(w2|w1) = (c12 + k) / (c1 + k*V): unseen contexts degrade to the
    uniform 1/V, unseen continuations to ~k/c1 — every bigram gets a
    finite log-prob, so xent is total. xent = -mean ln p over the doc's
    bigrams, rounded to 6 (the repo's float-portability convention);
    CCNet's keep/drop head is then a threshold or quantile bucket on this
    column (see splits.quantile_buckets).
    """
    bg = train_split(doc_bigrams(docs, pattern, text_col, id_col), id_col)
    c12, c1, vocab = bigram_model(bg.filter(F.col("part") != 0))
    score = bg.filter(F.col("part") == 0)
    # degenerate (empty) train half: V clamps to 1 so every p = 1 and
    # xent = 0 — a defined "no model, no information" score instead of a
    # DIVIDE_BY_ZERO under ANSI; callers needing a hard failure assert on
    # the model row count
    v = F.lit(float(add_k)) * F.greatest(F.col("v"), F.lit(1))
    p = ((F.coalesce(F.col("c12"), F.lit(0)) + F.lit(float(add_k)))
         / (F.coalesce(F.col("c1"), F.lit(0)) + v))
    return (score
            .join(c12, ["w1", "w2"], "left")
            .join(c1, ["w1"], "left")
            .crossJoin(F.broadcast(vocab))   # 1-row scalar, broadcast
            .select(id_col, (-F.ln(p)).alias("nll"))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.avg("nll"), 6).alias("xent")))


def doc_trigrams(docs: DataFrame, pattern: str,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """documents -> (doc_id, w1, w2, w3): adjacent token triples, zero
    shuffle (transform over an index sequence inside the row, then one
    explode — the doc_bigrams contract at order 3). Documents with < 3
    tokens emit no rows."""
    arr = F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
    d = docs.select(F.col(id_col), arr.alias("arr"))
    # three length-guarded slices zipped into structs — no lambda, so
    # the gram build stays off the interpreted HOF path (r6)
    ln = F.greatest(F.size("arr") - 2, F.lit(0))
    tris = F.arrays_zip(F.slice("arr", 1, ln).alias("w1"),
                        F.slice("arr", 2, ln).alias("w2"),
                        F.slice("arr", 3, ln).alias("w3"))
    return (d.filter(F.size("arr") >= 3)
            .select(id_col, F.explode(tris).alias("tg"))
            .select(id_col, F.col("tg.w1").alias("w1"),
                    F.col("tg.w2").alias("w2"),
                    F.col("tg.w3").alias("w3")))


def trigram_backoff_xent(docs: DataFrame, pattern: str,
                         text_col: str = "text", id_col: str = "doc_id",
                         alpha: float = 0.4) -> DataFrame:
    """Stupid-backoff trigram scoring (Brants et al. 2007, the web-scale
    LM recipe: no normalization, a fixed backoff factor — built for
    exactly this MapReduce-style distributed counting setting). Scores
    hash-half 0 under counts from the other half:

        S(w3|w1 w2) = c123/c12                 if c123 > 0
                    = alpha * c23/c2           else if c23 > 0
                    = alpha^2 * (c3+1)/(N+V)   else (add-1 unigram floor,
                                                     always defined)

    -> (doc_id, n_trigrams, xent) with xent = -mean ln S, rounded 6.
    The sibling of lm_cross_entropy one order up: trigram context halves
    the perplexity gap to KenLM-class filters while every stage stays
    the same shape — three hash aggs for the count tables (c123 derives
    c12; c23 derives c2 and c3 the same way, so raw trigrams are
    aggregated ONCE), then three left equi-joins + one per-doc agg.
    N/V ride in as a broadcast 1-row aggregate.
    """
    tg = train_split(doc_trigrams(docs, pattern, text_col, id_col), id_col)
    train = tg.filter(F.col("part") != 0)
    c123 = (train.groupBy("w1", "w2", "w3")
            .agg(F.count(F.lit(1)).alias("c123")))
    c12 = c123.groupBy("w1", "w2").agg(F.sum("c123").alias("c12"))
    c23 = (train.groupBy("w2", "w3")
           .agg(F.count(F.lit(1)).alias("c23")))
    c2 = c23.groupBy("w2").agg(F.sum("c23").alias("c2"))
    c3 = (train.groupBy("w3").agg(F.count(F.lit(1)).alias("c3")))
    nv = train.agg(F.count(F.lit(1)).alias("n"),
                   F.count_distinct("w3").alias("v"))
    score = tg.filter(F.col("part") == 0)
    s = (F.when(F.coalesce(F.col("c123"), F.lit(0)) > 0,
                F.col("c123") / F.col("c12"))
         .when(F.coalesce(F.col("c23"), F.lit(0)) > 0,
               F.lit(alpha) * F.col("c23") / F.col("c2"))
         .otherwise(F.lit(alpha * alpha)
                    * (F.coalesce(F.col("c3"), F.lit(0)) + 1)
                    / (F.col("n") + F.greatest(F.col("v"), F.lit(1)))))
    return (score
            .join(c123, ["w1", "w2", "w3"], "left")
            .join(c12, ["w1", "w2"], "left")
            .join(c23, ["w2", "w3"], "left")
            .join(c2, ["w2"], "left")
            .join(c3, ["w3"], "left")
            .crossJoin(F.broadcast(nv))
            .select(id_col, (-F.ln(s)).alias("nll"))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_trigrams"),
                 F.round(F.avg("nll"), 6).alias("xent")))


def good_turing(tokens: DataFrame, token_col: str = "token") -> DataFrame:
    """Good-Turing count-of-counts smoothing table over a token stream.

    -> (r, n_r, r_star): for every observed frequency r, the number of
    types n_r seen exactly r times and the smoothed count
    r* = (r+1) * n_{r+1} / n_r (NULL where n_{r+1} = 0 — the standard
    simple-GT gap; production estimators regress log n_r ~ log r to fill
    it, which `zipf_fit`'s OLS machinery covers for the rank law). The
    unseen-mass estimate p_0 = n_1 / N falls out of the r = 1 row.

    Scale shape: the type-frequency agg is the only corpus-sized shuffle
    (map-side partial counts); the count-of-counts agg and the r+1
    self-join run over the ~hundreds-of-rows frequency histogram.
    """
    freqs = tokens.groupBy(token_col).agg(F.count(F.lit(1)).alias("r"))
    nr = freqs.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    nxt = nr.select((F.col("r") - F.lit(1)).alias("r"),
                    F.col("n_r").alias("_n_r1"))
    return (nr.join(nxt, "r", "left")
            .select("r", "n_r",
                    F.round((F.col("r") + 1) * F.col("_n_r1")
                            / F.col("n_r"), 6).alias("r_star")))


def kneser_ney_bigrams(docs: DataFrame, pattern: str,
                       text_col: str = "text", id_col: str = "doc_id",
                       discount: float = 0.75,
                       top_k: int = 20) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney ICASSP
    1995; Chen & Goodman 1998 formulation) — the smoothing family KenLM
    ships, i.e. the exact model class behind CCNet's perplexity filter
    (lm_cross_entropy's add-k and trigram_backoff_xent's stupid backoff
    are its cheaper siblings; this is the production-grade one):

        P_kn(w2|w1) = max(c(w1 w2) - d, 0) / c(w1)
                      + d * N1+(w1, *) / c(w1) * P_cont(w2)
        P_cont(w2)  = N1+(*, w2) / |distinct bigram types|

    The continuation probability is KN's signature: a word scores by how
    many CONTEXTS it follows, not how often it occurs — "francisco" is
    frequent but only ever follows "san", so its unigram backoff weight
    collapses, which is precisely the behavior that separates KN from
    Good-Turing/add-k on web text.

    Scale shape: bigram extraction is doc_bigrams' narrow zip (no
    shuffle); the model is ONE (w1, w2) hash agg (map-side partials
    absorb the Zipf head) from which every other statistic derives by
    REDUCED-side aggs: c(w1) and N1+(w1, *) in one groupBy over the pair
    table, N1+(*, w2) in another, the type total as a broadcast 1-row
    agg. Scoring joins are all on the already-reduced model tables. No
    Python, nothing row-at-a-time.

    -> top_k bigrams by raw count (ties: w1 ASC, w2 ASC):
    (w1, w2, c12, c1, n1plus_fwd, n1plus_bwd, p_cont 6dp, p_kn 6dp).
    """
    bg = doc_bigrams(docs, pattern, text_col, id_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    left = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"),
        F.count(F.lit(1)).alias("n1plus_fwd"))
    right = c12.groupBy("w2").agg(
        F.count(F.lit(1)).alias("n1plus_bwd"))
    types = c12.agg(F.count(F.lit(1)).alias("n_types"))
    d = float(discount)
    scored = (c12.join(left, "w1").join(right, "w2")
              .crossJoin(F.broadcast(types))
              .withColumn("p_cont",
                          F.col("n1plus_bwd").cast("double")
                          / F.col("n_types"))
              .withColumn(
                  "p_kn",
                  F.greatest(F.col("c12") - F.lit(d), F.lit(0.0))
                  / F.col("c1")
                  + F.lit(d) * F.col("n1plus_fwd") / F.col("c1")
                  * F.col("p_cont")))
    from pyspark.sql import Window
    w = Window.orderBy(F.col("c12").desc(), F.col("w1").asc(),
                       F.col("w2").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= top_k)
            .select("w1", "w2", F.col("c12").cast("long").alias("c12"),
                    F.col("c1").cast("long").alias("c1"),
                    F.col("n1plus_fwd").cast("long").alias("n1plus_fwd"),
                    F.col("n1plus_bwd").cast("long").alias("n1plus_bwd"),
                    F.round("p_cont", 6).alias("p_cont"),
                    F.round("p_kn", 6).alias("p_kn")))


def entropy_rate(docs: DataFrame, pattern: str,
                 text_col: str = "text") -> DataFrame:
    """Corpus unigram entropy and bigram entropy rate (Shannon 1951,
    "Prediction and Entropy of Printed English"):

        H1 = -sum_w  p(w) ln p(w)
        H2 = -sum_{w1,w2} p(w1,w2) ln p(w2 | w1)      (entropy rate)

    in nats, with perplexities exp(H). H1 - H2 is the predictive
    value of one token of context — natural text has H2 well below
    H1; templated/boilerplate corpora collapse H2 toward 0 while
    machine-generated-noise pushes H2 toward H1. Unlike
    lm_cross_entropy (a MODEL scored on held-out data) this is a
    property of the corpus itself: no split, no smoothing — maximum-
    likelihood estimates on the full bigram table, 0 ln 0 = 0.

    Scale shape: one bigram hash agg (narrow zip_with extraction,
    map-side combine) and one unigram agg derived from its left
    margin; totals broadcast; two reduced-side contribution sums.

    -> ONE row (n_bigrams, h_unigram 6dp, h_bigram_rate 6dp,
    ppl_unigram 6dp, ppl_bigram 6dp).
    """
    bg = (doc_bigrams(docs, pattern, text_col)
          .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")))
    left = bg.groupBy("w1").agg(F.sum("c12").alias("c1"))
    n = bg.agg(F.sum("c12").alias("n"))
    h2 = (bg.join(left, "w1").crossJoin(F.broadcast(n))
          .agg((-F.sum(F.col("c12") / F.col("n")
                       * F.log(F.col("c12") / F.col("c1"))))
               .alias("h2"),
               F.max("n").alias("n_bigrams")))
    h1 = (left.crossJoin(F.broadcast(n))
          .agg((-F.sum(F.col("c1") / F.col("n")
                       * F.log(F.col("c1") / F.col("n"))))
               .alias("h1")))
    return (h2.crossJoin(F.broadcast(h1))
            .select(F.col("n_bigrams").cast("long").alias("n_bigrams"),
                    F.round(F.col("h1"), 6).alias("h_unigram"),
                    F.round(F.col("h2"), 6).alias("h_bigram_rate"),
                    F.round(F.exp(F.col("h1")), 6).alias("ppl_unigram"),
                    F.round(F.exp(F.col("h2")), 6).alias("ppl_bigram")))


def min_k_prob(docs: DataFrame, pattern: str, k_pct: float = 0.2,
               text_col: str = "text", id_col: str = "doc_id",
               add_k: float = 0.5) -> DataFrame:
    """Min-K% Prob pretraining-membership score (Shi et al. 2023,
    arXiv:2310.16789 "Detecting Pretraining Data from Large Language
    Models"): score a document by the MEAN log-probability of its k%
    LEAST-likely tokens under a reference LM — members of the training
    set lack the low-probability outlier tokens non-members have, so a
    HIGHER min-k% average means more likely seen in training. The
    membership/leakage audit that runs next to the n-gram
    decontamination ops (contamination_check, bloom_decontaminate):
    those catch verbatim overlap, this catches paraphrased/partial
    leakage through the model's own probabilities.

    Reference model: the repo's add-k bigram LM (lm_cross_entropy's
    model half — hash-half != 0 trains, half 0 is scored), standing in
    for the LLM logprobs the paper queries; the selection/aggregation
    layer is the operator. Selection: per doc, the ceil(k_pct * n)
    bigrams with the highest NLL. Ties share identical NLL values, so
    the mean is invariant to which tied members the row_number picks —
    deterministic without a positional tie-break.

    Scale shape: one bigram model (two hash aggs), two left joins for
    scoring, ONE per-doc window (WindowGroupLimit-prunable rank) and
    one agg. No Python.

    -> (doc_id, n_bigrams, n_selected, mink_avg_logprob 6dp,
    full_avg_logprob 6dp); higher mink => more member-like.
    """
    from pyspark.sql import Window
    bg = train_split(doc_bigrams(docs, pattern, text_col, id_col),
                     id_col)
    c12, c1, vocab = bigram_model(bg.filter(F.col("part") != 0))
    score = bg.filter(F.col("part") == 0)
    v = F.lit(float(add_k)) * F.greatest(F.col("v"), F.lit(1))
    p = ((F.coalesce(F.col("c12"), F.lit(0)) + F.lit(float(add_k)))
         / (F.coalesce(F.col("c1"), F.lit(0)) + v))
    nll = (score
           .join(c12, ["w1", "w2"], "left")
           .join(c1, ["w1"], "left")
           .crossJoin(F.broadcast(vocab))
           .select(id_col, (-F.ln(p)).alias("nll")))
    w = Window.partitionBy(id_col).orderBy(F.col("nll").desc())
    cnt = Window.partitionBy(id_col)
    ranked = nll.select(
        id_col, "nll",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"))
    sel = F.ceil(F.lit(float(k_pct)) * F.col("n")).cast("long")
    return (ranked
            .groupBy(id_col)
            .agg(F.max("n").alias("n_bigrams"),
                 F.max(sel).alias("n_selected"),
                 F.round(-F.sum(F.when(F.col("rn") <= sel,
                                       F.col("nll")))
                         / F.max(sel), 6).alias("mink_avg_logprob"),
                 F.round(-F.avg("nll"), 6).alias("full_avg_logprob")))
