"""Chunk-level evaluation (P/R/F1/support) as joins + aggregation.

Reference semantics (saber/metrics.py:124-201; kernel twin in
saber_spark.kernels.metrics): per-label TP/FP/FN by set membership of
(label, start, end) chunks under 'exact' / 'left' / 'right' boundary
criteria; labels enumerated from GOLD only; P=R=0 when TP=0.

Relational formulation (SURVEY.md §2.2):
  TP = gold INNER JOIN pred on the criteria columns
  FN = gold ANTI JOIN pred
  FP = pred ANTI JOIN gold (then restricted to labels present in gold)
  -> groupBy(label) + the P/R/F1 expressions.

Counting uses DISTINCT chunk identity within each side (the pipeline emits
chunk sets, matching the reference's set-membership checks on deduplicated
chunks). Micro avg = pooled counts; macro avg = unweighted mean per label —
derivable from this output; the driver-facing query emits per-label rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _criteria_cols(criteria: str, extra_keys: list[str]) -> list[str]:
    if criteria == "exact":
        return extra_keys + ["label", "chunk_start", "chunk_end"]
    if criteria == "left":
        return extra_keys + ["label", "chunk_start"]
    if criteria == "right":
        return extra_keys + ["label", "chunk_end"]
    raise ValueError(
        f"Expected criteria to be one of 'exact', 'left', or 'right'. Got: {criteria}")


def evaluate_chunks(gold: DataFrame, pred: DataFrame, criteria: str = "exact",
                    extra_keys: list[str] | None = None) -> DataFrame:
    """gold/pred (.., label, chunk_start, chunk_end) -> per-label metrics.

    Output: label, tp, fp, fn, precision, recall, f1 (rounded to 6 for
    engine-portable value comparison), ordered by label.
    """
    keys = _criteria_cols(criteria, extra_keys or [])
    g = gold.select(*keys).distinct()
    p = pred.select(*keys).distinct()

    tp = g.join(p, on=keys, how="inner").groupBy("label").agg(
        F.count(F.lit(1)).alias("tp"))
    fn = g.join(p, on=keys, how="left_anti").groupBy("label").agg(
        F.count(F.lit(1)).alias("fn"))
    fp = p.join(g, on=keys, how="left_anti").groupBy("label").agg(
        F.count(F.lit(1)).alias("fp"))

    labels = g.select("label").distinct()
    joined = (
        labels.join(tp, "label", "left")
        .join(fn, "label", "left")
        .join(fp, "label", "left")
        .na.fill(0, ["tp", "fn", "fp"])
    )
    prec = F.when(F.col("tp") > 0,
                  F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(0.0))
    rec = F.when(F.col("tp") > 0,
                 F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(0.0))
    f1 = F.when((prec + rec) > 0,
                2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
    return joined.select(
        "label", "tp", "fp", "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def cohens_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Two categorical label columns -> ONE row
    (n, n_agree, po, pe, kappa): Cohen's chance-corrected agreement
    kappa = (po - pe) / (1 - pe), po = observed agreement rate,
    pe = sum_k p_a(k) * p_b(k) expected-by-chance rate.

    The standard annotation-quality statistic for NER/IE pipelines
    (Artstein & Poesio 2008): here "rater A" can be a gold column and
    "rater B" a model's prediction, or two model variants against each
    other (tagger drift detection between pipeline versions). NULL
    labels are kept as their own category via a sentinel (two NULLs
    agree — pandas/sklearn drop them instead, so this is documented
    behavior, not an accident).

    Degeneracy is DEFINED: pe = 1 (both raters constant and identical)
    gives kappa = 1.0 if po = 1 else 0.0 rather than 0/0. Rounded to 6.

    Scale shape: ONE corpus-wide partial+final agg for (n, n_agree) +
    two category-bounded marginal aggs joined on the label space —
    nothing shuffles more than |categories| rows after the first
    map-side combine; safe at any corpus size.
    """
    NULL_SENTINEL = "\x00<null>"
    a = F.coalesce(F.col(col_a).cast("string"), F.lit(NULL_SENTINEL))
    b = F.coalesce(F.col(col_b).cast("string"), F.lit(NULL_SENTINEL))
    pairs = df.select(a.alias("ra"), b.alias("rb"))
    totals = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("ra") == F.col("rb"), 1).otherwise(0))
        .cast("long").alias("n_agree"))
    ma = pairs.groupBy(F.col("ra").alias("cat")).agg(
        F.count(F.lit(1)).alias("ca"))
    mb = pairs.groupBy(F.col("rb").alias("cat")).agg(
        F.count(F.lit(1)).alias("cb"))
    pe_tbl = (ma.join(mb, "cat")
              .agg(F.sum(F.col("ca").cast("double")
                         * F.col("cb")).alias("pe_num")))
    out = totals.crossJoin(F.broadcast(pe_tbl))
    po = F.col("n_agree") / F.col("n")
    pe = F.coalesce(F.col("pe_num"), F.lit(0.0)) \
        / (F.col("n").cast("double") * F.col("n"))
    kappa = F.when(pe >= 1.0,
                   F.when(po >= 1.0, F.lit(1.0)).otherwise(F.lit(0.0))) \
        .otherwise((po - pe) / (F.lit(1.0) - pe))
    return out.select(
        "n", "n_agree",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(kappa, 6).alias("kappa"))


def roc_auc(df: DataFrame, label_col: str, score_col: str,
            group_col: str) -> DataFrame:
    """Per-group ROC-AUC of a numeric score against a boolean/0-1 label
    -> (group, n_pos, n_neg, auc), tie-exact Mann-Whitney form.

    The calibration statistic for every scoring stage in this repo
    (quality_score, dsir_weights, lm cross-entropy, link-prediction
    Adamic-Adar): does the score actually rank positives above
    negatives? AUC = P(score_pos > score_neg) + 0.5 * P(tie).

    Computed on the SCORE HISTOGRAM, not per-row ranks: one agg to
    (group, score, n_pos, n_neg), then a running negative-count window
    over the distinct-score table and
        concordant = sum_s n_pos(s) * cum_neg(<s) + 0.5*n_pos(s)*n_neg(s)
        auc        = concordant / (P * N)
    This is exactly the tie-averaged rank-sum estimator, but the window
    runs over |distinct scores| rows per group instead of the corpus —
    at 10^12 rows the raw-rank formulation would sort the world; the
    histogram form shuffles each group's rows once (map-side combinable
    count agg) and windows over the bounded score table. Heavily-tied
    scores (rounded quality buckets) make the histogram SMALLER.

    A group with no positives or no negatives has undefined AUC ->
    emitted as NULL with the n_pos/n_neg evidence alongside (an eval
    statistic should refuse to invent 0.5 for a degenerate group; no
    sampler consumes this downstream — the documented exception to the
    defined-not-NULL convention). Rounded to 6.
    """
    lab = F.col(label_col).cast("boolean").cast("int")
    hist = (df.select(F.col(group_col).alias("grp"),
                      F.col(score_col).alias("score"), lab.alias("y"))
            .groupBy("grp", "score")
            .agg(F.sum("y").cast("long").alias("n_pos_s"),
                 F.sum(F.lit(1) - F.col("y")).cast("long").alias("n_neg_s")))
    w = (Window.partitionBy("grp").orderBy("score")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_neg = F.coalesce(F.sum("n_neg_s").over(w), F.lit(0))
    conc = (F.col("n_pos_s") * cum_neg.cast("double")
            + 0.5 * F.col("n_pos_s") * F.col("n_neg_s"))
    per_group = (hist
                 .select("grp", "n_pos_s", "n_neg_s", conc.alias("conc"))
                 .groupBy("grp")
                 .agg(F.sum("n_pos_s").alias("n_pos"),
                      F.sum("n_neg_s").alias("n_neg"),
                      F.sum("conc").alias("conc")))
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(F.col("conc")
                / (F.col("n_pos").cast("double") * F.col("n_neg")), 6))
    return per_group.select(
        F.col("grp").alias(group_col), "n_pos", "n_neg", auc.alias("auc"))


def calibration_curve(df: DataFrame, label_col: str, score_col: str,
                      n_buckets: int = 10,
                      lo: float = 0.0, hi: float = 1.0) -> DataFrame:
    """Reliability diagram -> (bucket, n, n_pos, frac_pos, mean_score):
    equal-width score buckets over [lo, hi) with the observed positive
    rate per bucket — AUC's sibling: AUC says the RANKING works,
    calibration says the score VALUES mean what they claim (a 0.8
    quality score should be right ~80% of the time before anyone
    thresholds on it).

    Bucketing is integer arithmetic on the scaled score (floor, clamped
    to [0, n_buckets-1] so hi lands in the last bucket); frac_pos and
    mean_score round to 6. Empty buckets emit no row (the histogram
    convention — a plotting layer outer-joins the bucket range).

    Scale shape: ONE partial+final hash agg keyed by bucket (bounded by
    n_buckets after the map-side combine) — the cheapest evaluation
    statistic in the repo.
    """
    if n_buckets <= 0 or not hi > lo:
        raise ValueError("calibration_curve: need n_buckets > 0, hi > lo")
    scaled = (F.col(score_col).cast("double") - lo) / (hi - lo) * n_buckets
    bucket = F.least(F.greatest(F.floor(scaled).cast("long"), F.lit(0)),
                     F.lit(n_buckets - 1))
    y = F.col(label_col).cast("boolean").cast("int")
    return (df.select(bucket.alias("bucket"), y.alias("y"),
                      F.col(score_col).cast("double").alias("s"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("y").cast("long").alias("n_pos"),
                 F.round(F.avg("y"), 6).alias("frac_pos"),
                 F.round(F.avg("s"), 6).alias("mean_score")))


def bcubed_eval(assign: DataFrame, item_col: str = "item",
                pred_col: str = "pred_cluster",
                gold_col: str = "gold_cluster") -> DataFrame:
    """B-cubed clustering evaluation (Bagga & Baldwin 1998) -> ONE row
    (n_items, bcubed_precision, bcubed_recall, bcubed_f1): the standard
    coreference/entity-resolution cluster metric, computed from the
    (pred, gold) contingency table. Per-item precision is
    |C(i) & G(i)| / |C(i)|, so over a cell of n co-assigned items the
    precision mass is n^2/|C| and the recall mass n^2/|G|; B3 P/R are
    those masses summed over cells divided by N, F1 their harmonic
    mean. Closes the eval loop for resolve_entities/dedup the way
    eval_prf closes it for the tagger and linkpred_mrr for completion.

    Scale shape: ONE corpus-size map-side-combinable agg to contingency
    cells; cluster/gold size tables and the final one-row agg all
    derive from that tiny cell table (two re-aggs + two equi-joins on
    it) — the corpus is never touched again.

    Expects one row per item; duplicate items inflate N as they would
    in the textbook definition.
    """
    cells = (assign
             .select(F.col(item_col).alias("i"),
                     F.col(pred_col).alias("c"),
                     F.col(gold_col).alias("g"))
             .groupBy("c", "g")
             .agg(F.count(F.lit(1)).alias("n")))
    nc = cells.groupBy("c").agg(F.sum("n").alias("nc"))
    ng = cells.groupBy("g").agg(F.sum("n").alias("ng"))
    scored = (cells.join(nc, "c").join(ng, "g")
              .select("n",
                      (F.col("n") * F.col("n") /
                       F.col("nc").cast("double")).alias("p_mass"),
                      (F.col("n") * F.col("n") /
                       F.col("ng").cast("double")).alias("r_mass")))
    agg = scored.agg(F.sum("n").alias("n_items"),
                     F.sum("p_mass").alias("pm"),
                     F.sum("r_mass").alias("rm"))
    p = F.col("pm") / F.col("n_items")
    r = F.col("rm") / F.col("n_items")
    return agg.select(
        F.col("n_items").cast("long").alias("n_items"),
        F.round(p, 6).alias("bcubed_precision"),
        F.round(r, 6).alias("bcubed_recall"),
        F.round(F.when(p + r > 0, 2.0 * p * r / (p + r)), 6)
        .alias("bcubed_f1"))


def evaluate_chunks_semeval(gold: DataFrame, pred: DataFrame,
                            extra_keys: list[str] | None = None
                            ) -> DataFrame:
    """MUC-5 / SemEval-2013 task-9.1 evaluation modes over chunk sets
    (Chinchor MUC-5 1993; Segura-Bedmar et al. SemEval 2013; the
    nervaluate reference implementation): the four-mode ladder that
    extends evaluate_chunks' exact/left/right boundary criteria
    (saber/metrics.py:158-166) with OVERLAP credit —

      strict   exact boundaries AND matching label
      exact    exact boundaries, label ignored
      partial  exact boundaries = COR, any overlap = PAR (half credit)
      type     any overlap with matching label

    Per prediction: COR / INC / PAR / SPU by the best gold evidence
    available (exists-quantified over overlapping golds); MIS = gold
    chunks no prediction overlaps at all. Set semantics throughout
    (DISTINCT chunk identity, no bipartite matching) — the
    deterministic relational variant; it agrees with nervaluate
    whenever spans do not doubly overlap, which BIO decoding
    guarantees within one sequence.

    P = (COR + 0.5 PAR) / (COR + INC + PAR + SPU)
    R = (COR + 0.5 PAR) / (COR + INC + PAR + MIS)

    Scale shape: ONE overlap join co-partitioned on the sequence key
    (chunks-per-sequence is bounded, so the per-key pair fan-out is
    too), one per-prediction flag agg, one global count agg each side,
    and the four mode rows inline() out of a single assembled row —
    no second pass over the data.

    -> 4 rows (mode, cor, inc, par, mis, spu, precision 6dp,
    recall 6dp, f1 6dp).
    """
    keys = extra_keys or []
    idc = keys + ["label", "chunk_start", "chunk_end"]
    g = gold.select(*idc).distinct()
    p = pred.select(*idc).distinct()
    gg = g.select(
        *keys, F.col("label").alias("g_label"),
        F.col("chunk_start").alias("g_start"),
        F.col("chunk_end").alias("g_end"))
    ov = (p.join(gg, keys)
          .filter((F.col("g_start") < F.col("chunk_end"))
                  & (F.col("chunk_start") < F.col("g_end"))))
    ex = ((F.col("g_start") == F.col("chunk_start"))
          & (F.col("g_end") == F.col("chunk_end")))
    same = F.col("g_label") == F.col("label")
    flags = (ov.groupBy(*idc)
             .agg(F.max((ex & same).cast("int")).alias("ex_l"),
                  F.max(ex.cast("int")).alias("ex"),
                  F.max(same.cast("int")).alias("ov_l")))
    per_pred = (p.join(flags, idc, "left")
                .select(F.coalesce("ex_l", F.lit(0)).alias("ex_l"),
                        F.coalesce("ex", F.lit(0)).alias("ex"),
                        F.coalesce("ov_l", F.lit(0)).alias("ov_l"),
                        F.when(F.col("ex").isNull(), F.lit(0))
                        .otherwise(F.lit(1)).alias("ov")))
    pc = per_pred.agg(
        F.count(F.lit(1)).alias("n_pred"),
        F.sum("ex_l").alias("s_ex_l"), F.sum("ex").alias("s_ex"),
        F.sum("ov_l").alias("s_ov_l"), F.sum("ov").alias("s_ov"))
    pp = p.select(*keys, F.col("chunk_start").alias("p_start"),
                  F.col("chunk_end").alias("p_end"))
    mis = (g.join(pp, keys, "left")
           .withColumn("_hit", ((F.col("p_start") < F.col("chunk_end"))
                                & (F.col("chunk_start") < F.col("p_end")))
                       .cast("int"))
           .groupBy(*idc).agg(F.max(F.coalesce("_hit", F.lit(0)))
                              .alias("_h"))
           .agg((F.count(F.lit(1)) - F.sum("_h")).alias("mis")))
    row = pc.crossJoin(mis)
    spu = F.col("n_pred") - F.col("s_ov")
    modes = F.array(
        F.struct(F.lit("strict").alias("mode"),
                 F.col("s_ex_l").alias("cor"),
                 (F.col("s_ov") - F.col("s_ex_l")).alias("inc"),
                 F.lit(0).cast("bigint").alias("par"),
                 F.col("mis").alias("mis"), spu.alias("spu")),
        F.struct(F.lit("exact").alias("mode"),
                 F.col("s_ex").alias("cor"),
                 (F.col("s_ov") - F.col("s_ex")).alias("inc"),
                 F.lit(0).cast("bigint").alias("par"),
                 F.col("mis").alias("mis"), spu.alias("spu")),
        F.struct(F.lit("partial").alias("mode"),
                 F.col("s_ex").alias("cor"),
                 F.lit(0).cast("bigint").alias("inc"),
                 (F.col("s_ov") - F.col("s_ex")).alias("par"),
                 F.col("mis").alias("mis"), spu.alias("spu")),
        F.struct(F.lit("type").alias("mode"),
                 F.col("s_ov_l").alias("cor"),
                 (F.col("s_ov") - F.col("s_ov_l")).alias("inc"),
                 F.lit(0).cast("bigint").alias("par"),
                 F.col("mis").alias("mis"), spu.alias("spu")))
    out = row.select(F.inline(modes))
    num = F.col("cor") + F.lit(0.5) * F.col("par")
    act = F.col("cor") + F.col("inc") + F.col("par") + F.col("spu")
    pos = F.col("cor") + F.col("inc") + F.col("par") + F.col("mis")
    prec = F.when(act > 0, num / act).otherwise(F.lit(0.0))
    rec = F.when(pos > 0, num / pos).otherwise(F.lit(0.0))
    f1 = F.when((prec + rec) > 0,
                2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
    return out.select(
        "mode", F.col("cor").cast("long").alias("cor"),
        F.col("inc").cast("long").alias("inc"),
        F.col("par").cast("long").alias("par"),
        F.col("mis").cast("long").alias("mis"),
        F.col("spu").cast("long").alias("spu"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"))


def capture_recapture(a: DataFrame, b: DataFrame,
                      keys: list[str]) -> DataFrame:
    """Lincoln-Petersen capture-recapture with the Chapman correction
    (Chapman 1951; Razniewski et al. CIKM 2016 applied it to KB recall):
    two INDEPENDENT extractors' outputs over the same corpus estimate
    the true extraction universe — and therefore each extractor's
    absolute recall — without any gold annotation:

        N_hat = (n_a + 1)(n_b + 1) / (n_both + 1) - 1
        recall_x = n_x / N_hat

    This answers what eval_prf/tagger_agreement cannot: agreement
    metrics compare extractors to EACH OTHER; capture-recapture infers
    how much NEITHER found (valid insofar as the extractors' miss
    processes are independent — the standard caveat, stated, not
    hidden).

    Scale shape: two distinct projections + ONE inner join on the
    mention key + three count aggs that reduce to one row. The join
    co-partitions both sides on the same key.

    -> ONE row (n_a, n_b, n_both, n_hat 6dp, recall_a 6dp,
    recall_b 6dp).
    """
    da = a.select(*keys).distinct()
    db = b.select(*keys).distinct()
    both = da.join(db, keys)
    na = da.agg(F.count(F.lit(1)).alias("n_a"))
    nb = db.agg(F.count(F.lit(1)).alias("n_b"))
    m = both.agg(F.count(F.lit(1)).alias("n_both"))
    row = na.crossJoin(nb).crossJoin(m)
    n_hat = ((F.col("n_a") + 1) * (F.col("n_b") + 1)
             / (F.col("n_both") + 1) - 1)
    return row.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_both").cast("long").alias("n_both"),
        F.round(n_hat, 6).alias("n_hat"),
        F.round(F.col("n_a") / n_hat, 6).alias("recall_a"),
        F.round(F.col("n_b") / n_hat, 6).alias("recall_b"))


def wilson_lower_bound(df: DataFrame, group_col: str, success_col,
                       z: float = 1.959964) -> DataFrame:
    """Wilson score-interval lower bound per group (Wilson JASA 1927;
    the "how not to sort by average rating" estimator) — the
    shrinkage-honest way to RANK sources/hosts/extractors by a success
    proportion when group sizes differ by orders of magnitude: a host
    with 3/3 clean docs must NOT outrank one with 970/1000, which is
    exactly what raw p-hat does and what capture_recapture /
    source_reliability don't answer (they estimate, they don't rank
    under small-sample uncertainty).

        lb = (p + z^2/2n - z*sqrt(p(1-p)/n + z^2/4n^2)) / (1 + z^2/n)

    with p = k/n. Counts are exact; sqrt/divisions are doubles on
    exact rationals -> 6dp round is engine-portable. z defaults to
    the two-sided 95% normal quantile.

    Rank ties broken (rounded lb DESC, group ASC) — deterministic.

    Scale shape: ONE group-keyed hash agg (conditional sum for k,
    count for n — map-side combine, no skew possible beyond the group
    key itself); the rank window runs on |groups| rows. At web scale
    |hosts| is millions — row_number over a global order is a single
    partition, so shard the ranking by a coarse bucket first if the
    full ordering is actually needed (the top-k consumer never needs
    it: TakeOrderedAndProject on the rounded key).

    -> (group, n, k, p_hat 6dp, wilson_lb 6dp, rank).
    """
    s = success_col if not isinstance(success_col, str) \
        else F.col(success_col)
    g = (df.groupBy(group_col)
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(s.cast("long")).alias("k")))
    p = F.col("k") / F.col("n")
    n = F.col("n")
    z2 = F.lit(z * z)
    # z2/(4*n)/n, not z2/(4*n*n): n*n overflows BIGINT past ~3e9 rows
    lb = ((p + z2 / (2 * n)
           - F.lit(z) * F.sqrt(p * (1 - p) / n + z2 / (4 * n) / n))
          / (1 + z2 / n))
    scored = g.select(
        F.col(group_col),
        n.cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.round(p, 6).alias("p_hat"),
        F.round(lb, 6).alias("wilson_lb"))
    w = Window.orderBy(F.col("wilson_lb").desc(), F.col(group_col).asc())
    return scored.select("*", F.row_number().over(w).cast("long")
                         .alias("rank"))


def bradley_terry(matches: DataFrame, iterations: int = 8,
                  winner_col: str = "winner",
                  loser_col: str = "loser") -> DataFrame:
    """Bradley-Terry preference-strength fitting (Bradley & Terry 1952;
    Zermelo 1929) by Hunter's MM algorithm (Hunter, Annals of
    Statistics 2004):

        theta_i <- W_i / sum_{j != i} N_ij / (theta_i + theta_j)

    from theta = 1, a FIXED iteration count, each round re-centered by
    the geometric mean of the positive strengths so the scale is
    pinned — the batch model behind pairwise LLM-eval leaderboards
    (Chatbot Arena computes exactly these strengths from pairwise
    human preferences; Elo is its sequential approximation) and, in a
    data engine, the aggregator that turns noisy pairwise quality
    judgments into a global item ranking.

    Spark division of labor — the BPE-trainer precedent (bpe.py module
    docstring): the MATCH stream (arbitrarily large) reduces with ONE
    hash agg to the (item, item) pair-count table, which is bounded by
    the ITEM vocabulary squared — leaderboard-sized by nature; the MM
    loop then runs on the driver over that bounded table, exactly like
    the BPE merge loop over the word-frequency dict and the kmeans
    model loop. (A first cut kept the loop distributed with a
    localCheckpoint per round; per-round cost started DOUBLING past
    ~13 rounds despite a constant analyzed plan — RDD-level state the
    checkpoint does not flatten — so the driver-model form is both the
    honest bound and the fast one.)

    Degenerate items are kept honest: an item with zero wins has
    theta -> 0 under MM (reported, not hidden); a disconnected
    comparison graph yields per-component scales — callers needing a
    guarantee assert on wins > 0 / connectivity first.

    -> (item, wins, comparisons, theta 6dp, rank) — rank 1 =
    strongest; ties (theta, then item ASC).
    """
    m = matches.select(F.col(winner_col).alias("w"),
                       F.col(loser_col).alias("l"))
    pair_rows = (m.select(F.col("w").alias("a"), F.col("l").alias("b"),
                          F.lit(1).alias("win_a"))
                 .unionByName(
                     m.select(F.col("l").alias("a"),
                              F.col("w").alias("b"),
                              F.lit(0).alias("win_a")))
                 .groupBy("a", "b")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum("win_a").alias("wins_a"))
                 .collect())  # item-vocabulary-bounded model table
    wins: dict = {}
    nbrs: dict = {}
    for r in pair_rows:
        wins[r["a"]] = wins.get(r["a"], 0) + int(r["wins_a"])
        wins.setdefault(r["b"], wins.get(r["b"], 0))
        nbrs.setdefault(r["a"], []).append((r["b"], int(r["n"])))
    items = sorted(wins)
    theta = {i: 1.0 for i in items}
    for _ in range(iterations):
        new = {}
        for i in items:
            d = sum(n / (theta[i] + theta[j])
                    for j, n in sorted(nbrs.get(i, [])))
            new[i] = wins[i] / d if d > 0 else 0.0
        pos = [v for v in new.values() if v > 0]
        if pos:
            import math as _math
            g = _math.exp(sum(_math.log(v) for v in pos) / len(pos))
            new = {i: v / g for i, v in new.items()}
        theta = new
    comps = {i: sum(n for _, n in nbrs.get(i, [])) for i in items}
    spark = matches.sparkSession
    out = spark.createDataFrame(
        [(i, wins[i], comps[i], round(theta[i], 6)) for i in items],
        "item string, wins long, comparisons long, theta double")
    w = Window.orderBy(F.col("theta").desc(), F.col("item").asc())
    return out.withColumn("rank", F.row_number().over(w))
