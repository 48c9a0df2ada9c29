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


# Sentence boundary after [.!?] + whitespace (kernels.text._SENT_BOUNDARY_RE
# = (?<=[.!?])\s+, parity saber/preprocessor.py:90-99), expressed
# lookbehind-free (replace boundary with \x1e, then split) so the identical
# construction runs on RE2 engines (the DuckDB oracle twin — RE2 has no
# lookbehind). Whitespace is the Java∩RE2 ASCII class [ \t\n\r\f]; Python's
# \s additionally matches \x0b and unicode spaces (testdata is ASCII).
SENT_BOUNDARY_NOLB = r"([.!?])[ \t\n\r\f]+"
_SENT_SEP = "\x1e"


def split_sentences(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """documents -> (doc_id, sent_idx, sentence) via the rule-based splitter.

    Sentences keep their terminal punctuation and drop the boundary
    whitespace, exactly like kernels.text.sentence_spans; a trailing empty
    fragment (text ending in punctuation+whitespace) is filtered, matching
    the kernel's ``start < len`` guard. NULL text yields no rows.

    Scale: narrow map (regexp_replace + split) + generator explode — no
    shuffle, no Python, stays inside whole-stage codegen.
    """
    arr = F.split(
        F.regexp_replace(F.col(text_col), SENT_BOUNDARY_NOLB,
                         "$1" + _SENT_SEP),
        _SENT_SEP)
    return (docs
            .select(F.col(id_col),
                    F.posexplode(arr).alias("sent_idx", "sentence"))
            .filter(F.col("sentence") != "")
            .select(id_col,
                    F.col("sent_idx").cast("long").alias("sent_idx"),
                    "sentence"))


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

    Cross-engine determinism (oracle-checked since r4): the rank orders by
    the 6-decimal-ROUNDED tfidf column — which the unranked oracle proves
    byte-identical across engines — then token ascending, so a pre-round
    last-ulp libm difference between near-tied (tf, df) combinations either
    collapses to an exact tie (broken by token, identically) or rounds to
    the same distinct values on both engines. The per-doc top-k window
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


def vocab_profile(tokens: DataFrame, token_col: str = "token") -> DataFrame:
    """One-row corpus vocabulary health profile -> (n_tokens, n_types,
    n_hapax, hapax_ratio, type_token_ratio, top1_share).

    The table_profile of the token layer: a web corpus whose
    type/token ratio collapses (template spam), whose hapax share spikes
    (OCR noise, encoding damage) or whose top-1 token share balloons
    (boilerplate) fails downstream tokenizer/LM training in ways
    document-level stats miss — these three ratios are the standard
    first-look quantities of corpus linguistics (Zipf/Herdan lineage).

    Scale: ONE (token)-keyed count agg (map-side combinable) + one
    global agg of its |V|-sized result. Ratios are single double
    divisions over exact BIGINT counts, rounded to 6.
    """
    freq = tokens.groupBy(token_col).agg(F.count(F.lit(1)).alias("n"))
    return (freq.agg(
        F.sum("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum((F.col("n") == 1).cast("long")).alias("n_hapax"),
        F.max("n").alias("_top1"))
        .select(F.col("n_tokens").cast("long").alias("n_tokens"),
                F.col("n_types").cast("long").alias("n_types"),
                F.col("n_hapax").cast("long").alias("n_hapax"),
                F.round(F.col("n_hapax").cast("double")
                        / F.col("n_types"), 6).alias("hapax_ratio"),
                F.round(F.col("n_types").cast("double")
                        / F.col("n_tokens"), 6).alias("type_token_ratio"),
                F.round(F.col("_top1").cast("double")
                        / F.col("n_tokens"), 6).alias("top1_share")))


def zipf_fit(tokens: DataFrame, token_col: str = "token") -> DataFrame:
    """Zipf's-law OLS fit over the token frequency spectrum.

    Ranks types by frequency (ties broken token-ASC so the rank is
    deterministic), then fits ln(freq) = intercept + slope * ln(rank) by
    closed-form least squares — the corpus-health diagnostic next to
    vocab_profile/gini_concentration (natural text sits near slope -1;
    template/boilerplate-heavy crawls flatten, spam sharpens).

    -> one row (n_types, slope, intercept, r2), floats rounded to 6.

    Scale shape: the type-frequency agg is the only corpus-sized shuffle;
    the rank window is global but VOCABULARY-bounded (the vocab_ids
    convention — types, not tokens), and the moment agg that follows is
    a single map-side-partial reduction to one row.
    """
    freqs = tokens.groupBy(token_col).agg(F.count(F.lit(1)).alias("freq"))
    w = Window.orderBy(F.desc("freq"), F.asc(token_col))
    xy = freqs.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"))
    agg = xy.agg(F.count(F.lit(1)).cast("double").alias("n"),
                 F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                 F.sum(F.col("x") * F.col("y")).alias("sxy"),
                 F.sum(F.col("x") * F.col("x")).alias("sxx"),
                 F.sum(F.col("y") * F.col("y")).alias("syy"))
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    # nullif-guarded denominators: a single-type or flat (all-freq-equal)
    # spectrum has zero variance on one axis — the fit is undefined, so
    # emit NULL rather than tripping the ANSI divide-by-zero error
    var_x = F.nullif(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"),
                     F.lit(0.0))
    var_y = F.nullif(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"),
                     F.lit(0.0))
    slope = cov_n / var_x
    return agg.select(
        F.col("n").cast("long").alias("n_types"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6)
        .alias("intercept"),
        F.round(cov_n * cov_n / (var_x * var_y), 6).alias("r2"))


def unigram_js_divergence(tokens: DataFrame, group_col: str,
                          group_a: str, group_b: str,
                          token_col: str = "token") -> DataFrame:
    """Jensen-Shannon divergence between two corpus slices' unigram
    distributions (Lin IEEE-IT 1991) — the bounded, symmetric
    distribution-drift diagnostic a data pipeline runs between crawl
    snapshots, sources, or before/after a filter change (DSIR measures
    per-document importance against a target; this measures whole-slice
    drift in one number, 0 = identical, ln 2 = disjoint).

    JSD(P||Q) = 0.5 KL(P||M) + 0.5 KL(Q||M), M = (P+Q)/2, natural log;
    zero counts contribute zero (0 ln 0 = 0 by continuity), so no
    smoothing constant can leak into the statistic.

    Scale shape: ONE corpus-sized (token) hash agg holding both slices'
    counts as conditional sums (map-side partials absorb the Zipf
    head); totals reduce to a broadcast 1-row join; the final
    contribution sum is a second reduced-side agg over the vocabulary
    table. No Python, no window.

    -> ONE row (n_tokens_a, n_tokens_b, n_types, jsd_nats 6dp).
    """
    g = F.col(group_col)
    counts = (tokens
              .filter(g.isin(group_a, group_b))
              .groupBy(token_col)
              .agg(F.sum(F.when(g == group_a, 1).otherwise(0))
                   .alias("ca"),
                   F.sum(F.when(g == group_b, 1).otherwise(0))
                   .alias("cb")))
    totals = counts.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    joined = counts.crossJoin(F.broadcast(totals))
    pa = F.col("ca") / F.col("na")
    pb = F.col("cb") / F.col("nb")
    m = (pa + pb) / 2
    term = (F.when(F.col("ca") > 0,
                   F.lit(0.5) * pa * F.log(pa / m)).otherwise(F.lit(0.0))
            + F.when(F.col("cb") > 0,
                     F.lit(0.5) * pb * F.log(pb / m)).otherwise(F.lit(0.0)))
    return (joined
            .agg(F.max("na").cast("long").alias("n_tokens_a"),
                 F.max("nb").cast("long").alias("n_tokens_b"),
                 F.count(F.lit(1)).cast("long").alias("n_types"),
                 F.round(F.sum(term), 6).alias("jsd_nats")))


def loglik_collocations(tokens: DataFrame, id_col: str = "doc_id",
                        pos_col: str = "pos", token_col: str = "token",
                        min_count: int = 5,
                        alpha_only: bool = True) -> DataFrame:
    """Dunning log-likelihood (G^2) bigram collocation scoring (Dunning,
    Computational Linguistics 1993) — THE classic significance test for
    "these two tokens occur together more than chance", robust at the
    low counts where PMI explodes (pmi_weights covers document-level
    entity pairs; this covers ADJACENT token pairs, the phrase-mining /
    multiword-expression primitive a vocab or tokenizer-training stage
    runs over a web corpus).

    For each adjacent bigram (w1, w2) the 2x2 contingency table against
    the rest of the corpus is

        O11 = c12          O12 = c1 - c12
        O21 = c2 - c12     O22 = N - c1 - c2 + c12

    with c1 = count(w1 as left), c2 = count(w2 as right), N = total
    bigrams; G^2 = 2 * sum O_ij * ln(O_ij / E_ij) with E_ij from the
    independence margins and 0 ln 0 = 0. All counts are exact integers
    computed distributively; the only floating step is the final ln on
    exact rationals, so 6dp rounding is engine-portable.

    alpha_only keeps purely alphabetic bigrams (collocations, not
    token+punctuation pairs). Returns ALL bigrams with c12 >= min_count
    (a row-set, not a top-k — no cross-engine tie-break risk).

    Scale shape: bigram formation is ONE window shuffle on doc_id
    (lead over pos); the three count aggs are partial+final hash aggs
    on bigram-/type-sized keys; marginals join back onto the collapsed
    bigram table by key (broadcast when small, shuffle-hash at web
    scale — no skew, the pair table is already distinct-collapsed);
    N is a 1-row broadcast. No Python, no global sort.

    -> (w1, w2, c12, c1, c2, g2 6dp), c12 >= min_count.
    """
    w = Window.partitionBy(id_col).orderBy(pos_col)
    big = (tokens
           .select(F.col(token_col).alias("w1"),
                   F.lead(token_col).over(w).alias("w2"))
           .filter(F.col("w2").isNotNull()))
    if alpha_only:
        big = big.filter(F.col("w1").rlike("^[A-Za-z]+$")
                         & F.col("w2").rlike("^[A-Za-z]+$"))
    big = big.localCheckpoint(eager=True)  # 3 consumers: c12, c1, c2, N
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    c2 = big.groupBy("w2").agg(F.count(F.lit(1)).alias("c2"))
    n = big.agg(F.count(F.lit(1)).alias("n"))
    j = (c12.filter(F.col("c12") >= min_count)
         .join(c1, "w1").join(c2, "w2")
         .crossJoin(F.broadcast(n)))

    def _term(o, e):
        return F.when(o > 0, o * F.log(o / e)).otherwise(F.lit(0.0))

    o11, o12 = F.col("c12"), F.col("c1") - F.col("c12")
    o21 = F.col("c2") - F.col("c12")
    o22 = F.col("n") - F.col("c1") - F.col("c2") + F.col("c12")
    e11 = F.col("c1") * F.col("c2") / F.col("n")
    e12 = F.col("c1") * (F.col("n") - F.col("c2")) / F.col("n")
    e21 = (F.col("n") - F.col("c1")) * F.col("c2") / F.col("n")
    e22 = (F.col("n") - F.col("c1")) * (F.col("n") - F.col("c2")) / F.col("n")
    g2 = 2 * (_term(o11, e11) + _term(o12, e12)
              + _term(o21, e21) + _term(o22, e22))
    return j.select("w1", "w2",
                    F.col("c12").cast("long").alias("c12"),
                    F.col("c1").cast("long").alias("c1"),
                    F.col("c2").cast("long").alias("c2"),
                    F.round(g2, 6).alias("g2"))


def logodds_keyness(tokens: DataFrame, group_col: str,
                    group_a: str, group_b: str,
                    token_col: str = "token",
                    alpha0: float = 100.0,
                    min_total: int = 20) -> DataFrame:
    """Monroe/Colaresi/Quinn "Fightin' Words" keyness (Monroe et al.,
    Political Analysis 2008): per-token log-odds-ratio between two
    corpus slices with an informative Dirichlet prior drawn from the
    POOLED corpus — the principled replacement for raw frequency-ratio
    keyword lists (which over-rank rare tokens) when diagnosing WHAT
    drifted between two crawls/sources (js_divergence says HOW MUCH in
    one number; this ranks the responsible tokens with z-scores).

    Prior: alpha_w = alpha0 * (ya_w + yb_w) / (n_a + n_b)  (so
    sum_w alpha_w = alpha0). Then

        delta_w = ln((ya_w + a_w) / (n_a + alpha0 - ya_w - a_w))
                - ln((yb_w + a_w) / (n_b + alpha0 - yb_w - a_w))
        var_w   = 1/(ya_w + a_w) + 1/(yb_w + a_w)
        z_w     = delta_w / sqrt(var_w)

    (paper eqs. 15-22, the standard approximation). Counts are exact
    integers; ln/sqrt on exact rationals -> 6dp round is portable.

    Scale shape: identical to unigram_js_divergence — ONE corpus-sized
    token agg with both slices as conditional sums, 1-row broadcast of
    totals, then a narrow map over the vocabulary table. min_total
    bounds the output to tokens with pooled count >= floor (row-set,
    not top-k).

    -> (token, ca, cb, delta 6dp, z 6dp).
    """
    g = F.col(group_col)
    counts = (tokens
              .filter(g.isin(group_a, group_b))
              .groupBy(token_col)
              .agg(F.sum(F.when(g == group_a, 1).otherwise(0)).alias("ca"),
                   F.sum(F.when(g == group_b, 1).otherwise(0)).alias("cb")))
    totals = counts.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    j = (counts.filter(F.col("ca") + F.col("cb") >= min_total)
         .crossJoin(F.broadcast(totals)))
    aw = F.lit(alpha0) * (F.col("ca") + F.col("cb")) \
        / (F.col("na") + F.col("nb"))
    delta = (F.log((F.col("ca") + aw)
                   / (F.col("na") + F.lit(alpha0) - F.col("ca") - aw))
             - F.log((F.col("cb") + aw)
                     / (F.col("nb") + F.lit(alpha0) - F.col("cb") - aw)))
    var = 1 / (F.col("ca") + aw) + 1 / (F.col("cb") + aw)
    return j.select(F.col(token_col),
                    F.col("ca").cast("long").alias("ca"),
                    F.col("cb").cast("long").alias("cb"),
                    F.round(delta, 6).alias("delta"),
                    F.round(delta / F.sqrt(var), 6).alias("z"))


def term_dispersion(tokens: DataFrame, part_col: str,
                    token_col: str = "token",
                    min_count: int = 10) -> DataFrame:
    """Gries' Deviation of Proportions (DP) term dispersion (Gries,
    IJCL 2008): how UNEVENLY a token spreads across corpus parts
    (sources/hosts/shards) —

        DP_w = 0.5 * sum_i | v_wi - s_i |

    with v_wi = the token's proportion of its own occurrences in part
    i and s_i = part i's share of all tokens. DP = 0 -> perfectly
    distributed like the corpus itself; -> 1 -> concentrated in one
    tiny part. THE burstiness/boilerplate flag keyness can't give
    (a template string has huge DP in the part that carries the
    template; a genuine content word tracks the part sizes).

    Parts the token never appears in contribute |0 - s_i| = s_i; since
    sum_i s_i = 1 the operator never materializes the (token x part)
    zero matrix:

        DP_w = 0.5 * (1 + sum_{i in observed(w)} (|v_wi - s_i| - s_i))

    — algebraically identical, computed only over OBSERVED pairs.
    Counts exact; the proportions are doubles on exact rationals ->
    6dp round is engine-portable.

    Scale shape: one (token, part) hash agg (map-side combine), one
    |parts|-row agg broadcast back, one token-level re-agg. The
    (token, part) table is the operator's natural size — never the
    zero-filled cross product.

    -> (token, n, dp 6dp) for tokens with n >= min_count.
    """
    tp = (tokens.groupBy(token_col, part_col)
          .agg(F.count(F.lit(1)).alias("c")))
    parts = (tp.groupBy(part_col).agg(F.sum("c").alias("part_n")))
    total = parts.agg(F.sum("part_n").alias("total_n"))
    sized = (parts.crossJoin(F.broadcast(total))
             .select(part_col,
                     (F.col("part_n") / F.col("total_n")).alias("s")))
    per_tok = (tp.join(F.broadcast(sized), part_col))
    tok_tot = (tp.groupBy(token_col).agg(F.sum("c").alias("n")))
    j = per_tok.join(tok_tot, token_col)
    v = F.col("c") / F.col("n")
    contrib = F.abs(v - F.col("s")) - F.col("s")
    return (j.groupBy(token_col)
            .agg(F.max("n").cast("long").alias("n"),
                 F.round(F.lit(0.5) * (1 + F.sum(contrib)), 6).alias("dp"))
            .filter(F.col("n") >= min_count)
            .select(token_col, "n", "dp"))


def heaps_fit(tokens: DataFrame, id_col: str = "doc_id",
              pos_col: str = "pos", token_col: str = "token",
              checkpoints: int = 10) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (Heaps 1978; Herdan 1960):
    OLS of ln V against ln n over ``checkpoints`` evenly spaced
    prefixes of the corpus token stream, estimating V(n) ~ K * n^beta
    — the capacity-planning complement of zipf_fit (Zipf: how mass
    concentrates; Heaps: how fast the VOCABULARY table grows as the
    crawl grows — what a 10x-bigger crawl does to embedding-matrix /
    vocab-shard sizing; chao1 asks the same question
    nonparametrically at one point).

    The stream order is deterministic: documents by id, tokens by
    position. V(n) = #{types whose FIRST occurrence index <= n};
    first-occurrence indices need a global token index, computed as
    per-doc offsets (a cumulative sum over the |docs|-row length
    table) plus the in-doc position — never a window over raw tokens.

    Counts are exact; ln/OLS on exact integers -> 6dp round.

    Scale shape: one token-level min-agg per type (map-side combine)
    + one |docs|-row cumulative window. The checkpoint evaluation
    joins the 10-row checkpoint spine against the |types|-row
    first-occurrence table (broadcast the spine); the OLS reduces 10
    rows. At 10^12 docs the |docs|-row running sum becomes the
    standard two-phase prefix sum (per-partition totals + offset
    join); everything else is unchanged.

    -> ONE row (n_tokens, n_types, beta 6dp, k_hat 6dp, r2 6dp).
    """
    lens = (tokens.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("len")))
    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    offsets = lens.select(
        id_col, F.coalesce(F.sum("len").over(w), F.lit(0)).alias("off"))
    idx = (tokens.join(offsets, id_col)
           .select(token_col,
                   (F.col("off") + F.col(pos_col) + 1).alias("idx")))
    first = idx.groupBy(token_col).agg(F.min("idx").alias("first_idx"))
    totals = idx.agg(F.max("idx").alias("n_tokens"))
    spine = (totals.select(
        F.explode(F.sequence(F.lit(1), F.lit(checkpoints))).alias("j"),
        "n_tokens")
        .select("j", "n_tokens",
                F.floor(F.col("j") * F.col("n_tokens") / checkpoints)
                .alias("n_c")))
    growth = (first.crossJoin(F.broadcast(spine))
              .filter(F.col("first_idx") <= F.col("n_c"))
              .groupBy("j", "n_c", "n_tokens")
              .agg(F.count(F.lit(1)).alias("v_c")))
    pts = growth.select(
        "n_tokens",
        F.log(F.col("n_c").cast("double")).alias("x"),
        F.log(F.col("v_c").cast("double")).alias("y"))
    ols = pts.agg(
        F.max("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    n_types = first.agg(F.count(F.lit(1)).alias("n_types"))
    kk = F.col("k")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / kk
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / kk
    vary = F.col("syy") - F.col("sy") * F.col("sy") / kk
    beta = cov / varx
    alpha = F.col("sy") / kk - beta * F.col("sx") / kk
    # try_divide: a degenerate corpus (single type, or fewer tokens than
    # checkpoints) has zero x- or y-variance -> NULL, not an ANSI crash
    return (ols.crossJoin(F.broadcast(n_types))
            .select(F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("n_types").cast("long").alias("n_types"),
                    F.round(F.try_divide(cov, varx), 6).alias("beta"),
                    F.round(F.exp(F.col("sy") / kk
                                  - F.try_divide(cov, varx)
                                  * F.col("sx") / kk), 6).alias("k_hat"),
                    F.round(F.try_divide(cov * cov, varx * vary), 6)
                    .alias("r2")))


def s_stem(col):
    """Harman's S-stemmer (Harman, JASIS 1991 "How effective is
    suffixing?") as a pure codegen expression — the three-rule,
    first-match-wins English plural conflation that removes most
    plural variance with near-zero overstemming risk (the reason
    Harman found it as effective as Porter for retrieval):

        1. -ies -> -y   unless ending -eies / -aies
        2. -es  -> -e   unless ending -aes / -ees / -oes
        3. -s   -> ''   unless ending -us / -ss

    Applied to already-tokenized surfaces; case-sensitive (tokens
    here preserve case; lowercase upstream for case-folded
    conflation). A deterministic scalar expression — no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    # the suffix selects the rule; an exception TERMINATES (leaves the
    # word unchanged) — it does not fall through to the next rule
    return (
        F.when(c.endswith("ies"),
               F.when(c.endswith("eies") | c.endswith("aies"), c)
               .otherwise(F.concat(F.substring(c, 1, F.length(c) - 3),
                                   F.lit("y"))))
        .when(c.endswith("es"),
              F.when(c.endswith("aes") | c.endswith("ees")
                     | c.endswith("oes"), c)
              .otherwise(F.substring(c, 1, F.length(c) - 1)))
        .when(c.endswith("s"),
              F.when(c.endswith("us") | c.endswith("ss"), c)
              .otherwise(F.substring(c, 1, F.length(c) - 1)))
        .otherwise(c))


def stem_collapse(tokens: DataFrame, token_col: str = "token",
                  min_variants: int = 2) -> DataFrame:
    """Vocabulary conflation audit for the S-stemmer: every stem class
    that MERGES >= min_variants distinct surface types, with its
    token mass — what a stemmed index/vocab actually buys (and the
    review surface for overstemming: a class merging unrelated
    surfaces is a precision bug).

    Scale shape: the stem is a narrow map; ONE (stem, token) distinct
    agg then ONE stem agg (both map-side combining). Row-set output
    (no top-k).

    -> (stem, n_variants, n_tokens), n_variants >= min_variants;
    variants = distinct surface forms in the class.
    """
    stemmed = tokens.select(F.col(token_col).alias("tok"),
                            s_stem(token_col).alias("stem"))
    per_type = (stemmed.groupBy("stem", "tok")
                .agg(F.count(F.lit(1)).alias("c")))
    return (per_type.groupBy("stem")
            .agg(F.count(F.lit(1)).cast("long").alias("n_variants"),
                 F.sum("c").cast("long").alias("n_tokens"))
            .filter(F.col("n_variants") >= min_variants))


def ppmi_similarity(tokens: DataFrame, id_col: str = "doc_id",
                    pos_col: str = "pos", token_col: str = "token",
                    window: int = 2, min_pair: int = 3,
                    min_shared: int = 3) -> DataFrame:
    """Count-based distributional similarity via PPMI vectors (Church
    & Hanks 1990 for PMI; Levy & Goldberg NeurIPS 2014 for the
    PPMI-SGNS equivalence): tokens are represented by their positive-
    PMI association with +-window context tokens, and pairs are scored
    by the cosine of those sparse vectors — "count-based word2vec",
    the embedding-free similarity that needs no training and feeds
    synonym candidates to entity linking / query expansion
    (skipgram_pairs materializes the training pairs; this CONSUMES
    the same statistics directly).

        ppmi(w, c) = max(0, ln(c_wc * N / (c_w * c_c)))
        sim(a, b)  = sum_c ppmi(a,c) ppmi(b,c) / (||a|| ||b||)

    Scale shape: context pairs come from 2*window lead/lag columns on
    ONE (doc, pos) window — never a positional self-join; the (w, c)
    agg collapses map-side (Zipf head absorbed); marginals join back
    by key; the similarity join co-partitions on the CONTEXT key and
    is bounded per context by its vector support (hub contexts =
    stopwords — min_pair floors them out of the vectors first).
    Canonical a < b order; exact integer counts under the logs.

    -> (a, b, n_shared, cosine 6dp), shared contexts >= min_shared.
    """
    w = Window.partitionBy(id_col).orderBy(pos_col)
    t = F.col(token_col)
    ctx_cols = []
    for k in range(1, window + 1):
        ctx_cols.append(F.lead(t, k).over(w))
        ctx_cols.append(F.lag(t, k).over(w))
    pairs = (tokens
             .select(t.alias("w"), F.array(*ctx_cols).alias("cs"))
             .select("w", F.explode("cs").alias("c"))
             .filter(F.col("c").isNotNull()))
    wc = (pairs.groupBy("w", "c").agg(F.count(F.lit(1)).alias("cwc"))
          .filter(F.col("cwc") >= min_pair))
    cw = wc.groupBy("w").agg(F.sum("cwc").alias("cw"))
    cc = wc.groupBy("c").agg(F.sum("cwc").alias("cc"))
    n = wc.agg(F.sum("cwc").alias("n"))
    ppmi = (wc.join(cw, "w").join(cc, "c")
            .crossJoin(F.broadcast(n))
            .select("w", "c",
                    F.greatest(
                        F.log(F.col("cwc") * F.col("n")
                              / (F.col("cw") * F.col("cc"))),
                        F.lit(0.0)).alias("p"))
            .filter(F.col("p") > 0)
            .localCheckpoint(eager=True))  # reused: norms + dot join
    norms = ppmi.groupBy("w").agg(
        F.sqrt(F.sum(F.col("p") * F.col("p"))).alias("nrm"))
    a = ppmi.select(F.col("w").alias("a"), "c", F.col("p").alias("pa"))
    b = ppmi.select(F.col("w").alias("b"), "c", F.col("p").alias("pb"))
    dots = (a.join(b, "c")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n_shared"),
                 F.sum(F.col("pa") * F.col("pb")).alias("dot"))
            .filter(F.col("n_shared") >= min_shared))
    return (dots
            .join(F.broadcast(norms.select(F.col("w").alias("a"),
                                           F.col("nrm").alias("na"))),
                  "a")
            .join(F.broadcast(norms.select(F.col("w").alias("b"),
                                           F.col("nrm").alias("nb"))),
                  "b")
            .select("a", "b",
                    F.col("n_shared").cast("long").alias("n_shared"),
                    F.round(F.col("dot") / (F.col("na") * F.col("nb")),
                            6).alias("cosine")))


def token_adaptation(tokens: DataFrame, id_col: str = "doc_id",
                     token_col: str = "token",
                     min_df: int = 10) -> DataFrame:
    """Church's adaptation statistic (Church, EMNLP 2000 "Empirical
    estimates of adaptation: the chance of two Noriegas is closer to
    p/2 than p^2"): for each token,

        prior      = df1 / N          (P(token appears in a doc))
        adaptation = df2 / df1        (P(appears AGAIN | appeared))
        lift       = adaptation / prior

    where df1/df2 = docs with >= 1 / >= 2 occurrences. Under
    independence adaptation ~ prior; real content words adapt
    (lift >> 1, "two Noriegas") while function words don't — the
    document-level burstiness twin of term_dispersion's corpus-part
    view, and the statistical basis for cache/trigger LMs and tf
    saturation in BM25.

    Scale shape: one (doc, token) count agg, one token-level agg over
    it, a 1-row broadcast of N — the standard two-level reduction,
    all map-side combining.

    -> (token, df1, df2, prior 6dp, adaptation 6dp, lift 6dp),
    df1 >= min_df.
    """
    dt = (tokens.groupBy(id_col, token_col)
          .agg(F.count(F.lit(1)).alias("c")))
    n_docs = tokens.select(id_col).distinct() \
        .agg(F.count(F.lit(1)).alias("n"))
    per_tok = (dt.groupBy(token_col)
               .agg(F.count(F.lit(1)).alias("df1"),
                    F.sum((F.col("c") >= 2).cast("long")).alias("df2"))
               .filter(F.col("df1") >= min_df))
    prior = F.col("df1") / F.col("n")
    adapt = F.col("df2") / F.col("df1")
    return (per_tok.crossJoin(F.broadcast(n_docs))
            .select(token_col,
                    F.col("df1").cast("long").alias("df1"),
                    F.col("df2").cast("long").alias("df2"),
                    F.round(prior, 6).alias("prior"),
                    F.round(adapt, 6).alias("adaptation"),
                    F.round(F.try_divide(adapt, prior), 6)
                    .alias("lift")))
