"""Training-sample preparation: T5-style span corruption and word2vec
skip-gram pairs with deterministic negative sampling.

The step between a curated corpus and a training loop: denoising
objectives (T5/UL2) need (input, target) pairs with masked spans
replaced by sentinels; embedding training (word2vec SGNS, and the
reference's own embedding bootstrap — saber/utils/data_utils.py loads
pre-trained word2vec) needs (center, context, label) pairs with k
negatives per positive. Both are deterministic here — hash-derived
masking/negatives — so a 10^12-doc run is reproducible and
engine-portable (the stratified_sample convention: no RNG state to
coordinate across executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from saber_spark.operators.splits import HASH_MOD, KNUTH


def span_corruption(tokens: DataFrame, span_len: int = 3,
                    mask_denom: int = 7, id_col: str = "doc_id",
                    pos_col: str = "pos",
                    token_col: str = "token") -> DataFrame:
    """(doc_id, pos, token) -> (doc_id, n_tokens, n_masked, input_text,
    target_text): the T5 denoising objective (Raffel et al. 2020).

    Documents are cut into fixed ``span_len`` token blocks; a block is
    masked iff hash(doc_id, block) % mask_denom == 0 (expected
    corruption rate = 1/mask_denom; blocks are non-overlapping by
    construction, unlike iid position sampling which must merge
    adjacent spans). The input replaces each masked block with
    ``<extra_id_k>`` (k = 0-based order of the block within the doc);
    the target is the concatenation of sentinel + masked tokens per
    block. Docs with no masked block keep input_text = original and
    target_text = '' (defined, not NULL — the mixture_weights
    convention; no final closing sentinel is emitted, documented
    simplification).

    Scale shape: the mask decision is per-row arithmetic on
    (doc_id, pos div span_len) using the splits.py portable hash; the
    sentinel index is ONE window over the doc's masked blocks (state
    bounded by doc length); both texts reassemble with the
    scrub_dup_spans ordered-collect pattern — one shuffle on doc_id,
    per-doc memory bounded by the doc itself.
    """
    block = (F.col(pos_col).cast("long") / span_len).cast("long")
    h = F.pmod(F.pmod(F.col(id_col).cast("long") * F.lit(KNUTH),
                      F.lit(HASH_MOD)) * 31 + F.col("block"),
               F.lit(HASH_MOD))
    toks = (tokens
            .select(id_col, pos_col, token_col, block.alias("block"))
            .withColumn("masked", F.pmod(h, F.lit(mask_denom)) == 0))
    blocks = (toks.filter("masked")
              .groupBy(id_col, "block")
              .agg(F.min(pos_col).alias("bpos")))
    wk = Window.partitionBy(id_col).orderBy("block")
    blocks = blocks.withColumn(
        "sentinel",
        F.concat(F.lit("<extra_id_"),
                 (F.row_number().over(wk) - 1).cast("string"), F.lit(">")))

    def _assemble(rows, out_col):
        return (rows.groupBy(id_col)
                .agg(F.array_join(F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("spos", "flag", "tok"))),
                    lambda s: s.tok), " ").alias(out_col)))

    keep = toks.filter(~F.col("masked")).select(
        id_col, F.col(pos_col).alias("spos"), F.lit(1).alias("flag"),
        F.col(token_col).alias("tok"))
    sent_in = blocks.select(
        id_col, F.col("bpos").alias("spos"), F.lit(0).alias("flag"),
        F.col("sentinel").alias("tok"))
    inp = _assemble(keep.unionByName(sent_in), "input_text")

    masked_toks = (toks.filter("masked")
                   .join(blocks.select(id_col, "block", "sentinel"),
                         [id_col, "block"])
                   .select(id_col, F.col(pos_col).alias("spos"),
                           F.lit(1).alias("flag"),
                           F.col(token_col).alias("tok")))
    sent_tgt = blocks.select(
        id_col, F.col("bpos").alias("spos"), F.lit(0).alias("flag"),
        F.col("sentinel").alias("tok"))
    tgt = _assemble(masked_toks.unionByName(sent_tgt), "target_text")

    stats = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("masked").cast("long")).alias("n_masked"))
    return (stats
            .join(inp, id_col, "left")
            .join(tgt, id_col, "left")
            .select(id_col, "n_tokens", "n_masked",
                    F.coalesce("input_text", F.lit("")).alias("input_text"),
                    F.coalesce("target_text", F.lit(""))
                    .alias("target_text")))


def skipgram_pairs(tokens: DataFrame, window: int = 2, neg_k: int = 2,
                   id_col: str = "doc_id", pos_col: str = "pos",
                   token_col: str = "token") -> DataFrame:
    """(doc_id, pos, token) -> (doc_id, pos, center, context, label):
    word2vec skip-gram-with-negative-sampling training pairs (Mikolov
    et al. 2013), deterministic.

    Positives (label=1): both directions of every token pair within
    ``window`` positions. Negatives (label=0): ``neg_k`` per positive,
    the context replaced by the vocab token at index
    md5(doc:pos:dist:dir:j) % V — the DSIR portable hash family, so a
    rerun (or another engine) derives the identical sample. Hash
    negatives may occasionally collide with the true context — the same
    label noise the standard unigram-table sampler carries; documented,
    not hidden. ``pos`` is the CENTER token's position.

    Scale shape: all lead distances come from ONE window projection
    over the tokens table's natural (doc_id, pos) sort (the textrank
    pair contract); negatives explode by the constant factor neg_k and
    resolve through a BROADCAST join against the vocab id table
    (vocab-bounded, never corpus-bounded). No shuffle wider than the
    tokens table's own key anywhere.
    """
    w = Window.partitionBy(id_col).orderBy(pos_col)
    led = tokens.select(
        F.col(id_col), F.col(pos_col).cast("long").alias("cpos"),
        F.col(token_col).alias("tok"),
        *[F.lead(token_col, d).over(w).alias(f"n{d}")
          for d in range(1, window + 1)])
    # ONE pass (r6): all 2*window directions explode from one struct
    # array (the textrank pair contract), and positives ride the SAME
    # row stream as their negatives via a second explode over
    # j = 0..neg_k with j=0 the positive — the former shape referenced
    # the window-lead subtree once per (direction, distance) leg AND
    # once more for the negatives' re-derivation: 8 WindowExec
    # evaluations of the tokens table collapsed to 1, no checkpoint
    # needed because nothing is referenced twice.
    structs = []
    for d in range(1, window + 1):
        structs.append(F.struct(
            F.col("cpos").alias("pos"), F.col("tok").alias("center"),
            F.col(f"n{d}").alias("context"),
            F.lit(d).alias("dist"), F.lit(0).alias("dir")))
        structs.append(F.struct(
            (F.col("cpos") + d).alias("pos"),
            F.col(f"n{d}").alias("center"), F.col("tok").alias("context"),
            F.lit(d).alias("dist"), F.lit(1).alias("dir")))
    pairs = (led.select(id_col, F.explode(F.array(*structs)).alias("p"))
             .select(id_col, "p.pos", "p.center", "p.context",
                     "p.dist", "p.dir")
             .filter(F.col("center").isNotNull()
                     & F.col("context").isNotNull()))
    vocab = (tokens.select(F.col(token_col).alias("neg_context"))
             .distinct()
             .select("neg_context",
                     (F.row_number().over(Window.orderBy("neg_context")))
                     .cast("long").alias("vid")))
    # vocab size rides in as a broadcast 1-row aggregate (the bm25
    # stats convention) — no driver action, one lazy plan end-to-end
    vsize = vocab.agg(F.count(F.lit(1)).alias("n_vocab"))
    neg_id = (F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col(id_col).cast("string"), F.col("pos").cast("string"),
        F.col("dist").cast("string"), F.col("dir").cast("string"),
        F.col("j").cast("string"))), 1, 8), 16, 10).cast("long")
        % F.col("n_vocab") + 1)
    return (pairs
            .select(id_col, "pos", "center", "context", "dist", "dir",
                    F.explode(F.sequence(F.lit(0), F.lit(neg_k)))
                    .alias("j"))
            .crossJoin(F.broadcast(vsize))
            .select(id_col, "pos", "center", "context", "j",
                    F.when(F.col("j") > 0, neg_id).alias("vid"))
            .join(F.broadcast(vocab), "vid", "left")
            .select(id_col, "pos", "center",
                    F.when(F.col("j") == 0, F.col("context"))
                    .otherwise(F.col("neg_context")).alias("context"),
                    F.when(F.col("j") == 0, F.lit(1)).otherwise(F.lit(0))
                    .alias("label")))


def kge_negatives(triples: DataFrame, neg_k: int = 2,
                  subj_col: str = "subj", pred_col: str = "pred",
                  obj_col: str = "obj") -> DataFrame:
    """Deduplicated (subj, pred, obj) triples -> (subj, pred, obj, label):
    knowledge-graph-embedding training pairs with ``neg_k`` FILTERED
    negatives per positive (Bordes et al. 2013, TransE).

    Negative j corrupts the tail if md5(s:p:o:j) is even, else the head
    (the Bernoulli-style side pick, deterministic), replacing it with
    the entity at index md5(s:p:o:j:e) % |E| — and the corrupted triple
    is then ANTI-JOINED against the positive set, the "filtered"
    evaluation convention: a sampled corruption that happens to be a
    TRUE triple is dropped, never mislabeled. Corruptions that
    reproduce the original entity are also dropped by the same
    anti-join. So per positive: exactly neg_k candidates, minus
    collisions — count visible per triple downstream.

    Scale shape: the entity table is |E|-bounded (broadcast, with its
    size as a broadcast 1-row aggregate — the skipgram_pairs contract);
    negatives explode by the constant neg_k; the filter is ONE
    left-anti equi-join on the triple key. Determinism = reproducible
    10^12-triple epochs with no RNG coordination.
    """
    pos = triples.select(F.col(subj_col).alias("subj"),
                         F.col(pred_col).alias("pred"),
                         F.col(obj_col).alias("obj"))
    ents = (pos.select(F.col("subj").alias("e"))
            .unionByName(pos.select(F.col("obj").alias("e")))
            .distinct()
            .select("e", F.row_number().over(Window.orderBy("e"))
                    .cast("long").alias("vid")))
    esize = ents.agg(F.count(F.lit(1)).alias("n_ents"))
    base = pos.select(
        "subj", "pred", "obj",
        F.explode(F.sequence(F.lit(1), F.lit(neg_k))).alias("j"))
    key = F.concat_ws(":", "subj", "pred", "obj", F.col("j").cast("string"))
    side_hash = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    ent_hash = F.conv(F.substring(F.md5(F.concat_ws(":", key, F.lit("e"))),
                                  1, 8), 16, 10).cast("long")
    corrupted = (base
                 .crossJoin(F.broadcast(esize))
                 .select("subj", "pred", "obj",
                         (side_hash % 2 == 0).alias("corrupt_tail"),
                         (ent_hash % F.col("n_ents") + 1).alias("vid"))
                 .join(F.broadcast(ents), "vid")
                 .select(
                     F.when(F.col("corrupt_tail"), F.col("subj"))
                     .otherwise(F.col("e")).alias("subj"),
                     F.col("pred"),
                     F.when(F.col("corrupt_tail"), F.col("e"))
                     .otherwise(F.col("obj")).alias("obj")))
    negs = (corrupted.join(pos, ["subj", "pred", "obj"], "left_anti")
            .select("subj", "pred", "obj", F.lit(0).alias("label")))
    return (pos.select("subj", "pred", "obj", F.lit(1).alias("label"))
            .unionByName(negs))


def horvitz_thompson(df: DataFrame, id_col: str, value_col: str,
                     strata_probs: dict[str, float],
                     strata_col: str) -> DataFrame:
    """Horvitz-Thompson total estimation from an unequal-probability
    sample (Horvitz & Thompson, JASA 1952): each stratum is sampled
    at its own KNOWN inclusion probability (deterministic
    multiplicative-hash thinning — the repo's portable sampling
    primitive), and the population total is estimated as

        T_hat = sum over sampled rows of y_i / pi_i

    — the design-unbiased estimator behind every "measure the corpus
    from a 1% sample" job: quality metrics, token totals, PII rates
    can be estimated WITHOUT the full scan's cost as long as pi_i is
    known and positive. The operator also reports the true total (at
    test scale the full data is available) and the relative error, so
    the estimator's calibration is itself driver-checked.

    Scale shape: the sample filter is a narrow hash map; one
    conditional-sum agg produces sampled and true totals in the SAME
    pass (at production scale run the true-total leg only on audit
    runs). No joins.

    -> ONE row (n_total, n_sampled, t_true, t_hat 6dp, rel_err 6dp).
    """
    h = F.pmod(F.col(id_col).cast("long") * F.lit(KNUTH),
               F.lit(HASH_MOD)) / F.lit(HASH_MOD)
    pi = F.lit(1.0)  # strata without a declared prob are fully sampled
    for s, p in sorted(strata_probs.items()):
        pi = F.when(F.col(strata_col) == s, F.lit(p)).otherwise(pi)
    sampled = h < pi
    y = F.col(value_col)
    agg = df.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(sampled.cast("long")).alias("n_sampled"),
        F.sum(y).alias("t_true"),
        F.sum(F.when(sampled, y / pi)).alias("t_hat"))
    return agg.select(
        F.col("n_total").cast("long").alias("n_total"),
        F.col("n_sampled").cast("long").alias("n_sampled"),
        F.col("t_true").cast("long").alias("t_true"),
        F.round("t_hat", 6).alias("t_hat"),
        F.round(F.abs(F.col("t_hat") - F.col("t_true"))
                / F.col("t_true"), 6).alias("rel_err"))


def neyman_allocation(df: DataFrame, strata_col: str, value_col: str,
                      budget: int) -> DataFrame:
    """Neyman optimal allocation of a sampling budget across strata
    (Neyman, JRSS 1934): for a fixed total sample size n, the
    variance-minimizing allocation is

        n_h = n * N_h S_h / sum_k N_k S_k

    (stratum size times stratum standard deviation) — the design
    table an eval/labeling pipeline computes BEFORE drawing its
    sample: high-variance strata (mixed-quality sources) get more
    budget than proportional allocation would give, uniform strata
    less. Reported next to proportional allocation so the difference
    is visible. Population SD from exact sum/sumsq.

    Scale shape: one stratum-keyed agg (map-side combine), then
    |strata|-row arithmetic with a 1-row broadcast of the
    normalizer. Fractional allocations are reported raw (6dp) —
    rounding to integers is the caller's policy choice.

    -> (stratum, n_rows, sd 6dp, alloc_neyman 6dp, alloc_prop 6dp).
    """
    y = F.col(value_col)
    g = (df.groupBy(F.col(strata_col).alias("stratum"))
         .agg(F.count(F.lit(1)).alias("nh"),
              F.sum(y).alias("s1"),
              F.sum(y * y).alias("s2")))
    sd = F.sqrt(F.greatest(
        F.col("s2") / F.col("nh")
        - (F.col("s1") / F.col("nh")) * (F.col("s1") / F.col("nh")),
        F.lit(0.0)))
    scored = g.select("stratum", "nh", sd.alias("sd"),
                      (F.col("nh") * sd).alias("w"))
    tot = scored.agg(F.sum("w").alias("sw"), F.sum("nh").alias("n"))
    return (scored.crossJoin(F.broadcast(tot))
            .select("stratum",
                    F.col("nh").cast("long").alias("n_rows"),
                    F.round("sd", 6).alias("sd"),
                    F.round(F.lit(budget) * F.col("w") / F.col("sw"), 6)
                    .alias("alloc_neyman"),
                    F.round(F.lit(budget) * F.col("nh") / F.col("n"), 6)
                    .alias("alloc_prop")))


def jackknife_mean(df: DataFrame, group_col: str,
                   value_col: str) -> DataFrame:
    """Delete-one-GROUP jackknife variance of the corpus mean
    (Quenouille 1956; Tukey 1958; the grouped form is the survey-
    sampling standard for clustered data): leave each group (source/
    host/shard) out in turn, recompute the mean, and estimate

        var_jack = (g - 1)/g * sum_i (theta_(i) - theta_bar_.)^2

    — the DETERMINISTIC resampling error bar (no RNG, engine-portable
    by construction) that respects cluster structure: documents
    within a host are correlated, so the naive sd/sqrt(n) understates
    the error, sometimes wildly. THE honest uncertainty for any
    corpus-level metric reported off clustered web data.

    Scale shape: one group agg; every leave-one-out mean is computed
    from the GROUP TABLE and the 1-row grand totals (never a second
    data pass); the variance reduces |groups| rows.

    -> ONE row (n_rows, n_groups, mean 6dp, se_jack 6dp,
    se_naive 6dp).
    """
    y = F.col(value_col)
    g = (df.groupBy(group_col)
         .agg(F.count(F.lit(1)).alias("nh"),
              F.sum(y).alias("sh"),
              F.sum(y * y).alias("qh")))
    tot = g.agg(F.sum("nh").alias("n"), F.sum("sh").alias("s"),
                F.sum("qh").alias("q"),
                F.count(F.lit(1)).alias("ng"))
    j = g.crossJoin(F.broadcast(tot))
    loo = ((F.col("s") - F.col("sh"))
           / (F.col("n") - F.col("nh"))).alias("theta_i")
    loos = j.select(loo, "n", "s", "q", "ng")
    agg = loos.agg(
        F.max("n").alias("n"), F.max("ng").alias("ng"),
        F.max("s").alias("s"), F.max("q").alias("q"),
        F.avg("theta_i").alias("tbar"),
        F.sum(F.col("theta_i") * F.col("theta_i")).alias("t2"))
    gg = F.col("ng")
    var_jack = (gg - 1) / gg * (F.col("t2")
                                - gg * F.col("tbar") * F.col("tbar"))
    mean = F.col("s") / F.col("n")
    var_pop = F.col("q") / F.col("n") - mean * mean
    return agg.select(
        F.col("n").cast("long").alias("n_rows"),
        gg.cast("long").alias("n_groups"),
        F.round(mean, 6).alias("mean"),
        F.round(F.sqrt(F.greatest(var_jack, F.lit(0.0))), 6)
        .alias("se_jack"),
        F.round(F.sqrt(var_pop / F.col("n")), 6).alias("se_naive"))
