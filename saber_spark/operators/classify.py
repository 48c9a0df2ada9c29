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

import math

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


def nb_fit(tokens: DataFrame, doc_labels: DataFrame,
           id_col: str = "doc_id", tok_col: str = "token",
           label_col: str = "label"
           ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Multinomial Naive Bayes sufficient statistics from a token stream
    plus per-doc labels -> (model, label_stats, sizes).

    The token-side sibling of centroid_fit and the classic fastText-era
    corpus-quality / language classifier (CCNet and the GPT-3 appendix A
    filter are linear classifiers of exactly this complexity class). All
    three outputs are EXACT INTEGER count tables, so the model is
    engine-portable and mergeable across corpus shards (sums add):

      model       (label, token, c_wt)    per-class token counts
      label_stats (label, n_docs, c_total) doc prior + token mass
      sizes       1 row (n_train_docs, v)  corpus size + vocab size

    Scale shape: one hash agg per table — (label, token) keyed with
    map-side combine absorbing Zipf head skew, then algebraic rollups.
    Nothing is collected to the driver; the reference trains one
    in-memory Keras model per process (saber/train_utils.py), this is
    the distributed-counting replacement.
    """
    tt = (tokens.select(id_col, tok_col)
          .join(doc_labels.select(id_col, label_col), id_col))
    model = (tt.groupBy(label_col, tok_col)
             .agg(F.count(F.lit(1)).alias("c_wt")))
    label_stats = (model.groupBy(label_col)
                   .agg(F.sum("c_wt").alias("c_total"))
                   .join(doc_labels.groupBy(label_col)
                         .agg(F.count(F.lit(1)).alias("n_docs")),
                         label_col)
                   .select(label_col, "n_docs", "c_total"))
    sizes = (tt.agg(F.count_distinct(id_col).alias("n_train_docs"),
                    F.count_distinct(tok_col).alias("v")))
    return model, label_stats, sizes


def nb_predict(tokens: DataFrame, model: DataFrame,
               label_stats: DataFrame, sizes: DataFrame,
               add_k: float = 0.5, id_col: str = "doc_id",
               tok_col: str = "token",
               label_col: str = "label") -> DataFrame:
    """Score a token stream under an nb_fit model -> (doc_id,
    pred_label, score): argmax over labels of

      ln(n_docs_L / N) + sum_t tf_t * ln((c_Lt + k) / (c_L + kV))

    decomposed so UNSEEN tokens never need a (token x label) expansion:
    the per-label base ln(k / (c_L + kV)) applies to ALL T_d tokens via
    one small cross join, and only MATCHED (token, label) pairs add the
    correction tf * (ln(c_Lt + k) - ln(k)) through one inner equi-join
    against the model. Scores round to 6dp before the argmax (the
    textrank ranking convention); ties break label ASC.

    Scale shape: tf and doc-length aggs are doc-keyed; the correction
    join is token-keyed (model broadcast at dictionary scale,
    shuffle-join with AQE skew handling once the vocabulary exceeds
    broadcast range — the lm_cross_entropy note); the label cross join
    multiplies rows only by the label count (bounded, e.g. languages).
    """
    lnk = float(math.log(add_k))
    tf = (tokens.select(id_col, tok_col)
          .groupBy(id_col, tok_col)
          .agg(F.count(F.lit(1)).alias("tf")))
    doclen = tf.groupBy(id_col).agg(F.sum("tf").alias("t_total"))
    mod = model.withColumnRenamed(label_col, "_l")
    corr = (tf.join(mod, tok_col)
            .groupBy(id_col, "_l")
            .agg(F.sum(F.col("tf")
                       * (F.ln(F.col("c_wt") + F.lit(float(add_k)))
                          - F.lit(lnk))).alias("corr")))
    # per-label constants: prior + the all-tokens-unseen base rate
    consts = (label_stats.withColumnRenamed(label_col, "_l")
              .crossJoin(F.broadcast(sizes))
              .select(
                  "_l",
                  (F.ln(F.col("n_docs"))
                   - F.ln(F.col("n_train_docs"))).alias("prior"),
                  (F.lit(lnk)
                   - F.ln(F.col("c_total")
                          + F.lit(float(add_k))
                          * F.greatest(F.col("v"), F.lit(1))))
                  .alias("base")))
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(),
                                           F.col("_l").asc())
    return (doclen.crossJoin(F.broadcast(consts))
            .join(corr, [id_col, "_l"], "left")
            .withColumn(
                "score",
                F.round(F.col("prior")
                        + F.col("t_total") * F.col("base")
                        + F.coalesce(F.col("corr"), F.lit(0.0)), 6))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(id_col, F.col("_l").alias("pred_label"), "score"))


def nb_confusion(tokens: DataFrame, doc_labels: DataFrame,
                 parts: int = 2, add_k: float = 0.5,
                 id_col: str = "doc_id", tok_col: str = "token",
                 label_col: str = "label") -> DataFrame:
    """Held-out NB evaluation on the repo's deterministic hash split:
    fit on hash-parts != 0, score part 0 -> (true_label, pred_label,
    n_docs) confusion counts (the centroid_confusion contract for the
    token-side classifier)."""
    from saber_spark.operators.lm import train_split

    labeled = train_split(doc_labels, id_col, parts)
    train_ids = labeled.filter(F.col("part") != 0).drop("part")
    test_ids = labeled.filter(F.col("part") == 0).drop("part")
    tok_train = tokens.join(train_ids.select(id_col), id_col, "left_semi")
    tok_test = tokens.join(test_ids.select(id_col), id_col, "left_semi")
    model, stats, sizes = nb_fit(tok_train, train_ids,
                                 id_col, tok_col, label_col)
    preds = nb_predict(tok_test, model, stats, sizes, add_k,
                       id_col, tok_col, label_col)
    return (preds.join(test_ids.select(
                id_col, F.col(label_col).alias("true_label")), id_col)
            .groupBy("true_label", "pred_label")
            .agg(F.count(F.lit(1)).alias("n_docs")))


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
    n_docs is counted per ENTITY on the pre-explosion (entity, doc)
    table and joined onto the |E| x dims result — a count_distinct per
    (entity, dim) would recompute the same number dims times through a
    distinct-expand of the largest intermediate (the dim-exploded
    join), the one shape this plan exists to avoid.
    """
    ent_docs = (linked.select(F.col(ent_col).alias("entity"),
                              F.col(doc_col).alias("d"))
                .distinct())
    # only docs that actually carry an embedding count toward n_docs
    # (identical to the old per-(entity, dim) count_distinct semantics)
    n_docs = (ent_docs
              .join(embeddings.select(F.col(id_col).alias("d")).distinct(),
                    "d", "left_semi")
              .groupBy("entity")
              .agg(F.count(F.lit(1)).alias("n_docs")))
    dims = _quantized_dims(
        embeddings.select(F.col(id_col).alias("d"), vec_col),
        "d", vec_col)
    return (ent_docs.join(dims, "d")
            .groupBy("entity", "dim")
            .agg(F.sum("qv").alias("csum"))
            .join(n_docs, "entity")
            .select(F.col("entity").alias(ent_col), "dim", "csum",
                    "n_docs"))


# fastText-style hashed-feature linear scorer: buckets, weights and the
# decision rule are pure integer arithmetic so any engine reproduces the
# scores bit-exactly (the md5/Knuth portability convention).
HASHED_DIM = 1024
HASHED_WEIGHT_MULT = 2654435761   # Knuth multiplicative constant
HASHED_WEIGHT_MOD = 1000003
HASHED_WEIGHT_RANGE = 17          # weights land in [-8, 8]


def hashed_linear_score(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        dim: int = HASHED_DIM) -> DataFrame:
    """Linear quality scorer over hashed character trigrams
    (docs -> doc_id, n_grams, score, label).

    The fastText / CCNet classifier shape (Joulin et al. 2016: bag of
    hashed n-grams x a weight vector) with a deterministic weight table:
    bucket = polynomial hash of the trigram mod ``dim``, weight =
    ((bucket * Knuth) mod 1000003) mod 17 - 8. Real deployments broadcast
    a trained weight array; the hash-derived table keeps the engine
    surface identical while staying oracle-checkable.

    Scale shape: the trigram sweep is a per-row ``aggregate`` over a
    ``sequence`` of positions — a higher-order function inside whole-stage
    codegen, so scoring is a ZERO-SHUFFLE narrow map (no explode, no
    groupBy, no Python). At 100 TB this runs at scan speed; the classic
    explode->groupBy formulation would shuffle ~len(text) rows per doc.

    Non-ASCII is stripped first: ``ascii()`` dialects differ on multibyte
    input, and byte-level trigrams over [0x20,0x7e] are what the hashing
    trick actually uses.
    """
    clean = F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")),
                             "[^ -~]", "")
    # sequence(1, 0) steps DESCENDING in Spark ([1, 0]), so docs shorter
    # than one trigram must bypass the sweep entirely
    swept = F.aggregate(
        F.sequence(F.lit(1), F.length("_c") - 2),
        F.lit(0).cast("long"),
        lambda acc, i: acc + (
            (((F.ascii(F.col("_c").substr(i, F.lit(1))) * 961
               + F.ascii(F.col("_c").substr(i + 1, F.lit(1))) * 31
               + F.ascii(F.col("_c").substr(i + 2, F.lit(1)))) % dim)
             * HASHED_WEIGHT_MULT % HASHED_WEIGHT_MOD)
            % HASHED_WEIGHT_RANGE - (HASHED_WEIGHT_RANGE // 2))
    )
    score = F.when(F.length("_c") >= 3, swept).otherwise(F.lit(0).cast("long"))
    return (docs
            .select(F.col(id_col), clean.alias("_c"))
            .select(
                id_col,
                F.greatest(F.length("_c") - 2, F.lit(0)).cast("long")
                .alias("n_grams"),
                score.alias("score"))
            .withColumn("label", F.when(F.col("score") > 0, F.lit("keep"))
                        .otherwise(F.lit("drop")))
            .drop("_c"))


def logreg_fit_predict(feats: DataFrame, feature_cols: list[str],
                       label_col: str = "y", lr: float = 1.0,
                       steps: int = 2, id_cols: list[str] | None = None
                       ) -> DataFrame:
    """Distributed logistic-regression quality classifier -> every row
    scored after ``steps`` full-batch gradient-descent steps:
    (id_cols..., feature_cols..., label, p_hat, pred).

    The TRAINABLE corpus-quality filter shape (CCNet's fastText
    classifier / GPT-3 appendix A): a linear model over cheap document
    features, trained by gradient descent where each step is ONE
    aggregation. Weights start at zero (so step 1's sigmoid is exactly
    0.5 — deterministic, no RNG); each step computes the full-batch
    gradient of the log-likelihood

        w_{t+1}[j] = w_t[j] + lr * sum_i (y_i - sigmoid(w_t . x_i))
                                   * x_i[j] / n

    (no bias term unless the caller includes a constant-1 feature
    column). After training, every row gets p_hat = sigmoid(w . x)
    rounded to 6 and pred = p_hat >= 0.5.

    Scale shape: the kmeans/EM convention — the feature table is
    localCheckpointed once, each GD step is one partial+final hash agg
    collapsing to a single gradient row (the driver collects only the
    |features|-sized model, never data rows), and scoring is a narrow
    literal map: zero joins, zero shuffles, zero Python on the corpus
    path. steps+1 linear scans total.
    """
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    base = feats.localCheckpoint(eager=True)
    w = dict.fromkeys(feature_cols, 0.0)

    def margin():
        z = F.lit(0.0)
        for j in feature_cols:
            z = z + F.lit(w[j]) * F.col(j)
        return z

    sig = lambda z: F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    for _ in range(steps):
        resid = F.col(label_col).cast("double") - sig(margin())
        row = base.agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(resid * F.col(j)).alias(f"_g_{j}")
              for j in feature_cols]).collect()[0]
        n = int(row["_n"])
        for j in feature_cols:
            w[j] = w[j] + lr * (float(row[f"_g_{j}"]) / n)

    out_cols = (id_cols or []) + feature_cols + [label_col]
    p = sig(margin())
    return base.select(
        *out_cols,
        F.round(p, 6).alias("p_hat"),
        (p >= 0.5).alias("pred"))


def label_noise(embeddings: DataFrame, folds: int = 5,
                label_col: str = "label", id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Confident-learning label-noise estimation (Northcutt et al., JAIR
    2021 / cleanlab): the confident-joint matrix -> (true_label,
    guessed_label, n_vecs); off-diagonal mass is the estimated count of
    MISLABELED examples per (given, actual) class pair — the
    label-quality audit a production corpus runs before trusting its
    quality-classifier training labels.

    Out-of-sample scores come from leave-fold-out centroids computed BY
    SUBTRACTION: one global (label, dim) sum plus one (fold, label, dim)
    sum give every fold's held-out centroid as csum - fsum — K-fold
    cross-validation for the price of two aggregations, no K model fits.

    Confident-joint rule, exact-integer edition: per-example class score
    si = round(1e6 * dot(x, loo_centroid_c) / |loo_centroid_c|) as a
    LONG; class threshold = mean si over examples GIVEN label c (kept as
    the exact pair (ssum_c, n_c) — the qualifying test si * n_c >=
    ssum_c is pure integer arithmetic, so no float-sum ordering can flip
    a membership decision on any engine). Each example lands in cell
    (given_label, argmax over qualifying classes); examples qualifying
    nowhere are dropped per the published estimator.

    Scale shape: two (label, dim)-keyed aggs for the centroids (the
    second also keyed by fold — folds is a small constant), broadcast of
    the (folds x labels x dims) centroid table, one (vec, class) dot
    agg, a (labels)-row broadcast threshold join, one argmax window per
    vec, one final matrix agg. The embedding table shuffles once on
    vec_id; everything joined INTO it is bounded by labels x dims.
    """
    with_fold = fold_assign(embeddings, id_col, folds, "_fold")
    dims = _quantized_dims(with_fold, id_col, vec_col, label_col, "_fold")

    total = (dims.groupBy(F.col(label_col).alias("_c_label"), "dim")
             .agg(F.sum("qv").alias("csum")))
    per_fold = (dims.groupBy("_fold",
                             F.col(label_col).alias("_c_label"), "dim")
                .agg(F.sum("qv").alias("fsum")))
    all_folds = with_fold.select("_fold").distinct()
    loo = (total.crossJoin(F.broadcast(all_folds))
           .join(per_fold, ["_fold", "_c_label", "dim"], "left")
           .select("_fold", "_c_label", "dim",
                   (F.col("csum") - F.coalesce("fsum", F.lit(0)))
                   .alias("lsum")))
    cnorm = (loo.groupBy("_fold", "_c_label")
             .agg(F.sum(F.col("lsum") * F.col("lsum")).alias("cnorm2")))

    dots = (dims.join(F.broadcast(loo), ["_fold", "dim"])
            .groupBy(id_col, label_col, "_fold", "_c_label")
            .agg(F.sum(F.col("qv") * F.col("lsum")).alias("dot")))
    scored = (dots.join(F.broadcast(cnorm), ["_fold", "_c_label"])
              .select(id_col, label_col, "_c_label",
                      F.round(F.lit(1000000.0) * F.col("dot")
                              / F.sqrt(F.col("cnorm2").cast("double")))
                      .cast("long").alias("si")))

    thr = (scored.filter(F.col(label_col) == F.col("_c_label"))
           .groupBy("_c_label")
           .agg(F.sum("si").alias("ssum"),
                F.count(F.lit(1)).alias("n_c")))
    qual = (scored.join(F.broadcast(thr), "_c_label")
            .filter(F.col("si") * F.col("n_c") >= F.col("ssum")))
    w = Window.partitionBy(id_col).orderBy(F.col("si").desc(),
                                           F.col("_c_label").asc())
    return (qual.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .groupBy(F.col(label_col).alias("true_label"),
                     F.col("_c_label").alias("guessed_label"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_vecs")))


def ct_lang_confusion(docs: DataFrame, text_col: str = "text",
                      lang_col: str = "lang", id_col: str = "doc_id",
                      top_k: int = 40,
                      hash_mod: int = 4) -> DataFrame:
    """Cavnar-Trenkle rank-order n-gram language identification
    (Cavnar & Trenkle, SDAIR 1994 — the ORIGINAL "TextCat" method
    fastText-era classifiers descend from), evaluated as a held-out
    confusion matrix next to nb_confusion's multinomial NB: language
    profiles are the top_k most frequent character TRIGRAMS (the
    classic uses mixed 1-5-grams; trigrams are the standard
    simplification and stated here), and a document is classified by
    the OUT-OF-PLACE distance

        d(doc, lang) = sum over doc-profile grams of
                       |rank_doc(g) - rank_lang(g)|,
        missing grams cost top_k

    with argmin prediction (ties: lang ASC). Train/test split by the
    repo's multiplicative doc-id hash (test = hash bucket 0).

    Scale shape: trigram explode is narrow; profile building is two
    hash aggs + a rank window per lang (|langs| * |grams| rows); doc
    profiles rank within (doc) windows over doc-local grams; scoring
    is ONE equi-join on the gram key against the tiny broadcast
    language profile; the argmin is a window over |docs| x |langs|
    rows.

    -> (true_lang, pred_lang, n_docs) confusion cells.
    """
    from saber_spark.operators.splits import HASH_MOD, KNUTH
    s = F.lower(F.col(text_col))
    # character trigrams via three zipped slices of the char array —
    # the former per-position substr lambda ran on the interpreted HOF
    # evaluator and re-sliced the document string once per position
    # (r6); split('') yields the per-character array, so the zipped
    # slices produce exactly substr(i, 3) for i = 1..len-2
    chars = F.split(s, "")
    _ln = F.greatest(F.size(chars) - 2, F.lit(0))
    zipped = F.arrays_zip(F.slice(chars, 1, _ln).alias("c0"),
                          F.slice(chars, 2, _ln).alias("c1"),
                          F.slice(chars, 3, _ln).alias("c2"))
    base = (docs.select(F.col(id_col).alias("doc_id"),
                        F.col(lang_col).alias("lang"),
                        F.explode(zipped).alias("gz"))
            .select("doc_id", "lang",
                    F.concat_ws("", "gz.c0", "gz.c1", "gz.c2").alias("g"))
            .withColumn("is_test",
                        F.pmod(F.pmod(F.col("doc_id").cast("long")
                                      * F.lit(KNUTH), F.lit(HASH_MOD)),
                               F.lit(hash_mod)) == 0))
    train = base.filter(~F.col("is_test"))
    lang_counts = (train.groupBy("lang", "g")
                   .agg(F.count(F.lit(1)).alias("c")))
    w_lang = Window.partitionBy("lang").orderBy(
        F.col("c").desc(), F.col("g").asc())
    lang_prof = (lang_counts
                 .select("lang", "g",
                         F.row_number().over(w_lang).alias("lr"))
                 .filter(F.col("lr") <= top_k))
    test = base.filter(F.col("is_test"))
    doc_counts = (test.groupBy("doc_id", "lang", "g")
                  .agg(F.count(F.lit(1)).alias("c")))
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.col("c").desc(), F.col("g").asc())
    doc_prof = (doc_counts
                .select("doc_id", F.col("lang").alias("true_lang"),
                        "g", F.row_number().over(w_doc).alias("dr"))
                .filter(F.col("dr") <= top_k))
    langs = lang_prof.select("lang").distinct()
    grid = doc_prof.crossJoin(F.broadcast(langs))
    joined = grid.join(
        F.broadcast(lang_prof.select(F.col("lang"),
                                     F.col("g"), F.col("lr"))),
        ["lang", "g"], "left")
    dist = (joined.groupBy("doc_id", "true_lang", "lang")
            .agg(F.sum(F.coalesce(F.abs(F.col("dr") - F.col("lr")),
                                  F.lit(top_k))).alias("d")))
    w_min = Window.partitionBy("doc_id").orderBy(
        F.col("d").asc(), F.col("lang").asc())
    pred = (dist.withColumn("rk", F.row_number().over(w_min))
            .filter(F.col("rk") == 1)
            .select("true_lang", F.col("lang").alias("pred_lang")))
    return (pred.groupBy("true_lang", "pred_lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))
