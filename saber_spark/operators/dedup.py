"""Deduplication operators for large-scale training-data pipelines.

Four families, all DataFrame-native and engine-portable (deterministic
arithmetic hashing — no engine-specific hash functions — so every variant is
oracle-checkable):

  exact_dedup        md5(text) groupBy — byte-exact duplicate groups
  minhash_signatures k permutation-min signatures over vocab token ids
  minhash_candidates LSH banding: pairs agreeing on a full band
  ngram_jaccard      exact token-set Jaccard for candidate verification
  simhash            b-bit sign-of-weighted-sum fingerprint + hamming pairs

Scale design:
  - exact: one shuffle on the hash, partial agg collapses per-partition.
  - minhash: explode(doc x k seeds) is a narrow crossjoin with a tiny
    broadcast seeds table; groupBy(doc, seed) has partial min pushdown.
    LSH banding shuffles on (band, band_signature) — duplicate buckets are
    tiny by construction, so the candidate self-join inside a bucket never
    explodes (the reason LSH beats all-pairs at 10^12 docs).
  - jaccard verification runs ONLY on LSH candidates, not all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from saber_spark.operators.vocab import tokenize_docs, vocab_ids

MINHASH_PRIME = 2_147_483_647  # 2^31-1, Mersenne
# deterministic (a, b) seed pairs for k=8 permutation hashes.
# a MUST be large (~P) so a*x wraps the modulus even for tiny ids —
# with small a, (a*x+b) % P is monotone in x and every "permutation"
# degenerates to argmin(id), destroying MinHash's independence.
MINHASH_SEEDS: list[tuple[int, int, int]] = [
    (i,
     (563_079_003 * (i + 1) + 101) % MINHASH_PRIME,
     (976_369_111 * (i + 1) + 7) % MINHASH_PRIME)
    for i in range(8)
]
SIMHASH_BITS = 16
SIMHASH_MULT = 2654435761


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """-> (text_hash, n_docs, min_doc_id): duplicate groups by md5."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min(id_col).alias("min_doc_id"))
    )


SHINGLE_N = 3


def doc_shingles(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n: int = SHINGLE_N) -> DataFrame:
    """distinct (doc_id, shingle): word n-grams joined with single spaces.

    Shingling (not unigrams) is what makes MinHash/LSH selective: documents
    over a small vocabulary share almost all unigrams, but only true
    near-duplicates share most n-grams. Built with higher-order array
    functions — a narrow, JVM-only stage.
    """
    from saber_spark.kernels.text import INFIX_PATTERN

    arr = F.regexp_extract_all(F.col(text_col), F.lit(INFIX_PATTERN), F.lit(0))
    # n length-guarded slices zipped into structs, joined AFTER the
    # explode inside codegen — no lambda, so the gram build stays off
    # the interpreted higher-order-function path (r6; same strings as
    # the former per-position transform/concat_ws/element_at form)
    ln = F.greatest(F.size(F.col("arr")) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(F.col("arr"), j + 1, ln).alias(f"w{j}")
                            for j in range(n)])
    return (docs.select(F.col(id_col), arr.alias("arr"))
            .select(id_col, F.explode(zipped).alias("g"))
            .select(id_col, F.concat_ws(
                " ", *[f"g.w{j}" for j in range(n)]).alias("shingle"))
            .distinct())


def crossdoc_ngram_dup(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = SHINGLE_N,
                       min_df: int = 2,
                       shingles: DataFrame | None = None) -> DataFrame:
    """Per-document EXACT cross-corpus duplication score: of the doc's
    distinct word n-grams, the fraction occurring in >= min_df documents
    corpus-wide -> (doc_id, n_grams, n_dup_grams, dup_frac).

    The exact complement to the approximate MinHash family and to the
    WITHIN-doc repetition stats in gopher_quality: boilerplate (headers,
    license blurbs, templated spans) shows up as a high cross-document
    n-gram duplication fraction even when no whole-document pair is a
    near-duplicate. RefinedWeb/CCNet-style pipelines threshold on exactly
    this score. Docs too short to form an n-gram get (0, 0, 0.0).

    Scale shape: the shingle stage is a narrow JVM-only explode (pass
    ``shingles=`` to share one materialized stage with the MinHash
    family); gram document-frequency is a partial+final hash agg on the
    shingle key; the join back is shuffle-hash on the same key; the
    per-doc roll-up is another two-phase agg. Linear in corpus size,
    no self-join anywhere.
    """
    sh = shingles if shingles is not None else doc_shingles(
        docs, text_col=text_col, id_col=id_col, n=n)
    dfc = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    per = (sh.join(dfc, "shingle")
           .groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_grams"),
                F.count(F.when(F.col("df") >= min_df, 1))
                .alias("n_dup_grams")))
    return (docs.select(id_col).join(per, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
                F.coalesce("n_dup_grams", F.lit(0)).cast("long")
                .alias("n_dup_grams"),
                F.coalesce(
                    F.round(F.col("n_dup_grams").cast("double")
                            / F.col("n_grams").cast("double"), 6),
                    F.lit(0.0)).alias("dup_frac")))


def _doc_shingle_ids(docs: DataFrame, text_col: str, id_col: str,
                     portable_ids: bool = False,
                     shingles: DataFrame | None = None) -> DataFrame:
    """distinct (doc_id, shingle_id).

    Two id assignments:
      portable_ids=False (PRODUCTION): shingle_id = xxhash64(shingle),
        a narrow map — no vocab table, no shuffle, no global sort. This is
        the only shape that survives 10^12 docs, where the shingle vocab
        itself is trillions of rows.
      portable_ids=True (ORACLE): dense ids via a row_number over the
        distinct shingle vocabulary — engine-portable arithmetic so the
        DuckDB twin computes identical signatures. Bounded-vocab inputs
        only (the sort is global).
    """
    sh = shingles if shingles is not None else doc_shingles(
        docs, text_col=text_col, id_col=id_col)
    if not portable_ids:
        # reduce into [0, P) so the affine permutation hash a*x+b cannot
        # overflow int64 (a ~ 1e9, x < P ~ 2.1e9 -> product < 2^62)
        return sh.select(
            id_col,
            F.pmod(F.xxhash64("shingle"), F.lit(MINHASH_PRIME)
                   ).alias("shingle_id"))
    vocab = vocab_ids(sh.withColumnRenamed("shingle", "token"))
    return (sh.join(F.broadcast(vocab), sh.shingle == vocab.token)
            .select(id_col, F.col("token_id").alias("shingle_id")))


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       portable_ids: bool = False,
                       shingles: DataFrame | None = None) -> DataFrame:
    """-> (doc_id, seed_id, minhash): k-permutation MinHash signature rows.

    h_i(x) = (a_i * x + b_i) mod P over the doc's distinct SHINGLE ids —
    arithmetic-only, so the identical formula runs under any SQL engine.

    Execution shape (r6): all k permutation mins are computed as k
    aggregate COLUMNS of one doc-keyed pass (the seeds are literals
    folded into each column) and unpivoted afterwards — the former
    k-way crossJoin row expansion shuffled k times the shingle rows to
    compute the same k mins (guide §2.3 aggregate-before-shuffle).
    """
    doc_sh = _doc_shingle_ids(docs, text_col, id_col, portable_ids, shingles)
    mins = doc_sh.groupBy(id_col).agg(*[
        F.min(F.pmod(F.lit(a).cast("long") * F.col("shingle_id")
                     + F.lit(b).cast("long"),
                     F.lit(MINHASH_PRIME).cast("long"))).alias(f"_m{sid}")
        for sid, a, b in MINHASH_SEEDS])
    stack = ", ".join(f"{int(sid)}, _m{sid}" for sid, _a, _b in MINHASH_SEEDS)
    return mins.select(
        F.col(id_col),
        F.expr(f"stack({len(MINHASH_SEEDS)}, {stack}) "
               "as (seed_id, minhash)")
    ).select(id_col, F.col("seed_id").cast("int").alias("seed_id"),
             "minhash")


def band_buckets(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", rows_per_band: int = 2,
                 portable_ids: bool = False,
                 shingles: DataFrame | None = None) -> DataFrame:
    """-> (doc_id, band, band_sig): the LSH band-bucket table.

    The mergeable dedup STATE representation: two docs sharing a
    (band, band_sig) row collide in that band. minhash_candidates
    self-joins this table; the incremental streaming curation path
    PERSISTS it as the corpus-history footprint (bounded: bands x docs
    rows, no text/shingles retained)."""
    sigs = minhash_signatures(docs, text_col, id_col, portable_ids, shingles)
    return (
        sigs.withColumn("band", (F.col("seed_id") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(F.array_sort(F.collect_list(
            F.concat_ws(":", F.col("seed_id"), F.col("minhash")))).alias("sig_parts"))
        .select(id_col, "band",
                F.concat_ws("|", F.col("sig_parts")).alias("band_sig"))
    )


def minhash_candidates(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", rows_per_band: int = 2,
                       portable_ids: bool = False,
                       shingles: DataFrame | None = None) -> DataFrame:
    """LSH banding -> candidate near-duplicate pairs (doc_a < doc_b).

    Docs agreeing on EVERY minhash within at least one band become a
    candidate pair. Self-join happens per (band, signature) bucket.
    """
    bands = band_buckets(docs, text_col, id_col, rows_per_band,
                         portable_ids, shingles)
    left = bands.select(F.col(id_col).alias("doc_a"), "band", "band_sig")
    right = bands.select(F.col(id_col).alias("doc_b"), "band", "band_sig")
    return (
        left.join(right, on=["band", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    )


def ngram_jaccard(docs: DataFrame, pairs: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  shingles: DataFrame | None = None) -> DataFrame:
    """Exact shingle-set Jaccard for given (doc_a, doc_b) pairs.

    -> (doc_a, doc_b, n_common, n_union, jaccard rounded 6). Runs only on
    LSH candidates — never all pairs.

    ``shingles``: pass a (persisted) doc_shingles() DataFrame to share the
    shingle computation with the candidate-generation stage — the full
    candidates+verify chain otherwise recomputes the narrow shingle lineage
    in every join branch (8 scans observed). At 100 TB the shared table is a
    materialized checkpoint stage, not a cache.
    """
    doc_sh = shingles if shingles is not None else doc_shingles(
        docs, text_col=text_col, id_col=id_col)
    sizes = doc_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tok"))
    ta = doc_sh.select(F.col(id_col).alias("doc_a"), "shingle")
    tb = doc_sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        pairs.join(ta, "doc_a").join(tb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common
        .join(sizes.withColumnRenamed(id_col, "doc_a")
              .withColumnRenamed("n_tok", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b")
              .withColumnRenamed("n_tok", "n_b"), "doc_b")
        .select(
            "doc_a", "doc_b", "n_common",
            (F.col("n_a") + F.col("n_b") - F.col("n_common")).alias("n_union"),
            F.round(F.col("n_common") /
                    (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
                    ).alias("jaccard"),
        )
    )


def dedup_clusters(docs: DataFrame, threshold: float = 0.5,
                   text_col: str = "text", id_col: str = "doc_id",
                   rounds: int | None = None,
                   portable_ids: bool = False,
                   shingles: DataFrame | None = None) -> DataFrame:
    """Near-dup dedup capstone: keep-list over transitive duplicate clusters.

    LSH candidates -> exact Jaccard verify (>= threshold) -> connected
    components over the verified pairs -> one row PER CORPUS DOC:
    (doc_id, cluster_id, cluster_size, keep) with cluster_id = min doc in
    the component (own id for singletons) and keep = doc is its cluster's
    canonical representative. This is the decision table a training-data
    pipeline joins back to drop duplicates while keeping one copy.

    Transitivity is the point: A~B and B~C dedupe {A,B,C} to one doc even
    when A~C is below threshold (chains of near-misses are how template
    spam survives pairwise-only dedup). Scale: candidates are LSH-bounded
    (never all-pairs), the verify runs only on candidates, and components
    use hash-min propagation (one join + one agg per round); cluster
    diameter is small in practice — pass ``rounds`` >= the expected
    diameter to run propagation as one lazy job, or None for the
    checkpointed fixpoint mode.

    The verified-pairs table is MATERIALIZED (localCheckpoint) before the
    component rounds: each propagation round references the edge set, and
    measured at sf0.01/sf0.1 the un-materialized plan re-derived the whole
    LSH+verify chain per round (no static ReusedExchange appeared across
    the rounds' subtrees) — 14.0s vs 0.9s for the component step at
    sf0.01. The pairs table is tiny (candidates already LSH-bounded), so
    the checkpoint is cheap at any scale; a 100 TB run writes it to a
    durable checkpoint table instead (same shape, resumable).
    """
    from saber_spark.operators.graph import connected_components

    if shingles is None:
        # One materialized shingle stage shared by candidate generation
        # (band_buckets) and all three verify branches (sizes, ta, tb) —
        # without it the narrow-but-nontrivial regexp+transform+explode
        # shingle lineage re-derives per branch (the ngram_jaccard
        # docstring's "8 scans"); measured 3.9s -> 2.6s for the curate
        # dedup stage at sf0.1. Same table a 100 TB run checkpoints
        # durably.
        shingles = doc_shingles(docs, text_col=text_col, id_col=id_col) \
            .localCheckpoint(eager=True)
    pairs = minhash_candidates(docs, text_col, id_col,
                               portable_ids=portable_ids, shingles=shingles)
    jac = (ngram_jaccard(docs, pairs, text_col, id_col, shingles=shingles)
           .filter(F.col("jaccard") >= threshold)
           .select("doc_a", "doc_b")
           .localCheckpoint(eager=True))
    # materialize=False: jac is already checkpointed just above, so CC's
    # internal edge materialization would store the same table twice
    comp = connected_components(jac, src="doc_a", dst="doc_b", rounds=rounds,
                                materialize=False)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (
        docs.select(id_col)
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .join(sizes, "component", "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
            F.coalesce("cluster_size", F.lit(1)).alias("cluster_size"),
            (F.col("component").isNull()
             | (F.col(id_col) == F.col("component"))).alias("keep"),
        )
    )


def contamination_check(docs: DataFrame, eval_docs: DataFrame, n: int = 5,
                        text_col: str = "text", id_col: str = "doc_id"
                        ) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word n-gram
    with an evaluation/benchmark set.

    -> one row per corpus doc: (doc_id, n_eval_ngrams, contaminated).
    Training corpora must not contain benchmark text; the standard check
    (13-gram overlap in GPT-3's appendix, n configurable here) is exactly
    an n-gram semi-join. Scale: the eval side is benchmark-sized — its
    distinct n-grams BROADCAST, so the multi-TB corpus side never
    shuffles for the PROBE. Two exchanges remain: the per-doc hit count's
    partial+final aggregation, and the final outcome join of hits back to
    the corpus id list — the hits table is bounded by the number of
    contaminated docs (sparse in practice), so AQE downgrades that join
    to a broadcast at runtime; under static planning with a pathological
    fully-contaminated corpus it is a doc_id-keyed shuffle, which is the
    correct fallback.
    """
    doc_g = doc_shingles(docs, text_col=text_col, id_col=id_col, n=n)
    eval_g = (doc_shingles(eval_docs, text_col=text_col, id_col=id_col, n=n)
              .select("shingle").distinct())
    hits = (doc_g.join(F.broadcast(eval_g), "shingle")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_eval_ngrams")))
    return (docs.select(id_col).join(hits, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_eval_ngrams", F.lit(0))
                 .cast("long").alias("n_eval_ngrams"),
                F.col("n_eval_ngrams").isNotNull().alias("contaminated")))


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """-> (doc_id, simhash): b-bit SimHash over token-id multiset.

    bit_j(doc) = 1 iff sum over token occurrences of
    (+1 if bit j of (token_id * SIMHASH_MULT) else -1), weighted by token
    frequency, is positive. Arithmetic-only -> oracle-checkable.
    """
    spark = docs.sparkSession
    bits = spark.range(SIMHASH_BITS).select(F.col("id").cast("int").alias("bit"))
    tokens = tokenize_docs(docs, text_col=text_col, id_col=id_col)
    vocab = vocab_ids(tokens)
    weighted = (
        tokens.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("w"))
        .join(F.broadcast(vocab), "token")
        .withColumn("hval", F.pmod(F.col("token_id") * F.lit(SIMHASH_MULT),
                                   F.lit(2**32)))
    )
    per_bit = (
        weighted.crossJoin(F.broadcast(bits))
        .withColumn(
            "contrib",
            F.when(F.expr("shiftright(hval, bit) & 1") == 1,
                   F.col("w")).otherwise(-F.col("w")))
        .groupBy(id_col, "bit")
        .agg(F.sum("contrib").alias("s"))
    )
    return (
        per_bit.withColumn(
            "bitval",
            F.when(F.col("s") > 0,
                   F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(F.lit(0)))
        .groupBy(id_col)
        .agg(F.sum("bitval").alias("simhash"))
    )


def line_dedup(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", sep: str = "\n",
               min_docs: int = 2) -> DataFrame:
    """Cross-document line-level dedup (CCNet/RefinedWeb boilerplate pass):
    drop every line that appears in >= ``min_docs`` DISTINCT documents
    (nav bars, cookie banners, footers), reassembling the surviving lines
    in original order.  The reference has no corpus-level pass at all
    (one document at a time, saber/saber.py:52-96); this is the standard
    web-corpus stage that runs before content-level near-dup.

    -> (doc_id, clean_text, n_lines, n_removed); docs whose every line is
    boilerplate survive with clean_text = ''.

    Scale notes (10^12 docs):
      * lines explode once; the duplicated-line count aggregates on
        xxhash64(line) — an 8-byte shuffle key instead of the raw line
        bytes.  countDistinct(doc) plans as partial-distinct + merge.
        (64-bit collisions: ~10^10 distinct lines -> <0.3% chance any
        single pair collides — the same trade CCNet's own hash dedup
        makes; collisions only ever over-remove one extra line.)
      * the removal join is LEFT ANTI on the same 8-byte key; the
        boilerplate side is the (small) count>=min_docs slice, so AQE
        turns it into a broadcast join when it fits.
      * reassembly is ONE groupBy(doc) with collect_list(struct(pos,line))
        + array_sort — per-doc state is bounded by document size; per-doc
        line totals come from a NARROW size(split(text)) projection on the
        source (no second aggregation over the exploded lines).
    """
    lines = (docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"))
        .withColumn("lh", F.xxhash64("line")))
    boiler = (lines.groupBy("lh")
              .agg(F.countDistinct(id_col).alias("n_docs"))
              .filter(F.col("n_docs") >= min_docs)
              .select("lh"))
    kept = lines.join(boiler, "lh", "left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.concat_ws(
                        sep,
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "line"))),
                            lambda s: s["line"])).alias("clean_text"),
                    F.count(F.lit(1)).alias("n_kept")))
    totals = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), sep)).cast("bigint").alias("n_lines"))
    return (totals.join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.col("n_lines"),
                    (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
                    .alias("n_removed")))


def ngram_containment(docs: DataFrame, pairs: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      shingles: DataFrame | None = None) -> DataFrame:
    """Asymmetric shingle containment for given (doc_a, doc_b) pairs:
    containment(X in Y) = |shingles(X) ∩ shingles(Y)| / |shingles(X)|.

    -> (doc_a, doc_b, n_common, n_a, n_b, cont_a, cont_b), cont_* rounded
    to 6. Where Jaccard scores symmetric near-duplication, containment
    catches QUOTATION / SUBSET relations — a short doc fully embedded in
    a long one scores cont_a ≈ 1 while its Jaccard stays low (the long
    doc's extra shingles dilute the union), so a Jaccard-threshold dedup
    chain misses it. The standard broder-containment companion statistic
    for boilerplate/quote tracing in web corpora.

    Runs only on candidate pairs (LSH banding upstream) — never
    all-pairs; same ``shingles=`` sharing contract as ngram_jaccard
    (recompute wins at small scale, a materialized shingle stage wins
    past the measured crossover — BENCH/ab_shingles.json).
    """
    doc_sh = shingles if shingles is not None else doc_shingles(
        docs, text_col=text_col, id_col=id_col)
    sizes = doc_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    ta = doc_sh.select(F.col(id_col).alias("doc_a"), "shingle")
    tb = doc_sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (pairs.join(ta, "doc_a").join(tb, ["doc_b", "shingle"])
              .groupBy("doc_a", "doc_b")
              .agg(F.count(F.lit(1)).alias("n_common")))
    return (common
            .join(sizes.select(F.col(id_col).alias("doc_a"),
                               F.col("n_sh").alias("n_a")), "doc_a")
            .join(sizes.select(F.col(id_col).alias("doc_b"),
                               F.col("n_sh").alias("n_b")), "doc_b")
            .select("doc_a", "doc_b", "n_common", "n_a", "n_b",
                    F.round(F.col("n_common") / F.col("n_a"), 6)
                    .alias("cont_a"),
                    F.round(F.col("n_common") / F.col("n_b"), 6)
                    .alias("cont_b")))


def scrub_dup_spans(docs: DataFrame, n: int = 5, min_df: int = 2,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Cross-document duplicate-SPAN removal (the rewrite counterpart of
    crossdoc_ngram_dup's score — Lee et al. 2022, arXiv:2107.06499:
    deleting duplicated spans from training data, not just flagging
    docs): every token position covered by an n-gram that appears in
    >= min_df distinct documents is deleted; the survivors reassemble
    in order.

    -> (doc_id, n_tokens, n_removed, clean_text) — one row per doc with
    >= 1 token (the tfidf event-space convention); a fully-duplicated
    doc survives with clean_text = '' (the line_dedup contract), so
    downstream joins never lose rows.

    Scale shape: positional n-grams come from n-1 lead() windows over
    the tokens table's natural (doc_id, pos) key — ONE shuffle; the
    gram document-frequency is two hash aggs (distinct (doc, gram)
    collapses first, so the df agg never sees positional duplicates);
    covered positions expand by the CONSTANT factor n (sequence +
    explode, narrow); reassembly is one ordered collect per doc. The
    duplicated-gram table joins back by gram — at 100 TB this is the
    same shuffle key the df agg already used, and min_df>=2 keeps the
    table a small fraction of the gram space (true Lee-et-al deployments
    push n to ~50 tokens, making matches rarer still).
    """
    from pyspark.sql import Window
    from saber_spark.operators.vocab import tokenize_docs

    tokens = tokenize_docs(docs.select(id_col, text_col))
    w = Window.partitionBy(id_col).orderBy("pos")
    gram_cols = [F.col("token")] + [F.lead("token", j).over(w)
                                    for j in range(1, n)]
    grams = (tokens
             .select(id_col, "pos",
                     F.concat_ws(" ", *gram_cols).alias("gram"),
                     F.lead("token", n - 1).over(w).alias("_last"))
             .filter(F.col("_last").isNotNull())
             .drop("_last"))
    dup = (grams.select(id_col, "gram").distinct()
           .groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
           .filter(F.col("df") >= min_df)
           .select("gram"))
    covered = (grams.join(dup, "gram")
               .select(id_col,
                       F.explode(F.sequence(
                           F.col("pos"),
                           F.col("pos") + n - 1)).alias("pos"))
               .distinct())
    kept = tokens.join(covered, [id_col, "pos"], "left_anti")
    stats = tokens.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"))
    rebuilt = (kept.groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_kept"),
                    F.array_join(F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("pos", "token"))),
                        lambda s: s.token), " ").alias("clean_text")))
    return (stats.join(rebuilt, id_col, "left")
            .select(id_col, "n_tokens",
                    (F.col("n_tokens")
                     - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
                    F.coalesce("clean_text", F.lit("")).alias("clean_text")))


# Winnowing (Schleimer/Wilkerson/Aiken SIGMOD'03) parameters: k-gram size,
# window width, and the polynomial char-hash modulus. The hash is plain
# integer arithmetic over ASCII codes so any engine reproduces the
# fingerprints bit-exactly.
WINNOW_K = 5
WINNOW_W = 4
WINNOW_MOD = 1048573  # largest prime < 2^20


def winnow_fingerprints(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = WINNOW_K,
                        w: int = WINNOW_W, digest: bool = True) -> DataFrame:
    """MOSS-style winnowing digest per document ->
    (doc_id, n_windows, n_fps, min_fp, fp_sum).

    The local-fingerprint family MinHash does not cover: winnowing keeps
    the MINIMUM k-gram hash of every w-wide window, guaranteeing (unlike
    MinHash's whole-document signature) that any shared substring of
    length >= k + w - 1 contributes at least one shared fingerprint —
    the property plagiarism/boilerplate detectors need for POSITIONAL
    overlap, not set similarity. Output is the per-doc digest (distinct
    fingerprint count, min, order-independent sum); the cross-doc join
    on fingerprint is downstream and identical in shape to the LSH
    bucket join.

    Scale shape: entirely per-document — an explode over char positions,
    one window min partitioned by doc (ROWS frame, single pass), one
    two-level agg. Partitioning by doc_id means NO cross-doc shuffle
    beyond the initial hash partition; at 100 TB each partition winnows
    its own documents at memory-bandwidth speed. Non-ASCII is stripped
    (ascii() dialect portability), text lowercased first.
    """
    from pyspark.sql import Window

    clean = F.regexp_replace(F.lower(F.coalesce(F.col(text_col),
                                                F.lit(""))), "[^ -~]", "")
    base = (docs.select(F.col(id_col), clean.alias("_c"))
            .filter(F.length("_c") >= k + w - 1))
    # one row per k-gram start position
    grams = base.select(
        id_col,
        (F.length("_c") - (k + w - 2)).cast("long").alias("n_windows"),
        F.posexplode(F.sequence(F.lit(1), F.length("_c") - (k - 1)))
        .alias("_i", "pos"),
        F.col("_c"),
    ).select(
        id_col, "n_windows", "pos",
        (sum((F.ascii(F.col("_c").substr(F.col("pos") + j, F.lit(1)))
              * (31 ** (k - 1 - j)) for j in range(k)), F.lit(0))
         .cast("long") % WINNOW_MOD).alias("gh"),
    )
    win = Window.partitionBy(id_col).orderBy("pos") \
        .rowsBetween(0, w - 1)
    fps = (grams
           .withColumn("fp", F.min("gh").over(win))
           .filter(F.col("pos") <= F.col("n_windows")))
    if not digest:
        # raw (doc, window position, fingerprint) rows — the input to a
        # cross-doc fingerprint equi-join (same shape as the LSH bucket join)
        return fps.select(id_col, "pos", "fp")
    return (fps.groupBy(id_col, "n_windows")
            .agg(F.count_distinct("fp").cast("long").alias("n_fps"),
                 F.min("fp").alias("min_fp"),
                 F.sum_distinct("fp").cast("long").alias("fp_sum")))


def ppjoin_similarity(docs: DataFrame, threshold: float = 0.6,
                      text_col: str = "text", id_col: str = "doc_id"
                      ) -> DataFrame:
    """Exact token-set Jaccard self-join >= threshold via prefix
    filtering (AllPairs, Bayardo WWW'07; PPJoin, Xiao ICDE'08) — the
    EXACT counterpart to the MinHash/LSH probabilistic path: no false
    negatives, no signature tuning, the right tool when the dedup
    policy must be auditable ("every pair above t, provably").

    Prefix filter: order every doc's distinct tokens by global document
    frequency ascending (rarest first, ties by token ASC); any pair with
    Jaccard >= t = num/den must share a token within each side's first
    p = |d| - ceil(t*|d|) + 1 tokens, so candidate generation joins ONLY
    prefix tokens — the frequent-token quadratic blowup never enters the
    join. A symmetric length filter (den*min_size >= num*max_size)
    prunes before verification; survivors verify with an exact
    intersection count over full sets. All threshold comparisons are
    integer (inter*den >= num*union) — no float boundary misses; the
    threshold is snapped to a rational via Fraction.limit_denominator.

    Scale shape: df-rank is a vocabulary-sized window broadcast back via
    an equi-join; prefix selection is one per-doc window over distinct
    (doc, token) rows; candidates shuffle on prefix tokens only (rare by
    construction — the frequency-ascending order is WHY this scales);
    verification touches candidate pairs, never all pairs, and runs as
    ONE codegen `array_intersect` over per-doc materialized sorted token
    sets (one row per pair) rather than re-exploding each pair by its
    token count through row-level joins — measured 19.8 -> ~2 s steady
    at sf0.1, where the tiny fixture vocabulary makes prefix tokens
    frequent and the exploded verify was ~3e7 join rows. Token sets ride
    the pair join as array columns; at production set sizes (10^2-10^3
    distinct tokens) that is still far below the exploded row volume.

    -> (doc_a, doc_b, inter, size_a, size_b, jaccard 6dp), doc_a < doc_b.
    """
    from fractions import Fraction

    from pyspark.sql import Window

    fr = Fraction(threshold).limit_denominator(1_000)
    num, den = fr.numerator, fr.denominator

    toks = (tokenize_docs(docs, text_col=text_col)
            .select(F.col(id_col).alias("doc"), "token").distinct())
    sizes = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    rank = dfreq.select(
        "token", F.row_number().over(
            Window.orderBy(F.col("df").asc(), F.col("token").asc()))
        .alias("trank"))

    ranked = (toks.join(rank, "token").join(sizes, "doc")
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("doc").orderBy("trank")))
              .filter(F.col("rn") <= F.col("sz")
                      - F.floor((num * F.col("sz") + den - 1) / den) + 1)
              .select("doc", "token", "sz"))

    cand = (ranked.alias("a").join(ranked.alias("b"), "token")
            .filter((F.col("a.doc") < F.col("b.doc"))
                    & (den * F.least("a.sz", "b.sz")
                       >= num * F.greatest("a.sz", "b.sz")))
            .select(F.col("a.doc").alias("doc_a"),
                    F.col("b.doc").alias("doc_b"))
            .distinct())

    # Verification strategy is chosen from the (driver-known,
    # vocabulary-sized) distinct-token count. When the whole vocabulary
    # fits one machine word, each doc's token set is a single long
    # bitmask and the exact intersection is bit_count(a & b) — three
    # primitive ops per pair vs array_intersect's per-element hash
    # build/probe (measured 6.9s -> 2.8s steady at sf0.1, where the
    # fixture vocabulary is 31 tokens). Both paths compute the same
    # exact integers; large vocabularies keep the sorted-array
    # intersect, whose cost tracks SET size (10^2-10^3), not
    # vocabulary size.
    n_vocab = dfreq.count()
    if n_vocab <= 64:
        masks = (toks.join(rank, "token").groupBy("doc")
                 .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), "
                             "trank - 1))").alias("mask")))
        inter = (cand
                 .join(masks.select(F.col("doc").alias("doc_a"),
                                    F.col("mask").alias("_m_a")), "doc_a")
                 .join(masks.select(F.col("doc").alias("doc_b"),
                                    F.col("mask").alias("_m_b")), "doc_b")
                 .select("doc_a", "doc_b",
                         F.bit_count(F.col("_m_a").bitwiseAND(F.col("_m_b")))
                         .cast("long").alias("inter"),
                         F.bit_count("_m_a").cast("long").alias("size_a"),
                         F.bit_count("_m_b").cast("long").alias("size_b")))
    else:
        tsets = (toks.join(rank, "token").groupBy("doc")
                 .agg(F.array_sort(F.collect_set("trank")).alias("tokset")))
        inter = (cand
                 .join(tsets.select(F.col("doc").alias("doc_a"),
                                    F.col("tokset").alias("_ts_a")), "doc_a")
                 .join(tsets.select(F.col("doc").alias("doc_b"),
                                    F.col("tokset").alias("_ts_b")), "doc_b")
                 .select("doc_a", "doc_b",
                         F.size(F.array_intersect("_ts_a", "_ts_b"))
                         .cast("long").alias("inter"),
                         F.size("_ts_a").cast("long").alias("size_a"),
                         F.size("_ts_b").cast("long").alias("size_b")))

    return (inter
            .filter(F.col("inter") * den
                    >= num * (F.col("size_a") + F.col("size_b")
                              - F.col("inter")))
            .select("doc_a", "doc_b", "inter", "size_a", "size_b",
                    F.round(F.col("inter").cast("double")
                            / (F.col("size_a") + F.col("size_b")
                               - F.col("inter")).cast("double"), 6)
                    .alias("jaccard")))


def cdc_chunk_dedup(docs: DataFrame, divisor: int = 8, min_docs: int = 2,
                    text_col: str = "text", id_col: str = "doc_id"
                    ) -> DataFrame:
    """Content-defined-chunking dedup at token granularity -> the
    cross-document duplicated-CHUNK table (chunk_md5, tok_len, n_docs,
    n_occ), n_docs >= min_docs.

    Fixed-width shingles (scrub_dup_spans, crossdoc_ngram_dup) miss a
    duplicate once a single token is inserted before it — every
    downstream window shifts. Content-defined chunking (the LBFS/FastCDC
    idea, Muthitacharoen SOSP'01) cuts the token stream where a rolling
    CONTENT condition fires — here: md5-hash(token) % divisor == 0 closes
    the chunk after that token — so chunk boundaries re-synchronize right
    after any edit and shared runs between documents still align
    chunk-for-chunk. Expected chunk length = ``divisor`` tokens;
    production adds min/max length clamps via the same running-flag
    window (documented, not needed for the testdata's token entropy).

    Portability: the boundary hash is the md5-8-hex-chars integer
    (dsir_weights convention), the chunk key is md5 of the
    space-joined token run — bit-identical in any engine.

    Scale shape: entirely per-document until the final agg — tokenize
    (narrow), ONE running-sum window partitioned by doc (ROWS frame,
    single pass over each doc's tokens), one (doc, chunk) agg with
    in-agg ordered collection (array_sort of (pos, token) structs — the
    inverted_index convention, never a second window), then ONE global
    agg keyed on the 128-bit chunk hash with map-side partial
    aggregation collapsing each partition's repeats before the exchange.
    Boilerplate chunks (every page's nav bar) are exactly the hub keys
    partial agg absorbs; AQE handles residue. No Python, no self-join.
    """
    from pyspark.sql import Window

    toks = tokenize_docs(docs, text_col=text_col, id_col=id_col)
    bflag = F.when(
        (F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10)
         .cast("long") % divisor) == 0, F.lit(1)).otherwise(F.lit(0))
    w = (Window.partitionBy(id_col).orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, -1))
    chunks = (toks
              .withColumn("_b", bflag)
              .withColumn("chunk_id",
                          F.coalesce(F.sum("_b").over(w), F.lit(0)))
              .groupBy(id_col, "chunk_id")
              .agg(F.md5(F.array_join(
                       F.transform(
                           F.array_sort(F.collect_list(
                               F.struct("pos", "token"))),
                           lambda s: s.token), " ")).alias("chunk_md5"),
                   F.count(F.lit(1)).cast("long").alias("tok_len")))
    return (chunks.groupBy("chunk_md5")
            .agg(F.min("tok_len").alias("tok_len"),
                 F.count_distinct(F.col(id_col)).cast("long")
                 .alias("n_docs"),
                 F.count(F.lit(1)).cast("long").alias("n_occ"))
            .filter(F.col("n_docs") >= min_docs))
