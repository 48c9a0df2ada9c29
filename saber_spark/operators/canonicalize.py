"""Canonicalization: merge coreferent mentions into node rows.

north_rule obligation: "salted-key canonicalization of coreferent entities"
with skew mitigation for hub entities. Hub surfaces (e.g. "table" in the
fixture, "p53" in the wild) appear in a huge share of pages, so a naive
``groupBy(canonical_id)`` sends one key's entire traffic to one reducer.

Two-phase salted aggregation (classic map-side skew fix, written as plain
query logic — no custom Catalyst):
  phase 1: groupBy(canonical_id, salt = pmod(hash(url), S)) -> partial counts
           (S-way spread of each hot key across reducers)
  phase 2: groupBy(canonical_id) over the ≤ S partial rows per key.

Distinct-document counts can't be salted-summed directly, so phase 1 also
dedupes (canonical_id, url) — Spark plans that as a partial (map-side)
dedupe before the shuffle, which is the same spill-safe shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 64


def salted_count(df: DataFrame, keys: list[str], salt_src: str,
                 out_col: str = "n", salt_buckets: int = DEFAULT_SALT_BUCKETS
                 ) -> DataFrame:
    """Generic two-phase salted count: groupBy(keys) robust to hub keys.

    The salt value only affects row distribution, never the result, so any
    hash works; the oracle for this operator is a plain GROUP BY count.
    """
    partial = (
        df.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)))
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(out_col))


def canonicalize_nodes(linked: DataFrame,
                       salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """linked mentions -> node table (canonical_id, label, n_mentions, n_docs).

    Only grounded mentions participate (canonical_id non-null); the reference
    likewise only attaches xrefs for dictionary hits
    (grounding_utils.py:53-66).
    """
    grounded = linked.filter(F.col("canonical_id").isNotNull())

    # phase 1: salted partial aggregation (hot keys spread over S reducers)
    partial = (
        grounded
        .withColumn("salt", F.pmod(F.xxhash64("url"), F.lit(salt_buckets)))
        .groupBy("canonical_id", "label", "salt")
        .agg(F.count(F.lit(1)).alias("partial_mentions"))
    )
    # phase 2: final aggregation over <= S rows per key
    mention_counts = (
        partial.groupBy("canonical_id", "label")
        .agg(F.sum("partial_mentions").alias("n_mentions"))
    )

    # distinct docs: map-side partial dedupe then count (skew-safe because
    # dropDuplicates' partial aggregate collapses each (key, url) locally)
    doc_counts = (
        grounded.select("canonical_id", "url").dropDuplicates()
        .groupBy("canonical_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )

    return mention_counts.join(doc_counts, on="canonical_id", how="inner")


def resolve_entities(names: DataFrame, name_col: str = "name",
                     max_edits: int = 1, block_chars: int = 1,
                     cc_rounds: int | None = 8) -> DataFrame:
    """Fuzzy entity resolution -> (name, canonical): cluster surface forms
    whose edit distance is <= max_edits, canonical = min name per cluster.

    The record-linkage step between exact-surface linking and the KG node
    table: "p53" / "p53s" / "tp53" style variants must collapse to one
    node or the graph fragments (the reference links exact surfaces only,
    saber/utils/grounding_utils.py:65-66). Classic blocked formulation
    (Fellegi-Sunter blocking, standard ER practice):

      1. block on the first `block_chars` characters — candidate pairs
         form ONLY within a block, so the join is an equi-join on the
         block key plus a<b; never all-pairs. Recall limitation is the
         textbook one (a first-character typo crosses blocks and is
         missed) — documented, not hidden; production stacks add a second
         blocking pass (e.g. soundex) and union the edges.
      2. verify pairs with levenshtein(a, b) <= max_edits — JVM built-in,
         identical semantics in DuckDB for the oracle.
      3. transitive closure via connected_components (hash-min), so
         a~b, b~c clusters a,b,c together even when lev(a,c) > max_edits
         — the standard ER convention (clusters are closures, not
         cliques).
      4. singletons (no fuzzy partner) keep themselves as canonical.

    Scale shape: block sizes follow the name distribution — for real
    corpora block on more characters (block_chars=2-3) or a
    length-banded key to bound the quadratic-within-block term; the
    verify filter runs inside the join, so only surviving edges shuffle
    into the CC loop. cc_rounds bounds the lazy CC propagation (cluster
    diameter in HOPS, not string length; edit-chains longer than 2^8 are
    not a thing in surface-form data); pass None for the fixpoint mode.
    """
    from saber_spark.operators.graph import connected_components

    n = (names.select(F.col(name_col).alias("name")).distinct()
         .withColumn("blk", F.substring("name", 1, block_chars))
         .localCheckpoint(eager=True))
    a = n.select(F.col("blk"), F.col("name").alias("src"))
    b = n.select(F.col("blk"), F.col("name").alias("dst"))
    pairs = (a.join(b, "blk")
             .filter((F.col("src") < F.col("dst"))
                     & (F.levenshtein("src", "dst") <= max_edits))
             .select("src", "dst"))
    comp = connected_components(pairs, rounds=cc_rounds)
    return (n.join(comp, n.name == comp.node, "left")
            .select("name",
                    F.coalesce("component", "name").alias("canonical")))


def blocking_metrics(records: DataFrame, true_pairs: DataFrame,
                     schemes=None, name_col: str = "name") -> DataFrame:
    """Evaluate candidate-generation (blocking) schemes for entity
    resolution -> one row per scheme:
    (scheme, n_records, n_blocks, n_cand_pairs, n_true_pairs,
     n_true_cand, pair_completeness, reduction_ratio).

    The two textbook blocking-quality numbers (Christen, "Data Matching"
    2012 ch. 7): reduction ratio RR = 1 - |candidates| / C(n,2) (how much
    of the quadratic pair space the blocks prune) and pair completeness
    PC = |true matches co-blocked| / |true matches| (how much recall the
    pruning costs). Every production ER stack tunes its blocking key on
    exactly this trade-off before running the expensive verify join —
    at 10^9 records the candidate count, not the matcher, decides
    feasibility.

    Scale shape: |candidates| is NEVER materialized — per-block counts
    come from one hash agg on the block key and C(nb,2) is summed
    algebraically; true-pair co-blocking is one projection of the (small)
    truth table. No join touches the quadratic space.

    ``schemes`` maps scheme name -> a function (column name -> block-key
    Column), applied to ``records.name_col`` for the block counts and to
    the truth table's ``a``/``b`` columns for co-blocking (default:
    first-char and last-char schemes). ``true_pairs`` has columns (a, b)
    of matching record names.
    """
    if schemes is None:
        schemes = {
            "first_char": lambda c: F.substring(F.col(c), 1, 1),
            "last_char": lambda c: F.substring(F.col(c), -1, 1),
        }
    out = None
    n_records = records.count()
    n_true = true_pairs.count()
    for scheme, key_of in schemes.items():
        per_block = (records
                     .groupBy(key_of(name_col).alias("blk"))
                     .agg(F.count(F.lit(1)).alias("nb")))
        cand = per_block.agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.col("nb") * (F.col("nb") - 1) / 2).cast("long")
            .alias("n_cand_pairs"))
        # a true pair survives blocking iff both members share a key
        co = true_pairs.filter(key_of("a") == key_of("b")) \
            .agg(F.count(F.lit(1)).cast("long").alias("n_true_cand"))
        row = (cand.crossJoin(co)
               .select(
                   F.lit(scheme).alias("scheme"),
                   F.lit(n_records).cast("long").alias("n_records"),
                   F.col("n_blocks").cast("long"),
                   "n_cand_pairs",
                   F.lit(n_true).cast("long").alias("n_true_pairs"),
                   "n_true_cand",
                   F.round(F.col("n_true_cand") / F.lit(n_true), 6)
                   .alias("pair_completeness"),
                   F.round(1 - F.col("n_cand_pairs")
                           / F.lit(n_records * (n_records - 1) / 2.0), 6)
                   .alias("reduction_ratio")))
        out = row if out is None else out.unionByName(row)
    return out


def fellegi_sunter(pairs: DataFrame, fields: list[str],
                   label_col: str = "is_match",
                   labeled_col: str = "labeled",
                   upper: float = 2.0, lower: float = -2.0) -> DataFrame:
    """Probabilistic record linkage (Fellegi & Sunter 1969; the Splink /
    census-linkage model) -> every candidate pair scored and classified:
    (pair columns..., match_weight, match_probability, decision).

    ``pairs`` carries one row per candidate pair with boolean agreement
    columns ``fields`` (the comparison vector gamma), a boolean
    ``labeled_col`` mask selecting the training subset, and ``label_col``
    ground truth valid where labeled. Parameters are estimated from the
    labeled subset with add-one (Laplace) smoothing so no field ever
    yields a zero/one probability:

        m_k = P(gamma_k = 1 | match)      = (agree_k_in_M + 1) / (|M| + 2)
        u_k = P(gamma_k = 1 | non-match)  = (agree_k_in_U + 1) / (|U| + 2)

    Each pair's match weight is the log2 likelihood ratio
    sum_k [ gamma_k * log2(m_k/u_k) + (1-gamma_k) * log2((1-m_k)/(1-u_k)) ]
    plus the prior log-odds log2(P(M)/P(U)) (also Laplace-smoothed), and
    match_probability = 1 / (1 + 2^-weight). The decision implements the
    FS three-way rule: 'link' above ``upper``, 'non-link' below ``lower``,
    'possible-link' (clerical review band) between.

    This is the record-linkage step the reference sidesteps by linking
    exact surfaces only (saber/utils/grounding_utils.py:65-66); at
    web scale fuzzy coreference between surface variants needs a
    calibrated matcher, and FS weights are the standard one.

    Scale shape: parameter estimation is ONE hash agg over the labeled
    subset reduced to a single row; scoring is a broadcast crossJoin of
    that 1-row parameter table onto the pair stream — the pairs
    themselves never shuffle. Works unchanged on 10^12 candidate pairs
    because everything per-pair is narrow.
    """
    g = lambda c: F.col(c).cast("int")
    lab = pairs.filter(F.col(labeled_col))
    is_m = F.col(label_col).cast("int")
    aggs = [F.sum(is_m).alias("_nm"),
            F.sum(1 - is_m).alias("_nu")]
    for k in fields:
        aggs.append(F.sum(is_m * g(k)).alias(f"_ma_{k}"))
        aggs.append(F.sum((1 - is_m) * g(k)).alias(f"_ua_{k}"))
    params = lab.agg(*aggs)
    mcol = lambda k: (F.col(f"_ma_{k}") + 1) / (F.col("_nm") + 2)
    ucol = lambda k: (F.col(f"_ua_{k}") + 1) / (F.col("_nu") + 2)

    scored = F.broadcast(params).crossJoin(pairs)
    prior = F.log2((F.col("_nm") + 1) / (F.col("_nu") + 1))
    w = prior
    for k in fields:
        w = w + F.when(g(k) == 1, F.log2(mcol(k) / ucol(k))) \
            .otherwise(F.log2((1 - mcol(k)) / (1 - ucol(k))))
    keep = [c for c in pairs.columns]
    return (scored
            .withColumn("match_weight", F.round(w, 6))
            .withColumn("match_probability",
                        F.round(F.lit(1) / (F.lit(1) + F.pow(F.lit(2.0),
                                                             -w)), 6))
            .withColumn("decision",
                        F.when(F.col("match_weight") >= upper, "link")
                        .when(F.col("match_weight") <= lower, "non-link")
                        .otherwise("possible-link"))
            .select(*keep, "match_weight", "match_probability", "decision"))


def sorted_neighborhood(records: DataFrame, key_exprs: dict,
                        window: int = 3, name_col: str = "name",
                        num_ranges: int = 32) -> DataFrame:
    """Multi-pass sorted-neighborhood candidate generation (Hernandez &
    Stolfo SIGMOD'95) -> (pass, a, b, gap): for each pass, sort the
    records by that pass's key and emit every pair whose rank distance
    is < ``window``.

    The other classic blocking family next to key-equality blocking
    (``blocking_metrics``): sorting tolerates typos that equality blocks
    miss (adjacent-in-order strings co-window even when their block keys
    differ), and multi-pass with a second key (e.g. the reversed string)
    recovers first-character errors. Candidate volume is exactly
    n*(window-1) - boundary per pass — linear, never quadratic.

    ``key_exprs`` maps pass name -> function (record column name ->
    sort-key Column). Ranks must be unique per pass, so the sort key is
    tie-broken by the record itself; records should be distinct on
    ``name_col``.

    Scale shape: the global sort is a range repartition (sampled
    boundaries), NOT a single-task window — ranks come from
    per-partition row_numbers plus broadcast partition offsets (the
    standard distributed-rank construction), so no stage ever sees more
    than one partition's rows. Pairing is explode(1..window-1) + an
    equi-join on rank — a co-partitioned shuffle join, linear in n.
    Rank values are globally well-defined by the (unique) sort key, so
    the output is independent of the sampled range boundaries.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    out = None
    for pass_name, key_of in key_exprs.items():
        base = (records
                .select(F.col(name_col).alias("a"),
                        key_of(name_col).alias("_k"))
                .repartitionByRange(num_ranges, F.col("_k"), F.col("a")))
        from pyspark.sql import Window
        pid = base.withColumn("_pid", F.spark_partition_id())
        wloc = Window.partitionBy("_pid").orderBy("_k", "a")
        local = pid.withColumn("_rn", F.row_number().over(wloc))
        sizes = local.groupBy("_pid").agg(F.max("_rn").alias("_np"))
        woff = Window.orderBy("_pid") \
            .rowsBetween(Window.unboundedPreceding, -1)
        offs = sizes.withColumn(
            "_off", F.coalesce(F.sum("_np").over(woff), F.lit(0)))
        ranked = (local.join(F.broadcast(offs.select("_pid", "_off")),
                             "_pid")
                  .select("a", (F.col("_rn") + F.col("_off")).alias("_r")))
        probes = ranked.select(
            F.col("a"),
            F.explode(F.sequence(
                F.col("_r") + 1,
                F.col("_r") + window - 1)).alias("_r2"),
            (F.col("_r")).alias("_r1"))
        cand = (probes.join(ranked.select(F.col("a").alias("b"),
                                          F.col("_r").alias("_r2")),
                            "_r2")
                .select(F.lit(pass_name).alias("pass"),
                        "a", "b",
                        (F.col("_r2") - F.col("_r1")).cast("long")
                        .alias("gap")))
        out = cand if out is None else out.unionByName(cand)
    return out


def fellegi_sunter_em(pairs: DataFrame, fields: list[str],
                      iterations: int = 2, init_lambda: float = 0.5,
                      init_m: float = 0.8, init_u: float = 0.2,
                      upper: float = 2.0, lower: float = -2.0) -> DataFrame:
    """UNSUPERVISED Fellegi-Sunter via expectation-maximization (the
    Splink training loop; Winkler 1988) -> every candidate pair scored
    and classified with parameters learned from the pairs alone — no
    labels anywhere.

    Per EM round:
      E-step: responsibility r = lam*P(gamma|M) / (lam*P(gamma|M) +
              (1-lam)*P(gamma|U)) with class-conditional independence
              across ``fields`` (the naive-Bayes FS likelihood);
      M-step: lam   = (sum r + 1) / (n + 2)
              m_k   = (sum r*gamma_k + 1) / (sum r + 2)
              u_k   = (sum (1-r)*gamma_k + 1) / (sum (1-r) + 2)
              (add-one smoothed so a perfectly separating field can
              never drive a weight to +-infinity).

    After ``iterations`` rounds the pairs are scored exactly like the
    supervised variant: match_weight = log2(lam/(1-lam)) + the log2
    likelihood ratio, match_probability = 1/(1+2^-w), and the FS
    three-way decision.

    Scale shape: the pair stream is localCheckpointed once (EM makes
    iterations+1 passes; at corpus scale swap for a disk persist), each
    M-step is ONE partial+final hash agg reduced to a single row, and the
    driver collects only that parameter row per round (schema-sized,
    like kmeans' k x d model — never data rows). Scoring is a narrow
    map with the learned parameters as literals: zero joins, zero
    shuffles on the pairs.
    """
    base = pairs.localCheckpoint(eager=True)
    g = lambda c: F.col(c).cast("int")
    lam, m, u = init_lambda, dict.fromkeys(fields, init_m), \
        dict.fromkeys(fields, init_u)

    def _resp():
        pm, pu = F.lit(1.0), F.lit(1.0)
        for k in fields:
            pm = pm * F.when(g(k) == 1, F.lit(m[k])) \
                .otherwise(F.lit(1 - m[k]))
            pu = pu * F.when(g(k) == 1, F.lit(u[k])) \
                .otherwise(F.lit(1 - u[k]))
        return (F.lit(lam) * pm) / ((F.lit(lam) * pm)
                                    + (F.lit(1 - lam) * pu))

    for _ in range(iterations):
        aggs = [F.sum(_resp()).alias("_sr"),
                F.count(F.lit(1)).alias("_n")]
        for k in fields:
            aggs.append(F.sum(_resp() * g(k)).alias(f"_srg_{k}"))
            aggs.append(F.sum(g(k)).alias(f"_tg_{k}"))
        row = base.agg(*aggs).collect()[0]
        sr, n = float(row["_sr"]), int(row["_n"])
        lam = (sr + 1) / (n + 2)
        for k in fields:
            srg, tg = float(row[f"_srg_{k}"]), float(row[f"_tg_{k}"])
            m[k] = (srg + 1) / (sr + 2)
            u[k] = (tg - srg + 1) / ((n - sr) + 2)

    w = F.log2(F.lit(lam) / F.lit(1 - lam))
    for k in fields:
        w = w + F.when(g(k) == 1, F.log2(F.lit(m[k]) / F.lit(u[k]))) \
            .otherwise(F.log2(F.lit(1 - m[k]) / F.lit(1 - u[k])))
    keep = [c for c in pairs.columns]
    return (base
            .withColumn("match_weight", F.round(w, 6))
            .withColumn("match_probability",
                        F.round(F.lit(1) / (F.lit(1) + F.pow(F.lit(2.0),
                                                             -w)), 6))
            .withColumn("decision",
                        F.when(F.col("match_weight") >= upper, "link")
                        .when(F.col("match_weight") <= lower, "non-link")
                        .otherwise("possible-link"))
            .select(*keep, "match_weight", "match_probability", "decision"))


#: Soundex consonant classes (Russell 1918) — patterns are Java∩RE2 so
#: the DuckDB oracle replays the identical chain
SOUNDEX_CLASSES = [("[bfpv]", "1"), ("[cgjkqsxz]", "2"), ("[dt]", "3"),
                   ("l", "4"), ("[mn]", "5"), ("r", "6")]


def phonetic_key(col) -> "F.Column":
    """Soundex-STYLE phonetic blocking key (not byte-exact Soundex: the
    run-collapse happens after vowel removal, so vowel-separated repeats
    collapse too, and the kept first character is never class-merged
    with the first tail code — simplifications that keep the whole chain
    inside portable regexp_replace calls with no backreferences, which
    RE2 lacks). 4 chars, zero-padded: first letter + up to three
    consonant-class digits with adjacent runs collapsed.
    """
    s = F.lower(col)
    tail = F.substring(s, 2, 1 << 30)
    for pat, rep in SOUNDEX_CLASSES:
        tail = F.regexp_replace(tail, pat, rep)
    tail = F.regexp_replace(tail, "[^1-6]", "")
    for d in "123456":
        tail = F.regexp_replace(tail, d + "{2,}", d)
    return F.rpad(F.substring(F.concat(F.substring(s, 1, 1), tail), 1, 4),
                  4, "0")


def phonetic_blocking(names: DataFrame, name_col: str = "name"
                      ) -> DataFrame:
    """Phonetic blocking-key assignment for entity resolution
    -> (name, pkey, block_size).

    The classic third blocking strategy next to key-equality
    (blocking_metrics) and sorted-neighborhood windows: names that sound
    alike share a key, so typo'd and variantly-romanized surfaces land
    in the same candidate block without any pair enumeration. Pair the
    blocks downstream exactly like blocking_metrics does.

    Scale shape: the key is a narrow codegen regexp chain (no Python,
    no join); block_size annotates via ONE count window partitioned on
    the key — a single exchange of the NAME DIMENSION (vocabulary), not
    the corpus, per the sorted_neighborhood convention. (The groupBy +
    join-back alternative reads the name-derivation lineage twice —
    measured 4.8 -> ~1 s steady at sf0.1 on the tokenize-fed query.)
    """
    keyed = names.select(F.col(name_col).alias("name"),
                         phonetic_key(F.col(name_col)).alias("pkey"))
    w = Window.partitionBy("pkey")
    return keyed.select("name", "pkey",
                        F.count(F.lit(1)).over(w).alias("block_size"))


#: accent-fold map (ICU/Lucene ASCIIFolding's Latin-1 + Latin-Extended-A
#: core): each accented character folds to its ASCII base. Declared as a
#: pair of aligned strings so BOTH engines run the identical translate()
#: — cross-engine byte parity without relying on locale-sensitive
#: strip_accents implementations.
FOLD_SRC = ("àáâãäåāăąèéêëēĕėęěìíîïĩīĭįòóôõöøōŏőùúûüũūŭůűç"
            "ćĉčñńņňýÿšśŝşžźżđğłŕŗř")
FOLD_DST = ("aaaaaaaaaeeeeeeeeeiiiiiiiiooooooooo"
            "uuuuuuuuuccccnnnnyysssszzzdglrrr")
assert len(FOLD_SRC) == len(FOLD_DST)


def ascii_fold(col) -> "F.Column":
    """Lowercase + accent-fold a name column into its ER blocking form —
    the normalization step ICU calls ASCII folding and every production
    record-linkage stack (Splink, dedupe, JedAI) applies before exact /
    phonetic / sorted-neighborhood blocking: 'Müller', 'MÜLLER' and
    'Muller' must land in the same block or no downstream comparator
    ever sees the pair. Pure translate() — narrow, zero Python,
    engine-portable (the oracle runs the same aligned map).
    """
    return F.translate(F.lower(col), FOLD_SRC, FOLD_DST)


def folded_blocks(names: DataFrame, name_col: str = "name") -> DataFrame:
    """Group records by their accent-folded blocking key
    -> (folded, n_rows, n_variants): block sizes plus how many RAW
    spellings each block reunites (n_variants >= 2 = the block did work
    that exact-match blocking would have missed).

    Scale shape: the fold is a narrow codegen map; ONE hash agg on the
    folded key with a distinct-variant count (classic two-phase
    distinct agg — partials absorb repeated spellings map-side). Block
    sizes feed blocking_metrics' reduction-ratio / pair-completeness
    audit unchanged.
    """
    return (names
            .select(F.col(name_col).alias("raw"),
                    ascii_fold(F.col(name_col)).alias("folded"))
            .groupBy("folded")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.countDistinct("raw").cast("long").alias("n_variants")))


def nysiis_key(col) -> "F.Column":
    """NYSIIS-STYLE phonetic key (Taft 1970, the New York State
    Identification and Intelligence System code — the second classic
    phonetic algorithm next to phonetic_key's Soundex-style code;
    NYSIIS keeps more vowel-position structure, so the two keys make
    INDEPENDENT blocking passes and their union recovers pairs either
    alone would miss). Like phonetic_key this is a documented
    simplification, not byte-exact NYSIIS: every step is a portable
    backreference-free regexp/translate so both engines compute the
    identical key — the simplifications (no positional H/W context
    rules, single-pass maps) are stated here rather than hidden:

      1. lowercase, strip non-letters
      2. prefixes:  mac->mcc, kn->nn, k->c, ph->ff, pf->ff, sch->sss
      3. suffixes:  ee->y, ie->y, dt/rt/rd/nt/nd->d
      4. body maps: ev->af, q->g, z->s, m->n, kn->n, k->c, sch->sss,
                    ph->ff
      5. vowels (a e i o u) after the FIRST character -> a
      6. collapse repeated characters; drop trailing s; ay->y;
         drop trailing a

    -> variable-length key, first char preserved.
    """
    s = F.regexp_replace(F.lower(col), "[^a-z]", "")
    # prefixes
    s = F.regexp_replace(s, "^mac", "mcc")
    s = F.regexp_replace(s, "^kn", "nn")
    s = F.regexp_replace(s, "^k", "c")
    s = F.regexp_replace(s, "^(ph|pf)", "ff")
    s = F.regexp_replace(s, "^sch", "sss")
    # suffixes
    s = F.regexp_replace(s, "(ee|ie)$", "y")
    s = F.regexp_replace(s, "(dt|rt|rd|nt|nd)$", "d")
    # body maps (first char shielded below by reattaching it)
    head = F.substring(s, 1, 1)
    tail = F.substring(s, 2, 1 << 30)
    tail = F.regexp_replace(tail, "ev", "af")
    tail = F.translate(tail, "qzm", "gsn")
    tail = F.regexp_replace(tail, "kn", "n")
    tail = F.regexp_replace(tail, "k", "c")
    tail = F.regexp_replace(tail, "sch", "sss")
    tail = F.regexp_replace(tail, "ph", "ff")
    tail = F.translate(tail, "eiou", "aaaa")
    s = F.concat(head, tail)
    # collapse repeats letter-by-letter: the generic (.)\1+ needs a
    # backreference, which RE2 (the oracle engine's dialect) lacks —
    # same constraint the Soundex-style key documents
    for ch in "abcdefghijklmnopqrstuvwxyz":
        s = F.regexp_replace(s, ch + "{2,}", ch)
    s = F.regexp_replace(s, "s$", "")
    s = F.regexp_replace(s, "ay$", "y")
    s = F.regexp_replace(s, "a$", "")
    return s


def dice_bigram_similarity(col_a, col_b) -> "F.Column":
    """Sorensen-Dice coefficient on DISTINCT character bigrams
    (Sorensen 1948; Dice 1945) as a pure row-level codegen expression
    — the classic cheap string-similarity VERIFIER for blocked
    candidate pairs (blocking recalls, Dice verifies; Levenshtein in
    fuzzy_link is edit-based, Dice is set-based and
    transposition-tolerant):

        dice(a, b) = 2 |B(a) ∩ B(b)| / (|B(a)| + |B(b)|)

    over distinct bigram SETS (set, not multiset — the engine-
    portable convention; strings shorter than 2 chars have empty
    bigram sets -> dice 0). No join, no explode — array HOFs inside
    the row.
    """
    def bigrams(c):
        c = F.col(c) if isinstance(c, str) else c
        return F.array_distinct(F.when(
            F.length(c) >= 2,
            F.transform(F.sequence(F.lit(1), F.length(c) - 1),
                        lambda i: c.substr(i, F.lit(2)))
        ).otherwise(F.array().cast("array<string>")))
    ba, bb = bigrams(col_a), bigrams(col_b)
    inter = F.size(F.array_intersect(ba, bb))
    denom = F.size(ba) + F.size(bb)
    return F.when(denom > 0, 2.0 * inter / denom).otherwise(F.lit(0.0))


def dice_verified_pairs(names: DataFrame, name_col: str = "name",
                        id_col: str = "id",
                        threshold: float = 0.6) -> DataFrame:
    """Blocked candidate generation + Dice verification: NYSIIS-style
    blocks (nysiis_key) propose candidate pairs, dice_bigram_similarity
    verifies — the standard two-stage ER comparator (never all-pairs
    ACROSS blocks; note this operator carries NO block-size cap, unlike
    ifp_sameas's max_fan — a degenerate key, e.g. the empty key all
    non-alphabetic names share, forms one quadratic block. Production
    deployments on dirty name tables should pre-filter empty keys and
    cap block sizes the way ifp_sameas does; left uncapped here because
    the oracle contract covers the uncapped semantics. ADVICE r5
    docstring fix.)

    -> (id_a, id_b, name_a, name_b, dice 6dp) for in-block pairs with
    dice >= threshold, canonical id_a < id_b.
    """
    keyed = names.select(F.col(id_col).alias("id"),
                         F.col(name_col).alias("nm"),
                         nysiis_key(F.col(name_col)).alias("bk"))
    a = keyed.select(F.col("id").alias("id_a"),
                     F.col("nm").alias("name_a"), "bk")
    b = keyed.select(F.col("id").alias("id_b"),
                     F.col("nm").alias("name_b"), "bk")
    pairs = (a.join(b, "bk")
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "name_a", "name_b",
                     F.round(dice_bigram_similarity(
                         F.col("name_a"), F.col("name_b")), 6)
                     .alias("dice")))
    return pairs.filter(F.col("dice") >= threshold)
