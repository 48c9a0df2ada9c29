"""Entity linking (grounding) as a broadcast hash join.

Reference behavior: one HTTP GET per entity label to EXTRACT 2.0, response
keyed by EXACT surface text; each grounded mention gets
``xrefs = [{namespace, id[, organism-id]}]``
(saber/utils/grounding_utils.py:11-68, exact-match keying at :65-66; one
surface -> many xrefs).

Rebuild: mentions LEFT JOIN broadcast(pre-aggregated dictionary) on exact
(text, label). The many-xrefs-per-surface fan-out is collapsed on the TINY
side before the join (groupBy over the dictionary, a few thousand rows), so
the join is 1:1 and the multi-TB mentions side never shuffles — Catalyst
picks BroadcastHashJoin and the stage stays narrow. Aggregating after the
join instead would shuffle the full mentions table; that is the plan we
explicitly avoid at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prepare_dictionary(dictionary: DataFrame) -> DataFrame:
    """(surface,label,namespace,xref_id,organism_id,canonical_id) ->
    one row per (surface,label) with an xrefs ArrayType column."""
    return (
        dictionary.groupBy("surface", "label")
        .agg(
            F.first("canonical_id").alias("canonical_id"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("namespace"),
                        F.col("xref_id").alias("id"),
                        F.col("organism_id"),
                    )
                )
            ).alias("xrefs"),
        )
        .withColumnRenamed("surface", "text")
    )


def dict_ngram_mentions(tokens: DataFrame, dictionary: DataFrame,
                        max_len: int = 2) -> DataFrame:
    """Dictionary mention detection as pure DataFrame ops — the
    SQL-expressible twin of the Arrow tagger's dictionary path
    (operators/tagger.py), covering MULTI-token surfaces without a Python
    boundary.

    tokens: (doc_id, pos, token) from tokenize; dictionary: the grounding
    dict (surface, label, ..., canonical_id). Returns
    (doc_id, start_pos, n_tokens, surface, label, canonical_id).

    Semantics (reference parity: exact case-sensitive surface keying,
    saber/utils/grounding_utils.py:65-66; longest-match-wins like the
    tagger's greedy n-gram scan): candidate n-gram surfaces (n ≤ max_len)
    are formed with ``lead`` windows over (doc_id, pos) and matched by
    broadcast left-joins against the dictionary split by surface length. A
    match is suppressed when some strictly LONGER match contains its whole
    span (classic longest-match; identical to the oracle twin's
    covered-position rule for max_len = 2, the dictionary's longest
    surface). Equal-length overlapping matches are all emitted; a surface
    carrying several (label, canonical) entries emits one mention per
    entry.

    Scale shape — ONE pass, zero self-joins: the token stream shuffles
    ONCE on doc_id; the lead window, per-length broadcast left-joins
    (1:1 — the dictionary is pre-grouped per surface), and the suppression
    check all run on that same partitioning. Suppression is a windowed
    frame aggregate, not a join: with L(q) = longest match length starting
    at q, an n-gram at p is contained iff
    max over q ∈ [p-max_len+1, p] of (q + L(q) when L(q) > n) ≥ p + n —
    frame-row-only expressions, so it is a single max() over a bounded
    ROWS frame (token positions are consecutive, so ROWS == RANGE).
    Emission is one explode of the per-position surviving-match array.
    No union of per-length branches, no anti-joins, no duplicated
    subtrees, no Python.
    """
    from pyspark.sql import Window

    dict_rows = (dictionary
                 .select("surface", "label", "canonical_id").distinct()
                 .withColumn("_n", F.size(F.split("surface", " "))))
    # one row per surface (1:1 join — a multi-entry surface must not
    # duplicate token rows, which would corrupt the ROWS frame offsets)
    dict_by_len = {
        n: (dict_rows.filter(F.col("_n") == n)
            .groupBy("surface")
            .agg(F.array_sort(F.collect_list(F.struct(
                F.col("label"), F.col("canonical_id")))).alias(f"_e{n}"))
            .withColumnRenamed("surface", f"_s{n}"))
        for n in range(1, max_len + 1)
    }

    w = Window.partitionBy("doc_id").orderBy("pos")
    base = tokens.select(
        "doc_id", "pos", "token",
        *[F.lead("token", i).over(w).alias(f"_t{i}")
          for i in range(1, max_len)])
    for n in range(1, max_len + 1):
        surf_n = (F.col("token") if n == 1 else
                  F.when(F.col(f"_t{n-1}").isNotNull(),
                         F.concat_ws(" ", F.col("token"),
                                     *[F.col(f"_t{i}")
                                       for i in range(1, n)])))
        base = base.join(F.broadcast(dict_by_len[n]),
                         surf_n == F.col(f"_s{n}"), "left")

    # L(p): longest match length starting at p (0 if none)
    length_expr = F.greatest(*[
        F.when(F.col(f"_s{n}").isNotNull(), F.lit(n)).otherwise(F.lit(0))
        for n in range(1, max_len + 1)]) if max_len > 1 else (
        F.when(F.col("_s1").isNotNull(), F.lit(1)).otherwise(F.lit(0)))
    base = base.withColumn("_L", length_expr)

    frame = w.rowsBetween(-(max_len - 1), 0)
    survivors = []
    for n in range(1, max_len + 1):
        m = F.struct(
            F.col("pos").cast("long").alias("start_pos"),
            F.lit(n).cast("long").alias("n_tokens"),
            F.col(f"_s{n}").alias("surface"),
            F.col(f"_e{n}").alias("entries"))
        if n == max_len:
            survivors.append(F.when(F.col(f"_s{n}").isNotNull(), m))
        else:
            containing_end = F.max(
                F.when(F.col("_L") > n, F.col("pos") + F.col("_L"))
            ).over(frame)
            suppressed = containing_end >= F.col("pos") + n
            survivors.append(F.when(
                F.col(f"_s{n}").isNotNull()
                & ~F.coalesce(suppressed, F.lit(False)), m))

    # windows must be evaluated over the FULL consecutive token stream
    # (the ROWS frame assumes adjacent positions), so materialize the
    # surviving-match array BEFORE pruning non-matching positions
    base = base.withColumn(
        "_kept", F.filter(F.array(*survivors), lambda x: x.isNotNull()))
    return (base
            .filter(F.size("_kept") > 0)
            .select("doc_id", F.explode("_kept").alias("m"))
            .select("doc_id", F.col("m.start_pos").alias("start_pos"),
                    F.col("m.n_tokens").alias("n_tokens"),
                    F.col("m.surface").alias("surface"),
                    F.explode(F.col("m.entries")).alias("e"))
            .select("doc_id", "start_pos", "n_tokens", "surface",
                    F.col("e.label").alias("label"),
                    F.col("e.canonical_id").alias("canonical_id")))


def fuzzy_link(tokens: DataFrame, dictionary: DataFrame,
               max_edits: int = 1) -> DataFrame:
    """Typo-tolerant dictionary linking: each token links to the nearest
    single-token dictionary surface within ``max_edits`` Levenshtein edits
    (best match per token: fewest edits, ties by lexicographically
    smallest surface — deterministic). Exact matches are the n_edits=0
    case, so this strictly extends the reference's exact-surface keying
    (saber/utils/grounding_utils.py:65-66) the way a production grounding
    service tolerates OCR/typo noise.

    -> (doc_id, pos, token, surface, label, canonical_id, n_edits).

    Scale shape: the Levenshtein comparison runs on the DISTINCT-token
    VOCABULARY (one hash agg collapses the corpus to |V| rows) against the
    broadcast dictionary — a BroadcastNestedLoopJoin over |V| x |dict|
    rows, which is the documented cheap case (the dictionary is a
    broadcast constant; the corpus-sized token stream never meets the
    quadratic comparison). The winning matches (≤ |dict| x (max_edits+1)
    distinct tokens in practice) broadcast-join back onto the stream, so
    the corpus itself stays unshuffled end-to-end. For gazetteer-scale
    dictionaries add length/prefix blocking keys before the comparison;
    at 14 surfaces it would only add plan nodes.
    """
    from pyspark.sql import Window

    dict_rows = (dictionary
                 .filter(~F.col("surface").contains(" "))
                 .select("surface", "label", "canonical_id").distinct())
    vocab = tokens.select("token").distinct()
    cand = (vocab.join(F.broadcast(dict_rows),
                       F.levenshtein("token", "surface") <= max_edits)
            .withColumn("n_edits",
                        F.levenshtein("token", "surface").cast("long")))
    w = Window.partitionBy("token").orderBy("n_edits", "surface")
    best = (cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
    return (tokens.join(F.broadcast(best), "token")
            .select("doc_id", "pos", "token", "surface", "label",
                    "canonical_id", "n_edits"))


def link_mentions(mentions: DataFrame, dictionary: DataFrame) -> DataFrame:
    """mentions ⋈ broadcast dict -> + canonical_id, xrefs array.

    Unlinked mentions are kept with canonical_id = NULL (the reference keeps
    ungrounded ents without an 'xrefs' key, grounding_utils.py:63-66).
    """
    return mentions.join(F.broadcast(prepare_dictionary(dictionary)),
                         on=["text", "label"], how="left")


def disambiguate_link(tokens: DataFrame, dictionary: DataFrame,
                      materialize: bool = True) -> DataFrame:
    """Context-coherence disambiguation for AMBIGUOUS dictionary surfaces
    -> (doc_id, pos, surface, canonical_id, score, n_cands).

    The reference grounds by exact surface and, when EXTRACT returns
    several xrefs, simply attaches all of them
    (saber/utils/grounding_utils.py:53-66) — it never picks one. A KG
    builder must: the standard document-coherence heuristic (Cucerzan
    2007 and every wikification system since) scores each candidate
    sense by how strongly it co-occurs with the document's UNambiguous
    entities, then takes the argmax.

    Deterministic formulation over a (surface, label, canonical_id)
    dictionary where a surface may map to several canonical ids:
      1. sure mentions  = tokens matching single-candidate surfaces;
      2. coherence stats = entity co-occurrence counts (n_docs per
         unordered pair) computed from the SURE mentions only;
      3. each candidate of an ambiguous mention scores
         sum(n_docs[cand, e]) over the doc's distinct sure entities e;
      4. argmax per mention, ties by smallest canonical_id — total
         order, so the DuckDB twin reproduces it exactly.
    Candidates with no coherence evidence score 0 (kept: row 4's
    tie-break still yields a deterministic sense).

    Scale shape: the dictionary (and thus the candidate table and the
    sure-pair co-occurrence stats, both bounded by dictionary size) is
    broadcast; the corpus-side token table never shuffles to match
    surfaces. The doc-coherence expansion is ONE doc_id equi-join
    (ambiguous mentions x the doc's distinct sure entities — both sides
    hash-partition on doc_id; fan-out bounded by dictionary size, not
    corpus size), then a broadcast lookup into the coherence table, ONE
    (doc, pos, cand) agg, and a top-1 window per mention whose vote list
    is bounded by the dictionary's ambiguity degree.
    """
    cands = (dictionary.select("surface", "canonical_id").distinct()
             .withColumn("n_cands",
                         F.count(F.lit(1)).over(
                             Window.partitionBy("surface"))))
    # ONE pass over the corpus-side token stream: match ALL candidate
    # surfaces, materialize the (small, dictionary-bounded) match set,
    # then derive the sure/ambiguous halves from it — the split-first
    # formulation re-derives the full tokenize lineage twice (measured
    # ~2x the query time at sf0.1)
    matched = tokens.join(F.broadcast(cands),
                          tokens.token == F.col("surface")).select(
        "doc_id", "pos", "surface", "canonical_id", "n_cands")
    if materialize:
        matched = matched.localCheckpoint(eager=True)
    doc_ents = (matched.filter(F.col("n_cands") == 1)
                .select("doc_id", "canonical_id").distinct())
    a, b = doc_ents.alias("a"), doc_ents.alias("b")
    cooc = (a.join(b, "doc_id")
            .filter(F.col("a.canonical_id") < F.col("b.canonical_id"))
            .groupBy(F.col("a.canonical_id").alias("x"),
                     F.col("b.canonical_id").alias("y"))
            .agg(F.count(F.lit(1)).alias("n_docs")))
    cooc_sym = cooc.unionByName(cooc.select(F.col("y").alias("x"),
                                            F.col("x").alias("y"), "n_docs"))
    ambig = matched.filter(F.col("n_cands") > 1)
    scored = (ambig
              .join(doc_ents.withColumnRenamed("canonical_id", "ctx"),
                    "doc_id", "left")
              .join(F.broadcast(cooc_sym),
                    (F.col("canonical_id") == F.col("x"))
                    & (F.col("ctx") == F.col("y")), "left")
              .groupBy("doc_id", "pos", "surface", "canonical_id", "n_cands")
              .agg(F.coalesce(F.sum("n_docs"), F.lit(0)).alias("score")))
    win = Window.partitionBy("doc_id", "pos").orderBy(
        F.col("score").desc(), F.col("canonical_id").asc())
    return (scored.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .select("doc_id", "pos", "surface", "canonical_id",
                    F.col("score").cast("long").alias("score"),
                    F.col("n_cands").cast("long").alias("n_cands")))


# candidate long form: 1-8 alpha words immediately before "(ABBR)" with a
# 2-8 uppercase-letter abbreviation — the Schwartz-Hearst candidate window
# (len(abbr) .. 2*len(abbr) words) widened to a fixed 8; no lookbehind, so
# the identical pattern runs on Java regex and RE2 (the pii_scrub dialect
# convention)
ABBREV_PATTERN = r"(?:[A-Za-z]+ ){1,8}\([A-Z]{2,8}\)"


def abbrev_aliases(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Abbreviation/long-form alias harvesting -> (abbr, long_form,
    n_docs): the deterministic initial-letter subset of Schwartz &
    Hearst 2003 (the algorithm behind every biomedical abbreviation
    dictionary; reference context: saber grounds surfaces verbatim,
    saber/utils/grounding_utils.py:53-66, so harvested aliases are how
    a web-scale build widens that dictionary).

    Rule: for each textual "long form (ABBR)" site, take the |ABBR|
    words immediately before the paren; ACCEPT iff their upper-cased
    initials spell ABBR exactly. Long forms are lower-cased for alias-
    table dedup. The full Schwartz-Hearst inner-character matcher
    accepts more (letters may match mid-word); this subset never
    accepts a wrong pair — precision-first, the right trade for
    auto-extending a grounding dictionary.

    Scale shape: candidate sites come from ONE in-row
    regexp_extract_all pass over the FULL match (a two-capture-group
    double extraction was A/B-measured 2.2x slower at sf0.1 — the regex
    runs once here and the site splits on the literal paren with cheap
    string ops); word slicing/initials are array ops inside codegen;
    the only shuffle is the final (abbr, long_form) count-distinct agg,
    keyed on the alias space (vocab-like, not corpus-like). Zero
    Python.
    """
    full = F.regexp_extract_all(F.col(text_col), F.lit(ABBREV_PATTERN),
                                F.lit(0))
    m = (docs
         .select(F.col(id_col), F.explode(full).alias("site"))
         .select(id_col,
                 F.split(F.regexp_replace("site", r"\)$", ""),
                         r" ?\(").alias("parts"))
         .select(id_col,
                 F.split(F.trim(F.element_at("parts", 1)), " ")
                 .alias("words"),
                 F.element_at("parts", 2).alias("abbr")))
    n = F.length("abbr")
    sized = m.filter(F.size("words") >= n)
    cand = F.slice("words", F.size("words") - n + 1, n)
    initials = F.array_join(
        F.transform(cand, lambda w: F.upper(F.substring(w, 1, 1))), "")
    ok = (sized
          .select(id_col, "abbr",
                  F.lower(F.array_join(cand, " ")).alias("long_form"),
                  initials.alias("ini"))
          .filter(F.col("ini") == F.col("abbr")))
    return (ok.groupBy("abbr", "long_form")
            .agg(F.count_distinct(F.col(id_col)).alias("n_docs")))


def entity_salience(linked: DataFrame, doc_lens: DataFrame,
                    id_col: str = "doc_id", pos_col: str = "pos",
                    entity_col: str = "canonical_id") -> DataFrame:
    """Per-(doc, entity) salience features -> (doc_id, canonical_id,
    n_mentions, first_pos, last_pos, spread, doc_len, salience).

    The standard entity-salience signal set (Dunietz & Gillick 2014, EACL:
    frequency + first-mention position are the two dominant features): an
    entity mentioned often and early is what the document is ABOUT; one
    mentioned once near the end is background. A KG build attaches
    salience to every (page, entity) pair so triple confidence can weight
    aboutness — the reference attaches every match indiscriminately
    (saber/utils/grounding_utils.py:53-66); at web scale that drowns the
    graph in background noise.

    salience = n_mentions * (1 - first_pos / doc_len), rounded to 6 —
    integer inputs, one double expression, engine-portable.

    doc_lens is (doc_id, doc_len) = token count per document, computed
    once by the caller from the token table (the same agg the vocab stage
    already runs). Scale: ONE hash agg over the linked-mentions table
    (map-side combinable) + ONE equi-join on doc_id against the |docs|-
    sized length table. No windows, no Python.
    """
    per = (linked.groupBy(id_col, entity_col)
           .agg(F.count(F.lit(1)).alias("n_mentions"),
                F.min(pos_col).cast("long").alias("first_pos"),
                F.max(pos_col).cast("long").alias("last_pos")))
    return (per.join(doc_lens, id_col)
            .select(id_col, entity_col, "n_mentions", "first_pos",
                    "last_pos",
                    (F.col("last_pos") - F.col("first_pos"))
                    .alias("spread"),
                    F.col("doc_len").cast("long").alias("doc_len"),
                    F.round(
                        F.col("n_mentions").cast("double")
                        * (F.lit(1.0) - F.col("first_pos").cast("double")
                           / F.col("doc_len").cast("double")),
                        6).alias("salience")))


NEGATION_CUES = ("no", "not", "without", "never", "absence", "absent",
                 "denies", "denied", "negative", "neither", "nor")


def negation_flags(linked: DataFrame, tokens: DataFrame, window: int = 5,
                   id_col: str = "doc_id", pos_col: str = "pos",
                   entity_col: str = "canonical_id",
                   cues: tuple[str, ...] = NEGATION_CUES) -> DataFrame:
    """NegEx-style pre-scope negation detection -> per-entity rates:
    (canonical_id, n_mentions, n_negated, neg_rate).

    Clinical/biomedical KG construction MUST separate asserted from
    negated mentions ("no evidence of carcinoma" is not a carcinoma
    triple) — the NegEx algorithm (Chapman et al. 2001, J. Biomed.
    Inform. 34:301-310) flags a concept negated when a cue term precedes
    it within a fixed token window. This is the deterministic pre-scope
    half (cue within `window` tokens BEFORE the mention, same document);
    the reference pipeline has no negation handling at all, which is a
    correctness gap for its own UMLS linking use case.

    Scale shape: cue positions are a narrow filter of the token table
    (pushdown-eligible); mentions join cues on the doc_id equi-key with
    the window inequality as a residual — per-document blocking, so the
    join never goes all-pairs (a document's cue count is bounded by its
    length). Two hash aggs after the join. neg_rate is one double
    division over exact counts, rounded to 6.
    """
    cue_pos = (tokens.filter(F.lower(F.col("token")).isin(*cues))
               .select(F.col(id_col).alias("cd"),
                       F.col(pos_col).alias("cp")))
    m = linked.select(id_col, pos_col, entity_col)
    negated = (m.join(cue_pos,
                      (m[id_col] == cue_pos.cd)
                      & (cue_pos.cp < m[pos_col])
                      & (cue_pos.cp >= m[pos_col] - window),
                      "left_semi")
               .groupBy(entity_col)
               .agg(F.count(F.lit(1)).alias("n_negated")))
    per = (m.groupBy(entity_col)
           .agg(F.count(F.lit(1)).alias("n_mentions")))
    return (per.join(negated, entity_col, "left")
            .select(entity_col, "n_mentions",
                    F.coalesce("n_negated", F.lit(0)).cast("long")
                     .alias("n_negated"),
                    F.round(F.coalesce("n_negated", F.lit(0))
                            .cast("double") / F.col("n_mentions"), 6)
                     .alias("neg_rate")))


def entity_hindex(linked: DataFrame, label_col: str = "label",
                  doc_col: str = "doc_id") -> DataFrame:
    """Hirsch-index entity salience over linked mentions
    -> (label, h_index, n_docs, total_mentions).

    h = the largest h such that the entity has >= h documents with >= h
    mentions each (Hirsch PNAS 2005, applied to mention evidence instead
    of citations) — a breadth-AND-depth salience scalar that a single
    max or sum cannot fake: one viral page (depth without breadth) or a
    thousand single-mention pages (breadth without depth) both score
    h = 1. Computed by the sorted-rank identity
    h = max over ranked docs of min(rank, mentions_at_rank).

    Scale shape: one (label, doc) agg with map-side partials, then a
    per-label rank window over the REDUCED doc counts (gini_concentration
    convention). Hub entities put their whole doc list in one window
    task; since h <= sqrt(total_mentions), a 100-TB deployment caps the
    window input per label to its top-K docs by count (K ~ 10^4 covers
    any plausible h) with a WindowGroupLimit-friendly pre-filter.
    """
    per_doc = (linked.groupBy(label_col, doc_col)
               .agg(F.count(F.lit(1)).alias("n_mentions")))
    w = (Window.partitionBy(label_col)
         .orderBy(F.desc("n_mentions"), F.asc(doc_col)))
    ranked = per_doc.select(
        label_col, F.col("n_mentions"),
        F.least(F.row_number().over(w).cast("long"),
                F.col("n_mentions")).alias("h_cand"))
    return (ranked.groupBy(label_col)
            .agg(F.max("h_cand").alias("h_index"),
                 F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_mentions").cast("long").alias("total_mentions")))
