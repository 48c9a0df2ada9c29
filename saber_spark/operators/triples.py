"""Triple assembly + dedup: within-sentence co-occurrence pairs.

Reference basis: Saber emits per-document entity annotations — "the building
blocks of (subj, pred, obj) triples" (README.md:36); the multi-model fan-out
unions per-type annotations over the same text (saber/cli/app.py:60-85,
app_utils.py:165-178). The rebuild pairs grounded entities that co-occur in
one sentence into (subj, 'cooccurs_with', obj) edges, then deduplicates into
a weighted edge table (north_rule: "deduplicated triple tables plus
node/edge tables").

Scale design — ONE shuffle instead of a double-shuffled self-join:
  naive: mentions self-join on (url, sent_id)            -> 2 shuffles + skew
  here:  groupBy(url, sent_id).collect_set(canonical_id) -> 1 shuffle,
         then pair expansion with HIGHER-ORDER ARRAY FUNCTIONS (flatten/
         transform/slice) — pure JVM codegen, no Python, no extra shuffle.
Sentences have bounded entity counts (dozens), so the quadratic expansion is
per-row cheap and never skews a reducer the way a hub-key self-join would.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PRED_COOCCURS = "cooccurs_with"


def _ordered_pairs(ents_col):
    """sorted entity array -> array of (subj, obj) structs with
    subj < obj — every unordered pair exactly once, built with
    higher-order array functions (pure JVM codegen, no extra shuffle).
    Per-row cost is quadratic in the array length, which is bounded
    (entities per sentence/document), never corpus-sized."""
    return F.flatten(
        F.transform(
            ents_col,
            lambda x, i: F.transform(
                F.slice(ents_col, i + F.lit(2), F.size(ents_col) - i - F.lit(1)),
                lambda y: F.struct(x.alias("subj"), y.alias("obj")),
            ),
        )
    )


def assemble_triples(linked: DataFrame) -> DataFrame:
    """linked mentions -> one row per (subj, pred, obj, url, sent_id).

    subj < obj lexicographically (undirected co-occurrence, stored once);
    a canonical_id pair appears once per sentence regardless of how many
    times either entity is mentioned in it (collect_set semantics).
    """
    ents = (
        linked.filter(F.col("canonical_id").isNotNull())
        .groupBy("url", "sent_id")
        .agg(F.array_sort(F.collect_set("canonical_id")).alias("ents"))
        .filter(F.size("ents") >= 2)
    )
    pairs = ents.select(
        "url",
        "sent_id",
        F.explode(_ordered_pairs(F.col("ents"))).alias("pair"),
    )
    return pairs.select(
        F.col("pair.subj").alias("subj"),
        F.lit(PRED_COOCCURS).alias("pred"),
        F.col("pair.obj").alias("obj"),
        "url",
        "sent_id",
    )


def proximity_triples(mentions: DataFrame, k: int = 10,
                      id_col: str = "doc_id",
                      pos_col: str = "pos",
                      ent_col: str = "canonical_id",
                      pred: str | None = None) -> DataFrame:
    """Token-window relation extraction: weighted (subj, near_<k>, obj)
    triples for mention pairs lying within ``k`` tokens of each other in
    the same document (distinct positions, distinct entities).

    The corpus here has no sentence punctuation, so position windows are
    the meaningful co-occurrence granularity between doc-level
    (assemble_triples on whole docs) and sentence-level; a token-distance
    window is also the standard relation-candidate generator when no parse
    is available.

    -> (subj, pred, obj, n_cooccur, n_docs): n_cooccur = qualifying
    mention-pair count, n_docs = distinct documents with ≥1 qualifying
    pair.

    Scale shape (same design as assemble_triples): ONE shuffle —
    groupBy(doc).collect_list(struct(pos, ent)) sorted by position, then
    higher-order pair expansion filtered to the window (pure JVM codegen;
    per-doc mention counts are dictionary-bounded, so the per-row
    quadratic never skews a reducer the way a positional self-join on a
    hub doc would) — followed by the final (subj, obj) agg.
    """
    pred = pred or f"near_{k}"
    ents = (mentions
            .filter(F.col(ent_col).isNotNull())
            .groupBy(id_col)
            .agg(F.array_sort(F.collect_list(F.struct(
                F.col(pos_col).alias("pos"),
                F.col(ent_col).alias("ent")))).alias("ms"))
            .filter(F.size("ms") >= 2))
    ms = F.col("ms")
    pairs = F.flatten(F.transform(
        ms,
        lambda x, i: F.transform(
            F.filter(
                F.slice(ms, i + F.lit(2), F.size(ms) - i - F.lit(1)),
                lambda y: (y["pos"] > x["pos"])
                & (y["pos"] - x["pos"] <= k)
                & (y["ent"] != x["ent"])),
            lambda y: F.struct(
                F.least(x["ent"], y["ent"]).alias("subj"),
                F.greatest(x["ent"], y["ent"]).alias("obj")))))
    exploded = (ents.select(F.col(id_col), F.explode(pairs).alias("p"))
                .select(id_col, F.col("p.subj").alias("subj"),
                        F.col("p.obj").alias("obj")))
    return (exploded.groupBy("subj", "obj")
            .agg(F.count(F.lit(1)).alias("n_cooccur"),
                 F.countDistinct(id_col).alias("n_docs"))
            .select("subj", F.lit(pred).alias("pred"), "obj",
                    "n_cooccur", "n_docs"))


def pmi_weights(linked: DataFrame, id_col: str = "doc_id",
                entity_col: str = "canonical_id",
                materialize: bool = True) -> DataFrame:
    """Document-level pointwise mutual information for entity pairs:
    pmi(a,b) = ln( c_ab * N / (c_a * c_b) ), rounded to 6.

    Co-occurrence counts alone over-weight hub entities (a "water"-like
    entity co-occurs with everything); PMI normalizes by marginal document
    frequency, the standard edge-confidence weight for co-occurrence KGs.
    N counts documents containing at least one entity (the event space the
    marginals are drawn from), not the raw corpus size.
    All counts are exact integers computed distributively (distinct +
    partial/final hash aggs); the only floating step is the final ln on an
    exact rational, so a 6-decimal round is engine-portable.

    materialize=True localCheckpoints the distinct (doc, entity) table —
    the plan consumes it three ways (marginals, corpus size, pair
    expansion), so a derived ``linked`` input (the full extract+link
    chain) would otherwise be recomputed per branch.

    Scale shape: pair expansion reuses the collect_set trick from
    assemble_triples (ONE shuffle, per-row bounded); entity marginals are
    |entities| rows — joined onto the pair table by key (Spark broadcasts
    when small; at web scale both joins are shuffle-hash on subj/obj, no
    skew because the pair table is already collapsed to distinct pairs).
    """
    # ungrounded mentions (NULL entity) are not entities — same rule as
    # assemble_triples
    ents = (linked.filter(F.col(entity_col).isNotNull())
            .select(id_col, entity_col).distinct())
    if materialize:
        ents = ents.localCheckpoint(eager=True)
    marginals = (ents.groupBy(entity_col)
                 .agg(F.count(F.lit(1)).alias("c")))
    n_docs = ents.select(id_col).distinct() \
        .agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (ents.groupBy(id_col)
               .agg(F.array_sort(F.collect_set(entity_col)).alias("ents"))
               .filter(F.size("ents") >= 2))
    pairs = per_doc.select(
        F.explode(_ordered_pairs(F.col("ents"))).alias("pair"),
    ).select(F.col("pair.subj").alias("subj"),
             F.col("pair.obj").alias("obj"))
    pair_counts = (pairs.groupBy("subj", "obj")
                   .agg(F.count(F.lit(1)).alias("c_ab")))
    return (pair_counts
            .join(marginals.select(F.col(entity_col).alias("subj"),
                                   F.col("c").alias("c_a")), "subj")
            .join(marginals.select(F.col(entity_col).alias("obj"),
                                   F.col("c").alias("c_b")), "obj")
            .crossJoin(F.broadcast(n_docs))
            .select(
                "subj", "obj",
                F.col("c_ab").cast("long").alias("c_ab"),
                F.round(
                    F.log(F.col("c_ab").cast("double")
                          * F.col("n_docs").cast("double")
                          / (F.col("c_a").cast("double")
                             * F.col("c_b").cast("double"))),
                    6).alias("pmi")))


def dedup_triples(triples: DataFrame) -> DataFrame:
    """(subj, pred, obj) edge table with occurrence weight + provenance.

    groupBy runs as partial+final hash agg (map-side combine), so even a hub
    pair ("table" x everything) arrives at the reducer pre-collapsed.
    """
    return (
        triples.groupBy("subj", "pred", "obj")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("url").alias("first_url"),
        )
    )


def delta_triples(delta: DataFrame, old: DataFrame, new: DataFrame,
                  linker, url_col: str = "url",
                  text_col: str = "text") -> DataFrame:
    """Incremental KG maintenance from a crawl snapshot delta
    -> (subj, pred, obj, op, n_docs) with op in upsert | retract.

    ``delta`` is webstats.snapshot_delta's (url, status) output; only the
    delta set is re-extracted — at crawl scale the unchanged majority never
    re-enters the tagger:
      * added/changed pages: extract from the NEW content -> op='upsert'
        (the downstream MERGE overwrites those urls' contributions);
      * removed pages: extract from the OLD content -> op='retract' (the
        MERGE subtracts their contributions from edge weights).

    ``linker``: DataFrame(url, text) -> DataFrame(url, sent_id,
    canonical_id) — the same mention+grounding stage the full pipeline
    uses (dictionary or model-backed), injected so incremental and full
    builds share one extraction path by construction.

    Shape: the delta joins back to the snapshots on url (both sides
    already hashed on url by snapshot_delta — with url-bucketed snapshot
    tables the joins are shuffle-free), then ONE assemble_triples +
    ONE grouped count per op branch; the union is a no-shuffle concat of
    two small (delta-sized, not corpus-sized) legs.
    """
    # the delta descends from both snapshots, so joining it back is a
    # self-join on shared lineage — qualify via DataFrame aliases
    def back_join(statuses, snapshot):
        return (delta.filter(F.col("status").isin(*statuses)).alias("d")
                .join(snapshot.alias("s"),
                      F.col("d.url") == F.col(f"s.{url_col}"))
                .select(F.col(f"s.{url_col}").alias("url"),
                        F.col(f"s.{text_col}").alias("text")))

    upsert_docs = back_join(["added", "changed"], new)
    retract_docs = back_join(["removed"], old)

    def leg(docs: DataFrame, op: str) -> DataFrame:
        triples = assemble_triples(linker(docs))
        return (triples.groupBy("subj", "pred", "obj")
                .agg(F.count(F.lit(1)).alias("n_docs"))
                .withColumn("op", F.lit(op)))

    return (leg(upsert_docs, "upsert")
            .unionByName(leg(retract_docs, "retract"))
            .select("subj", "pred", "obj", "op", "n_docs"))


def typed_triples(tagged_tokens: DataFrame, k: int = 10,
                  stopwords: list[str] | None = None,
                  id_col: str = "doc_id", pos_col: str = "pos",
                  tok_col: str = "token",
                  ent_col: str = "canonical_id") -> DataFrame:
    """Typed relation extraction: mine the PREDICATE from the tokens
    between two mentions -> (subj, pred, obj, n_pairs, n_docs, pred_freq).

    proximity_triples emits untyped near_<k> edges; the standard
    no-parser upgrade (OpenIE/Reverb lineage) types each entity pair by
    its most frequent connecting token: for every in-window, position-
    ordered mention pair, collect the non-stopword tokens strictly
    between them, then per (subj, obj) pick the token with the highest
    corpus-wide count (ties by token ASC — total order, engine-portable).
    Pairs whose spans contain only stopwords (or nothing) yield no typed
    triple — they remain covered by the untyped co-occurrence table.

    Input is the token stream LEFT-joined with the grounding dictionary
    (ent_col NULL for non-mention tokens), so mention detection stays on
    the broadcast-join path.

    Scale shape: ONE corpus shuffle — groupBy(doc).collect the (pos,
    token, ent) array — then pair expansion AND between-span slicing as
    higher-order array functions (pure codegen; per-doc work bounded by
    mention count x window k, never doc length squared). The final aggs
    are algebraic on (subj, obj[, token]) keys and the per-pair argmax
    compiles to WindowGroupLimit.
    """
    stop = F.array(*[F.lit(s) for s in (stopwords or [])])
    grouped = (tagged_tokens
               .groupBy(id_col)
               .agg(F.array_sort(F.collect_list(F.struct(
                   F.col(pos_col).alias("pos"),
                   F.col(tok_col).alias("token"),
                   F.col(ent_col).alias("ent")))).alias("arr"))
               .withColumn("ms", F.filter(
                   F.col("arr"), lambda t: t["ent"].isNotNull()))
               .filter(F.size("ms") >= 2))
    ms = F.col("ms")
    pairs = F.flatten(F.transform(
        ms,
        lambda x, i: F.transform(
            F.filter(
                F.slice(ms, i + F.lit(2), F.size(ms) - i - F.lit(1)),
                lambda y: (y["pos"] - x["pos"] <= k)
                & (y["ent"] != x["ent"])),
            lambda y: F.struct(
                x["ent"].alias("subj"), y["ent"].alias("obj"),
                x["pos"].alias("p1"), y["pos"].alias("p2")))))
    paired = (grouped.withColumn("pairs", pairs)
              .filter(F.size("pairs") >= 1)
              .select(id_col, "arr", "pairs")
              .localCheckpoint(eager=True))
    pair_occ = (paired.select(id_col, F.explode("pairs").alias("p"))
                .groupBy(F.col("p.subj").alias("subj"),
                         F.col("p.obj").alias("obj"))
                .agg(F.count(F.lit(1)).alias("n_pairs"),
                     F.countDistinct(id_col).alias("n_docs")))
    # hoist the stopword test out of the per-pair loop: one pass over
    # the doc array instead of one per (pair x token) — the literal
    # array_contains scan was the inner-loop hot spot (r6)
    arrns = F.filter(F.col("arr"),
                     lambda t: ~F.array_contains(stop, t["token"]))
    trip_toks = F.flatten(F.transform(
        F.col("pairs"),
        lambda p: F.transform(
            F.filter(arrns, lambda t: (t["pos"] > p["p1"])
                     & (t["pos"] < p["p2"])),
            lambda t: F.struct(p["subj"].alias("subj"),
                               p["obj"].alias("obj"),
                               t["token"].alias("ptok")))))
    tok_counts = (paired.select(F.explode(trip_toks).alias("b"))
                  .groupBy(F.col("b.subj").alias("subj"),
                           F.col("b.obj").alias("obj"),
                           F.col("b.ptok").alias("ptok"))
                  .agg(F.count(F.lit(1)).alias("pred_freq")))
    win = Window.partitionBy("subj", "obj").orderBy(
        F.col("pred_freq").desc(), F.col("ptok").asc())
    top = (tok_counts.withColumn("_rn", F.row_number().over(win))
           .filter(F.col("_rn") == 1))
    return (top.join(pair_occ, ["subj", "obj"])
            .select("subj", F.col("ptok").alias("pred"), "obj",
                    "n_pairs", "n_docs", "pred_freq"))


def triple_history(observations: DataFrame,
                   key_cols: tuple[str, ...] = ("subj", "pred", "obj"),
                   snap_col: str = "snap") -> DataFrame:
    """SCD-2 validity intervals for triples observed across an ordered
    snapshot sequence -> key_cols + (valid_from, valid_to, n_snaps).

    Input: one row per (triple, snapshot-index) observation; snapshot
    indexes are consecutive integers when the triple persists (e.g. the
    epoch-week convention of funnel.cohort_retention). A triple observed
    in snapshots {3,4,5, 8,9} yields intervals [3,5] and [8,9] — the
    temporal-KG record of when the web asserted the fact, with retraction
    visible as a closed valid_to (north_star: incremental maintenance
    over crawl snapshots).

    Scale shape: ONE shuffle — groupBy(triple).collect_set(snap) (state
    bounded by corpus lifetime in snapshots, like cohort_retention's
    week sets, NOT by observation count) — then island splitting as
    higher-order array functions: run starts are elements whose
    predecessor isn't snap-1, run ends those whose successor isn't
    snap+1 (F.get is 0-based and NULL out-of-bounds, so the array edges
    need no branch), zipped positionally into intervals. The DuckDB twin
    uses the classic row_number gaps-and-islands formulation — an
    independent derivation of the same intervals.
    """
    grouped = (observations
               .groupBy(*key_cols)
               .agg(F.array_sort(F.collect_set(snap_col)).alias("snaps")))
    a = F.col("snaps")
    starts = F.filter(
        a, lambda x, i: F.coalesce(F.get(a, i - 1) != x - 1, F.lit(True)))
    ends = F.filter(
        a, lambda x, i: F.coalesce(F.get(a, i + 1) != x + 1, F.lit(True)))
    iv = F.zip_with(starts, ends,
                    lambda s, e: F.struct(s.alias("valid_from"),
                                          e.alias("valid_to")))
    return (grouped
            .select(*key_cols, F.explode(iv).alias("iv"))
            .select(*key_cols,
                    F.col("iv.valid_from").alias("valid_from"),
                    F.col("iv.valid_to").alias("valid_to"),
                    (F.col("iv.valid_to") - F.col("iv.valid_from") + 1)
                    .cast("long").alias("n_snaps")))


def triple_cardinality_audit(triples: DataFrame, max_card: int = 3,
                             subj_col: str = "subj", pred_col: str = "pred",
                             obj_col: str = "obj") -> DataFrame:
    """Per-predicate KG constraint audit -> (pred, n_triples, n_subjects,
    n_objects, max_fanout, n_violating_subjects, violation_rate).

    The ontology-side twin of link_fd_check: most predicates carry a
    max-cardinality expectation (a protein has ONE canonical species, a
    page ONE publication date), and a subject whose distinct-object
    fan-out exceeds it is the classic symptom of linking noise or a hub
    surface that escaped canonicalization. Auditing fan-out per predicate
    is how production KG builds (Wikidata-style property constraints)
    catch this before the graph ships.

    Scale shape: one distinct over (subj, pred, obj), one
    (pred, subj)-keyed count agg, one pred-keyed final agg — all
    map-side combinable; the violation flag is an integer compare.
    violation_rate = violators / subjects, rounded to 6.
    """
    t = (triples.select(F.col(subj_col).alias("s"),
                        F.col(pred_col).alias("p"),
                        F.col(obj_col).alias("o"))
         .distinct())
    fan = (t.groupBy("p", "s")
           .agg(F.count(F.lit(1)).alias("n_obj")))
    per_obj = (t.groupBy("p")
               .agg(F.count(F.lit(1)).alias("n_triples"),
                    F.countDistinct("o").alias("n_objects")))
    per_subj = (fan.groupBy("p")
                .agg(F.count(F.lit(1)).alias("n_subjects"),
                     F.max("n_obj").cast("long").alias("max_fanout"),
                     F.sum((F.col("n_obj") > max_card).cast("long"))
                     .alias("n_violating_subjects")))
    return (per_obj.join(per_subj, "p")
            .select(F.col("p").alias("pred"), "n_triples", "n_subjects",
                    "n_objects", "max_fanout", "n_violating_subjects",
                    F.round(F.col("n_violating_subjects").cast("double")
                            / F.col("n_subjects"), 6)
                    .alias("violation_rate")))


def metapath_counts(triples: DataFrame, subj_col: str = "subj",
                    pred_col: str = "pred", obj_col: str = "obj",
                    max_mid_degree: int = 1000) -> DataFrame:
    """2-hop predicate-composition profile (AMIE-style path support)
    -> (pred1, pred2, n_paths, n_mids): for every ordered predicate pair,
    how many distinct (a)-[pred1]->(m)-[pred2]->(b) paths the KG holds
    (a != b — the returning a->m->a walk says nothing about composition)
    and through how many distinct mid entities.

    Path support over predicate pairs is the first statistic of every
    KG rule miner (AMIE/AnyBURL lineage: 'born_in . capital_of' paths
    are evidence for a 'citizen_of' rule) and the schema-health view of
    how relations chain — computable long before any embedding exists.

    Scale shape: one distinct over the triple table, then ONE equi-join
    of it with itself on the mid entity (obj side hash-partitions once,
    subj side likewise — co-partitioned on the shared key), then one
    algebraic agg on (pred1, pred2). Mid entities joining more than
    ``max_mid_degree`` triples on EITHER side are excluded up front
    (two count aggs + semi-join): a hub mid contributes in_deg*out_deg
    pairs — quadratic blowup with no per-rule information (every rule
    'fires' through a hub), the same stopword argument host_mirrors
    makes for popular paths. Exclusions are a visible parameter, not a
    silent cap.
    """
    t = (triples.select(F.col(subj_col).alias("s"),
                        F.col(pred_col).alias("p"),
                        F.col(obj_col).alias("o"))
         .distinct())
    in_ok = (t.groupBy("o").agg(F.count(F.lit(1)).alias("d"))
             .filter(F.col("d") <= max_mid_degree).select("o"))
    out_ok = (t.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
              .filter(F.col("d") <= max_mid_degree).select("s"))
    mids = (in_ok.join(out_ok, in_ok.o == out_ok.s, "inner")
            .select(F.col("o").alias("m")))
    left = (t.join(mids, t.o == mids.m, "left_semi")
            .select(F.col("s").alias("a"), F.col("p").alias("pred1"),
                    F.col("o").alias("m")))
    right = (t.join(mids, t.s == mids.m, "left_semi")
             .select(F.col("s").alias("m"), F.col("p").alias("pred2"),
                     F.col("o").alias("b")))
    return (left.join(right, "m")
            .filter(F.col("a") != F.col("b"))
            .groupBy("pred1", "pred2")
            .agg(F.count(F.lit(1)).alias("n_paths"),
                 F.count_distinct("m").alias("n_mids")))


# Hearst (1992) lexico-syntactic hypernym patterns, regex-only (no
# parser): each entry is (pattern, hypernym_group, hyponym_group, name).
# Patterns stay inside the RE2-compatible subset (no lookaround, no
# backreferences) so a SQL engine running the same regex sees the same
# non-overlapping leftmost matches.
HEARST_PATTERNS = (
    (r"\b([a-z]+) such as ([a-z]+)\b", 1, 2, "such_as"),
    (r"\b([a-z]+) including ([a-z]+)\b", 1, 2, "including"),
    (r"\b([a-z]+) and other ([a-z]+)\b", 2, 1, "and_other"),
)


def hearst_hypernyms(docs: DataFrame, text_col: str = "text",
                     patterns=HEARST_PATTERNS) -> DataFrame:
    """Taxonomy induction from raw page text via Hearst patterns ->
    (hypernym, hyponym, pattern, n_mentions): the classic no-training
    is-a harvester ('NP such as NP', 'NP including NP', 'NP and other
    NP') that seeds the type hierarchy a web-scale KG build needs before
    any embedding or tagger exists (Hearst, COLING 1992).

    Reference parity: Saber grounds mentions to an existing ontology
    (saber/utils/grounding_utils.py) but never LEARNS the is-a edges;
    this supplies the induction step the reference's UMLS assumes.

    Scale shape: the regex sweep is per-row JVM codegen
    (regexp_extract_all + explode — no Python, no shuffle); match counts
    per page are bounded by page length, so the explode cannot skew.
    The ONLY shuffle is the final (hypernym, hyponym, pattern) agg,
    map-side combinable. Per-pattern legs union WITHOUT a barrier —
    Catalyst fuses the scans of the same source.
    """
    from functools import reduce
    low = F.lower(F.col(text_col))
    legs = []
    for pat, hyper_g, hypo_g, name in patterns:
        legs.append(
            docs.select(F.explode(
                F.regexp_extract_all(low, F.lit(pat), F.lit(0)))
                .alias("m"))
            .select(F.regexp_extract("m", pat, hyper_g).alias("hypernym"),
                    F.regexp_extract("m", pat, hypo_g).alias("hyponym"),
                    F.lit(name).alias("pattern")))
    return (reduce(DataFrame.unionByName, legs)
            .groupBy("hypernym", "hyponym", "pattern")
            .agg(F.count(F.lit(1)).alias("n_mentions")))


def domain_range_audit(triples: DataFrame, types: DataFrame,
                       subj_col: str = "subj", pred_col: str = "pred",
                       obj_col: str = "obj", entity_col: str = "entity",
                       type_col: str = "etype") -> DataFrame:
    """SHACL-style schema-conformance audit -> one row per predicate:
    (pred, n_triples, domain_type, range_type, n_conform, n_violations,
    violation_rate). domain/range = the MODAL (subject-type,
    object-type) signature of the predicate's triples (ties broken by
    count DESC, then type ASC/ASC); every triple off the modal
    signature counts as a violation — the induced-schema health check
    (SHACL/ShEx lineage) a KG build runs before publishing, sibling to
    triple_cardinality_audit's fan-out check. Entities missing from the
    type table audit as 'unknown' (a real violation signal, not a drop).

    Scale shape: two equi-joins against the type table (AQE broadcasts
    it at dictionary scale), ONE corpus-size map-side-combinable agg to
    (pred, s_type, o_type) counts, then ONE per-pred agg on that tiny
    signature table where min(struct(-n, s_type, o_type)) picks the
    modal signature (max count, ties ASC/ASC) alongside the triple
    total in the same pass — no window sort, no modal-vs-totals join.
    """
    t = triples.select(F.col(subj_col).alias("s"),
                       F.col(pred_col).alias("p"),
                       F.col(obj_col).alias("o"))
    ty = types.select(F.col(entity_col).alias("e"),
                      F.col(type_col).alias("t"))
    typed = (t
             .join(ty.select(F.col("e").alias("s"),
                             F.col("t").alias("s_type")), "s", "left")
             .join(ty.select(F.col("e").alias("o"),
                             F.col("t").alias("o_type")), "o", "left")
             .select("p",
                     F.coalesce("s_type", F.lit("unknown"))
                     .alias("s_type"),
                     F.coalesce("o_type", F.lit("unknown"))
                     .alias("o_type")))
    sig = (typed.groupBy("p", "s_type", "o_type")
           .agg(F.count(F.lit(1)).alias("n")))
    best = (sig.groupBy("p")
            .agg(F.min(F.struct((-F.col("n")).alias("neg_n"),
                                F.col("s_type").alias("s_type"),
                                F.col("o_type").alias("o_type")))
                 .alias("b"),
                 F.sum("n").alias("n_triples")))
    n_conform = -F.col("b.neg_n")
    return best.select(
        F.col("p").alias("pred"), "n_triples",
        F.col("b.s_type").alias("domain_type"),
        F.col("b.o_type").alias("range_type"),
        n_conform.alias("n_conform"),
        (F.col("n_triples") - n_conform).alias("n_violations"),
        F.round((F.col("n_triples") - n_conform).cast("double") /
                F.col("n_triples"), 6).alias("violation_rate"))


def resolve_conflicts(observations: DataFrame, subj_col: str = "subj",
                      pred_col: str = "pred", obj_col: str = "obj",
                      source_col: str = "source") -> DataFrame:
    """Knowledge-fusion majority vote for functional predicates
    (Dong et al., 'Knowledge Vault' lineage) -> one row per (subj,
    pred): (subj, pred, resolved_obj, n_values, n_votes, n_supporting,
    confidence). Multiple feeds assert object values for the same fact
    slot; the resolved value is the one with the most DISTINCT
    supporting sources (ties: obj ASC), confidence = its share of all
    votes. A source asserting two different objects for one slot casts
    two votes — dissent within a source is still dissent.

    Reference parity: Saber's multi-model fan-out unions per-type
    annotations (saber/cli/app.py:60-85) but never reconciles
    disagreement; this is the reconciliation step a multi-source KG
    build needs before publishing functional attributes.

    Scale shape: ONE corpus-size agg to (subj, pred, obj) distinct-
    source counts (map-side combinable), then ONE (subj, pred) agg
    where min(struct(-n_supporting, obj)) picks the winner (max
    support, ties obj ASC) alongside the vote/value totals in the same
    pass — no per-slot window sort, no winner-vs-totals self-join.
    """
    votes = (observations
             .select(F.col(subj_col).alias("subj"),
                     F.col(pred_col).alias("pred"),
                     F.col(obj_col).alias("obj"),
                     F.col(source_col).alias("src"))
             .groupBy("subj", "pred", "obj")
             .agg(F.count_distinct("src").alias("n_supporting")))
    best = (votes.groupBy("subj", "pred")
            .agg(F.min(F.struct(
                    (-F.col("n_supporting")).alias("neg_n"),
                    F.col("obj").alias("obj"))).alias("b"),
                 F.sum("n_supporting").alias("n_votes"),
                 F.count(F.lit(1)).alias("n_values")))
    return best.select(
        "subj", "pred", F.col("b.obj").alias("resolved_obj"),
        F.col("n_values").cast("long").alias("n_values"),
        F.col("n_votes").cast("long").alias("n_votes"),
        (-F.col("b.neg_n")).cast("long").alias("n_supporting"),
        F.round((-F.col("b.neg_n")).cast("double") /
                F.col("n_votes"), 6).alias("confidence"))


def infer_entity_types(triples: DataFrame, signatures: DataFrame,
                       subj_col: str = "subj", pred_col: str = "pred",
                       obj_col: str = "obj") -> DataFrame:
    """Predicate-signature type completion -> one row per entity:
    (entity, inferred_type, n_for, n_votes, vote_share). Every triple
    votes its predicate's domain type for the subject slot and range
    type for the object slot (``signatures``: pred, domain_type,
    range_type — e.g. domain_range_audit's modal output or a curated
    schema); an entity's inferred type is its modal vote (ties: type
    ASC). The type-completion step that bootstraps untyped tail
    entities from KG structure alone. Predicates absent from the
    signature table cast no votes; entities appearing only under such
    predicates are absent from the output (no guessed rows).

    Scale shape: the signature table is schema-sized (AQE broadcasts
    the join); ONE scan — both slot votes come from a 2-element
    inline() per triple, not a two-branch union re-scan — then ONE
    corpus-size agg to (entity, vote) counts (map-side combinable) and
    ONE entity agg where min(struct(-n, vote)) picks the modal vote
    (max n, ties type ASC) and sum(n) the total in the same pass — no
    per-entity window sort, no totals self-join.
    """
    sig = signatures.select(F.col("pred").alias("p"),
                            "domain_type", "range_type")
    t = triples.select(F.col(subj_col).alias("s"),
                       F.col(pred_col).alias("p"),
                       F.col(obj_col).alias("o")).join(sig, "p")
    votes = (t.select(F.inline(F.array(
                F.struct(F.col("s").alias("entity"),
                         F.col("domain_type").alias("vote")),
                F.struct(F.col("o").alias("entity"),
                         F.col("range_type").alias("vote")))))
             .groupBy("entity", "vote")
             .agg(F.count(F.lit(1)).alias("n")))
    best = (votes.groupBy("entity")
            .agg(F.min(F.struct((-F.col("n")).alias("neg_n"),
                                F.col("vote").alias("vote"))).alias("b"),
                 F.sum("n").alias("n_votes")))
    return best.select(
        "entity", F.col("b.vote").alias("inferred_type"),
        (-F.col("b.neg_n")).cast("long").alias("n_for"),
        F.col("n_votes").cast("long").alias("n_votes"),
        F.round((-F.col("b.neg_n")).cast("double") / F.col("n_votes"),
                6).alias("vote_share"))


def source_reliability(observations: DataFrame, subj_col: str = "subj",
                       pred_col: str = "pred", obj_col: str = "obj",
                       source_col: str = "source") -> DataFrame:
    """Truth-discovery source scoring (TruthFinder/Knowledge-Vault
    lineage, one voting round) -> one row per source: (source,
    n_claims, n_correct, reliability). A claim is a distinct (subj,
    pred, obj) assertion by the source; it is correct when its object
    equals resolve_conflicts' majority value for that slot; reliability
    = n_correct / n_claims (6dp). The feed scorecard a multi-source KG
    ingest publishes alongside the fused table — and the prior the
    NEXT voting round would weight by.

    Scale shape: resolve_conflicts' one corpus agg + bounded window,
    then ONE equi-join of distinct claims against the (subj, pred)
    winners (co-partitioned on the same key) and one per-source agg —
    sources are few, but the agg is map-side combinable so a hub feed
    cannot skew a reducer.
    """
    claims = (observations
              .select(F.col(subj_col).alias("subj"),
                      F.col(pred_col).alias("pred"),
                      F.col(obj_col).alias("obj"),
                      F.col(source_col).alias("source"))
              .distinct())
    winners = resolve_conflicts(
        observations, subj_col, pred_col, obj_col, source_col
    ).select("subj", "pred", "resolved_obj")
    return (claims.join(winners, ["subj", "pred"])
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_claims"),
                 F.sum((F.col("obj") == F.col("resolved_obj"))
                       .cast("long")).alias("n_correct"))
            .select("source", "n_claims", "n_correct",
                    F.round(F.col("n_correct").cast("double") /
                            F.col("n_claims"), 6).alias("reliability")))


def rule_confidence(triples: DataFrame, subj_col: str = "subj",
                    pred_col: str = "pred", obj_col: str = "obj",
                    max_mid_degree: int = 1000,
                    materialize: bool = False) -> DataFrame:
    """AMIE-style 2-hop rule mining (Galarraga et al. 2013 lineage) ->
    one row per instantiated rule body+head: (pred1, pred2, head_pred,
    n_body_pairs, n_support, confidence). A rule
    ``pred1(a,m) ^ pred2(m,b) => head_pred(a,b)`` is supported by every
    DISTINCT endpoint pair (a, b) that both satisfies the body (some
    mid m chains them, a != b) and carries a direct head_pred edge;
    n_body_pairs counts ALL distinct body pairs for (pred1, pred2), so
    confidence = n_support / n_body_pairs is the standard (closed-world)
    confidence a rule miner ranks candidate inference rules by. Head
    predicates with zero support are absent (no zero rows); when the
    body contains a self-loop first hop (a == m) the head edge may
    coincide with the second body edge — counted, as AMIE does.

    Builds directly on metapath_counts' path statistic: that operator
    reports body support per predicate pair; this one closes the loop
    against head edges so (placed . contains => bought)-shaped rules
    get a rankable confidence before any embedding exists.

    Scale shape: same hub-mid exclusion as metapath_counts (a hub mid
    contributes in_deg*out_deg body pairs with no per-rule signal),
    ONE mid-keyed self-equi-join, one distinct on (pred1, pred2, a, b)
    — body pairs, not paths, so multi-mid fan-in collapses before the
    head join — then ONE (a, b)-keyed equi-join against the distinct
    triple table and two map-side-combinable aggs. No all-pairs shape;
    exclusions are a visible parameter, not a silent cap.

    ``materialize=True`` localCheckpoints the distinct triple table,
    which this plan references five times (degree filters, both join
    legs, heads). A/B at sf0.1/local[32] is a statistical tie inside
    this VM's noise band (plain 20.9/10.0 s vs ckpt 10.0/13.2 s
    alternating), so recompute stays the default (zero cache memory,
    zero extra I/O — the dedup_clusters decision); at 100 TB the
    distinct table should be materialized ANYWAY (amortizes five scans
    of the raw store and gives the rule miner a durable restart point),
    which this flag provides.
    """
    t = (triples.select(F.col(subj_col).alias("s"),
                        F.col(pred_col).alias("p"),
                        F.col(obj_col).alias("o"))
         .distinct())
    if materialize:
        t = t.localCheckpoint(eager=True)
    in_ok = (t.groupBy("o").agg(F.count(F.lit(1)).alias("d"))
             .filter(F.col("d") <= max_mid_degree).select("o"))
    out_ok = (t.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
              .filter(F.col("d") <= max_mid_degree).select("s"))
    mids = (in_ok.join(out_ok, in_ok.o == out_ok.s, "inner")
            .select(F.col("o").alias("m")))
    left = (t.join(mids, t.o == mids.m, "left_semi")
            .select(F.col("s").alias("a"), F.col("p").alias("pred1"),
                    F.col("o").alias("m")))
    right = (t.join(mids, t.s == mids.m, "left_semi")
             .select(F.col("s").alias("m"), F.col("p").alias("pred2"),
                     F.col("o").alias("b")))
    body = (left.join(right, "m")
            .filter(F.col("a") != F.col("b"))
            .select("pred1", "pred2", "a", "b")
            .distinct())
    body_n = (body.groupBy("pred1", "pred2")
              .agg(F.count(F.lit(1)).alias("n_body_pairs")))
    heads = t.select(F.col("s").alias("a"),
                     F.col("p").alias("head_pred"),
                     F.col("o").alias("b"))
    supp = (body.join(heads, ["a", "b"])
            .groupBy("pred1", "pred2", "head_pred")
            .agg(F.count(F.lit(1)).alias("n_support")))
    return (supp.join(body_n, ["pred1", "pred2"])
            .select("pred1", "pred2", "head_pred",
                    F.col("n_body_pairs").cast("long")
                    .alias("n_body_pairs"),
                    F.col("n_support").cast("long").alias("n_support"),
                    F.round(F.col("n_support").cast("double") /
                            F.col("n_body_pairs"), 6)
                    .alias("confidence")))


def resolve_weighted(observations: DataFrame, subj_col: str = "subj",
                     pred_col: str = "pred", obj_col: str = "obj",
                     source_col: str = "source") -> DataFrame:
    """Reliability-weighted knowledge fusion (TruthFinder's second
    voting round) -> one row per (subj, pred): (subj, pred,
    resolved_obj, n_sources, weight, weight_share). Round 1 scores each
    source with source_reliability; round 2 re-resolves every fact slot
    with each distinct claim weighted by the SUM of its supporting
    sources' reliabilities instead of a raw count (ties: obj ASC) —
    the step where a feed that lost round-1 votes also loses the power
    to outvote trusted feeds. weight is the winner's reliability mass,
    weight_share its fraction of the slot's total mass.

    Reliabilities are summed as DECIMAL(18,6) (they are 6dp-rounded
    scores), so the mass — and therefore the winner and the 6dp-rounded
    double outputs — is exact and engine-portable; float summation
    order can never flip a tie.

    Scale shape: source_reliability's bounded plan, then one
    corpus-size distinct-claims agg joined against the source-count-
    sized reliability table (AQE broadcasts it) and ONE (subj, pred)
    agg where min(struct(-weight, obj)) picks the winner alongside the
    total mass — the same no-window no-self-join shape as
    resolve_conflicts.
    """
    rel = source_reliability(
        observations, subj_col, pred_col, obj_col, source_col
    ).select(F.col("source").alias("src"),
             F.col("reliability").cast("decimal(18,6)").alias("rw"))
    claims = (observations
              .select(F.col(subj_col).alias("subj"),
                      F.col(pred_col).alias("pred"),
                      F.col(obj_col).alias("obj"),
                      F.col(source_col).alias("src"))
              .distinct())
    wv = (claims.join(rel, "src")
          .groupBy("subj", "pred", "obj")
          .agg(F.count(F.lit(1)).alias("n_sources"),
               F.sum("rw").alias("wt")))
    best = (wv.groupBy("subj", "pred")
            .agg(F.min(F.struct(
                    (-F.col("wt")).alias("neg_w"),
                    F.col("obj").alias("obj"),
                    F.col("n_sources").alias("ns"))).alias("b"),
                 F.sum("wt").alias("total_w")))
    win_w = (-F.col("b.neg_w")).cast("double")
    return best.select(
        "subj", "pred", F.col("b.obj").alias("resolved_obj"),
        F.col("b.ns").cast("long").alias("n_sources"),
        F.round(win_w, 6).alias("weight"),
        F.round(win_w / F.col("total_w").cast("double"), 6)
        .alias("weight_share"))


def _bgp_leg(t: DataFrame, pattern, cols3):
    """One (s, p, o) triple pattern -> a filtered scan projecting the
    pattern's variables under their names.

    Constants become equality predicates on the raw columns — written
    BEFORE the projection so Catalyst pushes them into the triple-store
    scan (PushedFilters; at 100 TB that is the difference between
    reading one predicate's partition and reading the whole store).
    A variable repeated inside one pattern (e.g. ``(?x, p, ?x)``)
    becomes an intra-row equality filter on the same scan.
    """
    sel, seen = [], {}
    cond = None
    for col, term in zip(cols3, pattern):
        if isinstance(term, str) and term.startswith("?"):
            var = term[1:]
            if not var:
                raise ValueError("empty variable name in pattern %r" % (pattern,))
            if var in seen:
                c = F.col(col) == F.col(seen[var])
                cond = c if cond is None else cond & c
            else:
                seen[var] = col
                sel.append(F.col(col).alias(var))
        else:
            c = F.col(col) == F.lit(term)
            cond = c if cond is None else cond & c
    if not seen:
        raise ValueError(
            "pattern %r binds no variables; constant-only existence "
            "guards are not supported" % (pattern,))
    if cond is not None:
        t = t.filter(cond)
    return t.select(*sel), frozenset(seen)


def _bgp_vars(p):
    return frozenset(x[1:] for x in p
                     if isinstance(x, str) and x.startswith("?"))


def _bgp_estimate(p, stats, total: float) -> float:
    """Estimated result cardinality of one triple pattern from VoID
    per-predicate statistics (RDF-3X-lineage selectivity): a constant
    predicate looks up its triple count and divides by distinct
    subjects/objects for each further bound term; an unknown constant
    predicate estimates 0 (it matches nothing in the profiled store);
    a variable predicate starts from the store size with a fixed 1/10
    discount per bound term (the System-R default-selectivity
    fallback, since no per-term statistic applies)."""
    s, pr, o = p
    var = lambda x: isinstance(x, str) and x.startswith("?")  # noqa: E731
    if not var(pr):
        if pr not in stats:
            return 0.0
        n, ns, no = stats[pr]
        est = float(n)
        if not var(s):
            est /= max(float(ns), 1.0)
        if not var(o):
            est /= max(float(no), 1.0)
        return est
    est = float(total)
    if not var(s):
        est /= 10.0
    if not var(o):
        est /= 10.0
    return est


def _bgp_order(patterns, sel_key):
    """Greedy connectivity-respecting join order: anchor on the most
    selective pattern (min sel_key), then repeatedly attach the most
    selective pattern sharing a variable with those already placed.
    Ties keep input order (sort is stable; the scan keeps the first).
    Raises on a disconnected pattern — a Cartesian product at store
    scale is an outage, not a plan choice."""
    idx = sorted(range(len(patterns)), key=lambda i: sel_key(patterns[i]))
    order = [idx[0]]
    bound = set(_bgp_vars(patterns[idx[0]]))
    rest = idx[1:]
    while rest:
        nxt = None
        for i in rest:
            if _bgp_vars(patterns[i]) & bound and (
                    nxt is None
                    or sel_key(patterns[i]) < sel_key(patterns[nxt])):
                nxt = i
        if nxt is None:
            raise ValueError(
                "pattern %r shares no variable with the patterns joined "
                "so far — a Cartesian product; reorder or connect the "
                "pattern" % (patterns[rest[0]],))
        rest.remove(nxt)
        order.append(nxt)
        bound |= _bgp_vars(patterns[nxt])
    return order


def bgp_match(triples: DataFrame, patterns, optionals=(), anti=(),
              subj_col: str = "subj", pred_col: str = "pred",
              obj_col: str = "obj", stats: dict | None = None) -> DataFrame:
    """SPARQL-style basic-graph-pattern evaluation over a triple table
    -> one column per variable, one row per binding (bag semantics,
    exactly SPARQL's): the READ side of the constructed KG. ``patterns``
    is a sequence of (s, p, o) terms where a leading ``?`` marks a
    variable and anything else is a constant; ``optionals`` are
    left-joined after the required patterns (SPARQL OPTIONAL — unbound
    new variables surface as NULL); ``anti`` patterns are anti-joined
    (FILTER NOT EXISTS).

    Reference parity: Saber only EMITS annotations (saber/saber.py:
    52-128); the KG it feeds is then queried by exactly this operator
    class — conjunctive triple patterns are the workhorse of every
    SPARQL engine's BGP stage.

    Scale shape: each pattern is ONE filtered scan of the (bucketable)
    triple table with constants pushed down, and the conjunction is a
    chain of equi-joins on the shared variables — hash-partitioned on
    binding keys, AQE-eligible, no Python anywhere. Join order is
    greedy most-selective-first: start from the pattern with the most
    constants, then repeatedly attach the connected pattern with the
    most constants, so the smallest intermediate binding sets flow
    into the later joins (textbook BGP ordering; a cost-model reorder
    can substitute the heuristic without touching callers). A pattern
    sharing NO variable with the bindings accumulated so far would be
    a Cartesian product — that is a query-shape error at 10^12 triples,
    so it raises instead of silently exploding. ``stats`` (optional)
    is the VoID per-predicate profile as a dict {pred: (n_triples,
    n_distinct_subj, n_distinct_obj)} — see ``void_profile`` /
    ``bgp_stats`` — and switches the greedy order from the
    constants-count heuristic to estimated pattern cardinality
    (RDF-3X-style), the textbook upgrade path the heuristic seat was
    reserved for; the dict is predicate-vocabulary-bounded, never
    corpus-sized.
    """
    cols3 = (subj_col, pred_col, obj_col)
    t = triples.select(*cols3)
    if not patterns:
        raise ValueError("bgp_match needs at least one required pattern")
    patterns = list(patterns)
    if stats is not None:
        total = float(sum(v[0] for v in stats.values())) or 1.0
        sel_key = lambda p: _bgp_estimate(p, stats, total)  # noqa: E731
    else:
        sel_key = lambda p: -sum(  # noqa: E731
            1 for x in p if not (isinstance(x, str) and x.startswith("?")))
    order = _bgp_order(patterns, sel_key)
    acc, bound = None, set()
    for i in order:
        df, pvars = _bgp_leg(t, patterns[i], cols3)
        if acc is None:
            acc, bound = df, set(pvars)
        else:
            acc = acc.join(df, sorted(pvars & bound), "inner")
            bound |= pvars
    for p in optionals:
        df, pvars = _bgp_leg(t, p, cols3)
        shared = pvars & bound
        if not shared:
            raise ValueError("OPTIONAL pattern %r shares no variable "
                             "with the required patterns" % (p,))
        acc = acc.join(df, sorted(shared), "left")
        bound |= pvars
    for p in anti:
        df, pvars = _bgp_leg(t, p, cols3)
        shared = pvars & bound
        if not shared:
            raise ValueError("NOT EXISTS pattern %r shares no variable "
                             "with the required patterns" % (p,))
        acc = acc.join(df.select(*sorted(shared)), sorted(shared),
                       "left_anti")
    return acc


def construct(triples: DataFrame, patterns, templates, optionals=(),
              anti=(), subj_col: str = "subj", pred_col: str = "pred",
              obj_col: str = "obj", stats: dict | None = None) -> DataFrame:
    """SPARQL CONSTRUCT: evaluate a basic graph pattern (bgp_match) and
    instantiate ``templates`` — (s, p, o) terms, ``?``-prefixed =
    binding variable, else constant — once per binding, returning a new
    (subj, pred, obj) graph with SET semantics (a CONSTRUCT result is a
    graph, so duplicates collapse; SPARQL 1.1 §16.2).

    This is the rule-APPLICATION half of KG enrichment: rule_confidence
    MINES ``body => head`` rules from the store, construct MATERIALIZES
    a rule's head over every body match (e.g. derive (cust,
    bought_from, supp) from placed/contains/supplies chains). A
    template slot bound to NULL (an OPTIONAL variable that did not
    match) would not form a triple, so those rows are dropped per spec.

    Scale shape: bgp_match's pushed-down scans + selectivity-ordered
    equi-join chain, then one Project per template and a union — the
    only added shuffle is the final set-semantics distinct, keyed on
    the whole (subj, pred, obj), i.e. exactly the dedup_triples
    partitioning the store itself uses.
    """
    if not templates:
        raise ValueError("construct needs at least one template triple")
    b = bgp_match(triples, patterns, optionals=optionals, anti=anti,
                  subj_col=subj_col, pred_col=pred_col, obj_col=obj_col,
                  stats=stats)
    bound = set(b.columns)

    def term(x):
        if isinstance(x, str) and x.startswith("?"):
            v = x[1:]
            if v not in bound:
                raise ValueError("template variable %s is not bound by "
                                 "the pattern" % x)
            return F.col(v)
        return F.lit(x)

    # Set semantics commute with template instantiation: dedup the
    # binding tuples on ONLY the variables the templates reference
    # BEFORE instantiating (r6, guide §2.3 — the distinct shuffles the
    # narrow used-variable projection once instead of the
    # |templates|-wide instantiated union; a 36M-row union+distinct at
    # sf0.1 becomes one 18M-row 2-column distinct). The final distinct
    # stays (two templates can instantiate overlapping triples) but
    # runs over the already-deduplicated pairs.
    used = sorted({x[1:] for t3 in templates for x in t3
                   if isinstance(x, str) and x.startswith("?")
                   and x[1:] in bound})
    if used:
        b = b.select(*used).distinct()

    # The final set-semantics distinct is provably redundant — and
    # skipped — when (a) every template references ALL deduplicated
    # variables (each template is then an injective map of the distinct
    # tuples: one output row per tuple), and (b) templates are pairwise
    # disjoint because some slot holds two DIFFERENT constants (e.g.
    # distinct predicate names). Dropping it removes a full-width
    # shuffle of the instantiated graph (9M rows at sf0.1 for the
    # bought_from/sold_to pair). Any template shape outside that proof
    # keeps the distinct.
    def _tvars(t3):
        return {x[1:] for x in t3
                if isinstance(x, str) and x.startswith("?")}

    injective = bool(used) and all(_tvars(t3) == set(used)
                                   for t3 in templates)
    def _disjoint(t1, t2):
        return any(not (isinstance(a, str) and a.startswith("?"))
                   and not (isinstance(c, str) and c.startswith("?"))
                   and a != c
                   for a, c in zip(t1, t2))

    pairwise_disjoint = all(
        _disjoint(templates[i], templates[j])
        for i in range(len(templates))
        for j in range(i + 1, len(templates)))
    skip_distinct = injective and pairwise_disjoint

    out = None
    for s, p, o in templates:
        g = b.select(term(s).alias("subj"), term(p).alias("pred"),
                     term(o).alias("obj"))
        out = g if out is None else out.unionByName(g)
    out = out.filter(F.col("subj").isNotNull()
                     & F.col("pred").isNotNull()
                     & F.col("obj").isNotNull())
    return out if skip_distinct else out.distinct()


def property_path(triples: DataFrame, path, subj_col: str = "subj",
                  pred_col: str = "pred", obj_col: str = "obj",
                  max_iter: int = 30) -> DataFrame:
    """SPARQL 1.1 property-path evaluation (§9) over the triple store
    -> (src, dst) endpoint pairs. Completes the read-side SPARQL family
    next to bgp_match (BGP + OPTIONAL + NOT EXISTS) and construct:
    paths are the navigational queries — supply chains, citation
    chains, type lattices — that pure BGPs cannot express concisely.

    ``path`` grammar (nested tuples):
      "p"                 atomic predicate (a pushed-down filtered scan)
      ("inv", path)       inverse path  ^p   (swap endpoints — free)
      ("seq", p1, p2, …)  sequence      p1/p2 (equi-join chain on the
                          shared midpoint; bag semantics per the spec's
                          translation to triple patterns, §9.3)
      ("alt", p1, p2, …)  alternation   p1|p2 (union, bag semantics)
      ("plus", path)      one-or-more   p+    (SET semantics per spec —
                          arbitrary-length paths return DISTINCT nodes):
                          semi-naive fixpoint — each round joins only
                          the NEW frontier against the base step and
                          anti-joins the closure, localCheckpoint per
                          round to keep the plan linear in rounds;
                          raises past ``max_iter`` rounds instead of
                          silently truncating the closure (the
                          connected-components convention).

    Scale shape: every atomic leg is a predicate-constant scan filter
    (PushedFilters at the store scan — one predicate's partition, not
    the store); seq shuffles on the midpoint key only; alt is a
    zero-shuffle union; plus shuffles per round on the frontier (which
    shrinks monotonically). No Python, no cartesian products.
    """
    def ev(spec) -> DataFrame:
        if isinstance(spec, str):
            return (triples.filter(F.col(pred_col) == F.lit(spec))
                    .select(F.col(subj_col).alias("src"),
                            F.col(obj_col).alias("dst")))
        op, *args = spec
        if op == "inv":
            return ev(args[0]).select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst"))
        if op == "seq":
            out = ev(args[0])
            for nxt in args[1:]:
                right = ev(nxt).select(F.col("src").alias("_mid"),
                                       F.col("dst").alias("dst"))
                out = (out.select("src", F.col("dst").alias("_mid"))
                       .join(right, "_mid").select("src", "dst"))
            return out
        if op == "alt":
            out = ev(args[0])
            for nxt in args[1:]:
                out = out.unionByName(ev(nxt))
            return out
        if op == "plus":
            base = ev(args[0]).distinct().localCheckpoint(eager=True)
            closure = base
            frontier = base
            for _ in range(max_iter):
                step = (frontier.select("src", F.col("dst").alias("_mid"))
                        .join(base.select(F.col("src").alias("_mid"),
                                          F.col("dst").alias("dst")),
                              "_mid")
                        .select("src", "dst").distinct()
                        .join(closure, ["src", "dst"], "left_anti")
                        .localCheckpoint(eager=True))
                if step.isEmpty():
                    return closure
                closure = closure.unionByName(step) \
                    .localCheckpoint(eager=True)
                frontier = step
            raise RuntimeError(
                f"property_path: '+' closure did not converge within "
                f"{max_iter} rounds — raise max_iter (diameter bound) "
                f"rather than returning a truncated closure")
        raise ValueError(f"unknown path operator {op!r} in {spec!r}")

    return ev(path)


def entity_card(triples: DataFrame, subj_col: str = "subj",
                pred_col: str = "pred", obj_col: str = "obj") -> DataFrame:
    """Concise-bounded-description profile per entity -> (entity,
    direction, pred, n_triples, n_neighbors, top_neighbor): for every
    entity and each predicate in each direction, how many triples and
    distinct neighbors it has and which neighbor is modal (ties broken
    ASC for determinism). The 'entity card' a KG serves for lookups —
    linked-data CBD (concise bounded description) reduced to its
    aggregate skeleton.

    Scale shape: the two direction views come from ONE scan of the
    store — a per-row explode of a 2-struct array, NOT a self-union
    (a union duplicates the upstream subtree in the DAG, and exchange
    reuse does not reliably dedupe it: measured 6 scans + double
    distinct on the union form vs 3 scans on this one) — then two
    map-side-combinable hash aggs: per-(entity, direction, pred,
    neighbor) counts, then the card roll-up where ``min(struct(-n,
    nbr))`` picks the modal neighbor inside the agg itself — the
    struct-min idiom (no window, no self-join; see BENCH/BASELINE.md
    r4 'struct-min modal aggregation'). Hub entities are wide but each
    reducer key is (entity, direction, pred) — the neighbor dimension
    is already collapsed by the first agg, so hub skew is bounded by
    distinct neighbors, not triple count.
    """
    t = triples.select(F.col(subj_col).alias("s"),
                       F.col(pred_col).alias("p"),
                       F.col(obj_col).alias("o"))
    both = (t.select(F.explode(F.array(
        F.struct(F.col("s").alias("entity"),
                 F.lit("out").alias("direction"),
                 F.col("p").alias("pred"), F.col("o").alias("nbr")),
        F.struct(F.col("o").alias("entity"),
                 F.lit("in").alias("direction"),
                 F.col("p").alias("pred"), F.col("s").alias("nbr"))))
        .alias("x"))
        .select("x.entity", "x.direction", "x.pred", "x.nbr"))
    per_nbr = (both.groupBy("entity", "direction", "pred", "nbr")
               .agg(F.count(F.lit(1)).alias("n")))
    return (per_nbr.groupBy("entity", "direction", "pred")
            .agg(F.sum("n").cast("long").alias("n_triples"),
                 F.count(F.lit(1)).alias("n_neighbors"),
                 F.min(F.struct((-F.col("n")).alias("neg"),
                                F.col("nbr").alias("nbr"))).alias("_m"))
            .select("entity", "direction", "pred", "n_triples",
                    "n_neighbors", F.col("_m.nbr").alias("top_neighbor")))


def characteristic_sets(triples: DataFrame, subj_col: str = "subj",
                        pred_col: str = "pred") -> DataFrame:
    """Characteristic sets (Neumann & Moerkotte, ICDE 2011) ->
    (char_set, n_entities, n_triples): group entities by the exact SET
    of predicates they carry and count members and triples per set —
    the RDF store statistic that drives join-cardinality estimation for
    star-shaped BGPs (how many subjects have {placed, bought}?) and
    doubles as emergent schema discovery over a schemaless triple dump.

    Scale shape: two map-side-combinable hash aggs. Per-subject state
    in the first agg is the DISTINCT predicate set — schema-sized
    (dozens), never triple-count-sized; the second agg keys on the
    joined set string, whose cardinality is the number of distinct
    entity shapes (small by the paper's core observation). No window,
    no join, no Python.
    """
    per_subj = (triples.groupBy(F.col(subj_col).alias("entity"))
                .agg(F.count(F.lit(1)).alias("n_t"),
                     F.array_sort(F.collect_set(pred_col)).alias("preds")))
    return (per_subj
            .groupBy(F.array_join("preds", ",").alias("char_set"))
            .agg(F.count(F.lit(1)).alias("n_entities"),
                 F.sum("n_t").cast("long").alias("n_triples")))


def kg_asof(history: DataFrame, snap,
            key_cols: tuple[str, ...] = ("subj", "pred", "obj")) -> DataFrame:
    """Point-in-time read over the SCD-2 interval table triple_history
    emits: the set of triples the KG asserted at snapshot ``snap`` —
    time-travel without re-scanning raw observations (intervals per
    triple are disjoint by construction, so this is a pure filter +
    project over the compact history table; on a snapshot-partitioned
    store the predicate prunes partitions)."""
    s = snap if isinstance(snap, Column) else F.lit(snap)
    return (history
            .filter((F.col("valid_from") <= s) & (F.col("valid_to") >= s))
            .select(*key_cols))


def kg_snapshot_diff(history: DataFrame, s1, s2,
                     key_cols: tuple[str, ...] = ("subj", "pred", "obj"),
                     ) -> DataFrame:
    """Temporal-KG delta between two snapshots, computed from the SCD-2
    interval table alone -> key_cols + status in {'added', 'retracted',
    'unchanged'} for every triple present at either snapshot ('added' =
    asserted at s2 but not s1, 'retracted' = the reverse).

    Scale shape: ONE hash agg over the (already compact) interval
    table — per triple, bool_or of interval-covers-s1 / covers-s2 —
    then a narrow case projection. No join against a second as-of read
    (the naive two-read formulation shuffles the store twice and
    full-outer-joins; this shuffles the interval table once).
    ``s1``/``s2`` accept Columns so callers can derive the snapshots
    from the data (e.g. min(valid_from) via a broadcast one-row cross
    join) without a driver-side collect."""
    c1 = s1 if isinstance(s1, Column) else F.lit(s1)
    c2 = s2 if isinstance(s2, Column) else F.lit(s2)
    covers = lambda s: ((F.col("valid_from") <= s)
                        & (F.col("valid_to") >= s))  # noqa: E731
    per = (history.groupBy(*key_cols)
           .agg(F.max(covers(c1)).alias("_in1"),
                F.max(covers(c2)).alias("_in2")))
    return (per.filter(F.col("_in1") | F.col("_in2"))
            .select(*key_cols,
                    F.when(F.col("_in1") & F.col("_in2"), "unchanged")
                    .when(F.col("_in2"), "added")
                    .otherwise("retracted").alias("status")))


def void_profile(triples: DataFrame, subj_col: str = "subj",
                 pred_col: str = "pred", obj_col: str = "obj",
                 exact: bool = True) -> DataFrame:
    """VoID-style per-predicate dataset description (W3C VoID property
    partitions) -> (pred, n_triples, n_distinct_subj, n_distinct_obj):
    the statistics table every triple store publishes and every BGP
    optimizer consumes (it feeds ``bgp_match(stats=...)`` via
    ``bgp_stats``), and the first QA view of a fresh triple dump
    (predicates with n_distinct_obj == 1 are constants, n_triples ==
    n_distinct_subj means functional, ...).

    Scale shape: ONE hash agg keyed on the predicate — schema-sized
    output. ``exact=True`` uses exact count_distinct (two-phase
    partial/final expand under the hood); at 100 TB pass
    ``exact=False`` for approx_count_distinct (HLL, fully map-side
    mergeable) — the same switch table_profile carries.
    """
    cd = F.count_distinct if exact else F.approx_count_distinct
    return (triples.groupBy(F.col(pred_col).alias("pred"))
            .agg(F.count(F.lit(1)).alias("n_triples"),
                 cd(F.col(subj_col)).alias("n_distinct_subj"),
                 cd(F.col(obj_col)).alias("n_distinct_obj")))


def bgp_stats(void_df: DataFrame) -> dict:
    """Collect a void_profile result into the {pred: (n_triples,
    n_subj, n_obj)} dict ``bgp_match(stats=...)`` consumes. The collect
    is predicate-vocabulary-bounded (schema-sized, like the vocab and
    grounding-dictionary collects), never corpus-sized."""
    return {r["pred"]: (r["n_triples"], r["n_distinct_subj"],
                        r["n_distinct_obj"])
            for r in void_df.collect()}


def fact_ranking(triples: DataFrame, k: int = 3, subj_col: str = "subj",
                 pred_col: str = "pred", obj_col: str = "obj") -> DataFrame:
    """Entity summarization by fact informativeness (RELIN/FACES family,
    Cheng et al. ISWC 2011): keep each subject's top-k facts ranked by
    the self-information of the (pred, obj) value, -log2(n_po / N) — a
    fact shared by millions of entities (a hub object) says little; a
    rare value is what a summary card should show. The ranked upgrade of
    entity_card's modal-value CBD skeleton.

    Scale shape: one (pred, obj) hash agg for the global value counts
    (map-side combine; hub values collapse), one equi-join back on the
    same keys, N rides in as a broadcast 1-row aggregate, and the per-
    subject top-k is a window on subj — no driver action, no cross join.

    -> (subj, pred, obj, n_po, info 6dp, rank), rank 1 = most informative;
    ties broken (pred ASC, obj ASC) for engine-portable determinism.
    """
    t = triples.select(subj_col, pred_col, obj_col)
    po = (t.groupBy(pred_col, obj_col)
          .agg(F.count(F.lit(1)).alias("n_po")))
    total = t.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (t.join(po, [pred_col, obj_col])
              .crossJoin(F.broadcast(total))
              .withColumn("info", F.round(
                  -F.log2(F.col("n_po").cast("double") /
                          F.col("n_total").cast("double")), 6)))
    w = Window.partitionBy(subj_col).orderBy(
        F.col("info").desc(), F.col(pred_col).asc(), F.col(obj_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(subj_col, pred_col, obj_col, "n_po", "info", "rank"))


def kg_align(kg_a: DataFrame, kg_b: DataFrame, threshold: float = 0.5,
             mutual: bool = True, max_df: int | None = None,
             max_df_frac: float | None = None,
             subj_col: str = "subj", pred_col: str = "pred",
             obj_col: str = "obj") -> DataFrame:
    """Cross-KG instance alignment by shared-fact Jaccard (the PARIS /
    instance-matching shape, Suchanek VLDB 2012 simplified to exact
    facts) -> (ent_a, ent_b, n_shared, n_a, n_b, jaccard): candidate
    entity pairs across two triple stores that share at least one exact
    (pred, obj) fact, scored by Jaccard over their deduplicated fact
    sets, thresholded, and optionally reduced to MUTUAL best matches
    (each side's argmax, ties by score DESC then partner ASC — a total
    order, so the alignment is deterministic).

    This is the step that fuses a freshly crawled KG into an existing
    one: sameAs candidates come only from shared evidence, never from
    an all-pairs comparison. Entities with identical fact sets are
    intrinsically ambiguous under exact-fact Jaccard — the mutual-best
    filter picks the deterministic representative; PARIS proper breaks
    such ties with inverse-functionality weights.

    Scale shape: the candidate join is an equi-join on (pred, obj) —
    pair volume is sum over fact keys of df_a*df_b, so hub facts
    ("type: person") dominate; ``max_df`` drops fact keys whose df
    exceeds the cap on EITHER side before the join AND before the
    per-entity counts (scores stay consistent on the pruned fact sets)
    — the df-cut every production matcher applies. Per-entity counts
    are map-side-combinable aggs; the mutual-best argmax compiles to
    two WindowGroupLimit passes.

    ``max_df`` is an absolute per-side cap; ``max_df_frac`` is the
    SCALE-FREE variant (df <= frac * that side's distinct-entity count,
    each a 1-row broadcast aggregate) — the form that keeps the cut
    meaningful when the same job runs at sf0.01 in CI and 10^12 docs in
    production. Either one prunes hub keys from the join AND from the
    per-entity counts, so scores stay consistent on the pruned sets.
    """
    fa = (kg_a.select(F.col(subj_col).alias("ent_a"),
                      F.col(pred_col).alias("pred"),
                      F.col(obj_col).alias("obj")).distinct())
    fb = (kg_b.select(F.col(subj_col).alias("ent_b"),
                      F.col(pred_col).alias("pred"),
                      F.col(obj_col).alias("obj")).distinct())
    if max_df is not None or max_df_frac is not None:
        dfa = fa.groupBy("pred", "obj").agg(
            F.count(F.lit(1)).alias("_dfa"))
        dfb = fb.groupBy("pred", "obj").agg(
            F.count(F.lit(1)).alias("_dfb"))
        if max_df_frac is not None:
            cap_a = fa.agg((F.countDistinct("ent_a") * max_df_frac)
                           .alias("_cap_a"))
            cap_b = fb.agg((F.countDistinct("ent_b") * max_df_frac)
                           .alias("_cap_b"))
            keep = (dfa.join(dfb, ["pred", "obj"], "outer")
                    .crossJoin(F.broadcast(cap_a))
                    .crossJoin(F.broadcast(cap_b))
                    .filter((F.coalesce("_dfa", F.lit(0))
                             <= F.col("_cap_a"))
                            & (F.coalesce("_dfb", F.lit(0))
                               <= F.col("_cap_b")))
                    .select("pred", "obj"))
        else:
            keep = (dfa.join(dfb, ["pred", "obj"], "outer")
                    .filter((F.coalesce("_dfa", F.lit(0)) <= max_df)
                            & (F.coalesce("_dfb", F.lit(0)) <= max_df))
                    .select("pred", "obj"))
        fa = fa.join(keep, ["pred", "obj"])
        fb = fb.join(keep, ["pred", "obj"])
    na = fa.groupBy("ent_a").agg(F.count(F.lit(1)).alias("n_a"))
    nb = fb.groupBy("ent_b").agg(F.count(F.lit(1)).alias("n_b"))
    # The candidate join OUTPUT is sum over keys of df_a*df_b — orders of
    # magnitude larger than either input. AQE sizes stages by INPUT bytes,
    # so after the df-cut it coalesces the small pruned fact table to ~1
    # partition and the whole explosion (6.7M pairs at sf0.1) plus its
    # partial agg runs single-threaded (measured 7.2s). An explicit
    # round-robin spread of the probe side before the join restores
    # parallelism (2.9s); width follows spark.sql.shuffle.partitions so
    # cluster deployments keep their configured reduce width (AQE does
    # not re-coalesce a user-specified repartition).
    spark = fa.sparkSession
    try:
        n_spread = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_spread = spark.sparkContext.defaultParallelism
    shared = (fa.repartition(n_spread).join(fb, ["pred", "obj"])
              .groupBy("ent_a", "ent_b")
              .agg(F.count(F.lit(1)).alias("n_shared")))
    scored = (shared.join(na, "ent_a").join(nb, "ent_b")
              .withColumn(
                  "jaccard",
                  F.col("n_shared")
                  / (F.col("n_a") + F.col("n_b") - F.col("n_shared")))
              .filter(F.col("jaccard") >= threshold))
    if mutual:
        wa = Window.partitionBy("ent_a").orderBy(
            F.col("jaccard").desc(), F.col("ent_b").asc())
        wb = Window.partitionBy("ent_b").orderBy(
            F.col("jaccard").desc(), F.col("ent_a").asc())
        scored = (scored
                  .withColumn("_ra", F.row_number().over(wa))
                  .withColumn("_rb", F.row_number().over(wb))
                  .filter((F.col("_ra") == 1) & (F.col("_rb") == 1)))
    return scored.select("ent_a", "ent_b", "n_shared", "n_a", "n_b",
                         F.round("jaccard", 6).alias("jaccard"))


def temporal_conflicts(history: DataFrame,
                       functional_preds: list[str],
                       subj_col: str = "subj", pred_col: str = "pred",
                       obj_col: str = "obj") -> DataFrame:
    """Temporal functional-predicate conflicts over an SCD-2 interval
    table -> (subj, pred, obj_a, obj_b, overlap_from, overlap_to).

    A predicate declared functional may bind ONE object per subject at
    any instant; a conflict is a pair of validity intervals for the same
    (subj, pred) with different objects that overlap in time — the
    temporal twin of the static domain_range_audit / link_fd_check QA
    gates (the web asserts contradictory facts; incremental KG
    maintenance must surface, not silently merge, them). Canonical pair
    order obj_a < obj_b; one row per overlapping interval pair with the
    overlap window.

    Scale shape: the self-join keys on (subj, pred) so both sides
    co-partition on one exchange; per-key row counts are bounded by the
    snapshot horizon (intervals per triple <= snapshots / 2), so the
    join is quadratic only in a subject's own interval count. Hub
    subjects with thousands of contradicting objects are exactly the
    rows this audit exists to flag — cap them upstream with
    triple_cardinality_audit before enabling a predicate here.
    """
    h = (history.filter(F.col(pred_col).isin(*functional_preds))
         .select(F.col(subj_col).alias("subj"),
                 F.col(pred_col).alias("pred"),
                 F.col(obj_col).alias("obj"),
                 "valid_from", "valid_to"))
    a = h.select("subj", "pred", F.col("obj").alias("obj_a"),
                 F.col("valid_from").alias("from_a"),
                 F.col("valid_to").alias("to_a"))
    b = h.select("subj", "pred", F.col("obj").alias("obj_b"),
                 F.col("valid_from").alias("from_b"),
                 F.col("valid_to").alias("to_b"))
    return (a.join(b, ["subj", "pred"])
            .filter((F.col("obj_a") < F.col("obj_b"))
                    & (F.col("from_a") <= F.col("to_b"))
                    & (F.col("from_b") <= F.col("to_a")))
            .select("subj", "pred", "obj_a", "obj_b",
                    F.greatest("from_a", "from_b").alias("overlap_from"),
                    F.least("to_a", "to_b").alias("overlap_to")))


def sameas_rewrite(triples: DataFrame, sameas: DataFrame,
                   subj_col: str = "subj", pred_col: str = "pred",
                   obj_col: str = "obj", a_col: str = "a", b_col: str = "b",
                   rounds: int | None = None) -> DataFrame:
    """owl:sameAs fusion — rewrite a triple store onto canonical entity
    representatives -> (subj, pred, obj) DISTINCT.

    The step AFTER alignment: kg_align (or any linker) emits sameAs
    pairs; this operator closes them transitively (connected components
    over the undirected sameAs graph — chains and merges of merges
    resolve in one pass), picks the MIN entity id per component as the
    canonical representative (deterministic, the CC convention), and
    rewrites every subject and object through that map, deduplicating
    facts that collapse together. This is the owl:sameAs rewriting rule
    of OWL-RL applied as one materialization rather than per-query.

    Scale shape: the CC fixpoint runs on the sameAs EDGE dimension
    (alignment output — entity-scale, not fact-scale); the store is
    touched by two canon-map joins + one distinct. The canon map is
    broadcastable while alignments fit an executor; beyond that the
    joins hash-partition on subj/obj, which is the store's natural key
    anyway. ``rounds`` forwards to connected_components (set it to a
    known chain-length bound to run the closure as one lazy job).
    """
    from saber_spark.operators.graph import connected_components

    canon = (connected_components(
        sameas.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")),
        rounds=rounds)
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("_ent"),
                F.col("component").alias("_canon")))
    t = triples.select(subj_col, pred_col, obj_col)
    rewritten = (t
                 .join(canon.withColumnRenamed("_ent", subj_col), subj_col,
                       "left")
                 .withColumn(subj_col, F.coalesce("_canon", subj_col))
                 .drop("_canon")
                 .join(canon.withColumnRenamed("_ent", obj_col), obj_col,
                       "left")
                 .withColumn(obj_col, F.coalesce("_canon", obj_col))
                 .drop("_canon"))
    return rewritten.select(subj_col, pred_col, obj_col).distinct()


def noisyor_confidence(evidence: DataFrame,
                       subj_col: str = "subj", pred_col: str = "pred",
                       obj_col: str = "obj", conf_col: str = "conf",
                       eps: float = 1e-9) -> DataFrame:
    """Noisy-OR confidence fusion per triple
    -> (subj, pred, obj, n_sources, conf).

    The Knowledge-Vault / NELL combination rule for independent
    extractor evidence: conf = 1 - prod(1 - c_i) over the sources that
    asserted the triple — each additional weak assertion RAISES belief,
    unlike the majority/weighted votes of resolve_conflicts /
    resolve_weighted which pick among CONFLICTING objects. Computed in
    log space (sum of ln(1-c), one map-side-combinable agg) so a
    thousand sources neither underflow nor need a product aggregate;
    per-source confidences clamp to [0, 1-eps] so a single c = 1.0
    asserts certainty without ln(0).

    Scale shape: ONE hash agg keyed on the triple (partial sums
    map-side); no joins, no window, no Python.
    """
    c = F.least(F.greatest(F.col(conf_col).cast("double"), F.lit(0.0)),
                F.lit(1.0 - eps))
    return (evidence
            .select(subj_col, pred_col, obj_col,
                    F.log(F.lit(1.0) - c).alias("_l"))
            .groupBy(subj_col, pred_col, obj_col)
            .agg(F.count(F.lit(1)).alias("n_sources"),
                 F.round(F.lit(1.0) - F.exp(F.sum("_l")), 6)
                 .alias("conf")))


#: the 13 Allen (1983) interval relations, DISCRETE adaptation: snapshots
#: are integers, so "meets" is adjacency (to_a + 1 = from_b) and "precedes"
#: requires a gap — the continuous endpoint-equality forms don't exist on
#: integer validity intervals
def _allen_case():
    fa, ta = F.col("from_a"), F.col("to_a")
    fb, tb = F.col("from_b"), F.col("to_b")
    return (F.when((fa == fb) & (ta == tb), "equals")
            .when(ta < fb - 1, "precedes")
            .when(ta == fb - 1, "meets")
            .when(fa > tb + 1, "preceded_by")
            .when(fa == tb + 1, "met_by")
            .when((fa == fb) & (ta < tb), "starts")
            .when(fa == fb, "started_by")
            .when((ta == tb) & (fa > fb), "finishes")
            .when(ta == tb, "finished_by")
            .when((fa > fb) & (ta < tb), "during")
            .when((fa < fb) & (ta > tb), "contains")
            .when(fa < fb, "overlaps")
            .otherwise("overlapped_by"))


def allen_relations(history: DataFrame,
                    subj_col: str = "subj", pred_col: str = "pred",
                    obj_col: str = "obj") -> DataFrame:
    """Allen interval-algebra classification over an SCD-2 triple history
    -> (subj, pred, obj_a, obj_b, from_a, to_a, from_b, to_b, relation).

    For every same-(subj, pred) pair of validity intervals with
    different objects (canonical obj_a < obj_b), name the temporal
    relation of A relative to B from Allen's 13 (Allen, CACM 1983) in
    the discrete adaptation (integer snapshots: meets = adjacency,
    precedes = gap). This is the full temporal-reasoning layer above
    temporal_conflicts' boolean overlap test — 'did X meet, precede, or
    contain doing Y' is the query class temporal KGs answer with exactly
    this classification; the CASE chain is total and mutually exclusive,
    so every pair gets exactly one relation.

    Scale shape: identical to temporal_conflicts — the self-join
    co-partitions on (subj, pred) in ONE exchange, per-key volume
    bounded by the snapshot horizon, and the classification is a narrow
    codegen CASE over the joined row.
    """
    h = history.select(F.col(subj_col).alias("subj"),
                       F.col(pred_col).alias("pred"),
                       F.col(obj_col).alias("obj"),
                       "valid_from", "valid_to")
    a = h.select("subj", "pred", F.col("obj").alias("obj_a"),
                 F.col("valid_from").alias("from_a"),
                 F.col("valid_to").alias("to_a"))
    b = h.select("subj", "pred", F.col("obj").alias("obj_b"),
                 F.col("valid_from").alias("from_b"),
                 F.col("valid_to").alias("to_b"))
    return (a.join(b, ["subj", "pred"])
            .filter(F.col("obj_a") < F.col("obj_b"))
            .select("subj", "pred", "obj_a", "obj_b",
                    "from_a", "to_a", "from_b", "to_b",
                    _allen_case().alias("relation")))
