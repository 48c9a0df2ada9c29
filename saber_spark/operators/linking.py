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

from pyspark.sql import DataFrame
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
    are formed with ``lead`` windows over (doc_id, pos), equi-joined
    against the broadcast dictionary split by surface length, and a match
    is suppressed when every one of its token positions is covered by some
    strictly longer match — exact containment for max_len=2 (the
    dictionary's longest surface), and the same covered-position rule the
    oracle twin uses for any max_len. Equal-length overlapping matches are
    all emitted.

    Scale shape: unigram candidates come straight off the token stream (no
    window at all); lengths ≥ 2 share ONE window pass over (doc_id, pos).
    Each length joins its broadcast dictionary slice (BroadcastHashJoin —
    the corpus-sized side never shuffles for matching). Suppression runs on
    (doc_id, pos) equi-keys over the dictionary-FILTERED match sets, which
    are orders of magnitude smaller than the corpus: a single anti-join for
    unigrams, explode-containment only for middle lengths when max_len > 2.
    No self-join of the token stream, no Python.
    """
    from pyspark.sql import Window

    dict_rows = (dictionary
                 .select("surface", "label", "canonical_id").distinct()
                 .withColumn("_n", F.size(F.split("surface", " "))))

    def matches_of_len(n: int) -> DataFrame:
        if n == 1:
            cand = tokens.select("doc_id",
                                 F.col("pos").alias("start_pos"),
                                 F.col("token").alias("surface"))
        else:
            w = Window.partitionBy("doc_id").orderBy("pos")
            lead_cols = [F.lead("token", i).over(w).alias(f"_t{i}")
                         for i in range(1, n)]
            surf = F.concat_ws(" ", F.col("token"),
                               *[F.col(f"_t{i}") for i in range(1, n)])
            cand = (tokens.select("doc_id", "pos", "token", *lead_cols)
                    .filter(F.col(f"_t{n-1}").isNotNull())
                    .select("doc_id", F.col("pos").alias("start_pos"),
                            surf.alias("surface")))
        return (cand.join(F.broadcast(dict_rows.filter(F.col("_n") == n)
                                      .drop("_n")), "surface")
                .select("doc_id", F.col("start_pos").cast("long"),
                        F.lit(n).cast("long").alias("n_tokens"),
                        "surface", "label", "canonical_id"))

    per_len = {n: matches_of_len(n) for n in range(1, max_len + 1)}

    def covered_positions(min_len_exclusive: int) -> DataFrame | None:
        frames = [per_len[m].select(
            "doc_id",
            F.explode(F.sequence(
                F.col("start_pos"),
                F.col("start_pos") + F.col("n_tokens") - 1)).alias("pos"))
            for m in range(min_len_exclusive + 1, max_len + 1)]
        if not frames:
            return None
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out.distinct()

    result: DataFrame | None = None
    for n in reversed(range(1, max_len + 1)):
        matched = per_len[n]
        covered = covered_positions(n)
        if covered is not None and n == 1:
            # single-position match: containment == the position is covered
            matched = matched.join(
                covered.withColumnRenamed("pos", "start_pos"),
                ["doc_id", "start_pos"], "left_anti")
        elif covered is not None:
            own_pos = matched.withColumn(
                "_p", F.explode(F.sequence(
                    F.col("start_pos"),
                    F.col("start_pos") + F.col("n_tokens") - 1)))
            uncovered = (own_pos
                         .join(covered,
                               on=[own_pos.doc_id == covered.doc_id,
                                   own_pos._p == covered.pos],
                               how="left_anti")
                         .select("doc_id", "start_pos").distinct())
            matched = matched.join(uncovered, ["doc_id", "start_pos"],
                                   "semi")
        result = matched if result is None else result.unionByName(matched)
    return result


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
