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


def link_mentions(mentions: DataFrame, dictionary: DataFrame) -> DataFrame:
    """mentions ⋈ broadcast dict -> + canonical_id, xrefs array.

    Unlinked mentions are kept with canonical_id = NULL (the reference keeps
    ungrounded ents without an 'xrefs' key, grounding_utils.py:63-66).
    """
    return mentions.join(F.broadcast(prepare_dictionary(dictionary)),
                         on=["text", "label"], how="left")
