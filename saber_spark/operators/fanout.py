"""Multi-model fan-out + annotation union (one model per entity type).

Reference behavior: the web service runs one loaded model per requested
entity type over the same text and concatenates the resulting ents lists
(saber/cli/app.py:60-85, combine_annotations at
saber/utils/app_utils.py:165-178); harmonize_entities resolves the
requested-type dict against defaults (app_utils.py:117-142).

Spark-first: K tagging passes over the SAME extracted DataFrame (reuse via
persist upstream), one per entity type, unioned with unionByName and
deduplicated on the full mention identity — the set semantics of
combine_annotations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from saber_spark.operators.tagger import detect_mentions

DEFAULT_ENTITIES = {"PRGE": False, "DISO": False, "CHED": False, "LIVB": False}


def harmonize_entities(default: dict[str, bool],
                       requested: dict[str, bool]) -> dict[str, bool]:
    """Requested entity types override defaults; unknown keys ignored.

    Parity: saber/utils/app_utils.py:117-142 (absent => False).
    """
    out = {k: False for k in default}
    for k, v in requested.items():
        if k in out and v:
            out[k] = True
    return out


def fanout_mentions(extracted: DataFrame, surface_maps: dict[str, dict],
                    requested: dict[str, bool] | None = None) -> DataFrame:
    """Run one dictionary model per enabled entity type; union mentions.

    surface_maps: entity type -> (token-tuple -> label) map, i.e. one
    "model" per type, like the reference's MODELS dict (cli/app.py:93).
    """
    enabled = harmonize_entities(
        {k: False for k in surface_maps},
        requested if requested is not None else {k: True for k in surface_maps})
    spark = extracted.sparkSession
    parts: list[DataFrame] = []
    for ent_type, surface_map in sorted(surface_maps.items()):
        if not enabled.get(ent_type):
            continue
        bc = spark.sparkContext.broadcast(surface_map)
        parts.append(detect_mentions(extracted, bc))
    if not parts:
        raise ValueError("no entity types enabled")
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out.dropDuplicates(
        ["url", "sent_id", "tok_start", "tok_end", "label"])
