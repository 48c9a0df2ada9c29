"""Offline grounding dictionary (replaces the EXTRACT 2.0 web API).

The reference grounds mentions by exact surface text + entity-type code via
HTTP (saber/utils/grounding_utils.py:28-66); the per-label namespaces come
from saber/constants.py:74-80 (PRGE->STRING, DISO->Disease Ontology,
CHED->PubChem Compound, LIVB->NCBI Taxonomy). The rebuild is hermetic: a
fixed dictionary keyed by exact (surface, label), broadcast into a hash join.

Surfaces are drawn from the vocabulary of the driver-generated ``documents``
table so the dictionary actually fires on testdata. ``table`` is the
designated HUB entity: it occurs in nearly every document, exercising the
salted canonicalization path (skew mitigation per north_rule).

One surface may carry multiple xrefs (the reference attaches a list,
grounding_utils.py:53-66): ``spark`` has two xref rows below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# (surface, label, namespace, xref_id, organism_id, canonical_id)
# xref_id shapes follow saber/tests/test_grounding_utils.py:81-145.
GROUNDING_DICT_ROWS: list[tuple] = [
    # PRGE — protein/gene-like; namespace STRING; organism_id set (9606-like)
    ("spark",  "PRGE", "STRING", "ENSP00000269305", "9606", "PRGE:spark"),
    ("spark",  "PRGE", "STRING", "ENSP00000398846", "9606", "PRGE:spark"),
    ("vector", "PRGE", "STRING", "ENSP00000350283", "9606", "PRGE:vector"),
    ("hash",   "PRGE", "STRING", "ENSP00000361021", "9606", "PRGE:hash"),
    ("table",  "PRGE", "STRING", "ENSP00000269299", "9606", "PRGE:table"),  # hub
    # DISO — disease-like; namespace Disease Ontology
    ("slow",   "DISO", "Disease Ontology", "DOID:162",  None, "DISO:slow"),
    ("error",  "DISO", "Disease Ontology", "DOID:1612", None, "DISO:error"),
    ("skew",   "DISO", "Disease Ontology", "DOID:2531", None, "DISO:skew"),
    # CHED — chemical-like; namespace PubChem Compound
    ("sort",   "CHED", "PubChem Compound", "CIDs00005793", None, "CHED:sort"),
    ("merge",  "CHED", "PubChem Compound", "CIDs00441113", None, "CHED:merge"),
    # LIVB — organism-like; namespace NCBI Taxonomy
    ("customer", "LIVB", "NCBI Taxonomy", "9606",  None, "LIVB:customer"),
    ("stream",   "LIVB", "NCBI Taxonomy", "10090", None, "LIVB:stream"),
    # multi-token surfaces: exercise B-/I- continuation in the tagger
    ("big data",   "PRGE", "STRING", "ENSP00000344456", "9606", "PRGE:big_data"),
    ("fast table", "CHED", "PubChem Compound", "CIDs00023978", None, "CHED:fast_table"),
]

DICT_SCHEMA = ("surface string, label string, namespace string, "
               "xref_id string, organism_id string, canonical_id string")


def grounding_dict_df(spark: SparkSession) -> DataFrame:
    """Dictionary as a (small, broadcastable) DataFrame."""
    return spark.createDataFrame(GROUNDING_DICT_ROWS, schema=DICT_SCHEMA)


def surface_label_map() -> dict[tuple[str, ...], str]:
    """token-tuple -> label map consumed by the dictionary tagger.

    Keys are token sequences (after NERsuite tokenization of the surface);
    exact, case-sensitive match per the reference
    (grounding_utils.py:65-66 keys by exact ent['text']).
    """
    from saber_spark.kernels import tokenize

    out: dict[tuple[str, ...], str] = {}
    for surface, label, *_ in GROUNDING_DICT_ROWS:
        out[tuple(tokenize(surface))] = label
    return out
