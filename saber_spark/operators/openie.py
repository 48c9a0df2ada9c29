"""Open information extraction: lexical verb-frame triples.

ReVerb-lite pattern extraction — the open-vocabulary counterpart of the
dictionary/tagger mention path (saber/utils/grounding_utils.py grounds
CLOSED-vocabulary surfaces; large-scale web KGs also harvest untyped
(subj, verb-relation, obj) triples straight from syntactic frames, the
ReVerb/OLLIE/TextRunner lineage). This module implements the high-precision
core frame: a capitalized subject token, a relation verb from a fixed
inventory, an optional article, and a bare object token — entirely as one
JVM regexp scan (Java∩RE2 dialect so the DuckDB oracle runs the identical
pattern), copula verbs normalized to ``isA`` and possession verbs to
``has`` at aggregation time.

Scale shape: `regexp_extract_all` + explode inside whole-stage codegen
(no Python), one grouped aggregation with map-side partial counts; the
distinct-doc support count rides the same shuffle via count(distinct)
expand. Nothing here is all-pairs and nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: verb inventory of the core frame — relation verbs first-class, copula
#: and possession normalized in `openie_triples`
OPENIE_COPULA = ("is", "was", "are", "were")
OPENIE_POSSESS = ("has", "have", "had")
OPENIE_RELATION = ("became", "founded", "acquired", "owns", "leads",
                   "runs", "launched", "created")

#: Java∩RE2: no lookarounds, no backreferences. Subject = capitalized
#: token; object = bare token after an optional article.
OPENIE_PATTERN = (
    "([A-Z][A-Za-z]+) ("
    + "|".join(OPENIE_COPULA + OPENIE_POSSESS + OPENIE_RELATION)
    + ") (?:a |an |the )?([A-Za-z]+)")


def openie_triples(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """docs(doc_id, text) -> (subj, pred, obj, freq, support).

    One row per distinct extracted triple with its total match count and
    distinct-document support — the exact shape the downstream triple
    table (operators/triples.py) consumes.  Copula verbs collapse to
    ``isA`` and possession verbs to ``has`` so surface tense variation
    does not fragment the relation vocabulary.
    """
    m = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.regexp_extract_all(
            F.col(text_col), F.lit(OPENIE_PATTERN), F.lit(0))).alias("m"))
    verb = F.regexp_extract("m", OPENIE_PATTERN, 2)
    pred = (F.when(verb.isin(*OPENIE_COPULA), F.lit("isA"))
            .when(verb.isin(*OPENIE_POSSESS), F.lit("has"))
            .otherwise(verb))
    t = m.select(
        "doc_id",
        F.regexp_extract("m", OPENIE_PATTERN, 1).alias("subj"),
        pred.alias("pred"),
        F.regexp_extract("m", OPENIE_PATTERN, 3).alias("obj"))
    return (t.groupBy("subj", "pred", "obj")
            .agg(F.count(F.lit(1)).alias("freq"),
                 F.countDistinct("doc_id").alias("support")))
