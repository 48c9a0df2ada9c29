"""Tokenization / vocabulary / rare-token operators (DataFrame-native).

Reference basis:
  - tokenize: NERsuite regex (saber/utils/text_utils.py:10) — here as the
    built-in ``regexp_extract_all`` so Catalyst keeps the stage codegen'd
    (the pandas-UDF variant in operators/tagger.py is the byte-identity
    path; this one is the oracle-checkable relational form).
  - vocab build: type_to_idx (saber/preprocessor.py:101-137) — distinct +
    row_number (consecutive ids; reference reserves PAD=0/UNK=1, so data
    ids start at 2, saber/constants.py:19-29).
  - rare tokens: replace_rare_tokens count<=NUM_RARE=1
    (saber/preprocessor.py:229-257).

Scale notes: token explode multiplies rows ~200x; groupBy(token) is a
classic partial+final hash agg (map-side combine collapses each partition to
|vocab| rows before shuffling — the shuffle is tiny regardless of corpus
size). row_number over a global orderBy is a single-partition sort, safe
only because vocabularies are small post-aggregation; never apply it to raw
tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from saber_spark.kernels.text import INFIX_PATTERN

# reserved ids, parity with saber/constants.py:19-29
PAD_ID, UNK_ID = 0, 1
FIRST_DATA_ID = 2


def tokenize_docs(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """documents -> (doc_id, pos, token) via built-in regexp + posexplode."""
    return (
        docs.select(
            F.col(id_col),
            F.posexplode(
                F.regexp_extract_all(F.col(text_col), F.lit(INFIX_PATTERN), F.lit(0))
            ).alias("pos", "token"),
        )
    )


def token_freq(tokens: DataFrame) -> DataFrame:
    """(.., token) -> (token, freq); partial+final hash aggregation."""
    return tokens.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))


def rare_tokens(tokens: DataFrame, max_count: int = 1) -> DataFrame:
    """Tokens with corpus frequency <= max_count (reference NUM_RARE=1)."""
    return token_freq(tokens).filter(F.col("freq") <= max_count)


def vocab_ids(tokens: DataFrame) -> DataFrame:
    """(token) -> (token, token_id), consecutive ids from FIRST_DATA_ID.

    Deterministic (orderBy token); the distinct collapses to |vocab| rows
    before the single-partition window, so the sort is bounded.
    """
    distinct = tokens.select("token").distinct()
    w = Window.orderBy("token")
    return distinct.select(
        "token",
        (F.row_number().over(w) + FIRST_DATA_ID - 1).alias("token_id"),
    )
