"""Deterministic fixtures: page table + grounding dictionary.

No wall-clock, no randomness, no network — everything derives from the
driver-generated testdata tables (/root/testdata/sf*/documents.parquet) so
tests, oracle checks, and the bench all see identical inputs.
"""

from saber_spark.fixtures.pages import build_pages_df, wrap_html
from saber_spark.fixtures.dictionary import (
    GROUNDING_DICT_ROWS,
    grounding_dict_df,
    surface_label_map,
)

__all__ = [
    "build_pages_df",
    "wrap_html",
    "GROUNDING_DICT_ROWS",
    "grounding_dict_df",
    "surface_label_map",
]
