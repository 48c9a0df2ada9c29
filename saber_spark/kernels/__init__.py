"""Pure deterministic kernels (no Spark imports).

These define the per-row invariants of the pipeline and are reused both
inside pandas UDFs (executor side) and as the driver-side reference
implementation for the P/R >= 0.95 eval harness.
"""

from saber_spark.kernels.text import (
    INFIX_PATTERN,
    extract_html_text,
    sentence_spans,
    sterilize,
    tokenize,
    tokenize_with_offsets,
)
from saber_spark.kernels.chunk import chunk_entities
from saber_spark.kernels.metrics import (
    get_precision_recall_f1_support,
    precision_recall_f1_support,
)

__all__ = [
    "INFIX_PATTERN",
    "extract_html_text",
    "sentence_spans",
    "sterilize",
    "tokenize",
    "tokenize_with_offsets",
    "chunk_entities",
    "get_precision_recall_f1_support",
    "precision_recall_f1_support",
]
