"""HTML -> sterilized text extraction stage.

Reference behavior: the "extractor" is ``Preprocessor.sterilize``
(saber/preprocessor.py:259-277) applied to raw text, generalized here to web
pages (title/abstract XML extraction in saber/utils/app_utils.py:63-80 is the
reference's only "markup -> text" path).

Byte-identity invariant (BASELINE.md): the Spark stage calls the SAME kernel
function objects (saber_spark.kernels.text) inside an Arrow pandas UDF that
the driver-side reference harness calls row-by-row — so per-url output is
byte-identical by construction, not by regex-dialect luck.

Scale notes: narrow map over the scan (no shuffle); column pruning keeps the
UDF input to (html, text) only. At 100 TB this stage is embarrassingly
parallel and bounded by scan + Python CPU; Arrow batching amortizes the
JVM<->Python transfer.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from saber_spark.kernels.text import extract_html_text, sterilize


@pandas_udf(StringType())
def _extract_udf(html: pd.Series, text: pd.Series) -> pd.Series:
    # Prefer the pre-extracted text column when present (reference accepts
    # raw text directly, saber/saber.py:83-96); fall back to HTML extraction.
    out = []
    for h, t in zip(html, text):
        if t is not None and not (isinstance(t, float) and pd.isna(t)):
            out.append(sterilize(t))
        else:
            out.append(extract_html_text(h))
    return pd.Series(out, dtype="object")


# The function is pure, but marking it nondeterministic stops Catalyst from
# pushing the downstream `doc_text != ''` filter below the Project by
# DUPLICATING the UDF call (two ArrowEvalPython nodes = 2x the Python
# extraction cost of every pipeline run). tools/plan_audit.py asserts the
# single-node invariant.
_extract_udf = _extract_udf.asNondeterministic()


def extract_text(pages: DataFrame, lang: str | None = "en") -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> (url, doc_text).

    Applies the language filter BEFORE the UDF so Catalyst pushes it into the
    scan and the Python stage never sees filtered rows (predicate pushdown +
    column pruning; see .explain PushedFilters).
    """
    df = pages
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    return (
        df.select("url", _extract_udf(F.col("html"), F.col("text")).alias("doc_text"))
        .filter(F.col("doc_text") != "")
    )
