"""Article-XML field extraction: the hermetic half of the reference's
PubMed path (O17).

The reference fetches Entrez XML by PMID and pulls ArticleTitle /
AbstractText out of it (saber/utils/app_utils.py:19-80). The fetch is
network-bound and out of scope (SURVEY §2.1); the PARSING is not — this
operator runs it over a local ``xml string`` column with Spark's built-in
``xpath_string`` (JVM-side, codegen-friendly, zero Python), so a corpus of
pre-crawled article XML needs no UDF at all. The pure-Python twin
(kernels.text.extract_article_fields, ElementTree) exists for pytest goldens
and for callers that need reference-exact recursive-find semantics.

Scale notes: narrow map over the scan, no shuffle; xpath evaluation is
per-row JVM work inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TITLE_XPATH = "/PubmedArticle/MedlineCitation/Article/ArticleTitle/text()"
ABSTRACT_XPATH = ("/PubmedArticle/MedlineCitation/Article/Abstract/"
                  "AbstractText/text()")


def attach_fake_article_xml(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text",
                            title_chars: int = 40) -> DataFrame:
    """Simulate an article-XML column from the documents table.

    Deterministic, pure built-ins: title = first ``title_chars`` chars of the
    text, abstract = the full text. The testdata corpus is alnum word salad
    (no ``<>&``), so no XML escaping is required; a real crawl table would
    already carry the XML. Stands in for the Entrez response body.
    """
    title = F.substring(F.col(text_col), 1, title_chars)
    return docs.select(
        F.col(id_col),
        F.concat(
            F.lit("<PubmedArticle><MedlineCitation><PMID>"),
            F.col(id_col).cast("string"),
            F.lit("</PMID><Article><ArticleTitle>"),
            title,
            F.lit("</ArticleTitle><Abstract><AbstractText>"),
            F.col(text_col),
            F.lit("</AbstractText></Abstract></Article>"
                  "</MedlineCitation></PubmedArticle>"),
        ).alias("xml"),
    )


def extract_article_fields_df(articles: DataFrame,
                              xml_col: str = "xml") -> DataFrame:
    """(.., xml) -> (.., title, abstract) via built-in xpath_string.

    Missing elements yield empty string from xpath_string; normalized to
    NULL to match the Python kernel's None contract.
    """
    title = F.xpath_string(F.col(xml_col), F.lit(TITLE_XPATH))
    abstract = F.xpath_string(F.col(xml_col), F.lit(ABSTRACT_XPATH))
    return articles.withColumns({
        "title": F.nullif(title, F.lit("")),
        "abstract": F.nullif(abstract, F.lit("")),
    }).drop(xml_col)
