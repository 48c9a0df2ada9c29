"""Input connectors: CoNLL corpora, word-embedding files, generic tables."""

from saber_spark.sources.conll import load_conll_dir, load_conll_file
from saber_spark.sources.embeddings import (
    build_embedding_matrix,
    load_word2vec_text,
)
from saber_spark.sources.graph_export import to_graphml, write_edgelist
from saber_spark.sources.registry import read_table

__all__ = [
    "load_conll_dir",
    "load_conll_file",
    "load_word2vec_text",
    "build_embedding_matrix",
    "read_table",
    "write_edgelist",
    "to_graphml",
]
