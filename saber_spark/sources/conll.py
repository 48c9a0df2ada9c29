"""CoNLL-TSV corpus connector (token⇥tag lines, blank-line sentence breaks).

Reference behavior being reimplemented (saber/dataset.py:17-85 via NLTK
ConllCorpusReader; partition globbing train.*/valid.*/test.* at
saber/utils/data_utils.py:15-49): a corpus directory holds one TSV per
partition; each file is token<TAB>tag lines with blank lines separating
sentences.

Spark-first formulation (no NLTK): spark.read.text with the input file name
attached, sentence ids assigned by a running count of blank lines per file
(window over the line index), then groupBy-collect into
(doc_id, partition, sent_id, tokens, tags) rows — the `sentences` DataFrame
shape from FIXTURES.md §2.

Scale: one shuffle (the window on file), then the groupBy reuses the file
partitioning. Line order within a file is preserved via
monotonically_increasing_id, which is monotone within a partition — each
input file maps to >=1 whole partitions under text reads, so per-file order
holds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SENTENCES_SCHEMA = ("doc_id string, partition string, sent_id int, "
                    "tokens array<string>, tags array<string>")

PARTITION_PREFIXES = ("train", "valid", "test")  # data_utils.py:34-36


def load_conll_file(spark: SparkSession, path: str,
                    partition: str = "train") -> DataFrame:
    """One CoNLL TSV -> sentences DataFrame."""
    lines = (
        spark.read.text(path)
        .select(
            F.input_file_name().alias("file"),
            F.monotonically_increasing_id().alias("line_id"),
            F.col("value"),
        )
    )
    w = Window.partitionBy("file").orderBy("line_id")
    with_sent = (
        lines
        .withColumn("is_blank", (F.trim(F.col("value")) == "").cast("int"))
        .withColumn("sent_id", F.sum("is_blank").over(
            w.rowsBetween(Window.unboundedPreceding, 0)) - F.col("is_blank"))
        .filter(F.col("is_blank") == 0)
    )
    parsed = with_sent.select(
        F.col("file"),
        F.col("sent_id").cast("int"),
        F.col("line_id"),
        F.split(F.col("value"), "\t").getItem(0).alias("token"),
        F.split(F.col("value"), "\t").getItem(1).alias("tag"),
    )
    return (
        parsed.groupBy("file", "sent_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("line_id", "token", "tag"))
                         ).alias("rows"))
        .select(
            F.element_at(F.split(F.col("file"), "/"), -1).alias("doc_id"),
            F.lit(partition).alias("partition"),
            F.col("sent_id"),
            F.transform(F.col("rows"), lambda r: r["token"]).alias("tokens"),
            F.transform(F.col("rows"), lambda r: r["tag"]).alias("tags"),
        )
    )


def load_conll_dir(spark: SparkSession, directory: str) -> DataFrame:
    """Corpus directory -> sentences DataFrame with partition column.

    Partition resolution mirrors the reference filename globbing
    (train.* / valid.* / test.*, saber/utils/data_utils.py:15-49); files
    matching no prefix raise, like the reference's ValueError.
    """
    parts: list[DataFrame] = []
    for name in sorted(os.listdir(directory)):
        path = os.path.join(directory, name)
        if not os.path.isfile(path):
            continue
        prefix = next((p for p in PARTITION_PREFIXES
                       if name.startswith(p)), None)
        if prefix is None:
            raise ValueError(
                f"Expected CoNLL files named train.*/valid.*/test.*; got {name}")
        parts.append(load_conll_file(spark, path, partition=prefix))
    if not parts:
        raise ValueError(f"No CoNLL files found in {directory}")
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


def pool_compound_vocab(datasets: list[DataFrame]) -> DataFrame:
    """Union word vocabulary across datasets (multi-task pooling).

    Reference: load_compound_dataset shares word/char types across datasets
    while tag sets stay per-dataset (saber/utils/data_utils.py:71-118).
    Returns the pooled distinct token DataFrame; per-dataset tag maps are
    built separately by the caller.
    """
    vocabs = [d.select(F.explode("tokens").alias("token")).distinct()
              for d in datasets]
    out = vocabs[0]
    for v in vocabs[1:]:
        out = out.unionByName(v)
    return out.distinct()


def replace_rare_tokens(sentences: DataFrame, count: int = 1) -> DataFrame:
    """Replace corpus-rare tokens with '<UNK>' inside the tokens arrays.

    Reference: replace_rare_tokens, NUM_RARE=1
    (saber/preprocessor.py:229-257, saber/constants.py:27).

    Fully distributed relational form — no driver collect, no plan-literal
    array (rare tokens are the heavy TAIL of the vocabulary, so on a
    web-scale corpus the former collect-into-literal shape would hold
    millions of strings in the query plan and scan them per token):

      posexplode(tokens) -> join the rare half of the freq table on token
      -> conditional replace -> collect_list back by sentence id.

    The rare-side join is a plain equi-join, so Catalyst/AQE broadcasts it
    when small and shuffle-joins it when not; either way the plan size is
    O(1) in |vocab|. Sentence identity is a synthetic id FROZEN via
    localCheckpoint before use: the id expression alone is nondeterministic
    across re-evaluations when the input has shuffles upstream (a groupBy
    feeds this from load_conll_dir), and it is referenced by two plan
    branches (the explode and the join-back) — without materialization a
    re-evaluation could silently pair sentence S with sentence T's rewritten
    tokens. The materialization is corpus-sized; this is the training-corpus
    path (reference semantics, saber corpora are small) — a web-scale caller
    would durable-checkpoint the same stage.
    """
    sid = (sentences.withColumn("_sid", F.monotonically_increasing_id())
           .localCheckpoint(eager=True))
    toks = sid.select("_sid", F.posexplode("tokens").alias("pos", "token"))
    rare = (toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
            .filter(F.col("freq") <= count)
            .select("token", F.lit(True).alias("_rare")))
    regrouped = (
        toks.join(rare, "token", "left")
        .select("_sid", "pos",
                F.when(F.col("_rare"), F.lit("<UNK>"))
                 .otherwise(F.col("token")).alias("token"))
        .groupBy("_sid")
        .agg(F.array_sort(
            F.collect_list(F.struct("pos", "token"))).alias("rows"))
        .select("_sid",
                F.transform("rows", lambda r: r["token"]).alias("_new_tokens"))
    )
    return (sid.join(regrouped, "_sid", "left")
            .withColumn("tokens", F.coalesce("_new_tokens", "tokens"))
            .drop("_sid", "_new_tokens"))


def write_conll_file(sentences: DataFrame, path: str) -> None:
    """sentences DataFrame -> one CoNLL TSV (token<TAB>tag lines, blank
    line between sentences) — the reference's corpus format, so corpora
    produced by this engine (splits, rare-token variants, tagged silver
    data) feed the reference toolchain unchanged.

    Sentence blocks render distributed (zip tokens/tags -> per-sentence
    concat, pure built-ins); the final file assembles on the driver —
    corpus files are training-scale by the reference's own semantics (it
    holds whole corpora in memory), so the collect is corpus-bounded, not
    web-scale. A web-scale silver-data export would write the blocks
    column through the multi-part text sink instead (one sentence block
    per part row, no single-file contract).

    Malformed rows fail at WRITE time rather than corrupting the file:
    ragged tokens/tags would render a tab-less line (zip_with null-pads,
    concat_ws drops the null) that crashes the loader, and an empty
    tokens array would render an empty block that silently vanishes on
    reload — both raise here instead.
    """
    bad = sentences.filter(
        (F.size("tokens") != F.size("tags")) | (F.size("tokens") == 0)
    ).limit(1).count()
    if bad:
        raise ValueError(
            "write_conll_file: rows with size(tokens) != size(tags) or "
            "empty tokens cannot render as valid CoNLL")
    body = sentences.select(
        "doc_id", "sent_id",
        F.concat_ws("\n", F.zip_with(
            "tokens", "tags", lambda tok, tag: F.concat_ws("\t", tok, tag))
        ).alias("block"))
    rows = body.orderBy("doc_id", "sent_id").select("block").collect()
    if not rows:
        raise ValueError("write_conll_file: empty sentences DataFrame")
    with open(path, "w") as out:
        out.write("\n\n".join(r["block"] for r in rows))
        out.write("\n")
