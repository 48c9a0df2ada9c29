"""Distributed training of the Viterbi tagger from a CoNLL corpus.

Reference lifecycle being reimplemented (saber/trainer.py:28-132 +
cli/train.py): load dataset -> build vocab/index maps -> fit model ->
per-epoch metrics -> best selection; transfer learning swaps the CRF head
for a new tag set while keeping the learned inner layers
(saber/models/multi_task_lstm_crf.py:170-192, data_utils.py:120-137).

The BiLSTM is replaced by the closed-form maximum-likelihood fit of the
emission/transition model (an HMM-style tagger): counting, which Spark does
as hash aggregations — the "training loop" becomes TWO groupBys, fully
distributed, no driver-side iteration. The learned weights land in the same
ViterbiCRFTagger slot the dictionary model uses, so a trained model and the
deterministic stand-in are interchangeable in the pipeline.

Training math (add-k smoothing):
  emission[w, t]  = log( (c(w,t) + k) / (c(t) + k*V) )
  transition[s,t] = log( (c(s->t) + k) / (c(s) + k*T) ), masked by BIO
                    validity (orphan-I stays -inf, matching the chunker).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from saber_spark.models import (
    NEG_INF,
    PAD,
    UNK_ID,
    ViterbiCRFTagger,
    build_transition_matrix,
)

SMOOTHING = 0.1


def _token_tag_counts(sentences: DataFrame) -> DataFrame:
    """(token, tag, count) via explode of zipped arrays — one hash agg."""
    return (
        sentences.select(
            F.explode(F.arrays_zip("tokens", "tags")).alias("p"))
        .select(F.col("p.tokens").alias("token"), F.col("p.tags").alias("tag"))
        .groupBy("token", "tag").agg(F.count(F.lit(1)).alias("c"))
    )


def _tag_bigram_counts(sentences: DataFrame) -> DataFrame:
    """(src, dst, count) over consecutive tag pairs within sentences."""
    pairs = sentences.select(
        F.explode(
            F.when(
                F.size("tags") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("tags") - 2),
                    lambda i: F.struct(
                        F.element_at("tags", i + 1).alias("src"),
                        F.element_at("tags", i + 2).alias("dst")),
                ),
            ).otherwise(F.array().cast(
                "array<struct<src:string,dst:string>>"))
        ).alias("p"))
    return (pairs.select("p.src", "p.dst")
            .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c")))


def train_viterbi_tagger(sentences: DataFrame,
                         smoothing: float = SMOOTHING) -> ViterbiCRFTagger:
    """Fit emissions + transitions from (tokens, tags) rows; returns model.

    All corpus-sized work is distributed (two groupBys); only the
    vocabulary-sized count tables are collected.
    """
    tt = _token_tag_counts(sentences).collect()
    bg = _tag_bigram_counts(sentences).collect()

    words = sorted({r["token"] for r in tt})
    word_to_idx = {w: i + 2 for i, w in enumerate(words)}  # PAD=0 UNK=1
    data_tags = sorted({r["tag"] for r in tt})
    tags = [PAD] + [t for t in ["O"] if t not in data_tags] + data_tags
    if tags[0] != PAD:
        tags.insert(0, PAD)
    t_idx = {t: i for i, t in enumerate(tags)}
    v, t = len(word_to_idx) + 2, len(tags)

    counts = np.zeros((v, t), dtype=np.float64)
    for r in tt:
        counts[word_to_idx[r["token"]], t_idx[r["tag"]]] = r["c"]
    tag_totals = counts.sum(axis=0)
    em = np.log((counts + smoothing) / (tag_totals + smoothing * v))
    # UNK row: uniform over observed tags (unseen word -> tag prior only)
    em[UNK_ID] = np.log((tag_totals + smoothing) / (tag_totals.sum()
                                                    + smoothing * t))
    em[0, :] = NEG_INF
    em[0, t_idx[PAD]] = 0.0

    validity = build_transition_matrix(tags)
    trans_counts = np.zeros((t, t), dtype=np.float64)
    for r in bg:
        trans_counts[t_idx[r["src"]], t_idx[r["dst"]]] = r["c"]
    src_totals = trans_counts.sum(axis=1, keepdims=True)
    trans = np.log((trans_counts + smoothing) / (src_totals + smoothing * t))
    trans = np.where(validity <= NEG_INF, NEG_INF, trans)

    return ViterbiCRFTagger(word_to_idx, tags, em, trans)


def prepare_for_transfer(model: ViterbiCRFTagger,
                         target_sentences: DataFrame,
                         smoothing: float = SMOOTHING) -> ViterbiCRFTagger:
    """Transfer learning: keep the SOURCE vocabulary, fit a fresh head
    (emissions over the target tag set + transitions) on the target corpus.

    Parity with the reference head swap: the CRF layer is replaced and
    resized to the target dataset's tag set while the target data is
    re-indexed with the source type maps
    (saber/models/multi_task_lstm_crf.py:170-192 +
    saber/utils/data_utils.py:120-137) — target tokens unseen in the source
    vocabulary become UNK rather than extending the vocab.
    """
    tt = _token_tag_counts(target_sentences).collect()
    bg = _tag_bigram_counts(target_sentences).collect()
    word_to_idx = model.word_to_idx  # source vocab, frozen
    data_tags = sorted({r["tag"] for r in tt})
    tags = [PAD] + [t for t in ["O"] if t not in data_tags] + data_tags
    t_idx = {t: i for i, t in enumerate(tags)}
    v, t = max(word_to_idx.values(), default=1) + 1, len(tags)

    counts = np.zeros((v, t), dtype=np.float64)
    unk_counts = np.zeros(t, dtype=np.float64)
    for r in tt:
        wid = word_to_idx.get(r["token"])
        if wid is None:
            unk_counts[t_idx[r["tag"]]] += r["c"]
        else:
            counts[wid, t_idx[r["tag"]]] = r["c"]
    tag_totals = counts.sum(axis=0) + unk_counts
    em = np.log((counts + smoothing) / (tag_totals + smoothing * v))
    em[UNK_ID] = np.log((unk_counts + smoothing) / (tag_totals.sum()
                                                    + smoothing * t))
    em[0, :] = NEG_INF
    em[0, t_idx[PAD]] = 0.0

    validity = build_transition_matrix(tags)
    trans_counts = np.zeros((t, t), dtype=np.float64)
    for r in bg:
        trans_counts[t_idx[r["src"]], t_idx[r["dst"]]] = r["c"]
    trans = np.log((trans_counts + smoothing)
                   / (trans_counts.sum(axis=1, keepdims=True) + smoothing * t))
    trans = np.where(validity <= NEG_INF, NEG_INF, trans)
    return ViterbiCRFTagger(word_to_idx, tags, em, trans)


def main() -> None:
    """CLI twin of ``python -m saber.cli.train`` (saber/cli/train.py):
    load a CoNLL corpus dir -> fit the tagger -> chunk-level P/R/F1 on the
    validation partition -> metrics JSON + saved artifact dir.

    Validation selection mirrors the reference's strategy dispatch
    (saber/trainer.py:40-45): a valid.* partition is used when present,
    otherwise a reproducible hash-based 10% split of train.
    """
    import argparse
    import json

    from saber_spark.artifacts import save_model_dir
    from saber_spark.kernels.chunk import chunk_entities
    from saber_spark.kernels.metrics import get_precision_recall_f1_support
    from saber_spark.operators.splits import train_valid_split
    from saber_spark.session import get_spark
    from saber_spark.sources.conll import load_conll_dir

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--data", required=True, help="CoNLL dir (train.*[, valid.*])")
    ap.add_argument("--out", default="/tmp/saber_train_metrics.json")
    ap.add_argument("--model-dir", default=None)
    args = ap.parse_args()

    spark = get_spark("saber_spark.train")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = load_conll_dir(spark, args.data)
    if corpus.filter(F.col("partition") == "valid").limit(1).count():
        train_df = corpus.filter(F.col("partition") == "train")
        valid_df = corpus.filter(F.col("partition") == "valid")
    else:
        train_df, valid_df = train_valid_split(
            corpus.filter(F.col("partition") == "train"), "sent_id")

    model = train_viterbi_tagger(train_df)

    # validation is fixture-scale by reference convention; the corpus-scale
    # path is detect_mentions over the page table (pipeline.py)
    rows = valid_df.select("tokens", "tags").collect()
    pred = model.predict_tags([r["tokens"] for r in rows])
    # sentence-scoped chunk identity: boundary = (sentence index, position)
    gold_chunks = [(lab, (i, s), (i, e))
                   for i, r in enumerate(rows)
                   for lab, s, e in chunk_entities(r["tags"])]
    pred_chunks = [(lab, (i, s), (i, e))
                   for i, seq in enumerate(pred)
                   for lab, s, e in chunk_entities(seq)]
    scores = get_precision_recall_f1_support(gold_chunks, pred_chunks, "exact")
    report = {
        "data": args.data,
        "n_train_sents": train_df.count(),
        "n_valid_sents": len(rows),
        "scores": {lab: {"precision": round(v[0], 6),
                         "recall": round(v[1], 6),
                         "f1": round(v[2], 6), "support": v[3]}
                   for lab, v in sorted(scores.items())},
    }
    if args.model_dir:
        # full fitted state: vocab + tag set + emission/transition matrices
        # (a reloaded model must predict identically, saber/base_model.py:23-52)
        save_model_dir(args.model_dir, kind="viterbi", surface_map={},
                       word_to_idx=model.word_to_idx,
                       weights={"emissions": model.emissions,
                                "transitions": model.transitions},
                       config={"tags": model.tags})
        report["model_dir"] = args.model_dir
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
