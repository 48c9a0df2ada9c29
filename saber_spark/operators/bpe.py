"""BPE tokenizer training + distributed encoding.

An LLM-data engine must train tokenizers over its own corpus. BPE
(Sennrich et al. 2016) is the standard; its trainer does NOT need to
iterate over the corpus — like sentencepiece/HuggingFace trainers it
operates on the WORD-FREQUENCY TABLE, which is vocabulary-bounded (the
same bound vocab build O6 already relies on: Heaps' law, ~10^6-10^7
distinct words even at 100 TB). So the Spark division of labor is:

  corpus side  ONE hash agg -> (word, freq)        [distributed]
  model side   merge loop over the freq dict       [driver, bounded]
  corpus side  encode via broadcast merges         [distributed, Arrow]

Encoding applies the ordered merge list per token — inherently iterative,
so it rides the sanctioned Arrow boundary (mapInPandas, same contract as
the tagger: one ArrowEvalPython node, batch-columnar transfer).

Determinism: merge selection is (pair frequency DESC, pair lexicographic
ASC) — a total order, so the trained merge list is reproducible anywhere.
The end-of-word marker </w> follows the original formulation (merges
never cross word boundaries).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"

#: distinct-word cap for wordpiece_encode's driver fast path — the
#: same vocabulary bound the BPE trainer's word-freq collect rides
DRIVER_WORD_CAP = 1_000_000


def word_freqs(tokens: DataFrame, tok_col: str = "token") -> DataFrame:
    """(.., token) -> (word, freq): the trainer's sufficient statistics.
    One partial+final hash agg; Zipf-head skew collapses map-side."""
    return (tokens.groupBy(F.col(tok_col).alias("word"))
            .agg(F.count(F.lit(1)).alias("freq")))


def pair_stats(freqs: dict[tuple[str, ...], int]) -> Counter:
    """Adjacent-symbol pair counts weighted by word frequency."""
    out: Counter = Counter()
    for sym, f in freqs.items():
        for i in range(len(sym) - 1):
            out[(sym[i], sym[i + 1])] += f
    return out


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i < len(sym) - 1 and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def learn_bpe(word_freq: dict[str, int],
              n_merges: int) -> list[tuple[str, str]]:
    """word-frequency dict -> ordered merge list (the BPE model).

    Pure driver-side computation over the bounded model table; stops
    early when no pair occurs twice (merging singletons memorizes the
    corpus). Ties break lexicographically — total order, reproducible.
    """
    freqs: dict[tuple[str, ...], int] = {
        tuple(w) + (END,): f for w, f in word_freq.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        stats = pair_stats(freqs)
        if not stats:
            break
        best_pair, best_n = None, -1
        for pair, n in stats.items():
            if n > best_n or (n == best_n and pair < best_pair):
                best_pair, best_n = pair, n
        if best_n < 2:
            break
        merges.append(best_pair)
        freqs = {_merge_word(s, best_pair): f for s, f in freqs.items()}
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply the ordered merge list to one word -> subword pieces
    (END marker folded into the last piece's spelling)."""
    sym: tuple[str, ...] = tuple(word) + (END,)
    for pair in merges:
        if len(sym) == 1:
            break
        sym = _merge_word(sym, pair)
    if sym and sym[-1] == END:
        sym = sym[:-1]
    elif sym and sym[-1].endswith(END):
        sym = sym[:-1] + (sym[-1][: -len(END)],)
    return list(sym)


def train_bpe(tokens: DataFrame, n_merges: int = 64,
              tok_col: str = "token") -> list[tuple[str, str]]:
    """Corpus tokens -> trained merge list. The collect is the model-side
    word-frequency table (vocabulary-bounded, same class as vocab build)."""
    wf = {r.word: r.freq for r in word_freqs(tokens, tok_col).collect()}
    return learn_bpe(wf, n_merges)


def encode_df(tokens: DataFrame, merges: list[tuple[str, str]],
              id_col: str = "doc_id", pos_col: str = "pos",
              tok_col: str = "token") -> DataFrame:
    """Distributed BPE encoding -> (doc_id, pos, piece_idx, piece).

    mapInPandas over Arrow batches with the merge list broadcast in the
    closure — the sanctioned Python boundary (single ArrowEvalPython
    node, tagger contract). Per-token work is bounded by token length x
    merge count.
    """
    schema = f"{id_col} long, {pos_col} long, piece_idx long, piece string"
    mg = list(merges)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, poss, idxs, pieces = [], [], [], []
            for i, p, w in zip(pdf[id_col], pdf[pos_col], pdf[tok_col]):
                if w is None:
                    continue
                enc = cache.get(w)
                if enc is None:
                    enc = encode_word(w, mg)
                    cache[w] = enc
                for j, piece in enumerate(enc):
                    ids.append(i); poss.append(p)
                    idxs.append(j); pieces.append(piece)
            yield pd.DataFrame({id_col: ids, pos_col: poss,
                                "piece_idx": idxs, "piece": pieces})

    return tokens.select(id_col, pos_col, tok_col).mapInPandas(run, schema)


def wordpiece_encode(tokens: DataFrame, vocab: list[str],
                     tok_col: str = "token", unk: str = "[UNK]",
                     max_word_len: int = 25) -> DataFrame:
    """WordPiece greedy longest-match-first encoding (Wu et al. 2016,
    arXiv:1609.08144 §4.1 — the BERT tokenizer; Schuster & Nakajima
    2012): split each word into the longest vocab piece at each
    position, continuation pieces prefixed '##'; any position with NO
    matching piece makes the WHOLE word ``unk`` (the BERT convention).
    The companion of the BPE encoder — same vocabulary-bounded model,
    different (match-based, not merge-based) inference — and, unlike
    encode_df's Arrow loop, expressed ENTIRELY in joins: WordPiece's
    greedy walk is a FUNCTIONAL GRAPH once the longest match per
    (word, position) is known.

    Plan shape (zero Python):
      1. DISTINCT words (vocabulary-bounded, Heaps' law — the same
         bound the BPE trainer rides) explode to (word, pos,
         candidate-substring) with constant fan-out <=
         max_word_len * max piece length;
      2. ONE broadcast join against the vocab + a max-struct agg give
         best(word, pos) = (longest piece, next pos) — an explicit
         jump table;
      3. the greedy walk is pointer-chasing over best: max_word_len
         LAZY rounds (no per-round actions — connected_components'
         rounds-mode contract) each ONE equi-join;
      4. words that get stuck emit ``unk``; results join back to the
         token table by word.

    max_word_len mirrors the reference's 25-char word cap
    (/root/reference/saber/constants.py:64, preprocessor.py:181-185) —
    longer words are ``unk`` outright (documented cap, like BERT's
    max_input_chars_per_word=100).

    -> (word, idx, piece): one row per emitted piece, idx 0-based.
    """
    if not vocab:
        raise ValueError("wordpiece_encode: empty vocab")
    spark = tokens.sparkSession
    vrows = []
    max_piece = 1
    for p in sorted(set(vocab)):
        cont = p.startswith("##")
        raw = p[2:] if cont else p
        if not raw:
            continue
        vrows.append((p, raw, len(raw), cont))
        max_piece = max(max_piece, len(raw))

    # r6 fast path: the operator's input AND output are both
    # vocabulary-bounded (distinct words, Heaps' law — the same bound
    # the BPE trainer's word-freq collect rides), so up to the cap the
    # whole greedy walk runs on the driver: one distinct+collect, the
    # longest-match loop in Python (identical semantics — within a
    # (word, pos) group the cont flag is fixed, so longest-match has
    # no ties), and a literal result frame. Replaces a 25-round lazy
    # pointer-chase plan (25 chained joins + periodic checkpoints)
    # whose analysis/codegen alone dominated the runtime. Corpora with
    # more distinct words than the cap keep the join path.
    wrows = (tokens.select(F.col(tok_col).alias("word")).distinct()
             .limit(DRIVER_WORD_CAP + 1).collect())
    if len(wrows) <= DRIVER_WORD_CAP:
        vmap = {(raw, cont): piece for piece, raw, _rl, cont in vrows}
        out_rows: list[tuple] = []
        for r in wrows:
            w = r["word"]
            pieces = None
            if w is not None and 1 <= len(w) <= max_word_len:
                pieces = []
                pos = 0
                while pos < len(w):
                    hit = None
                    for plen in range(min(max_piece, len(w) - pos),
                                      0, -1):
                        piece = vmap.get((w[pos:pos + plen], pos > 0))
                        if piece is not None:
                            hit = (plen, piece)
                            break
                    if hit is None:
                        pieces = None
                        break
                    pieces.append(hit[1])
                    pos += hit[0]
            if pieces is None:
                out_rows.append((w, 0, unk))
            else:
                out_rows.extend((w, i, p) for i, p in enumerate(pieces))
        return spark.createDataFrame(
            out_rows, "word string, idx int, piece string")

    vdf = spark.createDataFrame(
        vrows, "piece string, raw string, rlen int, cont boolean")

    words = (tokens.select(F.col(tok_col).alias("word")).distinct()
             .filter((F.length("word") >= 1)
                     & (F.length("word") <= max_word_len))
             .localCheckpoint(eager=True))
    # candidate substrings at every (pos, len) — constant fan-out
    cand = (words
            .select("word", F.posexplode(F.sequence(
                F.lit(1), F.length("word"))).alias("_", "pos"))
            .select("word", "pos", F.explode(F.sequence(
                F.lit(1),
                F.least(F.lit(max_piece),
                        F.length("word") - F.col("pos") + 1)))
            .alias("plen"))
            .select("word", "pos", "plen",
                    F.substring(F.col("word"), F.col("pos"),
                                F.lit(0) + F.col("plen"))
                    .alias("sub")))
    best = (cand.join(F.broadcast(vdf),
                      (cand.sub == vdf.raw)
                      & (vdf.cont == (cand.pos > 1)))
            .groupBy("word", "pos")
            .agg(F.max(F.struct(F.col("rlen"), F.col("piece")))
                 .alias("m"))
            .select("word", "pos",
                    F.col("m.piece").alias("piece"),
                    (F.col("pos") + F.col("m.rlen")).alias("next_pos"))
            .localCheckpoint(eager=True))
    # pointer-chase the jump table: lazy rounds, no driver actions
    walk = (best.filter(F.col("pos") == 1)
            .select("word", F.lit(0).alias("idx"), "piece", "next_pos"))
    out = walk
    step = walk
    for i in range(1, max_word_len):
        nxt = best.select(F.col("word").alias("w2"),
                          F.col("pos").alias("p2"),
                          F.col("piece").alias("piece2"),
                          F.col("next_pos").alias("np2"))
        step = (step.join(nxt, (step.word == nxt.w2)
                          & (step.next_pos == nxt.p2))
                .select("word", F.lit(i).alias("idx"),
                        F.col("piece2").alias("piece"),
                        F.col("np2").alias("next_pos")))
        # cut lineage every few rounds: 25 chained joins parse fine but
        # re-analysis cost grows; checkpoint keeps each round flat
        if i % 5 == 0:
            step = step.localCheckpoint(eager=True)
        out = out.unionByName(step)
    # a word is fully encoded iff its LAST emitted piece ends exactly at
    # len(word) + 1; stuck or over-long or never-started words -> unk
    done = (out.groupBy("word")
            .agg(F.max("next_pos").alias("endp"))
            .join(words, "word", "right")
            .select("word",
                    (F.coalesce("endp", F.lit(-1))
                     == F.length("word") + 1).alias("ok")))
    encoded = (out.join(done.filter(F.col("ok")), "word")
               .select("word", "idx", "piece"))
    unks = (tokens.select(F.col(tok_col).alias("word")).distinct()
            .join(done.filter(F.col("ok")).select("word"),
                  "word", "left_anti")
            .select("word", F.lit(0).cast("int").alias("idx"),
                    F.lit(unk).alias("piece")))
    return encoded.select("word", F.col("idx").cast("int").alias("idx"),
                          "piece").unionByName(unks)
