"""Sequence-tagging models: the pluggable slot behind the tagging stage.

The reference's model is a Keras BiLSTM-CRF
(saber/models/multi_task_lstm_crf.py:56-145): word ids + char ids ->
per-token tag scores -> CRF decode, batch 256. The Keras/TF1 stack is not
buildable here (SURVEY.md §7.3), so this module ships:

  - ``to_index_sequences``: the exact O8 tensor plumbing
    (saber/preprocessor.py:139-193): word/char ids with <PAD>=0 <UNK>=1,
    right-pad/truncate to MAX_SENT_LEN=100 tokens and MAX_CHAR_LEN=25 chars
    (saber/constants.py:19-29,62-64);
  - ``ViterbiCRFTagger``: batched NumPy emission scoring + CRF-style
    transition-constrained Viterbi decode over those index tensors — the
    same interface and tensor shapes as the neural model (token sequences
    in, BIO tags out), with deterministic weights derived from the
    grounding dictionary instead of learned ones. A trained Keras/torch
    model drops into the same slot by replacing score computation only.

Everything here runs EXECUTOR-side inside mapInPandas; weights travel as a
Spark broadcast.
"""

from __future__ import annotations

import numpy as np

# parity: saber/constants.py:19-29, 60-64
PAD, UNK = "<PAD>", "<UNK>"
PAD_ID, UNK_ID = 0, 1
MAX_SENT_LEN = 100
MAX_CHAR_LEN = 25
PRED_BATCH_SIZE = 256

NEG_INF = -1e9


def to_index_sequences(
    sentences: list[list[str]],
    word_to_idx: dict[str, int],
    char_to_idx: dict[str, int] | None = None,
    max_sent_len: int = MAX_SENT_LEN,
    max_char_len: int = MAX_CHAR_LEN,
) -> tuple[np.ndarray, np.ndarray | None]:
    """Token sequences -> (word_idx [N x S], char_idx [N x S x C]).

    Right-pad with 0 / truncate 'post' — byte-for-byte the reference's
    pad_sequences usage (saber/preprocessor.py:180-193). Unknown words map
    to UNK_ID via dict.get (preprocessor.py:165-170).
    """
    n = len(sentences)
    word_idx = np.zeros((n, max_sent_len), dtype=np.int64)
    char_idx = (np.zeros((n, max_sent_len, max_char_len), dtype=np.int64)
                if char_to_idx is not None else None)
    for i, sent in enumerate(sentences):
        for j, tok in enumerate(sent[:max_sent_len]):
            word_idx[i, j] = word_to_idx.get(tok, UNK_ID)
            if char_idx is not None:
                for k, ch in enumerate(tok[:max_char_len]):
                    char_idx[i, j, k] = char_to_idx.get(ch, UNK_ID)
    return word_idx, char_idx


def build_tag_vocab(labels: list[str]) -> list[str]:
    """Tag inventory: [<PAD>, O, B-l1, I-l1, B-l2, ...] (PAD id 0)."""
    tags = [PAD, "O"]
    for lab in sorted(labels):
        tags.extend([f"B-{lab}", f"I-{lab}"])
    return tags


def build_transition_matrix(tags: list[str]) -> np.ndarray:
    """CRF-style BIO-validity transition scores (T x T, from -> to).

    Legal: * -> O, * -> B-X, B-X/I-X -> I-X. Illegal (NEG_INF): anything
    else -> I-X (the orphan-I ban the chunker golden encodes,
    saber/tests/test_preprocessor.py:91-92) and any transition into PAD
    except PAD -> PAD.
    """
    t = len(tags)
    trans = np.zeros((t, t), dtype=np.float64)
    for i, src in enumerate(tags):
        for j, dst in enumerate(tags):
            if dst == PAD:
                trans[i, j] = 0.0 if src == PAD else NEG_INF
            elif src == PAD:
                trans[i, j] = NEG_INF  # nothing follows PAD but PAD
            elif dst.startswith("I-"):
                dst_type = dst[2:]
                ok = (src == f"B-{dst_type}" or src == f"I-{dst_type}")
                trans[i, j] = 0.0 if ok else NEG_INF
    return trans


def emissions_from_dictionary(
    surface_map: dict[tuple[str, ...], str],
    word_to_idx: dict[str, int],
    tags: list[str],
    vocab_size: int | None = None,
) -> np.ndarray:
    """(V x T) emission score matrix derived from the grounding dictionary.

    Deterministic stand-in for learned emissions: tokens that open a
    dictionary surface score high on B-label; continuation tokens of
    multi-token surfaces score high on I-label; every real token gets a
    baseline O score; PAD emits only PAD.
    """
    if vocab_size is None:
        vocab_size = max(word_to_idx.values(), default=1) + 1
    t_index = {tag: i for i, tag in enumerate(tags)}
    em = np.zeros((vocab_size, len(tags)), dtype=np.float64)
    em[:, t_index["O"]] = 1.0
    em[PAD_ID, :] = NEG_INF
    em[PAD_ID, t_index[PAD]] = 0.0
    for surface_tokens, label in surface_map.items():
        b_tag, i_tag = f"B-{label}", f"I-{label}"
        if b_tag not in t_index:
            continue
        first_id = word_to_idx.get(surface_tokens[0])
        if first_id is not None:
            em[first_id, t_index[b_tag]] = max(em[first_id, t_index[b_tag]], 3.0)
        for cont in surface_tokens[1:]:
            cid = word_to_idx.get(cont)
            if cid is not None:
                em[cid, t_index[i_tag]] = max(em[cid, t_index[i_tag]], 2.5)
    return em


class ViterbiCRFTagger:
    """Batched emission + Viterbi decode with BIO-validity transitions.

    Same predict interface as the reference model chain
    (model.predict(batch 256).argmax -> CRF decode -> tags,
    saber/saber.py:97-101): token sequences in, BIO tag strings out,
    PAD positions stripped (O13).
    """

    def __init__(self, word_to_idx: dict[str, int], tags: list[str],
                 emissions: np.ndarray, transitions: np.ndarray | None = None):
        self.word_to_idx = word_to_idx
        self.tags = tags
        self.emissions = emissions
        self.transitions = (transitions if transitions is not None
                            else build_transition_matrix(tags))

    @classmethod
    def from_dictionary(cls, surface_map: dict[tuple[str, ...], str],
                        word_to_idx: dict[str, int]) -> "ViterbiCRFTagger":
        labels = sorted({lab for lab in surface_map.values()})
        tags = build_tag_vocab(labels)
        em = emissions_from_dictionary(surface_map, word_to_idx, tags)
        return cls(word_to_idx, tags, em)

    def _decode_batch(self, word_idx: np.ndarray,
                      lengths: np.ndarray) -> np.ndarray:
        """Vectorized Viterbi over a [N x S] id batch -> [N x S] tag ids."""
        n, s = word_idx.shape
        t = len(self.tags)
        scores = self.emissions[word_idx]             # N x S x T
        back = np.zeros((n, s, t), dtype=np.int64)
        alpha = scores[:, 0, :].copy()                # N x T
        alpha[:, 0] = NEG_INF                         # can't start in PAD...
        alpha[word_idx[:, 0] == PAD_ID, 0] = 0.0      # ...unless empty sent
        # a sequence cannot OPEN with I-  (the orphan-I ban at position 0;
        # transitions only constrain steps >= 1)
        i_tags = np.array([tag.startswith("I-") for tag in self.tags])
        alpha[:, i_tags] = NEG_INF
        for step in range(1, s):
            cand = alpha[:, :, None] + self.transitions[None, :, :]  # N x T x T
            back[:, step, :] = cand.argmax(axis=1)
            alpha = cand.max(axis=1) + scores[:, step, :]
        best = np.zeros((n, s), dtype=np.int64)
        best[:, s - 1] = alpha.argmax(axis=1)
        for step in range(s - 1, 0, -1):
            best[:, step - 1] = back[np.arange(n), step, best[:, step]]
        _ = lengths
        return best

    def predict_tags(self, sentences: list[list[str]]) -> list[list[str]]:
        if not sentences:
            return []
        out: list[list[str]] = []
        for b in range(0, len(sentences), PRED_BATCH_SIZE):
            batch = sentences[b:b + PRED_BATCH_SIZE]
            word_idx, _ = to_index_sequences(batch, self.word_to_idx)
            lengths = np.array([min(len(x), MAX_SENT_LEN) for x in batch])
            ids = self._decode_batch(word_idx, lengths)
            for row, sent in zip(ids, batch):
                # strip PAD positions (reference drops <PAD> anywhere and
                # silently truncates at 100 tokens, saber/saber.py:101;
                # we keep offsets aligned by tagging the tail 'O')
                tags = [self.tags[tid] for tid in row[:len(sent)]]
                tags = [tag if tag != PAD else "O" for tag in tags]
                if len(sent) > MAX_SENT_LEN:
                    tags = tags + ["O"] * (len(sent) - MAX_SENT_LEN)
                out.append(tags)
        return out
