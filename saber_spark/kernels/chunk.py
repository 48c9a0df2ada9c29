"""BIO/BIOES entity chunk decoding.

Behavioral parity with the reference chunker
(saber/preprocessor.py:195-227, goldens saber/tests/test_preprocessor.py:82-100):
  - a chunk opens only at a ``B-`` tag (orphan ``I-`` runs are invalid and
    dropped — golden: ['O','I-CHED','I-CHED','O'] -> []);
  - following ``I-`` tags of the SAME type extend the chunk;
  - any other tag (including ``I-`` of a different type, ``O``, a new ``B-``,
    or BIOES ``E-``/``S-``) closes it;
  - returns (type, start_token_inclusive, end_token_exclusive).

Implemented fresh as a linear scan (the reference uses an inner lookahead
loop; same output). Also used as the oracle for the SQL window-function
formulation in saber_spark.operators.chunker.
"""

from __future__ import annotations


def chunk_entities(seq: list[str]) -> list[tuple[str, int, int]]:
    """Decode a BIO/BIOES tag sequence into (label, start, end) chunks."""
    chunks: list[tuple[str, int, int]] = []
    open_type: str | None = None
    open_start = 0
    for i, tag in enumerate(seq):
        t_type = tag.split("-")[-1]
        if tag.startswith("B"):
            if open_type is not None:
                chunks.append((open_type, open_start, i))
            open_type, open_start = t_type, i
        elif tag.startswith("I") and open_type == t_type:
            continue
        else:
            if open_type is not None:
                chunks.append((open_type, open_start, i))
                open_type = None
    if open_type is not None:
        chunks.append((open_type, open_start, len(seq)))
    return chunks
