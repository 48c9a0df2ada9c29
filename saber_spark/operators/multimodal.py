"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as binary columns
with struct metadata; decode/feature-extraction runs in Arrow-batched
mapInPandas. The image/audio codecs are NOT available in this container, so
the decode kernel is a clearly-marked deterministic fake
(``_fake_decode_features``) behind the same batch interface a real one
(PIL/torchaudio) would use — the Spark-side plumbing (schema, partitioning,
UDF signature, Arrow batch shape) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

MEDIA_SCHEMA = ("doc_id long, media_type string, payload binary, "
                "meta struct<width:int, height:int, n_bytes:int>")
FEATURES_SCHEMA = ("doc_id long, media_type string, n_bytes int, "
                   "feature array<float>")


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Simulate a media column: payload = utf-8 bytes of the text, typed
    metadata derived from it. Pure built-ins — stands in for a real
    (url, image_bytes) crawl table."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col),
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
         .when(F.col(id_col) % 3 == 1, F.lit("audio"))
         .otherwise(F.lit("video")).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            (F.length(text_col) % 640).cast("int").alias("width"),
            (F.length(text_col) % 480).cast("int").alias("height"),
            F.length(payload).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """DETERMINISTIC FAKE decoder (real codecs unavailable in-container).

    A real implementation decodes the image/audio and runs a feature
    extractor; this stub derives `dim` floats from a sha256 of the payload —
    stable, content-sensitive, and shaped exactly like the real thing.
    Replace the body (not the signature) to go real.
    """
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(digest[: dim * 4], dtype=np.uint32).astype(np.float32)
    return arr / np.float32(2**32)


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow batches in, one feature vector per row out; the batch loop is
    vectorized over the payload column (no Spark-row-at-a-time Python).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode_features(p).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                "feature": feats,
            })

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA)
