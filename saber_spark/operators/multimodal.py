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


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """DETERMINISTIC FAKE resize (PIL unavailable in-container): derives a
    width*height-proportional byte string from a sha256 stream of the
    payload — content-sensitive, size-correct, shaped like a real thumbnail.
    Replace the body (not the signature) with PIL/ffmpeg to go real."""
    n_bytes = max(1, (width * height) // 64)
    out = bytearray()
    counter = 0
    seed = payload or b""
    while len(out) < n_bytes:
        out.extend(hashlib.sha256(seed + counter.to_bytes(4, "big")).digest())
        counter += 1
    return bytes(out[:n_bytes])


def resize_media(media: DataFrame, width: int = 64, height: int = 64
                 ) -> DataFrame:
    """mapInPandas resize: (doc_id, media_type, payload, meta) -> same rows
    with thumbnail payloads and updated meta.

    Real Spark plumbing (Arrow batches, struct meta rebuild, 1:1 row
    contract); only the pixel work is the marked fake. Narrow stage — rides
    whatever partitioning the media table already has.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [_fake_resize(p, width, height) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "payload": thumbs,
                "meta": [{"width": width, "height": height, "n_bytes": len(t)}
                         for t in thumbs],
            })

    return media.select("doc_id", "media_type", "payload", "meta") \
        .mapInPandas(run, schema=MEDIA_SCHEMA)


FRAMES_SCHEMA = ("doc_id long, frame_idx int, ts_ms int, frame binary")


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 4) -> DataFrame:
    """mapInPandas frame sampling for video rows: one input row fans out to
    up to ``max_frames`` (doc_id, frame_idx, ts_ms, frame) rows.

    The 1:N row contract is the real plumbing being exercised (a video
    decoder emits multiple frames per input); frame bytes come from the
    marked fake. Non-video rows are dropped inside the batch — at scale,
    push ``media_type = 'video'`` BEFORE this stage so the scan prunes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for doc_id, mtype, payload in zip(
                    pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                if mtype != "video":
                    continue
                # fake duration: proportional to payload size
                n = min(max_frames, max(1, len(payload or b"") // 32))
                for i in range(n):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["frame"].append(_fake_resize(
                        (payload or b"") + i.to_bytes(4, "big"), 16, 16))
            yield pd.DataFrame(rows)

    return media.filter(F.col("media_type") == "video") \
        .select("doc_id", "media_type", "payload") \
        .mapInPandas(run, schema=FRAMES_SCHEMA)


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
