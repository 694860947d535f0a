"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched mapInPandas.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake behind ``_decode_payload`` (clearly marked); everything
around it — schema, batch iteration, frame explosion, feature extraction
signature, partitioning — is the real Spark plumbing a production decoder
would drop into (swap ``_decode_payload`` for PIL/ffmpeg and nothing else
changes).

Scale notes: mapInPandas streams Arrow batches — payloads never
materialize on the driver; frame explosion multiplies rows *inside* the
executor before any shuffle; repartition on the id column upstream if
payload sizes are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_reflex_spark.io import read_table
from hive_reflex_spark.registry import query

FRAME_SIZE = 256  # bytes per fake "frame"
FEATURE_DIM = 8


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, media_type, payload binary, n_bytes): the
    text column UTF-8-encoded as a stand-in media payload."""
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.lit("application/x-fake-media").alias("media_type"),
        payload.alias("payload"),
        F.length(payload).alias("n_bytes"),
    )


def _decode_payload(payload: bytes) -> np.ndarray:
    """FAKE DECODER (no codecs in this container): deterministic byte
    array. A real build replaces this one function with PIL/librosa/ffmpeg.
    """
    return np.frombuffer(payload, dtype=np.uint8)


def decode_frames(media: DataFrame, frame_size: int = FRAME_SIZE) -> DataFrame:
    """Frame-sample each payload into fixed-size frames via mapInPandas:
    (doc_id, frame_idx, frame_bytes, checksum). The Arrow batch iterator
    is the real multimodal decode shape — one batch in, many frames out."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = _decode_payload(bytes(payload))
                for i in range(0, max(len(arr), 1), frame_size):
                    frame = arr[i : i + frame_size]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i // frame_size)
                    out["frame_bytes"].append(int(len(frame)))
                    out["checksum"].append(int(frame.sum()) if len(frame) else 0)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fn, "doc_id long, frame_idx int, frame_bytes int, checksum long"
    )


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Fixed-dim feature vector per payload (the embed step of a
    multimodal pipeline): deterministic byte-histogram features through
    the same mapInPandas shape a real encoder would use."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = _decode_payload(bytes(payload))
                hist = np.zeros(dim, dtype="float64")
                if len(arr):
                    np.add.at(hist, arr % dim, 1.0)
                    hist /= len(arr)
                ids.append(doc_id)
                feats.append(hist.tolist())
            yield pd.DataFrame({"doc_id": ids, "features": feats})

    return media.mapInPandas(fn, "doc_id long, features array<double>")


@query(
    "q65_multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT)
               AS n_frames,
           substr(md5(text), 1, 8) AS content_key
    FROM documents
    """,
)
def q65_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads — byte size, frame count at
    256 B/frame, content key — all scan-side expressions; the decode
    itself (frames/features) is the mapInPandas tier, checked in tests."""
    docs = read_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.ceil(F.length(payload) / 256.0).cast("long").alias("n_frames"),
        F.substring(F.md5("text"), 1, 8).alias("content_key"),
    )
