"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, batching, partition sizing, UDF signatures)
is real and tested; the actual codec calls are STUBBED behind
``NotImplementedError`` or a deterministic fake because no image/audio
libraries exist in this container — swap ``_decode_*_real`` for PIL/soundfile
implementations in production.

Design notes for 100 TB:
- payloads stay in ``binary`` columns; never collect, never base64 through
  strings; Arrow moves them zero-copy into the Python worker.
- ``mapInPandas`` (iterator form) processes one Arrow batch at a time so a
  partition of large blobs never materializes fully in worker memory; size
  partitions with ``spark.sql.files.maxPartitionBytes`` (~128 MB) and keep
  ``arrow.maxRecordsPerBatch`` low for multi-MB payloads.
- features come back as fixed-length ``array<float>`` for the similarity ops.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id long, modality string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

FEATURE_SCHEMA = "doc_id long, modality string, n_bytes long, features array<float>"


def _decode_image_real(payload: bytes, width: int, height: int) -> np.ndarray:
    raise NotImplementedError(
        "image decode requires PIL/libjpeg — not available in this container; "
        "plug a real decoder here (payload -> HxWx3 uint8 array)"
    )


def _fake_decode(payload: bytes, n_features: int) -> np.ndarray:
    """Deterministic stand-in: a hash-seeded projection of the raw bytes, so
    the full pipeline (schema, batching, downstream similarity) is testable
    end-to-end without codecs.  Identical payloads -> identical features."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(n_features, dtype=np.float32)
    chunks = np.array_split(arr.astype(np.float32), n_features)
    return np.array([c.mean() if c.size else 0.0 for c in chunks], dtype=np.float32)


def extract_features(
    media: DataFrame,
    n_features: int = 64,
    use_real_decoders: bool = False,
) -> DataFrame:
    """media table -> per-item feature vectors via iterator mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, modality, meta in zip(
                pdf["payload"], pdf["modality"], pdf["meta"]
            ):
                payload = payload or b""
                if use_real_decoders and modality == "image":
                    img = _decode_image_real(
                        payload, meta["width"], meta["height"]
                    )  # pragma: no cover
                    feats.append(img.mean(axis=(0, 1)).astype(np.float32))
                else:
                    feats.append(_fake_decode(payload, n_features))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_nth: int = 10,
) -> DataFrame:
    """Video frame sampling stub: emits (doc_id, frame_idx) plan rows for each
    video; the decode itself is the stubbed step.  Demonstrates the explode
    pattern (one row per frame) that keeps frame work distributable."""
    return (
        media.where(F.col("modality") == "video")
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                    F.lit(every_nth),
                )
            ).alias("frame_idx"),
        )
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Native per-modality profile (no UDF): counts, payload byte stats."""
    return (
        media.groupBy("modality")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.avg(F.length("payload")).alias("avg_bytes"),
        )
        .orderBy("modality")
    )
