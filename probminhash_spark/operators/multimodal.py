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


def _fake_decode_batch(payloads, n_features: int) -> np.ndarray:
    """Deterministic codec stand-in, vectorized over the whole Arrow batch:
    per payload, the means of its ``n_features`` byte chunks (np.array_split
    sizing: first ``len%n`` chunks get one extra byte).  One concat + one
    prefix-sum for the batch — no per-payload Python.  Identical payloads ->
    identical features; empty payloads -> zeros."""
    npay = len(payloads)
    lens = np.fromiter(
        (len(p or b"") for p in payloads), dtype=np.int64, count=npay
    )
    buf = np.frombuffer(b"".join(p or b"" for p in payloads), dtype=np.uint8)
    prefix = np.zeros(buf.size + 1, dtype=np.float64)
    np.cumsum(buf, out=prefix[1:])
    offs = np.zeros(npay + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    i = np.arange(n_features)
    sizes = (lens // n_features)[:, None] + (i[None, :] < (lens % n_features)[:, None])
    bounds = np.concatenate(
        [np.zeros((npay, 1), np.int64), np.cumsum(sizes, axis=1)], axis=1
    )
    starts = offs[:-1, None] + bounds[:, :-1]
    ends = offs[:-1, None] + bounds[:, 1:]
    sums = prefix[ends] - prefix[starts]
    return np.where(sizes > 0, sums / np.maximum(sizes, 1), 0.0).astype(np.float32)


def extract_features(
    media: DataFrame,
    n_features: int = 64,
    use_real_decoders: bool = False,
) -> DataFrame:
    """media table -> per-item feature vectors via iterator mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoders:
                # the codec seam: per-payload calls are inherent to real
                # decoders (libjpeg etc.); stubbed in this container
                feats = [
                    _decode_image_real(p or b"", m["width"], m["height"])
                    .mean(axis=(0, 1))
                    .astype(np.float32)
                    if mod == "image"
                    else _fake_decode_batch([p], n_features)[0]
                    for p, mod, m in zip(pdf["payload"], pdf["modality"], pdf["meta"])
                ]  # pragma: no cover
            else:
                feats = list(_fake_decode_batch(list(pdf["payload"]), n_features))
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
