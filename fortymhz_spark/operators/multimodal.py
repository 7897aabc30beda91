"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` payloads + typed metadata
(schemas.MEDIA_ASSET); all per-asset compute runs as Arrow-batched
pandas iterators (``mapInPandas``) so the JVM↔Python boundary moves
whole columnar batches, never rows.

The actual codecs (PIL/ffmpeg/soundfile) are NOT available in this
container, so the decode kernel is stubbed: ``decode_stub`` raises
NotImplementedError unless ``fake=True``, in which case it produces a
deterministic fake feature vector from the payload bytes.  The Spark
plumbing — schema, batch iteration, partition sizing — is real and
tested; swapping in a real codec changes only ``_decode_one``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

DECODED_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, feature array<float>, "
    "lane_sums array<long>"
)


def _decode_one(
    payload: bytes, media_type: str, fake: bool
) -> tuple[list[float], list[int]]:
    """Decode one asset to (feature vector, integer lane sums).

    Real implementation would dispatch on media_type to PIL / soundfile /
    ffmpeg frame sampling.  Those libraries are not installed here, so:
    the fake kernel folds the payload's bytes into ``FEATURE_DIM``
    interleaved lanes.  ``lane_sums`` are the raw integer byte sums per
    lane — an exact, engine-portable checksum of the decode (the
    oracle recomputes them byte-for-byte); ``feature`` is the
    normalized float view a real model head would consume.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg/soundfile) not available in this "
            "environment — pass fake=True for the deterministic stub"
        )
    if payload is None:
        return [0.0] * FEATURE_DIM, [0] * FEATURE_DIM
    # Deterministic fake: byte-histogram moments, stable across runs.
    # Vectorized — zero-copy byte view, zero-pad to a lane multiple,
    # strided-reshape column sums (a per-byte Python loop was the
    # kernel's bottleneck at real payload sizes, before any codec).
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    pad = (-arr.size) % FEATURE_DIM
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    acc = arr.reshape(-1, FEATURE_DIM).sum(axis=0, dtype=np.int64)
    total = max(len(payload), 1)
    return [float(a) / total for a in acc], [int(a) for a in acc]


def decode_features(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode every asset into (asset_id, media_type, n_bytes, feature).

    ``mapInPandas`` streams Arrow batches through Python; partition
    count (not row count) bounds peak memory, so repartition upstream
    for very large payload columns.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_one(p, m, fake)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "feature": [d[0] for d in decoded],
                    "lane_sums": [d[1] for d in decoded],
                }
            )

    return df.select("asset_id", "media_type", "payload").mapInPandas(
        kernel, DECODED_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: expands each video asset into frame
    descriptors (asset_id, frame_idx) JVM-side; actual pixel decode is
    the stubbed kernel above.  Shows the explode-then-decode shape that
    keeps per-task work bounded for long videos."""
    n_frames = (F.length("payload") / F.lit(1000)).cast("int") + 1  # fake duration
    return (
        df.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), n_frames, F.lit(every_n))),
        )
        .select("asset_id", "frame_idx")
    )
