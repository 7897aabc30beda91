"""Multimodal-column queries (north star §2.9; operators/multimodal.py).

There is no media fixture, so assets are synthesized *deterministically*
from the ``documents`` table (payload = UTF-8 bytes of the text, media
type cycled by id) — which makes the Spark-side binary plumbing
oracle-checkable: DuckDB can mirror the synthesis with ``encode()`` and
check byte counts / frame plans cell-for-cell, while the decode kernel
itself (the part a real deployment swaps for PIL/ffmpeg) stays a
deterministic stub behind the same ``mapInPandas`` signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fortymhz_spark.operators.multimodal import decode_features, frame_sample_plan
from fortymhz_spark.queries.registry import Registry
from fortymhz_spark.sources.batch import load_table

reg = Registry()
QUERIES = reg.queries
ORACLE = reg.oracle

# doc_id % 3: 0 → image, 1 → audio, 2 → video  (element_at is 1-based)
_MEDIA_TYPES = ("image", "audio", "video")
_SQL_MEDIA_TYPE = (
    "CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
    "ELSE 'video' END"
)


# Payload synthesis sanitizes to printable ASCII first: the byte-lane
# checksum oracle (q_media_features) equates byte i with ord(char i),
# which only holds for single-byte characters.  The current fixtures
# are pure ASCII (verified), but fixture REGENERATIONS have already
# changed physical types once (events.ts) — the sanitize step makes the
# byte=ord identity true by construction on both engines instead of by
# fixture luck.  The character class [ -~] (printable ASCII) means the
# same thing to Spark and DuckDB regexes (verified including astral
# codepoints: both engines match per CODEPOINT, so an emoji replaces
# as one '?' on each side).
_SANITIZE_RE = "[^ -~]"
_SQL_SANITIZED_TEXT = f"regexp_replace(text, '{_SANITIZE_RE}', '?', 'g')"


def synth_media_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → MEDIA_ASSET-shaped frame (binary payload + meta map)."""
    docs = load_table(spark, sf_dir, "documents")
    media_type = F.element_at(
        F.array(*[F.lit(t) for t in _MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        media_type.alias("media_type"),
        F.encode(
            F.regexp_replace("text", _SANITIZE_RE, "?"), "UTF-8"
        ).alias("payload"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


@reg.query(
    "q_media_decode_stats",
    oracle=f"""
    SELECT
      {_SQL_MEDIA_TYPE} AS media_type,
      COUNT(*) AS n_assets,
      CAST(SUM(octet_length(encode({_SQL_SANITIZED_TEXT}))) AS BIGINT) AS total_bytes,
      MAX(octet_length(encode({_SQL_SANITIZED_TEXT}))) AS max_bytes
    FROM documents
    GROUP BY 1
    ORDER BY media_type
    """,
)
def q_media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every asset through the Arrow-batched ``mapInPandas``
    kernel (stub codec) and aggregate byte counts per modality — the
    oracle checks that the binary column plumbing (encode → batch →
    kernel → n_bytes) is exact."""
    assets = synth_media_assets(spark, sf_dir)
    decoded = decode_features(assets, fake=True)
    return (
        decoded.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy("media_type")
    )


@reg.query(
    "q_media_frame_sample",
    oracle=f"""
    SELECT
      doc_id AS asset_id,
      len(generate_series(0, octet_length(encode({_SQL_SANITIZED_TEXT})) // 1000 + 1, 30))
        AS n_sampled_frames
    FROM documents
    WHERE (doc_id % 3) = 2
    ORDER BY asset_id
    """,
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: explode each video asset into frame
    descriptors JVM-side, count sampled frames per asset."""
    assets = synth_media_assets(spark, sf_dir)
    frames = frame_sample_plan(assets, every_n=30)
    return (
        frames.groupBy("asset_id")
        .agg(F.count(F.lit(1)).alias("n_sampled_frames"))
        .orderBy("asset_id")
    )


# Payloads are sanitized to printable ASCII (synth_media_assets), so
# byte i of the UTF-8 payload == ord(character i) BY CONSTRUCTION and
# DuckDB can recompute the kernel's interleaved byte-lane sums exactly
# on any fixture generation.
_SQL_LANE_SUMS = ",\n      ".join(
    "CAST(COALESCE(SUM(CASE WHEN (i - 1) % 8 = {k} "
    "THEN ord(substr(t, CAST(i AS INT), 1)) END), 0) AS BIGINT) AS s{k}".format(k=k)
    for k in range(8)
)


@reg.query(
    "q_media_features",
    oracle=f"""
    WITH expanded AS (
      SELECT doc_id, unnest(generate_series(1, length(t))) AS i, t
      FROM (SELECT doc_id, {_SQL_SANITIZED_TEXT} AS t FROM documents)
    ),
    lanes AS (
      SELECT doc_id,
      {_SQL_LANE_SUMS}
      FROM expanded GROUP BY doc_id
    )
    SELECT
      d.doc_id AS asset_id,
      {_SQL_MEDIA_TYPE.replace('doc_id', 'd.doc_id')} AS media_type,
      octet_length(encode({_SQL_SANITIZED_TEXT.replace('text', 'd.text')})) AS n_bytes,
      COALESCE(l.s0, 0) AS s0, COALESCE(l.s1, 0) AS s1,
      COALESCE(l.s2, 0) AS s2, COALESCE(l.s3, 0) AS s3,
      COALESCE(l.s4, 0) AS s4, COALESCE(l.s5, 0) AS s5,
      COALESCE(l.s6, 0) AS s6, COALESCE(l.s7, 0) AS s7
    FROM documents d LEFT JOIN lanes l ON d.doc_id = l.doc_id
    ORDER BY asset_id
    """,
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub feature extraction for every asset, graded by INTEGERIZED
    CHECKSUMS: the Arrow kernel folds payload bytes into 8 interleaved
    lanes and emits the raw integer byte sums (``lane_sums``) beside
    the normalized float ``feature`` view.  The float view is not
    hash-portable across engines (float32 division); the lane sums are
    exact, so the oracle recomputes them byte-for-byte in SQL — the
    decode plumbing (encode → Arrow batch → kernel → per-lane fold) is
    fully differential-checked, not rows-only.

    Emitted as eight scalar BIGINT columns (s0..s7), not one array
    column — driver-graded output must stay scalar (see registry
    docstring: the canonicalizer cannot sort array cells)."""
    from fortymhz_spark.operators.multimodal import FEATURE_DIM

    assets = synth_media_assets(spark, sf_dir)
    feats = decode_features(assets, fake=True)
    return feats.select(
        "asset_id",
        "media_type",
        "n_bytes",
        *[
            F.element_at("lane_sums", i + 1).alias(f"s{i}")
            for i in range(FEATURE_DIM)
        ],
    ).orderBy("asset_id")
