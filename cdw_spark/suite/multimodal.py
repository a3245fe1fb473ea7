"""Multimodal plumbing queries (operators/multimodal.py). The metadata
surface (byte length, sha256 content address) is engine-neutral and
oracle-checked; the mapInPandas feature path is Spark-specific -> rows-only
(deterministic fake features, validated in tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_fixture
from ..operators.multimodal import attach_blob, extract_features
from ..registry import register


@register(
    "multimodal_blob_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           sha256(text) AS content_sha256,
           'text/plain' AS mime
    FROM documents
    """,
    doc="Opaque-binary column metadata: byte length + sha256 content "
    "address + declared mime (the typed-metadata half of multimodal "
    "columns).",
)
def multimodal_blob_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = attach_blob(load_fixture(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.col("blob_meta.byte_len").alias("byte_len"),
        F.col("blob_meta.sha256").alias("content_sha256"),
        F.col("blob_meta.mime").alias("mime"),
    )


@register(
    "multimodal_features",
    oracle=None,  # mapInPandas fake-decode features are Spark-side only
    doc="Arrow-batched mapInPandas feature extraction over binary blobs "
    "(decode stubbed deterministically — no codecs in container). "
    "Rows-only check; determinism + batch-shape tested in "
    "tests/test_multimodal.py.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = attach_blob(load_fixture(spark, sf_dir, "documents"))
    return extract_features(d, fake=True)


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH d AS (
        SELECT doc_id, octet_length(encode(text)) AS blen FROM documents
    )
    SELECT doc_id, unnest(range(0, blen // 256, 4)) AS frame_idx,
           unnest(range(0, blen // 256, 4)) * 40 AS frame_ms
    FROM d
    WHERE blen >= 256
    """,
    doc="Frame sampling geometry over binary 'video' blobs: every 4th "
    "256-byte frame -> one row (frame index + timestamp). The mapInPandas "
    "sampler's 1->N row explosion is oracle-checked on its engine-neutral "
    "columns; frame-content hashes are Spark-side (tests/test_multimodal).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import sample_frames

    d = attach_blob(load_fixture(spark, sf_dir, "documents"))
    return sample_frames(d, fake=True).select("doc_id", "frame_idx", "frame_ms")
