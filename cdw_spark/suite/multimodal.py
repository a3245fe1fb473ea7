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


@register(
    "multimodal_features_scalar",
    oracle="""
    SELECT doc_id,
           CASE WHEN n = 0 THEN 0.0 ELSE ascii(substr(text, (0 * 7919) % n + 1, 1)) / 255.0 END AS f0,
           CASE WHEN n = 0 THEN 0.0 ELSE ascii(substr(text, (1 * 7919) % n + 1, 1)) / 255.0 END AS f1,
           CASE WHEN n = 0 THEN 0.0 ELSE ascii(substr(text, (2 * 7919) % n + 1, 1)) / 255.0 END AS f2,
           CASE WHEN n = 0 THEN 0.0 ELSE ascii(substr(text, (3 * 7919) % n + 1, 1)) / 255.0 END AS f3,
           CASE WHEN n = 0 THEN 0.0 ELSE ascii(substr(text, (4 * 7919) % n + 1, 1)) / 255.0 END AS f4,
           CASE WHEN n = 0 THEN 0.0 ELSE ascii(substr(text, (5 * 7919) % n + 1, 1)) / 255.0 END AS f5,
           CASE WHEN n = 0 THEN 0.0 ELSE ascii(substr(text, (6 * 7919) % n + 1, 1)) / 255.0 END AS f6,
           CASE WHEN n = 0 THEN 0.0 ELSE ascii(substr(text, (7 * 7919) % n + 1, 1)) / 255.0 END AS f7
    FROM (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents)
    """,
    doc="The fake-decode features, value-oracled: the deterministic stub "
    "(byte[(i*7919) mod n] / 255) is restated in SQL over the same text "
    "bytes (fixture text is pure ASCII, so char position == byte "
    "position), projected to scalar DOUBLE columns — the driver hash "
    "checks the whole mapInPandas decode path end to end; the array-"
    "shaped twin multimodal_features stays the production schema.",
)
def multimodal_features_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = attach_blob(load_fixture(spark, sf_dir, "documents"))
    feats = extract_features(d, fake=True)
    return feats.select(
        "doc_id", *[F.col("features")[i].alias(f"f{i}") for i in range(8)]
    )


@register(
    "multimodal_audio_rms",
    oracle="""
    WITH f AS (SELECT doc_id, unnest(range(0, 4)) AS frame_idx FROM documents),
    s AS (SELECT doc_id, frame_idx, unnest(range(0, 64)) AS j FROM f),
    v AS (
        SELECT doc_id, frame_idx,
               ((doc_id * 31 + (frame_idx * 64 + j) * 7) % 2003) - 1001 AS smp
        FROM s
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           ROUND(sqrt(CAST(SUM(smp * smp) AS DOUBLE) / CAST(64.0 AS DOUBLE)), 6) AS rms
    FROM v
    GROUP BY doc_id, frame_idx
    """,
    doc="Audio modality end-to-end with a REAL stdlib codec: deterministic "
    "PCM samples per document are wav_encode'd, the 16-bit mono WAV blob "
    "is wav_decode'd back inside Arrow-batched mapInPandas, and per-64-"
    "sample frame RMS energy is emitted. The oracle states the same RMS "
    "math directly on the synthesized samples, so the driver hash checks "
    "the encode->decode->feature round trip itself (sum of squares is "
    "exact BIGINT; /64 and sqrt are correctly-rounded IEEE ops in both "
    "engines). operators/multimodal.py:wav_encode/wav_decode/"
    "audio_frame_rms.",
)
def multimodal_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from ..operators.multimodal import audio_frame_rms, wav_encode

    d = load_fixture(spark, sf_dir, "documents").select("doc_id")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                samples = [((int(did) * 31 + i * 7) % 2003) - 1001 for i in range(256)]
                blobs.append(wav_encode(samples, 8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "audio": blobs})

    with_audio = d.mapInPandas(synth, schema="doc_id long, audio binary")
    out = audio_frame_rms(with_audio, frame=64)
    return out.select("doc_id", "frame_idx", F.round("rms", 6).alias("rms"))


@register(
    "multimodal_image_near_dup",
    oracle=None,
    doc="Near-duplicate IMAGE detection: perceptual average-hash (8x8 "
    "luma grid over the decoded raster) then hamming<=3 pairs via the "
    "pigeonhole 4x16-bit chunk equi-join — the visual twin of the "
    "simhash text plan; only (id, 64-bit hash) rows ever shuffle. "
    "Rows-only BY NATURE (image decode is not SQL); planted twin images "
    "(doc_id % 50 == 1 perturbs its predecessor's raster by one byte) "
    "give a known ground truth asserted with a pure-Python "
    "brute-force reference in tests/test_multimodal.py "
    "(operators/multimodal.py:ahash_near_duplicates).",
)
def multimodal_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import ahash_near_duplicates

    return ahash_near_duplicates(load_fixture(spark, sf_dir, "documents"))


@register(
    "multimodal_video_shots",
    oracle=None,
    doc="Video shot-boundary detection: decode each clip (stdlib PVV "
    "frame container — the demuxer seam a real deployment fills with "
    "PyAV), 8-bin luma histogram per frame, cut where consecutive "
    "frames' L1 histogram distance exceeds 0.5 — the first-pass shot "
    "segmenter video-training pipelines run before per-shot frame "
    "sampling. Rows-only BY NATURE (decode); the planted mid-clip cut "
    "and a pure-Python reference are asserted in "
    "tests/test_multimodal.py (operators/multimodal.py:"
    "video_shot_boundaries).",
)
def multimodal_video_shots(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import video_shot_boundaries

    return video_shot_boundaries(load_fixture(spark, sf_dir, "documents"))


@register(
    "multimodal_audio_spectral",
    oracle=None,
    doc="Audio spectral centroid per 256-sample frame over the real "
    "stdlib WAV codec — the brightness feature of audio quality "
    "filters, complementing the time-domain RMS query. Rows-only BY "
    "NATURE (FFT); numpy-rfft differential in tests/test_multimodal.py "
    "(operators/multimodal.py:audio_spectral_centroid).",
)
def multimodal_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_spectral_centroid

    return audio_spectral_centroid(load_fixture(spark, sf_dir, "documents"))


@register(
    "multimodal_image_phash_near_dup",
    oracle=None,
    doc="Near-duplicate IMAGE detection by DCT perceptual hash: "
    "fixed-point 16x16 DCT-II (integer basis, exact int64 matmuls — the "
    "same reason codecs specify integer transforms), top-left 8x8 "
    "low-frequency block thresholded at its integer median, then the "
    "pigeonhole 4x16-bit chunk equi-join shared with the aHash plan. "
    "Sturdier than aHash (low-frequency structure, not per-cell "
    "brightness). Rows-only BY NATURE (image decode is not SQL); planted "
    "one-byte twin rasters and scalar/batch bit-identity are asserted in "
    "tests/test_multimodal.py (operators/multimodal.py:phash_near_duplicates).",
)
def multimodal_image_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import phash_near_duplicates

    return phash_near_duplicates(load_fixture(spark, sf_dir, "documents"))
