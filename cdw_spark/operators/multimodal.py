"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (BASELINE.json north star).

The container has no image/audio codecs, so the *decode* step is stubbed —
``decode_stub`` raises NotImplementedError unless ``fake=True``, in which
case it produces deterministic fake features. Everything around the stub is
real and scale-correct:

- blobs ride as BinaryType columns (Parquet BYTE_ARRAY — columnar, never
  parsed on scan unless projected);
- metadata (byte length, sha256 content address, declared mime) is computed
  JVM-side;
- feature extraction runs through ``mapInPandas`` with an explicit output
  schema: Arrow-batched, executor-parallel, constant memory per batch —
  the shape a real decoder (PIL/ffmpeg) would drop into unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 8


def _real_image_codec():
    """THE stub boundary: the one place that decides real vs fake decode.

    Returns a ``blob -> list[float]`` feature extractor backed by a real
    codec when one is importable (PIL here; soundfile/av would slot in the
    same way for audio/video), else None. This container ships no codecs,
    so callers fall through to the deterministic fake — but a deployment
    with Pillow installed flips every mapInPandas pipeline to real decode
    with zero code changes."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None

    def extract(blob: bytes) -> list[float]:
        img = Image.open(io.BytesIO(blob)).convert("L").resize((FEATURE_DIM, 1))
        return [px / 255.0 for px in img.getdata()]

    return extract

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Make an opaque binary column + typed metadata from a source column.

    (Here blobs come from text bytes — the fixtures carry no media — but
    the column types and plan shape are exactly what S3-hosted media would
    use.)"""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("blob", blob).withColumn(
        "blob_meta",
        F.struct(
            F.octet_length(F.col(text_col)).cast("long").alias("byte_len"),
            F.sha2(blob, 256).alias("sha256"),
            F.lit("text/plain").alias("mime"),
        ),
    )


def decode_stub(blob: bytes, fake: bool) -> list[float]:
    """Decode a media blob into features.

    Routes through the single import-gated codec boundary
    (``_real_image_codec``): a real decoder is used whenever importable;
    otherwise ``fake=True`` selects the deterministic fake (FEATURE_DIM
    floats derived from byte content) so the distributed plumbing stays
    fully testable in codec-less environments like this container."""
    real = _real_image_codec()
    if real is not None and not fake:
        return real(blob)
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not installed in this container; "
            "pass fake=True for deterministic plumbing-test features"
        )
    n = len(blob)
    return [float(blob[(i * 7919) % n]) / 255.0 if n else 0.0 for i in range(FEATURE_DIM)]


def extract_features(df: DataFrame, id_col: str = "doc_id", fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary blobs via mapInPandas.

    Batch shape: each pandas chunk holds whole blobs (Spark sizes batches
    by ``spark.sql.execution.arrow.maxRecordsPerBatch``); the UDF is pure
    per-row so Spark may split/reorder batches freely — no cross-batch
    state, which is what keeps this correct under AQE re-partitioning."""
    src = df.select(F.col(id_col).cast("long").alias("doc_id"), "blob")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": blobs.map(len),
                    "sha256": blobs.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    "features": blobs.map(lambda b: decode_stub(bytes(b), fake)),
                }
            )

    return src.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SIZE = 256  # bytes per fake "frame" (stand-in for a decoded frame)
FRAME_STRIDE = 4  # sample every 4th frame
FRAME_MS = 40  # 25 fps

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_ms", LongType()),
        StructField("frame_sha", StringType()),
    ]
)


def resize_stub(blob: bytes, width: int, height: int, fake: bool) -> bytes:
    """Resize an image blob.

    REAL CODECS NOT AVAILABLE IN THIS ENVIRONMENT — production would
    `PIL.Image.open(io.BytesIO(blob)).resize((width, height))` here. The
    deterministic fake tiles/truncates the source bytes to width*height so
    output size is exactly the contract a real resize keeps."""
    if not fake:
        raise NotImplementedError(
            "image codecs (PIL) are not installed in this container; "
            "pass fake=True for deterministic plumbing-test output"
        )
    need = width * height
    if not blob:
        return b"\x00" * need
    reps = -(-need // len(blob))
    return (blob * reps)[:need]


def sample_frames(df: DataFrame, id_col: str = "doc_id", fake: bool = True) -> DataFrame:
    """Frame sampling over binary 'video' blobs via mapInPandas: every
    FRAME_STRIDE-th FRAME_SIZE-byte frame becomes its own output row —
    the 1-row -> N-rows batch shape a real ffmpeg frame sampler uses
    (yielded DataFrames need not align with input batch sizes; Arrow
    re-chunks freely).

    Scale: output rows carry the frame hash, not the frame bytes — at
    100 TB the downstream join/dedup works on fingerprints and refetches
    bytes only for the survivors. Blobs here are text bytes (no media in
    the fixtures); the sampling geometry (frame count = floor(len/size),
    indices 0, stride, 2*stride, ...) is engine-neutral and oracle-checked
    in the multimodal_frame_sample query."""
    src = df.select(F.col(id_col).cast("long").alias("doc_id"), "blob")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, mss, shas = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                if not fake:
                    raise NotImplementedError(
                        "video codecs (ffmpeg/av) are not installed; "
                        "pass fake=True for deterministic plumbing-test frames"
                    )
                n_frames = len(b) // FRAME_SIZE
                for i in range(0, n_frames, FRAME_STRIDE):
                    frame = b[i * FRAME_SIZE : (i + 1) * FRAME_SIZE]
                    ids.append(doc_id)
                    idxs.append(i)
                    mss.append(i * FRAME_MS)
                    shas.append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_ms": mss, "frame_sha": shas}
            )

    return src.mapInPandas(run, FRAME_SCHEMA)
