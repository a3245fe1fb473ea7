"""Multimodal plumbing: binary columns, metadata, mapInPandas batching."""

from __future__ import annotations

import pytest

from cdw_spark.catalog import load_fixture
from cdw_spark.operators.multimodal import FEATURE_DIM, attach_blob, decode_stub, extract_features


@pytest.fixture(scope="module")
def blobs(spark, sf_dir):
    return attach_blob(load_fixture(spark, sf_dir, "documents"))


def test_blob_schema(blobs):
    types = dict(blobs.dtypes)
    assert types["blob"] == "binary"
    assert types["blob_meta"].startswith("struct<byte_len:bigint,sha256:string,mime:string")


def test_decode_stub_gates_real_path():
    with pytest.raises(NotImplementedError):
        decode_stub(b"abc", fake=False)


def test_feature_extraction_deterministic(blobs):
    f1 = extract_features(blobs, fake=True).orderBy("doc_id").collect()
    f2 = extract_features(blobs.repartition(7), fake=True).orderBy("doc_id").collect()
    assert f1 == f2  # partitioning/batching must not change results
    assert all(len(r.features) == FEATURE_DIM for r in f1)
    assert all(0.0 <= x <= 1.0 for r in f1 for x in r.features)


def test_feature_sha_matches_jvm_side(blobs):
    """The Python-side sha256 (inside mapInPandas) must agree with the
    JVM-side sha2 in blob_meta — same bytes crossed the Arrow boundary."""
    feats = extract_features(blobs, fake=True).select("doc_id", "sha256")
    meta = blobs.select("doc_id", "blob_meta.sha256")
    assert feats.exceptAll(meta).count() == 0


def test_frame_sampler_deterministic_hashes(spark, sf_dir):
    from cdw_spark.catalog import load_fixture
    from cdw_spark.operators.multimodal import FRAME_SIZE, attach_blob, sample_frames

    d = attach_blob(load_fixture(spark, sf_dir, "documents"))
    a = {(r.doc_id, r.frame_idx): r.frame_sha for r in sample_frames(d).collect()}
    b = {(r.doc_id, r.frame_idx): r.frame_sha for r in sample_frames(d).collect()}
    assert a == b and a
    # geometry: a doc contributes ceil((len//FRAME_SIZE)/4) frames
    import math

    from pyspark.sql import functions as F

    lens = {r.doc_id: r.blen for r in d.select("doc_id", F.octet_length("text").alias("blen")).collect()}
    expected = sum(math.ceil((n // FRAME_SIZE) / 4) for n in lens.values())
    assert len(a) == expected


def test_resize_stub_contract():
    from cdw_spark.operators.multimodal import resize_stub

    out = resize_stub(b"abcdef", 8, 4, fake=True)
    assert len(out) == 32
    assert out == resize_stub(b"abcdef", 8, 4, fake=True)
    assert resize_stub(b"", 2, 2, fake=True) == b"\x00" * 4
    with pytest.raises(NotImplementedError):
        resize_stub(b"abc", 2, 2, fake=False)
