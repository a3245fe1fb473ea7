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
