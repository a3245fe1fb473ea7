"""ANN recall measurement against the exact brute-force baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdw_spark.catalog import load_fixture
from cdw_spark.operators.similarity import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_fixture(spark, sf_dir, "embeddings")


def test_lsh_ann_recall(emb):
    probes = emb.filter(F.col("vec_id") < 10)
    dim = len(emb.select("embedding").first()[0])
    exact = brute_force_topk(probes, emb, k=10)
    approx = lsh_topk(probes, emb, dim=dim, k=10)

    ex = {(r.probe_id, r.cand_id) for r in exact.collect()}
    ap = {(r.probe_id, r.cand_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    # Uniform-random embeddings are LSH's worst case (no cluster structure,
    # top-10 cosine ~0.45 => p(bit flip) ~ theta/pi ~ 0.35/plane): measured
    # recall 0.59 at sf0.001 / 0.52 at sf0.01 — clearly above the ~0.36
    # random-bucket base rate since the corpus/probe planes now agree
    # (round 1 drew them from a shared RNG stream and measured 0.32-0.44).
    # Deterministic: planes are seeded per call.
    assert recall >= 0.4, f"ANN recall too low: {recall:.2f}"


def test_brute_force_topk_is_sane(emb):
    out = brute_force_topk(emb.filter(F.col("vec_id") < 3), emb, k=5)
    rows = out.collect()
    assert len(rows) == 15  # 3 probes x 5
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, []).append(r)
    for probe, rs in by_probe.items():
        rs.sort(key=lambda r: r.rank)
        cos = [r.cosine for r in rs]
        assert cos == sorted(cos, reverse=True)
        assert all(-1.0 <= c <= 1.0 for c in cos)
        assert all(r.cand_id != probe for r in rs)


def test_ivf_ann_recall(emb):
    from cdw_spark.operators.similarity import ivf_topk

    probes = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(probes, emb, k=10)
    approx = ivf_topk(probes, emb, k=10, nlist=16, nprobe=4)

    ex = {(r.probe_id, r.cand_id) for r in exact.collect()}
    ap = {(r.probe_id, r.cand_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    # nprobe/nlist = 1/4 of the corpus scanned; on uniform-random vectors
    # (no cluster structure — IVF's worst case) measured recall ~0.5-0.6.
    assert recall >= 0.3, f"IVF recall too low: {recall:.2f}"
    # every returned row still carries an exact cosine, ranked descending
    rows = approx.collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, []).append(r)
    for rs in by_probe.values():
        rs.sort(key=lambda r: r.rank)
        cos = [r.cosine for r in rs]
        assert cos == sorted(cos, reverse=True)


def test_bucketed_pairs_differential_vs_exact(emb):
    """lsh_pairs_topn (the registered, bucketed form) against
    similar_pairs_topn (exact all-pairs — kept ONLY as this test's oracle):
    every overlapping pair must carry the identical exact cosine (the
    rescoring is exact; only candidate generation is approximate), and
    recall of the true global top-30 must clear the worst-case floor
    (uniform-random fixture, top pairs at cosine ~0.45: measured 0.70 at
    both sf0.001 and sf0.01)."""
    from cdw_spark.operators.similarity import lsh_pairs_topn, similar_pairs_topn

    exact = {(r.id_a, r.id_b): r.cosine for r in similar_pairs_topn(emb, n=30).collect()}
    buck = {(r.id_a, r.id_b): r.cosine for r in lsh_pairs_topn(emb, n=30).collect()}
    for pair, cos in buck.items():
        if pair in exact:
            assert cos == exact[pair], f"rescore drift on {pair}"
    recall = len(exact.keys() & buck.keys()) / len(exact)
    assert recall >= 0.5, f"bucketed pair recall too low: {recall:.2f}"


def test_bucketed_pairs_join_path_equals_arrow_path(spark, emb):
    """lsh_pairs_topn picks its rescorer by a size gate: broadcast numpy
    matrix under the threshold, vector re-attach joins above it. Both must
    produce identical rows — the dimension-loop numpy accumulation exists
    precisely to keep the fold order bit-equal to the SQL path."""
    from cdw_spark.operators.similarity import lsh_pairs_topn

    arrow = {(r.id_a, r.id_b): r.cosine for r in lsh_pairs_topn(emb, n=30).collect()}
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")  # force join path
    try:
        joined = {(r.id_a, r.id_b): r.cosine for r in lsh_pairs_topn(emb, n=30).collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert arrow == joined
