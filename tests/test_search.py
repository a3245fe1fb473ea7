"""Properties and plan shapes for the retrieval/graph/sketch layer
(operators/search.py, operators/graph.py, operators/sketches.py).
Oracle equivalence itself is covered by test_oracle_contract.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdw_spark.catalog import load_fixture
from cdw_spark.operators.graph import pagerank
from cdw_spark.operators.search import bm25_search, inverted_index, tokenize
from cdw_spark.operators.sketches import cms_build, cms_estimate


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_fixture(spark, sf_dir, "documents")


def test_cms_never_underestimates_and_is_eps_bounded(spark, docs):
    """CMS guarantee: exact <= est <= exact + eps*TOTAL (w=256 -> eps ~ e/256)."""
    tok = tokenize(docs)
    exact = tok.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = cms_estimate(cms_build(tok), exact.select("term"))
    rows = exact.join(est, "term").collect()
    total = sum(r["exact_cnt"] for r in rows)
    eps = 2.718281828 / 256
    assert rows
    for r in rows:
        assert r["est"] >= r["exact_cnt"], r
        assert r["est"] <= r["exact_cnt"] + eps * total, r


def test_cms_merge_is_partitioning_independent(spark, docs):
    """The merged grid must be identical however the input is partitioned
    (the map-side partial grids are an exact commutative monoid)."""
    tok = tokenize(docs)
    a = {(r["j"], r["col"]): r["cnt"] for r in cms_build(tok.repartition(1)).collect()}
    b = {(r["j"], r["col"]): r["cnt"] for r in cms_build(tok.repartition(13)).collect()}
    assert a == b


def test_pagerank_mass_and_ordering(spark, sf_dir):
    """Rank mass stays in (0, 1]; dangling-drop variant loses mass but every
    node keeps at least the teleport floor; suppliers with more distinct
    customers outrank ones with fewer."""
    o = load_fixture(spark, sf_dir, "orders")
    li = load_fixture(spark, sf_dir, "lineitem")
    edges = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    ranks = pagerank(edges, iters=3).collect()
    n = len(ranks)
    mass = sum(r["r"] for r in ranks)
    assert 0.0 < mass <= 1.0 + 1e-9
    floor = 0.15 / n
    assert all(r["r"] >= floor - 1e-12 for r in ranks)

    indeg = {
        r["dst"]: r["cnt"]
        for r in edges.distinct().groupBy("dst").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    rk = {r["node"]: r["r"] for r in ranks}
    supp = sorted((k for k in rk if k.startswith("s")), key=lambda k: indeg.get(k, 0))
    # strongest-in-degree supplier should outrank the weakest
    if len(supp) >= 2 and indeg.get(supp[-1], 0) > indeg.get(supp[0], 0):
        assert rk[supp[-1]] > rk[supp[0]]


def test_pagerank_iterations_converge(spark, sf_dir):
    """Successive iterations contract toward a fixpoint: delta(i5, i6) <
    delta(i1, i2) in L1."""
    o = load_fixture(spark, sf_dir, "orders")
    li = load_fixture(spark, sf_dir, "lineitem")
    edges = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )

    def ranks(i):
        return {r["node"]: r["r"] for r in pagerank(edges, iters=i).collect()}

    r1, r2, r5, r6 = ranks(1), ranks(2), ranks(5), ranks(6)
    d_early = sum(abs(r1[k] - r2[k]) for k in r1)
    d_late = sum(abs(r5[k] - r6[k]) for k in r5)
    assert d_late < d_early


def test_bm25_single_term_ranks_by_saturating_tf(spark, docs):
    """With b=0 (length normalization off) and one query term, BM25 is
    strictly monotone in term count — the top doc has the corpus-max tf.
    With default b, scores are still positive and k is honored."""
    res0 = bm25_search(docs, ["spark"], k=5, b=0.0).collect()
    assert res0 and all(r["score"] > 0 for r in res0)
    counts = {
        r["doc_id"]: r["c"]
        for r in tokenize(docs)
        .filter(F.col("term") == "spark")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert counts[res0[0]["doc_id"]] == max(counts.values())

    res = bm25_search(docs, ["spark"], k=5).collect()
    assert len(res) == 5 and all(r["score"] > 0 for r in res)


def test_bm25_plan_is_take_ordered_not_global_window(spark, docs):
    """Scale guard: the top-k must compile to TakeOrderedAndProject; a
    single-partition global Window funnel here would be a 100 TB killer."""
    plan = bm25_search(docs, ["spark", "hash"], k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_inverted_index_postings_sorted_and_df_consistent(spark, docs):
    rows = inverted_index(docs).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r["postings"].split(",")]
        assert ids == sorted(ids)
        assert len(ids) == r["df"]


def test_hll_union_of_parts_equals_direct_sketch(spark, sf_dir):
    """The merge property behind cheap 100 TB NDV: HLL registers are a max
    monoid, so union(per-source sketches) must estimate exactly what one
    whole-corpus sketch estimates; both must sit within DataSketches'
    lgK=12 relative error of the exact NDV."""
    from cdw_spark.registry import load_all

    rows = {r["scope"]: r for r in load_all()["agg_hll_mergeable"].fn(spark, sf_dir).collect()}
    union, direct = rows["_union_of_parts"], rows["_all_direct"]
    assert union["est_ndv"] == direct["est_ndv"]
    exact = direct["exact_ndv"]
    assert abs(direct["est_ndv"] - exact) <= max(1, 0.05 * exact)
    for scope, r in rows.items():
        if r["exact_ndv"] is not None:
            assert abs(r["est_ndv"] - r["exact_ndv"]) <= max(1, 0.05 * r["exact_ndv"])


def test_approx_top_k_matches_exact_on_fixture(spark, sf_dir, docs):
    from pyspark.sql import functions as F

    from cdw_spark.registry import load_all

    approx = {
        (r["term"], r["est_count"])
        for r in load_all()["agg_approx_top_k"].fn(spark, sf_dir).collect()
    }
    exact = {
        (r["term"], r["c"])
        for r in tokenize(docs)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "term")
        .limit(10)
        .collect()
    }
    assert approx == exact


def test_phrase_search_counts_and_three_word_chain(spark):
    from cdw_spark.operators.search import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "big table hash join on the table hash map"),
            (2, "table of hash"),          # not adjacent
            (3, "TABLE Hash!"),            # case/punct normalization
            (4, "hash table"),             # wrong order
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_hits"] for r in phrase_search(docs, ["table", "hash"]).collect()}
    assert out == {1: 2, 3: 1}
    out3 = {r["doc_id"]: r["n_hits"] for r in
            phrase_search(docs, ["table", "hash", "join"]).collect()}
    assert out3 == {1: 1}


def test_hll_set_overlap_accuracy(spark, sf_dir):
    """Inclusion-exclusion over HLL sketches must land within the sketch
    error of the exact overlap for every source pair (at lgK=12 the
    relative standard error is ~1.6%; small vocabularies resolve
    near-exactly). Also sanity: intersection <= min cardinality,
    union >= max."""
    from cdw_spark.catalog import load_fixture
    from cdw_spark.operators.search import index_terms
    from cdw_spark.registry import load_all

    specs = load_all()
    got = {
        (r.src_a, r.src_b): (r.est_union, r.est_intersection)
        for r in specs["sketch_hll_set_overlap"].fn(spark, sf_dir).collect()
    }
    assert got

    tok = (
        load_fixture(spark, sf_dir, "documents")
        .select("source", F.explode(index_terms(F.col("text"))).alias("term"))
        .filter(F.col("source").isin("src0", "src1", "src2", "src3"))
    )
    vocab = {
        r.source: set(r.terms)
        for r in tok.groupBy("source").agg(
            F.collect_set("term").alias("terms")
        ).collect()
    }
    for (a, b), (est_u, est_i) in got.items():
        exact_u = len(vocab[a] | vocab[b])
        exact_i = len(vocab[a] & vocab[b])
        assert abs(est_u - exact_u) <= max(2, 0.05 * exact_u), (a, b, est_u, exact_u)
        assert abs(est_i - exact_i) <= max(3, 0.10 * exact_i), (a, b, est_i, exact_i)
        assert est_i <= est_u


def test_label_propagation_recovers_planted_communities(spark):
    """Two cliques with a single bridge edge: synchronous LPA must give
    every member of a clique that clique's minimum id as its label, and
    the bridge must not merge them (each endpoint is outvoted by its
    own clique)."""
    from cdw_spark.operators.graph import label_propagation

    c1 = [(a, b) for a in range(1, 6) for b in range(1, 6) if a != b]
    c2 = [(a, b) for a in range(10, 15) for b in range(10, 15) if a != b]
    bridge = [(5, 10), (10, 5)]
    edges = spark.createDataFrame(c1 + c2 + bridge, ["src", "dst"])
    got = {r["node"]: r["label"] for r in label_propagation(edges, iters=3).collect()}
    assert {got[n] for n in range(1, 6)} == {1}
    assert {got[n] for n in range(10, 15)} == {10}


def test_kmv_estimate_matches_reference_formula(spark):
    """KMV on a known key set: h_k and the (k-1)/h_k estimate must match
    a direct python computation of the same md5 arithmetic. Uses sf0.01
    (not the sf_dir fixture) because the estimator branch needs >= k
    distinct users; skipped where that fixture is absent."""
    import hashlib
    import os

    import pytest

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(os.path.join(sf, "events.parquet")):
        pytest.skip("sf0.01 fixture not present")
    from cdw_spark.registry import load_all
    from cdw_spark.suite.search import _KMV_K

    reg = load_all()
    df = reg["sketch_kmv_distinct"].fn(spark, sf)
    rows = {r["event_type"]: r for r in df.collect()}
    import duckdb

    con = duckdb.connect()
    users = [
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT user_id FROM '{sf}/events.parquet' "
            "WHERE event_type = 'click'"
        ).fetchall()
    ]
    hs = sorted(
        int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) / 4294967296.0
        for u in users
    )
    k = _KMV_K
    expect = round((k - 1) / hs[k - 1], 4) if len(hs) >= k else float(len(hs))
    assert rows["click"]["kmv_est"] == expect
    assert rows["click"]["n_exact"] == len(users)
