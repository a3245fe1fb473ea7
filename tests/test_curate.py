"""Operator-level behavior of the dataset-curation layer
(cdw_spark/operators/curate.py). Cross-engine value equality is proven by
tests/test_oracle_contract.py; these tests pin the *semantics* (split
determinism and proportions, merge tagging, decontamination soundness,
known PII counts) and the plan discipline (no Python in any data path).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdw_spark.catalog import load_fixture
from cdw_spark.registry import load_all

SPECS = load_all()

NEW_QUERIES = (
    "decontaminate_ngrams",
    "pii_redact",
    "quality_repetition",
    "sample_hash_split",
    "merge_incremental_upsert",
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_curate_suite_stays_jvm_side(spark, sf_dir):
    for name in NEW_QUERIES:
        plan = _plan(SPECS[name].fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, f"{name} fell off the JVM path"
        assert "ArrowEvalPython" not in plan, f"{name} uses pandas UDF needlessly"


def test_hash_split_deterministic_and_proportional(spark, sf_dir):
    """Same assignment on every evaluation, and the 800/100/100 bucket
    design shows up in the realized proportions (binomial tolerance)."""
    df = SPECS["sample_hash_split"].fn(spark, sf_dir)
    a = {r["doc_id"]: (r["bucket"], r["split"]) for r in df.collect()}
    b = {r["doc_id"]: (r["bucket"], r["split"]) for r in df.collect()}
    assert a == b
    n = len(a)
    train = sum(1 for _, s in a.values() if s == "train") / n
    assert 0.7 < train < 0.9
    assert {s for _, s in a.values()} <= {"train", "valid", "test"}


def test_merge_tags_and_key_union(spark, sf_dir):
    """Merged output = exactly one row per key present on either side;
    tags agree with side membership."""
    merged = {
        (r["user_id"], r["event_type"]): r["op"]
        for r in SPECS["merge_incremental_upsert"].fn(spark, sf_dir).collect()
    }
    e = load_fixture(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp")
    tkeys = {
        (r["user_id"], r["event_type"])
        for r in e.filter(F.col("ts") < cutoff).select("user_id", "event_type").distinct().collect()
    }
    skeys = {
        (r["user_id"], r["event_type"])
        for r in e.filter(F.col("ts") >= cutoff).select("user_id", "event_type").distinct().collect()
    }
    assert set(merged) == tkeys | skeys
    for k, op in merged.items():
        expected = "update" if k in tkeys and k in skeys else ("keep" if k in tkeys else "insert")
        assert op == expected, (k, op, expected)


def _shingle_set(text: str, n: int = 4) -> set[str]:
    ws = text.strip().lower().split()
    if len(ws) < n:
        return {" ".join(ws)}
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def test_decontaminate_sound_and_complete(spark, sf_dir):
    """Python-set reimplementation on the collected fixture: survivors
    share no 4-gram with the benchmark, and every non-survivor does."""
    docs = {r["doc_id"]: r["text"] for r in load_fixture(spark, sf_dir, "documents").collect()}
    bench_grams: set[str] = set()
    for did, text in docs.items():
        if did % 17 == 0:
            bench_grams |= _shingle_set(text)
    survivors = {r["doc_id"] for r in SPECS["decontaminate_ngrams"].fn(spark, sf_dir).collect()}
    for did, text in docs.items():
        if did % 17 == 0:
            assert did not in survivors
            continue
        contaminated = bool(_shingle_set(text) & bench_grams)
        assert (did not in survivors) == contaminated, did


def test_zorder_write_skips_more_files_than_single_sort(spark, sf_dir, tmp_path):
    """The claim behind layout_zorder: range-partitioning on the Morton key
    gives every file a tight min/max box on BOTH dimensions. Writing the
    same rows sorted by partkey alone leaves each file spanning the full
    suppkey range, so a suppkey band predicate prunes nothing; the
    z-ordered layout must prune strictly more files (parquet footer
    min/max, exactly what Spark's scan-level skipping reads)."""
    import pyarrow.parquet as pq

    from cdw_spark.plans.layout import write_zordered

    # Two balanced 8-bit dimensions (z-order pays off when the interleaved
    # widths are comparable; the raw fixture's suppkey spans 4 bits vs
    # partkey's 8+, so at 16 files the curve never splits a suppkey bit).
    li = (
        load_fixture(spark, sf_dir, "lineitem")
        .select(
            (F.col("l_orderkey") % 256).alias("a"),
            (F.col("l_partkey") % 256).alias("b"),
        )
    )
    zdir, sdir = str(tmp_path / "zorder"), str(tmp_path / "sorted")
    write_zordered(li, zdir, ["a", "b"], bits=8, num_files=16)
    li.repartitionByRange(16, "a").sortWithinPartitions("a").write.mode(
        "overwrite"
    ).parquet(sdir)

    def b_ranges(d):
        import os

        out = []
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(d, f))
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == "b"
                )
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            out.append((min(mins), max(maxs)))
        return out

    z_ranges, s_ranges = b_ranges(zdir), b_ranges(sdir)
    lo, hi = min(m for m, _ in s_ranges), max(m for _, m in s_ranges)
    band_lo, band_hi = lo, lo + (hi - lo) // 8  # narrow band on the 2nd dim

    def pruned(ranges):
        return sum(1 for mn, mx in ranges if mx < band_lo or mn > band_hi)

    # a-sorted files each span the full b range (0 pruned); z-ordered files
    # carry tight b boxes, so most fall outside the band.
    assert pruned(z_ranges) > max(2, pruned(s_ranges)), (z_ranges, s_ranges)


def test_pii_counts_match_injection(spark, sf_dir):
    """The synthetic corpus has no organic PII, so counts equal the
    injected amounts exactly: m=0 -> 1 email, m=1 -> 1 ip, m=2 -> 2
    emails + 1 ip; and redaction removes every match."""
    rows = SPECS["pii_redact"].fn(spark, sf_dir).collect()
    for r in rows:
        m = r["doc_id"] % 3
        assert (r["n_emails"], r["n_ips"]) == [(1, 0), (0, 1), (2, 1)][m], r
    d = load_fixture(spark, sf_dir, "documents")
    from cdw_spark.operators.curate import EMAIL_RE, IPV4_RE, pii_counts_and_redact

    n_e, n_i, red = pii_counts_and_redact(F.col("text"))
    # redacted text re-scanned must contain zero PII matches
    leftover = (
        d.select(red.alias("r"))
        .select(
            F.regexp_count(F.col("r"), F.lit(EMAIL_RE)).alias("e"),
            F.regexp_count(F.col("r"), F.lit(IPV4_RE)).alias("i"),
        )
        .agg(F.sum("e").alias("e"), F.sum("i").alias("i"))
        .first()
    )
    assert (leftover["e"], leftover["i"]) == (0, 0)


def test_pack_sequences_bucket_guard_and_width_invariance(spark, sf_dir):
    """VERDICT r2 #7: the unpartitioned bucket-total cumsum inside
    pack_sequences is safe only while the bucket relation stays tiny — a
    pathological bucket_width must raise instead of silently funneling the
    stream through one partition; and the packing result must be invariant
    to bucket_width (it is pure bookkeeping, not semantics)."""
    import pytest

    from cdw_spark.catalog import load_fixture
    from cdw_spark.operators.curate import pack_sequences

    docs = load_fixture(spark, sf_dir, "documents")

    with pytest.raises(ValueError, match="max_buckets"):
        pack_sequences(docs, bucket_width=1, max_buckets=100)

    a = {r.doc_id: (r.seq_offset, r.seq_id) for r in pack_sequences(docs).collect()}
    b = {
        r.doc_id: (r.seq_offset, r.seq_id)
        for r in pack_sequences(docs, bucket_width=7).collect()
    }
    assert a == b


def test_snapshot_diff_classifies_all_change_kinds(spark):
    from cdw_spark.operators.curate import snapshot_diff

    snap_a = spark.createDataFrame(
        [(1, 10, 1.0), (2, 20, 2.0), (3, 30, 3.0), (5, 50, None)],
        "k long, ver long, val double",
    )
    snap_b = spark.createDataFrame(
        [(2, 21, 2.0), (3, 30, 3.0), (4, 40, 4.0), (5, 50, None)],
        "k long, ver long, val double",
    )
    out = {r["k"]: r["change"] for r in
           snapshot_diff(snap_a, snap_b, "k", ["ver", "val"]).collect()}
    # 1: A-only -> delete; 2: ver changed -> update; 3 unchanged (absent);
    # 4: B-only -> insert; 5: NULL val on both sides compares equal (absent).
    assert out == {1: "delete", 2: "update", 4: "insert"}


def test_snapshot_diff_null_to_value_is_update(spark):
    from cdw_spark.operators.curate import snapshot_diff

    snap_a = spark.createDataFrame([(1, None)], "k long, val double")
    snap_b = spark.createDataFrame([(1, 7.0)], "k long, val double")
    rows = snapshot_diff(snap_a, snap_b, "k", ["val"]).collect()
    assert len(rows) == 1 and rows[0]["change"] == "update"
    assert rows[0]["old_val"] is None and rows[0]["new_val"] == 7.0


def test_compression_ratio_matches_direct_zlib(spark, sf_dir):
    import zlib

    from cdw_spark.catalog import load_fixture
    from cdw_spark.operators.curate import compression_ratio

    docs = load_fixture(spark, sf_dir, "documents")
    got = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        raw = row["text"].encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        g = got[row["doc_id"]]
        assert g["raw_bytes"] == len(raw) and g["comp_bytes"] == comp
        assert abs(g["ratio"] - round(comp / len(raw), 6)) < 1e-9


def test_quality_model_score_matches_python_reference(spark, sf_dir):
    """Pure-Python re-derivation of the hashed-feature linear model:
    same md5 bucketing, same weights, same normalization."""
    import hashlib
    import math
    import re

    from cdw_spark.catalog import load_fixture
    from cdw_spark.operators.curate import _qf_weights, quality_linear_score

    docs = load_fixture(spark, sf_dir, "documents")
    got = {r["doc_id"]: r for r in quality_linear_score(docs).collect()}
    w = _qf_weights()
    for row in docs.select("doc_id", "text").collect():
        toks = re.findall(r"[a-z0-9]+", row["text"].lower(), re.ASCII)
        z = 0.0
        counts = {}
        for t in toks:
            b = int(hashlib.md5(f"qf:{t}".encode()).hexdigest()[:4], 16) % 64
            counts[b] = counts.get(b, 0) + 1
        z = sum(w[b] * c for b, c in sorted(counts.items())) / len(toks)
        g = got[row["doc_id"]]
        assert g["n_tokens"] == len(toks)
        assert abs(g["logit"] - z) < 1e-4
        assert abs(g["prob"] - 1.0 / (1.0 + math.exp(-z))) < 1e-4


def test_bpe_merges_match_python_reference(spark, sf_dir):
    """The distributed trainer must learn exactly the merge table a
    textbook single-process BPE trainer learns from the same corpus."""
    import re
    from collections import Counter

    from cdw_spark.catalog import load_fixture
    from cdw_spark.operators.curate import bpe_train_merges

    docs = load_fixture(spark, sf_dir, "documents")
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train_merges(docs, n_merges=5).collect()
    ]

    freqs = Counter()
    for row in docs.select("text").collect():
        for w in re.split(r"\s+", row["text"].strip().lower(), flags=re.ASCII):
            if w:
                freqs[w] += 1
    vocab = {w: list(w) for w in freqs}
    expected = []
    for rank in range(1, 6):
        pair_counts = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += freqs[w]
        if not pair_counts:
            break
        (l, r), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((rank, l, r, l + r, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    assert got == expected


def test_group_split_has_no_user_leakage(spark, sf_dir):
    from cdw_spark.catalog import load_fixture
    from pyspark.sql import functions as F

    ev = load_fixture(spark, sf_dir, "events")
    hx = F.md5(F.concat(F.lit("grp:"), F.col("user_id").cast("string")))
    bucket = F.conv(F.substring(hx, 1, 4), 16, 10).cast("int") % 10
    tagged = ev.select(
        "user_id", F.when(bucket < 8, "train").otherwise("test").alias("split")
    )
    leaky = (
        tagged.groupBy("user_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert leaky == 0


def test_bpe_apply_matches_python_encoder(spark, sf_dir):
    import hashlib
    import re

    from cdw_spark.catalog import load_fixture
    from cdw_spark.operators.curate import bpe_apply_merges, bpe_train_merges

    docs = load_fixture(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"]) for r in bpe_train_merges(docs, n_merges=5).collect()
    ]
    got = {r["doc_id"]: r for r in bpe_apply_merges(docs, merges).collect()}

    def encode(w):
        syms = list(w)
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    for row in docs.select("doc_id", "text").collect():
        ws = [w for w in re.split(r"\s+", row["text"].strip().lower(), flags=re.ASCII) if w]
        enc = [encode(w) for w in ws]
        digest = hashlib.md5(
            " | ".join(" ".join(s) for s in enc).encode()
        ).hexdigest()
        g = got[row["doc_id"]]
        assert g["n_words"] == len(ws)
        assert g["n_symbols"] == sum(len(s) for s in enc)
        assert g["symbols_md5"] == digest


def test_exact_substring_dedup_interval_union(spark):
    """Planted cross-document span: two docs share one 10-word passage ->
    overlapping 8-gram hits must merge into ONE covered interval of
    exactly 10 tokens per doc (window count would overcount to 3x8);
    a doc with no cross-doc 8-gram reports zero."""
    from cdw_spark.operators.dedup import exact_substring_dedup

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    rows = [
        (1, f"unique1 words here only {shared} tail1 one"),
        (2, f"{shared} totally different trailing content two three"),
        (3, "nothing duplicated in this document at all whatsoever ever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in exact_substring_dedup(df, ngram=8).collect()}
    assert out[1].dup_tokens == 10 and out[2].dup_tokens == 10
    assert out[3].dup_tokens == 0
    assert abs(out[1].dup_fraction - 10 / out[1].n_tokens) < 1e-9


def test_nb_language_classifier_learns_planted_distributions(spark):
    """On a corpus where labels DO govern word choice (disjoint
    vocabularies plus shared noise), the in-plan naive Bayes must recover
    the label of nearly every held-out (odd-id) document. The fixture
    documents table can't show this (its lang labels are independent of
    the synthetic text) — there the value oracle checks the machinery."""
    import random

    from cdw_spark.operators.curate import nb_language_classifier

    rng = random.Random(7)
    vocab = {
        "aa": ["apfel", "birne", "kirsche", "traube"],
        "bb": ["manzana", "pera", "cereza", "uva"],
        "cc": ["pomme", "poire", "cerise", "raisin"],
    }
    shared = ["data", "spark", "table"]
    rows = []
    for i in range(120):
        lbl = ["aa", "bb", "cc"][i % 3]
        words = [rng.choice(vocab[lbl] + shared) for _ in range(30)]
        rows.append((i, " ".join(words), lbl))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_language_classifier(df).collect()
    assert len(out) == 60  # the odd-id half
    acc = sum(1 for r in out if r.pred_label == r.true_label) / len(out)
    assert acc >= 0.95, acc


def test_kmeans_exact_recovers_planted_clusters(spark):
    """Four well-separated planted blobs: the exact-arithmetic Lloyd loop
    must put each blob in its own cluster with the right sizes, and the
    reported integer inertia must equal the recomputed sum of min
    distances (self-consistency of the exact recurrence)."""
    import random

    from cdw_spark.operators.similarity import kmeans_exact

    rng = random.Random(11)
    dim = 8
    centers = [
        [2.0 if j == c else 0.0 for j in range(dim)] for c in range(4)
    ]
    rows = []
    vid = 0
    sizes = [10, 20, 30, 40]
    for c, sz in enumerate(sizes):
        for _ in range(sz):
            v = [centers[c][j] + rng.uniform(-0.2, 0.2) for j in range(dim)]
            rows.append((vid, v))
            vid += 1
    # ids 0..3 seed init; make them one per blob so labels are stable.
    # Full swap: the vacated ids 10/20/30 move onto the rows that gave up
    # 1/2/3, keeping every id unique (a broken half-swap here used to
    # leave ids 2 and 3 duplicated — six init rows — which the pre-r5
    # code masked by slicing argmin to the first k centroids; the
    # operator now rejects malformed init outright).
    rows[0], rows[10], rows[20], rows[30] = (
        (0, rows[0][1]), (1, rows[10][1]), (2, rows[20][1]), (3, rows[30][1]))
    rows[1] = (10, rows[1][1]); rows[2] = (20, rows[2][1]); rows[3] = (30, rows[3][1])
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.cid: r for r in kmeans_exact(df, k=4, iters=2, dim=dim).collect()}
    assert sorted(r.n for r in out.values()) == sizes
    assert all(r.inertia >= 0 for r in out.values())
    assert len({r.centroid_md5 for r in out.values()}) == 4


def test_kmeans_empty_cluster_oracle_parity(spark):
    """ADVICE r4: when a cluster EMPTIES mid-iteration (here: vec 1 is an
    exact duplicate of vec 0, so the tie rule sends it to cid 0 and
    cluster 1 never receives a point), the Spark loop keeps the stale
    centroid as a candidate. The SQL oracle must do the same — its
    carry-forward join keeps cids with no assignments — or the two
    diverge on such inputs."""
    import duckdb
    import pandas as pd

    from cdw_spark.operators.similarity import kmeans_exact, kmeans_oracle_sql

    dim = 4
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),  # duplicate of init 0 -> cluster 1 empties
        (2, [1.0, 1.0, 0.0, 0.0]),
        (3, [0.9, 1.1, 0.0, 0.0]),
        (4, [0.1, 0.0, 0.1, 0.0]),
        (5, [2.0, 2.0, 2.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.cid: (r.n, r.inertia, r.centroid_md5)
        for r in kmeans_exact(df, k=2, iters=2, dim=dim).collect()
    }

    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame({"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]}),
    )
    want = {
        int(cid): (int(n), int(inertia), md5)
        for cid, n, inertia, md5 in con.execute(
            kmeans_oracle_sql(k=2, iters=2, dim=dim)
        ).fetchall()
    }
    # After iteration 1, cluster 1 is EMPTY (tie rule sends the duplicate
    # to cid 0); its stale zero-centroid must stay a candidate on BOTH
    # sides, which is exactly what re-captures vecs 0/1/4 in iteration 2.
    # Without the oracle's carry-forward join, the SQL drops cid 1 and
    # reports a single 6-point cluster — a hash mismatch.
    assert got == want
    assert set(got) == {0, 1}
    assert got[1][0] > 0  # the emptied cluster re-acquired points


def test_leakage_safe_split_properties(spark, sf_dir):
    """The split must be component-pure: every near-duplicate pair lands
    in ONE split (the property per-document hash splits violate), all
    documents are covered exactly once, and proportions are near
    80/10/10 at component granularity."""
    from cdw_spark.catalog import load_fixture
    from cdw_spark.operators.dedup import ngram_jaccard_pairs
    from cdw_spark.registry import load_all

    SPECS = load_all()
    out = SPECS["sample_split_leakage_safe"].fn(spark, sf_dir)
    rows = out.collect()
    docs = load_fixture(spark, sf_dir, "documents")
    assert len(rows) == docs.count()  # total coverage, no dup rows
    split_of = {r.doc_id: r.split for r in rows}
    root_of = {r.doc_id: r.root for r in rows}

    # no near-dup pair straddles splits
    pairs = ngram_jaccard_pairs(docs).collect()
    assert pairs, "fixture must contain near-dup pairs for this test to bite"
    for p in pairs:
        assert split_of[p.id_a] == split_of[p.id_b], (p.id_a, p.id_b)
        assert root_of[p.id_a] == root_of[p.id_b]

    # and the per-document hash split WOULD have leaked on this corpus
    # (proves the operator is load-bearing, not vacuously equal)
    from cdw_spark.operators.curate import hash_split

    naive = {r.doc_id: r.split for r in hash_split(docs).collect()}
    assert any(naive[p.id_a] != naive[p.id_b] for p in pairs), (
        "fixture pairs all agree under the naive split; test can't bite"
    )

    # rough proportions at component granularity
    from collections import Counter

    c = Counter(split_of.values())
    n = sum(c.values())
    assert 0.6 < c["train"] / n < 0.95
    assert c["val"] + c["test"] > 0


def test_bpe_degenerate_corpus_trainer_and_oracle_agree(spark):
    """ADVICE r5 #1 regression: a corpus with fewer learnable merges than
    requested. The Spark trainer ``break``s and keeps what it learned; the
    unrolled SQL oracle must carry w{t-1} forward through the empty rounds
    (LEFT JOIN ON TRUE + COALESCE-style CASE) instead of collapsing every
    downstream CTE — and the two must still agree merge-for-merge."""
    import duckdb

    from cdw_spark.operators.curate import bpe_apply_merges, bpe_train_merges
    from cdw_spark.suite.datasetops import (
        _bpe_apply_oracle_sql,
        _bpe_merges_oracle_sql,
    )

    # 'ab ab cd' learns exactly 2 merges ((a,b) then (c,d)) of the 5 asked
    docs = spark.createDataFrame([(1, "ab ab cd")], "doc_id int, text string")
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train_merges(docs, n_merges=5).collect()
    ]
    assert got == [(1, "a", "b", "ab", 2), (2, "c", "d", "cd", 1)]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES (1, 'ab ab cd')) t(doc_id, text)"
    )
    oracle = sorted(con.execute(_bpe_merges_oracle_sql(5)).fetchall())
    assert [tuple(r) for r in oracle] == got

    # the apply side: both engines fully merge every word (3 words ->
    # 3 symbols), proving the empty rounds left w5 intact
    arows = con.execute(_bpe_apply_oracle_sql(5)).fetchall()
    assert len(arows) == 1
    doc_id, n_words, n_symbols, sym_md5 = arows[0]
    assert (doc_id, n_words, n_symbols) == (1, 3, 3)
    merges = [(left, right) for _, left, right, _, _ in got]
    srow = bpe_apply_merges(docs, merges).collect()[0]
    assert (srow["n_words"], srow["n_symbols"], srow["symbols_md5"]) == (
        n_words,
        n_symbols,
        sym_md5,
    )


def test_bpe_fold_escapes_quote_tokens(spark):
    """Learned tokens containing a single quote must not break the folded
    merge expression (they ride the plan as SQL literals)."""
    from cdw_spark.operators.curate import bpe_apply_merges, bpe_train_merges

    docs = spark.createDataFrame([(1, "a'b a'b")], "doc_id int, text string")
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train_merges(docs, n_merges=2).collect()
    ]
    assert got == [(1, "'", "b", "'b", 2), (2, "a", "'b", "a'b", 2)]
    row = bpe_apply_merges(docs, [(left, right) for _, left, right, _, _ in got]).collect()[0]
    assert (row["n_words"], row["n_symbols"]) == (2, 2)


def test_hilbert_matches_reference_and_beats_zorder_locality(spark, sf_dir):
    """Two claims behind layout_hilbert_order: (1) the unrolled SQL walk
    IS the canonical xy2d Hilbert index (checked against a direct Python
    transcription on a full 32x32 grid), and (2) the curve's no-seam
    adjacency yields equal-size curve segments whose 2-D bounding boxes
    are collectively tighter than Z-order's on the same grid (the file
    min/max-skipping surface, summed as total box area over 16 equal
    segments)."""
    from cdw_spark.suite.datasetops import _hilbert_step_exprs

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    bits, n = 5, 32
    grid = spark.range(n * n).selectExpr(
        "CAST(id % 32 AS BIGINT) AS ox", "CAST(id div 32 AS BIGINT) AS oy"
    )
    cur = grid.selectExpr("ox", "oy", "ox AS x", "oy AS y", "CAST(0 AS BIGINT) AS d")
    for i in range(bits):
        xe, ye, de = _hilbert_step_exprs(1 << (bits - 1 - i))
        cur = cur.selectExpr("ox", "oy", f"({xe}) AS x", f"({ye}) AS y", f"({de}) AS d")
    got = {(r["ox"], r["oy"]): r["d"] for r in cur.collect()}
    assert all(got[(x, y)] == xy2d(n, x, y) for x in range(n) for y in range(n))

    # adjacency: consecutive curve positions are grid neighbors
    byd = {d: xy for xy, d in got.items()}
    assert all(
        abs(byd[i][0] - byd[i + 1][0]) + abs(byd[i][1] - byd[i + 1][1]) == 1
        for i in range(n * n - 1)
    )

    def zorder(x, y):
        d = 0
        for i in range(bits):
            d |= ((x >> i) & 1) << (2 * i)
            d |= ((y >> i) & 1) << (2 * i + 1)
        return d

    def total_box_area(key):
        order = sorted(
            ((x, y) for x in range(n) for y in range(n)), key=lambda p: key(*p)
        )
        seg = len(order) // 16
        area = 0
        for f in range(16):
            pts = order[f * seg : (f + 1) * seg]
            xs, ys = [p[0] for p in pts], [p[1] for p in pts]
            area += (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)
        return area

    h_area = total_box_area(lambda x, y: got[(x, y)])
    z_area = total_box_area(zorder)
    assert h_area <= z_area, (h_area, z_area)
