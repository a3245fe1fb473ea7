"""Targeted references for the round-7 operators: each new statistic or
search path is checked against an independent pure-Python implementation
on the small fixture (the DuckDB oracle equivalence is separately swept
by test_oracle_contract.py — these tests pin the MATH, not the SQL)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cdw_spark.catalog import load_fixture
from cdw_spark.registry import load_all

SPECS = load_all()


def _avg_ranks(values):
    """value -> average rank (1-based) over the sorted multiset."""
    s = sorted(values)
    ranks, i = {}, 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[s[i]] = (i + 1 + j) / 2.0
        i = j
    return ranks


def test_binary_auc_matches_python(spark, sf_dir):
    row = SPECS["eval_binary_auc"].fn(spark, sf_dir).collect()[0]
    docs = load_fixture(spark, sf_dir, "documents").select("n_chars", "lang").collect()
    pos = [r["n_chars"] for r in docs if r["lang"] == "en"]
    neg = [r["n_chars"] for r in docs if r["lang"] != "en"]
    ranks = _avg_ranks(pos + neg)
    r1 = sum(ranks[v] for v in pos)
    auc = (r1 - len(pos) * (len(pos) + 1) / 2.0) / (len(pos) * len(neg))
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert abs(row["auc"] - auc) < 1e-5
    assert 0.0 <= row["auc"] <= 1.0


def test_cohens_kappa_matches_python(spark, sf_dir):
    from collections import Counter

    from cdw_spark.functions.text import LANG_MARKERS

    row = SPECS["agg_cohens_kappa"].fn(spark, sf_dir).collect()[0]
    docs = load_fixture(spark, sf_dir, "documents").select("lang", "text").collect()

    def guess(text):
        toks = text.lower().strip().split()
        scores = {
            lang: sum(1 for t in toks if t in set(m))
            for lang, m in sorted(LANG_MARKERS.items())
        }
        best = max(scores.values())
        if best == 0:
            return "und"
        return min(l for l, s in scores.items() if s == best)

    pairs = [(r["lang"], guess(r["text"])) for r in docs]
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    nc = Counter(a for a, _ in pairs)
    pc = Counter(b for _, b in pairs)
    pe_num = sum(nc[c] * pc.get(c, 0) for c in nc)
    kappa = (n * agree - pe_num) / (n * n - pe_num)
    assert row["n_docs"] == n
    assert abs(row["p_observed"] - agree / n) < 1e-5
    assert abs(row["p_expected"] - pe_num / n**2) < 1e-5
    assert abs(row["kappa"] - kappa) < 1e-5


def test_ttr_diversity_matches_python(spark, sf_dir):
    from collections import Counter

    rows = {
        r["doc_id"]: r
        for r in SPECS["quality_ttr_lexical_diversity"].fn(spark, sf_dir).collect()
    }
    docs = load_fixture(spark, sf_dir, "documents").select("doc_id", "text").collect()
    for r in docs[:50]:
        c = Counter(w for w in r["text"].lower().strip().split() if w)
        n = sum(c.values())
        got = rows[r["doc_id"]]
        assert got["n_tokens"] == n
        assert got["n_types"] == len(c)
        assert got["n_hapax"] == sum(1 for v in c.values() if v == 1)
        assert abs(got["ttr"] - len(c) / n) < 1e-5
        rep2 = sum(v * (v - 1) for v in c.values())
        if n > 1:
            assert abs(got["simpson_repeat"] - rep2 / (n * (n - 1))) < 1e-5
        else:
            assert got["simpson_repeat"] is None


def test_benjamini_hochberg_matches_python(spark, sf_dir):
    rows = SPECS["agg_benjamini_hochberg"].fn(spark, sf_dir).collect()
    orders = load_fixture(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus", "o_totalprice"
    ).collect()
    by_grp = {}
    for r in orders:
        if r["o_orderstatus"] in ("F", "O"):
            by_grp.setdefault(r["o_orderpriority"], {"F": [], "O": []})[
                r["o_orderstatus"]
            ].append(r["o_totalprice"])

    def mw_z(f, o):
        ranks = _avg_ranks(f + o)
        r1 = sum(ranks[v] for v in f)
        n1, n2 = len(f), len(o)
        u = r1 - n1 * (n1 + 1) / 2.0
        from collections import Counter

        tie3 = sum(c**3 - c for c in Counter(f + o).values())
        n = n1 + n2
        sigma = math.sqrt(n1 * n2 / 12.0 * ((n + 1) - tie3 / (n * (n - 1))))
        return (u - n1 * n2 / 2.0) / sigma

    def p_of(z):
        x = abs(z) / math.sqrt(2.0)
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = (
            0.254829592 * t - 0.284496736 * t**2 + 1.421413741 * t**3
            - 1.453152027 * t**4 + 1.061405429 * t**5
        )
        return round(poly * math.exp(-x * x), 9)

    ps = sorted(
        (p_of(mw_z(v["F"], v["O"])), g) for g, v in by_grp.items()
    )
    m = len(ps)
    kmax = max(
        (i + 1 for i, (p, _) in enumerate(ps) if p <= (i + 1) * 0.05 / m),
        default=0,
    )
    expected = {g: (i + 1, (i + 1) <= kmax) for i, (p, g) in enumerate(ps)}
    assert len(rows) == m
    for r in rows:
        i, rej = expected[r["priority"]]
        assert r["p_rank"] == i, r
        assert r["rejected"] == int(rej), r
        z = mw_z(by_grp[r["priority"]]["F"], by_grp[r["priority"]]["O"])
        assert abs(r["z_score"] - z) < 1e-4
        assert abs(r["p_value"] - p_of(z)) < 1e-6


def test_realized_volatility_matches_python(spark, sf_dir):
    rows = {
        r["user_id"]: r
        for r in SPECS["timeseries_realized_volatility"].fn(spark, sf_dir).collect()
    }
    ev = load_fixture(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 0)
    ).select("user_id", "ts", "event_id", "value").collect()
    seqs = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        seqs.setdefault(r["user_id"], []).append(float(r["value"]))
    for uid, vs in list(seqs.items())[:40]:
        rs = [
            round(math.log(vs[i]), 9) - round(math.log(vs[i - 1]), 9)
            for i in range(1, len(vs))
        ]
        if not rs:
            assert uid not in rows
            continue
        got = rows[uid]
        var = sum(r * r for r in rs)
        assert got["n_returns"] == len(rs)
        assert abs(got["realized_var"] - var) < 1e-5
        assert abs(got["realized_vol"] - math.sqrt(var)) < 1e-5


def test_hampel_matches_python(spark, sf_dir):
    got = {
        (r["user_id"], r["event_id"]): r
        for r in SPECS["timeseries_hampel_outliers"].fn(spark, sf_dir).collect()
    }
    ev = load_fixture(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", "event_id", "value").collect()
    seqs = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        seqs.setdefault(r["user_id"], []).append((r["event_id"], float(r["value"])))
    n_checked = 0
    for uid, s in seqs.items():
        for i in range(3, len(s) - 3):
            eid, v = s[i]
            win = sorted(x for _, x in s[i - 3 : i + 4])
            med = win[3]
            mad = sorted(abs(x - med) for x in win)[3]
            r = got[(uid, eid)]
            assert abs(r["med"] - med) < 1e-9
            assert abs(r["mad"] - mad) < 1e-9
            assert r["is_outlier"] == int(abs(v - med) > 3.0 * mad)
            n_checked += 1
    assert n_checked == len(got) > 0


def test_subsample_ci_matches_python(spark, sf_dir):
    import hashlib

    row = SPECS["sample_subsample_ci"].fn(spark, sf_dir).collect()[0]
    orders = load_fixture(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    buckets = {}
    for r in orders:
        b = int(hashlib.md5(str(r["o_orderkey"]).encode()).hexdigest()[:4], 16) % 20
        buckets.setdefault(b, []).append(round(float(r["o_totalprice"]) * 100))
    means = [
        (2 * sum(cs) * 10000 + len(cs)) // (2 * len(cs)) for cs in buckets.values()
    ]
    nb = len(means)
    mean = sum(means) / nb / 1e6
    var = (sum(m * m for m in means) - sum(means) ** 2 / nb) / (nb - 1)
    se = math.sqrt(var / nb) / 1e6
    assert row["n_buckets"] == nb
    assert abs(row["mean_of_means"] - mean) < 1e-4
    assert abs(row["std_error"] - se) < 1e-4
    assert abs(row["ci_lo"] - (mean - 1.96 * se)) < 1e-4
    assert abs(row["ci_hi"] - (mean + 1.96 * se)) < 1e-4


def test_matryoshka_recall_matches_python(spark, sf_dir):
    rows = {
        r["probe_id"]: r
        for r in SPECS["embedding_matryoshka_recall"].fn(spark, sf_dir).collect()
    }
    emb = {
        r["vec_id"]: [round(x * 16) for x in r["embedding"]]
        for r in load_fixture(spark, sf_dir, "embeddings").collect()
    }

    def topk(pid, dim):
        pv = emb[pid]
        scored = sorted(
            (sum((pv[i] - v[i]) ** 2 for i in range(dim)), cid)
            for cid, v in emb.items()
            if cid != pid
        )
        return {cid for _, cid in scored[:10]}

    assert set(rows) == {0, 1, 2, 3, 4}
    for pid in range(5):
        overlap = len(topk(pid, 64) & topk(pid, 16))
        assert rows[pid]["n_overlap"] == overlap
        assert abs(rows[pid]["recall_at_10"] - overlap / 10.0) < 1e-9


def test_clustering_coefficient_matches_python(spark, sf_dir):
    from cdw_spark.suite.similarity import _knn_undirected_edges

    emb = load_fixture(spark, sf_dir, "embeddings")
    edges = {
        (r["a"], r["b"]) for r in _knn_undirected_edges(emb).collect()
    }
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    rows = SPECS["graph_clustering_coefficient"].fn(spark, sf_dir).collect()
    assert len(rows) == emb.count()
    for r in rows:
        ns = nbrs.get(r["vec_id"], set())
        assert r["deg"] == len(ns)
        tri = sum(
            1
            for x in ns
            for y in ns
            if x < y and (min(x, y), max(x, y)) in edges
        )
        assert r["n_triangles"] == tri
        if len(ns) < 2:
            assert r["clustering_coeff"] is None
        else:
            expect = 2.0 * tri / (len(ns) * (len(ns) - 1))
            assert abs(r["clustering_coeff"] - expect) < 1e-5


def test_audio_constellation_finds_planted_twins_only(spark, sf_dir):
    """Precision AND recall must be exactly 1.0: min-normalization
    cancels the +3 gain offset exactly, so every planted twin shares
    all 6 landmark chains, and the ~2^48 fingerprint entropy makes a
    >=5-chain random collision effectively impossible."""
    rows = SPECS["multimodal_audio_constellation"].fn(spark, sf_dir).collect()
    n_docs = load_fixture(spark, sf_dir, "documents").count()
    planted = {(d - 1, d) for d in range(1, n_docs) if d % 50 == 1}
    detected = {(r["id_a"], r["id_b"]) for r in rows}
    assert detected == planted, detected ^ planted
    assert all(r["n_shared"] == 6 for r in rows)


def test_bollinger_matches_python(spark, sf_dir):
    got = {
        (r["user_id"], r["event_id"]): r
        for r in SPECS["window_bollinger_bands"].fn(spark, sf_dir).collect()
    }
    ev = load_fixture(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", "event_id", "value").collect()
    seqs = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        seqs.setdefault(r["user_id"], []).append(
            (r["event_id"], round(float(r["value"]), 2))
        )
    n_checked = 0
    for uid, s in seqs.items():
        for i in range(7, len(s)):
            eid, v = s[i]
            win = [x for _, x in s[i - 7 : i + 1]]
            mid = sum(win) / 8.0
            sig = math.sqrt(sum(x * x for x in win) / 8.0 - mid * mid)
            r = got[(uid, eid)]
            assert abs(r["mid"] - mid) < 1e-4
            assert abs(r["upper_band"] - (mid + 2 * sig)) < 1e-4
            expected_sig = 1 if v > mid + 2 * sig else (-1 if v < mid - 2 * sig else 0)
            assert r["band_signal"] == expected_sig
            n_checked += 1
    assert n_checked == len(got) > 0


def test_power_analysis_matches_python(spark, sf_dir):
    row = SPECS["sample_ab_power_analysis"].fn(spark, sf_dir).collect()[0]
    vals = [
        round(float(r["value"]), 2)
        for r in load_fixture(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("value")
        .collect()
    ]
    n = len(vals)
    mean = sum(vals) / n
    var = sum(v * v for v in vals) / n - mean * mean
    delta = 0.05 * mean
    z = 1.959964 + 0.841621
    assert row["n_observed"] == n
    assert abs(row["mean_value"] - mean) < 1e-4
    assert row["n_per_arm"] == math.ceil(2 * z * z * var / (delta * delta))


def test_psi_matches_python(spark, sf_dir):
    rows = {r["bin"]: r for r in SPECS["profile_psi_drift"].fn(spark, sf_dir).collect()}
    orders = load_fixture(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    ).collect()
    cents = [
        (r["o_orderstatus"], round(float(r["o_totalprice"]) * 100))
        for r in orders
        if r["o_orderstatus"] in ("F", "O")
    ]
    lo = min(c for _, c in cents)
    hi = max(c for _, c in cents)
    cnt = {("F", b): 0 for b in range(10)} | {("O", b): 0 for b in range(10)}
    for st, c in cents:
        cnt[(st, (c - lo) * 10 // (hi - lo + 1))] += 1
    nf = sum(v for (s, _), v in cnt.items() if s == "F")
    no = sum(v for (s, _), v in cnt.items() if s == "O")
    total = 0.0
    for b in range(10):
        p = (cnt[("F", b)] + 1) / (nf + 10)
        q = (cnt[("O", b)] + 1) / (no + 10)
        term = round((p - q) * math.log(p / q), 9)
        total += term
        assert rows[b]["n_f"] == cnt[("F", b)]
        assert rows[b]["n_o"] == cnt[("O", b)]
        assert abs(rows[b]["psi_term"] - term) < 1e-6
    assert abs(rows[0]["psi_total"] - total) < 1e-5
    assert 0.0 <= rows[0]["psi_total"] < 1.0


def test_centroid_drift_matches_python(spark, sf_dir):
    rows = {
        r["label"]: r
        for r in SPECS["embedding_centroid_drift"].fn(spark, sf_dir).collect()
    }
    emb = load_fixture(spark, sf_dir, "embeddings").collect()
    halves = {}
    for r in emb:
        halves.setdefault((r["label"], r["vec_id"] % 2), []).append(
            [round(x * 16) for x in r["embedding"]]
        )
    for lab in {r["label"] for r in emb}:
        a, b = halves[(lab, 0)], halves[(lab, 1)]
        na, nb = len(a), len(b)
        sa = [sum(v[i] for v in a) for i in range(64)]
        sb = [sum(v[i] for v in b) for i in range(64)]
        drift = sum(
            (sa[i] / na - sb[i] / nb) ** 2 for i in range(64)
        )
        r = rows[lab]
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert abs(r["l2sq_drift"] - drift) < 1e-5


def test_hodges_lehmann_matches_python(spark, sf_dir):
    import hashlib

    rows = {
        r["priority"]: r for r in SPECS["agg_hodges_lehmann"].fn(spark, sf_dir).collect()
    }
    orders = load_fixture(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 29 == 0
    ).select("o_orderkey", "o_orderpriority", "o_totalprice").collect()
    groups = {}
    for r in orders:
        groups.setdefault(r["o_orderpriority"], []).append(
            (r["o_orderkey"], round(float(r["o_totalprice"]) * 100))
        )
    for grp, members in groups.items():
        # the bounded-subsample discipline: md5-rank top-1024 per group
        members.sort(key=lambda t: (hashlib.md5(str(t[0]).encode()).hexdigest(), t[0]))
        cs = [c for _id, c in members[:1024]]
        sums = sorted(
            cs[i] + cs[j] for i in range(len(cs)) for j in range(i, len(cs))
        )
        m = len(sums)
        lo, hi = sums[(m + 1) // 2 - 1], sums[(m + 2) // 2 - 1]
        hl = (lo + hi) / 4.0 / 100.0
        r = rows[grp]
        assert r["n_pairs"] == m
        assert abs(r["hl_estimate"] - hl) < 1e-6


def test_scd2_pit_lookup_matches_python(spark, sf_dir):
    rows = {
        r["order_key"]: r["status_at_order"]
        for r in SPECS["scd2_point_in_time_lookup"].fn(spark, sf_dir).collect()
    }
    orders = load_fixture(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 50 == 0
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus").collect()
    by_cust = {}
    for r in orders:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    n = 0
    for cust, rs in by_cust.items():
        hist = sorted(rs, key=lambda r: (r["o_orderdate"], r["o_orderkey"]))
        for f in rs:
            # status at f.date = status of the last change with date <= f.date
            applicable = [h for h in hist if h["o_orderdate"] <= f["o_orderdate"]]
            assert rows[f["o_orderkey"]] == applicable[-1]["o_orderstatus"]
            n += 1
    assert n == len(rows) > 0


def test_image_resize_digest_matches_python(spark, sf_dir):
    import hashlib

    from cdw_spark.operators.multimodal import ppm_decode, ppm_resize, synth_ppm

    rows = {
        r["doc_id"]: r["resized_md5"]
        for r in SPECS["multimodal_image_resize_digest"].fn(spark, sf_dir).collect()
    }
    for did in list(rows)[:25]:
        _w, _h, raster = ppm_decode(ppm_resize(synth_ppm(int(did)), 10, 10))
        expect = hashlib.md5(",".join(str(b) for b in raster).encode()).hexdigest()
        assert rows[did] == expect


def test_stream_bloom_dedup_audit_invariants(spark, sf_dir):
    """Per batch: pass strictly contains exact-dup (no false negatives),
    batch 0's dups and passes are exactly its IN-batch key repeats (the
    prior-batch filter is empty, so zero false positives — ADVICE r7:
    derived from the quarter size, not hardcoded to zero, so the
    assertion holds at any sf), and exact dup totals equal
    n_docs - n_distinct_keys."""
    rows = sorted(
        SPECS["stream_bloom_dedup_ingest"].fn(spark, sf_dir).collect(),
        key=lambda r: r["batch_id"],
    )
    n_docs = load_fixture(spark, sf_dir, "documents").count()
    assert [r["batch_id"] for r in rows] == [0, 1, 2, 3]
    assert sum(r["n_rows"] for r in rows) == n_docs
    for r in rows:
        assert r["n_false_positive"] == r["n_pass_bloom"] - r["n_dup_exact"] >= 0
    # batch 0 = dense ids 0..q0-1 cycling key = id % 300
    q0 = rows[0]["n_rows"]
    assert q0 == -(-n_docs // 4)
    expected_b0 = max(0, q0 - 300)
    assert rows[0]["n_dup_exact"] == expected_b0
    assert rows[0]["n_pass_bloom"] == expected_b0
    assert rows[0]["n_false_positive"] == 0
    assert sum(r["n_dup_exact"] for r in rows) == n_docs - min(300, n_docs)
