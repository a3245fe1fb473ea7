"""Python-reference tests for the round-9 operator waves.

Each test recomputes the statistic independently (plain Python /
pandas over the parquet fixture, no Spark, no shared code with the
operator) and compares against the registered query's output — the
oracle proves Spark == DuckDB; these prove both == the textbook
definition.
"""

from __future__ import annotations

import math
import os
import re

import duckdb
import pytest

from cdw_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in ("documents", "events", "lineitem", "orders", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def run(spark, sf_dir, name):
    return SPECS[name].fn(spark, sf_dir).collect()


# ---------------------------------------------------------------- wave 1


def test_wilcoxon_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem"
    ).fetchall()
    diffs = {}
    for ok, ln, price in rows:
        cents = math.floor(price * 100 + 0.5)
        diffs[ok] = diffs.get(ok, 0) + (cents if ln % 2 == 1 else -cents)
    nz = [d for d in diffs.values() if d != 0]
    n = len(nz)
    # tie-averaged ranks of |d|
    sorted_ad = sorted(abs(d) for d in nz)
    first = {}
    for i, v in enumerate(sorted_ad):
        first.setdefault(v, i + 1)
    count = {}
    for v in sorted_ad:
        count[v] = count.get(v, 0) + 1
    rank = {v: first[v] + (count[v] - 1) / 2 for v in count}
    w_plus = sum(rank[abs(d)] for d in nz if d > 0)
    t_corr = sum(c**3 - c for c in count.values())
    var = n * (n + 1) * (2 * n + 1) / 24 - t_corr / 48
    z_ref = (w_plus - n * (n + 1) / 4) / math.sqrt(var)

    (out,) = run(spark, sf_dir, "agg_wilcoxon_signed_rank")
    assert out["n_pairs"] == n
    assert out["n_zero_dropped"] == sum(1 for d in diffs.values() if d == 0)
    assert abs(out["z_score"] - z_ref) < 1e-5
    w_minus = n * (n + 1) / 2 - w_plus
    rb_ref = (w_plus - w_minus) / (n * (n + 1) / 2)
    assert abs(out["rank_biserial"] - rb_ref) < 1e-5


def test_jensen_shannon_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id % 2, event_type, COUNT(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    cp, cq = {}, {}
    for par, t, c in rows:
        (cp if par == 0 else cq)[t] = c
    np_, nq = sum(cp.values()), sum(cq.values())
    jsd = 0.0
    for t in set(cp) | set(cq):
        p = cp.get(t, 0) / np_
        q = cq.get(t, 0) / nq
        m = (p + q) / 2
        if p > 0:
            jsd += 0.5 * p * math.log(p / m)
        if q > 0:
            jsd += 0.5 * q * math.log(q / m)
    jsd /= math.log(2)

    (out,) = run(spark, sf_dir, "agg_jensen_shannon")
    assert out["n_even_side"] == np_ and out["n_odd_side"] == nq
    assert abs(out["jsd"] - jsd) < 1e-6
    assert 0.0 <= out["jsd"] <= 1.0


def test_burstiness_reference(spark, sf_dir, con):
    out = {r["user_id"]: r for r in run(spark, sf_dir, "events_interarrival_burstiness")}
    rows = con.execute(
        "SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) FROM events"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    series = {}
    for u, s in rows:
        series.setdefault(u, []).append(s)
    checked = 0
    for u, ts in series.items():
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        if len(gaps) < 5:
            assert u not in out
            continue
        mu = sum(gaps) / len(gaps)
        sig = math.sqrt(sum(g * g for g in gaps) / len(gaps) - mu * mu)
        if sig + mu == 0:
            continue
        ref = (sig - mu) / (sig + mu)
        assert abs(out[u]["burstiness"] - ref) < 1e-5, u
        assert -1.0 <= out[u]["burstiness"] <= 1.0
        checked += 1
    assert checked >= 10


def test_permutation_entropy_reference(spark, sf_dir, con):
    out = {r["user_id"]: r for r in run(spark, sf_dir, "agg_permutation_entropy")}
    rows = con.execute(
        "SELECT user_id, CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)"
        " AS BIGINT) FROM events WHERE event_type = 'purchase'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    series = {}
    for u, q in rows:
        series.setdefault(u, []).append(q)
    checked = 0
    for u, qs in series.items():
        counts = {}
        for a, b, c in zip(qs, qs[1:], qs[2:]):
            code = 4 * (b >= a) + 2 * (c >= a) + (c >= b)
            counts[code] = counts.get(code, 0) + 1
        n = sum(counts.values())
        if n < 10:
            assert u not in out
            continue
        h = -sum(c / n * math.log(c / n) for c in counts.values())
        ref = h / math.log(6)
        assert abs(out[u]["perm_entropy"] - ref) < 1e-5, u
        checked += 1
    # the default test fixture (sf0.001) qualifies only a handful of
    # users; the sf0.01 mirror run grades 103 rows
    assert checked >= 2


def test_cronbach_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, event_type, COUNT(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    users = sorted({r[0] for r in rows})
    items = sorted({r[1] for r in rows})
    x = {(u, t): 0 for u in users for t in items}
    for u, t, c in rows:
        x[(u, t)] = c
    n, k = len(users), len(items)

    def var(vals):
        m = sum(vals) / n
        return sum((v - m) ** 2 for v in vals) / n

    item_vars = sum(var([x[(u, t)] for u in users]) for t in items)
    tot_var = var([sum(x[(u, t)] for t in items) for u in users])
    ref = k / (k - 1) * (1 - item_vars / tot_var)

    (out,) = run(spark, sf_dir, "agg_cronbach_alpha")
    assert out["n_users"] == n and out["k_items"] == k
    assert abs(out["cronbach_alpha"] - ref) < 1e-6


def test_covariance_digest_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT CAST(l_quantity AS BIGINT),"
        " CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),"
        " CAST(floor(l_discount * 10000 + 0.5) AS BIGINT),"
        " CAST(floor(l_tax * 10000 + 0.5) AS BIGINT) FROM lineitem"
    ).fetchall()
    import numpy as np

    m = np.array(rows, dtype=float)
    ref = np.corrcoef(m.T)
    names = ["quantity", "price", "discount", "tax"]
    out = {
        (r["var_x"], r["var_y"]): r["corr"]
        for r in run(spark, sf_dir, "agg_covariance_matrix_digest")
    }
    assert len(out) == 6
    for i in range(4):
        for j in range(i + 1, 4):
            assert abs(out[(names[i], names[j])] - ref[i, j]) < 1e-6


def test_mrr_reference(spark, sf_dir, con):
    docs = con.execute("SELECT doc_id, lang, lower(text) FROM documents").fetchall()
    out = {r["term"]: r for r in run(spark, sf_dir, "eval_retrieval_mrr")}
    for term in ["spark", "vector", "data", "stream", "query"]:
        cand = []
        for did, lang, text in docs:
            toks = re.findall(r"[a-z0-9]+", text)
            tf = sum(1 for t in toks if t == term)
            if tf > 0:
                cand.append((-tf, did, lang == "en"))
        cand.sort()
        first = next(
            (i + 1 for i, (_, _, rel) in enumerate(cand) if rel), None
        )
        r = out[term]
        assert r["n_candidates"] == len(cand)
        assert r["first_rel_rank"] == first
        if first:
            assert abs(r["reciprocal_rank"] - 1.0 / first) < 1e-5
            assert r["hit_at_5"] == (1 if first <= 5 else 0)


def test_average_precision_reference(spark, sf_dir, con):
    rows = con.execute("SELECT n_chars, lang = 'en' FROM documents").fetchall()
    cells = {}
    for v, y in rows:
        c, p = cells.get(v, (0, 0))
        cells[v] = (c + 1, p + int(y))
    cum_n = cum_p = 0
    ap_sum = 0.0
    for v in sorted(cells, reverse=True):
        c, p = cells[v]
        cum_n += c
        cum_p += p
        if p > 0:
            ap_sum += p * cum_p / cum_n
    n_pos = sum(p for _, p in cells.values())
    ref = ap_sum / n_pos

    (out,) = run(spark, sf_dir, "eval_average_precision")
    assert out["n_total"] == len(rows) and out["n_pos"] == n_pos
    assert abs(out["average_precision"] - ref) < 1e-5
    # AP is a valid probability-like score in (0, 1]
    assert 0.0 < out["average_precision"] <= 1.0


def test_rsi_reference(spark, sf_dir, con):
    out = {
        (r["user_id"], r["event_id"]): r["rsi"]
        for r in run(spark, sf_dir, "window_rsi")
    }
    rows = con.execute(
        "SELECT user_id, event_id, CAST(floor(CAST(value AS DOUBLE)"
        " * 1000000.0 + 0.5) AS BIGINT) FROM events"
        " WHERE event_type = 'purchase' ORDER BY user_id, ts, event_id"
    ).fetchall()
    series = {}
    for u, e, q in rows:
        series.setdefault(u, []).append((e, q))
    checked = 0
    for u, seq in series.items():
        diffs = [
            (e2, q2 - q1) for (_, q1), (e2, q2) in zip(seq, seq[1:])
        ]
        for i in range(13, len(diffs)):
            win = [d for _, d in diffs[i - 13 : i + 1]]
            sg = sum(max(d, 0) for d in win)
            sl = sum(max(-d, 0) for d in win)
            ref = 50.0 if sg + sl == 0 else 100.0 * sg / (sg + sl)
            got = out[(u, diffs[i][0])]
            assert abs(got - ref) < 1e-5
            assert 0.0 <= got <= 100.0
            checked += 1
    assert checked == len(out) and checked > 0


# ---------------------------------------------------------------- wave 2


def test_dedup_weights_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
        " FROM documents"
    ).fetchall()
    sizes = {}
    for (fp,) in rows:
        sizes[fp] = sizes.get(fp, 0) + 1
    ws = [1.0 / sizes[fp] for (fp,) in rows]
    ess_ref = sum(ws) ** 2 / sum(w * w for w in ws)

    (out,) = run(spark, sf_dir, "sample_dedup_aware_weights")
    assert out["n_docs"] == len(rows)
    assert out["n_clusters"] == len(sizes)
    assert abs(out["total_weight"] - sum(ws)) < 1e-3
    assert abs(out["effective_sample_size"] - ess_ref) < 0.01
    # weighted mass counts each cluster once
    assert abs(out["total_weight"] - len(sizes)) < 1e-3


def test_heaps_law_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT doc_id, lower(text) FROM documents ORDER BY doc_id"
    ).fetchall()
    seen = set()
    cum_tok = 0
    pts = []
    for _, text in rows:
        toks = re.findall(r"[a-z0-9]+", text)
        cum_tok += len(toks)
        seen.update(toks)
        if cum_tok > 0 and seen:
            pts.append((math.log(cum_tok), math.log(len(seen))))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    beta_ref = (n * sxy - sx * sy) / (n * sxx - sx * sx)

    (out,) = run(spark, sf_dir, "text_heaps_law")
    assert out["n_points"] == n
    assert abs(out["heaps_beta"] - beta_ref) < 1e-4
    # Heaps exponent is sublinear and positive for natural-ish corpora
    assert 0.0 < out["heaps_beta"] < 1.0


def test_power_law_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT COUNT(*) FROM events GROUP BY user_id"
    ).fetchall()
    xs = [r[0] for r in rows]
    alpha_ref = 1 + len(xs) / sum(math.log(2 * x) for x in xs)

    (out,) = run(spark, sf_dir, "events_power_law_alpha")
    assert out["n_users"] == len(xs)
    assert out["max_activity"] == max(xs)
    assert abs(out["alpha"] - alpha_ref) < 1e-5
    assert abs(out["alpha_se"] - (alpha_ref - 1) / math.sqrt(len(xs))) < 1e-5


# ---------------------------------------------------------------- wave 3


def test_intervals_union_reference(spark, sf_dir, con):
    out = {r["user_id"]: r for r in run(spark, sf_dir, "intervals_union_coverage")}
    rows = con.execute(
        "SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) FROM events"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    series = {}
    for u, s in rows:
        series.setdefault(u, []).append((s, s + 300))
    for u, iv in series.items():
        merged = []
        for s, e in sorted(iv):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        r = out[u]
        assert r["n_intervals"] == len(iv)
        assert r["n_islands"] == len(merged)
        assert r["covered_seconds"] == sum(e - s for s, e in merged)


def test_asof_nearest_reference(spark, sf_dir, con):
    out = {r["event_id"]: r for r in run(spark, sf_dir, "asof_join_nearest")}
    ev = con.execute(
        "SELECT event_id, user_id, event_type, epoch_us(ts) FROM events"
        " WHERE event_type IN ('click', 'purchase')"
    ).fetchall()
    purchases = {}
    clicks = []
    for eid, u, typ, us in ev:
        if typ == "purchase":
            purchases.setdefault(u, []).append((us, eid))
        else:
            clicks.append((eid, u, us))
    assert len(out) == len(clicks)
    import random

    random.seed(9)
    for eid, u, cus in random.sample(clicks, min(300, len(clicks))):
        cands = purchases.get(u, [])
        r = out[eid]
        if not cands:
            assert r["nearest_purchase_id"] is None
            continue
        # min |dt|, tie -> earlier purchase (the backward side)
        best = min(cands, key=lambda p: (abs(cus - p[0]), p[0] > cus))
        assert abs(cus - best[0]) == abs(r["nearest_dt_us"]), eid
        assert r["nearest_dt_us"] == cus - best[0]


def test_adamic_adar_reference(spark, sf_dir):
    # recompute AA from the SAME kNN edge set the op builds, using a
    # plain dict implementation — checks the 2-hop aggregation, the
    # anti-join, and the weighting independently
    from cdw_spark.catalog import load_fixture
    from cdw_spark.suite.similarity import _knn_undirected_edges

    edges = {
        (r["a"], r["b"])
        for r in _knn_undirected_edges(
            load_fixture(spark, sf_dir, "embeddings")
        ).collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores = {}
    for z, nbrs in adj.items():
        for a in nbrs:
            for b in nbrs:
                if a < b and (a, b) not in edges:
                    w = round(1.0 / math.log(len(adj[z])), 9)
                    k = (a, b)
                    cnt, s = scores.get(k, (0, 0.0))
                    scores[k] = (cnt + 1, s + w)
    top = sorted(
        scores.items(), key=lambda kv: (-round(kv[1][1], 9), kv[0])
    )[:20]

    rows = run(spark, sf_dir, "graph_adamic_adar")
    assert len(rows) == min(20, len(scores))
    for r, ((a, b), (cnt, s)) in zip(rows, top):
        assert (r["a"], r["b"]) == (a, b)
        assert r["common"] == cnt
        assert abs(r["adamic_adar"] - s) < 1e-5


# ---------------------------------------------------------------- wave 4


def test_brier_decomposition_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT LEAST(n_chars, 2000) / 2000.0, CAST(lang = 'en' AS INT)"
        " FROM documents"
    ).fetchall()
    n = len(rows)
    ybar = sum(y for _, y in rows) / n
    brier = sum((s - y) ** 2 for s, y in rows) / n
    unc = ybar * (1 - ybar)
    bins = {}
    for s, y in rows:
        b = min(int(s * 10), 9)
        c, p, ss = bins.get(b, (0, 0, 0.0))
        bins[b] = (c + 1, p + y, ss + s)
    rel = sum(c * (ss / c - p / c) ** 2 for c, p, ss in bins.values()) / n
    res = sum(c * (p / c - ybar) ** 2 for c, p, ss in bins.values()) / n

    (out,) = run(spark, sf_dir, "eval_brier_decomposition")
    assert out["n_docs"] == n
    assert abs(out["brier_score"] - brier) < 1e-5
    assert abs(out["uncertainty"] - unc) < 1e-6
    assert abs(out["reliability"] - rel) < 1e-4
    assert abs(out["resolution"] - res) < 1e-4
    # continuous scores leave a small within-bin remainder in the
    # Murphy identity (generalized decomposition) — present but bounded
    assert abs(
        out["brier_score"]
        - (out["uncertainty"] - out["resolution"] + out["reliability"])
    ) < 0.01


def test_id_audit_reference(spark, sf_dir, con):
    out = {r["table_name"]: r for r in run(spark, sf_dir, "dq_id_sequence_audit")}
    for tbl, col in (
        ("documents", "doc_id"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
    ):
        lo, hi, n, nd = con.execute(
            f"SELECT MIN({col}), MAX({col}), COUNT(*), COUNT(DISTINCT {col})"
            f" FROM {tbl}"
        ).fetchone()
        r = out[tbl]
        assert (r["min_id"], r["max_id"], r["n_rows"], r["n_distinct"]) == (
            lo,
            hi,
            n,
            nd,
        )
        assert r["n_gaps"] == hi - lo + 1 - nd
        assert r["n_dups"] == n - nd


# ---------------------------------------------------------------- wave 5


def test_stump_split_reference(spark, sf_dir, con):
    rows = con.execute("SELECT n_chars, lang = 'en' FROM documents").fetchall()
    n = len(rows)
    npos = sum(int(y) for _, y in rows)

    def weighted_gini(thr):
        ln = sum(1 for v, _ in rows if v <= thr)
        lp = sum(1 for v, y in rows if v <= thr and y)
        rn, rp = n - ln, npos - lp
        if ln == 0 or rn == 0:
            return None
        return (
            2 * lp * (ln - lp) / ln + 2 * rp * (rn - rp) / rn
        ) / n

    cands = sorted({v for v, _ in rows})
    scores = {t: weighted_gini(t) for t in cands if weighted_gini(t) is not None}
    best_score = min(scores.values())
    best_t = min(t for t, s in scores.items() if abs(s - best_score) < 1e-12)

    (out,) = run(spark, sf_dir, "agg_stump_split_gain")
    assert out["n_docs"] == n and out["n_pos"] == npos
    assert out["best_threshold"] == best_t
    parent = 2 * npos * (n - npos) / (n * n)
    assert abs(out["gini_parent"] - parent) < 1e-6
    assert abs(out["gini_split"] - best_score) < 1e-4
    assert abs(out["gini_gain"] - (parent - best_score)) < 1e-4
    # a split can never be worse than the parent
    assert out["gini_gain"] >= -1e-9


def test_order_total_consistency_reference(spark, sf_dir, con):
    li = con.execute(
        "SELECT l_orderkey, l_extendedprice, l_discount, l_tax FROM lineitem"
    ).fetchall()
    orders = dict(
        con.execute("SELECT o_orderkey, o_totalprice FROM orders").fetchall()
    )
    sums = {}
    for ok, price, disc, tax in li:
        cents = math.floor(price * (1 - disc) * (1 + tax) * 100 + 0.5)
        sums[ok] = sums.get(ok, 0) + cents
    n = n_exact = n_1pct = 0
    max_rel = 0.0
    for ok, s in sums.items():
        if ok not in orders:
            continue
        total = math.floor(orders[ok] * 100 + 0.5)
        if total <= 0:
            continue
        n += 1
        dev = abs(s - total)
        rel = (2 * dev * 1000000 + total) // (2 * total)
        n_exact += dev == 0
        n_1pct += rel <= 10000
        max_rel = max(max_rel, rel / 1e6)

    (out,) = run(spark, sf_dir, "dq_order_total_consistency")
    assert out["n_orders"] == n
    assert out["n_exact"] == n_exact
    assert out["n_within_1pct"] == n_1pct
    assert abs(out["max_rel_dev"] - max_rel) < 1e-9


# ---------------------------------------------------------------- wave 6


def test_waterfill_reference(spark, sf_dir, con):
    caps = dict(
        con.execute(
            "SELECT source, SUM(n_chars) FROM documents GROUP BY source"
        ).fetchall()
    )
    w = sum(caps.values())
    b = w * 3 // 5
    # reference: iterative waterfill with floor level
    remaining = dict(caps)
    budget = b
    alloc = {}
    while True:
        uncapped = {s: c for s, c in remaining.items() if s not in alloc}
        tau = budget // len(uncapped)
        newly = {s: c for s, c in uncapped.items() if c <= tau}
        if not newly:
            for s in uncapped:
                alloc[s] = tau
            break
        for s, c in newly.items():
            alloc[s] = c
            budget -= c
    rows = {r["source"]: r for r in run(spark, sf_dir, "mix_waterfill_budget")}
    assert set(rows) == set(caps)
    for s, r in rows.items():
        assert r["cap_units"] == caps[s]
        assert r["alloc_units"] == alloc[s], s
        assert r["alloc_units"] <= r["cap_units"]
        assert r["capped"] == (1 if alloc[s] == caps[s] else 0)
    # floor waterfilling never over-allocates the budget
    assert sum(r["alloc_units"] for r in rows.values()) <= b


def test_pps_systematic_reference(spark, sf_dir, con):
    docs = con.execute(
        "SELECT doc_id, n_chars FROM documents ORDER BY doc_id"
    ).fetchall()
    w = sum(c for _, c in docs)
    # ticks t_k = (2k+1) * W / (2 * 50), exact rationals — count per doc
    hits = {}
    cum = 0
    for did, c in docs:
        lo, hi = cum, cum + c
        n = sum(1 for k in range(50) if lo <= (2 * k + 1) * w / 100 < hi)
        if n:
            hits[did] = (n, lo, c)
        cum = hi
    rows = {r["doc_id"]: r for r in run(spark, sf_dir, "sample_pps_systematic")}
    assert set(rows) == set(hits)
    total_draws = 0
    for did, (n, lo, c) in hits.items():
        r = rows[did]
        assert r["n_hits"] == n and r["cum_before"] == lo and r["weight"] == c
        total_draws += r["n_hits"]
    # the systematic design draws EXACTLY 50 (zero-variance property)
    assert total_draws == 50


# ---------------------------------------------------------------- wave 7


def test_hurst_rs_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)"
        " AS BIGINT) FROM events WHERE event_type = 'purchase'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    series = {}
    for u, q in rows:
        series.setdefault(u, []).append(q)
    means = {}
    counts = {}
    for s in (4, 8, 16):
        terms = []
        for qs in series.values():
            for b0 in range(0, len(qs) - s + 1, s):
                blk = qs[b0 : b0 + s]
                mu = sum(blk) / s
                cum = 0.0
                devs = []
                for x in blk:
                    cum += x - mu
                    devs.append(cum)
                rng = max(devs) - min(devs)
                var = sum(x * x for x in blk) / s - mu * mu
                if rng > 0 and var > 0:
                    terms.append(math.log(rng / math.sqrt(var)))
        means[s] = sum(terms) / len(terms)
        counts[s] = len(terms)
    ref = (means[16] - means[4]) / (2 * math.log(2))

    (out,) = run(spark, sf_dir, "timeseries_hurst_rs")
    assert out["n_blocks_4"] == counts[4]
    assert out["n_blocks_8"] == counts[8]
    assert out["n_blocks_16"] == counts[16]
    assert abs(out["hurst"] - ref) < 1e-4


def test_transition_entropy_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, event_type FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    pairs = {}
    prev = {}
    for u, t in rows:
        if u in prev:
            pairs[(prev[u], t)] = pairs.get((prev[u], t), 0) + 1
        prev[u] = t
    marg = {}
    for (cur, _), c in pairs.items():
        marg[cur] = marg.get(cur, 0) + c
    n = sum(marg.values())
    out = {r["prev_event"]: r for r in run(spark, sf_dir, "events_transition_entropy")}
    assert set(out) == set(marg)
    for cur, nc in marg.items():
        h = -sum(
            c / nc * math.log(c / nc)
            for (p, _), c in pairs.items()
            if p == cur
        ) / math.log(2)
        r = out[cur]
        assert r["n_transitions"] == nc
        assert abs(r["entropy_bits"] - h) < 1e-5
        assert abs(r["weighted_contribution_bits"] - h * nc / n) < 1e-5


# ---------------------------------------------------------------- wave 8


def test_kruskal_wallis_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT o_orderpriority, o_totalprice FROM orders"
    ).fetchall()
    vals = sorted(v for _, v in rows)
    first = {}
    for i, v in enumerate(vals):
        first.setdefault(v, i + 1)
    count = {}
    for v in vals:
        count[v] = count.get(v, 0) + 1
    rank = {v: first[v] + (count[v] - 1) / 2 for v in count}
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(rank[v])
    n = len(vals)
    s = sum(sum(rs) ** 2 / len(rs) for rs in groups.values())
    h = 12.0 * s / (n * (n + 1)) - 3.0 * (n + 1)
    tie3 = sum(c**3 - c for c in count.values())
    hc = h / (1 - tie3 / (n**3 - n))

    (out,) = run(spark, sf_dir, "agg_kruskal_wallis")
    assert out["n"] == n
    assert out["n_groups"] == len(groups)
    assert abs(out["h_stat"] - h) < 1e-4
    assert abs(out["h_tie_corrected"] - hc) < 1e-4


def test_anova_oneway_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT l_returnflag, CAST(floor(l_extendedprice * 100 + 0.5)"
        " AS BIGINT) FROM lineitem"
    ).fetchall()
    groups = {}
    for g, c in rows:
        groups.setdefault(g, []).append(c)
    n = len(rows)
    k = len(groups)
    grand = sum(c for _, c in rows) / n
    ssb = sum(len(xs) * (sum(xs) / len(xs) - grand) ** 2 for xs in groups.values())
    sst = sum((c - grand) ** 2 for _, c in rows)
    ssw = sst - ssb
    f = (ssb / (k - 1)) / (ssw / (n - k))
    eta = ssb / sst

    (out,) = run(spark, sf_dir, "agg_anova_oneway")
    assert out["n"] == n
    assert out["n_groups"] == k
    assert out["df_between"] == k - 1
    assert out["df_within"] == n - k
    # the operator quantizes means to micro-cents (exact integers, no
    # catastrophic cancellation); vs the float reference that is a
    # relative perturbation ~1e-6 of the mean, so compare loosely
    assert abs(out["f_stat"] - f) / max(abs(f), 1.0) < 1e-3
    assert abs(out["eta_squared"] - eta) < 1e-4


def test_log_loss_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT LEAST(n_chars, 2000), CASE WHEN lang = 'en' THEN 1 ELSE 0 END"
        " FROM documents"
    ).fetchall()
    n = len(rows)
    pos = sum(y for _, y in rows)
    terms = []
    for nc, y in rows:
        pm = (2 * nc * 1000000 + 2000) // 4000
        pm = max(1, min(999999, pm))
        p = pm / 1e6
        terms.append(math.log(p) if y == 1 else math.log(1 - pm / 1e6))
    ll = -sum(terms) / n
    pbar = pos / n
    base = 0.0 if pos in (0, n) else -(
        pbar * math.log(pbar) + (1 - pbar) * math.log(1 - pbar)
    )
    (out,) = run(spark, sf_dir, "eval_log_loss")
    assert out["n_docs"] == n
    assert out["n_positive"] == pos
    assert abs(out["log_loss"] - ll) < 1e-5
    assert abs(out["baseline_log_loss"] - base) < 1e-5
    if base > 0:
        assert abs(out["skill_score"] - (1 - ll / base)) < 1e-4


# ---------------------------------------------------------------- wave 9


def test_brown_forsythe_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT l_returnflag, CAST(floor(l_extendedprice * 100 + 0.5)"
        " AS BIGINT) FROM lineitem"
    ).fetchall()
    groups = {}
    for g, c in rows:
        groups.setdefault(g, []).append(c)
    zs = {}
    for g, xs in groups.items():
        xs_sorted = sorted(xs)
        ng = len(xs_sorted)
        med = (xs_sorted[(ng - 1) // 2] + xs_sorted[ng // 2]) / 2
        zs[g] = [abs(x - med) for x in xs]
    n = sum(len(v) for v in zs.values())
    k = len(zs)
    grand = sum(sum(v) for v in zs.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in zs.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in zs.values()
    )
    w = (ssb / (k - 1)) / (ssw / (n - k))

    (out,) = run(spark, sf_dir, "agg_levene_brown_forsythe")
    assert out["n"] == n
    assert out["n_groups"] == k
    assert out["df_between"] == k - 1
    assert out["df_within"] == n - k
    # operator works in doubled cents with micro-quantized means —
    # relative perturbation ~1e-6, so compare loosely
    assert abs(out["w_stat"] - w) / max(abs(w), 1.0) < 1e-3


def test_degree_assortativity_reference(spark, sf_dir):
    # independent recomputation over the operator family's own edge
    # relation (hash-checked against DuckDB by the other graph oracles)
    edges = [
        (r["a"], r["b"])
        for r in SPECS["graph_link_prediction"]
        .fn.__globals__["_knn_undirected_edges"](
            SPECS["graph_link_prediction"]
            .fn.__globals__["load_fixture"](spark, sf_dir, "embeddings")
        )
        .collect()
    ]
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    pairs = [(deg[a], deg[b]) for a, b in edges] + [
        (deg[b], deg[a]) for a, b in edges
    ]
    m = len(pairs)
    sj = sum(j for j, _ in pairs)
    sjk = sum(j * kk for j, kk in pairs)
    sj2 = sum(j * j for j, _ in pairs)
    denom = m * sj2 - sj * sj
    ref = (m * sjk - sj * sj) / denom if denom else None

    (out,) = run(spark, sf_dir, "graph_degree_assortativity")
    assert out["n_nodes"] == len(deg)
    assert out["n_edges"] == len(edges)
    if ref is None:
        assert out["assortativity"] is None
    else:
        assert abs(out["assortativity"] - ref) < 1e-5


def test_flesch_reference(spark, sf_dir, con):
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    ref = {}
    for doc_id, text in rows:
        lt = text.lower()
        nw = max(1, len(re.findall(r"[a-z0-9]+", lt, re.ASCII)))
        ns = max(1, len(re.findall(r"[.!?]+", text, re.ASCII)))
        nsy = max(1, len(re.findall(r"[aeiouy]+", lt, re.ASCII)))
        ref[doc_id] = (nw, ns, nsy, 206.835 - 1.015 * (nw / ns) - 84.6 * (nsy / nw))

    out = run(spark, sf_dir, "text_flesch_reading_ease")
    assert len(out) == len(ref)
    for r in out:
        nw, ns, nsy, score = ref[r["doc_id"]]
        assert r["n_words"] == nw
        assert r["n_sentences"] == ns
        assert r["n_syllables"] == nsy
        assert abs(r["flesch_score"] - score) < 1e-3


# ---------------------------------------------------------------- wave 10


def test_freshness_lag_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT event_type, epoch_us(ts) FROM events"
    ).fetchall()
    gmax = max(us for _, us in rows)
    per = {}
    for t, us in rows:
        n, tmax, last = per.get(t, (0, 0, 0))
        per[t] = (
            n + 1,
            max(tmax, us),
            last + (1 if us >= gmax - 86400000000 else 0),
        )
    out = {r["event_type"]: r for r in run(spark, sf_dir, "dq_freshness_lag")}
    assert set(out) == set(per)
    for t, (n, tmax, last) in per.items():
        r = out[t]
        assert r["n_rows"] == n
        assert r["staleness_seconds"] == (gmax - tmax) // 1000000
        assert r["rows_last_day"] == last


def test_ulcer_index_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)"
        " AS BIGINT) FROM events WHERE event_type = 'purchase'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    series = {}
    for u, q in rows:
        if q > 0:
            series.setdefault(u, []).append(q)
    out = {r["user_id"]: r for r in run(spark, sf_dir, "window_ulcer_index")}
    assert set(out) == set(series)
    for u, qs in series.items():
        peak = 0
        sq = 0
        for q in qs:
            peak = max(peak, q)
            dd = (2 * (peak - q) * 1000000 + peak) // (2 * peak)
            sq += dd * dd
        ref = math.sqrt(sq / len(qs)) / 1e6
        r = out[u]
        assert r["n_points"] == len(qs)
        assert abs(r["ulcer_index"] - ref) < 1e-6


def test_horvitz_thompson_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT doc_id, CAST(n_chars AS BIGINT),"
        " len(regexp_extract_all(lower(text), '[a-z0-9]+'))"
        " FROM documents ORDER BY doc_id"
    ).fetchall()
    tw = sum(w for _, w, _ in rows)
    ty = sum(y for _, _, y in rows)

    def ticks_below(x):
        if 100 * x - tw <= 0:
            return 0
        return max(0, min(50, (100 * x - tw + 2 * tw - 1) // (2 * tw)))

    cum = 0
    est = 0
    n_sampled = 0
    draws = 0
    for _, w, y in rows:
        before = ticks_below(cum)
        cum += w
        hits = ticks_below(cum) - before
        if hits >= 1:
            n_sampled += 1
            draws += hits
            est += (2 * hits * y * 1000000 + w) // (2 * w)
    ht = (2 * tw * est + 50000000) // 100000000
    rel = (2 * abs(ht - ty) * 1000000 + ty) // (2 * ty)

    (out,) = run(spark, sf_dir, "sample_horvitz_thompson")
    assert out["n_sampled"] == n_sampled
    assert out["total_draws"] == draws == 50
    assert out["ht_estimate"] == ht
    assert out["true_total"] == ty
    assert out["rel_error_micro"] == rel
    # the design promise: length-proportional sampling estimates a
    # length-correlated total well — single-digit percent here
    assert rel < 100000


# ---------------------------------------------------------------- wave 11


def test_lorenz_curve_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT o_custkey, SUM(CAST(floor(o_totalprice * 100 + 0.5)"
        " AS BIGINT)) FROM orders GROUP BY 1"
    ).fetchall()
    vals = sorted(int(v) for _, v in rows)
    n = len(vals)
    tv = sum(vals)
    # cumulative by distinct value, decile = where the cell ends
    cum_by_decile = {}
    cumn = 0
    cumv = 0
    i = 0
    while i < n:
        j = i
        while j < n and vals[j] == vals[i]:
            j += 1
        cumn += j - i
        cumv += vals[i] * (j - i)
        dec = (10 * cumn + n - 1) // n
        cum_by_decile[dec] = (cumn, cumv)
        i = j

    out = {r["decile"]: r for r in run(spark, sf_dir, "agg_lorenz_curve")}
    assert set(out) == set(cum_by_decile)
    for dec, (cn, cv) in cum_by_decile.items():
        r = out[dec]
        assert r["cum_customers"] == cn
        assert r["cum_pop_micro"] == (2 * cn * 1000000 + n) // (2 * n)
        assert r["cum_value_micro"] == (2 * cv * 1000000 + tv) // (2 * tv)
    # curve sanity: last decile closes at exactly 100%
    assert out[10]["cum_pop_micro"] == 1000000
    assert out[10]["cum_value_micro"] == 1000000


def test_acf_profile_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)"
        " AS BIGINT) FROM events WHERE event_type = 'purchase'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    series = {}
    for u, q in rows:
        series.setdefault(u, []).append(q)
    allq = [q for _, q in rows]
    m = (2 * sum(allq) + len(allq)) // (2 * len(allq))
    den = sum((q - m) ** 2 for q in allq)
    out = {r["lag"]: r for r in run(spark, sf_dir, "timeseries_acf_profile")}
    assert set(out) == set(range(1, 8))
    for k in range(1, 8):
        num = 0
        npairs = 0
        for qs in series.values():
            for t in range(len(qs) - k):
                num += (qs[t] - m) * (qs[t + k] - m)
                npairs += 1
        r = out[k]
        assert r["n_pairs"] == npairs
        assert abs(r["acf"] - num / den) < 1e-5


def test_sortino_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)"
        " AS BIGINT) FROM events WHERE event_type = 'purchase'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    series = {}
    for u, q in rows:
        series.setdefault(u, []).append(q)
    out = {r["user_id"]: r for r in run(spark, sf_dir, "window_sortino_ratio")}
    expected = {u for u, qs in series.items() if len(qs) >= 2}
    assert set(out) == expected
    for u in expected:
        qs = series[u]
        rets = [b - a for a, b in zip(qs, qs[1:])]
        sr = sum(rets)
        dsq = sum(r * r for r in rets if r < 0)
        r = out[u]
        assert r["n_returns"] == len(rets)
        assert r["sum_return_micro"] == sr
        if dsq == 0:
            assert r["sortino"] is None
        else:
            ref = (sr / len(rets)) / math.sqrt(dsq / len(rets))
            assert abs(r["sortino"] - ref) < 1e-5


# ---------------------------------------------------------------- wave 12


def test_bowley_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT l_returnflag, CAST(floor(l_extendedprice * 100 + 0.5)"
        " AS BIGINT) FROM lineitem"
    ).fetchall()
    groups = {}
    for g, c in rows:
        groups.setdefault(g, []).append(c)
    out = {r["flag"]: r for r in run(spark, sf_dir, "agg_bowley_skewness")}
    assert set(out) == set(groups)
    for g, xs in groups.items():
        xs = sorted(xs)
        n = len(xs)
        q1 = xs[(n + 3) // 4 - 1]
        q2 = xs[(n + 1) // 2 - 1]
        q3 = xs[(3 * n + 3) // 4 - 1]
        r = out[g]
        assert r["n"] == n
        assert r["q1_cents"] == q1
        assert r["q2_cents"] == q2
        assert r["q3_cents"] == q3
        if q3 != q1:
            ref = (q3 + q1 - 2 * q2) / (q3 - q1)
            assert abs(r["bowley_skewness"] - ref) < 1e-6
        else:
            assert r["bowley_skewness"] is None


def test_stream_freshness_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT event_type, epoch_us(ts) FROM events"
    ).fetchall()
    gmax = max(us for _, us in rows)
    gb = gmax // 3600000000
    per = {}
    for t, us in rows:
        n, tmax, last = per.get(t, (0, 0, 0))
        per[t] = (
            n + 1,
            max(tmax, us),
            last + (1 if us // 3600000000 > gb - 24 else 0),
        )
    out = {
        r["event_type"]: r for r in run(spark, sf_dir, "stream_freshness_monitor")
    }
    assert set(out) == set(per)
    for t, (n, tmax, last) in per.items():
        r = out[t]
        assert r["n_rows"] == n
        assert r["staleness_seconds"] == (gmax - tmax) // 1000000
        assert r["rows_last_24h"] == last


# ---------------------------------------------------------------- wave 13


def test_audience_overlap_reference(spark, sf_dir, con):
    rows = con.execute("SELECT DISTINCT event_type, user_id FROM events").fetchall()
    sets = {}
    for t, u in rows:
        sets.setdefault(t, set()).add(u)
    out = {
        (r["type_a"], r["type_b"]): r
        for r in run(spark, sf_dir, "events_audience_overlap")
    }
    types = sorted(sets)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            inter = len(sets[ta] & sets[tb])
            if inter == 0:
                assert (ta, tb) not in out
                continue
            un = len(sets[ta] | sets[tb])
            r = out[(ta, tb)]
            assert r["n_a"] == len(sets[ta])
            assert r["n_b"] == len(sets[tb])
            assert r["n_both"] == inter
            assert r["jaccard_micro"] == (2 * inter * 1000000 + un) // (2 * un)


def test_atr_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, epoch_us(ts) // 21600000000,"
        " CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT),"
        " epoch_us(ts)"
        " FROM events WHERE event_type = 'purchase' ORDER BY user_id, ts"
    ).fetchall()
    bars = {}
    for u, hb, q, us in rows:
        key = (u, hb)
        if key not in bars:
            bars[key] = [q, q, q, us]  # h, l, c, last_us
        else:
            b = bars[key]
            b[0] = max(b[0], q)
            b[1] = min(b[1], q)
            if us > b[3]:
                b[2], b[3] = q, us
    per_user = {}
    for (u, hb), (h, l, c, _) in sorted(bars.items()):
        per_user.setdefault(u, []).append((hb, h, l, c))
    out = {r["user_id"]: r for r in run(spark, sf_dir, "window_atr")}
    assert set(out) == set(per_user)
    for u, bs in per_user.items():
        trs = []
        pc = None
        for _, h, l, c in bs:
            trs.append(h - l if pc is None else max(h - l, abs(h - pc), abs(l - pc)))
            pc = c
        n = len(trs)
        r = out[u]
        assert r["n_bars"] == n
        assert r["atr_micro"] == (2 * sum(trs) + n) // (2 * n)
        assert r["max_tr_micro"] == max(trs)


def test_harmonic_centrality_reference(spark, sf_dir):
    edges = [
        (r["a"], r["b"])
        for r in SPECS["graph_link_prediction"]
        .fn.__globals__["_knn_undirected_edges"](
            SPECS["graph_link_prediction"]
            .fn.__globals__["load_fixture"](spark, sf_dir, "embeddings")
        )
        .collect()
    ]
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores = {}
    for src in adj:
        d1 = adj[src]
        d2 = set()
        for m in d1:
            d2 |= adj[m]
        d2 -= d1 | {src}
        d3 = set()
        for m in d2:
            d3 |= adj[m]
        d3 -= d1 | d2 | {src}
        scores[src] = (len(d1), len(d2), len(d3),
                       6 * len(d1) + 3 * len(d2) + 2 * len(d3))
    top = sorted(scores.items(), key=lambda kv: (-kv[1][3], kv[0]))[:20]
    out = run(spark, sf_dir, "graph_harmonic_centrality")
    assert len(out) == 20
    for r, (node, (n1, n2, n3, h6)) in zip(out, top):
        assert r["node"] == node
        assert (r["n1"], r["n2"], r["n3"], r["h_sixths"]) == (n1, n2, n3, h6)
        assert abs(r["harmonic"] - h6 / 6) < 1e-6


# ---------------------------------------------------------------- wave 14


def test_rule_ablation_reference(spark, sf_dir, con):
    stop = {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it"}
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    flags = []
    for _, text in rows:
        ws = re.split(r"\s+", text.strip().lower())
        n = len(ws)
        nchars = sum(len(w) for w in ws)
        mwl = nchars / n
        alpha = sum(1 for w in ws if re.search(r"[a-z]", w, re.ASCII))
        nstop = sum(1 for w in ws if w in stop)
        nhash = text.count("#")
        nell = text.count("...")
        sym = (nhash + nell) / n
        flags.append(
            (
                1 if 20 <= n <= 1000 else 0,
                1 if 3 <= mwl <= 10 else 0,
                1 if sym < 0.1 else 0,
                1 if alpha / n >= 0.8 else 0,
                1 if nstop >= 2 else 0,
            )
        )
    names = ["ok_len", "ok_mwl", "ok_sym", "ok_alpha", "ok_stop"]
    out = {r["rule"]: r for r in run(spark, sf_dir, "curation_rule_ablation")}
    assert set(out) == set(names)
    for i, r in enumerate(names):
        alone = sum(1 for f in flags if f[i] == 0)
        sole = sum(
            1
            for f in flags
            if f[i] == 0 and sum(f) == len(names) - 1
        )
        chain = sum(1 for f in flags if f[i] == 0 and all(f[j] for j in range(i)))
        row = out[r]
        assert row["rule_order"] == i + 1
        assert row["n_docs"] == len(flags)
        assert row["alone_kills"] == alone
        assert row["sole_kills"] == sole
        assert row["chain_kills"] == chain
    # attribution identity: chain kills sum to total killed docs
    killed = sum(1 for f in flags if 0 in f)
    assert sum(r["chain_kills"] for r in out.values()) == killed


# ---------------------------------------------------------------- wave 15


def test_hubness_reference(spark, sf_dir):
    knn = [
        (r["a"], r["b"])
        for r in SPECS["embedding_hubness_audit"]
        .fn.__globals__["_knn_directed_top3"](
            SPECS["embedding_hubness_audit"]
            .fn.__globals__["load_fixture"](spark, sf_dir, "embeddings")
        )
        .collect()
    ]
    nodes = {
        r["vec_id"]
        for r in SPECS["embedding_hubness_audit"]
        .fn.__globals__["load_fixture"](spark, sf_dir, "embeddings")
        .select("vec_id")
        .collect()
    }
    ind = {n: 0 for n in nodes}
    for _, b in knn:
        ind[b] += 1
    hist = {}
    for d in ind.values():
        hist[d] = hist.get(d, 0) + 1
    out = {r["in_degree"]: r["n_nodes"] for r in run(spark, sf_dir, "embedding_hubness_audit")}
    assert out == hist
    # every node appears somewhere and the graph has |V|*3 directed edges
    assert sum(out.values()) == len(nodes)
    assert sum(d * c for d, c in out.items()) == len(knn)


def test_variance_ratio_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)"
        " AS BIGINT) FROM events WHERE event_type = 'purchase'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    series = {}
    for u, q in rows:
        series.setdefault(u, []).append(q)
    r1, r2 = [], []
    for qs in series.values():
        r1 += [b - a for a, b in zip(qs, qs[1:])]
        r2 += [b - a for a, b in zip(qs, qs[2:])]

    def var(xs):
        n = len(xs)
        return (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * n)

    ref = (var(r2) / 2) / var(r1)
    (out,) = run(spark, sf_dir, "timeseries_variance_ratio")
    assert out["n_returns_1"] == len(r1)
    assert out["n_returns_2"] == len(r2)
    assert abs(out["variance_ratio"] - ref) < 1e-5


def test_entropy_rate_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT source, lower(text) FROM documents WHERE length(text) >= 2"
    ).fetchall()
    pairs = {}
    for src, t in rows:
        d = pairs.setdefault(src, {})
        for i in range(len(t) - 1):
            p = t[i : i + 2]
            d[p] = d.get(p, 0) + 1
    out = {r["source"]: r for r in run(spark, sf_dir, "text_entropy_rate")}
    assert set(out) == set(pairs)
    for src, d in pairs.items():
        n = sum(d.values())
        hp = -sum(c / n * math.log(c / n) for c in d.values()) / math.log(2)
        marg = {}
        for p, c in d.items():
            marg[p[0]] = marg.get(p[0], 0) + c
        h1 = -sum(c / n * math.log(c / n) for c in marg.values()) / math.log(2)
        r = out[src]
        assert r["n_pairs"] == n
        assert abs(r["pair_bits"] - hp) < 1e-4
        assert abs(r["unigram_bits"] - h1) < 1e-4
        assert abs(r["cond_bits"] - (hp - h1)) < 1e-4
        # conditional entropy is nonnegative and below the pair entropy
        assert -1e-9 <= r["cond_bits"] <= r["pair_bits"]


# ---------------------------------------------------------------- wave 16


def test_runs_test_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)"
        " AS BIGINT) FROM events WHERE event_type = 'purchase'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    series = {}
    for u, q in rows:
        series.setdefault(u, []).append(q)
    n_users = n_runs = n_pos = n_neg = 0
    e_runs = v_runs = 0.0
    for qs in series.values():
        signs = [1 if b - a > 0 else 0 for a, b in zip(qs, qs[1:]) if b - a != 0]
        if not signs:
            continue
        n_users += 1
        n = len(signs)
        n1 = sum(signs)
        n2 = n - n1
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        n_runs += runs
        n_pos += n1
        n_neg += n2
        e_runs += 1.0 + 2.0 * n1 * n2 / n
        if n > 1:
            v_runs += 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
    (out,) = run(spark, sf_dir, "agg_runs_test")
    assert out["n_users"] == n_users
    assert out["n_runs"] == n_runs
    assert out["n_pos"] == n_pos
    assert out["n_neg"] == n_neg
    ref = (n_runs - e_runs) / math.sqrt(v_runs)
    assert abs(out["z_score"] - ref) < 1e-4


def test_hapax_reference(spark, sf_dir, con):
    rows = con.execute("SELECT source, lower(text) FROM documents").fetchall()
    vocab = {}
    for src, t in rows:
        d = vocab.setdefault(src, {})
        for w in re.findall(r"[a-z0-9]+", t, re.ASCII):
            d[w] = d.get(w, 0) + 1
    out = {r["source"]: r for r in run(spark, sf_dir, "text_hapax_ratio")}
    assert set(out) == set(vocab)
    for src, d in vocab.items():
        v = len(d)
        h = sum(1 for c in d.values() if c == 1)
        dis = sum(1 for c in d.values() if c == 2)
        r = out[src]
        assert r["vocab_size"] == v
        assert r["n_hapax"] == h
        assert r["n_dis"] == dis
        assert r["hapax_ratio_micro"] == (2 * h * 1000000 + v) // (2 * v)


def test_rich_club_reference(spark, sf_dir):
    edges = [
        (r["a"], r["b"])
        for r in SPECS["graph_rich_club"]
        .fn.__globals__["_knn_undirected_edges"](
            SPECS["graph_rich_club"]
            .fn.__globals__["load_fixture"](spark, sf_dir, "embeddings")
        )
        .collect()
    ]
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out = {r["k"]: r for r in run(spark, sf_dir, "graph_rich_club")}
    assert set(out) == {4, 6}
    for k in (4, 6):
        club = {n for n, d in deg.items() if d > k}
        ek = sum(1 for a, b in edges if a in club and b in club)
        nk = len(club)
        r = out[k]
        assert r["n_club_nodes"] == nk
        assert r["n_edges_within"] == ek
        if nk >= 2:
            assert r["phi_micro"] == (
                (4 * ek * 1000000 + nk * (nk - 1)) // (2 * nk * (nk - 1))
            )
        else:
            assert r["phi_micro"] is None


# ---------------------------------------------------------------- wave 17


def test_markov_next_event_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, event_type FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    pairs = {}
    prev = {}
    for u, t in rows:
        if u in prev:
            pairs[(prev[u], t)] = pairs.get((prev[u], t), 0) + 1
        prev[u] = t
    curs = {c for c, _ in pairs}
    out = {r["prev_event"]: r for r in run(spark, sf_dir, "recs_markov_next_event")}
    assert set(out) == curs
    for cur in curs:
        succ = {n: c for (c0, n), c in pairs.items() if c0 == cur}
        pred = min(succ, key=lambda n: (-succ[n], n))
        n = sum(succ.values())
        hits = succ[pred]
        r = out[cur]
        assert r["predicted_next"] == pred
        assert r["n_transitions"] == n
        assert r["n_hits"] == hits
        assert r["hit_rate_micro"] == (2 * hits * 1000000 + n) // (2 * n)


def test_error_mtbf_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, epoch_us(ts) FROM events WHERE event_type = 'error'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    series = {}
    for u, us in rows:
        series.setdefault(u, []).append(us)
    expected = {u for u, s in series.items() if len(s) >= 2}
    out = {r["user_id"]: r for r in run(spark, sf_dir, "events_error_mtbf")}
    assert set(out) == expected
    for u in expected:
        s = series[u]
        gaps = [b - a for a, b in zip(s, s[1:])]
        n = len(gaps)
        r = out[u]
        assert r["n_errors"] == n + 1
        assert r["mtbf_seconds"] == (2 * sum(gaps) + n * 1000000) // (
            2 * n * 1000000
        )
        assert r["min_gap_seconds"] == min(gaps) // 1000000
        assert r["max_gap_seconds"] == max(gaps) // 1000000


def test_degenerate_guards_null_parity(spark, tmp_path):
    """Zero-variance inputs (every price identical) must NULL the
    guarded statistics in BOTH engines — the NULLIF discipline; an
    unguarded division would be inf in DuckDB and NULL in Spark."""
    import duckdb as ddb

    from cdw_spark.compare import compare_with_connection

    src = "/root/testdata/sf0.001"
    con = ddb.connect()
    con.execute(
        f"COPY (SELECT * REPLACE (CAST(100.0 AS DOUBLE) AS o_totalprice)"
        f" FROM read_parquet('{src}/orders.parquet'))"
        f" TO '{tmp_path}/orders.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * REPLACE (CAST(100.0 AS DOUBLE) AS l_extendedprice)"
        f" FROM read_parquet('{src}/lineitem.parquet'))"
        f" TO '{tmp_path}/lineitem.parquet' (FORMAT PARQUET)"
    )
    # constant-value events: zero-variance purchase series -> den=0 in
    # the autocorrelation profile (ADVICE r9 medium)
    con.execute(
        f"COPY (SELECT * REPLACE (CAST(5.0 AS DOUBLE) AS value)"
        f" FROM read_parquet('{src}/events.parquet'))"
        f" TO '{tmp_path}/events.parquet' (FORMAT PARQUET)"
    )
    for t in ("region", "nation", "customer", "supplier", "part",
              "documents", "embeddings"):
        import shutil

        shutil.copy(f"{src}/{t}.parquet", f"{tmp_path}/{t}.parquet")

    oc = ddb.connect()
    for t in ("orders", "lineitem", "events"):
        oc.execute(
            f"CREATE VIEW {t} AS SELECT *"
            f" FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    for name, null_cols in (
        ("agg_kruskal_wallis", ["h_tie_corrected"]),
        ("agg_anova_oneway", ["f_stat", "eta_squared"]),
        ("agg_levene_brown_forsythe", ["w_stat"]),
        ("timeseries_acf_profile", ["acf"]),
    ):
        spec = SPECS[name]
        res = compare_with_connection(
            name, spec.fn(spark, str(tmp_path)), spec.oracle, oc
        )
        assert res.ok, f"{name} degenerate parity: {res.issues}"
        rows = spec.fn(spark, str(tmp_path)).collect()
        assert rows, f"{name} returned no rows on the degenerate fixture"
        for row in rows:
            for c in null_cols:
                assert row[c] is None, (
                    f"{name}.{c} should be NULL on zero variance"
                )
