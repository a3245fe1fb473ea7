"""Python-reference tests for the round-10 operator waves.

Each test recomputes the statistic independently (plain Python over the
parquet fixture, no Spark, no shared code with the operator) and
compares against the registered query's output — the oracle proves
Spark == DuckDB; these prove both == the textbook definition.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from cdw_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in ("documents", "events", "lineitem", "orders", "embeddings",
              "customer", "nation", "region", "supplier"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def run(spark, sf_dir, name):
    return SPECS[name].fn(spark, sf_dir).collect()


def _half_away(num: int, den: int) -> int:
    """(2*num + den) // (2*den) for num >= 0 — the repo's half-away
    integer rounding; sign-split for signed numerators."""
    assert num >= 0 and den > 0
    return (2 * num + den) // (2 * den)


# ---------------------------------------------------------------- wave 1


def test_lift_gains_reference(spark, sf_dir, con):
    rows = con.execute("SELECT n_chars, lang = 'en' FROM documents").fetchall()
    cells = {}
    for v, pos in rows:
        c, p = cells.get(v, (0, 0))
        cells[v] = (c + 1, p + (1 if pos else 0))
    n = sum(c for c, _ in cells.values())
    np_ = sum(p for _, p in cells.values())
    cumn = cump = 0
    by_decile = {}
    for v in sorted(cells, reverse=True):
        c, p = cells[v]
        cumn += c
        cump += p
        d = 1 + ((cumn - 1) * 10) // n
        by_decile[d] = (cumn, cump)  # last cell of the decile wins
    out = {r["decile"]: r for r in run(spark, sf_dir, "eval_lift_gains_table")}
    assert set(out) == set(by_decile)
    for d, (cd, cp) in by_decile.items():
        r = out[d]
        assert r["cum_docs"] == cd
        assert r["cum_pos"] == cp
        assert r["gain_micro"] == _half_away(cp * 1000000, np_)
        assert r["precision_micro"] == _half_away(cp * 1000000, cd)
        assert r["lift_micro"] == _half_away(cp * n * 1000000, cd * np_)


def _pooled_acf_ints(con):
    """Exact pooled numerators / denominator of the purchase-value ACF
    at lags 1..7 (the acf_profile definition: within-user pairs, global
    half-away micro mean)."""
    rows = con.execute(
        "SELECT user_id, epoch_us(ts), event_id, value FROM events"
        " WHERE event_type = 'purchase' ORDER BY user_id, 2, 3"
    ).fetchall()
    qs = {}
    for u, us, eid, v in rows:
        qs.setdefault(u, []).append(math.floor(v * 1000000.0 + 0.5))
    allq = [q for s in qs.values() for q in s]
    n = len(allq)
    m = (2 * sum(allq) + n) // (2 * n)
    nums = {}
    for k in range(1, 8):
        nums[k] = sum(
            (s[i] - m) * (s[i + k] - m)
            for s in qs.values()
            for i in range(len(s) - k)
        )
    den = sum((q - m) ** 2 for q in allq)
    return n, nums, den


def test_ljung_box_reference(spark, sf_dir, con):
    n, nums, den = _pooled_acf_ints(con)
    terms = []
    for k in range(1, 8):
        num = nums[k]
        rn = (
            _half_away(num * 1000000000, den)
            if num >= 0
            else -_half_away(-num * 1000000000, den)
        )
        terms.append(float(rn * rn) / float(n - k))
    acc = 0.0
    for t in terms:
        acc = acc + t
    q = float(n) * float(n + 2) * acc / 1e18
    (row,) = run(spark, sf_dir, "timeseries_ljung_box")
    assert row["n_obs"] == n
    assert row["dof"] == 7
    assert abs(row["q_stat"] - q) < 1e-6
    assert row["reject_05"] == (round(q, 6) > 14.067140)


def test_parkinson_reference(spark, sf_dir, con):
    from decimal import ROUND_HALF_EVEN, Decimal

    rows = con.execute(
        "SELECT user_id, epoch_us(ts) // 21600000000, value FROM events"
        " WHERE event_type = 'purchase'"
    ).fetchall()
    bars = {}
    for u, hb, v in rows:
        q = math.floor(v * 1000000.0 + 0.5)
        h, lo = bars.get((u, hb), (q, q))
        bars[(u, hb)] = (max(h, q), min(lo, q))
    sums = {}
    for (u, _), (h, lo) in bars.items():
        if lo <= 0:
            continue
        t = math.log(h / lo)
        # round-half-even at 9dp mirrors IEEE ROUND on an exact double
        t2 = Decimal(repr(round(t * t, 9)))
        nb, s = sums.get(u, (0, Decimal(0)))
        sums[u] = (nb + 1, s + t2)
    out = {r["user_id"]: r for r in run(spark, sf_dir, "window_parkinson_volatility")}
    assert set(out) == set(sums)
    for u, (nb, s) in sums.items():
        r = out[u]
        assert r["n_bars"] == nb
        var = float(s) / (4.0 * 0.6931471805599453 * nb)
        assert abs(r["parkinson_var"] - var) < 1e-6
        assert abs(r["parkinson_sigma"] - math.sqrt(var)) < 1e-6


# ---------------------------------------------------------------- wave 2


def test_weighted_reservoir_reference(spark, sf_dir, con):
    rows = con.execute("SELECT doc_id, n_chars FROM documents").fetchall()
    scored = []
    for did, nc in rows:
        w = nc + 1
        x = (did * 2862933555777941757 + 3037000493) % (2**64)
        u31 = x % (2**31)
        u = (u31 + 0.5) / 2147483648.0
        scored.append((math.log(u) / w, -did, did, w))
    scored.sort(reverse=True)
    top = scored[:50]
    out = run(spark, sf_dir, "sample_weighted_reservoir")
    assert len(out) == 50
    got = {r["doc_id"]: r for r in out}
    assert set(got) == {did for _, _, did, _ in top}
    for pr, _, did, w in top:
        assert got[did]["weight"] == w
        assert abs(got[did]["priority9"] - pr) < 1e-9


def test_cluster_size_profile_reference(spark, sf_dir, con):
    comp = run(spark, sf_dir, "dedup_components")  # itself oracle-checked
    n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    sizes = {}
    for r in comp:
        sizes[r["component_id"]] = sizes.get(r["component_id"], 0) + 1
    hist = {}
    for s in sizes.values():
        hist[s] = hist.get(s, 0) + 1
    hist[1] = hist.get(1, 0) + (n_docs - len(comp))
    hist = {s: c for s, c in hist.items() if c > 0}
    out = {r["cluster_size"]: r for r in run(spark, sf_dir, "dedup_cluster_size_profile")}
    assert set(out) == set(hist)
    for s, c in hist.items():
        r = out[s]
        assert r["n_clusters"] == c
        assert r["n_docs"] == s * c
        assert r["docs_share_micro"] == _half_away(s * c * 1000000, n_docs)


def test_norm_outlier_audit_reference(spark, sf_dir, con):
    rows = con.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    norms = []
    for _, emb in rows:
        n2 = sum(math.floor(float(x) * 1000000.0 + 0.5) ** 2 for x in emb)
        norms.append(n2)
    n = len(norms)
    med = sorted(norms)[(n + 1) // 2 - 1]
    n_low = sum(1 for v in norms if 4 * v < med)
    n_high = sum(1 for v in norms if v > 4 * med)
    (r,) = run(spark, sf_dir, "embedding_norm_outlier_audit")
    assert r["n_vecs"] == n
    assert r["median_norm2"] == med
    assert r["n_low"] == n_low
    assert r["n_high"] == n_high
    assert r["low_share_micro"] == _half_away(n_low * 1000000, n)
    assert r["high_share_micro"] == _half_away(n_high * 1000000, n)


# ---------------------------------------------------------------- wave 3


def test_cohort_ltv_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, CAST(date_trunc('week', ts) AS DATE), value"
        " FROM events WHERE event_type = 'purchase'"
    ).fetchall()
    first = {}
    for u, wk, _ in rows:
        if u not in first or wk < first[u]:
            first[u] = wk
    cs = {}
    for u, cwk in first.items():
        cs[cwk] = cs.get(cwk, 0) + 1
    byage = {}
    for u, wk, v in rows:
        cwk = first[u]
        off = (wk - cwk).days // 7
        q = math.floor(v * 1000000.0 + 0.5)
        byage[(cwk, off)] = byage.get((cwk, off), 0) + q
    out = {
        (r["cohort_wk"], r["wk_offset"]): r
        for r in run(spark, sf_dir, "events_cohort_ltv_curve")
    }
    assert set(out) == set(byage)
    for cwk in cs:
        cum = 0
        for off in sorted(o for c, o in byage if c == cwk):
            cum += byage[(cwk, off)]
            r = out[(cwk, off)]
            assert r["cohort_users"] == cs[cwk]
            assert r["cum_value_micro"] == cum
            assert r["ltv_per_user_micro"] == _half_away(cum, cs[cwk])


def test_cindex_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, floor(epoch(MIN(ts))), floor(epoch(MAX(ts))),"
        " COUNT(*) FROM events GROUP BY user_id"
    ).fetchall()
    gmax = max(int(t1) for _, _, t1, _ in rows)
    subs = [
        (int(t1 - t0) // 86400, 1 if gmax - t1 > 86400 else 0, c)
        for _, t0, t1, c in rows
    ]
    comp = conc = tied = 0
    for di, ei, si in subs:
        if ei != 1:
            continue
        for dj, _, sj in subs:
            if dj > di:
                comp += 1
                if si > sj:
                    conc += 1
                elif si == sj:
                    tied += 1
    (r,) = run(spark, sf_dir, "survival_concordance_cindex")
    assert r["n_comparable"] == comp
    assert r["n_concordant"] == conc
    assert r["n_tied_score"] == tied
    assert r["c_index_micro"] == _half_away((2 * conc + tied) * 1000000, 2 * comp)


def test_catalog_coverage_reference(spark, sf_dir, con):
    # recommended set from the registered recommender (itself
    # oracle-checked); the NEW logic under test is exposure + Gini
    rec = run(spark, sf_dir, "recs_item_cooccurrence")
    expos = {}
    for r in rec:
        expos[r["neighbor"]] = expos.get(r["neighbor"], 0) + 1
    catalog = {
        r[0] for r in con.execute("SELECT DISTINCT l_partkey FROM lineitem").fetchall()
    }
    xs = sorted(expos.get(i, 0) for i in catalog)
    n = len(xs)
    sx = sum(xs)
    # tie-averaged doubled ranks over the sorted multiset
    dx = 0
    i = 0
    while i < n:
        j = i
        while j < n and xs[j] == xs[i]:
            j += 1
        d = (i + 1) + j  # 2 * average rank of the tie block [i+1 .. j]
        dx += sum(d * x for x in xs[i:j])
        i = j
    gini = _half_away((dx - (n + 1) * sx) * 1000000, n * sx)
    n_zero = sum(1 for x in xs if x == 0)
    (r,) = run(spark, sf_dir, "recs_catalog_coverage")
    assert r["n_catalog"] == n
    assert r["n_recommended"] == n - n_zero
    assert r["coverage_micro"] == _half_away((n - n_zero) * 1000000, n)
    assert r["n_zero_exposure"] == n_zero
    assert r["exposure_gini_micro"] == gini


# ---------------------------------------------------------------- wave 4


def test_kaplan_meier_reference(spark, sf_dir, con):
    from decimal import Decimal

    rows = con.execute(
        "SELECT floor(epoch(MIN(ts))), floor(epoch(MAX(ts)))"
        " FROM events GROUP BY user_id"
    ).fetchall()
    gmax = max(int(t1) for _, t1 in rows)
    subs = [
        (int(t1 - t0) // 86400, 1 if gmax - t1 > 86400 else 0)
        for t0, t1 in rows
    ]
    byd = {}
    for dur, ev in subs:
        c, d = byd.get(dur, (0, 0))
        byd[dur] = (c + 1, d + ev)
    total = len(subs)
    seen = 0
    lncum = Decimal(0)
    dead = False
    expected = {}
    for dur in sorted(byd):
        c, d = byd[dur]
        n_risk = total - seen
        seen += c
        if d > 0:
            if d < n_risk:
                lncum += Decimal(repr(round(math.log((n_risk - d) / n_risk), 9)))
            else:
                dead = True
            s = 0 if dead else math.floor(math.exp(float(lncum)) * 1e6 + 0.5)
            expected[dur] = (n_risk, d, s)
    out = {r["duration_days"]: r for r in run(spark, sf_dir, "survival_kaplan_meier")}
    assert set(out) == set(expected)
    for dur, (nr, d, s) in expected.items():
        r = out[dur]
        assert r["n_at_risk"] == nr
        assert r["n_events"] == d
        assert r["survival_micro"] == s


def test_recall_at_k_reference(spark, sf_dir, con):
    terms = ["spark", "vector", "data", "stream", "query"]
    rows = con.execute(
        "SELECT t.term, t.doc_id, COUNT(*),"
        " MAX(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END)"
        " FROM (SELECT doc_id,"
        "       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term"
        "       FROM documents) t"
        " JOIN documents d ON d.doc_id = t.doc_id"
        " WHERE t.term IN ('spark','vector','data','stream','query')"
        " GROUP BY t.term, t.doc_id"
    ).fetchall()
    by_term = {}
    for term, did, tf, rel in rows:
        by_term.setdefault(term, []).append((-tf, did, rel))
    out = {r["term"]: r for r in run(spark, sf_dir, "eval_retrieval_recall_at_k")}
    assert set(out) == set(by_term) == set(terms)
    for term, cands in by_term.items():
        cands.sort()
        nrel = sum(rel for _, _, rel in cands)
        r = out[term]
        assert r["n_candidates"] == len(cands)
        assert r["n_relevant"] == nrel
        for k in (5, 20):
            ra = sum(rel for _, _, rel in cands[:k])
            assert r[f"rel_at_{k}"] == ra
            if nrel:
                assert r[f"recall_at_{k}_micro"] == _half_away(ra * 1000000, nrel)
            else:
                assert r[f"recall_at_{k}_micro"] is None
            assert r[f"precision_at_{k}_micro"] == _half_away(
                ra * 1000000, min(k, len(cands))
            )


def test_dow_hour_profile_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT isodow(ts), EXTRACT(hour FROM ts), COUNT(*)"
        " FROM events GROUP BY 1, 2"
    ).fetchall()
    n = sum(c for _, _, c in rows)
    out = {(r["dow"], r["hour"]): r for r in run(spark, sf_dir, "events_dow_hour_profile")}
    assert set(out) == {(int(d), int(h)) for d, h, _ in rows}
    for d, h, c in rows:
        r = out[(int(d), int(h))]
        assert r["n_events"] == c
        assert r["share_micro"] == _half_away(c * 1000000, n)
        assert r["chi2_contrib_micro"] == _half_away(
            (168 * c - n) ** 2 * 1000000, 168 * n
        )


# ---------------------------------------------------------------- wave 5


def test_mase_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, value FROM events WHERE event_type = 'purchase'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    series = {}
    for u, v in rows:
        series.setdefault(u, []).append(math.floor(v * 1000000.0 + 0.5))
    out = {r["user_id"]: r for r in run(spark, sf_dir, "timeseries_mase_seasonal_naive")}
    expected = {u for u, s in series.items() if len(s) >= 8}
    assert set(out) == expected
    for u in expected:
        s = series[u]
        e1 = sum(abs(a - b) for a, b in zip(s[1:], s))
        e7 = sum(abs(s[i] - s[i - 7]) for i in range(7, len(s)))
        n1, n7 = len(s) - 1, len(s) - 7
        r = out[u]
        assert r["n_naive_terms"] == n1
        assert r["n_seasonal_terms"] == n7
        assert r["mae_naive_micro"] == _half_away(e1, n1)
        assert r["mae_seasonal_micro"] == _half_away(e7, n7)
        if e1 > 0:
            assert r["mase_micro"] == _half_away(e7 * n1 * 1000000, n7 * e1)
        else:
            assert r["mase_micro"] is None


def test_kfold_reference(spark, sf_dir, con):
    rows = con.execute("SELECT doc_id, n_chars FROM documents").fetchall()
    folds = {}
    for did, nc in rows:
        f = ((did * 2862933555777941757 + 3037000493) % 2**64) % 2**31 % 5
        nd, c = folds.get(f, (0, 0))
        folds[f] = (nd + 1, c + nc)
    n = sum(nd for nd, _ in folds.values())
    tc = sum(c for _, c in folds.values())
    out = {r["fold"]: r for r in run(spark, sf_dir, "sample_kfold_assignment")}
    assert set(out) == set(folds)
    for f, (nd, c) in folds.items():
        r = out[f]
        assert r["n_docs"] == nd
        assert r["n_chars"] == c
        assert r["doc_share_micro"] == _half_away(nd * 1000000, n)
        assert r["char_share_micro"] == _half_away(c * 1000000, tc)


def test_basket_holdout_reference(spark, sf_dir, con):
    # top-3 lists from the registered (oracle-checked) recommender; the
    # NEW logic under test is holdout construction + hit counting
    rec = run(spark, sf_dir, "recs_item_cooccurrence")
    top = {}
    for r in rec:
        top.setdefault(r["item"], set()).add(r["neighbor"])
    rows = con.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    baskets = {}
    for ok, it in rows:
        baskets.setdefault(ok, set()).add(it)
    kept = {ok: items for ok, items in baskets.items() if 2 <= len(items) <= 32}
    hits = 0
    for ok, items in kept.items():
        h = max(items)
        ctx = items - {h}
        if any(h in top.get(c, ()) for c in ctx):
            hits += 1
    (r,) = run(spark, sf_dir, "recs_basket_holdout_eval")
    assert r["n_baskets"] == len(kept)
    assert r["n_hits"] == hits
    assert r["hit_rate_micro"] == _half_away(hits * 1000000, len(kept))


# ---------------------------------------------------------------- wave 6


def test_volume_anomaly_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT CAST(date_trunc('day', ts) AS DATE), COUNT(*)"
        " FROM events GROUP BY 1"
    ).fetchall()
    counts = {d: c for d, c in rows}
    vals = sorted(counts.values())
    n = len(vals)
    med = vals[(n + 1) // 2 - 1]
    devs = sorted(abs(v - med) for v in vals)
    mad = devs[(n + 1) // 2 - 1]
    out = {r["day"]: r for r in run(spark, sf_dir, "dq_volume_anomaly_daily")}
    assert set(out) == set(counts)
    for d, c in counts.items():
        r = out[d]
        assert r["n_events"] == c
        assert r["median_daily"] == med
        assert r["mad_daily"] == mad
        assert r["deviation"] == c - med
        assert r["is_anomaly"] == (abs(c - med) * 10000 > 44478 * mad)


def test_duplicate_payload_reference(spark, sf_dir, con, tmp_path):
    """Zero-dup fixture checks the skeleton; a doubled fixture checks
    the counting actually counts."""
    import shutil

    import duckdb as ddb

    (r0,) = [
        r for r in run(spark, sf_dir, "dq_duplicate_payload_rate")
        if r["event_type"] == "purchase"
    ]
    assert r0["n_duplicate_rows"] == 0 and r0["dup_rate_micro"] == 0
    # doubled fixture: every purchase row twice under fresh event_ids
    c = ddb.connect()
    c.execute(
        f"COPY (SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
        f" UNION ALL"
        f" SELECT event_id + 10000000, ts, user_id, event_type, value, props"
        f" FROM read_parquet('{sf_dir}/events.parquet')"
        f" WHERE event_type = 'purchase')"
        f" TO '{tmp_path}/events.parquet' (FORMAT PARQUET)"
    )
    for t in ("documents", "embeddings", "lineitem", "orders", "customer",
              "nation", "region", "supplier", "part"):
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{tmp_path}/{t}.parquet")
    out = {
        r["event_type"]: r
        for r in run(spark, str(tmp_path), "dq_duplicate_payload_rate")
    }
    n_purch = con.execute(
        "SELECT COUNT(*) FROM events WHERE event_type = 'purchase'"
    ).fetchone()[0]
    r = out["purchase"]
    assert r["n_events"] == 2 * n_purch
    assert r["n_duplicate_rows"] == n_purch
    assert r["n_duplicated_payloads"] == n_purch
    assert r["dup_rate_micro"] == _half_away(n_purch * 1000000, 2 * n_purch)


def test_donchian_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, epoch_us(ts) // 21600000000, value FROM events"
        " WHERE event_type = 'purchase'"
    ).fetchall()
    bars = {}
    for u, hb, v in rows:
        q = math.floor(v * 1000000.0 + 0.5)
        h, lo = bars.get((u, hb), (q, q))
        bars[(u, hb)] = (max(h, q), min(lo, q))
    series = {}
    for (u, hb), hl in sorted(bars.items()):
        series.setdefault(u, []).append(hl)
    out = {r["user_id"]: r for r in run(spark, sf_dir, "window_donchian_breakout")}
    assert set(out) == set(series)
    for u, s in series.items():
        n_eval = up = dn = 0
        for i in range(len(s)):
            if i >= 4:
                n_eval += 1
                hi = max(h for h, _ in s[i - 4:i])
                lo = min(l for _, l in s[i - 4:i])
                if s[i][0] > hi:
                    up += 1
                if s[i][1] < lo:
                    dn += 1
        r = out[u]
        assert r["n_bars"] == len(s)
        assert r["n_evaluated"] == n_eval
        assert r["n_up_breakouts"] == up
        assert r["n_down_breakouts"] == dn


# ---------------------------------------------------------------- wave 7


def test_dispersion_index_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT CAST(date_trunc('day', ts) AS DATE), COUNT(*)"
        " FROM events GROUP BY 1"
    ).fetchall()
    xs = [c for _, c in rows]
    n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
    (r,) = run(spark, sf_dir, "agg_dispersion_index")
    assert r["n_days"] == n
    assert r["mean_daily_micro"] == _half_away(sx * 1000000, n)
    assert r["dispersion_index_micro"] == _half_away(
        (n * sxx - sx * sx) * 1000000, (n - 1) * sx
    )
    assert r["chi2_stat_micro"] == _half_away((n * sxx - sx * sx) * 1000000, sx)


def test_retention_halflife_reference(spark, sf_dir, con):
    from decimal import Decimal

    rows = con.execute(
        "SELECT user_id, CAST(date_trunc('week', ts) AS DATE)"
        " FROM events WHERE event_type = 'purchase'"
    ).fetchall()
    first = {}
    for u, wk in rows:
        if u not in first or wk < first[u]:
            first[u] = wk
    max_wk = max(wk for _, wk in rows)
    cs = {}
    for cwk in first.values():
        cs[cwk] = cs.get(cwk, 0) + 1
    act = {}
    for u, wk in set(rows):
        off = (wk - first[u]).days // 7
        act.setdefault(off, set()).add(u)
    pts = []
    for off in sorted(o for o in act if o >= 1):
        n_active = len(act[off])
        n_elig = sum(n0 for cwk, n0 in cs.items()
                     if (max_wk - cwk).days // 7 >= off)
        if n_active > 0 and n_elig > 0:
            pts.append(
                (Decimal(off), Decimal(repr(round(math.log(n_active / n_elig), 9))))
            )
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (float(n) * float(sxy) - float(sx) * float(sy)) / (
        float(n) * float(sxx) - float(sx) * float(sx)
    )
    (r,) = run(spark, sf_dir, "events_retention_halflife")
    assert r["n_points"] == n
    assert abs(r["decay_slope"] - slope) < 1e-6
    assert abs(r["halflife_weeks"] - (-0.6931471805599453 / slope)) < 1e-5
