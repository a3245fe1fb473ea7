"""Python-reference tests for the round-12 operator waves.

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
    assert num >= 0 and den > 0
    return (2 * num + den) // (2 * den)


def _micro(v: float) -> int:
    return math.floor(v * 1_000_000.0 + 0.5)


# ---------------------------------------------------------------- wave 1


def test_text_blocks_materialize_reference(spark, sf_dir, con):
    """The artifact shape row must equal an independent pure-Python
    block cut + (source, block) count (the dedup_paragraphs 8-word
    construction, per source)."""
    rows = con.execute("SELECT doc_id, source, text FROM documents").fetchall()
    occ: dict[tuple[str, str], list[int, set]] = {}
    for doc_id, source, text in rows:
        ws = text.strip().lower().split()
        for j in range(math.ceil(len(ws) / 8)):
            block = " ".join(ws[j * 8 : j * 8 + 8])
            key = (source, block)
            if key not in occ:
                occ[key] = [0, set()]
            occ[key][0] += 1
            occ[key][1].add(doc_id)
    n_keys = len(occ)
    n_sources = len({s for s, _ in occ})
    n_inst = sum(c for c, _ in occ.values())
    doc_hits = sum(len(d) for _, d in occ.values())
    boiler = sum(c for c, d in occ.values() if len(d) >= 2)
    (row,) = run(spark, sf_dir, "text_blocks_materialize")
    assert (
        row.n_block_keys,
        row.n_sources,
        row.n_block_instances,
        row.sum_doc_hits,
        row.n_boilerplate_instances,
    ) == (n_keys, n_sources, n_inst, doc_hits, boiler)


# ---------------------------------------------------------------- wave 2


def _avg_rank_doubled(values):
    """Doubled average ranks (2*rank) for a list, ties averaged."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    dr2 = [0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and values[order[j]] == values[order[i]]:
            j += 1
        # ranks i+1..j averaged -> doubled = (i+1) + j
        for t in range(i, j):
            dr2[order[t]] = (i + 1) + j
        i = j
    return dr2


def test_friedman_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, event_type, value FROM events"
    ).fetchall()
    cells: dict[int, dict[str, int]] = {}
    for u, t, v in rows:
        cells.setdefault(u, {})
        cells[u][t] = cells[u].get(t, 0) + _micro(v)
    blocks = {u: c for u, c in cells.items() if len(c) == 5}
    n = len(blocks)
    types = ["click", "view", "purchase", "signup", "error"]
    r2 = dict.fromkeys(types, 0)
    t3 = 0
    for u, c in blocks.items():
        vs = [c[t] for t in types]
        dr2 = _avg_rank_doubled(vs)
        for t, d in zip(types, dr2):
            r2[t] += d
        cnt: dict[int, int] = {}
        for v in vs:
            cnt[v] = cnt.get(v, 0) + 1
        t3 += sum(k**3 - k for k in cnt.values())
    s2 = sum(v * v for v in r2.values())
    chi2 = 3.0 * s2 / (n * 30.0) - 18.0 * n
    corr = 1.0 - t3 / (n * 120.0)
    (row,) = run(spark, sf_dir, "agg_friedman_test")
    assert row.n_blocks == n and row.k == 5
    assert row.chi2_friedman == pytest.approx(chi2, abs=2e-6)
    assert row.chi2_tie_corrected == pytest.approx(chi2 / corr, abs=2e-6)
    # the fixture has enough blocks for the test to be meaningful
    assert n >= 10


def test_durbin_watson_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, value FROM events WHERE event_type = 'purchase'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    series: dict[int, list[int]] = {}
    for u, v in rows:
        series.setdefault(u, []).append(_micro(v))
    got = {r.user_id: r for r in run(spark, sf_dir, "timeseries_durbin_watson")}
    want_users = {u for u, xs in series.items() if len(xs) >= 2}
    assert set(got) == want_users
    for u in want_users:
        xs = series[u]
        n = len(xs)
        sd2 = sum((a - b) ** 2 for a, b in zip(xs[1:], xs))
        den = n * sum(x * x for x in xs) - sum(xs) ** 2
        row = got[u]
        assert row.n_obs == n
        if den == 0:
            assert row.dw_micro is None
        else:
            assert row.dw_micro == _half_away(n * sd2 * 1_000_000, den)
            # DW lives in [0, 4]
            assert 0 <= row.dw_micro <= 4_000_000


def test_pettitt_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT date_trunc('day', ts) AS day, value FROM events"
        " WHERE event_type = 'purchase' ORDER BY day"
    ).fetchall()
    daily: dict = {}
    for day, v in rows:
        daily[day] = daily.get(day, 0) + _micro(v)
    days = sorted(daily)
    xs = [daily[d] for d in days]
    n = len(xs)
    # U_t from first principles (pairwise sign sums), not via ranks —
    # the rank identity is what the operator uses, so this is the
    # independent check that the identity holds on the fixture
    best_k, best_day = -1, None
    for t in range(1, n + 1):
        ut = sum(
            (1 if xs[i] > xs[j] else -1 if xs[i] < xs[j] else 0)
            for i in range(t)
            for j in range(t, n)
        )
        if abs(ut) > best_k:
            best_k, best_day = abs(ut), days[t - 1]
    p = min(1.0, 2.0 * math.exp(-6.0 * best_k * best_k / (n**3 + n**2)))
    (row,) = run(spark, sf_dir, "timeseries_pettitt_changepoint")
    assert row.n_days == n
    assert row.k_stat == best_k
    # normalize date vs midnight-timestamp renderings of the same day
    got_day = getattr(row.changepoint_day, "date", lambda: row.changepoint_day)()
    want_day = getattr(best_day, "date", lambda: best_day)()
    assert got_day == want_day
    assert row.p_approx == pytest.approx(p, abs=2e-6)


# ---------------------------------------------------------------- wave 3


def _bars(con, cols="arg_max(q, ts) AS c, COUNT(*) AS v"):
    return con.execute(
        "WITH p AS (SELECT user_id, ts,"
        " CAST(floor(CAST(value AS DOUBLE)*1000000.0+0.5) AS BIGINT) AS q,"
        " epoch_us(ts) // 21600000000 AS hb"
        " FROM events WHERE event_type='purchase')"
        f" SELECT user_id, hb, {cols} FROM p GROUP BY user_id, hb"
        " ORDER BY user_id, hb"
    ).fetchall()


def test_obv_reference(spark, sf_dir, con):
    rows = _bars(con)
    got = {r.user_id: r for r in run(spark, sf_dir, "window_obv")}
    series: dict[int, list] = {}
    for u, hb, c, v in rows:
        series.setdefault(u, []).append((c, v))
    assert set(got) == set(series)
    for u, bars in series.items():
        obv, prev, mn, mx = 0, None, 0, 0
        for c, v in bars:
            if prev is not None and c != prev:
                obv += v if c > prev else -v
            prev = c
            mn, mx = min(mn, obv), max(mx, obv)
        row = got[u]
        assert (row.n_bars, row.obv_final, row.obv_min, row.obv_max) == (
            len(bars), obv, mn, mx,
        )


def test_aroon_reference(spark, sf_dir, con):
    rows = _bars(con, cols="MAX(q) AS h, MIN(q) AS l")
    got = {r.user_id: r for r in run(spark, sf_dir, "window_aroon")}
    series: dict[int, list] = {}
    for u, hb, h, lo in rows:
        series.setdefault(u, []).append((h, lo))
    for u, bars in series.items():
        ups, downs = [], []
        for i in range(3, len(bars)):
            win = bars[i - 3 : i + 1]
            # most-recent extreme (max index among ties)
            hs = [b[0] for b in win]
            ls = [b[1] for b in win]
            since_h = 3 - max(j for j in range(4) if hs[j] == max(hs))
            since_l = 3 - max(j for j in range(4) if ls[j] == min(ls))
            ups.append(_half_away((3 - since_h) * 1_000_000, 3))
            downs.append(_half_away((3 - since_l) * 1_000_000, 3))
        if not ups:
            assert u not in got
            continue
        row = got[u]
        assert row.n_evaluated == len(ups)
        assert row.mean_up_micro == _half_away(sum(ups), len(ups))
        assert row.mean_down_micro == _half_away(sum(downs), len(downs))
        assert row.n_uptrend == sum(1 for a, b in zip(ups, downs) if a > b)
        assert row.n_downtrend == sum(1 for a, b in zip(ups, downs) if b > a)


def test_item_novelty_reference(spark, sf_dir, con):
    """Novelty from first principles: rebuild baskets + top-3 cosine
    lists in python, then mean -log2 popularity of neighbors."""
    rows = con.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    baskets: dict[int, set] = {}
    for ok, it in rows:
        baskets.setdefault(ok, set()).add(it)
    kept = {ok: its for ok, its in baskets.items() if len(its) <= 32}
    n = len(kept)
    cnt: dict[int, int] = {}
    for its in kept.values():
        for it in its:
            cnt[it] = cnt.get(it, 0) + 1
    pair: dict[tuple, int] = {}
    for its in kept.values():
        s = sorted(its)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                pair[(a, b)] = pair.get((a, b), 0) + 1
    neigh: dict[int, list] = {}
    for (a, b), t in pair.items():
        if t < 2:
            continue
        cos = t / math.sqrt(cnt[a] * cnt[b])
        neigh.setdefault(a, []).append((-round(cos, 9), b))
        neigh.setdefault(b, []).append((-round(cos, 9), a))
    bits_sum, c_sum, rows_n = 0, 0, 0
    for a, cands in neigh.items():
        for _, b in sorted(cands)[:3]:
            rows_n += 1
            c_sum += cnt[b]
            bits_sum += round(
                (math.log(n) - math.log(cnt[b])) / 0.6931471805599453, 9
            )
    (row,) = run(spark, sf_dir, "recs_item_novelty")
    assert row.n_list_rows == rows_n
    assert row.mean_novelty_bits == pytest.approx(bits_sum / rows_n, abs=2e-6)
    assert row.mean_pop_micro == _half_away(c_sum * 1_000_000, rows_n * n)
    # novelty must exceed 0 (neighbors are never in every basket)
    assert row.mean_novelty_bits > 0


# ---------------------------------------------------------------- wave 4


def test_wasserstein_reference(spark, sf_dir, con):
    """W1 from first principles: sort both samples, W1 for equal-size...
    general case via the quantile-function integral identity computed
    directly from the two sorted samples (no CDF-step shortcut)."""
    a = sorted(
        _micro(v)
        for (v,) in con.execute(
            "SELECT value FROM events WHERE event_type='purchase'"
        ).fetchall()
    )
    b = sorted(
        _micro(v)
        for (v,) in con.execute(
            "SELECT value FROM events WHERE event_type='click'"
        ).fetchall()
    )
    na, nb = len(a), len(b)
    # integral of |F_a - F_b| over the merged support, exact rational
    support = sorted(set(a) | set(b))
    num = 0
    ia = ib = 0
    ca = cb = 0
    for x, nx in zip(support, support[1:]):
        while ia < na and a[ia] <= x:
            ia += 1
        while ib < nb and b[ib] <= x:
            ib += 1
        num += abs(ia * nb - ib * na) * (nx - x)
    (row,) = run(spark, sf_dir, "agg_wasserstein_1d")
    assert (row.n_purchase, row.n_click) == (na, nb)
    assert row.wasserstein_micro == _half_away(num, na * nb)
    # distributions genuinely differ on the fixture
    assert row.wasserstein_micro > 0


def test_weekly_ks_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT epoch_us(ts) // 604800000000 AS wk, value FROM events"
        " WHERE event_type='purchase'"
    ).fetchall()
    weeks: dict[int, list[float]] = {}
    for wk, v in rows:
        weeks.setdefault(wk, []).append(v)
    got = {r.week_bucket: r for r in run(spark, sf_dir, "events_weekly_ks_drift")}
    want_pairs = {w + 1 for w in weeks if w + 1 in weeks}
    assert set(got) == want_pairs
    for p in want_pairs:
        prev, cur = sorted(weeks[p - 1]), sorted(weeks[p])
        n1, n2 = len(prev), len(cur)
        support = sorted(set(prev) | set(cur))
        dnum = 0
        for x in support:
            c1 = sum(1 for v in prev if v <= x)
            c2 = sum(1 for v in cur if v <= x)
            dnum = max(dnum, abs(c1 * n2 - c2 * n1))
        row = got[p]
        assert (row.n_prev, row.n_cur) == (n1, n2)
        assert row.d_micro == _half_away(dnum * 1_000_000, n1 * n2)
        z = math.sqrt(n1 * n2 / (n1 + n2)) * dnum / (n1 * n2)
        assert row.ks_z == pytest.approx(z, abs=2e-6)


def test_ocr_garbage_reference(spark, sf_dir, con):
    import re

    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    got = {r.doc_id: r for r in run(spark, sf_dir, "text_ocr_garbage_score")}
    assert set(got) == {d for d, _ in rows}
    n_garbage = 0
    for doc_id, text in rows:
        t = text.lower()
        n = len(t)
        letters = len(re.sub(r"[^a-z]", "", t))
        vowels = len(re.sub(r"[^aeiou]", "", t))
        symbols = len(re.sub(r"[a-z0-9\s]", "", t, flags=re.ASCII))
        runs = re.split(r"[^b-df-hj-np-tv-z]+", t)
        max_run = max(len(r) for r in runs)
        row = got[doc_id]
        assert (row.n_chars_raw, row.n_symbols, row.has_consonant_run8) == (
            n, symbols, max_run >= 8,
        )
        assert row.symbol_ratio_micro == (
            _half_away(symbols * 1_000_000, n) if n else None
        )
        assert row.vowel_ratio_micro == (
            _half_away(vowels * 1_000_000, letters) if letters else None
        )
        want_garbage = n > 0 and (
            20 * symbols > n or max_run >= 8 or letters == 0
            or 5 * vowels < letters
        )
        assert row.is_garbage == want_garbage
        n_garbage += want_garbage
    # clean synthetic prose: the detector must NOT fire on the fixture
    assert n_garbage == 0


# ---------------------------------------------------------------- wave 5


def test_page_trend_reference(spark, sf_dir, con):
    from decimal import Decimal

    rows = con.execute(
        "SELECT o_custkey, CAST(substr(o_orderpriority,1,1) AS INTEGER),"
        " CAST(o_totalprice AS DECIMAL(18,2)) FROM orders"
    ).fetchall()
    cells: dict[int, dict[int, Decimal]] = {}
    for cust, j, v in rows:
        cells.setdefault(cust, {})
        cells[cust][j] = cells[cust].get(j, Decimal(0)) + v
    blocks = {u: c for u, c in cells.items() if len(c) == 5}
    n = len(blocks)
    l2 = 0
    for c in blocks.values():
        vs = [c[j] for j in range(1, 6)]
        dr2 = _avg_rank_doubled(vs)
        l2 += sum(j * d for j, d in zip(range(1, 6), dr2))
    z = (l2 - 90.0 * n) / (10.0 * math.sqrt(n))
    (row,) = run(spark, sf_dir, "agg_page_trend_test")
    assert (row.n_blocks, row.k, row.page_l_doubled) == (n, 5, l2)
    assert row.z_approx == pytest.approx(z, abs=2e-6)
    assert n >= 50  # the fixture carries a real block population


def test_gini_diversity_reference(spark, sf_dir, con):
    """Exposure Gini from first principles: rebuild baskets + top-3
    cosine lists, count list appearances per catalog item (zeros
    included), Gini over rank-ordered counts."""
    rows = con.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    baskets: dict[int, set] = {}
    for ok, it in rows:
        baskets.setdefault(ok, set()).add(it)
    kept = [its for its in baskets.values() if len(its) <= 32]
    cnt: dict[int, int] = {}
    for its in kept:
        for it in its:
            cnt[it] = cnt.get(it, 0) + 1
    pair: dict[tuple, int] = {}
    for its in kept:
        s = sorted(its)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                pair[(a, b)] = pair.get((a, b), 0) + 1
    neigh: dict[int, list] = {}
    for (a, b), t in pair.items():
        if t < 2:
            continue
        cos = t / math.sqrt(cnt[a] * cnt[b])
        neigh.setdefault(a, []).append((-round(cos, 9), b))
        neigh.setdefault(b, []).append((-round(cos, 9), a))
    expo = dict.fromkeys(cnt, 0)
    for a, cands in neigh.items():
        for _, b in sorted(cands)[:3]:
            expo[b] += 1
    ordered = sorted(expo.items(), key=lambda kv: (kv[1], kv[0]))
    m = len(ordered)
    se = sum(e for _, e in ordered)
    sie = sum((i + 1) * e for i, (_, e) in enumerate(ordered))
    gini = 2.0 * sie / (m * se) - (m + 1.0) / m
    (row,) = run(spark, sf_dir, "recs_gini_diversity")
    assert row.n_items == m
    assert row.n_exposed_items == sum(1 for _, e in ordered if e > 0)
    assert row.n_exposures == se
    assert row.gini == pytest.approx(gini, abs=2e-6)
    # exposure is meaningfully concentrated but not degenerate
    assert 0.0 < row.gini < 1.0


# ---------------------------------------------------------------- wave 6


def test_partial_correlation_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT COUNT(*),"
        " SUM(CAST(floor(CAST(l_extendedprice AS DOUBLE)*100+0.5) AS BIGINT)),"
        " SUM(CAST(floor(CAST(l_quantity AS DOUBLE)*100+0.5) AS BIGINT))"
        " FROM lineitem GROUP BY l_orderkey"
    ).fetchall()
    xs = [int(x) for x, _, _ in rows]
    ys = [int(y) for _, y, _ in rows]
    zs = [int(z) for _, _, z in rows]
    n = len(rows)

    def r(a, b):
        sa, sb = sum(a), sum(b)
        saa = sum(v * v for v in a)
        sbb = sum(v * v for v in b)
        sab = sum(u * v for u, v in zip(a, b))
        return (n * sab - sa * sb) / math.sqrt(
            (n * saa - sa * sa) * (n * sbb - sb * sb)
        )

    rxy, rxz, ryz = r(xs, ys), r(xs, zs), r(ys, zs)
    partial = (ryz - rxy * rxz) / math.sqrt((1 - rxy**2) * (1 - rxz**2))
    (row,) = run(spark, sf_dir, "agg_partial_correlation")
    assert row.n_orders == n
    assert row.r_lines_price == pytest.approx(rxy, abs=2e-6)
    assert row.r_lines_qty == pytest.approx(rxz, abs=2e-6)
    assert row.r_price_qty == pytest.approx(ryz, abs=2e-6)
    assert row.partial_r_price_qty == pytest.approx(partial, abs=2e-6)
    # the confounder story the op encodes must hold on the fixture:
    # raw price-qty correlation is strong, the partial collapses it
    assert row.r_price_qty > 0.5
    assert abs(row.partial_r_price_qty) < row.r_price_qty / 2


def test_cross_correlation_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT epoch_us(ts) // 86400000000 AS dd,"
        " SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END),"
        " SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END)"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    px = {dd: int(p) for dd, p, _ in rows}
    er = {dd: int(e) for dd, _, e in rows}
    got = {r.lag: r for r in run(spark, sf_dir, "timeseries_cross_correlation")}
    assert set(got) == set(range(-3, 4))
    for lag in range(-3, 4):
        pairs = [
            (px[dd], er[dd + lag]) for dd in px if dd + lag in er
        ]
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        row = got[lag]
        assert row.n_pairs == n
        if den == 0:
            assert row.ccf is None
        else:
            assert row.ccf == pytest.approx(
                (n * sxy - sx * sy) / den, abs=2e-6
            )


# ---------------------------------------------------------------- wave 7


def test_mood_median_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT o_totalprice, o_orderpriority FROM orders"
    ).fetchall()
    xs = sorted((v, p in ("1-URGENT", "2-HIGH")) for v, p in rows)
    nn = len(xs)
    cut = xs[(nn + 1) // 2 - 1][0]  # lower median (1-indexed ceil(N/2))
    n1 = sum(1 for _, h in xs if h)
    a = sum(1 for v, h in xs if h and v > cut)
    ca = sum(1 for v, _ in xs if v > cut)
    b, cc, d = n1 - a, ca - a, (nn - n1) - (ca - a)
    chi2 = (
        nn * (a * d - b * cc) ** 2
        / (n1 * (nn - n1) * ca * (nn - ca))
    )
    (row,) = run(spark, sf_dir, "agg_mood_median")
    assert row.n_orders == nn and row.n_hi == n1 and row.n_lo == nn - n1
    assert row.median_cut == pytest.approx(cut, abs=1e-9)
    assert row.hi_above == a
    assert row.chi2 == pytest.approx(chi2, abs=2e-6)


def test_conover_squared_ranks_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT o_orderstatus, o_totalprice FROM orders"
        " WHERE o_orderstatus IN ('F','O')"
    ).fetchall()
    xc = [(g, math.floor(v * 100.0 + 0.5)) for g, v in rows]
    gs = {}
    for g, x in xc:
        c, s = gs.get(g, (0, 0))
        gs[g] = (c + 1, s + x)
    dm = [
        (g, math.floor(abs(float(x) - gs[g][1] / gs[g][0]) * 10000.0 + 0.5))
        for g, x in xc
    ]
    # pooled midranks over the deviation key
    from collections import Counter

    cnt = Counter(d for _, d in dm)
    cum, mid = 0, {}
    for v in sorted(cnt):
        mid[v] = cum + (cnt[v] + 1) / 2.0  # midrank
        cum += cnt[v]
    n1 = sum(1 for g, _ in dm if g == "F")
    n2 = len(dm) - n1
    nn = n1 + n2
    t = sum(mid[d] ** 2 for g, d in dm if g == "F")
    a2 = sum(mid[d] ** 2 for _, d in dm)
    a4 = sum(mid[d] ** 4 for _, d in dm)
    z = (t - n1 * a2 / nn) / math.sqrt(
        n1 * n2 / (nn * (nn - 1.0)) * (a4 - a2 * a2 / nn)
    )
    (row,) = run(spark, sf_dir, "agg_conover_squared_ranks")
    assert row.n_f == n1 and row.n_o == n2
    assert row.t_sq_ranks == pytest.approx(t, rel=1e-9)
    assert row.z_score == pytest.approx(z, abs=2e-6)


def test_cvm_two_sample_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT l_returnflag, l_extendedprice FROM lineitem"
        " WHERE l_returnflag IN ('R','N')"
    ).fetchall()
    xs = sorted(rows, key=lambda t: t[1])
    n = sum(1 for g, _ in xs if g == "R")
    m = len(xs) - n
    nn = n + m
    # ECDF sum over all observations (tie-weighted via distinct values)
    cumr = cumn = 0
    u = 0
    i = 0
    vals = sorted(set(v for _, v in xs))
    from collections import Counter

    cr = Counter(v for g, v in xs if g == "R")
    call = Counter(v for _, v in xs)
    for v in vals:
        cumr += cr.get(v, 0)
        cumn += call[v] - cr.get(v, 0)
        dif = m * cumr - n * cumn
        u += call[v] * dif * dif
    t = u / (n * m * nn * nn)
    (row,) = run(spark, sf_dir, "agg_cvm_two_sample")
    assert row.n_r == n and row.n_n == m
    assert row.t_stat == pytest.approx(t, abs=2e-6)
    assert row.expected_t == pytest.approx(1 / 6 + 1 / (6 * nn), abs=1e-6)


def test_cliffs_delta_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT l_quantity, CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END"
        " FROM lineitem"
    ).fetchall()
    hi = sorted(math.floor(q * 100.0 + 0.5) for q, h in rows if h)
    lo = sorted(math.floor(q * 100.0 + 0.5) for q, h in rows if not h)
    import bisect

    gt = sum(bisect.bisect_left(lo, x) for x in hi)
    le = sum(len(lo) - bisect.bisect_right(lo, x) for x in hi)
    tie = len(hi) * len(lo) - gt - le
    delta = (gt - le) / (len(hi) * len(lo))
    (row,) = run(spark, sf_dir, "agg_cliffs_delta")
    assert row.n_hi == len(hi) and row.n_lo == len(lo)
    assert row.pairs_gt == gt and row.pairs_lt == le
    assert row.pairs_tied == tie
    assert row.cliffs_delta == pytest.approx(delta, abs=2e-6)


# ---------------------------------------------------------------- wave 8


def _daily_purchase(con, col="count"):
    if col == "count":
        expr = "COUNT(*)"
    else:
        expr = "SUM(CAST(floor(CAST(value AS DOUBLE)*1000000.0+0.5) AS BIGINT))"
    rows = con.execute(
        f"SELECT epoch_us(ts) // 86400000000 AS dd, {expr}"
        " FROM events WHERE event_type='purchase' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    return [int(x) for _, x in rows]


def test_spectral_entropy_reference(spark, sf_dir, con):
    xs = _daily_purchase(con, "count")
    n = len(xs)
    ks = list(range(1, (n - 1) // 2 + 1))
    spec = {}
    for k in ks:
        qc = sum(
            math.floor(x * math.cos(2.0 * math.pi * ((k * t) % n) / n)
                       * 1e6 + 0.5)
            for t, x in enumerate(xs)
        )
        qs = sum(
            math.floor(x * math.sin(2.0 * math.pi * ((k * t) % n) / n)
                       * 1e6 + 0.5)
            for t, x in enumerate(xs)
        )
        spec[k] = qc * qc + qs * qs
    tot = sum(spec.values())
    h9 = sum(
        0 if i2 == 0
        else math.floor(-(i2 / tot) * math.log(i2 / tot) * 1e9 + 0.5)
        for i2 in spec.values()
    )
    mx = max(spec.values())
    peak = min(k for k, v in spec.items() if v == mx)
    ent = h9 / 1e9 / math.log(len(ks))
    (row,) = run(spark, sf_dir, "timeseries_spectral_entropy")
    assert row.n_days == n and row.n_freqs == len(ks)
    assert row.peak_k == peak
    assert row.peak_period_days == pytest.approx(n / peak, abs=1e-6)
    assert row.spectral_entropy == pytest.approx(ent, abs=2e-6)
    assert 0.0 < row.spectral_entropy <= 1.0


def test_sample_entropy_reference(spark, sf_dir, con):
    xs = _daily_purchase(con, "value")
    n = len(xs)
    s1, s2 = sum(xs), sum(x * x for x in xs)
    rtol = 0.2 * math.sqrt(n * s2 - s1 * s1) / n
    tpl = [(xs[i], xs[i + 1], xs[i + 2]) for i in range(n - 2)]
    b = a = 0
    for i in range(len(tpl)):
        for j in range(i + 1, len(tpl)):
            if max(abs(tpl[i][0] - tpl[j][0]), abs(tpl[i][1] - tpl[j][1])) <= rtol:
                b += 1
                if abs(tpl[i][2] - tpl[j][2]) <= rtol:
                    a += 1
    (row,) = run(spark, sf_dir, "timeseries_sample_entropy")
    assert row.n_days == n
    assert row.r_tolerance_micro == pytest.approx(rtol, rel=1e-9)
    assert row.b_pairs == b and row.a_pairs == a
    if a and b:
        assert row.sampen == pytest.approx(math.log(b / a), abs=2e-6)
    else:
        assert row.sampen is None


def test_kpss_reference(spark, sf_dir, con):
    xs = _daily_purchase(con, "value")
    n = len(xs)
    s1 = sum(xs)
    ev = [n * x - s1 for x in xs]
    sp = 0
    ssq = 0
    for e in ev:
        sp += e
        ssq += sp * sp
    g0 = sum(e * e for e in ev)
    l = math.floor(4.0 * (n / 100.0) ** 0.25)
    wg = 0
    for j in range(1, l + 1):
        wg += (l + 1 - j) * sum(ev[t] * ev[t + j] for t in range(n - j))
    eta = ssq * (l + 1.0) / (n * ((l + 1.0) * g0 + 2.0 * wg))
    (row,) = run(spark, sf_dir, "timeseries_kpss")
    assert row.n_days == n and row.lag_l == l
    assert row.kpss_stat == pytest.approx(eta, abs=2e-6)
    assert row.reject_05 == (round(eta, 6) > 0.463)


# ---------------------------------------------------------------- wave 9


def test_cox_stuart_reference(spark, sf_dir, con):
    xs = _daily_purchase(con, "value")
    n = len(xs)
    c = n // 2
    sp = sum(1 for i in range(c) if xs[i + c] > xs[i])
    sn = sum(1 for i in range(c) if xs[i + c] < xs[i])
    m = sp + sn
    (row,) = run(spark, sf_dir, "timeseries_cox_stuart")
    assert row.n_days == n and row.shift_c == c
    assert row.n_up == sp and row.n_down == sn
    if m:
        assert row.z_score == pytest.approx(
            (sp - m / 2.0) / math.sqrt(m / 4.0), abs=2e-6
        )


def test_turning_points_reference(spark, sf_dir, con):
    xs = _daily_purchase(con, "value")
    n = len(xs)
    tp = sum(
        1
        for t in range(1, n - 1)
        if (xs[t] > xs[t - 1] and xs[t] > xs[t + 1])
        or (xs[t] < xs[t - 1] and xs[t] < xs[t + 1])
    )
    z = (tp - 2.0 * (n - 2) / 3.0) / math.sqrt((16.0 * n - 29.0) / 90.0)
    (row,) = run(spark, sf_dir, "timeseries_turning_points")
    assert row.n_days == n and row.turning_points == tp
    assert row.expected_tp == pytest.approx(2.0 * (n - 2) / 3.0, abs=1e-6)
    assert row.z_score == pytest.approx(z, abs=2e-6)


def test_bartels_rank_reference(spark, sf_dir, con):
    xs = _daily_purchase(con, "value")
    n = len(xs)
    from collections import Counter

    cnt = Counter(xs)
    cum, mid = 0, {}
    for v in sorted(cnt):
        mid[v] = cum + (cnt[v] + 1) / 2.0
        cum += cnt[v]
    r = [mid[x] for x in xs]
    rbar = (n + 1) / 2.0
    num = sum((r[t] - r[t + 1]) ** 2 for t in range(n - 1))
    den = sum((v - rbar) ** 2 for v in r)
    rvn = num / den
    (row,) = run(spark, sf_dir, "timeseries_bartels_rank")
    assert row.n_days == n
    assert row.rvn == pytest.approx(rvn, abs=2e-6)
    assert row.z_score == pytest.approx((rvn - 2.0) * math.sqrt(n) / 2.0, abs=2e-6)


# --------------------------------------------------------------- wave 10


def _source_tokens(con):
    rows = con.execute(
        "SELECT source, lower(text) FROM documents"
    ).fetchall()
    import re

    out = {}
    for src, txt in rows:
        out.setdefault(src, []).append(re.findall(r"[a-z0-9]+", txt))
    return out


def test_yule_k_reference(spark, sf_dir, con):
    from collections import Counter

    toks = _source_tokens(con)
    got = {r.source: r for r in run(spark, sf_dir, "text_yule_k")}
    assert set(got) == set(toks)
    for src, docs in toks.items():
        cnt = Counter(w for d in docs for w in d)
        n = sum(cnt.values())
        f2 = sum(v * v for v in cnt.values())
        k = 1e4 * (f2 - n) / (n * n)
        row = got[src]
        assert row.n_tokens == n and row.vocab_size == len(cnt)
        assert row.yule_k == pytest.approx(k, abs=2e-6)


def test_msttr_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT doc_id, source, lower(text) FROM documents"
    ).fetchall()
    import re

    seg_types = {}
    for doc_id, src, txt in rows:
        ws = re.findall(r"[a-z0-9]+", txt)
        for j in range(len(ws) // 50):
            seg = ws[j * 50 : j * 50 + 50]
            seg_types.setdefault(src, []).append(len(set(seg)))
    got = {r.source: r for r in run(spark, sf_dir, "text_msttr")}
    assert set(got) == set(seg_types)
    for src, types in seg_types.items():
        row = got[src]
        assert row.n_segments == len(types)
        exact = _half_away(sum(types) * 1000000, 50 * len(types))
        assert row.msttr_micro == exact


def test_burrows_delta_reference(spark, sf_dir, con):
    from collections import Counter

    toks = _source_tokens(con)
    cnt = {s: Counter(w for d in ds for w in d) for s, ds in toks.items()}
    tot = Counter()
    for c in cnt.values():
        tot.update(c)
    top = sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    sources = sorted(cnt)
    ss = len(sources)
    z = {}
    for w, _ in top:
        fs = {
            s: (2 * cnt[s].get(w, 0) * 1000000000
                + sum(cnt[s].values())) // (2 * sum(cnt[s].values()))
            for s in sources
        }
        sf = sum(fs.values())
        sf2 = sum(v * v for v in fs.values())
        var4 = ss * sf2 - sf * sf
        if var4 == 0:
            z[w] = None
        else:
            den = math.sqrt(var4)
            z[w] = {s: (ss * fs[s] - sf) / den for s in sources}
    got = {(r.source_a, r.source_b): r
           for r in run(spark, sf_dir, "text_burrows_delta")}
    for i, sa in enumerate(sources):
        for sb in sources[i + 1:]:
            q = 0
            for w, _ in top:
                if z[w] is None:
                    continue
                q += math.floor(abs(z[w][sa] - z[w][sb]) * 1e9 + 0.5)
            row = got[(sa, sb)]
            assert row.n_words == 30
            assert row.delta == pytest.approx(q / 1e9 / 30, abs=2e-6)


# --------------------------------------------------------------- wave 11


def _user_bars(con):
    rows = con.execute(
        "SELECT user_id, epoch_us(ts) // 21600000000 AS hb,"
        " CAST(floor(CAST(value AS DOUBLE)*1000000.0+0.5) AS BIGINT) AS q,"
        " ts"
        " FROM events WHERE event_type='purchase' ORDER BY user_id, hb, ts"
    ).fetchall()
    bars = {}
    for uid, hb, q, ts in rows:
        b = bars.setdefault(uid, {}).setdefault(
            hb, {"h": q, "l": q, "c": q, "cts": ts, "s": 0, "v": 0}
        )
        b["h"] = max(b["h"], q)
        b["l"] = min(b["l"], q)
        if ts >= b["cts"]:
            b["c"], b["cts"] = q, ts
        b["s"] += q
        b["v"] += 1
    return bars


def test_vwap_deviation_reference(spark, sf_dir, con):
    bars = _user_bars(con)
    got = {r.user_id: r for r in run(spark, sf_dir, "window_vwap_deviation")}
    assert set(got) == set(bars)
    for uid, bs in bars.items():
        cs = cv = 0
        devs = []
        for hb in sorted(bs):
            cs += bs[hb]["s"]
            cv += bs[hb]["v"]
            devs.append((bs[hb]["c"] * cv - cs) / cs)
        row = got[uid]
        assert row.n_bars == len(bs)
        assert row.vwap_final_micro == _half_away(cs, cv)
        assert row.dev_final == pytest.approx(devs[-1], abs=2e-6)
        assert row.dev_min == pytest.approx(min(devs), abs=2e-6)
        assert row.dev_max == pytest.approx(max(devs), abs=2e-6)


def test_chaikin_money_flow_reference(spark, sf_dir, con):
    bars = _user_bars(con)
    got = {r.user_id: r
           for r in run(spark, sf_dir, "window_chaikin_money_flow")}
    assert set(got) == set(bars)
    for uid, bs in bars.items():
        seq = []
        for hb in sorted(bs):
            b = bs[hb]
            if b["h"] == b["l"]:
                mfq = 0
            else:
                d = b["v"] * (2 * b["c"] - b["h"] - b["l"]) / (b["h"] - b["l"])
                mfq = (math.floor(d * 1e6 + 0.5) if d >= 0
                       else -math.floor(-d * 1e6 + 0.5))
            seq.append((mfq, b["v"]))
        cmfs = []
        for i in range(len(seq)):
            lo = max(0, i - 19)
            smf = sum(m for m, _ in seq[lo:i + 1])
            sv = sum(v for _, v in seq[lo:i + 1])
            cmfs.append(smf / 1e6 / sv)
        row = got[uid]
        assert row.n_bars == len(seq)
        assert row.cmf_final == pytest.approx(cmfs[-1], abs=2e-6)
        assert row.cmf_min == pytest.approx(min(cmfs), abs=2e-6)
        assert row.cmf_max == pytest.approx(max(cmfs), abs=2e-6)


def test_ichimoku_reference(spark, sf_dir, con):
    bars = _user_bars(con)
    got = {r.user_id: r for r in run(spark, sf_dir, "window_ichimoku")}
    assert set(got) == set(bars)
    for uid, bs in bars.items():
        hbs = sorted(bs)
        n = len(hbs)
        hs = [bs[h]["h"] for h in hbs]
        ls = [bs[h]["l"] for h in hbs]
        cs = [bs[h]["c"] for h in hbs]
        t2 = max(hs[max(0, n - 9):]) + min(ls[max(0, n - 9):])
        k2 = max(hs[max(0, n - 26):]) + min(ls[max(0, n - 26):])
        sb2 = max(hs[max(0, n - 52):]) + min(ls[max(0, n - 52):])
        ck = cs[n - 27] if n >= 27 else None
        row = got[uid]
        assert row.n_bars == n
        assert row.close_micro == cs[-1]
        assert row.tenkan_x2 == t2 and row.kijun_x2 == k2
        assert row.senkou_a_x4 == t2 + k2 and row.senkou_b_x2 == sb2
        assert row.chikou_ref_micro == ck
        assert row.above_kijun == (2 * cs[-1] > k2)


# --------------------------------------------------------------- wave 12


def test_last_digit_heaping_reference(spark, sf_dir, con):
    rows = con.execute("SELECT o_totalprice FROM orders").fetchall()
    from collections import Counter

    digs = Counter(math.floor(v * 100.0 + 0.5) % 10 for (v,) in rows)
    n = sum(digs.values())
    c2 = sum(c * c for c in digs.values())
    chi2 = (10.0 * c2 - float(n) * n) / n
    mc = max(digs.values())
    md = min(d for d, c in digs.items() if c == mc)
    (row,) = run(spark, sf_dir, "dq_last_digit_heaping")
    assert row.n_orders == n and row.n_digits_seen == len(digs)
    assert row.chi2_uniform == pytest.approx(chi2, abs=2e-6)
    assert row.modal_digit == md and row.modal_count == mc
    assert row.modal_share_micro == _half_away(mc * 1000000, n)


def test_lorenz_asymmetry_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT o_custkey, SUM(CAST(floor(o_totalprice*100.0+0.5) AS BIGINT))"
        " FROM orders GROUP BY o_custkey"
    ).fetchall()
    xs = sorted(int(x) for _, x in rows)
    n = len(xs)
    s = sum(xs)
    below = [x for x in xs if x * n < s]
    m = len(below)
    lm = sum(below)
    xm = max(below)
    xm1 = min(x for x in xs if x * n >= s)
    delta = (s - n * xm) / (n * (xm1 - xm))
    sa = (m + delta) / n + (lm + delta * xm1) / s
    (row,) = run(spark, sf_dir, "agg_lorenz_asymmetry")
    assert row.n_customers == n and row.n_below_mean == m
    assert row.delta_interp == pytest.approx(delta, abs=2e-6)
    assert row.lorenz_asymmetry == pytest.approx(sa, abs=2e-6)
    # spend distributions are upper-tail heavy: S should exceed 1
    # only when giants drive it; assert internal consistency instead
    assert 0.0 < row.lorenz_asymmetry < 2.0


def test_ab_test_cuped_reference(spark, sf_dir, con):
    import hashlib

    rows = con.execute(
        "SELECT user_id, epoch_us(ts) // 86400000000,"
        " CAST(floor(CAST(value AS DOUBLE)*1000000.0+0.5) AS BIGINT)"
        " FROM events WHERE event_type='purchase'"
    ).fetchall()
    days = [d for _, d, _ in rows]
    tmid = (min(days) + max(days) + 1) // 2
    pu = {}
    for uid, d, q in rows:
        x, y = pu.get(uid, (0, 0))
        if d < tmid:
            x += q
        else:
            y += q
        pu[uid] = (x, y)
    n = len(pu)
    sx = sum(x for x, _ in pu.values())
    sy = sum(y for _, y in pu.values())
    sxx = sum(x * x for x, _ in pu.values())
    sxy = sum(x * y for x, y in pu.values())
    syy = sum(y * y for _, y in pu.values())
    arm_a = {
        u for u in pu
        if hashlib.md5(str(u).encode()).hexdigest()[0] in "01234567"
    }
    na = len(arm_a)
    sxa = sum(pu[u][0] for u in arm_a)
    sya = sum(pu[u][1] for u in arm_a)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rho2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    raw = (sya / na - (sy - sya) / (n - na)) / 1e6
    cuped = ((sya / na - (sy - sya) / (n - na))
             - theta * (sxa / na - (sx - sxa) / (n - na))) / 1e6
    (row,) = run(spark, sf_dir, "ab_test_cuped")
    assert row.n_users == n and row.n_arm_a == na
    assert row.theta == pytest.approx(theta, abs=2e-6)
    assert row.lift_raw_units == pytest.approx(raw, abs=2e-6)
    assert row.lift_cuped_units == pytest.approx(cuped, abs=2e-6)
    assert row.var_ratio == pytest.approx(1.0 - rho2, abs=2e-6)
    # CUPED must not inflate variance: rho2 in [0, 1]
    assert 0.0 <= row.var_ratio <= 1.0


# --------------------------------------------------------------- wave 13


def _knn_edges_and_vecs(spark, sf_dir):
    g = SPECS["embedding_hubness_audit"].fn.__globals__
    emb = g["load_fixture"](spark, sf_dir, "embeddings")
    edges = [(r["a"], r["b"]) for r in g["_knn_directed_top3"](emb).collect()]
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    return edges, vecs


def _cos(u, v):
    dot = 0.0
    for a, b in zip(u, v):
        dot = dot + a * b
    nu = 0.0
    for a in u:
        nu = nu + a * a
    nv = 0.0
    for b in v:
        nv = nv + b * b
    return dot / (math.sqrt(nu) * math.sqrt(nv))


def test_twonn_intrinsic_dim_reference(spark, sf_dir):
    edges, vecs = _knn_edges_and_vecs(spark, sf_dir)
    by_a = {}
    for a, b in edges:
        by_a.setdefault(a, []).append(b)
    qs = []
    used = 0
    for a, bs in by_a.items():
        scored = sorted(
            ((_cos(vecs[a], vecs[b]), b) for b in bs),
            key=lambda t: (-t[0], t[1]),
        )
        if len(scored) < 2:
            continue
        d1 = 1.0 - scored[0][0]
        d2 = 1.0 - scored[1][0]
        if d1 <= 0:
            continue
        used += 1
        qs.append(math.floor(math.log(d2 / d1) * 1e9 + 0.5))
    sq = sum(qs)
    (row,) = run(spark, sf_dir, "embedding_twonn_intrinsic_dim")
    assert row.n_vectors == len(vecs)
    assert row.n_used == used
    assert row.sum_log_ratio == pytest.approx(sq / 1e9, abs=2e-6)
    assert row.twonn_dim == pytest.approx(used / (sq / 1e9), abs=2e-4)
    # a 64-dim synthetic corpus should report a positive finite dim
    assert row.twonn_dim is not None and row.twonn_dim > 0


def test_neighbor_jaccard_reference(spark, sf_dir):
    edges, _ = _knn_edges_and_vecs(spark, sf_dir)
    und = {(min(a, b), max(a, b)) for a, b in edges}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    for a, b in und:
        c = len(adj[a] & adj[b])
        if c == 0:
            continue
        da, db = len(adj[a]), len(adj[b])
        jm = _half_away(c * 1000000, da + db - c)
        rows.append((jm, a, b, c, da, db))
    rows.sort(key=lambda t: (-t[0], t[1], t[2]))
    got = run(spark, sf_dir, "graph_neighbor_jaccard")
    assert len(got) == min(20, len(rows))
    for r, (jm, a, b, c, da, db) in zip(got, rows[:20]):
        assert (r.a, r.b, r.n_common, r.deg_a, r.deg_b, r.jaccard_micro) == (
            a, b, c, da, db, jm
        )


def test_coordinate_kurtosis_reference(spark, sf_dir, con):
    rows = con.execute("SELECT embedding FROM embeddings").fetchall()
    dims = {}
    for (v,) in rows:
        for i, x in enumerate(v, start=1):
            xd = float(x)
            q = (math.floor(xd * 1e6 + 0.5) if xd >= 0
                 else -math.floor(-xd * 1e6 + 0.5))
            dims.setdefault(i, []).append(q)
    got = {r.dim: r for r in run(spark, sf_dir, "embedding_coordinate_kurtosis")}
    assert set(got) == set(dims)
    for i, xs in dims.items():
        n = len(xs)
        s1, s2 = sum(xs), sum(x * x for x in xs)
        s3 = sum(x**3 for x in xs)
        s4 = sum(x**4 for x in xs)
        mu = s1 / n
        var = s2 / n - mu * mu
        m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu**3
        m4 = s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n) - 3 * mu**4
        row = got[i]
        assert row.n_vectors == n
        assert row.skewness == pytest.approx(m3 / var**1.5, abs=2e-5)
        assert row.excess_kurtosis == pytest.approx(m4 / var**2 - 3, abs=2e-5)


# --------------------------------------------------------------- wave 14


def test_moors_kurtosis_reference(spark, sf_dir, con):
    rows = con.execute("SELECT o_totalprice FROM orders ORDER BY 1").fetchall()
    xs = [v for (v,) in rows]
    n = len(xs)
    e = {k: xs[-(-k * n // 8) - 1] for k in range(1, 8)}  # ceil(kn/8), 1-idx
    t = ((e[7] - e[5]) + (e[3] - e[1])) / (e[6] - e[2])
    (row,) = run(spark, sf_dir, "agg_moors_kurtosis")
    assert row.n_orders == n
    for k in (1, 3, 5, 7):
        assert getattr(row, f"e{k}") == pytest.approx(e[k], abs=1e-6)
    assert row.moors_kurtosis == pytest.approx(t, abs=2e-6)


def test_markov_order_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, event_type FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    from collections import Counter, defaultdict

    seqs = defaultdict(list)
    for u, t in rows:
        seqs[u].append(t)
    bi, tri = Counter(), Counter()
    for s in seqs.values():
        for a, b in zip(s, s[1:]):
            bi[(a, b)] += 1
        for a, b, c in zip(s, s[1:], s[2:]):
            tri[(a, b, c)] += 1
    n2, n3 = sum(bi.values()), sum(tri.values())
    bim = Counter()
    for (a, _), c in bi.items():
        bim[a] += c
    trim = Counter()
    for (a, b, _), c in tri.items():
        trim[(a, b)] += c
    h9a = sum(
        math.floor(-(c / n2) * math.log(c / bim[a]) * 1e9 + 0.5)
        for (a, _), c in bi.items()
    )
    h9b = sum(
        math.floor(-(c / n3) * math.log(c / trim[(a, b)]) * 1e9 + 0.5)
        for (a, b, _), c in tri.items()
    )
    (row,) = run(spark, sf_dir, "events_markov_order_test")
    assert row.n_bigrams == n2 and row.n_trigrams == n3
    assert row.h_order1 == pytest.approx(h9a / 1e9, abs=2e-6)
    assert row.h_order2 == pytest.approx(h9b / 1e9, abs=2e-6)
    assert row.memory_gain == pytest.approx((h9a - h9b) / 1e9, abs=2e-6)
    # conditioning on more context can only reduce empirical entropy
    assert row.memory_gain >= -1e-9


def test_timestamp_heaping_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT (epoch_us(ts) // 60000000) % 60 FROM events"
    ).fetchall()
    from collections import Counter

    cnt = Counter(int(m) for (m,) in rows)
    n = sum(cnt.values())
    c2 = sum(c * c for c in cnt.values())
    chi2 = (60.0 * c2 - float(n) * n) / n
    mc = max(cnt.values())
    mm = min(m for m, c in cnt.items() if c == mc)
    (row,) = run(spark, sf_dir, "dq_timestamp_heaping")
    assert row.n_events == n and row.n_minutes_seen == len(cnt)
    assert row.chi2_uniform == pytest.approx(chi2, abs=2e-6)
    assert row.modal_minute == mm and row.modal_count == mc
    assert row.modal_share_micro == _half_away(mc * 1000000, n)


# --------------------------------------------------------------- wave 15


def test_gini_mean_difference_reference(spark, sf_dir, con):
    xs = sorted(_cust_spend(con))
    n = len(xs)
    s = sum(xs)
    num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
    gmd = 2.0 * num / (n * (n - 1.0)) / 100.0
    gini = num / ((n - 1.0) * s)
    # brute-force the pair identity on a prefix to pin the formula
    sub = xs[:200]
    brute = sum(abs(a - b) for i, a in enumerate(sub) for b in sub[i + 1:])
    ident = sum((2 * (i + 1) - len(sub) - 1) * x for i, x in enumerate(sub))
    assert brute == ident
    (row,) = run(spark, sf_dir, "agg_gini_mean_difference")
    assert row.n_customers == n
    assert row.gmd_units == pytest.approx(gmd, rel=1e-6)
    assert row.gini_from_gmd == pytest.approx(gini, abs=2e-6)
    # cross-construction identity: sample Gini = plug-in Gini * n/(n-1)
    (gc,) = run(spark, sf_dir, "agg_gini_concentration")
    assert row.gini_from_gmd == pytest.approx(
        gc.gini * n / (n - 1.0), abs=5e-4
    )


def test_pivot_points_reference(spark, sf_dir, con):
    bars = _user_bars(con)
    got = {r.user_id: r for r in run(spark, sf_dir, "window_pivot_points")}
    assert set(got) == set(bars)
    for uid, bs in bars.items():
        hb = max(bs)
        h, l, c = bs[hb]["h"], bs[hb]["l"], bs[hb]["c"]
        row = got[uid]
        assert row.n_bars == len(bs)
        assert (row.high_micro, row.low_micro, row.close_micro) == (h, l, c)
        assert row.pivot_x3 == h + l + c
        assert row.r1_x3 == 2 * (h + l + c) - 3 * l
        assert row.s1_x3 == 2 * (h + l + c) - 3 * h
        assert row.r2_x3 == (h + l + c) + 3 * (h - l)
        assert row.s2_x3 == (h + l + c) - 3 * (h - l)


def test_quartile_dispersion_reference(spark, sf_dir, con):
    rows = con.execute("SELECT o_totalprice FROM orders ORDER BY 1").fetchall()
    xs = [v for (v,) in rows]
    n = len(xs)
    q1 = xs[-(-n // 4) - 1]
    q3 = xs[-(-3 * n // 4) - 1]
    (row,) = run(spark, sf_dir, "agg_quartile_dispersion")
    assert row.n_orders == n
    assert row.q1 == pytest.approx(q1, abs=1e-6)
    assert row.q3 == pytest.approx(q3, abs=1e-6)
    assert row.quartile_dispersion == pytest.approx(
        (q3 - q1) / (q3 + q1), abs=2e-6
    )


# --------------------------------------------------------------- wave 16


def _cust_spend(con):
    rows = con.execute(
        "SELECT o_custkey, SUM(CAST(floor(o_totalprice*100.0+0.5) AS BIGINT))"
        " FROM orders GROUP BY o_custkey"
    ).fetchall()
    return [int(x) for _, x in rows]


def test_hoover_index_reference(spark, sf_dir, con):
    xs = _cust_spend(con)
    n, s = len(xs), sum(xs)
    ad = sum(abs(x * n - s) for x in xs)
    (row,) = run(spark, sf_dir, "agg_hoover_index")
    assert row.n_customers == n
    assert row.hoover_index == pytest.approx(ad / (2.0 * n * s), abs=2e-6)
    assert 0.0 <= row.hoover_index < 1.0


def test_effective_cardinality_reference(spark, sf_dir, con):
    xs = _cust_spend(con)
    n, s = len(xs), sum(xs)
    s2 = sum(x * x for x in xs)
    h9 = sum(
        0 if x == 0
        else math.floor(-(x / s) * math.log(x / s) * 1e9 + 0.5)
        for x in xs
    )
    (row,) = run(spark, sf_dir, "agg_effective_cardinality")
    assert row.hill_n0 == n
    assert row.hill_n1 == pytest.approx(math.exp(h9 / 1e9), rel=1e-6)
    assert row.hill_n2 == pytest.approx(s * s / s2, rel=1e-6)
    assert row.evenness == pytest.approx(h9 / 1e9 / math.log(n), abs=2e-6)
    # Hill ordering: N0 >= N1 >= N2 always
    assert row.hill_n0 >= row.hill_n1 >= row.hill_n2 > 0


def test_daily_load_factor_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT epoch_us(ts) // 86400000000, COUNT(*) FROM events GROUP BY 1"
    ).fetchall()
    cnt = {int(d): int(c) for d, c in rows}
    n, s = len(cnt), sum(cnt.values())
    mx, mn = max(cnt.values()), min(cnt.values())
    peak = min(d for d, c in cnt.items() if c == mx)
    (row,) = run(spark, sf_dir, "events_daily_load_factor")
    assert row.n_days == n and row.n_events == s
    assert row.peak_count == mx and row.trough_count == mn
    assert row.peak_epoch_day == peak
    assert row.peak_to_mean == pytest.approx(mx * n / s, abs=2e-6)
    assert row.peak_to_trough == pytest.approx(mx / mn, abs=2e-6)
