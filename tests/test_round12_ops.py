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
