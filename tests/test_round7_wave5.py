"""Independent pure-Python references for the round-7 fifth wave
(Welch t-test, two-pass heavy hitters, Nelson-Aalen hazard, LPM lookup,
Holt linear smoothing) — pinning the MATH; oracle SQL equivalence is
swept separately by test_oracle_contract.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cdw_spark.catalog import load_fixture
from cdw_spark.registry import load_all

SPECS = load_all()


def test_welch_ttest_matches_python(spark, sf_dir):
    row = SPECS["agg_welch_ttest"].fn(spark, sf_dir).collect()[0]
    orders = load_fixture(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    a = [round(float(r["o_totalprice"]) * 100) for r in orders
         if r["o_orderpriority"] == "1-URGENT"]
    b = [round(float(r["o_totalprice"]) * 100) for r in orders
         if r["o_orderpriority"] == "5-LOW"]
    n1, n2 = len(a), len(b)
    m1, m2 = sum(a) / n1, sum(b) / n2
    v1 = (sum(x * x for x in a) - sum(a) / n1 * sum(a)) / (n1 - 1)
    v2 = (sum(x * x for x in b) - sum(b) / n2 * sum(b)) / (n2 - 1)
    t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    df = (v1 / n1 + v2 / n2) ** 2 / (
        (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
    )
    assert (row["n_urgent"], row["n_low"]) == (n1, n2)
    assert abs(row["mean_urgent"] - m1 / 100.0) < 1e-4
    assert abs(row["t_stat"] - t) < 1e-4
    assert abs(row["welch_df"] - df) < 1e-1


def test_heavy_hitters_exactness_and_candidate_bound(spark, sf_dir):
    rows = SPECS["agg_heavy_hitters_two_pass"].fn(spark, sf_dir).collect()
    ev = load_fixture(spark, sf_dir, "events").select("user_id").collect()
    counts = {}
    for r in ev:
        k = math.isqrt(r["user_id"])
        counts[k] = counts.get(k, 0) + 1
    total = sum(counts.values())
    truth = {k: c for k, c in counts.items() if c * 20 > total}
    got = {r["item"]: r["n_item"] for r in rows}
    assert got == truth
    assert all(r["n_total"] == total for r in rows)
    assert truth, "fixture must produce at least one heavy hitter"


def test_misra_gries_guarantee_under_decrement():
    """Force the batched-decrement path with k far below the domain and
    check the MG superset guarantee: any item with freq > n/(k+1)
    survives (uniform noise + a few planted heavies)."""
    k = 8
    stream = []
    for i in range(1000):
        stream.append(i % 100)          # uniform noise, 10 each
    stream += [777] * 300 + [888] * 200  # planted heavies
    counters = {}
    # replicate the operator's batched reduction over chunks
    for start in range(0, len(stream), 97):
        chunk = stream[start : start + 97]
        for w in chunk:
            counters[w] = counters.get(w, 0) + 1
        if len(counters) > k:
            vals = sorted(counters.values())
            t = vals[len(counters) - k - 1]
            counters = {w: c - t for w, c in counters.items() if c > t}
    n = len(stream)
    for item, freq in ((777, 300), (888, 200)):
        assert freq > n / (k + 1)
        assert item in counters, f"MG dropped a guaranteed heavy hitter {item}"
    assert len(counters) <= k


def test_nelson_aalen_matches_python(spark, sf_dir):
    rows = {
        r["duration_days"]: r
        for r in SPECS["survival_nelson_aalen"].fn(spark, sf_dir).collect()
    }
    ev = load_fixture(spark, sf_dir, "events").select("user_id", "ts").collect()
    span = {}
    for r in ev:
        s = int(r["ts"].timestamp())
        lo, hi = span.get(r["user_id"], (s, s))
        span[r["user_id"]] = (min(lo, s), max(hi, s))
    gmax = max(hi for _, hi in span.values())
    durs = {}
    for lo, hi in span.values():
        d = (hi - lo) // 86400
        evn = 1 if gmax - hi > 86400 else 0
        c, e = durs.get(d, (0, 0))
        durs[d] = (c + 1, e + evn)
    total = sum(c for c, _ in durs.values())
    seen, cum = 0, 0.0
    for d in sorted(durs):
        c_all, dd = durs[d]
        n_risk = total - seen
        seen += c_all
        if dd == 0:
            continue
        cum += dd / n_risk
        r = rows[d]
        assert r["n_at_risk"] == n_risk and r["n_events"] == dd
        assert abs(r["cum_hazard"] - cum) < 1e-6
    assert set(rows) == {d for d in durs if durs[d][1] > 0}
    assert rows, "fixture must produce at least one uncensored event time"


def test_longest_prefix_match_matches_python(spark, sf_dir):
    rows = SPECS["lookup_longest_prefix"].fn(spark, sf_dir).collect()
    orders = load_fixture(spark, sf_dir, "orders").select("o_orderkey").collect()
    dim = {(p, 4) for p in range(16)}
    dim |= {(p, 8) for p in range(256) if p % 3 == 0}
    dim |= {(p, 12) for p in range(4096) if p % 7 == 0}
    expect = {}
    for r in orders:
        addr = r["o_orderkey"] % 65536
        best = None
        for w, div in ((4, 4096), (8, 256), (12, 16)):
            if (addr // div, w) in dim:
                best = (w, addr // div)
        expect[r["o_orderkey"]] = best
    got = {r["order_key"]: (r["matched_bits"], r["route_pfx"]) for r in rows}
    assert got == expect
    assert any(w == 12 for w, _ in got.values())
    assert any(w == 4 for w, _ in got.values())


def test_holt_linear_matches_python(spark, sf_dir):
    rows = {
        r["user_id"]: r
        for r in SPECS["timeseries_holt_linear"].fn(spark, sf_dir).collect()
    }
    ev = load_fixture(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", "event_id", "value").collect()
    from decimal import ROUND_HALF_UP, Decimal

    def cents(v):
        # Spark round(double, 0): shortest decimal repr, HALF_UP —
        # python round() is half-even and would diverge on exact .5
        x = float(v) * 100
        return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))

    series = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        series.setdefault(r["user_id"], []).append(cents(r["value"]))

    def half(a):
        return a // 2 if a >= 0 else -((-a) // 2)

    for uid, xs in series.items():
        xs = xs[:16]
        lv, b = xs[0], 0
        for x in xs[1:]:
            l1 = half(x + lv + b)
            b = half((l1 - lv) + b)
            lv = l1
        r = rows[uid]
        assert r["n_points"] == len(xs)
        assert (r["level_cents"], r["trend_cents"]) == (lv, b)
        assert abs(r["forecast_next"] - (lv + b) / 100.0) < 1e-9
    assert set(rows) == set(series)


def test_round7_time_ops_non_utc_session_parity(spark, sf_dir):
    """survival_nelson_aalen derives lifetimes from ts epoch-second
    longs and its censor horizon from a global max; timeseries_holt_
    linear ranks purchases by unix_micros before Python sees data.
    Both must match their oracles under a non-UTC session timezone
    (the round-5 sessionizer lesson, probed per round for every new
    timestamp-reading operator)."""
    from cdw_spark.compare import compare_frames

    s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        for name in ("survival_nelson_aalen", "timeseries_holt_linear"):
            spec = SPECS[name]
            res = compare_frames(name, spec.fn(s2, sf_dir), spec.oracle, sf_dir)
            assert res.ok, f"{name}: {res}"
    finally:
        s2.conf.unset("spark.sql.session.timeZone")
