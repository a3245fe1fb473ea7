"""Targeted references for the round-8 operators: each new statistic or
pipeline audit is checked against an independent pure-Python
implementation on the small fixture (the DuckDB oracle equivalence is
separately swept by test_oracle_contract.py — these tests pin the MATH,
not the SQL)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from cdw_spark.catalog import load_fixture
from cdw_spark.registry import load_all

SPECS = load_all()


def test_cramers_v_matches_python(spark, sf_dir):
    row = SPECS["agg_cramers_v"].fn(spark, sf_dir).collect()[0]
    docs = load_fixture(spark, sf_dir, "documents").select("lang", "source").collect()
    cells = Counter((r["lang"], r["source"]) for r in docs)
    rt = Counter(r["lang"] for r in docs)
    ct = Counter(r["source"] for r in docs)
    n = len(docs)
    chi2 = sum(
        (o * n - rt[la] * ct[so]) ** 2 / (n * rt[la] * ct[so])
        for (la, so), o in cells.items()
    )
    v = math.sqrt(chi2 / (n * (min(len(rt), len(ct)) - 1)))
    assert row["n"] == n
    assert abs(row["chi2"] - chi2) < 1e-4
    assert abs(row["cramers_v"] - v) < 1e-5
    assert 0.0 <= row["cramers_v"] <= 1.0


def test_cohens_d_matches_python(spark, sf_dir):
    row = SPECS["agg_cohens_d"].fn(spark, sf_dir).collect()[0]
    o = (
        load_fixture(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    a = [round(r["o_totalprice"] * 100) for r in o if r["o_orderpriority"] == "1-URGENT"]
    b = [round(r["o_totalprice"] * 100) for r in o if r["o_orderpriority"] == "5-LOW"]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    ss = sum((x - ma) ** 2 for x in a) + sum((x - mb) ** 2 for x in b)
    pooled = math.sqrt(ss / (len(a) + len(b) - 2))
    assert row["n_urgent"] == len(a) and row["n_low"] == len(b)
    assert abs(row["cohens_d"] - (ma - mb) / pooled) < 1e-4


def test_mcc_matches_python(spark, sf_dir):
    from cdw_spark.functions.text import LANG_MARKERS

    row = SPECS["eval_mcc_binary"].fn(spark, sf_dir).collect()[0]
    docs = load_fixture(spark, sf_dir, "documents").select("text", "lang").collect()

    def guess(text):
        words = [w for w in text.lower().strip().split() if w]
        scores = {
            lang: sum(1 for w in words if w in set(markers))
            for lang, markers in LANG_MARKERS.items()
        }
        best = max(scores.values())
        if best == 0:
            return "und"
        return min(l for l, s in scores.items() if s == best)

    tp = tn = fp = fn = 0
    for r in docs:
        y = r["lang"] == "en"
        yh = guess(r["text"]) == "en"
        tp += y and yh
        tn += (not y) and (not yh)
        fp += (not y) and yh
        fn += y and (not yh)
    assert (row["tp"], row["tn"], row["fp"], row["fn"]) == (tp, tn, fp, fn)
    den = math.sqrt(tp + fp) * math.sqrt(tp + fn) * math.sqrt(tn + fp) * math.sqrt(tn + fn)
    assert abs(row["mcc"] - (tp * tn - fp * fn) / den) < 1e-5


def _purchase_series(spark, sf_dir):
    ev = (
        load_fixture(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("value") > 0))
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    series = defaultdict(list)
    for r in ev:
        series[r["user_id"]].append((r["ts"], r["event_id"], r["value"]))
    for u in series:
        series[u].sort(key=lambda t: (t[0], t[1]))
    return series


def test_ewma_signal_matches_python(spark, sf_dir):
    rows = {
        (r["user_id"], r["event_id"]): r
        for r in SPECS["timeseries_ewma_signal"].fn(spark, sf_dir).collect()
    }
    series = _purchase_series(spark, sf_dir)
    checked = 0
    for u, pts in series.items():
        qs = [math.floor(v * 1e6 + 0.5) for _, _, v in pts]
        for i in range(7, len(qs)):
            last8 = qs[i - 7 : i + 1]  # oldest..current
            num = sum(q * (1 << k) for k, q in enumerate(last8))
            ssum = sum(last8)
            r = rows[(u, pts[i][1])]
            assert r["ewma_micro"] == (2 * num + 255) // 510
            assert r["sma_micro"] == (2 * ssum + 8) // 16
            assert r["above_sma"] == int(8 * num > 255 * ssum)
            checked += 1
    assert checked == len(rows) and checked > 50


def test_max_drawdown_matches_python(spark, sf_dir):
    rows = {
        r["user_id"]: r
        for r in SPECS["window_max_drawdown"].fn(spark, sf_dir).collect()
    }
    series = _purchase_series(spark, sf_dir)
    assert set(rows) == set(series)
    for u, pts in series.items():
        peak, best, best_ev = 0, -1, None
        for _, eid, v in pts:
            q = math.floor(v * 1e6 + 0.5)
            peak = max(peak, q)
            dd = (2 * (peak - q) * 1000000 + peak) // (2 * peak)
            if dd > best:
                best, best_ev = dd, eid
        r = rows[u]
        assert r["n_points"] == len(pts)
        assert r["max_dd_micro"] == best
        assert r["at_event"] == best_ev


def test_seasonal_strength_bounds_and_reference(spark, sf_dir):
    rows = SPECS["timeseries_seasonal_strength"].fn(spark, sf_dir).collect()
    assert rows, "fixture must have users with >= 14 purchases"
    series = _purchase_series(spark, sf_dir)
    got = {r["user_id"]: r for r in rows}
    for u, r in got.items():
        assert 0.0 <= r["seasonal_strength"] <= 1.0
        assert r["n_events"] == len(series[u]) >= 14
    # python reference on the largest user (dow labels arbitrary but
    # consistent: use the ts date's weekday)
    u = max(got, key=lambda u: got[u]["n_events"])
    pts = series[u]
    qs = [(t.weekday(), math.floor(v * 1e6 + 0.5)) for t, _, v in pts]
    n = len(qs)
    s = sum(q for _, q in qs)
    qq = sum(q * q for _, q in qs)
    bydow = defaultdict(list)
    for d, q in qs:
        bydow[d].append(q)
    sd2 = sum(
        round(sum(v) * float(sum(v)) / len(v), 6) for v in bydow.values()
    )
    expect = max(0.0, 1.0 - (qq - sd2) / (qq - s * float(s) / n))
    assert abs(got[u]["seasonal_strength"] - expect) < 1e-5


def test_funnel_conversion_matches_python(spark, sf_dir):
    row = SPECS["events_funnel_conversion"].fn(spark, sf_dir).collect()[0]
    ev = load_fixture(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["event_type"], r["ts"]))
    nv = nc = np_ = 0
    for _, evs in by_user.items():
        views = [t for e, t in evs if e == "view"]
        if not views:
            continue
        nv += 1
        t1 = min(views)
        clicks = [t for e, t in evs if e == "click" and t > t1]
        if not clicks:
            continue
        nc += 1
        t2 = min(clicks)
        if any(e == "purchase" and t > t2 for e, t in evs):
            np_ += 1
    assert (row["n_view"], row["n_click_after"], row["n_purchase_after"]) == (
        nv, nc, np_,
    )
    assert row["view_to_click"] == (2 * nc * 1000000 + nv) // (2 * nv) / 1e6


def test_novelty_decay_matches_python(spark, sf_dir):
    rows = {
        r["doc_id"]: r for r in SPECS["text_novelty_decay"].fn(spark, sf_dir).collect()
    }
    docs = load_fixture(spark, sf_dir, "documents").select("doc_id", "text").collect()

    def shingles(text):
        ws = [w for w in text.lower().strip().split() if w]
        if len(ws) >= 3:
            return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        return {" ".join(ws)}

    first = {}
    for r in sorted(docs, key=lambda r: r["doc_id"]):
        for sh in shingles(r["text"]):
            first.setdefault(sh, r["doc_id"])
    for r in docs:
        shs = shingles(r["text"])
        novel = sum(1 for sh in shs if first[sh] == r["doc_id"])
        got = rows[r["doc_id"]]
        assert got["n_shingles"] == len(shs)
        assert got["n_novel"] == novel
    # the minimum doc_id sees an entirely novel corpus
    first_doc = min(rows)
    assert rows[first_doc]["novelty"] == 1.0
    # novelty must decay on average: the last decile is less novel than
    # the first (the curve the operator exists to expose)
    ordered = [rows[k]["novelty"] for k in sorted(rows)]
    k = len(ordered) // 10
    assert sum(ordered[:k]) / k > sum(ordered[-k:]) / k


def test_split_doc_boundary_pairs_are_real(spark, sf_dir):
    rows = SPECS["dedup_split_doc_boundary"].fn(spark, sf_dir).collect()
    assert rows, "fixture must contain boundary-overlapping docs"
    docs = {
        r["doc_id"]: [w for w in r["text"].lower().strip().split() if w]
        for r in load_fixture(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    for r in rows:
        a, b = docs[r["first_part"]], docs[r["second_part"]]
        assert len(a) >= 6 and len(b) >= 6
        assert " ".join(a[-3:]) == " ".join(b[:3]) == r["boundary_shingle"]


def test_basket_pair_lift_matches_python(spark, sf_dir):
    rows = SPECS["basket_pair_lift"].fn(spark, sf_dir).collect()
    li = load_fixture(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    n = len(baskets)
    pc = Counter(p for ps in baskets.values() for p in ps)
    cab = Counter()
    for ps in baskets.values():
        sp = sorted(ps)
        for i in range(len(sp)):
            for j in range(i + 1, len(sp)):
                cab[(sp[i], sp[j])] += 1
    expect = {k: v for k, v in cab.items() if v >= 2}
    got = {(r["part_a"], r["part_b"]): r for r in rows}
    assert set(got) == set(expect)
    for (a, b), r in got.items():
        assert r["n_both"] == expect[(a, b)]
        assert r["n_a"] == pc[a] and r["n_b"] == pc[b]
        lift = (2 * expect[(a, b)] * n * 1000000 + pc[a] * pc[b]) // (
            2 * pc[a] * pc[b]
        )
        assert r["lift"] == lift / 1e6


def test_padding_waste_matches_python(spark, sf_dir):
    rows = {r["bucket"]: r for r in SPECS["batch_padding_waste"].fn(spark, sf_dir).collect()}
    asg = SPECS["batch_by_length"].fn(spark, sf_dir).collect()
    per_batch = defaultdict(list)
    for r in asg:
        per_batch[(r["bucket"], r["batch_id"])].append(r["n_tokens"])
    pad = defaultdict(int)
    payload = defaultdict(int)
    padded = defaultdict(int)
    nb = defaultdict(int)
    for (bk, _), toks in per_batch.items():
        pad[bk] += max(toks) * len(toks) - sum(toks)
        payload[bk] += sum(toks)
        padded[bk] += max(toks) * len(toks)
        nb[bk] += 1
    assert set(rows) == set(nb)
    for bk, r in rows.items():
        assert r["n_batches"] == nb[bk]
        assert r["padding_tokens"] == pad[bk]
        assert r["payload_tokens"] == payload[bk]
        assert 0.0 <= r["waste_ratio"] < 1.0


def test_whitening_digest_invariants(spark, sf_dir):
    rows = SPECS["embedding_whitening_digest"].fn(spark, sf_dir).collect()
    n = load_fixture(spark, sf_dir, "embeddings").count()
    assert len(rows) == n
    # per-dim z-scores sum to 0 by construction; the micro-quantized
    # per-vector sums must cancel to within one rounding step per cell
    total = sum(r["z_sum_micro"] for r in rows)
    assert abs(total) < 64 * n


def test_exact_delay_quantiles_match_python(spark, sf_dir):
    rows = {
        r["flag"]: r
        for r in SPECS["agg_exact_delay_quantiles"].fn(spark, sf_dir).collect()
    }
    li = load_fixture(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    ).collect()
    od = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in load_fixture(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate"
        ).collect()
    }
    by_flag = defaultdict(list)
    for r in li:
        d = (r["l_shipdate"].date() - od[r["l_orderkey"]].date()).days
        by_flag[r["l_returnflag"]].append(d)
    assert set(rows) == set(by_flag)
    for flag, ds in by_flag.items():
        ds.sort()
        n = len(ds)
        got = rows[flag]
        assert got["n"] == n
        assert got["p50"] == ds[(n + 1) // 2 - 1]
        assert got["p90"] == ds[(9 * n + 9) // 10 - 1]
        assert got["p99"] == ds[(99 * n + 99) // 100 - 1]


def test_calibration_ece_matches_python(spark, sf_dir):
    from cdw_spark.functions.text import STOPWORDS

    rows = {
        r["bin"]: r for r in SPECS["eval_calibration_ece"].fn(spark, sf_dir).collect()
    }
    docs = load_fixture(spark, sf_dir, "documents").select("text", "lang").collect()
    stop = set(STOPWORDS)
    bins = defaultdict(lambda: [0, 0, 0])  # n, sum_q, pos
    for r in docs:
        text = r["text"]
        ws = [w for w in text.lower().strip().split() if w]
        toks = float(len(ws))
        pr = (
            sum(1 for ch in text if ch in ".,!?;:") / len(text) if text else 0.0
        )
        sr = (sum(1 for w in ws if w in stop) / toks) if ws else 0.0
        s = round(0.4 * min(toks / 100.0, 1.0) + 0.3 * (1.0 - pr) + 0.3 * sr, 6)
        q = math.floor(s * 1e6 + 0.5)
        b = min(q // 100000, 9)
        cell = bins[b]
        cell[0] += 1
        cell[1] += q
        cell[2] += r["lang"] == "en"
    assert set(rows) == set(bins)
    tot_n = sum(c[0] for c in bins.values())
    gap_sum = 0
    for b, (n, sq, pos) in bins.items():
        conf = (2 * sq + n) // (2 * n)
        acc = (2 * pos * 1000000 + n) // (2 * n)
        assert rows[b]["n"] == n and rows[b]["pos"] == pos
        assert rows[b]["conf_micro"] == conf
        assert rows[b]["acc_micro"] == acc
        gap_sum += n * abs(acc - conf)
    ece = (2 * gap_sum + tot_n) // (2 * tot_n)
    for r in rows.values():
        assert r["ece_micro"] == ece


def test_kendall_tau_matches_bruteforce_at_sf0001(spark):
    """Brute-force O(n^2) tau-b on the 600-row sf0.001 fixture — an
    implementation-independent check of the dominance-counting pipeline
    (concordant/discordant/tie arithmetic and the tau-b normalization)."""
    sf = "/root/testdata/sf0.001"
    rows = {r["flag"]: r for r in SPECS["agg_kendall_tau"].fn(spark, sf).collect()}
    li = load_fixture(spark, sf, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    by_flag = defaultdict(list)
    for r in li:
        by_flag[r["l_returnflag"]].append(
            (int(r["l_quantity"]), round(r["l_extendedprice"] * 100))
        )
    assert set(rows) == set(by_flag)
    for flag, pts in by_flag.items():
        n = len(pts)
        conc = disc = tx = ty = 0
        for i in range(n):
            for j in range(i + 1, n):
                (q1, p1), (q2, p2) = pts[i], pts[j]
                if q1 == q2:
                    tx += 1
                    continue
                if p1 == p2:
                    ty += 1
                    continue
                if (q1 < q2) == (p1 < p2):
                    conc += 1
                else:
                    disc += 1
        got = rows[flag]
        assert got["n"] == n
        assert got["concordant"] == conc
        assert got["discordant"] == disc
        n0 = n * (n - 1) // 2
        n1 = sum(
            c * (c - 1) // 2 for c in Counter(q for q, _ in pts).values()
        )
        n2 = sum(
            c * (c - 1) // 2 for c in Counter(p for _, p in pts).values()
        )
        tau = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
        assert abs(got["tau_b"] - tau) < 1e-5
