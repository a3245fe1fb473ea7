"""Python-reference tests for the round-11 operator waves.

Each test recomputes the statistic independently (plain Python over the
parquet fixture, no Spark, no shared code with the operator) and
compares against the registered query's output — the oracle proves
Spark == DuckDB; these prove both == the textbook definition.
"""

from __future__ import annotations

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


# ---------------------------------------------------------------- wave 1


def test_components_materialize_reference(spark, sf_dir, con):
    """The artifact shape stats must equal an independent union-find
    closure over the exact 0.6-Jaccard pair set (pure-Python shingles +
    all-pairs Jaccard — no Spark, no recursive CTE)."""
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    sh = {}
    for doc_id, text in rows:
        ws = text.strip().lower().split()
        grams = (
            {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
            if len(ws) >= 3
            else {" ".join(ws)}
        )
        sh[doc_id] = grams
    ids = sorted(sh)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    members = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.6:
                members.add(a)
                members.add(b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {d: find(d) for d in members}
    sizes = {}
    for r in comp.values():
        sizes[r] = sizes.get(r, 0) + 1
    (row,) = run(spark, sf_dir, "dedup_components_materialize")
    assert row["n_member_docs"] == len(comp)
    assert row["n_components"] == len(sizes)
    assert row["max_cluster_size"] == max(sizes.values())
    assert row["sum_member_ids"] == sum(comp)
    assert row["sum_component_labels"] == sum(comp.values())


# ---------------------------------------------------------------- wave 2


def test_mcnemar_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT user_id, event_type, epoch_us(ts) FROM events"
    ).fetchall()
    lo = min(us for _, _, us in rows)
    hi = max(us for _, _, us in rows)
    mid = lo + (hi - lo) // 2
    users = {u for u, _, _ in rows}
    h1, h2 = set(), set()
    for u, et, us in rows:
        if et == "purchase":
            (h1 if us < mid else h2).add(u)
    b = len(h1 - h2)
    c = len(h2 - h1)
    (row,) = run(spark, sf_dir, "agg_mcnemar_paired")
    assert row["n_users"] == len(users)
    assert row["n_both"] == len(h1 & h2)
    assert row["n_first_only"] == b
    assert row["n_second_only"] == c
    assert row["n_neither"] == len(users) - len(h1 | h2)
    if b + c:
        assert row["mcnemar_chi2_micro"] == _half_away(
            (b - c) ** 2 * 1000000, b + c
        )
        cc = max(abs(b - c) - 1, 0)
        assert row["mcnemar_cc_chi2_micro"] == _half_away(
            cc * cc * 1000000, b + c
        )
    else:
        assert row["mcnemar_chi2_micro"] is None


def test_stochastic_oscillator_reference(spark, sf_dir, con):
    import math

    rows = con.execute(
        "SELECT user_id, epoch_us(ts), value FROM events"
        " WHERE event_type = 'purchase' ORDER BY user_id, 2"
    ).fetchall()
    bars = {}
    for u, us, v in rows:
        q = math.floor(v * 1000000.0 + 0.5)
        hb = us // 21600000000
        b = bars.setdefault((u, hb), {"h": q, "l": q, "c": q, "cts": us})
        b["h"] = max(b["h"], q)
        b["l"] = min(b["l"], q)
        if us >= b["cts"]:
            b["cts"], b["c"] = us, q
    per_user = {}
    for (u, hb), b in sorted(bars.items()):
        per_user.setdefault(u, []).append(b)
    expect = {}
    for u, seq in per_user.items():
        ks = []
        for i in range(3, len(seq)):
            win = seq[i - 3 : i + 1]
            hh = max(b["h"] for b in win)
            ll = min(b["l"] for b in win)
            if hh > ll:
                ks.append(_half_away((seq[i]["c"] - ll) * 1000000, hh - ll))
        if ks:
            expect[u] = (
                len(ks),
                _half_away(sum(ks), len(ks)),
                sum(1 for k in ks if k >= 800000),
                sum(1 for k in ks if k <= 200000),
            )
    out = {r["user_id"]: r for r in run(spark, sf_dir, "window_stochastic_oscillator")}
    assert set(out) == set(expect)
    for u, (n, mean_k, nob, nos) in expect.items():
        r = out[u]
        assert r["n_evaluated"] == n
        assert r["mean_k_micro"] == mean_k
        assert r["n_overbought"] == nob
        assert r["n_oversold"] == nos


def test_popularity_baseline_reference(spark, sf_dir, con):
    rows = con.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    baskets = {}
    for ok, item in rows:
        baskets.setdefault(ok, set()).add(item)
    kept = {ok: s for ok, s in baskets.items() if 2 <= len(s) <= 32}
    freq = {}
    for s in kept.values():
        for it in s:
            freq[it] = freq.get(it, 0) + 1
    top3 = {
        it for it, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    }
    holds = {ok: max(s) for ok, s in kept.items()}
    hits = sum(1 for h in holds.values() if h in top3)
    (row,) = run(spark, sf_dir, "recs_popularity_baseline_eval")
    assert row["n_baskets"] == len(holds)
    assert row["n_hits"] == hits
    assert row["hit_rate_micro"] == _half_away(hits * 1000000, len(holds))
    # the whole point of the baseline: it is directly comparable to the
    # CF eval — same basket population, same holdout rule
    (cf,) = run(spark, sf_dir, "recs_basket_holdout_eval")
    assert cf["n_baskets"] == row["n_baskets"]


# ---------------------------------------------------------------- wave 3


def _blocks_by_doc(con):
    rows = con.execute("SELECT doc_id, source, text FROM documents").fetchall()
    out = []
    for doc_id, source, text in rows:
        ws = text.strip().lower().split()
        n = (len(ws) + 7) // 8
        for j in range(n):
            out.append((doc_id, source, " ".join(ws[j * 8 : j * 8 + 8])))
    return out


def test_source_boilerplate_reference(spark, sf_dir, con):
    blocks = _blocks_by_doc(con)
    per_src = {}
    docs_per_block = {}
    for doc_id, src, b in blocks:
        per_src.setdefault(src, []).append(b)
        docs_per_block.setdefault((src, b), set()).add(doc_id)
    out = {r["source"]: r for r in run(spark, sf_dir, "text_source_boilerplate_share")}
    assert set(out) == set(per_src)
    for src, bl in per_src.items():
        bp = sum(1 for b in bl if len(docs_per_block[(src, b)]) >= 2)
        r = out[src]
        assert r["n_blocks"] == len(bl)
        assert r["n_distinct_blocks"] == len(set(bl))
        assert r["n_boilerplate_instances"] == bp
        assert r["boilerplate_share_micro"] == _half_away(bp * 1000000, len(bl))
    # the fixture has real signal somewhere (else the op proves nothing)
    assert any(r["n_boilerplate_instances"] > 0 for r in out.values())


def test_cross_source_contamination_reference(spark, sf_dir, con):
    blocks = _blocks_by_doc(con)
    per_src = {}
    for _, src, b in blocks:
        per_src.setdefault(src, set()).add(b)
    srcs = sorted(per_src)
    expect = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = len(per_src[a] & per_src[b])
            if shared:
                expect[(a, b)] = shared
    out = {
        (r["src_a"], r["src_b"]): r
        for r in run(spark, sf_dir, "text_cross_source_contamination")
    }
    assert set(out) == set(expect)
    for (a, b), shared in expect.items():
        r = out[(a, b)]
        na, nb = len(per_src[a]), len(per_src[b])
        assert r["n_shared"] == shared
        assert r["containment_micro"] == _half_away(shared * 1000000, min(na, nb))
        assert r["jaccard_micro"] == _half_away(shared * 1000000, na + nb - shared)
    assert expect, "fixture has no cross-source shared blocks"


def test_uniqueness_profile_reference(spark, sf_dir, con):
    e = con.execute(
        "SELECT event_id, user_id, epoch_us(ts) FROM events"
    ).fetchall()
    li = con.execute(
        "SELECT l_orderkey, l_linenumber FROM lineitem"
    ).fetchall()
    o = con.execute("SELECT o_orderkey FROM orders").fetchall()
    expect = {
        "events.event_id": (len(e), len({r[0] for r in e})),
        "events.user_id+ts": (len(e), len({(r[1], r[2]) for r in e})),
        "lineitem.orderkey+linenumber": (len(li), len(set(li))),
        "orders.o_orderkey": (len(o), len({r[0] for r in o})),
    }
    out = {r["key_name"]: r for r in run(spark, sf_dir, "dq_uniqueness_profile")}
    assert set(out) == set(expect)
    for k, (n, nd) in expect.items():
        r = out[k]
        assert r["n_rows"] == n
        assert r["n_distinct"] == nd
        assert r["n_dup_rows"] == n - nd
        assert r["uniqueness_micro"] == _half_away(nd * 1000000, n)


# ---------------------------------------------------------------- wave 4


def test_cochran_q_reference(spark, sf_dir, con):
    rows = con.execute("SELECT DISTINCT user_id, event_type FROM events").fetchall()
    types = ("click", "view", "purchase", "signup", "error")
    by_user = {}
    for u, t in rows:
        by_user.setdefault(u, set()).add(t)
    k = 5
    cj = {t: sum(1 for s in by_user.values() if t in s) for t in types}
    sr = sum(len(s) for s in by_user.values())
    srr = sum(len(s) ** 2 for s in by_user.values())
    num = (k - 1) * (k * sum(c * c for c in cj.values()) - sr * sr)
    den = k * sr - srr
    (row,) = run(spark, sf_dir, "agg_cochran_q")
    assert row["n_users"] == len(by_user)
    for t in types:
        assert row[f"c_{t}"] == cj[t]
    assert row["dof"] == 4
    if den:
        assert row["q_stat_micro"] == _half_away(num * 1000000, den)
    else:
        assert row["q_stat_micro"] is None
    # textbook sanity: Q is non-negative and zero iff all C_j equal
    assert num >= 0


def test_poisson_bootstrap_reference(spark, sf_dir, con):
    import math

    rows = con.execute("SELECT doc_id, n_chars FROM documents").fetchall()
    T = (790015084, 1580030168, 1975037710, 2106706891)

    def weight(doc_id, rep):
        u = ((doc_id * 32 + rep) * 2862933555777941757 + 3037000493) % (1 << 64)
        u31 = u % (1 << 31)
        for w, t in enumerate(T):
            if u31 < t:
                return w
        return 4

    means = []
    for rep in range(32):
        sw = swy = 0
        for doc_id, y in rows:
            w = weight(doc_id, rep)
            sw += w
            swy += w * y
        assert sw > 0
        means.append((2 * swy * 1000000 + sw) // (2 * sw))
    b = len(means)
    smm = sum(m * m for m in means)
    sm = sum(means)
    se = math.sqrt((b * smm - sm * sm) / (b * (b - 1)))
    n = len(rows)
    sy = sum(y for _, y in rows)
    (row,) = run(spark, sf_dir, "sample_poisson_bootstrap")
    assert row["n_docs"] == n
    assert row["n_replicates"] == 32
    assert row["mean_chars_micro"] == _half_away(sy * 1000000, n)
    assert abs(row["boot_se_micro"] - round(se, 6)) < 1e-9
    # the weights really are Poisson(1)-ish: mean weight near 1
    total_w = sum(weight(d, r) for d, _ in rows for r in range(4))
    assert 0.8 < total_w / (4 * n) < 1.2


def test_style_divergence_reference(spark, sf_dir, con):
    import math

    rows = con.execute("SELECT source, lower(trim(text)) FROM documents").fetchall()
    cp = {}
    cq = {}
    np_ = {}
    for src, s in rows:
        for i in range(len(s) - 1):
            g = s[i : i + 2]
            cp[(src, g)] = cp.get((src, g), 0) + 1
            cq[g] = cq.get(g, 0) + 1
            np_[src] = np_.get(src, 0) + 1
    nq = sum(cq.values())
    expect = {}
    for src in np_:
        sp = sq = 0.0
        npv = np_[src]
        for g, cqv in cq.items():
            cpv = cp.get((src, g), 0)
            if cpv > 0:
                sp += round(
                    (cpv / npv) * math.log(2.0 * cpv * nq / (cpv * nq + cqv * npv)),
                    9,
                )
            sq += round(
                (cqv / nq) * math.log(2.0 * cqv * npv / (cqv * npv + cpv * nq)), 9
            )
        expect[src] = round((sp + sq) * 0.5 / 0.6931471805599453, 6)
    out = {r["source"]: r for r in run(spark, sf_dir, "text_source_style_divergence")}
    assert set(out) == set(expect)
    for src, jsd in expect.items():
        assert abs(out[src]["jsd_vs_corpus"] - jsd) < 2e-6, (src, jsd)
        assert out[src]["n_bigrams"] == np_[src]
        assert 0.0 <= out[src]["jsd_vs_corpus"] <= 1.0  # JS in bits is [0,1]


# ---------------------------------------------------------------- wave 5


def test_jarque_bera_reference(spark, sf_dir, con):
    import math

    vals = [
        math.floor(v * 1000000.0 + 0.5)
        for (v,) in con.execute(
            "SELECT value FROM events WHERE event_type = 'purchase'"
        ).fetchall()
    ]
    n = len(vals)
    mu = (2 * sum(vals) + n) // (2 * n)
    s2 = sum((q - mu) ** 2 for q in vals)
    s3 = sum((q - mu) ** 3 for q in vals)
    s4 = sum((q - mu) ** 4 for q in vals)
    skew = (s3 / n) / (s2 / n) ** 1.5
    kurt = (s4 / n) / (s2 / n) ** 2 - 3.0
    jb = n * (skew**2 / 6.0 + kurt**2 / 24.0)
    (row,) = run(spark, sf_dir, "agg_jarque_bera")
    assert row["n_obs"] == n
    assert row["mean_micro"] == mu
    assert abs(row["skewness"] - skew) < 1e-5
    assert abs(row["excess_kurtosis"] - kurt) < 1e-5
    assert abs(row["jb_stat"] - jb) < 1e-4
    assert row["reject_05"] == (round(jb, 6) > 5.991465)


def test_simpson_diversity_reference(spark, sf_dir, con):
    import re

    rows = con.execute("SELECT source, lower(text) FROM documents").fetchall()
    counts = {}
    for src, t in rows:
        for w in re.findall(r"[a-z0-9]+", t, re.ASCII):
            counts[(src, w)] = counts.get((src, w), 0) + 1
    per_src = {}
    for (src, w), c in counts.items():
        nt, ty, ss = per_src.get(src, (0, 0, 0))
        per_src[src] = (nt + c, ty + 1, ss + c * (c - 1))
    out = {r["source"]: r for r in run(spark, sf_dir, "text_simpson_diversity")}
    assert set(out) == set(per_src)
    for src, (nt, ty, ss) in per_src.items():
        r = out[src]
        den = nt * (nt - 1)
        assert r["n_tokens"] == nt
        assert r["n_types"] == ty
        assert r["simpson_d_micro"] == _half_away(ss * 1000000, den)
        assert r["diversity_micro"] == _half_away((den - ss) * 1000000, den)
        assert r["effective_types_micro"] == _half_away(den * 1000000, ss)
        # at least one effective type; the UNBIASED 1/D may slightly
        # exceed the raw type count (it corrects the plug-in downward),
        # so the plug-in bound S only holds with the finite-sample slack
        assert r["effective_types_micro"] >= 1000000
        assert r["effective_types_micro"] <= ty * 1000000 * (nt) // max(nt - ty, 1)
