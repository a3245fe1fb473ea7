"""Cross-operator mathematical identities.

Each test asserts a relation two INDEPENDENTLY-constructed operators
must satisfy — a class of check the per-op python-reference tests
cannot provide (a shared misconception passes op-vs-reference while
breaking op-vs-op; the round-12 GMD/Gini identity caught exactly
such a mis-scaling)."""

from __future__ import annotations

import pytest

from cdw_spark.registry import load_all

SPECS = load_all()


def run(spark, sf_dir, name):
    return SPECS[name].fn(spark, sf_dir).collect()


def test_hoover_le_gini(spark, sf_dir):
    """Pigou-Dalton geometry: the Hoover index is the largest vertical
    gap of the Lorenz curve while the Gini is twice the full area
    above it, so Hoover <= Gini on ANY distribution. Both ops build
    from the same per-customer spend but via unrelated machinery
    (n-scaled absolute deviations vs midrank pair sums)."""
    (h,) = run(spark, sf_dir, "agg_hoover_index")
    (g,) = run(spark, sf_dir, "agg_gini_mean_difference")
    assert h.n_customers == g.n_customers
    assert 0.0 < h.hoover_index <= g.gini_from_gmd <= 1.0


def test_gmd_gini_vs_concentration_gini(spark, sf_dir):
    """The bias-corrected sample Gini (pair construction) must equal
    the plug-in concentration Gini (Lorenz construction) times
    n/(n-1) — the identity that exposed the round-12 GMD bug."""
    (g,) = run(spark, sf_dir, "agg_gini_mean_difference")
    (c,) = run(spark, sf_dir, "agg_gini_concentration")
    n = g.n_customers
    assert g.gini_from_gmd == pytest.approx(c.gini * n / (n - 1.0), abs=5e-4)


def test_hill_inverse_simpson_vs_gini_family(spark, sf_dir):
    """Hill N2/N0 is 1/(n * sum p^2); perfect equality gives 1 and any
    inequality pushes it below — it must therefore move OPPOSITE to
    the Gini on the same base: 1 - N2/N0 and Gini are both zero
    together and positive together."""
    (e,) = run(spark, sf_dir, "agg_effective_cardinality")
    (g,) = run(spark, sf_dir, "agg_gini_mean_difference")
    conc = 1.0 - e.hill_n2 / e.hill_n0
    assert (conc > 1e-9) == (g.gini_from_gmd > 1e-9)
    # and the Hill ladder itself is monotone
    assert e.hill_n0 >= e.hill_n1 >= e.hill_n2


def test_bartels_and_durbin_watson_bounds(spark, sf_dir):
    """Both von Neumann-family ratios live in (0, 4) by construction;
    a value outside means a broken denominator, not an extreme
    series."""
    (b,) = run(spark, sf_dir, "timeseries_bartels_rank")
    assert 0.0 < b.rvn < 4.0


def test_turning_points_vs_bartels_direction(spark, sf_dir):
    """A series with POSITIVE serial correlation turns less often than
    random (turning-point z < 0) and has successive-rank differences
    smaller than random (RVN < 2); with negative correlation both
    flip. The two tests read different statistics of the same daily
    series, so their DIRECTIONS must agree whenever both are clearly
    away from zero."""
    (t,) = run(spark, sf_dir, "timeseries_turning_points")
    (b,) = run(spark, sf_dir, "timeseries_bartels_rank")
    if abs(t.z_score) > 1.0 and abs(b.z_score) > 1.0:
        assert (t.z_score < 0) == (b.rvn < 2.0)


def test_quartiles_inside_octiles(spark, sf_dir):
    """The quartile probe (ceil(kN/4)) and the octile probe
    (ceil(kN/8)) read the same distribution at nested positions:
    E1 <= Q1 <= E3 and E5 <= Q3 <= E7 exactly (lower order
    statistics are monotone in position)."""
    (q,) = run(spark, sf_dir, "agg_quartile_dispersion")
    (m,) = run(spark, sf_dir, "agg_moors_kurtosis")
    assert q.n_orders == m.n_orders
    assert m.e1 <= q.q1 <= m.e3
    assert m.e5 <= q.q3 <= m.e7
