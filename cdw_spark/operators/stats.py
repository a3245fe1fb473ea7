"""Distributed exact order statistics.

``banded_exact_median`` is the scalable exact-median pattern extracted
from the Theil-Sen estimator (suite/analytics.py): the naive exact
median either materializes every group value in one object-agg buffer
(``percentile()`` — measured Java-heap OOM at ~10M values on a default
1 GiB session) or funnels each group through a single-task window sort.
Instead:

Pass 1 — a mergeable ``approx_percentile`` sketch brackets the median
with a [q(0.5-margin), q(0.5+margin)] band and counts rows strictly
below the band; both are map-side-combined aggregations, fully parallel.
The sketch accuracy is chosen so its rank error (n/accuracy) is well
inside the band margin (margin*n), so the true median provably lies in
the band.

Pass 2 — ONLY the band rows (~2*margin of the data) sort in the
per-group window; each row's GLOBAL rank is count_below + band_rank, and
the median is the average of the one or two middle ranks — the explicit
midpoint formula both engines can state identically (sidestepping
quantile_cont's lo+(hi-lo)*f vs (lo+hi)/2 last-ulp gap).

The sketch only narrows WHERE the sort happens, never which values are
picked: the result is exactly the classical median.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def banded_exact_median(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    margin: float = 0.01,
    accuracy: int = 1000,
    out_col: str = "median",
) -> DataFrame:
    """Exact per-group median of ``value_col`` -> key_cols + (n, median).

    ``accuracy`` must satisfy n/accuracy << margin*n, i.e.
    accuracy >> 1/margin; the default pair (0.01, 1000) gives a 10x
    safety factor. Values must be numeric; NULLs are excluded (matching
    SQL aggregate semantics).

    The per-group stats (`st`) and below-count (`below`) relations are
    one row per group, so their join sides are group-cardinality-sized,
    NOT data-sized — but that makes them unbounded for a high-cardinality
    key, so the hint is size-GATED (broadcast_if_small), not forced:
    Catalyst's estimate for a groupBy is bounded by its key-cardinality
    stats, so bounded-group callers (Theil-Sen's 3 groups) get the
    immediate broadcast — measured ~20% faster than leaving the big
    `src` side to a planned exchange that AQE later elides — while a
    millions-of-groups key exceeds the threshold and falls back to the
    shuffled plan instead of blowing the driver."""
    from ..plans.hints import broadcast_if_small
    if accuracy < 2.0 / margin:
        raise ValueError(
            f"accuracy {accuracy} too low for margin {margin}: the sketch "
            f"rank error n/{accuracy} must stay inside the margin*n band"
        )
    v = F.col(value_col)
    src = df.filter(v.isNotNull()).select(*key_cols, v.alias("_v"))
    lo_q, hi_q = 0.5 - margin, 0.5 + margin
    st = src.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.expr(
            f"approx_percentile(_v, array({lo_q}, {hi_q}), {accuracy})"
        ).alias("_bnd"),
    ).select(
        *key_cols, "_n", F.col("_bnd")[0].alias("_lo"), F.col("_bnd")[1].alias("_hi")
    )
    j = src.join(broadcast_if_small(st), key_cols)
    below = (
        j.filter(F.col("_v") < F.col("_lo"))
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_nb"))
    )
    wb = Window.partitionBy(*key_cols).orderBy("_v")
    ranked = (
        j.filter((F.col("_v") >= F.col("_lo")) & (F.col("_v") <= F.col("_hi")))
        .withColumn("_rb", F.row_number().over(wb))
        # left join: a group whose band starts at the minimum has NO rows
        # strictly below _lo, so it is absent from `below`.
        .join(broadcast_if_small(below), key_cols, "left")
        .withColumn("_rn", F.col("_rb") + F.coalesce(F.col("_nb"), F.lit(0)))
    )
    return (
        ranked.filter(
            (F.col("_rn") == F.expr("(_n + 1) div 2"))
            | (F.col("_rn") == F.expr("(_n + 2) div 2"))
        )
        .groupBy(*key_cols)
        .agg(
            F.first("_n").cast("bigint").alias("n"),
            F.avg("_v").alias(out_col),
        )
    )


def bucket_by_value(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_buckets: int = 64,
    accuracy: int = 2000,
) -> DataFrame:
    """Level 1 of the two-level prefix-sum: route every row to the range
    bucket counting approx_percentile boundaries strictly below its
    value (ties always share a bucket), returning ``df`` plus an int
    ``_bk`` column, localCheckpoint'ed. Exposed separately so the skew
    test can measure within-bucket row counts directly."""
    from ..plans.hints import broadcast_if_small

    qs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
    sketch = F.expr(f"approx_percentile(_bv, array({qs}), {accuracy})").alias("_bnd")
    src = df.withColumn("_bv", F.col(value_col).cast("double"))
    if key_cols:
        bnd = src.groupBy(*key_cols).agg(sketch)
        j = src.join(broadcast_if_small(bnd), key_cols)
    else:
        bnd = src.agg(sketch)
        j = src.crossJoin(F.broadcast(bnd))
    # Checkpoint the bucketed relation: it feeds BOTH the within-bucket
    # windows and the bucket-totals aggregate, and without the cut the
    # caller's upstream lineage re-evaluates once per consumer — ruinous
    # when calls chain (three chained ranks = 3^3 upstream evals). The
    # checkpointed relation is the caller's (already reduced) input plus
    # one int column, materialized once on executor storage. eager=False:
    # the plan is truncated immediately either way, and the RDD still
    # computes exactly once (block-level locking) under the caller's
    # action — lazy just removes one blocking driver job per call site
    # (~40 bench queries ride this helper).
    return (
        j.withColumn("_bk", F.expr("size(filter(_bnd, t -> t < _bv))"))
        .drop("_bnd", "_bv")
        .localCheckpoint(eager=False)
    )


def two_level_cumsum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    tiebreak_cols: list[str],
    sum_cols: dict[str, str],
    n_buckets: int = 64,
    accuracy: int = 2000,
) -> DataFrame:
    """EXACT inclusive running sums under ``ORDER BY value_col,
    tiebreak_cols`` (per ``key_cols`` group, or globally when empty)
    WITHOUT a single-partition sort — the two-level prefix-sum rank
    pattern (global_shuffle_rank generalized to arbitrary numeric sort
    keys and arbitrary summands).

    Level 1: an ``approx_percentile`` sketch per group picks
    ``n_buckets - 1`` range boundaries; every row routes to the bucket
    counting boundaries strictly below its value, so ties always share a
    bucket and (bucket, value, tiebreaks) order IS the global order. The
    sketch only balances WHERE each within-bucket sort happens — a skewed
    sketch degrades speed, never values. Level 2: each ordered window
    runs inside its (group, bucket) partition in parallel; per-bucket
    totals (|groups| * n_buckets rows) turn into cumulative offsets via a
    window over that bounded relation, broadcast back, and
    ``global = offset + within-bucket running sum``.

    ``sum_cols`` maps output name -> existing numeric column to
    accumulate (pass a literal-1 column for a row_number-style rank).
    ``value_col`` must be non-NULL and numeric, ascending; express a
    descending order by negating the column first. Returns ``df``'s
    columns plus the cumulative columns.

    SKEW RULE (VERDICT r8 #4): ties SHARE a bucket by construction —
    that is what makes (bucket, value, tiebreaks) the global order — so
    every copy of one repeated value sorts in ONE task. The within-
    bucket sort is therefore bounded only when value multiplicity is —
    so callers MUST pass a relation already collapsed to distinct values /
    distinct cells (value + a count column to accumulate), never a raw
    fact relation whose sort key can be 90% one value. Every call site
    in the repo does this (the count lives in ``sum_cols``); the
    pattern is pinned by tests/test_two_level_skew.py, which feeds a
    90%-one-value raw relation and shows the collapse bounds the max
    within-bucket row count while the raw shape does not. A salt-and-
    merge fallback inside the helper is deliberately NOT offered: with
    ``tiebreak_cols`` the within-tie order is caller-visible, and
    without them per-row running sums on tied rows are order-dependent
    — the distinct-collapse is the only shape with well-defined output.
    """
    from ..plans.hints import broadcast_if_small

    j = bucket_by_value(df, key_cols, value_col, n_buckets, accuracy)

    wl = (
        Window.partitionBy(*key_cols, "_bk")
        .orderBy(value_col, *tiebreak_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = j.groupBy(*key_cols, "_bk").agg(
        *[F.sum(c).alias(f"_tot_{o}") for o, c in sum_cols.items()]
    )
    for out, src_col in sum_cols.items():
        j = j.withColumn(f"_loc_{out}", F.sum(src_col).over(wl))
    # bounded relation: |groups| * n_buckets rows; the per-group ordered
    # window sorts at most n_buckets rows per task
    wo = (
        Window.partitionBy(*key_cols)
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *key_cols,
        "_bk",
        *[
            F.coalesce(F.sum(f"_tot_{o}").over(wo), F.lit(0)).alias(f"_off_{o}")
            for o in sum_cols
        ],
    )
    out_df = j.join(broadcast_if_small(offsets), [*key_cols, "_bk"])
    for out in sum_cols:
        out_df = out_df.withColumn(
            out, F.col(f"_off_{out}") + F.col(f"_loc_{out}")
        )
    drop = ["_bk"] + [f"_loc_{o}" for o in sum_cols] + [f"_off_{o}" for o in sum_cols]
    return out_df.drop(*drop)
