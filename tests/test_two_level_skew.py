"""Skew guard for two_level_cumsum (VERDICT r8 #4).

The helper's ties-share-a-bucket rule means one pathological sort-key
value — 90% duplicate rows, pre-distinct — sorts in a single task. The
repo-wide call pattern is therefore: collapse to the DISTINCT-value
relation first and accumulate the count. This test measures both shapes
through the helper's own bucket assignment (bucket_by_value) and pins
the rule mechanically:

- the RAW skewed relation concentrates >= the duplicated share of all
  rows in one (key, bucket) partition — the hazard, demonstrated;
- the distinct-collapsed relation keeps every within-bucket row count
  bounded (r13: buckets are the fixed log-grid cells, so the bound comes
  from the distinct values' spread across magnitude cells) — the fix,
  measured;
- the helper's running sums on the collapsed relation equal the naive
  single-partition window exactly, 90%-one-value skew included.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdw_spark.operators.stats import bucket_by_value, two_level_cumsum

N_ROWS = 20_000
N_DISTINCT = 1_000  # distinct values in the non-skewed 10% tail
N_BUCKETS = 64


def _skewed(spark):
    """20k rows; 90% share one sort-key value, the rest spread evenly."""
    return spark.range(N_ROWS).select(
        F.when(F.col("id") % 10 < 9, F.lit(424242))
        .otherwise(F.col("id") % N_DISTINCT)
        .cast("bigint")
        .alias("v")
    )


def test_raw_skew_concentrates_in_one_bucket(spark):
    raw = _skewed(spark)
    b = bucket_by_value(raw, [], "v", n_buckets=N_BUCKETS)
    per_bucket = b.groupBy("_bk").count().collect()
    worst = max(r["count"] for r in per_bucket)
    # ties share a bucket: all ~18k copies of the hot value land together
    assert worst >= int(N_ROWS * 0.9), (
        f"expected the hot value's copies in one bucket, worst={worst}"
    )


def test_distinct_collapse_bounds_bucket_width(spark):
    cells = _skewed(spark).groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    b = bucket_by_value(cells, [], "v", n_buckets=N_BUCKETS)
    per_bucket = b.groupBy("_bk").count().collect()
    worst = max(r["count"] for r in per_bucket)
    n_cells = sum(r["count"] for r in per_bucket)
    assert n_cells <= N_DISTINCT + 1
    # bucket balance: no bucket holds more than a small multiple of the
    # 64-way even share (loose 8x bound — the guarantee is boundedness;
    # the log-grid spreads these distinct integers across magnitude
    # cells far finer than 64 buckets would)
    assert worst <= max(8 * -(-n_cells // N_BUCKETS), 16), (
        f"within-bucket width {worst} not bounded for {n_cells} cells"
    )


def test_adaptive_sketch_path_matches_grid_path(spark):
    """The opt-in quantile-sketch bucketing (for narrow-relative-range
    value distributions at scale) must produce the same running sums as
    the default grid — buckets only move WHERE sorts happen."""
    cells = _skewed(spark).groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    grid = {
        r["v"]: r["cumc"]
        for r in two_level_cumsum(cells, [], "v", [], {"cumc": "c"}).collect()
    }
    adaptive = bucket_by_value(cells, [], "v", n_buckets=N_BUCKETS, adaptive=True)
    from pyspark.sql.window import Window

    wl = (
        Window.partitionBy("_bk")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    totals = adaptive.groupBy("_bk").agg(F.sum("c").alias("_t"))
    offs = totals.select(
        "_bk", F.coalesce(F.sum("_t").over(wo), F.lit(0)).alias("_off")
    )
    sk = (
        adaptive.withColumn("_loc", F.sum("c").over(wl))
        .join(offs, "_bk")
        .select("v", (F.col("_off") + F.col("_loc")).alias("cumc"))
    )
    got = {r["v"]: r["cumc"] for r in sk.collect()}
    assert got == grid


def test_cumsum_exact_under_skew(spark):
    from pyspark.sql.window import Window

    cells = _skewed(spark).groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    got = {
        r["v"]: r["cumc"]
        for r in two_level_cumsum(cells, [], "v", [], {"cumc": "c"}).collect()
    }
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r["v"]: r["cumc"]
        for r in cells.select("v", F.sum("c").over(w).alias("cumc")).collect()
    }
    assert got == want
    assert max(got.values()) == N_ROWS
