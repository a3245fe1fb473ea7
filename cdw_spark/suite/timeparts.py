"""Time-dimension build and the EXTRACT family (F1-F8).

The reference's scalar-function surface is exactly the time dimension insert
(/root/reference/sql_queries.py:208-220): epoch-ms -> TIMESTAMP (F1, with
BIGINT ``ts/1000`` truncation — quirk K5) and EXTRACT of
hour/day/week/month/year (F3-F7) plus the reference's weekday bug (F8/K2:
``weekday`` is filled with EXTRACT(week ...), duplicating ``week``).

Fixture mapping: ``events.ts`` (already a TIMESTAMP; we reconstruct the
epoch-ms path from it so the faithful truncation semantics are exercised).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_fixture
from ..functions.timeparts import epoch_ms_to_timestamp_faithful, time_parts
from ..registry import register


@register(
    "time_dim",
    oracle="""
    SELECT DISTINCT
        make_timestamp((epoch_ms(ts) // 1000) * 1000000) AS start_time,
        CAST(hour(make_timestamp((epoch_ms(ts) // 1000) * 1000000)) AS INTEGER)       AS hour,
        CAST(dayofmonth(make_timestamp((epoch_ms(ts) // 1000) * 1000000)) AS INTEGER) AS day,
        CAST(weekofyear(make_timestamp((epoch_ms(ts) // 1000) * 1000000)) AS INTEGER) AS week,
        CAST(month(make_timestamp((epoch_ms(ts) // 1000) * 1000000)) AS INTEGER)      AS month,
        CAST(year(make_timestamp((epoch_ms(ts) // 1000) * 1000000)) AS INTEGER)       AS year,
        CAST(weekofyear(make_timestamp((epoch_ms(ts) // 1000) * 1000000)) AS INTEGER) AS weekday
    FROM events
    """,
    doc="time-dimension build: epoch-ms floor-division to whole seconds (K5) "
    "+ EXTRACT family F1-F8 with the faithful weekday=week quirk (K2) — "
    "sql_queries.py:208-220.",
)
def time_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``INSERT INTO time SELECT DISTINCT TIMESTAMP 'epoch' + ts/1000 *
    INTERVAL '1 second', EXTRACT(hour...), ...`` recreated faithfully:

    - K5: ``ts/1000`` is BIGINT division in Redshift — sub-second dropped
      *before* the timestamp is built (``div``, not a double divide).
    - K2: the reference fills ``weekday`` with EXTRACT(week ...) — weekday
      equals week here on purpose; the corrected variant is
      ``time_dim_fixed``.

    Scale: pure projection + DISTINCT; the hash aggregate is the only
    shuffle and carries just 7 narrow columns.
    """
    ev = load_fixture(spark, sf_dir, "events")
    start = epoch_ms_to_timestamp_faithful(F.unix_millis(F.col("ts")))
    return ev.select(time_parts(start, faithful_weekday=True)).distinct()


@register(
    "time_dim_fixed",
    oracle="""
    SELECT DISTINCT
        make_timestamp((epoch_ms(ts) // 1000) * 1000000) AS start_time,
        CAST(hour(make_timestamp((epoch_ms(ts) // 1000) * 1000000)) AS INTEGER)       AS hour,
        CAST(dayofmonth(make_timestamp((epoch_ms(ts) // 1000) * 1000000)) AS INTEGER) AS day,
        CAST(weekofyear(make_timestamp((epoch_ms(ts) // 1000) * 1000000)) AS INTEGER) AS week,
        CAST(month(make_timestamp((epoch_ms(ts) // 1000) * 1000000)) AS INTEGER)      AS month,
        CAST(year(make_timestamp((epoch_ms(ts) // 1000) * 1000000)) AS INTEGER)       AS year,
        CAST(EXTRACT(dow FROM make_timestamp((epoch_ms(ts) // 1000) * 1000000)) + 1 AS INTEGER) AS weekday
    FROM events
    """,
    doc="time dimension with the *intended* weekday (day-of-week, 1=Sunday "
    "to match Spark's dayofweek) — the corrected variant of quirk K2.",
)
def time_dim_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as ``time_dim`` but weekday = real day-of-week. Spark's
    ``dayofweek`` is 1=Sunday..7=Saturday; DuckDB's EXTRACT(dow) is
    0=Sunday..6=Saturday, hence the +1 in the oracle."""
    ev = load_fixture(spark, sf_dir, "events")
    start = epoch_ms_to_timestamp_faithful(F.unix_millis(F.col("ts")))
    return ev.select(time_parts(start, faithful_weekday=False)).distinct()


@register(
    "epoch_conversion",
    oracle="""
    SELECT
        event_id,
        epoch_ms(ts) AS ts_ms,
        epoch_ms(ts) // 1000 AS ts_sec_trunc,
        make_timestamp((epoch_ms(ts) // 1000) * 1000000) AS ts_whole_sec,
        make_timestamp(epoch_ms(ts) * 1000) AS ts_exact
    FROM events
    """,
    doc="F1/F2 epoch arithmetic both ways: faithful BIGINT-truncating "
    "conversion (K5) next to the exact millisecond conversion.",
)
def epoch_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``TIMESTAMP 'epoch' + ts/1000 * INTERVAL '1 second'``
    (sql_queries.py:152) in both faithful (sub-second dropped by integer
    division) and exact (timestamp_millis) forms, plus the raw arithmetic."""
    ev = load_fixture(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts"))
    return ev.select(
        "event_id",
        ms.alias("ts_ms"),
        F.expr("unix_millis(ts) div 1000").alias("ts_sec_trunc"),
        epoch_ms_to_timestamp_faithful(ms).alias("ts_whole_sec"),
        F.timestamp_millis(ms).alias("ts_exact"),
    )
