"""Time scalar functions (F1-F8, /root/reference/sql_queries.py:151-152,
208-220), as reusable Column builders.

Faithfulness notes (SURVEY.md §7.1):
- K5: the reference converts epoch with ``TIMESTAMP 'epoch' + ts/1000 *
  INTERVAL '1 second'`` where ``ts/1000`` is BIGINT/INT division —
  sub-second milliseconds are truncated. ``epoch_ms_to_timestamp_faithful``
  reproduces that with integer ``div`` (never a double divide, which could
  mis-floor at representation boundaries).
- K2: the reference's ``weekday`` column is populated with EXTRACT(week),
  duplicating ``week``. ``time_parts(faithful_weekday=True)`` reproduces it;
  ``False`` gives the intended day-of-week (Spark ``dayofweek``, 1=Sunday).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms_to_timestamp_faithful(ms: Column) -> Column:
    """Epoch milliseconds -> TIMESTAMP truncated to whole seconds (K5)."""
    return F.timestamp_seconds(_div_1000(ms))


def _div_1000(ms: Column) -> Column:
    # Exact integer division by 1000: subtract the remainder first so the
    # double divide is over a multiple of 1000 (exact in IEEE754 for any
    # realistic epoch), never mis-flooring at representation boundaries.
    m = ms.cast("long")
    return ((m - (m % 1000)) / 1000).cast("long")


def epoch_ms_to_timestamp_exact(ms: Column) -> Column:
    """Millisecond-exact conversion (the non-quirk variant)."""
    return F.timestamp_millis(ms.cast("long"))


def time_parts(start_time: Column, faithful_weekday: bool = True) -> list[Column]:
    """The seven ``time`` dimension columns (sql_queries.py:210-217).

    All parts cast to INT for a stable cross-engine schema (the reference
    declares SMALLINT; Redshift SMALLINT semantics don't affect values in
    range)."""
    weekday = F.weekofyear(start_time) if faithful_weekday else F.dayofweek(start_time)
    return [
        start_time.alias("start_time"),
        F.hour(start_time).cast("int").alias("hour"),
        F.dayofmonth(start_time).cast("int").alias("day"),
        F.weekofyear(start_time).cast("int").alias("week"),
        F.month(start_time).cast("int").alias("month"),
        F.year(start_time).cast("int").alias("year"),
        weekday.cast("int").alias("weekday"),
    ]
