"""As-of (most-recent-match) join — a time-series operator the reference
lacks (its only join is the 3-key equi-join, /root/reference/sql_queries.py:161-164)
but a training-data / event pipeline needs constantly: attach to each left
row the latest right row with the same key and right_time <= left_time.

Spark has no ASOF JOIN primitive (DuckDB does — the oracle uses it), so
this implements the scalable union-and-fill pattern instead of the naive
inequality join:

    naive:  left JOIN right ON key AND r.t <= l.t  → per-key row explosion
            (O(|L| x |R|) within key), then a max() — unusable at 100 TB.
    here:   union both sides tagged → single shuffle on (key) with a
            sort on (time, side) → running last_value(ignorenulls) fills
            each left row with the latest right payload — O(|L| + |R|)
            rows moved, one shuffle total, no explosion.

The right payload travels as ONE struct column so all right-side fields
come from the *same* matched row (per-column last() could mix rows when a
right column is legitimately NULL).

Tie discipline: at equal timestamps the right row sorts first
(side 0 < side 1), so an exact-time match is visible to the left row —
identical to ASOF's `l.t >= r.t` bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TIME = "__asof_t"
_PAYLOAD = "__asof_payload"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_payload: dict[str, str],
) -> DataFrame:
    """Left as-of-backward join.

    Every ``left`` row gains ``right_payload`` columns ({src_col: out_alias})
    taken from the right row with the greatest ``right_time`` <=
    ``left_time`` for the same ``on`` key; NULLs when no such row exists
    (left-outer semantics).
    """
    payload = F.struct(
        *[F.col(src).alias(alias) for src, alias in right_payload.items()]
    )
    # NULL right_time rows can never satisfy r.t <= l.t (ASOF semantics;
    # DuckDB agrees) — but ascending sort puts NULLs FIRST, so an
    # unfiltered NULL-time right row would pose as the "earliest" match
    # and fill forward. Drop them before the union. NULL left_time rows
    # need no special path: with right NULLs gone they sort before every
    # right row of their key and the running last() finds no payload —
    # the correct no-match NULL.
    r = right.filter(F.col(right_time).isNotNull()).select(
        *on,
        F.col(right_time).alias(_TIME),
        F.lit(0).alias(_SIDE),
        payload.alias(_PAYLOAD),
    )
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_time).alias(_TIME),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    # unionByName aligns the disjoint shapes; missing left cols on the
    # right side become NULL (they are never read from right rows).
    u = r.unionByName(l, allowMissingColumns=True)

    # _PAYLOAD as the final sort key makes duplicate right rows at the same
    # (key, time) resolve deterministically (struct comparison is
    # lexicographic by field) instead of by partition arrival order.
    w = (
        Window.partitionBy(*on)
        .orderBy(_TIME, _SIDE, _PAYLOAD)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled: Column = F.last(_PAYLOAD, ignorenulls=True).over(w)

    return (
        u.withColumn(_PAYLOAD, filled)
        .filter(F.col(_SIDE) == 1)
        .select(
            *left_cols,
            *[
                F.col(f"{_PAYLOAD}.{alias}").alias(alias)
                for alias in right_payload.values()
            ],
        )
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_payload: dict[str, str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of-FORWARD join with optional tolerance: every ``left`` row
    gains the payload of the right row with the SMALLEST ``right_time`` >=
    ``left_time`` for the same key — NULLs when none exists or when the
    match is further than ``tolerance_seconds`` ahead (the
    sensor/next-event lookup, mirror of asof_join_backward).

    Same single-shuffle union trick as backward, scanned in DESCENDING
    time order so the running last() carries the nearest FOLLOWING right
    row; at equal times the right row sorts first, so >= ties match.
    Tolerance is a post-fill predicate on the matched time — no second
    join, no row explosion."""
    matched_time = "_matched_t"
    payload = F.struct(
        F.col(right_time).alias(matched_time),
        *[F.col(src).alias(alias) for src, alias in right_payload.items()],
    )
    r = right.filter(F.col(right_time).isNotNull()).select(
        *on,
        F.col(right_time).alias(_TIME),
        F.lit(0).alias(_SIDE),
        payload.alias(_PAYLOAD),
    )
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_time).alias(_TIME),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    u = r.unionByName(l, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TIME).desc(), _SIDE, _PAYLOAD)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last(_PAYLOAD, ignorenulls=True).over(w)
    out = u.withColumn(_PAYLOAD, filled).filter(F.col(_SIDE) == 1)
    keep = F.col(_PAYLOAD).isNotNull()
    if tolerance_seconds is not None:
        keep = keep & (
            F.col(f"{_PAYLOAD}.{matched_time}").cast("long")
            - F.col(_TIME).cast("long")
            <= F.lit(tolerance_seconds)
        )
    return out.select(
        *left_cols,
        *[
            F.when(keep, F.col(f"{_PAYLOAD}.{alias}")).alias(alias)
            for alias in right_payload.values()
        ],
    )
