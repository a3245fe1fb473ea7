"""Unit semantics of the as-of backward join (operators/asof.py):
checked on a hand-built frame where every edge case is visible, then
differentially vs DuckDB's native ASOF JOIN in test_oracle_contract.py."""

from __future__ import annotations

import datetime as dt

from cdw_spark.operators.asof import asof_join_backward


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:00:10")),  # after r@5 -> picks 5
            (2, 10, _ts("2024-01-01T00:00:20")),  # equal to r@20 -> picks 20
            (3, 10, _ts("2024-01-01T00:00:03")),  # before any right -> NULL
            (4, 99, _ts("2024-01-01T00:00:30")),  # key with no right rows -> NULL
        ],
        "id int, k int, t timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T00:00:05"), 1.0),
            (10, _ts("2024-01-01T00:00:20"), 2.0),
            (10, _ts("2024-01-01T00:00:25"), 3.0),  # later than every left -> unused
        ],
        "k int, rt timestamp, v double",
    )
    out = asof_join_backward(
        left, right, on=["k"], left_time="t", right_time="rt",
        right_payload={"rt": "matched_t", "v": "matched_v"},
    )
    got = {r.id: (r.matched_t, r.matched_v) for r in out.collect()}
    assert len(got) == 4  # every left row survives exactly once
    assert got[1] == (_ts("2024-01-01T00:00:05"), 1.0)
    assert got[2] == (_ts("2024-01-01T00:00:20"), 2.0)  # inclusive bound
    assert got[3] == (None, None)
    assert got[4] == (None, None)


def test_asof_payload_from_same_row(spark):
    """A NULL inside a right column must not be patched from an older row —
    the payload struct travels atomically."""
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01T00:01:00"))], "id int, k int, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (5, _ts("2024-01-01T00:00:10"), 7.0),
            (5, _ts("2024-01-01T00:00:50"), None),  # latest row has NULL v
        ],
        "k int, rt timestamp, v double",
    )
    out = asof_join_backward(
        left, right, on=["k"], left_time="t", right_time="rt",
        right_payload={"rt": "matched_t", "v": "matched_v"},
    )
    r = out.collect()[0]
    assert r.matched_t == _ts("2024-01-01T00:00:50")
    assert r.matched_v is None  # from the matched row, not the older one


def test_asof_null_timestamps(spark):
    """ASOF semantics on NULLs: a right row with NULL time can never match
    (r.t <= l.t is never true — DuckDB agrees), and a left row with NULL
    time matches nothing. Round-2 regression: ascending sort puts NULLs
    first, so an unfiltered NULL-time right row posed as the 'earliest'
    match and filled forward."""
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:00:10")),
            (2, 10, None),  # NULL left time -> no match
        ],
        "id int, k int, t timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, None, 666.0),  # NULL right time -> must never be matched
            (10, _ts("2024-01-01T00:00:05"), 1.0),
        ],
        "k int, rt timestamp, v double",
    )
    out = asof_join_backward(
        left, right, on=["k"], left_time="t", right_time="rt",
        right_payload={"rt": "matched_t", "v": "matched_v"},
    )
    got = {r.id: (r.matched_t, r.matched_v) for r in out.collect()}
    assert got[1] == (_ts("2024-01-01T00:00:05"), 1.0)
    assert got[2] == (None, None)
    assert 666.0 not in {v for _, v in got.values()}


def test_asof_forward_tolerance_and_tie_semantics(spark):
    from datetime import datetime

    from cdw_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [
            (1, 10, datetime(2024, 1, 1, 10, 0, 0)),   # exact-tie match
            (2, 10, datetime(2024, 1, 1, 11, 0, 0)),   # next is 1h ahead (in tol)
            (3, 10, datetime(2024, 1, 5, 0, 0, 0)),    # nothing after
            (4, 20, datetime(2024, 1, 1, 0, 0, 0)),    # next is 3 days ahead (out of tol)
        ],
        "event_id long, user_id long, click_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, datetime(2024, 1, 1, 10, 0, 0), 1.0),
            (10, datetime(2024, 1, 1, 12, 0, 0), 2.0),
            (20, datetime(2024, 1, 4, 0, 0, 0), 9.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r["v"]
        for r in asof_join_forward(
            left, right, on=["user_id"], left_time="click_ts", right_time="ts",
            right_payload={"value": "v"}, tolerance_seconds=86400,
        ).collect()
    }
    assert out == {1: 1.0, 2: 2.0, 3: None, 4: None}
