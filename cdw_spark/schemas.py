"""Explicit StructTypes for every table the reference declares.

Source of truth: /root/reference/sql_queries.py:24-118 (CREATE TABLE DDL).
Type mapping per SURVEY.md §1.3:
  BIGINT -> LongType, INTEGER -> IntegerType, SMALLINT -> ShortType,
  VARCHAR -> StringType, DECIMAL(9) -> DecimalType(9,0) (scale 0 — the
  rounding is load-bearing for the fact join, quirk K4),
  TIMESTAMP -> TimestampType (session TZ pinned to UTC).

Redshift PRIMARY KEY / SORTKEY / DISTKEY are planner/layout hints, not
constraints (never enforced); they map to physical layout (plans/layout.py),
not to schema. NOT NULL nullability is carried in the StructFields.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DecimalType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DEC9 = DecimalType(9, 0)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# --- staging layer -------------------------------------------------------

# /root/reference/sql_queries.py:25-47
STAGING_EVENTS = StructType(
    [
        _f("event_id", LongType()),
        _f("artist", StringType()),
        _f("auth", StringType()),
        _f("firstName", StringType()),
        _f("gender", StringType()),
        _f("itemInSession", IntegerType()),
        _f("lastName", StringType()),
        _f("length", DEC9),
        _f("level", StringType()),
        _f("location", StringType()),
        _f("method", StringType()),
        _f("page", StringType()),
        _f("registration", StringType()),
        _f("sessionId", IntegerType(), nullable=False),
        _f("song", StringType()),
        _f("status", IntegerType()),
        _f("ts", LongType(), nullable=False),  # epoch milliseconds
        _f("userAgent", StringType()),
        _f("userId", IntegerType()),
    ]
)

# /root/reference/sql_queries.py:49-62
STAGING_SONGS = StructType(
    [
        _f("num_songs", IntegerType()),
        _f("artist_id", StringType()),
        _f("artist_latitude", DEC9),
        _f("artist_longitude", DEC9),
        _f("artist_location", StringType()),
        _f("artist_name", StringType()),
        _f("song_id", StringType()),
        _f("title", StringType()),
        _f("duration", DEC9),
        _f("year", IntegerType()),
    ]
)

# Raw JSON shapes of the Sparkify sources (pre-staging). The events log is a
# JSON-lines app log whose fields are mapped to staging columns positionally
# via a JSONPaths file in the reference (sql_queries.py:125); in Spark the
# mapping is by name + an explicit projection (sources/json_loader.py).
RAW_EVENT_JSON = StructType(
    [
        _f("artist", StringType()),
        _f("auth", StringType()),
        _f("firstName", StringType()),
        _f("gender", StringType()),
        _f("itemInSession", LongType()),
        _f("lastName", StringType()),
        _f("length", StringType()),  # JSON number; cast to DECIMAL(9,0) on load
        _f("level", StringType()),
        _f("location", StringType()),
        _f("method", StringType()),
        _f("page", StringType()),
        _f("registration", StringType()),
        _f("sessionId", LongType()),
        _f("song", StringType()),
        _f("status", LongType()),
        _f("ts", LongType()),
        _f("userAgent", StringType()),
        _f("userId", StringType()),  # arrives as string or number in real logs
    ]
)

RAW_SONG_JSON = StructType(
    [
        _f("num_songs", LongType()),
        _f("artist_id", StringType()),
        _f("artist_latitude", StringType()),
        _f("artist_longitude", StringType()),
        _f("artist_location", StringType()),
        _f("artist_name", StringType()),
        _f("song_id", StringType()),
        _f("title", StringType()),
        _f("duration", StringType()),
        _f("year", LongType()),
    ]
)

# --- analytics layer (star schema) ---------------------------------------

# /root/reference/sql_queries.py:64-76. songplay_id is declared PK but never
# populated by the reference insert (quirk K1); we populate it (fixed mode)
# or leave NULL (faithful mode) — see pipeline/sparkify.py.
SONGPLAYS = StructType(
    [
        _f("songplay_id", LongType()),
        _f("start_time", TimestampType(), nullable=False),
        _f("user_id", StringType(), nullable=False),  # int->varchar implicit cast, quirk K7
        _f("level", StringType(), nullable=False),
        _f("song_id", StringType(), nullable=False),
        _f("artist_id", StringType(), nullable=False),
        _f("session_id", StringType(), nullable=False),  # quirk K7
        _f("location", StringType()),
        _f("user_agent", StringType()),
    ]
)

# /root/reference/sql_queries.py:78-86
USERS = StructType(
    [
        _f("user_id", IntegerType()),
        _f("first_name", StringType()),
        _f("last_name", StringType()),
        _f("gender", StringType()),
        _f("level", StringType()),
    ]
)

# /root/reference/sql_queries.py:88-96
SONGS = StructType(
    [
        _f("song_id", StringType()),
        _f("title", StringType(), nullable=False),
        _f("artist_id", StringType(), nullable=False),
        _f("year", IntegerType(), nullable=False),
        _f("duration", DEC9, nullable=False),
    ]
)

# /root/reference/sql_queries.py:98-106
ARTISTS = StructType(
    [
        _f("artist_id", StringType()),
        _f("name", StringType()),
        _f("location", StringType()),
        _f("latitude", DEC9),
        _f("longitude", DEC9),
    ]
)

# /root/reference/sql_queries.py:108-118
TIME = StructType(
    [
        _f("start_time", TimestampType()),
        _f("hour", ShortType()),
        _f("day", ShortType()),
        _f("week", ShortType()),
        _f("month", ShortType()),
        _f("year", ShortType()),
        _f("weekday", ShortType()),
    ]
)

STAR_SCHEMA: dict[str, StructType] = {
    "songplays": SONGPLAYS,
    "users": USERS,
    "songs": SONGS,
    "artists": ARTISTS,
    "time": TIME,
}

STAGING_SCHEMA: dict[str, StructType] = {
    "staging_events": STAGING_EVENTS,
    "staging_songs": STAGING_SONGS,
}

ALL_TABLES: dict[str, StructType] = {**STAGING_SCHEMA, **STAR_SCHEMA}
