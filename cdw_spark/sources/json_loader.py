"""Bulk JSON ingestion — the Spark-native replacement for Redshift COPY.

The reference stages two S3 JSON datasets (/root/reference/sql_queries.py:
122-136):

S1 ``staging_events_copy`` — ``format as json <jsonpaths>``: fields are
   mapped to target columns *positionally* via a JSONPaths file.
S2 ``staging_songs_copy`` — ``format as json 'auto'``: fields matched to
   columns by name.

Spark maps JSON by name natively, so S2 is a plain schema-on-read
``spark.read.schema(...).json(path)``; S1 becomes an explicit ordered
projection (the JSONPaths list) aliased onto the target column names, then
cast to the staging types.

Scale: ``spark.read.json`` parallelizes over files/blocks exactly like
Redshift COPY parallelizes over S3 objects — one task per split, no data
through the driver. The same call reads ``s3a://`` URIs unchanged on a real
cluster (hadoop-aws); the reference's IAM-role credentials map to Spark's
hadoop-aws credential provider config, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..schemas import RAW_EVENT_JSON, RAW_SONG_JSON, STAGING_EVENTS, STAGING_SONGS

# The JSONPaths mapping for the Sparkify event log: source field -> staging
# column, in the staging-table column order (sql_queries.py:25-47). The
# reference's s3://udacity-dend/log_json_path.json expresses the same list
# positionally; ``event_id`` has no source path (it is a NULL surrogate slot
# in staging, populated by nothing — matching COPY's behavior for an
# unmapped leading column).
EVENTS_JSONPATHS: list[tuple[str | None, str]] = [
    (None, "event_id"),
    ("artist", "artist"),
    ("auth", "auth"),
    ("firstName", "firstName"),
    ("gender", "gender"),
    ("itemInSession", "itemInSession"),
    ("lastName", "lastName"),
    ("length", "length"),
    ("level", "level"),
    ("location", "location"),
    ("method", "method"),
    ("page", "page"),
    ("registration", "registration"),
    ("sessionId", "sessionId"),
    ("song", "song"),
    ("status", "status"),
    ("ts", "ts"),
    ("userAgent", "userAgent"),
    ("userId", "userId"),
]


def load_json_positional(
    spark: SparkSession,
    path: str,
    jsonpaths: list[tuple[str | None, str]],
    raw_schema: StructType,
    target_schema: StructType,
) -> DataFrame:
    """S1: JSONPaths-style load — ordered field->column mapping + cast.

    ``raw_schema`` pins the schema-on-read (no sampling pass over 100 TB of
    JSON — inference would scan everything twice); the projection then
    renames positionally and casts each column to the declared staging type,
    reproducing COPY's parse-and-coerce step (including DECIMAL(9,0)
    rounding of fractional seconds — quirk K4's origin).
    """
    raw = spark.read.schema(raw_schema).json(path)
    target_types = {f.name: f.dataType for f in target_schema.fields}
    cols = []
    for src, dst in jsonpaths:
        base = F.col(src) if src is not None else F.lit(None)
        # try_cast: COPY coerces on load and nulls unparseable values (the
        # real Sparkify log has userId='' for logged-out rows); ANSI cast
        # would abort the whole load on one bad row.
        cols.append(base.try_cast(target_types[dst]).alias(dst))
    return raw.select(*cols)


def load_json_auto(
    spark: SparkSession, path: str, raw_schema: StructType, target_schema: StructType
) -> DataFrame:
    """S2: ``format as json 'auto'`` — name-based mapping (Spark-native),
    then cast onto the declared staging schema."""
    raw = spark.read.schema(raw_schema).json(path)
    return raw.select(
        *[F.col(f.name).try_cast(f.dataType).alias(f.name) for f in target_schema.fields]
    )


def load_staging_events(spark: SparkSession, path: str) -> DataFrame:
    """``COPY staging_events`` (sql_queries.py:122-128)."""
    return load_json_positional(spark, path, EVENTS_JSONPATHS, RAW_EVENT_JSON, STAGING_EVENTS)


def load_staging_songs(spark: SparkSession, path: str) -> DataFrame:
    """``COPY staging_songs`` (sql_queries.py:130-136)."""
    return load_json_auto(spark, path, RAW_SONG_JSON, STAGING_SONGS)
