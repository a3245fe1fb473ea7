"""The ELT driver — /root/reference/etl.py recreated on Spark.

Reference lifecycle (etl.py:30-43): config -> connect -> load staging
(COPY x2) -> insert star tables (INSERT...SELECT x5, order fixed at
sql_queries.py:227) -> close. Here: session -> JSON loads -> five DataFrame
transforms -> layout-aware parquet writes. INSERTs append (quirk K6) unless
``mode='overwrite'``.

A full reset (create_tables.py) is ``cdw_spark.catalog.reset``; this module
assumes tables may or may not exist, exactly like the reference assumes
create_tables.py ran first.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..plans.layout import REFERENCE_LAYOUTS, write_table
from ..sources.json_loader import load_staging_events, load_staging_songs
from .sparkify import transform_all

# Insert order fixed by the reference (sql_queries.py:227). Order is not a
# correctness dependency (all five read only staging) — preserved for parity.
INSERT_ORDER = ("songplays", "users", "songs", "artists", "time")


def load_staging(spark: SparkSession, log_path: str, song_path: str) -> dict[str, DataFrame]:
    """The COPY stage (etl.py:6-15)."""
    return {
        "staging_events": load_staging_events(spark, log_path),
        "staging_songs": load_staging_songs(spark, song_path),
    }


def run_elt(
    spark: SparkSession,
    log_path: str,
    song_path: str,
    out_dir: str,
    faithful: bool = True,
    mode: str = "append",
) -> dict[str, str]:
    """Full pipeline: stage JSON -> transform -> write star schema.

    Returns {table: parquet path}. Staging tables are also materialized
    (the reference keeps them queryable in Redshift). Each write applies
    the table's declared DISTKEY/SORTKEY layout."""
    staging = load_staging(spark, log_path, song_path)
    paths: dict[str, str] = {}
    for name, df in staging.items():
        path = os.path.join(out_dir, name)
        write_table(df, name, REFERENCE_LAYOUTS[name], mode=mode, path=path)
        paths[name] = path

    # Re-read staging from parquet: the reference transforms read staged
    # tables, not the raw JSON — and at scale re-reading columnar staging
    # beats re-parsing JSON five times.
    events = spark.read.parquet(paths["staging_events"])
    songs = spark.read.parquet(paths["staging_songs"])

    star = transform_all(events, songs, faithful=faithful)
    for name in INSERT_ORDER:
        path = os.path.join(out_dir, name)
        write_table(star[name], name, REFERENCE_LAYOUTS[name], mode=mode, path=path)
        paths[name] = path
    return paths
