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


def _users_latest_versioned(events: DataFrame) -> DataFrame:
    """Per-user latest profile row WITH its (ts, sessionId) version key —
    the mergeable form of build_users(faithful=False): keeping the max
    version across any partition of the event history reproduces the
    full-history answer, which is what makes the dim upsert incremental."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    # NULL userId forms its own group, exactly as build_users' window does
    # in the full rebuild — dropping it would diverge from full-run parity.
    se = events.filter(F.col("page") == "NextSong")
    w = Window.partitionBy("userId").orderBy(F.col("ts").desc(), F.col("sessionId").desc())
    return (
        se.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("userId").alias("user_id"),
            F.col("firstName").alias("first_name"),
            F.col("lastName").alias("last_name"),
            F.col("gender").alias("gender"),
            F.col("level").alias("level"),
            F.col("ts").alias("_v_ts"),
            F.col("sessionId").alias("_v_sid"),
        )
    )


def run_elt_incremental(
    spark: SparkSession, log_path: str, song_path: str, out_dir: str
) -> dict[str, str]:
    """Incremental ELT over a NEW batch of source files — the reference
    pipeline run continuously instead of as a full rebuild (etl.py reruns
    COPY over everything; Redshift users cron exactly this shape with
    per-prefix COPYs). Contract, proven in tests/test_elt_runner.py:
    incremental(A) then incremental(B) produces the same star schema as
    one full run over A ∪ B.

    Per-table merge discipline (the general MERGE/CDC operators applied
    to the reference's own schema):
    - facts (``songplays``) are immutable events -> transform ONLY the
      new EVENT slice and APPEND (no fact rewrite at any scale). The
      song-catalog side of the fact join is the ACCUMULATED
      ``staging_songs`` table (read back after this batch's staging
      append), so an event whose song arrived in an EARLIER batch still
      resolves song_id/artist_id. The converse is out of contract:
      a song arriving AFTER the event's batch cannot retroactively fill
      already-appended fact rows (facts are immutable); the full-rebuild
      path is the remedy when late catalogs must back-fill.
    - ``users`` is latest-wins on the (ts, sessionId) version key -> keep
      max-version per user across old+new (upsert); the versioned form
      persists beside the published projection so the next merge has its
      decision key;
    - ``songs`` / ``artists`` / ``time`` are DISTINCT projections ->
      union + distinct + full overwrite. Cost bound: each batch rewrites
      O(|dim|) rows — fine for dims that are DISTINCT projections of a
      bounded key space (songs/artists/time here), and NEVER applied to
      the fact table. At the 100 TB design point, a dim too large to
      rewrite per batch should use the keyed-upsert path instead
      (``cdw_spark.operators.curate.merge_incremental_upsert``, proven
      by the ``incremental_join_merge`` query) — same contract, touches
      only changed partitions.

    Fixed-mode only: the faithful quirk set (K3's level-flapping DISTINCT
    rows, K1's NULL ids) is history-order-dependent by design and cannot
    be maintained incrementally — exactly why the quirks are quirks.

    Scale: every merge touches |new batch| + |dim| rows; the fact table
    is never rewritten. songplay_id stays the synthetic surrogate and is
    not compared across runs (monotonically_increasing_id is
    partition-dependent, K1's fixed variant)."""
    from pyspark.sql import functions as F
    from pyspark.errors import AnalysisException

    def _read_if_exists(path: str) -> DataFrame | None:
        """Read a parquet table that may not exist yet. ONLY a missing
        path returns None — a real read error (corruption, permissions)
        propagates, because falling back to "pretend it's the first
        batch" would overwrite previously merged data with one batch's
        slice (a silent destructive reset)."""
        try:
            return spark.read.parquet(path)
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                return None
            raise

    staging = load_staging(spark, log_path, song_path)
    events = staging["staging_events"]
    paths: dict[str, str] = {}
    for name, df in staging.items():
        path = os.path.join(out_dir, name)
        write_table(df, name, REFERENCE_LAYOUTS[name], mode="append", path=path)
        paths[name] = path

    from .sparkify import build_artists, build_songplays, build_songs, build_time

    # The fact join's catalog side is the ACCUMULATED staging_songs (this
    # batch's rows were just appended above), so events referencing songs
    # from earlier batches still resolve — incremental(A);incremental(B)
    # == full(A ∪ B) holds for interleaved catalogs, not just disjoint
    # ones. The new-batch slice alone is still used for the song/artist
    # dim merges (distinct-union makes that equivalent and cheaper).
    songs_new = staging["staging_songs"]
    songs_all = spark.read.parquet(paths["staging_songs"])

    def _merge_distinct(new_df: DataFrame, name: str) -> None:
        path = os.path.join(out_dir, name)
        old = _read_if_exists(path)
        merged = old.unionByName(new_df).distinct() if old is not None else new_df.distinct()
        # localCheckpoint: the merged plan reads the files being replaced
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)
        paths[name] = path

    # fact: append-only, joined against the full accumulated catalog
    sp_path = os.path.join(out_dir, "songplays")
    build_songplays(events, songs_all, faithful=False).write.mode("append").parquet(sp_path)
    paths["songplays"] = sp_path

    # users: max-version upsert via the persisted versioned form
    uv_path = os.path.join(out_dir, "_users_versioned")
    new_v = _users_latest_versioned(events)
    old_v = _read_if_exists(uv_path)
    all_v = old_v.unionByName(new_v) if old_v is not None else new_v
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("_v_ts").desc(), F.col("_v_sid").desc()
    )
    latest = (
        all_v.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .localCheckpoint(eager=True)
    )
    latest.write.mode("overwrite").parquet(uv_path)
    users_path = os.path.join(out_dir, "users")
    latest.drop("_v_ts", "_v_sid").write.mode("overwrite").parquet(users_path)
    paths["users"] = users_path

    _merge_distinct(build_songs(songs_new), "songs")
    _merge_distinct(build_artists(songs_new), "artists")
    _merge_distinct(build_time(events, faithful=False), "time")
    return paths
