"""The ``jsonpaths`` Python DataSource (cdw_spark/sources/pyds.py):
COPY-style positional ingestion as a pluggable format — differential
against the schema-on-read implementation (sources/json_loader.py
pattern), plus the per-file partition plan and filter pushdown."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cdw_spark.sources.pyds import JsonPathsDataSource

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("artist", StringType()),
        StructField("page", StringType()),
        StructField("ts", LongType()),
        StructField("length", DoubleType()),
        StructField("session_id", IntegerType()),
    ]
)
PATHS = ",artist,page,ts,length,sessionId"

ROWS = [
    {"artist": "A", "page": "NextSong", "ts": 1000, "length": 1.5, "sessionId": 7},
    {"artist": None, "page": "Home", "ts": 2000, "length": None, "sessionId": 8},
    {"artist": "B", "page": "NextSong", "ts": 3000, "length": 2.5, "sessionId": 9},
    {"artist": "C", "page": "NextSong", "ts": 4000, "length": 0.5, "sessionId": 7},
]


@pytest.fixture()
def src_dir(tmp_path):
    for i, chunk in enumerate((ROWS[:2], ROWS[2:])):
        with open(tmp_path / f"part{i}.json", "w") as fh:
            for r in chunk:
                fh.write(json.dumps(r) + "\n")
    return str(tmp_path)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(JsonPathsDataSource)
    return spark


def _read(spark, src_dir, paths=PATHS):
    r = spark.read.format("jsonpaths").schema(SCHEMA).option("path", src_dir)
    if paths is not None:
        r = r.option("jsonpaths", paths)
    return r.load()


def test_positional_mapping_matches_schema_on_read(registered, src_dir):
    """Differential: the pluggable source must equal the json_loader
    pattern (spark.read.json + ordered projection + casts) row for row,
    including the unmapped NULL surrogate slot."""
    got = sorted(_read(registered, src_dir).collect(), key=str)
    via_json = registered.read.json(os.path.join(src_dir, "*.json"))
    expected = sorted(
        via_json.select(
            F.lit(None).cast("long").alias("event_id"),
            F.col("artist").cast("string"),
            F.col("page").cast("string"),
            F.col("ts").cast("long"),
            F.col("length").cast("double"),
            F.col("sessionId").cast("int").alias("session_id"),
        ).collect(),
        key=str,
    )
    assert got == expected
    assert len(got) == len(ROWS)


def test_one_partition_per_file(registered, src_dir):
    """COPY's slice-per-object parallelism: N input files -> N tasks."""
    assert _read(registered, src_dir).rdd.getNumPartitions() == 2


def test_name_mapping_without_jsonpaths(registered, src_dir):
    """No jsonpaths option -> name-auto mode (the reference's S2):
    columns bind to same-named JSON fields; absent fields are NULL."""
    df = _read(registered, src_dir, paths=None)
    rows = df.select("artist", "page", "event_id").collect()
    assert {r["page"] for r in rows} == {"NextSong", "Home"}
    assert all(r["event_id"] is None for r in rows)  # no such JSON field


def test_filter_pushdown_absorbs_supported_predicates(registered, src_dir):
    """EqualTo + IsNotNull are accepted by pushFilters: the physical plan
    keeps NO Filter node (the scan already applied them) and the result
    is correct; an unsupported predicate (>) stays as a plan Filter."""
    df = _read(registered, src_dir)
    pushed = df.filter((F.col("page") == "NextSong") & F.col("artist").isNotNull())
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    # "Filter (" is the Filter NODE rendering; bare "Filter" also appears
    # in the scan's "RuntimeFilters: []" annotation.
    assert "Filter (" not in plan, plan
    assert {r["artist"] for r in pushed.collect()} == {"A", "B", "C"}

    mixed = df.filter((F.col("page") == "NextSong") & (F.col("length") > 1.0))
    plan = mixed._jdf.queryExecution().executedPlan().toString()
    assert "Filter (" in plan  # the > predicate was returned as unsupported
    assert {r["artist"] for r in mixed.collect()} == {"A", "B"}


def test_option_validation(registered, src_dir):
    with pytest.raises(Exception, match="requires option 'path'"):
        registered.read.format("jsonpaths").schema(SCHEMA).load().collect()
    with pytest.raises(Exception, match="paths for"):
        _read(registered, src_dir, paths="artist,page").collect()
    with pytest.raises(Exception, match="schema"):
        (
            registered.read.format("jsonpaths")
            .option("path", src_dir)
            .load()
            .collect()
        )


def test_stream_reads_incrementally_with_checkpoint(registered, tmp_path):
    """Streaming half: Trigger.AvailableNow drains the directory, a second
    run with the same checkpoint picks up ONLY files appended since —
    exactly-once file tracking through the {"n": files_consumed} offset.
    Sink is parquet (the memory sink does not support checkpoint
    recovery); source, sink, and checkpoint live in sibling dirs."""
    import json as _json

    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, chunk in enumerate((ROWS[:2], ROWS[2:])):
        with open(os.path.join(src, f"part{i}.json"), "w") as fh:
            for r in chunk:
                fh.write(_json.dumps(r) + "\n")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            registered.readStream.format("jsonpaths")
            .schema(SCHEMA)
            .option("path", src)
            .option("jsonpaths", PATHS)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        return registered.read.schema(SCHEMA).parquet(out).collect()

    first = drain()
    assert len(first) == len(ROWS)

    with open(os.path.join(src, "part2.json"), "w") as fh:
        fh.write(_json.dumps({"artist": "Z", "page": "NextSong", "ts": 9000,
                              "length": 9.9, "sessionId": 42}) + "\n")
    second = drain()
    # cumulative = first batch + ONLY the appended file (no reprocessing)
    assert len(second) == len(ROWS) + 1
    z = [r for r in second if r["artist"] == "Z"]
    assert len(z) == 1 and z[0]["session_id"] == 42


def test_int_overflow_nulls_like_try_cast(registered, tmp_path):
    """ADVICE r3: a JSON number exceeding the target int width (a corrupt
    sessionId of 2^40 against int32, or 2^70 against int64) must coerce to
    NULL like try_cast — not pass int() unchanged and blow up pa.array()
    with ArrowInvalid, aborting the whole load on one bad row. In-range
    rows in the same file must survive."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "part0.json"), "w") as fh:
        fh.write(json.dumps({"artist": "ok", "page": "NextSong", "ts": 2**70,
                             "length": 1.0, "sessionId": 2**40}) + "\n")
        fh.write(json.dumps({"artist": "edge", "page": "NextSong",
                             "ts": 2**63 - 1, "length": 1.0,
                             "sessionId": -(2**31)}) + "\n")
        fh.write(json.dumps(ROWS[0]) + "\n")
    rows = {
        r["artist"]: r
        for r in (
            registered.read.format("jsonpaths")
            .schema(SCHEMA)
            .option("path", src)
            .option("jsonpaths", PATHS)
            .load()
            .collect()
        )
    }
    assert len(rows) == 3
    assert rows["ok"]["session_id"] is None and rows["ok"]["ts"] is None
    assert rows["edge"]["session_id"] == -(2**31) and rows["edge"]["ts"] == 2**63 - 1
    assert rows["A"]["session_id"] == 7

    # the stream reader shares _coerce -> same semantics (the documented
    # batch/stream differential equivalence on malformed input)
    from cdw_spark.sources.pyds import JsonPathsStreamReader

    sr = JsonPathsStreamReader(SCHEMA, {"path": src, "jsonpaths": PATHS})
    streamed, _ = sr.read(sr.initialOffset())
    by_artist = {t[1]: t for t in streamed}
    assert by_artist["ok"][5] is None and by_artist["ok"][3] is None
    assert by_artist["edge"][5] == -(2**31)


def test_stream_offset_anchor_detects_listing_shift(tmp_path):
    """ADVICE r3: positional stream offsets are anchored to the last
    consumed filename. A new file sorting lexicographically BEFORE
    consumed names (or a consumed file deleted) must raise loudly instead
    of silently re-slicing the listing into duplicated/skipped rows."""
    from cdw_spark.sources.pyds import JsonPathsStreamReader

    src = str(tmp_path / "src")
    os.makedirs(src)

    def write(name: str, rows):
        with open(os.path.join(src, name), "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    write("part5.json", ROWS[:2])
    sr = JsonPathsStreamReader(SCHEMA, {"path": src, "jsonpaths": PATHS})
    batch1, off1 = sr.read(sr.initialOffset())
    assert len(batch1) == 2 and off1 == {"n": 1, "last": "part5.json"}

    # append a file that sorts BEFORE the consumed one -> listing shifts
    write("part0.json", ROWS[2:])
    with pytest.raises(RuntimeError, match="sorts before consumed"):
        sr.read(off1)
    with pytest.raises(RuntimeError, match="sorts before consumed"):
        sr.readBetweenOffsets(sr.initialOffset(), off1)

    # monotonic naming keeps working: a later-sorting file is consumed
    # incrementally and re-anchors the offset
    os.remove(os.path.join(src, "part0.json"))
    write("part7.json", ROWS[2:])
    batch2, off2 = sr.read(off1)
    assert len(batch2) == 2 and off2 == {"n": 2, "last": "part7.json"}

    # deleting a consumed file also trips the anchor
    os.remove(os.path.join(src, "part5.json"))
    with pytest.raises(RuntimeError, match="consumed file was"):
        sr.read(off2)


def test_stream_staging_matches_batch_copy(registered, tmp_path):
    """Capstone: the reference's COPY staging_events load (S1, positional
    JSONPaths with try_cast coercion incl. DECIMAL(9,0) rounding and
    userId='' -> NULL) run as a STREAM through the pluggable source must
    equal the batch loader row-for-row on the same Sparkify-shaped files
    — continuous ingestion with identical semantics."""
    from cdw_spark.schemas import STAGING_EVENTS
    from cdw_spark.sources.json_loader import EVENTS_JSONPATHS, load_staging_events
    from tests.sparkify_data import generate

    log_path, _ = generate(str(tmp_path / "fx"), n_songs=30, n_events=400)

    expected = sorted(load_staging_events(registered, log_path).collect(), key=str)

    out = str(tmp_path / "out")
    q = (
        registered.readStream.format("jsonpaths")
        .schema(STAGING_EVENTS)
        .option("path", log_path)
        .option("jsonpaths", ",".join(src or "" for src, _ in EVENTS_JSONPATHS))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(
        registered.read.schema(STAGING_EVENTS).parquet(out).collect(), key=str
    )
    assert len(got) == 400
    assert got == expected


def test_writer_round_trips_through_reader(registered, tmp_path):
    """The UNLOAD half: writing through format('jsonpaths') emits JSONL
    whose fields carry the SOURCE names from the spec (the inverse
    positional mapping), so the same spec reads it straight back —
    a full COPY -> transform -> UNLOAD -> COPY cycle inside the one
    pluggable format. Two-phase commit: only part-* files plus _SUCCESS
    remain after a successful job."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "part0.json"), "w") as fh:
        for r in ROWS:
            fh.write(json.dumps(r) + "\n")
    df = (
        registered.read.format("jsonpaths")
        .schema(SCHEMA)
        .option("path", src)
        .option("jsonpaths", PATHS)
        .load()
    )
    out = str(tmp_path / "out")
    (
        df.write.format("jsonpaths")
        .option("path", out)
        .option("jsonpaths", PATHS)
        .mode("append")
        .save()
    )
    files = sorted(os.listdir(out))
    assert "_SUCCESS" in files
    assert all(f == "_SUCCESS" or f.startswith("part-") for f in files), files
    # ADVICE r4: committed names are deterministic part-NNNNN.jsonl
    # (task partition id only — no uuid leaking into the final name)
    import re

    assert all(
        f == "_SUCCESS" or re.fullmatch(r"part-\d{5}\.jsonl", f) for f in files
    ), files
    # field names in the emitted JSONL are the SOURCE names (sessionId,
    # not session_id); the NULL-slot column (event_id) is dropped
    with open(os.path.join(out, [f for f in files if f != "_SUCCESS"][0])) as fh:
        first = json.loads(fh.readline())
    assert "sessionId" in first and "session_id" not in first
    assert "event_id" not in first

    back = (
        registered.read.format("jsonpaths")
        .schema(SCHEMA)
        .option("path", out)
        .option("jsonpaths", PATHS)
        .load()
    )
    orig = {tuple(r) for r in df.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == orig


def test_stream_writer_closes_the_loop(registered, tmp_path):
    """Continuous COPY -> UNLOAD -> COPY: stream-read a directory through
    the jsonpaths source, stream-WRITE it through the jsonpaths sink,
    then batch-read the sink directory with the same spec — row set
    equal, file names monotonic (part-<batch>-<task>), so the sink
    directory is itself a valid jsonpaths STREAM source."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, chunk in enumerate((ROWS[:2], ROWS[2:])):
        with open(os.path.join(src, f"part{i}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps(r) + "\n")
    out = str(tmp_path / "unload")
    ckpt = str(tmp_path / "ckpt")
    q = (
        registered.readStream.format("jsonpaths")
        .schema(SCHEMA)
        .option("path", src)
        .option("jsonpaths", PATHS)
        .load()
        .writeStream.format("jsonpaths")
        .option("path", out)
        .option("jsonpaths", PATHS)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    files = sorted(os.listdir(out))
    assert files and all(f.startswith("part-") for f in files), files
    back = (
        registered.read.format("jsonpaths")
        .schema(SCHEMA)
        .option("path", out)
        .option("jsonpaths", PATHS)
        .load()
    )
    orig = (
        registered.read.format("jsonpaths")
        .schema(SCHEMA)
        .option("path", src)
        .option("jsonpaths", PATHS)
        .load()
    )
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in orig.collect()}
