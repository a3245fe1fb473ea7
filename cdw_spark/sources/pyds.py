"""``jsonpaths`` — a Python DataSource (Spark 4 ``pyspark.sql.datasource``)
implementing Redshift COPY's positional JSONPaths ingestion as a
first-class pluggable format.

The reference's S1 load (``staging_events_copy``, /root/reference/
sql_queries.py:122-128) maps JSON fields onto staging columns
POSITIONALLY via a JSONPaths file. ``sources/json_loader.py`` expresses
that as a schema-on-read projection over ``spark.read.json``; this module
is the same semantics as an engine *extension point* — register once
(``spark.dataSource.register(JsonPathsDataSource)``) and any consumer
reads ``spark.read.format("jsonpaths")`` like a built-in format, or
writes it back (``df.write.format("jsonpaths")`` — the UNLOAD half:
JSONL with the spec's source field names, one file per task, two-phase
commit with _SUCCESS).

Usage::

    spark.dataSource.register(JsonPathsDataSource)
    df = (spark.read.format("jsonpaths")
          .schema(staging_schema)              # target column order + types
          .option("path", "/data/events/")     # file, dir, or glob
          .option("jsonpaths", "artist,,ts")   # source field per column;
          .load())                             #   empty token = NULL slot

Scale shape: ``partitions()`` plans ONE InputPartition per input file —
the COPY parallelism model (one slice per S3 object) — so a directory of
N files reads as N concurrent tasks with no data through the driver.
``read()`` emits Arrow RecordBatches (the vectorized Python-source path,
no row-at-a-time pickling), and ``pushFilters`` accepts EqualTo /
IsNotNull so driver-planned predicates drop rows inside the scan before
they ever reach the JVM. At 100 TB the same class reads object storage
by swapping the ``glob`` listing for the store's list API; everything
else is already per-file streaming with bounded memory per batch.
"""

from __future__ import annotations

import glob as _glob
import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    IsNotNull,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructType,
)

_BATCH_ROWS = 10_000


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _list_inputs(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            p
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
            and os.path.isfile(p := os.path.join(path, f))
        )
    matches = sorted(_glob.glob(path))
    if not matches:
        raise FileNotFoundError(f"jsonpaths source: no input matches {path!r}")
    return matches


def _coerce(value, dtype):
    """JSON scalar -> python value matching the Spark column type — the
    COPY parse-and-coerce step with try_cast semantics: unPARSEABLE
    values become NULL (the real Sparkify log has userId='' on
    logged-out rows; an error cast would abort the load on one bad row,
    matching the batch loader's try_cast choice in json_loader.py).
    UnSUPPORTED column TYPES still raise loudly."""
    if value is None:
        return None
    if isinstance(dtype, StringType):
        return value if isinstance(value, str) else json.dumps(value)
    if isinstance(dtype, (LongType, IntegerType)):
        try:
            if isinstance(value, str):
                value = value.strip()
                if not value:
                    return None
            iv = int(value)
        except (TypeError, ValueError):
            return None
        # try_cast also NULLs overflow: without the bound check an
        # out-of-range JSON number (say a corrupt sessionId of 2^40)
        # passes int() and then pa.array(..., int32) raises ArrowInvalid,
        # aborting the whole load on one bad row — the opposite of the
        # documented semantics and of json_loader's try_cast.
        bits = 31 if isinstance(dtype, IntegerType) else 63
        if not -(1 << bits) <= iv < (1 << bits):
            return None
        return iv
    if isinstance(dtype, DoubleType):
        try:
            return float(value)
        except (TypeError, ValueError):
            return None
    if isinstance(dtype, DecimalType):
        import decimal

        try:
            # Spark's double->decimal cast goes through the double's
            # SHORTEST decimal representation (BigDecimal.valueOf), so
            # str(float(v)) reproduces it; HALF_UP matches Spark/Redshift.
            d = decimal.Decimal(str(float(value))).quantize(
                decimal.Decimal(1).scaleb(-dtype.scale),
                rounding=decimal.ROUND_HALF_UP,
            )
            if len(d.as_tuple().digits) - dtype.scale > dtype.precision - dtype.scale:
                return None  # overflow -> NULL, as try_cast
            return d
        except (TypeError, ValueError, ArithmeticError):
            return None
    raise TypeError(f"jsonpaths source: unsupported column type {dtype}")


class JsonPathsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonpaths source requires option 'path'")
        spec = options.get("jsonpaths", "")
        # one source field per target column, in column order; '' -> NULL
        self.paths: list[str | None] = [
            (tok or None) for tok in spec.split(",")
        ] if spec else [f.name for f in schema.fields]
        if len(self.paths) != len(schema.fields):
            raise ValueError(
                f"jsonpaths source: {len(self.paths)} paths for "
                f"{len(schema.fields)} columns"
            )
        self._eq: dict[str, object] = {}
        self._notnull: set[str] = set()

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        """Accept EqualTo / IsNotNull on top-level columns; everything
        else is returned as unsupported and stays in the Spark plan."""
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1:
                self._eq[f.attribute[0]] = f.value
            elif isinstance(f, IsNotNull) and len(f.attribute) == 1:
                self._notnull.add(f.attribute[0])
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        return [_FilePartition(p) for p in _list_inputs(self.path)]

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema)
        fields = self.schema.fields
        idx = {f.name: i for i, f in enumerate(fields)}
        eq = [(idx[c], v) for c, v in self._eq.items() if c in idx]
        nn = [idx[c] for c in self._notnull if c in idx]

        cols: list[list] = [[] for _ in fields]

        def flush():
            batch = pa.RecordBatch.from_arrays(
                [
                    pa.array(col, type=arrow_schema.field(i).type)
                    for i, col in enumerate(cols)
                ],
                schema=arrow_schema,
            )
            for col in cols:
                col.clear()
            return batch

        with open(partition.path, encoding="utf-8") as fh:
            n = 0
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                obj = json.loads(line)
                row = [
                    _coerce(obj.get(src), fields[i].dataType) if src else None
                    for i, src in enumerate(self.paths)
                ]
                if any(row[i] != v for i, v in eq):
                    continue
                if any(row[i] is None for i in nn):
                    continue
                for i, v in enumerate(row):
                    cols[i].append(v)
                n += 1
                if n == _BATCH_ROWS:
                    yield flush()
                    n = 0
            if n:
                yield flush()


class JsonPathsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonpaths"

    def schema(self) -> StructType:
        raise ValueError(
            "jsonpaths source: pass the staging schema explicitly via "
            ".schema(...) — positional mapping has no self-describing schema "
            "(the JSONPaths file in the reference doesn't either; the target "
            "table supplies it, sql_queries.py:25-47)"
        )

    def reader(self, schema: StructType) -> JsonPathsReader:
        return JsonPathsReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> "JsonPathsStreamReader":
        return JsonPathsStreamReader(schema, self.options)

    def streamWriter(self, schema: StructType, overwrite: bool) -> "JsonPathsStreamWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonpaths stream writer requires option 'path'")
        spec = self.options.get("jsonpaths", "")
        paths = [
            (tok or None) for tok in spec.split(",")
        ] if spec else [f.name for f in schema.fields]
        if len(paths) != len(schema.fields):
            raise ValueError(
                f"jsonpaths stream writer: {len(paths)} paths for "
                f"{len(schema.fields)} columns"
            )
        return JsonPathsStreamWriter(schema, paths, path)

    def writer(self, schema: StructType, overwrite: bool) -> "JsonPathsWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonpaths writer requires option 'path'")
        spec = self.options.get("jsonpaths", "")
        paths = [
            (tok or None) for tok in spec.split(",")
        ] if spec else [f.name for f in schema.fields]
        if len(paths) != len(schema.fields):
            raise ValueError(
                f"jsonpaths writer: {len(paths)} paths for "
                f"{len(schema.fields)} columns"
            )
        if overwrite and os.path.isdir(path):
            for f in os.listdir(path):
                if f.startswith("part-") or f == "_SUCCESS":
                    os.remove(os.path.join(path, f))
        return JsonPathsWriter(schema, paths, path)


class JsonPathsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the ``jsonpaths`` source: monitor an append-only
    directory of immutable JSONL files — the continuous-COPY ingestion
    pattern (Redshift users cron COPY per new S3 prefix; here the same
    mapping is a `readStream` with exactly-once file tracking).

    Offsets are {"n": <files consumed>, "last": <basename of the last
    consumed file>} over the lexicographically sorted listing; files must
    be written once and named monotonically (part-0001 style) — the same
    contract as Spark's built-in file stream source. The contract is
    ENFORCED, not just documented: every read re-anchors the positional
    index against the recorded filename and raises if the listing shifted
    (a new file sorting before consumed names, or a consumed file
    deleted), converting silent row duplication/skips into a loud error.
    ``readBetweenOffsets`` replays any [start, end) slice for recovery, so
    the source is exactly-once under checkpointing."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonpaths stream requires option 'path'")
        spec = options.get("jsonpaths", "")
        self.paths = [
            (tok or None) for tok in spec.split(",")
        ] if spec else [f.name for f in schema.fields]
        if len(self.paths) != len(schema.fields):
            raise ValueError(
                f"jsonpaths stream: {len(self.paths)} paths for "
                f"{len(schema.fields)} columns"
            )

    def initialOffset(self) -> dict:
        return {"n": 0, "last": None}

    def _files(self) -> list[str]:
        try:
            return _list_inputs(self.path)
        except FileNotFoundError:
            return []

    def _validate(self, files: Sequence[str], offset: dict) -> None:
        """Positional offsets are only safe while the sorted listing's
        prefix is stable; check the recorded anchor filename still sits at
        index n-1. Offsets from pre-anchor checkpoints (no "last" key)
        pass unchecked — same behavior as before, just not silently wrong
        when the anchor IS present."""
        n = offset.get("n", 0)
        last = offset.get("last")
        if n <= 0 or last is None:
            return
        found = os.path.basename(files[n - 1]) if n <= len(files) else None
        if found != last:
            raise RuntimeError(
                f"jsonpaths stream: offset expects listing[{n - 1}] == "
                f"{last!r} but found {found!r} — a file was added that "
                "sorts before consumed names, or a consumed file was "
                "deleted. Positional offsets would silently duplicate or "
                "skip rows; fix the input naming or restart from a fresh "
                "checkpoint."
            )

    def _rows(self, files: Sequence[str]):
        fields = self.schema.fields
        for path in files:
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    obj = json.loads(line)
                    yield tuple(
                        _coerce(obj.get(src), fields[i].dataType) if src else None
                        for i, src in enumerate(self.paths)
                    )

    def read(self, start: dict):
        files = self._files()
        self._validate(files, start)
        n0 = start["n"]
        end = {
            "n": len(files),
            "last": os.path.basename(files[-1]) if files else start.get("last"),
        }
        # materialized list, not a generator: the runtime's prefetch cache
        # copy.copy()s the returned iterator for replay, and a
        # SimpleDataSourceStreamReader reads on the DRIVER by design (the
        # low-throughput control path; bulk backfill belongs to the batch
        # reader's per-file partitions).
        return list(self._rows(files[n0:])), end

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._files()
        self._validate(files, start)
        self._validate(files, end)
        return list(self._rows(files[start["n"]:end["n"]]))


class _FileCommit(WriterCommitMessage):
    def __init__(self, filename: str, rows: int) -> None:
        self.filename = filename
        self.rows = rows


class JsonPathsWriter(DataSourceArrowWriter):
    """Batch writer — the UNLOAD half of the COPY story: each task turns
    its Arrow batches back into JSONL, mapping column i to the source
    field named by the jsonpaths spec (the inverse of the reader's
    positional projection; NULL-slot columns are dropped). One file per
    task keeps the COPY slice-parallelism symmetry: N write tasks emit N
    files a later COPY reads as N slices.

    Two-phase commit: tasks write to `_tmp_<uuid>` names and return them
    as commit messages; the driver's commit() renames the complete set
    into place and stamps _SUCCESS, abort() deletes the partials — a
    failed job never leaves half-visible output."""

    def __init__(self, schema: StructType, paths: list[str | None], path: str) -> None:
        self.field_names = [
            src if src else f.name for src, f in zip(paths, schema.fields)
        ]
        self.drop = [src is None for src in paths]
        self.path = path

    def write(self, iterator):
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"_tmp_{uuid.uuid4().hex}_{pid:05d}.jsonl"
        rows = 0
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, name), "w", encoding="utf-8") as fh:
            for batch in iterator:
                cols = [c.to_pylist() for c in batch.columns]
                for r in range(batch.num_rows):
                    obj = {
                        self.field_names[i]: cols[i][r]
                        for i in range(len(cols))
                        if not self.drop[i]
                    }
                    fh.write(json.dumps(obj, default=str) + "\n")
                    rows += 1
        return _FileCommit(name, rows)

    def commit(self, messages):
        total = 0
        for m in messages:
            if m is None:
                continue
            final = m.filename.rsplit("_", 1)[1]  # _tmp_<uuid>_NNNNN.jsonl -> NNNNN.jsonl
            os.replace(
                os.path.join(self.path, m.filename),
                os.path.join(self.path, f"part-{final}"),
            )
            total += m.rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(str(total))

    def abort(self, messages):
        for m in messages or []:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


class JsonPathsStreamWriter(DataSourceStreamArrowWriter):
    """Streaming UNLOAD: each micro-batch lands as monotonically named
    ``part-<batchId>-<task>.jsonl`` files (the same inverse positional
    field mapping as the batch writer), so the OUTPUT directory itself
    satisfies the stream READER's monotonic-naming contract — a
    jsonpaths stream can be re-ingested exactly-once downstream, closing
    the continuous COPY -> transform -> UNLOAD -> COPY loop. Per-batch
    two-phase commit: tasks emit _tmp names, commit(batchId) renames;
    replayed batches after recovery overwrite the same final names
    (idempotent sink)."""

    def __init__(self, schema: StructType, paths: list[str | None], path: str) -> None:
        self.field_names = [
            src if src else f.name for src, f in zip(paths, schema.fields)
        ]
        self.drop = [src is None for src in paths]
        self.path = path

    def write(self, iterator):
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"_tmp_{uuid.uuid4().hex}_{pid:05d}.jsonl"
        os.makedirs(self.path, exist_ok=True)
        rows = 0
        with open(os.path.join(self.path, name), "w", encoding="utf-8") as fh:
            for batch in iterator:
                cols = [c.to_pylist() for c in batch.columns]
                for r in range(batch.num_rows):
                    obj = {
                        self.field_names[i]: cols[i][r]
                        for i in range(len(cols))
                        if not self.drop[i]
                    }
                    fh.write(json.dumps(obj, default=str) + "\n")
                    rows += 1
        return _FileCommit(name, rows)

    def commit(self, messages, batchId) -> None:
        for m in messages:
            if m is None:
                continue
            task_part = m.filename.rsplit("_", 1)[1]  # NNNNN.jsonl
            os.replace(
                os.path.join(self.path, m.filename),
                os.path.join(self.path, f"part-{batchId:08d}-{task_part}"),
            )

    def abort(self, messages, batchId) -> None:
        for m in messages or []:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass
