"""External-table format contract: parquet / ORC / CSV / JSON-lines / XML
readers+writers with engine-pinned options.

The reference ingests JSON (COPY, sources/json_loader.py) and stores
tables in Redshift's columnar format; the Spark-native engine generalizes
both ends: columnar at rest (parquet default, ORC supported — both get
predicate pushdown, column pruning, and min/max footer skipping from the
vectorized readers) and row formats (CSV/JSONL/XML — XML via Spark 4's
built-in source with a pinned rowTag) at the edges for interchange.

Rules pinned here, not left to caller defaults:
- every read takes an explicit schema (schema-on-read drift is how a
  100 TB ingest silently corrupts: inference samples files and can flip a
  column's type between loads);
- CSV writes+reads use header + explicit nullValue so round-trips preserve
  NULL vs empty-string;
- writers default to snappy parquet / zlib ORC, overwrite mode is opt-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

COLUMNAR = ("parquet", "orc")
ROW_FORMATS = ("csv", "json", "xml")
_NULL_TOKEN = "\\N"  # classic interchange null marker; survives CSV quoting
_XML_ROW_TAG = "row"  # Spark 4 built-in XML source (SPARK-44265): rowTag is
# mandatory on read, so pin one tag for round-trips


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: tuple[str, ...] = (),
) -> None:
    w = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        w = w.option("header", True).option("nullValue", _NULL_TOKEN)
    if fmt == "xml":
        w = w.option("rootTag", "rows").option("rowTag", _XML_ROW_TAG).option(
            "nullValue", _NULL_TOKEN
        )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
) -> DataFrame:
    r = spark.read.format(fmt).schema(schema)
    if fmt == "csv":
        r = r.option("header", True).option("nullValue", _NULL_TOKEN)
    if fmt == "xml":
        r = r.option("rowTag", _XML_ROW_TAG).option("nullValue", _NULL_TOKEN)
    return r.load(path)


def read_table_evolved(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
) -> DataFrame:
    """Schema-evolution read for columnar at-rest tables: union the
    schemas of every file footer (``mergeSchema``) so waves of ingest
    that ADDED columns read as one relation, older files padding the new
    columns with NULL. The explicit-schema rule of ``read_table`` still
    applies to interchange formats — evolution is an at-rest concern, so
    this helper accepts columnar formats only (at 100 TB, schema drift
    between ingest waves is the norm, and failing the whole scan on an
    old footer is the outage)."""
    if fmt not in COLUMNAR:
        raise ValueError(f"schema evolution supported for {COLUMNAR}, not {fmt!r}")
    return spark.read.format(fmt).option("mergeSchema", True).load(path)
