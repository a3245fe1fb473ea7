"""Catalog management: register / create / drop / reset tables.

Mirrors /root/reference/create_tables.py (DROP IF EXISTS x7 then CREATE IF
NOT EXISTS x7 — a full idempotent reset, create_tables.py:6-27,40-41) on the
Spark session catalog, plus registration of the driver's parquet fixture
tables (TESTDATA.md) as temp views so the whole engine is queryable through
``spark.sql``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import ALL_TABLES

# Driver-generated fixture tables (/root/testdata/sf*/..., TESTDATA.md).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_fixture(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan: column pruning + predicate
    pushdown come free from the declarative plan — never .cache() these;
    at 100 TB the scan with pushed filters IS the fast path.

    Timestamp normalization: fixture generations have varied — events.ts
    has been TIMESTAMP(NANOS) (vectorized reader rejects; read nanos as
    long and truncate) and plain timestamp[us] with isAdjustedToUTC=false
    (Spark 4 infers TIMESTAMP_NTZ, which functions like ``unix_millis``
    reject). Both are normalized to session-UTC TimestampType: under a UTC
    session the NTZ→LTZ cast is wall-clock-identical, which is exactly how
    DuckDB reads the same parquet (naive timestamp), so oracles agree."""
    # Engine semantic (SURVEY.md §4): all timestamp arithmetic is UTC — the
    # reference's `TIMESTAMP 'epoch' + …` is UTC arithmetic. Pin the session
    # TZ here so results are correct even on a caller-built session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        df = spark.read.parquet(path)
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_fixtures(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, tables: tuple[str, ...] = FIXTURE_TABLES
) -> dict[str, DataFrame]:
    """Register every fixture parquet as a temp view named after the table."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_fixture(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


# --- reference DDL lifecycle (create_tables.py equivalents) ---------------


def drop_tables(spark: SparkSession, names: tuple[str, ...] | None = None) -> None:
    """DROP TABLE IF EXISTS for each table — create_tables.py:6-15."""
    for name in names or tuple(ALL_TABLES):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def create_tables(spark: SparkSession, names: tuple[str, ...] | None = None) -> None:
    """CREATE TABLE IF NOT EXISTS with the reference schemas
    (sql_queries.py:24-118) as managed parquet tables."""
    for name in names or tuple(ALL_TABLES):
        schema = ALL_TABLES[name]
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
        spark.sql(f"CREATE TABLE IF NOT EXISTS {name} ({cols}) USING parquet")


def reset(spark: SparkSession) -> None:
    """Full reset: drop-then-create, idempotent — the create_tables.py main
    (create_tables.py:30-43)."""
    drop_tables(spark)
    create_tables(spark)
