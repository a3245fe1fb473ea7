"""Differential-test harness: PySpark result vs DuckDB oracle.

Local mirror of the driver's correctness gate (__spark_entry__.py docstring):
for a query name, run the Spark DataFrame and the oracle SQL over the same
parquet fixtures and compare (a) row count, (b) sorted column names, (c) an
order-insensitive multiset of canonicalized row values. Used by
tests/test_oracle_contract.py so every registered oracle is proven
equivalent *before* the driver runs it.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os
from collections import Counter
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import DataFrame

from .catalog import FIXTURE_TABLES


def open_oracle(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the fixture tables pre-registered as views,
    exactly as the driver does."""
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v):
    """Engine-neutral value canonicalization."""
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        if v == v.to_integral_value():
            return ("num", str(v.quantize(decimal.Decimal(1))))
        return ("num", str(v.normalize()))
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("num", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        if v == int(v) and abs(v) < 1e15:
            return ("num", str(int(v)))
        return ("float", repr(v))
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_canon_cell(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    return ("str", str(v))


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    issues: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for i in self.issues[:8]:
            msg += f"\n    - {i}"
        return msg


def compare_frames(name: str, spark_df: DataFrame, oracle_sql: str, sf_dir: str) -> CompareResult:
    """Compare against the fixture-backed oracle (driver shape)."""
    return compare_with_connection(name, spark_df, oracle_sql, open_oracle(sf_dir))


def compare_with_connection(
    name: str, spark_df: DataFrame, oracle_sql: str, con: duckdb.DuckDBPyConnection
) -> CompareResult:
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]

    cur = con.execute(oracle_sql)
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = cur.fetchall()

    res = CompareResult(name, True, len(spark_rows), len(oracle_rows))

    if sorted(spark_cols) != sorted(oracle_cols):
        res.ok = False
        res.issues.append(f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
        return res
    if len(spark_rows) != len(oracle_rows):
        res.ok = False
        res.issues.append("row count mismatch")

    s_order = [spark_cols.index(c) for c in sorted(spark_cols)]
    o_order = [oracle_cols.index(c) for c in sorted(oracle_cols)]
    s_multiset = Counter(tuple(_canon_cell(row[i]) for i in s_order) for row in spark_rows)
    o_multiset = Counter(tuple(_canon_cell(row[i]) for i in o_order) for row in oracle_rows)
    if s_multiset != o_multiset:
        res.ok = False
        only_spark = list((s_multiset - o_multiset).items())[:3]
        only_oracle = list((o_multiset - s_multiset).items())[:3]
        res.issues.append(f"value mismatch; spark-only sample: {only_spark}")
        res.issues.append(f"oracle-only sample: {only_oracle}")
    return res
