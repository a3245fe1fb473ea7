"""Registry wiring engine operators to the driver contract.

Every operator the engine claims (SURVEY.md §2 + the large-scale-pipeline
layer) registers here as a named query: a PySpark callable ``(spark, sf_dir)
-> DataFrame`` and, when SQL-expressible, an equivalent ANSI-SQL oracle
string for DuckDB. ``__spark_entry__.py`` exposes exactly this registry.

Contract rules honored here (see /root/repo/__spark_entry__.py docstring):
- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver hashes values under sorted column names);
- oracles are omitted only for genuinely non-SQL-expressible ops (LSH,
  simhash, streaming state) — those get rows-only checks.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}

_SUITE_MODULES = (
    "cdw_spark.suite.relational",
    "cdw_spark.suite.timeparts",
    "cdw_spark.suite.analytics",
    "cdw_spark.suite.dedup",
    "cdw_spark.suite.text",
    "cdw_spark.suite.similarity",
    "cdw_spark.suite.windows",
    "cdw_spark.suite.multimodal",
    "cdw_spark.suite.streaming",
    "cdw_spark.suite.curation",
    "cdw_spark.suite.tpch",
)


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every suite module (idempotent) and return the registry."""
    for mod in _SUITE_MODULES:
        importlib.import_module(mod)
    return QUERIES
