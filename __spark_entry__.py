"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything is delegated to the ``cdw_spark`` package registry
(cdw_spark/registry.py): each engine operator registers a named
(spark_fn, oracle_sql) pair next to its implementation; this module
just exposes the registry in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from cdw_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is ``star_fact_join`` — the reference's songplays fact
    query shape (filter + 3-key rounded equi-join + DISTINCT + casts,
    /root/reference/sql_queries.py:140-166) on the fixture tables.
    """
    specs = load_all()
    return specs["star_fact_join"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    large-scale pipeline layer). Each callable takes (spark, sf_dir) and
    returns a DataFrame with stable, oracle-matching column aliases."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL for every SQL-expressible query; omitted for
    engine-specific ops (LSH candidates, sketches, streaming state) which
    get the driver's rows-only check."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
