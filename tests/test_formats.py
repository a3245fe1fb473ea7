"""Round-trip and pushdown proofs for the external-table format contract
(cdw_spark/sources/formats.py): every supported format preserves values —
including NULLs — and the columnar formats keep predicate pushdown."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdw_spark.catalog import load_fixture
from cdw_spark.sources.formats import COLUMNAR, ROW_FORMATS, read_table, write_table


@pytest.fixture(scope="module")
def sample(spark, sf_dir):
    # orders has strings, ints, decimals, dates; add an injected NULL column
    # to prove null round-trips (CSV is the format that usually loses them)
    return (
        load_fixture(spark, sf_dir, "orders")
        .limit(200)
        .withColumn(
            "maybe_null",
            F.when(F.col("o_orderkey") % 3 == 0, F.col("o_orderpriority")),
        )
    )


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", COLUMNAR + ROW_FORMATS)
def test_round_trip_preserves_values_and_nulls(spark, sample, fmt, tmp_path):
    path = str(tmp_path / f"rt_{fmt}")
    df = sample
    if fmt == "csv":  # CSV has no date/decimal metadata; pin via schema read
        df = df.withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    write_table(df, path, fmt=fmt)
    back = read_table(spark, path, df.schema, fmt=fmt)
    assert back.schema == df.schema
    assert _multiset(back) == _multiset(df)
    assert back.filter(F.col("maybe_null").isNull()).count() == df.filter(
        F.col("maybe_null").isNull()
    ).count() > 0


@pytest.mark.parametrize("fmt", COLUMNAR)
def test_columnar_pushdown_survives_round_trip(spark, sample, fmt, tmp_path):
    """Filters must reach the scan (PushedFilters) and projection must prune
    the read schema for both columnar formats."""
    path = str(tmp_path / f"pd_{fmt}")
    write_table(sample, path, fmt=fmt)
    q = (
        read_table(spark, path, sample.schema, fmt=fmt)
        .filter(F.col("o_orderkey") < 100)
        .select("o_orderkey", "o_totalprice")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThan(o_orderkey,100)" in plan
    assert "o_comment" not in plan.split("ReadSchema")[-1]


def test_partitioned_write_prunes_partitions(spark, sample, tmp_path):
    """partitionBy layout + partition filter => PartitionFilters prune, the
    non-matching directories are never opened."""
    path = str(tmp_path / "part")
    write_table(sample, path, partition_by=("o_orderstatus",))
    q = read_table(
        spark, path, sample.drop("o_orderstatus").schema
    ).filter(F.col("o_orderstatus") == "F")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]


@pytest.mark.parametrize("fmt", COLUMNAR)
def test_schema_evolution_merge(spark, fmt, tmp_path):
    """Ingest waves that add columns must read as one relation: wave 1
    lacks the column added in wave 2; the merged read pads it with NULL
    for old files and keeps values for new ones."""
    from cdw_spark.sources.formats import read_table_evolved

    path = str(tmp_path / f"evo_{fmt}")
    w1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    w1.write.format(fmt).mode("append").save(path)
    w2 = spark.createDataFrame(
        [(3, "c", 9.5)], "id long, name string, score double"
    )
    w2.write.format(fmt).mode("append").save(path)

    merged = read_table_evolved(spark, path, fmt=fmt)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 9.5)}

    with pytest.raises(ValueError, match="schema evolution supported"):
        read_table_evolved(spark, path, fmt="csv")
