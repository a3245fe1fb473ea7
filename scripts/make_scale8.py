#!/usr/bin/env python
"""Build the 8x derived scale dataset (/tmp/cdw_scale8) used by the
BENCHNOTES scale-up measurement: each table unioned 8 times with replica-
shifted keys, so join/group cardinalities grow linearly and no artificial
key collisions appear. Usage: python scripts/make_scale8.py [sf_dir]"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdw_spark.catalog import load_fixture
from cdw_spark.session import get_spark

SHIFT = 10_000_000
KEYS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = "/tmp/cdw_scale8"
    spark = get_spark(app_name="make-scale8")
    spark.sparkContext.setLogLevel("ERROR")
    for table, keys in KEYS.items():
        base = load_fixture(spark, sf_dir, table)
        reps = None
        for i in range(8):
            r = base
            for k in keys:
                r = r.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            if table == "documents" and i > 0:
                # Per-replica vocabulary substitution: every word gets a
                # replica suffix (alphanumeric, so [a-z0-9]+ tokenizers
                # still see one token). Each replica is an ISOMORPHIC
                # corpus — within-replica shingle/near-dup structure is
                # preserved exactly, cross-replica overlap is zero — so
                # true near-dup pairs grow 8x for 8x docs instead of the
                # 64x that verbatim copies produce (every doc had 7 exact
                # twins, drowning pair-emitting dedup ops in replica
                # artifacts).
                r = r.withColumn(
                    "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1q{i}")
                )
            if table == "embeddings" and i > 0:
                # Rotate the embedding coordinates by i positions per
                # replica. Verbatim replicas give every vector 7 exact
                # twins, so TRUE near-neighbor pairs grow 64x instead of
                # 8x and every pair-emitting similarity/graph operator
                # looks quadratic for a reason that has nothing to do
                # with its plan. A cyclic rotation preserves the norm
                # and each replica's internal pair structure (fair 8x:
                # 8x vectors, ~8x near pairs) while decorrelating
                # cross-replica directions.
                dim = 64
                r = r.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {i} + 1, {dim} - {i}), "
                        f"slice(embedding, 1, {i}))"
                    ),
                )
            reps = r if reps is None else reps.unionAll(r)
        reps.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(table, "done")


if __name__ == "__main__":
    main()
