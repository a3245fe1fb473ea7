#!/usr/bin/env python
"""Build the 64x derived embeddings table (/tmp/cdw_scale64) for the
kNN-graph build scale measurement (VERDICT r9 #4: a third doubling point
beyond the 8x table, embeddings only).

Construction mirrors make_scale8.py's embeddings rule but with 64
single-level replicas: replica i shifts vec_id by i*SHIFT and cyclically
rotates the 64 coordinates by i positions. All 64 rotations are distinct
(dim = 64), so no vector acquires an exact twin — true near-neighbor
pairs grow 64x for 64x rows, keeping pair-emitting graph ops honest.
Stacking 8x-of-8x would NOT have this property: replicas (i, j) and
(j, i) would carry the same rotation i+j of the same base vector, giving
every vector exact twins and a quadratic artifact. Usage:
python scripts/make_scale64_embeddings.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdw_spark.catalog import load_fixture
from cdw_spark.session import get_spark

SHIFT = 10_000_000
DIM = 64


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = "/tmp/cdw_scale64"
    spark = get_spark(app_name="make-scale64")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_fixture(spark, sf_dir, "embeddings")
    reps = None
    for i in range(64):
        r = base.withColumn("vec_id", F.col("vec_id") + F.lit(i * SHIFT))
        if i > 0:
            r = r.withColumn(
                "embedding",
                F.expr(
                    f"concat(slice(embedding, {i} + 1, {DIM} - {i}), "
                    f"slice(embedding, 1, {i}))"
                ),
            )
        reps = r if reps is None else reps.unionAll(r)
    reps.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print("embeddings 64x done")
    spark.stop()


if __name__ == "__main__":
    main()
