#!/usr/bin/env python
"""Large-fixture differential sweep: run registered queries against their
DuckDB oracles at sf0.1 (10x the driver's grading fixture).

The driver's correctness gate runs at sf0.01; this sweep re-proves the
same hash-match at the bench fixture's scale, where scale-dependent
divergences live (decimal-width overflows, rank-tie shifts on larger
groups, candidate-set growth in the bucketed ANN/dedup paths). Streaming
queries are skipped by default (their fn() replays a bounded staged
stream); pass --streaming to sweep ONLY the stream_* queries instead —
their replay is bounded by staged-file count, so sf0.1 costs one
restage plus the per-batch work (VERDICT r9 #5: the sf0.1 record must
state covered/excluded per streaming query). Pass query-name substrings
as argv to restrict either mode.

Usage: python scripts/sweep_sf01.py [--streaming] [NAME...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CDW_SF01_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from pyspark.sql import SparkSession

    from cdw_spark.compare import compare_frames
    from cdw_spark.registry import load_all

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    args = sys.argv[1:]
    streaming = "--streaming" in args
    wanted = [a for a in args if a != "--streaming"]
    fails = []
    ran = 0
    for name, spec in reg.items():
        if spec.oracle is None or name.startswith("stream_") != streaming:
            continue
        if wanted and not any(w in name for w in wanted):
            continue
        t0 = time.time()
        try:
            res = compare_frames(name, spec.fn(spark, SF_DIR), spec.oracle, SF_DIR)
            ok = res.ok
            msg = "" if ok else str(res)
        except Exception as e:  # pragma: no cover - diagnostic path
            ok, msg = False, f"err: {e}"
        ran += 1
        print(f"[{'OK ' if ok else 'FAIL'}] {name} ({time.time() - t0:.1f}s) {msg[:300]}")
        if not ok:
            fails.append(name)
        spark.catalog.clearCache()
    print(f"\n{ran} compared at sf0.1; {len(fails)} failures: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
