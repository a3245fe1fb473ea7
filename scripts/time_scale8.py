"""Warmed per-query timing at sf0.1 vs the 8x derived dataset
(/tmp/cdw_scale8, built by make_scale8.py) — the BENCHNOTES scale-ratio
evidence. Usage: python scripts/time_scale8.py NAME [NAME...]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdw_spark.registry import load_all
from cdw_spark.session import get_spark


def run_once(spark, spec, sf_dir):
    t0 = time.time()
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    # untimed: free localCheckpoint blocks between measurements (JVM RDD
    # GC is lazy; leaked storage inflates later queries — the bench.py
    # round-8 lesson)
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist()
    return dt


def main():
    names = sys.argv[1:]
    spark = get_spark(app_name="time-scale8")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    print("| query | sf0.1 | 8x | ratio |")
    print("|---|---|---|---|")
    for n in names:
        spec = specs[n]
        run_once(spark, spec, "/root/testdata/sf0.001")  # codegen warmup
        t1 = run_once(spark, spec, "/root/testdata/sf0.1")
        t8 = run_once(spark, spec, "/tmp/cdw_scale8")
        print(f"| {n} | {t1:.2f} | {t8:.2f} | {t8 / t1:.2f} |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
