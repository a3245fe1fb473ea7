#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/r12/NAME_<suffix>.txt.

Usage: python scripts/dump_plans.py <suffix> NAME [NAME...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdw_spark.registry import load_all
from cdw_spark.session import get_spark


def main() -> int:
    suffix, names = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cdw_plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    os.makedirs("plans/r12", exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        out = f"plans/r12/{name}_{suffix}.txt"
        with open(out, "w") as f:
            f.write(txt)
        print(out, len(txt.splitlines()), "lines")
    return 0


if __name__ == "__main__":
    return_code = main()
    sys.exit(return_code)
