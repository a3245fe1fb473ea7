"""The Arrow-vectorized fingerprint path must be bit-identical to the
Column-expression definition — same normalization, shingling, Horner mod."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdw_spark.catalog import load_fixture
from cdw_spark.functions.text import rolling_hash, winnow_fingerprint
from cdw_spark.functions.text_arrow import rolling_fingerprints_arrow


def test_arrow_path_matches_column_path(spark, sf_dir):
    d = load_fixture(spark, sf_dir, "documents")
    expr_rows = {
        r.doc_id: (r.fp_rolling, r.fp_winnow)
        for r in d.select(
            "doc_id",
            rolling_hash(F.col("text")).alias("fp_rolling"),
            winnow_fingerprint(F.col("text"), n=3).alias("fp_winnow"),
        ).collect()
    }
    arrow_rows = {
        r.doc_id: (r.fp_rolling, r.fp_winnow)
        for r in rolling_fingerprints_arrow(d).collect()
    }
    assert expr_rows == arrow_rows and expr_rows


def test_arrow_path_edge_strings(spark):
    d = spark.createDataFrame(
        [
            (1, ""),
            (2, "   "),
            (3, "one"),
            (4, "two words"),
            (5, "now three words here, with punct!"),
            (6, "line\nbreaks\tand   runs  of   space"),
            (7, None),
        ],
        "doc_id long, text string",
    )
    expr = {
        r.doc_id: (r.a, r.b)
        for r in d.select(
            "doc_id",
            rolling_hash(F.col("text")).alias("a"),
            winnow_fingerprint(F.col("text"), n=3).alias("b"),
        ).collect()
    }
    arrow = {r.doc_id: (r.fp_rolling, r.fp_winnow) for r in rolling_fingerprints_arrow(d).collect()}
    assert expr == arrow  # including NULL propagation for doc 7


def test_arrow_shingles_match_expression_shingles(spark, sf_dir):
    from cdw_spark.functions.text_arrow import shingle_rows_arrow
    from cdw_spark.operators.dedup import _shingle_table_expr

    d = load_fixture(spark, sf_dir, "documents")
    a = {(r.doc_id, r.sh) for r in shingle_rows_arrow(d).collect()}
    b = {(r.doc_id, r.sh) for r in _shingle_table_expr(d, "text", "doc_id", 3).collect()}
    assert a == b and a
