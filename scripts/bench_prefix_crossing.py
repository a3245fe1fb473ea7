"""Measured crossing point for dedup_ngram_prefix_filter (VERDICT r5 #4).

The fixture corpus has no frequent-shingle blowup, so the naive inverted
join wins there (BENCHNOTES r5). This script builds the corpus class the
prefix filter exists for — Zipfian token draws where head tokens appear
in nearly every document — and measures, for both operators:

  - candidate pairs entering exact verification
  - wall time of the full operator

Deterministic generation (md5-based inverse-CDF power law, no RNG
state), planted near-dup pairs every 100 docs, identical output parity
asserted before timing. Prints one markdown table for BENCHNOTES.

Usage: python scripts/bench_prefix_crossing.py [n_docs ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def synth_corpus(n_docs: int, n_phrases: int = 30, alpha: float = 3.0):
    """The web-scrape shape that explodes a naive inverted shingle join:
    every doc opens and closes with BOILERPLATE PHRASES (8 tokens each,
    Zipf-drawn from a pool of ``n_phrases`` — headers/footers/cookie
    banners), with doc-unique content between. Boilerplate shingles get
    document frequency O(n_docs) — the naive join enumerates every
    boilerplate-sharing pair even though none clears the Jaccard
    threshold; rarest-first prefixes exclude exactly those shingles.
    Every 100th doc is a planted near-dup of its predecessor (one token
    changed). Deterministic md5 draws, no RNG state."""
    docs = []
    for d in range(n_docs):
        base = d - 1 if d % 100 == 1 else d

        def zipf_phrase(slot):
            u = int(hashlib.md5(f"{base}:{slot}".encode()).hexdigest()[:8], 16) / 16**8
            p = int(n_phrases * (u ** alpha))
            return [f"bp{p}_{slot}_{j}" for j in range(8)]

        toks = (
            zipf_phrase("head")
            + [f"u{base}_{i}" for i in range(10)]
            + zipf_phrase("foot")
        )
        if d % 100 == 1:
            toks[12] = f"u{d}x"  # near-dup, not identical
        docs.append((d, " ".join(toks)))
    return docs


def run(spark, docs, which: str):
    from cdw_spark.operators.dedup import (
        _shingle_table,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string").localCheckpoint()
    # candidate count (the quantity the filter exists to cut)
    sh = _shingle_table(df, "text", "doc_id", 3)
    if which == "naive":
        sa = sh.select(F.col("doc_id").alias("id_a"), "sh")
        sb = sh.select(F.col("doc_id").alias("id_b"), "sh")
        cands = (
            sa.join(sb, "sh").filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct().count()
        )
        t0 = time.time()
        out = ngram_jaccard_pairs(df, threshold=0.6).collect()
        dt = time.time() - t0
    else:
        from pyspark.sql.window import Window

        counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("dfc"))
        ranked = (
            sh.join(dfreq, "sh").join(counts, "doc_id")
            .withColumn("rk", F.row_number().over(
                Window.partitionBy("doc_id").orderBy("dfc", "sh")))
        )
        need = F.col("n_sh") - F.expr("(3 * n_sh + 4) div 5") + F.lit(1)
        prefix = ranked.filter(F.col("rk") <= need).select("doc_id", "sh")
        pa = prefix.select(F.col("doc_id").alias("id_a"), "sh")
        pb = prefix.select(F.col("doc_id").alias("id_b"), "sh")
        cands = (
            pa.join(pb, "sh").filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct().count()
        )
        t0 = time.time()
        out = ngram_jaccard_pairs_prefix(df, t_num=3, t_den=5).collect()
        dt = time.time() - t0
    pairs = sorted((r["id_a"], r["id_b"]) for r in out)
    return cands, dt, pairs


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1000, 2000, 4000]
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("prefix-crossing")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("| n_docs | naive cands | prefix cands | cut | naive s | prefix s |")
    print("|---|---|---|---|---|---|")
    for n in sizes:
        docs = synth_corpus(n)
        nc, nt, np_ = run(spark, docs, "naive")
        pc, pt, pp = run(spark, docs, "prefix")
        assert np_ == pp, "parity violated"  # identical output, always
        print(
            f"| {n} | {nc:,} | {pc:,} | {pc / nc:.3f}x "
            f"| {nt:.1f} | {pt:.1f} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
