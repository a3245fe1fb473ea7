#!/usr/bin/env python
"""Measure the planted-near-dup recall floor of the kNN signature rule
as a function of signature WIDTH, on the 64x embeddings corpus — the
VERDICT r10 #4 evidence that the knee schedule (2 bits per doubling past
w=24, operators/similarity.py:derived_n_planes) ships with MEASURED
recall floors, not extrapolated ones.

For each width w: plant 200 near-duplicates (theta = 0.2 rad, the
test_knn_graph_width_autoscaling construction — cos ~0.98, per-bit flip
p ~ theta/pi ~ 0.064), sign the corpus+plants with the first w seeded
hyperplanes, and report
  - recall = fraction of planted pairs at hamming <= 3 (the band join's
    verification radius — a pair outside it can never become an edge);
  - the theoretical binomial floor P(Binom(w, p) <= 3) for comparison;
  - band-candidates per vector (two-band multi-index occupancy sum),
    the quantity the knee schedule exists to pin.

Prereq: scripts/make_scale64_embeddings.py. Usage:
python scripts/recall_floor_widths.py
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from cdw_spark.session import get_spark

CORPUS = "/tmp/cdw_scale64/embeddings.parquet"
N_PLANT = 200
THETA = 0.2
WIDTHS = (18, 21, 24, 26, 28, 30)  # 1x/8x/64x natural + first knee steps


def binom_cdf_le(k: int, n: int, p: float) -> float:
    return sum(
        math.comb(n, i) * p**i * (1 - p) ** (n - i) for i in range(k + 1)
    )


def main() -> None:
    spark = get_spark(app_name="recall-floor-widths")
    spark.sparkContext.setLogLevel("ERROR")
    from cdw_spark.functions.vectors import to_double_array
    from cdw_spark.operators.similarity import with_signature

    base = spark.read.parquet(CORPUS).select(
        "vec_id", to_double_array(F.col("embedding")).alias("v")
    )
    n = base.count()
    dim = len(base.select("v").first()[0])

    # plant near-dups of a deterministic sample of corpus vectors
    rng = np.random.default_rng(20260816)
    sample = base.orderBy("vec_id").limit(4 * N_PLANT).collect()
    picks = sample[:: 4][:N_PLANT]
    extra, planted = [], []
    next_id = 900_000_000
    for row in picks:
        v = np.array(row.v)
        vhat = v / np.linalg.norm(v)
        g = rng.standard_normal(dim)
        u = g - (g @ vhat) * vhat
        u /= np.linalg.norm(u)
        dup = np.linalg.norm(v) * (np.cos(THETA) * vhat + np.sin(THETA) * u)
        extra.append((next_id, [float(x) for x in dup]))
        planted.append((row.vec_id, next_id))
        next_id += 1
    big = base.unionAll(
        spark.createDataFrame(extra, "vec_id long, v array<double>")
    )

    from cdw_spark.operators.similarity import (
        hamming_ball_masks,
        verification_radius,
    )

    flip_p = THETA / math.pi
    print(f"n = {n} corpus + {N_PLANT} planted pairs, theta = {THETA}")
    print(
        "| width | r(w) | recall@h<=3 | recall@h<=r | floor@3 | floor@r "
        "| band cand/vec @r |"
    )
    print("|---|---|---|---|---|---|---|")
    for w in WIDTHS:
        r_w = verification_radius(w)
        sigs = {
            r.vec_id: r.sig
            for r in with_signature(big, "v", dim, "sig", w)
            .select("vec_id", "sig")
            .collect()
        }
        hits3 = sum(
            1 for a, b in planted if bin(sigs[a] ^ sigs[b]).count("1") <= 3
        )
        hits_r = sum(
            1 for a, b in planted if bin(sigs[a] ^ sigs[b]).count("1") <= r_w
        )
        # two-band multi-index occupancy at the SCHEDULED sub-radii
        # (r//2 on band 0, r - r//2 - 1 on band 1 — _knn_directed_top3)
        b1 = w - w // 2
        low_mask = (1 << b1) - 1
        cnt_lo = Counter(s & low_mask for s in sigs.values())
        cnt_hi = Counter(s >> b1 for s in sigs.values())
        r1, r2 = r_w // 2, r_w - r_w // 2 - 1
        total = 0
        for cnt, width, sub_r in ((cnt_lo, b1, r1), (cnt_hi, w // 2, r2)):
            masks = hamming_ball_masks(width, sub_r)
            total += sum(
                c * (cnt.get(s ^ m, 0) - (m == 0))
                for s, c in cnt.items()
                for m in masks
            )
        print(
            f"| {w} | {r_w} | {hits3 / N_PLANT:.3f} | {hits_r / N_PLANT:.3f}"
            f" | {binom_cdf_le(3, w, flip_p):.3f}"
            f" | {binom_cdf_le(r_w, w, flip_p):.3f}"
            f" | {total / len(sigs):.1f} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
