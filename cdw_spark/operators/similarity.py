"""Similarity search over embedding columns (BASELINE.json north star).

Two tiers, per the 100 TB design rule:

- ``brute_force_topk`` — exact k-NN: probes (small) are broadcast against
  the full corpus; one scan, partial top-k per partition via window rank.
  This is the *baseline and the oracle* for the approximate tier.
- ``lsh_topk`` — random-hyperplane LSH: 16-bit signatures bucket the corpus;
  probes search only their bucket (+ multiprobe neighbors at hamming<=2).
  At 100 TB the bucketed join touches ~corpus/2^16 per probe instead of the
  full corpus. Recall is data-dependent — measured against brute force in
  tests/test_similarity.py, never assumed.

Hyperplanes are seeded compile-time constants: deterministic across runs.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine, dot, to_double_array

N_PLANES = 8
_rng = random.Random(20260813)


def _planes(dim: int) -> list[list[float]]:
    return [[_rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(N_PLANES)]


def brute_force_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast probes x corpus scan.

    Output: (probe_id, cand_id, rank, cosine). Ties broken by cand_id so
    results are deterministic across engines and partitionings."""
    p = probes.select(
        F.col(id_col).alias("probe_id"), to_double_array(F.col(vec_col)).alias("pv")
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"), to_double_array(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("cand_id") != F.col("probe_id"))
        .select("probe_id", "cand_id", cosine(F.col("pv"), F.col("cv")).alias("cos_raw"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos_raw").desc(), F.col("cand_id"))
    return (
        scored.select(
            "probe_id", "cand_id", F.row_number().over(w).alias("rank"),
            F.round("cos_raw", 6).alias("cosine"),
        )
        .filter(F.col("rank") <= k)
    )


def _signature(vec_col, dim: int):
    """N_PLANES-bit random-hyperplane signature of a double-array column.

    Bit width trades bucket selectivity against recall: 8 bits = 256
    buckets suits 10^2..10^5-row corpora; at larger corpus sizes raise
    N_PLANES so bucket occupancy stays bounded (each added bit halves
    candidates per probe, costing recall on uniform data)."""
    planes = _planes(dim)
    sig = F.lit(0)
    for i, plane in enumerate(planes):
        pl = F.array(*[F.lit(x) for x in plane])
        sig = sig.bitwiseOR(
            F.when(dot(vec_col, pl) > 0, F.shiftleft(F.lit(1), i)).otherwise(0)
        )
    return sig


def lsh_topk(
    probes: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_hamming: int = 3,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane bucketing.

    Corpus rows are bucketed once by signature; each probe scores only
    buckets within ``multiprobe_hamming`` of its own signature. The
    bucket-restricted join replaces the full cross join — the scale path.
    Output schema matches ``brute_force_topk`` (its oracle)."""
    c = corpus.select(
        F.col(id_col).alias("cand_id"), to_double_array(F.col(vec_col)).alias("cv")
    )
    c = c.withColumn("csig", _signature(F.col("cv"), dim))
    p = probes.select(
        F.col(id_col).alias("probe_id"), to_double_array(F.col(vec_col)).alias("pv")
    )
    p = p.withColumn("psig", _signature(F.col("pv"), dim))

    joined = c.join(
        F.broadcast(p),
        on=[
            F.bit_count(F.col("csig").bitwiseXOR(F.col("psig"))) <= multiprobe_hamming,
            F.col("cand_id") != F.col("probe_id"),
        ],
    )
    scored = joined.select(
        "probe_id", "cand_id", cosine(F.col("pv"), F.col("cv")).alias("cos_raw")
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos_raw").desc(), F.col("cand_id"))
    return (
        scored.select(
            "probe_id", "cand_id", F.row_number().over(w).alias("rank"),
            F.round("cos_raw", 6).alias("cosine"),
        )
        .filter(F.col("rank") <= k)
    )


def similar_pairs_topn(
    corpus: DataFrame,
    n: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Global most-similar pairs (embedding near-dup surface): all pairs
    scored, global top-n. At scale, replace the pair generator with the
    LSH buckets; kept exact here as the oracle-comparable form."""
    a = corpus.select(F.col(id_col).alias("id_a"), to_double_array(F.col(vec_col)).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), to_double_array(F.col(vec_col)).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_raw"))
    return (
        scored.orderBy(F.col("cos_raw").desc(), "id_a", "id_b")
        .limit(n)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cosine"))
    )
