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


def _centroid_literal(cents: list[tuple[int, list[float]]]):
    """Centroid table as an in-plan array<struct<cid,cv>> literal — the
    IVF coarse quantizer travels inside the serialized plan (a few KB for
    nlist<=256), so centroid assignment needs NO join and NO shuffle."""
    return F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("cv"),
            )
            for cid, vec in cents
        ]
    )


def _unit(v):
    return F.transform(v, lambda x: x / F.sqrt(dot(v, v)))


def _nearest_cid(uv, cent_lit):
    """Argmax-dot centroid id via a JVM-side fold — per-row O(nlist·dim),
    zero shuffle (vs the crossJoin-then-argmin pattern's nlist× blowup)."""
    best = F.aggregate(
        cent_lit,
        F.struct(F.lit(-1).alias("cid"), F.lit(-2.0).alias("score")),
        lambda acc, c: F.when(
            dot(uv, c["cv"]) > acc["score"],
            F.struct(c["cid"].alias("cid"), dot(uv, c["cv"]).alias("score")),
        ).otherwise(acc),
    )
    return best["cid"]


def ivf_train(
    corpus: DataFrame,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Spherical k-means coarse quantizer, trained with DataFrame-native
    Lloyd iterations (assignment = JVM fold against the broadcast-literal
    centroids; update = one groupBy over (cid) with per-dimension sums —
    the only shuffle, carrying nlist×dim doubles).

    Deterministic: init = the nlist lowest-id vectors; centroid coords are
    rounded to 9 decimals each sync so partition-order float-sum jitter
    cannot flip assignments. At 100 TB you'd train on a seeded sample
    (df.sample) — the fixture corpus is small enough to use whole."""
    c = corpus.select(
        F.col(id_col).alias("_id"), _unit(to_double_array(F.col(vec_col))).alias("uv")
    )
    init = c.orderBy("_id").limit(nlist).collect()
    cents = [(i, [round(x, 9) for x in r["uv"]]) for i, r in enumerate(init)]
    dim = len(cents[0][1])
    for _ in range(iters):
        lit = _centroid_literal(cents)
        assigned = c.select(F.col("uv"), _nearest_cid(F.col("uv"), lit).alias("cid"))
        stats = assigned.groupBy("cid").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.element_at("uv", i + 1)).alias(f"s{i}") for i in range(dim)],
        )
        rows = stats.collect()  # nlist rows — driver sync, as in any distributed k-means
        cents = [
            (int(r["cid"]), [round(r[f"s{i}"] / r["n"], 9) for i in range(dim)])
            for r in sorted(rows, key=lambda r: r["cid"])
        ]
    return cents


def ivf_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate k-NN — the bucketed scale path next
    to ``lsh_topk``: corpus rows are assigned once to their nearest of
    ``nlist`` centroids; each probe scores only the rows of its ``nprobe``
    closest lists, replacing the full scan with ~(nprobe/nlist) of it.

    Output schema matches ``brute_force_topk`` (its recall oracle in
    tests/test_similarity.py). At 100 TB: write the corpus partitioned by
    ``cid`` so a probe's candidate read is partition-pruned at the source."""
    cents = ivf_train(corpus, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col)
    lit = _centroid_literal(cents)

    c = corpus.select(
        F.col(id_col).alias("cand_id"), to_double_array(F.col(vec_col)).alias("cv")
    )
    c = c.withColumn("cid", _nearest_cid(_unit(F.col("cv")), lit))

    p = probes.select(
        F.col(id_col).alias("probe_id"), to_double_array(F.col(vec_col)).alias("pv")
    )
    pw = Window.partitionBy("probe_id").orderBy(F.col("cscore").desc(), F.col("cid"))
    probe_lists = (
        p.select("probe_id", "pv", F.explode(lit).alias("c"))
        .select(
            "probe_id",
            "pv",
            F.col("c.cid").alias("cid"),
            dot(_unit(F.col("pv")), F.col("c.cv")).alias("cscore"),
        )
        .withColumn("crank", F.row_number().over(pw))
        .filter(F.col("crank") <= nprobe)
        .select("probe_id", "pv", "cid")
    )

    joined = c.join(F.broadcast(probe_lists), on="cid").filter(
        F.col("cand_id") != F.col("probe_id")
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
