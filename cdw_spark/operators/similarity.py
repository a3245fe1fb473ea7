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


def _norm_sql(name: str, dim: int) -> str:
    """sqrt(sum v_i^2) as an unrolled SQL string — two reasons not to build
    this as a Column tree: (a) Spark's higher-order functions (aggregate /
    zip_with) are interpreted per-row, not codegen'd — the HOF form
    measured ~5 ms/row; (b) composing ~4k Column operators from Python
    costs one py4j round-trip each (~20 s of pure driver overhead per
    plan). One F.expr(string) parses JVM-side in milliseconds and the
    arithmetic stays inside whole-stage codegen. Left-assoc '+' preserves
    the sequential fold order of functions/vectors.py:dot."""
    return "sqrt(" + " + ".join(f"{name}[{i}]*{name}[{i}]" for i in range(dim)) + ")"


def _dot_sql(name: str, weights: list[float]) -> str:
    """dot(v, constant_weights) as an unrolled SQL multiply-add chain."""
    return "(" + " + ".join(f"{name}[{i}]*({w!r})" for i, w in enumerate(weights)) + ")"


def _scores_sql(name: str, norm_name: str, cents: list[tuple[int, list[float]]]) -> str:
    """array(cosine vs every unit centroid) — centroids ride the plan as
    literal weights: scoring needs no join, no shuffle, no HOF."""
    return (
        "array("
        + ", ".join(f"{_dot_sql(name, w)}/{norm_name}" for _, w in cents)
        + ")"
    )


def _cid_sql(scores_name: str, cents: list[tuple[int, list[float]]]) -> str:
    """Argmax-score centroid id: array_position takes the FIRST maximum —
    deterministic tie-break toward the lower list index."""
    cid_arr = "array(" + ", ".join(str(cid) for cid, _ in cents) + ")"
    return (
        f"element_at({cid_arr}, cast(array_position({scores_name}, "
        f"array_max({scores_name})) as int))"
    )


def ivf_train(
    corpus: DataFrame,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Spherical k-means coarse quantizer, trained with DataFrame-native
    Lloyd iterations: assignment is codegen'd literal-weight scoring (no
    join, no shuffle); update is one groupBy over (cid) summing the
    unit-normalized components — the only shuffle, carrying nlist×dim
    doubles.

    Deterministic: init = the nlist lowest-id vectors; centroid coords are
    rounded to 9 decimals each sync so partition-order float-sum jitter
    cannot flip assignments. At 100 TB you'd train on a seeded sample
    (df.sample) — the fixture corpus is small enough to use whole."""
    dim = len(corpus.select(vec_col).first()[0])
    c = corpus.select(
        F.col(id_col).alias("_id"), to_double_array(F.col(vec_col)).alias("v")
    ).withColumn("_norm", F.expr(_norm_sql("v", dim)))
    c = c.persist()  # read iters+1 times below
    init = c.orderBy("_id").limit(nlist).collect()
    cents = [
        (i, [round(x / r["_norm"], 9) for x in r["v"]]) for i, r in enumerate(init)
    ]
    for _ in range(iters):
        assigned = c.withColumn(
            "_scores", F.expr(_scores_sql("v", "_norm", cents))
        ).withColumn("cid", F.expr(_cid_sql("_scores", cents)))
        stats = assigned.groupBy("cid").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.expr(f"v[{i}]/_norm")).alias(f"s{i}") for i in range(dim)],
        )
        rows = stats.collect()  # nlist rows — driver sync, as in any distributed k-means
        cents = [
            (int(r["cid"]), [round(r[f"s{i}"] / r["n"], 9) for i in range(dim)])
            for r in sorted(rows, key=lambda r: r["cid"])
        ]
    c.unpersist()
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
    dim = len(cents[0][1])

    # Centroid scoring via an Arrow matmul per batch (functions/text_arrow
    # centroid_topn_arrow): the earlier unrolled-literal SQL form executed
    # fast but its ~nlist*dim-term expression trees cost seconds of Janino
    # codegen COMPILATION per plan — the matmul removes the expression
    # entirely (and is the shape a GPU/FAISS coarse quantizer uses).
    from ..functions.text_arrow import centroid_topn_arrow

    assign = centroid_topn_arrow(corpus, cents, 1, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("cand_id"), "cid"
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"), to_double_array(F.col(vec_col)).alias("cv")
    ).join(assign, on="cand_id")

    probe_cids = centroid_topn_arrow(
        probes, cents, nprobe, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col).alias("probe_id"), "cid")
    p = probes.select(
        F.col(id_col).alias("probe_id"), to_double_array(F.col(vec_col)).alias("pv")
    )
    probe_lists = p.join(probe_cids, on="probe_id")

    joined = c.join(F.broadcast(probe_lists), on="cid").filter(
        F.col("cand_id") != F.col("probe_id")
    )
    # unrolled cosine (same left-assoc fold order as functions.vectors.dot,
    # so values are bit-identical to the HOF form) — keeps the candidate
    # scoring inside whole-stage codegen instead of interpreted lambdas
    dot_sql = " + ".join(f"pv[{i}]*cv[{i}]" for i in range(dim))
    scored = joined.select(
        "probe_id",
        "cand_id",
        (
            F.expr(f"({dot_sql})")
            / (F.expr(_norm_sql("pv", dim)) * F.expr(_norm_sql("cv", dim)))
        ).alias("cos_raw"),
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
    LSH buckets; kept exact here as the oracle-comparable form.

    Per-pair scoring is an unrolled codegen dot over precomputed norms —
    the interpreted-HOF cosine cost 38s on the 2M-pair cross product at
    sf0.1; unrolled left-assoc arithmetic is bit-identical to the fold
    (and to DuckDB's sequential list_dot_product) at ~25x the speed.
    Norms are computed once per ROW (corpus-sized), never per pair."""
    dim = len(corpus.select(vec_col).first()[0])
    norm_terms = " + ".join(f"v[{i}]*v[{i}]" for i in range(dim))
    a = corpus.select(
        F.col(id_col).alias("id_a"), to_double_array(F.col(vec_col)).alias("va")
    ).withColumn("na", F.expr(f"sqrt({norm_terms})".replace("v[", "va[")))
    b = corpus.select(
        F.col(id_col).alias("id_b"), to_double_array(F.col(vec_col)).alias("vb")
    ).withColumn("nb", F.expr(f"sqrt({norm_terms})".replace("v[", "vb[")))
    dot_sql = " + ".join(f"va[{i}]*vb[{i}]" for i in range(dim))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a",
        "id_b",
        (F.expr(f"({dot_sql})") / (F.col("na") * F.col("nb"))).alias("cos_raw"),
    )
    return (
        scored.orderBy(F.col("cos_raw").desc(), "id_a", "id_b")
        .limit(n)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cosine"))
    )
