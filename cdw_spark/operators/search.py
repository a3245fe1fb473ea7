"""Full-text search operators: inverted index, TF-IDF weighting, BM25
ranking — the retrieval layer a training-data pipeline needs for corpus
exploration, targeted decontamination, and quality-filtered sampling.

Everything here is a composition of built-in DataFrame operators — no UDFs:
tokenization is ``regexp_extract_all``, weights are plain double arithmetic,
ranking is a window function. At 100 TB the plans are:

- inverted index: one scan + one shuffle on ``term`` (map-side partial
  counts combine first). Postings lists are materialized sorted so the
  index is directly mergeable/shardable by term range. Real deployments cap
  or delta-encode postings for stop-like terms; the ``max_df_ratio``
  parameter drops those terms before the heavy lists form.
- TF-IDF / BM25: the document-frequency relation is |vocab| rows — orders
  of magnitude smaller than the corpus — so it broadcasts; the only big
  shuffle is the (doc, term) count aggregation, which combines map-side.
  Corpus constants (N, avgdl) are single-row aggregates cross-joined as
  broadcasts, never driver-side ``collect()``.

Cross-engine discipline (for the DuckDB oracles in suite/search.py): token
regex `[a-z0-9]+` evaluates identically in both engines; all scores are
computed with the same operation order and rounded before ranking, and
every ranking has a deterministic final tie-break key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# BM25 constants (standard Robertson/Sparck-Jones defaults).
BM25_K1 = 1.2
BM25_B = 0.75


def index_terms(col: Column) -> Column:
    """Search tokenization: maximal runs of [a-z0-9] over lowercased text.
    Mirrors DuckDB `regexp_extract_all(lower(x), '[a-z0-9]+')` exactly."""
    return F.regexp_extract_all(F.lower(col), F.lit("[a-z0-9]+"), 0)


def tokenize(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc, term) token stream — one row per token occurrence."""
    return docs.select(id_col, F.explode(index_terms(F.col(text_col))).alias("term"))


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """term -> (df, postings) where postings is the sorted CSV of doc ids
    containing the term. One shuffle on term; collect_list is bounded per
    term by df, and the pre-distinct keeps it one entry per document."""
    t = docs.select(
        id_col,
        F.explode(F.array_distinct(index_terms(F.col(text_col)))).alias("term"),
    )
    return t.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(id_col)), lambda x: x.cast("string")),
            ",",
        ).alias("postings"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF
    (tf = c/dl; idf = ln((1+N)/(1+df)) + 1, sklearn-style smoothing).

    Ranking is over ROUND(score, 9) with a term-asc tie-break: scores that
    are mathematically equal arise only from equal (c, dl, df) triples,
    which both engines compute to the identical double, so the rank — and
    therefore the selected set — is engine-independent.
    """
    tok = tokenize(docs, id_col, text_col)
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("c"))
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ndocs = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))

    score = (F.col("c").cast("double") / F.col("dl").cast("double")) * (
        F.log((F.lit(1.0) + F.col("n")) / (F.lit(1.0) + F.col("df").cast("double")))
        + F.lit(1.0)
    )
    w = Window.partitionBy(id_col).orderBy(F.round(F.col("score"), 9).desc(), F.col("term"))
    return (
        tf.join(dl, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(ndocs))
        .select(id_col, "term", score.alias("score"))
        .select(id_col, "term", "score", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", F.col("rk").cast("int").alias("rk"),
                F.round("score", 6).alias("tfidf"))
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5));
    contrib = idf * c*(k1+1) / (c + k1*(1 - b + b*dl/avgdl)); score = sum.

    The per-document sum is over at most |query_terms| doubles, rounded to
    6 dp BEFORE ranking with a doc-id tie-break, so summation order cannot
    change the returned set. df/avgdl/N are broadcast single-row or
    |query|-row relations; the corpus is scanned once. The top-k itself is
    ``orderBy().limit(k)`` — Catalyst plans TakeOrderedAndProject (per-
    partition heaps merged at the driver), NOT a single-partition global
    window; the row_number runs after the limit, over k rows.
    """
    tok = tokenize(docs, id_col, text_col)
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    qtf = (
        tok.filter(F.col("term").isin(query_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dfreq = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    c = F.col("c").cast("double")
    norm = c + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
    )
    contrib = idf * (c * F.lit(k1 + 1.0)) / norm

    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return (
        qtf.join(dl, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "score", F.row_number().over(w).cast("int").alias("rk"))
    )


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search over POSITIONAL postings: tokenize with term
    positions, keep only postings of the phrase's words (filter pushes to
    the scan), then equi-join word k's postings to word k+1's on
    (doc, pos+1) — the classic positional-inverted-index adjacency walk.

    Output: (doc_id, n_hits) for documents containing the phrase at least
    once, n_hits = number of distinct starting positions.

    Scale shape: a substring ``contains`` prefilter on every phrase word
    (a superset of the token match, so correctness is untouched) rides
    the scan as a vectorized DataFilter — documents without all the
    words never reach the explode, which is the expensive step; on
    pre-lowercased corpora drop the lower() and the same predicate
    additionally pushes into the parquet reader as StringContains; each join side is then further
    filtered to ONE term's postings, and joins hash-partition on
    (doc, position) — never a scan-by-scan product. A k-word phrase is
    k-1 chained equi-joins, each further shrinking the candidate set."""
    pre = docs
    for word in phrase:
        pre = pre.filter(F.lower(F.col(text_col)).contains(word))
    toks = pre.select(
        F.col(id_col),
        F.posexplode(index_terms(F.col(text_col))).alias("pos", "term"),
    )
    cur = (
        toks.filter(F.col("term") == phrase[0])
        .select(F.col(id_col), F.col("pos").alias("p0"))
    )
    for k, word in enumerate(phrase[1:], start=1):
        nxt = toks.filter(F.col("term") == word).select(
            F.col(id_col).alias("_d"), F.col("pos").alias(f"p{k}")
        )
        cur = cur.join(
            nxt,
            (cur[id_col] == nxt["_d"]) & (nxt[f"p{k}"] == cur["p0"] + k),
        ).drop("_d", f"p{k}")
    return cur.groupBy(id_col).agg(F.count("*").cast("bigint").alias("n_hits"))


def tfidf_query_scores(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under summed smoothed
    TF-IDF (same weighting as :func:`tfidf_top_terms`, restricted to the
    query terms). Used as the second ranker in :func:`rrf_fuse`.

    Same plan shape as BM25: the corpus is scanned once, df/N are
    broadcast tiny relations, the per-doc sum is over <= |query| doubles
    rounded to 6 dp before the doc-id-tie-broken top-k."""
    tok = tokenize(docs, id_col, text_col)
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    ndocs = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    qtf = (
        tok.filter(F.col("term").isin(query_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dfreq = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    contrib = (F.col("c").cast("double") / F.col("dl").cast("double")) * (
        F.log((F.lit(1.0) + F.col("n")) / (F.lit(1.0) + F.col("df").cast("double")))
        + F.lit(1.0)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return (
        qtf.join(dl, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(ndocs))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "score", F.row_number().over(w).cast("int").alias("rk"))
    )


def rrf_fuse(
    docs: DataFrame,
    query_terms: list[str],
    k_each: int = 20,
    k_final: int = 10,
    rrf_c: float = 60.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of two lexical rankers (BM25 and summed
    TF-IDF) for one query: rrf(d) = sum over lists of 1/(c + rank_d),
    absent-list contribution 0 — the standard ensemble trick for merging
    heterogeneous retrieval runs without score calibration.

    Scale: each ranker is an independent top-k (TakeOrderedAndProject,
    per-partition heaps); the fusion itself joins two <= k_each-row
    relations — driver-negligible no matter the corpus size. In a real
    deployment the second list would come from an ANN run
    (operators/similarity.py) instead of a second lexical pass; the
    fusion shape is identical. Both input ranks round scores before
    ranking with a doc-id tie-break, so the fused set is deterministic
    and engine-independent (oracled in suite/search.py).
    """
    bm = bm25_search(docs, query_terms, k=k_each, id_col=id_col).select(
        id_col, F.col("rk").alias("rk_bm25")
    )
    tf = tfidf_query_scores(docs, query_terms, k=k_each, id_col=id_col).select(
        id_col, F.col("rk").alias("rk_tfidf")
    )
    part = lambda rk: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(rrf_c) + F.col(rk).cast("double")), F.lit(0.0)
    )
    fused = bm.join(tf, id_col, "full_outer").select(
        id_col,
        F.col("rk_bm25").cast("int").alias("rk_bm25"),
        F.col("rk_tfidf").cast("int").alias("rk_tfidf"),
        F.round(part("rk_bm25") + part("rk_tfidf"), 6).alias("rrf"),
    )
    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col))
    return (
        fused.orderBy(F.col("rrf").desc(), F.col(id_col))
        .limit(k_final)
        .select(
            id_col,
            "rk_bm25",
            "rk_tfidf",
            "rrf",
            F.row_number().over(w).cast("int").alias("rk"),
        )
    )
