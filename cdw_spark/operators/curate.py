"""Dataset-curation operators a large-scale training-data pipeline runs
between raw ingest and tokenization: benchmark decontamination, PII
redaction, repetition/diversity profiling, deterministic split sampling,
and MERGE-style incremental upsert.

All hot paths are JVM-side Column expressions or single-shuffle
aggregations — no Python in the data path. Scale notes per operator
docstring; every operator has a DuckDB-oracled registry entry in
cdw_spark/suite/datasetops.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import shingles

# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate_against(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Remove corpus documents that share any word ``n``-gram with the
    benchmark set (eval-set contamination removal, the GPT-3/PaLM-style
    13-gram rule scaled down to the fixture vocabulary).

    Scale: the benchmark shingle set is bounded by the *benchmark* size
    (eval suites are MBs even when the corpus is 100 TB), so it is
    broadcast and both joins stay shuffle-free on the corpus side; the
    corpus is scanned once to explode shingles and once more for the
    anti-join on the contaminated-id set. For benchmark sets too large to
    broadcast, pass ``broadcast_benchmark=False`` and AQE picks the
    strategy; a Bloom-filter pushdown over the shingle hashes is the
    further fallback at extreme benchmark sizes.
    """
    bench_sh = benchmark.select(
        F.explode(shingles(F.col(text_col), n)).alias("g")
    ).distinct()
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    corpus_sh = corpus.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("g")
    )
    contaminated = corpus_sh.join(bench_sh, "g").select(id_col).distinct()
    return corpus.join(contaminated, id_col, "left_anti")


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# ASCII-only patterns chosen to evaluate identically under Java regex
# (Spark) and RE2 (DuckDB): no backreferences, no lookaround.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_counts_and_redact(col: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, redacted_text). Pure JVM regex — codegen'd,
    single pass per pattern, no shuffle."""
    n_emails = F.regexp_count(col, F.lit(EMAIL_RE)).cast("int")
    n_ips = F.regexp_count(col, F.lit(IPV4_RE)).cast("int")
    redacted = F.regexp_replace(
        F.regexp_replace(col, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )
    return n_emails, n_ips, redacted


# ---------------------------------------------------------------------------
# Repetition / diversity profiling
# ---------------------------------------------------------------------------


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals (Gopher-style quality rules):
    total words, distinct-word ratio (lexical diversity), and the mass
    fraction of the single most frequent word.

    Scale: one shuffle on (doc_id, word) with map-side partial
    aggregation; word *strings* shuffle once, then only per-doc counters.
    Skew-safe — a pathological document concentrates on one (doc, word)
    key but partial aggregation collapses it map-side.
    """
    w = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tok = df.select(F.col(id_col), F.explode(w).alias("word"))
    per_word = tok.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt")
    return per_word.groupBy(id_col).agg(
        total.cast("long").alias("n_words"),
        F.round(F.count(F.lit(1)) / total.cast("double"), 6).alias("distinct_ratio"),
        F.round(F.max("cnt") / total.cast("double"), 6).alias("top_word_ratio"),
    )


# ---------------------------------------------------------------------------
# Deterministic split sampling
# ---------------------------------------------------------------------------


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    buckets: int = 1000,
    train_lt: int = 800,
    valid_lt: int = 900,
) -> DataFrame:
    """Deterministic, engine-independent train/valid/test assignment:
    bucket = first 16 bits of md5(id) mod ``buckets``. Stable across
    runs, engines, partitionings, and cluster sizes — the property that
    matters when the split must be reproducible over 100 TB re-ingests
    (builtin ``rand``/``xxhash64`` seeds are engine-specific; md5 is not).
    Pure projection: no shuffle, no state.
    """
    hx = F.md5(F.col(id_col).cast("string"))
    val = F.conv(F.substring(hx, 1, 4), 16, 10).cast("int")
    bucket = (val % buckets).alias("bucket")
    split = (
        F.when(val % buckets < train_lt, "train")
        .when(val % buckets < valid_lt, "valid")
        .otherwise("test")
        .alias("split")
    )
    return df.select(F.col(id_col), bucket, split)


# ---------------------------------------------------------------------------
# MERGE-style incremental upsert
# ---------------------------------------------------------------------------


def merge_latest_state(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    order_cols: list[str],
) -> DataFrame:
    """MERGE INTO semantics for a latest-state table without a table
    format: reduce both sides to one row per key (ROW_NUMBER over
    ``order_cols`` desc — fully deterministic), then FULL OUTER join and
    COALESCE source-over-target, tagging each row ``insert`` / ``update``
    / ``keep``.

    Scale: both reductions and the join hash-partition on the same key
    columns, so AQE coalesces them into one exchange per side; payload
    width is one row per key, never the raw event stream.
    """

    def latest(df: DataFrame) -> DataFrame:
        win = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
        return (
            df.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    t = latest(target)
    s = latest(source)
    payload = [c for c in t.columns if c not in keys]
    op = (
        F.when(F.col(f"t.{keys[0]}").isNull(), "insert")
        .when(F.col(f"s.{keys[0]}").isNull(), "keep")
        .otherwise("update")
        .alias("op")
    )
    merged = t.alias("t").join(
        s.alias("s"),
        on=[F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
        how="full_outer",
    )
    return merged.select(
        *[F.coalesce(F.col(f"t.{k}"), F.col(f"s.{k}")).alias(k) for k in keys],
        *[F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c) for c in payload],
        op,
    )
