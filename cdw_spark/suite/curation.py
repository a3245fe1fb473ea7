"""Curation pipeline compositions — the queries a training-data pipeline
actually ships: near-dup clusters -> canonical keepers, and the end-to-end
document curation filter (dedup + quality + language). Each composes
operators that are individually oracle-checked elsewhere; these entries
prove the COMPOSITIONS agree with DuckDB too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_fixture
from ..functions.text import lang_guess, quality_score
from ..registry import register
from .dedup import _JACCARD_SQL
from .text import _lang_case_sql

# Keeper choice must be a strict total order: quality desc, then doc_id
# asc. Encoded as one BIGINT so arg_max/max_by agree across engines:
# round(quality, 6)*1e6 is an exact integer in [0, 1e6]; scale it past the
# id range and subtract the id so lower ids win ties.
_KEEPER_KEY_SQL = "CAST(ROUND(q * 1000000, 0) AS BIGINT) * 10000000000 - doc_id"

_QUALITY_SQL = """
    SELECT doc_id,
           0.4 * LEAST(len(string_split_regex(lower(trim(text)), '\\s+')) * 1.0 / 100.0, 1.0)
           + 0.3 * (1.0 - CASE WHEN length(text) > 0
                 THEN length(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 1.0 / length(text)
                 ELSE 0.0 END)
           + 0.3 * CASE WHEN len(string_split_regex(lower(trim(text)), '\\s+')) > 0
                 THEN len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                          x -> list_contains(['the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'], x))) * 1.0
                      / len(string_split_regex(lower(trim(text)), '\\s+'))
                 ELSE 0.0 END AS q
    FROM documents
"""


@register(
    "dedup_canonical_keepers",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_JACCARD_SQL}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (
        SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component_id
        FROM reach GROUP BY src
    ),
    qual AS ({_QUALITY_SQL})
    SELECT c.component_id,
           arg_max(c.doc_id, {_KEEPER_KEY_SQL}) AS keeper_id,
           COUNT(*) AS cluster_size
    FROM comp c JOIN qual USING (doc_id)
    GROUP BY c.component_id
    """,
    doc="Canonical-keeper selection per near-dup cluster: connected "
    "components over the exact-Jaccard graph, keeper = highest quality "
    "score (ties -> lowest doc id, via a strict composite key). The "
    "keep/drop decision a dedup pipeline actually emits.",
)
def dedup_canonical_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Components (iterative, tiny) join the quality projection (single
    scan); one aggregate picks keepers — cluster count is small, so
    everything after the pair graph is dimension-sized."""
    from .dedup import _components_at_rest

    d = load_fixture(spark, sf_dir, "documents")
    # r11: components come from the at-rest artifact (built once per
    # fixture) instead of re-executing the pair join per query
    comp = _components_at_rest(spark, sf_dir)
    qual = d.select("doc_id", quality_score(F.col("text")).alias("q"))
    # round AFTER scaling: round(q,6)*1e6 can land at x.99999... where
    # Spark's cast truncates but DuckDB's rounds — scaling first makes the
    # rounded double an exact integer before either engine casts
    key = F.round(F.col("q") * 1_000_000, 0).cast("long") * F.lit(
        10_000_000_000
    ) - F.col("doc_id")
    return (
        comp.join(qual, "doc_id")
        .groupBy("component_id")
        .agg(
            F.max_by("doc_id", key).alias("keeper_id"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
    )


@register(
    "curation_pipeline",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
    ),
    keepers AS (
        SELECT fp, MIN(doc_id) AS keep_id FROM fp GROUP BY fp
    ),
    qual AS ({_QUALITY_SQL}),
    lang AS (
        SELECT doc_id, {_lang_case_sql()} AS lg FROM documents
    )
    SELECT f.doc_id, ROUND(q.q, 6) AS quality, l.lg AS lang_guess
    FROM fp f
    JOIN keepers k ON k.fp = f.fp AND k.keep_id = f.doc_id
    JOIN qual q ON q.doc_id = f.doc_id
    JOIN lang l ON l.doc_id = f.doc_id
    WHERE ROUND(q.q, 6) >= 0.5 AND l.lg = 'en'
    """,
    doc="End-to-end curation filter: exact-dup canonical survivors with "
    "quality >= 0.5 and language-ID 'en' — the dedup+quality+langid "
    "composition a pretraining data pipeline runs per snapshot. Single "
    "document scan feeds all three signals; only fingerprints shuffle.",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import exact_dedup

    d = load_fixture(spark, sf_dir, "documents")
    canon = exact_dedup(d).filter(F.col("is_canonical")).select("doc_id")
    sig = d.select(
        "doc_id",
        quality_score(F.col("text")).alias("quality"),
        lang_guess(F.col("text")).alias("lang_guess"),
    )
    return (
        canon.join(sig, "doc_id")
        .filter((F.col("quality") >= 0.5) & (F.col("lang_guess") == "en"))
        .select("doc_id", F.round("quality", 6).alias("quality"), "lang_guess")
    )
