"""Dataset-curation queries (operators in cdw_spark/operators/curate.py):
the pipeline steps between raw ingest and tokenization — benchmark
decontamination, PII redaction, repetition profiling, deterministic
split sampling, and MERGE-style incremental upsert.

Cross-engine discipline: regexes are ASCII-only and lookaround-free (Java
regex and RE2 agree), hashes are md5 (engine-independent), ratios are
ROUND(double, 6), and every integral output is cast to the same width on
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_fixture
from ..operators.curate import (
    EMAIL_RE,
    IPV4_RE,
    decontaminate_against,
    hash_split,
    merge_latest_state,
    pii_counts_and_redact,
    repetition_profile,
)
from ..registry import register

# Word 4-gram shingles in DuckDB, mirroring functions.text.shingles(n=4)
# token for token (lower/trim -> split on \s+ -> distinct 4-grams, short
# docs collapse to their full token string).
_SHINGLE4_SQL = """
WITH wrds AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws
    FROM documents
), sh AS (
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(ws) >= 4
             THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                   for i in range(1, len(ws) - 2)]
             ELSE [array_to_string(ws, ' ')] END)) AS g
    FROM wrds
)
"""


@register(
    "decontaminate_ngrams",
    oracle=_SHINGLE4_SQL
    + """
    , bench AS (
        SELECT DISTINCT g FROM sh WHERE doc_id % 17 = 0
    ), contaminated AS (
        SELECT DISTINCT s.doc_id
        FROM sh s JOIN bench b ON s.g = b.g
        WHERE s.doc_id % 17 <> 0
    )
    SELECT d.doc_id, d.source
    FROM documents d
    WHERE d.doc_id % 17 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
    doc="Benchmark decontamination: drop training documents sharing any "
    "word 4-gram with the held-out benchmark slice (doc_id % 17 = 0) — "
    "the eval-contamination rule of large-LM data pipelines. Benchmark "
    "shingles broadcast (eval suites are MBs at any corpus scale).",
)
def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_fixture(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 17 != 0)
    benchmark = d.filter(F.col("doc_id") % 17 == 0)
    return decontaminate_against(corpus, benchmark, n=4).select("doc_id", "source")


# Deterministic fake-PII augmentation: the fixture corpus is synthetic
# word salad with no PII, so both engines append the same doc_id-derived
# contact strings before redacting — the redaction path is exercised on
# every row with known expected counts (m=0: 1 email; m=1: 1 ip;
# m=2: 2 emails + 1 ip).
_PII_AUG_SQL = """
        text || CASE CAST(doc_id % 3 AS INTEGER)
            WHEN 0 THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com'
            WHEN 1 THEN ' from host 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.7'
            ELSE ' user' || CAST(doc_id AS VARCHAR) || '@example.com backup b'
                 || CAST(doc_id AS VARCHAR) || '@test.org at 10.0.'
                 || CAST(doc_id % 200 AS VARCHAR) || '.9'
        END
"""


@register(
    "pii_redact",
    oracle="""
    WITH aug AS (
        SELECT doc_id, """
    + _PII_AUG_SQL
    + """ AS s
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(s, '"""
    + EMAIL_RE
    + """')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(s, '"""
    + IPV4_RE
    + """')) AS INTEGER) AS n_ips,
           md5(regexp_replace(regexp_replace(s, '"""
    + EMAIL_RE
    + """', '<EMAIL>', 'g'), '"""
    + IPV4_RE
    + """', '<IP>', 'g')) AS redacted_md5
    FROM aug
    """,
    doc="PII scrub: count and redact emails and IPv4 addresses "
    "(ASCII regex, identical under Java regex and RE2), emitting the "
    "redacted-text digest. Pure codegen projection — no shuffle.",
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_fixture(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = (F.col("doc_id") % 3).cast("int")
    aug = F.concat(
        F.col("text"),
        F.when(m == 0, F.concat(F.lit(" reach user"), sid, F.lit("@example.com")))
        .when(
            m == 1,
            F.concat(
                F.lit(" from host 10.0."),
                (F.col("doc_id") % 200).cast("string"),
                F.lit(".7"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit(" user"),
                sid,
                F.lit("@example.com backup b"),
                sid,
                F.lit("@test.org at 10.0."),
                (F.col("doc_id") % 200).cast("string"),
                F.lit(".9"),
            )
        ),
    )
    n_emails, n_ips, redacted = pii_counts_and_redact(aug)
    return d.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    )


@register(
    "quality_repetition",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
        FROM documents
    ), c AS (
        SELECT doc_id, word, COUNT(*) AS cnt FROM tok GROUP BY doc_id, word
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_words,
           ROUND(COUNT(*) * 1.0 / CAST(SUM(cnt) AS DOUBLE), 6) AS distinct_ratio,
           ROUND(MAX(cnt) * 1.0 / CAST(SUM(cnt) AS DOUBLE), 6) AS top_word_ratio
    FROM c GROUP BY doc_id
    """,
    doc="Repetition/diversity profiling (Gopher-style filters): words per "
    "doc, distinct-word ratio, and the mass share of the most frequent "
    "word. One (doc_id, word) shuffle with map-side partial aggregation.",
)
def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_profile(load_fixture(spark, sf_dir, "documents"))


@register(
    "sample_hash_split",
    oracle="""
    WITH h AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents
    ), v AS (
        SELECT doc_id,
               CAST((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096
                  + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256
                  + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)
                 AS INTEGER) AS val
        FROM h
    )
    SELECT doc_id,
           CAST(val % 1000 AS INTEGER) AS bucket,
           CASE WHEN val % 1000 < 800 THEN 'train'
                WHEN val % 1000 < 900 THEN 'valid'
                ELSE 'test' END AS split
    FROM v
    """,
    doc="Deterministic train/valid/test assignment: bucket = first 16 "
    "bits of md5(doc_id) mod 1000 (800/100/100). Engine- and "
    "partitioning-independent (unlike rand()/xxhash64 seeds) — the "
    "reproducibility property a 100 TB re-ingest needs. No shuffle.",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hash_split(load_fixture(spark, sf_dir, "documents"))


_MERGE_CUTOFF = "2024-01-20 00:00:00"


@register(
    "merge_incremental_upsert",
    oracle=f"""
    WITH t AS (
        SELECT user_id, event_type, value, ts AS last_ts, event_id
        FROM events WHERE ts < TIMESTAMP '{_MERGE_CUTOFF}'
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) = 1
    ), s AS (
        SELECT user_id, event_type, value, ts AS last_ts, event_id
        FROM events WHERE ts >= TIMESTAMP '{_MERGE_CUTOFF}'
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT COALESCE(t.user_id, s.user_id) AS user_id,
           COALESCE(t.event_type, s.event_type) AS event_type,
           COALESCE(s.value, t.value) AS value,
           COALESCE(s.last_ts, t.last_ts) AS last_ts,
           CASE WHEN t.user_id IS NULL THEN 'insert'
                WHEN s.user_id IS NULL THEN 'keep'
                ELSE 'update' END AS op
    FROM t FULL OUTER JOIN s
      ON t.user_id = s.user_id AND t.event_type = s.event_type
    """,
    doc="MERGE INTO for a latest-state table: yesterday's snapshot "
    "(events before the cutoff) merged with the new delta, one row per "
    "(user, event_type), rows tagged insert/update/keep. Both sides "
    "reduce and join on the same keys — one exchange per side under AQE.",
)
def merge_incremental_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_fixture(spark, sf_dir, "events")
    cols = ["user_id", "event_type", F.col("value"), F.col("ts").alias("last_ts"), "event_id"]
    target = e.filter(F.col("ts") < F.lit(_MERGE_CUTOFF).cast("timestamp")).select(*cols)
    source = e.filter(F.col("ts") >= F.lit(_MERGE_CUTOFF).cast("timestamp")).select(*cols)
    merged = merge_latest_state(
        target, source, keys=["user_id", "event_type"], order_cols=["last_ts", "event_id"]
    )
    return merged.select("user_id", "event_type", "value", "last_ts", "op")
