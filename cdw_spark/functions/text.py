"""Text-analysis scalar functions for the large-scale pipeline layer
(BASELINE.json north star: language-ID, quality scoring, token counting,
fingerprinting — SURVEY.md §7.2 M5).

Everything is a JVM-side Column expression (split / transform / filter /
higher-order functions) — no Python UDFs: at 100 TB these run inside
whole-stage codegen on the executors.

Cross-engine discipline: each builder has an exact DuckDB-SQL counterpart in
cdw_spark/suite/text.py; regex and arithmetic are chosen to evaluate
identically in both engines (same regex class semantics, same double op
order; md5/sha256 are algorithmically engine-independent).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small marker sets for the stopword-based language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "nicht"],
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "que", "y"],
    "fr": ["le", "les", "est", "une"],
    "zh": ["de5", "shi4", "le5", "zai4"],  # romanized markers (ASCII corpus)
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def normalize_text(col: Column) -> Column:
    """Canonical form for exact dedup: lowercase, trim, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def words(col: Column) -> Column:
    """Whitespace tokenization of normalized text -> array<string>."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: runs of letters, runs of digits, and single
    other non-space chars — the regex approximation of a BPE pre-tokenizer."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles -> array<string>. Documents shorter
    than n words yield their full token string as a single shingle."""
    ws = words(col)
    gram = F.transform(
        F.sequence(F.lit(0), F.size(ws) - n),
        lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
    )
    return F.array_distinct(
        F.when(F.size(ws) >= n, gram).otherwise(F.array(F.concat_ws(" ", ws)))
    )


def _count_in(ws: Column, vocab: list[str]) -> Column:
    """Number of array elements that appear in ``vocab``."""
    return F.size(F.filter(ws, lambda x: x.isin(vocab)))


def punct_ratio(col: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    n = F.length(col)
    p = F.length(F.regexp_replace(col, r"[^.,!?;:]", ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(col: Column) -> Column:
    """Stopword tokens / total tokens."""
    ws = words(col)
    hits = _count_in(ws, STOPWORDS)
    return F.when(F.size(ws) > 0, hits.cast("double") / F.size(ws).cast("double")).otherwise(
        F.lit(0.0)
    )


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0,1]: length saturation, low
    punctuation noise, natural stopword density. Plain double arithmetic so
    the DuckDB oracle evaluates bit-identically."""
    toks = token_count(col).cast("double")
    return F.round(
        F.lit(0.4) * F.least(toks / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(col))
        + F.lit(0.3) * stopword_ratio(col),
        6,
    )


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-hit count per language."""
    ws = words(col)
    return {lang: _count_in(ws, markers) for lang, markers in sorted(LANG_MARKERS.items())}


def lang_guess(col: Column) -> Column:
    """Argmax language with deterministic alphabetical tie-break; 'und'
    (undetermined) when no marker hits."""
    scores = lang_scores(col)
    g = F.greatest(*scores.values())
    out = F.lit("und")
    # reverse-alphabetical CASE chain => earliest alphabetical wins ties
    for lang in sorted(scores, reverse=True):
        out = F.when((g > 0) & (scores[lang] == g), F.lit(lang)).otherwise(out)
    return out


# Rabin-Karp polynomial rolling hash: base/modulus chosen so the
# accumulator stays far inside int64 (acc < 2^31, base ~2^20 → product
# < 2^51) — both engines evaluate in exact BIGINT arithmetic.
RH_BASE = 1_000_003
RH_MOD = 2_147_483_647  # Mersenne prime 2^31 - 1


def _rolling_hash_over(s: Column) -> Column:
    """Horner-rule left fold over the [a-z0-9 ] characters of ``s`` —
    the rolling-hash accumulation, evaluated JVM-side via ``aggregate``."""
    chars = F.split(F.regexp_replace(s, "[^a-z0-9 ]", ""), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(RH_BASE) + F.ascii(c)) % F.lit(RH_MOD),
    )


def rolling_hash(col: Column) -> Column:
    """Whole-document Rabin-Karp hash of the normalized text."""
    return _rolling_hash_over(F.lower(F.trim(col)))


def winnow_fingerprint(col: Column, n: int = 3) -> Column:
    """Winnowing-style fingerprint: the minimum rolling hash across the
    document's word n-gram shingles (MOSS-style selection with window =
    whole document). Two documents sharing their rarest shingle collide.

    NULL text -> NULL (explicit guard: concat_ws inside shingles would
    otherwise swallow the NULL into '' and fingerprint it as 0)."""
    fp = F.array_min(F.transform(shingles(col, n), _rolling_hash_over))
    return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(fp)


def fingerprint_md5(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text —
    engine-independent (md5 is md5 everywhere)."""
    return F.md5(normalize_text(col))


def sha256_hex(col: Column) -> Column:
    """SHA-256 of the UTF-8 bytes (content addressing for blobs)."""
    return F.sha2(F.encode(col, "UTF-8"), 256)
