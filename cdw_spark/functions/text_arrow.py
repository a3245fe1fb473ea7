"""Arrow-vectorized rolling-hash fingerprints — the fast path beside the
Column-expression definition in cdw_spark/functions/text.py.

Why this exists: Catalyst higher-order functions (aggregate/transform) are
interpreted per element, not codegen'd — the char-fold formulation costs
~0.5 ms/doc. The polynomial hash H = sum(c_i * B^(n-1-i)) mod M is a dot
product against precomputed powers of B (mod M), which numpy evaluates in
one vector op per document: same math, exact same values (int64 stays
exact: code < 2^7, power < 2^31, len*product < 2^48), ~10x faster, and
Arrow-batched so executors stream constant-size chunks.

This is the sanctioned Python hot path: per-row JVM expressions cannot
express "fold over a variable-length array" efficiently, so the work moves
to a vectorized Pandas iterator, NOT a row-at-a-time Python UDF.

Semantics contract: output is bit-identical to rolling_hash /
winnow_fingerprint (same normalization, same shingling, same Horner mod) —
enforced by the shared DuckDB oracle of text_rolling_fingerprint[_arrow]
and by tests/test_text_arrow.py comparing the two paths row-for-row.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .text import RH_BASE, RH_MOD

_KEEP = re.compile(r"[^a-z0-9 ]")
# re.ASCII: Python's \s matches Unicode whitespace (\xa0, ideographic
# space, ...) but Java's (Spark) and RE2's (DuckDB) default \s is
# ASCII-only — the word splitter must agree with the engines, not Python.
# (Found by hypothesis: '\xa0' split words in Python but not in Spark.)
_WS = re.compile(r"\s+", re.ASCII)

_MAX_POW = 65536  # longest hashable span; extended on demand


def _pows(n: int) -> np.ndarray:
    """B^0..B^(n-1) mod M, little-endian (index i = power for the i-th
    char from the END of the string)."""
    p = np.empty(n, dtype=np.int64)
    acc = 1
    for i in range(n):
        p[i] = acc
        acc = (acc * RH_BASE) % RH_MOD
    return p


_POW_CACHE = _pows(_MAX_POW)


def _hash_str(s: str, pows: np.ndarray) -> int:
    """Polynomial hash of the [a-z0-9 ]-filtered chars of ``s`` — equals
    the sequential Horner fold (acc*B + c) % M over the same chars."""
    filtered = _KEEP.sub("", s)
    if not filtered:
        return 0
    codes = np.frombuffer(filtered.encode("ascii"), dtype=np.uint8).astype(np.int64)
    n = len(codes)
    # sum(c_i * B^(n-1-i)) mod M; products < 2^38, safe to sum ~2^25 terms
    return int((codes * pows[:n][::-1]).sum() % RH_MOD)


# str.translate deletion table: drop everything outside [a-z0-9 ] (C-speed
# per-word filter; non-ASCII words fall back to the regex)
_DEL_TBL = {i: None for i in range(128) if chr(i) not in "abcdefghijklmnopqrstuvwxyz0123456789 "}


def _filter_word(w: str) -> str:
    return w.translate(_DEL_TBL) if w.isascii() else _KEEP.sub("", w)


def _hash_many(bufs: list[bytes], pows: np.ndarray) -> np.ndarray:
    """Polynomial hashes of many byte strings in one vector op: each buffer
    right-aligned in a (W, Lmax) matrix (leading \\x00 pads contribute
    0 * B^k = 0, so padding preserves the hash), then a single
    codes x powers product-sum mod M. Row sums stay < Lmax * 2^38 —
    exact in int64 for documents up to ~2^13 chars per shingle."""
    if not bufs:
        return np.empty(0, dtype=np.int64)
    lmax = max(len(b) for b in bufs) or 1
    joined = b"".join(b.rjust(lmax, b"\x00") for b in bufs)
    mat = np.frombuffer(joined, dtype=np.uint8).reshape(len(bufs), lmax).astype(np.int64)
    return (mat * pows[:lmax][::-1]).sum(axis=1) % RH_MOD


FP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fp_rolling", LongType()),
        StructField("fp_winnow", LongType()),
    ]
)


def rolling_fingerprints_arrow(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(doc_id, fp_rolling, fp_winnow) via mapInPandas — semantics of
    functions.text.rolling_hash + winnow_fingerprint, vectorized."""
    src = df.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("t"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pows = _POW_CACHE
        for pdf in batches:
            rolling: list[int | None] = []
            winnow: list[int | None] = []
            for raw in pdf["t"]:
                if raw is None:
                    # NULL text -> NULL fingerprints, as every engine's
                    # expression path propagates
                    rolling.append(None)
                    winnow.append(None)
                    continue
                # strip SPACES only: Spark/DuckDB trim() does not touch
                # \n\t, and the word splitter sees those differences
                norm = str(raw).strip(" ").lower()
                if len(norm) > len(pows):  # pragma: no cover - huge docs
                    pows = _pows(len(norm))
                rolling.append(_hash_str(norm, pows))
                ws = _WS.split(norm)
                fw = [_filter_word(w).encode("ascii") for w in ws]
                if len(ws) >= n:
                    bufs = [b" ".join(fw[i : i + n]) for i in range(len(ws) - n + 1)]
                else:
                    bufs = [b" ".join(fw)]
                winnow.append(int(_hash_many(bufs, pows).min()))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "fp_rolling": rolling, "fp_winnow": winnow}
            )

    return src.mapInPandas(run, FP_SCHEMA)


SHINGLE_SCHEMA_TMPL = "{id_col} long, sh string"


def shingle_rows_arrow(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Exploded (id, distinct word-n-gram shingle) rows via mapInPandas —
    the vectorized twin of functions.text.shingles + explode (same
    normalization: trim spaces, lower, split on \\s+, ' '-joined grams,
    per-doc distinct; sub-n-word docs yield their full token string).

    Python string slicing beats the interpreted transform+concat_ws+
    array_distinct chain ~5x at sf0.1; the 1->N row explosion happens
    inside the Arrow batch, so no Generate node and no extra pass."""
    src = df.select(F.col(id_col).cast("long").alias(id_col), F.col(text_col).alias("t"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            shs: list[str] = []
            for doc_id, raw in zip(pdf[id_col], pdf["t"]):
                norm = ("" if raw is None else str(raw)).strip(" ").lower()
                ws = _WS.split(norm)
                if len(ws) >= n:
                    grams = {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}
                else:
                    grams = {" ".join(ws)}
                ids.extend([doc_id] * len(grams))
                shs.extend(grams)
            yield pd.DataFrame({id_col: ids, "sh": shs})

    return src.mapInPandas(run, SHINGLE_SCHEMA_TMPL.format(id_col=id_col))


def minhash_signatures_arrow(
    df: DataFrame,
    perm_a: list[int],
    perm_b: list[int],
    prime: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document MinHash signatures in ONE Arrow pass: shingle, hash
    (polynomial rolling hash — same values as functions.text), permute and
    min — all inside the batch. Replaces the explode -> xxhash -> 64
    min-aggregates pipeline: no Generate node, no 260k-row intermediate,
    no shuffle (the output is already one row per doc).

    numpy shapes: shingle hashes (W,1) x perms (1,P) -> (W,P) affine
    transforms mod prime, min over axis 0. Products < 2^62 stay exact in
    int64. Deterministic: constants are compile-time-seeded."""
    n_perms = len(perm_a)
    A = np.asarray(perm_a, dtype=np.int64)[None, :]
    B = np.asarray(perm_b, dtype=np.int64)[None, :]
    src = df.select(F.col(id_col).cast("long").alias(id_col), F.col(text_col).alias("t"))
    schema = f"{id_col} long, " + ", ".join(f"mh_{i} long" for i in range(n_perms))
    cols = [id_col] + [f"mh_{i}" for i in range(n_perms)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pows = _POW_CACHE
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf[id_col], pdf["t"]):
                norm = ("" if raw is None else str(raw)).strip(" ").lower()
                if len(norm) > len(pows):  # pragma: no cover - huge docs
                    pows = _pows(len(norm))
                ws = _WS.split(norm)
                # filter each word once (C-speed translate), build gram
                # BYTES directly — the hash input is the filtered form of
                # the ' '-joined gram, identical to _hash_str(gram)
                fw = [_filter_word(w).encode("ascii") for w in ws]
                if len(ws) >= n:
                    bufs = {b" ".join(fw[i : i + n]) for i in range(len(ws) - n + 1)}
                else:
                    bufs = {b" ".join(fw)}
                hs = _hash_many(list(bufs), pows)[:, None]
                mh = ((hs * A + B) % prime).min(axis=0)
                rows.append([doc_id, *mh.tolist()])
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(run, schema)


def centroid_topn_arrow(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    topn: int,
    id_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid, crank) rows: each vector's ``topn`` nearest centroids by
    cosine, via one numpy matmul per Arrow batch — U @ C.T where U is the
    unit-normalized batch and C the unit centroid matrix (the FAISS-style
    coarse-quantizer scoring). Replaces the unrolled literal-weight SQL
    expressions whose ~nlist*dim-term trees cost seconds of Janino codegen
    compilation per plan (execution was never the bottleneck; compilation
    was). Ties resolve to the lower centroid list index (np.argsort is
    stable with kind='stable')."""
    C = np.asarray([c for _, c in cents], dtype=np.float64)
    cids = np.asarray([cid for cid, _ in cents], dtype=np.int64)
    src = df.select(F.col(id_col).cast("long").alias(id_col), F.col(vec_col).alias("v"))
    schema = f"{id_col} long, cid int, crank int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            norms = np.sqrt((V * V).sum(axis=1, keepdims=True))
            norms[norms == 0.0] = 1.0
            scores = (V / norms) @ C.T  # (n, nlist)
            # stable argsort on -score: equal scores keep centroid order
            order = np.argsort(-scores, axis=1, kind="stable")[:, :topn]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), topn),
                    "cid": cids[order].reshape(-1).astype(np.int32),
                    "crank": np.tile(np.arange(1, topn + 1, dtype=np.int32), n),
                }
            )

    return src.mapInPandas(run, schema)


def signature_arrow(
    df: DataFrame,
    planes: list[list[float]],
    vec_name: str,
    out: str,
) -> DataFrame:
    """Random-hyperplane signature via vectorized numpy per Arrow batch —
    the wide-signature fast path. The per-plane Column-expression form
    codegens cleanly at 8 planes, but 16 planes x 64 terms in one Project
    blows Janino's 64 KB method limit: every stage logs a failed compile
    and falls back to interpreted evaluation, measured ~2x end-to-end on
    similarity_ann_lsh_wide (the compile ATTEMPTS are re-paid per stage).

    Bit parity with the SQL path and DuckDB's list_dot_product is kept by
    accumulating the dots in a LOOP OVER DIMENSIONS (vectorized across
    rows and planes): each dot folds sequentially left-assoc, so signs —
    and therefore signatures — are identical in all three evaluators
    (asserted in tests/test_similarity.py)."""
    P = np.asarray(planes, dtype=np.float64)  # (n_planes, dim)
    n_planes, dim = P.shape
    weights = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, {out} long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_name]])
            acc = np.zeros((len(pdf), n_planes))
            for j in range(dim):  # sequential fold over dims = SQL chain order
                acc += V[:, j : j + 1] * P[:, j]
            sig = ((acc > 0.0).astype(np.int64) * weights).sum(axis=1)
            pdf = pdf.copy()
            pdf[out] = sig
            yield pdf

    return df.mapInPandas(run, schema)


def pq_codes_arrow(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes) rows: product-quantization encoding — the vector is
    split into ``m = len(codebooks)`` contiguous subvectors and each is
    replaced by the index of its nearest (L2) codeword. One numpy
    distance computation per Arrow batch per block; ties resolve to the
    lower codeword index (stable argmin). Codes are the 100 TB at-rest
    form: m small ints (m bytes at ksub<=256) instead of dim floats."""
    CB = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(CB)
    dsub = CB[0].shape[1]
    src = df.select(F.col(id_col).cast("long").alias(id_col), F.col(vec_col).alias("v"))
    schema = f"{id_col} long, codes array<int>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            S = V.reshape(len(pdf), m, dsub)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                d = ((S[:, j, None, :] - CB[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d, axis=1)  # first min: stable tie-break
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    return src.mapInPandas(run, schema)


def pq_lut_arrow(
    probes: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, lut) rows: per-probe asymmetric-distance lookup table —
    lut[j][c] = squared L2 distance from the probe's j-th subvector to
    codeword c. ADC scoring then never touches the probe vector again:
    candidate distance = sum_j lut[j][codes[j]] (m additions per pair)."""
    CB = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(CB)
    dsub = CB[0].shape[1]
    src = probes.select(
        F.col(id_col).cast("long").alias(id_col), F.col(vec_col).alias("v")
    )
    schema = f"{id_col} long, lut array<array<double>>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            S = V.reshape(len(pdf), m, dsub)
            luts = []
            for r in range(len(pdf)):
                luts.append(
                    [
                        ((S[r, j, None, :] - CB[j]) ** 2).sum(axis=1).tolist()
                        for j in range(m)
                    ]
                )
            yield pd.DataFrame({id_col: pdf[id_col], "lut": luts})

    return src.mapInPandas(run, schema)
