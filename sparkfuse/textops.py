"""Text-analysis operators for training-data pipelines.

All hot paths are JVM-side column expressions (split/filter/aggregate inside
whole-stage codegen) — no Python in the scan path. Each operator has an exact
ANSI-SQL twin used as the DuckDB oracle; outputs are integers or
deterministically tie-broken labels so cross-engine comparison is bit-safe.

Operators:
  token_stats     — token/char counts per document
  quality_stats   — integer quality features (unique tokens, max token len,
                    stopword hits) for filtering pipelines
  lang_id         — deterministic stopword-vote language heuristic
  fingerprint     — 64-bit full-text fingerprint (xxhash64) for exact dedup;
                    fingerprint-equality ≡ text-equality at any realistic
                    corpus size (collision ~ n^2/2^64)
  simhash64       — 64-bit SimHash over token multiset (numpy kernel; the
                    locality-sensitive fingerprint for near-dup hunting)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkfuse.hashing import xxh64_u64

# Deterministic stopword lists for the vote heuristic (tiny on purpose —
# the operator contract is determinism + parity, not linguistic accuracy).
LANG_STOPWORDS = {
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "en": ["the", "a", "and", "of", "to", "is", "in", "that"],
    "es": ["el", "la", "los", "una", "es", "en", "que", "por"],
    "fr": ["le", "la", "les", "une", "est", "et", "que", "pour"],
}

TOKEN_SPLIT = r"\s+"


def tokens_col(text: str | Column) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(col), TOKEN_SPLIT)


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = tokens_col(text_col)
    # cast to long: cross-engine oracles (DuckDB len/length return BIGINT)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_text"),
    )


def quality_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Integer quality features; the scoring policy (thresholds) stays with
    the caller — these are the measurements."""
    toks = tokens_col(text_col)
    uniq = F.array_distinct(toks)
    stop_en = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(uniq).cast("long").alias("n_uniq_tokens"),
        F.array_max(F.transform(toks, F.length)).cast("long").alias("max_token_len"),
        F.size(F.array_intersect(uniq, stop_en)).cast("long").alias("n_stopword_kinds"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_text"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-vote language heuristic.

    score(lang) = #tokens (with multiplicity) in lang's stopword list;
    prediction = lexicographically-first lang among the max scorers, or
    'und' (undetermined) when every score is 0. Fully deterministic, so the
    identical rule is expressible in ANSI SQL for the oracle.
    """
    toks = tokens_col(text_col)
    def _score(words):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = [
        _score(LANG_STOPWORDS[lang]).alias(f"score_{lang}")
        for lang in sorted(LANG_STOPWORDS)
    ]
    scored = df.select(F.col(id_col), F.col(text_col), *scores)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best == 0, F.lit("und"))
    for l in langs:  # first max wins (lexicographic because langs is sorted)
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return scored.select(F.col(id_col), pred.alias("pred_lang"))


def lang_id_oracle_sql(table: str, id_col: str, text_col: str) -> str:
    """The identical heuristic in DuckDB SQL (the oracle twin of lang_id)."""
    langs = sorted(LANG_STOPWORDS)
    score_exprs = []
    for lang in langs:
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        score_exprs.append(
            f"len(list_filter(string_split_regex(trim({text_col}), '\\s+'), "
            f"t -> list_contains([{words}], t))) AS score_{lang}"
        )
    best = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lang in langs:
        case += f"WHEN score_{lang} = {best} THEN '{lang}' "
    case += "END"
    return (
        f"SELECT {id_col}, {case} AS pred_lang FROM "
        f"(SELECT {id_col}, {', '.join(score_exprs)} FROM {table})"
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit content fingerprint — the doc-level analog of the reference's
    caller-side key hashing (/root/reference/README.md:25-29)."""
    return df.select(
        F.col(id_col), F.xxhash64(F.col(text_col)).alias("fingerprint")
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over the token multiset (Charikar 2002): for each bit,
    majority vote of token-hash bits weighted by term frequency. Arrow-batched
    numpy kernel: hashing + bit votes vectorized per batch; near-duplicate
    texts land within a few bits of Hamming distance.
    """

    def kernel(batches):
        for pdf in batches:
            out_ids = pdf[id_col]
            sims = np.empty(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf[text_col].astype(str)):
                toks = text.split()
                if not toks:
                    sims[i] = 0
                    continue
                # vectorized: hash every token, then per-bit +1/-1 votes
                codes, counts = np.unique(np.array(toks), return_counts=True)
                h = xxh64_u64(
                    np.array(
                        [hash_token(t) for t in codes], dtype=np.uint64
                    )
                )
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
                votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
                sims[i] = int(
                    np.uint64(
                        ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
                    ).astype(np.int64)
                )
            yield pd.DataFrame({id_col: out_ids, "simhash": sims})

    import zlib

    def hash_token(t: str) -> int:
        # stable token -> u64 seed for xxh64 (crc32 pair; deterministic
        # across processes, unlike python's builtin hash())
        b = t.encode("utf-8")
        return (zlib.crc32(b) << 32) | zlib.crc32(b[::-1])

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("simhash", LongType(), True),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(kernel, schema)


def hamming64(a: Column, b: Column) -> Column:
    """Population count of (a XOR b) — JVM-side, for simhash joins."""
    return F.bit_count(a.bitwiseXOR(b))
