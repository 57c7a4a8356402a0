"""Composed training-data curation pipeline (the product story in one call).

``curate_documents`` chains the library's exact dedup ladder the way a
corpus-curation job would: exact text dedup (canonical = min id per distinct
text) → integer quality gate → pairwise near-duplicate drop (keep the lower
id of each qualifying pair). Every stage is EXACT and deterministic, so the
entire composition is checkable against one ANSI-SQL oracle — the same
contract as each individual operator.

At 100 TB the plan is: stage 1 shuffles 8-byte fingerprints (not bodies),
stage 2 is a pure codegen projection, stage 3 is the inverted-index shingle
join (use ``scale=True`` to bound hot-shingle fan-out, PLANS.md §5a); the
final anti-join's right side is only the near-dup ids (tiny → broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfuse.dedup import exact_dedup, ngram_jaccard_pairs
from sparkfuse.textops import quality_stats


def curate_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 5,
    max_token_len: int = 40,
    scale: bool = False,
) -> DataFrame:
    """Returns the curated (kept) ids after dedup → quality → near-dup drop.

    Near-dup policy is pairwise-canonical: for every near-dup pair
    (id_a < id_b) among quality survivors, id_b is dropped — deterministic
    and SQL-expressible (no transitive closure), which is what makes the
    whole pipeline oracle-checkable.
    """
    # exact_dedup groups on the 64-bit fingerprint, so this stage shuffles
    # 8 bytes + id per row, never document bodies (fingerprint-equality ≡
    # text-equality at any realistic corpus size; the SQL oracle groups on
    # the full text, so a collision would surface as an oracle mismatch)
    kept1 = docs.join(exact_dedup(docs, id_col, text_col), id_col, "left_semi")
    q = quality_stats(kept1, id_col, text_col).filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("max_token_len") <= max_token_len)
    )
    kept2 = kept1.join(q.select(id_col), id_col, "left_semi")
    pairs = ngram_jaccard_pairs(kept2, id_col, text_col, scale=scale)
    dropped = pairs.select(F.col("id_b").alias(id_col))
    return kept2.join(dropped, id_col, "left_anti").select(id_col)


def curate_documents_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    min_tokens: int = 5,
    max_token_len: int = 40,
) -> str:
    """DuckDB twin of curate_documents (scale=False path)."""
    from sparkfuse.dedup import ngram_jaccard_pairs_oracle_sql

    toks = f"string_split_regex(trim({text_col}), '\\s+')"
    pairs = ngram_jaccard_pairs_oracle_sql("kept2", id_col, text_col)
    return f"""
WITH canon AS (
  SELECT MIN({id_col}) AS {id_col} FROM {table} GROUP BY {text_col}
),
kept1 AS (
  SELECT d.{id_col}, d.{text_col} FROM {table} d
  WHERE d.{id_col} IN (SELECT {id_col} FROM canon)
),
kept2 AS (
  SELECT {id_col}, {text_col} FROM kept1
  WHERE len({toks}) >= {min_tokens}
    AND list_max(list_transform({toks}, t -> length(t))) <= {max_token_len}
),
pairs AS ({pairs})
SELECT {id_col} FROM kept2
WHERE {id_col} NOT IN (SELECT id_b FROM pairs)
"""
