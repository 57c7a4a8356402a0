"""Composed training-data curation pipeline (the product story in one call).

``curate_documents`` chains the library's exact dedup ladder the way a
corpus-curation job would: exact text dedup (canonical = min id per distinct
text) → integer quality gate → transitive near-duplicate clustering
(connected components over the pair graph; one canonical doc per cluster).
Every stage is EXACT and deterministic, so the entire composition is
checkable against one ANSI-SQL oracle (the components stage as a recursive
CTE) — the same contract as each individual operator.

At 100 TB the plan is: stage 1 shuffles 16-byte fingerprints (not bodies),
stage 2 is a pure codegen projection, stage 3 is the inverted-index shingle
join (use ``scale=True`` to bound hot-shingle fan-out, PLANS.md §5a) plus
O(diameter) label-propagation rounds over the pair graph only; the final
anti-join's right side is only the near-dup ids (tiny → broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfuse.dedup import exact_dedup, ngram_jaccard_pairs
from sparkfuse.textops import TOKEN_SPLIT, quality_stats


def curate_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 5,
    max_token_len: int = 40,
    scale: bool = False,
    canonical: str = "components",
    redact: bool = False,
    max_dup_line_frac: float | None = None,
    max_dup_gram_frac: float | None = None,
    dup_gram_n: int = 3,
    strip_boilerplate_min_docs: int | None = None,
    boilerplate_min_chars: int = 1,
) -> DataFrame:
    """Returns the curated (kept) ids after [redact → strip-boilerplate →]
    dedup → quality [→ repetition gate] → near-dup drop.

    ``redact=True`` applies PII redaction (sparkfuse.redact) FIRST, so
    every later stage fingerprints/shingles the redacted text — two
    documents differing only in the PII they carry become duplicates, the
    correct curation semantics (and the reason redaction cannot run
    after dedup). Costs one codegen projection; no extra exchange.

    ``strip_boilerplate_min_docs`` enables CROSS-document boilerplate line
    removal (sparkfuse.repetition.strip_boilerplate_lines, broadcast
    regime) after redaction and before dedup — two documents differing
    only in shared boilerplate (headers, navigation, license banners)
    become exact duplicates, for the same reason redaction runs first.
    Costs the census's one line shuffle; the strip itself is a
    zero-exchange projection.

    ``max_dup_line_frac`` / ``max_dup_gram_frac`` enable the Gopher-style
    within-document repetition gates (sparkfuse.repetition): drop a
    document when its duplicate-line (or duplicate-``dup_gram_n``-gram)
    occurrences exceed the given fraction of the total. The gate is a
    plain codegen filter over the text column — no join, no exchange —
    sitting between the quality gate and the shingle join, which is the
    right order at scale: boilerplate-heavy documents are exactly the
    ones that explode shingle fan-out downstream.

    Near-dup canonicalization policy:

    * ``canonical="components"`` (default) — TRANSITIVE clustering: connected
      components over the near-dup pair graph (graph.connected_components,
      hash-min label propagation, O(diameter) rounds); each cluster keeps
      exactly its min id. A chain A~B~C collapses to A even though (A, C) is
      not itself a pair — the standard corpus-dedup requirement. Still
      oracle-checkable (min-reachable-id is a SQL recursive CTE).
    * ``canonical="pairwise"`` — drop id_b of every pair. Cheaper (no
      iteration) but a chain A~B~C keeps both A and C.
    """
    if redact:
        from sparkfuse.redact import redact_pii

        docs = redact_pii(docs, text_col)
    if strip_boilerplate_min_docs is not None:
        from sparkfuse.repetition import strip_boilerplate_lines

        docs = strip_boilerplate_lines(
            docs,
            id_col,
            text_col,
            min_docs=strip_boilerplate_min_docs,
            min_chars=boilerplate_min_chars,
        ).select(F.col(id_col), F.col("text").alias(text_col))
    # exact_dedup groups on the 128-bit fingerprint (two xxhash64 lanes), so
    # this stage shuffles 16 bytes + id per row, never document bodies.
    # 128-bit keeps fingerprint-equality ≡ text-equality even at 10^12 docs
    # (~4e-16 expected collisions, vs ~27k on 64-bit — see
    # dedup.fingerprint_cols); the SQL oracle groups on the full text, so a
    # collision would surface as an oracle mismatch.
    kept1 = docs.join(exact_dedup(docs, id_col, text_col), id_col, "left_semi")
    q = quality_stats(kept1, id_col, text_col).filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("max_token_len") <= max_token_len)
    )
    kept2 = kept1.join(q.select(id_col), id_col, "left_semi")
    if max_dup_line_frac is not None or max_dup_gram_frac is not None:
        from sparkfuse.repetition import dup_fraction_gate

        kept2 = kept2.filter(
            dup_fraction_gate(
                text_col, max_dup_line_frac, max_dup_gram_frac, dup_gram_n
            )
        )
    pairs = ngram_jaccard_pairs(kept2, id_col, text_col, scale=scale)
    if canonical == "components":
        from sparkfuse.graph import connected_components

        comps = connected_components(pairs)
        dropped = comps.filter(F.col("id") != F.col("comp")).select(
            F.col("id").alias(id_col)
        )
    elif canonical == "pairwise":
        dropped = pairs.select(F.col("id_b").alias(id_col))
    else:
        raise ValueError(
            f"canonical must be 'components' or 'pairwise', got {canonical!r}"
        )
    return kept2.join(dropped, id_col, "left_anti").select(id_col)


def curate_documents_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    min_tokens: int = 5,
    max_token_len: int = 40,
    canonical: str = "components",
    redact: bool = False,
    max_dup_line_frac: float | None = None,
    max_dup_gram_frac: float | None = None,
    dup_gram_n: int = 3,
    strip_boilerplate_min_docs: int | None = None,
    boilerplate_min_chars: int = 1,
) -> str:
    """DuckDB twin of curate_documents (scale=False path). The components
    policy is expressed as a recursive CTE (min reachable id per node);
    ``redact=True`` prefixes the same RE2 redaction chain the Spark side
    applies (sparkfuse.redact's cross-engine pattern contract); the
    repetition-gate params add the identical boolean predicate to kept2;
    ``strip_boilerplate_min_docs`` prefixes the strip twin in the same
    redact-then-strip-then-dedup order the Spark side composes."""
    from sparkfuse.dedup import ngram_jaccard_pairs_oracle_sql
    from sparkfuse.repetition import dup_fraction_gate_sql

    if redact:
        from sparkfuse.redact import redact_oracle_sql

        inner = redact_oracle_sql(table, id_col, text_col)
        table = f"(SELECT {id_col}, redacted AS {text_col} FROM ({inner}))"
    if strip_boilerplate_min_docs is not None:
        from sparkfuse.repetition import strip_boilerplate_oracle_sql

        inner = strip_boilerplate_oracle_sql(
            table,
            id_col,
            text_col,
            min_docs=strip_boilerplate_min_docs,
            min_chars=boilerplate_min_chars,
        )
        table = f"(SELECT {id_col}, text AS {text_col} FROM ({inner}))"

    toks = f"string_split_regex(trim({text_col}), '{TOKEN_SPLIT}')"
    pairs = ngram_jaccard_pairs_oracle_sql("kept2", id_col, text_col)
    if canonical == "components":
        from sparkfuse.graph import components_reach_cte

        drop = f"""
{components_reach_cte()},
dropped AS (
  SELECT id FROM (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id)
  WHERE id != comp
)"""
    elif canonical == "pairwise":
        drop = "dropped AS (SELECT id_b AS id FROM pairs)"
    else:
        raise ValueError(f"unknown canonical policy {canonical!r}")
    return f"""
WITH RECURSIVE canon AS (
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
    AND {dup_fraction_gate_sql(text_col, max_dup_line_frac, max_dup_gram_frac, dup_gram_n)}
),
pairs AS ({pairs}),
{drop}
SELECT {id_col} FROM kept2
WHERE {id_col} NOT IN (SELECT id FROM dropped)
"""
