"""Benchmark decontamination: flag corpus documents containing evaluation
n-grams — the approximate-membership filter's marquee application in
training-data pipelines, composed from the library's own parts.

Shape (the reason this library exists at 100 TB): the benchmark side is
small (thousands of eval documents → millions of n-grams), the corpus side
is the 10^12-document training set. A filter forest built over the benchmark
n-gram hashes prescreens the corpus's exploded n-grams BEFORE any shuffle —
zero false negatives means no contamination escapes, and the ~0.4% false
positives are removed by an exact string confirm against the (broadcastable)
benchmark n-gram set. The corpus-side shuffle therefore carries only
(true matches + fpp·grams) instead of every n-gram of every document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfuse.dedup import shingles_of_tokens
from sparkfuse.forest import build_forest_driver
from sparkfuse.keys import fan_out_small
from sparkfuse.probe import approx_contains_udf
from sparkfuse.textops import tokens_col


def _gram_rows(df: DataFrame, text_col: str, n: int, *keep_cols: str) -> DataFrame:
    """Exploded (keep_cols..., gram) rows via a STAGED token projection:
    the 13-gram chain references the token array ``n`` times, and HOFs
    force interpreted eval where repeated non-cheap expressions re-run
    per use (PLANS.md §28) — staging makes the tokenization run once per
    row. ``fan_out_small`` unserializes the one-row-group scan this
    expansion-heavy projection would otherwise pipeline on."""
    staged = fan_out_small(df.select(*keep_cols, text_col)).select(
        *[F.col(c) for c in keep_cols], tokens_col(text_col).alias("_toks")
    )
    return staged.select(
        *[F.col(c) for c in keep_cols],
        F.explode(shingles_of_tokens(F.col("_toks"), n)).alias("gram"),
    )


def contamination_check(
    corpus: DataFrame,
    corpus_id: str,
    corpus_text: str,
    bench_df: DataFrame,
    bench_text: str,
    n: int = 13,
    spark: SparkSession | None = None,
) -> DataFrame:
    """(corpus_id, n_contaminated_grams) for every corpus document sharing at
    least one word n-gram with the benchmark set. EXACT: the fuse prescreen
    (zero FN) is confirmed by a string-level semi-join against the benchmark
    n-grams, so a plain SQL n-gram-intersection query is a valid oracle.

    n = 13 is the common eval-decontamination window (matches the published
    practice of 13-gram overlap checks); lower it for short documents.

    Reuse lifecycle: the deduped benchmark n-gram frame feeds BOTH the
    forest build (materialized eagerly inside this call) and the confirm
    join (materialized when the caller executes the result) — and it is
    deliberately NOT persisted. ``.cache()`` pins a relation in the
    CacheManager until an explicit unpersist, leaking one per call in a
    long-lived session (round-4 ADVICE); ``localCheckpoint()`` fixes the
    leak but truncates lineage onto single-replica executor-local blocks,
    so an executor loss between the two consumers fails the query instead
    of recomputing (round-5 review) — the wrong trade on the 10^12-doc
    cluster deployments this path targets. The benchmark side is SMALL by
    definition (that asymmetry is the whole design), so recomputing its
    explode+dedup once more at confirm time is the cheap, fault-tolerant,
    contract-free choice.
    """
    bench_grams = _gram_rows(bench_df, bench_text, n).dropDuplicates()
    # driver-side single-shard build: the benchmark side is SMALL by the
    # operator's premise (its gram strings broadcast whole for the exact
    # confirm below, so collecting the smaller 8-byte hashes here adds no
    # new scale constraint) — and it replaces 3 Spark job rounds per call
    # (count-distinct planning, shuffle+kernel build, state collect) with
    # one collect + an in-process kernel build of the identical filter.
    import numpy as np

    key_rows = bench_grams.select(F.xxhash64("gram").alias("key")).collect()
    forest = build_forest_driver(
        np.fromiter((r["key"] for r in key_rows), dtype=np.int64,
                    count=len(key_rows))
    )
    corpus_grams = _gram_rows(corpus, corpus_text, n, corpus_id)
    pre = corpus_grams.filter(
        approx_contains_udf(forest, spark)(F.xxhash64("gram"))
    )
    # explicit broadcast: benchmark gram sets can exceed the 10 MB
    # auto-broadcast threshold (millions of ~80-byte strings) and a silent
    # sort-merge fallback would re-shuffle the prescreen survivors — the
    # exact plan shape PLANS.md §14 documents as load-bearing
    confirmed = pre.join(F.broadcast(bench_grams), "gram", "left_semi")
    return confirmed.groupBy(corpus_id).agg(
        F.countDistinct("gram").alias("n_contaminated_grams")
    )


def contamination_oracle_sql(
    corpus_table: str,
    corpus_id: str,
    corpus_text: str,
    bench_sql: str,
    bench_text: str,
    n: int = 13,
) -> str:
    """DuckDB twin: exact n-gram intersection (brute force — the oracle can
    afford it at sf0.01). ``bench_sql`` is a SELECT producing the benchmark
    rows."""
    from sparkfuse.textops import TOKEN_SPLIT

    def grams() -> str:
        g = " || ' ' || ".join(f"ts[i+{j}]" for j in range(n))
        return f"list_distinct([{g} for i in range(1, len(ts) - {n - 2})])"

    return f"""
WITH bench AS ({bench_sql}),
bg AS (
  SELECT DISTINCT unnest(gs) AS gram FROM (
    SELECT {grams()} AS gs FROM (
      SELECT string_split_regex(trim({bench_text}), '{TOKEN_SPLIT}') AS ts
      FROM bench WHERE len(string_split_regex(trim({bench_text}), '{TOKEN_SPLIT}')) >= {n}
    ) _
  ) _
),
cg AS (
  SELECT {corpus_id}, unnest(gs) AS gram FROM (
    SELECT {corpus_id}, {grams()} AS gs FROM (
      SELECT {corpus_id},
             string_split_regex(trim({corpus_text}), '{TOKEN_SPLIT}') AS ts
      FROM {corpus_table}
      WHERE len(string_split_regex(trim({corpus_text}), '{TOKEN_SPLIT}')) >= {n}
    ) _
  ) _
)
SELECT {corpus_id}, COUNT(DISTINCT cg.gram) AS n_contaminated_grams
FROM (SELECT DISTINCT * FROM cg) cg JOIN bg USING (gram)
GROUP BY {corpus_id}
"""
