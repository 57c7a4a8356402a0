"""Membership queries (SURVEY.md §2.3, P1-P3 Spark surface).

Three probe modes over a built Forest:

* ``approx_contains`` — boolean column from a broadcast filter (zero false
  negatives, bounded false positives). The pandas UDF gathers against the
  broadcast forest in numpy; Arrow batches in, boolean batches out.
* ``exact_member_semi_join`` — fuse-prescreen THEN exact-confirm semi-join.
  At 100 TB this is the point of the whole library: the prescreen removes
  ~all non-members *before* the shuffle, so the exact join moves only
  (true members + ~0.4% FPs) instead of the full probe table.
* ``exact_anti_join`` — complement (definitely-absent prescreen + anti-join),
  mirroring the reference's ground-truth validation direction (north_star:
  "verified against exact anti-join ground truth on a sample").
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from sparkfuse.forest import Forest


def approx_contains_udf(forest: Forest, spark=None):
    """Vectorized membership UDF over the broadcast forest.

    Uses an explicit SparkContext broadcast so a multi-MB forest ships once
    per executor, not once per task closure.
    """
    if spark is not None:
        bc = spark.sparkContext.broadcast(forest)

        @F.pandas_udf(BooleanType())
        def probe(keys: pd.Series) -> pd.Series:
            return pd.Series(bc.value.contains_np(keys.to_numpy()))

    else:

        @F.pandas_udf(BooleanType())
        def probe(keys: pd.Series) -> pd.Series:
            return pd.Series(forest.contains_np(keys.to_numpy()))

    # The probe IS deterministic, but marking it so lets Catalyst's
    # InferFiltersFromConstraints copy the predicate through the
    # exact-confirm equi-join onto the BUILD side — a wasted full Arrow pass
    # over the true key set (every member passes by the zero-FN invariant).
    # asNondeterministic() pins the filter to the probe side where it was
    # written. (Verified via .explain: see PLANS.md.)
    return probe.asNondeterministic()


def approx_contains(
    df: DataFrame, key: str | Column, forest: Forest, spark=None, out: str = "maybe_member"
) -> DataFrame:
    col = F.col(key) if isinstance(key, str) else key
    return df.withColumn(out, approx_contains_udf(forest, spark)(col))


def exact_member_semi_join(
    probe_df: DataFrame,
    probe_key: str,
    build_df: DataFrame,
    build_key: str,
    forest: Forest,
    spark=None,
) -> DataFrame:
    """Exact membership: prescreen with the filter, then left-semi confirm.

    Zero false negatives ⇒ the prescreen never drops a true member; the semi
    join removes the ~fpp false positives ⇒ result is exact (equals a plain
    semi join, so a plain SQL ``IN`` subquery is a valid oracle). The join
    side only ever sees prescreen survivors — that is the shuffle saving.
    """
    pre = probe_df.filter(approx_contains_udf(forest, spark)(F.col(probe_key)))
    build_keys = build_df.select(F.col(build_key).alias(probe_key)).dropDuplicates()
    return pre.join(build_keys, on=probe_key, how="left_semi")


def exact_anti_join(
    probe_df: DataFrame,
    probe_key: str,
    build_df: DataFrame,
    build_key: str,
    forest: Forest,
    spark=None,
) -> DataFrame:
    """Exact non-membership: filter-negative rows are definitely absent
    (zero false negatives ⇒ filter-negative cannot be a member); only the
    maybe-positive sliver needs the anti-join shuffle."""
    probe_col = F.col(probe_key)
    flagged = probe_df.withColumn("_maybe", approx_contains_udf(forest, spark)(probe_col))
    definite = flagged.filter(~F.col("_maybe")).drop("_maybe")
    maybes = flagged.filter(F.col("_maybe")).drop("_maybe")
    build_keys = build_df.select(F.col(build_key).alias(probe_key)).dropDuplicates()
    confirmed_absent = maybes.join(build_keys, on=probe_key, how="left_anti")
    return definite.unionByName(confirmed_absent)


def verify_sample(
    probe_df: DataFrame,
    probe_key: str,
    build_df: DataFrame,
    build_key: str,
    forest: Forest,
    spark=None,
    fraction: float = 0.1,
    seed: int = 42,
) -> dict:
    """Ground-truth audit on a sample: compares the approx filter verdicts
    against an exact anti-join, returns {n, false_negatives, false_positives,
    fpp}. false_negatives MUST be 0 (the hard invariant)."""
    sample = probe_df.select(F.col(probe_key).alias("key")).sample(fraction, seed=seed)
    flagged = approx_contains(sample, "key", forest, spark, out="maybe")
    build_keys = build_df.select(F.col(build_key).alias("key")).dropDuplicates()
    truth = flagged.join(build_keys.withColumn("is_member", F.lit(True)), on="key", how="left")
    agg = truth.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("is_member") & ~F.col("maybe"), 1).otherwise(0)).alias("false_negatives"),
        F.sum(F.when(F.col("maybe") & F.col("is_member").isNull(), 1).otherwise(0)).alias("false_positives"),
        F.sum(F.when(F.col("is_member").isNull(), 1).otherwise(0)).alias("true_negatives_total"),
    ).first()
    n_neg = agg["true_negatives_total"]
    return {
        "n": agg["n"],
        "false_negatives": agg["false_negatives"] or 0,
        "false_positives": agg["false_positives"] or 0,
        "fpp": (agg["false_positives"] or 0) / n_neg if n_neg else 0.0,
    }
