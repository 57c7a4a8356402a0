"""Bucketed co-located joins: persist the key corpus bucketed by key so
repeated exact-membership confirms never shuffle the corpus again.

Why this exists (the 100-TB story): ``exact_member_semi_join`` /
``exact_member_routed`` confirm prescreen survivors against the TRUE key
corpus with an equi-join. Ad hoc, that join shuffles (and sorts) the corpus
side on every query — at 10^12 keys that is the dominant repeated cost, paid
identically each time because the corpus barely changes between queries.
Writing the corpus ONCE with ``bucketBy(key)`` + ``sortBy(key)`` moves that
shuffle+sort to write time: every later join against it satisfies the
hash-clustered distribution straight off the scan, so Catalyst's
EnsureRequirements inserts NO Exchange (and no Sort) on the corpus side —
ever again. Probe sides:

  * probe ALSO bucketed (same key, same bucket count) → ZERO exchanges in
    the join: fully co-located, the 10^12-row join runs shuffle-free;
  * probe ad hoc → exactly ONE exchange, of the (small, post-prescreen)
    probe side, hashed to the corpus's bucket layout.

This is Spark-native bucketing (DataFrameWriter.bucketBy + the session
catalog), not a custom mechanism — the library's value-add is the
membership-workflow packaging plus the plan-shape guarantees pinned by
tests (tests/test_bucketing.py asserts the exchange counts above on the
executed plans).

Scale notes: pick ``n_buckets`` so one bucket's keys fit a task comfortably
(e.g. 10^12 keys / 2^13 buckets ≈ 10^8 keys ≈ 1.6 GB of raw u64 per bucket
— split finer for wide rows). Bucket pruning applies on equality filters
against the bucket column; AQE cannot coalesce bucketed scan partitions, so
do not over-bucket small corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_keys(
    df: DataFrame,
    key: str,
    table: str,
    path: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> str:
    """Persist ``df`` as an EXTERNAL parquet table bucketed (and by default
    sorted) by ``key``. Returns the table name, queryable via
    ``spark.table(table)``.

    Buckets are Spark's Murmur3-hash-mod layout, recorded in the catalog —
    the one piece plain ``.parquet(path)`` files cannot carry, and the
    reason joins against this table skip their Exchange. ``sort=True`` also
    pre-sorts within buckets so sort-merge joins skip their Sort.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    # cluster by the bucket expression BEFORE the bucketed write: Spark's
    # bucketed writer emits one file per (task, bucket) pair, so an
    # unclustered P-partition input writes up to P x n_buckets small files
    # (millions at the docstring's 10^12-key sizing). Pre-hashing each
    # bucket's rows into one task makes it one file per bucket.
    clustered = df.repartition(n_buckets, F.col(key))
    writer = (
        clustered.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)
    return table


def append_bucketed_keys(
    df: DataFrame, key: str, table: str, n_buckets: int, sort: bool = True
) -> str:
    """Append new keys to an existing bucketed corpus WITHOUT rewriting it —
    the maintenance path for a corpus that grows by deltas. New files land
    in the same bucket layout (Spark validates the spec against the catalog
    and fails loudly on a mismatched ``n_buckets``/key), so every
    exchange-free join guarantee survives the append. Dedup across
    old-vs-new is the caller's concern (a semi-join of the delta against
    the table — itself exchange-free on the corpus side — filters
    already-present keys first)."""
    spark = df.sparkSession
    # tableExists handles qualified names (db.tbl) and other databases;
    # listTables() only returned bare names from the CURRENT database
    # (round-5 review: qualified appends were wrongly rejected)
    if not spark.catalog.tableExists(table):
        raise ValueError(
            f"table {table!r} does not exist — write it first with "
            "write_bucketed_keys"
        )
    clustered = df.repartition(n_buckets, F.col(key))
    writer = (
        clustered.write.format("parquet").mode("append").bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)
    return table


def bucketed_semi_join(
    spark: SparkSession, probe_df: DataFrame, probe_key: str, corpus_table: str
) -> DataFrame:
    """Exact membership of ``probe_df`` rows in the bucketed corpus — the
    confirm-join shape with the corpus side guaranteed exchange-free.

    The semi-join is forced to the merge path (hint) rather than left to the
    broadcast planner: the whole point of the bucketed corpus is the case
    where it does NOT fit a broadcast. If ``probe_df`` is itself a scan of a
    table bucketed on the same key with the same bucket count, the join
    plans with zero exchanges.
    """
    corpus = spark.table(corpus_table)
    if probe_key not in corpus.columns:
        # a typo'd key must raise, not silently join against some other
        # column (wrong membership AND a regained corpus-side Exchange)
        raise ValueError(
            f"column {probe_key!r} not in bucketed corpus {corpus_table!r} "
            f"(has {corpus.columns}); the probe key must be the corpus's "
            "bucket column"
        )
    return probe_df.join(
        corpus.select(probe_key).hint("merge"),
        on=probe_key,
        how="left_semi",
    )


def exact_member_bucketed(
    probe_df: DataFrame,
    probe_key: str,
    corpus_table: str,
    forest,
    spark: SparkSession,
) -> DataFrame:
    """Exact membership with the bucketed corpus as the confirm side — the
    packaged form of prescreen → bucketed confirm (the composition
    ``exact_member_semi_join`` runs against a DataFrame corpus, minus its
    per-query corpus shuffle):

      1. fuse prescreen (zero FN ⇒ nothing true is lost) keeps
         (members + ~fpp) probe rows;
      2. ``bucketed_semi_join`` confirms survivors against the corpus with
         NO corpus-side exchange (the corpus shuffled once, at write time).

    ``forest`` is a ``sparkfuse.forest.Forest`` built over the same key.
    Plan: one probe-side exchange total, nothing else.
    """
    from sparkfuse.probe import approx_contains_udf

    pre = probe_df.filter(approx_contains_udf(forest, spark)(F.col(probe_key)))
    return bucketed_semi_join(spark, pre, probe_key, corpus_table)


def exchange_count(df: DataFrame) -> int:
    """Number of SHUFFLE Exchanges in the (initial) physical plan — the
    plan-shape metric the bucketing guarantees are stated in. Broadcast
    exchanges are excluded (they move a small side, not a shuffle) and
    reused exchanges are not double-counted; AQE's re-planning can only
    remove exchanges, so this is an upper bound on what executes."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "ReusedExchange" not in line
        and "BroadcastExchange" not in line
    )
