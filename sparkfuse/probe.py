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
* ``approx_contains_routed`` / ``exact_member_routed`` — the big-forest path:
  probes are routed to their shard's filter with a cogrouped shard join
  against the forest TABLE, so no payload ever touches the driver and no
  monolithic broadcast is built. A 10^11-key forest (~130 GB of fuse8
  payload) is un-broadcastable; this path shuffles only 8-byte probe keys by
  shard and ships each shard's payload once to wherever its probe partition
  lands. The capability analog is the reference's 5×10^7-key Contains
  benchmarks (/root/reference/binaryfusefilter_test.go:300-331) — scaled out.
* ``probe_forest`` — the planner: picks broadcast vs routed by comparing the
  forest's total payload bytes against a threshold (default: the session's
  ``spark.sql.autoBroadcastJoinThreshold``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

from sparkfuse.forest import Forest, _probe_one
from sparkfuse.hashing import to_u64
from sparkfuse.keys import shard_column
from sparkfuse.serialize import load_fuse_bytes, load_xor_bytes


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


def approx_contains_arrow(
    df: DataFrame, key: str, forest: Forest, spark, out: str = "maybe_member"
) -> DataFrame:
    """Membership column via ``mapInArrow`` — skips the pandas Series wrap
    the pandas_udf pays (measured +36%: 24.0 vs 17.7 Mkeys/s on a 40M-key
    keys-only probe, local[32]).

    Tradeoff vs ``approx_contains``: mapInArrow ships EVERY column of ``df``
    through the Arrow channel, while the pandas_udf column ships only the
    key series. Use this for narrow (ideally keys-only) probe frames — the
    prescreen hot path; use the UDF column form for wide rows.
    """
    import pyarrow as pa

    if out in df.columns:
        raise ValueError(f"output column {out!r} already exists")
    bc = spark.sparkContext.broadcast(forest)
    names = list(df.columns) + [out]
    key_idx = df.columns.index(key)

    def probe_batches(batches):
        f = bc.value
        for batch in batches:
            arr = batch.column(key_idx).to_numpy(zero_copy_only=False)
            verdict = f.contains_np(arr)
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + [pa.array(verdict)], names=names
            )

    out_schema = StructType(
        list(df.schema.fields) + [StructField(out, BooleanType(), False)]
    )
    return df.mapInArrow(probe_batches, out_schema)


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


def _forest_meta(forest_df: DataFrame) -> dict:
    """Read the forest's (tiny) layout metadata — NOT the payloads.

    One row per distinct layout; a valid forest has exactly one.
    """
    rows = (
        forest_df.select("kind", "width", "arity", "shard_bits", "route")
        .dropDuplicates()
        .collect()
    )
    if len(rows) != 1:
        raise ValueError(f"inhomogeneous forest: {rows}")
    return rows[0].asDict()


def approx_contains_routed(
    probe_df: DataFrame,
    key: str,
    forest_df: DataFrame,
    out: str = "maybe_member",
) -> DataFrame:
    """Membership column via a shard-routed cogroup join against the forest
    table — the probe path for forests too big to broadcast.

    Plan: probe rows get their shard id JVM-side (same xxh64-top-bits rule as
    the build, ``keys.shard_column``), then cogroup with the forest table on
    shard: each task receives (probe rows of one shard, that shard's single
    filter row) and runs the vectorized numpy Contains kernel. The driver
    never sees a payload; each shard payload crosses the wire once per probe
    partition it meets, and probe rows shuffle once by shard.

    Routing is bit-identical to ``Forest.contains_np`` (broadcast path) —
    tested equal in tests/test_forest_spark.py. Shards absent from the forest
    (e.g. a partial build) probe as False, matching the broadcast path.

    The per-shard kernel runs through cogrouped ``applyInArrow`` (no pandas
    conversion; measured +24% over applyInPandas at 10M keys vs a 13 MB
    forest). For wide probe rows prefer ``exact_member_routed`` which routes
    only the 8-byte key column through the shard shuffle.
    """
    import pyarrow as pa

    meta = _forest_meta(forest_df)
    kind, width, arity = meta["kind"], meta["width"], meta["arity"]
    shard_bits, route = meta["shard_bits"], meta["route"]

    cols = list(probe_df.columns)
    if out in cols:
        raise ValueError(f"output column {out!r} already exists")
    if "_sf_shard" in cols:
        raise ValueError("probe_df already has a '_sf_shard' column (reserved)")
    out_schema = StructType(
        list(probe_df.schema.fields) + [StructField(out, BooleanType(), False)]
    )

    def probe_shard(probe_tbl: "pa.Table", forest_tbl: "pa.Table") -> "pa.Table":
        keys_np = probe_tbl.column(key).to_numpy(zero_copy_only=False)
        if forest_tbl.num_rows == 0 or len(keys_np) == 0:
            verdict = np.zeros(len(keys_np), dtype=bool)
        else:
            # replayed appends are byte-identical (deterministic builds);
            # different payloads for one shard mean a mixed/corrupted sink,
            # where picking one filter would yield false negatives — fail
            payloads = {bytes(p.as_py()) for p in forest_tbl.column("payload")}
            if len(payloads) > 1:
                raise ValueError(
                    "conflicting payloads for one shard in the forest table "
                    "(mixed builds, or an epoch-appended sink — read those "
                    "with EpochForest)"
                )
            (payload,) = payloads
            if kind == "fuse":
                filt = load_fuse_bytes(payload, width=width, arity=arity)
            else:
                filt = load_xor_bytes(payload)
            verdict = _probe_one(filt, to_u64(keys_np))
        return pa.table(
            [probe_tbl.column(c) for c in cols] + [pa.array(verdict)],
            names=cols + [out],
        )

    tagged = probe_df.withColumn("_sf_shard", shard_column(key, shard_bits, route))
    forest_keyed = forest_df.select(
        F.col("shard").alias("_sf_shard"), "payload"
    )
    return (
        tagged.groupBy("_sf_shard")
        .cogroup(forest_keyed.groupBy("_sf_shard"))
        .applyInArrow(probe_shard, out_schema)
    )


def exact_member_routed(
    probe_df: DataFrame,
    probe_key: str,
    build_df: DataFrame,
    build_key: str,
    forest_df: DataFrame,
) -> DataFrame:
    """Exact membership for un-broadcastable forests: routed prescreen on the
    deduped 8-byte KEY column only, exact-confirm survivors against the build
    keys, then semi-join the original probe rows.

    Only key bytes cross the shard shuffle; the survivor set is ~(members +
    fpp·non-members), which AQE typically broadcasts for the final semi-join.
    Result is exact (zero-FN prescreen + exact confirm), so a plain SQL
    ``IN`` subquery is a valid oracle — same contract as
    ``exact_member_semi_join``.
    """
    keys_only = probe_df.select(probe_key).dropDuplicates()
    maybe = (
        approx_contains_routed(keys_only, probe_key, forest_df, out="_maybe")
        .filter(F.col("_maybe"))
        .drop("_maybe")
    )
    build_keys = build_df.select(F.col(build_key).alias(probe_key)).dropDuplicates()
    members = maybe.join(build_keys, on=probe_key, how="left_semi")
    return probe_df.join(members, on=probe_key, how="left_semi")


def forest_payload_bytes(forest_df: DataFrame) -> int:
    """Total serialized payload size — the broadcast-vs-routed planning input
    (an aggregate over the forest table, payloads never leave the executors)."""
    return forest_df.agg(
        F.sum(F.octet_length("payload")).alias("b")
    ).first()["b"] or 0


def probe_forest(
    probe_df: DataFrame,
    key: str,
    forest_df: DataFrame,
    spark: SparkSession | None = None,
    out: str = "maybe_member",
    broadcast_threshold: int | None = None,
) -> DataFrame:
    """Planner: broadcast the forest when its payload fits the broadcast
    budget (probe rows never shuffle), else route probes by shard against the
    forest table (nothing touches the driver).

    Threshold defaults to the session's ``spark.sql.autoBroadcastJoinThreshold``
    (10 MB unless tuned) — the same knob that governs Spark's own
    broadcast-vs-shuffle join choice, reused for the same tradeoff.

    NOTE: planning materializes the forest (one aggregate over payload
    sizes), and the chosen path materializes it again — persist/cache a
    lazily-built ``forest_df`` (or read it from its sink) before calling, or
    the shard builds run twice.
    """
    if broadcast_threshold is None:
        broadcast_threshold = 10 * 1024 * 1024
        if spark is not None:
            raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
            broadcast_threshold = _parse_byte_string(raw)
    if broadcast_threshold >= 0 and forest_payload_bytes(forest_df) <= broadcast_threshold:
        return approx_contains(probe_df, key, Forest.from_df(forest_df), spark, out=out)
    return approx_contains_routed(probe_df, key, forest_df, out=out)


_BYTE_SUFFIXES = {"b": 1, "k": 1024, "m": 1024**2, "g": 1024**3,
                  "t": 1024**4, "p": 1024**5}


def _parse_byte_string(raw: str) -> int:
    """Spark byte-string grammar (JavaUtils.byteStringAsBytes): optional
    b/k/m/g/t/p suffix, case-insensitive; bare numbers are bytes. Raises on
    anything else instead of silently substituting a default."""
    s = str(raw).strip().lower()
    mult = 1
    if s and s[-1] in _BYTE_SUFFIXES:
        mult = _BYTE_SUFFIXES[s[-1]]
        s = s[:-1]
    try:
        return int(s) * mult
    except ValueError:
        raise ValueError(
            f"unparseable byte string {raw!r} for autoBroadcastJoinThreshold"
        ) from None


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
