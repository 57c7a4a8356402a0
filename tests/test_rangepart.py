"""Sketch-driven range partitioning: balance, disjoint ordered ranges,
exact placement, null handling, sketch reuse."""

import pytest
from pyspark.sql import functions as F

from sparkfuse.kll import KllParams, build_kll
from sparkfuse.rangepart import range_bounds_from_sketch, range_repartition_by_sketch

N = 60_000
P = 16


@pytest.fixture(scope="module")
def skewed(spark):
    """Deterministic right-skewed values (squared hashes) + some nulls."""
    df = (
        spark.range(N)
        .select(
            F.col("id"),
            F.when(
                F.col("id") % 97 != 0,
                F.pow(F.pmod(F.xxhash64("id"), F.lit(10_000)) / 100.0, F.lit(2.0)),
            ).alias("value"),
        )
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


def _partition_stats(out):
    return (
        out.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.sum(F.col("value").isNull().cast("int")).alias("n_null"),
        )
        .collect()
    )


def test_balanced_disjoint_ordered(spark, skewed):
    out = range_repartition_by_sketch(skewed, "value", P, spark)
    assert out.count() == N  # rows preserved
    stats = sorted((r["_pid"], r) for r in _partition_stats(out))
    pids = [p for p, _ in stats]
    assert pids == list(range(P))  # exact placement: every bucket landed
    sizes = [r["n"] for _, r in stats]
    assert max(sizes) <= 1.5 * (N / P), sizes  # balanced despite skew
    # ranges disjoint and ordered by partition id (nulls sit in pid 0)
    for (pa, ra), (pb, rb) in zip(stats, stats[1:]):
        if ra["hi"] is not None and rb["lo"] is not None:
            assert ra["hi"] <= rb["lo"], (pa, pb, ra["hi"], rb["lo"])
    assert sum(r["n_null"] for _, r in stats) == skewed.filter(
        F.col("value").isNull()
    ).count()
    assert stats[0][1]["n_null"] > 0  # nulls first
    assert all(r["n_null"] == 0 for _, r in stats[1:])


def test_sort_within_gives_global_range_sort(spark, skewed):
    out = range_repartition_by_sketch(
        skewed.filter(F.col("value").isNotNull()), "value", 8, spark, sort_within=True
    )
    import numpy as np

    vals = np.array([r["value"] for r in out.collect()])
    # collect() concatenates partitions in pid order; within-partition
    # sorted + disjoint ordered ranges == globally sorted
    assert bool((np.diff(vals) >= 0).all())


def test_prebuilt_sketch_reused_and_bounds_dedup(spark, skewed):
    sk = build_kll(
        skewed.select(F.col("value").alias("value")), params=KllParams(k=256)
    )
    bounds = range_bounds_from_sketch(sk, P)
    assert bounds == sorted(bounds) and len(set(bounds)) == len(bounds)
    out = range_repartition_by_sketch(skewed, "value", P, spark, sketch=sk)
    assert out.count() == N
    # constant column: all boundaries collapse -> single partition, no crash
    const = spark.range(1000).select(F.lit(7.0).alias("value"))
    sk_const = build_kll(const)
    assert range_bounds_from_sketch(sk_const, 8) == []
    out_const = range_repartition_by_sketch(const, "value", 8, spark, sketch=sk_const)
    assert out_const.rdd.getNumPartitions() == 1
    assert out_const.count() == 1000


def test_stream_maintained_sketch_drives_partitioning(spark, tmp_path):
    """The full at-scale loop: a KLL maintained incrementally from a stream
    (epoch-appended sketch sink) is merged and reused as the range
    partitioner's boundary source — no sampling pass, boundaries from the
    persisted artifact."""
    from sparkfuse.kll import KllParams
    from sparkfuse.sketchsink import (
        SketchSpec,
        merge_sketch_states,
        stream_sketch_states,
    )

    base = str(tmp_path)
    src, sink, ck = f"{base}/src", f"{base}/sink", f"{base}/ck"
    specs = [SketchSpec("v_kll", "kll", "value", KllParams(k=256))]
    full = spark.range(40_000).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id"), F.lit(10_000)) / 10.0).alias("value"),
    )

    def run_once():
        stream = spark.readStream.schema("id long, value double").parquet(
            f"{src}/batch_*"
        )
        q = stream_sketch_states(stream, sink, ck, specs, 3, "id")
        q.awaitTermination()

    full.filter(F.col("id") < 20_000).write.parquet(f"{src}/batch_a")
    run_once()
    full.filter(F.col("id") >= 20_000).write.parquet(f"{src}/batch_b")
    run_once()

    sketch = merge_sketch_states(spark.read.parquet(sink), specs)["v_kll"]
    assert sketch.n == 40_000
    out = range_repartition_by_sketch(full, "value", 8, spark, sketch=sketch)
    stats = _partition_stats(out)
    sizes = [r["n"] for r in stats]
    assert sum(sizes) == 40_000
    assert max(sizes) <= 1.5 * (40_000 / 8)
