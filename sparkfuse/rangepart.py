"""Sketch-driven balanced range partitioning.

``repartitionByRange`` pays a SAMPLING job over the full input every time
it runs (the same cost the routed-sink probe eliminated in PLANS.md §17).
But the quantiles it is sampling for are exactly what a mergeable KLL
sketch already knows — and the sketch sink (sparkfuse.sketchsink) makes
that knowledge a persisted, resumable, incrementally-maintained artifact.
So at scale the play is: maintain ONE KLL per hot sort column (batch build
or streaming epoch appends), and every range-write / sorted-export /
range-join prep reuses it for boundaries — zero sampling passes, boundaries
consistent across queries of the same table (a property sampling cannot
give), and rank error bounded by the sketch's published guarantee.

Placement uses the inverse-hash routing tags (probe._partition_tags): each
bucket lands EXACTLY in its own partition — partition id == bucket id —
rather than hash-scattering bucket ids (~1/e empty partitions) or paying
range-sampling again.

NULL and NaN sort-values land in bucket 0 (Spark's NULLS FIRST
convention; NaN is grouped with them for partitioning purposes — documented
divergence from sort order, where Spark puts NaN last).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfuse.kll import KLL, KllParams, build_kll
from sparkfuse.probe import _partition_tags


def range_bounds_from_sketch(sketch: KLL, num_partitions: int) -> list[float]:
    """num_partitions-1 ascending, deduplicated boundary values at the
    sketch's 1/p..(p-1)/p quantiles. Heavy ties collapse boundaries, so
    fewer (still-balanced-as-possible) buckets can result."""
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    if sketch.n == 0:
        # empty sketch (empty input / all-null column): quantiles are NaN
        # and min/max are +/-inf, so no boundary can split anything
        return []
    qs = [i / num_partitions for i in range(1, num_partitions)]
    bounds: list[float] = []
    for q in qs:
        b = float(sketch.quantile(q))
        # a boundary only splits when min <= b < max (bucket = values > b):
        # b >= max leaves an empty top bucket, b < min an empty bottom one;
        # non-finite b (shouldn't occur on a populated sketch) never splits
        if not math.isfinite(b) or b >= sketch.max or b < sketch.min:
            continue
        if not bounds or b > bounds[-1]:
            bounds.append(b)
    return bounds


def range_repartition_by_sketch(
    df: DataFrame,
    col: str,
    num_partitions: int,
    spark: SparkSession,
    sketch: KLL | None = None,
    params: KllParams | None = None,
    sort_within: bool = False,
) -> DataFrame:
    """Balanced range repartition on ``col`` with sketch-derived boundaries.

    Pass ``sketch=`` (e.g. merged from a persisted sketch sink) to skip
    even the single build pass; otherwise one KLL build runs (partial per
    partition → tree merge, KB states only — still cheaper than
    repartitionByRange's sampling job, and the sketch is reusable).

    Output partition i holds exactly value-range bucket i (exact tag
    placement), so per-partition (min, max) ranges are disjoint and
    ordered by partition id; ``sort_within=True`` additionally sorts
    inside partitions, yielding globally range-sorted output — the
    repartitionByRange + sortWithinPartitions shape without the sampling.
    """
    if "_sf_tag" in df.columns:
        raise ValueError("input already has a '_sf_tag' column (reserved)")
    if sketch is None:
        sketch = build_kll(
            df.select(F.col(col).cast("double").alias("value")),
            params=params or KllParams(),
        )
    bounds = range_bounds_from_sketch(sketch, num_partitions)
    parts = len(bounds) + 1
    v = F.col(col).cast("double")
    if bounds:
        barr = F.array(*[F.lit(b).cast("double") for b in bounds])
        # bucket = number of boundaries strictly below the value; NULL/NaN
        # => bucket 0 (NULLS FIRST convention, NaN grouped with them)
        bucket = (
            F.when(
                v.isNull() | F.isnan(v), F.lit(0)
            ).otherwise(F.size(F.filter(barr, lambda b: b < v)))
        ).cast("int")
    else:
        bucket = F.lit(0).cast("int")
    tags = _partition_tags(spark, parts)
    tag_arr = F.array(*[F.lit(t).cast("long") for t in tags])
    out = (
        df.withColumn("_sf_tag", F.element_at(tag_arr, bucket + 1))
        .repartition(parts, "_sf_tag")
        .drop("_sf_tag")
    )
    if sort_within:
        out = out.sortWithinPartitions(col)
    return out
