"""Replicate bench.py's exact routed/hybrid/routedsink row order to find why
probe_routedsink_10m stays ~2.7 s in bench.py while an isolated profile of
the same fresh-plan call measures ~1.35 s."""

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sparkfuse.forest import build_forest, write_forest
from sparkfuse.probe import (
    approx_contains_routed,
    approx_contains_routed_sink,
    approx_contains_sink,
    forest_payload_bytes,
)
from sparkfuse.session import get_spark


def timed(fn, repeats, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return [round(t, 3) for t in ts]


def main():
    spark = get_spark("profile-rsink-benchorder", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    big_keys = spark.range(12_000_000).select(F.xxhash64(F.col("id") + 7).alias("key"))
    big_forest = build_forest(big_keys, shard_bits=5).cache()
    nbytes = forest_payload_bytes(big_forest)
    n = 10_000_000
    routed_probes = spark.range(n).select(F.xxhash64("id").alias("key"))
    print(
        "routed  ",
        timed(
            lambda: approx_contains_routed(routed_probes, "key", big_forest)
            .filter(F.col("maybe_member"))
            .count(),
            repeats=4,
        ),
    )
    with tempfile.TemporaryDirectory() as td:
        sink = os.path.join(td, "big_forest")
        write_forest(big_forest, sink, mode="overwrite", cluster_by_shard=True)
        print(
            "hybrid  ",
            timed(
                lambda: approx_contains_sink(routed_probes, "key", sink)
                .filter(F.col("maybe_member"))
                .count(),
                repeats=3,
            ),
        )
        print(
            "routedsink",
            timed(
                lambda: approx_contains_routed_sink(routed_probes, "key", sink, spark)
                .filter(F.col("maybe_member"))
                .count(),
                repeats=4,
            ),
        )
    big_forest.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
