"""After the cogroup row runs, routedsink jumps 1.6 -> 2.9 s permanently.
Which piece absorbs the extra second? Run the decomposed pieces AFTER
poisoning with the cogroup row."""

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow as pa
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

from sparkfuse.forest import build_forest, write_forest
from sparkfuse.probe import (
    _tag_route,
    approx_contains_routed,
    approx_contains_routed_sink,
    forest_payload_bytes,
)
from sparkfuse.session import get_spark


def timed(fn, repeats=3, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return [round(t, 3) for t in ts]


def main():
    spark = get_spark("profile-rsink-poison", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    big_keys = spark.range(12_000_000).select(F.xxhash64(F.col("id") + 7).alias("key"))
    big_forest = build_forest(big_keys, shard_bits=5).cache()
    forest_payload_bytes(big_forest)
    n = 10_000_000
    probes = spark.range(n).select(F.xxhash64("id").alias("key"))
    tagged = probes.withColumn(
        "_sf_shard", F.shiftrightunsigned(F.xxhash64("key"), 64 - 5)
    )
    out_schema = StructType(
        list(probes.schema.fields) + [StructField("m", BooleanType(), False)]
    )

    def const_batches(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(np.ones(batch.num_rows, dtype=bool))],
                names=["key", "m"],
            )

    def shuffle_only():
        return _tag_route(tagged, spark, 5).count()

    def channel_only():
        return (
            _tag_route(tagged, spark, 5)
            .mapInArrow(const_batches, out_schema)
            .filter(F.col("m"))
            .count()
        )

    with tempfile.TemporaryDirectory() as td:
        sink = os.path.join(td, "big_forest")
        write_forest(big_forest, sink, mode="overwrite", cluster_by_shard=True)

        def rsink():
            return (
                approx_contains_routed_sink(probes, "key", sink, spark)
                .filter(F.col("maybe_member"))
                .count()
            )

        print("pre_shuffle_only ", timed(shuffle_only))
        print("pre_channel_only ", timed(channel_only))
        print("pre_routedsink   ", timed(rsink))
        print(
            "cogroup_poison   ",
            timed(
                lambda: approx_contains_routed(probes, "key", big_forest)
                .filter(F.col("maybe_member"))
                .count(),
                repeats=4,
            ),
        )
        print("post_shuffle_only", timed(shuffle_only))
        print("post_channel_only", timed(channel_only))
        print("post_routedsink  ", timed(rsink))
    big_forest.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
