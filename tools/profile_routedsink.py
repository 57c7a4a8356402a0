"""Reconcile PLANS.md §17 vs the official bench record (round-4 verdict,
Next #4): routed-sink records ~2.7 s through bench.py while the cogroup
routed path records ~1.4 s at the same 13 MB/10M shape, but the §17 ad-hoc
same-run measurement claimed parity (1.48 vs 1.52). Decompose:

  shuffle_only    — the _tag_route shuffle + count, no probe
  channel_only    — tag-route + mapInArrow constant verdict (no sink reads)
  routedsink_fresh— new plan per repeat, exactly what bench.py times
  routedsink_reuse— ONE DataFrame counted repeatedly (one plan_token =
                    memoized sink listings + warm worker caches) — the
                    suspected shape of the §17 ad-hoc measurement
  routed_cogroup  — the comparison row
"""

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


def timed(fn, repeats=4, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return [round(t, 3) for t in ts]


def main():
    spark = get_spark("profile-routedsink", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    big_keys = spark.range(12_000_000).select(F.xxhash64(F.col("id") + 7).alias("key"))
    big_forest = build_forest(big_keys, shard_bits=5).cache()
    print("forest MB", forest_payload_bytes(big_forest) / 1e6)
    n = 10_000_000
    probes = spark.range(n).select(F.xxhash64("id").alias("key"))

    with tempfile.TemporaryDirectory() as td:
        sink = os.path.join(td, "forest")
        write_forest(big_forest, sink, mode="overwrite", cluster_by_shard=True)

        tagged = probes.withColumn(
            "_sf_shard", F.shiftrightunsigned(F.xxhash64("key"), 64 - 5)
        )
        print(
            "shuffle_only   ",
            timed(lambda: _tag_route(tagged, spark, 5).count()),
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

        print(
            "channel_only   ",
            timed(
                lambda: _tag_route(tagged, spark, 5)
                .mapInArrow(const_batches, out_schema)
                .filter(F.col("m"))
                .count()
            ),
        )

        print(
            "routedsink_fresh",
            timed(
                lambda: approx_contains_routed_sink(probes, "key", sink, spark)
                .filter(F.col("maybe_member"))
                .count()
            ),
        )

        reused = approx_contains_routed_sink(probes, "key", sink, spark).filter(
            F.col("maybe_member")
        )
        print("routedsink_reuse", timed(lambda: reused.count()))

        print(
            "routed_cogroup ",
            timed(
                lambda: approx_contains_routed(probes, "key", big_forest)
                .filter(F.col("maybe_member"))
                .count()
            ),
        )
    spark.stop()


if __name__ == "__main__":
    main()
