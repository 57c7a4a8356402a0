"""Reproduce the bench.py row order up to probe_10m_arrow to find why the
arrow row is ~2.4x slower INSIDE the bench session but at parity in an
isolated session (tools/profile_arrow.py)."""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sparkfuse.forest import Forest, build_forest
from sparkfuse.keys import extract_keys
from sparkfuse.probe import approx_contains_arrow, approx_contains_udf
from sparkfuse.session import get_spark


def timed(fn, repeats=2, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def main():
    spark = get_spark("profile-arrow-benchorder", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    from sparkfuse.textops import simhash_near_dups

    warm = spark.range(100_000).select(F.xxhash64("id").alias("key"))
    Forest.from_df(build_forest(warm, shard_bits=1))
    warm_docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("warm up tokens number "), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    simhash_near_dups(warm_docs, "doc_id", "text", max_hamming=6).count()

    lineitem = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    keys = extract_keys(lineitem, "l_orderkey", "l_linenumber").cache()
    keys.count()

    forest = None

    def build():
        nonlocal forest
        forest = Forest.from_df(
            build_forest(keys, kind="fuse", width=8, min_shards=32)
        )

    print("build_fuse8", timed(build))
    print(
        "build_xor8",
        timed(
            lambda: Forest.from_df(
                build_forest(keys, kind="xor", width=8, min_shards=32)
            )
        ),
    )

    n = 10_000_000
    probes = spark.range(n).select(F.xxhash64("id").alias("key"))
    udf = approx_contains_udf(forest, spark)
    print("pandas", timed(lambda: probes.filter(udf(F.col("key"))).count()))
    print(
        "arrow",
        timed(
            lambda: approx_contains_arrow(probes, "key", forest, spark, out="m")
            .filter(F.col("m"))
            .count()
        ),
    )
    # and again, to see if the arrow row recovers on a second block
    print("pandas2", timed(lambda: probes.filter(udf(F.col("key"))).count()))
    print(
        "arrow2",
        timed(
            lambda: approx_contains_arrow(probes, "key", forest, spark, out="m")
            .filter(F.col("m"))
            .count()
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
