"""Adjudicate probe_10m_arrow (round-4 verdict, Next #3): at the bench shape
the mapInArrow probe measures ~2.8x SLOWER than the pandas_udf probe whose
docstring claims it beats. This script isolates where the time goes:

  pandas    — approx_contains_udf filter (the current fast path)
  arrow     — approx_contains_arrow as shipped
  arrow_net — mapInArrow that yields a constant column WITHOUT running the
              kernel (pure channel cost: batch decode + rebuild + transfer)
  arrow_nokernel_passthrough — yields the input batch unchanged (channel
              cost without RecordBatch reconstruction)
  pandas_net — pandas_udf returning a constant (channel cost of the
              ArrowEvalPython path)

Run on an idle machine: min of 4 after 1 warm-up, local[32], same session
configs as bench.py.
"""

import sys
import time

import numpy as np
import pyarrow as pa
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

sys.path.insert(0, "/root/repo")

from sparkfuse.forest import Forest, build_forest
from sparkfuse.keys import extract_keys
from sparkfuse.probe import approx_contains_arrow, approx_contains_udf
from sparkfuse.session import get_spark


def timed(fn, repeats=4, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def main():
    spark = get_spark("profile-arrow", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    lineitem = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    keys = extract_keys(lineitem, "l_orderkey", "l_linenumber").cache()
    keys.count()
    forest = Forest.from_df(build_forest(keys, kind="fuse", width=8, min_shards=32))
    keys.unpersist()
    n = 10_000_000
    probes = spark.range(n).select(F.xxhash64("id").alias("key"))
    bc = spark.sparkContext.broadcast(forest)

    rows = {}

    udf = approx_contains_udf(forest, spark)
    rows["pandas"] = timed(lambda: probes.filter(udf(F.col("key"))).count())

    rows["arrow"] = timed(
        lambda: approx_contains_arrow(probes, "key", forest, spark, out="m")
        .filter(F.col("m"))
        .count()
    )

    out_schema = StructType(
        list(probes.schema.fields) + [StructField("m", BooleanType(), False)]
    )

    def net_batches(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + [pa.array(np.ones(batch.num_rows, dtype=bool))],
                names=["key", "m"],
            )

    rows["arrow_net"] = timed(
        lambda: probes.mapInArrow(net_batches, out_schema).filter(F.col("m")).count()
    )

    def passthrough(batches):
        for batch in batches:
            yield batch

    rows["arrow_passthrough"] = timed(
        lambda: probes.mapInArrow(passthrough, probes.schema).count()
    )

    def kernel_only(batches):
        f = bc.value
        for batch in batches:
            arr = batch.column(0).to_numpy(zero_copy_only=False)
            verdict = f.contains_np(arr)
            yield pa.RecordBatch.from_arrays([pa.array(verdict)], names=["m"])

    rows["arrow_kernel_boolonly"] = timed(
        lambda: probes.mapInArrow(
            kernel_only, StructType([StructField("m", BooleanType(), False)])
        )
        .filter(F.col("m"))
        .count()
    )

    import pandas as pd

    @F.pandas_udf(BooleanType())
    def const_udf(keys: pd.Series) -> pd.Series:
        return pd.Series(np.ones(len(keys), dtype=bool))

    cu = const_udf.asNondeterministic()
    rows["pandas_net"] = timed(lambda: probes.filter(cu(F.col("key"))).count())

    for name, (mn, med) in rows.items():
        print(f"{name:28s} min {mn:6.3f}  med {med:6.3f}  ({n/mn/1e6:6.1f} Mkeys/s)")
    spark.stop()


if __name__ == "__main__":
    main()
