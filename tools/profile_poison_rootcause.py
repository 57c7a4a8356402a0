"""Localize the mapInArrow worker-poisoning: is the extra time spent in
Python-side batch compute, or waiting on the channel?

Instruments the mapInArrow function to record, per worker process: number
of batches, total Python compute seconds (time spent inside the generator
body), and RSS before/after — written to /tmp/poison_probe/<pid>.json.
Runs the channel-only job clean, then poisons with the cogroup row, then
runs it again and compares.
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow as pa
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

from sparkfuse.forest import build_forest
from sparkfuse.probe import _tag_route, approx_contains_routed, forest_payload_bytes
from sparkfuse.session import get_spark

OUT = "/tmp/poison_probe"


def instrumented(tag):
    def const_batches(batches):
        import io
        import resource

        # local Arrow round-trip micro-bench: 65k-row int64 batch through
        # pa.ipc serialize+deserialize, 5 reps — if THIS is slow in a
        # poisoned worker, the pathology is process-local Arrow state, not
        # the JVM/socket
        arr = pa.array(np.arange(65536, dtype=np.int64))
        mb = pa.RecordBatch.from_arrays([arr], names=["x"])
        t0 = time.perf_counter()
        for _ in range(5):
            sink_buf = io.BytesIO()
            with pa.ipc.new_stream(sink_buf, mb.schema) as w:
                w.write_batch(mb)
            rdr = pa.ipc.open_stream(sink_buf.getvalue())
            for b in rdr:
                b.column(0).to_numpy(zero_copy_only=False).sum()
        local_arrow_s = time.perf_counter() - t0

        t_compute = 0.0
        t_input = 0.0   # blocked in next(it): waiting for the JVM to SEND
        t_yield = 0.0   # blocked after yield: waiting for the JVM to DRAIN
        n = 0
        it = iter(batches)
        t_first = time.perf_counter()
        while True:
            t0 = time.perf_counter()
            try:
                batch = next(it)
            except StopIteration:
                t_input += time.perf_counter() - t0
                break
            t1 = time.perf_counter()
            t_input += t1 - t0
            out = pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(np.ones(batch.num_rows, dtype=bool))],
                names=["key", "m"],
            )
            t2 = time.perf_counter()
            t_compute += t2 - t1
            n += 1
            yield out
            t_yield += time.perf_counter() - t2
        wall = time.perf_counter() - t_first
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        os.makedirs(OUT, exist_ok=True)
        with open(f"{OUT}/{tag}-{os.getpid()}-{time.monotonic_ns()}.json", "w") as f:
            json.dump(
                {"tag": tag, "pid": os.getpid(), "n_batches": n,
                 "compute_s": t_compute, "input_wait_s": t_input,
                 "yield_block_s": t_yield, "gen_wall_s": wall,
                 "local_arrow_s": local_arrow_s, "maxrss_kb": rss},
                f,
            )

    return const_batches


def summarize(tag):
    rows = []
    for p in glob.glob(f"{OUT}/{tag}-*.json"):
        with open(p) as f:
            rows.append(json.load(f))
    if not rows:
        return None
    return {
        "workers": len({r["pid"] for r in rows}),
        "tasks": len(rows),
        "batches": sum(r["n_batches"] for r in rows),
        "compute_s_total": round(sum(r["compute_s"] for r in rows), 3),
        "input_wait_s_total": round(sum(r.get("input_wait_s", 0) for r in rows), 3),
        "local_arrow_s_total": round(sum(r.get("local_arrow_s", 0) for r in rows), 3),
        "yield_block_s_total": round(sum(r.get("yield_block_s", 0) for r in rows), 3),
        "gen_wall_s_total": round(sum(r["gen_wall_s"] for r in rows), 3),
        "maxrss_mb_max": round(max(r["maxrss_kb"] for r in rows) / 1024, 1),
    }


def main():
    os.system(f"rm -rf {OUT}")
    spark = get_spark("poison-rootcause", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    big_keys = spark.range(12_000_000).select(F.xxhash64(F.col("id") + 7).alias("key"))
    big_forest = build_forest(big_keys, shard_bits=5).cache()
    forest_payload_bytes(big_forest)
    probes = spark.range(10_000_000).select(F.xxhash64("id").alias("key"))
    tagged = probes.withColumn(
        "_sf_shard", F.shiftrightunsigned(F.xxhash64("key"), 59)
    )
    out_schema = StructType(
        [StructField("key", probes.schema["key"].dataType, False),
         StructField("m", BooleanType(), False)]
    )

    def run(tag):
        t0 = time.perf_counter()
        n = (
            _tag_route(tagged, spark, 5)
            .mapInArrow(instrumented(tag), out_schema)
            .filter(F.col("m"))
            .count()
        )
        return round(time.perf_counter() - t0, 3)

    run("warm0")  # warm-up
    pre = [run(f"pre{i}") for i in range(3)]
    for _ in range(3):
        approx_contains_routed(probes, "key", big_forest).filter(
            F.col("maybe_member")
        ).count()
    post = [run(f"post{i}") for i in range(3)]
    print("wall pre :", pre)
    print("wall post:", post)
    for i in range(3):
        print(f"pre{i} ", summarize(f"pre{i}"))
    for i in range(3):
        print(f"post{i}", summarize(f"post{i}"))
    spark.stop()


if __name__ == "__main__":
    main()
