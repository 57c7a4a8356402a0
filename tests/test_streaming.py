"""Structured-Streaming forest maintenance: epoch append, exactly-once
replay idempotence, probe over epochs, compaction."""

import numpy as np
from pyspark.sql import functions as F

from sparkfuse.forest import Forest
from sparkfuse.streaming import (
    EpochForest,
    compact_forest,
    forest_append_batch,
    stream_forest,
)


def test_stream_forest_epochs(spark, tmp_path):
    import pandas as pd

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    # two flat files -> file stream processes them in separate micro-batches
    pd.DataFrame({"k": range(0, 5000)}).to_parquet(src_dir / "a.parquet")
    pd.DataFrame({"k": range(5000, 10000)}).to_parquet(src_dir / "b.parquet")
    stream = (
        spark.readStream.schema("k long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    forest_path = str(tmp_path / "forest")
    q = stream_forest(
        stream,
        forest_path,
        str(tmp_path / "ckpt"),
        key_cols=["k"],
        shard_bits=2,
    )
    q.awaitTermination(120)
    ef = EpochForest.load(spark, forest_path, shard_bits=2)
    assert ef.n_epochs == 2  # one epoch per file
    keys = spark.range(10000).select(F.xxhash64("id").alias("key"))
    arr = np.array([r["key"] for r in keys.collect()], dtype=np.int64)
    assert ef.contains_np(arr).all()  # zero FN across epochs
    absent = np.array(
        [r[0] for r in spark.range(10**6, 10**6 + 5000)
         .select(F.xxhash64("id")).collect()],
        dtype=np.int64,
    )
    assert ef.contains_np(absent).mean() < 0.02


def test_epoch_replay_is_idempotent(spark, tmp_path):
    # deterministic builds => a replayed epoch appends byte-identical rows
    df = spark.range(2000).select(F.col("id").alias("k"))
    path = str(tmp_path / "forest")
    forest_append_batch(df, 7, path, ["k"], shard_bits=1)
    forest_append_batch(df, 7, path, ["k"], shard_bits=1)  # replay
    rows = spark.read.parquet(path).collect()
    hashes = {}
    for r in rows:
        hashes.setdefault(r["shard"], set()).add(r["content_sha256"])
    assert all(len(v) == 1 for v in hashes.values())  # dup rows identical


def test_compaction_equals_batch_build(spark, tmp_path):
    keys = spark.range(8000).select(F.xxhash64("id").alias("key"))
    compacted = compact_forest(
        spark, keys, str(tmp_path / "x"), str(tmp_path / "compact"), shard_bits=2
    )
    f = Forest.from_df(compacted)
    arr = np.array([r["key"] for r in keys.collect()], dtype=np.int64)
    assert f.contains_np(arr).all()
    # idempotent re-compaction: identical content hashes
    again = compact_forest(
        spark, keys, str(tmp_path / "x"), str(tmp_path / "compact2"), shard_bits=2
    )
    a = {r["shard"]: r["content_sha256"] for r in compacted.collect()}
    b = {r["shard"]: r["content_sha256"] for r in again.collect()}
    assert a == b
