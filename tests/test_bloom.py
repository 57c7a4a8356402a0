"""Bloom baseline: correctness, mergeability/associativity, distributed build."""

import numpy as np
from pyspark.sql import functions as F

from sparkfuse.bloom import BloomFilter, BloomParams, build_bloom


def rand_keys(n, seed):
    return np.random.default_rng(seed).integers(0, 2**63, n, dtype=np.int64).view(
        np.uint64
    )


def test_bloom_zero_fn_and_fpp():
    keys = rand_keys(100_000, 3)
    p = BloomParams.for_capacity(len(keys), fpp=0.01)
    bf = BloomFilter(p)
    bf.add(keys)
    assert bf.contains(keys).all()
    probes = rand_keys(1_000_000, 4)
    mask = ~np.isin(probes, keys)
    fpp = bf.contains(probes[mask]).mean()
    assert fpp < 0.02  # 2x slack over target 1%


def test_bloom_merge_associative_and_equivalent():
    p = BloomParams.for_capacity(30_000, fpp=0.01)
    a, b, c = (rand_keys(10_000, s) for s in (10, 11, 12))
    fa, fb, fc = BloomFilter(p), BloomFilter(p), BloomFilter(p)
    fa.add(a), fb.add(b), fc.add(c)
    left = fa.merge(fb).merge(fc)
    right = fa.merge(fb.merge(fc))
    assert np.array_equal(left.words, right.words)
    whole = BloomFilter(p)
    whole.add(np.concatenate([a, b, c]))
    assert np.array_equal(left.words, whole.words)  # merge == build-over-union


def test_bloom_serialization_roundtrip():
    p = BloomParams.for_capacity(1000)
    bf = BloomFilter(p)
    keys = rand_keys(1000, 5)
    bf.add(keys)
    g = BloomFilter.from_bytes(p, bf.to_bytes())
    assert g.contains(keys).all()


def test_distributed_bloom_equals_local(spark):
    n = 50_000
    keys_df = spark.range(n).select(F.xxhash64("id").alias("key")).repartition(8)
    dist = build_bloom(keys_df, n_estimate=n, fpp=0.01)
    local = BloomFilter(BloomParams.for_capacity(n, 0.01))
    local.add(np.array([r["key"] for r in keys_df.collect()], dtype=np.int64))
    assert np.array_equal(dist.words, local.words)
    assert dist.contains(np.array([r["key"] for r in keys_df.collect()], dtype=np.int64)).all()
