"""Theta/KMV sketch kernel invariants (Spark-free) + distributed build."""

import numpy as np
import pytest

from sparkfuse.theta import EXACT, ThetaParams, ThetaSketch

K = 1024
BOUND = 5.0 / np.sqrt(K - 1)  # ~5 sigma


def _keys(n, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63 - 1, size=n, dtype=np.int64)


def test_exact_mode_below_k():
    sk = ThetaSketch(ThetaParams(K))
    keys = _keys(500, 1)
    sk.add(keys)
    assert sk.theta == EXACT
    assert sk.estimate() == len(np.unique(keys))
    other = ThetaSketch(ThetaParams(K))
    other.add(keys[:200])
    assert other.intersect_estimate(sk) == len(np.unique(keys[:200]))


def test_estimate_within_bound():
    n = 200_000
    sk = ThetaSketch(ThetaParams(K))
    for chunk in np.array_split(_keys(n, 2), 9):
        sk.add(chunk)
    assert abs(sk.estimate() - n) / n < BOUND
    assert len(sk.values) == K


def test_set_expressions_within_bound():
    a_only, shared, b_only = _keys(70_000, 3), _keys(50_000, 4), _keys(80_000, 5)
    a, b = ThetaSketch(ThetaParams(K)), ThetaSketch(ThetaParams(K))
    a.add(np.concatenate([a_only, shared]))
    b.add(np.concatenate([b_only, shared]))
    n_i, n_d = len(shared), len(a_only)
    # intersection/difference errors scale with the UNION size at common
    # theta, not the result size — allow bound * |union|
    n_u = n_i + n_d + len(b_only)
    assert abs(a.intersect_estimate(b) - n_i) < BOUND * n_u
    assert abs(a.difference_estimate(b) - n_d) < BOUND * n_u
    true_j = n_i / n_u
    assert abs(a.jaccard_estimate(b) - true_j) < 5 / np.sqrt(K)
    # identity: intersect + difference == |a| at the common theta exactly
    theta = min(a.theta, b.theta)
    est_a_at_theta = len(a._below(a.values, theta)) / (theta / float(EXACT))
    assert (
        a.intersect_estimate(b) + a.difference_estimate(b)
        == pytest.approx(est_a_at_theta)
    )


def test_merge_is_order_independent_and_byte_equal():
    """The k minima of a set are a pure function of the set: any
    partitioning + merge tree yields the SAME bytes as one pass."""
    keys = _keys(120_000, 6)
    single = ThetaSketch(ThetaParams(K))
    single.add(keys)
    parts = np.array_split(keys, 5)
    sketches = []
    for p in parts:
        s = ThetaSketch(ThetaParams(K))
        s.add(p)
        sketches.append(s)
    merged = sketches[3]
    for s in [sketches[1], sketches[4], sketches[0], sketches[2]]:
        merged = merged.merge(s)
    assert merged.to_bytes() == single.to_bytes()
    assert merged.theta == single.theta != EXACT


def test_serialization_roundtrip():
    for n in (10, 50_000):  # exact mode and evicting mode
        sk = ThetaSketch(ThetaParams(K))
        sk.add(_keys(n, 7))
        r = ThetaSketch.from_bytes(ThetaParams(K), sk.to_bytes())
        assert r.theta == sk.theta
        assert np.array_equal(r.values, sk.values)
        assert r.estimate() == sk.estimate()


def test_build_theta_distributed(spark):
    """Distributed tree-build equals the kernel single-pass byte-for-byte
    (same key set -> same k minima), at Spark scale."""
    from pyspark.sql import functions as F

    from sparkfuse.theta import build_theta

    n = 300_000
    df = spark.range(n).select(F.xxhash64("id").alias("key"))
    sk = build_theta(df, params=ThetaParams(K))
    assert abs(sk.estimate() - n) / n < BOUND
    keys = np.array([r["key"] for r in df.collect()])
    single = ThetaSketch(ThetaParams(K))
    single.add(keys)
    assert sk.to_bytes() == single.to_bytes()
