"""KLL sketch: rank-error bound, merge conservation, distributed build."""

import numpy as np
from pyspark.sql import functions as F

from sparkfuse.kll import KLL, KllParams, build_kll


def rank_error(s, values, q):
    est = s.quantile(q)
    lo = (values < est).mean()
    hi = (values <= est).mean()
    return max(0.0, q - hi, lo - q)


def test_kll_accuracy():
    rng = np.random.default_rng(0)
    for values in (rng.standard_normal(300_000), rng.lognormal(0, 2, 300_000)):
        s = KLL()
        s.add(values)
        assert s.n == len(values)
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            assert rank_error(s, values, q) < 0.025, (q, rank_error(s, values, q))


def test_kll_rank_estimator():
    values = np.arange(100_000, dtype=float)
    s = KLL()
    s.add(values)
    for x in (10_000, 50_000, 90_000):
        assert abs(s.rank(x) - (x + 1)) / len(values) < 0.02


def test_kll_merge_conserves_n_and_accuracy():
    rng = np.random.default_rng(1)
    parts = [rng.standard_normal(80_000) * (i + 1) for i in range(3)]
    sketches = []
    for p in parts:
        s = KLL()
        s.add(p)
        sketches.append(s)
    merged = sketches[0].merge(sketches[1]).merge(sketches[2])
    allv = np.concatenate(parts)
    assert merged.n == len(allv)
    for q in (0.1, 0.5, 0.9):
        assert rank_error(merged, allv, q) < 0.03, q


def test_kll_serialization_roundtrip():
    s = KLL()
    s.add(np.random.default_rng(2).uniform(0, 1, 50_000))
    g = KLL.from_bytes(KllParams(), s.to_bytes())
    assert g.n == s.n
    assert g.quantile(0.5) == s.quantile(0.5)


def test_kll_memory_bounded():
    s = KLL(KllParams(k=200))
    s.add(np.random.default_rng(3).standard_normal(1_000_000))
    retained = sum(len(b) for b in s.levels)
    assert retained < 3 * 200 * 3  # O(k log(n/k)) comfortably small


def test_distributed_kll(spark):
    df = spark.range(150_000).select(
        (F.rand(seed=7) * 1000).alias("value")
    ).repartition(8).cache()
    s = build_kll(df, "value")
    values = np.array([r["value"] for r in df.collect()])
    assert s.n == len(values)
    for q in (0.1, 0.5, 0.9):
        assert rank_error(s, values, q) < 0.03, q
    df.unpersist()


def test_entry_kll_against_exact(spark):
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.01"
    # the entry query computes the rank-error invariant in-query and returns
    # (q, ok); cross-check the booleans against an independent digest here
    rows = {r["q"]: r["ok"] for r in
            m.queries()["kll_event_values"](spark, sf).collect()}
    assert set(rows) == {0.1, 0.5, 0.9}
    assert all(rows.values()), rows
    from sparkfuse.kll import build_kll

    s = build_kll(
        spark.read.parquet(f"{sf}/events.parquet").select("value"), "value"
    )
    vals = np.array([
        r["value"]
        for r in spark.read.parquet(f"{sf}/events.parquet").collect()
    ])
    for q in (0.1, 0.5, 0.9):
        est = s.quantile(q)
        lo = (vals < est).mean()
        hi = (vals <= est).mean()
        assert max(0.0, q - hi, lo - q) < 0.03, (q, est)
