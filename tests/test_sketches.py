"""HLL / Count-Min: error bounds, merge associativity, distributed == local."""

import numpy as np
from pyspark.sql import functions as F

from sparkfuse.sketches import (
    CmsParams,
    CountMin,
    HllParams,
    HyperLogLog,
    build_cms,
    build_hll,
)


def rand_keys(n, seed):
    return np.random.default_rng(seed).integers(0, 2**63, n, dtype=np.int64).view(np.uint64)


def test_hll_accuracy_within_bound():
    for n in (10_000, 1_000_000):
        keys = rand_keys(n, n)
        h = HyperLogLog()
        h.add(keys)
        est = h.estimate()
        rel = abs(est - n) / n
        assert rel < 4 * h.relative_std_error, (n, est, rel)


def test_hll_merge_associative_and_equivalent():
    a, b, c = (rand_keys(50_000, s) for s in (1, 2, 3))
    ha, hb, hc = HyperLogLog(), HyperLogLog(), HyperLogLog()
    ha.add(a), hb.add(b), hc.add(c)
    left = ha.merge(hb).merge(hc)
    right = ha.merge(hb.merge(hc))
    assert np.array_equal(left.registers, right.registers)
    whole = HyperLogLog()
    whole.add(np.concatenate([a, b, c]))
    assert np.array_equal(left.registers, whole.registers)


def test_hll_small_range_linear_counting():
    keys = rand_keys(100, 9)
    h = HyperLogLog()
    h.add(keys)
    assert abs(h.estimate() - 100) <= 3


def test_hll_sparse_serialization_bit_exact_and_small():
    # a per-(partition, group) partial over a few dozen turns must NOT ship
    # a dense 16 KB block — the sparse form is 5 bytes per nonzero register
    keys = rand_keys(40, 11)
    h = HyperLogLog()
    h.add(keys)
    data = h.to_bytes()
    nnz = int(np.count_nonzero(h.registers))
    assert data[0] == 1 and len(data) == 5 + 5 * nnz  # sparse-tagged
    assert len(data) <= 5 + 5 * 40 < HllParams().m
    back = HyperLogLog.from_bytes(HllParams(), data)
    assert np.array_equal(back.registers, h.registers)  # lossless
    assert back.estimate() == h.estimate()


def test_hll_serialization_crossover_to_dense():
    # past the crossover the dense raw form (exactly m bytes) wins; the
    # m-byte length is also the legacy-checkpoint format, so old sinks load
    p = HllParams(p=6)  # m=64: crossover at nnz >= 12 nonzero registers
    h = HyperLogLog(p)
    h.add(rand_keys(5_000, 12))
    data = h.to_bytes()
    assert len(data) == p.m and data == h.registers.tobytes()
    back = HyperLogLog.from_bytes(p, data)
    assert np.array_equal(back.registers, h.registers)


def test_hll_sparse_dense_dispatch_unambiguous_for_all_p():
    # dispatch is on len(data) == m; a sparse payload is 5·(nnz+1) bytes and
    # 2^p is never divisible by 5, so the two forms can never collide
    for p in range(4, 22):
        assert (1 << p) % 5 != 0


def test_hll_merge_across_serialized_forms():
    sparse_side, dense_side = HyperLogLog(), HyperLogLog()
    sparse_side.add(rand_keys(30, 13))
    dense_side.add(rand_keys(200_000, 14))
    a = HyperLogLog.from_bytes(HllParams(), sparse_side.to_bytes())
    b = HyperLogLog.from_bytes(HllParams(), dense_side.to_bytes())
    assert np.array_equal(
        a.merge(b).registers, sparse_side.merge(dense_side).registers
    )


def test_hll_from_bytes_rejects_corrupt_state():
    import pytest

    h = HyperLogLog()
    h.add(rand_keys(10, 15))
    data = h.to_bytes()
    with pytest.raises(ValueError):
        HyperLogLog.from_bytes(HllParams(), data[:-1])  # truncated sparse
    with pytest.raises(ValueError):
        HyperLogLog.from_bytes(HllParams(), b"\x02" + data[1:])  # bad tag


def test_grouped_hll_bit_equals_local_per_group(spark):
    # the vectorized cross-group partial must produce registers (hence
    # estimates) BIT-identical to one HyperLogLog per group fed the same
    # values — max-merge is order-insensitive, so any difference means the
    # lexsort reduce or the in-place sparse serialization is wrong
    from sparkfuse.sketches import grouped_hll

    n = 60_000
    df = spark.range(n).selectExpr(
        "concat('grp-', pmod(xxhash64(id), 700)) AS g",
        "pmod(xxhash64(id + 1), 5000) AS v",
    )
    got = {
        r["g"]: r["n_distinct_est"]
        for r in grouped_hll(df, ["g"], "v").collect()
    }
    locals_ = {}
    for r in df.collect():
        locals_.setdefault(r["g"], []).append(r["v"])
    assert len(got) == len(locals_)
    for gname, vals in locals_.items():
        h = HyperLogLog()
        h.add(np.asarray(vals, dtype=np.int64))
        assert got[gname] == h.estimate(), gname


def test_grouped_hll_final_is_jvm_agg_not_per_group_pandas(spark):
    # the final stage must be a JVM collect_list aggregation feeding a
    # batch pandas UDF — ONE python call per Arrow batch — never a
    # FlatMapGroupsInPandas (one pandas invocation per group: ~ms of
    # split/convert overhead x 10k+ groups at high cardinality)
    from sparkfuse.sketches import grouped_hll

    df = spark.range(100).selectExpr("pmod(id, 7) AS g", "id AS v")
    plan = grouped_hll(df, ["g"], "v")._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert "collect_list" in plan
    # the generic path (order-sensitive kinds) shares the shape, with
    # sort_array(struct(_pid, state)) restoring the deterministic merge order
    from sparkfuse.sketches import grouped_kll_quantiles

    kplan = (
        grouped_kll_quantiles(df, ["g"], "v", [0.5])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "FlatMapGroupsInPandas" not in kplan
    assert "collect_list" in kplan and "sort_array" in kplan


def test_grouped_hll_multi_batch_partials_bit_equal(spark):
    # force many small Arrow batches per partition so the partial's
    # cross-batch paths (stable group-code dict, triple re-reduce over
    # accumulated batches) are actually exercised
    from sparkfuse.sketches import grouped_hll

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "400")
    try:
        df = spark.range(20_000).selectExpr(
            "pmod(xxhash64(id), 50) AS g", "pmod(xxhash64(id + 9), 3000) AS v"
        ).coalesce(2)
        got = {r["g"]: r["n_distinct_est"] for r in grouped_hll(df, ["g"], "v").collect()}
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    locals_ = {}
    for r in df.collect():
        locals_.setdefault(r["g"], []).append(r["v"])
    for gname, vals in locals_.items():
        h = HyperLogLog()
        h.add(np.asarray(vals, dtype=np.int64))
        assert got[gname] == h.estimate(), gname


def test_grouped_hll_nullable_bigint_keys_keep_precision(spark):
    # Arrow->pandas turns a nullable int64 column into float64, rounding
    # values past 2^53 — grouped_hll must ship integral key AND group
    # columns null-safely (coalesce + flag) so huge keys hash exactly and
    # huge group values come back unrounded. 2^60+1 vs 2^60+2 collapse to
    # the same float64; the null rows force the coercion path.
    from pyspark.sql import Row
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    base = 1 << 60
    rows = [Row(g=base + 1, v=base + 1), Row(g=base + 1, v=base + 2),
            Row(g=base + 2, v=base + 1), Row(g=None, v=base + 5),
            Row(g=base + 1, v=None)]
    schema = StructType([StructField("g", LongType(), True),
                         StructField("v", LongType(), True)])
    df = spark.createDataFrame(rows, schema).coalesce(1)
    from sparkfuse.sketches import grouped_hll

    got = {r["g"]: r["n_distinct_est"] for r in grouped_hll(df, ["g"], "v").collect()}
    assert set(got) == {base + 1, base + 2, None}  # group values exact
    h12 = HyperLogLog(); h12.add(np.array([base + 1, base + 2], dtype=np.int64))
    h1 = HyperLogLog(); h1.add(np.array([base + 1], dtype=np.int64))
    h5 = HyperLogLog(); h5.add(np.array([base + 5], dtype=np.int64))
    assert got[base + 1] == h12.estimate()  # two DISTINCT keys, not one
    assert got[base + 2] == h1.estimate()
    assert got[None] == h5.estimate()


def test_merge_hll_states_mixed_forms_equals_pairwise():
    from sparkfuse.sketches import merge_hll_states

    hs = []
    for n, seed in ((30, 1), (400_000, 2), (12, 3)):  # sparse, dense, sparse
        h = HyperLogLog()
        h.add(rand_keys(n, seed))
        hs.append(h)
    expect = hs[0].merge(hs[1]).merge(hs[2]).registers
    got = merge_hll_states([h.to_bytes() for h in hs], HllParams())
    assert np.array_equal(got, expect)
    assert np.array_equal(merge_hll_states([], HllParams()), np.zeros(HllParams().m, np.uint8))


def test_cms_point_queries_within_bound():
    # zipf-ish: key i appears ~ n/(i+1) times
    reps = (200_000 / (np.arange(200) + 1)).astype(np.int64)
    keys = np.repeat(np.arange(200, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15), reps)
    cms = CountMin()
    cms.add(keys)
    q = np.arange(200, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    est = cms.query(q)
    n_total = int(reps.sum())
    assert (est >= reps).all()  # never undercounts
    assert (est - reps <= CmsParams().eps * n_total * 3).all()
    # top-1 is essentially exact
    assert est[0] == reps[0]


def test_cms_merge_equivalent():
    a, b = rand_keys(30_000, 4), rand_keys(30_000, 5)
    ca, cb = CountMin(), CountMin()
    ca.add(a), cb.add(b)
    merged = ca.merge(cb)
    whole = CountMin()
    whole.add(np.concatenate([a, b]))
    assert np.array_equal(merged.table, whole.table)


def test_distributed_hll_equals_local(spark):
    n = 100_000
    df = spark.range(n).select(F.xxhash64("id").alias("key")).repartition(8)
    dist = build_hll(df)
    local = HyperLogLog()
    local.add(np.array([r["key"] for r in df.collect()], dtype=np.int64))
    assert np.array_equal(dist.registers, local.registers)
    assert abs(dist.estimate() - n) / n < 0.05


def test_distributed_cms_equals_local(spark):
    df = spark.range(50_000).select(
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("key")
    ).repartition(8)
    dist = build_cms(df)
    local = CountMin()
    local.add(np.array([r["key"] for r in df.collect()], dtype=np.int64))
    assert np.array_equal(dist.table, local.table)


def test_entry_hll_cms_against_exact(spark):
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.01"
    # entry queries return invariants (exact aggregate, bound boolean);
    # cross-check with sketches built directly so the booleans are non-vacuous
    hll_row = m.queries()["hll_distinct_users"](spark, sf).first()
    exact = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert hll_row["exact_distinct"] == exact
    assert hll_row["within_bound"] is True
    events = spark.read.parquet(f"{sf}/events.parquet")
    hll = build_hll(events.select(F.col("user_id").alias("key")))
    assert abs(hll.estimate() - exact) / exact < 0.05  # linear-counting regime

    cms_rows = {r["user_id"]: (r["exact_events"], r["ok"])
                for r in m.queries()["cms_user_counts"](spark, sf).collect()}
    truth = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(truth.values())
    cms = build_cms(events.select(F.col("user_id").alias("key")))
    est = cms.query(np.arange(10, dtype=np.uint64))
    for uid, (exact_n, ok) in cms_rows.items():
        assert exact_n == truth[uid]
        assert ok is True
        assert est[uid] >= truth[uid]
        assert est[uid] - truth[uid] <= CmsParams().eps * n_total * 3


# ---------------------------------------------------------------------------
# grouped sketch aggregation (per-group mergeable states)
# ---------------------------------------------------------------------------

def test_grouped_hll_matches_exact_within_bound(spark):
    from pyspark.sql import functions as F

    from sparkfuse.sketches import HllParams, grouped_hll

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    params = HllParams()
    est = {
        r["event_type"]: r["n_distinct_est"]
        for r in grouped_hll(events, ["event_type"], "user_id", params).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    sigma = 1.04 / (params.m ** 0.5)
    for g, n in exact.items():
        assert abs(est[g] - n) <= 4 * sigma * n + 1.0, (g, est[g], n)


def test_grouped_tdigest_rank_error(spark):
    import numpy as np

    from sparkfuse.sketches import grouped_tdigest_quantiles

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    got = {
        r["event_type"]: (r["q_0_5"], r["q_0_9"])
        for r in grouped_tdigest_quantiles(
            events, ["event_type"], "value", [0.5, 0.9]
        ).collect()
    }
    rows = events.select("event_type", "value").collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["event_type"], []).append(r["value"])
    for g, vals in by_g.items():
        v = np.sort(np.array(vals, dtype=np.float64))
        for q, est in zip((0.5, 0.9), got[g]):
            # rank of the estimate within 1.5% of the target quantile
            rank = np.searchsorted(v, est) / len(v)
            assert abs(rank - q) < 0.015, (g, q, est, rank)


def test_grouped_hll_null_group_and_null_values(spark):
    # Spark groupBy keeps a NULL group; countDistinct ignores NULL values —
    # the grouped sketch must match both semantics
    from pyspark.sql import functions as F

    from sparkfuse.sketches import grouped_hll

    rows = [("a", 1), ("a", 2), (None, 3), (None, 3), ("b", None), ("b", 7)]
    df = spark.createDataFrame(rows, "g string, v long")
    est = {
        r["g"]: r["n_distinct_est"]
        for r in grouped_hll(df, ["g"], "v").collect()
    }
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert set(est) == set(exact) == {"a", "b", None}
    for g, n in exact.items():
        assert abs(est[g] - n) <= 1.0, (g, est[g], n)


def test_grouped_kll_matches_exact_within_bound(spark, sf_dir):
    """Per-group KLL medians land within rank tolerance of each group's
    exact values, including groups far smaller than k."""
    import numpy as np
    from pyspark.sql import functions as F

    from sparkfuse.kll import KllParams
    from sparkfuse.sketches import grouped_kll_quantiles

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["event_type"]: r["q_0_5"]
        for r in grouped_kll_quantiles(
            events, ["event_type"], "value", [0.5], KllParams(k=128)
        ).collect()
    }
    groups = {
        r["event_type"]: r
        for r in events.groupBy("event_type").agg(
            F.count("value").alias("n")
        ).collect()
    }
    assert set(got) == set(groups)
    for et, est in got.items():
        vals = np.array(
            [
                r["value"]
                for r in events.filter(
                    (F.col("event_type") == et) & F.col("value").isNotNull()
                ).collect()
            ]
        )
        rank = float((vals <= est).mean())
        assert abs(rank - 0.5) <= max(0.05, 2.0 / np.sqrt(len(vals))), (et, rank)


def test_misra_gries_guarantees_and_merge():
    """Kernel-level MG invariants: undercount bound, presence guarantee,
    merge ≡ single-pass bound-wise, serialization roundtrip."""
    import numpy as np

    from sparkfuse.sketches import MgParams, MisraGries

    rng = np.random.default_rng(7)
    # zipf-ish: heavy keys 0..9, long uniform tail
    tail = rng.integers(100, 50_000, size=40_000)
    heads = np.repeat(np.arange(10), 2_000)
    data = np.concatenate([heads, tail])
    rng.shuffle(data)
    true = {k: int((data == k).sum()) for k in range(10)}

    params = MgParams(capacity=512)
    mg = MisraGries(params)
    for chunk in np.array_split(data, 7):
        mg.add(chunk)
    assert mg.n == len(data)
    assert len(mg.keys) <= params.capacity
    assert mg.dec <= mg.n // (params.capacity + 1)
    est = mg.estimates(np.arange(10))
    for k in range(10):
        assert true[k] - mg.dec <= est[k] <= true[k], (k, est[k], true[k])
        assert est[k] > 0  # every head exceeds dec -> present

    # merge of split halves keeps the composed bound and the guarantee
    a, b = MisraGries(params), MisraGries(params)
    a.add(data[: len(data) // 2])
    b.add(data[len(data) // 2:])
    m = a.merge(b)
    assert m.n == len(data)
    assert m.dec <= m.n // (params.capacity + 1)
    est_m = m.estimates(np.arange(10))
    for k in range(10):
        assert true[k] - m.dec <= est_m[k] <= true[k]

    r = MisraGries.from_bytes(params, m.to_bytes())
    assert np.array_equal(r.keys, m.keys) and np.array_equal(r.counts, m.counts)
    assert (r.n, r.dec) == (m.n, m.dec)


def test_heavy_hitters_exact(spark, sf_dir):
    """MG-prescreened heavy hitters return EXACTLY the full-groupBy answer."""
    from pyspark.sql import functions as F

    from sparkfuse.sketches import heavy_hitters

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        (r["user_id"], r["n"])
        for r in heavy_hitters(events, "user_id", min_count=60).collect()
    }
    want = {
        (r["user_id"], r["n"])
        for r in events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 60)
        .collect()
    }
    assert got == want and len(want) > 0


def test_heavy_hitters_capacity_too_small_raises(spark, sf_dir):
    import pytest

    from sparkfuse.sketches import heavy_hitters

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError, match="raise\\s+capacity"):
        heavy_hitters(events, "user_id", min_count=2, capacity=4)


def test_heavy_hitters_large_capacity_semijoin_path(spark):
    """Above the in-list threshold the candidate set rides a broadcast
    semi-join; results stay exactly the full-groupBy answer."""
    from pyspark.sql import functions as F

    from sparkfuse.sketches import heavy_hitters

    zipf = spark.range(300_000).select(
        (
            F.lit(1.0)
            / ((F.pmod(F.xxhash64("id"), F.lit(50_000)) + 1) / 50_000.0)
        )
        .cast("long")
        .alias("user")
    )
    got = sorted(
        (r["user"], r["n"])
        for r in heavy_hitters(zipf, "user", min_count=50, capacity=4096).collect()
    )
    want = sorted(
        (r["user"], r["n"])
        for r in zipf.groupBy("user")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter("n >= 50")
        .collect()
    )
    assert got == want and len(got) > 10
