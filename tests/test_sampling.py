"""Deterministic sampling: reproducibility across partitionings, strata
caps, split consistency across tables."""

import pytest
from pyspark.sql import functions as F

from sparkfuse.sampling import (
    deterministic_sample,
    split_by_hash,
    stratified_sample,
)

N = 10_000


@pytest.fixture(scope="module")
def rows(spark):
    df = spark.range(N).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(7)).alias("grp"),
    )
    df.cache().count()
    yield df
    df.unpersist()


def test_sample_reproducible_and_uniformish(spark, rows):
    a = sorted(r["id"] for r in deterministic_sample(rows, 500, ["id"]).collect())
    b = sorted(
        r["id"]
        for r in deterministic_sample(rows.repartition(13), 500, ["id"]).collect()
    )
    assert a == b and len(a) == 500  # partitioning-independent selection
    assert set(a) <= set(range(N))
    c = sorted(
        r["id"] for r in deterministic_sample(rows, 500, ["id"], seed="1").collect()
    )
    assert c != a  # a new seed is an independent draw
    # roughly uniform: mean of a 500-draw from [0, N) is near N/2
    assert abs(sum(a) / len(a) - N / 2) < N * 0.1


def test_stratified_caps_and_keeps_small_groups(spark, rows):
    out = stratified_sample(rows, ["grp"], 100, ["id"])
    sizes = {
        r["grp"]: r["n"]
        for r in out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(n <= 100 for n in sizes.values())
    assert set(sizes) == set(range(7))
    # a group smaller than k passes through whole
    small = rows.filter((F.col("grp") != 3) | (F.col("id") < 40))
    kept3 = (
        stratified_sample(small, ["grp"], 100, ["id"])
        .filter(F.col("grp") == 3)
        .count()
    )
    assert kept3 == small.filter(F.col("grp") == 3).count()
    # deterministic
    again = stratified_sample(rows, ["grp"], 100, ["id"])
    assert sorted(r["id"] for r in out.collect()) == sorted(
        r["id"] for r in again.collect()
    )


def test_split_disjoint_total_and_consistent_across_tables(spark, rows):
    train, hold = split_by_hash(rows, ["id"], 0.25)
    n_t, n_h = train.count(), hold.count()
    assert n_t + n_h == N
    assert train.join(hold, "id", "inner").count() == 0
    assert abs(n_h / N - 0.25) < 0.03  # md5 is uniform
    # the fence is content-keyed: another table sharing the key column
    # holds out EXACTLY the same ids (no train/eval leakage drift)
    other = rows.select("id", (F.col("id") * 2).alias("payload"))
    _, hold2 = split_by_hash(other, ["id"], 0.25)
    assert sorted(r["id"] for r in hold.collect()) == sorted(
        r["id"] for r in hold2.collect()
    )
    # edge fractions
    t0, h0 = split_by_hash(rows, ["id"], 0.0)
    assert h0.count() == 0 and t0.count() == N


def test_reserved_column_and_validation(spark, rows):
    with pytest.raises(ValueError, match="reserved"):
        stratified_sample(rows.withColumn("_sf_rank", F.lit(1)), ["grp"], 5, ["id"])
    with pytest.raises(ValueError, match="k must be"):
        deterministic_sample(rows, -1, ["id"])
    with pytest.raises(ValueError, match="holdout_fraction"):
        split_by_hash(rows, ["id"], 1.5)


def test_null_key_columns_do_not_collide(spark):
    """('x', NULL) and (NULL, 'x') must hash differently — concat_ws drops
    null segments, so the encoding adds explicit null markers."""
    df = spark.createDataFrame(
        [("x", None, 1), (None, "x", 2)], "a string, b string, id long"
    )
    from sparkfuse.sampling import _row_hash

    rows = df.select(_row_hash(["a", "b"], "0").alias("h")).collect()
    assert rows[0]["h"] != rows[1]["h"]
    # and the split respects the distinction (both sides computable)
    train, hold = split_by_hash(df, ["a", "b"], 0.5)
    assert train.count() + hold.count() == 2


def test_weighted_sample_exact_replay_and_bias(spark):
    """A-ES with content-hash uniforms: (a) EXACT replay by an independent
    python implementation of the same formula, (b) heavier rows win
    proportionally across independent seeds, (c) reproducible across
    partitionings, (d) non-positive weights excluded."""
    import hashlib
    import math

    from sparkfuse.sampling import weighted_sample

    n = 2_000
    df = spark.range(n).select(
        F.col("id"), (F.pmod(F.col("id"), F.lit(10)) + 1).cast("double").alias("w")
    )

    def replay(seed, k):
        pri = []
        for i in range(n):
            h = hashlib.md5(
                ("\x1f".join([seed, "\x02" + str(i)])).encode()
            ).hexdigest()
            u = (int(h[:15], 16) + 1.0) / float(16 ** 15)
            pri.append((math.log(u) / ((i % 10) + 1), i))
        pri.sort(reverse=True)
        return sorted(i for _, i in pri[:k])

    got = sorted(r["id"] for r in weighted_sample(df, 50, "w", ["id"]).collect())
    assert got == replay("0", 50)
    got2 = sorted(
        r["id"]
        for r in weighted_sample(df.repartition(11), 50, "w", ["id"]).collect()
    )
    assert got2 == got

    # bias: weight-10 rows should appear ~10x as often as weight-1 rows
    picks = {w: 0 for w in range(1, 11)}
    for s in range(40):
        for r in weighted_sample(df, 100, "w", ["id"], seed=str(s)).collect():
            picks[int(r["w"])] += 1
    assert picks[10] > 4 * picks[1]
    assert sum(picks.values()) == 4000

    # zero/negative/null weights never sampled
    bad = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") < 90, F.lit(0.0))
        .when(F.col("id") < 95, F.lit(-1.0))
        .otherwise(F.lit(None).cast("double"))
        .alias("w"),
    )
    assert weighted_sample(bad, 10, "w", ["id"]).count() == 0


def test_key_type_guard_is_loud_and_case_insensitive(spark):
    """Non-portable key columns (double/timestamp) raise instead of silently
    desynchronizing a cross-engine replay — including when the caller's
    column case differs from the schema's (Spark resolves case-insensitively,
    so the guard must too; round-5 review)."""
    import pytest
    from sparkfuse.sampling import deterministic_sample, split_by_hash

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") / 7.0).alias("score"),
        F.to_timestamp(F.from_unixtime(F.col("id") + 1767225600)).alias("ts"),
    )
    with pytest.raises(TypeError, match="not engine-portable"):
        deterministic_sample(df, 10, ["score"])
    with pytest.raises(TypeError, match="not engine-portable"):
        deterministic_sample(df, 10, ["TS"])  # case differs from schema
    with pytest.raises(TypeError, match="not engine-portable"):
        split_by_hash(df, ["ts"], 0.1)
    # integral/string keys pass
    assert deterministic_sample(df, 10, ["id"]).count() == 10
