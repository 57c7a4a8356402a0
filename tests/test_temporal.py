"""As-of join and sessionization vs brute-force/DuckDB references."""

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def timeline(spark):
    """Deterministic per-user event timeline with microsecond jitter."""
    df = (
        spark.range(4_000)
        .select(
            F.col("id").alias("event_id"),
            F.pmod(F.xxhash64("id"), F.lit(40)).alias("user_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + F.pmod(F.xxhash64(F.col("id") + 1), F.lit(86_400_000_000))
            ).alias("ts"),
            (F.pmod(F.xxhash64(F.col("id") + 2), F.lit(1000)) / 10.0).alias("value"),
        )
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


def test_asof_join_matches_duckdb_asof(spark, timeline):
    """Backward-inclusive as-of vs DuckDB's native ASOF LEFT JOIN."""
    from sparkfuse.temporal import asof_join

    left = timeline.filter(F.col("event_id") % 3 == 0)
    # one right row per (user_id, ts) keeps "latest" unambiguous
    right = timeline.filter(F.col("event_id") % 3 != 0).dropDuplicates(
        ["user_id", "ts"]
    )
    got = sorted(
        (r["event_id"], r["event_id_asof"])
        for r in asof_join(
            left, right, on="ts", by=["user_id"], right_cols=["event_id"]
        ).collect()
    )
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    want = sorted(
        (a, b)
        for a, b in con.execute(
            "SELECT l.event_id, r.event_id FROM l ASOF LEFT JOIN r "
            "ON l.user_id = r.user_id AND r.ts <= l.ts"
        ).fetchall()
    )
    assert got == want and len(got) == left.count()
    assert any(b is not None for _, b in got)
    assert any(b is None for _, b in got)  # earliest-per-user left rows


def test_asof_tolerance_and_tie_inclusive(spark):
    from sparkfuse.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100_000_000), (1, 200_000_000), (2, 50_000_000)], "k long, us long"
    ).select("k", F.timestamp_micros("us").alias("ts"))
    right = spark.createDataFrame(
        [(1, 100_000_000, "tie"), (1, 110_000_000, "later"), (2, 1_000_000, "old")],
        "k long, us long, tag string",
    ).select("k", F.timestamp_micros("us").alias("ts"), "tag")
    rows = {
        (r["k"], r["ts"]): r["tag_asof"]
        for r in asof_join(
            left, right, on="ts", by=["k"], right_cols=["tag"]
        ).collect()
    }
    vals = sorted(rows.values(), key=str)
    assert "tie" in vals  # equal timestamp IS visible
    assert "later" in vals  # 110s <= 200s picked over 100s
    assert "old" in vals
    # tolerance: the 49-second-old match for k=2 gets nulled at 10s
    rows_tol = {
        r["k"]: r["tag_asof"]
        for r in asof_join(
            left.filter("k = 2"),
            right,
            on="ts",
            by=["k"],
            right_cols=["tag"],
            tolerance_us=10_000_000,
        ).collect()
    }
    assert rows_tol[2] is None


def test_sessionize_matches_reference(spark, timeline):
    """Session indices vs an independently-computed python reference."""
    from sparkfuse.temporal import sessionize

    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(
            timeline, "ts", ["user_id"], gap_seconds=1800, tiebreak=["event_id"]
        ).collect()
    }
    rows = sorted(
        ((r["user_id"], r["ts"], r["event_id"]) for r in timeline.collect()),
        key=lambda t: (t[0], t[1], t[2]),
    )
    ref, prev_user, prev_ts, idx = {}, None, None, 0
    for user, ts, eid in rows:
        if user != prev_user:
            idx = 1
        elif (ts - prev_ts).total_seconds() > 1800:
            idx += 1
        ref[eid] = idx
        prev_user, prev_ts = user, ts
    assert got == ref
    assert max(ref.values()) > 1  # gaps actually split sessions


def test_asof_reserved_and_suffix_clash(spark, timeline):
    from sparkfuse.temporal import asof_join

    with pytest.raises(ValueError, match="reserved"):
        asof_join(
            timeline.withColumn("_sf_isl", F.lit(1)),
            timeline,
            on="ts",
            by=["user_id"],
            right_cols=["value"],
        )
    with pytest.raises(ValueError, match="suffix"):
        asof_join(
            timeline.withColumn("value_asof", F.lit(1)),
            timeline,
            on="ts",
            by=["user_id"],
            right_cols=["value"],
        )


def test_asof_null_payload_and_null_ts_semantics(spark):
    """Review regressions: (a) the LATEST matching right row wins even when
    its payload is NULL — an older non-null value must not leak through;
    (b) NULL-ts right rows never match; NULL-ts left rows come back
    unmatched."""
    from sparkfuse.temporal import asof_join

    left = spark.createDataFrame([(1, 101_000_000)], "k long, us long").select(
        "k", F.timestamp_micros("us").alias("ts")
    )
    right = spark.createDataFrame(
        [(1, 5_000_000, "a"), (1, 100_000_000, None)], "k long, us long, v string"
    ).select("k", F.timestamp_micros("us").alias("ts"), "v")
    r = asof_join(
        left, right, on="ts", by=["k"], right_cols=["v"], tolerance_us=10_000_000
    ).first()
    assert r["v_asof"] is None  # NOT the stale 96-second-old "a"

    ghost = spark.createDataFrame([(1, None, "ghost")], "k long, us long, v string").select(
        "k", F.timestamp_micros("us").alias("ts"), "v"
    )
    assert (
        asof_join(left, ghost, on="ts", by=["k"], right_cols=["v"]).first()["v_asof"]
        is None
    )
    null_left = spark.createDataFrame([(1, None)], "k long, us long").select(
        "k", F.timestamp_micros("us").alias("ts")
    )
    assert (
        asof_join(
            null_left,
            right.filter(F.col("v").isNotNull()),
            on="ts",
            by=["k"],
            right_cols=["v"],
        ).first()["v_asof"]
        is None
    )
