"""Checkpointable sketch sink: resume ≡ fresh byte-identity, loud guards,
estimate parity with the single-pass builders, lineage metrics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkfuse.bloom import BloomParams
from sparkfuse.kll import KllParams
from sparkfuse.sketches import CmsParams, HllParams, build_cms, build_hll
from sparkfuse.sketchsink import (
    SketchSpec,
    build_sketch_states,
    build_sketch_states_resumable,
    finish_sketch_states,
    merge_sketch_states,
    sketch_sink_metrics,
    write_sketch_states,
)

SHARD_BITS = 3
N = 20_000
N_USERS = 1_500


@pytest.fixture(scope="module")
def events(spark):
    """Deterministic synthetic events: user_id skewed, value lognormal-ish,
    every 13th user_id NULL, every 17th value NULL."""
    df = (
        spark.range(N)
        .select(
            F.col("id"),
            F.when(F.col("id") % 13 != 0, F.pmod(F.xxhash64("id"), F.lit(N_USERS)))
            .alias("user_id"),
            F.when(
                F.col("id") % 17 != 0,
                (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)) / 100.0),
            ).alias("value"),
        )
    )
    df.cache().count()
    yield df
    df.unpersist()


def _specs():
    return [
        SketchSpec("users_hll", "hll", "user_id", HllParams(p=12)),
        SketchSpec("users_cms", "cms", "user_id", CmsParams(depth=4, width=1 << 12)),
        SketchSpec("value_td", "tdigest", "value", quantiles=(0.5, 0.9)),
        SketchSpec("value_kll", "kll", "value", KllParams(k=160), quantiles=(0.5,)),
        SketchSpec(
            "users_bloom", "bloom", "user_id", BloomParams.for_capacity(N_USERS, 0.01)
        ),
    ]


def _rows(df):
    out = []
    for r in df.collect():
        d = r.asDict()
        d["state"] = bytes(d["state"])
        out.append(d)
    return sorted(out, key=lambda d: (d["sketch"], d["shard"]))


def test_resume_equals_fresh(spark, events, tmp_path):
    """Kill-and-resume completes the sink byte-identical to a fresh build."""
    specs = _specs()
    fresh = str(tmp_path / "fresh")
    resumed = str(tmp_path / "resumed")
    full = build_sketch_states(events, specs, SHARD_BITS, "user_id")
    write_sketch_states(full, fresh)
    # simulate a kill after half the shards committed
    half = spark.read.parquet(fresh).filter(F.col("shard") % 2 == 0)
    write_sketch_states(half, resumed)
    build_sketch_states_resumable(
        events, resumed, spark, specs, SHARD_BITS, "user_id"
    )
    a = _rows(spark.read.parquet(fresh))
    b = _rows(spark.read.parquet(resumed))
    assert a == b
    assert len(a) == (1 << SHARD_BITS) * len(specs)
    # a second resume is a no-op (no duplicate shards appended)
    build_sketch_states_resumable(
        events, resumed, spark, specs, SHARD_BITS, "user_id"
    )
    assert _rows(spark.read.parquet(resumed)) == b


def test_resume_fresh_path(spark, events, tmp_path):
    """Resumable build against an absent sink is a plain full build."""
    path = str(tmp_path / "sink")
    specs = _specs()[:2]
    out = build_sketch_states_resumable(
        events, path, spark, specs, SHARD_BITS, "user_id"
    )
    assert out.count() == (1 << SHARD_BITS) * len(specs)


def test_mismatched_resume_raises(spark, events, tmp_path):
    """Layout/param drift between build and resume must fail loudly."""
    path = str(tmp_path / "sink")
    specs = _specs()[:2]
    build_sketch_states_resumable(events, path, spark, specs, SHARD_BITS, "user_id")
    with pytest.raises(ValueError, match="does not match"):
        build_sketch_states_resumable(
            events, path, spark, specs, SHARD_BITS + 1, "user_id"
        )
    with pytest.raises(ValueError, match="does not match"):
        build_sketch_states_resumable(events, path, spark, specs, SHARD_BITS, "id")
    changed = [SketchSpec("users_hll", "hll", "user_id", HllParams(p=10)), specs[1]]
    with pytest.raises(ValueError, match="does not match"):
        build_sketch_states_resumable(
            events, path, spark, changed, SHARD_BITS, "user_id"
        )


def test_partial_shard_raises(spark, events, tmp_path):
    """A shard missing some sketches (hand-edited / wrong-spec sink) is
    corrupt for resume and must raise, not silently duplicate."""
    path = str(tmp_path / "sink")
    specs = _specs()[:3]
    full = build_sketch_states(events, specs, SHARD_BITS, "user_id")
    damaged = full.filter(
        ~((F.col("shard") == 2) & (F.col("sketch") == "users_cms"))
    )
    write_sketch_states(damaged, path)
    with pytest.raises(ValueError, match="partial shards"):
        build_sketch_states_resumable(
            events, path, spark, specs, SHARD_BITS, "user_id"
        )


def test_estimates_match_single_pass_builders(spark, events):
    """Sharded-then-merged HLL/CMS states equal the single-pass builds
    exactly (order-independent adds), and quantile sketches land within
    published bounds of the exact quantiles."""
    specs = _specs()
    states = build_sketch_states(events, specs, SHARD_BITS, "user_id")
    merged = merge_sketch_states(states, specs)

    keys = events.filter(F.col("user_id").isNotNull()).select(
        F.xxhash64("user_id").alias("key")
    )
    hll_direct = build_hll(keys, params=HllParams(p=12))
    assert np.array_equal(merged["users_hll"].registers, hll_direct.registers)

    cms_direct = build_cms(keys, params=CmsParams(depth=4, width=1 << 12))
    assert np.array_equal(merged["users_cms"].table, cms_direct.table)

    vals = np.array(
        [
            r["value"]
            for r in events.filter(F.col("value").isNotNull()).collect()
        ]
    )
    for name in ("value_td", "value_kll"):
        est = merged[name].quantile(0.5)
        rank = float((vals <= est).mean())
        assert abs(rank - 0.5) < 0.05, (name, est, rank)

    # bloom: zero false negatives over every distinct inserted key
    distinct = np.array([r["key"] for r in keys.dropDuplicates().collect()])
    assert bool(merged["users_bloom"].contains(distinct).all())


def test_finish_is_distributed_and_deterministic(spark, events):
    specs = _specs()
    states = build_sketch_states(events, specs, SHARD_BITS, "user_id")
    fin1 = {
        (r["sketch"], r["stat"]): r["value"]
        for r in finish_sketch_states(states, specs).collect()
    }
    fin2 = {
        (r["sketch"], r["stat"]): r["value"]
        for r in finish_sketch_states(states, specs).collect()
    }
    assert fin1 == fin2
    exact_users = (
        events.filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    est = fin1[("users_hll", "n_distinct_est")]
    assert abs(est - exact_users) / exact_users <= 4 * 1.04 / np.sqrt(1 << 12)
    n_values = events.filter(F.col("value").isNotNull()).count()
    assert fin1[("value_td", "n")] == float(n_values)
    assert fin1[("value_kll", "n")] == float(n_values)
    # CMS row-sum is the exact total weight added
    assert fin1[("users_cms", "n_total")] == float(
        events.filter(F.col("user_id").isNotNull()).count()
    )


def test_lineage_metrics(spark, events):
    specs = _specs()[:3]
    states = build_sketch_states(events, specs, SHARD_BITS, "user_id")
    m = {r["sketch"]: r for r in sketch_sink_metrics(states).collect()}
    n_user_nulls = events.filter(F.col("user_id").isNull()).count()
    n_value_nulls = events.filter(F.col("value").isNull()).count()
    assert m["users_hll"]["n_rows"] == N - n_user_nulls
    assert m["users_hll"]["n_nulls"] == n_user_nulls
    assert m["value_td"]["n_rows"] == N - n_value_nulls
    assert m["value_td"]["n_nulls"] == n_value_nulls
    assert all(r["n_shards"] == (1 << SHARD_BITS) for r in m.values())
    # state sizes are the serialized artifacts, recorded per shard; the HLL
    # state serializes SPARSE here (each of the 8 shards sees ~190 of the
    # 1500 distinct users, far under the p=12 dense crossover of ~818
    # nonzero registers) — 5·(nnz+1) bytes, strictly under the 4096-byte
    # dense block a fixed-size state would ship
    hll_bytes = m["users_hll"]["max_state_bytes"]
    assert 0 < hll_bytes < (1 << 12) and hll_bytes % 5 == 0


def test_spec_validation():
    from sparkfuse.sketchsink import _validate_specs

    with pytest.raises(ValueError, match="bloom needs explicit params"):
        _validate_specs([SketchSpec("b", "bloom", "c")])
    with pytest.raises(ValueError, match="duplicate spec names"):
        _validate_specs(
            [SketchSpec("a", "hll", "c"), SketchSpec("a", "kll", "c")]
        )
    with pytest.raises(ValueError, match="unknown sketch kind"):
        _validate_specs([SketchSpec("a", "bogus", "c")])
    with pytest.raises(TypeError, match="params must be"):
        _validate_specs([SketchSpec("a", "hll", "c", KllParams())])


# ---------------------------------------------------------------------------
# streaming epoch sink
# ---------------------------------------------------------------------------


def _run_stream_once(spark, src, sink, ck, specs):
    from sparkfuse.sketchsink import stream_sketch_states

    stream = (
        spark.readStream.schema("id long, user_id long, value double")
        .parquet(f"{src}/batch_*")
    )
    q = stream_sketch_states(stream, sink, ck, specs, SHARD_BITS, "user_id")
    q.awaitTermination()


def test_stream_epoch_sink_matches_batch(spark, events, tmp_path):
    """Two micro-batch epochs finish to the same estimates as one batch
    build over the union — sketch merges are the algorithms' own defined
    op, so the epoch sink is lossless (unlike epoch-appended fuse filters,
    whose fpp compounds until compaction)."""
    from pyspark.sql import functions as F

    from sparkfuse.sketchsink import compact_sketch_states

    base = str(tmp_path)
    src, sink, ck = f"{base}/src", f"{base}/sink", f"{base}/ck"
    specs = _specs()
    events.filter(F.col("id") % 2 == 0).select("id", "user_id", "value").write.parquet(
        f"{src}/batch_a"
    )
    _run_stream_once(spark, src, sink, ck, specs)
    events.filter(F.col("id") % 2 == 1).select("id", "user_id", "value").write.parquet(
        f"{src}/batch_b"
    )
    _run_stream_once(spark, src, sink, ck, specs)

    epoch_sink = spark.read.parquet(sink)
    assert epoch_sink.select("epoch").distinct().count() == 2

    stream_fin = {
        (r["sketch"], r["stat"]): r["value"]
        for r in finish_sketch_states(epoch_sink, specs).collect()
    }
    batch_fin = {
        (r["sketch"], r["stat"]): r["value"]
        for r in finish_sketch_states(
            build_sketch_states(events, specs, SHARD_BITS, "user_id"), specs
        ).collect()
    }
    # order-independent kinds are EXACTLY the batch result
    for key in [
        ("users_hll", "n_distinct_est"),
        ("users_cms", "n_total"),
        ("users_bloom", "bits_set"),
    ]:
        assert stream_fin[key] == batch_fin[key], key
    # order-sensitive kinds keep exact counts and bounded quantiles
    assert stream_fin[("value_td", "n")] == batch_fin[("value_td", "n")]
    assert stream_fin[("value_kll", "n")] == batch_fin[("value_kll", "n")]
    vals = np.sort(
        np.array(
            [r["value"] for r in events.filter(F.col("value").isNotNull()).collect()]
        )
    )
    for name in ("value_td", "value_kll"):
        rank = float((vals <= stream_fin[(name, "q_0_5")]).mean())
        assert abs(rank - 0.5) < 0.05, (name, rank)

    # metrics over the epoch sink add up to the whole stream
    m = {r["sketch"]: r for r in sketch_sink_metrics(epoch_sink).collect()}
    n_user_nulls = events.filter(F.col("user_id").isNull()).count()
    assert m["users_hll"]["n_rows"] == N - n_user_nulls

    # compaction: bounded-cost sink, same estimates (exact for the
    # order-independent kinds), lineage preserved
    compacted = compact_sketch_states(spark, sink, f"{base}/compact", specs)
    assert "epoch" not in compacted.columns
    assert compacted.groupBy("shard", "sketch").count().filter("count > 1").count() == 0
    comp_fin = {
        (r["sketch"], r["stat"]): r["value"]
        for r in finish_sketch_states(compacted, specs).collect()
    }
    for key in [
        ("users_hll", "n_distinct_est"),
        ("users_cms", "n_total"),
        ("users_bloom", "bits_set"),
        ("value_td", "n"),
        ("value_kll", "n"),
    ]:
        assert comp_fin[key] == stream_fin[key], key
    mc = {r["sketch"]: r for r in sketch_sink_metrics(compacted).collect()}
    assert mc["users_hll"]["n_rows"] == m["users_hll"]["n_rows"]
    assert mc["users_hll"]["n_nulls"] == m["users_hll"]["n_nulls"]


def test_replayed_epoch_is_deduped(spark, events, tmp_path):
    """A replayed micro-batch appends byte-identical rows; every consumer
    must dedupe them or CMS/t-digest/KLL double-count."""
    from pyspark.sql import functions as F

    from sparkfuse.sketchsink import sketch_append_batch

    sink = str(tmp_path / "sink")
    specs = _specs()[:2]
    half = events.filter(F.col("id") % 2 == 0)
    sketch_append_batch(half, 7, sink, specs, SHARD_BITS, "user_id")
    once = {
        (r["sketch"], r["stat"]): r["value"]
        for r in finish_sketch_states(spark.read.parquet(sink), specs).collect()
    }
    sketch_append_batch(half, 7, sink, specs, SHARD_BITS, "user_id")  # replay
    assert spark.read.parquet(sink).count() == 2 * (1 << SHARD_BITS) * len(specs)
    twice = {
        (r["sketch"], r["stat"]): r["value"]
        for r in finish_sketch_states(spark.read.parquet(sink), specs).collect()
    }
    assert twice == once
    m = {r["sketch"]: r for r in sketch_sink_metrics(spark.read.parquet(sink)).collect()}
    assert m["users_cms"]["n_rows"] == half.filter(F.col("user_id").isNotNull()).count()


@pytest.mark.parametrize(
    "kind,col",
    [
        ("hll", "user_id"),
        ("cms", "user_id"),
        ("tdigest", "value"),
        ("kll", "value"),
        ("bloom", "user_id"),
        ("mg", "user_id"),
        ("theta", "user_id"),
    ],
)
def test_replay_dedup_pinned_for_every_kind(spark, events, tmp_path, kind, col):
    """Round-4 verdict Next #7: the (epoch, shard, sketch) dedup-on-replay
    guard must hold for ALL seven sink kinds — a replayed micro-batch leaves
    every finished statistic unchanged (CMS/t-digest/KLL/MG would
    double-count without the dedup; HLL/Bloom/theta are idempotent but the
    rows still must not inflate metrics)."""
    from sparkfuse.sketchsink import sketch_append_batch

    extra = {"bloom": BloomParams.for_capacity(N_USERS, 0.01)}
    spec = SketchSpec(
        f"s_{kind}",
        kind,
        col,
        extra.get(kind),
        quantiles=(0.5, 0.9) if kind in ("tdigest", "kll") else (),
    )
    sink = str(tmp_path / "sink")
    half = events.filter(F.col("id") % 2 == 0)
    sketch_append_batch(half, 7, sink, [spec], SHARD_BITS, "user_id")
    once = {
        (r["sketch"], r["stat"]): r["value"]
        for r in finish_sketch_states(spark.read.parquet(sink), [spec]).collect()
    }
    sketch_append_batch(half, 7, sink, [spec], SHARD_BITS, "user_id")  # replay
    assert spark.read.parquet(sink).count() == 2 * (1 << SHARD_BITS)
    twice = {
        (r["sketch"], r["stat"]): r["value"]
        for r in finish_sketch_states(spark.read.parquet(sink), [spec]).collect()
    }
    assert twice == once
    m = {r["sketch"]: r for r in sketch_sink_metrics(spark.read.parquet(sink)).collect()}
    assert m[f"s_{kind}"]["n_rows"] == half.filter(F.col(col).isNotNull()).count()


def test_batch_resume_on_epoch_sink_raises(spark, events, tmp_path):
    from sparkfuse.sketchsink import sketch_append_batch

    sink = str(tmp_path / "sink")
    specs = _specs()[:2]
    sketch_append_batch(events, 0, sink, specs, SHARD_BITS, "user_id")
    with pytest.raises(ValueError, match="streaming epoch sink"):
        build_sketch_states_resumable(
            events, sink, spark, specs, SHARD_BITS, "user_id"
        )


# ---------------------------------------------------------------------------
# sink-hygiene guards (review findings round 4)
# ---------------------------------------------------------------------------


def test_double_append_same_build_is_deduped(spark, events, tmp_path):
    """Appending the same batch build twice leaves finish/merge unchanged:
    byte-identical rows are deduped, never double-counted."""
    path = str(tmp_path / "sink")
    specs = _specs()[:3]
    once_states = build_sketch_states(events, specs, SHARD_BITS, "user_id")
    write_sketch_states(once_states, path)
    once = {
        (r["sketch"], r["stat"]): r["value"]
        for r in finish_sketch_states(spark.read.parquet(path), specs).collect()
    }
    write_sketch_states(once_states, path)  # accidental second append
    assert spark.read.parquet(path).count() == 2 * (1 << SHARD_BITS) * len(specs)
    twice = {
        (r["sketch"], r["stat"]): r["value"]
        for r in finish_sketch_states(spark.read.parquet(path), specs).collect()
    }
    assert twice == once
    merged = merge_sketch_states(spark.read.parquet(path), specs)
    assert float(merged["users_cms"].table[0].sum()) == once[("users_cms", "n_total")]


def test_conflicting_append_raises(spark, events, tmp_path):
    """Appending a DIFFERENT build under the same layout is corruption:
    merging consumers raise on the conflicting keys instead of silently
    double-counting."""
    path = str(tmp_path / "sink")
    specs = _specs()[:2]
    write_sketch_states(build_sketch_states(events, specs, SHARD_BITS, "user_id"), path)
    other = events.filter(F.col("id") % 2 == 0)
    write_sketch_states(build_sketch_states(other, specs, SHARD_BITS, "user_id"), path)
    with pytest.raises(Exception, match="CONFLICTING"):
        finish_sketch_states(spark.read.parquet(path), specs).collect()
    with pytest.raises(ValueError, match="CONFLICTING"):
        merge_sketch_states(spark.read.parquet(path), specs)


def test_resume_after_kill_before_first_commit(spark, events, tmp_path):
    """A sink dir containing only uncommitted droppings (_temporary/) must
    resume as a fresh build, not crash on schema inference."""
    import os

    path = str(tmp_path / "sink")
    os.makedirs(os.path.join(path, "_temporary"))
    with open(os.path.join(path, "_temporary", "part-stub"), "w") as f:
        f.write("junk")
    specs = _specs()[:2]
    out = build_sketch_states_resumable(
        events, path, spark, specs, SHARD_BITS, "user_id"
    )
    assert out.count() == (1 << SHARD_BITS) * len(specs)


def test_finish_with_wrong_specs_raises(spark, events):
    """Finishing a sink with a mismatched spec list fails with a clear
    driver-side error, not an executor-side KeyError."""
    specs = _specs()[:3]
    states = build_sketch_states(events, specs, SHARD_BITS, "user_id")
    with pytest.raises(ValueError, match="do not match"):
        finish_sketch_states(states, specs[:2]).collect()
    with pytest.raises(ValueError, match="do not match"):
        merge_sketch_states(states, specs[:2])


def test_nan_counts_as_null_in_lineage(spark):
    """NaN in a numeric column is skipped like NULL and counted in
    n_nulls, so n_rows + n_nulls always equals the input row count."""
    df = spark.range(300).select(
        F.col("id").alias("user_id"),
        F.when(F.col("id") % 3 == 0, F.lit(float("nan")))
        .when(F.col("id") % 5 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("id").cast("double"))
        .alias("value"),
    )
    specs = [SketchSpec("v_kll", "kll", "value", KllParams(k=64))]
    states = build_sketch_states(df, specs, 2, "user_id")
    m = sketch_sink_metrics(states).collect()[0]
    assert m["n_rows"] + m["n_nulls"] == 300
    n_bad = df.filter(F.isnan("value") | F.col("value").isNull()).count()
    assert m["n_nulls"] == n_bad


def test_mg_sink_kind_resume_and_candidates(spark, events, tmp_path):
    """Misra-Gries states are checkpointable like every other kind: resume
    is byte-identical, and the merged summary keeps the heavy-hitter
    presence guarantee."""
    from sparkfuse.sketches import MgParams

    specs = [
        SketchSpec("users_mg", "mg", "user_id", MgParams(capacity=2048)),
        SketchSpec("users_hll", "hll", "user_id", HllParams(p=12)),
    ]
    fresh = str(tmp_path / "fresh")
    resumed = str(tmp_path / "resumed")
    write_sketch_states(
        build_sketch_states(events, specs, SHARD_BITS, "user_id"), fresh
    )
    half = spark.read.parquet(fresh).filter(F.col("shard") % 2 == 1)
    write_sketch_states(half, resumed)
    build_sketch_states_resumable(events, resumed, spark, specs, SHARD_BITS, "user_id")
    assert _rows(spark.read.parquet(fresh)) == _rows(spark.read.parquet(resumed))

    merged = merge_sketch_states(spark.read.parquet(resumed), specs)
    mg = merged["users_mg"]
    assert mg.n == events.filter(F.col("user_id").isNotNull()).count()
    # capacity >= distinct users here, so no shrink ever happened and the
    # summary is EXACT counts per hashed key
    assert mg.dec == 0
    top = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    import numpy as np

    from sparkfuse.hashing import to_u64, xxh64_u64

    h = xxh64_u64(to_u64(np.array([top["user_id"]], dtype=np.int64)))
    assert int(mg.estimates(h)[0]) == top["count"]
    fin = {
        (r["sketch"], r["stat"]): r["value"]
        for r in finish_sketch_states(spark.read.parquet(resumed), specs).collect()
    }
    assert fin[("users_mg", "n")] == float(mg.n)
    assert fin[("users_mg", "dec")] == 0.0


def test_theta_sink_kind_and_set_expressions(spark, events, tmp_path):
    """Theta states are checkpointable and two sinks' merged sketches
    answer intersection/difference estimates across corpora."""
    from sparkfuse.theta import ThetaParams

    specs = [SketchSpec("u_theta", "theta", "user_id", ThetaParams(k=512))]
    path_a, path_b = str(tmp_path / "a"), str(tmp_path / "b")
    half_a = events.filter(F.col("id") % 2 == 0)
    half_b = events.filter(F.col("id") % 3 == 0)  # overlaps half_a on id%6==0
    write_sketch_states(build_sketch_states(half_a, specs, SHARD_BITS, "id"), path_a)
    write_sketch_states(build_sketch_states(half_b, specs, SHARD_BITS, "id"), path_b)
    a = merge_sketch_states(spark.read.parquet(path_a), specs)["u_theta"]
    b = merge_sketch_states(spark.read.parquet(path_b), specs)["u_theta"]
    exact_a = (
        half_a.filter(F.col("user_id").isNotNull()).select("user_id").distinct().count()
    )
    # distinct USERS overlap heavily between halves (same user universe)
    inter_exact = (
        half_a.select("user_id")
        .intersect(half_b.select("user_id"))
        .filter(F.col("user_id").isNotNull())
        .count()
    )
    assert abs(a.estimate() - exact_a) / exact_a < 0.2
    assert abs(a.intersect_estimate(b) - inter_exact) / max(inter_exact, 1) < 0.25
    fin = {
        (r["sketch"], r["stat"]): r["value"]
        for r in finish_sketch_states(spark.read.parquet(path_a), specs).collect()
    }
    assert abs(fin[("u_theta", "n_distinct_est")] - exact_a) / exact_a < 0.2
    # resume byte-identity holds for the new kind too
    resumed = str(tmp_path / "resumed")
    write_sketch_states(
        spark.read.parquet(path_a).filter(F.col("shard") % 2 == 0), resumed
    )
    build_sketch_states_resumable(half_a, resumed, spark, specs, SHARD_BITS, "id")
    assert _rows(spark.read.parquet(path_a)) == _rows(spark.read.parquet(resumed))
