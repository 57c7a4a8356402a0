"""Transcript product API + spark-submit job smoke (north_star surface)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkfuse.synth import synth_transcripts
from sparkfuse.transcripts import (
    audit_filter,
    build_transcript_filter,
    conversation_stats,
    conversation_validity,
    conversation_validity_oracle_sql,
    probe_turns,
)


@pytest.fixture(scope="module")
def tr(spark):
    df = synth_transcripts(spark, 5_000).cache()
    df.count()
    yield df
    df.unpersist()


def test_text_filter_per_turn_hits_exact(spark, tr):
    forest = build_transcript_filter(tr, spec="text", shard_bits=2)
    # probe the SAME table: every turn is a hit, payload intact
    hits = probe_turns(tr, forest, "text", build_side=tr, spark=spark)
    assert hits.count() == tr.count()
    assert set(hits.columns) == set(tr.columns)
    # probe disjoint texts: approximate mode keeps <= fpp extras
    other = tr.withColumn("text", F.concat(F.col("text"), F.lit("-nope")))
    approx = probe_turns(other, forest, "text", spark=spark, exact=False)
    assert approx.count() / tr.count() < 0.02
    # and exact mode removes them all
    exact = probe_turns(other, forest, "text", build_side=tr, spark=spark)
    assert exact.count() == 0


def test_conv_filter_membership(spark, tr):
    half = tr.filter(F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 0)
    forest = build_transcript_filter(half, spec="conv", shard_bits=1)
    hits = probe_turns(tr, forest, "conv", build_side=half, spark=spark)
    want = tr.join(half.select("conv_id").dropDuplicates(), "conv_id", "left_semi")
    assert hits.count() == want.count()


def test_audit_zero_false_negatives(spark, tr):
    forest = build_transcript_filter(tr, spec="turn_text", shard_bits=2)
    stats = audit_filter(tr, forest, "turn_text", tr, spark, fraction=1.0)
    assert stats["false_negatives"] == 0


def test_conversation_stats_invariant(spark, tr):
    stats = conversation_stats(tr)
    row = stats.orderBy(F.desc("n_turns")).first()
    assert row["n_turns"] >= 1 and row["n_roles"] >= 1
    # content hash reacts to any per-turn text change
    changed = tr.withColumn(
        "text",
        F.when(F.col("turn_idx") == 0, F.concat(F.col("text"), F.lit("!"))).otherwise(
            F.col("text")
        ),
    )
    a = {r["conv_id"]: r["content_hash"] for r in stats.collect()}
    b = {r["conv_id"]: r["content_hash"] for r in conversation_stats(changed).collect()}
    assert all(a[c] != b[c] for c in a)


_VALIDITY_PLANTED = [
    # well-formed: contiguous 0..2, alternating, starts with user
    ("ok", 0, "user", "hi", None),
    ("ok", 1, "assistant", "hello", None),
    ("ok", 2, "user", "bye", None),
    # gap in turn_idx (0, 2)
    ("gap", 0, "user", "a", None),
    ("gap", 2, "assistant", "b", None),
    # duplicate turn_idx (not contiguous: 2 distinct for 3 turns)
    ("dup", 0, "user", "x", None),
    ("dup", 1, "assistant", "y", None),
    ("dup", 1, "assistant", "z", None),
    # role repeat + empty/NULL texts + tool turns
    ("rep", 0, "assistant", "lead", None),
    ("rep", 1, "assistant", "  ", "search"),
    ("rep", 2, "tool", None, "search"),
    # single-turn conversation (the sequence(1, 0) guard)
    ("one", 0, "user", "solo", ""),
]


@pytest.fixture(scope="module")
def validity_df(spark):
    return spark.createDataFrame(
        [(c, i, r, t, tool) for c, i, r, t, tool in _VALIDITY_PLANTED],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )


def test_conversation_validity_planted(spark, validity_df):
    rows = {
        r["conv_id"]: r.asDict()
        for r in conversation_validity(validity_df).collect()
    }
    ok = rows["ok"]
    assert ok["n_turns"] == 3 and ok["turn_idx_contiguous"]
    assert ok["first_role"] == "user" and ok["n_role_repeats"] == 0
    assert ok["n_empty_turns"] == 0 and ok["n_tool_turns"] == 0
    assert not rows["gap"]["turn_idx_contiguous"]
    assert not rows["dup"]["turn_idx_contiguous"]
    rep = rows["rep"]
    assert rep["first_role"] == "assistant"
    assert rep["n_role_repeats"] == 1  # assistant,assistant then tool
    assert rep["n_empty_turns"] == 2  # whitespace-only + NULL
    assert rep["n_tool_turns"] == 2  # '' tool on 'one' does not count
    one = rows["one"]
    assert one["n_turns"] == 1 and one["turn_idx_contiguous"]
    assert one["n_role_repeats"] == 0 and one["n_tool_turns"] == 0


def _validity_twin(df, tmp_path):
    import duckdb
    import pandas as pd

    path = str(tmp_path / "tr.parquet")
    pdf = df.toPandas()
    # synth ts is datetime64; parquet-write flow matches FIXTURES gotcha
    pdf.to_parquet(path, index=False)
    con = duckdb.connect()
    con.sql(f"create view tr as select * from '{path}'")
    want = con.sql(conversation_validity_oracle_sql("tr")).df()
    got = conversation_validity(df).toPandas()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    got = got[cols].sort_values("conv_id").reset_index(drop=True)
    want = want[cols].sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_conversation_validity_matches_twin_planted(spark, validity_df, tmp_path):
    _validity_twin(validity_df, tmp_path)


def test_conversation_validity_matches_twin_synth(spark, tr, tmp_path):
    _validity_twin(tr.drop("ts"), tmp_path)


def test_spark_submit_job_and_resume(spark, tr, tmp_path):
    """Run the real spark-submit entry point (north_rule run mode), then
    re-run with --resume: idempotent completion, identical forest."""
    src = str(tmp_path / "transcripts")
    tr.write.parquet(src)
    out = str(tmp_path / "forest")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark_submit = os.path.join(
        os.path.dirname(os.path.dirname(sys.executable)), "bin", "spark-submit"
    )
    if not os.path.exists(spark_submit):
        import shutil

        spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not found"
    cmd = [
        spark_submit,
        "--master", "local[4]",
        "--py-files", f"{repo}/sparkfuse",
        f"{repo}/jobs/build_forest_job.py",
        "--input", src, "--output", out,
        "--spec", "text", "--shard-bits", "2", "--resume",
    ]
    env = dict(os.environ, PYTHONPATH=repo)
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=300, env=env)
    assert r1.returncode == 0, r1.stderr[-2000:]
    line = [l for l in r1.stdout.splitlines() if l.startswith("{")][-1]
    report = json.loads(line)
    assert report["n_shards"] == 4
    # resume run: nothing to rebuild, forest unchanged
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=300, env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 4  # no duplicate shards appended


def test_sketch_profile_job_and_resume(spark, tr, tmp_path):
    """Run the sketch-profile spark-submit entry point, then re-run with
    --resume: idempotent completion, identical finished estimates."""
    src = str(tmp_path / "transcripts_sk")
    tr.write.parquet(src)
    sink = str(tmp_path / "sketch_sink")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark_submit = os.path.join(
        os.path.dirname(os.path.dirname(sys.executable)), "bin", "spark-submit"
    )
    if not os.path.exists(spark_submit):
        import shutil

        spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not found"
    cmd = [
        spark_submit,
        "--master", "local[4]",
        "--py-files", f"{repo}/sparkfuse",
        f"{repo}/jobs/sketch_profile_job.py",
        "--input", src, "--sink", sink,
        "--key-col", "conv_id", "--value-col", "text_len",
        "--shard-bits", "3", "--resume",
    ]
    env = dict(os.environ, PYTHONPATH=repo)
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=300, env=env)
    assert r1.returncode == 0, r1.stderr[-2000:]
    rep1 = json.loads([l for l in r1.stdout.splitlines() if l.startswith("{")][-1])
    assert rep1["lineage"]["key_hll"]["n_shards"] == 8
    exact_convs = tr.select("conv_id").distinct().count()
    est = rep1["stats"]["key_hll.n_distinct_est"]
    assert abs(est - exact_convs) / exact_convs < 0.05
    assert rep1["stats"]["key_cms.n_total"] == tr.count()
    # resume run: nothing to rebuild, sink unchanged, same estimates
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=300, env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    rep2 = json.loads([l for l in r2.stdout.splitlines() if l.startswith("{")][-1])
    assert rep2["stats"] == rep1["stats"]
    assert rep2["lineage"] == rep1["lineage"]
    rows = spark.read.parquet(sink).groupBy("shard", "sketch").count().collect()
    assert all(r["count"] == 1 for r in rows)  # no duplicate appends


def test_curate_transcripts_full_duckdb_twin(spark, tr, tmp_path):
    """curate_transcripts vs a complete DuckDB re-derivation: conversation
    dedup by ordered content (conv_id-independent), whole-conversation
    decontamination vs a benchmark set, and the content-keyed split — every
    kept (conv_id, turn_idx, split) must match the SQL twin exactly."""
    import duckdb

    from sparkfuse.decontam import contamination_oracle_sql
    from sparkfuse.transcripts import curate_transcripts

    # plant exact-duplicate conversations under new (lexically later) ids
    some = [
        r["conv_id"]
        for r in tr.select("conv_id").distinct().orderBy("conv_id").limit(3).collect()
    ]
    dups = tr.filter(F.col("conv_id").isin(some)).withColumn(
        "conv_id", F.concat(F.lit("dup-"), F.col("conv_id"))
    )
    # plant the NULL-text collision hazard: ['hi', NULL] vs ['hi'] are
    # DISTINCT conversations and must both survive dedup (an unmarked
    # rollup silently collides them — round-5 review)
    nulls = spark.createDataFrame(
        [
            ("nul-a", 0, "user", "hi", "", None),
            ("nul-a", 1, "user", None, "", None),
            ("nul-b", 0, "user", "hi", "", None),
        ],
        schema=tr.schema,
    )
    planted = tr.unionByName(dups).unionByName(nulls)
    src = str(tmp_path / "turns")
    planted.write.mode("overwrite").parquet(src)
    planted = spark.read.parquet(src)  # same bytes both engines

    # benchmark set: the >=13-token turns of one kept conversation
    bench_conv = some[1]
    bench = planted.filter(
        (F.col("conv_id") == bench_conv) & (F.size(F.split("text", " ")) >= 13)
    ).select("text")
    assert bench.count() > 0

    got = sorted(
        (r["conv_id"], r["turn_idx"], r["split"])
        for r in curate_transcripts(
            planted, bench_df=bench, holdout_fraction=0.25, spark=spark
        ).collect()
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW tr_all AS SELECT * FROM '{src}/*.parquet'")
    con.execute(
        "CREATE VIEW kept_turns AS "
        "WITH rolled AS (SELECT conv_id, "
        "string_agg(coalesce(chr(2) || text, chr(1)), chr(30) "
        "ORDER BY turn_idx, coalesce(chr(2) || text, chr(1))) AS content "
        "FROM tr_all GROUP BY conv_id), "
        "keep AS (SELECT MIN(conv_id) AS conv_id FROM rolled GROUP BY content) "
        "SELECT * FROM tr_all WHERE conv_id IN (SELECT conv_id FROM keep)"
    )
    bench_sql = (
        f"SELECT text FROM tr_all WHERE conv_id = '{bench_conv}' "
        "AND len(string_split(text, ' ')) >= 13"
    )
    contam = contamination_oracle_sql("kept_turns", "conv_id", "text", bench_sql, "text")
    threshold = int(0.25 * 16**8)
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"SELECT conv_id, turn_idx, CASE WHEN CAST(('0x' || substr(md5("
            "concat_ws(chr(31), '0', chr(2) || conv_id)), 1, 8)) AS BIGINT) "
            f"< {threshold} THEN 'holdout' ELSE 'train' END AS split "
            f"FROM kept_turns WHERE conv_id NOT IN "
            f"(SELECT conv_id FROM ({contam}) _)"
        ).fetchall()
    )
    assert got == want
    # the planted duplicate conversations were deduped away...
    kept_convs = {c for c, _, _ in got}
    assert not any(c.startswith("dup-") for c in kept_convs)
    # ...the NULL-text conversation pair stays DISTINCT (both kept)...
    assert "nul-a" in kept_convs and "nul-b" in kept_convs
    # ...the benchmark conversation was decontaminated away...
    assert bench_conv not in kept_convs
    # ...and both splits are non-empty (content-keyed fence applied)
    splits = {s for _, _, s in got}
    assert splits == {"train", "holdout"}


def test_curate_transcripts_validity_gate(spark, tmp_path):
    """The optional stage-0 validity gate: malformed conversations drop
    BEFORE dedup (a malformed conversation must never win the MIN-conv_id
    canonical race against its well-formed duplicate), and the whole gated
    pipeline is re-derived in DuckDB via conversation_validity_oracle_sql
    + the same dedup/split twins."""
    import duckdb

    from sparkfuse.transcripts import (
        conversation_validity_oracle_sql,
        curate_transcripts,
    )

    rows = [
        # 'a-bad' duplicates 'b-good' content but has a turn_idx gap; it
        # sorts FIRST, so without the gate it would become the canonical
        ("a-bad", 0, "user", "hello", None, None),
        ("a-bad", 2, "assistant", "world", None, None),
        ("b-good", 0, "user", "hello", None, None),
        ("b-good", 1, "assistant", "world", None, None),
        # role-repeat offender (2 adjacent same-role pairs)
        ("c-rep", 0, "user", "x", None, None),
        ("c-rep", 1, "user", "y", None, None),
        ("c-rep", 2, "user", "z", None, None),
        # empty-turn offender (2 blank turns)
        ("d-empty", 0, "user", " ", None, None),
        ("d-empty", 1, "assistant", None, None, None),
        ("d-empty", 2, "user", "ok", None, None),
        # clean conversation
        ("e-ok", 0, "user", "fine", None, None),
        ("e-ok", 1, "assistant", "good", None, None),
    ]
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, extra string"
    )
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "turns")
    df.write.mode("overwrite").parquet(src)
    df = spark.read.parquet(src)

    out = curate_transcripts(
        df,
        holdout_fraction=0.25,
        require_contiguous=True,
        max_role_repeats=1,
        max_empty_turns=1,
    )
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["split"]) for r in out.collect()
    )
    kept = {c for c, _, _ in got}
    # the well-formed duplicate is the canonical; offenders are gone
    assert kept == {"b-good", "e-ok"}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW tr_all AS SELECT * FROM '{src}/*.parquet'")
    val = conversation_validity_oracle_sql("tr_all")
    threshold = int(0.25 * 16**8)
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
WITH valid AS (
  SELECT conv_id FROM ({val}) v
  WHERE v.turn_idx_contiguous AND v.n_role_repeats <= 1
    AND v.n_empty_turns <= 1
), gated AS (
  SELECT * FROM tr_all WHERE conv_id IN (SELECT conv_id FROM valid)
), rolled AS (
  SELECT conv_id,
    string_agg(coalesce(chr(2) || text, chr(1)), chr(30)
               ORDER BY turn_idx, coalesce(chr(2) || text, chr(1))) AS content
  FROM gated GROUP BY conv_id
), keep AS (SELECT MIN(conv_id) AS conv_id FROM rolled GROUP BY content)
SELECT conv_id, turn_idx,
  CASE WHEN CAST(('0x' || substr(md5(concat_ws(chr(31), '0',
       chr(2) || conv_id)), 1, 8)) AS BIGINT) < {threshold}
       THEN 'holdout' ELSE 'train' END AS split
FROM gated WHERE conv_id IN (SELECT conv_id FROM keep)
"""
        ).fetchall()
    )
    assert got == want


def test_curate_transcripts_redact_before_dedup(spark, tmp_path):
    """redact=True: conversations differing only in the PII they carry
    become duplicates (the min conv_id survives with redacted turns), and
    the redacted pipeline matches the composed DuckDB twin inline-expr
    for inline-expr."""
    import duckdb

    from sparkfuse.redact import redact_expr_sql
    from sparkfuse.transcripts import curate_transcripts

    rows = [
        ("p-one", 0, "user", "mail me at alice@example.com please", None, None),
        ("p-one", 1, "assistant", "done", None, None),
        ("p-two", 0, "user", "mail me at bob@other.org please", None, None),
        ("p-two", 1, "assistant", "done", None, None),
        ("q-solo", 0, "user", "nothing sensitive here", None, None),
    ]
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, extra string"
    )
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "turns")
    df.write.mode("overwrite").parquet(src)
    df = spark.read.parquet(src)

    out = curate_transcripts(df, holdout_fraction=0.25, redact=True)
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["text"], r["split"])
        for r in out.collect()
    )
    kept = {c for c, _, _, _ in got}
    assert kept == {"p-one", "q-solo"}  # p-two deduped after redaction
    assert all(
        "<EMAIL>" in t for c, _, t, _ in got if c == "p-one" and "mail" in t
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW tr_all AS SELECT * FROM '{src}/*.parquet'")
    red = redact_expr_sql("text")
    threshold = int(0.25 * 16**8)
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
WITH redacted AS (
  SELECT conv_id, turn_idx, {red} AS text FROM tr_all
), rolled AS (
  SELECT conv_id,
    string_agg(coalesce(chr(2) || text, chr(1)), chr(30)
               ORDER BY turn_idx, coalesce(chr(2) || text, chr(1))) AS content
  FROM redacted GROUP BY conv_id
), keep AS (SELECT MIN(conv_id) AS conv_id FROM rolled GROUP BY content)
SELECT conv_id, turn_idx, text,
  CASE WHEN CAST(('0x' || substr(md5(concat_ws(chr(31), '0',
       chr(2) || conv_id)), 1, 8)) AS BIGINT) < {threshold}
       THEN 'holdout' ELSE 'train' END AS split
FROM redacted WHERE conv_id IN (SELECT conv_id FROM keep)
"""
        ).fetchall()
    )
    assert got == want
