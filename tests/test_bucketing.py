"""Bucketed co-located joins: exchange-count guarantees + exactness."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkfuse.bucketing import bucketed_semi_join, exchange_count, write_bucketed_keys

N_KEYS = 100_000
N_BUCKETS = 8


@pytest.fixture(scope="module")
def corpus_table(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    keys = spark.range(N_KEYS).select(
        F.xxhash64("id").alias("key")
    )
    name = "sf_test_corpus_keys"
    write_bucketed_keys(
        keys, "key", name, str(base / "corpus"), N_BUCKETS
    )
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_corpus_join_has_no_corpus_exchange(spark, corpus_table, tmp_path):
    """Ad-hoc probe side: exactly ONE exchange (the probe side, hashed to
    the corpus bucket layout); the corpus scan satisfies the distribution
    from the catalog and never shuffles."""
    probes = spark.range(5_000).select(F.xxhash64(F.col("id") * 3).alias("key"))
    joined = bucketed_semi_join(spark, probes, "key", corpus_table)
    assert exchange_count(joined) == 1
    # exactness vs numpy ground truth
    corpus_keys = np.array(
        [r["key"] for r in spark.table(corpus_table).collect()], dtype=np.int64
    )
    probe_keys = np.array([r["key"] for r in probes.collect()], dtype=np.int64)
    expected = set(probe_keys[np.isin(probe_keys, corpus_keys)].tolist())
    got = {r["key"] for r in joined.collect()}
    assert got == expected


def test_cobucketed_join_is_fully_shuffle_free(spark, corpus_table, tmp_path):
    """Probe side bucketed on the same key with the same bucket count:
    ZERO exchanges — the co-located join the task brief names."""
    probes = spark.range(40_000).select(
        F.xxhash64(F.when(F.col("id") % 2 == 0, F.col("id")).otherwise(-F.col("id"))).alias("key")
    )
    probe_table = "sf_test_probe_keys"
    write_bucketed_keys(
        probes, "key", probe_table, str(tmp_path / "probes"), N_BUCKETS
    )
    try:
        joined = bucketed_semi_join(
            spark, spark.table(probe_table), "key", corpus_table
        )
        assert exchange_count(joined) == 0
        assert joined.count() == spark.table(probe_table).join(
            spark.table(corpus_table), "key", "left_semi"
        ).count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {probe_table}")


def test_plain_parquet_same_join_pays_two_exchanges(spark, corpus_table, tmp_path):
    """Counter-evidence: identical data written as PLAIN parquet (no bucket
    metadata) plans the same merge semi-join with an exchange on BOTH
    sides — the repeated cost the bucketed corpus removes."""
    plain = str(tmp_path / "plain")
    spark.table(corpus_table).write.mode("overwrite").parquet(plain)
    probes = spark.range(5_000).select(F.xxhash64(F.col("id") * 3).alias("key"))
    joined = probes.join(
        spark.read.parquet(plain).hint("merge"), "key", "left_semi"
    )
    assert exchange_count(joined) == 2


def test_bucketed_semi_join_rejects_unknown_key(spark, corpus_table):
    """A typo'd probe key must raise, never silently join against another
    corpus column (round-5 review: the old fallback picked columns[0])."""
    probes = spark.range(10).select(F.xxhash64("id").alias("gram"))
    with pytest.raises(ValueError, match="bucket column"):
        bucketed_semi_join(spark, probes, "gram", corpus_table)


def test_bucketed_write_is_one_file_per_bucket(spark, corpus_table):
    """The pre-write repartition keeps file count == bucket count (an
    unclustered input writes up to tasks x buckets small files)."""
    import glob

    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {corpus_table}").collect()
    location = next(
        r["data_type"] for r in rows if (r["col_name"] or "").strip() == "Location"
    )
    path = location.replace("file:", "")
    files = [
        f for f in glob.glob(f"{path}/*") if not f.split("/")[-1].startswith(("_", "."))
    ]
    assert len(files) == N_BUCKETS, sorted(files)


def test_bucketed_confirm_composes_with_prescreen(spark, corpus_table):
    """The packaged composition (exact_member_bucketed): fuse prescreen ->
    bucketed exact confirm. Zero false negatives end-to-end, and the plan
    keeps only the probe-side exchange."""
    from sparkfuse.bucketing import exact_member_bucketed
    from sparkfuse.forest import Forest, build_forest

    corpus = spark.table(corpus_table)
    forest = Forest.from_df(build_forest(corpus, shard_bits=2))
    probes = spark.range(20_000).select(F.xxhash64(F.col("id") * 5).alias("key"))
    confirmed = exact_member_bucketed(probes, "key", corpus_table, forest, spark)
    assert exchange_count(confirmed) == 1
    true_members = probes.join(corpus, "key", "left_semi")
    assert {r["key"] for r in confirmed.collect()} == {
        r["key"] for r in true_members.collect()
    }


def test_append_preserves_bucket_layout_and_membership(spark, tmp_path):
    """Delta appends keep the bucket layout (joins stay probe-side-only
    exchange) and appended keys become members; a mismatched bucket spec
    fails loudly instead of corrupting the layout."""
    from sparkfuse.bucketing import append_bucketed_keys

    name = "sf_test_append_corpus"
    base = spark.range(10_000).select(F.xxhash64("id").alias("key"))
    delta = spark.range(10_000, 12_000).select(F.xxhash64("id").alias("key"))
    write_bucketed_keys(base, "key", name, str(tmp_path / "corpus"), N_BUCKETS)
    try:
        append_bucketed_keys(delta, "key", name, N_BUCKETS)
        probes = spark.range(9_000, 12_000).select(F.xxhash64("id").alias("key"))
        joined = bucketed_semi_join(spark, probes, "key", name)
        assert exchange_count(joined) == 1  # corpus side still exchange-free
        assert joined.count() == 3_000  # old AND appended keys are members
        with pytest.raises(Exception, match="[Bb]ucket"):
            append_bucketed_keys(delta, "key", name, N_BUCKETS * 2)
        with pytest.raises(ValueError, match="does not exist"):
            append_bucketed_keys(delta, "key", "sf_no_such_table", N_BUCKETS)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
