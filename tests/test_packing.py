"""Sequence packing (sparkfuse.packing) — plan invariants, the DuckDB
global-window twin (mirrored in the entry contract), determinism, and the
physical-plan shape that makes the two-level prefix sum scale."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkfuse.packing import pack_documents, pack_fill_stats

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def plan512(spark, docs):
    return pack_documents(docs, 512).toPandas()


def _ntok(text: str) -> int:
    import re

    return len(re.split(r"[ \t\n\r\f]+", text.strip()))


def test_every_doc_fully_placed(spark, docs, plan512):
    ref = {
        r["doc_id"]: _ntok(r["text"])
        for r in docs.select("doc_id", "text").collect()
        if r["text"] is not None
    }
    got = plan512.groupby("doc_id")["take"].sum().to_dict()
    expect = {d: n for d, n in ref.items() if n > 0}
    assert got == expect


def test_packs_tile_without_gap_or_overlap(plan512):
    for pid, grp in plan512.groupby("pack_id"):
        spans = sorted(zip(grp["start_in_pack"], grp["take"]))
        cursor = 0
        for start, take in spans:
            assert start == cursor, (pid, start, cursor)
            assert take > 0
            cursor = start + take
        assert cursor <= 512


def test_all_packs_full_except_last(spark, docs):
    fills = pack_fill_stats(pack_documents(docs, 512), 512).toPandas()
    last = fills["pack_id"].max()
    assert set(fills["pack_id"]) == set(range(int(last) + 1))
    not_last = fills[fills["pack_id"] != last]
    assert bool(not_last["is_full"].all())
    assert (not_last["fill"] == 512).all()


def test_boundary_docs_split_with_consistent_offsets(plan512):
    multi = plan512.groupby("doc_id").filter(lambda g: len(g) > 1)
    assert len(multi) > 0, "fixture too small: no doc crosses a pack boundary"
    for did, grp in multi.groupby("doc_id"):
        grp = grp.sort_values("pack_id")
        assert list(grp["pack_id"]) == list(
            range(int(grp["pack_id"].min()), int(grp["pack_id"].max()) + 1)
        )
        # doc offsets chain: each continuation starts where the previous cut
        assert grp["offset_in_doc"].iloc[0] == 0
        np.testing.assert_array_equal(
            grp["offset_in_doc"].to_numpy()[1:],
            (grp["offset_in_doc"] + grp["take"]).to_numpy()[:-1],
        )
        # continuations start at pack position 0
        assert (grp["start_in_pack"].to_numpy()[1:] == 0).all()


def test_deterministic_and_bucket_width_invariant(spark, docs, plan512):
    again = pack_documents(docs, 512).toPandas()
    cols = ["doc_id", "pack_id", "start_in_pack", "offset_in_doc", "take"]
    a = plan512[cols].sort_values(cols).reset_index(drop=True)
    b = again[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    # the bucketed prefix sum is an implementation detail: 16 buckets and
    # 4096 buckets must produce the identical global plan
    for chars in (1, 3):
        c = (
            pack_documents(docs, 512, bucket_chars=chars)
            .toPandas()[cols]
            .sort_values(cols)
            .reset_index(drop=True)
        )
        assert a.equals(c), f"bucket_chars={chars} changed the plan"


def test_n_tokens_override_and_tiny_seq_len(spark):
    df = spark.createDataFrame(
        [(i, "x") for i in range(10)], "doc_id long, text string"
    )
    out = pack_documents(
        df, 3, n_tokens=F.lit(2)
    ).toPandas()  # 10 docs x 2 tokens into packs of 3: every odd doc splits
    assert out["take"].sum() == 20
    fills = out.groupby("pack_id")["take"].sum()
    assert (fills[fills.index != fills.index.max()] == 3).all()
    with pytest.raises(ValueError, match="seq_len"):
        pack_documents(df, 0)
    with pytest.raises(ValueError, match="bucket_chars"):
        pack_documents(df, 3, bucket_chars=9)


def test_null_and_empty_docs_are_dropped(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "d")], "doc_id long, text string"
    )
    out = pack_documents(df, 4).toPandas()
    assert set(out["doc_id"]) == {1, 3}
    # zero-token override rows drop too
    out2 = pack_documents(
        df.filter("text is not null"),
        4,
        n_tokens=F.when(F.col("doc_id") == 3, 0).otherwise(2),
    ).toPandas()
    assert set(out2["doc_id"]) == {1}


def test_plan_shape_is_the_scalable_one(spark, docs):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pack_documents(docs, 512).explain("extended")
    plan = buf.getvalue()
    # the big window runs partitioned by bucket, never as a global sort
    assert "hashpartitioning(bucket" in plan
    # the bucket-base table comes back as a broadcast, not a shuffle join
    assert "BroadcastHashJoin" in plan
    # exactly one single-partition window exists: the 256-row base ladder
    assert plan.count("SinglePartition") <= 2  # its exchange (+AQE echo)
