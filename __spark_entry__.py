"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator from SURVEY.md §2 exposed as an
*exact* query (fuse/xor/bloom prescreen + exact-confirm join), so a plain
ANSI-SQL oracle is valid (FIXTURES.md F5). Filter-quality metrics (fpp, bpe,
zero-FN) are asserted separately in pytest against the F2/F3 fixtures.
"""

from __future__ import annotations

import os as _os
import sys as _sys
from collections.abc import Callable

# make sparkfuse importable by this driver AND by Spark python workers of a
# session created after this import, regardless of the harness cwd
_REPO = _os.path.dirname(_os.path.abspath(__file__))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)
from sparkfuse.session import export_repo_pythonpath as _export

_export()

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfuse.bloom import build_bloom
from sparkfuse.forest import Forest, build_forest
from sparkfuse.probe import exact_anti_join, exact_member_semi_join


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _forest_over(df: DataFrame, col: str, **kw) -> Forest:
    return Forest.from_df(build_forest(df.select(F.col(col).alias("key")), **kw))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact membership via sharded fuse8 forest prescreen +
    exact-confirm semi-join — customers that have orders, sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    forest = _forest_over(orders, "o_custkey", kind="fuse", width=8, shard_bits=2)
    return exact_member_semi_join(
        customer, "c_custkey", orders, "o_custkey", forest, spark
    ).select("c_custkey", "c_name", "c_acctbal")


# ---------------------------------------------------------------------------
# query suite
# ---------------------------------------------------------------------------

def q_fuse8_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3 probe + C4 build, exact mode: customers having orders (fuse8)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    forest = _forest_over(orders, "o_custkey", kind="fuse", width=8, shard_bits=2)
    return exact_member_semi_join(
        customer, "c_custkey", orders, "o_custkey", forest, spark
    ).select("c_custkey")


def q_fuse16_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fuse16 (C4, width 16): parts that appear in lineitem."""
    part = _t(spark, sf_dir, "part")
    lineitem = _t(spark, sf_dir, "lineitem")
    forest = _forest_over(lineitem, "l_partkey", kind="fuse", width=16, shard_bits=1)
    return exact_member_semi_join(
        part, "p_partkey", lineitem, "l_partkey", forest, spark
    ).select("p_partkey")


def q_fuse32_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fuse32 (C4, width 32): suppliers that appear in lineitem."""
    supplier = _t(spark, sf_dir, "supplier")
    lineitem = _t(spark, sf_dir, "lineitem")
    forest = _forest_over(lineitem, "l_suppkey", kind="fuse", width=32, shard_bits=0)
    return exact_member_semi_join(
        supplier, "s_suppkey", lineitem, "l_suppkey", forest, spark
    ).select("s_suppkey")


def q_xor8_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xor8 (C1 Populate + P1 Contains), exact mode: orders by customers
    in the 'BUILDING' market segment."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    seg = customer.filter(F.col("c_mktsegment") == "BUILDING")
    forest = _forest_over(seg, "c_custkey", kind="xor", width=8, shard_bits=0)
    return exact_member_semi_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"), "c_custkey",
        seg, "c_custkey", forest, spark,
    ).select("o_orderkey")


def q_xor16_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xor16 (width-generalized C1): lineitems of high-value orders."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    big = orders.filter(F.col("o_totalprice") > 200000.0)
    forest = _forest_over(big, "o_orderkey", kind="xor", width=16, shard_bits=0)
    return exact_member_semi_join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey",
        big, "o_orderkey", forest, spark,
    ).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))


def q_fuse4wise_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-wise binary fuse (C7 4-arity formulas): events of users that placed
    a 'purchase' event."""
    events = _t(spark, sf_dir, "events")
    purchasers = events.filter(F.col("event_type") == "purchase")
    forest = _forest_over(
        purchasers, "user_id", kind="fuse", width=8, arity=4, shard_bits=1
    )
    return (
        exact_member_semi_join(events, "user_id", purchasers, "user_id", forest, spark)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def q_anti_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact NON-membership via prescreen + anti-join: customers with no
    high-value (>400k) order (filter-negative ⇒ definitely absent,
    zero-FN invariant)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 400000.0)
    forest = _forest_over(big, "o_custkey", kind="fuse", width=8, shard_bits=2)
    return exact_anti_join(
        customer, "c_custkey", big, "o_custkey", forest, spark
    ).select("c_custkey")


def q_bloom_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Bloom baseline (tree OR-merge UDAF), exact mode: same
    semantics as q_fuse8_members."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    bloom = build_bloom(orders.select(F.col("o_custkey").alias("key")), fpp=0.01)
    bc = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def maybe(keys):
        return pd.Series(bc.value.contains(keys.to_numpy()))

    # keep the prescreen on the probe side only (see PLANS.md §2)
    maybe = maybe.asNondeterministic()
    pre = customer.filter(maybe(F.col("c_custkey")))
    build_keys = orders.select(F.col("o_custkey").alias("c_custkey")).dropDuplicates()
    return pre.join(build_keys, "c_custkey", "left_semi").select("c_custkey")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup (C9 pruneDuplicates at table scale): canonical doc
    per distinct text (min doc_id), via partial+final hash aggregate."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id")


def q_forest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-side lineage surface (C12 retry budget / metrics): the forest's
    per-shard nkeys lineage sums to the exact distinct key count — the
    in-kernel dedup (C9) is exact."""
    orders = _t(spark, sf_dir, "orders")
    forest_df = build_forest(
        orders.select(F.col("o_custkey").alias("key")), shard_bits=2
    )
    return forest_df.agg(F.sum("nkeys").alias("nkeys"))


def q_tok_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (training-pipeline text analysis), pure codegen."""
    from sparkfuse.textops import token_stats

    return token_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer quality features for document filtering."""
    from sparkfuse.textops import quality_stats

    return quality_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stopword-vote language heuristic."""
    from sparkfuse.textops import lang_id

    return lang_id(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-group dedup: canonical event per distinct props payload
    (shuffles 8-byte hashes, not bodies)."""
    from sparkfuse.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "events"), "event_id", "props").select(
        F.col("event_id")
    )


def q_ngram_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-duplicate pairs: shingle inverted-index join + integer
    Jaccard >= 1/2 (the oracle is brute-force all-pairs)."""
    from sparkfuse.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for query vectors 0..9 (broadcast
    crossJoin + window; deterministic rounding/tiebreak)."""
    from sparkfuse.similarity import knn_topk

    return knn_topk(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", list(range(10)), k=5
    )


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate near-dup candidates via banded minhash-LSH (scale path;
    recall pytest-verified against q_ngram_near_dups — no SQL oracle)."""
    from sparkfuse.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash document fingerprints (numpy kernel; rows-only check)."""
    from sparkfuse.textops import simhash64

    return simhash64(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors via sign-LSH + exact rerank (rows-only;
    recall pytest-verified against q_knn_topk)."""
    from sparkfuse.similarity import ann_lsh_topk

    return ann_lsh_topk(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", list(range(10)), k=5
    )


def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog count-distinct over events.user_id (north_rule
    sketch family; rows-only check — pytest asserts the 1.04/sqrt(m) bound)."""
    from sparkfuse.sketches import build_hll

    events = _t(spark, sf_dir, "events")
    hll = build_hll(events.select(F.col("user_id").alias("key")))
    return spark.createDataFrame(
        [(int(round(hll.estimate())), hll.params.m)], "estimate long, m long"
    )


def q_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Count-Min point estimates for users 0..9 (rows-only check;
    pytest asserts the eps*N overcount bound and never-undercount)."""
    from sparkfuse.sketches import build_cms

    events = _t(spark, sf_dir, "events")
    cms = build_cms(events.select(F.col("user_id").alias("key")))
    import numpy as np

    est = cms.query(np.arange(10, dtype=np.uint64))
    return spark.createDataFrame(
        [(i, int(est[i])) for i in range(10)], "user_id long, est_events long"
    )


def q_tdigest_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable t-digest quantiles of o_totalprice (rows-only check;
    pytest asserts rank error < 1% vs exact)."""
    from sparkfuse.tdigest import build_tdigest

    orders = _t(spark, sf_dir, "orders")
    td = build_tdigest(orders.select(F.col("o_totalprice").alias("value")))
    qs = [0.1, 0.5, 0.9, 0.99]
    return spark.createDataFrame(
        [(q, float(td.quantile(q))) for q in qs], "q double, est double"
    )


def q_kll_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KLL quantiles of events.value (rows-only; pytest asserts
    the O(1/k) rank-error bound vs exact)."""
    from sparkfuse.kll import build_kll

    events = _t(spark, sf_dir, "events")
    s = build_kll(events.select(F.col("value")), "value")
    qs = [0.1, 0.5, 0.9]
    return spark.createDataFrame(
        [(q, float(s.quantile(q))) for q in qs], "q double, est double"
    )


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors via IVF (k-means coarse quantizer +
    bucket-bounded exact rerank; rows-only, recall pytest-verified)."""
    from sparkfuse.similarity import ivf_topk

    return ivf_topk(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        list(range(10)), k=5, n_centroids=8, n_probe=3,
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "fuse8_members": q_fuse8_members,
    "fuse16_members": q_fuse16_members,
    "fuse32_members": q_fuse32_members,
    "xor8_members": q_xor8_members,
    "xor16_members": q_xor16_members,
    "fuse4wise_members": q_fuse4wise_members,
    "anti_members": q_anti_members,
    "bloom_members": q_bloom_members,
    "dedup_exact": q_dedup_exact,
    "forest_stats": q_forest_stats,
    "tok_stats": q_tok_stats,
    "quality_stats": q_quality_stats,
    "lang_id": q_lang_id,
    "dedup_fingerprint": q_dedup_fingerprint,
    "ngram_near_dups": q_ngram_near_dups,
    "knn_topk": q_knn_topk,
    "minhash_lsh_candidates": q_minhash_lsh,
    "simhash_fingerprints": q_simhash,
    "ann_lsh_topk": q_ann_topk,
    "hll_distinct_users": q_hll_distinct_users,
    "cms_user_counts": q_cms_user_counts,
    "tdigest_price_quantiles": q_tdigest_price_quantiles,
    "kll_event_values": q_kll_event_values,
    "ivf_ann_topk": q_ivf_topk,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return {
        "fuse8_members": (
            "SELECT c_custkey FROM customer "
            "WHERE c_custkey IN (SELECT o_custkey FROM orders)"
        ),
        "fuse16_members": (
            "SELECT p_partkey FROM part "
            "WHERE p_partkey IN (SELECT l_partkey FROM lineitem)"
        ),
        "fuse32_members": (
            "SELECT s_suppkey FROM supplier "
            "WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)"
        ),
        "xor8_members": (
            "SELECT o_orderkey FROM orders WHERE o_custkey IN "
            "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')"
        ),
        "xor16_members": (
            "SELECT l_orderkey AS o_orderkey, COUNT(*) AS n_lines FROM lineitem "
            "WHERE l_orderkey IN "
            "(SELECT o_orderkey FROM orders WHERE o_totalprice > 200000.0) "
            "GROUP BY l_orderkey"
        ),
        "fuse4wise_members": (
            "SELECT user_id, COUNT(*) AS n_events FROM events "
            "WHERE user_id IN "
            "(SELECT user_id FROM events WHERE event_type = 'purchase') "
            "GROUP BY user_id"
        ),
        "anti_members": (
            "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)"
        ),
        "bloom_members": (
            "SELECT c_custkey FROM customer "
            "WHERE c_custkey IN (SELECT o_custkey FROM orders)"
        ),
        "dedup_exact": (
            "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"
        ),
        "forest_stats": "SELECT COUNT(DISTINCT o_custkey) AS nkeys FROM orders",
        "tok_stats": (
            "SELECT doc_id, "
            "len(string_split_regex(trim(text), '\\s+')) AS n_tokens, "
            "length(text) AS n_chars_text FROM documents"
        ),
        "quality_stats": (
            "SELECT doc_id, len(ts) AS n_tokens, "
            "len(list_distinct(ts)) AS n_uniq_tokens, "
            "list_max(list_transform(ts, t -> length(t))) AS max_token_len, "
            "len(list_intersect(list_distinct(ts), "
            "['the','a','and','of','to','is','in','that'])) AS n_stopword_kinds, "
            "length(text) AS n_chars_text FROM "
            "(SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS ts "
            "FROM documents)"
        ),
        "lang_id": _lang_id_oracle(),
        "dedup_fingerprint": (
            "SELECT MIN(event_id) AS event_id FROM events GROUP BY props"
        ),
        "ngram_near_dups": _ngram_oracle(),
        "knn_topk": _knn_oracle(),
        # minhash_lsh_candidates / simhash_fingerprints / ann_lsh_topk are
        # intentionally absent: approximate operators whose hashes are not
        # SQL-expressible; the driver records rows-only checks, and pytest
        # verifies them against the exact twins above
        # (tests/test_pipeline_ops.py).
    }


def _lang_id_oracle() -> str:
    from sparkfuse.textops import lang_id_oracle_sql

    return lang_id_oracle_sql("documents", "doc_id", "text")


def _ngram_oracle() -> str:
    from sparkfuse.dedup import ngram_jaccard_pairs_oracle_sql

    return ngram_jaccard_pairs_oracle_sql("documents", "doc_id", "text")


def _knn_oracle() -> str:
    from sparkfuse.similarity import knn_topk_oracle_sql

    return knn_topk_oracle_sql("embeddings", "vec_id", "embedding", list(range(10)), k=5)
