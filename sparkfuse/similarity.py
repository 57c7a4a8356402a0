"""Embedding similarity search over an ``array<float>`` column.

Ladder:
  cosine_pairs / knn_topk — exact brute force, cosine computed JVM-side
    (zip_with + aggregate fold, inside codegen; cast to double so the DuckDB
    oracle's arithmetic matches).
  ann_lsh_topk — the scale path: random-hyperplane (sign) LSH buckets the
    vectors, candidates re-ranked exactly within buckets. Recall is
    pytest-verified against the brute-force op; no SQL oracle (bucketing
    hashes are engine-internal).

At 100 TB the brute-force crossJoin is the *rerank* primitive, never the
candidate generator: LSH (or an IVF coarse quantizer over kmeans centroids)
bounds candidates per query, and the rerank join broadcasts the query set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def with_norm(df: DataFrame, vec_col: str, out: str = "_norm") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn(out, F.sqrt(_dot(v, v)))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return _dot(_as_double(a), _as_double(b)) / (norm_a * norm_b)


def _rerank(cand: DataFrame, base: DataFrame, k: int) -> DataFrame:
    """Exact cosine rerank of (query_id, _id) candidate pairs against the
    vector table, with the deterministic cross-engine ranking contract:
    (round(cos, 6) DESC, neighbor id ASC). Shared by knn/LSH/IVF so the
    contract lives in exactly one place."""
    vec = with_norm(base, "_v")
    qv = vec.select(
        F.col("_id").alias("query_id"),
        F.col("_v").alias("_vq"),
        F.col("_norm").alias("_nq"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(vec, "_id")
        .withColumn(
            "score",
            F.round(cosine(F.col("_vq"), F.col("_v"), F.col("_nq"), F.col("_norm")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", F.col("_id").alias("neighbor_id"), "score")
    )


def cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """Exact all-pairs with cosine >= threshold (id_a < id_b) — the
    embedding-space near-duplicate operator. The comparison uses
    ``round(cos, 6)`` so the result SET is identical across engines (same
    determinism contract as knn_topk), making the brute-force SQL twin a
    valid oracle. O(n^2) — bound n upstream (bucket/broadcast) at scale;
    ``ann_lsh_topk``/``ivf_topk`` are the candidate-bounded paths.
    """
    base = with_norm(df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")), "_v")
    a = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col("_norm").alias("_na"))
    b = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_norm").alias("_nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        # zero-norm vectors have no direction: without the norm guards their
        # cosine is 0/0 = NaN, and NaN >= threshold is TRUE under Spark's
        # (and DuckDB's) NaN-is-greatest ordering — every vector would pair
        # with them
        .filter((F.col("_na") > 0) & (F.col("_nb") > 0))
        .withColumn(
            "cos",
            F.round(cosine(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")), 6),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )


def cosine_pairs_oracle_sql(
    table: str, id_col: str, vec_col: str, threshold: float
) -> str:
    """DuckDB twin of cosine_pairs (same round-to-6 determinism contract)."""
    return f"""
WITH base AS (
  SELECT {id_col} AS _id, {vec_col}::DOUBLE[] AS _v,
         sqrt(list_inner_product({vec_col}::DOUBLE[], {vec_col}::DOUBLE[])) AS _n
  FROM {table}
)
SELECT a._id AS id_a, b._id AS id_b
FROM base a JOIN base b ON a._id < b._id
WHERE a._n > 0 AND b._n > 0
  AND round(list_inner_product(a._v, b._v) / (a._n * b._n), 6) >= {threshold}
"""


def knn_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).

    Deterministic ranking: (round(cos, 6) DESC, neighbor id ASC) — rounding
    makes the order (and therefore the result SET) identical across engines
    despite last-ulp float differences. Query side is broadcast: the join is
    a map-side crossJoin of |queries| x n, not a shuffle.
    """
    base = with_norm(df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")), "_v")
    queries = base.filter(F.col("_id").isin(list(query_ids))).select(
        F.col("_id").alias("query_id"),
        F.col("_v").alias("_vq"),
        F.col("_norm").alias("_nq"),
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(base)
        .filter(F.col("_id") != F.col("query_id"))
        .withColumn(
            "score",
            F.round(cosine(F.col("_vq"), F.col("_v"), F.col("_nq"), F.col("_norm")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", F.col("_id").alias("neighbor_id"), "score")
    )


def knn_topk_oracle_sql(table: str, id_col: str, vec_col: str, query_ids, k: int = 5) -> str:
    ids = ", ".join(str(int(i)) for i in query_ids)
    return f"""
WITH base AS (
  SELECT {id_col} AS _id, {vec_col}::DOUBLE[] AS _v,
         sqrt(list_inner_product({vec_col}::DOUBLE[], {vec_col}::DOUBLE[])) AS _n
  FROM {table}
),
scored AS (
  SELECT q._id AS query_id, b._id AS neighbor_id,
         round(list_inner_product(q._v, b._v) / (q._n * b._n), 6) AS score
  FROM base q JOIN base b ON b._id != q._id
  WHERE q._id IN ({ids})
)
SELECT query_id, neighbor_id, score FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) <= {k}
"""


def kmeans_centroids(
    df: DataFrame, id_col: str, vec_col: str,
    n_centroids: int = 16, sample: int = 4096, iters: int = 10, seed: int = 11,
) -> np.ndarray:
    """Deterministic coarse quantizer for IVF: Lloyd's k-means on a driver
    sample (first ``sample`` rows by id — deterministic, no RNG in the
    sample). Returns (n_centroids, dim) float64."""
    rows = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(sample)
        .collect()
    )
    x = np.stack([np.asarray(r["_v"], dtype=np.float64) for r in rows])
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def kmeans_centroids_distributed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    iters: int = 10,
    seed: int = 11,
) -> np.ndarray:
    """Distributed Lloyd's k-means — the SCALE path for the IVF coarse
    quantizer. ``kmeans_centroids`` trains on a bounded driver sample
    (fine when the sample represents the distribution); this trains on the
    FULL table with the library's true-UDAF shape: per iteration, ONE
    ``mapInPandas`` pass assigns every vector to its nearest centroid and
    emits per-PARTITION partial (cluster, sum, count) states — P x C tiny
    rows, never the vectors — a C-group ``applyInPandas`` reduces them to
    C rows, and the driver folds those KBs into the next centroid set.
    Nothing vector-sized ever shuffles or reaches the driver.

    Deterministic, content-keyed: init is the ``n_centroids`` vectors with
    the smallest ``xxhash64(id + seed)`` (no RNG, partitioning-
    independent); partial sums reduce in sorted (cluster, partition-id)
    order so float addition order is stable for a fixed input
    partitioning. Empty clusters keep their previous centroid (the
    standard Lloyd's fix). Returns (n_centroids, dim) float64."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    spark = df.sparkSession
    base = df.select(
        F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v")
    )
    init_rows = (
        base.orderBy(F.xxhash64(F.col("_id") + F.lit(seed)), F.col("_id"))
        .limit(n_centroids)
        .collect()
    )
    centroids = np.stack([np.asarray(r["_v"], dtype=np.float64) for r in init_rows])
    part_schema = StructType(
        [
            StructField("part", LongType()),
            StructField("cluster", LongType()),
            StructField("vsum", ArrayType(DoubleType())),
            StructField("n", LongType()),
        ]
    )
    red_schema = StructType(
        [
            StructField("cluster", LongType()),
            StructField("vsum", ArrayType(DoubleType())),
            StructField("n", LongType()),
        ]
    )

    def reduce_cluster(key, pdf):
        ordered = pdf.sort_values("part")  # fixed float fold order
        arr = np.stack([np.asarray(v, dtype=np.float64) for v in ordered["vsum"]])
        return pd.DataFrame(
            {
                "cluster": [int(key[0])],
                "vsum": [arr.sum(axis=0)],
                "n": [int(ordered["n"].sum())],
            }
        )

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(centroids)

        def partials(batches):
            from pyspark import TaskContext

            cents = bc.value
            sums = np.zeros_like(cents)
            counts = np.zeros(len(cents), dtype=np.int64)
            for pdf in batches:
                vecs = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
                )
                d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                assign = d.argmin(axis=1)
                for c in np.unique(assign):
                    m = assign == c
                    sums[c] += vecs[m].sum(axis=0)
                    counts[c] += int(m.sum())
            pid = TaskContext.get().partitionId()
            yield pd.DataFrame(
                {
                    "part": np.full(len(cents), pid, dtype=np.int64),
                    "cluster": np.arange(len(cents), dtype=np.int64),
                    "vsum": list(sums),
                    "n": counts,
                }
            )

        reduced = (
            base.mapInPandas(partials, part_schema)
            .groupBy("cluster")
            .applyInPandas(reduce_cluster, red_schema)
            .collect()
        )
        new = centroids.copy()
        for r in reduced:
            if r["n"] > 0:
                new[int(r["cluster"])] = (
                    np.asarray(r["vsum"], dtype=np.float64) / r["n"]
                )
        centroids = new
        bc.destroy()
    return centroids


def ivf_candidates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 11,
    train: str = "sample",
) -> DataFrame:
    """(query_id, _id) candidate pairs from the IVF coarse quantizer: each
    query scans only its n_probe nearest k-means buckets. Exposed separately
    so candidate-set size (the whole point of IVF) is testable.

    ``train="sample"`` (default) fits the quantizer on a bounded driver
    sample; ``train="full"`` runs distributed Lloyd's over the whole table
    (``kmeans_centroids_distributed``) — the 100-TB path, where a fixed
    sample can miss whole regions of the embedding space."""
    if train == "full":
        centroids = kmeans_centroids_distributed(
            df, id_col, vec_col, n_centroids, seed=seed
        )
    elif train == "sample":
        centroids = kmeans_centroids(df, id_col, vec_col, n_centroids, seed=seed)
    else:
        raise ValueError(f"train must be 'sample' or 'full', got {train!r}")

    def assign_kernel(batches):
        for pdf in batches:
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            )
            d = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame(
                {"_id": pdf["_id"].to_numpy(), "bucket": d.argmin(axis=1)}
            )

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("_id", LongType(), True), StructField("bucket", LongType(), True)]
    )
    base = df.select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v"))
    buckets = base.mapInPandas(assign_kernel, schema)

    # query -> its n_probe nearest buckets (tiny; computed on the driver)
    qrows = base.filter(F.col("_id").isin(list(query_ids))).collect()
    probe_pairs = []
    for r in qrows:
        v = np.asarray(r["_v"], dtype=np.float64)
        d = ((centroids - v) ** 2).sum(axis=1)
        for b in np.argsort(d)[:n_probe]:
            probe_pairs.append((int(r["_id"]), int(b)))
    spark = df.sparkSession
    qb = spark.createDataFrame(probe_pairs, "query_id long, bucket long")

    return (
        F.broadcast(qb)
        .join(buckets, "bucket")
        .filter(F.col("_id") != F.col("query_id"))
        .select("query_id", "_id")
        .dropDuplicates()
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 11,
    train: str = "sample",
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) search: a k-means coarse
    quantizer buckets the vectors; each query scans only its ``n_probe``
    nearest buckets, reranked exactly. The classic ANN scale path when the
    embedding space is clustered (LSH needs no training; IVF adapts to the
    data distribution). Recall pytest-verified against knn_topk.
    ``train="full"`` trains the quantizer distributed over the whole table
    (see ``ivf_candidates``)."""
    cand = ivf_candidates(
        df, id_col, vec_col, query_ids, n_centroids, n_probe, seed, train=train
    )
    base = df.select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v"))
    return _rerank(cand, base, k)


def _lsh_bucket_table(
    base: DataFrame, n_planes: int, n_tables: int, dim: int, seed: int
) -> DataFrame:
    """Sign-LSH bucket assignments (melted): (_id, t, h) — one row per
    (vector, hash table). Hyperplanes are generated from a fixed seed on the
    driver and ship via closure (tiny: n_tables·n_planes·dim doubles) —
    deterministic. Shared by ``ann_lsh_topk`` (query-vs-table join) and
    ``cosine_lsh_pairs`` (self-join)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim)).astype(np.float64)

    def bucket_kernel(batches):
        for pdf in batches:
            vecs = np.stack(pdf["_v"].to_numpy())
            out = {"_id": pdf["_id"].to_numpy()}
            for t in range(n_tables):
                signs = (vecs @ planes[t].T) > 0  # (n, planes)
                codes = (signs * (1 << np.arange(n_planes))).sum(axis=1)
                out[f"bk{t}"] = codes.astype(np.int64)
            yield pd.DataFrame(out)

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("_id", LongType(), True)]
        + [StructField(f"bk{t}", LongType(), True) for t in range(n_tables)]
    )
    buckets = base.mapInPandas(bucket_kernel, schema)
    return buckets.select(
        "_id",
        F.explode(
            F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"bk{t}").alias("h"))
                      for t in range(n_tables)])
        ).alias("bk"),
    ).select("_id", "bk.t", "bk.h")


def cosine_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 7,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate PAIRS at scale: sign-LSH candidate generation
    + exact round-6 cosine verification — the embedding twin of
    ``minhash_lsh_candidates``, and the scale path that ``cosine_pairs``
    (exact all-pairs crossJoin) is not.

    Plan: bucket every vector into n_tables sign-LSH tables (one Arrow pass),
    self-join buckets on (table, code) → candidate pairs O(near-dups +
    bucket collisions), never O(n²) → join vectors back and verify with the
    EXACT cosine contract of ``cosine_pairs`` (round 6, zero-norm guard), so
    every emitted pair is a true pair. Recall < 1 (a pair is missed iff it
    collides in no table): P(emit) = 1 - (1 - p^planes)^tables with
    p = 1 - acos(cos)/π — defaults (8×8) give ≥0.93 at cos 0.90, ≥0.9997 at
    cos 0.97; raise n_tables for more recall, n_planes for fewer candidates.
    Skew note: an LSH bucket holding d vectors emits d(d-1)/2 candidates —
    AQE's skew-join split handles hot buckets (same lever as hot shingles in
    ngram_jaccard_pairs; duplicate-heavy corpora should exact-dedup first).
    ``max_bucket_size`` additionally DROPS buckets above that size before
    the self-join (the minhash_lsh_candidates analog): a pair is lost only
    if every table bucket it shares is oversized; off by default.
    """
    # cast("long") matches ann_lsh_topk: the bucket kernel's Arrow schema
    # declares _id long, so non-integer id columns fail there mid-job —
    # casting up front keeps the scale path drop-in for any integer id type
    base = with_norm(
        df.select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v")),
        "_v",
    )
    melted = _lsh_bucket_table(
        base.select("_id", "_v"), n_planes, n_tables, dim, seed
    )
    if max_bucket_size is not None:
        from sparkfuse.keys import cap_group_size

        melted = cap_group_size(melted, ["t", "h"], max_bucket_size)
    a = melted.select(F.col("_id").alias("id_a"), "t", "h")
    b = melted.select(F.col("_id").alias("id_b"), "t", "h")
    cand = (
        a.join(b, ["t", "h"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    va = base.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col("_norm").alias("_na")
    )
    vb = base.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_norm").alias("_nb")
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .filter((F.col("_na") > 0) & (F.col("_nb") > 0))
        .withColumn(
            "cos",
            F.round(cosine(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")), 6),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )


def ann_lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: sign-LSH (random hyperplanes) bucketing + exact
    rerank inside buckets. n_tables independent hash tables union their
    candidates (recall knob).

    Parameter note: P(bucket collision) = (1 - acos(cos)/pi)^n_planes per
    table; defaults (4 planes x 8 tables) target the ~0.5-cosine neighbor
    regime (~0.83 recall). For tightly-clustered embeddings raise n_planes
    to shrink candidate sets.
    """
    base = df.select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v"))
    melted = _lsh_bucket_table(base, n_planes, n_tables, dim, seed)
    qb = melted.filter(F.col("_id").isin(list(query_ids))).select(
        F.col("_id").alias("query_id"), "t", "h"
    )
    cand = (
        F.broadcast(qb)
        .join(melted, ["t", "h"])
        .filter(F.col("_id") != F.col("query_id"))
        .select("query_id", "_id")
        .dropDuplicates()
    )
    return _rerank(cand, base, k)
