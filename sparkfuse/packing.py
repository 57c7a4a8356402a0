"""Sequence packing for training-data pipelines: concat-and-chunk documents
into fixed-length token sequences, distributed.

The op every pretraining pipeline runs last: lay all documents end-to-end
in a deterministic order and cut the stream into ``seq_len``-token packs,
splitting boundary documents across neighbouring packs. The output is the
PLAN — one row per (document, pack) with exact offsets — not materialized
token arrays: at 100 TB the tokens stay where they are and the plan drives
the writer.

Why this shape scales (the naive formulations don't):

  * A global running sum (``SUM(n) OVER (ORDER BY k)``) is correct but
    plans as a SINGLE-partition window — one task sorts the whole corpus.
    ``pack_documents`` computes the identical prefix sum in two levels:
    the order key is an md5 hex string, so its first two hex chars are 256
    uniform buckets whose STRING order is a prefix of the global order;
    a window partitioned by bucket gives in-bucket prefix sums (one
    shuffle, 256-way parallel sort), and the 256 bucket totals get their
    own (tiny) running sum and come back as a broadcast join. Global
    position = bucket base + in-bucket prefix. Raise ``bucket_chars`` to 3
    (4096 buckets) when a bucket's rows stop fitting a task's sort buffer.
  * Everything is JVM codegen: md5, the token count, two window sums, a
    broadcast hash join, ``sequence``+``explode`` for boundary splits. No
    Python in the path, nothing driver-side beyond the 256-row base table.
  * Determinism is the md5 key (the same engine-portable construction as
    ``sampling.deterministic_sample``): both the pack assignment AND the
    document mixing are reproducible run-over-run and engine-over-engine
    — the DuckDB oracle recomputes the whole plan with one global window.

Semantics: documents with NULL text or zero tokens are dropped (they
occupy no stream positions). Every other doc covers global token span
[S, S+n); pack p (0-based) covers [p*L, (p+1)*L); the emitted row for
(doc, p) carries where the doc's slice lands in the pack and where it
starts inside the doc. Invariants (pinned in tests/test_packing.py):
per-doc takes sum to n; every pack except the last is exactly full; pack
slices tile [0, fill) with no gap or overlap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkfuse.textops import tokens_col


def pack_documents(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens: Column | None = None,
    bucket_chars: int = 2,
) -> DataFrame:
    """Pack plan: one row per (document, pack) — columns (id_col, pack_id,
    start_in_pack, offset_in_doc, take). ``n_tokens`` overrides the default
    whitespace token count (``textops.tokens_col`` — the engine-portable
    ``[ \\t\\n\\r\\f]+`` class) with any long Column, e.g. a real tokenizer's
    precomputed counts. ``bucket_chars`` hex chars of the md5 order key
    form the parallel prefix-sum buckets (2 → 256, 3 → 4096)."""
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    if not 1 <= bucket_chars <= 4:
        raise ValueError("bucket_chars must be in 1..4")
    n = (
        n_tokens.cast("long")
        if n_tokens is not None
        else F.size(tokens_col(text_col)).cast("long")
    )
    k = F.md5(F.col(id_col).cast("string"))
    base = (
        df.filter(F.col(text_col).isNotNull() if n_tokens is None else F.lit(True))
        .select(F.col(id_col), k.alias("k"), n.alias("n"))
        .filter(F.col("n") > 0)
        .withColumn("bucket", F.substring("k", 1, bucket_chars))
    )

    # level 1: in-bucket prefix sums (one shuffle; per-bucket sort)
    w_in = Window.partitionBy("bucket").orderBy("k", id_col)
    pos = base.withColumn("s_in", F.sum("n").over(w_in) - F.col("n"))

    # level 2: running bucket bases — bucket count is tiny and bounded, so
    # the unpartitioned window is a deliberate 256-row driver-scale step,
    # broadcast back (the bucket string order IS the global key order
    # because the bucket is a prefix of the key)
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        base.groupBy("bucket")
        .agg(F.sum("n").alias("bn"))
        .select(
            "bucket",
            F.coalesce(F.sum("bn").over(w_b), F.lit(0)).alias("bucket_base"),
        )
    )
    pos = pos.join(F.broadcast(bases), "bucket").withColumn(
        "s", F.col("bucket_base") + F.col("s_in")
    )

    # boundary split: doc spans packs s//L .. (s+n-1)//L (n>0 ⇒ non-empty)
    L = F.lit(int(seq_len))
    pos = pos.select(
        F.col(id_col),
        F.col("n"),
        F.col("s"),
        F.explode(
            F.sequence(
                F.expr(f"s div {int(seq_len)}"),
                F.expr(f"(s + n - 1) div {int(seq_len)}"),
            )
        ).alias("pack_id"),
    )
    lo = F.greatest(F.col("s"), F.col("pack_id") * L)
    return pos.select(
        F.col(id_col),
        F.col("pack_id"),
        (lo - F.col("pack_id") * L).alias("start_in_pack"),
        (lo - F.col("s")).alias("offset_in_doc"),
        (F.least(F.col("s") + F.col("n"), (F.col("pack_id") + 1) * L) - lo).alias(
            "take"
        ),
    )


def pack_fill_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """Per-pack fill audit over a ``pack_documents`` plan: (pack_id, n_docs,
    fill, is_full). Every pack except the highest pack_id must be exactly
    full — the cheap global invariant a 100-TB run can assert before
    shipping the plan to the writer."""
    return (
        packed.groupBy("pack_id")
        .agg(F.count("*").alias("n_docs"), F.sum("take").alias("fill"))
        .withColumn("is_full", F.col("fill") == F.lit(int(seq_len)))
    )
