"""Product-level transcript pipelines (BASELINE.json north_star surface).

Input shape (input_hint): a table of multi-turn conversation / agent
transcripts — (conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp) — Iceberg or parquet (sparkfuse.sources).

Key specs (SURVEY.md §1.3): a filter is built over a *key spec*, a named
projection of the transcript into u64 keys:

  conv      — xxhash64(conv_id)          : conversation membership
  text      — xxhash64(text)             : deduped-text membership
  turn      — xxhash64(conv_id, turn_idx): exact-turn membership
  turn_text — xxhash64(conv_id, turn_idx, text): per-turn text-equality
              (the per-row invariant vs the reference: per-turn text
              equality under stable turn ordering)

``probe_turns`` realizes the north_star's query contract: membership as a
broadcast-filter prescreen returning PER-TURN hits, exact-confirmed by
semi-join, with ``audit`` wiring the anti-join ground-truth sample check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkfuse.forest import Forest, build_forest
from sparkfuse.keys import dedup_keys
from sparkfuse.probe import approx_contains_udf, verify_sample

KEY_SPECS: dict[str, list[str]] = {
    "conv": ["conv_id"],
    "text": ["text"],
    "turn": ["conv_id", "turn_idx"],
    "turn_text": ["conv_id", "turn_idx", "text"],
}


def transcript_key(spec: str) -> Column:
    try:
        cols = KEY_SPECS[spec]
    except KeyError:
        raise ValueError(f"unknown key spec {spec!r}; one of {sorted(KEY_SPECS)}")
    return F.xxhash64(*cols)


def build_transcript_filter(
    transcripts: DataFrame,
    spec: str = "text",
    kind: str = "fuse",
    width: int = 8,
    shard_bits: int | None = None,
    pre_dedup: bool = True,
) -> Forest:
    """Build a membership forest over a transcript key spec.

    pre_dedup defaults ON here (unlike raw build_forest): transcript text is
    duplicate-heavy (boilerplate turns), so shrinking the shard shuffle via
    map-side dedup wins; the partial aggregate also absorbs hot-conv_id skew
    (PLANS.md §3).
    """
    keys = transcripts.select(transcript_key(spec).alias("key"))
    if pre_dedup:
        keys = dedup_keys(keys)
    return Forest.from_df(
        build_forest(
            keys, kind=kind, width=width, shard_bits=shard_bits, pre_dedup=False
        )
    )


def probe_turns(
    transcripts: DataFrame,
    forest: Forest,
    spec: str,
    build_side: DataFrame | None = None,
    spark=None,
    exact: bool = True,
) -> DataFrame:
    """Per-turn membership hits: every transcript row whose key-spec value is
    in the filter, with the full turn payload attached.

    exact=True (requires build_side, the transcript table the filter was
    built from): prescreen survivors are confirmed against the true key set
    via broadcast semi-join — exact results, oracle-checkable. exact=False:
    approximate hits only (zero FN, <=fpp extra rows) — no second table
    scan, the mode for cheap pre-filtering before an expensive join.
    """
    key = transcript_key(spec)
    pre = transcripts.filter(approx_contains_udf(forest, spark)(key))
    if not exact:
        return pre
    if build_side is None:
        raise ValueError("exact=True needs build_side for the confirm join")
    truth = build_side.select(transcript_key(spec).alias("_k")).dropDuplicates()
    return (
        pre.withColumn("_k", key)
        .join(truth, "_k", "left_semi")
        .drop("_k")
    )


def audit_filter(
    transcripts: DataFrame,
    forest: Forest,
    spec: str,
    build_side: DataFrame,
    spark=None,
    fraction: float = 0.05,
) -> dict:
    """North_star's 'verified against exact anti-join ground truth on a
    sample': returns {n, false_negatives (must be 0), false_positives, fpp}."""
    key = transcript_key(spec)
    probe_df = transcripts.select(key.alias("key"))
    build_df = build_side.select(key.alias("key"))
    return verify_sample(
        probe_df, "key", build_df, "key", forest, spark, fraction=fraction
    )


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation rollup (stable-turn-ordering invariant surface):
    n_turns, distinct roles, first/last ts, and a conversation content hash
    that is ORDER-INDEPENDENT-safe: bit_xor over per-turn hashes keyed by
    (conv_id, turn_idx, text), so any per-turn text change or reorder of
    turn_idx assignment changes it."""
    return transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.countDistinct("role").alias("n_roles"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.expr("bit_xor(xxhash64(conv_id, turn_idx, text))").alias("content_hash"),
    )


def curate_transcripts(
    transcripts: DataFrame,
    bench_df: DataFrame | None = None,
    bench_text: str = "text",
    holdout_fraction: float = 0.1,
    n: int = 13,
    spark=None,
) -> DataFrame:
    """Conversation-level curation over the input_hint transcript shape —
    the transcripts twin of ``pipeline.curate_documents``, composed from the
    library's own stages, all semantics SQL-replayable (the pytest oracle
    re-derives every kept conv_id and split assignment in DuckDB):

    1. EXACT conversation dedup: conversations with identical ordered
       content (texts in (turn_idx, text) order — conv_id-INDEPENDENT,
       unlike ``conversation_stats.content_hash`` which is keyed by
       conv_id) keep only the MIN conv_id. The dedup groups on
       ``md5(content)`` so the post-rollup shuffle carries 16-byte digests
       + conv_ids, never rolled-up conversation bodies. NULL-text turns
       are marked (chr(2)+text / chr(1) — the sampling._row_hash scheme)
       BEFORE the rollup: array_join/string_agg silently skip NULL
       elements, which would collide ['a', NULL] with ['a'] and silently
       drop a distinct conversation (round-5 review).
    2. DECONTAMINATION (optional): any conversation with ANY turn sharing
       a word ``n``-gram with ``bench_df`` is dropped whole — the
       fuse-prescreened exact check (``decontam.contamination_check``)
       keyed by conv_id.
    3. SPLIT: content-keyed train/holdout fence on conv_id
       (``sampling.split_by_hash``) — a conversation held out here is held
       out of every table sharing conv_id.

    Returns the curated TURNS (all original columns) plus a ``split``
    column ('train' | 'holdout').

    Scale shape: stage 1 is one shuffle of turns by conv_id (the rollup)
    plus a conv-granularity digest agg; stage 2 is the decontam plan
    (prescreen before the first exchange, PLANS.md §14); stage 3 is a
    stateless codegen filter. Nothing is driver-side; no stage is
    quadratic.
    """
    from sparkfuse.decontam import contamination_check
    from sparkfuse.sampling import holdout_flag

    if "_sf_marked_text" in transcripts.columns:
        raise ValueError("input already has a '_sf_marked_text' column (reserved)")
    marked = transcripts.withColumn(
        "_sf_marked_text",
        F.coalesce(F.concat(F.lit("\x02"), F.col("text")), F.lit("\x01")),
    )
    rolled = ordered_rollup(
        marked, "conv_id", ["turn_idx"], "_sf_marked_text", sep="\x1e"
    )
    keep = (
        rolled.select("conv_id", F.md5("content").alias("_digest"))
        .groupBy("_digest")
        .agg(F.min("conv_id").alias("conv_id"))
        .select("conv_id")
    )
    kept = transcripts.join(keep, "conv_id", "left_semi")
    if bench_df is not None:
        contaminated = contamination_check(
            kept, "conv_id", "text", bench_df, bench_text, n=n, spark=spark
        ).select("conv_id")
        kept = kept.join(contaminated, "conv_id", "left_anti")
    # ONE split expression, not two filtered branches unioned — the union
    # form executed the whole dedup/decontam DAG once per branch
    return kept.withColumn(
        "split",
        F.when(
            holdout_flag(["conv_id"], holdout_fraction), F.lit("holdout")
        ).otherwise(F.lit("train")),
    )


def ordered_rollup(
    df: DataFrame,
    part_col: str,
    order_cols: list[str],
    text_col: str,
    sep: str = "|",
) -> DataFrame:
    """Order-SENSITIVE rollup: per partition key, the texts concatenated in
    the total order given by ``order_cols`` — the north-star "per-turn text
    equality under stable turn ordering" invariant as a directly comparable
    value (any reorder, drop, or edit changes the string).

    collect_list's input order is nondeterministic, so determinism comes
    from sort_array over (order_cols..., text) structs — one codegen
    aggregation, no window function, no second shuffle. Note the text column
    itself is the final tie-breaker, so the result is deterministic even
    when order_cols are not a unique key; the SQL twin must therefore be
    ``string_agg(text, sep ORDER BY order_cols..., text)``.
    """
    struct = F.struct(
        *[F.col(c) for c in order_cols], F.col(text_col).alias("_t")
    )
    return df.groupBy(part_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(struct)), lambda s: s["_t"]
            ),
            sep,
        ).alias("content"),
    )
