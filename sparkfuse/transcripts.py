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


def conversation_validity(transcripts: DataFrame) -> DataFrame:
    """Per-conversation structural well-formedness — the measurements a
    transcript-curation job gates malformed conversations on (training on
    a conversation with shuffled/missing turns or collapsed role
    alternation corrupts the chat template downstream):

      n_turns              BIGINT
      turn_idx_contiguous  BOOLEAN  turn_idx values are exactly 0..n-1
                                    (the sorted index sequence compared
                                    to ``sequence(0, n-1)`` — duplicates
                                    or gaps both fail)
      first_role           STRING   role of the first turn (deterministic:
                                    the (turn_idx, role) struct sort
                                    tie-breaks a duplicated first turn_idx
                                    lexicographically — both engines
                                    compare strings as binary UTF-8)
      n_role_repeats       BIGINT   adjacent same-role pairs in
                                    (turn_idx, role) order (0 = strict
                                    alternation)
      n_empty_turns        BIGINT   NULL or whitespace-only text
      n_tool_turns         BIGINT   non-null, non-empty tool

    Policy (which combinations to drop) stays with the caller, like
    ``textops.quality_stats``.

    Scale shape: ONE shuffle on conv_id, one plain hash aggregation (the
    contiguity check reads the sorted struct array instead of a
    countDistinct, which would plan a second distinct-aggregate pass).
    The scalar columns partial-aggregate map-side; the (turn_idx, role)
    sequence rides a collect_list bounded by conversation length — the
    same in-buffer assumption ``ordered_rollup`` makes (conversations
    are bounded; corpora are not)."""
    n = F.count(F.lit(1))
    empty = F.col("text").isNull() | (F.trim(F.col("text")) == "")
    tool_turn = F.col("tool").isNotNull() & (F.col("tool") != "")
    agged = transcripts.groupBy("conv_id").agg(
        n.alias("n_turns"),
        F.sort_array(F.collect_list(F.struct("turn_idx", "role"))).alias("_seq"),
        F.sum(empty.cast("long")).alias("n_empty_turns"),
        F.sum(tool_turn.cast("long")).alias("n_tool_turns"),
    )
    seq = F.col("_seq")
    roles = F.transform(seq, lambda s: s["role"])
    idxs = F.transform(seq, lambda s: s["turn_idx"])
    # adjacent pairs via zip_with (all subexpressions are HOF CHILDREN —
    # an expression captured in a lambda body re-evaluates per element;
    # see repetition._grams_col). zip_with pads the shorter side with
    # NULL, so the 1-turn conversation yields (role, NULL) -> NULL ->
    # filtered: no descending-sequence or ANSI element_at guard needed.
    shifted = F.slice(roles, 2, F.greatest(F.size(roles) - 1, F.lit(0)))
    adjacent_same = F.size(
        F.filter(
            F.zip_with(roles, shifted, lambda a, b: a == b), lambda x: x
        )
    )
    return agged.select(
        "conv_id",
        "n_turns",
        (idxs == F.sequence(F.lit(0), F.size(seq) - 1)).alias(
            "turn_idx_contiguous"
        ),
        F.element_at(roles, 1).alias("first_role"),
        adjacent_same.cast("long").alias("n_role_repeats"),
        "n_empty_turns",
        "n_tool_turns",
    )


def conversation_validity_oracle_sql(table: str) -> str:
    """DuckDB twin of ``conversation_validity`` (role sequence via
    ``list(role ORDER BY turn_idx, role)`` — the same (turn_idx, role)
    total order the Spark side sorts structs by)."""
    return f"""
SELECT conv_id,
  CAST(n_turns AS BIGINT) AS n_turns,
  (min_idx = 0 AND max_idx = n_turns - 1 AND n_idx = n_turns)
    AS turn_idx_contiguous,
  roles[1] AS first_role,
  CAST(len(list_filter(generate_series(1, len(roles) - 1),
       i -> roles[i] = roles[i + 1])) AS BIGINT) AS n_role_repeats,
  CAST(n_empty_turns AS BIGINT) AS n_empty_turns,
  CAST(n_tool_turns AS BIGINT) AS n_tool_turns
FROM (
  SELECT conv_id, COUNT(*) AS n_turns,
    MIN(turn_idx) AS min_idx, MAX(turn_idx) AS max_idx,
    COUNT(DISTINCT turn_idx) AS n_idx,
    list(role ORDER BY turn_idx, role) AS roles,
    SUM(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END)
      AS n_empty_turns,
    SUM(CASE WHEN tool IS NOT NULL AND tool <> '' THEN 1 ELSE 0 END)
      AS n_tool_turns
  FROM {table} GROUP BY conv_id)
"""


def curate_transcripts(
    transcripts: DataFrame,
    bench_df: DataFrame | None = None,
    bench_text: str = "text",
    holdout_fraction: float = 0.1,
    n: int = 13,
    spark=None,
    require_contiguous: bool = False,
    max_role_repeats: int | None = None,
    max_empty_turns: int | None = None,
    redact: bool = False,
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

    ``redact=True`` applies turn-level PII redaction (sparkfuse.redact)
    before EVERYTHING — like ``curate_documents(redact=True)``, two
    conversations differing only in the PII they carry must become
    duplicates, so redaction precedes the content digest (and the
    decontamination n-grams run over redacted turns, matching what the
    curated corpus will actually train on). One codegen projection.

    Stage 0 (optional, off by default): VALIDITY GATE via
    ``conversation_validity`` — ``require_contiguous=True`` drops
    conversations whose turn_idx values are not exactly 0..n-1 (gaps AND
    duplicates), ``max_role_repeats``/``max_empty_turns`` bound adjacent
    same-role pairs and blank/NULL turns. The gate runs BEFORE dedup on
    purpose: a malformed conversation must never win the MIN-conv_id
    canonical race against its well-formed duplicate (pinned in tests).

    Returns the curated TURNS (all original columns) plus a ``split``
    column ('train' | 'holdout').

    Scale shape: stage 0 is one conv_id aggregation (scalars partial-agg
    map-side) + a semi join; stage 1 is one shuffle of turns by conv_id
    (the rollup) plus a conv-granularity digest agg; stage 2 is the
    decontam plan (prescreen before the first exchange, PLANS.md §14);
    stage 3 is a stateless codegen filter. Nothing is driver-side; no
    stage is quadratic.
    """
    from sparkfuse.decontam import contamination_check
    from sparkfuse.sampling import holdout_flag

    if "_sf_marked_text" in transcripts.columns:
        raise ValueError("input already has a '_sf_marked_text' column (reserved)")
    if redact:
        from sparkfuse.redact import redact_pii

        transcripts = redact_pii(transcripts, "text")
    if (
        require_contiguous
        or max_role_repeats is not None
        or max_empty_turns is not None
    ):
        val = conversation_validity(transcripts)
        bad = F.lit(False)
        if require_contiguous:
            bad = bad | ~F.col("turn_idx_contiguous")
        if max_role_repeats is not None:
            bad = bad | (F.col("n_role_repeats") > max_role_repeats)
        if max_empty_turns is not None:
            bad = bad | (F.col("n_empty_turns") > max_empty_turns)
        transcripts = transcripts.join(
            val.where(~bad).select("conv_id"), "conv_id", "left_semi"
        )
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
