"""Membership queries (SURVEY.md §2.3, P1-P3 Spark surface).

Three probe modes over a built Forest:

* ``approx_contains`` — boolean column from a broadcast filter (zero false
  negatives, bounded false positives). The pandas UDF gathers against the
  broadcast forest in numpy; Arrow batches in, boolean batches out.
* ``exact_member_semi_join`` — fuse-prescreen THEN exact-confirm semi-join.
  At 100 TB this is the point of the whole library: the prescreen removes
  ~all non-members *before* the shuffle, so the exact join moves only
  (true members + ~0.4% FPs) instead of the full probe table.
* ``exact_anti_join`` — complement (definitely-absent prescreen + anti-join),
  mirroring the reference's ground-truth validation direction (north_star:
  "verified against exact anti-join ground truth on a sample").
* ``approx_contains_routed`` / ``exact_member_routed`` — the big-forest path:
  probes are routed to their shard's filter with a cogrouped shard join
  against the forest TABLE, so no payload ever touches the driver and no
  monolithic broadcast is built. A 10^11-key forest (~130 GB of fuse8
  payload) is un-broadcastable; this path shuffles only 8-byte probe keys by
  shard and ships each shard's payload once to wherever its probe partition
  lands. The capability analog is the reference's 5×10^7-key Contains
  benchmarks (/root/reference/binaryfusefilter_test.go:300-331) — scaled out.
* ``approx_contains_sink`` — the HYBRID middle regime: each Python worker
  loads the forest once from its parquet sink (process-global cache) and
  probes locally. No driver bytes, no broadcast, and — unlike the routed
  path — **no probe-key shuffle**. Replicating an R-byte forest to E
  executors costs R·E bytes of storage reads ONCE; routing K probe keys
  costs 8·K shuffle bytes EVERY query. At 10^10 probes vs a 100 MB forest on
  1000 executors that's 100 GB of reads vs 80 GB of shuffle — and the reads
  are cold-cache-only while the shuffle repeats per query, so the hybrid
  wins everywhere the forest fits executor memory.
* ``approx_contains_routed_sink`` — the routed path when the forest has a
  readable sink: probes shuffle once to analytically chosen partitions
  (inverse-hash routing tags — contiguous shard ranges per task, no
  sampling pass) and each task loads only ITS shard filters from the sink
  (no forest shuffle, no cogroup sorts).
* ``probe_forest`` — the planner: three regimes by forest payload bytes —
  ≤ broadcast threshold → driver broadcast; ≤ replication budget (default
  512m, conf ``sparkfuse.probe.replicationBudget``) AND sink given →
  hybrid replication; else → routed (routed-sink when a ``sink_path`` is
  given, shard-routed cogroup otherwise).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

from sparkfuse.forest import Forest, _probe_one
from sparkfuse.hashing import to_u64
from sparkfuse.keys import shard_column
from sparkfuse.serialize import load_fuse_bytes, load_xor_bytes


def approx_contains_udf(forest: Forest, spark=None):
    """Vectorized membership UDF over the broadcast forest.

    Uses an explicit SparkContext broadcast so a multi-MB forest ships once
    per executor, not once per task closure.
    """
    if spark is not None:
        bc = spark.sparkContext.broadcast(forest)

        @F.pandas_udf(BooleanType())
        def probe(keys: pd.Series) -> pd.Series:
            return pd.Series(bc.value.contains_np(keys.to_numpy()))

    else:

        @F.pandas_udf(BooleanType())
        def probe(keys: pd.Series) -> pd.Series:
            return pd.Series(forest.contains_np(keys.to_numpy()))

    # The probe IS deterministic, but marking it so lets Catalyst's
    # InferFiltersFromConstraints copy the predicate through the
    # exact-confirm equi-join onto the BUILD side — a wasted full Arrow pass
    # over the true key set (every member passes by the zero-FN invariant).
    # asNondeterministic() pins the filter to the probe side where it was
    # written. (Verified via .explain: see PLANS.md.)
    return probe.asNondeterministic()


def approx_contains(
    df: DataFrame, key: str | Column, forest: Forest, spark=None, out: str = "maybe_member"
) -> DataFrame:
    col = F.col(key) if isinstance(key, str) else key
    return df.withColumn(out, approx_contains_udf(forest, spark)(col))


def approx_contains_arrow(
    df: DataFrame, key: str, forest: Forest, spark, out: str = "maybe_member"
) -> DataFrame:
    """Membership column via ``mapInArrow`` — the keys-only fast path
    (+15% over the pandas_udf: 0.68 vs 0.79 s min-of-4 at the 10M-key
    bench shape, re-measured round 5 AFTER the root-cause fix below).

    Session-conf dependency (PLANS.md §17, round-5 root cause): Spark 4's
    mapInArrow input writer checks ``spark.sql.execution.arrow.
    maxBytesPerBatch`` (default 64m) by calling ``ArrowWriter.sizeInBytes``
    — a full vector walk — PER INPUT ROW. That walk is what made this path
    measure 2-3x SLOWER in rounds 3-4 once any cogroup/applyInArrow query
    had polluted the shared JIT call sites (jstack-confirmed). ``get_spark``
    sets the conf to Int.MaxValue (the writer's documented short-circuit),
    which removes the per-row walk entirely; in a session WITHOUT that
    conf this path can degrade below the pandas_udf, so only prefer it in
    sessions built by ``get_spark`` (or set the conf yourself).

    Tradeoff vs ``approx_contains``: mapInArrow ships EVERY column of
    ``df`` through the Arrow channel both ways, while the pandas_udf ships
    only the key series and a boolean back — use this for narrow (ideally
    keys-only) probe frames; use the UDF column form for wide rows.
    """
    import pyarrow as pa

    if out in df.columns:
        raise ValueError(f"output column {out!r} already exists")
    bc = spark.sparkContext.broadcast(forest)
    names = list(df.columns) + [out]
    key_idx = df.columns.index(key)

    def probe_batches(batches):
        f = bc.value
        for batch in batches:
            arr = batch.column(key_idx).to_numpy(zero_copy_only=False)
            verdict = f.contains_np(arr)
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + [pa.array(verdict)], names=names
            )

    out_schema = StructType(
        list(df.schema.fields) + [StructField(out, BooleanType(), False)]
    )
    return df.mapInArrow(probe_batches, out_schema)


# Per-Python-worker forest cache for the worker-side sink-load probes
# (hybrid Forest AND EpochForest variants share it). Keyed by (path, file
# listing incl. sizes) so an appended/replaced sink is reloaded; bounded so
# a worker holds at most a few forests. Sized for 4 live sinks x (content
# key + per-query memo key) — a workload alternating across more sinks than
# that will re-read from storage each query.
_SINK_FOREST_CACHE: dict = {}
_SINK_CACHE_MAX = 8


def _sink_fingerprint(path: str):
    """(filesystem, data files, cache key) for a forest parquet sink.

    Follows Spark's sink convention: files whose base name starts with
    ``_`` or ``.`` (``_SUCCESS``, hidden markers) are metadata, not data.
    Works for local paths and any pyarrow-supported URI (s3://, hdfs://) —
    the executor reads the sink directly; the driver never touches payloads.
    The key covers (name, size, mtime) per file so an in-place rewrite with
    same-named same-sized files still invalidates the worker cache.
    """
    from pyarrow import fs as pafs

    if "://" in path:
        filesystem, base = pafs.FileSystem.from_uri(path)
    else:
        filesystem, base = pafs.LocalFileSystem(), path
    infos = filesystem.get_file_info(pafs.FileSelector(base, recursive=True))
    files = sorted(
        (i.path, i.size, getattr(i, "mtime_ns", None) or i.mtime)
        for i in infos
        if i.type == pafs.FileType.File and not i.base_name.startswith(("_", "."))
    )
    if not files:
        raise ValueError(f"no data files in forest sink {path!r}")
    return filesystem, [p for p, _, _ in files], (path, tuple(files))


def _sink_plan_token(content_key) -> str:
    """Plan token derived from a sink's content fingerprint — the ONE
    derivation all sink probes share (three hand-maintained copies would
    silently split the worker memo keyspace if one drifted). Same content
    ⇒ same token ⇒ workers reuse their listing/filter memos across
    queries; any append or rewrite changes the fingerprint and forces a
    fresh listing + reload."""
    import hashlib

    return hashlib.sha256(repr(content_key).encode()).hexdigest()[:16]


def _plan_token_or_fallback(sink_path: str) -> str:
    """Content-derived plan token when the sink is listable from the
    driver at plan time; a random per-plan token otherwise. The fallback
    keeps lazy composition legal — building the probe DataFrame BEFORE the
    sink is written, or on a driver without read access to an
    executor-only URI — at the old cost (one LIST per worker per query);
    executors still fail loudly at execution time if the sink never
    appears."""
    import os as _os

    try:
        _, _, content_key = _sink_fingerprint(sink_path)
    except Exception:
        return _os.urandom(8).hex()
    return _sink_plan_token(content_key)


def _load_cached_from_sink(path: str, plan_token: str, key_suffix: tuple, build):
    """Shared two-layer worker cache for whole-sink loads: (path, plan_token,
    *suffix) memoizes WITHIN one query plan so the sink listing runs once per
    worker per query (not once per Arrow batch — at object-store latency a
    per-batch LIST would dominate); the content-level (file listing, *suffix)
    key persists ACROSS queries so an unchanged sink is never re-read, and a
    changed one (append, or in-place rewrite — mtime is in the key) reloads
    on the next query. ``build(rows)`` constructs the probe handle from the
    sink's row dicts."""
    import pyarrow.dataset as pads

    memo_key = (path, plan_token, *key_suffix)
    cached = _SINK_FOREST_CACHE.get(memo_key)
    if cached is not None:
        return cached
    filesystem, data_files, base_key = _sink_fingerprint(path)
    content_key = (base_key, *key_suffix)
    handle = _SINK_FOREST_CACHE.get(content_key)
    if handle is None:
        tbl = pads.dataset(
            data_files, filesystem=filesystem, format="parquet"
        ).to_table()
        handle = build(tbl.to_pylist())
    while len(_SINK_FOREST_CACHE) >= _SINK_CACHE_MAX:
        _SINK_FOREST_CACHE.pop(next(iter(_SINK_FOREST_CACHE)))
    _SINK_FOREST_CACHE[content_key] = handle
    _SINK_FOREST_CACHE[memo_key] = handle
    return handle


def _load_forest_from_sink(path: str, plan_token: str) -> Forest:
    """Worker-side Forest load from a parquet sink (see
    ``_load_cached_from_sink`` for the cache contract)."""
    return _load_cached_from_sink(path, plan_token, (), Forest)


def approx_contains_sink(
    df: DataFrame, key: str | Column, sink_path: str, out: str = "maybe_member"
) -> DataFrame:
    """Hybrid replicated probe: membership column against a forest each
    worker loads from ``sink_path`` itself (cached per process).

    The middle regime between broadcast and routed: forests too big for the
    session broadcast budget but small enough to replicate per executor.
    Probe keys never shuffle (the scale killer of the routed path) and the
    driver never sees a payload (the scale killer of the broadcast path).
    The sink version is pinned once per query per worker (plan token), so a
    sink mutated MID-query may be observed at either version per worker;
    across queries the file-listing fingerprint (names+sizes+mtimes)
    guarantees a fresh load after any append or rewrite.
    """
    col = F.col(key) if isinstance(key, str) else key
    # content-derived plan token, fixed at plan time (ships in closure): one
    # driver-side LIST per plan, and repeat queries over an unchanged sink
    # skip the per-worker LIST + reuse the worker forest cache directly;
    # falls back to a random token when the sink is not yet listable
    plan_token = _plan_token_or_fallback(sink_path)

    @F.pandas_udf(BooleanType())
    def probe_sink(keys: pd.Series) -> pd.Series:
        forest = _load_forest_from_sink(sink_path, plan_token)
        return pd.Series(forest.contains_np(keys.to_numpy()))

    # asNondeterministic: same Catalyst predicate-pinning rationale as
    # approx_contains_udf (PLANS.md §2).
    return df.withColumn(out, probe_sink.asNondeterministic()(col))


def _load_epoch_forest_from_sink(path: str, plan_token: str, shard_bits: int):
    """Worker-side EpochForest load from an epoch-appended streaming sink —
    same cache scheme as ``_load_forest_from_sink``. ``shard_bits`` joins
    the cache key because it changes the (epoch, shard) decomposition; a
    value that differs from the sink rows' recorded build value fails
    loudly inside ``EpochForest.__init__`` (silent mis-routing would
    produce false negatives)."""
    from sparkfuse.streaming import EpochForest

    return _load_cached_from_sink(
        path, plan_token, ("epoch", shard_bits),
        lambda rows: EpochForest(rows, shard_bits),
    )


def approx_contains_epoch_sink(
    df: DataFrame,
    key: str | Column,
    sink_path: str,
    shard_bits: int,
    out: str = "maybe_member",
    replication_budget: int | None = None,
) -> DataFrame:
    """Driver-free probe over an epoch-appended STREAMING forest sink: each
    Python worker loads the epoch rows from ``sink_path`` itself (process-
    cached on the sink's file listing, so a newly appended epoch invalidates)
    and ORs the per-epoch verdicts for the key's shard — contains = "seen in
    ANY epoch", the EpochForest merge rule.

    This is the scale-safe replacement for ``EpochForest.load`` (which
    collects every epoch's filter rows TO THE DRIVER and ships them by
    closure — bounded for compacted sinks, but a long-running uncompacted
    stream accumulates one row per (epoch, shard) and re-centralizes the
    probe path on the driver). Here the driver never touches a payload and
    probe keys never shuffle, exactly like ``approx_contains_sink``; the
    epoch sink version is pinned once per query per worker (plan token).

    ``shard_bits`` must be the value the stream was built with
    (``stream_forest(..., shard_bits=)``) — the epoch tag lives in the
    shard column's high bits, so a wrong value mis-decomposes the layout.

    Scale guard: this path REPLICATES the whole epoch sink into every
    Python worker (the hybrid-regime memory model), and an uncompacted
    stream grows its sink without bound — so the sink's on-disk size is
    checked at plan time against the replication budget
    (``sparkfuse.probe.replicationBudget`` session conf, default 512m;
    override per-call with ``replication_budget``, -1 disables). Exceeding
    it raises with the remediation (``compact_forest``) instead of letting
    every executor OOM mid-query.
    """
    col = F.col(key) if isinstance(key, str) else key
    budget = replication_budget
    if budget is None:
        # NOTE: compared against ON-DISK sink bytes here (cheap to list at
        # plan time); the probe_forest planner compares the same knob to
        # in-memory payload bytes — both proxies for worker residency
        budget = _replication_budget(df.sparkSession)
    if budget >= 0:
        _, _, content_key = _sink_fingerprint(sink_path)
        sink_bytes = sum(size for _, size, _ in content_key[1])
        if sink_bytes > budget:
            raise ValueError(
                f"epoch sink {sink_path!r} is {sink_bytes} bytes, past the "
                f"replication budget {budget}: every worker would load the "
                "full epoch set. Compact the stream (compact_forest) — which "
                "also restores the single-filter fpp — or raise "
                "sparkfuse.probe.replicationBudget / pass replication_budget "
                "(-1 disables)."
            )
        # content-derived plan token (reuses the budget check's listing):
        # repeat queries over an unchanged sink reuse the worker memos; a
        # new epoch changes the fingerprint and forces the reload
        plan_token = _sink_plan_token(content_key)
    else:
        # budget disabled: the sink may legitimately not be listable from
        # the driver yet — fall back rather than fail at plan time
        plan_token = _plan_token_or_fallback(sink_path)

    @F.pandas_udf(BooleanType())
    def probe_epochs(keys: pd.Series) -> pd.Series:
        ef = _load_epoch_forest_from_sink(sink_path, plan_token, shard_bits)
        return pd.Series(ef.contains_np(keys.to_numpy()))

    # asNondeterministic: same Catalyst predicate-pinning rationale as
    # approx_contains_udf (PLANS.md §2).
    return df.withColumn(out, probe_epochs.asNondeterministic()(col))


def exact_member_semi_join(
    probe_df: DataFrame,
    probe_key: str,
    build_df: DataFrame,
    build_key: str,
    forest: Forest,
    spark=None,
) -> DataFrame:
    """Exact membership: prescreen with the filter, then left-semi confirm.

    Zero false negatives ⇒ the prescreen never drops a true member; the semi
    join removes the ~fpp false positives ⇒ result is exact (equals a plain
    semi join, so a plain SQL ``IN`` subquery is a valid oracle). The join
    side only ever sees prescreen survivors — that is the shuffle saving.
    """
    pre = probe_df.filter(approx_contains_udf(forest, spark)(F.col(probe_key)))
    build_keys = build_df.select(F.col(build_key).alias(probe_key)).dropDuplicates()
    return pre.join(build_keys, on=probe_key, how="left_semi")


def exact_anti_join(
    probe_df: DataFrame,
    probe_key: str,
    build_df: DataFrame,
    build_key: str,
    forest: Forest,
    spark=None,
) -> DataFrame:
    """Exact non-membership: filter-negative rows are definitely absent
    (zero false negatives ⇒ filter-negative cannot be a member); only the
    maybe-positive sliver needs the anti-join shuffle."""
    probe_col = F.col(probe_key)
    flagged = probe_df.withColumn("_maybe", approx_contains_udf(forest, spark)(probe_col))
    definite = flagged.filter(~F.col("_maybe")).drop("_maybe")
    maybes = flagged.filter(F.col("_maybe")).drop("_maybe")
    build_keys = build_df.select(F.col(build_key).alias(probe_key)).dropDuplicates()
    confirmed_absent = maybes.join(build_keys, on=probe_key, how="left_anti")
    return definite.unionByName(confirmed_absent)


def _forest_meta(forest_df: DataFrame) -> dict:
    """Read the forest's (tiny) layout metadata — NOT the payloads.

    kind/arity/shard_bits/route must be unique (they define the routing and
    probe math); width MAY vary per shard (budgeted mixed-width forests) and
    travels per-row through the cogroup instead.
    """
    rows = (
        forest_df.select("kind", "arity", "shard_bits", "route")
        .dropDuplicates()
        .collect()
    )
    if len(rows) != 1:
        raise ValueError(f"inhomogeneous forest: {rows}")
    return rows[0].asDict()


def approx_contains_routed(
    probe_df: DataFrame,
    key: str,
    forest_df: DataFrame,
    out: str = "maybe_member",
) -> DataFrame:
    """Membership column via a shard-routed cogroup join against the forest
    table — the probe path for forests too big to broadcast.

    Plan: probe rows get their shard id JVM-side (same xxh64-top-bits rule as
    the build, ``keys.shard_column``), then cogroup with the forest table on
    shard: each task receives (probe rows of one shard, that shard's single
    filter row) and runs the vectorized numpy Contains kernel. The driver
    never sees a payload; each shard payload crosses the wire once per probe
    partition it meets, and probe rows shuffle once by shard.

    Routing is bit-identical to ``Forest.contains_np`` (broadcast path) —
    tested equal in tests/test_forest_spark.py. Shards absent from the forest
    (e.g. a partial build) probe as False, matching the broadcast path.

    The per-shard kernel runs through cogrouped ``applyInArrow`` (no pandas
    conversion; measured +24% over applyInPandas at 10M keys vs a 13 MB
    forest). For wide probe rows prefer ``exact_member_routed`` which routes
    only the 8-byte key column through the shard shuffle.

    Session-hygiene caveat (round 5, PLANS.md §17): once any
    cogroup/applyInArrow query runs, ``mapInArrow`` plans in sessions that
    still carry the default ``maxBytesPerBatch`` (64m ⇒ a per-row
    ArrowWriter.sizeInBytes walk) run ~2x slower for the rest of the
    session. ``get_spark`` sessions are immune (Int.MaxValue
    short-circuit), and the library's mapInArrow use — probe_forest's
    keys-only broadcast fast path — is gated on exactly that conf being
    present; the routed/hybrid/sink probes are pandas_udf and unaffected
    either way. If your own pipeline mixes this operator with mapInArrow
    stages in a DEFAULT-conf session, order matters.
    """
    import pyarrow as pa

    meta = _forest_meta(forest_df)
    kind, arity = meta["kind"], meta["arity"]
    shard_bits, route = meta["shard_bits"], meta["route"]

    cols = list(probe_df.columns)
    if out in cols:
        raise ValueError(f"output column {out!r} already exists")
    if "_sf_shard" in cols:
        raise ValueError("probe_df already has a '_sf_shard' column (reserved)")
    out_schema = StructType(
        list(probe_df.schema.fields) + [StructField(out, BooleanType(), False)]
    )

    def probe_shard(probe_tbl: "pa.Table", forest_tbl: "pa.Table") -> "pa.Table":
        keys_np = probe_tbl.column(key).to_numpy(zero_copy_only=False)
        if forest_tbl.num_rows == 0 or len(keys_np) == 0:
            verdict = np.zeros(len(keys_np), dtype=bool)
        else:
            # replayed appends are byte-identical (deterministic builds);
            # different payloads for one shard mean a mixed/corrupted sink,
            # where picking one filter would yield false negatives — fail
            payloads = {bytes(p.as_py()) for p in forest_tbl.column("payload")}
            if len(payloads) > 1:
                raise ValueError(
                    "conflicting payloads for one shard in the forest table "
                    "(mixed builds, or an epoch-appended sink — read those "
                    "with EpochForest)"
                )
            (payload,) = payloads
            if kind == "fuse":
                widths = {int(w.as_py()) for w in forest_tbl.column("width")}
                (shard_width,) = widths  # identical payloads ⇒ one width
                filt = load_fuse_bytes(payload, width=shard_width, arity=arity)
            else:
                filt = load_xor_bytes(payload)
            verdict = _probe_one(filt, to_u64(keys_np))
        return pa.table(
            [probe_tbl.column(c) for c in cols] + [pa.array(verdict)],
            names=cols + [out],
        )

    tagged = probe_df.withColumn("_sf_shard", shard_column(key, shard_bits, route))
    forest_keyed = forest_df.select(
        F.col("shard").alias("_sf_shard"), "width", "payload"
    )
    return (
        tagged.groupBy("_sf_shard")
        .cogroup(forest_keyed.groupBy("_sf_shard"))
        .applyInArrow(probe_shard, out_schema)
    )


# Shard filters are ~2 MB each, whole forests much bigger: separate cache
# with its own cap so routed-sink and hybrid probes never thrash each other.
_SHARD_FILTER_CACHE: dict = {}
_SHARD_CACHE_MAX = 128
# Per-(path, plan_token) memo of the sink listing: one LIST per worker per
# query, shared across every shard load of that query.
_SINK_LISTING_MEMO: dict = {}
# Driver-side forest-layout metadata per sink content fingerprint.
_SINK_META_CACHE: dict = {}


def _sink_forest_meta(sink_path: str) -> tuple[dict, str]:
    """Driver-side (layout metadata, plan token) for a forest sink, read
    straight from the parquet files via pyarrow — NO Spark job. The previous
    shape (``_forest_meta(spark.read.parquet(sink))`` = a scan + distinct +
    collect job per plan construction) was a measurable slice of the
    fresh-plan routed-sink gap vs the cogroup path (PLANS.md §17 round-5
    re-measurement). Column-pruned: only the four tiny layout columns are
    read, never payloads.

    The plan token is derived from the sink's content fingerprint
    (names+sizes+mtimes) instead of ``os.urandom``: queries over an
    UNCHANGED sink now share the per-worker listing memo and shard-filter
    memo across plans (no per-query LIST on every worker), while any append
    or rewrite changes the fingerprint and therefore the token — same
    freshness contract, strictly fewer repeated reads."""
    import pyarrow.dataset as pads

    filesystem, data_files, content_key = _sink_fingerprint(sink_path)
    token = _sink_plan_token(content_key)
    cached = _SINK_META_CACHE.get(content_key)
    if cached is not None:
        return cached, token
    tbl = pads.dataset(data_files, filesystem=filesystem, format="parquet").to_table(
        columns=["kind", "arity", "shard_bits", "route"]
    )
    distinct = {
        (
            tbl.column("kind")[i].as_py(),
            tbl.column("arity")[i].as_py(),
            tbl.column("shard_bits")[i].as_py(),
            tbl.column("route")[i].as_py(),
        )
        for i in range(tbl.num_rows)
    }
    if len(distinct) != 1:
        raise ValueError(f"inhomogeneous forest: {sorted(distinct)}")
    kind, arity, shard_bits, route = next(iter(distinct))
    meta = {"kind": kind, "arity": arity, "shard_bits": shard_bits, "route": route}
    while len(_SINK_META_CACHE) >= 8:
        _SINK_META_CACHE.pop(next(iter(_SINK_META_CACHE)))
    _SINK_META_CACHE[content_key] = meta
    return meta, token


def _load_shard_filter_from_sink(path: str, plan_token: str, shard: int):
    """Load ONE shard's filter from the forest sink, worker-side.

    Two cache layers (the _load_forest_from_sink scheme): (path, plan_token,
    shard) memoizes within one query — including the ABSENT-shard None
    result, so a partial forest costs one read, not one per batch — and
    (content key, shard) persists across queries, reloading only when the
    sink's file listing (names+sizes+mtimes) changes. Parquet predicate
    pushdown on the shard column prunes row groups (tight when the sink was
    written clustered — ``write_forest(cluster_by_shard=True)``)."""
    import pyarrow.dataset as pads

    memo_key = (path, plan_token, shard)
    if memo_key in _SHARD_FILTER_CACHE:
        return _SHARD_FILTER_CACHE[memo_key]
    listing = _SINK_LISTING_MEMO.get((path, plan_token))
    if listing is None:
        listing = _sink_fingerprint(path)
        while len(_SINK_LISTING_MEMO) >= 8:
            _SINK_LISTING_MEMO.pop(next(iter(_SINK_LISTING_MEMO)))
        _SINK_LISTING_MEMO[(path, plan_token)] = listing
    filesystem, data_files, content_key = listing
    content_shard_key = (content_key, shard)
    if content_shard_key in _SHARD_FILTER_CACHE:
        filt = _SHARD_FILTER_CACHE[content_shard_key]
        _SHARD_FILTER_CACHE[memo_key] = filt
        return filt
    tbl = (
        pads.dataset(data_files, filesystem=filesystem, format="parquet")
        .to_table(
            filter=pads.field("shard") == shard,
            columns=["kind", "width", "arity", "payload", "content_sha256"],
        )
    )
    if tbl.num_rows == 0:
        filt = None  # absent shard probes False (partial forest)
    else:
        shas = set(tbl.column("content_sha256").to_pylist())
        if len(shas) > 1:
            raise ValueError(
                f"conflicting payloads for shard {shard} in {path!r} (mixed "
                "builds, or an epoch-appended sink — read those with "
                "EpochForest)"
            )
        kind = tbl.column("kind")[0].as_py()
        payload = tbl.column("payload")[0].as_py()
        if kind == "fuse":
            filt = load_fuse_bytes(
                bytes(payload),
                width=int(tbl.column("width")[0].as_py()),
                arity=int(tbl.column("arity")[0].as_py()),
            )
        else:
            filt = load_xor_bytes(bytes(payload))
    while len(_SHARD_FILTER_CACHE) >= _SHARD_CACHE_MAX:
        _SHARD_FILTER_CACHE.pop(next(iter(_SHARD_FILTER_CACHE)))
    _SHARD_FILTER_CACHE[content_shard_key] = filt
    _SHARD_FILTER_CACHE[memo_key] = filt
    return filt


def _shuffle_partition_count(spark) -> int:
    """spark.sql.shuffle.partitions as an int, tolerating platforms where
    the conf is non-numeric (e.g. "auto" under auto-optimized shuffle) by
    falling back to the cluster's default parallelism."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except ValueError:
        return spark.sparkContext.defaultParallelism


# parts -> tags, memoized per driver process (one tiny job per distinct parts)
_PARTITION_TAG_CACHE: dict[int, list[int]] = {}


def _partition_tags(spark: SparkSession, parts: int) -> list[int]:
    """For each target partition id p in [0, parts): the smallest long t with
    ``pmod(hash(t), parts) == p`` — so ``repartition(parts, lit(t))`` places a
    row EXACTLY in partition p. SQL ``hash()`` is the same Murmur3(seed 42)
    that HashPartitioning's partitionIdExpression uses, which is what makes
    the inversion valid. One tiny bounded job, memoized per process; with
    candidates ~40x parts the probability of an uncovered partition is
    negligible (each candidate is ~uniform over parts), and a miss raises."""
    cached = _PARTITION_TAG_CACHE.get(parts)
    if cached is not None:
        return cached
    rows = (
        spark.range(parts * 40)
        .select(F.col("id"), F.pmod(F.hash("id"), F.lit(parts)).alias("p"))
        .groupBy("p")
        .agg(F.min("id").alias("t"))
        .collect()
    )
    by_p = {int(r["p"]): int(r["t"]) for r in rows}
    missing = [p for p in range(parts) if p not in by_p]
    if missing:  # pragma: no cover - ~(1-1/parts)^(40*parts) ≈ e^-40
        raise RuntimeError(f"no routing tag found for partitions {missing[:5]}")
    tags = [by_p[p] for p in range(parts)]
    _PARTITION_TAG_CACHE[parts] = tags
    return tags


def approx_contains_routed_sink(
    probe_df: DataFrame,
    key: str,
    sink_path: str,
    spark: SparkSession,
    out: str = "maybe_member",
) -> DataFrame:
    """Routed probe for un-broadcastable forests WITH a readable sink: probes
    repartition by shard (the only shuffle — 8-byte keys + shard ids) and
    each task loads ONLY the shard filters it routes to, straight from the
    sink (cached per worker). Compared to the cogroup routed path this
    removes the forest side of the shuffle AND both cogroup sorts; at 1000
    executors a shard's ~2 MB payload is read by the ~1 reducer that owns
    its probe partition instead of travelling once per probe partition met.

    Same verdict contract as ``approx_contains_routed`` (missing shards
    probe False; mixed sinks fail loudly); requires kind/arity/shard_bits/
    route to be uniform (width may vary — budgeted forests).

    Worker function is a SCALAR pandas_udf over (key, shard) evaluated
    ABOVE the tag-route exchange — each Arrow batch belongs to one task
    partition, i.e. one or two shards, so the per-batch filter loads are
    the same targeted reads the earlier ``mapInArrow`` form did, while
    shipping only the two 8-byte columns to Python and one boolean back
    (the mapInArrow form round-tripped EVERY probe column). It also dodges
    a measured local-mode pathology: after any cogroup/applyInArrow query
    runs in the session, reused Python workers execute ``mapInArrow``
    plans ~2x slower (flat, not cache warm-up; pandas_udf plans are
    unaffected; reproduced in tools/profile_routedsink_poison.py) — the
    round-4 bench record's routed-sink deficit vs PLANS.md §17's ad-hoc
    parity claim was exactly this, because bench.py runs the cogroup row
    first. PLANS.md §17 (round-5 re-measurement) has the numbers.
    """
    # driver-side pyarrow meta read + content-derived plan token: no Spark
    # job at plan time, and repeat queries over an unchanged sink reuse the
    # workers' listing/filter memos (PLANS.md §17 round-5 re-measurement)
    meta, plan_token = _sink_forest_meta(sink_path)
    shard_bits, route = meta["shard_bits"], meta["route"]
    cols = list(probe_df.columns)
    if out in cols:
        raise ValueError(f"output column {out!r} already exists")
    for reserved in ("_sf_shard", "_sf_tag"):
        if reserved in cols:
            raise ValueError(
                f"probe_df already has a {reserved!r} column (reserved)"
            )

    @F.pandas_udf(BooleanType())
    def probe_shards(keys: pd.Series, shards: pd.Series) -> pd.Series:
        keys_np = keys.to_numpy()
        shards_np = shards.to_numpy()
        verdict = np.zeros(len(keys_np), dtype=bool)
        for s in np.unique(shards_np):
            filt = _load_shard_filter_from_sink(sink_path, plan_token, int(s))
            if filt is None:
                continue
            mask = shards_np == s
            verdict[mask] = _probe_one(filt, to_u64(keys_np[mask]))
        return pd.Series(verdict)

    tagged = probe_df.withColumn("_sf_shard", shard_column(key, shard_bits, route))
    rep = _tag_route(tagged, spark, shard_bits)
    # asNondeterministic pins the probe column above the exchange (the same
    # Catalyst predicate-pinning rationale as approx_contains_udf) — the
    # per-partition shard locality is the whole point of the tag route
    return rep.withColumn(
        out,
        probe_shards.asNondeterministic()(F.col(key), F.col("_sf_shard")),
    ).drop("_sf_shard", "_sf_tag")


def _tag_route(tagged: DataFrame, spark: SparkSession, shard_bits: int) -> DataFrame:
    """Shuffle a ``_sf_shard``-tagged frame so each shard lands EXACTLY in
    its analytic target partition, without sampling: naive hash-repartition
    on the shard id leaves ~1/e of partitions empty with the worst task
    holding 3 shards (measured 937k vs the balanced 312k keys), and
    repartitionByRange fixes that only by paying a SAMPLING pass over all
    probe keys per query (measured 0.71 s vs 0.53 s for the 10M-key shuffle
    alone, PLANS.md §13) — wasted, because the shard distribution is KNOWN
    (uniform top bits). Each shard maps analytically to target partition
    p = shard*parts div n_shards (contiguous ranges, so cluster_by_shard
    sink reads stay contiguous row-group ranges), and a precomputed routing
    tag with pmod(hash(tag), parts) == p makes the plain hash shuffle land
    it EXACTLY there (PLANS.md §17; placement pinned by
    test_routed_sink_tag_routing_exact_placement against THIS function)."""
    n_shards = 1 << max(shard_bits, 0)
    parts = min(_shuffle_partition_count(spark), n_shards)
    tags = _partition_tags(spark, parts)
    tag_arr = F.array(*[F.lit(t).cast("long") for t in tags])
    target = F.expr(f"_sf_shard * {parts} div {n_shards}")
    return tagged.withColumn(
        "_sf_tag", F.element_at(tag_arr, (target + 1).cast("int"))
    ).repartition(parts, "_sf_tag")


def _exact_member_keyed(
    probe_df: DataFrame,
    probe_key: str,
    build_df: DataFrame,
    build_key: str,
    prescreen,
) -> DataFrame:
    """Shared shape of the keyed exact-membership plans: dedup the probe KEY
    column (only 8-byte keys cross the prescreen shuffle), prescreen it with
    ``prescreen(keys_only) -> flagged-with-_maybe``, exact-confirm survivors
    against the build keys, then semi-join the original probe rows. The
    survivor set is ~(members + fpp·non-members), which AQE typically
    broadcasts for the final semi-join. Result is exact (zero-FN prescreen +
    exact confirm), so a plain SQL ``IN`` subquery is a valid oracle."""
    keys_only = probe_df.select(probe_key).dropDuplicates()
    maybe = prescreen(keys_only).filter(F.col("_maybe")).drop("_maybe")
    build_keys = build_df.select(F.col(build_key).alias(probe_key)).dropDuplicates()
    members = maybe.join(build_keys, on=probe_key, how="left_semi")
    return probe_df.join(members, on=probe_key, how="left_semi")


def exact_member_routed(
    probe_df: DataFrame,
    probe_key: str,
    build_df: DataFrame,
    build_key: str,
    forest_df: DataFrame,
) -> DataFrame:
    """Exact membership for un-broadcastable forests: routed-cogroup
    prescreen through ``_exact_member_keyed`` — same contract as
    ``exact_member_semi_join``."""
    return _exact_member_keyed(
        probe_df, probe_key, build_df, build_key,
        lambda keys: approx_contains_routed(keys, probe_key, forest_df, out="_maybe"),
    )


def forest_payload_bytes(forest_df: DataFrame) -> int:
    """Total serialized payload size — the broadcast-vs-routed planning input
    (an aggregate over the forest table, payloads never leave the executors)."""
    return forest_df.agg(
        F.sum(F.octet_length("payload")).alias("b")
    ).first()["b"] or 0


def _batch_size_check_short_circuited(spark) -> bool:
    """True iff the session disables the mapInArrow input writer's per-row
    size check (maxBytesPerBatch == Int.MaxValue — PLANS.md §17). NOTE:
    ``conf.get`` with a string default VALIDATES the default against the
    registered bytes conf when unset (an empty-string default raises
    INVALID_CONF_VALUE at plan time in any session not built by
    ``get_spark`` — round-5 review, reproduced live), so the unset case is
    handled by exception, not default."""
    try:
        return spark.conf.get(
            "spark.sql.execution.arrow.maxBytesPerBatch"
        ) == str(2**31 - 1)
    except Exception:
        return False


DEFAULT_REPLICATION_BUDGET = "512m"


def _replication_budget(spark) -> int:
    """The ``sparkfuse.probe.replicationBudget`` session conf in bytes
    (default 512m) — the single source of truth for both consumers: the
    probe_forest planner (compares in-memory payload bytes) and the
    epoch-sink guard (compares on-disk sink bytes)."""
    raw = DEFAULT_REPLICATION_BUDGET
    if spark is not None:
        raw = spark.conf.get(
            "sparkfuse.probe.replicationBudget", DEFAULT_REPLICATION_BUDGET
        )
    return _parse_byte_string(raw)


def probe_forest(
    probe_df: DataFrame,
    key: str,
    forest_df: DataFrame,
    spark: SparkSession | None = None,
    out: str = "maybe_member",
    broadcast_threshold: int | None = None,
    replication_budget: int | None = None,
    sink_path: str | None = None,
) -> DataFrame:
    """Planner: pick the probe strategy by forest payload size — THREE regimes.

    1. payload ≤ broadcast threshold (session
       ``spark.sql.autoBroadcastJoinThreshold``, 10 MB unless tuned — the
       same knob as Spark's own broadcast-join choice): driver-collected
       ``sc.broadcast`` forest, pandas_udf probe. Cheapest; fuses into the
       probe scan.
    2. ``sink_path`` given AND payload ≤ replication budget
       (``sparkfuse.probe.replicationBudget`` session conf, default 512m —
       sized to what an executor can hold resident): HYBRID replication.
       Each worker loads the forest from the sink itself — probe keys never
       shuffle AND the driver never touches a payload. Without a sink_path
       this regime is skipped (falling through to routed), because the only
       way to replicate a DataFrame-only forest is a driver collect — a
       driver-memory cost the executor-sized budget does not police.
       (To trade driver memory for probe speed anyway, raise
       broadcast_threshold explicitly.)
    3. else: routed. With a ``sink_path``, the routed-SINK path (probes
       tag-route by shard to exact partitions, each task reads only its shard filters —
       no forest shuffle, no cogroup sorts); without one, the shard-routed
       cogroup against the forest TABLE. Both pay the same 8-byte-per-key
       probe shuffle. To force the cogroup path despite having a sink
       (e.g. cold object storage while forest_df is cached), pass
       ``sink_path=None``.

    Set either threshold to -1 to disable that regime.

    NOTE: planning materializes the forest (one aggregate over payload
    sizes), and the chosen path materializes it again — persist/cache a
    lazily-built ``forest_df`` (or read it from its sink) before calling, or
    the shard builds run twice.
    """
    regime = _plan_probe_regime(
        forest_df, spark, broadcast_threshold, replication_budget, sink_path
    )
    if regime == "broadcast":
        # keys-only probe frames take the mapInArrow form (+15% — no pandas
        # Series wrap) when it is SAFE: the session must have the per-row
        # batch-size check short-circuited (get_spark does; PLANS.md §17 —
        # without it, mapInArrow degrades ~2-3x in JIT-polluted sessions),
        # and the frame must be narrow (mapInArrow round-trips every column)
        if (
            spark is not None
            and list(probe_df.columns) == [key]
            and _batch_size_check_short_circuited(spark)
        ):
            return approx_contains_arrow(
                probe_df, key, Forest.from_df(forest_df), spark, out=out
            )
        return approx_contains(probe_df, key, Forest.from_df(forest_df), spark, out=out)
    if regime == "hybrid":
        return approx_contains_sink(probe_df, key, sink_path, out=out)
    if sink_path is not None:
        # past the replication budget but sink-readable: route probes by
        # shard and let each task read only ITS shard filters (no forest
        # shuffle, no cogroup sorts)
        return approx_contains_routed_sink(
            probe_df, key, sink_path, spark or probe_df.sparkSession, out=out
        )
    return approx_contains_routed(probe_df, key, forest_df, out=out)


def _plan_probe_regime(
    forest_df: DataFrame,
    spark: SparkSession | None,
    broadcast_threshold: int | None,
    replication_budget: int | None,
    sink_path: str | None,
) -> str:
    """The probe_forest regime decision, shared with exact_member_forest."""
    if broadcast_threshold is None:
        broadcast_threshold = 10 * 1024 * 1024
        if spark is not None:
            raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
            broadcast_threshold = _parse_byte_string(raw)
    if replication_budget is None:
        replication_budget = _replication_budget(spark)
    nbytes = forest_payload_bytes(forest_df)
    if broadcast_threshold >= 0 and nbytes <= broadcast_threshold:
        return "broadcast"
    if sink_path is not None and replication_budget >= 0 and nbytes <= replication_budget:
        return "hybrid"
    return "routed"


def exact_member_forest(
    probe_df: DataFrame,
    probe_key: str,
    build_df: DataFrame,
    build_key: str,
    forest_df: DataFrame,
    spark: SparkSession | None = None,
    sink_path: str | None = None,
    broadcast_threshold: int | None = None,
    replication_budget: int | None = None,
) -> DataFrame:
    """Exact membership with the prescreen strategy chosen by the
    ``probe_forest`` planner (broadcast / hybrid sink-load / routed), then
    the exact-confirm semi-join. One entry point that stays correct from a
    100 KB forest to a 100 GB one; same zero-FN + exact-confirm contract as
    ``exact_member_semi_join``, so a plain SQL ``IN`` subquery is a valid
    oracle for every regime.

    Plan shapes per regime: broadcast delegates to ``exact_member_semi_join``
    (UDF filter fused into the probe scan + ONE semi-join — no key
    dropDuplicates shuffle); hybrid filters rows in place with the sink
    probe then semi-joins once; routed dedups keys first so only 8-byte
    keys cross the shard shuffle (``exact_member_routed``)."""
    regime = _plan_probe_regime(
        forest_df, spark, broadcast_threshold, replication_budget, sink_path
    )
    if regime == "broadcast":
        return exact_member_semi_join(
            probe_df, probe_key, build_df, build_key,
            Forest.from_df(forest_df), spark,
        )
    build_keys = build_df.select(F.col(build_key).alias(probe_key)).dropDuplicates()
    if regime == "hybrid":
        pre = approx_contains_sink(probe_df, probe_key, sink_path, out="_maybe")
        pre = pre.filter(F.col("_maybe")).drop("_maybe")
        return pre.join(build_keys, on=probe_key, how="left_semi")
    if sink_path is not None:
        # routed regime with a readable sink: routed-sink prescreen (same
        # key-only-shuffle shape, minus the forest shuffle and sorts)
        return _exact_member_keyed(
            probe_df, probe_key, build_df, build_key,
            lambda keys: approx_contains_routed_sink(
                keys, probe_key, sink_path,
                spark or probe_df.sparkSession, out="_maybe",
            ),
        )
    return exact_member_routed(probe_df, probe_key, build_df, build_key, forest_df)


_BYTE_SUFFIXES = {"b": 1, "k": 1024, "m": 1024**2, "g": 1024**3,
                  "t": 1024**4, "p": 1024**5}
# JavaUtils.byteStringAsBytes grammar: integer + optional multiplier letter
# + optional trailing 'b' ("10m", "10MB", "512kb", "1b", "10485760").
_BYTE_RE = re.compile(r"^(-?\d+)\s*([kmgtp]?b?)$")


def _parse_byte_string(raw: str) -> int:
    """Spark byte-string grammar (JavaUtils.byteStringAsBytes): optional
    b/kb/mb/gb/tb/pb (or bare k/m/g/t/p) suffix, case-insensitive; bare
    numbers are bytes. Raises on anything else instead of silently
    substituting a default."""
    m = _BYTE_RE.match(str(raw).strip().lower())
    if not m:
        raise ValueError(f"unparseable Spark byte string {raw!r}")
    suffix = m.group(2)
    mult = _BYTE_SUFFIXES[suffix[0]] if suffix else 1
    return int(m.group(1)) * mult


def verify_sample(
    probe_df: DataFrame,
    probe_key: str,
    build_df: DataFrame,
    build_key: str,
    forest: Forest,
    spark=None,
    fraction: float = 0.1,
    seed: int = 42,
) -> dict:
    """Ground-truth audit on a sample: compares the approx filter verdicts
    against an exact anti-join, returns {n, false_negatives, false_positives,
    fpp}. false_negatives MUST be 0 (the hard invariant)."""
    sample = probe_df.select(F.col(probe_key).alias("key")).sample(fraction, seed=seed)
    flagged = approx_contains(sample, "key", forest, spark, out="maybe")
    build_keys = build_df.select(F.col(build_key).alias("key")).dropDuplicates()
    truth = flagged.join(build_keys.withColumn("is_member", F.lit(True)), on="key", how="left")
    agg = truth.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("is_member") & ~F.col("maybe"), 1).otherwise(0)).alias("false_negatives"),
        F.sum(F.when(F.col("maybe") & F.col("is_member").isNull(), 1).otherwise(0)).alias("false_positives"),
        F.sum(F.when(F.col("is_member").isNull(), 1).otherwise(0)).alias("true_negatives_total"),
    ).first()
    n_neg = agg["true_negatives_total"]
    return {
        "n": agg["n"],
        "false_negatives": agg["false_negatives"] or 0,
        "false_positives": agg["false_positives"] or 0,
        "fpp": (agg["false_positives"] or 0) / n_neg if n_neg else 0.0,
    }
