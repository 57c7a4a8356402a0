"""Temporal operators Spark's DataFrame API lacks as primitives: as-of
join and gap sessionization, both expressed as compositions of built-in
window functions (pure JVM, whole-stage codegen — no Python in the plan).

The as-of join uses the union-tag trick rather than a pandas
merge_asof-style cogroup: tag left/right rows, sort each key's timeline
once, and let ``last(..., ignorenulls=True)`` carry the most recent right
payload forward onto every left row. One shuffle on the key, one sort —
the same cost as a plain sort-merge join, with no Python crossing and no
per-group memory requirement (a key's whole timeline never has to fit in
one pandas frame, which is what breaks merge_asof-style implementations
on hot keys at 10^12-row scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _micros(c: str | Column) -> Column:
    """Microseconds-since-epoch of a timestamp OR timestamp_ntz column.
    unix_micros rejects TIMESTAMP_NTZ (what plain parquet scans produce),
    so NTZ goes through an explicit cast; only DIFFERENCES of this value
    are ever used, so the session-timezone interpretation cancels out
    (set spark.sql.session.timeZone=UTC if the data could straddle a DST
    boundary in a local zone — a DST jump would shift NTZ differences)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_cols: list[str],
    suffix: str = "_asof",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach ``right_cols`` from the LATEST right row
    with the same ``by`` key and right.on <= left.on (backward as-of,
    inclusive — the DuckDB/pandas convention). Unmatched left rows keep
    NULLs (left-join semantics). ``tolerance_us`` additionally nulls the
    attachment when the match is older than the given microseconds.

    Ties: a right row at exactly left.on IS visible. Multiple right rows
    at the same (key, timestamp) make "the latest" ambiguous — disambiguate
    upstream (e.g. keep one row per (key, ts)) for deterministic output.

    NULL timestamps never match (the SQL comparison convention): NULL-ts
    right rows are excluded, NULL-ts left rows come back unmatched.
    """
    reserved = {"_sf_isl", "_sf_r", "_f_r"}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(f"reserved columns in input: {sorted(clash)}")
    out_cols = [f"{c}{suffix}" for c in right_cols]
    taken = set(left.columns) & set(out_cols)
    if taken:
        raise ValueError(
            f"left already has columns {sorted(taken)}; pick another suffix"
        )
    # the whole candidate right row travels as ONE struct: last(ignorenulls)
    # then picks the latest right ROW — so every attached column comes from
    # the SAME row, and a legitimately-NULL payload field in that row is
    # attached as NULL instead of being skipped for a staler non-null one
    r = right.filter(F.col(on).isNotNull()).select(
        *by,
        F.col(on).alias(on),
        F.struct(
            F.col(on).alias("_rts"), *[F.col(c) for c in right_cols]
        ).alias("_sf_r"),
    ).withColumn("_sf_isl", F.lit(False))
    l = left.withColumn("_sf_isl", F.lit(True))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort BEFORE left rows at an equal timestamp (False < True)
    # so the inclusive <= is exactly one ORDER BY, no extra predicate.
    # NULL-ts left rows sort NULLS FIRST, ahead of every (non-null-ts)
    # right row, so their carried-forward struct is NULL = unmatched.
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_sf_isl").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*", F.last("_sf_r", ignorenulls=True).over(w).alias("_f_r")
    )
    keep = F.col("_f_r").isNotNull()
    if tolerance_us is not None:
        keep = keep & (
            (_micros(on) - _micros(F.col("_f_r")["_rts"]))
            <= F.lit(int(tolerance_us))
        )
    res = filled.filter(F.col("_sf_isl")).select(
        *left.columns,
        *[
            F.when(keep, F.col("_f_r")[c]).alias(a)
            for c, a in zip(right_cols, out_cols)
        ],
    )
    return res


def sessionize(
    df: DataFrame,
    ts: str,
    by: list[str],
    gap_seconds: int,
    tiebreak: list[str] = (),
    out: str = "session_idx",
) -> DataFrame:
    """Gap-based session ids: within each ``by`` key, order by ``ts`` (then
    ``tiebreak`` for determinism on equal timestamps) and start a new
    session whenever the gap to the previous row exceeds ``gap_seconds``.
    Adds ``out`` = 1-based session index per key — the standard prelude to
    per-session rollups (conversation episodes, user visits). Pure window
    arithmetic in microseconds (the data's native granularity), zero
    Python, one shuffle on the key."""
    if out in df.columns:
        raise ValueError(f"output column {out!r} already exists")
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*by).orderBy(*order)
    prev = F.lag(_micros(ts)).over(w)
    new_session = (
        prev.isNull()
        | ((_micros(ts) - prev) > F.lit(gap_seconds * 1_000_000))
    ).cast("long")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out, F.sum(new_session).over(wsum))
