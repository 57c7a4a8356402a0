"""Deterministic, reproducible sampling for training-data curation.

``df.sample()`` draws from a per-partition RNG: the result changes with
partitioning, retries, and cluster size, which is poison for reproducible
dataset builds (and impossible to oracle-check). These operators replace
randomness with a cryptographic hash of the ROW CONTENT (md5 — chosen
deliberately over xxhash64 because every engine computes the same md5, so
an independent SQL engine can replay the exact selection):

  * ``deterministic_sample``  — global uniform k-sample = top-k by md5
  * ``stratified_sample``     — k per group via a windowed rank by md5
  * ``split_by_hash``         — stable train/holdout split at a fraction

Selection depends only on (row content, seed): re-running on a different
cluster, partitioning, or engine yields the SAME rows — the property
curation pipelines need so a dataset version is a pure function of its
inputs. A seed change is a fresh independent draw.

Scale shape: top-k by hash compiles to TakeOrderedAndProject (per-partition
partial top-k, only k rows per partition leave the scan stage — no full
sort, no full shuffle); the stratified variant is one window over a
groupwise shuffle; the split is a stateless filter inside codegen
(0 shuffles), usable as a consistent train/eval fence across every table
that shares the key columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# unit separator: illegal in normal text, so concat_ws cannot collide two
# different column tuples into one hash input
_SEP = "\x1f"


def _row_hash(cols: list[str], seed: str) -> Column:
    """Lowercase-hex md5 of the seed + key columns — identical in any
    engine. Each column is encoded as chr(2)+value when non-NULL and
    chr(1) when NULL *before* joining on chr(31): concat_ws silently DROPS
    null segments (with their separator), which would make ('x', NULL)
    collide with (NULL, 'x'); the explicit null marker restores the
    distinct-tuples → distinct-hash guarantee. DuckDB twin:
    md5(concat_ws(chr(31), seed, coalesce(chr(2)||CAST(c AS VARCHAR),
    chr(1)), ...)).

    Supported key-column types: INTEGRAL and STRING only. The cross-engine
    exact-replay guarantee rides on ``CAST(col AS STRING)`` producing the
    same text in every engine, which holds for integers and strings but NOT
    for doubles/decimals/timestamps (scientific-notation and formatting
    differences would silently desynchronize the selection between engines).
    Canonicalize such columns yourself first (e.g. ``unix_micros(ts)``,
    ``format_number``/fixed-point casts) and pass the canonical column."""
    parts = [F.lit(seed)] + [
        F.coalesce(
            F.concat(F.lit("\x02"), F.col(c).cast("string")), F.lit("\x01")
        )
        for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


# Spark types whose CAST-to-string text is engine-portable (the replay
# guarantee above). Doubles/decimals/timestamps are deliberately absent.
_PORTABLE_KEY_TYPES = {
    "tinyint", "smallint", "int", "bigint", "string", "boolean", "date",
}


def _check_key_cols(df: DataFrame, cols: list[str]) -> None:
    """Reject key columns whose string rendering is not engine-portable —
    a double/timestamp key would silently select DIFFERENT rows when the
    selection is replayed in another engine (round-4 ADVICE). Lookup is
    case-insensitive to match Spark's default column resolution — 'TS'
    resolves to a 'ts' column, so the guard must too."""
    types = {
        f.name.lower(): f.dataType.simpleString() for f in df.schema.fields
    }
    bad = {
        c: types[c.lower()]
        for c in cols
        if c.lower() in types and types[c.lower()] not in _PORTABLE_KEY_TYPES
    }
    if bad:
        raise TypeError(
            f"sampling key columns {bad} are not engine-portable under "
            "CAST(col AS STRING); canonicalize first (e.g. unix_micros(ts) "
            "for timestamps, a fixed-point format for doubles) and hash the "
            f"canonical column. Portable types: {sorted(_PORTABLE_KEY_TYPES)}"
        )


def deterministic_sample(
    df: DataFrame, k: int, cols: list[str], seed: str = "0"
) -> DataFrame:
    """Uniform-without-replacement k-sample: the k rows whose content hash
    is smallest. Equivalent to a seeded random draw (md5 is uniform on
    distinct inputs) but reproducible anywhere. Duplicate key tuples tie
    on the hash; include a unique id in ``cols`` for strict uniqueness."""
    if k < 0:
        raise ValueError("k must be >= 0")
    _check_key_cols(df, cols)
    return df.orderBy(_row_hash(cols, seed).asc()).limit(k)


def stratified_sample(
    df: DataFrame,
    group_cols: list[str],
    k_per_group: int,
    cols: list[str],
    seed: str = "0",
) -> DataFrame:
    """At most ``k_per_group`` rows per group, chosen by smallest content
    hash within the group — the balanced-slices draw (per language, per
    source, per event type) curation pipelines use to cap dominant slices.
    One window pass; groups smaller than k pass through whole."""
    from pyspark.sql.window import Window

    if k_per_group < 1:
        raise ValueError("k_per_group must be >= 1")
    _check_key_cols(df, cols)
    if "_sf_rank" in df.columns:
        raise ValueError("input already has a '_sf_rank' column (reserved)")
    w = Window.partitionBy(*group_cols).orderBy(_row_hash(cols, seed).asc())
    return (
        df.withColumn("_sf_rank", F.row_number().over(w))
        .filter(F.col("_sf_rank") <= k_per_group)
        .drop("_sf_rank")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    cols: list[str],
    seed: str = "0",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each row derives a reproducible uniform u in (0,1]
    from its content hash, gets priority ln(u)/w, and the k largest
    priorities win — inclusion probability rises with weight (for k=1 it
    is exactly w_i / sum w). The usual A-ES draws u from an RNG; drawing
    it from the content hash keeps the selection a pure function of
    (row content, seed): reproducible across clusters and partitionings.
    Two caveats vs the integer-exact samplers above: (a) rows that tie on
    BOTH key-column content and weight tie on priority — include a unique
    id in ``cols`` if such ties can straddle the k boundary (same caveat
    as deterministic_sample); (b) the priority uses float ln(u)/w, so a
    cross-engine replay is exact only up to libm's rounding of log —
    integer-exact replay is the province of deterministic_sample /
    split_by_hash. Rows with NULL or non-positive weights are excluded
    (they have zero inclusion probability anyway).

    The curation use: sample documents proportional to token count so a
    fixed-row budget covers a fixed-token budget. Same plan shape as
    ``deterministic_sample``: per-partition partial top-k, no full sort.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    _check_key_cols(df, cols)
    w = F.col(weight_col).cast("double")
    # u from the top 15 hex chars (60 bits) of the content hash
    u = (
        F.conv(F.substring(_row_hash(cols, seed), 1, 15), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16 ** 15))
    priority = F.log(u) / w
    return (
        df.filter(w.isNotNull() & (w > 0))
        .orderBy(priority.desc())
        .limit(k)
    )


def holdout_flag(
    cols: list[str], holdout_fraction: float, seed: str = "0"
) -> Column:
    """Boolean column: True iff the row is held out — the ``split_by_hash``
    fence as ONE expression. Use this (with ``withColumn``) when a pipeline
    wants a single pass carrying a split label; filtering two branches from
    the same expensive DAG executes that DAG once per branch (round-5
    review: curate_transcripts was running its dedup/decontam joins twice
    through the union of the two filters)."""
    if not 0.0 <= holdout_fraction <= 1.0:
        raise ValueError("holdout_fraction must be in [0, 1]")
    threshold = int(holdout_fraction * (16 ** 8))
    bucket = F.conv(F.substring(_row_hash(cols, seed), 1, 8), 16, 10).cast("long")
    return bucket < F.lit(threshold)


def split_by_hash(
    df: DataFrame,
    cols: list[str],
    holdout_fraction: float,
    seed: str = "0",
) -> tuple[DataFrame, DataFrame]:
    """(train, holdout) split: a row is held out iff the first 8 hex chars
    of its content hash, read as an integer, fall below
    holdout_fraction * 16^8. Stateless and content-keyed, so the fence is
    CONSISTENT across tables sharing the key columns (a conv_id held out
    of the text table is held out of the embeddings table too) and across
    reruns — the property that prevents train/eval leakage drift."""
    _check_key_cols(df, cols)
    is_holdout = holdout_flag(cols, holdout_fraction, seed)
    return df.filter(~is_holdout), df.filter(is_holdout)
