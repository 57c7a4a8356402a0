"""Deterministic synthetic multi-turn transcript generator (FIXTURES.md F1).

The BASELINE.json input_hint table shape:
    (conv_id string, turn_idx int, role string, text string, tool string,
     ts timestamp)

Generated entirely with Spark column expressions over ``spark.range`` — no
driver-side data, no UDFs, fully scale-out (a 10^12-turn synthesis is the
same plan with a bigger range). Deterministic: every column derives from the
row id via xxhash64; no wall-clock, no unseeded RNG.

Skew fixture: conversation assignment uses a power-law transform so a few
conv_ids are hot (hot conv-0 takes ~10-20% of turns at alpha=4) — exercising
the skew-salting path the north_star requires. ~7% of texts are exact
duplicates drawn from a small pool (dedup fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "python", "browser", "sql", "bash", "editor", "mail", "calc"]


def _unit_uniform(col, salt: str):
    """Deterministic uniform [0,1) from a column via xxhash64."""
    return (F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1_000_000)) / 1_000_000.0)


def synth_transcripts(
    spark: SparkSession,
    n_turns: int,
    n_convs: int | None = None,
    skew_alpha: float = 4.0,
    dup_pct: float = 0.07,
    seed: int = 42,
) -> DataFrame:
    """Build the deterministic transcripts DataFrame (lazy plan)."""
    n_convs = n_convs or max(1, n_turns // 20)
    base = spark.range(n_turns).withColumnRenamed("id", "g")
    u = _unit_uniform(F.col("g") + F.lit(seed), "conv")
    conv_idx = F.floor(F.pow(u, F.lit(skew_alpha)) * n_convs).cast("long")
    df = base.withColumn("conv_idx", conv_idx)
    w = Window.partitionBy("conv_idx").orderBy("g")
    df = df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
    role = F.element_at(
        F.array(*[F.lit(r) for r in _ROLES]),
        (F.pmod(F.col("turn_idx") + F.pmod(F.xxhash64("conv_idx"), F.lit(3)), F.lit(3)) + 1).cast("int"),
    )
    df = df.withColumn("role", role)
    is_dup = _unit_uniform(F.col("g") + F.lit(seed), "dup") < dup_pct
    dup_text = F.concat(
        F.lit("duplicated boilerplate #"),
        F.pmod(F.xxhash64(F.col("g"), F.lit("dpool")), F.lit(50)).cast("string"),
    )
    token_str = F.concat_ws(
        " ",
        *[
            F.conv(
                F.pmod(F.xxhash64(F.col("g"), F.lit(f"tok{i}")), F.lit(36 ** 6)).cast("string"),
                10,
                36,
            )
            for i in range(8)
        ],
    )
    fresh_text = F.concat(
        F.col("role"),
        F.lit(" turn "),
        F.col("turn_idx").cast("string"),
        F.lit(" of conv-"),
        F.col("conv_idx").cast("string"),
        F.lit(": "),
        token_str,
    )
    df = df.withColumn("text", F.when(is_dup, dup_text).otherwise(fresh_text))
    tool = F.when(
        F.col("role") == "tool",
        F.element_at(
            F.array(*[F.lit(t) for t in _TOOLS]),
            (F.pmod(F.xxhash64(F.col("g"), F.lit("tool")), F.lit(8)) + 1).cast("int"),
        ),
    ).otherwise(F.lit(""))
    df = df.withColumn("tool", tool)
    ts = F.to_timestamp(
        F.from_unixtime(F.lit(1767225600) + F.col("g") * 7)  # 2026-01-01T00:00:00Z
    )
    df = df.withColumn("ts", ts)
    conv_id = F.concat(F.lit("conv-"), F.lpad(F.col("conv_idx").cast("string"), 8, "0"))
    return df.select(
        conv_id.alias("conv_id"),
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    )
