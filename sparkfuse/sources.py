"""Table sources/sinks with format abstraction (SURVEY.md §7 note (e)).

The north_rule targets Iceberg transcript tables; this sandbox's pyspark
4.1.2 bundles no Iceberg runtime jar, so the abstraction defaults to
parquet paths and routes to an Iceberg catalog identifier when one is
configured (spark.sql.catalog.* present) — same calling code either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def load_table(spark: SparkSession, ident: str, fmt: str = "auto") -> DataFrame:
    """ident: a filesystem path (parquet) or a catalog identifier
    (``catalog.db.table``) when fmt='iceberg' or auto-detected."""
    if fmt == "auto":
        fmt = "iceberg" if ("/" not in ident and iceberg_available(spark)) else "parquet"
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(ident)
    return spark.read.parquet(ident)


def write_table(
    df: DataFrame, ident: str, fmt: str = "auto", mode: str = "append"
) -> None:
    if fmt == "auto":
        fmt = "iceberg" if ("/" not in ident and iceberg_available(df.sparkSession)) else "parquet"
    if fmt == "iceberg":
        df.writeTo(ident).append() if mode == "append" else df.writeTo(ident).createOrReplace()
    else:
        df.write.mode(mode).parquet(ident)
