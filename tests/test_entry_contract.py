"""Mirror of the driver's correctness gate: every queries() entry must match
its oracle_sql() under DuckDB on the same parquet (row count + sorted values).
"""

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(r[i] for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # driver records a rows-only check for non-SQL-expressible ops;
        # their semantics are pytest-verified against exact twins in
        # tests/test_pipeline_ops.py
        assert q(spark, SF_DIR).count() > 0
        return
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = ddb.execute(sql)
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(ddb_cols), (spark_cols, ddb_cols)
    # type parity: ints must be 64-bit on the Spark side (DuckDB len/count
    # return BIGINT) so a schema-comparing driver never flags int32 vs int64
    spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    for col_name, t in spark_types.items():
        assert t not in ("int", "smallint"), (col_name, t)
    assert len(spark_rows) == len(ddb_rows)
    assert _normalize(spark_rows, spark_cols) == _normalize(ddb_rows, ddb_cols)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"c_custkey", "c_name", "c_acctbal"}


def test_every_query_has_an_oracle():
    """The correctness gate is only as wide as the oracle map: every
    queries() entry must carry a SQL twin (ops that genuinely cannot be
    SQL-expressed would be deliberate, documented exceptions — today
    there are none)."""
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) == set(qs), {
        "queries_without_oracle": sorted(set(qs) - set(os_)),
        "oracles_without_query": sorted(set(os_) - set(qs)),
    }
